"""Round-15 additions: Luhn-gated card PII (functions/text.py),
mojibake detection/repair (functions/text.py), k-anonymity
(operators/anonymize.py), and daily gap-fill (operators/timeseries.py)
— hand-computed contracts beyond the oracle compare."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.functions.text import (
    card_candidates,
    card_counts,
    luhn_valid,
    mask_valid_cards,
    mojibake_count,
    repair_mojibake,
)


def test_luhn_against_hand_vectors(spark):
    rows = [
        (0, "4532015112830366", True),    # valid 16-digit Visa test PAN
        (1, "4532015112830367", False),   # check digit bumped
        (2, "4111111111111111", True),    # classic test PAN
        (3, "4539 1488 0343 6467", True), # grouped, spaces
        (4, "4539-1488-0343-6467", True), # grouped, dashes
        (5, "1234567890123456", False),   # 16 digits, fails checksum
        (6, "4222222222222", True),       # 13-digit valid PAN
        (7, "6011000990139424", True),    # 16-digit Discover test PAN
    ]
    df = spark.createDataFrame(rows, "i bigint, s string, want boolean")
    got = df.select(
        "i", "want",
        F.element_at(F.transform(F.array(F.col("s")), luhn_valid), 1).alias("ok"),
    )
    for r in got.collect():
        assert r.ok == r.want, r.i


def test_mask_only_checksum_valid_candidates(spark):
    """The conservative contract: a 16-digit order id must NOT be
    masked; valid PANs in both shapes must; candidates de-duplicate."""
    df = spark.createDataFrame(
        [
            (0, "a 4532015112830366 b 1234567890123456 c"),
            (1, "twice 4111111111111111 and 4111111111111111 again"),
            (2, "grouped 4539 1488 0343 6467 end"),
            (3, "no digits at all"),
        ],
        "i bigint, text string",
    )
    cc = card_counts("text")
    got = {
        r.i: (r.cand, r.ok, r.masked)
        for r in df.select(
            "i",
            cc["card_candidates"].alias("cand"),
            cc["card_valid"].alias("ok"),
            mask_valid_cards("text").alias("masked"),
        ).collect()
    }
    assert got[0] == (2, 1, "a <CARD> b 1234567890123456 c")
    # duplicate PAN is ONE distinct candidate; both occurrences mask
    assert got[1] == (1, 1, "twice <CARD> and <CARD> again")
    assert got[2] == (1, 1, "grouped <CARD> end")
    assert got[3] == (0, 0, "no digits at all")


def test_grouped_pan_inside_longer_run_is_found(spark):
    """Round-16 ADVICE fix: a fixed 4-group pattern anchors at the
    run's FIRST boundary, so in a 5-group separator-delimited run the
    true PAN (groups 2-5) was never extracted and leaked unmasked.
    card_candidates now extracts the whole run and slides a 4-group
    window over it — every aligned window is a candidate."""
    df = spark.createDataFrame(
        [
            # true PAN is groups 2-5; group-1 window fails Luhn
            (0, "ref 1234 4539 1488 0343 6467 end"),
            # dash-separated variant of the same embedding
            (1, "ref 1234-4539-1488-0343-6467 end"),
            # 5-group run with NO valid window: nothing masks
            (2, "ids 1234 5678 9012 3456 7890 done"),
        ],
        "i bigint, text string",
    )
    got = {
        r.i: (sorted(r.cands), r.masked)
        for r in df.select(
            "i",
            card_candidates("text").alias("cands"),
            mask_valid_cards("text").alias("masked"),
        ).collect()
    }
    assert got[0] == (
        ["1234 4539 1488 0343", "4539 1488 0343 6467"],
        "ref 1234 <CARD> end",
    )
    assert got[1] == (
        ["1234-4539-1488-0343", "4539-1488-0343-6467"],
        "ref 1234-<CARD> end",
    )
    assert got[2][1] == "ids 1234 5678 9012 3456 7890 done"


def test_mojibake_guards_never_touch_clean_text(spark):
    orig = "café münchen señor São"
    damaged = orig.encode("utf-8").decode("latin-1")
    rows = [
        (0, orig),                      # clean accented: marker-free
        (1, damaged),                   # repairable
        (2, "汉字文本 plain"),            # outside Latin-1: guard refuses
        (3, damaged[:-1] + "Ã"),        # truncated pair: utf8 guard refuses
        (4, "ascii only 123"),
    ]
    df = spark.createDataFrame(rows, "i bigint, t string")
    got = {
        r.i: (r.n, r.rep)
        for r in df.select(
            "i", mojibake_count("t").alias("n"), repair_mojibake("t").alias("rep")
        ).collect()
    }
    assert got[0] == (0, orig)
    assert got[1][0] > 0 and got[1][1] == orig
    assert got[2] == (0, rows[2][1])
    assert got[3][1] == rows[3][1]  # fell back to the original, no throw
    assert got[4] == (0, "ascii only 123")


def test_k_anonymity_contracts(spark):
    from serverless_etl_bi_on_aws_spark.operators.anonymize import (
        generalize_below_k,
        k_anonymity_report,
        suppress_below_k,
    )

    rows = [("a", 1, i) for i in range(5)] + [("a", 2, 10)] + [
        ("b", 1, 20), ("b", 1, 21), ("b", 1, 22)
    ]
    df = spark.createDataFrame(rows, "seg string, nat int, rid bigint")
    rep = {
        (r.seg, r.nat): (r.class_size, r.anonymous)
        for r in k_anonymity_report(df, ["seg", "nat"], k=3).collect()
    }
    assert rep == {("a", 1): (5, True), ("a", 2): (1, False), ("b", 1): (3, True)}
    kept = sorted(r.rid for r in suppress_below_k(df, ["seg", "nat"], k=3).collect())
    assert kept == [0, 1, 2, 3, 4, 20, 21, 22]  # the (a,2) singleton dropped
    gen = generalize_below_k(df, ["seg", "nat"], k=3)
    assert gen.count() == len(rows)  # conservation: nothing dropped
    starred = {r.rid: (r.seg, r.nat) for r in gen.collect()}
    assert starred[10] == ("*", "*")
    assert starred[0] == ("a", "1")  # big classes keep values (as strings)
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_report(df, ["seg"], k=0)
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_report(df, [], k=3)


def test_gap_fill_daily_per_key_spans_and_zeros(spark):
    from serverless_etl_bi_on_aws_spark.operators.timeseries import (
        gap_fill_daily,
    )

    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"),
        (1, "2024-01-04 09:00:00"),                      # gap Jan 2-3
        (2, "2024-02-10 08:00:00"),                      # disjoint span
    ]
    df = spark.createDataFrame(rows, "uid bigint, s string").select(
        "uid", F.to_timestamp("s").alias("ts")
    )
    out = gap_fill_daily(df, "uid", ts_col="ts", out_key="k", count_col="n")
    got = {(r.k, str(r.day)): r.n for r in out.collect()}
    assert got == {
        (1, "2024-01-01"): 2,
        (1, "2024-01-02"): 0,
        (1, "2024-01-03"): 0,
        (1, "2024-01-04"): 1,
        (2, "2024-02-10"): 1,  # key 2's span is its OWN day, not January
    }
    # determinism under a different input partitioning
    again = {
        (r.k, str(r.day)): r.n
        for r in gap_fill_daily(
            df.repartition(7), "uid", ts_col="ts", out_key="k", count_col="n"
        ).collect()
    }
    assert again == got


# ---------------------------------------------------------------------------
# DSIR importance selection (operators/selection.py, round 15)
# ---------------------------------------------------------------------------

def _dsir_corpus(spark, n=120):
    from pyspark.sql import functions as F

    t = ["physics", "quantum", "theorem", "energy"]
    r = ["cheap", "click", "sale", "deal"]
    rows = [
        (i, " ".join((t if i % 2 == 0 else r)[j % 4] for j in range(i, i + 8)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "is_t", F.col("doc_id") % 2 == 0
    )


def test_dsir_fit_is_bounded(spark, monkeypatch):
    """100 TB contract: the fit's token pass sees at most fit_sample_rows
    rows per side — trapped at DataFrame.limit."""
    from serverless_etl_bi_on_aws_spark.operators.selection import (
        fit_dsir_weights,
    )

    docs = _dsir_corpus(spark, n=200)
    cls = type(docs)  # the concrete (classic/connect) DataFrame class
    seen = []
    orig = cls.limit

    def trap(self, n):
        seen.append(n)
        return orig(self, n)

    monkeypatch.setattr(cls, "limit", trap)
    w = fit_dsir_weights(
        docs.filter("is_t"), docs, num_buckets=1 << 10, fit_sample_rows=50
    )
    assert seen.count(50) == 2  # one bounded sample per side
    assert w.count() == 1 << 10


def test_dsir_scores_separate_and_are_deterministic(spark):
    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.selection import (
        dsir_sample,
        dsir_score,
        dsir_select_top,
        fit_dsir_weights,
    )

    docs = _dsir_corpus(spark)
    w = fit_dsir_weights(docs.filter("is_t"), docs, num_buckets=1 << 10).cache()
    scored = dsir_score(docs, w)
    stats = {
        r.is_t: (r.lo, r.hi)
        for r in scored.groupBy("is_t")
        .agg(F.min("dsir_milli").alias("lo"), F.max("dsir_milli").alias("hi"))
        .collect()
    }
    assert stats[True][0] > stats[False][1]  # total separation
    # integer scores: identical under a different partitioning
    a = sorted((r.doc_id, r.dsir_milli) for r in scored.collect())
    b = sorted(
        (r.doc_id, r.dsir_milli)
        for r in dsir_score(docs.repartition(13), w).collect()
    )
    assert a == b
    # top-k is exactly the target-like set, cut under a total order
    top = dsir_select_top(docs, w, k=60)
    assert sorted(r.doc_id for r in top.collect()) == [i for i in range(120) if i % 2 == 0]
    # sampler with the midpoint between populations: all target, no raw
    mid = (stats[True][0] + stats[False][1]) // 2
    kept = dsir_sample(docs, w, midpoint_milli=mid, scale_milli=100)
    got = {r.is_t: r.n for r in kept.groupBy("is_t").agg(F.count("*").alias("n")).collect()}
    assert got.get(False, 0) == 0 and got.get(True, 0) >= 59
    w.unpersist()


def test_dsir_score_rejects_filtered_weights(spark):
    """r15 ADVICE (low): dsir_score recovered num_buckets as
    weights.count() — an extra count job per call, and a FILTERED
    weights table (non-zero rows only) silently re-moduloed every token
    into the wrong bucket space, garbage scores with no error. The
    validated derivation (max(bucket)+1, asserted dense) fails loudly;
    hot paths pass num_buckets= and skip the job."""
    import pytest

    from serverless_etl_bi_on_aws_spark.operators.selection import (
        dsir_score,
        fit_dsir_weights,
        weights_num_buckets,
    )

    docs = _dsir_corpus(spark, n=40)
    w = fit_dsir_weights(docs.filter("is_t"), docs, num_buckets=256).cache()
    assert weights_num_buckets(w) == 256
    with pytest.raises(ValueError, match="not dense"):
        dsir_score(docs, w.filter("bucket != 0"))
    # explicit num_buckets= must agree with the derived path
    a = sorted((r.doc_id, r.dsir_milli) for r in dsir_score(docs, w).collect())
    b = sorted(
        (r.doc_id, r.dsir_milli)
        for r in dsir_score(docs, w, num_buckets=256).collect()
    )
    assert a == b
    w.unpersist()


def test_dsir_fit_refuses_empty_side(spark):
    import pytest

    from serverless_etl_bi_on_aws_spark.operators.selection import (
        fit_dsir_weights,
    )

    docs = _dsir_corpus(spark, n=20)
    empty = docs.filter("doc_id < 0")
    with pytest.raises(ValueError, match="empty"):
        fit_dsir_weights(empty, docs, num_buckets=256)


def test_rolling_daily_stats_over_dense_grid(spark):
    """round 15: the trailing window over the gap-filled grid — exact
    sums, integer-thousandth averages, honest partial leading edge."""
    from serverless_etl_bi_on_aws_spark.operators.timeseries import (
        gap_fill_daily,
        rolling_daily_stats,
    )

    rows = [(1, f"2024-01-{d:02d} 08:00:00") for d in (1, 1, 1, 4)]
    df = spark.createDataFrame(rows, "uid bigint, s string").select(
        "uid", F.to_timestamp("s").alias("ts")
    )
    dense = gap_fill_daily(df, "uid", ts_col="ts", out_key="k", count_col="n")
    out = {
        str(r.day): (r.roll_sum, r.roll_avg_milli)
        for r in rolling_daily_stats(dense, "k", "day", "n", window_days=3).collect()
    }
    # days: 1->3 events, 2->0, 3->0, 4->1
    assert out == {
        "2024-01-01": (3, 3000),          # 1-day partial window: 3/1
        "2024-01-02": (3, 1500),          # 2-day partial: 3/2
        "2024-01-03": (3, 1000),          # full 3-day: 3/3
        "2024-01-04": (1, 333),           # (0+0+1)*1000 DIV 3
    }
    import pytest

    with pytest.raises(ValueError, match="window_days"):
        rolling_daily_stats(dense, window_days=0)


# ---------------------------------------------------------------------------
# Vocabulary + OOV (operators/vocab.py, round 15)
# ---------------------------------------------------------------------------

def test_vocab_cut_and_oov_exactness(spark):
    from serverless_etl_bi_on_aws_spark.operators.vocab import (
        build_vocab,
        oov_report,
        oov_stats,
    )

    rows = [
        (0, "aa aa aa bb bb cc"),
        (1, "aa bb zz"),
        (2, ""),                 # empty doc: (0, 0), never flagged
        (3, "zz zz zz zz"),      # all OOV vs top-2
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # counts: aa=4, bb=3, zz=5, cc=1 -> top-2 by (cnt desc, token asc): zz, aa
    v = build_vocab(df, k=2)
    assert [(r.rank, r.token, r.cnt) for r in v.orderBy("rank").collect()] == [
        (1, "zz", 5), (2, "aa", 4),
    ]
    got = {r.doc_id: (r.n_tokens, r.n_oov) for r in oov_stats(df, v).collect()}
    assert got == {0: (6, 3), 1: (3, 1), 2: (0, 0), 3: (4, 0)}
    rep = oov_report(df, v, oov_ppm_threshold=400_000).first()
    assert (rep.n_docs, rep.total_tokens, rep.total_oov) == (4, 13, 4)
    assert rep.oov_ppm == 4 * 1_000_000 // 13
    # >40% OOV: doc 0 (50%) yes, doc 1 (33%) no, doc 2 (0 tokens) no
    assert rep.docs_over_threshold == 1
    # tie-break determinism: equal counts order by token asc
    tie = spark.createDataFrame(
        [(0, "x y"), (1, "y x")], "doc_id bigint, text string"
    )
    tv = build_vocab(tie, k=2)
    assert [r.token for r in tv.orderBy("rank").collect()] == ["x", "y"]
    import pytest

    with pytest.raises(ValueError, match="k must"):
        build_vocab(df, k=0)


def test_iban_mod97_against_reference(spark):
    """Round 16: the chunked-mod-97 fold (functions/text.iban_valid)
    against an independent big-int reference over public test vectors
    plus shape-alikes; masking only touches checksum-valid candidates."""
    from serverless_etl_bi_on_aws_spark.functions.text import (
        iban_candidates,
        iban_counts,
        iban_valid,
        mask_valid_ibans,
    )

    vectors = [
        "GB82WEST12345698765432",       # ISO example
        "DE89370400440532013000",
        "FR1420041010050500013M02606",
        "NO9386011117947",              # 15 chars, shortest shape
        "GB82WEST12345698765433",       # check digit damage
        "GB28WEST12345698765432",       # transposed check digits
        "GB00TEST11111111111111",       # shape-alike serial
    ]

    def ref(s: str) -> bool:
        return int(
            "".join(str(int(c, 36)) for c in s[4:] + s[:4])
        ) % 97 == 1

    df = spark.createDataFrame(
        [(i, f"x {v} y") for i, v in enumerate(vectors)], "i bigint, text string"
    )
    got = {
        r.i: (r.c, r.v)
        for r in df.select(
            "i",
            F.element_at(iban_candidates("text"), 1).alias("c"),
            F.element_at(F.transform(iban_candidates("text"), iban_valid), 1).alias("v"),
        ).collect()
    }
    for i, vec in enumerate(vectors):
        assert got[i] == (vec, ref(vec)), vec
    masked = {
        r.i: r.m
        for r in df.select("i", mask_valid_ibans("text").alias("m")).collect()
    }
    for i, vec in enumerate(vectors):
        assert masked[i] == (f"x <IBAN> y" if ref(vec) else f"x {vec} y")
    # audit counts over a multi-candidate doc
    cc = iban_counts("text")
    both = spark.createDataFrame(
        [(0, f"a {vectors[0]} b {vectors[4]} c")], "i bigint, text string"
    )
    r = both.select(
        cc["iban_candidates"].alias("c"), cc["iban_valid"].alias("v")
    ).head()
    assert (r.c, r.v) == (2, 1)
