"""Chunking operator: JVM fast path vs Python UDTF twin, and edge shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.chunking import chunk_documents
from serverless_etl_bi_on_aws_spark.functions.udtf_fns import register_udtfs

from tests.conftest import SF_SMOKE


def test_udtf_twin_matches_jvm_path(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    jvm = {
        (r.doc_id, r.chunk_id, r.n_tokens_chunk, r.chunk_md5)
        for r in chunk_documents(docs, chunk_tokens=50, stride=40).collect()
    }
    register_udtfs(spark)
    docs.createOrReplaceTempView("chunk_src")
    py = {
        tuple(r)
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_id, c.n_tokens_chunk, c.chunk_md5 "
            "FROM chunk_src d, LATERAL chunk_doc(d.text, 50, 40) c"
        ).collect()
    }
    assert jvm == py and len(jvm) > 0


def test_chunk_overlap_and_clamping(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(7))), (2, "solo")], ["doc_id", "text"]
    )
    rows = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens_chunk, r.chunk_text)
        for r in chunk_documents(
            df, chunk_tokens=4, stride=3, keep_text=True
        ).collect()
    )
    assert rows == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 1, "t6"),
        (2, 0, 1, "solo"),
    ]


def test_chunking_is_map_only(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        chunk_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "chunking must not shuffle"


def test_tfidf_top_terms_crafted(spark, tmp_path):
    """q53 semantics on a corpus with known tf/df structure: a term that
    appears everywhere (df=N) scores below a rarer term with equal tf;
    exact ties (same tf, df) break alphabetically."""
    import os

    from serverless_etl_bi_on_aws_spark.plans.queries import EXTRA_QUERIES, QUERIES

    rows = [
        (0, "rare rare common filler", "en", "s0", 0),
        (1, "common filler other other", "en", "s0", 0),
        (2, "common filler zebra apple", "en", "s0", 0),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df)
           for r in {**QUERIES, **EXTRA_QUERIES}["q53_tfidf_top_terms"](spark, sf).collect()}  # q53 rotated to EXTRA in r14
    # doc 0: 'rare' tf=2 df=1 beats 'common'/'filler' tf=1 df=3
    assert got[(0, 1)] == ("rare", 2, 1)
    # doc 2: 'apple' and 'zebra' both tf=1 df=1 — exact tie, alphabetical
    assert got[(2, 1)] == ("apple", 1, 1)
    assert got[(2, 2)] == ("zebra", 1, 1)
    # ubiquitous terms (df=N) still rank, but after all rarer ones
    assert got[(2, 3)][0] in ("common", "filler")


def test_contamination_check_planted(spark, tmp_path):
    """q54 semantics with planted overlap: a candidate doc sharing a
    3-gram with the benchmark slice is flagged with the exact gram
    counts; a clean doc reports rate 0; sub-3-token docs are absent."""
    import os

    from serverless_etl_bi_on_aws_spark.plans.queries import (
        EXTRA_QUERIES,
        QUERIES,
    )

    QUERIES = {**QUERIES, **EXTRA_QUERIES}  # q54 rotated to EXTRA in r14

    rows = [
        (0, "alpha beta gamma delta", "en", "src0", 0),   # benchmark
        (1, "alpha beta gamma other words here", "en", "web", 0),  # contaminated
        (2, "totally clean text with no overlap", "en", "web", 0),  # clean
        (3, "too short", "en", "web", 0),                  # < 3 tokens
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: (r.n_grams, r.n_contaminated, r.contamination_rate)
           for r in QUERIES["q54_contamination_check"](spark, sf).collect()}
    # doc 1 has 4 distinct 3-grams; 'alpha beta gamma' + 'beta gamma ...'?
    # benchmark grams: {'alpha beta gamma', 'beta gamma delta'}; doc 1's
    # grams: 'alpha beta gamma', 'beta gamma other', 'gamma other words',
    # 'other words here' -> exactly one hit
    assert got[1] == (4, 1, 0.25)
    assert got[2][1] == 0 and got[2][2] == 0.0
    assert 3 not in got and 0 not in got


def test_repetition_stats_crafted(spark, tmp_path):
    """q55: a pathologically repetitive doc scores high dominance and
    high duplicate-2-gram fraction; a fully diverse doc scores the
    floor; a 1-token doc is absent."""
    import os

    # q55 rotated to the EXTRA tier in round 14 (slot ceded to q88)
    from serverless_etl_bi_on_aws_spark.plans.queries import EXTRA_QUERIES, QUERIES

    rows = [
        (0, "spam spam spam spam spam spam spam spam", "en", "s", 0),
        (1, "eight distinct little words walk into bars", "en", "s", 0),
        (2, "solo", "en", "s", 0),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: r for r in {**QUERIES, **EXTRA_QUERIES}["q55_repetition_stats"](spark, sf).collect()}
    assert got[0].n_tokens == 8 and got[0].max_token_count == 8
    assert got[0].top_token_frac == 1.0
    # 7 total 2-grams, all 'spam spam' -> 1 distinct -> dup frac 6/7
    assert got[0].n_2grams == 7 and got[0].n_distinct_2grams == 1
    assert got[0].dup_2gram_frac == round(1 - 1 / 7, 6)
    assert got[1].max_token_count == 1 and got[1].dup_2gram_frac == 0.0
    assert 2 not in got


def test_domain_mix_rebalance_weighted(spark, tmp_path):
    """q56 (round 7, WEIGHTED): sources sized against the 1/2/3 weight
    pattern w(src_i) = 1 + i%3. With src0 (w=1) as the bottleneck, the
    exact thresholds are computable by hand and the kept set is the exact
    multiplicative-hash subset — run-stable across invocations."""
    import os

    from serverless_etl_bi_on_aws_spark.plans.queries import (
        EXTRA_QUERIES,
        QUERIES,
    )

    QUERIES = {**QUERIES, **EXTRA_QUERIES}  # q56 rotated to EXTRA in r14

    # src0: 50 rows (w=1), src1: 400 (w=2), src2: 900 (w=3)
    sizes = {"src0": 50, "src1": 400, "src2": 900}
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"text {i}", "en", src, 0))
            i += 1
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")
    a = [(r.doc_id, r.source) for r in QUERIES["q56_domain_mix_rebalance"](spark, sf).collect()]
    b = [(r.doc_id, r.source) for r in QUERIES["q56_domain_mix_rebalance"](spark, sf).collect()]
    assert a == b  # deterministic
    # thresh_s = min_t floor(10000 * w_s * cnt_t / (cnt_s * w_t));
    # bottleneck is src0 (50/1 < 400/2 < 900/3)
    w = {"src0": 1, "src1": 2, "src2": 3}
    thresh = {
        s: min(10000 * w[s] * sizes[t] // (sizes[s] * w[t]) for t in sizes)
        for s in sizes
    }
    assert thresh == {"src0": 10000, "src1": 2500, "src2": 1666}
    expected = {
        (r[0], r[3]) for r in rows
        if (r[0] * 2654435761) % 10000 < thresh[r[3]]
    }
    assert set(a) == expected  # hash-exact selection, all sources
    # realized sizes are ~proportional to the weights (1:2:3), within the
    # multiplicative hash's sampling noise
    by_src: dict = {}
    for _, s in a:
        by_src[s] = by_src.get(s, 0) + 1
    assert by_src["src0"] == 50  # bottleneck source survives whole
    assert abs(by_src["src1"] / by_src["src0"] - 2.0) < 0.5
    assert abs(by_src["src2"] / by_src["src0"] - 3.0) < 0.75


def test_gapfilled_rollup_zero_fills(spark, tmp_path):
    """q57: buckets with no events appear with (0, 0.0) for every type;
    the spine spans exactly [min_bucket, max_bucket]."""
    import datetime
    import os

    # q57 rotated to the EXTRA tier in round 14 (slot ceded to q86)
    from serverless_etl_bi_on_aws_spark.plans.queries import EXTRA_QUERIES, QUERIES

    h6 = datetime.timedelta(hours=6)
    t0 = datetime.datetime(2001, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10, "view", 1.0, "{}"),
        (2, t0 + 3 * h6, 11, "view", 2.0, "{}"),   # buckets 1,2 are gaps
        (3, t0, 12, "purchase", 5.0, "{}"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = {(r.bucket_us, r.event_type): (r.n_events, r.sum_value)
           for r in {**QUERIES, **EXTRA_QUERIES}["q57_gapfilled_rollup"](spark, sf).collect()}
    step = 21_600_000_000
    base = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert len(got) == 4 * 2  # 4 buckets x 2 types
    assert got[(base, "view")] == (1, 1.0)
    assert got[(base + step, "view")] == (0, 0.0)       # gap zero-filled
    assert got[(base + 2 * step, "purchase")] == (0, 0.0)
    assert got[(base + 3 * step, "view")] == (1, 2.0)
    assert got[(base + 3 * step, "purchase")] == (0, 0.0)


def test_pii_scrub_masks_and_counts(spark):
    """functions/text.mask_pii on crafted text: every planted span masked
    to its typed token, counts per kind exact, masking idempotent, and
    clean text untouched."""
    from serverless_etl_bi_on_aws_spark.functions.text import mask_pii, pii_counts

    rows = [
        (1, "write a.b_c+1@mail.example.org or x@y.io now"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "see https://ex.com/a_b/c-1%20d and http://t.co/x"),
        (4, "mixed https://h.io/p me@h.io 1.2.3.4"),
        (5, "clean text with no personal data at all"),
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    c = pii_counts("t")
    got = {
        r.id: r
        for r in df.select(
            "id",
            c["email"].alias("e"), c["ipv4"].alias("i"), c["url"].alias("u"),
            mask_pii("t").alias("m"),
        ).collect()
    }
    assert (got[1].e, got[1].i, got[1].u) == (2, 0, 0)
    assert got[1].m == "write <EMAIL> or <EMAIL> now"
    assert (got[2].e, got[2].i, got[2].u) == (0, 2, 0)
    assert got[2].m == "server <IP> and <IP> up"
    assert (got[3].e, got[3].i, got[3].u) == (0, 0, 2)
    assert got[3].m == "see <URL> and <URL>"
    assert (got[4].e, got[4].i, got[4].u) == (1, 1, 1)
    assert got[4].m == "mixed <URL> <EMAIL> <IP>"
    assert got[5].m == rows[4][1]  # untouched
    # idempotent: masking already-masked text changes nothing
    again = df.select(mask_pii(mask_pii("t")).alias("m2"), mask_pii("t").alias("m1"))
    assert again.filter(F.col("m1") != F.col("m2")).count() == 0


def test_temperature_mix_alpha_extremes_and_midpoint(spark):
    """alpha=1 keeps natural proportions (threshold math: every stratum
    keeps ~k*p_s); alpha=0 is the uniform mix (all strata downsample to
    the scarcest); alpha=0.5 lands between, proportional to sqrt(cnt) —
    and the selection is deterministic across calls."""
    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        temperature_mix_sample,
    )

    rows = [(i, "big" if i < 6400 else ("mid" if i < 8000 else "small"))
            for i in range(8400)]  # 6400 / 1600 / 400
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    def realized(alpha):
        out = temperature_mix_sample(df, "source", "doc_id", alpha=alpha, k=4000)
        c = {r["source"]: r["n"] for r in
             out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        return c

    nat = realized(1.0)
    # natural: proportions ~ 16:4:1 (hash selection is exact-threshold,
    # tolerance for hash bucketing granularity)
    assert nat["big"] / nat["small"] > 8
    uni = realized(0.0)
    # uniform: every stratum close to the scarcest stratum's count
    assert max(uni.values()) - min(uni.values()) <= 400 * 0.25
    mid = realized(0.5)
    # sqrt law: big/small target ratio sqrt(6400/400)=4
    assert 2.5 <= mid["big"] / mid["small"] <= 6
    # deterministic selection
    a = sorted(r["doc_id"] for r in
               temperature_mix_sample(df, "source", "doc_id", 0.5, 4000).collect())
    b = sorted(r["doc_id"] for r in
               temperature_mix_sample(df, "source", "doc_id", 0.5, 4000).collect())
    assert a == b


def test_normalize_text_batch_unicode_cases(spark):
    """NFC composes decomposed sequences, control chars vanish, tabs and
    newlines become single spaces, runs collapse, NULL passes through."""
    from serverless_etl_bi_on_aws_spark.functions.text import normalize_text_batch

    rows = [
        (1, "café time"),          # decomposed -> café
        (2, "a\x07b\x00c"),              # controls stripped
        (3, "x\t\ty \n\n z"),            # tabs/newlines -> collapsed spaces
        (4, "  already clean  "),         # trim only
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r["clean_text"] for r in normalize_text_batch(df).collect()}
    assert got[1] == "café time" and len(got[1]) == 9
    assert got[2] == "abc"
    assert got[3] == "x y z"
    assert got[4] == "already clean"
    assert got[5] is None


def test_temperature_mix_no_bigint_wrap_at_scale(spark):
    """Threshold arithmetic is exact DECIMAL(38,0): with a 250k-row
    stratum at alpha=1 the old all-bigint candidate k*w*cnt (~6.5e20)
    silently wrapped past 2^63 in non-ANSI mode and dropped rows.
    alpha=1 means natural proportions — every row must survive."""
    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        temperature_mix_sample,
    )

    big = spark.range(0, 250_000).select(
        F.col("id").alias("doc_id"), F.lit("big").alias("source")
    )
    small = spark.range(250_000, 250_100).select(
        F.col("id").alias("doc_id"), F.lit("small").alias("source")
    )
    df = big.unionByName(small)
    out = temperature_mix_sample(df, "source", "doc_id", alpha=1.0, k=10000)
    assert out.count() == df.count()


def test_epoch_mix_repeat_contract(spark):
    """q97's operator at row level: realized per-stratum counts hit the
    exact integer rule (copies = r//10000, +1 iff bucket(id) mod 10000 <
    r%10000); copy_idx is contiguous from 0; 0 epochs drops the stratum;
    unmapped strata get default_epochs; the repeat is deterministic
    across runs; negative epochs refuse."""
    import pytest as _pytest

    from serverless_etl_bi_on_aws_spark.operators.sampling import epoch_mix_repeat

    rows = [(i, "a" if i < 100 else ("b" if i < 160 else "c")) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = epoch_mix_repeat(
        df, "lang", {"a": 2.5, "b": 0.0}, id_col="doc_id", default_epochs=1.0
    ).collect()

    per = {}
    for r in out:
        per.setdefault((r.lang, r.doc_id), []).append(r.copy_idx)
    # exact expected copies per doc from the same integer rule
    for i in range(200):
        lang = "a" if i < 100 else ("b" if i < 160 else "c")
        r_ten = {"a": 25000, "b": 0}.get(lang, 10000)
        want = r_ten // 10000 + (1 if (i * 2654435761) % 10000 < r_ten % 10000 else 0)
        got = sorted(per.get((lang, i), []))
        assert got == list(range(want)), (lang, i, got, want)
    # stratum totals: 'a' lands between 2x and 3x, 'b' vanishes, 'c' is 1x
    n_a = sum(1 for r in out if r.lang == "a")
    assert 200 <= n_a <= 300 and not any(r.lang == "b" for r in out)
    assert sum(1 for r in out if r.lang == "c") == 40

    again = epoch_mix_repeat(
        df.repartition(7), "lang", {"a": 2.5, "b": 0.0}, id_col="doc_id"
    ).collect()
    assert sorted((r.doc_id, r.copy_idx) for r in again) == sorted(
        (r.doc_id, r.copy_idx) for r in out
    )

    with _pytest.raises(ValueError, match="epochs"):
        epoch_mix_repeat(df, "lang", {"a": -1.0}, id_col="doc_id")


def test_script_detection_tiebreak_and_none(spark):
    """dominant_script: alphabetically-first script wins an exact count
    tie; a text with zero script chars yields 'none'; counts are
    per-codepoint (functions/text.SCRIPT_RANGES closed-form ranges)."""
    from serverless_etl_bi_on_aws_spark.functions.text import (
        dominant_script,
        script_counts,
    )

    rows = [
        ("abc", "latin", 3),          # pure latin
        ("αβ ab", "greek", 2),        # exact 2-2 tie -> greek (g < l)
        ("мир ok", "cyrillic", 3),    # majority
        ("123 !!!", "none", 0),       # no script chars
        ("世界 かなかな", "kana", 4),  # kana 4 beats han 2
    ]
    df = spark.createDataFrame([(t,) for t, _, _ in rows], ["t"])
    got = df.select(
        "t", dominant_script("t"), *script_counts("t").values()
    ).collect()
    by_text = {r["t"]: r for r in got}
    for t, script, own in rows:
        r = by_text[t]
        assert r["script"] == script, (t, r["script"])
        if script != "none":
            assert r[f"n_{script}"] == own, (t, r[f"n_{script}"])
    # map-only: no Exchange in the plan
    plan = (
        df.select(dominant_script("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_gopher_flags_hand_computed(spark):
    """Each Gopher rule verified against a hand-computed verdict on a
    crafted doc that isolates it (functions/text.gopher_flags), plus the
    map-only plan contract."""
    from serverless_etl_bi_on_aws_spark.functions.text import gopher_flags

    passing = ("the data and more words here " * 10).strip()
    rows = [
        # (text, failing_rule or None)
        (passing, None),
        ("the of short", "g_nwords"),                       # 3 words < 50
        (("ab " * 60).strip() + " the of", "g_wordlen"),    # mean len < 3
        (passing + " " + "# " * 7, "g_symbols"),            # 7 hashes, 67 words
        (passing.replace(" ", "\n", 9) + "\n" + "x...\n" * 5, "g_ellipsis"),
        ("the of\n" + "- b\n" * 20, "g_bullets"),           # 20/22 bullet lines
        (passing + " " + "123 " * 20, "g_alpha"),           # 20/80 digit words
        (" ".join(["word"] * 60), "g_stopwords"),           # zero stop words
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(rows)], "i int, text string"
    )
    got = {r["i"]: r.asDict() for r in gopher_flags(df, "text").collect()}
    all_flags = [
        "g_nwords", "g_wordlen", "g_symbols", "g_ellipsis",
        "g_bullets", "g_alpha", "g_stopwords",
    ]
    for i, (t, fail) in enumerate(rows):
        r = got[i]
        if fail is None:
            assert r["g_pass"], r
            assert all(r[f] for f in all_flags), r
        else:
            assert not r[fail], (i, fail, r)
            assert not r["g_pass"], r
    # map-only: no Exchange before the (tiny) aggregate
    plan = (
        gopher_flags(df, "text").drop("i")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_compression_ppt_reference_and_contracts(spark):
    """with_compression_ppt equals a direct zlib computation on the same
    strings, separates repetitive from natural text by a wide margin,
    passes NULL/empty through as NULL, and stays one Python stage with
    no Exchange."""
    import zlib

    from serverless_etl_bi_on_aws_spark.functions.pandas_fns import (
        with_compression_ppt,
    )

    texts = [
        "spam ham " * 120,
        "the quick brown fox jumps over the lazy dog and keeps going on",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {r["i"]: r["c_ppt"] for r in with_compression_ppt(df, "text").collect()}
    for i, t in enumerate(texts):
        if not t:
            assert got[i] is None, (i, got[i])
        else:
            b = t.encode("utf-8")
            assert got[i] == 1000 * len(zlib.compress(b, 6)) // len(b)
    assert got[0] < 200 < got[1]  # repetitive vs natural separation
    plan = (
        with_compression_ppt(df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_stratified_sample_exact_quotas_and_determinism(spark):
    """Round 16: exact min(k, |stratum|) quotas; identical membership
    under a different input partitioning; k=0 empty; k<0 refused."""
    import pytest

    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        stratified_sample_exact,
    )

    rows = [(i, "big" if i % 3 else "small") for i in range(60) if i % 3 or i < 9]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    out = stratified_sample_exact(df, "grp", k=5)
    per = {}
    for r in out.collect():
        per.setdefault(r.grp, []).append(r.doc_id)
    assert len(per["big"]) == 5
    assert len(per["small"]) == 3  # only 3 rows exist: min(k, size)
    again = {}
    for r in stratified_sample_exact(df.repartition(13), "grp", k=5).collect():
        again.setdefault(r.grp, []).append(r.doc_id)
    assert {k: sorted(v) for k, v in per.items()} == {
        k: sorted(v) for k, v in again.items()
    }
    assert stratified_sample_exact(df, "grp", k=0).count() == 0
    with pytest.raises(ValueError, match="k must"):
        stratified_sample_exact(df, "grp", k=-1)


def test_stratified_sample_exact_large_ids_engine_neutral(spark):
    """Round 17 (ADVICE): above id ≈ 3.47e9 the naive (id*2654435761)
    product overflows BIGINT — Spark wraps silently, DuckDB promotes to
    HUGEINT — so the two engines would pick DIFFERENT rows. The reduced
    form pmod(pmod(id,p)+seed, ...)*MIX keeps the product under 2^63 for
    every BIGINT id; this pins Spark's selection == DuckDB's selection
    at ids up to 2^63-1 (fails without the fix: Spark's wrapped ranks
    diverge from DuckDB's exact ones)."""
    import duckdb

    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        stratified_sample_exact,
    )

    ids = [
        3_500_000_000 + 7 * i for i in range(20)
    ] + [2**62 + 13 * i for i in range(20)] + [2**63 - 1 - 997 * i for i in range(20)]
    rows = [(i, "g%d" % (i % 2)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    got = {
        (r.grp, r.doc_id)
        for r in stratified_sample_exact(df, "grp", k=4, seed=3).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, grp VARCHAR);"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        (g, i)
        for g, i in con.execute(
            """
            SELECT grp, doc_id FROM (
                SELECT grp, doc_id, row_number() OVER (
                    PARTITION BY grp
                    ORDER BY ((doc_id % 1000000007) + 3) * 2654435761
                             % 1000000007, doc_id
                ) AS rk FROM t
            ) WHERE rk <= 4
            """
        ).fetchall()
    }
    assert got == want and len(got) == 8
