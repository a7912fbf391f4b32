"""Shard-writer tests: layout, manifest agreement with a recomputation,
budget bounds, and partition-pruned shard reads."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.packing import (
    pack_sequential,
    write_packed_shards,
)
from tests.conftest import SF_CORRECT


def _docs(spark):
    return load_table(spark, SF_CORRECT, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


def test_shard_writer_layout_and_manifest(spark, tmp_path):
    out = str(tmp_path / "packed")
    docs = _docs(spark)
    manifest = write_packed_shards(
        docs, out, order_col="doc_id", size_col="n_tokens", budget=2000
    )
    rows = {r["shard_id"]: r for r in manifest.collect()}
    # manifest must agree with an independent recomputation of the packing
    want = (
        pack_sequential(docs, "doc_id", "n_tokens", 2000)
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_rows"), F.sum("n_tokens").alias("n_tokens"))
    )
    for w in want.collect():
        got = rows[w["shard_id"]]
        assert (got["n_rows"], got["n_tokens"]) == (w["n_rows"], w["n_tokens"])
    # every shard except the last holds budget +- one document's overhang
    # (shard k spans the rows whose running start falls in [k*b, (k+1)*b),
    # so a crossing doc shifts both edges by < max_doc)
    max_doc = docs.agg(F.max("n_tokens")).head()[0]
    last = max(rows)
    for sid, r in rows.items():
        if sid != last:
            assert 2000 - max_doc < r["n_tokens"] < 2000 + max_doc
    # hive layout on disk: one directory per shard
    shard_dirs = [
        d for d in os.listdir(os.path.join(out, "shards")) if d.startswith("shard_id=")
    ]
    assert len(shard_dirs) == len(rows)
    # reading one shard prunes the scan to that partition
    one = spark.read.parquet(os.path.join(out, "shards")).filter(
        F.col("shard_id") == last
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard_id" in plan
    assert one.count() == rows[last]["n_rows"]


def test_shard_writer_per_stratum(spark, tmp_path):
    """partition_by packs per stratum: shard ids restart per lang and the
    manifest carries the (lang, shard) grain."""
    out = str(tmp_path / "packed_lang")
    docs = _docs(spark)
    manifest = write_packed_shards(
        docs,
        out,
        order_col="doc_id",
        size_col="n_tokens",
        budget=1500,
        partition_by="lang",
    )
    rows = manifest.collect()
    langs = {r["lang"] for r in rows}
    assert langs == {r["lang"] for r in docs.select("lang").distinct().collect()}
    for lang in langs:
        ids = sorted(r["shard_id"] for r in rows if r["lang"] == lang)
        assert ids[0] == 0  # restarts per stratum
        assert ids == list(range(len(ids)))
    total = sum(r["n_rows"] for r in rows)
    assert total == docs.count()

def test_pack_examples_members_and_totals(spark):
    """pack_examples pivots pack_sequential's assignment losslessly: the
    member CSV replays the exact shard membership in order_col order, and
    totals agree with an independent per-shard recomputation."""
    from serverless_etl_bi_on_aws_spark.operators.packing import pack_examples

    docs = _docs(spark)
    ex = {r["shard_id"]: r for r in pack_examples(
        docs, "doc_id", "n_tokens", budget=2000
    ).collect()}
    flat = pack_sequential(docs, "doc_id", "n_tokens", 2000).collect()
    want: dict[int, list] = {}
    for r in sorted(flat, key=lambda r: r["doc_id"]):
        want.setdefault(r["shard_id"], []).append(r)
    assert set(ex) == set(want)
    for sid, members in want.items():
        got = ex[sid]
        assert got["n_docs"] == len(members)
        assert got["total_tokens"] == sum(m["n_tokens"] for m in members)
        assert got["doc_ids"] == ",".join(str(m["doc_id"]) for m in members)


def test_pack_examples_per_stratum_and_determinism(spark):
    """Per-stratum packing keeps the (stratum, shard) grain, and two runs
    produce byte-identical member lists (the sort_array determinism
    contract — no collect_list ordering assumption)."""
    from serverless_etl_bi_on_aws_spark.operators.packing import pack_examples

    docs = _docs(spark)
    a = sorted(
        tuple(r) for r in pack_examples(
            docs, "doc_id", "n_tokens", budget=1500, partition_by="lang"
        ).collect()
    )
    b = sorted(
        tuple(r) for r in pack_examples(
            docs.repartition(7), "doc_id", "n_tokens", budget=1500,
            partition_by="lang"
        ).collect()
    )
    assert a == b
    langs = {t[0] for t in a}
    assert langs == {r["lang"] for r in docs.select("lang").distinct().collect()}
    # n_docs across all (lang, shard) examples covers every row exactly once
    assert sum(t[2] for t in a) == docs.count()


def test_pack_examples_offsets_delimit_document_boundaries(spark):
    """round 15: offsets are the exclusive prefix sums of member sizes
    in pack order — the block-diagonal attention-mask boundaries. The
    invariants: first offset 0, offsets align with the sizes of the
    doc_ids order, last offset + last size == total_tokens, identical
    under repartition, and the base pack_examples columns unchanged."""
    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.packing import (
        pack_examples,
        pack_examples_with_offsets,
    )

    rows = [(i, (i * 7) % 13 + 1) for i in range(60)]
    sizes = dict(rows)
    df = spark.createDataFrame(rows, "doc_id bigint, tok bigint")
    out = pack_examples_with_offsets(df, "doc_id", "tok", budget=40).collect()
    assert out, "no shards"
    for r in out:
        ids = [int(x) for x in r.doc_ids.split(",")]
        offs = [int(x) for x in r.offsets.split(",")]
        assert offs[0] == 0
        # each offset is the running sum of the previous members' sizes
        run = 0
        for i, d in enumerate(ids):
            assert offs[i] == run, (r.shard_id, i)
            run += sizes[d]
        assert run == r.total_tokens
    # base columns agree with pack_examples exactly
    base = {
        r.shard_id: (r.n_docs, r.total_tokens, r.doc_ids)
        for r in pack_examples(df, "doc_id", "tok", budget=40).collect()
    }
    assert {
        r.shard_id: (r.n_docs, r.total_tokens, r.doc_ids) for r in out
    } == base
    # determinism under a different partitioning
    again = {
        r.shard_id: (r.doc_ids, r.offsets)
        for r in pack_examples_with_offsets(
            df.repartition(11), "doc_id", "tok", budget=40
        ).collect()
    }
    assert again == {r.shard_id: (r.doc_ids, r.offsets) for r in out}
