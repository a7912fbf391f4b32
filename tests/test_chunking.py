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
