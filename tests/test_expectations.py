"""Expectations tests: crafted violations of every check kind, the
one-pass plan contract, and FK orphan counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.operators.expectations import (
    accepted_values,
    foreign_key,
    in_range,
    matches_regex,
    not_null,
    run_checks,
    unique,
)


def _crafted(spark):
    rows = [
        (1, "A", 10.0, "a-1"),
        (2, "B", -5.0, "b-2"),      # in_range violation (< 0)
        (2, "Z", 50.0, "c-3"),      # dup id + bad status
        (None, "A", 200.0, "zzz"),  # null id + over range + bad regex
    ]
    return spark.createDataFrame(rows, ["id", "status", "amount", "code"])


def test_run_checks_counts_each_violation_kind(spark):
    df = _crafted(spark)
    report = {
        (r["check"], r["col"]): r
        for r in run_checks(
            df,
            [
                not_null("id"),
                unique("id"),
                in_range("amount", 0, 100),
                accepted_values("status", ["A", "B"]),
                matches_regex("code", "^[a-c]-[0-9]$"),
            ],
        ).collect()
    }
    assert report[("not_null", "id")]["n_violations"] == 1
    # 4 rows, ids (1, 2, 2, NULL): count(id)=3 - count_distinct(id)=2 -> 1
    # (the dup; the NULL is not_null's violation, already counted above)
    assert report[("unique", "id")]["n_violations"] == 1
    assert report[("in_range", "amount")]["n_violations"] == 2  # -5 and 200
    assert report[("accepted_values", "status")]["n_violations"] == 1  # Z
    assert report[("matches_regex", "code")]["n_violations"] == 1  # zzz
    assert not any(r["passed"] for r in report.values())


def test_run_checks_single_pass_plan(spark):
    """However many checks, the suite is ONE aggregate over the table —
    the source appears exactly once in the physical plan."""
    df = _crafted(spark)
    report = run_checks(
        df, [not_null("id"), in_range("amount", 0, 100), unique("id")]
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1


def test_foreign_key_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], ["custkey"]
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["c_custkey"])
    row = foreign_key(child, "custkey", parent, "c_custkey").head()
    assert row["n_violations"] == 2  # the 9 and the NULL
    assert row["passed"] is False


def test_all_green_on_clean_table(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], ["id", "status"])
    report = run_checks(
        df, [not_null("id"), unique("id"), accepted_values("status", ["A", "B"])]
    )
    assert all(r["passed"] and r["n_violations"] == 0 for r in report.collect())


def test_unique_ignores_nulls(spark):
    """unique counts duplicated NON-NULL values only: NULL rows are
    not uniqueness violations (they're not_null's business). The
    pre-round-8 count(*) formulation reported every NULL as a dup."""
    df = spark.createDataFrame([(1,), (2,), (None,), (None,)], "v int")
    row = run_checks(df, [unique("v")]).head()
    assert row["n_violations"] == 0 and row["passed"] is True
    # a real duplicate still counts, NULLs still don't
    df2 = spark.createDataFrame([(1,), (1,), (None,)], "v int")
    row2 = run_checks(df2, [unique("v")]).head()
    assert row2["n_violations"] == 1 and row2["passed"] is False


def test_psi_drift_report_exact_and_banded(spark):
    """Round 17 (operators/drift.py): identical distributions score ~0
    milli-nats (exactly 0 per bucket after rounding at these sizes), a
    collapsed category clears the conventional 0.10 band, buckets
    present on only one side get add-one smoothing instead of
    infinities, and the total is the exact integer sum of per-bucket
    contributions."""
    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.drift import (
        psi_report,
        psi_total_milli,
    )

    rows = [(i, ["en", "en", "en", "de", "fr"][i % 5]) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, lang string")
    same = psi_report(df, df, "lang")
    assert {r.psi_milli for r in same.collect()} == {0}
    t = psi_total_milli(same).first()
    assert t.psi_milli == 0 and not t.drifted_100

    # drop ALL 'fr' and 80% of 'de' from the current snapshot
    cur = df.filter(
        (F.col("lang") == "en")
        | ((F.col("lang") == "de") & (F.col("id") % 5 == 3) & (F.col("id") % 25 == 3))
    )
    rep = psi_report(df, cur, "lang")
    rows_by_bucket = {r.bucket: r for r in rep.collect()}
    assert rows_by_bucket["fr"].b_cnt == 0  # vanished, smoothed not inf
    assert rows_by_bucket["fr"].psi_milli > 0
    t2 = psi_total_milli(rep).first()
    assert t2.psi_milli == sum(r.psi_milli for r in rows_by_bucket.values())
    assert t2.drifted_100  # way past the 0.10 band

    # one-sided NEW bucket (in current only) also smooths, not inf
    cur2 = df.unionByName(
        spark.createDataFrame([(9999, "zz")], "id bigint, lang string")
    )
    rep2 = psi_report(df, cur2, "lang")
    zz = [r for r in rep2.collect() if r.bucket == "zz"][0]
    assert zz.a_cnt == 0 and zz.b_cnt == 1


def test_psi_continuous_bucketing_and_counts_path(spark):
    """Round 17: (a) bucketize_numeric labels are the stable explicit-
    edge half-open intervals with tails and a null bucket; (b) the
    pre-aggregated-counts path (psi_report_from_counts — drift between
    STORED rollup snapshots) equals the raw-scan path cell-for-cell,
    including when one side's counts arrive as partial cells that must
    re-sum; (c) bad edges refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.drift import (
        bucketize_numeric,
        psi_report,
        psi_report_from_counts,
    )

    rows = [(i, float(i % 40) if i % 17 else None) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    lab = df.select(bucketize_numeric("v", [0, 10, 20, 30]).alias("b"))
    got = {r.b for r in lab.distinct().collect()}
    assert got == {"null", "[0,10)", "[10,20)", "[20,30)", ">=30"}
    with _pytest.raises(ValueError, match="edges"):
        bucketize_numeric("v", [10, 0])

    a = df.filter("id % 2 = 0").select(
        bucketize_numeric("v", [0, 10, 20, 30]).alias("bucket")
    )
    b = df.filter("id % 2 = 1 and (v is null or v < 20)").select(
        bucketize_numeric("v", [0, 10, 20, 30]).alias("bucket")
    )
    raw = {
        r.bucket: (r.a_cnt, r.b_cnt, r.psi_milli)
        for r in psi_report(a, b, "bucket").collect()
    }
    # counts path: b's counts arrive split into partial cells (re-sum)
    a_counts = a.groupBy("bucket").agg(F.count("*").alias("cnt"))
    b_half1 = b.limit(50).groupBy("bucket").agg(F.count("*").alias("cnt"))
    b_all = b.groupBy("bucket").agg(F.count("*").alias("cnt"))
    # partials: full counts minus the first-50 counts, unioned back
    b_rest = (
        b_all.join(
            b_half1.withColumnRenamed("cnt", "c1"), "bucket", "left"
        )
        .select(
            "bucket",
            (F.col("cnt") - F.coalesce("c1", F.lit(0))).alias("cnt"),
        )
    )
    from_counts = {
        r.bucket: (r.a_cnt, r.b_cnt, r.psi_milli)
        for r in psi_report_from_counts(
            a_counts, b_half1.unionByName(b_rest)
        ).collect()
    }
    assert from_counts == raw


def test_bucketize_numeric_rejects_duplicate_edges(spark):
    """r17 ADVICE hardening: duplicate edges would emit an unreachable
    "[x,x)" label — the validator now requires strictly increasing."""
    import pytest

    from serverless_etl_bi_on_aws_spark.operators.drift import bucketize_numeric

    with pytest.raises(ValueError, match="strictly increasing"):
        bucketize_numeric("x", [0, 0, 10])
    with pytest.raises(ValueError, match="strictly increasing"):
        bucketize_numeric("x", [5])
