"""IO-layer tests: CSV contract (S1/S2), partitioned parquet + pruning
(S4/S5), multi-file ingest with filename lineage (S7/S8), JDBC option
validation (S3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.sources.csv_source import read_csv_contract
from serverless_etl_bi_on_aws_spark.sources.ingest import ingest_all_files, ingest_named_file
from serverless_etl_bi_on_aws_spark.sources.jdbc import jdbc_table
from serverless_etl_bi_on_aws_spark.sources.parquet_io import funnel_file_etl

from tests.conftest import SF_SMOKE


def test_csv_contract_quotes_header_invalid_chars(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        'id,name,price\n'
        '1,"plain",10.5\n'
        '2,"with,comma",11.0\n'
        '3,"with""quote",12.0\n'
        "4,bad\x01char,13.0\n"
    )
    df = read_csv_contract(spark, str(p))
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 4  # header skipped, all data rows survive
    assert rows[2].name == "with,comma"  # quoted delimiter
    assert rows[3].name == 'with"quote'  # escaped quote
    assert rows[4].name == "bad?char"  # acceptinvchars analog
    assert rows[1].price == 10.5  # schema inferred


def test_funnel_etl_partitioned_write_and_pruning(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "funnel")
    back = funnel_file_etl(spark, events, out)
    # derived partition columns exist and directories are hive-style
    assert {"year", "month"} <= set(back.columns)
    assert any(d.startswith("year=") for d in os.listdir(out))
    # partition pruning: a year/month predicate must reach PartitionFilters
    pruned = back.filter((F.col("year") == 2024) & (F.col("month") == 1))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "year" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() == events.count()  # fixture is all 2024-01


def test_ingest_all_files_lineage(spark, tmp_path):
    for name in ["2016_funnel", "2017_funnel"]:
        (tmp_path / f"{name}.csv").write_text("user_id,event\n1,view\n2,click\n")
    df = ingest_all_files(spark, str(tmp_path / "*.csv"))
    assert df.count() == 4
    assert set(r._source_file for r in df.select("_source_file").distinct().collect()) == {
        "2016_funnel",
        "2017_funnel",
    }


def test_ingest_named_file_is_selective(spark, tmp_path):
    for name in ["2016_funnel", "2017_funnel"]:
        (tmp_path / f"{name}.csv").write_text("user_id,event\n1,view\n")
    df = ingest_named_file(spark, str(tmp_path), "2016_funnel")
    assert df.count() == 1
    assert df.collect()[0]._source_file == "2016_funnel"


def test_jdbc_option_validation(spark):
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_table(spark, "jdbc:mysql://h:3306/db")
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_table(spark, "jdbc:mysql://h:3306/db", table="t", query="select 1")
    with pytest.raises(ValueError, match="lower_bound"):
        jdbc_table(spark, "jdbc:mysql://h:3306/db", table="t", partition_column="id")
