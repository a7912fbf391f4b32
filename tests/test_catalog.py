"""Catalog layer (S6): temp-view and persistent-table registration — the
crawler → Data Catalog → query-by-name path, plus the federation story
(warehouse and event tables joinable in one SQL statement, J5)."""

from __future__ import annotations

from serverless_etl_bi_on_aws_spark.catalog import (
    register_as_catalog_tables,
    register_tables,
)

from tests.conftest import SF_SMOKE


def test_register_tables_and_query_by_name(spark):
    register_tables(spark, SF_SMOKE)
    out = spark.sql(
        """
        SELECT o.o_orderstatus, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_orderstatus
        """
    ).collect()
    assert sum(r.n for r in out) == 1500


def test_federated_join_warehouse_x_events(spark):
    """J5 (README.md:92-94): the Redshift-Spectrum federation collapses to a
    plain join once both sides live in one catalog."""
    register_tables(spark, SF_SMOKE)
    out = spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n_events
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    ).collect()
    assert sum(r.n_events for r in out) == 1000


def test_register_as_catalog_tables(spark):
    register_as_catalog_tables(spark, SF_SMOKE, database="dwh_t")
    n = spark.sql("SELECT count(*) AS n FROM dwh_t.region").collect()[0].n
    assert n == 5
    assert spark.catalog.tableExists("dwh_t.lineitem")
