"""PySpark-native analytics engine with the data-processing capabilities of
manku777/Serverless-ETL-BI-on-AWS (reference: /root/reference/README.md).

The reference is a batch ETL + BI warehouse pipeline (RDS MySQL -> S3 CSV ->
Glue -> Redshift staging/final merge; Glue crawlers + Athena for the
behavioral "funnel" side; QuickSight for BI). This package re-expresses every
one of those behaviors as idiomatic PySpark (DataFrame / SQL / Catalyst /
Structured Streaming), plus the large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) mandated by the
north star — all designed for a 1000-executor / 100 TB deployment even though
tests run on local mode.

Layout:
    session.py    SparkSession factory (AQE, UTC, Arrow, shuffle sizing)
    catalog.py    table registration over the parquet fixtures (crawler analog)
    functions/    scalar/vector/text column expressions (JVM-side first)
    operators/    merge-upsert, dedup family, similarity search, sessionize
    plans/        the named analytic queries + DuckDB oracle SQL
    sources/      CSV/parquet/JDBC/multi-file ingest + multimodal plumbing
    streaming/    incremental file-source pipeline (Lambda/DataPipeline analog)
"""

__version__ = "0.1.0"
