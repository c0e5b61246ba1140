"""tb_lakehouse_enhanced_spark — a PySpark-native lakehouse analytics engine.

Greenfield re-expression of the capabilities of the reference project
``geraldherrera/tb-lakehouse-enhanced`` (an Azure/Databricks medallion
lakehouse: bronze JDBC ingestion, silver SCD2 history, gold star schema,
BI aggregation queries), built Spark-first on the DataFrame/SQL API so
Catalyst + Tungsten pick the physical strategy.

Layout
------
- ``session``    SparkSession factory (AQE, tuned shuffle partitions, UTC).
- ``sources``    Source adapters (parquet for tests, JDBC-shaped for prod)
                 and the parquet-backed managed-table layer used by the
                 merge/DML operators.
- ``operators``  SCD1/SCD2 merge engine, fact builder, calendar spine,
                 dedup / similarity / multimodal operators.
- ``functions``  Column-level helpers (text analysis, JSON, hashing).
- ``plans``      The declared query inventory (SURVEY.md §2 coverage).
- ``streaming``  Structured Streaming wrappers (tumbling windows, state).
"""

__version__ = "0.1.0"
