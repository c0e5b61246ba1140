from .queries import SPARK_QUERIES, ORACLE_SQL  # noqa: F401
