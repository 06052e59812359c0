"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``apache_spark_link_prediction_spark.queries`` — the
registry of every implemented operator (SURVEY.md §2 + LLM-pipeline
extensions) with DuckDB oracle twins where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from apache_spark_link_prediction_spark.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: edge list → null-safe
    double self-join against the node table → pairwise features
    (J1+J2+F2/F3/F4 in one plan; SURVEY.md §7 step 1)."""
    return QUERIES["pair_features_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins (same column names/values); approx/ML/seeded
    operators are deliberately omitted → rows-only check."""
    return dict(ORACLE)
