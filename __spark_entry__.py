"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (q1 pricing summary) on sf0.001.
queries()     -> every implemented SURVEY.md §2 operator.
oracle_sql()  -> DuckDB twins (see openlmis_distributions_etl_spark/oracles.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openlmis_distributions_etl_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
