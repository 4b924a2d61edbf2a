"""End-to-end ETL pipeline (the reference's reason to exist): extract
from the canonical sources, conform + denormalize, load partitioned
parquet marts.

Each mart write partitions by a prune-friendly low-cardinality key so
downstream readers skip irrelevant data at the scan. The whole run is
a handful of Spark jobs; nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources import load_tables
from ..sources.sinks import write_partitioned_parquet
from . import star


def run_etl(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Build and load the distribution marts. Returns mart → path."""
    t = load_tables(spark, sf_dir)
    marts: dict[str, str] = {}

    flat = star.star_denormalize(t).withColumn(
        "order_year", F.substring("orderdate", 1, 4))
    path = f"{out_dir}/fact_lineitem_flat"
    # partition by year: bounded directory fan-out, prunes time-range scans
    write_partitioned_parquet(flat, path, partition_by=["order_year"])
    marts["fact_lineitem_flat"] = path

    monthly = star.monthly_sales_rollup(t)
    path = f"{out_dir}/mart_monthly_sales"
    write_partitioned_parquet(monthly, path)
    marts["mart_monthly_sales"] = path

    return marts
