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


def run_etl(spark: SparkSession, sf_dir: str, out_dir: str,
            metrics: dict[str, dict] | None = None) -> dict[str, str]:
    """Build and load the distribution marts. Returns mart → path.

    Pass ``metrics={}`` to collect per-mart load observability — row
    counts measured IN the load job itself via ``Observation``
    (df.observe rides the existing action; no second count() pass over
    the data — the free-metrics contract an ETL scheduler alerts on)."""
    from pyspark.sql import Observation

    t = load_tables(spark, sf_dir)
    marts: dict[str, str] = {}

    def load(name: str, df, partition_by=()):
        path = f"{out_dir}/{name}"
        if metrics is not None:
            obs = Observation(name)
            df = df.observe(obs, F.count(F.lit(1)).alias("rows_loaded"))
        write_partitioned_parquet(df, path, partition_by=partition_by)
        if metrics is not None:
            metrics[name] = obs.get
        marts[name] = path

    flat = star.star_denormalize(t).withColumn(
        "order_year", F.substring("orderdate", 1, 4))
    # partition by year: bounded directory fan-out, prunes time-range scans
    load("fact_lineitem_flat", flat, partition_by=["order_year"])
    load("mart_monthly_sales", star.monthly_sales_rollup(t))
    return marts
