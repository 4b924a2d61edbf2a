"""Parquet source layer for the canonical table set.

Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning available — operators
downstream select only the columns they need and the scan node prunes
(`ReadSchema` in .explain shows the narrow projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# reference targets (geography/product/supplier dims grow ~linearly in
# facilities, not in fact volume).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


# Columns written as parquet TIMESTAMP(NANOS), which Spark cannot read
# natively: read as raw nanos (legacy conf) and floor-divide to micros —
# the same truncation DuckDB applies when casting ns→TIMESTAMP, so the
# two engines see identical values.
NANOS_TS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Memoize the DataFrame handle per (session, path): a repeated
    # load otherwise re-reads the parquet footer and rebuilds the scan
    # relation over py4j on every query construction — pure
    # driver-side latency. The cache lives on the session object, so
    # it dies with the session and never leaks across restarts.
    try:
        cache = spark._openlmis_table_cache
    except AttributeError:
        cache = spark._openlmis_table_cache = {}
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    if name in NANOS_TS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANOS_TS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    cache[key] = df
    return df


class LazyTables(dict):
    """Mapping table-name → DataFrame that defers the parquet footer
    read until a table is actually used — operators receive the full
    catalog but only touch their inputs (a query over one table costs
    one footer read, not ten)."""

    def __init__(self, spark: SparkSession, sf_dir: str,
                 names: tuple[str, ...]):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir
        self._names = names

    def __missing__(self, name: str) -> DataFrame:
        if name not in self._names:
            raise KeyError(name)
        df = load_table(self._spark, self._sf_dir, name)
        self[name] = df
        return df

    # dict.get/in/iter/len bypass __missing__; reflect the full catalog
    def __contains__(self, name: object) -> bool:
        return name in self._names

    def __iter__(self):
        return iter(self._names)

    def __len__(self) -> int:
        return len(self._names)

    def get(self, name, default=None):
        try:
            return self[name]
        except KeyError:
            return default

    def keys(self):
        return list(self._names)

    def items(self):
        return [(n, self[n]) for n in self._names]

    def values(self):
        return [self[n] for n in self._names]


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TABLES
    return LazyTables(spark, sf_dir, use)
