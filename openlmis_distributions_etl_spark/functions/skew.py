"""Skew mitigation helpers (SURVEY.md §6).

AQE's skew-join splitting handles most cases at runtime; explicit
salting is for the aggregation-side hot keys AQE can't split (a single
group key receiving 1% of a 100 TB fact). Pattern: two-phase aggregate
— partial aggregate on (key, salt), final aggregate on key. Both
phases map-side combine, so the hot key's traffic divides by
n_salts before the wide shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16,
              col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts) — hash-based, not
    rand(), so retries/speculative tasks produce identical rows."""
    # mix in the partition id: identical rows (the duplicate-heavy hot
    # keys salting targets) would otherwise hash to one salt bucket.
    # spark_partition_id is stable under task retry (same partition →
    # same id), so speculative re-execution still produces equal rows.
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*df.columns) + F.spark_partition_id(),
               F.lit(n_salts)))


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, Column], n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates
    (sum/count/min/max): partial on (keys, salt), final on keys.

    ``aggs`` maps output column name → aggregate over the input; the
    final phase re-aggregates partials with the matching combiner.
    """
    salted = with_salt(df, n_salts)
    partial = (salted.groupBy(*keys, "_salt")
               .agg(*[c.alias(f"__p_{name}") for name, c in aggs.items()]))

    def combiner(name: str, c: Column) -> Column:
        # sum and count both combine by sum; min/max by themselves
        node = c._jc.node()
        fn = node.functionName().lower()
        src = F.col(f"__p_{name}")
        if node.isDistinct():
            # per-salt distincts overlap across salts; summing them
            # overcounts — distinct aggregates are not salt-algebraic
            raise ValueError(
                f"distinct aggregate is not salt-combinable: {fn}(DISTINCT)")
        if fn.startswith("count") or fn.startswith("sum"):
            return F.sum(src).alias(name)
        if fn.startswith("min"):
            return F.min(src).alias(name)
        if fn.startswith("max"):
            return F.max(src).alias(name)
        raise ValueError(f"non-algebraic aggregate for salted_agg: {fn}")

    return partial.groupBy(*keys).agg(
        *[combiner(name, c) for name, c in aggs.items()])
