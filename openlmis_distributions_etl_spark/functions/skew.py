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


# partial aggregate per spec name → (build partial, combine partials)
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, tuple[str, Column | str]],
               n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates:
    partial on (keys, salt), final on keys.

    ``aggs`` maps output column name → ``(op, column)`` where ``op``
    is one of ``sum``/``count``/``min``/``max``. The spec is explicit
    (no Catalyst reflection) so it works identically under classic
    Spark and Spark Connect. Distinct aggregates are rejected:
    per-salt distincts overlap across salts, so summing partials
    overcounts — they are not salt-algebraic.
    """
    def spec(name: str, entry: tuple[str, Column | str]):
        op, col = entry
        op = op.lower()
        if "distinct" in op:
            raise ValueError(
                f"distinct aggregate is not salt-combinable: {op}")
        if op not in _COMBINERS:
            raise ValueError(f"non-algebraic aggregate for salted_agg: {op}")
        return _COMBINERS[op], col

    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[spec(name, entry)[0][0](entry[1]).alias(f"__p_{name}")
          for name, entry in aggs.items()])
    return partial.groupBy(*keys).agg(
        *[spec(name, entry)[0][1](F.col(f"__p_{name}")).alias(name)
          for name, entry in aggs.items()])
