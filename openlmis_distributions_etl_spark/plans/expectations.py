"""Declarative data-quality expectations (SURVEY.md §2.B): a rule set
evaluated in ONE pass over the table, producing a per-rule violation
report — the load-gate pattern (Great-Expectations-style) a warehouse
runs before promoting an ingest batch.

Every rule compiles to a conditional-count aggregate column, so a
whole suite is one map-side-combinable aggregate over one scan —
never a pass per rule. Rules with a secondary table (foreign keys,
uniqueness) add one aggregate/semi-join each, still scan-bounded.

Rule forms (tuples):
    ("not_null", col)
    ("unique", col)                       — duplicate ROWS beyond the
                                            first per value count
    ("in_set", col, (v1, v2, ...))
    ("range", col, lo, hi)                — inclusive bounds
    ("fk", col, other_name, other_col)    — values absent from the
                                            referenced column
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Rule = tuple


def _scalar_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    aggs = []
    for i, r in enumerate(rules):
        kind, col = r[0], r[1]
        if kind == "not_null":
            cond = F.col(col).isNull()
        elif kind == "in_set":
            cond = ~F.col(col).isin(*r[2]) | F.col(col).isNull()
        elif kind == "range":
            cond = (F.col(col) < r[2]) | (F.col(col) > r[3]) \
                | F.col(col).isNull()
        else:
            continue
        aggs.append(F.sum(cond.cast("long")).alias(f"v{i}"))
    if not aggs:
        return None
    return df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)


def run_expectations(df: DataFrame, rules: list[Rule],
                     tables: dict[str, DataFrame] | None = None
                     ) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    (rule_id, rule, column, n_violations, passed)."""
    tables = tables or {}
    scalars = _scalar_rules(df, rules)
    parts = []
    for i, r in enumerate(rules):
        kind, col = r[0], r[1]
        if kind in ("not_null", "in_set", "range"):
            v = scalars.select(F.col(f"v{i}").alias("n_violations"))
        elif kind == "unique":
            v = (df.groupBy(col)
                 .agg(F.count(F.lit(1)).alias("c"))
                 .agg(F.coalesce(
                     F.sum(F.when(F.col("c") > 1, F.col("c") - 1)),
                     F.lit(0)).alias("n_violations")))
        elif kind == "fk":
            _, col, other_name, other_col = r
            other = tables[other_name].select(
                F.col(other_col).alias(col)).distinct()
            v = (df.select(col).where(F.col(col).isNotNull())
                 .join(other, col, "left_anti")
                 .agg(F.count(F.lit(1)).alias("n_violations")))
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        parts.append(v.select(
            F.lit(i).alias("rule_id"),
            F.lit(kind).alias("rule"),
            F.lit(col).alias("column"),
            F.col("n_violations").cast("long").alias("n_violations"),
            (F.col("n_violations") == 0).cast("int").alias("passed")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


ORDERS_RULES: list[Rule] = [
    ("not_null", "o_orderkey"),
    ("unique", "o_orderkey"),
    ("not_null", "o_totalprice"),
    ("range", "o_totalprice", 0.0, 1e9),
    ("in_set", "o_orderstatus", ("F", "O", "P")),
    ("fk", "o_custkey", "customer", "c_custkey"),
]


def orders_expectations(t: dict[str, DataFrame]) -> DataFrame:
    """The expectation suite as a registered report query: the
    standard orders load-gate rule set (keys present and unique,
    price bounds, status domain, customer FK) in one scan-bounded
    pass plus one distinct-count and one anti-join."""
    return run_expectations(t["orders"], ORDERS_RULES, t)
