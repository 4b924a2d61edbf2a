"""Shared Column expression helpers.

The central design rule: every aggregate the oracle gate checks must be
**order-independent**, because Spark sums partitions in nondeterministic
order while DuckDB sums sequentially. Double-precision sums are order
dependent in the last ulps, so all money/measure sums run in exact
decimal arithmetic (cast at the scan, summed exactly, cast back to
double for a stable presentation value). This also matches warehouse
semantics at 100 TB: decimal sums don't drift with partition count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,4)"   # prices / measures (2-dec data, headroom)
RATE = "decimal(8,4)"     # discounts / tax rates in [0,1]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec(c: Column | str, typ: str = MONEY) -> Column:
    """Exact-decimal view of a double measure column."""
    return _col(c).cast(typ)


def dsum_of(expr: Column) -> Column:
    """Order-independent sum of a decimal expression, presented as
    double.

    The intermediate cast to decimal(38,6) matters: the source data has
    ≤6 real decimals (so the cast is exact), and it keeps the scaled
    integer below 2^53 — DuckDB's decimal→double cast converts the raw
    int128 through double and is lossy above that, while Spark's
    BigDecimal cast is correctly rounded. At scale 6 both engines
    produce the same correctly-rounded double.
    """
    return F.sum(expr).cast("decimal(38,6)").cast("double")


def dsum(c: Column | str, typ: str = MONEY) -> Column:
    """Order-independent sum of a double measure, presented as double."""
    return dsum_of(dec(c, typ))


def davg(c: Column | str, typ: str = MONEY) -> Column:
    """avg = exact decimal sum cast to double, divided by count (IEEE
    division on identical operands → bit-identical across engines)."""
    return dsum(c, typ) / F.count(F.lit(1))


def disc_price(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """extendedprice * (1 - discount), exact decimal.

    decimal(18,4) × decimal(8,4) stays within precision 38 in both
    Spark and DuckDB, so no precision-loss rounding on either side.
    """
    return dec(price) * (F.lit(1).cast(RATE) - dec(discount, RATE))


def charge(price: str = "l_extendedprice", discount: str = "l_discount",
           tax: str = "l_tax") -> Column:
    return disc_price(price, discount) * (F.lit(1).cast(RATE) + dec(tax, RATE))


def spread(df, min_parts: int | None = None):
    """Repartition a DataFrame up to the cluster's parallelism if its
    scan produced fewer partitions — CPU-heavy per-row operators
    (hashing, vector math) otherwise serialize on however many row
    groups the file happened to have. No-op when the source already
    has enough partitions (the 100 TB case), so the extra exchange
    only ever appears when it pays for itself.
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def pin(df, **cols: Column):
    """Append expression columns that are guaranteed to evaluate
    exactly ONCE per row, by routing them through a Generate node
    (``inline(array(struct(...)))``).

    Catalyst's CollapseProject / PushDownPredicates substitute a
    projected expression into every downstream reference — including
    per-element lambda bodies and join conditions. For an expensive
    expression (a 64-step vector fold, a signature hash) that turns
    "compute once, reuse" into "recompute per element / per join
    probe". No optimizer rule substitutes through a Generate's output
    attributes, so pinned columns are real row values: a filter on a
    pinned score stays ABOVE the projection instead of being cloned
    into a nested-loop join condition.
    """
    gen = F.inline(F.array(F.struct(
        *[c.alias(n) for n, c in cols.items()])))
    return df.select("*", gen)


def ts_us(c: Column | str) -> Column:
    """Timestamps cross the oracle boundary as epoch microseconds
    (bigint) — immune to timezone/format differences between engines."""
    return F.unix_micros(_col(c))


def month_key(c: Column | str) -> Column:
    """Calendar-month bucket as a portable 'yyyy-MM' string."""
    return F.date_format(_col(c), "yyyy-MM")


def register_sql_functions(spark) -> list[str]:
    """Register the engine's vector/text helpers as SQL-callable
    functions so the `spark.sql` front-end can use them inline:

      cosine_sim(a, b)   — in-order fold cosine over float arrays
      l2_norm_sql(a)     — L2 norm, same fold
      stable_bucket(s,n) — deterministic md5 bucket in [0, n)

    Implemented as SQL-expression UDFs via one CREATE FUNCTION each
    (JVM-evaluated, codegen-friendly — NOT Python UDFs)."""
    defs = {
        "cosine_sim": (
            "CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(a ARRAY<FLOAT>, "
            "b ARRAY<FLOAT>) RETURNS DOUBLE RETURN "
            "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * "
            "CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v) / "
            "(sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * "
            "CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v)) * "
            "sqrt(aggregate(transform(b, x -> CAST(x AS DOUBLE) * "
            "CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v)))"),
        "l2_norm_sql": (
            "CREATE OR REPLACE TEMPORARY FUNCTION l2_norm_sql(a "
            "ARRAY<FLOAT>) RETURNS DOUBLE RETURN "
            "sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * "
            "CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v))"),
        "stable_bucket": (
            "CREATE OR REPLACE TEMPORARY FUNCTION stable_bucket(s STRING, "
            "n INT) RETURNS INT RETURN "
            "CAST(conv(substring(md5(s), 1, 15), 16, 10) % n AS INT)"),
    }
    for ddl in defs.values():
        spark.sql(ddl)
    return sorted(defs)
