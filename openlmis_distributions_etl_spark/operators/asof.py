"""As-of (temporal) join — an operator Spark lacks natively
(SURVEY.md §2.C extension; DuckDB's ASOF JOIN is the oracle).

Implementation is the scalable union-sort pattern rather than a
per-key lookup join: tag both sides, union them, and carry the right
side's latest value forward with last(ignorenulls) over a
(key, time, tag)-ordered window. One shuffle on the join key, no
row-by-row probing, no broadcast requirement on either side — exactly
how a 100 TB backfill wants it. Strictness: at equal timestamps the
right row sorts AFTER the left probe (tag ordering), so matches are
strictly earlier (right_ts < left_ts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import ts_us


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str, right_ts: str,
                       value_cols: list[str],
                       tiebreak: list[str] | None = None) -> DataFrame:
    """For each left row, attach the right row's values as of the
    latest right_ts strictly before left_ts (NULL when none). Output:
    left columns + ``asof_<value_col>`` columns.

    When multiple right rows share (key, right_ts), the winner is the
    one greatest under ``tiebreak`` (right-side column names, must be a
    subset of ``value_cols``; defaults to ``value_cols``) — so the
    result is deterministic, never "whichever task finished last".
    """
    tiebreak = list(tiebreak) if tiebreak is not None else list(value_cols)
    missing = set(tiebreak) - set(value_cols)
    if missing:
        raise ValueError(f"asof_join_backward: tiebreak columns must be "
                         f"in value_cols: {sorted(missing)}")
    reserved = {"_ts", "_tag"} | {f"_v_{c}" for c in value_cols} \
        | {f"asof_{c}" for c in value_cols}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"asof_join_backward: left columns collide "
                         f"with internal names: {sorted(clash)}")
    lt = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"), F.lit(0).alias("_tag"))
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"), F.lit(1).alias("_tag"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols])
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # left probes sort before right rows at equal _ts (tag 0 < 1) and
    # the frame ends at the previous row, so a probe only sees right
    # rows with strictly smaller _ts; tied right rows are ordered by
    # the tiebreak columns so last() picks a deterministic winner
    # (left rows carry NULLs there, which sort first and stay put)
    w = (Window.partitionBy(key)
         .orderBy("_ts", "_tag", *[f"_v_{c}" for c in tiebreak])
         .rowsBetween(Window.unboundedPreceding, -1))
    carried = unioned.select(
        *unioned.columns,
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in value_cols])
    return (carried.where(F.col("_tag") == 0)
            .drop("_ts", "_tag", *[f"_v_{c}" for c in value_cols]))


def asof_purchase_attribution(t: dict[str, DataFrame]) -> DataFrame:
    """Attribute each purchase to the user's most recent strictly-prior
    click (classic last-touch attribution as an as-of join)."""
    ev = t["events"].select("event_id", "user_id", "event_type",
                            ts_us("ts").alias("ts_us"))
    purchases = ev.where(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts_us")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("user_id", "ts_us", F.col("ts_us").alias("click_ts_us"))
    joined = asof_join_backward(
        purchases, clicks, key="user_id",
        left_ts="ts_us", right_ts="ts_us",
        value_cols=["click_ts_us"])
    return joined.select(
        "event_id", "user_id", "ts_us",
        F.col("asof_click_ts_us").alias("last_click_ts_us"),
        (F.col("ts_us") - F.col("asof_click_ts_us")).alias("gap_us"))


def asof_join_forward(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str,
                      value_cols: list[str],
                      tiebreak: list[str] | None = None) -> DataFrame:
    """Forward twin of asof_join_backward: for each left row, attach
    the right row's values as of the EARLIEST right_ts strictly after
    left_ts (NULL when none) — the time-to-next-event shape. Same
    union-sort scalability (one shuffle on the key); at equal
    timestamps the right row sorts BEFORE the probe (tag ordering), so
    the strictly-after frame never sees it. Tied right rows order by
    ``tiebreak`` ascending and first() picks the smallest — forward
    mirror of backward's greatest-wins."""
    tiebreak = list(tiebreak) if tiebreak is not None else list(value_cols)
    missing = set(tiebreak) - set(value_cols)
    if missing:
        raise ValueError(f"asof_join_forward: tiebreak columns must be "
                         f"in value_cols: {sorted(missing)}")
    reserved = {"_ts", "_tag"} | {f"_v_{c}" for c in value_cols} \
        | {f"asof_{c}" for c in value_cols}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"asof_join_forward: left columns collide "
                         f"with internal names: {sorted(clash)}")
    lt = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"), F.lit(1).alias("_tag"))
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"), F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols])
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (Window.partitionBy(key)
         .orderBy("_ts", "_tag", *[f"_v_{c}" for c in tiebreak])
         .rowsBetween(1, Window.unboundedFollowing))
    carried = unioned.select(
        *unioned.columns,
        *[F.first(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in value_cols])
    return (carried.where(F.col("_tag") == 1)
            .drop("_ts", "_tag", *[f"_v_{c}" for c in value_cols]))


def asof_time_to_purchase(t: dict[str, DataFrame]) -> DataFrame:
    """Time-to-conversion: for each click, the user's NEXT purchase
    strictly after it (forward as-of join) and the gap — the
    conversion-latency metric funnels report on."""
    ev = t["events"].select("event_id", "user_id", "event_type",
                            ts_us("ts").alias("ts_us"))
    clicks = ev.where(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts_us")
    purchases = ev.where(F.col("event_type") == "purchase") \
        .select("user_id", "ts_us", F.col("ts_us").alias("purchase_ts_us"))
    joined = asof_join_forward(
        clicks, purchases, key="user_id",
        left_ts="ts_us", right_ts="ts_us",
        value_cols=["purchase_ts_us"])
    return joined.select(
        "event_id", "user_id", "ts_us",
        F.col("asof_purchase_ts_us").alias("next_purchase_ts_us"),
        (F.col("asof_purchase_ts_us") - F.col("ts_us")).alias("gap_us"))


def asof_nearest_click(t: dict[str, DataFrame]) -> DataFrame:
    """Nearest-in-time as-of: attach to each purchase the user's click
    CLOSEST in time, before or after (the sensor-alignment join —
    match a reading to the nearest reference sample). Composes the
    backward and forward passes (each one shuffle on the key) and
    picks the smaller absolute gap; exact ties break to the earlier
    (backward) click. NULL-safe: a side with no match loses to the
    other; no match at all → NULLs."""
    ev = t["events"].select("event_id", "user_id", "event_type",
                            ts_us("ts").alias("ts_us"))
    purchases = ev.where(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts_us")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("user_id", "ts_us", F.col("ts_us").alias("click_ts_us"))
    back = asof_join_backward(
        purchases, clicks, key="user_id",
        left_ts="ts_us", right_ts="ts_us",
        value_cols=["click_ts_us"]).withColumnRenamed(
        "asof_click_ts_us", "back_ts")
    both = asof_join_forward(
        back, clicks, key="user_id",
        left_ts="ts_us", right_ts="ts_us",
        value_cols=["click_ts_us"]).withColumnRenamed(
        "asof_click_ts_us", "fwd_ts")
    back_gap = F.col("ts_us") - F.col("back_ts")
    fwd_gap = F.col("fwd_ts") - F.col("ts_us")
    take_back = (F.col("back_ts").isNotNull()
                 & (F.col("fwd_ts").isNull() | (back_gap <= fwd_gap)))
    nearest = F.when(take_back, F.col("back_ts")).otherwise(F.col("fwd_ts"))
    return (both.select(
        "event_id", "user_id", "ts_us",
        nearest.alias("nearest_click_ts_us"),
        F.when(take_back, back_gap)
        .otherwise(F.when(F.col("fwd_ts").isNotNull(), fwd_gap))
        .alias("abs_gap_us")))
