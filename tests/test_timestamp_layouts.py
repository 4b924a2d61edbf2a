"""Timestamp physical-layout contract (the round-3 regression class).

The events table has arrived from the provisioner in at least two
different parquet layouts across rounds — TIMESTAMP(NANOS) and
micros-without-timezone (TIMESTAMP_NTZ to Spark) — and a real lake also
carries UTC-adjusted micros. The source layer must normalize ALL of
them to identical session-tz TIMESTAMP values; this test materializes
the same rows in each layout and asserts `load_table` + `ts_us` agree
bit-for-bit, so an environment re-provision can never silently break
the event-time suite again.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from openlmis_distributions_etl_spark.functions import ts_us
from openlmis_distributions_etl_spark.sources.tables import (load_table,
                                                             normalize_ts)

# epoch micros chosen to exercise sub-second precision
_US = [1_700_000_000_000_000, 1_700_000_000_123_456, 1_700_003_600_999_999]


def _write_events(path: str, ts_array: pa.Array, version: str = "2.6"):
    table = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": ts_array,
        "user_id": pa.array([10, 11, 12], pa.int64()),
        "event_type": pa.array(["a", "b", "c"]),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    })
    pq.write_table(table, path, version=version)


def _layout_dirs(tmp_path):
    layouts = {}

    d = tmp_path / "nanos"
    d.mkdir()
    _write_events(str(d / "events.parquet"),
                  pa.array([u * 1000 for u in _US], pa.timestamp("ns")))
    layouts["int64-nanos"] = str(d)

    d = tmp_path / "ntz"
    d.mkdir()
    _write_events(str(d / "events.parquet"),
                  pa.array(_US, pa.timestamp("us")))
    layouts["micros-ntz"] = str(d)

    d = tmp_path / "utc"
    d.mkdir()
    _write_events(str(d / "events.parquet"),
                  pa.array(_US, pa.timestamp("us", tz="UTC")))
    layouts["micros-utc"] = str(d)

    return layouts


def test_all_layouts_load_identically(spark, tmp_path):
    for name, d in _layout_dirs(tmp_path).items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", \
            f"layout {name}: ts normalized to {dict(df.dtypes)['ts']}"
        got = [r[0] for r in
               df.select(ts_us("ts")).orderBy("event_id").collect()]
        assert got == _US, f"layout {name}: epoch-micros mismatch {got}"


def test_streaming_reader_handles_all_layouts(spark, tmp_path):
    from openlmis_distributions_etl_spark.streaming import jobs

    for name, d in _layout_dirs(tmp_path).items():
        events = jobs.read_events_stream(spark, d)
        assert dict(events.dtypes)["ts"] == "timestamp", \
            f"layout {name}: stream ts is {dict(events.dtypes)['ts']}"
        q = (events.select("event_id", ts_us("ts").alias("us"))
             .writeStream.format("memory")
             .queryName(f"layout_{name.replace('-', '_')}")
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(120)
        got = [r["us"] for r in
               spark.table(f"layout_{name.replace('-', '_')}")
               .orderBy("event_id").collect()]
        assert got == _US, f"layout {name}: stream epoch-micros {got}"


def test_unnormalizable_type_fails_loudly(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("ts"))
    with pytest.raises(TypeError, match=r"events.*'ts'.*got 'string'"):
        normalize_ts(df, "ts", table="events")


def test_missing_required_column_fails_loudly(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "bad"
    d.mkdir()
    pq.write_table(pa.table({"event_id": pa.array([1], pa.int64()),
                             "ts": pa.array([0], pa.timestamp("us"))}),
                   str(d / "events.parquet"))
    with pytest.raises(ValueError, match=r"'events'.*missing required.*user_id"):
        load_table(spark, str(d), "events")
