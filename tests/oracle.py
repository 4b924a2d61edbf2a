"""Local replay of the driver's DuckDB-oracle correctness gate.

Stricter than the driver: rows are compared for *exact* equality
(floats bit-for-bit) after sorting columns by name and rows by value —
this is what forces the order-independent numeric design in
functions/__init__.py.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize numeric width (int32→int64, float32→float64) the way
    # the driver's hash does, but keep int-vs-float distinct: that gap
    # is a real engine divergence (r01's HUGEINT→float64 widening)
    for col in df.columns:
        kind = df[col].dtype.kind
        if kind == "i":
            df[col] = df[col].astype("int64")
        elif kind == "u":
            df[col] = df[col].astype("uint64")
        elif kind == "f":
            df[col] = df[col].astype("float64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last")
    return df.reset_index(drop=True)


def _eq(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)) \
            or (isinstance(b, float) and math.isnan(b)):
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an and bn
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    try:
        return bool(a == b)
    except (TypeError, ValueError):
        return str(a) == str(b)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            name: str = "?") -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    # dtype-sensitive like the driver's value hash: int64 5 vs float64
    # 5.0 must FAIL (caught r01's DuckDB HUGEINT→float64 widening)
    for col in got.columns:
        gd, wd = str(got[col].dtype), str(want[col].dtype)
        assert gd == wd, (
            f"{name}: column {col}: dtype {gd} (spark) != {wd} (oracle)")
    for col in got.columns:
        gv, wv = got[col].tolist(), want[col].tolist()
        bad = [(i, g, w) for i, (g, w) in enumerate(zip(gv, wv))
               if not _eq(g, w)]
        assert not bad, (
            f"{name}: column {col}: {len(bad)} mismatches, first 3: {bad[:3]}")
