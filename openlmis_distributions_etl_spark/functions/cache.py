"""Bounded cache retention for operators that persist() intermediates.

Some operators (LSH bands, simhash token stream, BM25 doc stats) must
keep an intermediate cached PAST their own return, because the caller
(driver/tests) triggers the action on the returned plan later. A bare
``persist()`` there leaks: a 61-query sequential replay in one session
accumulates every cache and pressures executor memory/disk at larger
scale factors.

``retain()`` persists and registers the DataFrame; ``release_retained``
unpersists everything registered so far. The query registry calls
``release_retained()`` at the START of each query build — queries run
sequentially (driver, bench, parity tests), so by the time query N+1
is being built, query N's action has completed and its caches are
dead. Live caches are therefore bounded by one query's working set,
not the whole replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_RETAINED: list[DataFrame] = []


def retain(df: DataFrame,
           level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER,
           ) -> DataFrame:
    """Persist ``df`` and register it for deferred release."""
    df.persist(level)
    _RETAINED.append(df)
    return df


def register(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for deferred release."""
    _RETAINED.append(df)
    return df


def release_retained() -> int:
    """Unpersist every retained cache; returns how many were released."""
    n = len(_RETAINED)
    while _RETAINED:
        _RETAINED.pop().unpersist()
    return n
