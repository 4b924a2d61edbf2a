"""Composed store-maintenance + serving queries (SURVEY.md §2.D).

The streaming stores (§2.D) can never appear in the driver's
correctness sample directly — they are jobs, not queries. Each entry
here closes that gap: it BUILDS a store from the batch tables via the
exact per-batch merge commits the foreachBatch jobs use (split into
rebased half-batches, so the MERGE path — not just a single-shot
aggregate — is what runs), then returns the store's serving read.
The DuckDB twins compute the same result directly from the tables,
so a hash match proves maintenance + serving ≡ batch semantics
end-to-end under the driver's exact gate.

Store directories are fresh tempdirs per invocation (the build is
deterministic, so reruns produce identical stores); at 100 TB these
are the same parquet store layouts the streaming jobs maintain on
shared storage.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tempdir hygiene (ADVICE r8): all store snapshots live under ONE
# per-process root that atexit removes, and each store name keeps
# only its LATEST directory — the previous same-name dir is removed
# when a new invocation starts (by then its serving frame has been
# fully consumed: the driver gate collects before re-invoking, bench
# materializes every run through a noop write). So repeated bench /
# parity runs leave zero orphan parquet trees in /tmp.
_ROOT: list[str] = []          # created lazily: a process that never
_LAST: dict[str, str] = {}     # runs a store query leaves no root


def _dir(name: str) -> str:
    if not _ROOT:
        _ROOT.append(tempfile.mkdtemp(prefix="storeq_"))
        atexit.register(shutil.rmtree, _ROOT[0], ignore_errors=True)
    prev = _LAST.pop(name, None)
    if prev:
        shutil.rmtree(prev, ignore_errors=True)
    d = tempfile.mkdtemp(prefix=f"{name}_", dir=_ROOT[0])
    _LAST[name] = d
    return d


def store_value_quantiles(t: dict[str, DataFrame]) -> DataFrame:
    """Value-histogram store, maintenance + serving: the events table
    splits into two half-batches by event_id parity, each folds in
    through `_merge_value_histogram` (the rebasing sum-merge commit),
    and `read_value_quantiles` serves exact per-type p50/p90/p99 from
    the snapshot head. Equals the quantiles computed directly from
    the table because the store IS the exact per-(type, 1e-4 value)
    count grid — the property the twin verifies."""
    from ..streaming import jobs

    ev = t["events"]
    d = _dir("vh")
    jobs._merge_value_histogram(
        ev.where(F.pmod("event_id", F.lit(2)) == 0), 1, d)
    jobs._merge_value_histogram(
        ev.where(F.pmod("event_id", F.lit(2)) == 1), 2, d)
    return jobs.read_value_quantiles(ev.sparkSession, d)


def store_token_topk(t: dict[str, DataFrame]) -> DataFrame:
    """Token-count store, maintenance + serving: the documents table
    splits into two half-batches by doc_id parity, each folds in
    through `_merge_token_counts` (rebasing sum-merge), and the top
    100 tokens by (cnt DESC, token ASC) serve from the snapshot —
    exactly the corpus token counts, because sum-merge over a
    partition of the corpus is the corpus aggregate."""
    from ..streaming import jobs

    docs = t["documents"]
    d = _dir("tok")
    jobs._merge_token_counts(
        docs.where(F.pmod("doc_id", F.lit(2)) == 0), 1, d)
    jobs._merge_token_counts(
        docs.where(F.pmod("doc_id", F.lit(2)) == 1), 2, d)
    return (jobs.read_latest_snapshot(docs.sparkSession, d)
            .orderBy(F.desc("cnt"), F.asc("token"))
            .limit(100))


def store_audience_overlap(t: dict[str, DataFrame]) -> DataFrame:
    """Audience-bitmap store, maintenance + serving: three keyed-MERGE
    delta commits (events split by user_id mod 3 — deltas touch
    disjoint user blocks AND shared ones, exercising the bit_or
    fold), then `read_audience_overlap` serves the click/purchase
    audience intersection report from the base + delta manifest.
    Equals direct distinct-user set algebra on the table because the
    bitmaps are exact user sets."""
    from ..streaming import jobs

    ev = t["events"]
    d = _dir("aud")
    for i in range(3):
        jobs._merge_audience_bitmaps(
            ev.where(F.pmod("user_id", F.lit(3)) == i), i + 1, d)
    return jobs.read_audience_overlap(ev.sparkSession, d)


def store_heavy_hitters(t: dict[str, DataFrame]) -> DataFrame:
    """Misra-Gries heavy-hitter store, maintenance + serving: the
    documents table splits into two half-batches by doc_id parity,
    each folds in through `_merge_heavy_hitters` (reduce-to-k with
    the rebased decrement ledger), and `read_heavy_hitters` serves
    the final ≤ k summary with its error bound. The twin replays
    BOTH reduce stages in SQL (batch-1 counts → dec₁ → surviving
    counts; + batch-2 counts → dec₂ → final), proving the mergeable-
    summary algebra (Agarwal et al., SIGMOD'12) — not merely the
    serving read — matches across engines."""
    from ..streaming import jobs

    docs = t["documents"]
    d = _dir("hh")
    jobs._merge_heavy_hitters(
        docs.where(F.pmod("doc_id", F.lit(2)) == 0), 1, d)
    jobs._merge_heavy_hitters(
        docs.where(F.pmod("doc_id", F.lit(2)) == 1), 2, d)
    return jobs.read_heavy_hitters(docs.sparkSession, d)


def store_skyline(t: dict[str, DataFrame]) -> DataFrame:
    """Skyline store, maintenance + serving: orders split into two
    half-batches by o_orderkey parity, each folds in through
    `_merge_skyline` (frontier-merge: the skyline of a union equals
    the skyline of the union of skylines — the dominance-algebra
    property the store relies on), and `read_skyline` serves the
    committed frontier. Equals `orders_skyline_2d` computed directly
    on the table — the twin IS that query."""
    from ..streaming import jobs

    o = t["orders"]
    d = _dir("sky")
    jobs._merge_skyline(
        o.where(F.pmod("o_orderkey", F.lit(2)) == 0), 1, d)
    jobs._merge_skyline(
        o.where(F.pmod("o_orderkey", F.lit(2)) == 1), 2, d)
    return jobs.read_skyline(o.sparkSession, d)


def store_lifecycle(t: dict[str, DataFrame]) -> DataFrame:
    """User-lifecycle store, maintenance + serving: events split into
    two half-batches by event_id parity, each folds in through
    `_merge_lifecycle` (idempotent min-of-mins / max-of-maxes — the
    first-seen-store discipline), and `read_lifecycle_stages`
    finishes the snapshot into the (stage, n_users) report against
    the store's own frontier. Equals `user_lifecycle_stages` computed
    directly on the table because per-user min/max over a partition
    of the corpus is the corpus min/max."""
    from ..streaming import jobs

    ev = t["events"]
    d = _dir("life")
    jobs._merge_lifecycle(
        ev.where(F.pmod("event_id", F.lit(2)) == 0), 1, d)
    jobs._merge_lifecycle(
        ev.where(F.pmod("event_id", F.lit(2)) == 1), 2, d)
    return jobs.read_lifecycle_stages(ev.sparkSession, d)
