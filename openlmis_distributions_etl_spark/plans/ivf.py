"""IVF index maintenance: health-triggered Lloyd re-training with
versioned centroid publication (SURVEY.md §2.F — closes the serving
loop the audits opened).

`ivf_cluster_stats` (balance) and `ivf_cluster_purity` (label
mixing) are the read-only audits; this plan WIRES them to action.
`maintain_ivf` reads the published centroid set from its versioned
store, computes per-cell health against the CURRENT embedding
snapshot (one zero-shuffle argmax-assignment scan + k-row
aggregates), and when any fence breaks — a jumbo cell hoarding more
than `max_share` of the vectors, a cell mixing labels below
`min_purity`, or a cell that lost every member — re-runs the
deterministic Lloyd trainer from scratch on the current snapshot and
republishes the centroids as a NEW store version (the old index
stays readable at its version for in-flight queries; RESTORE rolls
back a bad retrain).

Scale shape: health is one embeddings scan against a broadcast
k-row centroid array; the trigger decision collects exactly k rows;
re-training is `kmeans_centroids`' scan-per-iteration Lloyd with
driver state = k centroids. Nothing here is proportional to corpus
size except the scans themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import spread
from ..operators.similarity import _argmax_assign, kmeans_centroids
from ..sources.versioned import read_versioned, write_versioned

IVF_MAX_SHARE = 0.25    # jumbo-cell fence: one cell > 25% of vectors
IVF_MIN_PURITY = 0.08   # mixing fence: majority-label share per cell


def _centroid_arrays(cent_long: DataFrame) -> DataFrame:
    """(centroid_id, dim, centroid) long form -> (centroid_id, cvec)
    dense arrays, dims sorted — the `_argmax_assign` input shape."""
    return (cent_long.groupBy("centroid_id")
            .agg(F.expr(
                "transform(array_sort(collect_list("
                "struct(dim, centroid))), p -> p.centroid)")
                .alias("cvec")))


def train_and_publish(spark: SparkSession, embeddings: DataFrame,
                      store_path: str) -> int:
    """Lloyd-train centroids on the snapshot and publish them as a
    new version of the store (long format: centroid_id, dim,
    centroid, n). Returns the committed version."""
    cent_long = kmeans_centroids({"embeddings": embeddings})
    return write_versioned(
        cent_long.select("centroid_id", "dim", "centroid", "n"),
        store_path, mode="overwrite")


def ivf_health(embeddings: DataFrame, cent: DataFrame) -> DataFrame:
    """Per-cell health against a centroid table (centroid_id, cvec):
    (centroid_id, n_vectors, share, majority_count, purity) — one
    assignment scan, k result rows. Cells that lost every member
    surface with n_vectors = 0 (purity NULL)."""
    a = _argmax_assign(
        spread(embeddings).select("vec_id", "label", "embedding"),
        cent)
    cells = (a.groupBy("centroid_id", "label")
             .agg(F.count(F.lit(1)).alias("c")))
    g = (cells.groupBy("centroid_id")
         .agg(F.sum("c").alias("n_vectors"),
              F.max("c").alias("majority_count")))
    # total via a window over the k-row frame (bounded), empty cells
    # via the centroid table's left side
    out = (cent.select("centroid_id")
           .join(g, "centroid_id", "left")
           .select("centroid_id",
                   F.coalesce("n_vectors", F.lit(0).cast("long"))
                   .alias("n_vectors"),
                   F.coalesce("majority_count", F.lit(0).cast("long"))
                   .alias("majority_count")))
    w = F.sum("n_vectors").over(Window.partitionBy())
    return out.select(
        "centroid_id", "n_vectors",
        (F.col("n_vectors") / w).alias("share"),
        "majority_count",
        F.when(F.col("n_vectors") > 0,
               F.col("majority_count").cast("double")
               / F.col("n_vectors")).alias("purity"))


def maintain_ivf(spark: SparkSession, embeddings: DataFrame,
                 store_path: str,
                 max_share: float = IVF_MAX_SHARE,
                 min_purity: float = IVF_MIN_PURITY) -> dict:
    """The maintenance decision: audit the published index against
    the current snapshot; retrain + republish iff a fence breaks.
    Returns {"retrained", "reasons", "version", "health"} where
    health is the k-row report (collected — bounded by k)."""
    cent = _centroid_arrays(read_versioned(spark, store_path))
    health = ivf_health(embeddings, cent).collect()
    reasons = sorted({
        reason
        for r in health
        for reason, hit in (
            ("empty_cell", r["n_vectors"] == 0),
            ("jumbo_cell", r["share"] is not None
             and r["share"] > max_share),
            ("impure_cell", r["purity"] is not None
             and r["purity"] < min_purity),
        ) if hit})
    if not reasons:
        return {"retrained": False, "reasons": [], "version": None,
                "health": health}
    version = train_and_publish(spark, embeddings, store_path)
    return {"retrained": True, "reasons": reasons,
            "version": version, "health": health}
