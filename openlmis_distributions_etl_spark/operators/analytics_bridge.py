"""Driver-side bridge from the exact covariance cells to dense numpy
structures (used by PCA). Kept out of analytics.py so the numpy import
stays local to the consumers that need it."""

from __future__ import annotations

from pyspark.sql import DataFrame


def covariance_matrix(t: dict[str, DataFrame]):
    """Collect `embedding_covariance`'s d(d+1)/2 exact cells into a
    dense symmetric numpy matrix plus the per-dimension means.
    The cells are integer-exact sums, so the matrix is bit-identical
    across runs and partitionings — the property that makes the
    driver-side eigendecomposition deterministic."""
    import numpy as np

    from .analytics import COV_QUANT, embedding_covariance
    rows = embedding_covariance(t).collect()
    d = max(r["j"] for r in rows) + 1
    cov = np.zeros((d, d))
    sums = {}
    n = rows[0]["n"]
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    # per-dim means from the diagonal rows' exact component sums are
    # not emitted; recompute from the same quantized column directly
    emb = t["embeddings"]
    from pyspark.sql import functions as F
    q = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
        f"* {COV_QUANT}.0 + 0.5) AS BIGINT))")
    agg = (emb.select(q.alias("q"))
           .select(F.posexplode("q").alias("i", "x"))
           .groupBy("i")
           .agg(F.sum("x").cast("decimal(38,0)").alias("sx"),
                F.count(F.lit(1)).alias("n")))
    means = [0.0] * d
    for r in agg.collect():
        means[r["i"]] = float(r["sx"]) / float(r["n"]) / COV_QUANT
    return cov, means
