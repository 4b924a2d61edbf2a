"""Training-data curation pipeline (SURVEY.md §2.B × §2.E composite).

The end-to-end shape every large-scale pretraining ingest runs:
exact-dedup to canonical documents → quality-filter battery →
deterministic train/val/test split. One shuffle total (the dedup
window on the 16-byte content hash); every other step is per-row
projection arithmetic, so the pipeline scales with the scan.

The split is content-free and hash-deterministic (md5 of the doc id
with a salt tag): stable under reruns, task retries, and cluster
re-partitioning — no RNG state, no sampled() nondeterminism — and the
8/1/1 bucket arithmetic is exact integer math in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.text import STOPWORDS_EN, _count_in, tokens


def curation_pipeline(t: dict[str, DataFrame]) -> DataFrame:
    """Curated corpus: canonical (first-seen) copy of each distinct
    text, passing the C4-style filter battery, tagged with its
    train/val/test split."""
    hashed = t["documents"].select(
        "doc_id", "lang", "source", "text",
        F.md5(F.col("text").cast("binary")).alias("text_hash"))
    w = Window.partitionBy("text_hash")
    canon = (hashed
             .withColumn("canonical_id", F.min("doc_id").over(w))
             .where(F.col("doc_id") == F.col("canonical_id")))
    toks = tokens()
    feats = canon.select(
        "doc_id", "lang", "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        _count_in(toks, STOPWORDS_EN).alias("n_stop"),
        F.aggregate(toks, F.lit(0),
                    lambda acc, x: acc + F.length(x)).alias("sum_tok_len"))
    keep = ((F.col("n_tokens") >= 30)
            & (F.col("sum_tok_len") <= 8 * F.col("n_tokens"))
            & (F.col("n_stop") > 0)
            & (10 * F.col("n_distinct") >= F.col("n_tokens")))
    bucket = F.pmod(F.expr(
        "CAST(conv(substring(md5(CAST(concat(CAST(doc_id AS STRING), "
        "'|split') AS BINARY)), 1, 7), 16, 10) AS BIGINT)"), F.lit(10))
    split = (F.when(bucket < 8, "train")
             .when(bucket == 8, "val")
             .otherwise("test"))
    return (feats.where(keep)
            .select("doc_id", "lang", "source", "n_tokens",
                    split.alias("split")))


def run_curation(spark, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Materialize the curated corpus, partitioned by (lang, split):
    downstream trainers read one directory per language/split and the
    scan prunes everything else. Returns output name → path."""
    from ..sources import load_tables
    from ..sources.sinks import write_partitioned_parquet

    t = load_tables(spark, sf_dir)
    out = f"{out_dir}/curated_documents"
    curated = curation_pipeline(t)
    write_partitioned_parquet(curated, out, partition_by=["lang", "split"])
    return {"curated_documents": out}


PLAN_CTX = 2048


def training_corpus_plan(t: dict[str, DataFrame]) -> DataFrame:
    """The end-to-end corpus BUILD SHEET, composed from the suite's
    verified pieces: near-dup clusters collapse to their highest-
    quality member (`dedup_keep_best` policy) → the canonical docs
    take the LEAKAGE-SAFE split (md5 bucket on the dup-graph
    COMPONENT, so a canonical doc and any surviving near-relatives
    can never straddle train/test) → per (split, lang) the sheet
    reports docs, exact token budget, and the 2048-ctx sequence/
    padding arithmetic — the one table a pretraining run is
    provisioned from.

    Scale shape: the CC labels are the iterative shared machinery;
    everything after is one id-keyed join plus a (split, lang)-
    bounded aggregate with integer ceil-div arithmetic."""
    from ..operators.dedup import component_split, dedup_keep_best

    best = dedup_keep_best(t)
    _, split = component_split()
    docs = t["documents"].select(
        "doc_id", "lang", F.size(tokens()).cast("long").alias("nt"))
    j = (best.select(F.col("best_doc_id").alias("doc_id"),
                     split.alias("split"))
         .join(docs, "doc_id"))
    L = PLAN_CTX
    g = (j.groupBy("split", "lang")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("nt").alias("tokens")))
    nseq = F.expr(f"(tokens + {L} - 1) DIV {L}")
    return g.select(
        "split", "lang", "n_docs", "tokens",
        nseq.alias("n_sequences"),
        (nseq * L - F.col("tokens")).alias("pad_tokens"))
