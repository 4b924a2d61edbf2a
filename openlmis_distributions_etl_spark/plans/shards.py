"""Training-shard export: the LAST step of the curation pipeline —
materialize the corpus in the randomized, sharded, position-ordered
physical layout a training data loader streams.

Composes the suite's pieces end-to-end: `deterministic_shuffle`
assigns every doc a shard and an in-shard position (md5 order — stable
across reruns and cluster sizes), and the writer lays each shard down
as its own partition directory whose rows are stored in position
order. A loader then streams shard directories sequentially and gets
the global shuffle order for free — no shuffle at read time, which at
100 TB is the entire point of materializing the order.

Plan shape: one id-keyed join (shuffle assignment ⋈ payload), one
repartition on shard_id, per-partition sort — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import deterministic_shuffle
from ..sources import load_tables


def export_training_shards(spark: SparkSession, sf_dir: str,
                           out_dir: str, n_shards: int = 8) -> dict:
    """Write the documents corpus as `n_shards` position-ordered shard
    directories under ``out_dir`` (shard=<k>/part-*.parquet). Returns
    {"n_shards", "n_docs"}."""
    t = load_tables(spark, sf_dir, "documents")
    order = deterministic_shuffle(t, n_shards=n_shards)
    payload = t["documents"].select("doc_id", "text", "lang", "source")
    rows = order.join(payload, "doc_id")
    (rows.repartition(n_shards, "shard")
         .sortWithinPartitions("shard", "pos")
         .write.mode("overwrite")
         .partitionBy("shard")
         .parquet(out_dir))
    return {"n_shards": n_shards,
            "n_docs": spark.read.parquet(out_dir).count()}


def export_jsonl_shards(spark: SparkSession, sf_dir: str, out_dir: str,
                        n_shards: int = 8,
                        max_records_per_file: int = 0) -> dict:
    """JSONL flavor of the training export — the interchange format
    most LLM data loaders and labeling tools actually consume: the
    same deterministic shuffle order, one gzip-free JSON object per
    line, shard directories streamable in sequence. Optional
    ``max_records_per_file`` caps rows per file inside a shard via
    Spark's writer option (size-targeted files without a second
    pass). Returns {"n_shards", "n_docs"}."""
    t = load_tables(spark, sf_dir, "documents")
    order = deterministic_shuffle(t, n_shards=n_shards)
    docs = t["documents"].select("doc_id", "text", "lang", "source")
    laid = (order.join(docs, "doc_id")
            .repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "pos"))
    writer = laid.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.json(out_dir)
    n_docs = spark.read.json(f"{out_dir}").count()
    return {"n_shards": n_shards, "n_docs": n_docs}
