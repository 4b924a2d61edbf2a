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


def export_wds_shards(spark: SparkSession, sf_dir: str, out_dir: str,
                      n_shards: int = 8) -> dict:
    """WebDataset flavor of the training export — the tar-of-samples
    format multimodal loaders stream: each shard is ONE
    `shard-{k:05d}.tar` whose members are `{key}.txt` (payload) and
    `{key}.json` (metadata), laid down in the deterministic-shuffle
    position order so sequential tar reads replay the global order.

    The tar bytes are BYTE-STABLE across reruns and cluster sizes:
    member order is the shuffle position order, every header uses
    fixed mtime=0 / uid=gid=0 / mode=0644, and keys are zero-padded
    doc ids — two runs produce identical files (tested). Each shard
    builds in ONE task (repartition on shard id, in-partition sort,
    stdlib tarfile into an in-memory buffer — documents are text,
    shards are loader-sized by construction) and writes through the
    local/DFS-mounted filesystem API like the Avro writer."""
    import io
    import json
    import os
    import tarfile

    from ..operators.text import deterministic_shuffle

    t = load_tables(spark, sf_dir, "documents")
    order = deterministic_shuffle(t, n_shards=n_shards)
    docs = t["documents"].select("doc_id", "text", "lang", "source")
    laid = (order.join(docs, "doc_id")
            .repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "pos")
            .select("shard", "pos", "doc_id", "text", "lang",
                    "source"))
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows) -> None:
        # a hash partition may hold SEVERAL shard ids (collisions) —
        # rows arrive (shard, pos)-sorted, so roll the tar whenever
        # the shard id changes
        buf, tf, shard = None, None, None

        def flush() -> None:
            if tf is None:
                return
            tf.close()
            with open(os.path.join(out_dir,
                                   f"shard-{shard:05d}.tar"),
                      "wb") as fh:
                fh.write(buf.getvalue())

        for r in rows:
            if tf is None or r["shard"] != shard:
                flush()
                shard = r["shard"]
                buf = io.BytesIO()
                tf = tarfile.open(fileobj=buf, mode="w")
            key = f"{r['doc_id']:012d}"
            for ext, payload in (
                    ("txt", r["text"].encode("utf-8")),
                    ("json", json.dumps(
                        {"doc_id": r["doc_id"], "lang": r["lang"],
                         "source": r["source"]},
                        sort_keys=True).encode("utf-8"))):
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(payload))
        flush()

    laid.foreachPartition(write_partition)
    return {"n_shards": n_shards,
            "n_files": len([p for p in os.listdir(out_dir)
                            if p.endswith(".tar")])}
