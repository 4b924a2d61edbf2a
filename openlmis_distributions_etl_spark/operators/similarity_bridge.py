"""Cross-table bridge: documents ranked by embedding cosine against
the corpus query vector (doc_id ↔ vec_id alignment, as in
semantic_dedup_pairs). Lives outside similarity.py/text.py to keep
both free of a mutual import."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .similarity import QUERY_VEC_ID, cosine, _query_vector


RRF_DEPTH = 100   # list truncation depth (standard RRF uses top-k lists)


def doc_cosine_ranks(t: dict[str, DataFrame],
                     depth: int = RRF_DEPTH) -> DataFrame:
    """(doc_id, r_vec): the top-``depth`` vectors by cosine to the
    query vector (desc, vec_id tie-break) — the dense-retrieval side
    of hybrid search. The head is selected with a DISTRIBUTED
    sort+limit (per-partition top-k, merged), and only then does the
    global row_number run — on ``depth`` rows, not the corpus, so the
    single-partition rank window can never become the bottleneck a
    full-corpus global rank would be at scale."""
    scored = (t["embeddings"]
              .crossJoin(broadcast(_query_vector(t)))
              .where(F.col("vec_id") != QUERY_VEC_ID)
              .select(F.col("vec_id").alias("doc_id"),
                      cosine(F.col("embedding"), F.col("q"))
                      .alias("cos_sim")))
    head = scored.orderBy(F.desc("cos_sim"), F.asc("doc_id")).limit(depth)
    w = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    return head.select("doc_id", F.row_number().over(w).alias("r_vec"))
