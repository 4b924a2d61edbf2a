"""Cross-table bridge: documents ranked by embedding cosine against
the corpus query vector (doc_id ↔ vec_id alignment, as in
semantic_dedup_pairs). Lives outside similarity.py/text.py to keep
both free of a mutual import."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .similarity import QUERY_VEC_ID, cosine, _query_vector


def doc_cosine_ranks(t: dict[str, DataFrame]) -> DataFrame:
    """(doc_id, r_vec): every non-query vector ranked by cosine to the
    query vector (desc, vec_id tie-break) — the dense-retrieval side
    of hybrid search. Broadcast query + map-side score + one rank."""
    scored = (t["embeddings"]
              .crossJoin(broadcast(_query_vector(t)))
              .where(F.col("vec_id") != QUERY_VEC_ID)
              .select(F.col("vec_id").alias("doc_id"),
                      cosine(F.col("embedding"), F.col("q"))
                      .alias("cos_sim")))
    w = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    return scored.select("doc_id", F.row_number().over(w).alias("r_vec"))
