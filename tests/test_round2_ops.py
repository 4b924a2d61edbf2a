"""Unit + plan-shape tests for the round-2 operators: TPC-H shapes
q2/q11/q12/q16/q20/q21 and the curation ops (repetition, bigram LM,
contamination, stratified sampling, simhash hamming, minhash
agreement, hyperplane LSH)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001

from openlmis_distributions_etl_spark import registry
from openlmis_distributions_etl_spark.operators import (dedup, relational,
                                                        similarity, text)

TS = dt.datetime(2024, 1, 1)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def _q(spark, name):
    return registry.queries()[name](spark, SF0001)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- repetition ratio --------------------------------------------------

def test_repetition_ratio_counts(spark):
    t = {"documents": _docs(spark, [
        (1, "a b a b", "en", "s", 7),      # bigrams: ab, ba, ab → 1/3 dup
        (2, "x y z", "en", "s", 5),        # xy, yz → all distinct
        (3, "solo", "en", "s", 4),         # <2 tokens → excluded
    ])}
    out = {r["doc_id"]: r for r in text.doc_repetition_ratio(t).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 3 and out[1]["n_distinct_bigrams"] == 2
    assert out[1]["repetition_ratio"] == pytest.approx(1 / 3)
    assert out[2]["repetition_ratio"] == 0.0


# -- bigram LM ---------------------------------------------------------

def test_bigram_lm_counts_and_tiebreak(spark):
    t = {"documents": _docs(spark, [
        (1, "a b a b a c", "en", "s", 11),
        (2, "a c", "en", "s", 3),
    ])}
    out = {r["w1"]: r for r in text.bigram_lm_top_successor(t).collect()}
    # bigrams: doc1 → ab, ba, ab, ba, ac; doc2 → ac
    # c(a·)=4 (ab, ab, ac, ac), c(a,b)=2, c(a,c)=2 → tie broken b < c
    assert out["a"]["top_successor"] == "b"
    assert out["a"]["c12"] == 2 and out["a"]["c1"] == 4
    assert out["a"]["cond_prob"] == pytest.approx(0.5)
    assert out["b"]["top_successor"] == "a" and out["b"]["cond_prob"] == 1.0


# -- contamination -----------------------------------------------------

def test_contamination_cross_source_only(spark):
    t = {"documents": _docs(spark, [
        (1, "p q r", "en", "srcA", 5),     # shingle 'p q r' shared w/ srcB
        (2, "p q r", "en", "srcB", 5),
        (3, "u v w", "en", "srcA", 5),     # unique shingle
        (4, "m n o", "en", "srcA", 5),     # duplicated within srcA only
        (5, "m n o", "en", "srcA", 5),
    ])}
    out = {r["doc_id"]: r for r in text.contamination_overlap(t).collect()}
    assert out[1]["contamination"] == 1.0
    assert out[2]["contamination"] == 1.0
    assert out[3]["contamination"] == 0.0
    # same-source duplication is NOT contamination
    assert out[4]["contamination"] == 0.0 and out[5]["contamination"] == 0.0


# -- stratified sampling ----------------------------------------------

def test_stratified_sample_respects_rates(spark):
    out = _q(spark, "stratified_sample").collect()
    assert len(out) > 0
    for r in out:
        assert r["bucket"] < r["keep_pct"]
        assert r["keep_pct"] == text.STRATA_RATES[r["lang"]]
    # deterministic: a second run yields the identical sample
    again = _q(spark, "stratified_sample").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# -- simhash hamming pairs --------------------------------------------

def test_simhash_identical_docs_distance_zero(spark):
    t = {"documents": _docs(spark, [
        (1, "spark shuffles the big table", "en", "s", 28),
        (2, "spark shuffles the big table", "en", "s", 28),
        (3, "completely different words entirely", "en", "s", 35),
    ])}
    rows = dedup.simhash_hamming_pairs(t).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert pairs.get((1, 2)) == 0


def test_simhash_banding_has_perfect_recall(spark):
    """Banded candidates must equal brute-force all-pairs at d ≤ 3
    (the pigeonhole guarantee the operator's docstring claims)."""
    t = {"documents": registry.load_tables(spark, SF0001)["documents"]}
    banded = {(r["doc_a"], r["doc_b"], r["hamming"])
              for r in dedup.simhash_hamming_pairs(t).collect()}
    sh = dedup.simhash64(t)
    a = sh.select(F.col("doc_id").alias("doc_a"),
                  F.col("simhash").alias("sim_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"),
                  F.col("simhash").alias("sim_b"))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b",
                F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
                .alias("hamming"))
        .where(F.col("hamming") <= dedup.SIMHASH_MAX_DIST)
        .collect()
    }
    assert banded == brute


def test_simhash_lane_overflow_guard(spark):
    # Either ANSI aborts the lane sum ("long overflow") or the post-agg
    # guard fires ("lane counters would overflow") — never silent.
    t = {"documents": _docs(spark, [
        (1, "tok " * dedup.MAX_DOC_TOKENS, "en", "s", 4 * dedup.MAX_DOC_TOKENS),
    ])}
    with pytest.raises(Exception, match="overflow"):
        dedup.simhash64(t).collect()


# -- minhash agreement estimate ---------------------------------------

def test_minhash_estimate_identical_docs(spark):
    t = {"documents": _docs(spark, [
        (1, "w x y z w x", "en", "s", 11),
        (2, "w x y z w x", "en", "s", 11),
    ])}
    rows = dedup.minhash_jaccard_estimate(t).collect()
    est = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert est[(1, 2)]["n_agree"] == 16
    assert est[(1, 2)]["jaccard_est"] == 1.0


# -- hyperplane LSH ----------------------------------------------------

def test_hyperplane_bucket_range_and_determinism(spark):
    out = _q(spark, "hyperplane_lsh_buckets").collect()
    assert len(out) > 0
    assert all(0 <= r["bucket"] < (1 << similarity.N_HYPERPLANES)
               for r in out)
    # identical vectors land in identical buckets (exact duplicate run)
    again = {r["vec_id"]: r["bucket"]
             for r in _q(spark, "hyperplane_lsh_buckets").collect()}
    assert all(again[r["vec_id"]] == r["bucket"] for r in out)


def test_hyperplanes_are_balanced_signs(spark):
    # md5-seeded entries: both signs occur in every plane (sanity that
    # the seed derivation isn't degenerate)
    for signs in similarity.HYPERPLANES:
        assert {1.0, -1.0} == set(signs) or len(set(signs)) == 2


# -- TPC-H shapes ------------------------------------------------------

def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate timestamp")


def _supplier(spark, rows):
    return spark.createDataFrame(
        rows, "s_suppkey long, s_name string, s_nationkey int, "
              "s_acctbal double")


def test_q21_sole_late_logic(spark):
    late = TS + dt.timedelta(days=120)
    ontime = TS + dt.timedelta(days=10)
    li = [
        # order 1: supp 1 late, supp 2 on time → supp 1 is a culprit
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
        (1, 1, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ontime),
        # order 2: both supps late → nobody is the sole late supplier
        (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
        (2, 1, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
        # order 3: single-supplier order, late → excluded (n_supps == 1)
        (3, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
    ]
    orders = [(k, 1, "O", 10.0, TS, "1-URGENT") for k in (1, 2, 3)]
    t = {"lineitem": _lineitem(spark, li),
         "orders": _orders(spark, orders),
         "supplier": _supplier(spark, [(1, "S1", 0, 0.0),
                                       (2, "S2", 0, 0.0)])}
    out = {r["s_name"]: r["numwait"]
           for r in relational.q21_sole_late_supplier(t).collect()}
    assert out == {"S1": 1}


def test_q2_min_cost_ties_keep_all(spark):
    part = spark.createDataFrame(
        [(1, "widget", "Brand#1", "STANDARD", 5, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double")
    li = [
        # supp 1 and supp 2 tie at unit cost 10.0; supp 3 is higher
        (1, 1, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", TS),
        (1, 1, 2, 2, 3.0, 30.0, 0.0, 0.0, "N", "O", TS),
        (1, 1, 3, 3, 1.0, 50.0, 0.0, 0.0, "N", "O", TS),
    ]
    t = {"part": part, "lineitem": _lineitem(spark, li),
         "supplier": _supplier(spark, [(1, "S1", 0, 0.0), (2, "S2", 0, 0.0),
                                       (3, "S3", 0, 0.0)])}
    out = relational.q2_min_cost_supplier(t).collect()
    assert sorted(r["s_name"] for r in out) == ["S1", "S2"]
    assert all(r["unit_cost"] == 10.0 for r in out)


# -- plan shapes -------------------------------------------------------

def test_round2_plans_have_no_python(spark):
    for name in ("q2_min_cost_supplier", "q11_important_parts",
                 "q12_late_shipment_priority", "q16_supplier_variety",
                 "q20_excess_supply_suppliers", "q21_sole_late_supplier",
                 "doc_repetition_ratio", "bigram_lm_top_successor",
                 "contamination_overlap", "stratified_sample",
                 "simhash_hamming_pairs", "minhash_jaccard_estimate",
                 "hyperplane_lsh_buckets"):
        plan = _plan(_q(spark, name))
        assert "BatchEvalPython" not in plan \
            and "ArrowEvalPython" not in plan, f"{name} fell back to Python"


def test_simhash_pairs_join_is_bucketed_not_cartesian(spark):
    plan = _plan(_q(spark, "simhash_hamming_pairs"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hyperplane_buckets_no_join_no_shuffle_but_spread(spark):
    plan = _plan(_q(spark, "hyperplane_lsh_buckets"))
    assert "Join" not in plan
    # the only exchange is spread()'s round-robin re-fan of a tiny scan
    assert plan.count("Exchange") <= 1


def test_near_dup_join_condition_carries_no_fold(spark):
    """The pin() barrier must keep the 64-step cosine fold OUT of the
    join condition (it was being cloned into the nested-loop probe)."""
    df = _q(spark, "embedding_near_dup_pairs")
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [ln for ln in opt.splitlines() if "Join" in ln]
    assert join_lines and all("aggregate(" not in ln for ln in join_lines)


# -- round-2 second wave: ANN eval, dim stats, incremental dedup -------

def test_knn_lsh_recall_bounds(spark):
    row = _q(spark, "knn_lsh_recall").collect()
    assert len(row) == 1
    r = row[0]
    assert r["k"] == 10
    assert 0 <= r["n_hits"] <= 10
    assert r["recall_at_k"] == r["n_hits"] / 10


def test_embedding_dim_stats_shape(spark):
    rows = _q(spark, "embedding_dim_stats").collect()
    assert len(rows) == 64
    n_vecs = {r["n"] for r in rows}
    assert len(n_vecs) == 1          # every dim sees every vector
    for r in rows:
        assert r["min_val"] <= r["mean_val"] <= r["max_val"]


def test_incremental_dedup_flags_snapshot_dups(spark):
    t = {"documents": _docs(spark, [
        (0, "same text", "en", "s", 9),     # batch (0 mod 5), dup of 1
        (1, "same text", "en", "s", 9),     # snapshot
        (5, "brand new content", "en", "s", 17),  # batch, fresh
        (7, "other snapshot doc", "en", "s", 18),
    ])}
    out = {r["doc_id"]: r["is_dup"]
           for r in dedup.incremental_dedup(t).collect()}
    assert out == {0: 1, 5: 0}


def test_curation_pipeline_splits_and_dedup(spark):
    rows = _q(spark, "curation_pipeline").collect()
    assert rows, "curation should keep a non-trivial corpus"
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "val", "test"}
    n = len(rows)
    n_train = sum(r["split"] == "train" for r in rows)
    assert 0.6 * n <= n_train <= 0.95 * n      # ~80% bucket arithmetic
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))           # canonical docs only
    # deterministic: a second build yields the identical assignment
    again = {(r["doc_id"], r["split"])
             for r in _q(spark, "curation_pipeline").collect()}
    assert {(r["doc_id"], r["split"]) for r in rows} == again


def test_doc_dup_rate_by_source_counts(spark):
    t = {"documents": _docs(spark, [
        (1, "xx", "en", "srcA", 2),
        (2, "xx", "en", "srcA", 2),    # dup within srcA
        (3, "yy", "en", "srcB", 2),
    ])}
    out = {r["source"]: r for r in
           dedup.doc_dup_rate_by_source(t).collect()}
    assert out["srcA"]["n_docs"] == 2 and out["srcA"]["n_dups"] == 1
    assert out["srcA"]["dup_rate"] == 0.5
    assert out["srcB"]["n_dups"] == 0


def test_fk_integrity_audit_detects_orphans(spark):
    from openlmis_distributions_etl_spark.operators import analytics

    orders = spark.createDataFrame(
        [(1, 10), (2, 99)], "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame(
        [(1, 100, 200), (3, 100, 200)],
        "l_orderkey long, l_partkey long, l_suppkey long")
    t = {"orders": orders, "lineitem": lineitem,
         "customer": spark.createDataFrame([(10, 5)],
                                           "c_custkey long, c_nationkey long"),
         "part": spark.createDataFrame([(100,)], "p_partkey long"),
         "supplier": spark.createDataFrame([(200,)], "s_suppkey long"),
         "nation": spark.createDataFrame([(5,)], "n_nationkey long")}
    out = {r["fk"]: r["n_orphans"]
           for r in analytics.fk_integrity_audit(t).collect()}
    assert out["lineitem.orderkey->orders"] == 1     # orderkey 3
    assert out["orders.custkey->customer"] == 1      # custkey 99
    assert out["lineitem.partkey->part"] == 0
    assert out["customer.nationkey->nation"] == 0


def test_numeric_profile_shape(spark):
    rows = _q(spark, "numeric_profile").collect()
    assert {r["column"] for r in rows} == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    for r in rows:
        assert r["n"] > 0 and r["n_null"] == 0
        assert r["min_val"] <= r["max_val"]


def test_histogram_pandas_twin_matches_builtin(spark):
    a = sorted(map(tuple, _q(spark, "user_value_histogram").collect()))
    b = sorted(map(tuple,
                   _q(spark, "user_value_histogram_pandas").collect()))
    assert a == b


def test_ngram_jaccard_prefix_filter_is_exact(spark):
    # hand-checkable corpus: 1&2 share most shingles, 3 is disjoint,
    # and a hot shingle ("common words here") appears in every doc
    rows = [(1, "common words here alpha beta gamma delta", "en", "s", 1),
            (2, "common words here alpha beta gamma epsilon", "en", "s", 1),
            (3, "common words here zeta eta theta iota", "en", "s", 1)]
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(
               {"documents": _docs(spark, rows)}, threshold=0.3).collect()}
    # docs 1,2: 5 shingles each, 4 common → J = 4/6 = 2/3
    assert (1, 2) in out and abs(out[(1, 2)] - 2 / 3) < 1e-12
    # doc 3 shares only the hot prefix shingle with 1 and 2 → J = 1/9
    assert (1, 3) not in out and (2, 3) not in out


# -- round-4 additions -------------------------------------------------


def test_pq_codes_identical_vectors_same_codes(spark):
    out = {(r["vec_id"], r["m"]): r["code"]
           for r in _q(spark, "pq_codes").collect()}
    # codebook vectors encode to themselves: vec_id < 16 is the seed,
    # so subspace m of vec j has d²=0 against its own code j
    for j in range(16):
        for m in range(8):
            assert out[(j, m)] == j, (j, m, out[(j, m)])
    assert all(0 <= c < 16 for c in out.values())


def test_countmin_never_underestimates(spark):
    rows = _q(spark, "token_countmin_topk").collect()
    assert len(rows) == 20
    assert all(r["n_est"] >= r["n_exact"] for r in rows)


def test_mixture_weights_sum_to_one(spark):
    rows = _q(spark, "language_mixture_weights").collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["p_raw"] for r in rows) - 1.0) < 1e-12
    # temperature flattening: every language's weight sits between its
    # raw share and the uniform share (sqrt pulls toward uniform)
    u = 1.0 / len(rows)
    for r in rows:
        lo, hi = sorted((r["p_raw"], u))
        assert lo - 1e-12 <= r["weight"] <= hi + 1e-12


def test_kmeans_improves_on_seed_assignment(spark):
    """Lloyd must not lose members: every final cluster is non-empty
    and membership sums to the corpus size."""
    rows = _q(spark, "kmeans_centroids").collect()
    by_c = {}
    for r in rows:
        by_c.setdefault(r["centroid_id"], set()).add(r["n"])
    assert all(len(v) == 1 for v in by_c.values())  # consistent n per cluster
    assert sum(v.pop() for v in by_c.values()) == 500


def test_semantic_dedup_same_text_consistency(spark):
    from openlmis_distributions_etl_spark.sources import load_tables

    pairs = _q(spark, "semantic_dedup_pairs").collect()
    t = load_tables(spark, SF0001, "documents")
    texts = {r["doc_id"]: r["text"] for r in t["documents"].collect()}
    for r in pairs:
        assert r["same_text"] == int(texts[r["doc_a"]] == texts[r["doc_b"]])


def test_near_dup_recall_refuses_large_corpus(spark):
    import pytest
    from openlmis_distributions_etl_spark.operators import similarity as sim

    big = spark.range(sim.EVAL_MAX_VECTORS + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0)).alias("embedding"),
        F.lit(0).alias("label"))
    with pytest.raises(ValueError, match=r"O\(n²\) eval harness"):
        sim.near_dup_recall({"embeddings": big})
