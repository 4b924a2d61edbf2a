"""DuckDB oracle SQL twins for every queries() entry.

These mirror the Spark operators' semantics exactly: identical decimal
casts (so exact sums match bit-for-bit after the final cast to double),
identical tie-breaks in every ORDER BY / window, epoch-microsecond
timestamps, and explicit integer-width casts where the engines' default
aggregate widths differ (DuckDB SUM(int)→HUGEINT vs Spark →bigint).
"""

from __future__ import annotations

# -- shared fragments -------------------------------------------------

def DEC(c: str) -> str:
    return f"CAST({c} AS DECIMAL(18,4))"


def RATE(c: str) -> str:
    return f"CAST({c} AS DECIMAL(8,4))"


def DSUM(c: str) -> str:
    return f"CAST(CAST(SUM({DEC(c)}) AS DECIMAL(38,6)) AS DOUBLE)"


def DAVG(c: str, rate: bool = False) -> str:
    d = RATE(c) if rate else DEC(c)
    return f"CAST(CAST(SUM({d}) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*)"


DISC_PRICE = f"{DEC('l_extendedprice')} * (CAST(1 AS DECIMAL(8,4)) - {RATE('l_discount')})"
CHARGE = f"{DISC_PRICE} * (CAST(1 AS DECIMAL(8,4)) + {RATE('l_tax')})"

SESSIONIZE_CTE = """
ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
),
lagd AS (
  SELECT *,
    CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1
         WHEN LAG(ts_us) OVER w IS NULL THEN 1
         ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT event_id, user_id, ts_us,
    CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM lagd
)"""


ORACLES: dict[str, str] = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {DSUM('l_quantity')} AS sum_qty,
               {DSUM('l_extendedprice')} AS sum_base_price,
               CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM({CHARGE}) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
               {DAVG('l_quantity')} AS avg_qty,
               {DAVG('l_extendedprice')} AS avg_price,
               {DAVG('l_discount', rate=True)} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
    """,
    "q5_regional_volume": f"""
        SELECT n_name, CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": f"""
        SELECT CAST(CAST(SUM({DEC('l_extendedprice')} * {RATE('l_discount')}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 25.0
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "anti_join_inactive_customers": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01')
    """,
    "grouped_having_big_orders": f"""
        SELECT l_orderkey, COUNT(*) AS n_lines,
               {DSUM('l_extendedprice')} AS gross_value
        FROM lineitem
        GROUP BY l_orderkey
        HAVING COUNT(*) >= 5
           AND CAST(SUM({DEC('l_extendedprice')}) AS DOUBLE) > 100000.0
    """,
    "rollup_priority_status": f"""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n_orders,
               {DSUM('o_totalprice')} AS total_value
        FROM orders
        GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
    "pivot_event_counts": """
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events
        GROUP BY user_id
    """,
    "percentile_order_value": """
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
               ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    "json_extract_props": """
        SELECT event_type,
               CAST(SUM(TRY_CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(TRY_CAST(json_extract_string(props, '$.k')
                              AS BIGINT)) AS n_with_k,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    "star_denormalize": f"""
        SELECT l_orderkey, l_linenumber,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority, o_orderstatus,
               c_custkey, c_name, c_mktsegment,
               n_name AS cust_nation, r_name AS cust_region,
               s_name AS supplier_name,
               p_name AS part_name, p_brand,
               l_quantity,
               CAST({DISC_PRICE} AS DOUBLE) AS net_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
    """,
    "monthly_sales_rollup": f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS month, c_mktsegment,
               COUNT(*) AS n_orders,
               {DSUM('o_totalprice')} AS total_value
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        GROUP BY strftime(o_orderdate, '%Y-%m'), c_mktsegment
    """,
    "topk_customers_per_nation": """
        SELECT n_name, c_custkey, c_name, c_acctbal, rnk FROM (
          SELECT n_name, c_custkey, c_name, c_acctbal,
                 CAST(DENSE_RANK() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rnk
          FROM customer JOIN nation ON c_nationkey = n_nationkey)
        WHERE rnk <= 3
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1
    """,
    "running_total_per_user": """
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE) AS cum_value
        FROM events
    """,
    "sessionize_events": f"""
        WITH {SESSIONIZE_CTE}
        SELECT event_id, user_id, ts_us, session_id FROM sess
    """,
    "session_stats": f"""
        WITH {SESSIONIZE_CTE}
        SELECT s.user_id, s.session_id,
               COUNT(*) AS n_events,
               MIN(s.ts_us) AS start_us,
               MAX(s.ts_us) AS end_us,
               MAX(s.ts_us) - MIN(s.ts_us) AS duration_us,
               CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM sess s JOIN events e USING (event_id)
        GROUP BY s.user_id, s.session_id
    """,
    "funnel_signup_purchase": """
        WITH s AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup_us
          FROM events GROUP BY user_id),
        p AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase_after_us
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.first_signup_us
          GROUP BY e.user_id)
        SELECT s.user_id, s.first_signup_us, p.first_purchase_after_us,
               CAST(s.first_signup_us IS NOT NULL
                    AND p.first_purchase_after_us IS NOT NULL AS INT) AS converted
        FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
    "event_value_outliers": """
        WITH fences AS (
          SELECT event_type,
                 ROUND(quantile_cont(value, 0.25), 6) AS q1,
                 ROUND(quantile_cont(value, 0.75), 6) AS q3
          FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type, e.value,
               q1 - 1.5 * (q3 - q1) AS lo_fence,
               q3 + 1.5 * (q3 - q1) AS hi_fence
        FROM events e JOIN fences f USING (event_type)
        WHERE e.value < q1 - 1.5 * (q3 - q1)
           OR e.value > q3 + 1.5 * (q3 - q1)
    """,
    "funnel_three_step": """
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        per AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup' THEN ts_us END) AS s1,
                 list(ts_us) FILTER (event_type = 'click') AS clicks,
                 list(ts_us) FILTER (event_type = 'purchase') AS purch
          FROM ev GROUP BY user_id),
        st AS (
          SELECT user_id, s1, purch,
                 list_min(list_filter(clicks,
                   x -> x > s1 AND x <= s1 + 86400000000)) AS s2
          FROM per),
        st2 AS (
          SELECT user_id, s1, s2,
                 list_min(list_filter(purch,
                   x -> x > s2 AND x <= s2 + 86400000000)) AS s3
          FROM st)
        SELECT COUNT(s1) AS n_signup,
               COUNT(s2) AS n_click_after,
               COUNT(s3) AS n_purchase_after,
               CAST(COUNT(s2) AS DOUBLE) / COUNT(s1) AS click_rate,
               CAST(COUNT(s3) AS DOUBLE) / COUNT(s1) AS purchase_rate
        FROM st2
    """,
    "windowed_event_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
               event_type,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00'), event_type
    """,
}


# -- text / dedup / similarity / multimodal fragments ------------------

TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
SHINGLES = ("CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
            "ELSE [] END")


# first 7 md5 hex chars of the shingle as a 28-bit bigint (mirrors
# Spark's conv(substring(md5, 1, 7), 16, 10))
_SHINGLE_KEY = ("CAST(list_sum(list_transform(range(1, 8), "
                "i -> (strpos('0123456789abcdef', substr(md5(s), "
                "CAST(i AS INT), 1)) - 1) "
                "* (CAST(1 AS BIGINT) << CAST(4 * (7 - i) AS INT)))) "
                "AS BIGINT)")


def _sig_cols() -> str:
    from .operators.dedup import MINHASH_AB, MINHASH_P

    return ",\n               ".join(
        f"list_min(list_transform(xs, x -> ({a} * x + {b}) % {MINHASH_P}))"
        f" AS h{j}"
        for j, (a, b) in enumerate(MINHASH_AB))


SIG_CTE = f"""
d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, {SHINGLES} AS shingles FROM d),
xs AS (
  SELECT doc_id,
         list_transform(list_distinct(shingles), s -> {_SHINGLE_KEY}) AS xs
  FROM sh WHERE len(shingles) > 0),
sig AS (
  SELECT doc_id,
               {_sig_cols()}
  FROM xs
)"""

_BAND_SELECTS = "\n        UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, "
    + " || '|' || ".join(f"h{b*4+r}" for r in range(4))
    + " AS band_val FROM sig"
    for b in range(4))

DOT_Q = ("list_sum(list_transform(range(1, 65), "
         "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")


def _cos(a: str, b: str) -> str:
    return (f"({DOT_Q.format(a=a, b=b)} / "
            f"(sqrt({DOT_Q.format(a=a, b=a)}) * sqrt({DOT_Q.format(a=b, b=b)})))")


_LANGS = ["de", "en", "es", "fr", "zh"]
_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("\u7684", "\u662f", "\u4e86", "\u5728"),
}


def _score(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"CAST(len(list_filter(toks, x -> x IN ({inlist}))) AS INTEGER)"


ORACLES.update({
    "doc_token_count": f"""
        SELECT doc_id,
               CAST(len({TOKS}) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct({TOKS})) AS INTEGER) AS n_distinct_tokens,
               CAST(length(text) AS INTEGER) AS n_chars_calc
        FROM documents
    """,
    "doc_quality_score": f"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len({TOKS}) AS INTEGER) AS n_tokens,
                 CAST(len(list_distinct({TOKS})) AS INTEGER) AS n_distinct,
                 CAST(len(list_filter({TOKS},
                      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS INTEGER) AS n_stop
          FROM documents)
        SELECT doc_id, n_tokens,
               n_distinct / n_tokens AS uniq_ratio,
               n_stop / n_tokens AS stop_ratio,
               (n_distinct / n_tokens) * 0.4
                 + (1.0 - n_stop / n_tokens) * 0.4
                 + least(n_tokens / 100.0, 1.0) * 0.2 AS quality_score
        FROM d
    """,
    "doc_langid": f"""
        WITH t AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
        s AS (
          SELECT doc_id, lang,
                 {", ".join(f"{_score(lang)} AS score_{lang}" for lang in _LANGS)}
          FROM t),
        b AS (SELECT *, greatest(score_de, score_en, score_es, score_fr, score_zh) AS best FROM s)
        SELECT doc_id, lang,
               CASE {" ".join(f"WHEN best > 0 AND score_{lang} = best THEN '{lang}'" for lang in _LANGS)}
                    ELSE 'unk' END AS pred_lang,
               score_de, score_en, score_es, score_fr, score_zh
        FROM b
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               md5(text) AS fingerprint,
               substr(md5(text), 1, 2) AS shard_bucket,
               CAST(list_sum(list_transform(range(1, 16),
                 i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT), 1)) - 1)
                      * (CAST(1 AS BIGINT) << CAST(4 * (15 - i) AS INT)))) AS BIGINT) AS fp60
        FROM documents
    """,
    "exact_dedup": """
        SELECT md5(text) AS text_hash,
               MIN(doc_id) AS canonical_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    "exact_dedup_stats": """
        SELECT n_copies, COUNT(*) AS n_clusters FROM (
          SELECT md5(text) AS text_hash, COUNT(*) AS n_copies
          FROM documents GROUP BY md5(text))
        GROUP BY n_copies
    """,
    "minhash_signatures": f"""
        WITH {SIG_CTE}
        SELECT * FROM sig
    """,
    "minhash_lsh_pairs": f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                    AND a.doc_id < b.doc_id
    """,
    "ngram_jaccard_pairs": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id, list_distinct({SHINGLES}) AS sh FROM d),
        dd AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh WHERE len(sh) > 0),
        ex AS (SELECT doc_id, n_sh, unnest(sh) AS shingle FROM dd),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_common
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b,
               n_common / (n_a + n_b - n_common) AS jaccard
        FROM common
        WHERE n_common / (n_a + n_b - n_common) >= 0.5
    """,
    "simhash64": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        th AS (SELECT doc_id, md5(tok) AS h, cnt FROM tc),
        bits AS (
          SELECT doc_id, j,
                 ((strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
                   >> CAST(3 - (j % 4) AS INT)) & 1 AS bit,
                 cnt
          FROM th, (SELECT unnest(range(60)) AS j)),
        agg AS (SELECT doc_id, j, SUM((2 * bit - 1) * cnt) AS s FROM bits GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM agg GROUP BY doc_id
    """,
    "embedding_norms": f"""
        SELECT vec_id, label,
               sqrt({DOT_Q.format(a='embedding', b='embedding')}) AS l2_norm,
               CAST(abs(sqrt({DOT_Q.format(a='embedding', b='embedding')}) - 1.0) < 0.01 AS INT) AS is_normalized
        FROM embeddings
    """,
    "knn_bruteforce": f"""
        WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label, {_cos('embedding', 'q')} AS cos_sim
        FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """,
    "knn_ivf": f"""
        WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        cent AS (SELECT vec_id AS centroid_id, embedding AS cvec
                 FROM embeddings WHERE vec_id < 8),
        probe AS (
          SELECT centroid_id FROM cent, q
          ORDER BY {_cos('cvec', 'q')} DESC, centroid_id ASC
          LIMIT 2),
        assigned AS (
          SELECT vec_id, label, embedding, centroid_id FROM (
            SELECT e.vec_id, e.label, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC, c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent c)
          WHERE rn = 1)
        SELECT a.vec_id, a.label, {_cos('a.embedding', 'q.q')} AS cos_sim
        FROM assigned a
        JOIN probe USING (centroid_id)
        CROSS JOIN q
        WHERE a.vec_id <> 0
        ORDER BY cos_sim DESC, a.vec_id ASC
        LIMIT 10
    """,
    "multimodal_features": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CAST(ascii(text) AS INT) AS first_byte,
               md5(text) AS content_md5,
               CAST(ascii(text) % 64 + 1 AS INT) AS fake_width,
               CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS fake_height
        FROM documents
    """,
})


# -- second-wave relational oracles ------------------------------------

_Y96 = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"
_Y97 = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'"

ORACLES.update({
    "distinct_counts": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "set_ops_customers": f"""
        SELECT
          (SELECT COUNT(*) FROM (({_Y96}) INTERSECT ({_Y97}))) AS n_both,
          (SELECT COUNT(*) FROM (({_Y96}) EXCEPT ({_Y97}))) AS n_only_1996,
          (SELECT COUNT(*) FROM (({_Y96}) UNION ({_Y97}))) AS n_union
    """,
    "correlated_subquery_max_order": """
        SELECT c_custkey, c_name,
               (SELECT MAX(o_totalprice) FROM orders
                WHERE o_custkey = c_custkey) AS max_order_value
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "cube_status_priority": f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               {DSUM('o_totalprice')} AS total_value
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "window_range_frame": """
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS epoch_day,
               COUNT(*) OVER w AS n_orders_30d,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DECIMAL(38,6)) AS DOUBLE) AS value_30d
        FROM orders
        WINDOW w AS (
          PARTITION BY o_custkey
          ORDER BY CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
    "first_last_order_value": """
        SELECT o_custkey,
               MAX(fv) AS first_order_value,
               MAX(lv) AS last_order_value,
               COUNT(*) AS n_orders
        FROM (
          SELECT o_custkey,
                 FIRST_VALUE(o_totalprice) OVER w AS fv,
                 LAST_VALUE(o_totalprice) OVER w AS lv
          FROM orders
          WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        GROUP BY o_custkey
    """,
    "scd2_user_state": """
        SELECT user_id, event_id, event_type,
               epoch_us(ts) AS valid_from_us,
               LEAD(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS valid_to_us
        FROM events
    """,
    "conditional_agg_returns": """
        SELECT n_name,
               COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
               COUNT(*) AS n_lines,
               COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) / COUNT(*) AS return_rate
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "string_functions_report": """
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               substr(c_name, 1, 8) AS name_prefix,
               regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
               replace(c_name, 'Customer', 'Cust') AS name_short,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
               CAST(length(c_name) AS INTEGER) AS name_len
        FROM customer
    """,
    "date_arithmetic_report": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(day(o_orderdate) AS INTEGER) AS order_day,
               CAST(isodow(o_orderdate) - 1 AS INTEGER) AS order_weekday,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch_start
        FROM orders
    """,
})


ORACLES.update({
    "unpivot_priority_metrics": f'''
        WITH wide AS (
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS DOUBLE) AS n_orders,
                 {DSUM('o_totalprice')} AS total_value
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide
        UNION ALL
        SELECT o_orderpriority, 'total_value' AS metric, total_value AS value FROM wide
    ''',
    "token_positions": '''
        WITH d AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents WHERE doc_id < 100)
        SELECT doc_id,
               CAST(unnest(range(len(toks))) AS INTEGER) AS pos,
               unnest(toks) AS token
        FROM d
    ''',
    "user_value_histogram": '''
        SELECT user_id,
               COUNT(CASE WHEN value >= 0 AND value < 50 THEN 1 END) AS b0,
               COUNT(CASE WHEN value >= 50 AND value < 100 THEN 1 END) AS b1,
               COUNT(CASE WHEN value >= 100 AND value < 150 THEN 1 END) AS b2,
               COUNT(CASE WHEN value >= 150 AND value < 200 THEN 1 END) AS b3,
               COUNT(CASE WHEN value >= 200 THEN 1 END) AS b4,
               COUNT(*) AS n
        FROM events
        GROUP BY user_id
    ''',
})


ORACLES.update({
    "dedup_components": f'''
        WITH RECURSIVE {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src)
        SELECT d.doc_id,
               COALESCE(c.component, d.doc_id) AS component
        FROM documents d
        LEFT JOIN comp c ON d.doc_id = c.node
    ''',
    # cluster-size histogram over the same recursive-CTE components
    "dup_cluster_stats": f'''
        WITH RECURSIVE {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src),
        labels AS (
          SELECT d.doc_id,
                 COALESCE(c.component, d.doc_id) AS component
          FROM documents d
          LEFT JOIN comp c ON d.doc_id = c.node),
        sizes AS (
          SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM labels GROUP BY component),
        hist AS (
          SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
          FROM sizes GROUP BY cluster_size)
        SELECT cluster_size, n_clusters,
               cluster_size * n_clusters AS n_docs,
               CAST(cluster_size * n_clusters AS DOUBLE)
                 / CAST(SUM(cluster_size * n_clusters) OVER () AS DOUBLE)
                 AS doc_share
        FROM hist
    ''',
})


ORACLES.update({
    "asof_purchase_attribution": '''
        WITH ev AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
          FROM events),
        p AS (SELECT event_id, user_id, ts_us FROM ev
              WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts_us AS click_ts_us FROM ev
              WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.ts_us,
               c.click_ts_us AS last_click_ts_us,
               p.ts_us - c.click_ts_us AS gap_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts_us > c.click_ts_us
    ''',
})


ORACLES.update({
    "stats_correlation": '''
        WITH ev AS (
          SELECT event_type,
                 CAST(value AS DECIMAL(18,4)) AS x,
                 CAST(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                      AS DECIMAL(18,4)) AS y
          FROM events
          WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                IS NOT NULL),
        m AS (
          SELECT event_type, COUNT(*) AS n,
                 CAST(CAST(SUM(x) AS DECIMAL(38,6)) AS DOUBLE) AS sx,
                 CAST(CAST(SUM(y) AS DECIMAL(38,6)) AS DOUBLE) AS sy,
                 CAST(CAST(SUM(x * y) AS DECIMAL(38,6)) AS DOUBLE) AS sxy,
                 CAST(CAST(SUM(x * x) AS DECIMAL(38,6)) AS DOUBLE) AS sxx,
                 CAST(CAST(SUM(y * y) AS DECIMAL(38,6)) AS DOUBLE) AS syy
          FROM ev GROUP BY event_type)
        SELECT event_type, n,
               (sxy - sx * sy / CAST(n AS DOUBLE))
                 / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                        * (syy - sy * sy / CAST(n AS DOUBLE))) AS corr_value_k
        FROM m
    ''',
})


_SUPPN = "SELECT s_suppkey, n_name AS supp_nation FROM supplier JOIN nation ON s_nationkey = n_nationkey"

ORACLES.update({
    "q7_nation_trade_volume": f'''
        SELECT sn.supp_nation, cn.cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year,
               CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN (SELECT n_nationkey, n_name AS supp_nation FROM nation) sn
          ON s_nationkey = sn.n_nationkey
        JOIN (SELECT n_nationkey AS cnk, n_name AS cust_nation FROM nation) cn
          ON c_nationkey = cn.cnk
        WHERE (sn.supp_nation = 'NATION_9' AND cn.cust_nation = 'NATION_6')
           OR (sn.supp_nation = 'NATION_6' AND cn.cust_nation = 'NATION_9')
        GROUP BY 1, 2, 3
    ''',
    "q8_market_share": f'''
        WITH j AS (
          SELECT o_orderdate, s.supp_nation,
                 {DISC_PRICE} AS dp
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN (SELECT c_custkey FROM customer
                JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'AMERICA') geo
            ON o_custkey = geo.c_custkey
          JOIN ({_SUPPN}) s ON l_suppkey = s.s_suppkey)
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(CAST(SUM(dp) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue,
               COALESCE(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN dp END)
                      AS DECIMAL(38,6)) AS DOUBLE), 0.0) AS nation_revenue,
               COALESCE(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN dp END)
                      AS DECIMAL(38,6)) AS DOUBLE), 0.0)
                 / CAST(CAST(SUM(dp) AS DECIMAL(38,6)) AS DOUBLE) AS market_share
        FROM j GROUP BY 1
    ''',
    "q9_profit_by_nation_year": f'''
        SELECT s.supp_nation,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,4))
                             * CAST(p_retailprice AS DECIMAL(18,4))
                             * CAST(0.6 AS DECIMAL(8,4)))
                    AS DECIMAL(38,6)) AS DOUBLE) AS cost,
               CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE)
                 - CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,4))
                                 * CAST(p_retailprice AS DECIMAL(18,4))
                                 * CAST(0.6 AS DECIMAL(8,4)))
                        AS DECIMAL(38,6)) AS DOUBLE) AS profit
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN ({_SUPPN}) s ON l_suppkey = s.s_suppkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ''',
    "q14_promo_revenue_share": f'''
        WITH j AS (
          SELECT p_type, {DISC_PRICE} AS dp
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-09-01'
            AND l_shipdate < TIMESTAMP '1997-10-01')
        SELECT COALESCE(CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN dp END)
                 AS DECIMAL(38,6)) AS DOUBLE), 0.0) AS promo_revenue,
               CAST(CAST(SUM(dp) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue,
               100.0 * COALESCE(CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN dp END)
                 AS DECIMAL(38,6)) AS DOUBLE), 0.0)
                 / CAST(CAST(SUM(dp) AS DECIMAL(38,6)) AS DOUBLE) AS promo_share
        FROM j
    ''',
})


ORACLES.update({
    "doc_bpe_token_count": '''
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
               CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS INTEGER) AS n_distinct_bpe
        FROM documents
    ''',
    "doc_rolling_hash": '''
        SELECT doc_id,
               list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                           (acc, x) -> (acc * 256 + x) % 1000000007) AS rolling_hash,
               CAST(length(text) AS INTEGER) AS n_chars_hashed
        FROM documents
        WHERE length(text) > 0
    ''',
    # α=1/2 temperature mixture weights: sqrt is correctly-rounded in
    # both engines (pow(x, 0.7) is not); normalization folds sqrt(n_l)
    # in sorted lang order to mirror Spark's sorted-struct fold
    "language_mixture_weights": '''
        WITH counts AS (
          SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        totals AS (
          SELECT SUM(n_docs) AS total,
                 list_sum(list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang))
                   AS norm_raw
          FROM counts)
        SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_docs AS DOUBLE) / CAST(total AS BIGINT) AS p_raw,
               sqrt(CAST(n_docs AS DOUBLE)) / norm_raw AS weight,
               sqrt(CAST(n_docs AS DOUBLE)) / norm_raw
                 * CAST(total AS DOUBLE) AS expected_docs
        FROM counts CROSS JOIN totals
    ''',
    # winnowing: per-doc char-8-gram Karp–Rabin hashes, min (rightmost
    # tie) per 4-window, distinct (pos, hash) selections. The k-gram
    # list_reduce init-from-first equals Spark's fold-from-zero (first
    # step is 0·256 + c); the window fold's init is the first window
    # element on both sides.
    "winnowing_fingerprints": '''
        WITH d AS (
          SELECT doc_id,
                 list_transform(string_split(text, ''),
                                c -> CAST(ascii(c) AS BIGINT)) AS codes
          FROM documents WHERE length(text) >= 11),
        khs AS (
          SELECT doc_id,
                 list_transform(range(0, len(codes) - 8 + 1), i ->
                   list_reduce(codes[CAST(i + 1 AS INT):CAST(i + 8 AS INT)],
                               (acc, x) -> (acc * 256 + x) % 1000000007)) AS kh
          FROM d),
        sels AS (
          SELECT doc_id,
                 list_transform(range(0, len(kh) - 4 + 1), j ->
                   list_reduce(
                     list_transform(range(j, j + 4), idx ->
                       struct_pack(h := kh[CAST(idx + 1 AS INT)],
                                   p := CAST(idx AS INT))),
                     (acc, x) -> CASE WHEN x.h <= acc.h THEN x
                                      ELSE acc END)) AS sel
          FROM khs)
        SELECT DISTINCT doc_id, CAST(x.p AS INT) AS pos, x.h AS fp
        FROM (SELECT doc_id, unnest(sel) AS x FROM sels)
    ''',
})


ORACLES.update({
    # session_window semantics: new session when gap >= 30min (native
    # operator extends only while ts < session_end), window end =
    # last_ts + gap
    "session_window_stats": '''
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 CAST(value AS DECIMAL(18,4)) AS v
          FROM events),
        lagd AS (
          SELECT *,
            CASE WHEN ts_us - LAG(ts_us) OVER w >= 1800000000 THEN 1
                 WHEN LAG(ts_us) OVER w IS NULL THEN 1
                 ELSE 0 END AS new_session
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        sess AS (
          SELECT *, CAST(SUM(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
          FROM lagd)
        SELECT user_id,
               MIN(ts_us) AS start_us,
               MAX(ts_us) + 1800000000 AS end_us,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(v) AS DECIMAL(38,6)) AS DOUBLE) AS sum_value
        FROM sess
        GROUP BY user_id, sid
    ''',
})


# -- round-2 additions: TPC-H q13/15/17/18/19/22 shapes ----------------

ORACLES.update({
    "q13_customer_order_counts": """
        SELECT n_orders, COUNT(*) AS n_customers FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
        GROUP BY n_orders
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE)
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "q17_small_quantity_revenue": f"""
        WITH li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'),
        thresh AS (
          SELECT l_partkey,
                 0.2 * ({DSUM('l_quantity')} / COUNT(*)) AS qty_limit
          FROM li GROUP BY l_partkey)
        SELECT {DSUM('l_extendedprice')} / 7.0 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM li JOIN thresh USING (l_partkey)
        WHERE l_quantity < qty_limit
    """,
    "q18_large_volume_customers": f"""
        WITH big AS (
          SELECT l_orderkey, {DSUM('l_quantity')} AS total_qty
          FROM lineitem
          GROUP BY l_orderkey
          HAVING {DSUM('l_quantity')} > 250.0)
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q19_disjunctive_revenue": f"""
        SELECT CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_dormant_high_balance": f"""
        WITH thresh AS (
          SELECT {DSUM('c_acctbal')} / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0.0)
        SELECT n_name, COUNT(*) AS n_customers,
               {DSUM('c_acctbal')} AS total_balance
        FROM customer, thresh
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY n_name
    """,
})

# -- round-2 additions: event analytics --------------------------------

ORACLES.update({
    "cohort_retention": """
        WITH ev AS (
          SELECT user_id, strftime(ts, '%Y-%m-%d') AS active_day
          FROM events),
        cohort AS (
          SELECT user_id, MIN(active_day) AS cohort_day
          FROM ev GROUP BY user_id),
        active AS (SELECT DISTINCT user_id, active_day FROM ev)
        SELECT cohort_day, active_day, COUNT(*) AS n_users
        FROM active JOIN cohort USING (user_id)
        GROUP BY cohort_day, active_day
    """,
    "event_transitions": """
        WITH lagd AS (
          SELECT event_type,
                 LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type AS next_type,
               COUNT(*) AS n_transitions
        FROM lagd WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
    "daily_active_users": f"""
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               COUNT(DISTINCT user_id) AS dau,
               COUNT(*) AS n_events,
               {DSUM('value')} AS total_value
        FROM events
        GROUP BY strftime(ts, '%Y-%m-%d')
    """,
    "range_join_value_buckets": f"""
        WITH buckets(bucket, lo, hi) AS (VALUES
          ('small', 0.0, 50.0), ('mid', 50.0, 100.0),
          ('large', 100.0, 200.0), ('xlarge', 200.0, 500.0))
        SELECT bucket, lo, hi, COUNT(*) AS n_events,
               {DSUM('value')} AS total_value
        FROM events JOIN buckets ON value >= lo AND value < hi
        GROUP BY bucket, lo, hi
    """,
})

# -- round-2 additions: text / sampling --------------------------------

def _HEX8_TO_INT(expr: str) -> str:
    """First 8 md5 hex chars as a bigint (mirrors Spark's conv)."""
    return ("CAST(list_sum(list_transform(range(1, 9), "
            f"i -> (strpos('0123456789abcdef', substr(md5({expr}), "
            "CAST(i AS INT), 1)) - 1) "
            "* (CAST(1 AS BIGINT) << CAST(4 * (8 - i) AS INT)))) AS BIGINT)")


ORACLES.update({
    # count-min sketch: d=4 md5-seeded rows × w=64 counters; cell
    # counts are plain additive COUNTs, estimate = min over the 4
    # cells a token hashes to
    "token_countmin_topk": """
        WITH d AS (SELECT {toks} AS toks FROM documents),
        tok AS (SELECT unnest(toks) AS tok FROM d),
        cells AS (
          SELECT js.j * 64
                   + ({key_j} % 64) AS idx,
                 COUNT(*) AS cnt
          FROM tok, (SELECT unnest(range(0, 4)) AS j) js
          GROUP BY 1),
        topk AS (
          SELECT tok, COUNT(*) AS n_exact FROM tok GROUP BY tok
          ORDER BY n_exact DESC, tok ASC LIMIT 20),
        est AS (
          SELECT t.tok, t.n_exact, MIN(c.cnt) AS n_est
          FROM topk t
          CROSS JOIN (SELECT unnest(range(0, 4)) AS j) js
          JOIN cells c
            ON c.idx = js.j * 64 + ({key_t} % 64)
          GROUP BY t.tok, t.n_exact)
        SELECT tok AS token, CAST(n_exact AS BIGINT) AS n_exact,
               CAST(n_est AS BIGINT) AS n_est
        FROM est
    """.format(
        toks=TOKS,
        key_j=_HEX8_TO_INT("'cm' || js.j || '|' || tok"),
        key_t=_HEX8_TO_INT("'cm' || js.j || '|' || t.tok")),
    "token_freq_topk": f"""
        SELECT token, COUNT(*) AS n_occurrences
        FROM (SELECT unnest({TOKS}) AS token FROM documents)
        GROUP BY token
        ORDER BY n_occurrences DESC, token ASC
        LIMIT 20
    """,
    "doc_tfidf_top_terms": f"""
        WITH tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
          GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, term, tf, df,
                 tf * (CAST(n_docs AS DOUBLE) / df) AS score,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY tf * (CAST(n_docs AS DOUBLE) / df) DESC,
                            term ASC) AS INT) AS rnk
          FROM tf JOIN df USING (term), n)
        SELECT doc_id, term, tf, df, score, rnk
        FROM scored WHERE rnk <= 3
    """,
    # rational-idf BM25 (no ln) — fixed IEEE op chain on exact integer
    # inputs, folded in sorted term order, mirrors operators/text.py
    # bm25_scores bit-for-bit
    "bm25_scores": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        docs AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
        corpus AS (
          SELECT COUNT(*) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
          FROM docs),
        ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM docs),
        tf AS (
          SELECT doc_id, dl, term, COUNT(*) AS tf
          FROM ex WHERE term IN ('spark', 'query', 'join')
          GROUP BY doc_id, dl, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df
               FROM tf GROUP BY term),
        scored AS (
          -- e0 literals force DOUBLE (a bare 0.5 is DECIMAL in DuckDB,
          -- which would thread decimal arithmetic through the
          -- all-integer inputs and drift from Spark's IEEE chain)
          SELECT doc_id, term,
                 ((n_docs - df + 0.5e0) / (df + 0.5e0))
                 * ((tf * 2.2e0)
                    / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)))
                   AS term_score
          FROM tf JOIN df USING (term), corpus)
        SELECT doc_id, list_sum(list(term_score ORDER BY term)) AS bm25
        FROM scored GROUP BY doc_id
    """,
    # exact distinct checked bit-for-bit; each engine's own HLL sketch
    # verified against the 5% envelope (2.5x the rsd), so the flag is
    # deterministic and equal in both engines
    "approx_distinct_events": """
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS exact_users,
               CAST(abs(approx_count_distinct(user_id)
                        - COUNT(DISTINCT user_id))
                    <= 0.05 * COUNT(DISTINCT user_id) AS INT) AS approx_ok
        FROM events GROUP BY event_type
    """,
    "approx_value_percentiles": """
        SELECT event_type, COUNT(*) AS n_events,
               ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
               ROUND(quantile_cont(value, 0.9), 6) AS p90_exact,
               CAST(approx_quantile(value, 0.5)
                      BETWEEN quantile_cont(value, 0.45)
                          AND quantile_cont(value, 0.55) AS INT) AS ok50,
               CAST(approx_quantile(value, 0.9)
                      BETWEEN quantile_cont(value, 0.85)
                          AND quantile_cont(value, 0.95) AS INT) AS ok90
        FROM events GROUP BY event_type
    """,
    # plain GROUP BY: the salted two-phase plan must produce identical
    # results (exact decimal sum is salt-order-independent)
    "salted_event_type_stats": f"""
        SELECT event_type, COUNT(*) AS n_events,
               {DSUM('value')} AS sum_value
        FROM events GROUP BY event_type
    """,
    "deterministic_sample": f"""
        SELECT doc_id, lang, source,
               CAST({_HEX8_TO_INT("'split|' || CAST(doc_id AS VARCHAR)")}
                    % 100 AS INT) AS bucket
        FROM documents
        WHERE CAST({_HEX8_TO_INT("'split|' || CAST(doc_id AS VARCHAR)")}
                   % 100 AS INT) < 10
    """,
    "doc_quality_filters": f"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len({TOKS}) AS INTEGER) AS n_tokens,
                 CAST(len(list_distinct({TOKS})) AS INTEGER) AS n_distinct,
                 CAST(len(list_filter({TOKS},
                      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))
                      AS INTEGER) AS n_stop,
                 CAST(list_sum(list_transform({TOKS}, x -> length(x)))
                      AS INTEGER) AS sum_tok_len
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(n_tokens >= 30 AS INT) AS has_min_tokens,
               CAST(sum_tok_len <= 8 * n_tokens AS INT) AS mean_len_ok,
               CAST(n_stop > 0 AS INT) AS has_stopword,
               CAST(10 * n_distinct >= n_tokens AS INT) AS uniq_ok,
               CAST(n_tokens >= 30 AND sum_tok_len <= 8 * n_tokens
                    AND n_stop > 0 AND 10 * n_distinct >= n_tokens
                    AS INT) AS keep
        FROM d
    """,
})

# two unrolled Lloyd iterations (cent0 seeds -> a1/e1/b1/m1/cent1 ->
# a2/e2/b2); shared by kmeans_centroids and knn_ivf_trained
_KMEANS_CTES = f"""cent0 AS (
          SELECT vec_id AS centroid_id, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
        a1 AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent0 c)
          WHERE rn = 1),
        e1 AS (
          SELECT centroid_id, vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM a1, (SELECT unnest(range(1, 65)) AS i)),
        b1 AS (
          SELECT centroid_id, dim, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb
          FROM e1 GROUP BY centroid_id, dim, blk),
        m1 AS (
          SELECT centroid_id, dim,
                 list_sum(list(bsum ORDER BY blk))
                   / CAST(SUM(nb) AS BIGINT) AS centroid
          FROM b1 GROUP BY centroid_id, dim),
        cent1 AS (
          SELECT centroid_id, list(centroid ORDER BY dim) AS cvec
          FROM m1 GROUP BY centroid_id),
        a2 AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent1 c)
          WHERE rn = 1),
        e2 AS (
          SELECT centroid_id, vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM a2, (SELECT unnest(range(1, 65)) AS i)),
        b2 AS (
          SELECT centroid_id, dim, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb
          FROM e2 GROUP BY centroid_id, dim, blk)"""


# -- round-2 additions: similarity -------------------------------------

# product-quantization fragments: squared-L2 left fold over subspace m
# (8 dims), codebook from the first 16 embeddings' sub-vectors, argmin
# code per (vector, subspace) with ROW_NUMBER smallest-code tie-break
_PQ_D2 = ("list_sum(list_transform(range(1, 9), i -> "
          "(CAST({a}[CAST({m} * 8 + i AS INT)] AS DOUBLE) "
          "- {cv}[CAST(i AS INT)]) "
          "* (CAST({a}[CAST({m} * 8 + i AS INT)] AS DOUBLE) "
          "- {cv}[CAST(i AS INT)])))")

_PQ_BOOK = """book AS (
          SELECT m, vec_id AS code,
                 list_transform(
                   embedding[CAST(m * 8 + 1 AS INT):CAST(m * 8 + 8 AS INT)],
                   x -> CAST(x AS DOUBLE)) AS cv
          FROM embeddings, (SELECT unnest(range(0, 8)) AS m)
          WHERE vec_id < 16)"""

_PQ_CODES = f"""codes AS (
          SELECT vec_id, m, code FROM (
            SELECT e.vec_id, b.m, b.code,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id, b.m
                     ORDER BY {_PQ_D2.format(a='e.embedding', m='b.m',
                                             cv='b.cv')} ASC,
                              b.code ASC) AS rn
            FROM embeddings e CROSS JOIN book b)
          WHERE rn = 1)"""

ORACLES.update({
    # two-level block fold (vec_id // 256 blocks, then block order) —
    # mirrors the bounded-state Spark plan exactly
    "label_centroids": """
        WITH e AS (
          SELECT label, vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        blk AS (
          SELECT label, dim, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb
          FROM e GROUP BY label, dim, blk)
        SELECT label, CAST(dim AS INT) AS dim,
               list_sum(list(bsum ORDER BY blk))
                 / CAST(SUM(nb) AS BIGINT) AS centroid,
               CAST(SUM(nb) AS BIGINT) AS n
        FROM blk
        GROUP BY label, dim
    """,
    # PQ: 8 subspaces × 16 codes; codebook = sub-vectors of the first
    # 16 embeddings; argmin ties to the smallest code (Spark fold's
    # first strict minimum). _PQ_D2 is the same (x−y)² left fold both
    # engines run.
    "pq_codes": f"""
        WITH {_PQ_BOOK},
        {_PQ_CODES}
        SELECT vec_id, CAST(m AS INT) AS m, CAST(code AS BIGINT) AS code
        FROM codes
    """,
    "knn_pq_adc": f"""
        WITH {_PQ_BOOK},
        {_PQ_CODES},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        lut AS (
          SELECT b.m, b.code,
                 {_PQ_D2.format(a='q.qv', m='b.m', cv='b.cv')} AS d
          FROM book b CROSS JOIN q),
        adc AS (
          SELECT c.vec_id, list_sum(list(l.d ORDER BY l.m)) AS adc_dist
          FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.code
          GROUP BY c.vec_id)
        SELECT a.vec_id, e.label, a.adc_dist
        FROM adc a JOIN embeddings e USING (vec_id)
        WHERE a.vec_id <> 0
        ORDER BY adc_dist ASC, vec_id ASC
        LIMIT 10
    """,
    # two fixed Lloyd iterations unrolled: assignment = max cosine with
    # ROW_NUMBER tie-break to the smallest centroid_id (the Spark
    # argmax fold's first-strict-maximum), means = the same two-level
    # block fold as label_centroids
    "kmeans_centroids": f"""
        WITH {_KMEANS_CTES}
        SELECT centroid_id, CAST(dim AS INT) AS dim,
               list_sum(list(bsum ORDER BY blk))
                 / CAST(SUM(nb) AS BIGINT) AS centroid,
               CAST(SUM(nb) AS BIGINT) AS n
        FROM b2 GROUP BY centroid_id, dim
    """,
    "knn_ivf_trained": f"""
        WITH {_KMEANS_CTES},
        m2 AS (
          SELECT centroid_id, dim,
                 list_sum(list(bsum ORDER BY blk))
                   / CAST(SUM(nb) AS BIGINT) AS centroid
          FROM b2 GROUP BY centroid_id, dim),
        cent2 AS (
          SELECT centroid_id, list(centroid ORDER BY dim) AS cvec
          FROM m2 GROUP BY centroid_id),
        q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        probe AS (
          SELECT centroid_id FROM cent2, q
          ORDER BY {_cos('cvec', 'q')} DESC, centroid_id ASC
          LIMIT 2),
        assigned AS (
          SELECT vec_id, label, embedding, centroid_id FROM (
            SELECT e.vec_id, e.label, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent2 c)
          WHERE rn = 1)
        SELECT a.vec_id, a.label, {_cos('a.embedding', 'q.q')} AS cos_sim
        FROM assigned a
        JOIN probe USING (centroid_id)
        CROSS JOIN q
        WHERE a.vec_id <> 0
        ORDER BY cos_sim DESC, a.vec_id ASC
        LIMIT 10
    """,
    "knn_ivf_recall": f"""
        WITH {_KMEANS_CTES},
        m2 AS (
          SELECT centroid_id, dim,
                 list_sum(list(bsum ORDER BY blk))
                   / CAST(SUM(nb) AS BIGINT) AS centroid
          FROM b2 GROUP BY centroid_id, dim),
        cent2 AS (
          SELECT centroid_id, list(centroid ORDER BY dim) AS cvec
          FROM m2 GROUP BY centroid_id),
        q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        probe AS (
          SELECT centroid_id FROM cent2, q
          ORDER BY {_cos('cvec', 'q')} DESC, centroid_id ASC
          LIMIT 2),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent2 c)
          WHERE rn = 1),
        approx AS (
          SELECT a.vec_id
          FROM assigned a
          JOIN probe USING (centroid_id)
          CROSS JOIN q
          WHERE a.vec_id <> 0
          ORDER BY {_cos('a.embedding', 'q.q')} DESC, a.vec_id ASC
          LIMIT 10),
        exact AS (
          SELECT vec_id FROM embeddings, q
          WHERE vec_id <> 0
          ORDER BY {_cos('embedding', 'q')} DESC, vec_id ASC
          LIMIT 10)
        SELECT 10 AS k,
               CAST(COUNT(*) AS INTEGER) AS n_hits,
               CAST(COUNT(*) AS DOUBLE) / 10 AS recall_at_k
        FROM exact JOIN approx USING (vec_id)
    """,
    "knn_batch": f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT qid, e.vec_id, e.label,
                 {_cos('e.embedding', 'q.qv')} AS cos_sim,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY {_cos('e.embedding', 'q.qv')} DESC,
                            e.vec_id ASC) AS INT) AS rnk
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> qid)
        SELECT qid, vec_id, label, cos_sim, rnk
        FROM scored WHERE rnk <= 3
    """,
})


# -- round-2 additions: span dedup / quantization / frame sampling -----

ORACLES.update({
    "dedup_ngram_coverage": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct({SHINGLES})) AS shingle
          FROM d WHERE len(toks) >= 3),
        sdf AS (SELECT shingle, COUNT(*) AS sdf FROM sh GROUP BY shingle)
        SELECT doc_id, COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN sdf > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_shared,
               CAST(CAST(SUM(CASE WHEN sdf > 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS DOUBLE) / COUNT(*) AS dup_coverage
        FROM sh JOIN sdf USING (shingle)
        GROUP BY doc_id
    """,
    "embedding_quantize_int8": """
        WITH e AS (
          SELECT vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        rng AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM e GROUP BY dim)
        SELECT vec_id, CAST(dim AS INT) AS dim,
               CAST(CASE WHEN hi = lo THEN 0
                    ELSE least(255.0, floor((x - lo) * 255.0 / (hi - lo)))
                         - 128 END AS INT) AS code
        FROM e JOIN rng USING (dim)
    """,
    # character-based framing == the Python path's byte framing for this
    # ASCII corpus (same published assumption as multimodal_features'
    # ascii(text) first byte). The assumption is ENFORCED: any
    # non-ASCII document makes the oracle raise (error()) instead of
    # silently producing a wrong parity baseline — DuckDB has no blob
    # substring, so byte-exact framing can't be expressed directly.
    # additive byte checksum over the ASCII-enforced corpus (byte ==
    # code point there; the frame-sample oracle pins the same guard)
    "multimodal_byte_stats_arrow": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CAST(COALESCE(list_sum(list_transform(
                      string_split(CASE WHEN octet_length(encode(text))
                                             = length(text)
                                        THEN text
                                        ELSE error('non-ASCII doc '
                                                   || doc_id)
                                   END, '')
                      , c -> ascii(c))), 0) % 4294967296 AS BIGINT)
                 AS checksum32
        FROM documents
    """,
    # greedy byte-budget sharding: running byte total per source in
    # doc_id order; integer floor-div only (no float→int casts)
    "multimodal_shard_plan": """
        WITH b AS (
          SELECT doc_id, source,
                 CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
          FROM documents),
        runs AS (
          SELECT doc_id, source, byte_len,
                 CAST(SUM(byte_len) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - byte_len AS BIGINT)
                   AS start_byte
          FROM b)
        SELECT doc_id, source, byte_len, start_byte,
               start_byte // 4096 AS shard_id
        FROM runs
    """,
    "multimodal_frame_sample": """
        WITH f AS (
          SELECT doc_id,
                 CASE WHEN octet_length(encode(text)) = length(text)
                      THEN text
                      ELSE error('multimodal_frame_sample oracle: '
                                 || 'non-ASCII document ' || doc_id
                                 || '; char framing no longer matches '
                                 || 'the byte framing Spark computes')
                 END AS text,
                 unnest(range(0, (length(text) + 255) // 256, 4))
                   AS frame_idx
          FROM documents)
        SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
               CAST(length(substr(text, CAST(frame_idx * 256 + 1 AS INT),
                                  256)) AS INT) AS frame_len,
               md5(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256))
                 AS frame_md5
        FROM f
    """,
})


# -- round-2 additions: remaining TPC-H shapes ------------------------

ORACLES.update({
    "q2_min_cost_supplier": f"""
        WITH pair_cost AS (
          SELECT l_partkey, l_suppkey, p_name, p_size,
                 {DSUM('l_extendedprice')} / {DSUM('l_quantity')}
                   AS unit_cost
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_size <= 10
          GROUP BY l_partkey, l_suppkey, p_name, p_size),
        part_min AS (
          SELECT l_partkey AS m_partkey, MIN(unit_cost) AS min_cost
          FROM pair_cost GROUP BY l_partkey)
        SELECT l_partkey AS p_partkey, p_name, p_size,
               s_suppkey, s_name, s_acctbal, unit_cost
        FROM pair_cost
        JOIN part_min ON l_partkey = m_partkey AND unit_cost = min_cost
        JOIN supplier ON l_suppkey = s_suppkey
    """,
    "q11_important_parts": f"""
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE)
                   AS part_value
          FROM lineitem GROUP BY l_partkey),
        total AS (
          SELECT CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE)
                 / COUNT(DISTINCT l_partkey)
                 * CAST(1.3 AS DOUBLE) AS threshold
          FROM lineitem)
        SELECT l_partkey, part_value
        FROM per_part, total
        WHERE part_value > threshold
    """,
    "q12_late_shipment_priority": """
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_priority
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE year(l_shipdate) = 1997
        GROUP BY 1
    """,
    "q16_supplier_variety": """
        WITH pairs AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
          WHERE l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        SELECT p_brand,
               CAST(FLOOR(p_size / 10) * 10 AS INT) AS size_bucket,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM pairs JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, size_bucket
    """,
    "q20_excess_supply_suppliers": f"""
        WITH li AS (
          SELECT l_partkey, l_suppkey, l_quantity
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE year(l_shipdate) = 1997 AND p_name LIKE 'small%'),
        pair_qty AS (
          SELECT l_partkey, l_suppkey, {DSUM('l_quantity')} AS pair_qty
          FROM li GROUP BY l_partkey, l_suppkey),
        part_qty AS (
          SELECT l_partkey AS q_partkey,
                 {DSUM('l_quantity')} * CAST(0.3 AS DOUBLE) AS qty_bar
          FROM li GROUP BY l_partkey),
        heavy AS (
          SELECT DISTINCT l_suppkey
          FROM pair_qty JOIN part_qty ON l_partkey = q_partkey
          WHERE pair_qty > qty_bar)
        SELECT s_suppkey, s_name, n_name
        FROM heavy
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
    """,
    "q21_sole_late_supplier": """
        WITH li AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        per_order AS (
          SELECT l_orderkey AS g_orderkey,
                 COUNT(DISTINCT l_suppkey) AS n_supps,
                 COUNT(DISTINCT CASE WHEN late THEN l_suppkey END)
                   AS n_late_supps
          FROM li GROUP BY l_orderkey),
        culprit AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM li JOIN per_order ON l_orderkey = g_orderkey
          WHERE late AND n_supps > 1 AND n_late_supps = 1)
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM culprit JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20
    """,
})


# -- round-2 additions: training-data curation ops --------------------

_BIGRAMS = ("CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), "
            "i -> toks[i] || ' ' || toks[i+1]) ELSE [] END")

_SIMHASH_CTE = f"""
d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
th AS (SELECT doc_id, md5(tok) AS h, cnt FROM tc),
bits AS (
  SELECT doc_id, j,
         ((strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
           >> CAST(3 - (j % 4) AS INT)) & 1 AS bit,
         cnt
  FROM th, (SELECT unnest(range(60)) AS j)),
agg AS (SELECT doc_id, j, SUM((2 * bit - 1) * cnt) AS s FROM bits GROUP BY 1, 2),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM agg GROUP BY doc_id),
banded AS (
  SELECT doc_id, simhash, b AS band_id,
         (simhash >> CAST(15 * b AS INT)) & 32767 AS band_val
  FROM sh, (SELECT unnest(range(4)) AS b))"""

_AGREE_SUM = " + ".join(
    f"CASE WHEN a.h{j} = b.h{j} THEN 1 ELSE 0 END" for j in range(16))

ORACLES.update({
    "doc_repetition_ratio": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        bg AS (SELECT doc_id, {_BIGRAMS} AS bg FROM d WHERE len(toks) >= 2)
        SELECT doc_id,
               CAST(len(bg) AS INTEGER) AS n_bigrams,
               CAST(len(list_distinct(bg)) AS INTEGER) AS n_distinct_bigrams,
               1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                 AS repetition_ratio
        FROM bg
    """,
    "bigram_lm_top_successor": f"""
        WITH d AS (SELECT {TOKS} AS toks FROM documents),
        bg AS (
          SELECT unnest({_BIGRAMS}) AS b FROM d WHERE len(toks) >= 2),
        split_bg AS (
          SELECT string_split(b, ' ')[1] AS w1,
                 string_split(b, ' ')[2] AS w2 FROM bg),
        pair_cnt AS (
          SELECT w1, w2, COUNT(*) AS c12 FROM split_bg GROUP BY w1, w2),
        uni_cnt AS (
          SELECT w1, COUNT(*) AS c1 FROM split_bg GROUP BY w1),
        ranked AS (
          SELECT p.w1, p.w2, p.c12, u.c1,
                 ROW_NUMBER() OVER (PARTITION BY p.w1
                                    ORDER BY p.c12 DESC, p.w2 ASC) AS rn
          FROM pair_cnt p JOIN uni_cnt u ON p.w1 = u.w1)
        SELECT w1, w2 AS top_successor,
               CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
               CAST(c12 AS DOUBLE) / c1 AS cond_prob
        FROM ranked WHERE rn = 1
    """,
    "contamination_overlap": f"""
        WITH d AS (SELECT doc_id, source, {TOKS} AS toks FROM documents),
        sh AS (
          SELECT doc_id, source, unnest(list_distinct({SHINGLES})) AS shingle
          FROM d WHERE len(toks) >= 3),
        sdict AS (
          SELECT shingle, COUNT(DISTINCT source) AS n_sources,
                 MIN(source) AS only_source
          FROM sh GROUP BY shingle)
        SELECT doc_id, source,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN n_sources > 1 OR only_source <> source
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
               CAST(SUM(CASE WHEN n_sources > 1 OR only_source <> source
                             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                 AS contamination
        FROM sh JOIN sdict USING (shingle)
        GROUP BY doc_id, source
    """,
    "stratified_sample": f"""
        WITH d AS (
          SELECT doc_id, lang,
                 CAST({_HEX8_TO_INT("'strat|' || CAST(doc_id AS VARCHAR)")}
                      % 100 AS INT) AS bucket,
                 CAST(CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 60
                      WHEN 'es' THEN 60 WHEN 'fr' THEN 60
                      WHEN 'zh' THEN 90 ELSE 0 END AS INT) AS keep_pct
          FROM documents)
        SELECT doc_id, lang, bucket, keep_pct
        FROM d WHERE bucket < keep_pct
    """,
    "simhash_hamming_pairs": f"""
        WITH {_SIMHASH_CTE},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS sim_a, b.simhash AS sim_b
          FROM banded a
          JOIN banded b ON a.band_id = b.band_id
                       AND a.band_val = b.band_val
                       AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """,
    "minhash_jaccard_estimate": f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST({_AGREE_SUM} AS INT) AS n_agree,
               CAST({_AGREE_SUM} AS DOUBLE) / 16 AS jaccard_est
        FROM pairs
        JOIN sig a ON pairs.doc_a = a.doc_id
        JOIN sig b ON pairs.doc_b = b.doc_id
    """,
})


def _hyperplane_sql_literals() -> str:
    """VALUES rows (k, ±1 plane) matching similarity.HYPERPLANES."""
    from .operators.similarity import HYPERPLANES

    rows = ", ".join(
        f"({k}, [{', '.join(str(s) for s in signs)}])"
        for k, signs in enumerate(HYPERPLANES))
    return rows


ORACLES.update({
    "hyperplane_lsh_buckets": f"""
        WITH hp(k, signs) AS (VALUES {_hyperplane_sql_literals()}),
        dots AS (
          SELECT vec_id, k,
                 list_sum(list_transform(range(1, 65),
                   i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                        * signs[CAST(i AS INT)])) AS dot_k
          FROM embeddings, hp)
        SELECT vec_id,
               CAST(SUM(CASE WHEN dot_k >= 0 THEN 1 << CAST(k AS INT)
                             ELSE 0 END) AS INT) AS bucket
        FROM dots GROUP BY vec_id
    """,
})


def _hyperplane_sql_literals_n(n: int) -> str:
    from .operators.similarity import HYPERPLANES

    return ", ".join(
        f"({k}, [{', '.join(str(s) for s in signs)}])"
        for k, signs in enumerate(HYPERPLANES[:n]))


_BUCKETS_CTE = f"""
hp(k, signs) AS (VALUES {_hyperplane_sql_literals_n(8)}),
dots AS (
  SELECT vec_id, k,
         list_sum(list_transform(range(1, 65),
           i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                * signs[CAST(i AS INT)])) AS dot_k
  FROM embeddings, hp),
buckets AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dot_k >= 0 THEN 1 << CAST(k AS INT)
                       ELSE 0 END) AS INT) AS bucket
  FROM dots GROUP BY vec_id),
assigned AS (
  SELECT e.vec_id, e.label, e.embedding, b.bucket
  FROM embeddings e JOIN buckets b USING (vec_id))"""

# banded pair-candidate CTE over the FULL 16-plane code: 4 disjoint
# 4-bit bands, candidates agree on >=1 whole band, then exact cosine
# over unit-normalized vectors (mirrors operators/similarity.py
# embedding_near_dup_pairs bit-for-bit)
_PAIR_CTE = f"""
hp16(k, signs) AS (VALUES {_hyperplane_sql_literals_n(16)}),
dots16 AS (
  SELECT vec_id, k,
         list_sum(list_transform(range(1, 65),
           i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                * signs[CAST(i AS INT)])) AS dot_k
  FROM embeddings, hp16),
buckets16 AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dot_k >= 0 THEN 1 << CAST(k AS INT)
                       ELSE 0 END) AS INT) AS bucket
  FROM dots16 GROUP BY vec_id),
bands16 AS (
  SELECT vec_id, band_id,
         (bucket >> CAST(4 * band_id AS INT)) & 15 AS band_val
  FROM buckets16, (SELECT unnest(range(4)) AS band_id)),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands16 a JOIN bands16 b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id),
norm AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(x AS DOUBLE)
                / sqrt({DOT_Q.format(a='embedding', b='embedding')})) AS nv
  FROM embeddings)"""

_PAIR_DOT = ("list_sum(list_transform(range(1, 65), "
             "i -> a.nv[i] * b.nv[i]))")

ORACLES.update({
    "embedding_near_dup_pairs": f"""
        WITH {_PAIR_CTE}
        SELECT vec_a, vec_b, {_PAIR_DOT} AS cos_sim
        FROM cand
        JOIN norm a ON vec_a = a.vec_id
        JOIN norm b ON vec_b = b.vec_id
        WHERE {_PAIR_DOT} >= 0.3
    """,
    # radius query: candidates sharing >=1 band with vector 0 (pairs
    # with 0 always have vec_a = 0 since ids are positive), exact
    # normalized dot >= tau
    "ann_range_search": f"""
        WITH {_PAIR_CTE}
        SELECT vec_b AS vec_id, {_PAIR_DOT} AS cos_sim
        FROM cand
        JOIN norm a ON vec_a = a.vec_id
        JOIN norm b ON vec_b = b.vec_id
        WHERE vec_a = 0 AND {_PAIR_DOT} >= 0.15
    """,
    "semantic_dedup_pairs": f"""
        WITH {_PAIR_CTE},
        pairs AS (
          SELECT vec_a, vec_b, {_PAIR_DOT} AS cos_sim
          FROM cand
          JOIN norm a ON vec_a = a.vec_id
          JOIN norm b ON vec_b = b.vec_id
          WHERE {_PAIR_DOT} >= 0.3),
        h AS (SELECT doc_id, md5(text) AS h FROM documents)
        SELECT p.vec_a AS doc_a, p.vec_b AS doc_b, p.cos_sim,
               CAST(da.h = db.h AS INT) AS same_text
        FROM pairs p
        JOIN h da ON p.vec_a = da.doc_id
        JOIN h db ON p.vec_b = db.doc_id
    """,
    "semantic_dedup_components": f'''
        WITH RECURSIVE {_PAIR_CTE},
        vpairs AS (
          SELECT vec_a AS doc_a, vec_b AS doc_b
          FROM cand
          JOIN norm a ON vec_a = a.vec_id
          JOIN norm b ON vec_b = b.vec_id
          WHERE {_PAIR_DOT} >= 0.3),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM vpairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM vpairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src)
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ''',
    "near_dup_recall": f"""
        WITH {_PAIR_CTE},
        truep AS (
          SELECT COUNT(*) AS n_true
          FROM norm a JOIN norm b ON a.vec_id < b.vec_id
          WHERE {_PAIR_DOT} >= 0.3),
        foundp AS (
          SELECT COUNT(*) AS n_found
          FROM cand
          JOIN norm a ON vec_a = a.vec_id
          JOIN norm b ON vec_b = b.vec_id
          WHERE {_PAIR_DOT} >= 0.3)
        SELECT CAST(n_true AS INT) AS n_true,
               CAST(n_found AS INT) AS n_found,
               CAST(n_found AS DOUBLE) / n_true AS recall
        FROM truep, foundp
    """,
})

ORACLES.update({
    "knn_lsh": f"""
        WITH {_BUCKETS_CTE},
        qrow AS (SELECT embedding AS q, bucket AS qb
                 FROM assigned WHERE vec_id = 0),
        probes AS (
          SELECT DISTINCT CASE WHEN k = -1 THEN qb
                          ELSE xor(qb, 1 << CAST(k AS INT)) END AS bucket
          FROM qrow, (SELECT unnest(range(-1, 8)) AS k))
        SELECT a.vec_id, a.label, {_cos('a.embedding', 'qrow.q')} AS cos_sim
        FROM assigned a
        JOIN probes USING (bucket)
        CROSS JOIN qrow
        WHERE a.vec_id <> 0
        ORDER BY cos_sim DESC, a.vec_id ASC
        LIMIT 10
    """,
    "ivf_cluster_stats": f"""
        WITH cent AS (SELECT vec_id AS centroid_id, embedding AS cvec
                      FROM embeddings WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id, label, centroid_id FROM (
            SELECT e.vec_id, e.label, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent c)
          WHERE rn = 1)
        SELECT centroid_id, COUNT(*) AS n_vectors,
               COUNT(DISTINCT label) AS n_labels
        FROM assigned
        GROUP BY centroid_id
    """,
})


ORACLES.update({
    "knn_lsh_recall": f"""
        WITH {_BUCKETS_CTE},
        qrow AS (SELECT embedding AS q, bucket AS qb
                 FROM assigned WHERE vec_id = 0),
        probes AS (
          SELECT DISTINCT CASE WHEN k = -1 THEN qb
                          ELSE xor(qb, 1 << CAST(k AS INT)) END AS bucket
          FROM qrow, (SELECT unnest(range(-1, 8)) AS k)),
        approx AS (
          SELECT a.vec_id
          FROM assigned a
          JOIN probes USING (bucket)
          CROSS JOIN qrow
          WHERE a.vec_id <> 0
          ORDER BY {_cos('a.embedding', 'qrow.q')} DESC, a.vec_id ASC
          LIMIT 10),
        q2 AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        exact AS (
          SELECT vec_id FROM embeddings, q2
          WHERE vec_id <> 0
          ORDER BY {_cos('embedding', 'q')} DESC, vec_id ASC
          LIMIT 10)
        SELECT 10 AS k, CAST(COUNT(*) AS INT) AS n_hits,
               COUNT(*) / 10 AS recall_at_k
        FROM exact JOIN approx USING (vec_id)
    """,
    # two-level block fold, see label_centroids
    "embedding_dim_stats": """
        WITH e AS (
          SELECT vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        blk AS (
          SELECT dim, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb, MIN(x) AS mn, MAX(x) AS mx
          FROM e GROUP BY dim, blk)
        SELECT CAST(dim AS INT) AS dim,
               CAST(SUM(nb) AS BIGINT) AS n,
               list_sum(list(bsum ORDER BY blk))
                 / CAST(SUM(nb) AS BIGINT) AS mean_val,
               MIN(mn) AS min_val, MAX(mx) AS max_val
        FROM blk
        GROUP BY dim
    """,
    "incremental_dedup": """
        WITH hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
        snapshot AS (SELECT DISTINCT h FROM hashed WHERE doc_id % 5 <> 0),
        batch AS (SELECT doc_id, h FROM hashed WHERE doc_id % 5 = 0)
        SELECT doc_id,
               CAST(CASE WHEN h IN (SELECT h FROM snapshot)
                    THEN 1 ELSE 0 END AS INT) AS is_dup
        FROM batch
    """,
})


ORACLES.update({
    "curation_pipeline": f"""
        WITH hashed AS (
          SELECT doc_id, lang, source, text, md5(text) AS h
          FROM documents),
        canon AS (
          SELECT doc_id, lang, source, text FROM hashed
          QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY h)),
        feats AS (
          SELECT doc_id, lang, source,
                 CAST(len({TOKS}) AS INTEGER) AS n_tokens,
                 CAST(len(list_distinct({TOKS})) AS INTEGER) AS n_distinct,
                 CAST(len(list_filter({TOKS},
                      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))
                      AS INTEGER) AS n_stop,
                 CAST(list_sum(list_transform({TOKS}, x -> length(x)))
                      AS INTEGER) AS sum_tok_len
          FROM canon),
        split_tag AS (
          SELECT doc_id, lang, source, n_tokens, n_distinct, n_stop,
                 sum_tok_len,
                 CAST(list_sum(list_transform(range(1, 8),
                   i -> (strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR) || '|split'),
                                 CAST(i AS INT), 1)) - 1)
                        * (CAST(1 AS BIGINT) << CAST(4 * (7 - i) AS INT))))
                      AS BIGINT) % 10 AS bucket
          FROM feats)
        SELECT doc_id, lang, source, n_tokens,
               CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM split_tag
        WHERE n_tokens >= 30 AND sum_tok_len <= 8 * n_tokens
          AND n_stop > 0 AND 10 * n_distinct >= n_tokens
    """,
    "doc_dup_rate_by_source": """
        WITH hashed AS (SELECT doc_id, source, md5(text) AS h
                        FROM documents),
        flagged AS (
          SELECT source,
                 CAST(doc_id > MIN(doc_id) OVER (PARTITION BY h) AS INT)
                   AS is_dup
          FROM hashed)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(is_dup) AS BIGINT) AS n_dups,
               CAST(SUM(is_dup) AS BIGINT) / COUNT(*) AS dup_rate
        FROM flagged
        GROUP BY source
    """,
})


ORACLES.update({
    "fk_integrity_audit": """
        SELECT 'lineitem.orderkey->orders' AS fk, COUNT(*) AS n_orphans
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'orders.custkey->customer', COUNT(*)
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'lineitem.partkey->part', COUNT(*)
        FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
        UNION ALL
        SELECT 'lineitem.suppkey->supplier', COUNT(*)
        FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
        UNION ALL
        SELECT 'customer.nationkey->nation', COUNT(*)
        FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
    """,
    "numeric_profile": """
        WITH w AS (
          SELECT COUNT(*) AS n,
                 COUNT(l_quantity) AS nn_q, MIN(l_quantity) AS mn_q,
                 MAX(l_quantity) AS mx_q,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                      AS DECIMAL(38,6)) AS DOUBLE) AS sm_q,
                 COUNT(l_extendedprice) AS nn_e, MIN(l_extendedprice) AS mn_e,
                 MAX(l_extendedprice) AS mx_e,
                 CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                      AS DECIMAL(38,6)) AS DOUBLE) AS sm_e,
                 COUNT(l_discount) AS nn_d, MIN(l_discount) AS mn_d,
                 MAX(l_discount) AS mx_d,
                 CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,4)))
                      AS DECIMAL(38,6)) AS DOUBLE) AS sm_d,
                 COUNT(l_tax) AS nn_t, MIN(l_tax) AS mn_t,
                 MAX(l_tax) AS mx_t,
                 CAST(CAST(SUM(CAST(l_tax AS DECIMAL(8,4)))
                      AS DECIMAL(38,6)) AS DOUBLE) AS sm_t
          FROM lineitem)
        SELECT 'l_quantity' AS "column", n, n - nn_q AS n_null,
               mn_q AS min_val, mx_q AS max_val, sm_q AS sum_val FROM w
        UNION ALL
        SELECT 'l_extendedprice', n, n - nn_e, mn_e, mx_e, sm_e FROM w
        UNION ALL
        SELECT 'l_discount', n, n - nn_d, mn_d, mx_d, sm_d FROM w
        UNION ALL
        SELECT 'l_tax', n, n - nn_t, mn_t, mx_t, sm_t FROM w
    """,
})


ORACLES["user_value_histogram_pandas"] = ORACLES["user_value_histogram"]


def _portable_q1() -> str:
    from .operators.relational import PORTABLE_Q1_SQL

    return PORTABLE_Q1_SQL.format(table="lineitem")


ORACLES["sql_pricing_summary"] = _portable_q1()


# -- round-3 wave: redaction / vocab / packing / classifier / sliding --

_BLOCK_RE_SQL = r"\b(spark|dup)\b"
_EMAIL_RE_SQL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE_SQL = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

ORACLES.update({
    # regex subset is Java∩RE2 (no lookaround/backrefs): both engines
    # see the same matches; md5 is over the UTF-8 bytes in both
    "pii_redaction": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_EMAIL_RE_SQL}'))
                 AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(text, '{_IPV4_RE_SQL}'))
                 AS INTEGER) AS n_ipv4,
               CAST(len(regexp_extract_all(text, '{_BLOCK_RE_SQL}'))
                 AS INTEGER) AS n_blocked,
               md5(regexp_replace(text, '{_BLOCK_RE_SQL}',
                                  '[REDACTED]', 'g')) AS redacted_md5,
               CAST(length(regexp_replace(text, '{_BLOCK_RE_SQL}',
                                          '[REDACTED]', 'g'))
                 AS INTEGER) AS redacted_len
        FROM documents
    """,
    "doc_oov_rate": f"""
        WITH vocab AS (
          SELECT token
          FROM (SELECT unnest({TOKS}) AS token FROM documents)
          GROUP BY token
          ORDER BY COUNT(*) DESC, token ASC
          LIMIT 16),
        v AS (SELECT list_sort(list(token)) AS vocab FROM vocab),
        d AS (SELECT doc_id, {TOKS} AS toks FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(len(list_filter(toks,
                 x -> NOT list_contains(vocab, x))) AS INTEGER) AS n_oov,
               CAST(len(list_filter(toks,
                 x -> NOT list_contains(vocab, x))) AS INTEGER)
                 / CAST(len(toks) AS INTEGER) AS oov_rate
        FROM d, v
    """,
    "sequence_packing": f"""
        WITH d AS (
          SELECT doc_id, lang, CAST(len({TOKS}) AS INTEGER) AS n_tokens
          FROM documents),
        packed AS (
          SELECT doc_id, lang, n_tokens,
                 COALESCE(CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS cum_before
          FROM d)
        SELECT lang,
               CAST(FLOOR(cum_before / 256.0) AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM packed
        GROUP BY lang, CAST(FLOOR(cum_before / 256.0) AS BIGINT)
    """,
    # slot/weight arithmetic is pure BIGINT (order-free sum), so the
    # fold is bit-exact in any engine; mirror of operators/text.py
    # hashed_classifier_score
    "hashed_classifier_score": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        s AS (
          SELECT doc_id,
                 CAST(len(toks) AS INTEGER) AS n_tokens,
                 CAST(COALESCE(list_sum(list_transform(toks,
                   x -> (({_HEX8_TO_INT('x')} % 1024) * 2654435761)
                        % 1024 - 512)), 0) AS BIGINT) AS w_sum
          FROM d)
        SELECT doc_id, n_tokens, w_sum,
               w_sum / 256.0 AS score,
               CAST(w_sum > 0 AS INTEGER) AS pred_positive
        FROM s
    """,
    # every event falls in exactly two (10 min, slide 5 min) windows:
    # floor(ts/5m) and the one before — mirrors Spark's epoch-aligned
    # window() generator
    "sliding_window_event_counts": f"""
        WITH ev AS (
          SELECT epoch_us(ts) AS us, event_type, value FROM events),
        w AS (
          SELECT (us // 300000000) * 300000000 AS s1, event_type, value
          FROM ev),
        x AS (
          SELECT unnest([s1 - 300000000, s1]) AS ws, event_type, value
          FROM w)
        SELECT strftime(make_timestamp(ws),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               strftime(make_timestamp(ws + 600000000),
                        '%Y-%m-%d %H:%M:%S') AS window_end,
               event_type,
               COUNT(*) AS n_events,
               {DSUM('value')} AS sum_value
        FROM x
        GROUP BY ws, event_type
    """,
})


# hybrid retrieval: RRF over the BM25 oracle (reused as a subquery)
# and a cosine ranking; integer ranks → bit-portable fusion scores
ORACLES.update({
    "hybrid_search_rrf": f"""
        WITH bm_head AS (
          SELECT doc_id, bm25 FROM ({ORACLES['bm25_scores']})
          ORDER BY bm25 DESC, doc_id ASC LIMIT 100),
        bm_ranked AS (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
                      AS INT) AS r_bm
          FROM bm_head),
        q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        vec_head AS (
          SELECT vec_id AS doc_id,
                 {_cos('embedding', 'q')} AS cos_sim
          FROM embeddings, q
          WHERE vec_id <> 0
          ORDER BY cos_sim DESC, doc_id ASC LIMIT 100),
        vec_ranked AS (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (
                   ORDER BY cos_sim DESC, doc_id ASC) AS INT) AS r_vec
          FROM vec_head)
        SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
               (CASE WHEN b.r_bm IS NOT NULL
                     THEN CAST(1.0 AS DOUBLE) / (60 + b.r_bm)
                     ELSE CAST(0.0 AS DOUBLE) END
                + CASE WHEN v.r_vec IS NOT NULL
                       THEN CAST(1.0 AS DOUBLE) / (60 + v.r_vec)
                       ELSE CAST(0.0 AS DOUBLE) END) AS rrf_score,
               b.r_bm, v.r_vec
        FROM bm_ranked b FULL OUTER JOIN vec_ranked v ON b.doc_id = v.doc_id
        ORDER BY rrf_score DESC, doc_id ASC
        LIMIT 10
    """,
})

# -- round-4 wave: training-order shuffle + per-source quotas ----------

ORACLES.update({
    # global shard+rank order; the two-phase Spark plan must reduce to
    # the plain single-window answer
    "deterministic_shuffle": f"""
        WITH d AS (
          SELECT doc_id,
                 {_HEX8_TO_INT("'shuf|' || CAST(doc_id AS VARCHAR)")}
                   AS shuffle_key
          FROM documents)
        SELECT doc_id,
               CAST(shuffle_key % 8 AS INT) AS shard, shuffle_key,
               CAST(ROW_NUMBER() OVER (
                      PARTITION BY shuffle_key % 8
                      ORDER BY shuffle_key, doc_id) AS INT) AS pos
        FROM d
    """,
    "source_quota_sample": f"""
        WITH d AS (
          SELECT doc_id, source,
                 {_HEX8_TO_INT("'quota|' || CAST(doc_id AS VARCHAR)")}
                   AS key
          FROM documents),
        ranked AS (
          SELECT doc_id, source, key,
                 CAST(ROW_NUMBER() OVER (
                        PARTITION BY source
                        ORDER BY key, doc_id) AS INT) AS rk
          FROM d)
        SELECT doc_id, source, key, rk FROM ranked WHERE rk <= 15
    """,
})

# Bloom-prefiltered incremental dedup: same 4 md5-affine bit
# positions, bitmap built relationally (the oracle needs no broadcast
# trick — a word-table join expresses the same bits)
ORACLES.update({
    "bloom_prefilter_dedup": f"""
        WITH hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
        snapshot AS (SELECT DISTINCT h FROM hashed WHERE doc_id % 5 <> 0),
        batch AS (SELECT doc_id, h FROM hashed WHERE doc_id % 5 = 0),
        js AS (SELECT j FROM (VALUES (0),(1),(2),(3)) AS t(j)),
        spos AS (
          SELECT DISTINCT
                 {_HEX8_TO_INT("'bl' || CAST(js.j AS VARCHAR) || '|' || s.h")}
                   % 65536 AS pos
          FROM snapshot s, js),
        words AS (
          SELECT pos // 64 AS w,
                 bit_or(CAST(1 AS UBIGINT) << CAST(pos % 64 AS INT)) AS bits
          FROM spos GROUP BY pos // 64),
        bpos AS (
          SELECT b.doc_id, b.h,
                 {_HEX8_TO_INT("'bl' || CAST(js.j AS VARCHAR) || '|' || b.h")}
                   % 65536 AS pos
          FROM batch b, js),
        btest AS (
          SELECT doc_id, h,
                 MIN(CASE WHEN (COALESCE(w.bits, CAST(0 AS UBIGINT))
                                >> CAST(pos % 64 AS INT)) & 1 = 1
                          THEN 1 ELSE 0 END) AS bloom_hit
          FROM bpos LEFT JOIN words w ON pos // 64 = w.w
          GROUP BY doc_id, h)
        SELECT doc_id, CAST(bloom_hit AS INT) AS bloom_hit,
               CAST(CASE WHEN bloom_hit = 1
                          AND h IN (SELECT h FROM snapshot)
                         THEN 1 ELSE 0 END AS INT) AS is_dup
        FROM btest
    """,
})

# per-doc bigram-LM fluency: integer-ppm terms make every aggregate
# exact bigint arithmetic; the single final division is the only float
ORACLES.update({
    "doc_bigram_lm_score": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        bg AS (
          SELECT doc_id, unnest({_BIGRAMS}) AS b
          FROM d WHERE len(toks) >= 2),
        sp AS (
          SELECT doc_id, string_split(b, ' ')[1] AS w1,
                 string_split(b, ' ')[2] AS w2 FROM bg),
        pair_cnt AS (
          SELECT w1, w2, COUNT(*) AS c12 FROM sp GROUP BY w1, w2),
        uni_cnt AS (
          SELECT w1, COUNT(*) AS c1 FROM sp GROUP BY w1),
        terms AS (
          SELECT s.doc_id,
                 (CAST(1000000 AS BIGINT) * p.c12) // u.c1 AS ppm
          FROM sp s
          JOIN pair_cnt p ON s.w1 = p.w1 AND s.w2 = p.w2
          JOIN uni_cnt u ON s.w1 = u.w1)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(MIN(ppm) AS BIGINT) AS min_ppm,
               CAST(SUM(ppm) AS BIGINT) AS sum_ppm,
               CAST(SUM(ppm) AS DOUBLE) / (COUNT(*) * 1000000)
                 AS avg_prob
        FROM terms GROUP BY doc_id
    """,
})

# calendar resample + forward fill; generate_series spine, LAST_VALUE
# IGNORE NULLS fill — the filled value is carried, never recomputed
ORACLES.update({
    "daily_value_ffill": """
        WITH e AS (
          SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id, value
          FROM events),
        daily AS (
          SELECT user_id, d, value AS obs_value FROM e
          QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id, d
            ORDER BY ts DESC, event_id DESC) = 1),
        spine AS (
          SELECT user_id,
                 CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                             CAST(hi AS TIMESTAMP),
                                             INTERVAL 1 DAY)) AS DATE)
                   AS d
          FROM (SELECT user_id, MIN(d) AS lo, MAX(d) AS hi
                FROM e GROUP BY user_id))
        SELECT s.user_id,
               strftime(s.d, '%Y-%m-%d') AS day,
               LAST_VALUE(dl.obs_value IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS value_ffill,
               CAST(dl.obs_value IS NOT NULL AS INT) AS is_observed
        FROM spine s LEFT JOIN daily dl
          ON s.user_id = dl.user_id AND s.d = dl.d
    """,
})

# quality-aware canonical selection over the LSH near-dup components:
# same recursive-CTE component labels as dedup_components, joined to
# the bit-portable quality score, per-cluster argmax
ORACLES.update({
    "dedup_keep_best": f'''
        WITH RECURSIVE {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src),
        labeled AS (
          SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
        q AS (
          SELECT doc_id,
                 (n_distinct / n_tokens) * 0.4
                   + (1.0 - n_stop / n_tokens) * 0.4
                   + least(n_tokens / 100.0, 1.0) * 0.2 AS quality_score
          FROM (SELECT doc_id,
                       CAST(len({TOKS}) AS INTEGER) AS n_tokens,
                       CAST(len(list_distinct({TOKS})) AS INTEGER)
                         AS n_distinct,
                       CAST(len(list_filter({TOKS},
                            x -> x IN ('the', 'a', 'of', 'and', 'to',
                                       'in'))) AS INTEGER) AS n_stop
                FROM documents)),
        ranked AS (
          SELECT l.component, l.doc_id, q.quality_score,
                 ROW_NUMBER() OVER (
                   PARTITION BY l.component
                   ORDER BY q.quality_score DESC, l.doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY l.component) AS n_members
          FROM labeled l JOIN q ON l.doc_id = q.doc_id)
        SELECT component, doc_id AS best_doc_id,
               quality_score AS best_quality,
               CAST(n_members AS BIGINT) AS n_members
        FROM ranked WHERE rn = 1
    ''',
})

# two-stage PQ serve: ADC shortlist (engine-exact ordering) -> exact
# cosine re-rank over the full floats
ORACLES.update({
    "knn_pq_refine": f"""
        WITH {_PQ_BOOK},
        {_PQ_CODES},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        lut AS (
          SELECT b.m, b.code,
                 {_PQ_D2.format(a='q.qv', m='b.m', cv='b.cv')} AS d
          FROM book b CROSS JOIN q),
        adc AS (
          SELECT c.vec_id, list_sum(list(l.d ORDER BY l.m)) AS adc_dist
          FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.code
          GROUP BY c.vec_id),
        short AS (
          SELECT vec_id FROM adc WHERE vec_id <> 0
          ORDER BY adc_dist ASC, vec_id ASC
          LIMIT 50),
        q2 AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label, {_cos('e.embedding', 'q2.q')} AS cos_sim
        FROM embeddings e JOIN short USING (vec_id) CROSS JOIN q2
        ORDER BY cos_sim DESC, e.vec_id ASC
        LIMIT 10
    """,
})

# FAISS IndexIVFPQ composition: coarse probe -> ADC over probed codes
# -> exact refine of the shortlist
ORACLES.update({
    "knn_ivf_pq": f"""
        WITH {_PQ_BOOK},
        {_PQ_CODES},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        q2 AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        cent AS (SELECT vec_id AS centroid_id, embedding AS cvec
                 FROM embeddings WHERE vec_id < 8),
        probe AS (
          SELECT centroid_id FROM cent, q2
          ORDER BY {_cos('cvec', 'q')} DESC, centroid_id ASC
          LIMIT 2),
        assigned AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent c)
          WHERE rn = 1),
        cand AS (
          SELECT a.vec_id FROM assigned a JOIN probe USING (centroid_id)
          WHERE a.vec_id <> 0),
        lut AS (
          SELECT b.m, b.code,
                 {_PQ_D2.format(a='q.qv', m='b.m', cv='b.cv')} AS d
          FROM book b CROSS JOIN q),
        adc AS (
          SELECT c.vec_id, list_sum(list(l.d ORDER BY l.m)) AS adc_dist
          FROM codes c JOIN cand USING (vec_id)
          JOIN lut l ON c.m = l.m AND c.code = l.code
          GROUP BY c.vec_id),
        short AS (
          SELECT vec_id FROM adc
          ORDER BY adc_dist ASC, vec_id ASC
          LIMIT 50)
        SELECT e.vec_id, e.label, {_cos('e.embedding', 'q2.q')} AS cos_sim
        FROM embeddings e JOIN short USING (vec_id) CROSS JOIN q2
        ORDER BY cos_sim DESC, e.vec_id ASC
        LIMIT 10
    """,
})

# trained PQ: all subspaces k-means-trained relationally; canonical
# list_sum folds mirror the Spark two-level block means bit-for-bit
_PQT_D2 = ("list_sum(list_transform(range(1, 9), i -> "
           "(s.sub[CAST(i AS INT)] - b.cv[CAST(i AS INT)]) "
           "* (s.sub[CAST(i AS INT)] - b.cv[CAST(i AS INT)])))")


def _pqt_assign(name: str, book: str) -> str:
    return f"""{name} AS (
          SELECT vec_id, m, sub, code FROM (
            SELECT s.vec_id, s.m, s.sub, b.code,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                     ORDER BY {_PQT_D2} ASC, b.code ASC) AS rn
            FROM sub s JOIN {book} b ON s.m = b.m) WHERE rn = 1)"""


def _pqt_blocks(name: str, assign: str) -> str:
    return f"""{name} AS (
          SELECT m, code, CAST(i - 1 AS INT) AS dim, vec_id,
                 vec_id // 256 AS blk, sub[CAST(i AS INT)] AS x
          FROM {assign}, (SELECT unnest(range(1, 9)) AS i)),
        {name}b AS (
          SELECT m, code, dim, blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb
          FROM {name} GROUP BY m, code, dim, blk)"""


_PQT_CTES = f"""js AS (SELECT unnest(range(0, 8)) AS jm),
        sub AS (
          SELECT e.vec_id, CAST(js.jm AS INT) AS m,
                 list_transform(range(1, 9), i ->
                   CAST(e.embedding[CAST(js.jm * 8 + i AS INT)] AS DOUBLE))
                   AS sub
          FROM embeddings e, js),
        book0 AS (
          SELECT m, vec_id AS code, sub AS cv FROM sub WHERE vec_id < 16),
        {_pqt_assign('a1', 'book0')},
        {_pqt_blocks('e1', 'a1')},
        m1 AS (
          SELECT m, code, dim,
                 list_sum(list(bsum ORDER BY blk))
                   / CAST(SUM(nb) AS BIGINT) AS c
          FROM e1b GROUP BY m, code, dim),
        book1 AS (
          SELECT m, code, list(c ORDER BY dim) AS cv
          FROM m1 GROUP BY m, code),
        {_pqt_assign('a2', 'book1')},
        {_pqt_blocks('e2', 'a2')}"""

ORACLES.update({
    "pq_codebook_trained": f"""
        WITH {_PQT_CTES}
        SELECT m, code, dim,
               list_sum(list(bsum ORDER BY blk))
                 / CAST(SUM(nb) AS BIGINT) AS centroid,
               CAST(SUM(nb) AS BIGINT) AS n
        FROM e2b GROUP BY m, code, dim
    """,
    "pq_codes_trained": f"""
        WITH {_PQT_CTES},
        m2 AS (
          SELECT m, code, dim,
                 list_sum(list(bsum ORDER BY blk))
                   / CAST(SUM(nb) AS BIGINT) AS c
          FROM e2b GROUP BY m, code, dim),
        book2 AS (
          SELECT m, code, list(c ORDER BY dim) AS cv
          FROM m2 GROUP BY m, code),
        {_pqt_assign('a3', 'book2')}
        SELECT vec_id, m, code FROM a3
    """,
})

# residual quantization: two argmin stages + in-row residual; same
# left-fold L2 arithmetic as the Spark plan
_RQ_D2 = ("list_sum(list_transform(range(1, 65), i -> "
          "({a}[CAST(i AS INT)] - {b}[CAST(i AS INT)]) "
          "* ({a}[CAST(i AS INT)] - {b}[CAST(i AS INT)])))")

ORACLES.update({
    "rq_codes": f"""
        WITH v AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        c1 AS (SELECT vec_id AS code, v AS cv FROM v WHERE vec_id < 16),
        a1 AS (
          SELECT vec_id, v, code AS c1, cv FROM (
            SELECT s.vec_id, s.v, c.code, c.cv,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id
                     ORDER BY {_RQ_D2.format(a='s.v', b='c.cv')} ASC,
                              c.code ASC) AS rn
            FROM v s CROSS JOIN c1 c) WHERE rn = 1),
        res AS (
          SELECT vec_id, c1,
                 list_transform(range(1, 65), i ->
                   v[CAST(i AS INT)] - cv[CAST(i AS INT)]) AS r
          FROM a1),
        c2 AS (
          SELECT CAST(vec_id - 15 AS BIGINT) AS code, r AS cv FROM res
          WHERE vec_id >= 16 AND vec_id < 31
          UNION ALL
          SELECT CAST(0 AS BIGINT) AS code,
                 list_transform(range(1, 65), i -> CAST(0 AS DOUBLE))
                   AS cv
          FROM res WHERE vec_id = 0),
        a2 AS (
          SELECT vec_id, c1, code AS c2, d2 AS err FROM (
            SELECT s.vec_id, s.c1, c.code,
                   {_RQ_D2.format(a='s.r', b='c.cv')} AS d2,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id
                     ORDER BY {_RQ_D2.format(a='s.r', b='c.cv')} ASC,
                              c.code ASC) AS rn
            FROM res s CROSS JOIN c2 c) WHERE rn = 1)
        SELECT vec_id, c1, c2, err FROM a2
    """,
})

# RFM segmentation: fences from rounded exact percentiles (the
# percentile_order_value convention), scores re-derived with the same
# expression tree
ORACLES.update({
    "rfm_segments": f"""
        WITH per AS (
          SELECT o_custkey AS c_custkey,
                 MAX(o_orderdate) AS last_order,
                 COUNT(*) AS frequency,
                 {DSUM('o_totalprice')} AS monetary
          FROM orders GROUP BY o_custkey),
        ref AS (SELECT MAX(last_order) AS maxd FROM per),
        p2 AS (
          SELECT per.*, date_diff('day', CAST(last_order AS DATE),
                                  CAST(maxd AS DATE)) AS recency_days
          FROM per, ref),
        fences AS (
          SELECT
            round(quantile_cont(recency_days, 0.2), 6) AS r20,
            round(quantile_cont(recency_days, 0.4), 6) AS r40,
            round(quantile_cont(recency_days, 0.6), 6) AS r60,
            round(quantile_cont(recency_days, 0.8), 6) AS r80,
            round(quantile_cont(frequency, 0.2), 6) AS f20,
            round(quantile_cont(frequency, 0.4), 6) AS f40,
            round(quantile_cont(frequency, 0.6), 6) AS f60,
            round(quantile_cont(frequency, 0.8), 6) AS f80,
            round(quantile_cont(monetary, 0.2), 6) AS m20,
            round(quantile_cont(monetary, 0.4), 6) AS m40,
            round(quantile_cont(monetary, 0.6), 6) AS m60,
            round(quantile_cont(monetary, 0.8), 6) AS m80
          FROM p2),
        scored AS (
          SELECT c_custkey, CAST(recency_days AS INT) AS recency_days,
                 frequency, monetary,
                 CAST(6 - (1 + CAST(recency_days > r20 AS INT)
                             + CAST(recency_days > r40 AS INT)
                             + CAST(recency_days > r60 AS INT)
                             + CAST(recency_days > r80 AS INT)) AS INT)
                   AS r,
                 CAST(1 + CAST(frequency > f20 AS INT)
                        + CAST(frequency > f40 AS INT)
                        + CAST(frequency > f60 AS INT)
                        + CAST(frequency > f80 AS INT) AS INT) AS f,
                 CAST(1 + CAST(monetary > m20 AS INT)
                        + CAST(monetary > m40 AS INT)
                        + CAST(monetary > m60 AS INT)
                        + CAST(monetary > m80 AS INT) AS INT) AS m
          FROM p2, fences)
        SELECT c_custkey, recency_days, frequency, monetary, r, f, m,
               CAST(r * 100 + f * 10 + m AS INT) AS rfm
        FROM scored
    """,
})

ORACLES.update({
    "monthly_revenue_growth": f"""
        WITH monthly AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 {DSUM('o_totalprice')} AS revenue,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY 1)
        SELECT month, revenue, n_orders,
               LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
               (revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month) AS growth
        FROM monthly
    """,
})

ORACLES.update({
    "knn_filtered": f"""
        WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label, {_cos('embedding', 'q')} AS cos_sim
        FROM embeddings, q
        WHERE vec_id <> 0 AND label = 1
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """,
    "window_rank_report": """
        SELECT c_nationkey, c_custkey, c_acctbal,
               CAST(RANK() OVER w AS INT) AS rnk,
               CAST(DENSE_RANK() OVER w AS INT) AS drnk,
               PERCENT_RANK() OVER w AS prnk,
               CUME_DIST() OVER w AS cume,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               NTH_VALUE(c_acctbal, 2) OVER (
                 PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS second_balance
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
})

ORACLES.update({
    # Spark day_of_week is 1=Sunday; DuckDB dayofweek is 0=Sunday
    "date_dim": """
        WITH span AS (
          SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                 CAST(MAX(o_orderdate) AS DATE) AS hi
          FROM orders),
        days AS (
          SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                             CAST(hi AS TIMESTAMP),
                                             INTERVAL 1 DAY)) AS DATE)
                   AS d
          FROM span)
        SELECT strftime(d, '%Y-%m-%d') AS day,
               CAST(year(d) AS INT) AS year,
               CAST(quarter(d) AS INT) AS quarter,
               CAST(month(d) AS INT) AS month,
               CAST(day(d) AS INT) AS day_of_month,
               CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
               CAST(dayofweek(d) IN (0, 6) AS INT) AS is_weekend
        FROM days
    """,
    "event_value_zscores": """
        WITH ev AS (
          SELECT event_id, event_type, value,
                 CAST(value AS DECIMAL(18,4)) AS x
          FROM events),
        m AS (
          SELECT event_type, COUNT(*) AS n,
                 CAST(CAST(SUM(x) AS DECIMAL(38,6)) AS DOUBLE) AS sx,
                 CAST(CAST(SUM(x * x) AS DECIMAL(38,6)) AS DOUBLE) AS sxx
          FROM ev GROUP BY event_type),
        stats AS (
          SELECT event_type,
                 sx / CAST(n AS DOUBLE) AS mean_value,
                 sqrt(sxx / CAST(n AS DOUBLE)
                      - (sx / CAST(n AS DOUBLE))
                        * (sx / CAST(n AS DOUBLE))) AS std_value
          FROM m)
        SELECT e.event_id, e.event_type, e.value,
               (e.value - s.mean_value) / s.std_value AS zscore
        FROM ev e JOIN stats s USING (event_type)
        WHERE abs((e.value - s.mean_value) / s.std_value) > 3.0
    """,
})

ORACLES.update({
    # forward as-of: earliest strictly-later purchase per click
    "asof_time_to_purchase": """
        WITH ev AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
          FROM events),
        c AS (SELECT event_id, user_id, ts_us FROM ev
              WHERE event_type = 'click'),
        p AS (SELECT user_id, ts_us AS pts FROM ev
              WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id, c.ts_us,
               (SELECT MIN(pts) FROM p
                WHERE p.user_id = c.user_id AND p.pts > c.ts_us)
                 AS next_purchase_ts_us,
               (SELECT MIN(pts) FROM p
                WHERE p.user_id = c.user_id AND p.pts > c.ts_us) - c.ts_us
                 AS gap_us
        FROM c
    """,
})

# absolute shingle-overlap pairs + containment; the oracle runs the
# naive shared-shingle join (exact at gate scale)
ORACLES.update({
    "shingle_overlap_pairs": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        sets AS (
          SELECT doc_id,
                 list_distinct(list_transform({SHINGLES},
                   s -> CAST(list_sum(list_transform(range(1, 16),
                          j -> (strpos('0123456789abcdef',
                                       substr(md5(s), CAST(j AS INT), 1))
                                - 1)
                               * (CAST(1 AS BIGINT)
                                  << CAST(4 * (15 - j) AS INT))))
                        AS BIGINT))) AS sh
          FROM d WHERE len(toks) >= 3),
        sh AS (SELECT doc_id, unnest(sh) AS shingle FROM sets),
        sizes AS (SELECT doc_id, len(sh) AS n FROM sets),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(COUNT(*) AS BIGINT) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle
                            AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
          HAVING COUNT(*) >= 8)
        SELECT p.doc_a, p.doc_b, p.n_common,
               p.n_common / sa.n AS containment_a,
               p.n_common / sb.n AS containment_b
        FROM pairs p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
    """,
})

ORACLES.update({
    # nearest-in-time asof: smaller absolute gap wins, ties backward
    "asof_nearest_click": """
        WITH ev AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
          FROM events),
        p AS (SELECT event_id, user_id, ts_us FROM ev
              WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts_us FROM ev WHERE event_type = 'click'),
        g AS (
          SELECT p.event_id, p.user_id, p.ts_us,
                 (SELECT MAX(ts_us) FROM c
                  WHERE c.user_id = p.user_id AND c.ts_us < p.ts_us)
                   AS back,
                 (SELECT MIN(ts_us) FROM c
                  WHERE c.user_id = p.user_id AND c.ts_us > p.ts_us)
                   AS fwd
          FROM p)
        SELECT event_id, user_id, ts_us,
               CASE WHEN back IS NOT NULL
                     AND (fwd IS NULL OR ts_us - back <= fwd - ts_us)
                    THEN back ELSE fwd END AS nearest_click_ts_us,
               CASE WHEN back IS NOT NULL
                     AND (fwd IS NULL OR ts_us - back <= fwd - ts_us)
                    THEN ts_us - back
                    WHEN fwd IS NOT NULL THEN fwd - ts_us
               END AS abs_gap_us
        FROM g
    """,
})

ORACLES.update({
    "langid_confusion": f"""
        WITH pred AS ({ORACLES['doc_langid']}),
        cells AS (
          SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
          FROM pred GROUP BY lang, pred_lang)
        SELECT lang, pred_lang, n,
               CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)
                 AS n_actual,
               n / SUM(n) OVER (PARTITION BY lang) AS frac,
               CAST(lang = pred_lang AS INT) AS is_correct
        FROM cells
    """,
})

# partitioned-sketch union: exact distinct bit-checked; each engine's
# own sketch must sit in the 5% envelope (approx_distinct_events
# convention — sketch bytes are not cross-engine portable)
ORACLES.update({
    "hll_partitioned_union": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               CAST(abs(approx_count_distinct(user_id)
                        - COUNT(DISTINCT user_id))
                    <= 0.05 * COUNT(DISTINCT user_id) AS INT) AS ok_est
        FROM events GROUP BY event_type
    """,
})

ORACLES.update({
    "supplier_scorecard": f"""
        WITH j AS (
          SELECT l.l_suppkey, {DISC_PRICE} AS dp,
                 CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)) <= 30
                      THEN 1 ELSE 0 END AS on_time,
                 CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        per AS (
          SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
                 CAST(CAST(SUM(dp) AS DECIMAL(38,6)) AS DOUBLE)
                   AS revenue,
                 SUM(on_time) AS n_on_time, SUM(ret) AS n_returned
          FROM j GROUP BY l_suppkey)
        SELECT s.s_suppkey AS suppkey, s.s_name, p.n_lines, p.revenue,
               p.n_on_time / CAST(p.n_lines AS DOUBLE) AS on_time_rate,
               p.n_returned / CAST(p.n_lines AS DOUBLE) AS return_rate
        FROM per p JOIN supplier s ON p.l_suppkey = s.s_suppkey
    """,
})

ORACLES.update({
    "demand_yoy_by_type": f"""
        WITH m AS (
          SELECT p.p_type, strftime(l.l_shipdate, '%Y-%m') AS month,
                 {DSUM('l_quantity')} AS qty
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_type, strftime(l.l_shipdate, '%Y-%m'))
        SELECT p_type, month, qty,
               LAG(qty, 12) OVER w AS qty_last_year,
               (qty - LAG(qty, 12) OVER w) / LAG(qty, 12) OVER w AS yoy
        FROM m
        WINDOW w AS (PARTITION BY p_type ORDER BY month)
    """,
})

ORACLES.update({
    "grouping_sets_report": f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               {DSUM('o_totalprice')} AS total_value
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
    """,
    "supplier_lead_time_gaps": """
        WITH g AS (
          SELECT l_suppkey,
                 date_diff('day', LAG(l_shipdate) OVER w, l_shipdate)
                   AS gap_days
          FROM lineitem
          WINDOW w AS (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber)),
        per AS (
          SELECT l_suppkey, COUNT(*) AS n_shipments,
                 CAST(SUM(gap_days) AS BIGINT) AS sum_gap,
                 COUNT(gap_days) AS n_gaps,
                 CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
          FROM g GROUP BY l_suppkey)
        SELECT p.l_suppkey AS suppkey, s.s_name, p.n_shipments,
               CAST(p.sum_gap AS DOUBLE) / p.n_gaps AS avg_gap_days,
               p.max_gap_days
        FROM per p JOIN supplier s ON p.l_suppkey = s.s_suppkey
    """,
    "doc_simpson_diversity": f"""
        WITH tok AS (
          SELECT doc_id, unnest({TOKS}) AS tk FROM documents),
        cnt AS (
          SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY doc_id, tk),
        agg AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(SUM(c * c) AS BIGINT) AS simpson_num
          FROM cnt GROUP BY doc_id)
        SELECT doc_id, n_tokens, simpson_num,
               CAST(n_tokens * n_tokens AS DOUBLE)
                 / CAST(simpson_num AS DOUBLE) AS inv_simpson
        FROM agg
    """,
    # the permutation is derived from engine-exact per-dim variances
    # (two-level ordered fold, same plan as label_centroids), so rank,
    # snake assignment, permuted codebook and argmin codes all match
    # the Spark operator bit-for-bit
    "pq_balanced_perm": """
        WITH e AS (
          SELECT vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        blk AS (
          SELECT dim, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 list_sum(list(x * x ORDER BY vec_id)) AS bsq,
                 COUNT(*) AS nb
          FROM e GROUP BY dim, blk),
        vstat AS (
          SELECT dim,
                 list_sum(list(bsum ORDER BY blk)) AS s,
                 list_sum(list(bsq ORDER BY blk)) AS sq,
                 CAST(SUM(nb) AS BIGINT) AS n
          FROM blk GROUP BY dim),
        ranked AS (
          SELECT dim,
                 ROW_NUMBER() OVER (
                   ORDER BY sq / n - (s / n) * (s / n) DESC, dim ASC
                 ) - 1 AS r
          FROM vstat),
        assign AS (
          SELECT dim,
                 CASE WHEN (r % 16) < 8 THEN r % 8
                      ELSE 7 - (r % 8) END AS m,
                 r // 8 AS pos
          FROM ranked),
        pe AS (
          SELECT e.vec_id, a.m, a.pos, e.x
          FROM e JOIN assign a USING (dim)),
        book AS (
          SELECT vec_id AS code, m, list(x ORDER BY pos) AS cv
          FROM pe WHERE vec_id < 16 GROUP BY vec_id, m),
        sv AS (
          SELECT vec_id, m, list(x ORDER BY pos) AS v
          FROM pe GROUP BY vec_id, m),
        scored AS (
          SELECT sv.vec_id, sv.m, b.code,
                 list_sum(list_transform(range(1, 9), i ->
                   (sv.v[CAST(i AS INT)] - b.cv[CAST(i AS INT)])
                   * (sv.v[CAST(i AS INT)] - b.cv[CAST(i AS INT)])))
                   AS d
          FROM sv JOIN book b ON sv.m = b.m),
        codes AS (
          SELECT vec_id, m, code,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                    ORDER BY d ASC, code ASC) AS rn
          FROM scored)
        SELECT vec_id, CAST(m AS INT) AS m, CAST(code AS BIGINT) AS code
        FROM codes WHERE rn = 1
    """,
})


def _cos_pfx(a: str, b: str, d: int) -> str:
    """Prefix-d cosine: the _cos fold truncated to the first d dims
    (same left-to-right order, so prefix scores are bit-identical to
    the Spark slice+fold)."""
    dq = (f"list_sum(list_transform(range(1, {d + 1}), "
          f"i -> CAST({{a}}[i] AS DOUBLE) * CAST({{b}}[i] AS DOUBLE)))")
    return (f"({dq.format(a=a, b=b)} / "
            f"(sqrt({dq.format(a=a, b=a)}) * sqrt({dq.format(a=b, b=b)})))")


def _mrl_block(d: int) -> str:
    return f"""
        SELECT {d} AS prefix_dim, 10 AS k,
               CAST(COUNT(*) AS INT) AS n_hits,
               COUNT(*) / 10 AS recall_at_k
        FROM mrl_exact e
        JOIN (
          SELECT vec_id FROM embeddings, mrl_q
          WHERE vec_id <> 0
          ORDER BY {_cos_pfx('embedding', 'q', d)} DESC, vec_id ASC
          LIMIT 10
        ) a USING (vec_id)"""


ORACLES.update({
    "matryoshka_prefix_eval": f"""
        WITH mrl_q AS (
          SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        mrl_exact AS (
          SELECT vec_id FROM embeddings, mrl_q
          WHERE vec_id <> 0
          ORDER BY {_cos('embedding', 'q')} DESC, vec_id ASC
          LIMIT 10)
        {_mrl_block(8)}
        UNION ALL {_mrl_block(16)}
        UNION ALL {_mrl_block(32)}
    """,
    "semantic_dup_lang_matrix": f"""
        WITH {_PAIR_CTE},
        spairs AS (
          SELECT vec_a, vec_b FROM cand
          JOIN norm a ON vec_a = a.vec_id
          JOIN norm b ON vec_b = b.vec_id
          WHERE {_PAIR_DOT} >= 0.3)
        SELECT LEAST(la.lang, lb.lang) AS lang_lo,
               GREATEST(la.lang, lb.lang) AS lang_hi,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM spairs p
        JOIN documents la ON p.vec_a = la.doc_id
        JOIN documents lb ON p.vec_b = lb.doc_id
        GROUP BY LEAST(la.lang, lb.lang), GREATEST(la.lang, lb.lang)
    """,
    "join_key_skew_audit": """
        WITH c AS (
          SELECT l_partkey, COUNT(*) AS cnt
          FROM lineitem GROUP BY l_partkey),
        tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                 COUNT(*) AS n_keys FROM c),
        ranked AS (
          SELECT l_partkey, cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, l_partkey ASC)
                   AS rank
          FROM c)
        SELECT r.rank, r.l_partkey AS key, r.cnt,
               r.cnt / t.total AS share, t.total, t.n_keys
        FROM ranked r, tot t
        WHERE r.rank <= 20
    """,
})

ORACLES.update({
    "orders_backlog_aging": f"""
        WITH anchor AS (
          SELECT MAX(o_orderdate) AS asof_date FROM orders),
        b AS (
          SELECT o_orderpriority,
                 CASE WHEN date_diff('day', o_orderdate, asof_date)
                        BETWEEN 0 AND 30 THEN '0-30d'
                      WHEN date_diff('day', o_orderdate, asof_date)
                        BETWEEN 31 AND 90 THEN '31-90d'
                      WHEN date_diff('day', o_orderdate, asof_date)
                        BETWEEN 91 AND 365 THEN '91-365d'
                      ELSE '365d+' END AS age_bucket,
                 o_totalprice
          FROM orders, anchor
          WHERE o_orderstatus = 'O')
        SELECT o_orderpriority, age_bucket,
               COUNT(*) AS n_orders,
               {DSUM('o_totalprice')} AS backlog_value
        FROM b GROUP BY o_orderpriority, age_bucket
    """,
    "return_rate_by_brand": f"""
        SELECT p.p_brand,
               COUNT(*) AS n_lines,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returned,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT)
                 / COUNT(*) AS return_rate,
               CAST(CAST(SUM(CASE WHEN l_returnflag = 'R'
                                  THEN {DISC_PRICE} END)
                    AS DECIMAL(38,6)) AS DOUBLE) AS returned_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
})

ORACLES.update({
    # single-window prefix (the oracle's luxury); the Spark plan's
    # bucket-decomposed prefix equals it bit-for-bit because every
    # cumulation is decimal
    "abc_classification": f"""
        WITH rev AS (
          SELECT l_partkey AS partkey,
                 CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6)) AS rev
          FROM lineitem GROUP BY l_partkey),
        tot AS (
          SELECT CAST(SUM(rev) AS DECIMAL(38,6)) AS total FROM rev),
        cum AS (
          SELECT partkey, rev,
                 CAST(SUM(rev) OVER (
                   ORDER BY rev DESC, partkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(38,6)) AS cum
          FROM rev)
        SELECT c.partkey,
               CAST(c.rev AS DOUBLE) AS revenue,
               CAST(c.cum AS DOUBLE) AS cum_revenue,
               CAST(c.cum AS DOUBLE) / CAST(t.total AS DOUBLE)
                 AS share_cum,
               CASE WHEN c.cum * 100 <= t.total * 80 THEN 'A'
                    WHEN c.cum * 100 <= t.total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum c, tot t
    """,
})

ORACLES.update({
    "minhash_pair_precision": f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        cpairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        dsh AS (
          SELECT doc_id, list_distinct({SHINGLES}) AS sh
          FROM (SELECT doc_id, {TOKS} AS toks FROM documents)),
        flags AS (
          SELECT CASE WHEN 2 * len(list_intersect(x.sh, y.sh))
                        >= len(x.sh) + len(y.sh)
                           - len(list_intersect(x.sh, y.sh))
                      THEN 1 ELSE 0 END AS tp
          FROM cpairs p
          JOIN dsh x ON p.doc_a = x.doc_id
          JOIN dsh y ON p.doc_b = y.doc_id)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(tp) AS BIGINT) AS n_true,
               SUM(tp) / COUNT(*) AS precision
        FROM flags
    """,
})

ORACLES.update({
    # single-window ECDF (the oracle's luxury); the Spark plan's
    # bucket-decomposed prefix equals it exactly because fa/fb/na/nb
    # are integers and the KS numerator is computed in wide exact
    # integers (HUGEINT here, DECIMAL(38,0) in Spark)
    "ks_drift_value": """
        WITH pts AS (
          SELECT value,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS ca,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS cb
          FROM events
          WHERE event_type IN ('click', 'purchase')
            AND value IS NOT NULL
          GROUP BY value),
        cum AS (
          SELECT value,
                 SUM(ca) OVER (ORDER BY value) AS fa,
                 SUM(cb) OVER (ORDER BY value) AS fb
          FROM pts),
        tot AS (
          SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb
          FROM pts),
        d AS (
          SELECT value, na, nb,
                 ABS(CAST(fa AS HUGEINT) * nb
                     - CAST(fb AS HUGEINT) * na) AS dnum
          FROM cum, tot),
        -- one aggregate: lexicographic struct max = largest gap with
        -- smallest value as the deterministic tie-break
        best AS (
          SELECT na, nb,
                 MAX(struct_pack(dn := dnum, nv := -value)) AS m
          FROM d GROUP BY na, nb)
        SELECT na, nb,
               -(m.nv) AS at_value,
               CAST(m.dn AS DOUBLE) AS d_num,
               CAST(m.dn AS DOUBLE)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_stat
        FROM best
    """,
    # per-cell contingency stats: each double is one deterministic
    # expression (no cross-engine sum-of-doubles ordering hazard)
    "chi2_event_segments": """
        WITH obs AS (
          -- ((x % 3) + 3) % 3 = Spark's pmod: non-negative for any
          -- sign of user_id (DuckDB % takes the dividend's sign)
          SELECT event_type,
                 CAST(((user_id % 3) + 3) % 3 AS INTEGER) AS segment,
                 COUNT(*) AS n_obs
          FROM events
          GROUP BY event_type,
                   CAST(((user_id % 3) + 3) % 3 AS INTEGER)),
        cells AS (
          SELECT event_type, segment, CAST(n_obs AS BIGINT) AS n_obs,
                 SUM(n_obs) OVER (PARTITION BY event_type) AS row_tot,
                 SUM(n_obs) OVER (PARTITION BY segment) AS col_tot,
                 SUM(n_obs) OVER () AS grand
          FROM obs)
        SELECT event_type, segment, n_obs,
               CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                 / CAST(grand AS DOUBLE) AS n_exp,
               POW(CAST(n_obs AS DOUBLE)
                   - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                     / CAST(grand AS DOUBLE), 2)
                 / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                    / CAST(grand AS DOUBLE)) AS chi2_cell
        FROM cells
    """,
})

def _bpe_vocab_sql(k: int = 32) -> str:
    """Unrolled k-step BPE training twin: each step re-counts adjacent
    symbol pairs over the separator-framed vocabulary, picks the
    deterministic top pair, and applies it with the same scan-left
    non-overlapping replace() Spark uses. CTEs are MATERIALIZED —
    every v_i is referenced twice (next pair count + next rewrite),
    and inlining would double the plan per step."""
    sep = "chr(31)"
    s = f"""
        WITH words AS MATERIALIZED (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
          FROM (SELECT unnest({TOKS}) AS w FROM documents)
          GROUP BY w),
        v0 AS MATERIALIZED (
          SELECT w, wc,
                 regexp_replace(w, '(.)', {sep} || '\\1' || {sep}, 'g')
                   AS rep
          FROM words)"""
    for i in range(1, k + 1):
        s += f""",
        p{i} AS MATERIALIZED (
          SELECT s.syms[u.i] AS s1, s.syms[u.i + 1] AS s2,
                 CAST(SUM(s.wc) AS BIGINT) AS cnt
          FROM (SELECT string_split(trim(rep, {sep}),
                                    {sep} || {sep}) AS syms, wc
                FROM v{i - 1}) s,
               unnest(generate_series(1, len(s.syms) - 1)) AS u(i)
          GROUP BY s1, s2
          ORDER BY cnt DESC, s1 ASC, s2 ASC
          LIMIT 1),
        v{i} AS MATERIALIZED (
          SELECT w, wc, replace(rep,
                   {sep} || p.s1 || {sep} || {sep} || p.s2 || {sep},
                   {sep} || p.s1 || p.s2 || {sep}) AS rep
          FROM v{i - 1}, p{i} AS p)"""
    union = "\n          UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS step, s1, s2, cnt FROM p{i}"
        for i in range(1, k + 1))
    return s + f"\n        {union}\n    "


def _bpe_apply_sql(k: int = 32) -> str:
    """Trained-tokenizer application twin: the same unrolled k-step
    chain, then word → symbol-count lookup joined to the exploded
    corpus words."""
    sep = "chr(31)"
    chain = _bpe_vocab_sql(k)
    chain = chain[:chain.rindex("SELECT CAST(1 AS INTEGER)")
                  - len("\n        ")]
    return f"""{chain},
        wsym AS (
          SELECT w, len(string_split(trim(rep, {sep}),
                                     {sep} || {sep})) AS n_sym
          FROM v{k}),
        docw AS (
          SELECT doc_id, unnest({TOKS}) AS w FROM documents)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
               CAST(SUM(n_sym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS symbols_per_word
        FROM docw JOIN wsym USING (w)
        GROUP BY doc_id
    """


ORACLES.update({
    "bpe_vocab_32": _bpe_vocab_sql(32),
    "bpe_apply_doc_tokens": _bpe_apply_sql(32),
    # pairs from the DISTINCT-WORD dictionary, weighted by word
    # frequency — mirrors the Spark vocabulary-collapse formulation
    "bpe_merge_pairs": f"""
        WITH words AS (
          SELECT w, COUNT(*) AS wc
          FROM (SELECT unnest({TOKS}) AS w FROM documents)
          GROUP BY w),
        pairs AS (
          SELECT unnest(list_transform(
                   generate_series(1, length(w) - 1),
                   i -> w[i : i + 1])) AS pair,
                 wc
          FROM words
          WHERE length(w) >= 2)
        SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt
        FROM pairs
        GROUP BY pair
        ORDER BY cnt DESC, pair ASC
        LIMIT 50
    """,
    "doc_chunks": f"""
        WITH d AS (
          SELECT doc_id, toks, len(toks) AS n
          FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
          WHERE len(toks) > 0),
        starts AS (
          SELECT doc_id, toks,
                 unnest(generate_series(0, n - 1, 48)) AS start
          FROM d)
        SELECT doc_id,
               CAST(start // 48 AS BIGINT) AS chunk_id,
               CAST(start AS BIGINT) AS start,
               CAST(len(toks[start + 1 : start + 64]) AS INTEGER)
                 AS n_chunk_tokens,
               md5(array_to_string(toks[start + 1 : start + 64], ' '))
                 AS chunk_hash
        FROM starts
    """,
})

ORACLES.update({
    "dup_span_stats": f"""
        WITH d AS (
          SELECT doc_id, toks, len(toks) AS n
          FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
          WHERE len(toks) >= 16),
        pos AS (
          SELECT doc_id, toks, n,
                 unnest(generate_series(1, n - 15)) AS p
          FROM d),
        wh AS (
          SELECT doc_id, n, p,
                 md5(array_to_string(toks[p : p + 15], ' ')) AS h
          FROM pos),
        dup AS (
          SELECT doc_id, n, p
          FROM (SELECT doc_id, n, p,
                       COUNT(*) OVER (PARTITION BY h) AS c
                FROM wh)
          WHERE c >= 2),
        isl AS (
          SELECT doc_id, n, p,
                 CASE WHEN p > COALESCE(MAX(p) OVER (
                          PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), -16) + 16
                      THEN 1 ELSE 0 END AS ni
          FROM dup),
        isl2 AS (
          SELECT doc_id, n, p, SUM(ni) OVER (
                   PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS island
          FROM isl),
        spans AS (
          SELECT doc_id, n, island,
                 MIN(p) AS mn, MAX(p) AS mx, COUNT(*) AS nw
          FROM isl2 GROUP BY doc_id, n, island)
        SELECT doc_id,
               CAST(n AS INTEGER) AS n_tokens,
               CAST(SUM(mx + 16 - mn) AS BIGINT) AS n_dup_tokens,
               CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(mx + 16 - mn) AS DOUBLE) / CAST(n AS DOUBLE)
                 AS dup_fraction
        FROM spans
        GROUP BY doc_id, n
    """,
})


ORACLES.update({
    # baseline-decile PSI; fences by integer rank arithmetic (no float
    # percentile interpolation), per-bucket doubles each a single
    # deterministic expression
    "psi_value_drift": """
        WITH pts AS (
          SELECT value,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS ca,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS cb
          FROM events
          WHERE event_type IN ('click', 'purchase')
            AND value IS NOT NULL
          GROUP BY value),
        cum AS (
          SELECT value, ca, cb,
                 SUM(ca) OVER (ORDER BY value) AS fa
          FROM pts),
        tot AS (
          SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb
          FROM pts),
        fen AS (
          SELECT
          MIN(CASE WHEN fa >= (1 * na + 9) // 10 THEN value END) AS f1,
          MIN(CASE WHEN fa >= (2 * na + 9) // 10 THEN value END) AS f2,
          MIN(CASE WHEN fa >= (3 * na + 9) // 10 THEN value END) AS f3,
          MIN(CASE WHEN fa >= (4 * na + 9) // 10 THEN value END) AS f4,
          MIN(CASE WHEN fa >= (5 * na + 9) // 10 THEN value END) AS f5,
          MIN(CASE WHEN fa >= (6 * na + 9) // 10 THEN value END) AS f6,
          MIN(CASE WHEN fa >= (7 * na + 9) // 10 THEN value END) AS f7,
          MIN(CASE WHEN fa >= (8 * na + 9) // 10 THEN value END) AS f8,
          MIN(CASE WHEN fa >= (9 * na + 9) // 10 THEN value END) AS f9
          FROM cum, tot),
        b AS (
          SELECT value, ca, cb,
                 (CASE WHEN value > f1 THEN 1 ELSE 0 END)
               + (CASE WHEN value > f2 THEN 1 ELSE 0 END)
               + (CASE WHEN value > f3 THEN 1 ELSE 0 END)
               + (CASE WHEN value > f4 THEN 1 ELSE 0 END)
               + (CASE WHEN value > f5 THEN 1 ELSE 0 END)
               + (CASE WHEN value > f6 THEN 1 ELSE 0 END)
               + (CASE WHEN value > f7 THEN 1 ELSE 0 END)
               + (CASE WHEN value > f8 THEN 1 ELSE 0 END)
               + (CASE WHEN value > f9 THEN 1 ELSE 0 END) AS bucket
          FROM pts, fen),
        agg AS (
          SELECT bucket,
                 CAST(SUM(ca) AS BIGINT) AS n_base,
                 CAST(SUM(cb) AS BIGINT) AS n_cur
          FROM b GROUP BY bucket)
        SELECT bucket, n_base, n_cur,
               CAST(n_base AS DOUBLE) / CAST(na AS DOUBLE) AS p_base,
               CAST(n_cur AS DOUBLE) / CAST(nb AS DOUBLE) AS p_cur,
               CASE WHEN n_base > 0 AND n_cur > 0 THEN
                 floor((CAST(n_base AS DOUBLE) / CAST(na AS DOUBLE)
                        - CAST(n_cur AS DOUBLE) / CAST(nb AS DOUBLE))
                       * ln((CAST(n_base AS DOUBLE) / CAST(na AS DOUBLE))
                            / (CAST(n_cur AS DOUBLE) / CAST(nb AS DOUBLE)))
                       * 1e9 + 0.5) / 1e9
               END AS psi_term
        FROM agg, tot
    """,
})

ORACLES.update({
    "doc_novelty_rate": f"""
        WITH pairs AS (
          SELECT doc_id, md5(sh) AS h
          FROM (SELECT doc_id,
                       unnest(list_distinct({SHINGLES})) AS sh
                FROM (SELECT doc_id, {TOKS} AS toks FROM documents))),
        flagged AS (
          SELECT doc_id,
                 CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY h)
                      THEN 1 ELSE 0 END AS novel
          FROM pairs)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(novel) AS BIGINT) AS n_novel,
               CAST(SUM(novel) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS novelty_rate
        FROM flagged
        GROUP BY doc_id
    """,
})

ORACLES.update({
    "edit_distance_pairs": f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        cpairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        sk AS (
          SELECT doc_id,
                 substring(regexp_replace(lower(text),
                                          '[^a-z0-9 ]', '', 'g'),
                           1, 64) AS skel
          FROM documents)
        SELECT p.doc_a, p.doc_b,
               CAST(levenshtein(x.skel, y.skel) AS INTEGER)
                 AS edit_distance,
               CAST(greatest(length(x.skel), length(y.skel)) AS INTEGER)
                 AS max_skel_len,
               CAST(levenshtein(x.skel, y.skel) AS DOUBLE)
                 / CAST(greatest(greatest(length(x.skel),
                                          length(y.skel)), 1) AS DOUBLE)
                 AS rel_distance
        FROM cpairs p
        JOIN sk x ON p.doc_a = x.doc_id
        JOIN sk y ON p.doc_b = y.doc_id
    """,
})

ORACLES.update({
    # DuckDB list_filter lambda index is 1-BASED (Spark's is 0-based);
    # both sides test token position against [mn, mx+15] intervals
    "dup_span_removal": f"""
        WITH d AS (
          SELECT doc_id, toks, len(toks) AS n
          FROM (SELECT doc_id, {TOKS} AS toks FROM documents)),
        e AS (SELECT * FROM d WHERE n >= 16),
        pos AS (
          SELECT doc_id, toks, n,
                 unnest(generate_series(1, n - 15)) AS p
          FROM e),
        wh AS (
          SELECT doc_id, n, p,
                 md5(array_to_string(toks[p : p + 15], ' ')) AS h
          FROM pos),
        dup AS (
          SELECT doc_id, n, p
          FROM (SELECT doc_id, n, p,
                       COUNT(*) OVER (PARTITION BY h) AS c
                FROM wh)
          WHERE c >= 2),
        isl AS (
          SELECT doc_id, n, p,
                 CASE WHEN p > COALESCE(MAX(p) OVER (
                          PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), -16) + 16
                      THEN 1 ELSE 0 END AS ni
          FROM dup),
        isl2 AS (
          SELECT doc_id, n, p, SUM(ni) OVER (
                   PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS island
          FROM isl),
        spans AS (
          SELECT doc_id, island, MIN(p) AS mn, MAX(p) AS mx
          FROM isl2 GROUP BY doc_id, island),
        ivs AS (
          SELECT doc_id, list([mn, mx + 15]) AS ivs
          FROM spans GROUP BY doc_id),
        joined AS (
          SELECT d.doc_id, d.toks, d.n,
                 COALESCE(i.ivs, []) AS ivs
          FROM d LEFT JOIN ivs i ON d.doc_id = i.doc_id),
        clean AS (
          SELECT doc_id, n,
                 list_filter(toks, (x, i) -> len(list_filter(ivs,
                   iv -> i >= iv[1] AND i <= iv[2])) = 0) AS kept
          FROM joined)
        SELECT doc_id,
               CAST(n AS INTEGER) AS n_tokens,
               CAST(len(kept) AS INTEGER) AS n_kept,
               -- array_to_string([]) is NULL in DuckDB, '' in Spark
               md5(COALESCE(array_to_string(kept, ' '), ''))
                 AS cleaned_hash,
               CASE WHEN n > 0 THEN
                 CAST(len(kept) AS DOUBLE) / CAST(n AS DOUBLE)
               END AS kept_fraction
        FROM clean
    """,
})


ORACLES.update({
    "psi_windowed": """
        WITH pts AS (
          SELECT value,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS ca
          FROM events
          WHERE event_type IN ('click', 'purchase')
            AND value IS NOT NULL
          GROUP BY value),
        cum AS (
          SELECT value, ca,
                 SUM(ca) OVER (ORDER BY value) AS fa
          FROM pts),
        tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na FROM pts),
        fen AS (
          SELECT
          MIN(CASE WHEN fa >= (1 * na + 9) // 10 THEN value END) AS f1,
          MIN(CASE WHEN fa >= (2 * na + 9) // 10 THEN value END) AS f2,
          MIN(CASE WHEN fa >= (3 * na + 9) // 10 THEN value END) AS f3,
          MIN(CASE WHEN fa >= (4 * na + 9) // 10 THEN value END) AS f4,
          MIN(CASE WHEN fa >= (5 * na + 9) // 10 THEN value END) AS f5,
          MIN(CASE WHEN fa >= (6 * na + 9) // 10 THEN value END) AS f6,
          MIN(CASE WHEN fa >= (7 * na + 9) // 10 THEN value END) AS f7,
          MIN(CASE WHEN fa >= (8 * na + 9) // 10 THEN value END) AS f8,
          MIN(CASE WHEN fa >= (9 * na + 9) // 10 THEN value END) AS f9
          FROM cum, tot),
        base AS (
          SELECT (CASE WHEN value > f1 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f2 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f3 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f4 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f5 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f6 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f7 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f8 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f9 THEN 1 ELSE 0 END) AS bucket,
                 CAST(SUM(ca) AS BIGINT) AS n_base
          FROM pts, fen
          GROUP BY 1),
        cur AS (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00')
                   AS hour,
                 (CASE WHEN value > f1 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f2 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f3 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f4 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f5 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f6 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f7 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f8 THEN 1 ELSE 0 END)
                 + (CASE WHEN value > f9 THEN 1 ELSE 0 END) AS bucket,
                 COUNT(*) AS n_cur
          FROM events, fen
          WHERE event_type = 'purchase' AND value IS NOT NULL
          GROUP BY 1, 2),
        win AS (
          SELECT hour, bucket, CAST(n_cur AS BIGINT) AS n_cur,
                 CAST(SUM(n_cur) OVER (PARTITION BY hour) AS BIGINT)
                   AS nb_win
          FROM cur)
        SELECT hour, bucket, n_cur, nb_win, n_base,
               CAST(n_base AS DOUBLE) / CAST(na AS DOUBLE) AS p_base,
               CAST(n_cur AS DOUBLE) / CAST(nb_win AS DOUBLE) AS p_cur,
               floor((CAST(n_base AS DOUBLE) / CAST(na AS DOUBLE)
                      - CAST(n_cur AS DOUBLE) / CAST(nb_win AS DOUBLE))
                     * ln((CAST(n_base AS DOUBLE) / CAST(na AS DOUBLE))
                          / (CAST(n_cur AS DOUBLE)
                             / CAST(nb_win AS DOUBLE)))
                     * 1e9 + 0.5) / 1e9 AS psi_term
        FROM win JOIN base USING (bucket), tot
    """,
})

def _ks_windowed_sql(nb: int = 64) -> str:
    """Hourly sup-gap KS twin: rank-exact 1/nb baseline fences, full
    (hour × bucket) grid, cumulative counts, HUGEINT cross products,
    smallest-bucket arg-max tie-break — mirroring the Spark plan's
    integer arithmetic exactly."""
    fences = ",\n          ".join(
        f"MIN(CASE WHEN fa >= ({k} * na + {nb - 1}) // {nb} "
        f"THEN value END) AS f{k}" for k in range(1, nb))
    bucket = "\n                 + ".join(
        f"(CASE WHEN value > f{k} THEN 1 ELSE 0 END)"
        for k in range(1, nb))
    return f"""
        WITH pts AS (
          SELECT value,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS ca
          FROM events
          WHERE event_type IN ('click', 'purchase')
            AND value IS NOT NULL
          GROUP BY value),
        cum AS (
          SELECT value, ca, SUM(ca) OVER (ORDER BY value) AS fa
          FROM pts),
        tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na FROM pts),
        fen AS (
          SELECT
          {fences}
          FROM cum, tot),
        base AS (
          SELECT {bucket} AS bucket,
                 CAST(SUM(ca) AS BIGINT) AS n_base
          FROM pts, fen
          GROUP BY 1),
        bgrid AS (
          SELECT g.b AS bucket,
                 SUM(COALESCE(base.n_base, 0)) OVER (ORDER BY g.b)
                   AS ba
          FROM unnest(generate_series(0, {nb - 1})) AS g(b)
          LEFT JOIN base ON base.bucket = g.b),
        cur AS (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00')
                   AS hour,
                 {bucket} AS bucket
          FROM events, fen
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        ccnt AS (
          SELECT hour, bucket, CAST(COUNT(*) AS BIGINT) AS n_cur
          FROM cur GROUP BY hour, bucket),
        grid AS (
          SELECT h.hour, g.b AS bucket
          FROM (SELECT DISTINCT hour FROM cur) h,
               unnest(generate_series(0, {nb - 1})) AS g(b)),
        filled AS (
          SELECT grid.hour, grid.bucket,
                 COALESCE(ccnt.n_cur, 0) AS n_cur
          FROM grid LEFT JOIN ccnt
            ON ccnt.hour = grid.hour AND ccnt.bucket = grid.bucket),
        cw AS (
          SELECT hour, bucket,
                 SUM(n_cur) OVER (PARTITION BY hour ORDER BY bucket)
                   AS cu,
                 CAST(SUM(n_cur) OVER (PARTITION BY hour) AS BIGINT)
                   AS nb
          FROM filled),
        d AS (
          SELECT cw.hour, tot.na, cw.nb, cw.bucket,
                 ABS(CAST(bgrid.ba AS HUGEINT) * cw.nb
                     - CAST(cw.cu AS HUGEINT) * tot.na) AS dnum
          FROM cw JOIN bgrid ON bgrid.bucket = cw.bucket, tot),
        best AS (
          SELECT hour, na, nb,
                 MAX(struct_pack(dn := dnum, nv := -bucket)) AS m
          FROM d GROUP BY hour, na, nb)
        SELECT hour, na, nb,
               CAST(-(m.nv) AS INTEGER) AS at_bucket,
               CAST(m.dn AS DOUBLE) AS d_num,
               CAST(m.dn AS DOUBLE)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_stat
        FROM best
    """


def _ks_by_source_sql(nb: int = 64) -> str:
    """Per-source corpus-shape KS twin: full-corpus length ECDF
    fences, per-source bucket counts, same grid/cumulative/sup-gap
    arithmetic as the hourly monitor."""
    fences = ",\n          ".join(
        f"MIN(CASE WHEN fa >= ({k} * na + {nb - 1}) // {nb} "
        f"THEN value END) AS f{k}" for k in range(1, nb))
    bucket = "\n                 + ".join(
        f"(CASE WHEN value > f{k} THEN 1 ELSE 0 END)"
        for k in range(1, nb))
    return f"""
        WITH pts AS (
          SELECT CAST(n_chars AS DOUBLE) AS value, COUNT(*) AS ca
          FROM documents WHERE n_chars IS NOT NULL
          GROUP BY CAST(n_chars AS DOUBLE)),
        cum AS (
          SELECT value, ca, SUM(ca) OVER (ORDER BY value) AS fa
          FROM pts),
        tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na FROM pts),
        fen AS (
          SELECT
          {fences}
          FROM cum, tot),
        base AS (
          SELECT {bucket} AS bucket,
                 CAST(SUM(ca) AS BIGINT) AS n_base
          FROM pts, fen
          GROUP BY 1),
        bgrid AS (
          SELECT g.b AS bucket,
                 SUM(COALESCE(base.n_base, 0)) OVER (ORDER BY g.b)
                   AS ba
          FROM unnest(generate_series(0, {nb - 1})) AS g(b)
          LEFT JOIN base ON base.bucket = g.b),
        cur AS (
          SELECT source,
                 {bucket.replace("value", "CAST(n_chars AS DOUBLE)")}
                   AS bucket
          FROM documents, fen
          WHERE n_chars IS NOT NULL),
        ccnt AS (
          SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_cur
          FROM cur GROUP BY source, bucket),
        grid AS (
          SELECT h.source, g.b AS bucket
          FROM (SELECT DISTINCT source FROM cur) h,
               unnest(generate_series(0, {nb - 1})) AS g(b)),
        filled AS (
          SELECT grid.source, grid.bucket,
                 COALESCE(ccnt.n_cur, 0) AS n_cur
          FROM grid LEFT JOIN ccnt
            ON ccnt.source = grid.source AND ccnt.bucket = grid.bucket),
        cw AS (
          SELECT source, bucket,
                 SUM(n_cur) OVER (PARTITION BY source ORDER BY bucket)
                   AS cu,
                 CAST(SUM(n_cur) OVER (PARTITION BY source) AS BIGINT)
                   AS nb
          FROM filled),
        d AS (
          SELECT cw.source, tot.na, cw.nb, cw.bucket,
                 ABS(CAST(bgrid.ba AS HUGEINT) * cw.nb
                     - CAST(cw.cu AS HUGEINT) * tot.na) AS dnum
          FROM cw JOIN bgrid ON bgrid.bucket = cw.bucket, tot),
        best AS (
          SELECT source, na, nb,
                 MAX(struct_pack(dn := dnum, nv := -bucket)) AS m
          FROM d GROUP BY source, na, nb)
        SELECT source, na, nb,
               CAST(-(m.nv) AS INTEGER) AS at_bucket,
               CAST(m.dn AS DOUBLE) AS d_num,
               CAST(m.dn AS DOUBLE)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_stat
        FROM best
    """


ORACLES.update({
    "ks_windowed": _ks_windowed_sql(64),
    "ks_by_source": _ks_by_source_sql(64),
    # the single-node luxury: ORDER BY + OFFSET; the Spark plan's
    # bisection+top-k selection returns the identical k-th smallest
    "exact_median_value": """
        WITH s AS (
          SELECT value FROM events
          WHERE event_type = 'click' AND value IS NOT NULL),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s)
        SELECT n, CAST((n + 1) // 2 AS BIGINT) AS k,
               (SELECT value FROM s ORDER BY value
                LIMIT 1 OFFSET (SELECT (n + 1) // 2 - 1 FROM t))
                 AS median
        FROM t
    """,
    # exact-integer log2 bucket: length(bin(x)) - 1 on both engines
    "doc_length_histogram": """
        WITH d AS (
          SELECT CAST(length(bin(n_chars)) - 1 AS INTEGER)
                   AS log2_bucket,
                 n_chars
          FROM documents WHERE n_chars > 0),
        hist AS (
          SELECT log2_bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 MIN(n_chars) AS min_chars,
                 MAX(n_chars) AS max_chars
          FROM d GROUP BY log2_bucket)
        SELECT log2_bucket, n_docs, min_chars, max_chars,
               CAST(n_docs AS DOUBLE)
                 / CAST(SUM(n_docs) OVER () AS DOUBLE) AS doc_share
        FROM hist
    """,
    # Gini from exact rank/count sums; rank = single-window luxury
    "user_activity_gini": """
        WITH counts AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY user_id),
        ranked AS (
          SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) AS rank
          FROM counts),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(rank AS HUGEINT) * c) AS src,
                 CAST(SUM(c) AS HUGEINT) AS tot
          FROM ranked)
        SELECT n, CAST(tot AS BIGINT) AS n_events,
               2.0 * CAST(src AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
                 AS gini
        FROM agg
    """,
    # rendezvous hashing: per-doc argmax of md5 weights (struct max =
    # lexicographic, mirrored field order), moved set when a 9th
    # shard is added
    "rendezvous_shards": """
        WITH w AS (
          SELECT doc_id, s.s AS s,
                 md5(concat('rz|', CAST(s.s AS VARCHAR), '|',
                            CAST(doc_id AS VARCHAR))) AS w
          FROM documents, (SELECT unnest(range(9)) AS s) s),
        pick8 AS (
          SELECT doc_id, MAX(struct_pack(w := w, s := s)) AS m
          FROM w WHERE s < 8 GROUP BY doc_id),
        pick9 AS (
          SELECT doc_id, MAX(struct_pack(w := w, s := s)) AS m
          FROM w GROUP BY doc_id),
        j AS (
          SELECT p8.doc_id,
                 CAST(p8.m.s AS INTEGER) AS shard,
                 CAST(p9.m.s AS INTEGER) AS shard_next
          FROM pick8 p8 JOIN pick9 p9 USING (doc_id))
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN shard <> shard_next
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
               CAST(SUM(CASE WHEN shard <> shard_next
                        THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS moved_frac
        FROM j GROUP BY shard
    """,
    # grouped exact medians: per-group ROW_NUMBER rank join
    "exact_median_by_type": """
        WITH s AS (
          SELECT event_type, value FROM events
          WHERE value IS NOT NULL),
        t AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST((COUNT(*) + 1) // 2 AS BIGINT) AS k
          FROM s GROUP BY event_type),
        ranked AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value) AS rn
          FROM s)
        SELECT t.event_type, t.n, t.k, r.value AS median
        FROM t JOIN ranked r
          ON r.event_type = t.event_type AND r.rn = t.k
    """,
    # quantized-integer covariance cells: exact integer sums, one
    # deterministic double expression per cell
    "embedding_covariance": """
        WITH q AS (
          SELECT list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0
                             + 0.5) AS BIGINT)) AS q
          FROM embeddings),
        cells AS (
          SELECT a.i AS i, b.j AS j,
                 SUM(q[a.i + 1] * q[b.j + 1]) AS sxy,
                 SUM(q[a.i + 1]) AS sx,
                 SUM(q[b.j + 1]) AS sy,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM q,
               unnest(generate_series(0, len(q) - 1)) AS a(i),
               unnest(generate_series(0, len(q) - 1)) AS b(j)
          WHERE b.j >= a.i
          GROUP BY a.i, b.j)
        SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j, n,
               (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                 / 1000000000000.0 AS cov
        FROM cells
    """,
    # k_p = ceil(p·n/100) in integer arithmetic — identical order
    # statistic on both engines; the oracle ranks once and joins
    "exact_quantiles_value": """
        WITH s AS (
          SELECT value FROM events
          WHERE event_type = 'click' AND value IS NOT NULL),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
        q AS (SELECT * FROM (VALUES ('p50', 50), ('p90', 90),
                                    ('p99', 99)) AS v(q, pct)),
        r AS (SELECT q.q, t.n,
                     CAST((q.pct * t.n + 99) // 100 AS BIGINT) AS k
              FROM q, t),
        ranked AS (
          SELECT value,
                 ROW_NUMBER() OVER (ORDER BY value) AS rn
          FROM s)
        SELECT r.q, r.n, r.k, ranked.value
        FROM r JOIN ranked ON ranked.rn = r.k
    """,
})

ORACLES.update({
    "phrase_search": f"""
        WITH d AS (
          SELECT doc_id, toks FROM
            (SELECT doc_id, {TOKS} AS toks FROM documents)
          WHERE len(toks) >= 2),
        bigr AS (
          SELECT toks[i] AS w1, toks[i + 1] AS w2
          FROM d, unnest(generate_series(1, len(toks) - 1)) AS u(i)),
        top AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM bigr GROUP BY w1, w2
          ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1),
        post AS (
          SELECT doc_id, p AS pos, toks[p] AS tok
          FROM d, unnest(generate_series(1, len(toks))) AS u(p)),
        hits AS (
          SELECT a.doc_id, a.pos, t.w1, t.w2, t.cnt
          FROM post a, top t, post b
          WHERE a.tok = t.w1 AND b.tok = t.w2
            AND b.doc_id = a.doc_id AND b.pos = a.pos + 1)
        SELECT doc_id, w1, w2, cnt AS corpus_count,
               CAST(COUNT(*) AS BIGINT) AS n_matches,
               CAST(MIN(pos) AS INTEGER) AS first_pos
        FROM hits
        GROUP BY doc_id, w1, w2, cnt
    """,
})

ORACLES.update({
    # single-window luxury; the Spark plan's bucket-decomposed
    # row_number equals it because the bucket test is monotone in the
    # order key and ties never straddle buckets
    "global_row_index": """
        SELECT doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC)
                    - 1 AS BIGINT) AS row_index
        FROM documents
    """,
})

ORACLES.update({
    # naive ordered 3-join (oracle luxury); the Spark plan's
    # degree-oriented wedge join finds the identical triangle set
    "triangle_counts": f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        e AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        members AS (
          SELECT unnest([x, y, z]) AS doc_id FROM tri)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM members GROUP BY doc_id
    """,
})

ORACLES.update({
    # weekday via epoch-day arithmetic from a Monday anchor — no
    # locale-dependent day names; decimal-exact revenue, the window
    # total stays decimal until the final IEEE divisions
    "weekday_revenue_seasonality": """
        WITH g AS (
          SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-05') % 7
                   AS weekday,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                      AS DECIMAL(38,6)) AS srev
          FROM orders GROUP BY 1)
        SELECT weekday, n_orders,
               CAST(srev AS DOUBLE) AS revenue,
               CAST(srev AS DOUBLE) / n_orders AS avg_order_value,
               (CAST(srev AS DOUBLE) / n_orders)
                 / (CAST(CAST(SUM(srev) OVER () AS DECIMAL(38,6))
                         AS DOUBLE)
                    / CAST(SUM(n_orders) OVER () AS BIGINT))
                 AS seasonality_index
        FROM g
    """,
    # rank-exact discrete percentiles: min delay whose cumulative
    # count reaches ceil(q*n/100) — identical integer arithmetic to
    # the Spark operator, no percentile interpolation
    "order_ship_delay_quantiles": """
        WITH j AS (
          SELECT o_orderpriority AS priority,
                 (CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE))
                   AS delay
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        c AS (
          SELECT priority, delay, COUNT(*) AS c
          FROM j GROUP BY priority, delay),
        cum AS (
          SELECT priority, delay,
                 CAST(SUM(c) OVER (PARTITION BY priority ORDER BY delay
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cf,
                 CAST(SUM(c) OVER (PARTITION BY priority) AS BIGINT)
                   AS n
          FROM c)
        SELECT priority, MAX(n) AS n_lines,
               MIN(CASE WHEN cf >= (25 * n + 99) // 100 THEN delay END)
                 AS p25,
               MIN(CASE WHEN cf >= (50 * n + 99) // 100 THEN delay END)
                 AS p50,
               MIN(CASE WHEN cf >= (75 * n + 99) // 100 THEN delay END)
                 AS p75,
               MIN(CASE WHEN cf >= (90 * n + 99) // 100 THEN delay END)
                 AS p90
        FROM cum GROUP BY priority
    """,
    # first-seen trick: cumulative COUNT(DISTINCT) as a running sum of
    # per-day first appearances
    "cumulative_distinct_users": """
        WITH first AS (
          SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
          FROM events GROUP BY user_id),
        daily AS (
          SELECT day, COUNT(*) AS new_users FROM first GROUP BY day)
        SELECT day, new_users,
               CAST(SUM(new_users) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_users
        FROM daily
    """,
    # holding-time weights in whole seconds (floor of the microsecond
    # gap), weighted sum in exact decimal — order-independent
    "twap_user_value": """
        WITH ev AS (
          SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
          FROM events),
        seg AS (
          SELECT user_id, value,
                 (LEAD(ts_us) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) - ts_us) // 1000000 AS w
          FROM ev),
        agg AS (
          SELECT user_id,
                 COUNT(*) AS n_segments,
                 CAST(SUM(w) AS BIGINT) AS total_secs,
                 CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))
                                * CAST(w AS DECIMAL(18,0)))
                           AS DECIMAL(38,4)) AS DOUBLE) AS wsum
          FROM seg WHERE w IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_segments, total_secs,
               wsum / CAST(total_secs AS DOUBLE) AS twap_value
        FROM agg WHERE total_secs > 0
    """,
})

from .operators.dedup import (TFIDF_COS_MIN, TFIDF_DF_MAX,  # noqa: E402
                              TFIDF_IDF_GRID)
from .operators.text import ENTROPY_GRID  # noqa: E402

ORACLES.update({
    # integer milli-nat idf grid → bigint weights/dots/norms (order-
    # independent); candidate join df-pruned exactly like the operator
    "tfidf_cosine_pairs": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id, {SHINGLES} AS shingles FROM d
               WHERE len(toks) >= 3),
        tf AS (
          SELECT doc_id, unnest(shingles) AS sh FROM sh),
        tfc AS (
          SELECT doc_id, sh, COUNT(*) AS tf FROM tf GROUP BY doc_id, sh),
        nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM tfc),
        dfc AS (SELECT sh, COUNT(*) AS df FROM tfc GROUP BY sh),
        w AS (
          SELECT doc_id, tfc.sh, df,
                 CAST(tf AS BIGINT) * CAST(floor(
                   ln(nd / CAST(df AS DOUBLE)) * {TFIDF_IDF_GRID} + 0.5)
                   AS BIGINT) AS w
          FROM tfc JOIN dfc ON tfc.sh = dfc.sh CROSS JOIN nd),
        norms AS (
          SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
          FROM w GROUP BY doc_id),
        dots AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(SUM(a.w * b.w) AS BIGINT) AS dot
          FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id
          WHERE a.df <= {TFIDF_DF_MAX} AND b.df <= {TFIDF_DF_MAX}
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, dot,
               CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.n2 AS DOUBLE))
                    * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b
        WHERE CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.n2 AS DOUBLE))
                    * sqrt(CAST(nb.n2 AS DOUBLE))) >= {TFIDF_COS_MIN}
    """,
    # in-row fold, per-term integer micro-nat quantization BEFORE the
    # sum — mirrors the Spark fold exactly
    "doc_token_entropy": f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks FROM documents
          WHERE len({TOKS}) > 0),
        cs AS (
          SELECT doc_id, toks,
                 list_transform(list_distinct(toks),
                   x -> len(list_filter(toks, y -> y = x))) AS cs
          FROM d)
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(cs) AS INT) AS n_distinct_tokens,
               CAST(list_sum(list_transform(cs, c ->
                 CAST(floor(c * ln(len(toks) / CAST(c AS DOUBLE))
                   * {ENTROPY_GRID} + 0.5) AS BIGINT))) AS BIGINT)
                 AS h_units,
               CAST(list_sum(list_transform(cs, c ->
                 CAST(floor(c * ln(len(toks) / CAST(c AS DOUBLE))
                   * {ENTROPY_GRID} + 0.5) AS BIGINT))) AS DOUBLE)
                 / {ENTROPY_GRID} / len(toks) AS entropy_nats
        FROM cs
    """,
})

ORACLES.update({
    # same 8-plane bucket CTE as knn_lsh; per-node top-3 via
    # ROW_NUMBER with the identical (cos DESC, dst ASC) tie-break
    "knn_graph": f"""
        WITH {_BUCKETS_CTE},
        cand AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 b.label AS dst_label,
                 {_cos('a.embedding', 'b.embedding')} AS cos_sim
          FROM assigned a
          JOIN assigned b USING (bucket)
          WHERE a.vec_id <> b.vec_id)
        SELECT src, dst, dst_label, cos_sim, CAST(rn AS INT) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY src
                   ORDER BY cos_sim DESC, dst ASC) AS rn
          FROM cand)
        WHERE rn <= 3
    """,
})

ORACLES.update({
    # single-window-per-group luxury; the grouped prefix decomposition
    # equals it because fences are monotone and ties share buckets
    "value_deciles_by_type": """
        WITH c AS (
          SELECT event_type, CAST(value AS DOUBLE) AS v, COUNT(*) AS c
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type, CAST(value AS DOUBLE)),
        cum AS (
          SELECT event_type, v,
                 CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cf,
                 CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
          FROM c)
        SELECT event_type, MAX(n) AS n_rows,
               MIN(CASE WHEN cf >= (1 * n + 9) // 10 THEN v END) AS d1,
               MIN(CASE WHEN cf >= (2 * n + 9) // 10 THEN v END) AS d2,
               MIN(CASE WHEN cf >= (3 * n + 9) // 10 THEN v END) AS d3,
               MIN(CASE WHEN cf >= (4 * n + 9) // 10 THEN v END) AS d4,
               MIN(CASE WHEN cf >= (5 * n + 9) // 10 THEN v END) AS d5,
               MIN(CASE WHEN cf >= (6 * n + 9) // 10 THEN v END) AS d6,
               MIN(CASE WHEN cf >= (7 * n + 9) // 10 THEN v END) AS d7,
               MIN(CASE WHEN cf >= (8 * n + 9) // 10 THEN v END) AS d8,
               MIN(CASE WHEN cf >= (9 * n + 9) // 10 THEN v END) AS d9
        FROM cum GROUP BY event_type
    """,
})

from .operators.text import (PMI_GRID, PMI_MIN_PAIRS,  # noqa: E402
                             PMI_VOCAB_K, BOTTOMK_SAMPLE_K)

ORACLES.update({
    # top-32-vocab co-occurrence PMI; pair = lexicographic x < y over
    # per-doc distinct vocab tokens, micro-nat quantized
    "token_pmi_pairs": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        tok AS (
          SELECT doc_id, unnest(list_distinct(toks)) AS tk FROM d),
        vocab AS (
          SELECT tk FROM (SELECT unnest(toks) AS tk FROM d)
          GROUP BY tk
          ORDER BY COUNT(*) DESC, tk ASC LIMIT {PMI_VOCAB_K}),
        vt AS (SELECT doc_id, tk FROM tok JOIN vocab USING (tk)),
        nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM vt),
        cxs AS (SELECT tk, COUNT(*) AS cx FROM vt GROUP BY tk),
        pairs AS (
          SELECT a.tk AS x, b.tk AS y, COUNT(*) AS cxy
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.tk < b.tk
          GROUP BY a.tk, b.tk
          HAVING COUNT(*) >= {PMI_MIN_PAIRS})
        SELECT x, y, cxy, ca.cx AS cx, cb.cx AS cy,
               CAST(floor(ln(CAST(nd AS DOUBLE) * cxy
                             / (CAST(ca.cx AS DOUBLE) * cb.cx))
                          * {PMI_GRID} + 0.5) AS BIGINT) AS pmi_units
        FROM pairs
        JOIN cxs ca ON ca.tk = x
        JOIN cxs cb ON cb.tk = y
        CROSS JOIN nd
    """,
    "bottomk_hash_sample": f"""
        SELECT doc_id, lang, source,
               md5('bk|' || CAST(doc_id AS VARCHAR)) AS sample_key
        FROM documents
        ORDER BY sample_key ASC, doc_id ASC
        LIMIT {BOTTOMK_SAMPLE_K}
    """,
})

from .operators.text import KL_GRID  # noqa: E402

ORACLES.update({
    "daily_value_trend": f"""
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 COUNT(*) AS n_events,
                 CAST(SUM(CAST(value AS DECIMAL(18,4)))
                      AS DECIMAL(38,6)) AS tot_d
          FROM events GROUP BY strftime(ts, '%Y-%m-%d'))
        SELECT day, n_events,
               CAST(tot_d AS DOUBLE) AS total_value,
               CAST(CAST(SUM(tot_d) OVER w AS DECIMAL(38,6)) AS DOUBLE)
                 / COUNT(*) OVER w AS trend7,
               CAST(tot_d AS DOUBLE)
                 / (CAST(CAST(SUM(tot_d) OVER w AS DECIMAL(38,6))
                         AS DOUBLE) / COUNT(*) OVER w)
                 AS ratio_to_trend
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    """,
    # per-language term quantized to integer micro-nats BEFORE the
    # per-source sum — identical operand chain to the Spark operator
    "source_lang_kl": f"""
        WITH sl AS (
          SELECT source, lang, COUNT(*) AS c_sl
          FROM documents GROUP BY source, lang),
        ns AS (SELECT source, CAST(SUM(c_sl) AS BIGINT) AS n_s
               FROM sl GROUP BY source),
        cl AS (SELECT lang, CAST(SUM(c_sl) AS BIGINT) AS c_l
               FROM sl GROUP BY lang),
        tot AS (SELECT CAST(SUM(c_sl) AS BIGINT) AS n_tot FROM sl),
        terms AS (
          SELECT sl.source, n_s,
                 CAST(floor(c_sl * ln(CAST(c_sl AS DOUBLE) * n_tot
                       / (CAST(n_s AS DOUBLE) * c_l))
                       * {KL_GRID} + 0.5) AS BIGINT) AS u
          FROM sl
          JOIN cl USING (lang)
          JOIN ns ON ns.source = sl.source
          CROSS JOIN tot)
        SELECT source, MAX(n_s) AS n_docs,
               CAST(SUM(u) AS BIGINT) AS kl_units,
               CAST(SUM(u) AS DOUBLE) / {KL_GRID} / MAX(n_s)
                 AS kl_nats
        FROM terms GROUP BY source
    """,
})

from .operators.relational import AFFINITY_MIN_PAIRS  # noqa: E402

ORACLES.update({
    "part_affinity_pairs": f"""
        WITH base AS (
          SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey
          FROM lineitem),
        n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM base),
        cxs AS (SELECT pkey, COUNT(*) AS c FROM base GROUP BY pkey),
        pairs AS (
          SELECT a.pkey AS x, b.pkey AS y, COUNT(*) AS cxy
          FROM base a JOIN base b
            ON a.okey = b.okey AND a.pkey < b.pkey
          GROUP BY a.pkey, b.pkey
          HAVING COUNT(*) >= {AFFINITY_MIN_PAIRS})
        SELECT x, y, cxy, ca.c AS cx, cb.c AS cy,
               CAST(cxy AS DOUBLE) / n_orders AS support,
               CAST(n_orders AS DOUBLE) * cxy
                 / (CAST(ca.c AS DOUBLE) * cb.c) AS lift
        FROM pairs
        JOIN cxs ca ON ca.pkey = x
        JOIN cxs cb ON cb.pkey = y
        CROSS JOIN n
    """,
    # single ROW_NUMBER luxury; the bucket decomposition equals it
    # because the fence test is monotone and ties share buckets
    "customer_revenue_lorenz": """
        WITH rev AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                      AS DECIMAL(38,6)) AS rev_d
          FROM orders GROUP BY o_custkey),
        ranked AS (
          SELECT rev_d,
                 ROW_NUMBER() OVER (
                   ORDER BY rev_d ASC, o_custkey ASC) - 1 AS rnk,
                 COUNT(*) OVER () AS n
          FROM rev),
        dec10 AS (
          SELECT CAST((rnk * 10) // n AS INT) AS decile,
                 COUNT(*) AS n_customers,
                 CAST(SUM(rev_d) AS DECIMAL(38,6)) AS drev
          FROM ranked GROUP BY CAST((rnk * 10) // n AS INT))
        SELECT decile, n_customers,
               CAST(drev AS DOUBLE) AS revenue,
               CAST(drev AS DOUBLE)
                 / CAST(CAST(SUM(drev) OVER () AS DECIMAL(38,6))
                        AS DOUBLE) AS rev_share,
               CAST(CAST(SUM(drev) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(38,6)) AS DOUBLE)
                 / CAST(CAST(SUM(drev) OVER () AS DECIMAL(38,6))
                        AS DOUBLE) AS cum_share
        FROM dec10
    """,
})

from .operators.windows import (SESSION_PATH_LEN,  # noqa: E402
                                SESSION_PATH_TOPK)

ORACLES.update({
    "session_top_paths": f"""
        WITH ev AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
          FROM events),
        lagd AS (
          SELECT *,
            CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1
                 WHEN LAG(ts_us) OVER w IS NULL THEN 1
                 ELSE 0 END AS ns
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        sess AS (
          SELECT *, SUM(ns) OVER (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM lagd),
        paths AS (
          SELECT user_id, sid,
                 array_to_string(list_slice(
                   list(event_type ORDER BY ts_us, event_id),
                   1, {SESSION_PATH_LEN}), '>') AS path
          FROM sess GROUP BY user_id, sid)
        SELECT path, COUNT(*) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path ASC
        LIMIT {SESSION_PATH_TOPK}
    """,
    "revenue_cohorts": f"""
        WITH o AS (
          SELECT o_custkey, o_totalprice,
                 strftime(o_orderdate, '%Y-%m') AS om,
                 CAST(year(o_orderdate) * 12 + month(o_orderdate)
                      AS INT) AS mnum
          FROM orders),
        c AS (
          SELECT o_custkey, MIN(om) AS cohort_month,
                 MIN(mnum) AS cnum
          FROM o GROUP BY o_custkey)
        SELECT cohort_month, om AS order_month,
               mnum - cnum AS months_since,
               COUNT(DISTINCT o.o_custkey) AS n_customers,
               COUNT(*) AS n_orders,
               {DSUM('o_totalprice')} AS revenue
        FROM o JOIN c USING (o_custkey)
        GROUP BY cohort_month, om, mnum - cnum
    """,
    "part_supplier_redundancy": """
        WITH ps AS (
          SELECT l_partkey,
                 COUNT(DISTINCT l_suppkey) AS n_suppliers
          FROM lineitem GROUP BY l_partkey),
        h AS (
          SELECT n_suppliers, COUNT(*) AS n_parts
          FROM ps GROUP BY n_suppliers)
        SELECT n_suppliers, n_parts,
               CAST(n_parts AS DOUBLE) / SUM(n_parts) OVER ()
                 AS part_share
        FROM h
    """,
})

from .operators.text import (TEMP_ALPHA, TEMP_GRID,  # noqa: E402
                             TEMP_TOKEN_BUDGET, VOCAB_CURVE_POINTS,
                             ZIPF_GRID, ZIPF_TOPK)

ORACLES.update({
    "source_temperature_weights": f"""
        WITH per AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(len({TOKS})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        q AS (
          SELECT source, n_docs, n_tokens,
                 CAST(n_tokens AS DOUBLE)
                   / CAST(SUM(n_tokens) OVER () AS DOUBLE)
                   AS token_share,
                 CAST(floor(pow(CAST(n_tokens AS DOUBLE)
                     / CAST(SUM(n_tokens) OVER () AS DOUBLE),
                     {TEMP_ALPHA}) * {TEMP_GRID} + 0.5) AS BIGINT)
                   AS qv
          FROM per)
        SELECT source, n_docs, n_tokens, token_share,
               CAST(qv AS DOUBLE) / CAST(SUM(qv) OVER () AS DOUBLE)
                 AS weight,
               CAST(qv AS DOUBLE) / CAST(SUM(qv) OVER () AS DOUBLE)
                 * {float(TEMP_TOKEN_BUDGET)}
                 / CAST(n_tokens AS DOUBLE) AS epochs
        FROM q
    """,
    "vocab_growth_curve": f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks FROM documents),
        anchor AS (
          SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
        firsts AS (
          SELECT w, MIN(doc_id) AS fd
          FROM (SELECT unnest(toks) AS w, doc_id FROM d)
          GROUP BY w),
        fb AS (
          SELECT GREATEST(1, LEAST({VOCAB_CURVE_POINTS},
                   CASE WHEN hi = lo THEN 1 ELSE
                     CAST(((fd - lo) * {VOCAB_CURVE_POINTS}
                           + (hi - lo) - 1) // (hi - lo) AS INT)
                   END)) AS k,
                 COUNT(*) AS new_words
          FROM firsts, anchor GROUP BY 1),
        tb AS (
          SELECT GREATEST(1, LEAST({VOCAB_CURVE_POINTS},
                   CASE WHEN hi = lo THEN 1 ELSE
                     CAST(((doc_id - lo) * {VOCAB_CURVE_POINTS}
                           + (hi - lo) - 1) // (hi - lo) AS INT)
                   END)) AS k,
                 CAST(SUM(len(toks)) AS BIGINT) AS toks_in,
                 COUNT(*) AS docs_in
          FROM d, anchor GROUP BY 1),
        spine AS (
          SELECT CAST(range AS INT) AS k
          FROM range(1, {VOCAB_CURVE_POINTS} + 1))
        SELECT k,
               CAST(SUM(COALESCE(docs_in, 0)) OVER w AS BIGINT)
                 AS docs,
               CAST(SUM(COALESCE(toks_in, 0)) OVER w AS BIGINT)
                 AS tokens,
               CAST(SUM(COALESCE(new_words, 0)) OVER w AS BIGINT)
                 AS vocab
        FROM spine LEFT JOIN fb USING (k) LEFT JOIN tb USING (k)
        WINDOW w AS (ORDER BY k
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "doc_ttr_profile": f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks FROM documents
          WHERE len({TOKS}) > 0)
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                 / CAST(len(toks) AS INT) AS ttr,
               CAST(CAST(list_sum(list_transform(toks,
                   x -> length(x))) AS BIGINT) AS DOUBLE)
                 / CAST(len(toks) AS INT) AS avg_word_len,
               CAST(list_max(list_transform(toks, x -> length(x)))
                 AS INT) AS max_word_len
        FROM d
    """,
    "zipf_slope_topk": f"""
        WITH tf AS (
          SELECT w, COUNT(*) AS c
          FROM (SELECT unnest({TOKS}) AS w FROM documents)
          GROUP BY w
          ORDER BY c DESC, w ASC LIMIT {ZIPF_TOPK}),
        r AS (
          SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS r
          FROM tf),
        qq AS (
          SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * {ZIPF_GRID}
                   + 0.5) AS BIGINT) AS x,
                 CAST(floor(ln(CAST(c AS DOUBLE)) * {ZIPF_GRID}
                   + 0.5) AS BIGINT) AS y
          FROM r),
        s AS (
          SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM qq)
        SELECT CAST(n AS BIGINT) AS n_terms,
               (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE)
                   / ({float(ZIPF_GRID)} * {float(ZIPF_GRID)}))
                - (CAST(sx AS DOUBLE) / {float(ZIPF_GRID)})
                  * (CAST(sy AS DOUBLE) / {float(ZIPF_GRID)}))
               / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE)
                   / ({float(ZIPF_GRID)} * {float(ZIPF_GRID)}))
                - (CAST(sx AS DOUBLE) / {float(ZIPF_GRID)})
                  * (CAST(sx AS DOUBLE) / {float(ZIPF_GRID)}))
                 AS slope,
               ((CAST(sy AS DOUBLE) / {float(ZIPF_GRID)})
                  / CAST(n AS DOUBLE))
               - ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE)
                     / ({float(ZIPF_GRID)} * {float(ZIPF_GRID)}))
                   - (CAST(sx AS DOUBLE) / {float(ZIPF_GRID)})
                     * (CAST(sy AS DOUBLE) / {float(ZIPF_GRID)}))
                  / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE)
                     / ({float(ZIPF_GRID)} * {float(ZIPF_GRID)}))
                   - (CAST(sx AS DOUBLE) / {float(ZIPF_GRID)})
                     * (CAST(sx AS DOUBLE) / {float(ZIPF_GRID)})))
                 * ((CAST(sx AS DOUBLE) / {float(ZIPF_GRID)})
                    / CAST(n AS DOUBLE)) AS intercept
        FROM s
    """,
})

ORACLES.update({
    "peak_hour_by_type": """
        WITH th AS (
          SELECT event_type, CAST(hour(ts) AS INT) AS hour,
                 COUNT(*) AS n
          FROM events GROUP BY event_type, hour(ts)),
        best AS (
          SELECT event_type,
                 MAX(struct_pack(n := n, nh := -hour)) AS m,
                 CAST(SUM(n) AS BIGINT) AS total
          FROM th GROUP BY event_type)
        SELECT event_type,
               -(m.nh) AS peak_hour,
               m.n AS peak_events,
               CAST(m.n AS DOUBLE) / total AS peak_share
        FROM best
    """,
    "event_type_share_trend": """
        WITH dt AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2)
        SELECT day, event_type, n_events,
               CAST(n_events AS DOUBLE)
                 / CAST(SUM(n_events) OVER (PARTITION BY day)
                        AS DOUBLE) AS day_share
        FROM dt
    """,
    "customer_band_migration": f"""
        WITH cy AS (
          SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
                 {DSUM('o_totalprice')} AS rev
          FROM orders GROUP BY o_custkey, year(o_orderdate)),
        b AS (
          SELECT o_custkey, yr,
                 CAST(length(CAST(CAST(floor(rev) AS BIGINT)
                   AS VARCHAR)) AS INT) AS band
          FROM cy)
        SELECT a.band AS from_band, c.band AS to_band,
               COUNT(*) AS n_customers
        FROM b a JOIN b c
          ON a.o_custkey = c.o_custkey AND c.yr = a.yr + 1
        GROUP BY a.band, c.band
    """,
})

ORACLES.update({
    # same two-level order-canonical fold as label_centroids, split by
    # vec_id parity; L2 shift folds squared diffs in dim order
    "centroid_drift": """
        WITH e AS (
          SELECT CAST(vec_id % 2 AS INT) AS half, label, vec_id,
                 i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        blk AS (
          SELECT half, label, dim, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb
          FROM e GROUP BY half, label, dim, blk),
        cent AS (
          SELECT half, label, dim,
                 list_sum(list(bsum ORDER BY blk))
                   / CAST(SUM(nb) AS BIGINT) AS c,
                 CAST(SUM(nb) AS BIGINT) AS n
          FROM blk GROUP BY half, label, dim),
        j AS (
          SELECT a.label, a.dim, a.n AS n0, b.n AS n1,
                 (a.c - b.c) * (a.c - b.c) AS d2,
                 abs(a.c - b.c) AS ad
          FROM cent a JOIN cent b
            ON a.label = b.label AND a.dim = b.dim
           AND a.half = 0 AND b.half = 1)
        SELECT label, MAX(n0) AS n0, MAX(n1) AS n1,
               sqrt(list_sum(list(d2 ORDER BY dim))) AS l2_shift,
               MAX(ad) AS max_dim_shift
        FROM j GROUP BY label
    """,
})

ORACLES.update({
    "label_knn_purity": f"""
        WITH {_BUCKETS_CTE},
        cand AS (
          SELECT a.vec_id AS src, a.label AS src_label,
                 b.vec_id AS dst, b.label AS dst_label,
                 {_cos('a.embedding', 'b.embedding')} AS cos_sim
          FROM assigned a
          JOIN assigned b USING (bucket)
          WHERE a.vec_id <> b.vec_id),
        g AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY src
                     ORDER BY cos_sim DESC, dst ASC) AS rn
            FROM cand)
          WHERE rn <= 3)
        SELECT src_label AS label,
               COUNT(DISTINCT src) AS n_nodes,
               CAST(SUM(CASE WHEN rn = 1 AND dst_label = src_label
                        THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                 AS purity_top1,
               CAST(SUM(CASE WHEN dst_label = src_label
                        THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS purity_knn
        FROM g GROUP BY src_label
    """,
})

from .operators.windows import RETENTION_OFFSETS  # noqa: E402

ORACLES.update({
    "cross_source_dup_matrix": f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id)
        SELECT LEAST(sa.source, sb.source) AS source_lo,
               GREATEST(sa.source, sb.source) AS source_hi,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs p
        JOIN documents sa ON p.doc_a = sa.doc_id
        JOIN documents sb ON p.doc_b = sb.doc_id
        GROUP BY LEAST(sa.source, sb.source),
                 GREATEST(sa.source, sb.source)
    """,
    "user_retention_curve": f"""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        fs AS (
          SELECT user_id, MIN(d) AS d0 FROM ud GROUP BY user_id),
        act AS (
          SELECT day_offset, COUNT(DISTINCT u.user_id) AS n_active
          FROM (SELECT ud.user_id,
                       date_diff('day', f.d0, ud.d) AS day_offset
                FROM ud JOIN fs f USING (user_id)) u
          WHERE day_offset IN {RETENTION_OFFSETS!r}
          GROUP BY day_offset),
        cohort AS (SELECT COUNT(*) AS n_users FROM fs),
        spine AS (
          SELECT unnest({list(RETENTION_OFFSETS)!r}::INT[])
            AS day_offset)
        SELECT s.day_offset,
               CAST(COALESCE(a.n_active, 0) AS BIGINT) AS n_active,
               c.n_users,
               CAST(COALESCE(a.n_active, 0) AS DOUBLE) / c.n_users
                 AS retention
        FROM spine s
        LEFT JOIN act a ON s.day_offset = CAST(a.day_offset AS INT)
        CROSS JOIN cohort c
    """,
    "nation_trade_balance": f"""
        WITH m AS (
          SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                 CAST(CAST(SUM({DISC_PRICE}) AS DECIMAL(38,6))
                      AS DOUBLE) AS rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          WHERE sn.n_name <> cn.n_name
          GROUP BY sn.n_name, cn.n_name),
        ab AS (
          SELECT supp_nation AS nation_a, cust_nation AS nation_b,
                 rev AS a_to_b_rev
          FROM m WHERE supp_nation < cust_nation),
        ba AS (
          SELECT cust_nation AS nation_a, supp_nation AS nation_b,
                 rev AS b_to_a_rev
          FROM m WHERE supp_nation > cust_nation)
        SELECT nation_a, nation_b,
               COALESCE(a_to_b_rev, 0.0) AS a_to_b_rev,
               COALESCE(b_to_a_rev, 0.0) AS b_to_a_rev,
               COALESCE(a_to_b_rev, 0.0) - COALESCE(b_to_a_rev, 0.0)
                 AS balance
        FROM ab FULL OUTER JOIN ba USING (nation_a, nation_b)
    """,
})

ORACLES.update({
    # integer-exact first digit via BIGINT cents rendering; expected
    # shares are the SAME shortest-round-trip literals as the Spark
    # operator (no engine log10 anywhere)
    "benford_first_digit": """
        WITH g AS (
          SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS VARCHAR), 1, 1)
                      AS INT) AS digit,
                 COUNT(*) AS n
          FROM orders WHERE o_totalprice > 0 GROUP BY 1),
        e(digit, benford_share) AS (VALUES
          (1, 0.3010299956639812), (2, 0.17609125905568124),
          (3, 0.12493873660829992), (4, 0.09691001300805642),
          (5, 0.07918124604762482), (6, 0.06694678963061322),
          (7, 0.05799194697768673), (8, 0.05115252244738129),
          (9, 0.04575749056067514))
        SELECT g.digit, g.n,
               CAST(g.n AS DOUBLE) / SUM(g.n) OVER () AS share,
               e.benford_share,
               (CAST(g.n AS DOUBLE) / SUM(g.n) OVER ())
                 / e.benford_share AS obs_over_expected
        FROM g JOIN e ON g.digit = e.digit
    """,
    # Pearson over exact DECIMAL(38,0) moments of the BIGINT-cents
    # daily series; only the final sqrt/divide chain is IEEE double
    "daily_revenue_autocorr": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        lags AS (SELECT unnest(range(1, 8)) AS lag),
        pairs AS (
          SELECT l.lag,
                 CAST(a.rev AS DECIMAL(38,0)) AS x,
                 CAST(b.rev AS DECIMAL(38,0)) AS y
          FROM daily a CROSS JOIN lags l
          JOIN daily b ON a.d = b.d + CAST(l.lag AS INT)),
        m AS (
          SELECT lag, COUNT(*) AS n_pairs,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
                 SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
                 SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
          FROM pairs GROUP BY lag)
        SELECT CAST(lag AS INT) AS lag, n_pairs,
               floor(CAST(CAST(CAST(n_pairs AS DECIMAL(38,0)) * sxy
                         - sx * sy AS DECIMAL(38,0)) AS DOUBLE)
                 / (sqrt(CAST(CAST(CAST(n_pairs AS DECIMAL(38,0)) * sxx
                              - sx * sx AS DECIMAL(38,0)) AS DOUBLE))
                    * sqrt(CAST(CAST(CAST(n_pairs AS DECIMAL(38,0)) * syy
                                - sy * sy AS DECIMAL(38,0)) AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9 AS autocorr
        FROM m
    """,
    # rank-exact lower medians (min value with cum count >= (n+1)//2),
    # residual |v - med| is one exact IEEE subtraction, threshold uses
    # the single literal 4.4478 exactly as the Spark operator
    "event_value_mad_outliers": """
        WITH ev AS (
          SELECT event_type, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL),
        r1 AS (
          SELECT event_type, v,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY v) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM ev),
        med AS (
          SELECT event_type, MAX(n) AS n,
                 MIN(CASE WHEN rn >= (n + 1) // 2 THEN v END) AS med
          FROM r1 GROUP BY event_type),
        resid AS (
          SELECT ev.event_type, abs(ev.v - med.med) AS r
          FROM ev JOIN med ON ev.event_type = med.event_type),
        r2 AS (
          SELECT event_type, r,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY r) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM resid),
        mad AS (
          SELECT event_type,
                 MIN(CASE WHEN rn >= (n + 1) // 2 THEN r END) AS mad
          FROM r2 GROUP BY event_type)
        SELECT ev.event_type, MAX(med.n) AS n,
               MAX(med.med) AS median, MAX(mad.mad) AS mad,
               CAST(SUM(CASE WHEN abs(ev.v - med.med)
                             > 4.4478 * mad.mad
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(SUM(CASE WHEN abs(ev.v - med.med) > 4.4478 * mad.mad
                             THEN 1 ELSE 0 END) AS DOUBLE) / MAX(med.n)
                 AS outlier_rate
        FROM ev
        JOIN med ON ev.event_type = med.event_type
        JOIN mad ON ev.event_type = mad.event_type
        GROUP BY ev.event_type
    """,
    # rank-exact p5/p95 fences, BIGINT-cents winsorized mean
    "winsorized_value_stats": """
        WITH ev AS (
          SELECT event_type, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL),
        r AS (
          SELECT event_type, v,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY v) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM ev),
        f AS (
          SELECT event_type, MAX(n) AS n,
                 MIN(CASE WHEN rn >= (n + 19) // 20 THEN v END) AS p05,
                 MIN(CASE WHEN rn >= (19 * n + 19) // 20 THEN v END)
                   AS p95
          FROM r GROUP BY event_type)
        SELECT ev.event_type, MAX(f.n) AS n,
               MAX(f.p05) AS p05, MAX(f.p95) AS p95,
               CAST(SUM(CASE WHEN ev.v < f.p05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_low,
               CAST(SUM(CASE WHEN ev.v > f.p95 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_high,
               CAST(SUM(CAST(floor(least(greatest(ev.v, f.p05), f.p95)
                                   * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 / MAX(f.n) AS winsorized_mean,
               CAST(SUM(CAST(floor(ev.v * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 / MAX(f.n) AS raw_mean
        FROM ev JOIN f ON ev.event_type = f.event_type
        GROUP BY ev.event_type
    """,
    # exact integer-microsecond gaps; ties break on event_id exactly
    # as the Spark window
    "user_interarrival_stats": """
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap_us
          FROM events),
        a AS (
          SELECT user_id, COUNT(*) AS n_gaps, SUM(gap_us) AS sum_us,
                 MIN(gap_us) AS min_us, MAX(gap_us) AS max_us
          FROM g WHERE gap_us IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_gaps,
               CAST(sum_us AS DOUBLE) / n_gaps / 1e6 AS avg_gap_s,
               CAST(min_us AS DOUBLE) / 1e6 AS min_gap_s,
               CAST(max_us AS DOUBLE) / 1e6 AS max_gap_s
        FROM a
    """,
})


# first 15 md5 hex chars as a 60-bit bigint (mirrors Spark's
# conv(substring(md5(x), 1, 15), 16, 10))
def _hex15(expr: str) -> str:
    return ("CAST(list_sum(list_transform(range(1, 16), "
            f"i -> (strpos('0123456789abcdef', substr(md5({expr}), "
            "CAST(i AS INT), 1)) - 1) "
            "* (CAST(1 AS BIGINT) << CAST(4 * (15 - i) AS INT)))) "
            "AS BIGINT)")


ORACLES.update({
    # top-3 corpus tokens derived in-query (count desc, token asc),
    # integer tf scoring, conjunction = HAVING COUNT(*) = 3
    "boolean_and_search": f"""
        WITH tok AS (
          SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        top3 AS (
          SELECT tok FROM (
            SELECT tok, SUM(tf) AS cnt FROM tf GROUP BY tok
            ORDER BY cnt DESC, tok ASC LIMIT 3)),
        hits AS (SELECT tf.* FROM tf JOIN top3 USING (tok))
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS total_tf
        FROM hits GROUP BY doc_id HAVING COUNT(*) = 3
    """,
    # integer idf milli-weights floor(1000·N/df) capped at 1e9; signed
    # per-bit sums over the SAME md5-nibble bit mapping as simhash64
    "simhash_idf": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        tc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        dict AS (SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        w AS (
          SELECT tok, md5(tok) AS h,
                 least((1000 * n_docs) // df,
                       CAST(1000000000 AS BIGINT)) AS w
          FROM dict, nd),
        bits AS (
          SELECT tc.doc_id, j,
                 ((strpos('0123456789abcdef',
                          substr(w.h, CAST(j // 4 AS INT) + 1, 1)) - 1)
                   >> CAST(3 - (j % 4) AS INT)) & 1 AS bit,
                 tc.tf, w.w
          FROM tc JOIN w USING (tok), (SELECT unnest(range(60)) AS j)),
        agg AS (
          SELECT doc_id, j,
                 SUM((2 * bit - 1) * tf * w) AS s
          FROM bits GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0
                             THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                             ELSE 0 END) AS BIGINT) AS simhash_idf
        FROM agg GROUP BY doc_id
    """,
    # one deterministic md5-derived partner per vector, hash equi-join,
    # in-order cosine fold, integer floor(cos·10) bins
    "random_pair_cos_histogram": f"""
        WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
        l AS (
          SELECT vec_id, embedding AS a,
                 (vec_id + 1
                  + ({_hex15("'cospair:' || CAST(vec_id AS VARCHAR)")}
                     % (n - 1))) % n AS partner
          FROM embeddings, n),
        pairs AS (
          SELECT l.a, r.embedding AS b
          FROM l JOIN embeddings r ON l.partner = r.vec_id),
        c AS (
          SELECT CAST(floor({_cos('a', 'b')} * 10) AS INT) AS bin
          FROM pairs),
        g AS (SELECT bin, COUNT(*) AS n_pairs FROM c GROUP BY bin)
        SELECT bin, n_pairs,
               CAST(n_pairs AS DOUBLE) / SUM(n_pairs) OVER () AS share
        FROM g
    """,
    # 11 baked milli-unit half-life weights, BIGINT-cents exact sums
    "decayed_user_value": """
        WITH a AS (SELECT MAX(CAST(ts AS DATE)) AS d_max FROM events),
        e AS (
          SELECT user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
                 (d_max - CAST(ts AS DATE)) // 7 AS wk
          FROM events, a WHERE value IS NOT NULL),
        w AS (
          SELECT user_id, c,
                 CASE WHEN wk >= 11 THEN 0
                      ELSE [1000, 500, 250, 125, 63, 31, 16, 8, 4, 2,
                            1][CAST(wk + 1 AS INT)] END AS w
          FROM e)
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(c * w) AS BIGINT) AS DOUBLE) / 1e5
                 AS decayed_value,
               CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / 100.0
                 AS raw_value
        FROM w GROUP BY user_id
    """,
})


_NDCG_W = ("[1.0, 0.6309297535714575, 0.5, 0.43067655807339306, "
           "0.38685280723454163, 0.3562071871080222, "
           "0.3333333333333333, 0.31546487678572877, "
           "0.3010299956639812, 0.2890648263178879]")

ORACLES.update({
    # same degree/triangle semantics as triangle_counts (orientation-
    # independent → naive ordered 3-join is a valid oracle); the
    # coefficient is the identical double expression
    "dup_graph_clustering_coef": f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        e AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        sym AS (
          SELECT a AS u, b AS v FROM e
          UNION ALL SELECT b, a FROM e),
        deg AS (SELECT u AS doc_id, COUNT(*) AS degree
                FROM sym GROUP BY u),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        members AS (
          SELECT unnest([x, y, z]) AS doc_id FROM tri),
        tc AS (SELECT doc_id, COUNT(*) AS n_triangles
               FROM members GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(tc.n_triangles, 0) AS BIGINT)
                 AS n_triangles,
               2.0 * COALESCE(tc.n_triangles, 0)
                 / (d.degree * (d.degree - 1)) AS clustering_coef
        FROM deg d LEFT JOIN tc USING (doc_id)
        WHERE d.degree >= 2
    """,
    # binary-relevance nDCG@10 with baked 1/log2(rank+1) gains and a
    # baked ideal-DCG constant; the gain fold runs in rank order via
    # an ordered list aggregate (both engines fold lists in order)
    "knn_lsh_ndcg": f"""
        WITH {_BUCKETS_CTE},
        qrow AS (SELECT embedding AS q, bucket AS qb
                 FROM assigned WHERE vec_id = 0),
        probes AS (
          SELECT DISTINCT CASE WHEN k = -1 THEN qb
                          ELSE xor(qb, 1 << CAST(k AS INT)) END AS bucket
          FROM qrow, (SELECT unnest(range(-1, 8)) AS k)),
        approx AS (
          SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC)
                   AS rank
          FROM (
            SELECT a.vec_id, {_cos('a.embedding', 'qrow.q')} AS cos_sim
            FROM assigned a
            JOIN probes USING (bucket)
            CROSS JOIN qrow
            WHERE a.vec_id <> 0
            ORDER BY cos_sim DESC, a.vec_id ASC
            LIMIT 10)),
        exact AS (
          SELECT e.vec_id
          FROM embeddings e,
               (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) q
          WHERE e.vec_id <> 0
          ORDER BY {_cos('e.embedding', 'q.q')} DESC, e.vec_id ASC
          LIMIT 10),
        rels AS (
          SELECT a.rank,
                 CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
          FROM approx a LEFT JOIN exact x USING (vec_id)),
        d AS (
          SELECT list_reduce(list(CAST(rel * ({_NDCG_W})[CAST(rank AS INT)]
                                    AS DOUBLE)
                               ORDER BY rank), (x, y) -> x + y) AS dcg
          FROM rels)
        SELECT CAST(10 AS INT) AS k, dcg,
               4.543559338088346 AS ideal_dcg,
               dcg / 4.543559338088346 AS ndcg
        FROM d
    """,
    # gap sessionizer CTE shared with sessionize_events; integer
    # epoch-day key, one calendar-bounded aggregate
    "session_bounce_rate": f"""
        WITH {SESSIONIZE_CTE},
        s AS (
          SELECT user_id, session_id, COUNT(*) AS n_events,
                 MIN(ts_us) AS start_us
          FROM sess GROUP BY 1, 2),
        g AS (
          SELECT strftime(DATE '1970-01-01'
                   + CAST(start_us // 86400000000 AS INT),
                   '%Y-%m-%d') AS day,
                 COUNT(*) AS n_sessions,
                 CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_bounces
          FROM s GROUP BY 1)
        SELECT day, n_sessions, n_bounces,
               CAST(n_bounces AS DOUBLE) / n_sessions AS bounce_rate
        FROM g
    """,
    # exact DECIMAL(38,0) moments; z quantized to the 1e-9 grid and
    # the flag tests the QUANTIZED value (the autocorr 1-ulp defense)
    "daily_revenue_control_chart": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        m AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(rev AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(rev AS DECIMAL(38,0))
                          * CAST(rev AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM daily),
        z AS (
          SELECT d, rev,
                 floor((CAST(rev AS DOUBLE)
                        - CAST(s1 AS DOUBLE) / n)
                       / sqrt(CAST(CAST(CAST(n AS DECIMAL(38,0)) * s2
                                   - s1 * s1 AS DECIMAL(38,0))
                                   AS DOUBLE)
                              / (CAST(n AS DOUBLE) * (n - 1)))
                       * 1e9 + 0.5) / 1e9 AS zq
          FROM daily, m)
        SELECT strftime(d, '%Y-%m-%d') AS d,
               CAST(rev AS DOUBLE) / 100.0 AS revenue,
               zq AS zscore,
               CAST(abs(zq) > 2.0 AS INT) AS is_outlier
        FROM z
    """,
})


_SIL_DIST = ("sqrt(list_sum(list_transform(range(1, 65), "
             "i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)"
             " - c.cv[CAST(i AS INT)])"
             " * (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)"
             " - c.cv[CAST(i AS INT)]))))")

ORACLES.update({
    # centroids re-derived with the SAME two-level order-canonical
    # fold as the label_centroids oracle (bit-identical doubles);
    # per-point distances are the same in-order folds, min over other
    # centroids is order-independent, label means block-fold
    "label_centroid_silhouette": f"""
        WITH ex AS (
          SELECT label, vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        cblk AS (
          SELECT label, dim, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb
          FROM ex GROUP BY label, dim, blk),
        cent AS (
          SELECT label, dim,
                 list_sum(list(bsum ORDER BY blk))
                   / CAST(SUM(nb) AS BIGINT) AS centroid
          FROM cblk GROUP BY label, dim),
        cl AS (
          SELECT label, list(centroid ORDER BY dim) AS cv
          FROM cent GROUP BY label),
        d AS (
          SELECT e.vec_id, e.label AS olabel, c.label AS clabel,
                 {_SIL_DIST} AS dist
          FROM embeddings e CROSS JOIN cl c),
        ab AS (
          SELECT vec_id, olabel AS label,
                 MAX(CASE WHEN clabel = olabel THEN dist END) AS a,
                 MIN(CASE WHEN clabel <> olabel THEN dist END) AS b
          FROM d GROUP BY vec_id, olabel),
        s AS (
          SELECT label, vec_id,
                 CASE WHEN greatest(a, b) = 0 THEN 0.0
                      ELSE (b - a) / greatest(a, b) END AS x
          FROM ab),
        blk AS (
          SELECT label, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb
          FROM s GROUP BY 1, 2)
        SELECT label, CAST(SUM(nb) AS BIGINT) AS n,
               list_sum(list(bsum ORDER BY blk))
                 / CAST(SUM(nb) AS BIGINT) AS mean_silhouette
        FROM blk GROUP BY label
    """,
    # distinct (session, type) baskets off the shared sessionizer;
    # integer-exact counts, identical double chains for support/lift
    "session_type_affinity": f"""
        WITH {SESSIONIZE_CTE},
        basket AS (
          SELECT DISTINCT s.user_id, s.session_id, e.event_type
          FROM sess s JOIN events e USING (event_id)),
        tot AS (
          SELECT COUNT(*) AS n_sessions FROM (
            SELECT DISTINCT user_id, session_id FROM basket)),
        na AS (
          SELECT event_type, COUNT(*) AS n_type
          FROM basket GROUP BY event_type),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 COUNT(*) AS n_both
          FROM basket a
          JOIN basket b ON a.user_id = b.user_id
                       AND a.session_id = b.session_id
                       AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT p.type_a, p.type_b, p.n_both,
               x.n_type AS n_a, y.n_type AS n_b, t.n_sessions,
               CAST(p.n_both AS DOUBLE) / t.n_sessions AS support,
               CAST(p.n_both AS DOUBLE) * t.n_sessions
                 / (CAST(x.n_type AS DOUBLE) * y.n_type) AS lift
        FROM pairs p
        JOIN na x ON x.event_type = p.type_a
        JOIN na y ON y.event_type = p.type_b
        CROSS JOIN tot t
    """,
})


_W_INT = ("((CAST(list_sum(list_transform(range(1, 9), "
          "i -> (strpos('0123456789abcdef', substr(md5(x), "
          "CAST(i AS INT), 1)) - 1) "
          "* (CAST(1 AS BIGINT) << CAST(4 * (8 - i) AS INT)))) "
          "AS BIGINT) % 1024) * 2654435761) % 1024 - 512")

ORACLES.update({
    # same hash-trick weight function as hashed_classifier_score's
    # oracle; integer bin via v - v mod 64 (matches Spark's pmod on
    # non-negative-width bins for negative values too: pmod ≥ 0)
    "classifier_score_calibration": f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks FROM documents),
        s AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(toks,
                     x -> {_W_INT})) AS BIGINT) AS w_sum
          FROM d),
        q AS (
          SELECT doc_id,
                 CAST(len(toks) >= 30
                  AND list_sum(list_transform(toks, x -> length(x)))
                        <= 8 * len(toks)
                  AND len(list_filter(toks,
                        x -> x IN ('the','a','of','and','to','in'))) > 0
                  AND 10 * len(list_distinct(toks)) >= len(toks)
                  AS INT) AS keep
          FROM d),
        j AS (
          SELECT s.w_sum - ((s.w_sum % 64 + 64) % 64) AS bin_lo,
                 s.w_sum, q.keep
          FROM s JOIN q USING (doc_id))
        SELECT bin_lo, COUNT(*) AS n_docs,
               CAST(SUM(keep) AS DOUBLE) / COUNT(*) AS keep_rate,
               CAST(CAST(SUM(w_sum) AS BIGINT) AS DOUBLE) / COUNT(*)
                 AS mean_w_sum
        FROM j GROUP BY bin_lo
    """,
    "dup_rate_by_length": """
        WITH d AS (
          SELECT n_chars, md5(text) AS h FROM documents),
        m AS (
          SELECT n_chars - ((n_chars % 256 + 256) % 256) AS len_bin,
                 CAST(COUNT(*) OVER (PARTITION BY h) > 1 AS BIGINT)
                   AS is_dup
          FROM d)
        SELECT len_bin, COUNT(*) AS n_docs,
               CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
               CAST(CAST(SUM(is_dup) AS BIGINT) AS DOUBLE) / COUNT(*)
                 AS dup_rate
        FROM m GROUP BY len_bin
    """,
    # contamination CTE mirrors contamination_overlap's oracle; the
    # keep test is exact integer arithmetic (2·nc ≤ ns)
    "decontaminated_corpus_stats": f"""
        WITH d0 AS (
          SELECT doc_id, source, {TOKS} AS toks FROM documents),
        d AS (
          SELECT doc_id, source,
                 unnest(list_distinct(list_transform(
                   range(0, len(toks) - 2),
                   i -> toks[i + 1] || ' ' || toks[i + 2] || ' '
                        || toks[i + 3]))) AS shingle
          FROM d0 WHERE len(toks) >= 3),
        sdict AS (
          SELECT shingle, COUNT(DISTINCT source) AS n_sources,
                 MIN(source) AS only_source
          FROM d GROUP BY shingle),
        ov AS (
          SELECT d.doc_id, d.source,
                 COUNT(*) AS n_shingles,
                 SUM(CASE WHEN s.n_sources > 1
                          OR s.only_source <> d.source
                          THEN 1 ELSE 0 END) AS n_contaminated
          FROM d JOIN sdict s USING (shingle)
          GROUP BY d.doc_id, d.source),
        tk AS (
          SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens FROM d0),
        j AS (
          SELECT ov.source, ov.n_shingles, ov.n_contaminated,
                 tk.n_tokens,
                 CAST(2 * ov.n_contaminated <= ov.n_shingles
                      AS BIGINT) AS keep_i
          FROM ov JOIN tk USING (doc_id))
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(keep_i) AS BIGINT) AS n_kept,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(keep_i * n_tokens) AS BIGINT) AS n_kept_tokens,
               CAST(CAST(SUM(keep_i) AS BIGINT) AS DOUBLE) / COUNT(*)
                 AS doc_keep_rate,
               CAST(CAST(SUM(keep_i * n_tokens) AS BIGINT) AS DOUBLE)
                 / CAST(SUM(n_tokens) AS BIGINT) AS token_keep_rate
        FROM j GROUP BY source
    """,
    # rank-exact 5%-grid quantiles of both samples side by side
    "value_qq_table": """
        WITH ev AS (
          SELECT event_type, CAST(value AS DOUBLE) AS v
          FROM events
          WHERE value IS NOT NULL
            AND event_type IN ('click', 'purchase')),
        r AS (
          SELECT event_type, v,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY v) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM ev),
        q AS (
          SELECT event_type, g.k * 5 AS pct,
                 MIN(CASE WHEN rn >= (g.k * n + 19) // 20 THEN v END)
                   AS q
          FROM r, (SELECT unnest(range(1, 20)) AS k) g
          GROUP BY event_type, g.k)
        SELECT a.pct, a.q AS q_click, b.q AS q_purchase,
               b.q - a.q AS gap
        FROM q a JOIN q b ON a.pct = b.pct
        WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
})


ORACLES.update({
    # sweep line with the identical (us asc, delta asc) tie rule and
    # per-day carry-in of midnight-spanning sessions
    "peak_concurrent_sessions": f"""
        WITH {SESSIONIZE_CTE},
        sp AS (
          SELECT user_id, session_id,
                 MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
          FROM sess GROUP BY 1, 2),
        b AS (
          SELECT start_us // 86400000000 AS sd, start_us,
                 end_us // 86400000000 AS ed, end_us
          FROM sp),
        sweep AS (
          SELECT sd AS day, start_us AS us, 1 AS delta FROM b
          UNION ALL
          SELECT ed, end_us + 1, -1 FROM b),
        run AS (
          SELECT day,
                 SUM(delta) OVER (PARTITION BY day
                                  ORDER BY us ASC, delta ASC
                                  ROWS UNBOUNDED PRECEDING) AS c
          FROM sweep),
        peak AS (SELECT day, MAX(c) AS peak_in_day FROM run GROUP BY day),
        carry AS (
          SELECT unnest(range(sd + 1, ed + 1)) AS day
          FROM b WHERE ed > sd),
        cg AS (SELECT day, COUNT(*) AS carry_in FROM carry GROUP BY day)
        SELECT strftime(DATE '1970-01-01' + CAST(p.day AS INT),
                        '%Y-%m-%d') AS day,
               CAST(COALESCE(cg.carry_in, 0) AS BIGINT) AS carry_in,
               CAST(p.peak_in_day + COALESCE(cg.carry_in, 0) AS BIGINT)
                 AS peak_concurrent
        FROM peak p LEFT JOIN cg ON p.day = cg.day
    """,
    # rank-exact conversion-time order statistics over whole seconds
    "funnel_convert_time_quantiles": """
        WITH s AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup'
                          THEN epoch_us(ts) END) AS first_signup_us
          FROM events GROUP BY user_id),
        p AS (
          SELECT e.user_id, MIN(epoch_us(e.ts))
                   AS first_purchase_after_us
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase'
            AND epoch_us(e.ts) > s.first_signup_us
          GROUP BY e.user_id),
        conv AS (
          SELECT (p.first_purchase_after_us - s.first_signup_us)
                   // 1000000 AS secs
          FROM s JOIN p USING (user_id)
          WHERE s.first_signup_us IS NOT NULL),
        r AS (
          SELECT secs,
                 ROW_NUMBER() OVER (ORDER BY secs) AS rn,
                 COUNT(*) OVER () AS n
          FROM conv)
        SELECT MAX(n) AS n_converted,
               CAST(MIN(CASE WHEN rn >= (n + 3) // 4 THEN secs END)
                    AS BIGINT) AS p25_s,
               CAST(MIN(CASE WHEN rn >= (n + 1) // 2 THEN secs END)
                    AS BIGINT) AS p50_s,
               CAST(MIN(CASE WHEN rn >= (3 * n + 3) // 4 THEN secs END)
                    AS BIGINT) AS p75_s,
               CAST(MIN(CASE WHEN rn >= (9 * n + 9) // 10 THEN secs END)
                    AS BIGINT) AS p90_s
        FROM r
    """,
})


ORACLES.update({
    # recall@10 per probe budget over the SAME seed-centroid IVF as
    # knn_ivf's oracle; nprobe = 8 probes every cluster (= brute force)
    "ivf_probe_sweep": f"""
        WITH q AS (SELECT embedding AS q FROM embeddings
                   WHERE vec_id = 0),
        cent AS (SELECT vec_id AS centroid_id, embedding AS cvec
                 FROM embeddings WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id, label, embedding, centroid_id FROM (
            SELECT e.vec_id, e.label, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent c)
          WHERE rn = 1),
        exact AS (
          SELECT vec_id FROM embeddings, q
          WHERE vec_id <> 0
          ORDER BY {_cos('embedding', 'q')} DESC, vec_id ASC
          LIMIT 10),
        p1 AS (
          SELECT centroid_id FROM cent, q
          ORDER BY {_cos('cvec', 'q')} DESC, centroid_id ASC
          LIMIT 1),
        h1 AS (
          SELECT a.vec_id
          FROM assigned a JOIN p1 USING (centroid_id)
          CROSS JOIN q
          WHERE a.vec_id <> 0
          ORDER BY {_cos('a.embedding', 'q.q')} DESC, a.vec_id ASC
          LIMIT 10),
        r1 AS (
          SELECT 1 AS nprobe, COUNT(*) AS n_hits
          FROM h1 JOIN exact USING (vec_id)),
        p2 AS (
          SELECT centroid_id FROM cent, q
          ORDER BY {_cos('cvec', 'q')} DESC, centroid_id ASC
          LIMIT 2),
        h2 AS (
          SELECT a.vec_id
          FROM assigned a JOIN p2 USING (centroid_id)
          CROSS JOIN q
          WHERE a.vec_id <> 0
          ORDER BY {_cos('a.embedding', 'q.q')} DESC, a.vec_id ASC
          LIMIT 10),
        r2 AS (
          SELECT 2 AS nprobe, COUNT(*) AS n_hits
          FROM h2 JOIN exact USING (vec_id)),
        p4 AS (
          SELECT centroid_id FROM cent, q
          ORDER BY {_cos('cvec', 'q')} DESC, centroid_id ASC
          LIMIT 4),
        h4 AS (
          SELECT a.vec_id
          FROM assigned a JOIN p4 USING (centroid_id)
          CROSS JOIN q
          WHERE a.vec_id <> 0
          ORDER BY {_cos('a.embedding', 'q.q')} DESC, a.vec_id ASC
          LIMIT 10),
        r4 AS (
          SELECT 4 AS nprobe, COUNT(*) AS n_hits
          FROM h4 JOIN exact USING (vec_id)),
        p8 AS (
          SELECT centroid_id FROM cent, q
          ORDER BY {_cos('cvec', 'q')} DESC, centroid_id ASC
          LIMIT 8),
        h8 AS (
          SELECT a.vec_id
          FROM assigned a JOIN p8 USING (centroid_id)
          CROSS JOIN q
          WHERE a.vec_id <> 0
          ORDER BY {_cos('a.embedding', 'q.q')} DESC, a.vec_id ASC
          LIMIT 10),
        r8 AS (
          SELECT 8 AS nprobe, COUNT(*) AS n_hits
          FROM h8 JOIN exact USING (vec_id)),
        u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
              UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r8)
        SELECT CAST(nprobe AS INT) AS nprobe,
               CAST(n_hits AS INT) AS n_hits,
               n_hits / 10 AS recall_at_k
        FROM u
    """,
})


ORACLES.update({
    # sha256 over the raw payload bytes in both engines
    "multimodal_content_dedup": """
        -- DuckDB sha256 takes VARCHAR and hashes its UTF-8 bytes =
        -- Spark's sha2(encode(text,'UTF-8'), 256)
        SELECT sha256(text) AS sha256,
               MIN(doc_id) AS canonical_doc_id,
               COUNT(*) AS n_copies,
               CAST(MAX(octet_length(encode(text))) AS INT)
                 AS payload_bytes,
               CAST(COUNT(*) > 1 AS INT) AS is_dup
        FROM documents
        GROUP BY 1
    """,
})


ORACLES.update({
    # integer-exact CUSUM argmax (|C| desc, earliest day), the same
    # n-scaled DECIMAL(38,0) arithmetic as the Spark plan
    "revenue_changepoint": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        tot AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(rev AS DECIMAL(38,0))) AS s1
          FROM daily),
        cum AS (
          SELECT d,
                 SUM(CAST(rev AS DECIMAL(38,0)))
                   OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cs,
                 ROW_NUMBER() OVER (ORDER BY d) AS t
          FROM daily),
        c AS (
          SELECT cum.d, tot.n,
                 CAST(CAST(tot.n AS DECIMAL(38,0)) * cum.cs
                      - CAST(cum.t AS DECIMAL(38,0)) * tot.s1
                      AS DECIMAL(38,0)) AS c
          FROM cum, tot)
        SELECT strftime(d, '%Y-%m-%d') AS changepoint_day,
               CAST(n AS BIGINT) AS n_days,
               CAST(c AS DOUBLE) / n / 100.0 AS cusum_dollars
        FROM c
        ORDER BY abs(c) DESC, d ASC
        LIMIT 1
    """,
})


ORACLES.update({
    # byte 4-gram (8 hex chars, step 2) simhash over the payload hex
    # rendering; same md5-nibble bit mapping as simhash64
    "payload_simhash": """
        WITH d AS (
          SELECT doc_id, hex(encode(text)) AS h FROM documents),
        tok AS (
          SELECT doc_id, substr(h, CAST(i AS INT), 8) AS tok
          FROM d, unnest(range(1, len(h) - 7 + 1, 2)) AS u(i)),
        tc AS (
          SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        th AS (SELECT doc_id, md5(tok) AS mh, cnt FROM tc),
        bits AS (
          SELECT doc_id, j,
                 ((strpos('0123456789abcdef',
                          substr(mh, CAST(j // 4 AS INT) + 1, 1)) - 1)
                   >> CAST(3 - (j % 4) AS INT)) & 1 AS bit,
                 cnt
          FROM th, (SELECT unnest(range(60)) AS j)),
        agg AS (
          SELECT doc_id, j, SUM((2 * bit - 1) * cnt) AS s
          FROM bits GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0
                             THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                             ELSE 0 END) AS BIGINT) AS payload_simhash
        FROM agg GROUP BY doc_id
    """,
})


ORACLES.update({
    # micro-nat-quantized per-term entropy, integer sums per user
    "user_behavior_entropy": """
        WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        n AS (
          SELECT user_id, c,
                 SUM(c) OVER (PARTITION BY user_id) AS n,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_types
          FROM c),
        u AS (
          SELECT user_id, n, n_types,
                 CAST(floor(c * ln(n / CAST(c AS DOUBLE))
                            * 1000000 + 0.5) AS BIGINT) AS u
          FROM n)
        SELECT user_id,
               CAST(MAX(n) AS BIGINT) AS n_events,
               CAST(MAX(n_types) AS BIGINT) AS n_types,
               CAST(CAST(SUM(u) AS BIGINT) AS DOUBLE) / 1000000
                 / MAX(n) AS entropy
        FROM u GROUP BY user_id
    """,
})


ORACLES.update({
    # identical Wilson-lower-bound IEEE chain; on-time = shipped
    # within 30 days of order date (integer date arithmetic)
    "supplier_ontime_wilson": """
        WITH j AS (
          SELECT l.l_suppkey,
                 CASE WHEN CAST(l.l_shipdate AS DATE)
                           - CAST(o.o_orderdate AS DATE) <= 30
                      THEN 1 ELSE 0 END AS ontime
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey),
        g AS (
          SELECT l_suppkey AS suppkey, COUNT(*) AS n,
                 CAST(SUM(ontime) AS BIGINT) AS k
          FROM j GROUP BY 1)
        SELECT suppkey, n AS n_shipments, k AS n_ontime,
               CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ontime_rate,
               ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                 + (1.96 * 1.96 / CAST(n AS DOUBLE)) / 2
                 - 1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                               * (1 - CAST(k AS DOUBLE)
                                      / CAST(n AS DOUBLE))
                               / CAST(n AS DOUBLE)
                               + (1.96 * 1.96 / CAST(n AS DOUBLE))
                                 / (4 * CAST(n AS DOUBLE))))
                / (1 + 1.96 * 1.96 / CAST(n AS DOUBLE)))
                 AS wilson_lower
        FROM g
    """,
})


ORACLES.update({
    # one row per rule in the standard orders load-gate suite; the
    # UNION mirrors run_expectations' rule order and arithmetic
    "orders_expectations": """
        WITH u AS (
          SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 END), 0)
                      AS BIGINT) AS v
          FROM (SELECT o_orderkey, COUNT(*) AS c
                FROM orders GROUP BY o_orderkey)),
        fk AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS v
          FROM orders o
          WHERE o.o_custkey IS NOT NULL
            AND o.o_custkey NOT IN
                (SELECT c_custkey FROM customer
                 WHERE c_custkey IS NOT NULL))
        SELECT 0 AS rule_id, 'not_null' AS rule,
               'o_orderkey' AS "column",
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    = 0 AS INT) AS passed
        FROM orders
        UNION ALL
        SELECT 1, 'unique', 'o_orderkey', v, CAST(v = 0 AS INT) FROM u
        UNION ALL
        SELECT 2, 'not_null', 'o_totalprice',
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0
                        END) AS BIGINT),
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0
                        END) = 0 AS INT)
        FROM orders
        UNION ALL
        SELECT 3, 'range', 'o_totalprice',
               CAST(SUM(CASE WHEN o_totalprice < 0.0
                             OR o_totalprice > 1e9
                             OR o_totalprice IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN o_totalprice < 0.0
                             OR o_totalprice > 1e9
                             OR o_totalprice IS NULL
                             THEN 1 ELSE 0 END) = 0 AS INT)
        FROM orders
        UNION ALL
        SELECT 4, 'in_set', 'o_orderstatus',
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                             OR o_orderstatus IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                             OR o_orderstatus IS NULL
                             THEN 1 ELSE 0 END) = 0 AS INT)
        FROM orders
        UNION ALL
        SELECT 5, 'fk', 'o_custkey', v, CAST(v = 0 AS INT) FROM fk
    """,
})


ORACLES.update({
    # same literals and the same digit-ordered fold for the chi² sum
    "benford_chi2_by_priority": """
        WITH g AS (
          SELECT o_orderpriority,
                 CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                      AS BIGINT) AS VARCHAR), 1, 1)
                      AS INT) AS digit,
                 COUNT(*) AS n
          FROM orders WHERE o_totalprice > 0 GROUP BY 1, 2),
        e(digit, e) AS (VALUES
          (1, 0.3010299956639812), (2, 0.17609125905568124),
          (3, 0.12493873660829992), (4, 0.09691001300805642),
          (5, 0.07918124604762482), (6, 0.06694678963061322),
          (7, 0.05799194697768673), (8, 0.05115252244738129),
          (9, 0.04575749056067514)),
        cells AS (
          -- VALUES literals bind as DECIMAL in DuckDB; cast to DOUBLE
          -- so e*total is IEEE math like Spark's, not exact decimal
          SELECT g.o_orderpriority, g.digit, g.n,
                 CAST(e.e AS DOUBLE) AS e,
                 SUM(g.n) OVER (PARTITION BY g.o_orderpriority)
                   AS total
          FROM g JOIN e ON g.digit = e.digit)
        SELECT o_orderpriority AS priority,
               CAST(MAX(total) AS BIGINT) AS n_orders,
               list_sum(list(
                 (n - e * total) * (n - e * total) / (e * total)
                 ORDER BY digit)) AS benford_chi2
        FROM cells GROUP BY o_orderpriority
    """,
})


ORACLES.update({
    # decimal-exact per-segment MoM deltas; only the share divides
    "mom_delta_by_segment": f"""
        WITH g AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 c_mktsegment,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                      AS DECIMAL(38,6)) AS rev
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        seg AS (
          SELECT month, c_mktsegment, rev,
                 CAST(rev - COALESCE(LAG(rev) OVER (
                        PARTITION BY c_mktsegment ORDER BY month),
                      CAST(0 AS DECIMAL(38,6))) AS DECIMAL(38,6))
                   AS seg_delta
          FROM g),
        m AS (
          SELECT month, c_mktsegment, rev, seg_delta,
                 CAST(SUM(seg_delta) OVER (PARTITION BY month)
                      AS DECIMAL(38,6)) AS tot
          FROM seg)
        SELECT month, c_mktsegment,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(seg_delta AS DOUBLE) AS seg_delta,
               CAST(tot AS DOUBLE) AS month_delta,
               CASE WHEN tot <> 0
                    THEN CAST(seg_delta AS DOUBLE)
                         / CAST(tot AS DOUBLE)
                    ELSE NULL END AS delta_share
        FROM m
    """,
})


ORACLES.update({
    # same Poisson-null threshold chain: mu = sum/hours (one
    # rational), flag n > mu + 3*sqrt(mu)
    "event_rate_spikes": """
        WITH h AS (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00')
                   AS hour,
                 event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT hour, event_type, n,
                 CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY event_type) AS mu
          FROM h)
        SELECT hour, event_type, n, mu,
               CAST(n > mu + 3 * sqrt(mu) AS INT) AS is_spike
        FROM s
    """,
})


ORACLES.update({
    # centroids via the same two-level fold; in-order distance folds
    "centroid_distance_matrix": """
        WITH ex AS (
          SELECT label, vec_id, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        cblk AS (
          SELECT label, dim, vec_id // 256 AS blk,
                 list_sum(list(x ORDER BY vec_id)) AS bsum,
                 COUNT(*) AS nb
          FROM ex GROUP BY label, dim, blk),
        cent AS (
          SELECT label, dim,
                 list_sum(list(bsum ORDER BY blk))
                   / CAST(SUM(nb) AS BIGINT) AS centroid,
                 CAST(SUM(nb) AS BIGINT) AS n
          FROM cblk GROUP BY label, dim),
        cl AS (
          SELECT label, list(centroid ORDER BY dim) AS cv,
                 MAX(n) AS n
          FROM cent GROUP BY label)
        SELECT a.label AS label_a, b.label AS label_b,
               a.n AS n_a, b.n AS n_b,
               sqrt(list_sum(list_transform(range(1, 65),
                 i -> (a.cv[CAST(i AS INT)] - b.cv[CAST(i AS INT)])
                      * (a.cv[CAST(i AS INT)]
                         - b.cv[CAST(i AS INT)])))) AS dist
        FROM cl a JOIN cl b ON a.label < b.label
    """,
})


from .operators.dedup import KCORE_KS, KCORE_ROUNDS  # noqa: E402


def _kcore_sql() -> str:
    # unrolls the SAME fixed peeling rounds as the Spark loop: round
    # r keeps nodes whose degree among round-(r-1) survivors ≥ k.
    # Every multiply-referenced CTE is MATERIALIZED — DuckDB inlines
    # plain CTEs, and each round referencing its predecessor twice
    # would otherwise expand the whole LSH pipeline 2^rounds times
    # (observed as a too-many-open-files parquet storm)
    blocks = [
        "sym AS MATERIALIZED (SELECT a AS u, b AS v FROM e "
        "UNION ALL SELECT b, a FROM e)",
        "a_all AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym)",
    ]
    selects = []
    for k in KCORE_KS:
        prev = "a_all"
        for r in range(1, KCORE_ROUNDS + 1):
            cte = f"a{k}_{r}"
            blocks.append(
                f"{cte} AS MATERIALIZED (SELECT u AS node FROM sym "
                f"JOIN {prev} x ON x.node = sym.u "
                f"JOIN {prev} y ON y.node = sym.v "
                f"GROUP BY u HAVING COUNT(*) >= {k})")
            prev = cte
        selects.append(
            f"SELECT CAST({k} AS INTEGER) AS k, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {prev}) "
            f"AS n_core_nodes, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM e "
            f"JOIN {prev} x ON x.node = e.a "
            f"JOIN {prev} y ON y.node = e.b) AS n_core_edges")
    return (f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        e AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        """ + ",\n        ".join(blocks) + "\n        "
        + "\n        UNION ALL ".join(selects))


ORACLES.update({
    "kcore_dup_graph": _kcore_sql(),
})


from .operators.analytics import (KMV_K, KMV_SPACE,  # noqa: E402
                                  _hex_prefix_value)
from .operators.relational import SEASONAL_Z_MILLI  # noqa: E402
from .operators.text import (SKIPGRAM_MIN_COUNT,  # noqa: E402
                             SKIPGRAM_TOP_K)
from .operators.windows import EWMA_MICRO  # noqa: E402

_EWMA_VALUES = ", ".join(f"({lag}, {w})"
                         for lag, w in enumerate(EWMA_MICRO))

ORACLES.update({
    # identical hex-prefix integerization + tie-break on the full hex
    # string; estimate arithmetic written with the same literals
    "kmv_distinct_users": f"""
        WITH h AS (
          SELECT DISTINCT md5('kmv|' || CAST(user_id AS VARCHAR)) AS hx
          FROM events),
        v AS (SELECT hx, {_hex_prefix_value('hx')} AS v FROM h),
        bottom AS (
          SELECT * FROM v ORDER BY v ASC, hx ASC LIMIT {KMV_K}),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seen,
                       MAX(v) AS vk
                FROM bottom)
        SELECT CAST({KMV_K} AS INTEGER) AS k, n_seen, vk,
               CASE WHEN n_seen < {KMV_K} THEN CAST(n_seen AS DOUBLE)
                    ELSE {float(KMV_K - 1)} * {float(KMV_SPACE)} / vk
               END AS est_distinct
        FROM agg
    """,
    # gap-g pairs from positional indexing over the same tokens; the
    # unique (cnt desc, x, y, gap) sort key pins the rank boundary
    "skipgram_pairs": f"""
        WITH d AS (
          SELECT {TOKS} AS tk FROM documents),
        pg AS (
          SELECT tk[i] AS x, tk[i + 1] AS y, 1 AS gap
          FROM d, unnest(generate_series(1, len(tk) - 1)) AS u(i)
          UNION ALL
          SELECT tk[i], tk[i + 2], 2
          FROM d, unnest(generate_series(1, len(tk) - 2)) AS u(i))
        SELECT x, y, CAST(gap AS INTEGER) AS gap,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pg GROUP BY x, y, gap
        HAVING COUNT(*) >= {SKIPGRAM_MIN_COUNT}
        ORDER BY cnt DESC, x ASC, y ASC, gap ASC
        LIMIT {SKIPGRAM_TOP_K}
    """,
    # same baked micro-weights, same 26+7-digit decimal product
    "ewma_daily_revenue": f"""
        WITH daily AS (
          SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                      AS BIGINT) AS eday,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rc
          FROM orders GROUP BY 1),
        w(lag, wt) AS (VALUES {_EWMA_VALUES}),
        contrib AS (
          SELECT d.eday + w.lag AS tday,
                 CAST(d.rc AS DECIMAL(26,0))
                   * CAST(w.wt AS DECIMAL(7,0)) AS x
          FROM daily d CROSS JOIN w),
        g AS (
          SELECT tday, CAST(SUM(x) AS DECIMAL(38,0)) AS wsum
          FROM contrib GROUP BY tday)
        SELECT strftime(DATE '1970-01-01' + CAST(d.eday AS INT),
                        '%Y-%m-%d') AS day,
               CAST(d.rc AS DOUBLE) / 100.0 AS revenue,
               CAST(g.wsum AS DOUBLE) / 100000000.0 AS ewma
        FROM daily d JOIN g ON g.tday = d.eday
    """,
    # same scaled-residual integers, same milli-z double chain
    "seasonal_residual_outliers": f"""
        WITH daily AS (
          SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-05'
                      AS BIGINT) AS eday,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rc
          FROM orders GROUP BY 1),
        dw AS (
          SELECT eday, rc, CAST(eday % 7 AS INTEGER) AS weekday
          FROM daily),
        ws AS (
          SELECT weekday, CAST(COUNT(*) AS BIGINT) AS n_w,
                 SUM(rc) AS s_w
          FROM dw GROUP BY weekday),
        resid AS (
          SELECT dw.eday, dw.rc, dw.weekday, ws.n_w,
                 CAST(CAST(ws.n_w AS DECIMAL(9,0))
                        * CAST(dw.rc AS DECIMAL(19,0))
                      - CAST(ws.s_w AS DECIMAL(28,0))
                      AS DECIMAL(19,0)) AS d
          FROM dw JOIN ws ON ws.weekday = dw.weekday),
        sd AS (
          SELECT weekday, CAST(SUM(d * d) AS DECIMAL(38,0)) AS sd2
          FROM resid GROUP BY weekday),
        z AS (
          SELECT r.*, sd.sd2,
                 CASE WHEN sd.sd2 = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(floor(CAST(r.d AS DOUBLE)
                             / sqrt(CAST(sd.sd2 AS DOUBLE) / r.n_w)
                             * 1000 + 0.5) AS BIGINT)
                 END AS milli_z
          FROM resid r JOIN sd ON sd.weekday = r.weekday)
        SELECT strftime(DATE '1970-01-05' + CAST(eday AS INT),
                        '%Y-%m-%d') AS day,
               weekday,
               CAST(rc AS DOUBLE) / 100.0 AS revenue,
               milli_z,
               abs(milli_z) > {SEASONAL_Z_MILLI} AS is_outlier
        FROM z
    """,
})

ORACLES.update({
    # identical fence ranks, cents grid, and tie-exact boundary-copy
    # arithmetic; the degenerate lo==hi fence takes the closed form
    "trimmed_mean_by_type": """
        WITH c AS (
          SELECT event_type, CAST(value AS DOUBLE) AS v, COUNT(*) AS c
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type, CAST(value AS DOUBLE)),
        cum AS (
          SELECT event_type, v,
                 CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cf,
                 CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
          FROM c),
        f AS (
          SELECT event_type, MAX(n) AS n,
                 MIN(CASE WHEN cf >= n // 10 + 1 THEN v END) AS lo,
                 MIN(CASE WHEN cf >= n - n // 10 THEN v END) AS hi
          FROM cum GROUP BY event_type),
        e AS (
          SELECT event_type, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL),
        g AS (
          SELECT e.event_type, MAX(f.n) AS n,
                 MAX(f.lo) AS lo, MAX(f.hi) AS hi,
                 CAST(SUM(CASE WHEN e.v > f.lo AND e.v < f.hi
                   THEN CAST(floor(e.v * 100 + 0.5) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS mid,
                 CAST(SUM(CASE WHEN e.v <= f.lo THEN 1 ELSE 0 END)
                   AS BIGINT) AS cf_lo,
                 CAST(SUM(CASE WHEN e.v < f.hi THEN 1 ELSE 0 END)
                   AS BIGINT) AS lt_hi
          FROM e JOIN f USING (event_type) GROUP BY e.event_type)
        SELECT event_type, n, n // 10 AS k_trim, lo, hi,
               CAST(CASE WHEN lo < hi
                 THEN mid
                   + (cf_lo - n // 10)
                     * CAST(floor(lo * 100 + 0.5) AS BIGINT)
                   + (n - n // 10 - lt_hi)
                     * CAST(floor(hi * 100 + 0.5) AS BIGINT)
                 ELSE (n - 2 * (n // 10))
                   * CAST(floor(lo * 100 + 0.5) AS BIGINT)
               END AS DOUBLE) / 100.0 / (n - 2 * (n // 10))
               AS trimmed_mean
        FROM g
    """,
})

ORACLES.update({
    # same integer cents DIV/remainder split, same recency tie-break
    "linear_touch_attribution": """
        WITH pur AS (
          SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        clk AS (
          SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_us,
                 strftime(ts, '%Y-%m-%d') AS day
          FROM events WHERE event_type = 'click'),
        j AS (
          SELECT p.p_id, p.cents, c.c_id, c.c_us, c.day
          FROM pur p JOIN clk c ON c.user_id = p.user_id
          WHERE c.c_us < p.p_us
            AND c.c_us >= p.p_us - 604800000000),
        r AS (
          SELECT *,
                 COUNT(*) OVER (PARTITION BY p_id) AS n_touch,
                 ROW_NUMBER() OVER (PARTITION BY p_id
                   ORDER BY c_us DESC, c_id ASC) AS rk
          FROM j),
        cred AS (
          SELECT day, p_id,
                 cents // n_touch
                 + CASE WHEN rk = 1 THEN cents % n_touch ELSE 0 END
                 AS credit
          FROM r)
        SELECT day,
               COUNT(*) AS n_credited_clicks,
               COUNT(DISTINCT p_id) AS n_purchases,
               CAST(SUM(credit) AS BIGINT) AS credited_cents,
               CAST(CAST(SUM(credit) AS BIGINT) AS DOUBLE) / 100.0
                 AS credited_value
        FROM cred GROUP BY day
    """,
})

from .operators.relational import TRIPLE_MIN_SUPPORT  # noqa: E402

ORACLES.update({
    # same sorted-triple generation (x < y < z), same double chain
    "part_triple_affinity": f"""
        WITH base AS (
          SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey
          FROM lineitem),
        n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM base),
        cxs AS (SELECT pkey, COUNT(*) AS c FROM base GROUP BY pkey),
        tri AS (
          SELECT a.pkey AS x, b.pkey AS y, c.pkey AS z,
                 COUNT(*) AS c3
          FROM base a
          JOIN base b ON b.okey = a.okey AND a.pkey < b.pkey
          JOIN base c ON c.okey = a.okey AND b.pkey < c.pkey
          GROUP BY a.pkey, b.pkey, c.pkey
          HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT})
        SELECT x, y, z, CAST(c3 AS BIGINT) AS c3,
               CAST(ca.c AS BIGINT) AS cx,
               CAST(cb.c AS BIGINT) AS cy,
               CAST(cc.c AS BIGINT) AS cz,
               CAST(c3 AS DOUBLE) / n_orders AS support,
               CAST(n_orders AS DOUBLE) * n_orders * c3
                 / (CAST(ca.c AS DOUBLE) * cb.c * cc.c) AS lift
        FROM tri
        JOIN cxs ca ON ca.pkey = x
        JOIN cxs cb ON cb.pkey = y
        JOIN cxs cc ON cc.pkey = z
        CROSS JOIN n
    """,
})

ORACLES.update({
    # same trailing-window coverage, expressed as a range join
    "rolling_7d_active_users": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS eday
          FROM events),
        days AS (SELECT DISTINCT eday FROM ud)
        SELECT strftime(DATE '1970-01-01' + CAST(d.eday AS INT),
                        '%Y-%m-%d') AS day,
               COUNT(DISTINCT u.user_id) AS rolling_7d_users,
               COUNT(DISTINCT CASE WHEN u.eday = d.eday
                              THEN u.user_id END) AS dau
        FROM days d
        JOIN ud u ON u.eday BETWEEN d.eday - 6 AND d.eday
        GROUP BY d.eday
    """,
})

from .operators.text import TRUNC_CTXS, VOCAB_COVERAGE_KS  # noqa: E402

ORACLES.update({
    # rank formulation with the same cents grid; SUM(rn*cents) is
    # tie-invariant so the single window agrees with the decomposition
    "customer_spend_gini": """
        WITH s AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                   AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY o_custkey),
        r AS (
          SELECT cents,
                 ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rn
          FROM s)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(2 * SUM(CAST(rn AS HUGEINT) * cents)
                    - (COUNT(*) + 1) * SUM(cents) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE)
                  * CAST(SUM(cents) AS DOUBLE)) AS gini
        FROM r
    """,
    # same cents grid, exact integer squares, identical double chain
    "nation_supplier_hhi": """
        WITH q AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(floor(l_quantity * 100 + 0.5)
                   AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY l_suppkey),
        g AS (
          SELECT n.n_name,
                 COUNT(*) AS n_suppliers,
                 SUM(CAST(q.q AS HUGEINT)) AS qt,
                 SUM(CAST(q.q AS HUGEINT) * q.q) AS ss,
                 MAX(q.q) AS qmax
          FROM q
          JOIN supplier s ON s.s_suppkey = q.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          GROUP BY n.n_name)
        SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers,
               CAST(qt AS BIGINT) AS total_qty_cents,
               CAST(ss AS DOUBLE)
               / (CAST(qt AS DOUBLE) * CAST(qt AS DOUBLE)) AS hhi,
               CAST(qmax AS DOUBLE) / CAST(qt AS DOUBLE) AS top_share
        FROM g
    """,
})

ORACLES.update({
    # one conditional-sum pass per L, unstacked via UNION ALL
    "doc_truncation_loss": f"""
        WITH d AS (
          SELECT CAST(len({TOKS}) AS BIGINT) AS nt FROM documents),
        g AS (
          SELECT COUNT(*) AS n_docs, SUM(nt) AS tok_total,
                 {", ".join(
                     f"SUM(CASE WHEN nt > {L} THEN 1 ELSE 0 END) "
                     f"AS over_{L}, "
                     f"SUM(CASE WHEN nt > {L} THEN nt - {L} "
                     f"ELSE 0 END) AS lost_{L}"
                     for L in TRUNC_CTXS)}
          FROM d)
        {" UNION ALL ".join(
            f"SELECT CAST({L} AS INTEGER) AS ctx_len, "
            f"CAST(n_docs AS BIGINT) AS n_docs, "
            f"CAST(over_{L} AS BIGINT) AS n_docs_truncated, "
            f"CAST(tok_total AS BIGINT) AS tok_total, "
            f"CAST(lost_{L} AS BIGINT) AS tokens_lost, "
            f"CAST(tok_total - lost_{L} AS BIGINT) AS tokens_kept, "
            f"CAST(lost_{L} AS DOUBLE) / CAST(tok_total AS DOUBLE) "
            f"AS loss_share FROM g"
            for L in TRUNC_CTXS)}
    """,
    # identical (cnt DESC, token ASC) tie-break rank
    "vocab_coverage_curve": f"""
        WITH v AS (
          SELECT token, COUNT(*) AS cnt
          FROM (SELECT unnest({TOKS}) AS token FROM documents)
          GROUP BY token),
        r AS (
          SELECT cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC)
                   AS rnk
          FROM v),
        g AS (
          SELECT COUNT(*) AS vocab_size, SUM(cnt) AS tok_total,
                 {", ".join(
                     f"SUM(CASE WHEN rnk <= {k} THEN cnt ELSE 0 END) "
                     f"AS cov_{k}" for k in VOCAB_COVERAGE_KS)}
          FROM r)
        {" UNION ALL ".join(
            f"SELECT CAST({k} AS INTEGER) AS k, "
            f"CAST(vocab_size AS BIGINT) AS vocab_size, "
            f"CAST(tok_total AS BIGINT) AS tok_total, "
            f"CAST(cov_{k} AS BIGINT) AS covered_tokens, "
            f"CAST(cov_{k} AS DOUBLE) / CAST(tok_total AS DOUBLE) "
            f"AS coverage FROM g"
            for k in VOCAB_COVERAGE_KS)}
    """,
})

ORACLES.update({
    # identical lower-median rank, integer-day gaps
    "order_gap_median_by_segment": """
        WITH g AS (
          SELECT o_custkey,
                 CAST(CAST(o_orderdate AS DATE)
                   - LAG(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey)
                   AS BIGINT) AS gap
          FROM orders),
        j AS (
          SELECT c.c_mktsegment AS segment, g.gap
          FROM g JOIN customer c ON c.c_custkey = g.o_custkey
          WHERE g.gap IS NOT NULL),
        r AS (
          SELECT segment, gap,
                 ROW_NUMBER() OVER (PARTITION BY segment
                                    ORDER BY gap) AS rn,
                 COUNT(*) OVER (PARTITION BY segment) AS n,
                 SUM(gap) OVER (PARTITION BY segment) AS gs
          FROM j)
        SELECT segment, CAST(MAX(n) AS BIGINT) AS n_gaps,
               CAST(MIN(CASE WHEN rn >= (n + 1) // 2 THEN gap END)
                 AS BIGINT) AS median_gap_days,
               CAST(MAX(gs) AS DOUBLE) / MAX(n) AS mean_gap_days
        FROM r GROUP BY segment
    """,
})

ORACLES.update({
    # identical integer grids, exact HUGEINT moments, one double chain
    "discount_quantity_corr_by_brand": """
        WITH li AS (
          SELECT p.p_brand,
                 CAST(floor(l.l_discount * 10000 + 0.5) AS BIGINT)
                   AS x,
                 CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) AS y
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        m AS (
          SELECT p_brand, COUNT(*) AS n,
                 SUM(CAST(x AS HUGEINT)) AS sx,
                 SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM li GROUP BY p_brand)
        SELECT p_brand, CAST(n AS BIGINT) AS n,
               (CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      * (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)))
               AS corr_discount_qty
        FROM m
    """,
})

from .operators.similarity import INT8_CAND  # noqa: E402

ORACLES.update({
    # identical int8 grid, exact integer coarse dot, same tie-breaks
    "knn_int8_rerank": f"""
        WITH ex AS (
          SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings),
        dims AS (
          SELECT dim, MIN(CAST(x AS DOUBLE)) AS lo,
                 MAX(CAST(x AS DOUBLE)) AS hi
          FROM ex GROUP BY dim),
        codes AS (
          SELECT e.vec_id, e.dim,
                 CASE WHEN d.hi = d.lo THEN 0
                      ELSE CAST(least(255.0, floor(
                        (CAST(e.x AS DOUBLE) - d.lo) * 255.0
                        / (d.hi - d.lo))) - 128 AS INTEGER)
                 END AS code
          FROM ex e JOIN dims d USING (dim)),
        qc AS (SELECT dim, code FROM codes WHERE vec_id = 0),
        coarse AS (
          SELECT c.vec_id,
                 SUM(CAST(c.code AS BIGINT) * q.code) AS cs
          FROM codes c JOIN qc q USING (dim)
          WHERE c.vec_id <> 0
          GROUP BY c.vec_id
          ORDER BY cs DESC, c.vec_id ASC
          LIMIT {INT8_CAND}),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label,
               {_cos('e.embedding', 'qv')} AS cos_sim
        FROM coarse JOIN embeddings e USING (vec_id), q
        ORDER BY cos_sim DESC, e.vec_id ASC
        LIMIT 10
    """,
})

from .operators.dedup import TOP_SPANS_K  # noqa: E402
from .operators.text import ZIPF_TOP  # noqa: E402

ORACLES.update({
    # same window hashes; struct-min exemplar == (min doc, min p in it)
    "top_repeated_spans": f"""
        WITH d AS (
          SELECT doc_id, toks, len(toks) AS n
          FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
          WHERE len(toks) >= 16),
        pos AS (
          SELECT doc_id, toks, n,
                 unnest(generate_series(1, n - 15)) AS p
          FROM d),
        wh AS (
          SELECT doc_id, p,
                 md5(array_to_string(toks[p : p + 15], ' ')) AS h
          FROM pos),
        agg AS (
          SELECT h, COUNT(*) AS n_occurrences,
                 COUNT(DISTINCT doc_id) AS n_docs,
                 MIN(doc_id) AS example_doc
          FROM wh GROUP BY h HAVING COUNT(*) >= 2),
        ex AS (
          SELECT a.h, a.n_occurrences, a.n_docs, a.example_doc,
                 MIN(w.p) AS example_pos
          FROM agg a
          JOIN wh w ON w.h = a.h AND w.doc_id = a.example_doc
          GROUP BY a.h, a.n_occurrences, a.n_docs, a.example_doc),
        top AS (
          SELECT * FROM ex
          ORDER BY n_occurrences DESC, h ASC LIMIT {TOP_SPANS_K})
        SELECT t.h, CAST(t.n_occurrences AS BIGINT) AS n_occurrences,
               CAST(t.n_docs AS BIGINT) AS n_docs,
               t.example_doc, CAST(t.example_pos AS BIGINT)
                 AS example_pos,
               array_to_string(
                 d.toks[t.example_pos : t.example_pos + 15], ' ')
                 AS span_text
        FROM top t JOIN d ON d.doc_id = t.example_doc
    """,
    # same banded candidate pairs, unordered source key
    "source_cross_dup_matrix": f'''
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id)
        SELECT least(da.source, db.source) AS source_x,
               greatest(da.source, db.source) AS source_y,
               CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
        GROUP BY least(da.source, db.source),
                 greatest(da.source, db.source)
    ''',
    # identical (cnt DESC, token ASC) rank + integer product
    "token_zipf_table": f"""
        WITH v AS (
          SELECT token, COUNT(*) AS cnt
          FROM (SELECT unnest({TOKS}) AS token FROM documents)
          GROUP BY token),
        tot AS (SELECT SUM(cnt) AS tok_total FROM v),
        r AS (
          SELECT token, cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC)
                   AS rank
          FROM v)
        SELECT CAST(rank AS INTEGER) AS rank, token,
               CAST(cnt AS BIGINT) AS cnt,
               CAST(rank * cnt AS BIGINT) AS rank_x_cnt,
               CAST(cnt AS DOUBLE) / CAST(tok_total AS DOUBLE)
                 AS share
        FROM r, tot
        WHERE rank <= {ZIPF_TOP}
    """,
})

from .operators.text import PACK_CTXS  # noqa: E402

ORACLES.update({
    # same epoch-day weekday arithmetic, exact cents
    "events_hourly_heatmap": """
        SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7
                 AS INTEGER) AS weekday,
               CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(COALESCE(
                 CAST(floor(value * 100 + 0.5) AS BIGINT), 0))
                 AS BIGINT) AS value_cents
        FROM events
        GROUP BY 1, 2
    """,
    # pure integer ceil-div arithmetic per (lang, L)
    "packing_efficiency_by_ctx": f"""
        WITH d AS (
          SELECT lang,
                 CAST(SUM(len({TOKS})) AS BIGINT) AS tok
          FROM documents GROUP BY lang)
        {" UNION ALL ".join(
            f"SELECT lang, CAST({L} AS INTEGER) AS ctx_len, "
            f"tok AS stream_tokens, "
            f"CAST((tok + {L} - 1) // {L} AS BIGINT) AS n_sequences, "
            f"CAST(((tok + {L} - 1) // {L}) * {L} - tok AS BIGINT) "
            f"AS pad_tokens, "
            f"CAST(tok AS DOUBLE) "
            f"/ CAST(((tok + {L} - 1) // {L}) * {L} AS DOUBLE) "
            f"AS efficiency FROM d"
            for L in PACK_CTXS)}
    """,
    # same integer margin and argmax tie-break as doc_langid
    "langid_margin_hist": f"""
        WITH t AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
        s AS (
          SELECT doc_id, lang,
                 {", ".join(f"{_score(lang)} AS score_{lang}"
                            for lang in _LANGS)}
          FROM t),
        b AS (
          SELECT *,
                 greatest(score_de, score_en, score_es, score_fr,
                          score_zh) AS best,
                 list_sort([score_de, score_en, score_es, score_fr,
                            score_zh]) AS arr
          FROM s),
        m AS (
          SELECT CAST(arr[{len(_LANGS)}] - arr[{len(_LANGS) - 1}]
                   AS INTEGER) AS margin,
                 (CASE {" ".join(
                     f"WHEN best > 0 AND score_{lang} = best "
                     f"THEN '{lang}'" for lang in _LANGS)}
                  ELSE 'unk' END) = lang AS is_correct
          FROM b)
        SELECT margin, is_correct,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM m GROUP BY margin, is_correct
    """,
})

from .operators.dedup import SPLIT_TEST_PCT  # noqa: E402

_CC_PAIRS_CTE = f'''{SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src),
        labels AS (
          SELECT d.doc_id,
                 COALESCE(c.component, d.doc_id) AS component
          FROM documents d
          LEFT JOIN comp c ON d.doc_id = c.node)'''

ORACLES.update({
    # components CTE + the portable md5 bucket on the component id
    "leakage_safe_split": f'''
        WITH RECURSIVE {_CC_PAIRS_CTE}
        SELECT doc_id, component,
               CAST({_HEX8_TO_INT(
                   "'ccsplit|' || CAST(component AS VARCHAR)")}
                    % 100 AS INT) AS bucket,
               CASE WHEN CAST({_HEX8_TO_INT(
                   "'ccsplit|' || CAST(component AS VARCHAR)")}
                    % 100 AS INT) < {SPLIT_TEST_PCT}
                    THEN 'test' ELSE 'train' END AS split
        FROM labels
    ''',
    # every cross-split cell must be zero by construction
    "split_leakage_audit": f'''
        WITH RECURSIVE {_CC_PAIRS_CTE},
        sp AS (
          SELECT doc_id,
                 CASE WHEN CAST({_HEX8_TO_INT(
                     "'ccsplit|' || CAST(component AS VARCHAR)")}
                      % 100 AS INT) < {SPLIT_TEST_PCT}
                      THEN 'test' ELSE 'train' END AS split
          FROM labels)
        SELECT least(a.split, b.split) AS split_x,
               greatest(a.split, b.split) AS split_y,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs p
        JOIN sp a ON a.doc_id = p.doc_a
        JOIN sp b ON b.doc_id = p.doc_b
        GROUP BY least(a.split, b.split), greatest(a.split, b.split)
    ''',
})

ORACLES.update({
    # semantic CC CTE + the keep-best quality tail
    "semantic_dedup_keep_best": f'''
        WITH RECURSIVE {_PAIR_CTE},
        vpairs AS (
          SELECT vec_a AS doc_a, vec_b AS doc_b
          FROM cand
          JOIN norm a ON vec_a = a.vec_id
          JOIN norm b ON vec_b = b.vec_id
          WHERE {_PAIR_DOT} >= 0.3),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM vpairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM vpairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src),
        labeled AS (
          SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
        q AS (
          SELECT doc_id,
                 (n_distinct / n_tokens) * 0.4
                   + (1.0 - n_stop / n_tokens) * 0.4
                   + least(n_tokens / 100.0, 1.0) * 0.2 AS quality_score
          FROM (SELECT doc_id,
                       CAST(len({TOKS}) AS INTEGER) AS n_tokens,
                       CAST(len(list_distinct({TOKS})) AS INTEGER)
                         AS n_distinct,
                       CAST(len(list_filter({TOKS},
                            x -> x IN ('the', 'a', 'of', 'and', 'to',
                                       'in'))) AS INTEGER) AS n_stop
                FROM documents)),
        ranked AS (
          SELECT l.component, l.doc_id, q.quality_score,
                 ROW_NUMBER() OVER (
                   PARTITION BY l.component
                   ORDER BY q.quality_score DESC, l.doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY l.component) AS n_members
          FROM labeled l JOIN q ON l.doc_id = q.doc_id)
        SELECT component, doc_id AS best_doc_id,
               quality_score AS best_quality,
               CAST(n_members AS BIGINT) AS n_members
        FROM ranked WHERE rn = 1
    ''',
    # exact intersection bit-checked; the engine's own HLL
    # inclusion-exclusion estimate must land in the envelope
    "hll_event_overlap": """
        WITH ua AS (SELECT DISTINCT user_id FROM events
                    WHERE event_type = 'click'),
        ub AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase'),
        exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_overlap
          FROM ua WHERE user_id IN (SELECT user_id FROM ub)),
        ests AS (
          SELECT approx_count_distinct(CASE WHEN event_type = 'click'
                   THEN user_id END) AS ea,
                 approx_count_distinct(CASE WHEN event_type = 'purchase'
                   THEN user_id END) AS eb,
                 approx_count_distinct(user_id) AS eu
          FROM events WHERE event_type IN ('click', 'purchase'))
        SELECT n_exact_overlap,
               CAST(abs(CAST(ea AS DOUBLE) + eb - eu
                        - n_exact_overlap)
                    <= 5.0 + 0.15 * CAST(n_exact_overlap AS DOUBLE)
                 AS INTEGER) AS ok_est
        FROM exact, ests
    """,
})

ORACLES.update({
    # cascade oracle reused as a CTE; intersection with exact top-k
    "knn_int8_recall": f"""
        WITH ex AS (
          SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings),
        dims AS (
          SELECT dim, MIN(CAST(x AS DOUBLE)) AS lo,
                 MAX(CAST(x AS DOUBLE)) AS hi
          FROM ex GROUP BY dim),
        codes AS (
          SELECT e.vec_id, e.dim,
                 CASE WHEN d.hi = d.lo THEN 0
                      ELSE CAST(least(255.0, floor(
                        (CAST(e.x AS DOUBLE) - d.lo) * 255.0
                        / (d.hi - d.lo))) - 128 AS INTEGER)
                 END AS code
          FROM ex e JOIN dims d USING (dim)),
        qc AS (SELECT dim, code FROM codes WHERE vec_id = 0),
        coarse AS (
          SELECT c.vec_id,
                 SUM(CAST(c.code AS BIGINT) * q.code) AS cs
          FROM codes c JOIN qc q USING (dim)
          WHERE c.vec_id <> 0
          GROUP BY c.vec_id
          ORDER BY cs DESC, c.vec_id ASC
          LIMIT {INT8_CAND}),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        approx AS (
          SELECT e.vec_id
          FROM coarse JOIN embeddings e USING (vec_id), q
          ORDER BY {_cos('e.embedding', 'qv')} DESC, e.vec_id ASC
          LIMIT 10),
        exact AS (
          SELECT vec_id FROM embeddings, q
          WHERE vec_id <> 0
          ORDER BY {_cos('embedding', 'qv')} DESC, vec_id ASC
          LIMIT 10)
        SELECT 10 AS k, CAST(COUNT(*) AS INT) AS n_hits,
               CAST(COUNT(*) AS DOUBLE) / 10 AS recall_at_k
        FROM exact WHERE vec_id IN (SELECT vec_id FROM approx)
    """,
})

from .operators.dedup import LSH_SWEEP_CONFIGS  # noqa: E402


def _sweep_block(bands: int, rows: int) -> str:
    sel = "\n          UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        + " || '|' || ".join(f"h{b * rows + r}" for r in range(rows))
        + " AS band_val FROM sig"
        for b in range(bands))
    matches = " + ".join(
        f"CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END"
        for j in range(16))
    return f"""
        SELECT CAST({bands} AS INTEGER) AS n_bands,
               CAST({rows} AS INTEGER) AS rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
               CAST(COALESCE(SUM(CAST(floor(
                 (CAST(m AS DOUBLE) / 16) * 10000 + 0.5) AS BIGINT)),
                 0) AS BIGINT) AS est_jaccard_bp_sum
        FROM (
          SELECT p.doc_a, p.doc_b, ({matches}) AS m
          FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM ({sel}) a
                JOIN ({sel}) b
                  ON a.band_id = b.band_id
                 AND a.band_val = b.band_val
                 AND a.doc_id < b.doc_id) p
          JOIN sig sa ON sa.doc_id = p.doc_a
          JOIN sig sb ON sb.doc_id = p.doc_b)"""


ORACLES.update({
    # same signatures; pair SET per config equals the
    # first-matching-band emission; bp-quantized integer mean sum
    "lsh_band_sweep": f"""
        WITH {SIG_CTE}
        {" UNION ALL ".join(_sweep_block(b, r)
                            for b, r in LSH_SWEEP_CONFIGS)}
    """,
})

ORACLES.update({
    # same [.!?]+ split, same non-empty-token sentence filter
    "doc_sentence_stats": """
        WITH d AS (
          SELECT doc_id,
                 list_filter(list_transform(
                   regexp_split_to_array(text, '[.!?]+'),
                   s -> len(list_filter(string_split(s, ' '),
                            x -> x <> ''))), n -> n > 0) AS sl
          FROM documents)
        SELECT doc_id,
               CAST(len(sl) AS INTEGER) AS n_sentences,
               CAST(COALESCE(list_sum(sl), 0) AS INTEGER)
                 AS sent_tokens,
               CAST(COALESCE(list_max(sl), 0) AS INTEGER)
                 AS max_sentence,
               CASE WHEN len(sl) > 0
                    THEN CAST(COALESCE(list_sum(sl), 0) AS DOUBLE)
                         / len(sl) END AS mean_sentence_tokens
        FROM d
    """,
})

ORACLES.update({
    # naive pair join IS the banded result by pigeonhole (dist<=3
    # implies a shared 15-bit band out of 4)
    "payload_simhash_pairs": """
        WITH d AS (
          SELECT doc_id, hex(encode(text)) AS h FROM documents),
        tok AS (
          SELECT doc_id, substr(h, CAST(i AS INT), 8) AS tok
          FROM d, unnest(range(1, len(h) - 7 + 1, 2)) AS u(i)),
        tc AS (
          SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        th AS (SELECT doc_id, md5(tok) AS mh, cnt FROM tc),
        bits AS (
          SELECT doc_id, j,
                 ((strpos('0123456789abcdef',
                          substr(mh, CAST(j // 4 AS INT) + 1, 1)) - 1)
                   >> CAST(3 - (j % 4) AS INT)) & 1 AS bit,
                 cnt
          FROM th, (SELECT unnest(range(60)) AS j)),
        agg AS (
          SELECT doc_id, j, SUM((2 * bit - 1) * cnt) AS s
          FROM bits GROUP BY 1, 2),
        ps AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN s > 0
                               THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                               ELSE 0 END) AS BIGINT) AS sh
          FROM agg GROUP BY doc_id)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        FROM ps a JOIN ps b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """,
})

ORACLES.update({
    # same assignment CTE; majority = max (count, -label) struct order
    "ivf_cluster_purity": f"""
        WITH cent AS (SELECT vec_id AS centroid_id, embedding AS cvec
                      FROM embeddings WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id, label, centroid_id FROM (
            SELECT e.vec_id, e.label, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.embedding', 'c.cvec')} DESC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent c)
          WHERE rn = 1),
        cells AS (
          SELECT centroid_id, label, COUNT(*) AS c
          FROM assigned GROUP BY centroid_id, label),
        ranked AS (
          SELECT centroid_id, label, c,
                 SUM(c) OVER (PARTITION BY centroid_id) AS n_vectors,
                 ROW_NUMBER() OVER (PARTITION BY centroid_id
                                    ORDER BY c DESC, label ASC) AS rn
          FROM cells)
        SELECT centroid_id, CAST(n_vectors AS BIGINT) AS n_vectors,
               CAST(label AS INTEGER) AS majority_label,
               CAST(c AS BIGINT) AS majority_count,
               CAST(c AS DOUBLE) / n_vectors AS purity
        FROM ranked WHERE rn = 1
    """,
})

from .plans.curation import PLAN_CTX  # noqa: E402

ORACLES.update({
    # keep-best CTE + component split + token budget arithmetic
    "training_corpus_plan": f'''
        WITH RECURSIVE {_CC_PAIRS_CTE},
        q AS (
          SELECT doc_id,
                 (n_distinct / n_tokens) * 0.4
                   + (1.0 - n_stop / n_tokens) * 0.4
                   + least(n_tokens / 100.0, 1.0) * 0.2 AS quality_score
          FROM (SELECT doc_id,
                       CAST(len({TOKS}) AS INTEGER) AS n_tokens,
                       CAST(len(list_distinct({TOKS})) AS INTEGER)
                         AS n_distinct,
                       CAST(len(list_filter({TOKS},
                            x -> x IN ('the', 'a', 'of', 'and', 'to',
                                       'in'))) AS INTEGER) AS n_stop
                FROM documents)),
        ranked AS (
          SELECT l.component, l.doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY l.component
                   ORDER BY q.quality_score DESC, l.doc_id ASC) AS rn
          FROM labels l JOIN q ON l.doc_id = q.doc_id),
        best AS (
          SELECT component, doc_id FROM ranked WHERE rn = 1),
        sp AS (
          SELECT b.doc_id,
                 CASE WHEN CAST({_HEX8_TO_INT(
                     "'ccsplit|' || CAST(component AS VARCHAR)")}
                      % 100 AS INT) < {SPLIT_TEST_PCT}
                      THEN 'test' ELSE 'train' END AS split
          FROM best b),
        dtok AS (
          SELECT doc_id, lang, CAST(len({TOKS}) AS BIGINT) AS nt
          FROM documents),
        g AS (
          SELECT sp.split, d.lang, COUNT(*) AS n_docs,
                 CAST(SUM(d.nt) AS BIGINT) AS tokens
          FROM sp JOIN dtok d USING (doc_id)
          GROUP BY sp.split, d.lang)
        SELECT split, lang, CAST(n_docs AS BIGINT) AS n_docs, tokens,
               CAST((tokens + {PLAN_CTX} - 1) // {PLAN_CTX} AS BIGINT)
                 AS n_sequences,
               CAST(((tokens + {PLAN_CTX} - 1) // {PLAN_CTX})
                 * {PLAN_CTX} - tokens AS BIGINT) AS pad_tokens
        FROM g
    ''',
})

ORACLES.update({
    # same epoch-day cohorting, exact cents, same running frame
    "cohort_ltv_curve": """
        WITH ev AS (
          SELECT user_id,
                 CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS eday,
                 event_type, value
          FROM events),
        first AS (
          SELECT user_id, MIN(eday) AS cday FROM ev GROUP BY user_id),
        sizes AS (
          SELECT cday, COUNT(*) AS cohort_users
          FROM first GROUP BY cday),
        pur AS (
          SELECT user_id, eday,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM ev
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        cells AS (
          SELECT f.cday, p.eday - f.cday AS age_days,
                 CAST(SUM(p.cents) AS BIGINT) AS cents,
                 COUNT(*) AS n_purchases
          FROM pur p JOIN first f USING (user_id)
          GROUP BY f.cday, p.eday - f.cday)
        SELECT CAST(DATE '1970-01-01' + CAST(c.cday AS INT)
                 AS VARCHAR) AS cohort_day,
               c.age_days,
               CAST(c.n_purchases AS BIGINT) AS n_purchases,
               c.cents,
               CAST(SUM(c.cents) OVER (PARTITION BY c.cday
                 ORDER BY c.age_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_cents,
               CAST(CAST(SUM(c.cents) OVER (PARTITION BY c.cday
                 ORDER BY c.age_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS DOUBLE) / 100.0 / s.cohort_users
                 AS cum_value_per_user
        FROM cells c JOIN sizes s USING (cday)
    """,
})

ORACLES.update({
    # same banded pairs; isolated docs enter at degree 0
    "dup_graph_degree_hist": f'''
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
        sym AS (
          SELECT doc_a AS u FROM pairs
          UNION ALL
          SELECT doc_b AS u FROM pairs),
        deg AS (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY u),
        hist AS (
          SELECT CAST(deg AS BIGINT) AS degree,
                 CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM deg GROUP BY deg),
        iso AS (
          SELECT CAST(0 AS BIGINT) AS degree,
                 CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM documents
          WHERE doc_id NOT IN (SELECT node FROM deg))
        SELECT * FROM hist
        UNION ALL
        SELECT * FROM iso WHERE n_nodes > 0
    ''',
})

from .operators.text import SYSTEMATIC_TICKS  # noqa: E402

ORACLES.update({
    # single-window cumulative axis, same integer tick-crossing
    "token_budget_sample": f"""
        WITH d AS (
          SELECT doc_id, lang, source,
                 CAST(len({TOKS}) AS BIGINT) AS nt
          FROM documents),
        c AS (
          SELECT *,
                 CAST(SUM(nt) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_after,
                 CAST(SUM(nt) OVER () AS BIGINT) AS wtot
          FROM d)
        SELECT doc_id, lang, source, nt,
               CAST(cum_after - nt AS BIGINT) AS cum_before,
               cum_after
        FROM c
        WHERE (cum_after - nt)
              // greatest(1, wtot // {SYSTEMATIC_TICKS})
              < cum_after
              // greatest(1, wtot // {SYSTEMATIC_TICKS})
    """,
})

ORACLES.update({
    # brute-force twin of the distributed suffix-rank LRS: enumerate
    # EVERY token window of every length (feasible at oracle SFs),
    # keep the repeated ones, report the distinct sequences at the
    # maximum repeated length
    "longest_repeated_substring": """
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '),
                             x -> x <> '') AS toks
          FROM documents),
        starts AS (
          SELECT doc_id, toks, len(toks) AS n,
                 unnest(range(1, len(toks) + 1)) AS s
          FROM d),
        wins AS (
          SELECT doc_id, CAST(L AS BIGINT) AS L,
                 array_to_string(toks[s : s + L - 1], ' ') AS seq
          FROM (SELECT doc_id, toks, s,
                       unnest(range(1, n - s + 2)) AS L
                FROM starts)),
        reps AS (
          SELECT L, seq, COUNT(*) AS n_occurrences,
                 COUNT(DISTINCT doc_id) AS n_docs
          FROM wins GROUP BY L, seq HAVING COUNT(*) >= 2),
        mx AS (SELECT max(L) AS lmax FROM reps)
        SELECT r.L AS lrs_tokens, r.n_occurrences, r.n_docs,
               r.seq AS lrs_text
        FROM reps r JOIN mx ON r.L = mx.lmax
        ORDER BY lrs_text
    """,
})


def _beam_edges_sql() -> str:
    """Navigable-graph CTE body (after _BUCKETS_CTE) ending at
    `edges` — mirrors operators/similarity.py beam_graph_edges:
    bucket-local top-3 cosine edges kept bidirectional + Hamming-1
    long edges to each bucket's 3 lowest-vec_id representatives,
    distinct-unioned."""
    return f"""
        cand_e AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 {_cos('a.embedding', 'b.embedding')} AS cs
          FROM assigned a JOIN assigned b USING (bucket)
          WHERE a.vec_id <> b.vec_id),
        local_e AS (
          SELECT src, dst FROM (
            SELECT src, dst, ROW_NUMBER() OVER (
              PARTITION BY src ORDER BY cs DESC, dst ASC) AS rn
            FROM cand_e) WHERE rn <= 3),
        reps AS (
          SELECT bucket, vec_id AS rep FROM (
            SELECT bucket, vec_id, ROW_NUMBER() OVER (
              PARTITION BY bucket ORDER BY vec_id ASC) AS rn
            FROM assigned) WHERE rn <= 3),
        long_e AS (
          SELECT a.vec_id AS src, r.rep AS dst
          FROM (SELECT vec_id, bucket FROM assigned) a
          CROSS JOIN (SELECT unnest(range(8)) AS bit) bits
          JOIN reps r
            ON CAST(r.bucket AS BIGINT)
               = xor(CAST(a.bucket AS BIGINT), 1 << bit)
          WHERE a.vec_id <> r.rep),
        edges AS (SELECT DISTINCT src, dst FROM
          (SELECT src, dst FROM local_e
           UNION ALL SELECT dst AS src, src AS dst FROM local_e
           UNION ALL SELECT src, dst FROM long_e))"""


def _beam_visited_sql(hops: int = 8, bw: int = 32) -> str:
    """Fixed-hop ef-search unroll (after `edges`): each hop is
    beam{i} = top-ef of visited{i-1}, neighbor pull through `edges`,
    candidates scored from the shared `scored` table — the exact
    loop operators/similarity.py knn_beam runs, as CTE stages."""
    head = f""",
        qb AS (SELECT embedding AS q FROM embeddings
               WHERE vec_id = 0),
        scored AS (
          SELECT vec_id, label, {_cos('embedding', 'q')} AS qs
          FROM embeddings, qb WHERE vec_id <> 0),
        visited0 AS (
          SELECT vec_id, label, qs FROM scored
          WHERE vec_id IN (1, 2, 3, 4))"""
    hop_ctes = []
    for i in range(1, hops + 1):
        hop_ctes.append(f""",
        beam{i} AS (SELECT vec_id FROM visited{i - 1}
                    ORDER BY qs DESC, vec_id ASC LIMIT {bw}),
        nbrs{i} AS (SELECT DISTINCT e.dst AS vec_id
                    FROM edges e JOIN beam{i} b ON e.src = b.vec_id
                    WHERE e.dst <> 0),
        visited{i} AS (SELECT DISTINCT vec_id, label, qs FROM (
          SELECT * FROM visited{i - 1}
          UNION ALL
          SELECT s.vec_id, s.label, s.qs
          FROM scored s JOIN nbrs{i} USING (vec_id)))""")
    return head + "".join(hop_ctes)


def _materialize(sql: str) -> str:
    """Mark the multi-referenced beam CTEs MATERIALIZED: DuckDB
    inlines CTE references by default, so the 8-hop unroll would
    otherwise rebuild the edge graph (bucket self-join) and the
    score table once per hop — 100×+ on the batch variant."""
    for n in ("assigned", "edges", "scored", "scoredb"):
        sql = sql.replace(f"{n} AS (", f"{n} AS MATERIALIZED (", 1)
    return sql


ORACLES.update({
    "beam_graph_edges": f"""
        WITH {_BUCKETS_CTE},{_beam_edges_sql()}
        SELECT src, dst FROM edges
    """,
    "knn_beam": _materialize(f"""
        WITH {_BUCKETS_CTE},{_beam_edges_sql()}{_beam_visited_sql()}
        SELECT vec_id, label, qs AS cos_sim
        FROM visited8 ORDER BY qs DESC, vec_id ASC LIMIT 10
    """),
    "knn_beam_recall": _materialize(f"""
        WITH {_BUCKETS_CTE},{_beam_edges_sql()}{_beam_visited_sql()},
        approx AS (SELECT vec_id FROM visited8
                   ORDER BY qs DESC, vec_id ASC LIMIT 10),
        exact AS (SELECT vec_id FROM scored
                  ORDER BY qs DESC, vec_id ASC LIMIT 10)
        SELECT 10 AS k, CAST(COUNT(*) AS INT) AS n_hits,
               COUNT(*) / 10 AS recall_at_k
        FROM exact JOIN approx USING (vec_id)
    """),
})


def _beam_batch_visited_sql(hops: int = 8, bw: int = 32) -> str:
    """Batch fixed-hop ef-search unroll (after `edges`): all queries
    (vec_id < 5) walk simultaneously, every stage keyed by
    (qid, vec_id) with per-qid ROW_NUMBER windows — the exact loop
    operators/similarity.py knn_beam_batch runs, as CTE stages."""
    head = """,
        qset AS (SELECT vec_id AS qid, embedding AS qv
                 FROM embeddings WHERE vec_id < 5),
        scoredb AS (
          SELECT q.qid, e.vec_id, e.label,
                 {cos} AS qs
          FROM embeddings e CROSS JOIN qset q
          WHERE e.vec_id <> q.qid),
        bvisited0 AS (
          SELECT qid, vec_id, label, qs FROM scoredb
          WHERE vec_id IN (1, 2, 3, 4, 5) AND vec_id <> qid)""" \
        .format(cos=_cos('e.embedding', 'q.qv'))
    hop_ctes = []
    for i in range(1, hops + 1):
        hop_ctes.append(f""",
        bbeam{i} AS (SELECT qid, vec_id FROM (
          SELECT qid, vec_id, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY qs DESC, vec_id ASC) AS rn
          FROM bvisited{i - 1}) WHERE rn <= {bw}),
        bnbrs{i} AS (SELECT DISTINCT b.qid, e.dst AS vec_id
                     FROM edges e JOIN bbeam{i} b ON e.src = b.vec_id
                     WHERE e.dst <> b.qid),
        bvisited{i} AS (SELECT DISTINCT qid, vec_id, label, qs FROM (
          SELECT * FROM bvisited{i - 1}
          UNION ALL
          SELECT s.qid, s.vec_id, s.label, s.qs
          FROM scoredb s JOIN bnbrs{i} USING (qid, vec_id)))""")
    return head + "".join(hop_ctes)


ORACLES.update({
    "knn_beam_batch": _materialize(f"""
        WITH {_BUCKETS_CTE},{_beam_edges_sql()}
        {_beam_batch_visited_sql()}
        SELECT qid, vec_id, label, qs AS cos_sim,
               CAST(rn AS INT) AS rnk
        FROM (SELECT qid, vec_id, label, qs, ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY qs DESC, vec_id ASC) AS rn
              FROM bvisited8)
        WHERE rn <= 3
    """),
    "knn_beam_batch_recall": _materialize(f"""
        WITH {_BUCKETS_CTE},{_beam_edges_sql()}
        {_beam_batch_visited_sql()},
        bapprox AS (
          SELECT qid, vec_id FROM (
            SELECT qid, vec_id, ROW_NUMBER() OVER (
              PARTITION BY qid ORDER BY qs DESC, vec_id ASC) AS rn
            FROM bvisited8) WHERE rn <= 3),
        bexact AS (
          SELECT qid, vec_id FROM (
            SELECT qid, vec_id, ROW_NUMBER() OVER (
              PARTITION BY qid ORDER BY qs DESC, vec_id ASC) AS rn
            FROM scoredb) WHERE rn <= 3)
        SELECT x.qid, 3 AS k,
               CAST(COUNT(a.vec_id) AS INT) AS n_hits,
               COUNT(a.vec_id) / 3 AS recall_at_k
        FROM bexact x LEFT JOIN bapprox a USING (qid, vec_id)
        GROUP BY x.qid
    """),
})


ORACLES.update({
    # tie-averaged ranks doubled to integers, DECIMAL(38,0) rank sum
    "mann_whitney_value_drift": """
        WITH c AS (
          SELECT CAST(value AS DOUBLE) AS v,
                 SUM(CASE WHEN event_type = 'click'
                     THEN 1 ELSE 0 END) AS ca,
                 SUM(CASE WHEN event_type = 'purchase'
                     THEN 1 ELSE 0 END) AS cb
          FROM events
          WHERE event_type IN ('click', 'purchase')
            AND value IS NOT NULL
          GROUP BY CAST(value AS DOUBLE)),
        cum AS (
          SELECT ca, cb,
                 CAST(SUM(ca + cb) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) - (ca + cb) AS BIGINT) AS prior
          FROM c),
        tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                       CAST(SUM(cb) AS BIGINT) AS nb FROM c),
        r AS (SELECT SUM(CAST(ca AS DECIMAL(38,0))
                  * CAST(2 * prior + ca + cb + 1
                         AS DECIMAL(38,0))) AS r2
              FROM cum)
        SELECT na AS n_click, nb AS n_purchase,
               (CAST(r2 AS DOUBLE)
                - CAST(CAST(na AS DECIMAL(38,0)) * (na + 1)
                       AS DOUBLE)) * 0.5 AS u_click,
               (CAST(r2 AS DOUBLE)
                - CAST(CAST(na AS DECIMAL(38,0)) * (na + 1)
                       AS DOUBLE)) * 0.5
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS auc
        FROM r, tot
    """,
    # doubled tie-averaged ranks -> exact bigint Pearson sums
    "spearman_daily_rank_corr": """
        WITH d AS (
          SELECT o_orderdate, CAST(COUNT(*) AS BIGINT) AS x,
                 SUM(o_totalprice) AS rev
          FROM orders GROUP BY o_orderdate),
        rk AS (
          SELECT CAST(2 * RANK() OVER (ORDER BY x ASC)
                      + COUNT(*) OVER (PARTITION BY x) - 1
                      AS BIGINT) AS rx,
                 CAST(2 * RANK() OVER (ORDER BY rev ASC)
                      + COUNT(*) OVER (PARTITION BY rev) - 1
                      AS BIGINT) AS ry
          FROM d),
        a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(rx) AS BIGINT) AS sx,
                     CAST(SUM(ry) AS BIGINT) AS sy,
                     CAST(SUM(rx * ry) AS BIGINT) AS sxy,
                     CAST(SUM(rx * rx) AS BIGINT) AS sxx,
                     CAST(SUM(ry * ry) AS BIGINT) AS syy
              FROM rk)
        SELECT n AS n_days,
               CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE))
               AS spearman_rho
        FROM a
    """,
    # 2D skyline = per-date max + suffix max over later dates
    "orders_skyline_2d": """
        WITH pd AS (
          SELECT o_orderdate, MAX(o_totalprice) AS day_max
          FROM orders GROUP BY o_orderdate),
        f AS (
          SELECT o_orderdate, day_max,
                 MAX(day_max) OVER (ORDER BY o_orderdate DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS later_max
          FROM pd)
        SELECT o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_totalprice
        FROM orders o JOIN f USING (o_orderdate)
        WHERE o.o_totalprice = f.day_max
          AND (f.later_max IS NULL OR o.o_totalprice > f.later_max)
    """,
})


ORACLES.update({
    # frontier-anchored lifecycle partition; precedence new > churned
    # > dormant > active, 30/60-day microsecond fences
    "user_lifecycle_stages": """
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us FROM events),
        anchor AS (SELECT MAX(us) AS hi FROM ev),
        per AS (
          SELECT user_id, MIN(us) AS first_us, MAX(us) AS last_us
          FROM ev GROUP BY user_id)
        SELECT CASE
                 WHEN first_us >= hi - 30 * 86400000000 THEN 'new'
                 WHEN last_us < hi - 60 * 86400000000 THEN 'churned'
                 WHEN last_us < hi - 30 * 86400000000 THEN 'dormant'
                 ELSE 'active' END AS stage,
               COUNT(*) AS n_users
        FROM per, anchor
        GROUP BY 1
    """,
    "time_to_third_purchase": """
        WITH p AS (
          SELECT user_id, epoch_us(ts) AS us,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS rn
          FROM events WHERE event_type = 'purchase')
        SELECT user_id,
               MIN(CASE WHEN rn = 1 THEN us END) AS first_purchase_us,
               MIN(CASE WHEN rn = 3 THEN us END) AS third_purchase_us,
               (MIN(CASE WHEN rn = 3 THEN us END)
                - MIN(CASE WHEN rn = 1 THEN us END))
               // 86400000000 AS days_to_third
        FROM p WHERE rn <= 3
        GROUP BY user_id
        HAVING COUNT(*) >= 3
    """,
})


def _bpe_fertility_sql(k: int = 32) -> str:
    """Per-language fertility twin: the unrolled k-step training
    chain, word -> symbol-count lookup, languages-bounded rollup."""
    sep = "chr(31)"
    chain = _bpe_vocab_sql(k)
    chain = chain[:chain.rindex("SELECT CAST(1 AS INTEGER)")
                  - len("\n        ")]
    return f"""{chain},
        wsym AS (
          SELECT w, len(string_split(trim(rep, {sep}),
                                     {sep} || {sep})) AS n_sym
          FROM v{k}),
        docw AS (
          SELECT lang, unnest({TOKS}) AS w FROM documents)
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
               CAST(SUM(n_sym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS symbols_per_word
        FROM docw JOIN wsym USING (w)
        GROUP BY lang
    """


ORACLES.update({
    "tokenizer_fertility_by_lang": _bpe_fertility_sql(32),
    "winnowing_pair_candidates": f"""
        WITH wfp AS ({ORACLES["winnowing_fingerprints"]}),
        d0 AS (SELECT DISTINCT doc_id, fp FROM wfp),
        d AS (
          SELECT doc_id, fp FROM (
            SELECT doc_id, fp,
                   COUNT(*) OVER (PARTITION BY fp) AS g
            FROM d0)
          WHERE g BETWEEN 2 AND 50)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_shared
        FROM d a JOIN d b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    """,
    "knn_beam_ndcg": _materialize(f"""
        WITH {_BUCKETS_CTE},{_beam_edges_sql()}{_beam_visited_sql()},
        approx AS (
          SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY qs DESC, vec_id ASC)
                   AS rank
          FROM (SELECT vec_id, qs FROM visited8
                ORDER BY qs DESC, vec_id ASC LIMIT 10)),
        exact AS (SELECT vec_id FROM scored
                  ORDER BY qs DESC, vec_id ASC LIMIT 10),
        rels AS (
          SELECT a.rank,
                 CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END
                   AS rel
          FROM approx a LEFT JOIN exact x USING (vec_id)),
        dd AS (
          SELECT list_reduce(list(CAST(rel * ({_NDCG_W})[CAST(rank AS INT)]
                                    AS DOUBLE)
                               ORDER BY rank), (x, y) -> x + y) AS dcg
          FROM rels)
        SELECT CAST(10 AS INT) AS k, dcg,
               4.543559338088346 AS ideal_dcg,
               dcg / 4.543559338088346 AS ndcg
        FROM dd
    """),
    "payload_magic_types": """
        WITH p AS (SELECT encode(text) AS payload FROM documents)
        SELECT upper(left(hex(payload), 4)) AS magic_hex,
               COUNT(*) AS n_payloads,
               CAST(SUM(octet_length(payload)) AS BIGINT)
                 AS total_bytes
        FROM p GROUP BY 1
    """,
})


ORACLES.update({
    "doc_char_entropy": f"""
        WITH d AS (
          SELECT doc_id, string_split(text, '') AS cs0
          FROM documents WHERE len(string_split(text, '')) > 0),
        cs AS (
          SELECT doc_id, cs0,
                 list_transform(list_distinct(cs0),
                   x -> len(list_filter(cs0, y -> y = x))) AS cnts
          FROM d)
        SELECT doc_id,
               CAST(len(cs0) AS INT) AS n_chars,
               CAST(len(cnts) AS INT) AS n_distinct_chars,
               CAST(list_sum(list_transform(cnts, c ->
                 CAST(floor(c * ln(len(cs0) / CAST(c AS DOUBLE))
                   * {ENTROPY_GRID} + 0.5) AS BIGINT))) AS BIGINT)
                 AS h_units,
               CAST(list_sum(list_transform(cnts, c ->
                 CAST(floor(c * ln(len(cs0) / CAST(c AS DOUBLE))
                   * {ENTROPY_GRID} + 0.5) AS BIGINT))) AS DOUBLE)
                 / {ENTROPY_GRID} / len(cs0) AS entropy_nats
        FROM cs
    """,
    "doc_script_mix": """
        SELECT doc_id,
               CAST(length(text) AS INT) AS n_chars,
               CAST(length(text) - length(regexp_replace(
                 text, '[^a-zA-Z]', '', 'g')) AS INT) AS n_latin,
               CAST(length(text) - length(regexp_replace(
                 text, '[^0-9]', '', 'g')) AS INT) AS n_digit,
               CAST(length(text) - length(regexp_replace(
                 text, '[^一-鿿]', '', 'g')) AS INT) AS n_cjk,
               CAST(length(text) - length(regexp_replace(
                 text, '[^ ]', '', 'g')) AS INT) AS n_space,
               CAST(CASE WHEN length(text) - length(regexp_replace(
                      text, '[^a-zA-Z]', '', 'g')) > 0
                     AND length(text) - length(regexp_replace(
                      text, '[^一-鿿]', '', 'g')) > 0
                    THEN 1 ELSE 0 END AS INT) AS is_mixed_script
        FROM documents
    """,
    "template_prefix_groups": f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks FROM documents
          WHERE len({TOKS}) >= 8)
        SELECT array_to_string(toks[1:8], ' ') AS prefix,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS exemplar_doc_id
        FROM d GROUP BY 1 HAVING COUNT(*) >= 2
    """,
    "priority_transition_matrix": """
        WITH j AS (
          SELECT LAG(o_orderpriority) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)
                   AS from_priority,
                 o_orderpriority AS to_priority
          FROM orders)
        SELECT from_priority, to_priority,
               COUNT(*) AS n_transitions
        FROM j WHERE from_priority IS NOT NULL
        GROUP BY 1, 2
    """,
    "embedding_outliers_diag": """
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                        AS BIGINT)) AS q
          FROM embeddings),
        pervec AS (
          SELECT vec_id, i - 1 AS i, q[CAST(i AS INT)] AS qi
          FROM e, (SELECT unnest(range(1, 65)) AS i)),
        dims AS (
          SELECT i, COUNT(*) AS n,
                 CAST(SUM(qi) AS DECIMAL(38,0)) AS sx,
                 CAST(SUM(qi * qi) AS DECIMAL(38,0)) AS sxx
          FROM pervec GROUP BY i),
        stats AS (
          SELECT i,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                 sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                   AS sd
          FROM dims),
        terms AS (
          SELECT d.vec_id,
                 CASE WHEN s.sd > 0 THEN
                   CAST(floor(((CAST(d.qi AS DOUBLE) - s.mu) / s.sd)
                     * ((CAST(d.qi AS DOUBLE) - s.mu) / s.sd)
                     * 1000000.0 + 0.5) AS BIGINT)
                 ELSE 0 END AS u
          FROM pervec d JOIN stats s USING (i)),
        sc AS (SELECT vec_id, CAST(SUM(u) AS BIGINT) AS score_units
               FROM terms GROUP BY vec_id)
        SELECT vec_id, score_units,
               CAST(score_units AS DOUBLE) / 1000000.0
                 AS maha_diag_sq
        FROM sc ORDER BY score_units DESC, vec_id ASC LIMIT 20
    """,
})


ORACLES.update({
    "late_delivery_root_cause": """
        WITH li AS (
          SELECT o.o_orderpriority, l.l_returnflag,
                 CASE WHEN l.l_shipdate > o.o_orderdate
                      + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
          FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey),
        cells AS (
          SELECT o_orderpriority, l_returnflag,
                 CAST(COUNT(*) AS BIGINT) AS n_items,
                 CAST(SUM(late) AS BIGINT) AS n_late
          FROM li GROUP BY 1, 2),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
                       CAST(SUM(late) AS BIGINT) AS late_all
                FROM li)
        SELECT o_orderpriority, l_returnflag, n_items, n_late,
               CAST(n_late AS DOUBLE) / n_items AS late_rate,
               (CAST(n_late AS DOUBLE) / n_items)
                 / (CAST(late_all AS DOUBLE) / n_all) AS lift
        FROM cells, tot
    """,
    "supplier_part_price_spread": f"""
        WITH per_sup AS (
          SELECT l_partkey, l_suppkey,
                 {DSUM('l_extendedprice')} AS ext,
                 {DSUM('l_quantity')} AS qty
          FROM lineitem GROUP BY 1, 2),
        g AS (
          SELECT l_partkey,
                 CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                 MIN(ext / qty) AS min_price,
                 MAX(ext / qty) AS max_price
          FROM per_sup GROUP BY 1)
        SELECT l_partkey, n_suppliers, min_price, max_price,
               (max_price - min_price) / min_price AS rel_spread
        FROM g WHERE n_suppliers >= 2
        ORDER BY rel_spread DESC, l_partkey ASC LIMIT 25
    """,
    "events_anomaly_days": """
        WITH daily AS (
          SELECT datediff('day', DATE '1970-01-01',
                          CAST(ts AS DATE)) AS eday,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1),
        d2 AS (
          SELECT eday, n_events,
                 CAST(((eday - 4) % 7 + 7) % 7 AS INT) AS weekday
          FROM daily),
        base AS (
          SELECT weekday, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(n_events) AS BIGINT) AS s1,
                 CAST(SUM(n_events * n_events) AS BIGINT) AS s2
          FROM d2 GROUP BY 1),
        fences AS (
          SELECT weekday,
                 CAST(s1 AS DOUBLE) / n_days AS mu,
                 sqrt(CAST(s2 AS DOUBLE) / n_days
                      - (CAST(s1 AS DOUBLE) / n_days)
                        * (CAST(s1 AS DOUBLE) / n_days)) AS sd
          FROM base)
        SELECT strftime(DATE '1970-01-01'
                 + TO_DAYS(CAST(eday AS INT)), '%Y-%m-%d') AS day,
               weekday, n_events, mu,
               (CAST(n_events AS DOUBLE) - mu) / sd AS z_score
        FROM d2 JOIN fences USING (weekday)
        WHERE sd > 0 AND abs((CAST(n_events AS DOUBLE) - mu) / sd) > 1.4
    """,
})


ORACLES.update({
    "user_active_day_streaks": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 datediff('day', DATE '1970-01-01',
                          CAST(ts AS DATE)) AS eday
          FROM events),
        isl AS (
          SELECT user_id,
                 eday - ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY eday) AS grp
          FROM ud),
        streaks AS (
          SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
          FROM isl GROUP BY 1, 2)
        SELECT user_id,
               MAX(len) AS max_streak_days,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               CAST(SUM(len) AS BIGINT) AS n_active_days
        FROM streaks GROUP BY user_id
    """,
    # distributed row index -> idx*10 DIV n decile cut (NOT NTILE:
    # same formula both engines, rank-machinery-compatible)
    "customer_spend_decile_profile": """
        WITH cust AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DECIMAL(38,6)) AS spend
          FROM orders GROUP BY o_custkey),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust),
        ranked AS (
          SELECT spend,
                 CAST(ROW_NUMBER() OVER (ORDER BY spend DESC,
                                         o_custkey ASC) - 1
                      AS BIGINT) AS idx
          FROM cust),
        dd AS (
          SELECT CAST(idx * 10 // n AS INT) AS decile, spend
          FROM ranked, n),
        tot AS (SELECT CAST(SUM(spend) AS DECIMAL(38,6)) AS tot
                FROM cust)
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(CAST(SUM(spend) AS DECIMAL(38,6)) AS DOUBLE)
                 AS total_spend,
               CAST(CAST(SUM(spend) AS DECIMAL(38,6)) AS DOUBLE)
                 / CAST(tot AS DOUBLE) AS spend_share,
               CAST(CAST(SUM(spend) AS DECIMAL(38,6)) AS DOUBLE)
                 / COUNT(*) AS avg_spend
        FROM dd, tot
        GROUP BY decile, tot
    """,
})


ORACLES.update({
    # composes the pq_codes twin; entropy terms micro-nat-quantized
    "pq_code_utilization": f"""
        WITH pq AS ({ORACLES['pq_codes']}),
        counts AS (
          SELECT m, code, CAST(COUNT(*) AS BIGINT) AS c
          FROM pq GROUP BY m, code),
        per AS (
          SELECT m, c,
                 CAST(SUM(c) OVER (PARTITION BY m) AS BIGINT) AS n,
                 CAST(MAX(c) OVER (PARTITION BY m) AS BIGINT) AS top
          FROM counts),
        u AS (
          SELECT m, c, n, top,
                 CAST(floor(c * ln(CAST(n AS DOUBLE)
                                   / CAST(c AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS uu
          FROM per)
        SELECT m, CAST(COUNT(*) AS INT) AS n_codes_used,
               MAX(top) AS top_code_count,
               MAX(n) AS n_vectors,
               CAST(SUM(uu) AS DOUBLE) / 1000000 / MAX(n)
                 AS code_entropy_nats
        FROM u GROUP BY m
    """,
    "cume_dist_value_probes": """
        WITH ev AS (
          SELECT event_type, value FROM events
          WHERE value IS NOT NULL),
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN value <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN value <= 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN value <= 75.0 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                 CAST(SUM(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
                 CAST(SUM(CASE WHEN value <= 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
                 CAST(SUM(CASE WHEN value <= 200.0 THEN 1 ELSE 0 END) AS BIGINT) AS c6
          FROM ev GROUP BY event_type)
        SELECT event_type, p.probe,
               CASE p.i WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2
                        WHEN 3 THEN c3 WHEN 4 THEN c4 WHEN 5 THEN c5
                        ELSE c6 END AS n_le,
               n,
               CAST(CASE p.i WHEN 0 THEN c0 WHEN 1 THEN c1
                             WHEN 2 THEN c2 WHEN 3 THEN c3
                             WHEN 4 THEN c4 WHEN 5 THEN c5
                             ELSE c6 END AS DOUBLE) / n AS cume_dist
        FROM g, (VALUES (0, 0.0), (1, 25.0), (2, 50.0), (3, 75.0),
                        (4, 100.0), (5, 150.0), (6, 200.0))
             AS p(i, probe)
    """,
    "monthly_status_mix": """
        WITH g AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 o_orderstatus,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1, 2)
        SELECT month, o_orderstatus, n_orders,
               CAST(n_orders AS DOUBLE)
                 / SUM(n_orders) OVER (PARTITION BY month)
                 AS status_share
        FROM g
    """,
})


ORACLES.update({
    # dense bitmap words (62-bit lanes), popcount folds; the n_both
    # column doubles as an exact-distinct intersection cross-check
    "audience_bitmap_intersection": """
        WITH ev AS (
          SELECT DISTINCT event_type, user_id FROM events
          WHERE event_type IN ('click', 'purchase')),
        words AS (
          SELECT event_type, user_id // 62 AS blk,
                 bit_or(CAST(1 AS BIGINT)
                        << CAST(user_id % 62 AS INT)) AS w
          FROM ev GROUP BY 1, 2),
        a AS (SELECT blk, w AS wa FROM words
              WHERE event_type = 'click'),
        b AS (SELECT blk, w AS wb FROM words
              WHERE event_type = 'purchase'),
        j AS (
          SELECT COALESCE(a.wa, 0) AS wa, COALESCE(b.wb, 0) AS wb
          FROM a FULL OUTER JOIN b USING (blk))
        SELECT CAST(SUM(bit_count(wa)) AS BIGINT) AS n_click,
               CAST(SUM(bit_count(wb)) AS BIGINT) AS n_purchase,
               CAST(SUM(bit_count(wa & wb)) AS BIGINT) AS n_both,
               CAST(SUM(bit_count(wa | wb)) AS BIGINT) AS n_either,
               CAST(SUM(bit_count(wa & wb)) AS DOUBLE)
                 / SUM(bit_count(wa | wb)) AS jaccard
        FROM j
    """,
})


ORACLES.update({
    # Karp-Rabin content-defined chunk boundaries mirrored list-wise
    "payload_cdc_dedup_stats": """
        WITH p AS (
          SELECT doc_id, hex(encode(text)) AS hx FROM documents
          WHERE octet_length(encode(text)) >= 8),
        c AS (
          SELECT doc_id, hx,
                 list_transform(range(1, length(hx) // 2 + 1), i ->
                   CAST(('0x' || substring(hx, CAST(2*i - 1 AS INT),
                                           2))::INT64 AS BIGINT))
                   AS codes
          FROM p),
        b AS (
          SELECT doc_id, hx, codes,
                 list_filter(
                   list_transform(range(8, len(codes) + 1), i ->
                     CASE WHEN list_reduce(
                            codes[CAST(i - 8 + 1 AS INT)
                                  : CAST(i AS INT)],
                            (acc, x) -> (acc * 257 + x)
                                        % 1000000007)
                          % 64 = 0
                     THEN i ELSE -1 END), x -> x > 0) AS bnd
          FROM c),
        e AS (
          SELECT doc_id, hx,
                 list_sort(list_distinct(
                   list_append(bnd, len(codes)))) AS ends
          FROM b),
        spans AS (
          SELECT doc_id, hx,
                 unnest(list_transform(range(1, len(ends) + 1), j ->
                   struct_pack(
                     lo := CASE WHEN j = 1 THEN 0
                                ELSE ends[CAST(j - 1 AS INT)] END,
                     hi := ends[CAST(j AS INT)]))) AS s
          FROM e),
        chunks AS (
          SELECT CAST(s.hi - s.lo AS BIGINT) AS clen,
                 md5(substring(hx, CAST(2*s.lo + 1 AS INT),
                               CAST(2*(s.hi - s.lo) AS INT))) AS ch
          FROM spans),
        g AS (
          SELECT ch, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MAX(clen) AS BIGINT) AS clen
          FROM chunks GROUP BY ch)
        SELECT CAST(SUM(n) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
               CAST(SUM(n * clen) AS BIGINT) AS total_bytes,
               CAST(SUM(clen) AS BIGINT) AS distinct_bytes,
               1.0 - CAST(SUM(clen) AS DOUBLE) / SUM(n * clen)
                 AS dedup_ratio
        FROM g
    """,
})

# -- round-7 wave 1: corpus-LM quality, Gopher rule battery, robust
# trend tests, single-pass label-cohesion audit ------------------------

_G_NGRAMS = {
    n: ("list_transform(range(1, len(toks) - %d + 2), i -> concat_ws(' ', %s))"
        % (n, ", ".join(f"toks[i + {j}]" for j in range(n))))
    for n in (2, 3, 5)
}


def _g_cnts(col: str) -> str:
    return (f"list_transform(list_distinct({col}), "
            f"x -> len(list_filter({col}, y -> y = x)))")


def _g_top_mass(col: str) -> str:
    # max count, then max char length among the count-tied grams
    return (
        f"CAST(list_max({_g_cnts(col)}) AS BIGINT) * "
        f"CAST(list_max(list_transform(list_filter(list_distinct({col}), "
        f"x -> len(list_filter({col}, y -> y = x)) = list_max({_g_cnts(col)})), "
        f"x -> length(x))) AS BIGINT)")


def _g_dup_mass(col: str) -> str:
    return (
        f"COALESCE(CAST(list_sum(list_transform(list_distinct({col}), "
        f"x -> CASE WHEN len(list_filter({col}, y -> y = x)) >= 2 "
        f"THEN CAST(len(list_filter({col}, y -> y = x)) AS BIGINT) * length(x) "
        f"ELSE 0 END)) AS BIGINT), 0)")


_DAILY_REV = """
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
          FROM orders GROUP BY 1"""

ORACLES.update({
    "unigram_logprob_quality": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents
                   WHERE len({TOKS}) > 0),
        p AS (
          SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens, u.tok AS tok,
                 CAST(len(list_filter(toks, y -> y = u.tok)) AS BIGINT) AS c
          FROM d, unnest(list_distinct(toks)) AS u(tok)),
        f AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS tf FROM p GROUP BY tok),
        tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM f)
        SELECT doc_id, n_tokens,
               CAST(SUM(c * CAST(floor(ln(CAST((SELECT total FROM tot) AS DOUBLE)
                     / CAST(tf AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
                 AS BIGINT) AS nll_units,
               CAST(SUM(c * CAST(floor(ln(CAST((SELECT total FROM tot) AS DOUBLE)
                     / CAST(tf AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
                 AS BIGINT) / 1000000.0 / n_tokens AS mean_nll
        FROM p JOIN f USING (tok)
        GROUP BY doc_id, n_tokens
    """,
    "gopher_ngram_fractions": f"""
        WITH d AS (
          SELECT doc_id, CAST(length(text) AS INT) AS n_chars, {TOKS} AS toks
          FROM documents WHERE len({TOKS}) >= 5),
        g AS (
          SELECT doc_id, n_chars, CAST(len(toks) AS INT) AS n_tokens,
                 {_G_NGRAMS[2]} AS g2, {_G_NGRAMS[3]} AS g3,
                 {_G_NGRAMS[5]} AS g5
          FROM d)
        SELECT doc_id, n_tokens,
               {_g_top_mass('g2')} / n_chars AS top2_frac,
               {_g_top_mass('g3')} / n_chars AS top3_frac,
               {_g_dup_mass('g5')} / n_chars AS dup5_frac
        FROM g
    """,
    "gopher_quality_rules": f"""
        WITH d AS (
          SELECT source,
                 CAST(len({TOKS}) AS INT) AS n_tok,
                 COALESCE(CAST(list_sum(list_transform({TOKS},
                   x -> CAST(length(x) AS BIGINT))) AS BIGINT), 0) AS char_mass,
                 CAST(len(list_distinct(list_filter({TOKS},
                   x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))))
                   AS INT) AS n_stop_types,
                 CAST(len(list_filter({TOKS},
                   x -> regexp_matches(x, '[a-zA-Z]'))) AS INT) AS n_alpha
          FROM documents),
        r AS (
          SELECT source,
            CASE WHEN n_tok >= 50 AND n_tok <= 100000 THEN 1 ELSE 0 END AS p_words,
            CASE WHEN char_mass >= 3.0 * n_tok AND char_mass <= 10.0 * n_tok
                 THEN 1 ELSE 0 END AS p_meanlen,
            CASE WHEN n_stop_types >= 2 THEN 1 ELSE 0 END AS p_stop,
            CASE WHEN n_alpha * 10 >= n_tok * 8 THEN 1 ELSE 0 END AS p_alpha
          FROM d)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(p_words) AS BIGINT) AS pass_words,
               CAST(SUM(p_meanlen) AS BIGINT) AS pass_meanlen,
               CAST(SUM(p_stop) AS BIGINT) AS pass_stopwords,
               CAST(SUM(p_alpha) AS BIGINT) AS pass_alpha,
               CAST(SUM(p_words * p_meanlen * p_stop * p_alpha) AS BIGINT)
                 AS pass_all,
               CAST(SUM(p_words * p_meanlen * p_stop * p_alpha) AS BIGINT)
                 / CAST(COUNT(*) AS BIGINT) AS pass_rate
        FROM r GROUP BY source
    """,
    "hapax_share_by_source": f"""
        WITH d AS (SELECT source, {TOKS} AS toks FROM documents
                   WHERE len({TOKS}) > 0),
        p AS (
          SELECT source, u.tok AS tok,
                 CAST(len(list_filter(toks, y -> y = u.tok)) AS BIGINT) AS c
          FROM d, unnest(list_distinct(toks)) AS u(tok)),
        tf AS (SELECT source, tok, CAST(SUM(c) AS BIGINT) AS tf
               FROM p GROUP BY 1, 2)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hapax_count,
               CAST(SUM(tf) AS BIGINT) AS token_mass,
               CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 / CAST(COUNT(*) AS BIGINT) AS hapax_share
        FROM tf GROUP BY source
    """,
    "theil_sen_daily_trend": f"""
        WITH daily AS ({_DAILY_REV}),
        p AS (
          SELECT CAST(b.rev - a.rev AS DOUBLE)
                 / CAST(date_diff('day', a.d, b.d) AS DOUBLE) AS slope
          FROM daily a JOIN daily b ON b.d > a.d)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               (SELECT slope FROM p ORDER BY slope
                LIMIT 1 OFFSET (SELECT (COUNT(*) + 1) // 2 - 1 FROM p))
                 AS ts_slope
        FROM p
    """,
    "mann_kendall_trend": f"""
        WITH daily AS ({_DAILY_REV}),
        p AS (
          SELECT CASE WHEN b.rev > a.rev THEN 1
                      WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
          FROM daily a JOIN daily b ON b.d > a.d),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_concordant,
                 CAST(SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_discordant,
                 CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tied
          FROM p),
        meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
        SELECT n_days, n_pairs,
               n_concordant - n_discordant AS s_stat,
               n_concordant, n_discordant, n_tied,
               floor(CAST(n_concordant - n_discordant AS DOUBLE)
                 / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1)
                    / 2.0) * 1e9 + 0.5) / 1e9 AS tau,
               floor(CASE
                 WHEN n_concordant - n_discordant > 0 THEN
                   (CAST(n_concordant - n_discordant AS DOUBLE) - 1)
                   / sqrt(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1)
                          * (2 * CAST(n_days AS DOUBLE) + 5) / 18.0)
                 WHEN n_concordant - n_discordant < 0 THEN
                   (CAST(n_concordant - n_discordant AS DOUBLE) + 1)
                   / sqrt(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1)
                          * (2 * CAST(n_days AS DOUBLE) + 5) / 18.0)
                 ELSE 0.0 END * 1e9 + 0.5) / 1e9 AS z_score
        FROM m, meta
    """,
    "intra_inter_cosine_gap": f"""
        WITH q AS (
          SELECT vec_id, label,
                 list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE)
                     / sqrt({DOT_Q.format(a='embedding', b='embedding')})
                     * 1000000 + 0.5) AS BIGINT)) AS qv
          FROM embeddings),
        rowsq AS (
          SELECT label, CAST(list_sum(list_transform(qv, v -> v * v))
                   AS BIGINT) AS qq, qv
          FROM q),
        e AS (SELECT label, i - 1 AS dim, qv[CAST(i AS INT)] AS x
              FROM rowsq, (SELECT unnest(range(1, 65)) AS i)),
        s AS (SELECT label, dim, CAST(SUM(x) AS BIGINT) AS s
              FROM e GROUP BY 1, 2),
        own AS (SELECT label,
                  SUM(CAST(CAST(s AS DECIMAL(38,0)) * s AS DECIMAL(38,0)))
                    AS own_ss
                FROM s GROUP BY 1),
        g AS (SELECT dim, CAST(SUM(s) AS BIGINT) AS gs FROM s GROUP BY 1),
        cr AS (SELECT s.label,
                 SUM(CAST(CAST(s.s AS DECIMAL(38,0)) * (g.gs - s.s)
                   AS DECIMAL(38,0))) AS cross_ss
               FROM s JOIN g USING (dim) GROUP BY 1),
        c AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(qq) AS BIGINT) AS qq
              FROM rowsq GROUP BY 1),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c)
        SELECT c.label, c.n AS n_vecs,
          CASE WHEN c.n > 1 THEN
            CAST(own.own_ss - c.qq AS DOUBLE)
              / (CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1)) / 1e12
          END AS intra_avg_cos,
          CASE WHEN c.n < tot.n_total THEN
            CAST(cr.cross_ss AS DOUBLE)
              / (CAST(c.n AS DOUBLE) * CAST(tot.n_total - c.n AS DOUBLE))
              / 1e12
          END AS inter_avg_cos,
          CASE WHEN c.n > 1 THEN
            CAST(own.own_ss - c.qq AS DOUBLE)
              / (CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1)) / 1e12
          END - CASE WHEN c.n < tot.n_total THEN
            CAST(cr.cross_ss AS DOUBLE)
              / (CAST(c.n AS DOUBLE) * CAST(tot.n_total - c.n AS DOUBLE))
              / 1e12
          END AS cos_gap
        FROM c JOIN own USING (label) JOIN cr USING (label)
        CROSS JOIN tot
    """,
})

# -- round-7 wave 2: MMR serving, Poisson bootstrap, DSIR weights ------

# one md5 per (row, group-of-4); segment sg in 0..3 slices 8 hex chars
_PB_SEG = ("substr(md5('pb|' || CAST(g.g AS VARCHAR) || '|' "
           "|| CAST(event_id AS VARCHAR)), CAST(s.sg * 8 + 1 AS INT), 8)")
_PB_U = ("CAST(list_sum(list_transform(range(1, 9), "
         f"i -> (strpos('0123456789abcdef', substr({_PB_SEG}, "
         "CAST(i AS INT), 1)) - 1) "
         "* (CAST(1 AS BIGINT) << CAST(4 * (8 - i) AS INT)))) AS BIGINT)"
         " % 1000000")
_PB_W = " + ".join(
    f"CASE WHEN {_PB_U} >= {c} THEN 1 ELSE 0 END"
    for c in (367879, 735759, 919699, 981012, 996340, 999406, 999917))


def _mmr_step(step: int) -> str:
    prev = f"s{step - 1}"
    cos = _cos('p.embedding', 's.embedding')
    return f"""
        p{step} AS (
          SELECT p.vec_id, p.label, p.embedding, p.rel,
                 CAST({step} AS INT) AS rank,
                 0.7 * p.rel - 0.3 * MAX({cos}) AS mmr_score
          FROM pool p, {prev} s
          WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev})
          GROUP BY p.vec_id, p.label, p.embedding, p.rel
          ORDER BY mmr_score DESC, p.vec_id ASC LIMIT 1),
        s{step} AS (SELECT * FROM {prev} UNION ALL
                    SELECT * FROM p{step})"""


ORACLES.update({
    "mmr_diversified_topk": f"""
        WITH pool AS (
          SELECT e.vec_id, e.label, e.embedding,
                 {_cos('e.embedding', 'qv.q')} AS rel
          FROM embeddings e,
               (SELECT embedding AS q FROM embeddings
                WHERE vec_id = 0) qv
          WHERE e.vec_id <> 0
          ORDER BY rel DESC, e.vec_id ASC LIMIT 20),
        s1 AS (
          SELECT vec_id, label, embedding, rel, CAST(1 AS INT) AS rank,
                 rel AS mmr_score
          FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1),
        {",".join(_mmr_step(k) for k in range(2, 6))}
        SELECT rank, vec_id, label, rel, mmr_score FROM s5
    """,
    "poisson_bootstrap_ci": f"""
        WITH ev AS (
          SELECT event_id,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events WHERE value IS NOT NULL),
        reps AS (
          SELECT g.g * 4 + s.sg AS b, ev.vu AS vu,
                 CAST({_PB_W} AS BIGINT) AS w
          FROM ev, (SELECT unnest(range(0, 16)) AS g) g,
               (SELECT unnest(range(0, 4)) AS sg) s),
        means AS (
          SELECT b, CAST(SUM(w * vu) AS BIGINT) / 10000.0
                    / CAST(SUM(w) AS BIGINT) AS m
          FROM reps GROUP BY b),
        ranked AS (
          SELECT m, ROW_NUMBER() OVER (ORDER BY m ASC, b ASC) AS rk
          FROM means),
        ci AS (
          SELECT MAX(CASE WHEN rk = 2 THEN m END) AS ci_lo,
                 MAX(CASE WHEN rk = 63 THEN m END) AS ci_hi,
                 CAST(COUNT(*) AS BIGINT) AS n_reps
          FROM ranked)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ev) AS n_rows,
               (SELECT CAST(SUM(vu) AS BIGINT) / 10000.0 / COUNT(*)
                FROM ev) AS mean_value,
               n_reps, ci_lo, ci_hi
        FROM ci
    """,
    "dsir_importance_weights": f"""
        WITH d AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents
                   WHERE len({TOKS}) >= 2),
        bg AS (
          -- outer lambda var must NOT be `i`: _HEX8_TO_INT's inner
          -- list_transform binds `i` and would shadow it
          SELECT doc_id, lang,
                 list_transform(range(1, len(toks)), g ->
                   {_HEX8_TO_INT("'dsir|' || toks[CAST(g AS INT)] || ' ' || toks[CAST(g AS INT) + 1]")}
                   % 10000) AS bgs
          FROM d),
        p AS (
          SELECT doc_id, lang, u.bkt AS bkt,
                 CAST(len(list_filter(bgs, y -> y = u.bkt)) AS BIGINT)
                   AS c
          FROM bg, unnest(list_distinct(bgs)) AS u(bkt)),
        raw AS (SELECT bkt, CAST(SUM(c) AS BIGINT) AS cr
                FROM p GROUP BY bkt),
        tgt AS (SELECT bkt, CAST(SUM(c) AS BIGINT) AS ct
                FROM p WHERE lang = 'en' GROUP BY bkt),
        prof AS (SELECT raw.bkt AS bkt, cr, COALESCE(ct, 0) AS ct
                 FROM raw LEFT JOIN tgt USING (bkt)),
        tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr,
                       CAST(SUM(ct) AS BIGINT) AS nt FROM prof),
        lam AS (
          SELECT bkt,
                 CAST(floor((ln(CAST(ct + 1 AS DOUBLE)
                               / CAST(nt + 10000 AS DOUBLE))
                             - ln(CAST(cr + 1 AS DOUBLE)
                                  / CAST(nr + 10000 AS DOUBLE)))
                   * 1000000 + 0.5) AS BIGINT) AS lam
          FROM prof, tot)
        SELECT p.doc_id, p.lang,
               CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(SUM(c * lam) AS BIGINT) AS liw_units,
               CAST(SUM(c * lam) AS BIGINT) / 1000000.0
                 AS log_importance_weight
        FROM p JOIN lam USING (bkt)
        GROUP BY p.doc_id, p.lang
    """,
})

# -- round-7 wave 3: Welch t-test, A-ES weighted sample, KM survival ---

_W_VU = "CAST(floor(value * 10000 + 0.5) AS BIGINT)"


def _w_mean(s: str, n: str) -> str:
    return f"(CAST({s} AS DOUBLE) / 10000.0 / CAST({n} AS DOUBLE))"


def _w_var(sxx: str, s: str, n: str) -> str:
    m = _w_mean(s, n)
    return (f"((CAST({sxx} AS DOUBLE) / 100000000.0"
            f" - CAST({n} AS DOUBLE) * {m} * {m})"
            f" / (CAST({n} AS DOUBLE) - 1))")


_W_QA = f"({_w_var('sxxa', 'sa', 'na')} / CAST(na AS DOUBLE))"
_W_QB = f"({_w_var('sxxb', 'sb', 'nb')} / CAST(nb AS DOUBLE))"


def _grid9(x: str) -> str:
    return f"floor(({x}) * 1e9 + 0.5) / 1e9"


ORACLES.update({
    "welch_ttest_values": f"""
        WITH g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM({_W_VU}) AS DECIMAL(38,0)) AS s,
                 SUM(CAST(CAST({_W_VU} AS DECIMAL(38,0)) * {_W_VU}
                     AS DECIMAL(38,0))) AS sxx
          FROM events
          WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
          GROUP BY event_type),
        j AS (
          SELECT a.n AS na, a.s AS sa, a.sxx AS sxxa,
                 b.n AS nb, b.s AS sb, b.sxx AS sxxb
          FROM (SELECT * FROM g WHERE event_type = 'purchase') a,
               (SELECT * FROM g WHERE event_type = 'view') b)
        SELECT na, nb,
               {_grid9(_w_mean('sa', 'na'))} AS mean_a,
               {_grid9(_w_mean('sb', 'nb'))} AS mean_b,
               {_grid9(f"({_w_mean('sa', 'na')} - {_w_mean('sb', 'nb')})"
                       f" / sqrt({_W_QA} + {_W_QB})")} AS t_stat,
               {_grid9(f"(({_W_QA} + {_W_QB}) * ({_W_QA} + {_W_QB}))"
                       f" / ({_W_QA} * {_W_QA} / (CAST(na AS DOUBLE) - 1)"
                       f"    + {_W_QB} * {_W_QB} / (CAST(nb AS DOUBLE) - 1))"
                       )} AS welch_df
        FROM j
    """,
    "weighted_sample_docs": f"""
        WITH k AS (
          SELECT doc_id, source, n_chars,
                 ({_HEX8_TO_INT("'aes|' || CAST(doc_id AS VARCHAR)")}
                  % 1000000) + 1 AS u_ppm
          FROM documents)
        SELECT doc_id, source, n_chars, u_ppm,
               CAST(floor(ln(CAST(u_ppm AS DOUBLE) / 1000000)
                 / CAST(n_chars AS DOUBLE) * 1e12 + 0.5) AS BIGINT)
                 AS key_units
        FROM k
        ORDER BY key_units DESC, doc_id ASC
        LIMIT 50
    """,
    "purchase_gap_survival": """
        WITH p AS (
          SELECT user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'purchase'),
        fr AS (SELECT MAX(ts_us) AS fr FROM p),
        g AS (
          SELECT user_id, ts_us,
                 LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                   AS nxt
          FROM p),
        gaps AS (
          SELECT (COALESCE(nxt, fr.fr) - ts_us) // 86400000000 AS gd,
                 CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS observed
          FROM g, fr),
        risk AS (
          SELECT gd, CAST(SUM(observed) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM gaps GROUP BY gd),
        tbl AS (
          SELECT gd, d,
                 CAST(SUM(c) OVER (ORDER BY gd DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_risk
          FROM risk),
        folded AS (
          SELECT list(struct_pack(gd := gd, d := d, n_risk := n_risk)
                      ORDER BY gd) AS rows
          FROM tbl WHERE d > 0)
        SELECT rows[CAST(i AS INT)].gd AS gd,
               rows[CAST(i AS INT)].n_risk AS n_risk,
               rows[CAST(i AS INT)].d AS d,
               list_reduce(
                 list_prepend(CAST(1.0 AS DOUBLE),
                   list_transform(list_slice(rows, 1, CAST(i AS INT)),
                     x -> CAST(1.0 AS DOUBLE)
                          - CAST(x.d AS DOUBLE)
                          / CAST(x.n_risk AS DOUBLE))),
                 (a, b) -> a * b) AS survival
        FROM folded, (SELECT unnest(range(1, 100000)) AS i)
        WHERE i <= len(rows)
    """,
})

# -- round-7 wave 4: CDC chunk-overlap pairs (binary lane) -------------

_CDC_CHUNK_CTES = """
        p AS (
          SELECT doc_id, hex(encode(text)) AS hx FROM documents
          WHERE octet_length(encode(text)) >= 8),
        c AS (
          SELECT doc_id, hx,
                 list_transform(range(1, length(hx) // 2 + 1), i ->
                   CAST(('0x' || substring(hx, CAST(2*i - 1 AS INT),
                                           2))::INT64 AS BIGINT))
                   AS codes
          FROM p),
        b AS (
          SELECT doc_id, hx, codes,
                 list_filter(
                   list_transform(range(8, len(codes) + 1), i ->
                     CASE WHEN list_reduce(
                            codes[CAST(i - 8 + 1 AS INT)
                                  : CAST(i AS INT)],
                            (acc, x) -> (acc * 257 + x)
                                        % 1000000007)
                          % 64 = 0
                     THEN i ELSE -1 END), x -> x > 0) AS bnd
          FROM c),
        e AS (
          SELECT doc_id, hx,
                 list_sort(list_distinct(
                   list_append(bnd, len(codes)))) AS ends
          FROM b),
        spans AS (
          SELECT doc_id, hx,
                 unnest(list_transform(range(1, len(ends) + 1), j ->
                   struct_pack(
                     lo := CASE WHEN j = 1 THEN 0
                                ELSE ends[CAST(j - 1 AS INT)] END,
                     hi := ends[CAST(j AS INT)]))) AS s
          FROM e),
        chunksd AS (
          SELECT doc_id, CAST(s.hi - s.lo AS BIGINT) AS clen,
                 md5(substring(hx, CAST(2*s.lo + 1 AS INT),
                               CAST(2*(s.hi - s.lo) AS INT))) AS ch
          FROM spans),
        chunks AS (
          SELECT doc_id, ch, CAST(MAX(clen) AS BIGINT) AS clen
          FROM chunksd GROUP BY doc_id, ch)"""

ORACLES.update({
    "payload_chunk_overlap_pairs": f"""
        WITH {_CDC_CHUNK_CTES},
        totals AS (
          SELECT doc_id, CAST(SUM(clen) AS BIGINT) AS bytes_total,
                 CAST(COUNT(*) AS BIGINT) AS n_chunks
          FROM chunks GROUP BY doc_id),
        ok AS (SELECT ch FROM (
                 SELECT ch, COUNT(*) AS holders FROM chunks GROUP BY ch)
               WHERE holders <= 64),
        keyed AS (SELECT chunks.* FROM chunks JOIN ok USING (ch)),
        pairs AS (
          SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                 CAST(COUNT(*) AS BIGINT) AS n_common,
                 CAST(SUM(a.clen) AS BIGINT) AS bytes_common
          FROM keyed a JOIN keyed b2 USING (ch)
          WHERE a.doc_id < b2.doc_id
          GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        SELECT doc_a, doc_b, n_common, bytes_common,
               bytes_common / CAST(ta.bytes_total AS DOUBLE)
                 AS containment_a,
               bytes_common / CAST(tb.bytes_total AS DOUBLE)
                 AS containment_b,
               n_common / CAST(ta.n_chunks + tb.n_chunks - n_common
                               AS DOUBLE) AS chunk_jaccard
        FROM pairs
        JOIN totals ta ON ta.doc_id = pairs.doc_a
        JOIN totals tb ON tb.doc_id = pairs.doc_b
    """,
})

# -- round-7 wave 4: approximate-FD profiling --------------------------


def _fd_lane(name: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
        SELECT '{name}' AS fd,
               CAST(SUM(tot) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS violating_groups,
               1.0 - CAST(SUM(keep) AS DOUBLE) / CAST(SUM(tot) AS BIGINT)
                 AS g3_error
        FROM (
          SELECT k, CAST(SUM(c) AS BIGINT) AS tot,
                 CAST(MAX(c) AS BIGINT) AS keep,
                 CAST(COUNT(*) AS BIGINT) AS n_rhs
          FROM (SELECT {lhs} AS k, {rhs} AS v,
                       CAST(COUNT(*) AS BIGINT) AS c
                FROM {table} GROUP BY 1, 2)
          GROUP BY k)"""


ORACLES.update({
    "functional_dependency_audit": " UNION ALL ".join(
        _fd_lane(*fd) for fd in (
            ("orders_cust_to_priority", "orders",
             "o_custkey", "o_orderpriority"),
            ("lineitem_order_to_status", "lineitem",
             "l_orderkey", "l_linestatus"),
            ("lineitem_part_to_supp", "lineitem",
             "l_partkey", "l_suppkey"),
            ("customer_nation_to_segment", "customer",
             "c_nationkey", "c_mktsegment"),
        )),
})

# -- round-7 wave 5: U-shaped attribution, split-conformal intervals --

ORACLES.update({
    "ushape_attribution": """
        WITH pur AS (
          SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        clk AS (
          SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_us,
                 strftime(ts, '%Y-%m-%d') AS day
          FROM events WHERE event_type = 'click'),
        j AS (
          SELECT p.p_id, p.cents, c.c_id, c.c_us, c.day
          FROM pur p JOIN clk c ON c.user_id = p.user_id
          WHERE c.c_us < p.p_us
            AND c.c_us >= p.p_us - 604800000000),
        r AS (
          SELECT *,
                 COUNT(*) OVER (PARTITION BY p_id) AS n_touch,
                 ROW_NUMBER() OVER (PARTITION BY p_id
                   ORDER BY c_us DESC, c_id ASC) AS rk
          FROM j),
        cred AS (
          SELECT day, p_id,
            CAST(CASE
              WHEN n_touch = 1 THEN cents
              WHEN n_touch = 2 THEN cents // 2
                   + CASE WHEN rk = 1 THEN cents % 2 ELSE 0 END
              WHEN rk = 1 OR rk = n_touch THEN cents * 2 // 5
              ELSE (cents - 2 * (cents * 2 // 5)) // (n_touch - 2)
                   + CASE WHEN rk = 2 THEN
                       (cents - 2 * (cents * 2 // 5))
                       - ((cents - 2 * (cents * 2 // 5))
                          // (n_touch - 2)) * (n_touch - 2)
                     ELSE 0 END
            END AS BIGINT) AS credit
          FROM r)
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_credited_clicks,
               CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases,
               CAST(SUM(credit) AS BIGINT) AS credited_cents,
               CAST(SUM(credit) AS BIGINT) / 100.0 AS credited_value
        FROM cred GROUP BY day
    """,
    "conformal_value_intervals": f"""
        WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu,
                 {_HEX8_TO_INT("'conf|' || CAST(event_id AS VARCHAR)")}
                   % 2 AS split
          FROM events WHERE value IS NOT NULL),
        train AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
                 floor(CAST(SUM(vu) AS BIGINT) / 10000.0
                   / CAST(COUNT(*) AS BIGINT) * 1e9 + 0.5) / 1e9
                   AS mean_pred
          FROM ev WHERE split = 0 GROUP BY event_type),
        calib AS (
          SELECT ev.event_type,
                 abs(CAST(vu AS DOUBLE) / 10000.0 - mean_pred) AS resid
          FROM ev JOIN train USING (event_type)
          WHERE split = 1),
        cn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_calib
               FROM calib GROUP BY event_type),
        ranked AS (
          SELECT event_type, resid,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY resid ASC) AS rn
          FROM calib),
        q AS (
          SELECT r.event_type, MIN(r.resid) AS q_resid
          FROM ranked r JOIN cn USING (event_type)
          WHERE r.rn = (9 * (cn.n_calib + 1) + 9) // 10
          GROUP BY r.event_type)
        SELECT t.event_type, t.n_train, cn.n_calib, t.mean_pred,
               q.q_resid,
               t.mean_pred - q.q_resid AS lo,
               t.mean_pred + q.q_resid AS hi
        FROM train t JOIN cn USING (event_type)
        JOIN q USING (event_type)
    """,
})


# round-7 wave 6: rank ANOVA, FDR control, categorical association


def _cramers_pair_sql(tbl: str, a: str, b: str, name: str) -> str:
    """One Cramér's-V pair: contingency cells + marginals, χ² folded
    over the (ka, kb)-sorted cell list (deterministic order — the KM
    list_reduce convention), V gridded to 1e-9."""
    return f"""
        WITH cells AS (
          SELECT {a} AS ka, {b} AS kb, CAST(COUNT(*) AS BIGINT) AS o
          FROM {tbl} GROUP BY 1, 2),
        rt AS (SELECT ka, CAST(SUM(o) AS BIGINT) AS rt
               FROM cells GROUP BY 1),
        ct AS (SELECT kb, CAST(SUM(o) AS BIGINT) AS ct
               FROM cells GROUP BY 1),
        j AS (SELECT ka, kb, o, rt, ct
              FROM cells JOIN rt USING (ka) JOIN ct USING (kb)),
        g AS (
          SELECT list(struct_pack(
                   ka := ka, kb := kb,
                   od := CAST(o AS DOUBLE),
                   rtd := CAST(rt AS DOUBLE),
                   ctd := CAST(ct AS DOUBLE)) ORDER BY ka, kb) AS cells,
                 CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT ka) AS BIGINT) AS r_levels,
                 CAST(COUNT(DISTINCT kb) AS BIGINT) AS c_levels
          FROM j),
        f AS (
          SELECT n, r_levels, c_levels,
                 list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(cells, x ->
                       (x.od - x.rtd * x.ctd / CAST(n AS DOUBLE))
                       * (x.od - x.rtd * x.ctd / CAST(n AS DOUBLE))
                       / (x.rtd * x.ctd / CAST(n AS DOUBLE)))),
                   (acc, v) -> acc + v) AS chi2
          FROM g)
        SELECT '{name}' AS pair, n, r_levels, c_levels,
               floor(chi2 * 1e9 + 0.5) / 1e9 AS chi2,
               CASE WHEN least(r_levels, c_levels) > 1 THEN
                 floor(sqrt(chi2 / (CAST(n AS DOUBLE)
                   * (CAST(least(r_levels, c_levels) AS DOUBLE) - 1.0)))
                   * 1e9 + 0.5) / 1e9 END AS cramers_v
        FROM f"""


ORACLES.update({
    "kruskal_wallis_values": """
        WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events WHERE value IS NOT NULL),
        cell AS (SELECT event_type, vu, CAST(COUNT(*) AS BIGINT) AS c_gv
                 FROM ev GROUP BY 1, 2),
        vals AS (SELECT vu, CAST(SUM(c_gv) AS BIGINT) AS cnt
                 FROM cell GROUP BY 1),
        rk AS (
          SELECT vu, cnt,
                 2 * COALESCE(SUM(cnt) OVER (ORDER BY vu
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + cnt + 1 AS avg2
          FROM vals),
        per AS (
          SELECT event_type, CAST(SUM(c_gv) AS BIGINT) AS n,
                 SUM(CAST(c_gv AS DECIMAL(38,0)) * avg2) AS r2
          FROM cell JOIN rk USING (vu) GROUP BY 1),
        tie AS (
          SELECT SUM(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt)
                   AS tsum
          FROM vals),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
                       CAST(COUNT(*) AS BIGINT) AS k_groups
                FROM per),
        fold AS (
          SELECT list(struct_pack(et := event_type, gn := n,
                                  r2d := CAST(r2 AS DOUBLE))
                      ORDER BY event_type) AS gs
          FROM per),
        s AS (
          SELECT list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(gs, x ->
                       x.r2d * x.r2d / 4.0 / CAST(x.gn AS DOUBLE))),
                   (acc, v) -> acc + v) AS s
          FROM fold),
        h AS (
          SELECT n_total, k_groups,
                 12.0 / (CAST(n_total AS DOUBLE)
                         * (CAST(n_total AS DOUBLE) + 1.0)) * s
                 - 3.0 * (CAST(n_total AS DOUBLE) + 1.0) AS h_raw,
                 CASE WHEN CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                           * CAST(n_total AS DOUBLE)
                           - CAST(n_total AS DOUBLE) > 0.0
                      THEN 1.0 - CAST(tsum AS DOUBLE)
                 / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                    * CAST(n_total AS DOUBLE)
                    - CAST(n_total AS DOUBLE))
                      ELSE 0.0 END AS corr
          FROM tot, s, tie)
        SELECT per.event_type, per.n,
               floor(CAST(per.r2 AS DOUBLE)
                 / (2.0 * CAST(per.n AS DOUBLE)) * 1e9 + 0.5) / 1e9
                 AS mean_rank,
               h.n_total, h.k_groups, h.k_groups - 1 AS df,
               floor(h.h_raw * 1e9 + 0.5) / 1e9 AS h_stat,
               CASE WHEN h.corr > 0.0
                    THEN floor(h.h_raw / h.corr * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS h_adj
        FROM per, h
    """,
    "segment_pvalues_fdr": """
        WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events WHERE value IS NOT NULL),
        per AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(vu) AS DECIMAL(38,0)) AS s,
                 SUM(CAST(vu AS DECIMAL(38,0)) * vu) AS sxx
          FROM ev GROUP BY 1),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                       SUM(s) AS st, SUM(sxx) AS sxxt,
                       CAST(COUNT(*) AS BIGINT) AS k
                FROM per),
        z AS (
          SELECT event_type, n, k,
                 floor(CAST(s AS DOUBLE) / 10000.0 / CAST(n AS DOUBLE)
                   * 1e9 + 0.5) / 1e9 AS mean_value,
                 CASE WHEN (CAST(sxxt AS DOUBLE) / (10000.0 * 10000.0)
                            - CAST(nt AS DOUBLE)
                              * (CAST(st AS DOUBLE) / 10000.0
                                 / CAST(nt AS DOUBLE))
                              * (CAST(st AS DOUBLE) / 10000.0
                                 / CAST(nt AS DOUBLE)))
                           / (CAST(nt AS DOUBLE) - 1.0) <= 0 THEN 0
                 ELSE CAST(floor(
                   (CAST(s AS DOUBLE) / 10000.0 / CAST(n AS DOUBLE)
                    - CAST(st AS DOUBLE) / 10000.0 / CAST(nt AS DOUBLE))
                   * (CAST(s AS DOUBLE) / 10000.0 / CAST(n AS DOUBLE)
                    - CAST(st AS DOUBLE) / 10000.0 / CAST(nt AS DOUBLE))
                   * CAST(n AS DOUBLE)
                   / ((CAST(sxxt AS DOUBLE) / (10000.0 * 10000.0)
                       - CAST(nt AS DOUBLE)
                         * (CAST(st AS DOUBLE) / 10000.0
                            / CAST(nt AS DOUBLE))
                         * (CAST(st AS DOUBLE) / 10000.0
                            / CAST(nt AS DOUBLE)))
                      / (CAST(nt AS DOUBLE) - 1.0))
                   * 1e9 + 0.5) AS BIGINT) END AS z2_ppb
          FROM per, tot),
        ranked AS (
          SELECT event_type, n, k, mean_value, z2_ppb,
                 CASE WHEN z2_ppb <= 1000000000 THEN 1.0
                      ELSE 1e9 / CAST(z2_ppb AS DOUBLE) END AS p_cheb,
                 ROW_NUMBER() OVER (ORDER BY z2_ppb DESC,
                                    event_type ASC) AS bh_rank
          FROM z),
        kstar AS (
          SELECT COALESCE(MAX(CASE WHEN p_cheb <=
                   0.05 * CAST(bh_rank AS DOUBLE) / CAST(k AS DOUBLE)
                   THEN bh_rank END), 0) AS ks
          FROM ranked)
        SELECT event_type, n, mean_value, bh_rank,
               floor(CAST(z2_ppb AS DOUBLE) / 1e9 * 1e9 + 0.5) / 1e9
                 AS z_sq,
               floor(p_cheb * 1e9 + 0.5) / 1e9 AS p_cheb,
               floor(0.05 * CAST(bh_rank AS DOUBLE)
                 / CAST(k AS DOUBLE) * 1e9 + 0.5) / 1e9 AS bh_threshold,
               floor(MIN(least(1.0, p_cheb * CAST(k AS DOUBLE)
                               / CAST(bh_rank AS DOUBLE)))
                 OVER (ORDER BY bh_rank DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1e9 + 0.5) / 1e9 AS q_value,
               CASE WHEN bh_rank <= ks THEN 1 ELSE 0 END AS rejected
        FROM ranked, kstar
    """,
    "cramers_v_audit": (
        "SELECT * FROM ("
        + _cramers_pair_sql("orders", "o_orderpriority", "o_orderstatus",
                            "orders:priority_x_status")
        + ") UNION ALL SELECT * FROM ("
        + _cramers_pair_sql("lineitem", "l_returnflag", "l_linestatus",
                            "lineitem:returnflag_x_linestatus")
        + ") UNION ALL SELECT * FROM ("
        + _cramers_pair_sql(
            "(SELECT event_type, CAST(hour(ts) AS VARCHAR) AS hour"
            " FROM events) ev",
            "event_type", "hour", "events:type_x_hour")
        + ")"),
})


# round-7 wave 7: binary quantization (sign bits vs per-dim mean,
# two packed 32-bit words, Hamming serving + exact rerank cascade)

_BQ_WORDS = """
        ex AS (
          SELECT i - 1 AS dim, vec_id,
                 CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                   * 1000000.0 + 0.5) AS BIGINT) AS xu
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        sums AS (SELECT dim, CAST(SUM(xu) AS BIGINT) AS su,
                        CAST(COUNT(*) AS BIGINT) AS n
                 FROM ex GROUP BY dim),
        words AS (
          SELECT ex.vec_id, ex.dim // 32 AS wi,
                 CAST(SUM(CASE WHEN ex.xu * s.n > s.su
                   THEN (CAST(1 AS BIGINT) << CAST(31 - (ex.dim % 32)
                                                   AS INT))
                   ELSE 0 END) AS BIGINT) AS w
          FROM ex JOIN sums s USING (dim) GROUP BY 1, 2),
        wv AS (
          SELECT e.vec_id, e.label, e.embedding,
                 MAX(CASE WHEN wi = 0 THEN w END) AS w0,
                 MAX(CASE WHEN wi = 1 THEN w END) AS w1
          FROM words JOIN embeddings e USING (vec_id)
          GROUP BY 1, 2, 3),
        q AS (SELECT vec_id AS qid, embedding AS qv,
                     w0 AS qw0, w1 AS qw1
              FROM wv WHERE vec_id < 5),
        ham AS (
          SELECT qid, wv.vec_id, wv.label, wv.embedding, q.qv,
                 CAST(bit_count(xor(wv.w0, q.qw0))
                      + bit_count(xor(wv.w1, q.qw1)) AS INT) AS hamming
          FROM wv CROSS JOIN q WHERE wv.vec_id <> qid)"""

ORACLES.update({
    "knn_bq_hamming": f"""
        WITH {_BQ_WORDS},
        rk AS (
          SELECT qid, vec_id, label, hamming,
                 CAST(ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY hamming ASC, vec_id ASC) AS INT) AS rnk
          FROM ham)
        SELECT qid, vec_id, label, hamming, rnk FROM rk WHERE rnk <= 10
    """,
    "knn_bq_rerank": f"""
        WITH {_BQ_WORDS},
        short AS (
          SELECT qid, vec_id, label, embedding, qv,
                 ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY hamming ASC, vec_id ASC) AS crk
          FROM ham),
        rr AS (
          SELECT qid, vec_id, label,
                 {_cos('embedding', 'qv')} AS cos_sim
          FROM short WHERE crk <= 200),
        rk AS (
          SELECT qid, vec_id, label, cos_sim,
                 CAST(ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rnk
          FROM rr)
        SELECT qid, vec_id, label, cos_sim, rnk FROM rk WHERE rnk <= 10
    """,
    "knn_bq_recall": f"""
        WITH {_BQ_WORDS},
        short AS (
          SELECT qid, vec_id, label, embedding, qv,
                 ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY hamming ASC, vec_id ASC) AS crk
          FROM ham),
        approx AS (
          SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY {_cos('embedding', 'qv')} DESC,
                              vec_id ASC) AS rnk
            FROM short WHERE crk <= 200)
          WHERE rnk <= 10),
        exact AS (
          SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY {_cos('e.embedding', 'q.embedding')} DESC,
                              e.vec_id ASC) AS rnk
            FROM embeddings e
            CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 5) q
            WHERE e.vec_id <> q.vec_id)
          WHERE rnk <= 10),
        hits AS (
          SELECT exact.qid, CAST(COUNT(*) AS INT) AS n_hits
          FROM exact JOIN approx USING (qid, vec_id)
          GROUP BY 1)
        SELECT e.qid, 10 AS k,
               COALESCE(h.n_hits, 0) AS n_hits,
               CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10 AS recall_at_k
        FROM (SELECT DISTINCT qid FROM exact) e
        LEFT JOIN hits h USING (qid)
    """,
})


def _bq_sweep_arm(cand: int) -> str:
    """One candidate-depth arm of the bq_cand_sweep UNION — the same
    shortlist-prefix + rerank + per-query recall chain as
    knn_bq_recall, aggregated to (floor, mean, scan bytes)."""
    return f"""
        SELECT CAST({cand} AS INT) AS cand, CAST(10 AS INT) AS k,
               CAST(COUNT(*) AS INT) AS n_queries,
               CAST(SUM(n_hits) AS INT) AS total_hits,
               CAST(MIN(n_hits) AS DOUBLE) / 10 AS min_recall_at_k,
               CAST(SUM(n_hits) AS DOUBLE) / 50 AS mean_recall_at_k,
               CAST({cand * 64 * 4} AS INT) AS rerank_scan_bytes,
               (SELECT code_scan_bytes FROM nv) AS code_scan_bytes
        FROM (
          SELECT eq.qid, COALESCE(h.n_hits, 0) AS n_hits
          FROM (SELECT DISTINCT qid FROM exact) eq
          LEFT JOIN (
            SELECT exact.qid, COUNT(*) AS n_hits
            FROM exact JOIN (
              SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                         ORDER BY {_cos('embedding', 'qv')} DESC,
                                  vec_id ASC) AS rnk
                FROM short WHERE crk <= {cand})
              WHERE rnk <= 10) a USING (qid, vec_id)
            GROUP BY 1) h USING (qid))
    """


ORACLES.update({
    "bq_cand_sweep": f"""
        WITH {_BQ_WORDS},
        short AS (
          SELECT qid, vec_id, embedding, qv,
                 ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY hamming ASC, vec_id ASC) AS crk
          FROM ham),
        exact AS (
          SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY {_cos('e.embedding', 'q.embedding')} DESC,
                              e.vec_id ASC) AS rnk
            FROM embeddings e
            CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id < 5) q
            WHERE e.vec_id <> q.vec_id)
          WHERE rnk <= 10),
        nv AS (SELECT CAST(COUNT(*) * 8 AS BIGINT) AS code_scan_bytes
               FROM embeddings)
        {' UNION ALL '.join(_bq_sweep_arm(c) for c in (50, 100, 200))}
    """,
})


# round-7 wave 8: CCNet tertile buckets, JS token drift, weighted median

ORACLES.update({
    "ccnet_perplexity_buckets": f"""
        WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        bg AS (SELECT doc_id, unnest({_BIGRAMS}) AS b
               FROM d WHERE len(toks) >= 2),
        sp AS (SELECT doc_id, string_split(b, ' ')[1] AS w1,
                      string_split(b, ' ')[2] AS w2 FROM bg),
        pair_cnt AS (SELECT w1, w2, COUNT(*) AS c12
                     FROM sp GROUP BY w1, w2),
        uni_cnt AS (SELECT w1, COUNT(*) AS c1 FROM sp GROUP BY w1),
        terms AS (
          SELECT s.doc_id,
                 (CAST(1000000 AS BIGINT) * p.c12) // u.c1 AS ppm
          FROM sp s
          JOIN pair_cnt p ON s.w1 = p.w1 AND s.w2 = p.w2
          JOIN uni_cnt u ON s.w1 = u.w1),
        lm AS (
          SELECT doc_id,
                 (CAST(1000000 AS BIGINT) * SUM(ppm)) // COUNT(*)
                   AS score
          FROM terms GROUP BY doc_id),
        sc AS (SELECT doc.lang, lm.score
               FROM lm JOIN documents doc USING (doc_id)),
        rn AS (
          SELECT lang, score,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY score ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM sc),
        fences AS (
          SELECT lang,
                 MIN(CASE WHEN rn = (n + 2) // 3 THEN score END) AS f1,
                 MIN(CASE WHEN rn = (2 * n + 2) // 3 THEN score END)
                   AS f2
          FROM rn GROUP BY lang),
        b AS (
          SELECT sc.lang, sc.score,
                 (CASE WHEN CAST(sc.score AS DOUBLE)
                            > CAST(f.f1 AS DOUBLE) THEN 1 ELSE 0 END
                  + CASE WHEN CAST(sc.score AS DOUBLE)
                              > CAST(f.f2 AS DOUBLE) THEN 1 ELSE 0 END)
                   AS b
          FROM sc JOIN fences f USING (lang))
        SELECT lang,
               CASE b WHEN 0 THEN 'tail' WHEN 1 THEN 'middle'
                      ELSE 'head' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(score) AS BIGINT) AS min_score,
               CAST(MAX(score) AS BIGINT) AS max_score,
               CAST(SUM(score) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS avg_score
        FROM b GROUP BY 1, 2
    """,
    "token_js_drift": f"""
        WITH tk AS (
          SELECT source, u.tok AS tok
          FROM (SELECT source, {TOKS} AS toks FROM documents) d,
               unnest(d.toks) AS u(tok)),
        st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
               FROM tk GROUP BY 1, 2),
        ct AS (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t
               FROM st GROUP BY 1),
        ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s
               FROM st GROUP BY 1),
        tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_tot FROM ct),
        j AS (
          SELECT st.source, ns.n_s, ct.c_t,
                 CAST(floor(
                   (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE) / 2.0
                    * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                         / ((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)
                             + CAST(c_t AS DOUBLE)
                               / CAST(n_tot AS DOUBLE)) / 2.0))
                    + CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE) / 2.0
                      * ln((CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE))
                           / ((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)
                               + CAST(c_t AS DOUBLE)
                                 / CAST(n_tot AS DOUBLE)) / 2.0)))
                   * 1000000000000 + 0.5) AS BIGINT) AS u
          FROM st JOIN ct USING (tok) JOIN ns USING (source), tot),
        per AS (
          SELECT source, MAX(n_s) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS vocab_overlap,
                 CAST(SUM(u) AS BIGINT) AS su,
                 CAST(SUM(c_t) AS BIGINT) AS cs
          FROM j GROUP BY 1)
        SELECT source, n_tokens, vocab_overlap,
               floor(CAST(cs AS DOUBLE) / CAST(n_tot AS DOUBLE)
                 * 1e9 + 0.5) / 1e9 AS q_mass_overlap,
               floor((CAST(su AS DOUBLE) / 1000000000000
                 + ln(2.0) / 2.0
                   * (1.0 - CAST(cs AS DOUBLE) / CAST(n_tot AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9 AS jsd_nats
        FROM per, tot
    """,
    "weighted_price_median_by_flag": """
        WITH li AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS cents,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
          FROM lineitem),
        w AS (
          SELECT l_returnflag, cents, qty,
                 SUM(qty) OVER (PARTITION BY l_returnflag
                   ORDER BY cents ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY cents ASC) AS rn,
                 SUM(qty) OVER (PARTITION BY l_returnflag) AS tw,
                 COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          FROM li),
        wm AS (
          SELECT l_returnflag, CAST(MAX(tw) AS BIGINT) AS total_qty,
                 CAST(MIN(CASE WHEN cw >= (tw + 1) // 2
                               THEN cents END) AS DOUBLE) / 100.0
                   AS weighted_median_price
          FROM w GROUP BY 1),
        rm AS (
          SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
                 CAST(MIN(CASE WHEN rn >= (n + 1) // 2
                               THEN cents END) AS DOUBLE) / 100.0
                   AS row_median_price
          FROM w GROUP BY 1)
        SELECT wm.l_returnflag, wm.total_qty, wm.weighted_median_price,
               rm.n_rows, rm.row_median_price
        FROM wm JOIN rm USING (l_returnflag)
    """,
})


# round-7 wave 9: OLS trend + harmonic periodogram

ORACLES.update({
    "ols_daily_trend": f"""
        WITH daily AS ({_DAILY_REV}),
        d0 AS (SELECT MIN(d) AS d0 FROM daily),
        xy AS (SELECT CAST(date_diff('day', d0.d0, daily.d) AS BIGINT)
                        AS x, rev AS y
               FROM daily, d0),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
                 CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
                 SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                 SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
                 SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
          FROM xy)
        SELECT n AS n_days,
               floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / 100.0 * 1e9 + 0.5) / 1e9 AS slope_per_day,
               floor((CAST(sy AS DOUBLE)
                      - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 100.0 * 1e9 + 0.5) / 1e9
                 AS intercept,
               floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9 AS r_squared
        FROM m
    """,
    "daily_revenue_periodogram": f"""
        WITH daily AS ({_DAILY_REV}),
        d0 AS (SELECT MIN(d) AS d0 FROM daily),
        base AS (SELECT CAST(date_diff('day', d0.d0, daily.d)
                             AS DOUBLE) AS x, rev AS y
                 FROM daily, d0),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
                 SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
          FROM base),
        s AS (
          SELECT p,
                 CAST(SUM(CAST(floor(CAST(y AS DOUBLE)
                   * cos(x * 6.283185307179586 / CAST(p AS DOUBLE))
                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS ac,
                 CAST(SUM(CAST(floor(CAST(y AS DOUBLE)
                   * sin(x * 6.283185307179586 / CAST(p AS DOUBLE))
                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS bs,
                 CAST(SUM(CAST(floor(
                   cos(x * 6.283185307179586 / CAST(p AS DOUBLE))
                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS cc,
                 CAST(SUM(CAST(floor(
                   sin(x * 6.283185307179586 / CAST(p AS DOUBLE))
                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS ss
          FROM base, (SELECT unnest([7, 30, 91]) AS p)
          GROUP BY p),
        asm AS (
          SELECT p, n,
                 CAST(ac AS DOUBLE) / 1000000.0
                   - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                     * (CAST(cc AS DOUBLE) / 1000000.0) AS a,
                 CAST(bs AS DOUBLE) / 1000000.0
                   - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                     * (CAST(ss AS DOUBLE) / 1000000.0) AS b,
                 CAST(syy AS DOUBLE)
                   - CAST(n AS DOUBLE)
                     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS sst
          FROM s, mom)
        SELECT p AS period, n AS n_days,
               floor(sqrt(a * a + b * b) * 2.0 / CAST(n AS DOUBLE)
                 / 100.0 * 1e9 + 0.5) / 1e9 AS amplitude,
               floor((a * a + b * b) * 2.0
                 / (CAST(n AS DOUBLE) * sst) * 1e9 + 0.5) / 1e9
                 AS var_share
        FROM asm
    """,
})


# round-7 wave 11: JL distortion audit + join-size estimator audit


def _jl_sql_literals() -> str:
    from .operators.similarity import _jl_signs

    return ", ".join(
        f"({j}, [{', '.join(str(s) for s in signs)}])"
        for j, signs in enumerate(_jl_signs()))


ORACLES.update({
    "jl_projection_distortion": f"""
        WITH hp(j, signs) AS (VALUES {_jl_sql_literals()}),
        e AS (
          SELECT vec_id,
                 list_transform(range(1, 65),
                   i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id < 64),
        proj AS (
          SELECT vec_id, j,
                 list_sum(list_transform(range(1, 65),
                   i -> v[CAST(i AS INT)] * signs[CAST(i AS INT)]))
                   AS dot
          FROM e, hp),
        pv AS (SELECT vec_id, list(dot ORDER BY j) AS p
               FROM proj GROUP BY vec_id),
        pairs AS (
          SELECT
            list_sum(list_transform(range(1, 65),
              i -> (a.v[CAST(i AS INT)] - b.v[CAST(i AS INT)])
                   * (a.v[CAST(i AS INT)] - b.v[CAST(i AS INT)])))
              AS dd,
            list_sum(list_transform(range(1, 17),
              i -> (pa.p[CAST(i AS INT)] - pb.p[CAST(i AS INT)])
                   * (pa.p[CAST(i AS INT)] - pb.p[CAST(i AS INT)])))
              AS pp
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          JOIN pv pa ON pa.vec_id = a.vec_id
          JOIN pv pb ON pb.vec_id = b.vec_id),
        r AS (
          SELECT CAST(floor(pp / 16.0 / dd * 1e9 + 0.5) AS BIGINT)
                   AS r_ppb
          FROM pairs WHERE dd > 0)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(r_ppb) AS DOUBLE) / 1e9 AS min_ratio,
               CAST(MAX(r_ppb) AS DOUBLE) / 1e9 AS max_ratio,
               floor(CAST(SUM(r_ppb) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1e9 * 1e9 + 0.5) / 1e9
                 AS mean_ratio,
               floor(CAST(SUM(CASE WHEN r_ppb BETWEEN 700000000
                                    AND 1300000000 THEN 1 ELSE 0 END)
                          AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS share_within_30pct
        FROM r
    """,
    "join_cardinality_estimate": """
        WITH ro AS (SELECT o_orderkey AS k,
                           CAST(COUNT(*) AS BIGINT) AS cr
                    FROM orders GROUP BY 1),
        rl AS (SELECT l_orderkey AS k,
                      CAST(COUNT(*) AS BIGINT) AS cs
               FROM lineitem GROUP BY 1),
        j AS (SELECT SUM(CAST(cr AS DECIMAL(38,0)) * cs) AS exact_rows
              FROM ro JOIN rl USING (k)),
        mo AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_left,
                      CAST(COUNT(*) AS BIGINT) AS v_left
               FROM ro),
        ml AS (SELECT CAST(SUM(cs) AS BIGINT) AS n_right,
                      CAST(COUNT(*) AS BIGINT) AS v_right
               FROM rl)
        SELECT n_left, n_right, v_left, v_right,
               CAST(exact_rows AS BIGINT) AS exact_join_rows,
               CAST(floor(CAST(n_left AS DOUBLE)
                 * CAST(n_right AS DOUBLE)
                 / CAST(greatest(v_left, v_right) AS DOUBLE) + 0.5)
                 AS BIGINT) AS estimate_rows,
               floor(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
                 / CAST(greatest(v_left, v_right) AS DOUBLE)
                 / CAST(exact_rows AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS est_over_exact
        FROM j, mo, ml
    """,
})

# round-7 wave 12: binary-lane storage-dedup clusters

ORACLES.update({
    "payload_dedup_components": f"""
        WITH RECURSIVE {_CDC_CHUNK_CTES},
        ok AS (SELECT ch FROM (
                 SELECT ch, COUNT(*) AS holders FROM chunks GROUP BY ch)
               WHERE holders <= 64),
        keyed AS (SELECT chunks.* FROM chunks JOIN ok USING (ch)),
        cpairs AS (
          SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
          FROM keyed a JOIN keyed b2 USING (ch)
          WHERE a.doc_id < b2.doc_id
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM cpairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM cpairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (
          SELECT src AS node, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src),
        asg AS (
          SELECT d.doc_id,
                 COALESCE(c.component, d.doc_id) AS component
          FROM documents d
          LEFT JOIN comp c ON d.doc_id = c.node),
        sizes AS (
          SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM asg GROUP BY 1)
        SELECT doc_id, component, n_members
        FROM asg JOIN sizes USING (component)
    """,
})


# round-7 wave 13: ANOVA F, Brown-Forsythe, held-out LM perplexity

_ANOVA_FOLD = """
          SELECT list(struct_pack(et := event_type, gn := n,
                                  sd := CAST(s AS DOUBLE),
                                  sxxd := CAST(sxx AS DOUBLE))
                      ORDER BY event_type) AS gs,
                 CAST(SUM(n) AS BIGINT) AS n_total,
                 SUM(s) AS st,
                 CAST(COUNT(*) AS BIGINT) AS k_groups
          FROM per"""

_ANOVA_STATS = """
          SELECT n_total, k_groups,
                 k_groups - 1 AS df_between,
                 n_total - k_groups AS df_within,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(gs, x ->
                     CAST(x.gn AS DOUBLE)
                     * (x.sd / 10000.0 / CAST(x.gn AS DOUBLE)
                        - CAST(st AS DOUBLE) / 10000.0
                          / CAST(n_total AS DOUBLE))
                     * (x.sd / 10000.0 / CAST(x.gn AS DOUBLE)
                        - CAST(st AS DOUBLE) / 10000.0
                          / CAST(n_total AS DOUBLE)))),
                   (a, b) -> a + b) AS ssb,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(gs, x ->
                     x.sxxd / (10000.0 * 10000.0)
                     - CAST(x.gn AS DOUBLE)
                       * (x.sd / 10000.0 / CAST(x.gn AS DOUBLE))
                       * (x.sd / 10000.0 / CAST(x.gn AS DOUBLE)))),
                   (a, b) -> a + b) AS ssw
          FROM g"""


ORACLES.update({
    "anova_f_values": f"""
        WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events WHERE value IS NOT NULL),
        per AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(vu) AS DECIMAL(38,0)) AS s,
                 SUM(CAST(vu AS DECIMAL(38,0)) * vu) AS sxx
          FROM ev GROUP BY 1),
        g AS ({_ANOVA_FOLD}),
        st AS ({_ANOVA_STATS})
        SELECT per.event_type, per.n,
               floor(CAST(per.s AS DOUBLE) / 10000.0
                 / CAST(per.n AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS mean_value,
               st.n_total, st.k_groups, st.df_between, st.df_within,
               floor(st.ssb * 1e9 + 0.5) / 1e9 AS ss_between,
               floor(st.ssw * 1e9 + 0.5) / 1e9 AS ss_within,
               CASE WHEN st.ssw > 0.0 AND st.k_groups > 1
                         AND st.n_total > st.k_groups
                    THEN floor((st.ssb
                      / (CAST(st.k_groups AS DOUBLE) - 1.0))
                 / (st.ssw / (CAST(st.n_total AS DOUBLE)
                              - CAST(st.k_groups AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS f_stat
        FROM per, st
    """,
    "brown_forsythe_variance_test": f"""
        WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events WHERE value IS NOT NULL),
        rn AS (
          SELECT event_type, vu,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY vu ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS cnt
          FROM ev),
        med AS (
          SELECT event_type,
                 MIN(CASE WHEN rn = (cnt + 1) // 2 THEN vu END) AS med
          FROM rn GROUP BY 1),
        dev AS (
          SELECT ev.event_type, abs(ev.vu - med.med) AS du
          FROM ev JOIN med USING (event_type)),
        per AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(du) AS DECIMAL(38,0)) AS s,
                 SUM(CAST(du AS DECIMAL(38,0)) * du) AS sxx
          FROM dev GROUP BY 1),
        g AS ({_ANOVA_FOLD}),
        st AS ({_ANOVA_STATS})
        SELECT per.event_type, per.n,
               floor(CAST(per.s AS DOUBLE) / 10000.0
                 / CAST(per.n AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS mean_abs_dev,
               st.n_total, st.k_groups, st.df_between, st.df_within,
               CASE WHEN st.ssw > 0.0 AND st.k_groups > 1
                         AND st.n_total > st.k_groups
                    THEN floor((st.ssb
                      / (CAST(st.k_groups AS DOUBLE) - 1.0))
                 / (st.ssw / (CAST(st.n_total AS DOUBLE)
                              - CAST(st.k_groups AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS bf_stat
        FROM per, st
    """,
    "lm_heldout_perplexity": f"""
        WITH d AS (
          SELECT doc_id, lang, {TOKS} AS toks,
                 {_HEX8_TO_INT("'lmho|' || CAST(doc_id AS VARCHAR)")}
                   % 2 AS split
          FROM documents),
        bg AS (
          SELECT lang, split, unnest({_BIGRAMS}) AS b
          FROM d WHERE len(toks) >= 2),
        sp AS (
          SELECT lang, split, string_split(b, ' ')[1] AS w1,
                 string_split(b, ' ')[2] AS w2
          FROM bg),
        pair AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                 FROM sp WHERE split = 0 GROUP BY 1, 2),
        uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
                FROM sp WHERE split = 0 GROUP BY 1),
        voc AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v
                FROM sp WHERE split = 0),
        held AS (
          SELECT h.lang,
                 CAST(floor(ln((CAST(COALESCE(u.c1, 0) AS DOUBLE)
                                + CAST(v AS DOUBLE))
                               / (CAST(COALESCE(p.c12, 0) AS DOUBLE)
                                  + 1.0))
                   * 1000000 + 0.5) AS BIGINT) AS u,
                 CASE WHEN p.c12 IS NULL THEN 1 ELSE 0 END AS oov
          FROM sp h
          LEFT JOIN pair p ON h.w1 = p.w1 AND h.w2 = p.w2
          LEFT JOIN uni u ON h.w1 = u.w1, voc
          WHERE h.split = 1),
        g AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(oov) AS BIGINT) AS n_oov,
                 CAST(SUM(u) AS BIGINT) AS su
          FROM held GROUP BY 1)
        SELECT lang, n_bigrams,
               floor(CAST(n_oov AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                 * 1e9 + 0.5) / 1e9 AS oov_share,
               floor(CAST(su AS DOUBLE) / 1000000.0
                 / CAST(n_bigrams AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS avg_nll_nats,
               floor(exp(CAST(su AS DOUBLE) / 1000000.0
                 / CAST(n_bigrams AS DOUBLE)) * 1e9 + 0.5) / 1e9
                 AS perplexity
        FROM g
    """,
})


# round-7 wave 14: b-bit minhash compression audit

_AGREE_SUM_B2 = " + ".join(
    f"CASE WHEN a.h{j} % 4 = b.h{j} % 4 THEN 1 ELSE 0 END"
    for j in range(16))

ORACLES.update({
    "bbit_minhash_estimate": f"""
        WITH {SIG_CTE},
        bands AS (
        {_BAND_SELECTS}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST({_AGREE_SUM} AS INT) AS n_agree_full,
               CAST({_AGREE_SUM_B2} AS INT) AS n_agree_b2,
               CAST({_AGREE_SUM} AS DOUBLE) / 16 AS jaccard_full,
               (CAST({_AGREE_SUM_B2} AS DOUBLE) - 16.0 / 4)
                 / (16.0 * (1.0 - 1.0 / 4)) AS jaccard_b2,
               (CAST({_AGREE_SUM_B2} AS DOUBLE) - 16.0 / 4)
                 / (16.0 * (1.0 - 1.0 / 4))
                 - CAST({_AGREE_SUM} AS DOUBLE) / 16 AS b2_minus_full
        FROM pairs
        JOIN sig a ON pairs.doc_a = a.doc_id
        JOIN sig b ON pairs.doc_b = b.doc_id
    """,
})


# round-7 wave 16: per-dimension embedding drift PSI

ORACLES.update({
    "embedding_dim_psi": """
        WITH ex AS (
          SELECT vec_id % 2 AS half, i - 1 AS dim,
                 CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        rng AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi
                FROM ex GROUP BY dim),
        cells AS (
          SELECT ex.dim,
                 CASE WHEN hi = lo THEN 0
                      ELSE CAST(least(15, floor((x - lo) * 16.0
                                                / (hi - lo))) AS INT)
                 END AS bucket,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS cb
          FROM ex JOIN rng USING (dim) GROUP BY 1, 2),
        tot AS (SELECT dim, CAST(SUM(ca) AS BIGINT) AS na,
                       CAST(SUM(cb) AS BIGINT) AS nb
                FROM cells GROUP BY 1),
        j AS (
          SELECT cells.dim, na, nb,
                 CASE WHEN ca > 0 AND cb > 0 THEN
                   CAST(floor((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                               - CAST(cb AS DOUBLE)
                                 / CAST(nb AS DOUBLE))
                     * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                          / (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)))
                     * 1e9 + 0.5) AS BIGINT) END AS u,
                 CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END AS bb,
                 CASE WHEN (ca > 0 AND cb = 0)
                        OR (ca = 0 AND cb > 0) THEN 1 ELSE 0 END
                   AS oneside
          FROM cells JOIN tot USING (dim))
        SELECT dim, CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b,
               CAST(SUM(bb) AS BIGINT) AS n_buckets_both,
               CAST(SUM(oneside) AS BIGINT) AS n_buckets_oneside,
               CAST(SUM(u) AS DOUBLE) / 1e9 AS psi
        FROM j GROUP BY dim
    """,
})


# round-7 wave 17: Heaps-law exponent over the growth curve

ORACLES.update({
    "heaps_law_fit": f"""
        WITH curve AS ({ORACLES['vocab_growth_curve']}),
        pts AS (
          SELECT list(struct_pack(k := k,
                                  x := ln(CAST(tokens AS DOUBLE)),
                                  y := ln(CAST(vocab AS DOUBLE)))
                      ORDER BY k) AS pts
          FROM curve WHERE tokens > 0 AND vocab > 0),
        m AS (
          SELECT CAST(len(pts) AS DOUBLE) AS n,
                 len(pts) AS n_points,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(pts, p -> p.x)), (a, b) -> a + b)
                   AS sx,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(pts, p -> p.y)), (a, b) -> a + b)
                   AS sy,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(pts, p -> p.x * p.y)),
                   (a, b) -> a + b) AS sxy,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(pts, p -> p.x * p.x)),
                   (a, b) -> a + b) AS sxx,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(pts, p -> p.y * p.y)),
                   (a, b) -> a + b) AS syy
          FROM pts)
        SELECT CAST(n_points AS INT) AS n_points,
               floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                 * 1e9 + 0.5) / 1e9 AS heaps_beta,
               floor(exp((sy - (n * sxy - sx * sy)
                               / (n * sxx - sx * sx) * sx) / n)
                 * 1e9 + 0.5) / 1e9 AS heaps_k,
               floor((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 1e9 + 0.5) / 1e9 AS r_squared
        FROM m
    """,
})


# round-7 wave 18: time-decay attribution

ORACLES.update({
    "time_decay_attribution": """
        WITH pur AS (
          SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        clk AS (
          SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_us,
                 strftime(ts, '%Y-%m-%d') AS day
          FROM events WHERE event_type = 'click'),
        j AS (
          SELECT p.p_id, p.cents, p.p_us, c.c_id, c.c_us, c.day,
                 CAST(floor(pow(2.0,
                   -(CAST(p.p_us - c.c_us AS DOUBLE)
                     / 86400000000.0)) * 1000000 + 0.5) AS BIGINT)
                   AS w
          FROM pur p JOIN clk c ON c.user_id = p.user_id
          WHERE c.c_us < p.p_us
            AND c.c_us >= p.p_us - 604800000000),
        r AS (
          SELECT *,
                 CAST(SUM(w) OVER (PARTITION BY p_id) AS BIGINT)
                   AS wsum,
                 ROW_NUMBER() OVER (PARTITION BY p_id
                   ORDER BY c_us DESC, c_id ASC) AS rk
          FROM j),
        a AS (SELECT *, cents * w // wsum AS alloc FROM r),
        cred AS (
          SELECT *,
                 alloc + CASE WHEN rk = 1 THEN
                   cents - CAST(SUM(alloc) OVER (PARTITION BY p_id)
                                AS BIGINT)
                 ELSE 0 END AS credit
          FROM a)
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_credited_clicks,
               CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases,
               CAST(SUM(credit) AS BIGINT) AS credited_cents,
               CAST(SUM(credit) AS DOUBLE) / 100.0 AS credited_value
        FROM cred GROUP BY day
    """,
})


# round-7 wave 19: the CCNet curation decision table

ORACLES.update({
    "ccnet_sampling_plan": f"""
        WITH d0 AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        bg AS (SELECT doc_id, unnest({_BIGRAMS}) AS b
               FROM d0 WHERE len(toks) >= 2),
        sp AS (SELECT doc_id, string_split(b, ' ')[1] AS w1,
                      string_split(b, ' ')[2] AS w2 FROM bg),
        pair_cnt AS (SELECT w1, w2, COUNT(*) AS c12
                     FROM sp GROUP BY w1, w2),
        uni_cnt AS (SELECT w1, COUNT(*) AS c1 FROM sp GROUP BY w1),
        terms AS (
          SELECT s.doc_id,
                 (CAST(1000000 AS BIGINT) * p.c12) // u.c1 AS ppm
          FROM sp s
          JOIN pair_cnt p ON s.w1 = p.w1 AND s.w2 = p.w2
          JOIN uni_cnt u ON s.w1 = u.w1),
        lm AS (
          SELECT doc_id,
                 (CAST(1000000 AS BIGINT) * SUM(ppm)) // COUNT(*)
                   AS score
          FROM terms GROUP BY doc_id),
        sc AS (SELECT doc.doc_id, doc.lang,
                      len({TOKS.replace('text', 'doc.text')})
                        AS n_toks,
                      lm.score
               FROM documents doc LEFT JOIN lm USING (doc_id)),
        rn AS (
          SELECT lang, score,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY score ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM sc WHERE score IS NOT NULL),
        fences AS (
          SELECT lang,
                 MIN(CASE WHEN rn = (n + 2) // 3 THEN score END) AS f1,
                 MIN(CASE WHEN rn = (2 * n + 2) // 3 THEN score END)
                   AS f2
          FROM rn GROUP BY lang),
        dec AS (
          SELECT sc.lang, sc.n_toks, sc.score,
                 (CASE WHEN CAST(sc.score AS DOUBLE)
                            > CAST(f.f1 AS DOUBLE) THEN 1 ELSE 0 END
                  + CASE WHEN CAST(sc.score AS DOUBLE)
                              > CAST(f.f2 AS DOUBLE) THEN 1 ELSE 0 END)
                   AS b,
                 {_HEX8_TO_INT("'ccnet|' || CAST(sc.doc_id AS VARCHAR)")}
                   % 100 AS coin
          FROM sc LEFT JOIN fences f USING (lang))
        SELECT lang,
               CASE WHEN score IS NULL THEN 'unscored_short'
                    WHEN b = 2 THEN 'keep_head'
                    WHEN b = 1 AND coin < 50
                      THEN 'sample_middle_kept'
                    WHEN b = 1 THEN 'sample_middle_dropped'
                    ELSE 'drop_tail' END AS decision,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS token_mass
        FROM dec GROUP BY 1, 2
    """,
})


# round-8: composed store-maintenance + serving queries (§2.D under
# the driver gate) — each twin computes the store's serving result
# directly from the batch tables; a hash match proves the rebased
# merge commits + the serving read equal batch semantics end-to-end

ORACLES.update({
    "store_value_quantiles": """
        WITH ev AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events WHERE value IS NOT NULL),
        h AS (SELECT event_type, vu, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM ev GROUP BY 1, 2),
        cum AS (
          SELECT event_type, vu,
                 SUM(cnt) OVER (PARTITION BY event_type
                   ORDER BY vu ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cf,
                 SUM(cnt) OVER (PARTITION BY event_type) AS n
          FROM h)
        SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cf >= CAST(ceil(0.5 * n) AS BIGINT)
                             THEN vu END) AS DOUBLE) / 10000.0 AS q0_5,
               CAST(MIN(CASE WHEN cf >= CAST(ceil(0.9 * n) AS BIGINT)
                             THEN vu END) AS DOUBLE) / 10000.0 AS q0_9,
               CAST(MIN(CASE WHEN cf >= CAST(ceil(0.99 * n) AS BIGINT)
                             THEN vu END) AS DOUBLE) / 10000.0 AS q0_99
        FROM cum GROUP BY 1
    """,
    "store_token_topk": f"""
        WITH v AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT unnest({TOKS}) AS token FROM documents)
          GROUP BY 1)
        SELECT token, cnt FROM v
        ORDER BY cnt DESC, token ASC LIMIT 100
    """,
    "store_audience_overlap": """
        WITH ev AS (
          SELECT DISTINCT event_type, user_id FROM events
          WHERE event_type IN ('click', 'purchase')),
        words AS (
          SELECT event_type, user_id // 62 AS blk,
                 bit_or(CAST(1 AS BIGINT)
                        << CAST(user_id % 62 AS INT)) AS w
          FROM ev GROUP BY 1, 2),
        a AS (SELECT blk, w AS wa FROM words
              WHERE event_type = 'click'),
        b AS (SELECT blk, w AS wb FROM words
              WHERE event_type = 'purchase'),
        j AS (
          SELECT COALESCE(a.wa, 0) AS wa, COALESCE(b.wb, 0) AS wb
          FROM a FULL OUTER JOIN b USING (blk))
        SELECT CAST(SUM(bit_count(wa)) AS BIGINT) AS n_click,
               CAST(SUM(bit_count(wb)) AS BIGINT) AS n_purchase,
               CAST(SUM(bit_count(wa & wb)) AS BIGINT) AS n_both,
               CAST(SUM(bit_count(wa | wb)) AS BIGINT) AS n_either,
               CAST(SUM(bit_count(wa & wb)) AS DOUBLE)
                 / SUM(bit_count(wa | wb)) AS jaccard
        FROM j
    """,
    "store_heavy_hitters": f"""
        WITH c1 AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT unnest({TOKS}) AS token FROM documents
                WHERE doc_id % 2 = 0)
          GROUP BY 1),
        d1 AS (
          SELECT CAST(CASE WHEN COUNT(*) > 64 THEN MIN(cnt)
                           ELSE 0 END AS BIGINT) AS dec
          FROM (SELECT cnt FROM c1
                ORDER BY cnt DESC, token ASC LIMIT 65)),
        k1 AS (
          SELECT token, CAST(c1.cnt - d1.dec AS BIGINT) AS cnt
          FROM c1, d1 WHERE c1.cnt > d1.dec),
        c2 AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT unnest({TOKS}) AS token FROM documents
                WHERE doc_id % 2 = 1)
          GROUP BY 1),
        s2 AS (
          SELECT token, CAST(SUM(cnt) AS BIGINT) AS cnt
          FROM (SELECT * FROM k1 UNION ALL SELECT * FROM c2)
          GROUP BY 1),
        d2 AS (
          SELECT CAST(CASE WHEN COUNT(*) > 64 THEN MIN(cnt)
                           ELSE 0 END AS BIGINT) AS dec
          FROM (SELECT cnt FROM s2
                ORDER BY cnt DESC, token ASC LIMIT 65))
        SELECT s2.token, CAST(s2.cnt - d2.dec AS BIGINT) AS cnt,
               CAST(d1.dec + d2.dec AS BIGINT) AS dec_total
        FROM s2, d1, d2 WHERE s2.cnt > d2.dec
    """,
    "anisotropic_pq_loss": f"""
        WITH {_PQ_BOOK},
        {_PQ_CODES},
        per AS (
          SELECT e.vec_id,
                 list_sum(list(list_sum(list_transform(range(1, 9), i -> (CAST(e.embedding[CAST(c.m * 8 + i AS INT)] AS DOUBLE) - b.cv[CAST(i AS INT)]) * CAST(e.embedding[CAST(c.m * 8 + i AS INT)] AS DOUBLE))) ORDER BY c.m)) AS rx,
                 list_sum(list(list_sum(list_transform(range(1, 9), i -> (CAST(e.embedding[CAST(c.m * 8 + i AS INT)] AS DOUBLE) - b.cv[CAST(i AS INT)]) * (CAST(e.embedding[CAST(c.m * 8 + i AS INT)] AS DOUBLE) - b.cv[CAST(i AS INT)]))) ORDER BY c.m)) AS rr,
                 list_sum(list(list_sum(list_transform(range(1, 9), i -> CAST(e.embedding[CAST(c.m * 8 + i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(c.m * 8 + i AS INT)] AS DOUBLE))) ORDER BY c.m)) AS xx
          FROM embeddings e
          JOIN codes c USING (vec_id)
          JOIN book b ON b.m = c.m AND b.code = c.code
          GROUP BY e.vec_id),
        q AS (
          SELECT CAST(floor(rx * rx / xx * 1e9 + 0.5) AS BIGINT)
                   AS qp,
                 CAST(floor((rr - rx * rx / xx) * 1e9 + 0.5)
                   AS BIGINT) AS qo
          FROM per WHERE xx > 0),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
                     CAST(SUM(qp) AS DECIMAL(38,0)) AS sp,
                     CAST(SUM(qo) AS DECIMAL(38,0)) AS so
              FROM q)
        SELECT n_vecs,
               floor(CAST(sp AS DOUBLE) / 1e9
                 / CAST(n_vecs AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS mean_parallel_loss,
               floor(CAST(so AS DOUBLE) / 1e9
                 / CAST(n_vecs AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS mean_orth_loss,
               CASE WHEN CAST(sp AS DOUBLE) + CAST(so AS DOUBLE) > 0
                    THEN floor(CAST(sp AS DOUBLE)
                      / (CAST(sp AS DOUBLE) + CAST(so AS DOUBLE))
                      * 1e9 + 0.5) / 1e9 END AS parallel_share
        FROM g
    """,
    "ewma_control_chart": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        m AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(rev AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(rev AS DECIMAL(38,0))
                          * CAST(rev AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM daily),
        gs AS (
          SELECT floor(CAST(s1 AS DOUBLE) / n / 100.0 * 1e9 + 0.5)
                   / 1e9 AS mu,
                 floor(sqrt(CAST(CAST(CAST(n AS DECIMAL(38,0)) * s2
                            - s1 * s1 AS DECIMAL(38,0)) AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1))) / 100.0
                       * 1e9 + 0.5) / 1e9 AS sd
          FROM m),
        seq AS (
          SELECT list(d ORDER BY d) AS ds,
                 list(rev ORDER BY d) AS xs
          FROM daily),
        z AS (
          SELECT ds, xs, mu, sd, list_reduce(
            list_prepend([mu],
              list_transform(xs,
                v -> [CAST(v AS DOUBLE) / 100.0])),
            (acc, e) -> list_append(acc,
              CAST(0.2 AS DOUBLE) * e[1]
              + CAST(0.8 AS DOUBLE) * acc[-1])) AS zs
          FROM seq, gs)
        SELECT strftime(ds[CAST(t AS INT)], '%Y-%m-%d') AS day,
               CAST(xs[CAST(t AS INT)] AS DOUBLE) / 100.0 AS revenue,
               floor(zs[CAST(t + 1 AS INT)] * 1e9 + 0.5) / 1e9
                 AS ewma,
               floor((mu + 3.0 * sd
                 * sqrt(CAST(0.11111111111111112 AS DOUBLE)
                        * (1.0 - pow(CAST(0.8 AS DOUBLE),
                                     2.0 * CAST(t AS DOUBLE)))))
                 * 1e9 + 0.5) / 1e9 AS ucl,
               floor((mu - 3.0 * sd
                 * sqrt(CAST(0.11111111111111112 AS DOUBLE)
                        * (1.0 - pow(CAST(0.8 AS DOUBLE),
                                     2.0 * CAST(t AS DOUBLE)))))
                 * 1e9 + 0.5) / 1e9 AS lcl,
               CAST(floor(zs[CAST(t + 1 AS INT)] * 1e9 + 0.5) / 1e9
                    > floor((mu + 3.0 * sd
                      * sqrt(CAST(0.11111111111111112 AS DOUBLE)
                             * (1.0 - pow(CAST(0.8 AS DOUBLE),
                                          2.0 * CAST(t AS DOUBLE)))))
                      * 1e9 + 0.5) / 1e9
                 OR floor(zs[CAST(t + 1 AS INT)] * 1e9 + 0.5) / 1e9
                    < floor((mu - 3.0 * sd
                      * sqrt(CAST(0.11111111111111112 AS DOUBLE)
                             * (1.0 - pow(CAST(0.8 AS DOUBLE),
                                          2.0 * CAST(t AS DOUBLE)))))
                      * 1e9 + 0.5) / 1e9 AS INT) AS out_of_control
        FROM z, (SELECT unnest(range(1, len((SELECT ds FROM seq)) + 1))
                 AS t)
    """,
    "seasonal_decompose_daily": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev,
                 CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                      AS BIGINT) AS ed
          FROM orders GROUP BY 1, 3),
        base AS (
          SELECT d, rev,
                 COUNT(*) OVER (ORDER BY ed
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7,
                 SUM(rev) OVER (ORDER BY ed
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7
          FROM daily),
        det AS (
          SELECT CAST(isodow(d) AS INT) AS dow,
                 CAST(floor((CAST(rev AS DOUBLE) / 100.0
                             - CAST(s7 AS DOUBLE) / 700.0)
                      * 1e6 + 0.5) AS BIGINT) AS du
          FROM base WHERE n7 = 7)
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
               floor(CAST(SUM(du) AS DOUBLE) / 1e6
                 / CAST(COUNT(*) AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS seasonal_mean
        FROM det GROUP BY 1
    """,
    "hill_tail_index": """
        WITH top AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
          FROM orders ORDER BY c DESC LIMIT 101),
        g AS (SELECT list_sort(list(c)) AS cs,
                     CAST(COUNT(*) AS BIGINT) AS n FROM top),
        f AS (
          SELECT n, cs[1] AS ck1,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(cs[2:],
                     x -> CAST(floor(ln(CAST(x AS DOUBLE) / 100.0)
                          * 1e9 + 0.5) AS BIGINT))),
                   (acc, v) -> acc + v) AS su,
                 CAST(floor(ln(CAST(cs[1] AS DOUBLE) / 100.0)
                      * 1e9 + 0.5) AS BIGINT) AS base
          FROM g)
        SELECT CAST(100 AS INT) AS k,
               CASE WHEN n = 101 AND ck1 > 0
                    THEN CAST(ck1 AS DOUBLE) / 100.0 END AS x_k1,
               CASE WHEN n = 101 AND ck1 > 0
                    THEN floor(CAST(su - 100 * base AS DOUBLE) / 1e11
                         * 1e9 + 0.5) / 1e9 END AS hill_h,
               CASE WHEN n = 101 AND ck1 > 0
                         AND CAST(su - 100 * base AS DOUBLE) / 1e11
                             > 0
                    THEN floor(1.0 / (CAST(su - 100 * base AS DOUBLE)
                         / 1e11) * 1e9 + 0.5) / 1e9 END AS tail_alpha
        FROM f
    """,
    "store_lifecycle": """
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us FROM events),
        anchor AS (SELECT MAX(us) AS hi FROM ev),
        per AS (
          SELECT user_id, MIN(us) AS first_us, MAX(us) AS last_us
          FROM ev GROUP BY user_id)
        SELECT CASE
                 WHEN first_us >= hi - 30 * 86400000000 THEN 'new'
                 WHEN last_us < hi - 60 * 86400000000 THEN 'churned'
                 WHEN last_us < hi - 30 * 86400000000 THEN 'dormant'
                 ELSE 'active' END AS stage,
               COUNT(*) AS n_users
        FROM per, anchor
        GROUP BY 1
    """,
    "store_skyline": """
        WITH pd AS (
          SELECT o_orderdate, MAX(o_totalprice) AS day_max
          FROM orders GROUP BY o_orderdate),
        f AS (
          SELECT o_orderdate, day_max,
                 MAX(day_max) OVER (ORDER BY o_orderdate DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS later_max
          FROM pd)
        SELECT o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_totalprice
        FROM orders o JOIN f USING (o_orderdate)
        WHERE o.o_totalprice = f.day_max
          AND (f.later_max IS NULL OR o.o_totalprice > f.later_max)
    """,
})


# round-8 wave 1: sequential-fold forecasting/drift family — the
# DuckDB twins replay the exact left-fold recurrence via list_reduce.
# CRITICAL ENCODING NOTE: the accumulator is a FLAT DOUBLE[] (state
# slots by index), NOT a struct — DuckDB's list_reduce mutates a
# struct accumulator IN PLACE field-by-field from the second
# iteration on (later struct_pack fields see the new lv, breaking
# any recurrence that reads old state), while a list-valued
# accumulator evaluates atomically. Layout: [lv, tr, s1..s7, sse];
# elements carry x in slot 1.

ORACLES.update({
    "holt_winters_daily_forecast": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        seq AS (
          SELECT list(CAST(rev AS DOUBLE) / 100.0 ORDER BY d) AS xs,
                 CAST(COUNT(*) AS BIGINT) AS n_days
          FROM daily),
        st AS (
          SELECT n_days, list_reduce(
            list_prepend(
              [CAST(0.0 AS DOUBLE), 0, 0, 0, 0, 0, 0, 0, 0, 0],
              list_transform(xs, v ->
                [v, CAST(0.0 AS DOUBLE), 0, 0, 0, 0, 0, 0, 0, 0])),
            (acc, e) -> [
              CAST(0.2 AS DOUBLE) * (e[1] - acc[3])
                + CAST(0.8 AS DOUBLE) * (acc[1] + acc[2]),
              CAST(0.1 AS DOUBLE)
                * ((CAST(0.2 AS DOUBLE) * (e[1] - acc[3])
                    + CAST(0.8 AS DOUBLE) * (acc[1] + acc[2]))
                   - acc[1])
                + CAST(0.9 AS DOUBLE) * acc[2],
              acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
              CAST(0.3 AS DOUBLE)
                * (e[1] - (CAST(0.2 AS DOUBLE) * (e[1] - acc[3])
                           + CAST(0.8 AS DOUBLE) * (acc[1] + acc[2])))
                + CAST(0.7 AS DOUBLE) * acc[3],
              acc[10] + (acc[1] + acc[2] + acc[3] - e[1])
                      * (acc[1] + acc[2] + acc[3] - e[1])]) AS st
          FROM seq)
        SELECT CAST(h AS INT) AS h,
               floor((st[1] + CAST(h AS DOUBLE) * st[2]
                      + st[CAST((h - 1) % 7 + 3 AS INT)])
                     * 1e9 + 0.5) / 1e9 AS forecast_revenue,
               n_days,
               floor(sqrt(st[10] / CAST(n_days AS DOUBLE))
                     * 1e9 + 0.5) / 1e9 AS rmse
        FROM st, (SELECT unnest(range(1, 8)) AS h)
    """,
})


ORACLES.update({

    "page_hinkley_drift": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        seq AS (
          SELECT list([CAST(CAST(d - DATE '1970-01-01' AS BIGINT)
                            AS DOUBLE),
                       CAST(rev AS DOUBLE) / 100.0,
                       0, 0, 0, 0]
                      ORDER BY d) AS dx,
                 CAST(COUNT(*) AS BIGINT) AS n_days
          FROM daily),
        -- flat DOUBLE[] accumulator [n, s, mt, mn, al, mx]; elements
        -- carry [ed, x, ...] (see the struct-mutation note above)
        st AS (
          SELECT n_days, list_reduce(
            list_prepend(
              [CAST(0.0 AS DOUBLE), 0, 0, 0, -1, 0], dx),
            (acc, e) -> [
              acc[1] + CAST(1.0 AS DOUBLE),
              acc[2] + e[2],
              acc[3] + e[2] - (acc[2] + e[2]) / (acc[1] + 1.0) - 0.0,
              least(acc[4], acc[3] + e[2] - (acc[2] + e[2]) / (acc[1] + 1.0) - 0.0),
              CASE WHEN acc[5] >= CAST(0.0 AS DOUBLE) THEN acc[5]
                   WHEN (acc[3] + e[2] - (acc[2] + e[2]) / (acc[1] + 1.0) - 0.0) - least(acc[4], acc[3] + e[2] - (acc[2] + e[2]) / (acc[1] + 1.0) - 0.0)
                        > CAST(10000.0 AS DOUBLE)
                   THEN e[1] ELSE CAST(-1.0 AS DOUBLE) END,
              greatest(acc[6], (acc[3] + e[2] - (acc[2] + e[2]) / (acc[1] + 1.0) - 0.0) - least(acc[4], acc[3] + e[2] - (acc[2] + e[2]) / (acc[1] + 1.0) - 0.0))]) AS st
          FROM seq)
        SELECT n_days,
               floor((st[3] - st[4]) * 1e9 + 0.5) / 1e9 AS ph_stat,
               floor(st[6] * 1e9 + 0.5) / 1e9 AS max_deviation,
               st[5] >= 0 AS drift_detected,
               CASE WHEN st[5] >= 0
                    THEN strftime(DATE '1970-01-01'
                                  + CAST(st[5] AS INT), '%Y-%m-%d')
                    ELSE NULL END AS detect_day
        FROM st
    """,
})



# round-9 wave 1: classical SPC / normality / autocorrelation tests.
# Same twin discipline as the round-8 statistics wave: exact decimal
# moment sums, constants gridded before recursions, flat DOUBLE[]
# list_reduce accumulators (the DuckDB struct-mutation workaround),
# op-for-op identical double chains.
ORACLES.update({
    "cusum_daily_revenue": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        m AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(rev AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(rev AS DECIMAL(38,0))
                          * CAST(rev AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM daily),
        gs AS (
          SELECT n AS n_days,
                 floor(CAST(s1 AS DOUBLE) / n / 100.0 * 1e9 + 0.5)
                   / 1e9 AS mu,
                 floor(sqrt(CAST(CAST(CAST(n AS DECIMAL(38,0)) * s2
                            - s1 * s1 AS DECIMAL(38,0)) AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1))) / 100.0
                       * 1e9 + 0.5) / 1e9 AS sd
          FROM m),
        gk AS (
          SELECT n_days, mu, sd,
                 floor(0.5 * sd * 1e9 + 0.5) / 1e9 AS kk,
                 floor(4.0 * sd * 1e9 + 0.5) / 1e9 AS hh
          FROM gs),
        seq AS (
          SELECT list([CAST(CAST(d - DATE '1970-01-01' AS BIGINT)
                            AS DOUBLE),
                       CAST(rev AS DOUBLE) / 100.0]
                      ORDER BY d) AS dx
          FROM daily),
        -- flat DOUBLE[] accumulator [cp, cm, mp, mm, al, fd]
        st AS (
          SELECT n_days, mu, sd, kk, hh, list_reduce(
            list_prepend(
              [CAST(0.0 AS DOUBLE), 0, 0, 0, 0, -1], dx),
            (acc, e) -> [
              greatest(CAST(0.0 AS DOUBLE), acc[1] + e[2] - mu - kk),
              greatest(CAST(0.0 AS DOUBLE), acc[2] + mu - kk - e[2]),
              greatest(acc[3], greatest(CAST(0.0 AS DOUBLE),
                                        acc[1] + e[2] - mu - kk)),
              greatest(acc[4], greatest(CAST(0.0 AS DOUBLE),
                                        acc[2] + mu - kk - e[2])),
              acc[5] + CASE WHEN
                greatest(CAST(0.0 AS DOUBLE),
                         acc[1] + e[2] - mu - kk) > hh
                OR greatest(CAST(0.0 AS DOUBLE),
                            acc[2] + mu - kk - e[2]) > hh
                THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END,
              CASE WHEN acc[6] >= CAST(0.0 AS DOUBLE) THEN acc[6]
                   WHEN greatest(CAST(0.0 AS DOUBLE),
                                 acc[1] + e[2] - mu - kk) > hh
                     OR greatest(CAST(0.0 AS DOUBLE),
                                 acc[2] + mu - kk - e[2]) > hh
                   THEN e[1] ELSE CAST(-1.0 AS DOUBLE) END]) AS st
          FROM seq, gk)
        SELECT n_days, mu, sd, kk AS slack_k, hh AS limit_h,
               floor(st[1] * 1e9 + 0.5) / 1e9 AS cusum_pos,
               floor(st[2] * 1e9 + 0.5) / 1e9 AS cusum_neg,
               floor(st[3] * 1e9 + 0.5) / 1e9 AS max_pos,
               floor(st[4] * 1e9 + 0.5) / 1e9 AS max_neg,
               CAST(st[5] AS BIGINT) AS n_alarm_days,
               CASE WHEN st[6] >= 0
                    THEN strftime(DATE '1970-01-01'
                                  + CAST(st[6] AS INT), '%Y-%m-%d')
                    ELSE NULL END AS first_alarm_day
        FROM st
    """,
    "runs_test_daily": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        agg AS (
          SELECT list(rev ORDER BY d) AS dx,
                 list(rev ORDER BY rev) AS vs,
                 COUNT(*) AS n_days
          FROM daily),
        g AS (
          SELECT dx, n_days,
                 vs[CAST(floor((n_days + 1) / 2) AS INT)] AS md
          FROM agg),
        -- flat DOUBLE[] accumulator [r, pv, a, b]
        st AS (
          SELECT n_days, md, list_reduce(
            list_prepend([CAST(0.0 AS DOUBLE), 0, 0, 0],
                         list_transform(dx, v -> [CAST(v AS DOUBLE)])),
            (acc, e) -> [
              acc[1] + CASE WHEN (CASE WHEN e[1] > md
                                       THEN CAST(1.0 AS DOUBLE)
                                       WHEN e[1] < md
                                       THEN CAST(-1.0 AS DOUBLE)
                                       ELSE CAST(0.0 AS DOUBLE) END)
                                 = CAST(0.0 AS DOUBLE)
                            THEN CAST(0.0 AS DOUBLE)
                            WHEN (CASE WHEN e[1] > md
                                       THEN CAST(1.0 AS DOUBLE)
                                       WHEN e[1] < md
                                       THEN CAST(-1.0 AS DOUBLE)
                                       ELSE CAST(0.0 AS DOUBLE) END)
                                 = acc[2]
                            THEN CAST(0.0 AS DOUBLE)
                            ELSE CAST(1.0 AS DOUBLE) END,
              CASE WHEN (CASE WHEN e[1] > md THEN CAST(1.0 AS DOUBLE)
                              WHEN e[1] < md THEN CAST(-1.0 AS DOUBLE)
                              ELSE CAST(0.0 AS DOUBLE) END)
                        = CAST(0.0 AS DOUBLE)
                   THEN acc[2]
                   ELSE (CASE WHEN e[1] > md THEN CAST(1.0 AS DOUBLE)
                              WHEN e[1] < md THEN CAST(-1.0 AS DOUBLE)
                              ELSE CAST(0.0 AS DOUBLE) END) END,
              acc[3] + CASE WHEN (CASE WHEN e[1] > md
                                       THEN CAST(1.0 AS DOUBLE)
                                       WHEN e[1] < md
                                       THEN CAST(-1.0 AS DOUBLE)
                                       ELSE CAST(0.0 AS DOUBLE) END)
                                 > CAST(0.0 AS DOUBLE)
                            THEN CAST(1.0 AS DOUBLE)
                            ELSE CAST(0.0 AS DOUBLE) END,
              acc[4] + CASE WHEN (CASE WHEN e[1] > md
                                       THEN CAST(1.0 AS DOUBLE)
                                       WHEN e[1] < md
                                       THEN CAST(-1.0 AS DOUBLE)
                                       ELSE CAST(0.0 AS DOUBLE) END)
                                 < CAST(0.0 AS DOUBLE)
                            THEN CAST(1.0 AS DOUBLE)
                            ELSE CAST(0.0 AS DOUBLE) END]) AS st
          FROM g)
        SELECT n_days,
               CAST(md AS DOUBLE) / 100.0 AS median_rev,
               CAST(st[3] AS BIGINT) AS n_above,
               CAST(st[4] AS BIGINT) AS n_below,
               CAST(st[1] AS BIGINT) AS n_runs,
               floor((2.0 * st[3] * st[4] / (st[3] + st[4]) + 1.0)
                     * 1e9 + 0.5) / 1e9 AS expected_runs,
               CASE WHEN st[3] > 0 AND st[4] > 0
                     AND (2.0 * st[3] * st[4] / (st[3] + st[4]) + 1.0
                          - 1)
                        * (2.0 * st[3] * st[4] / (st[3] + st[4]) + 1.0
                           - 2)
                        / (st[3] + st[4] - 1) > 0
                    THEN floor((st[1]
                           - (2.0 * st[3] * st[4] / (st[3] + st[4])
                              + 1.0))
                         / sqrt((2.0 * st[3] * st[4] / (st[3] + st[4])
                                 + 1.0 - 1)
                                * (2.0 * st[3] * st[4]
                                   / (st[3] + st[4]) + 1.0 - 2)
                                / (st[3] + st[4] - 1))
                         * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS z_runs
        FROM st
    """,
    "grubbs_daily_outlier": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        m AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(rev AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(rev AS DECIMAL(38,0))
                          * CAST(rev AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM daily),
        gs AS (
          SELECT n AS n_days,
                 floor(CAST(s1 AS DOUBLE) / n / 100.0 * 1e9 + 0.5)
                   / 1e9 AS mu,
                 floor(sqrt(CAST(CAST(CAST(n AS DECIMAL(38,0)) * s2
                            - s1 * s1 AS DECIMAL(38,0)) AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1))) / 100.0
                       * 1e9 + 0.5) / 1e9 AS sd
          FROM m),
        dev AS (
          SELECT n_days, mu, sd, d, rev,
                 floor(abs(CAST(rev AS DOUBLE) / 100.0 - mu)
                       * 1e9 + 0.5) / 1e9 AS dv
          FROM daily, gs)
        SELECT n_days, mu, sd,
               strftime(d, '%Y-%m-%d') AS outlier_day,
               CAST(rev AS DOUBLE) / 100.0 AS outlier_revenue,
               floor(dv / sd * 1e9 + 0.5) / 1e9 AS g_stat
        FROM dev
        ORDER BY dv DESC, d ASC
        LIMIT 1
    """,
    "ljung_box_daily": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        g AS (
          SELECT COUNT(*) AS n_days,
                 SUM(CAST(rev AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(rev AS DECIMAL(38,0))
                          * CAST(rev AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM daily),
        m AS (
          SELECT l.lag, COUNT(*) AS n_k,
                 SUM(CAST(a.rev AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(b.rev AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(CAST(a.rev AS DECIMAL(38,0))
                          * CAST(b.rev AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS sxy
          FROM daily a
          CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
          JOIN daily b ON b.d = a.d - CAST(l.lag AS INT)
          GROUP BY 1),
        r AS (
          SELECT m.lag, m.n_k, g.n_days,
                 floor((CAST(m.sxy AS DOUBLE)
                        - (CAST(g.s1 AS DOUBLE) / g.n_days)
                          * (CAST(m.sx AS DOUBLE)
                             + CAST(m.sy AS DOUBLE))
                        + CAST(m.n_k AS DOUBLE)
                          * (CAST(g.s1 AS DOUBLE) / g.n_days)
                          * (CAST(g.s1 AS DOUBLE) / g.n_days))
                       / (CAST(g.s2 AS DOUBLE)
                          - CAST(g.s1 AS DOUBLE)
                            * (CAST(g.s1 AS DOUBLE) / g.n_days))
                       * 1e9 + 0.5) / 1e9 AS rho
          FROM m, g),
        ls AS (
          SELECT n_days,
                 list([CAST(lag AS DOUBLE), CAST(n_k AS DOUBLE), rho]
                      ORDER BY lag) AS ls
          FROM r GROUP BY n_days),
        q AS (
          SELECT n_days, ls,
            list_reduce(
              list_prepend([CAST(0.0 AS DOUBLE)],
                list_transform(ls, e -> [e[3] * e[3]
                  / (CAST(n_days AS DOUBLE) - e[1])])),
              (acc, e) -> list_append(acc, acc[-1] + e[1])) AS qs
          FROM ls)
        SELECT n_days,
               CAST(ls[CAST(t AS INT)][1] AS INT) AS lag,
               CAST(ls[CAST(t AS INT)][2] AS BIGINT) AS n_pairs,
               ls[CAST(t AS INT)][3] AS rho,
               floor(CAST(n_days AS DOUBLE)
                     * (CAST(n_days AS DOUBLE) + 2)
                     * qs[CAST(t + 1 AS INT)] * 1e6 + 0.5) / 1e6
                 AS q_stat,
               CAST(ls[CAST(t AS INT)][1] AS BIGINT) AS df
        FROM q, (SELECT unnest(range(1, 8)) AS t)
    """,
    "jarque_bera_value": """
        WITH e AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events),
        m AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(vu AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(vu AS DECIMAL(38,0))
                          * CAST(vu AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2,
                 SUM(CAST(CAST(CAST(vu AS DECIMAL(38,0))
                               * CAST(vu AS DECIMAL(38,0))
                               AS DECIMAL(38,0))
                          * CAST(vu AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s3,
                 SUM(CAST(CAST(CAST(vu AS DECIMAL(38,0))
                               * CAST(vu AS DECIMAL(38,0))
                               AS DECIMAL(38,0))
                          * CAST(CAST(vu AS DECIMAL(38,0))
                                 * CAST(vu AS DECIMAL(38,0))
                                 AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s4
          FROM e GROUP BY 1),
        mo AS (
          SELECT event_type, n,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                 CAST(s2 AS DOUBLE) AS s2d,
                 CAST(s3 AS DOUBLE) AS s3d,
                 CAST(s4 AS DOUBLE) AS s4d,
                 CAST(n AS DOUBLE) AS nd
          FROM m),
        ce AS (
          SELECT event_type, n,
                 s2d / nd - m1 * m1 AS m2,
                 s3d / nd - 3 * m1 * s2d / nd + 2 * m1 * m1 * m1
                   AS m3,
                 s4d / nd - 4 * m1 * s3d / nd
                   + 6 * m1 * m1 * s2d / nd
                   - 3 * m1 * m1 * m1 * m1 AS m4
          FROM mo),
        sk AS (
          SELECT event_type, n AS n_events,
                 floor(m3 / pow(m2, 1.5) * 1e9 + 0.5) / 1e9
                   AS skewness,
                 floor(m4 / (m2 * m2) * 1e9 + 0.5) / 1e9 AS kurtosis
          FROM ce)
        SELECT event_type, n_events, skewness, kurtosis,
               floor(CAST(n_events AS DOUBLE) / 6.0
                     * (skewness * skewness
                        + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0)
                     * 1e6 + 0.5) / 1e6 AS jarque_bera
        FROM sk
    """,
    "bartlett_variance_test": """
        WITH e AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events),
        m AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(vu AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(vu AS DECIMAL(38,0))
                          * CAST(vu AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM e GROUP BY 1),
        pv AS (
          SELECT event_type,
                 CAST(n AS DOUBLE) AS nd, n,
                 CAST(CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1
                           AS DECIMAL(38,0)) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS v
          FROM m),
        one AS (
          SELECT list([nd, v] ORDER BY event_type) AS gs,
                 CAST(SUM(n) AS BIGINT) AS n_total,
                 COUNT(*) AS k_groups
          FROM pv),
        f AS (
          SELECT n_total, k_groups,
                 CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE)
                   AS nk,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(gs, e -> (e[1] - 1.0) * e[2])),
                   (acc, e) -> acc + e) AS pooled_num,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(gs, e -> (e[1] - 1.0) * ln(e[2]))),
                   (acc, e) -> acc + e) AS t1,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(gs, e -> 1.0 / (e[1] - 1.0))),
                   (acc, e) -> acc + e) AS cinv
          FROM one)
        SELECT k_groups, n_total,
               floor(pooled_num / nk / 1e8 * 1e9 + 0.5) / 1e9
                 AS pooled_var,
               floor((nk * ln(pooled_num / nk) - t1)
                     / (1.0 + (cinv - 1.0 / nk)
                        / (3.0 * (CAST(k_groups AS DOUBLE) - 1)))
                     * 1e6 + 0.5) / 1e6 AS bartlett_chi2,
               CAST(k_groups - 1 AS BIGINT) AS df
        FROM f
    """,
})

# round-9 wave 2: robust location (IRLS on the value grid — the twin
# replays the identical ppb-quantized weights over raw rows, which
# sums to the same exact integers), Croston intermittent demand,
# Neyman allocation, and the pico-nat MI audit.
ORACLES.update({

    "huber_mean_value": """
        WITH e AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events),
        med AS (
          SELECT event_type, COUNT(*) AS n_events,
                 (list(vu ORDER BY vu))[CAST((COUNT(*) + 1) // 2
                                             AS INT)] AS med
          FROM e GROUP BY 1),
        mad AS (
          SELECT e.event_type,
                 (list(abs(e.vu - m.med) ORDER BY abs(e.vu - m.med)))
                   [CAST((COUNT(*) + 1) // 2 AS INT)] AS mad
          FROM e JOIN med m USING (event_type) GROUP BY 1),
        base AS (
          SELECT m.event_type, m.n_events, m.med, d.mad,
                 floor(CAST(1.4826 AS DOUBLE) * d.mad * 1e9 + 0.5)
                   / 1e9 AS s,
                 floor(CAST(1.345 AS DOUBLE) * CAST(1.4826 AS DOUBLE)
                       * d.mad * 1e9 + 0.5) / 1e9 AS ks,
                 CAST(m.med AS DOUBLE) AS mu
          FROM med m JOIN mad d USING (event_type)),
        it1 AS (
          SELECT b.event_type, b.n_events, b.med, b.mad, b.s, b.ks,
                 floor(CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))
                      * CAST(e.vu AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))) AS DOUBLE)
                   * 1e9 + 0.5) / 1e9 AS mu
          FROM e JOIN base b USING (event_type)
          GROUP BY 1, 2, 3, 4, 5, 6),
        it2 AS (
          SELECT b.event_type, b.n_events, b.med, b.mad, b.s, b.ks,
                 floor(CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))
                      * CAST(e.vu AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))) AS DOUBLE)
                   * 1e9 + 0.5) / 1e9 AS mu
          FROM e JOIN it1 b USING (event_type)
          GROUP BY 1, 2, 3, 4, 5, 6),
        it3 AS (
          SELECT b.event_type, b.n_events, b.med, b.mad, b.s, b.ks,
                 floor(CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))
                      * CAST(e.vu AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))) AS DOUBLE)
                   * 1e9 + 0.5) / 1e9 AS mu
          FROM e JOIN it2 b USING (event_type)
          GROUP BY 1, 2, 3, 4, 5, 6),
        it4 AS (
          SELECT b.event_type, b.n_events, b.med, b.mad, b.s, b.ks,
                 floor(CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))
                      * CAST(e.vu AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))) AS DOUBLE)
                   * 1e9 + 0.5) / 1e9 AS mu
          FROM e JOIN it3 b USING (event_type)
          GROUP BY 1, 2, 3, 4, 5, 6),
        it5 AS (
          SELECT b.event_type, b.n_events, b.med, b.mad, b.s, b.ks,
                 floor(CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))
                      * CAST(e.vu AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(SUM(CAST(CASE WHEN abs(CAST(e.vu AS DOUBLE)
                                              - b.mu) <= b.ks
                             THEN 1000000000
                             ELSE CAST(floor(b.ks
                                  / abs(CAST(e.vu AS DOUBLE) - b.mu)
                                  * 1e9 + 0.5) AS BIGINT) END
                           AS DECIMAL(38,0))) AS DOUBLE)
                   * 1e9 + 0.5) / 1e9 AS mu
          FROM e JOIN it4 b USING (event_type)
          GROUP BY 1, 2, 3, 4, 5, 6)
        SELECT event_type, n_events,
               CAST(med AS DOUBLE) / 10000.0 AS median_value,
               floor(s / 10000.0 * 1e9 + 0.5) / 1e9 AS madn,
               floor(mu / 10000.0 * 1e9 + 0.5) / 1e9 AS huber_mean
        FROM it5
    """,
    "croston_part_demand": """
        WITH daily AS (
          SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS d,
                 SUM(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS q
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY 1, 2),
        seq AS (
          SELECT brand,
                 list([CAST(CAST(d - DATE '1970-01-01' AS BIGINT)
                            AS DOUBLE), CAST(q AS DOUBLE)]
                      ORDER BY d) AS dx,
                 COUNT(*) AS n_demand_days
          FROM daily GROUP BY 1),
        -- flat DOUBLE[] accumulator [z, p, prev_ed, init]
        -- (explicit init flag, epoch-sign-agnostic like the Spark op)
        st AS (
          SELECT brand, n_demand_days, list_reduce(
            list_prepend([CAST(0.0 AS DOUBLE), 0, 0, 0], dx),
            (acc, e) -> CASE WHEN acc[4] < CAST(0.5 AS DOUBLE)
              THEN [e[2], CAST(1.0 AS DOUBLE), e[1],
                    CAST(1.0 AS DOUBLE)]
              ELSE [acc[1] + CAST(0.1 AS DOUBLE) * (e[2] - acc[1]),
                    acc[2] + CAST(0.1 AS DOUBLE)
                             * ((e[1] - acc[3]) - acc[2]),
                    e[1], CAST(1.0 AS DOUBLE)] END) AS st
          FROM seq)
        SELECT brand, n_demand_days,
               floor(st[1] * 1e9 + 0.5) / 1e9 AS smoothed_size,
               floor(st[2] * 1e9 + 0.5) / 1e9 AS smoothed_interval,
               floor(st[1] / st[2] * 1e9 + 0.5) / 1e9
                 AS demand_per_day
        FROM st
    """,
    "neyman_allocation_plan": """
        WITH e AS (
          SELECT event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
          FROM events),
        m AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(vu AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(vu AS DECIMAL(38,0))
                          * CAST(vu AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM e GROUP BY 1),
        per AS (
          SELECT event_type, n,
                 floor(sqrt(CAST(CAST(CAST(n AS DECIMAL(38,0)) * s2
                            - s1 * s1 AS DECIMAL(38,0)) AS DOUBLE)
                       / (CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) - 1))) / 10000.0
                       * 1e9 + 0.5) / 1e9 AS sd
          FROM m WHERE n >= 2),
        w AS (
          SELECT event_type, n, sd, CAST(n AS DOUBLE) * sd AS w
          FROM per),
        tot AS (
          SELECT list_reduce(
            list_prepend(CAST(0.0 AS DOUBLE),
                         list(w ORDER BY event_type)),
            (acc, e) -> acc + e) AS w_total
          FROM w)
        SELECT p.event_type, p.n AS n_events, p.sd AS stratum_sd,
               floor(p.w / t.w_total * 1e9 + 0.5) / 1e9
                 AS neyman_share,
               CAST(floor(floor(p.w / t.w_total * 1e9 + 0.5) / 1e9
                          * 10000) AS BIGINT) AS alloc_budget
        FROM w p, tot t
    """,
    "type_hour_mutual_info": """
        WITH cells AS (
          SELECT event_type,
                 CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
                 COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        mx AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS nx
               FROM cells GROUP BY 1),
        my AS (SELECT hr, CAST(SUM(c) AS BIGINT) AS ny
               FROM cells GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
                       COUNT(*) AS n_cells
                FROM cells),
        mi AS (
          SELECT SUM(CAST(c.c AS DECIMAL(38,0))
                 * CAST(CAST(floor(ln(CAST(c.c AS DOUBLE)
                       * CAST(t.nn AS DOUBLE)
                       / (CAST(x.nx AS DOUBLE)
                          * CAST(y.ny AS DOUBLE))) * 1000000000000
                       + 0.5) AS BIGINT) AS DECIMAL(38,0))) AS miu
          FROM cells c
          JOIN mx x USING (event_type) JOIN my y USING (hr), tot t),
        hx AS (
          SELECT SUM(CAST(nx AS DECIMAL(38,0))
                 * CAST(CAST(floor(ln(CAST(t.nn AS DOUBLE)
                       / CAST(nx AS DOUBLE)) * 1000000000000 + 0.5)
                       AS BIGINT) AS DECIMAL(38,0))) AS hxu
          FROM mx, tot t),
        hy AS (
          SELECT SUM(CAST(ny AS DECIMAL(38,0))
                 * CAST(CAST(floor(ln(CAST(t.nn AS DOUBLE)
                       / CAST(ny AS DOUBLE)) * 1000000000000 + 0.5)
                       AS BIGINT) AS DECIMAL(38,0))) AS hyu
          FROM my, tot t),
        d AS (
          SELECT t.nn, t.n_cells,
                 CAST(mi.miu AS DOUBLE) / 1e12
                   / CAST(t.nn AS DOUBLE) AS mi_d,
                 CAST(hx.hxu AS DOUBLE) / 1e12
                   / CAST(t.nn AS DOUBLE) AS hx_d,
                 CAST(hy.hyu AS DOUBLE) / 1e12
                   / CAST(t.nn AS DOUBLE) AS hy_d
          FROM tot t, mi, hx, hy)
        SELECT nn AS n_events, n_cells,
               floor(mi_d * 1e9 + 0.5) / 1e9 AS mi_nats,
               floor(hx_d * 1e9 + 0.5) / 1e9 AS h_type,
               floor(hy_d * 1e9 + 0.5) / 1e9 AS h_hour,
               floor(mi_d / least(hx_d, hy_d) * 1e9 + 0.5) / 1e9
                 AS normalized_mi
        FROM d
    """,
})

# round-9 wave 3: readability, Dirichlet query likelihood, greedy
# k-center coreset (unrolled farthest-point stages).
ORACLES.update({
    "doc_readability": """
        WITH d AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                          x -> x <> '')) AS INT) AS n_tokens,
                 CAST(len(list_filter(list_transform(
                        regexp_split_to_array(text, '[.!?]+'),
                        s -> len(list_filter(string_split(s, ' '),
                                 x -> x <> ''))), n -> n > 0)) AS INT)
                   AS n_sentences,
                 CAST(COALESCE(list_sum(list_transform(
                        list_filter(string_split(text, ' '),
                                    x -> x <> ''),
                        tok -> greatest(1, len(regexp_extract_all(
                                 lower(tok), '[aeiouy]+'))))), 0)
                      AS BIGINT) AS n_syllables
          FROM documents)
        SELECT doc_id, n_tokens, n_sentences, n_syllables,
               CASE WHEN n_sentences > 0 AND n_tokens > 0
                    THEN floor((CAST(206.835 AS DOUBLE)
                          - CAST(1.015 AS DOUBLE)
                            * (CAST(n_tokens AS DOUBLE) / n_sentences)
                          - CAST(84.6 AS DOUBLE)
                            * (CAST(n_syllables AS DOUBLE)
                               / n_tokens)) * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS flesch_reading_ease,
               CASE WHEN n_sentences > 0 AND n_tokens > 0
                    THEN floor((CAST(0.39 AS DOUBLE)
                          * (CAST(n_tokens AS DOUBLE) / n_sentences)
                          + CAST(11.8 AS DOUBLE)
                            * (CAST(n_syllables AS DOUBLE) / n_tokens)
                          - CAST(15.59 AS DOUBLE)) * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS fk_grade
        FROM d
    """,
    "lm_dirichlet_scores": f"""
        WITH docs AS (
          SELECT doc_id, {TOKS} AS toks,
                 CAST(len({TOKS}) AS INT) AS dl
          FROM documents),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
          WHERE term IN ('join', 'query', 'spark')
          GROUP BY 1, 2),
        cf AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
          FROM (SELECT unnest(toks) AS term FROM docs)
          WHERE term IN ('join', 'query', 'spark')
          GROUP BY 1),
        tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS total FROM docs),
        pairs AS (
          SELECT d.doc_id, d.dl, q.term
          FROM docs d CROSS JOIN (VALUES ('join'), ('query'),
                                         ('spark')) q(term)),
        scored AS (
          SELECT p.doc_id,
                 CAST(floor(ln((CAST(COALESCE(t.tf, 0) AS DOUBLE)
                        + CAST(2000.0 AS DOUBLE)
                          * (CAST(c.cf AS DOUBLE)
                             / CAST(tt.total AS DOUBLE)))
                       / (CAST(p.dl AS DOUBLE)
                          + CAST(2000.0 AS DOUBLE)))
                       * 1000000000000 + 0.5) AS BIGINT) AS u,
                 CASE WHEN COALESCE(t.tf, 0) > 0
                      THEN 1 ELSE 0 END AS m
          FROM pairs p
          JOIN cf c USING (term)
          LEFT JOIN tf t ON t.doc_id = p.doc_id AND t.term = p.term,
          tot tt)
        SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_match_terms,
               floor(CAST(SUM(u) AS DOUBLE) / 1e12 * 1e9 + 0.5) / 1e9
                 AS ql_score
        FROM scored GROUP BY doc_id
    """,
})


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled greedy k-center: stage j selects the argmax of the
    gridded min-distance to the j-1 cross-joined singleton center
    rows — the same fresh-min-over-all-centers the Spark operator
    evaluates per scan."""
    g = lambda expr: f"floor(({expr}) * 1e9 + 0.5) / 1e9  "  # noqa
    ctes = ["c1 AS (SELECT vec_id AS v1, label AS l1, "
            "embedding AS emb1, CAST(NULL AS DOUBLE) AS d1 "
            "FROM embeddings ORDER BY vec_id LIMIT 1)"]
    for j in range(2, k + 1):
        prev = ", ".join(f"c{i}" for i in range(1, j))
        dists = [g(f"CAST(1.0 AS DOUBLE) - "
                   f"{_cos('e.embedding', f'emb{i}')}")
                 for i in range(1, j)]
        dmin = dists[0] if j == 2 else f"least({', '.join(dists)})"
        notin = ", ".join(f"v{i}" for i in range(1, j))
        ctes.append(
            f"s{j} AS (SELECT e.vec_id, e.label, e.embedding, "
            f"{dmin} AS dmin FROM embeddings e, {prev} "
            f"WHERE e.vec_id NOT IN ({notin}))")
        ctes.append(
            f"c{j} AS (SELECT vec_id AS v{j}, label AS l{j}, "
            f"embedding AS emb{j}, dmin AS d{j} FROM s{j} "
            f"ORDER BY dmin DESC, vec_id ASC LIMIT 1)")
    selects = " UNION ALL ".join(
        f"SELECT {j} AS rank, v{j} AS vec_id, l{j} AS label, "
        f"d{j} AS sel_dist FROM c{j}" for j in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + selects


ORACLES["kcenter_greedy_coreset"] = _kcenter_sql()

# round-9: isotonic (PAVA) calibration via the minimax closed form
# over the bounded bin axis — prefix sums as exact integer folds,
# each mean one IEEE division, nested list_transform index ranges.
ORACLES.update({
    "isotonic_calibration": f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks FROM documents),
        s AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(toks,
                     x -> {_W_INT})) AS BIGINT) AS w_sum
          FROM d),
        q AS (
          SELECT doc_id,
                 CAST(len(toks) >= 30
                  AND list_sum(list_transform(toks, x -> length(x)))
                        <= 8 * len(toks)
                  AND len(list_filter(toks,
                        x -> x IN ('the','a','of','and','to','in'))) > 0
                  AND 10 * len(list_distinct(toks)) >= len(toks)
                  AS INT) AS keep
          FROM d),
        g AS (
          SELECT s.w_sum - ((s.w_sum % 256 + 256) % 256) AS bin_lo,
                 COUNT(*) AS n,
                 CAST(SUM(q.keep) AS BIGINT) AS y
          FROM s JOIN q USING (doc_id) GROUP BY 1),
        one AS (
          SELECT list(bin_lo ORDER BY bin_lo) AS bls,
                 list(n ORDER BY bin_lo) AS ns,
                 list(y ORDER BY bin_lo) AS ys
          FROM g),
        pre AS (
          SELECT bls, ns, ys,
                 list_reduce(
                   list_prepend([CAST(0 AS BIGINT)],
                     list_transform(ns, e -> [e])),
                   (acc, e) -> list_append(acc, acc[-1] + e[1])) AS pw,
                 list_reduce(
                   list_prepend([CAST(0 AS BIGINT)],
                     list_transform(ys, e -> [e])),
                   (acc, e) -> list_append(acc, acc[-1] + e[1])) AS py
          FROM one),
        iso AS (
          SELECT bls, ns, ys, pw, py,
                 list_transform(range(1, len(bls) + 1), i ->
                   list_max(list_transform(range(1, i + 1), j ->
                     list_min(list_transform(range(i, len(bls) + 1),
                       k -> CAST(py[CAST(k + 1 AS INT)]
                                 - py[CAST(j AS INT)] AS DOUBLE)
                            / CAST(pw[CAST(k + 1 AS INT)]
                                   - pw[CAST(j AS INT)] AS DOUBLE)))))
                 ) AS isov
          FROM pre)
        SELECT bls[CAST(t AS INT)] AS bin_lo,
               ns[CAST(t AS INT)] AS n_docs,
               CAST(ys[CAST(t AS INT)] AS DOUBLE)
                 / ns[CAST(t AS INT)] AS raw_keep_rate,
               floor(isov[CAST(t AS INT)] * 1e9 + 0.5) / 1e9
                 AS iso_keep_rate
        FROM iso, (SELECT unnest(range(1,
                     (SELECT len(bls) FROM iso) + 1)) AS t)
    """,
})

# round-9 wave 4: PACF (Durbin-Levinson prefix folds), Pettitt
# rank changepoint (range-update decomposition), turning-point test.
ORACLES.update({
    "pacf_daily_revenue": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        g AS (
          SELECT COUNT(*) AS n_days,
                 SUM(CAST(rev AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(rev AS DECIMAL(38,0))
                          * CAST(rev AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM daily),
        m AS (
          SELECT l.lag, COUNT(*) AS n_k,
                 SUM(CAST(a.rev AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(b.rev AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(CAST(a.rev AS DECIMAL(38,0))
                          * CAST(b.rev AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS sxy
          FROM daily a
          CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
          JOIN daily b ON b.d = a.d - CAST(l.lag AS INT)
          GROUP BY 1),
        r AS (
          SELECT m.lag, g.n_days,
                 floor((CAST(m.sxy AS DOUBLE)
                        - (CAST(g.s1 AS DOUBLE) / g.n_days)
                          * (CAST(m.sx AS DOUBLE)
                             + CAST(m.sy AS DOUBLE))
                        + CAST(m.n_k AS DOUBLE)
                          * (CAST(g.s1 AS DOUBLE) / g.n_days)
                          * (CAST(g.s1 AS DOUBLE) / g.n_days))
                       / (CAST(g.s2 AS DOUBLE)
                          - CAST(g.s1 AS DOUBLE)
                            * (CAST(g.s1 AS DOUBLE) / g.n_days))
                       * 1e9 + 0.5) / 1e9 AS rho
          FROM m, g),
        one AS (
          SELECT n_days, list(rho ORDER BY lag) AS rhos
          FROM r GROUP BY n_days),
        p AS (
          SELECT n_days, rhos,
            list_transform(range(1, len(rhos) + 1), k ->
              list_reduce(
                list_prepend(CAST([] AS DOUBLE[]),
                  list_transform(range(1, k + 1),
                                 x -> [CAST(x AS DOUBLE)])),
                (acc, e) -> CASE WHEN len(acc) = 0
                  THEN [rhos[CAST(e[1] AS INT)]]
                  ELSE list_append(
                    list_transform(range(1, len(acc) + 1), j ->
                      acc[CAST(j AS INT)]
                      - ((rhos[CAST(e[1] AS INT)]
                          - list_sum(list_transform(
                              range(1, len(acc) + 1), j2 ->
                              acc[CAST(j2 AS INT)]
                              * rhos[CAST(e[1] - j2 AS INT)])))
                         / (CAST(1.0 AS DOUBLE)
                            - list_sum(list_transform(
                                range(1, len(acc) + 1), j2 ->
                                acc[CAST(j2 AS INT)]
                                * rhos[CAST(j2 AS INT)]))))
                        * acc[CAST(len(acc) + 1 - j AS INT)]),
                    (rhos[CAST(e[1] AS INT)]
                     - list_sum(list_transform(
                         range(1, len(acc) + 1), j2 ->
                         acc[CAST(j2 AS INT)]
                         * rhos[CAST(e[1] - j2 AS INT)])))
                    / (CAST(1.0 AS DOUBLE)
                       - list_sum(list_transform(
                           range(1, len(acc) + 1), j2 ->
                           acc[CAST(j2 AS INT)]
                           * rhos[CAST(j2 AS INT)])))) END)[-1])
            AS pacfs
          FROM one)
        SELECT n_days,
               CAST(t AS INT) AS lag,
               rhos[CAST(t AS INT)] AS rho,
               floor(pacfs[CAST(t AS INT)] * 1e9 + 0.5) / 1e9 AS pacf
        FROM p, (SELECT unnest(range(1, 8)) AS t)
    """,
    "pettitt_changepoint": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        pairs AS (
          SELECT a.d AS d, b.d AS d2,
                 CAST(sign(CAST(b.rev - a.rev AS DOUBLE)) AS BIGINT)
                   AS s
          FROM daily a JOIN daily b ON b.d > a.d),
        deltas AS (
          SELECT d, CAST(SUM(delta) AS BIGINT) AS delta FROM (
            SELECT d, CAST(SUM(s) AS BIGINT) AS delta
            FROM pairs GROUP BY d
            UNION ALL
            SELECT d2 AS d, CAST(-SUM(s) AS BIGINT) AS delta
            FROM pairs GROUP BY d2) GROUP BY d),
        one AS (
          SELECT list(d ORDER BY d) AS ds,
                 list(delta ORDER BY d) AS dl,
                 (SELECT COUNT(*) FROM daily) AS n_days
          FROM deltas),
        us AS (
          SELECT ds, n_days, list_reduce(
            list_prepend([CAST(0 AS BIGINT)],
                         list_transform(dl, e -> [e])),
            (acc, e) -> list_append(acc, acc[-1] + e[1])) AS us
          FROM one),
        per AS (
          SELECT n_days, ds[CAST(t AS INT)] AS d,
                 abs(us[CAST(t + 1 AS INT)]) AS absu
          FROM us, (SELECT unnest(range(1,
                      (SELECT len(ds) FROM us) + 1)) AS t))
        SELECT n_days,
               CAST(absu AS BIGINT) AS k_stat,
               strftime(d, '%Y-%m-%d') AS change_day,
               floor(2.0 * exp(-6.0 * CAST(absu AS DOUBLE)
                     * CAST(absu AS DOUBLE)
                     / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                        * CAST(n_days AS DOUBLE)
                        + CAST(n_days AS DOUBLE)
                          * CAST(n_days AS DOUBLE)))
                     * 1e6 + 0.5) / 1e6 AS p_value
        FROM per
        ORDER BY absu DESC, d ASC
        LIMIT 1
    """,
    "turning_point_test": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        seq AS (
          SELECT list(rev ORDER BY d) AS xs, COUNT(*) AS n_days
          FROM daily),
        g AS (
          SELECT n_days,
                 CASE WHEN len(xs) < 3 THEN CAST(0 AS BIGINT)
                 ELSE CAST(COALESCE(list_sum(list_transform(
                   range(2, len(xs)), i -> CASE
                     WHEN xs[CAST(i AS INT)] > xs[CAST(i - 1 AS INT)]
                      AND xs[CAST(i AS INT)] > xs[CAST(i + 1 AS INT)]
                     THEN 1
                     WHEN xs[CAST(i AS INT)] < xs[CAST(i - 1 AS INT)]
                      AND xs[CAST(i AS INT)] < xs[CAST(i + 1 AS INT)]
                     THEN 1 ELSE 0 END)), 0) AS BIGINT) END
                   AS n_turning
          FROM seq)
        SELECT n_days, n_turning,
               floor(2.0 * (CAST(n_days AS DOUBLE) - 2) / 3.0
                     * 1e9 + 0.5) / 1e9 AS expected_turning,
               CASE WHEN (16.0 * CAST(n_days AS DOUBLE) - 29) / 90.0
                         > 0
                    THEN floor((CAST(n_turning AS DOUBLE)
                          - 2.0 * (CAST(n_days AS DOUBLE) - 2) / 3.0)
                         / sqrt((16.0 * CAST(n_days AS DOUBLE) - 29)
                                / 90.0) * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS z_turning
        FROM g
    """,
})

# round-9 wave 5: classifier evaluation metrics (exact rank-sum AUC,
# threshold operating curve, Cohen's kappa over the langid grid).
_LANGID_PRED = f"""
        t9 AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
        s9 AS (
          SELECT doc_id, lang,
                 {", ".join(f"{_score(lang)} AS score_{lang}"
                            for lang in _LANGS)}
          FROM t9),
        b9 AS (SELECT *, greatest(score_de, score_en, score_es,
                                  score_fr, score_zh) AS best
               FROM s9),
        pred9 AS (
          SELECT doc_id, lang,
                 CASE {" ".join(
                     f"WHEN best > 0 AND score_{lang} = best "
                     f"THEN '{lang}'" for lang in _LANGS)}
                      ELSE 'unk' END AS pred_lang
          FROM b9)"""

_CLS9 = f"""
        d9 AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        s9 AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(toks,
                     x -> {_W_INT})) AS BIGINT) AS w_sum
          FROM d9),
        q9 AS (
          SELECT doc_id,
                 CAST(len(toks) >= 30
                  AND list_sum(list_transform(toks, x -> length(x)))
                        <= 8 * len(toks)
                  AND len(list_filter(toks,
                        x -> x IN ('the','a','of','and','to','in'))) > 0
                  AND 10 * len(list_distinct(toks)) >= len(toks)
                  AS INT) AS keep
          FROM d9)"""

ORACLES.update({
    "classifier_auc": f"""
        WITH {_CLS9},
        c AS (
          SELECT s9.w_sum,
                 CAST(SUM(q9.keep) AS BIGINT) AS c1,
                 CAST(SUM(1 - q9.keep) AS BIGINT) AS c0
          FROM s9 JOIN q9 USING (doc_id) GROUP BY 1),
        cum AS (
          SELECT c1, c0,
                 CAST(SUM(c1 + c0) OVER (ORDER BY w_sum
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) - (c1 + c0) AS BIGINT) AS prior
          FROM c),
        tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                       CAST(SUM(c0) AS BIGINT) AS n0 FROM c),
        r AS (SELECT SUM(CAST(c1 AS DECIMAL(38,0))
                  * CAST(2 * prior + c1 + c0 + 1
                         AS DECIMAL(38,0))) AS r2
              FROM cum)
        SELECT n1 AS n_keep, n0 AS n_drop,
               (CAST(r2 AS DOUBLE)
                - CAST(CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)
                       AS DOUBLE)) * 0.5 AS u_keep,
               (CAST(r2 AS DOUBLE)
                - CAST(CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)
                       AS DOUBLE)) * 0.5
                 / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS auc
        FROM r, tot
    """,
    "classifier_pr_table": f"""
        WITH {_CLS9},
        g AS (
          SELECT s9.w_sum - ((s9.w_sum % 256 + 256) % 256) AS bin_lo,
                 CAST(SUM(q9.keep) AS BIGINT) AS n1,
                 CAST(SUM(1 - q9.keep) AS BIGINT) AS n0
          FROM s9 JOIN q9 USING (doc_id) GROUP BY 1),
        tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS pos FROM g),
        suf AS (
          SELECT bin_lo,
                 CAST(SUM(n1) OVER (ORDER BY bin_lo DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS tp,
                 CAST(SUM(n0) OVER (ORDER BY bin_lo DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS fp
          FROM g)
        SELECT bin_lo AS threshold, tp, fp,
               pos - tp AS fn,
               CASE WHEN tp + fp > 0
                    THEN floor(CAST(tp AS DOUBLE) / (tp + fp)
                               * 1e9 + 0.5) / 1e9 END AS precision,
               floor(CAST(tp AS DOUBLE) / pos * 1e9 + 0.5) / 1e9
                 AS recall,
               CASE WHEN tp + fp > 0 AND tp > 0
                    THEN floor(2 * (CAST(tp AS DOUBLE) / (tp + fp))
                         * (CAST(tp AS DOUBLE) / pos)
                         / ((CAST(tp AS DOUBLE) / (tp + fp))
                            + (CAST(tp AS DOUBLE) / pos))
                         * 1e9 + 0.5) / 1e9 END AS f1
        FROM suf, tot
    """,
    "langid_kappa": f"""
        WITH {_LANGID_PRED},
        cells AS (
          SELECT lang, pred_lang, COUNT(*) AS c
          FROM pred9 GROUP BY 1, 2),
        tot AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN lang = pred_lang THEN c
                               ELSE 0 END) AS BIGINT) AS n_agree
          FROM cells),
        pe AS (
          SELECT SUM(CAST(rl AS DECIMAL(38,0))
                     * CAST(cl AS DECIMAL(38,0))) AS pe_num
          FROM (
            SELECT l.lang,
                   (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT)
                    FROM cells WHERE cells.lang = l.lang) AS rl,
                   (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT)
                    FROM cells
                    WHERE cells.pred_lang = l.lang) AS cl
            FROM (SELECT DISTINCT lang FROM cells) l))
        SELECT n_docs, n_agree,
               floor(CAST(n_agree AS DOUBLE)
                     / CAST(n_docs AS DOUBLE) * 1e9 + 0.5) / 1e9
                 AS observed_agreement,
               floor(CAST(pe_num AS DOUBLE)
                     / (CAST(n_docs AS DOUBLE)
                        * CAST(n_docs AS DOUBLE)) * 1e9 + 0.5) / 1e9
                 AS expected_agreement,
               CASE WHEN CAST(pe_num AS DOUBLE)
                         / (CAST(n_docs AS DOUBLE)
                            * CAST(n_docs AS DOUBLE)) < 1.0
                    THEN floor((CAST(n_agree AS DOUBLE)
                          / CAST(n_docs AS DOUBLE)
                          - CAST(pe_num AS DOUBLE)
                            / (CAST(n_docs AS DOUBLE)
                               * CAST(n_docs AS DOUBLE)))
                         / (1.0 - CAST(pe_num AS DOUBLE)
                            / (CAST(n_docs AS DOUBLE)
                               * CAST(n_docs AS DOUBLE)))
                         * 1e9 + 0.5) / 1e9 END AS kappa
        FROM tot, pe
    """,
})

# round-9 wave 6: A/B proportions, log-rank survival comparison,
# confusion metrics, Gumbel block maxima.
ORACLES.update({
    "ab_conversion_ztest": """
        WITH e AS (
          SELECT CAST(((user_id % 2) + 2) % 2 AS INT) AS arm,
                 CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END AS isp
          FROM events),
        per AS (
          SELECT arm, COUNT(*) AS n_events,
                 CAST(SUM(isp) AS BIGINT) AS n_conv
          FROM e GROUP BY 1),
        one AS (
          SELECT MAX(CASE WHEN arm = 0 THEN n_events END) AS n0,
                 MAX(CASE WHEN arm = 0 THEN n_conv END) AS c0,
                 MAX(CASE WHEN arm = 1 THEN n_events END) AS n1,
                 MAX(CASE WHEN arm = 1 THEN n_conv END) AS c1
          FROM per)
        SELECT n0, c0, n1, c1,
               floor(CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                     * 1e9 + 0.5) / 1e9 AS conv_rate_0,
               floor(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     * 1e9 + 0.5) / 1e9 AS conv_rate_1,
               floor((CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
                     / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
                     * 1e9 + 0.5) / 1e9 AS pooled_rate,
               CASE WHEN sqrt(
                      ((CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
                       / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
                      * (1.0 - (CAST(c0 AS DOUBLE)
                                + CAST(c1 AS DOUBLE))
                         / (CAST(n0 AS DOUBLE)
                            + CAST(n1 AS DOUBLE)))
                      * (1.0 / CAST(n0 AS DOUBLE)
                         + 1.0 / CAST(n1 AS DOUBLE))) > 0
                    THEN floor((CAST(c0 AS DOUBLE)
                                / CAST(n0 AS DOUBLE)
                          - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                         / sqrt(
                      ((CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
                       / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
                      * (1.0 - (CAST(c0 AS DOUBLE)
                                + CAST(c1 AS DOUBLE))
                         / (CAST(n0 AS DOUBLE)
                            + CAST(n1 AS DOUBLE)))
                      * (1.0 / CAST(n0 AS DOUBLE)
                         + 1.0 / CAST(n1 AS DOUBLE)))
                         * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS z_score
        FROM one
    """,
    "logrank_purchase_gap": """
        WITH p AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 CAST(((user_id % 2) + 2) % 2 AS INT) AS arm
          FROM events WHERE event_type = 'purchase'),
        fr AS (SELECT MAX(ts_us) AS fr FROM p),
        g AS (
          SELECT user_id, arm, ts_us,
                 LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                   AS nxt
          FROM p),
        gaps AS (
          SELECT arm,
                 (COALESCE(nxt, fr.fr) - ts_us) // 86400000000 AS gd,
                 CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END
                   AS observed
          FROM g, fr),
        risk AS (
          SELECT gd, CAST(SUM(observed) AS BIGINT) AS d,
                 CAST(SUM(CASE WHEN arm = 0 THEN observed
                               ELSE 0 END) AS BIGINT) AS d0,
                 CAST(COUNT(*) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c0
          FROM gaps GROUP BY gd),
        tbl AS (
          SELECT gd, d, d0,
                 CAST(SUM(c) OVER (ORDER BY gd DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS nr,
                 CAST(SUM(c0) OVER (ORDER BY gd DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS nr0
          FROM risk),
        folded AS (
          SELECT list(struct_pack(gd := gd, d := d, d0 := d0,
                                  nr := nr, nr0 := nr0)
                      ORDER BY gd) AS rows,
                 CAST(SUM(d) AS BIGINT) AS n_events,
                 CAST(SUM(d0) AS BIGINT) AS o0
          FROM tbl WHERE d > 0),
        ev AS (
          SELECT n_events, o0,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(rows, x ->
                     CAST(x.d AS DOUBLE) * CAST(x.nr0 AS DOUBLE)
                     / CAST(x.nr AS DOUBLE))),
                   (acc, e) -> acc + e) AS e0,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(rows, x ->
                     CASE WHEN x.nr > 1 THEN CAST(x.d AS DOUBLE)
                       * (CAST(x.nr0 AS DOUBLE) / CAST(x.nr AS DOUBLE))
                       * (CAST(1.0 AS DOUBLE)
                          - CAST(x.nr0 AS DOUBLE)
                            / CAST(x.nr AS DOUBLE))
                       * (CAST(x.nr AS DOUBLE) - CAST(x.d AS DOUBLE))
                       / (CAST(x.nr AS DOUBLE) - CAST(1.0 AS DOUBLE))
                       ELSE CAST(0.0 AS DOUBLE) END)),
                   (acc, e) -> acc + e) AS v0
          FROM folded)
        SELECT n_events, o0,
               floor(e0 * 1e9 + 0.5) / 1e9 AS expected_0,
               floor(v0 * 1e9 + 0.5) / 1e9 AS variance_0,
               CASE WHEN v0 > 0
                    THEN floor((CAST(o0 AS DOUBLE) - e0) / sqrt(v0)
                               * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS z_score,
               CASE WHEN v0 > 0
                    THEN floor((CAST(o0 AS DOUBLE) - e0)
                               * (CAST(o0 AS DOUBLE) - e0) / v0
                               * 1e6 + 0.5) / 1e6
                    ELSE NULL END AS logrank_chi2
        FROM ev
    """,
    "gumbel_block_maxima": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS rev
          FROM orders GROUP BY 1),
        blocks AS (
          SELECT strftime(d, '%Y-%m') AS m, MAX(rev) AS mx
          FROM daily GROUP BY 1),
        stats AS (
          SELECT COUNT(*) AS n_blocks,
                 SUM(CAST(mx AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(CAST(mx AS DECIMAL(38,0))
                          * CAST(mx AS DECIMAL(38,0))
                          AS DECIMAL(38,0))) AS s2
          FROM blocks),
        g AS (
          SELECT n_blocks,
                 floor(CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE)
                       / 100.0 * 1e9 + 0.5) / 1e9 AS block_mean,
                 floor(sqrt(CAST(CAST(CAST(n_blocks AS DECIMAL(38,0))
                            * s2 - s1 * s1 AS DECIMAL(38,0))
                            AS DOUBLE)
                       / (CAST(n_blocks AS DOUBLE)
                          * (CAST(n_blocks AS DOUBLE) - 1))) / 100.0
                       * 1e9 + 0.5) / 1e9 AS block_sd
          FROM stats)
        SELECT n_blocks, block_mean, block_sd,
               floor((block_mean - CAST(0.5772156649015329 AS DOUBLE)
                      * (block_sd
                         * CAST(2.449489742783178 AS DOUBLE)
                         / CAST(3.141592653589793 AS DOUBLE)))
                     * 1e9 + 0.5) / 1e9 AS gumbel_mu,
               floor(block_sd * CAST(2.449489742783178 AS DOUBLE)
                     / CAST(3.141592653589793 AS DOUBLE)
                     * 1e9 + 0.5) / 1e9 AS gumbel_beta,
               floor((block_mean - CAST(0.5772156649015329 AS DOUBLE)
                      * (block_sd
                         * CAST(2.449489742783178 AS DOUBLE)
                         / CAST(3.141592653589793 AS DOUBLE))
                      - (block_sd * CAST(2.449489742783178 AS DOUBLE)
                         / CAST(3.141592653589793 AS DOUBLE))
                        * CAST(-4.600149226776579 AS DOUBLE))
                     * 1e9 + 0.5) / 1e9 AS return_level_100
        FROM g
    """,
    "classifier_mcc": f"""
        WITH {_CLS9},
        j AS (
          SELECT CASE WHEN s9.w_sum >= 0 THEN 1 ELSE 0 END AS pred,
                 q9.keep
          FROM s9 JOIN q9 USING (doc_id)),
        g AS (
          SELECT CAST(SUM(CASE WHEN pred = 1 AND keep = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                 CAST(SUM(CASE WHEN pred = 1 AND keep = 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                 CAST(SUM(CASE WHEN pred = 0 AND keep = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                 CAST(SUM(CASE WHEN pred = 0 AND keep = 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS tn
          FROM j)
        SELECT tp, fp, fn, tn,
               floor(CAST(tp + tn AS DOUBLE)
                     / (tp + fp + fn + tn) * 1e9 + 0.5) / 1e9
                 AS accuracy,
               CASE WHEN sqrt(CAST(CAST(
                        (CAST(tp AS DECIMAL(38,0))
                         + CAST(fp AS DECIMAL(38,0)))
                        * (CAST(tp AS DECIMAL(38,0))
                           + CAST(fn AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS DOUBLE))
                     * sqrt(CAST(CAST(
                        (CAST(tn AS DECIMAL(38,0))
                         + CAST(fp AS DECIMAL(38,0)))
                        * (CAST(tn AS DECIMAL(38,0))
                           + CAST(fn AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS DOUBLE)) > 0
                    THEN floor(CAST(CAST(
                           CAST(tp AS DECIMAL(38,0))
                           * CAST(tn AS DECIMAL(38,0))
                           - CAST(fp AS DECIMAL(38,0))
                             * CAST(fn AS DECIMAL(38,0))
                           AS DECIMAL(38,0)) AS DOUBLE)
                         / (sqrt(CAST(CAST(
                             (CAST(tp AS DECIMAL(38,0))
                              + CAST(fp AS DECIMAL(38,0)))
                             * (CAST(tp AS DECIMAL(38,0))
                                + CAST(fn AS DECIMAL(38,0)))
                             AS DECIMAL(38,0)) AS DOUBLE))
                            * sqrt(CAST(CAST(
                               (CAST(tn AS DECIMAL(38,0))
                                + CAST(fp AS DECIMAL(38,0)))
                               * (CAST(tn AS DECIMAL(38,0))
                                  + CAST(fn AS DECIMAL(38,0)))
                               AS DECIMAL(38,0)) AS DOUBLE)))
                         * 1e9 + 0.5) / 1e9
                    ELSE NULL END AS mcc
        FROM g
    """,
})
