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
               SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
               COUNT(json_extract_string(props, '$.k')) AS n_with_k,
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
    "windowed_event_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
               event_type,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00'), event_type
    """,
}
