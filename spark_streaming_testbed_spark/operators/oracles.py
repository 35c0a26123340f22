"""DuckDB oracle SQL for every relational operator in ``relational.py``.

Each SQL string is the ANSI equivalent of the Spark plan with identical
output column names and value formatting (floats rounded to the same
precision, timestamps emitted as epoch seconds or formatted strings), so
the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

RELATIONAL_ORACLES: dict[str, str] = {}


def oracle(name: str):
    def deco(sql: str) -> str:
        RELATIONAL_ORACLES[name] = sql
        return sql
    return deco


RELATIONAL_ORACLES["batch_stats"] = """
SELECT CAST(floor(epoch(ts)/5)*5 AS BIGINT) AS window_start,
       event_type,
       count(*) AS cnt,
       round(sum(value), 6) AS sum_v,
       round(avg(value), 6) AS mean_v,
       coalesce(round(stddev_pop(value), 6), 0.0) AS stddev_v
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

RELATIONAL_ORACLES["parse_filter"] = r"""
WITH parsed AS (
  SELECT event_id,
         TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
  FROM events
)
SELECT event_id, k FROM parsed
WHERE k IS NOT NULL AND k % 2 = 0
ORDER BY event_id
"""

RELATIONAL_ORACLES["tsv_format"] = """
SELECT event_id,
       concat_ws(chr(9), CAST(event_id AS VARCHAR), '0', event_type,
                 CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)) AS line
FROM events
ORDER BY event_id
"""

RELATIONAL_ORACLES["time_shift"] = """
SELECT event_id,
       CAST((epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events)) // 1000
            AS BIGINT) AS rel_ms
FROM events
ORDER BY event_id
"""

RELATIONAL_ORACLES["unit_norm"] = """
SELECT event_id,
       round(CASE WHEN event_type = 'error' THEN value * 1024
                  ELSE value END, 6) AS value_kb
FROM events
ORDER BY event_id
"""

RELATIONAL_ORACLES["cumulative_counts"] = """
SELECT event_id, event_type,
       count(*) OVER w AS running_cnt,
       round(sum(value) OVER w, 6) AS running_sum
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

RELATIONAL_ORACLES["value_histogram"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS cnt
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

RELATIONAL_ORACLES["per_minute_rollup"] = """
SELECT CAST(floor(epoch(ts)/60)*60 AS BIGINT) AS minute_start,
       user_id, count(*) AS cnt, round(sum(value), 6) AS sum_v
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

RELATIONAL_ORACLES["dedup_first"] = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_id, event_type, value FROM ranked
WHERE rn = 1 ORDER BY user_id
"""

RELATIONAL_ORACLES["pivot_counts"] = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS "view"
FROM events
GROUP BY user_id
ORDER BY user_id
"""

RELATIONAL_ORACLES["minmax_union"] = """
WITH allt AS (
  SELECT ts AS t FROM events
  UNION ALL SELECT o_orderdate FROM orders
  UNION ALL SELECT l_shipdate FROM lineitem
)
SELECT CAST(floor(epoch(min(t))) AS BIGINT) AS min_ts,
       CAST(floor(epoch(max(t))) AS BIGINT) AS max_ts
FROM allt
"""

RELATIONAL_ORACLES["distinct_keys"] = """
SELECT DISTINCT id FROM (
  SELECT user_id AS id FROM events
  UNION ALL SELECT c_custkey FROM customer
) ORDER BY id
"""

RELATIONAL_ORACLES["topk_per_group"] = """
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rk
  FROM events
)
SELECT event_type, rk, event_id, value FROM ranked
WHERE rk <= 3 ORDER BY event_type, rk
"""

RELATIONAL_ORACLES["rollup_join"] = """
WITH p AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), e AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_error
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT coalesce(p.day, e.day) AS day,
       coalesce(n_purchase, 0) AS n_purchase,
       coalesce(n_error, 0) AS n_error
FROM p FULL OUTER JOIN e ON p.day = e.day
ORDER BY day
"""

RELATIONAL_ORACLES["star_join"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

RELATIONAL_ORACLES["semi_anti_join"] = """
WITH w AS (
  SELECT c_mktsegment, count(*) AS n_with_orders
  FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY 1
), wo AS (
  SELECT c_mktsegment, count(*) AS n_without_orders
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY 1
)
SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       coalesce(n_with_orders, 0) AS n_with_orders,
       coalesce(n_without_orders, 0) AS n_without_orders
FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
ORDER BY c_mktsegment
"""

RELATIONAL_ORACLES["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

RELATIONAL_ORACLES["tpch_q3"] = """
SELECT l_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

RELATIONAL_ORACLES["tpch_q5"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

RELATIONAL_ORACLES["tpch_q10"] = """
SELECT c_custkey, c_name, n_name,
       round(c_acctbal, 2) AS c_acctbal,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

RELATIONAL_ORACLES["tpch_q18"] = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity), 2) > 150)
SELECT c_custkey, c_name, l_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s,
       round(o_totalprice, 2) AS o_totalprice,
       total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, l_orderkey
LIMIT 100
"""

RELATIONAL_ORACLES["skew_salted_agg"] = """
SELECT event_type, count(*) AS cnt, round(sum(value), 6) AS sum_v
FROM events GROUP BY event_type ORDER BY event_type
"""

RELATIONAL_ORACLES["value_percentiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""

RELATIONAL_ORACLES["tpch_q12"] = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
"""

RELATIONAL_ORACLES["tpch_q14"] = """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
"""

RELATIONAL_ORACLES["tpch_q17"] = """
WITH per_part AS (
  SELECT l_partkey AS pk, avg(l_quantity) * 0.2 AS qty_cut
  FROM lineitem GROUP BY l_partkey)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_items
FROM lineitem JOIN per_part ON l_partkey = pk
WHERE l_quantity < qty_cut
"""

RELATIONAL_ORACLES["tpch_q19"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""

RELATIONAL_ORACLES["sliding_window_stats"] = """
WITH expanded AS (
  SELECT unnest([
           (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300,
           (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 - 300
         ]) AS window_start,
         event_type, value
  FROM events)
SELECT window_start, event_type,
       count(*) AS cnt, round(sum(value), 6) AS sum_v
FROM expanded
GROUP BY 1, 2 ORDER BY 1, 2
"""

RELATIONAL_ORACLES["approx_distinct_users"] = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       true AS within_10pct
FROM events GROUP BY event_type ORDER BY event_type
"""

RELATIONAL_ORACLES["tpch_q6"] = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

RELATIONAL_ORACLES["set_ops"] = """
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT user_id, 'both' AS cohort FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
UNION ALL
SELECT user_id, 'click_only' FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
UNION ALL
SELECT user_id, 'purchase_only' FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM c)
ORDER BY cohort, user_id
"""

RELATIONAL_ORACLES["window_functions"] = """
SELECT event_id,
       lag(value) OVER u AS prev_v,
       lead(value) OVER u AS next_v,
       rank() OVER t AS value_rank,
       ntile(4) OVER t AS quartile
FROM events
WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id),
       t AS (PARTITION BY event_type ORDER BY value DESC, event_id)
ORDER BY event_id
"""

RELATIONAL_ORACLES["cube_agg"] = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""

RELATIONAL_ORACLES["unpivot_events"] = """
SELECT user_id, event_type, count(*) AS cnt
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""

RELATIONAL_ORACLES["order_priority_count"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
