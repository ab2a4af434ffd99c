"""DuckDB oracle SQL for the relational operator coverage
(operators/relational.py). Monetary sums are decimal(18,2) on both engines
so values are exact and order-independent."""

from __future__ import annotations


def q_tpch_q1() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
  sum((l_extendedprice::DECIMAL(18,2)
       * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(30,4))::DOUBLE
    AS sum_disc_price,
  count(*)::BIGINT AS count_order,
  round(sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_label_weights() -> str:
    return """
WITH c AS (
  SELECT l_returnflag AS label, count(*)::BIGINT AS n FROM lineitem GROUP BY 1
)
SELECT label, n, round(1 - n / sum(n) OVER (), 6) AS weight FROM c
"""


def q_distinct_labels() -> str:
    return "SELECT DISTINCT o_orderpriority AS label FROM orders"


def q_top_orders() -> str:
    return """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_first_orders_per_customer() -> str:
    return """
SELECT o_custkey, o_orderkey, rn::INT AS rn FROM (
  SELECT o_custkey, o_orderkey,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
"""


def q_fold_split() -> str:
    return """
SELECT fold::INT AS fold, count(*)::BIGINT AS n,
       sum(o_orderkey)::BIGINT AS key_sum
FROM (SELECT o_orderkey,
        ((strpos('0123456789abcdef',
                 substring(md5(o_orderkey::VARCHAR), 1, 1)) - 1) * 16
         + strpos('0123456789abcdef',
                  substring(md5(o_orderkey::VARCHAR), 2, 1)) - 1) % 5 + 1
          AS fold
      FROM orders)
GROUP BY fold
"""


def q_customers_without_orders() -> str:
    return """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
"""


def q_customers_with_building_orders() -> str:
    return """
SELECT c_custkey, c_acctbal FROM customer c
WHERE c_mktsegment = 'BUILDING'
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_revenue_by_region() -> str:
    return """
SELECT r_name AS region,
  sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue,
  count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_events_by_value_band() -> str:
    return """
WITH bands(band_id, lo, hi) AS (
  VALUES (0::BIGINT, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 200.0),
         (3, 200.0, 1e9)
)
SELECT band_id, count(*)::BIGINT AS n,
  round(sum(value::DECIMAL(18,2))::DOUBLE, 2) AS value_sum
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id
"""


def q_custkey_setops() -> str:
    return """
WITH wo AS (SELECT DISTINCT o_custkey AS k FROM orders),
     pb AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0)
SELECT 'both' AS tag, k FROM (SELECT k FROM wo INTERSECT SELECT k FROM pb)
UNION ALL
SELECT 'only_orders' AS tag, k FROM (SELECT k FROM wo EXCEPT ALL SELECT k FROM pb)
"""


def q_union_priorities() -> str:
    return """
SELECT 'urgent' AS src, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT 'low' AS src, o_orderkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


def q_event_type_pivot() -> str:
    cols = ",\n  ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n_{t}"
        for t in ["click", "view", "purchase", "signup", "error"]
    )
    return f"""
SELECT (user_id % 5)::INT AS bucket,
  {cols}
FROM events GROUP BY 1
"""


def q_lineitem_cube() -> str:
    return """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*)::BIGINT AS n,
       sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_events_by_hour() -> str:
    return """
SELECT date_part('hour', ts)::INT AS hour, count(*)::BIGINT AS n,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1
"""


def q_part_strings() -> str:
    return """
SELECT p_partkey,
  upper(p_brand) AS brand_upper,
  length(p_name)::INT AS name_len,
  substring(p_type, 1, 5) AS type_prefix,
  p_brand || '::' || p_type AS brand_type,
  coalesce(regexp_extract(p_name, '([0-9]+)', 1), '') AS name_num,
  len(string_split(p_type, ' '))::INT AS type_words
FROM part
"""


def q_json_props() -> str:
    return """
SELECT (CAST(json_extract_string(props, '$.k') AS INT) % 10)::INT AS k_mod,
       count(*)::BIGINT AS n
FROM events GROUP BY 1
"""


def q_tpch_q3() -> str:
    return """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  sum((l_extendedprice::DECIMAL(18,2)
       * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(30,4))::DOUBLE
    AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_q5() -> str:
    return """
SELECT n_name AS nation,
  sum((l_extendedprice::DECIMAL(18,2)
       * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(30,4))::DOUBLE
    AS revenue,
  count(*)::BIGINT AS n_lineitems
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q_big_spenders() -> str:
    return """
SELECT c_custkey, c_name, total::DOUBLE AS total_spent
FROM (
  SELECT o_custkey, sum(o_totalprice::DECIMAL(18,2)) AS total
  FROM orders GROUP BY o_custkey
  HAVING sum(o_totalprice::DECIMAL(18,2)) > 1500000
) b JOIN customer ON b.o_custkey = c_custkey
"""


def q_salted_agg() -> str:
    return """
SELECT l_returnflag, sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
       count(*)::BIGINT AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_tpch_q6() -> str:
    return """
SELECT
  sum((l_extendedprice::DECIMAL(18,2)
       * l_discount::DECIMAL(18,2))::DECIMAL(30,4))::DOUBLE AS revenue,
  count(*)::BIGINT AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_tpch_q18() -> str:
    return """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity::DECIMAL(18,2)) AS sum_qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity::DECIMAL(18,2)) > 300
)
SELECT c_name, c_custkey, o_orderkey,
  epoch_us(o_orderdate)::BIGINT AS o_date_us, o_totalprice,
  sum_qty_dec::DOUBLE AS sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_date_us, o_orderkey
LIMIT 100
"""


# union-tag + carry-forward as-of CTEs (view sorts before simultaneous
# click) — shared by the as-of join and funnel oracles, mirroring the
# Spark side where q_events_funnel composes on q_events_asof
_ASOF_CTES = """
u AS (
  SELECT user_id, ts, 0 AS tag, event_id AS v_id, NULL::BIGINT AS c_id
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, 1, NULL::BIGINT, event_id
  FROM events WHERE event_type = 'click'
),
carried AS (
  SELECT user_id, c_id, epoch_us(ts)::BIGINT AS ev_us,
    last_value(v_id IGNORE NULLS) OVER w AS asof_view_id,
    last_value(CASE WHEN v_id IS NOT NULL THEN epoch_us(ts)::BIGINT END
               IGNORE NULLS) OVER w AS asof_view_us
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts, tag, coalesce(v_id, c_id)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)"""


def q_events_asof() -> str:
    return f"""
WITH {_ASOF_CTES.strip()}
SELECT c_id AS click_event_id, user_id, ev_us AS click_us,
  asof_view_id, (ev_us - asof_view_us)::BIGINT AS lag_us
FROM carried WHERE c_id IS NOT NULL
"""


def q_events_rollup() -> str:
    return """
WITH base AS (
  SELECT event_type,
    epoch_us(date_trunc('day', ts))::BIGINT AS day_us,
    epoch_us(date_trunc('hour', ts))::BIGINT AS hour_us,
    floor(value * 1000000 + 0.5)::BIGINT AS value_micro
  FROM events
)
SELECT event_type, day_us, hour_us,
  GROUPING(event_type, day_us, hour_us)::BIGINT AS gid,
  count(*)::BIGINT AS n_events,
  sum(value_micro)::BIGINT AS value_micro_sum
FROM base
GROUP BY ROLLUP (event_type, day_us, hour_us)
"""


def q_events_sessions() -> str:
    from ..operators.relational import SESSION_GAP_US

    return f"""
WITH base AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS ev_us, event_id FROM events
),
flagged AS (
  SELECT user_id, ev_us, event_id,
    CASE WHEN ev_us - lag(ev_us) OVER w > {SESSION_GAP_US}
         THEN 1 ELSE 0 END AS new_session
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ev_us, event_id)
),
sessions AS (
  SELECT user_id, ev_us,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ev_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_n
  FROM flagged
)
SELECT user_id, session_n::BIGINT AS session_n,
  count(*)::BIGINT AS n_events,
  min(ev_us)::BIGINT AS start_us,
  max(ev_us)::BIGINT AS end_us,
  (max(ev_us) - min(ev_us))::BIGINT AS duration_us
FROM sessions GROUP BY user_id, session_n
"""


def q_tpch_q10() -> str:
    return """
SELECT c_custkey, c_name, n_name,
  sum((l_extendedprice::DECIMAL(18,2)
       * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(30,4)
     )::DOUBLE AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_events_funnel() -> str:
    from ..operators.relational import FUNNEL_WINDOW_US

    return f"""
WITH {_ASOF_CTES.strip()},
clicks AS (
  SELECT epoch_us(date_trunc('day', make_timestamp(ev_us)))::BIGINT
           AS day_us,
    CASE WHEN asof_view_id IS NOT NULL
          AND (ev_us - asof_view_us) <= {FUNNEL_WINDOW_US}
         THEN 1 ELSE 0 END AS converted
  FROM carried WHERE c_id IS NOT NULL
),
cday AS (
  SELECT day_us, count(*)::BIGINT AS n_clicks,
         sum(converted)::BIGINT AS n_converted
  FROM clicks GROUP BY 1
),
vday AS (
  SELECT epoch_us(date_trunc('day', ts))::BIGINT AS day_us,
         count(*)::BIGINT AS n_views
  FROM events WHERE event_type = 'view' GROUP BY 1
)
SELECT day_us,
  coalesce(n_views, 0)::BIGINT AS n_views,
  coalesce(n_clicks, 0)::BIGINT AS n_clicks,
  coalesce(n_converted, 0)::BIGINT AS n_converted,
  (CASE WHEN coalesce(n_clicks, 0) > 0
        THEN (coalesce(n_converted, 0) * 1000000) // coalesce(n_clicks, 1)
        ELSE 0 END)::BIGINT AS conv_rate_micro
FROM cday FULL JOIN vday USING (day_us)
"""


def q_events_percentiles() -> str:
    picks = ",\n  ".join(
        f"max(CASE WHEN rn = (n * {p} + 99) // 100 THEN vm END)::BIGINT"
        f" AS p{p}_micro"
        for p in (50, 90, 99)
    )
    return f"""
WITH base AS (
  SELECT event_type, floor(value * 1000000 + 0.5)::BIGINT AS vm, event_id
  FROM events
),
ranked AS (
  SELECT event_type, vm,
    row_number() OVER (PARTITION BY event_type ORDER BY vm, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM base
)
SELECT event_type, max(n)::BIGINT AS n,
  {picks}
FROM ranked GROUP BY event_type
"""


def q_events_retention() -> str:
    from ..operators.relational import DAY_US

    return f"""
WITH days AS (
  SELECT DISTINCT user_id,
    epoch_us(date_trunc('day', ts))::BIGINT AS day_us
  FROM events
),
first AS (
  SELECT user_id, min(day_us)::BIGINT AS cohort_us FROM days GROUP BY 1
),
j AS (
  SELECT f.cohort_us, f.user_id, d1.user_id AS u1, d7.user_id AS u7
  FROM first f
  LEFT JOIN days d1 ON d1.user_id = f.user_id
    AND d1.day_us = f.cohort_us + {DAY_US}
  LEFT JOIN days d7 ON d7.user_id = f.user_id
    AND d7.day_us = f.cohort_us + {7 * DAY_US}
)
SELECT cohort_us, count(*)::BIGINT AS n_users,
  count(u1)::BIGINT AS retained_d1,
  count(u7)::BIGINT AS retained_d7,
  ((count(u1) * 1000000) // count(*))::BIGINT AS rate_d1_micro,
  ((count(u7) * 1000000) // count(*))::BIGINT AS rate_d7_micro
FROM j GROUP BY cohort_us
"""
