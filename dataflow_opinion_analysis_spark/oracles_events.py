"""DuckDB oracles for operators/events_ops.py."""

from __future__ import annotations

from dataflow_opinion_analysis_spark.operators.dataprep import TOKEN_RE
from dataflow_opinion_analysis_spark.operators.events_ops import (
    NGRAM_MAX_N,
    SESSION_GAP_MIN,
)

TOKEN_RE_SQL = TOKEN_RE.replace("'", "''")
DUCK_TOKENS = f"regexp_extract_all(lower(coalesce(text, '')), '{TOKEN_RE_SQL}')"

_ngram_arrays = ", ".join(
    f"""list_transform(generate_series(1, greatest(len(toks) - {n - 1}, 0)),
                      i -> array_to_string(toks[i:i+{n - 1}], ' '))"""
    for n in range(1, NGRAM_MAX_N + 1)
)

STATNGRAM_SQL = f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
grams AS (
  SELECT doc_id, unnest(flatten([{_ngram_arrays}])) AS ngram
  FROM toks
)
SELECT ngram,
  count(*)               AS CntOccurrences,
  count(DISTINCT doc_id) AS CntDocs
FROM grams
WHERE ngram <> ''
GROUP BY ngram
"""

WRSOCIALCOUNT_SQL = """
WITH counts AS (
  SELECT
    sha256('wr-' || cast(user_id AS varchar))       AS WebResourceHash,
    cast(strftime(ts, '%Y%m%d') AS int)             AS WrPublicationDateId,
    ts                                              AS CountTime,
    '05'                                            AS DocumentCollectionId,
    cast(user_id AS varchar)                        AS CollectionItemId,
    cast(floor(value) AS int)                       AS FbCount,
    cast(event_id % 1000 AS int)                    AS TwCount
  FROM events
),
latest AS (
  SELECT WebResourceHash, max(CountTime) AS last_time
  FROM counts GROUP BY WebResourceHash
)
SELECT c.* FROM counts c
JOIN latest l
  ON l.WebResourceHash = c.WebResourceHash AND c.CountTime = l.last_time
"""

EVENTS_SESSIONIZATION_SQL = f"""
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   + INTERVAL {SESSION_GAP_MIN} MINUTE
         THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
sess AS (
  SELECT *, sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM gaps
)
SELECT user_id, cast(session_seq AS bigint) AS session_seq,
  count(*)             AS n_events,
  min(ts)              AS session_start,
  max(ts)              AS session_end,
  cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS total_value_c
FROM sess
GROUP BY user_id, session_seq
"""

EVENTS_TUMBLING_AGG_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  count(*)                    AS n,
  cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS total_value_c,
  count(DISTINCT user_id)     AS n_users
FROM events
GROUP BY 1, 2
"""

# Spark's window(ts, '1h', '15m') puts each row in exactly 4 windows
# whose starts are time_bucket(15m, ts) - k*15m for k = 0..3 (windows
# are [start, start+1h), aligned to the epoch like Spark's).
EVENTS_SLIDING_AGG_SQL = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS window_start,
         event_type, user_id, value
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
)
SELECT window_start, event_type,
  count(*)                    AS n,
  cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS total_value_c,
  count(DISTINCT user_id)     AS n_users
FROM expanded
GROUP BY 1, 2
"""

# events_cagg_stream: the streamed continuous-aggregate TABLE must equal
# the batch sliding-window aggregate for every finalized window — same
# expansion as EVENTS_SLIDING_AGG_SQL, minus the HLL user sketch (the
# approx column is engine-specific; exact distinct is gated on the batch
# twin events_sliding_agg).
EVENTS_CAGG_STREAM_SQL = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS window_start,
         event_type, value
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
)
SELECT window_start, event_type,
  count(*)                    AS n,
  cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS total_value_c
FROM expanded
GROUP BY 1, 2
"""

EVENTS_INTERVAL_JOIN_SQL = """
SELECT v.user_id                                  AS user_id,
       v.event_id                                 AS view_event_id,
       p.event_id                                 AS purchase_event_id,
       v.ts                                       AS view_ts,
       p.ts                                       AS purchase_ts,
       cast(round(p.value * 100) AS bigint)       AS purchase_value_c
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = v.user_id
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 6 HOUR
"""

EVENTS_CEP_PATTERN_SQL = """
WITH flt AS (
  SELECT user_id, event_id, ts, event_type
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
seq AS (
  SELECT user_id, event_id, ts, event_type,
    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
    lead(event_id, 1)   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS id1,
    lead(event_id, 2)   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS id2,
    lead(ts, 2)         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts2
  FROM flt
)
SELECT user_id,
       event_id AS view_event_id,
       id1      AS click_event_id,
       id2      AS purchase_event_id,
       ts       AS pattern_start,
       ts2      AS pattern_end
FROM seq
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
  AND ts2 <= ts + INTERVAL 24 HOUR
"""

TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  cast(sum(cast(round(l_quantity * 100) AS bigint)) AS bigint) AS sum_qty_c,
  cast(sum(cast(round(l_extendedprice * 100) AS bigint)) AS bigint) AS sum_base_price_c,
  cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS bigint)) AS bigint) AS sum_disc_price_c,
  count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

TPCH_REGION_ROLLUP_SQL = """
SELECT coalesce(r.r_name, '<ALL>') AS region,
       coalesce(n.n_name, '<ALL>') AS nation,
       cast(sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS bigint)) AS bigint) AS revenue_c,
       count(*) AS n_items
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""

TPCH_TOP_CUSTOMERS_SQL = """
WITH rev AS (
  SELECT o.o_custkey,
         cast(sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS bigint)) AS bigint) AS revenue_c,
         count(DISTINCT o.o_orderkey) AS n_orders
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey
  HAVING count(DISTINCT o.o_orderkey) >= 2
)
SELECT c.c_custkey, c.c_name, n.n_name, r.revenue_c, r.n_orders,
  rank() OVER (ORDER BY r.revenue_c DESC, c.c_custkey) AS rev_rank
FROM rev r
JOIN customer c ON c.c_custkey = r.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY rev_rank
LIMIT 100
"""

EVENTS_TOPK_SALTED_SQL = """
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rk
  FROM events
)
SELECT event_type, rk, event_id, CAST(round(value * 100) AS BIGINT) AS value_c
FROM r WHERE rk <= 5
"""

# DuckDB replay of the Derby-backed composition in
# operators/events_ops.wrsocialcount_jdbc: the same pages/social_stats
# derivation from events, the generated import SQL's two-level
# aggregation (IndexerPipelineUtils.java:194-224), then the
# social_counts_from_jdbc mapping (epoch-millis web-resource hash).
WRSOCIALCOUNT_JDBC_SQL = """
WITH ev AS (
  SELECT * FROM events WHERE user_id % 5 = 0
),
pages AS (
  SELECT cast(user_id AS int) AS id,
         'http://social.example/u/' || cast(user_id AS varchar) AS url,
         date_trunc('second', min(ts)) AS pub_at
  FROM ev GROUP BY user_id
),
social_stats AS (
  SELECT cast(user_id AS int) AS page_id,
         date_trunc('second', ts) AS created_at,
         cast(event_id % 2 + 1 AS int) AS provider_id,
         cast(floor(value) AS int) AS cnt
  FROM ev
),
a1 AS (
  SELECT p.pub_at AS page_pub_time, p.url AS url,
         '01' AS doc_col_id, s.page_id AS col_item_id,
         s.created_at AS count_time,
         SUM(CASE WHEN s.provider_id = 1 THEN s.cnt ELSE 0 END) AS count_tw,
         SUM(CASE WHEN s.provider_id = 2 THEN s.cnt ELSE 0 END) AS count_fb
  FROM social_stats s INNER JOIN pages p ON p.id = s.page_id
  WHERE s.cnt > 0
  GROUP BY p.pub_at, p.url, s.page_id, s.created_at
),
agg AS (
  SELECT page_pub_time, url, doc_col_id, col_item_id,
         MAX(count_time) AS count_time, count_tw, count_fb
  FROM a1
  GROUP BY page_pub_time, url, doc_col_id, col_item_id, count_tw, count_fb
)
SELECT
  sha256(coalesce(cast(cast(cast(epoch(page_pub_time) AS double) * 1000 AS bigint) AS varchar), '')
         || chr(31) || coalesce(url, ''))        AS WebResourceHash,
  cast(strftime(page_pub_time, '%Y%m%d') AS int) AS WrPublicationDateId,
  count_time                                     AS CountTime,
  doc_col_id                                     AS DocumentCollectionId,
  cast(col_item_id AS varchar)                   AS CollectionItemId,
  cast(count_fb AS int)                          AS FbCount,
  cast(count_tw AS int)                          AS TwCount
FROM agg
"""

# Same explicit rank rule as the Spark side (value at row_number
# ceil(p*n), ties broken by event_id): the built-in quantile_disc /
# percentile_disc boundary semantics differ between engines, this is
# bit-identical.
EVENTS_PERCENTILES_SQL = """
WITH ranked AS (
  SELECT event_type, cast(date_trunc('day', ts) AS date) AS event_date, value,
         row_number() OVER (
             PARTITION BY event_type, cast(date_trunc('day', ts) AS date)
             ORDER BY value, event_id) AS rn,
         count(*) OVER (
             PARTITION BY event_type, cast(date_trunc('day', ts) AS date)) AS n
  FROM events
)
SELECT event_type, event_date, cast(max(n) AS bigint) AS n_events,
  max(CASE WHEN rn = greatest(cast(ceil(0.50 * n) AS bigint), 1) THEN value END) AS p50,
  max(CASE WHEN rn = greatest(cast(ceil(0.90 * n) AS bigint), 1) THEN value END) AS p90,
  max(CASE WHEN rn = greatest(cast(ceil(0.99 * n) AS bigint), 1) THEN value END) AS p99
FROM ranked
GROUP BY event_type, event_date
"""

# Same union + running last_value(IGNORE NULLS) composition as the Spark
# side (Spark spells ignore-nulls as a second boolean argument, DuckDB as
# the IGNORE NULLS modifier); date_diff mirrors timestampdiff(SECOND).
EVENTS_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
m AS (
  SELECT user_id, ts, event_id, side,
         last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, side, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS click_event_id,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, side, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS click_ts
  FROM tagged
)
SELECT event_id, user_id, ts, click_event_id, click_ts,
       CASE WHEN click_ts IS NOT NULL
            THEN date_diff('microsecond', click_ts, ts) END AS gap_us
FROM m
WHERE side = 1
"""

EVENTS_ROLLING_1H_SQL = """
SELECT event_id, user_id, ts,
       cast(count(*) OVER w AS bigint) AS n_1h,
       min(value) OVER w AS min_value_1h,
       max(value) OVER w AS max_value_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""

EVENTS_ORACLES: dict[str, str] = {
    "statngram": STATNGRAM_SQL,
    "wrsocialcount": WRSOCIALCOUNT_SQL,
    "wrsocialcount_jdbc": WRSOCIALCOUNT_JDBC_SQL,
    "events_sessionization": EVENTS_SESSIONIZATION_SQL,
    "events_tumbling_agg": EVENTS_TUMBLING_AGG_SQL,
    "events_sliding_agg": EVENTS_SLIDING_AGG_SQL,
    "events_cagg_stream": EVENTS_CAGG_STREAM_SQL,
    "events_interval_join": EVENTS_INTERVAL_JOIN_SQL,
    "events_cep_pattern": EVENTS_CEP_PATTERN_SQL,
    "tpch_q1_like": TPCH_Q1_SQL,
    "tpch_region_rollup": TPCH_REGION_ROLLUP_SQL,
    "tpch_top_customers": TPCH_TOP_CUSTOMERS_SQL,
    "events_topk_salted": EVENTS_TOPK_SALTED_SQL,
    "events_percentiles": EVENTS_PERCENTILES_SQL,
    "events_asof_join": EVENTS_ASOF_SQL,
    "events_rolling_1h": EVENTS_ROLLING_1H_SQL,
}
