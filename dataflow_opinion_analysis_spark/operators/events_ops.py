"""Operators over the SF-scaling tables (events, lineitem, orders) plus
the reference's two satellite pipelines re-expressed:

- statngram  <- DictionaryBuilderPipeline (BuildNgramStats N3 + custom
  CombineFn G3, DictionaryBuilderPipeline.java:177-274): per-ngram
  (sum of occurrences, count of docs) for n = 1..5. Pure Catalyst: token
  HOFs build the n-grams, the hash aggregate gets map-side partial
  combine exactly where Beam used an accumulator CombineFn.
- wrsocialcount <- SocialStatsPipeline (J4 side-input max-time join,
  SocialStatsPipeline.java:112-139): keep only counts newer than the
  last stored count per web resource.

The events queries demonstrate the batch analogs of the streaming
operators over a table that actually scales with SF (events = 100k rows
at sf0.1): sessionization (lag + conditional cumsum), tumbling-window
aggregation, and a TPC-H-style join/agg for the SQL layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataflow_opinion_analysis_spark.operators.dataprep import SPARK_TOKENS, spark_shingles

NGRAM_MAX_N = 5  # reference NgramMaxN=5, DictionaryBuilderPipeline.java:448
SESSION_GAP_MIN = 30


def _view(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df.createOrReplaceTempView(name)
    return df


def statngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram corpus statistics, n=1..{NGRAM_MAX_N}.

    The one-file corpus scan is spread to shuffle width before the
    CPU-bound tokenize/explode (otherwise the whole gram explosion runs
    on the scan's two input partitions)."""
    _view(spark, sf_dir, "documents")
    width = spark.sparkContext.defaultParallelism * 2
    ngram_arrays = ", ".join(
        spark_shingles(n) for n in range(1, NGRAM_MAX_N + 1)
    )
    return spark.sql(
        f"""
WITH toks AS (SELECT /*+ REPARTITION({width}) */ doc_id, {SPARK_TOKENS} AS toks
              FROM documents),
grams AS (
  SELECT doc_id, explode(flatten(array({ngram_arrays}))) AS ngram
  FROM toks
),
-- explicit two-level aggregate: count(*) + count(DISTINCT doc_id) in one
-- GROUP BY planned an Expand that replicated every gram row 2x before
-- the shuffle; the per-(ngram, doc_id) partial combines map-side and
-- sum(c)/count(*) over it are the identical bigints
per_doc AS (
  SELECT ngram, doc_id, count(*) AS c
  FROM grams WHERE ngram <> ''
  GROUP BY ngram, doc_id
)
SELECT ngram,
  sum(c)   AS CntOccurrences,
  count(*) AS CntDocs
FROM per_doc
GROUP BY ngram
"""
    )


def wrsocialcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic social counts from events (deterministic arithmetic),
    filtered to 'newer than last stored' — the reference's side-input
    max-time join (J4). Output one latest row per web resource."""
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
WITH counts AS (
  SELECT
    sha2(concat('wr-', cast(user_id AS string)), 256) AS WebResourceHash,
    cast(date_format(ts, 'yyyyMMdd') AS int)          AS WrPublicationDateId,
    ts                                                AS CountTime,
    '05'                                              AS DocumentCollectionId,
    cast(user_id AS string)                           AS CollectionItemId,
    cast(floor(value) AS int)                         AS FbCount,
    cast(event_id % 1000 AS int)                      AS TwCount
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
    )


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag + conditional cumsum per user — the
    batch analog of session_window (R3). 30-minute gap.

    Skew note: the per-user running window serializes each user through
    one task — inherent to exact batch sessionization (the running sum
    is order-dependent), and bounded by a single user's activity, not
    table size. If one user ever dominates, the same two-phase trick the
    repo uses elsewhere applies: split each user's stream at coarse time
    boundaries (day buckets), sessionize within buckets in parallel, and
    stitch only the boundary-crossing sessions (merge last/first session
    per adjacent bucket pair) — cf. hints.salted_top_k and
    llmprep.pack_sql_spark's bucketed prefix sum."""
    _view(spark, sf_dir, "events")
    return spark.sql(
        f"""
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   + INTERVAL {SESSION_GAP_MIN} MINUTE
         THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
sess AS (
  SELECT *, sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
  FROM gaps
)
SELECT user_id, session_seq,
  count(*)                         AS n_events,
  min(ts)                          AS session_start,
  max(ts)                          AS session_end,
  sum(cast(round(value * 100) AS bigint))  AS total_value_c
FROM sess
GROUP BY user_id, session_seq
"""
    )


def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type (the batch twin
    of the streaming windowed aggregation)."""
    from pyspark.sql import functions as F

    ev = _view(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_value_c"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value_c",
            "n_users",
        )
    )


def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99 of value) per
    (event_type, event day).

    The percentile rule is written out as an explicit rank — value at
    row_number ceil(p*n) under (value asc, event_id asc) — instead of
    calling percentile_disc/quantile_disc, because the two engines'
    built-ins disagree on boundary semantics while this rule is
    bit-identical everywhere: the only float arithmetic is p*n (same
    literal, same product) and the emitted percentile is an actual
    data value, never an interpolation.

    Scale: the sort is a window PARTITIONED by (event_type, day) —
    parallelism is the group count and grows with the data's time
    span. Exact percentiles fundamentally need the per-group sort; at
    100 TB with huge single-day groups the scale path is
    approx_percentile (t-digest-style sketch, map-side combined) with
    this exact form kept as the small-partition oracle.
    """
    from pyspark.sql import functions as F  # noqa: F401  (registers view)

    _view(spark, sf_dir, "events")
    return spark.sql(
        """
WITH ranked AS (
  SELECT event_type, cast(date_trunc('day', ts) AS date) AS event_date, value,
         row_number() OVER (
             PARTITION BY event_type, cast(date_trunc('day', ts) AS date)
             ORDER BY value, event_id) AS rn,
         count(*) OVER (
             PARTITION BY event_type, cast(date_trunc('day', ts) AS date)) AS n
  FROM events
)
SELECT event_type, event_date, max(n) AS n_events,
  max(CASE WHEN rn = greatest(cast(ceil(0.50 * n) AS bigint), 1) THEN value END) AS p50,
  max(CASE WHEN rn = greatest(cast(ceil(0.90 * n) AS bigint), 1) THEN value END) AS p90,
  max(CASE WHEN rn = greatest(cast(ceil(0.99 * n) AS bigint), 1) THEN value END) AS p99
FROM ranked
GROUP BY event_type, event_date
"""
    )


def events_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch twin of events_percentiles — percentile_approx
    (Greenwald-Khanna, accuracy 10000) per (event_type, day). This IS
    the 100-TB path the exact operator's docstring points to: a
    map-side-combinable sketch instead of a per-group sort, so a huge
    single-day group never serializes. No DuckDB oracle on purpose —
    sketch outputs are engine-specific (the driver records the weaker
    rows-only check); the exact gate next to it pins the semantics, and
    the pytest bounds this sketch against the exact values."""
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
SELECT event_type, cast(date_trunc('day', ts) AS date) AS event_date,
       count(*) AS n_events,
       percentile_approx(value, array(0.50, 0.90, 0.99), 10000) AS p_approx
FROM events
GROUP BY event_type, cast(date_trunc('day', ts) AS date)
"""
    )


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the same user's most recent
    click at ts' <= ts (ties: click sorts before the purchase; among
    equal-ts clicks the largest event_id wins — a deterministic total
    order, since event_id is unique).

    Spark has no native as-of join; the naive encoding is an interval
    join + per-row argmax (quadratic in per-user density). This is the
    scalable composition: UNION the two sides with a side marker and
    take a running last_value(... IGNORE NULLS) per user — ONE shuffle
    by user_id, per-user linear work, no self-join at all.

    The gap is emitted in MICROSECONDS (the data's native resolution):
    at that granularity boundary-counting (DuckDB date_diff) and
    truncating difference (Spark timestampdiff) coincide exactly, where
    a seconds-level diff would diverge on fractional timestamps.
    """
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
m AS (
  SELECT user_id, ts, event_id, side,
         last_value(CASE WHEN side = 0 THEN event_id END, true) OVER (
             PARTITION BY user_id ORDER BY ts, side, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS click_event_id,
         last_value(CASE WHEN side = 0 THEN ts END, true) OVER (
             PARTITION BY user_id ORDER BY ts, side, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS click_ts
  FROM tagged
)
SELECT event_id, user_id, ts, click_event_id, click_ts,
       CASE WHEN click_ts IS NOT NULL
            THEN timestampdiff(MICROSECOND, click_ts, ts) END AS gap_us
FROM m
WHERE side = 1
"""
    )


def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour features per user (rate-limit / feature
    engineering shape): count, min(value), max(value) over
    [ts - 1h, ts] at second granularity (the RANGE key is the
    floor-second epoch, identical in both engines), so equal-key
    peers are always all included — deterministic under ties — and the
    aggregates are order-independent (count/min/max; a rolling SUM of
    doubles would accumulate in engine-specific order and is left out
    on purpose). One shuffle by user_id; per-user sliding frame."""
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_1h,
       min(value) OVER w AS min_value_1h,
       max(value) OVER w AS max_value_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""
    )


def tpch_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue ROLLUP over (region, nation): detail rows plus per-region
    and grand-total subtotal rows — the OLAP grouping-sets surface over
    the star join. Subtotal keys are made explicit with coalesce
    sentinels (the engines' grouping()/grouping_id() functions differ);
    revenue is integer cents so every subtotal is an exact integer sum.
    The two dimension joins are broadcastable by construction (region=5,
    nation=25 rows at every SF)."""
    for t in ("region", "nation", "customer", "orders", "lineitem"):
        _view(spark, sf_dir, t)
    return spark.sql(
        """
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
    )


def tpch_q1_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over lineitem: the SQL-layer aggregate benchmark
    (G7/G8 operator family) on the table that scales with SF."""
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
SELECT l_returnflag, l_linestatus,
  sum(cast(round(l_quantity * 100) AS bigint))                 AS sum_qty_c,
  sum(cast(round(l_extendedprice * 100) AS bigint))            AS sum_base_price_c,
  sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS bigint)) AS sum_disc_price_c,
  count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""
    )


def tpch_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/HAVING/top-k shape: revenue per customer via orders x lineitem
    x customer (broadcast dims, shuffled fact join).

    Scale shape: the top-100 is taken FIRST with ORDER BY/LIMIT — Spark
    compiles that to TakeOrderedAndProject, a distributed per-partition
    top-k + driver merge — and rank() runs over the 100 surviving rows
    only. Ranking before limiting (rank() OVER a partitionless window,
    then LIMIT) would funnel the entire per-customer aggregate — the
    customer dimension scales with SF — through ONE WindowExec
    partition, because Catalyst cannot push a limit below a window.
    Exact because the ordering key (revenue_c DESC, c_custkey) is total
    (c_custkey unique): rank == row position, so the first 100 by the
    sort are precisely the rows with rank <= 100 and the re-rank over
    them reproduces the global rank values."""
    for t in ("lineitem", "orders", "customer", "nation"):
        _view(spark, sf_dir, t)
    return spark.sql(
        """
WITH per_order AS (
  -- per-row exact integer cents, then an order-free integer sum: float
  -- summation order differs between engines/partitions, integers don't.
  -- Aggregating per order BEFORE the orders join (guide-style map-side
  -- reduction) shrinks the join's lineitem side to one row per order
  -- AND removes the Expand the mixed sum + count(DISTINCT o_orderkey)
  -- aggregate planned (2x the 6M-row join output through the shuffle)
  SELECT l_orderkey,
         sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS bigint)) AS order_rev
  FROM lineitem
  GROUP BY l_orderkey
),
rev AS (
  -- n_orders == count(DISTINCT o_orderkey) of the old row-level join:
  -- per_order carries exactly one row per order with >= 1 lineitem
  SELECT o.o_custkey,
         sum(p.order_rev) AS revenue_c,
         count(*) AS n_orders
  FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
  GROUP BY o.o_custkey
  HAVING count(*) >= 2
),
top100 AS (
  -- TakeOrderedAndProject: distributed partial top-k, no global window
  SELECT c.c_custkey, c.c_name, n.n_name, r.revenue_c, r.n_orders
  FROM rev r
  JOIN customer c ON c.c_custkey = r.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  ORDER BY r.revenue_c DESC, c.c_custkey
  LIMIT 100
)
SELECT c_custkey, c_name, n_name, revenue_c, n_orders,
  rank() OVER (ORDER BY revenue_c DESC, c_custkey) AS rev_rank
FROM top100
ORDER BY rev_rank
"""
    )


def social_counts_from_jdbc(raw: DataFrame, existing: DataFrame | None = None) -> DataFrame:
    """SocialStatsPipeline.java:54-157 composed for Spark: rows from the
    generated JDBC social-stats query (sources/files.py
    build_jdbc_social_stats_query: page_pub_time, url, doc_col_id,
    col_item_id, count_time, count_tw, count_fb) -> wrsocialcount rows.

    WebResourceHash derives from (pub_time, url) with the SAME function
    the indexer's webresource rows use (hashes.web_resource_hash), so the
    counts join the fact tables without any URL re-lookup.

    ``existing``: the already-stored wrsocialcount relation — rows whose
    CountTime is not strictly newer than the last stored count for their
    web resource are dropped (the reference's side-input max-time join,
    SocialStatsPipeline.java:112-139/J4, rebuilt as a max-aggregate +
    equi-join: the aggregate side is one row per web resource, so it
    broadcasts at any history length)."""
    from pyspark.sql import functions as F

    from dataflow_opinion_analysis_spark import hashes

    pub = F.col("page_pub_time").cast("timestamp")
    out = raw.select(
        hashes.web_resource_hash(pub, F.col("url")).alias("WebResourceHash"),
        hashes.date_id(pub).alias("WrPublicationDateId"),
        F.col("count_time").cast("timestamp").alias("CountTime"),
        F.col("doc_col_id").cast("string").alias("DocumentCollectionId"),
        F.col("col_item_id").cast("string").alias("CollectionItemId"),
        F.col("count_fb").cast("int").alias("FbCount"),
        F.col("count_tw").cast("int").alias("TwCount"),
    )
    if existing is not None:
        last = existing.groupBy("WebResourceHash").agg(
            F.max("CountTime").alias("_last_count_time")
        )
        out = (
            out.join(last, "WebResourceHash", "left")
            .filter(
                F.col("_last_count_time").isNull()
                | (F.col("CountTime") > F.col("_last_count_time"))
            )
            .drop("_last_count_time")
        )
    return out


def wrsocialcount_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full S2+J4 composition as a driver-visible gate (previously
    pytest-only via `cli socialstats`): events rows are loaded into a REAL
    embedded-Derby JDBC database as the reference's `pages`/`social_stats`
    tables, read back through the generated social-stats import SQL
    (sources/files.build_jdbc_social_stats_query,
    IndexerPipelineUtils.java:194-224), and mapped to wrsocialcount rows
    (social_counts_from_jdbc). The DuckDB oracle replays the identical
    derivation + aggregation from the events parquet directly.

    A deterministic user subset (user_id % 5 = 0) bounds the Derby write
    at any sf; timestamps are truncated to whole seconds on BOTH sides so
    the JDBC roundtrip is precision-lossless."""
    import tempfile

    from pyspark.sql import functions as F

    from dataflow_opinion_analysis_spark.sources.files import (
        build_jdbc_social_stats_query,
        read_jdbc,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where("user_id % 5 = 0")
    dbdir = tempfile.mkdtemp(prefix="wrsocial_derby_")
    url = f"jdbc:derby:{dbdir}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    pages = ev.groupBy("user_id").agg(
        F.date_trunc("second", F.min("ts")).alias("PUB_AT")
    ).select(
        F.col("user_id").cast("int").alias("ID"),
        F.concat(F.lit("http://social.example/u/"), F.col("user_id")).alias("URL"),
        "PUB_AT",
    )
    social = ev.select(
        F.col("user_id").cast("int").alias("PAGE_ID"),
        F.date_trunc("second", F.col("ts")).alias("CREATED_AT"),
        (F.col("event_id") % 2 + 1).cast("int").alias("PROVIDER_ID"),
        F.floor("value").cast("int").alias("CNT"),
    )
    # VARCHAR, not the default CLOB: the generated query GROUPs BY p.url
    # and Derby cannot group a CLOB
    pages.write.format("jdbc").option("url", url).option("driver", driver) \
        .option("createTableColumnTypes", "URL VARCHAR(300)") \
        .option("dbtable", "PAGES").mode("overwrite").save()
    social.write.format("jdbc").option("url", url).option("driver", driver) \
        .option("dbtable", "SOCIAL_STATS").mode("overwrite").save()

    # Index the join keys and refresh Derby's optimizer statistics before
    # the generated read query runs: freshly bulk-loaded tables have no
    # indexes and no cardinality stats, so Derby falls back to a
    # nested-loop join with repeated PAGES scans for p.id = s.page_id —
    # measured 187s for the 168k-row social_stats at sf1.0 vs 2.2s with
    # the indexes + SYSCS_UPDATE_STATISTICS in place. Pure physical-access
    # tuning on the warehouse side; the query text and its result are
    # byte-identical.
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute("CREATE INDEX PAGES_ID_IDX ON PAGES(ID)")
        st.execute("CREATE INDEX SS_PAGE_IDX ON SOCIAL_STATS(PAGE_ID)")
        for tbl in ("PAGES", "SOCIAL_STATS"):
            cs = conn.prepareCall(
                f"CALL SYSCS_UTIL.SYSCS_UPDATE_STATISTICS('APP', '{tbl}', NULL)"
            )
            cs.execute()
    finally:
        conn.close()

    raw = read_jdbc(spark, url, build_jdbc_social_stats_query(), driver=driver)
    return social_counts_from_jdbc(raw, existing=None)


def events_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 events per event_type by value, computed with the
    two-phase salted rank (operators/hints.salted_top_k) so the hot key
    never funnels through one serial window partition — the north rule's
    salted repartitioning made concrete (the DuckDB oracle computes the
    same top-k with a plain rank window; results are provably identical,
    only the Spark plan shape differs)."""
    from pyspark.sql import functions as F

    from dataflow_opinion_analysis_spark.operators import hints

    ev = _view(spark, sf_dir, "events")
    out = hints.salted_top_k(
        ev,
        ["event_type"],
        [F.col("value").desc(), F.col("event_id").asc()],
        k=5,
        salt_src="event_id",
    )
    return out.select(
        "event_type",
        "rk",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )


SLIDE_WINDOW = "1 hour"
SLIDE_STEP_MIN = 15
ATTRIBUTION_WINDOW_HOURS = 6
CEP_WINDOW_HOURS = 24
CEP_PATTERN = ("view", "click", "purchase")


def events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 hour long, sliding every 15
    minutes) per event type — the north rule's sliding-window shape,
    batch twin of the streaming `F.window(ts, '1 hour', '15 minutes')`
    aggregation. Each event lands in exactly 4 overlapping windows;
    Spark's window() expands them JVM-side before the hash aggregate, so
    the plan is explode + partial agg + one shuffle (no per-row
    Python)."""
    from pyspark.sql import functions as F

    ev = _view(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", SLIDE_WINDOW, f"{SLIDE_STEP_MIN} minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_value_c"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value_c",
            "n_users",
        )
    )


def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join: attribute each 'purchase' to every
    'view' by the same user that happened in the preceding 6 hours
    (view.ts < purchase.ts <= view.ts + 6h) — the north rule's
    stateful join, in its batch form. The plan is an equi-join on
    user_id with the range predicate as a post-join filter: Catalyst
    keeps it a shuffled hash join on the key (never a cartesian), and
    the same condition drives the streaming stream-stream join in
    streaming/windows.py, where the 6-hour bound plus watermarks is
    what lets Spark expire join state."""
    _view(spark, sf_dir, "events")
    return spark.sql(
        f"""
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
 AND p.ts <= v.ts + INTERVAL {ATTRIBUTION_WINDOW_HOURS} HOUR
"""
    )


def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP sequence detection (MATCH_RECOGNIZE shape): per user, find
    every strictly consecutive view -> click -> purchase run in the
    user's (view|click|purchase)-filtered event stream, with the whole
    run inside {CEP_WINDOW_HOURS} hours. Rebuilt as two lead()
    windows over the filtered ordered stream — one shuffle on user_id,
    no self-joins, no per-row Python; the window partition is one
    user's events, so the serial span is bounded by a single user's
    activity exactly like events_sessionization."""
    _view(spark, sf_dir, "events")
    pat = ", ".join(f"'{t}'" for t in CEP_PATTERN)
    return spark.sql(
        f"""
WITH flt AS (
  SELECT user_id, event_id, ts, event_type
  FROM events WHERE event_type IN ({pat})
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
WHERE event_type = '{CEP_PATTERN[0]}' AND t1 = '{CEP_PATTERN[1]}' AND t2 = '{CEP_PATTERN[2]}'
  AND ts2 <= ts + INTERVAL {CEP_WINDOW_HOURS} HOUR
"""
    )
