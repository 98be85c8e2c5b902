"""The stats layer — Spark-SQL re-expressions of the reference's
generated BigQuery queries (StatsCalcPipelineUtils.java), run over our
fact tables instead of BigQuery.

Dialect ports (SURVEY.md §2.10 notes):
  ARRAY_AGG(DISTINCT x)        -> sort_array(collect_set(x)) (order pinned)
  STRING_AGG / ARRAY_TO_STRING -> array_join
  IF(c,a,b)                    -> CASE WHEN
  GREATEST(x, 0.01) floors     -> greatest(x, 0.01)
  FORMAT_TIMESTAMP('%Y_%U')    -> date_format(ts,'YYYY_ww') deviation noted
  UNNEST correlated lateral    -> LATERAL VIEW explode / inline explode()

Each builder returns one SQL string over views named `document`,
`sentiment`, `webresource`, `topic` — register the fact DataFrames first
(see register_views). The same logical queries are mirrored in DuckDB
dialect by ``dataflow_opinion_analysis_spark.oracles`` for the
correctness gate.

Reference query shapes ported:
  stattopic            <- StatsCalcPipelineUtils.java:59-138
  statstoryimpact      <- :160-217
  statstoryrank        <- :426-483
  statdomainopinions   <- :236-409
  stattoptopic7d       <- :500-546
  stattopstory7d       <- :564-593
  stattoptopic7dsentiment <- :611-640
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_views(
    spark: SparkSession,
    document: DataFrame,
    sentiment: DataFrame,
    webresource: DataFrame,
    topic: DataFrame | None = None,
) -> None:
    document.createOrReplaceTempView("document")
    sentiment.createOrReplaceTempView("sentiment")
    webresource.createOrReplaceTempView("webresource")
    if topic is None:
        from dataflow_opinion_analysis_spark.functions import lexicon

        topic = spark.createDataFrame(
            [(t, 1) for t in lexicon.TOPIC_BLOCKLIST], "Topic string, IsBlocked int"
        )
    topic.createOrReplaceTempView("topic")


# ---------------------------------------------------------------------------
# stattopic: per (day, topic) opinion counts (StatsCalcPipelineUtils.java:59-138)
# G4 conditional COUNT(DISTINCT), G5 ARRAY_AGG(DISTINCT), J8 blocklist anti-join
# ---------------------------------------------------------------------------
STATTOPIC_SQL = """
WITH doc_tags AS (
  SELECT d.DocumentHash, t.Tag, t.GoodAsTopic
  FROM document d LATERAL VIEW explode(d.Tags) tt AS t
)
SELECT
  d.PublicationDateId                                        AS SnapshotDateId,
  g.Tag                                                      AS Topic,
  count(DISTINCT d.DocumentHash)                             AS cntDocs,
  count(DISTINCT s.SentimentHash)                            AS cntSentiments,
  count(DISTINCT CASE WHEN s.DominantValence = 1 THEN s.SentimentHash END) AS cntPositives,
  count(DISTINCT CASE WHEN s.DominantValence = 2 THEN s.SentimentHash END) AS cntNegatives,
  count(DISTINCT CASE WHEN s.DominantValence = 3 THEN s.SentimentHash END) AS cntAmbiguous,
  count(DISTINCT CASE WHEN s.DominantValence = 5 THEN s.SentimentHash END) AS cntGeneral,
  array_join(sort_array(collect_set(d.DocumentHash)), ',')   AS documentHashes
FROM document d
JOIN doc_tags g ON g.DocumentHash = d.DocumentHash
JOIN sentiment s ON s.DocumentHash = d.DocumentHash
WHERE g.GoodAsTopic = true
  AND g.Tag NOT IN (SELECT Topic FROM topic WHERE IsBlocked = 1)
GROUP BY d.PublicationDateId, g.Tag
"""

# ---------------------------------------------------------------------------
# statstoryimpact: per document, repost/domain counts (:160-217)
# J6 left outer join, G9 max-time semantics
# ---------------------------------------------------------------------------
STATSTORYIMPACT_SQL = """
SELECT
  d.DocumentHash,
  d.PublicationDateId,
  substring(d.Text, 1, 1000)                                  AS TextHead,
  count(DISTINCT w.WebResourceHash)                           AS cntWRs,
  count(DISTINCT w.Domain)                                    AS cntDomains,
  count(DISTINCT CASE WHEN w.ParentWebResourceHash IS NOT NULL
                      THEN w.WebResourceHash END)             AS cntReplies
FROM document d
LEFT JOIN webresource w ON w.DocumentHash = d.DocumentHash
GROUP BY d.DocumentHash, d.PublicationDateId, substring(d.Text, 1, 1000)
"""

# ---------------------------------------------------------------------------
# statstoryrank: weekly/monthly impact ranks (:426-483) — W3 rank windows,
# FORMAT_TIMESTAMP week/month buckets, T1 LIMIT cap
# ---------------------------------------------------------------------------
STATSTORYRANK_SQL = """
WITH impact AS (
  SELECT d.DocumentHash,
         date_format(d.PublicationTime, 'yyyy_MM')  AS PubMonth,
         cast(weekofyear(d.PublicationTime) AS int) AS PubWeek,
         count(DISTINCT w.WebResourceHash)          AS cntWRs,
         count(DISTINCT w.Domain)                   AS cntDomains
  FROM document d
  LEFT JOIN webresource w ON w.DocumentHash = d.DocumentHash
  GROUP BY 1, 2, 3
)
SELECT DocumentHash, PubMonth, PubWeek, cntWRs, cntDomains,
  rank() OVER (PARTITION BY PubWeek  ORDER BY cntWRs DESC, cntDomains DESC, DocumentHash) AS WeekRank,
  rank() OVER (PARTITION BY PubMonth ORDER BY cntWRs DESC, cntDomains DESC, DocumentHash) AS MonthRank
FROM impact
ORDER BY cntWRs DESC, DocumentHash
LIMIT 100000
"""

# ---------------------------------------------------------------------------
# statdomainopinions: per-domain aggregates (:236-409) — G6 HAVING,
# G7 SUM(CASE)+GREATEST floors, G8 AVG/STDDEV_POP/ROUND, W1 global rank
# ---------------------------------------------------------------------------
STATDOMAINOPINIONS_SQL = """
WITH domstats AS (
  SELECT w.Domain,
    count(DISTINCT w.DocumentHash)                         AS cntDocs,
    count(s.SentimentHash)                                 AS cntOpinions,
    sum(CASE WHEN s.DominantValence = 1 THEN 1 ELSE 0 END) AS cntPositives,
    sum(CASE WHEN s.DominantValence = 2 THEN 1 ELSE 0 END) AS cntNegatives,
    round(avg(s.SentimentTotalScore), 2)                   AS avgScore,
    round(coalesce(stddev_pop(s.SentimentTotalScore), 0.0), 2) AS stddevScore,
    min(s.SentimentTotalScore)                             AS minScore,
    max(s.SentimentTotalScore)                             AS maxScore
  FROM webresource w
  JOIN sentiment s ON s.MainWebResourceHash = w.WebResourceHash
  GROUP BY w.Domain
  HAVING count(DISTINCT w.DocumentHash) >= 2
)
SELECT *,
  round(cntPositives / greatest(cast(cntNegatives AS double), 0.01), 2) AS posNegRatio,
  rank() OVER (ORDER BY cntOpinions DESC, Domain)                       AS DomainRank
FROM domstats
"""

# ---------------------------------------------------------------------------
# stattoptopic7d: topics in a trailing 8-day window per snapshot day
# (:500-546) — J7 range join on date ids, T2 top-20, W4 tie-broken rank
# ---------------------------------------------------------------------------
STATTOPTOPIC7D_SQL = """
WITH days AS (SELECT DISTINCT PublicationDateId AS SnapshotDateId FROM document),
doc_tags AS (
  SELECT d.DocumentHash, t.Tag, t.GoodAsTopic
  FROM document d LATERAL VIEW explode(d.Tags) tt AS t
),
topics AS (
  SELECT d.PublicationDateId, g.Tag AS Topic, d.DocumentHash, w.Domain
  FROM document d
  JOIN doc_tags g ON g.DocumentHash = d.DocumentHash
  LEFT JOIN webresource w ON w.DocumentHash = d.DocumentHash
  WHERE g.GoodAsTopic = true
    AND g.Tag NOT IN (SELECT Topic FROM topic WHERE IsBlocked = 1)
),
windowed AS (
  SELECT p.SnapshotDateId, tp.Topic,
         count(DISTINCT tp.DocumentHash) AS cntDocs7d,
         count(DISTINCT tp.Domain)       AS cntDomains7d
  FROM days p
  JOIN topics tp
    ON tp.PublicationDateId <= p.SnapshotDateId
   AND tp.PublicationDateId >= cast(date_format(date_sub(to_date(cast(p.SnapshotDateId AS string), 'yyyyMMdd'), 7), 'yyyyMMdd') AS int)
  GROUP BY p.SnapshotDateId, tp.Topic
)
SELECT SnapshotDateId, Topic, cntDocs7d, cntDomains7d,
  rank() OVER (PARTITION BY SnapshotDateId
               ORDER BY cntDocs7d DESC, cntDomains7d DESC, length(Topic) DESC, Topic) AS TopicRank
FROM windowed
"""

# ---------------------------------------------------------------------------
# stattopstory7d (:564-593) — W5 rank, T3 rank-filter top-k
# ---------------------------------------------------------------------------
STATTOPSTORY7D_SQL = """
WITH days AS (SELECT DISTINCT PublicationDateId AS SnapshotDateId FROM document),
stories AS (
  SELECT p.SnapshotDateId, d.DocumentHash,
         count(DISTINCT w.WebResourceHash) AS cntWRs,
         count(DISTINCT w.Domain)          AS cntDomains
  FROM days p
  JOIN document d
    ON d.PublicationDateId <= p.SnapshotDateId
   AND d.PublicationDateId >= cast(date_format(date_sub(to_date(cast(p.SnapshotDateId AS string), 'yyyyMMdd'), 7), 'yyyyMMdd') AS int)
  LEFT JOIN webresource w ON w.DocumentHash = d.DocumentHash
  GROUP BY p.SnapshotDateId, d.DocumentHash
),
ranked AS (
  SELECT *, rank() OVER (PARTITION BY SnapshotDateId
                         ORDER BY cntWRs DESC, cntDomains DESC, DocumentHash) AS StoryRank
  FROM stories
)
SELECT * FROM ranked WHERE StoryRank <= 20
"""

# ---------------------------------------------------------------------------
# stattoptopic7dsentiment (:611-640) — U4 union of single + combi topics
# ---------------------------------------------------------------------------
STATTOPTOPIC7DSENTIMENT_SQL = """
WITH good_tags AS (
  SELECT d.DocumentHash, t.Tag
  FROM document d LATERAL VIEW explode(d.Tags) tt AS t
  WHERE t.GoodAsTopic = true
),
singles AS (
  SELECT d.PublicationDateId AS SnapshotDateId, t.Tag AS Topic,
         s.DominantValence,
         count(DISTINCT s.SentimentHash) AS cntSentiments
  FROM document d
  JOIN good_tags t ON t.DocumentHash = d.DocumentHash
  JOIN sentiment s ON s.DocumentHash = d.DocumentHash
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT d.PublicationDateId AS SnapshotDateId,
         concat(t1.Tag, '&', t2.Tag) AS Topic,
         s.DominantValence,
         count(DISTINCT s.SentimentHash) AS cntSentiments
  FROM document d
  JOIN good_tags t1 ON t1.DocumentHash = d.DocumentHash
  JOIN good_tags t2 ON t2.DocumentHash = d.DocumentHash
  JOIN sentiment s ON s.DocumentHash = d.DocumentHash
  WHERE t1.Tag < t2.Tag
  GROUP BY 1, 2, 3
)
SELECT * FROM singles
UNION ALL
SELECT * FROM pairs
"""

STATS_QUERIES: dict[str, str] = {
    "stattopic": STATTOPIC_SQL,
    "statstoryimpact": STATSTORYIMPACT_SQL,
    "statstoryrank": STATSTORYRANK_SQL,
    "statdomainopinions": STATDOMAINOPINIONS_SQL,
    "stattoptopic7d": STATTOPTOPIC7D_SQL,
    "stattopstory7d": STATTOPSTORY7D_SQL,
    "stattoptopic7dsentiment": STATTOPTOPIC7DSENTIMENT_SQL,
}

# dependency order mirrors StatsCalcPipeline.java:73-83's comment tree
STATS_ORDER = [
    "stattopic",
    "statstoryimpact",
    "statdomainopinions",
    "statstoryrank",
    "stattoptopic7d",
    "stattopstory7d",
    "stattoptopic7dsentiment",
]


def run_stats(spark: SparkSession) -> dict[str, DataFrame]:
    """Execute all stat queries in dependency order (views must be
    registered). Catalyst plans each; AQE handles the skewed topic keys."""
    return {name: spark.sql(STATS_QUERIES[name]) for name in STATS_ORDER}
