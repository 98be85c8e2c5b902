"""DuckDB oracles for the stats layer (plans/stats.py), stacked on the
full indexer prefix from oracles.py — the correctness gate thereby checks
transcripts -> indexer -> stats end to end.

Fact CTEs mirror the Spark temp views; tags are exploded rows on both
sides (Spark: LATERAL VIEW explode(Tags); here: the doc_tags CTE)."""

from __future__ import annotations

from dataflow_opinion_analysis_spark import oracles
from dataflow_opinion_analysis_spark.functions import lexicon

SEP = oracles.SEP


def facts_prefix() -> str:
    return (
        oracles.indexer_prefix()
        + f""",
fct_document AS (
  SELECT expected_document_hash AS DocumentHash,
         pub_time AS PublicationTime, pub_date_id AS PublicationDateId,
         text AS Text
  FROM soft_winners
),
fct_sentiment AS (
  SELECT
    sha256(p.document_hash || {SEP} || cast(p.passage_idx AS varchar)
           || {SEP} || p.passage_text)  AS SentimentHash,
    p.document_hash                     AS DocumentHash,
    p.DominantValence, p.SentimentTotalScore,
    p.web_resource_hash                 AS MainWebResourceHash
  FROM passages p
  JOIN soft_winners w ON w.expected_document_hash = p.document_hash
),
fct_webresource AS (
  SELECT web_resource_hash AS WebResourceHash, expected_document_hash AS DocumentHash,
         conv_id AS Domain, parent_web_resource_hash AS ParentWebResourceHash
  FROM soft_winners
  UNION ALL
  SELECT web_resource_hash, winner_document_hash, conv_id, parent_web_resource_hash
  FROM exact_dupes
  UNION ALL
  SELECT web_resource_hash, expected_document_hash, conv_id, parent_web_resource_hash
  FROM skipped
  UNION ALL
  SELECT web_resource_hash, soft_winner_hash, conv_id, parent_web_resource_hash
  FROM soft_dupes
),
good_tags AS (
  SELECT dt.document_hash, dt.tag
  FROM doc_tags dt
  WHERE dt.good_as_topic
    AND dt.tag NOT IN (SELECT word FROM blocklist)
)
"""
    )


def stattopic_sql() -> str:
    return (
        facts_prefix()
        + """
SELECT
  d.PublicationDateId AS SnapshotDateId,
  g.tag               AS Topic,
  count(DISTINCT d.DocumentHash)  AS cntDocs,
  count(DISTINCT s.SentimentHash) AS cntSentiments,
  count(DISTINCT CASE WHEN s.DominantValence = 1 THEN s.SentimentHash END) AS cntPositives,
  count(DISTINCT CASE WHEN s.DominantValence = 2 THEN s.SentimentHash END) AS cntNegatives,
  count(DISTINCT CASE WHEN s.DominantValence = 3 THEN s.SentimentHash END) AS cntAmbiguous,
  count(DISTINCT CASE WHEN s.DominantValence = 5 THEN s.SentimentHash END) AS cntGeneral,
  array_to_string(list_sort(list(DISTINCT d.DocumentHash)), ',') AS documentHashes
FROM fct_document d
JOIN good_tags g ON g.document_hash = d.DocumentHash
JOIN fct_sentiment s ON s.DocumentHash = d.DocumentHash
GROUP BY d.PublicationDateId, g.tag
"""
    )


def statstoryimpact_sql() -> str:
    return (
        facts_prefix()
        + """
SELECT
  d.DocumentHash, d.PublicationDateId,
  substr(d.Text, 1, 1000) AS TextHead,
  count(DISTINCT w.WebResourceHash) AS cntWRs,
  count(DISTINCT w.Domain)          AS cntDomains,
  count(DISTINCT CASE WHEN w.ParentWebResourceHash IS NOT NULL
                      THEN w.WebResourceHash END) AS cntReplies
FROM fct_document d
LEFT JOIN fct_webresource w ON w.DocumentHash = d.DocumentHash
GROUP BY d.DocumentHash, d.PublicationDateId, substr(d.Text, 1, 1000)
"""
    )


def statstoryrank_sql() -> str:
    return (
        facts_prefix()
        + """
, impact AS (
  SELECT d.DocumentHash,
         strftime(d.PublicationTime, '%Y_%m')        AS PubMonth,
         cast(weekofyear(d.PublicationTime) AS int)  AS PubWeek,
         count(DISTINCT w.WebResourceHash)           AS cntWRs,
         count(DISTINCT w.Domain)                    AS cntDomains
  FROM fct_document d
  LEFT JOIN fct_webresource w ON w.DocumentHash = d.DocumentHash
  GROUP BY 1, 2, 3
)
SELECT DocumentHash, PubMonth, PubWeek, cntWRs, cntDomains,
  rank() OVER (PARTITION BY PubWeek  ORDER BY cntWRs DESC, cntDomains DESC, DocumentHash) AS WeekRank,
  rank() OVER (PARTITION BY PubMonth ORDER BY cntWRs DESC, cntDomains DESC, DocumentHash) AS MonthRank
FROM impact
ORDER BY cntWRs DESC, DocumentHash
LIMIT 100000
"""
    )


def statdomainopinions_sql() -> str:
    return (
        facts_prefix()
        + """
, domstats AS (
  SELECT w.Domain,
    count(DISTINCT w.DocumentHash)                         AS cntDocs,
    count(s.SentimentHash)                                 AS cntOpinions,
    cast(sum(CASE WHEN s.DominantValence = 1 THEN 1 ELSE 0 END) AS bigint) AS cntPositives,
    cast(sum(CASE WHEN s.DominantValence = 2 THEN 1 ELSE 0 END) AS bigint) AS cntNegatives,
    round(avg(s.SentimentTotalScore), 2)                   AS avgScore,
    round(coalesce(stddev_pop(s.SentimentTotalScore), 0.0), 2) AS stddevScore,
    min(s.SentimentTotalScore)                             AS minScore,
    max(s.SentimentTotalScore)                             AS maxScore
  FROM fct_webresource w
  JOIN fct_sentiment s ON s.MainWebResourceHash = w.WebResourceHash
  GROUP BY w.Domain
  HAVING count(DISTINCT w.DocumentHash) >= 2
)
SELECT *,
  round(cntPositives / greatest(cast(cntNegatives AS double), 0.01), 2) AS posNegRatio,
  rank() OVER (ORDER BY cntOpinions DESC, Domain) AS DomainRank
FROM domstats
"""
    )


def stattoptopic7d_sql() -> str:
    return (
        facts_prefix()
        + """
, days AS (SELECT DISTINCT PublicationDateId AS SnapshotDateId FROM fct_document),
topics AS (
  SELECT d.PublicationDateId, g.tag AS Topic, d.DocumentHash, w.Domain
  FROM fct_document d
  JOIN good_tags g ON g.document_hash = d.DocumentHash
  LEFT JOIN fct_webresource w ON w.DocumentHash = d.DocumentHash
),
windowed AS (
  SELECT p.SnapshotDateId, tp.Topic,
         count(DISTINCT tp.DocumentHash) AS cntDocs7d,
         count(DISTINCT tp.Domain)       AS cntDomains7d
  FROM days p
  JOIN topics tp
    ON tp.PublicationDateId <= p.SnapshotDateId
   AND tp.PublicationDateId >= cast(strftime(strptime(cast(p.SnapshotDateId AS varchar), '%Y%m%d') - INTERVAL 7 DAY, '%Y%m%d') AS int)
  GROUP BY p.SnapshotDateId, tp.Topic
)
SELECT SnapshotDateId, Topic, cntDocs7d, cntDomains7d,
  rank() OVER (PARTITION BY SnapshotDateId
               ORDER BY cntDocs7d DESC, cntDomains7d DESC, length(Topic) DESC, Topic) AS TopicRank
FROM windowed
"""
    )


def stattopstory7d_sql() -> str:
    return (
        facts_prefix()
        + """
, days AS (SELECT DISTINCT PublicationDateId AS SnapshotDateId FROM fct_document),
stories AS (
  SELECT p.SnapshotDateId, d.DocumentHash,
         count(DISTINCT w.WebResourceHash) AS cntWRs,
         count(DISTINCT w.Domain)          AS cntDomains
  FROM days p
  JOIN fct_document d
    ON d.PublicationDateId <= p.SnapshotDateId
   AND d.PublicationDateId >= cast(strftime(strptime(cast(p.SnapshotDateId AS varchar), '%Y%m%d') - INTERVAL 7 DAY, '%Y%m%d') AS int)
  LEFT JOIN fct_webresource w ON w.DocumentHash = d.DocumentHash
  GROUP BY p.SnapshotDateId, d.DocumentHash
),
story_ranked AS (
  SELECT *, rank() OVER (PARTITION BY SnapshotDateId
                         ORDER BY cntWRs DESC, cntDomains DESC, DocumentHash) AS StoryRank
  FROM stories
)
SELECT * FROM story_ranked WHERE StoryRank <= 20
"""
    )


def stattoptopic7dsentiment_sql() -> str:
    return (
        facts_prefix()
        + """
, all_tags AS (
  SELECT dt.document_hash, dt.tag FROM doc_tags dt WHERE dt.good_as_topic
),
singles AS (
  SELECT d.PublicationDateId AS SnapshotDateId, t.tag AS Topic,
         s.DominantValence,
         count(DISTINCT s.SentimentHash) AS cntSentiments
  FROM fct_document d
  JOIN all_tags t ON t.document_hash = d.DocumentHash
  JOIN fct_sentiment s ON s.DocumentHash = d.DocumentHash
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT d.PublicationDateId AS SnapshotDateId,
         t1.tag || '&' || t2.tag AS Topic,
         s.DominantValence,
         count(DISTINCT s.SentimentHash) AS cntSentiments
  FROM fct_document d
  JOIN all_tags t1 ON t1.document_hash = d.DocumentHash
  JOIN all_tags t2 ON t2.document_hash = d.DocumentHash
  JOIN fct_sentiment s ON s.DocumentHash = d.DocumentHash
  WHERE t1.tag < t2.tag
  GROUP BY 1, 2, 3
)
SELECT * FROM singles
UNION ALL
SELECT * FROM pairs
"""
    )


STATS_ORACLES: dict[str, str] = {
    "stattopic": stattopic_sql(),
    "statstoryimpact": statstoryimpact_sql(),
    "statstoryrank": statstoryrank_sql(),
    "statdomainopinions": statdomainopinions_sql(),
    "stattoptopic7d": stattoptopic7d_sql(),
    "stattopstory7d": stattopstory7d_sql(),
    "stattoptopic7dsentiment": stattoptopic7dsentiment_sql(),
}
