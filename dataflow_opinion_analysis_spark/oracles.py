"""DuckDB-dialect oracle SQL for the indexer pipeline.

The driver's correctness gate runs each ``queries()`` entry on Spark and
the matching ``oracle_sql()`` string on DuckDB (tables ``region nation
customer supplier part orders lineitem events documents embeddings``
pre-registered as views at sf0.01), then compares row-count + schema +
order-insensitive value-hash. This module regenerates the *entire*
indexer pipeline — transcripts derivation, InputContent columns, exact
dedupe, lexicon scorer, tag extraction, soft dedupe vote — as one ANSI-SQL
WITH-chain so the pipeline is verified end to end, not just spot columns.

Dialect notes: DuckDB-only constructs used here are
``regexp_extract_all`` (token/sentence explode), ``epoch()``,
``strftime``, ``generate_series`` + 1-based list indexing. The Spark side
is the real engine (Arrow UDFs), not this SQL.
"""

from __future__ import annotations

from dataflow_opinion_analysis_spark.functions import lexicon
from dataflow_opinion_analysis_spark.sources.transcripts import duckdb_transcripts_cte

SEP = "chr(31)"
TOKEN_RE_SQL = lexicon.TOKEN_RE.replace("'", "''")
PROCESSING_TIME = "2024-02-01 00:00:00"


def _lex_values() -> str:
    return ", ".join(f"('{w}', '{d}')" for w, d in lexicon.LEXICON_PAIRS)


def _stop_values() -> str:
    return ", ".join(f"('{w}')" for w in sorted(lexicon.TAG_STOPWORDS))


def _block_values() -> str:
    return ", ".join(f"('{w}')" for w in sorted(lexicon.TOPIC_BLOCKLIST))


def indexer_prefix(transcripts_cte: str | None = None) -> str:
    """WITH-chain reproducing the pipeline up to soft-dedupe verdicts.

    ``transcripts_cte`` overrides the input derivation (the enriched-tags
    gate feeds deterministically capitalized text through the SAME chain)."""
    return f"""
WITH transcripts AS ({transcripts_cte or duckdb_transcripts_cte()}),
lex(token, dim) AS (VALUES {_lex_values()}),
stopwords(word) AS (VALUES {_stop_values()}),
blocklist(word) AS (VALUES {_block_values()}),
ic0 AS (
  SELECT t.*,
    'conv://' || conv_id || '/' || cast(turn_idx AS varchar)        AS url,
    ts                                                              AS pub_time,
    cast(strftime(ts, '%Y%m%d') AS int)                             AS pub_date_id,
    CASE WHEN turn_idx = 0 THEN substr(text, 1, 80) END             AS title,
    role                                                            AS author,
    'EN'                                                            AS language,
    '05'                                                            AS document_collection_id,
    conv_id || ':' || cast(turn_idx AS varchar)                     AS collection_item_id,
    CASE WHEN role = 'tool' THEN 1 ELSE 0 END                       AS skip_indexing,
    CASE WHEN lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx)
              = turn_idx - 1
         THEN lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)
    END                                                             AS parent_pub_time,
    CASE WHEN lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx)
              = turn_idx - 1
         THEN 'conv://' || conv_id || '/' || cast(turn_idx - 1 AS varchar)
    END                                                             AS parent_url
  FROM transcripts t
  WHERE length(trim(coalesce(text, ''))) > 0
),
ic AS (
  SELECT *,
    sha256(coalesce(text,'') || {SEP} || document_collection_id)    AS content_hash,
    sha256(coalesce(text,'') || {SEP} || document_collection_id
           || {SEP} || collection_item_id)                          AS expected_document_hash,
    sha256(cast(cast(cast(epoch(pub_time) AS double) * 1000 AS bigint) AS varchar)
           || {SEP} || url)                                         AS web_resource_hash,
    CASE WHEN parent_url IS NOT NULL THEN
      sha256(cast(cast(cast(epoch(parent_pub_time) AS double) * 1000 AS bigint) AS varchar)
             || {SEP} || parent_url) END                            AS parent_web_resource_hash,
    TIMESTAMP '{PROCESSING_TIME}'                                   AS processing_time,
    cast(strftime(TIMESTAMP '{PROCESSING_TIME}', '%Y%m%d') AS int)  AS processing_date_id
  FROM ic0
),
to_index AS (SELECT * FROM ic WHERE skip_indexing = 0),
skipped  AS (SELECT * FROM ic WHERE skip_indexing <> 0),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY content_hash ORDER BY pub_time, conv_id, turn_idx) AS _rn,
    first_value(expected_document_hash)
      OVER (PARTITION BY content_hash ORDER BY pub_time, conv_id, turn_idx) AS winner_document_hash
  FROM to_index
),
winners     AS (SELECT * FROM ranked WHERE _rn = 1),
exact_dupes AS (SELECT * FROM ranked WHERE _rn > 1),
-- tokenizer over winners (pos = the winner's document hash)
tok AS (
  SELECT w.expected_document_hash AS document_hash, t.token
  FROM winners w,
       unnest(regexp_extract_all(lower(coalesce(w.text,'')), '{TOKEN_RE_SQL}')) AS u(token),
       LATERAL (SELECT u.token AS token) t
),
-- tags: top-{lexicon.TAG_TOP_K} by (count desc, token asc), len >= {lexicon.TAG_MIN_LEN}, no stopwords
tag_counts AS (
  SELECT document_hash, token, count(*) AS n
  FROM tok
  WHERE length(token) >= {lexicon.TAG_MIN_LEN}
    AND token NOT IN (SELECT word FROM stopwords)
  GROUP BY 1, 2
),
tags AS (
  SELECT document_hash, token, n,
    row_number() OVER (PARTITION BY document_hash ORDER BY n DESC, token ASC) AS rk
  FROM tag_counts
),
doc_tags AS (
  SELECT document_hash, token AS tag, cast(n AS double) AS weight,
    token NOT IN (SELECT word FROM blocklist) AS good_as_topic
  FROM tags WHERE rk <= {lexicon.TAG_TOP_K}
),
-- soft dedupe vote (IndexerPipeline.java:910-989 semantics)
soft_docs AS (
  SELECT w.expected_document_hash AS document_hash, w.conv_id, w.turn_idx,
    coalesce(w.title, 'No Title') AS soft_title,
    cast(round(length(w.text) / 1000.0) AS int) AS len_bucket,
    length(w.text) AS text_len
  FROM winners w
),
soft_groups AS (
  SELECT *, count(*) OVER (PARTITION BY soft_title, len_bucket) AS grp_n
  FROM soft_docs
),
soft_tag_freq AS (
  SELECT s.soft_title, s.len_bucket, dt.tag, count(*) AS occ
  FROM soft_groups s JOIN doc_tags dt USING (document_hash)
  GROUP BY 1, 2, 3
),
doc_match AS (
  SELECT s.document_hash, s.soft_title, s.len_bucket, s.conv_id, s.turn_idx,
    s.text_len, s.grp_n,
    count(dt.tag) AS n_tags,
    count(CASE WHEN f.occ >= greatest(round(s.grp_n / 2.0), 2) THEN 1 END) AS n_freq
  FROM soft_groups s
  LEFT JOIN doc_tags dt USING (document_hash)
  LEFT JOIN soft_tag_freq f
    ON f.soft_title = s.soft_title AND f.len_bucket = s.len_bucket AND f.tag = dt.tag
  GROUP BY 1, 2, 3, 4, 5, 6, 7
),
doc_match2 AS (
  SELECT *,
    (grp_n >= 2 AND n_tags > 0 AND n_freq >= 2 AND n_freq >= 0.5 * n_tags) AS is_match
  FROM doc_match
),
grp_match AS (
  SELECT *,
    sum(CASE WHEN is_match THEN 1 ELSE 0 END)
      OVER (PARTITION BY soft_title, len_bucket) AS n_match,
    CASE WHEN is_match THEN
      row_number() OVER (PARTITION BY soft_title, len_bucket, is_match
                         ORDER BY text_len, conv_id, turn_idx) END AS match_rk,
    CASE WHEN is_match THEN
      first_value(document_hash)
        OVER (PARTITION BY soft_title, len_bucket, is_match
              ORDER BY text_len, conv_id, turn_idx) END AS grp_winner_hash
  FROM doc_match2
),
verdict AS (
  SELECT document_hash,
    (is_match AND n_match >= 2 AND match_rk > 1) AS is_dupe,
    CASE WHEN is_match AND n_match >= 2 AND match_rk > 1
         THEN grp_winner_hash ELSE document_hash END AS winner_document_hash
  FROM grp_match
),
soft_winners AS (
  SELECT w.* FROM winners w JOIN verdict v
    ON v.document_hash = w.expected_document_hash AND NOT v.is_dupe
),
soft_dupes AS (
  SELECT w.*, v.winner_document_hash AS soft_winner_hash
  FROM winners w JOIN verdict v
    ON v.document_hash = w.expected_document_hash AND v.is_dupe
),
-- scorer: sentences -> token hits -> per-dim counts
sentences AS (
  SELECT w.expected_document_hash AS document_hash, w.conv_id, w.turn_idx,
         w.pub_time, w.pub_date_id, w.web_resource_hash, w.parent_web_resource_hash,
         i AS passage_idx, trim(parts[i]) AS passage_text
  FROM (SELECT *, regexp_split_to_array(coalesce(text,''), '[.!?]+') AS parts
        FROM winners) w,
       unnest(generate_series(1, len(parts))) AS g(i)
  WHERE length(trim(parts[i])) > 0
),
sent_tok AS (
  SELECT s.document_hash, s.passage_idx, u.token
  FROM sentences s,
       unnest(regexp_extract_all(lower(s.passage_text), '{TOKEN_RE_SQL}')) AS u(token)
),
sent_hits AS (
  SELECT st.document_hash, st.passage_idx, l.dim, st.token
  FROM sent_tok st JOIN lex l ON l.token = st.token
),
sent_scores AS (
  SELECT document_hash, passage_idx,
    {", ".join(f"cast(sum(CASE WHEN dim = '{d}' THEN 1 ELSE 0 END) AS int) AS {lexicon.DIM_TO_COLUMN[d]}" for d in sorted(lexicon.LEXICON))},
    list_sort(list(DISTINCT dim || ':' || token)) AS Signals
  FROM sent_hits
  GROUP BY 1, 2
),
passages AS (
  SELECT s.*, sc.* EXCLUDE (document_hash, passage_idx),
    cast(sc.StPositive + sc.StNegative AS int) AS StSentiment,
    cast({" + ".join(lexicon.DIM_TO_COLUMN[d] for d in sorted(lexicon.LEXICON))}
      + sc.StPositive + sc.StNegative AS int) AS SentimentTotalScore,
    CASE WHEN sc.StPositive > sc.StNegative THEN 1
         WHEN sc.StNegative > sc.StPositive THEN 2
         WHEN sc.StPositive = sc.StNegative AND sc.StPositive > 0 THEN 3
         ELSE 5 END AS DominantValence
  FROM sentences s JOIN sent_scores sc
    ON sc.document_hash = s.document_hash AND sc.passage_idx = s.passage_idx
  WHERE ({" + ".join(lexicon.DIM_TO_COLUMN[d] for d in sorted(lexicon.LEXICON))}
      + sc.StPositive + sc.StNegative) > 0
)
"""


def document_sql() -> str:
    """Oracle for the `document` output table (scalar columns)."""
    return (
        indexer_prefix()
        + """
SELECT
  expected_document_hash AS DocumentHash,
  pub_time               AS PublicationTime,
  pub_date_id            AS PublicationDateId,
  document_collection_id AS DocumentCollectionId,
  collection_item_id     AS CollectionItemId,
  title                  AS Title,
  CASE WHEN length(text) < 400 THEN 1 ELSE 2 END AS Type,
  language               AS Language,
  cast(length(text) AS int) AS ContentLength,
  author                 AS Author,
  text                   AS Text,
  web_resource_hash      AS MainWebResourceHash,
  parent_web_resource_hash AS ParentWebResourceHash
FROM soft_winners
"""
    )


def sentiment_sql() -> str:
    """Oracle for the `sentiment` output table (all score dims)."""
    st_cols = ", ".join(
        lexicon.DIM_TO_COLUMN[d] for d in sorted(lexicon.LEXICON)
    )
    return (
        indexer_prefix()
        + f"""
, doc_tags_str AS (
  SELECT document_hash, string_agg(token, ',' ORDER BY rk) AS tags_str
  FROM tags WHERE rk <= {lexicon.TAG_TOP_K}
  GROUP BY 1
)
SELECT
  sha256(p.document_hash || {SEP} || cast(p.passage_idx AS varchar)
         || {SEP} || p.passage_text)             AS SentimentHash,
  p.document_hash                                AS DocumentHash,
  p.pub_time                                     AS DocumentTime,
  p.pub_date_id                                  AS DocumentDateId,
  p.passage_text                                 AS Text,
  CASE WHEN strpos(w.text, p.passage_text) > 0
       THEN cast(strpos(w.text, p.passage_text) - 1 AS varchar) || ':' ||
            cast(strpos(w.text, p.passage_text) - 1
                 + length(p.passage_text) AS varchar)
  END                                            AS LabelledPositions,
  p.SentimentTotalScore                          AS SentimentTotalScore,
  p.DominantValence                              AS DominantValence,
  {st_cols},
  p.StSentiment                                  AS StSentiment,
  p.web_resource_hash                            AS MainWebResourceHash,
  p.parent_web_resource_hash                     AS ParentWebResourceHash,
  array_to_string(p.Signals, ';')                AS SignalsStr,
  coalesce(dts.tags_str, '')                     AS TagsStr
FROM passages p
JOIN soft_winners w ON w.expected_document_hash = p.document_hash
LEFT JOIN doc_tags_str dts ON dts.document_hash = p.document_hash
"""
    )


def webresource_sql() -> str:
    """Oracle for the `webresource` output table (union of 4 branches)."""
    base = """
SELECT web_resource_hash AS WebResourceHash, url AS Url,
  pub_time AS PublicationTime, pub_date_id AS PublicationDateId,
  processing_time AS ProcessingTime, processing_date_id AS ProcessingDateId,
  {dochash} AS DocumentHash,
  document_collection_id AS DocumentCollectionId,
  collection_item_id AS CollectionItemId, title AS Title,
  conv_id AS Domain, author AS Author,
  parent_web_resource_hash AS ParentWebResourceHash,
  coalesce(tool, '') AS MetaFieldsStr
FROM {src}
"""
    return (
        indexer_prefix()
        + base.format(dochash="expected_document_hash", src="soft_winners")
        + " UNION ALL "
        + base.format(dochash="winner_document_hash", src="exact_dupes")
        + " UNION ALL "
        + base.format(dochash="expected_document_hash", src="skipped")
        + " UNION ALL "
        + base.format(dochash="soft_winner_hash", src="soft_dupes")
    )


# ---------------------------------------------------------------------------
# N2 enrichment wired into the indexer (enrich_ratio > 0)
# ---------------------------------------------------------------------------

# deterministic capitalization for the gate corpus (all-lowercase fixture
# texts produce no capitalized phrases otherwise) — identical transform on
# the Spark side (functions/entities._CAP_SPARK pattern over transcripts)
CAP_TEXT_DUCK = """array_to_string(list_transform(string_split(coalesce(text, ''), ' '),
  w -> CASE WHEN (cast('0x' || substr(sha256(w), 1, 4) AS bigint) % 3) = 0
            THEN upper(substr(w, 1, 1)) || substr(w, 2) ELSE w END), ' ')"""


def enriched_tags_sql(ratio: float = 0.3) -> str:
    """Oracle for the indexer with the N2 entity-enrichment branch wired
    in (plans/indexer.build_indexer(enrich_ratio=...)): per soft-winner
    document, the base tag count, the count of appended cnlp:: tags, and
    the top entity by salience — over deterministically capitalized
    transcripts so the capitalized-phrase model fires."""
    from dataflow_opinion_analysis_spark.functions import entities as _ent

    threshold = int(_ent.SPLIT_MOD * ratio)
    cap_cte = (
        "SELECT conv_id, turn_idx, role, "
        + CAP_TEXT_DUCK
        + " AS text, tool, ts FROM ("
        + duckdb_transcripts_cte()
        + ")"
    )
    entity_re = _ent.ENTITY_RE_SQL
    return (
        indexer_prefix(transcripts_cte=cap_cte)
        + f"""
, doc_ntags AS (
  SELECT document_hash, count(*) AS n_base FROM doc_tags GROUP BY 1
),
dice AS (
  SELECT expected_document_hash AS document_hash,
         cast('0x' || substr(sha256(expected_document_hash), 1, 8) AS bigint)
           % {_ent.SPLIT_MOD} AS d
  FROM soft_winners
),
branch_b AS (
  SELECT w.* FROM soft_winners w
  JOIN dice ON dice.document_hash = w.expected_document_hash
  WHERE dice.d < {threshold}
),
ent_counts AS (
  SELECT document_hash, phrase, count(*) AS n
  FROM (
    SELECT b.expected_document_hash AS document_hash,
           unnest(regexp_extract_all(b.text, '{entity_re}')) AS phrase
    FROM branch_b b
  ) GROUP BY 1, 2
),
ent_tot AS (SELECT document_hash, cast(sum(n) AS bigint) AS total FROM ent_counts GROUP BY 1),
ent_ranked AS (
  SELECT c.document_hash, c.phrase,
         round(c.n / cast(t.total AS double), 6) AS salience,
         row_number() OVER (PARTITION BY c.document_hash
                            ORDER BY c.n / cast(t.total AS double) DESC, c.phrase) AS rank
  FROM ent_counts c JOIN ent_tot t USING (document_hash)
),
cnlp AS (
  SELECT r.document_hash,
         count(*) AS n_cnlp,
         min(CASE WHEN r.rank = 1 THEN 'cnlp::' || r.phrase END) AS top_cnlp_tag,
         min(CASE WHEN r.rank = 1 THEN r.salience END) AS top_cnlp_weight
  FROM ent_ranked r
  JOIN doc_ntags nt USING (document_hash)
  WHERE r.rank <= nt.n_base
  GROUP BY 1
)
SELECT w.expected_document_hash AS DocumentHash,
       cast(coalesce(nt.n_base, 0) AS int)  AS n_base_tags,
       cast(CASE WHEN dice.d < {threshold} THEN coalesce(c.n_cnlp, 0) ELSE 0 END AS int) AS n_cnlp_tags,
       CASE WHEN dice.d < {threshold} THEN c.top_cnlp_tag END    AS top_cnlp_tag,
       CASE WHEN dice.d < {threshold} THEN c.top_cnlp_weight END AS top_cnlp_weight
FROM soft_winners w
LEFT JOIN doc_ntags nt ON nt.document_hash = w.expected_document_hash
JOIN dice ON dice.document_hash = w.expected_document_hash
LEFT JOIN cnlp c ON c.document_hash = w.expected_document_hash
"""
    )


def pagerank_sql(iters: int = 4) -> str:
    """Impact propagation over the webresource reply graph — fixed
    ``iters`` PageRank rounds unrolled as CTEs (DuckDB mirror of
    operators/components.pagerank_impact). All-integer arithmetic:
    per-edge contribution = (85·r) // (100·outdeg) (both engines' bigint
    floor division is exact), so the per-node SUM never touches floats.
    When a node has no in-edges the sum term is NULL -> coalesce 0,
    matching Spark's nodes-LEFT-JOIN-inflow shape."""
    parts = [f"""WITH wr AS (
{webresource_sql()}
),
nodes AS (SELECT DISTINCT WebResourceHash AS node FROM wr),
edges AS (
  SELECT WebResourceHash AS src, ParentWebResourceHash AS dst FROM wr
  WHERE ParentWebResourceHash IS NOT NULL AND ParentWebResourceHash <> ''
),
outdeg AS (SELECT src, cast(count(*) AS bigint) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes)"""]
    prev = "r0"
    for k in range(1, iters + 1):
        parts.append(f""",
r{k} AS (
  SELECT n.node,
    CAST(150000 + coalesce(sum((85 * r.rank_micro) // (100 * o.outdeg)), 0) AS BIGINT) AS rank_micro
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN outdeg o ON o.src = e.src
  LEFT JOIN {prev} r ON r.node = e.src
  GROUP BY n.node
)""")
        prev = f"r{k}"
    parts.append(f"""
SELECT node AS web_resource_hash, rank_micro FROM {prev}""")
    return "".join(parts)
