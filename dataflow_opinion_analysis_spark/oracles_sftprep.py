"""DuckDB oracle SQL for the SFT/conversation prep operators
(operators/sftprep.py). Same rules as the other oracle modules: every
computed column is aliased identically to the Spark side, integer
aggregates are cast to BIGINT (DuckDB sum() returns HUGEINT), and any
double is produced by the exact same add/divide expression so the
values are bit-identical (no log(), no float SUM re-association —
the only float op is one final division of integers)."""

from __future__ import annotations

from dataflow_opinion_analysis_spark.operators import sftprep
from dataflow_opinion_analysis_spark.oracles_dataprep import DUCK_TOKENS
from dataflow_opinion_analysis_spark.sources.transcripts import duckdb_transcripts_cte

K = sftprep.SFT_CONTEXT_TURNS
W = sftprep.CHUNK_WORDS


def _with_transcripts(body: str) -> str:
    return f"WITH transcripts AS ({duckdb_transcripts_cte()}),\n{body}"


SFT_PAIRS_SQL = _with_transcripts(
    f"""
rendered AS (
  SELECT conv_id, turn_idx, role, text,
         role || ': ' || text AS line
  FROM transcripts
),
ctx AS (
  SELECT conv_id, turn_idx, role, text,
         list(line) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN {K} PRECEDING AND 1 PRECEDING
         ) AS ctx_lines
  FROM rendered
)
SELECT conv_id, turn_idx,
       array_to_string(ctx_lines, chr(10)) AS prompt,
       text AS response,
       cast(len(ctx_lines) AS bigint) AS n_context_turns
FROM ctx
WHERE role = 'assistant' AND turn_idx > 0
"""
)

CHAT_RENDER_SQL = _with_transcripts(
    """
agg AS (
  SELECT conv_id,
         coalesce(string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx),
                  '') AS rendered,
         cast(count(*) AS bigint) AS n_turns,
         cast(sum(length(text)) AS bigint) AS n_chars
  FROM transcripts
  GROUP BY conv_id
)
SELECT * FROM agg
"""
)

DEDUP_PARAGRAPH_SQL = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS t FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(list_slice(t, i * {W} + 1, i * {W} + {W}), ' ') AS chunk
  FROM (
    SELECT doc_id, t,
           unnest(generate_series(0, cast(ceil(len(t) / {W}.0) AS int) - 1)) AS i
    FROM toks
  )
),
ranked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (
             PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rk
  FROM chunks
)
SELECT doc_id,
       cast(count(*) AS bigint) AS n_chunks,
       cast(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS bigint) AS n_kept,
       coalesce(string_agg(CASE WHEN rk = 1 THEN chunk END,
                           ' ' ORDER BY chunk_idx), '') AS text_dedup
FROM ranked
GROUP BY doc_id
"""

TEXT_BIGRAM_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS t FROM documents
),
inst AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks
),
corpus AS (
  SELECT bigram, count(*) AS c FROM inst GROUP BY bigram
)
SELECT i.doc_id,
       cast(count(*) AS bigint) AS n_bigrams,
       cast(sum(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS bigint) AS n_unique,
       sum(CASE WHEN c.c = 1 THEN 1 ELSE 0 END)
         / (count(*) + CAST(0.0 AS DOUBLE)) AS bigram_novelty,
       sum(c.c) / (count(*) + CAST(0.0 AS DOUBLE)) AS mean_bigram_freq
FROM inst i JOIN corpus c ON i.bigram = c.bigram
GROUP BY i.doc_id
"""

SFTPREP_ORACLES: dict[str, str] = {
    "sft_pairs": SFT_PAIRS_SQL,
    "chat_render": CHAT_RENDER_SQL,
    "dedup_paragraph": DEDUP_PARAGRAPH_SQL,
    "text_bigram_stats": TEXT_BIGRAM_STATS_SQL,
}
