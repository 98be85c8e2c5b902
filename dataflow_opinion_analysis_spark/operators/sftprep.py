"""Training-data prep over CONVERSATIONS (the transcripts input table)
plus two corpus-level text-prep operators the LLM brief's pipeline needs:

- ``sft_pairs``      — (prompt, response) extraction: one training pair
  per assistant turn, the prompt being the rendered trailing context
  window. The SFT-ification step of a transcript corpus.
- ``chat_render``    — full chat-template rendering: one training
  document per conversation, turns concatenated in order with role tags
  (the "render to plain text" step before tokenization/packing).
- ``dedup_paragraph``— CCNet-style sub-document dedup: fixed-width word
  chunks (the paragraph analog for our single-line synthetic corpus) are
  exact-deduped CORPUS-wide and each document is reconstructed from its
  surviving chunks. Catches boilerplate shared across documents that
  document-level dedup (operators/dataprep.py) cannot.
- ``text_bigram_stats`` — corpus-LM quality signals per document without
  floating-point log()s: the fraction of a document's token bigrams that
  are corpus-unique (templated/repetitive text scores low), and the mean
  corpus frequency of its bigrams. Integer aggregates + ONE final
  division, so the doubles are bit-identical across engines (ln() and
  float SUM orderings are not portable — same reasoning as the TF-IDF
  operator in operators/dataprep.py).

Scale notes (100-TB posture):
- Every shuffle is an equi-key hash agg / join (conv_id, chunk text,
  bigram); no global windows, no cross joins, no driver collects.
- The SFT context window is BOUNDED (``SFT_CONTEXT_TURNS``), so row
  width is O(window), not O(conversation).
- ``chat_render`` sorts per-conversation arrays (array_sort of
  (turn_idx, line) structs) instead of relying on collect_list order,
  which is undefined after a shuffle.
- ``dedup_paragraph``'s winner election shuffles by chunk TEXT — the
  same near-unique-key posture as the exact document dedup, so no hot
  keys beyond genuinely repeated boilerplate (bounded by the corpus'
  real duplication, exactly what a salting pass would target if one
  chunk dominated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataflow_opinion_analysis_spark.operators.dataprep import SPARK_TOKENS, _docs
from dataflow_opinion_analysis_spark.sources.transcripts import derive_transcripts

# bounded context: the prompt carries at most this many preceding turns
SFT_CONTEXT_TURNS = 4
# fixed word width of the sub-document dedup unit (paragraph analog)
CHUNK_WORDS = 16


def _transcripts(spark: SparkSession, sf_dir: str) -> None:
    derive_transcripts(spark, sf_dir).createOrReplaceTempView("transcripts")


def sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (prompt, response) row per assistant turn: the prompt is the
    trailing {SFT_CONTEXT_TURNS}-turn context rendered 'role: text' and
    newline-joined; the response is the assistant turn's text. The
    window frame (ROWS BETWEEN n PRECEDING AND 1 PRECEDING, ordered by
    turn_idx) is deterministic in both engines."""
    _transcripts(spark, sf_dir)
    return spark.sql(
        f"""
WITH rendered AS (
  SELECT conv_id, turn_idx, role, text,
         role || ': ' || text AS line
  FROM transcripts
),
ctx AS (
  SELECT conv_id, turn_idx, role, text,
         collect_list(line) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN {SFT_CONTEXT_TURNS} PRECEDING AND 1 PRECEDING
         ) AS ctx_lines
  FROM rendered
)
SELECT conv_id, turn_idx,
       array_join(ctx_lines, chr(10)) AS prompt,
       text AS response,
       cast(size(ctx_lines) AS bigint) AS n_context_turns
FROM ctx
WHERE role = 'assistant' AND turn_idx > 0
"""
    )


def chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One rendered training document per conversation: turns in
    turn_idx order as 'role: text' lines. Order comes from an explicit
    array_sort over (turn_idx, line) structs — collect_list alone has
    no order guarantee after the groupBy shuffle."""
    _transcripts(spark, sf_dir)
    return spark.sql(
        """
SELECT conv_id,
       array_join(
         transform(
           array_sort(collect_list(named_struct(
             'i', turn_idx, 's', role || ': ' || text))),
           x -> x.s),
         chr(10)) AS rendered,
       count(*) AS n_turns,
       sum(length(text)) AS n_chars
FROM transcripts
GROUP BY conv_id
"""
    )


def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk-level) exact dedup, CCNet's paragraph dedup
    re-expressed for a corpus without newlines: split each document into
    fixed {CHUNK_WORDS}-word chunks, elect one corpus-wide winner per
    distinct chunk text (first by (doc_id, chunk_idx)), and rebuild each
    document from its surviving chunks. Emits per-document accounting +
    the deduplicated text."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
WITH toks AS (
  SELECT doc_id, {SPARK_TOKENS} AS t FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         array_join(slice(t, i * {CHUNK_WORDS} + 1, {CHUNK_WORDS}), ' ') AS chunk
  FROM toks
  LATERAL VIEW explode(
    CASE WHEN size(t) = 0 THEN array()
         ELSE sequence(0, cast(ceil(size(t) / {CHUNK_WORDS}.0) AS int) - 1)
    END) AS i
),
ranked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (
             PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rk
  FROM chunks
)
SELECT doc_id,
       count(*) AS n_chunks,
       sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS n_kept,
       array_join(
         transform(
           array_sort(collect_list(CASE WHEN rk = 1
             THEN named_struct('i', chunk_idx, 's', chunk) END)),
           x -> x.s),
         ' ') AS text_dedup
FROM ranked
GROUP BY doc_id
"""
    )


def text_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality signals per document, log-free:

    - ``bigram_novelty`` = (# of the doc's bigram instances whose corpus
      count is 1) / (# bigram instances) — low for templated text;
    - ``mean_bigram_freq`` = sum of corpus counts of the doc's bigrams /
      (# bigram instances) — integer sum, ONE final division.

    Bigrams are built array-side (transform over the token array) — no
    per-token explode + window, so the only shuffles are the corpus
    count agg and the join back on the bigram string (a plain shuffle
    equi-join: corpus vocabularies exceed broadcast size). Documents
    with fewer than two tokens have no bigrams and are absent."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
WITH toks AS (
  SELECT doc_id, {SPARK_TOKENS} AS t FROM documents
),
inst AS (
  SELECT doc_id, bigram
  FROM toks
  LATERAL VIEW explode(
    CASE WHEN size(t) < 2 THEN array()
         ELSE transform(sequence(1, size(t) - 1),
                        i -> element_at(t, i) || ' ' || element_at(t, i + 1))
    END) AS bigram
),
corpus AS (
  SELECT bigram, count(*) AS c FROM inst GROUP BY bigram
)
SELECT i.doc_id,
       count(*) AS n_bigrams,
       sum(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS n_unique,
       sum(CASE WHEN c.c = 1 THEN 1 ELSE 0 END)
         / (count(*) + CAST(0.0 AS DOUBLE)) AS bigram_novelty,
       sum(c.c) / (count(*) + CAST(0.0 AS DOUBLE)) AS mean_bigram_freq
FROM inst i JOIN corpus c ON i.bigram = c.bigram
GROUP BY i.doc_id
"""
    )
