"""DuckDB oracles for the corpus-curation operators
(operators/curation.py): benchmark decontamination, Gopher-style
repetition rules, shard assignment, per-source caps.

Same portability bridges as oracles_dataprep.py:
  hex->bigint:  Spark cast(conv(substr(sha2(s,256),1,8),16,10) AS bigint)
             == DuckDB cast('0x' || substr(sha256(s),1,8) AS bigint)
  fractions:    bigint-to-double division folds identically; round(x, 6)
                agrees on both engines (established across the dataprep
                oracle suite).
"""

from __future__ import annotations

from dataflow_opinion_analysis_spark.operators import curation as c
from dataflow_opinion_analysis_spark.oracles_dataprep import DUCK_TOKENS


def duck_shingles(n: int, toks: str = "toks") -> str:
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )


def _duck_hash_u(expr: str) -> str:
    return f"cast(('0x' || substr(sha256({expr}), 1, 8)) AS bigint)"


DECONTAMINATE_SQL = f"""
WITH eval_docs AS (
  SELECT doc_id AS eval_id, coalesce(text, '') AS text,
         row_number() OVER (ORDER BY doc_id) - 1 AS rn
  FROM documents WHERE doc_id % {c.DECON_EVAL_MOD} = {c.DECON_EVAL_REM}
),
corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {c.DECON_INJECT_MOD} = {c.DECON_INJECT_REM}
              THEN coalesce(d.text, '') || ' ' ||
                   coalesce(substr(e.text, 1, {c.DECON_SNIPPET_CHARS}), '')
              ELSE coalesce(d.text, '') END AS text
  FROM documents d
  LEFT JOIN eval_docs e ON e.rn = d.doc_id % {c.DECON_PICK_MOD}
  WHERE d.doc_id % {c.DECON_EVAL_MOD} <> {c.DECON_EVAL_REM}
),
ctoks AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM corpus),
cs AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({duck_shingles(c.DECON_N)}) AS shingle FROM ctoks)
),
csize AS (SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY doc_id),
etoks AS (SELECT eval_id, {DUCK_TOKENS} AS toks FROM eval_docs),
es AS (
  SELECT DISTINCT eval_id, shingle
  FROM (SELECT eval_id, unnest({duck_shingles(c.DECON_N)}) AS shingle FROM etoks)
),
hits AS (
  SELECT cs.doc_id, es.eval_id, cs.shingle
  FROM cs JOIN es ON es.shingle = cs.shingle
),
per_eval AS (
  SELECT doc_id, eval_id, count(*) AS n_shared_e
  FROM hits GROUP BY doc_id, eval_id
),
top_eval AS (
  SELECT doc_id, eval_id AS top_eval_id, n_shared_e AS n_shared
  FROM (
    SELECT doc_id, eval_id, n_shared_e,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n_shared_e DESC, eval_id ASC) AS rk
    FROM per_eval
  ) WHERE rk = 1
)
SELECT cp.doc_id,
  coalesce(z.n_shingles, 0) AS n_shingles,
  coalesce(t.n_shared, 0) AS n_shared,
  t.top_eval_id AS top_eval_id,
  coalesce(t.n_shared, 0) >= {c.DECON_MIN_SHARED} AS contaminated
FROM corpus cp
LEFT JOIN csize z ON z.doc_id = cp.doc_id
LEFT JOIN top_eval t ON t.doc_id = cp.doc_id
"""

_REP_INJECT = (
    f"CASE WHEN doc_id % {c.REP_INJECT_MOD} = {c.REP_INJECT_REM} "
    f"THEN coalesce(text, '') || repeat(' ' || "
    f"substr(coalesce(text, ''), 1, {c.REP_SNIPPET_CHARS}), {c.REP_TIMES}) "
    f"ELSE coalesce(text, '') END"
)

QUALITY_REPETITION_SQL = f"""
WITH injected AS (SELECT doc_id, {_REP_INJECT} AS text FROM documents),
base AS (
  SELECT doc_id, {DUCK_TOKENS} AS toks FROM injected
),
b2 AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM base),
tok AS (SELECT doc_id, unnest(toks) AS token FROM b2),
dt AS (SELECT doc_id, count(DISTINCT token) AS n_distinct FROM tok GROUP BY doc_id),
g2 AS (SELECT doc_id, unnest({duck_shingles(2)}) AS g FROM b2),
g2c AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY doc_id, g),
t2 AS (SELECT doc_id, max(cnt) AS top2_cnt FROM g2c GROUP BY doc_id),
g4 AS (SELECT doc_id, unnest({duck_shingles(4)}) AS g FROM b2),
g4c AS (SELECT doc_id, g, count(*) AS cnt FROM g4 GROUP BY doc_id, g),
d4 AS (
  SELECT doc_id,
         cast(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS bigint) AS dup4_pos,
         cast(sum(cnt) AS bigint) AS n4
  FROM g4c GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
  round(coalesce(dt.n_distinct, 0) / cast(greatest(b.n_tokens, 1) AS double), 6)
    AS distinct_ratio,
  round(coalesce(t2.top2_cnt, 0) * 2 / cast(greatest(b.n_tokens, 1) AS double), 6)
    AS top2_frac,
  round(coalesce(d4.dup4_pos, 0) / cast(greatest(coalesce(d4.n4, 0), 1) AS double), 6)
    AS dup4_frac,
  (coalesce(t2.top2_cnt, 0) * 2 / cast(greatest(b.n_tokens, 1) AS double))
      <= {c.REP_TOP2_MAX}
    AND (coalesce(d4.dup4_pos, 0) / cast(greatest(coalesce(d4.n4, 0), 1) AS double))
      <= {c.REP_DUP4_MAX} AS passes_repetition
FROM b2 b
LEFT JOIN dt ON dt.doc_id = b.doc_id
LEFT JOIN t2 ON t2.doc_id = b.doc_id
LEFT JOIN d4 ON d4.doc_id = b.doc_id
"""

SHARD_FOR_TRAINING_SQL = f"""
WITH h AS (
  SELECT doc_id,
         {_duck_hash_u("cast(doc_id AS varchar) || '|shard'")} AS pr
  FROM documents
),
a AS (SELECT doc_id, pr % {c.N_SHARDS} AS shard, pr FROM h)
SELECT doc_id, shard,
  row_number() OVER (PARTITION BY shard ORDER BY pr, doc_id) AS pos,
  count(*) OVER (PARTITION BY shard) AS shard_size
FROM a
"""

CAP_PER_SOURCE_SQL = f"""
WITH h AS (
  SELECT doc_id, source,
         {_duck_hash_u("cast(doc_id AS varchar) || '|cap'")} AS pr
  FROM documents
)
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY pr, doc_id) AS rk
  FROM h
) WHERE rk <= {c.CAP_PER_SOURCE_K}
"""

CURATION_ORACLES: dict[str, str] = {
    "decontaminate": DECONTAMINATE_SQL,
    "quality_repetition": QUALITY_REPETITION_SQL,
    "shard_for_training": SHARD_FOR_TRAINING_SQL,
    "cap_per_source": CAP_PER_SOURCE_SQL,
}

SAMPLE_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT source, count(*) AS n_s,
         cast(floor(sqrt(cast(count(*) AS double))) AS bigint) AS w_s
  FROM documents GROUP BY source
),
rates AS (
  SELECT source, n_s, w_s, sum(w_s) OVER () AS sum_w FROM counts
)
SELECT d.doc_id, d.source, r.n_s AS n_source, r.w_s
FROM documents d JOIN rates r ON r.source = d.source
WHERE {_duck_hash_u("cast(doc_id AS varchar) || '|mix'")} * (r.sum_w * r.n_s)
      < {c.MIX_TARGET} * r.w_s * 4294967296
"""

CURATION_ORACLES["sample_mixture"] = SAMPLE_MIXTURE_SQL
