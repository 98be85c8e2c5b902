"""DuckDB oracles for the training-data operators
(operators/dataprep.py, similarity.py, multimodal.py).

Portability bridges verified on both engines:
  hex->bigint:  Spark conv(substr(sha2(s,256),1,8),16,10)
             == DuckDB cast('0x' || substr(sha256(s),1,8) AS bigint)
  bit ops:      >> & ^ bit_count identical
  FP dot:       both sides fold left-to-right in float64, so cosine
                values are bit-identical before the 6-dp round.
"""

from __future__ import annotations

from dataflow_opinion_analysis_spark.operators import dataprep, similarity

TOKEN_RE_SQL = dataprep.TOKEN_RE.replace("'", "''")

DUCK_TOKENS = f"regexp_extract_all(lower(coalesce(text, '')), '{TOKEN_RE_SQL}')"
N = dataprep.SHINGLE_N
DUCK_SHINGLES = f"""
  list_transform(generate_series(1, greatest(len(toks) - {N - 1}, 0)),
                 i -> array_to_string(toks[i:i+{N - 1}], ' '))
"""

def shingle_cte_duck(rel: str = "documents") -> str:
    return f"""
toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS toks FROM {rel}
),
raw_shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({DUCK_SHINGLES}) AS shingle FROM toks)
  WHERE shingle <> ''
),
rare AS (
  SELECT shingle FROM raw_shingles GROUP BY shingle
  HAVING count(*) <= {dataprep.MAX_SHINGLE_DF}
),
shingles AS (
  SELECT s.doc_id, s.shingle FROM raw_shingles s JOIN rare r ON r.shingle = s.shingle
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id)
"""


SHINGLE_CTE = shingle_cte_duck()

DEDUP_EXACT_SQL = """
WITH norm AS (
  SELECT doc_id,
         sha256(trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g'))) AS norm_hash
  FROM documents
)
SELECT doc_id, norm_hash,
  min(doc_id) OVER (PARTITION BY norm_hash)   AS canonical_doc_id,
  count(*)    OVER (PARTITION BY norm_hash)   AS group_size,
  doc_id = min(doc_id) OVER (PARTITION BY norm_hash) AS is_canonical
FROM norm
"""

DEDUP_NGRAM_JACCARD_SQL = f"""
WITH {SHINGLE_CTE},
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b, c.n_common,
  round(c.n_common / cast(sa.n_sh + sb.n_sh - c.n_common AS double), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE c.n_common / cast(sa.n_sh + sb.n_sh - c.n_common AS double) >= {dataprep.JACCARD_THRESHOLD}
"""

def minhash_pairs_ctes_duck(rel: str = "documents") -> str:
    """CTE chain (no leading WITH) ending in ``pairs`` — the MinHash+LSH
    near-dup pairs over ``rel``, reused by the standalone gate and the
    composed dataprep pipeline."""
    return f"""{shingle_cte_duck(rel)},
hashed AS (
  SELECT doc_id,
         cast(('0x' || substr(sha256(shingle), 1, 8)) AS bigint) AS h
  FROM shingles
),
seeds AS (SELECT unnest(generate_series(0, {dataprep.MINHASH_K - 1})) AS i),
sig AS (
  SELECT doc_id, i,
         min((h * (2 * i + 1) + (i * i + 7)) % {dataprep.MINHASH_P}) AS mh
  FROM hashed CROSS JOIN seeds
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, cast(floor(i / 2) AS int) AS band,
         array_to_string(list_sort(list(cast(i AS varchar) || ':' || cast(mh AS varchar))), '_') AS band_key
  FROM sig
  GROUP BY doc_id, cast(floor(i / 2) AS int)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT c.doc_a, c.doc_b,
    round(c.n_common / cast(sa.n_sh + sb.n_sh - c.n_common AS double), 6) AS jaccard
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE c.n_common / cast(sa.n_sh + sb.n_sh - c.n_common AS double) >= {dataprep.JACCARD_THRESHOLD}
)"""


DEDUP_MINHASH_LSH_SQL = f"""
WITH {minhash_pairs_ctes_duck()}
SELECT doc_a, doc_b, jaccard FROM pairs
"""

DEDUP_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS token FROM documents
),
th AS (
  SELECT doc_id, token,
         cast(('0x' || substr(sha256(token), 1, 8)) AS bigint) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
  FROM th, (SELECT unnest(generate_series(0, {dataprep.SIMHASH_BITS - 1})) AS b) s
  GROUP BY doc_id, b
),
sh AS (
  SELECT doc_id,
         cast(sum(CASE WHEN w > 0 THEN cast(pow(2, b) AS bigint) ELSE 0 END) AS bigint) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       a.simhash AS simhash_a, b.simhash AS simhash_b,
       cast(bit_count(xor(a.simhash, b.simhash)) AS int) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {dataprep.SIMHASH_MAX_HAMMING}
"""

_lang_values = ", ".join(
    f"('{w}', '{lang}')"
    for lang, ws in sorted(dataprep.LANG_STOPWORDS.items())
    for w in ws
)

TEXT_LANGID_SQL = f"""
WITH langwords(word, lang) AS (VALUES {_lang_values}),
toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS token FROM documents
),
votes AS (
  SELECT t.doc_id, l.lang, count(*) AS hits
  FROM toks t JOIN langwords l ON l.word = t.token
  GROUP BY t.doc_id, l.lang
),
best AS (
  SELECT doc_id, lang AS pred_lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rk
  FROM votes
)
SELECT d.doc_id, d.lang, coalesce(b.pred_lang, 'unknown') AS pred_lang,
       coalesce(b.hits, 0) AS hits
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rk = 1
"""

_stop_list = ", ".join(f"'{w}'" for w in dataprep.EN_STOPWORDS)

TEXT_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS text, {DUCK_TOKENS} AS toks FROM documents
),
stats AS (
  SELECT doc_id,
    cast(length(text) AS int)                               AS n_chars,
    cast(len(toks) AS int)                                  AS n_tokens,
    cast(len(list_distinct(toks)) AS int)                   AS n_distinct_tokens,
    cast(len(list_filter(toks, t -> t IN ({_stop_list}))) AS int) AS n_stopwords,
    cast(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS int) AS n_alnum
  FROM base
)
SELECT doc_id, n_chars, n_tokens, n_distinct_tokens,
  round(n_stopwords / cast(greatest(n_tokens, 1) AS double), 6)        AS stopword_ratio,
  round(n_alnum / cast(greatest(n_chars, 1) AS double), 6)             AS alnum_ratio,
  round(n_distinct_tokens / cast(greatest(n_tokens, 1) AS double), 6)  AS distinct_ratio,
  CASE WHEN n_tokens >= 10 AND n_chars >= 50
        AND n_stopwords / cast(greatest(n_tokens, 1) AS double) >= 0.01
       THEN 1 ELSE 0 END                                               AS passes_quality
FROM stats
"""

TEXT_TOKEN_COUNT_SQL = f"""
SELECT source,
  count(*)                                                    AS n_docs,
  cast(sum(len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'))) AS bigint) AS n_ws_tokens,
  cast(sum(len({DUCK_TOKENS})) AS bigint)                     AS n_re_tokens,
  cast(sum(cast(ceil(length(coalesce(text, '')) / 4.0) AS bigint)) AS bigint) AS n_subwords_est
FROM documents
GROUP BY source
"""

FN = dataprep.FINGERPRINT_N
TEXT_FINGERPRINT_SQL = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    list_transform(generate_series(1, greatest(len(toks) - {FN - 1}, 0)),
                   i -> array_to_string(toks[i:i+{FN - 1}], ' '))
  ) AS shingle
  FROM toks
)
SELECT doc_id, min(sha256(shingle)) AS fingerprint
FROM sh
WHERE shingle <> ''
GROUP BY doc_id
"""

CLS_D = dataprep.CLASSIFIER_BUCKETS
CLS_W = "((bucket * 2654435761) % 1000 - 500)"
TEXT_HASHED_CLASSIFIER_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS token FROM documents
),
bucketed AS (
  SELECT doc_id,
         cast('0x' || substr(sha256(token), 1, 8) AS bigint) % {CLS_D} AS bucket
  FROM toks
)
SELECT doc_id,
       cast(count(*) AS bigint) AS n_tokens,
       cast(sum({CLS_W}) AS bigint) AS score,
       CASE WHEN sum({CLS_W}) >= 0 THEN 1 ELSE 0 END AS keep
FROM bucketed
GROUP BY doc_id
"""

TEXT_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, cast(count(*) AS bigint) AS tf
  FROM toks GROUP BY doc_id, token
),
df AS (
  SELECT token, cast(count(*) AS bigint) AS df FROM tf GROUP BY token
),
dl AS (
  SELECT doc_id, cast(sum(tf) AS bigint) AS dl FROM tf GROUP BY doc_id
),
qterms AS (
  SELECT doc_id AS query_id, token FROM tf WHERE doc_id < {dataprep.BM25_N_QUERIES}
),
hits AS (
  SELECT q.query_id, t.doc_id,
    {dataprep._bm25_contribution(
        't.tf', 'df.df', 'dl.dl',
        '(SELECT CAST(count(*) AS BIGINT) FROM documents)',
        '(SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl)')} AS c
  FROM qterms q
  JOIN df ON df.token = q.token
  JOIN tf t ON t.token = q.token AND t.doc_id <> q.query_id
  JOIN dl ON dl.doc_id = t.doc_id
  WHERE df.df * 100 <= (SELECT CAST(count(*) AS BIGINT) FROM documents) * {dataprep.BM25_DF_CAP_PCT}
),
scored AS (
  SELECT query_id, doc_id, cast(sum(c) AS bigint) AS score_micro,
         cast(count(*) AS bigint) AS n_terms
  FROM hits GROUP BY query_id, doc_id
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC) AS rk
  FROM scored
)
SELECT query_id, doc_id AS match_doc_id, score_micro, n_terms, rk
FROM ranked WHERE rk <= {dataprep.BM25_TOP_K}
"""

# BPE merge induction mirror (operators/dataprep.text_bpe_merges):
# the same padded double-space state string, the same greedy literal
# regexp_replace merge, the same (count DESC, pair ASC) argmax — all
# integer/string ops, unrolled for BPE_ROUNDS = 3
TEXT_BPE_MERGES_SQL = f"""
WITH d0 AS (
  SELECT doc_id, ' ' || array_to_string({DUCK_TOKENS}, '  ') || ' ' AS s FROM documents
),
t1 AS (SELECT doc_id, str_split(trim(s), '  ') AS t FROM d0),
p1 AS (
  SELECT pair, cast(count(*) AS bigint) AS c
  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i + 1])) AS pair
        FROM t1)
  GROUP BY pair
),
b1 AS (SELECT pair, c FROM p1 ORDER BY c DESC, pair ASC LIMIT 1),
d1 AS (
  SELECT doc_id,
    regexp_replace(s,
      ' ' || replace((SELECT pair FROM b1), ' ', '  ') || ' ',
      ' ' || replace((SELECT pair FROM b1), ' ', '_') || ' ', 'g') AS s
  FROM d0
),
s1 AS (
  SELECT
    cast(sum(CASE WHEN trim(s) = '' THEN 0
             ELSE len(str_split(trim(s), '  ')) END) AS bigint) AS nt,
    (SELECT cast(count(DISTINCT tok) AS bigint)
     FROM (SELECT unnest(str_split(trim(s), '  ')) AS tok
           FROM d1 WHERE trim(s) <> '')) AS nd
  FROM d1
),
t2 AS (SELECT doc_id, str_split(trim(s), '  ') AS t FROM d1),
p2 AS (
  SELECT pair, cast(count(*) AS bigint) AS c
  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i + 1])) AS pair
        FROM t2)
  GROUP BY pair
),
b2 AS (SELECT pair, c FROM p2 ORDER BY c DESC, pair ASC LIMIT 1),
d2 AS (
  SELECT doc_id,
    regexp_replace(s,
      ' ' || replace((SELECT pair FROM b2), ' ', '  ') || ' ',
      ' ' || replace((SELECT pair FROM b2), ' ', '_') || ' ', 'g') AS s
  FROM d1
),
s2 AS (
  SELECT
    cast(sum(CASE WHEN trim(s) = '' THEN 0
             ELSE len(str_split(trim(s), '  ')) END) AS bigint) AS nt,
    (SELECT cast(count(DISTINCT tok) AS bigint)
     FROM (SELECT unnest(str_split(trim(s), '  ')) AS tok
           FROM d2 WHERE trim(s) <> '')) AS nd
  FROM d2
),
t3 AS (SELECT doc_id, str_split(trim(s), '  ') AS t FROM d2),
p3 AS (
  SELECT pair, cast(count(*) AS bigint) AS c
  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i + 1])) AS pair
        FROM t3)
  GROUP BY pair
),
b3 AS (SELECT pair, c FROM p3 ORDER BY c DESC, pair ASC LIMIT 1),
d3 AS (
  SELECT doc_id,
    regexp_replace(s,
      ' ' || replace((SELECT pair FROM b3), ' ', '  ') || ' ',
      ' ' || replace((SELECT pair FROM b3), ' ', '_') || ' ', 'g') AS s
  FROM d2
),
s3 AS (
  SELECT
    cast(sum(CASE WHEN trim(s) = '' THEN 0
             ELSE len(str_split(trim(s), '  ')) END) AS bigint) AS nt,
    (SELECT cast(count(DISTINCT tok) AS bigint)
     FROM (SELECT unnest(str_split(trim(s), '  ')) AS tok
           FROM d3 WHERE trim(s) <> '')) AS nd
  FROM d3
)
SELECT 1 AS round, (SELECT pair FROM b1) AS merged_pair, (SELECT c FROM b1) AS pair_count, (SELECT nt FROM s1) AS corpus_tokens_after, (SELECT nd FROM s1) AS distinct_tokens_after
UNION ALL
SELECT 2 AS round, (SELECT pair FROM b2) AS merged_pair, (SELECT c FROM b2) AS pair_count, (SELECT nt FROM s2) AS corpus_tokens_after, (SELECT nd FROM s2) AS distinct_tokens_after
UNION ALL
SELECT 3 AS round, (SELECT pair FROM b3) AS merged_pair, (SELECT c FROM b3) AS pair_count, (SELECT nt FROM s3) AS corpus_tokens_after, (SELECT nd FROM s3) AS distinct_tokens_after
"""

TFIDF_K = dataprep.TFIDF_TOP_K
TEXT_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, cast(count(*) AS bigint) AS tf
  FROM toks GROUP BY doc_id, token
),
df AS (
  SELECT token, cast(count(*) AS bigint) AS df FROM tf GROUP BY token
),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * (((SELECT count(*) FROM documents) + 1.0)
                  / (df.df + 1.0)) AS tfidf
  FROM tf JOIN df ON tf.token = df.token
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rk
  FROM scored
)
SELECT doc_id, token, tf, df, tfidf, rk FROM ranked WHERE rk <= {TFIDF_K}
"""

# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

_DOT = "list_dot_product(a.v, b.v)"
_NORM = "sqrt(list_dot_product({c}.v, {c}.v))"

SIMILARITY_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
),
q AS (SELECT * FROM v WHERE vec_id < {similarity.N_QUERIES}),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    round({_DOT} / ({_NORM.format(c='a')} * {_NORM.format(c='b')}), 6) AS cosine
  FROM q a CROSS JOIN v b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM sims
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {similarity.TOP_K}
"""


def _duck_plane(i: int) -> str:
    return (
        f"list_transform(generate_series(0, 63), "
        f"d -> (((({i} * 64 + d) * 2654435761) % 1000003) / 1000003.0 - 0.5))"
    )


_plane_sign = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_duck_plane(i)}) > 0 THEN {1 << i} ELSE 0 END)"
    for i in range(similarity.LSH_PLANES)
)

SIMILARITY_ANN_LSH_SQL = f"""
WITH v AS (
  SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, v, ({_plane_sign}) AS bucket FROM v
),
q AS (SELECT * FROM bucketed WHERE vec_id < {similarity.N_QUERIES}),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
    round({_DOT} / ({_NORM.format(c='a')} * {_NORM.format(c='b')}), 6) AS cosine
  FROM q a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM sims
)
SELECT query_id, neighbor_id, bucket, cosine, rk
FROM ranked WHERE rk <= {similarity.ANN_TOP_K}
"""

# the k-means fit, DuckDB dialect — same CTE chain as
# similarity._ivf_kmeans_ctes_spark (hash-seeded init, IVF_ITERS Lloyd
# iterations, 6-dp-rounded centroid means)
def _ivf_kmeans_ctes_duck() -> str:
    parts = [
        f"""seed AS (
  SELECT cast(row_number() OVER (ORDER BY (vec_id * {similarity.IVF_SEED_MULT}) % 1000003, vec_id) - 1 AS bigint) AS cent_id,
         v AS c
  FROM (SELECT vec_id, v FROM v ORDER BY (vec_id * {similarity.IVF_SEED_MULT}) % 1000003, vec_id LIMIT {similarity.IVF_CENTROIDS})
)""",
        "dims AS (SELECT unnest(generate_series(0, 63)) AS d)",
    ]
    prev = "seed"
    for it in range(similarity.IVF_ITERS):
        parts.append(f"""assign{it} AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, s.cent_id,
      row_number() OVER (PARTITION BY a.vec_id
                         ORDER BY round(list_dot_product(a.v, s.c)
                           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(s.c, s.c))), 6) DESC,
                         s.cent_id) AS crk
    FROM v a CROSS JOIN {prev} s
  ) WHERE crk = 1
)""")
        parts.append(f"""cent{it + 1} AS (
  SELECT cent_id, list(mx ORDER BY d) AS c
  FROM (
    SELECT cent_id, d, round(avg(v[d + 1]), 6) AS mx
    FROM assign{it} CROSS JOIN dims
    GROUP BY cent_id, d
  )
  GROUP BY cent_id
)""")
        prev = f"cent{it + 1}"
    return ",\n".join(parts)


SIMILARITY_ANN_IVF_SQL = f"""
WITH v AS (
  SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
),
{_ivf_kmeans_ctes_duck()},
scored AS (
  SELECT a.vec_id, a.v, s.cent_id,
    round(list_dot_product(a.v, s.c)
      / ({_NORM.format(c='a')} * sqrt(list_dot_product(s.c, s.c))), 6) AS ccos
  FROM v a CROSS JOIN cent{similarity.IVF_ITERS} s
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM scored
  ) WHERE crk = 1
),
probes AS (
  SELECT vec_id AS query_id, cent_id AS probe_cent FROM (
    SELECT vec_id, cent_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM scored WHERE vec_id < {similarity.N_QUERIES}
  ) WHERE crk <= {similarity.IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, x.vec_id AS neighbor_id, x.cent_id, qa.v AS qv, x.v AS nv
  FROM probes p
  JOIN assigned x ON x.cent_id = p.probe_cent
  JOIN assigned qa ON qa.vec_id = p.query_id
  WHERE x.vec_id <> p.query_id
),
sims AS (
  SELECT query_id, neighbor_id, cent_id,
    round(list_dot_product(qv, nv)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS cosine
  FROM cand
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM sims
)
SELECT query_id, neighbor_id, cent_id, cosine, rk
FROM ranked WHERE rk <= {similarity.ANN_TOP_K}
"""

# multi-band embedding near-dup mirror (operators/similarity.py
# _emb_dup_sql_spark): integer-arithmetic perturbed twins (no
# transcendentals — libm parity), L 8-plane bands, union of per-band
# bucket collisions, exact rounded-cosine verification. DuckDB's
# list_transform has no index parameter, so the perturbation maps over
# generate_series(0, 63) and indexes v (1-based) instead.
_PERTURB_DUCK = (
    f"list_transform(generate_series(0, 63), d -> v[d + 1] + {similarity.EMB_DUP_EPS} * "
    f"((((vec_id * 131 + d) * {similarity.EMB_DUP_MULT}) % 1000003) / 1000003.0 - 0.5))"
)

_emb_bucket_cols = ", ".join(
    "("
    + " + ".join(
        f"(CASE WHEN list_dot_product(v, {_duck_plane(b * similarity.LSH_PLANES + i)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(similarity.LSH_PLANES)
    )
    + f") AS bucket{b}"
    for b in range(similarity.EMB_DUP_BANDS)
)
_emb_long_union = "\n  UNION ALL\n".join(
    f"  SELECT vec_id, {b} AS band, bucket{b} AS bucket FROM sigs"
    for b in range(similarity.EMB_DUP_BANDS)
)

DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH base AS (
  SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
),
aug AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + {similarity.COSINE_DUP_OFFSET} AS vec_id, {_PERTURB_DUCK} AS v
  FROM base WHERE vec_id % {similarity.COSINE_DUP_EVERY} = 3
),
sigs AS (
  SELECT vec_id, {_emb_bucket_cols} FROM aug
),
bands_long AS (
{_emb_long_union}
),
cand AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, count(*) AS n_bands
  FROM bands_long a JOIN bands_long b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
pairs AS (
  SELECT c.doc_a, c.doc_b, c.n_bands,
    round({_DOT} / ({_NORM.format(c='a')} * {_NORM.format(c='b')}), 6) AS cosine
  FROM cand c JOIN aug a ON a.vec_id = c.doc_a JOIN aug b ON b.vec_id = c.doc_b
)
SELECT doc_a, doc_b, n_bands, cosine
FROM pairs WHERE cosine >= {similarity.COSINE_DUP_THRESHOLD}
"""

MULTIMODAL_METADATA_SQL = """
SELECT doc_id,
  CASE cast(doc_id % 3 AS int) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
  cast(octet_length(encode(coalesce(text, ''))) AS int)     AS n_bytes,
  sha256(coalesce(text, ''))                                AS payload_sha,
  cast(octet_length(encode(coalesce(text, ''))) % 640 + 1 AS int)      AS width,
  cast(octet_length(encode(coalesce(text, ''))) * 7 % 480 + 1 AS int)  AS height,
  cast(octet_length(encode(coalesce(text, ''))) % 30 + 1 AS int)       AS n_frames,
  true AS decode_ok
FROM documents
"""

# ---------------------------------------------------------------------------
# entity enrichment (N2) + A/B split (F4) — functions/entities.py mirrors
# ---------------------------------------------------------------------------

from dataflow_opinion_analysis_spark.functions import entities as _ent

_CAP_DUCK = """array_to_string(list_transform(string_split(coalesce(text, ''), ' '),
  w -> CASE WHEN (cast('0x' || substr(sha256(w), 1, 4) AS bigint) % 3) = 0
            THEN upper(substr(w, 1, 1)) || substr(w, 2) ELSE w END), ' ')"""

TEXT_ENTITIES_SQL = f"""
WITH cap AS (SELECT doc_id, {_CAP_DUCK} AS captext FROM documents),
phrases AS (
  SELECT doc_id, unnest(regexp_extract_all(captext, '{_ent.ENTITY_RE_SQL}')) AS phrase
  FROM cap
),
counts AS (SELECT doc_id, phrase, count(*) AS n FROM phrases GROUP BY doc_id, phrase),
tot AS (SELECT doc_id, cast(sum(n) AS bigint) AS total FROM counts GROUP BY doc_id),
ranked AS (
  SELECT c.doc_id, '{_ent.CNLP_TAG_PREFIX}' || c.phrase AS entity,
         round(c.n / cast(t.total AS double), 6) AS salience,
         row_number() OVER (PARTITION BY c.doc_id
                            ORDER BY c.n / cast(t.total AS double) DESC, c.phrase) AS entity_rank
  FROM counts c JOIN tot t ON t.doc_id = c.doc_id
)
SELECT doc_id, entity, salience, entity_rank
FROM ranked WHERE entity_rank <= {_ent.ENTITY_TOP_K}
"""

SPLIT_AB_SQL = f"""
SELECT doc_id,
  CASE WHEN (cast('0x' || substr(sha256(cast(doc_id AS varchar)), 1, 8) AS bigint) % {_ent.SPLIT_MOD}) < {int(_ent.SPLIT_MOD * 0.2)}
       THEN 'B' ELSE 'A' END AS branch
FROM documents
"""

# --- LLM training-data prep (operators/llmprep.py) ---
from dataflow_opinion_analysis_spark.operators import llmprep as _llm

# oracle uses the naive single global cumsum — O(N) one-reducer is fine
# in DuckDB at gate scale and provably equals the two-phase Spark plan
PACK_SEQUENCES_SQL = f"""
WITH base AS (
  SELECT doc_id,
         cast(ceil(length(coalesce(text, '')) / 4.0) AS bigint) + 1 AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtok
  FROM base
)
SELECT doc_id, n_tokens,
  cast(cumtok - n_tokens AS bigint)                           AS start_offset,
  cast((cumtok - n_tokens) // {_llm.PACK_CONTEXT_TOKENS} AS bigint) AS first_chunk,
  cast((cumtok - 1) // {_llm.PACK_CONTEXT_TOKENS} AS bigint)  AS last_chunk,
  cast((cumtok - 1) // {_llm.PACK_CONTEXT_TOKENS}
    - (cumtok - n_tokens) // {_llm.PACK_CONTEXT_TOKENS} + 1 AS bigint) AS n_chunks
FROM cum
"""

_DUCK_SAMPLE_U = (
    "(cast(('0x' || substr(sha256(cast(doc_id AS varchar) || "
    f"'{_llm.SAMPLE_SALT}'), 1, 8)) AS bigint) / 4294967296.0)"
)
SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, round({_DUCK_SAMPLE_U}, 6) AS sample_u
FROM documents
WHERE {_DUCK_SAMPLE_U} < {_llm.SAMPLE_FRACTION}
"""


def _duck_pii_sql() -> str:
    txt = _llm._pii_text_expr("duck")
    scrubbed = txt
    counts = []
    for name, pat, repl in _llm.PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({txt}, '{pat}')) AS n_{name}")
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{repl}', 'g')"
    return f"""
SELECT doc_id,
  {", ".join(counts)},
  length({scrubbed})    AS scrubbed_len,
  sha256({scrubbed})    AS scrubbed_hash
FROM documents
"""


PII_SCRUB_SQL = _duck_pii_sql()

# int8 symmetric quantization — DuckDB mirror of
# operators/similarity.embedding_quantize_int8 (raw double scale in the
# arithmetic: max/abs/divide are exact IEEE ops on both engines)
EMBEDDING_QUANTIZE_INT8_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale0 FROM v
),
s2 AS (
  SELECT vec_id, v, CASE WHEN scale0 = 0.0 THEN 1.0 ELSE scale0 END AS scale FROM s
)
SELECT vec_id,
  round(scale, 6) AS scale_r6,
  array_to_string(
    list_transform(v, x -> CAST(CAST(greatest(-127.0,
                                              least(127.0,
                                                    round(x / scale))) AS INTEGER) AS VARCHAR)),
    ',') AS q_str
FROM s2
"""



# product quantization — DuckDB mirror of
# operators/similarity.embedding_quantize_pq: the per-subspace k-means
# fit CTEs re-derived in DuckDB (same seed ordering, same 6-dp-rounded
# Lloyd means) and the same dot-decomposition squared-L2 assignment, so
# codes and reconstruction errors agree bit-for-bit after rounding.
def _pq_dist_duck(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}), 6)"
    )


def _pq_ctes_duck() -> str:
    m_last = similarity.PQ_M - 1
    parts = [
        f"""sub AS (
  SELECT vec_id, m, v[m * {similarity.PQ_SUB_DIM} + 1 : (m + 1) * {similarity.PQ_SUB_DIM}] AS s
  FROM v CROSS JOIN (SELECT unnest(generate_series(0, {m_last})) AS m)
)""",
        f"""seedvec AS (
  SELECT vec_id, cast(row_number() OVER (ORDER BY (vec_id * {similarity.IVF_SEED_MULT}) % 1000003, vec_id) - 1 AS bigint) AS code_id
  FROM (SELECT vec_id FROM v ORDER BY (vec_id * {similarity.IVF_SEED_MULT}) % 1000003, vec_id LIMIT {similarity.PQ_K})
)""",
        # named pseed (not seed): the composed IVF+PQ oracle runs this
        # helper in the same WITH chain as _ivf_kmeans_ctes_duck, which
        # already owns `seed`
        """pseed AS (
  SELECT b.m, sv.code_id, b.s AS c
  FROM seedvec sv JOIN sub b ON b.vec_id = sv.vec_id
)""",
        f"subdims AS (SELECT unnest(generate_series(0, {similarity.PQ_SUB_DIM - 1})) AS d)",
    ]
    prev = "pseed"
    for it in range(similarity.PQ_ITERS):
        parts.append(f"""passign{it} AS (
  SELECT vec_id, m, s, code_id FROM (
    SELECT a.vec_id, a.m, a.s, c.code_id,
      row_number() OVER (PARTITION BY a.vec_id, a.m
                         ORDER BY {_pq_dist_duck('a.s', 'c.c')}, c.code_id) AS crk
    FROM sub a JOIN {prev} c ON c.m = a.m
  ) WHERE crk = 1
)""")
        parts.append(f"""pcent{it + 1} AS (
  SELECT m, code_id, list(mx ORDER BY d) AS c
  FROM (
    SELECT m, code_id, d, round(avg(s[d + 1]), 6) AS mx
    FROM passign{it} CROSS JOIN subdims
    GROUP BY m, code_id, d
  )
  GROUP BY m, code_id
)""")
        prev = f"pcent{it + 1}"
    return ",\n".join(parts)


EMBEDDING_QUANTIZE_PQ_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_pq_ctes_duck()},
assigned AS (
  SELECT vec_id, m, code_id, dist FROM (
    SELECT a.vec_id, a.m, c.code_id, {_pq_dist_duck('a.s', 'c.c')} AS dist,
      row_number() OVER (PARTITION BY a.vec_id, a.m
                         ORDER BY {_pq_dist_duck('a.s', 'c.c')}, c.code_id) AS crk
    FROM sub a JOIN pcent{similarity.PQ_ITERS} c ON c.m = a.m
  ) WHERE crk = 1
)
SELECT vec_id,
  array_to_string(list(CAST(code_id AS VARCHAR) ORDER BY m), ',') AS codes_str,
  round(sum(dist), 6) AS recon_err_r6
FROM assigned
GROUP BY vec_id
"""

SIMILARITY_ANN_PQ_ADC_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_pq_ctes_duck()},
codes AS (
  SELECT vec_id, m, code_id FROM (
    SELECT a.vec_id, a.m, c.code_id,
      row_number() OVER (PARTITION BY a.vec_id, a.m
                         ORDER BY {_pq_dist_duck('a.s', 'c.c')}, c.code_id) AS crk
    FROM sub a JOIN pcent{similarity.PQ_ITERS} c ON c.m = a.m
  ) WHERE crk = 1
),
lut AS (
  SELECT q.vec_id AS query_id, c.m, c.code_id, {_pq_dist_duck('q.s', 'c.c')} AS d
  FROM sub q JOIN pcent{similarity.PQ_ITERS} c ON c.m = q.m
  WHERE q.vec_id < {similarity.N_QUERIES}
),
adc AS (
  SELECT l.query_id, x.vec_id AS neighbor_id, round(sum(l.d), 6) AS adc_dist
  FROM codes x
  JOIN lut l ON l.m = x.m AND l.code_id = x.code_id
  WHERE x.vec_id <> l.query_id
  GROUP BY l.query_id, x.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_dist, neighbor_id) AS rk
  FROM adc
)
SELECT query_id, neighbor_id, adc_dist, rk
FROM ranked WHERE rk <= {similarity.ANN_TOP_K}
"""

SIMILARITY_ANN_IVF_PQ_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_ivf_kmeans_ctes_duck()},
scored AS (
  SELECT a.vec_id, a.v, s.cent_id,
    round(list_dot_product(a.v, s.c)
      / ({_NORM.format(c='a')} * sqrt(list_dot_product(s.c, s.c))), 6) AS ccos
  FROM v a CROSS JOIN cent{similarity.IVF_ITERS} s
),
assigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM scored
  ) WHERE crk = 1
),
probes AS (
  SELECT vec_id AS query_id, cent_id AS probe_cent FROM (
    SELECT vec_id, cent_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM scored WHERE vec_id < {similarity.N_QUERIES}
  ) WHERE crk <= {similarity.IVF_NPROBE}
),
{_pq_ctes_duck()},
codes AS (
  SELECT vec_id, m, code_id FROM (
    SELECT a.vec_id, a.m, c.code_id,
      row_number() OVER (PARTITION BY a.vec_id, a.m
                         ORDER BY {_pq_dist_duck('a.s', 'c.c')}, c.code_id) AS crk
    FROM sub a JOIN pcent{similarity.PQ_ITERS} c ON c.m = a.m
  ) WHERE crk = 1
),
lut AS (
  SELECT q.vec_id AS query_id, c.m, c.code_id, {_pq_dist_duck('q.s', 'c.c')} AS d
  FROM sub q JOIN pcent{similarity.PQ_ITERS} c ON c.m = q.m
  WHERE q.vec_id < {similarity.N_QUERIES}
),
cand AS (
  SELECT p.query_id, x.vec_id AS neighbor_id, x.cent_id
  FROM probes p
  JOIN assigned x ON x.cent_id = p.probe_cent
  WHERE x.vec_id <> p.query_id
),
adc AS (
  SELECT c.query_id, c.neighbor_id, c.cent_id, round(sum(l.d), 6) AS adc_dist
  FROM cand c
  JOIN codes x ON x.vec_id = c.neighbor_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = x.m AND l.code_id = x.code_id
  GROUP BY c.query_id, c.neighbor_id, c.cent_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_dist, neighbor_id) AS rk
  FROM adc
)
SELECT query_id, neighbor_id, cent_id, adc_dist, rk
FROM ranked WHERE rk <= {similarity.ANN_TOP_K}
"""

# full-corpus fit+assign mirror for the STREAMING index writer
# (streaming/vector_index.py): the stream must converge to exactly this
# table because its model is frozen and assignment is per-vector
VECTOR_INDEX_STREAM_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_ivf_kmeans_ctes_duck()},
scored AS (
  SELECT a.vec_id, s.cent_id,
    round(list_dot_product(a.v, s.c)
      / ({_NORM.format(c='a')} * sqrt(list_dot_product(s.c, s.c))), 6) AS ccos
  FROM v a CROSS JOIN cent{similarity.IVF_ITERS} s
),
assigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT vec_id, cent_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM scored
  ) WHERE crk = 1
),
{_pq_ctes_duck()},
codes AS (
  SELECT vec_id, m, code_id FROM (
    SELECT a.vec_id, a.m, c.code_id,
      row_number() OVER (PARTITION BY a.vec_id, a.m
                         ORDER BY {_pq_dist_duck('a.s', 'c.c')}, c.code_id) AS crk
    FROM sub a JOIN pcent{similarity.PQ_ITERS} c ON c.m = a.m
  ) WHERE crk = 1
),
percode AS (
  SELECT vec_id,
    array_to_string(list(CAST(code_id AS VARCHAR) ORDER BY m), ',') AS codes_str
  FROM codes GROUP BY vec_id
)
SELECT a.vec_id, a.cent_id, p.codes_str
FROM assigned a JOIN percode p ON p.vec_id = a.vec_id
"""

# the composed pipeline: ONE DuckDB chain mirroring
# operators/dataprep_pipeline.build_dataprep stage for stage
# (quality+lang filter -> exact dedup -> MinHash near-dedup losers
# dropped -> PII scrub -> pack over scrubbed text)
_scrub_kept = _llm.scrub_chain_expr(
    "duck", _llm._pii_text_expr("duck")
)

DATAPREP_PIPELINE_SQL = f"""
WITH dbase AS (
  SELECT doc_id, lang, coalesce(text, '') AS text, {DUCK_TOKENS} AS toks
  FROM documents
),
q AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 10 AND length(text) >= 50
          AND len(list_filter(toks, t -> t IN ({_stop_list})))
              / cast(greatest(len(toks), 1) AS double) >= 0.01
         THEN 1 ELSE 0 END AS passes_quality
  FROM dbase
),
langwords(word, lang) AS (VALUES {_lang_values}),
votes AS (
  SELECT b.doc_id, l.lang, count(*) AS hits
  FROM (SELECT doc_id, unnest(toks) AS token FROM dbase) b
  JOIN langwords l ON l.word = b.token
  GROUP BY b.doc_id, l.lang
),
best AS (
  SELECT doc_id, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rk
  FROM votes
),
filtered AS (
  SELECT b.doc_id, b.lang, b.text
  FROM dbase b
  JOIN q ON q.doc_id = b.doc_id AND q.passes_quality = 1
  JOIN best p ON p.doc_id = b.doc_id AND p.rk = 1 AND p.pred_lang = 'en'
),
norm AS (
  SELECT doc_id, lang, text,
         sha256(trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g'))) AS norm_hash
  FROM filtered
),
exact AS (
  SELECT doc_id, lang, text
  FROM (SELECT *, min(doc_id) OVER (PARTITION BY norm_hash) AS canon FROM norm)
  WHERE doc_id = canon
),
{minhash_pairs_ctes_duck("exact")},
kept AS (
  SELECT e.* FROM exact e
  WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.doc_b = e.doc_id)
),
scrubbed AS (
  SELECT doc_id, lang, {_scrub_kept} AS text,
         sha256({_scrub_kept}) AS scrubbed_hash
  FROM kept
),
pbase AS (
  SELECT doc_id, lang, scrubbed_hash,
         cast(ceil(length(coalesce(text, '')) / 4.0) AS bigint) + 1 AS n_tokens
  FROM scrubbed
),
cum AS (
  SELECT *, sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtok
  FROM pbase
)
SELECT doc_id, lang, n_tokens,
  cast(cumtok - n_tokens AS bigint)                           AS start_offset,
  cast((cumtok - n_tokens) // {_llm.PACK_CONTEXT_TOKENS} AS bigint) AS first_chunk,
  cast((cumtok - 1) // {_llm.PACK_CONTEXT_TOKENS} AS bigint)  AS last_chunk,
  cast((cumtok - 1) // {_llm.PACK_CONTEXT_TOKENS}
    - (cumtok - n_tokens) // {_llm.PACK_CONTEXT_TOKENS} + 1 AS bigint) AS n_chunks,
  scrubbed_hash
FROM cum
"""

# DuckDB replay of operators/multimodal.multimodal_features: the corpus
# is ASCII so char codes == payload bytes; histogram / block-sum pooling /
# stride sampling replayed with integer-exact arithmetic (pooled values
# are SUMS, not means, precisely to avoid FP string formatting).
MULTIMODAL_FEATURES_SQL = """
WITH p AS (
  SELECT doc_id,
         (['image','audio','video'])[cast(doc_id % 3 + 1 AS int)] AS modality,
         coalesce(text, '') AS t
  FROM documents
),
cs AS (SELECT doc_id, length(t) AS n, string_split(t, '') AS chars FROM p),
codes AS (
  SELECT doc_id, n, u.i, ord(chars[u.i]) AS code
  FROM cs, unnest(generate_series(1, n)) AS u(i)
),
bins AS (SELECT unnest(generate_series(0, 7)) AS bin),
stats AS (
  SELECT doc_id, round(avg(code), 6) AS mean_byte FROM codes GROUP BY 1
),
hist_counts AS (
  SELECT doc_id, code // 32 AS bin, count(*) AS cnt FROM codes GROUP BY 1, 2
),
hist AS (
  SELECT p.doc_id,
         string_agg(cast(coalesce(hc.cnt, 0) AS varchar), ',' ORDER BY b.bin) AS hist_str
  FROM p CROSS JOIN bins b
  LEFT JOIN hist_counts hc ON hc.doc_id = p.doc_id AND hc.bin = b.bin
  GROUP BY p.doc_id
),
pool_sums AS (
  SELECT doc_id, ((i - 1) * 8) // n AS bucket, sum(code) AS s
  FROM codes GROUP BY 1, 2
),
pooled AS (
  SELECT p.doc_id,
         string_agg(cast(cast(coalesce(ps.s, 0) AS bigint) AS varchar), ',' ORDER BY b.bin) AS pooled_str
  FROM p CROSS JOIN bins b
  LEFT JOIN pool_sums ps ON ps.doc_id = p.doc_id AND ps.bucket = b.bin
  GROUP BY p.doc_id
),
sampled AS (
  SELECT doc_id, sha256(string_agg(chr(code), '' ORDER BY i)) AS sampled_sha
  FROM codes WHERE (i - 1) % 16 = 0 GROUP BY doc_id
)
SELECT p.doc_id, p.modality, cast(length(p.t) AS int) AS n_bytes,
  s.mean_byte AS mean_byte,
  h.hist_str AS hist_str,
  po.pooled_str AS pooled_str,
  coalesce(sa.sampled_sha, sha256('')) AS sampled_sha
FROM p
LEFT JOIN stats s ON s.doc_id = p.doc_id
LEFT JOIN hist h ON h.doc_id = p.doc_id
LEFT JOIN pooled po ON po.doc_id = p.doc_id
LEFT JOIN sampled sa ON sa.doc_id = p.doc_id
"""

# DuckDB verification of operators/multimodal.multimodal_decode: the
# Spark side builds REAL PPM/WAV/PPM-stream binaries and parses them back
# with real format parsers; the oracle recomputes every decoded feature by
# independent integer arithmetic over the same cyclic char-code stream
# (payload pixel/sample bytes are ord(substr(t, (i % len) + 1, 1)) by
# construction). n_bytes are the exact container sizes: 13-byte P6 header
# + 768 px = 781; stdlib wave's canonical 44-byte RIFF header + 1024 = 1068;
# 4 x (11-byte header + 192 px) = 812. Audio samples are (code - 64) * 256.
MULTIMODAL_DECODE_SQL = """
WITH p AS (
  SELECT doc_id,
         (['image','audio','video'])[cast(doc_id % 3 + 1 AS int)] AS modality,
         coalesce(nullif(text, ''), ' ') AS t,
         doc_id % 37 = 5 AS corrupted
  FROM documents
),
n AS (
  SELECT doc_id, modality, t, corrupted, length(t) AS len,
         CASE WHEN modality = 'audio' THEN 512 ELSE 768 END AS npix
  FROM p
),
codes AS (
  SELECT doc_id, ord(substr(t, cast(u.i % len AS int) + 1, 1)) AS code
  FROM n, unnest(generate_series(0, npix - 1)) AS u(i)
),
sums AS (SELECT doc_id, sum(code) AS s FROM codes GROUP BY doc_id)
SELECT n.doc_id, n.modality,
  NOT n.corrupted AS decode_ok,
  cast(CASE n.modality WHEN 'image' THEN 781 WHEN 'audio' THEN 1068
       ELSE 812 END AS int) AS n_bytes,
  cast(CASE WHEN n.corrupted THEN NULL WHEN n.modality = 'image' THEN 16
       WHEN n.modality = 'video' THEN 8 END AS int) AS width,
  cast(CASE WHEN n.corrupted THEN NULL WHEN n.modality = 'image' THEN 16
       WHEN n.modality = 'video' THEN 8 END AS int) AS height,
  cast(CASE WHEN n.corrupted THEN NULL WHEN n.modality = 'image' THEN 1
       WHEN n.modality = 'video' THEN 4 END AS int) AS n_frames,
  cast(CASE WHEN NOT n.corrupted AND n.modality = 'audio' THEN 8000
       END AS int) AS sample_rate,
  cast(CASE WHEN NOT n.corrupted AND n.modality = 'audio' THEN 512
       END AS int) AS n_samples,
  cast(CASE WHEN NOT n.corrupted AND n.modality = 'audio'
       THEN cast(512 AS double) * 1000 / 8000 END AS double) AS duration_ms,
  cast(CASE WHEN n.corrupted THEN NULL
       WHEN n.modality = 'audio' THEN (s.s - 512 * 64) * 256
       ELSE s.s END AS bigint) AS sum_val
FROM n JOIN sums s ON s.doc_id = n.doc_id
"""

# Independent mirror of operators/components.dedup_cluster_cc: the same
# MinHash pair graph, components by recursive-CTE reachability (rep =
# min reachable id; fine at oracle scale — the Spark side uses the
# O(log n)-round large-star/small-star algorithm instead, since a
# recursive self-join is unbounded at 100 TB).
DEDUP_CLUSTER_CC_SQL = f"""
WITH RECURSIVE {minhash_pairs_ctes_duck()},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
),
comp AS (SELECT u AS doc_id, min(r) AS rep_id FROM reach GROUP BY u),
sz AS (SELECT rep_id, count(*) AS cluster_size FROM comp GROUP BY rep_id)
SELECT c.doc_id, c.rep_id, s.cluster_size, (c.doc_id = c.rep_id) AS is_canonical
FROM comp c JOIN sz s USING (rep_id)
"""

DATAPREP_ORACLES: dict[str, str] = {
    "dataprep_pipeline": DATAPREP_PIPELINE_SQL,
    "dedup_cluster_cc": DEDUP_CLUSTER_CC_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_LSH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "text_token_count": TEXT_TOKEN_COUNT_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "text_tfidf_keywords": TEXT_TFIDF_SQL,
    "text_hashed_classifier": TEXT_HASHED_CLASSIFIER_SQL,
    "text_entities": TEXT_ENTITIES_SQL,
    "split_ab": SPLIT_AB_SQL,
    "similarity_topk_bruteforce": SIMILARITY_TOPK_SQL,
    "similarity_ann_lsh": SIMILARITY_ANN_LSH_SQL,
    "dedup_embedding_cosine": DEDUP_EMBEDDING_COSINE_SQL,
    "similarity_ann_ivf": SIMILARITY_ANN_IVF_SQL,
    "multimodal_metadata": MULTIMODAL_METADATA_SQL,
    "embedding_quantize_int8": EMBEDDING_QUANTIZE_INT8_SQL,
    "embedding_quantize_pq": EMBEDDING_QUANTIZE_PQ_SQL,
    "similarity_ann_pq_adc": SIMILARITY_ANN_PQ_ADC_SQL,
    "similarity_ann_ivf_pq": SIMILARITY_ANN_IVF_PQ_SQL,
    "vector_index_stream": VECTOR_INDEX_STREAM_SQL,
    "text_bm25_topk": TEXT_BM25_SQL,
    "text_bpe_merges": TEXT_BPE_MERGES_SQL,
}
