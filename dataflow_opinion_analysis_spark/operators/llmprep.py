"""LLM training-data preparation operators over the `documents` table:
sequence packing (context-window chunking), stratified sampling, and
PII scrubbing. All pure Catalyst SQL — no Python in the hot path.

These extend the reference's operator surface (it has no training-data
stage at all) with the operations a 100-TB pretraining pipeline needs
between dedup and tokenization.

Scale notes (100 TB):
- `pack_sequences` needs a GLOBAL prefix sum over a total document
  order — the naive formulation is a partition-less window (every row
  to one reducer, the classic scale-killer). Implemented instead as the
  two-phase distributed prefix sum: per-bucket cumulative sums run in
  parallel (window partitioned by a range bucket of the sort key), the
  per-bucket totals — one row per bucket — are prefix-summed in a tiny
  single-partition window, and the bucket base offsets broadcast-join
  back. Wall-clock is one narrow pass + one broadcast join regardless
  of corpus size; only the bucket-count-sized frame is ever single-
  partition. On arbitrary keys use `repartitionByRange` + the same
  construction; here doc ids are dense so `doc_id div RANGE` is the
  range bucket.
- `sample_stratified` is SHUFFLE-FREE: the keep decision is a pure
  per-row hash threshold (sha256 of the doc id, first 8 hex digits as
  a uniform in [0,1)), so sampling 100 TB is a narrow filter with
  exact reproducibility. Per-stratum rank-based exact-count sampling
  would put each stratum through one reducer (skew on the dominant
  language); the hash-threshold form trades exact per-stratum counts
  (it concentrates to the target fraction by LLN) for a plan with no
  exchange at all.
- `pii_scrub` is a chain of JVM-side regexp_replace calls inside one
  whole-stage-codegen projection: narrow, no shuffle, no Python.

Oracle parity notes: regex patterns avoid backtracking-only constructs
(no lookaround/backrefs) so Java regex and DuckDB's RE2 agree; Spark
SQL string literals process backslash escapes while DuckDB's do not,
so patterns are doubled only on the Spark side (`_sp`). The synthetic
corpus contains no natural PII, so `pii_scrub` deterministically
injects PII snippets keyed by sha256(doc_id) — the same injection
expression runs in both engines (the established twin-injection
pattern, cf. operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataflow_opinion_analysis_spark.operators.dataprep import _docs

# context window size (tokens) for sequence packing; subword estimate is
# the repo-standard ceil(chars/4) plus one EOS token per document
PACK_CONTEXT_TOKENS = 2048
# range-bucket width over the dense doc_id sort key (two-phase prefix sum)
PACK_RANGE = 64

SAMPLE_FRACTION = 0.25
SAMPLE_SALT = "|smpl"

# category -> (pattern, replacement); applied in this order, each on the
# output of the previous. Counts are per-category matches in the ORIGINAL
# text; patterns are kept disjoint on the injected corpus (phone requires
# a leading '+', so an SSN never double-counts), and the scrub chain is
# order-resolved for any residual overlap.
PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d -]{7,}\d", "<PHONE>"),
]

# deterministic PII injection: v = first-8-hex-digits of sha256(doc_id),
# v % 4 selects the snippet (3 -> clean doc). Literals chosen so every
# category appears in the corpus.
PII_SNIPPETS = [
    " contact alice@example.com or bob.smith@mail.example.org",
    " call +1 555-0100 2345 about ssn 123-45-6789",
    " host 192.168.10.25 card 4111-1111-1111-1111",
    "",
]


def _spark_hash_u(expr: str) -> str:
    return f"conv(substr(sha2({expr}, 256), 1, 8), 16, 10)"


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing (GPT-style pretraining):
    documents are laid end to end in doc_id order (1 EOS token each) and
    split into PACK_CONTEXT_TOKENS-token context windows; each document
    reports its global token offset and the chunk range it lands in.
    Two-phase distributed prefix sum — see module docstring."""
    _docs(spark, sf_dir)
    return spark.sql(pack_sql_spark())


def pack_sql_spark(rel: str = "documents", carry_cols: tuple[str, ...] = ()) -> str:
    """Two-phase-prefix-sum packing SQL over relation ``rel``;
    ``carry_cols`` ride through unchanged (the composed dataprep pipeline
    carries lang + scrubbed_hash onto the packed output)."""
    c = PACK_CONTEXT_TOKENS
    carry_base = "".join(f", {col}" for col in carry_cols)
    carry_out = "".join(f", i.{col}" for col in carry_cols)
    return f"""
WITH base AS (
  SELECT doc_id, doc_id div {PACK_RANGE} AS bucket,
         cast(ceil(length(coalesce(text, '')) / 4.0) AS bigint) + 1 AS n_tokens{carry_base}
  FROM {rel}
),
inb AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_in_bucket
  FROM base
),
btot AS (SELECT bucket, sum(n_tokens) AS btokens FROM base GROUP BY bucket),
boff AS (
  SELECT bucket,
         coalesce(sum(btokens) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS bucket_offset
  FROM btot
)
SELECT /*+ BROADCAST(b) */
  i.doc_id, i.n_tokens,
  b.bucket_offset + i.cum_in_bucket - i.n_tokens          AS start_offset,
  (b.bucket_offset + i.cum_in_bucket - i.n_tokens) div {c} AS first_chunk,
  (b.bucket_offset + i.cum_in_bucket - 1) div {c}          AS last_chunk,
  (b.bucket_offset + i.cum_in_bucket - 1) div {c}
    - (b.bucket_offset + i.cum_in_bucket - i.n_tokens) div {c} + 1 AS n_chunks{carry_out}
FROM inb i JOIN boff b ON b.bucket = i.bucket
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-threshold sampling, reported per stratum
    (language): keep doc iff u = sha256(doc_id+salt)[:8]/16^8 < fraction.
    Shuffle-free keep decision; the gate output is the sampled rows with
    their uniforms, so the oracle verifies the exact kept set."""
    _docs(spark, sf_dir)
    key = f"concat(cast(doc_id AS string), '{SAMPLE_SALT}')"
    # divide by a DOUBLE: a bare `4294967296.0` literal is DECIMAL in
    # Spark SQL, which would type sample_u (and its 6-dp round) as
    # DECIMAL instead of DOUBLE — DuckDB's is DOUBLE
    u = f"(cast({_spark_hash_u(key)} AS bigint) / cast(4294967296 AS double))"
    return spark.sql(
        f"""
SELECT doc_id, lang, round({u}, 6) AS sample_u
FROM documents
WHERE {u} < {SAMPLE_FRACTION}
"""
    )


def _pii_text_expr(dialect: str) -> str:
    """The PII-bearing text column: original text plus the deterministic
    injected snippet selected by sha256(doc_id) % 4."""
    if dialect == "spark":
        v = f"cast({_spark_hash_u('cast(doc_id AS string)')} AS bigint)"
    else:
        v = "cast(('0x' || substr(sha256(cast(doc_id AS varchar)), 1, 8)) AS bigint)"
    whens = "".join(
        f" WHEN {i} THEN '{s}'" for i, s in enumerate(PII_SNIPPETS[:-1])
    )
    return (
        f"coalesce(text, '') || CASE {v} % 4{whens} ELSE '' END"
    )


def scrub_chain_expr(dialect: str, txt: str | None = None) -> str:
    """The full PII replacement chain (PII_PATTERNS order) applied to the
    injected text expression — shared by pii_scrub and the composed
    dataprep pipeline, in both dialects."""
    if txt is None:
        txt = _pii_text_expr(dialect)
    for _name, pat, repl in PII_PATTERNS:
        if dialect == "spark":
            txt = f"regexp_replace({txt}, '{pat.replace(chr(92), chr(92) * 2)}', '{repl}')"
        else:
            txt = f"regexp_replace({txt}, '{pat}', '{repl}', 'g')"
    return txt


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction: per-category match counts on the original
    text and a sha256 of the fully scrubbed text (replacement chain in
    PII_PATTERNS order). One codegen projection, no shuffle."""
    _docs(spark, sf_dir)
    txt = _pii_text_expr("spark")
    scrubbed = scrub_chain_expr("spark")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        sp = pat.replace("\\", "\\\\")
        counts.append(
            f"size(regexp_extract_all({txt}, '{sp}', 0)) AS n_{name}"
        )
    return spark.sql(
        f"""
SELECT doc_id,
  {", ".join(counts)},
  length({scrubbed})        AS scrubbed_len,
  sha2({scrubbed}, 256)     AS scrubbed_hash
FROM documents
"""
    )
