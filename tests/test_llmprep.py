"""Semantic and plan-shape checks for the LLM-prep operators
(operators/llmprep.py). Oracle equality is covered by
test_registry_oracle.py; these assert the invariants the oracle can't
express: packing contiguity, sampling scale properties, scrub
effectiveness, and the scale-critical plan shapes (shuffle-free
sampling, no full-table single-partition window in packing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_opinion_analysis_spark.operators import llmprep
from tests.conftest import SF_DIR


def test_pack_sequences_contiguous(spark):
    df = llmprep.pack_sequences(spark, SF_DIR).orderBy("doc_id").collect()
    assert df[0].start_offset == 0
    for prev, cur in zip(df, df[1:]):
        # concatenate-and-chunk: every document starts exactly where the
        # previous one ended — the global prefix sum has no gaps/overlaps
        assert cur.start_offset == prev.start_offset + prev.n_tokens
    for r in df:
        assert r.first_chunk == r.start_offset // llmprep.PACK_CONTEXT_TOKENS
        assert r.n_chunks == r.last_chunk - r.first_chunk + 1 >= 1


def test_pack_sequences_no_global_window(spark):
    """The scale contract: the only single-partition window runs over the
    bucket-totals frame (one row per PACK_RANGE bucket), never the full
    documents scan. Detectable in the plan: every full-table window must
    carry a partition spec."""
    plan = llmprep.pack_sequences(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split(",")[0].strip()
        # partition-less window: spec starts with the ORDER BY column
        # directly followed by sort direction — allowed only for the
        # tiny bucket frame (its ordering column is `bucket`)
        if " ASC" in head or " DESC" in head:
            assert "bucket" in head, f"global window over non-bucket frame: {spec}"


def test_sample_stratified_shuffle_free(spark):
    df = llmprep.sample_stratified(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "hash-threshold sampling must not shuffle"
    rows = df.collect()
    n_total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rate = len(rows) / n_total
    assert abs(rate - llmprep.SAMPLE_FRACTION) < 0.1
    assert all(r.sample_u < llmprep.SAMPLE_FRACTION for r in rows)
    # determinism: same keep set on a re-run
    again = {r.doc_id for r in llmprep.sample_stratified(spark, SF_DIR).collect()}
    assert {r.doc_id for r in rows} == again


def test_pii_scrub_redacts_every_category(spark):
    rows = llmprep.pii_scrub(spark, SF_DIR).collect()
    tot = {k: sum(getattr(r, f"n_{k}") for r in rows)
           for k, _, _ in llmprep.PII_PATTERNS}
    # injection covers every category
    for k, n in tot.items():
        assert n > 0, f"no {k} matches — injection broken"
    # scrubbed text never contains a raw injected marker
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    joined = docs.join(
        llmprep.pii_scrub(spark, SF_DIR), "doc_id"
    ).select("doc_id", "n_email", "scrubbed_hash", "text")
    # any doc with an email match must hash differently from its raw
    # pii-bearing text (the replacement actually happened)
    sql_txt = llmprep._pii_text_expr("spark")
    raw = docs.selectExpr("doc_id", f"sha2({sql_txt}, 256) AS raw_hash")
    cmp = joined.join(raw, "doc_id").filter(F.col("n_email") > 0)
    changed = cmp.filter(F.col("scrubbed_hash") != F.col("raw_hash")).count()
    assert changed == cmp.count() > 0
