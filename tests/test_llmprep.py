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


def test_dataprep_pipeline_stage_composition(spark):
    """The composed pipeline (round-4 verdict item 3): stage order and row
    accounting. Each stage consumes the previous stage's survivors —
    counts are monotone non-increasing through the drop stages, the scrub
    stage is exactly 1:1, the packed output covers exactly the kept docs,
    and every stage actually dropped/changed something on this corpus so
    the composition is exercised end to end (not vacuously)."""
    from dataflow_opinion_analysis_spark.operators.dataprep_pipeline import (
        build_dataprep,
        dataprep_stage_counts,
    )

    counts = dataprep_stage_counts(spark, SF_DIR)
    assert list(counts) == [
        "input", "quality_lang", "exact_dedup", "near_dedup", "pii_scrub", "pack",
    ]
    assert counts["input"] >= counts["quality_lang"] >= counts["exact_dedup"] \
        >= counts["near_dedup"]
    assert counts["pii_scrub"] == counts["near_dedup"]  # scrub drops nothing
    assert counts["pack"] == counts["pii_scrub"]        # pack is per-doc
    # non-vacuous: the language filter really filters (corpus is ~44% en)
    assert counts["quality_lang"] < counts["input"]

    # the kept set is exactly (filtered ∩ exact-canonical) minus near-dup
    # losers — recomputed independently from the standalone operators
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    st = build_dataprep(spark, docs)
    kept_ids = {r.doc_id for r in st.kept.select("doc_id").collect()}
    packed_ids = {r.doc_id for r in st.packed.select("doc_id").collect()}
    assert packed_ids == kept_ids
    filt_ids = {r.doc_id for r in st.filtered.select("doc_id").collect()}
    assert kept_ids <= filt_ids

    # scrubbed text drives packing: every packed doc's token count matches
    # ceil(len(scrubbed)/4) + 1
    joined = st.packed.join(
        st.scrubbed.select("doc_id", F.length("text").alias("slen")), "doc_id"
    )
    bad = joined.where(
        F.col("n_tokens") != (F.ceil(F.col("slen") / 4.0) + 1).cast("long")
    ).count()
    assert bad == 0


def test_cli_dataprep_end_to_end(spark, tmp_path, monkeypatch):
    """`cli dataprep` writes the packed table and reports stage counts."""
    import json

    from dataflow_opinion_analysis_spark import cli
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    out = str(tmp_path / "packed")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([
            "dataprep", "--input", f"{SF_DIR}/documents.parquet", "--output", out,
        ])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    got = spark.read.parquet(out)
    assert got.count() == rep["stages"]["pack"] > 0
    assert rep["stages"]["input"] >= rep["stages"]["pack"]
    assert set(got.columns) >= {
        "doc_id", "lang", "n_tokens", "start_offset", "first_chunk",
        "last_chunk", "n_chunks", "scrubbed_hash",
    }
