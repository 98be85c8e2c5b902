"""Cross-micro-batch near-dup detection via the MinHash keyed state
operator (streaming/dedupe_state.py)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from dataflow_opinion_analysis_spark.streaming.dedupe_state import (
    JACCARD_THRESHOLD,
    minhash_signature,
    stateful_near_dedupe,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some tasty food for the winter"
)


def test_minhash_signature_properties():
    s1 = minhash_signature(BASE)
    s2 = minhash_signature(BASE)
    assert (s1 == s2).all(), "deterministic"
    near = minhash_signature(BASE + " via feed")
    est = (s1 == near).mean()
    assert est >= JACCARD_THRESHOLD, f"near-dup est {est}"
    other = minhash_signature("completely different content about spark sql engines and shuffles here")
    assert (s1 == other).mean() < JACCARD_THRESHOLD


def test_stateful_near_dedupe_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "document_hash string, title string, text string, ts timestamp"

    def write(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    t0 = datetime.datetime(2024, 1, 1)
    # batch 1: original doc
    write([("d1", None, BASE, t0)], "f1")

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    verdicts = stateful_near_dedupe(stream)
    out = str(tmp_path / "out")
    q = (
        verdicts.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    # batch 2 (separate micro-batch): a near-dup and an unrelated doc
    write(
        [
            ("d2", None, BASE + " via feed", t0),
            ("d3", None, "unrelated text about catalyst optimizer rules and codegen stages in spark", t0),
        ],
        "f2",
    )
    q.processAllAvailable()
    q.stop()

    res = {r.document_hash: r for r in spark.read.parquet(out).collect()}
    assert not res["d1"].is_dupe
    assert res["d2"].is_dupe and res["d2"].winner_document_hash == "d1", (
        "near-dup in a LATER micro-batch must match the stored fingerprint"
    )
    assert not res["d3"].is_dupe
