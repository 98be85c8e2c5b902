"""End-to-end equivalence: Spark indexer pipeline vs the DuckDB oracle SQL
(the same comparison the driver's correctness gate performs)."""

from __future__ import annotations

from dataflow_opinion_analysis_spark import entry_queries
from tests.conftest import SF_DIR, assert_frames_match


def _check(spark, duck, name):
    fn, sql = entry_queries.registry()[name]
    sdf = fn(spark, SF_DIR)
    pdf = duck.execute(sql).df()
    assert_frames_match(sdf, pdf)


def test_indexer_document(spark, duck):
    _check(spark, duck, "indexer_document")


def test_indexer_sentiment(spark, duck):
    _check(spark, duck, "indexer_sentiment")


def test_indexer_webresource(spark, duck):
    _check(spark, duck, "indexer_webresource")


def test_labelled_positions_slice_the_passage(spark):
    """LabelledPositions is real data, not a stub: for every sentiment
    row, doc_text[start:end] == passage text ([start, end) 0-based, first
    occurrence). Reference carries passage positions in its sentiment
    schema (bigquery/sentimentSchema.json, IndexerPipeline.java:743-784)."""
    from pyspark.sql import functions as F

    from dataflow_opinion_analysis_spark.plans.indexer import build_indexer
    from dataflow_opinion_analysis_spark.sources.transcripts import derive_transcripts

    out = build_indexer(derive_transcripts(spark, SF_DIR), persist=True)
    joined = out.sentiment.alias("s").join(
        out.document.select("DocumentHash", F.col("Text").alias("DocText")),
        "DocumentHash",
    )
    rows = joined.select("LabelledPositions", "Text", "DocText").collect()
    assert rows and all(r.LabelledPositions for r in rows)
    for r in rows:
        start, end = map(int, r.LabelledPositions.split(":"))
        assert r.DocText[start:end] == r.Text, (start, end, r.Text[:50])
