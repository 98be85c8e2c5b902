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
