"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The engine lives in ``dataflow_opinion_analysis_spark/``; this module is
a thin registry façade over ``entry_queries.registry()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataflow_opinion_analysis_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full indexer pipeline on sf0.001 transcripts, then the
    reference's manual verification query (README.md:249-260 — sentiment
    joined to document, positive passages first)."""
    from pyspark.sql import functions as F

    from dataflow_opinion_analysis_spark.plans.indexer import build_indexer
    from dataflow_opinion_analysis_spark.sources.transcripts import derive_transcripts

    t = derive_transcripts(spark, "/root/testdata/sf0.001")
    out = build_indexer(t)
    s = out.sentiment.alias("s")
    d = out.document.alias("d")
    return (
        s.join(d, "DocumentHash")
        .filter(F.col("s.SentimentTotalScore") > 0)
        .select(
            F.col("DocumentHash"),
            F.col("s.Text").alias("PassageText"),
            F.col("s.SentimentTotalScore").alias("SentimentTotalScore"),
            F.col("s.DominantValence").alias("DominantValence"),
            F.col("d.CollectionItemId").alias("CollectionItemId"),
        )
        .orderBy(F.desc("SentimentTotalScore"), "DocumentHash")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in entry_queries.registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops)."""
    return {
        name: sql
        for name, (_, sql) in entry_queries.registry().items()
        if sql is not None
    }
