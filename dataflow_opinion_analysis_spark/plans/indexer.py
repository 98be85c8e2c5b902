"""The indexer pipeline — Spark translation of createIndexerPipeline
(IndexerPipeline.java:127-258), phases in the same cost-ordered sequence
the reference uses (comments at :226-230): cheap exact dedupe BEFORE the
expensive NLP stage, soft dedupe AFTER it (needs tags).

One builder serves batch (``spark.read``) and streaming (``readStream`` +
``foreachBatch`` in streaming/pipeline.py): the transformations are
identical, only source/sink differ.

Plan shape (what .explain should show):
  parquet scan (pruned cols) -> codegen projections/hash derivations
  -> single exchange on conv_id (lag window; reused by dedupe sort)
  -> exchange on content_hash (exact dedupe window)
  -> Arrow pandas stages (tags, passages)
  -> exchange on (soft_title, len_bucket) (soft dedupe applyInPandas)
  -> broadcast joins of the small verdict frame back onto winners
  -> per-table selects.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_opinion_analysis_spark.functions import scorer, tags_sql
from dataflow_opinion_analysis_spark.operators import dedupe, fanout, ingest


@dataclass
class IndexerOutputs:
    webresource: DataFrame
    document: DataFrame
    sentiment: DataFrame
    # diagnostics
    input_content: DataFrame
    winners: DataFrame


def build_indexer(
    transcripts: DataFrame,
    processing_time: str = "2024-02-01 00:00:00",
    soft_dedupe_enabled: bool = True,
    persist: bool = False,
) -> IndexerOutputs:
    ic = ingest.derive_input_content(transcripts, processing_time)
    to_index, skipped = ingest.split_skip_indexing(ic)
    winners, exact_dupes = dedupe.exact_dedupe(to_index)
    if persist:
        winners = winners.persist()

    doc_keyed = winners.select(
        F.col("expected_document_hash").alias("document_hash"),
        "conv_id",
        "turn_idx",
        "text",
    )
    # tags on the JVM fast path (functions/tags_sql.py); the Arrow UDF in
    # functions/scorer.py is the reference implementation (tests assert
    # equivalence). Passages stay an Arrow UDF — the NLP stage proper.
    tags = tags_sql.extract_tags(doc_keyed)
    passages = doc_keyed.mapInPandas(scorer.score_passages_map, scorer.PASSAGE_SCHEMA)
    if persist:
        tags = tags.persist()

    if soft_dedupe_enabled:
        # verdict chain sees only NARROW columns (hash, keys, title,
        # text_len, tag names) — the wide text column never enters the
        # dedupe shuffles
        verdict_input = winners.select(
            "expected_document_hash",
            "conv_id",
            "turn_idx",
            "title",
            F.length("text").alias("text_len"),
        ).join(
            tags.select(
                F.col("document_hash").alias("expected_document_hash"), "tag_names"
            ),
            "expected_document_hash",
            "left",
        )
        verdict = dedupe.soft_dedupe(verdict_input)
        if persist:
            verdict = verdict.persist()
        keep = verdict.filter(~F.col("is_dupe")).select("document_hash")
        repoint = verdict.filter(F.col("is_dupe")).select(
            "document_hash", "winner_document_hash"
        )
        soft_winners = winners.join(
            keep.withColumnRenamed("document_hash", "expected_document_hash"),
            "expected_document_hash",
            "left_semi",
        )
        soft_dupes = winners.join(
            repoint.withColumnRenamed("document_hash", "expected_document_hash"),
            "expected_document_hash",
            "inner",
        )
        if persist:
            soft_winners = soft_winners.persist()
    else:
        soft_winners = winners
        soft_dupes = None

    tags_for_docs = tags.select(
        F.col("document_hash").alias("expected_document_hash"), "Tags"
    )
    document = fanout.document_rows(
        soft_winners.join(tags_for_docs, "expected_document_hash", "left")
    )
    sentiment = fanout.sentiment_rows(
        passages.join(
            soft_winners.select(
                F.col("expected_document_hash").alias("document_hash")
            ),
            "document_hash",
            "left_semi",
        ),
        soft_winners,
        tags,
    )

    wr_parts = [
        fanout.webresource_rows(soft_winners),
        fanout.webresource_rows(exact_dupes, "winner_document_hash"),
        fanout.webresource_rows(skipped),
    ]
    if soft_dupes is not None:
        wr_parts.append(fanout.webresource_rows(soft_dupes, "winner_document_hash"))
    webresource = wr_parts[0]
    for p in wr_parts[1:]:
        webresource = webresource.unionByName(p)

    return IndexerOutputs(
        webresource=webresource,
        document=document,
        sentiment=sentiment,
        input_content=ic,
        winners=winners,
    )
