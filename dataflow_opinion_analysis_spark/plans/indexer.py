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
  -> exchange on content_hash (exact dedupe window) -> checkpointed winners
  -> Arrow pandas stages (tags, passages)
  -> soft-dedupe verdict: hash aggregates over (soft_title, len_bucket)
     with the per-group side inputs PINNED as broadcasts (the soft key is
     hot — 'No Title' holds most of the corpus — so a shuffled join there
     would serialize into one giant partition)
  -> ONE wide join of winners x verdict (the text-carrying side shuffles
     at most once), then per-table selects.

Driver-time note: persisted stages are EAGER localCheckpoints (_pin) —
without lineage truncation, AQE re-optimizes the full deep DAG at every
stage boundary and instrumentation showed 37% of job wall as driver-idle
planning gaps.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_opinion_analysis_spark.functions import scorer, tags_sql
from dataflow_opinion_analysis_spark.operators import dedupe, fanout, hints, ingest


def _pin(df: DataFrame, persist: bool) -> DataFrame:
    """Eager localCheckpoint where the old code persisted: holds the data
    like persist() AND truncates the logical plan. Instrumentation showed
    37% of the job wall was driver-idle time — AQE re-optimizes the plan
    at every shuffle-stage boundary, and on the deep un-truncated indexer
    DAG that re-planning (plus broadcast planning) serializes the job
    between stages. Checkpointed leaves make every downstream plan
    shallow, the same fix plans/stats.py applies to the chained stats
    views."""
    return df.localCheckpoint(eager=True) if persist else df


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
    return build_indexer_from_input_content(ic, soft_dedupe_enabled, persist)


def build_indexer_from_input_content(
    ic: DataFrame,
    soft_dedupe_enabled: bool = True,
    persist: bool = False,
) -> IndexerOutputs:
    """The pipeline from the InputContent stage on — shared by the
    transcripts path (build_indexer) and the file/CSV/JSON/JDBC connectors
    (sources/files.py + ingest.input_content_from_parsed), mirroring how
    every reference source funnels into one indexing DAG
    (IndexerPipeline.java:127-258)."""
    to_index, skipped = ingest.split_skip_indexing(ic)
    winners, exact_dupes = dedupe.exact_dedupe(to_index)
    winners = _pin(winners, persist)

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

    # join tags into winners ONCE and carry (Tags, tag_names) through the
    # rest of the DAG: the verdict input, the document fan-out and the
    # sentiment fan-out all project from this frame instead of each
    # re-joining the doc-sized tags relation — 3 fewer doc-sized joins
    # (= 3 fewer serial driver-side broadcast builds in local mode, 3
    # fewer shuffles on a cluster)
    winners = _pin(
        winners.join(
            tags.select(
                F.col("document_hash").alias("expected_document_hash"),
                "tag_names",
                "Tags",
            ).transform(hints.big),
            "expected_document_hash",
            "left",
        ),
        persist,
    )

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
            "tag_names",
        )
        verdict = _pin(dedupe.soft_dedupe(verdict_input), persist)
        # ONE join of the wide winners frame against the whole verdict,
        # then filter both ways — a keep/repoint double join-back would
        # shuffle the wide (text-carrying) winners twice
        routed = winners.join(
            verdict.select(
                F.col("document_hash").alias("expected_document_hash"),
                "is_dupe",
                "winner_document_hash",
            ).transform(hints.big),
            "expected_document_hash",
            "left",
        )
        soft_winners = routed.filter(
            ~F.coalesce(F.col("is_dupe"), F.lit(False))
        ).drop("is_dupe", "winner_document_hash")
        soft_dupes = routed.filter(F.col("is_dupe")).drop("is_dupe")
        soft_winners = _pin(soft_winners, persist)
    else:
        soft_winners = winners
        soft_dupes = None

    document = fanout.document_rows(soft_winners)
    sentiment = fanout.sentiment_rows(passages, soft_winners)

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
