"""The transcripts input table: loaders + a deterministic derivation.

Production shape (BASELINE.json input_hint):

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Two ways to obtain it here:

1. ``derive_transcripts(spark, sf_dir)`` — a *dialect-neutral SQL*
   derivation from the driver-provided ``documents`` parquet table.  The
   exact same SQL string runs on DuckDB (the correctness oracle), so the
   driver's oracle gate can verify transcript-pipeline queries end to end.
   Deterministic: pure arithmetic on ``doc_id``; duplicate + near-duplicate
   texts are injected via a self-join on ``doc_id - 1`` (an equi-join, not a
   global-order window, so it scales).

2. ``dataflow_opinion_analysis_spark.datagen`` — a seeded numpy generator
   for arbitrary-scale bench/stress data (Zipf-skewed conversation sizes,
   out-of-order and late turns), written to parquet.

Reference correspondence (SURVEY.md §1.5): turn 0 is the "post" (Reddit
post <-> title), turns >= 1 are comments whose parent is the previous turn
(IndexerPipeline.java:540-607 reconstructs exactly this thread shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Dialect-neutral SQL (verified to parse & agree on Spark 4.1 and DuckDB 1.x):
#   printf, floor, %, ||, CASE, n * INTERVAL '1' SECOND, lpad, coalesce.
# {documents} is the relation name of the documents table/view.
#
# Layout: 8 dense turns per conversation; conv k starts at
# 2024-01-01 + k hours; turns 1 minute apart (well inside the session gap).
# doc_id % 50 == 7  -> exact duplicate of previous doc's text   (dedupe D1)
# doc_id % 50 == 23 -> near duplicate (suffix noise)            (dedupe D2)
TRANSCRIPTS_SQL_TEMPLATE = """
SELECT
  printf('conv-%08d', cast(floor(d.doc_id / 8.0) AS int))       AS conv_id,
  cast(d.doc_id % 8 AS int)                                     AS turn_idx,
  CASE cast((d.doc_id % 8) % 3 AS int)
       WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool'
  END                                                           AS role,
  CASE
       WHEN d.doc_id % 50 = 7  THEN coalesce(p.text, d.text)
       WHEN d.doc_id % 50 = 23 THEN coalesce(p.text || ' via feed', d.text)
       ELSE d.text
  END                                                           AS text,
  CASE WHEN cast((d.doc_id % 8) % 3 AS int) = 2
       THEN printf('tool-%d', cast(d.doc_id % 5 AS int))
  END                                                           AS tool,
  TIMESTAMP '2024-01-01 00:00:00'
    + (cast(floor(d.doc_id / 8.0) AS bigint) * 3600
       + (d.doc_id % 8) * 60) * INTERVAL '1' SECOND             AS ts
FROM {documents} d
LEFT JOIN {documents} p ON p.doc_id = d.doc_id - 1
"""


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts DataFrame derived from documents.parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents_src")
    return spark.sql(TRANSCRIPTS_SQL_TEMPLATE.format(documents="documents_src"))


def duckdb_transcripts_cte() -> str:
    """The same derivation as a CTE body for DuckDB oracle SQL, over the
    driver-registered ``documents`` view."""
    return TRANSCRIPTS_SQL_TEMPLATE.format(documents="documents")


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of a generated transcripts parquet dataset."""
    return spark.read.parquet(path)


def read_transcripts_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Unbounded read of the same dataset (file-stream micro-batches).

    In production this is ``spark.readStream.format("iceberg")`` on the
    transcripts table; the file stream has identical semantics for our
    engine (append-only source, per-file offsets tracked in the checkpoint
    -> per-partition lineage on resume).
    """
    from dataflow_opinion_analysis_spark import schemas

    r = spark.readStream.schema(schemas.TRANSCRIPTS)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


# --------------------------------------------------------------------------
# Log-bus source (the reference's Pub/Sub analog — IndexerPipeline.java
# reads a Pub/Sub topic in streaming mode; Structured Streaming's
# idiomatic equivalent is the Kafka source)
# --------------------------------------------------------------------------

# one JSON transcript turn per message value; key = conv_id (so a
# partitioned topic preserves per-conversation ordering, the same
# assumption the thread assembler makes about event time)
KAFKA_VALUE_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def parse_kafka_turns(raw: DataFrame) -> DataFrame:
    """Decode a Kafka-shaped frame (binary ``key``/``value`` + topic
    metadata) into the transcripts schema. Separated from the reader so
    the decode logic is unit-testable WITHOUT a broker: any batch
    DataFrame with binary key/value columns exercises the exact
    expressions the stream runs (tests/test_sources.py). Rows whose
    value is not valid JSON for the schema decode to all-null fields
    and are dropped (dead-letter-style guard: from_json yields null
    struct fields on parse failure, never an exception)."""
    from pyspark.sql import functions as F

    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), KAFKA_VALUE_SCHEMA).alias("j")
    ).select("j.*")
    return parsed.filter(
        F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
        & F.col("ts").isNotNull()
    )


def read_transcripts_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream from a Kafka topic of JSON transcript turns — the
    deployment source a real continuous ingest uses instead of the file
    stream (exactly-once offsets come from the Kafka source's own
    checkpointed offset ranges, the same contract as the file source's
    per-file offsets). Requires the spark-sql-kafka package on the
    cluster (not bundled in this sandbox, hence untestable here beyond
    the decode stage above — the reader construction is config only)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", int(max_offsets_per_trigger))
    return parse_kafka_turns(reader.load())
