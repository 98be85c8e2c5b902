"""spark-submit entry point with subcommands — the replacement for the
reference's ControlPipeline (ControlPipeline.java:66-148), which launched
Dataflow jobs from inside a streaming worker. The repo itself deprecates
that pattern in favor of external orchestration (reference README.md:21-22);
a CLI driven by spark-submit / Airflow is the idiomatic Spark shape.

Usage (local or cluster):

  spark-submit --py-files dataflow_opinion_analysis_spark.zip \
      -m dataflow_opinion_analysis_spark.cli index \
      --input /path/transcripts --output /path/warehouse

Subcommands:
  index      batch indexer: transcripts parquet -> webresource/document/
             sentiment parquet
  stream     streaming indexer with checkpointed exactly-once MERGE sinks
  statscalc  refresh the stat* tables from the fact tables
  datagen    deterministic synthetic transcripts generator
"""

from __future__ import annotations

import argparse
import sys


def _spark(args):
    from dataflow_opinion_analysis_spark.session import get_spark

    return get_spark(app_name=f"opinion-{args.cmd}", master=args.master)


def cmd_index(args) -> int:
    from dataflow_opinion_analysis_spark.plans.indexer import build_indexer

    spark = _spark(args)
    t = spark.read.parquet(args.input)
    out = build_indexer(
        t, persist=True, soft_dedupe_enabled=not args.no_soft_dedupe,
        enrich_ratio=args.enrich_ratio,
    )
    for name, df in [
        ("webresource", out.webresource),
        ("document", out.document),
        ("sentiment", out.sentiment),
    ]:
        (
            df.repartition("PublicationDateId" if name != "sentiment" else "DocumentDateId")
            .write.mode(args.mode)
            .partitionBy("PublicationDateId" if name != "sentiment" else "DocumentDateId")
            .parquet(f"{args.output}/{name}")
        )
        print(f"wrote {name}")
    spark.stop()
    return 0


def cmd_stream(args) -> int:
    from dataflow_opinion_analysis_spark.streaming.pipeline import run_indexer_stream

    spark = _spark(args)
    q, sinks = run_indexer_stream(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        watermark=args.watermark,
        max_files_per_trigger=args.max_files_per_trigger,
        soft_dedupe_enabled=not args.no_soft_dedupe,
        enrich_ratio=args.enrich_ratio,
    )
    if args.drain:
        q.processAllAvailable()
        q.stop()
        if sinks.query_metrics is not None:
            import json

            print("query_metrics:", json.dumps(sinks.query_metrics.summary()))
    else:
        q.awaitTermination()
    spark.stop()
    return 0


def cmd_statscalc(args) -> int:
    from dataflow_opinion_analysis_spark.plans import stats

    spark = _spark(args)
    document = spark.read.parquet(f"{args.warehouse}/document")
    sentiment = spark.read.parquet(f"{args.warehouse}/sentiment")
    webresource = spark.read.parquet(f"{args.warehouse}/webresource")
    stats.register_views(spark, document, sentiment, webresource)
    social = (
        spark.read.parquet(args.social_counts) if args.social_counts else None
    )
    # durable chaining: each table is written to the warehouse and the
    # read-back feeds the next table (reference per-table BigQuery writes)
    for name in stats.build_stats(
        spark, store_root=args.warehouse, social_counts=social
    ):
        print(f"wrote {name}")
    spark.stop()
    return 0


def cmd_datagen(args) -> int:
    from dataflow_opinion_analysis_spark import datagen

    path = datagen.write_transcripts_parquet(
        args.output,
        n_convs=args.convs,
        avg_turns=args.avg_turns,
        seed=args.seed,
        n_files=args.files,
    )
    print(f"wrote {path}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="opinion-analysis-spark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("index")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--mode", default="overwrite")
    p.add_argument("--no-soft-dedupe", action="store_true")
    # reference batch default is 0.01 (IndexerPipelineUtils.java:395-398);
    # 0.0 keeps enrichment-free runs reproducible vs the goldens
    p.add_argument("--enrich-ratio", type=float, default=0.0)
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("stream")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--watermark", default="10 minutes")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--no-soft-dedupe", action="store_true")
    # reference streaming default is 1.0 (IndexerPipelineUtils.java:395-398)
    p.add_argument("--enrich-ratio", type=float, default=0.0)
    p.add_argument("--drain", action="store_true", help="process available input then exit")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("statscalc")
    p.add_argument("--warehouse", required=True)
    # SocialStatsPipeline seam: parquet of real social counts; default
    # derives deterministic counts from WebResourceHash
    p.add_argument("--social-counts", default=None)
    p.set_defaults(fn=cmd_statscalc)

    p = sub.add_parser("datagen")
    p.add_argument("--output", required=True)
    p.add_argument("--convs", type=int, default=2000)
    p.add_argument("--avg-turns", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--files", type=int, default=8)
    p.set_defaults(fn=cmd_datagen)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
