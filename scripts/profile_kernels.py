#!/usr/bin/env python
"""Isolated-kernel scaling probe: measures ONLY the two expensive stages
(JVM tag extraction; Arrow scorer mapInPandas) over a pre-materialized
winners frame, at a given parallelism, with explicit input partitioning.

Usage: python scripts/profile_kernels.py --cores 8 [--parts 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--parts", type=int, default=0, help="repartition width (0 = leave)")
    ap.add_argument("--data", default="/tmp/bench_transcripts_2000000")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dataflow_opinion_analysis_spark.session import get_spark
    from dataflow_opinion_analysis_spark.functions import scorer, tags_sql
    from dataflow_opinion_analysis_spark.operators import dedupe, ingest

    spark = get_spark(app_name="profile_kernels", master=f"local[{args.cores}]")
    spark.range(2_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    t = spark.read.parquet(args.data)
    ic = ingest.derive_input_content(t, "2024-02-01 00:00:00")
    to_index, _ = ingest.split_skip_indexing(ic)
    w0, _ = dedupe.exact_dedupe(to_index)
    doc_keyed = w0.select(
        F.col("expected_document_hash").alias("document_hash"),
        "conv_id",
        "turn_idx",
        "text",
    )
    if args.parts:
        doc_keyed = doc_keyed.repartition(args.parts)
    doc_keyed = doc_keyed.localCheckpoint(eager=True)
    nparts = doc_keyed.rdd.getNumPartitions()
    n = doc_keyed.count()

    out = {"cores": args.cores, "parts": nparts, "rows": n}

    t0 = time.perf_counter()
    tags_sql.extract_tags(doc_keyed).agg(F.count("*"), F.sum(F.size("Tags"))).collect()
    out["tags_sql_wall"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    doc_keyed.mapInPandas(scorer.score_passages_map, scorer.PASSAGE_SCHEMA).agg(
        F.count("*")
    ).collect()
    out["scorer_wall"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
