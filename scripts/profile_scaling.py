#!/usr/bin/env python
"""Phase-level profiler for the scaling bench: runs the same indexer job
as scripts/bench_scaling.py at one parallelism level, reporting wall time
AND partition count per phase so the non-scaling phase is identifiable.
Mirrors the CURRENT build_indexer structure (fused Arrow tag/scorer
stages, ranked checkpoint, dupe-only verdict join).

Usage: python scripts/profile_scaling.py --cores 8 [--data DIR]
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
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--data", default="/tmp/bench_transcripts_2000000")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dataflow_opinion_analysis_spark.session import get_spark
    from dataflow_opinion_analysis_spark.functions import scorer
    from dataflow_opinion_analysis_spark.operators import dedupe, fanout, ingest

    spark = get_spark(
        app_name="profile_scaling",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.parts,
    )
    spark.range(2_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    phases: list[dict] = []

    def ph(name, fn):
        t0 = time.perf_counter()
        out = fn()
        w = time.perf_counter() - t0
        rec = {"phase": name, "wall": round(w, 2)}
        if hasattr(out, "rdd"):
            rec["parts"] = out.rdd.getNumPartitions()
        phases.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
        return out

    t = spark.read.parquet(args.data)
    t_all0 = time.perf_counter()

    ic = ingest.derive_input_content(t, "2024-02-01 00:00:00")
    to_index, skipped = ingest.split_skip_indexing(ic)
    ranked = ph(
        "ranked_ckpt",
        lambda: dedupe.exact_dedupe_ranked(to_index).localCheckpoint(eager=True),
    )
    winners0 = ranked.filter(F.col("_rn") == 1).drop("_rn", "winner_document_hash")
    exact_dupes = ranked.filter(F.col("_rn") > 1).drop("_rn")

    winners = ph(
        "tags_augment_ckpt",
        lambda: scorer.tags_augment(winners0).localCheckpoint(eager=True),
    )

    verdict_input = winners.select(
        "expected_document_hash",
        "conv_id",
        "turn_idx",
        "title",
        F.length("text").alias("text_len"),
        "tag_names",
    )
    dupe_verdicts = ph(
        "soft_verdict",
        lambda: dedupe.soft_dedupe(verdict_input)
        .filter(F.col("is_dupe"))
        .localCheckpoint(eager=True),
    )
    routed = winners.join(
        dupe_verdicts.select(
            F.col("document_hash").alias("expected_document_hash"),
            "is_dupe",
            "winner_document_hash",
        ),
        "expected_document_hash",
        "left",
    )
    soft_winners = ph(
        "soft_winners_ckpt",
        lambda: routed.filter(F.col("is_dupe").isNull())
        .drop("is_dupe", "winner_document_hash")
        .localCheckpoint(eager=True),
    )
    soft_dupes = routed.filter(F.col("is_dupe")).drop("is_dupe")

    document = fanout.document_rows(soft_winners)
    sentiment = fanout.sentiment_rows_fused(soft_winners)
    wr_parts = [
        fanout.webresource_rows(soft_winners),
        fanout.webresource_rows(exact_dupes, "winner_document_hash"),
        fanout.webresource_rows(skipped),
        fanout.webresource_rows(soft_dupes, "winner_document_hash"),
    ]
    webresource = wr_parts[0]
    for p in wr_parts[1:]:
        webresource = webresource.unionByName(p)

    for name, df in (
        ("count_webresource", webresource),
        ("count_document", document),
        ("count_sentiment", sentiment),
    ):
        t0 = time.perf_counter()
        n = df.count()
        phases.append({"phase": name, "wall": round(time.perf_counter() - t0, 2), "rows": n})
        print(json.dumps(phases[-1]), file=sys.stderr, flush=True)

    total = time.perf_counter() - t_all0
    print(json.dumps({"cores": args.cores, "total": round(total, 2), "phases": phases}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
