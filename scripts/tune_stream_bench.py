#!/usr/bin/env python
"""A/B the streaming-headline bench configuration at local[32]
(round-4 verdict item 6): trigger size x state width on the same bench
input bench.py uses. The committed bench config was tuned at local[8];
this measures which pairing is best at the bench's own core count.

Prints one JSON line per (trigger, width) with wall seconds and steady
tps. Run on a QUIET host, nothing else concurrent.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "500000"))


def main() -> int:
    from dataflow_opinion_analysis_spark import datagen
    from dataflow_opinion_analysis_spark.session import get_spark
    from dataflow_opinion_analysis_spark.streaming.pipeline import run_indexer_stream

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="tune-stream", master=f"local[{cpus}]")

    data = os.path.join(tempfile.gettempdir(), f"bench_transcripts_{BENCH_TURNS}")
    if not os.path.exists(os.path.join(data, "part-0000.parquet")):
        datagen.write_transcripts_parquet(
            data, n_convs=max(1000, BENCH_TURNS // 10), avg_turns=10, seed=42,
            n_files=64,
        )

    configs = [(16, 32), (16, 16), (32, 32), (32, 16)]
    # run the first config twice: run 0 pays one-time JVM/codegen ramp
    results = []
    for i, (trigger, width) in enumerate([configs[0]] + configs):
        sroot = tempfile.mkdtemp(prefix="tune_stream_")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        t0 = time.perf_counter()
        q, sinks = run_indexer_stream(
            spark, data, os.path.join(sroot, "out"), os.path.join(sroot, "ckpt"),
            watermark="10 minutes", max_files_per_trigger=trigger,
            soft_dedupe_enabled=False,
        )
        q.processAllAvailable()
        q.stop()
        wall = time.perf_counter() - t0
        s = sinks.query_metrics.summary() if sinks.query_metrics else {}
        spark.streams.removeListener(sinks.query_metrics)
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(sroot, ignore_errors=True)
        rec = {
            "warmup": i == 0,
            "trigger_files": trigger,
            "state_width": width,
            "wall_sec": round(wall, 1),
            "steady_rows_per_sec": s.get("steady_rows_per_sec"),
            "batches": s.get("batches"),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
