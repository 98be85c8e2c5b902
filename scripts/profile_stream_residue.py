#!/usr/bin/env python
"""Localize the streaming indexer's per-micro-batch serial residue.

Runs the scaling-protocol stream job (same config as
scripts/bench_scaling.py --mode stream: soft dedupe off, 16-file
triggers, shuffle width pinned 32) once at a given local[N] with
SPARK_GRAFT_BATCH_PROFILE=1, then prints:

- per-batch process_batch phase walls (stats_agg / content_index_merge /
  winners_materialize / sink_merges) from the env-gated profiler in
  streaming/pipeline.py;
- the engine-side durationMs breakdown per batch (addBatch vs
  queryPlanning vs state commit vs offset WAL) from recentProgress;
- the gap between query wall and sum(triggerExecution) — harness idle.

Usage: python scripts/profile_stream_residue.py [cores] [trigger]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_BATCH_PROFILE"] = "1"
from dataflow_opinion_analysis_spark.session import get_spark

spark = get_spark(app_name="profile_stream", master="local[{cores}]",
                  shuffle_partitions=32)
spark.range(2_000_000).selectExpr("sum(id)").collect()
spark.range(10_000).mapInPandas(lambda it: it, "id long").count()
from dataflow_opinion_analysis_spark.plans.indexer import build_indexer as _bi
_tiny = spark.read.parquet({data!r}).limit(2000).localCheckpoint(eager=True)
_w = _bi(_tiny, persist=False)
_w.webresource.count(); _w.document.count(); _w.sentiment.count()
spark.catalog.clearCache()

from dataflow_opinion_analysis_spark.streaming.pipeline import run_indexer_stream
import shutil
for it in range({repeats}):
    out_root = {out_root!r} + f"_it{{it}}"
    t0 = time.perf_counter()
    q, sinks = run_indexer_stream(
        spark, {data!r}, out_root, os.path.join(out_root, "ckpt"),
        watermark="10 minutes", max_files_per_trigger={trigger},
        soft_dedupe_enabled=False,
    )
    q.processAllAvailable()
    wall = time.perf_counter() - t0
    rows = []
    for p in q.recentProgress:
        rows.append({{"batch_id": p["batchId"], "rows": p["numInputRows"],
                      "durationMs": p["durationMs"]}})
    q.stop()
    spark.catalog.clearCache()
    print(json.dumps({{"iteration": it, "wall": round(wall, 2),
                       "progress": rows}}), flush=True)
    shutil.rmtree(out_root, ignore_errors=True)
spark.stop()
"""


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    data = os.path.join(tempfile.gettempdir(), "bench_transcripts_500000")
    if not os.path.exists(data):
        sys.path.insert(0, REPO)
        from dataflow_opinion_analysis_spark import datagen

        datagen.write_transcripts_parquet(
            data, n_convs=50000, avg_turns=10, seed=42, n_files=64
        )
    out_root = tempfile.mkdtemp(prefix=f"profile_stream_{cores}_")
    code = WORKER.format(repo=REPO, cores=cores, data=data,
                         out_root=out_root, trigger=trigger, repeats=repeats)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, check=False)
    import shutil

    shutil.rmtree(out_root, ignore_errors=True)
    if r.returncode != 0:
        print(r.stderr[-6000:], file=sys.stderr)
        return 1
    profile_lines, results = [], []
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if "profile_batch" in d:
            profile_lines.append(d)
        elif "progress" in d:
            results.append(d)

    # profile lines interleave with iterations in emit order: batch ids
    # restart at 0 each iteration, so split on id resets
    prof_by_iter, cur, last_id = [], [], None
    for d in profile_lines:
        if last_id is not None and d["profile_batch"] <= last_id:
            prof_by_iter.append(cur)
            cur = []
        cur.append(d)
        last_id = d["profile_batch"]
    if cur:
        prof_by_iter.append(cur)

    for it, result in enumerate(results):
        print(f"== local[{cores}] trigger={trigger} iteration={it} "
              f"query wall {result['wall']}s ==")
        trig_total = 0.0
        for p in result["progress"]:
            dm = p["durationMs"]
            trig_total += dm.get("triggerExecution", 0) / 1000.0
            print(f"batch {p['batch_id']}: rows={p['rows']} " +
                  " ".join(f"{k}={v / 1000.0:.2f}s"
                           for k, v in sorted(dm.items())))
        print(f"sum(triggerExecution)={trig_total:.1f}s  "
              f"harness idle={result['wall'] - trig_total:.1f}s")
        print("-- process_batch phases --")
        for d in (prof_by_iter[it] if it < len(prof_by_iter) else []):
            keys = [k for k in d if k not in ("profile_batch", "n_input")]
            print(f"batch {d['profile_batch']}: n={d['n_input']} " +
                  " ".join(f"{k}={d.get(k, 0):.2f}s" for k in keys))
    return 0


if __name__ == "__main__":
    sys.exit(main())
