#!/usr/bin/env python
"""Scaling-efficiency bench: the SAME indexer job at two parallelism
levels (local[N] vs local[4N]) on the same generated transcripts input,
reporting throughput at both plus efficiency = (T_4N / T_N) / 4.

This evidences the north rule's two-cluster-size criterion in the
sandbox (no real cluster): executor threads stand in for executors.

Writes/refreshes BENCH/BASELINE.md and prints one JSON line.

Usage:
  python scripts/bench_scaling.py [--turns 2000000] [--n 8] [--mode batch|stream]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from dataflow_opinion_analysis_spark.session import get_spark

mode = {mode!r}
spark = get_spark(app_name="bench_scaling", master="local[{cores}]")
# warm-up: JVM JIT + Python worker pool spawn are one-time cluster costs,
# not per-job throughput — exclude them from the measured window
spark.range(2_000_000).selectExpr("sum(id)").collect()
import pandas as _pd
spark.range(10_000).mapInPandas(lambda it: it, "id long").count()
t0 = time.perf_counter()
if mode == "batch":
    from dataflow_opinion_analysis_spark.plans.indexer import build_indexer
    t = spark.read.parquet({data!r})
    out = build_indexer(t, persist=True)
    n_wr = out.webresource.count()
    n_doc = out.document.count()
    n_sent = out.sentiment.count()
else:
    from dataflow_opinion_analysis_spark.streaming.pipeline import run_indexer_stream
    out_root = {out_root!r}
    q, sinks = run_indexer_stream(
        spark, {data!r}, out_root, os.path.join(out_root, "ckpt"),
        watermark="10 minutes", max_files_per_trigger=4,
        soft_dedupe_enabled=False,
    )
    q.processAllAvailable()
    q.stop()
    n_wr = sinks.webresource.read().count()
    n_doc = sinks.document.read().count()
    n_sent = sinks.sentiment.read().count()
wall = time.perf_counter() - t0
print(json.dumps({{"wall": wall, "n_wr": n_wr, "n_doc": n_doc, "n_sent": n_sent}}))
spark.stop()
"""


def cpu_probe(seconds: float = 2.0) -> int:
    """Host-noise calibration: million spin iterations/sec across 32
    procs. The sandbox host is shared — its effective CPU fluctuates a
    few-fold over minutes; scaling numbers are only comparable when the
    probe reads similar before both runs. Reported alongside results."""
    import multiprocessing as mp
    import time as _t

    def spin(_):
        t0 = _t.perf_counter()
        x = 0
        while _t.perf_counter() - t0 < seconds:
            x += 1
        return x

    with mp.Pool(32) as p:
        res = p.map(spin, range(32))
    return int(sum(res) / seconds / 1_000_000)


def run_one(cores: int, data: str, n_turns: int, mode: str) -> dict:
    out_root = tempfile.mkdtemp(prefix=f"bench_sink_{cores}_")
    code = WORKER.format(repo=REPO, cores=cores, data=data, mode=mode, out_root=out_root)
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=False
    )
    shutil.rmtree(out_root, ignore_errors=True)
    if r.returncode != 0:
        print(r.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"bench run at local[{cores}] failed")
    res = json.loads(r.stdout.strip().splitlines()[-1])
    res["cores"] = cores
    res["turns_per_sec"] = round(n_turns / res["wall"], 1)
    res["wall_total"] = round(time.perf_counter() - t0, 1)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism N (big is 4N)")
    ap.add_argument("--mode", default="batch", choices=["batch", "stream"])
    ap.add_argument("--data", default=None, help="reuse existing transcripts dir")
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    from dataflow_opinion_analysis_spark import datagen

    data = args.data
    if data is None:
        data = os.path.join(tempfile.gettempdir(), f"bench_transcripts_{args.turns}")
        if not os.path.exists(os.path.join(data, "part-0000.parquet")):
            print(f"generating {args.turns} turns -> {data}", file=sys.stderr)
            datagen.write_transcripts_parquet(
                data, n_convs=args.convs, avg_turns=max(1, args.turns // args.convs),
                seed=42, n_files=64,
            )
    import duckdb

    n_turns = duckdb.sql(f"SELECT count(*) FROM '{data}/*.parquet'").fetchone()[0]

    repeats = args.repeats
    runs = []
    for _ in range(repeats):
        p0 = cpu_probe()
        small = run_one(args.n, data, n_turns, args.mode)
        p1 = cpu_probe()
        big = run_one(args.n * 4, data, n_turns, args.mode)
        p2 = cpu_probe()
        runs.append({"small": small, "big": big, "probes": [p0, p1, p2]})
    # best-of-N on each side: least host-noise-contaminated observation
    small = max((r["small"] for r in runs), key=lambda x: x["turns_per_sec"])
    big = max((r["big"] for r in runs), key=lambda x: x["turns_per_sec"])
    eff = round((big["turns_per_sec"] / small["turns_per_sec"]) / 4, 3)

    result = {
        "metric": "indexer_turns_per_sec_scaling",
        "mode": args.mode,
        "n_turns": n_turns,
        f"local[{args.n}]": small,
        f"local[{args.n * 4}]": big,
        "scaling_efficiency": eff,
        "meets_0.8": eff >= 0.8,
        "cpu_probes_miters_per_sec": [r["probes"] for r in runs],
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\n## {args.mode} scaling run ({n_turns} turns)\n\n"
            f"| parallelism | wall (s) | turns/sec |\n|---|---|---|\n"
            f"| local[{args.n}] | {small['wall']:.1f} | {small['turns_per_sec']} |\n"
            f"| local[{args.n * 4}] | {big['wall']:.1f} | {big['turns_per_sec']} |\n\n"
            f"scaling efficiency (T4N/TN)/4 = **{eff}** (target >= 0.8)\n"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
