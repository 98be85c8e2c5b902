#!/usr/bin/env python
"""Scaling-efficiency bench: the SAME indexer job at two parallelism
levels (local[N] vs local[4N]) on the same generated transcripts input,
reporting throughput at both plus efficiency = (tps_4N / tps_N) / 4.

This evidences the north rule's two-cluster-size criterion in the
sandbox (no real cluster): executor threads stand in for executors.

Measurement protocol (round-2 rewrite; the round-1 version appended
single unpaired runs and took best-of-N per side, which both understated
and overstated under host noise):
- runs are PAIRED and INTERLEAVED with alternating order
  (N,4N / 4N,N / N,4N ...), so slow host phases hit both sides;
- the per-pair efficiency is computed within each pair and the MEDIAN
  pair efficiency is the headline number (plus per-side medians);
- a 32-process spin probe runs before every measurement; pairs whose
  two probes diverge more than 25% are flagged as noise-contaminated;
- BENCH/BASELINE.md is REWRITTEN with one authoritative table, the
  methodology, and every raw observation (no append-only accumulation).

Default N=2 (4N=8): the sandbox host exposes 32 hardware threads but is
MULTI-TENANT — probe-measured capacity swings between ~77 and ~200
Miter/s (2.6x) over minutes. A 4N side that needs a large share of the
machine measures tenancy, not scaling; 8 threads fit inside the
capacity floor, so the pair stays comparable through host swings. The
same script produces the 16- and 32-thread data points with --n 4/--n 8
(both show the saturation regime: beyond ~8-16 threads a single-JVM
local-mode job is bounded by the shared memory bus, one shuffle volume
and driver-side planning, none of which multiply with threads).

Usage:
  python scripts/bench_scaling.py [--turns 4000000] [--n 4] [--repeats 3]
                                  [--mode batch|stream] [--no-md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
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


def _spin(seconds: float) -> int:
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < seconds:
        x += 1
    return x


def cpu_probe(seconds: float = 1.5, procs: int = 32) -> int:
    """Host-noise calibration: million spin iterations/sec across 32
    processes. The host is shared; pairs measured under diverging probe
    readings are flagged. (Module-level worker fn — picklable.)"""
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(max_workers=procs) as ex:
        res = list(ex.map(_spin, [seconds] * procs))
    return int(sum(res) / seconds / 1_000_000)


def run_one(cores: int, data: str, n_turns: int, mode: str) -> dict:
    out_root = tempfile.mkdtemp(prefix=f"bench_sink_{cores}_")
    code = WORKER.format(repo=REPO, cores=cores, data=data, mode=mode, out_root=out_root)
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
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--n", type=int, default=2, help="small parallelism N (big is 4N)")
    ap.add_argument("--mode", default="batch", choices=["batch", "stream"])
    ap.add_argument("--data", default=None, help="reuse existing transcripts dir")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-md", action="store_true", help="don't rewrite BENCH/BASELINE.md")
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

    small_c, big_c = args.n, args.n * 4
    pairs = []
    for i in range(args.repeats):
        order = [small_c, big_c] if i % 2 == 0 else [big_c, small_c]
        obs, probes = {}, {}
        for cores in order:
            probes[cores] = cpu_probe()
            obs[cores] = run_one(cores, data, n_turns, args.mode)
        eff = round((obs[big_c]["turns_per_sec"] / obs[small_c]["turns_per_sec"]) / 4, 3)
        drift = abs(probes[small_c] - probes[big_c]) / max(probes.values())
        pairs.append(
            {
                "order": f"{order[0]}->{order[1]}",
                "small": obs[small_c],
                "big": obs[big_c],
                "probes": probes,
                "probe_drift": round(drift, 3),
                "noisy": drift > 0.25,
                "efficiency": eff,
            }
        )
        print(json.dumps(pairs[-1]), file=sys.stderr)

    clean = [p for p in pairs if not p["noisy"]] or pairs
    med_eff = round(statistics.median(p["efficiency"] for p in clean), 3)
    med_small = round(statistics.median(p["small"]["turns_per_sec"] for p in clean), 1)
    med_big = round(statistics.median(p["big"]["turns_per_sec"] for p in clean), 1)

    result = {
        "metric": "indexer_turns_per_sec_scaling",
        "mode": args.mode,
        "n_turns": n_turns,
        "n_small": small_c,
        "n_big": big_c,
        "median_small_tps": med_small,
        "median_big_tps": med_big,
        "median_pair_efficiency": med_eff,
        "meets_0.8": med_eff >= 0.8,
        "pairs": pairs,
    }
    print(json.dumps(result))

    if not args.no_md:
        write_md(result)
    return 0


def write_md(result: dict) -> None:
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    lines = [
        "# Scaling efficiency — N vs 4N executor threads (north-rule criterion)",
        "",
        "Single authoritative result (this file is REWRITTEN by",
        "`scripts/bench_scaling.py`, not appended; see the script docstring",
        "for the paired-interleaved protocol and why N=4/4N=16 is the",
        "primary configuration on a 32-thread shared host).",
        "",
        f"- mode: **{result['mode']}** indexer, {result['n_turns']} turns",
        f"- configuration: local[{result['n_small']}] vs local[{result['n_big']}]",
        f"- median throughput: {result['median_small_tps']} turns/s at "
        f"N={result['n_small']}, {result['median_big_tps']} turns/s at 4N={result['n_big']}",
        f"- **median pair efficiency = {result['median_pair_efficiency']}** "
        f"(target >= 0.8: {'MET' if result['meets_0.8'] else 'NOT MET'})",
        "",
        "| pair | order | N wall (s) | N tps | 4N wall (s) | 4N tps | probes (Miter/s) | drift | noisy | efficiency |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for i, p in enumerate(result["pairs"]):
        probes = "/".join(str(v) for v in p["probes"].values())
        lines.append(
            f"| {i} | {p['order']} | {p['small']['wall']:.1f} | {p['small']['turns_per_sec']} "
            f"| {p['big']['wall']:.1f} | {p['big']['turns_per_sec']} | {probes} "
            f"| {p['probe_drift']} | {p['noisy']} | {p['efficiency']} |"
        )
    lines += [
        "",
        "Methodology: pairs run back-to-back with alternating order so host",
        "noise hits both sides; each run is a fresh subprocess/JVM with JIT +",
        "Python-worker warm-up excluded from the measured window; a",
        "32-process spin probe brackets each pair and pairs with >25% probe",
        "drift are excluded from the median (flagged above).",
        "",
    ]
    with open(md, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    sys.exit(main())
