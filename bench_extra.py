#!/usr/bin/env python
"""Per-query measurement harness for optimization work (bench.py is
FROZEN — this file carries the extra isolation runs the optimization
guide §1 calls for).

Usage:
  python bench_extra.py q1 q2 ...      # time named registry queries
  python bench_extra.py --all          # every registry query
  --sf-dir DIR   data dir (default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)
  --noop         materialize via noop sink (times every column) instead of
                 bench.py's count() methodology
  --repeat N     run each query N times (fresh logical plan each time),
                 report all samples
  --explain DIR  also write <DIR>/<name>.txt with explain('formatted')

Prints one JSON line: {"sf_dir": ..., "queries": {name: [secs, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None)
    ap.add_argument(
        "--keep-cache", action="store_true",
        help="do NOT clear the registry's memoized outputs between queries "
             "(bench.py methodology: shared indexer outputs are built once)")
    args = ap.parse_args()

    from dataflow_opinion_analysis_spark import entry_queries
    from dataflow_opinion_analysis_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")

    reg = entry_queries.registry()
    names = list(reg) if args.all else args.names
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    out: dict[str, list[float]] = {}
    for name in names:
        fn, _ = reg[name]
        samples = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.perf_counter() - t0, 3))
            if not args.keep_cache:
                entry_queries.clear_cache(spark)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = reg[name][0](spark, args.sf_dir)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            if not args.keep_cache:
                entry_queries.clear_cache(spark)
        out[name] = samples
        print(f"{name}: {samples}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "noop": args.noop, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
