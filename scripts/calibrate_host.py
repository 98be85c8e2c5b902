#!/usr/bin/env python
"""Host-hardware calibration for the scaling bench: what efficiency CAN
an 8 -> 32 process scale-up reach on this box, independent of Spark?

Two probes bracket the indexer's resource mix:

- register-only spin: pure cycles, no memory traffic — the upper bound
  for ANY embarrassingly-parallel workload. Measured 2026-08-17 in a
  quiet window: ratio 3.15-3.48x from 8 -> 32 procs (efficiency
  0.79-0.87). The VM's 32 vCPUs do not deliver 4x the cycles of 8.
- DRAM streaming sweep (64 MB numpy float64 sums): the shared-memory-bus
  bound for Arrow/shuffle-heavy phases. Measured 2.57x (efficiency 0.64).

If even these caps sit below 0.8, an 8 -> 32 thread pair on this VM
cannot evidence the north rule's executor-scaling criterion for a job
that mixes CPU, DRAM, and serial phases — which is why the criterion is
measured at local[2] -> local[8] (see BENCH/BASELINE.md). A real 4x
scale-out adds memory buses and disks with the cores; a bigger slice of
one VM does not.

Usage: python scripts/calibrate_host.py  (waits for a quiet window)
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import _spin, cpu_probe, wait_for_quiet  # noqa: E402


def _memsweep(sec: float) -> float:
    """Streaming sums over a 64 MB array for `sec` seconds; returns GB/s
    read (DRAM-bandwidth-bound: the array is far larger than L2/L3 slices
    available per process)."""
    import numpy as np

    a = np.ones(8_000_000, dtype=np.float64)  # 64 MB
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < sec:
        a.sum()
        n += 1
    return n * 64 / 1024 / (time.perf_counter() - t0)


def spin_at(procs: int, sec: float = 2.0) -> float:
    with ProcessPoolExecutor(max_workers=procs) as ex:
        return sum(ex.map(_spin, [sec] * procs)) / sec / 1e6


def mem_at(procs: int, sec: float = 2.0) -> float:
    with ProcessPoolExecutor(max_workers=procs) as ex:
        return sum(ex.map(_memsweep, [sec] * procs))


def main() -> int:
    q = wait_for_quiet(900)
    print(f"quiet probe: {q} Miter/s")
    for trial in range(3):
        s8, s32, s8b = spin_at(8), spin_at(32), spin_at(8)
        m8, m32 = mem_at(8), mem_at(32)
        s_ratio = s32 / ((s8 + s8b) / 2)
        m_ratio = m32 / m8
        print(
            f"trial {trial}: spin 8p={s8:.0f}/{s8b:.0f} 32p={s32:.0f} Miter/s"
            f" ratio={s_ratio:.2f} (eff {s_ratio / 4:.3f}) | "
            f"mem 8p={m8:.0f} 32p={m32:.0f} GB/s"
            f" ratio={m_ratio:.2f} (eff {m_ratio / 4:.3f})"
        )
    print(f"post probe: {cpu_probe()} Miter/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
