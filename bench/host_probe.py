"""Host scaling-ceiling probe: how well does THIS box scale 2 -> 8
pinned cores on engine-free work?

Two workloads, each embarrassingly parallel (zero coordination, zero
shared state — a perfect engine would match them):

- cpu: integer hashing in a tight loop (ALU-bound; shared-cache and
  memory-bandwidth effects minimal) — the optimistic ceiling.
- mem: streaming numpy passes over a per-worker 256 MB buffer
  (bandwidth-bound, like parquet scan / shuffle spill) — the ceiling
  for data-movement-heavy phases, which a CDC merge mostly is.

Each worker process is taskset-pinned to its own core (same cores the
scaling bench uses), runs a fixed wall-time window, and reports work
units completed. Efficiency(width) = rate(wide) / (wide/narrow x
rate(narrow)). Any shortfall below 1.0 here is the HOST's (hypervisor
neighbors, shared LLC, one socket's memory channels serving all
cores) — an engine measured on this box inherits it, and a real
cluster, where 4N executors bring 4x memory channels, does not.

Usage: python bench/host_probe.py [narrow] [wide] [seconds]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _cpu_worker(core: int, seconds: float, out):
    os.sched_setaffinity(0, {core})
    h = 1469598103934665603
    n = 0
    t_end = time.monotonic() + seconds
    while time.monotonic() < t_end:
        for _ in range(100_000):
            h = (h ^ n) * 1099511628211 % (1 << 64)
            n += 1
    out.put(n)


def _mem_worker(core: int, seconds: float, out):
    os.sched_setaffinity(0, {core})
    import numpy as np

    buf = np.arange(32 * 1024 * 1024, dtype=np.int64)  # 256 MB
    n = 0
    t_end = time.monotonic() + seconds
    acc = 0
    while time.monotonic() < t_end:
        acc ^= int(buf.sum())  # one full streaming pass
        n += 1
    out.put(n)


def run_width(worker, width: int, seconds: float) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(c, seconds, q)) for c in range(width)
    ]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / seconds


def probe_pair(
    narrow: int = 2, wide: int = 8, seconds: float = 10.0
) -> tuple[float, float]:
    """(cpu_eff, mem_eff) — the launch gate for paired scaling runs:
    the replay's wide side is memory-bandwidth-bound first, so BOTH
    must read clean (>= ~0.85) before a headline invocation."""
    effs = []
    for worker in (_cpu_worker, _mem_worker):
        rn = run_width(worker, narrow, seconds)
        rw = run_width(worker, wide, seconds)
        effs.append(rw / ((wide / narrow) * rn))
    return effs[0], effs[1]


def main() -> None:
    narrow = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    wide = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    out = {}
    for name, worker in (("cpu", _cpu_worker), ("mem", _mem_worker)):
        rn = run_width(worker, narrow, seconds)
        rw = run_width(worker, wide, seconds)
        out[name] = {
            "narrow_rate": rn,
            "wide_rate": rw,
            "efficiency": rw / ((wide / narrow) * rn),
        }
    out["narrow"], out["wide"] = narrow, wide
    print(json.dumps(out))


if __name__ == "__main__":
    main()
