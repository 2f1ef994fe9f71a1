"""Host-capacity characterization: separates pipeline scaling from VM limits.

The sandbox VM oscillates between healthy (~18 GB/s single-stream memory
bandwidth) and degraded (0.1-0.6 GB/s) windows, and even in healthy windows
its AGGREGATE memory bandwidth saturates at a level far below 32x the
single-stream rate.  Any N->4N scaling measurement of a memory-traffic-heavy
pipeline (every Ray Data pipeline moves its blocks through memory) is bounded
above by the host's own memband scaling, not by the pipeline design.

This tool measures, in one process-pool pass each:

  * ``cpu``     - cache-resident integer burn at 8 and 32 workers
                  (pure-CPU deliverable parallelism; IPC/Ray-free)
  * ``memband`` - 160 MB numpy adds at 1, 8 and 32 workers
                  (aggregate memory bandwidth saturation curve)

and prints ONE JSON line with per-level throughput plus the derived
8->32 efficiency for both axes.  Interpretation rule used in BASELINE.md:
a pipeline's measured 8->32 efficiency should be judged against
``max(cpu.eff_8_32, memband.eff_8_32)`` for the same window, not against
the ideal 1.0 - the host, not the code, owns the gap between them.

Run it adjacent (same minutes) to any scaling measurement you intend to
adjudicate.  Wall-clock cost: ~5 s healthy, ~2-3 min degraded.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _cpu_burn(_arg) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return time.perf_counter() - t0


def _mem_burn(_arg) -> float:
    import numpy as np

    a = np.ones(20_000_000)
    b = np.ones(20_000_000)
    t0 = time.perf_counter()
    for _ in range(2):
        _ = a + b
    # 2 adds x (2 reads + 1 write) x 160 MB of float64 traffic
    return (2 * 3 * 20_000_000 * 8) / (time.perf_counter() - t0) / 1e9


def _pool_throughput(fn, n: int, tasks_per_worker: int = 1) -> dict:
    with mp.Pool(n) as pool:
        t0 = time.perf_counter()
        per_task = pool.map(fn, range(n * tasks_per_worker))
        wall = time.perf_counter() - t0
    return {
        "workers": n,
        "wall_sec": round(wall, 2),
        "tasks_per_sec": round(len(per_task) / wall, 3),
        "per_task": [round(v, 3) for v in per_task],
    }


def measure() -> dict:
    out: dict = {"metric": "host capacity (cpu + memory-bandwidth scaling)"}

    cpu = {}
    for n in (8, 32):
        r = _pool_throughput(_cpu_burn, n, tasks_per_worker=2)
        cpu[str(n)] = {"tasks_per_sec": r["tasks_per_sec"], "wall_sec": r["wall_sec"]}
    cpu["eff_8_32"] = round(
        cpu["32"]["tasks_per_sec"] / cpu["8"]["tasks_per_sec"] / 4, 3
    )
    out["cpu"] = cpu

    mem = {}
    for n in (1, 8, 32):
        r = _pool_throughput(_mem_burn, n)
        # per_task values are GB/s seen by each process; aggregate = sum
        agg = round(sum(r["per_task"]), 2)
        mem[str(n)] = {"aggregate_gb_s": agg, "wall_sec": r["wall_sec"]}
    mem["eff_8_32"] = round(
        mem["32"]["aggregate_gb_s"] / mem["8"]["aggregate_gb_s"] / 4, 3
    )
    out["memband"] = mem

    out["scaling_bound_8_32"] = max(cpu["eff_8_32"], mem["eff_8_32"])
    out["ts"] = round(time.time(), 1)
    return out


if __name__ == "__main__":
    json.dump(measure(), sys.stdout)
    sys.stdout.write("\n")
