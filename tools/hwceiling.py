"""Hardware scaling ceiling of this box, Spark-free (BASELINE.md).

The N->4N scaling-efficiency criterion assumes N vs 4N EXECUTORS — every
added node brings its own memory controller and disk. The sandbox
stand-in (local[N] vs local[4N], pinned) shares ONE memory subsystem
across all "cluster sizes", so any bandwidth-bound work has a hardware
scaling ceiling below 1.0 that no job-level design can exceed. This
script measures that ceiling with two controls:

  - memcpy: numpy copyto of a 512 MB buffer per process — pure memory
    bandwidth, the regime of shuffle/Arrow-IPC/parquet-encode stages.
  - cpu: a pure-Python arithmetic loop per process — no memory traffic,
    proving core pinning and the absence of CPU throttling.

    python tools/hwceiling.py [--low 1] [--high 4]

Prints one JSON line with per-level aggregate rates and the
low->high scaling efficiency of each control.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

N_BYTES = 512 * 1024 * 1024


def _mem_worker(core: int, q) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    a = np.ones(N_BYTES // 8, dtype=np.int64)
    b = np.empty_like(a)
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        np.copyto(b, a)
        np.copyto(a, b)
    q.put(2 * reps * N_BYTES / (time.time() - t0) / 1e9)


def _cpu_worker(core: int, q) -> None:
    os.sched_setaffinity(0, {core})
    t0 = time.time()
    x = 0
    for i in range(30_000_000):
        x += i * i % 7
    q.put(30_000_000 / (time.time() - t0))


def _run(worker, n: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(i, q)) for i in range(n)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    args = ap.parse_args()
    ratio = args.high / args.low
    out = {}
    for name, worker, unit in (
        ("memcpy", _mem_worker, "GB/s"),
        ("cpu", _cpu_worker, "ops/s"),
    ):
        lo = _run(worker, args.low)
        hi = _run(worker, args.high)
        out[name] = {
            f"aggregate_{args.low}proc": round(lo, 2),
            f"aggregate_{args.high}proc": round(hi, 2),
            "unit": unit,
            "scaling_efficiency": round(hi / (ratio * lo), 3),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
