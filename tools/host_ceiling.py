"""Host scaling-ceiling calibration probes (no Spark).

Two pinned raw-multiprocessing workloads bracket what ANY job can scale
on this single box from N to 4N cores:

- ``alu``:  cache-resident hashing (md5 over 4 KB buffers) — pure
  compute, no DRAM pressure. Scales ~1.0 on independent cores; its
  measured efficiency is the box's compute ceiling (turbo/SMT effects).
- ``dram``: streaming over a 32 MB per-worker array — pure memory
  bandwidth. All cores share ONE memory bus, so this does NOT scale
  with cores; its measured efficiency is the box's bandwidth floor.

A real job's single-box N->4N efficiency lands between the two,
weighted by its bytes/flop mix. On a real cluster each node brings its
OWN memory bus, so the bandwidth term scales with node count — the
single-box floor does not apply. Usage::

    python tools/host_ceiling.py [n]      # N=n vs 4N=4n workers, def. 4

Prints one JSON line with both probes' best-of-3 walls and efficiency.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import sys
import time


def work_alu(_):
    # ~1 s of cache-resident hashing: 4 KB buffer never leaves L1
    buf = b"x" * 4096
    h = b""
    for _ in range(60_000):
        h = hashlib.md5(buf + h).digest()
    return h[0]


def work_dram(_):
    # streaming passes over a 32 MB array: DRAM-bandwidth bound
    import numpy as np

    a = np.arange(4_000_000, dtype=np.int64)
    acc = 0
    for _ in range(12):
        a = (a * 6364136223846793005 + 1442695040888963407) & ((1 << 62) - 1)
        acc ^= int(a.sum() & ((1 << 62) - 1))
    return acc


def level(fn, nworkers: int, tasks: int) -> float:
    os.sched_setaffinity(0, set(range(nworkers)))
    try:
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            with mp.Pool(nworkers) as p:
                p.map(fn, range(tasks))
            walls.append(time.monotonic() - t0)
        return min(walls)
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count() or 1)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out: dict = {"n": n, "n4": 4 * n}
    for name, fn in (("alu", work_alu), ("dram", work_dram)):
        tasks = 4 * n * 4  # 4 waves at the wide level, 16 at the narrow
        t_n = level(fn, n, tasks)
        t_4n = level(fn, 4 * n, tasks)
        out[name] = {
            "w_n_best_s": round(t_n, 2),
            "w_4n_best_s": round(t_4n, 2),
            "efficiency": round(t_n / t_4n / 4, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
