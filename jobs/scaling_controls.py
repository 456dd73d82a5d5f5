"""Hardware scaling controls (no Spark): how much N→4N efficiency this
machine gives PERFECTLY parallel work, measured two ways:

- cpu: independent pure-Python float loops (register/ALU bound — the
  best case; loses only to SMT/steal),
- membw: independent numpy large-array copies (memory-bandwidth bound —
  the worst case for data-processing workloads; all processes share one
  memory controller).

A Spark pipeline's achievable 2→8 efficiency sits between the two
controls; if its measured ratio ≈ the membw control, the gap is the
machine's shared memory bandwidth, not the query plan.

Usage: python jobs/scaling_controls.py [lo hi] (default 2 8)
Prints one JSON line with per-level throughput and efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn_cpu(q, secs: float) -> None:
    t0 = time.time()
    n = 0
    x = 1.0
    while time.time() - t0 < secs:
        for _ in range(100_000):
            x = x * 1.000001 % 17.0
        n += 100_000
    q.put(n)


def _burn_membw(q, secs: float) -> None:
    import numpy as np

    a = np.random.RandomState(0).bytes(128 * 1024 * 1024)
    src = np.frombuffer(a, dtype=np.uint8).copy()
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        dst = src.copy()          # 128 MiB read + write
        n += dst.nbytes
    q.put(n)


def measure(target, procs: int, secs: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=target, args=(q, secs)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / secs


def main() -> None:
    lo, hi = (int(a) for a in sys.argv[1:3]) if len(sys.argv) >= 3 else (2, 8)
    secs = 15.0
    out = {}
    for name, target in (("cpu", _burn_cpu), ("membw", _burn_membw)):
        lo_t = measure(target, lo, secs)
        hi_t = measure(target, hi, secs)
        out[name] = {
            str(lo): round(lo_t, 0),
            str(hi): round(hi_t, 0),
            "efficiency": round(hi_t / ((hi / lo) * lo_t), 3),
        }
    print(json.dumps({"lo": lo, "hi": hi, "controls": out}))


if __name__ == "__main__":
    main()
