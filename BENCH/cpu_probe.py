"""Spark-free hardware-ceiling probe for the scaling evidence.

Runs an identical fixed-work integer loop on k concurrent processes and
reports the median per-worker wall time at each k. If per-worker wall
inflates as workers are added (host frequency scaling / co-tenant
contention), then even a PERFECTLY parallel job of fixed total work W
takes W*w_k/k at k workers, so the achievable lo->hi efficiency is
  ceiling(lo->hi) = w_lo / w_hi        (independent of W)
This is the number the pipeline's measured efficiency must be read
against (BENCH/BASELINE.md "the machine's own ceiling").

Usage: python BENCH/cpu_probe.py [--levels 1 2 8 32] [--work 40000000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn(n: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) % 2147483648
    return time.perf_counter() - t0


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 2, 8, 32])
    ap.add_argument("--work", type=int, default=40_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    med: dict[int, float] = {}
    for k in args.levels:
        walls: list[float] = []
        for _ in range(args.repeats):
            with mp.Pool(k) as pool:
                walls.extend(pool.map(_burn, [args.work] * k))
        med[k] = round(_median(walls), 3)

    out: dict = {"per_worker_wall_sec": {str(k): med[k] for k in args.levels}}
    if 2 in med and 8 in med:
        out["ceiling_2_8"] = round(med[2] / med[8], 3)
    if 8 in med and 32 in med:
        out["ceiling_8_32"] = round(med[8] / med[32], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
