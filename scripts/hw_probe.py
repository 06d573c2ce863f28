#!/usr/bin/env python
"""Raw-hardware scaling ceiling probe — no Spark, no JVM.

Runs the same class of per-image numpy work the pipeline's payload
stage does (PCG64 raster synthesis + aHash reduction + PSNR math) under
a plain multiprocessing.Pool at several process counts, and prints the
units/sec at each plus the N→4N efficiency. This is the ceiling ANY
software on this VM can reach at that parallelism — shared-tenancy
vCPUs saturate memory bandwidth well before nominal core count
[BENCH/BASELINE.md "Why N=4 vs 4N=16 cores"]. Run it the same day as
scaling_bench.py: the ceiling moves with neighbor load.

Usage: python scripts/hw_probe.py [procs ...]   (default: 1 4 16)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

UNITS_PER_TASK = 400


def one_task(seed: int) -> float:
    rng = np.random.Generator(np.random.PCG64(seed))
    acc = 0.0
    for i in range(UNITS_PER_TASK):
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        gray = img.mean(axis=2)
        small = gray.reshape(8, 4, 8, 4).mean(axis=(1, 3))
        bits = (small > small.mean()).astype(np.uint64)
        acc += float(bits.sum())
        q = (img >> np.uint8(2)) << np.uint8(2)
        diff = img.astype(np.float64) - q
        acc += float((diff * diff).mean())
    return acc


def run(procs: int, n_tasks: int = 64) -> float:
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        pool.map(one_task, range(n_tasks))
        dt = time.perf_counter() - t0
    return n_tasks * UNITS_PER_TASK / dt


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    out = {}
    for p in levels:
        best = 0.0
        for _ in range(2):
            best = max(best, run(p))
        out[str(p)] = round(best, 1)
    eff = None
    pairs = [(a, b) for a in levels for b in levels if b == 4 * a]
    for a, b in pairs:
        eff = round(out[str(b)] / out[str(a)] / 4.0, 3)
        out[f"efficiency_{a}to{b}"] = eff
    print(json.dumps(out))


if __name__ == "__main__":
    main()
