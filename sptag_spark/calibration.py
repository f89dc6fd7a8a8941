"""Machine-state calibration micro-kernel.

Bench numbers in this repo are recorded on a shared VM whose effective
compute varies ~2.7× between sittings for IDENTICAL code (AB_R5R6.md: the
r5 checkout measured 357 exact-kNN QPS at its own sitting and ~125 QPS at
the round-7 sitting, same protocol). Any round-over-round comparison that
ignores this chases ghosts — the entire "r5→r6 regression" was machine
state.

The kernel is a fixed-size float64 GEMM — the primitive every scoring
kernel in this engine leans on — timed single-process, median of 5.
Both bench.py and tools/selfcheck.py record it next to their timings;
comparisons across runs normalize by the gflops ratio (or refuse to
compare when calibrations differ by more than ~1.5×).
"""

from __future__ import annotations

import os
import time


def gemm_calibration(n: int = 1536, runs: int = 5) -> dict:
    """→ {"gemm_gflops": float, "loadavg_1m": float}. ~1 s total."""
    import numpy as np

    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n))
    B = rng.standard_normal((n, n))
    A @ B  # warm: thread pool spin-up + first-touch pages
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        A @ B
        samples.append(time.perf_counter() - t0)
    samples.sort()
    gflops = 2 * n**3 / samples[len(samples) // 2] / 1e9
    return {
        "gemm_gflops": round(gflops, 1),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }
