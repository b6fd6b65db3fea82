"""Shared scaling-curve arithmetic for the scale_curve* scripts.

One definition of the log-log exponent fit and the median-of-runs timing
loop: three scripts (scale_curve.py, scale_curve_core.py,
scale_curve_stream.py) feed the same SCALE_CURVE.json, so a fix to the
fit (e.g. the 1 ms clamp that biases sub-millisecond points) must land
in exactly one place or the recorded exponents drift apart.
"""
from __future__ import annotations

import math
import time


def fit_exponent(scales: list[float], times: list[float]) -> float | None:
    """Least-squares slope on (log scale, log seconds): the observed
    scaling exponent. Times are clamped at 1 ms — below that the
    measurement is scheduler noise, and log(~0) would dominate the fit.
    A single-point series has no slope — returns None instead of
    dividing by zero (reachable via the --scales flags)."""
    if len(set(scales)) < 2:
        return None
    xs = [math.log(s) for s in scales]
    ys = [math.log(max(t, 1e-3)) for t in times]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    return round(
        sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        / sum((x - mx) ** 2 for x in xs), 2,
    )


def median_times(fn, runs: int) -> float:
    """Median wall-clock of `runs` calls to fn() — the curve scripts'
    standard point estimate (robust to one GC pause / first-run JIT)."""
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2], 3)
