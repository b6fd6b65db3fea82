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


def gen_shuffled_chunk(
    rng,
    base_rows: list[tuple],
    start_id: int,
    n: int,
    reservoir: list,
    dup_frac: float = 0.02,
    reservoir_cap: int = 1_000,
) -> list[tuple]:
    """Shared 500k-point corpus profile (textdedup/funnel points): n
    `(id, text, *extras)` rows as token-SHUFFLED resamples of
    `base_rows` (`(tokens_list, *extras)` tuples) — length/vocab
    marginals preserved, fresh shingle sets so LSH bucket load stays
    realistic — plus a `dup_frac` of exact copies drawn from a rolling
    reservoir so the pair path stays exercised. One definition: the
    points merge into axes measured on this profile, so a drifted copy
    would silently measure a different corpus."""
    rows = []
    for j in range(n):
        if reservoir and rng.random() < dup_frac:
            payload = reservoir[int(rng.integers(0, len(reservoir)))]
        else:
            base = base_rows[int(rng.integers(0, len(base_rows)))]
            toks = list(base[0])
            rng.shuffle(toks)
            payload = (" ".join(toks),) + tuple(base[1:])
        rows.append((start_id + j,) + payload)
        if len(reservoir) < reservoir_cap:
            reservoir.append(payload)
        else:
            reservoir[int(rng.integers(0, reservoir_cap))] = payload
    return rows


def write_id_mapped_sidecar(spark, emb_df, n_ids: int, path: str) -> None:
    """Embedding sidecar covering ids 0..n_ids-1 by mapping every id to
    its base vector (id mod |emb|) — the funnel axes' fixture shape, so
    the semantic tier ingests a vector per gated doc at every size."""
    from pyspark.sql import functions as F

    n_base = emb_df.count()
    (
        spark.range(n_ids)
        .select(F.col("id").alias("k"))
        .join(
            emb_df.select(F.col("vec_id").alias("m"), "embedding"),
            F.pmod(F.col("k"), F.lit(n_base)) == F.col("m"),
        )
        .select(F.col("k").alias("vec_id"), "embedding")
        .write.mode("overwrite")
        .parquet(path)
    )
