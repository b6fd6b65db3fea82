#!/usr/bin/env python
"""One-off 1M-vector point for semdedup_update_vs_index_size.

Why 1M specifically: the corpus-scaled cell formula min(4096, n//256)
FREEZES at n = 1,048,576 — the 200k axis demonstrates the
touched-cells saturation regime, but 1M sits exactly at the cap
boundary, where the two terms the saturation argument bounds are both
at their worst case (4096 fold directories to list, occupancy grown to
~256 at the cap). A flat 50-vector update here is the measured instance
of "update cost independent of index size" at the largest state the
formula ever spreads across distinct cells.

Preload uses 4000-vector batches + compact_every=32 (vs the axis's
1000/16): the timed update measures the MAINTAINED folded state either
way (the axis's own contract), and the coarser cadence keeps the
preload's fold tax affordable at this size. Merges the point into the
existing semdedup_update_vs_index_size row (recomputing exponent and
tail) and records the 1M fold + probe cost as fields.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from _curve_util import fit_exponent, median_times  # noqa: E402

SF01 = "/root/testdata/sf0.1"
N = 1_000_000
PRELOAD_BATCH = 4_000
COMPACT_EVERY = 32
TICK = 50  # the axis's timed update size
RUNS = 3


def main() -> None:
    import numpy as np

    from moc_indexer_spark.session import get_spark, ship_package
    from moc_indexer_spark.streaming.semdedup_stream import (
        IncrementalSemDeDup,
    )

    spark = get_spark(app_name="semdedup-1m-point")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    src = spark.read.parquet(f"{SF01}/embeddings.parquet")
    vecs = [list(r.embedding) for r in src.select("embedding").collect()]
    rng = np.random.default_rng(13)

    d = tempfile.mkdtemp(prefix="semdedup_1m_")
    idx = IncrementalSemDeDup(
        spark, os.path.join(d, "ix"), compact_every=COMPACT_EVERY
    )
    idx.train(src, expected_corpus_rows=N)

    t0 = time.perf_counter()
    done = 0
    bid = 0
    while done < N:
        m = min(PRELOAD_BATCH, N - done)
        pick = rng.integers(0, len(vecs), size=m)
        rows = [(done + j, vecs[int(p)]) for j, p in enumerate(pick)]
        idx.update(spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"), bid)
        done += m
        bid += 1
        if bid % 25 == 0:
            print(json.dumps({"preloaded": done,
                              "elapsed_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
    preload_sec = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    idx.compact()
    compact_sec = round(time.perf_counter() - t0, 3)

    def one_update():
        nonlocal done, bid
        pick = rng.integers(0, len(vecs), size=TICK)
        rows = [(done + j, vecs[int(p)]) for j, p in enumerate(pick)]
        idx.update(spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"), bid)
        done += TICK
        bid += 1

    one_update()  # warm
    t_update = median_times(one_update, RUNS)

    t0 = time.perf_counter()
    n_dups = idx.duplicates().count()
    dup_read_sec = round(time.perf_counter() - t0, 3)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE.json",
    )
    with open(out_path) as fh:
        doc = json.load(fh)
    row = doc["stream_results"]["semdedup_update_vs_index_size"]
    row["t"][str(N)] = t_update
    sizes = sorted(int(k) for k in row["t"])
    row["exponent"] = fit_exponent(
        [n / sizes[0] for n in sizes], [row["t"][str(n)] for n in sizes]
    )
    tail = sizes[-2:]
    row["exponent_tail"] = fit_exponent(
        [n / tail[0] for n in tail], [row["t"][str(n)] for n in tail]
    )
    row["at_1m"] = {
        "preload_sec": preload_sec, "compact_sec": compact_sec,
        "dup_read_sec": dup_read_sec, "n_dup_rows": n_dups,
        "preload_batch": PRELOAD_BATCH, "compact_every": COMPACT_EVERY,
        "note": "1M = the min(4096, n//256) cell-cap boundary: 4096 fold "
                "dirs + occupancy ~256, the worst case the saturation "
                "argument bounds; coarser preload cadence (4000/32) — the "
                "timed tick measures the same maintained folded state",
    }
    doc["stream_scales"]["semdedup_vectors"] = sizes
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps({"update_at_1m": t_update, "compact_sec": compact_sec,
                      "dup_read_sec": dup_read_sec, "preload_sec": preload_sec,
                      "exponent": row["exponent"],
                      "exponent_tail": row["exponent_tail"]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
