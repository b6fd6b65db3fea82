#!/usr/bin/env python
"""One-off 1M-vector point for the IVFADC maintainer (update + probe).

Companion to semdedup_1m_point.py: the production ANN's update AND
serving-probe cost at a state 5x beyond the 200k axis. One honest
caveat recorded in the merged note: the sf0.1 bootstrap has 2000
distinct vectors, so the coarse quantizer is bootstrap-bounded at 2000
cells here (the n//256 formula asks for 3906) — occupancy grows to
~500 instead of 256, which makes this a PESSIMISTIC occupancy point
for the probe (each probed cell holds ~2x the design target).
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

from _curve_util import median_times  # noqa: E402

SF01 = "/root/testdata/sf0.1"
N = 1_000_000
PRELOAD_BATCH = 4_000
COMPACT_EVERY = 32
UPDATE_VECS = 200  # the axis's timed micro-batch size
RUNS = 3


def main() -> None:
    import numpy as np

    from moc_indexer_spark.session import get_spark, ship_package
    from moc_indexer_spark.streaming.ivf_stream import (
        IncrementalIvfPqIndex,
        compact_index,
    )

    spark = get_spark(app_name="ivfpq-1m-point")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    src = spark.read.parquet(f"{SF01}/embeddings.parquet")
    vecs = [list(r.embedding) for r in src.select("embedding").collect()]
    rng = np.random.default_rng(17)
    queries = [(10**9 + i, vecs[i]) for i in range(32)]
    n_cells = min(len(vecs), N // 256)  # bootstrap-bounded (see module doc)

    d = tempfile.mkdtemp(prefix="ivfpq_1m_")
    idx = IncrementalIvfPqIndex(
        spark, os.path.join(d, "ix"), compact_every=COMPACT_EVERY
    )
    idx.train(src, n_cells=n_cells)

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
    compact_index(idx)
    compact_sec = round(time.perf_counter() - t0, 3)

    def one_update():
        nonlocal done, bid
        pick = rng.integers(0, len(vecs), size=UPDATE_VECS)
        rows = [(done + j, vecs[int(p)]) for j, p in enumerate(pick)]
        idx.update(spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"), bid)
        done += UPDATE_VECS
        bid += 1

    one_update()  # warm
    t_update = median_times(one_update, RUNS)

    def one_probe():
        idx.probe(queries).write.format("noop").mode("overwrite").save()

    one_probe()  # warm
    t_probe = median_times(one_probe, RUNS)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE.json",
    )
    with open(out_path) as fh:
        doc = json.load(fh)
    at_1m = {
        "preload_sec": preload_sec, "compact_sec": compact_sec,
        "preload_batch": PRELOAD_BATCH, "compact_every": COMPACT_EVERY,
        "n_cells": n_cells,
        "note": "bootstrap-bounded 2000 cells (formula asks 3906), so "
                "occupancy ~500 = a PESSIMISTIC occupancy point; coarser "
                "preload cadence (4000/32) than the axis (1000/16). The "
                "defensible claim: update/probe at 1M <= the same-order "
                "cost at 200k — size-independent past cell saturation.",
    }
    for name, t in (("ivfpq_update_vs_index_size", t_update),
                    ("ivfpq_probe_vs_index_size", t_probe)):
        row = doc["stream_results"][name]
        row["t"][str(N)] = t
        row["at_1m"] = at_1m
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps({"update_at_1m": t_update, "probe_at_1m": t_probe,
                      "compact_sec": compact_sec,
                      "preload_sec": preload_sec}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
