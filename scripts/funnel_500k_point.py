#!/usr/bin/env python
"""One-off 500k-doc point for funnel_tick_vs_corpus_size.

The axis (scale_curve_stream --only funnel) stops at 50k docs; this
prices the composed streaming-curation-funnel tick — every tier's
incremental maintenance in one process_batch — at 10x the axis ceiling
and 100x sf0.1, the same standard the individual maintainers carry
(near-dup 500k, SemDeDup/IVFADC 1M). Uses the near-dup 500k point's
corpus profile (token-shuffled sf0.1 resamples, dup_frac 2%) so the
pair path stays realistic, plus a synthetic embedding sidecar mapping
every id to its base doc's vector so the semantic tier ingests a
vector per gated doc at every tick. Runs under the auto-compaction
policy (the maintained-index posture).

Merges the point into funnel_tick_vs_corpus_size and records the
publish cost + preload under "at_500k".
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

from _curve_util import (  # noqa: E402
    fit_exponent,
    gen_shuffled_chunk,
    median_times,
    write_id_mapped_sidecar,
)

SF01 = "/root/testdata/sf0.1"
N = 500_000
PRELOAD_BATCH = 25_000
TICK = 250
RUNS = 3
DUP_FRAC = 0.02
RESERVOIR = 1_000
COMPACT_EVERY = 16

SCHEMA = "doc_id long, text string, lang string, source string"


def _gen_chunk(rng, base_rows, start_id, n, reservoir):
    """Shared corpus profile — see _curve_util.gen_shuffled_chunk."""
    return gen_shuffled_chunk(
        rng, base_rows, start_id, n, reservoir,
        dup_frac=DUP_FRAC, reservoir_cap=RESERVOIR,
    )


def main() -> None:
    import numpy as np

    from moc_indexer_spark.session import get_spark, ship_package
    from moc_indexer_spark.streaming.funnel import StreamingCurationFunnel

    spark = get_spark(app_name="funnel-500k-point")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    docs_src = spark.read.parquet(f"{SF01}/documents.parquet")
    # (tokens, lang, source): gen_shuffled_chunk emits (id, text, ...)
    base_rows = [
        (r.text.split(" "), r.lang, r.source)
        for r in docs_src.select("text", "lang", "source").collect()
    ]
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    rng = np.random.default_rng(53)
    reservoir: list = []

    d = tempfile.mkdtemp(prefix="funnel_500k_")
    side = os.path.join(d, "emb")
    write_id_mapped_sidecar(spark, emb, N + 16 * TICK, side)
    funnel = StreamingCurationFunnel(
        spark, os.path.join(d, "state"),
        embeddings_path=side, expected_corpus_rows=N,
        compact_every=COMPACT_EVERY,
    )

    t0 = time.perf_counter()
    done, bid = 0, 0
    while done < N:
        m = min(PRELOAD_BATCH, N - done)
        funnel.process_batch(
            spark.createDataFrame(
                _gen_chunk(rng, base_rows, done, m, reservoir), SCHEMA
            ),
            bid,
        )
        done += m
        bid += 1
        print(json.dumps({"preloaded": done,
                          "elapsed_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    preload_sec = round(time.perf_counter() - t0, 1)

    def one_tick():
        nonlocal done, bid
        funnel.process_batch(
            spark.createDataFrame(
                _gen_chunk(rng, base_rows, done, TICK, reservoir), SCHEMA
            ),
            bid,
        )
        done += TICK
        bid += 1

    one_tick()  # warm
    t_tick = median_times(one_tick, RUNS)

    t0 = time.perf_counter()
    publish_phases: dict = {}
    pub = funnel.publish(os.path.join(d, "out"), timings=publish_phases)
    publish_sec = round(time.perf_counter() - t0, 1)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE.json",
    )
    with open(out_path) as fh:
        doc = json.load(fh)
    row = doc["stream_results"]["funnel_tick_vs_corpus_size"]
    row["t"][str(N)] = t_tick
    sizes = sorted(int(k) for k in row["t"])
    row["exponent"] = fit_exponent(
        [s / sizes[0] for s in sizes], [row["t"][str(s)] for s in sizes]
    )
    row["at_500k"] = {
        "preload_sec": preload_sec,
        "publish_sec": publish_sec,
        "publish_phases": publish_phases,
        "compact_every": COMPACT_EVERY,
        "funnel": {k: v for k, v in pub.items()
                   if isinstance(v, int)},
        "corpus": f"token-shuffled sf0.1 resamples, dup_frac={DUP_FRAC}",
        "note": "direct process_batch ticks under the policy — same "
                "methodology as the 5k-50k axis points; publish is the "
                "O(corpus) release-cadence artifact cut",
    }
    scales = doc.setdefault("stream_scales", {})
    scales["funnel_docs"] = sorted(set(
        scales.get("funnel_docs", []) + sizes
    ))
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps({"tick_at_500k": t_tick, "publish_sec": publish_sec,
                      "publish_phases": publish_phases,
                      "preload_sec": preload_sec,
                      "exponent": row["exponent"],
                      "funnel": row["at_500k"]["funnel"]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
