#!/usr/bin/env python
"""Ingest-path benchmark: the streaming-write analog of bench.py.

Measures the full incremental pipeline (block scan -> event decode/demux/
enrich -> 6 keyed upsert sinks) on the deterministic FakeChain, in both
sink modes, and prints ONE JSON line:

  {"metric": "ingest", "cycle_sec": {"cow": ..., "mor": ...},
   "catchup_blocks_per_sec": ..., "txs_per_block": 20}

Methodology (matches PLANS.md "Incremental-cycle latency"): warm by
indexing 2000 blocks, then time five 10-block cycles (median reported) —
the reference's 3-second-tick shape; catch-up throughput is one 500-block
cycle on the MoR sinks.

`measure(spark)` is importable so bench.py can fold the ingest numbers
into BENCH_DETAIL.json each round (the round-4 verdict flagged that the
MoR cycle's headroom under the 3 s tick had no per-round artifact).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moc_indexer_spark.session import get_spark, ship_package  # noqa: E402


def measure(spark) -> dict:
    """Run the ingest benchmark on an existing session; return the metric
    dict (no printing, no session lifecycle)."""
    from moc_indexer_spark.app import CONTRACTS, USERS, Indexer
    from moc_indexer_spark.sources.chain import FakeChain

    ship_package(spark)
    txs_per_block = 20
    cycle_sec: dict[str, float] = {}
    for mode in ("cow", "mor"):
        d = tempfile.mkdtemp(prefix=f"ingest_bench_{mode}_")
        ix = Indexer(spark, d, FakeChain(CONTRACTS, USERS, txs_per_block),
                     CONTRACTS, sink_mode=mode)
        ix.run_incremental(tip=2000)  # warm + build table history
        lat = []
        for tip in range(2010, 2060, 10):
            t0 = time.perf_counter()
            ix.run_incremental(tip=tip)
            lat.append(time.perf_counter() - t0)
        cycle_sec[mode] = round(statistics.median(lat), 3)

    d = tempfile.mkdtemp(prefix="ingest_bench_tp_")
    ix = Indexer(spark, d, FakeChain(CONTRACTS, USERS, txs_per_block),
                 CONTRACTS, sink_mode="mor")
    ix.run_incremental(tip=100)
    t0 = time.perf_counter()
    ix.run_incremental(tip=600)
    bps = round(500 / (time.perf_counter() - t0), 1)

    return {
        "metric": "ingest",
        "cycle_sec": cycle_sec,
        "catchup_blocks_per_sec": bps,
        "txs_per_block": txs_per_block,
    }


def main() -> None:
    spark = get_spark(app_name="moc-indexer-ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = measure(spark)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
