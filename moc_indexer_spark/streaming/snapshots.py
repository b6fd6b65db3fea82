"""Per-block snapshot tasks (tasks 3/4/6): Price, MocState, MocState_status.

Reference (/root/reference/indexer/):
- scan_moc_prices.py:40-113        per-block price rows via multicall at a
                                   historical block; unique blockHeight
- scan_moc_state.py:25-109         wide system-state snapshot; SINGLETON
                                   latest row + append-only history
- scan_moc_state_status.py:217-259 per-block health flags
- moc_prices.py:64-66              derived price invariant:
                                   bprox2PriceInUsd = bprox2PriceInRbtc *
                                   bitcoinPrice / reservePrecision

Spark-first: a block range becomes a DataFrame via the same mapPartitions
batching as the chain source (S7); derived prices are decimal expressions;
the Mongo "singleton" (find_one_and_update({}, ...)) becomes a latest-row
view over the history table (J7) — one source of truth, no second write.
"""

from __future__ import annotations

import hashlib
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import wei

DEC38 = "decimal(38,0)"

# fetch(block_number) -> dict of raw multicall results (wei decimal strings)
StateFetcher = Callable[[int], dict]


def fake_state_fetcher(block_number: int) -> dict:
    """Deterministic stand-in for the multicall reads (moc_prices.py:29-47)."""
    h = hashlib.sha256(f"state:{block_number}".encode()).digest()
    v = int.from_bytes(h[:8], "big")
    btc = (30_000 + v % 20_000) * 10**18
    bprox_rbtc = (10**18 + (v >> 8) % 10**17)
    return {
        "blockHeight": block_number,
        "bitcoinPrice": str(btc),
        "bproPriceInRbtc": str(10**18 + (v >> 16) % 10**17),
        "bprox2PriceInRbtc": str(bprox_rbtc),
        "reservePrecision": str(10**18),
        "globalCoverage": str(2 * 10**18 + (v >> 24) % 10**18),
        "paused": (v % 97) == 0,
        "state": 3 if (v % 13) else 2,
    }


def snapshot_blocks(
    spark: SparkSession, fetcher: StateFetcher, start: int, end: int,
    partitions: int | None = None,
) -> DataFrame:
    """Fetch snapshots for an inclusive block range (one fetch per block,
    batched per partition) and compute the derived price columns as exact
    decimal expressions."""
    from ..session import ship_package

    ship_package(spark)
    blocks = list(range(start, end + 1))
    parts = partitions or min(
        max(len(blocks), 1), spark.sparkContext.defaultParallelism
    )
    schema = (
        "blockHeight long, bitcoinPrice string, bproPriceInRbtc string, "
        "bprox2PriceInRbtc string, reservePrecision string, "
        "globalCoverage string, paused boolean, state int"
    )

    def run(it):
        for bn in it:
            yield fetcher(bn)

    raw = spark.createDataFrame(
        spark.sparkContext.parallelize(blocks, parts).mapPartitions(run), schema
    )
    btc = F.col("bitcoinPrice").cast(DEC38)
    bprox_rbtc = F.col("bprox2PriceInRbtc").cast(DEC38)
    bpro_rbtc = F.col("bproPriceInRbtc").cast(DEC38)
    return raw.select(
        "blockHeight",
        btc.alias("bitcoinPrice"),
        bpro_rbtc.alias("bproPriceInRbtc"),
        bprox_rbtc.alias("bprox2PriceInRbtc"),
        F.col("reservePrecision").cast(DEC38).alias("reservePrecision"),
        # moc_prices.py:64-66 invariant, via the wei multiply
        wei.usd_amount(bprox_rbtc, btc).alias("bprox2PriceInUsd"),
        wei.usd_amount(bpro_rbtc, btc).alias("bproPriceInUsd"),
        F.col("globalCoverage").cast(DEC38).alias("globalCoverage"),
        "paused",
        "state",
    )


def latest_state_view(history: DataFrame) -> DataFrame:
    """The MocState singleton (scan_moc_state.py:106-109) as a latest-row
    view over the history table (J7) — `find_one_and_update({}, ...)`
    disappears; one table serves both the singleton and the history."""
    w = Window.orderBy(F.desc("blockHeight"))
    return (
        history.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
