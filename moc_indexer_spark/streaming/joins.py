"""Stream-stream event-time joins and watermarked stream dedup.

The reference enriches each decoded transaction with price data by
re-querying state per event (mocexchange.py:47-50 reads the price that the
handler fetched for that block). In Spark the same enrichment is a
stream-stream join: the tx stream joins the price stream on an event-time
range condition, and the watermark bounds how much price state each side
buffers — the declarative form of "the price at/just before this tx".

Also here: `dedup_within_watermark`, the streaming-native form of the
reference's dedup-before-insert existence checks (A4: mocinrate.py:82-89)
and pending-queue coalescing (T7: moc_balances.py:174-188) — duplicate keys
arriving within the watermark horizon are dropped with state that expires
automatically, instead of an unbounded seen-keys set.

100 TB notes:
- Stream-stream join state is bounded by (watermark + lookback) per side;
  executors hold only that horizon of the price stream — size it from the
  reorg/confirmation lag (T1/T2), not the table.
- Both operators shuffle on event-time state-store keys; with the price
  side being tiny per horizon, the tx side dominates and partitions by the
  state-store hash — no skew because tx keys are hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_recent_prices(
    txs: DataFrame,
    prices: DataFrame,
    lookback_seconds: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Each tx row joins every price observed in the event-time window
    `[created_at - lookback, created_at]`.

    Spark refuses stream-stream joins without an equality predicate (state
    would be un-partitionable), so the range join is binned: prices key on
    their `lookback_seconds`-wide time bin, each tx probes its own bin and
    the previous one (explode of 2 candidates), and the exact range
    predicate filters inside the bin pair. Bins are disjoint, so no
    duplicate matches and no post-dedup. This is the streaming form of
    `relational.interval_join` — the state store partitions by bin+range
    keys instead of nested-loop state.

    Works identically on batch and streaming inputs (batch ignores
    watermarks) — the parity test feeds both forms the same rows. In
    streaming mode the watermarks let Spark expire join state: a price bin
    older than (watermark + lookback) can never match a future tx.

    Expected columns: txs(tx_hash, created_at, ...); prices(price_ts, price).
    """
    t = txs
    p = prices
    if txs.isStreaming:
        t = t.withWatermark("created_at", watermark)
    if prices.isStreaming:
        p = p.withWatermark("price_ts", watermark)

    def tbin(col):
        return F.floor(F.unix_timestamp(col) / F.lit(lookback_seconds))

    p = p.withColumn("__bin", tbin(F.col("price_ts")))
    t = t.withColumn(
        "__bin",
        F.explode(
            F.array(tbin(F.col("created_at")) - 1, tbin(F.col("created_at")))
        ),
    )
    cond = (F.col("__bin") == F.col("__pbin")) & F.expr(
        f"price_ts >= created_at - INTERVAL {lookback_seconds} SECONDS "
        "AND price_ts <= created_at"
    )
    p = p.withColumnRenamed("__bin", "__pbin")
    return t.join(p, cond, "inner").drop("__bin", "__pbin")


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "created_at",
    delay: str = "30 minutes",
) -> DataFrame:
    """Drop duplicate `keys` arriving within the watermark horizon.

    `dropDuplicatesWithinWatermark` keeps the first-seen row per key and
    expires its memory of a key once the watermark passes `delay` beyond
    that key's event time — at-least-once upstream delivery becomes
    effectively-once downstream with O(horizon) state. Batch inputs fall
    back to plain dropDuplicates (same semantics when all data is present).
    """
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
