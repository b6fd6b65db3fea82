"""Incrementally-maintained rollup (continuous aggregate).

The streaming form of `operators/pipeline.rollup_grains`: a (bucket,
group) aggregate table kept up to date by ADDING each micro-batch's
partial aggregates into the stored totals — the hypertable
continuous-aggregate / materialized-view-maintenance pattern.

Why additive merge instead of Spark's stateful streaming aggregation:
the state here IS the serving table (queryable between batches, survives
restarts without replaying the stream, no watermark eviction — buckets
stay updatable forever, which matches the reference's re-scannable
Mongo histories, e.g. indexer/scan_moc_prices.py:98-113). Counts and
sums are kept in exact types (bigint / DECIMAL) so merge order never
changes results; doubles appear only in `serve()`.

At scale: each batch shuffles only its OWN (bucket, group) cells —
partial aggregation happens map-side — and the combine touches ~|delta
cells| rows of state. With a lakehouse table format the combine is
`MERGE INTO ... WHEN MATCHED THEN UPDATE SET n = n + delta.n`; here the
state rewrite is hash-bucketed parquet like streaming/sink.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .swap import recover_swap, swap_dir

KEYS = ["window_start", "event_type"]


class IncrementalRollup:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        width: str = "1 minute",
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.width = width
        self.n_buckets = n_buckets
        # finish/abort a swap a previous process crashed inside (state
        # would otherwise read as absent and the next batch would rebuild
        # from one delta). _batch_id is a required completeness marker:
        # Spark's _SUCCESS commits BEFORE _atomic_write appends it, so a
        # crash in that gap must roll back — installing marker-less state
        # would read _last_applied() == -1 and double-fold the redelivery
        recover_swap(self.path, required=("_batch_id",))

    # -- state --------------------------------------------------------------

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") or f == "_SUCCESS"
            for f in os.listdir(self.path)
        )

    def read_state(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if self._exists() else None

    # -- maintenance --------------------------------------------------------

    def _partial(self, batch: DataFrame) -> DataFrame:
        """Exact partial aggregates for one micro-batch (additive types)."""
        return (
            batch.groupBy(
                F.window("ts", self.width)["start"].alias("window_start"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("decimal(28,6)")
                .alias("sum_value"),
            )
        )

    def _merge_agg(self) -> list:
        """Combine exprs folding (state ∪ delta) partials — every expr must
        be associative+commutative over the partial schema, which is what
        makes fold order (and batch boundaries) irrelevant."""
        return [
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").cast("decimal(28,6)").alias("sum_value"),
        ]

    def _last_applied(self) -> int:
        # the marker lives INSIDE the state dir (underscore-prefixed, so
        # parquet reads ignore it) and is written into the swap's tmp
        # BEFORE the install rename: state and marker move as one unit,
        # so no crash window can apply a batch without recording it (or
        # record it without applying). A sidecar marker written after the
        # state swap had exactly that window — crash between the two and
        # the replay double-counted the batch.
        marker = os.path.join(self.path, "_batch_id")
        if os.path.exists(marker):
            with open(marker) as fh:
                return int(fh.read().strip())
        return -1

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Fold one micro-batch into the stored totals (foreachBatch body).

        Additive state is NOT naturally idempotent: foreachBatch re-delivers
        a batch (same batch_id) after a failure, and re-adding would
        double-count. The applied-batch-id marker — swapped in atomically
        WITH the state it describes — makes the fold exactly-once, the
        parquet analog of Delta's txn-version-in-MERGE idempotent-write
        pattern. Direct (batch_id=None) callers manage their own replay
        semantics; the last applied id is carried forward so mixing direct
        and stream-driven updates never forgets stream progress."""
        last = self._last_applied()
        if batch_id is not None and batch_id <= last:
            return
        delta = self._partial(batch)
        state = self.read_state()
        merged = delta if state is None else (
            state.unionByName(delta).groupBy(*KEYS).agg(*self._merge_agg())
        )
        self._atomic_write(merged, last if batch_id is None else batch_id)

    def attach(self, events_stream: DataFrame, checkpoint: str):
        """Wire onto a stream: every micro-batch maintains the rollup."""
        return (
            events_stream.writeStream.foreachBatch(self.update)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- serving ------------------------------------------------------------

    _SERVE_DDL = ("window_start timestamp, event_type string, "
                  "n_events bigint, total_value double")

    def serve(self) -> DataFrame:
        """Serving view matching the batch `tumbling_agg` schema exactly.
        A never-updated rollup serves an empty typed relation, not an
        AttributeError."""
        s = self.read_state()
        if s is None:
            return self.spark.createDataFrame([], self._SERVE_DDL)
        return s.select(
            "window_start",
            "event_type",
            "n_events",
            F.col("sum_value").cast("decimal(18,4)").cast("double").alias(
                "total_value"
            ),
        )

    def _atomic_write(self, df: DataFrame, batch_id: int = -1) -> None:
        def _write(tmp: str) -> None:
            (df.repartition(self.n_buckets, *KEYS)
             .write.mode("overwrite").parquet(tmp))
            # marker INSIDE the swapped dir — see _last_applied
            with open(os.path.join(tmp, "_batch_id"), "w") as fh:
                fh.write(str(batch_id))

        swap_dir(self.path, _write, required=("_batch_id",))


class IncrementalCandles(IncrementalRollup):
    """Streaming OHLC candles — the continuous-aggregate form of the batch
    `hourly_ohlc` query, and the proof the pattern extends past ADDITIVE
    state: open/close are not sums, but they ARE mergeable — each partial
    keeps min/max of the orderable struct (ts, event_id, value), and
    struct-min/max is associative + commutative, so folding micro-batches
    in any order (or any slicing) reproduces the batch candle exactly.
    high/low/count/sum merge the same way; doubles only surface in
    `serve()`, so state stays exact.

    At scale this is the market-data "bar builder" kept as a serving table:
    each batch shuffles only its own (bucket, event_type) cells and the
    combine touches |delta cells| state rows — no stream replay, no
    watermark eviction, late trades amend their bar forever."""

    def _partial(self, batch: DataFrame) -> DataFrame:
        key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
        return (
            batch.groupBy(
                F.window("ts", self.width)["start"].alias("window_start"),
                "event_type",
            )
            .agg(
                F.min(key).alias("open_k"),
                F.max(key).alias("close_k"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("decimal(28,6)")
                .alias("sum_value"),
            )
        )

    def _merge_agg(self) -> list:
        return [
            F.min("open_k").alias("open_k"),
            F.max("close_k").alias("close_k"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").cast("decimal(28,6)").alias("sum_value"),
        ]

    _SERVE_DDL = ("window_start timestamp, event_type string, "
                  "open double, high double, low double, close double, "
                  "n_trades bigint, avg_price double")

    def serve(self) -> DataFrame:
        s = self.read_state()
        if s is None:
            return self.spark.createDataFrame([], self._SERVE_DDL)
        return s.select(
            "window_start",
            "event_type",
            F.col("open_k").getField("value").alias("open"),
            "high",
            "low",
            F.col("close_k").getField("value").alias("close"),
            F.col("n_events").alias("n_trades"),
            (
                F.col("sum_value").cast("decimal(18,4)").cast("double")
                / F.col("n_events").cast("double")
            ).alias("avg_price"),
        )


class IncrementalMoments(IncrementalRollup):
    """First + second moments as mergeable state: per (window, event_type)
    keep n / Σx / Σx² in exact types, so streaming mean/stddev — the stats
    side of the z-score alerting query (q_value_zscore_outliers) — is
    maintained incrementally with the same fold-order-proof guarantee.
    Any moment-based statistic (variance, stddev, correlation via Σxy)
    extends the same way: sums are the universal mergeable form."""

    def _partial(self, batch: DataFrame) -> DataFrame:
        # both square factors at decimal(18,6): the product is
        # decimal(37,12), so any |value| < 10^12 squares exactly — a
        # narrower factor (a previous (12,6) cast) silently NULLed values
        # >= 10^6 under non-ANSI decimal overflow, dropping them from the
        # second moment while n/Σx still counted them
        v = F.col("value")
        v18 = v.cast("decimal(18,6)")
        return (
            batch.groupBy(
                F.window("ts", self.width)["start"].alias("window_start"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(v.cast("decimal(18,6)"))
                .cast("decimal(28,6)")
                .alias("sum_value"),
                F.sum(v18 * v18)
                .cast("decimal(38,12)")
                .alias("sum_sq"),
            )
        )

    def _merge_agg(self) -> list:
        return [
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").cast("decimal(28,6)").alias("sum_value"),
            F.sum("sum_sq").cast("decimal(38,12)").alias("sum_sq"),
        ]

    _SERVE_DDL = ("window_start timestamp, event_type string, "
                  "n_events bigint, mean_value double, std_value double")

    def serve(self) -> DataFrame:
        s = self.read_state()
        if s is None:
            return self.spark.createDataFrame([], self._SERVE_DDL)
        nd = F.col("n_events").cast("double")
        sx = F.col("sum_value").cast("decimal(18,4)").cast("double")
        # sum_sq goes straight to double: the (18,4) serving bridge caps
        # at 10^14, which a running Σx² outgrows long before Σx does
        sxx = F.col("sum_sq").cast("double")
        mean = sx / nd
        # clamp: x²-x̄² computed via two double paths can undershoot zero by
        # an ulp for singleton cells → sqrt(NaN) without the guard
        var = F.greatest(sxx / nd - mean * mean, F.lit(0.0))
        return s.select(
            "window_start",
            "event_type",
            "n_events",
            mean.alias("mean_value"),
            F.sqrt(var).alias("std_value"),
        )
