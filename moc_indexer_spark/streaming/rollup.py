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
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    def _last_applied(self) -> int:
        marker = f"{self.path}._batch_id"
        if os.path.exists(marker):
            with open(marker) as fh:
                return int(fh.read().strip())
        return -1

    def _mark_applied(self, batch_id: int) -> None:
        marker = f"{self.path}._batch_id"
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, marker)

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Fold one micro-batch into the stored totals (foreachBatch body).

        Additive state is NOT naturally idempotent: foreachBatch re-delivers
        a batch (same batch_id) after a failure, and re-adding would
        double-count. The applied-batch-id marker makes the fold
        exactly-once — the parquet analog of Delta's txn-version-in-MERGE
        idempotent-write pattern. Direct (batch_id=None) callers manage
        their own replay semantics."""
        if batch_id is not None and batch_id <= self._last_applied():
            return
        delta = self._partial(batch)
        state = self.read_state()
        merged = delta if state is None else (
            state.unionByName(delta)
            .groupBy(*KEYS)
            .agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("sum_value").cast("decimal(28,6)").alias("sum_value"),
            )
        )
        self._atomic_write(merged)
        if batch_id is not None:
            self._mark_applied(batch_id)

    def attach(self, events_stream: DataFrame, checkpoint: str):
        """Wire onto a stream: every micro-batch maintains the rollup."""
        return (
            events_stream.writeStream.foreachBatch(self.update)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- serving ------------------------------------------------------------

    def serve(self) -> DataFrame:
        """Serving view matching the batch `tumbling_agg` schema exactly."""
        s = self.read_state()
        return s.select(
            "window_start",
            "event_type",
            "n_events",
            F.col("sum_value").cast("decimal(18,4)").cast("double").alias(
                "total_value"
            ),
        )

    def _atomic_write(self, df: DataFrame) -> None:
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        df.repartition(self.n_buckets, *KEYS).write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
