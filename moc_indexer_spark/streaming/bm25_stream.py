"""Incrementally-maintained BM25 inverted index under Structured
Streaming.

No reference analog (BASELINE.json north star) — the streaming sibling of
`operators/retrieval.py`: documents arrive as files and the four index
relations are maintained incrementally, so a probe never rescans the
corpus. This is the text-index counterpart of the streaming near-dedup
and incremental-rollup maintainers (same exactly-once discipline).

Incremental shape per micro-batch (new docs only — batch work is
O(batch), never O(corpus)):

* `postings` / `lengths`: written to a `batch=N` partition directory with
  overwrite — replays of a failed batch overwrite the same directory, so
  appends are idempotent WITHOUT a transaction log (the
  partition-per-batch trick). New-doc detection anti-joins the batch
  against lengths partitions from EARLIER batches only, so a replay
  recomputes the identical delta even after its own partial writes.
* `dfreq` / `stats`: additive aggregates folded state∪delta with an
  atomic directory swap and an applied-batch-id marker
  (IncrementalRollup's exactly-once pattern) — folds are the only
  non-idempotent step, so the marker is checked first and advanced last.
* probe: `bm25_from_index()` hands the four maintained relations to the
  SAME `_score_probe` the batch operator uses — parity is by
  construction, and the test certifies stream-built == batch-built
  exactly.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import retrieval as RT


class IncrementalBm25Index:
    """Parquet-backed BM25 index maintained one micro-batch at a time.

    The applied-batch-id marker assumes ONE owning stream/checkpoint for
    the index's lifetime (batch ids restart at 0 under a fresh
    checkpoint, which the marker would read as already-applied) — the
    same single-writer contract every Structured Streaming sink has."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/") or path
        os.makedirs(self.path, exist_ok=True)

    # -- state ---------------------------------------------------------------

    def _dir(self, name: str) -> str:
        return f"{self.path}/{name}"

    def _has(self, name: str) -> bool:
        d = self._dir(name)
        return os.path.isdir(d) and any(
            not f.startswith(("_", ".")) for f in os.listdir(d)
        )

    def _last_applied(self) -> int:
        marker = f"{self.path}/_batch_id"
        if os.path.exists(marker):
            with open(marker) as fh:
                return int(fh.read().strip())
        return -1

    def _mark_applied(self, batch_id: int) -> None:
        marker = f"{self.path}/_batch_id"
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, marker)

    def _atomic_swap(self, df: DataFrame, name: str) -> None:
        dst = self._dir(name)
        tmp = f"{dst}__new_{uuid.uuid4().hex[:8]}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = f"{dst}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(dst):
            os.replace(dst, old)
        os.replace(tmp, dst)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    def _read_partitioned(self, name: str, before_batch: int | None = None) -> DataFrame | None:
        if not self._has(name):
            return None
        df = self.spark.read.parquet(self._dir(name))
        if before_batch is not None:
            df = df.filter(F.col("batch") < before_batch)
        return df.drop("batch")

    # -- maintenance ---------------------------------------------------------

    def update(self, batch_docs: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch of documents into the index (foreachBatch
        body). Safe under replay of any prefix of its steps."""
        if batch_id <= self._last_applied():
            return
        w = Window.partitionBy("doc_id").orderBy("doc_id")
        batch = (
            batch_docs.select("doc_id", "text")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        seen = self._read_partitioned("lengths", before_batch=batch_id)
        if seen is not None:
            batch = batch.join(
                seen.select("doc_id"), "doc_id", "left_anti"
            )
        postings, lengths, dfreq_delta, stats_delta = RT._index_relations(
            batch
        )
        lengths.write.mode("overwrite").parquet(
            f"{self._dir('lengths')}/batch={batch_id}"
        )
        postings.write.mode("overwrite").parquet(
            f"{self._dir('postings')}/batch={batch_id}"
        )

        dfreq_state = (
            self.spark.read.parquet(self._dir("dfreq"))
            if self._has("dfreq")
            else None
        )
        dfreq = dfreq_delta if dfreq_state is None else (
            dfreq_state.unionByName(dfreq_delta)
            .groupBy("term")
            .agg(F.sum("df").cast("bigint").alias("df"))
        )
        self._atomic_swap(dfreq, "dfreq")

        stats_state = (
            self.spark.read.parquet(self._dir("stats"))
            if self._has("stats")
            else None
        )
        stats = stats_delta if stats_state is None else (
            stats_state.unionByName(stats_delta).agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("sum_dl").cast("bigint").alias("sum_dl"),
            )
        )
        self._atomic_swap(stats, "stats")
        self._mark_applied(batch_id)

    # -- probe ---------------------------------------------------------------

    def probe(
        self,
        queries: list[tuple[int, str]] | None = None,
        k: int = RT.TOP_K,
        k1: float = RT.K1,
        b: float = RT.B,
    ) -> DataFrame:
        queries = RT.QUERIES if queries is None else queries
        terms = sorted({t for _, q in queries for t in q.split(" ")})
        postings = self._read_partitioned("postings").filter(
            F.col("term").isin(terms)
        )
        return RT._score_probe(
            postings,
            self._read_partitioned("lengths"),
            self.spark.read.parquet(self._dir("dfreq")),
            self.spark.read.parquet(self._dir("stats")),
            RT._qterms(self.spark, queries),
            k, k1, b,
        )


def run_bm25_index_stream_available_now(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema=None,
) -> IncrementalBm25Index:
    """Drain all available document files into the index (deterministic
    replay mode; production uses a processing-time trigger)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    idx = IncrementalBm25Index(spark, index_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx.update(batch_df, batch_id)

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return idx
