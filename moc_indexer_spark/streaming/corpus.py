"""Streaming corpus ingestion: the LLM-data cleaning pipeline under
Structured Streaming — documents arrive as files, are quality-gated and
exact-deduped INCREMENTALLY, and land in a keyed corpus table.

This is the streaming form of the batch `training_corpus_filter` tiers
(plans/llm_registry.py): the quality gate is the same stateless expression
block (batch/stream parity by construction), and exact dedup becomes a
keyed MERGE into the corpus table — the arrival-order-independent keeper
rule (min doc_id per content hash) is enforced with the sink's monotonic
version guard (T8, moc_balances.py:127-136 analog), so replays and late
files converge to the same corpus.

At 100 TB: the gate is map-only (scan-side filter); the only shuffle is
the per-batch content-hash dedup; the MERGE key (md5) is uniform so the
sink partitioning never skews. State lives in the table, not the stream
(no unbounded dropDuplicates state) — the same design the reference uses
for idempotent tx upserts (scan_raw_txs.py:51-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from .sink import ParquetUpsertTable

MIN_TOKENS = 5
MIN_QUALITY = 0.35


def quality_gate(docs: DataFrame) -> DataFrame:
    """Stateless scoring + floor — identical expressions batch or stream
    (the training_corpus_filter quality tier)."""
    s = docs.select(
        "doc_id",
        "text",
        "source",
        F.md5("text").alias("content_hash"),
        T.token_count().alias("tc"),
        T.distinct_token_count().alias("dt"),
        T.stopword_count().alias("sw"),
    ).filter(F.col("tc") >= MIN_TOKENS)
    score = (
        (F.col("sw").cast("double") / F.col("tc").cast("double")) * 0.3
        + (F.col("dt").cast("double") / F.col("tc").cast("double")) * 0.4
        + F.least(F.col("tc").cast("double") / 100.0, F.lit(1.0)) * 0.3
    )
    return s.select(
        "doc_id",
        "content_hash",
        "source",
        F.col("tc").cast("bigint").alias("token_count"),
        score.alias("quality_score"),
    ).filter(F.col("quality_score") >= MIN_QUALITY)


def corpus_table(spark: SparkSession, path: str) -> ParquetUpsertTable:
    """Corpus keyed by content hash; version = -doc_id so the MERGE's
    monotonic guard keeps the SMALLEST doc_id as keeper regardless of
    arrival order (idempotent under replay)."""
    return ParquetUpsertTable(
        spark, path, keys=["content_hash"], version_col="neg_id"
    )


def _prepare(batch: DataFrame) -> DataFrame:
    # in-batch coalescing (T7 analog): one row per content hash, min doc_id
    gated = quality_gate(batch).withColumn("neg_id", -F.col("doc_id"))
    w = Window.partitionBy("content_hash").orderBy(F.asc("doc_id"))
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def run_corpus_stream_available_now(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint_dir: str,
    schema=None,
) -> ParquetUpsertTable:
    """Drain all available document files into the corpus table (the
    deterministic-replay mode; production uses a processing-time trigger)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    tbl = corpus_table(spark, out_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tbl.upsert(_prepare(batch_df))

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return tbl


def corpus_batch_reference(docs: DataFrame) -> DataFrame:
    """The batch-mode answer the stream must converge to: quality gate +
    min-doc_id keeper per content hash (order-free formulation)."""
    gated = quality_gate(docs)
    w = Window.partitionBy("content_hash").orderBy(F.asc("doc_id"))
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("neg_id", -F.col("doc_id"))
    )
