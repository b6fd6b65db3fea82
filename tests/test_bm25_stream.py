"""Streaming BM25 index: stream-built state must equal the batch
operator exactly; folds must be replay-safe."""

from pyspark.sql import functions as F

from moc_indexer_spark.operators.retrieval import bm25_topk
from moc_indexer_spark.streaming.bm25_stream import (
    IncrementalBm25Index,
    run_bm25_index_stream_available_now,
)
from moc_indexer_spark.tables import table


def _rows(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, r.score) for r in df.collect()
    )


def test_stream_index_equals_batch(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    src = str(tmp_path / "arrivals")
    schema = docs.schema
    # files arrive between stream drains; ONE checkpoint so micro-batch
    # ids keep incrementing across the three availableNow runs
    idx = None
    for i, frac in enumerate([(0, 150), (150, 350), (350, 10**9)]):
        docs.filter(
            (F.col("doc_id") >= frac[0]) & (F.col("doc_id") < frac[1])
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
        idx = run_bm25_index_stream_available_now(
            spark,
            src + "/*",
            str(tmp_path / "index"),
            str(tmp_path / "ckpt"),
            schema=schema,
        )
    assert _rows(idx.probe()) == _rows(bm25_topk(docs))


def test_duplicate_and_replayed_batches_are_idempotent(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma") for i in range(20)],
        "doc_id long, text string",
    )
    idx = IncrementalBm25Index(spark, str(tmp_path / "idx"))
    first = docs.filter(F.col("doc_id") < 10)
    idx.update(first, batch_id=0)
    # replay of the same batch id is a no-op
    idx.update(first, batch_id=0)
    # second batch re-delivers old docs plus new ones; only new docs fold
    idx.update(docs, batch_id=1)
    q = [(0, "alpha")]
    got = idx.probe(queries=q, k=30)
    expect = bm25_topk(docs, queries=q, k=30)
    assert _rows(got) == _rows(expect)
    stats = spark.read.parquet(str(tmp_path / "idx/stats")).collect()[0]
    assert stats.n_docs == 20


def test_probe_on_fresh_index_is_empty(spark, tmp_path):
    idx = IncrementalBm25Index(spark, str(tmp_path / "empty_idx"))
    out = idx.probe()
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "doc_id", "score"]


def test_in_batch_duplicate_doc_ids_pick_deterministic_keeper(spark, tmp_path):
    rows = [(7, "zz yy"), (7, "aa bb"), (8, "cc dd")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = IncrementalBm25Index(spark, str(tmp_path / "a"))
    b = IncrementalBm25Index(spark, str(tmp_path / "b"))
    a.update(docs, 0)
    b.update(spark.createDataFrame(list(reversed(rows)),
                                   "doc_id long, text string"), 0)
    pa = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "a/postings")).drop("batch").collect()))
    pb = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "b/postings")).drop("batch").collect()))
    assert pa == pb  # arrival order cannot change the indexed content
