"""Streaming SemDeDup maintainer (streaming/semdedup_stream.py): the
incremental state must converge to the batch scaled-SemDeDup answer
under the index's own quantizer — for any slicing, any slice order, and
under replay — and late smaller ids must RETRO-INVALIDATE stale dup
rows (the property that forces per-touched-cell recomputation instead of
pure appends)."""

import pytest
from pyspark.sql import functions as F

from moc_indexer_spark.streaming.semdedup_stream import (
    IncrementalSemDeDup,
    run_semdedup_stream_available_now,
)
from moc_indexer_spark.tables import table

THRESHOLD = 0.35


def _rows(df):
    return sorted((r.vec_id, r.cell, r.dup_of) for r in df.collect())


def _mk_index(spark, path, emb):
    idx = IncrementalSemDeDup(spark, path)
    idx.train(emb, threshold=THRESHOLD)
    return idx


def test_stream_semdedup_equals_batch(spark, sf_dir, tmp_path):
    """Three arrival slices through the availableNow runner == the batch
    operator over the full corpus with the same centroids."""
    emb = table(spark, sf_dir, "embeddings")
    idx = _mk_index(spark, str(tmp_path / "idx"), emb)
    want = _rows(idx.batch_reference(emb))

    src = str(tmp_path / "arrivals")
    for i, (lo, hi) in enumerate([(0, 150), (150, 300), (300, 10**9)]):
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
        run_semdedup_stream_available_now(
            spark, src + "/*", str(tmp_path / "idx"),
            str(tmp_path / "ckpt"), schema=emb.schema,
        )
    assert _rows(idx.duplicates()) == want
    # contract: one row per vector
    assert idx.duplicates().count() == emb.count()


def test_semdedup_stream_slicing_and_order_free(spark, sf_dir, tmp_path):
    """A reversed 2-slice arrival and a single-batch arrival both land on
    the identical state — the keyed-MERGE order-freedom claim."""
    emb = table(spark, sf_dir, "embeddings").limit(200)

    one = _mk_index(spark, str(tmp_path / "one"), emb)
    one.update(emb)
    want = _rows(one.duplicates())
    assert want == _rows(one.batch_reference(emb))

    rev = IncrementalSemDeDup(spark, str(tmp_path / "rev"))
    rev.train(emb, threshold=THRESHOLD)
    hi = emb.filter(F.col("vec_id") >= 100)
    lo = emb.filter(F.col("vec_id") < 100)
    rev.update(hi)   # larger ids FIRST
    rev.update(lo)   # smaller ids arrive late
    assert _rows(rev.duplicates()) == want


def test_semdedup_stream_replay_is_idempotent(spark, sf_dir, tmp_path):
    emb = table(spark, sf_dir, "embeddings").limit(150)
    idx = _mk_index(spark, str(tmp_path / "idx"), emb)
    first = emb.filter(F.col("vec_id") < 75)
    idx.update(first)
    before = _rows(idx.duplicates())
    idx.update(first)  # replayed slice
    assert _rows(idx.duplicates()) == before
    idx.update(emb)    # redelivery of old vectors plus the rest
    assert _rows(idx.duplicates()) == _rows(idx.batch_reference(emb))
    assert idx.vectors.read().count() == 150  # no duplicate state rows


def test_semdedup_late_small_id_retro_invalidates(spark, sf_dir, tmp_path):
    """The defining incremental case: vector B (dup of A, id_A < id_B)
    arrives BEFORE A. On arrival B is a keeper (nothing earlier in its
    cell); when A lands, B's row must flip to dup_of=A."""
    emb = table(spark, sf_dir, "embeddings")
    idx = _mk_index(spark, str(tmp_path / "idx"), emb)
    # find a true dup pair under this quantizer from the batch reference
    ref = idx.batch_reference(emb)
    pair = ref.filter(F.col("dup_of").isNotNull()).orderBy(
        "vec_id").limit(1).collect()[0]
    b_id, a_id = pair.vec_id, pair.dup_of
    assert a_id < b_id

    late = IncrementalSemDeDup(spark, str(tmp_path / "late"))
    late.train(emb, threshold=THRESHOLD)
    rest = emb.filter(F.col("vec_id") != a_id)
    late.update(rest)
    snap = {r.vec_id: r.dup_of for r in late.duplicates().collect()}
    assert snap[b_id] != a_id  # A hasn't arrived; B can't point at it
    late.update(emb.filter(F.col("vec_id") == a_id))  # A arrives late
    snap2 = {r.vec_id: r.dup_of for r in late.duplicates().collect()}
    assert snap2[b_id] == a_id
    # and the full state equals the batch answer over everything
    assert _rows(late.duplicates()) == _rows(ref)


def test_semdedup_train_refusal_and_empty_guard(spark, sf_dir, tmp_path):
    emb = table(spark, sf_dir, "embeddings").limit(50)
    idx = _mk_index(spark, str(tmp_path / "idx"), emb)
    with pytest.raises(ValueError, match="already trained"):
        idx.train(emb)
    untrained = IncrementalSemDeDup(spark, str(tmp_path / "u"))
    with pytest.raises(ValueError, match="train"):
        untrained.update(emb)
    with pytest.raises(ValueError, match="empty"):
        IncrementalSemDeDup(spark, str(tmp_path / "e")).train(
            emb.filter(F.lit(False))
        )


def test_semdedup_resent_id_keeps_first_seen_vector_consistently(
    spark, sf_dir, tmp_path
):
    """A re-delivered id carrying a DIFFERENT payload must be dropped
    from BOTH the keeper recompute and the vector state (first-seen
    wins) — updating one but not the other would let the dup table and
    the stored vector disagree about what the id contains."""
    emb = table(spark, sf_dir, "embeddings").limit(100)
    idx = _mk_index(spark, str(tmp_path / "idx"), emb)
    idx.update(emb)
    before_vecs = sorted(
        (r.vec_id, tuple(r.v)) for r in idx.vectors.read().collect()
    )
    before_dups = _rows(idx.duplicates())

    # re-send every id with a corrupted payload (negated vectors)
    corrupted = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    idx.update(corrupted)
    assert sorted(
        (r.vec_id, tuple(r.v)) for r in idx.vectors.read().collect()
    ) == before_vecs
    assert _rows(idx.duplicates()) == before_dups
