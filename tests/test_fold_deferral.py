"""Off-tick fold deferral (round 10): with `fold_budget_sec`, a due
minor fold is SKIPPED when the tick's own work already consumed the
budget — counted in `deferred_folds` — and the still-crossed threshold
fires it on a later tick where the budget allows. The semantics are
physical-only: folding never changes answers (pinned by the existing
fold-invariance tests), so these tests pin the POLICY mechanics:
budget 0 defers every due fold, budget None folds unconditionally, and
a deferred fold still runs once the budget permits.
"""

import pytest

from moc_indexer_spark.streaming.compaction import list_committed_batches
from moc_indexer_spark.streaming.corpus import IncrementalNearDup
from moc_indexer_spark.streaming.semdedup_stream import IncrementalSemDeDup


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def _doc_batch(spark, start, n=4):
    rows = [
        (start + i,
         f"alpha beta gamma delta epsilon zeta eta theta doc {start + i} "
         "the quick brown fox jumps over the lazy dog again and again")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_neardedup_budget_zero_defers_then_folds(spark, workdir):
    idx = IncrementalNearDup(
        spark, f"{workdir}/near", compact_every=2, fold_budget_sec=0.0
    )
    for b in range(3):
        idx.update(_doc_batch(spark, 100 * b), b)
    # every due fold deferred: flat dirs accreted past the threshold
    assert idx.deferred_folds >= 1
    flats = [
        b for b in list_committed_batches(f"{idx.state_dir}/feats")
        if not idx._is_fold("feats", b)
    ]
    assert len(flats) >= 2
    # lift the budget: the crossed threshold fires on the next check
    idx._fold_budget_sec = None
    assert idx._maybe_compact_one() is not None


def test_neardedup_no_budget_folds_unconditionally(spark, workdir):
    idx = IncrementalNearDup(spark, f"{workdir}/near", compact_every=2)
    for b in range(3):
        idx.update(_doc_batch(spark, 100 * b), b)
    assert idx.deferred_folds == 0
    # at least one unit folded under pressure (bands/feats/pairs round-
    # robin; each tick folds at most one)
    folds = [
        b for b in list_committed_batches(f"{idx.state_dir}/feats")
        if idx._is_fold("feats", b)
    ] + [
        b for b in list_committed_batches(f"{idx.state_dir}/bands")
        if idx._is_fold("bands", b)
    ]
    assert folds


def _vec_batch(spark, start, n=8):
    rows = [
        (start + i, [float((start + i) % 7), float((start + i) % 5), 1.0])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_budget_zero_defers_then_folds(spark, workdir):
    idx = IncrementalSemDeDup(
        spark, f"{workdir}/sem", compact_every=2, fold_budget_sec=0.0
    )
    idx.train(_vec_batch(spark, 0, 32), threshold=0.2)
    for b in range(3):
        idx.update(_vec_batch(spark, 1000 * (b + 1)), b)
    assert idx.deferred_folds >= 1
    flats = [
        b for b in list_committed_batches(idx._vectors_dir())
        if not idx._is_fold(b)
    ]
    assert len(flats) >= 2
    idx._fold_budget_sec = None
    assert idx._maybe_compact_one() is not None


def test_funnel_threads_composed_tick_start_into_budgets(spark, workdir):
    """Round-10 soak finding: a funnel-scale fold budget must gate on
    the COMPOSED tick's elapsed, not each maintainer's own slice (a
    10 s budget never fired against 1-3 s per-maintainer slices inside
    8-12 s composed ticks). Pin the wiring: process_batch passes its
    own tick start into the maintainers' updates, and a budget of 0
    defers the due near-dup fold, observably."""
    from moc_indexer_spark.streaming.funnel import StreamingCurationFunnel

    funnel = StreamingCurationFunnel(
        spark, f"{workdir}/state", compact_every=1, fold_budget_sec=0.0
    )
    seen = {}
    orig = funnel.near.update

    def spy(df, bid, tick_start=None):
        seen["tick_start"] = tick_start
        return orig(df, bid, tick_start=tick_start)

    funnel.near.update = spy
    rows = [
        (i,
         f"alpha beta gamma delta epsilon zeta eta theta doc {i} "
         "the quick brown fox jumps over the lazy dog again and again",
         "en", "srcX")
        for i in range(6)
    ]
    schema = "doc_id long, text string, lang string, source string"
    for b in range(3):
        batch = spark.createDataFrame(
            [(100 * b + i,) + r[1:] for i, r in enumerate(rows)], schema
        )
        funnel.process_batch(batch, b)
    # the composed tick's start reached the maintainer...
    assert seen["tick_start"] is not None
    # ...and the zero budget deferred its due folds, counted
    assert funnel.near.deferred_folds >= 1
