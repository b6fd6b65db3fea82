"""Pure-filesystem unit test for the compaction recovery RETURN SIGNAL
(ADVICE r8): when compact_batched_dir's recovery branch completes a
crashed swap and there is nothing further to fold (len(batches) <= 1),
the call must still return nonzero — callers key their relation-cache
invalidation on the return, and a same-process retry after an in-process
fold failure would otherwise serve cached relations over the deleted
original part files. No SparkSession needed: the recovery path is plain
os/shutil, and read_upto/write_fold are never reached.
"""

import os

from moc_indexer_spark.streaming.compaction import (
    _FOLD_MARKER,
    compact_batched_dir,
    list_committed_batches,
)


def _mk_committed_partition(d: str) -> None:
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    with open(os.path.join(d, "part-00000"), "w") as f:
        f.write("x")


def _boom(*a, **k):  # the fresh-fold path must not run in these tests
    raise AssertionError("fresh fold path reached")


def test_recovery_swap_returns_nonzero_when_nothing_left_to_fold(tmp_path):
    base = str(tmp_path / "vectors")
    # crash state: a COMPLETE fold tmp (marker + _SUCCESS) for committed
    # id 1, with every superseded original already swept into trash —
    # the process died between the sweep and the install rename
    tmp = f"{base}__fold_tmp"
    trash = f"{base}__fold_trash"
    os.makedirs(base, exist_ok=True)
    _mk_committed_partition(tmp)
    with open(os.path.join(tmp, _FOLD_MARKER), "w") as f:
        f.write("1")
    _mk_committed_partition(os.path.join(trash, "batch=0"))
    _mk_committed_partition(os.path.join(trash, "batch=1"))

    folded = compact_batched_dir(
        base,
        committed=1,
        list_batches=lambda: list_committed_batches(base),
        read_upto=_boom,
        write_fold=_boom,
    )
    # the swap was installed...
    assert list_committed_batches(base) == [1]
    assert not os.path.isdir(tmp) and not os.path.isdir(trash)
    # ...and signalled, even though no fresh fold ran
    assert folded == 1

    # idempotence: a clean re-run with one partition is a true no-op
    assert (
        compact_batched_dir(
            base,
            committed=1,
            list_batches=lambda: list_committed_batches(base),
            read_upto=_boom,
            write_fold=_boom,
        )
        == 0
    )


def test_completed_swap_trash_only_cleanup_still_signals(tmp_path):
    # trash exists but tmp is gone: the crashed run's rename DID install
    # its fold before dying. If that run was in THIS process (in-process
    # exception between the install and the trash delete, then a retry),
    # the caller's cache predates the install — the cleanup must signal
    # too. After a process-death crash the extra clear is harmless.
    base = str(tmp_path / "vectors")
    trash = f"{base}__fold_trash"
    _mk_committed_partition(os.path.join(base, "batch=1"))
    _mk_committed_partition(os.path.join(trash, "batch=0"))

    folded = compact_batched_dir(
        base,
        committed=1,
        list_batches=lambda: list_committed_batches(base),
        read_upto=_boom,
        write_fold=_boom,
    )
    assert folded == 1
    assert not os.path.isdir(trash)
    assert list_committed_batches(base) == [1]


def test_recovered_swap_fires_on_recovered_callback(tmp_path):
    """ADVICE r9: a recovery-installed swap's bounds belong to the
    CRASHED run and may be wider than the current call's
    (min_batch, committed] range — e.g. a crashed FULL fold healed
    during a later MINOR fold. Selective cache invalidation keyed on the
    current range would keep cached relations over batches <= min_batch
    that point at part files the recovered swap deleted; the
    on_recovered hook is where callers clear the ENTIRE cache."""
    base = str(tmp_path / "vectors")
    tmp = f"{base}__fold_tmp"
    trash = f"{base}__fold_trash"
    os.makedirs(base, exist_ok=True)
    # crashed FULL fold (bounds -1..2) awaiting install; a later batch 3
    # exists, and the CURRENT call is a MINOR fold over (2, 3] only
    _mk_committed_partition(tmp)
    with open(os.path.join(tmp, _FOLD_MARKER), "w") as f:
        f.write("-1 2")
    _mk_committed_partition(os.path.join(trash, "batch=0"))
    _mk_committed_partition(os.path.join(trash, "batch=1"))
    _mk_committed_partition(os.path.join(trash, "batch=2"))
    _mk_committed_partition(os.path.join(base, "batch=3"))

    fired = []
    folded = compact_batched_dir(
        base,
        committed=3,
        list_batches=lambda: list_committed_batches(base),
        read_upto=_boom,
        write_fold=_boom,
        min_batch=2,
        on_recovered=lambda: fired.append(True),
    )
    # the crashed full fold was installed at batch=2, outside this minor
    # call's own range — and the hook fired so the caller's whole cache
    # clears, not just relations touching (2, 3]
    assert fired == [True]
    assert sorted(list_committed_batches(base)) == [2, 3]
    # only batch=3 above min_batch=2 -> nothing further to fold; the
    # recovery alone still signals via the return
    assert folded == 1

    # clean state: the hook must NOT fire
    fired.clear()
    compact_batched_dir(
        base,
        committed=3,
        list_batches=lambda: list_committed_batches(base),
        read_upto=_boom,
        write_fold=_boom,
        min_batch=2,
        on_recovered=lambda: fired.append(True),
    )
    assert fired == []
