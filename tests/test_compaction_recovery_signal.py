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
