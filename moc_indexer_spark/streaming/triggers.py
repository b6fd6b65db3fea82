"""Shared micro-batch trigger knobs for the availableNow replay runners.

Every incremental-replay runner here slices its input into per-file
micro-batches via `maxFilesPerTrigger` — availableNow otherwise folds ALL
pending files into a SINGLE batch and the incremental merge/replay
behavior the runners exist to exercise degenerates to one big batch
upsert (round-6 probe: 2 files -> 1 batch). This module centralizes the
option handling so the None/0 semantics cannot drift per runner.
"""

from __future__ import annotations


def apply_max_files_per_trigger(reader, max_files_per_trigger: int | None):
    """Apply the files-per-micro-batch cap to a DataStreamReader.

    `None` is the EXPLICIT single-batch opt-out (availableNow folds every
    pending file into one batch). Non-positive ints are rejected instead
    of silently meaning the same thing — `0` on a parameter whose
    documented unit is files-per-batch read as "zero files per batch",
    not "one batch of everything" (it previously fell through the
    truthiness gate and aliased None).
    """
    if max_files_per_trigger is None:
        return reader
    if max_files_per_trigger <= 0:
        raise ValueError(
            "max_files_per_trigger must be a positive file count; pass "
            f"None for the single-batch opt-out (got {max_files_per_trigger})"
        )
    return reader.option("maxFilesPerTrigger", max_files_per_trigger)
