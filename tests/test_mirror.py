"""Layout mirror: engine-managed re-layout of single-row-group inputs.

The driver's synthetic parquet has one row group per file — parquet scans
cannot split below a row group, so scan stages are single-task on it. The
mirror (tables.enable_layout_mirror) rewrites each table once into a
multi-file layout; these tests pin the two contracts: (1) data is
value-identical (incl. the events ns->us timestamp conversion), (2) the
mirrored scan actually parallelizes.
"""

from __future__ import annotations

import moc_indexer_spark.tables as T


def _with_mirror(fn):
    T.enable_layout_mirror(True)
    try:
        return fn()
    finally:
        T.enable_layout_mirror(False)


def test_mirror_is_value_identical(spark, sf_dir):
    plain = T.table(spark, sf_dir, "events").orderBy("event_id").collect()
    mirrored = _with_mirror(
        lambda: T.table(spark, sf_dir, "events").orderBy("event_id").collect()
    )
    assert plain == mirrored


def test_mirror_preserves_schema(spark, sf_dir):
    for name in ("lineitem", "events", "embeddings"):
        plain = T.table(spark, sf_dir, name)
        mirrored = _with_mirror(lambda: T.table(spark, sf_dir, name))
        assert plain.schema == mirrored.schema, name


def test_mirror_scan_parallelizes(spark, sf_dir):
    # the original layout pins the whole table into one row group -> the
    # scan RDD may report several byte-range partitions but only one holds
    # rows; the mirror must yield multiple non-empty partitions
    df = _with_mirror(lambda: T.table(spark, sf_dir, "lineitem"))
    nonempty = (
        df.rdd.mapPartitions(lambda it: [1 if next(it, None) is not None else 0])
        .sum()
    )
    assert nonempty >= 4
