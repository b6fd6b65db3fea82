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


def test_clustered_write_enables_row_group_pruning(spark, sf_dir, tmp_path):
    """Range clustering makes parquet min/max stats selective: a point
    predicate on the cluster key excludes most row groups, while the same
    data written unsorted is unprunable (every row group spans the key
    range). This is the WHERE-clause I/O story next to bucketing (joins)
    and compaction (file count)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from moc_indexer_spark.tables import table, write_clustered

    events = table(spark, sf_dir, "events")
    lo, hi = events.agg(F.min("user_id"), F.max("user_id")).first()
    probe = (lo + hi) // 2

    def rg_stats(path):
        out = []
        for f_ in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f_).metadata
            idx = md.schema.names.index("user_id")
            for i in range(md.num_row_groups):
                c = md.row_group(i).column(idx)
                out.append((c.statistics.min, c.statistics.max))
        return out

    write_clustered(events, f"{tmp_path}/clustered", ("user_id",), n_files=8)
    events.repartition(8).write.mode("overwrite").parquet(f"{tmp_path}/plain")

    def pruned_frac(path):
        st = rg_stats(path)
        assert st, "no row groups found"
        return sum(1 for a, b in st if probe < a or probe > b) / len(st)

    assert pruned_frac(f"{tmp_path}/clustered") >= 0.8
    assert pruned_frac(f"{tmp_path}/plain") == 0.0
    # and the data survives the re-layout intact
    n = spark.read.parquet(f"{tmp_path}/clustered").count()
    assert n == events.count()


def test_zordered_write_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order clustering: selective predicates on EITHER interleaved
    column exclude row groups; single-column clustering would leave the
    second column unprunable (its stats span the full range in every
    group)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from moc_indexer_spark.tables import table, write_clustered, write_zordered

    events = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    write_zordered(
        events, f"{tmp_path}/z", "user_id", "value",
        n_files=4, small_row_groups=True,
    )
    write_clustered(
        events, f"{tmp_path}/one", ("user_id",),
        n_files=4, small_row_groups=True,
    )

    def pruned_frac(path, colname, probe):
        st = []
        for f_ in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f_).metadata
            idx = md.schema.names.index(colname)
            for i in range(md.num_row_groups):
                c = md.row_group(i).column(idx)
                st.append((c.statistics.min, c.statistics.max))
        assert st
        return sum(1 for a, b in st if probe < a or probe > b) / len(st)

    ulo, uhi, vlo, vhi = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_probe, v_probe = (ulo + uhi) // 2, (vlo + vhi) / 2

    # z-order prunes on BOTH dimensions
    assert pruned_frac(f"{tmp_path}/z", "user_id", u_probe) >= 0.5
    assert pruned_frac(f"{tmp_path}/z", "value", v_probe) >= 0.5
    # single-column clustering: first column prunes, second doesn't
    assert pruned_frac(f"{tmp_path}/one", "user_id", u_probe) >= 0.5
    assert pruned_frac(f"{tmp_path}/one", "value", v_probe) <= 0.1
    # data intact
    assert spark.read.parquet(f"{tmp_path}/z").count() == events.count()
