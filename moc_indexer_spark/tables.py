"""Table catalog: the driver's synthetic parquet tables + derived views.

The reference's Mongo collections (SURVEY.md §1.2) map to parquet/Delta-backed
DataFrames. Until the driver materializes reference-shaped fixtures, the
`transactions` serving view is derived from `events.parquet` per FIXTURES.md §3:
event_id→tx_hash, user_id→address, event_type→event, ts→created_at,
value→amount, props→payload.

The same mapping exists as an SQL CTE (`TRANSACTIONS_CTE`) so every DuckDB
oracle sees the identical relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Opt-in engine-managed storage layout (see enable_layout_mirror below).
_LAYOUT_MIRROR = False


def enable_layout_mirror(enabled: bool = True) -> None:
    """Turn on the engine-managed table layout (used by bench.py).

    The driver's synthetic parquet ships ONE row group per file; parquet
    scans cannot split below a row group, so every scan stage runs as a
    single task no matter how many cores exist — a pathological layout,
    not a Spark property. At cluster scale ingest fixes this (files are
    written with ~128 MB row groups, thousands per table); the mirror is
    the local analog: a one-time re-layout into multiple files so scan
    stages parallelize, exactly what a lakehouse OPTIMIZE/ingest step
    does. Data is byte-identical — the mirror stores the post-read
    DataFrame, so values, schema, and query results are unchanged (the
    DuckDB correctness oracles keep reading the original files; this
    path is only about scan parallelism)."""
    global _LAYOUT_MIRROR
    _LAYOUT_MIRROR = enabled


def _mirror_read(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> DataFrame:
    import hashlib
    import os
    import shutil
    import uuid

    src = os.path.join(sf_dir, f"{name}.parquet")
    tag = os.path.basename(sf_dir.rstrip("/")) + "-" + hashlib.md5(
        os.path.abspath(sf_dir).encode()
    ).hexdigest()[:8]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo_root, "spark-warehouse", "mirror", tag, name)
    if not os.path.isdir(dest) or os.path.getmtime(src) > os.path.getmtime(dest):
        size = os.path.getsize(src)
        # ~512 KB splits: small enough that a 10 MB table fans across the
        # local cores, capped at the session's parallelism. On a cluster the
        # equivalent knob is ingest row-group size, not file count.
        n = min(
            spark.sparkContext.defaultParallelism,
            max(4, size // (512 * 1024)),
        )
        tmp = f"{dest}__tmp_{uuid.uuid4().hex[:8]}"
        df.repartition(int(n)).write.mode("overwrite").parquet(tmp)
        if os.path.isdir(dest):
            shutil.rmtree(dest, ignore_errors=True)
        try:
            os.rename(tmp, dest)
        except OSError:
            # lost the race to a concurrent builder — its copy is equivalent
            shutil.rmtree(tmp, ignore_errors=True)
    # a mirror written by an older build may itself store NTZ timestamps;
    # the coercing read is a no-op for LTZ-written mirrors
    return _read_ntz_as_ltz(spark, dest)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): illegal for Spark's vectorized
        # reader. Read it as long (nanos since epoch) and truncate to
        # microseconds — identical to DuckDB's ns→us read, so oracles agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Session bootstrap (eager + idempotent, set before any lazy plan is
        # built): date/time RENDERING functions (date_format, day floors)
        # follow the session zone; UTC matches DuckDB's naive semantics in
        # any environment. Instant values themselves never depend on this —
        # they are read zone-free (see _read_ntz_as_ltz).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # micros-precision events files infer ts as NTZ -> same coercing
        # read as every other table; nanos files surface as bigint instead
        df = _read_ntz_as_ltz(spark, f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = _read_ntz_as_ltz(spark, f"{sf_dir}/{name}.parquet")
    if _LAYOUT_MIRROR:
        return _mirror_read(spark, sf_dir, name, df)
    return df


def parquet_rows(sf_dir: str, name: str) -> int:
    """Exact row count of a catalog table from the parquet FOOTER — no
    Spark job, no scan. For operators whose PLAN shape depends on the
    corpus size (the LSH adaptive plane count, the SemDeDup cell count),
    building the DataFrame must not itself run a count() job: registry
    sweeps and error paths construct plans they never execute. Footer
    metadata is what a lakehouse catalog serves for free at 100 TB
    (table statistics); this is the local-parquet analog."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{name}.parquet").metadata.num_rows


# per-path cache of the LTZ-coerced read schema (footer reads are cheap but
# table() is called inside every registry query build)
_LTZ_SCHEMA_CACHE: dict = {}


def _read_ntz_as_ltz(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet with TIMESTAMP_NTZ columns coerced to TIMESTAMP at the
    SCAN, wall clock interpreted as UTC.

    Under a vanilla session (the driver's), parquet timestamps without
    isAdjustedToUTC infer as TIMESTAMP_NTZ, which epoch math (unix_micros)
    and streaming watermarks reject. Supplying an explicit read schema with
    TimestampType makes the parquet reader decode the stored micros directly
    as epoch micros — byte-identical to DuckDB's naive read of the same
    files (verified: unix_micros == duckdb epoch_us) in ANY session
    timezone. Unlike a post-read cast, this keeps the column a plain scan
    attribute, so comparison filters still push down to the parquet scan
    (PushedFilters), and there is no session-conf mutation and no
    eager/lazy timezone hazard."""
    import pyspark.sql.types as T

    key = path
    schema = _LTZ_SCHEMA_CACHE.get(key)
    if schema is None:
        base = spark.read.parquet(path).schema
        schema = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.TimestampType()
                    if isinstance(f.dataType, T.TimestampNTZType)
                    else f.dataType,
                    f.nullable,
                )
                for f in base
            ]
        )
        _LTZ_SCHEMA_CACHE[key] = schema
    return spark.read.schema(schema).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def write_serving_table(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("event",),
    sort_within: tuple[str, ...] = ("address", "created_at"),
) -> None:
    """Serving-table layout (the index-replacement story, SURVEY.md §4):

    - hive partitioning on low-cardinality access columns (event/date) ->
      partition PRUNING: point queries read only matching directories;
    - sort within files on (address, created_at) -> parquet min/max row-group
      stats act as a coarse index for per-address range scans (the Z-ORDER
      analog without a table format; Delta/Iceberg would Z-ORDER here);
    - at 100 TB add bucketing on address for shuffle-free per-user joins.
    """
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .sortWithinPartitions(*sort_within)
        .write.partitionBy(*partition_by)
        .mode("overwrite")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Hash-bucketed layout: the co-located-join story from SURVEY.md §4.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT any Exchange — each task reads matching bucket files from both
    sides (verified by tests/test_bucketing.py, which asserts the physical
    plan is shuffle-free). At 100 TB this is how the per-address serving
    joins (UserState x Transaction) avoid re-shuffling the fact table on
    every query; `sort_cols` additionally pre-sorts within buckets so
    sort-merge join skips its sort.

    Spark's bucketing needs the table catalog (`saveAsTable`) — bucket
    metadata lives in the metastore, not the parquet files.
    """
    w = df.write.bucketBy(n_buckets, bucket_col).mode("overwrite")
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


# --- transactions serving view (FIXTURES.md §3 stand-in mapping) -----------

# Columns mirror the reference's Transaction collection surface
# (/root/reference/webservice/bp_user_operations.py:40-69) in snake_case.
TRANSACTIONS_CTE = (
    "SELECT event_id AS tx_hash, user_id AS address, event_type AS event, "
    "ts AS created_at, value AS amount, props AS payload FROM events"
)


def transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The enriched-operations serving table (reference: `Transaction`)."""
    return table(spark, sf_dir, "events").select(
        F.col("event_id").alias("tx_hash"),
        F.col("user_id").alias("address"),
        F.col("event_type").alias("event"),
        F.col("ts").alias("created_at"),
        F.col("value").alias("amount"),
        F.col("props").alias("payload"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table (plus the `transactions` serving view)
    as a temp view, making the whole engine queryable through plain
    `spark.sql(...)` — the same SQL surface the DuckDB oracles use, so any
    oracle string in the registry also runs verbatim on Spark.

    Views are lazy: no data is read here, and Catalyst sees straight
    through them (pushdown/pruning reach the parquet scans exactly as with
    the DataFrame API)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    transactions(spark, sf_dir).createOrReplaceTempView("transactions")


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and atomically swap it in. Returns the
    new file count.

    Streaming upsert sinks accrete small files (every micro-batch writes);
    at cluster scale small files destroy scan throughput (per-file open
    cost, starved vectorized reads, metadata pressure). This is the OPTIMIZE
    /compaction maintenance action a lakehouse format schedules — same
    rewrite, parquet-only. Run it out-of-band; readers see old or new files,
    never a mix (directory swap).
    """
    import math
    import os

    from .streaming.swap import swap_dir

    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    # the recoverable swap protocol (streaming/swap.py): two bare renames
    # left a crash window where the table didn't exist at all, under an
    # unfindable random __old name — recovery now finishes or rolls back
    swap_dir(
        path,
        lambda tmp: df.repartition(n_files)
        .write.mode("overwrite")
        .parquet(tmp),
    )
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    n_files: int = 8,
    small_row_groups: bool = False,
) -> None:
    """Range-clustered layout: sort the data by `cluster_cols` across AND
    within files (repartitionByRange + sortWithinPartitions) so every
    parquet row group covers a narrow, near-disjoint key range.

    This is the data-SKIPPING story (the single-dimension form of
    Z-ordering): parquet readers prune row groups whose column min/max
    stats exclude the predicate, so a selective filter on the cluster key
    reads a handful of row groups instead of the table. Complements the
    other layout tools — bucketing co-locates JOINS, the mirror fixes file
    granularity, compaction fixes file count; clustering fixes WHERE-clause
    I/O. At 100 TB this is the difference between a point lookup touching
    ~1 row group and scanning every file (tests assert the stats are
    near-disjoint and that an unclustered write is unprunable).

    Range partitioning samples the key distribution, so file sizes stay
    balanced under skew (hash bucketing would not preserve ranges).
    """
    w = df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
    w = w.sortWithinPartitions(*cluster_cols)
    writer = w.write.mode("overwrite")
    if small_row_groups:
        # local knob: force multiple row groups per file so pruning is
        # visible at test scale (prod uses the 128 MB default)
        writer = writer.option("parquet.block.size", 64 * 1024).option(
            "parquet.page.size", 8 * 1024
        )
    writer.parquet(path)


def zorder_key(
    a: Column, b: Column, a_min, a_max, b_min, b_max, bits: int = 16
) -> Column:
    """Morton (Z-order) key for TWO numeric/timestamp-rank columns: each
    value is range-binned to `bits` bits against its [min, max] (the
    sampling-free analog of Delta OPTIMIZE ZORDER's range ids), then the
    bit strings interleave. Sorting by this key keeps row-group min/max
    stats narrow on BOTH columns at once — single-column clustering makes
    the second predicate unprunable; Z-order splits the skipping power.

    Pure codegen expressions (comparisons + shifts), no UDF."""
    top = (1 << bits) - 1

    def rank(c, lo, hi):
        lo_l, hi_l = F.lit(lo).cast("double"), F.lit(hi).cast("double")
        span = F.when(hi_l != lo_l, hi_l - lo_l).otherwise(F.lit(1.0))
        r = F.floor((c.cast("double") - lo_l) / span * top)
        return F.least(F.lit(top), F.greatest(F.lit(0), r)).cast("bigint")

    ra, rb = rank(a, a_min, a_max), rank(b, b_min, b_max)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(ra, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(rb, i).bitwiseAND(F.lit(1))
        # Column.__or__ is logical OR — bitwiseOR is the integer op
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    small_row_groups: bool = False,
) -> None:
    """Two-dimensional clustered layout: range-partition + sort by the
    Morton key of (col_a, col_b) so selective predicates on EITHER column
    prune row groups (write_clustered covers the one-dimension case). The
    min/max needed for binning come from one tiny aggregate."""
    stats = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    zk = zorder_key(
        F.col(col_a), F.col(col_b), stats[0], stats[1], stats[2], stats[3]
    )
    w = (
        df.withColumn("__zkey", zk)
        .repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    writer = w.write.mode("overwrite")
    if small_row_groups:
        writer = writer.option("parquet.block.size", 64 * 1024).option(
            "parquet.page.size", 8 * 1024
        )
    writer.parquet(path)
