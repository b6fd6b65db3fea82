"""SparkSession bootstrap tuned for the engine.

Scale notes (the configs below are the local analog of cluster settings):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast decisions replace hand-tuned partition counts at 100 TB.
- shuffle.partitions is a floor; AQE coalesces down. On a real cluster this
  would be ~2-3x total cores.
- Arrow on: every pandas/Python boundary (the few places we use mapInPandas)
  moves through Arrow batches, never row-at-a-time pickling.
- Session timezone pinned UTC: the reference localizes timestamps at the edge
  (/root/reference/indexer/scan_raw_txs.py:14); we normalize to UTC in the
  engine and format at the serving edge only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "moc-indexer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet TIMESTAMP(NANOS) (events.ts) is read as long; tables.py
        # converts to TimestampType via `ts div 1000` (truncation — same
        # semantics as DuckDB's ns→us read)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4.1's checksummed checkpoint file manager can deadlock in
        # the state-store abort path on local filesystems; plain checkpoint
        # files are fine for our durability model.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
        # In local mode the driver JVM IS the executor: without this the
        # whole engine (driver + all local[*] task threads) runs on the
        # 1 GB default heap — measured OOM on a 10M-row candidate join at
        # 3x sf0.1 while the box had 127 GB free. 8g is the measured GC
        # sweet spot for the sf0.1 bench (32g accumulates garbage into
        # long mixed collections: 28.1 s total vs 23.2 s at 8g vs 22.6 s
        # at 4g); memory-hungry workloads (scale_curve's 10x corpora)
        # raise SPARK_GRAFT_DRIVER_MEM instead. The cluster analog is
        # executor.memory sizing; only effective at JVM launch, so a
        # pre-existing session keeps its heap.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    )
    # GC / JVM flags for the local driver-is-executor JVM (same launch-time
    # caveat as the heap). Default empty = JVM defaults (G1 on Java 17);
    # SPARK_GRAFT_DRIVER_JAVA_OPTS overrides for measured experiments (the
    # round-5 GC matrix in BENCH.md) and production images.
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ship_package(spark: SparkSession) -> None:
    """Make `moc_indexer_spark` importable on executor python workers.

    Module-level functions/classes captured in RDD or mapInPandas closures
    are pickled BY REFERENCE — workers must import the package. When the
    driver's cwd isn't the repo root (or on a real cluster), ship the
    package as a zip via addPyFile. Idempotent per session."""
    import os
    import shutil
    import tempfile

    import moc_indexer_spark

    if getattr(spark, "_moc_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(moc_indexer_spark.__file__))
    base = os.path.join(
        tempfile.gettempdir(), f"moc_indexer_spark_pkg_{os.getpid()}"
    )
    zip_path = base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(base, "zip", os.path.dirname(pkg_dir),
                            "moc_indexer_spark")
    spark.sparkContext.addPyFile(zip_path)
    spark._moc_pkg_shipped = True
