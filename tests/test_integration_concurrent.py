"""T11 integration: N concurrent streaming queries in ONE session under the
QueryManager — the reference's thread-pool task scheduler re-expressed as
Spark's own scheduler sharing executors across queries
(/root/reference/indexer/tasks.py:210-350)."""

import os
import shutil
import time

from pyspark.sql import functions as F

from moc_indexer_spark.streaming.manager import QueryManager
from moc_indexer_spark.streaming.pipeline import enrich_transactions
from moc_indexer_spark.streaming import status as ST
from moc_indexer_spark.streaming.windows import streaming_tumbling_agg
from moc_indexer_spark.tables import table


def test_three_concurrent_streaming_tasks(spark, tmp_path, sf_dir):
    wd = str(tmp_path)
    events = table(spark, sf_dir, "events").limit(400).cache()
    schema = events.schema
    src = f"{wd}/src"
    os.makedirs(src)
    events.coalesce(1).write.mode("overwrite").parquet(f"{wd}/stage")
    for f_ in os.listdir(f"{wd}/stage"):
        if f_.endswith(".parquet"):
            shutil.copy(f"{wd}/stage/{f_}", f"{src}/a.parquet")

    mgr = QueryManager(spark, stall_timeout_s=3600)

    # task 2 analog: enrich -> parquet append
    def start_enrich():
        stream = spark.readStream.schema(schema).parquet(src)
        return (
            enrich_transactions(stream, tip_ts="2024-02-01 00:00:00")
            .writeStream.format("parquet")
            .option("path", f"{wd}/enriched")
            .option("checkpointLocation", f"{wd}/ck_enrich")
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )

    # task 3/4 analog: windowed aggregation -> memory
    def start_windows():
        stream = spark.readStream.schema(schema).parquet(src)
        return (
            streaming_tumbling_agg(stream, "1 hour", watermark="0 seconds")
            .writeStream.format("memory")
            .queryName("concurrent_windows")
            .outputMode("complete")
            .trigger(processingTime="1 second")
            .start()
        )

    # task 5 analog: status machine -> parquet
    def start_status():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .select(
                F.col("event_id").cast("string").alias("tx_hash"),
                F.col("ts").alias("observed_at"),
                F.lit("confirmed").alias("receipt_status"),
                F.lit(12).cast("long").alias("confirmations"),
                F.col("ts").alias("created_at"),
            )
        )
        return (
            ST.apply_status_machine(stream)
            .writeStream.format("parquet")
            .option("path", f"{wd}/status")
            .option("checkpointLocation", f"{wd}/ck_status")
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )

    mgr.register("enrich", start_enrich)
    mgr.register("windows", start_windows)
    mgr.register("status", start_status)
    mgr.start_all()
    try:
        deadline = time.time() + 90
        done = set()
        while time.time() < deadline and len(done) < 3:
            for q in list(mgr.queries.values()):
                assert q.query.exception() is None, q.query.exception()
            try:
                if os.path.exists(f"{wd}/enriched") and spark.read.parquet(
                    f"{wd}/enriched"
                ).count() == 400:
                    done.add("enrich")
            except Exception:
                pass
            if spark.sql("show tables").filter(
                "tableName = 'concurrent_windows'"
            ).count() and spark.sql("select count(*) from concurrent_windows"
                                    ).collect()[0][0] > 0:
                done.add("windows")
            try:
                if os.path.exists(f"{wd}/status") and spark.read.parquet(
                    f"{wd}/status"
                ).count() == 400:
                    done.add("status")
            except Exception:
                pass
            time.sleep(1)
        assert done == {"enrich", "windows", "status"}, f"finished: {done}"
        # every query produced confirmed rows under concurrent execution
        st = spark.read.parquet(f"{wd}/status")
        assert st.filter("status = 'confirmed'").count() == 400
        assert mgr.supervise_once() == []  # all healthy
        assert len(mgr.listener.last_progress) >= 3  # heartbeats observed
    finally:
        mgr.stop_all()
