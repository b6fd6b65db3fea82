"""Event-time window + watermark replay tests (batch/stream parity and
late-data semantics)."""

import datetime as dt
import os
import shutil

from pyspark.sql import functions as F

from moc_indexer_spark.streaming.windows import streaming_tumbling_agg, tumbling_agg

SCHEMA = "event_id long, ts timestamp, event_type string, value double"
BASE = dt.datetime(2024, 1, 1)


def _rows(*specs):
    # (id, minutes_offset, type, value)
    return [
        (i, BASE + dt.timedelta(minutes=m), t, v) for i, m, t, v in specs
    ]


def _run_stream(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_tumbling_agg(stream, "1 hour", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _stage(spark, rows, src, name, tmp):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(f"{tmp}/stage_{name}")
    os.makedirs(src, exist_ok=True)
    for f_ in os.listdir(f"{tmp}/stage_{name}"):
        if f_.endswith(".parquet"):
            shutil.copy(f"{tmp}/stage_{name}/{f_}", f"{src}/{name}.parquet")


def test_streaming_windows_finalize_and_drop_late(spark, tmp_path):
    tmp = str(tmp_path)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"

    # batch 1: events in hours 0 and 1, plus one event far ahead (hour 6)
    # that advances the watermark to 4h -> windows 0,1 finalize
    b1 = _rows((1, 10, "click", 1.0), (2, 20, "click", 2.0),
               (3, 70, "view", 5.0), (4, 360, "view", 1.0))
    _stage(spark, b1, src, "b1", tmp)
    _run_stream(spark, src, out, ckpt)

    got = {(r.window_start, r.event_type): (r.n_events, r.total_value)
           for r in spark.read.parquet(out).collect()}
    assert got[(BASE, "click")] == (2, 3.0)
    assert got[(BASE + dt.timedelta(hours=1), "view")] == (1, 5.0)
    # hour-6 window not finalized yet (watermark = 6h - 2h = 4h)
    assert (BASE + dt.timedelta(hours=6), "view") not in got

    # batch 2: a late event for hour 0 — beyond the 2h watermark, dropped
    b2 = _rows((5, 15, "click", 100.0))
    _stage(spark, b2, src, "b2", tmp)
    _run_stream(spark, src, out, ckpt)
    got2 = {(r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.read.parquet(out).collect()}
    # the finalized hour-0 click window is unchanged (no duplicate emission)
    assert got2[(BASE, "click")] == (2, 3.0)


def test_batch_stream_window_parity(spark, tmp_path, sf_dir):
    """Same aggregation function, batch vs drained stream (high watermark so
    nothing drops): results must be identical."""
    tmp = str(tmp_path)
    from moc_indexer_spark.tables import table

    events = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .limit(500)
    )
    src = f"{tmp}/src"
    events.coalesce(1).write.mode("overwrite").parquet(src)
    batch = {(r.window_start, r.event_type): (r.n_events, r.total_value)
             for r in tumbling_agg(spark.read.parquet(src), "1 hour").collect()}

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_tumbling_agg(stream, "1 hour", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("win_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {(r.window_start, r.event_type): (r.n_events, r.total_value)
                for r in spark.sql("select * from win_parity").collect()}
    assert streamed == batch


def test_batch_stream_session_parity(spark, tmp_path, sf_dir):
    """session_window under streaming (state-store session merge) must equal
    the batch session_window aggregation over the same events."""
    from moc_indexer_spark.streaming.windows import session_agg, streaming_session_agg
    from moc_indexer_spark.tables import table

    tmp = str(tmp_path)
    events = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .limit(500)
    )
    src = f"{tmp}/src"
    events.coalesce(1).write.mode("overwrite").parquet(src)
    key = lambda r: (r.session_start, r.session_end, r.user_id)
    batch = {key(r): (r.n_events, r.total_value)
             for r in session_agg(spark.read.parquet(src), "30 minutes").collect()}

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_session_agg(stream, "30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {key(r): (r.n_events, r.total_value)
                for r in spark.sql("select * from sess_parity").collect()}
    assert streamed == batch and len(batch) > 0


def test_streaming_sessions_merge_across_batches(spark, tmp_path):
    """Two micro-batches whose events fall inside one inactivity gap must
    merge into a single session in the state store."""
    from moc_indexer_spark.streaming.windows import streaming_session_agg

    tmp = str(tmp_path)
    src = f"{tmp}/src"
    b1 = [(1, BASE + dt.timedelta(minutes=0), 1, "click", 1.0),
          (2, BASE + dt.timedelta(minutes=10), 1, "click", 2.0)]
    b2 = [(3, BASE + dt.timedelta(minutes=20), 1, "click", 4.0)]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    os.makedirs(src, exist_ok=True)
    for name, rows in (("b1", b1), ("b2", b2)):
        stage = f"{tmp}/stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(stage)
        for f_ in os.listdir(stage):
            if f_.endswith(".parquet"):
                shutil.copy(f"{stage}/{f_}", f"{src}/{name}.parquet")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (
        streaming_session_agg(stream, "30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_merge")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from sess_merge").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_events, r.total_value) == (3, 7.0)
    assert r.session_start == BASE
    assert r.session_end == BASE + dt.timedelta(minutes=50)  # last event + gap
