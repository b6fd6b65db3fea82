"""Deterministic replay tests for the streaming layer (SURVEY.md §5):
fixed input slices -> assert final table state. Covers S4/S6 upsert stream,
T1-T8 semantics, and batch/stream parity of the shared transform."""

import datetime as dt
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moc_indexer_spark.streaming.pipeline import (
    enrich_transactions,
    reclassify_status,
    run_batch,
    run_stream_available_now,
)
from moc_indexer_spark.streaming.sink import ParquetUpsertTable
from moc_indexer_spark.streaming import status as ST
from moc_indexer_spark.tables import table


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def test_upsert_idempotent(spark, workdir):
    tbl = ParquetUpsertTable(spark, f"{workdir}/t", keys=["k"])
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    tbl.upsert(df)
    tbl.upsert(df)  # replay the same batch (at-least-once delivery)
    out = tbl.read().orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, "a"), (2, "b")]


def test_upsert_merge_updates_and_inserts(spark, workdir):
    tbl = ParquetUpsertTable(spark, f"{workdir}/t", keys=["k"])
    tbl.upsert(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]))
    tbl.upsert(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]))
    out = {r.k: r.v for r in tbl.read().collect()}
    assert out == {1: "a", 2: "B", 3: "c"}


def test_monotonic_version_guard(spark, workdir):
    # T8: moc_balances.py:127-136 — stale snapshot must not clobber newer
    tbl = ParquetUpsertTable(
        spark, f"{workdir}/t", keys=["k"], version_col="block_height"
    )
    tbl.upsert(spark.createDataFrame([(1, 100, "new")], ["k", "block_height", "v"]))
    tbl.upsert(spark.createDataFrame([(1, 90, "old"), (2, 50, "x")],
                                     ["k", "block_height", "v"]))
    out = {r.k: (r.block_height, r.v) for r in tbl.read().collect()}
    assert out == {1: (100, "new"), 2: (50, "x")}


def test_update_only_mode(spark, workdir):
    # T6: fastbtcbridge.py:58-78 — StatusUpdated without prior insert is a no-op
    tbl = ParquetUpsertTable(spark, f"{workdir}/t", keys=["k"])
    tbl.upsert(spark.createDataFrame([(1, "a")], ["k", "v"]))
    tbl.upsert(spark.createDataFrame([(1, "A"), (99, "ghost")], ["k", "v"]),
               insert=False)
    out = {r.k: r.v for r in tbl.read().collect()}
    assert out == {1: "A"}


def test_in_batch_dedup_keeps_highest_version(spark, workdir):
    # T7 queue coalescing: duplicate keys inside one batch collapse
    tbl = ParquetUpsertTable(spark, f"{workdir}/t", keys=["k"], version_col="ver")
    tbl.upsert(spark.createDataFrame(
        [(1, 5, "mid"), (1, 9, "latest"), (1, 1, "oldest")], ["k", "ver", "v"]))
    out = tbl.read().collect()
    assert len(out) == 1 and out[0].v == "latest"


def test_retention_delete(spark, workdir):
    # T9: mocsettlement.py:416-429
    tbl = ParquetUpsertTable(spark, f"{workdir}/t", keys=["k"])
    tbl.upsert(spark.createDataFrame([(i, i * 10) for i in range(10)], ["k", "age"]))
    tbl.delete_where(F.col("age") >= 50)
    assert sorted(r.k for r in tbl.read().collect()) == [0, 1, 2, 3, 4]


def test_stream_batch_parity_with_checkpoint_resume(spark, workdir, sf_dir):
    """Feed the events table in 3 slices through 3 incremental streaming runs
    (checkpoint carries offsets across runs — the reference's periodic-task
    restart); after a final status sweep the table must equal the one-shot
    batch run."""
    events = table(spark, sf_dir, "events").orderBy("event_id").limit(300).cache()
    src = f"{workdir}/src"
    os.makedirs(src)
    slices = [(0, 100), (100, 200), (200, 300)]
    out_path, ckpt = f"{workdir}/out", f"{workdir}/ckpt"
    schema = events.schema
    for i, (lo, hi) in enumerate(slices):
        (events.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
               .coalesce(1).write.mode("overwrite").parquet(f"{workdir}/stage"))
        for f_ in os.listdir(f"{workdir}/stage"):
            if f_.endswith(".parquet"):
                shutil.copy(f"{workdir}/stage/{f_}", f"{src}/slice{i}.parquet")
        run_stream_available_now(spark, src, out_path, ckpt, schema=schema)

    stream_tbl = ParquetUpsertTable(spark, out_path, keys=["tx_hash"])
    tip = events.agg(F.max("ts")).collect()[0][0]
    reclassify_status(stream_tbl, tip)

    batch_tbl = run_batch(spark, src, f"{workdir}/batch_out")
    # the reference-faithful contract: status/percent exact; raw
    # confirmations compared capped at CONFIRM_BLOCKS — the sweep only
    # touches non-final rows (like the reference's pending/confirming
    # queries), so a confirmed row's raw count freezes at its crossing
    # value while batch mode computes it at the final tip; both are >= the
    # cap, and the reference stores no running count post-final at all
    from moc_indexer_spark.streaming.pipeline import CONFIRM_BLOCKS

    def rows(tbl):
        cols = ["tx_hash", "address", "event", "created_at", "amount",
                F.least(
                    F.col("confirmations"),
                    F.lit(CONFIRM_BLOCKS).cast("bigint"),
                ).alias("confirmations"),
                "status", "confirming_percent"]
        return sorted(map(tuple, tbl.read().select(*cols).collect()))

    a, b = rows(stream_tbl), rows(batch_tbl)
    assert len(a) == 300
    assert a == b


def _obs(tx, observed_s, receipt, confs, created_s=0):
    base = dt.datetime(2024, 1, 1)
    return (tx, base + dt.timedelta(seconds=observed_s), receipt, confs,
            base + dt.timedelta(seconds=created_s))


OBS_COLS = ["tx_hash", "observed_at", "receipt_status", "confirmations", "created_at"]


def test_status_machine_streaming(spark, workdir):
    """T2/T3: pending -> confirming -> confirmed across micro-batches;
    reverted -> failed; chain-time stale -> failed(staleTransaction)."""
    src = f"{workdir}/obs"
    os.makedirs(src)
    batch1 = [
        _obs("a", 60, "confirmed", 3),      # -> confirming
        _obs("b", 60, "reverted", 0),       # -> failed
        _obs("c", 60, None, 0),             # -> pending
    ]
    batch2 = [
        _obs("a", 400, "confirmed", 12),    # -> confirmed
        # a LATER observation of the already-failed tx: the re-emitted row
        # must keep error_code (the reference keeps errorCode on the failed
        # record; a keyed downstream sink would otherwise overwrite it NULL)
        _obs("b", 400, None, 0),
        _obs("c", 700, None, 0),            # created+600 < chain time -> stale
    ]
    schema = ("tx_hash string, observed_at timestamp, receipt_status string, "
              "confirmations long, created_at timestamp")
    for i, rows in enumerate([batch1, batch2]):
        spark.createDataFrame(rows, OBS_COLS).coalesce(1).write.mode(
            "overwrite").parquet(f"{workdir}/stage{i}")
        for f_ in os.listdir(f"{workdir}/stage{i}"):
            if f_.endswith(".parquet"):
                shutil.copy(f"{workdir}/stage{i}/{f_}", f"{src}/b{i}.parquet")
        stream = spark.readStream.schema(schema).parquet(src)
        sink_dir = f"{workdir}/status_out"
        q = (ST.apply_status_machine(stream)
             .writeStream.format("parquet")
             .option("path", sink_dir)
             .option("checkpointLocation", f"{workdir}/status_ckpt")
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    out = spark.read.parquet(f"{workdir}/status_out").toPandas()
    # the row with the latest observation per tx is the current state
    final = {
        tx: grp.sort_values("last_observed_at").iloc[-1]
        for tx, grp in out.groupby("tx_hash")
    }
    assert final["a"].status == "confirmed" and final["a"].confirming_percent == 100
    assert final["b"].status == "failed" and final["b"].error_code == "reverted"
    assert final["c"].status == "failed" and final["c"].error_code == "staleTransaction"


def test_status_replay_batch_matches_transition_table():
    obs = pd.DataFrame(
        [_obs("x", 30, None, 0), _obs("x", 90, "confirmed", 5),
         _obs("x", 400, "confirmed", 11),
         _obs("y", 30, None, 0), _obs("y", 650, None, 0),
         # post-failure observation: error_code must persist, not reset
         _obs("y", 700, None, 0)],
        columns=OBS_COLS,
    )
    out = ST.replay_batch(obs).set_index("tx_hash")
    assert out.loc["x"].status == "confirmed"
    assert out.loc["y"].status == "failed"
    assert out.loc["y"].error_code == "staleTransaction"


def test_stream_stream_join_batch_parity(spark, workdir, sf_dir):
    """T1-analog enrichment as a genuine stream-stream join: tx stream x
    price stream on an event-time range, watermarks bounding state. The
    streaming result (availableNow drain) must equal the batch join of the
    same rows."""
    from moc_indexer_spark.streaming.joins import join_recent_prices

    events = table(spark, sf_dir, "events").orderBy("event_id").limit(500)
    txs = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("tx_hash"), F.col("ts").alias("created_at")
    )
    prices = events.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("price_ts"), F.col("value").alias("price")
    )
    tx_dir, pr_dir = f"{workdir}/txs", f"{workdir}/prices"
    txs.coalesce(1).write.parquet(tx_dir)
    prices.coalesce(1).write.parquet(pr_dir)

    batch = join_recent_prices(
        spark.read.parquet(tx_dir), spark.read.parquet(pr_dir)
    )
    expected = sorted(map(tuple, batch.collect()))
    assert len(expected) > 0, "fixture produced no in-window pairs"

    ts = spark.readStream.schema(txs.schema).parquet(tx_dir)
    ps = spark.readStream.schema(prices.schema).parquet(pr_dir)
    out_dir, ckpt = f"{workdir}/joined", f"{workdir}/join_ckpt"
    q = (
        join_recent_prices(ts, ps)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert got == expected


def test_dedup_within_watermark_across_batches(spark, workdir):
    """A4/T7 streaming-native: a key re-arriving in a later micro-batch
    within the watermark horizon is dropped (state persists via the
    checkpoint across availableNow runs)."""
    from moc_indexer_spark.streaming.joins import dedup_within_watermark

    base = dt.datetime(2024, 1, 1)
    src = f"{workdir}/dupsrc"
    os.makedirs(src)
    schema = "k string, created_at timestamp, v long"
    batches = [
        [("a", base, 1), ("b", base + dt.timedelta(minutes=1), 2)],
        # duplicate "a" within 30-min delay + a fresh key
        [("a", base + dt.timedelta(minutes=5), 99),
         ("c", base + dt.timedelta(minutes=6), 3)],
    ]
    out_dir, ckpt = f"{workdir}/dedup_out", f"{workdir}/dedup_ckpt"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, ["k", "created_at", "v"]).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{workdir}/dstage{i}")
        for f_ in os.listdir(f"{workdir}/dstage{i}"):
            if f_.endswith(".parquet"):
                shutil.copy(f"{workdir}/dstage{i}/{f_}", f"{src}/b{i}.parquet")
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            dedup_within_watermark(stream, ["k"], "created_at", "30 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    out = spark.read.parquet(out_dir).toPandas().sort_values("k")
    assert list(out["k"]) == ["a", "b", "c"]
    # first-seen row wins: the duplicate "a" (v=99) was dropped
    assert int(out[out["k"] == "a"]["v"].iloc[0]) == 1


def _has_tws_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


class _FakeValueState:
    """Driver-side stand-in for the TWS ValueState API (get/update/exists)."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_status_processor_direct_drive():
    """transformWithState StatefulProcessor logic without the Spark runtime
    (the TWS wire protocol needs protobuf, absent in this container): drive
    handleInputRows per micro-batch with a fake ValueState and assert the
    same transitions the applyInPandasWithState path produces."""
    from moc_indexer_spark.streaming.status_tws import StatusProcessor

    proc = StatusProcessor()
    proc._state = _FakeValueState()

    def feed(rows):
        pdf = pd.DataFrame(rows, columns=OBS_COLS)
        return pd.concat(list(proc.handleInputRows(("a",), iter([pdf]), None)))

    out1 = feed([_obs("a", 60, "confirmed", 3)])
    assert list(out1["status"]) == ["confirming"]
    assert list(out1["confirming_percent"]) == [30]

    out2 = feed([_obs("a", 400, "confirmed", 12)])
    assert list(out2["status"]) == ["confirmed"]
    # state persisted across "batches"
    assert proc._state.get()[1] == "confirmed"

    # terminal state is sticky
    out3 = feed([_obs("a", 500, "reverted", 0)])
    assert list(out3["status"]) == ["confirmed"]

    # stale path on a fresh key
    proc2 = StatusProcessor()
    proc2._state = _FakeValueState()
    pdf = pd.DataFrame([_obs("c", 700, None, 0)], columns=OBS_COLS)
    out4 = pd.concat(list(proc2.handleInputRows(("c",), iter([pdf]), None)))
    assert list(out4["status"]) == ["failed"]
    assert list(out4["error_code"]) == ["staleTransaction"]


@pytest.mark.skipif(
    not _has_tws_protobuf(),
    reason="transformWithState state protocol needs the protobuf package",
)
def test_status_machine_transformwithstate_parity(spark, workdir):

    """The same observation slices through BOTH stateful APIs
    (applyInPandasWithState and transformWithStateInPandas/RocksDB) must
    produce identical latest-per-tx status rows."""
    from moc_indexer_spark.streaming import status_tws as TWS

    src = f"{workdir}/obs2"
    os.makedirs(src)
    batches = [
        [
            _obs("a", 60, "confirmed", 3),
            _obs("b", 60, "reverted", 0),
            _obs("c", 60, None, 0),
        ],
        [
            _obs("a", 400, "confirmed", 12),
            _obs("c", 700, None, 0),
        ],
    ]
    schema = ("tx_hash string, observed_at timestamp, receipt_status string, "
              "confirmations long, created_at timestamp")

    def run_engine(out_dir, ckpt, wire):
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, OBS_COLS).coalesce(1).write.mode(
                "overwrite").parquet(f"{workdir}/tws_stage{i}")
            for f_ in os.listdir(f"{workdir}/tws_stage{i}"):
                if f_.endswith(".parquet"):
                    shutil.copy(f"{workdir}/tws_stage{i}/{f_}",
                                f"{src}/{out_dir.split('/')[-1]}_b{i}.parquet")
            stream = (spark.readStream.schema(schema).parquet(src)
                      .filter(F.input_file_name().contains(out_dir.split('/')[-1])))
            q = (wire(stream)
                 .writeStream.format("parquet")
                 .option("path", out_dir)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append")
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
        pdf = spark.read.parquet(out_dir).toPandas()
        latest = pdf.sort_values("last_observed_at").groupby("tx_hash").tail(1)
        return sorted(
            map(tuple, latest[["tx_hash", "status", "confirmations",
                               "confirming_percent", "error_code"]].values)
        )

    a = run_engine(f"{workdir}/apis_out", f"{workdir}/apis_ckpt",
                   ST.apply_status_machine)

    default_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   TWS.ROCKSDB_PROVIDER)
    try:
        b = run_engine(f"{workdir}/tws_out", f"{workdir}/tws_ckpt",
                       TWS.apply_status_machine_tws)
    finally:
        if default_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", default_provider)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    assert a == b
    assert [t[0:2] for t in a] == [("a", "confirmed"), ("b", "failed"),
                                   ("c", "failed")]


def test_status_error_code_persists_after_failure():
    """TWS twin: a failed tx re-observed in a later batch keeps its
    error_code and its recorded confirmation count (terminal rows must
    not regress to NULL/0 when late observations arrive)."""
    from moc_indexer_spark.streaming.status_tws import StatusProcessor

    proc = StatusProcessor()
    proc._state = _FakeValueState()

    def feed(rows):
        pdf = pd.DataFrame(rows, columns=OBS_COLS)
        return pd.concat(list(proc.handleInputRows(("b",), iter([pdf]), None)))

    out1 = feed([_obs("b", 60, "confirmed", 3),
                 _obs("b", 90, "reverted", 3)])
    assert list(out1["status"]) == ["failed"]
    assert list(out1["error_code"]) == ["reverted"]

    # later batch: no receipt, zero confirmations reported
    out2 = feed([_obs("b", 400, None, 0)])
    assert list(out2["status"]) == ["failed"]
    assert list(out2["error_code"]) == ["reverted"]   # code persists
    assert list(out2["confirmations"]) == [3]         # count not regressed


def test_legacy_3field_state_unpacks_with_null_error_code():
    """STATE_SCHEMA grew error_code in round 5; a stream restarted from a
    pre-upgrade checkpoint hands the processor 3-field state tuples. The
    unpack must pad the missing code to None — not crash the stream."""
    import datetime as dt

    from moc_indexer_spark.streaming.status import _unpack_state
    from moc_indexer_spark.streaming.status_tws import StatusProcessor

    t0 = dt.datetime(2024, 1, 1)
    # pure helper: both arities normalize to a 4-tuple
    assert _unpack_state((t0, "confirming", 3)) == (t0, "confirming", 3, None)
    assert _unpack_state((t0, "failed", 3, "reverted")) == (
        t0, "failed", 3, "reverted")

    # end-to-end through the TWS twin with legacy state pre-loaded
    proc = StatusProcessor()
    proc._state = _FakeValueState()
    proc._state.update((t0, "confirming", 3))  # 3-field legacy checkpoint
    pdf = pd.DataFrame([_obs("z", 60, "confirmed", 12)], columns=OBS_COLS)
    out = pd.concat(list(proc.handleInputRows(("z",), iter([pdf]), None)))
    assert list(out["status"]) == ["confirmed"]
    assert list(out["error_code"]) == [None]
    # state was re-written in the new 4-field layout
    assert len(proc._state.get()) == 4
