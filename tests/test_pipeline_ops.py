"""Training-data pipeline operators (operators/pipeline.py) + the
incrementally-maintained rollup (streaming/rollup.py).

Correctness of the batch queries is oracle-gated (plans/pipeline_registry);
these tests cover the properties the oracle can't see: incremental==batch
parity, determinism of the hash sample, packing invariants, and the plan
shapes that matter at scale."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from moc_indexer_spark.operators import pipeline as P
from moc_indexer_spark.streaming.rollup import IncrementalRollup
from moc_indexer_spark.streaming.windows import tumbling_agg
from moc_indexer_spark.tables import table


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def _events(spark, sf_dir):
    return table(spark, sf_dir, "events")


# --- incremental rollup --------------------------------------------------


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_rollup_equals_batch(spark, sf_dir, workdir):
    """Folding the table in 3 arbitrary slices must equal the one-shot
    batch tumbling aggregate — exact types make merge order irrelevant."""
    events = _events(spark, sf_dir).cache()
    try:
        roll = IncrementalRollup(spark, f"{workdir}/roll", width="1 hour")
        for i in range(3):
            roll.update(events.filter(F.col("event_id") % 3 == i))
        batch = tumbling_agg(events, "1 hour")
        assert _sorted_rows(roll.serve()) == _sorted_rows(batch)
    finally:
        # a cached full-table relation would get substituted into later
        # plan-shape tests (InMemoryTableScan has no PushedFilters)
        events.unpersist()


def test_incremental_rollup_under_streaming(spark, sf_dir, workdir):
    """Same parity through a real availableNow file stream: one slice file
    per micro-batch (maxFilesPerTrigger=1) driving foreachBatch."""
    events = _events(spark, sf_dir).cache()
    try:
        src = f"{workdir}/src"
        os.makedirs(src)
        for i in range(3):
            stage = f"{workdir}/stage"
            (events.filter(F.col("event_id") % 3 == i)
                   .coalesce(1).write.mode("overwrite").parquet(stage))
            for f_ in os.listdir(stage):
                if f_.endswith(".parquet"):
                    shutil.copy(f"{stage}/{f_}", f"{src}/slice{i}.parquet")
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        roll = IncrementalRollup(spark, f"{workdir}/roll", width="1 hour")
        q = roll.attach(stream, checkpoint=f"{workdir}/ckpt")
        q.awaitTermination(120)
        batch = tumbling_agg(events, "1 hour")
        assert _sorted_rows(roll.serve()) == _sorted_rows(batch)
    finally:
        events.unpersist()


# --- hash sampling -------------------------------------------------------


def test_hash_sample_deterministic_and_stratified(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", "14").otherwise("52")
    a = P.hash_sample(docs, F.col("doc_id"), thr).select("doc_id")
    b = P.hash_sample(docs, F.col("doc_id"), thr).select("doc_id")
    assert _sorted_rows(a) == _sorted_rows(b)  # no RNG state anywhere
    rates = {
        r["lang"]: r["rate"]
        for r in P.hash_sample(docs, F.col("doc_id"), thr)
        .groupBy("lang").count()
        .join(docs.groupBy("lang").agg(F.count("*").alias("n")), "lang")
        .select("lang", (F.col("count") / F.col("n")).alias("rate"))
        .collect()
    }
    # en sampled at 20/256, the rest at 82/256 — loose bounds at sf0.001
    assert rates.get("en", 0) < 0.25
    assert all(v > rates.get("en", 0) for k, v in rates.items() if k != "en")


# --- sequence packing ----------------------------------------------------


def test_pack_sequences_invariants(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    budget = 512
    out = P.pack_sequences(
        docs, "lang", "doc_id", F.size(F.split(F.col("text"), " ")), budget
    ).collect()
    by_group: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["lang"], r["doc_id"])):
        by_group.setdefault(r["lang"], []).append(r)
    for rows in by_group.values():
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // budget  # start-offset chunking
            cum += r["n_tokens"]
        packs = [r["pack_id"] for r in rows]
        assert packs == sorted(packs)  # monotone in stream order


# --- profiler ------------------------------------------------------------


def test_profile_handles_categoricals_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 7.5, None), (3, 7.5, "b")],
        "id bigint, v double, c string",
    )
    rows = {r["column"]: r for r in
            P.profile_numeric(df, ["id", "v"], ["c"]).collect()}
    assert rows["id"]["n_rows"] == 4 and rows["id"]["n_distinct"] == 3
    assert rows["v"]["n_nulls"] == 1 and rows["v"]["max_d"] == 7.5
    assert rows["c"]["n_nulls"] == 1 and rows["c"]["min_d"] is None


# --- plan shapes ---------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rollup_cascade_is_one_scan_one_shuffle(spark, sf_dir):
    """Grouping sets: 3 grains share one scan and one exchange (the naive
    UNION-ALL form — the oracle — scans and shuffles 3x)."""
    df = P.rollup_grains(
        _events(spark, sf_dir), "ts", "event_type",
        F.col("value").cast("decimal(18,6)"),
    )
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Expand" in plan  # grouping-sets expansion, map-side


def test_profile_is_single_scan(spark, sf_dir):
    df = P.profile_numeric(
        _events(spark, sf_dir), ["event_id", "user_id", "value"], ["event_type"]
    )
    assert _plan(df).count("Scan parquet") == 1


def test_hash_sample_no_shuffle(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    df = P.hash_sample(docs, F.col("doc_id"), F.lit("14"))
    assert "Exchange" not in _plan(df)


# --- approx percentile sketch bound --------------------------------------


def test_approx_percentile_rank_error_bound(spark, sf_dir):
    """approx_percentile(accuracy=1000) guarantees rank error <= 1/accuracy;
    assert the realized CDF position of each estimate stays within a loose
    multiple of that bound."""
    from moc_indexer_spark.plans.registry import registry

    spec = {s.name: s for s in registry()}["approx_value_percentiles"]
    approx = {r["event_type"]: r for r in spec.build(spark, sf_dir).collect()}
    events = _events(spark, sf_dir).select("event_type", "value").cache()
    try:
        n_by = {r["event_type"]: r["n"] for r in
                events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
        for etype, row in approx.items():
            for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
                cdf = (events.filter((F.col("event_type") == etype)
                                     & (F.col("value") <= row[col])).count()
                       / n_by[etype])
                assert abs(cdf - q) <= 0.02, (etype, col, cdf)
    finally:
        events.unpersist()


# --- reconciliation & compaction -----------------------------------------


def test_reconcile_statuses_and_null_safety(spark):
    from moc_indexer_spark.operators.relational import reconcile

    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k bigint, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 9.9), (5, "e", 5.0)],
        "k bigint, s string, v double",
    )
    got = {r["k"]: r["status"]
           for r in reconcile(left, right, ["k"], ["s", "v"]).collect()}
    # k=1 identical, k=2 identical including NULL==NULL -> absent
    assert got == {3: "mismatch", 4: "only_left", 5: "only_right"}


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from moc_indexer_spark.tables import compact_parquet, table

    path = str(tmp_path / "frag")
    events = table(spark, sf_dir, "events")
    events.repartition(40).write.parquet(path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before == 40
    n = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n < before
    assert spark.read.parquet(path).count() == events.count()


def test_incremental_rollup_replay_is_exactly_once(spark, sf_dir, workdir):
    """foreachBatch re-delivers a batch after failure; re-applying the same
    batch_id must be a no-op, while direct calls (batch_id=None) stay
    additive."""
    events = _events(spark, sf_dir)
    roll = IncrementalRollup(spark, f"{workdir}/roll", width="1 hour")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    roll.update(b0, batch_id=0)
    roll.update(b1, batch_id=1)
    expected = _sorted_rows(roll.serve())
    roll.update(b1, batch_id=1)  # retry of the last batch
    roll.update(b0, batch_id=0)  # stale re-delivery
    assert _sorted_rows(roll.serve()) == expected
    total = sum(r[2] for r in expected)
    assert total == events.count()


# --- incremental OHLC candles --------------------------------------------


def _batch_candles(events, width):
    key = F.struct("ts", "event_id", "value")
    return events.groupBy(
        F.window("ts", width)["start"].alias("window_start"), "event_type"
    ).agg(
        F.min(key).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(key).getField("value").alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
        (
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,4)")
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_price"),
    ).select(
        "window_start", "event_type", "open", "high", "low", "close",
        "n_trades", "avg_price",
    )


def test_incremental_candles_equal_batch(spark, sf_dir, workdir):
    """OHLC state is mergeable (struct-min/max), not additive: folding three
    arbitrary slices out of order must still equal the one-shot candle."""
    from moc_indexer_spark.streaming.rollup import IncrementalCandles

    events = _events(spark, sf_dir).cache()
    try:
        cand = IncrementalCandles(spark, f"{workdir}/cand_direct", width="1 hour")
        for i in (2, 0, 1):
            cand.update(events.filter(F.col("event_id") % 3 == i))
        assert _sorted_rows(cand.serve()) == _sorted_rows(
            _batch_candles(events, "1 hour")
        )
    finally:
        events.unpersist()


def test_incremental_candles_under_streaming(spark, sf_dir, workdir):
    """Same parity through a real availableNow file stream (one slice file
    per micro-batch), including foreachBatch replay idempotence."""
    from moc_indexer_spark.streaming.rollup import IncrementalCandles

    events = _events(spark, sf_dir).cache()
    try:
        src = f"{workdir}/csrc"
        os.makedirs(src)
        for i in range(3):
            stage = f"{workdir}/cstage"
            (events.filter(F.col("event_id") % 3 == i)
                   .coalesce(1).write.mode("overwrite").parquet(stage))
            for f_ in os.listdir(stage):
                if f_.endswith(".parquet"):
                    shutil.copy(f"{stage}/{f_}", f"{src}/slice{i}.parquet")
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        cand = IncrementalCandles(spark, f"{workdir}/cand", width="1 hour")
        q = cand.attach(stream, checkpoint=f"{workdir}/cckpt")
        q.awaitTermination(120)
        # replaying an already-applied batch id must be a no-op
        cand.update(events.limit(50), batch_id=0)
        assert _sorted_rows(cand.serve()) == _sorted_rows(
            _batch_candles(events, "1 hour")
        )
    finally:
        events.unpersist()


def test_incremental_moments_equal_batch(spark, sf_dir, workdir):
    """n/Σx/Σx² merge as sums, so out-of-order slice folds must reproduce
    the batch mean/std exactly (exact decimal state, double only at serve)."""
    from moc_indexer_spark.streaming.rollup import IncrementalMoments

    events = _events(spark, sf_dir).cache()
    try:
        mom = IncrementalMoments(spark, f"{workdir}/mom", width="1 hour")
        for i in (1, 2, 0):
            mom.update(events.filter(F.col("event_id") % 3 == i))
        v = F.col("value")
        nd = F.count(F.lit(1)).cast("bigint")
        sx = (F.sum(v.cast("decimal(18,6)")).cast("decimal(18,4)")
              .cast("double"))
        v18 = v.cast("decimal(18,6)")
        sxx = F.sum(v18 * v18).cast("decimal(38,12)").cast("double")
        batch = events.groupBy(
            F.window("ts", "1 hour")["start"].alias("window_start"),
            "event_type",
        ).agg(nd.alias("n_events"), sx.alias("_sx"), sxx.alias("_sxx"))
        mean = F.col("_sx") / F.col("n_events").cast("double")
        batch = batch.select(
            "window_start", "event_type", "n_events",
            mean.alias("mean_value"),
            F.sqrt(F.greatest(
                F.col("_sxx") / F.col("n_events").cast("double") - mean * mean,
                F.lit(0.0),
            )).alias("std_value"),
        )
        assert _sorted_rows(mom.serve()) == _sorted_rows(batch)
    finally:
        events.unpersist()


def test_moments_large_values_not_dropped(spark, workdir):
    """A value >= 10^6 must enter the second moment: the old (12,6)
    square factor NULLed it under non-ANSI decimal overflow, silently
    understating std while n/Σx still counted the row."""
    import datetime as dt

    from moc_indexer_spark.streaming.rollup import IncrementalMoments

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 5), "big", 2_000_000.0),
        (2, dt.datetime(2024, 1, 1, 0, 6), "big", 0.0),
    ]
    batch = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    mom = IncrementalMoments(spark, f"{workdir}/mom_big", width="1 hour")
    mom.update(batch)
    r = mom.serve().collect()[0]
    assert r.n_events == 2
    assert r.mean_value == 1_000_000.0
    assert r.std_value == 1_000_000.0  # exact: both points 1e6 from mean


def test_rollup_serve_before_first_batch_is_empty_typed(spark, workdir):
    """serve() on a never-updated rollup returns an empty relation with
    the serving schema, not an AttributeError on None state."""
    from moc_indexer_spark.streaming.rollup import (
        IncrementalCandles,
        IncrementalMoments,
        IncrementalRollup,
    )

    for i, cls in enumerate(
        (IncrementalRollup, IncrementalCandles, IncrementalMoments)
    ):
        df = cls(spark, f"{workdir}/fresh{i}").serve()
        assert df.count() == 0
        assert len(df.columns) >= 4


def test_rollup_exactly_once_survives_swap_crash(spark, workdir):
    """The applied-batch-id marker travels INSIDE the atomically-swapped
    state dir: after a crash between the swap's renames, recovery leaves
    state and marker consistent — a replay of the applied batch is a
    no-op, never a double-count (the old sidecar marker had exactly that
    window)."""
    import os
    import shutil

    from moc_indexer_spark.streaming.rollup import IncrementalRollup
    from moc_indexer_spark.streaming.swap import _old, _tmp

    events = _events(spark, sf_dir="/root/testdata/sf0.001").cache()
    try:
        p = f"{workdir}/roll_crash"
        roll = IncrementalRollup(spark, p, width="1 hour")
        b0 = events.filter(F.col("event_id") % 2 == 0)
        b1 = events.filter(F.col("event_id") % 2 == 1)
        roll.update(b0, batch_id=0)
        # marker rides inside the state dir
        assert os.path.exists(os.path.join(p, "_batch_id"))

        # simulate a crash mid-swap while applying batch 1: the new state
        # (including its marker) sits complete in tmp, the old dir is
        # renamed away, the install rename never ran
        shutil.copytree(p, f"{workdir}/staged")
        roll.update(b1, batch_id=1)
        shutil.move(p, _tmp(p))           # "new" state as the unswapped tmp
        shutil.move(f"{workdir}/staged", _old(p))  # pre-batch-1 state as old

        roll2 = IncrementalRollup(spark, p, width="1 hour")  # recovery here
        assert roll2._last_applied() == 1
        expected = _sorted_rows(roll2.serve())
        roll2.update(b1, batch_id=1)  # foreachBatch re-delivery
        assert _sorted_rows(roll2.serve()) == expected
        total = sum(r[2] for r in expected)
        assert total == events.count()
    finally:
        events.unpersist()


def test_rollup_crash_between_success_and_batch_id_rolls_back(spark, workdir):
    """Spark stamps _SUCCESS when the DATA write commits — BEFORE
    _atomic_write appends _batch_id. A crash in that gap must be judged
    an incomplete swap and rolled back: installing marker-less state
    would read _last_applied() == -1 and the foreachBatch re-delivery
    would be folded a second time (double-count)."""
    from moc_indexer_spark.streaming.rollup import IncrementalRollup
    from moc_indexer_spark.streaming.swap import _old, _tmp

    events = _events(spark, sf_dir="/root/testdata/sf0.001").cache()
    try:
        p = f"{workdir}/roll_gap"
        roll = IncrementalRollup(spark, p, width="1 hour")
        b0 = events.filter(F.col("event_id") % 2 == 0)
        b1 = events.filter(F.col("event_id") % 2 == 1)
        roll.update(b0, batch_id=0)
        baseline = _sorted_rows(roll.serve())

        # stage the crash: batch-1 state fully written by Spark (parquet +
        # _SUCCESS at tmp root) but the process died before _batch_id
        shutil.copytree(p, f"{workdir}/staged_gap")
        roll.update(b1, batch_id=1)
        shutil.move(p, _tmp(p))
        os.remove(os.path.join(_tmp(p), "_batch_id"))  # the gap
        shutil.move(f"{workdir}/staged_gap", _old(p))

        roll2 = IncrementalRollup(spark, p, width="1 hour")  # recovery
        # rolled BACK to the pre-batch-1 state, marker intact
        assert roll2._last_applied() == 0
        assert _sorted_rows(roll2.serve()) == baseline
        # the re-delivery now folds exactly once
        roll2.update(b1, batch_id=1)
        total = sum(r[2] for r in _sorted_rows(roll2.serve()))
        assert total == events.count()
    finally:
        events.unpersist()
