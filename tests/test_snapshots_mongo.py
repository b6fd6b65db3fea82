"""Snapshot tasks (3/4/6) + Mongo-sink adapter tests."""

import json
import os
from decimal import Decimal

from pyspark.sql import functions as F

from moc_indexer_spark.streaming.sink import ParquetUpsertTable
from moc_indexer_spark.streaming.snapshots import (
    fake_state_fetcher,
    latest_state_view,
    snapshot_blocks,
)


def test_snapshot_invariant_and_history(spark, tmp_path):
    """Per-block snapshots honor the derived-price invariant
    (bprox2PriceInUsd = bprox2PriceInRbtc * bitcoinPrice / 1e18) and the
    history upserts uniquely per blockHeight; the singleton is the
    latest-row view."""
    snaps = snapshot_blocks(spark, fake_state_fetcher, 100, 139)
    rows = snaps.collect()
    assert len(rows) == 40
    for r in rows:
        ref = (Decimal(int(r.bprox2PriceInRbtc)) * Decimal(int(r.bitcoinPrice))) / Decimal(10**18)
        tol = Decimal(int(r.bprox2PriceInRbtc) + int(r.bitcoinPrice)) / Decimal(2 * 10**9) + 1
        assert abs(Decimal(int(r.bprox2PriceInUsd)) - ref) <= tol

    hist = ParquetUpsertTable(spark, f"{tmp_path}/moc_state_history",
                              keys=["blockHeight"])
    hist.upsert(snaps)
    hist.upsert(snapshot_blocks(spark, fake_state_fetcher, 120, 159))  # overlap
    assert hist.read().count() == 60  # 100..159 unique
    latest = latest_state_view(hist.read()).collect()
    assert len(latest) == 1 and latest[0].blockHeight == 159


class FakeMongoClient:
    """pymongo-surface fake: records update_one calls to a JSONL file (the
    executors share the local filesystem in local mode)."""

    def __init__(self, uri):
        self.uri = uri  # uri carries the output path

    def __getitem__(self, db):
        return {"Transaction": _FakeColl(self.uri)}

    def close(self):
        pass


class _FakeColl:
    def __init__(self, path):
        self.path = path

    def update_one(self, flt, update, upsert=True):
        with open(os.path.join(self.path, f"w_{os.getpid()}.jsonl"), "a") as f:
            f.write(json.dumps({"filter": flt, "set": update["$set"],
                                "upsert": upsert}, default=str) + "\n")


def test_mongo_sink_upsert_shape(spark, tmp_path):
    from moc_indexer_spark.sources.mongo_sink import MongoUpsertWriter

    out = str(tmp_path)
    writer = MongoUpsertWriter(
        uri=out, database="moc", collection="Transaction",
        keys=["tx", "address"], client_factory=FakeMongoClient,
    )
    df = spark.createDataFrame(
        [("0xa", "u1", 5.0), ("0xb", "u2", 6.0)], ["tx", "address", "amount"]
    )
    writer(df, batch_id=0)
    recs = []
    for fn in os.listdir(out):
        if fn.startswith("w_") and fn.endswith(".jsonl"):
            with open(os.path.join(out, fn)) as f:
                recs += [json.loads(line) for line in f]
    assert len(recs) == 2
    by_tx = {r["filter"]["tx"]: r for r in recs}
    assert by_tx["0xa"]["filter"] == {"tx": "0xa", "address": "u1"}
    assert by_tx["0xa"]["set"]["amount"] == 5.0
    assert all(r["upsert"] for r in recs)


def test_mongo_sink_import_gate():
    from moc_indexer_spark.sources.mongo_sink import _default_client_factory
    import pytest

    with pytest.raises(ImportError):
        _default_client_factory("mongodb://nowhere")


def test_api_pegout_list(spark):
    from moc_indexer_spark.operators.serving import api_pegout_list

    fastbtc = spark.createDataFrame(
        [("t1", "0xAA", 2, 10), ("t2", "0xaa", 1, 20), ("t3", "0xbb", 4, 30)],
        ["transferId", "rskAddress", "status", "updated"],
    )
    out = api_pegout_list(fastbtc, "0xAa").collect()
    assert [r.transferId for r in out] == ["t2", "t1"]  # newest first
    assert out[0].statusName == "SENDING" and out[1].statusName == "MINED"


def test_report_cli_prints_all_reports(spark, sf_dir, capsys):
    """S9 console sink: the three report CLIs render to stdout
    (app_run_moc_report.py / app_run_moc_pay_tc_holders_report.py /
    app_run_report_last_transactions.py analogs)."""
    from moc_indexer_spark.report_cli import run_report

    run_report(spark, "all", sf_dir, n_rows=5)
    out = capsys.readouterr().out
    for header in ("report_summary", "report_pay_tc_holders",
                   "report_last_transactions"):
        assert f"== {header} ==" in out
    assert "+-" in out  # df.show() table borders rendered


def test_mongo_flush_uses_bulk_write(monkeypatch):
    """_flush must issue ONE bulk_write per buffer (the point of the
    500-op buffering), not one update_one round trip per document; the
    update_one loop is only the fallback for minimal fakes / missing
    pymongo."""
    import sys
    import types

    from moc_indexer_spark.sources.mongo_sink import _flush

    class FakeUpdateOne:
        def __init__(self, flt, update, upsert=False):
            self.flt, self.update, self.upsert = flt, update, upsert

    monkeypatch.setitem(
        sys.modules, "pymongo", types.SimpleNamespace(UpdateOne=FakeUpdateOne)
    )

    calls = {"bulk": [], "one": 0}

    class BulkColl:
        def bulk_write(self, requests, ordered=True):
            calls["bulk"].append((len(requests), ordered))

        def update_one(self, *a, **k):
            calls["one"] += 1

    ops = [({"k": i}, {"k": i, "v": i * 2}) for i in range(7)]
    _flush(BulkColl(), ops, insert=True)
    assert calls["bulk"] == [(7, False)] and calls["one"] == 0

    # no bulk surface -> per-doc fallback still works
    class PlainColl:
        def update_one(self, flt, update, upsert=True):
            calls["one"] += 1

    _flush(PlainColl(), ops, insert=False)
    assert calls["one"] == 7
