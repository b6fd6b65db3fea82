"""Event decode/demux/enrichment pipeline tests: derived columns checked
against a Python-Decimal reference implementation of the mocexchange
formulas (/root/reference/indexer/events/mocexchange.py:42-89)."""

import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from moc_indexer_spark.operators import events as E
from moc_indexer_spark.streaming.sink import ParquetUpsertTable
from moc_indexer_spark.sources.fixtures import MOC, RAW_SCHEMA, ZERO, generate_raw_txs

W = Decimal(10**18)


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(generate_raw_txs(), RAW_SCHEMA).cache()


@pytest.fixture(scope="module")
def outputs(raw):
    return E.run_event_pipeline(raw)


def _ref_usd(a: int, p: int) -> Decimal:
    return (Decimal(a) * Decimal(p)) / W


def test_exchange_formulas_match_reference(raw, outputs):
    """USDAmount / commission fallback / gas fee / signed total vs the
    arbitrary-precision Python reference, within the documented gwei-rescale
    dust tolerance."""
    tx = {r["transactionHash"]: r for r in outputs["transactions"].collect()}
    assert len(tx) > 20
    checked_fallback = 0
    for row in raw.collect():
        if row.status != "confirmed":
            continue
        for log in row.logs:
            if log.event_name not in ("RiskProMint", "RiskProRedeem",
                                      "StableTokenMint", "RiskProxMint",
                                      "FreeStableTokenRedeem"):
                continue
            p = json.loads(log.payload)
            out = tx[row.hash]
            rt, rp = int(p["reserveTotal"]), int(p["reservePrice"])
            ref_usd = _ref_usd(rt, rp)
            tol = Decimal(rt + rp) / Decimal(2 * 10**9) + 1
            assert abs(Decimal(out.USDAmount) - ref_usd) <= tol
            # F5 fallback: zero rbtc commission -> MoC-token commission path
            markup = int(p.get("btcMarkup") or p.get("reserveTokenMarkup") or 0)
            rbtc_comm = int(p["commission"]) + markup
            if rbtc_comm == 0:
                mc, mp = int(p["mocCommissionValue"]), int(p["mocPrice"])
                ref_comm = _ref_usd(mc, mp)
                tol2 = Decimal(mc + mp) / Decimal(2 * 10**9) + 1
                assert abs(Decimal(out.USDCommission) - ref_comm) <= tol2
                checked_fallback += 1
            # gas fee exact
            assert int(out.gasFeeRBTC) == row.gas_used * int(row.gasPrice)
            # signed total magnitude & sign (F7)
            expect_sign = 1 if log.event_name.endswith("Mint") else -1
            assert (1 if int(out.RBTCTotal) >= 0 else -1) == expect_sign
    assert checked_fallback > 0, "fixture must exercise the F5 fallback"


def test_reverted_txs_are_dropped(raw, outputs):
    reverted = {r.hash for r in raw.collect() if r.status == "reverted"}
    for name, df in outputs.items():
        cols = df.columns
        key = "transactionHash" if "transactionHash" in cols else None
        if key:
            assert not (set(r[key] for r in df.collect()) & reverted)


def test_transfer_sides_and_exclusions(raw, outputs):
    """Transfer emits FROM and TO rows; transfers touching the zero address
    or the MoC contract are dropped entirely (P6)."""
    valid = excluded = 0
    for row in raw.collect():
        if row.status != "confirmed":
            continue
        for log in row.logs:
            if log.event_name != "Transfer":
                continue
            p = json.loads(log.payload)
            if p["from"].lower() in (ZERO, MOC.lower()) or p["to"].lower() in (
                ZERO, MOC.lower(),
            ):
                excluded += 1
            else:
                valid += 1
    rows = outputs["transfers"].collect()
    assert excluded > 0 and valid > 0
    assert len(rows) == 2 * valid
    neg = [r for r in rows if not r.isPositive]
    pos = [r for r in rows if r.isPositive]
    assert len(neg) == valid and len(pos) == valid
    assert all(int(r.signedAmount) < 0 for r in neg if int(r.amount) > 0)


def test_approval_spender_guard(raw, outputs):
    """Only approvals whose spender is the MoC contract survive (P7)."""
    expected = 0
    for row in raw.collect():
        if row.status != "confirmed":
            continue
        for log in row.logs:
            if log.event_name == "Approval":
                p = json.loads(log.payload)
                if p["spender"].lower() == MOC.lower():
                    expected += 1
    got = outputs["approvals"].count()
    assert got == expected > 0


def test_fastbtc_update_only_semantics(spark, tmp_path, outputs):
    """NewBitcoinTransfer inserts; StatusUpdated merges update-only — an
    update without a prior insert must vanish (T6)."""
    tbl = ParquetUpsertTable(spark, f"{tmp_path}/fastbtc", keys=["transferId"])
    tbl.upsert(outputs["fastbtc_new"])
    inserted = {r.transferId for r in tbl.read().collect()}
    updates = outputs["fastbtc_updates"]
    ghost = {r.transferId for r in updates.collect()} - inserted
    base = tbl.read().select("transferId", "status", "updated")
    upd = updates.select("transferId", "status", "updated")
    merged = (
        base.join(upd.select(F.col("transferId"),
                             F.col("status").alias("new_status")),
                  "transferId", "left")
    )
    tbl2 = ParquetUpsertTable(spark, f"{tmp_path}/fastbtc2", keys=["transferId"])
    tbl2.upsert(base)
    tbl2.upsert(upd, insert=False)
    final = {r.transferId: r.status for r in tbl2.read().collect()}
    assert ghost, "fixture must include a ghost StatusUpdated"
    assert not (set(final) & ghost)
    # at least one real transition applied
    changed = [t for t, s in final.items() if s != 1]
    assert changed


def test_state_transition_decode(outputs):
    rows = outputs["notifications"].collect()
    assert rows
    names = {0: "Liquidated", 1: "BProDiscountRate", 2: "BelowCobj", 3: "AboveCobj"}
    for r in rows:
        assert r.stateName == names[r.newState]


def test_settlement_family(raw, outputs):
    """SettlementStarted rows, RedeemRequestAlter bool coercion (F14 with
    BOTH encodings), processed notifications."""
    st = outputs["settlement_state"].collect()
    assert st and all(r.inProcess for r in st)
    alters = outputs["redeem_queue"].collect()
    assert alters
    expected = {}
    for row in raw.collect():
        if row.status != "confirmed":
            continue
        for log in row.logs:
            if log.event_name == "RedeemRequestAlter":
                p = json.loads(log.payload)
                v = p["isAddition"]
                expected[(row.hash, log.logIndex)] = (
                    v if isinstance(v, bool) else v.lower() == "true"
                )
    assert expected
    got = {(r.transactionHash, r.logIndex): r.isAddition for r in alters}
    assert got == expected


def test_inrate_and_liquidation(raw, outputs):
    hi = outputs["holders_interest"].collect()
    assert hi and all(int(r.amount) > 0 for r in hi)
    liq = outputs["liquidation_notifications"].collect()
    assert liq and all(r.bucket in ("X2", "C0") for r in liq)


def test_settlement_retention_trigger(spark, tmp_path, outputs):
    """T9: SettlementCompleted purges old redeem-queue rows at/below the
    completed block."""
    import datetime as dtm

    from moc_indexer_spark.operators.events import apply_settlement_retention
    from pyspark.sql import functions as FF

    tbl = ParquetUpsertTable(spark, f"{tmp_path}/redeem_queue",
                            keys=["transactionHash", "logIndex"])
    tbl.upsert(outputs["redeem_queue"])
    n_before = tbl.read().count()
    completed = outputs["settlement_completed"]
    if completed.isEmpty():
        import pytest as _pt
        _pt.skip("fixture produced no SettlementCompleted")
    # force every row to look ancient so the retention window passes
    aged = tbl.read().withColumn(
        "createdAt", FF.col("createdAt") - FF.expr("INTERVAL 400 DAYS")
    )
    tbl.upsert(aged)
    apply_settlement_retention(tbl, completed, retention_days=31)
    max_completed = max(r.completedBlockNumber for r in completed.collect())
    remaining = tbl.read().collect()
    assert all(r.blockNumber > max_completed for r in remaining)
    assert len(remaining) < n_before


def test_exchange_single_pass_equals_per_event_union(spark):
    """enrich_exchange_all (one isin+from_json pass) must emit exactly the
    union of the 7 per-event enrichments."""
    from moc_indexer_spark.operators.events import (
        EXCHANGE_EVENTS, enrich_exchange, enrich_exchange_all, explode_logs,
    )
    from moc_indexer_spark.sources.chain import FakeChain, ScanRange, scan_blocks
    from moc_indexer_spark.app import CONTRACTS, USERS

    raw = scan_blocks(
        spark, FakeChain(CONTRACTS, USERS, txs_per_block=10),
        ScanRange(last_indexed=-1, tip=40), set(CONTRACTS),
    )
    logs = explode_logs(raw).filter(F.col("receipt_status") == "confirmed")
    union = None
    for name in EXCHANGE_EVENTS:
        part = enrich_exchange(logs, name)
        union = part if union is None else union.unionByName(part)
    a = sorted(map(tuple, union.collect()))
    b = sorted(map(tuple, enrich_exchange_all(logs).collect()))
    assert a == b and len(a) > 0


def test_transfer_routing_by_token_contract(spark):
    """Per-(contract, event) demux like the reference's map_events
    (scan_events_txs.py:147-153): a DoC-token Transfer must land labeled
    STABLE, a BPro-token Transfer RISKPRO, and a Transfer from an
    UNMAPPED contract is skipped — not absorbed as RISKPRO. Approval
    handling scopes to the given contracts."""
    import datetime as dt

    bpro = "0x" + "b1" * 20
    doc = "0x" + "d0" * 20
    other = "0x" + "ee" * 20
    u1, u2 = "0x" + "11" * 20, "0x" + "22" * 20

    def tx(i, log_addr, event_name, payload):
        return {
            "hash": f"0x{i:064x}", "blockNumber": i, "from": u1, "to": u2,
            "value": "0", "gas": 21000, "gasPrice": "1", "input": "0x",
            "receipt": True, "processed": False, "gas_used": 21000,
            "confirmations": 12,
            "timestamp": dt.datetime(2024, 1, 1, 0, i),
            "logs": [{"address": log_addr, "logIndex": 0,
                      "event_name": event_name,
                      "payload": json.dumps(payload)}],
            "status": "confirmed",
        }

    t_payload = {"from": u1, "to": u2, "value": str(10**18)}
    a_payload = {"owner": u1, "spender": E.MOC if hasattr(E, "MOC") else "0x" + "ab" * 20,
                 "value": str(10**18)}
    from moc_indexer_spark.sources.fixtures import MOC, RAW_SCHEMA

    a_payload["spender"] = MOC
    raw = spark.createDataFrame(
        [tx(1, bpro, "Transfer", t_payload),
         tx(2, doc, "Transfer", t_payload),
         tx(3, other, "Transfer", t_payload),
         tx(4, doc, "Approval", a_payload),
         tx(5, other, "Approval", a_payload)],
        RAW_SCHEMA,
    )
    outs = E.run_event_pipeline(
        raw, moc_contract=MOC,
        token_contracts={bpro: "RISKPRO", doc: "STABLE"},
        approval_contracts=(doc,),
        only=("transfers", "approvals"),
    )
    transfers = outs["transfers"].collect()
    by_hash = {}
    for r in transfers:
        by_hash.setdefault(r.transactionHash, set()).add(r.tokenInvolved)
    assert by_hash == {
        f"0x{1:064x}": {"RISKPRO"},
        f"0x{2:064x}": {"STABLE"},
    }  # the unmapped contract's Transfer is skipped entirely
    approvals = outs["approvals"].collect()
    assert {r.transactionHash for r in approvals} == {f"0x{4:064x}"}


def test_empty_token_contracts_yields_empty_transfers(raw):
    """token_contracts={} is a valid 'no tokens watched' config: the
    transfers output must be an EMPTY relation with the normal transfers
    schema — not an IndexError, and not silently the None-path default."""
    base = E.run_event_pipeline(raw, only=("transfers",))["transfers"]
    outs = E.run_event_pipeline(raw, token_contracts={}, only=("transfers",))
    assert outs["transfers"].count() == 0
    assert outs["transfers"].schema == base.schema
