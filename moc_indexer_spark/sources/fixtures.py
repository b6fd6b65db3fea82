"""Deterministic raw_transactions fixture generator (FIXTURES.md §1-2).

Lives in the package (not tests/) so registry demo queries can build the
reference-shaped raw stream anywhere the driver runs.

Builds the reference-shaped raw tx rows with decoded-event JSON payloads in
the `logs` array, including every edge path: markup field variants (F5
fallback), zero-address / contract transfers (P6), foreign-spender
approvals (P7), StatusUpdated without prior NewBitcoinTransfer (T6)."""

import datetime as dt
import json
import random

ZERO = "0x" + "00" * 20
MOC = "0x" + "ab" * 20
W = 10**18


def _addr(rng):
    return "0x" + "".join(rng.choices("0123456789abcdef", k=40))


def _hash(rng):
    return "0x" + "".join(rng.choices("0123456789abcdef", k=64))


def generate_raw_txs(n_tx: int = 120, seed: int = 7):
    rng = random.Random(seed)
    users = [_addr(rng) for _ in range(20)]
    base_ts = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n_tx):
        block = 1000 + i // 2
        logs = []
        kind = i % 9
        if kind in (0, 1):  # exchange event
            name = rng.choice(
                ["RiskProMint", "RiskProRedeem", "StableTokenMint",
                 "RiskProxMint", "FreeStableTokenRedeem"]
            )
            zero_comm = rng.random() < 0.3  # exercise F5 fallback
            payload = {
                "account": rng.choice(users),
                "amount": str(rng.randrange(1, 10**22)),
                "reserveTotal": str(rng.randrange(10**15, 10**21)),
                "commission": "0" if zero_comm else str(rng.randrange(10**12, 10**17)),
                "reservePrice": str(rng.randrange(10**21, 10**23)),
                "mocCommissionValue": str(rng.randrange(10**12, 10**17)),
                "mocPrice": str(rng.randrange(10**17, 10**19)),
            }
            # one of two markup encodings (F5 input variant)
            markup_key = rng.choice(["btcMarkup", "reserveTokenMarkup"])
            payload[markup_key] = "0" if zero_comm else str(rng.randrange(10**11, 10**15))
            if name.startswith("RiskProx"):
                payload["interests"] = str(rng.randrange(10**12, 10**16))
                payload["leverage"] = str(2 * W)
            logs.append({"address": MOC, "logIndex": 0, "event_name": name,
                         "payload": json.dumps(payload)})
        elif kind == 2:  # transfers, some touching excluded addresses
            frm = rng.choice([ZERO, MOC] + users)
            to = rng.choice([ZERO] + users)
            logs.append({
                "address": _addr(rng), "logIndex": 0, "event_name": "Transfer",
                "payload": json.dumps(
                    {"from": frm, "to": to, "value": str(rng.randrange(1, 10**20))}
                ),
            })
        elif kind == 3:  # approvals: half foreign spender (must be dropped)
            spender = MOC if rng.random() < 0.5 else _addr(rng)
            logs.append({
                "address": _addr(rng), "logIndex": 0, "event_name": "Approval",
                "payload": json.dumps(
                    {"owner": rng.choice(users), "spender": spender,
                     "value": str(rng.randrange(1, 10**20))}
                ),
            })
        elif kind == 4:  # fastbtc lifecycle; some updates have no insert
            tid = f"tid-{i if rng.random() < 0.8 else 99999}"
            logs.append({
                "address": _addr(rng), "logIndex": 0,
                "event_name": "NewBitcoinTransfer",
                "payload": json.dumps({
                    "transferId": f"tid-{i}", "btcAddress": "bc1q" + "x" * 20,
                    "nonce": i, "amountSatoshi": str(rng.randrange(10**4, 10**9)),
                    "feeSatoshi": str(rng.randrange(10, 10**4)),
                    "rskAddress": rng.choice(users),
                }),
            })
            logs.append({
                "address": _addr(rng), "logIndex": 1,
                "event_name": "BitcoinTransferStatusUpdated",
                "payload": json.dumps(
                    {"transferId": tid, "newStatus": rng.choice([2, 3, 4])}
                ),
            })
        elif kind == 5:  # state transition notification
            logs.append({
                "address": _addr(rng), "logIndex": 0,
                "event_name": "StateTransition",
                "payload": json.dumps({"newState": rng.randrange(0, 4)}),
            })
        elif kind == 6:  # settlement lifecycle
            logs.append({
                "address": _addr(rng), "logIndex": 0,
                "event_name": "SettlementStarted",
                "payload": json.dumps({
                    "stableTokenRedeemCount": rng.randrange(0, 50),
                    "deleveragingCount": rng.randrange(0, 20),
                    "riskProxPrice": str(rng.randrange(10**17, 10**19)),
                    "reservePrice": str(rng.randrange(10**21, 10**23)),
                }),
            })
            # isAddition arrives bool-encoded OR string-encoded (F14)
            is_add = rng.random() < 0.5
            encoded = rng.choice([is_add, str(is_add)])
            logs.append({
                "address": _addr(rng), "logIndex": 1,
                "event_name": "RedeemRequestAlter",
                "payload": json.dumps({
                    "redeemer": rng.choice(users),
                    "delta": str(rng.randrange(1, 10**20)),
                    "isAddition": encoded,
                }),
            })
            if rng.random() < 0.3:
                logs.append({
                    "address": _addr(rng), "logIndex": 2,
                    "event_name": "SettlementCompleted",
                    "payload": json.dumps({}),
                })
        elif kind == 7:  # inrate interest payment
            logs.append({
                "address": _addr(rng), "logIndex": 0,
                "event_name": "RiskProHoldersInterestPay",
                "payload": json.dumps({
                    "amount": str(rng.randrange(10**15, 10**20)),
                    "nReserveBucketC0BeforePay": str(rng.randrange(10**18, 10**23)),
                }),
            })
        else:  # liquidation notifications
            logs.append({
                "address": _addr(rng), "logIndex": 0,
                "event_name": rng.choice(
                    ["BucketLiquidation", "ContractLiquidated"]
                ),
                "payload": json.dumps({"bucket": rng.choice(["X2", "C0"])}),
            })

        rows.append({
            "hash": _hash(rng),
            "blockNumber": block,
            "from": rng.choice(users),
            "to": MOC,
            "value": str(rng.randrange(0, 10**20)),
            "gas": 2_000_000,
            "gasPrice": str(rng.randrange(6 * 10**7, 10**10)),
            "input": "0x",
            "receipt": True,
            "processed": False,
            "gas_used": rng.randrange(21_000, 2_000_000),
            "confirmations": 20,
            "timestamp": base_ts + dt.timedelta(seconds=30 * (i // 2)),
            "logs": logs,
            "status": "confirmed" if rng.random() < 0.95 else "reverted",
        })
    return rows


RAW_SCHEMA = (
    "hash string, blockNumber long, from string, to string, value string, "
    "gas long, gasPrice string, input string, receipt boolean, "
    "processed boolean, gas_used long, confirmations int, "
    "timestamp timestamp, "
    "logs array<struct<address:string,logIndex:int,event_name:string,payload:string>>, "
    "status string"
)


# -- persisted fixture parquet (oracle-gating the J2 pipeline) ---------------
#
# The DuckDB oracle for the event pipeline needs BOTH engines to read the
# SAME bytes, so the deterministic fixture stream is persisted once as a
# single parquet file (committed to the repo; regenerated on demand if
# missing — generate_raw_txs is seeded, so content is reproducible).

FIXTURE_N_TX = 240
FIXTURE_SEED = 11


def fixture_parquet_path() -> str:
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(repo_root, "fixtures", "raw_transactions.parquet")


def ensure_fixture_parquet() -> str:
    """Write the fixture stream to its parquet path if absent; return it.

    The file is committed to the repo, so the common path is a bare
    os.path.exists — pyarrow is only imported (and the filesystem only
    written) when regenerating a deleted fixture. Called at registry
    import time (the oracle SQL embeds the path), so keeping this cheap
    and side-effect-free in the normal case matters."""
    import os
    import uuid

    path = fixture_parquet_path()
    if os.path.exists(path):
        return path

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = generate_raw_txs(FIXTURE_N_TX, seed=FIXTURE_SEED)
    schema = pa.schema(
        [
            ("hash", pa.string()),
            ("blockNumber", pa.int64()),
            ("from", pa.string()),
            ("to", pa.string()),
            ("value", pa.string()),
            ("gas", pa.int64()),
            ("gasPrice", pa.string()),
            ("input", pa.string()),
            ("receipt", pa.bool_()),
            ("processed", pa.bool_()),
            ("gas_used", pa.int64()),
            ("confirmations", pa.int32()),
            ("timestamp", pa.timestamp("us")),
            (
                "logs",
                pa.list_(
                    pa.struct(
                        [
                            ("address", pa.string()),
                            ("logIndex", pa.int32()),
                            ("event_name", pa.string()),
                            ("payload", pa.string()),
                        ]
                    )
                ),
            ),
            ("status", pa.string()),
        ]
    )
    # unique staging name: two concurrent first-run processes must not
    # interleave writes into the same tmp file
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
    os.replace(tmp, path)  # atomic publish; losers overwrite with equal bytes
    return path
