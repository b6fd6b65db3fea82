"""Chain source connector (S1-S3, S7): block-range scan -> raw tx rows.

Reference (/root/reference/indexer/):
- scan_raw_txs.py:65-144  incremental block loop from checkpoint+1 to
  tip - blocks_recession, per-block fetch + filter + receipt check
- chain.py:18-37          address-set transaction filter
- chain.py:49-64          receipt confirmation filter
- moc_state.py:28-132     Multicall2 batching: 49 point-in-time reads in one
  round trip (S7)

Spark-first: the chain client is an injected callable (`BlockFetcher`); the
connector turns an inclusive block range into a DataFrame via
`mapPartitions` — each partition holds a contiguous block sub-range and
amortizes RPC round-trips across its blocks (the Multicall idea applied to
block fetch). Incremental state (checkpoint cursor, reorg margin) lives in
the caller's streaming checkpoint; this module is stateless.

No real RPC library ships in this environment: `FakeChain` is a
deterministic in-memory chain used by tests and demos. A web3 client drops
into the same `BlockFetcher` signature.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

# fetch(block_number) -> list of raw-tx dicts (FIXTURES.md §1 shape)
BlockFetcher = Callable[[int], list[dict]]

RAW_TX_SCHEMA = (
    "hash string, blockNumber long, from string, to string, value string, "
    "gas long, gasPrice string, input string, receipt boolean, "
    "processed boolean, gas_used long, confirmations int, timestamp timestamp, "
    "logs array<struct<address:string,logIndex:int,event_name:string,payload:string>>, "
    "status string"
)


@dataclass
class ScanRange:
    """One incremental scan window (scan_raw_txs.py:74-98): from the
    checkpoint cursor + 1 up to tip - recession margin."""

    last_indexed: int
    tip: int
    blocks_recession: int = 2
    look_behind: int = 60

    @property
    def start(self) -> int:
        if self.last_indexed < 0:  # cold start: tip - look_behind
            return max(0, self.tip - self.blocks_recession - self.look_behind)
        return self.last_indexed + 1

    @property
    def end(self) -> int:  # inclusive
        return self.tip - self.blocks_recession


def scan_blocks(
    spark: SparkSession,
    fetcher: BlockFetcher,
    scan: ScanRange,
    contract_addresses: set[str],
    min_confirmations: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Block range -> filtered raw-tx DataFrame.

    The address filter (P1) and confirmation filter (S3) run inside the
    partition right after fetch — rows never reach the shuffle unfiltered.
    """
    from ..session import ship_package

    ship_package(spark)
    if min_confirmations > scan.blocks_recession:
        # the recession margin IS the confirmation guarantee: every
        # in-window block has confs >= blocks_recession, so a larger
        # min_confirmations would silently DROP the window's youngest
        # blocks' txs forever (the caller advances its cursor past them,
        # they are never re-scanned). Refuse loudly instead.
        raise ValueError(
            f"min_confirmations={min_confirmations} exceeds "
            f"blocks_recession={scan.blocks_recession}: txs in the last "
            f"{min_confirmations - scan.blocks_recession} window blocks "
            "would be skipped and never re-scanned — raise "
            "blocks_recession instead"
        )
    if scan.end < scan.start:
        return spark.createDataFrame([], RAW_TX_SCHEMA)
    blocks = list(range(scan.start, scan.end + 1))
    parts = partitions or min(len(blocks), spark.sparkContext.defaultParallelism)
    contracts = {a.lower() for a in contract_addresses}
    tip = scan.tip

    def fetch_partition(block_iter: Iterator[int]) -> Iterator[tuple]:
        # one client per partition; RPC round-trips amortized over its blocks
        for bn in block_iter:
            for tx in fetcher(bn):
                to = (tx.get("to") or "").lower()
                frm = (tx.get("from") or "").lower()
                if to not in contracts and frm not in contracts:
                    continue  # P1 address-set filter (chain.py:18-37)
                confs = tip - tx["blockNumber"]
                if confs < min_confirmations:
                    # S3 receipt confirmation filter (chain.py:49-64) —
                    # status-independent: a reverted receipt is no more
                    # final than a confirmed one until the margin passes.
                    # Given the ValueError guard above this can only fire
                    # for blocks beyond scan.end (defensive).
                    continue
                yield (
                    tx["hash"], tx["blockNumber"], tx.get("from"), tx.get("to"),
                    str(tx.get("value", "0")), tx.get("gas", 0),
                    str(tx.get("gasPrice", "0")), tx.get("input", "0x"), True,
                    False, tx.get("gas_used", 0), confs, tx["timestamp"],
                    tx.get("logs", []), tx.get("status", "confirmed"),
                )

    rdd = spark.sparkContext.parallelize(blocks, parts).mapPartitions(
        fetch_partition
    )
    return spark.createDataFrame(rdd, RAW_TX_SCHEMA)


class FakeChain:
    """Deterministic in-memory chain for tests/demos: block n derives its
    txs from sha256(n) — same data on every executor, no driver shipping."""

    def __init__(self, contracts: list[str], users: list[str], txs_per_block: int = 3):
        self.contracts = contracts
        self.users = users
        self.txs_per_block = txs_per_block

    def __call__(self, block_number: int) -> list[dict]:
        import datetime as dt

        out = []
        for i in range(self.txs_per_block):
            seed = hashlib.sha256(f"{block_number}:{i}".encode()).digest()
            r = int.from_bytes(seed[:8], "big")
            to_contract = r % 3 != 0  # 2/3 touch a watched contract
            payload = {"account": self.users[r % len(self.users)],
                       "amount": str((r % 10**6) * 10**15),
                       "reserveTotal": str((r % 10**5 + 1) * 10**15),
                       "commission": str((r % 10**3) * 10**12),
                       "reservePrice": str(42_000 * 10**18),
                       "mocCommissionValue": str((r % 10**3) * 10**12),
                       "mocPrice": str(5 * 10**17),
                       "btcMarkup": "0"}
            out.append({
                "hash": "0x" + seed.hex(),
                "blockNumber": block_number,
                "from": self.users[r % len(self.users)],
                "to": self.contracts[r % len(self.contracts)] if to_contract
                      else self.users[(r >> 3) % len(self.users)],
                "value": str(r % 10**18),
                "gas": 2_000_000,
                "gasPrice": str(6 * 10**7),
                "gas_used": 21_000 + r % 100_000,
                "timestamp": dt.datetime(2024, 1, 1)
                + dt.timedelta(seconds=30 * block_number),
                "logs": [{"address": self.contracts[0], "logIndex": 0,
                          "event_name": "RiskProMint",
                          "payload": json.dumps(payload)}] if to_contract else [],
                "status": "confirmed" if r % 20 != 0 else "reverted",
            })
        return out


def multicall_enrich(
    df: DataFrame,
    calls: Callable[[list[dict]], list[dict]],
    batch_size: int = 50,
    schema: str | None = None,
) -> DataFrame:
    """S7 Multicall pattern: batch point-in-time reads per partition.

    `calls(rows)` receives up to `batch_size` row-dicts and returns one
    result dict per row (one RPC round trip per batch — 49-calls-in-one as
    in moc_state.py:29-132). Used for balance/state snapshot enrichment
    where the data genuinely lives off-cluster.
    """
    from ..session import ship_package

    ship_package(df.sparkSession)
    out_schema = schema or df.schema

    def run(partition):
        buf = []
        for row in partition:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= batch_size:
                yield from calls(buf)
                buf = []
        if buf:
            yield from calls(buf)

    return df.sparkSession.createDataFrame(df.rdd.mapPartitions(run), out_schema)
