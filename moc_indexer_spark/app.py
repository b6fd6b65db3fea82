"""End-to-end indexer application (the app_run_moc_indexer.py analog).

Wires the whole engine together over a chain source:
  scan blocks (S1-S3) -> event decode/demux/enrich (J2, F3-F7)
  -> keyed upsert tables (S4, T6-T8) -> serving queries (§3.2)

Run demo:  python -m moc_indexer_spark.app [n_blocks]

Production shape: `run_incremental` is one scan cycle (the reference's
3-second task); a deployment loops it under the QueryManager (streaming/
manager.py) or converts the source into a readStream with the same
transforms (streaming/pipeline.py shows batch/stream parity).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators.events import run_event_pipeline
from .session import get_spark
from .sources.chain import BlockFetcher, FakeChain, ScanRange, scan_blocks
from .streaming.sink import ParquetUpsertTable

CONTRACTS = ["0x" + "ab" * 20, "0x" + "cd" * 20]
USERS = ["0x" + f"{i:040x}" for i in range(1, 21)]

# one delta shard per this many scanned blocks in a cycle (see the shard
# gate in run_incremental): at 20 txs/block a 2000-block shard is ~40k
# rows per write task — small enough to stream through one task quickly,
# large enough that tick-sized cycles (10-500 blocks) stay single-file
SHARD_BLOCKS = 2000


def _delta_shards(n_blocks: int, parallelism: int) -> int:
    """Delta shard gate: how many files a cycle's delta append writes.

    Derived from the cycle's block count driver-side (no count job): a
    tick-sized cycle keeps the measured single-file append; a catch-up
    cycle (outage recovery) sheds the one serialization point in its
    write path — one shard per SHARD_BLOCKS blocks, capped at the
    session's parallelism. `run_incremental` and the tick-safety pin in
    tests/test_sink_mor.py both use THIS function, so the gate cannot
    drift from its test."""
    return min(parallelism, max(1, n_blocks // SHARD_BLOCKS))


class Indexer:
    """Holds the sink tables + checkpoint cursor for incremental scans."""

    def __init__(self, spark: SparkSession, data_dir: str, fetcher: BlockFetcher,
                 contracts: list[str] | None = None, sink_mode: str = "cow",
                 config=None, compact_every: int = 16):
        """sink_mode="mor" appends delta batches instead of rewriting the
        sink tables each cycle — the low-latency shape for the 3-second
        incremental tick (measured in PLANS.md); "cow" (default) keeps
        reads cheapest for batch/serving-heavy use.

        `compact_every` is the AUTO-COMPACTION policy (MoR only): each
        sink folds its deltas back into a single base once that many
        delta dirs accrete, so a daemon running for months never rides
        the delta-accretion slope (SCALE_CURVE.json mor_cycle_vs_history
        measured 1.95 s at 60k blocks WITHOUT the policy vs 1.44-1.59 s
        fresh; mor_read_vs_deltas shows the resolve cost growing with
        dir count and the post-compact map-only fast path reclaiming
        it). The fold is amortized maintenance under a CYCLE BUDGET: the
        Indexer folds at most ONE crossed table per cycle
        (_maybe_compact_one — a tick never absorbs two rewrites), every
        other cycle reads the single-dir fast path, and the sinks keep a
        4x-threshold backstop for use outside run_incremental. 16 here
        vs the bare sink's 64: an indexer tick appends to SIX sinks per
        cycle and the serving reads (§3.2) sit on the same tables.

        `config` (moc_indexer_spark.config.IndexerConfig) supplies the scan
        knobs (blocks_recession / blocks_look_behind, the forced
        from_block/to_block replay range, scan_raw_txs.py:74-98) and, when
        `contracts` is omitted, the network's contract address set."""
        from .config import IndexerConfig

        self.spark = spark
        self.fetcher = fetcher
        self.config = config or IndexerConfig()
        if contracts is None:
            contracts = [a for a in self.config.contract_addresses.values()]
        self.contracts = contracts
        self.last_indexed = -1
        m = sink_mode
        # The INDEXER owns the fold policy (see _maybe_compact_one: at
        # most one sink fold per cycle — a hard invariant; per-table
        # threshold staggering still collides at lcm points). The sinks
        # keep a 4x backstop so state stays bounded even if someone
        # drives these tables outside run_incremental.
        self._compact_threshold = compact_every
        self._compact_rr = 0  # round-robin cursor over self.tables
        ce = 4 * compact_every
        self.tables = {
            "raw_transactions": ParquetUpsertTable(
                spark, f"{data_dir}/raw_transactions",
                keys=["hash", "blockNumber"], mode=m, compact_every=ce,
            ),
            "transactions": ParquetUpsertTable(
                spark, f"{data_dir}/transactions",
                keys=["transactionHash", "address", "event"], mode=m,
                compact_every=ce,
            ),
            "transfers": ParquetUpsertTable(
                spark, f"{data_dir}/transfers",
                keys=["transactionHash", "address", "event"], mode=m,
                compact_every=ce,
            ),
            "fastbtc": ParquetUpsertTable(
                spark, f"{data_dir}/fastbtc", keys=["transferId"],
                version_col="updated", mode=m, compact_every=ce,
            ),
            "notifications": ParquetUpsertTable(
                spark, f"{data_dir}/notifications",
                keys=["transactionHash", "logIndex", "event"], mode=m,
                compact_every=ce,
            ),
            "user_state": ParquetUpsertTable(
                spark, f"{data_dir}/user_state", keys=["address"],
                version_col="block_height", mode=m, compact_every=ce,
            ),
        }

    def _maybe_compact_one(self) -> str | None:
        """Fold AT MOST ONE MoR sink whose delta-dir count crossed the
        policy threshold — called once per cycle, so a tick never absorbs
        two table rewrites (review finding: per-table threshold
        staggering only shifts the collision to lcm points; a cycle-level
        budget is the real invariant). Tables that cross together queue
        behind the round-robin cursor and fold on the following cycles —
        their dir count overshoots the threshold by at most the table
        count while waiting, which the sinks' 4x backstop dwarfs. Returns
        the folded table's name (None if nothing crossed)."""
        names = list(self.tables)
        for k in range(len(names)):
            name = names[(self._compact_rr + k) % len(names)]
            t = self.tables[name]
            if t.mode == "mor" and (
                len(t.history()) >= self._compact_threshold
            ):
                t.compact()
                self._compact_rr = (self._compact_rr + k + 1) % len(names)
                return name
        return None

    def run_balance_refresh(self, queue_df, tip: int) -> int:
        """Task-7 analog (scan_moc_user.py:33-78 + moc_balances.py:110-171):
        drain the pending-refresh queue, coalesce duplicate accounts (T7),
        fetch point-in-time balances via batched per-partition calls (S7),
        versioned upsert into user_state (T8 monotonic guard)."""
        import hashlib as _h

        from .sources.chain import multicall_enrich

        pending = queue_df.select(
            F.lower(F.col("account")).alias("account")
        ).dropDuplicates(["account"])

        def balance_calls(rows):
            out = []
            for r in rows:  # one multicall round trip per batch
                seed = _h.sha256(f"{r['account']}:{tip}".encode()).digest()
                v = int.from_bytes(seed[:8], "big")
                out.append({
                    "address": r["account"],
                    "block_height": tip,
                    "moc_balance": str(v % 10**22),
                    "rbtc_balance": str((v >> 16) % 10**20),
                    "doc_balance": str((v >> 32) % 10**21),
                })
            return out

        bal = multicall_enrich(
            pending, balance_calls, batch_size=50,
            schema=("address string, block_height long, moc_balance string, "
                    "rbtc_balance string, doc_balance string"),
        ).persist()  # upsert + count: one multicall pass, not two (a second
        # uncached pass would re-issue every balance RPC — and against a
        # live chain fetch balances at a DIFFERENT moment than was written)
        try:
            self.tables["user_state"].upsert(bal)
            return bal.count()
        finally:
            bal.unpersist()

    def run_incremental(self, tip: int, report_counts: bool = False) -> dict[str, int]:
        """One scan cycle: checkpoint+1 .. tip-recession -> all sinks.

        report_counts runs a full count on every sink table after the cycle
        — diagnostic only (6 extra jobs, ~2 s at demo scale); the production
        tick skips it."""
        cfg = self.config
        if cfg.from_block or cfg.to_block:
            # forced replay range ("for testing only", scan_raw_txs.py:94-98):
            # index exactly [from_block, to_block], ignoring the cursor.
            # One-sided forms work too: from_block alone replays up to the
            # LIVE tip (to_block=0 used to freeze the forced tip at the
            # recession margin — an empty scan forever); to_block alone
            # replays from GENESIS (look_behind=forced_tip defeats the
            # cold-start tip-minus-60 heuristic, which would silently skip
            # every block before to_block-60).
            forced_tip = (
                cfg.to_block + cfg.blocks_recession if cfg.to_block else tip
            )
            scan = ScanRange(
                last_indexed=cfg.from_block - 1,
                tip=forced_tip,
                blocks_recession=cfg.blocks_recession,
                look_behind=forced_tip,
            )
        else:
            scan = ScanRange(
                last_indexed=self.last_indexed,
                tip=tip,
                blocks_recession=cfg.blocks_recession,
                look_behind=cfg.blocks_look_behind,
            )
        raw = scan_blocks(
            self.spark, self.fetcher, scan, set(self.contracts)
        ).cache()
        try:
            if raw.isEmpty():
                # the scan itself succeeded — advance the cursor even with
                # zero matching txs, or a quiet contract re-fetches an
                # ever-growing window (every block since the last matching
                # tx) on every tick until the 3 s cadence can't keep up
                self.last_indexed = scan.end
                # quiet cycles are the CHEAPEST place to pay maintenance
                self._maybe_compact_one()
                return {"last_indexed": self.last_indexed}
            outs = run_event_pipeline(
                raw, moc_contract=self.contracts[0],
                # build only the plans this cycle consumes — the full
                # 12-output build is ~2x the driver analysis per tick
                only=("transactions", "transfers", "fastbtc_new",
                      "fastbtc_updates", "notifications"),
            )
            # the sinks are independent tables -> submit their merge jobs
            # concurrently (Spark's scheduler interleaves them; the
            # reference runs its tasks on a 5-worker pool the same way).
            # fastbtc's two ops stay ordered: update-only must see the rows
            # the insert pass created.
            from concurrent.futures import ThreadPoolExecutor

            n_blocks = scan.end - scan.start + 1
            shards = _delta_shards(
                n_blocks, self.spark.sparkContext.defaultParallelism
            )

            def _fastbtc():
                self.tables["fastbtc"].upsert(outs["fastbtc_new"],
                                              shards=shards)
                self.tables["fastbtc"].upsert(outs["fastbtc_updates"],
                                              insert=False, shards=shards)

            jobs = [
                lambda: self.tables["raw_transactions"].upsert(
                    raw, shards=shards),
                lambda: self.tables["transactions"].upsert(
                    outs["transactions"], shards=shards),
                lambda: self.tables["transfers"].upsert(
                    outs["transfers"], shards=shards),
                _fastbtc,
                lambda: self.tables["notifications"].upsert(
                    outs["notifications"], shards=shards),
            ]
            with ThreadPoolExecutor(max_workers=5) as pool:
                futures = [pool.submit(j) for j in jobs]
                for f in futures:
                    f.result()  # surface the first failure
            self.last_indexed = scan.end
            self._maybe_compact_one()
            if not report_counts:
                return {"last_indexed": self.last_indexed}
            return {name: (t.read().count() if t.read() is not None else 0)
                    for name, t in self.tables.items()}
        finally:
            # a long-running daemon must not accrete one cached RDD per tick
            raw.unpersist()


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    spark = get_spark(app_name="moc-indexer-demo")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    with tempfile.TemporaryDirectory() as data_dir:
        idx = Indexer(spark, data_dir, FakeChain(CONTRACTS, USERS), CONTRACTS)
        # two incremental cycles, like two ticks of the 3s task
        for tip in (n_blocks // 2, n_blocks):
            counts = idx.run_incremental(tip, report_counts=True)
            print(f"tip={tip} cursor={idx.last_indexed} table_rows={counts}")
        tx = idx.tables["transactions"].read()
        print("sample enriched transactions:")
        tx.select(
            "transactionHash", "address", "event", "USDAmount", "RBTCTotal",
            "isPositive",
        ).orderBy(F.desc("blockNumber")).show(5, truncate=32)
    spark.stop()


if __name__ == "__main__":
    main()
