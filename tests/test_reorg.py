"""T1 reorg safety end-to-end: the recession margin exists so blocks that
can still be replaced by a chain reorganization are never indexed; once
they mature, the indexer must record the CANONICAL (post-reorg) content.
Reference: blocks_recession scanning to tip-k
(/root/reference/indexer/scan_raw_txs.py:74-80,
settings/settings-moc-mainnet2.json:22)."""

import hashlib

from moc_indexer_spark.app import CONTRACTS, USERS, Indexer
from moc_indexer_spark.config import IndexerConfig
from moc_indexer_spark.sources.chain import FakeChain


class ReorgChain(FakeChain):
    """FakeChain whose blocks >= fork_at serve 'branch'-dependent content —
    flipping `branch` simulates a reorg replacing the chain's unstable tip."""

    def __init__(self, *args, fork_at: int = 10**9, **kwargs):
        super().__init__(*args, **kwargs)
        self.fork_at = fork_at
        self.branch = "a"

    def __call__(self, block_number: int) -> list[dict]:
        txs = super().__call__(block_number)
        if block_number >= self.fork_at and self.branch == "b":
            # the reorged branch carries different txs: perturb the hashes
            # (identity of the tx set is what a reorg changes)
            for t in txs:
                t["hash"] = "0x" + hashlib.sha256(
                    (t["hash"] + ":b").encode()
                ).digest().hex()
        return txs


def test_recession_margin_survives_reorg(spark, tmp_path):
    chain = ReorgChain(CONTRACTS, USERS, fork_at=19)
    cfg = IndexerConfig(blocks_recession=2, blocks_look_behind=60)
    idx = Indexer(spark, str(tmp_path), chain, CONTRACTS, config=cfg)

    # tick 1: tip=20 -> indexes only <= 18; blocks 19-20 are inside the
    # recession margin and must NOT be recorded yet
    idx.run_incremental(tip=20)
    raw = idx.tables["raw_transactions"].read()
    assert raw.agg({"blockNumber": "max"}).collect()[0][0] <= 18

    # the reorg happens: blocks >= 19 are replaced on the canonical chain
    chain.branch = "b"

    # tick 2: tip=22 -> 19-20 have matured; the indexer sees the CANONICAL
    # branch-b content, never the orphaned branch-a txs
    idx.run_incremental(tip=22)
    raw = idx.tables["raw_transactions"].read()
    got = {r.hash for r in raw.filter("blockNumber in (19, 20)").collect()}
    contracts = {c.lower() for c in CONTRACTS}

    def expected(branch):
        chain.branch = branch
        out = set()
        for bn in (19, 20):
            for t in chain(bn):
                if (t.get("to") or "").lower() in contracts or (
                    (t.get("from") or "").lower() in contracts
                ):
                    out.add(t["hash"])
        return out

    want_b, want_a = expected("b"), expected("a")
    chain.branch = "b"
    assert got == want_b and got, "matured blocks must hold canonical content"
    assert not (got & (want_a - want_b)), "no orphaned branch-a txs indexed"
