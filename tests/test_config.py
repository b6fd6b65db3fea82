"""Config resolution parity with the reference's precedence
(/root/reference/config_parser.py:20-105): defaults < file < env."""

import json

from moc_indexer_spark.config import DEFAULT_TASK_INTERVALS, load_config

SETTINGS = {
    "mongo": {"uri": "mongodb://h:27017/", "db": "doc_mainnet"},
    "debug": False,
    "tasks": {
        "scan_moc_blocks": {"interval": 5},
        "scan_moc_events": {"interval": 7},
    },
    "scan_moc_blocks": {
        "confirm_blocks": 12,
        "blocks_recession": 2,
        "seconds_not_in_chain_error": 300,
        "from_block": 100,
        "to_block": 200,
    },
    "scan_moc_prices": {"blocks_look_behind": 30},
    "networks": {
        "mocMainnet2": {
            "app_mode": "MoC",
            "addresses": {
                "MoC": "0xF773B590aF754D597770937Fa8ea7AbDf2668370",
                "Multicall2": "0x8f344c3b2a02a801c24635f594c5652c8a2eb02a",
            },
        }
    },
}


def test_defaults_match_reference_envelope():
    cfg = load_config(env={})
    assert cfg.task_intervals == DEFAULT_TASK_INTERVALS
    assert cfg.confirm_blocks == 10
    assert cfg.seconds_not_in_chain_error == 600
    assert cfg.trigger("scan_moc_blocks") == "3 seconds"


def test_file_overrides_defaults(tmp_path):
    p = tmp_path / "settings.json"
    p.write_text(json.dumps(SETTINGS))
    cfg = load_config(str(p), config_network="mocMainnet2", env={})
    assert cfg.task_intervals["scan_moc_blocks"] == 5
    assert cfg.task_intervals["scan_moc_events"] == 7
    # untouched tasks keep defaults
    assert cfg.task_intervals["scan_moc_prices"] == 10
    assert cfg.confirm_blocks == 12 and cfg.blocks_recession == 2
    assert (cfg.from_block, cfg.to_block) == (100, 200)
    assert cfg.prices_look_behind == 30
    assert cfg.mongo_uri == "mongodb://h:27017/"
    # addresses normalized lowercase (chain.py:26-30 discipline)
    assert cfg.contract_addresses["MoC"].startswith("0xf773b590")


def test_env_beats_file():
    env = {
        "APP_CONFIG": json.dumps(SETTINGS),
        "APP_CONFIG_NETWORK": "mocMainnet2",
        "APP_CONNECTION_NETWORK": "rskMainnetNode",
        "APP_MONGO_URI": "mongodb://envhost:27017/",
        "APP_MONGO_DB": "env_db",
    }
    cfg = load_config({"tasks": {"scan_moc_blocks": {"interval": 99}}}, env=env)
    # APP_CONFIG replaced the whole settings dict (config_parser.py:48-49)
    assert cfg.task_intervals["scan_moc_blocks"] == 5
    assert cfg.connection_network == "rskMainnetNode"
    assert cfg.config_network == "mocMainnet2"
    assert cfg.contract_addresses  # resolved via APP_CONFIG_NETWORK
    assert cfg.mongo_uri == "mongodb://envhost:27017/"
    assert cfg.mongo_db == "env_db"


def test_forced_replay_range_drives_scan(spark, tmp_path):
    """from_block/to_block (scan_raw_txs.py:94-98) overrides the cursor."""
    from moc_indexer_spark.app import CONTRACTS, USERS, Indexer
    from moc_indexer_spark.config import IndexerConfig
    from moc_indexer_spark.sources.chain import FakeChain

    cfg = IndexerConfig(from_block=10, to_block=30, blocks_recession=1)
    chain = FakeChain(CONTRACTS, USERS)
    idx = Indexer(spark, str(tmp_path), chain, CONTRACTS, config=cfg)
    idx.run_incremental(tip=100)
    raw = idx.tables["raw_transactions"].read()
    got = {r.blockNumber for r in raw.select("blockNumber").distinct().collect()}
    contracts = {c.lower() for c in CONTRACTS}
    want = {
        bn
        for bn in range(10, 31)
        if any(
            (t.get("to") or "").lower() in contracts
            or (t.get("from") or "").lower() in contracts
            for t in chain(bn)
        )
    }
    assert got == want and got  # exactly the replay range, nothing else


def test_config_supplies_contracts(spark, tmp_path):
    from moc_indexer_spark.app import Indexer
    from moc_indexer_spark.config import load_config
    from moc_indexer_spark.sources.chain import FakeChain

    cfg = load_config(SETTINGS, config_network="mocMainnet2", env={})
    idx = Indexer(spark, str(tmp_path),
                  FakeChain(list(cfg.contract_addresses.values()), ["0x" + "1" * 40]),
                  config=cfg)
    assert idx.contracts == list(cfg.contract_addresses.values())


def test_forced_replay_one_sided_ranges(spark, tmp_path):
    """One-sided forced ranges: from_block alone replays up to the LIVE
    tip (to_block=0 used to freeze the window empty forever); to_block
    alone replays from GENESIS (the cold-start heuristic used to skip
    everything before to_block-60)."""
    from moc_indexer_spark.app import CONTRACTS, USERS, Indexer
    from moc_indexer_spark.config import IndexerConfig
    from moc_indexer_spark.sources.chain import FakeChain

    chain = FakeChain(CONTRACTS, USERS)

    # from_block only: [from_block, tip - recession]
    cfg = IndexerConfig(from_block=90, to_block=0, blocks_recession=1)
    idx = Indexer(spark, str(tmp_path / "f"), chain, CONTRACTS, config=cfg)
    idx.run_incremental(tip=100)
    got = {r.blockNumber for r in
           idx.tables["raw_transactions"].read().select("blockNumber").collect()}
    assert got and min(got) >= 90 and max(got) == 99

    # to_block only: [0, to_block] — genesis, not to_block-60
    cfg = IndexerConfig(from_block=0, to_block=100, blocks_recession=1)
    idx = Indexer(spark, str(tmp_path / "t"), chain, CONTRACTS, config=cfg)
    idx.run_incremental(tip=100)
    got = {r.blockNumber for r in
           idx.tables["raw_transactions"].read().select("blockNumber").collect()}
    assert min(got) < 40 and max(got) == 100  # genesis blocks included


def test_quiet_scan_advances_cursor(spark, tmp_path):
    """A scan window with zero matching txs must still advance the
    checkpoint cursor — a quiet contract otherwise re-fetches an
    ever-growing window (every block since the last matching tx) each
    tick."""
    from moc_indexer_spark.app import USERS, Indexer
    from moc_indexer_spark.sources.chain import FakeChain

    watched = ["0x" + "99" * 20]           # nothing on-chain matches this
    chain = FakeChain(["0x" + "ab" * 20], USERS)
    idx = Indexer(spark, str(tmp_path), chain, watched)
    out = idx.run_incremental(tip=50)
    assert idx.last_indexed == 50 - idx.config.blocks_recession
    assert out == {"last_indexed": idx.last_indexed}
    # second tick scans only the new blocks, not the whole history again
    idx.run_incremental(tip=60)
    assert idx.last_indexed == 60 - idx.config.blocks_recession


def test_min_confirmations_beyond_recession_is_loud(spark):
    """min_confirmations > blocks_recession would silently drop the
    window's youngest txs forever (the cursor advances past them); the
    scan refuses instead."""
    import pytest as _pytest

    from moc_indexer_spark.app import CONTRACTS, USERS
    from moc_indexer_spark.sources.chain import FakeChain, ScanRange, scan_blocks

    with _pytest.raises(ValueError, match="min_confirmations"):
        scan_blocks(
            spark, FakeChain(CONTRACTS, USERS),
            ScanRange(last_indexed=0, tip=50, blocks_recession=2),
            set(CONTRACTS), min_confirmations=5,
        )
