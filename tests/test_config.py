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
