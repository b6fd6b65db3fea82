"""Engine configuration: the reference's options surface, typed.

Mirrors /root/reference/config_parser.py:20-105 — a settings JSON (the
settings-*.json shape) resolved with the same precedence:

  defaults  <  settings file (or dict)  <  environment variables

Env overrides honored exactly as the reference does: APP_CONFIG (whole
config as JSON), APP_CONNECTION_NETWORK, APP_CONFIG_NETWORK; the Mongo
URI/DB overrides (APP_MONGO_URI / APP_MONGO_DB, config_parser.py:99-105)
map onto the serving-sink options. Spark replaces the reference's pebble
scheduler, so task `interval`s become streaming trigger cadences
(tasks.py:210-350 -> QueryManager) and the scan knobs feed ScanRange
(scan_raw_txs.py:74-98).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

# defaults = the reference's tightest production envelope
# (settings/settings-moc-mainnet2.json:8-16,19-24)
DEFAULT_TASK_INTERVALS = {
    "scan_moc_blocks": 3,
    "scan_moc_events": 4,
    "scan_moc_prices": 10,
    "scan_moc_state": 10,
    "scan_moc_status": 10,
    "scan_moc_state_status": 10,
    "scan_user_state_update": 10,
    "scan_moc_blocks_not_processed": 60,
    "reconnect_on_lost_chain": 180,
}


@dataclass
class IndexerConfig:
    connection_network: str = "rskTestnetPublic"
    config_network: str = "mocTestnetAlpha"
    task_intervals: dict = field(
        default_factory=lambda: dict(DEFAULT_TASK_INTERVALS)
    )
    # scan_moc_blocks knobs (settings-moc-mainnet2.json:19-24)
    confirm_blocks: int = 10
    # cold-start look-behind; the reference configures 1 for the raw-block
    # task and 60 for price snapshots — the engine defaults to the wider
    # window (ScanRange's historical default) and lets settings narrow it
    blocks_look_behind: int = 60
    seconds_not_in_chain_error: int = 600
    blocks_recession: int = 1
    from_block: int = 0  # forced-replay range ("for testing only",
    to_block: int = 0    # scan_raw_txs.py:94-98)
    prices_look_behind: int = 60  # scan_moc_prices.blocks_look_behind
    contract_addresses: dict = field(default_factory=dict)
    app_mode: str = "MoC"
    mongo_uri: str | None = None
    mongo_db: str | None = None
    debug: bool = False

    def trigger(self, task: str) -> str:
        """Streaming trigger string for a reference task name."""
        return f"{self.task_intervals[task]} seconds"


def load_config(
    settings: str | dict | None = None,
    connection_network: str | None = None,
    config_network: str | None = None,
    env: dict | None = None,
) -> IndexerConfig:
    """Resolve an IndexerConfig with the reference's precedence.

    `settings` is a path to a settings-*.json, an already-parsed dict, or
    None (defaults only). Env overrides (APP_CONFIG / APP_CONNECTION_NETWORK
    / APP_CONFIG_NETWORK / APP_MONGO_URI / APP_MONGO_DB) beat everything,
    exactly like config_parser.py:48-105.
    """
    env = os.environ if env is None else env

    if "APP_CONFIG" in env:
        raw = json.loads(env["APP_CONFIG"])
    elif isinstance(settings, dict):
        raw = settings
    elif isinstance(settings, str):
        with open(settings) as f:
            raw = json.load(f)
    else:
        raw = {}

    cfg = IndexerConfig()
    if connection_network:
        cfg.connection_network = connection_network
    if config_network:
        cfg.config_network = config_network

    for task, opts in raw.get("tasks", {}).items():
        if "interval" in opts:
            cfg.task_intervals[task] = int(opts["interval"])
    blocks = raw.get("scan_moc_blocks", {})
    for k in (
        "confirm_blocks",
        "blocks_look_behind",
        "seconds_not_in_chain_error",
        "blocks_recession",
        "from_block",
        "to_block",
    ):
        if k in blocks:
            setattr(cfg, k, int(blocks[k]))
    if "blocks_look_behind" in raw.get("scan_moc_prices", {}):
        cfg.prices_look_behind = int(raw["scan_moc_prices"]["blocks_look_behind"])
    cfg.debug = bool(raw.get("debug", cfg.debug))

    mongo = raw.get("mongo", {})
    cfg.mongo_uri = mongo.get("uri", cfg.mongo_uri)
    cfg.mongo_db = mongo.get("db", cfg.mongo_db)

    # network-scoped contract addresses (tasks.py:91-208 resolves these
    # on-chain; here they come from config, keyed by config_network)
    networks = raw.get("networks", {})
    net = networks.get(cfg.config_network) or networks.get(
        env.get("APP_CONFIG_NETWORK", ""), {}
    )
    if net:
        cfg.app_mode = net.get("app_mode", cfg.app_mode)
        cfg.contract_addresses = {
            name: addr.lower() for name, addr in net.get("addresses", {}).items()
        }

    # env beats file (config_parser.py:69-105)
    if "APP_CONNECTION_NETWORK" in env:
        cfg.connection_network = env["APP_CONNECTION_NETWORK"]
    if "APP_CONFIG_NETWORK" in env:
        cfg.config_network = env["APP_CONFIG_NETWORK"]
        if networks and cfg.config_network not in networks:
            # the reference resolves addresses from config[network] and
            # KeyErrors on an unknown name; silently keeping the PREVIOUS
            # network's contract addresses would route events against the
            # wrong chain while reporting the new network name
            raise KeyError(
                f"APP_CONFIG_NETWORK={cfg.config_network!r} not in the "
                f"settings file's networks ({sorted(networks)})"
            )
        net = networks.get(cfg.config_network)
        if net:
            cfg.app_mode = net.get("app_mode", cfg.app_mode)
            cfg.contract_addresses = {
                n: a.lower() for n, a in net.get("addresses", {}).items()
            }
    if "APP_MONGO_URI" in env:
        cfg.mongo_uri = env["APP_MONGO_URI"]
    if "APP_MONGO_DB" in env:
        cfg.mongo_db = env["APP_MONGO_DB"]
    return cfg
