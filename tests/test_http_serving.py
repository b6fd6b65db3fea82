"""The HTTP serving shell drives the same DataFrame templates the driver's
oracle gate checks; here each route is exercised end-to-end over real HTTP
(ephemeral port) and cross-checked against a direct operator call."""

import json
import urllib.request

import pytest

from moc_indexer_spark.serving_http import ApiServer


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    srv = ApiServer(spark, sf_dir)
    port = srv.start(0)
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _get(base, path, expect=200):
    try:
        with urllib.request.urlopen(base + path, timeout=120) as r:
            assert r.status == expect
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, f"{path}: {e.code} body={e.read()[:300]}"
        return json.loads(e.read() or b"{}")


def test_ping_and_infoapi(server):
    assert _get(server, "/ping") == {"status": "ok"}
    info = _get(server, "/infoapi")
    by_name = {c["collection"]: c["n"] for c in info["collections"]}
    assert set(by_name) == {"transactions", "customer", "orders", "documents"}
    assert all(n > 0 for n in by_name.values())


def test_tx_list_matches_direct_operator(spark, sf_dir, server):
    from moc_indexer_spark.operators.serving import api_tx_list
    from moc_indexer_spark.plans.registry import EXCLUDED_EVENTS, TX_USER
    from moc_indexer_spark.tables import transactions

    got = _get(server, f"/transactions/list?address={TX_USER}&limit=5")
    assert got["limit"] == 5 and len(got["transactions"]) == 5
    direct = api_tx_list(
        transactions(spark, sf_dir), TX_USER, EXCLUDED_EVENTS, 0, 5
    ).collect()
    assert [r["tx_hash"] for r in got["transactions"]] == [
        r.tx_hash for r in direct
    ]
    # edge formatting (F12) present
    assert all("T" in r["created_at_iso"] for r in got["transactions"])


def test_tx_last_and_price_var(server):
    from moc_indexer_spark.plans.registry import TX_USER

    last = _get(server, f"/transactions/last?address={TX_USER}")["transaction"]
    assert last is not None and last["address"] == TX_USER
    var = _get(server, "/prices/var")
    assert var["hours"] == 24
    assert var["price_variation"] is not None
    assert "variation" in var["price_variation"]


def test_pegout_filters_by_address(spark, sf_dir, server):
    from moc_indexer_spark.plans.registry import TX_USER

    got = _get(server, f"/fastbtc/pegout?address={TX_USER}")["pegouts"]
    assert got, "expected pegouts for the fixture user"
    assert all(p["rsk_address"] == str(TX_USER) for p in got)
    assert all(
        p["status_name"] in
        {"NOT_STARTED", "SENDING", "MINED", "REFUNDED", "RECLAIMED"}
        for p in got
    )
    # case-insensitive (P3): a checksummed mixed-case address matches
    # rows stored lowercase, same as the api_pegout_list operator
    upper = _get(server,
                 f"/fastbtc/pegout?address={str(TX_USER).upper()}")["pegouts"]
    assert upper == got


def test_errors_are_http_not_crashes(server):
    assert "error" in _get(server, "/nope", expect=404)
    assert "error" in _get(server, "/transactions/list", expect=400)
    # malformed (not just missing) params are client errors, not 500s
    assert "error" in _get(server, "/transactions/list?address=abc", expect=400)
    assert "error" in _get(
        server, "/transactions/last?address=1e3", expect=400
    )
    # negative paging clamps instead of crashing
    got = _get(server, "/transactions/list?address=7&limit=-5&skip=-1")
    assert got["transactions"] == [] and got["limit"] == 0
