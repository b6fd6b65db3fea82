"""Shared in-process JSON-RPC server for RpcChain conformance tests,
with a thread-safe controllable fault schedule (HTTP 500s, read
timeouts, JSON-RPC error objects per block, null receipts, a tip that
moves between calls) — the live-HTTP harness for the fault-mode suite
(tests/test_rpc_faults.py) and reusable by the parity suite."""

from __future__ import annotations

import datetime as dt
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from moc_indexer_spark.sources.chain import FakeChain


def wire_block(fake: FakeChain, n: int) -> tuple[dict, dict]:
    """Encode one FakeChain block into eth_getBlockByNumber /
    eth_getTransactionReceipt wire shapes (same encoding as the parity
    suite in test_rpc_chain.py)."""
    txs, receipts = [], {}
    for tx in fake(n):
        txs.append({
            "hash": tx["hash"],
            "blockNumber": hex(tx["blockNumber"]),
            "from": tx["from"],
            "to": tx["to"],
            "value": hex(int(tx["value"])),
            "gas": hex(tx["gas"]),
            "gasPrice": hex(int(tx["gasPrice"])),
            "input": "0x",
        })
        receipts[tx["hash"]] = {
            "status": "0x1" if tx["status"] == "confirmed" else "0x0",
            "gasUsed": hex(tx["gas_used"]),
            "logs": [
                {"address": lg["address"], "logIndex": hex(lg["logIndex"]),
                 "topics": ["0x" + "ab" * 32], "data": "0x00"}
                for lg in tx["logs"]
            ],
        }
    # block timestamp derived from the chain's block-time function, not
    # the loop variable — an empty block must serve, not NameError
    ts = int(
        (dt.datetime(2024, 1, 1) + dt.timedelta(seconds=30 * n))
        .replace(tzinfo=dt.timezone.utc).timestamp()
    )
    block = {"number": hex(n), "timestamp": hex(ts), "transactions": txs}
    return block, receipts


class FaultState:
    """Mutable fault schedule, shared between a test and the server
    threads. All fields are read/written under `lock`."""

    def __init__(self, tip: int = 30):
        self.lock = threading.Lock()
        self.fail_http_next = 0       # respond HTTP 500 to the next N requests
        self.sleep_once = 0.0         # hold the next request this long (once)
        self.rpc_error_blocks = set() # getBlockByNumber(n) -> JSON-RPC error
        self.null_receipts = set()    # tx hash -> result: null
        self.tip = tip
        self.tip_step = 0             # tip += step per eth_blockNumber call
        self.requests = 0


def make_rpc_server(contracts, users, tip: int = 30):
    """Start a ThreadingHTTPServer serving the eth_* surface off a
    FakeChain, governed by a FaultState. Returns (url, state, shutdown)."""
    state = FaultState(tip=tip)
    fake = FakeChain(contracts, users)
    # receipt lookup table built lazily per block, cached (thread-safe via
    # the GIL on dict ops; values are deterministic so double-compute is fine)
    receipt_cache: dict[str, dict] = {}

    def receipts_for(h: str, max_block: int):
        if h not in receipt_cache:
            for n in range(max_block + 1):
                _, receipts = wire_block(fake, n)
                receipt_cache.update(receipts)
                if h in receipt_cache:
                    break
        return receipt_cache.get(h)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            with state.lock:
                state.requests += 1
                hold, state.sleep_once = state.sleep_once, 0.0
                fail = state.fail_http_next > 0
                if fail:
                    state.fail_http_next -= 1
            if hold:
                time.sleep(hold)
            if fail:
                self.send_response(500)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            req = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            method, params = req["method"], req["params"]
            result, error = None, None
            if method == "eth_blockNumber":
                with state.lock:
                    state.tip += state.tip_step
                    result = hex(state.tip)
            elif method == "eth_getBlockByNumber":
                n = int(params[0], 16)
                with state.lock:
                    bad = n in state.rpc_error_blocks
                if bad:
                    error = {"code": -32000, "message": f"block {n} pruned"}
                else:
                    result, _ = wire_block(fake, n)
            elif method == "eth_getTransactionReceipt":
                h = params[0]
                with state.lock:
                    dropped = h in state.null_receipts
                    max_block = state.tip
                result = None if dropped else receipts_for(h, max_block)
            else:
                error = {"code": -32601, "message": f"unknown {method}"}
            body = json.dumps(
                {"jsonrpc": "2.0", "id": req["id"], "result": result,
                 "error": error}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    return url, state, srv.shutdown
