"""Thin HTTP serving shell over the API query templates — the process
analog of the reference webservice (`/root/reference/webservice/app.py:30-43`
registering bp_main / bp_user_operations / bp_prices / bp_fastbtc_bridge).

Stdlib-only (http.server): the sandbox has no flask, and the point is the
ROUTE -> DataFrame-template mapping, not the web framework. Every endpoint
resolves to one of the serving operators (operators/serving.py) or registry
templates — the same plans the driver's oracle gate hash-checks — then
collects the bounded result (pages/top-1/one-row aggregates; nothing
unbounded is ever collected).

Routes (reference blueprint parity):
  GET /ping                       bp_main.py:19-22
  GET /infoapi                    bp_main.py:10-16   (per-collection counts)
  GET /transactions/list?address=&skip=&limit=   bp_user_operations.py:9-93
  GET /transactions/last?address=                bp_user_operations.py:96-133
  GET /prices/var                 bp_prices.py:9-60  (delta_price_hours)
  GET /fastbtc/pegout?address=    bp_fastbtc_bridge.py:9-40

Production shape: this same handler works unchanged against a remote
SparkSession (Spark Connect) or, better, against the pre-computed serving
tables the streaming sink maintains — the 100 TB pattern is "index big,
serve small": the API only ever scans partition-pruned, bucketed serving
tables, so request latency is independent of corpus size.
"""

from __future__ import annotations

import datetime as _dt
import json
import threading
from decimal import Decimal
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _jsonable(v):
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def df_to_payload(df: DataFrame, limit: int = 1000) -> list[dict]:
    """Bounded collect -> JSON-ready rows (F18 edge serialization)."""
    rows = df.limit(limit).collect()
    return [{k: _jsonable(v) for k, v in r.asDict().items()} for r in rows]


class ApiServer:
    """One SparkSession + sf_dir bound to the reference's route table."""

    def __init__(self, spark: SparkSession, sf_dir: str,
                 pagination: int = 20, delta_price_hours: int = 24):
        self.spark = spark
        self.sf_dir = sf_dir
        self.pagination = pagination
        self.delta_price_hours = delta_price_hours
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- endpoint handlers (each returns a JSON-able dict) ------------------

    def ping(self, params):
        return {"status": "ok"}

    def infoapi(self, params):
        from .plans.registry import registry

        spec = next(s for s in registry() if s.name == "api_db_info")
        return {"collections": df_to_payload(spec.build(self.spark, self.sf_dir))}

    def tx_list(self, params):
        from .operators.serving import api_tx_list
        from .plans.registry import EXCLUDED_EVENTS
        from .tables import transactions

        address = int(params["address"][0])
        skip = max(0, int(params.get("skip", ["0"])[0]))
        limit = min(
            max(0, int(params.get("limit", [str(self.pagination)])[0])), 500
        )
        t = transactions(self.spark, self.sf_dir)
        page = api_tx_list(t, address, EXCLUDED_EVENTS, skip, limit)
        rows = df_to_payload(page)
        # total like the reference (bp_user_operations.py:91 issues a
        # separate count_documents): computed independently of the page,
        # so an out-of-range skip still reports how many rows exist —
        # a paginate_with_total crossJoin would return neither rows nor
        # the total the client needs to render pagination
        f = t.filter(F.col("address") == address)
        if EXCLUDED_EVENTS:
            f = f.filter(~F.col("event").isin(*EXCLUDED_EVENTS))
        total = f.count()
        return {"transactions": rows, "count": len(rows),
                "total": total, "skip": skip, "limit": limit}

    def tx_last(self, params):
        from .operators.serving import api_tx_last
        from .tables import transactions

        address = int(params["address"][0])
        t = transactions(self.spark, self.sf_dir)
        rows = df_to_payload(api_tx_last(t, address))
        return {"transaction": rows[0] if rows else None}

    def price_var(self, params):
        from .operators.serving import api_price_variation
        from .tables import transactions

        prices = transactions(self.spark, self.sf_dir).filter(
            F.col("event") == "purchase"
        )
        rows = df_to_payload(api_price_variation(prices, self.delta_price_hours))
        return {"price_variation": rows[0] if rows else None,
                "hours": self.delta_price_hours}

    def pegout(self, params):
        from .plans.registry import registry

        # the fastbtc-shaped serving view (same as the oracle-gated query);
        # per-address filter applied on top
        address = params["address"][0]
        spec = next(s for s in registry() if s.name == "api_pegout_list")
        # case-insensitive like the operator it fronts (P3,
        # operators/serving.py api_pegout_list): a checksummed mixed-case
        # hex address must match rows stored lowercase
        df = spec.build(self.spark, self.sf_dir).filter(
            F.lower(F.col("rsk_address")) == address.lower()
        )
        return {"pegouts": df_to_payload(df)}

    ROUTES = {
        "/ping": ping,
        "/infoapi": infoapi,
        "/transactions/list": tx_list,
        "/transactions/last": tx_last,
        "/prices/var": price_var,
        "/fastbtc/pegout": pegout,
    }

    # -- server lifecycle ----------------------------------------------------

    def start(self, port: int = 0) -> int:
        """Start serving on `port` (0 = ephemeral); returns the bound port."""
        api = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API)
                parsed = urlparse(self.path)
                route = parsed.path.rstrip("/") or "/"
                fn = api.ROUTES.get(route)
                if fn is None:
                    self._send(404, {"error": f"no route {route}"})
                    return
                try:
                    payload = fn(api, parse_qs(parsed.query))
                    self._send(200, payload)
                except (KeyError, ValueError) as e:
                    # client errors (missing/malformed params) are 400s —
                    # monitoring must distinguish them from server faults
                    self._send(400, {"error": f"bad request: {e}"})
                except Exception as e:  # mirror app.py's 500 handler
                    self._send(500, {"error": str(e)[:500]})

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet test output
                pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


def main() -> None:  # pragma: no cover - manual entry point
    import argparse

    ap = argparse.ArgumentParser(description="moc_indexer_spark API webservice")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    spark = SparkSession.builder.master("local[4]").appName("moc-api").getOrCreate()
    srv = ApiServer(spark, args.sf_dir)
    port = srv.start(args.port)
    print(f"serving on http://127.0.0.1:{port}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
