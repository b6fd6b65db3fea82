#!/usr/bin/env python
"""Oracle-verify a subset of registry queries at one SF.

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/verify_some.py name1,name2
Runs each named query in Spark and its DuckDB oracle over the same parquet
dir and prints PASS/FAIL per query (testing.compare — at least as strict
as the driver's value hash). Queries with no SQL oracle execute to a noop
sink and report rows-only. Exit 1 on any FAIL.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moc_indexer_spark.plans.registry import registry  # noqa: E402
from moc_indexer_spark.session import get_spark  # noqa: E402
from moc_indexer_spark.testing import compare, run_oracle  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="verify-some",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in registry()}
    failures = []
    for nm in names:
        spec = specs[nm]
        df = spec.build(spark, sf_dir)
        if spec.oracle:
            ok, msg = compare(df, run_oracle(spec.oracle, sf_dir))
            if not ok:
                failures.append(nm)
            print(json.dumps({"q": nm, "sf_dir": sf_dir,
                              "oracle": "PASS" if ok else f"FAIL {msg}"}),
                  flush=True)
        else:
            n = df.count()
            print(json.dumps({"q": nm, "sf_dir": sf_dir,
                              "rows_only": n}), flush=True)
        spark.catalog.clearCache()
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
