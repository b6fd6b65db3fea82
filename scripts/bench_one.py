#!/usr/bin/env python
"""Focused per-query bench: same methodology as bench.py (noop sink, one
untimed warm run, median of N timed runs) but for a subset of queries, with
more samples. Usage: python scripts/bench_one.py name1,name2 [runs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moc_indexer_spark.plans.registry import registry  # noqa: E402
from moc_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-one",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from moc_indexer_spark.tables import TABLE_NAMES, enable_layout_mirror, table
    enable_layout_mirror()
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).count()
    specs = {s.name: s for s in registry()}
    out = {}
    for nm in names:
        spec = specs[nm]
        df = spec.build(spark, sf_dir)
        spark.sparkContext.setJobDescription(f"bench-one:{nm}")
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        runs.sort()
        out[nm] = {"median": runs[len(runs) // 2], "runs": runs}
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
