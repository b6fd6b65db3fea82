#!/usr/bin/env python
"""Dump .explain("formatted") for every bench query to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/capture_plans.py <tag> <suffix> [only,names]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moc_indexer_spark.plans.registry import registry  # noqa: E402
from moc_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = get_spark(app_name="plan-capture",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    mode = None
    for s in registry():
        if not s.bench or (only is not None and s.name not in only):
            continue
        df = s.build(spark, sf)
        qe = df._jdf.queryExecution()
        if mode is None:
            jvm = df._sc._jvm
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = qe.explainString(mode)
        with open(os.path.join(outdir, f"{s.name}_{suffix}.txt"), "w") as f:
            f.write(plan.strip() + "\n")
        print("wrote", s.name)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
