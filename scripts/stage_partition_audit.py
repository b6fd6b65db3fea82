#!/usr/bin/env python
"""Runtime stage/task-count audit: for each named bench query, run it to
the noop sink under its own job group and report every stage's task
count from the status tracker. The static plan dumps cannot show AQE's
coalesced partition counts (AQEShuffleRead sizes are decided at run
time); the per-stage task counts ARE the final partition counts, so this
is the artifact that proves whether `coalescePartitions` fired — the
evidence VERDICT r10 item 7 asked for on the queries whose 8-core run
beat the 32-core run.

Usage: python scripts/stage_partition_audit.py name1,name2 [...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moc_indexer_spark.plans.registry import registry  # noqa: E402
from moc_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stage-audit",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from moc_indexer_spark.tables import TABLE_NAMES, enable_layout_mirror, table
    enable_layout_mirror()
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).count()
    specs = {s.name: s for s in registry()}
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for nm in names:
        df = specs[nm].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (index/cache)
        sc.setJobGroup(f"audit:{nm}", nm)
        df.write.format("noop").mode("overwrite").save()
        sc.setJobGroup(None, None)
        jobs = sorted(tracker.getJobIdsForGroup(f"audit:{nm}"))
        stages = []
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in sorted(ji.stageIds):
                si = tracker.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    stages.append({"stage": sid, "tasks": si.numTasks})
        out[nm] = {
            "jobs": len(jobs),
            "stages": stages,
            "final_stage_tasks": stages[-1]["tasks"] if stages else None,
        }
        spark.catalog.clearCache()
        print(json.dumps({nm: out[nm]}), flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
