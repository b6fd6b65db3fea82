#!/usr/bin/env python
"""Headline-query benchmark.

Runs every registry entry marked bench=True against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes end-to-end into a noop sink (full computation, no
driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moc_indexer_spark.plans.registry import registry  # noqa: E402
from moc_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # no console progress bar: its \r-separated stage spam lands on the
    # same captured stdout tail as the final metric line and eats into the
    # driver's ~2 KB window (the round-5 line is 1.6 KB with the config +
    # ingest blocks — the junk margin matters now)
    spark = get_spark(
        app_name="moc-indexer-spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Engine-managed layout: the driver's parquet has ONE row group per
    # file, so scans can't parallelize on it regardless of cores. Mirror
    # once into a multi-file layout (the local analog of ingest-time file
    # sizing); built during the untimed warmup below.
    from moc_indexer_spark.tables import TABLE_NAMES, enable_layout_mirror, table

    enable_layout_mirror()

    # warmup: JVM/codegen spin-up + parquet footer reads, so per-query
    # numbers reflect steady-state execution, not first-query session cost.
    # Its wall time is recorded in the config block as a BOX-SPEED PROBE:
    # the same fixed work every round, so a loaded/hot driver box is
    # identifiable from the artifact alone (the round-7 official sample
    # read +21% vs three idle-box runs of the same tree — see BENCH.md's
    # adjudication rule; this field is what makes that call cheap).
    t_warm = time.perf_counter()
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).count()
    warmup_sec = round(time.perf_counter() - t_warm, 3)

    specs = [s for s in registry() if s.bench]
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for spec in specs:
        # one failed query must not lose the whole bench artifact — record
        # the failure and keep timing the rest
        try:
            df = spec.build(spark, sf_dir)  # build once to amortize analysis
            # one untimed warm run per query (codegen compile, python-worker
            # fork, broadcast build), then MEDIAN of n timed steady-state
            # runs — the round-2 bench took one sample per query and showed
            # a broad unexplained ~1.3x drift on untouched plans; the
            # median with recorded spread separates plan regressions from
            # single-sample box noise
            df.write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(max(1, n_runs)):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            runs.sort()
            timings[spec.name] = runs[len(runs) // 2]
            spreads[spec.name] = [runs[0], runs[-1]]
        except Exception as e:  # noqa: BLE001
            errors[spec.name] = str(e).splitlines()[0][:200]
        finally:
            # operators that build an index/state relation persist() it for
            # their own multi-consumer plans; dropping those entries between
            # queries keeps one query's working set from bleeding GC/memory
            # pressure into every later timing (a bench-session concern only
            # — in production each pipeline owns its session)
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Session config INSIDE the artifact: the round-4 1 g -> 8 g heap
    # change shifted every query ~1.56x uniformly, and the artifact alone
    # couldn't distinguish that config shift from a plan regression. Record
    # the knobs that move numbers so future diffs are self-explanatory.
    config = {
        "driver_mem": spark.conf.get("spark.driver.memory", "default-1g"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark_version": spark.version,
        # resolve unset AND the explicit "*" (session.py's local[*] form)
        # to the actual core count: the field exists to make runs from
        # different boxes comparable on their face
        "cpus": (
            str(os.cpu_count())
            if os.environ.get("SPARK_GRAFT_CPUS") in (None, "", "*")
            else os.environ["SPARK_GRAFT_CPUS"]
        ),
        # fixed-work box-speed probe (see the warmup comment): compare
        # across rounds before comparing query times — a high value says
        # the box was hot, not that a plan regressed
        "warmup_sec": warmup_sec,
    }
    # Ingest-path numbers in the same per-round artifact (round-4 verdict:
    # the MoR cycle's 3 s-tick headroom had no recorded trend). Opt-out via
    # env for quick local loops; errors must not lose the query artifact.
    ingest: dict | None = None
    if os.environ.get("SPARK_GRAFT_BENCH_INGEST", "1") != "0":
        try:
            from bench_ingest import measure as measure_ingest

            ingest = measure_ingest(spark)
            ingest.pop("metric", None)
        except Exception as e:  # noqa: BLE001
            ingest = {"error": str(e).splitlines()[0][:200]}
    # Compact metric line ONLY — the round-3 artifact was lost because the
    # full payload (46-query spread_min_max) outgrew the driver's ~2 KB
    # stdout tail capture and left BENCH_r03.json with parsed:null. The
    # per-query spreads and error details now go to a side file; the final
    # stdout line stays small and parseable.
    # per-query stability, compacted to two numbers so it fits the ~2 KB
    # stdout line (full spreads stay in BENCH_DETAIL.json): the max/median
    # ratio per query, aggregated as p50 + worst with the worst query
    # named. A worst ratio near 1 certifies every median as steady-state;
    # a high one names the query whose tail needs the side file.
    ratios = {
        n: (spreads[n][1] / timings[n]) if timings[n] > 0 else 1.0
        for n in timings if n in spreads
    }
    jitter = None
    if ratios:
        rs = sorted(ratios.values())
        worst = max(ratios, key=ratios.get)
        jitter = {
            "p50": round(rs[len(rs) // 2], 3),
            "max": round(ratios[worst], 3),
            "max_query": worst,
        }
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "config": config,
    }
    if jitter is not None:
        payload["jitter"] = jitter
    if ingest is not None:
        payload["ingest"] = ingest
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "config": config,
        "ingest": ingest,
        "runs_per_query": max(1, n_runs),
        "spread_min_max": spreads,
    }
    if errors:
        detail["errors"] = errors
        payload["error_count"] = len(errors)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=2)
    spark.stop()
    # printed after spark.stop() so no late JVM log line can land after it
    print(json.dumps(payload))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
