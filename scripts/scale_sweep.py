#!/usr/bin/env python
"""Full-registry scale sweep: execute EVERY registered query end-to-end at
a bigger SF than the correctness gate runs (default sf0.1) and record
rows + wall time per query.

This is the OOM / ANSI-error catcher: correctness is proven at sf0.01 by
the DuckDB oracles; this sweep proves every plan also *executes* at 10x
that, where row-group parallelism, shuffle sizes, and data-dependent edge
values (zero lags, overflow-adjacent amounts) differ. Round-1 caught an
executor OOM and a DIVIDE_BY_ZERO this way.

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/scale_sweep.py [--mirror]
       [--oracle]
Writes one JSON line per query to stdout and a summary to stderr.

--oracle upgrades the sweep from execute-only to a full DuckDB
hash-compare at the sweep SF — scale-dependent divergences (double
summation order, overflow-adjacent values, ties that only appear in the
bigger data) surface here and nowhere else. Queries whose ORACLE is
brute-force pairwise (the near-dup family, all-pairs cosine) are
compared rows-only at this SF: DuckDB's side is O(n^2) by design there
— the Spark side still fully executes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moc_indexer_spark.plans.registry import registry  # noqa: E402
from moc_indexer_spark.session import get_spark  # noqa: E402

# oracles that brute-force all pairs in SQL — O(n^2) in DuckDB at the
# sweep SF (the SPARK side is the pruned plan and still executes)
PAIRWISE_ORACLES = {
    "ngram_dup_pairs", "ngram_dup_pairs_guarded", "ngram_dup_pairs_prefix",
    "minhash_dup_pairs", "embedding_dup_pairs", "dedup_clusters",
    "dedup_keeper_selection", "leakage_safe_splits",
    "cosine_topk", "lsh_ann_exact", "ivf_ann_exact", "pq_ann_exact",
    "ivfpq_ann_exact", "sq8_ann_topk", "typo_pairs", "shared_span_pairs",
    "containment_dup_pairs", "simhash_pairs_certified",
    "semantic_dedup_report", "benchmark_contamination",
    # dedup_report returned to full oracle coverage in round 9: its
    # oracle is now the inverted-index pair-count form (2.7 s at sf0.1
    # vs the old all-pairs CTE's ~17 min)
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    if "--mirror" in sys.argv:
        from moc_indexer_spark.tables import enable_layout_mirror

        enable_layout_mirror()
    oracle_mode = "--oracle" in sys.argv
    if oracle_mode:
        from moc_indexer_spark.testing import compare, run_oracle
    failures = []
    total = 0.0
    for spec in registry():
        t0 = time.perf_counter()
        try:
            df = spec.build(spark, sf_dir)
            if oracle_mode and spec.oracle and spec.name not in PAIRWISE_ORACLES:
                ok, msg = compare(df, run_oracle(spec.oracle, sf_dir))
                dt = time.perf_counter() - t0
                total += dt
                if not ok:
                    failures.append(spec.name)
                print(json.dumps({"q": spec.name, "sec": round(dt, 2),
                                  "oracle": "PASS" if ok else f"FAIL {msg}"}),
                      flush=True)
                continue
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            total += dt
            print(json.dumps({"q": spec.name, "sec": round(dt, 2)}), flush=True)
        except Exception as e:
            failures.append(spec.name)
            print(
                json.dumps({"q": spec.name, "error": str(e)[:300]}), flush=True
            )
        finally:
            # same cache hygiene as bench.py: index-building operators
            # persist() for their own plans — drop those entries so one
            # query's working set doesn't pressure every later one
            spark.catalog.clearCache()
    print(
        f"swept {len(registry())} queries at {sf_dir}: "
        f"{len(failures)} failures {failures}, total {total:.1f}s",
        file=sys.stderr,
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
