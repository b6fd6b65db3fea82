#!/usr/bin/env python
"""Long-horizon soak of the COMPOSED streaming curation funnel — the
round-10 deliverable closing the gap the round-9 verdict named: each
maintainer has a 40-cycle policy long-run with envelope framing, but the
funnel (the composition a real user operates) had only single-tick axis
points and per-test publishes.

Arms over a few hundred ticks on a growing corpus (the maintainers'
_longrun_arms framing, scale_curve_stream.py; select with --arms):

* policy_on  — compact_every=16 (every maintainer's in-tick minor-fold
  policy armed) + a `publish()` MAJOR every --publish-every ticks, the
  operating posture: publish cuts the release artifact AND re-bases the
  minors. Publish wall time is recorded SEPARATELY per cut with the new
  per-phase `timings` attribution (which tier dominates a release cut),
  never folded into tick latency.
* policy_off — no policy, no majors: pure accretion, the arm a daemon
  that never maintains rides.
* policy_on_deferral (--arms deferral) — ON + the off-tick deferral
  budget (FUNNEL_FOLD_BUDGET): the arm where the budget actually
  fires — composed-funnel ticks exceed 10 s, unlike the maintainer
  long-runs whose ticks never reach their 2.6 s budget.

Reported per arm: tick p50/p90/max, first/last-30 medians (accretion
slope), compaction_cycles (ticks that absorbed any minor fold/merge —
instrumented via the maintainers' fold-return observability),
envelope_violations vs the reference's 3 s tightest tick AND vs the
15 s arrival-cadence envelope a composed funnel actually runs under
(its tick floor is ~7 s of multi-tier fixed overhead at ANY corpus
size — see funnel_tick_vs_corpus_size: 7.2 s at 5k docs), and
fold_overhead_p50 (median fold-tick minus median clean-tick latency).

Corpus profile: the shared token-shuffled sf0.1 resample generator
(dup_frac 2%) + id-mapped embedding sidecar — identical to the
funnel_500k_point methodology, so the soak's numbers compose with the
axis points. Results merge into SCALE_CURVE.json
stream_results.funnel_policy_longrun (setdefault+update — never
clobbering sibling rows, the ADVICE-r8 rule).

Measurement hygiene: run ALONE on the box (see BENCH.md) — concurrent
JVMs corrupt medians and arm comparisons.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from _curve_util import gen_shuffled_chunk, write_id_mapped_sidecar  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SCHEMA = "doc_id long, text string, lang string, source string"
TICK = 250
PRELOAD_BATCH = 2_500
COMPACT_EVERY = 16
DUP_FRAC = 0.02
RESERVOIR = 1_000
ENVELOPE_TIGHT = 3.0   # the reference's tightest tick (maintainer SLA)
ENVELOPE_FUNNEL = 15.0  # composed-funnel arrival cadence
# funnel deferral budget: the composed tick medians ~8 s and its minor
# folds cost up to ~3 s at the tail — a fold may run only when the tick
# has that much headroom under the 15 s arrival envelope. Unlike the
# maintainer long-runs (ticks never reach 2.6 s, deferral proven
# non-intrusive), funnel ticks DO exceed 10 s, so this arm exercises
# the deferral in anger: deferred_folds > 0 expected, max bounded.
FUNNEL_FOLD_BUDGET = 10.0


def _quant(xs, q):
    s = sorted(xs)
    return round(s[min(len(s) - 1, int(len(s) * q))], 3)


def run_arm(spark, base_rows, emb, label, preload, cycles,
            publish_every, compact_every, fold_budget_sec=None):
    import numpy as np

    from moc_indexer_spark.streaming.funnel import StreamingCurationFunnel

    rng = np.random.default_rng(71)
    reservoir: list = []
    d = tempfile.mkdtemp(prefix=f"funnel_lr_{label}_")
    side = os.path.join(d, "emb")
    write_id_mapped_sidecar(
        spark, emb, preload + (cycles + 4) * TICK, side
    )
    funnel = StreamingCurationFunnel(
        spark, os.path.join(d, "state"),
        embeddings_path=side, expected_corpus_rows=preload,
        compact_every=compact_every,
        fold_budget_sec=fold_budget_sec,
    )

    # fold observability: the maintainers return what they folded; wrap
    # to attribute fold ticks without touching latency semantics
    events: list[tuple[int, str]] = []
    cyc = {"i": -1}

    def wrap(obj, attr, tag):
        orig = getattr(obj, attr)

        def w(*a, **k):
            r = orig(*a, **k)
            if r:
                events.append((cyc["i"], tag))
            return r

        setattr(obj, attr, w)

    wrap(funnel.near, "_maybe_compact_one", "near")
    if funnel.sem is not None:
        wrap(funnel.sem, "_maybe_compact_one", "sem")
    wrap(funnel, "_maybe_merge_one", "tbl")

    t0 = time.perf_counter()
    done, bid = 0, 0
    while done < preload:
        m = min(PRELOAD_BATCH, preload - done)
        funnel.process_batch(
            spark.createDataFrame(
                gen_shuffled_chunk(rng, base_rows, done, m, reservoir,
                                   dup_frac=DUP_FRAC,
                                   reservoir_cap=RESERVOIR),
                SCHEMA,
            ),
            bid,
        )
        done += m
        bid += 1
    preload_sec = round(time.perf_counter() - t0, 1)

    # measurement window starts here: preload-phase fold events carry
    # cyc=-1 (filtered below) and the deferral counters are SNAPSHOTTED
    # so the reported numbers cover only the measured cycles (review
    # finding: lifetime counters mixed preload into the attribution)
    deferred0 = funnel.near.deferred_folds + (
        funnel.sem.deferred_folds if funnel.sem else 0
    )
    lat: list[float] = []
    publishes: list[dict] = []
    for c in range(cycles):
        cyc["i"] = c
        batch = spark.createDataFrame(
            gen_shuffled_chunk(rng, base_rows, done, TICK, reservoir,
                               dup_frac=DUP_FRAC, reservoir_cap=RESERVOIR),
            SCHEMA,
        )
        t0 = time.perf_counter()
        funnel.process_batch(batch, bid)
        lat.append(time.perf_counter() - t0)
        done += TICK
        bid += 1
        if publish_every and (c + 1) % publish_every == 0:
            timings: dict = {}
            t0 = time.perf_counter()
            pub = funnel.publish(os.path.join(d, "out"), timings=timings)
            publishes.append({
                "at_cycle": c + 1,
                "corpus_docs": done,
                "publish_sec": round(time.perf_counter() - t0, 1),
                "phases": timings,
                "final_docs": pub["final_docs"],
            })
            print(json.dumps({f"{label}_publish": publishes[-1]}),
                  flush=True)
        if (c + 1) % 20 == 0:
            print(json.dumps({
                label: {"cycle": c + 1,
                        "median_so_far": _quant(lat, 0.5),
                        "last": round(lat[-1], 3)},
            }), flush=True)

    fold_cycles = sorted({c for c, _ in events if c >= 0})
    clean = [x for i, x in enumerate(lat) if i not in set(fold_cycles)]
    foldlat = [lat[i] for i in fold_cycles]
    row = {
        "cycles": cycles,
        "preload_docs": preload,
        "tick_docs": TICK,
        "median": _quant(lat, 0.5),
        "p90": _quant(lat, 0.9),
        "max": round(max(lat), 3),
        "first30_median": round(statistics.median(lat[:30]), 3),
        "last30_median": round(statistics.median(lat[-30:]), 3),
        "compaction_cycles": len(fold_cycles),
        "fold_events": {
            tag: sum(1 for c_, t in events if t == tag and c_ >= 0)
            for tag in ("near", "sem", "tbl")
        },
        "deferred_folds": (
            funnel.near.deferred_folds
            + (funnel.sem.deferred_folds if funnel.sem else 0)
            - deferred0
        ),
        "envelope_violations_3s": sum(1 for x in lat if x > ENVELOPE_TIGHT),
        "envelope_violations_15s": sum(
            1 for x in lat if x > ENVELOPE_FUNNEL
        ),
        "fold_overhead_p50": round(
            statistics.median(foldlat) - statistics.median(clean), 3
        ) if foldlat and clean else None,
        "fold_budget_sec": fold_budget_sec,
        "preload_sec": preload_sec,
        "publishes": publishes,
    }
    print(json.dumps({label: row}), flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preload", type=int, default=10_000)
    ap.add_argument("--cycles", type=int, default=120)
    ap.add_argument("--publish-every", type=int, default=30)
    ap.add_argument("--arms", default="on,off",
                    help="comma list: on,off,deferral (merged into the "
                         "existing funnel_policy_longrun row)")
    args = ap.parse_args()

    from moc_indexer_spark.session import get_spark, ship_package

    spark = get_spark(app_name="funnel-longrun")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    docs_src = spark.read.parquet(f"{SF01}/documents.parquet")
    base_rows = [
        (r.text.split(" "), r.lang, r.source)
        for r in docs_src.select("text", "lang", "source").collect()
    ]
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")

    arms = set(args.arms.split(","))
    out = {}
    if "on" in arms:
        out["policy_on"] = run_arm(
            spark, base_rows, emb, "policy_on", args.preload, args.cycles,
            args.publish_every, COMPACT_EVERY,
        )
    if "deferral" in arms:
        out["policy_on_deferral"] = run_arm(
            spark, base_rows, emb, "policy_on_deferral", args.preload,
            args.cycles, args.publish_every, COMPACT_EVERY,
            fold_budget_sec=FUNNEL_FOLD_BUDGET,
        )
    if "off" in arms:
        out["policy_off"] = run_arm(
            spark, base_rows, emb, "policy_off", args.preload, args.cycles,
            0, None,
        )
    out["note"] = (
        "composed-funnel soak, maintainers' framing: ON = ce=16 minors "
        "+ publish() majors every "
        f"{args.publish_every} ticks (publish timed separately, "
        "per-phase attribution in publishes[].phases); OFF = pure "
        "accretion; DEFERRAL (round 10) = ON + fold_budget_sec="
        f"{FUNNEL_FOLD_BUDGET} — a due minor fold skips when the tick "
        "already consumed the budget, so maintenance cannot stack on a "
        "slow tick (the maintainer runs never trip the budget; funnel "
        "ticks do). The funnel tick's ~7 s floor is multi-tier fixed "
        "overhead (present at 5k docs on an empty state — see "
        "funnel_tick_vs_corpus_size), so the 3 s maintainer envelope "
        "does not apply tick-wise; the adjudicating numbers are "
        "flatness (first30 vs last30), p90-p50 spread, 15 s-envelope "
        "violations, and publish cost stability across cuts"
    )

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE.json",
    )
    with open(out_path) as fh:
        doc = json.load(fh)
    doc.setdefault("stream_results", {}).setdefault(
        "funnel_policy_longrun", {}
    ).update(out)
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps({"funnel_policy_longrun": "written"}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
