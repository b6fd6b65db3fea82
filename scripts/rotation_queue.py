"""Compute the age-based driver-window rotation queue from the committed
CORRECTNESS_r0N.json artifacts.

COVERAGE.md ("Driver-window rotation") documents the procedure; this
script IS the procedure, so the round-N window is a one-command regen
instead of a by-hand queue walk:

1. A query's last green driver round is the highest N whose
   CORRECTNESS_r0N.json holds a row with rows_match + schema_match true
   and no err. Never-certified queries sort as round 0 — which also
   gives newly oracle-gated queries (no row yet by construction) the
   head slots the procedure promises them.
2. Order ascending by that round, name ascending within a round.
   Deterministic and reproducible from the committed artifacts alone.
3. The window is the first 50 entries of the queue.

Usage:
    python scripts/rotation_queue.py            # print queue + window
    python scripts/rotation_queue.py --check    # exit 1 if the registry's
                                                # _DRIVER_WINDOW != computed
                                                # window (rotation pending)

`--check` is also run by tests/test_rotation_queue.py, so a round that
gains a CORRECTNESS artifact without rotating the registry window fails
the suite until the builder pastes the printed window in — the rotation
cannot silently go stale.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW_SIZE = 50


def correctness_artifacts(repo: str = REPO) -> dict[int, dict]:
    """{round: parsed artifact} for every CORRECTNESS_r*.json present."""
    out: dict[int, dict] = {}
    for fn in os.listdir(repo):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if m:
            with open(os.path.join(repo, fn)) as f:
                out[int(m.group(1))] = json.load(f)
    return out


def _green(row: dict) -> bool:
    return (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and not row.get("err")
    )


def last_green_rounds(repo: str = REPO) -> dict[str, int]:
    """query name -> highest round with a green driver row (0 if none)."""
    last: dict[str, int] = {}
    for rnd, rows in sorted(correctness_artifacts(repo).items()):
        for name, row in rows.items():
            if _green(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def rotation_queue(repo: str = REPO) -> list[tuple[str, int]]:
    """The full age queue over the oracle-gated registry:
    [(name, last_green_round)] oldest-first, names ascending per round."""
    from moc_indexer_spark.plans.registry import registry

    gated = [s.name for s in registry() if s.oracle]
    last = last_green_rounds(repo)
    return sorted(
        ((n, last.get(n, 0)) for n in gated), key=lambda p: (p[1], p[0])
    )


def computed_window(repo: str = REPO) -> list[str]:
    return [n for n, _ in rotation_queue(repo)[:WINDOW_SIZE]]


def check(repo: str = REPO) -> list[str]:
    """[] if the registry window matches the computed one, else a human
    diff (missing / extra names and the paste-ready window)."""
    from moc_indexer_spark.plans import registry as regmod

    want = computed_window(repo)
    have = list(regmod._DRIVER_WINDOW)
    if have == want:
        return []
    msgs = [
        "registry _DRIVER_WINDOW is stale vs the CORRECTNESS artifacts:",
        f"  should rotate out: {sorted(set(have) - set(want))}",
        f"  should rotate in:  {sorted(set(want) - set(have))}",
        "  paste-ready window:",
    ]
    msgs += [f"    {json.dumps(want[i:i + 4])[1:-1]}," for i in range(0, len(want), 4)]
    return msgs


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        problems = check()
        if problems:
            print("\n".join(problems))
            return 1
        print(f"window OK ({WINDOW_SIZE} slots match the age queue)")
        return 0
    queue = rotation_queue()
    rounds = sorted(correctness_artifacts().keys())
    print(f"artifacts: rounds {rounds}; gated queries: {len(queue)}")
    for i, (name, rnd) in enumerate(queue):
        marker = "W" if i < WINDOW_SIZE else " "
        print(f"{marker} {i + 1:3d}  r{rnd}  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
