"""The driver-window rotation is computed, not hand-maintained.

scripts/rotation_queue.py implements COVERAGE.md's "Driver-window
rotation" procedure; these tests pin (a) the procedure's mechanics on a
synthetic artifact set and (b) the real registry window against the real
committed CORRECTNESS artifacts — so a round that gains an artifact
without rotating `_DRIVER_WINDOW` fails the suite with a paste-ready
replacement window in the assertion message.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import rotation_queue as rq  # noqa: E402


def test_green_row_semantics():
    assert rq._green({"rows_match": True, "schema_match": True, "err": None})
    # err'd, row-mismatched, or schema-mismatched rows never certify
    assert not rq._green({"rows_match": True, "schema_match": True, "err": "boom"})
    assert not rq._green({"rows_match": False, "schema_match": True, "err": None})
    assert not rq._green({"rows_match": True, "schema_match": False, "err": None})
    # missing keys (defensive vs artifact drift) read as not-green
    assert not rq._green({})


def test_last_green_rounds_on_synthetic_artifacts(tmp_path):
    g = {"rows_match": True, "schema_match": True, "err": None}
    b = {"rows_match": True, "schema_match": True, "err": "timeout"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"a": g, "b": g}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"a": b, "c": g}))
    last = rq.last_green_rounds(str(tmp_path))
    # a's r2 row err'd: its last GREEN round stays 1
    assert last == {"a": 1, "b": 1, "c": 2}


def test_registry_window_matches_computed_queue():
    problems = rq.check()
    assert not problems, "\n".join(problems)


def test_window_is_oracle_gated_and_sized():
    from moc_indexer_spark.plans import registry as regmod

    specs = {s.name: s for s in regmod.registry()}
    assert len(regmod._DRIVER_WINDOW) == rq.WINDOW_SIZE
    assert len(set(regmod._DRIVER_WINDOW)) == rq.WINDOW_SIZE
    for name in regmod._DRIVER_WINDOW:
        assert specs[name].oracle, f"window slot {name} is not oracle-gated"
