"""Mirror of the driver's t2 gate: every registry query with an oracle must
hash-match DuckDB on the same parquet tables (run at sf0.001 for speed; the
driver runs sf0.01)."""

import pytest

from moc_indexer_spark.plans.registry import registry
from moc_indexer_spark.testing import compare, run_oracle

SPECS = registry()


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle], ids=lambda s: s.name)
def test_oracle_parity(spark, sf_dir, spec):
    sdf = spec.build(spark, sf_dir)
    pdf = run_oracle(spec.oracle, sf_dir)
    ok, msg = compare(sdf, pdf)
    assert ok, f"{spec.name}: {msg}"


@pytest.mark.parametrize("spec", [s for s in SPECS if not s.oracle], ids=lambda s: s.name)
def test_rows_only(spark, sf_dir, spec):
    n = spec.build(spark, sf_dir).count()
    assert n >= 0
