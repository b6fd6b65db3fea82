"""Driver contract for the spark-graft builder (PySpark target).

Backed by the moc_indexer_spark package: `queries()` / `oracle_sql()` are
generated from the query registry (moc_indexer_spark/plans/registry.py), where
each PySpark builder is defined next to its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moc_indexer_spark.plans.registry import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the tx-list read API (filter + not-in + top-k page)."""
    from pyspark.sql import functions as F

    from moc_indexer_spark.operators import relational as R
    from moc_indexer_spark.plans.registry import EXCLUDED_EVENTS, PAGE_LIMIT, TX_USER
    from moc_indexer_spark.tables import transactions

    t = transactions(spark, SMOKE_SF_DIR)
    f = t.filter(
        (F.col("address") == TX_USER) & (~F.col("event").isin(*EXCLUDED_EVENTS))
    ).select("tx_hash", "address", "event", "created_at", "amount")
    return R.page_top_k(f, [F.desc("created_at"), F.desc("tx_hash")], 0, PAGE_LIMIT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.build for spec in registry()}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in registry() if spec.oracle}
