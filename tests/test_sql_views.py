"""SQL surface: register_views makes the catalog queryable via spark.sql,
and ANSI-subset oracle strings run verbatim on Spark against the views —
two engines, one SQL text, one result."""

import pytest

from moc_indexer_spark.plans.registry import registry
from moc_indexer_spark.tables import register_views
from moc_indexer_spark.testing import compare

# oracle strings that are ANSI enough to run on BOTH DuckDB and Spark
# (no str_split/list_slice/::casts/UNNEST-lateral)
PORTABLE = [
    "tx_list",
    "order_priority_counts",
    "local_supplier_volume",
    "shipmode_priority_counts",
    "nation_pair_volume",
    "nation_market_share",
    "product_type_profit",
    "important_part_stock",
    "customer_order_distribution",
    "top_supplier_revenue",
    "disjunctive_revenue",
    "excess_shipment_suppliers",
]

_SPECS = {s.name: s for s in registry()}


def test_views_are_lazy_and_complete(spark, sf_dir):
    register_views(spark, sf_dir)
    names = {r.name for r in spark.catalog.listTables()}
    assert {"lineitem", "orders", "documents", "transactions"} <= names


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_verbatim_on_spark(spark, sf_dir, name):
    register_views(spark, sf_dir)
    spec = _SPECS[name]
    via_sql = spark.sql(spec.oracle)
    via_df = spec.build(spark, sf_dir)
    ok, msg = compare(via_sql, via_df.toPandas())
    assert ok, f"{name}: {msg}"
