"""Bucketed-table co-located join: the §4 'index replacement' scale claim,
verified against the physical plan — both sides bucketed on the join key
with equal bucket counts must join with ZERO Exchange operators."""

import shutil

from pyspark.sql import functions as F

from moc_indexer_spark.tables import table, transactions, write_bucketed_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _clean(spark, *names):
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        shutil.rmtree(f"{warehouse}/{n}", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    _clean(spark, "tx_bucketed", "users_bucketed")
    t = transactions(spark, sf_dir).select("tx_hash", "address", "amount")
    u = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("address"), "c_acctbal")
    )
    write_bucketed_table(t, "tx_bucketed", "address", n_buckets=8,
                         sort_cols=("address",))
    write_bucketed_table(u, "users_bucketed", "address", n_buckets=8,
                         sort_cols=("address",))

    bt = spark.table("tx_bucketed")
    bu = spark.table("users_bucketed")
    # merge hint = the 100 TB shape (neither side broadcastable); at sf-test
    # size the planner would otherwise broadcast and skip bucketing entirely
    joined = bt.join(bu.hint("merge"), "address")

    plan = _plan(joined)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert "SortMergeJoin" in plan

    # result parity with the plain (shuffling) join
    plain = t.join(u, "address")
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # sanity: the un-bucketed merge join DOES shuffle (what bucketing removes)
    assert "Exchange" in _plan(t.join(u.hint("merge"), "address"))

    _clean(spark, "tx_bucketed", "users_bucketed")
