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


def test_aqe_splits_skewed_join(spark, sf_dir):
    """The PLANS.md 'AQE handles skew' claim, verified: a 95%-hot key join
    under lowered skew thresholds must show skew=true in the FINAL adaptive
    sort-merge join (AQE re-plans after seeing runtime partition sizes)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        # 95% of the fact rows share one key; dim side has all keys
        fact = spark.range(0, 40_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        joined = fact.join(dim.hint("merge"), "k")
        # collect() drives THIS Dataset's execution so its AQE finalizes
        # (count() would execute a different QueryExecution)
        assert len(joined.collect()) == 40_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, (
            f"AQE did not split the skewed partition:\n{final_plan[:2000]}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
