"""Dynamic partition pruning: the scan of a partitioned fact table must
be pruned at RUNTIME by the dimension side's filter — at 100 TB this is
the difference between scanning 3 partitions and 300."""

from pyspark.sql import functions as F

from moc_indexer_spark.tables import table


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    fact_path = str(tmp_path / "events_by_type")
    e = table(spark, sf_dir, "events")
    e.write.partitionBy("event_type").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    dim = (
        e.select("event_type").distinct()
        .withColumn("keep", F.col("event_type").isin("purchase", "signup"))
        .filter("keep")
    )
    joined = fact.join(dim, "event_type").groupBy("event_type").count()

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    rows = {r.event_type: r["count"] for r in joined.collect()}
    assert set(rows) == {"purchase", "signup"}
    expect = {
        r.event_type: r["count"]
        for r in e.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type").count().collect()
    }
    assert rows == expect
