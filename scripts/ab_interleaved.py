#!/usr/bin/env python
"""Interleaved A/B of two DataFrame builders in ONE session.

Both variants are built once, warmed once, then timed ALTERNATELY
(A,B,A,B,...) for --runs rounds each — box-speed drift hits both arms
equally, which cross-session A/Bs on this machine cannot guarantee
(documented ±25-30% session drift). Medians + full runs printed.

Usage: python scripts/ab_interleaved.py <case> [runs]
Cases are registered in CASES below: each returns (label_a, build_a,
label_b, build_b) where build_* take (spark, sf_dir) and return a DF.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _constraint_report_r10(spark, sf_dir):
    """Round-10 single-pass shape (the driver-measured regression)."""
    from moc_indexer_spark.tables import table

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def viol(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    per_key = (
        l.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                 "l_shipdate")
        .join(F.broadcast(o.select("o_orderkey")),
              F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n"),
            viol(F.col("l_orderkey").isNull(), "p_null_orderkey"),
            viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
                 "p_qty"),
            viol((F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                 "p_discount"),
            viol(F.col("l_shipdate").isNull(), "p_null_shipdate"),
            viol(F.col("o_orderkey").isNull(), "p_orphan"),
        )
    )
    return per_key.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.sum("p_null_orderkey").cast("bigint").alias("null_orderkey"),
        F.sum("p_qty").cast("bigint").alias("qty_out_of_range"),
        F.sum("p_discount").cast("bigint").alias("discount_out_of_range"),
        F.sum("p_null_shipdate").cast("bigint").alias("null_shipdate"),
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("bigint")
        .alias("dup_key_rows"),
        F.coalesce(F.sum("p_orphan"), F.lit(0)).cast("bigint")
        .alias("orphan_lineitems"),
    )


def _constraint_report_r9(spark, sf_dir):
    """Round-9 three-pass shape (row-local agg + dup groupBy + anti-join)."""
    from moc_indexer_spark.tables import table

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def viol(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    checks = l.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        viol(F.col("l_orderkey").isNull(), "null_orderkey"),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
             "qty_out_of_range"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 1),
             "discount_out_of_range"),
        viol(F.col("l_shipdate").isNull(), "null_shipdate"),
    )
    dupes = (
        l.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("bigint")
             .alias("dup_key_rows"))
    )
    orphans = (
        l.join(F.broadcast(o.select("o_orderkey")),
               F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_lineitems"))
    )
    return checks.crossJoin(dupes).crossJoin(orphans)


def _registry_df(name):
    def build(spark, sf_dir):
        from moc_indexer_spark.plans.registry import registry
        spec = {s.name: s for s in registry()}[name]
        return spec.build(spark, sf_dir)
    return build


def _kneser_ney_r10(spark, sf_dir):
    """Round-10 shape: n_types as a separate corpus pass + crossJoin."""
    from pyspark.sql import Window

    from moc_indexer_spark.functions import text as T
    from moc_indexer_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    discount = 0.75
    toks = docs.select("doc_id", T.tokens().alias("t")).filter(F.size("t") >= 2)
    big = toks.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("w1"),
                F.element_at("t", i + 1).alias("w2"),
            ),
        )).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    bigc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    w1w = Window.partitionBy("w1")
    w2w = Window.partitionBy("w2")
    bigc = (
        bigc.withColumn("c1", F.sum("c12").over(w1w))
        .withColumn("n_follow", F.count(F.lit(1)).over(w1w))
        .withColumn("n_prec", F.count(F.lit(1)).over(w2w))
    )
    types = big.groupBy("w1", "w2").agg(F.count(F.lit(1))).agg(
        F.count(F.lit(1)).alias("n_types")
    )
    p = (
        F.greatest(F.col("c12").cast("double") - F.lit(discount), F.lit(0.0))
        / F.col("c1").cast("double")
        + (F.lit(discount) * F.col("n_follow").cast("double")
           / F.col("c1").cast("double"))
        * (F.col("n_prec").cast("double") / F.col("n_types").cast("double"))
    )
    lp = F.log(p).cast("decimal(18,9)")
    return (
        big.join(bigc, ["w1", "w2"])
        .crossJoin(F.broadcast(types))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(lp).cast("double") / F.count(F.lit(1)).cast("double"),
                    6).alias("mean_logprob"),
        )
    )


CASES = {
    "constraint_report": lambda: (
        "r10_single_pass", _constraint_report_r10,
        "r11_hybrid", _registry_df("constraint_report"),
    ),
    "constraint_report_vs_r9": lambda: (
        "r9_three_pass", _constraint_report_r9,
        "r11_hybrid", _registry_df("constraint_report"),
    ),
    "kneser_ney": lambda: (
        "r10_three_tokenize", _kneser_ney_r10,
        "r11_window_ntypes", _registry_df("kneser_ney_logprob"),
    ),
}


def main() -> None:
    case = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    la, ba, lb, bb = CASES[case]()

    from moc_indexer_spark.session import get_spark
    spark = get_spark(app_name=f"ab-{case}",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from moc_indexer_spark.tables import TABLE_NAMES, enable_layout_mirror, table
    enable_layout_mirror()
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).count()

    dfa, dfb = ba(spark, sf_dir), bb(spark, sf_dir)
    out = {la: [], lb: []}
    for d in (dfa, dfb):  # one untimed warm run each
        d.write.format("noop").mode("overwrite").save()
    for _ in range(runs):
        for lbl, d in ((la, dfa), (lb, dfb)):
            spark.sparkContext.setJobDescription(f"ab:{case}:{lbl}")
            t0 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            out[lbl].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    res = {}
    for lbl, rs in out.items():
        s = sorted(rs)
        res[lbl] = {"median": s[len(s) // 2], "runs": rs}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
