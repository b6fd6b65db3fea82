"""Distributed Bloom filter (operators/bloom.py): the exact-confirm
decontamination accelerator's guarantees.

- No false negatives: every member key survives the probe (this is what
  makes the pre-filter lossless for the downstream exact confirm).
- False-positive rate is in the expected ballpark for (m, k, n).
- The filter relation is bounded by m/64 words regardless of key count.
- The probe plan broadcasts the filter (no corpus shuffle to test bits).
"""

from pyspark.sql import functions as F

from moc_indexer_spark.operators.bloom import bloom_build, bloom_probe


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


def test_no_false_negatives(spark):
    members = _keys(spark, 0, 2000)
    bloom = bloom_build(members, "k", m_bits=1 << 16, k=5)
    out = bloom_probe(members, "k", bloom, m_bits=1 << 16, k=5)
    assert out.count() == 2000  # every member passes, none merged/dropped


def test_false_positive_rate_bounded(spark):
    members = _keys(spark, 0, 1000)
    others = _keys(spark, 1000, 6000)  # disjoint
    m, k = 1 << 16, 5
    bloom = bloom_build(members, "k", m_bits=m, k=k)
    fp = bloom_probe(others, "k", bloom, m_bits=m, k=k).count()
    # theoretical fpp ~ (1 - e^{-kn/m})^k ≈ 0.05% for n=1000; allow 50x slack
    assert fp / 5000 < 0.025, f"false-positive rate {fp}/5000 too high"


def test_filter_size_bounded(spark):
    m = 1 << 12
    bloom = bloom_build(_keys(spark, 0, 50_000), "k", m_bits=m, k=5)
    assert bloom.count() <= m // 64


def test_probe_plan_broadcasts_filter(spark):
    members = _keys(spark, 0, 100)
    bloom = bloom_build(members, "k", m_bits=1 << 12, k=3)
    plan = bloom_probe(members, "k", bloom, m_bits=1 << 12, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_preserves_extra_columns(spark):
    rows = spark.range(0, 500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    bloom = bloom_build(rows.select("k"), "k", m_bits=1 << 14, k=4)
    out = bloom_probe(rows, "k", bloom, m_bits=1 << 14, k=4)
    assert out.columns == ["k", "payload"]
    assert out.filter(F.col("payload") == 10).count() == 1
