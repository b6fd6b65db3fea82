"""Distributed Lloyd's k-means (operators/clustering.py).

Oracle parity is covered registry-wide by test_oracle_parity; here:
geometry (well-separated blobs are recovered exactly), determinism
across runs, and the every-point-assigned invariant.
"""

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from moc_indexer_spark.operators.clustering import kmeans_assign

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _blobs(spark, dim=8):
    # two tight blobs at +10 and -10 on every axis, 20 points each;
    # ids interleave the blobs so init (lowest ids) sees both
    rows = []
    for i in range(40):
        base = 10.0 if i % 2 == 0 else -10.0
        vec = [base + 0.01 * ((i * 7 + d) % 5) for d in range(dim)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, _SCHEMA)


def test_separated_blobs_recovered(spark):
    df = _blobs(spark)
    out = kmeans_assign(df, k=2, iters=2, dim=8).collect()
    by_parity = {}
    for r in out:
        by_parity.setdefault(r["vec_id"] % 2, set()).add(r["cluster_id"])
    # each blob maps to exactly one cluster, and the clusters differ
    assert all(len(s) == 1 for s in by_parity.values())
    assert by_parity[0] != by_parity[1]


def test_every_point_assigned_once(spark):
    df = _blobs(spark)
    out = kmeans_assign(df, k=2, iters=3, dim=8)
    assert out.count() == 40
    assert out.select("vec_id").distinct().count() == 40


def test_deterministic_across_runs(spark):
    df = _blobs(spark)
    a = sorted(map(tuple, kmeans_assign(df, k=3, iters=2, dim=8).collect()))
    b = sorted(map(tuple, kmeans_assign(df, k=3, iters=2, dim=8).collect()))
    assert a == b


def test_duplicate_init_points_stay_welldefined(spark):
    # first two points identical -> cluster 1 can empty out; the run must
    # still assign every point deterministically
    rows = [(0, [1.0] * 4), (1, [1.0] * 4), (2, [5.0] * 4), (3, [5.1] * 4)]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = kmeans_assign(df, k=3, iters=2, dim=4)
    assert out.count() == 4
    assert out.filter(F.col("cluster_id") == 1).count() == 0
