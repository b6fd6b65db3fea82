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


def test_spherical_normalize_is_scale_invariant(spark):
    """normalize=True clusters by DIRECTION: scaling any vector by a
    positive constant must not change its assignment (the property that
    makes the spherical form the right quantizer for cosine dedup)."""
    df = _blobs(spark)
    scaled = df.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: x * (1.0 + (F.col("vec_id") % 3).cast("double")),
        ).alias("embedding"),
    )
    base = {r.vec_id: r.cluster_id
            for r in kmeans_assign(df, k=2, iters=2, dim=8,
                                   normalize=True).collect()}
    after = {r.vec_id: r.cluster_id
             for r in kmeans_assign(scaled, k=2, iters=2, dim=8,
                                    normalize=True).collect()}
    assert base == after


def test_semantic_dedup_certified_contract(spark, sf_dir):
    """The certified twin of semantic_dedup_scaled keeps the SAME output
    contract: one row per vector; every non-NULL dup_of is an earlier
    same-cell vector whose 6dp cosine clears the threshold (precision
    exact by re-derivation); deterministic across builds. Cross-engine
    hash parity is covered registry-wide by test_oracle_parity."""
    import numpy as np

    from moc_indexer_spark.operators.clustering import (
        semantic_dedup_scaled_certified,
    )
    from moc_indexer_spark.plans.llm_registry import COSINE_DUP_THRESHOLD
    from moc_indexer_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    out = semantic_dedup_scaled_certified(
        emb, threshold=COSINE_DUP_THRESHOLD)
    rows = out.collect()
    n = emb.count()
    assert len(rows) == n and len({r.vec_id for r in rows}) == n

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    cell = {r.vec_id: r.cell for r in rows}
    dup_rows = [r for r in rows if r.dup_of is not None]
    assert dup_rows, "fixture should contain semantic dups"
    for r in dup_rows:
        assert r.dup_of < r.vec_id
        assert cell[r.dup_of] == r.cell
        a, b = vecs[r.vec_id], vecs[r.dup_of]
        cos = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
        assert cos >= COSINE_DUP_THRESHOLD
