"""Distributed Lloyd's k-means with exact cross-engine determinism.

The IVF index (similarity.py) trains its coarse quantizer on a bounded
driver-side sample — standard practice, but the training itself is then
not a distributed computation. This module is the fully-distributed
form: every E-step is one broadcast-join + windowed argmin over the whole
relation, every M-step one map-side-combining aggregate, so the loop
scales to any corpus the cluster can scan. Iterations are unrolled into
a single Catalyst plan (no driver-side data movement at all — only the
plan, not the points, visits the driver).

Exact determinism (the property that lets a DuckDB oracle replay the
SAME algorithm and hash-match the assignments):

* Element quantization: every coordinate is `round(double, 6)` then
  DECIMAL(18,6) once, up front — the round-before-cast makes the decimal
  exact in both engines (proven pattern from `label_centroids`).
* Distances: per-dimension squared differences are single double
  expressions `round(.., 12)`-frozen to DECIMAL(20,12) and summed with
  exact decimal adds — aggregation/evaluation order cannot move them.
* Argmin: ROW_NUMBER over (dist, cluster_id) — a total order, so ties
  break identically everywhere.
* M-step means: exact decimal sums; ONE double division at the edge
  (sum_as_double / n), the same single IEEE op in both engines.
* Init: the k lowest-id points (k-means++ would need RNG; deterministic
  init is what makes the whole loop replayable).

Scale notes: the E-step broadcast is k×dim doubles (KBs); the M-step
shuffle carries one dim-wide partial-sum row per (cluster, partition)
thanks to map-side combine; the windowed argmin partitions by point id,
so no skew. Unrolling means plan size grows linearly with iterations —
fine for the handful of Lloyd rounds that move centroids materially; a
production loop would checkpoint the centroid relation every few rounds
to reset lineage, which changes nothing about per-round physics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantized(emb: DataFrame, dim: int, id_col: str, vec_col: str) -> DataFrame:
    cols = [F.col(id_col)] + [
        F.round(F.col(vec_col)[i].cast("double"), 6)
        .cast("decimal(18,6)")
        .alias(f"x{i}")
        for i in range(dim)
    ]
    return emb.select(*cols)


def _dist_to(centroid_prefix: str, dim: int, centroid_is_decimal: bool):
    """Exact-decimal squared distance between the point's x{i} columns and
    the centroid's {prefix}{i} columns."""
    terms = []
    for i in range(dim):
        x = F.col(f"x{i}").cast("double")
        c = F.col(f"{centroid_prefix}{i}")
        c = c.cast("double") if centroid_is_decimal else c
        d = x - c
        terms.append(F.round(d * d, 12).cast("decimal(20,12)"))
    return reduce(lambda a, b: a + b, terms)


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run `iters` full Lloyd iterations; return (id_col, cluster_id) —
    the assignment under the final centroids. cluster_id is the 0-based
    rank of the init point (by ascending id) that seeded the cluster.

    A cluster emptied by an iteration (possible when init points are
    exact duplicates — ties assign to the lower cluster id) simply drops
    out of the next broadcast; the algorithm stays well-defined and
    deterministic.
    """
    q = _quantized(emb, dim, id_col, vec_col)
    wj = Window.orderBy(id_col)
    init = (
        q.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(wj) - 1).alias("j"),
            *[F.col(f"x{i}").alias(f"c{i}") for i in range(dim)],
        )
    )
    assign = None
    centroids, cent_prefix, cent_decimal = init, "c", True
    for it in range(iters):
        d = q.crossJoin(F.broadcast(centroids)).withColumn(
            "__dist", _dist_to(cent_prefix, dim, cent_decimal)
        )
        wa = Window.partitionBy(id_col).orderBy("__dist", "j")
        assign = (
            d.withColumn("__rn", F.row_number().over(wa))
            .filter(F.col("__rn") == 1)
            .select(id_col, "j")
        )
        if it == iters - 1:
            break
        m = (
            assign.join(q, id_col)
            .groupBy("j")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.sum(f"x{i}").alias(f"__s{i}") for i in range(dim)],
            )
        )
        centroids = m.select(
            "j",
            *[
                (F.col(f"__s{i}").cast("double") / F.col("__n")).alias(f"m{i}")
                for i in range(dim)
            ],
        )
        cent_prefix, cent_decimal = "m", False
    return assign.select(id_col, F.col("j").cast("int").alias("cluster_id"))


def kmeans_oracle_sql(
    k: int = 8, iters: int = 2, dim: int = 64, table: str = "embeddings",
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    """The SAME algorithm as DuckDB SQL (generated — ~3*dim expressions per
    iteration), for the cross-engine certification oracle."""
    xs = ", ".join(
        f"CAST(ROUND(CAST({vec_col}[{i + 1}] AS DOUBLE), 6) AS DECIMAL(18,6)) AS x{i}"
        for i in range(dim)
    )
    parts = [
        f"WITH ex AS (SELECT {id_col}, {xs} FROM {table})",
        f"init AS (SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS j, "
        + ", ".join(f"x{i} AS c{i}" for i in range(dim))
        + f" FROM (SELECT * FROM ex ORDER BY {id_col} LIMIT {k}))",
    ]
    cent, cent_decimal = "init", True
    cprefix = "c"
    for it in range(iters):
        cast = "CAST({c} AS DOUBLE)" if cent_decimal else "{c}"
        dist = " + ".join(
            "CAST(ROUND((CAST(e.x{i} AS DOUBLE) - {c}) * "
            "(CAST(e.x{i} AS DOUBLE) - {c}), 12) AS DECIMAL(20,12))".format(
                i=i, c=cast.format(c=f"t.{cprefix}{i}")
            )
            for i in range(dim)
        )
        parts.append(
            f"d{it} AS (SELECT e.{id_col}, t.j, {dist} AS dist "
            f"FROM ex e CROSS JOIN {cent} t)"
        )
        parts.append(
            f"a{it} AS (SELECT {id_col}, j FROM ("
            f"SELECT {id_col}, j, ROW_NUMBER() OVER (PARTITION BY {id_col} "
            f"ORDER BY dist, j) AS rn FROM d{it}) WHERE rn = 1)"
        )
        if it == iters - 1:
            break
        sums = ", ".join(f"SUM(e.x{i}) AS s{i}" for i in range(dim))
        means = ", ".join(
            f"CAST(s{i} AS DOUBLE) / n AS m{i}" for i in range(dim)
        )
        parts.append(
            f"m{it} AS (SELECT a.j, COUNT(*) AS n, {sums} "
            f"FROM a{it} a JOIN ex e USING ({id_col}) GROUP BY a.j)"
        )
        parts.append(f"cent{it} AS (SELECT j, {means} FROM m{it})")
        cent, cent_decimal, cprefix = f"cent{it}", False, "m"
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT {id_col}, CAST(j AS INT) AS cluster_id FROM a{iters - 1}"
    )
