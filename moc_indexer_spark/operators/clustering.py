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


def _quantized(
    emb: DataFrame, dim: int, id_col: str, vec_col: str,
    normalize: bool = False,
) -> DataFrame:
    """Coordinate freeze; `normalize=True` first divides by the vector's
    L2 norm (the spherical-k-means preprocessing). Cross-engine exactness
    of the normalized path: the squared-norm is a PURE-DOUBLE fixed-order
    sum — a left-associative `+` expression chain over r_i*r_i terms that
    both Spark and DuckDB parse identically and never FP-reassociate (see
    _dist_to for the full argument; no rounding of any derived value
    inside the sum) — the norm ONE IEEE sqrt on that double, each
    coordinate ONE IEEE divide — identical single expressions in DuckDB
    (see kmeans_oracle_sql), then the same round-6 decimal freeze as the
    plain path.

    Residual hazard, documented deliberately: the final round(r_i/nrm, 6)
    rounds a DERIVED double, the same defect class as the round(d*d,12)
    boundary flip _dist_to's history records. It is kept because the
    M-step aggregate needs exact-decimal inputs (its sums are
    order-undefined), so SOME freeze of the quotient is unavoidable; 6dp
    is believed safe here because a quotient of two bit-identical doubles
    is bit-identical in both engines, so a flip requires the quotient to
    land within one ulp of a 6dp half-way point AND the engines to break
    that tie differently — empirically certified by the recurring sf0.1
    oracle sweep (178 queries, this family included), which is the pin
    that would catch a future flip. Not safe by construction; safe by
    measurement with a standing tripwire."""
    if normalize:
        # staged projections: nrm must become a real column ATTRIBUTE
        # before the 64 per-coordinate divisions reference it — inlining
        # the 64-term ssq+sqrt tree into every coordinate (one fat select)
        # multiplies the plan by dim and was measured at 8x the runtime
        # of the plain path on pure analysis/codegen weight. Catalyst
        # keeps multi-referenced non-cheap aliases un-collapsed.
        raw = emb.select(
            F.col(id_col),
            *[F.col(vec_col)[i].cast("double").alias(f"r{i}")
              for i in range(dim)],
        )
        # pure-double fixed-order sum (see _dist_to: expression + chains
        # are left-associative and never FP-reassociated in either
        # engine; rounding derived doubles is the boundary-flip hazard)
        ssq = reduce(
            lambda a, b: a + b,
            [F.col(f"r{i}") * F.col(f"r{i}") for i in range(dim)],
        )
        nn = raw.select("*", F.sqrt(ssq).alias("nrm"))
        return nn.select(
            F.col(id_col),
            *[F.round(F.col(f"r{i}") / F.col("nrm"), 6)
              .cast("decimal(18,6)").alias(f"x{i}") for i in range(dim)],
        )
    cols = [F.col(id_col)] + [
        F.round(F.col(vec_col)[i].cast("double"), 6)
        .cast("decimal(18,6)")
        .alias(f"x{i}")
        for i in range(dim)
    ]
    return emb.select(*cols)


def _dist_to(centroid_prefix: str, dim: int, centroid_is_decimal: bool):
    """Squared distance between the point's x{i} columns and the
    centroid's {prefix}{i} columns, as a PURE-DOUBLE fixed-order
    expression sum. Cross-engine exactness argument: x and c are either
    exact decimals cast to double or doubles both engines derived
    through identical single IEEE ops, so every (x-c)*(x-c) term is
    bit-identical; the `+` chain is an EXPRESSION (not an aggregate), and
    both Spark and DuckDB parse it left-associative and never
    reassociate FP adds — so the total is bit-identical too, and the
    argmin (ordered by dist, then j) cannot diverge. The earlier
    round(d*d, 12)->decimal freeze per term was strictly WORSE: rounding
    a derived double sits on engine-specific half-way behavior, and the
    round-7 sf0.1 oracle sweep caught exactly one such boundary flip
    (vec 1178, k=16) — the same defect class as round 6's PageRank ulp.
    Decimal freezing remains where it is load-bearing: the coordinate
    quantization (input to the ORDER-UNDEFINED M-step aggregate sums),
    never on expression-order-deterministic derived values."""
    terms = []
    for i in range(dim):
        x = F.col(f"x{i}").cast("double")
        c = F.col(f"{centroid_prefix}{i}")
        c = c.cast("double") if centroid_is_decimal else c
        d = x - c
        terms.append(d * d)
    return reduce(lambda a, b: a + b, terms)


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Run `iters` full Lloyd iterations; return (id_col, cluster_id) —
    the assignment under the final centroids. cluster_id is the 0-based
    rank of the init point (by ascending id) that seeded the cluster.

    `normalize=True` runs the SPHERICAL form: unit-normalized inputs, so
    argmin Euclidean distance == argmax cosine (centroid means are not
    re-normalized between iterations — Lloyd on the unit sphere's chord
    metric; deterministic either way).

    A cluster emptied by an iteration (possible when init points are
    exact duplicates — ties assign to the lower cluster id) simply drops
    out of the next broadcast; the algorithm stays well-defined and
    deterministic.
    """
    q = _quantized(emb, dim, id_col, vec_col, normalize=normalize)
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


def _kmeans_oracle_parts(
    k, iters: int, dim: int, table: str, id_col: str, vec_col: str,
    normalize: bool = False, k_sql: str | None = None,
) -> list[str]:
    """CTE list replaying kmeans_assign in DuckDB; the final assignment
    CTE is `a{iters-1}` with columns ({id_col}, j). `k_sql` (a scalar SQL
    expression) makes the cluster count DATA-DEPENDENT — the corpus-scaled
    form — instead of the literal `k`; `normalize` mirrors the spherical
    preprocessing (same single-IEEE-op expressions as _quantized)."""
    if normalize:
        rs = ", ".join(
            f"CAST({vec_col}[{i + 1}] AS DOUBLE) AS r{i}" for i in range(dim)
        )
        ssq = " + ".join(f"r{i} * r{i}" for i in range(dim))
        nx = ", ".join(
            f"CAST(ROUND(r{i} / nrm, 6) AS DECIMAL(18,6)) AS x{i}"
            for i in range(dim)
        )
        parts = [
            f"WITH raw AS (SELECT {id_col}, {rs} FROM {table})",
            f"nn AS (SELECT *, SQRT({ssq}) AS nrm FROM raw)",
            f"ex AS (SELECT {id_col}, {nx} FROM nn)",
        ]
    else:
        xs = ", ".join(
            f"CAST(ROUND(CAST({vec_col}[{i + 1}] AS DOUBLE), 6) "
            f"AS DECIMAL(18,6)) AS x{i}"
            for i in range(dim)
        )
        parts = [f"WITH ex AS (SELECT {id_col}, {xs} FROM {table})"]
    cs = ", ".join(f"x{i} AS c{i}" for i in range(dim))
    if k_sql is not None:
        parts.append(
            f"init AS (SELECT rn - 1 AS j, {cs} FROM ("
            f"SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) AS rn, * FROM ex"
            f") WHERE rn <= ({k_sql}))"
        )
    else:
        parts.append(
            f"init AS (SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS j, "
            f"{cs} FROM (SELECT * FROM ex ORDER BY {id_col} LIMIT {k}))"
        )
    cent, cent_decimal = "init", True
    cprefix = "c"
    for it in range(iters):
        cast = "CAST({c} AS DOUBLE)" if cent_decimal else "{c}"
        # pure-double fixed-order sum — mirrors _dist_to (see its
        # docstring: expression `+` chains are left-associative and
        # never FP-reassociated in either engine, so no rounding step
        # is needed and none is SAFE on these derived values)
        dist = " + ".join(
            "(CAST(e.x{i} AS DOUBLE) - {c}) * "
            "(CAST(e.x{i} AS DOUBLE) - {c})".format(
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
    return parts


def kmeans_oracle_sql(
    k: int = 8, iters: int = 2, dim: int = 64, table: str = "embeddings",
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    """The SAME algorithm as DuckDB SQL (generated — ~3*dim expressions per
    iteration), for the cross-engine certification oracle."""
    parts = _kmeans_oracle_parts(k, iters, dim, table, id_col, vec_col)
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT {id_col}, CAST(j AS INT) AS cluster_id FROM a{iters - 1}"
    )


def semantic_dedup_scaled_certified(
    emb: DataFrame,
    threshold: float,
    target_cell_rows: int = 256,
    iters: int = 2,
    dim: int = 64,
    n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The CERTIFICATION twin of `semantic_dedup_scaled` (similarity.py):
    identical contract — corpus-scaled cell count
    (min(4096, max(16, n // target_cell_rows))), spherical quantizer with
    first-n init and fixed Lloyd iterations, one output row per vector
    with dup_of = smallest-id earlier same-cell vector whose 6dp-rounded
    cosine clears `threshold` — but every step is the exact-decimal
    replayable form, so a DuckDB oracle (semdedup_scaled_oracle_sql)
    hash-pins the full (vec_id, cell, dup_of) output. The production
    operator keeps its sample-trained numpy quantizer (BLAS accumulation
    order is engine-specific by nature); THIS leg is what carries the
    hard cross-engine signal for the family, exactly as `kmeans_clusters`
    does for the IVF coarse quantizer and `lsh_ann_exact` for LSH."""
    from .similarity import semantic_dedup

    if n is None:
        n = emb.count()
    k = min(4096, max(16, n // target_cell_rows))
    cells = kmeans_assign(
        emb, k=k, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col,
        normalize=True,
    ).withColumnRenamed("cluster_id", "cell")
    out = semantic_dedup(
        emb.join(cells, id_col), cluster_col="cell", threshold=threshold,
        id_col=id_col, vec_col=vec_col,
    )
    return out.select(
        id_col, F.col("cluster").cast("int").alias("cell"), "dup_of"
    )


def semdedup_scaled_oracle_sql(
    threshold: float,
    target_cell_rows: int = 256,
    iters: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay of semantic_dedup_scaled_certified: the spherical
    dynamic-k kmeans CTEs (cluster count computed FROM the data, so one
    oracle string is correct at every SF) + the proven 6dp-rounded-cosine
    keeper rule (the `semantic_dedup_report` pattern)."""
    k_sql = (
        f"SELECT LEAST(4096, GREATEST(16, COUNT(*) // {target_cell_rows})) "
        f"FROM {table}"
    )
    parts = _kmeans_oracle_parts(
        None, iters, dim, table, id_col, vec_col,
        normalize=True, k_sql=k_sql,
    )
    parts.append(f"cells AS (SELECT {id_col}, j AS cell FROM a{iters - 1})")
    parts.append(
        f"ev AS (SELECT e.{id_col}, c.cell, e.v FROM "
        f"(SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}) e "
        f"JOIN cells c USING ({id_col}))"
    )
    parts.append(
        f"p AS (SELECT a.{id_col}, a.cell, "
        f"MIN(CASE WHEN ROUND(list_cosine_similarity(a.v, b.v), 6) "
        f">= {threshold} THEN b.{id_col} END) AS dup_of "
        f"FROM ev a LEFT JOIN ev b "
        f"ON a.cell = b.cell AND b.{id_col} < a.{id_col} "
        f"GROUP BY a.{id_col}, a.cell)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT {id_col}, CAST(cell AS INT) AS cell, dup_of FROM p"
    )
