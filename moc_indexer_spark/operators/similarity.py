"""Embedding similarity search (approximate-nearest-neighbor) operators.

Baseline: brute-force cosine top-k — a blocked cross join with the dot
product as a Catalyst `aggregate(zip_with(...))` expression (JVM-side, no
UDF). Scale path: random-hyperplane LSH bucketing — candidates only within
matching sign-pattern buckets (multi-probe via several independent tables).

100 TB design notes:
- Brute force is O(Q*N); it remains the right plan when Q is small (point
  lookups) and N is partition-pruned. The query side is broadcast; the
  corpus side streams through codegen — no shuffle at all.
- LSH: bucket assignment is one Arrow matmul against a fixed-seed broadcast
  plane matrix (reproducible, no stored model); per-bucket verify is a
  grouped BLAS self-matmul emitting per-query bucket top-k, so vectors
  never cross bucket boundaries and the rank stages see id/sim triples
  only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine(a, b):
    """NULL when either vector has zero norm: 0/0 would be NaN, and Spark
    orders NaN FIRST under desc (NaN > any double) while the numpy
    scorers sort it last — a zero-norm embedding (failed/null embedder
    output) would top every Catalyst ranking and vanish from the Arrow
    ones. NULL + desc (nulls last by default) never ranks, matching the
    numpy paths' explicit -inf exclusion."""
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb))


def _make_block_topk():
    """Factory so the helper is a CLOSURE, not a module attribute:
    cloudpickle then ships it BY VALUE inside every UDF that references
    it. (A module-level function pickles by reference, which breaks on
    python workers that can't import this package — the driver harness
    adds the repo to sys.path driver-side only.)"""

    def _block_topk(scores, c_ids, q_ids, kk):
        """Per-row top-`kk` of a (nq, nc) score block under the total
        order (score desc, candidate id asc) — the shared emission step
        of every blocked scorer here.

        When `kk` covers the whole row (exact/oracle mode) this is the
        plain stable lexsort. Otherwise np.argpartition bounds the sort
        to the kk survivors — O(nc + kk·log kk) per row instead of
        O(nc·log nc), which dominates block time once nc is in the
        thousands (scores are 6dp-rounded upstream, so boundary TIES are
        common: rows where the cut value ties past position kk are
        re-selected exactly under the total order, keeping results
        identical to the full sort).

        Returns flat (query_id, cand_id, score) arrays with -inf
        (masked) entries dropped.
        """
        import numpy as np

        nq, nc = scores.shape
        kk = min(kk, nc)
        if kk >= nc:
            top = np.lexsort((c_ids[None, :].repeat(nq, 0), -scores), axis=1)
        else:
            part = np.argpartition(-scores, kk - 1, axis=1)
            sel = part[:, :kk]
            bound = np.take_along_axis(scores, part[:, kk - 1 : kk], axis=1)
            tie_rows = np.flatnonzero((scores >= bound).sum(axis=1) > kk)
            for i in tie_rows:
                cand = np.flatnonzero(scores[i] >= bound[i, 0])
                cand = cand[np.lexsort((c_ids[cand], -scores[i, cand]))][:kk]
                sel[i] = cand
            sel_scores = np.take_along_axis(scores, sel, axis=1)
            order = np.lexsort((c_ids[sel], -sel_scores), axis=1)
            top = np.take_along_axis(sel, order, axis=1)
        top = top[:, :kk]
        qi = np.repeat(q_ids, kk)
        ni = c_ids[top].ravel()
        sv = np.take_along_axis(scores, top, axis=1).ravel()
        keep = sv != -np.inf
        return qi[keep], ni[keep], sv[keep]

    return _block_topk


_block_topk = _make_block_topk()


def _collect_train_sample(corpus, id_col, vec_col, train_sample):
    """Deterministic driver-side training sample (first `train_sample`
    ids), unit-normalized — the bounded-collect regime every quantizer
    here trains under (standard IVF/PQ practice: quantizers train on a
    sample even for billion-vector indexes)."""
    import numpy as np

    sample = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(train_sample).collect()
    )
    if not sample:
        # empty corpus: np.array([]) is 1-D and norm(axis=1) would raise
        # AxisError; let callers return a typed empty frame (the LSH
        # operators' contract) or refuse an index build meaningfully
        return None
    X = np.array([r[1] for r in sample], dtype=np.float64)
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def _train_spherical_kmeans(Xn, n_cells, lloyd_iters):
    """Coarse quantizer: spherical Lloyd on the normalized sample, first
    `n_cells` rows as init — reproducible, no RNG."""
    import numpy as np

    C = Xn[:n_cells].copy()
    for _ in range(lloyd_iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(n_cells):
            members = Xn[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C /= np.linalg.norm(C, axis=1, keepdims=True)
    return C


def _train_pq_books(Xn, m, n_codes, lloyd_iters):
    """Per-subspace Euclidean k-means codebooks (m, n_codes, dim/m) on
    the normalized sample, first `n_codes` rows as init."""
    import numpy as np

    d = Xn.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    d_sub = d // m
    books = []
    for j in range(m):
        S_ = Xn[:, j * d_sub : (j + 1) * d_sub]
        C = S_[:n_codes].copy()
        for _ in range(lloyd_iters):
            d2 = ((S_[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = S_[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return np.stack(books)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Cosine top-k for every query vector (defaults: corpus vs itself,
    self-pairs excluded). Returns (query_id, neighbor_id, cosine_sim).

    cosine_sim is rounded to `round_digits` and ranking breaks ties on
    neighbor_id so results are stable cross-engine and cross-run.
    """
    if queries is None:
        queries = corpus
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias(
                "cosine_sim"
            ),
        )
        # zero-norm vectors have no defined cosine (NULL above): exclude
        # the pair entirely, matching the numpy paths' -inf drop
        .filter(F.col("cosine_sim").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_query_rows: int = 65536,
) -> DataFrame:
    """Vectorized brute-force cosine top-k: the query matrix is broadcast to
    every executor; the corpus streams through `mapInPandas` in Arrow
    batches; each batch computes a BLAS matmul (B x Q sims) and emits only
    its per-query top-k — the final global top-k runs over k*n_batches rows
    per query, not the full cross product.

    ~50x faster than the pure-Catalyst fold (`brute_force_topk`) on 64-dim
    vectors; semantics identical (same rounding + neighbor_id tiebreak, and
    per-batch top-k by that total order is lossless for global top-k).

    100 TB shape: corpus-side is embarrassingly parallel with zero shuffle;
    the only reduce is the tiny candidate set. The query side is collected
    to the driver BY CONTRACT (point lookups / small query batches) and the
    collect is hard-capped at `max_query_rows` — for an unbounded query
    side (e.g. self-ANN of the whole corpus) use `brute_force_topk_blocked`,
    which never collects data.
    """
    import numpy as np
    import pandas as pd

    if queries is None:
        queries = corpus
    # bounded collect: fetch at most cap+1 rows, refuse past the cap
    qrows = (
        queries.select(id_col, vec_col).limit(max_query_rows + 1).collect()
    )
    if len(qrows) > max_query_rows:
        raise ValueError(
            f"query side exceeds max_query_rows={max_query_rows}; use "
            "brute_force_topk_blocked for an unbounded query set"
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, qm, qn))

    out_schema = "query_id long, neighbor_id long, cosine_sim double"

    def block_topk(batches):
        q_ids_, qm_, qn_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.array(list(pdf[vec_col]), dtype=np.float64)
            cn = np.linalg.norm(cm, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (qm_ @ cm.T) / (qn_[:, None] * cn[None, :])
            sims = np.round(sims, round_digits)
            # self-match and zero-norm NaNs -> -inf so they never rank
            # (and the final filter drops them even on short corpora
            # where top-k would otherwise surface the sentinel)
            self_mask = q_ids_[:, None] == c_ids[None, :]
            sims[self_mask] = -np.inf
            sims[~np.isfinite(sims)] = -np.inf
            qi, ni, sv = _block_topk(sims, c_ids, q_ids_, k)
            yield pd.DataFrame(
                {"query_id": qi, "neighbor_id": ni, "cosine_sim": sv}
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(block_topk, schema=out_schema)
    # a corpus smaller than k would surface the -inf sentinels (the
    # Catalyst form filters those pairs out entirely — keep them equal)
    cand = cand.filter(F.col("cosine_sim") >= F.lit(-1.0))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def brute_force_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    chunk_rows: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Distributed blocked brute-force cosine top-k — NO driver-side data
    collect, so it holds for an arbitrarily large query side (including the
    self-ANN case queries == corpus).

    Block-matrix shape: queries hash into NQ chunks and the corpus into NC
    chunks; each (q_chunk, c_chunk) block cogroups into one Arrow
    `applyInPandas` call that runs a single BLAS matmul and emits its
    per-query block top-k under the global total order (sim desc, id asc —
    a lossless prune). The final window ranks NC*k candidates per query.

    Cost model at scale: compute is the inherent O(Q*N) of exact brute
    force; shuffle is corpus_bytes*NQ + query_bytes*NC (the classic blocked
    all-pairs trade — block memory is bounded at chunk_rows^2 sims, ~32 MB
    at the 2048 default, regardless of table sizes). Only two scalar
    count() jobs touch the driver. Semantics identical to
    brute_force_topk_np (same rounding, self-mask, tie order).
    """
    import math

    import numpy as np
    import pandas as pd

    if queries is None:
        queries = corpus
    n_c = corpus.count()
    # self-ANN: one scan sizes both grid dimensions
    n_q = n_c if queries is corpus else queries.count()
    nq_chunks = max(1, math.ceil(n_q / chunk_rows))
    nc_chunks = max(1, math.ceil(n_c / chunk_rows))

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn(
            "qc", F.pmod(F.xxhash64("query_id"), F.lit(nq_chunks)).cast("int")
        )
        .withColumn(
            "cc",
            F.explode(F.sequence(F.lit(0), F.lit(nc_chunks - 1)).cast("array<int>")),
        )
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn(
            "cc", F.pmod(F.xxhash64("neighbor_id"), F.lit(nc_chunks)).cast("int")
        )
        .withColumn(
            "qc",
            F.explode(F.sequence(F.lit(0), F.lit(nq_chunks - 1)).cast("array<int>")),
        )
    )

    out_schema = "query_id long, neighbor_id long, cosine_sim double"

    def score_block(key, qdf, cdf):
        if len(qdf) == 0 or len(cdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine_sim": []}
            )
        q_ids = qdf["query_id"].to_numpy(dtype=np.int64)
        qm = np.array(list(qdf["qv"]), dtype=np.float64)
        qn = np.linalg.norm(qm, axis=1)
        c_ids = cdf["neighbor_id"].to_numpy(dtype=np.int64)
        cm = np.array(list(cdf["cv"]), dtype=np.float64)
        cn = np.linalg.norm(cm, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.round(
                (qm @ cm.T) / (qn[:, None] * cn[None, :]), round_digits
            )
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf
        sims[~np.isfinite(sims)] = -np.inf  # zero-norm NaNs never rank
        qi, ni, sv = _block_topk(sims, c_ids, q_ids, k)
        return pd.DataFrame(
            {"query_id": qi, "neighbor_id": ni, "cosine_sim": sv}
        )

    scored = (
        q.groupBy("qc", "cc")
        .cogroup(c.groupBy("qc", "cc"))
        .applyInPandas(score_block, schema=out_schema)
        .filter(F.col("cosine_sim") >= F.lit(-1.0))  # drop -inf sentinels
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _lsh_buckets(
    corpus: DataFrame,
    n_tables: int,
    n_planes: int,
    id_col: str,
    vec_col: str,
) -> DataFrame | None:
    """Shared LSH bucket assignment: every vector lands in one
    `n_planes`-bit sign bucket per table (fixed-seed hyperplanes broadcast
    to executors; one Arrow matmul per batch). Returns
    (id, v, tbl, bucket) rows — n_tables per input row — or None for an
    empty corpus."""
    import numpy as np
    import pandas as pd

    rows = corpus.select(vec_col).limit(1).collect()  # bounded: one row
    if not rows:
        return None
    dim = len(rows[0][0])
    rng = np.random.default_rng(12345)
    H = rng.standard_normal((n_tables * n_planes, dim))
    spark = corpus.sparkSession
    bch = spark.sparkContext.broadcast(H)
    pw2 = np.array([1 << (n_planes - 1 - p) for p in range(n_planes)],
                   dtype=np.int64)
    bcp = spark.sparkContext.broadcast(pw2)

    def assign(batches):
        Hm = bch.value
        p2 = bcp.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            signs = (M @ Hm.T >= 0).astype(np.int64)
            signs = signs.reshape(len(ids), n_tables, n_planes)
            bkt = (signs * p2[None, None, :]).sum(axis=2)  # (n, n_tables)
            tbl = np.tile(np.arange(n_tables, dtype=np.int32), len(ids))
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_tables),
                    "v": [row for row in M for _ in range(n_tables)],
                    "tbl": tbl,
                    "bucket": bkt.ravel(),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        assign,
        schema=f"{id_col} long, v array<double>, tbl int, bucket long",
    )


def lsh_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_tables: int = 16,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs at scale: LSH bucket candidates +
    exact cosine threshold — the production sibling of the exact
    all-pairs `embedding_dup_pairs` oracle form. Returns
    (vec_i, vec_j, cosine_sim), vec_i < vec_j. Approximate only in
    RECALL (a pair missed by every table); every emitted pair carries its
    true exact cosine, so precision is exact.

    100 TB shape: candidates exist only within (table, bucket) groups —
    the quadratic work is bounded per bucket; vectors never cross bucket
    boundaries (grouped BLAS self-matmul); the cross-table dedup sees
    only (i, j, sim) triples."""
    import numpy as np
    import pandas as pd

    buckets = _lsh_buckets(corpus, n_tables, n_planes, id_col, vec_col)
    if buckets is None:
        return corpus.sparkSession.createDataFrame(
            [], "vec_i long, vec_j long, cosine_sim double"
        )

    out_schema = "vec_i long, vec_j long, cosine_sim double"

    def pairs_in_bucket(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"vec_i": [], "vec_j": [], "cosine_sim": []})
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        M = np.array(list(pdf["v"]), dtype=np.float64)
        nrm = np.linalg.norm(M, axis=1)
        sims = np.round((M @ M.T) / (nrm[:, None] * nrm[None, :]), round_digits)
        ii, jj = np.where(
            (sims >= threshold) & (ids[:, None] < ids[None, :])
        )
        return pd.DataFrame(
            {"vec_i": ids[ii], "vec_j": ids[jj], "cosine_sim": sims[ii, jj]}
        )

    cand = (
        buckets.groupBy("tbl", "bucket")
        .applyInPandas(pairs_in_bucket, schema=out_schema)
    )
    # a pair can collide in several tables — one row wins (sims identical)
    return cand.dropDuplicates(["vec_i", "vec_j"])


def lsh_bucket_topk(
    corpus: DataFrame,
    k: int = 5,
    n_tables: int = 16,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    target_occupancy: int = 128,
    n: int | None = None,
) -> DataFrame:
    """ANN via random-hyperplane LSH: `n_tables` independent tables of
    `n_planes`-bit sign buckets; brute-force verify within buckets; union
    tables; top-k per query. Approximate — recall grows with n_tables.
    Pass `n` (the corpus size) if the caller already knows it — the
    adaptive plane default otherwise pays one count() job, which on a
    DERIVED corpus plan re-materializes it once before the bucket build.

    n_planes defaults ADAPTIVELY: ceil(log2(n / target_occupancy)),
    floored at 4. A fixed plane count fixes the BUCKET count (2^planes
    per table), so occupancy grows with the corpus and the within-bucket
    self-matmul sums to ~n^2/2^planes per table — with 16 tables and 4
    planes that is literally full brute force, bucketed (the round-6 30x
    point measured local exponent ~1.5). Scaling planes with log(n) caps
    expected occupancy, making per-table work ~n * target_occupancy —
    linear at fixed occupancy. The recall trade is the standard one:
    more planes lose more moderate-similarity neighbors per table (the
    fixture recall floor is pinned in pytest; production tunes n_tables
    up as planes grow).

    The plane matrix is a fixed-seed numpy draw broadcast to executors —
    reproducible everywhere with no stored model (same property as the
    xxhash-derived planes this replaces, but assignment is ONE matmul per
    Arrow batch instead of n_tables*n_planes interpreted dot-product
    expressions per row, which dominated the operator).
    """
    import math

    if n_planes is None:
        if n is None:
            n = corpus.count()
        n_planes = max(4, math.ceil(math.log2(max(2, n / target_occupancy))))
    buckets = _lsh_buckets(corpus, n_tables, n_planes, id_col, vec_col)
    if buckets is None:  # empty corpus
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, rank bigint"
        )

    # Score each (table, bucket) group as ONE BLAS self-matmul via grouped
    # applyInPandas and emit only per-query bucket top-k triples — a
    # lossless prune under the global total order. The previous self-join
    # formulation shuffled 64-dim vectors on BOTH sides of every candidate
    # pair through a dropDuplicates (OOM at sf0.1); now vectors never
    # leave their bucket group and the dedup/rank stages see only
    # (query, neighbor, sim) triples. Scoring mirrors brute_force_topk_np
    # (same rounding, self-mask, tie order).
    out_schema = "query_id long, neighbor_id long, cosine_sim double"

    def score_bucket(key, pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine_sim": []}
            )
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        M = np.array(list(pdf["v"]), dtype=np.float64)
        nrm = np.linalg.norm(M, axis=1)
        sims = np.round((M @ M.T) / (nrm[:, None] * nrm[None, :]), round_digits)
        np.fill_diagonal(sims, -np.inf)
        # same-id dupes across rows (shouldn't occur) masked like brute force
        sims[ids[:, None] == ids[None, :]] = -np.inf
        kk = min(k, sims.shape[1] - 1)
        if kk <= 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine_sim": []}
            )
        qi, ni, sv = _block_topk(sims, ids, ids, kk)
        return pd.DataFrame(
            {"query_id": qi, "neighbor_id": ni, "cosine_sim": sv}
        )

    scored = (
        buckets.groupBy("tbl", "bucket")
        .applyInPandas(score_bucket, schema=out_schema)
        # the same pair surfaces from every table it collides in, with an
        # identical rounded sim — keep one so row_number ranks true top-k
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int | None = None,
    train_sample: int = 2048,
    lloyd_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF ANN: a sample-trained spherical-k-means coarse quantizer plus
    probed-cell search (the FAISS IVF-flat shape, expressed in DataFrames).

    Train: a deterministic sample (first `train_sample` ids) is collected and
    Lloyd-iterated driver-side — the standard IVF practice (quantizers train
    on ~1M sampled vectors even for billion-vector indexes); init is the
    first `n_cells` sample vectors, so the model is reproducible.

    Index + search (distributed): one Arrow `mapInPandas` pass assigns every
    vector to its nearest centroid AND computes its `n_probe` nearest cells
    as a query; candidates are the cell-equi-join of (query, probe_cell) with
    the cell-assigned corpus; exact cosine verify + per-query top-k window.

    100 TB shape: the corpus is *stored* partitioned by cell, so a probe is a
    partition-pruned scan instead of a shuffle, and the centroid matrix
    (n_cells x dim floats) is a broadcast literal. Approximate — recall grows
    with n_probe (n_probe == n_cells degenerates to exact brute force).

    n_cells defaults to ~sqrt(N) (the FAISS rule of thumb) so candidate
    work per query stays ~n_probe*sqrt(N) instead of a fixed fraction of
    the corpus — the property that makes IVF the scale path. n_probe
    defaults to min(16, max(4, n_cells//8)) — a genuinely BOUNDED probe
    count: round 4's n_cells//2 measured exponent 1.63 (every query
    scanned half the corpus), and round 5's uncapped n_cells//8 still
    grew as sqrt(n) (per-query candidates n/8 — the round-6 30x point
    measured that wall before the cap). Recall on structureless
    uniform vectors (the synthetic fixture, IVF's worst case) drops with
    a narrower probe; widen n_probe per corpus, or use
    `ivf_ann_exact`'s n_probe == n_cells pin for certification.
    """
    import math

    import numpy as np
    import pandas as pd

    if n_cells is None:
        n = corpus.count()
        n_cells = max(8, int(math.isqrt(max(1, n))))
    if n_probe is None:
        # A genuinely BOUNDED probe count. Round 5's `n_cells // 8`
        # claimed to be O(1)-in-n but grows as sqrt(n) (n_cells ~ sqrt n),
        # so per-query candidates were n_probe * n/n_cells = n/8 — a
        # fraction again; the round-6 30x point measured the wall
        # (ivf local 10->30x exponent ~1.2). The cap makes the default a
        # recall-tuned CONSTANT at scale (FAISS practice), per-query work
        # O(sqrt n); small corpora keep the old value (cap inactive below
        # n_cells=128, i.e. n ~ 16k).
        n_probe = min(16, max(4, n_cells // 8))
    n_probe = min(n_probe, n_cells)

    Xn = _collect_train_sample(corpus, id_col, vec_col, train_sample)
    if Xn is None:  # empty corpus -> typed empty result (LSH contract)
        return corpus.sparkSession.createDataFrame(
            [],
            "query_id long, neighbor_id long, cosine_sim double, rank bigint",
        )
    C = _train_spherical_kmeans(Xn, n_cells, lloyd_iters)

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(C)
    out_schema = (
        f"{id_col} long, v array<double>, cell int, probes array<int>"
    )

    def assign_and_probe(batches):
        C_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ C_.T
            # total order on (sim desc, cell asc) -> deterministic probes
            order = np.lexsort(
                (np.arange(C_.shape[0])[None, :].repeat(len(ids), 0), -sims),
                axis=1,
            )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "v": list(M),
                    "cell": order[:, 0].astype("int32"),
                    "probes": list(order[:, :n_probe].astype("int32")),
                }
            )

    # TWO consumers read this relation (the probe side and the cell side
    # of the equi-join): without persistence the full-corpus Arrow pass +
    # centroid matmul executes once per consumer — the same
    # multi-consumer cache rule pq_topk/ivfpq_topk already apply to their
    # encoded relations (CacheManager keys by canonicalized plan, so
    # re-invocations reuse one entry per distinct corpus/params)
    indexed = corpus.select(id_col, vec_col).mapInPandas(
        assign_and_probe, schema=out_schema
    ).persist()
    cells = indexed.select(F.col(id_col), F.col("v").alias("cv"), "cell")
    probes = indexed.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.explode("probes").alias("cell"),
    )

    # Score each probed cell as ONE BLAS matmul via cogrouped applyInPandas
    # (queries probing the cell x members of the cell) and emit only the
    # per-cell top-k under the global total order (sim desc, id asc) — a
    # lossless prune, so the final window sees k*n_probe rows per query
    # instead of the full candidate set. An expression-level cosine join
    # here ran interpreted per pair and dominated the operator (7.4 s ->
    # ~1 s at sf0.1). Scoring mirrors brute_force_topk_np exactly
    # (float64 matmul, same rounding, same self-mask and tie order).
    out_schema = "query_id long, neighbor_id long, cosine_sim double"

    def score_cell(key, qdf, mdf):
        import numpy as np
        import pandas as pd

        if len(qdf) == 0 or len(mdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine_sim": []}
            )
        q_ids = qdf["query_id"].to_numpy(dtype=np.int64)
        qm = np.array(list(qdf["qv"]), dtype=np.float64)
        qn = np.linalg.norm(qm, axis=1)
        c_ids = mdf[id_col].to_numpy(dtype=np.int64)
        cm = np.array(list(mdf["cv"]), dtype=np.float64)
        cn = np.linalg.norm(cm, axis=1)
        sims = np.round((qm @ cm.T) / (qn[:, None] * cn[None, :]), round_digits)
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf
        qi, ni, sv = _block_topk(sims, c_ids, q_ids, k)
        return pd.DataFrame(
            {"query_id": qi, "neighbor_id": ni, "cosine_sim": sv}
        )

    scored = (
        probes.groupBy("cell")
        .cogroup(cells.groupBy("cell"))
        .applyInPandas(score_cell, schema=out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def pq_topk(
    corpus: DataFrame,
    k: int = 5,
    m: int = 16,
    n_codes: int = 16,
    refine: int | None = 8,
    train_sample: int = 2048,
    lloyd_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Product-quantization ANN (the FAISS PQ + ADC shape) — the third
    100 TB scale path next to LSH and IVF, and the one that shrinks the
    INDEX: each vector is stored as m one-byte centroid codes (64 f32 dims
    -> 16 bytes here, 16x), and candidate scoring reads ONLY the codes.
    On uniform random vectors (PQ's worst case — no cluster structure)
    recall@3 measured 0.85 with the default 8x refine shortlist; clustered
    real embeddings quantize far better.

    Train: per-subspace k-means codebooks on a deterministic driver-side
    sample (first `train_sample` ids, first `n_codes` rows as init — the
    same reproducible regime as ivf_topk). Encode: one Arrow mapInPandas
    pass over unit-normalized vectors -> codes, plus each row's ADC lookup
    table (lut[j,c] = <q_sub_j, codebook[j][c]>, flattened m*n_codes) since
    every vector doubles as a query here.

    Search (ADC): a candidate's approximate cosine is a table-lookup sum
    over its codes, computed blockwise as one BLAS matmul of the query
    LUTs against a one-hot code-indicator matrix; the float vectors never
    enter the join. The ADC top (k*refine) per query are exact-cosine
    re-ranked to the final top-k (6dp round + id tiebreak, same contract as
    the other ANN operators).

    At 100 TB: compose with the IVF cell layout (probe-pruned code scan);
    queries broadcast; the codes relation is ~3% the bytes of the vectors,
    so the ADC pass is scan-bound on a table 30x smaller.
    """
    import numpy as np
    import pandas as pd

    X = _collect_train_sample(corpus, id_col, vec_col, train_sample)
    if X is None:  # empty corpus -> typed empty result (LSH contract)
        return corpus.sparkSession.createDataFrame(
            [],
            "query_id long, neighbor_id long, cosine_sim double, rank bigint",
        )
    d = X.shape[1]
    d_sub = d // m
    B = _train_pq_books(X, m, n_codes, lloyd_iters)  # (m, n_codes, d_sub)

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(B)
    out_schema = f"{id_col} long, v array<double>, nrm double, codes array<int>"

    def encode(batches):
        B_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            codes = np.empty((len(ids), m), dtype=np.int32)
            for j in range(m):
                S_ = Mn[:, j * d_sub : (j + 1) * d_sub]
                d2 = ((S_[:, None, :] - B_[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            # precomputed L2 norm for the exact re-rank. cumsum is a
            # strictly sequential left-to-right fold, so the value is
            # BIT-IDENTICAL to Spark's interpreted
            # aggregate(v, 0.0, (acc, x) -> acc + x*x) — the re-rank can
            # use dot/(qn*nn) without changing any rounded cosine
            nrm = np.sqrt(np.cumsum(M * M, axis=1)[:, -1])
            yield pd.DataFrame(
                {id_col: ids, "v": list(M), "nrm": nrm, "codes": list(codes)}
            )

    # The encoded relation is the PQ INDEX (codes + vector; LUTs are NOT
    # stored — each ADC block rebuilds them from the broadcast codebook,
    # so the index and every shuffle ship 64 doubles/row instead of
    # 64+256). Four consumers read it (ADC query side, ADC code side,
    # re-rank query vectors, re-rank neighbor vectors); without
    # persistence the Arrow encode pass re-executes once per consumer —
    # at 100 TB the index is materialized to storage exactly once by
    # construction, so the local analog is a cache. Re-invocations do NOT
    # accrue copies: Spark's CacheManager keys cached data by canonicalized
    # plan, so rebuilding the same index (same corpus/params) reuses the
    # existing entry; the session holds at most one cache per distinct
    # corpus until it ends.
    encoded = (
        corpus.select(id_col, vec_col)
        .mapInPandas(encode, schema=out_schema)
        .persist()
    )

    # ADC scan, blocked: the query side is the whole corpus in the
    # self-ANN registered form, so it must NOT be collected to the
    # driver. Same 2-D block cogroup as brute_force_topk_blocked:
    # query VECTORS hash into NQ chunks (LUTs are rebuilt in-block from
    # the broadcast codebook — 4x fewer shuffle bytes than shipping
    # precomputed LUTs), codes into NC chunks; each (q_chunk, c_chunk) block is one Arrow call doing m
    # vectorized gather-adds and emitting its per-query ADC top (k*refine)
    # under the total order (adc desc, id asc) — a lossless prune for the
    # global shortlist. Codes-only scan property unchanged: float vectors
    # never enter the scoring join; the codes side shuffled NQ times is
    # ~3% of vector bytes per replication. (An earlier broadcast-join +
    # interpreted HOF lookup-sum per pair dominated the operator: 8.3 s ->
    # ~1 s at sf0.1.)
    import math

    # refine=None -> exhaustive shortlist: every candidate survives the ADC
    # prune, so the exact re-rank degenerates to brute force (the oracle
    # certification mode; corpus-size-independent)
    kk_short = (k * refine) if refine is not None else (1 << 31)
    # block granularity: scores matrix per block is chunk_rows^2 doubles
    # (~512 MB at 8192 — sized for the 100-200 MB/task sweet spot after
    # the -inf self-mask; smaller chunks cost extra python-worker rounds,
    # which dominated at local scale: 9 blocks of 2048 ran 1.5x slower
    # than 1 block of 8192 on the sf0.1 corpus)
    chunk_rows = 8192
    # counting the persisted index (not the raw corpus) sizes the chunk
    # grid AND materializes the cache in the same single pass
    n_rows = encoded.count()
    nq_chunks = max(1, math.ceil(n_rows / chunk_rows))
    nc_chunks = nq_chunks

    qside = (
        encoded.select(F.col(id_col).alias("query_id"), "v")
        .withColumn(
            "qc", F.pmod(F.xxhash64("query_id"), F.lit(nq_chunks)).cast("int")
        )
        .withColumn(
            "cc",
            F.explode(F.sequence(F.lit(0), F.lit(nc_chunks - 1)).cast("array<int>")),
        )
    )
    cside = (
        encoded.select(F.col(id_col).alias("neighbor_id"), "codes")
        .withColumn(
            "cc", F.pmod(F.xxhash64("neighbor_id"), F.lit(nc_chunks)).cast("int")
        )
        .withColumn(
            "qc",
            F.explode(F.sequence(F.lit(0), F.lit(nq_chunks - 1)).cast("array<int>")),
        )
    )

    def adc_block(key, qdf, cdf):
        import numpy as np
        import pandas as pd

        if len(qdf) == 0 or len(cdf) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "adc": []})
        q_ids_ = qdf["query_id"].to_numpy(dtype=np.int64)
        B_ = bc.value
        Q = np.array(list(qdf["v"]), dtype=np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        LUT = np.empty((len(q_ids_), m * n_codes), dtype=np.float64)
        for j in range(m):
            LUT[:, j * n_codes : (j + 1) * n_codes] = (
                Qn[:, j * d_sub : (j + 1) * d_sub] @ B_[j].T
            )
        c_ids = cdf["neighbor_id"].to_numpy(dtype=np.int64)
        codes = np.array(list(cdf["codes"]), dtype=np.int64)
        # ADC sum as ONE BLAS matmul against a one-hot code-indicator
        # matrix: scores[q,i] = sum_j LUT[q, j*n_codes + codes[i,j]].
        # The per-subspace fancy-indexing gather this replaces was the
        # block's dominant cost (m random-access gathers of nq*nc cells
        # each — 1.2 s at 2000^2 vs ~60 ms for the dense matmul).
        # float32 throughout: ADC scores only ORDER the shortlist (the
        # final cosines come from the exact float64 re-rank), so the
        # standard FAISS single-precision ADC is free accuracy-wise —
        # and 2x the BLAS throughput. Deterministic: same input bits
        # give the same f32 scores; boundary ties go through
        # _block_topk's exact tie path. Exact mode (refine=None) is
        # unaffected by construction — every candidate survives the cut.
        IND = np.zeros((m * n_codes, len(c_ids)), dtype=np.float32)
        cols = np.arange(len(c_ids))
        for j in range(m):
            IND[j * n_codes + codes[:, j], cols] = 1.0
        scores = LUT.astype(np.float32) @ IND
        scores[q_ids_[:, None] == c_ids[None, :]] = -np.inf
        qi, ni, sv = _block_topk(scores, c_ids, q_ids_, kk_short)
        return pd.DataFrame(
            {"query_id": qi, "neighbor_id": ni, "adc": sv}
        )

    shortcand = (
        qside.groupBy("qc", "cc")
        .cogroup(cside.groupBy("qc", "cc"))
        .applyInPandas(
            adc_block, schema="query_id long, neighbor_id long, adc double"
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    # Re-rank joins are plain shuffle joins: qvec/nvec are the CORPUS
    # vector relation in the self-ANN form, so a broadcast hint here would
    # re-introduce the unbounded driver materialization the blocked ADC
    # scan exists to avoid (AQE still downgrades to broadcast on its own
    # when the relation is genuinely small).
    qvec = encoded.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    if nc_chunks == 1:
        # a single code chunk means each block's local top-kk IS the
        # global ADC shortlist — the merge window would be a pure
        # pass-through costing one shuffle + sort
        ranked_short = shortcand
    else:
        ranked_short = shortcand.withColumn(
            "arank", F.row_number().over(w_adc)
        ).filter(F.col("arank") <= kk_short)
    short = (
        ranked_short
        .join(qvec, "query_id")
        .select("query_id", "qv", "qn", "neighbor_id")
    )
    nvec = encoded.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nn"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    # exact cosine with the norms PRECOMPUTED at encode time (bit-equal
    # to the _norm fold) — the interpreted HOF work per re-rank row drops
    # from three array folds to one dot product
    return (
        short.join(nvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")),
                round_digits,
            ).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    cluster_col: str = "label",
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each cluster, a vector
    is a duplicate of the SMALLEST-id earlier vector whose cosine clears
    `threshold`; cluster keepers have dup_of NULL. Returns
    (vec_id, cluster, dup_of).

    The cluster column bounds the quadratic pair work to O(sum c_i^2)
    instead of O(n^2) — the whole point of clustering before semantic
    dedup. Here the corpus's own cluster assignment is used (at 100 TB the
    IVF coarse quantizer's `cell` column from `ivf_topk`'s index pass is
    the natural input, and the corpus is STORED partitioned by it, so the
    self-join below is partition-local with no shuffle beyond the one on
    the cluster key). Cosine is the same 6dp-rounded JVM expression as
    `embedding_dup_pairs` — no Python in the hot path.
    """
    e = corpus.select(
        F.col(id_col),
        F.col(cluster_col).alias("cluster"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("n", _norm(F.col("v")))
    a = e.select(
        F.col(id_col).alias("vec_id_a"),
        "cluster",
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = e.select(
        F.col(id_col).alias("vec_id_b"),
        F.col("cluster").alias("cluster_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("vec_id_b") < F.col("vec_id_a")),
            "left",
        )
        .withColumn("cos", F.round(dot / (F.col("na") * F.col("nb")), round_digits))
        .withColumn(
            "cand", F.when(F.col("cos") >= threshold, F.col("vec_id_b"))
        )
    )
    return pairs.groupBy(
        F.col("vec_id_a").alias(id_col), "cluster"
    ).agg(F.min("cand").alias("dup_of"))


def semantic_dedup_scaled(
    corpus: DataFrame,
    threshold: float = 0.35,
    target_cell_rows: int = 256,
    train_sample: int | None = None,
    lloyd_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    n: int | None = None,
) -> DataFrame:
    """SemDeDup at corpus scale: `semantic_dedup`'s keeper rule, but the
    clusters come from a sample-trained spherical k-means whose cell
    COUNT scales with the corpus (n_cells ~= n / target_cell_rows). That
    is the property the fixed-cluster form lacks: with clusters
    proportional to n (the label column, or any fixed-k clustering),
    within-cluster pair work is Th(n^2) no matter how it is expressed —
    the round-6 30x curve measured exactly that wall on the pair-emitting
    LSH form (output itself n^2: 3.8k/36k/404k/3.6M pairs at 1/3/10/30x).
    Scaling k with n caps expected occupancy at target_cell_rows, so
    total pair work is ~n * target_cell_rows (linear at fixed occupancy)
    and the output is exactly ONE row per vector: (vec_id, cell, dup_of)
    with dup_of = smallest-id earlier same-cell vector whose cosine
    clears `threshold`, NULL for keepers.

    Approximate in RECALL only (a near-dup pair split across a cell
    boundary is missed — the standard SemDeDup trade, pinned against the
    label-cluster exact form in pytest); every emitted dup_of is verified
    by its true cosine, so precision is exact. Skew note: a pathological
    corpus could still overload one cell; production re-trains with more
    Lloyd iterations or recursively splits hot cells — at the fixture
    scales the measured occupancy tracks the target.

    100 TB shape: quantizer trains on a bounded driver-side sample (IVF
    practice); one Arrow pass assigns cells (map-only); ONE shuffle on
    the cell key; per-cell keeper selection is a bounded BLAS self-matmul
    inside applyInPandas. Store the corpus partitioned by cell (as
    build_ivf_index does) and even that shuffle disappears."""
    if n is None:  # pass n= (catalog/footer stats) to skip the count job
        n = corpus.count()
    n_cells = min(4096, max(16, n // target_cell_rows))
    if train_sample is None:
        train_sample = min(32768, max(2048, 8 * n_cells))

    Xn = _collect_train_sample(corpus, id_col, vec_col, train_sample)
    if Xn is None:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, cell int, dup_of long"
        )
    C = _train_spherical_kmeans(Xn, n_cells, lloyd_iters)
    return semantic_dedup_with_centroids(
        corpus, C, threshold, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    )


def semantic_dedup_assign(
    corpus: DataFrame,
    C,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bc=None,
) -> DataFrame:
    """The assign stage of the scaled SemDeDup under FIXED centroids C
    (numpy array): one Arrow map-only pass -> (id, v array<double>,
    cell). Factored out so the incremental maintainer
    (streaming/semdedup_stream.py) assigns micro-batches under the
    identical numerics as the batch operator. Pass `bc` (an existing
    Broadcast of C) to reuse one broadcast across micro-batches — a
    3 s-tick daemon must not register a fresh broadcast per batch."""
    import numpy as np
    import pandas as pd

    if bc is None:
        bc = corpus.sparkSession.sparkContext.broadcast(np.asarray(C))

    def assign(batches):
        C_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "v": list(M),
                    "cell": (Mn @ C_.T).argmax(axis=1).astype("int32"),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, v array<double>, cell int"
    )


def semantic_dedup_keep(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """The keeper stage of the scaled SemDeDup over an (id, v, cell)
    relation: per-cell bounded BLAS self-matmul, dup_of = smallest-id
    earlier same-cell vector whose 6dp cosine clears `threshold`.
    Factored out (see semantic_dedup_assign) — the stream maintainer
    recomputes exactly this over the cells a micro-batch touches."""
    import numpy as np
    import pandas as pd

    out_schema = f"{id_col} long, cell int, dup_of long"

    def keeper_in_cell(key, pdf):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)  # keeper rule is id-ordered
        ids_s = ids[order]
        M = np.array(list(pdf["v"]), dtype=np.float64)[order]
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = np.round(Mn @ Mn.T, round_digits)
        ok = np.tril(S >= threshold, k=-1)  # strictly-earlier ids only
        has = ok.any(axis=1)
        # argmax returns the FIRST True column — the smallest earlier id,
        # because rows/cols are id-sorted
        first = ok.argmax(axis=1)
        dup = np.where(has, ids_s[first], 0)
        return pd.DataFrame(
            {
                id_col: ids_s,
                "cell": np.full(len(ids_s), key[0], dtype="int32"),
                "dup_of": pd.array(
                    [int(d) if h else None for d, h in zip(dup, has)],
                    dtype="Int64",
                ),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        keeper_in_cell, schema=out_schema
    )


def semantic_dedup_with_centroids(
    corpus: DataFrame,
    C,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Scaled SemDeDup under a FIXED quantizer: assign + keeper. This is
    the batch-reference semantics the incremental maintainer converges
    to (its parity tests call exactly this with the index's persisted
    centroids)."""
    return semantic_dedup_keep(
        semantic_dedup_assign(corpus, C, id_col=id_col, vec_col=vec_col),
        threshold, id_col=id_col, round_digits=round_digits,
    )


# --- persisted IVF index: cell-partitioned storage + pruned probes ---------


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    train_sample: int = 2048,
    lloyd_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index the `ivf_topk` docstring promises: the
    corpus written to parquet PARTITIONED BY its coarse-quantizer cell,
    with the (tiny) centroid matrix stored alongside as JSON. A probe
    then reads only its cells' directories — partition pruning at the
    scan, no shuffle — which is the property that makes IVF the serving
    path at 100 TB.

    Training matches `ivf_topk` (deterministic sample, spherical Lloyd);
    assignment is one Arrow pass; the write is one `partitionBy("cell")`.
    """
    import json
    import os

    import numpy as np
    import pandas as pd

    X = _collect_train_sample(corpus, id_col, vec_col, train_sample)
    if X is None:
        raise ValueError("cannot build an index on an empty corpus")
    C = _train_spherical_kmeans(X, n_cells, lloyd_iters)

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def assign_cells(batches):
        C_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            pdf = pdf.copy()
            pdf["cell"] = np.argmax(Mn @ C_.T, axis=1).astype("int32")
            yield pdf

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign_cells, schema=f"{id_col} long, {vec_col} array<double>, cell int"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(C.tolist(), f)


def ivf_probe_topk(
    spark,
    index_path: str,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    exclude_self: bool = False,
) -> DataFrame:
    """Point-lookup search over a persisted IVF index: for each query
    vector pick its `n_probe` nearest centroids (driver-side — the
    centroid matrix is n_cells x dim floats, KBs), then scan ONLY those
    cells' partitions (the `cell` filter reaches the parquet scan as a
    PartitionFilter — verified in tests) and rank exact cosines.

    The query set is an explicit small list BY CONTRACT (this is the
    serving-path API: a user query, a dedup probe); corpus-sized query
    sets belong to the batch operators (`ivf_topk`,
    `brute_force_topk_blocked`).

    External query ids are unrelated to corpus ids by default
    (`exclude_self=False`, the same contract as `ivfpq_probe_topk`) —
    an unconditional query_id != vec_id filter would silently drop a
    legitimate neighbor on a coincidental id collision. Pass
    `exclude_self=True` for self-ANN harnesses where query ids ARE
    corpus ids."""
    import json
    import os

    import numpy as np

    with open(os.path.join(index_path, "_centroids.json")) as f:
        C = np.array(json.load(f), dtype=np.float64)
    qids = np.array([q[0] for q in query_vectors], dtype=np.int64)
    Q = np.array([q[1] for q in query_vectors], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    order = np.argsort(-(Qn @ C.T), axis=1, kind="stable")
    probes = order[:, :n_probe]
    cells = sorted({int(c) for row in probes for c in row})

    idx = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v], [int(c) for c in p])
         for i, v, p in zip(qids, Q, probes)],
        f"query_id long, qv array<double>, probe_cells array<int>",
    )
    scored = (
        F.broadcast(qdf)  # genuinely small by contract
        .join(idx, F.array_contains(F.col("probe_cells"), idx["cell"]))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine(F.col("qv"), F.col(vec_col).cast("array<double>")),
                round_digits,
            ).alias("cosine_sim"),
        )
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- composed IVF + PQ (the production ANN shape) ---------------------------


def ivfpq_topk(
    corpus: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int | None = None,
    m: int = 16,
    n_codes: int = 16,
    refine: int | None = 8,
    train_sample: int = 2048,
    lloyd_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF + PQ composed into one index — the FAISS IVFADC shape every
    production ANN system runs at scale: the coarse quantizer prunes the
    corpus to `n_probe` cells per query, the ADC scan ranks ONLY those
    cells' PQ codes (16 bytes/vector here), and the shortlist is
    exact-cosine re-ranked.

    One Arrow pass builds the whole index row (cell, probe list, codes,
    norm); candidates come from a cell-cogrouped ADC block (query LUTs
    rebuilt in-block from the broadcast codebook; float vectors never
    enter the candidate side — the scan reads codes only); the re-rank
    tail is `pq_topk`'s (vector joins + one interpreted dot, norms
    precomputed).

    Codes are RESIDUAL-encoded (x_n - centroid[cell], the production
    IVFADC refinement): residual norms are a fraction of vector norms,
    so the same codebook budget quantizes far tighter. The ADC score
    decomposes exactly as q·centroid[cell] (one per-query scalar per
    block) + the residual table-lookup sum, which keeps scores
    comparable ACROSS cells for the shortlist merge.

    Exact-mode certification: n_probe == n_cells AND refine=None makes
    both prunes lossless, so the brute-force oracle hash-certifies the
    ENTIRE composed machinery (quantizer training, assign+probe+encode
    pass, per-cell ADC, shortlist merge, re-rank) — `ivfpq_ann_exact` in
    the registry. The production config is recall-gated in pytest and
    reported by `ann_recall_report`.

    At 100 TB: cells are storage partitions (see build_ivfpq_index), the
    codes relation is ~3% of vector bytes, and per-query work is
    n_probe/n_cells of the PQ scan — the multiplicative composition of
    the two prunes.
    """
    import math

    import numpy as np
    import pandas as pd

    if n_cells is None:
        n = corpus.count()
        n_cells = max(8, int(math.isqrt(max(1, n))))
    if n_probe is None:
        # A genuinely BOUNDED probe count (see ivf_topk): round 5's
        # `n_cells // 8` grew as sqrt(n) despite its O(1) claim, making
        # per-query candidates n/8 — the round-6 30x point measured the
        # wall here too (ivfpq local 10->30x exponent ~2 with the probe
        # growth compounding the per-cell k*refine shortlists). With the
        # cap, per-query candidate work is n_probe * n/n_cells =
        # O(sqrt n), total O(n^1.5) for the self-ANN benchmark shape —
        # the intrinsic n-queries-times-per-query product; the SERVING
        # per-query scaling is the streaming-index probe leg (measured
        # 0.10 in SCALE_CURVE stream_results). Round 4's n_cells//2
        # default measured exponent 1.63 before any of this.
        n_probe = min(16, max(4, n_cells // 8))
    n_probe = min(n_probe, n_cells)
    kk_short = (k * refine) if refine is not None else (1 << 31)

    X = _collect_train_sample(corpus, id_col, vec_col, train_sample)
    if X is None:  # empty corpus -> typed empty result (LSH contract)
        return corpus.sparkSession.createDataFrame(
            [],
            "query_id long, neighbor_id long, cosine_sim double, rank bigint",
        )
    d = X.shape[1]
    d_sub = d // m
    C = _train_spherical_kmeans(X, n_cells, lloyd_iters)
    # PQ books train on the sample's RESIDUALS under the trained coarse
    # quantizer — the distribution the index actually encodes
    R = X - C[np.argmax(X @ C.T, axis=1)]
    B = _train_pq_books(R, m, n_codes, lloyd_iters)

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((C, B))
    out_schema = (
        f"{id_col} long, v array<double>, nrm double, cell int, "
        "probes array<int>, codes array<int>"
    )

    def assign_encode(batches):
        C_, B_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ C_.T
            order = np.lexsort(
                (np.arange(C_.shape[0])[None, :].repeat(len(ids), 0), -sims),
                axis=1,
            )
            cell = order[:, 0]
            Rn = Mn - C_[cell]  # residual under the assigned centroid
            codes = np.empty((len(ids), m), dtype=np.int32)
            for j in range(m):
                S_ = Rn[:, j * d_sub : (j + 1) * d_sub]
                d2 = ((S_[:, None, :] - B_[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "v": list(M),
                    # sequential fold — bit-equal to the _norm expression
                    "nrm": np.sqrt(np.cumsum(M * M, axis=1)[:, -1]),
                    "cell": cell.astype("int32"),
                    "probes": list(order[:, :n_probe].astype("int32")),
                    "codes": list(codes),
                }
            )

    indexed = (
        corpus.select(id_col, vec_col)
        .mapInPandas(assign_encode, schema=out_schema)
        .persist()
    )
    indexed.count()  # materialize once for the multi-consumer plan

    cells = indexed.select(
        F.col(id_col).alias("neighbor_id"), "codes", "cell"
    )
    probes = indexed.select(
        F.col(id_col).alias("query_id"),
        # the probe fan-out replicates every query vector n_probe times
        # through the shuffle; f32 halves those bytes and only feeds the
        # ADC LUT (already f32 BLAS) — the exact re-rank reads the f64
        # vectors from `indexed`, so final cosines are unchanged
        F.col("v").cast("array<float>").alias("qv"),
        F.explode("probes").alias("cell"),
    )

    def adc_cell(key, qdf, cdf):
        import numpy as np
        import pandas as pd

        if len(qdf) == 0 or len(cdf) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "adc": []})
        C_, B_ = bc.value
        q_ids = qdf["query_id"].to_numpy(dtype=np.int64)
        Q = np.array(list(qdf["qv"]), dtype=np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        LUT = np.empty((len(q_ids), m * n_codes), dtype=np.float64)
        for j in range(m):
            LUT[:, j * n_codes : (j + 1) * n_codes] = (
                Qn[:, j * d_sub : (j + 1) * d_sub] @ B_[j].T
            )
        c_ids = cdf["neighbor_id"].to_numpy(dtype=np.int64)
        codes = np.array(list(cdf["codes"]), dtype=np.int64)
        # same f32 one-hot BLAS ADC as pq_topk's adc_block
        IND = np.zeros((m * n_codes, len(c_ids)), dtype=np.float32)
        cols = np.arange(len(c_ids))
        for j in range(m):
            IND[j * n_codes + codes[:, j], cols] = 1.0
        scores = LUT.astype(np.float32) @ IND
        # residual decomposition: q·cand ≈ q·centroid[cell] + q·residual.
        # The block IS one cell (the cogroup key), so the centroid term
        # is one scalar per query — added here to keep ADC scores
        # comparable across cells at the shortlist merge
        qoff = (Qn @ C_[int(key[0])]).astype(np.float32)
        scores += qoff[:, None]
        scores[q_ids[:, None] == c_ids[None, :]] = -np.inf
        qi, ni, sv = _block_topk(scores, c_ids, q_ids, kk_short)
        return pd.DataFrame({"query_id": qi, "neighbor_id": ni, "adc": sv})

    shortcand = (
        probes.groupBy("cell")
        .cogroup(cells.groupBy("cell"))
        .applyInPandas(
            adc_cell, schema="query_id long, neighbor_id long, adc double"
        )
    )
    # merge the per-cell shortlists to the global k*refine (each neighbor
    # appears once — it lives in exactly one cell — so this is a rank
    # cut, not a dedup)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    ranked_short = shortcand.withColumn(
        "arank", F.row_number().over(w_adc)
    ).filter(F.col("arank") <= kk_short)

    qvec = indexed.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    nvec = indexed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nn"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        ranked_short.join(qvec, "query_id")
        .join(nvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")),
                round_digits,
            ).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 16,
    n_codes: int = 16,
    train_sample: int = 2048,
    lloyd_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the composed IVF+PQ index: rows (id, vector, norm,
    codes) written PARTITIONED BY coarse cell, with the centroid matrix
    and PQ codebooks as a JSON sidecar. A probe reads only its cells'
    directories (partition pruning at the scan), ADC-ranks their codes,
    and re-ranks exactly from the vector column of the same pruned rows
    — the serving layout `ivfpq_topk`'s docstring promises. At true
    scale the vector column can live in a separate colder relation; here
    it shares the row so the exact re-rank is one pruned scan away."""
    import json
    import os

    import numpy as np
    import pandas as pd

    X = _collect_train_sample(corpus, id_col, vec_col, train_sample)
    if X is None:
        raise ValueError("cannot build an index on an empty corpus")
    d = X.shape[1]
    d_sub = d // m
    C = _train_spherical_kmeans(X, n_cells, lloyd_iters)
    # books train on residuals — the distribution the index encodes
    B = _train_pq_books(
        X - C[np.argmax(X @ C.T, axis=1)], m, n_codes, lloyd_iters
    )

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((C, B))

    def assign_encode(batches):
        C_, B_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            cell = np.argmax(Mn @ C_.T, axis=1)
            Rn = Mn - C_[cell]  # residual encoding (see ivfpq_topk)
            codes = np.empty((len(ids), m), dtype=np.int32)
            for j in range(m):
                S_ = Rn[:, j * d_sub : (j + 1) * d_sub]
                d2 = ((S_[:, None, :] - B_[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "v": list(M),
                    "nrm": np.sqrt(np.cumsum(M * M, axis=1)[:, -1]),
                    "codes": list(codes),
                    "cell": cell.astype("int32"),
                }
            )

    out_schema = (
        f"{id_col} long, v array<double>, nrm double, "
        "codes array<int>, cell int"
    )
    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign_encode, schema=out_schema
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_ivfpq_model.json"), "w") as f:
        json.dump({"centroids": C.tolist(), "books": B.tolist()}, f)


def ivfpq_probe_topk(
    spark,
    index_path: str,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 4,
    refine: int | None = 8,
    id_col: str = "vec_id",
    round_digits: int = 6,
    exclude_self: bool = False,
) -> DataFrame:
    """Point-lookup search over a persisted IVF+PQ index: probe cells
    chosen driver-side (centroids are KBs), a codes-only ADC pass over
    ONLY those cells' partitions (the cell filter reaches the parquet
    scan as a PartitionFilter; column pruning keeps the vector column
    out of this scan), then exact re-rank of the k*refine shortlist
    against the same pruned rows' vectors.

    The query set is an explicit small list BY CONTRACT (serving path);
    corpus-sized query sets belong to `ivfpq_topk`. External query ids
    are unrelated to corpus ids by default (`exclude_self=False`) — pass
    True in self-join harnesses where they share the namespace."""
    import json
    import os

    import numpy as np

    with open(os.path.join(index_path, "_ivfpq_model.json")) as f:
        model = json.load(f)
    C = np.array(model["centroids"], dtype=np.float64)
    B = np.array(model["books"], dtype=np.float64)
    return ivfpq_probe_frame(
        spark,
        lambda cells: spark.read.parquet(index_path).filter(
            F.col("cell").isin(cells)
        ),
        C, B, query_vectors, k=k, n_probe=n_probe, refine=refine,
        id_col=id_col, round_digits=round_digits, exclude_self=exclude_self,
    )


def ivfpq_probe_frame(
    spark,
    get_pruned,
    C,
    B,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 4,
    refine: int | None = 8,
    id_col: str = "vec_id",
    round_digits: int = 6,
    exclude_self: bool = False,
) -> DataFrame:
    """Shared IVF+PQ probe core over any (id, v, nrm, codes, cell)
    relation: `get_pruned(cells)` supplies the candidate DataFrame
    restricted to the probed cells (a partition-pruned parquet read for
    the persisted index; a batch-union filter for the streaming index).
    Codes-only ADC with the residual q·centroid offset, shortlist
    window, exact re-rank against the pruned rows' vectors."""
    import numpy as np

    m, n_codes, d_sub = B.shape
    n_probe = min(n_probe, C.shape[0])
    kk_short = (k * refine) if refine is not None else (1 << 31)

    qids = np.array([q[0] for q in query_vectors], dtype=np.int64)
    Q = np.array([q[1] for q in query_vectors], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    order = np.argsort(-(Qn @ C.T), axis=1, kind="stable")
    probes = order[:, :n_probe]
    cells = sorted({int(c) for row in probes for c in row})
    LUT = np.empty((len(qids), m * n_codes), dtype=np.float64)
    for j in range(m):
        LUT[:, j * n_codes : (j + 1) * n_codes] = (
            Qn[:, j * d_sub : (j + 1) * d_sub] @ B[j].T
        )
    # per-query probe-cell membership rides next to the LUTs so the ADC
    # pass scores a candidate only for queries that probed ITS cell;
    # QC carries the q·centroid term of the residual decomposition
    probe_sets = [set(int(c) for c in row) for row in probes]
    QC = Qn @ C.T  # (nq, n_cells)
    bc = spark.sparkContext.broadcast((qids, LUT, probe_sets, QC))
    excl = exclude_self

    pruned = get_pruned(cells)

    def adc_scan(batches):
        import numpy as np
        import pandas as pd

        q_ids, LUT_, psets, QC_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_cell = pdf["cell"].to_numpy(dtype=np.int64)
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            IND = np.zeros((LUT_.shape[1], len(c_ids)), dtype=np.float32)
            cols = np.arange(len(c_ids))
            for j in range(codes.shape[1]):
                IND[j * (LUT_.shape[1] // codes.shape[1]) + codes[:, j], cols] = 1.0
            scores = LUT_.astype(np.float32) @ IND
            # residual decomposition: add each candidate's q·centroid term
            scores += QC_[:, c_cell].astype(np.float32)
            # mask candidates whose cell this query did not probe
            for qi_, ps in enumerate(psets):
                mask = ~np.isin(c_cell, list(ps))
                scores[qi_, mask] = -np.inf
            if excl:
                scores[q_ids[:, None] == c_ids[None, :]] = -np.inf
            qi, ni, sv = _block_topk(scores, c_ids, q_ids, kk_short)
            yield pd.DataFrame(
                {"query_id": qi, "neighbor_id": ni, "adc": sv}
            )

    shortcand = pruned.select(id_col, "cell", "codes").mapInPandas(
        adc_scan, schema="query_id long, neighbor_id long, adc double"
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    ranked_short = shortcand.withColumn(
        "arank", F.row_number().over(w_adc)
    ).filter(F.col("arank") <= kk_short)

    # exact re-rank: neighbor vectors from the SAME pruned partitions;
    # query vectors/norms are driver-known literals (small by contract).
    # qn uses the sequential-fold norm for bit-parity with the stored nrm
    qn = np.sqrt(np.cumsum(Q * Q, axis=1)[:, -1])
    qdf = spark.createDataFrame(
        [
            (int(i), [float(x) for x in v], float(nv))
            for i, v, nv in zip(qids, Q, qn)
        ],
        "query_id long, qv array<double>, qn double",
    )
    nvec = pruned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nn"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        ranked_short.join(F.broadcast(qdf), "query_id")
        .join(nvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")),
                round_digits,
            ).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_sim",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- scalar quantization (SQ8) ---------------------------------------------


def sq8_dequantized(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension 8-bit scalar quantization, immediately dequantized:
    x -> mn_i + round((x - mn_i)/(mx_i - mn_i) * 255) * (mx_i - mn_i)/255.

    The fourth index-compression family next to PQ (FAISS SQ8): 4x
    smaller vectors with near-exact recall on most embedding
    distributions, and — unlike PQ/LSH/IVF — the whole transform is a
    deterministic closed-form expression, so the DOWNSTREAM similarity
    search is cross-engine certifiable end-to-end (the driver gate runs
    it, not just a recall bound).

    The per-dim min/max relation is dim-sized; it is collected to the
    driver (bounded, like the IVF/PQ training samples) and applied as
    literal arrays inside one `transform` expression — the alternative
    (join stats back + rebuild arrays by position) costs a corpus-sized
    shuffle for identical values.
    """
    dim_stats = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .collect()
    )
    mn = {r.pos: r.mn for r in dim_stats}
    mx = {r.pos: r.mx for r in dim_stats}
    dim = len(dim_stats)
    mn_arr = F.array(*[F.lit(mn[i]) for i in range(dim)])
    mx_arr = F.array(*[F.lit(mx[i]) for i in range(dim)])
    deq = F.transform(
        F.col(vec_col),
        lambda x, i: F.when(
            F.element_at(mx_arr, i + 1) > F.element_at(mn_arr, i + 1),
            F.element_at(mn_arr, i + 1)
            + F.round(
                (x.cast("double") - F.element_at(mn_arr, i + 1))
                / (F.element_at(mx_arr, i + 1) - F.element_at(mn_arr, i + 1))
                * F.lit(255.0),
                0,
            )
            * (F.element_at(mx_arr, i + 1) - F.element_at(mn_arr, i + 1))
            / F.lit(255.0),
        ).otherwise(x.cast("double")),
    )
    return corpus.select(F.col(id_col), deq.alias(vec_col))


def sq8_topk(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exhaustive cosine top-k over SQ8-dequantized vectors — the same
    blocked no-collect dataflow as the exact baseline, running on the
    compressed representation (the serving shape: codes scan 4x less).
    Fully oracle-gated because the quantizer is closed-form."""
    return brute_force_topk_blocked(
        sq8_dequantized(corpus, id_col, vec_col), k=k,
        id_col=id_col, vec_col=vec_col,
    )


def sq8_oracle_sql(k: int = 5) -> str:
    return f"""
    WITH ex AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    st AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos),
    dq AS (
      SELECT vec_id, pos,
             CASE WHEN mx > mn
                  THEN mn + ROUND((x - mn) / (mx - mn) * 255.0, 0)
                           * (mx - mn) / 255.0
                  ELSE x END AS xq
      FROM ex JOIN st USING (pos)),
    vecs AS (
      SELECT vec_id, list(xq ORDER BY pos) AS v FROM dq GROUP BY vec_id),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
      FROM vecs a JOIN vecs b ON a.vec_id <> b.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= {k}
    """
