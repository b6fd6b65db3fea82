"""Registry entries for the model-in-the-loop curation operators
(operators/ml.py, operators/retrieval.py, operators/graph.py).

No reference analog (BASELINE.json north star: LLM-training-data
pipeline). All four are oracle-gated — including the two iterative
algorithms, which follow the clustering.py pattern of exact-decimal
arithmetic so a generated DuckDB oracle replays the identical loop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import graph as G
from ..operators import ml as M
from ..operators import retrieval as RT
from ..tables import table
from .registry import register


@register(
    "bm25_topk",
    RT.bm25_oracle_sql(),
    tags=("llm", "retrieval", "bm25", "topk"),
    bench=True,
)
def q_bm25_topk(spark, sf_dir):
    """Lexical retrieval: BM25 top-10 per probe query over the inverted
    index. One corpus-sized shuffle (the postings build); scoring prunes
    to query-term postings via broadcast semi-join."""
    return RT.bm25_topk(table(spark, sf_dir, "documents"))


@register(
    "pagerank_trade_graph",
    G.pagerank_oracle_sql(),
    tags=("graph", "pagerank", "iterative"),
)
def q_pagerank(spark, sf_dir):
    """3 damped power iterations over the customer<->supplier trade graph
    (broadcast rank state by default; co-partitioned shuffle form for
    billion-node graphs), unrolled into one plan; exact-decimal update
    rule -> replayable oracle. Like `kmeans_clusters`, this is a
    certification query (multi-superstep latency floor ~5 s at sf0.1 is
    scheduling overhead, not data volume), so it runs in the sweep and
    the correctness gate but not the headline bench."""
    return G.pagerank(
        G.trade_edges(
            table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
        )
    )


@register(
    "dsir_importance_weights",
    M.dsir_oracle_sql(),
    tags=("llm", "sampling", "dsir"),
    bench=True,
)
def q_dsir(spark, sf_dir):
    """DSIR (Xie et al. 2023) importance log-weights for target=lang-en
    under a 4096-bucket hashed-bigram LM; one corpus shuffle + one
    broadcast join."""
    return M.dsir_weights(table(spark, sf_dir, "documents"))


@register(
    "logreg_quality_scores",
    M.logreg_oracle_sql(),
    tags=("llm", "classifier", "iterative"),
    bench=True,
)
def q_logreg(spark, sf_dir):
    """Distributed full-batch logistic regression (3 GD steps unrolled in
    the plan, one gradient row per step) + final per-doc scores; the
    model-based quality gate next to the rule-based filters."""
    return M.logreg_predictions(table(spark, sf_dir, "documents"))


def _bpe_oracle() -> str:
    from ..operators import bpe as B

    return B.bpe_oracle_sql()


@register(
    "bpe_merges",
    _bpe_oracle(),
    tags=("llm", "tokenizer", "bpe"),
)
def q_bpe_merges(spark, sf_dir):
    """Learned BPE merge table (20 merges) — distributed word-frequency
    reduction + bounded driver-side merge loop. Oracle-gated since
    round 7: the greedy merge fold IS SQL-replayable via the
    sentinel-delimited encoding (operators/bpe.py `bpe_oracle_sql` —
    one string replace per round is exactly the greedy adjacent merge),
    so the driver hash-pins the full (rank, left, right, pair_count)
    table; pytest additionally certifies exact equality vs an
    independent pure-Python BPE."""
    from ..operators import bpe as B

    return B.bpe_train(table(spark, sf_dir, "documents"))


def _bpe_segment_oracle() -> str:
    from ..operators import bpe as B

    return B.bpe_segment_oracle_sql()


@register(
    "bpe_token_counts",
    _bpe_segment_oracle(),
    tags=("llm", "tokenizer", "bpe", "map-only"),
)
def q_bpe_token_counts(spark, sf_dir):
    """Train-then-apply: segment the corpus with the learned merge table
    (map-only Arrow stage) and report per-doc BPE token counts.
    Oracle-gated since round 7: the oracle replays BOTH stages — the
    merge chain and the rank-ordered greedy application to every
    distinct word (operators/bpe.py `bpe_segment_oracle_sql`)."""
    from ..operators import bpe as B

    docs = table(spark, sf_dir, "documents")
    merges = [(r.left, r.right) for r in B.bpe_train(docs).collect()]
    return B.bpe_segment(docs, merges).select("doc_id", "n_bpe_tokens")


def _calibration_oracle() -> str:
    inner = M.logreg_oracle_sql()
    return f"""
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(p_dec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS mean_predicted,
           ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS frac_positive
    FROM (
      SELECT CAST(LEAST(FLOOR(CAST(ROUND(p_hat, 9) AS DECIMAL(18,9)) * 10),
                        9) AS INT) AS bin,
             CAST(ROUND(p_hat, 9) AS DECIMAL(18,9)) AS p_dec, y
      FROM ({inner}) t) b
    GROUP BY bin
    """


@register(
    "logreg_calibration",
    _calibration_oracle(),
    tags=("llm", "classifier", "evaluation"),
)
def q_logreg_calibration(spark, sf_dir):
    """Reliability diagram for the trained classifier: decile bins of
    predicted probability vs observed positive rate (the ECE input).
    Certifies the evaluation stage on top of the training loop — bin
    membership is exact-decimal arithmetic so both engines bin
    identically."""
    from pyspark.sql import functions as F

    preds = M.logreg_predictions(table(spark, sf_dir, "documents"))
    p_dec = F.round(F.col("p_hat"), 9).cast("decimal(18,9)")
    binned = preds.select(
        F.least(F.floor(p_dec * 10), F.lit(9)).cast("int").alias("bin"),
        p_dec.alias("p_dec"),
        "y",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum("p_dec").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_predicted"),
        F.round(
            F.sum("y").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("frac_positive"),
    )


def _pca_gram_oracle() -> str:
    return """
    WITH x AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS i,
             UNNEST(embedding) AS xi,
             embedding
      FROM embeddings
    ),
    xx AS (
      SELECT x.i AS i,
             generate_subscripts(x.embedding, 1) - 1 AS j,
             UNNEST(x.embedding) AS xj,
             x.xi AS xi
      FROM x
    ),
    gram AS (
      SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
             SUM(CAST(ROUND(CAST(xi AS DOUBLE) * CAST(xj AS DOUBLE), 9)
                      AS DECIMAL(38,9))) AS val_dec
      FROM xx GROUP BY 1, 2
    ),
    means AS (
      SELECT CAST(i AS INT) AS i, -1 AS j,
             SUM(CAST(ROUND(CAST(xi AS DOUBLE), 9)
                      AS DECIMAL(38,9))) AS val_dec
      FROM x GROUP BY 1
    ),
    cnt AS (
      SELECT -1 AS i, -1 AS j,
             CAST(COUNT(*) AS DECIMAL(38,9)) AS val_dec
      FROM embeddings
    )
    SELECT i, j, ROUND(CAST(val_dec AS DOUBLE), 6) AS val
    FROM (SELECT * FROM gram
          UNION ALL SELECT * FROM means
          UNION ALL SELECT * FROM cnt)
    """


@register(
    "pca_gram_check",
    _pca_gram_oracle(),
    tags=("llm", "ml", "pca", "certification"),
)
def q_pca_gram_check(spark, sf_dir):
    """Oracle-certified leg for the PCA family: the Gram / mean / count
    accumulators that `pca_model` eigendecomposes are plain sums of
    products, so they replay exactly in SQL. Each float32 pair's product
    is EXACT in double (24+24 mantissa bits < 52), rounded to 9dp and
    summed as DECIMAL(38,9) — order-independent exact arithmetic, cast
    to double only at the edge. Rows: (i,j)=Gram cell, (i,-1)=column
    sum, (-1,-1)=count. This leg is certification-only (O(n*d^2) row
    explosion); production PCA runs the d^2-bounded BLAS partial in
    `_gram_and_mean`, and tests/test_pca.py bridges the two on the same
    corpus."""
    t = table(spark, sf_dir, "embeddings")
    x = t.select(
        F.posexplode("embedding").alias("i", "xi"), F.col("embedding")
    )
    xx = x.select(
        "i", "xi", F.posexplode("embedding").alias("j", "xj")
    )
    dec = "decimal(38,9)"
    gram = xx.groupBy("i", "j").agg(
        F.sum(
            F.round(
                F.col("xi").cast("double") * F.col("xj").cast("double"), 9
            ).cast(dec)
        ).alias("val_dec")
    )
    means = x.groupBy("i").agg(
        F.sum(F.round(F.col("xi").cast("double"), 9).cast(dec)).alias(
            "val_dec"
        )
    ).select("i", F.lit(-1).alias("j"), "val_dec")
    cnt = t.agg(
        F.count(F.lit(1)).cast(dec).alias("val_dec")
    ).select(F.lit(-1).alias("i"), F.lit(-1).alias("j"), "val_dec")
    return (
        gram.unionByName(means)
        .unionByName(cnt)
        .select(
            "i", "j", F.round(F.col("val_dec").cast("double"), 6).alias("val")
        )
    )


@register(
    "pca_project_embeddings",
    None,
    tags=("llm", "ml", "pca", "embedding"),
)
def q_pca_project_embeddings(spark, sf_dir):
    """PCA projection of the embedding column onto the top-16
    components (the SemDeDup-style preprocessing for semantic dedup /
    embedding compression). One distributed Gram-matrix pass (d^2-row
    partial aggregates — shuffle bounded by dimension, not data), a
    dimension-bounded driver eigendecomposition, then a map-only
    broadcast projection.

    Rows-only BY CONSTRUCTION, not by effort (the explicit
    non-replayability note, same standard as `semantic_dedup_scaled`):
    a cross-engine hash oracle here requires replaying the model fit
    under this repo's exactness rules — either exact decimal arithmetic
    or a FIXED expression tree evaluated identically by both engines
    (the `_dist_to` argument). Neither exists for eigh: LAPACK's
    symmetric eigensolver (dsyevd/dsyevr) is an ITERATIVE rotation /
    divide-and-conquer algorithm whose flop count and order are
    implementation-defined and data-dependent — there is no fixed
    expression tree to transcribe into SQL, and every eigenvector
    coordinate is a derived double after an unbounded chain of
    reassociated operations, exactly the value class the repo refuses
    to round-and-compare (the round-7 boundary-flip lesson). Unrolled
    SQL power iteration was considered and rejected: staying exact
    needs per-iteration decimal re-quantization of DERIVED quotients
    (the hazard class itself) or unbounded decimal scale growth.
    Certification therefore splits at the eigh boundary: everything
    UPSTREAM of it (the Gram/mean/count accumulators, in the exact
    decimal form the model consumes) is hash-certified by the
    `pca_gram_check` sibling, and everything AROUND it is property-
    pinned in tests/test_pca.py — exact Gram identity, orthonormality,
    variance ordering, determinism across fits (sign convention),
    reconstruction-error monotonicity, whitening variance, the
    zero-Exchange projection plan, and the bridge between the certified
    leg and the production BLAS partial."""
    return M.pca_project(
        table(spark, sf_dir, "embeddings"), n_components=16
    )


def _auc_oracle() -> str:
    return f"""
    WITH preds AS (
      SELECT * FROM ({M.logreg_oracle_sql()}) t),
    ranked AS (
      SELECT y, p_hat AS s,
             ROW_NUMBER() OVER (ORDER BY p_hat) AS rn
      FROM preds),
    mid AS (
      SELECT s, CAST(MIN(rn) + MAX(rn) AS DOUBLE) / 2.0 AS midrank
      FROM ranked GROUP BY s),
    j AS (SELECT r.y, m.midrank FROM ranked r JOIN mid m USING (s))
    SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(1 - y) AS BIGINT) AS n_neg,
           CASE WHEN SUM(y) > 0 AND SUM(1 - y) > 0 THEN
             ROUND((SUM(CASE WHEN y = 1 THEN midrank ELSE 0.0 END)
                    - CAST(SUM(y) AS DOUBLE)
                      * (CAST(SUM(y) AS DOUBLE) + 1.0) / 2.0)
                   / (CAST(SUM(y) AS DOUBLE) * CAST(SUM(1 - y) AS DOUBLE)),
                   6)
           END AS auc
    FROM j
    """


@register(
    "classifier_auc",
    _auc_oracle(),
    tags=("llm", "ml", "evaluation", "auc"),
)
def q_classifier_auc(spark, sf_dir):
    """Exact ROC AUC (tie-correct Mann-Whitney midranks) of the in-plan
    logistic-regression classifier — the evaluation rung above
    logreg_calibration. Midranks are multiples of 0.5, so even the
    double rank-sum is order-exact; one final division and a 6dp round
    make the metric hash-certifiable cross-engine."""
    preds = M.logreg_predictions(table(spark, sf_dir, "documents"))
    return M.classifier_auc(preds)
