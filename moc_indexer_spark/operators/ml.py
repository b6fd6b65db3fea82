"""Model-based curation operators: DSIR importance weights and a
fully-distributed logistic-regression quality classifier.

No reference analog (BASELINE.json north star) — these are the two
standard "model in the loop" stages of a training-data pipeline that the
purely rule-based filters (quality_registry) feed into:

* DSIR (Data Selection via Importance Resampling, Xie et al. 2023):
  score every raw document by the log-likelihood ratio of a hashed
  n-gram bag model fitted on a target domain vs the raw pool, then
  resample proportionally. Here the target is the lang='en' slice and
  the weight is the per-doc sum of per-bucket log ratios.
* Logistic regression: batch gradient descent on cheap text features
  against a deterministic label, unrolled into one Catalyst plan —
  the linear-probe quality classifier (fastText-style pipelines) whose
  trained weights then score arbitrarily large corpora map-only.

Spark-first shapes:

* DSIR: one explode+groupBy builds the 4096-bucket hash LM (map-side
  combine; bucket keys are 3-hex-char strings). The bucket table
  broadcasts back onto the per-doc bigram relation, so the corpus is
  shuffled exactly once (the per-doc sum groupBy). Hash buckets are
  `substr(md5(bigram), 1, 3)` — engine-portable by construction.
* LogReg: each GD iteration is ONE map-side-combining aggregate to a
  single gradient row that broadcasts back as the next weight vector —
  the classic "parameter server in the plan" shape; per-iteration
  shuffle traffic is (n_features+1) decimals per partition.

Cross-engine determinism (driver hash-compare vs DuckDB): all sums run
over round-frozen DECIMALs (order-independent); ln()/exp() appear only
inside `round(.., 9)` single expressions with identical operand order
(the bigram_logprob pattern); GD weights are DECIMAL(18,9) and the dot
product is exact decimal arithmetic, so the sigmoid input is the same
IEEE double in both engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

N_BUCKETS = 4096  # 16^3: bucket key is the first 3 hex chars of md5

SQL_TOKS = "list_filter(str_split(text, ' '), x -> x <> '')"


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) — one row per bigram OCCURRENCE, bucketed."""
    toks = docs.select("doc_id", "lang", T.tokens().alias("t"))
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(T.ngrams_all(F.col("t"), 2)).alias("bg"),
    )
    return bg.select(
        "doc_id", "lang", F.substring(F.md5("bg"), 1, 3).alias("bucket")
    )


def dsir_weights(docs: DataFrame, target_lang: str = "en") -> DataFrame:
    """Per-document DSIR importance log-weight.

    weight(d) = sum over bigram occurrences b in d of
      ln((cnt_target(b)+1)/(tot_target+B)) - ln((cnt_raw(b)+1)/(tot_raw+B))
    with B = 4096 hashed buckets and add-one smoothing. Returns
    (doc_id, n_bigrams bigint, logw double); docs with no bigrams are
    excluded (their weight is vacuously 0 and they carry no signal).
    """
    bg = _bigrams(docs)
    buckets = bg.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_raw"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("cnt_t"),
    )
    # totals ride the bucket table as a whole-relation window sum: the
    # separate buckets.agg() relation re-executed the corpus explode +
    # bucket groupBy a second time (and the crossJoin a third) just to
    # attach two scalars. The empty-partitionBy window funnels only the
    # 4096-row bucket table through one partition — bounded by
    # construction — so the corpus explode now runs twice (bucket build +
    # probe side), not three times.
    wall = Window.partitionBy()
    buckets = buckets.withColumn(
        "tot_raw", F.sum("cnt_raw").over(wall).cast("bigint")
    ).withColumn("tot_t", F.sum("cnt_t").over(wall).cast("bigint"))
    nb = F.lit(float(N_BUCKETS))
    lr = (
        F.round(
            F.log(
                (F.col("cnt_t").cast("double") + F.lit(1.0))
                / (F.col("tot_t").cast("double") + nb)
            ),
            9,
        ).cast("decimal(18,9)")
        - F.round(
            F.log(
                (F.col("cnt_raw").cast("double") + F.lit(1.0))
                / (F.col("tot_raw").cast("double") + nb)
            ),
            9,
        ).cast("decimal(18,9)")
    )
    bucket_lr = buckets.select("bucket", lr.alias("lr"))
    return (
        bg.join(F.broadcast(bucket_lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("lr").cast("double").alias("logw"),
        )
    )


def dsir_oracle_sql(target_lang: str = "en") -> str:
    return f"""
    WITH toks AS (SELECT doc_id, lang, {SQL_TOKS} AS t FROM documents),
    bgidx AS (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
              FROM toks WHERE len(t) >= 2),
    bg AS (SELECT doc_id, lang,
                  substr(md5(t[CAST(i AS INT)] || ' ' ||
                             t[CAST(i + 1 AS INT)]), 1, 3) AS bucket
           FROM bgidx),
    buckets AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_raw,
             CAST(SUM(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cnt_t
      FROM bg GROUP BY bucket),
    totals AS (
      SELECT CAST(SUM(cnt_raw) AS BIGINT) AS tot_raw,
             CAST(SUM(cnt_t) AS BIGINT) AS tot_t FROM buckets),
    blr AS (
      SELECT bucket,
             CAST(ROUND(ln((CAST(cnt_t AS DOUBLE) + 1.0)
                           / (CAST(tot_t AS DOUBLE) + {float(N_BUCKETS)})),
                        9) AS DECIMAL(18,9))
             - CAST(ROUND(ln((CAST(cnt_raw AS DOUBLE) + 1.0)
                             / (CAST(tot_raw AS DOUBLE) + {float(N_BUCKETS)})),
                          9) AS DECIMAL(18,9)) AS lr
      FROM buckets CROSS JOIN totals)
    SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(blr.lr) AS DOUBLE) AS logw
    FROM bg JOIN blr USING (bucket)
    GROUP BY bg.doc_id
    """


# --- logistic regression ----------------------------------------------------

LR_ITERS = 3
LR_RATE = 1.0
N_FEATURES = 4  # bias, token_count/100, distinct ratio, stopword ratio


def _features(docs: DataFrame) -> DataFrame:
    """(doc_id, y, x0..x3) with x_j DECIMAL(18,6) round-frozen doubles.
    Docs with zero tokens are excluded (ratios undefined)."""
    toks = docs.select(
        "doc_id",
        "lang",
        T.token_count().alias("tc"),
        T.distinct_token_count().alias("dc"),
        T.stopword_count().alias("sc"),
    ).filter(F.col("tc") > 0)
    tc_d = F.col("tc").cast("double")
    return toks.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("y"),
        F.lit(1).cast("decimal(18,6)").alias("x0"),
        F.round(tc_d / F.lit(100.0), 6).cast("decimal(18,6)").alias("x1"),
        F.round(F.col("dc").cast("double") / tc_d, 6)
        .cast("decimal(18,6)").alias("x2"),
        F.round(F.col("sc").cast("double") / tc_d, 6)
        .cast("decimal(18,6)").alias("x3"),
    )


def _sigmoid(z_dec):
    """round(1/(1+exp(-z)), 9) as DECIMAL(18,9) — z is exact decimal, so
    the double input to exp is identical in both engines."""
    zd = z_dec.cast("double")
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zd)), 9).cast(
        "decimal(18,9)"
    )


def logreg_predictions(
    docs: DataFrame, iters: int = LR_ITERS, rate: float = LR_RATE
) -> DataFrame:
    """Train `iters` full-batch GD steps from w=0, then score every doc
    with the final weights. Returns (doc_id, y int, p_hat double,
    predicted int)."""
    feats = _features(docs)
    # weights live as one broadcastable row (w0..w3 DECIMAL(18,9))
    spark = docs.sparkSession
    weights = spark.createDataFrame(
        [tuple([0.0] * N_FEATURES)],
        ", ".join(f"w{j} double" for j in range(N_FEATURES)),
    ).select(
        *[F.col(f"w{j}").cast("decimal(18,9)").alias(f"w{j}") for j in
          range(N_FEATURES)]
    )
    for _ in range(iters):
        z = reduce(
            lambda a, b: a + b,
            [F.col(f"w{j}") * F.col(f"x{j}") for j in range(N_FEATURES)],
        )
        scored = feats.crossJoin(F.broadcast(weights)).withColumn(
            "p", _sigmoid(z)
        )
        err_d = (F.col("p") - F.col("y").cast("decimal(18,9)")).cast("double")
        # n_docs rides each iteration's gradient aggregate (same value
        # every pass — the feature relation is fixed); the standalone
        # feats.agg(count) relation it replaces was one more full
        # evaluation of the feature-extraction subtree.
        grads = scored.agg(
            *[
                F.sum(
                    F.round(err_d * F.col(f"x{j}").cast("double"), 10).cast(
                        "decimal(20,10)"
                    )
                ).alias(f"g{j}")
                for j in range(N_FEATURES)
            ],
            *[F.first(f"w{j}").alias(f"w{j}") for j in range(N_FEATURES)],
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        weights = grads.select(
            *[
                F.round(
                    F.col(f"w{j}").cast("double")
                    - F.lit(rate)
                    * (
                        F.col(f"g{j}").cast("double")
                        / F.col("n_docs").cast("double")
                    ),
                    9,
                ).cast("decimal(18,9)").alias(f"w{j}")
                for j in range(N_FEATURES)
            ]
        )
    z = reduce(
        lambda a, b: a + b,
        [F.col(f"w{j}") * F.col(f"x{j}") for j in range(N_FEATURES)],
    )
    return (
        feats.crossJoin(F.broadcast(weights))
        .withColumn("p", _sigmoid(z))
        .select(
            "doc_id",
            "y",
            F.col("p").cast("double").alias("p_hat"),
            F.when(F.col("p") >= F.lit("0.5").cast("decimal(18,9)"), 1)
            .otherwise(0).cast("int").alias("predicted"),
        )
    )


def logreg_oracle_sql(iters: int = LR_ITERS, rate: float = LR_RATE) -> str:
    """Generated DuckDB replay of the same GD loop (one CTE pair per
    iteration)."""
    fx = range(N_FEATURES)
    stop_in = ", ".join(f"'{s}'" for s in T.STOPWORDS)
    parts = [
        f"""feats AS (
          SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 CAST(1 AS DECIMAL(18,6)) AS x0,
                 CAST(ROUND(CAST(len(t) AS DOUBLE) / 100.0, 6)
                      AS DECIMAL(18,6)) AS x1,
                 CAST(ROUND(CAST(len(list_distinct(t)) AS DOUBLE)
                            / CAST(len(t) AS DOUBLE), 6)
                      AS DECIMAL(18,6)) AS x2,
                 CAST(ROUND(CAST(len(list_filter(t, x -> x IN ({stop_in})))
                                 AS DOUBLE)
                            / CAST(len(t) AS DOUBLE), 6)
                      AS DECIMAL(18,6)) AS x3
          FROM (SELECT doc_id, lang, {SQL_TOKS} AS t FROM documents)
          WHERE len(t) > 0)""",
        "nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM feats)",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS DECIMAL(18,9)) AS w{j}" for j in fx)
        + ")",
    ]
    prev = "w0"
    for i in range(iters):
        dot = " + ".join(f"w.w{j} * f.x{j}" for j in fx)
        gsums = ", ".join(
            "SUM(CAST(ROUND(CAST(p - CAST(y AS DECIMAL(18,9)) AS DOUBLE)"
            f" * CAST(x{j} AS DOUBLE), 10) AS DECIMAL(20,10))) AS g{j}"
            for j in fx
        )
        keep_w = ", ".join(f"MIN(w{j}) AS w{j}" for j in fx)
        parts.append(
            f"""s{i} AS (
              SELECT f.*, w.*,
                     CAST(ROUND(1.0 / (1.0 + exp(-CAST({dot} AS DOUBLE))), 9)
                          AS DECIMAL(18,9)) AS p
              FROM feats f CROSS JOIN {prev} w)"""
        )
        parts.append(f"g{i} AS (SELECT {gsums}, {keep_w} FROM s{i})")
        upd = ", ".join(
            f"CAST(ROUND(CAST(w{j} AS DOUBLE) - CAST({rate} AS DOUBLE)"
            f" * (CAST(g{j} AS DOUBLE) / CAST(n_docs AS DOUBLE)), 9)"
            f" AS DECIMAL(18,9)) AS w{j}"
            for j in fx
        )
        parts.append(
            f"w{i + 1} AS (SELECT {upd} FROM g{i} CROSS JOIN nd)"
        )
        prev = f"w{i + 1}"
    dot = " + ".join(f"w.w{j} * f.x{j}" for j in fx)
    body = ",\n".join(parts)
    return f"""
    WITH {body}
    SELECT f.doc_id, f.y,
           CAST(CAST(ROUND(1.0 / (1.0 + exp(-CAST({dot} AS DOUBLE))), 9)
                     AS DECIMAL(18,9)) AS DOUBLE) AS p_hat,
           CAST(CASE WHEN CAST(ROUND(1.0 / (1.0 + exp(-CAST({dot} AS
                  DOUBLE))), 9) AS DECIMAL(18,9))
                  >= CAST(0.5 AS DECIMAL(18,9))
                THEN 1 ELSE 0 END AS INT) AS predicted
    FROM feats f CROSS JOIN {prev} w
    """


# --- PCA over embedding columns ---------------------------------------------


def _gram_and_mean(corpus: DataFrame, id_col: str, vec_col: str):
    """One distributed pass -> (n, mean vector, Gram matrix X^T X).

    The Gram matrix is accumulated the scale-correct way: each Arrow
    batch emits its PARTIAL d x d outer-product sum as d^2 (i, j, val)
    rows, and one map-side-combining aggregate folds them — shuffle
    volume is d^2 x partitions, independent of row count (the classic
    partial-aggregate pattern; an n x d^2 posexplode join would shuffle
    the corpus squared-by-dimension instead). The d- and d^2-sized
    results are collected to the driver — bounded, like the quantizer
    training samples.
    """
    import numpy as np
    import pandas as pd

    def partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            G = M.T @ M
            s = M.sum(axis=0)
            d = M.shape[1]
            i, j = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate([i.ravel(), np.arange(d)]),
                    "j": np.concatenate([j.ravel(), np.full(d, -1)]),
                    "val": np.concatenate([G.ravel(), s]),
                    "cnt": np.concatenate(
                        [np.zeros(d * d, dtype=np.int64),
                         np.full(d, len(M), dtype=np.int64)]
                    ),
                }
            )

    agg = (
        corpus.select(vec_col)
        .mapInPandas(partial, schema="i int, j int, val double, cnt bigint")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"), F.sum("cnt").alias("cnt"))
        .collect()
    )
    import numpy as np

    if not agg:
        raise ValueError(
            "empty corpus: PCA/Gram statistics need at least one vector"
        )
    d = max(r.i for r in agg) + 1
    G = np.zeros((d, d))
    mean_sum = np.zeros(d)
    n = 0
    for r in agg:
        if r.j == -1:
            mean_sum[r.i] = r.val
            n = max(n, r.cnt)
        else:
            G[r.i, r.j] = r.val
    if n == 0:
        raise ValueError(
            "empty corpus: PCA/Gram statistics need at least one vector"
        )
    return n, mean_sum / n, G


def pca_model(
    corpus: DataFrame,
    n_components: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Fit PCA on an embedding column: returns (mean, components
    (k x d), eigenvalues (k,), explained_variance_ratio (k,)).

    Covariance comes from the one-pass Gram identity
    cov = (X^T X - n * mu mu^T) / (n - 1); the d x d eigendecomposition
    runs driver-side (dimension-bounded, like every quantizer here).
    Deterministic: numpy eigh on a symmetric matrix plus a sign
    convention (each component's largest-|entry| coordinate is made
    positive), so repeated fits produce identical models.
    """
    import numpy as np

    n, mu, G = _gram_and_mean(corpus, id_col, vec_col)
    cov = (G - n * np.outer(mu, mu)) / max(1, n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T  # (k, d)
    # sign convention for determinism across BLAS builds
    for r in range(comps.shape[0]):
        pivot = np.argmax(np.abs(comps[r]))
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    ratios = vals[order] / vals.sum()
    return mu, comps, vals[order], ratios


def pca_project(
    corpus: DataFrame,
    n_components: int = 16,
    whiten: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto the top-k principal components (optional
    whitening divides by sqrt(eigenvalue) — the SemDeDup-style
    preprocessing for semantic dedup). Returns (id, pca array<double>).

    The model is dimension-bounded driver state broadcast into one
    map-only Arrow stage — no shuffle in the projection at all; at
    100 TB this is a pure scan. Rows-only at the driver gate
    (eigendecomposition is not SQL-replayable); pytest pins
    orthonormality, variance ordering, reconstruction-error monotonicity
    and the exact Gram identity instead.
    """
    import numpy as np

    mu, comps, eigvals, _ = pca_model(corpus, n_components, id_col, vec_col)
    if whiten:
        # fold the 1/sqrt(lambda) scaling into the component matrix so
        # the projection stage stays a single matmul; degenerate
        # directions (lambda ~ 0) are left unscaled rather than blown up
        scale = np.where(eigvals > 1e-12, 1.0 / np.sqrt(eigvals), 1.0)
        comps = comps * scale[:, None]
    bc = corpus.sparkSession.sparkContext.broadcast((mu, comps))
    import pandas as pd

    def run(batches):
        mu_, W = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            P = (M - mu_) @ W.T
            yield pd.DataFrame({id_col: pdf[id_col], "pca": list(P)})

    return corpus.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, pca array<double>"
    )


# --- classifier evaluation: exact AUC --------------------------------------


def classifier_auc(scores: DataFrame, score_col: str = "p_hat",
                   label_col: str = "y") -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney rank statistic:

        AUC = (sum of positives' average ranks - n_pos(n_pos+1)/2)
              / (n_pos * n_neg)

    with TIE-CORRECT average ranks (tied scores share the mean of their
    row_number range — the midrank convention, equivalent to counting
    ties as half-concordant). Everything is integer rank arithmetic
    until one final division, so the metric is hash-certifiable
    cross-engine — the evaluation rung above `logreg_calibration`.

    Scale shape: the ONLY per-row work is one `groupBy(score)` partial
    aggregate (map-side combined); every rank is then derived on the
    distinct-score relation — rows with score s occupy row_number range
    [cum_prev+1, cum_prev+c], so midrank = cum_prev + (c+1)/2 where
    cum_prev is the cumulative count of strictly-smaller scores. The
    one unavoidable total-order window (ranking IS a total order) runs
    over |distinct scores| rows, not |rows|, and 2*midrank stays a
    bigint so the positives' rank sum is exact integer arithmetic up to
    the single final division. Returns one row (n_pos, n_neg, auc)."""
    per_score = (
        scores.select(
            F.col(label_col).alias("y"), F.col(score_col).alias("s")
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("y").cast("bigint").alias("pos_c"),
        )
    )
    cum = per_score.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # midrank*2 = 2*cum_prev + c + 1 = 2*cum - c + 1 (exact bigint)
    per = cum.withColumn(
        "midrank2", F.lit(2) * F.col("cum") - F.col("c") + F.lit(1)
    )
    return per.agg(
        F.sum("pos_c").cast("bigint").alias("n_pos"),
        (F.sum("c") - F.sum("pos_c")).cast("bigint").alias("n_neg"),
        F.sum(F.col("pos_c") * F.col("midrank2"))
        .cast("bigint")
        .alias("pos_rank_sum2"),
    ).select(
        "n_pos",
        "n_neg",
        # single-class eval sets have no defined AUC: NULL, not a 0/0
        # IEEE artifact (whose NaN/Inf rendering is engine-specific)
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            # pos_rank_sum2 = 2 * sum of positives' midranks (exact bigint),
            # so AUC = (prs2 - n_pos*(n_pos+1)) / (2 * n_pos * n_neg)
            F.round(
                (
                    F.col("pos_rank_sum2")
                    - F.col("n_pos") * (F.col("n_pos") + F.lit(1))
                ).cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_pos").cast("double")
                    * F.col("n_neg").cast("double")
                ),
                6,
            ),
        ).alias("auc"),
    )
