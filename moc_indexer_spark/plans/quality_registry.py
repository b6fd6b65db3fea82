"""Registry batch 7: pretraining quality gates (Gopher-style repetition
filters, corpus unigram LM scoring).

No reference analog (BASELINE.json north star: text analysis for
training-data pipelines at 100 TB). Both queries are pure Catalyst plans —
the oracles brute-force the same statistics with DuckDB list/unnest ops.
"""

from __future__ import annotations

from ..operators import pipeline as P
from ..tables import table
from .registry import register

# keep in lockstep with functions/text.py tokens()
_SQL_TOKS = "list_filter(str_split(text, ' '), x -> x <> '')"

N_TOP = 2  # modal-gram grain (Gopher's top-2-gram char fraction analog)
N_DUP = 5  # duplicated-gram grain (Gopher's dup-5-gram fraction analog)


@register(
    "repetition_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    g AS (
      SELECT doc_id, {N_TOP} AS n,
             unnest(list_transform(range(1, len(t) - {N_TOP - 2}),
                    i -> array_to_string(list_slice(t, i, i + {N_TOP - 1}), ' '))) AS gram
      FROM toks
      UNION ALL
      SELECT doc_id, {N_DUP} AS n,
             unnest(list_transform(range(1, len(t) - {N_DUP - 2}),
                    i -> array_to_string(list_slice(t, i, i + {N_DUP - 1}), ' '))) AS gram
      FROM toks),
    per_gram AS (
      SELECT doc_id, n, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, n, gram),
    per_n AS (
      SELECT doc_id, n, MAX(cnt) AS top_cnt, SUM(cnt) AS total,
             SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_cnt
      FROM per_gram GROUP BY doc_id, n)
    SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
           CAST(b.top_cnt AS DOUBLE) / CAST(b.total AS DOUBLE) AS top_ngram_frac,
           CAST(f.dup_cnt AS DOUBLE) / CAST(f.total AS DOUBLE) AS dup_ngram_frac
    FROM toks d
    LEFT JOIN per_n b ON b.doc_id = d.doc_id AND b.n = {N_TOP}
    LEFT JOIN per_n f ON f.doc_id = d.doc_id AND f.n = {N_DUP}
    """,
    tags=("llm", "quality", "repetition"),
    bench=True,
)
def q_repetition_stats(spark, sf_dir):
    """Gopher/MassiveText repetition filters (word-n-gram form): modal-
    bigram fraction + duplicated-5-gram fraction per document. Map-only
    Arrow stage — per-doc stats need no shuffle (plan test pins zero
    Exchange); the fractions are integer ratios (one IEEE division —
    bit-identical cross-engine)."""
    return P.repetition_stats(table(spark, sf_dir, "documents"), N_TOP, N_DUP)


@register(
    "unigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT SUM(cnt) AS total_tokens FROM vocab)
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(
             CAST(SUM(CAST(ln(CAST(v.cnt AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE))
                           AS DECIMAL(18,9))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS mean_logprob
    FROM tok t JOIN vocab v USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    tags=("llm", "quality", "langmodel"),
    bench=True,
)
def q_unigram_logprob(spark, sf_dir):
    """Corpus-trained unigram LM score (mean token ln-probability) — the
    cheap perplexity-gate stand-in. Per-token log-probs are single double
    expressions frozen to DECIMAL(18,9); the per-doc sum is exact decimal,
    so shuffle/aggregation order cannot move the result."""
    return P.unigram_logprob(table(spark, sf_dir, "documents"))


_SQL_SHINGLES5 = (
    "list_distinct(list_transform(range(1, len(t) - 3), "
    "i -> array_to_string(list_slice(t, i, i + 4), ' ')))"
)


@register(
    "cross_doc_ngram_frac",
    f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES5}) AS shingle
      FROM toks WHERE len(t) >= 5),
    freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
    SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_shingles,
           CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS cross_doc_frac
    FROM sh JOIN freq f USING (shingle)
    GROUP BY sh.doc_id
    """,
    tags=("llm", "quality", "contamination"),
)
def q_cross_doc_ngram_frac(spark, sf_dir):
    """Cross-document duplication rate: the fraction of a doc's distinct
    5-grams that also occur in at least one OTHER doc (since per-doc
    shingles are deduped, document frequency >= 2 means another doc shares
    the gram). The corpus-level complement of the pairwise near-dup tiers:
    catches diffuse template reuse no single pair-join surfaces. Reuses the
    inverted-index shingle relation — one explode, one doc-frequency
    aggregate, one join back; at 100 TB the hot-shingle anti-join
    (boilerplate_shingles) caps the posting lists first."""
    from pyspark.sql import functions as F

    from ..operators.dedup import _shingle_df

    sh = _shingle_df(table(spark, sf_dir, "documents"), 5, "doc_id", "text")
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    shared = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            shared.cast("bigint").alias("shared_shingles"),
            (shared.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "cross_doc_frac"
            ),
        )
    )


@register(
    "quality_weighted_sample",
    """
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          CASE WHEN n_chars >= 300 THEN 'g0'
               WHEN n_chars >= 150 THEN '80'
               ELSE '40' END
    """,
    tags=("llm", "quality", "sampling"),
)
def q_quality_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic downsampling: keep probability scales
    with a per-doc quality signal (here the length tier: 1.0 / 0.5 / 0.25)
    by comparing the doc's md5 bucket against a PER-ROW hex threshold —
    the stratified form of hash_sample, so the sample stays reproducible
    across engines, retries, and cluster sizes with no RNG state. 'g0'
    sorts above every hex bucket and means keep-all. Embarrassingly
    parallel: a scan-side filter, zero shuffles."""
    from pyspark.sql import functions as F

    from ..operators.pipeline import hash_sample

    d = table(spark, sf_dir, "documents")
    thr = (
        F.when(F.col("n_chars") >= 300, "g0")
        .when(F.col("n_chars") >= 150, "80")
        .otherwise("40")
    )
    return hash_sample(d, F.col("doc_id"), thr).select(
        "doc_id", "source", "lang", "n_chars"
    )


TFIDF_TOP_K = 3


@register(
    "tfidf_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             ROUND(CAST(tf.tf AS DOUBLE)
                   * ln((CAST(nd.n_docs AS DOUBLE) + 1.0)
                        / (CAST(df.df AS DOUBLE) + 1.0)), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN nd),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rank
      FROM scored)
    SELECT doc_id, token, tf, tfidf, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TFIDF_TOP_K}
    """,
    tags=("llm", "text", "tfidf"),
    bench=True,
)
def q_tfidf_top_terms(spark, sf_dir):
    """Top-k characteristic terms per document by smoothed TF-IDF — the
    classic keyword/topic signal (and the retrieval-side complement of the
    unigram LM score). tf and df are exact integers; the score is ONE
    double expression ROUND(,6)ed on both engines, and the per-doc top-k
    orders by (score desc, token) — a total order, so the rank-k boundary
    is deterministic. Plan: tf is one shuffle on (doc_id, token); df rides
    tf as a window count over partitionBy(token) — the separate df
    aggregate re-executed the whole explode + tf groupBy a second time
    (every DataFrame reference re-runs its subtree) and then paid a
    broadcast join to re-attach; the window computes it in the same
    evaluation for one exchange of the (doc_id, token, tf) relation.
    Per-token window partitions are bounded by n_docs; a Zipf-saturated
    corpus prunes stop tokens first (they are never top-k characteristic
    terms), the same df-cap note as before. n_docs is a 1-row broadcast;
    the top-k window shuffles on doc_id."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions import text as T

    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token")).cast("bigint")
    )
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n_docs").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "token", "tf", "tfidf", F.col("rank").cast("bigint").alias("rank"))
    )


@register(
    "token_entropy",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    agg AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE))
                           AS DECIMAL(18,9))) AS DOUBLE) AS sum_tlnt
      FROM tf GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           ROUND(ln(CAST(n_tokens AS DOUBLE))
                 - sum_tlnt / CAST(n_tokens AS DOUBLE), 6) AS entropy
    FROM agg
    """,
    tags=("llm", "quality", "entropy"),
)
def q_token_entropy(spark, sf_dir):
    """Shannon entropy of each doc's token distribution — low entropy means
    a few tokens dominate (keyword stuffing, boilerplate), the complement
    of the n-gram repetition filters. Uses the shuffle-free identity
    H = ln(n) − (Σ tf·ln tf)/n so the only per-token float work is
    tf·ln(tf) — ONE double expression frozen to DECIMAL(18,9), summed
    exactly, so fold order can't move the result (same discipline as
    unigram_logprob). Two keyed shuffles: (doc, token) histogram, then the
    per-doc fold — both map-side-combinable."""
    from pyspark.sql import functions as F

    from ..functions import text as T

    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    tlnt = (
        (F.col("tf").cast("double") * F.log(F.col("tf").cast("double")))
        .cast("decimal(18,9)")
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.sum(tlnt).cast("double").alias("_sum_tlnt"),
    )
    nd = F.col("n_tokens").cast("double")
    return agg.select(
        "doc_id",
        "n_tokens",
        F.round(F.log(nd) - F.col("_sum_tlnt") / nd, 6).alias("entropy"),
    )


@register(
    "constraint_report",
    """
    WITH checks AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS null_orderkey,
             SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                      THEN 1 ELSE 0 END) AS qty_out_of_range,
             SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                      THEN 1 ELSE 0 END) AS discount_out_of_range,
             SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_shipdate
      FROM lineitem),
    dupes AS (
      SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS dup_key_rows
      FROM (SELECT COUNT(*) AS n FROM lineitem
            GROUP BY l_orderkey, l_linenumber) g),
    orphans AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS orphan_lineitems
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL)
    SELECT CAST(c.n_rows AS BIGINT) AS n_rows,
           CAST(c.null_orderkey AS BIGINT) AS null_orderkey,
           CAST(c.qty_out_of_range AS BIGINT) AS qty_out_of_range,
           CAST(c.discount_out_of_range AS BIGINT) AS discount_out_of_range,
           CAST(c.null_shipdate AS BIGINT) AS null_shipdate,
           d.dup_key_rows, f.orphan_lineitems
    FROM checks c CROSS JOIN dupes d CROSS JOIN orphans f
    """,
    tags=("quality", "constraints", "validation"),
    bench=True,
)
def q_constraint_report(spark, sf_dir):
    """Declarative data-quality constraint report (the Deequ/dbt-tests
    shape), three independent column-pruned passes — the shape the
    round-11 paired adjudication of round 10's regression settled on:

    1. Row-local rules (not-null, range): ONE whole-relation aggregate,
       no join — map-side partials reduce each task to one row, the
       exchange carries ~#partitions rows.
    2. dup_key_rows: the per-key groupBy over ONLY the two key columns.
       The near-unique-key shuffle is unavoidable for an exact duplicate
       count; what is avoidable is its width.
    3. orphan_lineitems: broadcast LEFT ANTI join of the 1-column key
       projection against the parent keys. Anti-join counting is
       duplicate-safe for ARBITRARY parent data (a duplicated o_orderkey
       can fan out a LEFT join and inflate counts — the r10 fold's
       latent trap — but never an anti-join), and n_rows never touches a
       join at all.

    Adjudication record: round 10 folded everything into the dup-key
    groupBy (1 scan, but every fact row shuffled six longs wider) — the
    driver measured 0.44->0.73 s; round 11 first tried a 2-pass hybrid
    (row-local + orphan flag fused via broadcast-left-join over distinct
    parent keys) — interleaved A/B at sf0.1/32c: r9 three-pass 0.602 s,
    r10 single-pass 0.670 s, hybrid 0.736 s. The three passes each read
    a 1-2-4 column subset of a columnar file (~the same total bytes as
    one wide scan), so the "3 scans -> 1" fold never bought I/O at any
    scale; it only bought the wide shuffle. Three cheap passes win at
    bench scale AND keep the narrowest possible exchange at 100 TB."""
    from pyspark.sql import functions as F

    from ..tables import table

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def viol(cond, name):
        return (
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)
        )

    checks = l.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        viol(F.col("l_orderkey").isNull(), "null_orderkey"),
        viol(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "qty_out_of_range",
        ),
        viol(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
            "discount_out_of_range",
        ),
        viol(F.col("l_shipdate").isNull(), "null_shipdate"),
    )
    dupes = (
        l.select("l_orderkey", "l_linenumber")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("bigint")
            .alias("dup_key_rows")
        )
    )
    orphans = (
        l.select("l_orderkey")
        .join(
            F.broadcast(o.select("o_orderkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_lineitems"))
    )
    return checks.crossJoin(dupes).crossJoin(orphans).select(
        "n_rows", "null_orderkey", "qty_out_of_range",
        "discount_out_of_range", "null_shipdate", "dup_key_rows",
        "orphan_lineitems",
    )


@register(
    "bigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT SUM(cnt) AS total_tokens FROM vocab),
    bigidx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
               FROM toks WHERE len(t) >= 2),
    big AS (SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i + 1 AS INT)] AS w2
            FROM bigidx),
    bigc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2)
    SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(
             CAST(SUM(CAST(ln(
                 0.8 * (CAST(bc.c12 AS DOUBLE) / CAST(v1.cnt AS DOUBLE))
                 + (1.0 - 0.8) * (CAST(v2.cnt AS DOUBLE)
                                  / CAST(tot.total_tokens AS DOUBLE))
               ) AS DECIMAL(18,9))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS mean_logprob
    FROM big b
    JOIN bigc bc USING (w1, w2)
    JOIN vocab v1 ON v1.token = b.w1
    JOIN vocab v2 ON v2.token = b.w2
    CROSS JOIN tot
    GROUP BY b.doc_id
    """,
    tags=("llm", "quality", "langmodel"),
)
def q_bigram_logprob(spark, sf_dir):
    """Jelinek-Mercer-interpolated bigram LM score (λ=0.8) — the next rung
    of the perplexity gate after `unigram_logprob`. λ and (1.0−0.8) are
    evaluated as the same IEEE doubles in both engines (Sterbenz-exact
    subtraction), so the single-expression probability is bit-identical."""
    return P.bigram_logprob(table(spark, sf_dir, "documents"), lam=0.8)


VOCAB_TOP = 100


@register(
    "vocab_coverage",
    f"""
    WITH tok AS (
      SELECT unnest({_SQL_TOKS}) AS token FROM documents),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    ranked AS (
      SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank,
             SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM vocab)
    SELECT rank, token, CAST(cnt AS BIGINT) AS cnt,
           CAST(cum AS DOUBLE) / CAST(tot.total AS DOUBLE) AS cum_share
    FROM ranked CROSS JOIN tot
    WHERE rank <= {VOCAB_TOP}
    """,
    tags=("llm", "tokenizer", "vocab"),
)
def q_vocab_coverage(spark, sf_dir):
    """Vocabulary-building statistic: the top-{100} corpus tokens by
    frequency with cumulative corpus-coverage share — what a tokenizer
    trainer reads to size its vocab (the knee of cum_share vs rank) and
    what a drift monitor compares across snapshots.

    The global ordered prefix-sum window runs over the AGGREGATED vocab
    relation, not the corpus: the token-count groupBy reduces 100 TB of
    text to |vocab| rows (~10^7 even web-scale — MBs), so the
    single-partition window is bounded by vocabulary size by construction.
    The total and the share division are exact bigint / one double
    expression (identical in the oracle)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(T.tokens()).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = vocab.select(
        "token",
        "cnt",
        F.row_number().over(w).alias("rank"),
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    ).filter(F.col("rank") <= VOCAB_TOP)
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rank",
        "token",
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
    )


_AES_WEIGHT_SQL = (
    "CASE WHEN n_chars >= 300 THEN 1.0 "
    "WHEN n_chars >= 150 THEN 0.5 ELSE 0.25 END"
)


def _aes_weight_col():
    from pyspark.sql import functions as F

    return (
        F.when(F.col("n_chars") >= 300, F.lit(1.0))
        .when(F.col("n_chars") >= 150, F.lit(0.5))
        .otherwise(F.lit(0.25))
        .cast("double")
    )


from ..operators.sketches import weighted_sample_oracle_sql  # noqa: E402


@register(
    "weighted_reservoir_sample",
    weighted_sample_oracle_sql("documents", _AES_WEIGHT_SQL, k=100),
    tags=("sampling", "weighted", "reservoir"),
)
def q_weighted_reservoir_sample(spark, sf_dir):
    """Fixed-size weighted sample (Efraimidis-Spirakis exponential race,
    md5-derived — no RNG) — the fixed-k counterpart of the Bernoulli
    `quality_weighted_sample`; salted two-phase k-largest (see
    operators/sketches.py)."""
    from ..operators.sketches import weighted_sample_topk

    return weighted_sample_topk(
        table(spark, sf_dir, "documents"), _aes_weight_col(), k=100
    )



_HOLDOUT_LAM = 0.8
_SQL_TOKS_Q = "list_filter(str_split(text, ' '), x -> x <> '')"


@register(
    "heldout_perplexity",
    f"""
    WITH tr AS (SELECT {_SQL_TOKS_Q} AS t FROM documents
                WHERE doc_id % 2 = 0),
    trbig AS (
      SELECT t[CAST(i AS INT)] AS w1, t[CAST(i + 1 AS INT)] AS w2
      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM tr
            WHERE len(t) >= 2)),
    bigc AS (SELECT w1, w2, COUNT(*) AS c12 FROM trbig GROUP BY w1, w2),
    vocab AS (
      SELECT unnest(t) AS token FROM tr),
    vc AS (SELECT token, COUNT(*) AS cnt FROM vocab GROUP BY token),
    scalars AS (SELECT SUM(cnt) AS total_tokens, COUNT(*) AS v_size FROM vc),
    te AS (SELECT doc_id, {_SQL_TOKS_Q} AS t FROM documents
           WHERE doc_id % 2 = 1),
    tebig AS (
      SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i + 1 AS INT)] AS w2
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM te
            WHERE len(t) >= 2)),
    scored AS (
      SELECT b.doc_id,
             CAST(ln(
               CASE WHEN v1.cnt IS NOT NULL AND bc.c12 IS NOT NULL
                    THEN {_HOLDOUT_LAM} * (CAST(bc.c12 AS DOUBLE)
                                           / CAST(v1.cnt AS DOUBLE))
                    ELSE 0.0 END
               + {1.0 - _HOLDOUT_LAM} * ((CAST(COALESCE(v2.cnt, 0) AS DOUBLE) + 1.0)
                          / (CAST(s.total_tokens AS DOUBLE)
                             + CAST(s.v_size AS DOUBLE) + 1.0))
             ) AS DECIMAL(18,9)) AS lp
      FROM tebig b
      LEFT JOIN bigc bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
      LEFT JOIN vc v1 ON v1.token = b.w1
      LEFT JOIN vc v2 ON v2.token = b.w2
      CROSS JOIN scalars s)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS mean_logprob,
           ROUND(exp(-ROUND(CAST(SUM(lp) AS DOUBLE)
                            / CAST(COUNT(*) AS DOUBLE), 6)), 6) AS perplexity
    FROM scored GROUP BY doc_id
    """,
    tags=("llm", "quality", "langmodel", "heldout"),
)
def q_heldout_perplexity(spark, sf_dir):
    """Held-out LM evaluation: bigram JM model fitted on even doc_ids,
    perplexity scored over odd doc_ids (the train/validation workflow of
    a perplexity data gate — `bigram_logprob` is the in-sample form).
    OOV-safe by add-one unigram flooring; see
    operators/pipeline.py:bigram_heldout_logprob."""
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents")
    return P.bigram_heldout_logprob(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        lam=_HOLDOUT_LAM,
    )


_MAD_K = 0.6745  # Phi^-1(0.75): scales MAD to sigma-equivalent
_MAD_CUT = 3.5  # Iglewicz-Hoaglin modified z-score cutoff


@register(
    "robust_outliers_mad",
    f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type),
    z AS (
      SELECT d.event_id, d.event_type, d.value,
             CAST(ROUND({_MAD_K} * (d.value - d.med) / m.mad, 6)
                  AS DECIMAL(18,6)) AS rz
      FROM dev d JOIN mad m USING (event_type)
      WHERE m.mad > 0)
    SELECT event_id, event_type, value, CAST(rz AS DOUBLE) AS robust_z
    FROM z WHERE ABS(rz) > {_MAD_CUT}
    """,
    tags=("quality", "outliers", "robust-stats"),
)
def q_robust_outliers_mad(spark, sf_dir):
    """Median/MAD modified z-score outlier flagging (Iglewicz-Hoaglin
    |z*| > 3.5) — the robust sibling of `value_zscore_outliers` (mean/std
    break under the heavy tails they are supposed to flag). Two exact
    percentile aggregations (group-wise medians broadcast back; at 100 TB
    both swap to approx_percentile sketches); the decision compares the
    ROUNDED decimal z in both engines so the flag boundary is identical."""
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    rz = F.round(
        F.lit(_MAD_K) * (F.col("value") - F.col("med")) / F.col("mad"), 6
    ).cast("decimal(18,6)")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_id", "event_type", "value", rz.alias("rz")
        )
        .filter(F.abs(F.col("rz")) > _MAD_CUT)
        .select(
            "event_id", "event_type", "value",
            F.col("rz").cast("double").alias("robust_z"),
        )
    )


@register(
    "kneser_ney_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    bigidx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
               FROM toks WHERE len(t) >= 2),
    big AS (SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i + 1 AS INT)] AS w2
            FROM bigidx),
    bigc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n_follow
            FROM bigc GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n_prec FROM bigc GROUP BY w2),
    types AS (SELECT COUNT(*) AS n_types FROM bigc)
    SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(
             CAST(SUM(CAST(ln(
                 GREATEST(CAST(bc.c12 AS DOUBLE) - 0.75, 0.0)
                   / CAST(cx.c1 AS DOUBLE)
                 + (0.75 * CAST(cx.n_follow AS DOUBLE)
                    / CAST(cx.c1 AS DOUBLE))
                   * (CAST(cn.n_prec AS DOUBLE) / CAST(ty.n_types AS DOUBLE))
               ) AS DECIMAL(18,9))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS mean_logprob
    FROM big b
    JOIN bigc bc USING (w1, w2)
    JOIN ctx cx ON cx.w1 = b.w1
    JOIN cont cn ON cn.w2 = b.w2
    CROSS JOIN types ty
    GROUP BY b.doc_id
    """,
    tags=("llm", "quality", "langmodel", "kneser-ney"),
    bench=True,
)
def q_kneser_ney_logprob(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM score (D=0.75) — the standard
    smoothing above the JM mix: absolute discounting plus a
    distinct-CONTINUATION backoff (how many contexts complete w2, not
    how often w2 occurs). Every ingredient is a relational count, so the
    full KN probability is hash-certified cross-engine — the literature
    smoothing family (unigram -> JM -> KN) is now certifiable end to
    end."""
    return P.kneser_ney_logprob(table(spark, sf_dir, "documents"))
