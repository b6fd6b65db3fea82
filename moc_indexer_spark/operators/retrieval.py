"""BM25 full-text retrieval over the documents corpus.

No reference analog (BASELINE.json north star: the text-side complement of
the embedding ANN family in operators/similarity.py) — a training-data
pipeline needs lexical retrieval for benchmark-decontamination lookups,
quality-probe queries, and hard-negative mining next to its vector index.

Spark-first shape (all Catalyst expressions, zero Python):

* postings: explode tokens -> one map-side-combining groupBy into
  (doc_id, term, tf). The ONLY corpus-sized shuffle; it is the inverted
  index build, linear in corpus tokens with 8-byte-ish keys.
* document-frequency + length stats reduce to |vocab| and 1-row
  relations; they and the query term set broadcast to the probe join,
  so scoring never reshuffles the corpus.
* Scoring touches only postings rows whose term appears in a query —
  the broadcast semi-join prunes the other ~100% of the index before
  any arithmetic runs.

Cross-engine determinism (driver hash-compare vs DuckDB): the BM25
term score is ONE double expression with identical operand order in both
engines, rounded to DECIMAL(18,9) before the per-(query,doc) sum — the
exact-decimal aggregation makes the sum order-independent, and ln()'s
last-ulp risk is absorbed by the round (same pattern as bigram_logprob).
Top-k ranks under the total order (score desc, doc_id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

K1 = 1.2
B = 0.75
TOP_K = 10

# fixed probe queries over the synthetic corpus vocabulary; real
# deployments pass any (query_id, query_text) relation
QUERIES = [
    (0, "hash join merge"),
    (1, "table scan fast"),
    (2, "spark window sort"),
    (3, "batch row value"),
]


def _index_relations(docs: DataFrame):
    """(postings, lengths, dfreq, stats) — the four index relations."""
    toks = docs.select("doc_id", T.tokens().alias("t")).filter(F.size("t") > 0)
    lengths = toks.select("doc_id", F.size("t").cast("bigint").alias("dl"))
    postings = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    stats = lengths.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    return postings, lengths, dfreq, stats


def _qterms(spark, queries: list[tuple[int, str]]) -> DataFrame:
    return spark.createDataFrame(
        [(qid, t) for qid, qtext in queries for t in qtext.split(" ")],
        "query_id int, term string",
    ).distinct()


def _score_probe(
    postings: DataFrame,
    lengths: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    # probe: broadcast the query terms (tiny) and the per-term df rows
    # that survive the semi-join; corpus postings never reshuffle
    probe = (
        postings.join(F.broadcast(qterms), "term")
        .join(
            F.broadcast(qterms.join(dfreq, "term"))
            .select("term", "df")
            .distinct(),
            "term",
        )
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    return _score_rank(probe, k, k1, b)


def _score_rank(probe: DataFrame, k: int, k1: float, b: float) -> DataFrame:
    """(query_id, doc_id, tf, dl, df, n_docs, sum_dl) rows -> ranked top-k.

    One definition of the BM25 arithmetic for both the ad-hoc and the
    persisted-index probe, so the two paths stay bit-identical."""
    n_d = F.col("n_docs").cast("double")
    df_d = F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_d
    idf = F.round(
        F.log((n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5)) + F.lit(1.0)), 9
    ).cast("decimal(18,9)")
    tf_norm = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl_d / avgdl)
    )
    term_score = F.round(idf.cast("double") * tf_norm, 9).cast("decimal(18,9)")

    scored = probe.select("query_id", "doc_id", term_score.alias("s")).groupBy(
        "query_id", "doc_id"
    ).agg(F.sum("s").alias("score_dec"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_dec"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("int"),
            F.col("rank").cast("int"),
            "doc_id",
            F.col("score_dec").cast("double").alias("score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]] | None = None,
    k: int = TOP_K,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k docs per query under BM25 (Robertson/Okapi, Lucene idf form
    ln(1 + (N - df + 0.5)/(df + 0.5))).

    Returns (query_id int, rank int, doc_id bigint, score double).
    """
    queries = QUERIES if queries is None else queries
    # Ad-hoc (no persisted index) form, restructured so the corpus is
    # tokenized TWICE instead of four times and shuffled ONCE instead of
    # twice. The four separate index relations each re-evaluated the
    # tokenize/explode subtree (Spark re-executes every DataFrame
    # reference; exchange reuse does not fire because column pruning
    # makes the copies non-identical):
    #   * dl rides the postings groupBy as first("dl") — dl is constant
    #     within a (doc_id, term) group — so the per-doc lengths relation
    #     and its probe-side join disappear outright;
    #   * df is a window count over the query-term-pruned postings: the
    #     pruned relation holds EVERY (doc_id, term) row for each probed
    #     term, so count(1) over partitionBy(term) equals the full-corpus
    #     document frequency, computed on |probed terms| * df rows instead
    #     of a second corpus-wide explode + groupBy;
    #   * stats stays a second tokenize pass (a global scalar cannot ride
    #     a keyed window), but it is a map + 1-row aggregate — no explode,
    #     no shuffle of substance.
    # The persisted-index path (`build_bm25_index` / `bm25_topk_from_index`)
    # keeps the four-relation layout: there each relation is ONE parquet
    # scan, so the duplication this form removes never existed.
    qterms = _qterms(docs.sparkSession, queries)
    toks = docs.select("doc_id", T.tokens().alias("t")).filter(F.size("t") > 0)
    postings = (
        toks.select("doc_id", F.size("t").cast("bigint").alias("dl"),
                    F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.first("dl").alias("dl"),
        )
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("t")).cast("bigint").alias("sum_dl"),
    )
    pruned = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    probe = (
        pruned.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term")).cast("bigint")
        )
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
    )
    return _score_rank(probe, k, k1, b)


def build_bm25_index(docs: DataFrame, path: str, n_files: int = 8) -> None:
    """Materialize the inverted index: postings range-clustered by term
    (every parquet row group covers a narrow term range, so a probe's
    term-IN filter prunes row groups at the scan — the data-skipping
    property that makes a persisted text index a point-lookup at 100 TB),
    plus the lengths / dfreq / stats side relations."""
    from ..tables import write_clustered

    postings, lengths, dfreq, stats = _index_relations(docs)
    write_clustered(
        postings, f"{path}/postings", ("term",), n_files=n_files,
        small_row_groups=True,
    )
    lengths.write.mode("overwrite").parquet(f"{path}/lengths")
    dfreq.write.mode("overwrite").parquet(f"{path}/dfreq")
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_from_index(
    spark,
    path: str,
    queries: list[tuple[int, str]] | None = None,
    k: int = TOP_K,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Probe a persisted index: identical results to `bm25_topk` over the
    same corpus (certified in tests); the postings scan carries a pushed
    `term IN (...)` filter against the term-clustered layout."""
    queries = QUERIES if queries is None else queries
    terms = sorted({t for _, qtext in queries for t in qtext.split(" ")})
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("term").isin(terms)
    )
    return _score_probe(
        postings,
        spark.read.parquet(f"{path}/lengths"),
        spark.read.parquet(f"{path}/dfreq"),
        spark.read.parquet(f"{path}/stats"),
        _qterms(spark, queries),
        k, k1, b,
    )


def bm25_oracle_sql(
    queries: list[tuple[int, str]] | None = None,
    k: int = TOP_K,
    k1: float = K1,
    b: float = B,
    sql_toks: str = "list_filter(str_split(text, ' '), x -> x <> '')",
) -> str:
    """The same BM25 computation as DuckDB SQL (identical expression
    shapes; see module docstring for the determinism argument)."""
    queries = QUERIES if queries is None else queries
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, qtext in queries
        for t in sorted(set(qtext.split(" ")))
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {sql_toks} AS t FROM documents),
    nz AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
    lengths AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM nz),
    postings AS (
      SELECT doc_id, unnest(t) AS term FROM nz),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM postings GROUP BY doc_id, term),
    dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl FROM lengths),
    qterms AS (SELECT * FROM (VALUES {qvals}) AS q(query_id, term)),
    scoredterms AS (
      SELECT q.query_id, f.doc_id,
             CAST(ROUND(
               CAST(CAST(ROUND(ln(
                   (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                   / (CAST(d.df AS DOUBLE) + 0.5) + 1.0
                 ), 9) AS DECIMAL(18,9)) AS DOUBLE)
               * ((CAST(f.tf AS DOUBLE) * CAST({k1 + 1.0} AS DOUBLE))
                  / (CAST(f.tf AS DOUBLE)
                     + CAST({k1} AS DOUBLE)
                       * (1.0 - CAST({b} AS DOUBLE)
                          + CAST({b} AS DOUBLE) * CAST(l.dl AS DOUBLE)
                            / (CAST(s.sum_dl AS DOUBLE)
                               / CAST(s.n_docs AS DOUBLE))))),
               9) AS DECIMAL(18,9)) AS s
      FROM tf f
      JOIN qterms q ON q.term = f.term
      JOIN dfreq d ON d.term = f.term
      JOIN lengths l ON l.doc_id = f.doc_id
      CROSS JOIN stats s),
    agg AS (
      SELECT query_id, doc_id, SUM(s) AS score_dec
      FROM scoredterms GROUP BY query_id, doc_id),
    ranked AS (
      SELECT query_id, doc_id, score_dec,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY score_dec DESC, doc_id ASC) AS rank
      FROM agg)
    SELECT CAST(query_id AS INT) AS query_id, CAST(rank AS INT) AS rank,
           doc_id, CAST(score_dec AS DOUBLE) AS score
    FROM ranked WHERE rank <= {k}
    """
