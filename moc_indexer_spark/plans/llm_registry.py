"""Registry batch 3: LLM-data-pipeline operators (SURVEY.md §7 Phase 6).

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), embedding similarity
search (brute-force + LSH), text analysis (stats, quality, language score,
fingerprints). Oracle-checked where SQL-expressible; LSH variants whose
output is exact-verified against shingle Jaccard share the exact oracle
(deterministic: xxhash64 has a fixed seed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup as D
from ..operators import similarity as S
from ..tables import table
from .registry import register

# shared SQL fragments (DuckDB side) — keep in lockstep with functions/text.py
SQL_TOKS = "list_filter(str_split(text, ' '), x -> x <> '')"
SQL_STOPWORDS = "(x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'in')"
NGRAM_N = 3
JACCARD_THRESHOLD = 0.8

# distinct 3-gram shingles from 1-based token list (duckdb list_slice is
# inclusive): starts 1..len-2  ->  range(1, len-1) (exclusive end)
SQL_SHINGLES = (
    f"list_distinct(list_transform(range(1, len(t) - {NGRAM_N - 2}), "
    f"i -> array_to_string(list_slice(t, i, i + {NGRAM_N - 1}), ' ')))"
)

_JACCARD_PAIR_CTES = f"""
    toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES} AS s FROM toks WHERE len(t) >= {NGRAM_N}),
    pairs AS (
      SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
               AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)"""

_JACCARD_ORACLE = f"""
    WITH {_JACCARD_PAIR_CTES}
    SELECT doc_i, doc_j, jaccard FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}
    """

# Connected components over the near-dup pair graph as a transitive-closure
# recursive CTE: `walk` enumerates every (vertex, reachable vertex) pair
# (UNION dedups, so it terminates), then each vertex labels itself with the
# smallest id it can reach — exactly dedup_clusters' min-label fixpoint.
# Quadratic in component size, which is fine for an oracle: near-dup
# components are pairs/triples.
_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE {_JACCARD_PAIR_CTES},
    hits AS (
      SELECT doc_i, doc_j FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}),
    edges AS (
      SELECT doc_i AS src, doc_j AS dst FROM hits
      UNION ALL
      SELECT doc_j AS src, doc_i AS dst FROM hits),
    walk (id, reach) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src)
    SELECT id AS doc_id, LEAST(id, MIN(reach)) AS cluster_id
    FROM walk GROUP BY id
    """


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    tags=("llm", "dedup"),
    bench=True,
)
def q_dedup_exact(spark, sf_dir):
    return D.exact_duplicates(table(spark, sf_dir, "documents"))


@register(
    "ngram_dup_pairs",
    _JACCARD_ORACLE,
    tags=("llm", "dedup", "jaccard"),
)
def q_ngram_dup_pairs(spark, sf_dir):
    """Exact near-dup pairs; Spark uses the shingle inverted-index join (the
    oracle brute-forces all pairs — same result, different plan). The
    certification leg for the guarded production form below: its Σdf²
    posting-list cost is intrinsic to UNguarded semantics (a shingle in f
    docs contributes C(f,2) candidates), which is why the bench headline
    runs `ngram_dup_pairs_guarded` instead."""
    return D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )


# guarded form: stop shingles with document frequency >= STOP_MIN_DF are
# anti-joined out of the inverted index BEFORE set sizes, so jaccard is
# over the FILTERED shingle sets — different semantics from the plain
# form wherever hot shingles carried the overlap (at sf0.01 this prunes
# 22-of-25-pair results: the guard is exercised, not a no-op).
STOP_MIN_DF = 3

_GUARDED_JACCARD_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    sh0 AS (
      SELECT doc_id, unnest({SQL_SHINGLES}) AS shingle
      FROM toks WHERE len(t) >= {NGRAM_N}),
    stop AS (
      SELECT shingle FROM sh0
      GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= {STOP_MIN_DF}),
    kept AS (
      SELECT doc_id, shingle FROM sh0 ANTI JOIN stop USING (shingle)),
    s AS (
      SELECT doc_id, list(shingle) AS s FROM kept GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
                      AS DOUBLE) AS jaccard
      FROM s a JOIN s b ON a.doc_id < b.doc_id)
    SELECT doc_i, doc_j, jaccard FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}
    """


@register(
    "ngram_dup_pairs_guarded",
    _GUARDED_JACCARD_ORACLE,
    tags=("llm", "dedup", "jaccard", "stop-shingles"),
    bench=True,
)
def q_ngram_dup_pairs_guarded(spark, sf_dir):
    """Production near-dup form: the `boilerplate_shingles` heavy-hitter
    feed wired in-plan as `stop_shingles=` (operators/dedup.py
    `_hashed_shingles` anti-join). The oracle RE-DERIVES jaccard over the
    stop-filtered shingle sets, so the guard's semantics — not just its
    empty-list invariance — are oracle-pinned. At 100 TB this is the form
    that keeps the inverted-index join linear: a boilerplate line in 1%
    of docs contributes C(f,2) candidate pairs to the plain form."""
    docs = table(spark, sf_dir, "documents")
    stop = D.boilerplate_shingles(docs, n=NGRAM_N, min_df=STOP_MIN_DF)
    return D.ngram_jaccard_pairs(
        docs, n=NGRAM_N, threshold=JACCARD_THRESHOLD, stop_shingles=stop
    )


@register(
    "minhash_dup_pairs",
    _JACCARD_ORACLE,
    tags=("llm", "dedup", "minhash", "lsh"),
    bench=True,
)
def q_minhash_dup_pairs(spark, sf_dir):
    """MinHash-LSH candidates + exact verify. Shares the exact-Jaccard
    oracle: candidate recall at 16x2 banding for j>=0.8 is 1-(1-j^2)^16
    (>0.9999998), and the verify step makes precision exact; xxhash64's
    fixed seed makes the whole thing deterministic."""
    return D.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        n=NGRAM_N,
        k=32,
        bands=16,
        threshold=JACCARD_THRESHOLD,
    )


@register("simhash_pairs", None, tags=("llm", "dedup", "simhash"), bench=True)
def q_simhash_pairs(spark, sf_dir):
    """SimHash hamming<=3 pairs via pigeonhole chunk join (rows-only check:
    signature semantics are engine-specific; pytest cross-checks against
    exact Jaccard pairs)."""
    return D.simhash_pairs(table(spark, sf_dir, "documents"), max_hamming=3)


@register(
    "text_stats",
    f"""
    WITH toks AS (SELECT doc_id, lang, n_chars, {SQL_TOKS} AS t FROM documents)
    SELECT doc_id, lang, n_chars,
           CAST(len(t) AS BIGINT) AS token_count,
           CAST(len(list_distinct(t)) AS BIGINT) AS distinct_tokens,
           CAST(len(list_filter(t, x -> {SQL_STOPWORDS})) AS BIGINT) AS stopword_count
    FROM toks
    """,
    tags=("llm", "text"),
    bench=True,
)
def q_text_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        T.token_count().alias("token_count"),
        T.distinct_token_count().alias("distinct_tokens"),
        T.stopword_count().alias("stopword_count"),
    )


@register(
    "text_quality",
    f"""
    WITH s AS (
      SELECT doc_id, n_chars,
             CAST(len({SQL_TOKS}) AS BIGINT) AS tc,
             CAST(len(list_distinct({SQL_TOKS})) AS BIGINT) AS dt,
             CAST(len(list_filter({SQL_TOKS}, x -> {SQL_STOPWORDS})) AS BIGINT) AS sw
      FROM documents)
    SELECT doc_id,
           CAST(sw AS DOUBLE) / CAST(tc AS DOUBLE) AS stopword_ratio,
           CAST(dt AS DOUBLE) / CAST(tc AS DOUBLE) AS distinct_ratio,
           CAST(n_chars AS DOUBLE) / CAST(tc AS DOUBLE) AS avg_token_span,
           (CAST(sw AS DOUBLE) / CAST(tc AS DOUBLE)) * 0.3
             + (CAST(dt AS DOUBLE) / CAST(tc AS DOUBLE)) * 0.4
             + LEAST(CAST(tc AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score
    FROM s WHERE tc > 0
    """,
    tags=("llm", "text"),
)
def q_text_quality(spark, sf_dir):
    """Heuristic quality scoring (length / stopword / vocabulary-diversity
    ratios) — the filter stage of a training-data pipeline."""
    d = table(spark, sf_dir, "documents")
    tc = T.token_count().alias("tc")
    s = d.select("doc_id", "n_chars", tc,
                 T.distinct_token_count().alias("dt"),
                 T.stopword_count().alias("sw")).filter(F.col("tc") > 0)
    swr = F.col("sw").cast("double") / F.col("tc").cast("double")
    dr = F.col("dt").cast("double") / F.col("tc").cast("double")
    span = F.col("n_chars").cast("double") / F.col("tc").cast("double")
    score = swr * 0.3 + dr * 0.4 + F.least(
        F.col("tc").cast("double") / 100.0, F.lit(1.0)
    ) * 0.3
    return s.select(
        "doc_id",
        swr.alias("stopword_ratio"),
        dr.alias("distinct_ratio"),
        span.alias("avg_token_span"),
        score.alias("quality_score"),
    )


@register(
    "lang_id_heuristic",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
             CAST(len(list_filter({SQL_TOKS}, x -> {SQL_STOPWORDS})) AS BIGINT) AS en_hits,
             CAST(len({SQL_TOKS}) AS BIGINT) AS tc
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN tc > 0 AND CAST(en_hits AS DOUBLE) / CAST(tc AS DOUBLE) >= 0.05
                THEN 'en' ELSE 'unknown' END AS pred_lang
    FROM s
    """,
    tags=("llm", "text", "langid"),
)
def q_lang_id_heuristic(spark, sf_dir):
    """Stopword-density language ID (n-gram heuristic family). The synthetic
    corpus is English-ish regardless of its lang column — the operator is the
    deliverable, per-language stopword tables slot into the same shape."""
    d = table(spark, sf_dir, "documents")
    s = d.select("doc_id", "lang", T.stopword_count().alias("en_hits"),
                 T.token_count().alias("tc"))
    ratio = F.col("en_hits").cast("double") / F.col("tc").cast("double")
    return s.select(
        "doc_id",
        "lang",
        F.when((F.col("tc") > 0) & (ratio >= 0.05), "en")
        .otherwise("unknown")
        .alias("pred_lang"),
    )


@register(
    "doc_fingerprint",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents)
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint
    FROM toks
    """,
    tags=("llm", "text", "fingerprint"),
)
def q_doc_fingerprint(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", T.content_fingerprint().alias("fingerprint"))


# Brute-force cosine top-5 of every vector against the corpus — the shared
# oracle for every exact-by-construction ANN form (cosine_topk itself, IVF
# with full probing, PQ with exhaustive shortlist + exact re-rank).
_COSINE_TOPK_ORACLE = """
    WITH scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
    """


@register(
    "cosine_topk",
    _COSINE_TOPK_ORACLE,
    tags=("llm", "similarity", "ann"),
    bench=True,
)
def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for every vector (the exact-ANN baseline)
    in the BLOCKED all-pairs form: the query side here is the whole corpus,
    so the plan must not collect it to the driver — block cogroups + BLAS
    keep both sides distributed (only two scalar counts hit the driver).
    Similarity rounded to 6dp with neighbor_id tiebreak -> stable ordering
    across engines despite last-ulp float noise."""
    return S.brute_force_topk_blocked(table(spark, sf_dir, "embeddings"), k=5)


COSINE_DUP_THRESHOLD = 0.35


@register(
    "embedding_dup_pairs",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_i, b.vec_id AS vec_j,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT vec_i, vec_j, cosine_sim FROM pairs
    WHERE cosine_sim >= {COSINE_DUP_THRESHOLD}
    """,
    tags=("llm", "dedup", "similarity"),
)
def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: every (i<j) pair whose cosine
    similarity clears the threshold. All math is JVM-side expressions
    (zip_with product + aggregate fold, norms projected once per row) — no
    Python in the hot path. Threshold compares the 6dp-ROUNDED value on both
    engines so boundary pairs can't flip on last-ulp noise. The exact
    all-pairs form is the sf-test oracle; at 100 TB the identical filter runs
    after the LSH bucket join (lsh_ann_topk) instead of the n^2 self-join."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    e = e.withColumn(
        "n",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    )
    a = e.select(
        F.col("vec_id").alias("vec_i"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_j"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.join(b, F.col("vec_i") < F.col("vec_j"))
        .withColumn(
            "cosine_sim", F.round(dot / (F.col("na") * F.col("nb")), 6)
        )
        .filter(F.col("cosine_sim") >= COSINE_DUP_THRESHOLD)
        .select("vec_i", "vec_j", "cosine_sim")
    )


@register("lsh_ann_topk", None, tags=("llm", "similarity", "ann", "lsh"))
def q_lsh_ann_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN (the 100 TB scale path; approximate, so
    rows-only here — pytest measures recall vs the brute-force baseline).
    The corpus size feeding the adaptive plane count comes from the
    parquet footer (`parquet_rows`), so BUILDING this plan costs no Spark
    job (a count() here ran eagerly on every registry sweep)."""
    from ..tables import parquet_rows

    return S.lsh_bucket_topk(
        table(spark, sf_dir, "embeddings"), k=5,
        n=parquet_rows(sf_dir, "embeddings"),
    )


@register("ivf_ann_topk", None, tags=("llm", "similarity", "ann", "ivf"), bench=True)
def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN (the second 100 TB scale path next to LSH): sample-trained
    spherical-k-means cells, n_probe probed cells per query, exact verify.
    Approximate, so rows-only here — pytest measures recall vs brute force
    (0.67 @ n_probe=3 of 8 cells on the uniform synthetic vectors; real
    clustered embeddings probe far better). Default n_probe is a BOUNDED
    probe count (min(16, max(4, n_cells//8)), similarity.py) — the
    round-6 cap on round 5's sqrt(n)-growing default, itself the repair
    of IVFADC's round-4 exponent 1.63;
    `ivf_ann_exact` (n_probe == n_cells) stays the certification pin."""
    return S.ivf_topk(table(spark, sf_dir, "embeddings"), k=5)


@register("pq_ann_topk", None, tags=("llm", "similarity", "ann", "pq"), bench=True)
def q_pq_ann_topk(spark, sf_dir):
    """Product-quantization ANN (the third scale path — the one that
    COMPRESSES the index: vectors stored as m one-byte codes, ADC
    table-lookup scoring, exact re-rank of the shortlist). Approximate,
    so rows-only here — pytest measures recall vs brute force and checks
    every returned similarity is the true re-ranked cosine."""
    return S.pq_topk(table(spark, sf_dir, "embeddings"), k=5)


LINE_SEG = 8  # tokens per pseudo-line (the synthetic corpus is single-line)

# fixed token windows as "lines", expressed identically in both engines
_SQL_SEG_LINES = (
    f"list_transform(range(0, CAST(ceil(len(t) / {LINE_SEG}.0) AS BIGINT)), "
    f"i -> array_to_string(list_slice(t, i * {LINE_SEG} + 1, i * {LINE_SEG} + {LINE_SEG}), ' '))"
)


@register(
    "line_dedup_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    segs AS (
      SELECT doc_id, {_SQL_SEG_LINES} AS lines FROM toks),
    lines AS (
      SELECT doc_id, unnest(lines) AS line,
             generate_subscripts(lines, 1) AS pos
      FROM segs),
    dup AS (
      SELECT line FROM lines GROUP BY line
      HAVING COUNT(DISTINCT doc_id) >= 2),
    kept AS (
      SELECT l.* FROM lines l LEFT JOIN dup d ON l.line = d.line
      WHERE d.line IS NULL),
    rebuilt AS (
      SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id)
    SELECT s.doc_id, COALESCE(r.clean_text, '') AS clean_text,
           CAST(len(s.lines) AS BIGINT) AS n_lines,
           COALESCE(r.n_kept, 0) AS n_kept
    FROM segs s LEFT JOIN rebuilt r ON s.doc_id = r.doc_id
    """,
    tags=("llm", "dedup", "line-dedup"),
    bench=True,
)
def q_line_dedup_docs(spark, sf_dir):
    """RefinedWeb-style line-level dedup over the corpus: every pseudo-line
    (fixed 8-token window — the corpus has no newlines) occurring in >= 2
    distinct docs is removed everywhere, and documents are rebuilt from
    their surviving lines in order. The oracle re-derives removal AND
    reconstruction in SQL, so segmentation, cross-doc counting, and the
    order-preserving rebuild are all hash-checked."""
    d = table(spark, sf_dir, "documents")
    t = T.tokens("text")
    seg = F.when(
        F.size(t) > 0,
        F.transform(
            F.sequence(
                F.lit(0),
                (F.ceil(F.size(t) / F.lit(LINE_SEG)) - 1).cast("int"),
            ),
            lambda i: F.array_join(F.slice(t, i * LINE_SEG + 1, LINE_SEG), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return D.line_dedup(d, seg, min_dup_docs=2, sep=" ")


@register(
    "ivf_ann_exact",
    _COSINE_TOPK_ORACLE,
    tags=("llm", "similarity", "ann", "ivf", "exact"),
)
def q_ivf_ann_exact(spark, sf_dir):
    """IVF with n_probe == n_cells: every query probes every cell, so the
    probed-cell search degenerates to exact brute force — which means the
    brute-force oracle certifies the ENTIRE IVF machinery (sample-trained
    quantizer, Arrow assign+probe pass, cogrouped per-cell BLAS scoring,
    lossless per-cell top-k prune, final rank window) end-to-end by hash,
    not just by a recall bound."""
    return S.ivf_topk(
        table(spark, sf_dir, "embeddings"), k=5, n_cells=8, n_probe=8
    )


@register(
    "pq_ann_exact",
    _COSINE_TOPK_ORACLE,
    tags=("llm", "similarity", "ann", "pq", "exact"),
)
def q_pq_ann_exact(spark, sf_dir):
    """PQ with an exhaustive ADC shortlist (refine=None): every candidate
    survives the ADC prune and the exact-cosine re-rank becomes brute
    force — so the brute-force oracle certifies the PQ machinery (codebook
    training, Arrow encode pass, broadcast-LUT ADC scan, re-rank join,
    rank window) end-to-end by hash. The production form (pq_ann_topk)
    runs the same plan with a k*refine shortlist."""
    return S.pq_topk(table(spark, sf_dir, "embeddings"), k=5, refine=None)


@register(
    "ivfpq_ann_exact",
    _COSINE_TOPK_ORACLE,
    tags=("llm", "similarity", "ann", "ivf", "pq", "exact"),
)
def q_ivfpq_ann_exact(spark, sf_dir):
    """Composed IVF+PQ (the FAISS IVFADC production shape) in exact
    mode: n_probe == n_cells makes the cell prune lossless and
    refine=None makes the ADC shortlist exhaustive, so the brute-force
    oracle hash-certifies the ENTIRE composed machinery — coarse
    quantizer training, the fused assign+probe+encode Arrow pass, the
    per-cell codes-only ADC blocks, the shortlist merge window, and the
    exact re-rank tail — end-to-end, not just a recall bound."""
    return S.ivfpq_topk(
        table(spark, sf_dir, "embeddings"),
        k=5, n_cells=8, n_probe=8, refine=None,
    )


@register(
    "ivfpq_ann_topk", None, tags=("llm", "similarity", "ann", "ivf", "pq"),
    bench=True,
)
def q_ivfpq_ann_topk(spark, sf_dir):
    """Production IVF+PQ config: cell-pruned ADC scan + k*refine exact
    re-rank (rows-only — recall measured vs brute force in pytest and
    reported by ann_recall_report)."""
    return S.ivfpq_topk(table(spark, sf_dir, "embeddings"), k=5)


@register(
    "embedding_norms",
    """
    SELECT vec_id, label,
           ROUND(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')), 6) AS l2_norm
    FROM embeddings
    """,
    tags=("llm", "similarity"),
)
def q_embedding_norms(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(
                F.aggregate(v, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
            ),
            6,
        ).alias("l2_norm"),
    )


@register(
    "dedup_clusters",
    _CLUSTERS_ORACLE,
    tags=("llm", "dedup", "iterative"),
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters via iterative min-label propagation over the
    exact-Jaccard pair graph. Oracle: DuckDB WITH RECURSIVE transitive
    closure + min-reachable-label — a different algorithm computing the
    same fixpoint, so the hash compare certifies the distributed label
    propagation end-to-end (pytest additionally checks a Python
    transitive-closure reference)."""
    pairs = D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )
    return D.dedup_clusters(pairs)


@register(
    "value_percentiles",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (data-quality profiling of
    a training pipeline; at 100 TB swap percentile -> approx_percentile,
    which is the mergeable-sketch path)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "token_count_bpe",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS bpe_token_count,
           CAST(len(list_filter(str_split(text, ' '), x -> x <> '')) AS BIGINT) AS ws_token_count
    FROM documents
    """,
    tags=("llm", "text", "tokenize"),
)
def q_token_count_bpe(spark, sf_dir):
    """Token counting two ways (SURVEY §7): whitespace and a BPE-ish
    pre-tokenizer regex (letters / digits / single punctuation) — the
    cost-estimation primitive of LLM data pipelines."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_RE)).cast("bigint").alias("bpe_token_count"),
        T.token_count().alias("ws_token_count"),
    )


@register(
    "trigram_freqs",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    sh AS (SELECT unnest({SQL_SHINGLES}) AS shingle FROM toks
           WHERE len(t) >= {NGRAM_N}),
    freq AS (SELECT shingle, COUNT(*) AS freq FROM sh GROUP BY shingle)
    SELECT shingle, freq FROM freq ORDER BY freq DESC, shingle LIMIT 20
    """,
    tags=("llm", "text", "ngram"),
)
def q_trigram_freqs(spark, sf_dir):
    """Corpus n-gram frequency table (LM data analysis): distinct-per-doc
    trigrams -> global counts -> top-k with lexicographic tiebreak."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(T.tokens().alias("t")).filter(F.size("t") >= NGRAM_N)
    sh = toks.select(F.explode(T.shingles(F.col("t"), NGRAM_N)).alias("shingle"))
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("shingle"))
        .limit(20)
    )


QUALITY_GATE = 0.36
MIN_TOKENS = 10


@register(
    "training_corpus_filter",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES} AS s FROM toks WHERE len(t) >= {NGRAM_N}),
    pairs AS (
      SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
               AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
    near_drop AS (
      SELECT DISTINCT doc_j AS doc_id FROM pairs
      WHERE jaccard >= {JACCARD_THRESHOLD}),
    exact_drop AS (
      SELECT doc_id FROM (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        FROM documents) WHERE doc_id <> keeper),
    s AS (
      SELECT doc_id, n_chars,
             CAST(len({SQL_TOKS}) AS BIGINT) AS tc,
             CAST(len(list_distinct({SQL_TOKS})) AS BIGINT) AS dt,
             CAST(len(list_filter({SQL_TOKS}, x -> {SQL_STOPWORDS})) AS BIGINT) AS sw
      FROM documents),
    scored AS (
      SELECT doc_id, tc,
             (CAST(sw AS DOUBLE) / CAST(tc AS DOUBLE)) * 0.3
               + (CAST(dt AS DOUBLE) / CAST(tc AS DOUBLE)) * 0.4
               + LEAST(CAST(tc AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score
      FROM s WHERE tc > 0)
    SELECT doc_id, CAST(tc AS BIGINT) AS token_count, quality_score
    FROM scored
    WHERE quality_score >= {QUALITY_GATE} AND tc >= {MIN_TOKENS}
      AND doc_id NOT IN (SELECT doc_id FROM near_drop)
      AND doc_id NOT IN (SELECT doc_id FROM exact_drop)
    """,
    tags=("llm", "pipeline", "dedup", "text"),
)
def q_training_corpus_filter(spark, sf_dir):
    """The end-to-end corpus-cleaning pipeline, composed from the operator
    tiers: exact-dedup keep-list (min-id keeper per content hash) ∩
    near-dedup keep-list (drop the greater id of every >=0.8-Jaccard pair)
    ∩ quality gate (score + token floor). Output is the training-ready
    doc set — the actual deliverable of an LLM-data pipeline.

    Plan shape: two anti-joins against tiny drop-lists (AQE broadcasts
    them) over one codegen'd scoring scan; the dedup tiers reuse their
    audited plans. Thresholds compare bit-identical doubles (identical
    expression trees both engines), so the gate cannot flip cross-engine."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    keeper_w = Window.partitionBy(F.md5("text"))
    exact_drop = (
        docs.withColumn("keeper", F.min("doc_id").over(keeper_w))
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
    )
    near_drop = (
        D.ngram_jaccard_pairs(docs, n=NGRAM_N, threshold=JACCARD_THRESHOLD)
        .select(F.col("doc_j").alias("doc_id"))
        .distinct()
    )
    s = docs.select(
        "doc_id",
        "n_chars",
        T.token_count().alias("tc"),
        T.distinct_token_count().alias("dt"),
        T.stopword_count().alias("sw"),
    ).filter(F.col("tc") > 0)
    score = (
        (F.col("sw").cast("double") / F.col("tc").cast("double")) * 0.3
        + (F.col("dt").cast("double") / F.col("tc").cast("double")) * 0.4
        + F.least(F.col("tc").cast("double") / 100.0, F.lit(1.0)) * 0.3
    )
    scored = s.select(
        "doc_id",
        F.col("tc").cast("bigint").alias("token_count"),
        score.alias("quality_score"),
    ).filter(
        (F.col("quality_score") >= QUALITY_GATE)
        & (F.col("token_count") >= MIN_TOKENS)
    )
    return scored.join(
        F.broadcast(near_drop.unionByName(exact_drop).distinct()),
        "doc_id",
        "left_anti",
    )


WINNOW_K = 4  # k-gram width
WINNOW_W = 4  # winnowing window


@register(
    "doc_winnowing",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    kg AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - {WINNOW_K} + 2),
               i -> md5(array_to_string(list_slice(t, i, i + {WINNOW_K} - 1), ' '))) AS h
      FROM toks WHERE len(t) >= {WINNOW_K}),
    fp AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(h) - {WINNOW_W} + 1, 1) + 1),
               j -> list_aggregate(list_slice(h, j, j + {WINNOW_W} - 1), 'min'))) AS fps
      FROM kg)
    SELECT doc_id, unnest(fps) AS fingerprint FROM fp
    """,
    tags=("llm", "text", "fingerprint", "winnowing"),
)
def q_doc_winnowing(spark, sf_dir):
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    k-gram hashes, then the minimum of every w-wide sliding window —
    guaranteeing any shared substring of length >= k+w-1 yields a shared
    fingerprint, with ~2/(w+1) selection density. Two docs sharing a
    fingerprint share a k-gram, so the fingerprint table is a plagiarism/
    near-dup inverted index that is sublinear in document size.

    Cross-engine trick: the 'hash' is md5-hex (identical bytes in Spark and
    DuckDB) and winnowing only needs a TOTAL ORDER on hashes, so the
    lexicographic min of hex strings replaces the usual integer rolling
    hash bit-for-bit portably. All array ops are Catalyst higher-order
    functions — one projection, no shuffle until a consumer groups."""
    d = table(spark, sf_dir, "documents")
    t = T.tokens("text")
    toks = d.select("doc_id", t.alias("t")).filter(F.size("t") >= WINNOW_K)
    kgram_hashes = F.transform(
        F.sequence(F.lit(1), F.size("t") - WINNOW_K + 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i, WINNOW_K))),
    )
    kg = toks.select("doc_id", kgram_hashes.alias("h"))
    fps = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("h") - WINNOW_W + 1, F.lit(1))
            ),
            lambda j: F.array_min(F.slice(F.col("h"), j, WINNOW_W)),
        )
    )
    return kg.select("doc_id", F.explode(fps).alias("fingerprint"))


# --- multimodal plumbing, oracle-gated -------------------------------------


@register(
    "media_feature_extract",
    """
    SELECT doc_id AS media_id, sha256(text) AS content_hash,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           CAST(('0x' || substr(sha256(text), 1, 2))::INT + 64 AS INTEGER)
             AS width,
           CAST(('0x' || substr(sha256(text), 3, 2))::INT + 64 AS INTEGER)
             AS height
    FROM documents
    """,
    tags=("llm", "multimodal", "arrow"),
    bench=True,
)
def q_media_feature_extract(spark, sf_dir):
    """The multimodal decode/feature stage (operators/multimodal.py) driven
    end-to-end through Arrow mapInPandas on binary columns synthesized from
    the documents fixture — and still ORACLE-GATED: the deterministic fake
    decode derives width/height from the sha256 digest, which DuckDB
    recomputes in SQL. This pins the whole Python-side path (Arrow batch
    shape, binary transport, schema) to a cross-engine hash match, not just
    a rows-only count."""
    from ..operators import multimodal as MM

    docs = table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    feats = MM.extract_features(media, fake_decode=True)
    return feats.select(
        "media_id",
        "content_hash",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "width",
        "height",
    )


@register(
    "media_exact_dedup",
    """
    SELECT sha256(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_media_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    tags=("llm", "multimodal", "dedup"),
)
def q_media_exact_dedup(spark, sf_dir):
    """Byte-identical media dedup: content-hash group-by over the feature
    relation (blobs already dropped) — the media tier of the dedup
    cascade, one shuffle on a uniform 256-bit key."""
    from ..operators import multimodal as MM

    docs = table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    return MM.exact_media_dedup(MM.extract_features(media, fake_decode=True))


@register(
    "dedup_report",
    # Inverted-index oracle (round 9): the original form computed jaccard
    # over ALL O(n^2) doc pairs — 17 minutes at sf0.1, which had pushed
    # this row into the sweep's rows-only set. Candidates sharing >= 1
    # shingle are a LOSSLESS restriction for threshold > 0, and the
    # intersection size falls out of the same co-occurrence GROUP BY
    # (shingle lists are distinct, so COUNT(*) per (doc_i, doc_j) equals
    # len(list_intersect)) — identical counts, 2.7 s at sf0.1. This is
    # also the engine operator's own shape, but expressed in DuckDB SQL
    # over raw shingle strings (no xxhash64, no Spark), so the two
    # remain independent derivations of one answer.
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES} AS s FROM toks WHERE len(t) >= {NGRAM_N}),
    inv AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh),
    ssz AS (
      SELECT doc_id, len(s) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS isz
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    near AS (
      SELECT doc_i, doc_j FROM inter
      JOIN ssz sa ON sa.doc_id = inter.doc_i
      JOIN ssz sb ON sb.doc_id = inter.doc_j
      WHERE CAST(isz AS DOUBLE) / CAST(sa.n + sb.n - isz AS DOUBLE)
            >= {JACCARD_THRESHOLD}),
    ex AS (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY md5(text))
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM ex)
             AS exact_dup_rows,
           (SELECT COUNT(*) FROM near) AS near_dup_pairs,
           (SELECT COUNT(DISTINCT doc_j) FROM near) AS near_dup_drop_docs
    """,
    tags=("llm", "dedup", "observability"),
)
def q_dedup_report(spark, sf_dir):
    """Observability roll-up of the dedup cascade: corpus size, exact
    duplicate rows (beyond each keeper), verified near-dup pairs, and the
    docs the near-dup keep-rule would drop — the one-row report a pipeline
    run logs next to its outputs. Reuses the audited tier operators; the
    three counts reduce tiny frames, so the cost is the tiers themselves."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    exact = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("bigint")
            .alias("exact_dup_rows")
        )
    )
    pairs = D.ngram_jaccard_pairs(docs, n=NGRAM_N, threshold=JACCARD_THRESHOLD)
    # both pair counts in ONE aggregate so the jaccard tier runs once
    # (a .cache() here would leak across registry calls; the Expand the
    # count_distinct adds is over the tiny pairs frame, not the corpus)
    near = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("near_dup_pairs"),
        F.count_distinct(F.col("doc_j")).cast("bigint").alias(
            "near_dup_drop_docs"
        ),
    )
    return n_docs.crossJoin(F.broadcast(exact)).crossJoin(F.broadcast(near))


@register(
    "typo_pairs",
    """
    WITH base AS (
      SELECT doc_id, CASE WHEN doc_id % 2 = 1
        THEN substr(s, 1, (doc_id % 8)::INT) || substr(s, (doc_id % 8)::INT + 2)
        ELSE s END AS s
      FROM (SELECT doc_id, substr(text, 1, 12) AS s FROM documents)),
    v AS (
      SELECT doc_id, s,
        list_append(list_transform(range(1, len(s) + 1),
          i -> substr(s, 1, (i-1)::INT) || substr(s, (i+1)::INT)), s) AS vars
      FROM base)
    SELECT a.doc_id AS id_i, b.doc_id AS id_j, a.s AS s_i, b.s AS s_j
    FROM v a JOIN v b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.vars, b.vars)) > 0
    """,
    tags=("llm", "dedup", "fuzzy"),
)
def q_typo_pairs(spark, sf_dir):
    """edit1_pairs oracle-gated on a deterministic corruption: odd doc_ids
    drop one character from a 12-char title; the operator's
    deletion-neighborhood join recovers every <=1-edit pair. The DuckDB
    oracle evaluates the SAME neighborhood criterion pairwise (fine at
    oracle scale; the engine side stays the linear inverted-index join) —
    two independent algorithms, one answer."""
    from ..operators.dedup import edit1_pairs
    from ..tables import table

    docs = table(spark, sf_dir, "documents")
    s = F.substring(F.col("text"), 1, 12)
    pos = (F.col("doc_id") % 8).cast("int")
    corrupted = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(
            F.substr(s, F.lit(1), pos),
            F.substr(s, pos + 2, F.length(s)),
        ),
    ).otherwise(s)
    base = docs.select("doc_id", corrupted.alias("text"))
    return edit1_pairs(base, id_col="doc_id", text_col="text", max_len=12)


@register(
    "semantic_dedup_report",
    f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (
      SELECT a.vec_id, a.label,
             MIN(CASE WHEN ROUND(list_cosine_similarity(a.v, b.v), 6)
                           >= {COSINE_DUP_THRESHOLD}
                      THEN b.vec_id END) AS dup_of
      FROM e a LEFT JOIN e b
        ON a.label = b.label AND b.vec_id < a.vec_id
      GROUP BY a.vec_id, a.label)
    SELECT vec_id, label AS cluster, dup_of FROM p
    """,
    tags=("llm", "dedup", "similarity", "semdedup"),
)
def q_semantic_dedup_report(spark, sf_dir):
    """SemDeDup-style semantic dedup: within each cluster (here the
    corpus's label column; at 100 TB the IVF cell assignment), every
    vector maps to the smallest-id earlier vector whose cosine clears the
    near-dup threshold — keepers have dup_of NULL. Clustering bounds the
    pair work to O(sum c_i^2); the oracle brute-forces the same criterion
    per cluster in SQL."""
    return S.semantic_dedup(
        table(spark, sf_dir, "embeddings"),
        cluster_col="label",
        threshold=COSINE_DUP_THRESHOLD,
    )


@register(
    "semantic_dedup_scaled",
    None,
    tags=("llm", "dedup", "similarity", "semdedup", "scale-path"),
    bench=True,
)
def q_semantic_dedup_scaled(spark, sf_dir):
    """The 100 TB production form of semantic dedup (rows-only: the
    k-means cells are engine-specific; `semantic_dedup_report` is the
    oracle-gated exact sibling and pytest pins precision + recall against
    it): cell count scales with the corpus, so total pair work is linear
    at fixed target occupancy and the output is one row per vector. The
    round-6 30x curve motivated this — every pair-emitting form is
    output-bound Th(n^2) on cluster-structured corpora by semantics."""
    from ..tables import parquet_rows

    return S.semantic_dedup_scaled(
        table(spark, sf_dir, "embeddings"), threshold=COSINE_DUP_THRESHOLD,
        n=parquet_rows(sf_dir, "embeddings"),  # footer, no count() job
    )


SEMDEDUP_TARGET_CELL_ROWS = 256  # = semantic_dedup_scaled's default


def _semdedup_certified_oracle() -> str:
    from ..operators.clustering import semdedup_scaled_oracle_sql

    return semdedup_scaled_oracle_sql(
        threshold=COSINE_DUP_THRESHOLD,
        target_cell_rows=SEMDEDUP_TARGET_CELL_ROWS,
    )


@register(
    "semantic_dedup_scaled_certified",
    _semdedup_certified_oracle(),
    tags=("llm", "dedup", "similarity", "semdedup", "scale-path"),
)
def q_semantic_dedup_scaled_certified(spark, sf_dir):
    """The hash-gated leg of the 100 TB semantic-dedup path: the SAME
    contract as `semantic_dedup_scaled` (corpus-scaled cell count,
    spherical first-n-init fixed-iteration quantizer, one row per vector,
    smallest-earlier-id cosine keeper) with every step in the
    exact-decimal replayable form — the DuckDB oracle re-runs the full
    dynamic-k spherical k-means AND the keeper rule, so (vec_id, cell,
    dup_of) is value-hash-pinned cross-engine at any SF. The production
    operator keeps its numpy sample-trained quantizer (BLAS-order
    engine-specific); pytest pins the two forms against each other
    (operators/clustering.py docstring)."""
    from ..operators.clustering import semantic_dedup_scaled_certified
    from ..tables import parquet_rows

    return semantic_dedup_scaled_certified(
        table(spark, sf_dir, "embeddings"),
        threshold=COSINE_DUP_THRESHOLD,
        target_cell_rows=SEMDEDUP_TARGET_CELL_ROWS,
        n=parquet_rows(sf_dir, "embeddings"),
    )


SPAN_MIN_TOKENS = 8

@register(
    "shared_span_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    pos_sh AS (
      SELECT doc_id, generate_subscripts(sh, 1) AS pos, unnest(sh) AS g
      FROM (SELECT doc_id,
                   list_transform(range(1, len(t) - {NGRAM_N - 2}),
                                  i -> array_to_string(list_slice(t, i, i + {NGRAM_N - 1}), ' ')) AS sh
            FROM toks WHERE len(t) >= {NGRAM_N})),
    m AS (
      SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, a.pos AS pos_i,
             a.pos - b.pos AS diag
      FROM pos_sh a JOIN pos_sh b ON a.g = b.g AND a.doc_id < b.doc_id),
    isl AS (
      SELECT doc_i, doc_j, diag,
             pos_i - ROW_NUMBER() OVER (
               PARTITION BY doc_i, doc_j, diag ORDER BY pos_i) AS island
      FROM m),
    sp AS (
      SELECT doc_i, doc_j, COUNT(*) + {NGRAM_N - 1} AS span
      FROM isl GROUP BY doc_i, doc_j, diag, island)
    SELECT doc_i, doc_j, CAST(MAX(span) AS BIGINT) AS max_shared_span
    FROM sp GROUP BY doc_i, doc_j
    HAVING MAX(span) >= {SPAN_MIN_TOKENS}
    """,
    tags=("llm", "dedup", "substring", "contamination"),
)
def q_shared_span_pairs(spark, sf_dir):
    """Exact repeated-substring pairs (the suffix-array-dedup result,
    relationally): longest common contiguous token run per doc pair via
    diagonal islands over positional n-grams — catches a verbatim
    50-token quote shared by otherwise-different documents, which
    whole-document Jaccard cannot see. Oracle re-derives the identical
    islands construction in SQL."""
    return D.shared_span_pairs(
        table(spark, sf_dir, "documents"),
        n=NGRAM_N,
        min_span_tokens=SPAN_MIN_TOKENS,
    )


@register(
    "embedding_dup_pairs_lsh",
    None,
    tags=("llm", "dedup", "similarity", "lsh", "scale-path"),
)
def q_embedding_dup_pairs_lsh(spark, sf_dir):
    """The pair-emitting LSH form of embedding_dup_pairs: bucket
    candidates + exact cosine threshold (precision exact; recall measured
    vs the all-pairs form in pytest). Round 6 proved the PAIR OUTPUT
    itself is Th(n^2) by semantics on cluster-structured corpora
    (3.8k/36k/404k/3.63M pairs at 1/3/10/30x), so this is now the
    DIAGNOSTIC/observability leg; `semantic_dedup_scaled` (O(n) output,
    exponent 0.11 to 30x) is the production path and carries the bench
    headline slot."""
    return S.lsh_dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold=COSINE_DUP_THRESHOLD
    )


@register(
    "containment_dup_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES} AS s FROM toks WHERE len(t) >= {NGRAM_N}),
    pairs AS (
      SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(LEAST(len(a.s), len(b.s)) AS DOUBLE) AS containment,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
               AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    SELECT doc_i, doc_j, containment, jaccard
    FROM pairs WHERE containment >= 0.5
    """,
    tags=("llm", "dedup", "containment"),
)
def q_containment_dup_pairs(spark, sf_dir):
    """Asymmetric (Broder containment) near-dup tier: catches a small doc
    quoted whole inside a large one, which Jaccard scores near 0. Spark
    runs the shingle inverted index; the oracle brute-forces all pairs."""
    return D.ngram_containment_pairs(
        table(spark, sf_dir, "documents"), n=NGRAM_N, threshold=0.5
    )


@register(
    "novel_ngram_rate",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, unnest({SQL_SHINGLES}) AS shingle
      FROM toks WHERE len(t) >= {NGRAM_N}),
    first_seen AS (
      SELECT shingle, MIN(doc_id) AS first_id FROM sh GROUP BY shingle)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS novel_shingles,
           CAST(SUM(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novel_frac
    FROM sh JOIN first_seen f USING (shingle)
    GROUP BY sh.doc_id
    """,
    tags=("llm", "quality", "novelty"),
)
def q_novel_ngram_rate(spark, sf_dir):
    """Ingest-order novelty rate per document (fraction of its distinct
    3-grams first seen in this doc) — the corpus-freshness /
    recrawl-detection signal a streaming training-data feed monitors."""
    return D.novel_ngram_rate(table(spark, sf_dir, "documents"), n=NGRAM_N)


@register(
    "dedup_keeper_selection",
    f"""
    WITH RECURSIVE {_JACCARD_PAIR_CTES},
    hits AS (
      SELECT doc_i, doc_j FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}),
    edges AS (
      SELECT doc_i AS src, doc_j AS dst FROM hits
      UNION ALL
      SELECT doc_j AS src, doc_i AS dst FROM hits),
    walk (id, reach) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src)
    , clusters AS (
      SELECT id AS doc_id, LEAST(id, MIN(reach)) AS cluster_id
      FROM walk GROUP BY id),
    ranked AS (
      SELECT c.doc_id, c.cluster_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
             FIRST_VALUE(c.doc_id) OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS keeper
      FROM clusters c JOIN documents d USING (doc_id))
    SELECT doc_id, cluster_id, keeper AS keeper_doc_id, (rn = 1) AS keep
    FROM ranked
    """,
    tags=("llm", "dedup", "keeper"),
)
def q_dedup_keeper_selection(spark, sf_dir):
    """The policy stage that turns near-dup clusters into a training-set
    decision: per cluster keep the LONGEST member (tiebreak lowest id —
    the RefinedWeb/C4 convention of preferring the most complete copy),
    mark the rest for drop. Output is the per-doc verdict relation the
    corpus materializer anti-joins on.

    Spark side: the distributed min-label clusters + one broadcast-joined
    n_chars lookup + one per-cluster window (clusters are pairs/triples,
    so the window partition is tiny by construction). Oracle re-derives
    clusters via WITH RECURSIVE transitive closure and applies the same
    window."""
    from pyspark.sql import Window

    pairs = D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )
    clusters = D.dedup_clusters(pairs)
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = clusters.join(d, "doc_id").select(
        "doc_id",
        "cluster_id",
        F.row_number().over(w).alias("rn"),
        F.first("doc_id").over(w).alias("keeper_doc_id"),
    )
    return ranked.select(
        "doc_id", "cluster_id", "keeper_doc_id", (F.col("rn") == 1).alias("keep")
    )


@register(
    "ann_recall_report",
    None,
    tags=("llm", "similarity", "ann", "evaluation"),
)
def q_ann_recall_report(spark, sf_dir):
    """Recall@5 of each approximate ANN method against the exact
    brute-force baseline, as a QUERY (the pytest recall checks, promoted
    to a driver-visible observability row per method). Rows-only — the
    approximate methods have no cross-engine oracle by design; what this
    certifies operationally is the evaluation harness a production
    pipeline runs after every index rebuild. One exact-baseline pass is
    shared across all three methods."""
    from ..tables import parquet_rows

    emb = table(spark, sf_dir, "embeddings")
    n_emb = parquet_rows(sf_dir, "embeddings")  # footer, no count() job
    exact = S.brute_force_topk_blocked(emb, k=5).select(
        F.col("query_id"), F.col("neighbor_id")
    ).persist()
    try:
        n_pairs = exact.count()  # materialize once; |Q|*5 rows
        rows = []
        for method, df in (
            ("lsh", S.lsh_bucket_topk(emb, k=5, n=n_emb)),
            ("ivf", S.ivf_topk(emb, k=5)),
            ("pq", S.pq_topk(emb, k=5)),
            ("ivfpq", S.ivfpq_topk(emb, k=5)),
            ("sq8", S.sq8_topk(emb, k=5)),
        ):
            hits = df.select("query_id", "neighbor_id").join(
                exact, ["query_id", "neighbor_id"]
            ).count()
            rows.append((method, round(hits / n_pairs, 4)))
    finally:
        exact.unpersist()
    # eager by design (an observability report): the baseline cache lives
    # only for the duration of this build — no session-lifetime pins
    return spark.createDataFrame(rows, "method string, recall_at_5 double")


@register(
    "sq8_ann_topk",
    S.sq8_oracle_sql(),
    tags=("llm", "similarity", "ann", "sq8"),
)
def q_sq8_ann_topk(spark, sf_dir):
    """Cosine top-5 over 8-bit scalar-quantized vectors — the fourth
    compression family (FAISS SQ8 shape) and the only one whose whole
    search path is cross-engine certified (the quantizer is closed-form,
    so the driver hash-gates the results instead of a recall bound)."""
    return S.sq8_topk(table(spark, sf_dir, "embeddings"), k=5)


@register(
    "simhash_pairs_certified",
    D.simhash_portable_oracle_sql(),
    tags=("llm", "dedup", "simhash"),
)
def q_simhash_pairs_certified(spark, sf_dir):
    """SimHash near-dup pairs on the engine-portable md5-60bit hash — the
    oracle-gated certification of the pigeonhole+verify pipeline
    (`simhash_pairs` keeps xxhash64 as the production hash and stays
    rows-only; this variant proves the machinery end-to-end)."""
    return D.simhash_pairs_portable(table(spark, sf_dir, "documents"))


@register(
    "lsh_ann_exact",
    _COSINE_TOPK_ORACLE,
    tags=("llm", "similarity", "ann", "lsh", "exact-mode"),
)
def q_lsh_ann_exact(spark, sf_dir):
    """LSH in its degenerate exact mode (one table, zero planes -> a
    single bucket): the grouped-BLAS bucket scorer must reproduce brute
    force bit-for-bit, certifying the LSH machinery end-to-end the same
    way `ivf_ann_exact`/`pq_ann_exact` certify theirs. Every ANN family
    now has an oracle-gated leg (the probabilistic legs stay rows-only
    with recall bounds)."""
    return S.lsh_bucket_topk(
        table(spark, sf_dir, "embeddings"), k=5, n_tables=1, n_planes=0
    )


@register(
    "ngram_dup_pairs_prefix",
    _JACCARD_ORACLE,
    tags=("llm", "dedup", "jaccard", "prefix-filter", "scale-path"),
)
def q_ngram_dup_pairs_prefix(spark, sf_dir):
    """Prefix-filtered exact Jaccard join (AllPairs/PPJoin): indexes only
    each doc's rarest-first prefix, verifies candidates pair-bounded. The
    oracle is the PLAIN exact-pairs query — the hash compare proves the
    prefix filter result-invariant (the salted-join / bloom
    certification pattern)."""
    return D.jaccard_pairs_prefix_filtered(
        table(spark, sf_dir, "documents"), n=NGRAM_N,
        threshold=JACCARD_THRESHOLD,
    )


@register(
    "leakage_safe_splits",
    f"""
    WITH RECURSIVE {_JACCARD_PAIR_CTES},
    hits AS (
      SELECT doc_i, doc_j FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}),
    edges AS (
      SELECT doc_i AS src, doc_j AS dst FROM hits
      UNION ALL
      SELECT doc_j AS src, doc_i AS dst FROM hits),
    walk (id, reach) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
    labels AS (
      SELECT id AS doc_id, LEAST(id, MIN(reach)) AS cluster_id
      FROM walk GROUP BY id),
    alldocs AS (
      SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN labels l USING (doc_id))
    SELECT doc_id, cluster_id,
           CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '1a'
                  THEN 'test'
                WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '34'
                  THEN 'val'
                ELSE 'train' END AS split
    FROM alldocs
    """,
    tags=("llm", "dedup", "splits", "leakage"),
)
def q_leakage_safe_splits(spark, sf_dir):
    """Group-aware train/val/test splits: near-dup clusters (the
    dedup_clusters fixpoint) are the split unit, so no near-duplicate
    pair straddles a boundary — the eval-decontamination counterpart of
    benchmark_contamination. Deterministic md5-bucket assignment on the
    CLUSTER id; oracle re-derives the clusters via recursive transitive
    closure and replays the identical hash thresholds."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )
    return D.leakage_safe_splits(docs, D.dedup_clusters(pairs))
