"""KMV (k-minimum-values) distinct-count sketch, cross-engine certified.

No reference analog (BASELINE.json north star) — the cardinality-sketch
rung of the approximate family next to `approx_distinct_users` (HLL++)
and `approx_value_percentiles` (quantile sketch). Unlike HLL, whose
register layout is engine-private, KMV is *certifiable*: the sketch is
"the k smallest hash values of the distinct set", a deterministic
relational statement both engines can evaluate exactly, so the driver's
hash-compare can gate the whole estimate path (Beyer et al., SIGMOD'07
unbiased estimator (k-1)/h_(k)).

Spark-first scale shape: the k-smallest selection runs in two phases —
per-(group, salt) windows over ~1/64th slices of the distinct relation,
then a final window over the <= 64*k surviving candidates per group.
That is exactly how a mergeable KMV behaves (partial sketches -> union ->
re-truncate), expressed relationally so Catalyst plans it; and because
exact k-smallest is salting-invariant, the DuckDB oracle can use a plain
single window and still match bit-for-bit.

Determinism: the hash is the first 15 hex chars of md5 (60 bits) parsed
to BIGINT — identical in Spark (conv(h,16,10)) and DuckDB ('0x'||h cast).
The estimator is one double expression; groups with fewer than k distinct
members short-circuit to the exact count (the KMV "sketch is exact below
k" rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K = 32
N_SALTS = 64
_SCALE = float(16**15)  # 2^60, exactly representable as a double


def _h60(col):
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = K
) -> DataFrame:
    """Per-group exact count, KMV estimate, and relative error.

    Returns (group_col, n_exact bigint, kmv_estimate double,
    rel_err double).
    """
    du = df.select(group_col, value_col).distinct()
    hashed = du.select(
        group_col,
        F.col(value_col).alias("v"),
        _h60(F.col(value_col)).alias("h"),
    )
    # phase 1: k smallest within each of 64 salt slices (bounded windows)
    w1 = Window.partitionBy(group_col, F.col("h") % N_SALTS).orderBy("h", "v")
    cand = hashed.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= k
    )
    # phase 2: global k smallest among <= 64k candidates per group
    w2 = Window.partitionBy(group_col).orderBy("h", "v")
    kth = (
        cand.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") == k)
        .select(group_col, F.col("h").alias("hk"))
    )
    exact = du.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(_SCALE) / F.col("hk").cast("double"),
            4,
        )
    )
    return (
        exact.join(F.broadcast(kth), group_col, "left")
        .select(
            group_col,
            "n_exact",
            est.alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                6,
            ).alias("rel_err"),
        )
    )


def kmv_oracle_sql(
    table: str, group_col: str, value_col: str, k: int = K
) -> str:
    return f"""
    WITH du AS (
      SELECT DISTINCT {group_col}, {value_col} AS v FROM {table}),
    hashed AS (
      SELECT {group_col}, v,
             CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15) AS BIGINT)
               AS h
      FROM du),
    kth AS (
      SELECT {group_col}, h AS hk FROM (
        SELECT {group_col}, h,
               ROW_NUMBER() OVER (PARTITION BY {group_col}
                                  ORDER BY h, v) AS rn
        FROM hashed) t
      WHERE rn = {k}),
    exact AS (
      SELECT {group_col}, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM du GROUP BY {group_col})
    SELECT e.{group_col}, e.n_exact,
           CASE WHEN e.n_exact < {k} THEN CAST(e.n_exact AS DOUBLE)
                ELSE ROUND(CAST({float(k - 1)} AS DOUBLE)
                           * CAST({_SCALE} AS DOUBLE)
                           / CAST(t.hk AS DOUBLE), 4)
           END AS kmv_estimate,
           ROUND(ABS(CASE WHEN e.n_exact < {k} THEN CAST(e.n_exact AS DOUBLE)
                          ELSE ROUND(CAST({float(k - 1)} AS DOUBLE)
                                     * CAST({_SCALE} AS DOUBLE)
                                     / CAST(t.hk AS DOUBLE), 4)
                     END - CAST(e.n_exact AS DOUBLE))
                 / CAST(e.n_exact AS DOUBLE), 6) AS rel_err
    FROM exact e LEFT JOIN kth t USING ({group_col})
    """


def weighted_sample_topk(
    df: DataFrame,
    weight_col,
    k: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Efraimidis-Spirakis (A-ES) weighted sampling WITHOUT replacement:
    a fixed-size sample where inclusion probability scales with weight —
    the fixed-k counterpart of the Bernoulli `quality_weighted_sample`.

    Each row gets an exponential race key ln(u)/w with u uniform in (0,1]
    derived from the 60-bit md5 hash (no RNG — reproducible across
    engines, retries, and cluster sizes); the k LARGEST keys win. Same
    salted two-phase k-largest as `kmv_distinct` (per-(h%64) windows,
    then a final window over <= 64k candidates), and exact k-largest is
    salting-invariant so the DuckDB oracle's plain window hash-matches.

    Determinism: u and w enter ONE double expression ln(u)/w rounded to
    DECIMAL(18,9); ties (astronomically unlikely) break on id.
    Returns (rank int, id_col, weight double, sample_key double).
    """
    h = _h60(F.col(id_col))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_SCALE)
    key = F.round(F.log(u) / weight_col, 9).cast("decimal(18,9)")
    scored = df.select(
        F.col(id_col),
        weight_col.cast("double").alias("weight"),
        key.alias("k_dec"),
        (h % N_SALTS).alias("salt"),
    )
    w1 = Window.partitionBy("salt").orderBy(F.desc("k_dec"), F.asc(id_col))
    cand = scored.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= k
    )
    w2 = Window.orderBy(F.desc("k_dec"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("rank").cast("int"),
            id_col,
            "weight",
            F.col("k_dec").cast("double").alias("sample_key"),
        )
    )


def weighted_sample_oracle_sql(
    table: str, weight_sql: str, k: int = 100, id_col: str = "doc_id"
) -> str:
    return f"""
    WITH scored AS (
      SELECT {id_col}, CAST({weight_sql} AS DOUBLE) AS weight,
             CAST(ROUND(
               ln((CAST(CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)),
                               1, 15) AS BIGINT) AS DOUBLE) + 1.0)
                  / CAST({_SCALE} AS DOUBLE))
               / CAST({weight_sql} AS DOUBLE), 9) AS DECIMAL(18,9)) AS k_dec
      FROM {table}),
    ranked AS (
      SELECT {id_col}, weight, k_dec,
             ROW_NUMBER() OVER (ORDER BY k_dec DESC, {id_col} ASC) AS rank
      FROM scored)
    SELECT CAST(rank AS INT) AS rank, {id_col}, weight,
           CAST(k_dec AS DOUBLE) AS sample_key
    FROM ranked WHERE rank <= {k}
    """


CMS_ROWS = 4
CMS_HEX_CHARS = 3  # bucket key length; width = 16**CMS_HEX_CHARS
CMS_WIDTH = 16 ** CMS_HEX_CHARS


def cms_trigram_estimates(
    docs: DataFrame, top_k: int = 20, ngram_n: int = 3
) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan) over corpus word
    n-grams, certified end-to-end: build a 4x4096 CMS from one pass over
    n-gram occurrences, then point-query it for the exact top-`top_k`
    n-grams and report estimate vs truth.

    CMS is THE mergeable frequency sketch of streaming aggregation (each
    cell is an additive counter, so partial sketches union by cell sum —
    here expressed as one map-side-combining groupBy over (row, bucket)).
    Engine-portable by construction: row i's bucket is 3 hex chars of
    md5(i || ':' || gram), and the estimate is min over rows — all
    deterministic relational algebra, so the DuckDB oracle replays the
    identical sketch and the driver hash-gates it (the same certification
    KMV gets, for the frequency side). The overestimate property
    (estimate >= truth, tight for heavy hitters) is pytest-checked.

    Returns (ngram string, exact_count bigint, cms_estimate bigint).
    """
    from ..functions import text as T

    toks = docs.select(T.tokens().alias("t")).filter(
        F.size("t") >= ngram_n
    )
    grams = toks.select(
        F.explode(T.ngrams_all(F.col("t"), ngram_n)).alias("g")
    )
    exact = grams.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc("g")).limit(top_k)

    # sketch build: one (row, bucket) shuffle, CMS_ROWS rows per gram occ.
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(CMS_ROWS)])
    ).alias("r")
    cells = (
        grams.select("g", rows)
        .select(
            "r",
            F.substring(
                F.md5(F.concat_ws(":", F.col("r"), F.col("g"))),
                1, CMS_HEX_CHARS,
            ).alias("bucket"),
        )
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # probe: the top-k grams' buckets join the (<= 4*4096-cell) sketch,
    # estimate = min cell over rows
    probes = top.select(
        "g",
        "exact_count",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_ROWS)])).alias("r"),
    ).select(
        "g",
        "exact_count",
        "r",
        F.substring(
            F.md5(F.concat_ws(":", F.col("r"), F.col("g"))),
            1, CMS_HEX_CHARS,
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("g", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            F.col("g").alias("ngram"), "exact_count", "cms_estimate"
        )
    )


def cms_oracle_sql(top_k: int = 20, ngram_n: int = 3) -> str:
    sql_toks = "list_filter(str_split(text, ' '), x -> x <> '')"
    shingle = (
        f"list_transform(range(1, len(t) - {ngram_n - 2}), "
        f"i -> array_to_string(list_slice(t, i, i + {ngram_n - 1}), ' '))"
    )
    rows = ", ".join(f"({i})" for i in range(CMS_ROWS))
    return f"""
    WITH toks AS (SELECT {sql_toks} AS t FROM documents),
    grams AS (SELECT unnest({shingle}) AS g FROM toks
              WHERE len(t) >= {ngram_n}),
    exact AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS exact_count
              FROM grams GROUP BY g),
    top AS (SELECT g, exact_count FROM exact
            ORDER BY exact_count DESC, g ASC LIMIT {top_k}),
    rws AS (SELECT * FROM (VALUES {rows}) AS v(r)),
    cells AS (
      SELECT r, substr(md5(r || ':' || g), 1, {CMS_HEX_CHARS}) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM grams CROSS JOIN rws GROUP BY r, bucket),
    probes AS (
      SELECT t.g, t.exact_count, w.r,
             substr(md5(w.r || ':' || t.g), 1, {CMS_HEX_CHARS}) AS bucket
      FROM top t CROSS JOIN rws w)
    SELECT p.g AS ngram, p.exact_count, MIN(c.c) AS cms_estimate
    FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
    GROUP BY p.g, p.exact_count
    """
