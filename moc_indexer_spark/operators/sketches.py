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


HLL_B = 12  # 2^12 = 4096 registers
HLL_M = 1 << HLL_B
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2 * 2^61 precomputed as ONE python float literal embedded in
# both engines' expressions, so the raw-estimate division is the only
# floating operation and is bitwise-identical cross-engine
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 61)


def hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HyperLogLog distinct estimate, CROSS-ENGINE CERTIFIED —
    the certifiable twin of the engine-private `approx_count_distinct`
    (whose HLL++ register layout cannot be replayed outside Spark).

    Portable register construction (Flajolet et al. 2007), all exact
    string/integer ops:
    * bucket  = first 3 hex chars of md5(value)   (12 bits -> m=4096)
    * rho     = 1 + leading zero BITS of the next 15 hex chars (60-bit
      window), computed from hex-char arithmetic (TRIM(LEADING '0') +
      a CASE on the first nonzero digit) — no float, no log
    * register M_j = max(rho) per bucket; one m-bounded shuffle

    The harmonic sum is EXACT and order-independent: Sum 2^-M_j scaled
    by 2^61 makes every term an integer (absent registers contribute
    2^61 each), summed as DECIMAL — so both engines compute the same
    integer, and the raw estimate alpha*m^2/S is a single double
    division. The small-range correction m*ln(m/V) (LinearCounting for
    sparse registers) is the one libm call; outputs round to 4dp like
    the KMV estimate. The exact count is returned alongside for the
    error column, mirroring `kmv_distinct`.

    Returns (group_col, n_exact bigint, hll_estimate double,
    rel_err double). 100 TB shape: the register relation is at most
    m rows per group after one map-side-combining max-aggregate —
    mergeable partial sketches, no distinct-sized shuffle.
    """
    h = F.md5(F.col(value_col).cast("string"))
    hs = F.substring(h, HLL_B // 4 + 1, 15)  # 60-bit rho window (hex)
    stripped = F.expr(
        f"TRIM(LEADING '0' FROM substring(md5(cast({value_col} as string)), "
        f"{HLL_B // 4 + 1}, 15))"
    )
    first = F.substring(stripped, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(F.length(stripped) == 0, F.lit(61)).otherwise(
        4 * (F.length(hs) - F.length(stripped)) + extra + 1
    )
    regs = (
        df.select(
            F.col(group_col),
            F.conv(F.substring(h, 1, HLL_B // 4), 16, 10)
            .cast("int")
            .alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    agg = regs.groupBy(group_col).agg(
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - mj) AS DECIMAL(38,0))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    two61 = F.lit(1 << 61).cast("decimal(38,0)")
    s_int = F.col("s_present") + (F.lit(HLL_M) - F.col("n_regs")).cast(
        "decimal(38,0)"
    ) * two61
    e_raw = F.lit(_HLL_NUM) / s_int.cast("double")
    v_empty = (F.lit(HLL_M) - F.col("n_regs")).cast("double")
    est = F.round(
        F.when(
            (e_raw <= F.lit(2.5 * HLL_M)) & (v_empty > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_empty),
        ).otherwise(e_raw),
        4,
    )
    exact = (
        df.select(group_col, value_col)
        .distinct()
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    return (
        exact.join(F.broadcast(agg), group_col)
        .select(
            group_col,
            "n_exact",
            est.alias("hll_estimate"),
            F.round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                6,
            ).alias("rel_err"),
        )
    )


def hll_oracle_sql(table: str, group_col: str, value_col: str) -> str:
    hexpr = f"md5(CAST({value_col} AS VARCHAR))"
    return f"""
    WITH hashed AS (
      SELECT {group_col},
             CAST('0x' || substr({hexpr}, 1, {HLL_B // 4}) AS INTEGER)
               AS bucket,
             TRIM(LEADING '0' FROM substr({hexpr}, {HLL_B // 4 + 1}, 15))
               AS stripped
      FROM {table}),
    rhos AS (
      SELECT {group_col}, bucket,
             CASE WHEN length(stripped) = 0 THEN 61
                  ELSE 4 * (15 - length(stripped))
                       + CASE substr(stripped, 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1
                           WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END + 1
             END AS rho
      FROM hashed),
    regs AS (
      SELECT {group_col}, bucket, MAX(rho) AS mj
      FROM rhos GROUP BY {group_col}, bucket),
    agg AS (
      SELECT {group_col},
             SUM(CAST(CAST(1 AS BIGINT) << (61 - mj) AS DECIMAL(38,0)))
               AS s_present,
             COUNT(*) AS n_regs
      FROM regs GROUP BY {group_col}),
    est AS (
      SELECT {group_col},
             ROUND(
               CASE WHEN CAST({_HLL_NUM!r} AS DOUBLE)
                         / CAST(s_present
                                + ({HLL_M} - n_regs)
                                  * CAST({1 << 61} AS DECIMAL(38,0))
                                AS DOUBLE) <= {2.5 * HLL_M}
                         AND ({HLL_M} - n_regs) > 0
                    THEN CAST({float(HLL_M)} AS DOUBLE)
                         * ln(CAST({float(HLL_M)} AS DOUBLE)
                              / CAST({HLL_M} - n_regs AS DOUBLE))
                    ELSE CAST({_HLL_NUM!r} AS DOUBLE)
                         / CAST(s_present
                                + ({HLL_M} - n_regs)
                                  * CAST({1 << 61} AS DECIMAL(38,0))
                                AS DOUBLE)
               END, 4) AS hll_estimate
      FROM agg),
    exact AS (
      SELECT {group_col}, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM (SELECT DISTINCT {group_col}, {value_col} FROM {table})
      GROUP BY {group_col})
    SELECT e.{group_col}, e.n_exact, t.hll_estimate,
           ROUND(ABS(t.hll_estimate - CAST(e.n_exact AS DOUBLE))
                 / CAST(e.n_exact AS DOUBLE), 6) AS rel_err
    FROM exact e JOIN est t USING ({group_col})
    """


HIST_BINS = 256
HIST_QS = (0.5, 0.95, 0.99)


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = HIST_BINS,
    qs: tuple = HIST_QS,
) -> DataFrame:
    """Per-group quantile ESTIMATES from a fixed-grid histogram sketch —
    the certifiable twin of `approx_percentile` (whose KLL-style sketch
    state is engine-private). Every step is a deterministic relational
    statement both engines evaluate identically, so the driver hash-gate
    certifies the whole estimate path; error is bounded by the bin width
    ((mx-mn)/bins per group), pytest-checked against exact percentiles.

    Dataflow (the classic 2-pass mergeable histogram): pass 1 computes
    per-group (min, max, n); pass 2 bins values against the broadcast
    stats and counts per (group, bin) — a bins-bounded aggregate with
    map-side combine, so the shuffle carries at most `bins` rows per
    group regardless of data volume. Quantile q's estimate interpolates
    within the first bin whose cumulative count reaches ceil(q*n).

    Returns (group_col, p50_est, p95_est, p99_est) for the default qs,
    each rounded to 6dp.
    """
    g = group_col
    # NULL values carry no quantile information and must not be BINNED:
    # F.least skips NULLs, so an un-filtered NULL landed in the TOP bin
    # (bins-1) while still counting into n — pinning p95/p99 at mx and
    # dragging p50 upward. Filtered here and in the oracle alike.
    df = df.filter(F.col(value_col).isNotNull())
    stats = df.groupBy(g).agg(
        F.min(F.col(value_col).cast("double")).alias("mn"),
        F.max(F.col(value_col).cast("double")).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(bins))
    binned = (
        df.select(g, F.col(value_col).cast("double").alias("v"))
        .join(F.broadcast(stats), g)
        .select(
            g,
            F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor((F.col("v") - F.col("mn")) / width).cast("int"),
                )
            )
            .alias("bin"),
        )
        .groupBy(g, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(g).orderBy("bin")
    cum = binned.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "cum_prev", F.col("cum") - F.col("cnt")
    )
    targets = stats.select(
        g, "mn", "mx", "n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn("r", F.ceil(F.col("q") * F.col("n")).cast("bigint"))
    est = (
        targets.join(cum, g)
        .filter((F.col("cum") >= F.col("r")) & (F.col("cum_prev") < F.col("r")))
        .select(
            g, "q",
            F.round(
                F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
                    F.col("mn")
                    + (F.col("mx") - F.col("mn")) / F.lit(float(bins))
                    * (
                        F.col("bin").cast("double")
                        + (F.col("r") - F.col("cum_prev")).cast("double")
                        / F.col("cnt").cast("double")
                    )
                ),
                6,
            ).alias("est"),
        )
    )
    aggs = [
        F.max(F.when(F.col("q") == float(q), F.col("est"))).alias(
            f"p{round(q * 100)}_est"
        )
        for q in qs
    ]
    return est.groupBy(g).agg(*aggs)


def histogram_quantiles_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    bins: int = HIST_BINS,
    qs: tuple = HIST_QS,
) -> str:
    g = group_col
    est_cols = ",\n           ".join(
        f"MAX(CASE WHEN q = {float(q)!r} THEN est END) "
        f"AS p{round(q * 100)}_est"
        for q in qs
    )
    q_values = ", ".join(f"({float(q)!r})" for q in qs)
    return f"""
    WITH stats AS (
      SELECT {g}, MIN(CAST({value_col} AS DOUBLE)) AS mn,
             MAX(CAST({value_col} AS DOUBLE)) AS mx, COUNT(*) AS n
      FROM {table} WHERE {value_col} IS NOT NULL GROUP BY {g}),
    binned AS (
      SELECT t.{g},
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE LEAST({bins - 1},
                             CAST(FLOOR((CAST(t.{value_col} AS DOUBLE) - s.mn)
                                        / ((s.mx - s.mn) / {float(bins)!r}))
                                  AS INTEGER))
             END AS bin
      FROM {table} t JOIN stats s USING ({g})
      WHERE t.{value_col} IS NOT NULL),
    hist AS (
      SELECT {g}, bin, COUNT(*) AS cnt FROM binned GROUP BY {g}, bin),
    cum AS (
      SELECT {g}, bin, cnt,
             SUM(cnt) OVER (PARTITION BY {g} ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY {g} ORDER BY bin) - cnt AS cum_prev
      FROM hist),
    targets AS (
      SELECT s.{g}, s.mn, s.mx, s.n, qv.q,
             CAST(CEIL(qv.q * s.n) AS BIGINT) AS r
      FROM stats s CROSS JOIN (VALUES {q_values}) AS qv(q)),
    est AS (
      SELECT t.{g}, t.q,
             ROUND(CASE WHEN t.mx = t.mn THEN t.mn
                        ELSE t.mn + (t.mx - t.mn) / {float(bins)!r}
                             * (CAST(c.bin AS DOUBLE)
                                + CAST(t.r - c.cum_prev AS DOUBLE)
                                  / CAST(c.cnt AS DOUBLE))
                   END, 6) AS est
      FROM targets t JOIN cum c USING ({g})
      WHERE c.cum >= t.r AND c.cum_prev < t.r)
    SELECT {g},
           {est_cols}
    FROM est GROUP BY {g}
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
    DECIMAL(38,9); ties (astronomically unlikely) break on id. The wide
    decimal matters: |ln(u)/w| reaches ~4e10 already at w=1e-9, which
    overflowed the previous (18,9) — an ArithmeticException under Spark
    4's default ANSI mode, a silent NULL (row dropped from the sample)
    without it. (38,9) holds weights down to ~1e-28. Non-positive
    weights cannot race (ln(u)/w flips sign or divides by zero) and are
    filtered out, mirrored in the oracle.
    Returns (rank int, id_col, weight double, sample_key double).
    """
    df = df.filter(weight_col > 0)
    h = _h60(F.col(id_col))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_SCALE)
    key = F.round(F.log(u) / weight_col, 9).cast("decimal(38,9)")
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
               / CAST({weight_sql} AS DOUBLE), 9) AS DECIMAL(38,9)) AS k_dec
      FROM {table} WHERE CAST({weight_sql} AS DOUBLE) > 0),
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
