"""Registry batch 6: training-data pipeline operators — column profiling,
deterministic hash sampling, sequence packing, multi-grain rollup cascade,
text scrubbing (operators/pipeline.py).

Cross-engine determinism notes:
- md5 of a bigint rendered as a string is byte-identical in Spark and
  DuckDB (both lowercase hex), so the hash sample is oracle-exact.
- All SUM() aggregates run in DECIMAL (exact) and cast to double at the
  edge; window SUM over bigint is CAST to BIGINT on the DuckDB side
  (hugeint → pandas float otherwise).
- The rollup cascade is grouping-sets (1 scan) in Spark vs UNION ALL
  (3 scans) in the oracle — independent plans, same result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import pipeline as P
from ..operators.sketches import (
    cms_oracle_sql,
    cms_trigram_estimates,
    histogram_quantiles,
    histogram_quantiles_oracle_sql,
    hll_distinct,
    hll_oracle_sql,
    kmv_distinct,
    kmv_oracle_sql,
)
from ..tables import table
from .registry import register

PACK_BUDGET = 512  # tokens per training pack (concat-and-chunk batch size)
SAMPLE_EN_HEX = "14"  # keep 20/256 ≈ 7.8% of English docs
SAMPLE_OTHER_HEX = "52"  # keep 82/256 ≈ 32% of everything else
EMB_DIM = 64  # embeddings.parquet vector width


@register(
    "column_profile",
    """
    SELECT 'event_id' AS column, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(event_id) AS n_nulls,
           COUNT(DISTINCT event_id) AS n_distinct,
           CAST(MIN(event_id) AS DOUBLE) AS min_d,
           CAST(MAX(event_id) AS DOUBLE) AS max_d
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
           COUNT(DISTINCT user_id),
           CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
           COUNT(DISTINCT value), MIN(value), MAX(value)
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
           COUNT(DISTINCT event_type),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM events
    """,
    tags=("pipeline", "profile"),
)
def q_column_profile(spark, sf_dir):
    """ANALYZE-style column stats in ONE table scan (the oracle scans 4×).
    At 100 TB the exact distinct counts become approx_count_distinct."""
    return P.profile_numeric(
        table(spark, sf_dir, "events"),
        numeric_cols=["event_id", "user_id", "value"],
        categorical_cols=["event_type"],
    )


@register(
    "stratified_sample",
    f"""
    SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket_hex
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '{SAMPLE_EN_HEX}' ELSE '{SAMPLE_OTHER_HEX}' END
    """,
    tags=("pipeline", "sampling"),
)
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified downsample: per-language keep rates driven
    by an md5 hash bucket — reproducible across engines, retries, and
    cluster sizes (no RNG/seed state), shuffle-free."""
    docs = table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", SAMPLE_EN_HEX).otherwise(
        SAMPLE_OTHER_HEX
    )
    return P.hash_sample(docs, F.col("doc_id"), threshold).select(
        "doc_id", "lang", "bucket_hex"
    )


@register(
    "sequence_packing",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM toks)
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((cum - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
    FROM c
    """,
    tags=("pipeline", "packing", "window"),
    bench=True,
)
def q_sequence_packing(spark, sf_dir):
    """Concat-and-chunk training-batch packing: stream docs per language in
    doc_id order through a {PACK_BUDGET}-token budget; pack id = starting
    offset div budget. One shuffle (on lang), windowed cumsum within."""
    docs = table(spark, sf_dir, "documents")
    return P.pack_sequences(
        docs,
        group_col="lang",
        order_col="doc_id",
        token_col=F.size(F.split(F.col("text"), " ")),
        budget=PACK_BUDGET,
    )


@register(
    "rollup_cascade",
    """
    SELECT 'minute' AS grain, date_trunc('minute', ts) AS bucket_start,
           event_type, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE)
             AS total_value
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'hour', date_trunc('hour', ts), event_type, COUNT(*),
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE)
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'day', date_trunc('day', ts), event_type, COUNT(*),
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE)
    FROM events GROUP BY 2, 3
    """,
    tags=("pipeline", "rollup", "grouping-sets"),
    bench=True,
)
def q_rollup_cascade(spark, sf_dir):
    """Hypertable-style continuous-aggregate hierarchy (minute/hour/day) in
    one grouping-sets pass; streaming incremental form in
    streaming/rollup.py."""
    return P.rollup_grains(
        table(spark, sf_dir, "events"),
        ts_col="ts",
        group_col="event_type",
        value_dec=F.col("value").cast("decimal(18,6)"),
    )


@register(
    "text_scrub",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
               '[0-9][0-9 ()+.-]{6,}[0-9]', '<PHONE>', 'g'),
             '[0-9]+', '<NUM>', 'g') AS scrubbed,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
               '[0-9][0-9 ()+.-]{6,}[0-9]', '<PHONE>', 'g'),
             '[0-9]+', '<NUM>', 'g') <> text AS changed
    FROM documents
    """,
    tags=("pipeline", "scrub"),
)
def q_text_scrub(spark, sf_dir):
    """PII-style masking (emails → phone shapes → digit runs, specific to
    general). Chained JVM regexp_replace, whole-stage codegen; patterns are
    plain char classes valid under both Java regex and RE2."""
    docs = table(spark, sf_dir, "documents")
    scrubbed = P.scrub_text(F.col("text"))
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        (scrubbed != F.col("text")).alias("changed"),
    )


@register(
    "label_centroids",
    f"""
    WITH ex AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS DECIMAL(18,6)) AS e
      FROM embeddings)
    SELECT label, CAST(pos AS BIGINT) AS pos,
           CAST(SUM(e) AS DOUBLE) / COUNT(*) AS centroid
    FROM ex GROUP BY label, pos
    """,
    tags=("pipeline", "vector-agg"),
)
def q_label_centroids(spark, sf_dir):
    """Element-wise mean embedding per label — the k-means E-step / class
    prototype as a pure aggregate. The Spark plan is {EMB_DIM} decimal sums
    in ONE aggregation (no explode: the oracle explodes to rows×{EMB_DIM}
    and shuffles them all; here the shuffle carries one {EMB_DIM}-wide row
    per (label, partition) thanks to map-side combine). Elements are
    rounded to 6dp then summed in exact DECIMAL so merge order and engine
    cannot change the result; the mean divides in double at the edge."""
    e = table(spark, sf_dir, "embeddings")
    elem = lambda i: F.round(F.col("embedding")[i].cast("double"), 6).cast(
        "decimal(18,6)"
    )
    agg = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        *[F.sum(elem(i)).alias(f"__s{i}") for i in range(EMB_DIM)],
    )
    pairs = ", ".join(f"CAST({i + 1} AS BIGINT), __s{i}" for i in range(EMB_DIM))
    return agg.select(
        "label",
        "__n",
        F.expr(f"stack({EMB_DIM}, {pairs}) AS (pos, __s)"),
    ).select(
        "label",
        "pos",
        (F.col("__s").cast("double") / F.col("__n")).alias("centroid"),
    )


@register(
    "replica_reconciliation",
    """
    WITH replica AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0),
    l AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    j AS (
      SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
             CASE WHEN r.o_orderkey IS NULL THEN 'only_left'
                  WHEN l.o_orderkey IS NULL THEN 'only_right'
                  WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice
                    OR l.o_orderstatus IS DISTINCT FROM r.o_orderstatus
                    THEN 'mismatch' END AS status
      FROM l FULL OUTER JOIN replica r ON l.o_orderkey = r.o_orderkey)
    SELECT o_orderkey, status FROM j WHERE status IS NOT NULL
    """,
    tags=("pipeline", "reconcile", "full-outer"),
)
def q_replica_reconciliation(spark, sf_dir):
    """Replica/sink validation: full-outer keyed diff of `orders` against a
    deterministically-degraded copy (dropped keys → only_left, perturbed
    totals → mismatch, injected keys → only_right). The operator backing
    the engine's Mongo-serving-copy consistency story; bucketed sides make
    it shuffle-free."""
    from ..operators.relational import reconcile

    orders = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    replica = (
        orders.filter(k % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 89 == 0, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            orders.filter(k % 101 == 0).withColumn(
                "o_orderkey", k + 100000000
            )
        )
    )
    return reconcile(
        orders, replica, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


@register(
    "kmv_distinct_sketch",
    kmv_oracle_sql("events", "event_type", "user_id"),
    tags=("pipeline", "sketch", "cardinality"),
)
def q_kmv_distinct_sketch(spark, sf_dir):
    """KMV distinct-count sketch per event_type (k=32 minimum md5-60bit
    hashes; salted two-phase k-smallest = the mergeable-partial-sketch
    dataflow). Oracle-gated — the certifiable cardinality sketch next to
    the rows-only HLL++ (`approx_distinct_users`); see operators/
    sketches.py for why the estimate is bit-replayable."""
    return kmv_distinct(table(spark, sf_dir, "events"), "event_type", "user_id")


@register(
    "hll_distinct_certified",
    hll_oracle_sql("events", "event_type", "user_id"),
    tags=("pipeline", "sketch", "cardinality", "hll"),
    bench=True,
)
def q_hll_distinct_certified(spark, sf_dir):
    """Portable md5-HLL distinct estimate per event_type — closes the
    HLL gap in the certified-sketch family: unlike the engine-private
    `approx_count_distinct` register layout (rows-only
    `approx_distinct_users`), this register construction is exact
    string/integer relational algebra and the harmonic sum is an exact
    scaled-integer DECIMAL, so the driver hash-gates the entire estimate
    path (as `kmv_distinct_sketch` does for KMV)."""
    return hll_distinct(table(spark, sf_dir, "events"), "event_type", "user_id")


@register(
    "histogram_quantiles_certified",
    histogram_quantiles_oracle_sql("events", "event_type", "value"),
    tags=("pipeline", "sketch", "percentile"),
    bench=True,
)
def q_histogram_quantiles_certified(spark, sf_dir):
    """Fixed-grid histogram quantile sketch per event_type — the
    certifiable twin of `approx_percentile` (rows-only
    `approx_value_percentiles`): 2-pass mergeable histogram, bins-bounded
    shuffle, deterministic in-bin interpolation — hash-gated end-to-end;
    bin-width error bound pytest-checked vs exact percentiles."""
    return histogram_quantiles(
        table(spark, sf_dir, "events"), "event_type", "value"
    )


@register(
    "compression_ratio_signal",
    None,
    tags=("llm", "quality", "map-only"),
)
def q_compression_ratio(spark, sf_dir):
    """zlib compression-ratio quality gate (map-only Arrow stage; zero
    exchanges). Rows-only at the driver — DEFLATE is not SQL-expressible;
    pytest checks byte-exactness against direct zlib."""
    return P.compression_ratio(table(spark, sf_dir, "documents"))


@register(
    "approx_value_percentiles",
    None,
    tags=("pipeline", "percentile", "sketch"),
)
def q_approx_value_percentiles(spark, sf_dir):
    """The 100 TB path for `value_percentiles`: approx_percentile's
    mergeable quantile sketch (partial sketches combine associatively — one
    shuffle of sketch state, never the values). Rows-only because the KLL
    sketch state is engine-private; `histogram_quantiles_certified` is
    the hash-gated sibling, and the rank-error bound vs the exact
    percentiles is pytest-checked."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("p50"),
        F.expr("approx_percentile(value, 0.95, 1000)").alias("p95"),
        F.expr("approx_percentile(value, 0.99, 1000)").alias("p99"),
    )


@register(
    "source_quota_sample",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) t
    WHERE rn <= 200
    """,
    tags=("sampling", "quota", "window"),
)
def q_source_quota_sample(spark, sf_dir):
    """Per-source quota capping (the domain-balancing curation primitive:
    no single crawl source may exceed K docs). Deterministic and
    engine-independent: rank by md5(doc_id) — an unbiased pseudo-random
    order that is byte-identical across Spark and DuckDB — with doc_id as
    total-order tiebreaker. One hash shuffle on source. At 100 TB, a giant
    source would first be pre-pruned with a cheap hash-prefix filter
    (keep ~2x quota by md5 range, like `hash_sample`) so the per-group
    sort ranks thousands of survivors, not billions of rows."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 200)
        .select("doc_id", "source")
    )


@register(
    "benchmark_contamination",
    """
    WITH toks AS (
      SELECT doc_id, source, list_filter(str_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(t) - 2),
               i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS s
      FROM toks WHERE len(t) >= 4),
    bench AS (
      SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE source = 'src0'),
    corpus AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh WHERE source <> 'src0')
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
    FROM corpus JOIN bench USING (shingle)
    GROUP BY doc_id
    """,
    tags=("decontamination", "dedup", "semi-join"),
    bench=True,
)
def q_benchmark_contamination(spark, sf_dir):
    """Pretraining decontamination: flag corpus documents sharing any
    4-gram with a held-out benchmark set (here: source='src0' plays the
    benchmark). The scale shape is the point — the benchmark side is
    always tiny relative to a 100 TB corpus, so its distinct hashed
    shingles BROADCAST and the corpus is filtered in its scan stage by a
    broadcast hash join: zero corpus shuffle before the per-doc count.
    Shingles are xxhash64'd (8-byte broadcast keys, same trick as
    ngram_jaccard_pairs).

    The source filters sit BELOW the per-doc shingle dedup (source is
    functionally determined by doc_id, so filter-then-dedup is row-
    identical to the old dedup-then-filter): each side's evaluation now
    pushes its source predicate into the parquet scan and tokenizes only
    its own slice, instead of both sides re-running a full-corpus
    (doc_id, h) dedup shuffle — and the bench side needs no (doc_id, h)
    dedup at all, its `.distinct()` on h alone subsumes it."""
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")

    def shingled(pred):
        toks = d.filter(pred).select(
            "doc_id", T.tokens("text").alias("t")
        ).filter(F.size("t") >= 4)
        return toks.select(
            "doc_id", F.explode(T.shingles(F.col("t"), 4)).alias("shingle")
        ).select("doc_id", F.xxhash64("shingle").alias("h"))

    bench = shingled(F.col("source") == "src0").select("h").distinct()
    corpus = shingled(F.col("source") != "src0").dropDuplicates(
        ["doc_id", "h"]
    )
    return (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated"))
    )


@register(
    "boilerplate_shingles",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 2),
               i -> array_to_string(list_slice(t, i, i + 3), ' ')))) AS shingle
      FROM toks WHERE len(t) >= 4)
    SELECT shingle, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM sh GROUP BY shingle HAVING COUNT(*) >= 3
    """,
    tags=("dedup", "boilerplate", "heavy-hitters"),
)
def q_boilerplate_shingles(spark, sf_dir):
    """Boilerplate / hot-shingle detection: 4-grams appearing in >= 3
    distinct documents (headers, footers, license blurbs; the threshold is
    corpus-relative — production uses a document-frequency fraction). This is the
    feeder for the stop-shingle anti-join the near-dup cascade's scale
    note calls for (operators/dedup.py `_shingle_df`): removing hot
    shingles keeps the inverted-index join linear — a shingle in f docs
    generates C(f,2) candidate pairs, so one boilerplate line in 1% of a
    100 TB corpus would otherwise dominate the join alone. One partial->
    final count per shingle; the HAVING prunes before any driver contact.

    NOTE this certification leg pins n=4; to FEED `ngram_jaccard_pairs`
    (default n=3) build the list with the consumer's n —
    `boilerplate_shingles(docs, n=3)` — a width mismatch raises there."""
    from ..operators.dedup import boilerplate_shingles

    d = table(spark, sf_dir, "documents")
    return boilerplate_shingles(d, n=4, min_df=3)


# --- second-moment statistics (profiler batch 2) ----------------------------

_D186 = "DECIMAL(18,6)"
_EDGE = "DECIMAL(18,4)"


def _sum_edge_sql(expr):
    """Exact decimal SUM cast to double through the (18,4) bridge — the
    codebase's standard edge pattern (inputs here carry <= 4 decimals, so
    the scale reduction is exact)."""
    return f"CAST(CAST(SUM({expr}) AS {_EDGE}) AS DOUBLE)"


@register(
    "numeric_correlation",
    f"""
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(
             (CAST(COUNT(*) AS DOUBLE) * {_sum_edge_sql(f"CAST(l_quantity AS DECIMAL(24,6)) * CAST(l_discount AS DECIMAL(12,6))")}
              - {_sum_edge_sql(f"CAST(l_quantity AS {_D186})")} * {_sum_edge_sql(f"CAST(l_discount AS {_D186})")})
             / (sqrt(CAST(COUNT(*) AS DOUBLE) * {_sum_edge_sql(f"CAST(l_quantity AS DECIMAL(24,6)) * CAST(l_quantity AS DECIMAL(12,6))")}
                     - {_sum_edge_sql(f"CAST(l_quantity AS {_D186})")} * {_sum_edge_sql(f"CAST(l_quantity AS {_D186})")})
                * sqrt(CAST(COUNT(*) AS DOUBLE) * {_sum_edge_sql(f"CAST(l_discount AS DECIMAL(24,6)) * CAST(l_discount AS DECIMAL(12,6))")}
                       - {_sum_edge_sql(f"CAST(l_discount AS {_D186})")} * {_sum_edge_sql(f"CAST(l_discount AS {_D186})")})),
             6) AS pearson_r
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("profiler", "stats"),
)
def q_numeric_correlation(spark, sf_dir):
    """Per-group Pearson correlation from exact second moments: the five
    sums (Sx, Sy, Sxy, Sxx, Syy) accumulate in DECIMAL — merge-order-proof
    — and the r formula is ONE double expression applied to their edge
    casts, identically on both engines (built-in corr() would aggregate
    doubles in shuffle order and is not cross-engine stable). One scan,
    one shuffle, map-side partials; ROUND(,6) absorbs last-ulp cast noise.
    At 100 TB this is the profiler's pairwise-correlation pass — all five
    moments ride the same partial aggregate."""
    l = table(spark, sf_dir, "lineitem")
    d186, dmul_l, dmul_r = "decimal(18,6)", "decimal(24,6)", "decimal(12,6)"
    qty, disc = F.col("l_quantity"), F.col("l_discount")

    def edge(c):
        return F.sum(c).cast("decimal(18,4)").cast("double")

    n = F.count(F.lit(1))
    g = l.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        n.cast("bigint").alias("n"),
        edge(qty.cast(d186)).alias("_sx"),
        edge(disc.cast(d186)).alias("_sy"),
        edge(qty.cast(dmul_l) * disc.cast(dmul_r)).alias("_sxy"),
        edge(qty.cast(dmul_l) * qty.cast(dmul_r)).alias("_sxx"),
        edge(disc.cast(dmul_l) * disc.cast(dmul_r)).alias("_syy"),
    )
    nd = F.col("n").cast("double")
    r = (
        (nd * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        / (
            F.sqrt(nd * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
            * F.sqrt(nd * F.col("_syy") - F.col("_sy") * F.col("_sy"))
        )
    )
    return g.select("returnflag", "n", F.round(r, 6).alias("pearson_r"))


Z_THRESHOLD = 2.5


@register(
    "value_zscore_outliers",
    f"""
    WITH tx AS (SELECT event_id AS tx_hash, event_type AS event, value AS amount
                FROM events),
    s AS (SELECT event, CAST(COUNT(*) AS BIGINT) AS n,
                 {_sum_edge_sql(f"CAST(amount AS {_D186})")} AS sx,
                 {_sum_edge_sql(f"CAST(amount AS DECIMAL(24,6)) * CAST(amount AS DECIMAL(12,6))")} AS sxx
          FROM tx GROUP BY event)
    SELECT t.tx_hash, t.event, t.amount,
           ROUND((t.amount - s.sx / CAST(s.n AS DOUBLE))
                 / sqrt(s.sxx / CAST(s.n AS DOUBLE)
                        - (s.sx / CAST(s.n AS DOUBLE)) * (s.sx / CAST(s.n AS DOUBLE))),
                 6) AS zscore
    FROM tx t JOIN s USING (event)
    WHERE ABS(ROUND((t.amount - s.sx / CAST(s.n AS DOUBLE))
                    / sqrt(s.sxx / CAST(s.n AS DOUBLE)
                           - (s.sx / CAST(s.n AS DOUBLE)) * (s.sx / CAST(s.n AS DOUBLE))),
                    6)) >= {Z_THRESHOLD}
    """,
    tags=("profiler", "stats", "anomaly"),
)
def q_value_zscore_outliers(spark, sf_dir):
    """Population z-score outlier flagging per event type (the alerting
    primitive): group mean/variance come from exact decimal first/second
    moments, broadcast back onto the fact rows; z is one double expression
    and the threshold compares the ROUNDED z on both engines so boundary
    rows can't flip on ulp noise. At scale the stats side is tiny (one row
    per group) — the fact table never shuffles."""
    t = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("tx_hash"),
        F.col("event_type").alias("event"),
        F.col("value").alias("amount"),
    )
    d186, dmul_l, dmul_r = "decimal(18,6)", "decimal(24,6)", "decimal(12,6)"
    amt = F.col("amount")
    s = t.groupBy("event").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(amt.cast(d186)).cast("decimal(18,4)").cast("double").alias("sx"),
        F.sum(amt.cast(dmul_l) * amt.cast(dmul_r))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx") / nd
    z = F.round((amt - mean) / F.sqrt(F.col("sxx") / nd - mean * mean), 6)
    return (
        t.join(F.broadcast(s), "event")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= Z_THRESHOLD)
        .select("tx_hash", "event", "amount", "zscore")
    )


# --- context-window chunking (1→N fan-out) ---------------------------------

CHUNK_TOKENS = 32  # tokens per training chunk
CHUNK_STEP = 24  # stride (CHUNK_TOKENS - 8 token overlap)


@register(
    "doc_chunking",
    f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS arr,
                      len(str_split(text, ' ')) AS n
               FROM documents)
    SELECT doc_id, CAST(s // {CHUNK_STEP} AS BIGINT) AS chunk_idx,
           CAST(LEAST({CHUNK_TOKENS}, n - s) AS BIGINT) AS n_chunk_tokens,
           array_to_string(
             list_slice(arr, s + 1, LEAST(s + {CHUNK_TOKENS}, n)), ' ')
             AS chunk_text
    FROM t, UNNEST(generate_series(0, GREATEST(n - 1, 0), {CHUNK_STEP})) AS g(s)
    """,
    tags=("pipeline", "chunking", "fanout"),
    bench=True,
)
def q_doc_chunking(spark, sf_dir):
    """Context-window chunking: split each document into overlapping
    {CHUNK_TOKENS}-token windows with a {CHUNK_STEP}-token stride (the
    pretraining concat/chunk primitive, 1→N row fan-out). Pure JVM
    expressions — split once, `sequence` of window starts, explode, slice;
    no shuffle at all (map-only) and no Python. At 100 TB this is the shape
    that matters: output ∝ input x (1 + overlap), all embarrassingly
    parallel."""
    docs = table(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    t = docs.select("doc_id", arr.alias("arr"), F.size(arr).alias("n"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(CHUNK_STEP)
    )
    return (
        t.select("doc_id", "arr", "n", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.expr(f"s div {CHUNK_STEP}").cast("bigint").alias("chunk_idx"),
            F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("s"))
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("arr"), F.col("s") + 1, CHUNK_TOKENS), " "
            ).alias("chunk_text"),
        )
    )


# --- temperature-rebalanced source sampling --------------------------------


@register(
    "source_temperature_sample",
    """
    WITH c AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
    m AS (SELECT MIN(cnt) AS min_cnt FROM c)
    SELECT d.doc_id, d.source
    FROM documents d JOIN c USING (source) CROSS JOIN m
    WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
             / 16777216.0)
          < sqrt(CAST(m.min_cnt AS DOUBLE) / CAST(c.cnt AS DOUBLE))
    """,
    tags=("pipeline", "sampling", "domain-mix"),
)
def q_source_temperature_sample(spark, sf_dir):
    """Temperature-rebalanced domain mix (alpha=0.5): keep fraction
    sqrt(min_cnt/cnt) per source, so over-represented sources are
    downsampled toward the square-root of their share — the standard
    multi-corpus rebalance. Deterministic and oracle-exact: the uniform
    draw is md5(doc_id)'s first 24 bits over 2^24 (exact double, power-of-2
    denominator) and sqrt/div are correctly-rounded IEEE ops in both
    engines — no RNG, reproducible under retries at any scale."""
    docs = table(spark, sf_dir, "documents")
    cnts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    mn = cnts.agg(F.min("cnt").alias("min_cnt"))
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("bigint") / F.lit(16777216.0)
    kf = F.sqrt(F.col("min_cnt").cast("double") / F.col("cnt").cast("double"))
    return (
        docs.join(F.broadcast(cnts), "source")
        .crossJoin(F.broadcast(mn))
        .filter(u < kf)
        .select("doc_id", "source")
    )


# --- equi-width histogram (profiling primitive) ----------------------------

HIST_BINS = 20


@register(
    "value_histogram",
    f"""
    WITH s AS (SELECT l_extendedprice AS x FROM lineitem),
    b AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM s)
    SELECT CAST(LEAST({HIST_BINS - 1},
                      FLOOR((x - lo) / ((hi - lo) / {HIST_BINS}.0))) AS BIGINT)
             AS bucket,
           COUNT(*) AS n
    FROM s CROSS JOIN b GROUP BY 1
    """,
    tags=("pipeline", "histogram", "profiling"),
)
def q_value_histogram(spark, sf_dir):
    """Equi-width {HIST_BINS}-bin histogram of a numeric column — the
    distribution-profiling primitive next to `column_profile`'s moments and
    `value_percentiles`' quantiles. Min/max come from one tiny aggregate
    broadcast back; the binning expression is identical single-shot double
    arithmetic in both engines (floor of one quotient), so bucket
    boundaries cannot drift cross-engine. Two scans of one column; the
    bucket group-by is on {HIST_BINS} keys — AQE collapses it to almost
    nothing."""
    l = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    b = l.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / float(HIST_BINS)
    bucket = F.least(
        F.lit(HIST_BINS - 1),
        F.floor((F.col("x") - F.col("lo")) / width),
    ).cast("bigint")
    return (
        l.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


N_SHARDS = 64

@register(
    "training_shards",
    f"""
    WITH s AS (
      SELECT CAST(doc_id % {N_SHARDS} AS BIGINT) AS shard_id, doc_id, n_chars
      FROM documents)
    SELECT shard_id, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM s GROUP BY shard_id
    """,
    tags=("pipeline", "sharding", "manifest"),
)
def q_training_shards(spark, sf_dir):
    """Deterministic training-shard manifest: every document maps to one
    of N_SHARDS shards with per-shard doc counts, byte totals, and id
    ranges — what a dataloader consumes to plan epochs. The shard key is
    plain modulo of doc_id (engine-neutral and deterministic; Spark's
    hash() and DuckDB's hash() differ, so a hashed key could not be
    oracle-gated — for skewed real id spaces substitute xxhash64 and
    drop the oracle to the mirror). At 100 TB the write path is
    `df.repartition(N, shard_id).write` with this manifest emitted in
    the same job."""
    d = table(spark, sf_dir, "documents")
    s = d.select(
        F.pmod(F.col("doc_id"), F.lit(N_SHARDS)).cast("bigint").alias("shard_id"),
        "doc_id",
        "n_chars",
    )
    return s.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_CONTAM_ORACLE = """
    WITH toks AS (
      SELECT doc_id, source, list_filter(str_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(t) - 2),
               i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS s
      FROM toks WHERE len(t) >= 4),
    bench AS (
      SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE source = 'src0'),
    corpus AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh WHERE source <> 'src0')
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
    FROM corpus JOIN bench USING (shingle)
    GROUP BY doc_id
    """


@register(
    "bloom_decontamination",
    _CONTAM_ORACLE,
    tags=("decontamination", "bloom", "scale-path"),
    bench=True,
)
def q_bloom_decontamination(spark, sf_dir):
    """`benchmark_contamination` through the Bloom-filter scale path:
    identical output (the oracle IS the exact form — the hash compare
    proves the accelerator result-invariant), different physics.

    The broadcast-semi-join form assumes the benchmark's distinct shingle
    set fits every executor as exact 8-byte keys. Real decontamination
    sets (all eval benchmarks x 13-gram shingles) run to billions of keys
    — too big to broadcast, and shuffling a 100 TB corpus against them is
    the worst join in the pipeline. The Bloom path (operators/bloom.py):

      1. build the filter FROM the bench shingles with one
         bit_or-per-word aggregation (filter-sized shuffle, no driver
         funnel),
      2. broadcast the ~m/8-byte word table and pre-filter the corpus
         shingle relation in its scan stage (no false negatives, so the
         prune is lossless),
      3. exact-confirm only the surviving candidates against the true key
         set — the confirm join's probe side is now ~fpp of the corpus
         instead of all of it.

    m = 1<<20 bits / k = 5 covers the sf bench sets at <1% fpp; size m at
    ~10 bits per expected distinct bench shingle in production.

    As in `benchmark_contamination`, the source filters sit below the
    shingle dedup (source is a function of doc_id, so the rows are
    identical): the bench-side pipeline — which is evaluated twice, once
    to build the filter and once as the exact-confirm key set — tokenizes
    only the benchmark slice with the source predicate pushed into its
    scan, and the corpus side pays the (doc_id, h) dedup shuffle exactly
    once instead of every side re-running a full-corpus dedup.
    """
    from ..functions import text as T
    from ..operators.bloom import bloom_build, bloom_probe

    d = table(spark, sf_dir, "documents")

    def shingled(pred):
        toks = d.filter(pred).select(
            "doc_id", T.tokens("text").alias("t")
        ).filter(F.size("t") >= 4)
        return toks.select(
            "doc_id", F.explode(T.shingles(F.col("t"), 4)).alias("shingle")
        ).select("doc_id", F.xxhash64("shingle").alias("h"))

    bench = shingled(F.col("source") == "src0").select("h").distinct()
    corpus = shingled(F.col("source") != "src0").dropDuplicates(
        ["doc_id", "h"]
    )
    bloom = bloom_build(bench, "h")
    candidates = bloom_probe(corpus, "h", bloom)  # (doc_id, h) distinct
    return (
        candidates.join(bench.hint("shuffle_hash"), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated"))
    )


KMEANS_K = 8
KMEANS_ITERS = 2


def _kmeans_oracle() -> str:
    from ..operators.clustering import kmeans_oracle_sql

    return kmeans_oracle_sql(k=KMEANS_K, iters=KMEANS_ITERS, dim=EMB_DIM)


@register(
    "kmeans_clusters",
    _kmeans_oracle(),
    tags=("pipeline", "clustering", "iterative"),
)
def q_kmeans_clusters(spark, sf_dir):
    """Fully-distributed Lloyd's k-means (k=8, 2 unrolled iterations) over
    the embeddings table, certified by a DuckDB oracle replaying the SAME
    deterministic algorithm (lowest-id init, decimal-frozen distances,
    total-order argmin — operators/clustering.py). Unlike the IVF coarse
    quantizer's bounded driver-side sample training, every E/M step here
    is a distributed broadcast-join + aggregate, so the loop itself scales
    with the cluster. Output: the per-point assignment after the final
    E-step."""
    from ..operators.clustering import kmeans_assign

    return kmeans_assign(
        table(spark, sf_dir, "embeddings"), k=KMEANS_K, iters=KMEANS_ITERS,
        dim=EMB_DIM,
    )


@register(
    "doc_chunking_udtf",
    f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS arr,
                      len(str_split(text, ' ')) AS n
               FROM documents)
    SELECT doc_id, CAST(s // {CHUNK_STEP} AS BIGINT) AS chunk_idx,
           CAST(LEAST({CHUNK_TOKENS}, n - s) AS BIGINT) AS n_chunk_tokens,
           array_to_string(
             list_slice(arr, s + 1, LEAST(s + {CHUNK_TOKENS}, n)), ' ')
             AS chunk_text
    FROM t, UNNEST(generate_series(0, GREATEST(n - 1, 0), {CHUNK_STEP})) AS g(s)
    """,
    tags=("pipeline", "chunking", "udtf"),
)
def q_doc_chunking_udtf(spark, sf_dir):
    """The SAME chunking semantics as `doc_chunking`, but through a real
    Python `@udtf` + LATERAL join — certifying the UDTF execution lane
    (§2.10's third fan-out surface, next to explode and mapInPandas)
    under the identical DuckDB oracle. The expression form remains the
    production path; this entry exists so the UDTF lane itself is
    hash-gated, not just unit-tested."""
    from ..functions.udtfs import make_chunk_udtf

    spark.udtf.register(
        "chunk_doc_udtf", make_chunk_udtf(CHUNK_TOKENS, CHUNK_STEP)
    )
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__docs_for_chunk_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_chunk_tokens, c.chunk_text
        FROM __docs_for_chunk_udtf d,
             LATERAL chunk_doc_udtf(d.text) c
        """
    )


@register(
    "cms_trigram_estimates",
    cms_oracle_sql(),
    tags=("pipeline", "sketch", "frequency", "cms"),
)
def q_cms_trigram_estimates(spark, sf_dir):
    """Count-min sketch frequency estimates for the top-20 corpus
    trigrams — the certifiable mergeable frequency sketch next to KMV
    (cardinality) and bloom (membership); see operators/sketches.py."""
    return cms_trigram_estimates(table(spark, sf_dir, "documents"))
