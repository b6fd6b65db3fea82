"""Deduplication operators for training-data pipelines (100 TB design).

Four tiers, cheapest-first — a real pipeline runs them as a cascade:
1. exact (hash group-by): one shuffle on a 128-bit content hash.
2. n-gram Jaccard (exact near-dup): shingle-inverted-index candidate join —
   only docs sharing >=1 shingle ever meet, so the join is linear-ish in
   corpus size instead of O(n^2). This is the verifier for tiers 3/4.
3. MinHash + LSH banding: candidates from band-bucket collisions; exact
   Jaccard verify on candidates only. At 100 TB: signature is 32*8 bytes/doc
   regardless of doc size; band join shuffles (band_id, band_hash) pairs.
4. SimHash: 8-byte signature/doc, hamming<=k via pigeonhole chunk join.

All tiers are pure Catalyst expressions (no UDFs); shuffles are keyed on
hashes, which are uniform by construction — no skew mitigation needed except
stop-shingle removal (see `_shingle_df` note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: md5 content hash -> keeper = min id per group.

    Returns (content_hash, keeper_doc_id, n_copies). At scale the md5 group
    shuffle is the only stage; AQE coalesces the tiny output.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).cast("bigint").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


def _shingle_df(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, shingle) pairs, distinct per doc.

    Scale note: a "stop shingle" appearing in a large fraction of docs makes
    the inverted-index join quadratic in that posting list. For the synthetic
    corpus no shingle is hot; production would add
    `.join(hot_shingles, 'shingle', 'left_anti')` with hot_shingles =
    shingles with document frequency > ~0.1% — same cascade as TF-IDF.
    """
    toks = docs.select(
        F.col(id_col), T.tokens(text_col).alias("t")
    ).filter(F.size("t") >= n)
    return toks.select(
        F.col(id_col), F.explode(T.shingles(F.col("t"), n)).alias("shingle")
    )


def _hashed_shingles(docs, n, id_col, text_col, stop_shingles=None):
    """(id, shingle-hash) distinct pairs + per-doc set sizes — the shared
    scaffolding of every exact-Jaccard form (plain inverted-index join,
    prefix-filtered join, LSH verify). One definition keeps the verify
    arithmetic identical across variants, which the prefix form's
    result-invariance certification depends on.

    `stop_shingles` (a DataFrame with a `shingle` string column — the
    output of the `boilerplate_shingles` heavy-hitter query) is the
    scale-note anti-join made first-class: hot shingles are removed from
    the index BEFORE sizes are computed, so jaccard is over the filtered
    sets. A shingle in f docs contributes C(f,2) candidate pairs — one
    boilerplate line in 1% of a 100 TB corpus dominates the join alone.
    With an empty/no-hot-shingle list the result is bit-identical (the
    oracle's result-invariance cover).

    The stop list's shingle WIDTH must match `n`: the anti-join compares
    hashes of the shingle STRINGS, so a list built at a different n (or a
    NULL / whitespace-padded entry, whose hash equals no corpus shingle
    either) would silently filter nothing — the exact failure the
    result-invariance property masks. The check is embedded IN the stop
    projection (`raise_error` branch), so it raises loudly at the first
    action without an extra pass over the stop plan — the list may be the
    output of a corpus-wide heavy-hitter aggregate, and an eager driver
    probe would compute that aggregate twice."""
    sh = _shingle_df(docs, n, id_col, text_col).select(
        F.col(id_col), F.xxhash64("shingle").alias("shingle")
    )
    if stop_shingles is not None:
        toks = F.split(F.col("shingle"), " ")
        valid = (
            F.col("shingle").isNotNull()
            & (F.size(toks) == n)
            & ~F.exists(toks, lambda x: x == "")
        )
        stop = stop_shingles.select(
            F.when(valid, F.xxhash64("shingle"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "stop_shingles width mismatch: not an "
                            f"n={n} shingle: '"
                        ),
                        F.coalesce(F.col("shingle"), F.lit("NULL")),
                        F.lit(
                            "' — build the stop list with the same n "
                            f"(boilerplate_shingles(docs, n={n})), "
                            "or it filters nothing"
                        ),
                    )
                )
            )
            .alias("shingle")
        ).dropDuplicates(["shingle"])
        sh = sh.join(F.broadcast(stop), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    return sh, sizes


def boilerplate_shingles(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hot-shingle heavy hitters: (shingle, doc_freq) for n-gram shingles
    appearing in >= min_df distinct documents (headers, footers, license
    blurbs; min_df is corpus-relative — production uses a document-
    frequency fraction). This is the feeder for the `stop_shingles`
    anti-join in `ngram_jaccard_pairs`: build it with the SAME n as the
    consuming join (the anti-join compares shingle strings by hash, so a
    width mismatch matches nothing — `_hashed_shingles` raises on it).
    One partial->final count per shingle; the HAVING-style filter prunes
    before any driver contact. doc_freq counts DISTINCT documents
    (shingles are already per-row distinct via array_distinct, but a
    corpus carrying duplicate doc_id rows must not double-count them
    into the stop list)."""
    sh = _shingle_df(docs, n, id_col, text_col)
    return (
        sh.groupBy("shingle")
        .agg(F.countDistinct(id_col).cast("bigint").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_df)
    )


def decontaminate_against_source(
    docs: DataFrame,
    bench_source: str,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Benchmark decontamination: drop every doc sharing ANY n-gram
    shingle with the held-out `bench_source` slice, and the slice itself.
    One definition for the production funnel (llm_pipeline) and the
    certification legs (plans/pipeline_registry q_benchmark_contamination
    reports the same contaminated set; q_bloom_decontamination is the
    bloom-prefiltered scale variant) — the scale notes those legs carry
    (bloom pre-filter for large benchmark sets, stop-shingle caps) apply
    HERE.

    Plan shape: shingle-hash both sides once, distinct the bench side
    (benchmark slices are corpus-small by definition -> broadcast), semi-
    join contaminated ids, anti-join them out — zero corpus shuffle.
    (Built directly rather than via _shingle_df: the source column must
    ride alongside the shingles in one scan.)"""
    toks = docs.select(
        F.col(id_col), F.col(source_col), T.tokens(text_col).alias("t")
    ).filter(F.size("t") >= n)
    sh = toks.select(
        F.col(id_col), F.col(source_col),
        F.explode(T.shingles(F.col("t"), n)).alias("shingle"),
    ).select(F.col(id_col), F.col(source_col),
             F.xxhash64("shingle").alias("h"))
    bench = (
        sh.filter(F.col(source_col) == bench_source).select("h").distinct()
    )
    contaminated = (
        sh.filter(F.col(source_col) != bench_source)
        .join(F.broadcast(bench), "h")
        .select(id_col)
        .distinct()
    )
    return docs.filter(F.col(source_col) != bench_source).join(
        contaminated, id_col, "left_anti"
    )


def _candidate_inter(sh, id_col: str) -> DataFrame:
    """Posting-prune + inverted-index self-join + intersection counts —
    the shared candidate stage of the Jaccard and containment tiers.
    Prunes posting lists of size 1 BEFORE the self-join (a shingle seen
    in one doc can't produce a pair; in a real corpus that is most of
    the index). The count runs as a window over the same shingle
    partitioning the join needs, so the exchange is shared — measured
    2.3 s -> 1.9 s at sf0.1, and the win grows with vocabulary size."""
    pw = Window.partitionBy("shingle")
    sh = (
        sh.withColumn("__pc", F.count(F.lit(1)).over(pw))
        .filter(F.col("__pc") >= 2)
        .drop("__pc")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_i"),
            F.col(f"b.{id_col}").alias("doc_j"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def _jaccard_from_inter(inter, sizes, threshold, id_col):
    """(doc_i, doc_j, inter) + sizes -> thresholded (doc_i, doc_j,
    jaccard) under the shared |A∩B|/(|A|+|B|-|A∩B|) arithmetic."""
    sa = sizes.select(F.col(id_col).alias("doc_i"), F.col("n_sh").alias("n_i"))
    sb = sizes.select(F.col(id_col).alias("doc_j"), F.col("n_sh").alias("n_j"))
    jac = (
        inter.join(sa, "doc_i")
        .join(sb, "doc_j")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_i") + F.col("n_j") - F.col("inter")).cast("double"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_i", "doc_j", "jaccard"
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    stop_shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via shingle inverted index.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct shingle sets; only pairs
    sharing at least one shingle are candidates (lossless for threshold>0).
    Returns (doc_i, doc_j, jaccard) with doc_i < doc_j.

    Shingles are xxhash64'd before the join: the inverted-index shuffle
    carries 8-byte keys instead of ~n*word-length strings and the join
    compares longs (measured ~12% faster even at local sf0.1; the shuffle-
    byte win grows with shingle width at cluster scale). A false
    intersection needs two distinct shingles shared by the same doc pair to
    collide in 64 bits — ~2^-64 per candidate pair, negligible against the
    count-based jaccard.

    `stop_shingles` (boilerplate_shingles output, a `shingle` string
    column) anti-joins hot shingles out of the index before sizes are
    computed — the DEPLOY.md saturated-vocab mitigation, wired in rather
    than manual. Jaccard is then over the filtered sets; passing an empty
    list is result-identical.

    Single-evaluation plan shape: the older inverted-index SELF-join form
    evaluated the shingle pipeline (tokenize -> explode -> hash -> stop
    anti-join) four times — once per join side and once per size relation
    side — and the guarded form re-ran the stop-list heavy-hitter
    aggregate inside each copy (8 corpus scans at runtime, zero exchange
    reuse: column pruning makes the copies non-identical). This form
    computes it ONCE: per-doc set sizes ride the shingle rows as a window
    count over doc_id, candidate pairs come from grouping the posting
    list per shingle and expanding in-bucket combinations (the same
    bucket-grouping trick minhash_lsh_pairs uses; the expansion output is
    exactly the rows the self-join would have produced, so the
    intersection counts are identical), and the sizes arrive on the pair
    rows as group keys instead of two more joins. Three narrow shuffles
    total (by doc, by shingle, by pair). Posting-list memory per group is
    f ids; in the guarded production form f < min_df by construction, and
    in the plain form a hot shingle's C(f,2) pair output dwarfs the list
    itself — the same intrinsic cost the self-join had.
    """
    sh, _ = _hashed_shingles(docs, n, id_col, text_col, stop_shingles)
    sh = sh.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    members = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct(id_col, "__n"))).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    pairs = members.select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (x, i) -> "
                "transform(slice(ms, i + 2, size(ms)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select(
        F.col(f"p.a.{id_col}").alias("doc_i"),
        F.col("p.a.__n").alias("n_i"),
        F.col(f"p.b.{id_col}").alias("doc_j"),
        F.col("p.b.__n").alias("n_j"),
    )
    inter = pairs.groupBy("doc_i", "doc_j", "n_i", "n_j").agg(
        F.count(F.lit(1)).alias("inter")
    )
    jac = inter.withColumn(
        "jaccard",
        F.col("inter").cast("double")
        / (F.col("n_i") + F.col("n_j") - F.col("inter")).cast("double"),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_i", "doc_j", "jaccard"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    k: int = 32,
    bands: int = 16,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    k-wide signature, `bands` bands of k/bands rows; docs colliding in any
    band become candidates; candidates are verified with exact shingle
    Jaccard (so output == ngram_jaccard_pairs modulo the ~1e-7 per-pair LSH
    miss probability at threshold 0.8 with 16x2 banding).

    100 TB shape: signatures are fixed 256 B/doc; the band-bucket shuffle
    carries (band, hash, doc_id) triples only. The expensive shingle join
    runs solely on LSH candidates.
    """
    r = k // bands
    toks = docs.select(
        F.col(id_col), T.tokens(text_col).alias("t")
    ).filter(F.size("t") >= n)
    # Signature via CODEGEN'D AGGREGATES, not an array HOF: higher-order
    # lambdas run interpreted (~20 ns/eval x |shingles| x k dominates the
    # whole operator). Exploding the pre-hashed shingles and taking k
    # min(xxhash64(h, j)) aggregates keeps every hash inside whole-stage
    # codegen with map-side partial aggregation — the shuffle carries ~one
    # row per (doc, partition). Same hash family, identical candidates.
    ex = toks.select(
        F.col(id_col), F.explode(T.shingles(F.col("t"), n)).alias("s")
    ).select(F.col(id_col), F.xxhash64("s").alias("h"))
    # Round-11 note: a vectorized Arrow signature lane (per-task partial
    # minima via a bit-exact numpy XXH64 pass, then a JVM final min over
    # ~one row per (doc, task)) was built, certified signature-identical,
    # and REVERTED on measured loss: interleaved A/B 1.194 s (this form)
    # vs 1.265 s at sf0.1 AND 5.79 vs 6.31 s on a 10x resampled corpus —
    # the codegen'd aggregates with map-side partials beat the Arrow
    # transpose+transfer at both scales. A true single-buffer array
    # aggregate is not expressible in Catalyst (no elementwise array-min
    # aggregate builtin), and a pandas GROUPED_AGG UDAF ships every row
    # (no partial aggregation) — strictly worse at 100 TB.
    sig = ex.groupBy(id_col).agg(
        F.array(*T.minhash_agg_exprs("h", k)).alias("sig")
    )
    bands_df = sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.struct(
                    bidx.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("sig"), bidx * r + 1, r)),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # Candidate pairs via bucket grouping, NOT a self-join: a self-join
    # would re-evaluate the whole signature pipeline on both sides (the
    # signature is the expensive stage). One groupBy on (band, bucket)
    # computes signatures once; same-bucket pairs come from an in-bucket
    # combination expansion (bucket sizes are near-dup cluster sizes —
    # tiny — so the expansion is bounded). Measured 8.2 s -> ~5 s at sf0.1.
    buckets = (
        bands_df.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    candidates = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_i, y AS doc_j))))"
                )
            ).alias("p")
        )
        .select("p.doc_i", "p.doc_j")
        .distinct()
    )

    # exact verify on candidates only (shingle sets rebuilt from toks —
    # cheap relative to the signature, and never shuffled in full)
    sh_sets = toks.select(F.col(id_col), T.shingles(F.col("t"), n).alias("sh"))
    si = sh_sets.select(F.col(id_col).alias("doc_i"), F.col("sh").alias("sh_i"))
    sj = sh_sets.select(F.col(id_col).alias("doc_j"), F.col("sh").alias("sh_j"))
    verified = (
        candidates.join(si, "doc_i")
        .join(sj, "doc_j")
        .withColumn("inter", F.size(F.array_intersect("sh_i", "sh_j")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sh_i") + F.size("sh_j") - F.col("inter")).cast("double"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "doc_i", "doc_j", "jaccard"
    )


def dedup_clusters(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id)
    with cluster_id = min doc_id in the component (the keeper).

    Iterative min-label propagation: each round every vertex takes the min
    label among itself and its neighbors; converges in O(component
    diameter) rounds — near-dup clusters are tiny (pairs/triples), so 2-3
    rounds in practice. Each round is one join + one groupBy (shuffles on
    vertex id). The output is hash-certified against an exhaustive
    transitive-closure oracle, so a silent early exit would be a WRONG
    answer, not a degraded one: if `max_iter` rounds pass without
    convergence (a component of diameter > max_iter — pathological for
    near-dup graphs) the operator RAISES instead of returning
    partially-propagated labels.

    An iterative algorithm has no single-query SQL oracle — the driver's
    rows-only check applies; pytest verifies against a Python
    transitive-closure reference.
    """
    edges = (
        pairs.select(F.col("doc_i").alias("src"), F.col("doc_j").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_j").alias("src"), F.col("doc_i").alias("dst"))
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .cache()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the count above materialized new_labels' cache, so the previous
        # generation is dead — release it, or iterations accrue executor
        # storage linearly (the 100 TB leak)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:  # exhausted max_iter without a changed==0 round
        edges.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    # the final labels cache was materialized by the last `changed` count;
    # the edge relation is no longer needed by the returned plan
    edges.unpersist()
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _simhash_pipeline(
    hashes: DataFrame,
    n_bits: int,
    max_hamming: int,
    id_col: str,
) -> DataFrame:
    """Shared SimHash pipeline over a (id, h) token-hash relation:
    per-bit majority votes -> n_bits signature -> pigeonhole chunk join
    (max_hamming+1 chunks; any pair within distance max_hamming shares an
    exact chunk) -> exact hamming verify. Parameterized by bit width so
    the 64-bit xxhash64 production form and the 60-bit md5 certified form
    are ONE implementation (divergence here would silently break the
    certified variant's claim to represent the production machinery)."""
    chunks = max_hamming + 1
    width = n_bits // chunks
    bit_aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)))
        .alias(f"b{b}")
        for b in range(n_bits)
    ]
    sig_expr = F.lit(0).cast("bigint")
    for b in range(n_bits):
        sig_expr = sig_expr.bitwiseOR(
            F.when(
                F.col(f"b{b}") * 2 >= F.col("n"),
                F.shiftleft(F.lit(1).cast("bigint"), b),
            ).otherwise(F.lit(0).cast("bigint"))
        )
    sig = (
        hashes.groupBy(id_col)
        .agg(*bit_aggs)
        .select(F.col(id_col), sig_expr.alias("sig"))
    )
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(F.col("sig"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("chunk_val"),
            )
            for c in range(chunks)
        ]
    )
    chunked = sig.select(
        F.col(id_col), F.col("sig"), F.explode(chunk_structs).alias("ch")
    ).select(
        F.col(id_col), F.col("sig"),
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.chunk_val").alias("chunk_val"),
    )
    a, b_ = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_i"),
            F.col(f"b.{id_col}").alias("doc_j"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
            .cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: hamming(sig_i, sig_j) <= max_hamming.

    Pigeonhole: split 64 bits into max_hamming+1 chunks; any pair within
    distance max_hamming shares at least one exact chunk -> equi-join on
    (chunk_idx, chunk_value), then exact hamming verify. No O(n^2) compare.
    """
    hashes = docs.select(
        F.col(id_col), F.explode(T.tokens(text_col)).alias("tok")
    ).select(F.col(id_col), F.xxhash64("tok").alias("h"))
    return _simhash_pipeline(hashes, 64, max_hamming, id_col)


def edit1_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 64,
) -> DataFrame:
    """Edit-distance-<=1 candidate pairs via deletion neighborhoods (the
    SymSpell shape): every string maps to itself plus its single-character
    deletions; two strings within one edit share at least one variant, so
    an equi-join on the variant finds all candidates — no quadratic
    comparison, no fuzzy-match UDF.

    The variant expansion is a `sequence`+`transform` expression (length+1
    variants per string, bounded by `max_len`); the join key is
    xxhash64(variant) so the shuffle carries 8-byte keys. Exact-verify of
    candidates (deletions also collide for some distance-2 pairs) is the
    caller's choice — for dedup keep-lists the collision is usually the
    wanted behavior. Returns (id_i, id_j, s_i, s_j) with id_i < id_j.

    At 100 TB: shuffle volume is rows x avg_len — linear, the same
    inverted-index idea as the shingle tiers one level down (chars instead
    of token n-grams)."""
    s = F.substring(F.col(text_col), 1, max_len)
    # deletion i = prefix before position i + suffix after it
    variants = F.array_union(
        F.array(s),
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.concat(
                F.substr(s, F.lit(1), i - 1),
                F.substr(s, i + 1, F.length(s) - i),
            ),
        ),
    )
    ex = df.select(
        F.col(id_col), s.alias("__s"), F.explode(variants).alias("__v")
    ).select(F.col(id_col), F.col("__s"), F.xxhash64("__v").alias("__vh"))
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__vh") == F.col("b.__vh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_i"),
            F.col(f"b.{id_col}").alias("id_j"),
            F.col("a.__s").alias("s_i"),
            F.col("b.__s").alias("s_j"),
        )
        .distinct()
    )


def line_dedup(
    docs: DataFrame,
    lines_col,
    min_dup_docs: int = 2,
    sep: str = " ",
    id_col: str = "doc_id",
) -> DataFrame:
    """RefinedWeb-style exact line deduplication: any line occurring in
    >= `min_dup_docs` DISTINCT documents is removed from every document,
    and each document's text is rebuilt from its surviving lines in
    original order. Returns (doc_id, clean_text, n_lines, n_kept) — docs
    whose every line was boilerplate still appear, with empty clean_text.

    `lines_col` is an array<string> column expression (the caller chooses
    the segmentation — '\\n' split for real text; the registry query uses
    fixed token windows because the synthetic corpus is single-line).

    100 TB shape: one explode + two shuffles — a groupBy on the line
    (heavy-hitter counting; line values reduce to their xxhash64 before
    shuffling so the exchange carries 8-byte keys) and the per-doc rebuild
    groupBy. The duplicated-line relation is broadcast back (it is the
    small output of the first aggregate — boilerplate lines by
    construction), so the corpus is never joined shuffle-to-shuffle.
    """
    base = docs.select(F.col(id_col), lines_col.alias("__lines"))
    lines = base.select(
        F.col(id_col),
        F.size("__lines").alias("n_lines"),
        F.posexplode("__lines").alias("pos", "line"),
    ).withColumn("lh", F.xxhash64("line"))
    dup = (
        lines.groupBy("lh")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_dup_docs)
        .select("lh")
    )
    kept = lines.join(F.broadcast(dup), "lh", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.first("n_lines").alias("n_lines"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("clean_text"),
    )
    # docs that lost every line (or had none) re-enter with empty text
    all_docs = base.select(
        F.col(id_col), F.size("__lines").cast("bigint").alias("__n")
    )
    return (
        all_docs.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_lines").cast("bigint"), F.col("__n")).alias(
                "n_lines"
            ),
            F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
        )
    )


def shared_span_pairs(
    docs: DataFrame,
    n: int = 3,
    min_span_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact repeated-substring detection between documents (the
    suffix-array-dedup result, computed relationally): for every doc pair
    sharing at least one token n-gram, the length in TOKENS of their
    longest common contiguous token run; pairs below `min_span_tokens` are
    dropped. Returns (doc_i, doc_j, max_shared_span).

    Algorithm — diagonal islands over positional shingles:
    1. (doc, pos, h): every n-gram occurrence with its start position,
       hashed to 8 bytes.
    2. Inverted-index self-join on h (posting-list-size>=2 prune shares
       the join's exchange, as in ngram_jaccard_pairs) -> matches
       (doc_i, doc_j, pos_i, pos_j).
    3. A shared token run of length L contributes L-n+1 consecutive
       matches along one DIAGONAL (pos_i - pos_j constant). Islands:
       within (pair, diag), consecutive pos_i values satisfy
       pos_i - row_number() = const -> group, count, span = count + n - 1.
    4. Max island span per pair, thresholded.

    100 TB shape: two keyed shuffles (n-gram hash; then (pair, diag)
    carries only int tuples). Hot n-grams need the same stop-shingle
    guard as the Jaccard index (boilerplate_shingles feeds it). This
    subsumes fixed-threshold near-dup for contamination use: a 50-token
    verbatim quote inside two otherwise-different documents is invisible
    to whole-doc Jaccard but is exactly what this surfaces.
    """
    toks = docs.select(
        F.col(id_col), T.tokens(text_col).alias("t")
    ).filter(F.size("t") >= n)
    sh = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (n - 1)),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("t"), i, n))),
            )
        ).alias("pos", "h"),
    )
    pw = Window.partitionBy("h")
    sh = (
        sh.withColumn("__pc", F.count(F.lit(1)).over(pw))
        .filter(F.col("__pc") >= 2)
        .drop("__pc")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    matches = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("doc_i"),
        F.col(f"b.{id_col}").alias("doc_j"),
        F.col("a.pos").alias("pos_i"),
        F.col("b.pos").alias("pos_j"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    iw = Window.partitionBy("doc_i", "doc_j", "diag").orderBy("pos_i")
    islands = matches.withColumn(
        "island", F.col("pos_i") - F.row_number().over(iw)
    )
    spans = (
        islands.groupBy("doc_i", "doc_j", "diag", "island")
        .agg((F.count(F.lit(1)) + F.lit(n - 1)).alias("span"))
    )
    return (
        spans.groupBy("doc_i", "doc_j")
        .agg(F.max("span").cast("bigint").alias("max_shared_span"))
        .filter(F.col("max_shared_span") >= min_span_tokens)
    )


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    stop_shingles: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric near-dup pairs by n-gram CONTAINMENT: |A∩B| / min(|A|,|B|).

    Jaccard misses subsumption — a document quoted whole inside a much
    larger one scores |A|/|B| ≈ 0 Jaccard but 1.0 containment of the
    smaller side. This is the Broder containment measure the "quote /
    wrapper page" dedup tier keys on; RefinedWeb-style cascades run it
    beside Jaccard because each catches pairs the other can't.

    Returns (doc_i, doc_j, containment, jaccard) for doc_i < doc_j and
    containment >= threshold. Same inverted-index physics as
    `ngram_jaccard_pairs` (shared-shingle candidates are lossless for any
    threshold > 0; posting-list-1 pruning; 8-byte hashed shingle keys),
    so the candidate join stays linear in posting-list mass at 100 TB —
    including the same `stop_shingles` hot-head anti-join (shared
    scaffolding, same width guard), since a boilerplate footer dominates
    this tier's posting lists exactly as it does Jaccard's.
    """
    sh, sizes = _hashed_shingles(docs, n, id_col, text_col, stop_shingles)
    inter = _candidate_inter(sh, id_col)
    sa = sizes.select(F.col(id_col).alias("doc_i"), F.col("n_sh").alias("n_i"))
    sb = sizes.select(F.col(id_col).alias("doc_j"), F.col("n_sh").alias("n_j"))
    scored = (
        inter.join(sa, "doc_i")
        .join(sb, "doc_j")
        .withColumn(
            "containment",
            F.col("inter").cast("double")
            / F.least("n_i", "n_j").cast("double"),
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_i") + F.col("n_j") - F.col("inter")).cast("double"),
        )
    )
    return scored.filter(F.col("containment") >= threshold).select(
        "doc_i", "doc_j", "containment", "jaccard"
    )


def novel_ngram_rate(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document novelty: the fraction of its distinct n-grams whose
    FIRST corpus occurrence (by ascending id — ingest order) is this
    document. The streaming-ingest freshness/memorization signal: a feed
    that re-crawls the same boilerplate trends toward 0, genuinely new
    text toward 1 (dashboards alert on the corpus-level drop).

    One explode + one min-per-shingle aggregate + one join back — the
    first-seen relation shuffles 8-byte shingle hashes, and at 100 TB the
    min(doc_id) aggregate is map-side partial like any min. Returns
    (doc_id, n_shingles, novel_shingles, novel_frac).
    """
    sh = _shingle_df(docs, n, id_col, text_col).select(
        F.col(id_col), F.xxhash64("shingle").alias("h")
    )
    first_seen = sh.groupBy("h").agg(F.min(id_col).alias("first_id"))
    novel = F.sum(
        F.when(F.col("first_id") == F.col(id_col), 1).otherwise(0)
    ).cast("bigint")
    return (
        sh.join(first_seen, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            novel.alias("novel_shingles"),
        )
        .withColumn(
            "novel_frac",
            F.col("novel_shingles").cast("double")
            / F.col("n_shingles").cast("double"),
        )
    )


def simhash_pairs_portable(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs on a 60-bit md5-derived token hash — the
    CERTIFIABLE sibling of `simhash_pairs`: xxhash64 has no DuckDB
    equivalent, so the production operator is rows-only at the driver
    gate; this variant swaps the hash family for the engine-portable
    60-bit md5 prefix (same trick as the KMV/A-ES sketches) so the whole
    pigeonhole+verify pipeline is DuckDB-replayable and hash-gated. Both
    variants run the SAME `_simhash_pipeline` (bit width is the only
    parameter); the oracle replays it with (h // 2^b) % 2 arithmetic —
    mathematically identical to the JVM shiftright/AND used here (a
    double-division Spark formulation would corrupt bits past the 53-bit
    mantissa). Cost note: md5+conv is a slower per-token hash than
    xxhash64 (~2x the operator at sf0.1), which is exactly why the
    production operator keeps xxhash64 and this one exists for
    certification.
    """
    h = F.conv(
        F.substring(F.md5(F.col("tok")), 1, 15), 16, 10
    ).cast("bigint")
    hashes = docs.select(
        F.col(id_col), F.explode(T.tokens(text_col)).alias("tok")
    ).select(F.col(id_col), h.alias("h"))
    return _simhash_pipeline(hashes, 60, max_hamming, id_col)


def simhash_portable_oracle_sql(max_hamming: int = 3) -> str:
    n_bits = 60
    chunks = max_hamming + 1
    width = n_bits // chunks
    bit_sums = ", ".join(
        f"SUM((h // {1 << b}) % 2) AS b{b}" for b in range(n_bits)
    )
    sig_terms = " + ".join(
        f"CASE WHEN b{b} * 2 >= n THEN CAST({1 << b} AS BIGINT) "
        f"ELSE 0 END"
        for b in range(n_bits)
    )
    chunk_vals = ", ".join(
        f"({c}, CAST({1 << (c * width)} AS BIGINT))" for c in range(chunks)
    )
    ham_terms = " + ".join(
        f"CASE WHEN (sig_a // {1 << b}) % 2 <> (sig_b // {1 << b}) % 2 "
        f"THEN 1 ELSE 0 END"
        for b in range(n_bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
    h AS (SELECT doc_id,
                 CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
          FROM toks),
    bits AS (SELECT doc_id, COUNT(*) AS n, {bit_sums}
             FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({sig_terms} AS BIGINT) AS sig FROM bits),
    ch AS (
      SELECT doc_id, sig, c, (sig // dv) % {1 << width} AS cv
      FROM sig CROSS JOIN (VALUES {chunk_vals}) t(c, dv)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j,
             a.sig AS sig_a, b.sig AS sig_b
      FROM ch a JOIN ch b
        ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id),
    scored AS (
      SELECT doc_i, doc_j, CAST({ham_terms} AS BIGINT) AS hamming
      FROM cand)
    SELECT doc_i, doc_j, hamming FROM scored
    WHERE hamming <= {max_hamming}
    """


def jaccard_pairs_prefix_filtered(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (AllPairs/PPJoin, Bayardo
    et al. WWW'07) — the third result-invariant accelerator next to
    `salted_hot_key_join` and `bloom_decontamination`, certified the same
    way: its registered oracle is the plain exact-pairs query, so the
    driver hash-compare PROVES the optimization loses nothing.

    The theorem: order every doc's shingle set by a global total order
    (ascending document frequency, rarest first — the order that shrinks
    candidate lists most); if J(A,B) >= t then A and B must share a
    shingle within each one's first |x| - ceil(t*|x|) + 1 shingles.
    So the candidate join indexes ONLY prefixes — at t=0.8 that is ~20%
    of the inverted index, and the prefix entries are the RAREST
    shingles, so posting lists (hence join fan-out) shrink far more than
    5x in a Zipf vocabulary. Candidates then verify with the exact
    intersection count, computed pair-bounded (candidates join the full
    shingle relation) rather than index-wide.

    Honest local measurement: on the SYNTHETIC corpus the shingle
    posting lists are already near-singleton, so the plain join is cheap
    and the ranking window makes this form ~10% SLOWER at sf0.1 (2.25 s
    vs 1.99 s). The algorithm's value is the Zipf case — web-scale
    shingle distributions where hot posting lists make the plain join
    quadratic — which is why it registers as a certified scale-path
    sibling, not the bench/default form.

    Same output contract as `ngram_jaccard_pairs`.
    """
    sh, sizes = _hashed_shingles(docs, n, id_col, text_col)
    # global order: document frequency (computed over the same shingle
    # partitioning the candidate join uses), tie-broken by shingle value
    pw = Window.partitionBy("shingle")
    ranked = (
        sh.withColumn("__df", F.count(F.lit(1)).over(pw))
        # posting-list-1 pruning composes with prefix filtering: a
        # df=1 shingle can't produce a candidate pair
        .filter(F.col("__df") >= 2)
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("__df", "shingle")
            ),
        )
    )
    prefix_len = F.col("n_sh") - F.ceil(
        F.lit(threshold) * F.col("n_sh")
    ) + 1
    prefix = (
        ranked.join(sizes, id_col)
        .filter(F.col("__rn") <= prefix_len)
        .select(F.col(id_col), "shingle")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_i"),
            F.col(f"b.{id_col}").alias("doc_j"),
        )
        .distinct()
    )
    sa = sh.select(F.col(id_col).alias("doc_i"), "shingle")
    sb = sh.select(F.col(id_col).alias("doc_j"), "shingle")
    inter = (
        cand.join(sa, "doc_i")
        .join(sb, ["doc_j", "shingle"])
        .groupBy("doc_i", "doc_j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold, id_col)


def leakage_safe_splits(
    docs: DataFrame,
    clusters: DataFrame,
    test_thr: str = "1a",
    val_thr: str = "34",
    id_col: str = "doc_id",
) -> DataFrame:
    """Group-aware train/val/test assignment: the split UNIT is the
    near-dup CLUSTER, not the document, so no near-duplicate pair can
    straddle a split boundary (the eval-leakage failure mode of naive
    per-doc random splits — Lee et al. 2022 measure the benchmark
    inflation it causes).

    `clusters` is any (id, cluster_id) relation (dedup_clusters output);
    docs absent from it are their own singleton cluster. Assignment is
    the hash_sample trick on the CLUSTER id: the first two hex chars of
    md5(cluster_id) against string thresholds — deterministic,
    engine-portable, RNG-free, stable under re-runs and cluster-size
    changes. Defaults: bucket < '1a' -> test (~10.2%), < '34' -> val
    (~10.2% more), else train.

    Scale shape: one left join of the doc relation against the (tiny)
    cluster label table — broadcastable — then a scan-side expression.
    Returns (id, cluster_id, split).
    """
    lab = (
        docs.select(id_col)
        .join(clusters, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
    b = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 2)
    return lab.withColumn(
        "split",
        F.when(b < test_thr, "test")
        .when(b < val_thr, "val")
        .otherwise("train"),
    )
