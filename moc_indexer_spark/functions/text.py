"""Text-analysis column expressions for the LLM-data-pipeline operators.

No reference analog (BASELINE.json north star: dedup / similarity / text
analysis at 100 TB scale). All expressions are JVM-side Catalyst exprs —
no Python UDFs in any hot path; higher-order array functions (filter /
transform / aggregate) run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny embedded stopword list (the synthetic corpus vocabulary's function
# words); real deployments swap in a per-language table broadcast-joined in
STOPWORDS = ("the", "a", "of", "and", "in")


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokens, empties dropped. Mirrors the DuckDB oracle
    `list_filter(str_split(text,' '), x -> x <> '')` exactly."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))


def token_count(text_col: str = "text") -> Column:
    return F.size(tokens(text_col)).cast("bigint")


def distinct_token_count(text_col: str = "text") -> Column:
    return F.size(F.array_distinct(tokens(text_col))).cast("bigint")


def stopword_count(text_col: str = "text") -> Column:
    sw = list(STOPWORDS)
    return F.size(
        F.filter(tokens(text_col), lambda x: x.isin(sw))
    ).cast("bigint")


def shingles(tok_col: Column, n: int) -> Column:
    """Distinct word n-gram shingles. Caller must filter size(tokens) >= n
    (Spark `sequence(1, k)` with k<1 generates a DESCENDING sequence)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok_col, i, n)),
        )
    )


def ngrams_all(tok_col: Column, n: int) -> Column:
    """All word n-gram occurrences (NOT deduped — this is the multiset the
    repetition filters count over). Empty array when the doc has fewer than
    n tokens (guards Spark's descending `sequence(1, k)` for k < 1)."""
    return F.when(
        F.size(tok_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def content_fingerprint(text_col: str = "text") -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token bag — the batch analog of the reference's idempotent content keys
    (rolling-hash variant lives in simhash/minhash)."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col))))
    )


def minhash_agg_exprs(hash_col: str = "h", k: int = 32) -> list[Column]:
    """k MinHash aggregate expressions over an exploded, pre-hashed shingle
    relation: min(xxhash64(h, j)) for j in 0..k-1.

    The aggregate formulation (vs an array higher-order function) keeps
    every hash inside whole-stage codegen with map-side partial
    aggregation — HOF lambdas run interpreted, which made the signature
    the dominant cost of the LSH operator (measured 6.7x at sf0.1, see
    operators/dedup.py minhash_lsh_pairs). xxhash64's fixed seed makes the
    signature deterministic across runs and executors. Note: this hashes
    xxhash64(pre-hashed shingle, j), whereas the HOF formulation it
    replaced hashed xxhash64(raw shingle, j) — a DIFFERENT (still valid)
    MinHash family, so signatures and LSH candidate sets are
    equivalent-in-distribution, not bit-identical, across versions; the
    downstream exact-Jaccard verify makes the final pairs identical."""
    return [F.min(F.xxhash64(F.col(hash_col), F.lit(j))) for j in range(k)]


def simhash_bit_aggs(hash_col: str = "h") -> list[Column]:
    """Aggregate exprs for SimHash: per-key token count + per-bit vote sums.
    Used over an exploded (key, token-hash) relation — one pass, map-side
    partial aggregation, 65 bigint counters per key in the shuffle."""
    return [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftright(hash_col, b).bitwiseAND(F.lit(1))).alias(f"bit{b}")
        for b in range(64)
    ]


def simhash_assemble() -> Column:
    """Assemble the 64-bit signature from `simhash_bit_aggs` outputs: bit b
    is set iff the majority of token hashes had bit b set."""
    sig = F.lit(0).cast("bigint")
    for b in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"bit{b}") * 2 >= F.col("n"),
                F.shiftleft(F.lit(1).cast("bigint"), b),
            ).otherwise(F.lit(0).cast("bigint"))
        )
    return sig


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
