"""Distributed Bloom filter — build and probe as pure Catalyst plans.

Membership pre-filters are the classic decontamination / anti-join
accelerator at corpus scale: when the "small" side of a semi-join (the
benchmark / blocklist key set) is itself too large to broadcast as exact
keys (a 13-gram decontamination set over dozens of benchmarks runs to
billions of shingles ≈ tens of GB of 8-byte hashes), its Bloom filter at
~10 bits/key still fits every executor. Spark itself applies the same idea
internally (runtime row-level BloomFilter join pruning,
`spark.sql.optimizer.runtime.bloomFilter.enabled`); this module is the
explicit, composable operator form with a testable exact-confirm step.

Design — no driver funnel, no Python, no UDFs:

* **Hash family.** Double hashing (Kirsch–Mitzenmacher): position_i =
  (h1 + i*h2) mod m for i in 0..k-1, with h1 = xxhash64(key) and
  h2 = 2*murmur3(key)+1 (odd, so it is a unit modulo the power-of-two m and
  the k probe positions never collapse onto one slot). Both hashes and the
  position arithmetic are Catalyst expressions inside whole-stage codegen.
* **Build.** Explode each key into its k bit positions, map a position to
  (word = pos div 64, bit = pos mod 64), and aggregate
  `bit_or(1 << bit)` per word. The result is a DataFrame of at most m/64
  rows — the filter itself, built with one map-side-combining shuffle whose
  width is the FILTER size, not the key-set size. Raw keys never reach the
  driver (contrast `df.stat.bloomFilter`, which ships per-partition filters
  to the driver to OR them; here the OR is the shuffle).
* **Probe.** The probe side computes the same k positions, explodes, and
  broadcast-joins the word table; a row is a candidate iff all k probed
  bits are set (count == k). No false negatives ever (Bloom guarantee ⇒
  the probe is a lossless pre-filter for a subsequent exact confirm);
  false positives are culled by the confirm join, which now sees only the
  candidate fraction (~fpp of non-members) instead of the whole corpus.

m must be a power of two (pmod + odd-h2 requirement); m/64 longs ≈ m/8
bytes broadcast — 1<<23 bits = 1 MiB covers ~1M keys at 1% fpp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of the k probe bit-positions for `key` (any orderable type)."""
    h1 = F.xxhash64(key)
    # murmur3 is 32-bit; *2+1 keeps it odd => coprime with the 2^j modulus
    h2 = F.hash(key).cast("bigint") * 2 + 1
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Build the filter: DataFrame of (word: bigint, bits: bigint), one row
    per 64-bit word with at least one set bit (absent word == all zeros).
    At most m_bits/64 rows regardless of |keys|."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    pos = keys.select(
        F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos")
    )
    # shiftleft with a COLUMN shift amount is SQL-only (the pyspark wrapper
    # pins numBits to a literal int)
    return (
        pos.select(
            (F.col("pos") / 64).cast("bigint").alias("word"),
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    rows: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Filter `rows` to Bloom candidates (all k probed bits set).

    Exactly preserves every row whose key was in the built key set (no
    false negatives); passes a ~fpp fraction of others. Output columns ==
    input columns. `rows` must not already contain `__bf_pos`/`__bf_n`,
    and its rows must be DISTINCT tuples: the all-k-bits test groups by the
    full row, so duplicate rows would merge and over-count the probe hits
    (dedupe upstream — every membership-filter use site already probes a
    distinct key relation).

    The explode multiplies the probe relation k× before the broadcast join;
    the join output collapses straight back in a partial-aggregating
    count. For k ≲ 8 that is cheaper than shipping the corpus through a
    shuffle join against the raw key set — which is the scenario this
    operator exists for (key set ≫ broadcast threshold, filter ≪ it).
    """
    cols = rows.columns
    probed = rows.withColumn(
        "__bf_pos", F.explode(_positions(F.col(key_col), m_bits, k))
    ).withColumn("__bf_word", (F.col("__bf_pos") / 64).cast("bigint"))
    hit = probed.join(F.broadcast(bloom), F.col("__bf_word") == F.col("word"))
    bit_set = (
        F.expr("shiftright(bits, CAST(pmod(__bf_pos, 64) AS INT))").bitwiseAND(
            F.lit(1)
        )
        == 1
    )
    return (
        hit.filter(bit_set)
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__bf_n"))
        .filter(F.col("__bf_n") == k)
        .drop("__bf_n")
    )
