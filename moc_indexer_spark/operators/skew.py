"""Skew mitigation: salted join (the manual fallback when AQE's skew-join
splitting isn't available — e.g. broadcast-ineligible skewed build sides,
or pre-3.0 clusters).

A hot key (one address owning 30% of transactions — common in chain data:
exchanges, routers) lands one reducer with 30% of the table. Salting
splits it: the skewed (large) side gets a random salt in [0, n); the small
side is replicated n times with every salt; the join key becomes
(key, salt). Result identical to the plain join, reducer load divided by n.

AQE (enabled in session.py) handles sort-merge skew automatically at
runtime; this operator exists for the cases it can't touch and as the
explicit, testable form of the technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` with `small` on `key`, salted `n_salts` ways.

    `small` is replicated n_salts x (explode of a literal salt array) — keep
    it the dimension side. Deterministic salt: pmod(xxhash64(monotonic row
    id is NOT deterministic — use the key plus a per-row uniform hash of all
    columns), n) would still collide per-key... the point is load-spreading,
    so a per-ROW pseudo-random salt derived from the row content is used.
    """
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).cast("int")
    s = skewed.withColumn("__salt", salt_col)
    r = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = s.join(r, on=[key, "__salt"], how=how)
    return out.drop("__salt")
