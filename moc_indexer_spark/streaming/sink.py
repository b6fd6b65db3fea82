"""Idempotent keyed upsert sink (the Mongo `find_one_and_update(upsert=True)`
analog, /root/reference/indexer/scan_raw_txs.py:51-54 and every handler).

No Delta in this environment, so MERGE is implemented over plain parquet in
two modes — the copy-on-write / merge-on-read pair every lakehouse format
offers:

- mode="cow" (default): read-modify-write with an atomic directory swap:
    new_table = old_table ANTI-JOIN incoming-keys  UNION  incoming
  Every upsert rewrites the table — cheapest reads, O(table) writes. Right
  for large, rarely-updated batches.
- mode="mor": each upsert APPENDS a delta batch as a `__seq=N/` partition
  directory (atomic rename, one dir per batch); `read()` resolves
  latest-row-per-key across base+deltas (version_col first, then batch
  sequence), and `compact()` folds the deltas back into a single base —
  O(batch) writes, reads pay a window until compaction. Right for the
  3-second incremental cycles, where CoW's per-cycle rewrite dominates
  latency (measured in PLANS.md). Deletes append tombstones
  (`__deleted=true`) that resolution filters out.

Shared guards in both modes (the reference's semantics):
  - monotonic version guard (T8, moc_balances.py:127-136):
    `WHEN MATCHED AND source.version >= target.version THEN UPDATE`
  - update-only mode (T6, fastbtcbridge.py:58-78 upsert=False):
    incoming rows without a matching key are dropped.
  - in-batch dedup on the key, keeping the highest version (Mongo applies
    sequential upserts; a set-based MERGE must pre-coalesce).
  - partial `$set`: a batch carrying a column subset keeps missing columns'
    existing values.

Scale notes: at 100 TB the table would be Delta/Iceberg/Hudi with real
MERGE, a transaction log, and bucket-pruned rewrites; the semantics here
are identical and single-writer (the reference is single-writer too — one
indexer daemon owns each collection).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .swap import recover_swap, swap_dir


class ParquetUpsertTable:
    """A keyed table backed by parquet with MERGE-like upsert semantics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        version_col: str | None = None,
        n_buckets: int = 16,
        mode: str = "cow",
        compact_every: int = 64,
    ):
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        self.spark = spark
        # normalize: a trailing slash would land staging dirs
        # (f"{path}__stage_...") back INSIDE the table directory, recreating
        # the partial-file partition-discovery hazard staging exists to avoid
        self.path = path.rstrip("/") or path
        self.keys = keys
        self.version_col = version_col
        self.n_buckets = n_buckets
        self.mode = mode
        # auto-compact after this many delta batches (MoR only): bounds the
        # window fan-in and the small-file count between maintenance runs
        self.compact_every = compact_every
        # Single-writer schema cache (the 3 s-tick headroom work): each MoR
        # upsert used to build a mergeSchema read just to learn the column
        # set (~80 ms of driver analysis per sink per cycle), and every
        # read() paid distributed footer merging across all delta dirs.
        # This instance owns all writes, so the schema is known after one
        # read and extended on append. Evolution contract: columns are
        # ADDED, never retyped (sink docstring) — a retype fails loudly at
        # the parquet scan. None = unknown (fresh instance over an existing
        # table); first access populates it.
        self._schema = None
        # Tombstones only enter via delete_where; while none were ever
        # appended, "key exists" degrades to a cheap distinct-keys scan
        # (no per-key window resolve). The flag survives restarts via a
        # marker protocol (a restarting daemon must not pay the resolve on
        # every update-only upsert forever): `__meta` is written on the
        # first append by a marker-aware writer, `__tombstones` is touched
        # by delete_where BEFORE the tombstone delta lands (crash-safe:
        # the marker can claim tombstones that never landed — conservative
        # — never the reverse). A pre-existing table WITHOUT `__meta` was
        # written by an older layout -> unknown -> resolve path.
        # Finish or roll back a swap a previous process crashed inside —
        # BEFORE exists(): a half-swapped table must not read as absent
        # (that would reset the tombstone flag and orphan the data under
        # the swap-old name).
        recover_swap(self.path)
        # sweep delta-staging dirs a crashed append left behind (the
        # stage->rename step is atomic, so these are never half-visible
        # to readers — just disk litter under the single-writer contract)
        parent = os.path.dirname(self.path) or "."
        stage_prefix = os.path.basename(self.path) + "__stage_"
        if os.path.isdir(parent):
            for d in os.listdir(parent):
                if d.startswith(stage_prefix):
                    shutil.rmtree(os.path.join(parent, d),
                                  ignore_errors=True)
        if not self.exists():
            self._may_have_tombstones: bool | None = False
        elif os.path.exists(self._marker("__tombstones")):
            self._may_have_tombstones = True
        elif os.path.exists(self._marker("__meta")):
            self._may_have_tombstones = False
        else:
            self._may_have_tombstones = None

    def _marker(self, name: str) -> str:
        # markers live NEXT TO the table dir, not inside it: partition
        # discovery over the table path must only ever see __seq=N dirs
        return f"{self.path}.{name}"

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        if self.mode == "mor":
            return os.path.isdir(self.path) and any(
                f.startswith("__seq=") for f in os.listdir(self.path)
            )
        return os.path.exists(os.path.join(self.path, "_SUCCESS")) or (
            os.path.isdir(self.path) and any(
                f.endswith(".parquet") for f in os.listdir(self.path)
            )
        )

    def _delta_seqs(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(f.split("=", 1)[1])
            for f in os.listdir(self.path)
            if f.startswith("__seq=")
        )

    def _read_raw(self) -> DataFrame:
        # partition discovery turns __seq=N/ dirs into an int column; deltas
        # may carry evolved schemas, so merge footers — unless this writer
        # instance already knows the merged schema (then the scan skips
        # footer merging entirely: cheaper reads as the delta count grows)
        if self._schema is not None:
            return self.spark.read.schema(self._schema).parquet(self.path)
        df = self.spark.read.option("mergeSchema", "true").parquet(self.path)
        self._schema = df.schema
        return df

    def _resolve(self, raw: DataFrame) -> DataFrame:
        """Latest-row-per-key over base+deltas: version_col (if any) wins
        first — the T8 monotonic guard falls out of the ordering — then the
        batch sequence (Mongo's last-writer-wins).

        A delete ends the key's version era: in Mongo, removing the
        document resets the guard, so a later upsert inserts fresh no
        matter how its version compares to the deleted row's. The
        tombstone carries the deleted row's version, so without the era
        filter a lower-version reinsert would LOSE to the tombstone in
        the (version, seq) ordering and the key would stay deleted —
        diverging from CoW and the reference. Rows at or before the
        key's last tombstone are therefore dropped first; the version
        ordering only ever compares rows of the live era. Unversioned
        tables order by seq alone, where the last row IS the live era —
        no extra window. Skipped entirely on the tombstone-free fast
        path (nothing to era-filter)."""
        if self.version_col and self._may_have_tombstones is not False and (
            "__deleted" in raw.columns
        ):
            w_key = Window.partitionBy(*self.keys)
            raw = (
                raw.withColumn(
                    "__last_del",
                    F.max(
                        F.when(F.col("__deleted"), F.col("__seq"))
                    ).over(w_key),
                )
                .filter(
                    F.col("__seq") > F.coalesce(F.col("__last_del"), F.lit(-1))
                )
                .drop("__last_del")
            )
        order = (
            [F.desc_nulls_last(self.version_col)] if self.version_col else []
        ) + [F.desc("__seq")]
        w = Window.partitionBy(*self.keys).orderBy(*order)
        out = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__seq")
        )
        if "__deleted" in out.columns:
            out = out.filter(
                ~F.coalesce(F.col("__deleted"), F.lit(False))
            ).drop("__deleted")
        return out

    def read(self, as_of_seq: int | None = None) -> DataFrame | None:
        """Resolved table state; `as_of_seq` time-travels a MoR table to the
        state after delta N (inclusive) — the lakehouse VERSION AS OF read.
        The `__seq` partition column prunes newer delta directories at the
        scan, so an as-of read costs the same as reading at that point in
        history, not a replay. CoW tables keep only the latest state (the
        reference's Mongo collections likewise have no history; MoR deltas
        ARE the history, until `compact()` folds them)."""
        if not self.exists():
            return None
        if self.mode == "mor":
            if as_of_seq is not None:
                seqs = self._delta_seqs()
                if seqs and as_of_seq < seqs[0]:
                    # compaction folded that point of history into the base;
                    # answering from post-compaction state would silently
                    # return FUTURE data for a past seq — refuse instead
                    raise ValueError(
                        f"as_of_seq={as_of_seq} predates the oldest surviving "
                        f"delta (__seq={seqs[0]}); earlier history was folded "
                        "by compaction"
                    )
                if seqs and as_of_seq <= seqs[-1] and as_of_seq not in seqs:
                    # seq numbers are assigned contiguously, so a GAP below
                    # the newest dir is a point compact_deltas() folded into
                    # a later delta; a prefix read would silently MISS those
                    # rows — refuse, like the pre-base case above
                    raise ValueError(
                        f"as_of_seq={as_of_seq} was folded away by delta "
                        "compaction (no surviving delta at that seq)"
                    )
            raw = self._read_raw()
            if as_of_seq is not None:
                raw = raw.filter(F.col("__seq") <= as_of_seq)
            if len(self._delta_seqs()) == 1:
                # single-dir fast path: every delta dir holds <=1 row per
                # key by construction (upsert dedups incoming, tombstones
                # and the compacted base are resolved views), so with one
                # dir the window resolve is the identity — skip the hash
                # shuffle + sort entirely. This is the steady post-compact
                # read shape: a freshly compacted 10M-row table reads
                # map-only instead of paying an Exchange per read.
                out = raw.drop("__seq")
                if "__deleted" in out.columns:
                    out = out.filter(
                        ~F.coalesce(F.col("__deleted"), F.lit(False))
                    ).drop("__deleted")
                return out
            return self._resolve(raw)
        if as_of_seq is not None:
            raise ValueError("time travel requires mode='mor' (delta history)")
        return self.spark.read.parquet(self.path)

    def history(self) -> list[int]:
        """Available delta sequence numbers (time-travel points)."""
        return self._delta_seqs() if self.mode == "mor" else []

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

    def upsert(
        self, batch: DataFrame, insert: bool = True, shards: int = 1
    ) -> None:
        """MERGE batch into the table.

        insert=False -> update-only (T6): non-matching incoming keys dropped.
        With version_col -> matched rows replaced only if
        incoming.version >= existing.version (T8).
        Batches may carry a column subset (partial $set) — missing columns
        keep their existing values.
        shards (MoR only) -> write the delta as up-to-`shards` files
        instead of one: a catch-up cycle's whole batch would otherwise
        fold through a single write task (the one serialization point in
        the recovery path). The caller gates it on known batch size —
        driver-side, no extra count job; tick-sized batches keep the
        measured single-file default. CoW rewrites are bucket-partitioned
        already and ignore it.
        """
        if self.mode == "mor" and shards <= 1:
            # Tick-path append (shards=1): the delta lands as ONE file
            # anyway (_append_delta coalesces post-dedup), so coalesce
            # BEFORE the key-dedup window instead — a SinglePartition
            # child satisfies the window's ClusteredDistribution, so the
            # whole append (compute batch -> dedup -> write) runs as one
            # exchange-free stage instead of paying a hash shuffle + a
            # second stage per sink per tick (6 sinks x 1 shuffle on a 3 s
            # cadence was pure scheduling overhead on a few hundred rows).
            # Catch-up batches (shards>1) keep their parallel shape; the
            # dedup result is unchanged — same window, same ordering, ties
            # were arbitrary-but-stable under either partitioning.
            batch = batch.coalesce(1)
        batch = self._dedup_incoming(batch)
        if self.mode == "mor":
            self._upsert_mor(batch, insert, shards)
            return
        existing = self.read()
        if existing is None:
            if insert:
                self._atomic_write(batch)
            return
        batch, existing = self._align_schemas(batch, existing)

        join_cond = [batch[k] == existing[k] for k in self.keys]

        if self.version_col:
            # Matched-ness must be its own flag (__m_*): using null-ness of
            # the version column conflated "no matching key" with "matched
            # row whose version is NULL" — duplicating keys when both
            # versions were NULL and dropping legit update-only rows whose
            # existing version was NULL. The version race itself follows
            # MoR's resolve ordering (desc_nulls_last): a non-NULL version
            # beats NULL; ties — equal or both NULL — go to the incoming
            # row (the >= guard / Mongo last-writer-wins).
            vk = self.version_col
            inc_keys = batch.select(
                *[F.col(k).alias(f"__k_{k}") for k in self.keys],
                F.col(vk).alias("__v_inc"),
                F.lit(True).alias("__m_inc"),
            )
            cond = [existing[k] == inc_keys[f"__k_{k}"] for k in self.keys]
            # keep existing rows with NO incoming match, or that BEAT the
            # incoming version (strictly greater, nulls-last)
            keep_existing = (
                existing.join(F.broadcast(inc_keys), cond, "left")
                .filter(
                    F.col("__m_inc").isNull()
                    | (
                        existing[vk].isNotNull()
                        & (
                            F.col("__v_inc").isNull()
                            | (existing[vk] > F.col("__v_inc"))
                        )
                    )
                )
                .drop(*[f"__k_{k}" for k in self.keys], "__v_inc", "__m_inc")
            )
            # incoming rows that don't lose the version race
            ex_keys = existing.select(
                *[F.col(k).alias(f"__k_{k}") for k in self.keys],
                F.col(vk).alias("__v_ex"),
                F.lit(True).alias("__m_ex"),
            )
            cond2 = [batch[k] == ex_keys[f"__k_{k}"] for k in self.keys]
            apply_incoming = (
                batch.join(F.broadcast(ex_keys), cond2, "left")
                .filter(
                    F.col("__m_ex").isNull()
                    | F.col("__v_ex").isNull()
                    | (batch[vk].isNotNull() & (batch[vk] >= F.col("__v_ex")))
                )
            )
            if not insert:
                apply_incoming = apply_incoming.filter(
                    F.col("__m_ex").isNotNull()
                )
            apply_incoming = apply_incoming.drop(
                *[f"__k_{k}" for k in self.keys], "__v_ex", "__m_ex"
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

    # -- merge-on-read write path -------------------------------------------

    def _append_delta(
        self, batch: DataFrame, shards: int = 1, auto_compact: bool = True
    ) -> None:
        """Append one batch as the next `__seq=N/` partition dir. The batch
        is written to a temp dir and renamed in — one atomic directory per
        upsert, O(batch) bytes, no table rewrite. `shards` > 1 keeps the
        write stage parallel for size-gated catch-up batches (read() is
        multi-file-tolerant inside a `__seq=` dir). `auto_compact=False`
        suppresses the compact_every full-fold check — compact_deltas()'s
        merge-append MUST pass it (ADVICE r9): a minor fold whose
        threshold sits at or near compact_every would otherwise silently
        absorb the O(table) rewrite the minor form exists to avoid."""
        seqs = self._delta_seqs()
        nxt = (seqs[-1] + 1) if seqs else 0
        os.makedirs(self.path, exist_ok=True)
        if "__deleted" not in batch.columns:
            batch = batch.withColumn("__deleted", F.lit(False))
        # stage OUTSIDE the table dir: a crash between write and rename must
        # never leave partial files where partition discovery will read them
        # (a garbage dir inside the path fails EVERY subsequent read)
        tmp = f"{self.path}__stage_{uuid.uuid4().hex[:8]}"
        # tick path (shards=1): coalesce, not repartition — the delta is
        # one small file either way, and coalesce folds the write into the
        # batch's own stage instead of adding a shuffle stage per append
        # (6 sinks x 1 stage per 3 s tick was measurable scheduling
        # overhead). Catch-up path (shards>1): repartition, not coalesce —
        # coalesce can only NARROW, and AQE may already have collapsed the
        # enrichment shuffle to one partition for exactly the batch the
        # gate wants spread out; an explicit numPartitions is respected by
        # AQE, and one extra O(batch) shuffle on an outage-recovery batch
        # is noise next to serializing its whole write through one task.
        out = batch.coalesce(1) if shards <= 1 else batch.repartition(shards)
        out.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, os.path.join(self.path, f"__seq={nxt}"))
        if self._may_have_tombstones is not None and not os.path.exists(
            self._marker("__meta")
        ):
            # marks this table as marker-aware, so a restart can trust the
            # ABSENCE of the tombstone marker (see __init__). A legacy table
            # in the unknown state must NOT be stamped here: it may already
            # hold tombstone deltas written before the marker layout, and
            # stamping would certify it tombstone-free at the next restart.
            # compact() is the upgrade path — it PROVES the table clean.
            with open(self._marker("__meta"), "w") as fh:
                fh.write('{"sink_layout": 2}')
        # extend the single-writer schema cache with any evolved columns
        if self._schema is not None:
            known = set(self._schema.fieldNames())
            for f_ in batch.schema.fields:
                if f_.name not in known:
                    self._schema = self._schema.add(f_)
        if auto_compact and len(seqs) + 1 >= self.compact_every:
            self.compact()

    def _upsert_mor(
        self, batch: DataFrame, insert: bool, shards: int = 1
    ) -> None:
        if not self.exists():
            if insert:
                self._append_delta(batch, shards)
            return
        raw_cols = [
            c for c in self._read_raw().columns
            if c not in ("__seq", "__deleted")
        ]
        missing = [c for c in raw_cols if c not in batch.columns]
        if missing:
            # partial $set: fill absent columns from the matched current row
            fill = self.read().select(*self.keys, *missing)
            batch = batch.join(F.broadcast(fill), self.keys, "left")
        if not insert:
            # update-only (T6): drop incoming keys with no current match.
            # While this writer has never appended a tombstone, "the key
            # exists" is just "the key appears in any row" — a distinct
            # scan, no per-key window resolve (the resolve's only job here
            # would be deciding whether a tombstone wins).
            if self._may_have_tombstones is False:
                existing_keys = self._read_raw().select(*self.keys).dropDuplicates(
                    self.keys
                )
            else:
                existing_keys = self.read().select(*self.keys)
            batch = batch.join(
                F.broadcast(existing_keys), self.keys, "left_semi"
            )
        # the T8 version guard needs no write-side join: resolution orders by
        # (version desc, seq desc), so a stale incoming version loses at read
        self._append_delta(batch, shards)

    def compact(self) -> None:
        """Fold deltas into a single base: the MoR maintenance action (Hudi
        compaction / Delta OPTIMIZE analog). Readers see the old or the new
        table, never a mix (directory swap). The base keeps the HIGHEST
        folded seq number (not 0), so surviving history points stay
        truthful: `read(as_of_seq=n)` for n >= base answers correctly and
        for folded-away n raises instead of silently serving future data."""
        if self.mode != "mor":
            return  # CoW has no deltas to fold — explicit no-op, not an error
        resolved = self.read()
        if resolved is None:
            return
        base_seq = self._delta_seqs()[-1]

        def _write(tmp_parent: str) -> None:
            (
                resolved.withColumn("__deleted", F.lit(False))
                .repartition(self.n_buckets, *self.keys)
                .write.mode("overwrite")
                .parquet(os.path.join(tmp_parent, f"__seq={base_seq}"))
            )
            # Spark's _SUCCESS lands inside the __seq dir; the swap's
            # completeness check reads the tmp ROOT — stamp it only after
            # the data write finished, so recovery never installs a
            # half-written fold
            with open(os.path.join(tmp_parent, "_SUCCESS"), "w"):
                pass

        swap_dir(self.path, _write)
        # The folded base is tombstone-free by construction (resolution
        # dropped every deleted key), so the update-only fast path is valid
        # again — without this, one retention delete would tax every future
        # update-only upsert with a per-key resolve forever. Marker removed
        # AFTER the swap: a crash in between leaves a stale marker
        # (conservative restart), never a tombstone the fast path misses.
        tomb = self._marker("__tombstones")
        if os.path.exists(tomb):
            os.remove(tomb)
        if not os.path.exists(self._marker("__meta")):
            # compaction proves the table tombstone-free, so a legacy
            # (pre-marker) table can be upgraded to the marker layout here
            with open(self._marker("__meta"), "w") as fh:
                fh.write('{"sink_layout": 2}')
        self._may_have_tombstones = False

    def compact_deltas(self) -> int:
        """MINOR MoR maintenance (round 9): fold the delta TAIL — every
        dir above the oldest surviving one — into a single delta at a
        fresh seq. O(tail) work bounded by the maintenance cadence,
        where compact() rewrites O(table); this is the form an in-tick
        policy may run (the Indexer's budget rule: a 3 s tick must never
        absorb a table-sized rewrite — the round-8 policy long-runs
        measured the full dup-table fold as the ON-arm p90/max spike).

        Mechanism needs no new crash protocol: the merged rows APPEND as
        a normal delta (atomic stage+rename), and only then are the
        folded tail dirs pruned. A crash between the two leaves
        duplicate rows that per-key resolution already settles (the
        merged delta holds the newest seq), and a later minor fold
        re-prunes. Refused for tables that may hold tombstones: the
        version-ERA resolution needs the within-tail seq history this
        fold collapses. Returns the number of delta dirs folded away."""
        if self.mode != "mor":
            return 0
        if self._may_have_tombstones is not False:
            raise ValueError(
                "compact_deltas() on a table that may hold tombstones — "
                "the era resolution needs per-delta seq history; run the "
                "full compact() instead"
            )
        seqs = self._delta_seqs()
        if len(seqs) <= 2:
            return 0
        tail = seqs[1:]
        raw = self._read_raw().filter(F.col("__seq") >= tail[0])
        # latest-per-key under the SAME ordering read() resolves with
        # (version first, then seq) — the merged delta must carry exactly
        # the tail's winning rows or a base row could beat the wrong one
        order = (
            [F.desc_nulls_last(self.version_col)] if self.version_col else []
        ) + [F.desc("__seq")]
        w = Window.partitionBy(*self.keys).orderBy(*order)
        merged = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__seq")
        )
        # auto_compact=False: this append is the MINOR fold itself — it
        # must never trip the compact_every threshold into a full
        # O(table) compact() mid-tick (the docstring's budget rule)
        self._append_delta(merged, auto_compact=False)
        for s in tail:
            shutil.rmtree(
                os.path.join(self.path, f"__seq={s}"), ignore_errors=True
            )
        return len(tail)

    def delete_where(self, condition) -> None:
        """Retention delete (T9, mocsettlement.py:416-429). MoR appends
        tombstones (the matched rows re-emitted with `__deleted=true`, so
        they carry the winning version and the newest seq); CoW rewrites."""
        existing = self.read()
        if existing is None:
            return
        victims = existing.filter(condition)
        if victims.isEmpty():
            # nothing matched: appending an empty tombstone delta would
            # permanently demote the table off the update-only fast path
            # (and a CoW rewrite would be an O(table) no-op) — skip both.
            # Retention ticks usually expire nothing, so this is the
            # common case under the 3 s cadence.
            return
        if self.mode == "mor":
            self._may_have_tombstones = True
            # marker BEFORE the delta: a crash between the two leaves a
            # false-positive marker (conservative), never a tombstone the
            # fast path doesn't know about
            with open(self._marker("__tombstones"), "w") as fh:
                fh.write("1")
            self._append_delta(victims.withColumn("__deleted", F.lit(True)))
            return
        # delete exactly the rows where the condition is TRUE — a NULL
        # evaluation keeps the row. `~condition` alone would drop NULLs
        # (NULL filter = dropped), silently deleting rows the condition
        # never matched and diverging from MoR, whose tombstones only
        # ever cover `filter(condition)` victims.
        self._atomic_write(
            existing.filter(~F.coalesce(condition, F.lit(False)))
        )

    def _atomic_write(self, df: DataFrame) -> None:
        swap_dir(
            self.path,
            lambda tmp: (
                df.repartition(self.n_buckets, *self.keys)
                .write.mode("overwrite")
                .parquet(tmp)
            ),
        )
