"""Incrementally-maintained SemDeDup under Structured Streaming — the
embedding-tier sibling of the exact/MinHash/line dedup maintainers
(streaming/corpus.py), closing the one dedup tier that had no streaming
form (round-6 verdict, missing #3).

Semantics: the stream converges to `semantic_dedup_with_centroids`
(operators/similarity.py) — the batch scaled-SemDeDup keeper rule under
THIS index's persisted quantizer: one row per vector, dup_of =
smallest-id same-cell vector with a strictly smaller id whose
6dp-rounded cosine clears the threshold, NULL for keepers.

Design (the corpus.py MERGE shape, not the ivf_stream partition-per-batch
shape, because dup_of rows are RETROACTIVELY INVALIDATED):

* The quantizer trains ONCE on a bootstrap sample with the cell count
  scaled to the EXPECTED corpus (n_cells = min(4096, max(16,
  n // target_cell_rows)) — the same formula as the batch operator);
  centroids + threshold persist beside the state, retraining is refused
  (stored cells depend on the centroids; re-clustering is an offline
  rebuild, exactly the IVF-stream contract).
* Each micro-batch: one Arrow assign pass (the batch operator's own
  `semantic_dedup_assign`), then the keeper rule is RECOMPUTED over the
  full content of just the cells the batch touches (stored ∪ new), and
  the result MERGEs into the dup table keyed by vec_id. Recomputing the
  whole touched cell is what makes late arrivals correct: a
  smaller-id vector arriving AFTER a larger-id one must flip the
  larger one's dup_of to itself (or to an even-smaller match) — a
  pure append could never retract the stale row. Cost is bounded by
  cell occupancy (~target_cell_rows), not corpus size.
* State is two keyed MERGE tables (the sink's idempotent upsert): the
  cell-assigned vectors and the dup assignments. Replays and slice
  reorderings converge to the batch answer — same rows re-MERGE to the
  same keys (tested: parity under 1-file and 3-file slicings, replay
  idempotence, and late-small-id retro-invalidation).

100 TB shape: the assign pass is map-only with a broadcast centroid
matrix (KBs); the touched-cell read is partition-pruned when the vector
state is stored partitioned by cell (ivf_stream's layout — here the
MERGE table keeps it simple and the read filters on the cell column);
per-cell keeper work is one bounded BLAS self-matmul. A batch touching
B cells costs O(B * target_cell_rows^2) flops independent of index size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import (
    _collect_train_sample,
    _train_spherical_kmeans,
    semantic_dedup_assign,
    semantic_dedup_keep,
    semantic_dedup_with_centroids,
)
from .sink import ParquetUpsertTable
from .triggers import apply_max_files_per_trigger


class IncrementalSemDeDup:
    """Parquet-backed scaled-SemDeDup state maintained one micro-batch at
    a time."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/") or path
        os.makedirs(self.path, exist_ok=True)
        # MoR state: both tables GROW WITH THE CORPUS, so a CoW MERGE
        # would rewrite O(index) bytes per micro-batch — the exact wall
        # the sink's merge-on-read mode exists to avoid. Appends are
        # O(batch); the sink's own compact_every policy bounds the
        # resolve window (the Indexer lesson, mor_cycle_policy_longrun).
        # Retro-invalidation rides the seq ordering: a recomputed dup row
        # re-MERGEs its key and the latest write wins.
        self.vectors = ParquetUpsertTable(
            spark, f"{self.path}/vectors", keys=["vec_id"], mode="mor"
        )
        self.dups = ParquetUpsertTable(
            spark, f"{self.path}/dups", keys=["vec_id"], mode="mor"
        )

    # -- quantizer ----------------------------------------------------------

    def _model_path(self) -> str:
        return f"{self.path}/_model.json"

    def is_trained(self) -> bool:
        return os.path.exists(self._model_path())

    def train(
        self,
        bootstrap: DataFrame,
        threshold: float = 0.35,
        target_cell_rows: int = 256,
        expected_corpus_rows: int | None = None,
        train_sample: int | None = None,
        lloyd_iters: int = 3,
        round_digits: int = 6,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Fit the corpus-scaled spherical quantizer on a bootstrap
        corpus. `expected_corpus_rows` sizes the cell count for the
        corpus the index will GROW INTO (defaults to the bootstrap size —
        the batch operator's own formula); pass the catalog estimate in
        production so occupancy holds as the stream fills the index."""
        if self.is_trained():
            raise ValueError(
                "index already trained — rebuild the index directory to "
                "re-cluster (stored cell assignments depend on the "
                "centroids)"
            )
        n = expected_corpus_rows
        if n is None:
            n = bootstrap.count()
        n_cells = min(4096, max(16, n // target_cell_rows))
        if train_sample is None:
            train_sample = min(32768, max(2048, 8 * n_cells))
        Xn = _collect_train_sample(bootstrap, id_col, vec_col, train_sample)
        if Xn is None:
            raise ValueError("cannot train a quantizer on an empty bootstrap")
        C = _train_spherical_kmeans(Xn, n_cells, lloyd_iters)
        with open(self._model_path(), "w") as fh:
            json.dump(
                {
                    "centroids": C.tolist(),
                    "threshold": threshold,
                    "round_digits": round_digits,
                },
                fh,
            )

    def _load_model(self):
        import numpy as np

        with open(self._model_path()) as fh:
            m = json.load(fh)
        return (
            np.array(m["centroids"], dtype=np.float64),
            m["threshold"],
            m["round_digits"],
        )

    # -- maintenance ----------------------------------------------------------

    def update(self, batch_vectors: DataFrame) -> None:
        """Fold one micro-batch in (foreachBatch body). Keyed MERGEs make
        this idempotent under replay and order-free across slices; the
        keeper rule is recomputed over the full touched cells so late
        smaller ids retro-invalidate stale dup rows."""
        if not self.is_trained():
            raise ValueError("train() the quantizer before streaming updates")
        C, threshold, round_digits = self._load_model()

        new = semantic_dedup_assign(batch_vectors, C)
        # in-batch duplicate ids: keep one row deterministically by
        # CONTENT (a replayed slice must rebuild the identical state)
        w = Window.partitionBy("vec_id").orderBy("__h")
        new = (
            new.withColumn("__h", F.md5(F.col("v").cast("string")))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__h")
        )
        new.persist()
        new_ids = new
        try:
            stored = self.vectors.read()
            if stored is not None:
                # first-seen vector wins for a re-sent id: the id is
                # dropped HERE, before both the keeper recompute and the
                # state MERGE, so the dup rows and the stored vector can
                # never disagree about which payload the id carries
                # (a true re-assignment of an id is an upstream
                # correction -> rebuild, like retraining)
                new_ids = new.join(
                    stored.select("vec_id"), "vec_id", "left_anti"
                ).persist()
            touched = [
                r[0] for r in new_ids.select("cell").distinct().collect()
            ]
            if not touched:
                return
            if stored is not None:
                cell_rows = stored.filter(F.col("cell").isin(touched))
                allv = cell_rows.unionByName(new_ids)
            else:
                allv = new_ids
            fresh = semantic_dedup_keep(
                allv, threshold, round_digits=round_digits
            )
            self.dups.upsert(fresh)
            self.vectors.upsert(new_ids, insert=True)
        finally:
            if new_ids is not new:
                new_ids.unpersist()
            new.unpersist()

    # -- reads ----------------------------------------------------------------

    def duplicates(self) -> DataFrame | None:
        """Current (vec_id, cell, dup_of) state — the batch operator's
        output contract."""
        d = self.dups.read()
        return None if d is None else d.select("vec_id", "cell", "dup_of")

    def batch_reference(self, corpus: DataFrame) -> DataFrame:
        """What the BATCH operator answers for `corpus` under this
        index's persisted quantizer — the convergence target the parity
        tests compare against."""
        C, threshold, round_digits = self._load_model()
        return semantic_dedup_with_centroids(
            corpus, C, threshold, round_digits=round_digits
        )


def run_semdedup_stream_available_now(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int | None = 1,
) -> IncrementalSemDeDup:
    """Drain all available embedding files into the SemDeDup index
    (deterministic replay mode; production uses a processing-time
    trigger). One slice file per micro-batch by default — availableNow
    otherwise folds every pending file into a single batch and the
    incremental fold never exercises more than one update."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    reader = apply_max_files_per_trigger(reader, max_files_per_trigger)
    stream = reader.parquet(source_dir)
    idx = IncrementalSemDeDup(spark, index_dir)
    if not idx.is_trained():
        raise ValueError("train() the quantizer before streaming updates")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx.update(batch_df)

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return idx
