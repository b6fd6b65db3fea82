"""End-to-end training-corpus pipeline: the LLM-data analog of `app.py`'s
indexer loop — one process entry that chains the curation operators into
a shard-ready corpus with an auditable manifest.

No reference analog (BASELINE.json north star). Stages (each is an
already-certified operator; this module only sequences them):

  ingest (JSONL w/ quarantine | parquet) -> quality gate (corpus.py's
  stateless expressions) -> exact dedup (min-doc_id keeper) -> benchmark
  decontamination (broadcast 4-gram semi-join) -> DSIR importance
  weights -> A-ES weighted fixed-size sampling (optional cap) ->
  sequence packing -> sharded parquet write + manifest + stage-count
  funnel report.

Scale notes: every stage is shuffle-bounded as documented at its
operator (gate: map-only; dedup: one md5 shuffle; decontamination: zero
corpus shuffle; DSIR: one shuffle + broadcast; sample: salted two-phase
top-k; pack: one shuffle on the pack group). The final write is
`repartition(shard_id)` so file count == shard count regardless of
upstream parallelism.

Run: python -m moc_indexer_spark.llm_pipeline <in> <out_dir> [--jsonl]
          [--sample-k K]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as T
from .operators.ml import dsir_weights
from .operators.pipeline import pack_sequences
from .operators.sketches import weighted_sample_topk
from .streaming.corpus import quality_gate

N_SHARDS = 8
NGRAM_N = 4
PACK_BUDGET = 512


def _read(spark: SparkSession, path: str, jsonl: bool) -> tuple[DataFrame, DataFrame | None]:
    if jsonl:
        from .sources.files import read_jsonl

        return read_jsonl(spark, path)
    return spark.read.parquet(path), None


def _decontaminate(docs: DataFrame, bench_source: str) -> DataFrame:
    """Drop docs sharing any 4-gram with the benchmark slice — delegated
    to the shared operator (operators/dedup.decontaminate_against_source)
    so the bloom/stop-shingle scale fixes the registry legs document land
    in ONE place, not three."""
    from .operators.dedup import decontaminate_against_source

    return decontaminate_against_source(docs, bench_source, n=NGRAM_N)


def run_pipeline(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    jsonl: bool = False,
    bench_source: str = "src0",
    sample_k: int | None = None,
) -> dict:
    """Execute the full curation funnel; returns the funnel counts."""
    raw, quarantine = _read(spark, in_path, jsonl)
    funnel = {"raw": raw.count()}
    if quarantine is not None:
        funnel["quarantined_lines"] = quarantine.count()

    gated_keys = quality_gate(raw)  # doc_id, content_hash, quality_score...
    gated = raw.join(gated_keys.select("doc_id"), "doc_id")
    funnel["after_quality_gate"] = gated.count()

    # persist the narrow waists: each funnel count is an action, and the
    # final write replays the lineage once more — without these caches the
    # gate/dedup/decontamination/DSIR chain re-executes from the raw scan
    # for every stage (measured-quadratic total work in stage count). The
    # finally-block releases them even when a stage fails mid-funnel.
    caches: list[DataFrame] = []
    try:
        w = F.row_number().over(
            Window.partitionBy(F.md5("text")).orderBy("doc_id")
        )
        deduped = (
            gated.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")
        ).persist()
        caches.append(deduped)
        funnel["after_exact_dedup"] = deduped.count()

        if bench_source:
            clean = _decontaminate(deduped, bench_source).persist()
            caches.append(clean)
            funnel["after_decontamination"] = clean.count()
        else:
            # --bench-source '' : no held-out slice, nothing deleted
            clean = deduped

        weights = dsir_weights(clean)
        scored = clean.join(weights.select("doc_id", "logw"), "doc_id", "left")

        if sample_k is not None:
            # A-ES fixed-size sample weighted by exp-normalized DSIR weight
            # tiers (positive weights required; tier by logw sign)
            wcol = (
                F.when(F.col("logw") > 0, F.lit(1.0))
                .when(F.col("logw") > -1.0, F.lit(0.5))
                .otherwise(F.lit(0.25))
                .cast("double")
            )
            keep = weighted_sample_topk(
                scored.select("doc_id", "logw"), wcol, k=sample_k
            ).select("doc_id")
            scored = scored.join(keep, "doc_id")
            funnel["after_sampling"] = scored.count()
        scored = scored.persist()
        caches.append(scored)

        packed = pack_sequences(
            scored,
            group_col="lang",
            order_col="doc_id",
            token_col=F.size(T.tokens("text")),
            budget=PACK_BUDGET,
        )
        final = scored.join(
            packed.select("doc_id", "pack_id"), "doc_id"
        ).select(
            "doc_id",
            "text",
            "lang",
            "source",
            "logw",
            "pack_id",
            # shard on the PACK identity, not doc_id: a pack is a ~512-
            # token training sequence whose member docs must land in ONE
            # shard file or no dataloader can reassemble it (doc_id % N
            # scattered each pack across up to N shards and multi-counted
            # packs in the manifest)
            F.pmod(F.xxhash64(F.col("lang"), F.col("pack_id")),
                   F.lit(N_SHARDS)).cast("bigint")
            .alias("shard_id"),
        ).persist()  # count + write: one pack-window/join pass, not two
        caches.append(final)
        funnel["final_docs"] = final.count()

        (
            final.repartition(N_SHARDS, "shard_id")
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(f"{out_dir}/corpus")
        )
        manifest = (
            spark.read.parquet(f"{out_dir}/corpus")
            .groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(F.length("text")).cast("bigint").alias("total_chars"),
                F.min("doc_id").alias("min_doc_id"),
                F.max("doc_id").alias("max_doc_id"),
                # pack identity is (lang, pack_id): pack_sequences restarts
                # pack_id at 0 within each lang group; the struct key is
                # null-safe (COUNT DISTINCT a, b would drop null-lang rows)
                F.countDistinct(F.struct("lang", "pack_id"))
                .cast("bigint").alias("n_packs"),
            )
        )
        manifest.coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/manifest"
        )
        os.makedirs(out_dir, exist_ok=True)
        with open(f"{out_dir}/funnel.json", "w") as fh:
            json.dump(funnel, fh, indent=2, sort_keys=True)
    finally:
        for df in caches:
            df.unpersist()
    return funnel


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("in_path")
    ap.add_argument("out_dir")
    ap.add_argument("--jsonl", action="store_true")
    ap.add_argument("--sample-k", type=int, default=None)
    ap.add_argument(
        "--bench-source", default="src0",
        help="source name held out as the benchmark slice for 4-gram "
             "decontamination; pass an empty string to disable (no "
             "source is deleted from the corpus)",
    )
    args = ap.parse_args()
    from .session import get_spark

    spark = get_spark(app_name="llm-pipeline")
    funnel = run_pipeline(
        spark, args.in_path, args.out_dir, jsonl=args.jsonl,
        bench_source=args.bench_source,
        sample_k=args.sample_k,
    )
    print(json.dumps(funnel, sort_keys=True))


if __name__ == "__main__":
    main()
