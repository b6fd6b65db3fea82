"""End-to-end training-corpus pipeline: the LLM-data analog of `app.py`'s
indexer loop — one process entry that chains the curation operators into
a shard-ready corpus with an auditable manifest.

No reference analog (BASELINE.json north star). Stages (each is an
already-certified operator; this module only sequences them):

  ingest (JSONL w/ quarantine | parquet) -> quality gate (corpus.py's
  stateless expressions) -> exact dedup (min-doc_id keeper) ->
  [--near-dedup: guarded n-gram-Jaccard near-dup keeper] ->
  [--semantic-dedup EMB: scaled-SemDeDup keeper over an embedding
  sidecar] -> benchmark decontamination (broadcast 4-gram semi-join) ->
  DSIR importance weights -> A-ES weighted fixed-size sampling
  (optional cap) -> sequence packing -> sharded parquet write +
  manifest + stage-count funnel report.

The two optional dedup tiers are the certified production forms wired
in, not new logic: near-dedup is `ngram_dup_pairs_guarded`'s exact
composition (boilerplate_shingles heavy-hitter guard ->
ngram_jaccard_pairs -> dedup_clusters connected components) with the
same min-id keeper policy as the exact tier; semantic dedup is
`semantic_dedup_scaled` (corpus-scaled spherical cells, O(n) output)
over an embedding sidecar parquet — (doc_id|vec_id, embedding) — with
docs that have no embedding row passing through unjudged (an embedding
store covers the corpus it embeds; the funnel can only narrow).

Scale notes: every stage is shuffle-bounded as documented at its
operator (gate: map-only; dedup: one md5 shuffle; near-dedup: the
guarded inverted-index join + O(diameter) label rounds on the tiny
pair graph; semantic: one Arrow assign + ONE cell shuffle;
decontamination: zero corpus shuffle; DSIR: one shuffle + broadcast;
sample: salted two-phase top-k; pack: one shuffle on the pack group).
The final write is `repartition(shard_id)` so file count == shard
count regardless of upstream parallelism.

Run: python -m moc_indexer_spark.llm_pipeline <in> <out_dir> [--jsonl]
          [--sample-k K] [--near-dedup] [--semantic-dedup EMB_PARQUET]
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
# near-dup tier: same shape as the registry's ngram_dup_pairs_guarded
NEAR_NGRAM_N = 3
NEAR_STOP_MIN_DF = 3


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
    near_dedup: bool = False,
    near_threshold: float = 0.8,
    near_method: str = "ngram",
    semantic_dedup: str | None = None,
    semantic_threshold: float = 0.35,
    semantic_centroids: str | None = None,
) -> dict:
    """Execute the full curation funnel; returns the funnel counts.

    `near_dedup` inserts a near-dup keeper after exact dedup —
    `near_method="ngram"` (default) is the guarded n-gram-Jaccard form,
    `"minhash"` the MinHash-LSH form (the streaming maintainer's pair
    semantics: streaming/corpus.py NEAR_* parameters, exact-verified).
    `semantic_dedup` (a path to an embedding sidecar parquet with
    (doc_id|vec_id, embedding)) inserts the scaled-SemDeDup keeper after
    that; `semantic_centroids` (a path to a persisted quantizer JSON —
    the IncrementalSemDeDup `_model.json` format) reuses that quantizer
    and ITS threshold/rounding instead of training a fresh one, the
    production shape when a streaming index already holds the corpus
    (the stored cell assignments depend on the centroids, so the batch
    funnel must judge under the same model to agree with it). All tiers
    record their count and parameters in the funnel."""
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

        if near_dedup:
            from .operators.dedup import dedup_clusters

            if near_method == "minhash":
                from .operators.dedup import minhash_lsh_pairs
                from .streaming.corpus import NEAR_BANDS, NEAR_K, NEAR_N

                pairs = minhash_lsh_pairs(
                    deduped, n=NEAR_N, k=NEAR_K, bands=NEAR_BANDS,
                    threshold=near_threshold,
                )
                near_params = {
                    "method": "minhash", "n": NEAR_N, "k": NEAR_K,
                    "bands": NEAR_BANDS, "threshold": near_threshold,
                }
            elif near_method == "ngram":
                from .operators.dedup import (
                    boilerplate_shingles,
                    ngram_jaccard_pairs,
                )

                stop = boilerplate_shingles(
                    deduped, n=NEAR_NGRAM_N, min_df=NEAR_STOP_MIN_DF
                )
                pairs = ngram_jaccard_pairs(
                    deduped, n=NEAR_NGRAM_N, threshold=near_threshold,
                    stop_shingles=stop,
                )
                near_params = {
                    "method": "ngram", "n": NEAR_NGRAM_N,
                    "threshold": near_threshold,
                    "stop_min_df": NEAR_STOP_MIN_DF,
                }
            else:
                raise ValueError(f"unknown near_method: {near_method!r}")
            # min-id keeper over the connected components — the same
            # policy as the exact tier, so the two compose monotonically
            clusters = dedup_clusters(pairs)
            # localCheckpoint truncates the iterative label-propagation
            # lineage to a leaf: every later funnel stage re-references
            # this frame (some twice — `final` joins `scored` with its
            # own derivation), and Spark's plan-tree rendering expands
            # shared subtrees multiplicatively — with the O(rounds)-deep
            # cluster join tree inside, a plain persist() OOMed the
            # driver in generateTreeString before any data moved. The
            # drop list is dup-ids-sized, so the eager materialization
            # is cheap; a multi-hour production run would use a reliable
            # checkpoint dir instead (same lineage-cut, HDFS-backed).
            drops = clusters.filter(
                F.col("doc_id") != F.col("cluster_id")
            ).select("doc_id").localCheckpoint()
            deduped = deduped.join(drops, "doc_id", "left_anti").persist()
            caches.append(deduped)
            funnel["after_near_dedup"] = deduped.count()
            funnel["near_dedup_params"] = near_params

        if semantic_dedup:
            emb = spark.read.parquet(semantic_dedup)
            if "doc_id" not in emb.columns and "vec_id" in emb.columns:
                emb = emb.withColumnRenamed("vec_id", "doc_id")
            emb = emb.select("doc_id", "embedding")
            have = deduped.select("doc_id").join(emb, "doc_id")
            if semantic_centroids is not None:
                import numpy as np

                from .operators.similarity import semantic_dedup_with_centroids

                with open(semantic_centroids) as fh:
                    m = json.load(fh)
                verdicts = semantic_dedup_with_centroids(
                    have,
                    np.array(m["centroids"], dtype=np.float64),
                    m["threshold"],
                    id_col="doc_id",
                    round_digits=m["round_digits"],
                )
                sem_params = {
                    "threshold": m["threshold"],
                    "embeddings": semantic_dedup,
                    "centroids": semantic_centroids,
                }
            else:
                from .operators.similarity import semantic_dedup_scaled

                verdicts = semantic_dedup_scaled(
                    have, threshold=semantic_threshold, id_col="doc_id"
                )
                sem_params = {
                    "threshold": semantic_threshold,
                    "embeddings": semantic_dedup,
                }
            drops = verdicts.filter(
                F.col("dup_of").isNotNull()
            ).select("doc_id")
            deduped = deduped.join(drops, "doc_id", "left_anti").persist()
            caches.append(deduped)
            funnel["after_semantic_dedup"] = deduped.count()
            funnel["semantic_dedup_params"] = sem_params

        _finish_funnel(
            spark, deduped, funnel, out_dir, bench_source, sample_k, caches
        )
    finally:
        for df in caches:
            df.unpersist()
    return funnel


def _finish_funnel(
    spark: SparkSession,
    deduped: DataFrame,
    funnel: dict,
    out_dir: str,
    bench_source: str,
    sample_k: int | None,
    caches: list[DataFrame],
) -> dict:
    """The funnel's tail — decontamination -> DSIR -> (sample) -> pack ->
    sharded write + manifest + funnel.json — shared VERBATIM between the
    batch CLI (run_pipeline) and the streaming funnel's publish step
    (streaming/funnel.py), so the two cannot drift: the streaming form's
    convergence test compares whole manifests, and any tail divergence
    would be a silent fork of the product artifact. `deduped` is the
    post-dedup-tier survivor frame (doc_id, text, lang, source, ...);
    persisted frames are appended to `caches` for the CALLER's finally
    block to release."""
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
    if funnel["final_docs"] == 0:
        # a 0-row corpus write leaves only _SUCCESS — re-reading it for
        # the manifest fails schema inference and would kill the caller
        # (reachable when every doc was gate-rejected or the bench
        # source held the whole corpus); publish an explicitly-empty
        # manifest with the standard schema instead
        manifest = spark.createDataFrame(
            [],
            "shard_id bigint, n_docs bigint, total_chars bigint, "
            "min_doc_id bigint, max_doc_id bigint, n_packs bigint",
        )
        manifest.coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/manifest"
        )
        os.makedirs(out_dir, exist_ok=True)
        with open(f"{out_dir}/funnel.json", "w") as fh:
            json.dump(funnel, fh, indent=2, sort_keys=True)
        return funnel
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
    return funnel


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("in_path")
    ap.add_argument("out_dir")
    ap.add_argument("--jsonl", action="store_true")
    ap.add_argument("--sample-k", type=int, default=None)
    ap.add_argument(
        "--near-dedup", action="store_true",
        help="insert the guarded n-gram-Jaccard near-dup keeper "
             "(ngram_dup_pairs_guarded + connected components, min-id "
             "keeper) after exact dedup",
    )
    ap.add_argument("--near-threshold", type=float, default=0.8)
    ap.add_argument(
        "--near-method", default="ngram", choices=("ngram", "minhash"),
        help="near-dup pair semantics: guarded n-gram Jaccard (default) "
             "or MinHash-LSH (the streaming maintainer's form)",
    )
    ap.add_argument(
        "--semantic-dedup", default=None, metavar="EMB_PARQUET",
        help="insert the scaled-SemDeDup keeper (semantic_dedup_scaled) "
             "over this embedding sidecar parquet ((doc_id|vec_id, "
             "embedding)); docs without an embedding row pass through",
    )
    ap.add_argument("--semantic-threshold", type=float, default=0.35)
    ap.add_argument(
        "--semantic-centroids", default=None, metavar="MODEL_JSON",
        help="reuse a persisted quantizer (IncrementalSemDeDup "
             "_model.json) and its threshold instead of training fresh",
    )
    ap.add_argument(
        "--bench-source", default="src0",
        help="source name held out as the benchmark slice for 4-gram "
             "decontamination; pass an empty string to disable (no "
             "source is deleted from the corpus)",
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="run the STREAMING curation funnel instead of the one-shot "
             "batch: drain in_path's files through the incremental "
             "maintainers (streaming/funnel.py) and publish the batch-"
             "identical artifact to out_dir — the daemon-operable form; "
             "dedup tiers are always on (the maintainers' contract), so "
             "--near-dedup/--near-method/--near-threshold are ignored; "
             "--semantic-centroids is honored (seeds the maintainer's "
             "quantizer) and --semantic-threshold applies only when "
             "training fresh (a seeded model carries its own)",
    )
    ap.add_argument(
        "--state-dir", default=None,
        help="(--stream) maintainer state root; default <out_dir>/_state",
    )
    ap.add_argument(
        "--checkpoint-dir", default=None,
        help="(--stream) Structured Streaming checkpoint; default "
             "<out_dir>/_checkpoint",
    )
    ap.add_argument(
        "--publish-every", type=int, default=None,
        help="(--stream) also publish every N micro-batches (a final "
             "publish always runs at drain)",
    )
    ap.add_argument(
        "--embeddings-in-stream", action="store_true",
        help="(--stream) arriving docs carry their own `embedding` "
             "column; enables the semantic tier without a sidecar",
    )
    ap.add_argument(
        "--missing-embedding", default="fail", choices=("fail", "skip"),
        help="(--stream --embeddings-in-stream) contract for a gated "
             "doc arriving with a null embedding",
    )
    args = ap.parse_args()
    from .session import get_spark

    spark = get_spark(app_name="llm-pipeline")
    if args.stream:
        from .streaming.funnel import run_curation_funnel_available_now

        _, funnel = run_curation_funnel_available_now(
            spark,
            args.in_path,
            args.state_dir or f"{args.out_dir}/_state",
            args.checkpoint_dir or f"{args.out_dir}/_checkpoint",
            out_dir=args.out_dir,
            embeddings_path=args.semantic_dedup,
            bench_source=args.bench_source,
            sample_k=args.sample_k,
            semantic_threshold=args.semantic_threshold,
            publish_every=args.publish_every,
            jsonl=args.jsonl,
            embeddings_in_stream=args.embeddings_in_stream,
            missing_embedding=args.missing_embedding,
            semantic_centroids=args.semantic_centroids,
        )
        print(json.dumps(funnel, sort_keys=True))
        return
    funnel = run_pipeline(
        spark, args.in_path, args.out_dir, jsonl=args.jsonl,
        bench_source=args.bench_source,
        sample_k=args.sample_k,
        near_dedup=args.near_dedup,
        near_threshold=args.near_threshold,
        near_method=args.near_method,
        semantic_dedup=args.semantic_dedup,
        semantic_threshold=args.semantic_threshold,
        semantic_centroids=args.semantic_centroids,
    )
    print(json.dumps(funnel, sort_keys=True))


if __name__ == "__main__":
    main()
