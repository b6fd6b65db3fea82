"""End-to-end corpus pipeline: funnel monotonicity, shard/manifest
consistency, and JSONL ingest with quarantine."""

import json

from pyspark.sql import functions as F

from moc_indexer_spark.llm_pipeline import N_SHARDS, run_pipeline
from moc_indexer_spark.tables import table


def test_pipeline_end_to_end_parquet(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    funnel = run_pipeline(spark, f"{sf_dir}/documents.parquet", out)

    # funnel only narrows
    assert (
        funnel["raw"]
        >= funnel["after_quality_gate"]
        >= funnel["after_exact_dedup"]
        >= funnel["after_decontamination"]
        == funnel["final_docs"]
        > 0
    )
    # the benchmark slice itself is gone
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.filter(F.col("source") == "src0").count() == 0

    # manifest agrees with the written corpus exactly
    manifest = {r.shard_id: r for r in
                spark.read.parquet(f"{out}/manifest").collect()}
    actual = {r.shard_id: r for r in corpus.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()}
    assert set(manifest) == set(actual) and len(manifest) <= N_SHARDS
    for sid, m in manifest.items():
        assert m.n_docs == actual[sid].n
        assert m.total_chars == actual[sid].chars
    # shard assignment keys on the PACK identity (lang, pack_id): a pack
    # is a training sequence whose member docs must land in ONE shard or
    # no dataloader can reassemble it (doc_id % N scattered each pack
    # across shards and multi-counted packs in the manifest)
    bad = corpus.filter(
        F.pmod(F.xxhash64(F.col("lang"), F.col("pack_id")),
               F.lit(N_SHARDS)) != F.col("shard_id")
    ).count()
    assert bad == 0
    # pack locality: every (lang, pack_id) lives in exactly one shard,
    # so summing manifest n_packs counts each pack once
    multi_shard = (
        corpus.groupBy("lang", "pack_id")
        .agg(F.countDistinct("shard_id").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert multi_shard == 0
    n_packs_total = sum(m.n_packs for m in manifest.values())
    assert n_packs_total == corpus.select("lang", "pack_id").distinct().count()
    # funnel.json persisted and matches
    assert json.load(open(f"{out}/funnel.json")) == funnel


def test_pipeline_sampling_caps_output(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    funnel = run_pipeline(
        spark, f"{sf_dir}/documents.parquet", out, sample_k=50
    )
    assert funnel["after_sampling"] == min(
        50, funnel["after_decontamination"]
    )
    assert funnel["final_docs"] == funnel["after_sampling"]


def test_pipeline_jsonl_ingest_with_quarantine(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in.jsonl")
    docs = table(spark, sf_dir, "documents").limit(120).collect()
    with open(src, "w") as fh:
        for r in docs:
            fh.write(json.dumps({
                "doc_id": r.doc_id, "text": r.text, "lang": r.lang,
                "source": r.source, "n_chars": r.n_chars,
            }) + "\n")
        fh.write("{broken json\n")
    out = str(tmp_path / "out")
    funnel = run_pipeline(spark, src, out, jsonl=True)
    assert funnel["raw"] == 120
    assert funnel["quarantined_lines"] == 1
    assert funnel["final_docs"] > 0


def test_pipeline_rerun_is_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    f1 = run_pipeline(spark, f"{sf_dir}/documents.parquet", out)
    m1 = sorted(map(tuple, spark.read.parquet(f"{out}/manifest").collect()))
    f2 = run_pipeline(spark, f"{sf_dir}/documents.parquet", out)
    m2 = sorted(map(tuple, spark.read.parquet(f"{out}/manifest").collect()))
    assert f1 == f2 and m1 == m2
