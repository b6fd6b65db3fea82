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


def test_pipeline_near_and_semantic_tiers(spark, sf_dir, tmp_path):
    """JSONL e2e through BOTH optional dedup tiers: a constructed text
    near-twin must fall to the guarded n-gram keeper, a constructed
    embedding clone must fall to the SemDeDup keeper, and the funnel
    stays monotone with the new stages in the chain."""
    docs = table(spark, sf_dir, "documents").limit(120).collect()
    by_len = sorted(docs, key=lambda r: -len(r.text or ""))
    donor = by_len[0]

    src = str(tmp_path / "in.jsonl")
    with open(src, "w") as fh:
        for r in docs:
            fh.write(json.dumps({
                "doc_id": r.doc_id, "text": r.text, "lang": r.lang,
                "source": r.source, "n_chars": r.n_chars,
            }) + "\n")
        # near-twin: same text with ONE middle token changed -> high
        # 3-gram jaccard vs the donor, not an exact-hash duplicate
        words = donor.text.split(" ")
        words[len(words) // 2] = "zzzneartwin"
        fh.write(json.dumps({
            "doc_id": 99990, "text": " ".join(words), "lang": donor.lang,
            "source": donor.source, "n_chars": len(" ".join(words)),
        }) + "\n")
        # semantic twin: textually unrelated (survives both text tiers
        # AND the quality gate: all-distinct tokens, tc > 100 -> score
        # 0.4 + 0.3 >= the 0.36 floor), embedding cloned below ->
        # cosine 1.0 in the SemDeDup stage
        sem_text = " ".join(f"semclone{i}" for i in range(110))
        fh.write(json.dumps({
            "doc_id": 99991, "text": sem_text, "lang": donor.lang,
            "source": donor.source, "n_chars": len(sem_text),
        }) + "\n")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_rows = {r.vec_id: list(r.embedding) for r in emb.limit(200).collect()}
    side = [(r.doc_id, emb_rows[r.doc_id])
            for r in docs if r.doc_id in emb_rows]
    assert side, "sidecar must cover the corpus"
    side.append((99991, side[0][1]))  # the clone
    spark.createDataFrame(
        side, "doc_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "emb"))

    out = str(tmp_path / "out")
    funnel = run_pipeline(
        spark, src, out, jsonl=True,
        near_dedup=True, semantic_dedup=str(tmp_path / "emb"),
    )
    # extended funnel monotonicity with both tiers in the chain
    assert (
        funnel["raw"]
        >= funnel["after_quality_gate"]
        >= funnel["after_exact_dedup"]
        >= funnel["after_near_dedup"]
        >= funnel["after_semantic_dedup"]
        >= funnel["after_decontamination"]
        == funnel["final_docs"]
        > 0
    )
    # each constructed duplicate fell to its own tier
    assert funnel["after_near_dedup"] < funnel["after_exact_dedup"]
    assert funnel["after_semantic_dedup"] < funnel["after_near_dedup"]
    corpus = spark.read.parquet(f"{out}/corpus")
    survivors = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert 99990 not in survivors  # near-twin dropped (donor is older)
    assert 99991 not in survivors  # embedding clone dropped
    # stage parameters are recorded in the persisted funnel
    persisted = json.load(open(f"{out}/funnel.json"))
    assert persisted == funnel
    assert persisted["near_dedup_params"]["threshold"] == 0.8
    assert persisted["semantic_dedup_params"]["threshold"] == 0.35


def test_streaming_cli_matches_batch_cli(spark, sf_dir, tmp_path, monkeypatch):
    """`moc-llm-pipeline --stream` (round 10): the daemon-operable form
    of the funnel. Drains the source through the incremental maintainers
    and must land the batch CLI's exact artifact in out_dir — the same
    equivalence the API-level funnel tests pin, here through the CLI
    entry point (argv parsing, default state/checkpoint dirs, publish
    cadence)."""
    import os
    import shutil
    import sys

    from pyspark.sql import functions as F

    from moc_indexer_spark.llm_pipeline import main

    docs = table(spark, sf_dir, "documents")
    src = f"{tmp_path}/src"
    os.makedirs(src)
    for i in range(2):
        part = docs.filter(F.col("doc_id") % 2 == i)
        stage = f"{tmp_path}/stage_{i}"
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        for f_ in os.listdir(stage):
            if f_.endswith(".parquet"):
                shutil.copy(f"{stage}/{f_}", f"{src}/slice_{i}.parquet")

    out_s = f"{tmp_path}/out_stream"
    monkeypatch.setattr(sys, "argv", [
        "moc-llm-pipeline", src, out_s, "--stream", "--publish-every", "1",
    ])
    main()

    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src, out_b, near_dedup=True, near_method="minhash",
    )
    assert json.load(open(f"{out_s}/funnel.json")) == batch
    stream_ids = sorted(
        r.doc_id for r in
        spark.read.parquet(f"{out_s}/corpus").select("doc_id").collect()
    )
    batch_ids = sorted(
        r.doc_id for r in
        spark.read.parquet(f"{out_b}/corpus").select("doc_id").collect()
    )
    assert stream_ids == batch_ids
    # the CLI defaulted state/checkpoint under out_dir
    assert os.path.isdir(f"{out_s}/_state") and os.path.isdir(
        f"{out_s}/_checkpoint"
    )
