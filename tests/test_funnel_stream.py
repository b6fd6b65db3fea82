"""Streaming curation funnel (streaming/funnel.py): the composed
maintainers must publish EXACTLY the batch CLI's artifact — funnel.json,
manifest, corpus id set — on a sliced fixture, with fresh-checkpoint
replays idempotent and mid-stream publishes equal to the batch funnel
over the prefix ingested so far."""

import json
import os
import shutil

from pyspark.sql import functions as F

from moc_indexer_spark.llm_pipeline import run_pipeline
from moc_indexer_spark.streaming.funnel import (
    run_curation_funnel_available_now,
)
from moc_indexer_spark.tables import table


def _slice_to_files(spark, docs, src, n_slices, tmp_path):
    os.makedirs(src, exist_ok=True)
    for i in range(n_slices):
        part = docs.filter(F.col("doc_id") % n_slices == i)
        stage = f"{tmp_path}/stage_{i}"
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        for f_ in os.listdir(stage):
            if f_.endswith(".parquet"):
                shutil.copy(f"{stage}/{f_}", f"{src}/slice_{i}.parquet")


def _manifest_rows(spark, out):
    return sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/manifest").collect()
    )


def _corpus_ids(spark, out):
    return sorted(
        r.doc_id
        for r in spark.read.parquet(f"{out}/corpus").select("doc_id").collect()
    )


def test_streaming_funnel_publishes_the_batch_artifact(
    spark, sf_dir, tmp_path
):
    docs = table(spark, sf_dir, "documents")
    src = f"{tmp_path}/src"
    _slice_to_files(spark, docs, src, 3, tmp_path)
    emb_path = f"{sf_dir}/embeddings.parquet"

    state = f"{tmp_path}/state"
    out_s = f"{tmp_path}/out_stream"
    funnel_obj, published = run_curation_funnel_available_now(
        spark, src, state, f"{tmp_path}/ck", out_dir=out_s,
        embeddings_path=emb_path, schema=docs.schema,
    )
    assert published is not None

    # batch oracle: the one-shot CLI over the SAME files, the stream's
    # pair semantics (minhash) and ITS persisted quantizer — the
    # production contract when an incremental index already holds the
    # corpus (stored cells depend on the centroids)
    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src, out_b,
        near_dedup=True, near_method="minhash",
        semantic_dedup=emb_path,
        semantic_centroids=f"{state}/sem/_model.json",
    )

    assert published == batch
    assert _manifest_rows(spark, out_s) == _manifest_rows(spark, out_b)
    assert _corpus_ids(spark, out_s) == _corpus_ids(spark, out_b)
    # the funnel narrowed at every tier (the fixture has exact, near
    # AND semantic duplicates)
    assert (
        published["raw"]
        >= published["after_quality_gate"]
        >= published["after_exact_dedup"]
        > published["after_near_dedup"]
        >= published["after_semantic_dedup"]
        >= published["after_decontamination"]
        == published["final_docs"]
        > 0
    )
    # persisted funnel.json matches the returned dict
    assert json.load(open(f"{out_s}/funnel.json")) == batch

    # fresh-checkpoint replay over the SAME state: every maintainer
    # re-MERGEs idempotently; the re-published artifact is unchanged
    _, republished = run_curation_funnel_available_now(
        spark, src, state, f"{tmp_path}/ck2", out_dir=out_s,
        embeddings_path=emb_path, schema=docs.schema,
    )
    assert republished == batch
    assert _manifest_rows(spark, out_s) == _manifest_rows(spark, out_b)


def test_streaming_funnel_mid_stream_publish_matches_prefix_batch(
    spark, sf_dir, tmp_path
):
    """Incremental emission: a publish after the FIRST slice must equal
    the batch CLI over that prefix alone — the funnel is correct at
    every cut, not only at drain."""
    docs = table(spark, sf_dir, "documents")
    prefix = docs.filter(F.col("doc_id") % 2 == 0)
    src1 = f"{tmp_path}/src1"
    _slice_to_files(spark, prefix, src1, 1, tmp_path)
    emb_path = f"{sf_dir}/embeddings.parquet"

    state = f"{tmp_path}/state"
    out_s = f"{tmp_path}/out_stream"
    # compact_every=1: every tick runs a minor fold / delta merge in
    # some maintainer — the published artifact must be identical to the
    # never-folded batch answer (folding is physical, never semantic)
    _, published = run_curation_funnel_available_now(
        spark, src1, state, f"{tmp_path}/ck", out_dir=out_s,
        embeddings_path=emb_path, schema=docs.schema, compact_every=1,
    )

    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src1, out_b,
        near_dedup=True, near_method="minhash",
        semantic_dedup=emb_path,
        semantic_centroids=f"{state}/sem/_model.json",
    )
    assert published == batch
    assert _manifest_rows(spark, out_s) == _manifest_rows(spark, out_b)


def test_streaming_funnel_sampling_path_matches_batch(
    spark, sf_dir, tmp_path
):
    """The A-ES weighted sampling stage flows through publish identically
    to the batch CLI (deterministic hash-threshold sampling => exact
    artifact equality holds with sample_k set too)."""
    docs = table(spark, sf_dir, "documents")
    src = f"{tmp_path}/src"
    _slice_to_files(spark, docs, src, 2, tmp_path)

    out_s = f"{tmp_path}/out_stream"
    _, published = run_curation_funnel_available_now(
        spark, src, f"{tmp_path}/state", f"{tmp_path}/ck", out_dir=out_s,
        sample_k=40, schema=docs.schema,
    )
    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src, out_b, sample_k=40,
        near_dedup=True, near_method="minhash",
    )
    assert published == batch
    assert published["after_sampling"] == 40 == published["final_docs"]
    assert _manifest_rows(spark, out_s) == _manifest_rows(spark, out_b)
    assert _corpus_ids(spark, out_s) == _corpus_ids(spark, out_b)


def test_streaming_funnel_jsonl_ingest_matches_batch(spark, sf_dir, tmp_path):
    """JSONL arrival mode: text micro-batches parse with the batch CLI's
    exact expression block, unparsable lines land in a replay-idempotent
    quarantine, and the published artifact equals run_pipeline(jsonl=True)
    over the same files — including the quarantined_lines count."""
    docs = table(spark, sf_dir, "documents").limit(240).collect()
    src = f"{tmp_path}/src"
    os.makedirs(src)
    half = len(docs) // 2
    for name, part, broken in (("a", docs[:half], 1), ("b", docs[half:], 2)):
        with open(f"{src}/{name}.jsonl", "w") as fh:
            for r in part:
                fh.write(json.dumps({
                    "doc_id": r.doc_id, "text": r.text, "lang": r.lang,
                    "source": r.source, "n_chars": r.n_chars,
                }) + "\n")
            for k in range(broken):
                fh.write("{broken json %d\n" % k)

    out_s = f"{tmp_path}/out_stream"
    state = f"{tmp_path}/state"
    _, published = run_curation_funnel_available_now(
        spark, src, state, f"{tmp_path}/ck", out_dir=out_s, jsonl=True,
    )
    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src, out_b, jsonl=True,
        near_dedup=True, near_method="minhash",
    )
    assert published["quarantined_lines"] == 3
    assert published == batch
    assert _manifest_rows(spark, out_s) == _manifest_rows(spark, out_b)

    # fresh-checkpoint replay: quarantine dirs overwrite idempotently
    _, republished = run_curation_funnel_available_now(
        spark, src, state, f"{tmp_path}/ck2", out_dir=out_s, jsonl=True,
    )
    assert republished == batch


def test_streaming_funnel_quarantine_only_prefix_does_not_kill_stream(
    spark, sf_dir, tmp_path
):
    """Resilience (review finding): a first arrival whose lines are ALL
    malformed must not fail a publish_every stream — the publish reports
    counts only, and later valid arrivals publish the real artifact,
    equal to the batch CLI over the same files."""
    docs = table(spark, sf_dir, "documents").limit(120).collect()
    src = f"{tmp_path}/src"
    os.makedirs(src)
    with open(f"{src}/a_bad.jsonl", "w") as fh:
        fh.write("{broken 1\n{broken 2\n")
    with open(f"{src}/b_good.jsonl", "w") as fh:
        for r in docs:
            fh.write(json.dumps({
                "doc_id": r.doc_id, "text": r.text, "lang": r.lang,
                "source": r.source, "n_chars": r.n_chars,
            }) + "\n")

    out_s = f"{tmp_path}/out_stream"
    _, published = run_curation_funnel_available_now(
        spark, src, f"{tmp_path}/state", f"{tmp_path}/ck",
        out_dir=out_s, jsonl=True, publish_every=1,
    )
    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src, out_b, jsonl=True,
        near_dedup=True, near_method="minhash",
    )
    assert published["quarantined_lines"] == 2
    assert published == batch
    assert _manifest_rows(spark, out_s) == _manifest_rows(spark, out_b)


def _docs_with_embeddings(spark, sf_dir, null_ids=()):
    """Documents enriched with their embedding as an arrival column —
    the production shape (embeddings_in_stream); `null_ids` get a NULL
    embedding to exercise the missing-embedding contract."""
    docs = table(spark, sf_dir, "documents")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    enriched = docs.join(emb, "doc_id", "left")
    if null_ids:
        enriched = enriched.withColumn(
            "embedding",
            F.when(F.col("doc_id").isin(*null_ids), F.lit(None))
            .otherwise(F.col("embedding")),
        )
    return enriched


def test_streaming_funnel_in_stream_embeddings_match_batch(
    spark, sf_dir, tmp_path
):
    """Round-10: embeddings arrive IN the stream (no sidecar). The
    published artifact must equal the batch CLI with the sidecar over
    the same docs and the stream's persisted quantizer — the semantic
    tier's judgments cannot depend on how embeddings were delivered."""
    enriched = _docs_with_embeddings(spark, sf_dir)
    src = f"{tmp_path}/src"
    _slice_to_files(spark, enriched, src, 3, tmp_path)
    emb_path = f"{sf_dir}/embeddings.parquet"

    state = f"{tmp_path}/state"
    out_s = f"{tmp_path}/out_stream"
    _, published = run_curation_funnel_available_now(
        spark, src, state, f"{tmp_path}/ck", out_dir=out_s,
        schema=enriched.schema, embeddings_in_stream=True,
    )
    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src, out_b,
        near_dedup=True, near_method="minhash",
        semantic_dedup=emb_path,
        semantic_centroids=f"{state}/sem/_model.json",
    )
    pub = dict(published)
    # the two keys that legitimately differ by delivery mode: the
    # always-present miss counter (zero here) and the params' source tag
    assert pub.pop("docs_missing_embedding") == 0
    assert pub["semantic_dedup_params"]["embeddings"] == "in-stream"
    pub["semantic_dedup_params"] = {
        **pub["semantic_dedup_params"], "embeddings": emb_path,
    }
    assert pub == batch
    assert published["after_semantic_dedup"] < published["after_near_dedup"]
    assert _manifest_rows(spark, out_s) == _manifest_rows(spark, out_b)
    assert _corpus_ids(spark, out_s) == _corpus_ids(spark, out_b)


def test_streaming_funnel_missing_embedding_fail_contract(
    spark, sf_dir, tmp_path
):
    """missing_embedding='fail' (the default): a gated doc arriving with
    a null embedding kills the stream with an explicit error — never a
    silent semantic-tier skip."""
    from moc_indexer_spark.streaming.corpus import quality_gate

    enriched = _docs_with_embeddings(spark, sf_dir)
    # null the embedding of a doc that PASSES the quality gate, so the
    # contract check is actually reached
    gated_id = quality_gate(enriched).select("doc_id").first().doc_id
    enriched = _docs_with_embeddings(spark, sf_dir, null_ids=[gated_id])
    src = f"{tmp_path}/src"
    _slice_to_files(spark, enriched, src, 1, tmp_path)

    import pytest

    with pytest.raises(Exception) as ei:
        run_curation_funnel_available_now(
            spark, src, f"{tmp_path}/state", f"{tmp_path}/ck",
            out_dir=f"{tmp_path}/out",
            schema=enriched.schema, embeddings_in_stream=True,
        )
    assert "null embedding" in str(ei.value)


def test_streaming_funnel_missing_embedding_skip_is_counted(
    spark, sf_dir, tmp_path
):
    """missing_embedding='skip': null-embedding docs bypass the semantic
    tier exactly like the batch CLI's docs-without-a-sidecar-row — and
    the published funnel COUNTS them (docs_missing_embedding), so the
    skip is observable, not silent. Equivalence: stream(skip, nulls for
    ids I) == batch(sidecar minus I)."""
    from moc_indexer_spark.streaming.corpus import quality_gate

    enriched = _docs_with_embeddings(spark, sf_dir)
    null_ids = [
        r.doc_id
        for r in quality_gate(enriched).select("doc_id").limit(5).collect()
    ]
    enriched = _docs_with_embeddings(spark, sf_dir, null_ids=null_ids)
    src = f"{tmp_path}/src"
    _slice_to_files(spark, enriched, src, 2, tmp_path)

    state = f"{tmp_path}/state"
    out_s = f"{tmp_path}/out_stream"
    _, published = run_curation_funnel_available_now(
        spark, src, state, f"{tmp_path}/ck", out_dir=out_s,
        schema=enriched.schema, embeddings_in_stream=True,
        missing_embedding="skip",
    )
    assert published["docs_missing_embedding"] == len(null_ids)

    # batch oracle: a sidecar that simply lacks those ids
    partial = f"{tmp_path}/partial_emb"
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(~F.col("vec_id").isin(*null_ids))
        .write.mode("overwrite").parquet(partial)
    )
    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src, out_b,
        near_dedup=True, near_method="minhash",
        semantic_dedup=partial,
        semantic_centroids=f"{state}/sem/_model.json",
    )
    pub = dict(published)
    assert pub.pop("docs_missing_embedding") == len(null_ids)
    pub["semantic_dedup_params"] = {
        **pub["semantic_dedup_params"], "embeddings": partial,
    }
    assert pub == batch
    assert _corpus_ids(spark, out_s) == _corpus_ids(spark, out_b)


def test_streaming_funnel_quarantine_only_publish_writes_artifact(
    spark, tmp_path
):
    """ADVICE r9: a publish over quarantine-only state must still land a
    funnel.json in out_dir with the full key set (zeros) — a consumer
    polling out_dir after a successful publish can never see a stale or
    absent artifact with no signal."""
    src = f"{tmp_path}/src"
    os.makedirs(src)
    with open(f"{src}/bad.jsonl", "w") as fh:
        fh.write("{broken 1\n{broken 2\n{broken 3\n")
    out = f"{tmp_path}/out"
    _, published = run_curation_funnel_available_now(
        spark, src, f"{tmp_path}/state", f"{tmp_path}/ck",
        out_dir=out, jsonl=True,
    )
    assert published["quarantined_lines"] == 3
    assert published["raw"] == 0
    assert published["after_quality_gate"] == 0
    assert published["after_exact_dedup"] == 0
    assert published["after_near_dedup"] == 0
    assert published["after_decontamination"] == 0
    assert published["final_docs"] == 0
    assert "near_dedup_params" in published
    assert json.load(open(f"{out}/funnel.json")) == published


def test_streaming_funnel_jsonl_with_in_stream_embeddings(
    spark, sf_dir, tmp_path
):
    """The production daemon shape end-to-end: JSONL arrivals that CARRY
    their embeddings (plus broken lines into quarantine), semantic tier
    fed in-stream. Must equal the batch CLI over the same JSONL files
    with the parquet sidecar and the stream's persisted quantizer —
    embedding values survive the JSON round-trip exactly (float32 →
    shortest-repr JSON → float64 parse → float32 cast is lossless)."""
    import pyspark.sql.types as T

    from moc_indexer_spark.sources.files import DOCUMENTS_SCHEMA

    docs = table(spark, sf_dir, "documents").limit(200)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    rows = docs.join(emb, "doc_id", "left").collect()
    src = f"{tmp_path}/src"
    os.makedirs(src)
    half = len(rows) // 2
    for name, part, broken in (("a", rows[:half], 1), ("b", rows[half:], 2)):
        with open(f"{src}/{name}.jsonl", "w") as fh:
            for r in part:
                fh.write(json.dumps({
                    "doc_id": r.doc_id, "text": r.text, "lang": r.lang,
                    "source": r.source, "n_chars": r.n_chars,
                    "embedding": list(r.embedding),
                }) + "\n")
            for k in range(broken):
                fh.write("{broken %d\n" % k)

    schema = T.StructType(
        DOCUMENTS_SCHEMA.fields
        + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )
    out_s = f"{tmp_path}/out_stream"
    state = f"{tmp_path}/state"
    _, published = run_curation_funnel_available_now(
        spark, src, state, f"{tmp_path}/ck", out_dir=out_s,
        jsonl=True, schema=schema, embeddings_in_stream=True,
    )
    assert published["quarantined_lines"] == 3
    assert published["docs_missing_embedding"] == 0

    out_b = f"{tmp_path}/out_batch"
    batch = run_pipeline(
        spark, src, out_b, jsonl=True,
        near_dedup=True, near_method="minhash",
        semantic_dedup=f"{sf_dir}/embeddings.parquet",
        semantic_centroids=f"{state}/sem/_model.json",
    )
    pub = dict(published)
    assert pub.pop("docs_missing_embedding") == 0
    pub["semantic_dedup_params"] = {
        **pub["semantic_dedup_params"],
        "embeddings": f"{sf_dir}/embeddings.parquet",
    }
    assert pub == batch
    assert _manifest_rows(spark, out_s) == _manifest_rows(spark, out_b)
    assert _corpus_ids(spark, out_s) == _corpus_ids(spark, out_b)


def test_streaming_funnel_all_gate_rejected_publish_survives(
    spark, tmp_path
):
    """Review finding (round 10): a stream whose docs ALL fail the
    quality gate must still publish the zero-docs artifact — an empty
    gated batch must not create an empty docs table that steers
    publish() into a 0-row corpus write whose manifest re-read kills
    the stream."""
    import pyspark.sql.types as T

    rows = [(i, "too short", "en", "srcX", 9) for i in range(8)]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
    ])
    src = f"{tmp_path}/src"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    out = f"{tmp_path}/out"
    _, published = run_curation_funnel_available_now(
        spark, src, f"{tmp_path}/state", f"{tmp_path}/ck",
        out_dir=out, schema=schema, publish_every=1,
    )
    assert published["raw"] == 8
    assert published["after_quality_gate"] == 0
    assert published["final_docs"] == 0
    assert json.load(open(f"{out}/funnel.json")) == published


def test_batch_pipeline_survives_total_decontamination(spark, sf_dir, tmp_path):
    """Review finding (round 10): when the benchmark slice holds the
    WHOLE surviving corpus, decontamination deletes everything and the
    0-row corpus write must not crash the manifest re-read — the funnel
    reports zeros and an explicitly-empty manifest lands."""
    docs = table(spark, sf_dir, "documents").limit(50).withColumn(
        "source", F.lit("src0")
    )
    src = f"{tmp_path}/in"
    docs.coalesce(1).write.parquet(src)
    out = f"{tmp_path}/out"
    funnel = run_pipeline(spark, src, out)
    assert funnel["after_decontamination"] == 0 == funnel["final_docs"]
    manifest = spark.read.parquet(f"{out}/manifest")
    assert manifest.count() == 0
    assert set(manifest.columns) == {
        "shard_id", "n_docs", "total_chars", "min_doc_id", "max_doc_id",
        "n_packs",
    }
    assert json.load(open(f"{out}/funnel.json")) == funnel


def test_missing_embedding_redelivery_counts_once(spark, sf_dir, tmp_path):
    """Review finding (round 10): a null-embedding doc REDELIVERED in a
    later micro-batch (in-contract) must count once in
    docs_missing_embedding — the miss store is keyed by doc id, not by
    (batch, count)."""
    from moc_indexer_spark.streaming.corpus import quality_gate
    from moc_indexer_spark.streaming.funnel import StreamingCurationFunnel

    enriched = _docs_with_embeddings(spark, sf_dir)
    gated_id = quality_gate(enriched).select("doc_id").first().doc_id
    enriched = _docs_with_embeddings(spark, sf_dir, null_ids=[gated_id])
    batch = enriched.filter(F.col("doc_id") == gated_id)

    funnel = StreamingCurationFunnel(
        spark, f"{tmp_path}/state",
        embeddings_in_stream=True, missing_embedding="skip",
    )
    funnel.process_batch(batch, 0)
    funnel.process_batch(batch, 1)  # cross-batch redelivery
    pub = funnel.publish(f"{tmp_path}/out")
    assert pub["docs_missing_embedding"] == 1


def test_publish_every_zero_disables_periodic_publish(spark, sf_dir, tmp_path):
    """Review finding (round 10): `--publish-every 0` must mean
    'disabled', not ZeroDivisionError inside the stream."""
    docs = table(spark, sf_dir, "documents").limit(60)
    src = f"{tmp_path}/src"
    _slice_to_files(spark, docs, src, 1, tmp_path)
    out = f"{tmp_path}/out"
    _, published = run_curation_funnel_available_now(
        spark, src, f"{tmp_path}/state", f"{tmp_path}/ck",
        out_dir=out, schema=docs.schema, publish_every=0,
    )
    assert published is not None and published["final_docs"] > 0


def test_streaming_semantic_centroids_seed_and_mismatch(
    spark, sf_dir, tmp_path
):
    """--semantic-centroids in stream mode (review finding: previously
    silently ignored): seeds the maintainer's quantizer so the funnel
    judges under an existing index's model; a state already holding a
    DIFFERENT model is refused."""
    import shutil as _sh

    from moc_indexer_spark.streaming.funnel import StreamingCurationFunnel

    # train a model by running one batch through funnel A
    enriched = _docs_with_embeddings(spark, sf_dir)
    a = StreamingCurationFunnel(
        spark, f"{tmp_path}/stateA", embeddings_in_stream=True,
    )
    a.process_batch(enriched.limit(80), 0)
    model = a.sem._model_path()
    assert a.sem.is_trained()

    # seed funnel B from A's model: trained before any batch
    b = StreamingCurationFunnel(
        spark, f"{tmp_path}/stateB", embeddings_in_stream=True,
        semantic_centroids=model,
    )
    assert b.sem.is_trained()
    with open(model) as fh, open(b.sem._model_path()) as fh2:
        assert fh.read() == fh2.read()

    # a DIFFERENT model against B's now-trained state is refused
    other = f"{tmp_path}/other_model.json"
    _sh.copyfile(model, other)
    with open(other, "a") as fh:
        fh.write(" ")
    import pytest

    with pytest.raises(ValueError, match="DIFFERENT quantizer"):
        StreamingCurationFunnel(
            spark, f"{tmp_path}/stateB", embeddings_in_stream=True,
            semantic_centroids=other,
        )
    # centroids without a semantic tier is refused
    with pytest.raises(ValueError, match="requires the semantic tier"):
        StreamingCurationFunnel(
            spark, f"{tmp_path}/stateC", semantic_centroids=model,
        )
