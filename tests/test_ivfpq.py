"""Composed IVF+PQ (IVFADC): exact-mode equivalence to brute force,
production-config recall, and the persisted cell-partitioned index."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from moc_indexer_spark.operators import similarity as S
from moc_indexer_spark.tables import table


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def _rows(df):
    return sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in df.collect()
    )


def test_ivfpq_exact_mode_equals_brute_force(spark, sf_dir):
    """n_probe == n_cells and refine=None make both prunes lossless: the
    composed index must reproduce brute force row-for-row (rank, id AND
    similarity) — the same contract the driver's ivfpq_ann_exact oracle
    checks by hash."""
    emb = table(spark, sf_dir, "embeddings")
    want = _rows(S.brute_force_topk_np(emb, k=3))
    got = _rows(S.ivfpq_topk(emb, k=3, n_cells=8, n_probe=8, refine=None))
    assert got == want


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exact = _pairs(S.brute_force_topk_np(emb, k=3))
    # n_probe pinned: the recall floor certifies a KNOWN configuration
    # (half-cells probe x 8x-refine ADC shortlist on uniform vectors, the
    # worst case for both prunes) rather than whatever the production
    # default drifts to — the default is now max(4, n_cells//8), whose
    # recall on structureless fixtures sits near, not safely above, 0.5
    approx_df = S.ivfpq_topk(emb, k=3, n_cells=8, n_probe=4)
    approx = _pairs(approx_df)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF+PQ recall {recall:.2f} too low"
    # exact re-rank: any shared pair agrees on the similarity value
    bf = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in S.brute_force_topk_np(emb, k=3).collect()
    }
    for r in approx_df.collect():
        if (r.query_id, r.neighbor_id) in bf:
            assert r.cosine_sim == bf[(r.query_id, r.neighbor_id)]


def test_ivfpq_persisted_index_probe(spark, sf_dir, tmp_path):
    """The persisted index must (a) prune partitions at the scan, (b) in
    exact mode match brute force over the whole corpus, and (c) honor
    the exclude_self flag for id-colliding external queries."""
    corpus = table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(corpus, path, n_cells=8)

    qrows = corpus.orderBy("vec_id").limit(3).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in qrows]

    got = S.ivfpq_probe_topk(spark, path, queries, k=5, n_probe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # exact mode (full probe + exhaustive shortlist, self-excluded)
    # equals the brute-force ranking for those queries
    full = S.ivfpq_probe_topk(
        spark, path, queries, k=5, n_probe=8, refine=None, exclude_self=True
    )
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in S.brute_force_topk_np(corpus, k=5).collect()
        if r.query_id in {q for q, _ in queries}
    }
    got_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in full.collect()
    }
    assert got_rows == want

    # default external-id semantics: the identical vector (same id) is a
    # legitimate neighbor and ranks first with cosine 1.0
    ext = S.ivfpq_probe_topk(spark, path, queries, k=1, n_probe=8,
                             refine=None).collect()
    assert {r.query_id for r in ext} == {q for q, _ in queries}
    for r in ext:
        assert r.neighbor_id == r.query_id and r.cosine_sim == 1.0
