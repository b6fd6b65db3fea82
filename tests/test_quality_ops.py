"""Pretraining quality gates (operators/pipeline.py batch 7).

Oracle parity covers the corpus-scale numbers; these tests pin the
hand-computable semantics: known repetition fractions, short-doc NULL
handling, and the unigram LM score on a corpus small enough to verify
with arithmetic.
"""

import math

import pytest
from pyspark.sql import functions as F

from moc_indexer_spark.operators import pipeline as P


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_stats_known_fractions(spark):
    # "a b a b a b" → bigrams: [a b, b a, a b, b a, a b] → modal "a b" x3 of 5
    # 5-grams: [a b a b a, b a b a b] → both unique → dup frac 0
    df = _docs(spark, [(1, "a b a b a b")])
    row = P.repetition_stats(df).collect()[0]
    assert row.n_tokens == 6
    assert row.top_ngram_frac == pytest.approx(3 / 5)
    assert row.dup_ngram_frac == 0.0


def test_repetition_stats_duplicated_fivegrams(spark):
    # "x y z w v x y z w v x y z w v" (15 toks) → 11 5-grams; the window
    # repeats with period 5, so every 5-gram occurs >= 2 times except the
    # center one ("v x y z w" occurs 2, "x y z w v" occurs 3...). Compute:
    # grams: positions 1..11 cycling 5 distinct shapes with counts
    # [3,2,2,2,2] → all counts >= 2 → dup frac = 11/11 = 1.0
    df = _docs(spark, [(2, "x y z w v x y z w v x y z w v")])
    row = P.repetition_stats(df).collect()[0]
    assert row.dup_ngram_frac == 1.0


def test_repetition_stats_short_docs_null(spark):
    # 1 token: no bigrams, no 5-grams → both NULL; 3 tokens: bigrams exist,
    # 5-grams don't → dup NULL only. Short docs must SURVIVE (explode_outer).
    df = _docs(spark, [(1, "solo"), (2, "a b c")])
    out = {r.doc_id: r for r in P.repetition_stats(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].top_ngram_frac is None and out[1].dup_ngram_frac is None
    assert out[2].top_ngram_frac == pytest.approx(1 / 2)
    assert out[2].dup_ngram_frac is None


def test_unigram_logprob_hand_computed(spark):
    # corpus: "a a b" + "b" → counts a:2 b:2, total 4 → p(a)=p(b)=0.5
    # doc 1 mean lp = ln(.5); doc 2 mean lp = ln(.5)
    df = _docs(spark, [(1, "a a b"), (2, "b")])
    out = {r.doc_id: r for r in P.unigram_logprob(df).collect()}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 1
    expect = round(math.log(0.5), 6)
    assert out[1].mean_logprob == pytest.approx(expect, abs=1e-6)
    assert out[2].mean_logprob == pytest.approx(expect, abs=1e-6)


def test_unigram_logprob_rare_token_scores_lower(spark):
    # A doc of corpus-rare tokens must score strictly below a doc of
    # corpus-common tokens (the property the quality gate relies on).
    common = [(i, "the cat sat on the mat") for i in range(5)]
    rare = [(99, "zyx qwv unseen glyph")]
    out = {
        r.doc_id: r.mean_logprob
        for r in P.unigram_logprob(_docs(spark, common + rare)).collect()
    }
    assert out[99] < out[0]


def test_asof_join_forward_semantics(spark):
    from moc_indexer_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 25, 101), (2, 10, 102), (3, 10, 103)],
        "k bigint, ts bigint, lid bigint",
    )
    right = spark.createDataFrame(
        [(1, 10, 7.0), (1, 20, 8.0), (1, 30, 9.0), (2, 5, 1.0)],
        "k bigint, ts bigint, price double",
    )
    out = {
        r.lid: r.asof_price
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=["price"], direction="forward",
        ).collect()
    }
    assert out[100] == 7.0  # equal ts IS visible (>= semantics)
    assert out[101] == 9.0  # next right at 30
    assert out[102] is None  # only earlier right rows for k=2
    assert out[103] is None  # no right rows for k=3


def test_materialize_corpus_applies_keeplist_and_clusters(spark, sf_dir, tmp_path):
    from moc_indexer_spark.plans.registry import registry
    from moc_indexer_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    keep = {s.name: s for s in registry()}["training_corpus_filter"].build(
        spark, sf_dir
    )
    n_keep = keep.select("doc_id").distinct().count()
    kept, dropped = P.materialize_corpus(
        docs, keep, f"{tmp_path}/corpus", n_files=4
    )
    assert kept == n_keep
    assert kept + dropped == docs.count()
    out = spark.read.parquet(f"{tmp_path}/corpus")
    assert out.columns == docs.columns
    # every surviving row is a real corpus row (semi-join, no duplication)
    assert out.join(docs, "doc_id", "left_anti").count() == 0
    assert out.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


def test_kneser_ney_probabilities_are_proper(spark):
    """KN sanity on a tiny corpus: per-context probabilities over SEEN
    continuations stay < 1 (discount mass reserved), every score is
    finite/negative, and a document of common bigrams outscores one of
    rare bigrams."""
    import math

    from moc_indexer_spark.operators.pipeline import kneser_ney_logprob

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the rug"),
        (2, "the cat sat on the mat again"),
        (3, "zebra quark flux vortex"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in kneser_ney_logprob(docs).collect()}
    assert set(out) == {0, 1, 2, 3}
    for r in out.values():
        assert r.mean_logprob < 0 and math.isfinite(r.mean_logprob)
    # "the cat sat on the mat" bigrams are corpus-frequent; the nonsense
    # doc's bigrams are all singletons -> strictly worse mean score
    assert out[0].mean_logprob > out[3].mean_logprob

    # direct probability check: P_KN over seen continuations of "the"
    # must sum to < 1 (the discount reserves mass for unseen events)
    from collections import Counter

    bigs = Counter()
    for _, t in rows:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bigs[(a, b)] += 1
    D = 0.75
    c1 = sum(c for (a, _), c in bigs.items() if a == "the")
    n_follow = len({b for (a, b) in bigs if a == "the"})
    n_types = len(bigs)
    total = 0.0
    for (a, b), c in bigs.items():
        if a != "the":
            continue
        n_prec = len({x for (x, y) in bigs if y == b})
        total += max(c - D, 0) / c1 + (D * n_follow / c1) * (n_prec / n_types)
    assert total < 1.0
