"""Cross-checks for the approximate (rows-only) LLM operators against exact
baselines, and wei decimal-math unit tests against Python Decimal reference
semantics (/root/reference/indexer/events/mocexchange.py:47-89 formulas)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from moc_indexer_spark.operators import dedup as D
from moc_indexer_spark.operators import similarity as S
from moc_indexer_spark.tables import table
from moc_indexer_spark.functions import wei


def test_simhash_finds_exact_duplicate_token_bags(spark, sf_dir):
    """Docs with near-identical token multisets must appear in simhash pairs;
    exact 3-gram near-dups (jaccard>=0.8) are a subset of 'very similar' docs
    whose simhash hamming should be small."""
    docs = table(spark, sf_dir, "documents")
    exact = {
        (r.doc_i, r.doc_j)
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    sim = {
        (r.doc_i, r.doc_j): r.hamming
        for r in D.simhash_pairs(docs, max_hamming=8).collect()
    }
    if not exact:
        pytest.skip("no exact near-dup pairs at this sf")
    found = sum(1 for p in exact if p in sim)
    assert found / len(exact) >= 0.8, f"simhash recall {found}/{len(exact)}"


def test_lsh_default_operating_point_recall(spark, sf_dir):
    """The DEFAULT call (adaptive plane count, 16 tables — exactly what
    q_lsh_ann_topk runs) must hold recall@5 >= 0.8 at fixture scale
    (measured 0.89-0.92 at sf0.001/0.01/0.1). The recall-vs-n_tables
    cost curve at 10x/30x lives in SCALE_CURVE.json lsh_recall_curve
    (scripts/scale_curve.py --lsh-recall); this pin guards the default
    against plane/table regressions."""
    from moc_indexer_spark.tables import parquet_rows

    emb = table(spark, sf_dir, "embeddings")
    n = parquet_rows(sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk_np(emb, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_bucket_topk(emb, k=5, n=n).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"default LSH recall {recall:.2f}"


def test_lsh_ann_recall_vs_brute_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").limit(200)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_bucket_topk(emb, k=3, n_tables=16, n_planes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH recall {recall:.2f} too low"


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk_np(emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, k=3, n_cells=8, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # uniform random vectors are IVF's worst case; 0.67 measured @ 3/8 probes
    assert recall >= 0.55, f"IVF recall {recall:.2f} too low"
    # full probe degenerates to exact brute force
    full = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, k=3, n_cells=8, n_probe=8).collect()
    }
    assert full == exact, "n_probe == n_cells must equal brute force"


def test_minhash_equals_exact_jaccard(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    exact = {
        (r.doc_i, r.doc_j): round(r.jaccard, 9)
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    mh = {
        (r.doc_i, r.doc_j): round(r.jaccard, 9)
        for r in D.minhash_lsh_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert mh == exact


def test_wei_roundtrip_and_usd(spark):
    rows = [
        # (reserveTotal wei, reservePrice wei)
        (10**18, 2 * 10**18),                      # 1 ether at price 2 -> 2e18
        (123456789 * 10**10, 45000 * 10**18),      # fractional amount
        (1, 10**18),                               # 1 wei at price 1
    ]
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in rows], ["amount", "price"]
    ).select(
        F.col("amount").cast("decimal(38,0)").alias("amount"),
        F.col("price").cast("decimal(38,0)").alias("price"),
    )
    out = df.select(
        wei.from_wei("amount").alias("eth"),
        wei.usd_amount(F.col("amount"), F.col("price")).alias("usd"),
    ).collect()
    for (a, b), r in zip(rows, out):
        ref_eth = Decimal(a) / Decimal(10**18)
        assert Decimal(r.eth) == ref_eth
        ref_usd = (Decimal(a) * Decimal(b)) / Decimal(10**18)
        # documented dust tolerance of the gwei-rescale trick
        assert abs(Decimal(r.usd) - ref_usd) <= Decimal(a + b) / Decimal(2 * 10**9) + 1


def test_gas_fee_and_signed_total(spark):
    df = spark.createDataFrame(
        [(21000, str(65_000_000))], ["gas_used", "gas_price"]
    ).select(
        F.col("gas_used"),
        F.col("gas_price").cast("decimal(38,0)").alias("gas_price"),
    )
    r = df.select(
        wei.gas_fee_wei(F.col("gas_used"), F.col("gas_price")).alias("fee")
    ).collect()[0]
    assert int(r.fee) == 21000 * 65_000_000

    df2 = spark.createDataFrame(
        [(str(10**18), str(10**16), str(0), str(5 * 10**15), True),
         (str(10**18), str(10**16), str(0), str(5 * 10**15), False)],
        ["rt", "comm", "ints", "gas", "pos"],
    ).select(
        *[F.col(c).cast("decimal(38,0)").alias(c) for c in ("rt", "comm", "ints", "gas")],
        F.col("pos"),
    )
    out = df2.select(
        wei.signed_total(
            F.col("rt"), F.col("comm"), F.col("ints"), F.col("gas"), F.col("pos")
        ).alias("total")
    ).collect()
    expect = 10**18 + 10**16 + 5 * 10**15
    assert int(out[0].total) == expect
    assert int(out[1].total) == -expect


def test_dedup_clusters_match_transitive_closure(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pairs = [(r.doc_i, r.doc_j)
             for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()]
    if not pairs:
        pytest.skip("no near-dup pairs at this sf")
    # python union-find reference
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    expected = {x: find(x) for x in parent}
    from moc_indexer_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs
    got = {r.doc_id: r.cluster_id
           for r in dedup_clusters(ngram_jaccard_pairs(docs, n=3, threshold=0.8)).collect()}
    assert got == expected


def test_pq_ann_recall_vs_brute_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk_np(emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.pq_topk(emb, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 16-code x 16-subspace PQ on uniform 64-dim vectors (the worst case),
    # 8x refine shortlist: 0.85 measured
    assert recall >= 0.6, f"PQ recall {recall:.2f} too low"
    # the exact re-rank means every returned similarity is the TRUE cosine:
    # any (query, neighbor) PQ shares with brute force must agree on score
    bf = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in S.brute_force_topk_np(emb, k=3).collect()
    }
    for r in S.pq_topk(emb, k=3).collect():
        if (r.query_id, r.neighbor_id) in bf:
            assert abs(bf[(r.query_id, r.neighbor_id)] - r.cosine_sim) < 1e-9


def test_wei_fuzz_roundtrip_exact(spark):
    """Seeded fuzz over the full DECIMAL(38,0) wei domain: from_wei is an
    EXACT rescale (equals Python Decimal shift) and to_wei_trunc inverts it
    bit-for-bit — one slip in the decimal plumbing breaks hash-match
    oracles everywhere, so this is load-bearing, not belt-and-braces."""
    import random

    rng = random.Random(7)
    edge = [0, 1, 10**18 - 1, 10**18, 10**18 + 1, 10**27, 10**38 - 1]
    vals = edge + [rng.randrange(10**38) for _ in range(500)]
    df = spark.createDataFrame(
        [(str(v),) for v in vals], ["w"]
    ).select(F.col("w").cast("decimal(38,0)").alias("w"))
    out = df.select(
        "w",
        wei.from_wei("w").alias("eth"),
        wei.to_wei_trunc(wei.from_wei("w")).alias("back"),
    ).collect()
    from decimal import localcontext

    with localcontext() as ctx:
        # default context precision (28) would round the 38-digit expected
        # values and mask (or fake) library bugs; the engine itself is exact
        ctx.prec = 60
        for v, r in zip(vals, out):
            assert Decimal(r.eth) == Decimal(v).scaleb(-18), v
            assert int(r.back) == v, v


def test_edit1_pairs_finds_typo_variants(spark):
    """SymSpell deletion-neighborhood join: strings within one edit
    (substitution, deletion, insertion) pair up; unrelated strings don't."""
    rows = [
        (1, "transformer"),
        (2, "transformer"),   # identical
        (3, "transfomer"),    # deletion
        (4, "transformer"),   # insertion... same length+1
        (5, "transformed"),   # substitution of last char
        (6, "attention"),     # unrelated
        (7, "atention"),      # deletion of unrelated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_i, r.id_j) for r in D.edit1_pairs(df, max_len=32).collect()
    }
    # every true <=1-edit neighbor of "transformer" is found
    for want in [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5)]:
        assert want in pairs, want
    assert (6, 7) in pairs
    # no cross-family pairs
    assert not any(
        (i in {1, 2, 3, 4, 5}) != (j in {1, 2, 3, 4, 5}) for i, j in pairs
    )


def test_line_dedup_edges(spark):
    """Docs losing EVERY line must survive with empty text; unique lines
    keep original order; a line repeated within ONE doc is not removed
    (the criterion is distinct-doc count)."""
    from pyspark.sql import functions as F

    from moc_indexer_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, ["shared", "only in one", "shared2"]),
            (2, ["shared", "shared2"]),          # loses everything
            (3, ["alpha", "alpha", "beta"]),     # in-doc repeat survives
            (4, []),                              # empty doc
        ],
        "doc_id long, lines array<string>",
    )
    out = {
        r.doc_id: r
        for r in line_dedup(docs, F.col("lines"), min_dup_docs=2).collect()
    }
    assert out[1].clean_text == "only in one" and out[1].n_kept == 1
    assert out[2].clean_text == "" and out[2].n_kept == 0 and out[2].n_lines == 2
    assert out[3].clean_text == "alpha alpha beta" and out[3].n_kept == 3
    assert out[4].clean_text == "" and out[4].n_lines == 0


def test_semantic_dedup_keeper_chains(spark):
    """Within a cluster the dup maps to the SMALLEST qualifying earlier id
    (not just any); cross-cluster near-dups are ignored by design."""
    from moc_indexer_spark.operators.similarity import semantic_dedup

    v = [1.0, 0.0]
    w = [0.0, 1.0]
    rows = [
        (1, 0, v), (2, 0, v), (3, 0, v),   # 2,3 both dup_of 1
        (4, 0, w),                          # orthogonal -> keeper
        (5, 1, v),                          # same vector, other cluster -> keeper
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {
        r.vec_id: r.dup_of
        for r in semantic_dedup(df, "label", threshold=0.9).collect()
    }
    assert got == {1: None, 2: 1, 3: 1, 4: None, 5: None}


def test_shared_span_pairs_exact_lengths(spark):
    """Hand-built docs with known longest-common-token-runs: the overlap
    detector must report the exact span length, ignore scattered (non-
    contiguous) shared tokens, and respect the threshold."""
    from moc_indexer_spark.operators.dedup import shared_span_pairs

    quote = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, f"aa bb cc {quote} dd ee"),
            (2, f"xx yy {quote} zz"),               # shares the 10-token quote
            (3, "one two three pq rs tu four five six"),  # only 3-token runs
            (4, "unrelated words entirely here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_i, r.doc_j): r.max_shared_span
        for r in shared_span_pairs(docs, n=3, min_span_tokens=5).collect()
    }
    assert got == {(1, 2): 10}
    # lowering the threshold surfaces the short scattered runs too
    got3 = {
        (r.doc_i, r.doc_j): r.max_shared_span
        for r in shared_span_pairs(docs, n=3, min_span_tokens=3).collect()
    }
    assert got3[(1, 2)] == 10
    assert got3[(1, 3)] == 3 and got3[(2, 3)] == 3
    assert (1, 4) not in got3


def test_lsh_dup_pairs_recall_and_precision(spark, sf_dir):
    """The LSH scale form of embedding near-dup must emit ONLY true pairs
    (precision exact: every emitted cosine equals the all-pairs value and
    clears the threshold) at high recall vs the exact form."""
    from moc_indexer_spark.operators.similarity import lsh_dup_pairs
    from moc_indexer_spark.plans.llm_registry import (
        COSINE_DUP_THRESHOLD, q_embedding_dup_pairs,
    )
    from moc_indexer_spark.tables import table

    exact = {
        (r.vec_i, r.vec_j): r.cosine_sim
        for r in q_embedding_dup_pairs(spark, sf_dir).collect()
    }
    got = {
        (r.vec_i, r.vec_j): r.cosine_sim
        for r in lsh_dup_pairs(
            table(spark, sf_dir, "embeddings"), threshold=COSINE_DUP_THRESHOLD
        ).collect()
    }
    # precision: every emitted pair is a true pair with the exact cosine
    for pair, sim in got.items():
        assert pair in exact and abs(sim - exact[pair]) < 1e-9
    # recall: the 16x4 tables recover the overwhelming majority
    assert exact, "fixture should contain near-dup pairs"
    recall = len(got) / len(exact)
    assert recall >= 0.8, f"recall {recall:.2f}"


def test_ivf_persisted_index_prunes_partitions(spark, sf_dir, tmp_path):
    """build_ivf_index writes the corpus partitioned by quantizer cell;
    a probe must (a) reach the parquet scan as a partition filter — the
    un-probed cells' directories are never read — and (b) return exactly
    the brute-force ranking restricted to the probed cells."""
    import numpy as np
    from pyspark.sql import functions as F

    from moc_indexer_spark.operators.similarity import (
        build_ivf_index, ivf_probe_topk,
    )
    from moc_indexer_spark.tables import table

    corpus = table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, n_cells=8)

    qrows = corpus.orderBy("vec_id").limit(3).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in qrows]
    # queries drawn FROM the corpus -> self-ANN harness, exclude self
    # (default False serves external id namespaces, like ivfpq_probe_topk)
    got = ivf_probe_topk(spark, path, queries, k=5, n_probe=3,
                         exclude_self=True)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # reference: exact cosine over ONLY the probed cells' members
    import json as _json
    import os as _os
    with open(_os.path.join(path, "_centroids.json")) as f:
        C = np.array(_json.load(f))
    idx = spark.read.parquet(path).collect()
    by_cell = {}
    for r in idx:
        by_cell.setdefault(r.cell, []).append((r.vec_id, np.array(r.embedding)))
    got_rows = {(r.query_id, r.rank): (r.neighbor_id, r.cosine_sim)
                for r in got.collect()}
    for qid, qv in queries:
        qn = np.array(qv) / np.linalg.norm(qv)
        probes = np.argsort(-(qn @ C.T), kind="stable")[:3]
        cands = [(nid, vec) for c in probes for (nid, vec) in by_cell.get(int(c), [])
                 if nid != qid]
        sims = sorted(
            ((round(float(np.dot(qv, vec) / (np.linalg.norm(qv) * np.linalg.norm(vec))), 6), nid)
             for nid, vec in cands),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for rank, (sim, nid) in enumerate(sims, start=1):
            assert got_rows[(qid, rank)] == (nid, sim)


def test_line_dedup_property_vs_python_reference(spark):
    """Randomized docs vs a direct Python reference of the removal rule
    (drop every line occurring in >= 2 distinct docs; rebuild in order)."""
    import random

    from pyspark.sql import functions as F

    from moc_indexer_spark.operators.dedup import line_dedup

    rng = random.Random(99)
    vocab = [f"L{i}" for i in range(12)]
    for trial in range(3):
        docs = [
            (d, [rng.choice(vocab) for _ in range(rng.randrange(0, 9))])
            for d in range(1, 16)
        ]
        # python reference
        from collections import defaultdict
        seen = defaultdict(set)
        for d, lines in docs:
            for ln in lines:
                seen[ln].add(d)
        dup = {ln for ln, ds in seen.items() if len(ds) >= 2}
        want = {
            d: (
                " ".join(l for l in lines if l not in dup),
                len(lines),
                sum(1 for l in lines if l not in dup),
            )
            for d, lines in docs
        }
        df = spark.createDataFrame(docs, "doc_id long, lines array<string>")
        got = {
            r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
            for r in line_dedup(df, F.col("lines"), min_dup_docs=2).collect()
        }
        assert got == want, f"trial {trial}"


def test_prefix_filtered_jaccard_equals_plain(spark, sf_dir):
    from moc_indexer_spark.operators.dedup import (
        jaccard_pairs_prefix_filtered, ngram_jaccard_pairs,
    )

    d = table(spark, sf_dir, "documents")
    plain = sorted(map(tuple, ngram_jaccard_pairs(d, n=3, threshold=0.5).collect()))
    pref = sorted(map(tuple,
                      jaccard_pairs_prefix_filtered(d, n=3, threshold=0.5).collect()))
    assert plain == pref  # result-invariance at a second threshold too


def test_leakage_safe_splits_no_cross_split_pairs(spark, sf_dir):
    """No near-dup pair may straddle a split boundary, every doc gets
    exactly one split, and cluster members share their split."""
    from moc_indexer_spark.operators.dedup import (
        dedup_clusters, leakage_safe_splits, ngram_jaccard_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    splits = leakage_safe_splits(docs, dedup_clusters(pairs))
    rows = splits.collect()
    assert len(rows) == docs.count()
    by_doc = {r.doc_id: r.split for r in rows}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    for p in pairs.collect():
        assert by_doc[p.doc_i] == by_doc[p.doc_j], (p.doc_i, p.doc_j)
    # all three splits are populated at this scale
    assert {r.split for r in rows} == {"train", "val", "test"}


def test_ngram_stop_shingle_prepass(spark):
    """The boilerplate stop-shingle anti-join wired into
    ngram_jaccard_pairs: (a) a stop list containing no corpus shingle is
    result-invariant; (b) removing a planted boilerplate shingle both
    kills the pairs it alone created and rescales jaccard to the
    filtered sets."""
    rows = [
        # docs 0/1: near-identical bodies -> genuinely similar
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        # docs 2/3: unrelated bodies + a shared boilerplate footer long
        # enough to dominate their shingle sets
        (2, "one two three COPY RIGHT FOOTER LINE HERE"),
        (3, "nine ten eleven COPY RIGHT FOOTER LINE HERE"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = sorted(
        (r.doc_i, r.doc_j, round(r.jaccard, 6))
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    )
    assert (2, 3) in {(i, j) for i, j, _ in plain}  # footer-driven pair

    # (a) result-invariance: stop list disjoint from the corpus
    noop = spark.createDataFrame(
        [("zz yy xx",)], ["shingle"]
    )
    same = sorted(
        (r.doc_i, r.doc_j, round(r.jaccard, 6))
        for r in D.ngram_jaccard_pairs(
            docs, n=3, threshold=0.3, stop_shingles=noop
        ).collect()
    )
    assert same == plain

    # (b) feed the actual hot shingles (doc_freq >= 2 at n=3) as the
    # stop list — the footer-only pair must disappear, the body pair stays
    from moc_indexer_spark.functions import text as T

    toks = docs.select("doc_id", T.tokens("text").alias("t"))
    hot = (
        toks.select(
            "doc_id", F.explode(T.shingles(F.col("t"), 3)).alias("shingle")
        )
        .dropDuplicates(["doc_id", "shingle"])
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("shingle")
    )
    # keep only FOOTER shingles hot (docs 0/1's shared shingles stay):
    hot = hot.filter(F.col("shingle").contains("FOOTER") | F.col("shingle").contains("COPY") | F.col("shingle").contains("RIGHT") | F.col("shingle").contains("LINE") | F.col("shingle").contains("HERE"))
    filtered = {
        (r.doc_i, r.doc_j)
        for r in D.ngram_jaccard_pairs(
            docs, n=3, threshold=0.3, stop_shingles=hot
        ).collect()
    }
    assert (2, 3) not in filtered and (0, 1) in filtered

    # (c) width mismatch is LOUD: a stop list built at a different n — or
    # carrying NULL / whitespace-padded entries — can never hash-match the
    # corpus shingles, so it must raise at the first action, not silently
    # filter nothing (the result-invariance property would mask exactly
    # that). The certified boilerplate_shingles registry leg emits
    # 4-grams; feeding it to an n=3 join was the silent-no-op bug. The
    # check is lazy (in-plan raise_error): the stop list may be a
    # corpus-wide aggregate, and an eager probe would compute it twice.
    for bad_rows in (
        [("COPY RIGHT FOOTER LINE",)],   # 4-gram into an n=3 join
        [("alpha beta ",)],              # trailing pad: 3 tokens, one empty
        [(None,)],                       # NULL entry
    ):
        bad = spark.createDataFrame(bad_rows, "shingle string")
        with pytest.raises(Exception, match="width mismatch"):
            D.ngram_jaccard_pairs(
                docs, n=3, threshold=0.3, stop_shingles=bad
            ).collect()
    # and the operator-built list at the matching n passes the guard
    hot3 = D.boilerplate_shingles(docs, n=3, min_df=2)
    D.ngram_jaccard_pairs(docs, n=3, threshold=0.3,
                          stop_shingles=hot3).collect()
    # containment shares the scaffolding: same stop list, same guard
    D.ngram_containment_pairs(docs, n=3, stop_shingles=hot3).collect()
    with pytest.raises(Exception, match="width mismatch"):
        D.ngram_containment_pairs(
            docs, n=3,
            stop_shingles=spark.createDataFrame(
                [("a b c d",)], "shingle string"
            ),
        ).collect()


def test_brute_force_variants_agree_on_zero_vectors_and_short_corpus(spark):
    """Zero-norm embeddings (failed/null embedder output) have no defined
    cosine: Spark orders NaN FIRST under desc while numpy sorts it last,
    so un-guarded the Catalyst form ranked a zero vector at rank 1 of
    every query and the Arrow forms dropped it. All three variants must
    exclude such pairs — and on a corpus smaller than k the Arrow forms
    must not surface their -inf self-match sentinels either."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 0.0, 0.0]),   # zero-norm: no defined cosine
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = 5  # > corpus size on purpose
    got = {}
    for name, fn in (
        ("catalyst", S.brute_force_topk),
        ("np", S.brute_force_topk_np),
        ("blocked", S.brute_force_topk_blocked),
    ):
        got[name] = sorted(
            (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
            for r in fn(emb, k=k).collect()
        )
    assert got["catalyst"] == got["np"] == got["blocked"]
    flat = got["catalyst"]
    # the zero vector never appears as a neighbor, and never emits
    # NaN/-inf/NULL similarity values
    assert all(n != 3 for (_, _, n, _) in flat)
    assert all(s is not None and -1.0 <= s <= 1.0 for (_, _, _, s) in flat)
    # queries 1 and 2 still rank each other; the zero vector has no
    # defined cosine as a QUERY either, so it emits nothing
    assert {(q, n) for (q, _, n, _) in flat} == {(1, 2), (2, 1)}


def test_ann_operators_empty_corpus_typed_empty(spark):
    """Sample-trained ANN operators return a typed empty frame on an
    empty corpus (the LSH operators' contract) instead of crashing in
    numpy norm(axis=1); index builders refuse loudly."""
    import pytest as _pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    for out in (
        S.ivf_topk(empty, k=3, n_cells=4),
        S.pq_topk(empty, k=3),
        S.ivfpq_topk(empty, k=3, n_cells=4),
    ):
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "cosine_sim", "rank"]
    with _pytest.raises(ValueError, match="empty corpus"):
        S.build_ivf_index(empty, "/tmp/never_written_ivf", n_cells=4)


def test_semantic_dedup_scaled_precision_and_shape(spark, sf_dir):
    """The scaled SemDeDup form: exactly one row per vector; every
    non-NULL dup_of is a TRUE same-cell earlier near-dup (precision
    exact by re-derivation); two builds agree (quantizer is
    deterministic-sample trained)."""
    import numpy as np

    from moc_indexer_spark.operators.similarity import semantic_dedup_scaled
    from moc_indexer_spark.plans.llm_registry import COSINE_DUP_THRESHOLD
    from moc_indexer_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    out = semantic_dedup_scaled(emb, threshold=COSINE_DUP_THRESHOLD)
    rows = out.collect()
    n = emb.count()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    cell = {r.vec_id: r.cell for r in rows}
    dup_rows = [r for r in rows if r.dup_of is not None]
    assert dup_rows, "fixture should contain semantic dups"
    for r in dup_rows:
        assert r.dup_of < r.vec_id
        assert cell[r.dup_of] == r.cell, "dup_of must be same-cell"
        a, b = vecs[r.vec_id], vecs[r.dup_of]
        cos = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
        assert cos >= COSINE_DUP_THRESHOLD

    again = {(r.vec_id, r.cell, r.dup_of)
             for r in semantic_dedup_scaled(
                 emb, threshold=COSINE_DUP_THRESHOLD).collect()}
    assert again == {(r.vec_id, r.cell, r.dup_of) for r in rows}


def test_semantic_dedup_scaled_vs_global_ground_truth(spark, sf_dir):
    """Measured against the GLOBAL all-pairs ground truth (a vector is a
    true dup iff ANY earlier vector clears the cosine threshold —
    `embedding_dup_pairs`): the scaled form's precision must be exact
    (a same-cell pair >= t IS a global pair), and its recall must beat
    the label-cluster form's — cosine-trained cells group near-dup mass
    better than the corpus's label column, which only ever compares
    same-label pairs (measured: 0.37 vs 0.08 at sf0.001, 0.34 vs 0.13
    at sf0.01). Both are partial by design; neither misses silently —
    this pin keeps the scale path at least as good as the certified
    fixed-cluster form."""
    from moc_indexer_spark.operators.similarity import (
        semantic_dedup, semantic_dedup_scaled,
    )
    from moc_indexer_spark.plans.llm_registry import (
        COSINE_DUP_THRESHOLD, q_embedding_dup_pairs,
    )
    from moc_indexer_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    sf = sf_dir  # q_* builders take the dir
    pairs = q_embedding_dup_pairs(spark, sf).collect()
    global_dup = {max(r.vec_i, r.vec_j) for r in pairs}
    assert global_dup, "fixture should contain near-dup pairs"
    label_dups = {
        r.vec_id
        for r in semantic_dedup(
            emb, "label", threshold=COSINE_DUP_THRESHOLD).collect()
        if r.dup_of is not None
    }
    scaled_dups = {
        r.vec_id
        for r in semantic_dedup_scaled(
            emb, threshold=COSINE_DUP_THRESHOLD).collect()
        if r.dup_of is not None
    }
    # precision vs ground truth is exact
    assert scaled_dups <= global_dup
    r_scaled = len(scaled_dups & global_dup) / len(global_dup)
    r_label = len(label_dups & global_dup) / len(global_dup)
    assert r_scaled >= r_label, (r_scaled, r_label)
    assert r_scaled >= 0.25, f"recall vs global {r_scaled:.2f}"
