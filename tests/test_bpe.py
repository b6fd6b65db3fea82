"""BPE trainer certification: exact equality of learned merges and
segmentations against an independent pure-Python reference."""

from collections import Counter

from moc_indexer_spark.operators import bpe as B
from moc_indexer_spark.tables import table


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al.) on a word-frequency dict."""
    words = {w: list(w) + [B.END_OF_WORD] for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for w, syms in words.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # total order: count desc, pair lex asc
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        merges.append((rank, a, b, c))
        for w in words:
            words[w] = B._merge_pair_in_syms(words[w], a, b)
    return merges, words


def test_bpe_merges_match_reference(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    wf = {r.word: r.freq for r in B.word_freqs(docs).collect()}
    ref_merges, ref_words = _ref_bpe(wf, B.N_MERGES)

    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in B.bpe_train(docs).orderBy("rank").collect()
    ]
    assert got == ref_merges


def test_bpe_segment_matches_reference(spark):
    rows = [
        (0, "low lower lowest"),
        (1, "new newer newest"),
        (2, "wide wider widest low low"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {r.word: r.freq for r in B.word_freqs(docs).collect()}
    ref_merges, _ = _ref_bpe(wf, 10)
    merges = [(a, b) for _, a, b, _ in ref_merges]

    seg = {r.doc_id: list(r.tokens)
           for r in B.bpe_segment(docs, merges).collect()}

    for doc_id, text in rows:
        expect = []
        for w in text.split(" "):
            syms = list(w) + [B.END_OF_WORD]
            for a, b in merges:
                syms = B._merge_pair_in_syms(syms, a, b)
            expect.extend(syms)
        assert seg[doc_id] == expect
    # merges actually compress: fewer symbols than characters
    assert all(
        len(seg[d]) < sum(len(w) + 1 for w in t.split(" "))
        for d, t in rows
    )


def test_bpe_train_bounds_preserve_merges(spark, sf_dir):
    """The default collect bounds (min_freq floor + top-K vocab cap) must
    not change the learned merge table on the fixture corpus — the tail
    they trim sits below the merge cutoff."""
    docs = table(spark, sf_dir, "documents")
    unbounded = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in B.bpe_train(docs, min_freq=1, max_vocab_words=None)
        .orderBy("rank").collect()
    ]
    bounded = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in B.bpe_train(docs).orderBy("rank").collect()
    ]
    assert bounded == unbounded


def test_bpe_learns_frequent_suffix(spark):
    docs = spark.createDataFrame(
        [(i, "jumping running walking talking") for i in range(5)],
        "doc_id long, text string",
    )
    m = B.bpe_train(docs, n_merges=8).collect()
    merged_symbols = {r.left + r.right for r in m}
    # 'ing</w>' family dominates this corpus; some prefix of it must be
    # among the first merges
    assert any("in" in s or "ng" in s for s in merged_symbols)
