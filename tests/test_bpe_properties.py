"""Property-based checks (hypothesis) for the BPE kernels — pure Python,
no Spark session needed."""

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from moc_indexer_spark.operators import bpe as B

syms_st = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=2), min_size=0, max_size=12
)
tok_st = st.text(alphabet="ab", min_size=1, max_size=3)


@given(syms_st, tok_st, tok_st)
@settings(max_examples=200, deadline=None)
def test_merge_concatenation_invariant(syms, a, b):
    out = B._merge_pair_in_syms(syms, a, b)
    assert "".join(out) == "".join(syms)


@given(syms_st, tok_st, tok_st)
@settings(max_examples=200, deadline=None)
def test_merge_greedy_idempotent_for_distinct_pair(syms, a, b):
    if a == b:
        return  # "aaa" legitimately leaves a trailing 'a' next to 'aa'
    once = B._merge_pair_in_syms(syms, a, b)
    # no un-merged (a, b) adjacency survives
    assert all(
        not (once[i] == a and once[i + 1] == b) for i in range(len(once) - 1)
    )
    assert B._merge_pair_in_syms(once, a, b) == once


words_st = st.dictionaries(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=50),
    min_size=1,
    max_size=12,
)


def _ref_learn(freqs, n_merges):
    """Independent formulation: Counter + explicit max with tiebreak."""
    words = {w: list(w) + [B.END_OF_WORD] for w in freqs}
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freqs[w]
        best, bc = None, None
        for pair, c in counts.items():
            key = (-c, pair[0], pair[1])
            if bc is None or key < bc:
                best, bc = pair, key
        if best is None or counts[best] < 2:
            break
        merges.append((rank, best[0], best[1], counts[best]))
        words = {
            w: B._merge_pair_in_syms(s, best[0], best[1])
            for w, s in words.items()
        }
    return merges


@given(words_st, st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_learn_merges_matches_independent_reference(freqs, n):
    assert B.learn_merges(freqs, n) == _ref_learn(freqs, n)


@given(words_st)
@settings(max_examples=100, deadline=None)
def test_learned_merge_counts_are_nonincreasing_when_disjoint(freqs):
    # pair_count can INCREASE after a merge creates new symbols, but the
    # argmax sequence must always satisfy count >= 2 and ranks must be
    # dense from 0
    merges = B.learn_merges(freqs, 6)
    assert [m[0] for m in merges] == list(range(len(merges)))
    assert all(m[3] >= 2 for m in merges)
