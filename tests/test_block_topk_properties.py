"""Property tests for the shared blocked top-k emission helper: the
argpartition fast path must equal the full stable lexsort under ANY
score matrix — including adversarial duplicate scores at the cut
boundary (6dp-rounded cosines tie constantly in production)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from moc_indexer_spark.operators.similarity import _block_topk


def _reference(scores, c_ids, q_ids, kk):
    """The pre-optimization emission: full stable lexsort per row."""
    nq, nc = scores.shape
    kk = min(kk, nc)
    order = np.lexsort((c_ids[None, :].repeat(nq, 0), -scores), axis=1)
    top = order[:, :kk]
    qi = np.repeat(q_ids, kk)
    ni = c_ids[top].ravel()
    sv = np.take_along_axis(scores, top, axis=1).ravel()
    keep = sv != -np.inf
    return qi[keep], ni[keep], sv[keep]


@st.composite
def score_blocks(draw):
    nq = draw(st.integers(1, 6))
    nc = draw(st.integers(1, 40))
    kk = draw(st.integers(1, 50))
    # few distinct levels -> dense ties, the adversarial regime
    levels = draw(st.integers(1, 4))
    vals = draw(
        st.lists(
            st.floats(-2, 2, allow_nan=False, width=32),
            min_size=levels, max_size=levels, unique=True,
        )
    )
    idx = draw(
        st.lists(
            st.integers(0, levels - 1), min_size=nq * nc, max_size=nq * nc
        )
    )
    scores = np.array([vals[i] for i in idx], dtype=np.float64).reshape(nq, nc)
    # optional -inf masks (self-matches)
    n_mask = draw(st.integers(0, min(5, nq * nc)))
    for _ in range(n_mask):
        scores[draw(st.integers(0, nq - 1)), draw(st.integers(0, nc - 1))] = (
            -np.inf
        )
    c_ids = np.random.RandomState(draw(st.integers(0, 999))).permutation(
        nc
    ).astype(np.int64)
    q_ids = np.arange(nq, dtype=np.int64)
    return scores, c_ids, q_ids, kk


@given(score_blocks())
@settings(max_examples=300, deadline=None)
def test_block_topk_equals_full_sort(block):
    scores, c_ids, q_ids, kk = block
    got = _block_topk(scores.copy(), c_ids, q_ids, kk)
    want = _reference(scores.copy(), c_ids, q_ids, kk)
    for g, w in zip(got, want):
        assert np.array_equal(g, w), (scores, c_ids, kk, got, want)


def test_block_topk_all_masked_row():
    scores = np.full((2, 5), -np.inf)
    scores[1, 3] = 0.5
    qi, ni, sv = _block_topk(scores, np.arange(5, dtype=np.int64),
                             np.array([7, 8], dtype=np.int64), 3)
    assert list(qi) == [8] and list(ni) == [3] and list(sv) == [0.5]
