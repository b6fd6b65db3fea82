"""Distributed BPE tokenizer training (Sennrich et al. 2016) and
segmentation.

No reference analog (BASELINE.json north star) — the existing
`token_count_bpe` query counts tokens under a FIXED regex
approximation; this module LEARNS the merge table from the corpus, which
is the actual tokenizer-training workload of an LLM data pipeline.

Spark-first decomposition — the key scale fact of BPE is that after one
corpus pass it never touches the corpus again:

1. `word_freqs`: corpus -> (word, freq) — ONE map-side-combining
   shuffle; 100 TB of text reduces to |vocab_words| rows (~10^7 web-scale,
   hundreds of MB). This is the only corpus-sized computation.
2. merge learning runs on that aggregated table DRIVER-SIDE (a bounded
   collect, the same standard-practice trade as the IVF coarse
   quantizer's sample-trained k-means): each round is an O(|vocab|)
   sequential pass, and a distributed formulation was measured at ~4.4 s
   PER MERGE at any scale (per-round argmax round-trip + Arrow stage +
   cache cycling dominate; the data is dimension-sized after step 1, so
   distributing the loop buys nothing and costs 20 driver barriers for a
   20-merge table). Argmax ties break under a total order (count desc,
   pair lex asc) so the merge table is deterministic.
3. `bpe_segment`: apply the learned merge list map-only to any corpus
   (merges ride into the Arrow stage as a closure) — linear, no shuffle.

The learned merge table is deterministic (no RNG, total-order argmax)
AND SQL-replayable since round 7: `bpe_oracle_sql` /
`bpe_segment_oracle_sql` replay the greedy fold in DuckDB via a
sentinel-string encoding (see their docstrings, including the
chr(31)-free-corpus precondition), so `bpe_merges` and
`bpe_token_counts` are fully oracle-gated; pytest additionally
certifies exact equality of merges AND segmentations against an
independent pure-Python BPE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

N_MERGES = 20
END_OF_WORD = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the one corpus-sized reduction."""
    return (
        docs.select(F.explode(T.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _merge_pair_in_syms(syms: list, a: str, b: str) -> list:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_merges(
    freqs: dict[str, int], n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Sequential merge learning over a word-frequency dict (the
    aggregated, dimension-sized relation — see module docstring).
    Returns [(rank, left, right, pair_count)]; stops early when no pair
    occurs at least twice."""
    words = {w: list(w) + [END_OF_WORD] for w in freqs}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        merges.append((rank, a, b, c))
        words = {w: _merge_pair_in_syms(s, a, b) for w, s in words.items()}
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = N_MERGES,
    min_freq: int = 2,
    max_vocab_words: int = 1_000_000,
) -> DataFrame:
    """Learn `n_merges` merges; returns (rank int, left string,
    right string, pair_count bigint) ordered by rank.

    Distributed corpus reduction -> BOUNDED driver-side optimization.
    The collect is capped two ways (the same documented train-bound
    regime as the IVF/PQ quantizer samples):

    * `min_freq` floor — words below it are dropped before the collect.
      At web scale the raw word vocabulary is hundreds of millions of
      rows, almost all hapax noise; a floor of 2 removes the long tail
      while pair counts lose only freq-1 contributions (each < the
      count-2 merge cutoff on its own).
    * `max_vocab_words` cap — keep the top-K words under the total
      order (freq desc, word asc). Expressed as orderBy+limit, which
      Spark executes as TakeOrderedAndProject: per-partition top-K,
      K-row merge on the driver — never a full-vocab collect.

    Both bounds trim only the lowest-frequency tail, so high-rank
    merges (the ones a bounded merge table contains) are unchanged on
    any corpus whose tail mass sits below the cutoffs —
    test_bpe_train_bounds_preserve_merges pins this on the fixture
    corpus. Pass min_freq=1, max_vocab_words=None for the exact
    unbounded regime on small corpora.
    """
    wf = word_freqs(docs)
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    if max_vocab_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_vocab_words)
    freqs = {r["word"]: r["freq"] for r in wf.collect()}
    merges = learn_merges(freqs, n_merges)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def bpe_oracle_sql(
    n_merges: int = N_MERGES,
    min_freq: int = 2,
    max_vocab_words: int = 1_000_000,
    table: str = "documents",
) -> str:
    """DuckDB replay of `bpe_train` — the greedy merge fold, which was
    rows-only since round 2, IS SQL-expressible once each word's symbol
    list is encoded as a sentinel-delimited string: every symbol is
    wrapped chr(31)+sym+chr(31), so one round's merge of (a, b) is ONE
    left-to-right non-overlapping `replace(enc, ⟨a⟩⟨b⟩, ⟨ab⟩)` — exactly
    the greedy adjacent-pair semantics of `_merge_pair_in_syms` (the
    doubled sentinel between symbols makes consecutive matches share no
    characters, so 'l l l l' merges to 'll ll', not 'll l l'). Each of
    the `n_merges` rounds is 3 CTEs: pair counts (split + unnest),
    argmax under the SAME total order as `learn_merges` (count DESC,
    left ASC, right ASC — both engines compare strings by codepoint),
    and the conditional rewrite (rounds after the <2-count stop carry
    the words through unchanged and emit no merge row). CTEs are
    MATERIALIZED: DuckDB inlines plain CTEs and each round references
    the previous several times — inlining is exponential in rounds.

    PRECONDITION (oracle-only, not an operator limit): the corpus must
    be chr(31)-free. U+001F (unit separator) is NOT whitespace, so a
    token containing it survives the whitespace split and would make
    this sentinel encoding ambiguous — the replay could then diverge
    from `bpe_train`, which handles such words fine (its fold works on
    real symbol lists, not encoded strings). The test fixtures and the
    testdata `documents` table are chr(31)-free, so the oracle is sound
    where it runs; a corpus carrying control characters needs a scrub
    (`text_scrub` strips C0 controls) before this replay applies."""
    parts = _bpe_merge_cte_parts(n_merges, min_freq, max_vocab_words, table)
    union = " UNION ALL ".join(
        f"SELECT * FROM b{r}" for r in range(n_merges)
    )
    return (
        ",\n".join(parts)
        + '\nSELECT CAST(rank AS INT) AS rank, s1 AS "left", '
        's2 AS "right", CAST(c AS BIGINT) AS pair_count '
        f"FROM ({union}) ORDER BY rank"
    )


_D = "chr(31)"
_DD = f"{_D}||{_D}"


def _sql_word_enc(word_expr: str) -> str:
    """Sentinel-delimited symbol encoding of a word: chars + END_OF_WORD,
    each wrapped chr(31)+sym+chr(31)."""
    return (
        f"array_to_string(list_transform("
        f"list_append(list_transform(range(1, length({word_expr}) + 1), "
        f"i -> substr({word_expr}, CAST(i AS INT), 1)), '{END_OF_WORD}'), "
        f"s -> {_D} || s || {_D}), '')"
    )


def _bpe_merge_cte_parts(
    n_merges: int, min_freq: int, max_vocab_words: int, table: str
) -> list[str]:
    """The merge-learning CTE chain; final merges live in b0..b{n-1}."""
    toks = "list_filter(str_split(text, ' '), x -> x <> '')"
    parts = [
        f"WITH wf AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) "
        f"AS freq FROM (SELECT unnest({toks}) AS word FROM {table}) "
        f"GROUP BY word)",
        f"wfb AS MATERIALIZED (SELECT word, freq FROM wf "
        f"WHERE freq >= {min_freq} "
        f"ORDER BY freq DESC, word LIMIT {max_vocab_words})",
        f"w0 AS MATERIALIZED (SELECT freq, {_sql_word_enc('word')} AS enc "
        f"FROM wfb)",
    ]
    for r in range(n_merges):
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT s1, s2, SUM(freq) AS c FROM ("
            f"SELECT freq, syms[CAST(i AS INT)] AS s1, "
            f"syms[CAST(i AS INT) + 1] AS s2 FROM "
            f"(SELECT freq, str_split(substr(enc, 2, length(enc) - 2), "
            f"{_DD}) AS syms FROM w{r}) t, "
            f"UNNEST(range(1, len(syms))) AS u(i)) GROUP BY s1, s2)"
        )
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT {r} AS rank, s1, s2, c FROM p{r} "
            f"WHERE c >= 2 ORDER BY c DESC, s1, s2 LIMIT 1)"
        )
        parts.append(
            f"w{r + 1} AS MATERIALIZED (SELECT freq, "
            f"CASE WHEN EXISTS (SELECT 1 FROM b{r}) THEN "
            f"replace(enc, (SELECT {_D}||s1||{_DD}||s2||{_D} FROM b{r}), "
            f"(SELECT {_D}||s1||s2||{_D} FROM b{r})) ELSE enc END AS enc "
            f"FROM w{r})"
        )
    return parts


def bpe_segment_oracle_sql(
    n_merges: int = N_MERGES,
    min_freq: int = 2,
    max_vocab_words: int = 1_000_000,
    table: str = "documents",
) -> str:
    """DuckDB replay of the train-then-apply query (`bpe_token_counts`):
    the merge chain above, then every DISTINCT corpus word is encoded and
    folded through the learned merges IN RANK ORDER (one replace per
    merge — same greedy semantics as `_merge_pair_in_syms`, including
    words the min_freq training floor excluded: segmentation applies to
    ALL words), then per-doc token counts = sum of each occurrence's
    symbol count. Docs with no tokens keep an explicit 0 via the left
    join. Same chr(31)-free-corpus PRECONDITION as `bpe_oracle_sql` —
    and it binds harder here, because segmentation encodes EVERY
    distinct corpus word, not just the training vocabulary."""
    toks = "list_filter(str_split(text, ' '), x -> x <> '')"
    parts = _bpe_merge_cte_parts(n_merges, min_freq, max_vocab_words, table)
    parts.append(
        f"occ AS MATERIALIZED (SELECT doc_id, unnest({toks}) AS word "
        f"FROM {table})"
    )
    parts.append(
        f"seg0 AS MATERIALIZED (SELECT word, {_sql_word_enc('word')} AS enc "
        f"FROM (SELECT DISTINCT word FROM occ))"
    )
    for r in range(n_merges):
        parts.append(
            f"seg{r + 1} AS MATERIALIZED (SELECT word, "
            f"CASE WHEN EXISTS (SELECT 1 FROM b{r}) THEN "
            f"replace(enc, (SELECT {_D}||s1||{_DD}||s2||{_D} FROM b{r}), "
            f"(SELECT {_D}||s1||s2||{_D} FROM b{r})) ELSE enc END AS enc "
            f"FROM seg{r})"
        )
    parts.append(
        f"wl AS MATERIALIZED (SELECT word, len(str_split("
        f"substr(enc, 2, length(enc) - 2), {_DD})) AS n_syms "
        f"FROM seg{n_merges})"
    )
    parts.append(
        "per_doc AS (SELECT occ.doc_id, SUM(wl.n_syms) AS n "
        "FROM occ JOIN wl USING (word) GROUP BY occ.doc_id)"
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT d.doc_id, CAST(COALESCE(p.n, 0) AS BIGINT) "
        f"AS n_bpe_tokens FROM {table} d LEFT JOIN per_doc p USING (doc_id)"
    )


def bpe_segment(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize with a learned merge list: map-only (the merge list rides
    into the Arrow stage as a closure — the broadcast-variable pattern
    without needing one at this size). Returns (doc_id, n_bpe_tokens,
    tokens array<string>)."""
    ordered = list(merges)

    def seg(batches):
        # word-level memo across the worker's batches: natural text
        # repeats its vocabulary constantly, so each DISTINCT word runs
        # the merge fold once instead of once per occurrence (Zipf makes
        # this a ~10x cut in merge work; deterministic — the
        # segmentation of a word is occurrence-independent)
        memo: dict = {}

        def segment_word(w):
            syms = memo.get(w)
            if syms is None:
                syms = list(w) + [END_OF_WORD]
                for a, b in ordered:
                    if len(syms) < 2:
                        break
                    syms = _merge_pair_in_syms(syms, a, b)
                memo[w] = syms
            return syms

        for pdf in batches:
            out_tokens, out_counts = [], []
            for text in pdf["text"]:
                toks = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    toks.extend(segment_word(w))
                out_tokens.append(toks)
                out_counts.append(len(toks))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bpe_tokens": pd.Series(out_counts, dtype="int64"),
                    "tokens": out_tokens,
                }
            )

    # the closure references the module-level _merge_pair_in_syms BY
    # REFERENCE (cloudpickle): workers that can't import the package
    # crash deserializing the UDF without shipping it — the same rule
    # every other mapInPandas site here follows
    from ..session import ship_package

    ship_package(docs.sparkSession)
    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        seg, "doc_id bigint, n_bpe_tokens bigint, tokens array<string>"
    )
