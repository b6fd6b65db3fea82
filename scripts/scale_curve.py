#!/usr/bin/env python
"""Measured scaling curve for the top dedup/ANN/retrieval operators.

The 100 TB design claims in PLANS.md are asserted from plan shape
(bucketed candidates, broadcast builds, map-side combines). This script
MEASURES them: it synthesizes 3x and 10x corpora that match the sf0.1
generator's distributions (vocab, length mix, lang/source mix, planted
exact-dup rate, per-label embedding clusters), times each operator at
1x/3x/10x with the bench harness (warm + median-of-3 noop writes), and
fits the log-log slope — the observed scaling exponent. An operator
whose exponent is well above ~1.2 at this contrast is NOT the
O(n)/O(n log n) shape its plan audit claims, however good the plan
looks.

Distribution matching matters: replicating rows 10x would plant
quadratic near-dup clusters and corrupt the dedup exponents with
output-size effects; independent draws from the same generator keep
per-row candidate density comparable across scales.

Usage: python scripts/scale_curve.py [--out /tmp/moc_scale] [--runs 3]
Writes SCALE_CURVE.json next to the repo root and prints a markdown
table (pasted into PLANS.md)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _curve_util import fit_exponent  # noqa: E402

# the 10x corpora need headroom the 8g bench default doesn't have (the
# exact-ngram candidate join alone streams ~430M rows at 10x)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

SF01 = "/root/testdata/sf0.1"

DOC_QUERIES = [
    "dedup_exact", "ngram_dup_pairs", "ngram_dup_pairs_guarded",
    "minhash_dup_pairs", "simhash_pairs",
    "line_dedup_docs", "bm25_topk", "text_stats", "tfidf_top_terms",
    "dsir_importance_weights", "kneser_ney_logprob",
]
EMB_EXTRA = ["semantic_dedup_scaled"]  # O(n)-output SemDeDup scale path
EMB_QUERIES = [
    "cosine_topk", "lsh_ann_topk", "ivf_ann_topk", "pq_ann_topk",
    "ivfpq_ann_topk", "embedding_dup_pairs_lsh",
]


def _corpus_stats():
    """Pull the sf0.1 generator's distributions once via DuckDB."""
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT text, lang, source FROM '{SF01}/documents.parquet'"
    ).df()
    vocab = sorted(
        {w for t in docs["text"] for w in t.split(" ") if w}
    )
    lengths = [len(t.split(" ")) for t in docs["text"]]
    pairs = list(zip(docs["lang"], docs["source"]))
    n_dups = len(docs) - docs["text"].nunique()
    emb = con.sql(
        f"SELECT embedding, label FROM '{SF01}/embeddings.parquet'"
    ).df()
    con.close()
    return vocab, lengths, pairs, n_dups / len(docs), emb


def _gen_documents_body(out_dir, n, rng, lengths, pairs, dup_frac,
                        draw_words) -> None:
    """Shared documents.parquet synthesis: length/lang/source marginals,
    dup planting, and table assembly are identical across vocab variants —
    only `draw_words(rng, length) -> words` differs (sf-matched 31-word
    vocab vs the Zipf-tailed 20k vocab). One body so a planting or schema
    fix can't silently diverge between the corpora."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    lens = rng.choice(lengths, size=n)
    pair_idx = rng.integers(0, len(pairs), size=n)
    texts = [" ".join(draw_words(rng, int(lens[i]))) for i in range(n)]
    # plant the same exact-dup rate as the source corpus; sources are
    # drawn from OUTSIDE the target set so a target can't copy itself or
    # chain through an already-overwritten slot (which undershot dup_frac
    # at small n)
    n_dup = int(round(dup_frac * n))
    targets = rng.choice(n, size=n_dup, replace=False)
    target_set = set(int(t) for t in targets)
    sources = np.array(
        [i for i in range(n) if i not in target_set], dtype=np.int64
    )
    if len(sources) > 0:
        for j in targets:
            texts[int(j)] = texts[int(sources[int(rng.integers(0, len(sources)))])]
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([pairs[i][0] for i in pair_idx]),
        "source": pa.array([pairs[i][1] for i in pair_idx]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=max(1024, n // 32))


def gen_documents(out_dir: str, n: int, seed: int, stats) -> None:
    import numpy as np

    vocab, lengths, pairs, dup_frac, _ = stats
    rng = np.random.default_rng(seed)
    _gen_documents_body(
        out_dir, n, rng, lengths, pairs, dup_frac,
        lambda r, length: r.choice(vocab, size=length),
    )


def gen_embeddings(out_dir: str, n: int, seed: int, stats) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    emb = stats[4]
    rng = np.random.default_rng(seed + 1)
    X = np.array(list(emb["embedding"]), dtype=np.float64)
    labels = emb["label"].to_numpy()
    uniq = np.unique(labels)
    # per-label gaussian fit preserves the cluster structure IVF relies on
    means = {l: X[labels == l].mean(axis=0) for l in uniq}
    stds = {l: X[labels == l].std(axis=0) + 1e-9 for l in uniq}
    new_labels = rng.choice(labels, size=n)
    d = X.shape[1]
    out = np.empty((n, d), dtype=np.float32)
    for l in uniq:
        m = new_labels == l
        out[m] = (means[l] + rng.standard_normal((int(m.sum()), d)) * stds[l]
                  ).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(out), pa.list_(pa.float32())),
        "label": pa.array(new_labels.astype("int32"), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=max(1024, n // 32))


def gen_documents_zipf(out_dir: str, n: int, seed: int, stats) -> None:
    """Zipf-tailed vocab variant (round-5): the sf0.1 generator's 31-word
    vocab makes EVERY shingle a heavy hitter, which saturates the
    inverted-index join (Σdf² grows ~n²) and inverts the PPJoin prefix
    filter — both measured artifacts of the fixture, not the plans. This
    generator keeps the length/lang/source/dup-rate marginals but draws
    words from a 20k-word vocab with Zipf(1.1) frequencies — the natural-
    language shape where most shingles are rare and a prefix filter earns
    its keep."""
    import numpy as np

    _, lengths, pairs, dup_frac, _ = stats
    rng = np.random.default_rng(seed)
    v = 20_000
    vocab = np.array([f"w{i}" for i in range(v)])
    p = 1.0 / np.power(np.arange(1, v + 1), 1.1)
    p /= p.sum()
    _gen_documents_body(
        out_dir, n, rng, lengths, pairs, dup_frac,
        lambda r, length: r.choice(vocab, size=length, p=p),
    )


def build_zipf_corpora(base: str, scales: list[int], seed: int = 7) -> dict[int, str]:
    stats = _corpus_stats()
    dirs = {}
    for s in scales:
        d = os.path.join(base, f"zipf_x{s}")
        marker = os.path.join(d, "_DONE")
        dirs[s] = d
        if os.path.exists(marker):
            continue
        os.makedirs(d, exist_ok=True)
        gen_documents_zipf(d, 5000 * s, seed * 1000 + s, stats)
        open(marker, "w").write("ok")
    return dirs


def build_corpora(base: str, scales: list[int], seed: int = 7) -> dict[int, str]:
    stats = _corpus_stats()
    n_docs0, n_emb0 = 5000, 2000
    dirs = {}
    for s in scales:
        d = os.path.join(base, f"x{s}")
        marker = os.path.join(d, "_DONE")
        dirs[s] = d
        if os.path.exists(marker):
            continue
        os.makedirs(d, exist_ok=True)
        gen_documents(d, n_docs0 * s, seed * 1000 + s, stats)
        gen_embeddings(d, n_emb0 * s, seed * 1000 + s, stats)
        open(marker, "w").write("ok")
    return dirs


def time_query(spark, build, sf_dir: str, runs: int) -> float:
    df = build(spark, sf_dir)
    # two warm runs: Arrow-heavy cogroup operators (the ANN family) showed
    # a 26s -> 6.8s -> 3.2s first-runs ladder at 10x (python-worker fork +
    # page-cache + codegen warmup); a single warm run leaves the median
    # contaminated by the tail of that ladder
    df.write.format("noop").mode("overwrite").save()
    df.write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    ts.sort()
    return round(ts[len(ts) // 2], 3)


def run_lsh_recall(spark, dirs, scales, n_tables_list=(16, 32, 64, 128)):
    """lsh_recall_curve: recall@5 AND wall time of `lsh_bucket_topk` vs
    n_tables at each scale — turning the documented low-recall default
    operating point (0.394 @ 16 tables at 10x, round 6) into a priced
    trade ("recall >= X costs Y") instead of a footnote. Exact baseline
    is one blocked brute-force pass per scale, shared across points.
    IVFADC remains the production ANN; this is the observability record
    for choosing n_tables when LSH is preferred (e.g. no train step)."""
    from moc_indexer_spark.operators import similarity as S
    from moc_indexer_spark.tables import parquet_rows, table

    out: dict = {}
    for s in scales:
        emb = table(spark, dirs[s], "embeddings")
        n = parquet_rows(dirs[s], "embeddings")
        exact = S.brute_force_topk_blocked(emb, k=5).select(
            "query_id", "neighbor_id"
        ).persist()
        try:
            n_pairs = exact.count()
            row = {}
            for nt in n_tables_list:
                df = S.lsh_bucket_topk(emb, k=5, n_tables=nt, n=n)
                df.write.format("noop").mode("overwrite").save()  # warm
                t0 = time.perf_counter()
                hits = df.select("query_id", "neighbor_id").join(
                    exact, ["query_id", "neighbor_id"]
                ).count()
                row[str(nt)] = {
                    "recall_at_5": round(hits / n_pairs, 4),
                    "sec": round(time.perf_counter() - t0, 3),
                }
                print(json.dumps({f"x{s}/tables={nt}": row[str(nt)]}),
                      flush=True)
            out[str(s)] = {"n_vectors": n, "by_tables": row}
        finally:
            exact.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/moc_scale")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--zipf", action="store_true",
                    help="measure on the Zipf-vocab corpora (all three "
                         "scales synthetic) instead of the sf0.1-matched "
                         "ones; results land under zipf_results")
    ap.add_argument("--scales", default="1,3,10",
                    help="comma list of multipliers, e.g. 1,3,10,30")
    ap.add_argument("--lsh-recall", action="store_true",
                    help="measure the LSH recall-vs-n_tables cost curve "
                         "instead of the operator timings")
    args = ap.parse_args()

    from moc_indexer_spark.plans.registry import registry
    from moc_indexer_spark.session import get_spark
    from moc_indexer_spark.tables import enable_layout_mirror

    scales = [int(s) for s in args.scales.split(",")]
    if args.zipf:
        names = (args.queries.split(",") if args.queries else
                 ["ngram_dup_pairs", "ngram_dup_pairs_prefix",
                  "ngram_dup_pairs_guarded", "minhash_dup_pairs"])
        dirs = build_zipf_corpora(args.out, scales)
    else:
        names = (args.queries.split(",") if args.queries
                 else DOC_QUERIES + EMB_QUERIES + EMB_EXTRA)
        dirs = build_corpora(args.out, [s for s in scales if s != 1])
        dirs[1] = SF01

    spark = get_spark(app_name="scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    enable_layout_mirror()

    if args.lsh_recall:
        curve = run_lsh_recall(spark, dirs, scales)
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_CURVE.json",
        )
        doc = {}
        if os.path.exists(out_path):
            with open(out_path) as fh:
                doc = json.load(fh)
        merged = doc.get("lsh_recall_curve", {})
        merged.update(curve)
        doc["lsh_recall_curve"] = merged
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)
        print(json.dumps({"written": out_path}))
        spark.stop()
        return

    by = {s.name: s for s in registry()}
    results: dict[str, dict] = {}
    for name in names:
        spec = by[name]
        row: dict = {"t": {}}
        for s in scales:
            try:
                row["t"][str(s)] = time_query(
                    spark, spec.build, dirs[s], args.runs
                )
            except Exception as e:  # noqa: BLE001
                row["err"] = f"x{s}: " + str(e).splitlines()[0][:150]
                break
        if "err" not in row:
            # least-squares slope on (log s, log t): the observed exponent
            row["exponent"] = fit_exponent(
                scales, [row["t"][str(s)] for s in scales]
            )
            # last/first ratio under FIXED keys: merged JSON docs from
            # targeted --queries/--scales re-runs otherwise accumulate
            # heterogeneous ratio_10x/ratio_30x keys and external readers
            # of one spelling break silently. ratio_scale records which
            # scale the ratio is against.
            row["ratio_last"] = round(
                row["t"][str(scales[-1])]
                / max(row["t"][str(scales[0])], 1e-9), 2
            )
            row["ratio_scale"] = scales[-1]
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CURVE.json",
    )
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            doc = json.load(fh)
    # per-row t-dict keys carry each row's own scales; the global scales
    # field only describes a FULL default-set run — a targeted --queries
    # re-measure must not relabel rows it didn't touch
    full_run = not args.queries
    if args.zipf:
        # merge per-query (same contract as `results` below): a targeted
        # --queries re-measure must not drop the other zipf rows
        zmerged = doc.get("zipf_results", {})
        zmerged.update(results)
        doc["zipf_results"] = zmerged
        doc.setdefault("scales", scales)
    else:
        # merge per-query: a targeted --queries re-measure (e.g. after a
        # probe-default change) must update its rows without dropping the
        # rest of the recorded curve
        merged = doc.get("results", {})
        merged.update(results)
        doc["results"] = merged
        if full_run:
            doc.update({"scales": scales, "runs": args.runs})
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=2)
    cols = " | ".join(f"t({s}x) s" for s in scales)
    print(f"\n| query | {cols} | last/first | exponent |")
    print("|---" * (len(scales) + 3) + "|")
    for name, row in results.items():
        if "err" in row:
            print(f"| {name} | ERR {row['err']} |")
        else:
            t = row["t"]
            ts = " | ".join(str(t[str(s)]) for s in scales)
            print(f"| {name} | {ts} | {row['ratio_last']} | "
                  f"{row['exponent']} |")
    spark.stop()


if __name__ == "__main__":
    main()
