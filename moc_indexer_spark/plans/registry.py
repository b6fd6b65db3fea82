"""Query registry: one entry per implemented operator from SURVEY.md §2.

Each QuerySpec pairs a PySpark builder `(spark, sf_dir) -> DataFrame` with an
equivalent ANSI-SQL oracle for DuckDB. Builders and oracles are defined
side-by-side so output column names/types stay identical (the driver's
compare hashes values after sorting columns by name).

Cross-engine determinism rules (every entry follows them):
- Output columns are only bigint / int / double / string / timestamp / date /
  boolean. Money math runs in exact DecimalType internally and is cast to
  double at the edge — bit-identical in Spark and DuckDB.
- Every order-sensitive op (pagination, top-k, as-of) orders by a total order
  (explicit tiebreakers).
- Double arithmetic appears only as identical single expressions on both
  sides (same operand order), never as order-dependent aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import TRANSACTIONS_CTE, table, transactions
from ..operators import relational as R

# --- shared parameters (mirror reference config) ---------------------------

# bp_user_operations.py:35 excluded_events; stand-in event vocabulary
EXCLUDED_EVENTS = ("error",)
TX_USER = 7  # address filter (bp_user_operations.py:34)
PAGE_LIMIT = 20  # lib_tools.py:55-61 pagination
PAGE_SKIP = 20
ASOF_CUTOFF = "2024-01-15 00:00:00"  # as-of lookup point (J3)
REPORT_CUTOFF = "2024-01-20 00:00:00"  # report height analog (historical.py:123)
ACTIVE_EVENTS = ("purchase", "signup")  # $match events-in-list (historical.py:150)
CONFIRM_BLOCKS = 10  # settings-moc-mainnet2.json:19
BLOCK_SECONDS = 30  # RSK block cadence (SURVEY.md §6)


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    tags: tuple = ()
    bench: bool = False  # include in bench.py headline set


_REGISTRY: list[QuerySpec] = []


def register(name, oracle, tags=(), bench=False):
    def deco(fn):
        _REGISTRY.append(QuerySpec(name, fn, oracle, tuple(tags), bench))
        return fn

    return deco


# The driver's correctness gate evaluates the FIRST 50 registered queries.
# This explicit window curates those slots: every entry is oracle-gated.
#
# Round 8 started the AGE-BASED RE-CERTIFICATION ROTATION (the round-7
# backlog retirement made this the window's steady-state job): slots go
# to the oracle-gated queries whose last green driver CORRECTNESS row is
# OLDEST, because the code under a 6-round-old row has been refactored
# many times since its hash last ran under the driver. The order is
# computed from CORRECTNESS_r01..r08 (last green round per query,
# ascending; name ascending within a round — deterministic and
# reproducible; see COVERAGE.md "Driver-window rotation" for the
# procedure and the full queue; `scripts/rotation_queue.py --check`
# recomputes it and tests/test_rotation_queue.py enforces it). This
# round-11 window (computed by rotation_queue.py over r01..r10): the 16
# r7-resident queue heads by name + 34 r8 residents — the round-10
# window's 50 all hold fresh green r10 rows and rotate to the queue
# tail. Newly oracle-gated queries, when a round adds any, take slots
# ahead of the age queue. The queries rotated OUT stay oracle-gated
# right behind the window — the builder mirror, the sf0.1 sweep and
# judge re-checks keep exercising them.
_DRIVER_WINDOW = [
    "source_quota_sample", "source_temperature_sample", "stratified_sample", "text_scrub",
    "tfidf_top_terms", "token_entropy", "training_shards", "tx_enrich_money",
    "tx_list", "unigram_logprob", "unregistered_user_txs", "user_running_total",
    "user_sessions", "value_histogram", "value_zscore_outliers", "vocab_coverage",
    "abi_decode_roundtrip", "activity_heatmap", "api_tx_list_formatted", "block_gap_report",
    "bm25_topk", "bool_coercion", "bpe_token_counts", "classifier_auc",
    "cms_trigram_estimates", "confirming_status", "cosine_topk", "decile_share",
    "dedup_clusters", "dedup_exact", "dedup_report", "distinct_active_addresses",
    "doc_fingerprint", "doc_winnowing", "dsir_importance_weights", "embedding_dup_pairs",
    "embedding_norms", "event_journeys", "event_pipeline_raw_hex", "event_transitions",
    "first_touch_attribution", "heldout_perplexity", "histogram_quantiles_certified", "hll_distinct_certified",
    "hourly_window_agg", "ivf_ann_exact", "ivfpq_ann_exact", "json_result_envelope",
    "kmv_distinct_sketch", "kneser_ney_logprob",
]


def registry() -> list[QuerySpec]:
    # side-effect registration
    from . import (  # noqa: F401
        llm_registry,
        misc_registry,
        ml_registry,
        pipeline_registry,
        quality_registry,
        relational_extra,
        serving_registry,
        tpch_more,
    )

    by_name = {s.name: s for s in _REGISTRY}
    window = set(_DRIVER_WINDOW)
    missing = window - set(by_name)
    if missing:  # fail loudly in tests, never silently shrink the window
        raise RuntimeError(f"driver window names not registered: {missing}")
    head = [by_name[n] for n in _DRIVER_WINDOW]
    rest = [s for s in _REGISTRY if s.name not in window]
    return (
        head
        + [s for s in rest if s.oracle]
        + [s for s in rest if not s.oracle]
    )


def _tx(spark, sf_dir):
    return transactions(spark, sf_dir)


TX_WITH = f"WITH transactions AS ({TRANSACTIONS_CTE})"

# --- tx-list family (P2 P3 P4 P5 O1 A2; bp_user_operations.py:9-93) --------

_excl = ", ".join(f"'{e}'" for e in EXCLUDED_EVENTS)
_TX_LIST_FILTER_SQL = f"address = {TX_USER} AND event NOT IN ({_excl})"


def _tx_list_filtered(spark, sf_dir):
    t = _tx(spark, sf_dir)
    return t.filter(
        (F.col("address") == TX_USER) & (~F.col("event").isin(*EXCLUDED_EVENTS))
    )


@register(
    "tx_list",
    f"""
    {TX_WITH},
    f AS (SELECT * FROM transactions WHERE {_TX_LIST_FILTER_SQL}),
    w AS (SELECT tx_hash, address, event, created_at, amount,
                 ROW_NUMBER() OVER (ORDER BY created_at DESC, tx_hash DESC) AS rn
          FROM f)
    SELECT * FROM w WHERE rn > {PAGE_SKIP} AND rn <= {PAGE_SKIP + PAGE_LIMIT}
    """,
    tags=("P2", "P3", "P4", "P5", "O1"),
    bench=True,
)
def q_tx_list(spark, sf_dir):
    """/transactions/list page 2: filter + not-in + sort desc + skip/limit."""
    f = _tx_list_filtered(spark, sf_dir).select(
        "tx_hash", "address", "event", "created_at", "amount"
    )
    order = [F.desc("created_at"), F.desc("tx_hash")]
    return R.page_top_k(f, order, PAGE_SKIP, PAGE_LIMIT)


@register(
    "tx_list_count",
    f"{TX_WITH} SELECT COUNT(*) AS total FROM transactions WHERE {_TX_LIST_FILTER_SQL}",
    tags=("A2",),
)
def q_tx_list_count(spark, sf_dir):
    """count_documents(filter) for pagination total (bp_user_operations.py:91)."""
    return _tx_list_filtered(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("total")
    )


@register(
    "tx_list_with_total",
    f"""
    {TX_WITH},
    f AS (SELECT * FROM transactions WHERE {_TX_LIST_FILTER_SQL}),
    w AS (SELECT tx_hash, address, event, created_at, amount,
                 ROW_NUMBER() OVER (ORDER BY created_at DESC, tx_hash DESC) AS rn
          FROM f)
    SELECT w.*, (SELECT COUNT(*) FROM f) AS total
    FROM w WHERE rn > {PAGE_SKIP} AND rn <= {PAGE_SKIP + PAGE_LIMIT}
    """,
    tags=("O1", "A2", "window"),
)
def q_tx_list_with_total(spark, sf_dir):
    """Page + total in one result (two Mongo round-trips fused)."""
    f = _tx_list_filtered(spark, sf_dir).select(
        "tx_hash", "address", "event", "created_at", "amount"
    )
    order = [F.desc("created_at"), F.desc("tx_hash")]
    return R.paginate_with_total(f, order, PAGE_SKIP, PAGE_LIMIT)


@register(
    "tx_latest",
    f"""
    {TX_WITH}
    SELECT tx_hash, address, event, created_at, amount
    FROM transactions WHERE address = {TX_USER}
    ORDER BY created_at DESC, tx_hash DESC LIMIT 1
    """,
    tags=("O2",),
)
def q_tx_latest(spark, sf_dir):
    """`find_one(sort=-lastUpdatedAt)` (bp_user_operations.py:124-133)."""
    t = _tx(spark, sf_dir).filter(F.col("address") == TX_USER).select(
        "tx_hash", "address", "event", "created_at", "amount"
    )
    return R.top_1_latest(t, [F.desc("created_at"), F.desc("tx_hash")])


@register(
    "latest_per_address",
    f"""
    {TX_WITH}
    SELECT tx_hash, address, event, created_at, amount FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY address ORDER BY created_at DESC, tx_hash DESC) AS __rn
      FROM transactions) WHERE __rn = 1
    """,
    tags=("J7", "window"),
    bench=True,
)
def q_latest_per_address(spark, sf_dir):
    """Latest-row-per-key singleton (UserState semantics, J7)."""
    t = _tx(spark, sf_dir)
    out = R.latest_per_key(
        t, ["address"], [F.desc("created_at"), F.desc("tx_hash")]
    )
    return out.select("tx_hash", "address", "event", "created_at", "amount")


# --- as-of lookups (J3/J4) -------------------------------------------------


@register(
    "asof_price",
    f"""
    {TX_WITH}
    SELECT tx_hash, created_at, amount FROM transactions
    WHERE event = 'purchase' AND created_at < TIMESTAMP '{ASOF_CUTOFF}'
    ORDER BY created_at DESC, tx_hash DESC LIMIT 1
    """,
    tags=("J3",),
)
def q_asof_price(spark, sf_dir):
    """Last price strictly before a block height/cutoff (scan_moc_state.py:76-81)."""
    t = _tx(spark, sf_dir).filter(F.col("event") == "purchase").select(
        "tx_hash", "created_at", "amount"
    )
    return R.as_of(
        t, "created_at", ASOF_CUTOFF, [F.desc("created_at"), F.desc("tx_hash")]
    )


@register(
    "price_variation_24h",
    f"""
    {TX_WITH},
    prices AS (SELECT tx_hash, created_at, amount FROM transactions WHERE event = 'purchase'),
    tip AS (SELECT MAX(created_at) AS tip_ts FROM prices),
    cur AS (SELECT amount AS current_amount FROM prices
            ORDER BY created_at DESC, tx_hash DESC LIMIT 1),
    old AS (SELECT amount AS asof_amount FROM prices, tip
            WHERE created_at >= DATE_TRUNC('day', tip_ts - INTERVAL 24 HOUR)
              AND created_at < tip_ts - INTERVAL 24 HOUR
            ORDER BY created_at DESC, tx_hash DESC LIMIT 1)
    SELECT current_amount, asof_amount,
           (current_amount - asof_amount) / asof_amount AS variation
    FROM cur, old
    """,
    tags=("J4", "F10", "F11"),
)
def q_price_variation_24h(spark, sf_dir):
    """24h price variation (bp_prices.py:44-60): floor-to-midnight window."""
    prices = _tx(spark, sf_dir).filter(F.col("event") == "purchase").select(
        "tx_hash", "created_at", "amount"
    )
    tip = prices.agg(F.max("created_at").alias("tip_ts"))
    cur = R.top_1_latest(
        prices, [F.desc("created_at"), F.desc("tx_hash")]
    ).select(F.col("amount").alias("current_amount"))
    target = F.col("tip_ts") - F.expr("INTERVAL 24 HOURS")
    old = (
        prices.crossJoin(F.broadcast(tip))
        .filter(
            (F.col("created_at") >= F.date_trunc("day", target))
            & (F.col("created_at") < target)
        )
        .orderBy(F.desc("created_at"), F.desc("tx_hash"))
        .limit(1)
        .select(F.col("amount").alias("asof_amount"))
    )
    return cur.crossJoin(old).withColumn(
        "variation",
        (F.col("current_amount") - F.col("asof_amount")) / F.col("asof_amount"),
    )


# --- report aggregations (A1/A2; report/historical.py:123-236) -------------

_ACTIVE_SQL = (
    f"event IN ('purchase','signup') AND created_at <= TIMESTAMP '{REPORT_CUTOFF}'"
)


@register(
    "active_address_counts",
    f"""
    {TX_WITH}
    SELECT address, COUNT(*) AS tx_count FROM transactions
    WHERE {_ACTIVE_SQL} GROUP BY address
    """,
    tags=("A1",),
    bench=True,
)
def q_active_address_counts(spark, sf_dir):
    """Mongo $match+$group by address (report/historical.py:144-165)."""
    t = _tx(spark, sf_dir)
    return (
        t.filter(
            F.col("event").isin(*ACTIVE_EVENTS)
            & (F.col("created_at") <= F.lit(REPORT_CUTOFF).cast("timestamp"))
        )
        .groupBy("address")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tx_count"))
    )


@register(
    "distinct_active_addresses",
    f"{TX_WITH} SELECT COUNT(DISTINCT address) AS n_addresses "
    f"FROM transactions WHERE {_ACTIVE_SQL}",
    tags=("A1",),
)
def q_distinct_active_addresses(spark, sf_dir):
    t = _tx(spark, sf_dir)
    return t.filter(
        F.col("event").isin(*ACTIVE_EVENTS)
        & (F.col("created_at") <= F.lit(REPORT_CUTOFF).cast("timestamp"))
    ).agg(F.count_distinct("address").cast("bigint").alias("n_addresses"))


# --- status maturation (F15/T2; scan_transaction_status.py:34-46) ----------


@register(
    "confirming_status",
    f"""
    {TX_WITH},
    tip AS (SELECT MAX(created_at) AS tip_ts FROM transactions),
    c AS (SELECT tx_hash, address, created_at,
                 CAST(FLOOR((epoch_us(tip_ts) - epoch_us(created_at)) / {BLOCK_SECONDS * 1_000_000}.0) AS BIGINT)
                   AS confirmations
          FROM transactions, tip WHERE address = {TX_USER})
    SELECT tx_hash, address, created_at, confirmations,
           LEAST(100, confirmations * {100 // CONFIRM_BLOCKS}) AS confirming_percent,
           CASE WHEN confirmations >= {CONFIRM_BLOCKS} THEN 'confirmed'
                ELSE 'confirming' END AS status
    FROM c
    """,
    tags=("F15", "T2"),
)
def q_confirming_status(spark, sf_dir):
    """Block-depth maturation: confirmations→percent→status enum."""
    t = _tx(spark, sf_dir)
    tip = t.agg(F.max("created_at").alias("tip_ts"))
    c = (
        t.filter(F.col("address") == TX_USER)
        .crossJoin(F.broadcast(tip))
        .withColumn(
            "confirmations",
            F.floor(
                (F.unix_micros("tip_ts") - F.unix_micros("created_at"))
                / float(BLOCK_SECONDS * 1_000_000)
            ).cast("bigint"),
        )
    )
    return c.select(
        "tx_hash",
        "address",
        "created_at",
        "confirmations",
        R.confirming_percent(F.col("confirmations"), CONFIRM_BLOCKS).alias(
            "confirming_percent"
        ),
        F.when(F.col("confirmations") >= CONFIRM_BLOCKS, "confirmed")
        .otherwise("confirming")
        .alias("status"),
    )
