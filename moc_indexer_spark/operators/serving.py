"""Serving-layer query templates: the reference's 4 API endpoints + report
CLI re-expressed as parameterized DataFrame functions (SURVEY.md §3.2-3.3).

Reference:
- /transactions/list, /transactions/last  bp_user_operations.py:9-133
- /price/current, /price/variation        bp_prices.py:22-60
- /fastbtc/pegout                         bp_fastbtc_bridge.py:20-40
- report CLI                              report/historical.py:85-236

These run over the serving tables (here the events-derived `transactions`
view; in production the upsert-sink outputs). Formatting (ISO dates, hex)
happens here at the edge — never inside the engine (F2/F12,
lib_tools.py:20-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import transactions
from . import relational as R

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def api_tx_list(
    t: DataFrame,
    address,
    excluded_events: tuple[str, ...] = (),
    skip: int = 0,
    limit: int = 20,
) -> DataFrame:
    """GET /transactions/list — filter, not-in, sort desc, paginate, with
    edge formatting (ISO timestamps, hex operation id)."""
    f = t.filter(F.col("address") == address)
    if excluded_events:
        f = f.filter(~F.col("event").isin(*excluded_events))
    page = R.page_top_k(
        f.select("tx_hash", "address", "event", "created_at", "amount"),
        [F.desc("created_at"), F.desc("tx_hash")],
        skip,
        limit,
    )
    return page.select(
        "tx_hash",
        F.hex(F.col("tx_hash")).alias("tx_hash_hex"),
        "address",
        "event",
        F.date_format("created_at", ISO_FMT).alias("created_at_iso"),
        "amount",
        "rn",
    )


def api_tx_last(t: DataFrame, address) -> DataFrame:
    """GET /transactions/last."""
    return R.top_1_latest(
        t.filter(F.col("address") == address).select(
            "tx_hash", "address", "event", "created_at", "amount"
        ),
        [F.desc("created_at"), F.desc("tx_hash")],
    )


def api_price_current(prices: DataFrame) -> DataFrame:
    """GET /price/current — latest price row."""
    return R.top_1_latest(prices, [F.desc("created_at"), F.desc("tx_hash")])


def api_price_variation(prices: DataFrame, hours: int = 24) -> DataFrame:
    """GET /price/variation — now vs floor-to-midnight-bounded as-of."""
    tip = prices.agg(F.max("created_at").alias("tip_ts"))
    target = F.col("tip_ts") - F.expr(f"INTERVAL {hours} HOURS")
    cur = api_price_current(prices).select(F.col("amount").alias("current_amount"))
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


def api_pegout_list(fastbtc: DataFrame, rsk_address: str) -> DataFrame:
    """GET /fastbtc/pegout (bp_fastbtc_bridge.py:20-40): transfers for one
    rsk address, newest first, status decoded."""
    from .events import FASTBTC_STATUS

    # ONE source of truth for the bridge status names (events.py owns the
    # decode-side mapping): a new bridge status added there must surface
    # here too, not silently render NULL
    status_names = F.create_map(
        *[x for code, name in sorted(FASTBTC_STATUS.items())
          for x in (F.lit(code), F.lit(name))]
    )
    return (
        fastbtc.filter(F.lower(F.col("rskAddress")) == rsk_address.lower())
        .orderBy(F.desc("updated"), F.desc("transferId"))
        .withColumn(
            "statusName", F.element_at(status_names, F.col("status").cast("int"))
        )
    )


def report_summary(spark: SparkSession, sf_dir: str, cutoff: str) -> DataFrame:
    """Report CLI (report/historical.py:85-236): tx count + distinct active
    addresses + TVL-ish total at a height cutoff, in one row."""
    t = transactions(spark, sf_dir)
    upto = t.filter(F.col("created_at") <= F.lit(cutoff).cast("timestamp"))
    return upto.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_operations"),
        F.count_distinct("address").cast("bigint").alias("n_addresses"),
        F.sum(F.col("amount").cast("decimal(18,6)"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("total_value"),
    )
