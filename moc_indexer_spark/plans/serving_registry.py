"""Registry batch 4: serving endpoints, set ops, rollup, fan-out join,
sketches — the remaining SURVEY.md §2 line items (F2 hex, F12 ISO, §2.6 set
ops, grouping sets, J6 cross fan-out, A3 report totals) plus HLL sketches.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import serving as SV
from ..tables import TRANSACTIONS_CTE, table, transactions
from .registry import EXCLUDED_EVENTS, REPORT_CUTOFF, TX_USER, TX_WITH, register


@register(
    "api_tx_list_formatted",
    f"""
    {TX_WITH},
    f AS (SELECT * FROM transactions
          WHERE address = {TX_USER} AND event NOT IN ('error')),
    w AS (SELECT tx_hash, address, event, created_at, amount,
                 ROW_NUMBER() OVER (ORDER BY created_at DESC, tx_hash DESC) AS rn
          FROM f)
    SELECT tx_hash, to_hex(tx_hash) AS tx_hash_hex, address, event,
           strftime(created_at, '%Y-%m-%dT%H:%M:%S.%gZ') AS created_at_iso,
           amount, rn
    FROM w WHERE rn <= 20
    """,
    tags=("F2", "F12", "api"),
)
def q_api_tx_list_formatted(spark, sf_dir):
    """/transactions/list with edge formatting: hex id + ISO-8601 millis."""
    return SV.api_tx_list(
        transactions(spark, sf_dir), TX_USER, EXCLUDED_EVENTS, skip=0, limit=20
    )


@register(
    "users_purchase_and_signup",
    f"""
    {TX_WITH}
    SELECT DISTINCT address FROM transactions WHERE event = 'purchase'
    INTERSECT
    SELECT DISTINCT address FROM transactions WHERE event = 'signup'
    """,
    tags=("setop",),
)
def q_users_purchase_and_signup(spark, sf_dir):
    """§2.6: INTERSECT of user sets (absent in the reference; Spark-native)."""
    t = transactions(spark, sf_dir)
    a = t.filter(F.col("event") == "purchase").select("address").distinct()
    b = t.filter(F.col("event") == "signup").select("address").distinct()
    return a.intersect(b)


@register(
    "users_purchase_never_error",
    f"""
    {TX_WITH}
    SELECT DISTINCT address FROM transactions WHERE event = 'purchase'
    EXCEPT
    SELECT DISTINCT address FROM transactions WHERE event = 'error'
    """,
    tags=("setop",),
)
def q_users_purchase_never_error(spark, sf_dir):
    t = transactions(spark, sf_dir)
    a = t.filter(F.col("event") == "purchase").select("address").distinct()
    b = t.filter(F.col("event") == "error").select("address").distinct()
    return a.exceptAll(b).distinct()


@register(
    "event_rollup",
    f"""
    {TX_WITH}
    SELECT CAST(CAST(created_at AS DATE) AS VARCHAR) AS day, event,
           COUNT(*) AS n
    FROM transactions
    GROUP BY ROLLUP(CAST(CAST(created_at AS DATE) AS VARCHAR), event)
    """,
    tags=("rollup", "agg"),
)
def q_event_rollup(spark, sf_dir):
    """Grouping-sets rollup (free in Spark; absent in the reference —
    SURVEY.md §2.4 note)."""
    t = transactions(spark, sf_dir)
    return (
        t.select(F.to_date("created_at").cast("string").alias("day"), "event")
        .rollup("day", "event")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "liquidation_fanout",
    f"""
    {TX_WITH},
    trigger_ev AS (
      SELECT amount AS liq_price FROM transactions WHERE event = 'error'
      ORDER BY created_at DESC, tx_hash DESC LIMIT 1)
    SELECT c.c_custkey AS address,
           CAST(CAST(c.c_acctbal AS DECIMAL(24,6)) * CAST(t.liq_price AS DECIMAL(12,6)) AS DOUBLE)
             AS usd_value
    FROM customer c CROSS JOIN trigger_ev t
    WHERE c.c_acctbal > 0
    """,
    tags=("J6", "fanout"),
)
def q_liquidation_fanout(spark, sf_dir):
    """J6 deleveraging fan-out (mocsettlement.py:280-368): one trigger event
    x every holder with balance > 0 -> one valuation row each. The trigger
    side is broadcast; holders never shuffle."""
    t = transactions(spark, sf_dir)
    trigger = (
        t.filter(F.col("event") == "error")
        .orderBy(F.desc("created_at"), F.desc("tx_hash"))
        .limit(1)
        .select(F.col("amount").alias("liq_price"))
    )
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return c.crossJoin(F.broadcast(trigger)).select(
        F.col("c_custkey").alias("address"),
        (
            F.col("c_acctbal").cast("decimal(24,6)")
            * F.col("liq_price").cast("decimal(12,6)")
        )
        .cast("double")
        .alias("usd_value"),
    )


@register(
    "report_summary",
    f"""
    {TX_WITH}
    SELECT COUNT(*) AS n_operations,
           COUNT(DISTINCT address) AS n_addresses,
           CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE)
             AS total_value
    FROM transactions WHERE created_at <= TIMESTAMP '{REPORT_CUTOFF}'
    """,
    tags=("A2", "A3", "report"),
)
def q_report_summary(spark, sf_dir):
    """Report CLI roll-up: operations count + distinct addresses + total
    value at a height cutoff (report/historical.py:107-165)."""
    return SV.report_summary(spark, sf_dir, REPORT_CUTOFF)


@register(
    "price_lag_change",
    f"""
    {TX_WITH},
    p AS (SELECT tx_hash, created_at, amount FROM transactions
          WHERE event = 'purchase'),
    l AS (SELECT *, LAG(amount) OVER (ORDER BY created_at, tx_hash) AS prev
          FROM p)
    SELECT tx_hash, created_at, amount, prev,
           (amount - prev) / prev AS change_pct
    FROM l WHERE prev IS NOT NULL
    """,
    tags=("window", "F17"),
)
def q_price_lag_change(spark, sf_dir):
    """Price-series delta via LAG (the priceVariation computation shape,
    scan_moc_state.py:76-103)."""
    t = transactions(spark, sf_dir)
    p = t.filter(F.col("event") == "purchase").select(
        "tx_hash", "created_at", "amount"
    )
    w = Window.orderBy("created_at", "tx_hash")
    return (
        p.withColumn("prev", F.lag("amount").over(w))
        .filter(F.col("prev").isNotNull())
        .withColumn(
            "change_pct", (F.col("amount") - F.col("prev")) / F.col("prev")
        )
    )


@register("approx_distinct_users", None, tags=("sketch",))
def q_approx_distinct_users(spark, sf_dir):
    """HLL++ sketch distinct count (rows-only: sketch estimates are
    engine-specific; the exact variant is oracle-checked in
    distinct_active_addresses). At 100 TB this replaces exact distinct —
    mergeable partial sketches, no giant shuffle."""
    t = transactions(spark, sf_dir)
    return t.agg(
        F.approx_count_distinct("address", rsd=0.01).alias("approx_addresses")
    )
