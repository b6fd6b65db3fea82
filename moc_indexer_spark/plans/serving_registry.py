"""Registry batch 4: serving endpoints, set ops, rollup, fan-out join,
sketches — the remaining SURVEY.md §2 line items (F2 hex, F12 ISO, §2.6 set
ops, grouping sets, J6 cross fan-out, A3 report totals) plus HLL sketches.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import serving as SV
from ..tables import table, transactions
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
    "api_price_variation",
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
    tags=("S8", "J4", "api"),
)
def q_api_price_variation(spark, sf_dir):
    """GET /price/variation through the SERVING operator itself
    (operators/serving.py:71 — webservice/bp_prices.py:44-60): the 4th
    API endpoint's production code path, hash-gated like the other three
    (api_db_info, api_pegout_list, api_tx_list_formatted). The semantics
    twin `price_variation_24h` (plans/registry.py) certifies the same
    floor-to-midnight as-of rule built inline; THIS entry pins the
    endpoint module the HTTP shell serves, so a drift inside serving.py
    turns a driver row red, not just an HTTP test."""
    prices = transactions(spark, sf_dir).filter(
        F.col("event") == "purchase"
    ).select("tx_hash", "created_at", "amount")
    return SV.api_price_variation(prices, hours=24)


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
    # distinct EXCEPT says it in one set op (inputs are already distinct)
    return a.subtract(b)


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
    "api_db_info",
    f"""
    {TX_WITH}
    SELECT 'transactions' AS collection, COUNT(*) AS n FROM transactions
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'documents', COUNT(*) FROM documents
    """,
    tags=("S8", "api"),
)
def q_api_db_info(spark, sf_dir):
    """/infoapi database-status payload (webservice/bp_main.py:10-16,
    webservice/database.py get_db_info): per-collection row counts. Each
    COUNT(*) is answered from parquet footer metadata (no data scan) —
    Spark's `LocalLimit`-free count-star optimization — so the endpoint
    stays O(files), not O(rows), at 100 TB."""
    def cnt(name, df):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
            F.lit(name).alias("collection"), "n"
        )

    out = cnt("transactions", transactions(spark, sf_dir))
    for name in ("customer", "orders", "documents"):
        out = out.unionByName(cnt(name, table(spark, sf_dir, name)))
    return out


@register(
    "report_pay_tc_holders",
    f"""
    {TX_WITH},
    h AS (SELECT tx_hash, created_at, amount FROM transactions
          WHERE event = 'signup')
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY created_at, tx_hash) AS BIGINT) AS n,
           tx_hash, CAST(amount / 1e18 AS DOUBLE) AS amount_ether, created_at
    FROM h
    """,
    tags=("O3", "report", "window"),
)
def q_report_pay_tc_holders(spark, sf_dir):
    """Interest-payment history report (report/historical.py:238-260): the
    ordered full scan of BitProHoldersInterest with a running row count and
    wei->ether display division. The count column is ROW_NUMBER over the
    report's sort order — the declarative form of the reference's cursor
    `count += 1` loop. Total order (created_at, tx_hash) keeps it
    deterministic; a console report is inherently single-sink so the
    unpartitioned window is the intended plan."""
    t = transactions(spark, sf_dir)
    h = t.filter(F.col("event") == "signup").select(
        "tx_hash", "created_at", "amount"
    )
    w = Window.orderBy("created_at", "tx_hash")
    return h.select(
        F.row_number().over(w).cast("bigint").alias("n"),
        "tx_hash",
        (F.col("amount") / F.lit(1e18)).cast("double").alias("amount_ether"),
        "created_at",
    )


# report/historical.py:11-20 OPERATIONS_TRANSLATE analog for the stand-in
# event vocabulary (F16: name-translation map literal).
REPORT_EVENTS = ("purchase", "signup", "view")
_TRANSLATE = {"purchase": "Mint", "signup": "Register", "view": "View"}
REPORT_LOOKBACK_DAYS = 15  # HISTORIC_BLOCK_HEIGHT_AMOUNT = 43,200 blocks = 15 d


@register(
    "report_last_transactions",
    f"""
    {TX_WITH},
    tip AS (SELECT MAX(created_at) AS tip_ts FROM transactions),
    f AS (SELECT t.tx_hash, t.address, t.event, t.created_at, t.amount
          FROM transactions t, tip
          WHERE t.event IN ('purchase','signup','view')
            AND t.created_at >= tip_ts - INTERVAL {REPORT_LOOKBACK_DAYS} DAY)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY created_at, tx_hash) AS BIGINT) AS n,
           tx_hash, address,
           CASE event WHEN 'purchase' THEN 'Mint'
                      WHEN 'signup' THEN 'Register'
                      ELSE 'View' END AS operation,
           CAST(amount / 1e18 AS DOUBLE) AS amount_ether,
           created_at
    FROM f
    """,
    tags=("report", "F16", "F11", "J7"),
)
def q_report_last_transactions(spark, sf_dir):
    """Last-transactions report (report/historical.py:262-325): latest
    snapshot height (here MAX(created_at), the J7 singleton) minus the
    15-day lookback, event IN-list filter, operation-name translation map
    (F16), wei->ether display division, running count. The tip scalar is a
    1-row broadcast so the big side never shuffles for it."""
    t = transactions(spark, sf_dir)
    tip = t.agg(F.max("created_at").alias("tip_ts"))
    translate = F.create_map(
        *[F.lit(x) for kv in _TRANSLATE.items() for x in kv]
    )
    f = (
        t.filter(F.col("event").isin(*REPORT_EVENTS))
        .crossJoin(F.broadcast(tip))
        .filter(
            F.col("created_at")
            >= F.col("tip_ts") - F.expr(f"INTERVAL {REPORT_LOOKBACK_DAYS} DAYS")
        )
    )
    w = Window.orderBy("created_at", "tx_hash")
    return f.select(
        F.row_number().over(w).cast("bigint").alias("n"),
        "tx_hash",
        "address",
        F.element_at(translate, F.col("event")).alias("operation"),
        (F.col("amount") / F.lit(1e18)).cast("double").alias("amount_ether"),
        "created_at",
    )


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
    FROM l WHERE prev IS NOT NULL AND prev <> 0
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
        # a prev of exactly 0 occurs in the sf0.1 series: ANSI Spark would
        # throw DIVIDE_BY_ZERO while DuckDB yields inf — exclude the row in
        # both engines so the delta is defined everywhere
        .filter(F.col("prev").isNotNull() & (F.col("prev") != 0))
        .withColumn(
            "change_pct", (F.col("amount") - F.col("prev")) / F.col("prev")
        )
    )


@register("approx_distinct_users", None, tags=("sketch",))
def q_approx_distinct_users(spark, sf_dir):
    """HLL++ sketch distinct count (rows-only: sketch estimates are
    engine-specific; the exact variant is oracle-checked in
    distinct_active_addresses and the portable-register sibling
    `hll_distinct_certified` hash-gates the full HLL estimate path). At
    100 TB this replaces exact distinct — mergeable partial sketches, no
    giant shuffle."""
    t = transactions(spark, sf_dir)
    return t.agg(
        F.approx_count_distinct("address", rsd=0.01).alias("approx_addresses")
    )


@register(
    "api_pegout_list",
    f"""
    {TX_WITH},
    fastbtc AS (
      SELECT tx_hash AS transfer_id, CAST(address AS VARCHAR) AS rsk_address,
             CAST(tx_hash % 5 AS INTEGER) AS status, created_at AS updated,
             amount
      FROM transactions WHERE event = 'purchase')
    SELECT transfer_id, rsk_address, status, updated, amount,
           CASE status WHEN 0 THEN 'NOT_STARTED' WHEN 1 THEN 'SENDING'
                WHEN 2 THEN 'MINED' WHEN 3 THEN 'REFUNDED'
                WHEN 4 THEN 'RECLAIMED' END AS status_name
    FROM fastbtc WHERE rsk_address = '{TX_USER}'
    """,
    tags=("api", "F13"),
)
def q_api_pegout_list(spark, sf_dir):
    """GET /fastbtc/pegout (bp_fastbtc_bridge.py:20-40) over a
    fastbtc-shaped view derived from the events fixture (transferId,
    rskAddress, status enum, updated): per-address filter + status-name
    decode via a map literal — the 4th and last API endpoint, oracle-gated
    like the other three."""
    t = transactions(spark, sf_dir).filter(F.col("event") == "purchase")
    fastbtc = t.select(
        F.col("tx_hash").alias("transfer_id"),
        F.col("address").cast("string").alias("rsk_address"),
        (F.col("tx_hash") % 5).cast("int").alias("status"),
        F.col("created_at").alias("updated"),
        "amount",
    )
    status_names = F.create_map(
        F.lit(0), F.lit("NOT_STARTED"), F.lit(1), F.lit("SENDING"),
        F.lit(2), F.lit("MINED"), F.lit(3), F.lit("REFUNDED"),
        F.lit(4), F.lit("RECLAIMED"),
    )
    return fastbtc.filter(F.col("rsk_address") == str(TX_USER)).withColumn(
        "status_name", F.element_at(status_names, F.col("status"))
    )
