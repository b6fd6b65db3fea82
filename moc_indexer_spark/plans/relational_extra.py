"""Registry batch 2: joins, decimal enrichment, windows, rollups.

Covers SURVEY.md §2 items: J1/J2-analog demux, J5 conditional-override join,
P1/P8 semi-join, anti-join (reprocess-filter analog), F3-F7 decimal money
math, F10-F13 date/map functions, §2.8 window functions, A1/A2 group-bys,
plus TPC-H-style join/agg queries exercising the same primitives at shuffle
scale.

Determinism: all money aggregates are exact DecimalType sums cast to double
at the edge; double division happens once on identical operands in both
engines; every top-k has a total-order tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import relational as R2
from ..tables import table, transactions
from .registry import TX_WITH, register

D186 = "decimal(18,6)"
# Multiplication operand widths: DuckDB does decimal multiply in the widest
# input's physical type (int64 for width<=18 -> overflow); a >=19-width left
# operand forces hugeint. (24,6)*(12,6) is exact in both engines.
DMUL_L = "decimal(24,6)"
DMUL_R = "decimal(12,6)"


# --- decimal enrichment (F3-F7; events/mocexchange.py:42-89) ---------------


@register(
    "tx_enrich_money",
    """
    SELECT l.l_orderkey AS orderkey, l.l_linenumber AS linenumber,
      CAST(CAST(CAST(l.l_extendedprice AS DECIMAL(24,6)) * CAST(p.p_retailprice AS DECIMAL(12,6)) AS DECIMAL(18,4)) AS DOUBLE) AS usd_amount,
      CAST(CAST(CAST(l.l_extendedprice AS DECIMAL(24,6)) * CAST(l.l_discount AS DECIMAL(12,6)) AS DECIMAL(18,4)) AS DOUBLE) AS commission,
      CAST(CAST(CAST(l.l_tax AS DECIMAL(24,6)) * CAST(p.p_retailprice AS DECIMAL(12,6)) AS DECIMAL(18,4)) AS DOUBLE) AS gas_fee_usd,
      CAST(CAST(CASE WHEN l.l_returnflag = 'R'
            THEN -(CAST(l.l_extendedprice AS DECIMAL(24,6)) - CAST(l.l_extendedprice AS DECIMAL(24,6)) * CAST(l.l_discount AS DECIMAL(12,6)))
            ELSE  (CAST(l.l_extendedprice AS DECIMAL(24,6)) - CAST(l.l_extendedprice AS DECIMAL(24,6)) * CAST(l.l_discount AS DECIMAL(12,6)))
       END AS DECIMAL(18,4)) AS DOUBLE) AS signed_total,
      (l.l_returnflag <> 'R') AS is_positive
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tags=("F3", "F4", "F6", "F7", "J1"),
    bench=True,
)
def q_tx_enrich_money(spark, sf_dir):
    """The mocexchange derived-column formulas (USD amount, commission, gas
    fee, signed total) as exact decimal expressions over a broadcast join —
    part is the small dim side, lineitem never shuffles."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    ext = F.col("l_extendedprice").cast(DMUL_L)
    price = F.col("p_retailprice").cast(DMUL_R)
    disc = F.col("l_discount").cast(DMUL_R)
    tax = F.col("l_tax").cast(DMUL_L)
    net = ext - ext * disc
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            (ext * price).cast("decimal(18,4)").cast("double").alias("usd_amount"),
            (ext * disc).cast("decimal(18,4)").cast("double").alias("commission"),
            (tax * price).cast("decimal(18,4)").cast("double").alias("gas_fee_usd"),
            F.when(F.col("l_returnflag") == "R", -net)
            .otherwise(net)
            .cast("decimal(18,4)")
            .cast("double")
            .alias("signed_total"),
            (F.col("l_returnflag") != "R").alias("is_positive"),
        )
    )


# --- pricing summary (A-family aggregate; TPC-H Q1 shape) ------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6)) * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(12,6))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A2", "agg"),
    bench=True,
)
def q_pricing_summary(spark, sf_dir):
    """Partial-agg (map-side combine) group-by with exact decimal sums.
    Catalyst plans HashAggregate(partial)->shuffle->HashAggregate(final):
    the shuffle carries one row per (flag,status,partition), not the table."""
    l = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(D186)
    ext = F.col("l_extendedprice").cast(D186)
    ext_l = F.col("l_extendedprice").cast(DMUL_L)
    one_minus_disc = (F.lit(1.0).cast("double") - F.col("l_discount")).cast(DMUL_R)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(18,4)").cast("double").alias("sum_qty"),
            F.sum(ext).cast("decimal(18,4)").cast("double").alias("sum_base_price"),
            F.sum(ext_l * one_minus_disc).cast("decimal(18,4)").cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("decimal(18,4)").cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


# --- top-k over join (O1 at shuffle scale; TPC-H Q3 shape) -----------------


@register(
    "top_revenue_orders",
    """
    SELECT o.o_orderkey AS orderkey, o.o_orderdate AS orderdate,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,6)) * CAST(CAST(1.0 AS DOUBLE) - l.l_discount AS DECIMAL(12,6))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(24,6)) * CAST(CAST(1.0 AS DOUBLE) - l.l_discount AS DECIMAL(12,6))) DESC, o.o_orderkey
    LIMIT 10
    """,
    tags=("O1", "J1", "agg"),
    bench=True,
)
def q_top_revenue_orders(spark, sf_dir):
    """3-way join + group + top-k. Order-by runs on the exact decimal
    revenue (not the rounded double) with orderkey tiebreaker; limit
    compiles to TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DMUL_L) * (
        F.lit(1.0).cast("double") - F.col("l_discount")
    ).cast(DMUL_R)
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < F.lit("2000-03-15 00:00:00").cast("timestamp"))
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("_rev_dec"))
        .orderBy(F.desc("_rev_dec"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("_rev_dec").cast("decimal(18,4)").cast("double").alias("revenue"),
        )
    )


# --- semi / anti joins (P1/P8; token_riskpro.py:50-53) ---------------------


@register(
    "registered_user_txs",
    f"""
    {TX_WITH}
    SELECT tx_hash, address, event, created_at, amount FROM transactions t
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = t.address AND c.c_acctbal > 5000)
    """,
    tags=("P8", "semi-join"),
)
def q_registered_user_txs(spark, sf_dir):
    """Registered-user semi-join: process events only for known users.
    Broadcast left-semi — the fact side never shuffles."""
    t = transactions(spark, sf_dir)
    users = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    return t.join(
        F.broadcast(users), t.address == users.c_custkey, "left_semi"
    ).select("tx_hash", "address", "event", "created_at", "amount")


@register(
    "unregistered_user_txs",
    f"""
    {TX_WITH}
    SELECT tx_hash, address, event FROM transactions t
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = t.address AND c.c_acctbal > 5000)
    """,
    tags=("P4", "anti-join"),
)
def q_unregistered_user_txs(spark, sf_dir):
    """Anti-join: the reprocess-filter / NOT-IN analog (scan_events_txs.py:208)."""
    t = transactions(spark, sf_dir)
    users = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    return t.join(
        F.broadcast(users), t.address == users.c_custkey, "left_anti"
    ).select("tx_hash", "address", "event")


# --- conditional override join (J5; scan_moc_state.py:84-98) ---------------


@register(
    "settlement_price_override",
    f"""
    {TX_WITH},
    daily_close AS (
      SELECT CAST(CAST(created_at AS DATE) AS VARCHAR) AS day, amount AS close_amount FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY CAST(created_at AS DATE)
                   ORDER BY created_at DESC, tx_hash DESC) AS rn
        FROM transactions WHERE event = 'purchase') WHERE rn = 1),
    settlement AS (
      SELECT CAST(CAST(created_at AS DATE) AS VARCHAR) AS day, amount AS settlement_amount FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY CAST(created_at AS DATE)
                   ORDER BY created_at DESC, tx_hash DESC) AS rn
        FROM transactions WHERE event = 'signup') WHERE rn = 1)
    SELECT d.day, d.close_amount, s.settlement_amount,
           CASE WHEN s.settlement_amount IS NOT NULL
                THEN s.settlement_amount ELSE d.close_amount END AS effective_price
    FROM daily_close d LEFT JOIN settlement s ON d.day = s.day
    """,
    tags=("J5", "J7", "window"),
)
def q_settlement_price_override(spark, sf_dir):
    """In-settlement price substitution: if a settlement row exists for the
    window, its price overrides the market close (when/otherwise + left
    broadcast join)."""
    t = transactions(spark, sf_dir)

    def daily_latest(ev, out):
        w = Window.partitionBy(F.to_date("created_at")).orderBy(
            F.desc("created_at"), F.desc("tx_hash")
        )
        return (
            t.filter(F.col("event") == ev)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.to_date("created_at").cast("string").alias("day"), F.col("amount").alias(out))
        )

    d = daily_latest("purchase", "close_amount")
    s = daily_latest("signup", "settlement_amount")
    return d.join(F.broadcast(s), "day", "left").select(
        "day",
        "close_amount",
        "settlement_amount",
        F.when(
            F.col("settlement_amount").isNotNull(), F.col("settlement_amount")
        )
        .otherwise(F.col("close_amount"))
        .alias("effective_price"),
    )


# --- date / map / json scalar functions (F10-F13, F16, F18) ----------------


@register(
    "daily_rollup",
    f"""
    {TX_WITH}
    SELECT CAST(CAST(created_at AS DATE) AS VARCHAR) AS day, event,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS total_amount,
           MIN(amount) AS min_amount, MAX(amount) AS max_amount
    FROM transactions GROUP BY CAST(CAST(created_at AS DATE) AS VARCHAR), event
    """,
    tags=("F10", "A1"),
    bench=True,
)
def q_daily_rollup(spark, sf_dir):
    """Per-day per-event rollup (the Price/MocState per-block history analog
    at daily grain): date_trunc + partial-agg group-by."""
    t = transactions(spark, sf_dir)
    return (
        t.groupBy(F.to_date("created_at").cast("string").alias("day"), "event")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("amount").cast(D186)).cast("decimal(18,4)").cast("double").alias("total_amount"),
            F.min("amount").alias("min_amount"),
            F.max("amount").alias("max_amount"),
        )
    )


@register(
    "state_decode",
    f"""
    {TX_WITH}
    SELECT tx_hash, address % 4 AS state_code,
           CASE address % 4 WHEN 0 THEN 'Liquidated' WHEN 1 THEN 'BProDiscountRate'
                            WHEN 2 THEN 'BelowCobj' ELSE 'AboveCobj' END AS state_name
    FROM transactions
    """,
    tags=("F13", "F16"),
)
def q_state_decode(spark, sf_dir):
    """State-code→name decode via map literal (mocstate.py:11-16 d_states)."""
    t = transactions(spark, sf_dir)
    d_states = F.create_map(
        F.lit(0), F.lit("Liquidated"),
        F.lit(1), F.lit("BProDiscountRate"),
        F.lit(2), F.lit("BelowCobj"),
        F.lit(3), F.lit("AboveCobj"),
    )
    code = (F.col("address") % 4).cast("bigint")
    return t.select(
        "tx_hash",
        code.alias("state_code"),
        F.element_at(d_states, code.cast("int")).alias("state_name"),
    )


@register(
    "payload_json_histogram",
    f"""
    {TX_WITH}
    SELECT CAST(json_extract_string(payload, '$.k') AS BIGINT) AS k_value,
           COUNT(*) AS n
    FROM transactions GROUP BY 1
    """,
    tags=("F18", "json"),
)
def q_payload_json_histogram(spark, sf_dir):
    """Decoded-event payload access: JSON field extract + histogram
    (the from_json decode path of scan_events_txs.py:115-132)."""
    t = transactions(spark, sf_dir)
    return (
        t.select(
            F.get_json_object("payload", "$.k").cast("bigint").alias("k_value")
        )
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# --- window functions (§2.8) -----------------------------------------------


@register(
    "user_running_total",
    f"""
    {TX_WITH}
    SELECT tx_hash, address, created_at,
           CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) OVER (
             PARTITION BY address ORDER BY created_at, tx_hash
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,4)) AS DOUBLE) AS cum_amount,
           ROW_NUMBER() OVER (PARTITION BY address ORDER BY created_at, tx_hash) AS seq
    FROM transactions
    """,
    tags=("window",),
    bench=True,
)
def q_user_running_total(spark, sf_dir):
    """Per-user cumulative balance (UserState evolution as a window):
    single hash-shuffle on address, exact decimal running sum."""
    t = transactions(spark, sf_dir)
    w = Window.partitionBy("address").orderBy("created_at", "tx_hash")
    return t.select(
        "tx_hash",
        "address",
        "created_at",
        F.sum(F.col("amount").cast(D186))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("cum_amount"),
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


@register(
    "user_sessions",
    f"""
    {TX_WITH},
    g AS (SELECT address, created_at, tx_hash,
            CASE WHEN epoch_us(created_at) - epoch_us(LAG(created_at) OVER (
                   PARTITION BY address ORDER BY created_at, tx_hash)) > 1800000000
                 OR LAG(created_at) OVER (
                   PARTITION BY address ORDER BY created_at, tx_hash) IS NULL
                 THEN 1 ELSE 0 END AS new_session
          FROM transactions),
    s AS (SELECT *, CAST(SUM(new_session) OVER (
            PARTITION BY address ORDER BY created_at, tx_hash
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM g)
    SELECT address, session_id, COUNT(*) AS n_events,
           MIN(created_at) AS session_start, MAX(created_at) AS session_end
    FROM s GROUP BY address, session_id
    """,
    tags=("window", "sessionization"),
)
def q_user_sessions(spark, sf_dir):
    """Session windows (30-min gap) via lag + cumulative flag — the batch
    form of a streaming session window; one shuffle on address serves both
    windows and the final group-by (same partitioning reused)."""
    t = transactions(spark, sf_dir)
    w = Window.partitionBy("address").orderBy("created_at", "tx_hash")
    gap_us = (
        F.unix_micros("created_at") - F.unix_micros(F.lag("created_at").over(w))
    )
    g = t.withColumn(
        "new_session",
        F.when(
            gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    s = g.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return s.groupBy("address", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("created_at").alias("session_start"),
        F.max("created_at").alias("session_end"),
    )


# --- multi-dim broadcast join rollup ---------------------------------------


@register(
    "region_supplier_rollup",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_suppliers,
           CAST(CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS total_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("J1", "agg", "broadcast"),
)
def q_region_supplier_rollup(spark, sf_dir):
    """Star-schema rollup: both dims broadcast; supplier never shuffles
    until the (tiny) final aggregation."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast(D186))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "asof_join_price_at_click",
    f"""
    {TX_WITH},
    clicks AS (SELECT tx_hash, address, created_at FROM transactions
               WHERE event = 'click'),
    purchases AS (SELECT address, created_at, amount FROM transactions
                  WHERE event = 'purchase')
    SELECT c.tx_hash, c.address, c.created_at, p.amount AS asof_amount
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.address = p.address AND c.created_at >= p.created_at
    """,
    tags=("J6", "asof-join"),
    bench=True,
)
def q_asof_join_price_at_click(spark, sf_dir):
    """Keyed event-time AS-OF join: each click gets the user's latest prior
    purchase amount (the balance-at-height reconstruction pattern). Spark
    has no ASOF JOIN — this is the one-shuffle union+window formulation;
    the oracle uses DuckDB's native ASOF JOIN."""
    t = transactions(spark, sf_dir)
    clicks = t.filter(F.col("event") == "click").select(
        "tx_hash", "address", "created_at"
    )
    purchases = t.filter(F.col("event") == "purchase").select(
        "address", "created_at", "amount"
    )
    from ..operators.relational import asof_join

    return asof_join(
        clicks, purchases, key="address", left_ts="created_at",
        right_ts="created_at", value_cols=["amount"],
    )


@register(
    "order_priority_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    tags=("A1", "P5"),
)
def q_order_priority_counts(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


@register(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,6)) * CAST(CAST(1.0 AS DOUBLE) - l.l_discount AS DECIMAL(12,6))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                                   AND c.c_nationkey = s.s_nationkey
                    JOIN nation n ON s.s_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("J1", "agg", "6-way-join"),
    bench=True,
)
def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with a same-nation theta condition.
    customer/supplier/nation/region broadcast; lineitem->orders is the one
    real join; AQE reorders as needed."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast(DMUL_L) * (
        F.lit(1.0).cast("double") - F.col("l_discount")
    ).cast(DMUL_R)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(su), (l.l_suppkey == su.s_suppkey)
              & (c.c_nationkey == su.s_nationkey))
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"))
    )


@register(
    "shipmode_priority_counts",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("J1", "agg", "conditional-agg"),
)
def q_shipmode_priority_counts(spark, sf_dir):
    """TPC-H Q12 shape: conditional aggregation (CASE inside SUM)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "brand_revenue_share",
    """
    WITH j AS (
      SELECT p.p_brand,
             CAST(l.l_extendedprice AS DECIMAL(24,6)) * CAST(CAST(1.0 AS DOUBLE) - l.l_discount AS DECIMAL(12,6)) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
    SELECT p_brand,
           CAST(CAST(SUM(rev) AS DECIMAL(18,4)) AS DOUBLE) AS brand_revenue,
           CAST(CAST(SUM(rev) AS DECIMAL(18,4)) AS DOUBLE)
             / CAST((SELECT CAST(CAST(SUM(rev) AS DECIMAL(18,4)) AS DOUBLE) FROM j) AS DOUBLE) AS revenue_share
    FROM j GROUP BY p_brand
    """,
    tags=("J1", "agg", "scalar-subquery"),
)
def q_brand_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: per-group revenue against a global scalar (share of
    total) — scalar aggregate broadcast back over the groups."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DMUL_L) * (
        F.lit(1.0).cast("double") - F.col("l_discount")
    ).cast(DMUL_R)
    j = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("p_brand", rev.alias("rev"))
    )
    per_brand = j.groupBy("p_brand").agg(
        F.sum("rev").cast("decimal(18,4)").cast("double").alias("brand_revenue")
    )
    total = j.agg(
        F.sum("rev").cast("decimal(18,4)").cast("double").alias("__total")
    )
    return per_brand.crossJoin(F.broadcast(total)).select(
        "p_brand",
        "brand_revenue",
        (F.col("brand_revenue") / F.col("__total")).alias("revenue_share"),
    )


@register(
    "settlement_window_activity",
    f"""
    {TX_WITH},
    intervals AS (
      SELECT tx_hash AS window_id, created_at AS start_ts,
             created_at + INTERVAL 6 HOUR AS end_ts
      FROM transactions WHERE event = 'signup' AND address % 10 = 0),
    pts AS (SELECT tx_hash AS purchase_id, created_at AS pts_ts, amount
            FROM transactions WHERE event = 'purchase')
    SELECT i.window_id, p.purchase_id, p.amount
    FROM pts p JOIN intervals i
      ON p.pts_ts >= i.start_ts AND p.pts_ts < i.end_ts
    """,
    tags=("interval-join", "range"),
)
def q_settlement_window_activity(spark, sf_dir):
    """Interval join: purchases inside 6h settlement windows. Spark side
    uses the binned equi-join formulation (operators/relational.py
    interval_join) — exact, no nested loop; the oracle is DuckDB's native
    inequality join."""
    from ..operators.relational import interval_join

    t = transactions(spark, sf_dir)
    intervals = (
        t.filter((F.col("event") == "signup") & (F.col("address") % 10 == 0))
        .select(
            F.col("tx_hash").alias("window_id"),
            F.col("created_at").alias("start_ts"),
            (F.col("created_at") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
        )
    )
    pts = t.filter(F.col("event") == "purchase").select(
        F.col("tx_hash").alias("purchase_id"),
        F.col("created_at").alias("pts_ts"),
        "amount",
    )
    out = interval_join(pts, intervals, "pts_ts", "start_ts", "end_ts")
    return out.select("window_id", "purchase_id", "amount")


@register(
    "recent_price_enrichment",
    f"""
    {TX_WITH},
    txs AS (SELECT tx_hash, created_at FROM transactions WHERE event = 'click'),
    prices AS (SELECT created_at AS price_ts, amount AS price
               FROM transactions WHERE event = 'purchase')
    SELECT t.tx_hash, t.created_at, p.price_ts, p.price
    FROM txs t JOIN prices p
      ON p.price_ts >= t.created_at - INTERVAL 600 SECONDS
     AND p.price_ts <= t.created_at
    """,
    tags=("stream-join", "range", "T1"),
)
def q_recent_price_enrichment(spark, sf_dir):
    """Tx x recent-prices range join — the BATCH form of the stream-stream
    join in streaming/joins.py (same function, batch/stream parity is
    replay-tested in test_streaming.py). Spark side runs the binned
    equi-join; the oracle is DuckDB's native inequality join."""
    from ..streaming.joins import join_recent_prices

    t = transactions(spark, sf_dir)
    txs = t.filter(F.col("event") == "click").select("tx_hash", "created_at")
    prices = t.filter(F.col("event") == "purchase").select(
        F.col("created_at").alias("price_ts"), F.col("amount").alias("price")
    )
    return join_recent_prices(txs, prices, lookback_seconds=600)


@register(
    "customer_returns_topk",
    """
    SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,6))
                         * CAST(CAST(1.0 AS DOUBLE) - l.l_discount AS DECIMAL(12,6)))
                AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(24,6))
                 * CAST(CAST(1.0 AS DOUBLE) - l.l_discount AS DECIMAL(12,6))) DESC,
             c.c_custkey
    LIMIT 20
    """,
    tags=("J1", "A1", "O1", "tpch"),
    bench=True,
)
def q_customer_returns_topk(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join (two broadcastable dims, one fact-fact
    equi-join) + group + top-k. The returnflag filter reaches the lineitem
    scan; nation broadcasts; order-by runs on the exact decimal before the
    double edge cast; limit is TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast(DMUL_L) * (
        F.lit(1.0).cast("double") - F.col("l_discount")
    ).cast(DMUL_R)
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("_rev_dec"))
        .orderBy(F.desc("_rev_dec"), F.asc("c_custkey"))
        .limit(20)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("_rev_dec").cast("decimal(18,4)").cast("double").alias("revenue"),
        )
    )


@register(
    "moving_hour_sum",
    f"""
    {TX_WITH},
    s AS (SELECT tx_hash, address, created_at,
                 CAST(FLOOR(epoch(created_at)) AS BIGINT) AS sec
          FROM transactions)
    SELECT tx_hash, address, created_at,
           CAST(COUNT(*) OVER (
             PARTITION BY address ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_last_hour
    FROM s
    """,
    tags=("window", "range-frame"),
)
def q_moving_hour_sum(spark, sf_dir):
    """Sliding 1-hour-lookback count per user via a RANGE window frame over
    epoch seconds (the rate-limit / activity-velocity primitive). RANGE
    frames bound by VALUE, not row count — ties at the same timestamp all
    enter the frame, so the result is deterministic without a tiebreaker."""
    t = transactions(spark, sf_dir)
    s = t.select(
        "tx_hash",
        "address",
        "created_at",
        F.floor(F.unix_micros("created_at") / 1_000_000).cast("bigint").alias("sec"),
    )
    w = (
        Window.partitionBy("address")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return s.select(
        "tx_hash",
        "address",
        "created_at",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
    )


@register(
    "large_volume_orders",
    """
    WITH s AS (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq
               FROM lineitem GROUP BY l_orderkey
               HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
    SELECT c.c_custkey AS custkey, c.c_name AS name, o.o_orderkey AS orderkey,
           o.o_orderdate AS orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS totalprice,
           CAST(CAST(s.sq AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty
    FROM s JOIN orders o ON s.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("A1", "J1", "having", "tpch"),
)
def q_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate -> HAVING -> join back to enrich. The
    HAVING survives as a post-aggregate filter, so the orders/customer joins
    see only the tiny qualifying set (~0.1% of orders) — at scale the join
    probe side shrinks by 1000x before any shuffle of the dimension tables;
    AQE turns both enrichment joins into broadcasts at runtime."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(D186)).alias("_sq"))
        .filter(F.col("_sq") > F.lit(300).cast(D186))
    )
    return (
        s.join(o, s.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").cast("decimal(18,4)").cast("double").alias("totalprice"),
            F.col("_sq").cast("decimal(18,4)").cast("double").alias("sum_qty"),
        )
    )


@register(
    "below_avg_qty_revenue",
    """
    WITH g AS (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq,
                      COUNT(*) AS c
               FROM lineitem GROUP BY l_partkey)
    SELECT l.l_returnflag AS returnflag,
           COUNT(*) AS n_small,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_extprice
    FROM lineitem l JOIN g ON l.l_partkey = g.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,6)) * CAST(5 AS DECIMAL(3,0))
          * CAST(g.c AS DECIMAL(10,0)) < g.sq
    GROUP BY l.l_returnflag
    """,
    tags=("A1", "J1", "subquery-decorrelation", "tpch"),
)
def q_below_avg_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: a correlated scalar subquery (qty < 0.2 * per-part
    AVG) decorrelated into an aggregate + self-join — the only scalable
    form (the correlated form is O(n) subquery executions). The comparison
    is cross-multiplied (5*qty*count < sum) so it stays in exact decimal on
    both engines: no AVG double whose value depends on reduction order.
    Plan (test-pinned): the aggregate output is one row per partkey — small
    enough to BROADCAST back onto the fact scan, so lineitem is never
    shuffled for the join; at cluster scale, where the per-key aggregate
    outgrows the broadcast threshold, both sides hash-partition on
    l_partkey and the aggregate's exchange is reused."""
    l = table(spark, sf_dir, "lineitem")
    g = (
        l.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast(D186)).alias("sq"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    lhs = (
        F.col("l_quantity").cast(D186)
        * F.lit(5).cast("decimal(3,0)")
        * F.col("c").cast("decimal(10,0)")
    )
    return (
        l.join(g, "l_partkey")
        .filter(lhs < F.col("sq"))
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
            F.sum(F.col("l_extendedprice").cast(D186))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("sum_extprice"),
        )
    )


@register(
    "daily_event_matrix",
    f"""
    {TX_WITH}
    SELECT CAST(date_trunc('day', created_at) AS DATE) AS day,
           CAST(COUNT(*) FILTER (event = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (event = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (event = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (event = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (event = 'view') AS BIGINT) AS view
    FROM transactions GROUP BY 1
    """,
    tags=("A1", "pivot"),
)
def q_daily_event_matrix(spark, sf_dir):
    """PIVOT (crosstab): day x event-type count matrix. The pivot value
    list is explicit — omitting it costs an extra distinct-scan job to
    discover the columns and makes the output schema data-dependent, both
    wrong at 100 TB. Compiles to ONE partial->final hash aggregate over
    (day) with a 5-slot conditional-count vector; missing combinations are
    coalesced to 0 to match the SQL conditional-aggregation form."""
    t = transactions(spark, sf_dir)
    kinds = ["click", "error", "purchase", "signup", "view"]
    # DATE on both sides: Spark's date_trunc returns TIMESTAMP while the
    # DuckDB oracle's returns DATE — value-equal through pandas but a
    # schema_match trip if this query ever rotates into the driver window
    p = (
        t.groupBy(
            F.date_trunc("day", F.col("created_at")).cast("date").alias("day")
        )
        .pivot("event", kinds)
        .count()
    )
    return p.select(
        "day", *[F.coalesce(F.col(k), F.lit(0)).cast("bigint").alias(k) for k in kinds]
    )


@register(
    "amount_quartiles",
    f"""
    {TX_WITH}
    SELECT tx_hash, event,
           percent_rank() OVER w AS pr,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM transactions
    WINDOW w AS (PARTITION BY event ORDER BY amount, tx_hash)
    """,
    tags=("window", "rank"),
)
def q_amount_quartiles(spark, sf_dir):
    """percent_rank + ntile over a per-event total order (amount with
    tx_hash tiebreaker — rank functions over a partial order are
    nondeterministic, so the tiebreaker is load-bearing). percent_rank is
    (rank-1)/(n-1): a ratio of small exact ints, bit-identical across
    engines. One hash shuffle on the partition key serves both functions."""
    t = transactions(spark, sf_dir)
    w = Window.partitionBy("event").orderBy("amount", "tx_hash")
    return t.select(
        "tx_hash",
        "event",
        F.percent_rank().over(w).alias("pr"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


# --- TPC-H decision-support shapes: EXISTS / NOT-IN / scalar-threshold -----


@register(
    "returned_order_priority",
    """
    SELECT o.o_orderpriority AS priority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    tags=("A1", "semi-join", "tpch"),
)
def q_returned_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS rewritten as a LEFT SEMI join (the scalable
    form — Spark plans correlated EXISTS this way too, but the explicit
    join keeps the shape visible). The returnflag filter reaches the
    lineitem scan before the semi-join, and the semi-join needs only
    l_orderkey from the probe side (ReadSchema is one column); the date
    filter prunes orders before any shuffle."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    returned = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


@register(
    "part_supplier_variety",
    """
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("A1", "anti-join", "distinct", "tpch"),
)
def q_part_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape: supplier variety per part group, excluding
    blacklisted suppliers. NOT IN becomes a LEFT ANTI join (safe here:
    s_suppkey is non-null; a nullable column would need the null-aware
    form). Both dims broadcast — the blacklist is tiny and the filtered
    part table is small — so lineitem's only shuffle is the final
    two-phase distinct aggregate on the group keys."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    dims = p.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin([1, 4, 9, 16, 25, 36, 49])
    )
    return (
        l.join(F.broadcast(dims), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


@register(
    "idle_customer_balance",
    """
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS s, COUNT(*) AS c
      FROM customer WHERE c_acctbal > 0.0),
    idle AS (
      SELECT cu.c_nationkey, cu.c_acctbal
      FROM customer cu CROSS JOIN pos
      WHERE CAST(cu.c_acctbal AS DECIMAL(18,6)) * CAST(pos.c AS DECIMAL(10,0)) > pos.s
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = cu.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
    SELECT c_nationkey AS nation, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE)
             AS total_bal
    FROM idle GROUP BY c_nationkey
    """,
    tags=("A1", "anti-join", "scalar-subquery", "tpch"),
)
def q_idle_customer_balance(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, aggregated per nation. The global AVG threshold is a one-row
    aggregate broadcast back (cross join), and the comparison is
    cross-multiplied (bal * count > sum) so it stays in exact decimal —
    no order-dependent double AVG on either engine. NOT EXISTS is a LEFT
    ANTI join against the date-pruned orders projection."""
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pos = (
        cu.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(F.col("c_acctbal").cast(D186)).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    idle = (
        cu.crossJoin(F.broadcast(pos))
        .filter(
            F.col("c_acctbal").cast(D186) * F.col("c").cast("decimal(10,0)")
            > F.col("s")
        )
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return idle.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        F.sum(F.col("c_acctbal").cast(D186))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("total_bal"),
    )


@register(
    "sole_blame_supplier",
    """
    WITH per AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS n_fault,
             MIN(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS fault_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s.s_name AS supplier, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per JOIN supplier s ON s.s_suppkey = per.fault_supp
    WHERE per.n_supp >= 2 AND per.n_fault = 1
    GROUP BY s.s_name
    ORDER BY COUNT(*) DESC, s.s_name
    LIMIT 20
    """,
    tags=("A1", "semi-join", "tpch"),
    bench=True,
)
def q_sole_blame_supplier(spark, sf_dir):
    """TPC-H Q21 shape: the supplier solely at fault on a multi-supplier
    order. The reference formulation is EXISTS (another supplier) AND NOT
    EXISTS (another faulty supplier) — two correlated subqueries; here both
    decorrelate into ONE pass of per-order aggregates (distinct suppliers,
    distinct faulty suppliers, and MIN picks the single faulty one exactly
    when n_fault = 1). One fact shuffle on l_orderkey replaces two
    correlated probes; the supplier-name join broadcasts; top-k is
    TakeOrderedAndProject on (numwait desc, name) — a total order, so the
    LIMIT boundary is deterministic."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    # Two count_distincts in one aggregate would trigger Catalyst's
    # distinct-agg rewrite: an Expand tripling the rows entering the
    # shuffle. Pre-aggregating to (order, supplier) grain first keeps the
    # fact shuffle at 1x with full map-side combine; the re-group to order
    # grain shuffles the already-reduced frame (~distinct pairs), measured
    # ~3x faster at sf0.1.
    per_pair = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("fault")
    )
    per = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("fault").alias("n_fault"),
        F.min(F.when(F.col("fault") == 1, F.col("l_suppkey"))).alias(
            "fault_supp"
        ),
    )
    return (
        per.filter((F.col("n_supp") >= 2) & (F.col("n_fault") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("fault_supp"))
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("supplier"))
        .limit(20)
    )


@register(
    "hourly_ohlc",
    f"""
    {TX_WITH},
    b AS (SELECT event, date_trunc('hour', created_at) AS bucket,
                 created_at, tx_hash, amount
          FROM transactions),
    rn AS (SELECT *,
             row_number() OVER (PARTITION BY event, bucket
                                ORDER BY created_at, tx_hash) AS rf,
             row_number() OVER (PARTITION BY event, bucket
                                ORDER BY created_at DESC, tx_hash DESC) AS rl
           FROM b),
    agg AS (SELECT event, bucket, CAST(COUNT(*) AS BIGINT) AS n_trades,
                   MAX(amount) AS high, MIN(amount) AS low,
                   CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) AS avg_price
            FROM b GROUP BY event, bucket)
    SELECT a.event, a.bucket, f.amount AS open, a.high, a.low,
           l.amount AS close, a.n_trades, a.avg_price
    FROM agg a
    JOIN (SELECT event, bucket, amount FROM rn WHERE rf = 1) f
      ON f.event = a.event AND f.bucket = a.bucket
    JOIN (SELECT event, bucket, amount FROM rn WHERE rl = 1) l
      ON l.event = a.event AND l.bucket = a.bucket
    """,
    tags=("F10", "A1", "window", "timeseries"),
    bench=True,
)
def q_hourly_ohlc(spark, sf_dir):
    """Hourly OHLC candles per event type — the canonical price-history
    serving query for a price-feed indexer (reference keeps raw price rows;
    candles are the read-side rollup). Spark computes open/close with the
    orderable-STRUCT min/max trick — min(struct(ts, tx_hash, amount)) picks
    the amount of the FIRST row in the (ts, tx_hash) total order — so the
    whole candle is ONE aggregate pass, one shuffle, no window, no join.
    The oracle builds the same candle from two row_number windows + two
    join-backs: two independent algorithms, one result. avg_price divides
    the exact decimal sum by the count once, identically on both engines."""
    t = transactions(spark, sf_dir)
    b = t.select(
        "event",
        F.date_trunc("hour", F.col("created_at")).alias("bucket"),
        "created_at",
        "tx_hash",
        "amount",
    )
    key = F.struct("created_at", "tx_hash", "amount")
    return b.groupBy("event", "bucket").agg(
        F.min(key).getField("amount").alias("open"),
        F.max("amount").alias("high"),
        F.min("amount").alias("low"),
        F.max(key).getField("amount").alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
        (
            F.sum(F.col("amount").cast(D186)).cast("decimal(18,4)").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_price"),
    )


@register(
    "signup_purchase_funnel",
    f"""
    {TX_WITH},
    s AS (SELECT tx_hash, address, created_at FROM transactions
          WHERE event = 'signup'),
    p AS (SELECT address, created_at FROM transactions
          WHERE event = 'purchase'),
    m AS (SELECT s.address, s.created_at,
                 (SELECT MIN(p.created_at) FROM p
                  WHERE p.address = s.address
                    AND p.created_at >= s.created_at) AS nxt
          FROM s)
    SELECT CAST(date_trunc('day', created_at) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(SUM(CASE WHEN nxt IS NOT NULL
                          AND epoch_us(nxt) - epoch_us(created_at) <= 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN nxt IS NOT NULL
                          AND epoch_us(nxt) - epoch_us(created_at) <= 3600000000
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS conversion_rate
    FROM m GROUP BY date_trunc('day', created_at)
    """,
    tags=("J3", "window", "funnel"),
)
def q_signup_purchase_funnel(spark, sf_dir):
    """Signup→purchase funnel: per day, how many signups converted to a
    purchase within the hour. The next-purchase lookup is the FORWARD
    as-of join (asof_join direction='forward' — same union-tag running
    window over reversed time order, one shuffle); the oracle brute-forces
    it as a correlated MIN subquery. The conversion window compares
    integer epoch-microseconds — no double time math."""
    t = transactions(spark, sf_dir)
    s = t.filter(F.col("event") == "signup").select(
        "tx_hash", "address", "created_at"
    )
    p = t.filter(F.col("event") == "purchase").select(
        "address", F.col("created_at").alias("p_ts")
    )
    m = R2.asof_join(
        s, p, key="address", left_ts="created_at", right_ts="p_ts",
        value_cols=["p_ts"], direction="forward",
    )
    converted = (
        F.col("asof_p_ts").isNotNull()
        & (
            F.unix_micros(F.col("asof_p_ts")) - F.unix_micros(F.col("created_at"))
            <= 3_600_000_000
        )
    )
    return (
        m.groupBy(F.date_trunc("day", F.col("created_at")).alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signups"),
            F.sum(converted.cast("int")).cast("bigint").alias("n_converted"),
            (
                F.sum(converted.cast("int")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("conversion_rate"),
        )
    )


@register(
    "cheapest_supplier_per_part",
    """
    WITH g AS (SELECT l_partkey, MIN(l_extendedprice) AS min_price
               FROM lineitem GROUP BY l_partkey)
    SELECT p.p_partkey AS partkey, p.p_name AS name,
           s.s_name AS supplier, l.l_extendedprice AS price
    FROM lineitem l
    JOIN g ON l.l_partkey = g.l_partkey AND l.l_extendedprice = g.min_price
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 10
    """,
    tags=("J1", "subquery-decorrelation", "tpch"),
)
def q_cheapest_supplier_per_part(spark, sf_dir):
    """TPC-H Q2 shape: the supplier(s) offering the minimum price per part
    — a correlated equality subquery (price = per-part MIN) decorrelated
    into an aggregate + equality join-back, the pattern for every
    "row(s) achieving the group extreme" lookup where latest_per_key's
    window form would carry the whole row through the shuffle. Ties all
    qualify (deterministic SET, no arbitrary pick). The size filter prunes
    parts before their broadcast; the per-part aggregate is small and
    broadcasts back onto the fact scan."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    g = l.groupBy(F.col("l_partkey").alias("g_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        l.join(
            F.broadcast(g),
            (F.col("l_partkey") == F.col("g_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(p.filter(F.col("p_size") <= 10)),
              F.col("p_partkey") == l["l_partkey"])
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("name"),
            F.col("s_name").alias("supplier"),
            F.col("l_extendedprice").alias("price"),
        )
    )


@register(
    "cumulative_unique_users",
    f"""
    {TX_WITH},
    f AS (SELECT address, MIN(date_trunc('day', created_at)) AS first_day
          FROM transactions GROUP BY address),
    d AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
          FROM f GROUP BY first_day)
    SELECT CAST(day AS TIMESTAMP) AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
             AS cumulative_users
    FROM d
    """,
    tags=("A1", "window", "growth"),
)
def q_cumulative_unique_users(spark, sf_dir):
    """Users-to-date per day — the growth curve. A running COUNT(DISTINCT)
    is not windowable, but first-seen dates make it additive: min day per
    user (one shuffle), count per day, cumulative sum. The global-order
    window runs over ONE ROW PER DAY (thousands of rows at any corpus
    size), so the single-partition window stage is trivially safe — the
    heavy lifting happened in the keyed aggregations before it."""
    t = transactions(spark, sf_dir)
    f_ = t.groupBy("address").agg(
        F.min(F.date_trunc("day", F.col("created_at"))).alias("first_day")
    )
    d = f_.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


WEEK_US = 7 * 24 * 3600 * 1_000_000


@register(
    "retention_cohorts",
    f"""
    {TX_WITH},
    f AS (SELECT address, date_trunc('week', MIN(created_at)) AS cohort
          FROM transactions GROUP BY address),
    a AS (SELECT DISTINCT t.address, f.cohort,
                 (epoch_us(date_trunc('week', t.created_at))
                  - epoch_us(f.cohort)) / {WEEK_US} AS week_offset
          FROM transactions t JOIN f USING (address))
    SELECT CAST(cohort AS TIMESTAMP) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM a GROUP BY cohort, week_offset
    """,
    tags=("A1", "growth", "cohort"),
)
def q_retention_cohorts(spark, sf_dir):
    """Weekly retention triangle: users active k weeks after their cohort
    week (signup = first event). Two shuffles — first-seen per user, then
    the (cohort, offset) distinct count; the cohort join broadcasts at
    serving scale and co-partitions on address at 100 TB (both sides
    already hash on address from the first aggregate — the exchange is
    reused). Week arithmetic is integer epoch-microseconds over
    week-truncated NTZ timestamps: exact multiples, no double time math."""
    t = transactions(spark, sf_dir)
    f_ = t.groupBy("address").agg(
        F.date_trunc("week", F.min("created_at")).alias("cohort")
    )
    a = (
        t.join(f_, "address")
        .select(
            "address",
            "cohort",
            (
                (
                    F.unix_micros(F.date_trunc("week", F.col("created_at")))
                    - F.unix_micros(F.col("cohort"))
                )
                / F.lit(WEEK_US)
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    return a.groupBy(
        F.col("cohort").alias("cohort_week"), "week_offset"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))


@register(
    "ewma_amount",
    f"""
    {TX_WITH},
    w AS (SELECT tx_hash, address, amount,
            list(amount) OVER (PARTITION BY address ORDER BY created_at, tx_hash
                               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS arr
          FROM transactions)
    SELECT tx_hash, address,
      list_sum(list_transform(range(1, len(arr)+1),
                i -> arr[i::INT] * pow(0.5, (len(arr)-i)::INT)))
        / list_sum(list_transform(range(1, len(arr)+1),
                   i -> pow(0.5, (len(arr)-i)::INT))) AS ewma
    FROM w
    """,
    tags=("window", "timeseries", "ewma"),
)
def q_ewma_amount(spark, sf_dir):
    """Exponentially-weighted moving average over the last 8 observations
    per address — the smoothing primitive next to `moving_hour_sum` and
    `hourly_ohlc`. A recursive EWMA doesn't exist in either engine's
    window algebra; the bounded-frame form collects the frame and folds it
    with positional weights. Decay 0.5 is deliberate: its powers are exact
    in binary floating point and both engines fold the frame left-to-right
    over the same ORDER BY, so the doubles are bit-identical and the query
    stays hash-gated. One shuffle on address serves the window."""
    t = transactions(spark, sf_dir)
    w = (
        Window.partitionBy("address")
        .orderBy("created_at", "tx_hash")
        .rowsBetween(-7, Window.currentRow)
    )
    arr = F.collect_list("amount").over(w)
    n = F.size(F.col("arr"))
    num = F.aggregate(
        F.zip_with(
            F.col("arr"),
            F.sequence(F.lit(1), n),
            lambda x, i: x * F.pow(F.lit(0.5), (n - i).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.pow(F.lit(0.5), (n - i).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        t.withColumn("arr", arr)
        .select("tx_hash", "address", (num / den).alias("ewma"))
    )
