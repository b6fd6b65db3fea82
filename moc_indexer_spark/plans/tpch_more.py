"""Registry batch 7: the remaining classic join/agg shapes (TPC-H Q7/Q8/Q9/
Q11/Q13/Q15/Q19/Q20 analogs on the driver's TPC-H-ish tables).

These have no single reference counterpart — they widen the relational
surface the §2.3/§2.4 operators compose into, at shapes that stress the
planner differently from batch 2:

- Q7  nation-pair volume: two broadcast dims aliased twice (self-join on
  nation through different fact columns) + conditional pair filter.
- Q8  market share: conditional numerator over a multi-join, one double
  division at the edge.
- Q9  product profit: expression profit (rev - cost) aggregated by
  (nation, year) — negative decimals exercised.
- Q11 important stock: group agg filtered against a global scalar
  (crossJoin(broadcast(total)) — the decorrelated HAVING > scalar shape).
- Q13 customer distribution: LEFT OUTER join with the filter in the JOIN
  condition (not WHERE — the classic outer-join pitfall), double group-by.
- Q15 top supplier: max-of-aggregate join-back with exact-decimal compare
  (ties all qualify).
- Q19 disjunctive predicates: OR-of-ANDs across two tables — Catalyst
  pushes the common part filter below the join, the mixed predicate stays
  in the join condition.
- Q20 excess shipments: nested aggregate threshold (year qty vs lifetime
  qty) -> distinct supplier keys -> semi-join into a broadcast dim.

Determinism: same rules as batch 2 — exact decimal sums cast decimal(18,4)
-> double at the edge; threshold compares in decimal (x*2 > y, never *0.5);
double division appears once with identical operand order in both engines.

At 100 TB: lineitem is the only big table in every query here; each query
shuffles it at most once (the group-by), all dims broadcast. Q13's outer
join shuffles orders once on o_custkey; customer is the small side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import table
from .registry import register
from .relational_extra import DMUL_L, DMUL_R

REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(24,6))"
    " * CAST(CAST(1.0 AS DOUBLE) - l_discount AS DECIMAL(12,6))"
)


def _rev():
    return F.col("l_extendedprice").cast(DMUL_L) * (
        F.lit(1.0).cast("double") - F.col("l_discount")
    ).cast(DMUL_R)


def _d18(c):
    return c.cast("decimal(18,4)").cast("double")


# --- Q7: nation-pair shipping volume ---------------------------------------


@register(
    "nation_pair_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(CAST(SUM({REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INTEGER)
    """,
    tags=("J1", "agg", "self-dim-join"),
    bench=True,
)
def q_nation_pair_volume(spark, sf_dir):
    """TPC-H Q7 shape. nation joins twice under different aliases (supplier
    side and customer side); both broadcast, so lineitem->orders is the only
    shuffle pair and the pair predicate prunes before the group-by."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    # Prune BOTH fact sides through the filtered dims BEFORE the one real
    # shuffle: suppliers/customers outside the two nations drop ~(23/25) of
    # lineitem and orders via broadcast inner joins, so the l<->o shuffle
    # moves ~1/150th of the naive volume. The residual pair predicate only
    # rejects same-nation combos post-join.
    n1f = n1.filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2f = n2.filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    s2 = s.join(F.broadcast(n1f), F.col("s_nationkey") == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    c2 = c.join(F.broadcast(n2f), F.col("c_nationkey") == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    o2 = o.join(F.broadcast(c2), F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    # The one real shuffle pair (pruned lineitem <-> pruned orders) runs
    # as a SHUFFLED HASH join, not sort-merge: the orders side is the
    # smaller one by construction (nation prune keeps ~2/25 of customers,
    # so o2 is a thin slice of orders), the hash build of that slice per
    # partition is bounded, and skipping BOTH sides' sorts measured
    # 0.75 -> 0.65 s median in an interleaved same-session A/B (every
    # quantile lower). At cluster scale the same argument holds per
    # partition, and AQE's skew-join splitting covers shuffled-hash joins
    # the same as sort-merge ones.
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(s2), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o2.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_d18(F.sum(_rev())).alias("revenue"))
    )


# --- Q8: market share ------------------------------------------------------


@register(
    "nation_market_share",
    f"""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             n1.n_name AS supp_nation, {REV_SQL} AS rev
      FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
      CAST(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev END),
                          0) AS DECIMAL(18,4)) AS DOUBLE)
        / CAST(CAST(SUM(rev) AS DECIMAL(18,4)) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
    tags=("J1", "agg", "conditional-agg"),
)
def q_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: conditional numerator / total denominator per year.
    Both sums come out of ONE aggregate over one join tree (no second pass);
    the division is the only double op and happens once per group."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    base = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(p.filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.col("supp_nation"),
            _rev().alias("rev"),
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("rev")))
    den = F.sum(F.col("rev"))
    zero = F.lit(0).cast("decimal(37,12)")
    return base.groupBy("o_year").agg(
        (_d18(F.coalesce(num, zero)) / _d18(den)).alias("mkt_share")
    )


# --- Q9: product-type profit -----------------------------------------------


@register(
    "product_type_profit",
    f"""
    SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INTEGER) AS o_year,
      CAST(CAST(SUM({REV_SQL}
            - CAST(p.p_retailprice AS DECIMAL(12,6))
              * CAST(l.l_quantity AS DECIMAL(24,6))) AS DECIMAL(18,4))
           AS DOUBLE) AS profit
    FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(year(l.l_shipdate) AS INTEGER)
    """,
    tags=("J1", "agg", "expression-profit"),
    bench=True,
)
def q_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit = revenue - cost (cost stood in by
    retailprice x quantity; the driver's part table has no partsupp).
    Negative group sums exercised; one lineitem shuffle, all dims broadcast,
    the LIKE filter prunes part before broadcasting."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    cost = F.col("p_retailprice").cast(DMUL_R) * F.col("l_quantity").cast(DMUL_L)
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(_d18(F.sum(_rev() - cost)).alias("profit"))
    )


# --- Q11: important stock (group value vs global fraction) -----------------


@register(
    "important_part_stock",
    f"""
    WITH v AS (
      SELECT l.l_partkey,
             CAST(SUM({REV_SQL}) AS DECIMAL(18,4)) AS value_dec
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_4')
      GROUP BY l.l_partkey),
    t AS (SELECT CAST(SUM(value_dec) AS DECIMAL(28,4)) AS total_dec FROM v)
    SELECT v.l_partkey AS partkey, CAST(v.value_dec AS DOUBLE) AS value
    FROM v, t WHERE v.value_dec * 1000 > t.total_dec * 3
    """,
    tags=("agg", "scalar-subquery", "having"),
)
def q_important_part_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part value filtered against a fraction of the
    global total. The threshold compare stays in exact decimal (x*1000 >
    total*3, i.e. share > 0.3%) — integer multiples, never a 0.003 double.
    The global total is one extra reduce over the already-aggregated (small)
    per-part frame, broadcast back — no second scan of lineitem."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_4")
    )
    v = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).cast("decimal(18,4)").alias("value_dec"))
    )
    t = v.agg(F.sum("value_dec").cast("decimal(28,4)").alias("total_dec"))
    return (
        v.crossJoin(F.broadcast(t))
        .filter(F.col("value_dec") * 1000 > F.col("total_dec") * 3)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
    )


# --- Q13: customer order-count distribution --------------------------------


@register(
    "customer_order_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    tags=("outer-join", "agg", "distribution"),
    bench=True,
)
def q_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape. The priority filter lives in the JOIN CONDITION, not
    a WHERE — customers with only urgent orders must still appear with
    c_count=0 (a WHERE would silently drop them). COUNT(o_orderkey) counts
    matched rows only (nulls from the outer side don't count). At scale the
    shuffle is orders on o_custkey; the second group-by input is one row per
    customer, negligible."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


# --- Q15: top supplier (max-of-aggregate join-back) ------------------------


@register(
    "top_supplier_revenue",
    f"""
    WITH r AS (
      SELECT l_suppkey,
             CAST(SUM({REV_SQL}) AS DECIMAL(18,4)) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey),
    m AS (SELECT MAX(rev_dec) AS max_dec FROM r)
    SELECT s.s_suppkey AS suppkey, s.s_name AS name,
           CAST(r.rev_dec AS DOUBLE) AS total_revenue
    FROM r JOIN m ON r.rev_dec = m.max_dec
           JOIN supplier s ON r.l_suppkey = s.s_suppkey
    """,
    tags=("agg", "scalar-subquery", "top-1-by-agg"),
)
def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with max quarterly revenue. The max
    is compared in exact decimal so ties are all kept (a double compare
    could split a tie across engines); the view is computed once and reused
    for both the max and the join-back."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    r = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("decimal(18,4)").alias("rev_dec"))
    )
    m = r.agg(F.max("rev_dec").alias("max_dec"))
    return (
        r.crossJoin(F.broadcast(m))
        .filter(F.col("rev_dec") == F.col("max_dec"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


# --- Q19: disjunctive predicates -------------------------------------------


@register(
    "disjunctive_revenue",
    f"""
    SELECT CAST(CAST(SUM({REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 1 AND l.l_quantity <= 15)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity >= 10 AND l.l_quantity <= 25)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 20 AND l.l_quantity <= 35)
    """,
    tags=("J1", "disjunctive-predicate", "agg"),
    bench=True,
)
def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    derives the pushable residuals itself (brand IN (...) to the part scan,
    quantity range to the lineitem scan) from this single mixed predicate —
    written naturally, no manual pre-split."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (q >= 1)
            & (q <= 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & (q >= 10)
            & (q <= 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & (q >= 20)
            & (q <= 35)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            _d18(F.sum(_rev())).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# --- Q20: excess shipments -> supplier semi-join ---------------------------


@register(
    "excess_shipment_suppliers",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DECIMAL(18,4)) AS total_qty,
        CAST(COALESCE(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                 THEN CAST(l_quantity AS DECIMAL(24,6)) END), 0)
             AS DECIMAL(18,4)) AS qty_1997
      FROM lineitem GROUP BY l_suppkey, l_partkey),
    hot AS (SELECT DISTINCT l_suppkey FROM shipped
            WHERE qty_1997 * 2 > total_qty AND total_qty > 0)
    SELECT s.s_suppkey AS suppkey, s.s_name AS name
    FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN hot h ON s.s_suppkey = h.l_suppkey
    WHERE n.n_name IN ('NATION_5', 'NATION_6')
    """,
    tags=("agg", "semi-join", "nested-threshold"),
)
def q_excess_shipment_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped more than half a part's
    lifetime quantity in one year (availqty stood in by lifetime shipments —
    no partsupp table). Threshold in exact decimal via qty*2 > total. The
    one lineitem shuffle produces per-(supplier,part) sums; everything after
    operates on that small frame."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6")
    )
    qty = F.col("l_quantity").cast(DMUL_L)
    in97 = (
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    shipped = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(qty).cast("decimal(18,4)").alias("total_qty"),
        F.coalesce(
            F.sum(F.when(in97, qty)), F.lit(0).cast("decimal(34,6)")
        )
        .cast("decimal(18,4)")
        .alias("qty_1997"),
    )
    hot = (
        shipped.filter(
            (F.col("qty_1997") * 2 > F.col("total_qty")) & (F.col("total_qty") > 0)
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(hot, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name")
        )
    )


# --- Q6: pure scan filter-aggregate ----------------------------------------


@register(
    "forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))
                          * CAST(l_discount AS DECIMAL(12,6)))
                AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.02 AND l_discount <= 0.04
      AND l_quantity < 24
    """,
    tags=("scan", "agg", "pushdown"),
    bench=True,
)
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: no join, no group-by — one codegen'd scan with every
    predicate pushed to parquet (date range reaches PushedFilters; the scan
    reads 4 columns of 11) and a single partial+final aggregate. This is
    the pure scan-throughput datapoint of the bench set: at 100 TB it
    measures storage bandwidth x predicate selectivity, nothing else."""
    l = table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (disc >= 0.02)
            & (disc <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _d18(F.sum(F.col("l_extendedprice").cast(DMUL_L) * disc.cast(DMUL_R)))
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
