"""Distributed PageRank over a relational graph, exact-replayable.

No reference analog (BASELINE.json north star) — graph centrality over
entity-interaction edges (customer<->supplier trade here; address<->contract
transfer graphs in the chain domain) is a standard curation signal for
training-data pipelines (domain authority weighting) and the second
iterative-algorithm certification next to `operators/clustering.py`.

Spark-first shape: each power iteration is
  edges ⋈ ranks -> groupBy dst partial-sum -> left join onto the node list
with the rank vector treated as the DIMENSION side. By default
(broadcast_ranks=True) ranks broadcast, so cached edges never reshuffle
and the only per-superstep exchange is the map-side-combined message
aggregation; `broadcast_ranks=False` switches to a co-partitioned
shuffle join against the cached src-partitioned edge layout for
billion-node graphs (the Pregel layout — only the |V|-sized rank side
moves). Iterations unroll into a single Catalyst plan (only the plan
visits the driver). At 100 TB of edges the shuffle key is the 8-ish-byte
node id, AQE handles hub skew, and a production loop would checkpoint
ranks every ~5 rounds to reset lineage — none of which changes per-round
physics.

Exact cross-engine determinism (same discipline as kmeans): ranks are
DECIMAL(20,12); the only IEEE-double steps are the contribution division
rank/outdeg (rounded to 12 and frozen back to decimal — integer-divisor
quotients have no mass near decimal rounding boundaries) and the one
teleport scalar 0.15/N. The damping update itself runs in EXACT decimal:
0.85 (DECIMAL(3,2)) times an exact 12-digit inflow lands on a "..50"
half-way digit about 1 in 10 times, so doing it in binary and rounding
lets last-ulp noise pick the direction per engine — measured divergence
at sf0.01, node c:6, true product ...060499999986 (Spark's
BigDecimal-of-shortest-repr rounds down, DuckDB's multiply-by-1e12 rounds
up). Decimal HALF_UP is identical in both engines, so the exact-decimal
form is replayable by construction. Dangling nodes cannot exist here
(edges are emitted in both directions), so the redistribution term is
exactly the uniform teleport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85
TELEPORT = 0.15
ITERS = 3

# the most recent materialized result: each pagerank() call releases the
# previous call's cache, so a session running the correctness gate or the
# sweep repeatedly holds AT MOST ONE |V|-sized rank cache (the
# dedup_clusters precedent: the result itself stays cached, superseded
# generations are freed)
_LAST_RESULT: list = []


def trade_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Directed edge list of the customer<->supplier trade graph: one edge
    pair per distinct (customer, supplier) trading relationship."""
    pairs = (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem.select("l_orderkey", "l_suppkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("cnode"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    rev = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    return fwd.unionAll(rev)


def pagerank(
    edges: DataFrame, iters: int = ITERS, broadcast_ranks: bool = True
) -> DataFrame:
    """`iters` damped power iterations from the uniform vector.

    Returns (node string, rank double). Every node appears as a src (the
    edge builder emits both directions), so outdeg >= 1 and no dangling
    mass correction is needed.
    """
    # Iteration-invariant relations, cached: the edge list (the one
    # expensive build — at scale this is the materialized input), the node
    # list with |V| attached, and the degree table. Without the cache the
    # unrolled plan re-derives the orders⋈lineitem join at every level;
    # worse, joining inflow back onto RANKS (instead of the static node
    # list) makes each level reference the previous ranks twice, an
    # O(2^iters) recomputation blowup — measured 12.9 s -> ~1 s at sf0.1.
    # Joining onto `nodes` is semantically identical (ranks carries the
    # same node set every round) and keeps plan growth linear.
    # With broadcast rank state (default — the rank vector is |V|-sized,
    # the dimension scale of the graph) edges never reshuffle at all; for
    # billion-node graphs flip broadcast_ranks=False, which hash-partitions
    # the cached edges on the join key once so every superstep reshuffles
    # only the rank side against the cached edge layout (Pregel shape).
    if not broadcast_ranks:
        edges = edges.repartition(F.col("src"))
    edges = edges.persist()
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    counts = (
        edges.select(F.col("src").alias("node")).distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    nodes = (
        edges.select(F.col("src").alias("node")).distinct()
        .crossJoin(F.broadcast(counts))
        .persist()
    )

    # FIXED-POINT update state: ranks are BIGINT micro-units (1e-12), and
    # every per-step operation is integer floor division / multiply — no
    # float appears until the final single cast. Round 5 kept the state
    # in DECIMAL(20,12) but fed it through ROUND(double/double, 12): a
    # quotient landing within an ulp of a 12-digit boundary lets each
    # engine round a DIFFERENT way, and the round-6 sf0.1 oracle sweep
    # measured exactly that (node c:10, one-ulp rank mismatch — invisible
    # at sf0.01). Integer ops are bit-identical in every engine: Spark's
    # `div` and DuckDB's `//` both truncate (equal on the non-negative
    # values here), int64->double conversion is exact below 2^53, and the
    # closing divide-by-1e12 (exactly representable) is one IEEE op both
    # sides share. Floor drift leaks < iters * n_nodes * 1e-12 total mass
    # — the mass-conservation pytest bounds it.
    UNIT = 10**12
    TELEPORT_UNITS = (UNIT * 15) // 100  # 0.15, exact in units
    ranks = nodes.select(
        "node",
        F.expr(f"CAST({UNIT} AS BIGINT) div n_nodes").alias("rank"),
    )
    for _ in range(iters):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            edges.join(rank_side, edges.src == ranks.node)
            .join(F.broadcast(outdeg), "src")
            .select("dst", F.expr("rank div outdeg").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(
            F.sum("c").cast("bigint").alias("inflow")
        )
        # damped = floor(0.85 * inflow) in units: inflow <= 1e12, so
        # inflow * 85 < 2^63 — no overflow
        teleport = F.expr(f"CAST({TELEPORT_UNITS} AS BIGINT) div n_nodes")
        inflow_side = F.broadcast(inflow) if broadcast_ranks else inflow
        ranks = (
            nodes.join(inflow_side, nodes.node == inflow.dst, "left")
            .select(
                "node",
                (
                    teleport
                    + F.expr(
                        "(coalesce(inflow, CAST(0 AS BIGINT)) * 85) div 100"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
    # Materialize the (|V|-sized) result and release the iteration caches:
    # a long-lived session running many queries must not accrete pinned
    # edge/node blocks per pagerank call (review finding — the caches were
    # session-lifetime before). The result stays cached so consumers read
    # it without recomputing the loop; the NEXT call frees it (bounded at
    # one live cache per session).
    out = ranks.select(
        "node",
        (F.col("rank").cast("double") / F.lit(float(UNIT))).alias("rank"),
    ).persist()
    out.count()
    edges.unpersist()
    nodes.unpersist()
    while _LAST_RESULT:
        _LAST_RESULT.pop().unpersist()
    _LAST_RESULT.append(out)
    return out


def pagerank_oracle_sql(iters: int = ITERS) -> str:
    """The same FIXED-POINT damped power iteration as DuckDB SQL
    (generated CTE per iteration; identical integer expression shapes —
    DuckDB's `//` floor division matches Spark's `div` on the
    non-negative values here, so the two engines are bit-identical; see
    the integer-state note in `pagerank`)."""
    unit = 10**12
    teleport_units = (unit * 15) // 100
    parts = [
        """edges AS (
          SELECT src, dst FROM (
            SELECT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY 1, 2)
          UNION ALL
          SELECT src, dst FROM (
            SELECT 's:' || l_suppkey AS src, 'c:' || o_custkey AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY 1, 2))""",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg "
        "FROM edges GROUP BY src)",
        "counts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes)",
        f"r0 AS (SELECT node, n_nodes, CAST({unit} AS BIGINT) // n_nodes "
        "AS rank FROM nodes CROSS JOIN counts)",
    ]
    prev = "r0"
    for i in range(iters):
        parts.append(
            f"""c{i} AS (
              SELECT e.dst, r.rank // o.outdeg AS c
              FROM edges e
              JOIN {prev} r ON r.node = e.src
              JOIN outdeg o ON o.src = e.src)"""
        )
        parts.append(
            f"i{i} AS (SELECT dst, CAST(SUM(c) AS BIGINT) AS inflow "
            f"FROM c{i} GROUP BY dst)"
        )
        parts.append(
            f"""r{i + 1} AS (
              SELECT r.node, r.n_nodes,
                     CAST({teleport_units} AS BIGINT) // r.n_nodes
                     + (COALESCE(i.inflow, CAST(0 AS BIGINT)) * 85) // 100
                     AS rank
              FROM {prev} r LEFT JOIN i{i} i ON i.dst = r.node)"""
        )
        prev = f"r{i + 1}"
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT node, CAST(rank AS DOUBLE) / {float(unit)} AS rank "
        f"FROM {prev}"
    )
