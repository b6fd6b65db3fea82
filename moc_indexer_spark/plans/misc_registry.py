"""Registry batch 5: remaining scalar-function line items from SURVEY.md
§2.7 — F8 unix-epoch timestamps, F9 bookkeeping timestamps (shape only;
current_timestamp itself is non-deterministic so the oracle pins the same
constant), F14 string→bool coercion, F18 JSON serialization of results."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import table, transactions
from .registry import TX_WITH, register
from ..streaming.windows import tumbling_agg


@register(
    "unix_epoch_roundtrip",
    f"""
    {TX_WITH}
    SELECT tx_hash,
           CAST(FLOOR(epoch(created_at)) AS BIGINT) AS unix_sec,
           CAST(to_timestamp(CAST(FLOOR(epoch(created_at)) AS BIGINT)) AS TIMESTAMP)
             AS ts_from_unix
    FROM transactions WHERE address = 3
    """,
    tags=("F8",),
)
def q_unix_epoch_roundtrip(spark, sf_dir):
    """F8: unix seconds <-> timestamp (scan_raw_txs.py:45-49 block-time
    handling)."""
    t = transactions(spark, sf_dir).filter(F.col("address") == 3)
    unix_sec = F.floor(F.unix_micros("created_at") / 1_000_000).cast("bigint")
    return t.select(
        "tx_hash",
        unix_sec.alias("unix_sec"),
        F.timestamp_seconds(unix_sec).alias("ts_from_unix"),
    )


@register(
    "bool_coercion",
    f"""
    {TX_WITH},
    s AS (SELECT tx_hash,
                 CASE WHEN address % 3 = 0 THEN 'True'
                      WHEN address % 3 = 1 THEN 'false' ELSE 'TRUE' END AS flag_str
          FROM transactions)
    SELECT tx_hash, flag_str,
           (lower(flag_str) = 'true') AS is_addition
    FROM s
    """,
    tags=("F14",),
)
def q_bool_coercion(spark, sf_dir):
    """F14: the RedeemRequestAlter isAddition field arrives as bool OR
    'True'/'False' string (mocsettlement.py:97-104) — normalize via
    lower()=='true'."""
    t = transactions(spark, sf_dir)
    flag = (
        F.when(F.col("address") % 3 == 0, "True")
        .when(F.col("address") % 3 == 1, "false")
        .otherwise("TRUE")
    )
    return t.select(
        "tx_hash",
        flag.alias("flag_str"),
        (F.lower(flag) == "true").alias("is_addition"),
    )


@register(
    "json_result_envelope",
    f"""
    {TX_WITH}
    SELECT tx_hash,
           to_json(struct_pack(tx_hash := tx_hash, event := event,
                               amount := amount)) AS doc
    FROM transactions WHERE address = 3
    """,
    tags=("F18",),
)
def q_json_result_envelope(spark, sf_dir):
    """F18: BSON/JSON serialization of result rows (lib_tools.py:34-35) —
    the API response envelope, built engine-side with to_json(struct)."""
    t = transactions(spark, sf_dir).filter(F.col("address") == 3)
    return t.select(
        "tx_hash",
        F.to_json(F.struct(
            F.col("tx_hash"), F.col("event"), F.col("amount")
        )).alias("doc"),
    )


@register(
    "hourly_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE)
             AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("window", "event-time", "T1"),
    bench=True,
)
def q_hourly_window_agg(spark, sf_dir):
    """Tumbling event-time window aggregation (batch form; the streaming
    form with watermark is streaming/windows.py `streaming_tumbling_agg`,
    replay-tested in test_windows.py)."""
    return tumbling_agg(table(spark, sf_dir, "events"), "1 hour")


@register(
    "user_sessions_native",
    f"""
    {TX_WITH},
    g AS (SELECT address, created_at, tx_hash,
            CASE WHEN epoch_us(created_at) - epoch_us(LAG(created_at) OVER (
                   PARTITION BY address ORDER BY created_at, tx_hash)) >= 1800000000
                 OR LAG(created_at) OVER (
                   PARTITION BY address ORDER BY created_at, tx_hash) IS NULL
                 THEN 1 ELSE 0 END AS new_session
          FROM transactions),
    s AS (SELECT *, CAST(SUM(new_session) OVER (
            PARTITION BY address ORDER BY created_at, tx_hash
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
          FROM g)
    SELECT address, COUNT(*) AS n_events,
           MIN(created_at) AS session_start, MAX(created_at) AS session_end
    FROM s GROUP BY address, sid
    """,
    tags=("window", "session-window"),
)
def q_user_sessions_native(spark, sf_dir):
    """Spark's NATIVE session_window (30-min gap) checked against the
    lag+cumsum SQL formulation — two independent algorithms, same result.
    Boundary semantics pinned to Spark's: session_window ranges are
    [start, last_event + gap), so an event arriving EXACTLY gap after
    the previous one opens a NEW session — the oracle's lag test is
    therefore >= gap, not > (the lag-based q_user_sessions in
    relational_extra keeps its own internally-consistent > contract on
    both sides).
    In streaming this same expression runs with a watermark for
    incremental sessionization."""
    t = transactions(spark, sf_dir)
    return (
        t.groupBy(
            F.session_window("created_at", "30 minutes").alias("w"), "address"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("created_at").alias("session_start"),
            F.max("created_at").alias("session_end"),
        )
        .select("address", "n_events", "session_start", "session_end")
    )


@register(
    "validated_sources",
    """
    SELECT source, COUNT(*) AS n_docs FROM documents
    WHERE regexp_matches(source, '^src[0-9]+$')
    GROUP BY source
    """,
    tags=("P9", "validation"),
)
def q_validated_sources(spark, sf_dir):
    """P9 input validation (lib_tools.py:28-31 hex-address check analog):
    regex-validated identifiers before aggregation."""
    d = table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source").rlike("^src[0-9]+$"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


# USDAmount mirror of functions/wei.py usd_amount (mocexchange.py:47-50):
# Spark computes CAST(CAST(a AS DEC(38,0)) / 1e9 AS DEC(19,0)) — a DOUBLE
# rounding (HALF_UP to 6 dp by decimal division typing, then HALF_UP to
# integer by the cast). The HUGEINT mirror replicates both steps exactly
# for non-negative a: half-up to 1e-6 units, then half-up to integer.
def _sql_gwei(expr: str) -> str:
    return f"(((({expr}) + 500) // 1000) + 500000) // 1000000"


def _event_pipeline_oracle() -> str:
    from ..operators.events import EXCHANGE_EVENTS
    from ..sources.fixtures import ensure_fixture_parquet

    path = ensure_fixture_parquet()
    names = ", ".join(f"'{e}'" for e in EXCHANGE_EVENTS)
    j = "json_extract_string(l.payload, '$.{}')"
    return f"""
    WITH logs AS (
      SELECT r.hash AS tx_hash, r.blockNumber AS block_number,
             CAST(r.gas_used AS HUGEINT) AS gas_used,
             CAST(r.gasPrice AS HUGEINT) AS gas_price,
             UNNEST(r.logs) AS l
      FROM read_parquet('{path}') r
      WHERE r.status = 'confirmed'),
    ex AS (
      SELECT tx_hash, block_number, gas_used, gas_price,
             l.event_name AS event,
             lower({j.format('account')}) AS address,
             CAST({j.format('reserveTotal')} AS HUGEINT) AS reserve_total,
             CAST({j.format('commission')} AS HUGEINT)
               + COALESCE(CAST({j.format('btcMarkup')} AS HUGEINT),
                          CAST({j.format('reserveTokenMarkup')} AS HUGEINT),
                          0) AS rbtc_commission,
             CAST({j.format('reservePrice')} AS HUGEINT) AS reserve_price,
             COALESCE(CAST({j.format('interests')} AS HUGEINT), 0) AS interests
      FROM logs WHERE l.event_name IN ({names})),
    derived AS (
      SELECT *,
             ({_sql_gwei('reserve_total')}) * ({_sql_gwei('reserve_price')})
               AS usd_amount,
             reserve_total + rbtc_commission + interests
               + gas_used * gas_price AS magnitude,
             event LIKE '%Mint' AS is_positive
      FROM ex)
    SELECT tx_hash AS "transactionHash", address, block_number AS "blockNumber",
           event,
           CAST(usd_amount AS VARCHAR) AS usd_amount_wei,
           CAST(CASE WHEN is_positive THEN magnitude ELSE -magnitude END
                AS VARCHAR) AS rbtc_total_wei,
           is_positive AS "isPositive"
    FROM derived
    """


@register(
    "event_pipeline_demo",
    _event_pipeline_oracle(),
    tags=("J2", "pipeline", "demo"),
)
def q_event_pipeline_demo(spark, sf_dir):
    """The full decode->demux->enrich pipeline (J2) over the deterministic
    reference-shaped fixture stream (FIXTURES.md §1-2), PERSISTED to
    parquet so DuckDB re-derives USDAmount / commission-fallback / gas fee
    / signed RBTCTotal (mocexchange.py:47-89) from the same bytes with
    independent HUGEINT decimal arithmetic — the J2 driver gate. The
    formulas are additionally verified against an arbitrary-precision
    Decimal reference in tests/test_event_pipeline.py."""
    from ..operators.events import run_event_pipeline
    from ..sources.fixtures import ensure_fixture_parquet
    from ..tables import _read_ntz_as_ltz

    raw = _read_ntz_as_ltz(spark, ensure_fixture_parquet())
    tx = run_event_pipeline(raw, only=("transactions",))["transactions"]
    return tx.select(
        "transactionHash", "address", "blockNumber", "event",
        F.col("USDAmount").cast("string").alias("usd_amount_wei"),
        F.col("RBTCTotal").cast("string").alias("rbtc_total_wei"),
        "isPositive",
    )


@register(
    "event_pipeline_raw_hex",
    _event_pipeline_oracle(),
    tags=("J2", "F2", "abi", "pipeline"),
)
def q_event_pipeline_raw_hex(spark, sf_dir):
    """The J2 pipeline driven from RAW LOG HEX (F2 full): each fixture
    exchange payload is first ENCODED into the ABI wire layout (indexed
    account topic + big-endian uint256 data words — what an EVM node
    returns, cf. reference `_decode_logs` scan_events_txs.py:144), then
    DECODED back with the expression-level ABI decoder (functions/abi.py
    decode_log), and the money enrichment runs on the decoded structs.
    Encode and decode use disjoint primitives (pmod/divide/hex vs
    substring/conv), and the DuckDB oracle re-derives the money columns
    from the original JSON — so a bit slip anywhere in the hex plumbing
    or a formula drift both hash-mismatch."""
    from ..functions import abi as A
    from ..operators.events import (
        EXCHANGE_FIELDS, _exchange_select, explode_logs,
    )
    from ..sources.fixtures import ensure_fixture_parquet
    from ..tables import _read_ntz_as_ltz

    DEC38 = "decimal(38,0)"
    raw = _read_ntz_as_ltz(spark, ensure_fixture_parquet())
    logs = explode_logs(raw).filter(F.col("receipt_status") == "confirmed")
    parsed = logs.withColumn("ev", F.from_json("payload", EXCHANGE_FIELDS))

    def _enc_cols(prox: bool) -> dict:
        dec = lambda c: F.col(f"ev.{c}").cast(DEC38)
        cols = {
            "account": F.col("ev.account"),
            "amount": dec("amount"),
            "reserveTotal": dec("reserveTotal"),
            "commission": dec("commission"),
            "reservePrice": dec("reservePrice"),
            "mocCommissionValue": dec("mocCommissionValue"),
            "mocPrice": dec("mocPrice"),
            # wire format has ONE markup slot; the F5 payload variants both
            # feed it (the enrichment's coalesce does the same)
            "btcMarkup": F.coalesce(
                dec("btcMarkup"), dec("reserveTokenMarkup"), F.lit(0).cast(DEC38)
            ),
            "mocMarkup": F.coalesce(dec("mocMarkup"), F.lit(0).cast(DEC38)),
        }
        if prox:
            cols["interests"] = F.coalesce(dec("interests"), F.lit(0).cast(DEC38))
            cols["leverage"] = F.coalesce(dec("leverage"), F.lit(0).cast(DEC38))
        return cols

    groups = {
        "RiskProxMint": (("RiskProxMint", "RiskProxRedeem"), True),
        "RiskProMint": (
            ("RiskProMint", "RiskProRedeem", "StableTokenMint",
             "StableTokenRedeem", "FreeStableTokenRedeem"),
            False,
        ),
    }
    null38 = F.lit(None).cast(DEC38)
    parts = []
    for abi_name, (names, prox) in groups.items():
        wire = (
            parsed.filter(F.col("event_name").isin(list(names)))
            .withColumn("w", A.encode_log(abi_name, _enc_cols(prox)))
            .drop("ev")
        )
        dec = wire.withColumn(
            "ev", A.decode_log(abi_name, F.col("w.topics"), F.col("w.data"))
        )
        # normalize the decoded struct to the enrichment's field shape
        dec = dec.withColumn(
            "ev",
            F.struct(
                F.col("ev.account").alias("account"),
                F.col("ev.amount").alias("amount"),
                F.col("ev.reserveTotal").alias("reserveTotal"),
                F.col("ev.commission").alias("commission"),
                F.col("ev.reservePrice").alias("reservePrice"),
                F.col("ev.mocCommissionValue").alias("mocCommissionValue"),
                F.col("ev.mocPrice").alias("mocPrice"),
                F.col("ev.btcMarkup").alias("btcMarkup"),
                null38.alias("reserveTokenMarkup"),
                (F.col("ev.interests") if prox else null38).alias("interests"),
            ),
        ).drop("w")
        parts.append(dec)
    decoded = parts[0].unionByName(parts[1])
    tx = _exchange_select(decoded)
    return tx.select(
        "transactionHash", "address", "blockNumber", "event",
        F.col("USDAmount").cast("string").alias("usd_amount_wei"),
        F.col("RBTCTotal").cast("string").alias("rbtc_total_wei"),
        "isPositive",
    )


@register(
    "abi_decode_roundtrip",
    """
    SELECT tx_hash,
           '0x' || lpad(lower(to_hex(address)), 40, '0') AS from_addr,
           CAST(address % 97 AS BIGINT) AS nonce,
           CAST(round(amount * 1000000) AS BIGINT) AS value
    FROM (SELECT event_id AS tx_hash, user_id AS address, value AS amount
          FROM events)
    """,
    tags=("F2", "abi", "decode"),
)
def q_abi_decode_roundtrip(spark, sf_dir):
    """Raw ABI decode driven end-to-end: encode each event's address and
    scaled amount into 32-byte hex words exactly as an EVM log would carry
    them (padded topics, big-endian uint256 data), then decode with the
    expression-level decoder (functions/abi.py). The oracle is the
    IDENTITY on the source values — so any bit slip in either direction of
    the hex plumbing hash-mismatches. Everything stays in whole-stage
    codegen; no UDF on either leg."""
    from ..functions import abi
    from ..tables import table

    ev = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("tx_hash"),
        F.col("user_id").alias("address"),
        F.col("value").alias("amount"),
    )
    # encode: the wire format (64-hex words)
    addr_topic = F.concat(
        F.lit("0x"), F.lpad(F.lower(F.hex(F.col("address"))), 64, "0")
    )
    value_word = F.lpad(
        F.lower(F.hex(F.round(F.col("amount") * 1000000).cast("bigint"))), 64, "0"
    )
    nonce_word = F.lpad(F.lower(F.hex(F.col("address") % 97)), 64, "0")
    enc = ev.select(
        "tx_hash",
        addr_topic.alias("t1"),
        value_word.alias("w_value"),
        nonce_word.alias("w_nonce"),
    )
    # decode back with the ABI expressions
    return enc.select(
        "tx_hash",
        abi.topic_address(F.col("t1")).alias("from_addr"),
        abi.hex_to_decimal(F.col("w_nonce")).cast("bigint").alias("nonce"),
        abi.hex_to_decimal(F.col("w_value")).cast("bigint").alias("value"),
    )


@register(
    "block_gap_report",
    f"""
    {TX_WITH},
    s AS (SELECT tx_hash AS block_no,
                 LAG(tx_hash) OVER (ORDER BY tx_hash) AS prev_no
          FROM transactions WHERE event = 'purchase')
    SELECT prev_no + 1 AS gap_start, block_no - 1 AS gap_end,
           CAST(block_no - prev_no - 1 AS BIGINT) AS n_missing
    FROM s WHERE prev_no IS NOT NULL AND block_no - prev_no > 1
    """,
    tags=("T10", "integrity", "window"),
)
def q_block_gap_report(spark, sf_dir):
    """Indexed-sequence gap detection — the integrity sweep behind the
    reference's liveness watchdog (scan_utils.py:17-58 checks the tip
    advanced; this finds any hole the checkpoint cursor skipped). One LAG
    over the ordered id sequence; each gap reports its inclusive range and
    size. At scale the sort is one range-partitioned shuffle and gaps
    stream out as a tiny relation — run it per partition-day, not
    globally."""
    t = transactions(spark, sf_dir).filter(F.col("event") == "purchase")
    w = Window.orderBy("tx_hash")
    s = t.select(
        F.col("tx_hash").alias("block_no"),
        F.lag("tx_hash").over(w).alias("prev_no"),
    )
    return s.filter(
        F.col("prev_no").isNotNull() & (F.col("block_no") - F.col("prev_no") > 1)
    ).select(
        (F.col("prev_no") + 1).alias("gap_start"),
        (F.col("block_no") - 1).alias("gap_end"),
        (F.col("block_no") - F.col("prev_no") - 1).cast("bigint").alias("n_missing"),
    )


@register(
    "top_event_per_address",
    f"""
    {TX_WITH},
    c AS (SELECT address, event, COUNT(*) AS n
          FROM transactions GROUP BY address, event),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY address
                                       ORDER BY n DESC, event ASC) AS rn
          FROM c)
    SELECT address, event AS top_event, CAST(n AS BIGINT) AS n_events
    FROM r WHERE rn = 1
    """,
    tags=("A1", "window", "mode"),
)
def q_top_event_per_address(spark, sf_dir):
    """Per-key mode (most frequent event per address). max_by would be
    one aggregate but breaks ties arbitrarily — engine-dependent, so the
    deterministic form is count + ROW_NUMBER with an explicit (n desc,
    event asc) total order. Both shuffles are keyed on address (the agg's
    (address, event) partitioning satisfies the window's address
    partitioning prefix, so AQE reuses the exchange)."""
    t = transactions(spark, sf_dir)
    c = t.groupBy("address", "event").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("address").orderBy(F.desc("n"), F.asc("event"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "address",
            F.col("event").alias("top_event"),
            F.col("n").cast("bigint").alias("n_events"),
        )
    )


@register(
    "event_journeys",
    f"""
    {TX_WITH}
    SELECT address,
           string_agg(event, '>' ORDER BY created_at, tx_hash) AS journey,
           CAST(COUNT(*) AS BIGINT) AS n_steps
    FROM transactions WHERE address % 25 = 0
    GROUP BY address
    """,
    tags=("A1", "journey", "ordered-agg"),
)
def q_event_journeys(spark, sf_dir):
    """Per-user event journey (the funnel/path-analysis primitive): the
    full ordered event sequence as one string per address. Spark has no
    ORDER BY inside an aggregate — the deterministic idiom is collect
    structs, array_sort (orders by field order: created_at, tx_hash),
    project the event, join. One shuffle; the sort is per-group in memory,
    so at 100 TB you'd bound the group (as here) or window it by day."""
    t = transactions(spark, sf_dir).filter(F.col("address") % 25 == 0)
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("created_at", "tx_hash", "event"))
            ),
            lambda s: s["event"],
        ),
        ">",
    )
    return t.groupBy("address").agg(
        seq.alias("journey"),
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
    )


@register(
    "event_transitions",
    f"""
    {TX_WITH},
    s AS (SELECT address, event,
                 LEAD(event) OVER (PARTITION BY address
                                   ORDER BY created_at, tx_hash) AS next_event
          FROM transactions)
    SELECT event, next_event, CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE next_event IS NOT NULL
    GROUP BY event, next_event
    """,
    tags=("window", "journey", "markov"),
)
def q_event_transitions(spark, sf_dir):
    """First-order transition counts over per-user event streams (the
    Sankey/Markov-chain input and the aggregate view of `event_journeys`).
    One shuffle on address feeds the LEAD window; the (event, next) pairs
    then reduce with map-side combine to a vocabulary-sized relation."""
    t = transactions(spark, sf_dir)
    w = Window.partitionBy("address").orderBy("created_at", "tx_hash")
    s = t.select(
        "event", F.lead("event").over(w).alias("next_event")
    ).filter(F.col("next_event").isNotNull())
    return s.groupBy("event", "next_event").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@register(
    "first_touch_attribution",
    f"""
    {TX_WITH},
    f AS (SELECT address, event AS first_event,
                 ROW_NUMBER() OVER (PARTITION BY address
                                    ORDER BY created_at, tx_hash) AS rn
          FROM transactions),
    tot AS (SELECT address,
                   CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DECIMAL(18,4))
                        AS DOUBLE) AS lifetime_amount
            FROM transactions GROUP BY address)
    SELECT f.first_event, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(CAST(SUM(CAST(tot.lifetime_amount AS DECIMAL(18,6)))
                AS DECIMAL(18,4)) AS DOUBLE) AS total_lifetime_amount
    FROM f JOIN tot ON f.address = tot.address
    WHERE f.rn = 1
    GROUP BY f.first_event
    """,
    tags=("window", "attribution", "J1"),
)
def q_first_touch_attribution(spark, sf_dir):
    """First-touch attribution: users grouped by their FIRST event, with
    the cohort's lifetime value. Both inputs shuffle once on address (the
    first-touch window and the lifetime aggregate share partitioning, so
    the join is exchange-free); per-address amounts aggregate in exact
    decimal before the cohort re-sum, so the double edge cast happens on
    already-rounded values identically in both engines."""
    t = transactions(spark, sf_dir)
    w = Window.partitionBy("address").orderBy("created_at", "tx_hash")
    f = (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("address", F.col("event").alias("first_event"))
    )
    tot = t.groupBy("address").agg(
        F.sum(F.col("amount").cast("decimal(18,6)"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("lifetime_amount")
    )
    return (
        f.join(tot, "address")
        .groupBy("first_event")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.col("lifetime_amount").cast("decimal(18,6)"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("total_lifetime_amount"),
        )
    )


@register(
    "activity_heatmap",
    f"""
    {TX_WITH}
    SELECT CAST(dayofweek(created_at) AS INTEGER) AS dow,
           CAST(EXTRACT(hour FROM created_at) AS INTEGER) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DECIMAL(18,4))
                AS DOUBLE) AS total_amount
    FROM transactions GROUP BY 1, 2
    """,
    tags=("F10", "A1", "heatmap"),
)
def q_activity_heatmap(spark, sf_dir):
    """Weekday x hour activity heatmap — the ops-dashboard staple. Day
    numbering differs across engines (Spark dayofweek is 1=Sunday, DuckDB
    0=Sunday) so the Spark side normalizes to DuckDB's zero-based form;
    one grouped pass, 168 output cells."""
    t = transactions(spark, sf_dir)
    return (
        t.groupBy(
            (F.dayofweek("created_at") - 1).cast("int").alias("dow"),
            F.hour("created_at").cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("amount").cast("decimal(18,6)"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("total_amount"),
        )
    )


@register(
    "session_duration_stats",
    f"""
    {TX_WITH},
    s AS (SELECT address, created_at, tx_hash,
            CASE WHEN created_at - LAG(created_at) OVER
                   (PARTITION BY address ORDER BY created_at, tx_hash)
                 > INTERVAL 30 MINUTE OR LAG(created_at) OVER
                   (PARTITION BY address ORDER BY created_at, tx_hash) IS NULL
                 THEN 1 ELSE 0 END AS new_session
          FROM transactions),
    g AS (SELECT address, created_at,
            SUM(new_session) OVER (PARTITION BY address
                                   ORDER BY created_at, tx_hash
                                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM s),
    d AS (SELECT address, session_id,
                 CAST(FLOOR(EXTRACT(epoch FROM MAX(created_at) - MIN(created_at)))
                      AS BIGINT) AS dur_s,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM g GROUP BY address, session_id)
    SELECT address, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(dur_s) AS BIGINT) AS total_duration_s,
           CAST(MAX(dur_s) AS BIGINT) AS longest_s,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM d GROUP BY address
    """,
    tags=("window", "session", "A1"),
)
def q_session_duration_stats(spark, sf_dir):
    """Per-user session duration summary on top of the lag-based session
    ids (the 30-min-gap rule of `user_sessions`): durations computed as
    integer epoch seconds (exact), then counted/summed per address. All
    three windows and both group-bys share the address partitioning — one
    shuffle end-to-end."""
    t = transactions(spark, sf_dir)
    w = Window.partitionBy("address").orderBy("created_at", "tx_hash")
    prev = F.lag("created_at").over(w)
    gap = F.unix_micros(F.col("created_at")) - F.unix_micros(prev)
    s = t.withColumn(
        "new_session",
        F.when(prev.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    g = s.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    d = g.groupBy("address", "session_id").agg(
        F.floor(
            (
                F.unix_micros(F.max("created_at"))
                - F.unix_micros(F.min("created_at"))
            )
            / 1_000_000
        )
        .cast("bigint")
        .alias("dur_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return d.groupBy("address").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("dur_s").cast("bigint").alias("total_duration_s"),
        F.max("dur_s").cast("bigint").alias("longest_s"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


@register(
    "decile_share",
    f"""
    {TX_WITH},
    p AS (SELECT tx_hash, amount,
                 NTILE(10) OVER (ORDER BY amount DESC, tx_hash) AS decile
          FROM transactions WHERE event = 'purchase'),
    d AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DECIMAL(18,4))
                      AS DOUBLE) AS decile_amount
          FROM p GROUP BY decile),
    t AS (SELECT CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DECIMAL(18,4))
                      AS DOUBLE) AS total FROM p)
    SELECT d.decile, d.n, d.decile_amount,
           d.decile_amount / t.total AS share
    FROM d CROSS JOIN t
    """,
    tags=("window", "ntile", "pareto"),
)
def q_decile_share(spark, sf_dir):
    """Pareto/concentration analysis: purchases ranked into deciles by
    amount (total order: amount desc, tx_hash), each decile's share of
    total spend. The share division is the only double op and runs once
    per decile on already-rounded decimal sums — identical both engines."""
    t = transactions(spark, sf_dir).filter(F.col("event") == "purchase")
    w = Window.orderBy(F.desc("amount"), F.asc("tx_hash"))
    p = t.select("tx_hash", "amount", F.ntile(10).over(w).alias("decile"))
    d = p.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("amount").cast("decimal(18,6)"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("decile_amount"),
    )
    tot = p.agg(
        F.sum(F.col("amount").cast("decimal(18,6)"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("total")
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "decile", "n", "decile_amount",
        (F.col("decile_amount") / F.col("total")).alias("share"),
    )


@register(
    "repeat_purchase_rate",
    f"""
    {TX_WITH},
    c AS (SELECT address, COUNT(*) AS n FROM transactions
          WHERE event = 'purchase' GROUP BY address)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS repeat_buyers,
           CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
    FROM c
    """,
    tags=("A1", "metric"),
)
def q_repeat_purchase_rate(spark, sf_dir):
    """Repeat-purchase rate: one keyed aggregate then a one-row reduce;
    the rate division runs once on exact integer counts."""
    t = transactions(spark, sf_dir).filter(F.col("event") == "purchase")
    c = t.groupBy("address").agg(F.count(F.lit(1)).alias("n"))
    rep = F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
    return c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
        rep.cast("bigint").alias("repeat_buyers"),
        (rep.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "repeat_rate"
        ),
    )


@register(
    "salted_hot_key_join",
    f"""
    {TX_WITH}
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_tx,
           CAST(CAST(SUM(CAST(t.amount AS DECIMAL(18,6))) AS DECIMAL(18,4))
                AS DOUBLE) AS total_amount
    FROM transactions t JOIN customer c ON t.address = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("J1", "skew", "salting"),
)
def q_salted_hot_key_join(spark, sf_dir):
    """Hot-key join through explicit salting (operators/skew.py): the fact
    side's join key is widened with a content-derived salt and the
    dimension side replicated n_salts ways, so one exchange partition
    never carries a whole hot address (exchanges/routers own double-digit
    percents of chain rows). The oracle is the PLAIN join — salting must
    be result-invariant, and the hash compare proves it on real data, not
    just the unit fixture. (AQE skew-split covers sort-merge joins
    automatically; this is the explicit form for broadcast-ineligible
    build sides.)"""
    from ..operators.skew import salted_join

    t = transactions(spark, sf_dir).select("tx_hash", "address", "amount")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("address"), "c_mktsegment"
    )
    joined = salted_join(t, c, "address", n_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tx"),
        F.sum(F.col("amount").cast("decimal(18,6)"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("total_amount"),
    )
