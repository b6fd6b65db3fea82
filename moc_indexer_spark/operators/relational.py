"""Relational operators mirroring the reference's read surface (SURVEY.md §2.2-2.8).

Reference semantics reproduced here:
- tx-list filter/sort/paginate/count   /root/reference/webservice/bp_user_operations.py:9-93
- NOT-IN excluded events               /root/reference/webservice/bp_user_operations.py:35
- top-1 latest                         /root/reference/webservice/bp_prices.py:22-34
- latest-row-per-key singleton         /root/reference/indexer/scan_events_txs.py:43-48
- as-of lookups                        /root/reference/indexer/scan_moc_state.py:76-81,
                                       /root/reference/webservice/bp_prices.py:44-60
- group-by distinct address counts     /root/reference/report/historical.py:144-165
- registered-user semi-join            /root/reference/indexer/events/token_riskpro.py:50-53
- confirming-percent maturation        /root/reference/indexer/scan_transaction_status.py:34-46

Scale notes:
- Pagination: `orderBy(...).limit(skip+n)` compiles to TakeOrderedAndProject —
  a per-partition top-k + single-reducer merge of only skip+n rows. The
  row_number window then runs over those <=skip+n rows only. Never a global
  sort of the full table.
- Latest-per-key: row_number over (key, ts desc) is a single hash shuffle on
  the key; at 100 TB this is the minimal-shuffle formulation (no join back).
- Semi/anti joins against small dimension tables are broadcast — no shuffle
  of the fact side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def page_top_k(
    df: DataFrame,
    order_by: Sequence,
    skip: int,
    limit: int,
    rn_col: str = "rn",
) -> DataFrame:
    """Mongo `sort().skip().limit()` (bp_user_operations.py:69) as Spark top-k.

    `order_by` must be a total order (pass tiebreaker columns) so pages are
    deterministic. Physical plan: TakeOrderedAndProject(skip+limit) then a
    window over that bounded set — no global sort.
    """
    top = df.orderBy(*order_by).limit(skip + limit)
    w = Window.orderBy(*order_by)
    return (
        top.withColumn(rn_col, F.row_number().over(w).cast("bigint"))
        .filter((F.col(rn_col) > skip) & (F.col(rn_col) <= skip + limit))
    )


def top_1_latest(df: DataFrame, order_by: Sequence) -> DataFrame:
    """`find_one(sort=[(ts, -1)])` (bp_prices.py:22-34): global latest row."""
    return df.orderBy(*order_by).limit(1)


def latest_per_key(df: DataFrame, keys: Sequence[str], order_by: Sequence) -> DataFrame:
    """Latest-row-per-key singleton view (J7; scan_events_txs.py:43-48).

    One hash shuffle on `keys`; the filter happens map-side post-shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def as_of(df: DataFrame, ts_col: str, cutoff, order_by: Sequence) -> DataFrame:
    """As-of lookup (J3; scan_moc_state.py:76-81): latest row with ts < cutoff."""
    return df.filter(F.col(ts_col) < F.lit(cutoff)).orderBy(*order_by).limit(1)


def as_of_range(
    df: DataFrame, ts_col: str, lo, hi, order_by: Sequence
) -> DataFrame:
    """Range-bounded as-of (J4; bp_prices.py:44-60): latest row in [lo, hi)."""
    return (
        df.filter((F.col(ts_col) >= F.lit(lo)) & (F.col(ts_col) < F.lit(hi)))
        .orderBy(*order_by)
        .limit(1)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """Distributed keyed as-of join: for each left row, the latest right row
    with right_ts <= left_ts for the same key (LEFT semantics — unmatched
    rows keep null values); `direction="forward"` flips to the EARLIEST
    right row with right_ts >= left_ts (the next-event lookup — funnel
    attribution, time-to-fill). Spark has no ASOF JOIN; the scalable
    formulation is the union-tag trick:

      union(left, right) -> one hash shuffle on key -> per-key time order ->
      last_value(value, ignoreNulls) running window -> keep left rows

    One shuffle total, no range self-join, no per-key collect. This is the
    balance-history reconstruction SURVEY.md §7 calls the hard part of J6:
    at 100 TB the union is two columnar scans and the window runs inside
    one partition per key group.

    At equal timestamps the right row is visible to the left row
    (`<=` / `>=` semantics) — right rows sort first via the tag. The
    forward form is the SAME running-window scan over the reversed time
    order, so both directions cost one shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    lcols = [c for c in left.columns]
    l2 = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    # right rows first at equal ts => visible to left rows at the same ts
    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.desc("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col("__tag") == 0)
        .select(
            *lcols,
            *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols],
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Range join: point rows matched to every interval containing them
    (start <= ts < end) — without a nested-loop cross product.

    Binning: each point maps to one time bin; each interval explodes to the
    bins it overlaps. An EQUI-join on the bin produces a superset of
    candidates that a final range filter refines — exact result, hash-join
    plan. At 100 TB: shuffle cost ∝ rows x (interval_len / bin), versus a
    nested-loop's |points| x |intervals|. Pick bin ~ median interval length.

    The reference has no interval join (SURVEY.md §2.3 note) — this is the
    Spark-native operator for settlement-window / session-window analytics.
    """
    p_bin = F.floor(F.unix_micros(F.col(point_ts)) / (bin_seconds * 1_000_000))
    i_start_bin = F.floor(
        F.unix_micros(F.col(start_ts)) / (bin_seconds * 1_000_000)
    )
    i_end_bin = F.floor(
        F.unix_micros(F.col(end_ts)) / (bin_seconds * 1_000_000)
    )
    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn(
        "__bin", F.explode(F.sequence(i_start_bin, i_end_bin))
    )
    joined = p.join(i, "__bin")
    return joined.filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    ).drop("__bin")


def paginate_with_total(
    df: DataFrame, order_by: Sequence, skip: int, limit: int
) -> DataFrame:
    """Page + total count in one result (bp_user_operations.py:69,91).

    The reference issues two Mongo queries (page + count_documents); here the
    count is a scalar aggregate cross-joined onto the bounded page — the full
    table is scanned once for the count (cheap columnar count-star) and only
    skip+limit rows are ever materialized for the page.

    Empty-page caveat: an out-of-range skip yields ZERO rows, so the
    total rides on no row (the SQL-natural relational shape, and what the
    oracle computes). An API that must report the total even for an empty
    page issues the count separately, like the reference — see
    serving_http.tx_list.
    """
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    page = page_top_k(df, order_by, skip, limit)
    return page.crossJoin(F.broadcast(total))


def confirming_percent(confirmations_col, confirm_blocks: int = 10):
    """Column expr: maturation percent, `least(100, confirmations*10)`.

    Mirrors /root/reference/indexer/scan_transaction_status.py:34-46 with
    confirm_blocks=10 (settings-moc-mainnet2.json:19).
    """
    step = 100 // confirm_blocks
    return F.least(F.lit(100).cast("bigint"), (confirmations_col * step).cast("bigint"))


def reconcile(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Keyed table reconciliation: full-outer diff emitting one row per
    divergent key with status 'only_left' / 'only_right' / 'mismatch'
    (identical rows produce nothing). The replica-validation op for any
    sink this engine mirrors (the Mongo serving copy, a migrated table).

    Null-safe: compared columns are packed into one struct per side and
    checked with <=>, so NULL==NULL counts as equal. At scale this is one
    sort-merge full-outer shuffle on the key — or ZERO shuffle when both
    sides are bucketed on the key (tables.write_bucketed_table).
    """
    lv = left.select(*keys, F.struct(*compare_cols).alias("__lv"))
    rv = right.select(*keys, F.struct(*compare_cols).alias("__rv"))
    j = lv.join(rv, list(keys), "full_outer")
    status = (
        F.when(F.col("__rv").isNull() & F.col("__lv").isNotNull(), "only_left")
        .when(F.col("__lv").isNull() & F.col("__rv").isNotNull(), "only_right")
        .when(~F.col("__lv").eqNullSafe(F.col("__rv")), "mismatch")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )
