"""Property-based tests (hypothesis): the upsert sink must behave exactly
like Mongo's sequential keyed upserts for ANY batch sequence, and wei math
must round-trip."""

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from moc_indexer_spark.functions import wei
from moc_indexer_spark.streaming.sink import ParquetUpsertTable

KEYS = ["k0", "k1", "k2", "k3"]

# unique (key, version) pairs per batch: with equal versions for the same
# key, a set-based MERGE may pick either row — excluded by construction so
# the expected outcome is deterministic
batch_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=st.lists(batch_strategy, min_size=1, max_size=3))
def test_versioned_upsert_equals_sequential_reference(spark, tmp_path_factory,
                                                      batches):
    """Fold the same batches through a python reference of Mongo's
    sequential versioned upserts (in-batch: highest version wins; across
    batches: monotonic >= guard); table state must match exactly."""
    path = str(tmp_path_factory.mktemp("merge")) + "/t"
    tbl = ParquetUpsertTable(spark, path, keys=["k"], version_col="ver")
    ref: dict[str, tuple[int, int]] = {}
    for batch in batches:
        tbl.upsert(spark.createDataFrame(batch, ["k", "ver", "v"]))
        best: dict[str, tuple[int, int]] = {}
        for k, ver, v in batch:
            if k not in best or ver > best[k][0]:
                best[k] = (ver, v)
        for k, (ver, v) in best.items():
            if k not in ref or ver >= ref[k][0]:
                ref[k] = (ver, v)
    got = {r.k: (r.ver, r.v) for r in tbl.read().collect()}
    assert got == ref


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(amount=st.integers(min_value=0, max_value=10**24))
def test_wei_ether_roundtrip_property(spark, amount):
    df = spark.createDataFrame([(str(amount),)], ["w"]).select(
        F.col("w").cast("decimal(38,0)").alias("w")
    )
    r = df.select(
        wei.to_wei_trunc(wei.from_wei("w")).alias("back"),
        wei.from_wei("w").alias("eth"),
    ).collect()[0]
    assert int(r.back) == amount
    assert Decimal(r.eth) == Decimal(amount) / Decimal(10**18)


# -- randomized op sequences: MoR == CoW == sequential Mongo reference ------

_op_strategy = st.one_of(
    st.tuples(st.just("upsert"), batch_strategy, st.booleans()),
    st.tuples(st.just("delete"), st.sampled_from(KEYS)),
    st.tuples(st.just("compact")),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op_strategy, min_size=2, max_size=5))
def test_op_sequences_match_sequential_reference(spark, tmp_path_factory,
                                                 ops):
    """ANY interleaving of upserts (insert and update-only), retention
    deletes, and compactions must leave MoR and CoW tables in exactly the
    state a sequential Mongo-style fold produces — including the
    delete-resets-the-version-era rule (a reinsert after a delete wins
    regardless of how its version compares to the deleted row's)."""
    base = str(tmp_path_factory.mktemp("opseq"))
    tables = {
        mode: ParquetUpsertTable(spark, f"{base}/{mode}", keys=["k"],
                                 version_col="ver", mode=mode)
        for mode in ("cow", "mor")
    }
    ref: dict[str, tuple[int, int]] = {}
    for op in ops:
        if op[0] == "upsert":
            _, batch, insert = op
            for t in tables.values():
                t.upsert(spark.createDataFrame(batch, ["k", "ver", "v"]),
                         insert=insert)
            best: dict[str, tuple[int, int]] = {}
            for k, ver, v in batch:
                if k not in best or ver > best[k][0]:
                    best[k] = (ver, v)
            for k, (ver, v) in best.items():
                if k in ref:
                    if ver >= ref[k][0]:
                        ref[k] = (ver, v)
                elif insert:
                    ref[k] = (ver, v)
        elif op[0] == "delete":
            for t in tables.values():
                t.delete_where(F.col("k") == op[1])
            ref.pop(op[1], None)
        else:
            tables["mor"].compact()
    expect = {k: vv for k, vv in ref.items()}
    for mode, t in tables.items():
        df = t.read()
        got = (
            {} if df is None
            else {r.k: (r.ver, r.v) for r in df.collect()}
        )
        assert got == expect, mode

# -- NULL values, predicate deletes, restarts: the review-found edge set ----

_null_batch_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=9),
        st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: (t[0], t[1]),
)

_op2_strategy = st.one_of(
    st.tuples(st.just("upsert"), _null_batch_strategy, st.booleans()),
    st.tuples(st.just("delete_key"), st.sampled_from(KEYS)),
    # predicate delete over a nullable column: rows where v is NULL must
    # SURVIVE (condition evaluates NULL, not TRUE) in both modes
    st.tuples(st.just("delete_pred"), st.integers(min_value=0, max_value=99)),
    st.tuples(st.just("compact")),
    # restart: rebuild the instances from disk — the tombstone marker
    # protocol must reproduce the same semantics from a cold start at
    # ANY point in the sequence
    st.tuples(st.just("restart")),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op2_strategy, min_size=2, max_size=6))
def test_null_and_predicate_ops_match_reference(spark, tmp_path_factory,
                                                ops):
    """Randomized sequences over a NULLABLE value column with predicate
    deletes and cold restarts: MoR == CoW == the sequential reference,
    where `delete_where(v < c)` removes exactly the rows whose v is
    non-NULL and < c (SQL three-valued logic: NULL keeps the row)."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ver", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    base = str(tmp_path_factory.mktemp("opseq2"))
    paths = {mode: f"{base}/{mode}" for mode in ("cow", "mor")}
    tables = {
        mode: ParquetUpsertTable(spark, p, keys=["k"], version_col="ver",
                                 mode=mode)
        for mode, p in paths.items()
    }
    ref: dict[str, tuple[int, int | None]] = {}
    for op in ops:
        if op[0] == "upsert":
            _, batch, insert = op
            df = spark.createDataFrame(batch, schema)
            for t in tables.values():
                t.upsert(df, insert=insert)
            best: dict[str, tuple[int, int | None]] = {}
            for k, ver, v in batch:
                if k not in best or ver > best[k][0]:
                    best[k] = (ver, v)
            for k, (ver, v) in best.items():
                if k in ref:
                    if ver >= ref[k][0]:
                        ref[k] = (ver, v)
                elif insert:
                    ref[k] = (ver, v)
        elif op[0] == "delete_key":
            for t in tables.values():
                t.delete_where(F.col("k") == op[1])
            ref.pop(op[1], None)
        elif op[0] == "delete_pred":
            c = op[1]
            for t in tables.values():
                t.delete_where(F.col("v") < c)
            ref = {k: (ver, v) for k, (ver, v) in ref.items()
                   if v is None or v >= c}
        elif op[0] == "compact":
            tables["mor"].compact()
        else:  # restart
            tables = {
                mode: ParquetUpsertTable(spark, p, keys=["k"],
                                         version_col="ver", mode=mode)
                for mode, p in paths.items()
            }
    for mode, t in tables.items():
        df = t.read()
        got = (
            {} if df is None
            else {r.k: (r.ver, r.v) for r in df.collect()}
        )
        assert got == ref, mode
