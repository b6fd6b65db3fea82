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
