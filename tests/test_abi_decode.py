"""Expression-level ABI decoding vs Python int/hex ground truth
(the raw-log path of scan_events_txs.py:144, UDF-free)."""

from pyspark.sql import functions as F

from moc_indexer_spark.functions import abi


def test_hex_to_decimal_exact(spark):
    vals = [
        0,
        1,
        255,
        2**52 - 1,
        2**53,  # above double precision
        10**18,
        123456789 * 10**18,
        10**38 - 1,  # DECIMAL(38,0) ceiling
    ]
    rows = [(f"{v:064x}",) for v in vals] + [(hex(v),) for v in vals]
    df = spark.createDataFrame(rows, ["h"]).select(
        abi.hex_to_decimal(F.col("h")).alias("d")
    )
    got = [int(r.d) for r in df.collect()]
    assert got == vals + vals


def test_decode_erc20_transfer_roundtrip(spark):
    frm = "0x" + "ab" * 20
    to = "0x" + "cd" * 20
    value = 987654321 * 10**18
    row = (
        [
            abi.TRANSFER_TOPIC0,
            "0x" + frm[2:].rjust(64, "0"),
            "0x" + to[2:].rjust(64, "0"),
        ],
        [f"{value:064x}"],
    )
    df = spark.createDataFrame([row], "topics array<string>, data array<string>")
    out = df.select(
        abi.decode_erc20_transfer(F.col("topics"), F.col("data")).alias("t")
    ).select("t.*").collect()[0]
    assert out["from"] == frm
    assert out["to"] == to
    assert int(out["value"]) == value
