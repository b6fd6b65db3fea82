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


def test_hex_to_decimal_overflow_returns_null(spark):
    # values in [10^38, 16^32) passed the old high-32-zero guard but
    # overflow DECIMAL(38,0); under ANSI they must yield NULL, not throw
    vals = [10**38, 10**38 + 1, 16**32 - 1, 2**255]
    rows = [(f"{v:064x}",) for v in vals]
    df = spark.createDataFrame(rows, ["h"]).select(
        abi.hex_to_decimal(F.col("h")).alias("d")
    )
    assert [r.d for r in df.collect()] == [None] * len(vals)


def _roundtrip(spark, event_name, rows, schema, cast_decimal=()):
    df = spark.createDataFrame(rows, schema)
    cols = {
        c: (F.col(c).cast("decimal(38,0)") if c in cast_decimal else F.col(c))
        for c in df.columns
    }
    enc = df.select(abi.encode_log(event_name, cols).alias("w"))
    dec = enc.select(
        abi.decode_log(event_name, F.col("w.topics"), F.col("w.data")).alias("ev")
    )
    return dec.select("ev.*").collect()


def test_decode_log_every_static_type(spark):
    # RedeemRequestAlter: indexed address + uint256 + bool
    got = _roundtrip(
        spark,
        "RedeemRequestAlter",
        [("0x" + "ab" * 20, str(7 * 10**21), True),
         ("0x" + "cd" * 20, "0", False)],
        "redeemer string, delta string, isAddition boolean",
        cast_decimal=("delta",),
    )
    assert [(r.redeemer, int(r.delta), r.isAddition) for r in got] == [
        ("0x" + "ab" * 20, 7 * 10**21, True),
        ("0x" + "cd" * 20, 0, False),
    ]
    # SettlementStarted: pure data words, uint64 + uint256 mix
    got = _roundtrip(
        spark,
        "SettlementStarted",
        [(42, 7, str(10**18), str(3 * 10**22))],
        "stableTokenRedeemCount long, deleveragingCount long, "
        "riskProxPrice string, reservePrice string",
        cast_decimal=("riskProxPrice", "reservePrice"),
    )
    r = got[0]
    assert (r.stableTokenRedeemCount, r.deleveragingCount) == (42, 7)
    assert (int(r.riskProxPrice), int(r.reservePrice)) == (10**18, 3 * 10**22)


def test_decode_log_dynamic_strings(spark):
    # NewBitcoinTransfer: two dynamic strings (incl. >32-byte and empty),
    # indexed address, uint64 + uint256 words
    long_addr = "bc1q" + "x" * 40  # 44 bytes -> spans two words
    got = _roundtrip(
        spark,
        "NewBitcoinTransfer",
        [("tid-1", long_addr, 3, "12345678901234567890123", "55",
          "0x" + "ee" * 20),
         ("", "", 0, "0", "0", "0x" + "00" * 20)],
        "transferId string, btcAddress string, nonce long, "
        "amountSatoshi string, feeSatoshi string, rskAddress string",
        cast_decimal=("amountSatoshi", "feeSatoshi"),
    )
    assert [(r.transferId, r.btcAddress, r.nonce, int(r.amountSatoshi)) for r in got] == [
        ("tid-1", long_addr, 3, 12345678901234567890123),
        ("", "", 0, 0),
    ]


def test_decode_log_wire_layout_is_canonical_abi(spark):
    """The encoder must produce the EXACT wire bytes eth_abi would: check
    a hand-computed RedeemRequestAlter encoding (static layout) so the
    decoder is proven against the spec, not just against the encoder."""
    df = spark.createDataFrame([("0x" + "ab" * 20, 5, True)],
                               "redeemer string, delta long, isAddition boolean")
    enc = df.select(abi.encode_log("RedeemRequestAlter", {
        "redeemer": F.col("redeemer"),
        "delta": F.col("delta").cast("decimal(38,0)"),
        "isAddition": F.col("isAddition"),
    }).alias("w")).collect()[0].w
    assert enc.topics[1] == "0x" + ("ab" * 20).rjust(64, "0")
    assert enc.data == "0x" + "5".rjust(64, "0") + "1".rjust(64, "0")


def test_abi_roundtrip_property(spark):
    """Property fuzz: encode->decode identity over random uint256 values
    (full DECIMAL(38) range incl. boundaries), random-length strings, and
    random addresses — one batched Spark job for the whole sample set."""
    import random

    rng = random.Random(20260814)
    values = [0, 1, 10**38 - 1, 2**63 - 1, 2**64, 16**13 - 1, 16**13,
              16**26 - 1, 16**26] + [rng.randrange(0, 10**38) for _ in range(40)]
    strings = ["", "a", "x" * 31, "y" * 32, "z" * 33, "mixed-0123_~"] + [
        "".join(rng.choices("abcdefghijklmnop-_.:/", k=rng.randrange(0, 90)))
        for _ in range(20)
    ]
    n = max(len(values), len(strings))
    rows = [
        (
            strings[i % len(strings)],
            strings[(i * 7 + 3) % len(strings)],
            i,
            str(values[i % len(values)]),
            str(values[(i * 13 + 5) % len(values)]),
            "0x" + f"{rng.randrange(0, 2**160):040x}",
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "transferId string, btcAddress string, nonce long, "
        "amountSatoshi string, feeSatoshi string, rskAddress string",
    )
    got = _roundtrip(
        spark, "NewBitcoinTransfer", rows,
        "transferId string, btcAddress string, nonce long, "
        "amountSatoshi string, feeSatoshi string, rskAddress string",
        cast_decimal=("amountSatoshi", "feeSatoshi"),
    )
    # decode_log returns fields in ABI order; compare as dicts keyed by nonce
    by_nonce = {r.nonce: r for r in got}
    for (tid, btc, nonce, amt, fee, rsk) in rows:
        r = by_nonce[nonce]
        assert (r.transferId, r.btcAddress) == (tid, btc)
        assert (int(r.amountSatoshi), int(r.feeSatoshi)) == (int(amt), int(fee))
        assert r.rskAddress == rsk.lower()


def test_hex_prefix_and_length_edge_cases(spark):
    """An uppercase '0X' prefix must strip like '0x' (lower runs FIRST),
    and a stripped word longer than 64 hex chars is NULL — lpad(...,64)
    would otherwise TRUNCATE to the first 64 chars and decode a shifted,
    valid-looking but wrong value/address."""
    word = "0" * 62 + "2a"  # 42
    addr_word = "0" * 24 + "ab" * 20
    rows = [
        ("0X" + word,),             # uppercase prefix: strip, decode 42
        ("0x" + word,),             # normal form
        (word,),                    # bare word
        ("0x" + "ff" + word,),      # 66 hex chars after strip: NULL
        ("0X" + addr_word,),        # uppercase prefix on an address topic
    ]
    df = spark.createDataFrame(rows, ["h"])
    out = df.select(
        abi.hex_to_decimal(F.col("h")).alias("d"),
        abi.topic_address(F.col("h")).alias("a"),
    ).collect()
    assert [None if r.d is None else int(r.d) for r in out[:4]] == [
        42, 42, 42, None
    ]
    assert out[3].a is None                       # overlength address: NULL
    assert out[4].a == "0x" + "ab" * 20           # 0X-prefixed topic decodes
