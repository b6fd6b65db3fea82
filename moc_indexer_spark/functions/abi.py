"""ABI log decoding as pure JVM expressions — no eth_abi, no Python UDF.

The reference decodes contract event logs with a library call
(`_decode_logs`, /root/reference/indexer/scan_events_txs.py:144) and the
fixtures here ship pre-decoded JSON payloads; this module covers the RAW
path for the standard layouts so hex logs decode inside whole-stage
codegen:

- an indexed `address` topic is the last 40 hex chars of the 32-byte topic
- a `uint256` word is 64 hex chars, big-endian

uint256 -> DECIMAL(38,0): `conv(hex, 16, 10)` is 64-bit and overflows
silently, so the word is split into five 13-hex-digit chunks (52 bits
each) and assembled as sum(chunk_i * 16^(13*i)) in decimal — exact for
values < 10^38 (every protocol amount; full 2^256 range needs a wider
type than Spark decimals offer and does not occur in wei accounting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (start offset in the padded 64-hex word, chunk length): values < 10^38
# fit in the LOW 32 hex digits (16^32 > 10^38); split 6+13+13 so every
# conv() stays within int64 and every weight within DECIMAL(38)
_CHUNKS = [(33, 6), (39, 13), (52, 13)]


# lowercase hex of 10^38 - 1, lpad'd to 32 digits: the largest value
# DECIMAL(38,0) can hold. Equal-length lowercase hex strings compare
# lexicographically in numeric order, so a plain string <= is an exact
# range check with no arithmetic (and therefore no ANSI overflow risk).
_MAX_DEC38_HEX32 = format(10**38 - 1, "x").rjust(32, "0")


def hex_to_decimal(col: Column) -> Column:
    """Big-endian hex string (<= 64 digits, value < 10^38) -> DECIMAL(38,0).

    Values >= 10^38 (including everything with a high-32-hex digit set) are
    outside the exactly-representable range and return NULL rather than a
    silently wrong number. The range check is a string compare evaluated
    BEFORE any decimal arithmetic: CaseWhen branches lazily, so out-of-range
    words never reach the multiply/add and cannot raise ARITHMETIC_OVERFLOW
    under ANSI mode."""
    h = F.lower(F.regexp_replace(col, "^0x", ""))
    padded = F.lpad(h, 64, "0")
    total = F.lit(0).cast("decimal(38,0)")
    for start, width in _CHUNKS:
        chunk = F.substring(padded, start, width)
        weight = 16 ** (64 - (start - 1) - width)
        val = F.conv(chunk, 16, 10).cast("decimal(38,0)")
        # high-chunk weights exceed int64 -> string literal
        total = total + val * F.lit(str(weight)).cast("decimal(38,0)")
    in_range = (F.substring(padded, 1, 32) == F.lit("0" * 32)) & (
        F.substring(padded, 33, 32) <= F.lit(_MAX_DEC38_HEX32)
    )
    return F.when(in_range, total.cast("decimal(38,0)"))


def topic_address(col: Column) -> Column:
    """32-byte indexed topic -> 0x-prefixed lowercase 20-byte address."""
    h = F.lower(F.regexp_replace(col, "^0x", ""))
    return F.concat(F.lit("0x"), F.substring(F.lpad(h, 64, "0"), 25, 40))


def decode_erc20_transfer(
    topics: Column, data: Column
) -> Column:
    """Raw ERC20 Transfer log -> struct(from, to, value).

    Layout (the canonical `Transfer(address indexed, address indexed,
    uint256)`): topics[0] = event signature hash, topics[1] = from,
    topics[2] = to, data = one uint256 word. Reference handler:
    token_riskpro.py:56-122 consumes the decoded form; this produces it
    from raw hex with three string expressions."""
    return F.struct(
        topic_address(F.element_at(topics, 2)).alias("from"),
        topic_address(F.element_at(topics, 3)).alias("to"),
        hex_to_decimal(F.element_at(data, 1)).alias("value"),
    )


# keccak256("Transfer(address,address,uint256)") — the standard topic0
TRANSFER_TOPIC0 = (
    "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
)
