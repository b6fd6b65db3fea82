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


def _strip0x(col: Column) -> Column:
    # lower() FIRST: '^0x' after lowercasing also strips an uppercase
    # '0X' prefix — un-stripped, the 66-char string survives into
    # lpad(...,64), which TRUNCATES to the first 64 chars and decodes a
    # shifted, valid-looking (wrong) value instead of NULL
    return F.regexp_replace(F.lower(col), "^0x", "")


def hex_to_decimal(col: Column) -> Column:
    """Big-endian hex string (<= 64 digits, value < 10^38) -> DECIMAL(38,0).

    Values >= 10^38 (including everything with a high-32-hex digit set) are
    outside the exactly-representable range and return NULL rather than a
    silently wrong number. The range check is a string compare evaluated
    BEFORE any decimal arithmetic: CaseWhen branches lazily, so out-of-range
    words never reach the multiply/add and cannot raise ARITHMETIC_OVERFLOW
    under ANSI mode."""
    h = _strip0x(col)
    # a stripped word longer than 64 hex chars is malformed for a single
    # 32-byte word: lpad would truncate it — NULL propagates instead
    padded = F.when(F.length(h) <= 64, F.lpad(h, 64, "0"))
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
    h = _strip0x(col)
    return F.when(
        F.length(h) <= 64,
        F.concat(F.lit("0x"), F.substring(F.lpad(h, 64, "0"), 25, 40)),
    )


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


# --- generalized event decode: declarative ABI -> struct column -------------
#
# The reference decodes EVERY event's payload from raw logs through contract
# ABIs (web3 `contract.events.X().processReceipt`; consumed shapes at
# /root/reference/indexer/events/mocexchange.py:27-110, mocsettlement.py,
# fastbtcbridge.py, mocstate.py). This is the Spark-expression analog: an
# event's ABI is a list of (name, solidity-type, indexed) fields; indexed
# fields consume topics[1..] in order, the rest consume the `data` hex blob
# word-by-word per the ABI static encoding (dynamic `string` fields read
# their offset word, then length + UTF-8 bytes at that offset). Everything
# stays in whole-stage codegen — substring/conv/decode string expressions,
# no UDF.

from collections import namedtuple

EventField = namedtuple("EventField", ["name", "typ", "indexed"])


def _f(name, typ, indexed=False):
    return EventField(name, typ, indexed)


# Field layouts for every event the reference indexes (static uint256 /
# address / bool / uint32 words + the fastbtc dynamic string). Amount-ish
# uint256 fields decode to DECIMAL(38,0); count-ish uint fields to long —
# mirroring the JSON payload schemas in operators/events.py EVENT_SCHEMAS.
EVENT_ABIS: dict[str, list[EventField]] = {
    "Transfer": [
        _f("from", "address", True),
        _f("to", "address", True),
        _f("value", "uint256"),
    ],
    "Approval": [
        _f("owner", "address", True),
        _f("spender", "address", True),
        _f("value", "uint256"),
    ],
    # MoCExchange family — one shared tuple (mocexchange.py handlers read
    # the same keys from every event)
    **{
        name: [
            _f("account", "address", True),
            _f("amount", "uint256"),
            _f("reserveTotal", "uint256"),
            _f("commission", "uint256"),
            _f("reservePrice", "uint256"),
            _f("mocCommissionValue", "uint256"),
            _f("mocPrice", "uint256"),
            _f("btcMarkup", "uint256"),
            _f("mocMarkup", "uint256"),
        ]
        for name in (
            "RiskProMint", "RiskProRedeem", "StableTokenMint",
            "StableTokenRedeem", "FreeStableTokenRedeem",
        )
    },
    **{
        name: [
            _f("account", "address", True),
            _f("amount", "uint256"),
            _f("reserveTotal", "uint256"),
            _f("interests", "uint256"),
            _f("leverage", "uint256"),
            _f("commission", "uint256"),
            _f("reservePrice", "uint256"),
            _f("mocCommissionValue", "uint256"),
            _f("mocPrice", "uint256"),
            _f("btcMarkup", "uint256"),
            _f("mocMarkup", "uint256"),
        ]
        for name in ("RiskProxMint", "RiskProxRedeem")
    },
    # MoCSettlement
    "SettlementStarted": [
        _f("stableTokenRedeemCount", "uint64"),
        _f("deleveragingCount", "uint64"),
        _f("riskProxPrice", "uint256"),
        _f("reservePrice", "uint256"),
    ],
    "RedeemRequestAlter": [
        _f("redeemer", "address", True),
        _f("delta", "uint256"),
        _f("isAddition", "bool"),
    ],
    "RedeemRequestProcessed": [
        _f("redeemer", "address", True),
        _f("amount", "uint256"),
    ],
    "SettlementRedeemStableToken": [
        _f("queueSize", "uint64"),
        _f("accumCommissions", "uint256"),
        _f("reservePrice", "uint256"),
    ],
    "SettlementDeleveraging": [
        _f("leverage", "uint256"),
        _f("riskProxPrice", "uint256"),
        _f("reservePrice", "uint256"),
        _f("startBlockNumber", "uint64"),
    ],
    "SettlementCompleted": [],
    # MoC / MoCState / MoCInrate
    "BucketLiquidation": [_f("bucket", "string")],
    "ContractLiquidated": [_f("bucket", "string")],
    "StateTransition": [_f("newState", "uint64")],
    "InrateDailyPay": [
        _f("amount", "uint256"),
        _f("daysToSettlement", "uint64"),
    ],
    "RiskProHoldersInterestPay": [
        _f("amount", "uint256"),
        _f("nReserveBucketC0BeforePay", "uint256"),
    ],
    # FastBtcBridge (fastbtcbridge.py) — btcAddress is the one dynamic field
    "NewBitcoinTransfer": [
        _f("transferId", "string"),
        _f("btcAddress", "string"),
        _f("nonce", "uint64"),
        _f("amountSatoshi", "uint256"),
        _f("feeSatoshi", "uint256"),
        _f("rskAddress", "address", True),
    ],
    "BitcoinTransferStatusUpdated": [
        _f("transferId", "string"),
        _f("newStatus", "uint64"),
    ],
}


def _data_word(data_hex: Column, i: int) -> Column:
    """i-th (0-based) 64-hex word of a stripped data blob."""
    return F.substring(data_hex, i * 64 + 1, 64)


def word_uint64(word: Column) -> Column:
    """Static word -> long (counts, block numbers, enum codes: < 2^63)."""
    return F.conv(F.substring(word, 49, 16), 16, 10).cast("long")


def word_bool(word: Column) -> Column:
    """Static word -> boolean (ABI bool is a 0/1 uint256)."""
    return F.conv(F.substring(word, 49, 16), 16, 10).cast("long") != F.lit(0)


def _dyn_string(data_hex: Column, offset_word: Column) -> Column:
    """Dynamic `string` field: the static slot holds a byte offset into the
    data section; at the offset sit a length word then the UTF-8 bytes."""
    # offsets/lengths are tiny — low 16 hex digits are exact
    off_chars = (F.conv(F.substring(offset_word, 49, 16), 16, 10).cast("long") * 2)
    len_word = F.substring(data_hex, (off_chars + 1).cast("int"), 64)
    n_chars = (F.conv(F.substring(len_word, 49, 16), 16, 10).cast("long") * 2)
    content = F.substring(
        data_hex, (off_chars + 64 + 1).cast("int"), n_chars.cast("int")
    )
    return F.decode(F.unhex(content), "UTF-8")


def decode_log(event_name: str, topics: Column, data: Column) -> Column:
    """Raw (topics array, data hex blob) -> typed struct of the event's
    fields, per EVENT_ABIS. topics[0] is the signature hash; indexed fields
    consume topics[1..] in ABI order, the rest consume data words in order
    (a dynamic string's slot holds its offset)."""
    abi = EVENT_ABIS[event_name]
    d = _strip0x(data)
    if not abi:  # zero-field events (SettlementCompleted) still need a struct
        return F.struct(F.lit(True).alias("_present"))
    out = []
    topic_i = 2  # element_at is 1-based; topics[0] is the signature
    word_i = 0
    for fld in abi:
        if fld.indexed:
            word = _strip0x(F.element_at(topics, topic_i))
            topic_i += 1
        else:
            word = _data_word(d, word_i)
            word_i += 1
        if fld.typ == "address":
            col = (
                topic_address(word)
                if fld.indexed
                else F.concat(F.lit("0x"), F.substring(word, 25, 40))
            )
        elif fld.typ == "uint256":
            col = hex_to_decimal(word)
        elif fld.typ == "uint64":
            col = word_uint64(word)
        elif fld.typ == "bool":
            col = word_bool(word)
        elif fld.typ == "string":
            # an INDEXED dynamic field would be a keccak hash (unrecoverable);
            # none of the reference events index their strings
            col = _dyn_string(d, word)
        else:
            raise ValueError(f"unsupported ABI type {fld.typ!r}")
        out.append(col.alias(fld.name))
    return F.struct(*out)


# --- encode (the roundtrip test leg: values -> wire hex) --------------------

_P13 = 16**13  # 13 hex digits fit comfortably in int64


def uint_to_word(col: Column) -> Column:
    """Non-negative DECIMAL(38,0)/long -> 64-hex big-endian word. Inverse of
    hex_to_decimal, built from different primitives (pmod/divide + hex()
    vs substring + conv), so an encode->decode identity check is not a
    tautology."""
    v = (F.col(col) if isinstance(col, str) else col).cast("decimal(38,0)")
    p = F.lit(_P13).cast("decimal(16,0)")
    r0 = F.pmod(v, p).cast("long")
    v1 = ((v - F.pmod(v, p)) / p).cast("decimal(38,0)")
    r1 = F.pmod(v1, p).cast("long")
    v2 = ((v1 - F.pmod(v1, p)) / p).cast("long")
    return F.concat(
        F.lpad(F.lower(F.hex(v2)), 38, "0"),
        F.lpad(F.lower(F.hex(r1)), 13, "0"),
        F.lpad(F.lower(F.hex(r0)), 13, "0"),
    )


def address_to_word(col: Column) -> Column:
    return F.lpad(_strip0x(col), 64, "0")


def bool_to_word(col: Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(F.when(c, "1").otherwise("0"), 64, "0")


def string_to_tail(col: Column) -> Column:
    """Dynamic string -> length word + right-padded UTF-8 hex (the bytes
    that live at the field's offset)."""
    c = F.col(col) if isinstance(col, str) else col
    hx = F.lower(F.hex(F.encode(c, "UTF-8")))
    # pad to a whole word; CEIL on decimal-typed length keeps ANSI happy
    padded = F.rpad(
        hx, (F.ceil(F.length(hx) / F.lit(64)) * 64).cast("int"), "0"
    )
    return F.concat(uint_to_word(F.length(hx) / F.lit(2)), padded)


def encode_log(event_name: str, cols: dict[str, Column]) -> Column:
    """Typed field columns -> struct(topics array, data hex blob) in the
    ABI wire layout decode_log consumes. Dynamic strings get their offset
    slots computed at build time (offsets are static when every dynamic
    field before them has build-time-known padded length — not true in
    general, so dynamic payloads are laid out one at a time: each dynamic
    field's tail is appended in slot order, offsets accumulated as
    expressions)."""
    abi = EVENT_ABIS[event_name]
    topics = [F.lit("0x" + "00" * 32)]  # signature placeholder slot
    static_parts: list[Column] = []
    dyn_fields = []
    n_static = sum(0 if f.indexed else 1 for f in abi)
    for fld in abi:
        if fld.indexed:
            if fld.typ == "address":
                topics.append(F.concat(F.lit("0x"), address_to_word(cols[fld.name])))
            else:
                topics.append(F.concat(F.lit("0x"), uint_to_word(cols[fld.name])))
            continue
        if fld.typ == "string":
            dyn_fields.append(fld)
            static_parts.append(None)  # offset slot, filled below
        elif fld.typ == "address":
            static_parts.append(address_to_word(cols[fld.name]))
        elif fld.typ == "bool":
            static_parts.append(bool_to_word(cols[fld.name]))
        else:
            static_parts.append(uint_to_word(cols[fld.name]))
    # lay out dynamic tails after the static section, accumulating offsets
    tail = F.lit("")
    offset_bytes: Column = F.lit(n_static * 32).cast("decimal(38,0)")
    dyn_iter = iter(dyn_fields)
    for i, part in enumerate(static_parts):
        if part is None:
            fld = next(dyn_iter)
            static_parts[i] = uint_to_word(offset_bytes)
            t = string_to_tail(cols[fld.name])
            tail = F.concat(tail, t)
            offset_bytes = offset_bytes + (F.length(t) / F.lit(2)).cast(
                "decimal(38,0)"
            )
    data = F.concat(F.lit("0x"), *static_parts, tail) if (
        static_parts or dyn_fields
    ) else F.lit("0x")
    return F.struct(
        F.array(*topics).alias("topics"), data.alias("data")
    )
