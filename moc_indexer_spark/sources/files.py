"""File-based corpus ingestion: JSONL / CSV readers with corrupt-record
quarantine, plus JSONL export.

No reference analog (the reference ingests from JSON-RPC;
BASELINE.json north star) — JSONL is the interchange format every
LLM-corpus pipeline ingests (one JSON document per line, usually
gzip-partitioned), and at 100 TB the non-negotiables are: explicit
schema (no inference pass over the whole corpus), PERMISSIVE parsing
(one mangled line must not kill a 1000-executor job), and a quarantine
relation so bad lines are counted and kept, never silently dropped.

Spark-first: read the file as splittable text lines and parse with
`from_json`/`from_csv` under PERMISSIVE mode — the corrupt capture is the
parser's native `_corrupt_record` field. Parsing as an expression (rather
than `spark.read.json`) sidesteps Spark's
QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (no cache needed to read the
quarantine side) and keeps the raw line available for the quarantine
relation verbatim.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def parse_jsonl_lines(
    lines: DataFrame, schema: T.StructType = DOCUMENTS_SCHEMA,
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Parse a DataFrame of raw JSONL lines under an explicit schema —
    the expression core of `read_jsonl`, factored out so the STREAMING
    funnel's foreachBatch body parses micro-batches of text lines with
    the identical semantics (batch/stream parity by construction).

    Returns (good, quarantine): `good` has exactly `schema`'s columns and
    only fully-parsed rows; `quarantine` is (raw_line string) for every
    line that failed to parse. PERMISSIVE mode nulls unparsable rows into
    the corrupt column instead of failing the task — required posture for
    web-scale ingest where a single executor hitting one bad line must
    not kill the job (DROPMALFORMED would silently lose data;
    FAILFAST would lose the job)."""
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    parsed = lines.select(
        F.col(value_col).alias("raw_line"),
        F.from_json(
            F.col(value_col), _with_corrupt(schema), opts
        ).alias("r"),
    )
    # from_json yields a NULL struct (not a corrupt-record row) for blank
    # lines and literal `null` — those are quarantined too, so no input
    # line is ever silently dropped
    is_good = F.col("r").isNotNull() & F.col(f"r.{CORRUPT_COL}").isNull()
    good = parsed.filter(is_good).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(~is_good).select("raw_line")
    return good, bad


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON under an explicit schema — see
    `parse_jsonl_lines` for the parse/quarantine contract."""
    return parse_jsonl_lines(spark.read.text(path), schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV variant of `read_jsonl` with the same good/quarantine contract.

    Header handling: matched textually, not positionally (text scans give
    no stable row order), against a CANONICALIZED form — per-field quote
    stripping, trimming, and lowercasing — so quoted/spaced/case-variant
    headers of the same columns are removed too, not parsed into `good`
    (an all-string schema would otherwise accept a foreign header as a
    data row; typed schemas already quarantined it). Residual contract of
    textual matching, documented rather than hidden: a DATA row whose
    fields equal the column names case-insensitively is removed with the
    header — if that row can exist in your data, read with header=False
    and strip per file upstream. A header with DIFFERENT column names is
    NOT removed (it parses or quarantines like any other line — visible
    either way)."""
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        "delimiter": delimiter,
    }
    lines = spark.read.text(path).select(F.col("value").alias("raw_line"))
    if header:
        # F.split takes a Java REGEX: a regex-special delimiter ('|', '.')
        # would split every character and the canonical form would never
        # match header_canon — the header line would leak into parsing as
        # a data row for all-string schemas. Escape it (re.escape emits
        # backslash-punctuation, valid in Java regex too).
        canon = F.array_join(
            F.transform(
                F.split(F.col("raw_line"), re.escape(delimiter)),
                lambda x: F.lower(
                    F.trim(F.regexp_replace(F.trim(x), '^"|"$', ""))
                ),
            ),
            delimiter,
        )
        header_canon = delimiter.join(f.name.lower() for f in schema.fields)
        lines = lines.filter(canon != F.lit(header_canon))
    parsed = lines.select(
        "raw_line",
        F.from_csv(F.col("raw_line"), _with_corrupt(schema).simpleString(),
                   opts).alias("r"),
    )
    is_good = F.col("r").isNotNull() & F.col(f"r.{CORRUPT_COL}").isNull()
    good = parsed.filter(is_good).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(~is_good).select("raw_line")
    return good, bad


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Export as line-delimited JSON (the corpus interchange format).
    `n_files` controls output parallelism/file sizing; gzip keeps the
    files splittable-enough for re-ingest because partitioning happened
    at write time."""
    w = df.repartition(n_files) if n_files else df
    w.write.mode("overwrite").option("compression", "gzip").json(path)


def ingest_report(good: DataFrame, bad: DataFrame) -> DataFrame:
    """One-row ingest observability summary (counts + bad fraction)."""
    g = good.agg(F.count(F.lit(1)).alias("good_rows"))
    b = bad.agg(F.count(F.lit(1)).alias("bad_rows"))
    return g.crossJoin(b).select(
        "good_rows",
        "bad_rows",
        F.round(
            F.col("bad_rows").cast("double")
            / (F.col("good_rows") + F.col("bad_rows")).cast("double"),
            6,
        ).alias("bad_fraction"),
    )
