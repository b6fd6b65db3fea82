"""Local correctness harness mirroring the driver's t2 compare.

Runs a registry query in Spark and its oracle in DuckDB over the same parquet
tables, then compares row count + sorted-column, order-insensitive stringified
values — at least as strict as the driver's value hash.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import pandas as pd

from .tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connect(sf_dir)
    try:
        rel = con.sql(sql)
        # .df() widens DuckDB DATE to datetime64 midnight; restore the
        # declared type so a DATE column canonicalizes as a date on both
        # sides (Spark's toPandas yields datetime.date for DateType)
        date_cols = [
            c for c, t in zip(rel.columns, rel.types) if str(t) == "DATE"
        ]
        df = rel.df()
        for c in date_cols:
            df[c] = df[c].dt.date
        return df
    finally:
        con.close()


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v.normalize())
    if v is pd.NaT:
        return "NULL"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(_cell(v) for v in row))
    return sorted(out)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        return False, (
            f"column mismatch: spark={sorted(spdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
    a, b = canonical_rows(spdf), canonical_rows(oracle_pdf)
    if len(a) != len(b):
        return False, f"row count mismatch: spark={len(a)} oracle={len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return False, f"value mismatch at sorted row {i}:\n  spark={ra}\n  oracle={rb}"
    return True, "ok"
