"""DuckDB-oracle comparison harness, mirroring the driver's t2 check:
row-count + schema-shape + order-insensitive value-hash with columns
sorted by name (SURVEY.md §5.2 item 3).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from wing_binlog_go_spark.tables import TABLE_NAMES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # integral floats unify with ints: DuckDB's fetchdf hands back
        # SUM(INTEGER) as float64 (5.0) where Spark returns bigint (5)
        if v.is_integer() and abs(v) < 2**53:
            return str(int(v))
        # repr round-trips doubles exactly; identical IEEE values match.
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Decimal):
        # exact canonical text (repr(float(...)) silently collapsed
        # decimals differing beyond 2^53)
        s = format(v, "f")
        return s.rstrip("0").rstrip(".") if "." in s else s
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        # date unifies with midnight timestamp (engines disagree on
        # DATE column physical type)
        return v.isoformat() + " 00:00:00.000000"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(pdf) -> list[tuple]:
    """Sort columns by name, normalize every value, sort rows."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def _dtype_kind(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in "iufb":
        return "num"
    if k in "mM":
        return "time"
    return "obj"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).fetchdf()
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, (
            f"column mismatch: spark={sorted(spark_pdf.columns)} "
            f"duckdb={sorted(duck_pdf.columns)}"
        )
    # schema-shape check at dtype-KIND granularity (numeric widths and
    # time units legitimately differ; a numeric column coming back as
    # strings should not): object-kind columns can hold dates etc., so
    # only flag when exactly one side is numeric
    for c in sorted(spark_pdf.columns):
        if len(spark_pdf) and len(duck_pdf):
            a, b = _dtype_kind(spark_pdf[c].dtype), _dtype_kind(duck_pdf[c].dtype)
            if ("num" in (a, b)) and a != b:
                return False, f"dtype-kind mismatch on {c}: spark={a} duckdb={b}"
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if len(a) != len(b):
        return False, f"row count: spark={len(a)} duckdb={len(b)}"
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
