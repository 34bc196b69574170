"""Local mirror of the driver's Spark-vs-DuckDB correctness compare:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math
from decimal import Decimal


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    return f"{type(v).__name__}:{v}"


def _normalize(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_norm_value(r[c]) for c in cols) for r in rows]
    out.sort()
    return out


def spark_rows(df) -> list[dict]:
    return [row.asDict() for row in df.collect()]


def duck_rows(con, sql: str) -> list[dict]:
    rel = con.sql(sql)
    cols = rel.columns
    return [dict(zip(cols, row)) for row in rel.fetchall()]


def assert_match(spark_df, con, sql: str, name: str = "query"):
    s = spark_rows(spark_df)
    d = duck_rows(con, sql)
    assert len(s) == len(d), f"{name}: row count {len(s)} (spark) != {len(d)} (duckdb)"
    if s:
        scols, dcols = sorted(s[0].keys()), sorted(d[0].keys())
        assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    ns, nd = _normalize(s), _normalize(d)
    mismatches = [
        (a, b) for a, b in zip(ns, nd) if a != b
    ]
    assert ns == nd, f"{name}: value mismatch; first diffs: {mismatches[:3]}"
