"""Order-insensitive differential compare: Spark result vs DuckDB oracle.

Mirrors the driver's check (SURVEY.md §5.2): row count, column names
(sorted), and an order-insensitive value comparison. Floats are
rounded to tolerate double-summation order differences.
"""

from __future__ import annotations

import math
from datetime import date, datetime


def _norm_cell(v, float_digits: int):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, float_digits)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x, float_digits) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x, float_digits)) for k, x in v.items()))
    return v


def _normalize(rows: list[dict], float_digits: int) -> list[tuple]:
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[k], float_digits) for k in sorted(r)))
    return sorted(out, key=repr)


def assert_matches_oracle(spark_df, duck, sql: str, float_digits: int = 6):
    s_rows = [r.asDict(recursive=True) for r in spark_df.collect()]
    d = duck.execute(sql)
    cols = [c[0] for c in d.description]
    d_rows = [dict(zip(cols, row)) for row in d.fetchall()]

    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(cols)
    assert s_cols == d_cols, f"schema mismatch: spark={s_cols} duckdb={d_cols}"

    s_norm = _normalize(s_rows, float_digits)
    d_norm = _normalize(d_rows, float_digits)
    if s_norm != d_norm:
        diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
