"""Vector math over ``array<float>`` columns — all built-in HOFs.

Basis for similarity search (SURVEY.md §2.3). ``zip_with`` +
``aggregate`` keep the arithmetic JVM-side (no Python round-trip), so a
brute-force cosine scan is whole-stage-codegen'd and scales linearly
with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ aᵢ·bᵢ as double."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: str | Column) -> Column:
    """‖a‖₂ as double."""
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """cos(a, b) = a·b / (‖a‖‖b‖). Zero vectors yield NULL via an
    explicit nullif guard — under Spark 4's default ANSI mode a bare
    division would abort the whole query on the first zero vector."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
