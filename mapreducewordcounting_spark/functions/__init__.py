"""Reusable column-expression helpers (all JVM-side built-ins)."""

from mapreducewordcounting_spark.functions.text import (
    tokenize_canonical,
    tokenize_fidelity,
    words_canonical,
)
from mapreducewordcounting_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "tokenize_canonical",
    "tokenize_fidelity",
    "words_canonical",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
