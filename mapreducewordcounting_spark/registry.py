"""Declared-query registry — the engine's oracle-checked surface.

Every operator from SURVEY.md §2 registers a named query here: a
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet.
``__spark_entry__.py`` re-exports this registry to the driver.

Column-name discipline: the driver's compare sorts columns by name
before hashing, so every computed column is aliased identically in the
Spark code and the SQL (SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None,
             tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame``."""
    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn
    return wrap


def all_queries() -> dict[str, QuerySpec]:
    """Import all operator modules (side-effect: registration) and
    return the full registry."""
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle is not None}


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for side effects (each module registers its queries).
    from mapreducewordcounting_spark.operators import (  # noqa: F401
        wordcount,
        relational,
        scalar_fns,
        windows,
        text_analysis,
        dedup,
        similarity,
        multimodal,
        udfs,
        temporal,
        sketches,
        skew,
        iterative,
        tpch,
        tpch_full,
        training_ops,
        stats,
        cdc,
        fn_extras,
        sql_surface,
        profiling,
        layout,
    )
    from mapreducewordcounting_spark import streaming  # noqa: F401
    from mapreducewordcounting_spark.sources import pyds  # noqa: F401
    _LOADED = True
