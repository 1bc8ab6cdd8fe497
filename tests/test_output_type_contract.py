"""Engine-portable output-type contract (VERDICT r4 item 3, hardened).

Round-4 forensics: ALL 18 driver hash-fail queries (and zero passing
ones) emitted a type outside this allowlist on at least one side —
DuckDB HUGEINT (every uncast ``sum(BIGINT)``), DECIMAL, TINYINT-vs-
DOUBLE ``sign``, raw TIMESTAMP, or an array column. The portable
surface, stable across DuckDB/pandas/Arrow/Spark VERSIONS (not just
engines), is: integers, doubles, strings, dates, booleans. Everything
else must be converted at the output boundary (epochs as BIGINT
seconds, decimals as digit strings or doubles, arrays joined to
strings).

This test pins that contract for every registered query, on BOTH
sides, so the bug class is structurally unrepresentable:
  * the DuckDB oracle's result types ⊆ {integers, DOUBLE, VARCHAR,
    DATE, BOOLEAN} — in particular no HUGEINT and no DECIMAL;
  * the Spark DataFrame's dtypes ⊆ {int widths, double, string, date,
    boolean};
  * per column (matched by name), both sides sit in the SAME class —
    ``-1`` (TINYINT) vs ``-1.0`` (DOUBLE) hashes differently under
    string canonicalization even though it compares ``==``.

Exemption: ``probe_*`` queries tagged "sentinel" deliberately carry a
banned pattern (see operators/probes.py) — they are the controlled
experiment that measures the driver's fetch path, not product surface.
"""

from __future__ import annotations

import pytest

from mapreducewordcounting_spark.registry import all_queries

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep

_SPECS = all_queries()
_CHECKED = [n for n, s in _SPECS.items()
            if s.oracle is not None and "sentinel" not in s.tags]

_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}


def _duck_class(t: str) -> str:
    if t in _DUCK_INT:
        return "int"
    if t in ("DOUBLE", "FLOAT"):
        return "float"
    if t == "VARCHAR":
        return "str"
    if t == "DATE":
        return "date"
    if t == "BOOLEAN":
        return "bool"
    return f"BANNED:{t}"


def _spark_class(t: str) -> str:
    if t in _SPARK_INT:
        return "int"
    if t in ("double", "float"):
        return "float"
    if t == "string":
        return "str"
    if t == "date":
        return "date"
    if t == "boolean":
        return "bool"
    return f"BANNED:{t}"


@pytest.mark.parametrize("name", _CHECKED)
def test_output_types_portable(name, spark, duck, sf_dir):
    spec = _SPECS[name]
    rel = duck.sql(spec.oracle)
    duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    df = spec.fn(spark, sf_dir)
    spark_types = dict(df.dtypes)

    problems = []
    for col in sorted(set(duck_types) | set(spark_types)):
        dt, st = duck_types.get(col), spark_types.get(col)
        if dt is None or st is None:
            problems.append(f"{col}: present on one side only "
                            f"(duck={dt}, spark={st})")
            continue
        dc, sc = _duck_class(dt), _spark_class(st)
        if dc.startswith("BANNED"):
            problems.append(f"{col}: oracle type {dt} is not portable")
        if sc.startswith("BANNED"):
            problems.append(f"{col}: spark type {st} is not portable")
        if not dc.startswith("BANNED") and not sc.startswith("BANNED") \
                and dc != sc:
            problems.append(
                f"{col}: type-class mismatch duck={dt}({dc}) "
                f"spark={st}({sc}) — hashes differently under string "
                f"canonicalization")
    assert not problems, "; ".join(problems)
