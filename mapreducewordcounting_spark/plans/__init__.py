"""Physical-plan inspection helpers (SURVEY.md §4 — scale assurance).

The reference's physical plan is compiled in (thread graph,
sendFileByFile.cpp:446-498); ours is chosen by Catalyst — so the scale
properties we rely on (broadcast joins, pushed filters, partial
aggregation, single exchanges) are *asserted*, not assumed:
tests/test_plans.py runs these predicates over the declared queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``.explain('formatted')``
    prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or (
        "BroadcastNestedLoopJoin" in simple_plan(df))


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(
        line.strip() for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema of each scan) —
    the column-pruning check."""
    import re

    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        m = re.search(r"ReadSchema: struct<(.*)>", line)
        if m and m.group(1):
            cols.extend(f.split(":")[0] for f in m.group(1).split(","))
    return cols


def n_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan (AQE may collapse some at runtime);
    every one of these is a full network pass over its input."""
    return simple_plan(df).count("Exchange hashpartitioning") + (
        simple_plan(df).count("Exchange rangepartitioning"))


def exchange_inputs(df: DataFrame) -> list[str]:
    """The ``Input [n]: [...]`` column list of every Exchange node in
    the formatted plan — what each shuffle actually moves over the
    network. VERDICT r11 item 1's lesson: a query's bandwidth claim
    is about these lists, not about its scan projection."""
    import re

    out: list[str] = []
    lines = formatted_plan(df).splitlines()
    for i, line in enumerate(lines):
        if re.match(r"\(\d+\) Exchange", line.strip()):
            for j in range(i + 1, min(i + 6, len(lines))):
                m = re.search(r"Input \[\d+\]: \[(.*)\]", lines[j])
                if m:
                    out.append(m.group(1))
                    break
    return out


def has_partial_aggregation(df: DataFrame) -> bool:
    """Partial/final HashAggregate pair — the map-side combine the
    reference hand-built (sendFileByFile.cpp:150-200)."""
    plan = simple_plan(df)
    return plan.count("HashAggregate") >= 2 or plan.count("ObjectHashAggregate") >= 2
