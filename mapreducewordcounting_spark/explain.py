"""Plan inspection utility: print the formatted physical plan of any
registered query.

    python -m mapreducewordcounting_spark.explain <query> [sf_dir]
    python -m mapreducewordcounting_spark.explain --list

The development loop behind every operator here (SURVEY.md §7.0's
"100 TB posture"): after correctness, read the plan — is the filter in
``PushedFilters``/``PartitionFilters``? Did the dim broadcast? Is the
aggregate partial+final? How many ``Exchange``s, and are they the ones
budgeted in SCALING.md? PLANS.md archives the annotated plans this tool
prints.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    from mapreducewordcounting_spark.registry import all_queries

    specs = all_queries()
    if not argv or argv[0] in ("--list", "-l"):
        for name, spec in specs.items():
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:36s} [{kind}] {'/'.join(spec.tags)}")
        return 0
    name = argv[0]
    if name not in specs:
        print(f"unknown query {name!r}; --list shows all", file=sys.stderr)
        return 2
    import os
    sf_dir = argv[1] if len(argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from mapreducewordcounting_spark.session import get_spark

    spark = get_spark(app_name=f"explain-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[name].fn(spark, sf_dir)
    df.explain("formatted")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
