"""CLI — the drop-in replacement for the reference binary.

The reference is invoked as ``mpirun ./sendFileByFile`` over a
hardcoded ``./RawText/`` directory (sendFileByFile.cpp:426,
README.md:4) and writes per-reducer ``Rank_<r>_Thread_<t>.txt`` files
of sorted ``word count`` lines (:376-392). This CLI is that program,
parameterized as its README's TODOs wished (:8-11 — configurable
input dir, optional single merged output):

    python -m mapreducewordcounting_spark ./RawText ./out
    python -m mapreducewordcounting_spark ./RawText ./out --merge
    python -m mapreducewordcounting_spark ./RawText ./out --mode fidelity

``--mode fidelity`` reproduces the reference's truncate-at-first-
disallowed-char token semantics (sendFileByFile.cpp:89-93);
``canonical`` (default) is the cleaned-up strip semantics
(SURVEY.md §7.0).

Beyond the reference binary, the engine itself is exposed:

    python -m mapreducewordcounting_spark list
    python -m mapreducewordcounting_spark query tpch_q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--out DIR] [--limit 20]
    python -m mapreducewordcounting_spark sql \
        "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1" \
        --sf-dir /root/testdata/sf0.01

``query`` runs any registered operator query; ``sql`` runs ad-hoc SQL
over the fixture tables registered as views; ``--out`` writes parquet
instead of printing.
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F


def _tools_main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m mapreducewordcounting_spark",
        description="Engine tools: list/run registered queries, ad-hoc SQL.")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    qp = sub.add_parser("query", help="run a registered query")
    qp.add_argument("name")
    sp = sub.add_parser("sql", help="run ad-hoc SQL over the fixture views")
    sp.add_argument("statement")
    for p in (qp, sp):
        p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        p.add_argument("--out", default=None,
                       help="write result as parquet instead of printing")
        p.add_argument("--limit", type=int, default=20)
        p.add_argument("--cpus", default=None)
    args = ap.parse_args(argv)

    from mapreducewordcounting_spark.registry import all_queries

    if args.cmd == "list":
        for name, spec in all_queries().items():
            kind = "oracled" if spec.oracle is not None else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    from mapreducewordcounting_spark.catalog import register_views
    from mapreducewordcounting_spark.session import get_spark

    spark = get_spark(app_name=f"mrwc-{args.cmd}", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "query":
        specs = all_queries()
        if args.name not in specs:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            spark.stop()
            return 2
        df = specs[args.name].fn(spark, args.sf_dir)
    else:
        register_views(spark, args.sf_dir)
        df = spark.sql(args.statement)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("list", "query", "sql"):
        return _tools_main(argv)
    ap = argparse.ArgumentParser(
        prog="python -m mapreducewordcounting_spark",
        description="Distributed word count (the reference program, Spark-first).")
    ap.add_argument("input_dir", help="directory of text files (the RawText/)")
    ap.add_argument("output_dir", help="output directory for word-count text")
    ap.add_argument("--merge", action="store_true",
                    help="single merged output file (README.md:11 TODO)")
    ap.add_argument("--mode", choices=("canonical", "fidelity"),
                    default="canonical", help="tokenizer semantics")
    ap.add_argument("--cpus", default=None,
                    help="local parallelism (default: SPARK_GRAFT_CPUS or 32)")
    args = ap.parse_args(argv)

    from mapreducewordcounting_spark.functions.text import (
        tokenize_canonical,
        tokenize_fidelity,
    )
    from mapreducewordcounting_spark.session import get_spark
    from mapreducewordcounting_spark.sources import (
        read_text_corpus,
        write_wordcount_text,
    )

    spark = get_spark(app_name="mrwc-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    tokenize = (tokenize_canonical if args.mode == "canonical"
                else tokenize_fidelity)
    counts = (
        read_text_corpus(spark, args.input_dir)
        .select(F.explode(tokenize("text")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    write_wordcount_text(counts, args.output_dir, merge=args.merge)

    n_words = counts.count()
    # the reference prints its wall clock the same way (sendFileByFile.cpp:500)
    print(f"word count complete: {n_words} distinct words -> "
          f"{args.output_dir} ({time.time() - t0:.2f}s)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
