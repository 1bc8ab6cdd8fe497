"""Full driver-contract verification + artifact dump.

Simulates the round driver exactly as `.claude/skills/verify/SKILL.md`
describes — `import __spark_entry__`, run every `queries()` entry at
sf0.01 on local[8], differential-compare against `oracle_sql()` in
DuckDB — but over the ENTIRE registry (not the driver's ~50-query
sample), and writes the per-query outcome to
`CORRECTNESS_local_full.json` at the repo root so the judge can audit
the queries the driver never samples (VERDICT round 3, item 5).

Usage:  python tools/verify_full.py [sf_dir] [--only name1,name2,...]
                                       [--plain-session]
``--plain-session`` builds the SparkSession with NOTHING but a master
(no UTC pin, default 200 shuffle partitions / ANSI / broadcast
threshold) — the closest local simulation of the driver's unknown
session; tests/test_default_session_gate.py runs a slice of this
per-commit, this flag covers the whole registry on demand.
Exit code 0 iff every oracled query matches and every rows-only query
runs with a non-empty schema.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    plain = "--plain-session" in argv
    if plain:
        argv.remove("--plain-session")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from mapreducewordcounting_spark.checkpoints import release_all_pinned
    from oracle_util import assert_matches_oracle

    if plain:
        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = (SparkSession.builder.master("local[8]")
                 .config("spark.sql.shuffle.partitions", "8")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.session.timeZone", "UTC")
                 .getOrCreate())

    # entry() smoke — the driver's first check.
    entry_rows = e.entry(spark).collect()
    print(f"entry(): {len(entry_rows)} rows", flush=True)
    assert len(entry_rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    results: dict[str, dict] = {}
    n_fail = 0
    t_start = time.time()
    for name in sorted(qs):
        if only is not None and name not in only:
            continue
        t0 = time.time()
        rec: dict = {"oracled": name in oracles}
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                assert_matches_oracle(df, con, oracles[name])
                rec.update(pass_=True,
                           rows=con.execute(
                               f"SELECT count(*) FROM ({oracles[name]})"
                           ).fetchone()[0])
            else:
                n = df.count()
                assert len(df.columns) > 0
                rec.update(pass_=True, rows=n)
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            rec.update(pass_=False, error=str(exc)[:500])
            n_fail += 1
        # storage hygiene between queries (VERDICT r5 item 5): local
        # checkpoints from this query are dead once compared.
        release_all_pinned(spark)
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = {("pass" if k == "pass_" else k): v
                         for k, v in rec.items()}
        status = "MATCH" if rec.get("pass_") and rec["oracled"] else (
            "rows-only" if rec.get("pass_") else "FAIL")
        print(f"{name}: {status} ({rec['sec']}s)", flush=True)

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_oracled": sum(1 for r in results.values() if r["oracled"]),
        "n_pass": sum(1 for r in results.values() if r["pass"]),
        "n_fail": n_fail,
        "total_sec": round(time.time() - t_start, 1),
    }
    if only is None and not plain:
        out = os.path.join(REPO, "CORRECTNESS_local_full.json")
        with open(out, "w") as f:
            json.dump({"summary": summary, "queries": results}, f, indent=1)
        print(f"wrote {out}")
    print(json.dumps(summary), flush=True)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
