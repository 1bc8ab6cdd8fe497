"""A/B: similarity_ann_greedy_route lazy one-job walk vs
localCheckpoint-per-hop (VERDICT r13 item 3).

    python tools/ab_greedy_route.py [sf_dir ...]

For each sf dir (default sf0.1 + derived sf1): untimed sf0.001 warmup
for both variants, then INTERLEAVED timed runs (A,B,A,B,A,B — host
drift hits both variants equally, so the ratio survives a noisy box),
median of 3 each, bench.py's noop-sink materialization. Also dumps
`.explain("formatted")` for both variants to plans/r14/ and asserts
the two variants return IDENTICAL rows at the warmup SF.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARM_SF_DIR = os.environ.get("SPARK_GRAFT_WARM_SF_DIR",
                             "/root/testdata/sf0.001")
DEFAULT_DIRS = [
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    os.path.join(REPO, "scale_scratch", "sf1"),
]


def main() -> int:
    dirs = [d for d in (sys.argv[1:] or DEFAULT_DIRS)
            if os.path.isdir(d)]
    from mapreducewordcounting_spark.checkpoints import release_all_pinned
    from mapreducewordcounting_spark.operators.similarity import (
        similarity_ann_greedy_route,
    )
    from mapreducewordcounting_spark.plans import formatted_plan
    from mapreducewordcounting_spark.session import get_spark

    spark = get_spark(app_name="mrwc-ab-greedy-route")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    variants = {"lazy": False, "eagerhops": True}

    # 1. plan dumps (shape evidence — timing-independent)
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for label, eager in variants.items():
        df = similarity_ann_greedy_route(spark, WARM_SF_DIR,
                                         _eager_hops=eager)
        path = os.path.join(
            out_dir, f"similarity_ann_greedy_route_{label}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        n_exchange = formatted_plan(df).count("Exchange")
        print(f"wrote {path} (Exchange tokens: {n_exchange})",
              file=sys.stderr)
        release_all_pinned(spark)

    # 2. result equality at the warmup SF
    rows = {}
    for label, eager in variants.items():
        df = similarity_ann_greedy_route(spark, WARM_SF_DIR,
                                         _eager_hops=eager)
        rows[label] = sorted(tuple(r) for r in df.collect())
        release_all_pinned(spark)
    assert rows["lazy"] == rows["eagerhops"], (
        "variants diverge: first diff "
        f"{next((a, b) for a, b in zip(rows['lazy'], rows['eagerhops']) if a != b)}")
    print(f"results identical across variants "
          f"({len(rows['lazy'])} rows)", file=sys.stderr)

    # 3. interleaved timing
    out: dict[str, dict] = {}
    for sf_dir in dirs:
        for eager in variants.values():  # untimed warmups
            mat(similarity_ann_greedy_route(spark, WARM_SF_DIR,
                                            _eager_hops=eager))
            release_all_pinned(spark)
        samples: dict[str, list[float]] = {k: [] for k in variants}
        for _ in range(3):
            for label, eager in variants.items():
                t0 = time.perf_counter()
                mat(similarity_ann_greedy_route(spark, sf_dir,
                                                _eager_hops=eager))
                samples[label].append(time.perf_counter() - t0)
                release_all_pinned(spark)
        out[os.path.basename(sf_dir)] = {
            label: {"median": round(statistics.median(s), 3),
                    "samples": [round(x, 3) for x in s]}
            for label, s in samples.items()}
        print(f"{os.path.basename(sf_dir)}: "
              f"{json.dumps(out[os.path.basename(sf_dir)])}",
              file=sys.stderr)
    print(json.dumps({"ab_greedy_route": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
