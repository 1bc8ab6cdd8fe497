"""Scale-conf A/B at derived sf1/sf10 (VERDICT r13 items 5 and 6).

    python tools/ab_scale_conf.py [query ...]

Times the named queries (default: dedup_clusters_sharded +
dedup_minhash_det, the second-decade rows) under several session
configurations, one fresh SparkSession per variant, bench.py's
protocol (untimed sf0.001 warmup, noop sink, median of 3). The
variant LOOP is repeated --sweeps times (default 2) so host drift is
sampled across variants rather than baked into one; report the min
of per-sweep medians per (variant, query, dir) — the stall-free
estimator BASELINE.md's round-13 section documents.

Variants (guide §2.1 scale-adaptive partitioning, §6 scan splits):
  default          — the shipped session confs
  aqe-init-256     — AQE coalescing from initialPartitionNum=256
                     (scale-adaptive: AQE derives the per-stage count
                     from data size instead of the local core count)
  shuffle-128      — static spark.sql.shuffle.partitions=128
  maxpart-16m      — spark.sql.files.maxPartitionBytes=16m (more,
                     smaller scan tasks)
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
DIRS = [d for d in [
    os.path.join(REPO, "scale_scratch", "sf1"),
    os.path.join(REPO, "scale_scratch", "sf10"),
] if os.path.isdir(d)]

VARIANTS: dict[str, dict[str, str]] = {
    "default": {},
    "aqe-init-256": {
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum":
            "256"},
    "shuffle-128": {"spark.sql.shuffle.partitions": "128"},
    "maxpart-16m": {"spark.sql.files.maxPartitionBytes": "16m"},
}

DEFAULT_QUERIES = ["dedup_clusters_sharded", "dedup_minhash_det"]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sweeps = 2
    for a in sys.argv[1:]:
        if a.startswith("--sweeps="):
            sweeps = int(a.split("=", 1)[1])
    names = args or DEFAULT_QUERIES

    from mapreducewordcounting_spark import registry
    from mapreducewordcounting_spark.checkpoints import release_all_pinned
    from mapreducewordcounting_spark.session import get_spark

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # results[variant][sf][query] = list of per-sweep medians
    results: dict[str, dict[str, dict[str, list[float]]]] = {
        v: {os.path.basename(d): {} for d in DIRS} for v in VARIANTS}

    for sweep in range(sweeps):
        for label, extra in VARIANTS.items():
            spark = get_spark(app_name=f"mrwc-ab-scale-{label}",
                              extra_conf=extra)
            spark.sparkContext.setLogLevel("ERROR")
            qs = registry.queries()
            mat(qs["wordcount_canonical"](spark, WARM_SF_DIR))
            for sf_dir in DIRS:
                sf = os.path.basename(sf_dir)
                for name in names:
                    mat(qs[name](spark, WARM_SF_DIR))
                    release_all_pinned(spark)
                    samples = []
                    for i in range(3):
                        spark.sparkContext.setJobDescription(
                            f"ab_scale {label} {name} @ {sf} "
                            f"sweep {sweep} run {i}")
                        t0 = time.perf_counter()
                        mat(qs[name](spark, sf_dir))
                        samples.append(time.perf_counter() - t0)
                        release_all_pinned(spark)
                    med = round(statistics.median(samples), 3)
                    results[label][sf].setdefault(name, []).append(med)
                    print(f"sweep{sweep} {label} {sf} {name}: {med}s "
                          f"{[round(s, 3) for s in samples]}",
                          file=sys.stderr, flush=True)
            spark.stop()

    summary = {
        label: {sf: {name: min(meds) for name, meds in by_q.items()}
                for sf, by_q in by_sf.items()}
        for label, by_sf in results.items()}
    print(json.dumps({"ab_scale_conf": summary,
                      "sweeps_raw": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
