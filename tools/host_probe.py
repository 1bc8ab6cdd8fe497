"""Cheap clean-window probe (VERDICT r13 item 1).

    python tools/host_probe.py [--json]

Times ONLY the two bench controls (median of 3, bench.py protocol:
untimed sf0.001 warmup, noop-sink materialization) plus a 5 s
/proc/stat CPU-steal sample, and prints their pin ratios. Purpose:
the r13 close never saw a clean measurement window, and the full
headline bench costs ~15 min per look — this probe answers "is the
host clean RIGHT NOW" in under a minute so the expensive sweeps are
only launched into windows where both controls read < 1.3x pin.

Pure measurement infrastructure: touches no query, writes no bench
artifact.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_SF_DIR = os.environ.get("SPARK_GRAFT_WARM_SF_DIR",
                             "/root/testdata/sf0.001")
CONTROLS = ["wordcount_canonical", "join_star_schema"]
#: the clean-window bar from VERDICT r13 item 1
CLEAN_RATIO = 1.3


def cpu_steal_pct(seconds: float = 5.0) -> float | None:
    """Percent of CPU time stolen by the hypervisor over a sample."""
    def snap() -> list[int]:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    try:
        a = snap()
        time.sleep(seconds)
        b = snap()
    except (OSError, ValueError):
        return None
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 1) if tot and len(d) > 7 else None


def main() -> int:
    with open(os.path.join(REPO, "tools", "bench_pins.json")) as f:
        pins = json.load(f)

    from mapreducewordcounting_spark import registry
    from mapreducewordcounting_spark.checkpoints import release_all_pinned
    from mapreducewordcounting_spark.session import get_spark

    spark = get_spark(app_name="mrwc-host-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    mat(qs[CONTROLS[0]](spark, WARM_SF_DIR))  # JVM + codegen warmup

    out: dict = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                 "controls": {}}
    clean = True
    for name in CONTROLS:
        mat(qs[name](spark, WARM_SF_DIR))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            mat(qs[name](spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        release_all_pinned(spark)
        med = round(statistics.median(samples), 3)
        pin = pins.get(name)
        ratio = round(med / pin, 3) if pin else None
        out["controls"][name] = {"median": med, "pin": pin,
                                 "ratio": ratio}
        if ratio is None or ratio > CLEAN_RATIO:
            clean = False
    spark.stop()
    out["cpu_steal_pct"] = cpu_steal_pct()
    out["clean_window"] = clean
    print(json.dumps(out))
    return 0 if clean else 1


if __name__ == "__main__":
    raise SystemExit(main())
