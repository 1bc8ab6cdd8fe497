"""Measurement spike (VERDICT r13 item 8): what would a SHARED-source
replay harness save across the live streaming forms?

    python tools/spike_stream_shared_source.py

The 9+ live streaming queries each pay (a) source setup — the parquet
footer type-probe plus readStream construction — and (b) the real
streaming-query lifecycle (state-store init, micro-batch replay,
sink). Only (a) is shareable: a common harness could probe the footer
and build the source once. This spike measures (a) directly
(median of 5 constructions) and (b) per live form (one timed
complete replay each, bench_full protocol), then reports the upper
bound of the shared-source saving: (n_forms - 1) x t_source as a
fraction of the live forms' total. VERDICT r13: if < 20%, close the
item with the number instead of building the harness.
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


def main() -> int:
    from mapreducewordcounting_spark import registry
    from mapreducewordcounting_spark.checkpoints import release_all_pinned
    from mapreducewordcounting_spark.session import get_spark
    from mapreducewordcounting_spark.streaming import read_events_stream

    spark = get_spark(app_name="mrwc-spike-stream")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    mat(qs["wordcount_canonical"](spark, WARM_SF_DIR))

    # (a) shareable source setup: footer probe + readStream build
    src_samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        read_events_stream(spark, SF_DIR)
        src_samples.append(time.perf_counter() - t0)
    t_source = round(statistics.median(src_samples), 3)

    # (b) the live forms: streaming-tagged queries that are not batch
    # twins (twins run on the batch engine and share nothing here)
    live = [n for n, spec in registry.all_queries().items()
            if "streaming" in (spec.tags or ())
            and "twin" not in n]
    totals: dict[str, float] = {}
    for name in sorted(live):
        mat(qs[name](spark, WARM_SF_DIR))
        release_all_pinned(spark)
        t0 = time.perf_counter()
        mat(qs[name](spark, SF_DIR))
        totals[name] = round(time.perf_counter() - t0, 3)
        release_all_pinned(spark)
        print(f"{name}: {totals[name]}s", file=sys.stderr, flush=True)

    live_total = round(sum(totals.values()), 3)
    saving_bound = round((len(totals) - 1) * t_source, 3)
    out = {
        "t_source_median": t_source,
        "t_source_samples": [round(s, 3) for s in src_samples],
        "n_live_forms": len(totals),
        "live_totals": totals,
        "live_total_sec": live_total,
        "shared_source_saving_bound_sec": saving_bound,
        "saving_pct_of_live_total": round(
            100.0 * saving_bound / live_total, 1) if live_total else None,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
