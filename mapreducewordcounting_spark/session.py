"""SparkSession bootstrap with scale-aware defaults.

The reference hand-builds its execution topology (19 OpenMP threads per
MPI rank, fixed ring buffers — sendFileByFile.cpp:446-498); here the
equivalent knobs are a handful of Spark confs. Defaults are tuned for
the local[32] test harness but chosen to be the *same* settings we'd
ship on a 1000-executor cluster:

- AQE on (runtime partition coalescing + skew-join splitting — the
  reference's level-2 hash provably skews ~69% of uniform keys onto one
  reducer, SURVEY.md §4.2; AQE is the systematic fix).
- Arrow enabled for any pandas-UDF path.
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden (or left to AQE's coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "mapreducewordcounting-spark",
              cpus: str | int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or get) a SparkSession with the engine's default tuning."""
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- scale posture (identical on cluster) ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        # Scan split sizing (guide §6, VERDICT r13 item 6):
        # parameterized, never hardcoded — local default stays Spark's
        # 128m (bench comparability; at bench SFs the minPartitionNum
        # floor = defaultParallelism governs split count anyway, so
        # the knob is inert below ~GB inputs — measured, see
        # OPTIMIZATION_r14.md). A 100 TB deployment raises this to
        # 512m-1g: fewer, larger map tasks cut scheduling overhead
        # and the M×R shuffle-block count (guide §2.2).
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                               "128m"))
        # Parquet scans: vectorized reader + predicate pushdown are on by
        # default; keep session tz fixed so timestamp semantics match the
        # DuckDB oracle regardless of host tz.
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode niceties (harmless on cluster)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
