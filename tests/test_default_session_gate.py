"""Driver-session robustness: the oracle gate must hold in a Spark
session the REPO DID NOT CONFIGURE.

The round driver constructs its own SparkSession; nothing guarantees
it sets session timezone, shuffle partitions, broadcast thresholds, or
any of get_spark()'s tuning. Every repo correctness run so far went
through sessions that pin at least SOME conf (UTC + partitions in
tools/verify_full.py, the full get_spark() tuning in conftest), so a
query silently depending on one of those knobs would be invisible
locally and fail only in the driver's world — the exact failure mode
round 4 taught us to close proactively.

This gate runs a representative cross-family slice (every temporal
query, both sinks, probes, and one query per major family) through
``assert_matches_oracle`` in a SUBPROCESS whose SparkSession is built
with ``SparkSession.builder.master("local[4]").getOrCreate()`` and
nothing else: default 200 shuffle partitions (coprime to every
fixture cardinality we use), default ANSI, default broadcast
threshold, and NO session timezone — proving catalog.py's per-load
UTC pin and the output conventions carry the whole weight.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: cross-family slice: all temporal/timestamp-adjacent queries (the
#: session-tz hazard), the IO round-trips (write-path confs), the
#: probe family (the next round's measurement must not itself be
#: conf-sensitive), and one representative per major family.
_SLICE = (
    "probe_env_duckdb_version", "probe_type_hugeint_sum_uncast",
    "probe_type_decimal_raw", "probe_type_double_negzero",
    "probe_fn_hash_digits", "probe_fn_split_sort",
    "probe_fn_temporal_arith",
    "sink_partitioned_prune", "source_csv_roundtrip",
    "scd2_event_intervals", "time_resample_ffill", "fn_struct",
    "join_asof", "join_interval_overlap", "growth_accounting_daily",
    "wordcount_canonical", "tpch_q3_shipping_priority", "agg_percentiles",
    "agg_stats_moments", "agg_higher_moments", "window_percent_rank",
    "text_bm25", "text_token_entropy", "dedup_exact",
    "dedup_embedding_cosine", "similarity_ann_rp_det",
    "validate_table_fingerprint", "sample_split_3way", "fn_trig",
    "skew_key_histogram", "mm_metadata_stats",
)

_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {tests!r})
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import duckdb
    con = duckdb.connect()
    SF = {sf!r}
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {{t}} AS SELECT * FROM '{{SF}}/{{t}}.parquet'")
    from mapreducewordcounting_spark.registry import all_queries
    from oracle_util import assert_matches_oracle
    specs = all_queries()
    failures = []
    for name in {names!r}:
        spec = specs[name]
        try:
            assert_matches_oracle(spec.fn(spark, SF), con, spec.oracle)
        except Exception as exc:
            failures.append((name, repr(exc)[:300]))
        print(name, "ok" if not failures or failures[-1][0] != name
              else "FAIL", flush=True)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL-DEFAULT-SESSION-GREEN")
""")


def test_gate_holds_in_unconfigured_session(sf_dir):
    script = _SCRIPT.format(repo=_REPO, tests=os.path.join(_REPO, "tests"),
                            sf=sf_dir, names=_SLICE)
    env = dict(os.environ)
    # Foreign HOST timezone + unconfigured session, in driver order
    # (probes BEFORE any load_table call). Coverage story: the probe
    # window runs fully un-pinned (probes are tz-free by construction
    # and must not mutate the session — an earlier revision's
    # conf.set("...timeZone","UTC") inside a probe masked this gate
    # for every query after it); the first load_table call then
    # exercises the per-load UTC pin ITSELF — delete catalog.py's pin
    # and the day-truncating slice queries (growth_accounting_daily,
    # scd2_event_intervals) diverge from their naive-timestamp DuckDB
    # oracles under the NY session.
    env["TZ"] = "America/New_York"
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    assert "ALL-DEFAULT-SESSION-GREEN" in proc.stdout
