"""Host-timezone robustness gate: the temporal slice of the registry
re-runs its oracle checks in a subprocess whose OS timezone is
America/New_York (UTC-4/-5), not UTC.

Why a subprocess: the JVM captures the host zone at launch, so an
in-process conf flip cannot reproduce the hazard. The hazard itself:
PySpark ``collect()`` converts TimestampType through the OS-LOCAL
zone (not the session zone), so any oracle-checked query that emits a
raw timestamp becomes host-dependent. Policy (SCALING.md "known
cliffs"): emit ``unix_micros(...)`` / ``epoch_us(...)`` instead —
this gate proves the policy holds for every timestamp-touching query.
"""

from __future__ import annotations

import os
import subprocess
import sys
import pytest

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep

# every registry query whose Spark side or oracle touches a timestamp
# or date column (events.ts, o_orderdate, l_shipdate aggregations)
_TEMPORAL_K = (
    "fn_date or fn_time_events or fn_date_arith or fn_datetime_extras or "
    "fn_struct or join_asof or join_range or time_rollup_multires or "
    "time_gapfill_weekly or scd2_event_intervals or compact_keep_latest or "
    "stream_tumbling_batch_twin or stream_sliding_batch_twin or "
    "stream_session_batch_twin or stream_partitioned_sink or "
    "mv_incremental_refresh or join_dpp_partitioned or pyds_stream_ledger "
    "or time_resample_ffill or funnel_3step or retention_cohort_weekly or "
    "stream_foreachbatch_compact or sink_tombstone_purge or "
    "join_asof_tolerance or growth_accounting_daily or "
    "join_pit_versioned_dim or window_rolling_zscore or drift_psi_value "
    "or join_interval_overlap or interval_max_concurrency"
)


def test_temporal_queries_match_oracle_under_eastern_tz():
    env = dict(os.environ)
    env["TZ"] = "America/New_York"
    env.pop("SPARK_GRAFT_TEST_SF_DIR", None)  # sf0.001 tier
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_registry_oracle.py",
         "-q", "-p", "no:cacheprovider", "-k", _TEMPORAL_K],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert " passed" in proc.stdout and "failed" not in proc.stdout
