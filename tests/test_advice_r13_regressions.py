"""Regression gates for the ADVICE r13 findings (mechanized in r14).

Finding 1 (tools/bench_outliers.py): the 9-entry r13 host-drift
ACKNOWLEDGED block silences rows citing host drift, but the 2-job
controls are structurally insensitive to per-job-scheduling drift —
so the advice ordered an explicit expiry: on a sweep whose own
control adjudicated the host CLEAN, a still-flagging host-drift ack
must convert to the real regression it deferred instead of silencing
the row. ``ack_disposition`` is that rule, pure; these tests pin it.

Findings 2-3 (tools/bench_scale.py warmup dir + per-tier ratios) are
script-main fixes exercised by running the tool; their contracts are
asserted textually here so a revert is caught without a Spark run.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_outliers import ack_disposition  # noqa: E402

HOST_DRIFT_ACK = "r13 host-drift block (see above)"
STRUCTURAL_ACK = "footer-stats full listing is the feature"


def test_host_drift_ack_expires_on_clean_sweep():
    # clean-adjudicated sweep + still-flagging host-drift ack = the
    # deferred regression: must read EXPIRED (fails --check)
    assert ack_disposition(HOST_DRIFT_ACK, False) == "expired"


def test_host_drift_ack_holds_on_contended_or_unadjudicated_sweep():
    # the drift the ack cites is still plausible: keep silencing
    assert ack_disposition(HOST_DRIFT_ACK, True) == "acknowledged"
    assert ack_disposition(HOST_DRIFT_ACK, None) == "acknowledged"


def test_structural_ack_never_expires():
    # only host-drift acks carry the "clean sweep un-flags me" claim
    for contended in (False, True, None):
        assert ack_disposition(STRUCTURAL_ACK, contended) == "acknowledged"


def test_no_ack_is_unresolved():
    for contended in (False, True, None):
        assert ack_disposition(None, contended) == "none"


def test_bench_scale_advice_fixes_stay_applied():
    src = open(os.path.join(REPO, "tools", "bench_scale.py")).read()
    # finding 2: warmup must target WARM_SF_DIR, never DIRS[0]
    assert 'materialize(qs["wordcount_canonical"](spark, WARM_SF_DIR))' in src
    assert "(spark, DIRS[0])" not in src
    # finding 3: each ratio computed from its own adjacent tiers
    assert 'if row.get("sf0.1") and row.get("sf1")' in src
    assert 'if row.get("sf1") and row.get("sf10")' in src
