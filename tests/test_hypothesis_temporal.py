"""Property-based differentials for the interval operators
(tests/test_hypothesis_* family, SURVEY.md §5.2 item 4).

The registered queries run the operators over fixture-synthesized
intervals whose spans never exceed one time cell; these properties
drive the LIBRARY forms (operators/temporal.py) with hypothesis-
generated intervals — duplicate keys, touching endpoints, zero-length
intervals, and spans WIDER than the 16-day cell (multi-cell explode +
the later-start-cell claim are exactly the parts a fixture can't
stress) — against a brute-force O(n²)/O(n·days) Python oracle.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreducewordcounting_spark.operators.temporal import (
    interval_max_concurrency_sweep,
    interval_overlap_pairs,
)

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep

_D0 = dt.date(1992, 1, 1)

#: (key, start-offset-days, span-days) — spans up to 40 days cross
#: 2-4 of the 16-day cells; offsets collide deliberately.
_iv = st.tuples(st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=60),
                st.integers(min_value=0, max_value=40))


def _ivs(min_size=0, max_size=10):
    return st.lists(_iv, min_size=min_size, max_size=max_size)


def _mk(spark, rows):
    data = [(k, i, _D0 + dt.timedelta(days=off),
             _D0 + dt.timedelta(days=off + span))
            for i, (k, off, span) in enumerate(rows)]
    df = spark.createDataFrame(data, "k INT, rid INT, s DATE, e DATE")
    return df if data else df.filter(F.lit(False))


@settings(max_examples=20, deadline=None)
@given(_ivs())
def test_overlap_pairs_match_bruteforce(spark_h, rows):
    got = {
        (r.k, r.a_rid, r.b_rid, r.overlap_days)
        for r in interval_overlap_pairs(
            _mk(spark_h, rows), "k", ("rid",)).collect()
    }
    want = set()
    iv = [(k, i, off, off + span) for i, (k, off, span) in enumerate(rows)]
    for ai in range(len(iv)):
        for bi in range(ai + 1, len(iv)):
            (ka, ia, sa, ea), (kb, ib, sb, eb) = iv[ai], iv[bi]
            if ka == kb and sa <= eb and sb <= ea:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                want.add((ka, lo, hi, min(ea, eb) - max(sa, sb) + 1))
    assert got == want


@settings(max_examples=20, deadline=None)
@given(_ivs(min_size=1))
def test_max_concurrency_matches_bruteforce(spark_h, rows):
    got = {
        (r.k, r.max_inflight)
        for r in interval_max_concurrency_sweep(
            _mk(spark_h, rows), "k").collect()
    }
    want = {}
    for k, off, span in rows:
        best = want.get(k, 0)
        for day in range(off, off + span + 1):
            n = sum(1 for k2, o2, s2 in rows
                    if k2 == k and o2 <= day <= o2 + s2)
            best = max(best, n)
        want[k] = best
    assert got == set(want.items())
