"""Bit-level partitioning invariance of float-valued aggregates.

The r5 rewrite claims (operators/stats.py module docstring) that every
across-row double aggregate in the registry is computed over EXACT
domains (integer power sums, per-term decimal rounding), so the result
is BIT-IDENTICAL under any partitioning — the property native float
accumulators cannot give, and the rerun-determinism story at 1000
executors. This test proves it the direct way: run the float-heaviest
queries in a second session whose ``spark.sql.shuffle.partitions``
(and with it, partial-aggregation grouping order) differs, and compare
type-tagged canonical rows EXACTLY against the default session's
result. A single flipped last bit fails.
"""

from __future__ import annotations

import pytest

from mapreducewordcounting_spark.registry import all_queries
from tests.oracle_util import canonical_rows

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep

#: queries whose outputs are float aggregates over many rows — the
#: ones a summation-order change would flip first.
FLOAT_AGG_QUERIES = (
    "agg_stats_moments",
    "agg_regression",
    "agg_higher_moments",
    "agg_winsorized_mean",
    "agg_weighted_stats",
    "text_bm25",
    "text_token_entropy",
    "text_vocab_coverage",
    "text_unigram_logprob",
    "drift_psi_value",
)


@pytest.fixture(scope="module")
def spark_alt(spark):
    """Same SparkContext, separate SQLConf with a coprime shuffle
    fan-out — partial/final aggregation grouping differs from the
    default session's, which is exactly the perturbation the exact-sum
    forms must be invariant to."""
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "3")
    return s


@pytest.mark.parametrize("name", FLOAT_AGG_QUERIES)
def test_bitwise_invariant_under_repartitioning(name, spark, spark_alt,
                                                sf_dir):
    spec = all_queries()[name]
    base = [r.asDict(recursive=True)
            for r in spec.fn(spark, sf_dir).collect()]
    alt = [r.asDict(recursive=True)
           for r in spec.fn(spark_alt, sf_dir).collect()]
    b, a = canonical_rows(base), canonical_rows(alt)
    assert b == a, [
        (x, y) for x, y in zip(b, a) if x != y
    ][:3]
