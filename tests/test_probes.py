"""Probe-family unit tests (operators/probes.py).

The probes' oracle-match runs with the rest of the registry in
test_registry_oracle.py; these tests pin the parts a differential
check can't see — the version encoding that turns the CORRECTNESS
artifact's row counts into an environment readout, and the sentinel
properties the next round's diagnosis depends on.
"""

from __future__ import annotations

import math

from mapreducewordcounting_spark.operators.probes import _encode_version
from mapreducewordcounting_spark.registry import all_queries


def test_version_encoding():
    assert _encode_version("1.0.0") == 10000
    assert _encode_version("1.3.2") == 10302
    assert _encode_version("v1.3.2") == 10302
    assert _encode_version("17.0.0") == 170000
    assert _encode_version("2.2.2") == 20202
    assert _encode_version("1.4") == 10400          # short version
    assert _encode_version("1.3.2.dev123") == 10302  # dev suffix
    assert _encode_version("1.3.2rc1") == 10302      # rc suffix on patch
    assert _encode_version("") == 1                  # unparseable -> runs
    assert _encode_version("garbage") == 1


def test_env_probe_rowcounts_encode_local_versions(spark, sf_dir):
    import duckdb
    import pandas
    import pyarrow

    qs = all_queries()
    assert (qs["probe_env_duckdb_version"].fn(spark, sf_dir).count()
            == _encode_version(duckdb.__version__))
    assert (qs["probe_env_pyarrow_version"].fn(spark, sf_dir).count()
            == _encode_version(pyarrow.__version__))
    assert (qs["probe_env_pandas_version"].fn(spark, sf_dir).count()
            == _encode_version(pandas.__version__))


def test_negzero_sentinel_actually_carries_negative_zero(spark, sf_dir):
    """The sentinel is only a measurement if the value under test is
    really ``-0.0`` on the Spark side (and ``+0.0`` after the
    normalization column) — pin the signs, which numeric comparison
    can't distinguish."""
    df = all_queries()["probe_type_double_negzero"].fn(spark, sf_dir)
    for row in df.collect():
        assert row.neg_zero == 0.0 and math.copysign(1, row.neg_zero) == -1
        assert math.copysign(1, row.neg_zero_norm) == 1


def test_sentinels_are_exempt_from_type_contract_and_nothing_else():
    """Exactly the two deliberate type-hazard sentinels carry the
    'sentinel' tag among ORACLED queries (the exemption list of
    test_output_type_contract must not silently grow), plus the
    negzero probe whose hazard lives in the value, not the type."""
    specs = all_queries()
    sentinels = {n for n, s in specs.items()
                 if s.oracle is not None and "sentinel" in s.tags}
    assert sentinels == {"probe_type_hugeint_sum_uncast",
                         "probe_type_decimal_raw",
                         "probe_type_double_negzero"}
