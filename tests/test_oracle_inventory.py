"""The mirrored-oracle inventory must stay TOTAL and LIVE (VERDICT r5
item 4): every oracled query classified, every mirrored entry backed
by a differential test that actually exists, and the generated table
in TESTDATA.md in sync with the classification."""

from __future__ import annotations

import os
import re

from tools.oracle_classes import (
    MARK_BEGIN,
    MIRRORED,
    classify,
    render_table,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_oracle_is_classified():
    from mapreducewordcounting_spark.registry import all_queries

    oracled = {n for n, s in all_queries().items() if s.oracle is not None}
    cls = classify()
    assert set(cls) == oracled  # total, no extras
    assert all(c in ("independent", "mirrored", "probe")
               for c, _ in cls.values())


def test_mirrored_names_are_oracled_queries():
    from mapreducewordcounting_spark.registry import all_queries

    qs = all_queries()
    for name in MIRRORED:
        assert name in qs and qs[name].oracle is not None, name


def test_every_mirrored_entry_has_a_real_differential():
    """Parse each 'file.py::test_fn' reference and check the function
    exists in that test module."""
    ref_re = re.compile(r"(test_\w+\.py)::(test_\w+)")
    for name, (_, diff) in MIRRORED.items():
        refs = ref_re.findall(diff)
        assert refs, f"{name}: no test reference in {diff!r}"
        for fname, fn in refs:
            path = os.path.join(REPO, "tests", fname)
            assert os.path.exists(path), (name, fname)
            with open(path) as f:
                src = f.read()
            assert f"def {fn}(" in src, (name, fname, fn)


def test_testdata_table_is_in_sync():
    with open(os.path.join(REPO, "TESTDATA.md")) as f:
        doc = f.read()
    assert MARK_BEGIN in doc, "run: python tools/oracle_classes.py"
    assert render_table() in doc, (
        "TESTDATA.md inventory is stale — run: python tools/oracle_classes.py")
