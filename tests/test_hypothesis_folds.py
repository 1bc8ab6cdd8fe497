"""Property-based gates for the r11 DuckDB ``list_reduce`` fold
oracles (text_bpe_learn_merges' greedy fusion, pack_sequences_greedy's
bin packer).

Both oracles are construction-MIRRORED: the Spark side folds with
F.aggregate / an applyInPandas loop, the DuckDB side with a
list_reduce whose state is string-encoded — a transcription error in
either encoding (consumed-flag placement, boundary token handling,
budget comparison direction) would pass the fixture differential on
both sides if the fixture never hits the edge. Hypothesis drives the
DuckDB fold DIRECTLY (no Spark needed — milliseconds per case)
against an independent plain-Python reference on adversarial inputs:
repeated-symbol chains ('aaaa' + merge(a,a)), merges whose result
collides with other tokens, oversized first documents, exact-budget
boundaries.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
import pytest

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep

_SYMS = ("a", "b", "c", "aa", "ab")

_word = st.lists(st.sampled_from(_SYMS), min_size=1, max_size=8)
_pair = st.tuples(st.sampled_from(_SYMS), st.sampled_from(_SYMS))


def _fuse_python(tokens: list[str], l: str, r: str) -> list[str]:
    """The documented greedy left-to-right fusion (independent of both
    engine encodings): scan tokens, fuse (l, r) adjacencies, a fused
    token never re-fuses in the same round."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        if (i + 1 < len(tokens)
                and tokens[i] == l and tokens[i + 1] == r):
            out.append(l + r)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def _duck_fuse(tokens: list[str], l: str, r: str) -> list[str]:
    """Evaluate the exact fold fragment the BPE oracle generates."""
    from mapreducewordcounting_spark.operators.text_analysis import (
        _bpe_oracle_sql,
    )

    sql = _bpe_oracle_sql(1)
    start = sql.index("list_filter(str_split(substr(")
    end = sql.index(", t -> t <> '')", start) + len(", t -> t <> '')")
    frag = sql[start:end]
    return duckdb.sql(
        f"SELECT {frag} FROM (SELECT ? AS toks, ? AS l, ? AS r) b",
        params=[tokens, l, r]).fetchone()[0]


@settings(max_examples=120, deadline=None)
@given(_word, _pair)
def test_bpe_fusion_fold_matches_python(tokens, pair):
    l, r = pair
    assert _duck_fuse(tokens, l, r) == _fuse_python(tokens, l, r), (
        tokens, l, r)


def _pack_python(sizes: list[int], budget: int) -> list[int]:
    pid, used, out = 0, 0, []
    for t in sizes:
        if used > 0 and used + t > budget:
            pid, used = pid + 1, 0
        out.append(pid)
        used += t
    return out


def _duck_pack(sizes: list[int], budget: int) -> list[int]:
    """Evaluate the exact list_reduce the packer oracle generates."""
    from mapreducewordcounting_spark.operators.training_ops import (
        _pack_greedy_oracle_sql,
    )

    sql = _pack_greedy_oracle_sql(budget)
    start = sql.index("list_reduce(list_prepend('0|0|', items),")
    # the fold expression ends right before its alias in the f CTE
    end = sql.index("AS packed", start)
    frag = sql[start:end].strip()
    items = [f"{i}:{t}" for i, t in enumerate(sizes)]
    packed = duckdb.sql(
        f"SELECT {frag} FROM (SELECT ? AS items) g",
        params=[items]).fetchone()[0]
    out = [0] * len(sizes)
    assignments = packed.split("|", 2)[2]
    for kv in assignments.split(","):
        d, p = kv.split(":")
        out[int(d)] = int(p)
    return out


@settings(max_examples=120, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=12), min_size=1,
                max_size=12),
       st.integers(min_value=1, max_value=10))
def test_pack_fold_matches_python(sizes, budget):
    assert _duck_pack(sizes, budget) == _pack_python(sizes, budget), (
        sizes, budget)
