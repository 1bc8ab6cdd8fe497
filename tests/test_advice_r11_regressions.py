"""Regression gate for the four ADVICE r11 findings.

1. ``registry.py`` window-layout comment drift — prose, reconciled in
   place (the r12 rotation rewrote the layout narrative); no runtime
   behavior to gate.
2. ``text_analysis.py`` / ``test_plans.py`` BPE job accounting — the
   two comments now state ONE accounting (12 logical materializations
   == <= 22 statusTracker jobs under AQE); the committed assertion is
   unchanged (``test_plans.py::test_bpe_loop_job_count``).
3. ``pack_sequences_greedy`` oracle joined assignments back on
   ``a.lang = n.lang``, silently dropping NULL-lang documents that
   the Spark side's ``groupBy('lang')`` keeps as a NULL group. The
   fixtures carry zero NULL langs, so the driver differential could
   never see it — the test below rebuilds the pathological input
   (a documents table WITH a NULL-lang row) and runs the committed
   oracle SQL against an independent Python greedy fold.
4. ``bench.control_adjudication`` failed OPEN: missing/corrupt pins,
   an absent control pin, or a missing control timing yielded
   ``host_contended=false`` — affirmatively 'clean' when the truth
   was 'could not adjudicate'. Now tri-state: ``host_contended`` is
   null and ``control.status='unadjudicated'`` in every
   cannot-adjudicate case.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

import bench
from mapreducewordcounting_spark.registry import all_queries

# ---------------------------------------------------------------- #
# finding 3: NULL-lang documents must survive the pack oracle        #
# ---------------------------------------------------------------- #

_NULL_LANG_DOCS = [
    # (doc_id, text, lang) — two langs plus a NULL-lang group; token
    # counts chosen so the greedy fold rolls at least one pack over
    (0, "alpha beta gamma delta", "en"),
    (1, "one two three", "en"),
    (2, "uno dos", "fr"),
    (3, "tres cuatro cinco seis", "fr"),
    (4, "null lang doc one", None),
    (5, "null lang doc two here", None),
]


def _python_greedy_pack(rows, budget):
    """Independent greedy fold: per lang (NULL is a group), doc_id
    order, new pack when adding the next doc would overflow."""
    out = {}
    by_lang: dict = {}
    for doc_id, toks, lang in rows:
        by_lang.setdefault(lang, []).append((doc_id, toks))
    for lang, docs in by_lang.items():
        pid, used = 0, 0
        for doc_id, t in sorted(docs):
            if used > 0 and used + t > budget:
                pid, used = pid + 1, 0
            out[doc_id] = (lang, t, pid)
            used += t
    return out


def test_pack_oracle_keeps_null_lang_docs(tmp_path):
    """ADVICE r11 item 3: run the COMMITTED pack_sequences_greedy
    oracle SQL over a documents table containing NULL-lang rows; every
    doc (including the NULL-lang ones) must appear, with pack ids
    matching an independent Python fold."""
    from mapreducewordcounting_spark.operators.training_ops import (
        PACK_BUDGET,
    )

    spec = all_queries()["pack_sequences_greedy"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    for doc_id, text, lang in _NULL_LANG_DOCS:
        con.execute("INSERT INTO documents VALUES (?, ?, ?, ?, ?)",
                    [doc_id, text, lang, "s", len(text)])
    got = con.execute(spec.oracle).fetchall()
    # token counts under the canonical tokenizer == whitespace words
    # here (all-lowercase ascii fixtures)
    expect = _python_greedy_pack(
        [(d, len(t.split()), lang) for d, t, lang in _NULL_LANG_DOCS],
        PACK_BUDGET)
    assert len(got) == len(_NULL_LANG_DOCS), (
        f"oracle dropped rows: {got}")
    for doc_id, lang, n_tokens, pack_id in got:
        e_lang, e_tokens, e_pid = expect[doc_id]
        assert (lang, n_tokens, pack_id) == (e_lang, e_tokens, e_pid), (
            f"doc {doc_id}: oracle ({lang}, {n_tokens}, {pack_id}) "
            f"!= python ({e_lang}, {e_tokens}, {e_pid})")
    # the pathological rows specifically
    null_rows = [r for r in got if r[1] is None]
    assert len(null_rows) == 2, f"NULL-lang rows dropped: {got}"


# ---------------------------------------------------------------- #
# finding 4: control adjudication must fail CLOSED                  #
# ---------------------------------------------------------------- #

def test_control_adjudication_adjudicated_cases():
    pin = json.load(open(bench.PINS_PATH))[bench.CONTROL_QUERY]
    hot = bench.control_adjudication({bench.CONTROL_QUERY: pin * 2.0})
    assert hot["host_contended"] is True
    assert hot["control"]["status"] == "adjudicated"
    cool = bench.control_adjudication({bench.CONTROL_QUERY: pin * 1.0})
    assert cool["host_contended"] is False
    assert cool["control"]["status"] == "adjudicated"


def test_control_adjudication_missing_timing_is_unadjudicated():
    out = bench.control_adjudication({})
    assert out["host_contended"] is None
    assert out["control"]["status"] == "unadjudicated"


@pytest.mark.parametrize("pins_content", [
    None,                          # file absent
    "{not json",                   # corrupt
    json.dumps({}),                # control pin absent
    json.dumps({"wordcount_canonical": 0}),   # zero pin
])
def test_control_adjudication_bad_pins_is_unadjudicated(
        tmp_path, monkeypatch, pins_content):
    p = tmp_path / "bench_pins.json"
    if pins_content is not None:
        p.write_text(pins_content)
    monkeypatch.setattr(bench, "PINS_PATH", str(p))
    out = bench.control_adjudication({bench.CONTROL_QUERY: 1.0})
    assert out["host_contended"] is None, (
        f"fail-open with pins={pins_content!r}: {out}")
    assert out["control"]["status"] == "unadjudicated"


# ---------------------------------------------------------------- #
# r12 follow-on: --accept-pins single-sample drift guard            #
# ---------------------------------------------------------------- #

def test_accept_pins_holds_unprovenanced_drift():
    """r12 lesson: a clean-control sweep still inflated ~20 untouched
    single-sample rows 1.3-1.7x, and wholesale acceptance baked that
    drift into the pins. accept_pins must HOLD a >ACCEPT_DRIFT move
    without median-of-3 provenance, accept the same move WITH it,
    accept small moves, and accept brand-new rows."""
    from tools.bench_outliers import ACCEPT_DRIFT, accept_pins

    pins = {"a": 1.0, "b": 1.0, "c": 1.0, "shrunk": 1.0}
    times = {"a": 1.1,                      # small move: accept
             "b": ACCEPT_DRIFT * 1.2,       # big move, no provenance
             "c": ACCEPT_DRIFT * 1.2,       # big move, repinned
             "shrunk": 1.0 / (ACCEPT_DRIFT * 1.2),  # big DROP, no prov
             "new": 9.9}                    # no pin yet: accept
    accepted, held = accept_pins(times, pins, repinned={"c"})
    assert accepted["a"] == 1.1
    assert accepted["b"] == 1.0 and "b" in held
    assert accepted["c"] == times["c"]
    assert accepted["shrunk"] == 1.0 and "shrunk" in held
    assert accepted["new"] == 9.9
    assert sorted(held) == ["b", "shrunk"]
