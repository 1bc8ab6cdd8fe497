"""Driver-window rotation audit + next-round proposal.

The driver's CORRECTNESS artifact samples the first ~50 entries of
``registry.queries()`` each round, and the window rotates so external
evidence accumulates toward all-queries-sampled (VERDICT r3 item 4,
r5 item 1). This tool makes the rotation auditable and mechanical:

    python tools/rotate_window.py            # audit + proposal
    python tools/rotate_window.py --check    # audit only, exit != 0
                                             # on a wasted window slot

It reads every CORRECTNESS_r*.json at the repo root, computes per
query (a) whether it was ever sampled and (b) whether it ever fully
passed (rows+schema+hash), then:

  * AUDITS the current window: every slot in the first 48 positions
    should be a never-sampled fully-oracled query (coverage push) or
    a documented canary; a slot spent re-sampling an already-passing
    query while never-sampled oracled queries remain is flagged.
  * PROPOSES the next-round head: the remaining never-sampled oracled
    queries first (registry order), then the canary pair, then
    ever-failed-but-now-locally-green queries for re-confirmation,
    then everything else (previously-passing, then rows-only last).

The proposal is printed as a ready-to-paste Python tuple body; the
builder still applies it by editing ``registry._PRIORITY`` (the order
is a reviewed, committed artifact — not something to mutate at import
time, which would make each round's window depend on which artifacts
happen to sit in the working tree).
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Where CORRECTNESS_r*.json artifacts are read from. Overridable so
# the regression tests can stage fabricated artifact sets (e.g. the
# ADVICE r10 single-artifact boundary case) without touching the
# real round history at the repo root.
ARTIFACT_DIR = os.environ.get("ROTATE_WINDOW_ARTIFACT_DIR", REPO)

WINDOW = 50          # driver samples this many entries per round
COVERAGE_SLOTS = 48  # head slots reserved for the coverage push
CANARY = ("probe_env_duckdb_version", "probe_type_hugeint_sum_uncast")


def load_history(skip_newest: bool = False
                 ) -> tuple[dict[str, dict[str, bool]], str | None]:
    """name -> {sampled: bool, full_pass_ever: bool} across rounds,
    plus the newest artifact's basename. ``skip_newest`` rebuilds the
    PRE-round view (everything except the newest artifact) — the
    state the committed window was planned against."""
    paths = sorted(glob.glob(os.path.join(ARTIFACT_DIR, "CORRECTNESS_r*.json")))
    newest = os.path.basename(paths[-1]) if paths else None
    if skip_newest:
        paths = paths[:-1]
    hist: dict[str, dict[str, bool]] = {}
    for path in paths:
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            h = hist.setdefault(name, {"sampled": False, "full_pass": False})
            h["sampled"] = True
            if (rec.get("rows_match") and rec.get("schema_match")
                    and rec.get("hash_match")):
                h["full_pass"] = True
    return hist, newest


def main() -> int:
    check_only = "--check" in sys.argv

    from mapreducewordcounting_spark import registry
    specs = registry.all_queries()
    order = list(specs)
    hist, newest = load_history()

    never_sampled = [n for n in order if not hist.get(n, {}).get("sampled")]
    never_sampled_oracled = [n for n in never_sampled if specs[n].oracle]
    ever_failed = [n for n, h in hist.items()
                   if h["sampled"] and not h["full_pass"]
                   and n in specs and specs[n].oracle]

    window = order[:WINDOW]

    def audit(h: dict[str, dict[str, bool]]) -> list[str]:
        # Slots re-sampling a passing query are only "wasted" while a
        # never-sampled oracled query remains OUTSIDE the window to
        # put there — once every never-sampled query (oracled or not)
        # is already placed, the leftover slots legitimately
        # re-confirm.
        ns_oracled = [n for n in order
                      if not h.get(n, {}).get("sampled") and specs[n].oracle]
        displaced = [n for n in ns_oracled
                     if n not in set(window[:COVERAGE_SLOTS])]
        return [n for n in window[:COVERAGE_SLOTS]
                if n not in CANARY
                and h.get(n, {}).get("full_pass")] if displaced else []

    wasted = audit(hist)
    # Round-boundary auto-excuse (VERDICT r9 item 5): when the waste
    # only exists because the NEWEST artifact just harvested the
    # committed window (i.e. the window was clean against every
    # artifact that existed when it was committed), this is the
    # normal end-of-round state, not a planning defect — say so and
    # pass, instead of making each judge re-derive "bookkeeping".
    # Caveats (ADVICE r10): (a) with only ONE artifact on disk,
    # skip_newest would leave an EMPTY history whose audit is
    # vacuously clean — any waste would be auto-excused — so the
    # excuse requires >= 2 artifacts; (b) audit() evaluates the
    # pre-round history against the CURRENT registry order/window,
    # which can differ from the order the committed window was
    # planned against — acceptable because the excuse only ever
    # RELAXES --check, never tightens it, and a rotated window is
    # re-audited against the full history on its own next round.
    boundary = False
    n_artifacts = len(glob.glob(os.path.join(ARTIFACT_DIR, "CORRECTNESS_r*.json")))
    if wasted and newest and n_artifacts > 1:
        hist_prev, _ = load_history(skip_newest=True)
        if not audit(hist_prev):
            boundary = True

    print(f"registry: {len(order)} queries "
          f"({sum(1 for n in order if specs[n].oracle)} oracled)")
    print(f"ever sampled: {sum(1 for h in hist.values() if h['sampled'])}  "
          f"ever full-pass: {sum(1 for h in hist.values() if h['full_pass'])}")
    print(f"never sampled: {len(never_sampled)} "
          f"({len(never_sampled_oracled)} oracled)")
    print(f"sampled-but-never-full-pass (oracled): {sorted(ever_failed)}")
    if boundary:
        print(f"current window head ({COVERAGE_SLOTS} coverage slots): "
              f"OK (round boundary: window fully harvested by {newest}; "
              f"run tools/rotate_window.py and paste the proposal into "
              f"registry._PRIORITY to rotate for the next round)")
    else:
        print(f"current window head ({COVERAGE_SLOTS} coverage slots): "
              f"{len(wasted)} wasted -> {wasted or 'OK'}")

    if check_only:
        return 1 if (wasted and not boundary) else 0

    # -------- next-round proposal --------
    in_window = set(window)
    nxt: list[str] = []
    nxt += [n for n in never_sampled_oracled if n not in in_window]
    nxt += [n for n in never_sampled_oracled if n in in_window]
    head = nxt[:COVERAGE_SLOTS]
    used = set(head)
    head += [c for c in CANARY if c not in used]
    used.update(CANARY)
    tail: list[str] = []
    tail += [n for n in order if n not in used and n in set(ever_failed)]
    tail += [n for n in order
             if n not in used and n not in set(ever_failed) and specs[n].oracle]
    tail += [n for n in order if n not in used and not specs[n].oracle
             and n not in tail]
    proposal = head + [n for n in tail if n not in used]

    print("\n# proposed next-round _PRIORITY head "
          f"({len([n for n in head if n not in CANARY])} coverage + canary):")
    for i in range(0, len(proposal), 4):
        chunk = ", ".join(repr(n) for n in proposal[i:i + 4])
        print(f"    {chunk},")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
