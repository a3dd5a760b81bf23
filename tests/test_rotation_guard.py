"""Correctness-window rotation guard (r10, VERDICT r09 #6).

The driver's per-round CORRECTNESS sweep covers only the FIRST ~50
queries in ``all_queries()`` order, so which queries sit in that head
IS the re-verification policy. Rotation was hand-maintained for nine
rounds; r9's 22 new entries silently aged a 20-query cohort to the
3-round staleness limit. This guard makes the policy mechanical:

1. Staleness comes from the recorded driver sweeps themselves
   (CORRECTNESS_r*.json at the repo root), not from any hand-kept
   list — a green row is ``err is null and rows_match`` (hash_match
   may be absent for rows-only checks).
2. The window (first WINDOW_SIZE names) must be stalest-first: no
   query OUTSIDE the window may be strictly staler than a non-changed
   query INSIDE it. ``_CHANGED_THIS_ROUND`` entries are exempt —
   changed values/oracles/plans re-earn a driver row regardless of
   staleness (the standing rule since r6).
3. Every name in ``_CHANGED_THIS_ROUND`` must actually be in the
   window (a changed query that misses the sweep ships unverified).

With 160 queries and ~50 seats, a full cycle takes ceil(160/50) = 4
rounds even under perfect rotation — so the enforceable invariant is
stalest-first ordering, not an absolute staleness bound. The absolute
record (nothing older than its cycle-length) follows from this guard
holding round over round.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50


def _driver_latest_green() -> tuple[dict[str, int], int]:
    """name -> latest round with a green driver row, plus the latest
    round number on record."""
    latest: dict[str, int] = {}
    max_round = 0
    for f in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        max_round = max(max_round, rnd)
        with open(f) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            ok = row.get("err") is None and row.get("rows_match")
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def test_window_is_stalest_first_modulo_changed():
    from poormans_kube_etl_spark import queries as q

    q.load_all()
    latest, max_round = _driver_latest_green()
    assert max_round >= 1, "no CORRECTNESS_r*.json found — guard cannot run"

    ordered = list(q.all_queries())
    window = ordered[:WINDOW_SIZE]
    outside = ordered[WINDOW_SIZE:]
    changed = set(q._CHANGED_THIS_ROUND)

    def staleness(name: str) -> int:
        # never driver-checked = infinitely stale
        row = latest.get(name)
        return 10**6 if row is None else max_round - row

    max_out = max((staleness(n) for n in outside), default=0)
    stalest_out = max(outside, key=staleness, default=None)
    for n in window:
        if n in changed:
            continue
        assert staleness(n) >= max_out, (
            f"window seat wasted: {n!r} (staleness {staleness(n)}) sits in "
            f"the sweep window while {stalest_out!r} (staleness {max_out}) "
            "waits outside — reorder _PRIORITY stalest-first"
        )


def test_changed_queries_all_inside_window():
    from poormans_kube_etl_spark import queries as q

    q.load_all()
    window = set(list(q.all_queries())[:WINDOW_SIZE])
    missing = [n for n in q._CHANGED_THIS_ROUND if n not in window]
    assert not missing, (
        f"changed-this-round queries outside the sweep window: {missing} — "
        "their restructured plans/oracles would ship without a driver row"
    )


def test_changed_queries_are_registered():
    from poormans_kube_etl_spark import queries as q

    q.load_all()
    unknown = [n for n in q._CHANGED_THIS_ROUND if n not in q.QUERIES]
    assert not unknown, f"_CHANGED_THIS_ROUND names not registered: {unknown}"
