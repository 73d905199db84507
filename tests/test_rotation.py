"""Guard for the driver correctness-window rotation policy.

The driver records oracle rows for only a bounded prefix of
``__spark_entry__.queries()`` (~50 entries), so the battery ordering IS
the coverage policy.  Round 8 proved a comment is not a rotation (the
head never moved, 12 entries went two rounds with zero driver
evidence); round 9's hand-rotated head + static guard then failed the
suite the moment the driver wrote a fresh CORRECTNESS file (verdict r9
finding #1).  Since r10 the ordering is SELF-COMPUTING:
``queries()`` sorts by last-green round (never-checked first) with
``_PRIORITY`` position as the tiebreak, so the driver always checks the
stalest window and no hand rotation exists to forget.  These tests pin
that invariant — they recompute the policy from the same history and
must hold no matter which CORRECTNESS files exist.

Staleness bound: with ~112 entries and a 50-row window, stalest-first
ordering revisits every entry at least every ceil(112/50) = 3 rounds.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _window() -> int:
    """The driver's oracle prefix length, observed from the most recent
    CORRECTNESS file (r8 and r9 both recorded 50 rows). Falls back to 50
    if no history exists yet."""
    newest, rows = -1, 50
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        if rnd > newest:
            newest, rows = rnd, len(data)
    return rows


def _last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and not row.get("err"):
                last[name] = max(last.get(name, -1), rnd)
    return last


def test_battery_is_staleness_ordered():
    """No entry outside the window may be strictly staler than any entry
    inside it. Holds by construction now that queries() self-orders, but
    pins the construction: a regression to hand ordering fails here on
    the next driver artifact instead of in the driver."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert len(names) == len(set(names))
    window = _window()
    last = _last_green()
    head, tail = names[:window], names[window:]
    if not tail:
        return
    worst_in_head = max(last.get(n, -1) for n in head)
    best_in_tail = min(last.get(n, -1) for n in tail)
    assert worst_in_head <= best_in_tail, (
        f"self-ordering broken: window head holds entries last-green in "
        f"round {worst_in_head} while round-{best_in_tail} entries sit "
        f"outside the {window}-entry window"
    )


def test_never_checked_entries_lead_window():
    import __spark_entry__ as entry

    names = list(entry.queries())
    last = _last_green()
    window = _window()
    never = [n for n in names if n not in last]
    outside = [n for n in never if n not in names[:window]]
    assert not outside, (
        f"{len(outside)} battery entries have never had a driver oracle "
        f"row yet sit outside the {window}-entry window: {outside}"
    )


def test_ordering_matches_policy_function():
    """queries() must order exactly as battery_order() says — the two
    share the implementation today; this catches a future split."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert names == entry.battery_order(names)


def test_staleness_bound_is_satisfiable():
    """The documented bound (every entry revisited within 3 rounds) must
    be arithmetically consistent with battery size vs window size."""
    import math

    import __spark_entry__ as entry

    n = len(entry.queries())
    assert math.ceil(n / _window()) <= 3, (
        f"battery grew to {n} entries: a {_window()}-row window can no "
        f"longer revisit every entry within 3 rounds — trim the battery "
        f"or restate the bound in _PRIORITY's header"
    )


def test_priority_covers_every_query():
    import __spark_entry__ as entry

    names = set(entry.queries())
    listed = set(entry._PRIORITY)
    # every _PRIORITY name must be a real query (catches renames/typos)
    ghosts = listed - names
    assert not ghosts, f"_PRIORITY names with no queries() entry: {sorted(ghosts)}"
    unlisted = names - listed
    assert not unlisted, (
        f"queries() entries missing from _PRIORITY (their tiebreak "
        f"position is accidental): {sorted(unlisted)}"
    )


def test_changed_module_entry_leads_cohort(monkeypatch):
    """Change-aware rotation (verdict r13 #3): an entry whose implementing
    module diff'd since its last-green round sorts ahead of equal-staleness
    peers, so code-changed components never wait extra rounds for a driver
    recheck."""
    import __spark_entry__ as entry

    last = entry._last_green_rounds()
    names = list(entry.queries())
    # pick any cohort with >= 2 entries from different module families
    by_round: dict[int, list[str]] = {}
    for n in names:
        by_round.setdefault(last.get(n, -1), []).append(n)
    rnd, cohort = next(
        (r, c) for r, c in sorted(by_round.items()) if r >= 0 and len(c) >= 2
    )
    target, other = cohort[0], cohort[-1]
    t_mods = entry._entry_modules(target)
    # simulate: only `target`'s module changed since round `rnd`
    monkeypatch.setattr(
        entry, "_changed_since_round",
        lambda r: frozenset({t_mods[0] + ("x.py" if t_mods[0].endswith("/") else "")}),
    )
    order = entry.battery_order(cohort)
    assert entry._change_bumped(target, rnd)
    bumped = [n for n in cohort if entry._change_bumped(n, rnd)]
    not_bumped = [n for n in cohort if n not in bumped]
    if not_bumped:
        worst_bumped = max(order.index(n) for n in bumped)
        best_not = min(order.index(n) for n in not_bumped)
        assert worst_bumped < best_not, (
            "change-bumped entries must lead their staleness cohort"
        )


def test_change_bump_degrades_gracefully(monkeypatch):
    """No git / no marker => pure staleness ordering, never an exception."""
    import __spark_entry__ as entry

    monkeypatch.setattr(entry, "_changed_since_round", lambda r: frozenset())
    names = list(entry.queries())
    order = entry.battery_order(names)
    assert sorted(order) == sorted(names)
