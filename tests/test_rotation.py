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
Since r15, up to _CHANGE_RESERVE change-bumped entries from outside the
window preempt unchanged entries at the fresh end of the head (newest
change first), so code changed this round is driver-rechecked next
round by construction — at the bounded cost that the preempted entries
may carry 4-round-old evidence for one round before re-entering the
head as the stalest.
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
    # recompute the no-reserve (pure stalest-first) head with the same
    # key battery_order uses, then bound the reserve's deviation from it
    pos = {n: i for i, n in enumerate(entry._PRIORITY)}

    def key(n):
        return (
            last.get(n, -1),
            0 if entry._change_bumped(n, last.get(n, -1)) else 1,
            pos.get(n, len(entry._PRIORITY)),
            n,
        )

    base = sorted(names, key=key)
    base_head, base_tail = base[:window], base[window:]
    worst_in_head = max(last.get(n, -1) for n in base_head)
    best_in_tail = min(last.get(n, -1) for n in base_tail)
    assert worst_in_head <= best_in_tail, (
        f"self-ordering broken: the no-reserve head holds entries "
        f"last-green in round {worst_in_head} while round-{best_in_tail} "
        f"entries sit outside the {window}-entry window"
    )
    promoted = set(head) - set(base_head)
    demoted = set(base_head) - set(head)
    assert len(promoted) <= entry._CHANGE_RESERVE, (
        f"{len(promoted)} entries promoted into the head exceeds the "
        f"{entry._CHANGE_RESERVE}-slot change reserve: {sorted(promoted)}"
    )
    not_bumped = [
        n for n in promoted if not entry._change_bumped(n, last.get(n, -1))
    ]
    assert not not_bumped, (
        f"non-change-bumped entries took reserve slots: {not_bumped}"
    )
    displaced_bumped = [
        n for n in demoted if entry._change_bumped(n, last.get(n, -1))
    ]
    assert not displaced_bumped, (
        f"change-bumped entries were displaced FROM the head: "
        f"{displaced_bumped}"
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


def test_change_reserve_preempts_across_cohorts(monkeypatch):
    """Verdict r14 #1: a changed-module entry from a FRESHER cohort must
    preempt unchanged stale peers into the window, up to _CHANGE_RESERVE
    slots — within-cohort bumping alone left the r14 betweenness rewrite
    outside the window with old-impl driver evidence."""
    import __spark_entry__ as entry

    stale = [f"dedup_s{i:02d}" for i in range(12)]  # llm/dedup.py: unchanged
    fresh = ["alg_pagerank_a", "alg_pagerank_b", "alg_pagerank_c"]
    last = {n: 12 for n in stale}
    last.update({n: 14 for n in fresh})  # fresher cohort, module changed
    monkeypatch.setattr(entry, "_last_green_rounds", lambda: dict(last))
    monkeypatch.setattr(entry, "_window_size", lambda: 10)
    monkeypatch.setattr(
        entry, "_changed_since_round",
        lambda r: frozenset({"grafeo_spark/algorithms/centrality.py"}),
    )
    order = entry.battery_order(stale + fresh)
    head = order[:10]
    # all three bumped fresh entries enter the window…
    assert all(n in head for n in fresh), head
    # …by displacing exactly three unchanged entries from the FRESH end
    # of the base head (never-checked/stalest keep their slots)
    assert head == stale[:7] + fresh
    # displaced entries lead the tail: stalest next round, back first
    assert order[10:] == stale[7:]


def test_change_reserve_newest_change_first(monkeypatch):
    """When reserve slots are scarcer than bumped candidates, the module
    changed most recently wins the slot."""
    import __spark_entry__ as entry

    stale = [f"multimodal_s{i:02d}" for i in range(10)]
    last = {n: 12 for n in stale}
    last.update({"alg_pagerank_new": 13, "dedup_old": 13, "events_fresh": 14})
    monkeypatch.setattr(entry, "_last_green_rounds", lambda: dict(last))
    monkeypatch.setattr(entry, "_window_size", lambda: 10)
    monkeypatch.setattr(entry, "_CHANGE_RESERVE", 1)

    def changed(r):
        # centrality changed after round 14's marker; dedup only between
        # rounds 13 and 14 (i.e. last round, not this one)
        if r >= 14:
            return frozenset({"grafeo_spark/algorithms/centrality.py"})
        return frozenset({
            "grafeo_spark/algorithms/centrality.py",
            "grafeo_spark/llm/dedup.py",
        })

    monkeypatch.setattr(entry, "_changed_since_round", changed)
    order = entry.battery_order(list(last))
    head = order[:10]
    assert "alg_pagerank_new" in head  # recency 14 beats recency 13
    assert "dedup_old" not in head


def test_change_bump_degrades_gracefully(monkeypatch):
    """No git / no marker => pure staleness ordering, never an exception."""
    import __spark_entry__ as entry

    monkeypatch.setattr(entry, "_changed_since_round", lambda r: frozenset())
    names = list(entry.queries())
    order = entry.battery_order(names)
    assert sorted(order) == sorted(names)
