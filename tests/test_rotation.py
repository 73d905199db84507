"""Guard for the driver correctness-window rotation policy.

The driver records oracle rows for only the first ~50 entries of
``__spark_entry__.queries()``, so the ordering of ``_PRIORITY`` IS the
coverage policy.  Round 8 proved that a comment is not a rotation: the
head never moved and 12 entries went two rounds with zero driver
evidence (VERDICT r8, finding #1).  This test recomputes the policy
from the CORRECTNESS_r*.json history and fails if the head drifts.

Policy (pure staleness): an entry's staleness is the last round it had
a driver-green row (rows_match and no err); never-checked entries are
infinitely stale.  Invariant: no entry OUTSIDE the window may be
strictly staler than any entry INSIDE it.  New battery entries are
never-checked, so they are forced into the head automatically.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # the driver's observed oracle prefix (CORRECTNESS_r08: 50 rows)


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


def test_priority_window_is_staleness_ordered():
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert len(names) == len(set(names))
    last = _last_green()
    # never-checked -> -1 (stalest possible)
    head = names[:WINDOW]
    tail = names[WINDOW:]
    if not tail:
        return
    worst_in_head = max(last.get(n, -1) for n in head)
    best_in_tail = min(last.get(n, -1) for n in tail)
    offenders_in = [n for n in head if last.get(n, -1) > best_in_tail]
    offenders_out = [n for n in tail if last.get(n, -1) < worst_in_head]
    assert worst_in_head <= best_in_tail, (
        f"rotation violated: window head contains fresher entries "
        f"({offenders_in[:5]}, last-green {worst_in_head}) while staler "
        f"entries sit outside it ({offenders_out[:5]}, last-green "
        f"{best_in_tail}). Reorder _PRIORITY in __spark_entry__.py."
    )


def test_never_checked_entries_lead_window():
    import __spark_entry__ as entry

    names = list(entry.queries())
    last = _last_green()
    never = [n for n in names if n not in last]
    outside = [n for n in never if n not in names[:WINDOW]]
    assert not outside, (
        f"{len(outside)} battery entries have never had a driver oracle "
        f"row yet sit outside the {WINDOW}-entry window: {outside}"
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
        f"queries() entries missing from _PRIORITY (their window position "
        f"is accidental): {sorted(unlisted)}"
    )
