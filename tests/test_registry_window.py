"""Pins the driver-window rotation invariant (VERDICT r3 #1).

The driver verifies only the FIRST 50 ``queries()`` entries per round.
Round 3 lost its whole budget to a stale hand-maintained ordering;
these tests make that class of regression impossible: every registered
query that has never had a green driver row MUST sit inside the
window, and every registered query MUST have an oracle (so no driver
slot can ever record ``err: no_oracle`` again).
"""

from __future__ import annotations

import importlib.util
import os

DRIVER_WINDOW = 50

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "entry_window", os.path.join(_here, "__spark_entry__.py")
)
entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry)


def test_never_verified_queries_lead_the_window():
    registered = list(entry.queries())
    never = [
        n for n in registered if n not in entry._driver_verified()
    ]
    window = set(registered[:DRIVER_WINDOW])
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"{len(missing)} never-driver-verified queries outside the "
        f"first-{DRIVER_WINDOW} window: {missing} — the driver would "
        "burn its budget re-verifying green rows"
    )
    # and they lead it: the first len(never) slots are exactly them
    assert set(registered[: len(never)]) == set(never)


def test_window_is_the_stalest_queries():
    """VERDICT r4 #1 + review r5: never-verified lead, this round's
    behavior-changed queries all sit inside the window, and the rest
    of the order is staleness-sorted — the rotation refreshes the
    oldest rows every round with no dict-order tail."""
    registered = list(entry.queries())
    last = entry._last_green_round()
    changed = {
        n for n in entry._CHANGED_THIS_ROUND if n in set(registered)
    }
    window = set(registered[:DRIVER_WINDOW])
    missing = [n for n in changed if n not in window]
    assert not missing, (
        f"behavior-changed queries outside the window: {missing}"
    )
    rest = [n for n in registered if n not in changed]
    rounds = [last.get(n, 0) for n in rest]
    # Excluding the changed block, staleness is non-decreasing.
    assert rounds == sorted(rounds), (
        "queries() tail ordering is not staleness-sorted"
    )
    # And among the rest, nothing outside the window is staler than
    # anything inside.
    in_rest = [last.get(n, 0) for n in rest if n in window]
    out_rest = [last.get(n, 0) for n in rest if n not in window]
    if in_rest and out_rest:
        assert max(in_rest) <= min(out_rest)


def test_changed_list_cannot_starve_the_staleness_tail():
    """The changed-this-round boost is an accelerator, not a hand-
    rotation: cap it so the staleness tail keeps most of the window
    (the r3 failure mode was a hand list owning ALL the slots)."""
    assert len(entry._CHANGED_THIS_ROUND) <= 20
    # every entry must name a registered query (a typo'd entry would
    # silently verify nothing)
    registered = set(entry._all_queries())
    bogus = [n for n in entry._CHANGED_THIS_ROUND if n not in registered]
    assert not bogus, bogus


def test_window_not_overfull():
    """More never-verified queries than driver slots means some can
    never be confirmed — split the additions across rounds instead."""
    never = [
        n for n in entry.queries() if n not in entry._driver_verified()
    ]
    assert len(never) <= DRIVER_WINDOW


def test_every_registered_query_has_an_oracle():
    """Full-oracle coverage except the EXPLICIT rows-only set (the
    driver records a weaker rows-only check for those; each entry in
    entry._ROWS_ONLY documents why no SQL twin can exist). A missing
    oracle outside that set is an error, not a silent downgrade."""
    oracles = set(entry.oracle_sql())
    missing = {n for n in entry.queries() if n not in oracles}
    assert missing == set(entry._ROWS_ONLY), (
        f"oracle coverage drifted: undeclared rows-only "
        f"{missing - set(entry._ROWS_ONLY)}; declared-but-covered "
        f"{set(entry._ROWS_ONLY) - missing}"
    )


def test_ordering_is_stable_and_complete():
    a, b = list(entry.queries()), list(entry.queries())
    assert a == b
    assert set(a) == set(entry._all_queries())
