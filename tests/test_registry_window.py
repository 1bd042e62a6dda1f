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
    """VERDICT r4 #1: the first 50 slots must be exactly the 50
    queries whose most recent green driver row is oldest (never-
    verified counting as round 0) — no hand list, no dict-order
    tail; the rotation refreshes the oldest rows every round."""
    registered = list(entry.queries())
    last = entry._last_green_round()
    rounds = [last.get(n, 0) for n in registered]
    # The staleness key must be non-decreasing over the whole order.
    assert rounds == sorted(rounds), (
        "queries() ordering is not staleness-sorted"
    )
    # And nothing outside the window is staler than anything inside.
    if len(registered) > DRIVER_WINDOW:
        max_in = max(rounds[:DRIVER_WINDOW])
        min_out = min(rounds[DRIVER_WINDOW:])
        assert max_in <= min_out


def test_window_not_overfull():
    """More never-verified queries than driver slots means some can
    never be confirmed — split the additions across rounds instead."""
    never = [
        n for n in entry.queries() if n not in entry._driver_verified()
    ]
    assert len(never) <= DRIVER_WINDOW


def test_every_registered_query_has_an_oracle():
    oracles = set(entry.oracle_sql())
    missing = [n for n in entry.queries() if n not in oracles]
    assert not missing, (
        f"registered without oracle_sql (driver would record err): "
        f"{missing}"
    )


def test_ordering_is_stable_and_complete():
    a, b = list(entry.queries()), list(entry.queries())
    assert a == b
    assert set(a) == set(entry._all_queries())
