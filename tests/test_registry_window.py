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
    assert registered[: len(never)] == never


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
