"""Round-6 driver-window rotation pins (VERDICT r5 next-round #2).

The driver's CORRECTNESS artifact hashes only the first 50 queries()
entries. Round 6 rotates that window to 50 oracle-checked queries that
rounds 1-5 never gave a driver-grade check; this file pins the
rotation's invariants so a future edit can't silently un-rotate it or
push a rows-only query into a recorded slot.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as E

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ROWS_ONLY = {"extract_pipeline", "translate_pipeline", "knn_ivf"}


def _prior_driver_checked() -> set[str]:
    seen: set[str] = set()
    for n in range(1, 6):
        path = os.path.join(_HERE, f"CORRECTNESS_r0{n}.json")
        with open(path) as f:
            seen |= set(json.load(f))
    return seen


def test_front_window_is_50_never_driver_checked_oracle_queries():
    qs = list(E.queries())
    oracles = set(E.oracle_sql())
    front = qs[:50]
    assert front == E._R6_FRONT
    assert len(set(front)) == 50
    # every recorded slot gets a rows+schema+hash verdict
    assert set(front) <= oracles
    # the whole point: disjoint from every prior round's driver window
    assert not (set(front) & _prior_driver_checked())


def test_rotation_loses_no_queries_and_pins_rows_only_last():
    qs = list(E.queries())
    assert len(qs) == len(set(qs))
    assert set(qs) == set(E._registry())
    assert set(qs[-3:]) == _ROWS_ONLY
    # rows-only stay out of the recorded window entirely
    assert not (_ROWS_ONLY & set(qs[:50]))


def test_every_oracle_key_has_a_query():
    qs = set(E.queries())
    assert set(E.oracle_sql()) <= qs
