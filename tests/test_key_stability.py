"""Registered-query key stability.

The driver's correctness gate samples from ``queries()`` by KEY and
accumulates coverage across rounds — dropping or renaming a key
silently discards its cumulative correctness history.  This pins the
round-12 key set (376 keys, ``r12_query_keys.txt``, a superset of
the 360 round-11 and 273 round-10 keys) as a FLOOR: new keys may
append, existing keys must never disappear.  Every key must also keep either a DuckDB
oracle or an explicit place on the rows-only-checked list.
"""

from __future__ import annotations

import os

import __spark_entry__ as entry_mod

_HERE = os.path.dirname(os.path.abspath(__file__))


def _frozen(fname: str) -> set[str]:
    return {
        ln.strip()
        for ln in open(os.path.join(_HERE, fname))
        if ln.strip()
    }


def test_registered_keys_are_a_superset_of_round12():
    frozen = _frozen("r12_query_keys.txt")
    assert len(frozen) == 376
    # the pin lineage must be monotone
    assert _frozen("r11_query_keys.txt") <= frozen
    assert _frozen("r10_query_keys.txt") <= frozen
    current = set(entry_mod.queries())
    missing = frozen - current
    assert not missing, (
        f"queries() dropped {len(missing)} round-12 keys — the driver "
        f"loses their correctness history: {sorted(missing)[:10]}"
    )


def test_every_query_key_has_an_oracle():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    missing = qs - oracles
    assert not missing, (
        "queries without a DuckDB oracle (driver falls back to the "
        f"weaker rows-only check): {sorted(missing)}"
    )
    stray = oracles - qs
    assert not stray, f"oracles without a query: {sorted(stray)}"
