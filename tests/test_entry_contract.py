"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns  # stable, non-empty schema


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must be a declared query
    assert set(oracles) <= set(qs)
    # every query is either oracle-checked or deliberately rows-only
    from holochatstats_spark.queries import load_all_queries

    registry = load_all_queries()
    rows_only = {n for n, q in registry.items() if q.oracle is None}
    assert set(qs) == set(oracles) | rows_only


def test_registry_metadata():
    from holochatstats_spark.queries import load_all_queries

    for name, q in load_all_queries().items():
        assert q.survey, f"{name} missing SURVEY §2 operator reference"


def test_gate_order_is_least_recently_recorded():
    """The driver records the first ~50 queries() entries per round, so the
    registry must be ordered least-recently-driver-recorded first: every
    query's last-recorded round (from CORRECTNESS_r*.json) must be
    non-decreasing across the returned ordering, after the pinned
    semantics-changed prefix."""
    from holochatstats_spark.queries import (
        _SEMANTICS_CHANGED,
        _last_recorded_round,
        load_all_queries,
    )

    names = list(load_all_queries())
    last = _last_recorded_round()
    if not last:  # fresh checkout without artifacts: registration order is fine
        return
    # a pin holds only until a driver row from the change round (or later)
    # lands — mirror gate_order's expiry predicate, else this test goes
    # stale the moment a CORRECTNESS artifact satisfies a pin (VERDICT r9)
    pinned = [
        n
        for n, changed_rnd in _SEMANTICS_CHANGED.items()
        if n in names and last.get(n, 0) < changed_rnd
    ]
    assert names[: len(pinned)] == pinned
    rounds = [last.get(n, 0) for n in names[len(pinned) :]]
    assert rounds == sorted(rounds), "registry not sorted by staleness"
