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
