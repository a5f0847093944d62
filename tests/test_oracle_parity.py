"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This is the same comparison the driver runs at sf0.01 (tools/check_oracle.py
runs that scale); the smoke scale keeps the suite fast.
"""

from __future__ import annotations

import pytest

from holochatstats_spark.queries import load_all_queries
from tests.conftest import SF_SMOKE

REGISTRY = load_all_queries()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    from holochatstats_spark.testing import compare_query

    q = REGISTRY[name]
    problems = compare_query(spark, duck, q, SF_SMOKE)
    assert not problems, f"{name}: " + "; ".join(problems)
