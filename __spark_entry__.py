"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on /root/testdata/sf0.001 (smoke).
- ``queries()``: every implemented query from SURVEY.md §2 plus the
  training-data-pipeline surface (69 entries — see COVERAGE.md for the
  §2-id → query map), keyed by name.
- ``oracle_sql()``: matching ANSI SQL for the DuckDB oracle (same column
  names/types; floats rounded identically on both sides). Rows-only
  queries (ml_forecast, channel_clustering, daily_event_rollup_approx)
  are intentionally absent here — nondeterministic or sketch-based.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable when the driver runs this file from anywhere.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from holochatstats_spark.queries import load_all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the pricing-summary scan→filter→groupBy (A2/A10)."""
    registry = load_all_queries()
    return registry["pricing_summary"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in load_all_queries().items()
        if q.oracle is not None
    }
