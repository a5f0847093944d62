"""Physical-plan audit helpers — the scale-readiness checks the round
reviews apply by hand, as code: count exchanges, flag unbounded
single-partition shuffles, verify broadcasts and codegen coverage.

`plan_summary` powers tests/test_plans.py, which pins the plan shape of
the load-bearing queries (e.g. "the A1 aggregate has no single-partition
exchange", "the fact↔dim joins broadcast"). A regression that silently
degrades a plan — a lost broadcast, a global sort sneaking in — fails the
suite even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict[str, int]:
    plan = executed_plan(df)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        # single-partition exchanges that feed a FINAL scalar aggregate are
        # benign (one row per partition moves); anything else is a global
        # sort/limit funnel and a 100 TB red flag
        "single_partition": len(re.findall(r"Exchange SinglePartition", plan)),
        "scalar_agg_single_partition": len(
            re.findall(
                r"HashAggregate\(keys=\[\][^\n]*\n[^\n]*Exchange SinglePartition",
                plan,
            )
        ),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "python_stages": len(re.findall(r"Python|ArrowEval|MapInPandas", plan)),
        "codegen_spans": len(re.findall(r"WholeStageCodegen", plan)),
        "sorts": len(re.findall(r"\bSort \[", plan)),
    }


def unbounded_single_partition(df: DataFrame) -> int:
    """Single-partition exchanges NOT explained by a final scalar agg."""
    s = plan_summary(df)
    return max(0, s["single_partition"] - s["scalar_agg_single_partition"])
