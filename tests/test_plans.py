"""Plan-shape regression tests: the physical properties that make these
queries scale must survive refactors — results staying correct is not
enough (VERDICT r1 graded exactly these properties by hand)."""

from __future__ import annotations

import pytest

from holochatstats_spark.plans.audit import plan_summary, unbounded_single_partition
from holochatstats_spark.queries import load_all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all_queries()


def test_a1_aggregate_is_fully_distributed(spark, registry):
    df = registry["a1_user_data"].build(spark, SF)
    s = plan_summary(df)
    assert unbounded_single_partition(df) == 0
    assert s["python_stages"] == 0  # classification is native regex


def test_fact_dim_joins_broadcast(spark, registry):
    for name in ("shipping_priority", "chat_leaderboard", "recommend_topk"):
        s = plan_summary(registry[name].build(spark, SF))
        assert s["broadcasts"] >= 1, f"{name} lost its broadcast join"


def test_percentiles_have_no_global_sort_funnel(spark, registry):
    # the r1 regression this guards: a global unpartitioned row_number
    # forced the whole table into one partition
    df = registry["price_percentiles"].build(spark, SF)
    assert unbounded_single_partition(df) == 0


def test_multimodal_is_the_only_python_query_path(spark, registry):
    mm = plan_summary(registry["multimodal_features"].build(spark, SF))
    assert mm["python_stages"] >= 1  # mapInPandas, by design
    for name in ("doc_token_stats", "minhash_lsh_pairs", "message_classification"):
        s = plan_summary(registry[name].build(spark, SF))
        assert s["python_stages"] == 0, f"{name} gained a Python stage"


def test_lsh_uses_arrow_batched_udf(spark, registry):
    # the signature matmul is deliberately a pandas_udf (ArrowEval), never
    # a row-at-a-time Python UDF (BatchEvalPython)
    from holochatstats_spark.plans.audit import executed_plan

    plan = executed_plan(registry["embedding_neardup_lsh"].build(spark, SF))
    assert "BatchEvalPython" not in plan
