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


def test_native_query_paths_have_no_python_stage(spark, registry):
    # r22: multimodal feature extraction went fully native (guide §4.1) —
    # the mapInPandas stage only computed length/md5/modulo expressions,
    # so ANY Python node reappearing here is a regression
    for name in (
        "multimodal_features",
        "doc_token_stats",
        "minhash_lsh_pairs",
        "message_classification",
    ):
        s = plan_summary(registry[name].build(spark, SF))
        assert s["python_stages"] == 0, f"{name} gained a Python stage"


def test_lsh_uses_arrow_batched_udf(spark, registry):
    # the signature matmul is deliberately a pandas_udf (ArrowEval), never
    # a row-at-a-time Python UDF (BatchEvalPython)
    from holochatstats_spark.plans.audit import executed_plan

    plan = executed_plan(registry["embedding_neardup_lsh"].build(spark, SF))
    assert "BatchEvalPython" not in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # the 100 TB co-location story (SURVEY §7): two tables bucketed on the
    # join key join WITHOUT any exchange
    from holochatstats_spark.plans.audit import plan_summary
    from holochatstats_spark.sources.writers import write_bucketed_table

    left = spark.range(0, 1000).selectExpr("id AS user_id", "id % 7 AS a")
    right = spark.range(0, 1000).selectExpr("id AS user_id", "id % 3 AS b")
    write_bucketed_table(left, "bkt_left", str(tmp_path / "l"), ["user_id"], 8)
    write_bucketed_table(right, "bkt_right", str(tmp_path / "r"), ["user_id"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the planner must pick sort-merge — at 100 TB
        # neither side is broadcastable, which is the case bucketing serves
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "user_id")
        from holochatstats_spark.plans.audit import executed_plan

        plan = executed_plan(j)
        s = plan_summary(j)
        assert s["exchanges"] == 0 and s["broadcasts"] == 0, (
            "bucketed sort-merge join must not shuffle"
        )
        assert "Bucketed: true" in plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_lsh_signature_udf_evaluated_once_per_side(spark, registry):
    # r21 eliminated r20's 4x ArrowEvalPython (bands self-join + join-key
    # null filters pushed below the udf). r22's hot-bucket guard
    # (operators/pairs.py) is a self-join of ONE aggregated frame: the
    # STATIC plan prints the signature subtree under both join sides (2
    # ArrowEvalPython nodes), but AQE reuses the identical shuffle stage at
    # runtime so the udf executes once — tests/test_pairs.py pins the
    # runtime count with an accumulator. Here: never more than one node
    # per join side, and the sort-merge join (never broadcast — guide
    # §3.1: the chunked frame is unbroadcastable at scale, and a broadcast
    # build side defeats the stage reuse) must survive refactors.
    from holochatstats_spark.plans.audit import executed_plan

    for name in ("simhash_neardup_pairs", "embedding_neardup_lsh"):
        plan = executed_plan(registry[name].build(spark, SF))
        n = plan.count("ArrowEvalPython")
        assert n <= 2, f"{name}: expected <=2 ArrowEvalPython, found {n}"
        assert "SortMergeJoin" in plan, f"{name}: pair join must be SMJ"


def test_rewritten_queries_scan_input_once(spark, registry):
    # r21 single-lineage rewrites: the input table(s) must appear in the
    # plan a bounded number of times (r20 recomputed these lineages 3-6x:
    # tfidf_lang_similarity had 24 FileScan nodes, minhash 4, overlap 3).
    from holochatstats_spark.plans.audit import executed_plan

    max_scans = {
        # the r22 hot-bucket guard's self-join prints the lineage under
        # both sides in the STATIC plan; runtime stage reuse executes it
        # once (tests/test_pairs.py)
        "minhash_lsh_pairs": 2,
        "simhash_neardup_pairs": 2,
        "ngram_jaccard_pairs": 1,
        "doc_token_stats": 1,
        "type_cosine_similarity": 1,
        "overlap_matrix": 1,
        "tfidf_lang_similarity": 2,  # terms lineage + the n_docs scalar
        "recommend_topk": 3,
        "a1_user_data": 1,
        # r21 second pass: one conditional aggregate replaces the g/l
        # (resp. exclusives/totals) re-aggregation of the same lineage
        "membership_changes": 2,
        "exclusive_group_users": 3,
        # r22 one-partitioning rewrites: per-video stats ride the bucket
        # rows as (channel, video) window columns — the vids re-aggregate
        # + join-back (a 3rd scan of the msgs lineage) must not return
        "velocity_bursts_exact": 2,
        "funniest_timestamps": 2,
        "highlight_windows": 2,
        # r22: one collect_set membership pass replaces two events
        # lineages + a join
        "exclusive_users": 1,
    }
    for name, cap in max_scans.items():
        plan = executed_plan(registry[name].build(spark, SF))
        n = plan.count("FileScan")
        assert n <= cap, f"{name}: {n} FileScans (cap {cap})"


def test_salted_agg_matches_plain_agg(spark):
    # skew-salting equivalence: two-stage (key, salt) -> key aggregation
    # must produce exactly the plain groupBy result
    from pyspark.sql import functions as F

    from holochatstats_spark.operators.skew import salted_agg
    from holochatstats_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    plain = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.max("user_id").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: r
        for r in salted_agg(
            ev,
            ["event_type"],
            {"n": ("value", "count"), "total": ("value", "sum"), "mx": ("user_id", "max")},
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k]["n"] == plain[k]["n"]
        assert salted[k]["mx"] == plain[k]["mx"]
        assert abs(salted[k]["total"] - plain[k]["total"]) < 1e-6
