from holochatstats_spark.plans.audit import plan_summary  # noqa: F401
