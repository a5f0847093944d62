"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query (default: all bench-tagged): capture
.explain("formatted") to plans/<round>/<query>_<tag>.txt, then time the
computation with the noop sink (guide §1.4) min-of-N, labelled via
setJobDescription. Prints one JSON line with the noop timings so
sink/collect overhead is visible separately from bench.py's collect()
timings.

Usage: python tools/profile_bench.py <tag> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     PROFILE_RUNS (default 3), PLANS_DIR (default plans/r21).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from holochatstats_spark.queries import load_all_queries
from holochatstats_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("PROFILE_RUNS", "3"))
    plans_dir = os.environ.get("PLANS_DIR", "plans/r21")
    os.makedirs(plans_dir, exist_ok=True)

    registry = load_all_queries()
    unknown = only - set(registry)
    if unknown:
        sys.exit(
            f"unknown query name(s): {sorted(unknown)}; "
            f"known: {sorted(registry)}"
        )
    names = sorted(
        n
        for n, q in registry.items()
        if (n in only if only else "bench" in q.tags)
    )
    if not names:
        sys.exit("no queries selected (registry has no bench-tagged queries)")

    spark = get_spark("holochatstats-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: codegen + page cache
    registry[names[0]].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in names:
        df = registry[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        best = float("inf")
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            run_df = df if i == 0 else registry[name].build(spark, sf_dir)
            run_df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        # post-execution plan: AQE final stages incl. ReusedExchange nodes
        final = df._jdf.queryExecution().executedPlan().toString()
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
            f.write("\n\n== Executed Plan (post-AQE) ==\n")
            f.write(final)

    print(
        json.dumps(
            {
                "tag": tag,
                "sink": "noop",
                "timing": f"min_of_{n_runs}",
                "total": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
