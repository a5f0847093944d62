"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan build + execute + collect), after a
small warmup query so JVM/codegen startup isn't billed to the first entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from holochatstats_spark.queries import load_all_queries
from holochatstats_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all_queries()
    names = sorted(n for n, q in registry.items() if "bench" in q.tags)

    spark = get_spark("holochatstats-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch every table + exercise codegen once
    registry[names[0]].build(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        registry[name].build(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
