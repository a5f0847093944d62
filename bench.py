"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "verdicts": {name: pass|fail|no_target}}.

Self-judging (VERDICT r5-r8: six rounds of ±30% single-shot noise made a
real 20-30% plan regression indistinguishable from session jitter):
- each query is timed min-of-N (default 3, $SPARK_GRAFT_BENCH_RUNS) after
  a warmup query, so one GC pause or cold page cache can't fake a
  regression;
- every timing is compared against BASELINE.json's per_query_target_sec
  (best observed across recorded rounds) x target_margin; a miss is a
  "fail" verdict and a nonzero "n_regressions" — a loud signal instead of
  a number someone has to eyeball against eight old artifacts.
Targets only apply at the baseline's scale factor; other SFs get
"no_target" verdicts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from holochatstats_spark.queries import load_all_queries
from holochatstats_spark.session import get_spark


def _load_targets(sf: float | str) -> tuple[dict[str, float], float]:
    """(per-query target seconds, margin) from BASELINE.json — empty when
    absent or when benching a different scale factor than the baseline."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
    try:
        with open(path) as f:
            base = json.load(f)
    except (OSError, ValueError):
        return {}, 1.0
    if base.get("bench_sf") != sf:
        return {}, 1.0
    block = base.get("per_query_target_sec") or {}
    return dict(block.get("queries") or {}), float(block.get("target_margin", 1.5))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_str = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_str) if sf_str.replace(".", "").isdigit() else sf_str
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    registry = load_all_queries()
    names = sorted(n for n, q in registry.items() if "bench" in q.tags)
    targets, margin = _load_targets(sf)

    spark = get_spark("holochatstats-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch every table + exercise codegen once
    registry[names[0]].build(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            registry[name].build(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    verdicts = {
        name: (
            "no_target"
            if name not in targets
            else ("pass" if t <= targets[name] * margin else "fail")
        )
        for name, t in timings.items()
    }
    regressions = sorted(n for n, v in verdicts.items() if v == "fail")

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "timing": f"min_of_{n_runs}",
                "verdicts": verdicts,
                "n_regressions": len(regressions),
                "regressions": regressions,
            }
        )
    )


if __name__ == "__main__":
    main()
