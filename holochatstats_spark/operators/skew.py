"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting (enabled in session.py) handles skewed JOINS at
runtime, but a skewed AGGREGATION key — one channel carrying 30% of all
messages, the classic hot-VTuber case — still funnels one key's rows into
one reducer. The standard fix is salting: aggregate on (key, salt) first
(splitting the hot key across SALT_BUCKETS reducers, with map-side partial
aggregation doing most of the work), then re-aggregate on the key alone
(tiny input: SALT_BUCKETS rows per key).

Works for any aggregate that decomposes associatively (sum/count/min/max
and anything built from them). Non-decomposable aggs (exact countDistinct)
need the distinct-first pattern instead: dedup (key, value) — itself
saltable — then count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = SALT_BUCKETS,
) -> DataFrame:
    """Two-stage aggregation: ``aggs`` maps output column → (input column,
    fn) with fn in {sum, count, min, max}. Stage 1 groups by
    (*keys, salt); stage 2 merges partials per key (count merges by sum).
    """
    mergers = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (_, fn) in aggs.items():
        if fn not in mergers:
            raise ValueError(f"{out}: {fn!r} is not decomposable; see module doc")

    salt = (F.rand(seed=42) * n_salt).cast("int").alias("_salt")
    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[
            getattr(F, mergers[fn])(out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )
    return stage2
