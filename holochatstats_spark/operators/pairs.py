"""Size-guarded all-pairs generation within LSH buckets (VERDICT r21 item 1).

Why: r21 collected every (bucket key) group into ONE ``collect_list`` row and
double-exploded it. That made the signature lineage single-pass (the fix for
r20's 2-4x UDF recompute), but a hot bucket — a giant near-duplicate cluster —
then materializes the entire bucket in a single aggregation buffer / a single
row (2 GB UnsafeRow array cap), and the O(m^2) explode runs inside ONE task
that nothing can split: AQE skew handling applies to join shuffles, not to
aggregations (guide §2.5), so at 100 TB one degenerate cluster is an
OOM/straggler with no runtime mitigation.

Shape of the guard: members are chunked by ``pmod(xxhash64(id), n_chunks)``
BEFORE the aggregation, so no buffer or row ever holds more than one chunk of
a bucket, and pairs come from ONE equi-self-join on the bucket key with the
non-equi ``chunk_a <= chunk_b`` predicate:

- the aggregation is keyed (bucket, chunk): a hot bucket's collect_list work
  spreads over up to ``n_chunks`` tasks and every member array is ~m/K;
- the join shuffle is keyed on the bucket alone, so AQE skew-join splitting
  can carve a hot bucket's partition into slices (guide §2.5 — it CAN split
  a single enormous key's partition for a sort-merge join); when the planner
  instead broadcasts the (small) chunked frame, the probe side keeps the
  aggregation's (bucket, chunk) partitioning and the pair work is spread
  across chunk rows without any shuffle at all. Either way per-task pair
  generation is bounded by ~m^2/n_chunks instead of m^2.

Single-lineage is preserved: both join sides are the SAME aggregated frame,
and the shuffle stage is reused at runtime — the signature UDF still executes
exactly once (tests/test_pairs.py pins this with an accumulator; the STATIC
plan prints the subtree under both join sides, which is why the plan tests
count runtime reuse, not textual FileScan occurrences).

Pair-set equivalence with the unchunked double-explode (what the DuckDB
oracle checks): for distinct members x, y of one bucket with chunks cx <= cy,
- cx == cy: only the (c, c) join row holds both; the explode enumerates both
  orientations and the id-ordered filter keeps exactly one;
- cx < cy: only the (cx, cy) join row exists (cy, cx is excluded by the
  chunk_a <= chunk_b predicate) and yields the pair exactly once — x on the
  a-side, y on the b-side — in whichever id order, normalized on output.
Every within-bucket pair therefore appears exactly once per bucket, ordered
(a.id < b.id); duplicates ACROSS buckets remain and are deduplicated
downstream exactly as before.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def default_bucket_chunks() -> int:
    """Chunks per bucket: per-task pair work is ~m^2/K for a hot bucket of
    m members. 32 bounds a worst-case cluster 32x at the cost of at most
    32 aggregation groups per bucket (tiny buckets occupy min(m, K) chunks,
    so the common case is unchanged). Cluster-side, raise via env to
    taste — the guard's correctness does not depend on the value."""
    return int(os.environ.get("SPARK_GRAFT_LSH_CHUNKS", "32"))


def bucket_pairs(
    bands: DataFrame,
    key_cols: list[str],
    member_col: str = "m",
    id_field: str = "doc_id",
    n_chunks: int | None = None,
) -> DataFrame:
    """All unordered within-bucket member pairs, hot-bucket-guarded.

    ``bands``: one row per (bucket key..., member struct). Returns one row
    per within-bucket pair with columns ``a``/``b`` (the member structs,
    ``a.<id_field> < b.<id_field>``); pairs occurring in several buckets
    appear once per bucket, as with the plain double-explode.
    """
    k = n_chunks or default_bucket_chunks()
    mid = F.col(f"{member_col}.{id_field}")
    chunked = (
        bands.withColumn("_chunk", F.pmod(F.xxhash64(mid), F.lit(k)).cast("int"))
        .groupBy(*key_cols, "_chunk")
        .agg(F.collect_list(member_col).alias("_ms"))
    )
    # Null-safe equality on the bucket keys, deliberately: a plain `=` makes
    # the inner join infer `isnotnull(key)` filters, and because the keys
    # derive from the signature UDF those filters push below the aggregation
    # and DUPLICATE the UDF evaluation per join side (guide §4.4 — the exact
    # r20 4x-ArrowEvalPython bug class). Bucket keys are never null by
    # construction (band indexes from posexplode, band values from bit ops /
    # concat_ws over non-null inputs), so `<=>` is result-identical to `=`.
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"_pa.{c}").eqNullSafe(F.col(f"_pb.{c}")) for c in key_cols]
        + [F.col("_pa._chunk") <= F.col("_pb._chunk")],
    )
    joined = (
        # Force a shuffle join (guide §3.1, deliberately): the chunked frame
        # has per-bucket cardinality, so broadcasting it is the r20
        # unbroadcastable-at-scale mistake — and a BroadcastHashJoin also
        # computes the lineage once per side (BroadcastExchange never reuses
        # the probe side's shuffle stage), re-running the signature UDF. A
        # sort-merge self-join gives two IDENTICAL shuffle subtrees that AQE
        # reuses at runtime (one lineage pass) and whose skewed partitions
        # AQE can split (guide §2.5).
        chunked.alias("_pa")
        .hint("shuffle_merge")
        .join(chunked.alias("_pb"), cond)
        .select(
            F.col("_pa._chunk").alias("_ca"),
            F.col("_pb._chunk").alias("_cb"),
            F.col("_pa._ms").alias("_msa"),
            F.col("_pb._ms").alias("_msb"),
        )
        # a same-chunk singleton can only pair with itself — drop before
        # exploding (the common case: most buckets have one member)
        .where((F.col("_ca") != F.col("_cb")) | (F.size("_msa") >= 2))
    )
    pairs = (
        joined.select("_ca", "_cb", "_msb", F.explode("_msa").alias("_x"))
        .select("_ca", "_cb", "_x", F.explode("_msb").alias("_y"))
    )
    xid, yid = F.col(f"_x.{id_field}"), F.col(f"_y.{id_field}")
    lt = xid < yid
    return pairs.where((F.col("_ca") < F.col("_cb")) | lt).select(
        F.when(lt, F.col("_x")).otherwise(F.col("_y")).alias("a"),
        F.when(lt, F.col("_y")).otherwise(F.col("_x")).alias("b"),
    )
