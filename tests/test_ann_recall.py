"""Recall contract for the widened random-hyperplane LSH (VERDICT r2 item 3).

Widening to 64 planes / 16-bit bands cuts random bucket collisions 256×,
but band widening also lowers recall at a fixed cosine — so this test
plants TRUE near-duplicate pairs (cosine ≥ 0.99) among decoy vectors and
pins, deterministically (the planes are md5-derived constants):

1. candidate recall: ≥ 70% of planted near-dup pairs share a band;
2. superset contract: the LSH-verified pair set contains every pair the
   blocked exact baseline finds among LSH candidates — i.e. verification
   uses the same exact cosine, so LSH can only lose pairs to bucketing,
   never report a pair the exact metric rejects.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

DIM = 64
N_PLANTED = 20
COSINE_NEARDUP = 0.99


@pytest.fixture(scope="module")
def planted(spark):
    """(vectors df, planted near-dup id pairs). Base vectors + a tiny-angle
    copy for each planted pair; decoys are independent random directions."""
    rng = np.random.RandomState(7)
    rows = []
    pairs = []
    vid = 0
    for _ in range(N_PLANTED):
        v = rng.randn(DIM)
        v /= np.linalg.norm(v)
        # perturb within the near-dup cone: cos(angle) >= COSINE_NEARDUP
        noise = rng.randn(DIM) * 0.05
        w = v + noise
        w /= np.linalg.norm(w)
        if float(v @ w) < COSINE_NEARDUP:  # re-tighten if noise overshot
            w = v + noise * 0.3
            w /= np.linalg.norm(w)
        rows.append((vid, [float(x) for x in v]))
        rows.append((vid + 1, [float(x) for x in w]))
        pairs.append((vid, vid + 1))
        vid += 2
    for _ in range(60):  # decoys
        v = rng.randn(DIM)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, pairs


#: strictly below COSINE_NEARDUP so planted pairs sitting exactly on the
#: near-dup boundary still pass the production pipeline's strict `> t`
_VERIFY_T = 0.98


def _candidates(df):
    """Candidate universe (share ≥1 band) — the bucketing contract the
    production pipeline's pair generation must reproduce exactly."""
    from holochatstats_spark.operators.ann import lsh_buckets

    b = lsh_buckets(df, "vec_id", "embedding", DIM)
    a, c = b.alias("a"), b.alias("b")
    return {
        (r.va, r.vb)
        for r in a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        .distinct()
        .collect()
    }


def _production_pairs(df):
    """Run the REGISTERED pipeline (queries/neardup.py:lsh_neardup_pairs,
    the exact code behind embedding_neardup_lsh) over the planted frame —
    VERDICT r20 item 3: a regression in the production bucket-grouping or
    verify-join must fail here, not just in the inlined reference join."""
    from holochatstats_spark.queries.neardup import lsh_neardup_pairs

    return {
        (r.vec_a, r.vec_b)
        for r in lsh_neardup_pairs(df, DIM, _VERIFY_T).collect()
    }


def test_planted_neardup_recall(spark, planted):
    df, pairs = planted
    found = _production_pairs(df)
    hit = sum(1 for p in pairs if p in found)
    assert hit / len(pairs) >= 0.7, f"recall {hit}/{len(pairs)} below 0.7"


def test_production_pairs_equal_exact_cosine_over_candidates(spark, planted):
    """The production output must EQUAL the exact-cosine pair set over the
    candidate universe: the verify-join drops no true pair and invents no
    pair the exact metric rejects."""
    df, pairs = planted
    cand = _candidates(df)
    found = _production_pairs(df)
    emb = {r.vec_id: np.array(r.embedding) for r in df.collect()}

    def cos(a, b):
        va, vb = emb[a], emb[b]
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))

    exact_over = {p for p in cand if cos(*p) > _VERIFY_T}
    assert found == exact_over
    # and at least one planted pair survives end to end at these widths
    assert any(p in found for p in pairs)
