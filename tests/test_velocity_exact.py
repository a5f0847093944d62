"""Pins every parameter branch of velocity_bursts_exact against the
reference semantics (ai_summarizer.py:93-146,163) — the synthetic chat is
too uniform to trip the >9 threshold, so the branches are proven here on
dense hand-built bursts instead.

Frame construction note: videos are anchored so that
start = min(ts) - 30 (the shared +30 s duration pad), and bursts are
placed at known elapsed offsets from that start.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from holochatstats_spark.queries.chat_pipeline import velocity_bursts_from

BASE = int(datetime(2024, 3, 1, tzinfo=timezone.utc).timestamp())


def _msgs(spark, rows):
    """rows: (channel_id, video_id, epoch_sec)."""
    df = spark.createDataFrame(
        [(c, v, e) for c, v, e in rows], "channel_id string, video_id string, e long"
    )
    from pyspark.sql import functions as F

    return df.select(
        "channel_id", "video_id", F.timestamp_seconds("e").alias("ts")
    )


def _channels(spark, *cids):
    return spark.createDataFrame(
        [(c, f"ch {c}") for c in cids], "channel_id string, channel_name string"
    )


def _video(cid, vid, dur_sec, bursts, base=BASE):
    """One video: first/last message pin duration = dur_sec (incl. the
    +30 pad → start = base, first msg at base+30, last at base+dur_sec).
    bursts: list of (elapsed_sec_from_start, n_messages)."""
    rows = [(cid, vid, base + 30), (cid, vid, base + dur_sec)]
    for elapsed, n in bursts:
        rows += [(cid, vid, base + elapsed)] * n
    return rows


def _run(spark, rows, cids):
    out = velocity_bursts_from(_msgs(spark, rows), _channels(spark, *cids))
    return [tuple(r) for r in out.collect()]


def test_short_video_skipped(spark):
    # 9-minute video (< 600 s): a huge burst still yields nothing
    rows = _video("c", "v", 540, [(270, 50)])
    assert _run(spark, rows, "c") == []


def test_threshold_is_strictly_greater_than_9(spark):
    # 20-min video: burst of exactly 10 messages in one 15 s bucket
    # passes (>9); a 9-message burst in a different video does not.
    rows = _video("c", "v10", 1200, [(300, 10)]) + _video(
        "c", "v9", 1200, [(300, 9)]
    )
    got = _run(spark, rows, "c")
    assert [g[1] for g in got] == ["v10"]
    # bucket = 300 div 15 = 20 → spike_seconds 300, epoch = start+300-10
    assert got[0][2] == BASE + 290 and got[0][3] == 300 and got[0][4] == 10


def test_num_highlights_floor_of_one_for_10_to_30_min(spark):
    # 20-min video (floor(20/30) = 0 → floored to 1): two qualifying
    # bursts, only the biggest survives
    rows = _video("c", "v", 1200, [(300, 12), (600, 11)])
    got = _run(spark, rows, "c")
    assert len(got) == 1 and got[0][3] == 300 and got[0][4] == 12


def test_num_highlights_cap_of_five(spark):
    # 6-hour video (floor(360/30) = 12 → capped at 5): seven qualifying
    # bursts, exactly the top five survive
    bursts = [(2000 + 100 * i, 20 - i) for i in range(7)]  # 20..14 msgs
    rows = _video("c", "v", 21600, bursts)
    got = _run(spark, rows, "c")
    assert len(got) == 5
    assert sorted(g[4] for g in got) == [16, 17, 18, 19, 20]


def test_safe_zone_excludes_intro_and_outro(spark):
    # 1000-s video: bursts at elapsed 30 (< 5% = 50) and 970 (> 95% = 950)
    # are outside the safe zone; an identical mid-video burst counts
    rows = _video("c", "v", 1000, [(30, 15), (970, 15), (500, 15)])
    got = _run(spark, rows, "c")
    assert len(got) == 1 and got[0][3] == 495  # bucket 33 → 495 s
    # the safe-zone message count: 15 (burst only; anchor msgs excluded)
    assert got[0][4] == 15


def test_tie_break_prefers_earlier_bucket(spark):
    # 3-hour video allows 5 highlights; two equal bursts → both returned,
    # ordered by epoch; equal-count ties rank earlier bucket first, so
    # with num_highlights=1 (20-min video) the earlier one wins
    rows = _video("c", "v", 1200, [(600, 12), (300, 12)])
    got = _run(spark, rows, "c")
    assert len(got) == 1 and got[0][3] == 300


def test_lead_up_subtracts_ten_seconds(spark):
    rows = _video("c", "v", 1800, [(900, 25)])
    got = _run(spark, rows, "c")
    assert got[0][2] == BASE + 900 - 10
