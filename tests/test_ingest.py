"""A1 ingest-aggregate semantics, mirroring the reference's only unit-test
file (data_ingestion/workers/test_chat_downloader.py:38-357): counter
correctness, member events advancing last_message_at without counting,
new-member badge ranks, gift rank -2 never overriding a known rank, and
the gift-only flag — plus the NULL-rank guard from ADVICE r1.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from holochatstats_spark.operators.gold import membership_summary
from holochatstats_spark.operators.ingest import build_user_data

SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.StringType()),
        T.StructField("video_id", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("membership_rank", T.IntegerType()),
        T.StructField("message_category", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("message_type", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 3, 5, 12, minute, 0)


def _msg(
    user="u1",
    minute=0,
    rank=-1,
    cat=None,
    message="hello there",
    mtype="chat",
    seq=0,
    video="v1",
):
    return ("ch1", video, user, f"name-{user}", _t(minute), rank, cat, message, mtype, seq)


def _build(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = build_user_data(df)
    return {(r["user_id"], r["video_id"]): r.asDict() for r in out.collect()}


def test_category_counters_and_number_total(spark):
    # number counts toward total only (chat_downloader.py:166-172); the
    # pre-filled category is respected; blanks classify to NULL → uncounted
    rows = [
        _msg(minute=0, cat="jp", message="こんにちは", seq=0),
        _msg(minute=1, cat="jp", message="ｗｗｗ", seq=1),
        _msg(minute=2, cat="emoji", message="😀", seq=2),
        _msg(minute=3, cat="es_en_id", message="hi", seq=3),
        _msg(minute=4, cat="number", message="42", seq=4),
        _msg(minute=5, cat=None, message="", seq=5),  # blank → NULL → uncounted
    ]
    r = _build(spark, rows)[("u1", "v1")]
    assert r["jp_count"] == 2
    assert r["emoji_count"] == 1
    assert r["es_en_id_count"] == 1
    assert r["kr_count"] == 0 and r["ru_count"] == 0
    assert r["total_message_count"] == 5  # number counted, blank not
    assert r["last_message_at"] == _t(5)


def test_classify_fills_missing_category(spark):
    # live-parse path: category NULL → F1 classification fills it
    rows = [
        _msg(minute=0, cat=None, message="안녕하세요", seq=0),
        _msg(minute=1, cat=None, message="Привет", seq=1),
    ]
    r = _build(spark, rows)[("u1", "v1")]
    assert r["kr_count"] == 1 and r["ru_count"] == 1
    assert r["total_message_count"] == 2


def test_member_events_advance_ts_but_do_not_count(spark):
    rows = [
        _msg(minute=0, cat="es_en_id", rank=-1, seq=0),
        _msg(minute=9, rank=0, message="", mtype="new_member", seq=1),
    ]
    r = _build(spark, rows)[("u1", "v1")]
    assert r["total_message_count"] == 1
    assert r["last_message_at"] == _t(9)  # advanced by the member event
    assert r["membership_rank"] == 0  # new-member badge rank


def test_gift_rank_never_overrides_known_rank(spark):
    # chat with known rank 5, then a later badge-less gift (-2): the gift
    # must not override (chat_downloader.py:70-86,158-163)
    rows = [
        _msg(minute=0, cat="es_en_id", rank=5, seq=0),
        _msg(minute=9, rank=-2, message="", mtype="gift_member", seq=1),
    ]
    r = _build(spark, rows)[("u1", "v1")]
    assert r["membership_rank"] == 5
    assert r["is_gift"] is False  # has a known rank


def test_gift_only_user_is_gift_rank_minus2(spark):
    rows = [_msg(minute=0, rank=-2, message="", mtype="gift_member", seq=0)]
    r = _build(spark, rows)[("u1", "v1")]
    assert r["membership_rank"] == -2
    assert r["is_gift"] is True
    assert r["total_message_count"] == 0


def test_null_rank_chat_does_not_shadow_known_rank(spark):
    # ADVICE r1: a NULL-rank chat row is not rank-bearing; the earlier
    # known rank must survive (not collapse to -2)
    rows = [
        _msg(minute=0, cat="es_en_id", rank=3, seq=0),
        _msg(minute=9, cat="es_en_id", rank=None, seq=1),
    ]
    r = _build(spark, rows)[("u1", "v1")]
    assert r["membership_rank"] == 3


def test_latest_known_rank_wins_by_event_time(spark):
    rows = [
        _msg(minute=0, cat="es_en_id", rank=1, seq=0),
        _msg(minute=5, cat="es_en_id", rank=2, seq=1),
    ]
    r = _build(spark, rows)[("u1", "v1")]
    assert r["membership_rank"] == 2


def test_observed_month_is_videos_last_message_month(spark):
    # u2's activity ends in April; u1 stopped in March — both rows get the
    # VIDEO's last-message month (April), chat_downloader.py:141-145
    rows = [
        _msg(user="u1", minute=0, cat="es_en_id", seq=0),
        ("ch1", "v1", "u2", "name-u2", dt.datetime(2024, 4, 2, 1, 0, 0), -1,
         "es_en_id", "late", "chat", 1),
    ]
    out = _build(spark, rows)
    assert out[("u1", "v1")]["observed_month"] == dt.date(2024, 4, 1)
    assert out[("u2", "v1")]["observed_month"] == dt.date(2024, 4, 1)


def test_membership_summary_rank_class_priority(spark):
    # known rank (>=0) beats gift-unknown (-2) beats non-member (-1) even
    # when the lower-class row is newer (queries.py:138-147)
    rows = [
        _msg(minute=0, cat="es_en_id", rank=6, seq=0, video="v1"),
        _msg(minute=9, rank=-2, message="", mtype="gift_member", seq=1, video="v2"),
    ]
    ud = build_user_data(spark.createDataFrame(rows, SCHEMA))
    channels = spark.createDataFrame(
        [("ch1", "Chan One", "groupA")],
        "channel_id string, channel_name string, channel_group string",
    )
    res = membership_summary(ud, channels).collect()
    assert len(res) == 1
    assert res[0]["membership_rank"] == 6
    assert res[0]["membership_count"] == 1
    assert res[0]["percentage_total"] == pytest.approx(100.0)
