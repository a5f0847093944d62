"""Structured Streaming ingest: the windowed A1 counter aggregate over a
file-source stream must reproduce the batch counters when rolled up
(associative-counter contract, streaming/ingest_stream.py)."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from holochatstats_spark.streaming import stream_messages, stream_user_counters


def _write_log(path, video_id, records):
    with gzip.open(path / f"{video_id}.jsonl.gz", "wt", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")


def _rec(user, us_offset, message="hello", mtype="chat", cat="es_en_id"):
    return {
        "user_id": user,
        "username": f"name-{user}",
        "timestamp": 1_704_067_200_000_000 + us_offset,
        "membership_rank": -1,
        "message_category": cat,
        "message": message,
        "message_type": mtype,
        "gifter": None,
    }


def test_streaming_counters_match_batch_rollup(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    _write_log(
        landing,
        "vidX",
        [
            _rec("u1", 0, cat="jp", message="こんにちは"),
            _rec("u1", 30_000_000, cat="es_en_id"),
            _rec("u1", 90_000_000, cat="jp", message="ｗｗｗ"),  # next minute window
            _rec("u2", 5_000_000, cat="emoji", message="😀"),
            _rec("u2", 8_000_000, message="", mtype="new_member"),  # uncounted
        ],
    )

    q = (
        stream_user_counters(stream_messages(spark, str(landing)), channel_id="ch1")
        .writeStream.format("memory")
        .queryName("stream_counters")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    windowed = spark.table("stream_counters")
    # at least two distinct windows for u1 (0:00 and 0:01 tumbling minutes)
    assert windowed.where(F.col("user_id") == "u1").count() == 2

    rollup = {
        r["user_id"]: r
        for r in windowed.groupBy("channel_id", "video_id", "user_id")
        .agg(
            F.sum("jp_count").alias("jp"),
            F.sum("emoji_count").alias("emoji"),
            F.sum("total_message_count").alias("total"),
            F.max("last_message_at").alias("last_at"),
        )
        .collect()
    }
    u1, u2 = rollup["u1"], rollup["u2"]
    assert u1["jp"] == 2 and u1["total"] == 3
    assert u2["emoji"] == 1 and u2["total"] == 1  # member event not counted
    assert u1["video_id"] == "vidX" and u1["channel_id"] == "ch1"
    # member event still advanced u2's last_message_at
    assert u2["last_at"].microsecond == 0 and u2["last_at"].second == 8


def test_stateful_running_totals_accumulate_across_microbatches(spark, tmp_path):
    from holochatstats_spark.streaming.ingest_stream import (
        stream_running_user_totals,
    )

    landing = tmp_path / "landing2"
    landing.mkdir()
    # two files + maxFilesPerTrigger=1 -> two micro-batches within ONE
    # availableNow run; u1 appears in both, so its GroupState must carry
    # the first batch's total into the second
    _write_log(landing, "vidA", [_rec("u1", i * 1_000_000) for i in range(3)])
    _write_log(landing, "vidB", [_rec("u1", 10_000_000 + i) for i in range(2)])

    from holochatstats_spark.sources.chat_logs import MESSAGE_SCHEMA
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
        .withColumn("ts", F.timestamp_micros(F.col("timestamp")))
    )
    q = (
        stream_running_user_totals(src)
        .writeStream.format("memory")
        .queryName("state_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    totals = sorted(
        r["running_total"]
        for r in spark.table("state_totals").where(F.col("user_id") == "u1").collect()
    )
    # one emission per micro-batch: 3 after vidA, 5 after vidA+vidB —
    # the 5 can only exist if state crossed the batch boundary
    assert totals == [3, 5]
