"""A1 — the per-(user, channel, video) ingest aggregate, the reference's
most load-bearing computation (chat_downloader.py:41-179, pinned by its
only unit test; cache replay variant cache_manager.py:30-79).

The reference runs a hand-rolled streaming hash-agg in Python dicts, one
process per video, feeding a single DB-writer queue. Here the whole thing
is ONE declarative groupBy over the messages table — Spark gives partial
(map-side) aggregation, spill, and distribution for free, and the
downstream write is an idempotent month-partition overwrite
(sources/writers.py) instead of an upsert queue.

Semantics reproduced (and where they differ, why):
- category counters: jp/kr/ru/emoji/es_en_id each count categorized chat
  messages; `number` counts toward total_message_count only
  (chat_downloader.py:113-121,166-172).
- membership events (new_member/gift_member) do NOT count as messages but
  DO advance last_message_at (chat_downloader.py:68-98).
- membership_rank: the rank from the user's latest rank-bearing row
  (message, or member event with badges); gift events without badges give
  rank -2 and never override a known rank (chat_downloader.py:70-86,
  158-163). The reference uses arrival order; we use event-time order
  with a seq tie-break when present (arrival order is not a distributed
  concept — documented divergence for equal timestamps).
- is_gift: user has a gift event and no known-rank row
  (chat_downloader.py:155-157).
- observed_month: month of the video's last message, falling back to the
  job's (year, month) for empty videos (chat_downloader.py:141-145).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from holochatstats_spark.functions.classify import (
    COUNTED_CATEGORIES,
    categorize_message,
)

MEMBER_EVENT_TYPES = ("new_member", "gift_member")


def classify_messages(messages: DataFrame) -> DataFrame:
    """Fill message_category where missing (replay logs carry it;
    live-parsed streams don't) — native expression, no UDF."""
    return messages.withColumn(
        "message_category",
        F.when(
            F.col("message_type").isin(*MEMBER_EVENT_TYPES),
            F.lit(None).cast("string"),
        ).otherwise(
            F.coalesce(F.col("message_category"), categorize_message(F.col("message")))
        ),
    )


def build_user_data(
    messages: DataFrame,
    default_year: int | None = None,
    default_month: int | None = None,
) -> DataFrame:
    """messages (bronze) → user_data (silver): one row per
    (channel_id, video_id, user_id). Expects columns: channel_id,
    video_id, user_id, username, ts (timestamp), membership_rank,
    message_category, message, message_type; optional seq for total
    ordering within equal timestamps.
    """
    msgs = classify_messages(messages)
    if "seq" not in msgs.columns:
        msgs = msgs.withColumn("seq", F.lit(0).cast("long"))

    is_member_event = F.col("message_type").isin(*MEMBER_EVENT_TYPES)
    # a chat message only counts if it survived classification
    is_counted_msg = (~is_member_event) & F.col("message_category").isNotNull()
    # rank is "known" unless NULL (no badge parsed — not rank-bearing) or a
    # badge-less gift event (rank -2); a NULL-rank chat message must not
    # shadow an earlier known rank (ADVICE r1: the bare coalesce collapsed
    # that case to -2)
    has_known_rank = F.col("membership_rank").isNotNull() & (
        (~is_member_event) | (F.col("membership_rank") != -2)
    )
    order_key = F.struct(F.col("ts"), F.col("seq"))

    cat_counters = [
        F.sum(
            F.when(is_counted_msg & (F.col("message_category") == c), 1).otherwise(0)
        )
        .cast("int")
        .alias(f"{c}_count")
        for c in COUNTED_CATEGORIES
    ]

    per_user = (
        msgs.groupBy("channel_id", "video_id", "user_id")
        .agg(
            F.max_by("username", order_key).alias("username"),
            F.max("ts").alias("last_message_at"),
            *cat_counters,
            F.sum(F.when(is_counted_msg, 1).otherwise(0))
            .cast("int")
            .alias("total_message_count"),
            F.coalesce(
                F.max_by(
                    F.when(has_known_rank, F.col("membership_rank")),
                    F.when(has_known_rank, order_key),
                ),
                F.lit(-2),
            )
            .cast("int")
            .alias("membership_rank"),
            (
                F.max((F.col("message_type") == "gift_member").cast("int")) == 1
            ).alias("has_gift_event"),
            (F.max(has_known_rank.cast("int")) == 0).alias("no_known_rank"),
        )
        .withColumn("is_gift", F.col("has_gift_event") & F.col("no_known_rank"))
        .drop("has_gift_event", "no_known_rank")
    )

    # observed_month: month of the video's LAST message (any user) —
    # window over the per-user aggregate (cardinality = users/video), not
    # the raw messages.
    w_video = Window.partitionBy("channel_id", "video_id")
    per_user = per_user.withColumn(
        "observed_month",
        F.trunc(F.max("last_message_at").over(w_video), "MM"),
    )
    if default_year is not None and default_month is not None:
        per_user = per_user.withColumn(
            "observed_month",
            F.coalesce(
                F.col("observed_month"),
                F.lit(f"{default_year:04d}-{default_month:02d}-01").cast("date"),
            ),
        )
    return per_user
