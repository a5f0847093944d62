"""F1-F5 classification parity tests — the edge cases pinned by the
reference's chat_parser.py / feature_analysis.py (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from holochatstats_spark.functions.classify import (
    categorize_message,
    clean_chat_for_ai,
    has_humor,
    is_pure_emoji,
    parse_membership_rank,
)


def _eval(spark, expr_builder, values):
    df = spark.createDataFrame([(v,) for v in values], "msg string")
    return [r["out"] for r in df.select(expr_builder(F.col("msg")).alias("out")).collect()]


CATEGORIZE_CASES = [
    # (message, expected) — semantics of chat_parser.py:60-93
    ("こんにちは", "jp"),          # hiragana
    ("カタカナ", "jp"),            # katakana
    ("漢字テスト", "jp"),          # han
    ("草", "jp"),                  # han single char (humor too)
    ("！？", "jp"),                # jp punctuation
    ("www", "jp"),                 # ^[wｗ]+$ laugh
    ("ｗｗｗ", "jp"),              # fullwidth laugh
    ("wwwa", "es_en_id"),          # laugh regex is anchored
    ("안녕하세요", "kr"),
    ("привет", "ru"),
    ("12345", "number"),
    ("１２３", "number"),          # fullwidth digits are isnumeric()
    ("hello world", "es_en_id"),
    ("hola jaja", "es_en_id"),
    ("🤣🤣", "emoji"),
    (":_konkonmori:", "emoji"),
    (":shortcode: 🎉", "emoji"),
    ("🤣 nice", "es_en_id"),       # emoji + text is not pure
    ("", None),
    ("   ", None),
    (None, None),
    # ordered short-circuit: jp beats kr when both scripts present
    ("韓国어", "jp"),
]


@pytest.mark.parametrize("msg,expected", CATEGORIZE_CASES)
def test_categorize_message(spark, msg, expected):
    df = spark.createDataFrame([(msg,)], "msg string")
    got = df.select(categorize_message(F.col("msg")).alias("c")).first()["c"]
    assert got == expected, f"{msg!r}: got {got}, want {expected}"


PURE_EMOJI_CASES = [
    ("🤣", True),
    ("🤣😆", True),
    ("🤣 😆", True),                 # whitespace between emoji ok
    (":_konkonmori::_okayu:", True),
    (":face_with_tears_of_joy:", True),
    ("👍🏽", True),                  # skin tone modifier
    ("👨‍👩‍👧", True),              # ZWJ sequence
    ("🇯🇵", True),                  # regional indicators
    ("text", False),
    ("🤣text", False),
    ("", False),                    # nothing stripped
    ("   ", False),                 # whitespace only, nothing stripped
    (":not closed", False),
]


@pytest.mark.parametrize("msg,expected", PURE_EMOJI_CASES)
def test_is_pure_emoji(spark, msg, expected):
    df = spark.createDataFrame([(msg,)], "msg string")
    got = df.select(is_pure_emoji(F.col("msg")).alias("p")).first()["p"]
    assert got == expected, f"{msg!r}: got {got}, want {expected}"


RANK_CASES = [
    (None, -1),
    ("", -1),
    ("Member", -1),
    ("New member", 0),
    ("new member (1 day)", 0),      # 'new member' wins before digit scan
    ("Member (1 month)", 1),
    ("Member (6 months)", 6),
    ("Member (1 year)", 12),
    ("Member (2 years)", 24),
    ("member (13 months)", 13),
]


@pytest.mark.parametrize("badge,expected", RANK_CASES)
def test_parse_membership_rank(spark, badge, expected):
    df = spark.createDataFrame([(badge,)], "msg string")
    got = df.select(parse_membership_rank(F.col("msg")).alias("r")).first()["r"]
    assert got == expected, f"{badge!r}: got {got}, want {expected}"


HUMOR_CASES = [
    ("草", True),
    ("lmao that was great", True),
    ("LMAO", False),               # substring list is case-sensitive (quirk)
    ("lol", True),                 # \blol+\b case-insensitive
    ("LOL", True),
    ("loool", False),              # matches neither \blol+\b nor o?l{2,}o+l+
    ("looool", True),              # substring list entry
    ("hahaha", True),              # haha substring + (ha){2,}
    ("jajaja", True),
    ("wkwkwk", True),
    ("すごいｗ", True),            # jp text ending in fullwidth w
    ("ｗ", True),                  # in the substring list
    ("wwww", True),                # w{2,}
    ("hello", False),
    ("what", False),               # 'ha' once is not (ha){2,}
]


@pytest.mark.parametrize("msg,expected", HUMOR_CASES)
def test_has_humor(spark, msg, expected):
    df = spark.createDataFrame([(msg,)], "msg string")
    got = df.select(has_humor(F.col("msg")).alias("h")).first()["h"]
    assert got == expected, f"{msg!r}: got {got}, want {expected}"


def test_clean_chat_for_ai(spark):
    cases = [
        (":_wave: hello   there https://x.co/a?b=1 bye", "hello there bye"),
        ("plain", "plain"),
    ]
    for raw, want in cases:
        df = spark.createDataFrame([(raw,)], "msg string")
        got = df.select(clean_chat_for_ai(F.col("msg")).alias("c")).first()["c"]
        assert got == want
