"""Cross-engine fuzz corpus for the F1–F5 classification suite: a seeded
pseudo-random corpus (script mixing, shortcodes, URLs, badges) far beyond
the curated synth pool, classified by Spark's native expressions AND the
DuckDB RE2 twin — every disagreement is a portability bug.

Pools are curated to common codepoints of each script (Java and RE2 track
different Unicode versions at the property fringes; the engine contract
is pinned on the mainstream ranges the reference actually sees).
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from holochatstats_spark.functions.classify import (
    categorize_message,
    clean_chat_for_ai,
    has_humor,
    parse_membership_rank,
)
from holochatstats_spark.queries.chat_pipeline import classification_sql
from holochatstats_spark.testing import normalize

_FRAGMENTS = [
    "hello", "stream", "was", "great", "lol", "LOL", "lmao", "haha",
    "こんにちは", "ありがとう", "カワイイ", "草", "笑",
    "안녕하세요", "화이팅", "감사합니다",
    "привет", "спасибо", "хорошо",
    "123", "４５６", "2024",
    "😀", "🤣", "😆", "🎉",
    ":_fbkcha:", ":wave:", ":_lol:",
    "https://example.com/x", "http://a.b/c?d=1",
    "ｗ", "ｗｗ", "w", "W", "！", "？", "!?", "...",
    "xd", "XD", "wkwk", "rofl", "kek",
]

_BADGES = [
    "", "New member", "new member", "Member (1 month)", "Member (2 months)",
    "Member (6 months)", "Member (1 year)", "Member (2 years)",
    "member（8 months）", "Moderator", "Verified", "3 months", "10 years",
    "months", "year", "0 months", "member (24 months)", None,
]

_SEPARATORS = ["", " ", "  ", "\t", "、", " - "]


def _corpus(n: int = 300) -> list[tuple[int, str, str | None]]:
    rng = random.Random(7)
    rows = []
    for i in range(n):
        k = rng.randint(0, 5)
        sep = rng.choice(_SEPARATORS)
        msg = sep.join(rng.choice(_FRAGMENTS) for _ in range(k))
        badge = rng.choice(_BADGES)
        rows.append((i, msg, badge))
    # targeted edge cases on top of the random mix
    edge = [
        "", " ", "\t", "ｗｗｗ", "😀😀", ":_a::_b:", "１２３", "ｗ！",
        "ha", "hahaha", "wwww", "olllool", "loool", "lol.", "alol",
        "草w", "草ｗ", "ww breaks", "ＷＷ",
    ]
    for j, msg in enumerate(edge):
        rows.append((n + j, msg, rng.choice(_BADGES)))
    return rows


def test_classification_fuzz_corpus_matches_duckdb(spark):
    rows = _corpus()
    sdf = spark.createDataFrame(
        rows, "seq long, message string, badge_text string"
    ).select(
        "seq",
        "message",
        categorize_message(F.col("message")).alias("category"),
        parse_membership_rank(F.col("badge_text")).cast("int").alias("parsed_rank"),
        has_humor(F.col("message")).alias("humor"),
        clean_chat_for_ai(F.col("message")).alias("cleaned"),
    )
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.register(
        "probe",
        pd.DataFrame(rows, columns=["seq", "message", "badge_text"]),
    )
    res = con.execute(
        f"SELECT * FROM ({classification_sql('probe')}) ORDER BY seq"
    )
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(sdf.columns) == sorted(dcols)
    sn, dn = normalize(srows, sdf.columns), normalize(drows, dcols)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} cross-engine mismatches; first: {mismatches[0]}"
