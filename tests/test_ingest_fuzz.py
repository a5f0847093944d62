"""Cross-engine fuzz for the A1 ingest aggregate: a seeded random
messages frame (user/video collisions, timestamp TIES exercising the
(ts, seq) tie-break, NULL ranks, member events, gift-only users) run
through build_user_data AND the shared DuckDB silver twin
(operators/synth.SILVER_USER_DATA_SQL) — any divergence is a bug in the
engine's most load-bearing computation, not just in the curated pool.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd

from pyspark.sql import types as T

from holochatstats_spark.operators.ingest import build_user_data
from holochatstats_spark.operators.synth import SILVER_USER_DATA_SQL
from holochatstats_spark.testing import normalize

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

_CATS = ("jp", "kr", "ru", "emoji", "es_en_id", "number")


def _rows(n: int = 500):
    rng = random.Random(11)
    rows = []
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    for i in range(n):
        user = f"u{rng.randint(0, 12)}"
        video = f"v{rng.randint(0, 4)}"
        # second-granularity with a SMALL range so ts ties across rows are
        # common — the (ts, seq) tie-break must decide identically
        ts = base + dt.timedelta(seconds=rng.randint(0, 120))
        mtype = rng.choice(["chat"] * 7 + ["paid_message", "new_member", "gift_member"])
        if mtype == "gift_member":
            rank = -2 if rng.random() < 0.8 else rng.choice([0, 1, 6])
        else:
            rank = rng.choice([None, -1, -1, 0, 1, 6, 12, 24])
        if rng.random() < 0.15:
            cat, msg = None, ""  # blank → uncounted (like the synth pool)
        else:
            cat, msg = rng.choice(_CATS), "some message"
        rows.append(
            (f"ch{rng.randint(0, 1)}", video, user, f"name-{user}-{i}", ts,
             rank, cat, msg, mtype, i)
        )
    return rows


def test_ingest_aggregate_fuzz_matches_sql_twin(spark):
    rows = _rows()
    sdf = build_user_data(spark.createDataFrame(rows, SCHEMA))
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    pdf = pd.DataFrame(
        rows,
        columns=[
            "channel_id", "video_id", "user_id", "username", "ts",
            "membership_rank", "message_category", "message",
            "message_type", "seq",
        ],
    )
    pdf["membership_rank"] = pd.array(pdf["membership_rank"], dtype="Int32")
    con = duckdb.connect()
    con.register("msgs", pdf)
    res = con.execute(f"""
        WITH ud AS ({SILVER_USER_DATA_SQL})
        SELECT *,
               CAST(date_trunc('month',
                    MAX(last_message_at) OVER (PARTITION BY channel_id, video_id))
                 AS DATE) AS observed_month
        FROM ud
    """)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, (
        f"{len(mismatches)}/{len(sn)} silver rows diverge; first: {mismatches[0]}"
    )
