"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with mapInPandas (Arrow-batched) — the pattern a training-data
pipeline uses for image/audio/video columns at 100 TB.

Design (per the engine contract):
- media is an opaque `binary` column plus a typed metadata struct; Spark
  never interprets the bytes JVM-side;
- decode / feature-extract / frame-sample run as mapInPandas stages:
  Arrow moves whole column batches into pandas, the UDF is vectorized per
  batch (never per row), and the output schema is declared up front so
  Catalyst can prune and the shuffle layout is known;
- REAL decoders (PIL / soundfile / av) are not in this container: the
  decode entry points below are import-gated stubs that raise
  NotImplementedError, and feature extraction uses a deterministic fake
  decode (md5-derived dimensions) so the Spark-side plumbing — schema,
  batch shape, partitioning, oracle parity — is real and tested.

The synthetic payload derives from the `documents` table (text → UTF-8
bytes), making every downstream feature a pure function both engines can
compute: the DuckDB twin recomputes md5/byte-lengths from the same text.

Scale notes: feature extraction is a map-only stage (no shuffle); a
downstream groupBy(media_type) shuffles only the tiny feature rows, never
payload bytes — project payload away BEFORE any wide operation.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, payload_md5 string, "
    "width int, height int, sample_rate int, duration_sec double"
)

_SAMPLE_RATES = (8000, 16000, 22050, 44100)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type, payload binary): deterministic
    media table standing in for real image/audio/video bytes."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes):
    """Real image decode — requires PIL (not in this container)."""
    from PIL import Image  # noqa: F401  (import-gated stub)

    raise NotImplementedError(
        "image decode is stubbed: plug PIL.Image.open(BytesIO(payload)) "
        "here when pillow is available"
    )


def decode_audio(payload: bytes):
    """Real audio decode — requires soundfile/librosa (not installed)."""
    import soundfile  # noqa: F401  (import-gated stub)

    raise NotImplementedError("audio decode is stubbed (needs soundfile)")


def _fake_dims(md5_hex: str) -> tuple[int, int]:
    h1 = int(md5_hex[:8], 16)
    h2 = int(md5_hex[8:16], 16)
    return h1 % 1920 + 1, h2 % 1080 + 1


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches: byte stats, a
    payload fingerprint, and a deterministic fake decode per modality
    (width/height for visual, sample_rate/duration for audio)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        rates = np.asarray(_SAMPLE_RATES, dtype=np.int64)
        for pdf in it:
            n = len(pdf)
            md5s = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
            n_bytes = np.fromiter(
                (len(p) for p in pdf["payload"]), dtype=np.int64, count=n
            )
            h1 = np.fromiter(
                (int(m[:8], 16) for m in md5s), dtype=np.int64, count=n
            )
            h2 = np.fromiter(
                (int(m[8:16], 16) for m in md5s), dtype=np.int64, count=n
            )
            mtype = pdf["media_type"].to_numpy()
            visual = (mtype == "image") | (mtype == "video")
            audio = mtype == "audio"
            video = mtype == "video"
            # nullable dtypes keep non-applicable metadata NULL (not NaN)
            # through the Arrow boundary, matching the r20 row-dict path
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": mtype,
                    "n_bytes": n_bytes,
                    "payload_md5": md5s,
                    "width": pd.Series(h1 % 1920 + 1, dtype="Int32").where(
                        visual
                    ),
                    "height": pd.Series(h2 % 1080 + 1, dtype="Int32").where(
                        visual
                    ),
                    "sample_rate": pd.Series(
                        rates[h1 % 4], dtype="Int32"
                    ).where(audio),
                    "duration_sec": pd.Series(
                        np.where(video, n_bytes / 2048.0, n_bytes / 1024.0),
                        dtype="Float64",
                    ).where(audio | video),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


#: DuckDB twin of synthesize_media + extract_features over `documents` —
#: identical bytes (UTF-8), identical md5, identical fake-decode rules.
FEATURES_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(CASE WHEN doc_id % 3 <> 1
                THEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 1920 + 1
                END AS INT) AS width,
           CAST(CASE WHEN doc_id % 3 <> 1
                THEN ('0x' || substr(md5(text), 9, 8))::BIGINT % 1080 + 1
                END AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 = 1 THEN
                ([8000, 16000, 22050, 44100])[(('0x' || substr(md5(text), 1, 8))::BIGINT % 4)::INT + 1]
                END AS INT) AS sample_rate,
           CASE WHEN doc_id % 3 = 1 THEN octet_length(encode(text)) / 1024.0
                WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) / 2048.0
                END AS duration_sec
    FROM documents
"""
