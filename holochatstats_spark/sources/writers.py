"""Silver/gold sinks (SURVEY.md §2.1 S5/S7).

The reference's upsert path is an `INSERT ... ON CONFLICT DO UPDATE`
summing counters (queries.py:338-354) fed by a single-writer batching
process (db_worker.py) — a serialization point with inconsistent re-ingest
semantics (SURVEY §7 risk 3). The Spark-native replacement is an
idempotent month-partition rebuild: recompute the month's aggregate and
INSERT OVERWRITE just that partition (dynamic partitionOverwriteMode) —
re-running a month is a no-op instead of a double-count, and the write is
fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_month_partitioned(
    df: DataFrame,
    path: str,
    month_col: str = "observed_month",
    fmt: str = "parquet",
) -> None:
    """Idempotent month-partition overwrite (replaces S5 upserts).

    Only partitions present in ``df`` are replaced; other months are
    untouched — the exact semantics of the reference's
    DELETE-month + INSERT-month refresh proc (queries.py:120-129).
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.withColumn("_month", F.date_format(F.col(month_col), "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("_month")
        .format(fmt)
        .save(path)
    )


def export_csv(df: DataFrame, path: str) -> None:
    """S7: per-query CSV export (reference README.md:51)."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
