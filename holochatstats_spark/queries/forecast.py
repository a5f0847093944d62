"""Deterministic forecasting (V10/V11): the oracle-friendly statistical
path of the reference's forecaster (forecaster.py:318-351 — trend + z-based
intervals). The LSTM path (V9) is nondeterministic and lives in
operators/forecast_ml.py behind applyInPandas, excluded from the oracle per
SURVEY §5.

Linear-trend fit uses regr_slope/regr_intercept — native aggregates in both
Spark and DuckDB, computed from distributed moment sums (no per-group
collect), so a per-channel fit at 100 TB is one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from holochatstats_spark.functions.core import round2
from holochatstats_spark.queries import register
from holochatstats_spark.tables import load_table

_Z90 = 1.645  # reference's z-interval, forecaster.py:338-344


@register(
    "linear_trend_forecast",
    oracle=f"""
    WITH monthly AS (
      SELECT o_orderpriority,
             CAST(date_part('year', o_orderdate) * 12 + date_part('month', o_orderdate) AS BIGINT)
               AS month_idx,
             SUM(o_totalprice) AS total
      FROM orders GROUP BY 1, 2
    ), fit AS (
      SELECT o_orderpriority,
             COUNT(*) AS n_months,
             regr_slope(total, month_idx) AS slope,
             regr_intercept(total, month_idx) AS icept,
             MAX(month_idx) AS last_idx,
             stddev_samp(total) AS sd
      FROM monthly GROUP BY 1
    )
    SELECT o_orderpriority,
           CAST(n_months AS BIGINT) AS n_months,
           ROUND(slope, 4) AS slope,
           ROUND(icept + slope * (last_idx + 1), 2) AS forecast_next,
           ROUND(icept + slope * (last_idx + 1) - {_Z90} * sd, 2) AS ci_lower,
           ROUND(icept + slope * (last_idx + 1) + {_Z90} * sd, 2) AS ci_upper
    FROM fit
    ORDER BY o_orderpriority
    """,
    survey="V10,V9-analog",
)
def linear_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("month_idx"),
    ).agg(F.sum("o_totalprice").alias("total"))
    fit = monthly.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_months"),
        F.regr_slope("total", "month_idx").alias("slope"),
        F.regr_intercept("total", "month_idx").alias("icept"),
        F.max("month_idx").alias("last_idx"),
        F.stddev_samp("total").alias("sd"),
    )
    fc = F.col("icept") + F.col("slope") * (F.col("last_idx") + 1)
    return fit.select(
        "o_orderpriority",
        F.col("n_months").cast("bigint").alias("n_months"),
        F.round("slope", 4).alias("slope"),
        round2(fc).alias("forecast_next"),
        round2(fc - _Z90 * F.col("sd")).alias("ci_lower"),
        round2(fc + _Z90 * F.col("sd")).alias("ci_upper"),
    ).orderBy("o_orderpriority")
