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


# ---------------------------------------------------------------------------
# V10-exact — the reference's statistical forecaster (forecaster.py:318-351)
# reproduced term for term: MinMax scale to [0.1, 0.9], exp-linspace
# weighted mean (n>=3), population std (n>1, else 0.1), trend =
# (last-first)/n, horizon-3 forecasts clipped to [0.05, 0.95], inverse
# transform, z intervals (1.645 / 0.674) with widening factor 1+0.2i and
# a floor at 0. One groupBy per series + a broadcast horizon spine —
# per-channel fits at 100 TB are distributed moment sums, never a collect.
# ---------------------------------------------------------------------------
@register(
    "ewm_forecast",
    oracle="""
    WITH monthly AS (
      SELECT o_orderpriority AS series,
             date_trunc('month', o_orderdate) AS m,
             SUM(o_totalprice) AS x
      FROM orders GROUP BY 1, 2
    ), idx AS (
      SELECT series, x,
             ROW_NUMBER() OVER (PARTITION BY series ORDER BY m) - 1 AS i,
             COUNT(*) OVER (PARTITION BY series) AS n,
             MIN(x) OVER (PARTITION BY series) AS mn,
             MAX(x) OVER (PARTITION BY series) AS mx
      FROM monthly
    ), scaled AS (
      SELECT series, i, n, mn, mx,
             CASE WHEN mx = mn THEN 0.5
                  ELSE 0.1 + 0.8 * (x - mn) / (mx - mn) END AS s,
             CASE WHEN n > 1 THEN exp(-1.0 + i / (n - 1.0)) ELSE 1.0 END AS w
      FROM idx
    ), fit AS (
      SELECT series,
             CAST(MAX(n) AS BIGINT) AS n_months,
             MAX(mn) AS mn, MAX(mx) AS mx,
             CASE WHEN MAX(n) >= 3 THEN SUM(s * w) / SUM(w)
                  ELSE AVG(s) END AS wm,
             CASE WHEN MAX(n) > 1 THEN stddev_pop(s) ELSE 0.1 END AS sd,
             CASE WHEN MAX(n) >= 2
                  THEN (arg_max(s, i) - arg_min(s, i)) / MAX(n)
                  ELSE 0 END AS trend
      FROM scaled GROUP BY series
    ), horizons AS (
      SELECT unnest(range(1, 4)) AS h
    ), fc AS (
      SELECT f.series, f.n_months, CAST(hz.h AS INT) AS h,
             (LEAST(GREATEST(f.wm + f.trend * hz.h, 0.05), 0.95) - 0.1)
               * (f.mx - f.mn) / 0.8 + f.mn AS orig,
             f.sd * (f.mx - f.mn) / 0.8 AS sd_orig,
             1 + 0.2 * (hz.h - 1) AS widen
      FROM fit f CROSS JOIN horizons hz
    )
    SELECT series, n_months, h,
           FLOOR(orig * 100 + 0.5) / 100 AS forecast,
           FLOOR(GREATEST(0, orig - 1.645 * sd_orig * widen) * 100 + 0.5) / 100 AS ci_lower,
           FLOOR(GREATEST(0, orig - 0.674 * sd_orig * widen) * 100 + 0.5) / 100 AS p25,
           FLOOR((orig + 0.674 * sd_orig * widen) * 100 + 0.5) / 100 AS p75,
           FLOOR((orig + 1.645 * sd_orig * widen) * 100 + 0.5) / 100 AS ci_upper
    FROM fc
    ORDER BY series, h
    """,
    survey="V10,V11-adjacent",
    tags=("bench",),
)
def ewm_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from holochatstats_spark.functions.core import round_half_up

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
    ).agg(F.sum("o_totalprice").alias("x"))
    # r22 (guide §2.4): the r21 shape ran a 4-function window over
    # (series) and THEN a 6-aggregate groupBy — two sorted shuffles of the
    # monthly rows. A series is bounded by the calendar (one row per
    # month), so ONE sorted collect_list per series holds the whole curve
    # and every windowed quantity becomes a higher-order array expression:
    # row_number i = array position, min/max/count = array_min/max/size,
    # the weighted mean / stddev_pop / first-last trend are folds. Numeric
    # parity with the window formulation is NOT automatic (fold order vs
    # distributed sum order, two-pass vs Welford variance) — it is gated
    # by the oracle hash at sf0.001/sf0.01/sf0.1, all of which pass at the
    # rounded output precision.
    # guards (mirrored in the oracle): a constant series (mx == mn) scales
    # to flat 0.5 instead of 0/0 — the reference jitters with random noise
    # there (nondeterministic, forecaster.py:183-185); a 1-month series
    # gets weight 1.0 instead of exp(0/0)=NaN poisoning the unused branch
    arr = monthly.groupBy("series").agg(
        F.sort_array(F.collect_list(F.struct("m", "x"))).alias("pts")
    )
    xs = F.transform(F.col("pts"), lambda e: e["x"])
    base = arr.select(
        "series",
        F.size("pts").alias("n_i"),
        F.array_min(xs).alias("mn"),
        F.array_max(xs).alias("mx"),
        xs.alias("xs"),
    )
    n_d = F.col("n_i").cast("double")
    s_arr = F.transform(
        "xs",
        lambda x: F.when(F.col("mx") == F.col("mn"), F.lit(0.5)).otherwise(
            F.lit(0.1)
            + F.lit(0.8) * (x - F.col("mn")) / (F.col("mx") - F.col("mn"))
        ),
    )
    scaled = base.select("series", "n_i", "mn", "mx", s_arr.alias("s"))
    wgt = lambda i: (  # noqa: E731 — exp-linspace weight at position i
        F.when(
            F.col("n_i") > 1,
            F.exp(F.lit(-1.0) + i.cast("double") / (n_d - F.lit(1.0))),
        ).otherwise(F.lit(1.0))
    )
    fsum = lambda col: F.aggregate(col, F.lit(0.0), lambda a, v: a + v)  # noqa: E731
    s_sum = fsum(F.col("s"))
    sw_sum = fsum(F.transform("s", lambda v, i: v * wgt(i)))
    w_sum = fsum(F.transform("s", lambda v, i: wgt(i)))
    mean = s_sum / n_d
    var = fsum(F.transform("s", lambda v: (v - mean) * (v - mean))) / n_d
    fit = scaled.select(
        "series",
        F.col("n_i").cast("bigint").alias("n_months"),
        "mn",
        "mx",
        F.when(F.col("n_i") >= 3, sw_sum / w_sum).otherwise(mean).alias("wm"),
        F.when(F.col("n_i") > 1, F.sqrt(var)).otherwise(F.lit(0.1)).alias("sd"),
        F.when(
            F.col("n_i") >= 2,
            (F.element_at("s", F.col("n_i")) - F.element_at("s", 1)) / F.col("n_i"),
        )
        .otherwise(F.lit(0.0))
        .alias("trend"),
    )
    horizons = spark.range(1, 4).select(F.col("id").cast("int").alias("h"))
    fc = fit.crossJoin(F.broadcast(horizons)).select(
        "series",
        "n_months",
        "h",
        (
            (
                F.least(
                    F.greatest(F.col("wm") + F.col("trend") * F.col("h"), F.lit(0.05)),
                    F.lit(0.95),
                )
                - 0.1
            )
            * (F.col("mx") - F.col("mn"))
            / 0.8
            + F.col("mn")
        ).alias("orig"),
        (F.col("sd") * (F.col("mx") - F.col("mn")) / 0.8).alias("sd_orig"),
        (1 + 0.2 * (F.col("h") - 1)).alias("widen"),
    )
    spread = F.col("sd_orig") * F.col("widen")
    return fc.select(
        "series",
        "n_months",
        "h",
        round_half_up(F.col("orig"), 2).alias("forecast"),
        round_half_up(F.greatest(F.lit(0.0), F.col("orig") - 1.645 * spread), 2).alias(
            "ci_lower"
        ),
        round_half_up(F.greatest(F.lit(0.0), F.col("orig") - 0.674 * spread), 2).alias(
            "p25"
        ),
        round_half_up(F.col("orig") + 0.674 * spread, 2).alias("p75"),
        round_half_up(F.col("orig") + 1.645 * spread, 2).alias("ci_upper"),
    ).orderBy("series", "h")


# ---------------------------------------------------------------------------
# V11 — month-spine gap fill WITH linear interpolation (forecaster.py:
# 164-176: reindex → interpolate(method='linear') → fillna(0)). The r1
# monthly_spine_gapfill only zero-filled; here interior gaps are linearly
# interpolated between the surrounding observed months (window last/first
# IGNORE NULLS), leading/trailing gaps fall back to 0. Months ≡ 1 (mod 3)
# are withheld from the input so interpolation is actually exercised.
# ---------------------------------------------------------------------------
@register(
    "monthly_spine_interp",
    oracle="""
    WITH src AS (
      SELECT o_orderpriority, date_trunc('month', o_orderdate) AS m,
             SUM(o_totalprice) AS total
      FROM orders
      WHERE date_part('month', o_orderdate) % 3 <> 1
      GROUP BY 1, 2
    ), bounds AS (
      SELECT date_trunc('month', MIN(o_orderdate)) AS mn,
             date_trunc('month', MAX(o_orderdate)) AS mx
      FROM orders
    ), spine AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS m FROM bounds
    ), prios AS (
      SELECT DISTINCT o_orderpriority FROM orders
    ), joined AS (
      SELECT p.o_orderpriority, sp.m,
             CAST(date_part('year', sp.m) * 12 + date_part('month', sp.m) AS DOUBLE) AS pos,
             s.total
      FROM spine sp
      CROSS JOIN prios p
      LEFT JOIN src s ON s.o_orderpriority = p.o_orderpriority AND s.m = sp.m
    ), ctx AS (
      SELECT *,
             last_value(total IGNORE NULLS) OVER w_prev AS prev_val,
             last_value(CASE WHEN total IS NOT NULL THEN pos END IGNORE NULLS)
               OVER w_prev AS prev_pos,
             first_value(total IGNORE NULLS) OVER w_next AS next_val,
             first_value(CASE WHEN total IS NOT NULL THEN pos END IGNORE NULLS)
               OVER w_next AS next_pos
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY o_orderpriority ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY o_orderpriority ORDER BY m
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT o_orderpriority, strftime(m, '%Y-%m') AS month,
           total IS NULL AS was_gap,
           FLOOR(CASE
             WHEN total IS NOT NULL THEN total
             WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
               prev_val + (next_val - prev_val) * (pos - prev_pos)
                          / (next_pos - prev_pos)
             ELSE 0 END * 100 + 0.5) / 100 AS total_interp
    FROM ctx
    ORDER BY o_orderpriority, month
    """,
    survey="V11,F8,J8",
)
def monthly_spine_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from holochatstats_spark.functions.core import round_half_up

    o = load_table(spark, sf_dir, "orders")
    src = (
        o.where(F.month("o_orderdate") % 3 != 1)
        .groupBy(
            "o_orderpriority",
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(F.sum("o_totalprice").alias("total"))
    )
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("mn"),
        F.date_trunc("month", F.max("o_orderdate")).alias("mx"),
    )
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 MONTH"))).alias("m")
    )
    prios = o.select("o_orderpriority").distinct()
    joined = (
        spine.crossJoin(F.broadcast(prios))
        .join(src, ["o_orderpriority", "m"], "left")
        .withColumn(
            "pos", (F.year("m") * 12 + F.month("m")).cast("double")
        )
    )
    w_prev = (
        Window.partitionBy("o_orderpriority")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("o_orderpriority")
        .orderBy("m")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_pos = F.when(F.col("total").isNotNull(), F.col("pos"))
    ctx = joined.select(
        "o_orderpriority",
        "m",
        "pos",
        "total",
        F.last("total", ignorenulls=True).over(w_prev).alias("prev_val"),
        F.last(obs_pos, ignorenulls=True).over(w_prev).alias("prev_pos"),
        F.first("total", ignorenulls=True).over(w_next).alias("next_val"),
        F.first(obs_pos, ignorenulls=True).over(w_next).alias("next_pos"),
    )
    interp = (
        F.when(F.col("total").isNotNull(), F.col("total"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
            F.col("prev_val")
            + (F.col("next_val") - F.col("prev_val"))
            * (F.col("pos") - F.col("prev_pos"))
            / (F.col("next_pos") - F.col("prev_pos")),
        )
        .otherwise(F.lit(0.0))
    )
    return ctx.select(
        "o_orderpriority",
        F.date_format("m", "yyyy-MM").alias("month"),
        F.col("total").isNull().alias("was_gap"),
        round_half_up(interp, 2).alias("total_interp"),
    ).orderBy("o_orderpriority", "month")


# ---------------------------------------------------------------------------
# V9 — grouped-map ML forecaster (rows-only: nondeterministic across BLAS
# builds in principle, and the reference's LSTM (forecaster.py:201-273) is
# torch + MC-dropout — excluded from the hash oracle per SURVEY §5).
# ---------------------------------------------------------------------------
@register(
    "ml_forecast",
    oracle=None,
    survey="V9",
)
def ml_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from holochatstats_spark.operators.forecast_ml import forecast_per_series

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
    ).agg(F.sum("o_totalprice").alias("x"))
    return forecast_per_series(monthly).orderBy("series", "h")
