from holochatstats_spark.functions.core import (  # noqa: F401
    day_str,
    log_dampen,
    md5_long,
    month_str,
    pct_round,
    round2,
    safe_div,
    time_bucket,
)
