from etl_demos_spark.functions.bqcompat import (
    age_band,
    bq_week,
    date_key,
    safe_parse_date,
    weekend_flag,
    year_diff,
)
from etl_demos_spark.functions.numeric import dec, exact_avg, exact_sum

__all__ = [
    "safe_parse_date",
    "date_key",
    "year_diff",
    "bq_week",
    "weekend_flag",
    "age_band",
    "dec",
    "exact_sum",
    "exact_avg",
]
