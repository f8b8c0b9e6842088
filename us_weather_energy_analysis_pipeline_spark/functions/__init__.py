"""Column-expression scalar libraries. Everything is a native Column expr —
no Python UDFs anywhere in the hot path (SURVEY §2.8: nothing in the
reference's surface needs one)."""

from us_weather_energy_analysis_pipeline_spark.functions.scalars import (  # noqa: F401
    celsius_to_fahrenheit,
    day_name,
    is_saturday,
    pct_change,
    row_avg,
    temp_range_bin,
)
