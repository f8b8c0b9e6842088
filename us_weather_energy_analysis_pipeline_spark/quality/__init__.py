"""Data-quality suite (reference §2.9 `run_quality_checks`)."""

from us_weather_energy_analysis_pipeline_spark.quality.checks import (  # noqa: F401
    problem_rows,
    quality_report,
    quality_timeseries,
)
