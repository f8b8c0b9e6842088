"""The named query corpus + DuckDB oracle SQL (driver contract)."""

from us_weather_energy_analysis_pipeline_spark.corpus.registry import (  # noqa: F401
    REGISTRY,
    oracle_sql,
    queries,
    register,
)
