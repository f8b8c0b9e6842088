"""us_weather_energy_analysis_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (Basseychrist/US-Weather-Energy-Analysis-Pipeline), re-expressed
Spark-first: lazy DataFrame plans, Catalyst optimization, partition-aware
operators designed for 100 TB scale, tested on local mode.

Layout
------
- ``session``    SparkSession factory with scale-tuned defaults (AQE, Arrow).
- ``sources``    Readers/writers: parquet/CSV/JSON landing, NOAA/EIA raw shapes.
- ``functions``  Column-expression scalar libraries (units, time, text, vectors).
- ``operators``  Reusable relational operators: date spine, EAV pivot, resample,
                 dedup (exact/minhash/simhash/ngram/embedding), imputation,
                 window idioms, similarity search.
- ``quality``    Single-pass data-quality report + problem-row extraction.
- ``analytics``  The dashboard view-queries (time series, map, heatmap, corr).
- ``plans``      End-to-end ETL plan (weather ⨝ energy → canonical fact table).
- ``streaming``  Structured Streaming variants (1-day tumbling, watermarks).
- ``corpus``     The named query corpus + DuckDB oracle SQL (driver contract).
"""

__version__ = "0.1.0"
