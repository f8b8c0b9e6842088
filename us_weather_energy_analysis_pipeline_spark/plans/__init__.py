"""End-to-end ETL plans (the reference's `src/pipeline.py` re-expressed as
one lazy DAG — no per-city loops, city is just a column)."""
