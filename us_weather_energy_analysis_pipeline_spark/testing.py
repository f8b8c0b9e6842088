"""Shared correctness-compare helpers (mirrors the driver's gate):
row count + sorted column names + order-insensitive multiset of
stringified rows, Spark result vs DuckDB oracle on the same parquet."""

from __future__ import annotations

import pandas as pd


def register_views(con, sf_dir: str) -> None:
    from us_weather_energy_analysis_pipeline_spark.corpus.registry import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name; every cell stringified; rows sorted.

    Deliberately STRICTER than any plausible driver normalization: an
    integral float (83.0) does NOT collapse to the int string ("83"), so a
    Spark int64 column paired with a DuckDB HUGEINT→float64 column fails
    here the way it failed the r6 driver hash (doc_span_dup_ratio) instead
    of passing locally and failing remotely. If this gate passes, any
    stringify-and-hash compare passes."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v) -> str:
        if v is None:
            return "∅"
        if isinstance(v, float):
            if pd.isna(v):
                return "∅"
            return repr(v)
        try:
            if pd.isna(v):
                return "∅"
        except (TypeError, ValueError):
            pass
        return str(v)

    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def diff_report(sdf: pd.DataFrame, odf: pd.DataFrame) -> str | None:
    """None when equal under the driver's comparison; else a short message."""
    if len(sdf) != len(odf):
        return f"rowcount spark={len(sdf)} oracle={len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    a, b = normalize(sdf), normalize(odf)
    if a != b:
        only_a = [r for r in a if r not in set(b)][:3]
        only_b = [r for r in b if r not in set(a)][:3]
        return f"values differ; spark-only={only_a} oracle-only={only_b}"
    return None
