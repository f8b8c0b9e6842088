"""Query-corpus registry: named Spark queries + their DuckDB oracle SQL.

Each entry is the driver contract unit (``/root/repo/__spark_entry__.py``):
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
ANSI-SQL twin DuckDB runs on the same parquet tables. Column names are aliased
identically on both sides; date/timestamp group keys are emitted as ISO strings
and floating aggregates are rounded on BOTH sides so the driver's
order-insensitive value hash matches bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Parquet scan → pushdown + pruning come free.

    The logical plan (NOT the data) is memoized per (application, sf_dir,
    table): ``spark.read.parquet`` pays ~100 ms of file listing + footer
    schema read per call, which a table catalog resolves once — exactly
    what a metastore does for a real deployment. Laziness is unchanged;
    every query still scans parquet with its own pushed filters.

    ``events.parquet`` stores TIMESTAMP(NANOS). pyspark 4.1 reads it
    natively as ``timestamp_ntz`` (micros, truncated), matching DuckDB's
    nanos→micros truncation — so on this runtime the block below is a
    no-op kept for older 4.x runtimes, where the vectorized reader
    rejects NANOS unless the legacy conf exposes the raw int64 (then
    truncated in-plan with integer ``div``, never a double division,
    which would lose precision above 2^53).
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if len(_TABLE_CACHE) > 512:  # stopped-session leak guard; never hit in practice
        _TABLE_CACHE.clear()
    _TABLE_CACHE[key] = df
    return df


@dataclass
class QueryDef:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
):
    """Decorator registering a corpus query under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(
            name=name, spark_fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False

# Driver-window layout contract
# -----------------------------
# The external driver verifies the FIRST ~50 registration positions each
# round, so registration order is load-bearing. Historically it was the
# module import order below; since round 6 the window is DECLARED here:
# after all modules register, ``_ensure_loaded`` rebuilds ``REGISTRY`` so
# ``WINDOW`` occupies positions 0..len(WINDOW)-1 verbatim and every other
# query keeps its original relative (import) order after it. A name in
# ``WINDOW`` that no module registered raises at load time — a typo can't
# silently shift the window. ``tests/test_registry_layout.py`` asserts the
# exact positions of the rotated queries.
#
# Round-13 window (VERDICT r12 tasks 1/2/3): positions 0-1 are the two
# queries registered this round (perceptual-hash image dedup, per-group
# Efraimidis-Spirakis weighted sampling — never driver-verified);
# positions 2-49 are the FULL 48-query cohort whose latest driver row
# is r10 (the staleness frontier per the CORRECTNESS_r01-r12 union) —
# after this round the union has nothing staler than r11. The two r12
# bench weak-list entrants (json_props_rollup, topk_per_group) are NOT
# here: their driver rows are r12-fresh (CORRECTNESS_r12 green); their
# replicates are clean-floor bench recordings, not window slots.
# Deferred rotation debt for r14: decontaminate_bloom_prefilter's plan
# changed this round (Bloom word NULL→0 coalesce, ADVICE r12; eval-side
# exchange fold, VERDICT r12 task 5) and the two e2e pipelines'
# broadcast hints moved to their join sites — all re-verified green vs
# the oracle at sf0.001/0.01/0.1 locally (the pipelines' physical plans
# are byte-identical per the PLANS.md regen diff), but the 50 slots are
# exhausted by the cohort + new registrations. r14 window: bloom at the
# head + the 48-query r11-stale cohort (which already contains both
# pipelines and dedup_cluster_assign) = 49, leaving ONE slot for an r14
# registration.
WINDOW: tuple[str, ...] = (
    # -- registered this round, never driver-verified --
    "multimodal_phash_dedup",
    "weighted_sample_by_group",
    # -- last driver row r10 (the full stale cohort, 48 queries) --
    "asof_join_last_view",
    "chunk_dedup_ratio",
    "cooccurrence_pairs",
    "corr_pearson",
    "count_distinct_users",
    "cube_priority_status",
    "dates_except",
    "dedup_keep_first",
    "grouped_quantiles",
    "heatmap_pivot",
    "hourly_profile",
    "html_boilerplate_strip",
    "join_dims_broadcast",
    "join_fact_orders",
    "last_per_group",
    "mean_impute_group",
    "missing_days_anti",
    "mode_event_type",
    "monthly_rollup",
    "moving_avg_7d",
    "multimodal_fake_decode",
    "multimodal_frame_sample",
    "ols_by_group",
    "ols_ci_frame",
    "ols_closed_form",
    "pivot_eav",
    "problem_rows",
    "quality_daily",
    "quality_report",
    "quantiles_exact",
    "regexp_normalize",
    "resample_hourly_daily",
    "revenue_share",
    "rollup_revenue",
    "sample_hash_mod",
    "scalar_stats",
    "semi_join_customers",
    "sessionize_gap",
    "skew_salted_agg",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "ts_daily_rollup",
    "tumbling_window_rollup",
    "unit_convert_project",
    "unpivot_measures",
    "user_journey_path",
    "weekday_profile",
)


def _ensure_loaded() -> None:
    """Import all corpus modules (each registers its queries on import),
    then reorder ``REGISTRY`` per the ``WINDOW`` layout contract above."""
    global _LOADED
    if _LOADED:
        return
    from us_weather_energy_analysis_pipeline_spark.corpus import (  # noqa: F401
        advanced_q,
        dedup_q,
        sampling_q,
        text_q,
        pipeline_q,
        sketch_q,
        similarity_q,
        distrib_q,
        sql_q,
        mm_stream_q,
        behavior_q,
        tpch_more_q,
        core,
        windows,
        pivot_q,
        quality_q,
        stats_q,
        spine_q,
        winnow_q,
        corpstats_q,
        cleanse_q,
    )

    missing = [n for n in WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"WINDOW names never registered: {missing}")
    ordered = {n: REGISTRY[n] for n in WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True


def register_corpus_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view so users can run
    arbitrary ``spark.sql`` over the same data the DataFrame API sees
    (the SQL front-end the reference never had)."""
    _ensure_loaded()
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
