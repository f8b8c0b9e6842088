"""operators.cache tracking — the persist/temp-view discipline the r14
shared-subtree optimizations depend on.

The load-bearing property: a subtree persisted via ``track_view`` and
referenced BY VIEW NAME inside later ``spark.sql`` text keeps its
InMemoryRelation substitution (both consumers read the cache), whereas
Spark 4.1's parameterized ``spark.sql(..., x=df)`` silently UNCACHES a
persisted argument during analysis — the regression that made the r14
batch-1 persists no-ops. These tests pin OUR API's behavior, not the
upstream bug."""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.operators import cache


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_track_view_substitutes_cache_in_sql_consumers(spark):
    base = spark.range(0, 1000).selectExpr("id", "id % 7 AS k")
    name = cache.track_view(
        base.groupBy("k").count(), prefix="_test_tracked"
    )
    try:
        # two references in one statement: both must read the cache, and
        # the underlying aggregate subtree must appear ONCE (as the
        # cached plan), not once per reference
        q = spark.sql(
            f"SELECT a.k, a.count + b.count AS s FROM {name} a "
            f"JOIN {name} b ON a.k = b.k"
        )
        p = _plan(q)
        assert "InMemoryTableScan" in p
        # no un-cached re-execution of the aggregate: every scan of the
        # base range sits under the (shared) cached plan, so the main
        # tree contains no bare Range/HashAggregate outside IMTS details
        head = p.split("\n\n", 1)[0]  # the tree section
        assert "InMemoryTableScan" in head
        # results unchanged by the substitution
        assert q.count() == 7
    finally:
        cache.release_all()


def test_release_all_drops_views_and_persists(spark):
    base = spark.range(0, 100).selectExpr("id", "id % 3 AS k")
    df = base.groupBy("k").count()
    name = cache.track_view(df, prefix="_test_release")
    assert spark.catalog.tableExists(name)
    assert df.storageLevel.useMemory
    cache.release_all()
    assert not spark.catalog.tableExists(name)
    assert not df.storageLevel.useMemory


def test_track_view_names_are_unique(spark):
    a = spark.range(3)
    n1 = cache.track_view(a, prefix="_test_uniq")
    n2 = cache.track_view(spark.range(4), prefix="_test_uniq")
    try:
        assert n1 != n2
        assert spark.sql(f"SELECT count(1) AS c FROM {n2}").collect()[0].c == 4
    finally:
        cache.release_all()
