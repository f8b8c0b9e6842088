"""Unit semantics for the advanced corpus operators (inline fixtures):
gaps-and-islands streak detection, LOCF forward fill, two-pass z-score
moments, and full-outer reconciliation edges. The oracle gate
(test_corpus_oracle.py) covers the same queries end-to-end; these pin the
operator semantics on hand-checkable data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_streak_islands_inline(spark):
    """Days {1,2,3, 6, 8,9} → streaks [1-3]=3, [6]=1, [8-9]=2."""
    rows = [("u1", dt.date(2024, 1, d)) for d in (1, 2, 3, 6, 8, 9)]
    df = spark.createDataFrame(rows, "user_id string, day date")
    w = Window.partitionBy("user_id").orderBy("day")
    streaks = (
        df.withColumn("anchor", F.date_sub("day", F.row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(
            F.min("day").alias("s"),
            F.max("day").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    got = {(r["s"].day, r["e"].day, r["n"]) for r in streaks.collect()}
    assert got == {(1, 3, 3), (6, 6, 1), (8, 9, 2)}


def test_locf_forward_fill_inline(spark):
    """Nulls take the last prior non-null; leading nulls stay null."""
    rows = [(1, None), (2, 10.0), (3, None), (4, None), (5, 20.0), (6, None)]
    df = spark.createDataFrame(rows, "t int, v double")
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = df.select("t", F.last("v", ignorenulls=True).over(w).alias("f"))
    got = {r["t"]: r["f"] for r in filled.collect()}
    assert got == {1: None, 2: 10.0, 3: 10.0, 4: 10.0, 5: 20.0, 6: 20.0}


def test_zscore_two_pass_matches_direct(spark):
    """Broadcast moment formula (n, Σx, Σx²) equals stddev_samp z-score."""
    import math

    vals = [1.0, 2.0, 2.0, 3.0, 10.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    st = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    ).collect()[0]
    n, s, ss = st["n"], st["s"], st["ss"]
    mean = s / n
    std = math.sqrt((ss - s * s / n) / (n - 1))
    import statistics

    assert abs(mean - statistics.mean(vals)) < 1e-12
    assert abs(std - statistics.stdev(vals)) < 1e-12
    assert abs((10.0 - mean) / std - (10.0 - 3.6) / statistics.stdev(vals)) < 1e-12


def test_full_outer_keeps_both_unmatched(spark):
    a = spark.createDataFrame([(1, 10), (2, 20)], "k int, a int")
    b = spark.createDataFrame([(2, 200), (3, 300)], "k int, b int")
    out = (
        a.join(b, a.k == b.k, "full_outer")
        .select(
            F.coalesce(a.k, b.k).alias("k"),
            F.coalesce("a", F.lit(0)).alias("a"),
            F.coalesce("b", F.lit(0)).alias("b"),
        )
    )
    got = {(r["k"], r["a"], r["b"]) for r in out.collect()}
    assert got == {(1, 10, 0), (2, 20, 200), (3, 0, 300)}


def test_banded_range_join_assigns_every_row_once(spark):
    """Bands partition the domain → every fact matches exactly one band."""
    facts = spark.createDataFrame([(float(v),) for v in (5, 15, 25, 35)], "x double")
    bands = spark.createDataFrame(
        [("lo", 0.0, 20.0), ("hi", 20.0, 40.0)], "band string, lo double, hi double"
    )
    joined = facts.join(
        F.broadcast(bands), (facts.x >= bands.lo) & (facts.x < bands.hi)
    )
    assert joined.count() == 4
    got = dict(
        joined.groupBy("band").agg(F.count(F.lit(1)).alias("n")).collect()
    )  # rows -> (band, n)
    got = {r: n for r, n in got.items()}
    assert got == {"lo": 2, "hi": 2}


def test_grid_range_join_matches_inequality_join(spark):
    """Grid rewrite == plain theta join for boundary values, overlapping
    ranges (one fact, many ranges) and cell-straddling intervals, on both
    the broadcast and shuffled paths."""
    from pyspark.sql import functions as F

    from us_weather_energy_analysis_pipeline_spark.operators.rangejoin import (
        grid_range_join,
    )

    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 9, 10, 15, 99, 100, 101, 250, 999])],
        "fid long, v double",
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 100.0), ("wide", 5.0, 995.0), ("empty", 400.0, 400.0)],
        "band string, lo double, hi double",
    )
    want = {
        (r["fid"], r["band"])
        for r in facts.join(
            ranges, (facts.v >= ranges.lo) & (facts.v < ranges.hi)
        ).collect()
    }
    for bc in (True, False):
        got = {
            (r["fid"], r["band"])
            for r in grid_range_join(
                facts, "v", ranges, grid=7.0, broadcast_ranges=bc
            ).collect()
        }
        assert got == want, bc
    # these OVERLAPPING ranges must refuse the CASE-inline fast path
    # (a fact matching two bands can't come out of a single CASE) —
    # even with the threshold wide open the plan keeps a real join
    plan = (
        grid_range_join(facts, "v", ranges, grid=7.0, inline_threshold=64)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" in plan


def test_grid_range_join_inline_band_path(spark):
    """Non-overlapping tiny range sets take the driver-inline CASE path:
    identical rows to the theta join (boundaries, unmatched facts, null
    values, null/empty intervals dropped), and NO join in the plan."""
    from pyspark.sql import functions as F

    from us_weather_energy_analysis_pipeline_spark.operators.rangejoin import (
        grid_range_join,
    )

    facts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0.0, 9.99, 10.0, 55.5, 100.0, 400.0, None])],
        "fid long, v double",
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 100.0), ("c", 150.0, 300.0),
         ("nul", None, 999.0), ("empty", 7.0, 7.0)],
        "band string, lo double, hi double",
    )
    want = sorted(
        (r["fid"], r["band"], r["lo"], r["hi"])
        for r in facts.join(
            ranges, (facts.v >= ranges.lo) & (facts.v < ranges.hi)
        ).collect()
    )
    out = grid_range_join(facts, "v", ranges, grid=7.0)
    got = sorted((r["fid"], r["band"], r["lo"], r["hi"]) for r in out.collect())
    assert got == want and len(got) == 4
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "CASE" in plan
    # all-null/empty ranges: schema-preserving empty result, still no join
    degenerate = spark.createDataFrame(
        [("x", None, 5.0), ("y", 9.0, 9.0)], "band string, lo double, hi double"
    )
    empty = grid_range_join(facts, "v", degenerate, grid=7.0)
    assert empty.count() == 0
    assert empty.columns == out.columns


def test_ordered_pairs_helper(spark):
    """ordered_pairs must emit exactly the i<j combinations of a sorted
    array (the shared posting-list pair expansion): C(n,2) pairs, none
    reversed, empty below 2 elements."""
    from pyspark.sql import functions as F

    from us_weather_energy_analysis_pipeline_spark.functions.text import (
        ordered_pairs,
    )

    df = spark.createDataFrame(
        [(1, [10, 20, 30]), (2, [7]), (3, []), (4, [1, 2])],
        "k long, arr array<bigint>",
    )
    rows = (
        df.select("k", F.explode(ordered_pairs("arr", "a", "b")).alias("p"))
        .select("k", "p.a", "p.b")
        .collect()
    )
    got = {(r["k"], r["a"], r["b"]) for r in rows}
    assert got == {(1, 10, 20), (1, 10, 30), (1, 20, 30), (4, 1, 2)}


def test_cooccurrence_bitmask_matches_collect_set_plan(spark, sf_dir):
    """r6 bitmask rewrite: the bit_or/mask-rollup plan must emit exactly
    the pairs of the dictionary-free collect_set plan on real data."""
    from pyspark.sql import functions as F

    from us_weather_energy_analysis_pipeline_spark.corpus.behavior_q import (
        _cooccurrence_collect_set,
        cooccurrence_pairs,
    )
    from us_weather_energy_analysis_pipeline_spark.corpus.registry import load

    got = {
        (r["type_a"], r["type_b"]): r["n"]
        for r in cooccurrence_pairs(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events")
    base = e.select("user_id", F.to_date("ts").alias("day"), "event_type")
    want = {
        (r["type_a"], r["type_b"]): r["n"]
        for r in _cooccurrence_collect_set(base).collect()
    }
    assert got == want and len(got) > 0


def test_cooccurrence_fallback_guard_on_quoted_types(spark):
    """Types containing SQL-literal metacharacters must route to the
    dictionary-free plan (no injection into the embedded array literal)."""
    from us_weather_energy_analysis_pipeline_spark.corpus import behavior_q

    # simulate a poisoned dictionary via the memo cache for a fake sf_dir
    key = (spark.sparkContext.applicationId, "/nonexistent-quoted")
    behavior_q._TYPE_DICT_CACHE[key] = ["a'b", "plain"]
    try:
        # guard triggers before any table load of the fake dir would fail
        # only if the fallback path reads events — so point it at real data
        import conftest

        key2 = (spark.sparkContext.applicationId, conftest.SF_DIR)
        saved = behavior_q._TYPE_DICT_CACHE.get(key2)
        behavior_q._TYPE_DICT_CACHE[key2] = ["a'b", "plain"]
        try:
            out = behavior_q.cooccurrence_pairs(spark, conftest.SF_DIR)
            # fallback plan contains a collect_set aggregate, bitmask does not
            assert "collect_set" in out._jdf.queryExecution().analyzed().toString()
        finally:
            if saved is None:
                behavior_q._TYPE_DICT_CACHE.pop(key2, None)
            else:
                behavior_q._TYPE_DICT_CACHE[key2] = saved
    finally:
        behavior_q._TYPE_DICT_CACHE.pop(key, None)


def test_cooccurrence_stale_dictionary_fails_loudly(spark):
    """ADVICE r6: an event_type absent from the memoized dictionary must
    raise at execution (array_position = 0 would otherwise silently set
    bit 63 via shiftleft(1L, -1) and corrupt the co-occurrence mask)."""
    import conftest
    import pytest as _pt

    from us_weather_energy_analysis_pipeline_spark.corpus import behavior_q

    key = (spark.sparkContext.applicationId, conftest.SF_DIR)
    saved = behavior_q._TYPE_DICT_CACHE.get(key)
    # a stale dictionary: passes every plan-time guard but misses types
    # that exist in the data
    behavior_q._TYPE_DICT_CACHE[key] = ["view"]
    try:
        with _pt.raises(Exception, match="absent from memoized dictionary"):
            behavior_q.cooccurrence_pairs(spark, conftest.SF_DIR).collect()
    finally:
        if saved is None:
            behavior_q._TYPE_DICT_CACHE.pop(key, None)
        else:
            behavior_q._TYPE_DICT_CACHE[key] = saved


def test_mode_event_type_packed_matches_struct_fallback(spark):
    """r7 packed-long mode plan: identical output to the dictionary-free
    min_by-struct fallback on real data (the fallback is forced via a
    poisoned memo dictionary, same pattern as the cooccurrence guards)."""
    import conftest

    from us_weather_energy_analysis_pipeline_spark.corpus import advanced_q, behavior_q

    key = (spark.sparkContext.applicationId, conftest.SF_DIR)
    saved = behavior_q._TYPE_DICT_CACHE.get(key)
    want_df = advanced_q.mode_event_type(spark, conftest.SF_DIR)
    # the packed plan is the point: both aggregates must hash, not sort
    plan = want_df._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan, plan
    want = {tuple(r) for r in want_df.collect()}
    # quote-bearing dictionary forces the struct fallback
    behavior_q._TYPE_DICT_CACHE[key] = ["a'b"]
    try:
        got_df = advanced_q.mode_event_type(spark, conftest.SF_DIR)
        assert "min_by" in got_df._jdf.queryExecution().analyzed().toString()
        got = {tuple(r) for r in got_df.collect()}
    finally:
        if saved is None:
            behavior_q._TYPE_DICT_CACHE.pop(key, None)
        else:
            behavior_q._TYPE_DICT_CACHE[key] = saved
    assert got == want and len(got) > 0


def test_mode_event_type_stale_dictionary_fails_loudly(spark):
    """A type absent from the memoized dictionary must raise at execution
    rather than silently mis-rank (mirrors the cooccurrence guard)."""
    import conftest
    import pytest as _pt

    from us_weather_energy_analysis_pipeline_spark.corpus import advanced_q, behavior_q

    key = (spark.sparkContext.applicationId, conftest.SF_DIR)
    saved = behavior_q._TYPE_DICT_CACHE.get(key)
    behavior_q._TYPE_DICT_CACHE[key] = ["view"]
    try:
        with _pt.raises(Exception, match="absent from memoized dictionary"):
            advanced_q.mode_event_type(spark, conftest.SF_DIR).collect()
    finally:
        if saved is None:
            behavior_q._TYPE_DICT_CACHE.pop(key, None)
        else:
            behavior_q._TYPE_DICT_CACHE[key] = saved
