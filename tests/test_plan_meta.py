"""plan_meta gate semantics: the job-free driver-collectability probe.

The gate must bound BOTH bytes and decoded rows (parquet compression is
unbounded — ADVICE r5), and must detect row-expanding plan nodes
structurally instead of trusting the filter/project-only convention.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.operators.plan_meta import (
    _LARGE,
    SMALL_INPUT_BYTES,
    _plan_row_bounded,
    exact_scan_rows,
    input_bytes,
    input_rows,
    small_scan,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_input_rows_matches_footer_count(docs):
    assert input_rows(docs) == docs.count()


def test_input_rows_is_scan_level_not_plan_level(docs):
    # A filter cannot shrink the footer bound — rows() reports the scan.
    filtered = docs.filter(F.col("doc_id") < 5)
    assert input_rows(filtered) == input_rows(docs)


def test_input_rows_sentinel_for_local_frames(spark):
    df = spark.range(10)
    assert input_rows(df) == _LARGE
    assert input_bytes(df) == _LARGE


def test_exact_scan_rows_bare_scan_and_projection(docs):
    """ADVICE r8: footer rows are EXACT only for a bare scan — a column
    projection keeps exactness, anything that can change the row count
    (or a non-file input) answers None."""
    n = docs.count()
    assert exact_scan_rows(docs) == n
    assert exact_scan_rows(docs.select("doc_id", "text")) == n


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d.filter(F.col("doc_id") < 5),
        lambda d: d.limit(3),
        lambda d: d.select("doc_id").distinct(),
        lambda d: d.select(F.explode(F.split("text", " "))),
        lambda d: d.groupBy("lang").count(),
        lambda d: d.sample(0.5, seed=1),
    ],
)
def test_exact_scan_rows_refuses_row_changing_plans(docs, mutate):
    assert exact_scan_rows(mutate(docs)) is None


def test_exact_scan_rows_refuses_local_frames(spark):
    assert exact_scan_rows(spark.range(10)) is None


def test_plan_row_bounded_accepts_filter_project_agg(docs):
    plan = docs.filter(F.col("doc_id") > 3).select("doc_id").groupBy("doc_id").count()
    assert _plan_row_bounded(plan)


def test_plan_row_bounded_rejects_join(docs):
    joined = docs.alias("a").join(docs.alias("b"), "doc_id")
    assert not _plan_row_bounded(joined)


def test_plan_row_bounded_rejects_explode(docs):
    exploded = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    assert not _plan_row_bounded(exploded)


def test_plan_row_bounded_rejects_grouping_sets(docs):
    cube = docs.cube("lang").count()
    assert not _plan_row_bounded(cube)


def test_small_scan_row_gate(docs):
    n = docs.count()
    assert small_scan(docs, max_rows=n)
    # One row fewer than the footer count must fail the gate even though
    # the bytes are tiny — this is exactly the compression-bomb defense.
    assert not small_scan(docs, max_rows=n - 1)


def test_small_scan_rejects_expanding_plan_despite_small_files(docs):
    n = docs.count()
    joined = docs.alias("a").join(docs.alias("b"), "doc_id")
    assert not small_scan(joined, max_rows=10 * n)


def test_small_scan_byte_gate(docs):
    assert input_bytes(docs) < SMALL_INPUT_BYTES
    assert not small_scan(docs, max_rows=1 << 40, max_bytes=1)


def test_try_cast_prefix_guard_is_superset_of_try_cast(spark):
    """corpus/core.py guard (ADVICE r5): the rlike prefix class must admit
    every string Spark's string->double cast parses, including ISO
    control-char prefixes UTF8String.trimAll strips."""
    from us_weather_energy_analysis_pipeline_spark.session import local_df

    samples = [
        "\x1f1.5", "\x001", " 2.5", "\t-3", "{\"a\":1}", "abc",
        "\x071.25", "nan", "-inf", "\x1c3", "Infinity", ".5", "+7",
        "\x1e\x1f 4.25", "", None,
    ]
    df = local_df(spark, [(s,) for s in samples], "props string")
    out = df.select(
        F.when(
            F.col("props").rlike(r"^[\s\x00-\x1f]*[-+.0-9iInN]"),
            F.expr("try_cast(props as double)"),
        ).alias("guarded"),
        F.expr("try_cast(props as double)").alias("bare"),
    ).collect()
    for r in out:
        g, b = r["guarded"], r["bare"]
        same = (g == b) or (g != g and b != b)  # NaN-safe
        assert same, (g, b)


def test_small_scan_rejects_mixed_source_union(docs, spark):
    """ADVICE r6: a parquet scan unioned with a non-file source (Range)
    has non-empty inputFiles() while footer rows undercount the Range
    branch — the gate must reject it rather than under-bound the rows."""
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    u = ids.unionByName(spark.range(5).select(F.col("id").alias("doc_id")))
    assert not small_scan(u, max_rows=1 << 40)


def test_plan_row_bounded_ignores_benign_plan_text(docs):
    """ADVICE r7: substring tokens like 'Range'/'Union' used to match
    benign plan text (RepartitionByRange, capitalized identifiers inside
    expressions), silently downgrading small scans to the count-gated
    path. Node names are now matched at plan-tree line starts only."""
    # capitalized alias containing reject tokens appears inside Project's
    # expression list, not as a node name
    aliased = docs.select(
        F.col("doc_id").alias("RangeOfValues"),
        F.col("lang").alias("UnionLabel"),
    ).filter(F.col("RangeOfValues") > 0)
    assert _plan_row_bounded(aliased)
    # a range repartition neither expands rows nor hides a non-file leaf
    ranged = docs.repartitionByRange(4, "doc_id").select("doc_id")
    assert _plan_row_bounded(ranged)


def test_compact_parquet_target_arg_validation(spark, tmp_path):
    """ADVICE r7: target_files/target_bytes contract — both → error;
    neither → legacy default of 1 file; sentinel bytes → actionable error
    instead of a multi-billion-file repartition."""
    from us_weather_energy_analysis_pipeline_spark.operators.compact import (
        compact_parquet,
    )

    path = str(tmp_path / "t")
    spark.range(100).write.parquet(path)
    with pytest.raises(ValueError, match="at most one"):
        compact_parquet(spark, path, target_files=2, target_bytes=1 << 20)
    import os as _os

    assert compact_parquet(spark, path) == 100  # defaults to 1 file
    n_files = len(
        [f for f in _os.listdir(path) if f.endswith(".parquet")]
    )
    assert n_files == 1


def test_compact_parquet_sentinel_bytes_raises(spark, tmp_path, monkeypatch):
    from us_weather_energy_analysis_pipeline_spark.operators import compact, plan_meta
    from us_weather_energy_analysis_pipeline_spark.operators.compact import (
        compact_parquet,
    )

    path = str(tmp_path / "t2")
    spark.range(10).write.parquet(path)
    monkeypatch.setattr(plan_meta, "input_bytes", lambda df: plan_meta._LARGE)
    with pytest.raises(ValueError, match="cannot size target_files"):
        compact_parquet(spark, path, target_bytes=1 << 20)


def test_small_scan_rejects_local_relation_union(docs, spark):
    from us_weather_energy_analysis_pipeline_spark.session import local_df

    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    extra = local_df(spark, [(10_000_001,)], "doc_id long")
    u = ids.unionByName(extra)
    assert not small_scan(u, max_rows=1 << 40)
