"""Driver-window layout contract (VERDICT r5 items 1 + 10).

The external correctness driver samples the FIRST ~50 registration
positions of ``registry.queries()`` each round, so registration order is
load-bearing. ``registry.WINDOW`` declares the current round's window
explicitly; these tests pin it so a module refactor or import-order
change can't silently rotate a query out of the verified set.
"""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus import registry

# Round-7 must-haves: the r6 red row (doc_span_dup_ratio, oracle dtype
# fixed this round), the four queries whose last driver row is r03, and
# the three whose plans the r6 ADVICE fixes touched.
ROTATED_R7 = (
    "doc_span_dup_ratio",
    "multimodal_fake_decode",
    "multimodal_frame_sample",
    "sessionize_gap",
    "tumbling_window_rollup",
    "cooccurrence_pairs",
    "quantiles_exact",
    "grouped_quantiles",
    "mode_event_type",
)


def test_window_occupies_leading_positions():
    order = list(registry.queries())
    assert order[: len(registry.WINDOW)] == list(registry.WINDOW)


def test_rotated_r7_sit_in_driver_window():
    positions = {n: i for i, n in enumerate(registry.queries())}
    stragglers = {
        n: positions.get(n) for n in ROTATED_R7 if positions.get(n, 99) >= 50
    }
    assert not stragglers, f"outside driver window (first 50): {stragglers}"
    assert list(registry.WINDOW[: len(ROTATED_R7)]) == list(ROTATED_R7)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(registry.WINDOW)) == len(registry.WINDOW)
    names = set(registry.queries())
    assert set(registry.WINDOW) <= names
    # every rotated query stays oracle-twinned
    oracles = registry.oracle_sql()
    missing = [n for n in ROTATED_R7 if n not in oracles]
    assert not missing, f"rotated queries lost their oracle twin: {missing}"


def test_registry_complete_128():
    assert len(registry.queries()) >= 128
