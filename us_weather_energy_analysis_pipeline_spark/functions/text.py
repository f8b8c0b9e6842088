"""Array/text column helpers shared by the corpus-quality queries.

Pure Column expressions — no shuffle, no Python execution. HOF lambdas
(``transform``/``filter``/``aggregate``) evaluate interpreted per element
in Spark, so per-row big-O matters more than it would in codegen: the
helpers here pick the lowest-complexity formulation (measured, not
assumed — see ``gopher_quality_filter``'s docstring).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def top_token_count(toks: Column) -> Column:
    """Count of the most frequent element in ``toks`` (int).

    sort + run-length: one ``array_sort`` then a single aggregate fold
    tracking (prev, current-run, best-run) — O(n log n) per row. The
    naive per-distinct-token recount (``transform(array_distinct(t),
    w -> size(filter(t, == w)))``) is O(n_distinct·n) with interpreted
    lambdas and measured 2.6× slower on 54-word docs at sf0.1; the gap
    widens with document length. Returns 0 for an empty array.

    Tokens are xxhash64-mapped to int64 BEFORE the sort+fold: the
    interpreted comparisons then work on fixed-width longs instead of
    strings — measured ~35% faster at sf0.1. Two distinct tokens sharing
    a hash would merge their runs (overcount), with probability
    ~n_distinct²/2⁶⁵ per document — vanishing, and the string-keyed
    DuckDB oracle doubles as the collision check at test SFs."""
    acc0 = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, w: Column) -> Column:
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    hashed = F.transform(toks, lambda w: F.xxhash64(w))
    return F.aggregate(F.array_sort(hashed), acc0, step, lambda a: a["best"])


def ws_token_count(col: Column | str) -> Column:
    """``size(split(col, ' '))`` as pure length arithmetic — a
    single-space split yields exactly (#spaces + 1) elements (empties
    included, identical in Spark's split(-1) and DuckDB's string_split),
    so the count needs no token-array materialization:
    ``length(col) − length(replace(col, ' ', '')) + 1``. Returns int."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.replace(c, F.lit(" "))) + 1


def ordered_pairs(arr_col: str, a_name: str, b_name: str) -> Column:
    """All ordered pairs (arr[i], arr[j]) with i < j from a SORTED,
    duplicate-free array column, as an array of structs
    ``(a_name, b_name)`` — expand with ``explode``.

    This is the map-side pair generation both posting-list dedup plans
    use (ngram inverted index, co-occurrence sets): nested transforms
    over ``slice(arr, i + 2, size(arr))`` (1-based slice start = the
    elements AFTER position i; an over-long slice length clamps). The
    caller guarantees sortedness (e.g. ``sort_array``) so the emitted
    pairs are already (smaller, larger)-oriented."""
    return F.expr(
        f"flatten(transform({arr_col}, (x, i) -> "
        f"transform(slice({arr_col}, i + 2, size({arr_col})), "
        f"y -> struct(x AS {a_name}, y AS {b_name}))))"
    )


ASCII_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LO = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column) -> Column:
    """ASCII-only lowercasing for dedup/fingerprint normalization.

    Full Unicode case folding is locale- and engine-dependent (JVM maps
    'İ' to 'i'+combining-dot and final 'Σ' context-sensitively;
    DuckDB's utf8proc does neither), so engine-native lower() makes
    content fingerprints ENGINE-SPECIFIC — found by the unicode fuzz.
    A translate over [A-Z] is bit-identical everywhere, and leaving
    non-ASCII untouched is the conventional choice for cross-system
    dedup normalization. SQL twin: :func:`ascii_lower_sql`."""
    return F.translate(col, ASCII_UP, ASCII_LO)


def ascii_lower_sql(expr: str) -> str:
    """The exact SQL twin of :func:`ascii_lower` — valid in both Spark
    SQL and DuckDB (same translate signature)."""
    return f"translate({expr}, '{ASCII_UP}', '{ASCII_LO}')"
