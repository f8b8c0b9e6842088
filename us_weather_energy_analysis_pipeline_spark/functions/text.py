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
    return F.expr(ordered_pairs_sql(arr_col, a_name, b_name))


def ordered_pairs_sql(arr_col: str, a_name: str, b_name: str) -> str:
    """SQL text of :func:`ordered_pairs` — for plans composed as a single
    ``spark.sql`` statement (the r11 one-parse build discipline)."""
    return (
        f"flatten(transform({arr_col}, (x, i) -> "
        f"transform(slice({arr_col}, i + 2, size({arr_col})), "
        f"y -> struct(x AS {a_name}, y AS {b_name}))))"
    )


def explode_pairs(df, arr_col: str, a_name: str, b_name: str):
    """All ordered pairs (``a = arr[i]``, ``b = arr[j]``, i < j) of a
    SORTED, duplicate-free array column, as two element-typed columns —
    the CODEGEN form of ``explode(ordered_pairs(...))`` (r14).

    Two chained ``posexplode`` Generates run inside whole-stage codegen,
    while the nested ``transform()`` lambdas of :func:`ordered_pairs`
    evaluate INTERPRETED per element (the r10 janino/HOF trap) — the
    interleaved A/B on the ngram posting lists measured the Generate
    form ~17% faster on the full query at sf0.1 (BENCH_AB r14). Same
    pair set, same (smaller, larger) orientation from the sorted input;
    only the emitted row order differs (consumers aggregate)."""
    return (
        df.selectExpr(f"{arr_col} AS _arr", f"posexplode({arr_col}) AS (_i, {a_name})")
        .selectExpr(
            a_name,
            f"posexplode(slice(_arr, _i + 2, size(_arr))) AS (_j, {b_name})",
        )
        .select(a_name, b_name)
    )


def lateral_pairs_sql(from_clause: str, arr_col: str, a_name: str, b_name: str) -> str:
    """SQL-text twin of :func:`explode_pairs` — a FROM fragment chaining
    two LATERAL VIEW posexplodes, for single-statement plans."""
    return (
        f"{from_clause}\n"
        f"      LATERAL VIEW posexplode({arr_col}) _pa AS _i, {a_name}\n"
        f"      LATERAL VIEW posexplode(slice({arr_col}, _i + 2, size({arr_col})))"
        f" _pb AS _j, {b_name}"
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


def token_stats_features(d, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document token statistics — (id, n_words, n_distinct, top_n,
    alpha_len, len_all) — as ONE vectorized ``mapInPandas`` pass.

    Replaces the interpreted sort+run-length HOF fold of
    :func:`top_token_count` in the hot scan queries (r10): HOF lambdas
    evaluate interpreted (~µs per array element), and the fold was the
    entire data cost of ``gopher_quality_filter`` /
    ``text_repetition_ratio`` (0.71 s / 0.5 s of a 1-job scan at sf0.1).
    Here every batch tokenizes in C (str.translate + split), and the
    distinct/top-count reduction is one ``pd.factorize`` +
    ``np.unique`` over the flat token stream — no Python per-token loop.
    Zero shuffle, same single-stage shape.

    Exact cross-engine parity contracts (all oracle- and fuzz-pinned):
    tokenization is trim-spaces-only (``.strip(' ')`` — Spark ``trim``
    removes 0x20 only), :data:`ASCII_UP`→:data:`ASCII_LO` translate,
    split on a single space keeping empty tokens; ``top_n`` counts the
    most frequent token EXACTLY (the JVM form's xxhash64 pre-hash could
    merge colliding tokens at ~n²/2⁶⁵ odds — this is strictly closer to
    the string-keyed oracle); ``alpha_len``/``len_all`` count code
    points (Python ``len`` ≡ Spark ``length``), alpha = ``[a-zA-Z ]``
    via C-level ``str.translate`` deletion. NULL/NaN ``text`` rows are
    skipped in-kernel (emitting nothing — the same row set an
    ``isNotNull`` pre-filter yields, which both corpus consumers also
    push down as part of their oracle row-set contract)."""
    from pyspark.sql import functions as _F

    proj = d.select(_F.col(id_col).alias("_id"), _F.col(text_col).alias("_t"))
    # NOTE on parallelism: a small parquet table arrives as ONE scan
    # partition, so at bench scale the kernel runs on one core — a
    # round-robin fan-out was A/B'd and REJECTED (the extra exchange +
    # job cost more than the ~0.13 s single-thread kernel body saves;
    # at real scale the scan is many-partitioned and the kernel
    # parallelizes for free).
    schema = (
        f"{id_col} long, n_words long, n_distinct long, top_n long,"
        " alpha_len long, len_all long"
    )
    lower_map = str.maketrans(ASCII_UP, ASCII_LO)
    drop_alpha = str.maketrans(
        "", "", ASCII_UP + ASCII_LO + " "
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            # NULL/NaN text rows emit nothing — the same row set a
            # caller-side isNotNull filter produces, so a consumer that
            # forgets the filter gets the oracle's row-set contract
            # instead of an executor TypeError (ADVICE r10).
            if len(pdf):
                mask = pdf["_t"].notna().to_numpy()
                if not mask.all():
                    pdf = pdf[mask].reset_index(drop=True)
            n = len(pdf)
            if not n:
                continue
            texts = pdf["_t"]
            n_words = np.empty(n, dtype=np.int64)
            alpha_len = np.empty(n, dtype=np.int64)
            len_all = np.empty(n, dtype=np.int64)
            toks_all = []
            for j in range(n):
                t = texts.iloc[j]
                len_all[j] = len(t)
                alpha_len[j] = len(t) - len(t.translate(drop_alpha))
                toks = t.strip(" ").translate(lower_map).split(" ")
                n_words[j] = len(toks)
                toks_all.append(toks)
            total = int(n_words.sum())
            flat = np.empty(total, dtype=object)
            pos = 0
            for toks in toks_all:
                flat[pos : pos + len(toks)] = toks
                pos += len(toks)
            codes, uniques = pd.factorize(flat)
            ncodes = max(len(uniques), 1)
            rows_rep = np.repeat(np.arange(n, dtype=np.int64), n_words)
            key = rows_rep * np.int64(ncodes) + codes
            uniq, counts = np.unique(key, return_counts=True)
            urow = (uniq // ncodes).astype(np.int64)
            n_distinct = np.bincount(urow, minlength=n).astype(np.int64)
            top_n = np.zeros(n, dtype=np.int64)
            np.maximum.at(top_n, urow, counts)
            yield pd.DataFrame(
                {
                    id_col: pdf["_id"].to_numpy(),
                    "n_words": n_words,
                    "n_distinct": n_distinct,
                    "top_n": top_n,
                    "alpha_len": alpha_len,
                    "len_all": len_all,
                }
            )

    return proj.mapInPandas(gen, schema)
