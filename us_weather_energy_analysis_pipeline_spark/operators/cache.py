"""Session-lifetime tracking for operator-internal ``persist()`` calls.

Several operators persist a mid-plan DataFrame that MULTIPLE downstream
branches read (rank's keyed input, ngram-dedup's capped shingle index,
minhash signatures). Spark's static/AQE exchange reuse does NOT reliably
collapse those branches (measured: the ngram self-join re-executed its
index subtree per branch), so an explicit persist is the right plan —
but an operator cannot know when the CALLER's action is done, so eager
unpersist inside the operator would just force a recompute.

The contract: operators register their persisted handles via
:func:`track`; loop drivers (bench.py, scripts/verify_local.py, test
fixtures) call :func:`release_all` between queries. A long-lived
application that never calls it degrades gracefully to Spark's LRU block
eviction — the same behavior as before tracking existed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` (if not already) and register it for later
    :func:`release_all`. Returns the same DataFrame for chaining."""
    df.persist()
    _PERSISTED.append(df)
    return df


def release_all() -> None:
    """Unpersist every tracked DataFrame. Safe once the caller's action
    has completed; later re-execution recomputes instead of reading
    cache."""
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
