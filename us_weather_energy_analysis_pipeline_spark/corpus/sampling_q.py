"""Corpus sampling & packing — the selection stages of a training-data
pipeline: deterministic stratified sampling (mix weighting), composite
quality filtering (Gopher-style rules with reason flags), and
concat-and-chunk token packing (how pretraining actually batches
documents into fixed token budgets).

All native Column expressions; sampling hashes are md5-based so both
engines select identical rows (no RNG, reproducible across reruns and
engines — the property a production sampler needs for auditability).

Reference parity: the reference has no sampling/selection stage at all
(its pipeline loads everything, `src/pipeline.py:11-111`); this is the
LLM-training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql, r4
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register
from us_weather_energy_analysis_pipeline_spark.functions.text import (
    ascii_lower,
    ws_token_count,
)

# per-language sampling percentage (0-100): the mix-weighting table a
# blend job derives from corpus_mix_summary
SAMPLE_PCT = {"en": 60, "de": 35, "fr": 35}
DEFAULT_PCT = 20

_HEX = "0123456789abcdef"


def _hash_pct_sql() -> str:
    """DuckDB twin of the Spark bucket expr: first 4 hex digits of
    md5(doc_id) → int → mod 100."""
    hv = " + ".join(
        f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({hv}) % 100)"


def _pct_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(SAMPLE_PCT.items())
    )
    return f"CASE {whens} ELSE {DEFAULT_PCT} END"


@register(
    "stratified_sample_hash",
    oracle=f"""
    WITH hashed AS (
      SELECT lang, {_hash_pct_sql()} AS bucket,
             {_pct_case_sql()} AS pct
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE bucket < pct) AS n_sampled,
           ROUND(COUNT(*) FILTER (WHERE bucket < pct) * 1.0 / COUNT(*), 4)
             AS achieved_rate
    FROM hashed GROUP BY lang
    """,
    tags=("sampling", "stratified", "deterministic"),
)
def stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: each document's md5 bucket
    (0-99) is compared against its language's target percentage — a pure
    map-side predicate, no shuffle until the per-stratum audit counts.
    Hash-based selection (vs rand()) is reproducible across engines,
    reruns, and retries — the auditability property a corpus-mixing job
    needs. Returns the per-stratum audit table."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    pct = F.lit(DEFAULT_PCT)
    for k, v in sorted(SAMPLE_PCT.items()):
        pct = F.when(F.col("lang") == k, F.lit(v)).otherwise(pct)
    hashed = d.select("lang", bucket.alias("bucket"), pct.alias("pct"))
    return hashed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("bucket") < F.col("pct"), 1)).alias("n_sampled"),
        r4(
            F.count(F.when(F.col("bucket") < F.col("pct"), 1))
            / F.count(F.lit(1))
        ).alias("achieved_rate"),
    )


MIN_WORDS, MAX_WORDS = 5, 100_000
MAX_TOP_WORD_RATIO = 0.2
MIN_ALPHA_RATIO = 0.6


@register(
    "gopher_quality_filter",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS n_words,
             len(list_distinct(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '))) AS n_distinct,
             length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) * 1.0
               / GREATEST(length(text), 1) AS alpha_ratio
      FROM documents
    ),
    top_w AS (
      SELECT doc_id, MAX(cnt) * 1.0 / SUM(cnt) AS top_ratio
      FROM (
        SELECT doc_id, word, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS word
              FROM documents)
        GROUP BY doc_id, word
      ) GROUP BY doc_id
    )
    SELECT m.doc_id,
           CAST(m.n_words < {MIN_WORDS} OR m.n_words > {MAX_WORDS} AS INTEGER)
             AS fail_length,
           CAST(t.top_ratio > {MAX_TOP_WORD_RATIO} AS INTEGER) AS fail_repetition,
           CAST(m.alpha_ratio < {MIN_ALPHA_RATIO} AS INTEGER)  AS fail_alpha,
           CAST(NOT (m.n_words < {MIN_WORDS} OR m.n_words > {MAX_WORDS})
                AND NOT t.top_ratio > {MAX_TOP_WORD_RATIO}
                AND NOT m.alpha_ratio < {MIN_ALPHA_RATIO} AS INTEGER) AS keep
    FROM m JOIN top_w t ON m.doc_id = t.doc_id
    """,
    tags=("text", "quality", "filter", "gopher"),
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher-style quality rules with per-rule reason flags
    (length bounds, top-word repetition share, alphabetic ratio) and the
    final keep decision — the reasons column is what lets a pipeline
    audit WHY documents were dropped. Zero shuffle: every metric is an
    array/regexp expression evaluated per row in one stage.

    Features come from the vectorized ``token_stats_features`` kernel
    (r10): the previous JVM sort+run-length HOF fold evaluated
    interpreted and was this 1-job scan's entire 0.71 s data cost at
    sf0.1 — the kernel tokenizes in C and reduces the token stream with
    one factorize+unique, same zero-shuffle single-stage shape."""
    from us_weather_energy_analysis_pipeline_spark.functions.text import (
        token_stats_features,
    )

    # NULL text is out of scope, explicitly on BOTH engines: the oracle's
    # inner join against the per-doc token aggregate drops such docs
    # (unnest of a NULL split emits no rows), while a NULL-text row
    # would otherwise be silently flagged fail_length — the pushed-down
    # not-null filter aligns the row sets.
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # keep derives from the FAIL COLUMNS, not from re-stating the fail
    # expressions (re-stating would re-evaluate every feature per row).
    # ONE spark.sql statement over the kernel's output (r11 build cut).
    return spark.sql(
        f"""
        SELECT doc_id, fail_length, fail_repetition, fail_alpha,
               CAST(fail_length = 0 AND fail_repetition = 0
                    AND fail_alpha = 0 AS INT) AS keep
        FROM (
          SELECT doc_id,
                 CAST(n_words < {MIN_WORDS} OR n_words > {MAX_WORDS} AS INT)
                   AS fail_length,
                 CAST(CAST(top_n AS DOUBLE) / n_words > {MAX_TOP_WORD_RATIO}D
                   AS INT) AS fail_repetition,
                 CAST(CAST(alpha_len AS DOUBLE) / greatest(len_all, 1)
                      < {MIN_ALPHA_RATIO}D AS INT) AS fail_alpha
          FROM {{feat}}
        )
        """,
        feat=token_stats_features(d),
    )


PACK_BUDGET = 1024  # tokens per pack


@register(
    "token_budget_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tokens)
                        / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT source, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM packed GROUP BY source, pack_id
    """,
    tags=("packing", "tokens", "window"),
)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk token packing — the way pretraining actually
    batches documents: within each source stream (ordered by doc_id),
    a document's pack is its cumulative START offset div the budget.
    One window partitioned BY SOURCE (each stream sorts independently —
    parallel across sources; a single 100 TB source would be sub-sharded
    first, e.g. by hash(doc_id) ranges, exactly like the range-binned
    rank in operators/rank.py). Returns per-pack audit counts."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", ws_token_count("text").alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.select(
        "source",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / float(PACK_BUDGET)
        ).alias("pack_id"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


# Efraimidis–Spirakis weighted sampling: k docs drawn with probability
# proportional to weight, via the exponential-jumps key -ln(u)/w (the
# smallest k keys ARE the weighted sample). u derives from md5(doc_id):
# 12 hex digits parsed to an integer-valued double (< 2^53, exact),
# +0.5, divided by 16^12 = 2^48 — a POWER OF TWO, so u is bit-identical
# across engines with no rounding step. The weight is a deterministic
# synthetic (1 + length % 97): the corpus has no weight column, and an
# exact integer weight keeps the only libm call in the chain the single
# ln(u). Sample size:
WSAMPLE_K = 64
_U_SCALE = 16**12  # = 2^48


def _hex12_int_duck(e: str) -> str:
    """First 12 hex digits of md5(e) as an exact integer-valued double
    (DuckDB side; Spark uses conv(...,16,10))."""
    return " + ".join(
        f"(strpos('{_HEX}', substr(md5({e}), {i + 1}, 1)) - 1) * {16 ** (11 - i)}.0"
        for i in range(12)
    )


@register(
    "weighted_sample_aexpj",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             CAST(1 + (length(text) % 97) AS DOUBLE) AS w,
             -ln(({_hex12_int_duck('CAST(doc_id AS VARCHAR)')} + 0.5)
                 / {_U_SCALE}.0) AS neg_ln_u
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
    )
    SELECT doc_id, lang, w,
           ROUND(neg_ln_u / w, 6) AS es_key
    FROM keyed
    ORDER BY neg_ln_u / w, doc_id
    LIMIT {WSAMPLE_K}
    """,
    tags=("sampling", "weighted", "reservoir", "deterministic"),
)
def weighted_sample_aexpj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES,
    exponential-jumps form): each doc gets key = -ln(u)/w and the
    {WSAMPLE_K} SMALLEST keys are a sample where inclusion probability
    is proportional to w — the training-mix primitive for "sample docs
    proportional to quality/size weight", deterministic and
    reproducible because u is hash-derived, not RNG state.

    Cross-engine exactness: u is EXACT and bit-identical (integer-valued
    double + 0.5, divided by 2^48); the single ln() is the only libm
    call, so key order can differ only on ~1-ulp coincidences between
    two docs' keys — probability ~n²·2⁻⁵², with a doc_id tie-break
    making equal keys deterministic anyway. es_key is emitted through
    the dround twin (the corpus display-rounding contract; DuckDB's
    native ROUND is already the binary form); the ORDER BY runs on the
    raw key. Rows with a NULL doc_id (no hash) or NULL text (no
    weight) are out of scope on BOTH engines — the engines disagree on
    NULL sort placement (Spark FIRST, DuckDB LAST), so such rows must
    never reach the bottom-k sort; the null-injection fuzz pins this.

    Scale shape: ORDER BY key LIMIT k plans as TakeOrderedAndProject —
    per-partition bottom-k with an associative merge (the distributed
    form of the A-ES reservoir), no global sort, no shuffle of the
    corpus."""
    d = load(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        WITH keyed AS (
          SELECT doc_id, lang,
                 CAST(1 + (length(text) % 97) AS DOUBLE) AS w,
                 -ln((CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12),
                                16, 10) AS DOUBLE) + 0.5)
                     / {_U_SCALE}.0D) AS neg_ln_u
          FROM {{docs}}
          WHERE doc_id IS NOT NULL AND text IS NOT NULL
        )
        SELECT doc_id, lang, w,
               {dround_sql('neg_ln_u / w', 6)} AS es_key
        FROM keyed
        ORDER BY neg_ln_u / w, doc_id
        LIMIT {WSAMPLE_K}
        """,
        docs=d,
    )


# Per-group (stratified) variant: k docs PER LANGUAGE, weighted within the
# group — the form a training-mix job actually runs ("16 best-weighted docs
# from each language"). Same A-ES key, same bit-exact u.
WSAMPLE_GROUP_K = 16


@register(
    "weighted_sample_by_group",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, doc_id,
             CAST(1 + (length(text) % 97) AS DOUBLE) AS w,
             -ln(({_hex12_int_duck('CAST(doc_id AS VARCHAR)')} + 0.5)
                 / {_U_SCALE}.0) AS neg_ln_u
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
    )
    SELECT lang,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY neg_ln_u / w, doc_id) AS INTEGER) AS rnk,
           doc_id, w,
           ROUND(neg_ln_u / w, 6) AS es_key
    FROM keyed
    QUALIFY rnk <= {WSAMPLE_GROUP_K}
    """,
    tags=("sampling", "weighted", "stratified", "window", "deterministic"),
)
def weighted_sample_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group weighted sampling without replacement: the
    {WSAMPLE_GROUP_K} smallest Efraimidis–Spirakis keys PER LANGUAGE —
    the stratified training-mix primitive ("k docs from each stratum,
    weighted"), vs ``weighted_sample_aexpj``'s single global reservoir.
    Key, weight, and the bit-exact hash-derived u are identical to the
    global variant (see its docstring for the exactness argument); NULL
    doc_id / NULL text rows are excluded on BOTH engines before any
    ordering (Spark sorts NULLs first, DuckDB last). A NULL lang is a
    GROUP, not an order key — both engines pool window-partition NULLs —
    so it needs no exclusion.

    Scale shape: the naive form is one window partitioned by lang —
    n_langs partitions, so the full corpus funnels into a handful of
    sort tasks (the skew that kills grouped top-k at 100 TB, same
    adjudication as ``topk_per_group``). Phase 1 prunes each Arrow batch
    to its per-lang bottom-k in-task — lossless, since a group's global
    bottom-k is a subset of the union of batch bottom-k's — so the lang
    window ranks ≤ k × n_batches survivors; the corpus itself never
    shuffles. Reference parity: the reference has no sampling stage at
    all (`src/pipeline.py:11-111`); this is the LLM-training-data
    extension surface."""
    return weighted_sample_by_group_from(load(spark, sf_dir, "documents"))


def weighted_sample_by_group_from(d: DataFrame) -> DataFrame:
    """The ``weighted_sample_by_group`` plan over an arbitrary
    (doc_id, lang, text) frame — exposed for the training-side scale
    probe, mirroring ``decontaminate_bloom_from``."""
    spark = d.sparkSession
    keyed = spark.sql(
        f"""
        SELECT lang, doc_id, w, neg_ln_u / w AS es
        FROM (
          SELECT lang, doc_id,
                 CAST(1 + (length(text) % 97) AS DOUBLE) AS w,
                 -ln((CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12),
                                16, 10) AS DOUBLE) + 0.5)
                     / {_U_SCALE}.0D) AS neg_ln_u
          FROM {{docs}}
          WHERE doc_id IS NOT NULL AND text IS NOT NULL
        )
        """,
        docs=d,
    )

    def prune(batches):
        for pdf in batches:
            if len(pdf):
                # exact batch-local twin of the window ordering (es asc,
                # doc_id asc; both non-null by the pushed filter);
                # dropna=False keeps a NULL lang as its own group,
                # matching Window.partitionBy's NULL pooling
                yield (
                    pdf.sort_values(["es", "doc_id"])
                    .groupby("lang", sort=False, dropna=False)
                    .head(WSAMPLE_GROUP_K)
                )

    cand = keyed.mapInPandas(
        prune, "lang string, doc_id long, w double, es double"
    )
    return spark.sql(
        f"""
        SELECT lang, rnk, doc_id, w, {dround_sql('es', 6)} AS es_key
        FROM (
          SELECT lang, doc_id, w, es,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY es, doc_id) AS rnk
          FROM {{cand}}
        )
        WHERE rnk <= {WSAMPLE_GROUP_K}
        """,
        cand=cand,
    )
