"""Corpus-level statistics queries (registered after winnow_q — new
modules always go LAST so the driver's verification windows never
shift; see registry._ensure_loaded)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql, r4
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register
from us_weather_energy_analysis_pipeline_spark.functions.text import (
    ascii_lower,
    ascii_lower_sql,
)

ZIPF_TOP = 200

_TOKS_DUCK = (
    "string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
    " 'abcdefghijklmnopqrstuvwxyz'), ' ')"
)


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS_DUCK}) AS tok FROM documents
    ),
    freq AS (
      SELECT tok, COUNT(*) AS n FROM toks WHERE tok <> '' GROUP BY tok
    ),
    top AS (
      SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS r
      FROM freq
      QUALIFY r <= {ZIPF_TOP}
    ),
    fit AS (
      SELECT COUNT(*) AS m,
             SUM(ln(r))       AS sx,
             SUM(ln(n))       AS sy,
             SUM(ln(r)*ln(n)) AS sxy,
             SUM(ln(r)*ln(r)) AS sxx
      FROM top
    )
    SELECT m AS n_top,
           ROUND((m*sxy - sx*sy) / (m*sxx - sx*sx), 4)              AS zipf_slope,
           ROUND((sy - ((m*sxy - sx*sy) / (m*sxx - sx*sx)) * sx) / m, 4)
                                                                    AS zipf_intercept
    FROM fit WHERE m >= 2
    """,
    tags=("text", "corpus-stats", "zipf", "topk"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the documents corpus — see
    :func:`zipf_fit_from` for semantics and the 100 TB scale shape."""
    return zipf_fit_from(load(spark, sf_dir, "documents"))


def zipf_fit_from(d: DataFrame) -> DataFrame:
    """Zipf's-law fit over the corpus token rank-frequency curve: token
    counts → top-{ZIPF_TOP} by frequency (deterministic (n DESC, tok)
    total order) → closed-form OLS of ln(freq) on ln(rank). A healthy
    natural-language corpus fits slope ≈ −1; a strongly flatter or
    steeper tail is a standard data-quality smell (boilerplate floods /
    template spam) in training-data triage.

    Scale shape: one token-count groupBy (partial agg over the exploded
    scan), then the top-{ZIPF_TOP} via orderBy+limit — Spark plans
    TakeOrdered (per-partition heap + driver merge, NEVER a global
    sort), and the rank window runs on the bounded {ZIPF_TOP}-row
    result. The 4-dp round absorbs cross-engine ln() last-ulp drift
    (neither libm guarantees correctly-rounded transcendentals). On an
    empty corpus both engines produce an m=0 aggregate row that the
    m >= 2 guard removes — zero rows, no phantom."""
    # ONE spark.sql statement (r11 build cut — TakeOrdered + bounded
    # single-partition window plan unchanged, BENCH_AB.md r11)
    slope = "(m * sxy - sx * sy) / (m * sxx - sx * sx)"
    return d.sparkSession.sql(
        f"""
        WITH freq AS (
          SELECT tok, count(1) AS n
          FROM (SELECT explode(split({ascii_lower_sql('trim(text)')}, ' ')) AS tok
                FROM {{docs}})
          WHERE tok <> ''
          GROUP BY tok
        ),
        top AS (
          SELECT tok, n,
                 row_number() OVER (ORDER BY n DESC, tok ASC) AS r
          FROM (SELECT * FROM freq ORDER BY n DESC, tok ASC LIMIT {ZIPF_TOP})
        ),
        fit AS (
          SELECT count(1) AS m,
                 sum(ln(CAST(r AS DOUBLE))) AS sx,
                 sum(ln(CAST(n AS DOUBLE))) AS sy,
                 sum(ln(CAST(r AS DOUBLE)) * ln(CAST(n AS DOUBLE))) AS sxy,
                 sum(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx
          FROM top
        )
        SELECT m AS n_top,
               {dround_sql(slope, 4)} AS zipf_slope,
               {dround_sql(f'(sy - ({slope}) * sx) / m', 4)} AS zipf_intercept
        FROM fit WHERE m >= 2
        """,
        docs=d,
    )


@register(
    "text_heaps_fit",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_DUCK}) AS tok FROM documents
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_tok, COUNT(DISTINCT tok) AS n_typ
      FROM toks WHERE tok <> '' GROUP BY doc_id HAVING COUNT(*) >= 2
    ),
    fit AS (
      SELECT COUNT(*) AS m,
             SUM(ln(n_tok))            AS sx,
             SUM(ln(n_typ))            AS sy,
             SUM(ln(n_tok)*ln(n_typ))  AS sxy,
             SUM(ln(n_tok)*ln(n_tok))  AS sxx
      FROM per_doc
    )
    SELECT m AS n_docs,
           ROUND((m*sxy - sx*sy) / (m*sxx - sx*sx), 4)              AS heaps_beta,
           ROUND(exp((sy - ((m*sxy - sx*sy) / (m*sxx - sx*sx)) * sx) / m), 4)
                                                                    AS heaps_k
    FROM fit WHERE m >= 2 AND (m*sxx - sx*sx) > 1e-9
    """,
    tags=("text", "corpus-stats", "heaps", "vocab-growth"),
)
def text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit: per-document (total tokens,
    distinct tokens) pairs → closed-form OLS of ln(types) on ln(tokens)
    across documents, reported as V(n) ≈ K·n^β. Natural corpora fit
    β ≈ 0.4–0.6; β near 1 flags token-unique noise (serial numbers,
    hashes), β near 0 flags template/boilerplate floods — the standard
    triage companion to the Zipf slope (`text_zipf_fit`).

    Scale shape (r6): per-doc token totals and type counts are PURE ARRAY
    expressions (size / array_distinct over the split), so the only
    exchange in the whole plan is the final one-row OLS fold — the
    previous explode + countDistinct shape shuffled every (doc_id, token)
    pair (two-phase dedup + merge); the array form keeps that work inside
    the scan stage. A/B at sf0.1: 0.047 s vs 0.043 s (floor-bound
    locally, identical result row) — the win is the exchange that no
    longer exists at 100 TB. Guards: docs need ≥2 tokens (ln(1)=0 rows
    carry no rank information but are kept by the literal formula —
    both engines keep them identically), the fit needs ≥2 docs AND
    nonzero x-variance (all-same-length corpora would divide by zero in
    BOTH engines; the shared guard removes the row instead). NULL text
    never reaches the sizes (isNotNull pushdown; the oracle's unnest
    emits nothing for it). The 4-dp round absorbs cross-engine ln/exp
    last-ulp drift."""
    d = load(spark, sf_dir, "documents")
    # ONE spark.sql statement (r11 build cut — same zero-pre-agg-exchange
    # array-expression plan, BENCH_AB.md r11)
    beta = "(m * sxy - sx * sy) / (m * sxx - sx * sx)"
    return spark.sql(
        f"""
        WITH per_doc AS (
          SELECT doc_id, size(_tk) AS n_tok, size(array_distinct(_tk)) AS n_typ
          FROM (
            SELECT doc_id,
                   filter(split({ascii_lower_sql('trim(text)')}, ' '),
                          w -> w <> '') AS _tk
            FROM {{docs}} WHERE text IS NOT NULL
          )
        ),
        fit AS (
          SELECT count(1) AS m,
                 sum(ln(CAST(n_tok AS DOUBLE))) AS sx,
                 sum(ln(CAST(n_typ AS DOUBLE))) AS sy,
                 sum(ln(CAST(n_tok AS DOUBLE)) * ln(CAST(n_typ AS DOUBLE))) AS sxy,
                 sum(ln(CAST(n_tok AS DOUBLE)) * ln(CAST(n_tok AS DOUBLE))) AS sxx
          FROM per_doc WHERE n_tok >= 2
        )
        SELECT m AS n_docs,
               {dround_sql(beta, 4)} AS heaps_beta,
               {dround_sql(f'EXP((sy - ({beta}) * sx) / m)', 4)} AS heaps_k
        FROM fit WHERE m >= 2 AND m * sxx - sx * sx > 1e-9
        """,
        docs=d,
    )


@register(
    "embed_dim_stats",
    oracle="""
    SELECT dim,
           ROUND(AVG(v), 4)     AS mean_v,
           ROUND(var_pop(v), 4) AS var_v
    FROM (SELECT unnest(embedding)                  AS v,
                 unnest(range(0, len(embedding)))   AS dim
          FROM embeddings)
    GROUP BY dim
    """,
    tags=("embedding", "corpus-stats", "quality"),
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance embedding-health report — see
    :func:`dim_stats_from` for semantics and the 100 TB scale shape."""
    return dim_stats_from(load(spark, sf_dir, "embeddings"))


def dim_stats_from(e: DataFrame) -> DataFrame:
    """Per-dimension mean/variance over the embedding corpus — the
    standard embedding-health triage: dimensions with ~zero variance are
    dead (wasted capacity, degenerate encoder), a mean far from 0 on a
    supposedly-centered model flags a preprocessing bug, and the
    variance profile feeds PQ/IVF codebook sizing decisions.

    Scale shape: posexplode (codegen'd Generate, no Python) → ONE
    hash aggregate keyed on the dimension index. Key cardinality equals
    the embedding width (64 here), so the map-side partial aggregate
    compresses every partition to ≤64 rows before the exchange — the
    shuffle moves O(width × partitions) rows regardless of corpus size,
    the shape that survives 100 TB. avg/var_pop are single-pass
    moment aggregates on both engines; the 4-dp round absorbs
    float32-element summation-order drift."""
    x = e.select(F.posexplode("embedding").alias("dim", "v"))
    return x.groupBy("dim").agg(
        r4(F.avg("v")).alias("mean_v"),
        r4(F.var_pop("v")).alias("var_v"),
    )

EMBED_WIDTH = 64  # corpus embedding width (same contract as similarity_q)
CORR_TOP = 20


@register(
    "embed_corr_pairs_topk",
    oracle=f"""
    WITH x AS (
      SELECT vec_id,
             unnest(range(0, len(embedding)))  AS dim,
             unnest(embedding::DOUBLE[])       AS v
      FROM embeddings WHERE len(embedding) = {EMBED_WIDTH}
    ),
    pairs AS (
      SELECT a.dim AS dim_i, b.dim AS dim_j,
             ROUND(corr(a.v, b.v), 4) AS corr_ij
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim < b.dim
      GROUP BY a.dim, b.dim
    )
    SELECT dim_i, dim_j, corr_ij
    FROM pairs WHERE corr_ij IS NOT NULL
    ORDER BY abs(corr_ij) DESC, dim_i ASC, dim_j ASC
    LIMIT {CORR_TOP}
    """,
    tags=("embedding", "corpus-stats", "correlation", "matrix-kernel"),
)
def embed_corr_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most-correlated embedding dimension pairs — see
    :func:`corr_pairs_topk_from` for semantics and the Gram-partial
    (single mapInPandas pass, no self-join) scale shape."""
    return corr_pairs_topk_from(load(spark, sf_dir, "embeddings"))


def corr_pairs_topk_from(e: DataFrame, k: int = CORR_TOP) -> DataFrame:
    """Most-correlated dimension pairs of the embedding corpus — the
    redundancy half of embedding-health triage (near-±1 pairs mean the
    encoder wastes capacity; the profile also feeds whitening / PQ
    codebook decisions). Companion to `embed_dim_stats`.

    Scale shape: the naive form (explode + self-join on vec_id) widens
    every row ×width² — 100 TB of embeddings would shuffle 4096× the
    corpus. Instead ONE ``mapInPandas`` pass computes per-Arrow-batch
    Gram partials (Xᵀ X as a float64 BLAS matmul, column sums, count)
    and emits them as (i, j, v) moment rows: ≤ width² + width + 1 tiny
    rows PER BATCH cross the one exchange, independent of corpus size.
    The reduced moments (a SCHEMA-constant ≤2145 rows, never data-sized)
    collect to the driver, where the closed form
    corr = (n·G_ij − s_i·s_j) / √((n·G_ii − s_i²)(n·G_jj − s_j²))
    and the top-k sort run in plain Python — returning a LocalRelation
    (see the in-body note on why the relational assemble loses).

    Cross-engine contract: rows are restricted to the corpus width
    ({EMBED_WIDTH}) on BOTH engines (a ragged row would contribute to a
    pair-dependent subset of moments); float32 elements are widened to
    double before any arithmetic on both sides; zero-variance dims
    produce NULL corr in DuckDB and are filtered identically here; the
    ordering key is the ROUNDED |corr| (4 dp, absorbing summation-order
    drift) with a deterministic (dim_i, dim_j) tie-break so the top-k
    SET agrees across engines."""
    emb = e.filter(F.size("embedding") == EMBED_WIDTH).select("embedding")

    def gram_partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            col = pdf["embedding"]
            if not len(col):
                continue
            X = np.stack(col.to_numpy()).astype(np.float64, copy=False)
            n = X.shape[0]
            G = X.T @ X
            s = X.sum(axis=0)
            iu, ju = np.triu_indices(X.shape[1])
            out = pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(X.shape[1]), [-1]]),
                    "j": np.concatenate(
                        [ju, np.full(X.shape[1], -1), [-1]]
                    ),
                    "v": np.concatenate([G[iu, ju], s, [float(n)]]),
                }
            )
            out["i"] = out["i"].astype("int32")
            out["j"] = out["j"].astype("int32")
            yield out

    import math

    from us_weather_energy_analysis_pipeline_spark.corpus._util import py_dround
    from us_weather_energy_analysis_pipeline_spark.session import local_df

    # Assemble on the DRIVER from the reduced moments — a bounded
    # driver scalar in the quality_report sense: the collect moves
    # ≤ width²/2 + width + 1 rows (2145 at width 64), a SCHEMA constant
    # independent of corpus size, so this is 100 TB-safe. A relational
    # assemble (4 filter branches + 2 joins + sort over the persisted
    # moments) measured 15 AQE jobs ≈ 1.5 s of pure scheduling floor on
    # 2145 rows — the tiny-local-relation pathology; driver math + a
    # LocalRelation result avoids all of it (measured 2.5 s → ~0.55 s).
    rows = (
        emb.mapInPandas(gram_partials, "i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    g = {(r["i"], r["j"]): r["v"] for r in rows}
    n = g.pop((-1, -1), 0.0)
    s = {i: v for (i, j), v in g.items() if j == -1}
    out = []
    for (i, j), gij in g.items():
        if j == -1 or i == j:
            continue
        var_i = n * g[(i, i)] - s[i] * s[i]
        var_j = n * g[(j, j)] - s[j] * s[j]
        denom = math.sqrt(var_i * var_j) if var_i > 0 and var_j > 0 else 0.0
        if denom == 0.0:
            continue  # zero-variance dim -> NULL corr on both engines
        c = py_dround((n * gij - s[i] * s[j]) / denom, 4)
        out.append((i, j, c))
    out.sort(key=lambda t: (-abs(t[2]), t[0], t[1]))
    return local_df(
        e.sparkSession, out[:k], "dim_i int, dim_j int, corr_ij double"
    )


VOCAB_MIN_DF = 3    # tokens in fewer documents are noise/typos
VOCAB_MAX_DF = 400  # tokens in more documents are stop-like boilerplate


@register(
    "vocab_prune_df_bounds",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({_TOKS_DUCK}) AS tok FROM documents)
      WHERE tok <> ''
      GROUP BY doc_id, tok
    )
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(c) AS BIGINT)   AS tf
    FROM tf
    GROUP BY tok
    HAVING COUNT(*) BETWEEN {VOCAB_MIN_DF} AND {VOCAB_MAX_DF}
    """,
    tags=("text", "vocab", "df-bounds", "corpus-stats"),
)
def vocab_prune_df_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction with document-frequency bounds — the pruning
    pass a tokenizer/vocab build runs before assigning merges: drop
    tokens seen in fewer than {min_df} documents (noise, typos, serial
    numbers) or more than {max_df} (stop-like boilerplate that carries
    no signal). Emits the kept vocabulary with its document and corpus
    frequencies.

    Plan: the (doc_id, tok) grain collapses FIRST (one groupBy with
    map-side combine — the raw token stream never crosses an exchange
    undeduplicated), then one token-grain aggregate takes df = row count
    and tf = sum. Both exchanges carry the deduped grain; the HAVING is
    a post-aggregate filter on the second. Same two-exchange shape as
    the tfidf tf stage — the df-bound filter is exactly the df-cap idea
    the posting-list dedup family uses, surfaced as a standalone op."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(ascii_lower(F.trim(F.col("text"))), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        tf.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("c").cast("long").alias("tf"),
        )
        .filter(F.col("df").between(VOCAB_MIN_DF, VOCAB_MAX_DF))
    )
