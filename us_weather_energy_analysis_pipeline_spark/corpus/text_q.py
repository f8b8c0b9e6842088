"""Text-analysis corpus over ``documents`` — training-data-pipeline ops.

Everything stays in native Column expressions (split / regexp / md5 — all
JVM-side, whole-stage-codegen-friendly); no Python UDFs in the hot path.
At 100 TB these are embarrassingly parallel scans: no shuffle at all except
the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql, r2, r4, r6
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register
from us_weather_energy_analysis_pipeline_spark.functions.text import (
    ascii_lower,
    ws_token_count,
)

# Tiny function-word inventory for the ratio heuristics; fixed and public.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
# the list is interpolated into SQL string literals below — a word with
# an apostrophe (e.g. "don't") would break the statement (ADVICE r11)
assert all("'" not in w for w in STOPWORDS), "STOPWORDS must be quote-free"


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))              AS n_tokens_ws,
           len(regexp_extract_all(text, '[a-z]+'))   AS n_words_alpha,
           length(text)                              AS n_chars_measured,
           n_chars                                   AS n_chars_meta
    FROM documents
    """,
    tags=("text", "tokens"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and regex word tokens
    (the BPE-ish pre-tokenization pass of a training pipeline).

    The whitespace count is pure length arithmetic — a single-space
    split yields exactly (#spaces + 1) elements (empties included, both
    engines), so ``length(text) − length(replace(text,' ','')) + 1``
    equals ``size(split(...))`` without materializing a token array per
    row (measured ~3× on the map stage; at corpus scale the array
    allocation is the dominant GC pressure of this pass)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ws_token_count("text").cast("long").alias("n_tokens_ws"),
        F.regexp_count("text", F.lit("[a-z]+")).cast("long").alias("n_words_alpha"),
        F.length("text").cast("long").alias("n_chars_measured"),
        F.col("n_chars").alias("n_chars_meta"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'))                            AS fp_full,
           md5(array_to_string(list_sort(list_distinct(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '))), ' '))
                                                             AS fp_bag,
           length(text)                                      AS n_chars
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content hash plus an order-insensitive
    bag-of-words hash (sorted distinct tokens) — the cheap first pass of a
    dedup cascade."""
    d = load(spark, sf_dir, "documents")
    norm = ascii_lower(F.trim(F.col("text")))
    bag = F.array_join(F.array_sort(F.array_distinct(F.split(norm, " "))), " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("fp_full"),
        F.md5(bag).alias("fp_bag"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "text_quality_score",
    oracle="""
    WITH feat AS (
      SELECT doc_id, lang,
             length(text) AS n_chars,
             len(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS n_tokens,
             len(list_filter(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                 t -> list_contains(['the','a','of','to','and','in','is','it'], t)))
               AS n_stop,
             len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct
      FROM documents
    )
    SELECT doc_id, lang, n_chars, n_tokens,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4)   AS stopword_ratio,
           ROUND(CAST(n_punct AS DOUBLE) / n_chars, 4)   AS punct_ratio,
           ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 4)  AS avg_token_len,
           CASE WHEN n_tokens >= 20
                 AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
                 AND CAST(n_punct AS DOUBLE) / n_chars < 0.1
                THEN 1 ELSE 0 END AS keep_flag
    FROM feat
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality scoring (length / stopword / punctuation
    ratios) with a keep/drop flag — the standard pre-training corpus filter,
    as a pure columnar expression."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql
    from us_weather_energy_analysis_pipeline_spark.functions.text import (
        ascii_lower_sql,
    )

    d = load(spark, sf_dir, "documents")
    # raw counts once per row in the ``feat`` projection; the ratios and
    # keep_flag derive from the COLUMNS above it — inlining them would
    # re-evaluate the split and the interpreted stopword filter once per
    # reference. ONE spark.sql statement (r11 build cut).
    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_ratio = "CAST(_n_stop AS DOUBLE) / n_tokens"
    punct_ratio = "CAST(_n_punct AS DOUBLE) / n_chars"
    return spark.sql(
        f"""
        WITH feat AS (
          SELECT doc_id, lang,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(size(toks) AS BIGINT) AS n_tokens,
                 size(filter(toks, t -> t IN ({stops}))) AS _n_stop,
                 regexp_count(text, '[^a-z0-9 ]') AS _n_punct
          FROM (SELECT doc_id, lang, text,
                       split({ascii_lower_sql('trim(text)')}, ' ') AS toks
                FROM {{docs}})
        )
        SELECT doc_id, lang, n_chars, n_tokens,
               {dround_sql(stop_ratio, 4)} AS stopword_ratio,
               {dround_sql(punct_ratio, 4)} AS punct_ratio,
               {dround_sql('CAST(n_chars AS DOUBLE) / n_tokens', 4)}
                 AS avg_token_len,
               CASE WHEN n_tokens >= 20
                     AND {stop_ratio} BETWEEN 0.01D AND 0.6D
                     AND {punct_ratio} < 0.1D
                    THEN 1 ELSE 0 END AS keep_flag
        FROM feat
        """,
        docs=d,
    )


@register(
    "text_lang_id",
    oracle="""
    WITH feat AS (
      SELECT doc_id, lang,
             len(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS n_tokens,
             len(list_filter(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                 t -> list_contains(['the','a','of','to','and','in','is','it'], t)))
               AS n_en
      FROM documents
    )
    SELECT doc_id, lang AS lang_meta,
           CASE WHEN CAST(n_en AS DOUBLE) / n_tokens >= 0.08 THEN 'en'
                ELSE 'other' END AS lang_pred
    FROM feat
    """,
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-ratio language-ID heuristic (n-gram-style LID): the
    standard fast LID signal, expressed as an aggregate-free column plan.
    On the synthetic corpus it demonstrates the machinery (deterministic
    Spark↔oracle agreement), not real LID accuracy."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(ascii_lower(F.trim(F.col("text"))), " ")
    # counts in one projection, the decision from the columns (each
    # reference of a shared expression re-evaluates the split under
    # interpreted HOFs — same fix as text_quality_score)
    feat = d.select(
        "doc_id",
        F.col("lang").alias("lang_meta"),
        F.size(toks).alias("_n_tok"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("_n_en"),
    )
    return feat.select(
        "doc_id",
        "lang_meta",
        F.when(F.col("_n_en").cast("double") / F.col("_n_tok") >= 0.08, "en")
        .otherwise("other")
        .alias("lang_pred"),
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, SUM(cnt) AS doclen FROM tf GROUP BY 1),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS docfreq FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             ROUND((CAST(tf.cnt AS DOUBLE) / dl.doclen)
                   * ln(CAST(n.n_docs AS DOUBLE) / df.docfreq), 6) AS tfidf
      FROM tf JOIN dl USING (doc_id) JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, tok ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    tags=("text", "tfidf", "ranking"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring with top-3 terms per document — the classic
    keyword-extraction pass (VERDICT r7 task 3 rewrite: 8 jobs → 4).

    After the one real aggregation (term counts per doc — map-side
    combine collapses the raw token stream to distinct (doc, tok) pairs
    before any shuffle), EVERYTHING else is windows over that deduped
    grain: docfreq = COUNT(doc_id) OVER (PARTITION BY tok) — tf already
    has one row per (doc, tok), so the per-token row count IS the
    distinct-doc frequency (non-null count keeps COUNT(DISTINCT)'s
    null-skipping) — and doclen = SUM(cnt) OVER (PARTITION BY doc_id),
    whose doc_id exchange is then REUSED by the rank window. No IDF join
    branch, no broadcast build, no separate doclen aggregate: 3 exchanges
    total, all at the deduped tf grain. Corpus size comes from the
    parquet footer (job-free, exact — the same metadata a count() would
    read) ONLY when ``exact_scan_rows`` proves the plan is a bare scan;
    any filter above the scan (or a non-parquet input) falls back to a
    broadcast 1-row aggregate, so footer rows can never silently inflate
    the IDF denominator.

    Measured sf0.1 (paired, same session): 0.73 s / 4 jobs vs the r7
    join-plan's 0.81 s / 8 jobs; a size(split())-before-explode variant
    was 4 s — CollapseProject re-inlines the split per TOKEN row
    (quadratic per doc), the same trap as the per-token md5 dead end."""
    from pyspark.sql import Window

    from us_weather_energy_analysis_pipeline_spark.corpus._util import r6
    from us_weather_energy_analysis_pipeline_spark.operators.plan_meta import (
        exact_scan_rows,
    )

    d = load(spark, sf_dir, "documents")
    toks = F.split(ascii_lower(F.trim(F.col("text"))), " ")
    tok = d.select("doc_id", F.explode(toks).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w_tok = Window.partitionBy("tok")
    w_doc = Window.partitionBy("doc_id")
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    nd = exact_scan_rows(d)  # exact ONLY for a bare scan — guarded, ADVICE r8
    if nd is not None:
        n_docs = F.lit(float(nd))
        scored = tf
    else:  # filtered/non-parquet input: in-plan 1-row aggregate, one broadcast job
        n_docs = F.col("n_docs")
        scored = tf.crossJoin(
            F.broadcast(d.agg(F.count(F.lit(1)).cast("double").alias("n_docs")))
        )
    return (
        scored.withColumn("docfreq", F.count("doc_id").over(w_tok))
        .withColumn("doclen", F.sum("cnt").over(w_doc))
        .withColumn(
            "tfidf",
            r6(
                (F.col("cnt").cast("double") / F.col("doclen"))
                * F.log(n_docs / F.col("docfreq"))
            ),
        )
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf", "rnk")
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS t
      FROM documents
    ),
    counted AS (
      SELECT doc_id, word, COUNT(*) AS n
      FROM (SELECT doc_id, unnest(t) AS word FROM toks)
      GROUP BY doc_id, word
    ),
    per_doc AS (
      SELECT doc_id, SUM(n) AS total, COUNT(*) AS n_distinct, MAX(n) AS top_n
      FROM counted GROUP BY doc_id
    )
    SELECT doc_id,
           ROUND(1.0 - n_distinct * 1.0 / total, 4) AS dup_word_ratio,
           ROUND(top_n * 1.0 / total, 4)            AS top_word_ratio,
           CAST(total AS BIGINT)                    AS n_tokens
    FROM per_doc
    """,
    tags=("text", "quality", "repetition"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: duplicate-word ratio
    (1 − distinct/total) and most-frequent-word share — the cheap
    repetition filters an LM data pipeline applies before the expensive
    dedup passes. Pure array expressions (split → array_distinct /
    sort + run-length fold for the top-word share), zero shuffle: every
    ratio is computed inside one stage per row.

    NULL text is out of scope on BOTH engines: the oracle's per-token
    aggregate emits no rows for it (unnest of a NULL split), while
    Spark's size(split(NULL)) = -1 would fabricate ratios — the
    pushed-down not-null filter aligns the row sets."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # Vectorized token-stats kernel (r10): the staged-array JVM form's
    # array_distinct + sort+run-length HOF fold evaluated interpreted
    # and dominated this 1-job scan (~0.5 s data at sf0.1); the kernel
    # tokenizes in C and reduces the flat token stream with one
    # factorize+unique — same zero-shuffle single-stage shape.
    from us_weather_energy_analysis_pipeline_spark.functions.text import (
        token_stats_features,
    )

    # ONE spark.sql statement over the kernel's output (r11 build cut)
    return spark.sql(
        f"""
        SELECT doc_id,
               {dround_sql('1.0D - CAST(n_distinct AS DOUBLE) / n_words', 4)}
                 AS dup_word_ratio,
               {dround_sql('CAST(top_n AS DOUBLE) / n_words', 4)}
                 AS top_word_ratio,
               CAST(n_words AS BIGINT) AS n_tokens
        FROM {{feat}}
        """,
        feat=token_stats_features(d),
    )


@register(
    "corpus_mix_summary",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           ROUND(AVG(n_chars), 2) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    tags=("text", "corpus-mix", "agg"),
)
def corpus_mix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix characterization per (lang, source) — the sampling-
    weight table a data-mixing job computes before building a training
    blend. One partial-aggregated groupBy over a pure scan."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_token_count("text")).cast("long").alias("n_tokens"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        r2(F.avg("n_chars")).alias("avg_chars"),
    )


@register(
    "decontamination_check",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fp FROM documents
    ),
    eval_set AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 97 = 0),
    train AS (SELECT doc_id, fp FROM fp WHERE doc_id % 97 <> 0)
    SELECT COUNT(*) AS n_train,
           COUNT(*) FILTER (WHERE e.fp IS NOT NULL) AS n_contaminated,
           ROUND(COUNT(*) FILTER (WHERE e.fp IS NOT NULL) * 1.0 / COUNT(*), 6)
             AS contamination_rate
    FROM train t LEFT JOIN eval_set e ON t.fp = e.fp
    """,
    tags=("text", "decontamination", "semi-join"),
)
def decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents whose normalized
    fingerprint collides with a held-out eval set (here a deterministic
    1/97 slice standing in for the benchmark suite). The eval fingerprint
    set is tiny by construction → broadcast semi-join against the train
    scan, no shuffle of the corpus; at 100 TB this is a map-only pass.

    The fingerprint projection feeds BOTH join branches; without a
    materialization each branch re-decodes and re-hashes the full text
    column (the modulo filter is not parquet-pushable, so the eval branch
    pays the whole scan too). The fp table is ~40 B/doc — the standard
    digest materialization — tracked via operators.cache."""
    from us_weather_energy_analysis_pipeline_spark.operators import cache

    d = load(spark, sf_dir, "documents")
    fp = cache.track(
        d.select("doc_id", F.md5(ascii_lower(F.trim(F.col("text")))).alias("fp"))
    )
    eval_set = fp.filter(F.col("doc_id") % 97 == 0).select("fp").distinct()
    train = fp.filter(F.col("doc_id") % 97 != 0)
    joined = train.join(
        F.broadcast(eval_set.withColumn("hit", F.lit(1))), "fp", "left"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_train"),
        F.count("hit").alias("n_contaminated"),
        r6(F.count("hit") / F.count(F.lit(1))).alias("contamination_rate"),
    )



CHUNK_TOKENS = 32  # tokens per chunk (the training-window / RAG unit)
CHUNK_STRIDE = 24  # stride between chunk starts → 8-token overlap


@register(
    "doc_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                    'abcdefghijklmnopqrstuvwxyz'), ' ') AS t
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST((i - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
             CAST(i AS BIGINT)                          AS chunk_start,
             t[i:i+{CHUNK_TOKENS}-1]                    AS c
      FROM toks, UNNEST(generate_series(1, len(t), {CHUNK_STRIDE})) AS s(i)
    )
    SELECT doc_id, chunk_id, chunk_start,
           CAST(len(c) AS INTEGER)           AS n_chunk_tokens,
           md5(array_to_string(c, ' '))      AS chunk_md5
    FROM chunks
    """,
    tags=("text", "chunking", "rag", "training-windows"),
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the pass that turns documents
    into fixed-size training windows / RAG retrieval units (32-token
    chunks, stride 24 → 8-token overlap so no boundary context is lost).
    Emits one row per chunk with its position and an md5 fingerprint
    (the dedup key a downstream chunk-level dedup joins on).

    Plan shape: pure per-row array expressions — stage the token array
    once (CollapseProject keeps the multi-reference alias), explode the
    stride-spaced start sequence, slice per start — zero shuffle, an
    embarrassingly parallel scan at any scale. The final (possibly
    short) tail chunk is emitted deliberately: truncating it would drop
    trailing tokens from the training set. NULL text emits no chunks on
    both engines (explode/unnest of a NULL token array)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(ascii_lower(F.trim(F.col("text"))), " ")
    staged = d.select("doc_id", toks.alias("t")).select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.size("t"), F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice("t", F.col("s"), CHUNK_TOKENS)
    return staged.select(
        "doc_id",
        F.expr(f"CAST((s - 1) DIV {CHUNK_STRIDE} AS INT)").alias("chunk_id"),
        F.col("s").cast("long").alias("chunk_start"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@register(
    "chunk_dedup_ratio",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                    'abcdefghijklmnopqrstuvwxyz'), ' ') AS t
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST((i - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
             md5(array_to_string(t[i:i+{CHUNK_TOKENS}-1], ' ')) AS chunk_md5
      FROM toks, UNNEST(generate_series(1, len(t), {CHUNK_STRIDE})) AS s(i)
    ),
    ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY chunk_md5
                                ORDER BY doc_id, chunk_id) AS occ
      FROM chunks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)                          AS n_chunks,
           CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_dup_chunks,
           ROUND(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6)              AS dup_chunk_ratio
    FROM ranked
    GROUP BY doc_id
    """,
    tags=("text", "chunking", "dedup", "training-windows"),
)
def chunk_dedup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup (the FineWeb-style intra-corpus pass):
    consume the ``chunk_md5`` key that ``doc_chunk_overlap`` emits for
    exactly this purpose, keep-first over (doc_id, chunk_id), and report
    per document how many of its training windows are verbatim repeats
    of a chunk seen earlier in the corpus — the signal that routes a doc
    to chunk-pruned emission instead of whole-doc drop.

    Plan shape: the zero-shuffle chunking scan (same per-row array
    expressions as ``doc_chunk_overlap``), then exactly two exchanges —
    a row_number window keyed on chunk_md5 (md5 keys are uniform, no
    skew at any scale) and the per-doc fold. Keep-first semantics (occ
    > 1 = would be removed) rather than member-of-dup-group: it matches
    the O3 dedup family and counts exactly the rows a dedup pass drops.
    NULL text emits no chunks on both engines, so such docs are absent
    from the output (same contract as ``doc_chunk_overlap``)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = F.split(ascii_lower(F.trim(F.col("text"))), " ")
    staged = d.select("doc_id", toks.alias("t")).select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.size("t"), F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    chunks = staged.select(
        "doc_id",
        F.expr(f"CAST((s - 1) DIV {CHUNK_STRIDE} AS INT)").alias("chunk_id"),
        F.md5(F.array_join(F.slice("t", F.col("s"), CHUNK_TOKENS), " ")).alias(
            "chunk_md5"
        ),
    )
    occ = F.row_number().over(
        Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_id")
    )
    dup = (occ > 1).cast("int")
    return (
        chunks.select("doc_id", dup.alias("dup"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("dup").cast("long").alias("n_dup_chunks"),
            r6(F.sum("dup") / F.count(F.lit(1))).alias("dup_chunk_ratio"),
        )
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
    tc AS (SELECT tok, SUM(cnt) AS tok_cnt FROM tf GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM tf)
    SELECT tf.doc_id,
           CAST(SUM(tf.cnt) AS BIGINT) AS n_tokens,
           ROUND(SUM(tf.cnt * ln(CAST(tc.tok_cnt AS DOUBLE) / tot.total))
                 / SUM(tf.cnt), 6) AS avg_logprob
    FROM tf JOIN tc USING (tok) CROSS JOIN tot
    GROUP BY tf.doc_id
    """,
    tags=("text", "language-model", "quality"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram-LM quality score: per-document mean token
    log-probability under the corpus's own unigram distribution — the
    cheap analog of CCNet's LM-perplexity filter (docs whose tokens are
    corpus-atypical score low and get routed to the low-quality bucket).

    Plan shape (the tfidf windows-over-tf pattern): one real aggregation
    — term counts at the deduped (doc, tok) grain, map-side combine
    collapses the raw token stream before the shuffle — then the token
    unigram count is a window over that grain (SUM(cnt) PARTITION BY
    tok: no join branch, no second tokenize scan), and the per-doc fold
    is one groupBy(doc_id). The corpus token total is a broadcast 1-row
    aggregate over PURE LENGTH ARITHMETIC on a second narrow scan — a
    single-space split yields exactly (#spaces + 1) tokens, so
    Σ(length(trim) − length(replace(trim)) + 1) equals the oracle's
    SUM(cnt) over tf EXACTLY (integers), with no second tokenize/explode
    /aggregate branch (the ws_token_count trick; trim first because the
    tf side splits the trimmed text — empty-after-trim still counts 1,
    matching split('') = ['']). Weighted-mean form SUM(cnt·ln p)/SUM(cnt)
    scores token INSTANCES (the LM view) while only folding the deduped
    grain. At 100 TB: shuffles key on tok then doc_id — both
    well-distributed; nothing driver-sized anywhere. NULL text yields no
    token rows on both engines (explode/unnest of a NULL token array;
    NULL length skipped by SUM), so such docs are absent from the
    output — same contract as text_tfidf_topk."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = F.split(ascii_lower(F.trim(F.col("text"))), " ")
    tok = d.select("doc_id", F.explode(toks).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = d.agg(
        F.sum(ws_token_count(F.trim(F.col("text"))).cast("long"))
        .cast("double")
        .alias("total")
    )
    w_tok = Window.partitionBy("tok")
    return (
        tf.withColumn("tok_cnt", F.sum("cnt").over(w_tok))
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            r6(
                F.sum(
                    F.col("cnt")
                    * F.log(F.col("tok_cnt").cast("double") / F.col("total"))
                )
                / F.sum("cnt")
            ).alias("avg_logprob"),
        )
    )
