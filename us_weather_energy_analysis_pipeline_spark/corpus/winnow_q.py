"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003).

Registered LAST (own module, imported after every other corpus module) so
adding it does not shift the driver's first-50 verification window — see
registry._ensure_loaded for the window layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import r4
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register
from us_weather_energy_analysis_pipeline_spark.functions.text import ascii_lower


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS scheme)
# ---------------------------------------------------------------------------

WINNOW_K = 3  # words per k-gram
WINNOW_W = 4  # grams per winnowing window

_TRANS_DUCK = (
    "translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
    " 'abcdefghijklmnopqrstuvwxyz')"
)
# 7 hex digits → exact BIGINT (16^7 = 2^28); same strpos trick as sketch_q
_HEX7_DUCK = " + ".join(
    f"(strpos('0123456789abcdef', substr(h7, {i + 1}, 1)) - 1) * {16 ** (6 - i)}"
    for i in range(7)
)


@register(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_TRANS_DUCK}, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             substr(md5(array_to_string(t[i:i+{WINNOW_K}-1], ' ')), 1, 7) AS h7
      FROM toks, UNNEST(generate_series(1, len(t) - {WINNOW_K} + 1)) AS g(i)
    ),
    keyed AS (
      SELECT doc_id, i, ({_HEX7_DUCK}) * 4294967296 + i AS key,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM grams
    ),
    winmin AS (
      SELECT doc_id, i, n_grams,
             MIN(key) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                     AND CURRENT ROW) AS sel
      FROM keyed
    ),
    sel AS (
      SELECT DISTINCT doc_id, n_grams, sel
      FROM winmin WHERE i >= LEAST({WINNOW_W}, n_grams)
    )
    SELECT doc_id,
           MIN(n_grams)                                  AS n_grams,
           COUNT(*)                                      AS n_fp,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(n_grams), 4) AS density,
           md5(array_to_string(list_sort(list(sel)), ',')) AS fp_digest
    FROM sel GROUP BY doc_id
    """,
    tags=("text", "fingerprint", "winnowing", "dedup"),
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS local fingerprinting scheme): hash every k-word gram, then
    from each window of w consecutive gram hashes keep the minimum; the
    selected set is a position-robust fingerprint whose expected density
    is 2/(w+1), guaranteeing any shared run of ≥ w+k−1 words between two
    documents shares a fingerprint (the copy-detection property plain
    min-hashing lacks).

    All native expressions, one (doc-bounded) window: gram hash = 28-bit
    md5 prefix packed with the gram position into ONE integer
    (h·2³² + i < 2⁶⁰, exact in int64), so the per-window argmin with a
    deterministic leftmost-min tie-break is a single MIN over a row
    frame — both engines compute identical integers, and the per-doc
    digest hash-certifies the full selected set. Windows shorter than w
    (docs with < w grams) degrade to one whole-doc window, per the
    paper's convention. The window partitions by doc_id (bounded by
    document length — never a global sort); 2³² positions per doc
    before the packing would need widening."""
    d = load(spark, sf_dir, "documents")
    sel = winnow_selected(d)
    return sel.groupBy("doc_id").agg(
        F.min("n_grams").alias("n_grams"),
        F.count(F.lit(1)).alias("n_fp"),
        r4(F.count(F.lit(1)).cast("double") / F.min("n_grams")).alias("density"),
        F.md5(F.array_join(F.array_sort(F.collect_list("sel")), ",")).alias(
            "fp_digest"
        ),
    )

def winnow_selected(
    d: DataFrame,
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, n_grams, sel) — the distinct winnowing selections, where
    ``sel = gram_hash·2³² + gram_position`` (``sel >> 32`` recovers the
    position-free hash for cross-document matching). Factored out of the
    corpus query so the copy-detection property (shared run ≥ w+k−1
    words ⇒ shared fingerprint hash) is testable directly."""
    toks = F.split(ascii_lower(F.trim(F.col(text_col))), " ")
    base = d.select("doc_id", toks.alias("t")).filter(F.size("t") >= k)
    idx = F.sequence(F.lit(1), F.size("t") - k + 1)
    grams = base.select(
        "doc_id",
        F.explode(idx).alias("i"),
        F.col("t"),
    ).select(
        "doc_id",
        F.col("i").cast("long").alias("i"),
        F.conv(
            F.substring(F.md5(F.array_join(F.slice("t", F.col("i"), k), " ")), 1, 7),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    wdoc = Window.partitionBy("doc_id")
    wrun = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-(w - 1), 0)
    keyed = grams.select(
        "doc_id",
        "i",
        (F.col("h") * F.lit(4294967296) + F.col("i")).alias("key"),
    ).withColumn("n_grams", F.count(F.lit(1)).over(wdoc))
    winmin = keyed.withColumn("sel", F.min("key").over(wrun)).filter(
        F.col("i") >= F.least(F.lit(w), F.col("n_grams"))
    )
    return winmin.select("doc_id", "n_grams", "sel").distinct()
