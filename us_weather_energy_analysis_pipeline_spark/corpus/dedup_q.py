"""Deduplication corpus over ``documents`` — exact and near-dup families.

Training-data dedup at 100 TB is shuffle-dominated; each variant here is
built around ONE well-chosen shuffle key:

- exact:       hash of normalized content (one groupBy on the digest);
- n-gram Jaccard: shingle inverted index with df-capped posting lists
  (shuffle on shingle, never on the doc pair space; pairs expand
  map-side from ≤cap-row lists);
- MinHash/LSH:  band-bucket join (shuffle on (band, bucket-hash)) so the
  candidate pair space collapses from O(n²) to bucket-local pairs.

Hashes are md5-based so the DuckDB oracle computes bit-identical signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql, r4
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register
from us_weather_energy_analysis_pipeline_spark.functions.text import (
    ascii_lower,
    explode_pairs,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache

SHINGLE_K = 3  # words per shingle
JACCARD_THRESHOLD = 0.2
# Shingle document-frequency cap (CCNet/Gopher-style): a shingle shared by k
# docs emits k² bucket-local pairs in the inverted-index pair expansion, so one
# boilerplate shingle at web scale is a quadratic blowup + a hot shuffle key.
# Both engines drop shingles with df > cap BEFORE the join — the Jaccard is
# defined over discriminative shingles, identically on both sides, at any sf.
NGRAM_DF_CAP = 10


def word_shingles(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) distinct pairs where ``shingle`` is a 64-bit
    hash of the k-word slice — an 8-byte int64 key, so the distinct and
    the inverted-index exchanges ship fixed-width integers instead of raw
    multi-word strings (the r3 bench showed the string shuffle dominating
    this family).

    HASH-ONCE formulation (r5), vectorized kernel (r10): each TOKEN is
    hashed exactly once and a shingle's key is the XOR of its k token
    hashes under position-distinct rotations (0/21/42 bits for k=3 —
    permuted or repeated tokens yield different keys; collisions
    ~n²/2⁶⁴ like any uniform 64-bit key). The key only needs
    consistency WITHIN Spark — the DuckDB oracle matches on the raw
    ``array_to_string`` shingle and doubles as the collision check at
    test SFs — so r10 moved the hash off xxhash64 HOF lambdas (which
    evaluate INTERPRETED per element and dominated the pass) onto
    pandas' stable fixed-key siphash inside one numpy-vectorized
    ``mapInPandas`` batch: tokenize in C, hash the flat token stream
    once, slide the XOR-rotate window with masked doc boundaries.

    Per-doc dedup stays map-side (batch-local drop_duplicates — (doc,
    shingle) rows are unique within a doc's contiguous batch span), not
    a ``.distinct()`` — no shingle-index exchange enters the plan."""
    # Vectorized kernel (r10): the HOF form — transform(t, xxhash64) +
    # an XOR-rotate combine transform — evaluated its lambdas
    # INTERPRETED per element and was the shingle pass's dominant cost
    # (measured 0.38-0.52 s at sf0.1 in r5, still the floor of the
    # 1.5 s ngram data time). Legal to move off xxhash64 entirely: the
    # shingle key is SPARK-INTERNAL (the oracle matches raw shingle
    # strings independently), so any within-query-deterministic uniform
    # 64-bit hash yields the same pair set up to ~n²/2⁶⁴ collisions —
    # here pandas' siphash under an EXPLICIT fixed key (pinned below, so
    # the hash is identical across pandas builds and executor
    # processes) over each token ONCE, with the same
    # position-distinct XOR-rotate combine, fully vectorized in numpy
    # (uint64 shifts; sliding windows masked at doc boundaries).
    from us_weather_energy_analysis_pipeline_spark.functions.text import (
        ASCII_LO,
        ASCII_UP,
    )

    lower_map = str.maketrans(ASCII_UP, ASCII_LO)
    kk = int(k)
    proj = df.select("doc_id", F.col(text_col).alias("_t"))

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            docs = pdf["doc_id"].to_numpy()
            texts = pdf["_t"]
            tok_parts: list = []
            doc_parts: list = []
            for j in range(len(pdf)):
                t = texts.iloc[j]
                if t is None or (isinstance(t, float) and pd.isna(t)):
                    continue
                toks = t.strip(" ").translate(lower_map).split(" ")
                if len(toks) < kk:
                    continue
                a = np.empty(len(toks), dtype=object)
                a[:] = toks
                tok_parts.append(a)
                doc_parts.append(np.full(len(toks), docs[j]))
            if not tok_parts:
                continue
            flat = np.concatenate(tok_parts)
            drep = np.concatenate(doc_parts)
            # Explicit 16-byte siphash key (ADVICE r10): hash_array's
            # default key is a pandas implementation detail — pinning it
            # makes the token hash identical across pandas builds, so
            # heterogeneous executors can never disagree on shingle keys.
            th = pd.util.hash_array(flat, hash_key="spark-graft-0011")
            m = len(th) - kk + 1
            sh = th[:m].copy()
            for jj in range(1, kk):
                r = (21 * jj) % 64
                x = th[jj : jj + m]
                sh ^= (x << np.uint64(r)) | (x >> np.uint64(64 - r))
            valid = drep[:m] == drep[kk - 1 :]
            out = pd.DataFrame(
                {
                    "doc_id": drep[:m][valid],
                    "shingle": sh[valid].view(np.int64),
                }
            ).drop_duplicates()
            yield out

    return proj.mapInPandas(gen, "doc_id long, shingle long")


def capped_shingles(sh: DataFrame, cap: int = NGRAM_DF_CAP) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``cap`` — map-side.

    The df count is a groupBy (partial agg combines every hot key
    per-partition before the exchange: a web-scale stop-shingle
    contributes one combiner row per map partition, never its full
    posting list on one task). The over-cap shingle set is tiny by
    construction (boilerplate vocabulary), so it broadcasts, and the
    ANTI join removes hot rows without shuffling the index by shingle.
    """
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cap)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


@register(
    "dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fingerprint FROM documents
    )
    SELECT fingerprint,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*)    AS n_docs,
           COUNT(*) - 1 AS n_dropped
    FROM fp GROUP BY fingerprint
    """,
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: canonical = min doc_id per
    digest. One shuffle on the digest; at scale the digest groupBy is
    near-perfectly distributed (hash keys)."""
    d = load(spark, sf_dir, "documents")
    fp = d.select("doc_id", F.md5(ascii_lower(F.trim(F.col("text")))).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS t FROM documents
    ),
    all_shingles AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[i:i+{SHINGLE_K}-1], ' ') AS shingle
      FROM toks, UNNEST(generate_series(1, len(t) - {SHINGLE_K} + 1)) AS g(i)
    ),
    shingles AS (
      SELECT doc_id, shingle FROM all_shingles
      QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {NGRAM_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 4) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= {JACCARD_THRESHOLD}
    """,
    tags=("dedup", "jaccard", "ngram"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by n-gram (word-shingle) Jaccard similarity via a
    shingle inverted index: shuffle on shingle (not on pairs), count
    co-occurrences per pair, |A∪B| = |A|+|B|−|A∩B|. Pairs sharing no
    shingle never materialize — the crucial scale property.

    A document-frequency cap (NGRAM_DF_CAP) drops boilerplate shingles
    BEFORE the join: without it one stop-shingle shared by k docs emits
    k² pairs in its bucket (quadratic skew at web scale). The cap is
    enforced MAP-SIDE: shingle dfs come from a groupBy count whose
    partial aggregation combines each hot key per-partition before the
    exchange (a hot shingle ships ~P combiner rows, never its full
    posting list), the tiny over-cap set is broadcast, and a broadcast
    ANTI join drops hot rows with zero data-sized shuffle — unlike the
    previous windowed count (r2, commit e6a31cc), which concentrated
    every posting of a hot shingle on one partition just to count it.
    Exchange accounting (the r4 rewrite): per-doc shingle dedup is
    map-side ``array_distinct`` (no distinct shuffle); the df-count
    groupBy runs on the UNpartitioned index (partial agg keeps it
    skew-safe), and the anti probe is a broadcast. The only other
    exchanges in the plan are bounded: the shingle groupBy (≤cap-row
    posting lists), per-doc sizes (combiner-compressed to ~one row per
    doc) and the pair groupBy. Sizes and intersections are both
    computed over the capped index, mirrored exactly in the oracle.

    The intersection counts come from POSTING-LIST pair generation, not
    an index self-join: the capped index groups by shingle into a
    ≤cap-doc sorted posting list (collect_list is bounded by the df-cap,
    so no group exceeds ``cap`` rows — skew-safe by construction), and
    the ≤C(cap,2) ordered pairs per shingle are generated MAP-SIDE with
    nested array transforms. That removes the self-join and its
    hash-partitioned exchange from the plan entirely — one groupBy on
    shingle replaces repartition + join — while shuffling the same
    fixed-width int64 keys.

    The index feeds THREE plan branches (hot-count probe, posting lists,
    sizes); exchange reuse measurably does NOT collapse them (each branch
    re-ran the tokenize→hash subtree), so the RAW index is persisted via
    operators.cache — ~16 bytes/shingle, the standard materialization
    any production dedup pass makes."""
    return ngram_jaccard_pairs(load(spark, sf_dir, "documents"))


def ngram_jaccard_pairs(
    d: DataFrame,
    cap: int = NGRAM_DF_CAP,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """The ngram-Jaccard plan over an arbitrary documents frame
    (doc_id, text) — shared by the corpus query and the scale probe.
    See :func:`dedup_ngram_jaccard` for the full plan narrative."""
    # The df-count groupBy runs on the unpartitioned index (partial agg
    # ships ~one combiner row per hot key per partition — skew-safe),
    # and the broadcast anti drops hot rows map-side, so only capped,
    # bounded posting lists ever reach the shingle groupBy below.
    #
    # ONE persist (r8 rewrite, VERDICT task 1 — was two persists + a
    # sizes persist + two sizes joins at 14 jobs): the RAW index, so the
    # hot-count groupBy and the anti probe share one tokenize→hash pass
    # (~16 bytes/shingle, released with the query). The capped index now
    # has a single consumer — per-doc sizes became a COUNT OVER
    # (PARTITION BY doc_id) window (doc-bounded, skew-safe) carried INTO
    # the posting-list structs, so the Jaccard denominator rides along
    # with each pair and the sizes branch + its two joins disappear.
    sh = capped_shingles(cache.track(word_shingles(d)), cap)
    posts = (
        # collect_set, not collect_list: (doc, shingle) rows are unique
        # by construction (per-doc array_distinct + unique doc_ids), but
        # a duplicate slipping through a changed upstream would turn
        # into a nonsense self-pair — the set dedup is free at ≤cap rows
        sh.selectExpr(
            "shingle", "doc_id", "COUNT(1) OVER (PARTITION BY doc_id) AS n"
        )
        .groupBy("shingle")
        .agg(
            F.expr("sort_array(collect_set(struct(doc_id, n)))").alias("ds")
        )
        .filter("size(ds) >= 2")
    )
    jac_sql = "CAST(inter AS DOUBLE) / (na + nb - inter)"
    # Jaccard upper-bound pre-filter BELOW the pair groupBy (r15, guide
    # §2.3 — shuffle fewer bytes): inter ≤ least(na, nb) (a pair shares
    # at most the smaller doc's shingle count) and x/(na+nb−x) is
    # monotone in x, so jaccard ≤ least/(na+nb−least). The bound is a
    # function of the GROUP KEY only (same na/nb on every row of a
    # pair), so dropping bound-failing rows before the aggregate removes
    # whole groups that the final filter would discard anyway — no
    # surviving group changes. IEEE rounding preserves weak order, so
    # fl(jac(inter)) ≤ fl(jac(least)) < t is airtight. Size-skewed pairs
    # (big doc sharing one shingle with a small doc) die map-side before
    # the pair exchange instead of after it.
    bound_sql = (
        "CAST(least(na, nb) AS DOUBLE) / (na + nb - least(na, nb))"
        f" >= {threshold!r}"
    )
    # codegen pair expansion (r14): chained posexplode Generates replace
    # the interpreted ordered_pairs HOF — see functions.text.explode_pairs
    return (
        explode_pairs(posts, "ds", "a", "b")
        .selectExpr(
            "a.doc_id AS doc_a", "a.n AS na",
            "b.doc_id AS doc_b", "b.n AS nb",
        )
        .filter(bound_sql)
        .groupBy("doc_a", "na", "doc_b", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(f"{jac_sql} >= {threshold!r}")
        .selectExpr("doc_a", "doc_b", f"{dround_sql(jac_sql, 4)} AS jaccard")
    )


def _minhash_base_ctes(k: int = 12, bands: int = 4, shingle_k: int = SHINGLE_K) -> str:
    """CTE body (toks → banded) of the DuckDB MinHash/LSH twin — identical
    universal-hash permutations over the 32-bit md5 prefix (same
    md5-derived (a, b) constants), so signature values agree exactly.
    Shared by the candidates/pipeline oracles (which append the self-join
    cands CTE) and the incremental new-vs-index oracle (which appends an
    asymmetric band join instead)."""
    from us_weather_energy_analysis_pipeline_spark.operators.dedup import (
        MINHASH_P,
        minhash_params,
    )

    rows = k // bands
    band_exprs = ", ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows)
        )
        + ")"
        for b in range(bands)
    )
    hv = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    sig_mins = ", ".join(
        f"MIN((hv * {a} + {b}) % {MINHASH_P})" for a, b in minhash_params(k)
    )
    return f"""
    toks AS (
      SELECT doc_id, string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS t FROM documents
    ),
    shingles AS (
      SELECT doc_id, array_to_string(t[i:i+{shingle_k - 1}], ' ') AS shingle
      FROM toks, UNNEST(generate_series(1, len(t) - {shingle_k} + 1)) AS g(i)
      WHERE len(t) >= {shingle_k}
    ),
    hashed AS (
      SELECT doc_id, CAST({hv} AS BIGINT) AS hv
      FROM (SELECT doc_id, md5(shingle) AS h FROM shingles)
    ),
    sig AS (
      SELECT doc_id, [{sig_mins}] AS sig FROM hashed GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, u.band, [{band_exprs}][u.band + 1] AS digest
      FROM sig, UNNEST(generate_series(0, {bands - 1})) AS u(band)
    )"""


def _minhash_ctes(k: int = 12, bands: int = 4, shingle_k: int = SHINGLE_K) -> str:
    """toks → cands: the base CTEs plus the symmetric self-join candidate
    CTE (doc_a < doc_b) used by the standalone candidates query and the
    end-to-end dedup pipeline oracle (corpus/pipeline_q.py)."""
    return (
        _minhash_base_ctes(k, bands, shingle_k)
        + """,
    cands AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""
    )


def _minhash_oracle(k: int = 12, bands: int = 4, shingle_k: int = SHINGLE_K) -> str:
    """Standalone candidates oracle: the shared CTEs + per-pair estimated
    Jaccard from signature agreement."""
    return f"""
    WITH {_minhash_ctes(k, bands, shingle_k)}
    -- est_jaccard is scored on CANDIDATE pairs only (signature positions
    -- compared elementwise), mirroring the Spark pipeline — an all-pairs
    -- perseed self-join would be O(n² k) for the identical final result
    SELECT c.doc_a, c.doc_b, c.n_shared_bands,
           ROUND(list_sum(list_transform(generate_series(1, {k}),
                   i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
                 / {k}.0, 4) AS est_jaccard
    FROM cands c
    JOIN sig sa ON c.doc_a = sa.doc_id
    JOIN sig sb ON c.doc_b = sb.doc_id
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-join,
    operators/dedup.py): all bucket-local candidate pairs with their
    signature-agreement Jaccard estimate. The O(n²) pair space never
    materializes — the only pair-producing join is on (band, digest)."""
    from us_weather_energy_analysis_pipeline_spark.operators.dedup import (
        minhash_near_dups,
    )

    d = load(spark, sf_dir, "documents")
    # est_round=4 folds the corpus rounding contract into the operator's
    # single spark.sql statement (one analysis pass — r11 build cut)
    return minhash_near_dups(d, threshold=0.0, est_round=4)


def _simhash_sql_core() -> str:
    """Shared CTE text computing (doc_id, simhash) in DuckDB — identical
    bit-vote arithmetic to operators.dedup.simhash32: the first 8 hex
    digits of md5(token) parsed once into a 32-bit value ``hv``, votes are
    shifts of hv."""
    hv = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    vote_exprs = ",\n             ".join(
        f"SUM(2 * ((hv >> {p}) & 1) - 1) AS s{p}" for p in range(32)
    )
    fp = " + ".join(f"(CASE WHEN s{p} >= 0 THEN {2**p} ELSE 0 END)" for p in range(32))
    return f"""
    toks AS (
      SELECT doc_id, unnest(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS tok FROM documents
    ),
    hashed AS (SELECT doc_id, CAST({hv} AS BIGINT) AS hv
               FROM (SELECT doc_id, md5(tok) AS h FROM toks)),
    votes AS (
      SELECT doc_id,
             {vote_exprs}
      FROM hashed GROUP BY doc_id
    ),
    sh AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes)
    """


@register(
    "dedup_simhash",
    oracle="WITH " + _simhash_sql_core() + """
    SELECT doc_id, simhash FROM sh
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (operators/dedup.py simhash32): token
    md5 bit votes → sign → fingerprint. One explode + one groupBy."""
    from us_weather_energy_analysis_pipeline_spark.operators.dedup import simhash32

    return simhash32(load(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    oracle="WITH " + _simhash_sql_core() + """,
    banded AS (
      SELECT doc_id, simhash, u.band, (simhash >> (8 * u.band)) & 255 AS chunk
      FROM sh, UNNEST(generate_series(0, 3)) AS u(band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
    tags=("dedup", "simhash", "pairs"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: byte-banded bucket join (any equal byte
    quarter → candidate) then exact Hamming ≤ 6 via bit_count(xor)."""
    from us_weather_energy_analysis_pipeline_spark.operators.dedup import (
        simhash_near_dups,
    )

    return simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=6)


@register(
    "dedup_cluster_assign",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS t FROM documents
    ),
    all_shingles AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[i:i+{SHINGLE_K}-1], ' ') AS shingle
      FROM toks, UNNEST(generate_series(1, len(t) - {SHINGLE_K} + 1)) AS g(i)
    ),
    shingles AS (
      -- same df-cap as the Spark side's capped_shingles: the pair set
      -- feeding the components MUST match dedup_ngram_jaccard's exactly
      -- (at sf>=0.1 some boilerplate shingles exceed the cap, which
      -- shifts Jaccard denominators on BOTH sides)
      SELECT doc_id, shingle FROM all_shingles
      QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {NGRAM_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT p.doc_a, p.doc_b
      FROM cand p
      JOIN sizes sa ON p.doc_a = sa.doc_id
      JOIN sizes sb ON p.doc_b = sb.doc_id
      WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(node, comp) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.node
    )
    SELECT node AS doc_id,
           MIN(comp) AS cluster_id,
           CASE WHEN node = MIN(comp) THEN 1 ELSE 0 END AS is_canonical
    FROM reach GROUP BY node
    """,
    tags=("dedup", "clustering", "connected-components", "iterative"),
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup clusters via iterative min-label connected
    components (operators/components.py) — the step that turns pairwise
    similarity into keep/drop decisions. The oracle computes the same
    components with a recursive CTE; the Spark side is the distributed
    fixpoint loop (join + min-aggregate per round, lineage cut by
    localCheckpoint)."""
    from us_weather_energy_analysis_pipeline_spark.operators.components import (
        dedup_clusters,
    )

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return dedup_clusters(pairs)


@register(
    "dedup_edit_distance",
    oracle="""
    WITH docs AS (
      SELECT doc_id, substr(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), 1, 80) AS head
      FROM documents WHERE doc_id < 30
    ),
    -- ASCII guard: levenshtein units are engine-defined for non-ASCII
    -- (DuckDB counts BYTES, Spark counts UTF-16 units); restrict to
    -- heads where they provably agree, identically on both engines
    ascii AS (SELECT * FROM docs WHERE octet_length(encode(head)) = length(head))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
    FROM ascii a JOIN ascii b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 40
    """,
    tags=("dedup", "edit-distance", "levenshtein"),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup detection on document heads (bounded slice —
    Levenshtein is O(len²) per pair, so at scale it is the VERIFY step on
    LSH candidates, never a full pairwise pass; the bounded head is the
    standard trick to cap the cost). Non-ASCII heads are excluded on
    BOTH engines — levenshtein's unit is engine-defined there (DuckDB
    bytes, Spark UTF-16 units), so cross-engine distances only agree on
    single-byte text."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", F.substring(ascii_lower(F.trim(F.col("text"))), 1, 80).alias("head"))
        .filter(F.octet_length("head") == F.length("head"))
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head")).cast("long")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 40)
    )


# Incremental (new-vs-index) dedup: newcomers = doc_id % NEW_MOD < NEW_LT
# (a deterministic, sf-invariant 20% "arriving batch"; the rest is the
# already-indexed corpus). Production runs this every ingest: band the
# batch, join against the INDEX's stored band digests, drop newcomers
# whose best candidate clears the threshold — existing docs never pair
# with each other, so the join is |batch| × bucket-local, not n².
INC_NEW_MOD = 10
INC_NEW_LT = 2
INC_THRESHOLD = 0.5


def _incremental_minhash_oracle(k: int = 12, bands: int = 4) -> str:
    return f"""
    WITH {_minhash_base_ctes(k, bands)},
    pairs AS (
      SELECT a.doc_id AS doc_id, b.doc_id AS idx_doc,
             list_sum(list_transform(generate_series(1, {k}),
                 i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
               / {k}.0 AS est
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.digest = b.digest
      JOIN sig sa ON sa.doc_id = a.doc_id
      JOIN sig sb ON sb.doc_id = b.doc_id
      WHERE a.doc_id % {INC_NEW_MOD} < {INC_NEW_LT}
        AND b.doc_id % {INC_NEW_MOD} >= {INC_NEW_LT}
      GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT idx_doc) AS BIGINT) AS n_index_candidates,
           ROUND(MAX(est), 4)                      AS best_est_jaccard,
           CASE WHEN MAX(est) >= {INC_THRESHOLD} THEN 1 ELSE 0 END AS drop_flag
    FROM pairs
    GROUP BY doc_id
    """


@register(
    "dedup_incremental_minhash",
    oracle=_incremental_minhash_oracle(),
    tags=("dedup", "minhash", "lsh", "incremental"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup of an arriving batch against the indexed
    corpus — the every-ingest pass of a growing training set: newcomers
    (doc_id % 10 < 2, a deterministic 20% batch) are banded and
    joined against the index side's band digests ONLY; index docs never
    pair with each other. Emits, per newcomer WITH candidates, its
    distinct index-candidate count, best estimated Jaccard, and the
    ≥ 0.5 drop flag (newcomers with no bucket collision are absent —
    they enter the index untouched on both engines).

    Plan: the modulo split PUSHES THROUGH the signature aggregation to
    both scans (a group-key predicate), so each document is shingled and
    signatured exactly once, on exactly one side — the batch side's
    pipeline touches 20% of the corpus, the index side's 80%; then one
    (band, digest) bucket join — asymmetric: batch × index, bucket-local
    fan-in — with the signature arrays riding the banded rows (the
    minhash_near_dups shape: no post-join sig re-join), and one
    countDistinct per newcomer. The
    agreement estimate is an exact integer count / k on both engines —
    bit-identical, so the threshold compare cannot straddle a rounding
    boundary. At 100 TB the index's banded digests are a stored table
    (the compact_parquet pattern); this query recomputes them only
    because the corpus contract is self-contained per query."""
    from us_weather_energy_analysis_pipeline_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_K,
        est_jaccard_sql,
        banded_cte,
        minhash_sig_ctes,
    )

    d = load(spark, sf_dir, "documents")
    # ONE spark.sql statement over the shared minhash CTE text (r11 build
    # cut — plan identical to the staged form, BENCH_AB.md r11).
    # index LEFT, batch RIGHT: when AQE picks a broadcast build it
    # builds the RIGHT side — the 20% newcomer batch, not 80% of the
    # corpus's banded signatures (review r9: the unswapped form
    # shipped 4× the data to every task); above the broadcast
    # threshold AQE falls back to a shuffle join on (band, digest),
    # the correct both-sides-huge plan.
    return spark.sql(
        f"""
        WITH {minhash_sig_ctes()},
        {banded_cte(LSH_BANDS, MINHASH_K)},
        pairs AS (
          SELECT a.doc_id AS doc_id, b.doc_id AS idx_doc,
                 {est_jaccard_sql(MINHASH_K)} AS est
          FROM (SELECT * FROM banded
                WHERE doc_id % {INC_NEW_MOD} >= {INC_NEW_LT}) b
          JOIN (SELECT * FROM banded
                WHERE doc_id % {INC_NEW_MOD} < {INC_NEW_LT}) a
            ON a.band = b.band AND a.digest = b.digest
        )
        SELECT doc_id,
               CAST(count(DISTINCT idx_doc) AS BIGINT) AS n_index_candidates,
               {dround_sql('max(est)', 4)} AS best_est_jaccard,
               CASE WHEN max(est) >= {INC_THRESHOLD}D THEN 1 ELSE 0 END
                 AS drop_flag
        FROM pairs GROUP BY doc_id
        """,
        docs=d,
    )
