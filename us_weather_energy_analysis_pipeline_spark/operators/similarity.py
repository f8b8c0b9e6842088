"""Similarity search over embedding columns: exact baseline + two
sub-linear scale paths.

- ``brute_force_topk``: broadcast queries × one corpus scan — the exact
  baseline every ANN variant is measured against.
- ``ivf_topk``: inverted-file search — assign each query to its nearest
  coarse cell (centroids from a pretrained/partition-level quantizer),
  search only that cell. The corpus-side shuffle is ONE groupBy on the
  cell id; at 100 TB cells map to partitions, so a query touches
  1/n_cells of the data.
- ``lsh_hyperplane``: random-hyperplane LSH — P sign bits form a bucket
  code; candidates share the exact code. Planes are deterministic
  (md5-seeded, generated driver-side) so any engine recomputes them.

All dot products are native higher-order functions (zip_with+aggregate) —
JVM-side, codegen-friendly, no Python in the scoring loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries, scan corpus once, rank per
    query (rounded score + id tie-break → deterministic).

    Norms are hoisted OUT of the pair loop: each side's ``norm`` is a
    per-ROW projection before the join, so the per-PAIR work is only the
    dot fold — bit-identical (the quotient multiplies the same two
    doubles), but the interpreted HOF evaluation (the actual cost of
    these expressions — they run outside codegen) drops ~3× since the
    corpus-side norm is no longer recomputed once per query."""
    from pyspark.sql import Window

    scored = (
        F.broadcast(queries.withColumn("_qn", norm(qvec_col)))
        .crossJoin(corpus.withColumn("_vn", norm(vec_col)))
        .filter(F.col(id_col) != F.col(qid_col))
        .select(
            qid_col,
            id_col,
            F.round(
                dot(qvec_col, vec_col) / (F.col("_qn") * F.col("_vn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def label_centroids(
    corpus: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell centroid vectors via posexplode + per-dim mean + re-collect
    (the reduce step of IVF coarse quantization). Returns
    (label, centroid array<double>)."""
    per_dim = corpus.select(
        label_col, F.posexplode(vec_col).alias("pos", "v")
    ).groupBy(label_col, "pos").agg(F.avg(F.col("v").cast("double")).alias("m"))
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
        .select(label_col, F.col("s.m").alias("centroid"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qv",
) -> DataFrame:
    """IVF search: nearest centroid per query (ties → smallest label),
    then exact cosine top-k within that cell only.

    Probed fraction = 1/n_cells of the corpus; the assignment join is
    queries × centroids (both tiny, broadcast)."""
    from pyspark.sql import Window

    cents = label_centroids(corpus, label_col, vec_col)
    q_scored = F.broadcast(queries).crossJoin(F.broadcast(cents)).select(
        qid_col,
        qvec_col,
        label_col,
        F.round(cosine(qvec_col, "centroid"), 6).alias("c_sim"),
    )
    w_assign = Window.partitionBy(qid_col).orderBy(
        F.col("c_sim").desc(), F.col(label_col).asc()
    )
    assigned = (
        q_scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(qid_col, qvec_col, F.col(label_col).alias("cell"))
    )
    in_cell = F.broadcast(assigned.withColumn("_qn", norm(qvec_col))).join(
        corpus.withColumn("_vn", norm(vec_col)),
        (F.col("cell") == F.col(label_col)) & (F.col(id_col) != F.col(qid_col)),
    )
    scored = in_cell.select(
        qid_col,
        "cell",
        id_col,
        # norms hoisted to per-row projections (see brute_force_topk)
        F.round(
            dot(qvec_col, vec_col) / (F.col("_qn") * F.col("_vn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic md5-seeded hyperplanes: w[p][i] ∈ [-127.5, 127.5]
    from the first 2 hex digits of md5(f"{p}:{i}") — any engine (or the
    SQL oracle) regenerates the identical planes."""
    return [
        [
            int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:2], 16) - 127.5
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the sequential-fold dot product — same expression tree
    as ``dot()`` (CAST both sides to DOUBLE, left-to-right fold), but one
    parser pass instead of per-element Py4J calls."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def lsh_bucket_code(vec_col: str, planes: list[list[float]]) -> Column:
    """Σ 2^p · [dot(v, w_p) ≥ 0] — the P-bit hyperplane signature.

    Built as ONE ``F.expr`` SQL string: the per-plane Column arithmetic
    (P × dim ``F.lit`` objects) was ~400 Py4J roundtrips ≈ 0.5 s of
    driver latency per call site. Plane weights are exact in SQL text
    (they are k − 127.5 halves, so ``repr`` round-trips them)."""
    terms = " + ".join(
        f"(CASE WHEN {_dot_sql(vec_col, _arr_sql(w))} >= CAST(0 AS DOUBLE) "
        f"THEN {2**p} ELSE 0 END)"
        for p, w in enumerate(planes)
    )
    return F.expr(f"CAST({terms} AS INT)")


def _arr_sql(w: list[float]) -> str:
    return "array(" + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in w) + ")"


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_planes: int = 6,
    dim: int = 64,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qv",
) -> DataFrame:
    """Bucketed ANN: candidates share the query's exact P-bit code, ranked
    by exact cosine within the bucket. The candidate join is an equi-join
    on the code — one shuffle, bucket-local pairs only."""
    from pyspark.sql import Window

    planes = hyperplanes(n_planes, dim)
    c_coded = corpus.withColumn("bucket", lsh_bucket_code(vec_col, planes)).withColumn(
        "_vn", norm(vec_col)
    )
    q_coded = queries.withColumn("bucket", lsh_bucket_code(qvec_col, planes)).withColumn(
        "_qn", norm(qvec_col)
    )
    cand = F.broadcast(q_coded).join(
        c_coded, on="bucket"
    ).filter(F.col(id_col) != F.col(qid_col))
    scored = cand.select(
        qid_col,
        "bucket",
        id_col,
        # norms hoisted to per-row projections (see brute_force_topk)
        F.round(
            dot(qvec_col, vec_col) / (F.col("_qn") * F.col("_vn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _pack_blocks(
    emb: DataFrame, id_col: str, vec_col: str, grp_col: str = "_grp", fp32: bool = False
) -> DataFrame:
    """Pack each ``(grp, bid)`` block into ONE row
    ``(grp, bid, nb, ids array<bigint>, mat binary)`` — the matrix
    serialized contiguous (``numpy.tobytes``), so a block-pair task
    reconstructs both operands with a zero-copy ``frombuffer``.
    ``fp32=True`` serializes float32 — LOSSLESS when the source column is
    ``array<float>`` (the caller checks), and it halves the shuffled bytes
    while letting the block matmul run in sgemm (~2× dgemm).
    Expects ``bid``/``nb`` columns already assigned (hash-block id and the
    group's block count)."""
    import numpy as np
    import pandas as pd

    dtype = np.float32 if fp32 else np.float64

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[vec_col].to_numpy()
        try:
            # Arrow hands list<float/double> back as per-row numpy arrays:
            # vstack is C-speed; fall back for plain-list rows.
            mat = np.vstack(vals).astype(dtype, copy=False)
        except (ValueError, TypeError):
            mat = np.array([list(v) for v in vals], dtype=dtype)
        return pd.DataFrame(
            {
                grp_col: [pdf[grp_col].iloc[0]],
                "bid": [int(pdf["bid"].iloc[0])],
                "nb": [int(pdf["nb"].iloc[0])],
                "ids": [pdf[id_col].to_numpy(dtype=np.int64)],
                "dim": [mat.shape[1]],
                "mat": [mat.tobytes()],
            }
        )

    return emb.groupBy(grp_col, "bid").applyInPandas(
        pack, f"{grp_col} long, bid int, nb int, ids array<bigint>, dim int, mat binary"
    )


def grouped_candidate_pairs(
    df: DataFrame,
    threshold: float,
    grp_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin: float = 1e-6,
    block_rows: int = 8192,
    exact: bool = False,
) -> DataFrame:
    """Candidate pairs ``(id_a < id_b)`` with numpy-filtered cosine >=
    ``threshold - margin``, WITHIN each group of ``grp_col`` — the bounded
    in-bucket verifier for LSH pipelines.

    With ``exact=True`` the survivors are re-scored IN-TASK with the
    sequential fold formula (``_seq_cosine`` — the vectors are already in
    the block payloads, so no join back to the source is needed) and the
    output gains a ``cosine`` double column holding that exact value.
    Rows are still kept down to ``threshold - margin``: the FINAL
    decision (raw ``>= threshold``, or a rounded comparison) belongs to
    the caller as a filter on the returned column — the exact value is
    bit-identical to a JVM re-score, so the decision point is unchanged,
    just without two extra joins in the plan.

    No task ever holds more than two ``block_rows``-row blocks, regardless
    of bucket size: group sizes are counted once (tiny agg, broadcast back),
    each group is hash-split into ``ceil(n/block_rows)`` blocks, and block
    pairs co-locate via one equi-join on ``(grp, i, j)``. A pathological
    bucket (everything hashed together) therefore degrades to more block
    pairs, not to one OOM-ing task. Candidates are approximate (BLAS
    summation order); callers re-score exactly before acting on them.

    The input (often a non-trivial upstream: LSH coding, projections) is
    read by two plan branches (sizes agg + pack) and the packed blocks by
    two more (left/right of the pair join) — both are persisted via
    operators.cache so no branch re-executes the upstream subtree
    (exchange reuse measurably does not collapse them)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from us_weather_energy_analysis_pipeline_spark.operators import cache

    # float32 fast path: when the source vectors are array<float>, packing
    # float32 is LOSSLESS (the refine casts back to float64 exactly), the
    # shuffled matrix bytes halve, and the block matmul runs in sgemm.
    # The fp32 pre-filter widens the cut by an accumulation-error slack and
    # every survivor is re-scored in float64 before it is emitted, so the
    # output contract (float64 cosine >= cut) is unchanged.
    vec_field = df.schema[vec_col].dataType
    fp32 = isinstance(vec_field, T.ArrayType) and isinstance(
        vec_field.elementType, T.FloatType
    )

    df = cache.track(df)
    sizes = df.groupBy(grp_col).agg(
        F.ceil(F.count(F.lit(1)) / F.lit(block_rows)).cast("int").alias("nb")
    )
    keyed = (
        df.join(F.broadcast(sizes), grp_col)
        .select(
            # xxhash64 of the group key, NOT cast(key as long): a cast
            # nulls out any non-numeric group (e.g. a hex-digest string
            # bucket) and the null-unsafe pair join would then silently
            # return ZERO candidates. The hash accepts any type; a 2^-64
            # collision merely co-blocks two buckets, whose cross pairs
            # the cosine threshold still filters.
            F.xxhash64(F.col(grp_col)).alias("_grp"),
            "nb",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("nb")).cast("int").alias("bid"),
            id_col,
            vec_col,
        )
    )
    blocks = cache.track(_pack_blocks(keyed, id_col, vec_col, fp32=fp32))
    left = blocks.select(
        F.col("_grp"),
        F.col("bid").alias("i"),
        F.explode(F.sequence("bid", F.col("nb") - 1)).alias("j"),
        F.col("ids").alias("ids_a"),
        F.col("dim").alias("dim_a"),
        F.col("mat").alias("mat_a"),
    )
    right = blocks.select(
        F.col("_grp"),
        F.explode(F.sequence(F.lit(0), "bid")).alias("i"),
        F.col("bid").alias("j"),
        F.col("ids").alias("ids_b"),
        F.col("dim").alias("dim_b"),
        F.col("mat").alias("mat_b"),
    )
    paired = left.join(right, ["_grp", "i", "j"])
    cut = threshold - margin

    def seq_cosine(va, vb) -> float:
        """Sequential-fold cosine in Python floats — bit-identical to the
        SQL ``cosine()`` expression (aggregate/zip_with fold left-to-right
        over doubles, Math.sqrt, dot / (norm_a · norm_b)), so the in-task
        refine agrees exactly with a JVM-side re-score of the same pair.

        Defined NESTED (closure) on purpose: a module-level helper would
        be cloudpickled BY REFERENCE, and the Python workers of a driver
        that merely added this repo to ITS OWN sys.path cannot import the
        package — the task would die with ModuleNotFoundError. Closures
        serialize by value and carry no package dependency."""
        import math

        d = 0.0
        for x, y in zip(va, vb):
            d = d + x * y
        na = 0.0
        for x in va:
            na = na + x * x
        nb2 = 0.0
        for y in vb:
            nb2 = nb2 + y * y
        return d / (math.sqrt(na) * math.sqrt(nb2))

    np_dtype = np.float32 if fp32 else np.float64

    def gen(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ids_a = np.asarray(r.ids_a, dtype=np.int64)
                ids_b = np.asarray(r.ids_b, dtype=np.int64)
                ma = np.frombuffer(r.mat_a, dtype=np_dtype).reshape(
                    len(ids_a), r.dim_a
                )
                mb = np.frombuffer(r.mat_b, dtype=np_dtype).reshape(
                    len(ids_b), r.dim_b
                )
                na = np.sqrt((ma * ma).sum(axis=1))
                nb = np.sqrt((mb * mb).sum(axis=1))
                cos = (ma @ mb.T) / np.outer(na, nb)
                if fp32:
                    # widen the cut by the sgemm accumulation-error bound
                    # (~dim·eps32 relative, padded); float64 re-score of the
                    # survivors below restores the exact decision boundary
                    slack = 4.0 * r.dim_a * 1.2e-7 + 1e-6
                    ii, jj = np.nonzero(cos >= cut - slack)
                else:
                    ii, jj = np.nonzero(cos >= cut)
                a, b = ids_a[ii], ids_b[jj]
                if r.i == r.j:
                    # same block on both sides: the full matrix holds each
                    # unordered pair twice ((x,y) and (y,x)) — keep the
                    # id-ordered orientation only
                    keep = a < b
                    ii, jj, a, b = ii[keep], jj[keep], a[keep], b[keep]
                    lo, hi = a, b
                else:
                    # blocks are hash-assigned, not id-ranged: a cross-block
                    # hit arrives in one orientation only — normalize to
                    # (min, max)
                    lo = np.minimum(a, b)
                    hi = np.maximum(a, b)
                if not exact:
                    if fp32:
                        # float64 re-score of the survivors (exact cast from
                        # float32), so candidates carry the same
                        # ``float64 cosine >= cut`` guarantee as the fp64
                        # path — up to ~1e-15 summation-order noise (einsum
                        # here vs BLAS matmul there), which the margin
                        # semantics already absorb: callers re-score exactly
                        # before acting on candidates
                        a64 = ma[ii].astype(np.float64)
                        b64 = mb[jj].astype(np.float64)
                        num = np.einsum("ij,ij->i", a64, b64)
                        den = np.sqrt(np.einsum("ij,ij->i", a64, a64)) * np.sqrt(
                            np.einsum("ij,ij->i", b64, b64)
                        )
                        with np.errstate(divide="ignore", invalid="ignore"):
                            keep = num / den >= cut
                        lo, hi = lo[keep], hi[keep]
                    yield pd.DataFrame({"id_a": lo, "id_b": hi})
                    continue
                # exact refine on the (few) survivors — vectors are in
                # hand, so no join back to the source relation
                keep_idx, cvals = [], []
                for t, (bi, bj) in enumerate(zip(ii, jj)):
                    c = seq_cosine(ma[bi].tolist(), mb[bj].tolist())
                    if c >= cut:  # caller applies the final threshold
                        keep_idx.append(t)
                        cvals.append(c)
                yield pd.DataFrame(
                    {
                        "id_a": lo[keep_idx],
                        "id_b": hi[keep_idx],
                        "cosine": np.asarray(cvals, dtype=np.float64),
                    }
                )

    schema = "id_a long, id_b long" + (", cosine double" if exact else "")
    return paired.mapInPandas(gen, schema)


def cosine_pairs_filter_refine(
    emb: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    margin: float = 1e-6,
    block_rows: int = 8192,
) -> DataFrame:
    """All pairs (id_a < id_b) with exact cosine >= threshold, via
    DISTRIBUTED block-pair filter-and-refine — no driver collect, no
    full-matrix broadcast (both were the round-1 scale ceiling).

    Stage 1 (pack): rows are hashed into B = ceil(n / block_rows) blocks;
    each block becomes one (ids, matrix-bytes) row (~block_rows·dim·8 B —
    half that for array<float> input, which packs lossless float32 and
    runs the block product in sgemm with a float64 survivor re-score).
    Stage 2 (pair): block i is exploded to pair keys (i, j≥i) on one side
    and (i≤j, j) on the other; an equi-join on (i, j) co-locates every
    block pair with ONE hash shuffle — each block is replicated ~B/2×,
    the irreducible cost of exact all-pairs, but no task ever holds more
    than two blocks and the driver holds nothing.
    Stage 3 (filter): per block pair, a vectorized numpy product prunes
    the pair space down to candidates above ``threshold - margin``
    (upper triangle only when i == j).
    Stage 4 (refine): survivors are re-scored EXACTLY with the sequential
    fold formula (``cosine()`` above), so the result is bit-identical to
    evaluating every pair — numpy's BLAS summation order differs from the
    fold only at ~1e-15 relative, far inside the margin.

    Returns (id_a, id_b, cosine) with the raw double cosine — callers
    round/alias as needed. For web-scale corpora where even B² block
    pairs is too many, run the approximate path first (LSH banding as in
    ``lsh_topk``) and feed each bucket through this exact verifier.

    Implemented as ``grouped_candidate_pairs`` with one constant group —
    the same bounded block-pair machinery the LSH pipelines use per
    bucket (no separate count action, no driver-held sizes). The exact
    re-score happens IN-TASK (``exact=True`` — the block payloads hold
    the vectors), so no join back to ``emb`` appears in the plan.
    """
    return grouped_candidate_pairs(
        emb.withColumn("_g", F.lit(0)),
        threshold,
        "_g",
        id_col=id_col,
        vec_col=vec_col,
        margin=margin,
        block_rows=block_rows,
        exact=True,
    ).filter(F.col("cosine") >= threshold)
