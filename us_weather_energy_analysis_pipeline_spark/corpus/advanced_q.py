"""Advanced analytics corpus: gaps-and-islands, top-k per group, LOCF
gap-fill, distribution ranks, correlated-subquery rewrites, full-outer
reconciliation, two-pass z-scores, histograms, banded theta joins,
explicit GROUPING SETS, filtered aggregates and embedding near-dup pairs.

These extend the reference's analytic surface (SURVEY.md §2.5/§2.8 —
e.g. the prev-day lag idiom `app.py:605`, mean-impute `data_processor.py:59`)
with the query shapes a production warehouse runs daily. Every query keeps
the work shuffle-minimal: window passes share one partitioning, group
statistics are broadcast back instead of windowed over the fact table, and
tiny band/dimension tables are broadcast for non-equi joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import iso_day, r2, r4, r6
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register
from us_weather_energy_analysis_pipeline_spark.corpus._util import day_spine


# ---------------------------------------------------------------------------
# Gaps & islands: consecutive-day activity streaks per user
# ---------------------------------------------------------------------------


@register(
    "streak_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    seq AS (
      SELECT user_id, day,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM days
    )
    SELECT user_id,
           strftime(MIN(day), '%Y-%m-%d') AS streak_start,
           strftime(MAX(day), '%Y-%m-%d') AS streak_end,
           COUNT(*) AS streak_days
    FROM seq
    GROUP BY user_id, day - CAST(rn AS INTEGER)
    """,
    tags=("window", "gaps-islands", "timeseries"),
)
def streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks (gaps-and-islands): anchor =
    day - row_number() is constant within a run of consecutive days, so a
    single ordered window pass + one groupBy finds every streak. Scales as
    one shuffle on user_id; no self-join, no iteration."""
    e = load(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.withColumn("anchor", F.date_sub(F.col("day"), F.row_number().over(w)))
    return anchored.groupBy("user_id", "anchor").agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    ).select("user_id", "streak_start", "streak_end", "streak_days")


# ---------------------------------------------------------------------------
# Top-k per group (bounded rank, not global limit)
# ---------------------------------------------------------------------------


@register(
    "topk_per_group",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INTEGER) AS rnk,
           o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    QUALIFY rnk <= 3
    """,
    tags=("window", "topk", "join"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment — per-group bounded rank (the
    reference only has a global limit, O2 `app.py:559`). row_number with a
    deterministic orderkey tie-break; AQE plans the customer side broadcast.

    Two-phase (r9): the naive single window partitions by segment — FIVE
    partitions, so every order funnels into 5 sort tasks (the skew that
    kills this shape at 100 TB). Phase 1 prunes each Arrow batch to its
    per-segment top-3 in-task (global top-3 per segment is a subset of
    the union of batch top-3s, so the prune is lossless); the segment
    window then ranks ≤ 3 × n_batches survivors — same 5 partitions but
    trivially small. A JVM two-phase window over (segment,
    spark_partition_id) was measured SLOWER at sf0.1 (0.62 s vs 0.53
    current vs 0.46 this — it re-shuffles the full join output), while
    the batch prune ships only the survivors into the one exchange."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "o_orderkey", "o_totalprice"
    )

    def prune(batches):
        for pdf in batches:
            if len(pdf):
                # exact batch-local twin of the window ordering
                # (price DESC NULLS LAST, orderkey ASC — the _null
                # indicator keeps the NaN block's orderkey tie-break
                # exact); dropna=False keeps NULL segments as a group,
                # matching Window.partitionBy's NULL pooling
                yield (
                    pdf.assign(
                        _null=pdf["o_totalprice"].isna(),
                        _sp=pdf["o_totalprice"].fillna(0.0),
                    )
                    .sort_values(
                        ["_null", "_sp", "o_orderkey"],
                        ascending=[True, False, True],
                    )
                    .groupby("segment", sort=False, dropna=False)
                    .head(3)[["segment", "o_orderkey", "o_totalprice"]]
                )

    cand = j.mapInPandas(
        prune, "segment string, o_orderkey long, o_totalprice double"
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "segment",
            "rnk",
            "o_orderkey",
            r2(F.col("o_totalprice")).alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# LOCF gap-fill: date spine + last-observation-carried-forward
# ---------------------------------------------------------------------------

LOCF_CUTOFF = 250.0  # sparse series: ~12 of 30 event days have a purchase > 250


@register(
    "locf_gap_fill",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, MAX(value) AS vmax
      FROM events WHERE event_type = 'purchase' AND value > {LOCF_CUTOFF}
      GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           ROUND(d.vmax, 2) AS vmax,
           ROUND(LAST_VALUE(d.vmax IGNORE NULLS) OVER (
                 ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS vfill
    FROM spine s LEFT JOIN daily d USING (day)
    """,
    tags=("window", "locf", "spine", "timeseries", "N1"),
)
def locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill over a completed calendar (LOCF): spine left-join leaves
    nulls on observation-free days; ``last(..., ignorenulls=True)`` over an
    ordered running frame carries the previous observation forward — the
    standard imputation step the reference approximates with group-mean
    fill (N1 `data_processor.py:59-60`). One window pass, no iteration;
    partition by series key when filling many series at once."""
    e = load(spark, sf_dir, "events")
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    # ONE spark.sql statement (r11 build cut — same single-row bounds
    # spine + left join + bounded forward-fill window)
    fill = ("last(vmax, true) OVER (ORDER BY day"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    return spark.sql(
        f"""
        WITH bounds AS (
          SELECT min(to_date(ts)) AS lo, max(to_date(ts)) AS hi FROM {{e}}
        ),
        spine AS (
          SELECT explode(sequence(lo, hi, interval 1 day)) AS day FROM bounds
        ),
        daily AS (
          SELECT to_date(ts) AS day, max(value) AS vmax
          FROM {{e}}
          WHERE event_type = 'purchase' AND value > {LOCF_CUTOFF}D
          GROUP BY to_date(ts)
        )
        SELECT CAST(CAST(day AS DATE) AS STRING) AS day,
               {dround_sql('vmax', 2)} AS vmax,
               {dround_sql(fill, 2)} AS vfill
        FROM spine LEFT JOIN daily USING (day)
        """,
        e=e,
    )


# ---------------------------------------------------------------------------
# Distribution ranks: percent_rank + cume_dist within group
# ---------------------------------------------------------------------------


@register(
    "dist_percent_rank",
    oracle="""
    SELECT c_custkey,
           c_mktsegment AS segment,
           ROUND(c_acctbal, 2) AS acctbal,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS pr,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS cd
    -- non-null sort-key contract (same as rank/ntile, r4): Spark ranks
    -- NULLS FIRST asc, DuckDB NULLS LAST — NULL balances are out of scope
    FROM customer WHERE c_acctbal IS NOT NULL
    """,
    tags=("window", "distribution"),
)
def dist_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical distribution position of every customer's balance within
    its segment: percent_rank = (rank-1)/(n-1) and cume_dist = rank/n are
    rank arithmetic — exact, engine-independent doubles. One shuffle on the
    segment key serves both functions. NULL balances are excluded on both
    sides (non-null sort-key contract; engines disagree on NULL order)."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    c = load(spark, sf_dir, "customer")
    # ONE spark.sql statement (r11 build cut — one segment exchange
    # serving both rank functions)
    ow = "OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)"
    return spark.sql(
        f"""
        SELECT c_custkey, c_mktsegment AS segment,
               {dround_sql('c_acctbal', 2)} AS acctbal,
               {dround_sql(f'percent_rank() {ow}', 6)} AS pr,
               {dround_sql(f'cume_dist() {ow}', 6)} AS cd
        FROM {{c}} WHERE c_acctbal IS NOT NULL
        """,
        c=c,
    )


# ---------------------------------------------------------------------------
# Correlated-subquery shape rewritten as a window: rows above group average
# ---------------------------------------------------------------------------


@register(
    "above_group_avg",
    oracle="""
    WITH w AS (
      -- order-independent mean (r7 null-fuzz: the float AVG's summation
      -- order flipped a 4dp rounding boundary once nulls changed the
      -- group membership): exact DECIMAL sum, cast, one division
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
                    OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(o_totalprice) OVER (PARTITION BY o_custkey) AS cavg
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(cavg, 4) AS cust_avg
    FROM w WHERE o_totalprice > cavg
    """,
    tags=("window", "correlated-subquery"),
)
def above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average order value — the classic
    correlated scalar subquery (`WHERE price > (SELECT AVG ... WHERE same
    key)`) decorrelated into a single partition-window pass: one shuffle on
    o_custkey instead of a per-row subquery."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    o = load(spark, sf_dir, "orders")
    # ONE spark.sql statement (r11 build cut — same decimal-exact window
    # average over one o_custkey exchange)
    cavg = ("CAST(sum(CAST(o_totalprice AS DECIMAL(28,10)))"
            " OVER (PARTITION BY o_custkey) AS DOUBLE)"
            " / count(o_totalprice) OVER (PARTITION BY o_custkey)")
    return spark.sql(
        f"""
        SELECT o_custkey, o_orderkey,
               {dround_sql('o_totalprice', 2)} AS totalprice,
               {dround_sql('cavg', 4)} AS cust_avg
        FROM (SELECT o_custkey, o_orderkey, o_totalprice, {cavg} AS cavg
              FROM {{o}})
        WHERE o_totalprice > cavg
        """,
        o=o,
    )


# ---------------------------------------------------------------------------
# Mode (most frequent value) per group with deterministic tie-break
# ---------------------------------------------------------------------------


@register(
    "mode_event_type",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, event_type AS mode_type, n
    FROM c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) = 1
    """,
    tags=("agg", "mode", "window"),
)
def mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type — pandas ``value_counts().idxmax()``
    recast as count-then-argmax with an explicit lexicographic tie-break
    (built-in ``mode()`` is tie-nondeterministic in both engines).

    r7 plan: with the (tiny, memoized) event-type dictionary the
    (n DESC, type ASC) pick packs into ONE long — ``n*64 + (63 − idx)``,
    NULL type taking tie-rank 0 (the oracle's NULLS LAST) — so the second
    stage is ``max`` over longs: a whole-stage-codegen HashAggregate.
    The r6 ``min_by``-over-struct form planned as SortAggregate (struct
    agg buffers are not UnsafeRow-mutable), which sorts every partition
    by user_id before both the partial and final aggs — the packed form
    removes both sorts (A/B at sf0.1: 0.36→0.29 s first-run, 0.25→0.23 s
    warm, identical 1500-row output). Same staleness/width/quoting guards
    as ``cooccurrence_pairs``: >63 types or a quoted literal falls back
    to the struct aggregate; a type absent from the dictionary at
    execution raises instead of mis-ranking."""
    from us_weather_energy_analysis_pipeline_spark.corpus.behavior_q import (
        _event_type_dict,
    )

    e = load(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    types = _event_type_dict(spark, sf_dir)
    if not types or len(types) > 63 or any("'" in t or "\\" in t for t in types):
        # dictionary-free fallback: min_by over the ordering struct
        # (−n, is-null, type) — the null flag makes ties NULLS LAST,
        # matching the oracle's ORDER BY event_type default
        best = F.min_by(
            F.struct(F.col("event_type").alias("t"), F.col("n").alias("n")),
            F.struct(
                (-F.col("n")).alias("a"),
                F.col("event_type").isNull().alias("z"),
                F.col("event_type").alias("b"),
            ),
        )
        return (
            counts.groupBy("user_id")
            .agg(best.alias("_m"))
            .select(
                "user_id", F.col("_m.t").alias("mode_type"), F.col("_m.n").alias("n")
            )
        )
    tarr = "array(" + ", ".join(f"'{t}'" for t in types) + ")"
    # tie-rank: 63−idx for known types (type ASC wins high), 0 for NULL
    # (NULLS LAST), loud failure for a type the dictionary has never seen
    rank = F.expr(
        f"CASE WHEN event_type IS NULL THEN 0L "
        f"WHEN array_position({tarr}, event_type) = 0 THEN "
        f"CAST(raise_error(concat('mode_event_type: event_type absent "
        f"from memoized dictionary: ', event_type)) AS BIGINT) "
        f"ELSE 63L - (cast(array_position({tarr}, event_type) as long) - 1L) END"
    )
    packed = counts.groupBy("user_id").agg(
        F.max(F.col("n") * 64 + rank).alias("s")
    )
    tie = (F.col("s") % 64).cast("int")
    return packed.select(
        "user_id",
        F.when(tie == 0, F.lit(None).cast("string"))
        .otherwise(F.expr(f"element_at({tarr}, 64 - cast(s % 64 as int))"))
        .alias("mode_type"),
        F.expr("s div 64").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Full-outer reconciliation of two aggregates
# ---------------------------------------------------------------------------


@register(
    "full_outer_nation_counts",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, COUNT(*) AS customers
      FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1
    ),
    s AS (
      SELECT s_nationkey AS nk, COUNT(*) AS suppliers
      FROM supplier WHERE s_acctbal > 7000 GROUP BY 1
    )
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(customers, 0) AS customers,
           COALESCE(suppliers, 0) AS suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    tags=("join", "full-outer", "reconciliation"),
)
def full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of two filtered per-nation aggregates —
    the join type the reference never uses (SURVEY §2.4: inner/left only).
    Aggregating BEFORE the join shrinks both sides to ≤25 rows, so the
    full-outer is effectively free at any scale; coalesced keys + zero
    fills give the audit-style 'present on either side' view."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 7000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    return (
        c.join(s, c.nk == s.nk, "full_outer")
        .select(
            F.coalesce(c.nk, s.nk).alias("nationkey"),
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
    )


# ---------------------------------------------------------------------------
# Z-score outliers via two-pass broadcast statistics
# ---------------------------------------------------------------------------

Z_CUTOFF = 1.65


@register(
    "zscore_outliers",
    oracle=f"""
    WITH st AS (
      SELECT l_returnflag AS rf, COUNT(*) AS n,
             SUM(l_quantity) AS s, SUM(l_quantity * l_quantity) AS ss
      FROM lineitem GROUP BY 1
    ),
    z AS (
      SELECT l.l_orderkey, l.l_linenumber, st.rf, l.l_quantity AS qty,
             (l.l_quantity - st.s / st.n)
               / SQRT((st.ss - st.s * st.s / st.n) / (st.n - 1)) AS zval
      FROM lineitem l JOIN st ON l.l_returnflag = st.rf
    )
    SELECT l_orderkey, l_linenumber, rf, qty, ROUND(zval, 4) AS z
    FROM z WHERE ABS(zval) > {Z_CUTOFF}
    """,
    tags=("agg", "zscore", "quality", "broadcast"),
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging (generalizes the reference's
    fixed-threshold outlier predicate F3 `data_processor.py:95-97`) done the
    scale-correct way: a tiny moment aggregate (n, Σx, Σx²) per group is
    broadcast-joined back to the fact table — no window over 100 TB of
    rows, and the explicit moment formula yields bit-identical doubles in
    any engine (quantities are integral, so the sums are exact)."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    li = load(spark, sf_dir, "lineitem")
    # ONE spark.sql statement (r11 build cut — same broadcast moment join)
    z = ("(l_quantity - s / n)"
         " / SQRT((ss - s * s / n) / (n - 1))")
    return spark.sql(
        f"""
        WITH st AS (
          SELECT l_returnflag AS rf, count(1) AS n, sum(l_quantity) AS s,
                 sum(l_quantity * l_quantity) AS ss
          FROM {{li}} GROUP BY l_returnflag
        )
        SELECT l_orderkey, l_linenumber, rf, l_quantity AS qty,
               {dround_sql('zval', 4)} AS z
        FROM (
          SELECT /*+ BROADCAST(st) */ l_orderkey, l_linenumber, rf,
                 l_quantity, {z} AS zval
          FROM {{li}} JOIN st ON l_returnflag = rf
        )
        WHERE abs(zval) > {Z_CUTOFF}D
        """,
        li=li,
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram
# ---------------------------------------------------------------------------

HIST_WIDTH = 20000.0


@register(
    "histogram_price",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / {HIST_WIDTH}) AS INTEGER) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
    tags=("agg", "histogram", "P10"),
)
def histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram — the scalable form of the reference's
    labeled CASE binning (P10 `analysis.py:47-54`): floor-division buckets
    need no per-bucket branch, group count is map-side combinable, and the
    bucket id is bit-exact in every engine."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    o = load(spark, sf_dir, "orders")
    # ONE spark.sql statement (r11 build cut)
    b = f"CAST(floor(o_totalprice / {HIST_WIDTH}D) AS INT)"
    return spark.sql(
        f"""
        SELECT {b} AS bucket, count(1) AS n,
               {dround_sql('min(o_totalprice)', 2)} AS lo,
               {dround_sql('max(o_totalprice)', 2)} AS hi
        FROM {{o}} GROUP BY {b}
        """,
        o=o,
    )


# ---------------------------------------------------------------------------
# Banded non-equi (theta) join against a broadcast ranges table
# ---------------------------------------------------------------------------

PRICE_BANDS = [
    ("budget", 0.0, 60000.0),
    ("mid", 60000.0, 150000.0),
    ("premium", 150000.0, 300000.0),
    ("luxury", 300000.0, 1000000.0),
]


@register(
    "range_join_price_band",
    oracle="""
    SELECT b.band, COUNT(*) AS n, ROUND(SUM(o.o_totalprice), 2) AS total
    FROM orders o
    JOIN (VALUES ('budget', 0.0, 60000.0),
                 ('mid', 60000.0, 150000.0),
                 ('premium', 150000.0, 300000.0),
                 ('luxury', 300000.0, 1000000.0)) AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY 1
    """,
    tags=("join", "theta", "range", "broadcast"),
)
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join via the bucketed-grid rewrite
    (operators/rangejoin.py): each band explodes to the coarse grid cells
    it overlaps, facts equi-join on their cell, the exact [lo, hi)
    predicate refines. Catalyst plans a Broadcast HASH join on the cell
    key instead of the BroadcastNestedLoopJoin a raw inequality join gets
    — and with a non-broadcastable ranges table the same rewrite shuffles
    both sides on the cell, the only shape that survives scale."""
    from us_weather_energy_analysis_pipeline_spark.operators.rangejoin import (
        grid_range_join,
    )

    o = load(spark, sf_dir, "orders")
    from us_weather_energy_analysis_pipeline_spark.session import local_df

    bands = local_df(spark, PRICE_BANDS, "band string, lo double, hi double")
    return (
        grid_range_join(o, "o_totalprice", bands, grid=50_000.0)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), r2(F.sum("o_totalprice")).alias("total"))
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS with GROUPING() provenance flags
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    -- empty-input parity: DuckDB emits a phantom (NULL,NULL,0,NULL)
    -- grand-total row for the () set on an EMPTY table; Spark's literal
    -- GROUPING SETS (the semantics this query implements) emits zero
    -- rows. The guard only ever drops that phantom row.
    HAVING NOT (GROUPING(l_returnflag) = 1 AND COUNT(*) = 0)
    """,
    tags=("agg", "grouping-sets"),
)
def grouping_sets_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — an arbitrary lattice subset (unlike
    rollup_revenue / cube_priority_status which cover the full hierarchies)
    with GROUPING() provenance flags distinguishing 'null because
    aggregated' from 'null in the data'. SQL form: grouping-set layout is a
    planner concern, identical in the DataFrame API."""
    # A literal GROUPING SETS plan runs Expand (3× every input row)
    # BEFORE the partial aggregate. count/sum are re-aggregatable, so
    # aggregate the FINEST set once (one scan, map-side combine to ~6
    # rows) and derive the coarser sets from that tiny result — the
    # GROUPING() flags are literals per level. Finest-level NULL group
    # keys stay distinguishable via the flags, same as GROUPING SETS.
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    li = load(spark, sf_dir, "lineitem")
    # A literal GROUPING SETS over the fact table runs Expand (3x every
    # input row) BEFORE the partial aggregate, and the union-of-levels
    # form re-scanned the table per level (3 parquet scans —
    # ReuseExchange does not collapse union branches; the r14 persist
    # fixed the scans but bought 3 extra jobs for a ~6-row cache). r14
    # final shape: count/sum are re-aggregatable, so aggregate the
    # FINEST set once (one scan, map-side combine to ~6 rows) and apply
    # GROUPING SETS to THAT — Expand inflates ~6 rows to ~18, the flags
    # come from GROUPING() exactly as the literal semantics define them,
    # and the whole query is ONE scan, ONE statement, no cache.
    # Empty-input parity holds: zero fin rows -> zero expanded rows ->
    # zero output, same as literal GROUPING SETS (no phantom grand-total
    # row, unlike an ungrouped aggregate).
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               sum(n) AS n,
               {dround_sql('sum(revenue)', 2)} AS revenue
        FROM (
          SELECT l_returnflag, l_linestatus, count(1) AS n,
                 sum(l_extendedprice) AS revenue
          FROM {{li}} GROUP BY l_returnflag, l_linestatus
        )
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """,
        li=li,
    )


# ---------------------------------------------------------------------------
# Filtered aggregates (manual pivot without PIVOT)
# ---------------------------------------------------------------------------


@register(
    "filtered_agg_status",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS rev_finished
    FROM orders GROUP BY 1
    """,
    tags=("agg", "filtered", "pivot"),
)
def filtered_agg_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates — the one-pass manual pivot (`COUNT(*) FILTER`
    ≡ Spark `count_if` / `sum(when)`): all conditional columns computed in
    a single map-side-combinable aggregation instead of one scan per
    condition or a pivot shuffle."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    o = load(spark, sf_dir, "orders")
    # ONE spark.sql statement (r11 build cut)
    return spark.sql(
        f"""
        SELECT o_orderpriority AS priority,
               count_if(o_orderstatus = 'F') AS n_finished,
               count_if(o_orderstatus = 'O') AS n_open,
               count_if(o_orderstatus = 'P') AS n_pending,
               {dround_sql("sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)", 2)}
                 AS rev_finished
        FROM {{o}} GROUP BY o_orderpriority
        """,
        o=o,
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate candidate pairs
# ---------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.4  # synthetic corpus max pair cosine ≈ 0.513


@register(
    "dedup_embed_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
             AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          >= {COSINE_DUP_THRESHOLD}
    """,
    tags=("dedup", "embedding", "similarity"),
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pair detection (completes the dedup
    family: exact / n-gram / MinHash / SimHash / edit-distance / cosine).
    Brute-force O(n²) self-join — correct baseline; the 100 TB path blocks
    candidates by LSH bucket first exactly as embed_lsh_bucket_topk does
    (operators/dedup.py, operators/similarity.py), turning the cross join
    into a per-bucket join.

    Filter-and-refine (operators/similarity.py cosine_pairs_filter_refine):
    a distributed numpy block product prunes the O(n²) pair space to
    candidates above ``threshold - 1e-6``; the survivors are re-scored
    exactly with the sequential fold formula, so the output is
    bit-identical to evaluating every pair with DuckDB's
    list_cosine_similarity (the naive codegen pair join took ~14 s at
    sf0.1; this runs in ~2 s). The threshold is a parameter; 0.4 sits in
    the synthetic corpus's top tail (max pair cosine ≈ 0.513)."""
    from us_weather_energy_analysis_pipeline_spark.operators.similarity import (
        cosine_pairs_filter_refine,
    )

    emb = load(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_filter_refine(emb, COSINE_DUP_THRESHOLD)
    return pairs.select("id_a", "id_b", r4(F.col("cosine")).alias("cosine"))
