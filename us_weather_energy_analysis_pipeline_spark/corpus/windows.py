"""Window-function corpus: last-per-group, keep-first dedup, lag/diff/pct.

The reference's pandas idioms (sort+groupby-last, drop_duplicates keep-first,
diff, prev-day join) all become Spark window functions over
``Window.partitionBy(key).orderBy(time)`` — one shuffle per partitioning,
reused across frame computations (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import iso_day, r2, r4
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register


def iso_ts(col) -> Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


@register(
    "last_per_group",
    oracle="""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           event_type AS last_type,
           ROUND(value, 2) AS last_value
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    tags=("window", "A4"),
)
def last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key (reference A4 `app.py:599`,
    sort_values+groupby.last). r6: ``max_by`` over the (ts, event_id)
    struct — struct ordering IS the (ts DESC, event_id DESC) pick, and
    null ts sorts smallest on both forms (desc window = NULLS LAST), so
    results match the r5 row_number window exactly. The aggregate is
    partial-combinable: map-side combine reduces every partition to one
    row per user BEFORE the exchange, where the sort window shuffled
    every event row — the decisive shape at 100 TB."""
    e = load(spark, sf_dir, "events")
    best = F.max_by(
        F.struct(
            F.col("ts").alias("ts"),
            F.col("event_type").alias("t"),
            F.col("value").alias("v"),
        ),
        F.struct(F.col("ts").alias("a"), F.col("event_id").alias("b")),
    )
    return (
        e.groupBy("user_id")
        .agg(best.alias("_m"))
        .select(
            "user_id",
            iso_ts(F.col("_m.ts")).alias("last_ts"),
            F.col("_m.t").alias("last_type"),
            r2(F.col("_m.v")).alias("last_value"),
        )
    )


@register(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id, event_type
    FROM events
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
        ORDER BY ts ASC, event_id ASC) = 1
    """,
    tags=("window", "dedup", "O3"),
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-dedup keeping the first row in a deterministic order (reference
    O3 `data_processor.py:16` drop_duplicates keep='first'; tie-break made
    explicit per SURVEY §7.3 — raw-API order becomes (ts, event_id)).
    r6: ``min_by`` over the (ts, event_id) struct replaces the sort
    window — same pick incl. NULLS FIRST asc semantics (null struct
    fields sort smallest), with map-side partial combine instead of a
    full per-key sort shuffle (see ``last_per_group``). r14: group on
    the native 4-byte date (date→string is injective, so the groups are
    identical) — the ISO string is built once per output group, not per
    input row, and the shuffle key narrows (paired A/B 0.41→0.34 s at
    sf0.1)."""
    e = load(spark, sf_dir, "events")
    first = F.min_by(
        F.struct(F.col("event_id").alias("e"), F.col("event_type").alias("t")),
        F.struct(F.col("ts").alias("a"), F.col("event_id").alias("b")),
    )
    return (
        e.groupBy("user_id", F.col("ts").cast("date").alias("_day"))
        .agg(first.alias("_m"))
        .select(
            "user_id",
            iso_day("_day").alias("day"),
            F.col("_m.e").alias("event_id"),
            F.col("_m.t").alias("event_type"),
        )
    )


@register(
    "lag_diff_pct",
    oracle="""
    WITH daily AS (
      -- NULL ts is out of scope for a time-ordered series (r7 ts
      -- null-fuzz): a NULL day would sort NULLS FIRST in Spark's lag
      -- window and NULLS LAST here, shifting every lag by one
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             SUM(value) AS total
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, day,
           ROUND(total, 2) AS total,
           ROUND(total - LAG(total) OVER (PARTITION BY event_type ORDER BY day), 2) AS diff,
           CASE WHEN LAG(total) OVER (PARTITION BY event_type ORDER BY day) > 0
                THEN ROUND((total - LAG(total) OVER (PARTITION BY event_type ORDER BY day))
                           / LAG(total) OVER (PARTITION BY event_type ORDER BY day) * 100, 4)
                ELSE 0 END AS pct_change
    FROM daily
    """,
    tags=("window", "P14", "P15", "J3"),
)
def lag_diff_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prev-period lookup via lag — subsumes the reference's prev-day join
    (J3 `app.py:605`), first-order differencing (P15 `app.py:714-716`) and
    guarded percent-change (P14 `app.py:610-613`) in one window pass."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    e = load(spark, sf_dir, "events")
    # ONE spark.sql statement (r11 build cut — same daily agg + one
    # ordered window pass)
    prev = "lag(total) OVER (PARTITION BY event_type ORDER BY _day)"
    return spark.sql(
        f"""
        WITH daily AS (
          -- group on the native date key; the ISO string is built on the
          -- post-agg rows (r14 — date→string is injective, same groups,
          -- same lag order: ISO strings sort exactly like their dates).
          -- The date key stays named _day through the window (ADVICE
          -- r14): aliasing the string as `day` in the SAME select as the
          -- lag made the window's ORDER BY resolve to the input date
          -- column only by a name-resolution subtlety.
          SELECT event_type, CAST(ts AS DATE) AS _day,
                 sum(value) AS total
          FROM {{e}} WHERE ts IS NOT NULL
          GROUP BY event_type, CAST(ts AS DATE)
        ),
        lagged AS (
          SELECT event_type, _day, total,
                 {prev} AS prev FROM daily
        )
        SELECT event_type, CAST(_day AS STRING) AS day,
               {dround_sql('total', 2)} AS total,
               {dround_sql('total - prev', 2)} AS diff,
               CASE WHEN prev > 0
                    THEN {dround_sql('(total - prev) / prev * 100', 4)}
                    ELSE 0.0D END AS pct_change
        FROM lagged
        """,
        e=e,
    )


@register(
    "moving_avg_7d",
    oracle="""
    WITH daily AS (
      -- NULL ship dates are out of scope for the time-ordered series
      -- (r7 null-fuzz: the NULL day would lead the Spark frame and
      -- trail the DuckDB one, shifting the trailing average)
      SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, SUM(l_extendedprice) AS total
      FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
    )
    SELECT day, ROUND(total, 2) AS total,
           ROUND(AVG(total) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS ma7
    FROM daily
    """,
    tags=("window", "frame", "timeseries"),
)
def moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average over the daily series — explicit rows
    frame (the only frame spec family the reference needs, SURVEY §2.8,
    extended to a bounded trailing window). r14: the daily rollup groups
    on the native date (ISO formatting deferred to the ~2.5k post-agg
    rows; ISO strings order exactly like their dates, so the frame walks
    the identical sequence — paired A/B 0.40→0.29 s at sf0.1)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").isNotNull())
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("_day")).agg(
        F.sum("l_extendedprice").alias("total")
    )
    w = Window.orderBy("_day").rowsBetween(-6, 0)
    return daily.select(
        iso_day("_day").alias("day"),
        r2(F.col("total")).alias("total"),
        r4(F.avg("total").over(w)).alias("ma7"),
    )


@register(
    "weekday_profile",
    oracle="""
    SELECT dayname(l_shipdate) AS day_of_week,
           CASE WHEN dayofweek(l_shipdate) = 6 THEN 1 ELSE 0 END AS is_saturday,
           COUNT(*) AS n,
           ROUND(AVG(l_quantity), 4) AS avg_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("project", "P8", "P9"),
)
def weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week naming + Saturday predicate (reference P8 `analysis.py:55`,
    P9 `app.py:739`). Convention trap handled deliberately: pandas dayofweek
    Monday=0/Saturday=5, Spark dayofweek Sunday=1/Saturday=7, DuckDB
    dayofweek Sunday=0/Saturday=6 (SURVEY §7.3)."""
    from us_weather_energy_analysis_pipeline_spark.corpus.pivot_q import DAY_ORDER

    li = load(spark, sf_dir, "lineitem")
    # Sunday-first rotation of the canonical Monday-first DAY_ORDER, so
    # index (Spark dayofweek, Sunday=1) maps straight into element_at —
    # derived, not a third hand-maintained day list
    names = F.array(*[F.lit(d) for d in (DAY_ORDER[-1],) + DAY_ORDER[:-1]])
    return (
        # group on the 1-7 dayofweek int (no per-row EEEE formatting);
        # name lookup + Saturday flag derive from the 7 post-agg rows
        li.groupBy(F.dayofweek("l_shipdate").alias("_dw"))
        .agg(F.count(F.lit(1)).alias("n"), r4(F.avg("l_quantity")).alias("avg_qty"))
        .select(
            # explicit NULL guard (r7 l_shipdate null-fuzz): Spark 4.1's
            # element_at(arr, NULL) returns the LAST element, not NULL —
            # the NULL-date group was silently labeled 'Saturday'
            F.when(
                F.col("_dw").isNotNull(), F.element_at(names, F.col("_dw"))
            ).alias("day_of_week"),
            F.when(F.col("_dw") == 7, 1).otherwise(0).alias("is_saturday"),
            "n",
            "avg_qty",
        )
    )


@register(
    "asof_join_last_view",
    oracle="""
    WITH purchases AS (
      -- NULL-ts purchases are out of scope on both sides (r7 ts
      -- null-fuzz): NULL >= v.ts is never true, but DuckDB's ASOF sort
      -- treats a NULL probe as +inf and matches the LATEST view, while
      -- the Spark carry yields NULL — neither is SQL-derivable; excluded
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    views AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           ROUND(v.value, 2) AS view_value
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    tags=("join", "asof", "window"),
)
def asof_join_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): each purchase aligned with
    the user's most recent prior view. Spark lacks ASOF JOIN; the
    union-and-carry window construction costs ONE shuffle on the key —
    the oracle uses DuckDB's native ASOF LEFT JOIN to cross-check.
    Both sides are predicates over the SAME event stream, so the r6
    single-scan variant replaces the two filtered scans + union with one
    scan and a CASE side tag (equality-tested against the two-frame
    operator in tests/test_asof_similarity.py)."""
    from us_weather_energy_analysis_pipeline_spark.operators.asof import (
        asof_backward_same_source,
    )

    e = load(spark, sf_dir, "events")
    joined = asof_backward_same_source(
        e,
        ["user_id"],
        "ts",
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull(),
        F.col("event_type") == "view",
        ["event_id", "user_id", "ts"],
        ["value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        iso_ts("ts").alias("purchase_ts"),
        iso_ts("ts_asof").alias("view_ts"),
        r2(F.col("value_asof")).alias("view_value"),
    )


EWMA_ALPHA = 0.2


@register(
    "ewma_daily",
    oracle=f"""
    WITH daily AS (
      -- NULL ts out of scope: a NULL day would seed the recursion on the
      -- Spark side (NULLS FIRST) and trail it here (r7 ts null-fuzz)
      SELECT strftime(ts, '%Y-%m-%d') AS day, SUM(value) AS total
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    seq AS (
      SELECT day, total,
             ROW_NUMBER() OVER (ORDER BY day) - 1 AS t
      FROM daily
    ),
    acc AS (
      SELECT day, total, t,
             SUM(total / POW(1 - {EWMA_ALPHA}, t)) OVER (ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS s,
             POW(1 - {EWMA_ALPHA}, t) AS decay,
             SUM((1.0) / POW(1 - {EWMA_ALPHA}, t)) OVER (ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS w
      FROM seq
    )
    SELECT day, ROUND(total, 2) AS total,
           ROUND(decay * s / (decay * w), 4) AS ewma
    FROM acc
    """,
    tags=("window", "ewma", "timeseries"),
)
def ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over the daily series WITHOUT
    recursion: ewma_t = Σᵢ≤t (1-α)^(t-i)·xᵢ / Σᵢ≤t (1-α)^(t-i).

    Epoch-chunked (r6, VERDICT task 8): the classic rescaled-cumsum trick
    (Σ xᵢ·β⁻ⁱ scaled by βᵗ) overflows a double once β⁻ᵗ > ~1.8e308 — at
    α=0.2 that is t ≈ 3178 days, and precision degrades much earlier.
    Chunking bounds every exponent by the epoch length instead of the
    series length: within epoch k (local index j = t mod L) the prefix
    P_t = Σ xᵢ·β⁻ʲⁱ uses β⁻ʲ ≤ β^-(L-1) ≈ 2.1e12 — flat for ANY horizon —
    and the cross-epoch recursion C_k = A_k + β^L·C_{k-1} is folded with
    lagged epoch-end accumulators:

        N_t ≈ βʲ·P_t + βʲ⁺¹·(A_{k-1} + β^L·A_{k-2})

    truncated after two carries because β^L ≈ 4.3e-13 (β²L ≈ 1.8e-25):
    older epochs contribute below the double ulp of any convex-weight
    average, far inside the 4-dp output round. Same for the weight sum
    W_t with xᵢ ≡ 1; ewma = N/W. Plan shape: the in-epoch windows are
    PARTITIONED by epoch (distributed-friendly); only the t-assignment
    row_number and the #epochs-row lag frame are global, both on bounded
    inputs (daily rollup / epoch aggregate — allowlisted)."""
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # native-date group key; the ISO day string the frame carries is
    # built on the post-agg daily rows, not per event (r14)
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("_day"))
        .agg(F.sum("value").alias("total"))
        .select(iso_day("_day").alias("day"), "total")
    )
    return ewma_frame(daily)


def ewma_frame(
    daily: DataFrame, alpha: float = EWMA_ALPHA, L: int = 128
) -> DataFrame:
    """Epoch-chunked EWMA over a (day, total) frame — see ``ewma_daily``.
    Exposed at DF level so property tests can drive multi-year synthetic
    series through the exact production plan."""
    beta = 1.0 - alpha
    b, bL = repr(beta), repr(beta**L)
    # Fused carry plumbing (r10, VERDICT r9 task 3): the old shape
    # branched seq into a groupBy(epoch) aggregate + an epoch-lag window
    # + a broadcast join back — three extra exchanges/jobs and a doubly
    # computed seq. Instead every row carries its epoch-END accumulators
    # via an unbounded-following frame over the SAME epoch partition
    # spec (one WindowExec evaluates p/q and a/b in a single pass —
    # Spark groups window expressions by (partition, order) spec
    # regardless of frame), and the one-/two-epoch-back carries come
    # from range frames over the bounded epoch index (RANGE [-1,-1] /
    # [-2,-2]: all rows of an epoch hold the identical A_k, so MAX over
    # the frame IS the lagged scalar). Identical arithmetic →
    # bit-identical output; the plan is one linear pipeline, no join,
    # no aggregation branch.
    #
    # selectExpr, not Column chains (r10): building this plan from
    # Column objects cost 0.24-0.32 s of py4j round-trips PER BENCH RUN
    # (each F.* call is a JVM hop; bench rebuilds the DataFrame every
    # timed run) — four SQL strings parse JVM-side in single calls and
    # produce the same analyzed plan. repr(beta) round-trips the exact
    # double, so parsed literals are bit-identical to F.lit(beta).
    w_ep = ("PARTITION BY epoch ORDER BY j "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
    w_end = ("PARTITION BY epoch ORDER BY j "
             "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")
    seq = daily.selectExpr(
        "day",
        "total",
        f"(ROW_NUMBER() OVER (ORDER BY day) - 1) % {L} AS j",
        f"CAST((ROW_NUMBER() OVER (ORDER BY day) - 1) / {L} AS BIGINT)"
        " AS epoch",
    ).selectExpr(
        "day",
        "total",
        "j",
        "epoch",
        f"SUM(total * POW({b}, -j)) OVER ({w_ep}) AS p",  # β⁻ʲ, j < L → bounded
        f"SUM(POW({b}, -j)) OVER ({w_ep}) AS q",
    ).selectExpr(
        "day",
        "total",
        "j",
        "p",
        "q",
        # A_k = β^(j_end)·P_end, B_k = β^(j_end)·Q_end on every row
        f"MAX_BY(POW({b}, j) * p, j) OVER ({w_end}) AS a",
        f"MAX_BY(POW({b}, j) * q, j) OVER ({w_end}) AS b",
        "epoch",
    ).selectExpr(
        "day",
        "total",
        "j",
        "p",
        "q",
        "COALESCE(MAX(a) OVER (ORDER BY epoch RANGE BETWEEN 1 PRECEDING"
        f" AND 1 PRECEDING), 0.0D) + {bL} * COALESCE(MAX(a) OVER (ORDER"
        " BY epoch RANGE BETWEEN 2 PRECEDING AND 2 PRECEDING), 0.0D)"
        " AS ca",
        "COALESCE(MAX(b) OVER (ORDER BY epoch RANGE BETWEEN 1 PRECEDING"
        f" AND 1 PRECEDING), 0.0D) + {bL} * COALESCE(MAX(b) OVER (ORDER"
        " BY epoch RANGE BETWEEN 2 PRECEDING AND 2 PRECEDING), 0.0D)"
        " AS cb",
    )
    num = f"(POW({b}, j) * p + POW({b}, j) * {b} * ca)"
    den = f"(POW({b}, j) * q + POW({b}, j) * {b} * cb)"
    return seq.selectExpr(
        "day",
        # dround(·, 2) / dround(·, 4) written out (same IEEE op order as
        # corpus/_util.dround: signum·floor(|x|·10ⁿ + 0.5)/10ⁿ)
        "SIGNUM(CAST(total AS DOUBLE)) * FLOOR(ABS(CAST(total AS DOUBLE))"
        " * 100.0D + 0.5D) / 100.0D AS total",
        f"SIGNUM(CAST({num} / {den} AS DOUBLE))"
        f" * FLOOR(ABS(CAST({num} / {den} AS DOUBLE)) * 10000.0D + 0.5D)"
        " / 10000.0D AS ewma",
    )


@register(
    "revenue_share",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, SUM(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT nation,
           ROUND(revenue, 2) AS revenue,
           ROUND(revenue / SUM(revenue) OVER () * 100, 4) AS pct_of_total,
           CAST(RANK() OVER (ORDER BY revenue DESC, nation) AS INTEGER) AS rnk
    FROM rev
    """,
    tags=("window", "ratio-to-report", "rank"),
)
def revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report with ranking: each nation's share of global revenue
    via an unpartitioned window sum over the (small) aggregate — the
    window runs on 25 rows, never on the fact table."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    # ONE spark.sql statement (r11 build cut — same broadcast-dim join
    # chain + 25-row windows)
    return spark.sql(
        f"""
        WITH rev AS (
          SELECT /*+ BROADCAST(nt) */ n_name AS nation,
                 sum(o_totalprice) AS revenue
          FROM {{o}} JOIN {{c}} ON o_custkey = c_custkey
          JOIN {{nt}} nt ON c_nationkey = n_nationkey
          GROUP BY n_name
        )
        SELECT nation,
               {dround_sql('revenue', 2)} AS revenue,
               {dround_sql('revenue / sum(revenue) OVER () * 100', 4)}
                 AS pct_of_total,
               rank() OVER (ORDER BY revenue DESC, nation) AS rnk
        FROM rev
        """,
        o=o,
        c=c,
        nt=n,
    )
