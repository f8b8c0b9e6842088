"""Core relational corpus: scans, filters, projections, joins, aggregations.

Each query re-expresses a reference operator (SURVEY.md §2 ids cited per
query) over the driver's TPC-H-ish tables. All plans are declarative
DataFrame chains — Catalyst gets predicate pushdown, column pruning and
join-strategy choice for free; at 100 TB the dimension joins broadcast and
the fact-fact join sort-merges on the shuffled key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.functions.text import ascii_lower

from us_weather_energy_analysis_pipeline_spark.corpus._util import iso_day, r2, r4
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "A3", "flagship"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship multi-aggregate rollup (reference A3, `app.py:701-704` analog).

    Single scan → partial (map-side) aggregation → 6-group final agg. The
    filter and the 7-column projection push into the parquet scan.
    """
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    li = load(spark, sf_dir, "lineitem")
    # ONE spark.sql statement (r11 build cut — same pushed scan + 2-phase agg)
    dp = "l_extendedprice * (1 - l_discount)"
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               {dround_sql('sum(l_quantity)', 2)} AS sum_qty,
               {dround_sql('sum(l_extendedprice)', 2)} AS sum_base_price,
               {dround_sql(f'sum({dp})', 2)} AS sum_disc_price,
               {dround_sql(f'sum({dp} * (l_tax + 1))', 2)} AS sum_charge,
               {dround_sql('avg(l_quantity)', 4)} AS avg_qty,
               {dround_sql('avg(l_extendedprice)', 4)} AS avg_price,
               {dround_sql('avg(l_discount)', 4)} AS avg_disc,
               count(1) AS count_order
        FROM {{li}}
        WHERE l_shipdate <= CAST('1998-09-02 00:00:00' AS TIMESTAMP_NTZ)
        GROUP BY l_returnflag, l_linestatus
        """,
        li=li,
    )


@register(
    "ts_daily_rollup",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m-%d')       AS ship_day,
           ROUND(AVG(l_quantity), 4)              AS avg_qty,
           ROUND(SUM(l_extendedprice), 2)         AS total_price,
           COUNT(*)                               AS n_rows
    FROM lineitem
    GROUP BY 1
    """,
    tags=("agg", "A3", "timeseries"),
)
def ts_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-cities daily time series (reference A3 `app.py:701-704`):
    mean measure + summed measure per day."""
    li = load(spark, sf_dir, "lineitem")
    return (
        # native-date group key; ISO formatting deferred to the ~2.5k
        # post-agg rows
        li.groupBy(F.to_date("l_shipdate").alias("_d"))
        .agg(
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r2(F.sum("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            iso_day("_d").alias("ship_day"), "avg_qty", "total_price", "n_rows"
        )
    )


@register(
    "filter_date_set",
    oracle="""
    SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           ROUND(o_totalprice, 2) AS total_price, o_orderpriority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("filter", "F1", "F2"),
)
def filter_date_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range + set-membership filter (reference F1 `app.py:442-446`).
    Both predicates push down to the parquet scan (PushedFilters)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .select(
            "o_orderkey",
            "o_custkey",
            iso_day("o_orderdate").alias("order_day"),
            r2(F.col("o_totalprice")).alias("total_price"),
            "o_orderpriority",
        )
    )


@register(
    "join_fact_orders",
    oracle="""
    SELECT o.o_orderpriority,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "J1"),
)
def join_fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE core inner equi-join (reference J1 `pipeline.py:86`), fact⨝fact.

    At 100 TB this is a shuffle join on l_orderkey/o_orderkey; the status
    filter reduces the build side before the shuffle (Catalyst pushes it
    below the join automatically). Deliberately UNHINTED (unlike
    tpch_q4/q13): a SHUFFLE_HASH hint here forces the wide lineitem
    probe through an exchange that the small-SF broadcast avoids
    entirely — A/B'd at sf0.1 (2 interleaved stash-flip pairs,
    min-of-3 warm): hint loses 0.64/0.71 s → 0.68/0.77 s. At 100 TB
    the planner's size stats exceed the broadcast threshold and flip
    this to a sort-merge join on l_orderkey unaided.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_dims_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           ROUND(AVG(c.c_acctbal), 4) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "J2", "broadcast"),
)
def join_dims_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⨝dim⨝dim with explicit broadcast (reference J2 `app.py:182`).

    nation/region are tiny dims — broadcast them so the plan is a single
    shuffle-free map-side join chain before the final aggregation.
    """
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            r4(F.avg("c_acctbal")).alias("avg_acctbal"),
        )
    )


@register(
    "top_k_orders",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
    tags=("sort", "limit", "O1", "O2"),
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by measure with deterministic tie-break (reference O1+O2
    `app.py:559`). Spark executes this as TakeOrderedAndProject — no full
    sort materialization at scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(
            "o_orderkey",
            r2(F.col("o_totalprice")).alias("total_price"),
            "o_orderpriority",
        )
        .limit(50)
    )


@register(
    "distinct_event_types",
    oracle="SELECT DISTINCT event_type FROM events",
    tags=("distinct", "A11"),
)
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct values (reference A11 `app.py:431`) — partial-distinct
    map-side then exchange on the key."""
    return load(spark, sf_dir, "events").select("event_type").distinct()


@register(
    "union_slices",
    oracle="""
    WITH u AS (
      SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
    )
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM u GROUP BY event_type
    """,
    tags=("union", "O4"),
)
def union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all of homogeneous slices (reference O4 `pipeline.py:82-83`)
    via unionByName — the per-city concat loop collapses into one plan."""
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    clicks = e.filter(F.col("event_type") == "click")
    buys = e.filter(F.col("event_type") == "purchase")
    return (
        clicks.unionByName(buys)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), r2(F.sum("value")).alias("total_value"))
    )


@register(
    "dates_except",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS day FROM orders
    EXCEPT
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS day FROM lineitem
    """,
    tags=("setop", "O5"),
)
def dates_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference on date sets (reference O5 `pipeline.py:43,60`).
    ``subtract`` is EXCEPT DISTINCT, matching the SQL EXCEPT oracle.

    Each side is pre-distincted so the partial aggregation compresses the
    exchange to ~one row per distinct DAY per partition (the raw fact
    rows never shuffle), the set op runs on 4-byte DATE values, and the
    ISO string formatting happens once per RESULT row at the end — not
    once per fact row before the exchange."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    ).distinct()
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("d")
    ).distinct()
    return o.subtract(li).select(iso_day("d").alias("day"))


@register(
    "unit_convert_project",
    oracle="""
    SELECT event_id,
           ROUND(value * 9 / 5 + 32, 4)                            AS value_f,
           strftime(ts, '%Y-%m-%d')                                AS day,
           TRY_CAST(props AS DOUBLE)                               AS props_num,
           TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_val
    FROM events
    WHERE event_type = 'view'
    """,
    tags=("project", "P1", "P2", "P4"),
)
def unit_convert_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar projections: C→F conversion as a native expression (reference
    P1 `data_processor.py:6-8` — no UDF), timestamp→day truncation (P2),
    string→numeric with null-on-error via try_cast (P4 `errors='coerce'`),
    and regex field extraction."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    return e.select(
        "event_id",
        r4(F.col("value") * 9 / 5 + 32).alias("value_f"),
        iso_day("ts").alias("day"),
        # numeric-prefix guard before try_cast: Spark's string→double
        # try_cast is exception-driven per row (~2.6 μs on a JSON string
        # that can never parse); the one-char class check rejects '{…}'
        # instantly and passes EVERY string a valid double can start
        # with, so accepted semantics are exactly try_cast's. The skip
        # class includes \x00-\x1f, not just Java \s: UTF8String.trimAll
        # strips ALL ISO control chars before parsing, so '\x1f1.5'
        # casts to 1.5 and the guard must admit it (ADVICE r5).
        F.when(
            F.col("props").rlike(r"^[\s\x00-\x1f]*[-+.0-9iInN]"),
            F.expr("try_cast(props as double)"),
        ).alias("props_num"),
        F.expr(r"""try_cast(regexp_extract(props, '"k": (\\d+)', 1) as bigint)""").alias("k_val"),
    )


@register(
    "bin_quantity_case",
    oracle="""
    SELECT CASE WHEN l_quantity >= 40 THEN '40+'
                WHEN l_quantity >= 30 THEN '30-40'
                WHEN l_quantity >= 20 THEN '20-30'
                WHEN l_quantity >= 10 THEN '10-20'
                ELSE NULL END AS qty_bin,
           COUNT(*) AS n,
           ROUND(AVG(l_extendedprice), 4) AS avg_price
    FROM lineitem
    GROUP BY 1
    """,
    tags=("project", "P10", "binning"),
)
def bin_quantity_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-closed binning with out-of-range → null (reference P10
    `analysis.py:47-54`, pd.cut right=False semantics): values below the
    lowest edge fall out as a NULL bucket, preserved by the group-by."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    qty_bin = (
        F.when(q >= 40, "40+")
        .when(q >= 30, "30-40")
        .when(q >= 20, "20-30")
        .when(q >= 10, "10-20")
        .otherwise(F.lit(None).cast("string"))
    )
    return li.groupBy(qty_bin.alias("qty_bin")).agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
    )


@register(
    "bin_quantity_case_low",
    oracle="""
    SELECT CASE WHEN l_quantity >= 40 THEN '40+'
                WHEN l_quantity >= 30 THEN '30-40'
                WHEN l_quantity >= 20 THEN '20-30'
                WHEN l_quantity >= 10 THEN '10-20'
                WHEN l_quantity IS NOT NULL THEN '<10'
                ELSE NULL END AS qty_bin,
           COUNT(*) AS n,
           ROUND(AVG(l_extendedprice), 4) AS avg_price
    FROM lineitem
    GROUP BY 1
    """,
    tags=("project", "P10", "binning"),
)
def bin_quantity_case_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DASHBOARD binning variant (reference `dashboards/app.py:63-65`:
    pd.cut with a leading 0 edge and a catch-all '<50°F' first label — vs
    the canonical src variant where below-range rows fall out as NULL,
    `bin_quantity_case` above). Exercises the documented library path:
    `functions.temp_range_bin` with a prepended −inf edge. NULL measures
    stay NULL in either variant (pd.cut propagates NaN)."""
    from us_weather_energy_analysis_pipeline_spark.functions import temp_range_bin

    li = load(spark, sf_dir, "lineitem")
    qty_bin = temp_range_bin(
        "l_quantity",
        edges=(float("-inf"), 10.0, 20.0, 30.0, 40.0),
        labels=("<10", "10-20", "20-30", "30-40", "40+"),
    )
    return li.groupBy(qty_bin.alias("qty_bin")).agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
    )


@register(
    "scalar_stats",
    oracle="""
    SELECT strftime(MIN(ts), '%Y-%m-%d')        AS min_day,
           strftime(MAX(ts), '%Y-%m-%d')        AS max_day,
           ROUND(AVG(value), 4)                 AS avg_value,
           ROUND(MEDIAN(value), 4)              AS median_value,
           ROUND(MIN(value), 2)                 AS min_value,
           ROUND(MAX(value), 2)                 AS max_value,
           COUNT(*)                             AS n
    FROM events
    """,
    tags=("agg", "A10", "median"),
)
def scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar min/max/mean/exact-median report (reference A10 — date bounds
    `app.py:414-415`, median split `app.py:623`). Exact percentile (not
    approx) for oracle parity per SURVEY §7.3."""
    e = load(spark, sf_dir, "events")
    return e.agg(
        iso_day(F.min("ts")).alias("min_day"),
        iso_day(F.max("ts")).alias("max_day"),
        r4(F.avg("value")).alias("avg_value"),
        r4(F.expr("percentile(value, 0.5)")).alias("median_value"),
        r2(F.min("value")).alias("min_value"),
        r2(F.max("value")).alias("max_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rollup_revenue",
    oracle="""
    SELECT COALESCE(r.r_name, 'ALL')  AS region,
           COALESCE(n.n_name, 'ALL')  AS nation,
           COUNT(*)                   AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    tags=("agg", "rollup", "grouping-sets"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (region → nation → grand total) — the
    multidimensional-aggregate extension beyond the reference's pivots:
    one pass produces all grouping levels (partial aggregation still
    applies; no per-level rescans)."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    # ONE spark.sql statement (r11 build cut — same broadcast joins +
    # single-pass ROLLUP)
    return spark.sql(
        f"""
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation,
               n_customers, total_acctbal
        FROM (
          SELECT /*+ BROADCAST(n), BROADCAST(r) */ r_name, n_name,
                 count(1) AS n_customers,
                 {dround_sql('sum(c_acctbal)', 2)} AS total_acctbal
          FROM {{c}} JOIN {{n}} n ON c_nationkey = n_nationkey
          JOIN {{r}} r ON n_regionkey = r_regionkey
          GROUP BY ROLLUP(r_name, n_name)
        )
        """,
        c=c,
        n=n,
        r=r,
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two-hop join → grouped
    revenue → deterministic top-20. Catalyst pushes all three predicates
    into the scans; the customer side shrinks below the broadcast
    threshold before joining orders. The lineitem join carries an
    explicit SHUFFLE_HASH hint on the (customer⨝orders) side: the
    static planner otherwise picks broadcast-build on the WEAKLY
    filtered lineitem (shipdate keeps ~half the fact — a single-thread
    hash build locally, and the backwards shape at 100 TB where
    lineitem is the largest table); hinting the orders side keeps the
    per-partition build on the smaller input and the fact on the
    streamed side at every scale. A/B (sf0.1, min-of-3 warm, 4
    interleaved pairs): 0.87–1.07 s → 0.57–0.74 s, wins every pair."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    co = c.join(o, c.c_custkey == o.o_custkey).hint("shuffle_hash")
    return (
        co.join(li, li.l_orderkey == co.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            iso_day("o_orderdate").alias("order_day"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(20)
    )


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("join", "multiway", "tpch"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join with a region-filtered dim chain.
    nation/region/supplier broadcast; the only real shuffles are the
    customer⨝orders⨝lineitem fact joins and the final 5-group agg.
    Same SHUFFLE_HASH hint as Q3 on the lineitem join's build side —
    the date filter keeps ~1/7 of orders, so (customer⨝orders) is the
    small side at every scale, while the static planner would otherwise
    broadcast-build the UNFILTERED lineitem locally. A/B (sf0.1,
    min-of-3 warm, 4 interleaved pairs): 0.67–1.11 s → 0.50–0.68 s."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    co = c.join(o, c.c_custkey == o.o_custkey).hint("shuffle_hash")
    return (
        co.join(li, li.l_orderkey == co.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "tpch"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter + scalar agg —
    the pure-pushdown benchmark: every predicate reaches PushedFilters,
    ReadSchema is 4 columns, no shuffle at all (single-row result)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value), 2) AS sum_value,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "skew", "salting"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted aggregation (operators/skew.py) over the
    5-key (hence maximally skewed) event_type column. The oracle is the
    PLAIN aggregate — salting must change only the shuffle distribution,
    never the result."""
    from us_weather_energy_analysis_pipeline_spark.operators.skew import (
        salted_sum_count,
    )

    e = load(spark, sf_dir, "events")
    out = salted_sum_count(e, ["event_type"], "value", n_salts=16)
    return out.select(
        "event_type", r2(F.col("sum_value")).alias("sum_value"), "n_rows"
    )


@register(
    "sample_hash_mod",
    oracle="""
    WITH hashed AS (
      SELECT o_orderpriority, o_totalprice,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 100 AS bucket
      FROM (SELECT *, md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders)
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_sampled,
           ROUND(SUM(o_totalprice), 2) AS sampled_revenue
    FROM hashed WHERE bucket < 10
    GROUP BY o_orderpriority
    """,
    tags=("sample", "deterministic"),
)
def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% systematic sample via key-hash bucketing — the
    reproducible sampling pattern for 100 TB pipelines (same rows selected
    on every engine and every run, unlike rand()-based sampling)."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    return (
        o.filter(bucket < 10)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            r2(F.sum("o_totalprice")).alias("sampled_revenue"),
        )
    )


@register(
    "quantiles_exact",
    oracle="""
    SELECT ROUND(quantile_cont(l_extendedprice, 0.10), 4) AS p10,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    """,
    tags=("agg", "quantiles", "A10"),
)
def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-quantile profile (linear interpolation — DuckDB
    quantile_cont semantics, SURVEY §7.3 A10). Adaptive via
    operators/quantile.py: below the 2M-value gate a count-gated parallel
    Arrow collect + numpy interpolation (the right plan at this sf);
    above it, literal-boundary range binning + partition-offset ranks so
    the sort parallelizes over value-range bins instead of percentile()'s
    single aggregation buffer — the only shape that survives 100 TB."""
    from us_weather_energy_analysis_pipeline_spark.operators.quantile import (
        exact_quantiles_row,
    )

    li = load(spark, sf_dir, "lineitem")
    qs = [0.10, 0.25, 0.50, 0.75, 0.90, 0.99]
    names = ["p10", "p25", "p50", "p75", "p90", "p99"]
    return exact_quantiles_row(li, "l_extendedprice", qs, names, round_expr=r4)


@register(
    "map_view_decorated",
    oracle="""
    WITH latest AS (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, o.o_orderdate,
             LAG(o.o_totalprice) OVER (PARTITION BY c.c_custkey
                                       ORDER BY o.o_orderdate, o.o_orderkey) AS prev_price,
             ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      -- NULL order dates are out of scope for the latest/prev logic
      -- (time-ordered contract, r7 null-fuzz: engines disagree on NULL
      -- order in both the lag and the rn=1 sort)
      WHERE c.c_custkey < 100 AND o.o_orderdate IS NOT NULL
    ),
    l2 AS (SELECT * FROM latest WHERE rn = 1),
    stats AS (
      SELECT MEDIAN(o_totalprice) AS med, MIN(o_totalprice) AS lo,
             MAX(o_totalprice) AS hi
      FROM l2
    )
    SELECT l2.c_custkey,
           printf('%.1f', ROUND(l2.o_totalprice, 1)) AS price_label,
           CASE WHEN l2.prev_price > 0
                THEN ROUND((l2.o_totalprice - l2.prev_price) / l2.prev_price * 100, 4)
                ELSE 0 END AS pct_change,
           CASE WHEN l2.o_totalprice > s.med THEN 'red' ELSE 'green' END AS color,
           ROUND(5 + (l2.o_totalprice - s.lo) / (s.hi - s.lo) * 25, 2) AS radius,
           replace(replace(replace(replace(replace(
             '<cust ' || l2.c_custkey || ' & "latest">',
             '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
             '"', '&quot;'), '''', '&#x27;') AS tooltip_html
    FROM l2 CROSS JOIN stats s
    """,
    tags=("P12", "P13", "P14", "P18", "A4", "map-view"),
)
def map_view_decorated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full map-view decoration (A4 latest-per-key + J3→lag
    prev value + P14 guarded pct-change + P12 number formatting + P13
    median color split and min-max radius scaling, plus P18 HTML-escaped
    tooltip text — reference `dashboards/app.py:490`) over the TPC-H
    analog. Formatting happens AFTER DuckDB-exact rounding so
    printf('%.1f') emits identical strings on both engines."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql
    from us_weather_energy_analysis_pipeline_spark.functions.scalars import (
        html_escape_sql,
    )

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    # ONE spark.sql statement (r11 build cut — plan identical to the
    # staged window form, BENCH_AB.md r11). NULL guard on price_label:
    # java.util.Formatter renders a NULL arg as the string 'null' while
    # DuckDB printf propagates NULL.
    pct = dround_sql("(o_totalprice - prev_price) / prev_price * 100", 4)
    radius = dround_sql(
        "(o_totalprice - min(o_totalprice) OVER ())"
        " / (max(o_totalprice) OVER () - min(o_totalprice) OVER ()) * 25 + 5",
        2,
    )
    tooltip = html_escape_sql("concat('<cust ', c_custkey, ' & \"latest\">')")
    return spark.sql(
        f"""
        WITH l2 AS (
          SELECT * FROM (
            SELECT c_custkey, o_orderkey, o_totalprice, o_orderdate,
                   lag(o_totalprice) OVER (
                     PARTITION BY c_custkey
                     ORDER BY o_orderdate, o_orderkey) AS prev_price,
                   row_number() OVER (
                     PARTITION BY c_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM (
              SELECT c_custkey, o_orderkey, o_totalprice, o_orderdate
              FROM {{c}} JOIN {{o}} ON c_custkey = o_custkey
              WHERE c_custkey < 100 AND o_orderdate IS NOT NULL
            )
          ) WHERE rn = 1
        )
        SELECT c_custkey,
               CASE WHEN o_totalprice IS NOT NULL
                    THEN format_string('%.1f', {dround_sql('o_totalprice', 1)})
               END AS price_label,
               CASE WHEN prev_price > 0 THEN {pct} ELSE 0.0D END AS pct_change,
               CASE WHEN o_totalprice > percentile(o_totalprice, 0.5) OVER ()
                    THEN 'red' ELSE 'green' END AS color,
               {radius} AS radius,
               {tooltip} AS tooltip_html
        FROM l2
        """,
        c=c,
        o=o,
    )


@register(
    "ntile_deciles",
    oracle="""
    SELECT decile,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
      WHERE o_totalprice IS NOT NULL
    )
    GROUP BY decile
    """,
    tags=("window", "ntile", "distribution"),
)
def ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment via exact NTILE over a deterministic total order
    — the distribution-profiling companion to quantiles_exact (both
    engines share ntile's equal-height bucket rule). Runs on
    ``operators/rank.py``'s range-binned global rank: a parallel sort
    over literal-boundary bins, not a single-partition window (the input
    is the full fact table, so the one-task sort would be the straggler
    at scale). Columns are pruned before the rank so the persisted probe
    input carries 2 columns, not the whole table. Null prices are
    excluded on BOTH engines (rank.py's documented non-null-key
    contract; SQL NTILE would otherwise place them per NULLS LAST)."""
    from us_weather_energy_analysis_pipeline_spark.operators.rank import (
        global_ntile,
    )

    o = (
        load(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderkey")
        .filter(F.col("o_totalprice").isNotNull())
    )
    return (
        global_ntile(
            o, "o_totalprice", 10, tiebreaks=("o_orderkey",), out_col="decile"
        )
        .withColumn("decile", F.col("decile").cast("long"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.min("o_totalprice")).alias("lo"),
            r2(F.max("o_totalprice")).alias("hi"),
        )
    )


@register(
    "cube_priority_status",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL')   AS status,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
    tags=("agg", "cube", "grouping-sets"),
)
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all four grouping levels in one pass
    (completes the grouping-sets family next to rollup_revenue)."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    o = load(spark, sf_dir, "orders")
    # ONE spark.sql statement (r11 build cut)
    return spark.sql(
        f"""
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               n, total
        FROM (
          SELECT o_orderpriority, o_orderstatus, count(1) AS n,
                 {dround_sql('sum(o_totalprice)', 2)} AS total
          FROM {{o}} GROUP BY CUBE(o_orderpriority, o_orderstatus)
        )
        """,
        o=o,
    )


@register(
    "regexp_normalize",
    oracle="""
    SELECT doc_id,
           regexp_replace(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9 ]+', '', 'g')      AS text_clean,
           regexp_replace(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' +', ' ', 'g')              AS text_onespace,
           md5(regexp_replace(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9 ]+', '', 'g')) AS clean_fp
    FROM documents
    """,
    tags=("text", "regexp", "normalize"),
)
def regexp_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex text normalization (strip non-alphanumerics, collapse
    whitespace) + normalized fingerprint — the canonicalization step ahead
    of exact dedup; pure codegen regexp_replace."""
    d = load(spark, sf_dir, "documents")
    norm = ascii_lower(F.trim(F.col("text")))
    clean = F.regexp_replace(norm, "[^a-z0-9 ]+", "")
    return d.select(
        "doc_id",
        clean.alias("text_clean"),
        F.regexp_replace(norm, " +", " ").alias("text_onespace"),
        F.md5(clean).alias("clean_fp"),
    )


@register(
    "count_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id)                 AS n_users,
           COUNT(DISTINCT CAST(ts AS DATE))        AS n_days,
           COUNT(*)                                AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "distinct-agg"),
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (exact): Catalyst expands multiple
    DISTINCTs into an Expand + two-phase aggregate — one logical pass.
    At 100 TB swap to approx_count_distinct (HLL) where ±2% is acceptable;
    exact kept here for oracle parity."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "semi_join_customers",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_active
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY n.n_name
    """,
    tags=("join", "semi"),
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with recent orders, counted per
    nation. Semi joins never duplicate or widen the probe side — the
    build side reduces to its join key before shuffling. SHUFFLE_HASH
    hint on the orders side: local A/B ties (inside host noise), but
    the build keeps ~24% of orders — a fraction that grows linearly
    with the fact — so the explicit per-partition hash build on custkey
    is the shape that holds when orders outgrows the broadcast
    threshold."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).hint("shuffle_hash")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    active = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    return (
        active.join(n, active.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "monthly_rollup",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           ROUND(AVG(o_totalprice), 4) AS avg_order
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "calendar", "timeseries"),
)
def monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy rollup (day→month grain): date_trunc both
    engines; the month key doubles as a natural partition key for
    long-horizon fact tables."""
    o = load(spark, sf_dir, "orders")
    return (
        # truncate to a native month-start date for the group key; format
        # the handful of post-agg rows
        o.groupBy(F.trunc("o_orderdate", "month").alias("_m"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r2(F.sum("o_totalprice")).alias("revenue"),
            r4(F.avg("o_totalprice")).alias("avg_order"),
        )
        .select(
            F.date_format("_m", "yyyy-MM").alias("month"),
            "n_orders",
            "revenue",
            "avg_order",
        )
    )


@register(
    "json_props_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT)   AS sum_k,
           ROUND(AVG(CAST(k AS DOUBLE)), 4) AS avg_k
    FROM (
      SELECT event_type,
             -- json_type guard: Spark's from_json('k BIGINT') yields a
             -- value ONLY for an integral JSON number in bigint range
             -- (quoted "123", 1.5, true, arrays -> NULL); DuckDB's bare
             -- TRY_CAST(json_extract_string(...)) would coerce quoted
             -- numbers and ROUND doubles ('1.5' -> 2) - probed on 11
             -- payload shapes, the type guard matches Spark exactly
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k
      FROM events
    )
    GROUP BY event_type
    """,
    tags=("json", "semi-structured", "agg"),
)
def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd JSON extraction + rollup over the semi-structured
    ``events.props`` column — the metadata-sidecar parse every training
    pipeline runs on JSONL provenance fields. ``from_json`` with an
    explicit one-field schema is the JVM-native path (vectorizable
    Jackson parse, PERMISSIVE mode → NULL on malformed input OR
    non-integral k — quoted "123", 1.5, true, arrays all yield NULL;
    the oracle twins this exactly via json_valid + a json_type
    BIGINT/UBIGINT guard, probed on 11 payload shapes — a bare
    TRY_CAST(json_extract_string(...)) would coerce quoted numbers and
    round doubles); per event type it emits total events, parseable-k
    count, and exact/mean k.

    Scale shape: a pure scan-stage projection (the parse) into one
    map-side-combining aggregate keyed on event_type — shuffle volume
    O(#types × partitions). Regex extraction of the same field is the
    fallback the ``unit_convert_project`` query covers (P4); this is the
    structured-parse twin a real JSON column wants (regex breaks on
    reordered keys, escaping, nesting — a parsed path does not)."""
    e = load(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            r4(F.avg(F.col("k").cast("double"))).alias("avg_k"),
        )
    )


@register(
    "dates_intersect",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS day FROM orders
    INTERSECT
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS day FROM lineitem
    """,
    tags=("setop", "intersect"),
)
def dates_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection on date sets — completes the set-op family
    (union_slices, dates_except): days that appear as BOTH an order date
    and a ship date. ``intersect`` is INTERSECT DISTINCT, matching the
    SQL oracle; same shape discipline as dates_except — each side
    pre-distincted so partial aggregation compresses the exchanges to
    ~one row per distinct DAY per partition, the set op runs on 4-byte
    DATE values, and ISO formatting happens once per RESULT row."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    ).distinct()
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("d")
    ).distinct()
    return o.intersect(li).select(iso_day("d").alias("day"))
