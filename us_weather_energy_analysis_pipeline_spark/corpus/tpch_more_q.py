"""TPC-H decision-support shapes beyond Q1/Q3/Q5/Q6 — adapted to the
corpus star schema (no commitdate/receiptdate/container columns, so the
predicates are re-targeted at the columns that exist while preserving each
query's *plan shape*, which is what matters for the engine).

These extend the reference's join/agg surface (SURVEY.md §2.4/§2.5 — its
only joins are a fact⨝fact inner join `pipeline.py:82` and a dim decoration
`app.py:182`) with the canonical warehouse patterns: EXISTS semi joins,
NOT-EXISTS anti joins, outer-join distributions, correlated-scalar-subquery
decorrelation, and disjunctive multi-table predicates.

Scale notes (100 TB): every query here shuffles on its natural join key at
most once; `part` is treated as broadcast-able only where TPC-H practice
allows (Q14/Q19 build side grows with SF, so those joins stay shuffle joins
and rely on AQE); Q17's per-part average reuses the l_partkey partitioning
for both the aggregate and the subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import r2, r4, r6
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    tags=("semi-join", "agg", "tpch"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-windowed order count by priority, gated on an
    EXISTS over lineitem (returned-item flag stands in for the reference
    schema's commit<receipt predicate). Spark: LEFT SEMI join — exactly the
    decorrelation Catalyst would produce for EXISTS; the lineitem side is
    pre-filtered and column-pruned to (l_orderkey) before the shuffle.
    SHUFFLE_HASH on that side: the build grows with the fact (~25% of
    lineitem), so a broadcast build is single-threaded locally and the
    backwards shape at scale. A/B (sf0.1, 2 interleaved stash-flip
    pairs, min-of-3 warm): 0.465/0.466 s -> 0.419/0.430 s."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        # SHUFFLE_HASH: never broadcast-build a lineitem-derived side —
        # single-thread build locally, and the biggest table at scale
        .hint("shuffle_hash")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("outer-join", "agg", "tpch"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. LEFT OUTER join
    with the filter on the *join condition* (not a WHERE — customers with
    zero qualifying orders must survive as c_count=0), two-level aggregation.
    First agg shuffles on c_custkey; the second input is one row per customer
    collapsing to ~tens of distinct counts, so partial (map-side) aggregation
    eliminates nearly all of the second shuffle. SHUFFLE_HASH on the
    weakly-filtered orders side (keeps ~95%): the clearest win of the
    hint audit — A/B (sf0.1, 2 interleaved stash-flip pairs, min-of-3
    warm): 0.455/0.473 s -> 0.323/0.329 s, and the per-partition build
    on custkey is the only shape that survives orders outgrowing the
    broadcast threshold."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey").hint("shuffle_hash")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
           AS promo_revenue_pct,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate over a
    fact⨝dim join with a tight date window. The shipdate predicate is pushed
    to the parquet scan (one month of data); `part` grows with SF so the join
    stays a shuffle join and AQE may convert it at runtime if the filtered
    probe side turns out small."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            r4(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS a_partkey, ROUND(0.5 * AVG(l_quantity), 6) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN avg_qty a ON l.l_partkey = a.a_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_type = 'SMALL'
      AND l.l_quantity < a.qty_thresh
    """,
    tags=("join", "correlated-scalar", "tpch"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated — but NOT into the textbook aggregate+join:
    the brand/type filter prunes `lineitem` FIRST (semi-equivalent inner
    join against the filtered `part`, broadcast-able), so the per-part
    AVG is computed only for surviving parts instead of the whole fact
    table (Catalyst cannot infer that pruning through an aggregate), and
    the threshold is a window AVG over the already-shuffled partkey
    partitions — one exchange total, no second join."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    pruned = li.join(p, li.l_partkey == p.p_partkey)
    thresh = r6(F.lit(0.5) * F.avg("l_quantity").over(Window.partitionBy("l_partkey")))
    return (
        pruned.withColumn("qty_thresh", thresh)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "disjunctive-filter", "tpch"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates spanning both
    join sides. Catalyst extracts the common single-side parts of the OR
    (brand∈{...}, quantity∈[1,30]) and pushes them below the join as
    pre-filters — verifiable in .explain(); the residual OR evaluates
    post-join inside whole-stage codegen."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    # ONE spark.sql statement (r11 build cut — same extracted common
    # predicates pushed below the join, same residual OR post-join)
    return spark.sql(
        f"""
        SELECT {dround_sql('sum(l_extendedprice * (1 - l_discount))', 2)}
                 AS revenue,
               count(1) AS n_rows
        FROM {{li}} JOIN (SELECT p_partkey, p_brand, p_size FROM {{pt}}) p
          ON p.p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
        """,
        li=li,
        pt=pt,
    )


@register(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT ROUND(AVG(c_acctbal), 6) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c.c_mktsegment
    """,
    tags=("anti-join", "scalar-subquery", "tpch"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no *recent* orders (the
    date scope keeps the result non-degenerate on dense order data). Scalar
    subquery (global average balance) broadcast as a 1-row cross join, then
    NOT EXISTS as a LEFT ANTI join against the filtered, column-pruned
    orders keys. The anti join shuffles on custkey only; the scalar side is
    a broadcast nested loop of one row — no driver collect().
    SHUFFLE_HASH on the pruned orders keys: local A/B is a tie (inside
    host noise both directions), but the build keeps ~18% of orders —
    a fraction, not a constant, so it grows linearly with the fact and
    the explicit per-partition build is the scale-safe default."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp_ntz"))
        .select("o_custkey")
        .hint("shuffle_hash")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        r6(F.avg("c_acctbal")).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
