"""Spark SQL surface parity: the same engine through ``spark.sql``.

Users of the reference get a DataFrame API AND a SQL surface here — these
queries register the corpus tables as temp views and run SQL text, so the
contract proves both front-ends produce oracle-identical results (same
Catalyst plans underneath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register


def _register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "sql_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(o.o_totalprice), 2) AS total_revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("sql", "join", "agg"),
)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure Spark-SQL front-end (temp views + SQL text) — identical
    Catalyst plan to the DataFrame chain; ROUND here is Spark's, so the
    rounding goes through floor-arithmetic to stay DuckDB-exact."""
    _register_views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               floor(abs(SUM(o.o_totalprice)) * 100 + 0.5) / 100
                 * CASE WHEN SUM(o.o_totalprice) < 0 THEN -1 ELSE 1 END
                 AS total_revenue,
               COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@register(
    "sql_window_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           ROUND(o_totalprice, 2) AS total_price,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    """,
    tags=("sql", "window", "topk-per-group"),
)
def sql_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via SQL window text — per-partition partial top-k
    under the hood (rank predicate pushes the sort into each partition)."""
    _register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderkey,
               floor(o_totalprice * 100 + 0.5) / 100 AS total_price,
               rnk
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders
        )
        WHERE rnk <= 3
        """
    )
