"""Statistics corpus: correlation + closed-form OLS with CI (reference A12/A13).

The reference uses scipy.linregress + statsmodels OLS (`analysis.py:6-39`).
Here the regression is pure aggregates — slope = cov/var, R² = corr², CI of
the mean prediction from (n, x̄, Sxx, MSE) — so the whole fit is ONE
distributed aggregation pass and stays SQL-expressible (SURVEY §2.5 A13
mapping decision: no MLlib, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql, r4, r6
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register

# Two-sided 97.5% normal quantile. The reference's statsmodels CI uses the
# t-distribution (alpha=0.05, `analysis.py:33`); at the row counts this
# engine targets, t_{n-2} ≈ N(0,1). Pinned as a constant so the computation
# stays a pure aggregate (no scipy dependency).
T_CRIT = 1.959964


@register(
    "corr_pearson",
    oracle="""
    SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(corr(l_discount, l_tax), 6)           AS corr_disc_tax,
           COUNT(*) AS n
    FROM lineitem
    """,
    tags=("stats", "A12"),
)
def corr_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation as a native aggregate (reference A12
    `analysis.py:17-21`)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        r6(F.corr("l_discount", "l_tax")).alias("corr_disc_tax"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "ols_closed_form",
    oracle="""
    SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r_squared,
           ROUND(corr(l_quantity, l_extendedprice), 6)           AS r_value,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    """,
    tags=("stats", "A13"),
)
def ols_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope/intercept/R² closed-form from covariance aggregates
    (reference A13 `analysis.py:17-19` scipy.linregress → cov/var identity).
    One aggregation pass; the DuckDB oracle uses its native regr_* family —
    numerically the same estimator."""
    # complete-case contract, explicit on BOTH engines: avg/count over
    # rows where either variable is NULL would diverge from the
    # pairwise-deleting covariance aggregates (DuckDB regr_* family).
    # ONE spark.sql statement (r11 build cut).
    li = load(spark, sf_dir, "lineitem")
    slope = "sxy / sxx"
    return spark.sql(
        f"""
        SELECT {dround_sql(slope, 6)} AS slope,
               {dround_sql(f'ybar - {slope} * xbar', 6)} AS intercept,
               {dround_sql('r * r', 6)} AS r_squared,
               {dround_sql('r', 6)} AS r_value,
               n
        FROM (
          SELECT covar_samp(l_quantity, l_extendedprice) AS sxy,
                 var_samp(l_quantity) AS sxx,
                 avg(l_quantity) AS xbar,
                 avg(l_extendedprice) AS ybar,
                 corr(l_quantity, l_extendedprice) AS r,
                 count(1) AS n
          FROM {{li}}
          WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        )
        """,
        li=li,
    )


@register(
    "ols_ci_frame",
    oracle=f"""
    WITH fit AS (
      SELECT regr_slope(l_extendedprice, l_quantity)     AS slope,
             regr_intercept(l_extendedprice, l_quantity) AS intercept,
             regr_avgx(l_extendedprice, l_quantity)      AS xbar,
             regr_sxx(l_extendedprice, l_quantity)       AS sxx,
             COUNT(*)                                    AS n,
             (regr_syy(l_extendedprice, l_quantity)
              - POW(regr_sxy(l_extendedprice, l_quantity), 2)
                / regr_sxx(l_extendedprice, l_quantity))
             / (COUNT(*) - 2)                            AS mse
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    pts AS (SELECT UNNEST([10.0, 20.0, 30.0, 40.0, 50.0]) AS x0)
    SELECT pts.x0,
           ROUND(fit.intercept + fit.slope * pts.x0, 4) AS y_hat,
           ROUND(fit.intercept + fit.slope * pts.x0
                 - {T_CRIT} * SQRT(fit.mse * (1.0 / fit.n + POW(pts.x0 - fit.xbar, 2) / fit.sxx)), 4)
             AS ci_lower,
           ROUND(fit.intercept + fit.slope * pts.x0
                 + {T_CRIT} * SQRT(fit.mse * (1.0 / fit.n + POW(pts.x0 - fit.xbar, 2) / fit.sxx)), 4)
             AS ci_upper
    FROM pts CROSS JOIN fit
    """,
    tags=("stats", "A13", "ci"),
)
def ols_ci_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-prediction confidence band (reference A13 `analysis.py:24-37`
    statsmodels get_prediction summary_frame): ŷ ± t·√(MSE·(1/n + (x₀−x̄)²/Sxx)),
    computed from ONE aggregation pass joined to a literal evaluation grid."""
    # complete-case contract, explicit on BOTH engines: avg/count over
    # rows where either variable is NULL would diverge from the
    # pairwise-deleting covariance aggregates (DuckDB regr_* family).
    # ONE spark.sql statement (r11 build cut — plans identical, same
    # broadcast grid join; BENCH_AB.md r11). SSE = Syy − Sxy²/Sxx, all
    # sample-scaled by (n−1) consistently.
    li = load(spark, sf_dir, "lineitem")
    y_hat = "(ybar - slope * xbar) + slope * x0"
    se = "SQRT(mse * (1.0D / n + POWER(x0 - xbar, 2) / sxx))"
    return spark.sql(
        f"""
        WITH agg AS (
          SELECT covar_samp(l_quantity, l_extendedprice) AS sxy_n,
                 var_samp(l_quantity) AS sxx_n,
                 var_samp(l_extendedprice) AS syy_n,
                 avg(l_quantity) AS xbar,
                 avg(l_extendedprice) AS ybar,
                 count(1) AS n
          FROM {{li}}
          WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        ),
        fit AS (
          SELECT sxy_n / sxx_n AS slope, xbar, ybar, n,
                 sxx_n * (n - 1) AS sxx,
                 (syy_n - sxy_n * sxy_n / sxx_n) * (n - 1) / (n - 2) AS mse
          FROM agg
        ),
        pts AS (
          SELECT explode(array(10.0D, 20.0D, 30.0D, 40.0D, 50.0D)) AS x0
          FROM range(1)
        )
        SELECT /*+ BROADCAST(fit) */ x0,
               {dround_sql(y_hat, 4)} AS y_hat,
               {dround_sql(f'{y_hat} - {se} * {T_CRIT}', 4)} AS ci_lower,
               {dround_sql(f'{y_hat} + {se} * {T_CRIT}', 4)} AS ci_upper
        FROM pts CROSS JOIN fit
        """,
        li=li,
    )


@register(
    "ols_by_group",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r_squared,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    GROUP BY l_returnflag
    """,
    tags=("stats", "A13", "grouped"),
)
def ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS — one regression PER KEY in a single aggregation pass
    (the reference fits per-city via a Python loop, `app.py:780`; here
    every group's covariance aggregates ride the same shuffle). This is
    the pattern that fits millions of per-entity models at 100 TB."""
    # complete-case contract, explicit on BOTH engines: avg/count over
    # rows where either variable is NULL would diverge from the
    # pairwise-deleting covariance aggregates (DuckDB regr_* family).
    # ONE spark.sql statement (r11 build cut).
    li = load(spark, sf_dir, "lineitem")
    slope = "sxy / sxx"
    return spark.sql(
        f"""
        SELECT l_returnflag,
               {dround_sql(slope, 6)} AS slope,
               {dround_sql(f'ybar - {slope} * xbar', 6)} AS intercept,
               {dround_sql('r * r', 6)} AS r_squared,
               n
        FROM (
          SELECT l_returnflag,
                 covar_samp(l_quantity, l_extendedprice) AS sxy,
                 var_samp(l_quantity) AS sxx,
                 avg(l_quantity) AS xbar,
                 avg(l_extendedprice) AS ybar,
                 try_divide(covar_samp(l_quantity, l_extendedprice),
                            SQRT(var_samp(l_quantity) * var_samp(l_extendedprice)))
                   AS r,
                 count(1) AS n
          FROM {{li}}
          WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          GROUP BY l_returnflag
        )
        """,
        li=li,
    )
