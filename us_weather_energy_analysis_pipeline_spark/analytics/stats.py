"""Correlation / OLS statistics (reference `src/analysis.py:6-39`).

scipy.linregress + statsmodels OLS collapse to closed-form aggregates:
slope = Sxy/Sxx, intercept = ȳ − slope·x̄, r = corr, R² = r², and the
mean-prediction CI from (n, x̄, Sxx, MSE). ONE distributed aggregation
pass, no MLlib, no UDF (SURVEY §2.5 A13).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# t_{∞,0.975}; the reference uses alpha=0.05 (analysis.py:33). When scipy
# is importable, prediction_frame defaults to the EXACT t.ppf(.975, n-2)
# quantile (statsmodels parity at small n, VERDICT r7 task 10); this
# asymptotic constant is the fallback in scipy-less environments.
T_CRIT_95 = 1.959964


def t_crit_95(n: int) -> float:
    """Two-sided 95% t critical value for an OLS mean-prediction band on
    ``n`` observations (df = n − 2): ``scipy.stats.t.ppf(.975, n-2)`` when
    scipy is present, else the asymptotic ``T_CRIT_95``. Driver-side
    scalar — never evaluated per row."""
    if n <= 2:
        return T_CRIT_95  # df ≤ 0: band is NaN anyway (mse is NaN)
    try:
        from scipy.stats import t as _t  # import-gated: not in the container
    except ImportError:
        return T_CRIT_95
    return float(_t.ppf(0.975, n - 2))


@dataclass
class OlsFit:
    slope: float
    intercept: float
    r_value: float
    r_squared: float
    n: int
    xbar: float
    sxx: float  # Σ(x-x̄)²
    mse: float  # SSE/(n-2)


def correlation_stats(df: DataFrame, x: str, y: str) -> OlsFit | None:
    """Fit y ~ x. Returns None for n<2 or zero x-variance (the reference's
    guard `analysis.py:13-14`). Rows with a null on either side are dropped
    first (F6 `analysis.py:12`)."""
    clean = df.na.drop(subset=[x, y])
    # corr() raises DIVIDE_BY_ZERO under ANSI mode (Spark 4 default) when a
    # side has zero variance — derive r with try_divide instead, null-safe.
    row = clean.agg(
        F.covar_samp(x, y).alias("sxy_n"),
        F.var_samp(x).alias("sxx_n"),
        F.var_samp(y).alias("syy_n"),
        F.avg(x).alias("xbar"),
        F.avg(y).alias("ybar"),
        F.try_divide(
            F.covar_samp(x, y), F.sqrt(F.var_samp(x) * F.var_samp(y))
        ).alias("r"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = row["n"]
    if n < 2 or not row["sxx_n"]:
        return None
    slope = row["sxy_n"] / row["sxx_n"]
    intercept = row["ybar"] - slope * row["xbar"]
    r = row["r"] if row["r"] is not None else 0.0
    sse = (row["syy_n"] - row["sxy_n"] ** 2 / row["sxx_n"]) * (n - 1)
    mse = sse / (n - 2) if n > 2 else float("nan")
    return OlsFit(
        slope=slope,
        intercept=intercept,
        r_value=r,
        r_squared=r * r,
        n=n,
        xbar=row["xbar"],
        sxx=row["sxx_n"] * (n - 1),
        mse=mse,
    )


def prediction_frame(
    df: DataFrame, x: str, y: str, t_crit: float | None = None
) -> DataFrame | None:
    """Mean-prediction band over the observed x values (reference
    `analysis.py:24-37` statsmodels get_prediction().summary_frame():
    columns x, mean, mean_ci_lower, mean_ci_upper, sorted by x).

    ŷ ± t·√(MSE·(1/n + (x₀−x̄)²/Sxx)) — the fit is one aggregate pass;
    the band is then a scalar-broadcast projection over the x values.
    ``t_crit=None`` (default) resolves to :func:`t_crit_95` of the fitted
    n — exact statsmodels parity when scipy is importable, the asymptotic
    1.959964 otherwise. Pass an explicit value to pin either behavior.
    """
    fit = correlation_stats(df, x, y)
    if fit is None:
        return None
    if t_crit is None:
        t_crit = t_crit_95(fit.n)
    xs = df.na.drop(subset=[x, y]).select(F.col(x).alias("x")).distinct()
    y_hat = F.lit(fit.intercept) + F.lit(fit.slope) * F.col("x")
    se = F.sqrt(
        F.lit(fit.mse)
        * (1.0 / fit.n + F.pow(F.col("x") - F.lit(fit.xbar), 2) / F.lit(fit.sxx))
    )
    return xs.select(
        "x",
        y_hat.alias("mean"),
        (y_hat - t_crit * se).alias("mean_ci_lower"),
        (y_hat + t_crit * se).alias("mean_ci_upper"),
    ).orderBy("x")
