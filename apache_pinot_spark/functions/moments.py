"""Exact central-moment pack — the deterministic sibling of the dialect's
float moment aggregates (VARIANCE / SKEWNESS / KURTOSIS / FOURTHMOMENT).

The dialect binds those names to Spark's built-in aggregates, which merge
partial states in partition order — numerically strong (Welford-style
merges) but not bit-reproducible across engines, so they cannot sit
behind a hash-comparing oracle gate. This module computes the same
population moments from EXACT integer/decimal power sums (one map-side
combined aggregate, zero extra shuffles) and derives the moments in one
fixed-order double expression: +, -, *, /, sqrt are IEEE-correctly
rounded, so identical expression trees give bit-identical doubles on any
engine. Use it when results must be reproducible (oracle gates,
regression pinning); use the dialect aggregates when numerical
robustness at extreme scale matters more (their Welford merges avoid the
catastrophic cancellation raw power sums can hit when variance << mean²).

The raw power sums stay exact as long as sum(x^4) fits the carrier:
BIGINT holds ~9.2e18 — e.g. values ≤ 10^3 over ≤ 9e6 rows, or values
≤ 50 over ~1.4e12 rows. Callers supply an exactly-representable integer
column expression (the gate-side guard for that contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_central_moments(df: DataFrame, x: Column) -> DataFrame:
    """One-row frame (n, mean, var_pop, skew_pop, kurt_pop,
    fourth_moment) over integer-valued ``x`` (cast to BIGINT for exact
    power sums). Population conventions: var = m2, skew = m3/m2^1.5,
    kurt = m4/m2^2 (not excess), fourth_moment = m4 — matching the
    dialect's FOURTHMOMENT family (tests/test_stats_aggs.py).

    The double expression mirrors, operation for operation, the ANSI
    text in suites/ops_suite.py's stats_moment_pack oracle — keep the
    two in lockstep or the hash gate breaks.
    """
    q = x.cast("bigint")
    s = df.agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m = s.select(
        n.cast("long").alias("n"),
        mu.alias("mu"),
        r2.alias("r2"),
        r3.alias("r3"),
        r4.alias("r4"),
    )
    mu, r2, r3, r4 = (F.col(c) for c in ("mu", "r2", "r3", "r4"))
    var_pop = r2 - mu * mu
    m3 = r3 - F.lit(3) * mu * r2 + F.lit(2) * mu * mu * mu
    m4 = (
        r4 - F.lit(4) * mu * r3 + F.lit(6) * mu * mu * r2
        - F.lit(3) * mu * mu * mu * mu
    )
    # Zero variance (constant input, or n <= 1) leaves skew/kurt
    # undefined — emit NULL explicitly rather than a 0/0 whose rendering
    # differs across engines and ANSI modes (the dialect float aggregates
    # carry the same constant-group guard; see tests/test_stats_aggs.py).
    return m.select(
        F.col("n"),
        mu.alias("mean"),
        var_pop.alias("var_pop"),
        F.when(var_pop != 0, m3 / (var_pop * F.sqrt(var_pop))).alias("skew_pop"),
        F.when(var_pop != 0, m4 / (var_pop * var_pop)).alias("kurt_pop"),
        m4.alias("fourth_moment"),
    )
