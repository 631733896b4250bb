"""Shared forecasting folds (SURVEY §2-F24).

One definition of the Holt recursion used by BOTH the batch query
(f24_holt_forecast, applyInPandas) and the stateful streaming twin
(streaming/pipelines.f24_stream, applyInPandasWithState) — parity between
the two is only meaningful if they share the arithmetic.
"""

from __future__ import annotations


def holt_fold(
    xs, alpha: float = 0.5, beta: float = 0.3
) -> tuple[float, float, float]:
    """Holt double-exponential smoothing over a zero-fill-complete daily
    series: classic init l0=x0, b0=x1-x0; returns (level, trend,
    7-day-ahead forecast), each rounded to 4dp."""
    level = float(xs[0])
    trend = float(xs[1] - xs[0]) if len(xs) > 1 else 0.0
    for v in xs[1:]:
        prev = level
        level = alpha * float(v) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1 - beta) * trend
    return round(level, 4), round(trend, 4), round(level + 7 * trend, 4)


def holt_winters_fold(
    xs,
    season: int = 7,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
):
    """Additive Holt-Winters triple exponential smoothing over a
    zero-fill-complete daily series with period ``season``.

    Classic additive init over the first season: l0 = mean(first season),
    b0 = mean of (x[s+i]-x[i])/s over the first season (needs 2 seasons;
    0.0 otherwise), s_i = x_i - l0.  Returns (level, trend, seasonal list,
    one-period-ahead forecast), values rounded to 4dp.  Shared by the
    batch query (f27, applyInPandas) and its tests' pure-Python twin —
    parity is only meaningful if they share the arithmetic.
    """
    m = season
    n = len(xs)
    if n < m:
        # Degenerate short series: fall back to Holt with no seasonality.
        # holt_fold's third value is the 7-STEP-ahead forecast; callers of
        # this function report forecast_next as ONE period ahead, so derive
        # it from the fallback's level+trend instead (ADVICE r4).
        level, trend, _fc7 = holt_fold(xs, alpha, beta)
        return level, trend, [0.0] * m, round(level + trend, 4)
    level = sum(float(v) for v in xs[:m]) / m
    if n >= 2 * m:
        trend = sum((float(xs[m + i]) - float(xs[i])) / m for i in range(m)) / m
    else:
        trend = 0.0
    seas = [float(xs[i]) - level for i in range(m)]
    for t in range(m, n):
        v = float(xs[t])
        s_idx = t % m
        prev_level = level
        level = alpha * (v - seas[s_idx]) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev_level) + (1 - beta) * trend
        seas[s_idx] = gamma * (v - level) + (1 - gamma) * seas[s_idx]
    fc = level + trend + seas[n % m]
    return (
        round(level, 4),
        round(trend, 4),
        [round(s, 4) for s in seas],
        round(fc, 4),
    )
