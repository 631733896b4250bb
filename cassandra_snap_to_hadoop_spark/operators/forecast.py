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
