"""Shared binary-segmentation changepoint fold (SURVEY §2-F33).

One definition of the integer binseg arithmetic used by BOTH the batch
query's pure-Python test pin AND the stateful streaming twin
(streaming/pipelines.f33_stream) — the batch declaration itself is pure
Spark SQL (queries/round5.f33_changepoint_binseg); parity between all
three is only meaningful if the Python sides share this fold verbatim.

The division is TRUNCATING toward zero (Spark ``DIV`` == DuckDB ``//``),
not Python's flooring ``//`` — the established sign-split discipline.
"""

from __future__ import annotations


def tz_div(a: int, b: int) -> int:
    """Toward-zero integer division (Spark DIV / DuckDB // semantics)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def binseg_fold(xs: list[int], d0: int) -> tuple[int, int, int, int, int, int]:
    """Best single split of the zero-filled daily series ``xs`` starting
    at epoch day ``d0``: maximize the two-segment SSE reduction
    S1²·1e6/n1 + S2²·1e6/n2 − S²·1e6/n (per-term truncating division),
    ties to the earliest day.  Returns (split_day, n_left, n_right,
    sum_left, sum_right, reduction_micro) — exactly the batch query's
    row for one series."""
    nn, s = len(xs), sum(xs)
    best = None
    s1 = 0
    for i in range(1, nn):
        s1 += xs[i - 1]
        red = (
            tz_div(s1 * s1 * 1_000_000, i)
            + tz_div((s - s1) * (s - s1) * 1_000_000, nn - i)
            - tz_div(s * s * 1_000_000, nn)
        )
        day = d0 + i - 1
        if best is None or red > best[5] or (red == best[5] and day < best[0]):
            best = (day, i, nn - i, s1, s - s1, red)
    return best
