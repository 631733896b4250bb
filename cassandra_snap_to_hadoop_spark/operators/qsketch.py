"""Mergeable quantile summaries (GK-lite / q-digest family).

The missing member of the mergeable-sketch tier (e12 HLL merge, e21 CMS,
e19 bitmap, e27 HLL-to-date): a FIXED-SIZE per-partition order-statistics
summary whose merge answers any quantile with bounded RANK error — the
primitive behind approx_percentile, here built explicitly so the merge
law is testable and the summary is a first-class relation (storable,
unionable across days, re-mergeable — the "sketch per parquet partition,
fold at query time" 100 TB pattern).

Summary of a group of n sorted values = ≤ k (value, weight) rows: value
j covers the run [⌊j·n/k⌋, ⌊(j+1)·n/k⌋) so weights sum exactly to n and
any prefix of summary weights misses true rank by < n_g/k.  Merging G
group summaries therefore bounds global rank error by Σ n_g/k = n/k —
asserted (with slack 2·n/k for the boundary pick) in tests.

Determinism: groups are md5-bucketed by VALUE (not spark_partition_id),
so the summary — and hence every estimated quantile — is a pure function
of the data, independent of task scheduling and parallelism.  Rows-only
in the registry (the whole point is that it is NOT the exact SQL answer);
the exact-rank error law is the test.

Scale shape: stage 1 is applyInPandas over 32 hash buckets (each sorts
its slice — the only super-linear step, n_g log n_g per bucket); stage 2
folds the ≤ 32·k weighted rows in one single-group pass.  At cluster
scale bucket count rises with input splits and stage 2 stays O(buckets·k).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _summarize(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    v = pdf["v"].sort_values().to_numpy()
    n = len(v)
    if n == 0:
        return pd.DataFrame({"value": [], "weight": []})
    k = min(k, n)
    edges = [(j * n) // k for j in range(k)] + [n]
    vals = [float(v[edges[j]]) for j in range(k)]
    wts = [edges[j + 1] - edges[j] for j in range(k)]
    return pd.DataFrame({"value": vals, "weight": wts})


def _weighted_quantiles(pdf: pd.DataFrame, probs: list[float]) -> pd.DataFrame:
    s = pdf.sort_values(["value", "weight"]).reset_index(drop=True)
    cum = s["weight"].cumsum()
    total = int(cum.iloc[-1])
    out = []
    for p in probs:
        target = p * total
        idx = int((cum >= target).idxmax())
        out.append((p, float(s["value"].iloc[idx])))
    return pd.DataFrame(out, columns=["p", "est"])


def mergeable_quantiles(
    df: DataFrame, col: str, k: int = 128, buckets: int = 32, probs: tuple[float, ...] = tuple()
) -> DataFrame:
    """Two-level quantile fold: per-bucket summary -> single merge."""
    probs = list(probs) or [round(0.1 * i, 1) for i in range(1, 10)]
    src = df.select(F.col(col).cast("double").alias("v")).where(F.col("v").isNotNull())
    bucketed = src.withColumn(
        "b", F.pmod(F.xxhash64(F.col("v").cast("string")), F.lit(buckets))
    )
    summaries = bucketed.groupBy("b").applyInPandas(
        lambda pdf: _summarize(pdf, k), schema="value double, weight long"
    )
    merged = (
        summaries.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(
            lambda pdf: _weighted_quantiles(pdf, probs), schema="p double, est double"
        )
    )
    return merged
