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


def mergeable_quantiles_certified(
    df: DataFrame, col: str, key: str, k: int = 32, buckets: int = 16
) -> DataFrame:
    """The SQL-certifiable twin of :func:`mergeable_quantiles` (VERDICT r5
    item 4): the SAME two-level fold — fixed-size per-bucket (value, weight)
    summary, one global merge answering every decile with rank error
    < 2·n/k — restated so every step is reproducible verbatim in an
    independent SQL engine:

    * buckets come from md5 of the ROW KEY (both engines hash the identical
      canonical integer string; xxhash64-of-value stays the production
      tier in ``mergeable_quantiles``);
    * the per-bucket summary is pure relational algebra: rank rows inside
      each bucket (partitioned window), then keep rank ``(j·n_b) div k``
      for j in 0..k-1 with weight ``((j+1)·n_b) div k − (j·n_b) div k``
      — a broadcast join against a k-row dimension, no Python;
    * decile selection replaces the float ``cum ≥ p·total`` with the exact
      integer form ``10·cum ≥ i·total`` (p = i/10 has no exact double, so
      the float form can flip on boundary ties; the integer form cannot);
    * the tiny merged relation (≤ buckets·k rows) takes its cumulative
      weights from a broadcast non-equi self-join (the e62 pattern), never
      an unpartitioned window.

    Output: (decile INT 1..9, est DOUBLE) — est is an input VALUE copied
    through untouched, so the doubles hash identically cross-engine.

    Scale shape: one partitioned window per bucket (buckets scale with
    input splits at cluster scale), one broadcast k-row join, then
    KB-bounded arithmetic; nothing leaves the JVM."""
    src = df.select(
        F.col(col).cast("double").alias("v"), F.col(key).cast("long").alias("key")
    ).where(F.col(col).isNotNull())
    b = F.pmod(
        F.conv(F.substring(F.md5(F.col("key").cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(buckets),
    )
    from pyspark.sql import Window

    w_rank = Window.partitionBy("b").orderBy("v", "key")
    w_cnt = Window.partitionBy("b")
    ranked = (
        src.withColumn("b", b)
        .withColumn("rn", F.row_number().over(w_rank) - F.lit(1))
        .withColumn("nb", F.count(F.lit(1)).over(w_cnt))
    )
    spark = df.sparkSession
    js = spark.range(k).select(F.col("id").alias("j"))
    ke = "least(%d, nb)" % k
    summary = ranked.join(
        F.broadcast(js),
        (F.col("j") < F.expr(ke)) & (F.col("rn") == F.expr(f"(j * nb) div ({ke})")),
    ).select(
        "v",
        F.expr(f"((j + 1) * nb) div ({ke}) - (j * nb) div ({ke})").alias("w"),
    )
    vals = summary.groupBy("v").agg(F.sum("w").alias("w"))
    tot = vals.agg(F.sum("w").alias("total"))
    cums = (
        vals.alias("a")
        .join(F.broadcast(vals.alias("c")), F.col("c.v") <= F.col("a.v"))
        .groupBy(F.col("a.v").alias("v"))
        .agg(F.sum("c.w").alias("cum"))
    )
    dec = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    return (
        cums.crossJoin(F.broadcast(tot))
        .join(F.broadcast(dec), F.lit(10) * F.col("cum") >= F.col("decile") * F.col("total"))
        .groupBy("decile")
        .agg(F.min("v").alias("est"))
    )
