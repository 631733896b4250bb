"""Physical-layout operators: Z-order (Morton) clustering keys and
small-file compaction sizing.

Both address the same 100 TB reality: at scale the dominant cost of a scan
is how the data is *laid out*, not how the query is written.

* **Z-order**: multi-dimensional min/max data skipping.  A table range-
  partitioned and sorted by a Morton interleave of two (or more) quantized
  dimensions gives every parquet file a tight bounding box in BOTH
  dimensions, so footer min/max stats prune files for predicates on either
  column — the trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.  The
  Morton code itself is pure integer bit arithmetic (shift/or/and magic-
  mask spreading), expressed in portable SQL so the Spark plan stays
  whole-stage-codegen and the DuckDB oracle can mirror it bit-for-bit.

* **Compaction**: long-running ingest (streaming micro-batches, per-hour
  partitions) accretes thousands of tiny files; each file costs a task,
  an open, a footer parse.  ``target_file_count`` sizes a repartition so
  output files land near a target byte size (the 128 MB HDFS-block-shaped
  sweet spot on a real cluster).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic-mask bit spreading: 16 significant bits -> 32 bits with zeros
# interleaved (Morton/Z-curve).  Plain SQL so the identical string runs on
# Spark (via F.expr) and DuckDB (oracle mirror).
_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16_sql(expr: str) -> str:
    """SQL expression spreading the low 16 bits of ``expr`` so bit i lands
    at position 2*i (BIGINT arithmetic; identical on Spark and DuckDB)."""
    e = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _MASKS:
        e = f"((({e}) | (({e}) << {shift})) & {mask})"
    return e


def morton32_sql(x_expr: str, y_expr: str) -> str:
    """32-bit Morton interleave of two 16-bit dimensions as portable SQL.

    Even bits carry ``x``, odd bits carry ``y``: locality in Z-order
    implies locality in both inputs, which is exactly what per-file
    min/max pruning needs.
    """
    return f"({spread16_sql(x_expr)} | ({spread16_sql(y_expr)} << 1))"


def morton32(x_expr: str, y_expr: str) -> Column:
    """Column form of :func:`morton32_sql` for DataFrame pipelines.
    Inputs are SQL expression strings (kept as SQL so the same text feeds
    the DuckDB oracle — no Column-to-SQL reflection, Connect-safe)."""
    return F.expr(morton32_sql(x_expr, y_expr))


def morton32_py(x: int, y: int) -> int:
    """Pure-python reference for tests (independent of both engines)."""

    def spread(v: int) -> int:
        v &= 0xFFFF
        for shift, mask in _MASKS:
            v = (v | (v << shift)) & mask
        return v

    return spread(x) | (spread(y) << 1)


def zorder_layout(df: DataFrame, x: str, y: str, num_files: int) -> DataFrame:
    """Cluster ``df`` for 2-D data skipping: range-partition then sort by
    the Morton code.  ``repartitionByRange`` samples the key distribution,
    so files get balanced row counts even when the key space is sparse;
    the within-partition sort tightens each file's bounding box further.
    Write the result with any parquet sink — footer stats do the rest.
    """
    keyed = df.withColumn("__z", morton32(x, y))
    return keyed.repartitionByRange(num_files, "__z").sortWithinPartitions("__z").drop("__z")


def target_file_count(total_bytes: int, target_bytes: int = 128 * 1024 * 1024) -> int:
    """Number of output files that lands each near ``target_bytes``."""
    return max(1, math.ceil(total_bytes / target_bytes))


def dir_bytes(path: str) -> int:
    """Total bytes of data files under a local directory (skips _SUCCESS /
    hidden).  Local-FS stand-in for the FileSystem.getContentSummary a
    cluster deployment would use."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(root, name))
    return total


def compact(spark_read_df: DataFrame, total_bytes: int, target_bytes: int) -> DataFrame:
    """Repartition a small-files table down to ~``target_bytes`` files.

    Round-robin repartition (no key) — compaction must not skew file sizes
    when the data is skewed, and a shuffle-free ``coalesce`` would cap
    parallelism of any computation fused upstream; at 100 TB compaction
    runs as its own job where the full shuffle is the point (it is the
    mechanism that makes output sizes uniform).
    """
    return spark_read_df.repartition(target_file_count(total_bytes, target_bytes))


# Range-partition sizing target for the two-pass global-order operators:
# ~64 MB per partition (AQE's advisory default) keeps partitions large
# enough to amortize task overhead and small enough that the local rank
# can never overflow its 33-bit row-position budget.
_RANGE_PARTITION_TARGET_BYTES = 64 * 1024 * 1024
# monotonically_increasing_id packs the within-partition row position in
# the low 33 bits; a partition with >= 2^33 rows would silently corrupt
# the local rank, so it is asserted against the per-partition counts the
# operator collects anyway.
_LOCAL_RANK_LIMIT = 1 << 33


def _derive_range_partitions(df: DataFrame) -> int:
    """Scale-adaptive partition count for the range pass (r12, guide §2.2
    / VERDICT r11 item 2): derive from the optimizer's size estimate
    (bytes / 64 MB target) with the core count as the floor, instead of a
    constant 32 tuned for local[32].  At 100 TB this yields ~1.6 M
    partitions (each far below the 2^33-row local-rank budget); on the
    local corpus the size estimate is tiny so the floor (defaultParallelism)
    wins and the bench-visible plan is unchanged."""
    sc = df.sparkSession.sparkContext
    floor = sc.defaultParallelism
    try:
        # ANALYZED-plan stats, not optimizedPlan(): the size visitor walks
        # the analyzed tree without paying a full optimizer run per build
        # (measured ~0.35 s/build on e30's count path); without CBO the
        # estimate is conservative (can only overestimate), which for a
        # partition-count heuristic errs toward MORE partitions — safe.
        size = int(df._jdf.queryExecution().analyzed().stats().sizeInBytes())
    except Exception:  # internal-API drift: fall back to the core floor
        return floor
    return max(floor, -(-size // _RANGE_PARTITION_TARGET_BYTES))


def _check_local_rank_budget(counts: dict[int, int], limit: int = _LOCAL_RANK_LIMIT) -> None:
    """Fail loudly (not silently wrong) if any range partition holds more
    rows than the within-partition position can index (2^33 for the
    monotonically_increasing_id low bits; 2^31 for an int row_number)."""
    if counts and max(counts.values()) >= limit:
        raise ValueError(
            "global_rank/global_cumsum: a range partition holds more rows "
            f"than the local-rank budget ({limit}); the within-partition "
            "position would overflow. Increase num_partitions (or let it "
            "derive from input size)."
        )


def global_rank(
    df: DataFrame,
    order_cols: list,
    num_partitions: int | None = None,
    out_col: str = "global_rank",
    return_total: bool = False,
):
    """Scalable global ranking: total order WITHOUT the single-reducer
    trap.  ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY pulls
    the entire dataset through ONE task — the canonical scale killer for
    global ordering.  The two-pass alternative: range-partition on the
    order key (boundaries from a sample), rank locally within each sorted
    partition, then add per-partition offsets (cumulative counts of the
    preceding partitions — a |partitions|-sized driver list, KB-scale at
    any data size).  Rank = offset + local rank, bit-identical to the
    naive window given a total order.

    The one collect() here is |partitions| integers — the documented
    exception class (driver-side metadata, like AQE's own stats), not a
    data collect.

    ``return_total=True`` additionally returns the exact total row count
    (the sum of the per-partition counts — already collected, no extra
    job), which :func:`ntile_expr` needs for closed-form bucketing.
    """
    # localCheckpoint is CORRECTNESS here, not an optimization:
    # repartitionByRange samples its boundaries per execution, and the
    # counts job and the ranking job are separate executions — without
    # pinning the materialized partitioning they can disagree on where
    # ranges split, corrupting the offsets (caught by the sf0.01 oracle
    # gate; sf0.001's single-digit partitions masked it).
    if num_partitions is None:
        num_partitions = _derive_range_partitions(df)
    keyed = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["n"]
        for r in keyed.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    _check_local_rank_budget(counts)
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.coalesce(
        *[F.when(F.col("__pid") == p, F.lit(o)) for p, o in offsets.items()]
    ) if offsets else F.lit(0)
    # r11 (guide §2.4 "remove shuffles outright"): the local rank used to
    # be a ``row_number() OVER (PARTITION BY __pid ...)`` window — but the
    # checkpointed RDD reports UnknownPartitioning, so Spark inserted a
    # full hash exchange of the fact relation on __pid (re-shuffling data
    # that was ALREADY laid out by the range partitioner) plus a second
    # sort.  ``sortWithinPartitions`` (no exchange) + the documented
    # ``monotonically_increasing_id`` layout — partition index in the
    # high bits, the 0-based row position within the partition in the low
    # 33 — yields the identical local rank as pure codegen arithmetic.
    # Bit-identical: the sort order and partition boundaries are pinned
    # by the checkpoint, so offset + low-bits + 1 == offset + row_number.
    local = (
        F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)) + 1
    )
    ranked = (
        keyed.sortWithinPartitions(*order_cols)
        .withColumn(out_col, (offset_col + local).cast("long"))
        .drop("__pid")
    )
    if return_total:
        return ranked, acc
    return ranked


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    num_partitions: int | None = None,
    rank_col: str = "rnk",
    cum_col: str = "cum",
) -> DataFrame:
    """Scalable global rank + running sum over a total order — the
    cumulative-distribution building block (coverage curves, Lorenz/Gini
    inputs, CDF crossings) without the single-reducer window.

    Same two-pass shape as :func:`global_rank`: range-partition on the
    order key, pin the partitioning (localCheckpoint — boundary sampling
    must agree between the stats job and the window job), collect ONE
    (count, sum) pair per partition (KB-scale driver metadata at any data
    size), then local windows inside each sorted partition plus the
    per-partition offsets reconstruct the exact global ``row_number`` and
    ``SUM ... ROWS UNBOUNDED PRECEDING`` — bit-identical to the naive
    unpartitioned window because integer addition reassociates freely.
    """
    from pyspark.sql.window import Window

    if num_partitions is None:
        num_partitions = _derive_range_partitions(df)
    keyed = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    stats = {
        r["__pid"]: (r["n"], r["s"])
        for r in keyed.groupBy("__pid")
        .agg(F.count("*").alias("n"), F.sum(val_col).alias("s"))
        .collect()
    }
    # row_number() here is an INT window: the tighter 2^31 budget applies.
    _check_local_rank_budget({p: n for p, (n, _s) in stats.items()}, limit=1 << 31)
    rank_off: dict[int, int] = {}
    sum_off: dict[int, int] = {}
    racc = sacc = 0
    for pid in sorted(stats):
        rank_off[pid] = racc
        sum_off[pid] = sacc
        n, s = stats[pid]
        racc += n
        sacc += s
    ro = (
        F.coalesce(*[F.when(F.col("__pid") == p, F.lit(o)) for p, o in rank_off.items()])
        if rank_off
        else F.lit(0)
    )
    so = (
        F.coalesce(*[F.when(F.col("__pid") == p, F.lit(o)) for p, o in sum_off.items()])
        if sum_off
        else F.lit(0)
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        keyed.withColumn("__lr", F.row_number().over(w))
        .withColumn(
            "__lc", F.sum(val_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn(rank_col, (ro + F.col("__lr")).cast("long"))
        .withColumn(cum_col, (so + F.col("__lc")).cast("long"))
        .drop("__pid", "__lr", "__lc")
    )


def ntile_expr(rank_col: str, n: int, k: int) -> Column:
    """SQL-standard ``ntile(k)`` bucket from a precomputed global rank.

    The standard's rule: with ``n`` rows, the first ``n mod k`` buckets
    hold ``ceil(n/k)`` rows, the rest ``floor(n/k)`` (both Spark and
    DuckDB implement exactly this), so bucket membership is pure integer
    arithmetic once the global rank and total count are known — which is
    how a 100 TB engine computes ntile WITHOUT a single-reducer sort:
    :func:`global_rank` supplies the rank, the |partitions|-sized stats
    list supplies ``n``, and this closed form supplies the bucket.
    Verified bucket-for-bucket against the native window by the shared
    ntile oracles of ``e30_equidepth_scalable`` and ``j39``.
    """
    q, r = divmod(n, k)
    rank = F.col(rank_col)
    # Integer `div`, not floor(double /): Column `/` is DOUBLE division and
    # floor of a correctly-rounded double can drift one bucket once rank
    # approaches 2^53/k — exactly the extreme-scale regime this closed form
    # is for (ADVICE r4).  Both operands are non-negative in every branch
    # that is actually selected, so `div` (truncate toward zero) == floor.
    first = (F.expr(f"({rank_col} - 1) div {q + 1}") + 1).cast("int")
    if q == 0:
        return first
    cut = r * (q + 1)
    rest = (F.lit(r) + F.expr(f"({rank_col} - 1 - {cut}) div {q}") + 1).cast("int")
    return F.when(rank <= F.lit(cut), first).otherwise(rest)
