"""Cassandra-semantics checked queries (SURVEY §2-B) over driver testdata.

The generic operators live in ``operators/cassandra.py``; these queries bind
them to the events table (an event stream doubles as a cell-update stream:
``user_id`` = partition key, ``ts`` = writetime, ``event_id`` = unique seq
for tie-breaks) so every merge rule is value-checked against DuckDB.
Snapshot-layout fixtures with real _writetime/_ttl/_tombstone columns are
exercised in tests/test_cassandra_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.operators.cassandra import lww_merge, token_bucket
from cassandra_snap_to_hadoop_spark.queries._util import qsum
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "b1_token_buckets",
    oracle="""
    SELECT ((c_custkey % 16) + 16) % 16 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM customer GROUP BY 1
    """,
    survey="B1",
)
def b1_token_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-range bucketing distribution.  The oracle-checkable variant
    buckets on the raw key (murmur3 differs between engines by design);
    ``operators.cassandra.token_bucket`` provides the hash-based placement
    used for physical co-location and is asserted in unit tests."""
    c = Tables(spark, sf_dir).customer
    return (
        c.withColumn("bucket", F.pmod(F.col("c_custkey"), F.lit(16)).cast("long"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.min("c_custkey").cast("long").alias("min_key"))
    )


@register("b1_murmur3_placement", oracle=None, survey="B1")
def b1_murmur3_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murmur3 (Spark ``hash``) token placement — rows-only: hash values are
    engine-specific, but the bucket count and per-bucket totals are stable."""
    c = Tables(spark, sf_dir).customer
    return (
        token_bucket(c, ["c_custkey"], 16)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "b2_lww_latest_state",
    oracle="""
    SELECT user_id, event_type AS last_event_type, value AS last_value,
           CAST(event_id AS BIGINT) AS last_event_id
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    survey="B2",
)
def b2_lww_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins merge: events as cell updates keyed by user_id,
    writetime = ts, tiebreak = event_id.  One shuffle, window, filter."""
    e = Tables(spark, sf_dir).events
    merged = lww_merge(e, ["user_id"], writetime_col="ts", seq_col="event_id")
    return merged.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("event_id").cast("long").alias("last_event_id"),
    )


@register(
    "b7_asof_snapshot",
    oracle="""
    SELECT user_id, event_type AS asof_event_type,
           CAST(event_id AS BIGINT) AS asof_event_id
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
    ) WHERE rn = 1
    """,
    survey="B2,B4",
)
def b7_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time read (Cassandra time travel): per-user state AS OF
    2024-01-15 — writetime filter pushed to the scan, THEN LWW merge.
    Users whose first write is after the cutoff don't exist yet; users
    overwritten later show their mid-January version."""
    from cassandra_snap_to_hadoop_spark.operators.cassandra import asof_state

    e = Tables(spark, sf_dir).events
    state = asof_state(
        e, ["user_id"], "ts", "event_id", asof=F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    return state.select(
        "user_id",
        F.col("event_type").alias("asof_event_type"),
        F.col("event_id").cast("long").alias("asof_event_id"),
    )


@register(
    "b3_tombstone_suppression",
    oracle="""
    SELECT user_id, event_type AS last_event_type
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
    survey="B3",
)
def b3_tombstone_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone semantics: treat 'error' as a delete marker — if a user's
    LWW-winning row is a tombstone, the whole partition key disappears
    (merge first, THEN filter — the order is the semantics)."""
    e = Tables(spark, sf_dir).events.withColumn("_tombstone", F.col("event_type") == "error")
    merged = lww_merge(e, ["user_id"], writetime_col="ts", seq_col="event_id")
    live = merged.filter(~F.col("_tombstone"))
    return live.select("user_id", F.col("event_type").alias("last_event_type"))


@register(
    "b4_ttl_expiry",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS live_value
    FROM events
    WHERE epoch_ms(ts) + CAST(FLOOR(value * 86400000) AS BIGINT) > epoch_ms(TIMESTAMP '2024-01-20 00:00:00')
    """,
    survey="B4",
)
def b4_ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL expiry as-of 2024-01-20: each event carries a synthetic TTL of
    ``value`` days; expired cells drop.  Pure filter — pushes to the scan.
    Both engines FLOOR the ms product explicitly: Spark's long cast
    truncates toward zero while DuckDB's rounds to nearest, so a bare cast
    can disagree by 1 ms exactly at the expiry boundary."""
    e = Tables(spark, sf_dir).events
    asof_ms = F.unix_millis(F.lit("2024-01-20 00:00:00").cast("timestamp"))
    live = e.filter(
        F.unix_millis("ts") + F.floor(F.col("value") * 86400000).cast("long") > asof_ms
    )
    return live.agg(
        F.count("*").alias("n_live"),
        F.countDistinct("user_id").alias("n_users"),
        qsum(F.col("value")).alias("live_value"),
    )


@register(
    "b5_wide_row_regroup",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MIN(event_id) AS BIGINT) AS first_cell,
           CAST(MAX(event_id) AS BIGINT) AS last_cell,
           array_to_string(list_sort(list(event_id))[1:5], ',') AS head_cells
    FROM events GROUP BY user_id
    """,
    survey="B5",
)
def b5_wide_row_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-row partition view: clustering cells regrouped per partition key
    (summary scalars checked; the array<struct> shape itself is exercised by
    ``operators.cassandra.wide_row_regroup`` unit tests)."""
    e = Tables(spark, sf_dir).events
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_cells"),
        F.min("event_id").cast("long").alias("first_cell"),
        F.max("event_id").cast("long").alias("last_cell"),
        F.concat_ws(",", F.slice(F.sort_array(F.collect_list("event_id")), 1, 5)).alias("head_cells"),
    )


@register(
    "b6_counter_merge",
    oracle="""
    SELECT user_id, event_type,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS delta_total,
           CAST(COUNT(*) AS BIGINT) AS n_deltas
    FROM events GROUP BY user_id, event_type
    """,
    survey="B6",
)
def b6_counter_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-column merge: commutative sum of deltas per (pk, ck) — the
    map-side partial sum IS the replica-local counter shard."""
    e = Tables(spark, sf_dir).events
    return e.groupBy("user_id", "event_type").agg(
        qsum(F.col("value")).alias("delta_total"),
        F.count("*").alias("n_deltas"),
    )


@register(
    "b10_replica_divergence",
    oracle="""
    WITH a AS (
        SELECT user_id % 64 AS bucket,
               COUNT(*) AS n,
               SUM(event_id * 31 + CAST(ROUND(value * 100) AS BIGINT)) AS cksum
        FROM events GROUP BY 1
    ), b AS (
        SELECT user_id % 64 AS bucket,
               COUNT(*) AS n,
               SUM(event_id * 31 + CAST(ROUND(
                   (CASE WHEN event_id % 89 = 0 THEN value + 1 ELSE value END) * 100)
                   AS BIGINT)) AS cksum
        FROM events WHERE event_id % 97 <> 0
        GROUP BY 1
    )
    SELECT a.bucket AS bucket,
           CAST(a.n AS BIGINT) AS n_a,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS n_b,
           CAST(a.cksum AS BIGINT) AS cksum_a,
           CAST(COALESCE(b.cksum, 0) AS BIGINT) AS cksum_b,
           CAST(CASE WHEN b.bucket IS NULL OR a.n <> b.n OR a.cksum <> b.cksum
                     THEN 1 ELSE 0 END AS INTEGER) AS divergent
    FROM a LEFT JOIN b ON a.bucket = b.bucket
    """,
    survey="B1,A6,H3",
)
def b10_replica_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy repair semantics (Cassandra `nodetool repair`'s
    comparison phase): split the keyspace into token ranges, compute a
    commutative per-range checksum on each replica, and report exactly
    which ranges diverge — the distributed-systems primitive that lets
    two 100 TB replicas reconcile by exchanging KB-scale range digests
    instead of data.  Replica B is simulated from the same events with
    deterministic drift (1/97 of rows missing, 1/89 modified — both
    mod-classes injected identically in the oracle).  The checksum is a
    modular integer sum (id * 31 + quantized value): commutative and
    associative, so it is partition-order-free on BOTH engines — the same
    discipline as a6's manifest checksums, and the reason no
    cryptographic hash is needed for the cross-engine check.  Shape: two
    hash aggs over the fact + a 64-row broadcast join; each replica scan
    is embarrassingly parallel and the comparison is driver-trivial."""
    e = Tables(spark, sf_dir).events
    bucket = (F.col("user_id") % 64).alias("bucket")
    row_ck = F.col("event_id") * 31 + F.round(F.col("value") * 100).cast("long")
    a = e.groupBy(bucket).agg(
        F.count("*").alias("n_a"), F.sum(row_ck).alias("cksum_a")
    )
    drifted_val = F.when(F.col("event_id") % 89 == 0, F.col("value") + 1).otherwise(
        F.col("value")
    )
    row_ck_b = F.col("event_id") * 31 + F.round(drifted_val * 100).cast("long")
    b = (
        e.filter(F.col("event_id") % 97 != 0)
        .groupBy((F.col("user_id") % 64).alias("bucket"))
        .agg(F.count("*").alias("n_b"), F.sum(row_ck_b).alias("cksum_b"))
    )
    joined = a.join(b, "bucket", "left")
    return joined.select(
        "bucket",
        "n_a",
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        "cksum_a",
        F.coalesce("cksum_b", F.lit(0)).alias("cksum_b"),
        F.when(
            F.col("n_b").isNull()
            | (F.col("n_a") != F.col("n_b"))
            | (F.col("cksum_a") != F.col("cksum_b")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("divergent"),
    )


@register(
    "b11_static_columns",
    oracle="""
    WITH statics AS (
        SELECT o_orderkey AS pk, o_orderpriority AS sval,
               epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS wt
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'REVISED', epoch_us(CAST(o_orderdate AS TIMESTAMP)) + 1
        FROM orders WHERE o_orderkey % 5 = 0
    ), latest AS (
        SELECT pk, sval FROM (
            SELECT pk, sval,
                   row_number() OVER (PARTITION BY pk ORDER BY wt DESC, sval DESC) AS rn
            FROM statics
        ) WHERE rn = 1
    )
    SELECT latest.sval AS static_value,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_partitions
    FROM lineitem l JOIN latest ON l.l_orderkey = latest.pk
    GROUP BY 1
    """,
    survey="B11,B2,D1",
)
def b11_static_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cassandra STATIC column semantics: a static cell belongs to the
    PARTITION, not a clustering row — one LWW merge per partition key,
    then every clustering row of that partition reads the same (latest)
    value.  Cell-level LWW (b2) resolves per (pk, ck); the static tier
    resolves per pk alone and fans the winner back out across the wide
    row — get either scope wrong and a snapshot export silently attaches
    stale attributes to fresh rows.

    Simulation on the TPC-H surface: orders carry a base static write per
    key (priority @ order-date writetime); every 5th key gets a later
    'REVISED' overwrite.  The wide row is lineitem (pk = l_orderkey,
    ck = l_linenumber); output aggregates rows and partitions per final
    static value — exactly 1/5 of partitions must land on REVISED.

    Scale shape: the static merge is one hash agg on pk via the packed
    ``max_by`` tier economics (operators/cassandra.py lww docstring);
    the fan-out join is fact⋈per-key-aggregate on the fact's own key —
    AQE sizes it, and at snapshot scale it is the same single exchange
    the LWW merge itself needs."""
    o = Tables(spark, sf_dir).orders
    base = o.select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderpriority").alias("sval"),
        F.unix_micros(F.to_timestamp("o_orderdate")).alias("wt"),
    )
    revised = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("pk"),
            F.lit("REVISED").alias("sval"),
            (F.unix_micros(F.to_timestamp("o_orderdate")) + 1).alias("wt"),
        )
    )
    statics = base.unionByName(revised)
    latest = lww_merge(statics, ["pk"], "wt", tiebreak_cols=["sval"]).select("pk", "sval")
    li = Tables(spark, sf_dir).lineitem.select("l_orderkey")
    return (
        li.join(latest, li.l_orderkey == latest.pk)
        .groupBy(F.col("sval").alias("static_value"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("l_orderkey").cast("long").alias("n_partitions"),
        )
    )


@register(
    "b12_range_tombstones",
    oracle="""
    WITH data AS (
        SELECT l_orderkey AS pk, l_linenumber AS ck,
               CAST(ROUND(l_quantity) AS BIGINT) AS qty,
               epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS wt
        FROM lineitem
    ), live AS (
        SELECT * FROM data d
        WHERE NOT (
            d.pk % 7 = 0
            AND d.ck BETWEEN 2 AND 4
            AND d.wt < epoch_us(TIMESTAMP '1995-01-01 00:00:00')
        )
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST((SELECT COUNT(*) FROM data) - COUNT(*) AS BIGINT) AS n_purged,
           CAST(SUM(qty) AS BIGINT) AS qty_live,
           CAST(COUNT(DISTINCT pk) AS BIGINT) AS n_partitions_live
    FROM live
    """,
    survey="B12,B3,D4",
)
def b12_range_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range tombstones — Cassandra's ``DELETE ... WHERE pk=? AND ck >= ?
    AND ck <= ?`` writes ONE marker that suppresses every covered
    clustering row OLDER than the delete; newer writes inside the range
    survive (the writetime comparison is the semantics, not just the
    range).  b3 is point/row tombstones; the range tier is where naive
    exports go quadratic or silently resurrect data.

    Simulation: lineitem is the wide row (pk=l_orderkey,
    ck=l_linenumber, writetime=shipdate); every 7th partition carries a
    range delete over ck ∈ [2,4] stamped 1995-01-01 — rows shipped
    later than the marker survive inside the covered range.

    Scale shape: ``operators.cassandra.apply_range_tombstones`` is a
    broadcast LEFT ANTI join on the equi pk with the range+writetime
    predicate as join residual — hash join, never a nested loop, and
    the delete side (markers, not rows) is the broadcast-small side by
    construction at any data scale."""
    li = Tables(spark, sf_dir).lineitem
    data = li.select(
        F.col("l_orderkey").alias("pk"),
        F.col("l_linenumber").alias("ck"),
        F.round("l_quantity").cast("long").alias("qty"),
        F.unix_micros(F.to_timestamp("l_shipdate")).alias("_writetime"),
    )
    del_wt = F.unix_micros(F.to_timestamp(F.lit("1995-01-01 00:00:00")))
    deletes = (
        data.select("pk")
        .distinct()
        .filter(F.col("pk") % 7 == 0)
        .select(
            "pk",
            F.lit(2).alias("ck_lo"),
            F.lit(4).alias("ck_hi"),
            del_wt.alias("del_writetime"),
        )
    )
    from cassandra_snap_to_hadoop_spark.operators.cassandra import (
        apply_range_tombstones,
    )

    live = apply_range_tombstones(data, deletes, "pk", "ck")
    total = data.agg(F.count("*").alias("n_total"))
    return (
        live.agg(
            F.count("*").cast("long").alias("n_live"),
            F.sum("qty").cast("long").alias("qty_live"),
            F.countDistinct("pk").cast("long").alias("n_partitions_live"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "n_live",
            (F.col("n_total") - F.col("n_live")).cast("long").alias("n_purged"),
            "qty_live",
            "n_partitions_live",
        )
    )
