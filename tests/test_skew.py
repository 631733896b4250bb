"""Skew-mitigation operators: salted results must equal unsalted semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.operators.skew import salted_agg, salted_join


def _skewed_events(spark, n=5000):
    # 80% of rows land on key 0 (the hot key)
    return spark.range(n).select(
        F.when(F.col("id") % 5 != 0, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") % 13).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed_events(spark)
    plain = {
        (r.k): (r.n, r.total)
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("total")).collect()
    }
    salted = {
        (r.k): (r.n, r.total)
        for r in salted_agg(
            df, ["k"], {"n": F.count("*"), "total": F.sum("v")}, salt_id_cols=["rid"], n_salts=16
        ).collect()
    }
    assert salted == plain


def test_salted_agg_min_max_merge_fns(spark):
    """Non-summable partials must merge with their own combiner — a
    (expr, merge_fn) tuple — and match the unsalted aggregate exactly."""
    df = _skewed_events(spark)
    plain = {
        (r.k): (r.lo, r.hi, r.total)
        for r in df.groupBy("k")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r.k): (r.lo, r.hi, r.total)
        for r in salted_agg(
            df,
            ["k"],
            {"lo": (F.min("v"), F.min), "hi": (F.max("v"), F.max), "total": F.sum("v")},
            salt_id_cols=["rid"],
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_events(spark, 2000)
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label"))
    plain = sorted((r.rid, r.label) for r in fact.join(dim, "k").select("rid", "label").collect())
    salted = sorted(
        (r.rid, r.label)
        for r in salted_join(fact, dim, "k", n_salts=8, fact_id_cols=["rid"]).select("rid", "label").collect()
    )
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark):
    """The salt must actually split the hot key across partitions in
    phase 1 — that's the point."""
    df = _skewed_events(spark)
    from cassandra_snap_to_hadoop_spark.operators.skew import _salt

    phase1_groups = (
        df.withColumn("__salt", _salt([F.col("rid")], 16))
        .filter(F.col("k") == 0)
        .select("__salt")
        .distinct()
        .count()
    )
    assert phase1_groups == 16
