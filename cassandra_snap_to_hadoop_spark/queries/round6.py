"""Round-6 additions — exact mask-histogram source overlap (the
inclusion-exclusion identity e24's HLL tier estimates, computed exactly
without any join on shingle values) and further depth operators.

Design rules inherited from the established discipline (round5.py
docstring): exact integer lattices, md5 when a hash must be reproduced
verbatim in both engines, fixed unrolled iteration budgets, blocked
candidate generation, KB-bounded broadcast joins for tiny relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables, fan_out
from cassandra_snap_to_hadoop_spark.operators.text import tokens
from cassandra_snap_to_hadoop_spark.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


@register(
    "e24_overlap_incl_excl",
    oracle=f"""
    WITH sh0 AS (
        SELECT DISTINCT source,
               unnest([array_to_string(w[i:i+2], ' ')
                       for i in range(1, len(w) - 1)]) AS s
        FROM (SELECT source, {_WORDS} AS w FROM documents)
        WHERE len(w) >= 3
    ), mask AS (
        SELECT s, list_sort(list(source)) AS m FROM sh0 GROUP BY s
    ), hist AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt FROM mask GROUP BY m
    ), srcs AS (
        SELECT DISTINCT source FROM documents
    ), pairs AS (
        SELECT a.source AS src_a, b.source AS src_b
        FROM srcs a JOIN srcs b ON a.source < b.source
    )
    SELECT p.src_a, p.src_b,
           CAST(SUM(CASE WHEN list_contains(h.m, p.src_a) THEN h.cnt
                         ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN list_contains(h.m, p.src_b) THEN h.cnt
                         ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN list_contains(h.m, p.src_a)
                           OR list_contains(h.m, p.src_b) THEN h.cnt
                         ELSE 0 END) AS BIGINT) AS n_union,
           CAST(SUM(CASE WHEN list_contains(h.m, p.src_a) THEN h.cnt
                         ELSE 0 END)
              + SUM(CASE WHEN list_contains(h.m, p.src_b) THEN h.cnt
                         ELSE 0 END)
              - SUM(CASE WHEN list_contains(h.m, p.src_a)
                           OR list_contains(h.m, p.src_b) THEN h.cnt
                         ELSE 0 END) AS BIGINT) AS n_inter
    FROM pairs p, hist h
    GROUP BY 1, 2
    """,
    survey="E24,J26,E4",
)
def e24_overlap_incl_excl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT inclusion-exclusion source overlap (VERDICT r5 item 4b): the
    identity e24_hll_overlap's sketch tier only ESTIMATES —
    |A∩B| = |A| + |B| − |A∪B| — computed exactly, for every source pair,
    WITHOUT ever joining on shingle values.

    The trick is the mask histogram: one hash agg per 3-gram shingle
    builds the sorted set of sources containing it, a second hash agg
    counts shingles per distinct source-set — and from that KB-sized
    relation every pair's |A|, |B| and |A∪B| are CASE-WHEN sums (shingle
    s counts toward A∪B iff its mask touches either source).  j26's exact
    tier must equi-join (source, shingle) against itself and therefore
    caps fan-out with a discriminative-gram filter; this formulation has
    NO value join at all, so it needs no cap and covers every gram.

    Scale shape: tokenize/shingle map → (source, shingle) distinct →
    per-shingle mask agg (map-side combined) → per-mask count — then a
    crossJoin(broadcast(pairs)) over the mask histogram, which holds at
    most min(#shingles, 2^|sources|) rows; for governance-scale source
    counts (dozens) that is KB.  For thousands of sources the mask
    collapses to a bitmap (e19's bitmap_construct_agg) and the identity
    is unchanged — the HLL tier (e24_hll_overlap, rows-only) stays the
    triage path when even per-shingle masks are too many.

    The sketch tier's estimates are pinned against these exact values in
    tests/test_round6.py (inclusion-exclusion triple within HLL
    tolerance), closing the loop the e24 docstring promised."""
    d = fan_out(Tables(spark, sf_dir).documents)
    w = tokens(F.col("text"))
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(w) - 2),
        lambda i: F.array_join(F.slice(w, i, 3), " "),
    )
    sh0 = (
        d.filter(F.size(w) >= 3)
        .select("source", F.explode(shingles).alias("s"))
        .distinct()
    )
    mask = sh0.groupBy("s").agg(F.sort_array(F.collect_set("source")).alias("m"))
    hist = mask.groupBy("m").agg(F.count("*").cast("long").alias("cnt"))
    srcs = d.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
    )
    in_a = F.array_contains(F.col("m"), F.col("src_a"))
    in_b = F.array_contains(F.col("m"), F.col("src_b"))
    agg_a = F.sum(F.when(in_a, F.col("cnt")).otherwise(F.lit(0))).alias("n_a")
    agg_b = F.sum(F.when(in_b, F.col("cnt")).otherwise(F.lit(0))).alias("n_b")
    agg_u = F.sum(F.when(in_a | in_b, F.col("cnt")).otherwise(F.lit(0))).alias(
        "n_union"
    )
    return (
        hist.crossJoin(F.broadcast(pairs))
        .groupBy("src_a", "src_b")
        .agg(agg_a, agg_b, agg_u)
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_union",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_inter"),
        )
    )
