"""Round-3 third-continuation batch — distinct algorithm families that the
registry did not yet cover, each the canonical member of its class:

  * j62 PPJoin prefix-filtered set-similarity join (Bayardo WWW'07 /
    Vernica SIGMOD'10): EXACT Jaccard pairs with NO metadata blocking and
    no approximation — prefix filtering is the pruner.  SQL.
  * j63 sorted-neighborhood blocking (Hernández-Stolfo SIGMOD'95): the
    classic entity-resolution candidate generator — rank by a blocking
    key, pair rows within a fixed window, score agreements.  SQL.
  * a24 incremental materialized-view maintenance: mergeable partial
    aggregates folded per ingest batch == full recompute, for any batch
    split (associativity Hypothesis-pinned).  SQL.
  * i18 date-spine coverage: calendar densification from an in-plan
    sequence() — the zero-filled activity calendar with gap flags.  SQL.
  * e36 two-sample Kolmogorov-Smirnov drift audit per source vs rest of
    corpus, exact integer ECDF numerators (no float compare).  SQL.
  * f24 Holt double-exponential smoothing forecast per user — the
    level+trend recursion is genuinely not window-expressible, so it is
    an applyInPandas fold like f15.  Rows-only; Python-reference-tested.
  * j64 simhash Hamming near-dup pairs via the PIGEONHOLE band index
    (Manku WWW'07) — completeness vs brute force test-pinned.  Rows-only
    (xxhash64-seeded fingerprints).

Registered behind the round-3 tail; rotates into the driver window in
round 4/5 with the rest of the late batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.operators.dedup import (
    ppjoin_pairs,
    simhash_hamming_pairs,
)
from cassandra_snap_to_hadoop_spark.operators.incremental import (
    merge_order_partials,
    order_partials,
    present,
)
from cassandra_snap_to_hadoop_spark.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SHINGLES = """
    list_distinct([array_to_string(words[i:i+2], ' ')
                   for i in range(1, greatest(len(words) - 1, 1))])
"""


@register(
    "j62_ppjoin_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS sh FROM toks
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE inter >= 0.5 * (sa.sz + sb.sz - inter)
    """,
    survey="J2,D9,J62",
)
def j62_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin/AllPairs prefix-filtered EXACT similarity join at t=0.5 —
    the un-blocked, un-approximated complement to j2's lang-blocked naive
    join and the MinHash-LSH tier.  The oracle is the naive quadratic
    shingle join; the engine path joins on ascending-document-frequency
    PREFIX shingles only (provably lossless at J >= t) plus the
    min >= t*max size prune, then verifies candidates exactly.  At 100 TB
    the frequent shingles — the naive join's quadratic blowup — never
    enter the join; candidate volume is bounded by rare-prefix collisions
    (same argument as j60's rare-shingle blocking, but with a per-set
    provable completeness guarantee instead of an idf heuristic).
    t = 0.5 keeps every prune exact in binary floating point."""
    d = Tables(spark, sf_dir).documents
    return ppjoin_pairs(d, "doc_id", "text", k=3, threshold=0.5)


@register(
    "j63_sorted_neighborhood_pairs",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rnk
        FROM documents
    )
    SELECT a.lang,
           a.doc_id AS id_a,
           b.doc_id AS id_b,
           CAST(ABS(a.n_chars - b.n_chars) AS BIGINT) AS delta_chars,
           CAST(2 * (CASE WHEN a.source = b.source THEN 1 ELSE 0 END)
                + (CASE WHEN ABS(a.n_chars - b.n_chars) <= 30 THEN 1 ELSE 0 END)
                AS INT) AS score
    FROM r a JOIN r b ON a.lang = b.lang AND b.rnk - a.rnk BETWEEN 1 AND 3
    """,
    survey="J2,J63,F1",
)
def j63_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (window w=4): rank
    every document inside its lang block by the sort key (n_chars,
    doc_id), pair each row with the next w-1 ranks, score cheap agreement
    signals (same source, close length) as exact integers — the classic
    SNM candidate generator that turns O(n^2) comparison into O(n*w).

    Spark-first: the rank is a window partitioned BY LANG (never global),
    and the w-1 neighbor pairing is an EQUI join on (lang, rank+i) built
    from a bounded explode — DuckDB states it as a rank band join; the
    engine restates it as i in 1..3 fan-out so it stays a hash join.  At
    100 TB per-block ranks come from the same range-partitioned two-pass
    scheme g4 certifies; the neighbor join stays equi regardless."""
    d = Tables(spark, sf_dir).documents.select("doc_id", "lang", "source", "n_chars")
    w = 4
    r = d.withColumn(
        "rnk", F.row_number().over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
    )
    a = r.select(
        "lang",
        F.col("doc_id").alias("id_a"),
        F.col("n_chars").alias("ch_a"),
        F.col("source").alias("src_a"),
        F.col("rnk"),
        F.explode(F.sequence(F.lit(1), F.lit(w - 1))).alias("off"),
    ).select(
        "lang", "id_a", "ch_a", "src_a", (F.col("rnk") + F.col("off")).alias("rnk_b")
    )
    b = r.select(
        "lang",
        F.col("doc_id").alias("id_b"),
        F.col("n_chars").alias("ch_b"),
        F.col("source").alias("src_b"),
        F.col("rnk").alias("rnk_b"),
    )
    pairs = a.join(b, ["lang", "rnk_b"])
    delta = F.abs(F.col("ch_a") - F.col("ch_b"))
    same_src = F.when(F.col("src_a") == F.col("src_b"), 1).otherwise(0)
    close_len = F.when(delta <= 30, 1).otherwise(0)
    return pairs.select(
        "lang",
        "id_a",
        "id_b",
        delta.cast("long").alias("delta_chars"),
        (2 * same_src + close_len).cast("int").alias("score"),
    )


@register(
    "a24_incremental_mv_maintenance",
    oracle="""
    SELECT o_orderpriority,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders GROUP BY 1, 2
    """,
    survey="A5,K7,E2,A24",
)
def a24_incremental_mv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the orders rollup is
    kept as mergeable partial states (count / exact cent-sum / min / max);
    a 'historical' batch (orderdate < 1999-01-01) and a 'new ingest'
    batch (the rest) are aggregated INDEPENDENTLY and folded by
    operators/incremental.merge_order_partials.  The oracle recomputes
    from all rows — value equality IS the refresh-correctness law, and
    tests pin it for arbitrary Hypothesis-chosen batch splits.  At 100 TB
    the fold touches |state| + |delta| rows, never history; the quantized
    cent-sum makes merge order float-exact by construction."""
    o = Tables(spark, sf_dir).orders
    cutoff = F.lit("1999-01-01").cast("timestamp")
    base = order_partials(o.filter(F.col("o_orderdate") < cutoff))
    delta = order_partials(o.filter(F.col("o_orderdate") >= cutoff))
    return present(merge_order_partials([base, delta]))


@register(
    "i18_date_spine_coverage",
    oracle="""
    WITH b AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS mn, CAST(MAX(o_orderdate) AS DATE) AS mx
        FROM orders
    ), spine AS (
        SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                                           CAST(mx AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b
    ), daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    )
    SELECT s.day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_orders,
           CAST(CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    survey="F6,I2,I18",
)
def i18_date_spine_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine densification: generate the full calendar between the
    corpus min and max order dates with an IN-PLAN sequence() over the
    1-row bounds aggregate (no driver collect, no literal dates), left
    join the daily counts, zero-fill, and flag gap days.  The spine side
    is |days| rows — broadcastable at any fact scale — and the daily agg
    is one partial-aggregated shuffle; this is the canonical prerequisite
    for every 'report per day including silent days' workload (f6 fills
    value gaps WITHIN rows; this manufactures the missing rows).  Date
    arithmetic is tz-free (to_date under the UTC-pinned session)."""
    o = Tables(spark, sf_dir).orders.select(F.to_date("o_orderdate").alias("day"))
    daily = o.groupBy("day").agg(F.count("*").alias("n"))
    spine = (
        o.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(F.explode(F.sequence("mn", "mx")).alias("day"))
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        F.when(F.col("n").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
    )


@register(
    "e36_ks_drift",
    oracle="""
    WITH counts AS (
        SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ), tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM counts GROUP BY 1
    ), vals AS (
        SELECT v, CAST(SUM(c) AS BIGINT) AS gc FROM counts GROUP BY 1
    ), gcum AS (
        SELECT v, CAST(SUM(gc) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS gcum
        FROM vals
    ), n AS (
        SELECT CAST(SUM(c) AS BIGINT) AS N FROM counts
    ), grid AS (
        SELECT t.source, t.n_s, g.v, g.gcum FROM tot t CROSS JOIN gcum g
    ), cum AS (
        SELECT gr.source, gr.n_s, gr.v, gr.gcum,
               CAST(SUM(COALESCE(c.c, 0)) OVER (PARTITION BY gr.source ORDER BY gr.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s
        FROM grid gr LEFT JOIN counts c ON c.source = gr.source AND c.v = gr.v
    ), d AS (
        SELECT source, n_s, N,
               CAST(MAX(ABS(cum_s * (N - n_s) - (gcum - cum_s) * n_s)) AS BIGINT) AS d_num
        FROM cum CROSS JOIN n
        GROUP BY 1, 2, 3
    )
    SELECT source,
           n_s AS n_source,
           (N - n_s) AS n_rest,
           d_num,
           d_num / (CAST(n_s AS DOUBLE) * (N - n_s)) AS d_stat
    FROM d
    """,
    survey="E5,E36,J37",
)
def e36_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift audit: for every source, the
    exact KS statistic between its n_chars distribution and the REST of
    the corpus — the nonparametric sibling of j37's KL drift (KL needs
    binning; KS is binning-free).  sup|F_s - F_rest| is attained at an
    observed value, so the whole computation lives on the (source x
    distinct-length) grid: per-(source,value) counts are one hash agg,
    the global value list rides in as a sorted 1-row array via the
    broadcast-scalar crossJoin pattern, ECDFs are cumulative windows, and
    the statistic compares INTEGER numerators cum_s*(N-n_s) vs
    (gcum-cum_s)*n_s — no float until the final division, so both engines
    emit identical doubles.  Exactness budget: products stay in int64 for
    N*n_s < 2^63 (N ~ 3e9 docs); past that the numerator switches to
    double at 1-ulp cost.  At 100 TB the grid is |lengths| x |sources| —
    domain-bounded, independent of corpus row count."""
    d = Tables(spark, sf_dir).documents
    counts = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("c")
    )
    tot = counts.groupBy("source").agg(F.sum("c").alias("n_s"))
    gl = counts.groupBy("v").agg(F.sum("c").alias("gc"))
    wg = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts = (
        gl.withColumn("gcum", F.sum("gc").over(wg))
        .agg(F.sort_array(F.collect_list(F.struct("v", "gcum"))).alias("pts"))
    )
    ntot = counts.agg(F.sum("c").alias("N"))
    grid = (
        tot.crossJoin(F.broadcast(pts))
        .select("source", "n_s", F.explode("pts").alias("p"))
        .select("source", "n_s", F.col("p.v").alias("v"), F.col("p.gcum").alias("gcum"))
    )
    ws = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.join(counts, ["source", "v"], "left").withColumn(
        "cum_s", F.sum(F.coalesce(F.col("c"), F.lit(0))).over(ws)
    )
    dnum = (
        cum.crossJoin(F.broadcast(ntot))
        .groupBy("source", "n_s", "N")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") * (F.col("N") - F.col("n_s"))
                    - (F.col("gcum") - F.col("cum_s")) * F.col("n_s")
                )
            ).alias("d_num")
        )
    )
    return dnum.select(
        "source",
        F.col("n_s").alias("n_source"),
        (F.col("N") - F.col("n_s")).alias("n_rest"),
        "d_num",
        (F.col("d_num") / (F.col("n_s").cast("double") * (F.col("N") - F.col("n_s")))).alias(
            "d_stat"
        ),
    )


@register("f24_holt_forecast", oracle=None, survey="L3,F4,F24")
def f24_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per user over the zero-filled
    daily event-count series: level/trend recursion (alpha=0.5, beta=0.3,
    classic init l0=x0, b0=x1-x0) plus a 7-day-ahead linear forecast.
    Like f15's CUSUM, each smoothed value depends on the CLAMPED previous
    state, so the recursion is genuinely not window-expressible — the
    canonical applyInPandas fold: one shuffle on user_id, the sequential
    scan runs per group in Arrow-backed pandas over the group's bounded
    day span, nothing collects.  Rows-only by design; the fold is pinned
    to a pure-Python reference in tests/test_round3d.py.  At 100 TB the
    pre-aggregation (user x day counts) does the data reduction; the fold
    then touches |users| * |days| rows only."""
    import pandas as pd

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        days = pd.date_range(pdf["day"].min(), pdf["day"].max(), freq="D").date
        x = (
            pdf.set_index("day")["n"]
            .reindex(days, fill_value=0)
            .astype(float)
            .to_numpy()
        )
        alpha, beta = 0.5, 0.3
        level = x[0]
        trend = (x[1] - x[0]) if len(x) > 1 else 0.0
        for v in x[1:]:
            prev = level
            level = alpha * v + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_days": [len(x)],
                "level": [round(level, 4)],
                "trend": [round(trend, 4)],
                "forecast_7d": [round(level + 7 * trend, 4)],
            }
        )

    e = Tables(spark, sf_dir).events
    daily = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    return daily.groupBy("user_id").applyInPandas(
        holt, "user_id long, n_days long, level double, trend double, forecast_7d double"
    )


@register("j64_simhash_hamming_pairs", oracle=None, survey="J2,J64")
def j64_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs at simhash Hamming distance <= 3 via the
    pigeonhole band index (Manku WWW'07): 4 x 16-bit blocks, candidates
    collide on at least one whole block (provably complete for distance
    <= 3), verified with one bit_count(xor).  Rows-only (fingerprints are
    xxhash64-seeded); completeness vs the brute-force all-pairs scan is
    pinned in tests/test_round3d.py.  This is the Hamming-space sibling
    of j2's MinHash bands: same bucket-join shape, but the guarantee is
    exact rather than probabilistic."""
    d = Tables(spark, sf_dir).documents
    return simhash_hamming_pairs(d, "doc_id", "text", max_hamming=3, n_bands=4)
