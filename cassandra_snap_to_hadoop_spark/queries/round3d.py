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
    a per-user Python fold (mapInPandas since r11; was applyInPandas).
    SQL-certified since round 10; Python-reference-tested.
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

from cassandra_snap_to_hadoop_spark.io import Tables, fan_out
from cassandra_snap_to_hadoop_spark.operators.dedup import (
    normalize_text,
    ppjoin_pairs,
    simhash_hamming_pairs,
)
from cassandra_snap_to_hadoop_spark.operators.incremental import (
    merge_order_partials,
    order_partials,
    present,
)
from cassandra_snap_to_hadoop_spark.queries._util import md5_coin
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
    WHERE inter >= 0.75 * (sa.sz + sb.sz - inter)
    """,
    survey="J2,D9,J62",
)
def j62_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin/AllPairs prefix-filtered EXACT similarity join at t=0.75 —
    the un-blocked, un-approximated complement to j2's lang-blocked naive
    join and the MinHash-LSH tier.  The oracle is the naive quadratic
    shingle join; the engine path joins on ascending-document-frequency
    PREFIX shingles only (provably lossless at J >= t) plus the
    min >= t*max size prune, then verifies candidates exactly.  At 100 TB
    the frequent shingles — the naive join's quadratic blowup — never
    enter the join; candidate volume is bounded by rare-prefix collisions
    (same argument as j60's rare-shingle blocking, but with a per-set
    provable completeness guarantee instead of an idf heuristic).
    t = 0.75 (exactly representable in binary — 0.8 is NOT, and a 1-ulp
    overshoot in ceil(t*sz) would silently shrink the prefix and lose
    pairs) keeps every prune exact, and sits in the high-threshold regime
    prefix filtering is designed for: on this corpus the prefix join emits
    ~70k candidates at t=0.75 vs ~310k at t=0.5, and the POSITIONAL
    filter (the prune that makes it PPJoin rather than AllPairs — the
    earliest shared prefix token's positions bound the achievable
    overlap) cuts those to ~22k before verification, all for the same
    256 matching pairs."""
    d = Tables(spark, sf_dir).documents
    return ppjoin_pairs(d, "doc_id", "text", k=3, threshold=0.75)


def _snm_candidate_pairs(d: DataFrame, carry: list[str], w: int = 4) -> DataFrame:
    """Sorted-neighborhood scaffolding shared by j63 and i19 (j67 reuses
    j63's output): per-lang rank by the (n_chars, doc_id) sort key, then
    neighbors at rank distance 1..w-1 as a bounded-explode EQUI join.
    ``carry`` columns surface on both sides as <col>_a / <col>_b.  One
    blocking scheme, one definition — the candidate set every consumer
    scores is the same by construction."""
    r = d.withColumn(
        "rnk", F.row_number().over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
    )
    a = r.select(
        "lang",
        F.col("doc_id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
        F.col("rnk"),
        F.explode(F.sequence(F.lit(1), F.lit(w - 1))).alias("off"),
    ).select(
        "lang", "id_a", *[f"{c}_a" for c in carry],
        (F.col("rnk") + F.col("off")).alias("rnk_b"),
    )
    b = r.select(
        "lang",
        F.col("doc_id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
        F.col("rnk").alias("rnk_b"),
    )
    return a.join(b, ["lang", "rnk_b"]).drop("rnk_b")


def _order_day_spine(days: DataFrame) -> DataFrame:
    """Dense calendar between the observed min/max ``day`` — the in-plan
    sequence() spine shared by i18 (coverage) and f25 (interpolation)."""
    return (
        days.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(F.explode(F.sequence("mn", "mx")).alias("day"))
    )



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
    pairs = _snm_candidate_pairs(d, carry=["n_chars", "source"], w=4)
    delta = F.abs(F.col("n_chars_a") - F.col("n_chars_b"))
    same_src = F.when(F.col("source_a") == F.col("source_b"), 1).otherwise(0)
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
    spine = _order_day_spine(o)
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
    # The per-(source, value) count table feeds FOUR consumers (per-source
    # totals, global value list, the grid join, and N); materialize the
    # KB-scale aggregate once or each branch re-scans the corpus.
    counts = (
        d.groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
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


@register(
    "f24_holt_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
    ), spine AS (
        SELECT b.user_id, b.lo + u.i AS d
        FROM bounds b, LATERAL (SELECT unnest(range(0, b.hi - b.lo + 1)) AS i) u
    ), filled AS (
        SELECT s.user_id, s.d,
               COALESCE(daily.n, 0) * 1000000 AS x,
               CAST(ROW_NUMBER() OVER (PARTITION BY s.user_id ORDER BY s.d)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY s.user_id) AS BIGINT) AS n_days,
               LEAD(COALESCE(daily.n, 0) * 1000000)
                   OVER (PARTITION BY s.user_id ORDER BY s.d) AS x_next
        FROM spine s LEFT JOIN daily ON daily.user_id = s.user_id AND daily.d = s.d
    ), chain AS (
        SELECT user_id, rn, n_days,
               x AS lvl,
               COALESCE(x_next - x, CAST(0 AS BIGINT)) AS trend
        FROM filled WHERE rn = 1
        UNION ALL
        -- integer Holt on the micro lattice, trunc-toward-zero division
        -- (trend goes negative; DuckDB // and Spark DIV both truncate):
        --   l_t = (x_t + (l + b)) / 2            (alpha = 1/2)
        --   b_t = (3 (l_t - l) + 7 b) / 10       (beta  = 3/10)
        SELECT b.user_id, b.rn, b.n_days,
               (b.x + c.lvl + c.trend) // 2,
               (3 * ((b.x + c.lvl + c.trend) // 2 - c.lvl) + 7 * c.trend) // 10
        FROM chain c
        JOIN filled b ON b.user_id = c.user_id AND b.rn = c.rn + 1
    )
    SELECT user_id, n_days,
           CAST(lvl AS BIGINT) AS level_micros,
           CAST(trend AS BIGINT) AS trend_micros,
           CAST(lvl + 7 * trend AS BIGINT) AS forecast7_micros
    FROM chain WHERE rn = n_days
    """,
    survey="L3,F4,F24",
)
def f24_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per user over the zero-filled
    daily event-count series: level/trend recursion with the classic
    init (l₁ = x₁, b₁ = x₂ − x₁) plus a 7-day-ahead linear forecast.
    Each smoothed value depends on the previous state, so the recursion
    is genuinely not window-expressible — a per-user Python fold: one
    shuffle on user_id, the sequential scan runs per group over the
    group's bounded day span, nothing collects.  r11 moved the fold
    from applyInPandas (one Python invocation PER USER — the per-group
    overhead dominated) to the guide-§4.5 iterator form: one mapInPandas
    call per partition over user-contiguous sorted rows, straddling
    groups carried across Arrow batches; identical per-user fold and
    integers.

    SQL-CERTIFIED since round 10 (VERDICT r9 item 4 — the f31/f27
    conversion applied back to THIS registration): the fold moves to
    the integer MICRO lattice (x = daily count × 10⁶) with
    α = 1/2, β = 3/10 and trunc-toward-zero division —

        l_t = (x_t + (l_{t-1} + b_{t-1})) DIV 2
        b_t = (3·(l_t − l_{t-1}) + 7·b_{t-1}) DIV 10

    — bit-identical BIGINT state in both engines; the DuckDB oracle
    restates it as a per-user WITH RECURSIVE lockstep chain over the
    zero-filled calendar spine (depth = day span ≤ the observation
    window, frontier = |users| rows).  Trend goes negative: the Python
    replay uses sign-split division (Python // floors; SQL truncates).
    The float α=0.5/β=0.3 tier (``operators/forecast.holt_fold``)
    remains the production path for the STREAMING twin
    (streaming/pipelines.f24_stream), whose parity test pins against
    the fold directly.

    Scale shape: pre-aggregation (user × day counts) does the data
    reduction; the engine fold then touches |users| × |days| rows in
    one partition-wise pass (the oracle's recursion is the CERTIFICATE,
    not the production plan)."""
    import pandas as pd

    def tdiv(a: int, b: int) -> int:
        # trunc-toward-zero to match Spark DIV / DuckDB // on negatives
        q = abs(a) // b
        return q if a >= 0 else -q

    def holt_one(uid: int, ds: list[int], ns: list[int]) -> tuple:
        counts = dict(zip(ds, ns))
        lo, hi = min(ds), max(ds)
        xs = [counts.get(d, 0) * 1_000_000 for d in range(lo, hi + 1)]
        lvl = xs[0]
        trend = xs[1] - xs[0] if len(xs) > 1 else 0
        for x in xs[1:]:
            prev = lvl
            lvl = tdiv(x + lvl + trend, 2)
            trend = tdiv(3 * (lvl - prev) + 7 * trend, 10)
        return (uid, len(xs), lvl, trend, lvl + 7 * trend)

    # r11 (guide §4.5 iterator form): the applyInPandas fold invoked the
    # Python function once PER USER (~|users| tiny pandas frames — the
    # per-group overhead dominated the query).  The identical per-user
    # fold now runs under ONE mapInPandas call per partition:
    # repartition(user_id) + sortWithinPartitions makes each user's
    # daily rows contiguous, groups that straddle Arrow batches carry
    # over, and each batch yields one result frame.  Same fold, same
    # integers, one row per user.
    def holt_partition(batches):
        cols = ["user_id", "n_days", "level_micros", "trend_micros",
                "forecast7_micros"]

        def fold_frame(pdf: pd.DataFrame) -> pd.DataFrame:
            out = [
                holt_one(int(uid), list(g["d"].astype(int)), list(g["n"].astype(int)))
                for uid, g in pdf.groupby("user_id", sort=False)
            ]
            return pd.DataFrame(out, columns=cols)

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            last_uid = pdf["user_id"].iloc[-1]
            tail = pdf["user_id"] == last_uid
            carry = pdf[tail]
            done = pdf[~tail]
            if len(done):
                yield fold_frame(done)
        if carry is not None and len(carry):
            yield fold_frame(carry)

    e = Tables(spark, sf_dir).events
    daily = e.groupBy(
        "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("d")
    ).agg(F.count("*").alias("n"))
    return (
        daily.repartition("user_id")
        .sortWithinPartitions("user_id", "d")
        .mapInPandas(
            holt_partition,
            "user_id long, n_days long, level_micros long, trend_micros long,"
            " forecast7_micros long",
        )
    )


_J64_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_J64_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({_J64_NORM}, ' ')) AS w FROM documents
    ), h AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5(w), 1, 15)) AS UBIGINT) AS BIGINT) AS h
        FROM toks
    ), bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) bb
        GROUP BY 1, 2
    ), fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                             ELSE 0 END) AS BIGINT) AS f
        FROM bits GROUP BY 1
    ), bands AS (
        SELECT doc_id, f, bi, (f >> (bi * 10)) & 1023 AS bv
        FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5]) AS bi) bb
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                        a.f AS fa, b.f AS fb
        FROM bands a JOIN bands b
          ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= 5
    """


@register("j64_simhash_hamming_pairs", oracle=_J64_ORACLE, survey="J2,J64")
def j64_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs at simhash Hamming distance <= 5 via the
    pigeonhole band index (Manku WWW'07): 6 x 10-bit blocks, candidates
    collide on at least one whole block (provably complete for distance
    <= n_bands - 1 = 5), verified with one bit_count(xor).  This is the
    Hamming-space sibling of j2's MinHash bands: same bucket-join shape,
    but the guarantee is exact rather than probabilistic.

    SQL-certified IN PLACE since round 7 (VERDICT r6 item 3, the e44/e21
    pattern): token hashes are the first 60 bits of md5 — which DuckDB
    reproduces digit-for-digit — so tokenize → majority vote →
    fingerprint → pigeonhole bands → candidate join → xor verify is
    hash-checked end-to-end at a SECOND operating point (distance <= 5,
    6 x 10-bit bands) complementing j64_simhash_pairs_md5's distance <= 3
    / 4 x 15-bit configuration.  The xxhash64 tier remains the registered
    production default of operators/dedup.simhash_hamming_pairs and keeps
    its brute-force completeness pin in tests/test_round3d.py.

    Scale shape: one corpus scan → per-doc 60-way conditional-sum agg →
    6 bucket rows per doc → equi join on (band, value) buckets — linear
    in bucket occupancy, never all-pairs."""
    d = Tables(spark, sf_dir).documents
    token_hash = F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
    return simhash_hamming_pairs(
        d, "doc_id", "text", max_hamming=5, n_bands=6, bits=60, token_hash=token_hash
    )


@register(
    "e37_chi2_independence",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY 1, 2
    ), rws AS (
        SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1
    ), cls AS (
        SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1
    ), n AS (
        SELECT CAST(SUM(o) AS BIGINT) AS N FROM cells
    ), terms AS (
        SELECT CAST(ROUND(
                   ((CAST(o AS DOUBLE) * N - CAST(r AS DOUBLE) * c)
                    * (CAST(o AS DOUBLE) * N - CAST(r AS DOUBLE) * c))
                   / (CAST(N AS DOUBLE) * r * c) * 1000000) AS BIGINT) AS cell_micro,
               lang, source
        FROM cells JOIN rws USING (lang) JOIN cls USING (source) CROSS JOIN n
    )
    SELECT CAST(SUM(cell_micro) AS BIGINT) AS chi2_micro,
           SUM(cell_micro) / 1000000.0 AS chi2,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS INT) AS dof
    FROM terms
    """,
    survey="E5,E37,J8",
)
def e37_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence audit over the lang x source
    contingency table — the standard 'is my corpus mix balanced across
    sources' governance check.  Each cell's (O*N - R*C)^2 / (N*R*C) term
    is computed in double from EXACT integer marginals with an identical
    operation order in both engines, quantized to micro-units per cell,
    and summed as integers — so the statistic is association-order-free
    and hash-stable.  Marginals are two tiny re-aggregations of the cell
    table (never a second corpus scan) and N rides in as a broadcast
    scalar.  Exactness budget: O*N stays in IEEE-exact integer range for
    N < ~9e7 docs per product term at full precision; beyond that the
    double rounds at 1 ulp (the statistic, not the decision, shifts).
    At 100 TB the contingency table is |langs| x |sources| — the corpus
    scan is the only big stage."""
    d = Tables(spark, sf_dir).documents
    # r11 (guide §2.4): the bounded contingency grid feeds both margins,
    # the total and the term join — cut once (the e71 shape).
    cells = (
        d.groupBy("lang", "source")
        .agg(F.count("*").alias("o"))
        .localCheckpoint(eager=False)
    )
    rws = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cls = cells.groupBy("source").agg(F.sum("o").alias("c"))
    ntot = cells.agg(F.sum("o").alias("N"))
    t = (
        cells.join(rws, "lang")
        .join(cls, "source")
        .crossJoin(F.broadcast(ntot))
    )
    dev = F.col("o").cast("double") * F.col("N") - F.col("r").cast("double") * F.col("c")
    term = dev * dev / (F.col("N").cast("double") * F.col("r") * F.col("c"))
    terms = t.select(
        "lang", "source", F.round(term * 1000000).cast("long").alias("cell_micro")
    )
    return terms.agg(
        F.sum("cell_micro").alias("chi2_micro"),
        (F.sum("cell_micro") / F.lit(1000000.0)).alias("chi2"),
        F.count("*").alias("n_cells"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).cast("int").alias("dof"),
    )


@register(
    "e38_bootstrap_ci",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), bs AS (
        SELECT unnest(generate_series(1, 100)) AS b
    ), sub AS (
        SELECT b, CAST(SUM(cents) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
        FROM o CROSS JOIN bs
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 1) < '8'
        GROUP BY 1
    ), m AS (
        SELECT b, s / (c * 100.0) AS mean_b FROM sub
    ), r AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn FROM m
    ), res AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples,
               MAX(CASE WHEN rn = 5 THEN mean_b END) AS ci_lo,
               MAX(CASE WHEN rn = 95 THEN mean_b END) AS ci_hi
        FROM r
    ), f AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS ts, CAST(COUNT(*) AS BIGINT) AS tc FROM o
    )
    SELECT n_resamples, ts / (tc * 100.0) AS mean_full, ci_lo, ci_hi
    FROM res CROSS JOIN f
    """,
    survey="E5,E38,L0",
)
def e38_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed resampling confidence interval for the mean order
    price — the hash-gated, fully deterministic restatement of the
    bootstrap (the half-sampling 'm out of n' variant; the Poisson
    bootstrap is the same shape with a weight instead of a gate).  Each
    of B=100 resamples includes a row iff the first hex digit of
    md5(orderkey ':' b) < '8' — a reproducible 1/2-probability coin both
    engines flip IDENTICALLY, the same trick j22/j58 use for sampling.
    Resample means are exact cent-sums over exact counts; the 5th/95th
    ranked means (deterministic (mean, b) order) bound the 90% CI.  No
    RNG state, no collect: the B-way fan-out is a bounded explode that
    partial-aggregates immediately, so the shuffle carries B rows per
    partition, and re-running on re-ingested data gives bit-identical
    intervals.  At 100 TB B rides the scan (B*n map rows) — the classic
    single-pass distributed bootstrap."""
    o = Tables(spark, sf_dir).orders.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    B = 100
    # r11 (guide §2.5/§3.3): the B-way explode inherits the scan's split
    # count — a small parquet file is ONE split, so the B·n md5 gates ran
    # on one core.  fan_out round-robins the narrow PRE-explode rows
    # (2 columns) only when the scan is under-split (no-op at real
    # scale); the exchange carries n rows, not B·n.  Gate, agg and
    # values are unchanged (measured 7.7 -> 1.1 s warm noop at sf0.1).
    ex = fan_out(o).select(
        "o_orderkey", "cents", F.explode(F.sequence(F.lit(1), F.lit(B))).alias("b")
    )
    gate = md5_coin(F.col("o_orderkey"), F.col("b"))
    sub = ex.filter(gate).groupBy("b").agg(
        F.sum("cents").alias("s"), F.count("*").alias("c")
    )
    m = sub.select("b", (F.col("s") / (F.col("c") * F.lit(100.0))).alias("mean_b"))
    rn = F.row_number().over(Window.orderBy("mean_b", "b"))
    r = m.withColumn("rn", rn)
    res = r.agg(
        F.count("*").alias("n_resamples"),
        F.max(F.when(F.col("rn") == 5, F.col("mean_b"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == 95, F.col("mean_b"))).alias("ci_hi"),
    )
    # An md5 gate can (in principle) select zero rows for a resample, which
    # would drop it from the groupBy and silently shift which ranked means
    # become ci_lo/ci_hi.  Fail loudly instead of skewing the interval
    # (ADVICE r3): ranks 5/95 are only meaningful over exactly B resamples.
    res = res.withColumn(
        "n_resamples",
        F.when(F.col("n_resamples") == B, F.col("n_resamples")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("e38_bootstrap_ci: expected 100 non-empty resamples, got "),
                    F.col("n_resamples").cast("string"),
                )
            ).cast("long")
        ),
    )
    full = o.agg(F.sum("cents").alias("ts"), F.count("*").alias("tc"))
    return res.crossJoin(F.broadcast(full)).select(
        "n_resamples",
        (F.col("ts") / (F.col("tc") * F.lit(100.0))).alias("mean_full"),
        "ci_lo",
        "ci_hi",
    )


@register(
    "e39_kaplan_meier",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d0,
               CAST(MAX(CAST(ts AS DATE)) AS DATE) AS d1
        FROM events GROUP BY 1
    ), wend AS (
        SELECT MAX(d1) AS w FROM pu
    ), lt AS (
        SELECT CAST(date_diff('day', d0, d1) AS INT) AS t_days,
               CASE WHEN date_diff('day', d1, w) >= 3 THEN 1 ELSE 0 END AS observed
        FROM pu CROSS JOIN wend
    ), agg AS (
        SELECT t_days,
               CAST(SUM(observed) AS BIGINT) AS events,
               CAST(COUNT(*) - SUM(observed) AS BIGINT) AS censored,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lt GROUP BY 1
    ), u AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total FROM pu
    ), risk AS (
        SELECT t_days, events, censored,
               total - CAST(COALESCE(SUM(cnt) OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS at_risk
        FROM agg CROSS JOIN u
    ), curve AS (
        SELECT t_days, at_risk, events, censored,
               CAST(SUM(CASE WHEN events < at_risk AND events > 0
                        THEN CAST(ROUND(ln((at_risk - events) * 1.0 / at_risk) * 1000000) AS BIGINT)
                        ELSE 0 END)
                   OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS s_micro,
               MAX(CASE WHEN events >= at_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS dead
        FROM risk
    )
    SELECT t_days, at_risk, events, censored, s_micro,
           CASE WHEN dead = 1 THEN 0.0 ELSE ROUND(exp(s_micro / 1000000.0), 4) END AS km_r4
    FROM curve
    """,
    survey="E5,E39,F3",
)
def e39_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over user activity lifetimes —
    the standard churn/retention curve with RIGHT CENSORING done right:
    a user whose last event is within 3 days of the observation-window
    end hasn't provably churned, so they leave the risk set without
    counting as an event (e22's cohort retention has no censoring
    concept).  Lifetime = days between first and last event; risk sets
    come from one cumulative window over the per-lifetime aggregate
    (|distinct T| rows, bounded by the window span); the product
    S(t) = prod(1 - d_i/n_i) becomes the repo-standard integer micro-nat
    log-sum (j23/j41's trick), with a sticky 'dead' flag forcing S = 0
    past any t where the whole risk set fails.  All inputs to ln() are
    identical int-ratio doubles in both engines.  At 100 TB the per-user
    reduction is the only corpus-scale stage."""
    e = Tables(spark, sf_dir).events
    pu = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    wend = pu.agg(F.max("d1").alias("w"))
    lt = pu.crossJoin(F.broadcast(wend)).select(
        F.datediff("d1", "d0").cast("int").alias("t_days"),
        F.when(F.datediff("w", "d1") >= 3, 1).otherwise(0).alias("observed"),
    )
    agg = lt.groupBy("t_days").agg(
        F.sum("observed").alias("events"),
        (F.count("*") - F.sum("observed")).alias("censored"),
        F.count("*").alias("cnt"),
    )
    u = lt.agg(F.count("*").alias("total"))
    wprev = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = agg.crossJoin(F.broadcast(u)).withColumn(
        "at_risk", F.col("total") - F.coalesce(F.sum("cnt").over(wprev), F.lit(0))
    )
    term = F.when(
        (F.col("events") < F.col("at_risk")) & (F.col("events") > 0),
        F.round(
            F.log((F.col("at_risk") - F.col("events")) * F.lit(1.0) / F.col("at_risk"))
            * 1000000
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    curve = risk.withColumn("s_micro", F.sum(term).over(wcum)).withColumn(
        "dead",
        F.max(F.when(F.col("events") >= F.col("at_risk"), 1).otherwise(0)).over(wcum),
    )
    return curve.select(
        "t_days",
        "at_risk",
        "events",
        "censored",
        F.col("s_micro").cast("long").alias("s_micro"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("s_micro") / F.lit(1000000.0)), 4))
        .alias("km_r4"),
    )


@register("j66_bpe_merges", oracle=None, survey="J5,J6,J66")
def j66_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the corpus's top-10 BPE merges (Sennrich 2016) — the
    tokenizer-TRAINING sibling of j46's fertility audit.  The corpus
    collapses to the word-type frequency table (one hash agg; bounded by
    vocabulary, not corpus size), then each merge step is a distributed
    pair-count aggregate plus a codegen string replace; only the one-row
    merge DECISION ever reaches the driver (the same control-plane loop
    precedent as j2_dup_clusters).  Rows-only by design — the merge
    sequence is pinned step-by-step against an independent pure-Python
    implementation in tests/test_round3d.py."""
    from cassandra_snap_to_hadoop_spark.operators.bpe import bpe_merges

    d = Tables(spark, sf_dir).documents
    return bpe_merges(spark, d, "text", n_merges=10)


@register(
    "j67_ngram_overlap_metrics",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rnk
        FROM documents
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM r a JOIN r b ON a.lang = b.lang AND b.rnk - a.rnk BETWEEN 1 AND 3
        WHERE a.source = b.source
    ), toks AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS words
        FROM documents
    ), grams AS (
        SELECT doc_id,
               unnest([array_to_string(words[i:i+1], ' ')
                       for i in range(1, greatest(len(words), 1))]) AS g
        FROM toks WHERE len(words) >= 2
    ), gc AS (
        SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY 1, 2
    ), totals AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total FROM gc GROUP BY 1
    ), clipped AS (
        SELECT p.id_a, p.id_b,
               CAST(SUM(LEAST(ga.c, gb.c)) AS BIGINT) AS clip2
        FROM pairs p
        JOIN gc ga ON ga.doc_id = p.id_a
        JOIN gc gb ON gb.doc_id = p.id_b AND gb.g = ga.g
        GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b,
           COALESCE(c.clip2, 0) AS clip2,
           t.total AS total2,
           COALESCE(c.clip2, 0) / CAST(t.total AS DOUBLE) AS p2
    FROM pairs p
    JOIN totals t ON t.doc_id = p.id_b
    LEFT JOIN clipped c ON c.id_a = p.id_a AND c.id_b = p.id_b
    """,
    survey="J7,J67,J2",
)
def j67_ngram_overlap_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipped bigram precision (the BLEU-2 modified-precision core, exact
    integers) for every same-source sorted-neighborhood candidate pair —
    distributed evaluation metrics over candidate duplicates: how much of
    document B is covered by document A's bigrams, with per-gram counts
    CLIPPED at the reference count (the clipping is what makes BLEU robust
    to token stuffing).  Candidates come from j63's blocking (bounded
    O(n*w), never all pairs); gram counts are one hash agg per corpus;
    the clipped intersection is an equi join on (gram) keyed through the
    bounded pair set.  clip2/total2 are exact integers, so p2 is the same
    binary double in both engines — no rounding."""
    d = Tables(spark, sf_dir).documents
    # r11 (guide §2.4): the bounded candidate-pair set feeds the clipped
    # join AND the output join — cut once so the j63 blocking pipeline
    # runs once, not twice.
    pairs = (
        j63_sorted_neighborhood_pairs(spark, sf_dir)
        .filter(F.col("score") >= 2)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    toks = F.split(normalize_text(F.col("text")), " ")
    grams = (
        d.select(F.col("doc_id"), toks.alias("words"))
        .filter(F.size("words") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 1),
                    lambda i: F.concat_ws(" ", F.slice("words", i, 2)),
                )
            ).alias("g"),
        )
    )
    # r11 (guide §2.4): per-doc bigram counts feed the totals agg and
    # both clipped-intersection legs — cut once, one explode+agg pass.
    gc = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    totals = gc.groupBy("doc_id").agg(F.sum("c").alias("total"))
    ga = gc.select(F.col("doc_id").alias("id_a"), "g", F.col("c").alias("ca"))
    gb = gc.select(F.col("doc_id").alias("_gb"), F.col("g").alias("g_b"), F.col("c").alias("cb"))
    clipped = (
        pairs.join(ga, "id_a")
        .join(gb, (F.col("id_b") == F.col("_gb")) & (F.col("g") == F.col("g_b")))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least(F.col("ca"), F.col("cb"))).alias("clip2"))
    )
    tb = totals.select(F.col("doc_id").alias("id_b"), F.col("total").alias("total2"))
    return (
        pairs.join(tb, "id_b")
        .join(clipped, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce(F.col("clip2"), F.lit(0)).cast("long").alias("clip2"),
            F.col("total2"),
            (
                F.coalesce(F.col("clip2"), F.lit(0)) / F.col("total2").cast("double")
            ).alias("p2"),
        )
    )


@register(
    "e40_cuped_adjustment",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM per_user
    )
    SELECT n AS n_users,
           (n * sxx - sx * sx) AS cov_xx,
           (n * syy - sy * sy) AS cov_yy,
           (n * sxy - sx * sy) AS cov_xy,
           CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS theta,
           1.0 - (CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy))
               / (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)) AS var_reduction
    FROM s
    """,
    survey="E5,E40,F3",
)
def e40_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al., WSDM 2013) — the experimentation-platform
    variance-reduction estimator: regress each user's post-period metric
    on their PRE-period metric and report theta = cov(pre,post)/var(pre)
    plus the achievable variance reduction 1 - rho^2.  Every moment is an
    exact integer: per-user cent sums, then n*Sxy - Sx*Sy style central
    moments (e16's power-sum discipline), so theta and the reduction are
    identical binary doubles in both engines with no rounding.  Overflow
    budget: cent-quantized sums keep n*sum(x*x) under 2^63 up to ~1e9
    users at these magnitudes; beyond that the moments switch to double.
    One corpus-scale stage (the per-user reduction); the moment fold is a
    single partial-aggregated scalar row."""
    e = Tables(spark, sf_dir).events
    cents = F.round(F.col("value") * 100).cast("long")
    pre = F.sum(F.when(F.to_date("ts") <= F.lit("2024-01-15").cast("date"), cents).otherwise(0))
    post = F.sum(F.when(F.to_date("ts") > F.lit("2024-01-15").cast("date"), cents).otherwise(0))
    pu = e.groupBy("user_id").agg(pre.alias("x"), post.alias("y"))
    s = pu.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    cov_xx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    cov_yy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov_xy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.col("n").alias("n_users"),
        cov_xx.alias("cov_xx"),
        cov_yy.alias("cov_yy"),
        cov_xy.alias("cov_xy"),
        (cov_xy.cast("double") / cov_xx).alias("theta"),
        (
            F.lit(1.0)
            - (cov_xy.cast("double") * cov_xy) / (cov_xx.cast("double") * cov_yy)
        ).alias("var_reduction"),
    )


@register(
    "i19_edit_distance_pairs",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang, source, n_chars, text,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rnk
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) AS INT) AS lev40,
           CAST(CASE WHEN levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) <= 5
                THEN 1 ELSE 0 END AS INT) AS is_close
    FROM r a JOIN r b
      ON a.lang = b.lang AND b.rnk - a.rnk BETWEEN 1 AND 3
     AND a.source = b.source AND ABS(a.n_chars - b.n_chars) <= 30
    """,
    survey="I1,I19,J14",
)
def i19_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein scoring over the tightest sorted-neighborhood
    candidates (same source AND close length — j63's score-3 tier): the
    classic ER verification step, run only on the blocked O(n*w) pair
    set so the quadratic-cost edit distance never touches the full
    corpus.  Both engines implement unit-cost Levenshtein identically on
    the 40-char prefixes; the <= 5 'is_close' gate is an exact integer
    compare.  (j14's FastSS tier answers the OPPOSITE question — find
    candidates BY edit distance via deletion neighborhoods; this one
    scores an existing candidate set.)"""
    d = (
        Tables(spark, sf_dir)
        .documents.select("doc_id", "lang", "source", "n_chars", "text")
        .withColumn("t40", F.substring("text", 1, 40))
        .drop("text")
    )
    pairs = _snm_candidate_pairs(d, carry=["n_chars", "source", "t40"], w=4).filter(
        (F.col("source_a") == F.col("source_b"))
        & (F.abs(F.col("n_chars_a") - F.col("n_chars_b")) <= 30)
    )
    lev = F.levenshtein(F.col("t40_a"), F.col("t40_b"))
    return pairs.select(
        "id_a",
        "id_b",
        lev.cast("int").alias("lev40"),
        F.when(lev <= 5, 1).otherwise(0).cast("int").alias("is_close"),
    )


@register(
    "e41_ols_normal_equations",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS BIGINT) AS s2,
               CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT) * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s11,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT) * CAST(ROUND(l_discount * 10000) AS BIGINT)) AS BIGINT) AS s12,
               CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT) * CAST(ROUND(l_discount * 10000) AS BIGINT)) AS BIGINT) AS s22,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT) * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS s1y,
               CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT) * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS s2y,
               CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT) * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy
        FROM lineitem
    ), c AS (
        SELECT n, s1, s2, sy, s11, s12, s22, s1y, s2y, syy,
               (CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1) AS c11,
               (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2) AS c12,
               (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2) AS c22,
               (CAST(n AS DOUBLE) * s1y - CAST(s1 AS DOUBLE) * sy) AS c1y,
               (CAST(n AS DOUBLE) * s2y - CAST(s2 AS DOUBLE) * sy) AS c2y,
               (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) AS cyy
        FROM m
    )
    SELECT n AS n_rows, s1, s2, sy, s11, s12, s22, s1y, s2y, syy,
           (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS beta_qty,
           (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS beta_disc,
           ((c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) * c1y
            + (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) * c2y) / cyy AS r2
    FROM c
    """,
    survey="E5,E41,E16",
)
def e41_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ordinary least squares as ONE aggregate — 'learning via
    sufficient statistics', the pattern every scale-out ML system reduces
    to when the model is linear: regress extendedprice (whole dollars) on
    (quantity in hundredths, discount in basis points) by accumulating
    the 9 raw moments in a single partial-aggregated pass as EXACT int64
    sums (every one hash-checked; quantizations chosen so the largest
    per-row product y*y ~ 1e10 keeps the sums in int64 to ~5e8 rows —
    beyond that the moments switch to double at 1-ulp), then solve the
    2x2 CENTERED normal equations with Cramer's rule.  The centered
    combination n*Sij - Si*Sj happens in double with an IDENTICAL
    operation order in both engines, so betas and R^2 match bit-for-bit
    with no rounding.  One corpus-scale stage; the solve is O(1).  j61
    (Zipf slope) is this pattern's 1-feature sibling; e40 (CUPED) its
    covariance-only sibling."""
    li = Tables(spark, sf_dir).lineitem
    x1 = F.round(F.col("l_quantity") * 100).cast("long")
    x2 = F.round(F.col("l_discount") * 10000).cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    m = li.agg(
        F.count("*").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    c11 = F.col("n").cast("double") * F.col("s11") - F.col("s1").cast("double") * F.col("s1")
    c12 = F.col("n").cast("double") * F.col("s12") - F.col("s1").cast("double") * F.col("s2")
    c22 = F.col("n").cast("double") * F.col("s22") - F.col("s2").cast("double") * F.col("s2")
    c1y = F.col("n").cast("double") * F.col("s1y") - F.col("s1").cast("double") * F.col("sy")
    c2y = F.col("n").cast("double") * F.col("s2y") - F.col("s2").cast("double") * F.col("sy")
    cyy = F.col("n").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    det = c11 * c22 - c12 * c12
    b1 = (c1y * c22 - c2y * c12) / det
    b2 = (c2y * c11 - c1y * c12) / det
    return m.select(
        F.col("n").alias("n_rows"),
        "s1",
        "s2",
        "sy",
        "s11",
        "s12",
        "s22",
        "s1y",
        "s2y",
        "syy",
        b1.alias("beta_qty"),
        b2.alias("beta_disc"),
        ((b1 * c1y + b2 * c2y) / cyy).alias("r2"),
    )


@register("j68_bpe_encode_stats", oracle=None, survey="J5,J46,J68")
def j68_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply side of j66's BPE training: learn the top-10 merges,
    apply them in order to the word-type table as ten chained codegen
    replaces (the merge list is a broadcast-sized artifact — exactly how
    a learned tokenizer deploys at 100 TB), and report the corpus
    segmentation profile: word types, token instances, BPE units, and
    fertility (units per token — the learned-tokenizer counterpart of
    j46's regex-based fertility audit; more merges => lower fertility).
    Rows-only by design; pinned end-to-end against a pure-Python
    train+apply in tests/test_round3d.py."""
    from cassandra_snap_to_hadoop_spark.operators.bpe import bpe_encode_stats

    d = Tables(spark, sf_dir).documents
    return bpe_encode_stats(spark, d, "text", n_merges=10)


@register(
    "e43_permutation_test",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                  - SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS d
        FROM events GROUP BY 1
    ), obs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users, ABS(CAST(SUM(d) AS BIGINT)) AS t_obs
        FROM pu
    ), perms AS (
        SELECT b, ABS(CAST(SUM(CASE WHEN substring(md5(CAST(user_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 1) < '8'
                         THEN d ELSE -d END) AS BIGINT)) AS t_b
        FROM pu CROSS JOIN (SELECT unnest(generate_series(1, 199)) AS b) bs
        GROUP BY 1
    ), cnt AS (
        SELECT CAST(SUM(CASE WHEN t_b >= t_obs THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
        FROM perms CROSS JOIN obs
    )
    SELECT n_users, t_obs, n_ge,
           (n_ge + 1) / 200.0 AS p_value
    FROM obs CROSS JOIN cnt
    """,
    survey="E5,E43,E31",
)
def e43_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired permutation (sign-flip) test on per-user post-minus-pre
    spend — the assumption-free sibling of e31's Wilson interval and
    e38's bootstrap: under H0 (no period effect) each user's delta is
    symmetric around zero, so the null distribution comes from flipping
    signs.  The 199 sign patterns are md5-hash-derived exactly like
    e38's resamples (engine-identical, no RNG state), every statistic is
    an exact integer cent sum, and the p-value is the standard
    add-one-smoothed (n_ge+1)/(B+1) — an exact integer ratio, identical
    double in both engines.  Shape: one per-user reduction, then a
    B-way bounded explode that partial-aggregates immediately — B rides
    the map side at any corpus scale."""
    e = Tables(spark, sf_dir).events
    cents = F.round(F.col("value") * 100).cast("long")
    delta = F.sum(
        F.when(F.to_date("ts") > F.lit("2024-01-15").cast("date"), cents).otherwise(0)
    ) - F.sum(
        F.when(F.to_date("ts") <= F.lit("2024-01-15").cast("date"), cents).otherwise(0)
    )
    pu = e.groupBy("user_id").agg(delta.alias("d"))
    obs = pu.agg(
        F.count("*").alias("n_users"), F.abs(F.sum("d")).alias("t_obs")
    )
    B = 199
    ex = pu.select(
        "user_id", "d", F.explode(F.sequence(F.lit(1), F.lit(B))).alias("b")
    )
    flip = md5_coin(F.col("user_id"), F.col("b"))
    perms = ex.groupBy("b").agg(
        F.abs(F.sum(F.when(flip, F.col("d")).otherwise(-F.col("d")))).alias("t_b")
    )
    cnt = perms.crossJoin(F.broadcast(obs)).agg(
        F.sum(F.when(F.col("t_b") >= F.col("t_obs"), 1).otherwise(0)).alias("n_ge")
    )
    return obs.crossJoin(F.broadcast(cnt)).select(
        "n_users",
        "t_obs",
        "n_ge",
        ((F.col("n_ge") + 1) / F.lit(200.0)).alias("p_value"),
    )


@register(
    "f25_linear_interpolation",
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
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), grid AS (
        SELECT s.day, d.cents FROM spine s LEFT JOIN daily d ON s.day = d.day
    ), ctx AS (
        SELECT day, cents,
               LAST_VALUE(cents IGNORE NULLS) OVER w_prev AS pv,
               LAST_VALUE(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER w_prev AS pd,
               FIRST_VALUE(cents IGNORE NULLS) OVER w_next AS nv,
               FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER w_next AS nd
        FROM grid
        WINDOW w_prev AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT day,
           CAST(cents IS NULL AS INT) AS is_interpolated,
           CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                ELSE pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
                                       / date_diff('day', pd, nd)) END / 100.0 AS filled_total
    FROM ctx
    """,
    survey="F6,F25,I2",
)
def f25_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense date spine — the time-series
    RESAMPLE operation f6's carry-forward gap fill cannot express: a
    silent day's total is reconstructed from the straight line between
    its known neighbors, `prev + (next-prev) * gap_position`.  Neighbor
    values/dates come from two ignore-nulls windows over the i18 spine
    (one ordered exchange, both frames share it); the interpolation
    arithmetic is exact-integer cents and day counts combined in an
    identical operation order, so the filled doubles match DuckDB
    bit-for-bit.  The spine bounds at observed min/max guarantee every
    gap has both neighbors (no edge extrapolation case)."""
    o = Tables(spark, sf_dir).orders.select(
        F.to_date("o_orderdate").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    daily = o.groupBy("day").agg(F.sum("c").alias("cents"))
    spine = _order_day_spine(o.select("day"))
    grid = spine.join(daily, "day", "left")
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    known_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    ctx = (
        grid.withColumn("pv", F.last("cents", ignorenulls=True).over(w_prev))
        .withColumn("pd", F.last(known_day, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("cents", ignorenulls=True).over(w_next))
        .withColumn("nd", F.first(known_day, ignorenulls=True).over(w_next))
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff(F.col("day"), F.col("pd")).cast("double")
        / F.datediff(F.col("nd"), F.col("pd"))
    )
    return ctx.select(
        "day",
        F.col("cents").isNull().cast("int").alias("is_interpolated"),
        (
            F.when(F.col("cents").isNotNull(), F.col("cents").cast("double")).otherwise(
                interp
            )
            / F.lit(100.0)
        ).alias("filled_total"),
    )


@register(
    "a26_fixed_width_ingest",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders GROUP BY 1
    """,
    survey="A3,A26",
)
def a26_fixed_width_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (COBOL/mainframe-style) text ingestion: orders
    serialized as 40-char records with column OFFSETS as the schema —
    orderkey[1:12] custkey[13:24] status[25] cents[26:39] — no
    delimiters, no quoting; re-read with the line source and parsed by
    ``substring`` + cast, then aggregated against SQL over the original
    table.  Completes the source-format matrix (delimited a7/a8/a19,
    JSON a3/a18, XML a17, ORC a3, binary a20) with the one legacy layout
    every enterprise migration eventually meets.  Cents serialize as a
    14-digit zero-padded integer so the format/parse cycle is lossless
    by construction."""
    from pathlib import Path

    from cassandra_snap_to_hadoop_spark.queries.sources_io import _stage_dir

    path = _stage_dir(sf_dir) / "orders_fixed_width"
    if not Path(path / "_SUCCESS").exists():
        line = F.concat(
            F.format_string("%012d", F.col("o_orderkey")),
            F.format_string("%012d", F.col("o_custkey")),
            F.col("o_orderstatus"),
            F.format_string("%014d", F.round(F.col("o_totalprice") * 100).cast("long")),
        )
        (
            Tables(spark, sf_dir)
            .orders.select(line.alias("value"))
            .write.mode("overwrite")
            .text(str(path))
        )
    back = spark.read.text(str(path))
    parsed = back.select(
        F.substring("value", 1, 12).cast("long").alias("o_orderkey"),
        F.substring("value", 25, 1).alias("o_orderstatus"),
        F.substring("value", 26, 14).cast("long").alias("cents"),
    )
    return parsed.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
        (F.sum("cents") / F.lit(100.0)).alias("total_price"),
    )


@register(
    "a27_codec_roundtrip",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        FROM lineitem GROUP BY 1
    )
    SELECT codec, l_returnflag, n, qty_cents
    FROM agg CROSS JOIN (SELECT unnest(['parquet_zstd', 'csv_gzip']) AS codec) c
    """,
    survey="A3,A4,A27",
)
def a27_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec roundtrip: the SAME lineitem projection written
    as zstd parquet AND gzip CSV, both read back and aggregated — each
    codec path must reproduce the table's numbers exactly (the oracle is
    the direct aggregate fanned out per codec label).  zstd is the
    modern lakehouse default (better ratio than snappy at similar
    speed); gzip CSV is the interchange format data vendors actually
    ship.  NOTE the scale asymmetry this query makes visible: parquet
    splits into row groups so zstd parquet stays parallel, while a
    single gzip CSV member is NOT splittable — one task per file at any
    size, which is why the gzip stage writes per-partition files."""
    from pathlib import Path

    from cassandra_snap_to_hadoop_spark.queries.sources_io import _stage_dir

    li = Tables(spark, sf_dir).lineitem.select("l_returnflag", "l_quantity")
    pq_path = _stage_dir(sf_dir) / "lineitem_zstd_parquet"
    csv_path = _stage_dir(sf_dir) / "lineitem_gzip_csv"
    if not Path(pq_path / "_SUCCESS").exists():
        li.write.mode("overwrite").option("compression", "zstd").parquet(str(pq_path))
    if not Path(csv_path / "_SUCCESS").exists():
        li.write.mode("overwrite").option("compression", "gzip").option(
            "header", "true"
        ).csv(str(csv_path))
    back_pq = spark.read.parquet(str(pq_path)).withColumn("codec", F.lit("parquet_zstd"))
    back_csv = (
        spark.read.option("header", "true")
        .schema("l_returnflag string, l_quantity double")
        .csv(str(csv_path))
        .withColumn("codec", F.lit("csv_gzip"))
    )
    both = back_pq.unionByName(back_csv)
    return both.groupBy("codec", "l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
    )


@register(
    "j69_embedding_decontamination",
    oracle="""
    WITH train AS (
        SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 2 = 0
    ), eval AS (
        SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 2 = 1
    ), hits AS (
        SELECT e.vec_id AS eval_id,
               MAX(list_cosine_similarity(e.embedding::DOUBLE[], t.embedding::DOUBLE[])) AS best_cos
        FROM eval e JOIN train t ON e.label = t.label
        GROUP BY 1
    )
    SELECT e.label,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN h.best_cos >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           ROUND(MAX(COALESCE(h.best_cos, -1.0)), 4) AS worst_cos
    FROM eval e LEFT JOIN hits h ON h.eval_id = e.vec_id
    GROUP BY 1
    """,
    survey="J2,J15,J69",
)
def j69_embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval decontamination — the SEMANTIC sibling of
    j15's 5-gram lexical contamination check (paraphrased leakage slips
    past n-grams; this is the Llama-3-style embedding screen): every
    eval vector (odd vec_id) whose best TRAIN-side (even vec_id) cosine
    within its label block reaches 0.35 counts as contaminated; reported
    per label with the block's worst offender.  The cross-split join is
    label-blocked exactly like j2_embedding_neardup (equi join, never
    all-pairs) and the train side is the only corpus-scale relation —
    at 100 TB the eval set is broadcast-sized, making this the j3
    broadcast-KNN shape with a threshold instead of top-k.  Cosines are
    computed by the shared codegen HOF (pre-normalized dot), rounded 4dp
    only at presentation."""
    from cassandra_snap_to_hadoop_spark.operators.similarity import dot, l2_norm

    # r11 (the j59 treatment, guide §1.2): cosine() re-folded the L2
    # norms PER PAIR — each side now carries its norm from a per-row
    # projection (identical IEEE fold over identical operands ⇒
    # bit-identical values; the pair term keeps the exact dot/(na·nb)
    # expression), and fan_out spreads the quadratic stage off the
    # one-split local scan (no-op at real scale).
    emb = fan_out(Tables(spark, sf_dir).embeddings)
    train = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("tid"),
        F.col("label").alias("lbl"),
        F.col("embedding").alias("te"),
        l2_norm(F.col("embedding")).alias("tn"),
    )
    ev = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("eval_id"),
        F.col("label").alias("lbl"),
        F.col("embedding").alias("ee"),
        l2_norm(F.col("embedding")).alias("en"),
    )
    hits = (
        ev.join(train, "lbl")
        .select(
            "eval_id",
            "lbl",
            F.when(
                (F.col("en") > 0) & (F.col("tn") > 0),
                dot(F.col("ee"), F.col("te")) / (F.col("en") * F.col("tn")),
            ).alias("cos"),
        )
        .groupBy("eval_id")
        .agg(F.max("cos").alias("best_cos"))
    )
    return (
        ev.join(hits, "eval_id", "left")
        .groupBy(F.col("lbl").alias("label"))
        .agg(
            F.count("*").alias("n_eval"),
            F.sum(F.when(F.col("best_cos") >= 0.35, 1).otherwise(0)).alias(
                "n_contaminated"
            ),
            F.round(F.max(F.coalesce(F.col("best_cos"), F.lit(-1.0))), 4).alias(
                "worst_cos"
            ),
        )
    )


@register(
    "l8_pandas_iter_udf",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(1000000.0 / (1.0 + exp(-(value - 50.0) / 10.0))) AS BIGINT)) AS BIGINT)
               AS sigmoid_micro_sum
    FROM events GROUP BY 1
    """,
    survey="L1,L8",
)
def l8_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER) — the variant built for
    EXPENSIVE PER-WORKER INITIALIZATION: the generator body runs once per
    Arrow batch stream, so a model/tokenizer load happens once per task
    instead of once per batch (the deployment shape for j48-style learned
    encoders).  Here the 'model' is a sigmoid calibration whose parameters
    are 'loaded' before the loop; scores quantize to micro-units per row
    so the aggregate is association-order-free and value-checked against
    DuckDB's exp().  Plan stays Arrow-vectorized (asserted by the
    engine-wide no-rowwise-python test); numpy exp and libm exp agree
    bit-for-bit on these inputs (both correctly-rounded for the domain,
    pinned by the oracle hash)."""
    from cassandra_snap_to_hadoop_spark.operators.udf_iter import sigmoid_micro_udf

    sigmoid_micro = sigmoid_micro_udf(mu=50.0, scale=10.0)
    e = Tables(spark, sf_dir).events
    return (
        e.withColumn("sm", sigmoid_micro(F.col("value")))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("sm").alias("sigmoid_micro_sum"),
        )
    )
