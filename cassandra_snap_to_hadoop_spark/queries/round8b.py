"""Round-8 continuation — the nonparametric k-sample / paired / blocked
test tier the two-sample rank machinery (e45 Mann-Whitney, e36 KS, e81
CvM) stops short of: Kruskal-Wallis (k independent groups), Wilcoxon
signed-rank (paired within-unit drift), Friedman (complete randomized
blocks), and Cochran's Q (blocked binary outcomes).  All four ride the
e45/e46 doubled-rank integer lattice: tie-averaged ranks are
half-integers, so every rank is stored as rank2 = 2*(#smaller) +
(#equal) + 1, every sufficient statistic is an exact BIGINT certified by
the hash check, and the final test statistic is one shared scalar double
chain (or, for Friedman and Cochran, pure integer millis end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables, fan_out
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "e101_kruskal_wallis",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
        FROM lineitem
    ), vc AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1
    ), r2 AS (
        SELECT v, c,
               2 * (SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) - c) + c + 1 AS rank2
        FROM vc
    ), per_g AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(rank2) AS BIGINT) AS r2_sum
        FROM vals JOIN r2 USING (v) GROUP BY 1
    ), ties AS (
        SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS tie_sum FROM vc
    ), wide AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN g = 'A' THEN n_g END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN g = 'A' THEN r2_sum END) AS BIGINT) AS r2_a,
               CAST(SUM(CASE WHEN g = 'N' THEN n_g END) AS BIGINT) AS n_n,
               CAST(SUM(CASE WHEN g = 'N' THEN r2_sum END) AS BIGINT) AS r2_n,
               CAST(SUM(CASE WHEN g = 'R' THEN n_g END) AS BIGINT) AS n_r,
               CAST(SUM(CASE WHEN g = 'R' THEN r2_sum END) AS BIGINT) AS r2_r
        FROM per_g
    ), h AS (
        SELECT n, n_a, r2_a, n_n, r2_n, n_r, r2_r, tie_sum,
               12.0 / (CAST(n AS DOUBLE) * (n + 1))
               * (CAST(r2_a AS DOUBLE) * CAST(r2_a AS DOUBLE)
                    / (4.0 * n_a)
                  + CAST(r2_n AS DOUBLE) * CAST(r2_n AS DOUBLE)
                    / (4.0 * n_n)
                  + CAST(r2_r AS DOUBLE) * CAST(r2_r AS DOUBLE)
                    / (4.0 * n_r))
               - 3.0 * (n + 1) AS h_raw,
               1.0 - CAST(tie_sum AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * n - n)
                 AS tie_corr
        FROM wide CROSS JOIN ties
    )
    SELECT n, n_a, r2_a, n_n, r2_n, n_r, r2_r, tie_sum,
           CAST(FLOOR(h_raw * 1000) AS BIGINT) AS h_milli,
           CASE WHEN tie_sum < n * n * n - n
                THEN CAST(FLOOR(h_raw / tie_corr * 1000) AS BIGINT)
                ELSE NULL END AS h_tied_milli
    FROM h
    """,
    survey="E101,E45,E5",
)
def e101_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the three lineitem return-flag populations
    on quantity — the k-SAMPLE extension e45's two-sample U cannot state
    (one omnibus 'did ANY of the k groups shift' with chi-square_{k-1}
    calibration, the nonparametric sibling of e57's one-way ANOVA).

    Exactness: the e45 doubled-rank lattice verbatim — rank2 = 2*(#
    smaller) + (#equal) + 1 on the DISTINCT-VALUE relation, per-group
    (n_g, Σrank2) exact BIGINTs, the tie term Σ(t³−t) an exact BIGINT —
    then H = 12/(N(N+1))·ΣRj²/nj − 3(N+1) (with Rj²/nj written as
    r2_sum²/(4nj)) and its tie-corrected form are ONE shared scalar
    double chain over those integers, identical operation order on both
    engines, milli-floored.  The return-flag domain is closed (A/N/R), so
    the groups pivot into a single row via conditional aggregation and no
    float aggregation across rows ever happens.  Integer budget: rank2 ≤
    2N and Σrank2 ≤ 2N² (BIGINT-safe to N ≈ 2·10⁹ rows); the tie cube
    t³ ≤ N³ bounds the exact tie term to N ≈ 2·10⁶ per distinct value —
    beyond that the tie histogram is domain-bounded (50 quantity values),
    so t ≈ N/50 keeps the budget to N ≈ 10⁸ rows per flag, stated here
    for the 100 TB read.

    Scale shape: ranks live on the 50-row distinct-quantity relation (no
    unpartitioned window — global_cumsum two-pass), scoring is one hash
    join of the fact onto the broadcast value→rank2 map plus a 3-group
    agg folded to one row by conditional aggregation."""
    from cassandra_snap_to_hadoop_spark.operators.layout import global_cumsum

    li = Tables(spark, sf_dir).lineitem
    vals = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    vc = vals.groupBy("v").agg(F.count("*").cast("long").alias("c"))
    cum = global_cumsum(vc, [F.col("v")], "c", rank_col="__rk", cum_col="cumv")
    r2 = cum.select(
        "v", (2 * (F.col("cumv") - F.col("c")) + F.col("c") + 1).alias("rank2")
    )
    per_g = (
        vals.join(F.broadcast(r2), "v")
        .groupBy("g")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum("rank2").cast("long").alias("r2_sum"),
        )
    )
    ties = vc.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_sum")
    )
    wide = per_g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.when(F.col("g") == "A", F.col("n_g"))).cast("long").alias("n_a"),
        F.sum(F.when(F.col("g") == "A", F.col("r2_sum"))).cast("long").alias("r2_a"),
        F.sum(F.when(F.col("g") == "N", F.col("n_g"))).cast("long").alias("n_n"),
        F.sum(F.when(F.col("g") == "N", F.col("r2_sum"))).cast("long").alias("r2_n"),
        F.sum(F.when(F.col("g") == "R", F.col("n_g"))).cast("long").alias("n_r"),
        F.sum(F.when(F.col("g") == "R", F.col("r2_sum"))).cast("long").alias("r2_r"),
    ).crossJoin(F.broadcast(ties))
    h_raw = (
        "12.0 / (CAST(n AS DOUBLE) * (n + 1))"
        " * (CAST(r2_a AS DOUBLE) * CAST(r2_a AS DOUBLE) / (4.0 * n_a)"
        "    + CAST(r2_n AS DOUBLE) * CAST(r2_n AS DOUBLE) / (4.0 * n_n)"
        "    + CAST(r2_r AS DOUBLE) * CAST(r2_r AS DOUBLE) / (4.0 * n_r))"
        " - 3.0 * (n + 1)"
    )
    tie_corr = (
        "1.0 - CAST(tie_sum AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * n - n)"
    )
    return wide.select(
        "n", "n_a", "r2_a", "n_n", "r2_n", "n_r", "r2_r", "tie_sum",
        F.expr(f"CAST(FLOOR(({h_raw}) * 1000) AS BIGINT)").alias("h_milli"),
        # Degenerate all-values-identical data makes tie_corr exactly 0;
        # Spark double division yields NULL there but DuckDB IEEE mode
        # yields inf and errors on the BIGINT cast — guard both to NULL.
        F.expr(
            f"CASE WHEN tie_sum < n * n * n - n"
            f" THEN CAST(FLOOR(({h_raw}) / ({tie_corr}) * 1000) AS BIGINT)"
            f" ELSE NULL END"
        ).alias("h_tied_milli"),
    )


@register(
    "e102_wilcoxon_signed_rank",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000) % 2 = 1
                    THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT)
               - CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000) % 2 = 0
                    THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS d
        FROM events GROUP BY 1
    ), nz AS (
        SELECT d, ABS(d) AS a FROM per_user WHERE d <> 0
    ), ac AS (
        SELECT a, CAST(COUNT(*) AS BIGINT) AS c FROM nz GROUP BY 1
    ), r2 AS (
        SELECT a, c,
               2 * (SUM(c) OVER (ORDER BY a ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) - c) + c + 1 AS rank2
        FROM ac
    ), scored AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN d > 0 THEN rank2 ELSE 0 END)
                    AS BIGINT) AS w2_plus,
               CAST(SUM(CASE WHEN d < 0 THEN rank2 ELSE 0 END)
                    AS BIGINT) AS w2_minus
        FROM nz JOIN r2 USING (a)
    ), ties AS (
        SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS tie_sum FROM ac
    )
    SELECT n, w2_plus, w2_minus, tie_sum,
           CAST(FLOOR(
               (CAST(w2_plus AS DOUBLE) / 2.0
                - CAST(n AS DOUBLE) * (n + 1) / 4.0)
               / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
                      - CAST(tie_sum AS DOUBLE) / 48.0) * 1000)
           AS BIGINT) AS z_milli
    FROM scored CROSS JOIN ties
    """,
    survey="E102,E45,F15",
)
def e102_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank on PAIRED within-user drift: each user's
    event-value total on odd calendar days vs even calendar days — the
    within-unit period-A/period-B comparison e45's independent-sample U
    gets wrong (the user is their own control; independence across the
    pair members does not hold, so the signed-rank null is the right
    one).  Zero differences drop per the standard Pratt-free convention.

    Exactness: per-user differences are exact BIGINT cents; |d| ranks
    ride the e45 doubled lattice on the DISTINCT-|d| relation; W2+ =
    Σrank2 over positive d and its negative twin are exact BIGINTs with
    the closed-form law W2+ + W2- = 2·n(n+1)/2 pinned in tests; the
    normal approximation z = (W+ − n(n+1)/4)/√(n(n+1)(2n+1)/24 − Σ(t³−t)
    /48) is one scalar double chain over those integers (W+ = w2_plus/2),
    milli-floored.

    Scale shape: one fact scan → per-user agg (shuffle on user_id), |d|
    ranks on the distinct-value relation via global_cumsum, one hash
    join back, one global agg — no unpartitioned windows, no float
    aggregation."""
    from cassandra_snap_to_hadoop_spark.operators.layout import global_cumsum

    ev = Tables(spark, sf_dir).events
    cents = F.round(F.col("value") * 100).cast("long")
    day_parity = F.expr("unix_micros(ts) DIV 86400000000") % 2
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(day_parity == 1, cents).otherwise(F.lit(0))).cast("long")
            - F.sum(F.when(day_parity == 0, cents).otherwise(F.lit(0))).cast("long")
        ).alias("d")
    )
    nz = per_user.filter(F.col("d") != 0).select("d", F.abs(F.col("d")).alias("a"))
    ac = nz.groupBy("a").agg(F.count("*").cast("long").alias("c"))
    cum = global_cumsum(ac, [F.col("a")], "c", rank_col="__rk", cum_col="cumv")
    r2 = cum.select(
        "a", (2 * (F.col("cumv") - F.col("c")) + F.col("c") + 1).alias("rank2")
    )
    scored = nz.join(F.broadcast(r2), "a").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("rank2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("w2_plus"),
        F.sum(F.when(F.col("d") < 0, F.col("rank2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("w2_minus"),
    )
    ties = ac.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_sum")
    )
    return scored.crossJoin(F.broadcast(ties)).select(
        "n", "w2_plus", "w2_minus", "tie_sum",
        F.expr(
            "CAST(FLOOR("
            " (CAST(w2_plus AS DOUBLE) / 2.0"
            "  - CAST(n AS DOUBLE) * (n + 1) / 4.0)"
            " / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0"
            "        - CAST(tie_sum AS DOUBLE) / 48.0) * 1000)"
            " AS BIGINT)"
        ).alias("z_milli"),
    )


@register(
    "e103_friedman_test",
    oracle="""
    WITH cells AS (
        SELECT c.c_nationkey AS blk, o.o_orderpriority AS trt,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), complete AS (
        SELECT blk FROM cells GROUP BY 1 HAVING COUNT(*) = 5
    ), cc AS (
        SELECT cells.* FROM cells JOIN complete USING (blk)
    ), ranked AS (
        SELECT a.blk, a.trt,
               2 * SUM(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
               + SUM(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) + 1 AS rank2
        FROM cc a JOIN cc b ON a.blk = b.blk
        GROUP BY 1, 2
    ), per_trt AS (
        SELECT trt, CAST(SUM(rank2) AS BIGINT) AS r2_sum
        FROM ranked GROUP BY 1
    ), summ AS (
        SELECT CAST((SELECT COUNT(*) FROM complete) AS BIGINT) AS n_blocks,
               CAST(SUM(r2_sum * r2_sum) AS BIGINT) AS ss2
        FROM per_trt
    )
    SELECT p.trt, p.r2_sum, s.n_blocks,
           CAST(3000 * s.ss2 // (s.n_blocks * 5 * 6)
                - 3000 * s.n_blocks * 6 AS BIGINT) AS chi2_milli
    FROM per_trt p CROSS JOIN summ s
    ORDER BY p.trt
    """,
    survey="E103,E57,E45",
)
def e103_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test over complete randomized blocks: nation =
    block, order priority = treatment, per-cell revenue (exact cents) =
    response — 'does any priority class systematically out-earn the
    others once every nation judges all five on its own scale' — the
    BLOCKED k-sample question e101's Kruskal-Wallis (which pools all
    groups onto one global ranking) cannot ask, and the nonparametric
    sibling of a two-way ANOVA main effect.

    Exactness: pure integer END-TO-END — cell values are exact BIGINT
    cent sums; within-block tie-averaged ranks ride the doubled lattice
    computed by a per-block self-join (k=5 rows per block, so the
    quadratic is 25 pairs per block, constant); treatment rank sums R2j
    and ΣR2j² are exact BIGINTs; χ² = 12/(nk(k+1))·ΣRj² − 3n(k+1)
    becomes chi2_milli = 3000·ΣR2j² DIV (n·k·(k+1)) − 3000·n·(k+1) with
    Rj = R2j/2 — integer floor division, NO doubles anywhere.  Blocks
    missing any treatment are excluded (Friedman requires complete
    blocks; stated, and the fixture has all 25 complete).

    Scale shape: fact scan → (block, treatment) agg; ranking is a
    self-join on the block key over a k-bounded relation (25·k rows);
    everything after is KB-scale.  Output is one row per treatment (5)
    carrying the shared integer chi2."""
    t = Tables(spark, sf_dir)
    cells = (
        t.orders.join(
            t.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("blk"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("v")
        )
        # r11 (guide §2.4): the ≤125-row cell grid feeds the completeness
        # agg, both self-join sides and the block count — one cut keeps
        # the orders⋈customer fact join from re-running per consumer.
        .localCheckpoint(eager=False)
    )
    complete = cells.groupBy("blk").count().filter(F.col("count") == 5).select("blk")
    cc = cells.join(F.broadcast(complete), "blk")
    a, b = cc.alias("a"), cc.alias("b")
    ranked = (
        a.join(b, F.col("a.blk") == F.col("b.blk"))
        .groupBy(F.col("a.blk").alias("blk"), F.col("a.trt").alias("trt"))
        .agg(
            (
                2 * F.sum(F.when(F.col("b.v") < F.col("a.v"), 1).otherwise(0))
                + F.sum(F.when(F.col("b.v") == F.col("a.v"), 1).otherwise(0))
                + 1
            ).alias("rank2")
        )
    )
    per_trt = ranked.groupBy("trt").agg(F.sum("rank2").cast("long").alias("r2_sum"))
    n_blocks = complete.agg(F.count("*").cast("long").alias("n_blocks"))
    summ = (
        per_trt.agg(
            F.sum(F.col("r2_sum") * F.col("r2_sum")).cast("long").alias("ss2")
        )
        .crossJoin(F.broadcast(n_blocks))
    )
    return (
        per_trt.crossJoin(F.broadcast(summ))
        .select(
            "trt",
            "r2_sum",
            "n_blocks",
            F.expr(
                "CAST(3000 * ss2 DIV (n_blocks * 5 * 6)"
                " - 3000 * n_blocks * 6 AS BIGINT)"
            ).alias("chi2_milli"),
        )
        .orderBy("trt")
    )


@register(
    "e104_cochran_q",
    oracle="""
    WITH flags AS (
        SELECT l_orderkey AS blk,
               MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS x_ret,
               MAX(CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) >= 5
                   THEN 1 ELSE 0 END) AS x_disc,
               MAX(CASE WHEN CAST(ROUND(l_tax * 100) AS BIGINT) >= 5
                   THEN 1 ELSE 0 END) AS x_tax
        FROM lineitem GROUP BY 1
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(SUM(x_ret) AS BIGINT) AS c_ret,
               CAST(SUM(x_disc) AS BIGINT) AS c_disc,
               CAST(SUM(x_tax) AS BIGINT) AS c_tax,
               CAST(SUM(x_ret + x_disc + x_tax) AS BIGINT) AS sum_r,
               CAST(SUM((x_ret + x_disc + x_tax)
                        * (x_ret + x_disc + x_tax)) AS BIGINT) AS sum_r2
        FROM flags
    )
    SELECT n_blocks, c_ret, c_disc, c_tax, sum_r, sum_r2,
           CASE WHEN 3 * sum_r - sum_r2 > 0
                THEN CAST(1000 * (2 * (3 * (c_ret * c_ret
                          + c_disc * c_disc + c_tax * c_tax)
                          - sum_r * sum_r))
                     // (3 * sum_r - sum_r2) AS BIGINT)
                ELSE NULL END AS q_milli
    FROM s
    """,
    survey="E104,E78,E96",
)
def e104_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over blocked BINARY outcomes: per order (block), does
    the order contain (a) any returned line, (b) any line discounted ≥5%,
    (c) any line taxed ≥5% — 'do the k binary treatments have equal
    success rates once every block answers all k' — the k-treatment
    extension of e78's McNemar (k=2 paired binary) and the binary
    sibling of e103's Friedman.

    Exactness: pure integer END-TO-END — presence flags are 0/1 MAXes,
    column totals Cj, ΣRi and ΣRi² exact BIGINTs in ONE aggregation,
    and Q = (k−1)·[k·ΣCj² − (ΣCj)²] / (k·ΣRi − ΣRi²) is an integer
    milli floor division (the denominator is zero only when every block
    answers all-yes or all-no — guarded to NULL).  The (k−1) coefficient
    is the EXPANDED form of the textbook k(k−1)·Σ(Cj − N/k)² numerator:
    Σ(Cj − N/k)² = (k·ΣCj² − N²)/k, so one factor of k cancels — at k=2
    this reduces exactly to McNemar's (b−c)²/(b+c).  The mode domain is
    closed (3 chosen treatments), so the whole statistic folds into one
    row with conditional aggregation and no float ever appears.

    Scale shape: one fact scan → per-order flag agg (shuffle on the
    natural lineitem key) → one global 6-stat agg → 1-row arithmetic."""
    li = Tables(spark, sf_dir).lineitem
    flags = li.groupBy(F.col("l_orderkey").alias("blk")).agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("x_ret"),
        F.max(
            F.when(F.round(F.col("l_discount") * 100).cast("long") >= 5, 1).otherwise(0)
        ).alias("x_disc"),
        F.max(
            F.when(F.round(F.col("l_tax") * 100).cast("long") >= 5, 1).otherwise(0)
        ).alias("x_tax"),
    )
    r = F.col("x_ret") + F.col("x_disc") + F.col("x_tax")
    s = flags.agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("x_ret").cast("long").alias("c_ret"),
        F.sum("x_disc").cast("long").alias("c_disc"),
        F.sum("x_tax").cast("long").alias("c_tax"),
        F.sum(r).cast("long").alias("sum_r"),
        F.sum(r * r).cast("long").alias("sum_r2"),
    )
    return s.select(
        "n_blocks", "c_ret", "c_disc", "c_tax", "sum_r", "sum_r2",
        F.expr(
            "CASE WHEN 3 * sum_r - sum_r2 > 0"
            " THEN CAST(1000 * (2 * (3 * (c_ret * c_ret"
            "      + c_disc * c_disc + c_tax * c_tax)"
            "      - sum_r * sum_r))"
            "      DIV (3 * sum_r - sum_r2) AS BIGINT)"
            " ELSE NULL END"
        ).alias("q_milli"),
    )


# --------------------------------------------------------------------------
# Batch 2: residual-diagnostics (Ljung-Box portmanteau, Durbin-Watson) and
# the categorical-association pair (G-test, odds ratio with Woolf CI).
# --------------------------------------------------------------------------


@register(
    "f45_ljung_box",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
        FROM daily
    ), den AS (
        SELECT CAST(SUM((n * x - s) * (n * x - s)) AS BIGINT) AS d
        FROM daily CROSS JOIN stats
    ), lags AS (
        SELECT unnest(range(1, 8)) AS k
    ), nums AS (
        SELECT k, CAST(SUM((n * a.x - s) * (n * b.x - s)) AS BIGINT) AS num
        FROM daily a
        JOIN lags ON TRUE
        JOIN daily b ON b.day = a.day + k
        CROSS JOIN stats
        GROUP BY k
    ), wide AS (
        SELECT CAST(SUM(CASE WHEN k = 1 THEN num END) AS BIGINT) AS m1,
               CAST(SUM(CASE WHEN k = 2 THEN num END) AS BIGINT) AS m2,
               CAST(SUM(CASE WHEN k = 3 THEN num END) AS BIGINT) AS m3,
               CAST(SUM(CASE WHEN k = 4 THEN num END) AS BIGINT) AS m4,
               CAST(SUM(CASE WHEN k = 5 THEN num END) AS BIGINT) AS m5,
               CAST(SUM(CASE WHEN k = 6 THEN num END) AS BIGINT) AS m6,
               CAST(SUM(CASE WHEN k = 7 THEN num END) AS BIGINT) AS m7
        FROM nums
    )
    SELECT n, d AS den_scaled, m1, m2, m3, m4, m5, m6, m7,
           CAST(FLOOR(CAST(n AS DOUBLE) * (n + 2) * (
               (CAST(m1 AS DOUBLE) / d) * (CAST(m1 AS DOUBLE) / d) / (n - 1)
             + (CAST(m2 AS DOUBLE) / d) * (CAST(m2 AS DOUBLE) / d) / (n - 2)
             + (CAST(m3 AS DOUBLE) / d) * (CAST(m3 AS DOUBLE) / d) / (n - 3)
             + (CAST(m4 AS DOUBLE) / d) * (CAST(m4 AS DOUBLE) / d) / (n - 4)
             + (CAST(m5 AS DOUBLE) / d) * (CAST(m5 AS DOUBLE) / d) / (n - 5)
             + (CAST(m6 AS DOUBLE) / d) * (CAST(m6 AS DOUBLE) / d) / (n - 6)
             + (CAST(m7 AS DOUBLE) / d) * (CAST(m7 AS DOUBLE) / d) / (n - 7)
           ) * 1000) AS BIGINT) AS q_milli
    FROM wide CROSS JOIN stats CROSS JOIN den
    """,
    survey="F45,F38,F43",
)
def f45_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau Q over ACF lags 1..7 of the daily
    event-count series — the ONE-NUMBER whiteness gate f38's per-lag
    table feeds (f43/f44 screen randomness via signs and extrema; Q is
    the chi-square_7 test every ARIMA residual check quotes: n(n+2)·
    Σ r_k²/(n−k)).

    Exactness: the f38 n-scaled lattice verbatim — per-lag numerators
    Σ(n·x_t−S)(n·x_{t+k}−S) and the shared denominator are exact
    BIGINTs; the closed lag domain (1..7) pivots them into ONE row by
    conditional aggregation, and Q is one shared scalar double chain in
    written term order (r_k = num_k/d computed per term — num_k² would
    overflow BIGINT, so the squares live in doubles), milli-floored.
    Lag adjacency is explicit day arithmetic (calendar gaps drop pairs,
    never misalign them — the f38 rule).

    Scale shape: one scan → calendar-bounded daily agg; lag join, pivot
    and the 1-row fold all run on the |days| relation (KB at any
    volume)."""
    ev = Tables(spark, sf_dir).events
    # r11 (guide §2.4): the calendar-bounded daily series feeds the n/s
    # fold, the denominator fold and both lag-join sides — cut once so
    # the events scan+agg runs once, not four times.
    daily = ev.groupBy(
        F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(F.count("*").cast("long").alias("x")).localCheckpoint(eager=False)
    stats = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    den = (
        daily.crossJoin(F.broadcast(stats))
        .select(
            (
                (F.col("n") * F.col("x") - F.col("s"))
                * (F.col("n") * F.col("x") - F.col("s"))
            ).alias("sq")
        )
        .agg(F.sum("sq").cast("long").alias("d"))
    )
    lags = spark.range(1, 8).select(F.col("id").alias("k"))
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    nums = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .crossJoin(F.broadcast(stats))
        .groupBy("k")
        .agg(
            F.sum(
                (F.col("n") * F.col("xa") - F.col("s"))
                * (F.col("n") * F.col("xb") - F.col("s"))
            )
            .cast("long")
            .alias("num")
        )
    )
    wide = nums.agg(
        *[
            F.sum(F.when(F.col("k") == k, F.col("num")))
            .cast("long")
            .alias(f"m{k}")
            for k in range(1, 8)
        ]
    )
    q_terms = " + ".join(
        f"(CAST(m{k} AS DOUBLE) / d) * (CAST(m{k} AS DOUBLE) / d) / (n - {k})"
        for k in range(1, 8)
    )
    return (
        wide.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(den))
        .select(
            "n",
            F.col("d").alias("den_scaled"),
            *[F.col(f"m{k}") for k in range(1, 8)],
            F.expr(
                f"CAST(FLOOR(CAST(n AS DOUBLE) * (n + 2) * ({q_terms}) * 1000)"
                " AS BIGINT)"
            ).alias("q_milli"),
        )
    )


@register(
    "f46_durbin_watson",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s
        FROM daily GROUP BY 1
    ), den AS (
        SELECT d.event_type,
               CAST(SUM((n * x - s) * (n * x - s)) AS BIGINT) AS den_scaled
        FROM daily d JOIN stats USING (event_type)
        GROUP BY 1
    ), num AS (
        SELECT a.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM((st.n * b.x - st.n * a.x)
                        * (st.n * b.x - st.n * a.x)) AS BIGINT) AS num_scaled
        FROM daily a
        JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + 1
        JOIN stats st ON st.event_type = a.event_type
        GROUP BY 1
    )
    SELECT s.event_type, s.n AS n_days, num.n_pairs,
           num.num_scaled, den.den_scaled,
           CAST(1000 * num.num_scaled // den.den_scaled AS BIGINT) AS dw_milli
    FROM stats s JOIN num USING (event_type) JOIN den USING (event_type)
    ORDER BY s.event_type
    """,
    survey="F46,F38,F43",
)
def f46_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson first-order serial-correlation statistic per event
    type on the daily revenue-cents series — the regression-residual
    autocorrelation gate (DW ≈ 2(1−ρ₁): ≈2 white, →0 positive, →4
    negative serial correlation) that complements f45's omnibus Q with a
    DIRECTIONAL lag-1 readout; residuals here are deviations from the
    per-type mean (the intercept-only model), for which DW is exact.

    Exactness: pure integer END-TO-END — the mean-centering cancels in
    the difference numerator, so with the n-scaled lattice num_scaled =
    Σ(n·x_t − n·x_{t−1})² and den_scaled = Σ(n·x_t − S)² are both exact
    BIGINTs scaled by the same n², and dw_milli = 1000·num DIV den needs
    no doubles at all.  Consecutive-day pairs come from explicit day
    arithmetic (the f38 rule: calendar gaps drop pairs, never misalign).

    Scale shape: one scan → (type, day) agg; everything after lives on
    the calendar-bounded per-type day relation (KB), one hash join per
    leg on the type key."""
    ev = Tables(spark, sf_dir).events
    # r11 (guide §2.4): per-type daily series feeds stats, the
    # denominator leg and both lag-join sides — one cut, one events scan.
    daily = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    ).localCheckpoint(eager=False)
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    den = (
        daily.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("n") * F.col("x") - F.col("s"))
                * (F.col("n") * F.col("x") - F.col("s"))
            )
            .cast("long")
            .alias("den_scaled")
        )
    )
    a = daily.select(
        F.col("event_type"), F.col("day").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("db"),
        F.col("x").alias("xb"),
    )
    num = (
        a.join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("db") == F.col("da") + 1),
        )
        .join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(
                (F.col("n") * F.col("xb") - F.col("n") * F.col("xa"))
                * (F.col("n") * F.col("xb") - F.col("n") * F.col("xa"))
            )
            .cast("long")
            .alias("num_scaled"),
        )
    )
    return (
        stats.join(num, "event_type")
        .join(den, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "n_pairs",
            "num_scaled",
            "den_scaled",
            F.expr("CAST(1000 * num_scaled DIV den_scaled AS BIGINT)").alias(
                "dw_milli"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "e105_g_test",
    oracle="""
    WITH base AS (
        SELECT o.o_orderpriority AS pr, c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cells AS (
        SELECT pr, seg, CAST(COUNT(*) AS BIGINT) AS o
        FROM base GROUP BY 1, 2
    ), rt AS (
        SELECT pr, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1
    ), ct AS (
        SELECT seg, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1
    ), n AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells
    ), terms AS (
        SELECT pr, seg, o, r, c, n,
               CAST(FLOOR(CAST(o AS DOUBLE)
                    * ln(CAST(o AS DOUBLE) * n
                         / (CAST(r AS DOUBLE) * c)) * 1000000)
                    AS BIGINT) AS term_micro
        FROM cells JOIN rt USING (pr) JOIN ct USING (seg) CROSS JOIN n
    ), g AS (
        SELECT CAST(2 * SUM(term_micro) AS BIGINT) AS g2_micro FROM terms
    )
    SELECT pr, seg, o, r AS row_total, c AS col_total, term_micro, g2_micro
    FROM terms CROSS JOIN g
    ORDER BY pr, seg
    """,
    survey="E105,E37,E95",
)
def e105_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio chi-square) of independence on the order
    priority × customer market-segment contingency grid — the
    information-theoretic twin of e37's Pearson chi-square (G = 2ΣO·
    ln(O·N/(R·C)) is 2N·(mutual information in nats), additive across
    partitions of the table, which Pearson's X² is not — the property
    that matters when 100 TB forces per-shard accumulation).

    Exactness: observed counts and margins are exact BIGINTs; each
    cell's term O·ln(O·N/(R·C)) is FLOOR-quantized to micro FIRST
    (the e95 quantize-before-sum discipline — engine ln parity is
    certified by the j101 precedent and pinned here per cell), then the
    statistic is an exact INTEGER sum of quantized terms — no float
    aggregation ever happens; quantization bias is bounded by one micro
    per cell (25 cells, stated).  Empty cells simply don't exist in the
    cells relation (O·ln(O·…) → 0 as O → 0, the standard convention).

    Scale shape: one orders⋈customer scan → 25-cell hash agg (both
    domains closed) → margin joins and the integer fold on the KB grid."""
    t = Tables(spark, sf_dir)
    base = t.orders.join(
        t.customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(F.col("o_orderpriority").alias("pr"), F.col("c_mktsegment").alias("seg"))
    # r11 (guide §2.4): the 25-cell grid feeds both margins, the total
    # and the term join — cut once so the fact join runs once.
    cells = (
        base.groupBy("pr", "seg")
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    rt = cells.groupBy("pr").agg(F.sum("o").cast("long").alias("r"))
    ct = cells.groupBy("seg").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    terms = (
        cells.join(F.broadcast(rt), "pr")
        .join(F.broadcast(ct), "seg")
        .crossJoin(F.broadcast(n))
        .select(
            "pr", "seg", "o", "r", "c", "n",
            F.expr(
                "CAST(FLOOR(CAST(o AS DOUBLE)"
                " * ln(CAST(o AS DOUBLE) * n"
                "      / (CAST(r AS DOUBLE) * c)) * 1000000) AS BIGINT)"
            ).alias("term_micro"),
        )
    )
    g = terms.agg((2 * F.sum("term_micro")).cast("long").alias("g2_micro"))
    return (
        terms.crossJoin(F.broadcast(g))
        .select(
            "pr", "seg", "o",
            F.col("r").alias("row_total"),
            F.col("c").alias("col_total"),
            "term_micro", "g2_micro",
        )
        .orderBy("pr", "seg")
    )


@register(
    "e106_odds_ratio_woolf",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS e,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cells AS (
        SELECT CAST(SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM base
    ), q AS (
        SELECT a, b, c, d,
               CAST(1000 * (a * d) // (b * c) AS BIGINT) AS or_milli,
               CAST(FLOOR(ln(CAST(a AS DOUBLE) * d
                             / (CAST(b AS DOUBLE) * c)) * 1000000)
                    AS BIGINT) AS lnor_micro,
               CAST(FLOOR(sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
                          * 1000000) AS BIGINT) AS se_micro
        FROM cells
    )
    SELECT a, b, c, d, or_milli, lnor_micro, se_micro,
           CAST(lnor_micro - 1960 * se_micro // 1000 AS BIGINT)
               AS ci_lo_ln_micro,
           CAST(lnor_micro + 1960 * se_micro // 1000 AS BIGINT)
               AS ci_hi_ln_micro
    FROM q
    """,
    survey="E106,E95,E89",
)
def e106_odds_ratio_woolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 odds ratio with the Woolf log-interval: exposure = BUILDING
    market segment, outcome = urgent order — the SINGLE-stratum effect
    estimate e95's Mantel-Haenszel pools across strata (run THIS first;
    if strata disagree with the pooled answer, Simpson's paradox is in
    play) with the textbook CI: ln OR ± 1.96·√(1/a+1/b+1/c+1/d).

    Exactness: the 2×2 cells are ONE exact conditional aggregation;
    or_milli = 1000·ad DIV bc is pure integer; ln OR and the Woolf SE
    are each FLOOR-quantized to micro straight off their double
    expressions (ln parity per the j101 precedent; sqrt is IEEE
    correctly-rounded, bit-identical on both engines), and the CI bounds
    are then PURE INTEGER arithmetic on the quantized pair — reported on
    the log scale so no exp() round-trip can drift.

    Scale shape: one orders⋈customer scan → one 4-stat global agg →
    1-row arithmetic; nothing after the scan exceeds one row."""
    t = Tables(spark, sf_dir)
    base = t.orders.join(
        t.customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("e"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
    )
    cells = base.agg(
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    q = cells.select(
        "a", "b", "c", "d",
        F.expr("CAST(1000 * (a * d) DIV (b * c) AS BIGINT)").alias("or_milli"),
        F.expr(
            "CAST(FLOOR(ln(CAST(a AS DOUBLE) * d"
            " / (CAST(b AS DOUBLE) * c)) * 1000000) AS BIGINT)"
        ).alias("lnor_micro"),
        F.expr(
            "CAST(FLOOR(sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)"
            " * 1000000) AS BIGINT)"
        ).alias("se_micro"),
    )
    return q.select(
        "a", "b", "c", "d", "or_milli", "lnor_micro", "se_micro",
        F.expr("CAST(lnor_micro - 1960 * se_micro DIV 1000 AS BIGINT)").alias(
            "ci_lo_ln_micro"
        ),
        F.expr("CAST(lnor_micro + 1960 * se_micro DIV 1000 AS BIGINT)").alias(
            "ci_hi_ln_micro"
        ),
    )


# --------------------------------------------------------------------------
# Batch 3: corpus-statistics tier — vocabulary growth (Heaps), readability
# (Flesch-Kincaid), sequential drift (Page-Hinkley), and term burstiness.
# --------------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


@register(
    "j117_heaps_law",
    oracle=f"""
    WITH tok AS (
        SELECT source, doc_id, unnest({_WORDS}) AS w FROM documents
    ), per_doc AS (
        SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS tc
        FROM tok GROUP BY 1, 2
    ), first_doc AS (
        SELECT source, w, MIN(doc_id) AS fd FROM tok GROUP BY 1, 2
    ), new_types AS (
        SELECT source, fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS nv
        FROM first_doc GROUP BY 1, 2
    ), cum AS (
        SELECT p.source, p.doc_id,
               SUM(p.tc) OVER (PARTITION BY p.source ORDER BY p.doc_id
                               ROWS UNBOUNDED PRECEDING) AS n_cum,
               SUM(COALESCE(nt.nv, 0)) OVER (PARTITION BY p.source
                   ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING) AS v_cum,
               ROW_NUMBER() OVER (PARTITION BY p.source
                                  ORDER BY p.doc_id) AS rnk
        FROM per_doc p LEFT JOIN new_types nt
            ON nt.source = p.source AND nt.doc_id = p.doc_id
    ), dstats AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS nd FROM per_doc GROUP BY 1
    ), cps AS (
        SELECT DISTINCT d.source,
               GREATEST(1, (j.j * d.nd) // 8) AS rnk
        FROM dstats d CROSS JOIN (SELECT unnest(range(1, 9)) AS j) j
    ), pts AS (
        SELECT c.source,
               CAST(FLOOR(ln(CAST(c.n_cum AS DOUBLE)) * 1000000)
                    AS BIGINT) AS x,
               CAST(FLOOR(ln(CAST(c.v_cum AS DOUBLE)) * 1000000)
                    AS BIGINT) AS y
        FROM cum c JOIN cps ON cps.source = c.source AND cps.rnk = c.rnk
    ), s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY 1
    )
    SELECT source, m, sx, sy, sxy, sxx,
           CAST(1000 * (m * sxy - sx * sy) // (m * sxx - sx * sx)
                AS BIGINT) AS beta_milli,
           CAST(FLOOR((CAST(sy AS DOUBLE) / m
                       - (CAST(m * sxy - sx * sy AS DOUBLE)
                          / (m * sxx - sx * sx)) * sx / m) / 1000)
                AS BIGINT) AS lnk_milli
    FROM s ORDER BY source
    """,
    survey="J117,J61,J8",
)
def j117_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(n) = K·n^β per source — the
    GROWTH sibling of j61's Zipf rank-frequency fit (Zipf reads the
    static distribution; Heaps answers the capacity-planning question
    'how fast does the vocabulary grow as this source scales', the
    β < 1 sublinearity every tokenizer-budget projection relies on —
    Heaps 1978, and the two laws are asymptotically linked).

    Exactness: token counts, per-(source,token) FIRST-document ids, and
    the cumulative (tokens-so-far, types-so-far) pairs are exact
    BIGINTs on per-source windows; 8 checkpoint rows per source picked
    by the integer closed form GREATEST(1, j·D DIV 8); ln(n), ln(V)
    FLOOR-micro-quantized (j101 ln-parity precedent) BEFORE the OLS
    sufficient statistics, which are then exact integer sums; the slope
    is a pure integer milli division and only the intercept finishes in
    one shared scalar double chain.  Integer budget: the centered slope
    terms stay ≤ ~6·10¹⁷ for any corpus whose ln-token-count spread
    fits 10³ nats — stated for the 100 TB read.

    Scale shape: tokenize (the volume term) → (source,doc) and
    (source,token) hash aggs → per-source windows on the DOC relation
    (calendar-of-docs bounded, partitioned by source) → 8-point
    checkpoint join → KB folds."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens
    from pyspark.sql import Window

    d = Tables(spark, sf_dir).documents
    tok = d.select("source", "doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    per_doc = tok.groupBy("source", "doc_id").agg(
        F.count("*").cast("long").alias("tc")
    )
    first_doc = tok.groupBy("source", "w").agg(F.min("doc_id").alias("fd"))
    new_types = first_doc.groupBy(
        "source", F.col("fd").alias("doc_id")
    ).agg(F.count("*").cast("long").alias("nv"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rnk = Window.partitionBy("source").orderBy("doc_id")
    cum = (
        per_doc.join(new_types, ["source", "doc_id"], "left")
        .select(
            "source",
            "doc_id",
            F.sum("tc").over(w_cum).alias("n_cum"),
            F.sum(F.coalesce(F.col("nv"), F.lit(0))).over(w_cum).alias("v_cum"),
            F.row_number().over(w_rnk).alias("rnk"),
        )
    )
    dstats = per_doc.groupBy("source").agg(F.count("*").cast("long").alias("nd"))
    js = spark.range(1, 9).select(F.col("id").alias("j"))
    cps = (
        dstats.crossJoin(F.broadcast(js))
        .select(
            "source",
            F.greatest(F.lit(1), F.expr("(j * nd) DIV 8")).alias("rnk"),
        )
        .distinct()
    )
    pts = cum.join(cps, ["source", "rnk"]).select(
        "source",
        F.expr("CAST(FLOOR(ln(CAST(n_cum AS DOUBLE)) * 1000000) AS BIGINT)").alias(
            "x"
        ),
        F.expr("CAST(FLOOR(ln(CAST(v_cum AS DOUBLE)) * 1000000) AS BIGINT)").alias(
            "y"
        ),
    )
    s = pts.groupBy("source").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        "source", "m", "sx", "sy", "sxy", "sxx",
        F.expr(
            "CAST(1000 * (m * sxy - sx * sy) DIV (m * sxx - sx * sx) AS BIGINT)"
        ).alias("beta_milli"),
        F.expr(
            "CAST(FLOOR((CAST(sy AS DOUBLE) / m"
            " - (CAST(m * sxy - sx * sy AS DOUBLE)"
            "    / (m * sxx - sx * sx)) * sx / m) / 1000) AS BIGINT)"
        ).alias("lnk_milli"),
    ).orderBy("source")


@register(
    "j118_flesch_kincaid",
    oracle=f"""
    WITH per_doc AS (
        SELECT source,
               CAST(len({_WORDS}) AS BIGINT) AS words,
               CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS sentences,
               CAST(len(regexp_extract_all({_NORM}, '[aeiouy]+'))
                    AS BIGINT) AS syllables
        FROM documents
    ), s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(words) AS BIGINT) AS w,
               CAST(SUM(sentences) AS BIGINT) AS st,
               CAST(SUM(syllables) AS BIGINT) AS y
        FROM per_doc GROUP BY 1
    )
    SELECT source, n_docs, w AS n_words, st AS n_sentences, y AS n_syllables,
           CAST(FLOOR((CAST(39 AS DOUBLE) * w / (100 * st)
                       + CAST(118 AS DOUBLE) * y / (10 * w)
                       - CAST(1559 AS DOUBLE) / 100) * 1000)
                AS BIGINT) AS fk_grade_milli,
           CAST(FLOOR((CAST(206835 AS DOUBLE) / 1000
                       - CAST(1015 AS DOUBLE) * w / (1000 * st)
                       - CAST(846 AS DOUBLE) * y / (10 * w)) * 1000)
                AS BIGINT) AS fre_milli
    FROM s ORDER BY source
    """,
    survey="J118,J8,J22",
)
def j118_flesch_kincaid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level and Flesch reading-ease per source —
    the READABILITY leg of the quality tier (j22 scores surface
    heuristics, j9 identifies language; FK is the standardized
    complexity score real curation recipes filter on): grade =
    0.39·(W/S) + 11.8·(Y/W) − 15.59 over total words W, sentences S,
    vowel-group syllables Y.

    Exactness: all three counts are exact BIGINT sums of per-document
    regexp counts — words from the canonical whitespace tokenization,
    sentences as '[.!?]+' runs clamped to ≥1 per doc (stated rule),
    syllables as '[aeiouy]+' vowel groups on the normalized text
    (groups never span the space-separated words, so the doc-level
    count equals the per-word sum); both formulas are one shared scalar
    double chain built ONLY from integer literals and CASTs (the
    decimal-literal landmine rule), milli-floored.

    Scale shape: one pure-map scan (codegen regexp counting, no UDF) →
    per-source 4-stat hash agg → per-row arithmetic on the KB source
    relation."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import normalize_text
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    per_doc = d.select(
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
            F.lit(1),
        )
        .cast("long")
        .alias("sentences"),
        F.size(
            F.regexp_extract_all(normalize_text(F.col("text")), F.lit("[aeiouy]+"), 0)
        )
        .cast("long")
        .alias("syllables"),
    )
    s = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("w"),
        F.sum("sentences").cast("long").alias("st"),
        F.sum("syllables").cast("long").alias("y"),
    )
    return s.select(
        "source", "n_docs",
        F.col("w").alias("n_words"),
        F.col("st").alias("n_sentences"),
        F.col("y").alias("n_syllables"),
        F.expr(
            "CAST(FLOOR((CAST(39 AS DOUBLE) * w / (100 * st)"
            " + CAST(118 AS DOUBLE) * y / (10 * w)"
            " - CAST(1559 AS DOUBLE) / 100) * 1000) AS BIGINT)"
        ).alias("fk_grade_milli"),
        F.expr(
            "CAST(FLOOR((CAST(206835 AS DOUBLE) / 1000"
            " - CAST(1015 AS DOUBLE) * w / (1000 * st)"
            " - CAST(846 AS DOUBLE) * y / (10 * w)) * 1000) AS BIGINT)"
        ).alias("fre_milli"),
    ).orderBy("source")


@register(
    "f47_page_hinkley",
    oracle="""
    WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, day, x,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
               SUM(x) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS s
        FROM daily
    ), dev AS (
        SELECT event_type, day,
               1000 * x - (1000 * s) // i AS dev_milli
        FROM seq
    ), ph AS (
        SELECT event_type, day,
               SUM(dev_milli) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS UNBOUNDED PRECEDING) AS ph_t
        FROM dev
    ), band AS (
        SELECT event_type, day, ph_t,
               ph_t - MIN(ph_t) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS UNBOUNDED PRECEDING) AS ph_dev
        FROM ph
    ), stats AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(x) AS BIGINT) AS total
        FROM daily GROUP BY 1
    )
    SELECT s.event_type, s.n_days, s.total,
           CAST(MAX(b.ph_dev) AS BIGINT) AS max_dev_milli,
           CAST((1000 * s.total) // s.n_days AS BIGINT) AS lambda_milli,
           MIN(CASE WHEN b.ph_dev > (1000 * s.total) // s.n_days
                    THEN b.day END) AS alarm_day
    FROM band b JOIN stats s USING (event_type)
    GROUP BY 1, 2, 3
    ORDER BY s.event_type
    """,
    survey="F47,F15,F42",
)
def f47_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector per event type on the daily count
    series — the SEQUENTIAL mean-shift monitor completing the change
    tier (f15's CUSUM tracks deviation from a FIXED reference, f42's
    EWMA discounts geometrically; PH accumulates deviation from the
    RUNNING mean and alarms on its excursion from the running minimum —
    the classic Page 1954 formulation streaming-drift libraries ship).

    Exactness: pure integer END-TO-END — the running mean enters ONLY
    through the truncating division (1000·S_i) DIV i (defined statistic,
    the f42 discipline), so dev, PH_t, the running minimum and the
    excursion are exact BIGINTs; the alarm band λ = one mean day of
    deviation ((1000·total) DIV n — a DEFINED, scale-free contract) and
    alarm_day is the first crossing (NULL when the series never
    drifts).

    Scale shape: one scan → (type, day) agg (the volume term); all four
    windows are per-type over the calendar-bounded day relation; one
    KB stats join and a per-type fold."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    # r11 (guide §2.4): daily feeds the cumulative windows AND the
    # per-type stats fold — cut once, one events scan.
    daily = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(F.count("*").cast("long").alias("x")).localCheckpoint(eager=False)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rnk = Window.partitionBy("event_type").orderBy("day")
    seq = daily.select(
        "event_type", "day", "x",
        F.row_number().over(w_rnk).alias("i"),
        F.sum("x").over(w).alias("s"),
    )
    dev = seq.select(
        "event_type", "day",
        F.expr("1000 * x - (1000 * s) DIV i").alias("dev_milli"),
    )
    ph = dev.select(
        "event_type", "day", F.sum("dev_milli").over(w).alias("ph_t")
    )
    band = ph.select(
        "event_type", "day", "ph_t",
        (F.col("ph_t") - F.min("ph_t").over(w)).alias("ph_dev"),
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total"),
    )
    lam = F.expr("(1000 * total) DIV n_days")
    return (
        band.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n_days", "total")
        .agg(
            F.max("ph_dev").cast("long").alias("max_dev_milli"),
            F.max(lam).cast("long").alias("lambda_milli"),
            F.min(F.when(F.col("ph_dev") > lam, F.col("day"))).alias("alarm_day"),
        )
        .orderBy("event_type")
    )


@register(
    "j119_term_burstiness",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_WORDS}) AS w FROM documents
    ), dw AS (
        SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2
    ), per_w AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
               CAST(SUM(c) AS BIGINT) AS cf
        FROM dw GROUP BY 1
    )
    SELECT w, df, df2, cf,
           CAST(1000 * df2 // df AS BIGINT) AS burst_milli,
           CAST(1000 * cf // df AS BIGINT) AS rate_milli
    FROM per_w
    ORDER BY df DESC, w LIMIT 20
    """,
    survey="J119,J6,J113",
)
def j119_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale ADAPTATION probability for the top-20
    document-frequency terms: P(term repeats | term appears) = df₂/df —
    the second of Church & Gale 1995's two burstiness readings and NOT
    j96's: j96 reports the variance-to-mean ratio over ALL docs
    (zeros included, a moment statistic); adaptation conditions on
    presence and needs only the df₂/df pair, which is what cache-model
    and repetition-prior work actually plugs in.  The two disagree
    exactly on terms whose mass concentrates in few docs — the case the
    fixture exercises.

    Exactness: pure integer END-TO-END — per-(term, doc) counts, df,
    df₂, cf are exact BIGINTs from two hash aggs; burstiness and the
    occurrences-per-containing-doc rate are integer milli divisions;
    the top-20 cut uses the deterministic (df DESC, w) tiebreak.

    Scale shape: tokenize (volume term) → (term, doc) hash agg → term
    hash agg on the vocab-bounded relation → TakeOrderedAndProject 20,
    never a global sort."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    dw = tok.groupBy("w", "doc_id").agg(F.count("*").cast("long").alias("c"))
    per_w = dw.groupBy("w").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).cast("long").alias("df2"),
        F.sum("c").cast("long").alias("cf"),
    )
    return (
        per_w.select(
            "w", "df", "df2", "cf",
            F.expr("CAST(1000 * df2 DIV df AS BIGINT)").alias("burst_milli"),
            F.expr("CAST(1000 * cf DIV df AS BIGINT)").alias("rate_milli"),
        )
        .orderBy(F.col("df").desc(), "w")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Batch 4: Cassandra systems semantics — the secondary-index read path,
# lightweight-transaction (CAS) replay, and the wide-partition histogram.
# --------------------------------------------------------------------------


@register(
    "b16_secondary_index_scan",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS pk, o_orderkey % 32 AS bucket,
               o_orderpriority AS val,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), idx AS (
        SELECT val, bucket, pk FROM base
    ), fetched AS (
        SELECT i.val, i.bucket, b.cents
        FROM idx i JOIN base b ON b.pk = i.pk AND b.bucket = i.bucket
        WHERE b.val = i.val
    )
    SELECT val AS priority,
           CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM fetched GROUP BY 1 ORDER BY 1
    """,
    survey="B16,B1,D1",
)
def b16_secondary_index_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cassandra secondary-index (2i) read path: the index table stores
    (indexed_value → partition key) pairs CO-LOCATED with the base rows
    (Cassandra 2i is a LOCAL index — each node indexes only its own
    token range, modeled by the bucket column riding both relations),
    the read fans out value → keys → base-row fetch, and the fetch
    RE-VERIFIES the predicate (Cassandra re-checks on read because the
    index may trail the base under concurrent writes).  Certified
    end-to-end against the direct-scan oracle: the index path and the
    scan path must reconcile to identical per-value counts, bucket
    fan-out and content checksums.

    Exactness: pure integer — cents checksums, exact counts, exact
    distinct-bucket fan-out per indexed value.

    Scale shape: index build is one projection; the read path is one
    hash join on the composite (pk, bucket) locality key — exactly the
    node-local lookup the real 2i performs, never a cross-bucket
    shuffle of base rows; final agg on the 5-value domain."""
    o = Tables(spark, sf_dir).orders
    base = o.select(
        F.col("o_orderkey").alias("pk"),
        (F.col("o_orderkey") % 32).alias("bucket"),
        F.col("o_orderpriority").alias("val"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    idx = base.select("val", "bucket", "pk")
    fetched = (
        idx.alias("i")
        .join(
            base.alias("b"),
            (F.col("b.pk") == F.col("i.pk"))
            & (F.col("b.bucket") == F.col("i.bucket")),
        )
        .where(F.col("b.val") == F.col("i.val"))
        .select(F.col("i.val").alias("val"), F.col("i.bucket").alias("bucket"),
                F.col("b.cents").alias("cents"))
    )
    return (
        fetched.groupBy(F.col("val").alias("priority"))
        .agg(
            F.countDistinct("bucket").cast("long").alias("n_buckets"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("priority")
    )


@register(
    "b17_lwt_cas_replay",
    oracle="""
    WITH dedup AS (
        SELECT l_orderkey AS pk, l_linenumber AS ln,
               MIN(CAST(l_quantity AS BIGINT)) AS q,
               MIN(l_partkey) AS pkey,
               MIN(CAST(ROUND(l_discount * 100) AS BIGINT)) AS dc
        FROM lineitem GROUP BY 1, 2
    ), props AS (
        SELECT pk, ln, q AS newv,
               CASE WHEN ln = 1 THEN pkey % 2
                    WHEN dc >= 5 THEN 0
                    ELSE LAG(q) OVER (PARTITION BY pk ORDER BY ln)
               END AS expected
        FROM dedup
    ), keys AS (
        SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_props FROM props GROUP BY 1
    ), replay AS (
        WITH RECURSIVE st AS (
            SELECT pk, 0 AS j, CAST(0 AS BIGINT) AS state,
                   CAST(0 AS BIGINT) AS applied
            FROM keys
            UNION ALL
            SELECT st.pk, st.j + 1,
                   CASE WHEN p.expected = st.state THEN p.newv
                        ELSE st.state END,
                   st.applied + CASE WHEN p.expected = st.state
                                     THEN 1 ELSE 0 END
            FROM st LEFT JOIN props p ON p.pk = st.pk AND p.ln = st.j + 1
            WHERE st.j < 7
        )
        SELECT pk, state, applied FROM st WHERE j = 7
    )
    SELECT k.n_props, r.applied,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(r.state) AS BIGINT) AS sum_state
    FROM replay r JOIN keys k USING (pk)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    survey="B17,B2,B6",
)
def b17_lwt_cas_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cassandra lightweight-transaction (Paxos CAS) replay: each
    partition's proposals apply in ballot order IFF the expected value
    matches the current state (`UPDATE ... IF value = ?`), rejected
    proposals leave the state frozen — the conditional-write semantics
    LWW (b2) and counters (b6) cannot express, because the outcome of
    ballot j depends on the ACCEPT/REJECT history of 1..j−1, not just
    timestamps.  Fixture: per order, line j proposes quantity_j
    expecting quantity_{j−1} (the chain a correct client reads), except
    line 1 expects partkey%2 (odd partkeys = doomed first ballot) and
    ≥5%-discount lines expect 0 (stale reads) — exercising accept
    chains, freezes, and stale-read re-acceptance after a freeze.

    Exactness: pure integer end-to-end — the 7-step bounded fold is
    BIGINT state + applied counters, mirrored by the oracle's
    WITH RECURSIVE replay; output folds per-key finals onto the
    (n_props, applied) grid with a content checksum.

    Scale shape: proposals from one scan (per-key LAG window on the
    natural lineitem order); 7 lockstep rounds of state⋈proposals hash
    joins on the SAME pk key (co-partitioned after round 1, lineage
    truncated per round); final KB grid agg."""
    from pyspark.sql import Window

    li = Tables(spark, sf_dir).lineitem
    # The synthetic testdata has duplicate (orderkey, linenumber) pairs at
    # sf0.01+ (the b14 lesson): reduce to ONE proposal per ballot slot with
    # deterministic MIN aggregation BEFORE the LAG chain and the step joins,
    # or both the window order and the per-step join fan-out are undefined.
    dedup = li.groupBy(
        F.col("l_orderkey").alias("pk"), F.col("l_linenumber").alias("ln")
    ).agg(
        F.min(F.col("l_quantity").cast("long")).alias("q"),
        F.min("l_partkey").alias("pkey"),
        F.min(F.round(F.col("l_discount") * 100).cast("long")).alias("dc"),
    )
    props = dedup.select(
        "pk",
        "ln",
        F.col("q").alias("newv"),
        F.when(F.col("ln") == 1, F.col("pkey") % 2)
        .when(F.col("dc") >= 5, F.lit(0))
        .otherwise(F.lag("q").over(Window.partitionBy("pk").orderBy("ln")))
        .cast("long")
        .alias("expected"),
    )
    # r11 optimization (guide §2.4/§4.1): the 7 ballot slots used to run as
    # 7 lockstep state⋈proposals joins, each eagerly checkpointed — 8
    # sequential jobs, 7 shuffles of the per-key state.  The CAS replay is
    # a bounded per-key FOLD, so collect each key's ≤7 proposals into a
    # sorted array (the groupBy reuses the LAG window's pk partitioning —
    # no extra exchange) and run the identical recurrence as a codegen
    # ``aggregate`` lambda over slots 1..7: state' = newv iff expected =
    # state, applied' counts accepts.  Same integers, one job, and the
    # whole replay is a single exchange instead of seven.
    folded = (
        props.groupBy("pk")
        .agg(
            F.count("*").cast("long").alias("n_props"),
            F.sort_array(
                F.collect_list(F.struct("ln", "newv", "expected"))
            ).alias("ps"),
        )
        .withColumn(
            "fin",
            F.expr(
                """
                AGGREGATE(
                    sequence(1, 7),
                    named_struct('state', CAST(0 AS BIGINT),
                                 'applied', CAST(0 AS BIGINT)),
                    (acc, j) -> CASE
                        WHEN size(filter(ps, e -> e.ln = j)) > 0
                             AND element_at(filter(ps, e -> e.ln = j), 1).expected
                                 = acc.state
                        THEN named_struct(
                            'state', element_at(filter(ps, e -> e.ln = j), 1).newv,
                            'applied', acc.applied + CAST(1 AS BIGINT))
                        ELSE acc END
                )
                """
            ),
        )
    )
    return (
        folded.groupBy("n_props", F.col("fin.applied").alias("applied"))
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("fin.state").cast("long").alias("sum_state"),
        )
        .orderBy("n_props", "applied")
    )


@register(
    "a38_partition_size_histogram",
    oracle="""
    WITH rows_b AS (
        SELECT l_orderkey AS pk,
               48 + 2 * CAST(l_quantity AS BIGINT)
                  + CAST(ROUND(l_discount * 100) AS BIGINT) AS row_bytes
        FROM lineitem
    ), parts AS (
        SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(row_bytes) AS BIGINT) AS bytes
        FROM rows_b GROUP BY 1
    ), pw AS (
        SELECT unnest(range(0, 41)) AS p
    ), bucketed AS (
        SELECT p, n_rows, bytes
        FROM parts JOIN pw
          ON bytes >= (CAST(1 AS BIGINT) << p)
         AND bytes < (CAST(1 AS BIGINT) << (p + 1))
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM parts
    )
    SELECT CAST(p AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(MIN(bytes) AS BIGINT) AS min_bytes,
           CAST(MAX(bytes) AS BIGINT) AS max_bytes,
           CAST(SUM(bytes) AS BIGINT) AS sum_bytes,
           CAST(SUM(n_rows) AS BIGINT) AS sum_rows,
           CAST(1000000 * COUNT(*) // n_total AS BIGINT) AS share_ppm
    FROM bucketed CROSS JOIN tot
    GROUP BY 1, n_total ORDER BY 1
    """,
    survey="A38,B5,E18",
)
def a38_partition_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-size histogram on log2 buckets — the `nodetool
    tablehistograms` wide-partition audit every Cassandra operator runs
    before a migration (partitions past ~100 MB stall compaction and
    repair; the histogram's right tail IS the risk report), computed
    from the snapshot with a DEFINED per-row serialization estimator
    (48 B overhead + 2 B/quantity unit + discount cents) so the result
    is reproducible rather than codec-dependent.

    Exactness: pure integer end-to-end — per-partition byte totals are
    exact BIGINT sums; the log2 bucket comes from an explicit
    power-of-two RANGE JOIN against a 41-row shift-left relation
    (2^p ≤ bytes < 2^(p+1)) — never FLOOR(ln x / ln 2), whose boundary
    ulps at exact powers of two would differ between engines; shares
    are integer ppm.

    Scale shape: one scan → per-partition hash agg (the natural
    lineitem key, map-side combinable) → broadcast 41-row range join →
    ≤41-bucket agg."""
    li = Tables(spark, sf_dir).lineitem
    rows_b = li.select(
        F.col("l_orderkey").alias("pk"),
        (
            F.lit(48)
            + 2 * F.col("l_quantity").cast("long")
            + F.round(F.col("l_discount") * 100).cast("long")
        ).alias("row_bytes"),
    )
    parts = rows_b.groupBy("pk").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("row_bytes").cast("long").alias("bytes"),
    )
    pw = spark.range(0, 41).select(F.col("id").cast("int").alias("p"))
    bucketed = parts.join(
        F.broadcast(pw),
        (F.col("bytes") >= F.expr("shiftleft(CAST(1 AS BIGINT), p)"))
        & (F.col("bytes") < F.expr("shiftleft(CAST(1 AS BIGINT), p + 1)")),
    )
    tot = parts.agg(F.count("*").cast("long").alias("n_total"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy(F.col("p").cast("long").alias("log2_bucket"), F.col("n_total"))
        .agg(
            F.count("*").cast("long").alias("n_partitions"),
            F.min("bytes").cast("long").alias("min_bytes"),
            F.max("bytes").cast("long").alias("max_bytes"),
            F.sum("bytes").cast("long").alias("sum_bytes"),
            F.sum("n_rows").cast("long").alias("sum_rows"),
            F.expr("CAST(1000000 * COUNT(*) DIV n_total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .drop("n_total")
        .orderBy("log2_bucket")
    )


# --------------------------------------------------------------------------
# Batch 5: data-forensics and lexical-diversity tier — Benford first-digit
# audit, standardized type-token ratio, and Theil's U2 forecast skill.
# --------------------------------------------------------------------------

# SECOND-digit Benford masses FLOOR(Σ_{d1=1..9} log10(1 + 1/(10·d1+d)) · 1e6)
# for d = 0..9, precomputed in Python so both engines compare against the
# SAME integer constants (the e72 discipline — no engine log10 in the
# expected-mass path).
_BENFORD_MICRO = {
    0: 119679, 1: 113890, 2: 108821, 3: 104329, 4: 100308,
    5: 96677, 6: 93374, 7: 90351, 8: 87570, 9: 84997,
}
_BENFORD_SQL_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_MICRO.items()
) + " END"


@register(
    "e107_benford_law",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ), digits AS (
        SELECT CAST(SUBSTRING(CAST(c AS VARCHAR), 2, 1) AS BIGINT) AS d
        FROM cents WHERE c >= 10
    ), obs AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS o FROM digits GROUP BY 1
    ), n AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs
    ), terms AS (
        SELECT d, o, n, CAST({_BENFORD_SQL_CASE} AS BIGINT) AS p_micro,
               CAST(FLOOR(
                   CAST(1000000 * o - n * ({_BENFORD_SQL_CASE}) AS DOUBLE)
                   * CAST(1000000 * o - n * ({_BENFORD_SQL_CASE}) AS DOUBLE)
                   / (CAST(1000000 AS DOUBLE) * n * ({_BENFORD_SQL_CASE}))
                   * 1000) AS BIGINT) AS term_milli
        FROM obs CROSS JOIN n
    ), chi AS (
        SELECT CAST(SUM(term_milli) AS BIGINT) AS chi2_milli FROM terms
    )
    SELECT d AS digit, o AS observed, p_micro,
           CAST(n * p_micro AS BIGINT) AS expected_micro,
           term_milli, chi2_milli
    FROM terms CROSS JOIN chi
    ORDER BY d
    """,
    survey="E107,E37,E105",
)
def e107_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit chi-square on order totals (in cents) — the
    forensic ESCALATION of e33's first-digit table (the standard audit
    sequence: first digits pass a casual fake, SECOND digits catch
    rounding/threshold manipulation because their Benford masses are
    nearly flat, 12.0%→8.5%, and any per-digit preference shows; e33
    reports per-digit deviations, THIS reports the pooled test
    statistic an alerting gate thresholds).

    Exactness: second digits come from STRING truncation of the exact
    BIGINT cents (numbers ≥ 10 only — stated rule; never float log
    paths); the masses Σ_d1 log10(1+1/(10·d1+d)) are PYTHON-precomputed
    integer micro constants
    embedded identically in both engines (the e72 discipline — no
    engine log10 anywhere); each digit's chi-square term
    (10⁶·O − N·p)²/(10⁶·N·p) is FLOOR-milli-quantized per digit
    (quantize-before-sum) and the statistic is an exact INTEGER sum
    over the closed 10-digit domain.

    Scale shape: one scan → 10-row hash agg → constant-size arithmetic;
    nothing after the scan exceeds ten rows."""
    o = Tables(spark, sf_dir).orders
    cents = o.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
    digits = cents.where(F.col("c") >= 10).select(
        F.substring(F.col("c").cast("string"), 2, 1).cast("long").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").cast("long").alias("o"))
    n = obs.agg(F.sum("o").cast("long").alias("n"))
    p_case = _BENFORD_SQL_CASE
    terms = obs.crossJoin(F.broadcast(n)).select(
        "d", "o", "n",
        F.expr(f"CAST({p_case} AS BIGINT)").alias("p_micro"),
        F.expr(
            f"CAST(FLOOR("
            f" CAST(1000000 * o - n * ({p_case}) AS DOUBLE)"
            f" * CAST(1000000 * o - n * ({p_case}) AS DOUBLE)"
            f" / (CAST(1000000 AS DOUBLE) * n * ({p_case}))"
            f" * 1000) AS BIGINT)"
        ).alias("term_milli"),
    )
    chi = terms.agg(F.sum("term_milli").cast("long").alias("chi2_milli"))
    return (
        terms.crossJoin(F.broadcast(chi))
        .select(
            F.col("d").alias("digit"),
            F.col("o").alias("observed"),
            "p_micro",
            F.expr("CAST(n * p_micro AS BIGINT)").alias("expected_micro"),
            "term_milli",
            "chi2_milli",
        )
        .orderBy("digit")
    )


@register(
    "j120_sttr_lexical_diversity",
    oracle=f"""
    WITH tok AS (
        SELECT source, doc_id, w,
               CAST(ord - 1 AS BIGINT) // 50 AS chunk
        FROM (
            SELECT source, doc_id, unnest({_WORDS}) AS w,
                   generate_subscripts({_WORDS}, 1) AS ord
            FROM documents
        )
    ), chunks AS (
        SELECT source, doc_id, chunk,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
        FROM tok GROUP BY 1, 2, 3
    ), full_chunks AS (
        SELECT source, CAST(1000 * n_types // 50 AS BIGINT) AS ttr_milli
        FROM chunks WHERE n_tok = 50
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(ttr_milli) AS BIGINT) AS sum_ttr_milli,
           CAST(SUM(ttr_milli) // COUNT(*) AS BIGINT) AS sttr_mean_milli
    FROM full_chunks GROUP BY 1 ORDER BY 1
    """,
    survey="J120,J8,J44",
)
def j120_sttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized type-token ratio (STTR) per source — the
    length-INVARIANT lexical-diversity measure raw TTR is not (TTR
    falls with document length by Heaps' law, j117; STTR fixes it by
    averaging TTR over fixed 50-token chunks, the Kubát-Milička
    standardization corpus linguistics reports): low STTR = repetitive
    boilerplate, the signal dedup misses when the repetition is
    WITHIN documents.

    Exactness: pure integer end-to-end — per-chunk type counts are
    exact (chunk = position DIV 50 on the canonical tokenization), only
    FULL 50-token chunks participate (stated rule; short docs
    contribute nothing), per-chunk TTR is an integer milli division and
    the per-source mean divides two exact BIGINTs.

    Scale shape: tokenize with positions (volume term) → (doc, chunk)
    hash agg with a distinct-count → per-source fold; no windows, no
    joins."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    tok = d.select(
        "source", "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "w")
    ).select(
        "source", "doc_id", "w", F.expr("CAST(pos AS BIGINT) DIV 50").alias("chunk")
    )
    chunks = tok.groupBy("source", "doc_id", "chunk").agg(
        F.count("*").cast("long").alias("n_tok"),
        F.countDistinct("w").cast("long").alias("n_types"),
    )
    full_chunks = chunks.where(F.col("n_tok") == 50).select(
        "source", F.expr("CAST(1000 * n_types DIV 50 AS BIGINT)").alias("ttr_milli")
    )
    return (
        full_chunks.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("ttr_milli").cast("long").alias("sum_ttr_milli"),
            F.expr("CAST(SUM(ttr_milli) DIV COUNT(*) AS BIGINT)").alias(
                "sttr_mean_milli"
            ),
        )
        .orderBy("source")
    )


@register(
    "f48_theil_u2",
    oracle="""
    WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), paired AS (
        SELECT a.event_type, a.x AS x_t, b1.x AS x_lag1, b7.x AS x_lag7
        FROM daily a
        JOIN daily b1 ON b1.event_type = a.event_type AND b1.day = a.day - 1
        JOIN daily b7 ON b7.event_type = a.event_type AND b7.day = a.day - 7
    ), s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM((x_t - x_lag7) * (x_t - x_lag7)) AS BIGINT)
                   AS sse_seasonal,
               CAST(SUM((x_t - x_lag1) * (x_t - x_lag1)) AS BIGINT)
                   AS sse_naive
        FROM paired GROUP BY 1
    )
    SELECT event_type, n_days, sse_seasonal, sse_naive,
           CASE WHEN sse_naive > 0
                THEN CAST(FLOOR(sqrt(CAST(sse_seasonal AS DOUBLE)
                                     / sse_naive) * 1000) AS BIGINT)
                ELSE NULL END AS u2_milli
    FROM s ORDER BY event_type
    """,
    survey="F48,E56,F27",
)
def f48_theil_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 forecast-skill ratio per event type: RMSE of the
    SEASONAL naive forecast (day-7-ago) over RMSE of the plain naive
    (yesterday) on daily revenue cents — the model-free skill baseline
    e56's MASE scales errors BY (U2 < 1 means weekly seasonality beats
    persistence — justifying f27's Holt-Winters seasonal state; U2 ≥ 1
    means the extra seasonal machinery buys nothing).

    Exactness: both squared-error sums are exact BIGINTs over the SAME
    day set (rows where both lag-1 and lag-7 exist — explicit
    day-arithmetic joins, the f38 gap rule); U2 = √(SSE7/SSE1) is one
    sqrt of an exact integer ratio (sqrt is IEEE correctly-rounded),
    milli-floored; zero naive error guards to NULL.

    Scale shape: one scan → (type, day) agg; the two lag joins and the
    fold live on the calendar-bounded per-type day relation (KB)."""
    ev = Tables(spark, sf_dir).events
    # r11 (guide §2.4): daily is all three legs of the lag-1/lag-7 join
    # — cut once, one events scan.
    daily = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    ).localCheckpoint(eager=False)
    a = daily.select("event_type", "day", F.col("x").alias("x_t"))
    b1 = daily.select(
        F.col("event_type").alias("et1"), F.col("day").alias("d1"),
        F.col("x").alias("x_lag1"),
    )
    b7 = daily.select(
        F.col("event_type").alias("et7"), F.col("day").alias("d7"),
        F.col("x").alias("x_lag7"),
    )
    paired = a.join(
        b1, (F.col("et1") == F.col("event_type")) & (F.col("d1") == F.col("day") - 1)
    ).join(
        b7, (F.col("et7") == F.col("event_type")) & (F.col("d7") == F.col("day") - 7)
    )
    s = paired.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum((F.col("x_t") - F.col("x_lag7")) * (F.col("x_t") - F.col("x_lag7")))
        .cast("long")
        .alias("sse_seasonal"),
        F.sum((F.col("x_t") - F.col("x_lag1")) * (F.col("x_t") - F.col("x_lag1")))
        .cast("long")
        .alias("sse_naive"),
    )
    return s.select(
        "event_type", "n_days", "sse_seasonal", "sse_naive",
        F.expr(
            "CASE WHEN sse_naive > 0"
            " THEN CAST(FLOOR(sqrt(CAST(sse_seasonal AS DOUBLE)"
            "                      / sse_naive) * 1000) AS BIGINT)"
            " ELSE NULL END"
        ).alias("u2_milli"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Batch 6: diversified selection (MMR re-rank over embeddings) and the
# robust variance-homogeneity gate (Brown-Forsythe).
# --------------------------------------------------------------------------

_MMR_K = 4       # greedy picks per query
_MMR_M = 12      # candidate pool per query (deterministic top-M by rel)
# λ = 0.7 on the 10x integer lattice: mmr = 7·rel − 3·max-selected-dot
_MMR_NUM, _MMR_DEN = 7, 3


def _mmr_sql() -> str:
    steps, outs = [], []
    prev_sel = "sel1"
    outs.append(
        "SELECT 1 AS step, qid, id, rel, CAST(0 AS BIGINT) AS red,"
        " CAST(7 * rel AS BIGINT) AS score FROM s1"
    )
    for r in range(2, _MMR_K + 1):
        steps.append(f"""
    s{r} AS MATERIALIZED (
        SELECT qid, id, rel, red, score FROM (
            SELECT c.qid, c.id, c.rel, m.red,
                   7 * c.rel - 3 * m.red AS score,
                   ROW_NUMBER() OVER (PARTITION BY c.qid
                       ORDER BY 7 * c.rel - 3 * m.red DESC, c.id) AS rn
            FROM cand c
            JOIN (SELECT p.qid, p.ida AS id, CAST(MAX(p.dot) AS BIGINT) AS red
                  FROM pd p JOIN {prev_sel} s
                      ON s.qid = p.qid AND s.id = p.idb
                  GROUP BY 1, 2) m ON m.qid = c.qid AND m.id = c.id
            WHERE NOT EXISTS (SELECT 1 FROM {prev_sel} s
                              WHERE s.qid = c.qid AND s.id = c.id)
        ) WHERE rn = 1
    ), sel{r} AS MATERIALIZED (
        SELECT qid, id FROM {prev_sel} UNION ALL SELECT qid, id FROM s{r}
    )""")
        outs.append(
            f"SELECT {r} AS step, qid, id, rel, red, score FROM s{r}"
        )
        prev_sel = f"sel{r}"
    return f"""
    WITH ex AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS micro
        FROM embeddings
    ), rel_all AS (
        SELECT q.vec_id AS qid, e.vec_id AS id,
               CAST(SUM(q.micro * e.micro) AS BIGINT) AS rel
        FROM ex q JOIN ex e ON e.dim = q.dim AND e.vec_id <> q.vec_id
        WHERE q.vec_id < 8
        GROUP BY 1, 2
    ), cand AS MATERIALIZED (
        SELECT qid, id, rel FROM (
            SELECT qid, id, rel,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY rel DESC, id) AS rn
            FROM rel_all
        ) WHERE rn <= {_MMR_M}
    ), pd AS MATERIALIZED (
        SELECT a.qid, a.id AS ida, b.id AS idb,
               CAST(SUM(ea.micro * eb.micro) AS BIGINT) AS dot
        FROM cand a
        JOIN cand b ON b.qid = a.qid AND b.id <> a.id
        JOIN ex ea ON ea.vec_id = a.id
        JOIN ex eb ON eb.vec_id = b.id AND eb.dim = ea.dim
        GROUP BY 1, 2, 3
    ), s1 AS MATERIALIZED (
        SELECT qid, id, rel FROM (
            SELECT qid, id, rel,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY rel DESC, id) AS rn
            FROM cand
        ) WHERE rn = 1
    ), sel1 AS MATERIALIZED (SELECT qid, id FROM s1),{",".join(steps)}
    SELECT CAST(step AS INTEGER) AS step, CAST(qid AS BIGINT) AS query_id,
           CAST(id AS BIGINT) AS picked_id, rel, red, score
    FROM ({" UNION ALL ".join(outs)})
    ORDER BY step, query_id
    """


@register("j121_mmr_rerank", oracle=_mmr_sql(), survey="J121,J3,J109")
def j121_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998) over the embedding table — the SELECTION operator
    pure similarity search (j3) cannot express: greedy picks maximize
    λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s), trading relevance against
    redundancy — what dataset-curation pipelines run to pick DIVERSE
    exemplars instead of k near-duplicates of the same neighbor (the
    submodular-greedy sibling of j109's max-coverage).

    Exactness: embeddings quantize to the micro lattice once, so every
    dot product (relevance AND pairwise redundancy) is an exact BIGINT
    (|x|≤4 ⇒ per-dim product ≤ 1.6e13, ×64 dims ≤ 1.1e15); λ = 0.7
    rides the 10× integer lattice (score = 7·rel − 3·red, stated
    contract); candidate pools are the deterministic top-{_MMR_M} by
    (rel DESC, id) and every greedy argmax tie-breaks (score DESC, id);
    the full 4-step trajectory (pick, rel, red, score per step) is the
    hash-certified output, mirrored by the unrolled MATERIALIZED-CTE
    oracle; python greedy replay pin.

    Scale shape: the volume terms are the one quantized explode and the
    8×|V| relevance dot join (linear in vectors — the brute-force tier;
    an IVF/LSH preselect drops in above it, j3's documented dial);
    everything after runs on the (8 queries × {_MMR_M})-row candidate
    relation: pairwise dots, redundancy maxes and argmaxes are KB
    joins in query lockstep, {_MMR_K}-bounded."""
    from pyspark.sql import Window

    # r11 optimization (guide §4.1/§2.3): every dot product used to run as
    # posexplode(embedding) → 64× the rows → per-dim equi join → groupBy —
    # the 8×|V| relevance computation shuffled 64·|V| (dim, micro) rows
    # and the checkpointed exploded relation was materialized in full.
    # Arrays never leave the row now: quantize once with ``transform`` and
    # compute every dot as a codegen zip_with/aggregate fold — identical
    # BIGINT lattice products, identical sums (integer addition is
    # order-free), zero explode shuffle.  The 8-query side broadcasts.
    e = Tables(spark, sf_dir).embeddings
    vecs = (
        fan_out(e)
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x ->"
                " CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
            ).alias("qv"),
        )
        .localCheckpoint(eager=False)
    )
    queries = vecs.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qvq")
    )
    dot = (
        "aggregate(zip_with({0}, {1}, (a, b) -> a * b),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    rel_all = (
        vecs.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("id"),
            F.expr(dot.format("qv", "qvq")).alias("rel"),
        )
    )
    w_rank = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("id"))
    cand = (
        rel_all.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= _MMR_M)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    # Everything past the candidate cut is bounded BY CONSTRUCTION at
    # 8 queries x _MMR_M candidates — the sanctioned KB-collect class
    # (BPE argmax / <=8-query-vector precedent).  The former implementation
    # ran the greedy as ~4 distributed jobs per step (redundancy agg +
    # anti join + score join + argmax window, each eagerly checkpointed);
    # the greedy now replays driver-side over the SPARK-QUANTIZED integer
    # vectors (collected, so the micro lattice is Spark's ROUND, not
    # Python's) — identical BIGINT dots, identical (score DESC, id)
    # tie-breaks, one collect job instead of ~12 (r11, guide §1.2 step 1).
    candv = cand.join(vecs, F.col("vec_id") == F.col("id")).select(
        "qid", "id", "rel", "qv"
    )
    by_q: dict = {}
    for row in candv.collect():
        by_q.setdefault(row["qid"], []).append(
            (int(row["id"]), int(row["rel"]), [int(x) for x in row["qv"]])
        )
    traj_rows = []
    for qid in sorted(by_q):
        cands = sorted(by_q[qid], key=lambda t: (-t[1], t[0]))
        vec_by_id = {c[0]: c[2] for c in cands}
        sel_ids = [cands[0][0]]
        traj_rows.append(
            (1, int(qid), cands[0][0], cands[0][1], 0, 7 * cands[0][1])
        )
        for step in range(2, _MMR_K + 1):
            best = None
            for cid, crel, cv in cands:
                if cid in sel_ids:
                    continue
                red = max(
                    sum(a * b for a, b in zip(cv, vec_by_id[s]))
                    for s in sel_ids
                )
                score = 7 * crel - 3 * red
                key = (-score, cid)
                if best is None or key < best[0]:
                    best = (key, cid, crel, red, score)
            if best is None:
                break
            _, cid, crel, red, score = best
            sel_ids.append(cid)
            traj_rows.append((step, int(qid), cid, crel, red, score))
    return spark.createDataFrame(
        sorted(traj_rows),
        "step int, query_id long, picked_id long, rel long, red long, score long",
    ).orderBy("step", "query_id")


@register(
    "e108_brown_forsythe",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
        FROM lineitem
    ), vc AS (
        SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2
    ), cum AS (
        SELECT g, v, c,
               SUM(c) OVER (PARTITION BY g ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cumc,
               SUM(c) OVER (PARTITION BY g) AS n_g
        FROM vc
    ), med AS (
        SELECT g,
               CAST(MIN(CASE WHEN cumc >= (n_g + 1) // 2 THEN v END)
                    + MIN(CASE WHEN cumc >= n_g // 2 + 1 THEN v END)
                    AS BIGINT) AS med2
        FROM cum GROUP BY 1
    ), z AS (
        SELECT vals.g, ABS(2 * v - med2) AS z2
        FROM vals JOIN med ON med.g = vals.g
    ), pg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(z2) AS BIGINT) AS s,
               CAST(SUM(z2 * z2) AS BIGINT) AS q
        FROM z GROUP BY 1
    ), wide AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
               CAST(SUM(s) AS BIGINT) AS s_tot,
               CAST(SUM(CASE WHEN g = 'A' THEN n END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN g = 'A' THEN s END) AS BIGINT) AS s_a,
               CAST(SUM(CASE WHEN g = 'A' THEN q END) AS BIGINT) AS q_a,
               CAST(SUM(CASE WHEN g = 'N' THEN n END) AS BIGINT) AS n_n,
               CAST(SUM(CASE WHEN g = 'N' THEN s END) AS BIGINT) AS s_n,
               CAST(SUM(CASE WHEN g = 'N' THEN q END) AS BIGINT) AS q_n,
               CAST(SUM(CASE WHEN g = 'R' THEN n END) AS BIGINT) AS n_r,
               CAST(SUM(CASE WHEN g = 'R' THEN s END) AS BIGINT) AS s_r,
               CAST(SUM(CASE WHEN g = 'R' THEN q END) AS BIGINT) AS q_r
        FROM pg
    )
    SELECT n_tot, n_a, s_a, q_a, n_n, s_n, q_n, n_r, s_r, q_r,
           CAST(FLOOR(
               (CAST(n_tot - 3 AS DOUBLE) / 2)
               * (CAST(s_a AS DOUBLE) * s_a / n_a
                  + CAST(s_n AS DOUBLE) * s_n / n_n
                  + CAST(s_r AS DOUBLE) * s_r / n_r
                  - CAST(s_tot AS DOUBLE) * s_tot / n_tot)
               / (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a
                  + CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * s_n / n_n
                  + CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE) * s_r / n_r)
               * 1000) AS BIGINT) AS f_milli
    FROM wide
    """,
    survey="E108,E57,E101",
)
def e108_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe robust variance-homogeneity test across the three
    return-flag populations — the PRECONDITION gate the mean-comparison
    tier silently assumes (e57's ANOVA and e52's t pool variances;
    Levene-class tests ask 'are the spreads even comparable', and the
    Brown-Forsythe variant centers on the MEDIAN so heavy tails can't
    fake a variance difference): one-way ANOVA on z = |x − median_g|.

    Exactness: medians ride the DOUBLED lattice (med2 = lower + upper
    middle from the per-group cumulative value histogram — exact for
    odd and even n), so z2 = |2x − med2| is an exact BIGINT per row;
    per-group (n, Σz2, Σz2²) pivot to ONE row over the closed A/N/R
    domain, and F = [(N−k)/(k−1)]·SSB/SSW is one shared scalar double
    chain over those integers, milli-floored; python replay pin ±1.

    Scale shape: value-histogram medians on the 50-row distinct
    relation (per-group windows), one broadcast med2 join back, one
    3-group agg pivoted by conditional aggregation — two scans total,
    no unpartitioned windows."""
    from pyspark.sql import Window

    li = Tables(spark, sf_dir).lineitem
    vals = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    vc = vals.groupBy("g", "v").agg(F.count("*").cast("long").alias("c"))
    w_cum = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("g")
    cum = vc.select(
        "g", "v", "c",
        F.sum("c").over(w_cum).alias("cumc"),
        F.sum("c").over(w_all).alias("n_g"),
    )
    med = cum.groupBy("g").agg(
        (
            F.min(F.when(F.col("cumc") >= F.expr("(n_g + 1) DIV 2"), F.col("v")))
            + F.min(F.when(F.col("cumc") >= F.expr("n_g DIV 2 + 1"), F.col("v")))
        )
        .cast("long")
        .alias("med2")
    )
    z = vals.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("v") - F.col("med2")).alias("z2")
    )
    pg = z.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z2").cast("long").alias("s"),
        F.sum(F.col("z2") * F.col("z2")).cast("long").alias("q"),
    )
    wide = pg.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s").cast("long").alias("s_tot"),
        *[
            F.sum(F.when(F.col("g") == flag, F.col(col)))
            .cast("long")
            .alias(f"{col}_{flag.lower()}")
            for flag in ("A", "N", "R")
            for col in ("n", "s", "q")
        ],
    )
    ssb = (
        "CAST(s_a AS DOUBLE) * s_a / n_a"
        " + CAST(s_n AS DOUBLE) * s_n / n_n"
        " + CAST(s_r AS DOUBLE) * s_r / n_r"
        " - CAST(s_tot AS DOUBLE) * s_tot / n_tot"
    )
    ssw = (
        "CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a"
        " + CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * s_n / n_n"
        " + CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE) * s_r / n_r"
    )
    return wide.select(
        "n_tot", "n_a", "s_a", "q_a", "n_n", "s_n", "q_n", "n_r", "s_r", "q_r",
        F.expr(
            f"CAST(FLOOR((CAST(n_tot - 3 AS DOUBLE) / 2) * ({ssb}) / ({ssw})"
            " * 1000) AS BIGINT)"
        ).alias("f_milli"),
    )


# --------------------------------------------------------------------------
# Batch 7: training-mix engineering — integer Hamilton apportionment of a
# token budget across sources, and Bandt-Pompe permutation entropy.
# --------------------------------------------------------------------------

_MIX_BUDGET = 1_000_000  # tokens to apportion (contract constant)


@register(
    "j122_token_budget_apportion",
    oracle=f"""
    WITH tok AS (
        SELECT source,
               CAST(SUM(len({_WORDS})) AS BIGINT) AS tokens
        FROM documents GROUP BY 1
    ), w AS (
        SELECT source, tokens,
               CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS wgt
        FROM tok
    ), tot AS (
        SELECT CAST(SUM(wgt) AS BIGINT) AS wsum FROM w
    ), base AS (
        SELECT source, tokens, wgt,
               CAST({_MIX_BUDGET} * wgt // wsum AS BIGINT) AS base_alloc,
               CAST({_MIX_BUDGET} * wgt % wsum AS BIGINT) AS rem
        FROM w CROSS JOIN tot
    ), leftover AS (
        SELECT CAST({_MIX_BUDGET} - SUM(base_alloc) AS BIGINT) AS k FROM base
    ), ranked AS (
        SELECT a.source, a.tokens, a.wgt, a.base_alloc, a.rem,
               CAST(1 + COUNT(b.source) AS BIGINT) AS rnk
        FROM base a LEFT JOIN base b
            ON b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source)
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT source, tokens, wgt, base_alloc, rem,
           CAST(CASE WHEN rnk <= k THEN 1 ELSE 0 END AS BIGINT) AS extra,
           CAST(base_alloc + CASE WHEN rnk <= k THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked CROSS JOIN leftover
    ORDER BY source
    """,
    survey="J122,J12,J115",
)
def j122_token_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix token-budget apportionment: split a fixed budget of
    {_MIX_BUDGET} tokens across sources proportional to √(source tokens)
    — the square-root mixing heuristic public data recipes use to keep
    big sources from drowning small ones — with the HAMILTON
    largest-remainder method so the integer allocations sum EXACTLY to
    the budget (naive rounding over- or under-shoots; apportionment is
    the classic fix, and the same machinery allocates samples in j115's
    splits or shards in a layout plan).

    Exactness: pure integer END-TO-END — token counts exact; weights are
    FLOOR(√T) (IEEE sqrt is correctly rounded, identical both engines);
    base = B·w DIV W and remainder = B·w MOD W are integer; the k
    leftover units go to the k largest remainders with the (rem DESC,
    source) tiebreak, ranked by a broadcast inequality self-join over
    the SOURCE-domain relation (never an unpartitioned window); the
    Σalloc = B law is pinned.

    Scale shape: one tokenize scan (the volume term) → per-source agg →
    everything after on the ≤|sources| KB relation."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    tok = d.select("source", F.size(tokens(F.col("text"))).alias("nt")).groupBy(
        "source"
    ).agg(F.sum("nt").cast("long").alias("tokens"))
    w = tok.select(
        "source", "tokens",
        F.expr("CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT)").alias("wgt"),
    )
    tot = w.agg(F.sum("wgt").cast("long").alias("wsum"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "source", "tokens", "wgt",
        F.expr(f"CAST({_MIX_BUDGET} * wgt DIV wsum AS BIGINT)").alias("base_alloc"),
        F.expr(f"CAST({_MIX_BUDGET} * wgt % wsum AS BIGINT)").alias("rem"),
    ).localCheckpoint(eager=True)
    leftover = base.agg(
        (F.lit(_MIX_BUDGET) - F.sum("base_alloc")).cast("long").alias("k")
    )
    a, b = base.alias("ba"), base.alias("bb")
    ahead = (F.col("bb.rem") > F.col("ba.rem")) | (
        (F.col("bb.rem") == F.col("ba.rem"))
        & (F.col("bb.source") < F.col("ba.source"))
    )
    ranked = (
        a.join(F.broadcast(b), ahead, "left")
        .groupBy(
            F.col("ba.source").alias("source"),
            F.col("ba.tokens").alias("tokens"),
            F.col("ba.wgt").alias("wgt"),
            F.col("ba.base_alloc").alias("base_alloc"),
            F.col("ba.rem").alias("rem"),
        )
        .agg((F.count(F.col("bb.source")) + 1).cast("long").alias("rnk"))
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source", "tokens", "wgt", "base_alloc", "rem",
            F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0)
            .cast("long")
            .alias("extra"),
            (
                F.col("base_alloc")
                + F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy("source")
    )


@register(
    "f49_permutation_entropy",
    oracle="""
    WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), trip AS (
        SELECT a.event_type,
               a.x AS va, b.x AS vb, c.x AS vc
        FROM daily a
        JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + 1
        JOIN daily c ON c.event_type = a.event_type AND c.day = a.day + 2
    ), pat AS (
        SELECT event_type,
               CAST(
                 (CASE WHEN vb < va THEN 1 ELSE 0 END
                  + CASE WHEN vc < va THEN 1 ELSE 0 END) * 100
               + (CASE WHEN va <= vb THEN 1 ELSE 0 END
                  + CASE WHEN vc < vb THEN 1 ELSE 0 END) * 10
               + (CASE WHEN va <= vc THEN 1 ELSE 0 END
                  + CASE WHEN vb <= vc THEN 1 ELSE 0 END)
               AS BIGINT) AS pattern
        FROM trip
    ), pc AS (
        SELECT event_type, pattern, CAST(COUNT(*) AS BIGINT) AS c
        FROM pat GROUP BY 1, 2
    ), n AS (
        SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM pc GROUP BY 1
    ), terms AS (
        SELECT pc.event_type, pattern, c, n.n,
               CAST(FLOOR(CAST(c AS DOUBLE) / n.n
                          * ln(CAST(c AS DOUBLE) / n.n) * 1000000)
                    AS BIGINT) AS term_micro
        FROM pc JOIN n ON n.event_type = pc.event_type
    ), h AS (
        SELECT event_type, CAST(-SUM(term_micro) AS BIGINT) AS h_micro
        FROM terms GROUP BY 1
    )
    SELECT t.event_type, pattern, c, t.n, term_micro, h.h_micro
    FROM terms t JOIN h ON h.event_type = t.event_type
    ORDER BY t.event_type, pattern
    """,
    survey="F49,F43,F34",
)
def f49_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandt-Pompe permutation entropy (order-3) of the daily event-count
    series per type — the COMPLEXITY measure completing the randomness
    tier (f43/f44 count signs and extrema; permutation entropy reads the
    distribution over ORDER PATTERNS of 3 consecutive days: maximal for
    white noise, low for monotone/periodic structure, and famously
    robust because it never uses the magnitudes).

    Exactness: order patterns come from pure integer comparisons with
    the standard earlier-index tie rule ((value, index) lexicographic —
    encoded as each position's less-than count, a 3-digit code);
    pattern counts are exact BIGINTs over the CLOSED 6-pattern domain;
    each −p·ln p term is FLOOR-micro-quantized per pattern
    (quantize-before-sum, ln parity per j101) and H is an exact INTEGER
    sum.  Triples come from explicit day arithmetic (gaps drop triples,
    never misalign — the f38 rule).

    Scale shape: one scan → (type, day) agg; the triple join, pattern
    classification and entropy folds all live on the calendar-bounded
    per-type day relation (KB)."""
    ev = Tables(spark, sf_dir).events
    # r11 (guide §2.4): the per-type daily series is all three legs of
    # the consecutive-triple join — cut once, one events scan.
    daily = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(F.count("*").cast("long").alias("x")).localCheckpoint(eager=False)
    a = daily.select("event_type", F.col("day").alias("da"), F.col("x").alias("va"))
    b = daily.select(
        F.col("event_type").alias("etb"), F.col("day").alias("db"),
        F.col("x").alias("vb"),
    )
    c = daily.select(
        F.col("event_type").alias("etc_"), F.col("day").alias("dc"),
        F.col("x").alias("vc"),
    )
    trip = a.join(
        b, (F.col("etb") == F.col("event_type")) & (F.col("db") == F.col("da") + 1)
    ).join(
        c, (F.col("etc_") == F.col("event_type")) & (F.col("dc") == F.col("da") + 2)
    )
    pat = trip.select(
        "event_type",
        F.expr(
            "CAST((CASE WHEN vb < va THEN 1 ELSE 0 END"
            "  + CASE WHEN vc < va THEN 1 ELSE 0 END) * 100"
            " + (CASE WHEN va <= vb THEN 1 ELSE 0 END"
            "  + CASE WHEN vc < vb THEN 1 ELSE 0 END) * 10"
            " + (CASE WHEN va <= vc THEN 1 ELSE 0 END"
            "  + CASE WHEN vb <= vc THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("pattern"),
    )
    pc = pat.groupBy("event_type", "pattern").agg(
        F.count("*").cast("long").alias("c")
    )
    n = pc.groupBy("event_type").agg(F.sum("c").cast("long").alias("n"))
    terms = pc.join(n, "event_type").select(
        "event_type", "pattern", "c", "n",
        F.expr(
            "CAST(FLOOR(CAST(c AS DOUBLE) / n"
            " * ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT)"
        ).alias("term_micro"),
    )
    h = terms.groupBy("event_type").agg(
        (-F.sum("term_micro")).cast("long").alias("h_micro")
    )
    return (
        terms.join(h, "event_type")
        .select("event_type", "pattern", "c", "n", "term_micro", "h_micro")
        .orderBy("event_type", "pattern")
    )


# --------------------------------------------------------------------------
# Batch 8: association effect size (Cramér's V), ROUGE-bigram pair scoring,
# and snapshot incremental-backup byte accounting.
# --------------------------------------------------------------------------


@register(
    "e109_cramers_v",
    oracle="""
    WITH base AS (
        SELECT o.o_orderpriority AS pr, c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cells AS (
        SELECT pr, seg, CAST(COUNT(*) AS BIGINT) AS o
        FROM base GROUP BY 1, 2
    ), rt AS (
        SELECT pr, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1
    ), ct AS (
        SELECT seg, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1
    ), n AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells
    ), terms AS (
        SELECT pr, seg, o, r, c, n,
               CAST(FLOOR(
                   CAST(n * o - r * c AS DOUBLE)
                   * CAST(n * o - r * c AS DOUBLE)
                   / (CAST(n AS DOUBLE) * r * c) * 1000000)
                   AS BIGINT) AS term_micro
        FROM cells JOIN rt USING (pr) JOIN ct USING (seg) CROSS JOIN n
    ), chi AS (
        SELECT CAST(SUM(term_micro) AS BIGINT) AS chi2_micro FROM terms
    )
    SELECT pr, seg, o, term_micro, chi2_micro,
           CAST(FLOOR(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000
                           / (CAST(n AS DOUBLE) * 4)) * 1000)
                AS BIGINT) AS v_milli
    FROM terms CROSS JOIN chi
    ORDER BY pr, seg
    """,
    survey="E109,E105,E100",
)
def e109_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V on the priority × market-segment grid — the EFFECT
    SIZE the association tests stop short of (e37/e105 say "not
    independent", which at 100 TB row counts is always true; V =
    √(χ²/(N·min(r−1,c−1))) ∈ [0,1] says HOW FAR from independence,
    comparable across tables of any size — the categorical sibling of
    e100's Cohen d).

    Exactness: Pearson per-cell terms use the integer identity
    (O−RC/N)²/(RC/N) = (N·O−R·C)²/(N·R·C) — numerator exact BIGINT
    before the double division — FLOOR-micro-quantized per cell
    (quantize-before-sum over the closed 25-cell grid), χ² an exact
    INTEGER sum, and V one IEEE sqrt of the quantized ratio
    (min(r−1,c−1) = 4 is a domain constant), milli-floored; python
    replay pin.

    Scale shape: identical to e105 — one join scan, a 25-cell agg,
    margin joins and KB folds."""
    t = Tables(spark, sf_dir)
    base = t.orders.join(
        t.customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(F.col("o_orderpriority").alias("pr"), F.col("c_mktsegment").alias("seg"))
    # r11 (guide §2.4): the 25-cell grid feeds both margins, the total
    # and the term join — cut once so the fact join runs once.
    cells = (
        base.groupBy("pr", "seg")
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    rt = cells.groupBy("pr").agg(F.sum("o").cast("long").alias("r"))
    ct = cells.groupBy("seg").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    terms = (
        cells.join(F.broadcast(rt), "pr")
        .join(F.broadcast(ct), "seg")
        .crossJoin(F.broadcast(n))
        .select(
            "pr", "seg", "o", "r", "c", "n",
            F.expr(
                "CAST(FLOOR(CAST(n * o - r * c AS DOUBLE)"
                " * CAST(n * o - r * c AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * r * c) * 1000000) AS BIGINT)"
            ).alias("term_micro"),
        )
    )
    chi = terms.agg(F.sum("term_micro").cast("long").alias("chi2_micro"))
    return (
        terms.crossJoin(F.broadcast(chi))
        .select(
            "pr", "seg", "o", "term_micro", "chi2_micro",
            F.expr(
                "CAST(FLOOR(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000"
                " / (CAST(n AS DOUBLE) * 4)) * 1000) AS BIGINT)"
            ).alias("v_milli"),
        )
        .orderBy("pr", "seg")
    )


@register(
    "j123_rouge_bigram",
    oracle=f"""
    WITH grams AS (
        SELECT source, doc_id,
               unnest([array_to_string(w[i:i+1], ' ')
                       for i in range(1, len(w))]) AS g
        FROM (SELECT source, doc_id, {_WORDS} AS w FROM documents)
        WHERE len(w) >= 2
    ), gc AS (
        SELECT source, doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM grams GROUP BY 1, 2, 3
    ), totals AS (
        SELECT source, doc_id, CAST(SUM(c) AS BIGINT) AS tot
        FROM gc GROUP BY 1, 2
    ), pairs AS (
        SELECT r.source, r.doc_id AS ref_id, c.doc_id AS cand_id,
               r.tot AS ref_tot, c.tot AS cand_tot
        FROM totals r JOIN totals c
            ON c.source = r.source AND c.doc_id = r.doc_id + 20
    ), clipped AS (
        SELECT p.source, p.ref_id,
               CAST(SUM(LEAST(rg.c, cg.c)) AS BIGINT) AS clip
        FROM pairs p
        JOIN gc rg ON rg.doc_id = p.ref_id AND rg.source = p.source
        JOIN gc cg ON cg.doc_id = p.cand_id AND cg.source = p.source
                  AND cg.g = rg.g
        GROUP BY 1, 2
    ), scored AS (
        SELECT p.source,
               CAST(1000 * COALESCE(cl.clip, 0) // p.cand_tot AS BIGINT)
                   AS p_milli,
               CAST(1000 * COALESCE(cl.clip, 0) // p.ref_tot AS BIGINT)
                   AS r_milli,
               CAST(2000 * COALESCE(cl.clip, 0)
                    // (p.ref_tot + p.cand_tot) AS BIGINT) AS f1_milli
        FROM pairs p LEFT JOIN clipped cl
            ON cl.source = p.source AND cl.ref_id = p.ref_id
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(p_milli) // COUNT(*) AS BIGINT) AS mean_p_milli,
           CAST(SUM(r_milli) // COUNT(*) AS BIGINT) AS mean_r_milli,
           CAST(SUM(f1_milli) // COUNT(*) AS BIGINT) AS mean_f1_milli
    FROM scored GROUP BY 1 ORDER BY 1
    """,
    survey="J123,J72,J5",
)
def j123_rouge_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 (bigram) precision/recall/F1 over adjacent-document pairs
    per source — the n-gram-overlap summarization metric whose CLIPPED
    counting (Σ min(count_ref, count_cand) per bigram) the plain Jaccard
    tier (j5) cannot express, and the SQL-certifiable sibling of the
    LCS-based j72 ROUGE-L (LCS needs sequential recursion; bigram ROUGE
    is pure multiset algebra).  Fixture pairs doc i with doc i+20 — the
    NEXT document of the same source under the corpus's round-robin
    source assignment (deterministic re-scrape stand-in).

    Exactness: pure integer END-TO-END — bigram multiset counts, the
    clipped intersection, P/R per pair as integer milli divisions, and
    F1 via the harmonic identity 2·clip/(ref_tot+cand_tot) (exact when
    P and R share the clip numerator — no float P·R product); per-source
    means divide exact milli sums (quantize-before-average); pairs with
    zero overlap keep their zero row via the LEFT join.

    Scale shape: bigram explode (volume term) → (doc, gram) hash agg →
    one gram-equi join bounded to ADJACENT-doc pairs (each gram row
    meets one partner doc, never a corpus-wide gram fan-out) →
    per-source folds."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    w = tokens(F.col("text"))
    toks = d.select("source", "doc_id", F.posexplode(w).alias("pos", "tk"))
    nxt = toks.select(
        "source", "doc_id", (F.col("pos") - 1).alias("pos"), F.col("tk").alias("tk2")
    )
    grams = toks.join(nxt, ["source", "doc_id", "pos"]).select(
        "source", "doc_id", F.concat_ws(" ", "tk", "tk2").alias("g")
    )
    # r11 (guide §2.4): per-doc bigram counts feed the totals agg and
    # both clipped-join legs — cut once (the j67/j125 gram-relation
    # pattern), one tokenize + adjacency-join pass.
    gc = grams.groupBy("source", "doc_id", "g").agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint(eager=False)
    totals = gc.groupBy("source", "doc_id").agg(F.sum("c").cast("long").alias("tot"))
    cand = totals.select(
        F.col("source").alias("sc"), F.col("doc_id").alias("cand_id"),
        F.col("tot").alias("cand_tot"),
    )
    pairs = totals.join(
        cand,
        (F.col("sc") == F.col("source"))
        & (F.col("cand_id") == F.col("doc_id") + 20),
    ).select(
        "source", F.col("doc_id").alias("ref_id"), "cand_id",
        F.col("tot").alias("ref_tot"), "cand_tot",
    ).localCheckpoint(eager=True)
    rg = gc.select(
        F.col("source").alias("sr"), F.col("doc_id").alias("rid"),
        F.col("g").alias("gr"), F.col("c").alias("cr"),
    )
    cg = gc.select(
        F.col("source").alias("scg"), F.col("doc_id").alias("cid"),
        F.col("g").alias("gcol"), F.col("c").alias("cc"),
    )
    clipped = (
        pairs.join(rg, (F.col("sr") == F.col("source")) & (F.col("rid") == F.col("ref_id")))
        .join(
            cg,
            (F.col("scg") == F.col("source"))
            & (F.col("cid") == F.col("cand_id"))
            & (F.col("gcol") == F.col("gr")),
        )
        .groupBy("source", "ref_id")
        .agg(F.sum(F.least(F.col("cr"), F.col("cc"))).cast("long").alias("clip"))
    )
    scored = pairs.join(clipped, ["source", "ref_id"], "left").select(
        "source",
        F.expr("CAST(1000 * COALESCE(clip, 0) DIV cand_tot AS BIGINT)").alias(
            "p_milli"
        ),
        F.expr("CAST(1000 * COALESCE(clip, 0) DIV ref_tot AS BIGINT)").alias(
            "r_milli"
        ),
        F.expr(
            "CAST(2000 * COALESCE(clip, 0) DIV (ref_tot + cand_tot) AS BIGINT)"
        ).alias("f1_milli"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr("CAST(SUM(p_milli) DIV COUNT(*) AS BIGINT)").alias(
                "mean_p_milli"
            ),
            F.expr("CAST(SUM(r_milli) DIV COUNT(*) AS BIGINT)").alias(
                "mean_r_milli"
            ),
            F.expr("CAST(SUM(f1_milli) DIV COUNT(*) AS BIGINT)").alias(
                "mean_f1_milli"
            ),
        )
        .orderBy("source")
    )


@register(
    "a39_incremental_backup_bytes",
    oracle="""
    WITH rows_b AS (
        SELECT l_orderkey % 97 AS gen,
               48 + 2 * CAST(l_quantity AS BIGINT)
                  + CAST(ROUND(l_discount * 100) AS BIGINT) AS row_bytes
        FROM lineitem
    ), gens AS (
        SELECT gen, CAST(SUM(row_bytes) AS BIGINT) AS bytes
        FROM rows_b GROUP BY 1
    ), tags AS (
        SELECT 'tag1' AS tag, gen, bytes FROM gens WHERE gen % 5 <> 0
        UNION ALL
        SELECT 'tag2' AS tag, gen, bytes FROM gens
    ), logical AS (
        SELECT tag, CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(bytes) AS BIGINT) AS logical_bytes
        FROM tags GROUP BY 1
    ), shared AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS shared_files,
               CAST(SUM(bytes) AS BIGINT) AS shared_bytes
        FROM gens WHERE gen % 5 <> 0
    ), delta AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS delta_files,
               CAST(SUM(bytes) AS BIGINT) AS delta_bytes
        FROM gens WHERE gen % 5 = 0
    )
    SELECT l.tag, l.n_files, l.logical_bytes,
           s.shared_files, s.shared_bytes, d.delta_files, d.delta_bytes,
           CAST(1000 * s.shared_bytes
                // (s.shared_bytes + d.delta_bytes) AS BIGINT)
               AS dedup_ratio_milli
    FROM logical l CROSS JOIN shared s CROSS JOIN delta d
    ORDER BY l.tag
    """,
    survey="A39,A6,A22",
)
def a39_incremental_backup_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot incremental-backup byte accounting: Cassandra snapshots
    are HARDLINKS, so two tags sharing SSTable generations cost their
    union once on disk and an incremental backup ships only the
    generations the previous tag lacks — the `nodetool snapshot` +
    `incremental_backups` economics (a6 lists one manifest; THIS is the
    cross-tag question an operator actually bills: logical vs physical
    bytes and the upload delta).  Fixture: tag1 = the un-recompacted
    generations (gen % 5 ≠ 0), tag2 = all generations, bytes from the
    a38 per-row estimator.

    Exactness: pure integer end-to-end — per-generation byte sums,
    per-tag logical bytes, shared/delta partitions of the generation
    set, and the dedup ratio as an integer milli division.

    Scale shape: one scan → per-generation agg (97-row relation) →
    constant-size folds; the tag relation is a projection of the
    generation relation, never a second scan."""
    li = Tables(spark, sf_dir).lineitem
    gens = (
        li.select(
            (F.col("l_orderkey") % 97).alias("gen"),
            (
                F.lit(48)
                + 2 * F.col("l_quantity").cast("long")
                + F.round(F.col("l_discount") * 100).cast("long")
            ).alias("row_bytes"),
        )
        .groupBy("gen")
        .agg(F.sum("row_bytes").cast("long").alias("bytes"))
        .localCheckpoint(eager=True)
    )
    tags = gens.where(F.col("gen") % 5 != 0).select(
        F.lit("tag1").alias("tag"), "gen", "bytes"
    ).unionByName(gens.select(F.lit("tag2").alias("tag"), "gen", "bytes"))
    logical = tags.groupBy("tag").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("logical_bytes"),
    )
    shared = gens.where(F.col("gen") % 5 != 0).agg(
        F.count("*").cast("long").alias("shared_files"),
        F.sum("bytes").cast("long").alias("shared_bytes"),
    )
    delta = gens.where(F.col("gen") % 5 == 0).agg(
        F.count("*").cast("long").alias("delta_files"),
        F.sum("bytes").cast("long").alias("delta_bytes"),
    )
    return (
        logical.crossJoin(F.broadcast(shared))
        .crossJoin(F.broadcast(delta))
        .select(
            "tag", "n_files", "logical_bytes", "shared_files", "shared_bytes",
            "delta_files", "delta_bytes",
            F.expr(
                "CAST(1000 * shared_bytes"
                " DIV (shared_bytes + delta_bytes) AS BIGINT)"
            ).alias("dedup_ratio_milli"),
        )
        .orderBy("tag")
    )


# --------------------------------------------------------------------------
# Batch 9: monitoring-statistics closure — effective sample size, the
# nearest-event temporal join, and the tombstone scan-pressure audit.
# --------------------------------------------------------------------------


@register(
    "f50_effective_sample_size",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
        FROM daily
    ), den AS (
        SELECT CAST(SUM((n * x - s) * (n * x - s)) AS BIGINT) AS d
        FROM daily CROSS JOIN stats
    ), lags AS (
        SELECT unnest(range(1, 8)) AS k
    ), nums AS (
        SELECT k, CAST(SUM((n * a.x - s) * (n * b.x - s)) AS BIGINT) AS num
        FROM daily a
        JOIN lags ON TRUE
        JOIN daily b ON b.day = a.day + k
        CROSS JOIN stats
        GROUP BY k
    ), wide AS (
        SELECT CAST(SUM(CASE WHEN k = 1 THEN num END) AS BIGINT) AS m1,
               CAST(SUM(CASE WHEN k = 2 THEN num END) AS BIGINT) AS m2,
               CAST(SUM(CASE WHEN k = 3 THEN num END) AS BIGINT) AS m3,
               CAST(SUM(CASE WHEN k = 4 THEN num END) AS BIGINT) AS m4,
               CAST(SUM(CASE WHEN k = 5 THEN num END) AS BIGINT) AS m5,
               CAST(SUM(CASE WHEN k = 6 THEN num END) AS BIGINT) AS m6,
               CAST(SUM(CASE WHEN k = 7 THEN num END) AS BIGINT) AS m7
        FROM nums
    )
    SELECT n, d AS den_scaled,
           CAST(FLOOR((1.0 + 2.0 * (CAST(m1 AS DOUBLE) / d
                + CAST(m2 AS DOUBLE) / d + CAST(m3 AS DOUBLE) / d
                + CAST(m4 AS DOUBLE) / d + CAST(m5 AS DOUBLE) / d
                + CAST(m6 AS DOUBLE) / d + CAST(m7 AS DOUBLE) / d))
                * 1000) AS BIGINT) AS tau_milli,
           CAST(FLOOR(CAST(n AS DOUBLE)
                / (1.0 + 2.0 * (CAST(m1 AS DOUBLE) / d
                   + CAST(m2 AS DOUBLE) / d + CAST(m3 AS DOUBLE) / d
                   + CAST(m4 AS DOUBLE) / d + CAST(m5 AS DOUBLE) / d
                   + CAST(m6 AS DOUBLE) / d + CAST(m7 AS DOUBLE) / d))
                * 1000) AS BIGINT) AS ess_milli
    FROM wide CROSS JOIN stats CROSS JOIN den
    """,
    survey="F50,F38,F45",
)
def f50_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the daily event-count series — the
    MONITORING consequence the ACF tier implies but never states (f38
    measures the per-lag dependence, f45 tests it; ESS = n/τ with the
    integrated autocorrelation time τ = 1 + 2Σρ_k says how many
    INDEPENDENT observations the n autocorrelated days are worth — the
    number every confidence interval over the series should divide by,
    and the MCMC-diagnostics quantity under the same name).

    Exactness: the f38 lattice again — per-lag numerators and the
    shared denominator exact BIGINTs pivoted over the closed 1..7 lag
    window; τ and ESS are one shared scalar double chain in written
    term order, milli-floored (truncation at lag 7 is the stated
    estimator, the f45 window).

    Scale shape: identical to f45 — daily agg, KB lag join, 1-row
    fold."""
    ev = Tables(spark, sf_dir).events
    # r11 (guide §2.4): the calendar-bounded daily series feeds the n/s
    # fold, the denominator fold and both lag-join sides — cut once so
    # the events scan+agg runs once, not four times.
    daily = ev.groupBy(
        F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(F.count("*").cast("long").alias("x")).localCheckpoint(eager=False)
    stats = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    den = (
        daily.crossJoin(F.broadcast(stats))
        .select(
            (
                (F.col("n") * F.col("x") - F.col("s"))
                * (F.col("n") * F.col("x") - F.col("s"))
            ).alias("sq")
        )
        .agg(F.sum("sq").cast("long").alias("d"))
    )
    lags = spark.range(1, 8).select(F.col("id").alias("k"))
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    nums = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .crossJoin(F.broadcast(stats))
        .groupBy("k")
        .agg(
            F.sum(
                (F.col("n") * F.col("xa") - F.col("s"))
                * (F.col("n") * F.col("xb") - F.col("s"))
            )
            .cast("long")
            .alias("num")
        )
    )
    wide = nums.agg(
        *[
            F.sum(F.when(F.col("k") == k, F.col("num")))
            .cast("long")
            .alias(f"m{k}")
            for k in range(1, 8)
        ]
    )
    tau = "1.0 + 2.0 * (" + " + ".join(
        f"CAST(m{k} AS DOUBLE) / d" for k in range(1, 8)
    ) + ")"
    return (
        wide.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(den))
        .select(
            "n",
            F.col("d").alias("den_scaled"),
            F.expr(f"CAST(FLOOR(({tau}) * 1000) AS BIGINT)").alias("tau_milli"),
            F.expr(
                f"CAST(FLOOR(CAST(n AS DOUBLE) / ({tau}) * 1000) AS BIGINT)"
            ).alias("ess_milli"),
        )
    )


@register(
    "d24_nearest_event_join",
    oracle="""
    WITH ue AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS t
        FROM events WHERE event_type IN ('click', 'purchase')
    ), marked AS (
        SELECT user_id, event_id, event_type, t,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN t END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS UNBOUNDED PRECEDING) AS prev_click,
               FIRST_VALUE(CASE WHEN event_type = 'click' THEN t END
                           IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN CURRENT ROW
                         AND UNBOUNDED FOLLOWING) AS next_click
        FROM ue
    ), purchases AS (
        SELECT user_id, t, prev_click, next_click,
               CASE
                   WHEN prev_click IS NULL AND next_click IS NULL THEN 'none'
                   WHEN next_click IS NULL THEN 'prev'
                   WHEN prev_click IS NULL THEN 'next'
                   WHEN t - prev_click <= next_click - t THEN 'prev'
                   ELSE 'next'
               END AS direction
        FROM marked WHERE event_type = 'purchase'
    ), deltas AS (
        SELECT direction,
               CASE direction WHEN 'prev' THEN t - prev_click
                              WHEN 'next' THEN next_click - t
                              ELSE NULL END AS delta_us
        FROM purchases
    )
    SELECT direction,
           CAST(COALESCE(delta_us // 600000000, -1) AS BIGINT) AS bucket_10min,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(delta_us) AS BIGINT) AS sum_delta_us,
           CAST(MIN(delta_us) AS BIGINT) AS min_delta_us,
           CAST(MAX(delta_us) AS BIGINT) AS max_delta_us
    FROM deltas GROUP BY 1, 2 ORDER BY 1, 2
    """,
    survey="D24,D7,E26",
)
def d24_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event temporal join: every purchase matched to its
    closest click by |Δt| in EITHER direction — the attribution
    question d7's as-of join answers only half of (as-of = most recent
    BEFORE; conversions are routinely logged seconds before the click
    lands, so backward-only matching drops them; tie → prev, stated).

    Exactness: pure integer — both candidates come from one pass of
    per-user IGNORE-NULLS running windows over the (ts, event_id) total
    order (prev = last click at-or-before, next = first click
    at-or-after), Δt in exact micros, direction by the deterministic
    ≤ rule, 10-minute integer buckets (unmatched purchases keep their
    'none' row at bucket −1).

    Scale shape: one scan filtered to the two marker types → two
    per-user windows on the SAME sort (one exchange) → bounded bucket
    agg; no join at all — the nearest-neighbor search is the window
    pass, exactly how a 1000-executor plan wants it."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    ue = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "event_id", "event_type",
        F.expr("unix_micros(ts)").alias("t"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_t = F.when(F.col("event_type") == "click", F.col("t"))
    marked = ue.select(
        "user_id", "event_type", "t",
        F.last(click_t, ignorenulls=True).over(w_prev).alias("prev_click"),
        F.first(click_t, ignorenulls=True).over(w_next).alias("next_click"),
    )
    purchases = marked.where(F.col("event_type") == "purchase").select(
        "t", "prev_click", "next_click",
        F.when(
            F.col("prev_click").isNull() & F.col("next_click").isNull(), "none"
        )
        .when(F.col("next_click").isNull(), "prev")
        .when(F.col("prev_click").isNull(), "next")
        .when(
            F.col("t") - F.col("prev_click") <= F.col("next_click") - F.col("t"),
            "prev",
        )
        .otherwise("next")
        .alias("direction"),
    )
    deltas = purchases.select(
        "direction",
        F.when(F.col("direction") == "prev", F.col("t") - F.col("prev_click"))
        .when(F.col("direction") == "next", F.col("next_click") - F.col("t"))
        .alias("delta_us"),
    )
    return (
        deltas.groupBy(
            "direction",
            F.coalesce(
                F.expr("delta_us DIV 600000000"), F.lit(-1)
            ).cast("long").alias("bucket_10min"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("delta_us").cast("long").alias("sum_delta_us"),
            F.min("delta_us").cast("long").alias("min_delta_us"),
            F.max("delta_us").cast("long").alias("max_delta_us"),
        )
        .orderBy("direction", "bucket_10min")
    )


@register(
    "b18_tombstone_scan_audit",
    oracle="""
    WITH parts AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS cells,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS tombstones
        FROM events GROUP BY 1
    ), leveled AS (
        SELECT user_id, cells, tombstones,
               CASE WHEN tombstones >= 10 THEN 'fail'
                    WHEN tombstones >= 3 THEN 'warn'
                    ELSE 'ok' END AS level
        FROM parts
    )
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(cells) AS BIGINT) AS total_cells,
           CAST(SUM(tombstones) AS BIGINT) AS total_tombstones,
           CAST(MAX(tombstones) AS BIGINT) AS max_tombstones,
           CAST(1000 * SUM(tombstones) // SUM(cells) AS BIGINT)
               AS ratio_milli
    FROM leveled GROUP BY 1 ORDER BY 1
    """,
    survey="B18,B3,B8",
)
def b18_tombstone_scan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone scan-pressure audit — Cassandra's
    tombstone_warn_threshold / tombstone_failure_threshold protection
    (a read slicing a partition must materialize every tombstone it
    crosses; past the warn level reads degrade, past the failure level
    they ABORT — the operational cliff b3's suppression semantics and
    b8's compaction GC exist to prevent): per partition (user), scanned
    cells vs tombstone markers ('error' rows, the b3 convention), rolled
    up by warn level with the thresholds scaled to this corpus (warn ≥3,
    fail ≥10 — stated contract).

    Exactness: pure integer end-to-end — cell and tombstone counts,
    closed 3-level domain, ratio as integer milli.

    Scale shape: one scan → per-partition agg (map-side combinable on
    the natural key) → 3-row level agg."""
    ev = Tables(spark, sf_dir).events
    parts = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("cells"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("tombstones"),
    )
    leveled = parts.select(
        "cells", "tombstones",
        F.when(F.col("tombstones") >= 10, "fail")
        .when(F.col("tombstones") >= 3, "warn")
        .otherwise("ok")
        .alias("level"),
    )
    return (
        leveled.groupBy("level")
        .agg(
            F.count("*").cast("long").alias("n_partitions"),
            F.sum("cells").cast("long").alias("total_cells"),
            F.sum("tombstones").cast("long").alias("total_tombstones"),
            F.max("tombstones").cast("long").alias("max_tombstones"),
            F.expr(
                "CAST(1000 * SUM(tombstones) DIV SUM(cells) AS BIGINT)"
            ).alias("ratio_milli"),
        )
        .orderBy("level")
    )


# --------------------------------------------------------------------------
# Batch 10: heavy-tail measurement (Hill estimator) and experiment-design
# closure (power-analysis sample size).
# --------------------------------------------------------------------------

_HILL_K = 100  # tail order statistics used by the Hill estimator


@register(
    "e110_hill_tail_index",
    oracle=f"""
    WITH lens AS (
        SELECT CAST(n_chars AS BIGINT) AS x FROM documents WHERE n_chars > 0
    ), topk AS (
        SELECT x, rn FROM (
            SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC) AS rn FROM lens
        ) WHERE rn <= {_HILL_K} + 1
    ), thresh AS (
        SELECT CAST(x AS BIGINT) AS xk1 FROM topk WHERE rn = {_HILL_K} + 1
    ), terms AS (
        SELECT CAST(FLOOR((ln(CAST(x AS DOUBLE)) - ln(CAST(xk1 AS DOUBLE)))
                          * 1000000) AS BIGINT) AS t_micro
        FROM topk CROSS JOIN thresh WHERE rn <= {_HILL_K}
    ), s AS (
        SELECT CAST(SUM(t_micro) AS BIGINT) AS sum_micro,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM terms
    )
    SELECT k, xk1 AS x_k1, sum_micro,
           CAST(1000 * k * 1000000 // sum_micro AS BIGINT) AS alpha_milli,
           CAST(1000000 * sum_micro // (k * 1000000) AS BIGINT)
               AS inv_alpha_micro
    FROM s CROSS JOIN thresh
    """,
    survey="E110,E20,J61",
)
def e110_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator over the document-length distribution —
    the heavy-tail EXPONENT the descriptive tier gestures at (e20's
    Pareto cut says "the top sliver holds most mass", j61's Zipf fit
    reads the VOCABULARY rank curve; Hill 1975 measures the tail itself:
    α̂ = k / Σ_{{i≤k}} ln(x_(i)/x_(k+1)) over the top-k order statistics
    — α ≤ 2 means infinite variance and every mean-based length
    statistic becomes unstable, the fact a 100 TB curation pipeline must
    know before trusting averages).

    Exactness: the top-(k+1) order statistics are deterministic (value
    DESC rank); each log-ratio term is FLOOR-micro-quantized
    (quantize-before-sum, ln parity per j101), the sum is an exact
    INTEGER, and α̂ (and its inverse, the Pareto shape's reciprocal) are
    integer milli/micro divisions of exact integers.

    Scale shape: one scan → global top-(k+1) via TakeOrderedAndProject
    (k = {_HILL_K} constant — no global sort, no unpartitioned window in
    the Spark plan; the rank is recomputed on the ≤k+1-row relation) →
    KB folds."""
    d = Tables(spark, sf_dir).documents
    lens = d.where(F.col("n_chars") > 0).select(
        F.col("n_chars").cast("long").alias("x")
    )
    topk1 = (
        lens.orderBy(F.col("x").desc())
        .limit(_HILL_K + 1)
        .localCheckpoint(eager=True)
    )
    # rank within the k+1-row relation via broadcast inequality self-join
    # over the DISTINCT-value relation (the j114 rule: never an
    # unpartitioned window, even over k+1 rows; and the above-count must
    # sum the GREATER values' multiplicities from the distinct relation —
    # joining the raw copies would multiply it by the value's own count).
    counts = topk1.groupBy("x").agg(F.count("*").alias("cnt")).localCheckpoint(
        eager=True
    )
    a = counts.select(F.col("x"), F.col("cnt"))
    b = counts.select(F.col("x").alias("xb"), F.col("cnt").alias("cntb"))
    ranked = (
        a.join(F.broadcast(b), F.col("xb") > F.col("x"), "left")
        .groupBy("x", "cnt")
        .agg(
            (F.coalesce(F.sum("cntb"), F.lit(0)) + 1).alias("rn_min"),
        )
    )
    thresh = (
        ranked.where(
            (F.col("rn_min") <= _HILL_K + 1)
            & (F.col("rn_min") + F.col("cnt") - 1 >= _HILL_K + 1)
        )
        .select(F.col("x").cast("long").alias("xk1"))
    )
    in_tail = ranked.select(
        "x",
        F.least(
            F.col("cnt"),
            F.greatest(F.lit(0), F.lit(_HILL_K) + 1 - F.col("rn_min")),
        ).alias("n_tail"),
    ).where(F.col("n_tail") > 0)
    terms = in_tail.crossJoin(F.broadcast(thresh)).select(
        (
            F.expr(
                "CAST(FLOOR((ln(CAST(x AS DOUBLE)) - ln(CAST(xk1 AS DOUBLE)))"
                " * 1000000) AS BIGINT)"
            )
            * F.col("n_tail")
        ).alias("t_micro"),
        F.col("n_tail"),
    )
    s = terms.agg(
        F.sum("t_micro").cast("long").alias("sum_micro"),
        F.sum("n_tail").cast("long").alias("k"),
    )
    return s.crossJoin(F.broadcast(thresh)).select(
        "k",
        F.col("xk1").alias("x_k1"),
        "sum_micro",
        F.expr("CAST(1000 * k * 1000000 DIV sum_micro AS BIGINT)").alias(
            "alpha_milli"
        ),
        F.expr("CAST(1000000 * sum_micro DIV (k * 1000000) AS BIGINT)").alias(
            "inv_alpha_micro"
        ),
    )


# z_{0.025} and z_{0.20} on the micro lattice (two-sided 5%, 80% power),
# Python-precomputed so neither engine evaluates a normal quantile.
_Z_ALPHA_MICRO = 1_959_963  # floor(1.959963985... * 1e6)
_Z_BETA_MICRO = 841_621     # floor(0.841621233... * 1e6)


@register(
    "e111_power_sample_size",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS x FROM events
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM cents
    )
    SELECT n, sx, sxx,
           CAST(FLOOR(2.0
                * (CAST({_Z_ALPHA_MICRO} AS DOUBLE) / 1000000
                   + CAST({_Z_BETA_MICRO} AS DOUBLE) / 1000000)
                * (CAST({_Z_ALPHA_MICRO} AS DOUBLE) / 1000000
                   + CAST({_Z_BETA_MICRO} AS DOUBLE) / 1000000)
                * (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                / (CAST(n AS DOUBLE) * (n - 1))
                / ((CAST(sx AS DOUBLE) / n / 100)
                   * (CAST(sx AS DOUBLE) / n / 100))) + 1 AS BIGINT)
               AS n_per_arm
    FROM s
    """,
    survey="E111,E52,E93",
)
def e111_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis: the per-arm sample size needed to detect a 1%
    lift in mean event value at two-sided α = 5% with 80% power —
    the EXPERIMENT-DESIGN step the testing tier presumes already
    happened (e52 tests a difference, e93 gates the randomization;
    power analysis answers "how long must the experiment RUN", the
    question every launch review asks first): n = 2(z_{{α/2}}+z_β)²σ²/δ²
    with δ = 1% of the observed mean.

    Exactness: the normal quantiles are PYTHON-precomputed micro
    constants (the e72 discipline — no engine erf⁻¹ anywhere); σ² uses
    the exact-BIGINT identity (n·Σx² − S²)/(n(n−1)) in cents; the whole
    formula is ONE shared scalar double chain over three exact integers
    and two embedded constants, ceil'd via FLOOR+1; python pin ±1.

    Scale shape: one scan → ONE 3-stat global agg → 1-row arithmetic."""
    ev = Tables(spark, sf_dir).events
    cents = ev.select(F.round(F.col("value") * 100).cast("long").alias("x"))
    s = cents.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        "n", "sx", "sxx",
        F.expr(
            f"CAST(FLOOR(2.0"
            f" * (CAST({_Z_ALPHA_MICRO} AS DOUBLE) / 1000000"
            f"    + CAST({_Z_BETA_MICRO} AS DOUBLE) / 1000000)"
            f" * (CAST({_Z_ALPHA_MICRO} AS DOUBLE) / 1000000"
            f"    + CAST({_Z_BETA_MICRO} AS DOUBLE) / 1000000)"
            f" * (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            f" / (CAST(n AS DOUBLE) * (n - 1))"
            f" / ((CAST(sx AS DOUBLE) / n / 100)"
            f"    * (CAST(sx AS DOUBLE) / n / 100))) + 1 AS BIGINT)"
        ).alias("n_per_arm"),
    )


# --------------------------------------------------------------------------
# Batch 11: errors-in-both-variables regression (Deming) and corpus
# composition diversity (Simpson / Berger-Parker).
# --------------------------------------------------------------------------


@register(
    "e112_deming_regression",
    oracle=f"""
    WITH base AS (
        SELECT CAST(n_chars AS BIGINT) AS x,
               CAST(len({_WORDS}) AS BIGINT) AS y
        FROM documents
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM base
    )
    SELECT n, sx, sy, sxx, syy, sxy,
           CAST(FLOOR((
               ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                - (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                + sqrt(((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                        - (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                       * ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                          - (CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx))
                       + 4.0 * (CAST(n AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)
                             * (CAST(n AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)))
               / (2.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)))
               * 1000000) AS BIGINT) AS slope_micro,
           CAST(FLOOR((CAST(sy AS DOUBLE) / n
               - ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                  - (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  + sqrt(((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                          - (CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx))
                         * ((CAST(n AS DOUBLE) * syy
                             - CAST(sy AS DOUBLE) * sy)
                            - (CAST(n AS DOUBLE) * sxx
                               - CAST(sx AS DOUBLE) * sx))
                         + 4.0 * (CAST(n AS DOUBLE) * sxy
                                  - CAST(sx AS DOUBLE) * sy)
                               * (CAST(n AS DOUBLE) * sxy
                                  - CAST(sx AS DOUBLE) * sy)))
                 / (2.0 * (CAST(n AS DOUBLE) * sxy
                           - CAST(sx AS DOUBLE) * sy))
                 * (CAST(sx AS DOUBLE) / n)) * 1000) AS BIGINT)
               AS intercept_milli
    FROM s
    """,
    survey="E112,E41,E51",
)
def e112_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deming (errors-in-both-variables, δ=1 orthogonal) regression of
    token count on byte length — the CALIBRATION estimator e41's OLS is
    wrong for when BOTH axes are measured with error (OLS attenuates
    the slope toward zero; Deming splits the residual orthogonally —
    the method-comparison standard in measurement science, and exactly
    the "bytes-per-token from two noisy counters" calibration a
    tokenizer-budget planner runs): slope = (S_yy − S_xx +
    √((S_yy−S_xx)² + 4S_xy²)) / (2S_xy).

    Exactness: the e41 discipline — all six sufficient statistics are
    exact BIGINTs certified by the hash; slope and intercept are ONE
    shared scalar double chain over the n-scaled centered forms
    (n·Σxy − ΣxΣy etc.), micro/milli-floored; python pin ±1.

    Scale shape: one tokenize scan → ONE 6-stat global agg → 1-row
    arithmetic."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    base = d.select(
        F.col("n_chars").cast("long").alias("x"),
        F.size(tokens(F.col("text"))).cast("long").alias("y"),
    )
    s = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    cyy = "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    cxx = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    cxy = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    slope = (
        f"(({cyy} - {cxx}"
        f" + sqrt(({cyy} - {cxx}) * ({cyy} - {cxx})"
        f"        + 4.0 * {cxy} * {cxy}))"
        f" / (2.0 * {cxy}))"
    )
    return s.select(
        "n", "sx", "sy", "sxx", "syy", "sxy",
        F.expr(f"CAST(FLOOR({slope} * 1000000) AS BIGINT)").alias("slope_micro"),
        F.expr(
            f"CAST(FLOOR((CAST(sy AS DOUBLE) / n"
            f" - {slope} * (CAST(sx AS DOUBLE) / n)) * 1000) AS BIGINT)"
        ).alias("intercept_milli"),
    )


@register(
    "j124_corpus_diversity",
    oracle="""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
        FROM documents GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_s) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(MAX(n_s) AS BIGINT) AS n_max,
               CAST(SUM(n_s * (n_s - 1)) AS BIGINT) AS pair_sum
        FROM counts
    )
    SELECT n, n_sources, n_max,
           CAST(1000 - 1000 * pair_sum // (n * (n - 1)) AS BIGINT)
               AS simpson_milli,
           CAST(1000 * n_max // n AS BIGINT) AS berger_parker_milli,
           CAST(1000 * (n * (n - 1)) // (n_sources * pair_sum) AS BIGINT)
               AS inv_simpson_evenness_milli
    FROM tot
    """,
    survey="J124,J8,J122",
)
def j124_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition diversity over sources — the ecology indices a
    mixing report quotes next to j122's budget split: Simpson's
    1 − Σn_s(n_s−1)/N(N−1) (the probability two random docs come from
    DIFFERENT sources — the unbiased finite-sample form), Berger-Parker
    dominance max n_s/N (how much the biggest source owns), and inverse-
    Simpson evenness ÷ source count (1 = perfectly balanced mix).
    Shannon entropy already has its own row; these two are the
    pure-INTEGER diversity readings (no logs at all).

    Exactness: pure integer end-to-end — source counts, the pairwise
    collision sum Σn_s(n_s−1), and all three indices as integer milli
    divisions of exact BIGINTs; python pin + the Berger-Parker ≥ 1/k
    and Simpson ∈ [0, 1) laws.

    Scale shape: one scan → per-source agg → ONE 4-stat fold → 1-row
    arithmetic."""
    d = Tables(spark, sf_dir).documents
    counts = d.groupBy("source").agg(F.count("*").cast("long").alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_sources"),
        F.max("n_s").cast("long").alias("n_max"),
        F.sum(F.col("n_s") * (F.col("n_s") - 1)).cast("long").alias("pair_sum"),
    )
    return tot.select(
        "n", "n_sources", "n_max",
        F.expr(
            "CAST(1000 - 1000 * pair_sum DIV (n * (n - 1)) AS BIGINT)"
        ).alias("simpson_milli"),
        F.expr("CAST(1000 * n_max DIV n AS BIGINT)").alias("berger_parker_milli"),
        F.expr(
            "CAST(1000 * (n * (n - 1)) DIV (n_sources * pair_sum) AS BIGINT)"
        ).alias("inv_simpson_evenness_milli"),
    )


# --------------------------------------------------------------------------
# Batch 12: cumulative-hazard estimation (Nelson-Aalen) and the dedup
# threshold-sweep curve.
# --------------------------------------------------------------------------


@register(
    "e113_nelson_aalen",
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
               CASE WHEN date_diff('day', d1, w) >= 3 THEN 1 ELSE 0 END
                   AS observed
        FROM pu CROSS JOIN wend
    ), agg AS (
        SELECT t_days,
               CAST(SUM(observed) AS BIGINT) AS events,
               CAST(COUNT(*) - SUM(observed) AS BIGINT) AS censored,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lt GROUP BY 1
    ), u AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total FROM lt
    ), risk AS (
        SELECT t_days, events, censored,
               total - CAST(COALESCE(SUM(cnt) OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS at_risk
        FROM agg CROSS JOIN u
    ), terms AS (
        SELECT t_days, at_risk, events, censored,
               CAST(1000000 * events // at_risk AS BIGINT) AS na_term_micro,
               CAST(1000000 * events // (at_risk * at_risk) AS BIGINT)
                   AS var_term_micro
        FROM risk
    )
    SELECT t_days, at_risk, events, censored, na_term_micro,
           CAST(SUM(na_term_micro) OVER (ORDER BY t_days
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS h_cum_micro,
           CAST(SUM(var_term_micro) OVER (ORDER BY t_days
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS var_cum_micro
    FROM terms ORDER BY t_days
    """,
    survey="E113,E39,E82",
)
def e113_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the SAME censored
    user-lifetime fixture as e39's Kaplan-Meier (lifetime = first→last
    event day, 3-day right-censoring rule) — the hazard-scale sibling
    every survival report shows next to the KM curve (H(t) = Σ d_i/n_i
    is additive, unbiased in small risk sets where KM's product form
    degrades, and its slope reads as the instantaneous churn RATE — the
    quantity e82's log-rank compares between groups), plus the standard
    Σ d_i/n_i² variance accumulator.

    Exactness: pure integer END-TO-END — per-time d_i/n_i and d_i/n_i²
    are FLOOR-micro-quantized integer divisions (quantize-before-sum)
    and both accumulators are exact INTEGER prefix sums; risk sets are
    the same exact-count prefix as e39, computed here via the sanctioned
    global_cumsum two-pass instead of an unpartitioned window (the
    bounded-grid exemption e39 predates).

    Scale shape: per-user reduction (the only corpus-scale stage) →
    lifetime-grid agg (calendar-bounded) → global_cumsum passes on the
    ≤|grid| relation → per-row arithmetic."""
    from cassandra_snap_to_hadoop_spark.operators.layout import global_cumsum

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
        F.sum("observed").cast("long").alias("events"),
        (F.count("*") - F.sum("observed")).cast("long").alias("censored"),
        F.count("*").cast("long").alias("cnt"),
    )
    u = lt.agg(F.count("*").cast("long").alias("total"))
    cum = global_cumsum(agg, [F.col("t_days")], "cnt", rank_col="__rk", cum_col="cumc")
    risk = cum.crossJoin(F.broadcast(u)).select(
        "t_days", "events", "censored",
        (F.col("total") - (F.col("cumc") - F.col("cnt"))).alias("at_risk"),
    )
    terms = risk.select(
        "t_days", "at_risk", "events", "censored",
        F.expr("CAST(1000000 * events DIV at_risk AS BIGINT)").alias(
            "na_term_micro"
        ),
        F.expr(
            "CAST(1000000 * events DIV (at_risk * at_risk) AS BIGINT)"
        ).alias("var_term_micro"),
    )
    h = global_cumsum(
        terms, [F.col("t_days")], "na_term_micro", rank_col="__r1", cum_col="h_cum"
    )
    hv = global_cumsum(
        h, [F.col("t_days")], "var_term_micro", rank_col="__r2", cum_col="v_cum"
    )
    return hv.select(
        "t_days", "at_risk", "events", "censored", "na_term_micro",
        F.col("h_cum").cast("long").alias("h_cum_micro"),
        F.col("v_cum").cast("long").alias("var_cum_micro"),
    ).orderBy("t_days")


@register(
    "j125_dedup_threshold_curve",
    oracle=f"""
    WITH grams AS (
        SELECT source, doc_id,
               unnest(list_distinct([array_to_string(w[i:i+1], ' ')
                                     for i in range(1, len(w))])) AS g
        FROM (SELECT source, doc_id, {_WORDS} AS w FROM documents)
        WHERE len(w) >= 2
    ), sizes AS (
        SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM grams GROUP BY 1, 2
    ), pairs AS (
        SELECT r.source, r.doc_id AS ref_id, c.doc_id AS cand_id,
               r.sz AS ref_sz, c.sz AS cand_sz
        FROM sizes r JOIN sizes c
            ON c.source = r.source AND c.doc_id = r.doc_id + 20
    ), inter AS (
        SELECT p.source, p.ref_id,
               CAST(COUNT(*) AS BIGINT) AS i_sz
        FROM pairs p
        JOIN grams rg ON rg.doc_id = p.ref_id AND rg.source = p.source
        JOIN grams cg ON cg.doc_id = p.cand_id AND cg.source = p.source
                     AND cg.g = rg.g
        GROUP BY 1, 2
    ), scored AS (
        SELECT p.source,
               CAST(1000 * COALESCE(i.i_sz, 0)
                    // (p.ref_sz + p.cand_sz - COALESCE(i.i_sz, 0))
                    AS BIGINT) AS jac_milli
        FROM pairs p LEFT JOIN inter i
            ON i.source = p.source AND i.ref_id = p.ref_id
    ), thresholds AS (
        SELECT unnest([5, 10, 25, 50, 100]) AS threshold_milli
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM scored
    )
    SELECT CAST(t.threshold_milli AS BIGINT) AS threshold_milli,
           CAST(SUM(CASE WHEN s.jac_milli >= t.threshold_milli
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pairs,
           tot.n_pairs,
           CAST(1000 * SUM(CASE WHEN s.jac_milli >= t.threshold_milli
                    THEN 1 ELSE 0 END) // tot.n_pairs AS BIGINT)
               AS dup_rate_milli
    FROM thresholds t CROSS JOIN scored s CROSS JOIN tot
    GROUP BY 1, tot.n_pairs ORDER BY 1
    """,
    survey="J125,J2,J5",
)
def j125_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-sweep curve: the pair rate at Jaccard cutoffs
    5‰…100‰ over the same-source neighbor pairs — the OPERATING-CURVE
    view the single-threshold dedup tiers (j2 at one banding point, j5
    at one cut) never show, and the first thing a curation review asks
    before committing to a threshold ('how much corpus do we lose at
    cut X vs Y?').  The sweep range is DATA-LOCKED: this synthetic
    corpus has no near-duplicate neighbors (max observed bigram Jaccard
    ≈ 0.115 at sf0.001), so cutting at the classic 0.8 would certify an
    all-zero curve with no hash discrimination — the per-mille range
    exercises every bucket.

    Exactness: pure integer end-to-end — distinct bigram shingle sets,
    exact intersection counts via the pair-bounded gram join, Jaccard
    by inclusion-exclusion 1000·|∩| DIV (|A|+|B|−|∩|), the closed
    5-threshold domain as a broadcast relation, rates as integer milli;
    zero-overlap pairs stay via the LEFT join; python replay pin + the
    curve-monotone-nonincreasing law.

    Scale shape: shingle explode (volume term) → per-doc distinct agg →
    ONE gram-equi join bounded to adjacent pairs (never corpus-wide) →
    5×|pairs| broadcast threshold scan → 5-row agg."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    w = tokens(F.col("text"))
    toks = d.select("source", "doc_id", F.posexplode(w).alias("pos", "tk"))
    nxt = toks.select(
        "source", "doc_id", (F.col("pos") - 1).alias("pos"), F.col("tk").alias("tk2")
    )
    # r11 (guide §2.4): the distinct-gram relation feeds the size agg and
    # BOTH intersection-join legs — cut once so the tokenize + posexplode
    # + adjacency-join + distinct chain runs once, not three times.
    grams = (
        toks.join(nxt, ["source", "doc_id", "pos"])
        .select("source", "doc_id", F.concat_ws(" ", "tk", "tk2").alias("g"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = grams.groupBy("source", "doc_id").agg(
        F.count("*").cast("long").alias("sz")
    )
    cand = sizes.select(
        F.col("source").alias("sc"), F.col("doc_id").alias("cand_id"),
        F.col("sz").alias("cand_sz"),
    )
    pairs = sizes.join(
        cand,
        (F.col("sc") == F.col("source"))
        & (F.col("cand_id") == F.col("doc_id") + 20),
    ).select(
        "source", F.col("doc_id").alias("ref_id"), "cand_id",
        F.col("sz").alias("ref_sz"), "cand_sz",
    ).localCheckpoint(eager=True)
    rg = grams.select(
        F.col("source").alias("sr"), F.col("doc_id").alias("rid"),
        F.col("g").alias("gr"),
    )
    cg = grams.select(
        F.col("source").alias("scg"), F.col("doc_id").alias("cid"),
        F.col("g").alias("gcol"),
    )
    inter = (
        pairs.join(rg, (F.col("sr") == F.col("source")) & (F.col("rid") == F.col("ref_id")))
        .join(
            cg,
            (F.col("scg") == F.col("source"))
            & (F.col("cid") == F.col("cand_id"))
            & (F.col("gcol") == F.col("gr")),
        )
        .groupBy("source", "ref_id")
        .agg(F.count("*").cast("long").alias("i_sz"))
    )
    scored = pairs.join(inter, ["source", "ref_id"], "left").select(
        F.expr(
            "CAST(1000 * COALESCE(i_sz, 0)"
            " DIV (ref_sz + cand_sz - COALESCE(i_sz, 0)) AS BIGINT)"
        ).alias("jac_milli")
    )
    thresholds = spark.createDataFrame(
        [(5,), (10,), (25,), (50,), (100,)], "threshold_milli long"
    )
    tot = scored.agg(F.count("*").cast("long").alias("n_pairs"))
    return (
        scored.crossJoin(F.broadcast(thresholds))
        .crossJoin(F.broadcast(tot))
        .groupBy("threshold_milli", "n_pairs")
        .agg(
            F.sum(
                F.when(F.col("jac_milli") >= F.col("threshold_milli"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_dup_pairs")
        )
        .select(
            "threshold_milli", "n_dup_pairs", "n_pairs",
            F.expr("CAST(1000 * n_dup_pairs DIV n_pairs AS BIGINT)").alias(
                "dup_rate_milli"
            ),
        )
        .orderBy("threshold_milli")
    )


# --------------------------------------------------------------------------
# Batch 13: temporal anti-join (attribution complement) and the Newcombe
# risk-difference interval (two-sample extension of e31's Wilson CI).
# --------------------------------------------------------------------------


@register(
    "d26_temporal_anti_join",
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS t,
               epoch_us(ts) // 86400000000 AS day
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT user_id, epoch_us(ts) AS t
        FROM events WHERE event_type = 'click'
    ), flagged AS (
        SELECT p.day,
               CASE WHEN EXISTS (
                   SELECT 1 FROM c
                   WHERE c.user_id = p.user_id
                     AND p.t - c.t BETWEEN 0 AND 3600000000
               ) THEN 0 ELSE 1 END AS orphan
        FROM p
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(orphan) AS BIGINT) AS n_orphan,
           CAST(1000 * SUM(orphan) // COUNT(*) AS BIGINT) AS orphan_rate_milli
    FROM flagged GROUP BY 1 ORDER BY 1
    """,
    survey="D26,D4,E26",
)
def d26_temporal_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal ANTI-join: purchases with NO click by the same user in
    the preceding hour — the attribution COMPLEMENT (d4's anti-join has
    no time dimension; e26 attributes the matched purchases; d24 finds
    the nearest match; THIS counts the unmatchable ones, the 'dark
    conversion' rate every attribution report must disclose), rolled up
    per day.

    Exactness: pure integer — micro timestamps, the [0, 1h] window as
    exact integer bounds, existence by left-anti join (Spark) == NOT
    EXISTS (oracle), daily orphan rates as integer milli.

    Scale shape: the e26 pattern — user-equi join with the range
    predicate as a residual filter (never a cross product; clicks
    co-shuffle with purchases on user_id), left_anti so matched rows
    short-circuit; calendar-bounded day agg after."""
    ev = Tables(spark, sf_dir).events
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("t"),
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.expr("unix_micros(ts)").alias("ct")
    )
    orphans = p.join(
        c,
        (F.col("cu") == F.col("user_id"))
        & (F.col("t") - F.col("ct") >= 0)
        & (F.col("t") - F.col("ct") <= 3_600_000_000),
        "left_anti",
    )
    totals = p.groupBy("day").agg(F.count("*").cast("long").alias("n_purchases"))
    orph = orphans.groupBy("day").agg(F.count("*").cast("long").alias("n_orphan"))
    return (
        totals.join(orph, "day", "left")
        .select(
            "day",
            "n_purchases",
            F.coalesce(F.col("n_orphan"), F.lit(0)).cast("long").alias("n_orphan"),
            F.expr(
                "CAST(1000 * COALESCE(n_orphan, 0) DIV n_purchases AS BIGINT)"
            ).alias("orphan_rate_milli"),
        )
        .orderBy("day")
    )


# Newcombe risk-difference interval: every double expression below is built
# from ONE shared SQL template string used verbatim by BOTH engines — the
# operation order inside the Wilson limits is part of the contract.
_NW_Z_MICRO = 1_959_963  # floor(z_{0.025} * 1e6), shared with e111
_NW_Z = f"CAST({_NW_Z_MICRO} AS DOUBLE) / 1000000"
_NW_Z2 = (
    f"CAST({_NW_Z_MICRO} AS DOUBLE) * CAST({_NW_Z_MICRO} AS DOUBLE)"
    " / 1000000000000"
)


def _nw_wilson(k: str, n: str, sign: str) -> str:
    return (
        f"(CAST({k} AS DOUBLE) + ({_NW_Z2}) / 2"
        f" {sign} ({_NW_Z}) * sqrt(CAST({k} AS DOUBLE) * ({n} - {k}) / {n}"
        f" + ({_NW_Z2}) / 4))"
        f" / ({n} + ({_NW_Z2}))"
    )


_NW_P1, _NW_P2 = "CAST(a AS DOUBLE) / n1", "CAST(c AS DOUBLE) / n2"
_NW_LO = (
    f"({_NW_P1} - {_NW_P2})"
    f" - sqrt(({_NW_P1} - {_nw_wilson('a', 'n1', '-')})"
    f" * ({_NW_P1} - {_nw_wilson('a', 'n1', '-')})"
    f" + ({_nw_wilson('c', 'n2', '+')} - {_NW_P2})"
    f" * ({_nw_wilson('c', 'n2', '+')} - {_NW_P2}))"
)
_NW_HI = (
    f"({_NW_P1} - {_NW_P2})"
    f" + sqrt(({_nw_wilson('a', 'n1', '+')} - {_NW_P1})"
    f" * ({_nw_wilson('a', 'n1', '+')} - {_NW_P1})"
    f" + ({_NW_P2} - {_nw_wilson('c', 'n2', '-')})"
    f" * ({_NW_P2} - {_nw_wilson('c', 'n2', '-')}))"
)


@register(
    "e114_newcombe_risk_diff",
    oracle=f"""
    WITH base AS (
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS e,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cells AS (
        SELECT CAST(SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN e = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN e = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM base
    )
    SELECT a, n1, c, n2,
           CAST(1000 * (a * n2 - c * n1) // (n1 * n2) AS BIGINT) AS rd_milli,
           CAST(FLOOR(({_NW_LO}) * 1000) AS BIGINT) AS ci_lo_milli,
           CAST(FLOOR(({_NW_HI}) * 1000) AS BIGINT) AS ci_hi_milli
    FROM cells
    """,
    survey="E114,E31,E106",
)
def e114_newcombe_risk_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newcombe score interval for the risk DIFFERENCE p1 − p2 (urgent
    rate, BUILDING vs other segments) — the two-sample extension of
    e31's single-proportion Wilson CI and the ADDITIVE-scale companion
    of e106's multiplicative odds ratio (a launch review reads 'how
    many points of lift', not a log-odds): Newcombe 1998 method 10
    builds the diff CI from the two Wilson limits, inheriting Wilson's
    near-nominal coverage at any proportion.

    Exactness: the 2×2 margins are ONE exact conditional aggregation;
    rd_milli = 1000·(a·n2 − c·n1) DIV (n1·n2) is pure integer; both CI
    bounds come from SQL template strings generated ONCE in Python and
    pasted verbatim into BOTH engines (the operation order inside the
    Wilson limits is the contract — a hand-transcribed copy with a
    different association would drift in the last ulp), built only from
    exact integers, the precomputed z micro constant and IEEE sqrt (no
    ln/exp/asin anywhere), milli-floored.

    Scale shape: one orders⋈customer scan → ONE 4-stat agg → 1-row
    arithmetic."""
    t = Tables(spark, sf_dir)
    base = t.orders.join(
        t.customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("e"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
    )
    cells = base.agg(
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("e") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(F.col("e") == 0, 1).otherwise(0)).cast("long").alias("n2"),
    )
    return cells.select(
        "a", "n1", "c", "n2",
        F.expr("CAST(1000 * (a * n2 - c * n1) DIV (n1 * n2) AS BIGINT)").alias(
            "rd_milli"
        ),
        F.expr(f"CAST(FLOOR(({_NW_LO}) * 1000) AS BIGINT)").alias("ci_lo_milli"),
        F.expr(f"CAST(FLOOR(({_NW_HI}) * 1000) AS BIGINT)").alias("ci_hi_milli"),
    )


# --------------------------------------------------------------------------
# Batch 14: higher-order (lambda) array-function coverage, certified
# against a purely relational oracle.
# --------------------------------------------------------------------------


@register(
    "i25_higher_order_array_funcs",
    oracle="""
    WITH q AS (
        SELECT l_orderkey AS pk, CAST(l_quantity AS BIGINT) AS v
        FROM lineitem
    ), per_row AS (
        SELECT pk, v,
               ROW_NUMBER() OVER (PARTITION BY pk ORDER BY v) AS rn,
               COUNT(*) OVER (PARTITION BY pk) AS n
        FROM q
    ), dot AS (
        SELECT a.pk, CAST(SUM(a.v * b.v) AS BIGINT) AS pal_dot
        FROM per_row a JOIN per_row b
            ON b.pk = a.pk AND b.rn = a.n - a.rn + 1
        GROUP BY 1
    ), per_order AS (
        SELECT q.pk,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(v) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN v >= 25 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ge_25,
               CAST(MAX(CASE WHEN v = 50 THEN 1 ELSE 0 END) AS BIGINT)
                   AS any_50
        FROM q GROUP BY 1
    )
    SELECT p.n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(p.total) AS BIGINT) AS sum_total,
           CAST(SUM(p.n_ge_25) AS BIGINT) AS sum_ge_25,
           CAST(SUM(p.any_50) AS BIGINT) AS n_with_50,
           CAST(SUM(d.pal_dot) AS BIGINT) AS sum_pal_dot
    FROM per_order p JOIN dot d ON d.pk = p.pk
    GROUP BY 1 ORDER BY 1
    """,
    survey="I25,I5,L1",
)
def i25_higher_order_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order (lambda) array-function coverage — aggregate /
    filter / exists / zip_with / reverse evaluated INSIDE the engine's
    lambda runtime and certified against a purely RELATIONAL oracle
    computing the same four facts per order (i5 covers the scalar array
    functions; the lambda family is a separate codegen path — Spark
    evaluates it in the interpreted HigherOrderFunction frame — and a
    coverage claim needs cross-engine evidence, not just 'it ran'):
    total = aggregate(+), count = size(filter(≥25)), flag =
    exists(=50), and the sorted-array palindrome dot product
    Σ v_(i)·v_(n+1−i) via zip_with(arr, reverse(arr), *).

    Exactness: arrays are array_sort(collect_list(...)) so the
    collect_list order nondeterminism never reaches the semantics (the
    sorted multiset pairing is well-defined under ties); every fact is
    pure BIGINT; the output folds onto the bounded n_lines grid.

    Scale shape: one scan → per-order collect (the natural key,
    map-side combinable) → per-row lambda evaluation (no shuffle) →
    ≤7-row grid agg; the oracle's windows are per-order (partitioned)."""
    li = Tables(spark, sf_dir).lineitem
    arrs = li.groupBy(F.col("l_orderkey").alias("pk")).agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("long"))).alias("arr")
    )
    facts = arrs.select(
        F.size("arr").cast("long").alias("n_lines"),
        F.expr(
            "aggregate(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("total"),
        F.expr("CAST(size(filter(arr, x -> x >= 25)) AS BIGINT)").alias("n_ge_25"),
        F.expr(
            "CAST(CASE WHEN exists(arr, x -> x = 50) THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("any_50"),
        F.expr(
            "aggregate(zip_with(arr, reverse(arr), (a, b) -> a * b),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("pal_dot"),
    )
    return (
        facts.groupBy("n_lines")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("total").cast("long").alias("sum_total"),
            F.sum("n_ge_25").cast("long").alias("sum_ge_25"),
            F.sum("any_50").cast("long").alias("n_with_50"),
            F.sum("pal_dot").cast("long").alias("sum_pal_dot"),
        )
        .orderBy("n_lines")
    )


# --------------------------------------------------------------------------
# Batch 15: ranking-stability audit (Spearman footrule between two source
# orderings).
# --------------------------------------------------------------------------


@register(
    "e115_rank_stability_footrule",
    oracle=f"""
    WITH per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({_WORDS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ), ranked AS (
        SELECT a.source, a.n_docs, a.n_tokens,
               CAST(1 + SUM(CASE WHEN b.n_docs > a.n_docs
                        OR (b.n_docs = a.n_docs AND b.source < a.source)
                        THEN 1 ELSE 0 END) AS BIGINT) AS rank_docs,
               CAST(1 + SUM(CASE WHEN b.n_tokens > a.n_tokens
                        OR (b.n_tokens = a.n_tokens AND b.source < a.source)
                        THEN 1 ELSE 0 END) AS BIGINT) AS rank_tokens
        FROM per_src a JOIN per_src b ON b.source <> a.source
        GROUP BY 1, 2, 3
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(ABS(rank_docs - rank_tokens)) AS BIGINT) AS footrule,
               CAST(MAX(ABS(rank_docs - rank_tokens)) AS BIGINT)
                   AS max_displacement
        FROM ranked
    )
    SELECT k, footrule, max_displacement,
           CAST(CASE WHEN k % 2 = 0
                THEN 1000 * footrule // ((k * k) // 2)
                ELSE 1000 * footrule // ((k * k - 1) // 2)
                END AS BIGINT) AS footrule_norm_milli
    FROM s
    """,
    survey="E115,E67,J124",
)
def e115_rank_stability_footrule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman footrule distance between the two natural source
    orderings — by document count and by token count — the
    RANK-STABILITY audit the correlation tier skips (e67's tau asks
    'are the metrics associated'; the footrule F = Σ|r1(s) − r2(s)|
    asks 'how far do the LEADERBOARDS disagree', the quantity a mixing
    dashboard that sorts sources by one metric but budgets by another
    needs — Diaconis & Graham 1977 bound it within 2× of Kendall's
    bubble-sort distance), with the max single displacement and the
    normalized form F / max-F (max-F = k²/2 for even k, (k²−1)/2 odd).

    Exactness: pure integer END-TO-END — both rankings come from ONE
    inequality self-join over the source-domain relation with the
    deterministic (metric DESC, source) tiebreak (never an
    unpartitioned window, the j114 rule), the footrule/max/normalizer
    are exact BIGINT arithmetic; python replay pin + the F ≤ max-F and
    F-is-even laws (the footrule of two permutations is always even).

    Scale shape: one tokenize scan → per-source agg → a k²-bounded
    self-join on the KB source relation → 1-row fold."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    per_src = d.select(
        "source", F.size(tokens(F.col("text"))).alias("nt")
    ).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=True)
    a = per_src.select(
        F.col("source"), F.col("n_docs"), F.col("n_tokens")
    )
    b = per_src.select(
        F.col("source").alias("sb"), F.col("n_docs").alias("db"),
        F.col("n_tokens").alias("tb"),
    )
    ranked = (
        a.join(F.broadcast(b), F.col("sb") != F.col("source"))
        .groupBy("source", "n_docs", "n_tokens")
        .agg(
            (
                1
                + F.sum(
                    F.when(
                        (F.col("db") > F.col("n_docs"))
                        | (
                            (F.col("db") == F.col("n_docs"))
                            & (F.col("sb") < F.col("source"))
                        ),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("rank_docs"),
            (
                1
                + F.sum(
                    F.when(
                        (F.col("tb") > F.col("n_tokens"))
                        | (
                            (F.col("tb") == F.col("n_tokens"))
                            & (F.col("sb") < F.col("source"))
                        ),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("rank_tokens"),
        )
    )
    s = ranked.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.abs(F.col("rank_docs") - F.col("rank_tokens")))
        .cast("long")
        .alias("footrule"),
        F.max(F.abs(F.col("rank_docs") - F.col("rank_tokens")))
        .cast("long")
        .alias("max_displacement"),
    )
    return s.select(
        "k", "footrule", "max_displacement",
        F.expr(
            "CAST(CASE WHEN k % 2 = 0"
            " THEN 1000 * footrule DIV ((k * k) DIV 2)"
            " ELSE 1000 * footrule DIV ((k * k - 1) DIV 2)"
            " END AS BIGINT)"
        ).alias("footrule_norm_milli"),
    )


# --------------------------------------------------------------------------
# Batch 16: vocabulary-health closure — per-source hapax legomena share.
# --------------------------------------------------------------------------


@register(
    "j126_hapax_ratio",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_WORDS}) AS w FROM documents
    ), wc AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2
    ), s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(c) AS BIGINT) AS tokens,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dis_legomena
        FROM wc GROUP BY 1
    )
    SELECT source, vocab, tokens, hapax, dis_legomena,
           CAST(1000 * hapax // vocab AS BIGINT) AS hapax_vocab_milli,
           CAST(1000000 * hapax // tokens AS BIGINT) AS hapax_token_micro
    FROM s ORDER BY source
    """,
    survey="J126,J113,J117",
)
def j126_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax legomena share — the vocabulary-HEALTH reading
    the global tiers imply but never localize (j113's Good-Turing runs
    on the corpus-wide trigram table: its N₁/N IS the unseen-mass
    estimate; j117's Heaps β says vocab still grows; THIS says, per
    source, what fraction of the vocabulary is single-use — the classic
    OCR-garbage / boilerplate detector: garbage inflates hapax/vocab,
    templated text collapses it), plus the dis-legomena count the
    Good-Turing r=1→2 step consumes.

    Exactness: pure integer end-to-end — per-(source, word) counts,
    vocab/token/hapax totals, and both ratios as integer milli/micro
    divisions; python Counter pin + the hapax ≤ vocab ≤ tokens chain
    law.

    Scale shape: tokenize (volume term) → (source, word) hash agg →
    per-source fold; no joins, no windows."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    tok = d.select("source", F.explode(tokens(F.col("text"))).alias("w"))
    wc = tok.groupBy("source", "w").agg(F.count("*").cast("long").alias("c"))
    s = wc.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab"),
        F.sum("c").cast("long").alias("tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("dis_legomena"),
    )
    return s.select(
        "source", "vocab", "tokens", "hapax", "dis_legomena",
        F.expr("CAST(1000 * hapax DIV vocab AS BIGINT)").alias(
            "hapax_vocab_milli"
        ),
        F.expr("CAST(1000000 * hapax DIV tokens AS BIGINT)").alias(
            "hapax_token_micro"
        ),
    ).orderBy("source")
