"""Round-9 additions — reliability/psychometrics tier plus depth
operators filling algorithm classes the registry lacked.

Batch 1 completes two families the statistics tier left open: the
EDF-statistic trio (e36 KS sup-gap, e81 CvM integrated gap — e117 adds
the Anderson-Darling TAIL-WEIGHTED gap) and the measurement-reliability
pair (e116 Cronbach's alpha for internal consistency, e119 ICC(1,1) for
absolute agreement), with e118 Krippendorff's alpha covering the
missing-data inter-rater model e96's Fleiss kappa (complete panels
only) cannot state.  Every statistic keeps the integer-lattice
discipline: n-scaled central moments, per-term micro quantization with
identical operation order in both engines, milli/micro floor divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables, fan_out
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "e116_cronbach_alpha",
    oracle="""
    WITH cells AS (
        -- (orderkey, linenumber) is NOT unique in this corpus (the
        -- b14/b17 row-version lesson): MIN-dedup each slot BEFORE the
        -- complete-block count or duplicated slots masquerade as items
        SELECT l_orderkey AS subj, l_linenumber AS item,
               CAST(MIN(l_quantity) AS BIGINT) AS x
        FROM lineitem WHERE l_linenumber <= 4 GROUP BY 1, 2
    ), complete AS (
        SELECT subj FROM cells GROUP BY 1 HAVING COUNT(*) = 4
    ), cc AS (
        SELECT cells.* FROM cells JOIN complete USING (subj)
    ), stats AS (
        SELECT CAST(COUNT(DISTINCT subj) AS BIGINT) AS n
        FROM cc
    ), item_var AS (
        SELECT CAST(SUM(nsx2) AS BIGINT) AS sum_item_var
        FROM (
            SELECT item,
                   CAST(CAST(COUNT(*) AS BIGINT) * SUM(x * x)
                        - SUM(x) * SUM(x) AS BIGINT) AS nsx2
            FROM cc GROUP BY item
        )
    ), totals AS (
        SELECT subj, CAST(SUM(x) AS BIGINT) AS t FROM cc GROUP BY 1
    ), total_var AS (
        SELECT CAST(CAST(COUNT(*) AS BIGINT) * SUM(t * t)
                    - SUM(t) * SUM(t) AS BIGINT) AS total_var
        FROM totals
    )
    SELECT n, sum_item_var, total_var,
           CASE WHEN total_var > 0
                THEN CAST(4 * 1000 * (total_var - sum_item_var)
                          // (3 * total_var) AS BIGINT)
                ELSE NULL END AS alpha_milli
    FROM stats CROSS JOIN item_var CROSS JOIN total_var
    """,
    survey="E116,E5,E49",
)
def e116_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over k = 4 'items' per subject — the INTERNAL-
    CONSISTENCY reliability coefficient (Cronbach 1951): do the k
    measurements of one subject hang together as a single scale?
    Subjects are orders carrying all four linenumbers 1..4 (the
    complete-block rule e103/e104 use), items are the line positions,
    scores are quantities.  α = k/(k−1) · (1 − Σⱼvar(itemⱼ)/var(total))
    is what every survey/labeling pipeline reports before averaging k
    redundant annotator scores into one label — the measurement model
    e100's Cohen d (effect between groups) and e96's Fleiss kappa
    (categorical agreement) do not cover.

    Exactness: with every variance written as its n-scaled integer
    numerator V = n·Σx² − (Σx)² (common n² denominator cancels in the
    ratio), α_milli = k·1000·(V_tot − ΣVⱼ) DIV ((k−1)·V_tot) is pure
    BIGINT end-to-end.  Budget: quantities ≤ 50, so V ≤ n²·2500 ≈ 1e12
    at sf0.1 and the 4000× numerator stays ≪ 2^63.  The degenerate
    all-subjects-identical case (V_tot = 0) is guarded to NULL (the
    e101 rule).

    Scale shape: one fact scan → complete-block semi join (shuffle on
    the natural l_orderkey key) → one 4-group item agg + one subject
    agg → 1-row arithmetic."""
    li = Tables(spark, sf_dir).lineitem
    cells = (
        li.where(F.col("l_linenumber") <= 4)
        .groupBy(
            F.col("l_orderkey").alias("subj"), F.col("l_linenumber").alias("item")
        )
        .agg(F.min("l_quantity").cast("long").alias("x"))
        .localCheckpoint(eager=False)
    )
    complete = cells.groupBy("subj").count().where(F.col("count") == 4).select("subj")
    # r11 (guide §2.4): cells feeds the completeness agg + the block
    # join, cc feeds three folds — cuts run the fact scan once.
    cc = cells.join(complete, "subj").localCheckpoint(eager=False)
    item_var = (
        cc.groupBy("item")
        .agg(
            (
                F.count("*").cast("long") * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            ).alias("nsx2")
        )
        .agg(F.sum("nsx2").cast("long").alias("sum_item_var"))
    )
    totals = cc.groupBy("subj").agg(F.sum("x").cast("long").alias("t"))
    total_var = totals.agg(
        (
            F.count("*").cast("long") * F.sum(F.col("t") * F.col("t"))
            - F.sum("t") * F.sum("t")
        ).alias("total_var")
    )
    n = cc.agg(F.countDistinct("subj").cast("long").alias("n"))
    return (
        n.crossJoin(F.broadcast(item_var))
        .crossJoin(F.broadcast(total_var))
        .select(
            "n", "sum_item_var", "total_var",
            F.expr(
                "CASE WHEN total_var > 0"
                " THEN CAST(4 * 1000 * (total_var - sum_item_var)"
                "      DIV (3 * total_var) AS BIGINT)"
                " ELSE NULL END"
            ).alias("alpha_milli"),
        )
    )


# e117's per-value AD term: ONE template instantiated verbatim in both
# engines (the e114 rule).  z = cuma·m − cumb·n is the exact BIGINT ECDF
# cross-product (e81's gap); the tail weight splits as (z/i)·(z/(N−i))
# so double magnitudes stay ~N·m and the op order is pinned.
_E117_TERM = (
    # CAST AS DOUBLE, never `* 1.0`: Spark parses a bare 1.0 literal as
    # DECIMAL(2,1) and silently switches the chain to decimal arithmetic
    # (the e84 lesson), where DuckDB's 1.0 is DOUBLE.
    "CAST(ROUND((ca + cb)"
    " * (CAST(cuma * m - cumb * n AS DOUBLE) / cumn)"
    " * (CAST(cuma * m - cumb * n AS DOUBLE) / (n + m - cumn))"
    " * 1000000) AS BIGINT)"
)


@register(
    "e117_anderson_darling",
    oracle=f"""
    WITH counts AS (
        SELECT n_chars AS v,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cb
        FROM documents GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS n, CAST(SUM(cb) AS BIGINT) AS m
        FROM counts
    ), cum AS (
        SELECT v, ca, cb,
               SUM(ca) OVER (ORDER BY v) AS cuma,
               SUM(cb) OVER (ORDER BY v) AS cumb,
               SUM(ca + cb) OVER (ORDER BY v) AS cumn
        FROM counts
    ), terms AS (
        SELECT {_E117_TERM} AS t_micro
        FROM cum CROSS JOIN tot
        WHERE cumn < n + m
    )
    SELECT n, m,
           CAST(SUM(t_micro) AS BIGINT) AS ad_sum_micro,
           CAST(SUM(t_micro) // (n * m) AS BIGINT) AS ad_micro
    FROM terms CROSS JOIN tot
    GROUP BY n, m
    """,
    survey="E117,E81,E36",
)
def e117_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling drift statistic between the English
    corpus slice and the rest (n_chars distributions) — completing the
    EDF trio: e36's KS sees the single worst gap, e81's CvM weighs every
    gap equally, AD up-weights gaps by 1/(H(1−H)) so TAIL drift (where
    few observations live) registers long before KS/CvM move — the
    standard choice when distribution shifts hit the extremes first.

    Statistic: A² = (1/(nm)) Σ_g c_g·z_g²/(i_g·(N−i_g)) over the pooled
    distinct-value grid (Pettitt 1976's two-sample form under the
    right-continuous tie convention: i = pooled cumulative count at each
    group end, z = cuma·m − cumb·n the exact integer ECDF cross-product,
    the last group excluded as its weight is 0/0).

    Exactness: z is BIGINT-exact (e81's gap); each term is ONE shared
    double template c·(z/i)·(z/(N−i)) with pinned operation order,
    micro-rounded per value and summed as integers; the final DIV(n·m)
    is pure integer.  Double magnitudes stay ≤ ~N·m ≈ 2.5e7 at sf0.1 —
    far inside the 2^53 exact-integer window.

    Scale shape: e81's exactly — one corpus scan → per-distinct-value
    count agg; the cumulative window runs over the domain-bounded
    n_chars grid (the e36 exemption class); everything after is KB."""
    d = Tables(spark, sf_dir).documents
    counts = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
        .cast("long")
        .alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("long").alias("n"), F.sum("cb").cast("long").alias("m")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "v", "ca", "cb",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
        F.sum(F.col("ca") + F.col("cb")).over(w).alias("cumn"),
    )
    terms = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("cumn") < F.col("n") + F.col("m"))
        .select(F.expr(_E117_TERM).alias("t_micro"), "n", "m")
    )
    return terms.groupBy("n", "m").agg(
        F.sum("t_micro").cast("long").alias("ad_sum_micro"),
        F.expr("CAST(SUM(t_micro) DIV (n * m) AS BIGINT)").alias("ad_micro"),
    ).select("n", "m", "ad_sum_micro", "ad_micro")


@register(
    "e118_krippendorff_alpha",
    oracle="""
    WITH ratings AS (
        SELECT l_orderkey AS unit, l_returnflag AS c
        FROM lineitem WHERE l_linenumber <= 3
    ), mu AS (
        SELECT unit, CAST(COUNT(*) AS BIGINT) AS m_u FROM ratings GROUP BY 1
    ), pairable AS (
        SELECT r.unit, r.c, m.m_u FROM ratings r JOIN mu m USING (unit)
        WHERE m.m_u >= 2
    ), unit_cat AS (
        SELECT unit, c, m_u, CAST(COUNT(*) AS BIGINT) AS n_uc
        FROM pairable GROUP BY 1, 2, 3
    ), do_terms AS (
        -- per-unit observed DISAGREEMENT mass on the micro lattice:
        -- pairs of unequal categories = m_u(m_u-1) - sum_c n_uc(n_uc-1),
        -- normalized by (m_u - 1) per Krippendorff's coincidence matrix
        SELECT unit,
               CAST(1000000 * (MAX(m_u) * (MAX(m_u) - 1)
                               - SUM(n_uc * (n_uc - 1)))
                    // (MAX(m_u) - 1) AS BIGINT) AS do_micro
        FROM unit_cat GROUP BY unit
    ), do_sum AS (
        SELECT CAST(SUM(do_micro) AS BIGINT) AS do_total FROM do_terms
    ), marg AS (
        SELECT c, CAST(SUM(n_uc) AS BIGINT) AS n_c FROM unit_cat GROUP BY 1
    ), de AS (
        SELECT CAST(SUM(n_c) AS BIGINT) AS n_tot,
               CAST(SUM(n_c) * SUM(n_c) - SUM(n_c * n_c) AS BIGINT) AS de_num
        FROM marg
    )
    SELECT n_tot, do_total, de_num,
           -- 1000·Do·(n−1) DIV (1e6·De) folded to Do·(n−1) DIV (1e3·De):
           -- exactly equal (the 1000/1e6 cancels) and the product stays
           -- ≤ ~2e17 at sf0.1 where the unfolded form overflows int64.
           CASE WHEN de_num > 0
                THEN CAST(1000 - do_total * (n_tot - 1)
                          // (1000 * de_num) AS BIGINT)
                ELSE NULL END AS alpha_milli
    FROM do_sum CROSS JOIN de
    """,
    survey="E118,E96,E53",
)
def e118_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal metric) over units with MISSING
    ratings — the inter-rater reliability model e96's Fleiss kappa
    cannot state: Fleiss needs every unit rated by the same number of
    raters, Krippendorff pairs whatever ratings exist per unit (units =
    orders, raters = line positions 1..3, category = return flag; units
    with < 2 ratings drop as unpairable — exactly the real labeling-
    pipeline situation where annotator panels are ragged).

    α = 1 − D_o/D_e on the coincidence lattice: per-unit observed
    disagreement (m_u(m_u−1) − Σ_c n_uc(n_uc−1)) / (m_u−1) accumulates
    micro-quantized (the e105 per-term rule — the only division with a
    unit-varying denominator), expected disagreement from the pooled
    marginals ((Σn_c)² − Σn_c²) / (n−1), and
    α_milli = 1000 − D_o·(n−1) DIV (1000·D_e-numerator) folds the two
    exact integers (the 1000/1e6 scaling cancels exactly, keeping the
    product ≤ ~2e17 at sf0.1 where the unfolded form overflows).
    Degenerate single-category data (D_e = 0) guards to NULL.

    Scale shape: one fact scan → per-unit agg (natural-key shuffle) →
    per-(unit,category) agg → two KB aggs → 1-row arithmetic."""
    li = Tables(spark, sf_dir).lineitem
    ratings = li.where(F.col("l_linenumber") <= 3).select(
        F.col("l_orderkey").alias("unit"), F.col("l_returnflag").alias("c")
    )
    mu = ratings.groupBy("unit").agg(F.count("*").cast("long").alias("m_u"))
    pairable = ratings.join(mu.where(F.col("m_u") >= 2), "unit")
    unit_cat = pairable.groupBy("unit", "c", "m_u").agg(
        F.count("*").cast("long").alias("n_uc")
    )
    do_sum = (
        unit_cat.groupBy("unit")
        .agg(
            F.expr(
                "CAST(1000000 * (MAX(m_u) * (MAX(m_u) - 1)"
                " - SUM(n_uc * (n_uc - 1)))"
                " DIV (MAX(m_u) - 1) AS BIGINT)"
            ).alias("do_micro")
        )
        .agg(F.sum("do_micro").cast("long").alias("do_total"))
    )
    de = unit_cat.groupBy("c").agg(F.sum("n_uc").cast("long").alias("n_c")).agg(
        F.sum("n_c").cast("long").alias("n_tot"),
        (F.sum("n_c") * F.sum("n_c") - F.sum(F.col("n_c") * F.col("n_c")))
        .cast("long")
        .alias("de_num"),
    )
    return do_sum.crossJoin(F.broadcast(de)).select(
        "n_tot", "do_total", "de_num",
        F.expr(
            "CASE WHEN de_num > 0"
            " THEN CAST(1000 - do_total * (n_tot - 1)"
            "      DIV (1000 * de_num) AS BIGINT)"
            " ELSE NULL END"
        ).alias("alpha_milli"),
    )


@register(
    "e119_icc_oneway",
    oracle="""
    WITH cells AS (
        -- MIN-dedup per (subj, slot) first — the b14/b17 lesson; the
        -- deduped slot scores are the ratings
        SELECT l_orderkey AS subj, l_linenumber AS item,
               CAST(MIN(l_quantity) AS BIGINT) AS x
        FROM lineitem WHERE l_linenumber <= 4 GROUP BY 1, 2
    ), complete AS (
        SELECT subj FROM cells GROUP BY 1 HAVING COUNT(*) = 4
    ), cc AS (
        SELECT cells.* FROM cells JOIN complete USING (subj)
    ), per_subj AS (
        SELECT subj, CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS s2
        FROM cc GROUP BY 1
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS g,
               CAST(SUM(s2) AS BIGINT) AS g2,
               CAST(SUM(s * s) AS BIGINT) AS ss
        FROM per_subj
    ), ms AS (
        -- n-scaled integer sums of squares, k = 4 raters per subject:
        -- SSB·4n = n·ss − g², SSW·4n = 4n·g2 − n·ss; MSB = SSB/(n−1),
        -- MSW = SSW/(n(k−1)) — carried as exact integer numerators over
        -- the SHARED 4n denominator, which cancels in the ICC ratio.
        SELECT n, g, g2, ss,
               (n * ss - g * g) AS ssb4n,
               (4 * n * g2 - n * ss) AS ssw4n
        FROM stats
    )
    SELECT n, ssb4n, ssw4n,
           -- Lattice-budget gate (ADVICE r9): NULL out (loudly, in BOTH
           -- engines) when 1000·3n·A or 1000·3(n−1)·B could leave int64
           -- — Spark with ANSI off would wrap SILENTLY where DuckDB
           -- raises, so the guard must fire before either happens.
           CASE WHEN ssb4n <= 4600000000000000 // (3 * n)
                 AND ssw4n <= 4600000000000000 // (3 * GREATEST(n - 1, 1))
                 AND 3 * n * ssb4n + 3 * (n - 1) * ssw4n > 0
                THEN CAST(1000 * (3 * n * ssb4n - (n - 1) * ssw4n)
                          // (3 * n * ssb4n + 3 * (n - 1) * ssw4n)
                     AS BIGINT)
                ELSE NULL END AS icc_milli
    FROM ms
    """,
    survey="E119,E49,E116",
)
def e119_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1,1) — the one-way random-effects intraclass correlation
    (Shrout & Fleiss 1979 case 1): how much of a single rating's
    variance is the SUBJECT rather than the rater draw?  Same complete-
    block fixture as e116 (orders with all 4 line positions, quantity
    scores) but the opposite reading: Cronbach asks whether the k items
    agree as a scale (consistency), ICC asks how reliable ONE rating is
    in absolute terms — the statistic behind 'do we need all 4
    annotators or is 1 enough'.

    ICC = (MSB − MSW)/(MSB + (k−1)·MSW) with MSB = SSB/(n−1) and
    MSW = SSW/(n(k−1)).  On the n-scaled lattice A = SSB·4n = n·Σs² − G²
    and B = SSW·4n = 4n·Σx² − n·Σs² are exact BIGINTs; putting MSB and
    3·MSW over the shared 12n²(n−1) denominator gives
    icc_milli = 1000·(3n·A − (n−1)·B) DIV (3n·A + 3(n−1)·B) — pure
    integer, zero-variance data guarded to NULL.  Budget: A ≤ n²·200²
    (A carries n²), so the 1000-scaled terms leave int64 past tens of
    thousands of complete blocks — and Spark with ANSI off would WRAP
    silently where DuckDB raises, an asymmetric failure (wrong numbers,
    not a loud error).  Both engines therefore carry an explicit
    lattice-budget gate (ADVICE r9): icc_milli is NULL unless
    A ≤ 4.6e15/(3n) and B ≤ 4.6e15/(3(n−1)), which keeps every product
    (including the ×1000) inside int64 by construction.  At sf0.1 the
    actual magnitudes sit orders under the gate; past it, drop the
    per-subject scores to a coarser lattice or divide A, B by
    GCD(n, ·) first — the gate makes the exhaustion loud instead of
    silent.

    Scale shape: e116's — one fact scan → complete-block semi join →
    per-subject agg → ONE 4-stat global agg → 1-row arithmetic."""
    li = Tables(spark, sf_dir).lineitem
    cells = (
        li.where(F.col("l_linenumber") <= 4)
        .groupBy(
            F.col("l_orderkey").alias("subj"), F.col("l_linenumber").alias("item")
        )
        .agg(F.min("l_quantity").cast("long").alias("x"))
        .localCheckpoint(eager=False)
    )
    complete = cells.groupBy("subj").count().where(F.col("count") == 4).select("subj")
    # r11 (guide §2.4): cells feeds the completeness agg + the block
    # join — cut so the fact scan + cell agg run once.
    cc = cells.join(complete, "subj")
    per_subj = cc.groupBy("subj").agg(
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    stats = per_subj.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("g"),
        F.sum("s2").cast("long").alias("g2"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("ss"),
    )
    return stats.select(
        "n",
        F.expr("n * ss - g * g").alias("ssb4n"),
        F.expr("4 * n * g2 - n * ss").alias("ssw4n"),
    ).select(
        "n", "ssb4n", "ssw4n",
        F.expr(
            # lattice-budget gate mirrored from the oracle (ADVICE r9):
            # with ANSI off Spark WRAPS on int64 overflow where DuckDB
            # raises — gate both engines to NULL before either can
            "CASE WHEN ssb4n <= 4600000000000000 DIV (3 * n)"
            " AND ssw4n <= 4600000000000000 DIV (3 * GREATEST(n - 1, 1))"
            " AND 3 * n * ssb4n + 3 * (n - 1) * ssw4n > 0"
            " THEN CAST(1000 * (3 * n * ssb4n - (n - 1) * ssw4n)"
            "      DIV (3 * n * ssb4n + 3 * (n - 1) * ssw4n) AS BIGINT)"
            " ELSE NULL END"
        ).alias("icc_milli"),
    )


@register(
    "j127_ngram_decontamination",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, doc_id % 10 = 7 AS is_eval,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS w
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, source, is_eval,
               unnest([array_to_string(w[i:i+7], ' ')
                       for i in range(1, greatest(len(w) - 6, 1))]) AS s
        FROM t WHERE len(w) >= 8
    ), ev AS (
        SELECT DISTINCT s FROM sh WHERE is_eval
    ), hits AS (
        SELECT DISTINCT sh.doc_id, sh.source
        FROM sh JOIN ev USING (s) WHERE NOT is_eval
    ), collide AS (
        SELECT CAST(COUNT(DISTINCT sh.s) AS BIGINT) AS n_collision_grams
        FROM sh JOIN ev USING (s) WHERE NOT is_eval
    ), train AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train
        FROM t WHERE NOT is_eval GROUP BY 1
    )
    SELECT train.source, n_train,
           CAST(COALESCE(h.n_cont, 0) AS BIGINT) AS n_contaminated,
           CAST(1000000 * COALESCE(h.n_cont, 0) // n_train AS BIGINT)
               AS cont_ppm,
           n_collision_grams
    FROM train
    LEFT JOIN (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_cont
        FROM hits GROUP BY 1
    ) h USING (source)
    CROSS JOIN collide
    """,
    survey="J127,J69,J5",
)
def j127_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-gram train/eval decontamination (the GPT-3 appendix-C /
    Dolma rule): a training document is CONTAMINATED if it shares any
    verbatim 8-gram with the held-out eval split (doc_id % 10 == 7, the
    j12 deterministic-split discipline).  This is the n-gram EXACT
    counterpart of j69's embedding decontamination — embedding decon
    catches paraphrases but misses verbatim substrings below the cosine
    radius; every production pipeline runs BOTH.

    Semantics: per-doc DISTINCT 8-grams over the shared _NORM
    tokenization (lower + whitespace collapse — the j6/j60 rule), eval
    gram set ∪, train docs flagged by one semi join; output = per-source
    train counts, contaminated counts, ppm rate, plus the global
    distinct collision-gram count.  On this corpus 6/450 train docs
    collide at sf0.01 — a discriminating fixture (the j125 zero-count
    lesson is why this was checked BEFORE registration).

    Scale shape: tokenize scan → per-doc distinct-gram explode (shuffle
    on gram) → eval-set semi join (the eval side is the SMALL side —
    broadcast at production scale; AQE picks it here) → per-source agg.
    At 100 TB the gram relation is the volume term and the semi join is
    the one shuffle — exactly j69's banded-LSH plan with grams for
    bands."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    t = d.select(
        "doc_id", "source",
        (F.col("doc_id") % 10 == 7).alias("is_eval"),
        tokens(F.col("text")).alias("w"),
    )
    grams = F.expr(
        "transform(sequence(1, size(w) - 7),"
        " i -> concat_ws(' ', slice(w, i, 8)))"
    )
    # r11 (guide §3.3): train_hits (the tiny colliding subset) is consumed
    # TWICE (hits and collide), each re-deriving the whole gram semi join —
    # checkpoint it so the expensive subtree runs once.  The gram relation
    # itself (sh) deliberately does NOT checkpoint: materializing the
    # heavy 8-gram strings buys little over the pipelined re-derivation
    # (isolated noop medians at sf0.1: 4.4 s original, ~2.7 s with this
    # checkpoint, within noise of also checkpointing sh — the §8 "don't
    # move heavy payloads" lesson applied to a cache decision).
    sh = (
        t.where(F.size("w") >= 8)
        .select("doc_id", "source", "is_eval", F.explode(grams).alias("s"))
        .distinct()
    )
    ev = sh.where(F.col("is_eval")).select("s").distinct()
    train_hits = (
        sh.where(~F.col("is_eval")).join(ev, "s").localCheckpoint(eager=False)
    )
    hits = train_hits.select("doc_id", "source").distinct()
    collide = train_hits.agg(
        F.countDistinct("s").cast("long").alias("n_collision_grams")
    )
    train = (
        t.where(~F.col("is_eval"))
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_train"))
    )
    h = hits.groupBy("source").agg(F.count("*").cast("long").alias("n_cont"))
    return (
        train.join(h, "source", "left")
        .select(
            "source", "n_train",
            F.coalesce(F.col("n_cont"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.expr(
                "CAST(1000000 * COALESCE(n_cont, 0) DIV n_train AS BIGINT)"
            ).alias("cont_ppm"),
        )
        .crossJoin(F.broadcast(collide))
    )


@register(
    "b19_hinted_handoff",
    oracle="""
    WITH muts AS (
        SELECT l_orderkey AS pk, l_linenumber AS ck,
               CAST(l_orderkey % 3 AS BIGINT) AS replica,
               (epoch_us(l_shipdate) // 86400000000) % 100 AS phase,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), classified AS (
        SELECT *,
               CASE replica WHEN 0 THEN 10 WHEN 1 THEN 30 ELSE 50 END AS o_start,
               CASE replica WHEN 0 THEN 12 WHEN 1 THEN 38 ELSE 65 END AS o_end
        FROM muts
    ), status AS (
        SELECT pk, ck, replica, phase, cents,
               CASE WHEN phase < o_start OR phase >= o_end THEN 'direct'
                    WHEN o_end - phase <= 5 THEN 'hinted'
                    ELSE 'dropped' END AS st
        FROM classified
    ), winners AS (
        SELECT replica, pk, ck,
               MAX(ROW(phase, cents)) AS win
        FROM status GROUP BY 1, 2, 3
    ), stale AS (
        SELECT s.replica, CAST(COUNT(DISTINCT (s.pk, s.ck)) AS BIGINT) AS stale_keys
        FROM status s JOIN winners w
          ON w.replica = s.replica AND w.pk = s.pk AND w.ck = s.ck
         AND ROW(s.phase, s.cents) = w.win
        WHERE s.st = 'dropped'
        GROUP BY 1
    )
    SELECT status.replica,
           CAST(SUM(CASE WHEN st = 'direct' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_direct,
           CAST(SUM(CASE WHEN st = 'hinted' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hinted,
           CAST(SUM(CASE WHEN st = 'dropped' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           CAST(COALESCE(MAX(stale.stale_keys), 0) AS BIGINT) AS stale_keys
    FROM status LEFT JOIN stale USING (replica)
    GROUP BY 1 ORDER BY 1
    """,
    survey="B19,B2,B14",
)
def b19_hinted_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hinted handoff accounting — the Cassandra availability mechanism
    the B family still lacked (next to b14's Merkle repair and b15's
    read repair): writes targeting a DOWN replica are stored as hints on
    the coordinator and replayed when the replica returns, but only
    hints younger than max_hint_window survive; older writes are LOST
    until repair.  Mutations are lineitem rows keyed (orderkey,
    linenumber); replica = orderkey % 3; each replica has a
    deterministic outage window on the 100-day phase lattice (r0
    [10,12): shorter than the 5-day hint window → fully recovered; r1
    [30,38) and r2 [50,65): longer → early-outage writes drop).  A hint
    written at phase p inside [start, end) is REPLAYED iff end − p ≤ 5.

    Output per replica: direct / hinted / dropped mutation counts plus
    the CONSISTENCY damage: stale_keys = keys whose LWW-winning mutation
    (max (phase, cents) — the b2 priority rule) was dropped, i.e. keys a
    read at that replica would serve stale until b14's repair runs.
    Pure integer phases; the cents tiebreak makes the winner
    deterministic and identical in both engines.

    Scale shape: one fact scan → per-mutation CASE classification (no
    join — outage windows are CASE constants) → per-key max_by agg
    (natural-key shuffle) → per-replica fold; at 100 TB the only volume
    terms are the scan and the one key agg."""
    li = Tables(spark, sf_dir).lineitem
    muts = li.select(
        F.col("l_orderkey").alias("pk"),
        F.col("l_linenumber").alias("ck"),
        (F.col("l_orderkey") % 3).cast("long").alias("replica"),
        (F.expr("unix_micros(l_shipdate) DIV 86400000000") % 100).alias("phase"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    status = muts.select(
        "*",
        F.expr(
            "CASE WHEN phase < (CASE replica WHEN 0 THEN 10 WHEN 1 THEN 30"
            "                   ELSE 50 END)"
            "       OR phase >= (CASE replica WHEN 0 THEN 12 WHEN 1 THEN 38"
            "                    ELSE 65 END) THEN 'direct'"
            "     WHEN (CASE replica WHEN 0 THEN 12 WHEN 1 THEN 38 ELSE 65 END)"
            "          - phase <= 5 THEN 'hinted'"
            "     ELSE 'dropped' END"
        ).alias("st"),
    )
    winners = status.groupBy("replica", "pk", "ck").agg(
        F.max(F.struct("phase", "cents")).alias("win")
    )
    stale = (
        status.where(F.col("st") == "dropped")
        .join(winners, ["replica", "pk", "ck"])
        .where(F.struct("phase", "cents") == F.col("win"))
        .groupBy("replica")
        .agg(F.countDistinct("pk", "ck").cast("long").alias("stale_keys"))
    )
    return (
        status.groupBy("replica")
        .agg(
            F.sum(F.when(F.col("st") == "direct", 1).otherwise(0))
            .cast("long")
            .alias("n_direct"),
            F.sum(F.when(F.col("st") == "hinted", 1).otherwise(0))
            .cast("long")
            .alias("n_hinted"),
            F.sum(F.when(F.col("st") == "dropped", 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
        )
        .join(stale, "replica", "left")
        .select(
            "replica", "n_direct", "n_hinted", "n_dropped",
            F.coalesce(F.col("stale_keys"), F.lit(0))
            .cast("long")
            .alias("stale_keys"),
        )
        .orderBy("replica")
    )


@register(
    "d27_bitemporal_asof",
    oracle="""
    WITH versions AS (
        SELECT l_suppkey AS k,
               epoch_us(l_shipdate) // 86400000000 AS valid_from,
               epoch_us(l_shipdate) // 86400000000
                   + l_orderkey % 30 AS tx_from,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), spans AS (
        SELECT k, MIN(valid_from) AS lo, MAX(valid_from) AS hi
        FROM versions GROUP BY 1
    ), probes AS (
        SELECT k, p.p AS probe_id,
               lo + (hi - lo) * (p.p + 1) // 4 AS t,
               lo + (hi - lo) * (p.p + 1) // 4 + 10 * p.p AS tx_asof
        FROM spans, (SELECT unnest(range(0, 3)) AS p) p
    ), picked AS (
        SELECT p.k, p.probe_id, p.t, p.tx_asof,
               MAX({'valid_from': v.valid_from, 'tx_from': v.tx_from,
                    'cents': v.cents}) AS win
        FROM probes p
        JOIN versions v
          ON v.k = p.k AND v.valid_from <= p.t AND v.tx_from <= p.tx_asof
        GROUP BY 1, 2, 3, 4
    )
    SELECT probes.k, probes.probe_id, probes.t, probes.tx_asof,
           CAST(picked.win.valid_from AS BIGINT) AS picked_valid,
           CAST(picked.win.tx_from AS BIGINT) AS picked_tx,
           CAST(picked.win.cents AS BIGINT) AS picked_cents
    FROM probes LEFT JOIN picked
      ON picked.k = probes.k AND picked.probe_id = probes.probe_id
    """,
    survey="D27,D19,D7",
)
def d27_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of join (Snodgrass's two-axis temporal model) — the
    join class d19's PIT/SCD2 (ONE time axis) cannot state: every
    version carries a VALID time (when the price became effective) and a
    TRANSACTION time (when the system learned it, here valid + a 0-29
    day correction lag from the order key), and a query is a PAIR
    (t, T): "what did we believe at transaction time T the value
    effective at t was?"  Late-arriving corrections (tx ≫ valid) are
    exactly what makes the two axes non-interchangeable — an as-of on
    valid time alone silently reads corrections that had not arrived.

    Per (supplier, probe): among versions with valid ≤ t AND tx ≤ T,
    pick max (valid, tx, cents) lexicographic — latest effective, then
    latest learned, the cents tiebreak making duplicates deterministic.
    Probes are the supplier's valid-span quartiles with staggered
    transaction horizons (T = t + 10·probe_id), so probe 0 reads with
    ZERO correction visibility and probe 2 with 20 days — the output
    shows the same t flipping value as T advances, the bitemporal
    signature.  LEFT join keeps probes with no visible version (NULLs).

    Scale shape: versions scan → per-key span agg → 3-probe explode
    (KB per key) → one range-predicate join on the EQUI key k (the
    d6/d19 rule: equi key carries the shuffle, ranges filter inside the
    key group) → max_by agg.  Probe count is constant; volume term is
    the one key-partitioned join."""
    li = Tables(spark, sf_dir).lineitem
    versions = li.select(
        F.col("l_suppkey").alias("k"),
        F.expr("unix_micros(l_shipdate) DIV 86400000000").alias("valid_from"),
        (
            F.expr("unix_micros(l_shipdate) DIV 86400000000")
            + F.col("l_orderkey") % 30
        ).alias("tx_from"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    spans = versions.groupBy("k").agg(
        F.min("valid_from").alias("lo"), F.max("valid_from").alias("hi")
    )
    probes = spans.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("probe_id"), "lo", "hi"
    ).select(
        "k",
        F.col("probe_id").cast("long").alias("probe_id"),
        F.expr("lo + (hi - lo) * (probe_id + 1) DIV 4").alias("t"),
        F.expr(
            "lo + (hi - lo) * (probe_id + 1) DIV 4 + 10 * probe_id"
        ).alias("tx_asof"),
    )
    picked = (
        probes.join(
            versions.select(
                F.col("k").alias("vk"), "valid_from", "tx_from", "cents"
            ),
            (F.col("vk") == F.col("k"))
            & (F.col("valid_from") <= F.col("t"))
            & (F.col("tx_from") <= F.col("tx_asof")),
        )
        .groupBy("k", "probe_id")
        .agg(F.max(F.struct("valid_from", "tx_from", "cents")).alias("win"))
    )
    return probes.join(picked, ["k", "probe_id"], "left").select(
        "k", "probe_id", "t", "tx_asof",
        F.col("win.valid_from").cast("long").alias("picked_valid"),
        F.col("win.tx_from").cast("long").alias("picked_tx"),
        F.col("win.cents").cast("long").alias("picked_cents"),
    )


# f51's sign-aware squared threshold comparison: ONE template for both
# engines (the e114 rule).  Symbol 'a'/'c' iff the segment deviation
# d = n*seg_sum - S*c clears the +-beta*sigma breakpoint, compared in
# squares on the integer lattice: 1e6*d^2 vs BETA2_PPM*c^2*V where
# V = n*Q - S^2 is the n^2-scaled variance numerator (both sides share
# the (n*c)^2 denominator, which cancels).
_F51_BETA2_PPM = 185_526  # (0.4307272993)^2, the alphabet-3 Gaussian breakpoint
_F51_SYMBOL = (
    "CASE WHEN d < 0 AND 1000000 * d * d > {b2} * c * c * v THEN 'a'"
    "     WHEN d > 0 AND 1000000 * d * d > {b2} * c * c * v THEN 'c'"
    "     ELSE 'b' END"
).format(b2=_F51_BETA2_PPM)


@register(
    "f51_sax_symbolization",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value) AS BIGINT))
                    // COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), numbered AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM daily
    ), stats AS (
        SELECT event_type, MAX(n) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS q
        FROM numbered GROUP BY 1
    ), segs AS (
        SELECT event_type, ((rn - 1) * 6) // n AS seg,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(x) AS BIGINT) AS seg_sum
        FROM numbered GROUP BY 1, 2
    ), scored AS (
        SELECT segs.event_type, seg, c,
               stats.n * seg_sum - stats.s * c AS d,
               stats.n * stats.q - stats.s * stats.s AS v
        FROM segs JOIN stats USING (event_type)
    )
    SELECT event_type, CAST(seg AS BIGINT) AS seg, c, d, v,
           {_F51_SYMBOL} AS symbol
    FROM scored
    """,
    survey="F51,F28,E5",
)
def f51_sax_symbolization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin/Keogh 2003) — PAA segment means discretized
    against Gaussian breakpoints into a 3-letter alphabet, the standard
    symbolic time-series representation behind motif discovery and
    HOT-SAX anomaly search; a class (symbolic discretization) the F
    family lacked next to decomposition (f28), smoothing (f30) and
    changepoints (f33).  Per event type the ~30-day daily-mean series
    splits into 6 PAA segments (seg = (rn−1)·6 DIV n — the f21 edge
    rule), and each segment symbolizes by where its mean sits against
    μ ± 0.4307·σ (the alphabet-3 equiprobable Gaussian cuts).

    Exactness: σ is irrational, so the comparison moves to SQUARES on
    the integer lattice — d = n·seg_sum − S·c (the (n·c)-scaled segment
    deviation) against β²·c²·V with V = n·Q − S² (the n²-scaled variance
    numerator; the shared (n·c)² denominator cancels), β² injected as
    the 185526 ppm constant (the e72 injected-constant rule) — one
    sign-aware template in both engines, pure BIGINT.  Boundary flips
    would need the exact rational d²/(c²V) to hit β² to 6 decimals —
    checked absent on this data at all three SFs by the mirror.  Budget:
    daily means ≤ ~600, so 1e6·d² ≲ 6e16 and β²·c²·V ≲ 1e15 ✓.

    Scale shape: one scan → daily agg → per-type windows over the
    calendar-bounded daily relation (the e36 exemption class) → one
    6-row-per-type fold; everything after the daily agg is KB."""
    ev = Tables(spark, sf_dir).events
    daily = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(value) AS BIGINT)) DIV COUNT(*) AS BIGINT)"
        ).alias("x")
    )
    from pyspark.sql.window import Window

    wt = Window.partitionBy("event_type")
    numbered = daily.select(
        "event_type", "x",
        F.row_number().over(wt.orderBy("day")).alias("rn"),
        F.count("*").over(wt).cast("long").alias("n"),
    )
    stats = numbered.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    segs = numbered.groupBy(
        "event_type", F.expr("((rn - 1) * 6) DIV n").alias("seg")
    ).agg(
        F.count("*").cast("long").alias("c"),
        F.sum("x").cast("long").alias("seg_sum"),
    )
    scored = segs.join(stats, "event_type").select(
        "event_type",
        F.col("seg").cast("long").alias("seg"),
        "c",
        (F.col("n") * F.col("seg_sum") - F.col("s") * F.col("c")).alias("d"),
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias("v"),
    )
    return scored.select(
        "event_type", "seg", "c", "d", "v", F.expr(_F51_SYMBOL).alias("symbol")
    )


@register(
    "j128_repetition_signals",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS w
        FROM documents
    ), toks AS (
        SELECT doc_id, source, len(w) AS n_tok FROM t
    ), big AS (
        SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
                               for i in range(1, greatest(len(w), 1))]) AS g
        FROM t WHERE len(w) >= 2
    ), bc AS (
        SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY 1, 2
    ), top2 AS (
        SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_big,
               CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                   AS dup_big
        FROM bc GROUP BY 1
    ), tri AS (
        SELECT doc_id, unnest([array_to_string(w[i:i+2], ' ')
                               for i in range(1, greatest(len(w) - 1, 1))]) AS g
        FROM t WHERE len(w) >= 3
    ), tc AS (
        SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM tri GROUP BY 1, 2
    ), dup3 AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                   AS dup_tri
        FROM tc GROUP BY 1
    ), scored AS (
        SELECT toks.doc_id, toks.source, toks.n_tok,
               CAST(1000000 * COALESCE(top_big, 0)
                    // greatest(n_tok - 1, 1) AS BIGINT) AS top_bigram_ppm,
               CAST(1000000 * COALESCE(dup_big, 0)
                    // greatest(n_tok - 1, 1) AS BIGINT) AS dup_bigram_ppm,
               CAST(1000000 * COALESCE(dup_tri, 0)
                    // greatest(n_tok - 2, 1) AS BIGINT) AS dup_trigram_ppm
        FROM toks
        LEFT JOIN top2 USING (doc_id)
        LEFT JOIN dup3 USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN top_bigram_ppm > 100000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_top_bigram_flagged,
           CAST(SUM(CASE WHEN dup_trigram_ppm > 40000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_trigram_flagged,
           CAST(SUM(top_bigram_ppm) // COUNT(*) AS BIGINT)
               AS mean_top_bigram_ppm,
           CAST(SUM(dup_bigram_ppm) // COUNT(*) AS BIGINT)
               AS mean_dup_bigram_ppm,
           CAST(SUM(dup_trigram_ppm) // COUNT(*) AS BIGINT)
               AS mean_dup_trigram_ppm
    FROM scored GROUP BY 1 ORDER BY 1
    """,
    survey="J128,J9,J6",
)
def j128_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals — the Gopher (Rae et al. 2021)
    repetition-filter family adapted to this corpus's single-line docs:
    top-bigram coverage (fraction of bigram slots taken by the single
    most frequent bigram), duplicated-bigram coverage, and
    duplicated-trigram coverage, each as exact ppm of the doc's n-gram
    slots.  These catch the looping/templated text j9's length/punct
    heuristics and j29's cross-doc line dedup both miss: repetition
    INSIDE one document.

    Output per source: doc counts, flag counts at the stated thresholds
    (top-bigram > 10%, dup-trigram > 4% — corpus-scaled cuts verified to
    discriminate at sf0.001: p90/max are 6.7%/14.3% and 0%/8.5%, so the
    flags isolate the true tail — the Gopher-table-A1 analogue on this
    short-doc corpus), and mean signal levels.  Pure integer
    end-to-end; per-doc fractions are exact ppm floor divisions.

    Scale shape: tokenize scan → per-doc n-gram explodes (shuffle on
    (doc, gram) — map-side combinable) → per-doc aggs → per-source
    fold.  No joins beyond the per-doc signal assembly; at 100 TB the
    gram explode is the volume term, the classic corpus-scan shape."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = Tables(spark, sf_dir).documents
    t = d.select("doc_id", "source", tokens(F.col("text")).alias("w"))
    toks = t.select("doc_id", "source", F.size("w").cast("long").alias("n_tok"))
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1),"
        " i -> concat_ws(' ', slice(w, i, 2)))"
    )
    trigrams = F.expr(
        "transform(sequence(1, size(w) - 2),"
        " i -> concat_ws(' ', slice(w, i, 3)))"
    )
    bc = (
        t.where(F.size("w") >= 2)
        .select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("long").alias("c"))
    )
    top2 = bc.groupBy("doc_id").agg(
        F.max("c").cast("long").alias("top_big"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
        .cast("long")
        .alias("dup_big"),
    )
    dup3 = (
        t.where(F.size("w") >= 3)
        .select("doc_id", F.explode(trigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
            .cast("long")
            .alias("dup_tri")
        )
    )
    scored = (
        toks.join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "source",
            F.expr(
                "CAST(1000000 * COALESCE(top_big, 0)"
                " DIV greatest(n_tok - 1, 1) AS BIGINT)"
            ).alias("top_bigram_ppm"),
            F.expr(
                "CAST(1000000 * COALESCE(dup_big, 0)"
                " DIV greatest(n_tok - 1, 1) AS BIGINT)"
            ).alias("dup_bigram_ppm"),
            F.expr(
                "CAST(1000000 * COALESCE(dup_tri, 0)"
                " DIV greatest(n_tok - 2, 1) AS BIGINT)"
            ).alias("dup_trigram_ppm"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("top_bigram_ppm") > 100000, 1).otherwise(0))
            .cast("long")
            .alias("n_top_bigram_flagged"),
            F.sum(F.when(F.col("dup_trigram_ppm") > 40000, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_trigram_flagged"),
            F.expr("CAST(SUM(top_bigram_ppm) DIV COUNT(*) AS BIGINT)").alias(
                "mean_top_bigram_ppm"
            ),
            F.expr("CAST(SUM(dup_bigram_ppm) DIV COUNT(*) AS BIGINT)").alias(
                "mean_dup_bigram_ppm"
            ),
            F.expr("CAST(SUM(dup_trigram_ppm) DIV COUNT(*) AS BIGINT)").alias(
                "mean_dup_trigram_ppm"
            ),
        )
        .orderBy("source")
    )


@register(
    "f52_cross_correlation",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy
        FROM daily
    ), lags AS (
        SELECT unnest(range(-7, 8)) AS k
    ), pairs AS (
        SELECT l.k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
               CAST(SUM((s.n * a.x - s.sx) * (s.n * b.y - s.sy))
                    AS BIGINT) AS num
        FROM lags l
        CROSS JOIN stats s
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + l.k
        GROUP BY 1
    ), best AS (
        SELECT k AS best_lag FROM pairs
        ORDER BY num DESC, ABS(k) ASC, k ASC LIMIT 1
    )
    SELECT k, n_overlap, num,
           CASE WHEN k = best_lag THEN 1 ELSE 0 END AS is_best
    FROM pairs CROSS JOIN best ORDER BY k
    """,
    survey="F52,F26,E46",
)
def f52_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the click and purchase daily
    series — the TWO-series companion of f26's autocorrelation (one
    series vs its own past) and the question every funnel owner asks:
    at what lag do purchases track clicks?  CCF numerators at lags
    −7..+7 on the n-scaled lattice: num_k = Σ_t (n·x_t − Sx)(n·y_{t+k} −
    Sy) over the overlapping days, an exact BIGINT (the e46/f26 central-
    moment discipline; the shared n² denominator and the lag-constant
    variance normalization cancel in the argmax, so no sqrt ever
    appears).  best_lag = argmax num with the (|k|, k) tiebreak; the
    overlap count n_overlap is reported so the boundary-loss at large
    |k| is visible.

    Budget: daily counts ≤ ~700 at sf0.1 ⇒ |n·x − Sx| ≤ n·700 ≈ 2e4,
    per-term product ≤ 4.4e8, 30-term sums ≪ 2^63 at any plausible SF.

    Scale shape: one scan → conditional daily agg (the only volume
    term) → a 15-lag × ~30-day self-join on the calendar-bounded daily
    relation (KB — the e36 exemption class) → 15-row fold."""
    ev = Tables(spark, sf_dir).events
    daily = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.expr("unix_micros(ts) DIV 86400000000").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        # r11 (guide §2.4): daily feeds the stats fold and both lag-join
        # sides — cut once, one events scan.
        .localCheckpoint(eager=False)
    )
    stats = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    lags = Tables(spark, sf_dir).region.sparkSession.range(-7, 8).select(
        F.col("id").alias("k")
    )
    a = daily.select(F.col("day").alias("da"), "x")
    b = daily.select(F.col("day").alias("db"), "y")
    pairs = (
        F.broadcast(lags)
        .crossJoin(F.broadcast(stats))
        .join(a, F.lit(True))
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_overlap"),
            F.sum(
                (F.col("n") * F.col("x") - F.col("sx"))
                * (F.col("n") * F.col("y") - F.col("sy"))
            )
            .cast("long")
            .alias("num"),
        )
        # r11: the 15-row lag table feeds the best-lag pick and the
        # output scan.
        .localCheckpoint(eager=False)
    )
    best = pairs.orderBy(
        F.col("num").desc(), F.abs(F.col("k")).asc(), F.col("k").asc()
    ).limit(1).select(F.col("k").alias("best_lag"))
    return (
        pairs.crossJoin(F.broadcast(best))
        .select(
            "k", "n_overlap", "num",
            F.when(F.col("k") == F.col("best_lag"), 1).otherwise(0).alias("is_best"),
        )
        .orderBy("k")
    )


# e120's per-pair studentized-range comparison: ONE template (the e114
# rule), instantiated per pair with column-name substitution.  All nine
# sufficient statistics are exact BIGINTs in ONE wide row (closed A/N/R
# domain -> conditional aggregation), so the double chain has a FIXED
# operation order in both engines -- no aggregate-order ambiguity.
# Constant: q(0.95; k=3, df=inf)^2 = 3.3145^2 = 10.986 (micro-injected).
_E120_Q2_CRIT_MICRO = 10_986_000
_E120_MSW = (
    "((qa - CAST(sa AS DOUBLE) * sa / na)"
    " + (qn - CAST(sn AS DOUBLE) * sn / nn)"
    " + (qr - CAST(sr AS DOUBLE) * sr / nr)) / (na + nn + nr - 3)"
)


def _e120_q2(si: str, ni: str, sj: str, nj: str) -> str:
    d = f"(CAST({si} AS DOUBLE) / {ni} - CAST({sj} AS DOUBLE) / {nj})"
    return (
        f"CAST(ROUND({d} * {d}"
        f" / (({_E120_MSW}) / 2.0 * (CAST(1 AS DOUBLE) / {ni}"
        f"    + CAST(1 AS DOUBLE) / {nj})) * 1000000) AS BIGINT)"
    )


@register(
    "e120_tukey_hsd",
    oracle=f"""
    WITH wide AS (
        SELECT CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
               CAST(SUM(CASE WHEN l_returnflag = 'A'
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
               CAST(SUM(CASE WHEN l_returnflag = 'A'
                    THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS qa,
               CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nn,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS sn,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS qn,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS sr,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS qr
        FROM lineitem
    )
    SELECT pair, n_i, n_j, q2_micro,
           CASE WHEN q2_micro > {_E120_Q2_CRIT_MICRO} THEN 1 ELSE 0 END
               AS significant
    FROM (
        SELECT 'A-N' AS pair, na AS n_i, nn AS n_j,
               {_e120_q2("sa", "na", "sn", "nn")} AS q2_micro FROM wide
        UNION ALL
        SELECT 'A-R', na, nr, {_e120_q2("sa", "na", "sr", "nr")} FROM wide
        UNION ALL
        SELECT 'N-R', nn, nr, {_e120_q2("sn", "nn", "sr", "nr")} FROM wide
    ) ORDER BY pair
    """,
    survey="E120,E49,E52",
)
def e120_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's HSD post-hoc pairwise comparisons — the step AFTER e49's
    one-way ANOVA F that the registry lacked: the omnibus F says "some
    group differs"; Tukey's studentized-range test says WHICH pairs,
    with family-wise error control the three unadjusted e52 t-tests
    would forfeit.  Groups are the return-flag populations on quantity.

    Per pair q²_ij = (m_i − m_j)² / (MSW/2 · (1/n_i + 1/n_j)) compared
    against q²(0.95; k=3, ν=∞) = 10.986 (micro-injected constant — the
    e72 rule).  Exactness: the nine sufficient statistics (n, Σx, Σx²
    per group) land in ONE wide row via conditional aggregation (closed
    A/N/R domain — the e101 pivot discipline), so MSW and every pair's
    q² are single double chains with a FIXED operation order shared
    verbatim by both engines (no aggregate-order ambiguity), each
    micro-rounded once.

    Scale shape: one fact scan → ONE conditional 9-stat agg (map-side
    combinable) → 3-row pair fold; nothing after the scan exceeds a
    row."""
    li = Tables(spark, sf_dir).lineitem
    q = F.col("l_quantity").cast("long")
    wide = li.agg(
        *[
            agg.alias(name)
            for flag, suffix in (("A", "a"), ("N", "n"), ("R", "r"))
            for name, agg in (
                (f"n{suffix}", F.sum(F.when(F.col("l_returnflag") == flag, 1).otherwise(0)).cast("long")),
                (f"s{suffix}", F.sum(F.when(F.col("l_returnflag") == flag, q).otherwise(0)).cast("long")),
                (f"q{suffix}", F.sum(F.when(F.col("l_returnflag") == flag, q * q).otherwise(0)).cast("long")),
            )
        ]
    )
    pairs = [
        ("A-N", "sa", "na", "sn", "nn"),
        ("A-R", "sa", "na", "sr", "nr"),
        ("N-R", "sn", "nn", "sr", "nr"),
    ]
    out = None
    for pair, si, ni, sj, nj in pairs:
        row = wide.select(
            F.lit(pair).alias("pair"),
            F.col(ni).alias("n_i"),
            F.col(nj).alias("n_j"),
            F.expr(_e120_q2(si, ni, sj, nj)).alias("q2_micro"),
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "pair", "n_i", "n_j", "q2_micro",
        F.when(F.col("q2_micro") > _E120_Q2_CRIT_MICRO, 1)
        .otherwise(0)
        .alias("significant"),
    ).orderBy("pair")


@register(
    "k16_pane_merged_sliding",
    oracle="""
    -- The oracle computes the sliding windows DIRECTLY (each event lands
    -- in every 3-hour window covering it); the engine assembles the same
    -- windows by merging 1-hour PANES.  Hash equality IS the pane-slicing
    -- correctness proof (Li et al.'s panes optimization).
    WITH ev AS (
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS hour_idx,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), windows AS (
        SELECT event_type,
               hour_idx - o.o AS w_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM ev, (SELECT unnest(range(0, 3)) AS o) o
        GROUP BY 1, 2
    )
    -- slide = 1 pane, so every w_start is a window start (a parametric
    -- slide s would filter w_start % s = 0 here)
    SELECT event_type, w_start, n_events, sum_cents
    FROM windows
    """,
    survey="K16,K2,A24",
)
def k16_pane_merged_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pane-merged sliding windows (the panes optimization, Li et al.
    SIGMOD'05; Spark's own sliding-window implementation explodes every
    event into size/slide copies): the ENGINE first aggregates disjoint
    1-hour PANES (each event touched once), then assembles every 3-hour
    sliding window (slide 1 h) by merging its three panes — the
    incremental-aggregation shape a streaming engine uses so per-event
    work is O(1) instead of O(windows-per-event).  The ORACLE computes
    the same windows DIRECTLY (explode into all covering windows), so
    the cross-engine hash match is a machine-checked proof of the
    pane-slicing identity — the a24 fold-equals-recompute discipline
    applied to window slicing.

    Both sides are exact integers (hour indexes, cent sums).  Windows at
    the series edges keep their partial contents (no trimming) — stated
    convention, identical in both engines.

    Scale shape (the point of the operator): the pane agg touches each
    event ONCE (map-side combinable, shuffle on (type, hour)); the merge
    explodes PANES (calendar-bounded, ~720/type) not events — at 100 TB
    the win over direct sliding aggregation is the event-volume ×3
    explode that never happens."""
    ev = Tables(spark, sf_dir).events
    panes = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) DIV 3600000000").alias("hour_idx"),
    ).agg(
        F.count("*").cast("long").alias("pn"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("pc"),
    )
    # each pane feeds the 3 windows starting at hour_idx-2 .. hour_idx
    merged = (
        panes.select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("o"),
            "hour_idx", "pn", "pc",
        )
        .select(
            "event_type",
            (F.col("hour_idx") - F.col("o")).alias("w_start"),
            "pn", "pc",
        )
        .groupBy("event_type", "w_start")
        .agg(
            F.sum("pn").cast("long").alias("n_events"),
            F.sum("pc").cast("long").alias("sum_cents"),
        )
    )
    return merged.select("event_type", "w_start", "n_events", "sum_cents")


@register(
    "j129_hard_negative_mining",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label, u.i AS dim,
               CAST(ROUND(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS micro
        FROM (SELECT vec_id, label, embedding FROM embeddings) e,
             LATERAL (SELECT unnest(embedding) AS x,
                             generate_subscripts(embedding, 1) AS i) u
    ), q AS (
        SELECT vec_id AS qid, label AS qlabel, dim AS qd, micro AS qm
        FROM ex WHERE vec_id < 8
    ), dots AS (
        SELECT q.qid, q.qlabel, ex.vec_id AS neg_id, ex.label AS neg_label,
               CAST(SUM(ex.micro * q.qm) AS BIGINT) AS dot
        FROM ex JOIN q ON ex.dim = q.qd AND ex.label <> q.qlabel
        GROUP BY 1, 2, 3, 4
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY dot DESC, neg_id) AS rnk
        FROM dots
    )
    SELECT qid, CAST(qlabel AS BIGINT) AS qlabel,
           CAST(rnk AS BIGINT) AS rnk, neg_id,
           CAST(neg_label AS BIGINT) AS neg_label, dot
    FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk
    """,
    survey="J129,J3,J76",
)
def j129_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training — per
    query vector, the top-3 MOST SIMILAR vectors carrying a DIFFERENT
    label: the exact op every dense-retriever pipeline (DPR/contriever
    lineage) runs to replace random negatives, and a selection j3's
    unconstrained KNN and j78's centroid eval cannot state (the
    constraint lives INSIDE the ranking, not after it — a post-filtered
    KNN can starve below k).

    Exactness: the j121 micro-lattice (|x| ≤ 4 ⇒ per-dim product ≤
    1.6e13, ×64 dims ≤ 1.1e15 BIGINT-exact dots); ranking tie-breaks
    (dot DESC, neg_id) — fully deterministic.

    Scale shape: one quantized explode → the 8×|V| label-filtered dot
    join (the brute-force tier; an IVF/LSH preselect drops in above it —
    the j3 dial) → per-query top-3 window on the 8-group relation.
    Query count is constant; the dot join is the single volume term."""
    e = Tables(spark, sf_dir).embeddings
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id", "label", "dim",
        F.round(F.col("x").cast("double") * 1_000_000).cast("long").alias("micro"),
    )
    q = ex.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"),
        F.col("dim").alias("qd"), F.col("micro").alias("qm"),
    )
    dots = (
        ex.join(
            F.broadcast(q),
            (F.col("dim") == F.col("qd")) & (F.col("label") != F.col("qlabel")),
        )
        .groupBy("qid", "qlabel", F.col("vec_id").alias("neg_id"),
                 F.col("label").alias("neg_label"))
        .agg(F.sum(F.col("micro") * F.col("qm")).cast("long").alias("dot"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("neg_id"))
    return (
        dots.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "qid", F.col("qlabel").cast("long").alias("qlabel"),
            F.col("rnk").cast("long").alias("rnk"), "neg_id",
            F.col("neg_label").cast("long").alias("neg_label"), "dot",
        )
        .orderBy("qid", "rnk")
    )


@register(
    "j130_knn_label_noise",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label, u.i AS dim,
               CAST(ROUND(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS micro
        FROM (SELECT vec_id, label, embedding FROM embeddings) e,
             LATERAL (SELECT unnest(embedding) AS x,
                             generate_subscripts(embedding, 1) AS i) u
    ), probes AS (
        SELECT vec_id AS pid, label AS plabel, dim AS pd, micro AS pm
        FROM ex WHERE vec_id % 25 = 0
    ), dots AS (
        SELECT p.pid, p.plabel, ex.vec_id AS nid, ex.label AS nlabel,
               CAST(SUM(ex.micro * p.pm) AS BIGINT) AS dot
        FROM ex JOIN probes p ON ex.dim = p.pd AND ex.vec_id <> p.pid
        GROUP BY 1, 2, 3, 4
    ), knn AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY pid
                                     ORDER BY dot DESC, nid) AS rnk
        FROM dots
    ), votes AS (
        SELECT pid, plabel, nlabel,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(MIN(rnk) AS BIGINT) AS best_rnk
        FROM knn WHERE rnk <= 3 GROUP BY 1, 2, 3
    ), winner AS (
        SELECT pid, plabel,
               MAX({'c': c, 'neg_rnk': -best_rnk, 'lab': nlabel}) AS w
        FROM votes GROUP BY 1, 2
    )
    SELECT CAST(plabel AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN w.lab <> plabel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(1000000 * SUM(CASE WHEN w.lab <> plabel THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS flag_ppm
    FROM winner GROUP BY 1 ORDER BY 1
    """,
    survey="J130,J78,J59",
)
def j130_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-noise detection (the confident-learning / Wilson-editing
    family): a labeled vector whose 3 nearest neighbors majority-vote a
    DIFFERENT label is a mislabeling candidate — the per-EXAMPLE audit
    j78's nearest-centroid eval (per-class confusion) and j94's
    purity/NMI (per-cluster) both aggregate away.  Probes are the
    deterministic vec_id % 25 == 0 subset (the j43 sampling discipline);
    neighbors rank by exact micro-lattice dots with (dot DESC, nid)
    ties; the majority vote tie-breaks by (count, nearest-rank, label) —
    a total order, so the winner is deterministic in both engines.

    Precondition (ADVICE r11): embeddings are fixed-width and non-empty.
    The zip_with/aggregate dot yields 0 for an empty pair of arrays,
    which would admit such pairs into the top-3 window, whereas the old
    posexplode join dropped them — on ragged/empty vector data, filter
    size(mv) > 0 (and size equality) before the pair join.

    Output per label: probe count, flagged count, flag ppm — the
    label-quality leaderboard a curation pipeline triages by.

    Scale shape: quantized explode → probe-set dot join (probes are the
    small broadcast side; the corpus side is the volume term) → top-3
    window per probe → KB vote/flag folds.  The probe rate is the cost
    dial; at 100 TB the production analogue samples per label stratum."""
    # r11 (the j121/j131 treatment, guide §2.3/§4.1): the per-dim
    # posexplode + broadcast dim-equi join shuffled 64× rows per pair
    # into a (pid, nid)-keyed aggregation just to sum micro·pm over
    # dims.  Quantize each vector ONCE via transform and compute every
    # dot as a zip_with/aggregate codegen fold — the identical exact
    # BIGINT sum (integer addition is associative; same 64 products) —
    # with the probe side broadcast (sanctioned BNLJ: the probe subset
    # is bounded by the %25 sampling rule).  fan_out spreads the
    # corpus side off the one-split local scan (no-op at real scale).
    e = Tables(spark, sf_dir).embeddings
    q = e.select(
        "vec_id", "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1_000_000).cast("long"),
        ).alias("mv"),
    )
    probes = q.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("pid"), F.col("label").alias("plabel"),
        F.col("mv").alias("pv"),
    )
    dots = (
        fan_out(q)
        .join(F.broadcast(probes), F.col("vec_id") != F.col("pid"))
        .select(
            "pid", "plabel",
            F.col("vec_id").alias("nid"), F.col("label").alias("nlabel"),
            F.aggregate(
                F.zip_with(F.col("mv"), F.col("pv"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dot"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("pid").orderBy(F.col("dot").desc(), F.col("nid"))
    votes = (
        dots.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .groupBy("pid", "plabel", "nlabel")
        .agg(
            F.count("*").cast("long").alias("c"),
            F.min("rnk").cast("long").alias("best_rnk"),
        )
    )
    winner = votes.groupBy("pid", "plabel").agg(
        F.max(
            F.struct(
                F.col("c"), (-F.col("best_rnk")).alias("neg_rnk"),
                F.col("nlabel").alias("lab"),
            )
        ).alias("w")
    )
    return (
        winner.groupBy(F.col("plabel").cast("long").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum(F.when(F.col("w.lab") != F.col("plabel"), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.expr(
                "CAST(1000000 * SUM(CASE WHEN w.lab <> plabel THEN 1 ELSE 0 END)"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("flag_ppm"),
        )
        .orderBy("label")
    )


@register(
    "sql_api_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY ALL
    """,
    survey="SQL-6,E2,C1",
)
def sql_api_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the modern SQL-surface shorthand (every
    non-aggregate select item becomes a grouping key) that Spark 4 and
    DuckDB both implement; registered so the engine's SQL text path is
    certified on the SAME syntax users will paste in from either system
    (the sql_api_unpivot/parameterized discipline: surface coverage is
    evidence, not sugar).  The oracle is the IDENTICAL text — one query,
    two engines, byte-equal semantics.

    Scale shape: one scan → hash agg with map-side partial combine; the
    shorthand resolves at analysis time to the e2 plan."""
    Tables(spark, sf_dir).lineitem.createOrReplaceTempView("lineitem_gba")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem_gba GROUP BY ALL
        """
    )


@register(
    "b20_consistency_level_freshness",
    oracle="""
    WITH muts AS (
        SELECT l_orderkey AS pk, l_linenumber AS ck,
               (epoch_us(l_shipdate) // 86400000000) % 100 AS phase,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), winners AS (
        -- PACKED priority (the LWW packed-priority idiom): phase rides
        -- the high bits, cents the low 40 (cents <= ~1.1e7 < 2^40), so
        -- MAX over one BIGINT is the (phase, cents) lexicographic max —
        -- struct-field extraction from an aggregated struct turned out
        -- pathologically slow in DuckDB at sf0.1 (minutes vs 2 s)
        SELECT pk, ck,
               MAX(phase * 1099511627776 + cents)
                   // 1099511627776 AS wphase
        FROM muts GROUP BY 1, 2
    ), presence AS (
        -- RF = 3: every mutation reaches all replicas except those whose
        -- outage swallows it past the 5-day hint window (the b19 rule:
        -- replica r down on phases [start_r, end_r), hints from the last
        -- 5 days replay — so the winner is MISSING at r iff its phase
        -- lies in [start_r, end_r - 5))
        SELECT pk, ck,
               CASE WHEN wphase >= 10 AND wphase < 12 - 5
                    THEN 0 ELSE 1 END AS at_r0,
               CASE WHEN wphase >= 30 AND wphase < 38 - 5
                    THEN 0 ELSE 1 END AS at_r1,
               CASE WHEN wphase >= 50 AND wphase < 65 - 5
                    THEN 0 ELSE 1 END AS at_r2,
               (pk // 7) % 3 AS h
        FROM winners
    ), per_cl AS (
        SELECT 'ONE' AS cl,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE h WHEN 0 THEN at_r0 WHEN 1 THEN at_r1
                        ELSE at_r2 END) AS BIGINT) AS n_fresh
        FROM presence
        UNION ALL
        SELECT 'QUORUM', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN (CASE h WHEN 0 THEN at_r0 WHEN 1 THEN at_r1
                                   ELSE at_r2 END)
                             + (CASE (h + 1) % 3 WHEN 0 THEN at_r0
                                WHEN 1 THEN at_r1 ELSE at_r2 END) >= 1
                        THEN 1 ELSE 0 END) AS BIGINT)
        FROM presence
        UNION ALL
        SELECT 'ALL', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN at_r0 + at_r1 + at_r2 >= 1
                        THEN 1 ELSE 0 END) AS BIGINT)
        FROM presence
    )
    SELECT cl, n_keys, n_fresh,
           CAST(1000000 * n_fresh // n_keys AS BIGINT) AS fresh_ppm
    FROM per_cl ORDER BY cl
    """,
    survey="B20,B19,B15",
)
def b20_consistency_level_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistency-level read freshness — the tunable-consistency
    question b15's read repair and b19's hinted handoff set up but never
    answer: UNDER WHICH CL does a read see the newest write, given the
    same deterministic outage/hint model at RF = 3?  Every mutation
    reaches all three replicas except where a replica's outage swallows
    it past the hint window (b19's rule applied per replica to the
    key's LWW WINNER).  Reads resolve to the newest version among
    contacted replicas, so a key is FRESH under a replica set iff ANY
    contacted replica holds the winner (packed-priority BIGINT max —
    cents ≤ ~1.1e7 < 2^40 rides the low bits): ONE contacts the deterministic
    coordinator pick h = (pk DIV 7) % 3, QUORUM contacts {h, h+1},
    ALL contacts all three.

    Output per CL: key count, fresh count, fresh ppm — the
    monotonicity ONE ≤ QUORUM ≤ ALL is the tunable-consistency LAW and
    is pin-asserted.  Pure integer phases; same winner rule as b19/b17
    ((phase, cents) max — the b2 priority discipline).

    Scale shape: one fact scan → per-key max_by agg (the only shuffle)
    → three conditional folds over the KB presence relation."""
    li = Tables(spark, sf_dir).lineitem
    muts = li.select(
        F.col("l_orderkey").alias("pk"),
        F.col("l_linenumber").alias("ck"),
        (F.expr("unix_micros(l_shipdate) DIV 86400000000") % 100).alias("phase"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    # the packed-priority LWW tier (operators/cassandra.py's idiom):
    # MAX over ONE BIGINT keeps the winner agg a plain map-side-
    # combinable hash aggregate in both engines
    winners = muts.groupBy("pk", "ck").agg(
        F.expr(
            "MAX(phase * 1099511627776 + cents) DIV 1099511627776"
        ).alias("wphase")
    )
    presence = winners.select(
        "pk", "ck",
        F.expr(
            "CASE WHEN wphase >= 10 AND wphase < 12 - 5 THEN 0 ELSE 1 END"
        ).alias("at_r0"),
        F.expr(
            "CASE WHEN wphase >= 30 AND wphase < 38 - 5 THEN 0 ELSE 1 END"
        ).alias("at_r1"),
        F.expr(
            "CASE WHEN wphase >= 50 AND wphase < 65 - 5 THEN 0 ELSE 1 END"
        ).alias("at_r2"),
        F.expr("(pk DIV 7) % 3").alias("h"),
    )
    pick = "CASE h WHEN 0 THEN at_r0 WHEN 1 THEN at_r1 ELSE at_r2 END"
    pick_next = (
        "CASE (h + 1) % 3 WHEN 0 THEN at_r0 WHEN 1 THEN at_r1 ELSE at_r2 END"
    )
    one = presence.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.expr(f"CAST(SUM({pick}) AS BIGINT)").alias("n_fresh"),
    ).select(F.lit("ONE").alias("cl"), "n_keys", "n_fresh")
    quorum = presence.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.expr(
            f"CAST(SUM(CASE WHEN ({pick}) + ({pick_next}) >= 1"
            f" THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_fresh"),
    ).select(F.lit("QUORUM").alias("cl"), "n_keys", "n_fresh")
    al = presence.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.expr(
            "CAST(SUM(CASE WHEN at_r0 + at_r1 + at_r2 >= 1"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_fresh"),
    ).select(F.lit("ALL").alias("cl"), "n_keys", "n_fresh")
    return (
        one.unionByName(quorum)
        .unionByName(al)
        .select(
            "cl", "n_keys", "n_fresh",
            F.expr("CAST(1000000 * n_fresh DIV n_keys AS BIGINT)").alias(
                "fresh_ppm"
            ),
        )
        .orderBy("cl")
    )


# f53's sign-split truncating mean: Spark DIV and DuckDB // truncate
# toward zero, but the SUM being divided can be negative — ONE template
# (the e114 rule) keeps the trunc semantics explicit and identical.
def _f53_trunc_div(num: str, den: str) -> str:
    return (
        f"CASE WHEN {num} >= 0 THEN {num} // {den}"
        f" ELSE -((-({num})) // {den}) END"
    )


def _f53_trunc_div_spark(num: str, den: str) -> str:
    return (
        f"CASE WHEN {num} >= 0 THEN {num} DIV {den}"
        f" ELSE -((-({num})) DIV {den}) END"
    )


@register(
    "f53_seasonal_strength",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day_idx,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), w7 AS (
        SELECT event_type, day_idx, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day_idx
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
                   AS sum7,
               COUNT(*) OVER (PARTITION BY event_type ORDER BY day_idx
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
        FROM daily
    ), det AS (
        SELECT event_type, day_idx, day_idx % 7 AS phase,
               1000 * cnt - (1000 * sum7) // 7 AS detr
        FROM w7 WHERE cnt7 = 7
    ), seas AS (
        SELECT event_type, phase,
               {_f53_trunc_div("CAST(SUM(detr) AS BIGINT)", "COUNT(*)")} AS s
        FROM det GROUP BY 1, 2
    ), parts AS (
        SELECT det.event_type, detr - s AS resid, detr
        FROM det JOIN seas ON seas.event_type = det.event_type
                          AND seas.phase = det.phase
    ), vars AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) * SUM(resid * resid)
                    - SUM(resid) * SUM(resid) AS BIGINT) AS v_resid,
               CAST(COUNT(*) * SUM(detr * detr)
                    - SUM(detr) * SUM(detr) AS BIGINT) AS v_detr
        FROM parts GROUP BY 1
    )
    SELECT event_type, n, v_resid, v_detr,
           CASE WHEN v_detr > 0
                THEN GREATEST(CAST(0 AS BIGINT),
                     CAST(1000 * (v_detr - v_resid) // v_detr AS BIGINT))
                ELSE NULL END AS f_seasonal_milli
    FROM vars ORDER BY event_type
    """,
    survey="F53,F28,E5",
)
def f53_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal STRENGTH (Hyndman's F_s = max(0, 1 − var(remainder)/
    var(detrended)) from the forecasting-principles feature set) — the
    one-number diagnostic built on f28's additive decomposition: f28
    EMITS the components, this scores how much of the detrended
    variation the weekly cycle explains — the feature a monitoring
    pipeline thresholds to decide whether f14/f20's anomaly gates need
    the seasonal adjustment at all.

    Same lattice as f28 (milli, tz-free epoch-day phases, full-7-window
    days only, truncating divisions sign-split via one shared template);
    the two variances ride n-scaled integer numerators (the e116 rule)
    whose shared denominator cancels in the ratio, clamped at 0 with the
    textbook GREATEST.  Budget: detr_milli ≤ ~7e5 at sf0.1 ⇒ n·Σx² ≈
    3e14; the lattice holds to ~100× daily volume, stated for the
    100 TB read.

    Scale shape: one scan → daily agg → partitioned 7-day windows on
    the calendar-bounded relation (the e36 exemption class) → phase agg
    → per-type variance fold."""
    from pyspark.sql.window import Window

    ev = Tables(spark, sf_dir).events
    daily = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day_idx")
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(-3, 3)
    )
    w7 = daily.select(
        "event_type", "day_idx", "cnt",
        F.sum("cnt").over(w).cast("long").alias("sum7"),
        F.count("*").over(w).alias("cnt7"),
    )
    det = w7.where(F.col("cnt7") == 7).select(
        "event_type",
        (F.col("day_idx") % 7).alias("phase"),
        (1000 * F.col("cnt") - F.expr("(1000 * sum7) DIV 7")).alias("detr"),
    )
    seas = det.groupBy("event_type", "phase").agg(
        F.expr(
            _f53_trunc_div_spark("CAST(SUM(detr) AS BIGINT)", "COUNT(*)")
        ).alias("s")
    )
    parts = det.join(seas, ["event_type", "phase"]).select(
        "event_type", (F.col("detr") - F.col("s")).alias("resid"), "detr"
    )
    vars_ = parts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        (
            F.count("*") * F.sum(F.col("resid") * F.col("resid"))
            - F.sum("resid") * F.sum("resid")
        )
        .cast("long")
        .alias("v_resid"),
        (
            F.count("*") * F.sum(F.col("detr") * F.col("detr"))
            - F.sum("detr") * F.sum("detr")
        )
        .cast("long")
        .alias("v_detr"),
    )
    return vars_.select(
        "event_type", "n", "v_resid", "v_detr",
        F.expr(
            "CASE WHEN v_detr > 0"
            " THEN GREATEST(CAST(0 AS BIGINT),"
            "      CAST(1000 * (v_detr - v_resid) DIV v_detr AS BIGINT))"
            " ELSE NULL END"
        ).alias("f_seasonal_milli"),
    ).orderBy("event_type")


@register(
    "j131_semdedup",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label, u.i AS dim,
               CAST(ROUND(CAST(u.x AS DOUBLE) * 100) AS BIGINT) AS c
        FROM (SELECT vec_id, label, embedding FROM embeddings) e,
             LATERAL (SELECT unnest(embedding) AS x,
                             generate_subscripts(embedding, 1) AS i) u
    ), norms AS (
        SELECT vec_id, label, CAST(SUM(c * c) AS BIGINT) AS n2
        FROM ex GROUP BY 1, 2
    ), dots AS (
        SELECT a.label, a.vec_id AS va, b.vec_id AS vb,
               CAST(SUM(a.c * b.c) AS BIGINT) AS dot
        FROM ex a JOIN ex b
          ON b.label = a.label AND b.dim = a.dim AND b.vec_id > a.vec_id
        GROUP BY 1, 2, 3
    ), dup_pairs AS (
        SELECT d.label, d.va, d.vb
        FROM dots d
        JOIN norms x ON x.vec_id = d.va
        JOIN norms y ON y.vec_id = d.vb
        WHERE d.dot > 0 AND 100 * d.dot * d.dot > 81 * x.n2 * y.n2
    ), pruned AS (
        SELECT label, vb FROM dup_pairs GROUP BY 1, 2
    )
    SELECT norms.label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COALESCE(MAX(dp.n_pairs), 0) AS BIGINT) AS n_dup_pairs,
           CAST(COALESCE(MAX(pr.n_pruned), 0) AS BIGINT) AS n_pruned,
           CAST(COUNT(*) - COALESCE(MAX(pr.n_pruned), 0) AS BIGINT) AS n_kept
    FROM norms
    LEFT JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pairs
               FROM dup_pairs GROUP BY 1) dp USING (label)
    LEFT JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pruned
               FROM pruned GROUP BY 1) pr USING (label)
    GROUP BY 1 ORDER BY 1
    """,
    survey="J131,J2,J4",
)
def j131_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — cluster-scoped SEMANTIC dedup:
    within each cluster (the given label — in production the k-means
    assignment), prune every vector whose cosine to ANY earlier cluster
    member exceeds τ = 0.9 (one-pass rule: vb drops iff some va < vb
    has sim > τ, REGARDLESS of whether va itself was pruned —
    deterministic, no CC needed).  This matches the paper's published
    implementation, which prunes on max-cosine-to-lower-indexed-member
    computed in one pass; on a chain a-b-c with sim(a,b) > τ,
    sim(b,c) > τ, sim(a,c) < τ it therefore prunes BOTH b and c, where
    an iterative keep-first sweep would keep c — a documented (mild)
    over-pruning bias, the defined semantics here in both engines
    (ADVICE r9).  This is the embedding counterpart of j2's MinHash
    dedup and differs from j2_embedding_neardup exactly where SemDeDup
    differs from brute near-dup: the CLUSTER bounds the quadratic term,
    which is the whole scaling argument of the paper.

    Exactness: the centi lattice (|x| ≤ 4 ⇒ |c| ≤ 400, dots ≤ ~1e7) so
    the sign-aware squared comparison 100·dot² > 81·‖a‖²·‖b‖²
    (τ² = 81/100 EXACT — no injected constant) stays inside int64 with
    ~100× headroom; the cosine is DEFINED on the centi lattice, stated
    contract.  Output per label: vector count, dup pairs above τ,
    pruned, kept.

    Scale shape: quantized explode → norms agg → within-label pair dots
    via the (label, dim) equi self-join — candidate volume Σ|cluster|²,
    bounded by the clustering exactly as the paper argues (never
    corpus²) — → threshold filter → per-label folds."""
    e = Tables(spark, sf_dir).embeddings
    # r11 (guide §4.1/§2.4, the j121 precedent): the per-dim posexplode +
    # (label, dim)-keyed equi join + (va, vb) re-agg shuffled 64× rows and
    # re-derived the exploded scan three times.  The same exact integers
    # now ride one narrow projection — quantized array + codegen norm fold
    # per row — cut once; the within-label pair join computes each dot as
    # a zip_with/aggregate fold (integer sum over dims, order-free, so
    # bit-identical to the exploded SUM).
    q = (
        e.select(
            "vec_id",
            "label",
            F.expr(
                "transform(embedding, x ->"
                " CAST(ROUND(CAST(x AS DOUBLE) * 100) AS BIGINT))"
            ).alias("qv"),
        )
        .select(
            "vec_id",
            "label",
            "qv",
            F.expr(
                "aggregate(qv, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
            ).alias("n2"),
        )
        .localCheckpoint(eager=False)
    )
    a = q.select(
        F.col("label").alias("la"), F.col("vec_id").alias("va"),
        F.col("qv").alias("qa"), F.col("n2").alias("n2a"),
    )
    b = q.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("vb"),
        F.col("qv").alias("qb"), F.col("n2").alias("n2b"),
    )
    dots = (
        a.join(b, (F.col("lb") == F.col("la")) & (F.col("vb") > F.col("va")))
        .select(
            F.col("la").alias("label"), "va", "vb", "n2a", "n2b",
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> x * y),"
                " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
            ).alias("dot"),
        )
    )
    dup_pairs = dots.where(
        (F.col("dot") > 0)
        & (100 * F.col("dot") * F.col("dot") > 81 * F.col("n2a") * F.col("n2b"))
    ).select("label", "va", "vb").localCheckpoint(eager=False)
    pruned = dup_pairs.select("label", "vb").distinct()
    per_label = q.groupBy("label").agg(F.count("*").cast("long").alias("n_vecs"))
    dp = dup_pairs.groupBy("label").agg(F.count("*").cast("long").alias("n_pairs"))
    pr = pruned.groupBy("label").agg(F.count("*").cast("long").alias("n_pruned"))
    return (
        per_label.join(dp, "label", "left")
        .join(pr, "label", "left")
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.coalesce(F.col("n_pruned"), F.lit(0)).cast("long").alias("n_pruned"),
            (F.col("n_vecs") - F.coalesce(F.col("n_pruned"), F.lit(0)))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("label")
    )


@register(
    "e121_weighted_kappa",
    oracle="""
    WITH per_order AS (
        SELECT o_orderkey,
               CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS r1,
               LEAST(CAST(5 AS BIGINT),
                     1 + CAST(ROUND(o_totalprice * 100) AS BIGINT)
                         // 10000000) AS r2
        FROM orders
    ), o AS (
        SELECT r1, r2, CAST(COUNT(*) AS BIGINT) AS c
        FROM per_order GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM o
    ), rows_ AS (
        SELECT r1, CAST(SUM(c) AS BIGINT) AS rc FROM o GROUP BY 1
    ), cols_ AS (
        SELECT r2, CAST(SUM(c) AS BIGINT) AS cc FROM o GROUP BY 1
    ), wo AS (
        SELECT CAST(SUM((r1 - r2) * (r1 - r2) * c) AS BIGINT) AS sum_wo
        FROM o
    ), we AS (
        SELECT CAST(SUM((rows_.r1 - cols_.r2) * (rows_.r1 - cols_.r2)
                        * rows_.rc * cols_.cc) AS BIGINT) AS sum_we
        FROM rows_ CROSS JOIN cols_
    )
    SELECT n, sum_wo, sum_we,
           CASE WHEN sum_we > 0
                THEN CAST(1000 - 1000 * n * sum_wo // sum_we AS BIGINT)
                ELSE NULL END AS qwk_milli
    FROM tot CROSS JOIN wo CROSS JOIN we
    """,
    survey="E121,E53,E67",
)
def e121_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted kappa (Cohen 1968) — ORDINAL agreement, the
    metric e53's nominal kappa throws away: disagreeing by one grade and
    by four grades both count as plain disagreement under nominal kappa,
    while QWK weights each (i, j) cell by (i−j)² — the standard metric
    wherever graded labels meet (essay scoring, severity triage, every
    ordinal-label competition).  Raters: the order's stated priority
    digit (1..5 — a genuinely ordinal column) vs the price-derived grade
    LEAST(5, 1 + cents DIV 1e7).

    Exactness: QWK = 1 − Σw·O / Σw·E with E_ij = row_i·col_j / n folds
    to the all-BIGINT qwk_milli = 1000 − 1000·n·ΣwO DIV Σw·row·col
    (the n denominator clears; weights are exact integer squares ≤ 16).
    Budget: Σw·row·col ≤ 16·n² ≈ 3.6e11 at sf0.1 — ×1000 far inside
    int64.  Degenerate single-grade marginals (ΣwE = 0) guard to NULL.

    Scale shape: one scan → 25-cell contingency agg (map-side
    combinable) → KB marginal folds → 1-row arithmetic."""
    o = Tables(spark, sf_dir).orders
    per = o.select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("r1"),
        F.expr(
            "LEAST(CAST(5 AS BIGINT),"
            " 1 + CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 10000000)"
        ).alias("r2"),
    )
    # r11 (guide §2.4): the bounded rating grid feeds the total, both
    # margins and the observed-weight fold — cut once.
    cells = (
        per.groupBy("r1", "r2")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    rows_ = cells.groupBy("r1").agg(F.sum("c").cast("long").alias("rc"))
    cols_ = cells.groupBy("r2").agg(F.sum("c").cast("long").alias("cc"))
    wo = cells.agg(
        F.sum((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2")) * F.col("c"))
        .cast("long")
        .alias("sum_wo")
    )
    we = (
        rows_.crossJoin(F.broadcast(cols_))
        .agg(
            F.sum(
                (F.col("r1") - F.col("r2"))
                * (F.col("r1") - F.col("r2"))
                * F.col("rc")
                * F.col("cc")
            )
            .cast("long")
            .alias("sum_we")
        )
    )
    return (
        tot.crossJoin(F.broadcast(wo))
        .crossJoin(F.broadcast(we))
        .select(
            "n", "sum_wo", "sum_we",
            F.expr(
                "CASE WHEN sum_we > 0"
                " THEN CAST(1000 - 1000 * n * sum_wo DIV sum_we AS BIGINT)"
                " ELSE NULL END"
            ).alias("qwk_milli"),
        )
    )


@register(
    "b21_ring_rebalance_plan",
    oracle="""
    WITH keyed AS (
        SELECT l_orderkey % 1000 AS token,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), owners AS (
        SELECT token, cents,
               CASE WHEN token < 333 THEN 0
                    WHEN token < 666 THEN 1 ELSE 2 END AS old_owner,
               CASE WHEN token < 250 THEN 0
                    WHEN token < 500 THEN 1
                    WHEN token < 750 THEN 2 ELSE 3 END AS new_owner
        FROM keyed
    )
    SELECT CAST(old_owner AS BIGINT) AS old_owner,
           CAST(new_owner AS BIGINT) AS new_owner,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS bytes_proxy_cents,
           CASE WHEN old_owner = new_owner THEN 0 ELSE 1 END AS moves
    FROM owners GROUP BY old_owner, new_owner ORDER BY 1, 2
    """,
    survey="B21,B1,A29",
)
def b21_ring_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-ring rebalance plan — what `nodetool` bootstrap/move
    actually costs: adding a fourth node to a 3-node ring re-cuts the
    token ranges ([0,333,666) → [0,250,500,750)), and every row whose
    token's OWNER changes must stream between nodes.  The plan is the
    (old_owner, new_owner) transfer matrix with row counts and a bytes
    proxy — the operator a capacity planner runs BEFORE the bootstrap
    (b1's token bucketing gives placement; this gives the DELTA between
    two placements).  Contiguous single-range ownership here; vnodes
    generalize by unioning per-vnode ranges into the same CASE lattice.

    Exactness: pure integer tokens (the b1 modular discipline) and cent
    sums; the transfer matrix is a plain conditional agg.

    Scale shape: one scan → token + owner CASE projection (no join) →
    ≤ 12-cell agg (map-side combinable).  At 100 TB this is exactly the
    one-pass accounting scan a real rebalance planner would run."""
    li = Tables(spark, sf_dir).lineitem
    owners = li.select(
        (F.col("l_orderkey") % 1000).alias("token"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).select(
        "token", "cents",
        F.expr(
            "CASE WHEN token < 333 THEN 0 WHEN token < 666 THEN 1 ELSE 2 END"
        ).alias("old_owner"),
        F.expr(
            "CASE WHEN token < 250 THEN 0 WHEN token < 500 THEN 1"
            " WHEN token < 750 THEN 2 ELSE 3 END"
        ).alias("new_owner"),
    )
    return (
        owners.groupBy(
            F.col("old_owner").cast("long").alias("old_owner"),
            F.col("new_owner").cast("long").alias("new_owner"),
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("bytes_proxy_cents"),
        )
        .select(
            "old_owner", "new_owner", "n_rows", "bytes_proxy_cents",
            F.when(F.col("old_owner") == F.col("new_owner"), 0)
            .otherwise(1)
            .alias("moves"),
        )
        .orderBy("old_owner", "new_owner")
    )


# f54's per-window (R/S)^2: the rescaled range squared is the EXACT
# integer ratio R_scaled^2 / V — Z_k = sum(w*x_i) - k*S_w carries the
# w-scaling, R_scaled = max Z - min Z (k = 1..w), V = w*sum(x^2) - S^2
# carries w^2, and both scalings cancel in R^2/V.  ln(3) enters once as
# a CAST('...' AS DOUBLE) string literal (the e84 decimal-literal rule).
_F54_LN9 = "CAST('2.1972245773362196' AS DOUBLE)"  # 2*ln(3) = ln(9)


@register(
    "f54_hurst_rs",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value) AS BIGINT))
                    // COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), numbered AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
        FROM daily
    ), winsz AS (SELECT unnest([8, 24]) AS w), cells AS (
        SELECT n.event_type, ws.w, (n.rn - 1) // ws.w AS wid,
               ((n.rn - 1) % ws.w) + 1 AS k, n.x
        FROM numbered n CROSS JOIN winsz ws
    ), complete AS (
        SELECT event_type, w, wid FROM cells
        GROUP BY 1, 2, 3 HAVING COUNT(*) = w
    ), cc AS (
        SELECT cells.* FROM cells JOIN complete USING (event_type, w, wid)
    ), wstats AS (
        SELECT event_type, w, wid,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS q
        FROM cc GROUP BY 1, 2, 3
    ), z AS (
        SELECT cc.event_type, cc.w, cc.wid, cc.k,
               SUM(cc.w * cc.x) OVER (PARTITION BY cc.event_type, cc.w,
                                      cc.wid ORDER BY cc.k)
                   - cc.k * ws.s AS zk
        FROM cc JOIN wstats ws USING (event_type, w, wid)
    ), rr AS (
        SELECT event_type, w, wid,
               CAST(MAX(zk) - MIN(zk) AS BIGINT) AS r_scaled
        FROM z GROUP BY 1, 2, 3
    ), per_win AS (
        SELECT rr.event_type, rr.w,
               CAST(1000000 * rr.r_scaled * rr.r_scaled
                    // (ws.w * ws.q - ws.s * ws.s) AS BIGINT) AS rs2_micro
        FROM rr JOIN wstats ws USING (event_type, w, wid)
        WHERE ws.w * ws.q - ws.s * ws.s > 0
    ), agg AS (
        SELECT event_type, w,
               CAST(SUM(rs2_micro) // COUNT(*) AS BIGINT) AS rs2,
               CAST(COUNT(*) AS BIGINT) AS n_windows
        FROM per_win GROUP BY 1, 2
    ), wide AS (
        SELECT a8.event_type,
               a8.rs2 AS rs2_w8, a8.n_windows AS n_w8,
               a24.rs2 AS rs2_w24, a24.n_windows AS n_w24
        FROM (SELECT * FROM agg WHERE w = 8) a8
        JOIN (SELECT * FROM agg WHERE w = 24) a24 USING (event_type)
    )
    SELECT event_type, n_w8, rs2_w8, n_w24, rs2_w24,
           CASE WHEN rs2_w8 > 0 AND rs2_w24 > 0
                THEN CAST(ROUND(1000 * LN(CAST(rs2_w24 AS DOUBLE) / rs2_w8)
                          / {_F54_LN9}) AS BIGINT)
                ELSE NULL END AS hurst_milli
    FROM wide ORDER BY event_type
    """,
    survey="F54,F26,J61",
)
def f54_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent via rescaled-range analysis (Hurst 1951 / Mandelbrot
    R/S) — LONG-MEMORY detection, the time-series class the F family
    lacked: f26's autocorrelation sees fixed lags, f47/f29 see level
    shifts, but persistent self-similar dependence shows as R/S growing
    like n^H with H > 0.5 — the statistic behind 'is this traffic bursty
    at every scale'.  Two window sizes (8 and 24 days) over the per-type
    daily-mean series give H = ln(RS₂₄/RS₈)/ln 3.

    Exactness: (R/S)² per window is the EXACT integer ratio R²/V — the
    cumulative deviations Z_k = Σw·xᵢ − k·S carry the w-scaling and
    V = w·Σx² − S² carries w², so both cancel and NO sqrt appears
    (the f51 squares discipline); per-window micro quantization (e105),
    integer window means, and one final shared LN template over an
    int-ratio double with ln 9 as a CAST-string constant (the e84
    decimal-literal rule).  H_milli ≈ 500 ⇔ no memory; > 500 persistent.

    Scale shape: one scan → daily agg → per-(type, w, window) partitioned
    cumulative windows on the calendar-bounded relation (the e36
    exemption class) → KB folds."""
    from pyspark.sql.window import Window

    ev = Tables(spark, sf_dir).events
    daily = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(value) AS BIGINT)) DIV COUNT(*) AS BIGINT)"
        ).alias("x")
    )
    numbered = daily.select(
        "event_type", "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("rn"),
    )
    winsz = numbered.sparkSession.createDataFrame([(8,), (24,)], "w int")
    # r11 (guide §2.4): cells/cc/wstats/agg each feed two consumers on the
    # calendar-bounded relation — fully lazy this re-derived the events
    # scan + daily agg + rank window per consumer (41 Exchanges).  Lazy
    # (persist-backed) cuts compute each stage once.
    cells = numbered.crossJoin(F.broadcast(winsz)).select(
        "event_type", "w",
        F.expr("(rn - 1) DIV w").alias("wid"),
        F.expr("((rn - 1) % w) + 1").alias("k"),
        "x",
    ).localCheckpoint(eager=False)
    complete = (
        cells.groupBy("event_type", "w", "wid")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") == F.col("w"))
        .drop("cnt")
    )
    cc = cells.join(complete, ["event_type", "w", "wid"]).localCheckpoint(eager=False)
    wstats = cc.groupBy("event_type", "w", "wid").agg(
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    ).localCheckpoint(eager=False)
    wz = Window.partitionBy("event_type", "w", "wid").orderBy("k")
    z = cc.join(wstats, ["event_type", "w", "wid"]).select(
        "event_type", "w", "wid",
        (
            F.sum(F.col("w").cast("long") * F.col("x")).over(wz)
            - F.col("k").cast("long") * F.col("s")
        ).alias("zk"),
    )
    rr = z.groupBy("event_type", "w", "wid").agg(
        (F.max("zk") - F.min("zk")).cast("long").alias("r_scaled")
    )
    per_win = (
        rr.join(wstats, ["event_type", "w", "wid"])
        .where(F.expr("w * q - s * s > 0"))
        .select(
            "event_type", "w",
            F.expr(
                "CAST(1000000 * r_scaled * r_scaled"
                " DIV (w * q - s * s) AS BIGINT)"
            ).alias("rs2_micro"),
        )
    )
    agg = per_win.groupBy("event_type", "w").agg(
        F.expr("CAST(SUM(rs2_micro) DIV COUNT(*) AS BIGINT)").alias("rs2"),
        F.count("*").cast("long").alias("n_windows"),
    ).localCheckpoint(eager=False)
    a8 = agg.where(F.col("w") == 8).select(
        "event_type", F.col("rs2").alias("rs2_w8"), F.col("n_windows").alias("n_w8")
    )
    a24 = agg.where(F.col("w") == 24).select(
        "event_type", F.col("rs2").alias("rs2_w24"),
        F.col("n_windows").alias("n_w24"),
    )
    return (
        a8.join(a24, "event_type")
        .select(
            "event_type", "n_w8", "rs2_w8", "n_w24", "rs2_w24",
            F.expr(
                f"CASE WHEN rs2_w8 > 0 AND rs2_w24 > 0"
                f" THEN CAST(ROUND(1000 * LN(CAST(rs2_w24 AS DOUBLE) / rs2_w8)"
                f"      / {_F54_LN9}) AS BIGINT)"
                f" ELSE NULL END"
            ).alias("hurst_milli"),
        )
        .orderBy("event_type")
    )
