"""Round-5 additions — SQL-certified graph clustering (connected
components over the banded-LSH dup graph), classifier-evaluation tier
(exact ROC curve / trapezoid AUC, calibration + Brier decomposition),
and MOSS-style winnowing document fingerprints.

Design rules inherited from the established discipline:
  * exact integer lattices (micro units) with truncating division
    (Spark ``DIV`` == DuckDB ``//``, both toward zero);
  * md5 when a hash must be reproduced verbatim in both engines
    (the j64-md5 / j2-md5 pattern);
  * iterative folds are run for a FIXED unrolled step count that both
    engines execute identically (the j86 Lloyd / f29 CUSUM pattern) —
    early convergence is a fixpoint, so stopping early never diverges;
  * every candidate-generation step is blocked/bucketed — no all-pairs;
  * bounded relations (20 ROC bins, 10 calibration bins) may use tiny
    broadcast joins; volume-scaled relations never see an unpartitioned
    window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables, fan_out
from cassandra_snap_to_hadoop_spark.registry import register
from cassandra_snap_to_hadoop_spark.queries.round4c import (
    _MH_BANDS,
    _MH_N,
    _MH_ROWS,
    _NORM,
    _SHINGLES,
    _mh_sql_hash,
)

# Fixed iteration budget for the unrolled min-label propagation.  Star
# edges hang every bucket member off the bucket's min doc, so component
# diameter is ~2·(bridging buckets); near-dup components are tiny by
# construction and converge in 2-3 rounds (operators/dedup.dup_clusters
# docstring) — 10 is generous and the fixpoint test pins convergence.
_CC_ITERS = 10


def _mh_bands_sql() -> str:
    """DuckDB CTE prefix (toks → sh → mh → bands) producing the banded
    MinHash-md5 bucket relation — the SQL twin of
    operators/dedup.md5_minhash_bands, shared by the j90/j94/j97 oracles
    so the band geometry lives in exactly one generated fragment."""
    mins = ", ".join(f"MIN({_mh_sql_hash(i)}) AS mh_{i}" for i in range(_MH_N))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws('|', "
        + ", ".join(f"mh_{b * _MH_ROWS + r}" for r in range(_MH_ROWS))
        + ") AS bkey FROM mh"
        for b in range(_MH_BANDS)
    )
    return f"""
    toks AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS sh FROM toks
    ), mh AS (
        SELECT doc_id, {mins} FROM sh GROUP BY 1
    ), bands AS (
        {bands}
    )"""


def _cc_sql_edges() -> str:
    """DuckDB CTE prefix producing the star-edge relation of the banded
    MinHash-md5 dup graph — the same buckets as j2_minhash_lsh_md5."""
    return f"""{_mh_bands_sql()}, hubs AS (
        SELECT band, bkey, MIN(doc_id) AS hub
        FROM bands GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), star AS (
        SELECT DISTINCT b.doc_id AS u, h.hub AS v
        FROM bands b JOIN hubs h ON b.band = h.band AND b.bkey = h.bkey
        WHERE b.doc_id <> h.hub
    ), edges AS MATERIALIZED (
        SELECT u, v FROM star UNION SELECT v AS u, u AS v FROM star
    )"""


def _cc_sql_iters(k: int) -> str:
    """k unrolled min-label propagation steps: l0 .. l{k}.

    Every step is AS MATERIALIZED: each l_t references l_{t-1} TWICE, so
    an inlining planner would re-expand the whole chain 2^k times —
    materialization makes the unrolled fold linear, mirroring Spark's
    per-round localCheckpoint in dup_clusters."""
    steps = [
        "l0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS lbl FROM documents)"
    ]
    for t in range(1, k + 1):
        steps.append(
            f"""l{t} AS MATERIALIZED (
        SELECT n.node,
               LEAST(MIN(n.lbl), COALESCE(MIN(p.lbl), MIN(n.lbl))) AS lbl
        FROM l{t - 1} n
        LEFT JOIN edges e ON e.u = n.node
        LEFT JOIN l{t - 1} p ON p.node = e.v
        GROUP BY n.node
    )"""
        )
    return ", ".join(steps)


@register(
    "j90_connected_components",
    oracle=f"""
    WITH {_cc_sql_edges()}, {_cc_sql_iters(_CC_ITERS)}
    SELECT CAST(lbl AS BIGINT) AS component_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(node) AS BIGINT) AS max_doc
    FROM l{_CC_ITERS}
    GROUP BY 1 HAVING COUNT(*) >= 2
    """,
    survey="J90,J2,J40",
)
def j90_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the near-duplicate graph — the cluster
    step every LSH dedup pipeline runs between candidate pairs and
    survivor election (j40 picks the representative; THIS finds the
    groups), hash-certified end-to-end for the first time: the md5 band
    buckets (j2_minhash_lsh_md5's family), the star edges, and the
    min-label propagation itself are restated independently in DuckDB as
    a {_CC_ITERS}-step unrolled CTE and value-matched.

    Parity argument: both engines apply the identical update rule
    lbl_t(v) = min(lbl_(t-1)(v), min over neighbors) — Spark via
    operators/dedup.dup_clusters (the registered j2 cluster machinery,
    max {_CC_ITERS} iterations), the oracle via the unrolled chain.  If
    Spark converges early that's a fixpoint, so extra oracle steps
    change nothing; if neither converges both have executed exactly
    {_CC_ITERS} identical steps.  Equal either way.  The fixpoint itself
    (iteration {_CC_ITERS} == {_CC_ITERS - 1}) is test-pinned.

    Scale shape: edges are generated per (band, bkey) bucket as a STAR
    around the bucket minimum — |bucket| - 1 edges instead of the
    quadratic clique, which is what keeps a 100 TB dup graph linear in
    bucket occupancy; propagation is |V|+|E| hash joins per round
    (hash-min CC; a 1000-executor deployment switches to the implemented
    large-star/small-star variant, operators/dedup.dup_clusters_two_phase
    — same join shapes, O(log n) rounds instead of O(diameter); measured
    round 6: len-6000 chain in 14 rounds vs hash-min's one-round-per-hop,
    SCALE.md cc-chains row — near-dup components are shallow so hash-min
    stays the registered path here).
    Driver involvement: one boolean convergence check per round
    (KB-bounded, the dup_clusters contract)."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import (
        dup_clusters,
        md5_minhash_bands,
    )

    d = Tables(spark, sf_dir).documents
    # r11 (guide §2.4): ``bands`` feeds the hub agg AND the pair join —
    # one cut runs the MinHash pipeline once, not twice.
    bands = md5_minhash_bands(d, n_hashes=_MH_N, rows_per_band=_MH_ROWS).localCheckpoint(
        eager=False
    )
    hubs = (
        bands.groupBy("band", "bkey")
        .agg(F.min("doc_id").alias("hub"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .drop("n")
    )
    # hub = bucket min, so hub < doc_id on every surviving row: the star
    # edges are already in (id_a < id_b) order for dup_clusters.
    pairs = (
        bands.join(hubs, ["band", "bkey"])
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("id_a"), F.col("doc_id").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)  # computed once, reused every round
    )
    nodes = d.select(F.col("doc_id").alias("id"))
    labels = dup_clusters(nodes, pairs, max_iterations=_CC_ITERS)
    return (
        labels.groupBy("cluster_id")
        .agg(F.count("*").alias("n_docs"), F.max("id").alias("max_doc"))
        .filter(F.col("n_docs") >= 2)
        .select(
            F.col("cluster_id").alias("component_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("max_doc").cast("long").alias("max_doc"),
        )
    )


# Deterministic frozen "model" shared by e62/e63: the score is the
# embedding's projection onto a fixed md5-signed hyperplane (sign of
# dimension d = +1 iff the first hex digit of md5('dim:' || d) < '8' —
# the established engine-identical coin flip), on the exact micro
# lattice.  A frozen score is the honest setup for evaluation metrics:
# ROC/calibration AUDIT a given model, they don't train one.
_SIGN_SQL = "CASE WHEN substr(md5('dim:' || dim), 1, 1) < '8' THEN 1 ELSE -1 END"
_SCORE_SQL = f"""
    ex AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS micro
        FROM embeddings
    ), sc AS (
        SELECT vec_id, MIN(label) AS label,
               SUM(micro * ({_SIGN_SQL})) AS s
        FROM ex GROUP BY 1
    )"""

_ROC_BINS = 20


def _score_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SCORE_SQL: (vec_id, label, s) on the micro lattice.

    r11 optimization (guide §4.1/§2.4): formerly posexplode → 64× rows →
    groupBy(vec_id) hash agg — one full shuffle of the exploded relation
    for every consumer (e62/e63/e72/e75/e84…).  The signed sum is now a
    per-row codegen array fold (``aggregate`` over the indexed
    ``transform``): identical md5 coin per dim, identical ROUND micro
    lattice, identical BIGINT sum (integer addition is order-free) — and
    ZERO exchanges: score computation is now a narrow projection."""
    e = Tables(spark, sf_dir).embeddings
    return fan_out(e).select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(transform(embedding, (x, i) ->"
            " CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
            " * (CASE WHEN substring(md5(concat('dim:', CAST(i AS STRING))), 1, 1)"
            "          < '8' THEN 1 ELSE -1 END)),"
            " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        ).alias("s"),
    )


@register(
    "e62_roc_auc",
    oracle=f"""
    WITH {_SCORE_SQL}, bounds AS (
        SELECT MIN(s) AS lo, MAX(s) AS hi FROM sc
    ), binned AS (
        SELECT CAST((s - lo) * {_ROC_BINS} // (hi - lo + 1) AS INTEGER) AS bin,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        FROM sc CROSS JOIN bounds
    ), bins AS (
        SELECT bin, CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
        FROM binned GROUP BY 1
    ), cum AS (
        SELECT a.bin, MIN(a.n_pos) AS n_pos, MIN(a.n_neg) AS n_neg,
               SUM(b.n_pos) AS cum_tp, SUM(b.n_neg) AS cum_fp
        FROM bins a JOIN bins b ON b.bin >= a.bin
        GROUP BY a.bin
    ), tot AS (
        SELECT SUM(n_pos) AS p, SUM(n_neg) AS nn FROM bins
    )
    SELECT CAST(bin AS INTEGER) AS bin, n_pos, n_neg,
           CAST(cum_tp AS BIGINT) AS cum_tp,
           CAST(cum_fp AS BIGINT) AS cum_fp,
           CAST(cum_tp * 1000000 // p AS BIGINT) AS tpr_ppm,
           CAST(cum_fp * 1000000 // nn AS BIGINT) AS fpr_ppm,
           CAST((2 * cum_tp - n_pos) * n_neg AS BIGINT) AS area2_num
    FROM cum CROSS JOIN tot
    """,
    survey="E62,E45,J78",
)
def e62_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC curve + trapezoid AUC of a frozen linear scorer against
    the binary relevance label (label < 5) — the classifier-evaluation
    primitive the clustering-eval tier (e53 kappa, j78 confusion matrix)
    is missing; e45 gives a CLOSED-FORM rank AUC per source, THIS emits
    the operating-point curve a threshold choice actually needs.

    Exactness: the score is an exact BIGINT (micro lattice × ±1 signs),
    bucketed into {_ROC_BINS} equi-width score bins by pure integer
    arithmetic.  Descending-threshold cumulative TP/FP come from a
    b.bin >= a.bin self-join of the ≤{_ROC_BINS}-row bin relation (never
    an unpartitioned window); the per-step trapezoid area is kept as the
    DOUBLED integer numerator area2_num = (2·cum_tp − n_pos)·n_neg, so
    AUC = Σ area2_num / (2·P·N) is a single final division — the
    pure-Python trapezoid pin reproduces it exactly.

    Scale shape: one posexplode + hash agg for the scores (map-side
    combinable), a broadcast 2-scalar bounds join, one hash agg to
    {_ROC_BINS} rows, then KB-sized broadcast joins.  Nothing after the
    score agg scales with corpus size."""
    # r11 (guide §2.4): the narrow score projection feeds the bounds fold
    # AND the binning (2 scans + 2 array folds → 1), and the ≤bins-row
    # histogram feeds both cumulative-join sides and the totals fold.
    sc = _score_df(spark, sf_dir).localCheckpoint(eager=False)
    bounds = sc.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    binned = sc.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"CAST((s - lo) * {_ROC_BINS} DIV (hi - lo + 1) AS INT)").alias(
            "bin"
        ),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("y"),
    )
    bins = binned.groupBy("bin").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("n_neg"),
    ).localCheckpoint(eager=False)
    a, b = bins.alias("a"), F.broadcast(bins.alias("b"))
    cum = (
        a.join(b, F.col("b.bin") >= F.col("a.bin"))
        .groupBy(F.col("a.bin").alias("bin"))
        .agg(
            F.min(F.col("a.n_pos")).alias("n_pos"),
            F.min(F.col("a.n_neg")).alias("n_neg"),
            F.sum(F.col("b.n_pos")).alias("cum_tp"),
            F.sum(F.col("b.n_neg")).alias("cum_fp"),
        )
    )
    tot = bins.agg(
        F.sum("n_pos").alias("p"), F.sum("n_neg").alias("nn")
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("int").alias("bin"),
        "n_pos",
        "n_neg",
        F.col("cum_tp").cast("long").alias("cum_tp"),
        F.col("cum_fp").cast("long").alias("cum_fp"),
        F.expr("cum_tp * 1000000 DIV p").cast("long").alias("tpr_ppm"),
        F.expr("cum_fp * 1000000 DIV nn").cast("long").alias("fpr_ppm"),
        ((2 * F.col("cum_tp") - F.col("n_pos")) * F.col("n_neg"))
        .cast("long")
        .alias("area2_num"),
    )


@register(
    "e63_brier_calibration",
    oracle=f"""
    WITH {_SCORE_SQL}, probs AS (
        SELECT vec_id,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
               CAST(FLOOR(1000000.0 / (1.0 + exp(-(CAST(s AS DOUBLE)
                          / 1000000.0))) + 0.5) AS BIGINT) AS p_micro
        FROM sc
    )
    SELECT CAST(LEAST(p_micro // 100000, 9) AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro,
           CAST(SUM((p_micro - y * 1000000) * (p_micro - y * 1000000)
                    // 1000000) AS BIGINT) AS brier_micro_sum,
           CAST(ABS(SUM(p_micro) - SUM(y) * 1000000) AS BIGINT) AS gap_micro
    FROM probs GROUP BY 1
    """,
    survey="E63,E62,L8",
)
def e63_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + per-bin Brier decomposition of the frozen
    sigmoid-calibrated scorer (e62's hyperplane score squashed through
    1/(1+e^(−s/1e6))) — the calibration audit that tells you whether the
    model's probabilities MEAN anything before j19-style percentile cuts
    trust them.  Per decile-of-predicted-probability bin: count,
    positives, Σp (micro), Σ(p−y)² (micro, the Brier numerator), and the
    calibration gap |Σp − Σy| — ECE is Σ gap_micro / (n·1e6).

    Exactness: the sigmoid is evaluated ONCE per row with the l8-proven
    single-rounding order (1e6/(1+exp) then half-up floor — computing
    1/(1+e) first and multiplying adds a second rounding that can flip
    the micro digit); every aggregate downstream of p_micro is pure
    BIGINT arithmetic with row-level truncating division mirrored
    verbatim on both engines.

    Scale shape: score agg as e62, then one hash agg to ≤10 rows — a
    single full scan, no joins, no windows."""
    sc = _score_df(spark, sf_dir)
    probs = sc.select(
        F.when(F.col("label") < 5, 1).otherwise(0).alias("y"),
        F.floor(
            1000000.0 / (1.0 + F.exp(-(F.col("s").cast("double") / 1000000.0)))
            + 0.5
        )
        .cast("long")
        .alias("p_micro"),
    )
    return (
        probs.groupBy(
            F.least(F.expr("p_micro DIV 100000"), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("p_micro").cast("long").alias("sum_p_micro"),
            F.sum(
                F.expr(
                    "(p_micro - y * 1000000) * (p_micro - y * 1000000)"
                    " DIV 1000000"
                )
            )
            .cast("long")
            .alias("brier_micro_sum"),
            F.abs(F.sum("p_micro") - F.sum("y") * 1000000)
            .cast("long")
            .alias("gap_micro"),
        )
    )


_WIN_K = 4  # gram width (words)
_WIN_W = 4  # winnowing window (grams)
_WIN_DF_CAP = 50  # drop fingerprints shared by more docs (boilerplate)


@register(
    "j91_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents
    ), grams AS (
        SELECT doc_id, i AS pos,
               array_to_string(words[i:i+{_WIN_K - 1}], ' ') AS g,
               len(words) - {_WIN_K - 1} AS n_grams
        FROM (
            SELECT doc_id, words,
                   unnest(range(1, len(words) - {_WIN_K - 2})) AS i
            FROM toks WHERE len(words) >= {_WIN_K}
        )
    ), gh AS (
        SELECT doc_id, pos, n_grams,
               CAST(CAST(('0x' || substr(md5(g), 1, 15)) AS UBIGINT)
                    AS BIGINT) AS h
        FROM grams
    ), win AS (
        SELECT doc_id, pos, n_grams,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING) AS fp
        FROM gh
    ), fps AS (
        SELECT DISTINCT doc_id, fp FROM win
        WHERE pos <= n_grams - {_WIN_W - 1}
    ), freq AS (
        SELECT fp, COUNT(*) AS df FROM fps GROUP BY 1
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM fps a
    JOIN freq f ON f.fp = a.fp AND f.df <= {_WIN_DF_CAP}
    JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
    survey="J91,J2,J47",
)
def j91_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing (Schleimer, Wilkerson & Aiken 2003) document
    fingerprints: word {_WIN_K}-grams → 60-bit md5 hashes → the MINIMUM
    hash of every {_WIN_W}-gram sliding window is a selected fingerprint
    — the guarantee is that any match of ≥ k+w−1 consecutive words
    between two documents shares at least one selected fingerprint, at
    ~2/(w+1) of the full gram-set's storage.  Output: document pairs
    sharing ≥2 selected fingerprints (df-capped at {_WIN_DF_CAP} to shed
    boilerplate) with the shared count — the plagiarism/near-dup
    detector that complements MinHash (set overlap) with POSITIONAL
    locality (contiguous spans).

    This is the hash-SET variant (distinct selected hash values per
    doc); classic winnowing also records positions for extent recovery —
    the set is what pair detection needs.

    Scale shape: the sliding min is a PARTITIONED window (per doc,
    ordered by position — embarrassingly parallel); pair generation is
    an equi self-join on the fingerprint value with a document-frequency
    cap, so bucket occupancy — never corpus size — bounds the quadratic
    term (the j2/j50 argument).  Everything is codegen'd JVM expressions;
    no Python anywhere."""
    from pyspark.sql import Window

    d = Tables(spark, sf_dir).documents
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    toks = fan_out(d).select("doc_id", words.alias("words")).filter(
        F.size("words") >= _WIN_K
    )
    # gram at 1-based pos i = words[i .. i+K-1]; posexplode is 0-based.
    grams = toks.select(
        "doc_id",
        (F.size("words") - (_WIN_K - 1)).alias("n_grams"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(words) - {_WIN_K - 1}),"
                f" i -> concat_ws(' ', slice(words, i, {_WIN_K})))"
            )
        ).alias("pos0", "g"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, _WIN_W - 1)
    )
    # r11: ``fps`` feeds the df aggregation AND (via ``kept``) both sides
    # of the pair self-join — without a lineage cut the tokenize + explode
    # + md5 + sliding-min subtree re-derives once per consumer (4 corpus
    # scans in the before-plan, guide §2.4).  The selected-fingerprint
    # relation is two longs per row (~2/(w+1) of the gram count), so
    # materializing it once is cheap; ``kept`` is cut too so the df join
    # runs once, not once per join side.
    fps = (
        grams.withColumn("fp", F.min("h").over(w))
        .filter(F.col("pos") <= F.col("n_grams") - (_WIN_W - 1))
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=False)
    )
    freq = fps.groupBy("fp").agg(F.count("*").alias("df"))
    kept = fps.join(freq.filter(F.col("df") <= _WIN_DF_CAP), "fp").localCheckpoint(
        eager=False
    )
    a = kept.select(F.col("fp"), F.col("doc_id").alias("id_a"))
    b = kept.select(F.col("fp").alias("fp_b"), F.col("doc_id").alias("id_b"))
    return (
        a.join(b, (F.col("fp") == F.col("fp_b")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
    )


# ------------------------------------------------------------------ batch 2

# 6 sign bits → 64 buckets: sized to the fixture corpus (500-5000
# vectors → ~8-80 per bucket) so queries actually FIND candidates; a
# 100 TB index raises the bit count with corpus size (buckets ≈ n/64
# keeps candidate generation constant per query) — the bit count is the
# recall/cost dial, the certified arithmetic is identical at any width.
_SRP_PLANES = 6
# md5-derived integer hyperplane weight for (plane p, dimension d):
# uniform in [-1e6, +1e6].  Only the SIGN of the projection matters for
# SRP, so integer weights on the micro lattice make the bucket bits
# exact BIGINT arithmetic on both engines — the whole LSH index becomes
# hash-certifiable (VERDICT r4 item 8: the ANN ladder's SQL rung).
_SRP_W_SQL = (
    "CAST(CAST(('0x' || substr(md5('srp:' || p || ':' || dim), 1, 15))"
    " AS UBIGINT) AS BIGINT) % 2000001 - 1000000"
)


@register(
    "j3_knn_srp_md5",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS micro
        FROM embeddings
    ), weights AS (
        SELECT t.range AS p, d.dim, {_SRP_W_SQL} AS w
        FROM range({_SRP_PLANES}) t CROSS JOIN (SELECT DISTINCT dim FROM ex) d
    ), dots AS (
        SELECT e.vec_id, w.p, SUM(e.micro * w.w) AS dot
        FROM ex e JOIN weights w ON w.dim = e.dim
        GROUP BY 1, 2
    ), buckets AS (
        SELECT vec_id,
               SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p)
                        ELSE 0 END) AS bucket
        FROM dots GROUP BY 1
    ), cand AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id
        FROM buckets q JOIN buckets c
          ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 8
    ), scored AS (
        SELECT c.q_id, c.n_id, SUM(a.micro * b.micro) AS ip_mm
        FROM cand c
        JOIN ex a ON a.vec_id = c.q_id
        JOIN ex b ON b.vec_id = c.n_id AND b.dim = a.dim
        GROUP BY 1, 2
    ), ranked AS (
        SELECT q_id, n_id, ip_mm,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY ip_mm DESC, n_id) AS rnk
        FROM scored
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rnk AS INTEGER) AS rnk,
           CAST(n_id AS BIGINT) AS n_id, CAST(ip_mm AS BIGINT) AS ip_mm
    FROM ranked WHERE rnk <= 3
    """,
    survey="J92,J3,J48",
)
def j3_knn_srp_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-CERTIFIED rung of the ANN ladder (j3 brute → IVF → SRP →
    PQ): sign-random-projection LSH with md5-derived INTEGER hyperplanes,
    so the bucket index — 16 projection sign bits packed into one BIGINT
    — is exact arithmetic DuckDB reproduces digit-for-digit, unlike the
    float-hyperplane production tier (j3_knn_srp, rows-only).  Per query
    vector (vec_id < 8, the established query set): top-3 same-bucket
    neighbors by exact inner product on the micro lattice (embeddings
    are unit-norm, so the integer IP ranks identically to cosine) with
    deterministic n_id tiebreak.

    Scale shape: the weight relation is |planes|·|dims| ≈ KB (broadcast);
    bucket bits are one hash agg over the posexploded corpus (map-side
    combinable); candidates are generated per bucket (never all-pairs —
    16 bits ≈ corpus/65k per bucket in expectation); verification joins
    only the candidate set.  The top-3 window is PARTITIONED by query.
    Recall-vs-bruteforce is test-pinned; queries whose bucket holds no
    other vector simply emit nothing (honest SRP behavior — multi-probe
    is the documented recall upgrade at scale)."""
    e = Tables(spark, sf_dir).embeddings
    # r11 (guide §2.4): the packed bucket relation feeds the query slice
    # AND the candidate side — cut it (fresh-session noop medians at
    # sf0.1: 1.94 s before, 1.75 s with this cut).  Cutting the
    # posexploded micro lattice itself was measured SLOWER (2.09 s):
    # materializing the 64× row explosion costs more than the repeated
    # narrow explode — the j127 heavy-relation rule.
    ex = fan_out(e).select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        "dim",
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("micro"),
    )
    dims = ex.select("dim").distinct()
    planes = spark.range(_SRP_PLANES).select(F.col("id").cast("int").alias("p"))
    weights = dims.crossJoin(F.broadcast(planes)).select(
        "p",
        "dim",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "",
                            F.lit("srp:"),
                            F.col("p").cast("string"),
                            F.lit(":"),
                            F.col("dim").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2000001
            - 1000000
        ).alias("w"),
    )
    dots = (
        ex.join(F.broadcast(weights), "dim")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("micro") * F.col("w")).alias("dot"))
    )
    buckets = dots.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)"))
            .otherwise(F.lit(0))
        ).alias("bucket")
    ).localCheckpoint(eager=False)
    q = buckets.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "bucket"
    )
    cand = q.join(
        buckets.select(F.col("vec_id").alias("n_id"), F.col("bucket").alias("b2")),
        (F.col("bucket") == F.col("b2")) & (F.col("q_id") != F.col("n_id")),
    ).select("q_id", "n_id")
    ea = ex.select(F.col("vec_id").alias("q_id"), "dim", F.col("micro").alias("ma"))
    eb = ex.select(
        F.col("vec_id").alias("eb_id"),
        F.col("dim").alias("dim_b"),
        F.col("micro").alias("mb"),
    )
    scored = (
        cand.join(ea, "q_id")
        .join(eb, (F.col("n_id") == F.col("eb_id")) & (F.col("dim") == F.col("dim_b")))
        .groupBy("q_id", "n_id")
        .agg(F.sum(F.col("ma") * F.col("mb")).alias("ip_mm"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("ip_mm").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            F.col("rnk").cast("int").alias("rnk"),
            F.col("n_id").cast("long").alias("n_id"),
            F.col("ip_mm").cast("long").alias("ip_mm"),
        )
    )


@register(
    "e67_kendall_tau",
    oracle="""
    WITH o AS (
        SELECT c.c_nationkey AS nation,
               epoch_us(o.o_orderdate) // 86400000000 // 30 AS m,
               COUNT(*) AS x,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), pairs AS (
        SELECT a.nation,
               CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
               CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
               CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tie_x,
               CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS tie_y
        FROM o a JOIN o b ON a.nation = b.nation AND a.m < b.m
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS nc,
           CAST(SUM(disc) AS BIGINT) AS nd,
           CAST(SUM(tie_x) AS BIGINT) AS tx,
           CAST(SUM(tie_y) AS BIGINT) AS ty,
           CASE WHEN SUM(conc) + SUM(disc) + SUM(tie_x) > 0
                 AND SUM(conc) + SUM(disc) + SUM(tie_y) > 0
                THEN CAST(FLOOR((SUM(conc) - SUM(disc)) * 1000.0
                     / sqrt((SUM(conc) + SUM(disc) + SUM(tie_x)) * 1.0
                            * (SUM(conc) + SUM(disc) + SUM(tie_y)))) AS BIGINT)
                ELSE NULL END AS tau_milli
    FROM pairs GROUP BY 1
    """,
    survey="E67,E46,E51",
)
def e67_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b per customer nation between monthly order count
    and monthly revenue — the RANK-correlation companion of e46 Spearman
    (tau's pairwise-inversion form is more robust to a few wild months
    and is what tie-heavy business series need, hence the tau-B tie
    correction).  Months are tz-free 30-day epoch buckets (the f22/e27
    defense).

    Exactness: concordant/discordant/tie counts are pure BIGINT
    comparisons over the pairwise month lattice; tau-b's denominator
    sqrt runs ONCE per nation on exact integer products in identical op
    order, milli-quantized with FLOOR (the e47 continuity-z discipline);
    pinned against scipy-free pure-Python pair counting in tests.

    Scale shape: the quadratic term is |months|² per nation — months
    are CALENDAR-bounded, so the pairwise lattice is constant in corpus
    volume (the e51 Theil-Sen argument); the only volume-scaled work is
    the orders⋈customer pre-agg (one shuffle, AQE-sized)."""
    t = Tables(spark, sf_dir)
    o = (
        t.orders.join(
            t.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.expr("unix_micros(o_orderdate) DIV 86400000000 DIV 30").alias("m"),
        )
        .agg(
            F.count("*").alias("x"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b, (F.col("a.nation") == F.col("b.nation")) & (F.col("a.m") < F.col("b.m"))
    ).select(
        F.col("a.nation").alias("nation"),
        ((F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))).alias("prod"),
        (F.col("a.x") == F.col("b.x")).alias("ex"),
        (F.col("a.y") == F.col("b.y")).alias("ey"),
    )
    agg = pairs.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("prod") > 0, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(F.col("prod") < 0, 1).otherwise(0)).cast("long").alias("nd"),
        F.sum(F.when(F.col("ex") & ~F.col("ey"), 1).otherwise(0))
        .cast("long")
        .alias("tx"),
        F.sum(F.when(F.col("ey") & ~F.col("ex"), 1).otherwise(0))
        .cast("long")
        .alias("ty"),
    )
    denom_ok = ((F.col("nc") + F.col("nd") + F.col("tx")) > 0) & (
        (F.col("nc") + F.col("nd") + F.col("ty")) > 0
    )
    tau = F.floor(
        (F.col("nc") - F.col("nd"))
        * 1000.0
        / F.sqrt(
            (F.col("nc") + F.col("nd") + F.col("tx")).cast("double")
            * (F.col("nc") + F.col("nd") + F.col("ty"))
        )
    ).cast("long")
    return agg.select(
        F.col("nation").cast("long").alias("nation"),
        "n_pairs",
        "nc",
        "nd",
        "tx",
        "ty",
        F.when(denom_ok, tau).otherwise(F.lit(None)).alias("tau_milli"),
    )


@register(
    "f33_changepoint_binseg",
    oracle="""
    WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
        SELECT b.event_type, b.d0 + s.range AS day
        FROM bounds b CROSS JOIN range(0, 100000) s
        WHERE b.d0 + s.range <= b.d1
    ), filled AS (
        SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n
        FROM spine s LEFT JOIN daily d
          ON d.event_type = s.event_type AND d.day = s.day
    ), cum AS (
        SELECT event_type, day, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
               SUM(n) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS s1,
               SUM(n) OVER (PARTITION BY event_type) AS s,
               COUNT(*) OVER (PARTITION BY event_type) AS nn
        FROM filled
    ), gains AS (
        SELECT event_type, day, i, nn, s1, s,
               s1 * s1 * 1000000 // i
               + (s - s1) * (s - s1) * 1000000 // (nn - i)
               - s * s * 1000000 // nn AS reduction_micro
        FROM cum WHERE i < nn
    ), best AS (
        SELECT event_type, day, i, nn, s1, s, reduction_micro,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY reduction_micro DESC, day) AS r
        FROM gains
    )
    SELECT event_type, CAST(day AS BIGINT) AS split_day,
           CAST(i AS BIGINT) AS n_days_left,
           CAST(nn - i AS BIGINT) AS n_days_right,
           CAST(s1 AS BIGINT) AS sum_left,
           CAST(s - s1 AS BIGINT) AS sum_right,
           CAST(reduction_micro AS BIGINT) AS reduction_micro
    FROM best WHERE r = 1
    """,
    survey="F33,F15,E40",
)
def f33_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single binary-segmentation changepoint per event type: the split
    day maximizing the SSE reduction of a two-segment piecewise-constant
    fit over the zero-filled daily count series — the offline mean-shift
    localizer that complements f15's online CUSUM alarm (CUSUM says
    "something drifted", binseg says WHERE; recursing on the halves is
    the standard multi-changepoint extension, one extra pass per split).

    Exactness: the variance decomposition needs only integer prefix
    sums — reduction = S1²·1e6/n1 + S2²·1e6/n2 − S²·1e6/n with per-term
    truncating DIV mirrored verbatim (overflow budget: S ≤ |events|
    ≈ 1e6 at sf0.1 ⇒ S²·1e6 ≤ 1e18 < 2⁶³); argmax resolved by a
    deterministic (reduction DESC, day) rank.  Pinned against a pure-
    Python O(n) fold in tests.

    Scale shape: daily pre-agg (map-side combinable) → per-type
    PARTITIONED windows over the CALENDAR-bounded spine → 1-row-per-type
    rank.  Nothing after the pre-agg scales with event volume."""
    from pyspark.sql import Window

    e = Tables(spark, sf_dir).events
    daily = e.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(F.count("*").alias("n"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    filled = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wa = Window.partitionBy("event_type")
    cum = filled.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("i"),
        F.sum("n").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("s1"),
        F.sum("n").over(wa).alias("s"),
        F.count("*").over(wa).alias("nn"),
    )
    gains = cum.filter(F.col("i") < F.col("nn")).withColumn(
        "reduction_micro",
        F.expr(
            "s1 * s1 * 1000000 DIV i"
            " + (s - s1) * (s - s1) * 1000000 DIV (nn - i)"
            " - s * s * 1000000 DIV nn"
        ),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("reduction_micro").desc(), F.col("day")
    )
    return (
        gains.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("day").cast("long").alias("split_day"),
            F.col("i").cast("long").alias("n_days_left"),
            (F.col("nn") - F.col("i")).cast("long").alias("n_days_right"),
            F.col("s1").cast("long").alias("sum_left"),
            (F.col("s") - F.col("s1")).cast("long").alias("sum_right"),
            F.col("reduction_micro").cast("long").alias("reduction_micro"),
        )
    )


_NOVELTY_BATCH = 50  # docs per simulated ingest batch (doc_id DIV 50)


@register(
    "j92_ngram_novelty",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id // {_NOVELTY_BATCH} AS batch,
               string_split({_NORM}, ' ') AS words
        FROM documents
    ), grams AS (
        SELECT DISTINCT batch, unnest({_SHINGLES}) AS g FROM toks
    ), first_seen AS (
        SELECT g, MIN(batch) AS first_batch FROM grams GROUP BY 1
    )
    SELECT CAST(g.batch AS BIGINT) AS batch,
           CAST(COUNT(*) AS BIGINT) AS distinct_grams,
           CAST(SUM(CASE WHEN f.first_batch = g.batch THEN 1 ELSE 0 END)
                AS BIGINT) AS new_grams,
           CAST(SUM(CASE WHEN f.first_batch = g.batch THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM grams g JOIN first_seen f ON f.g = g.g
    GROUP BY 1
    """,
    survey="J93,J57,E27",
)
def j92_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty per ingest batch: of each batch's distinct word
    3-grams, how many had NEVER appeared in an earlier batch — the
    content-freshness curve a crawl pipeline watches to decide when a
    source is exhausted (novelty_ppm decays toward boilerplate-only as
    batches repeat; e27's HLL distinct-to-date tracks the same frontier
    approximately, THIS is the exact per-batch attribution).  Batches
    simulate ingest order as doc_id DIV {_NOVELTY_BATCH}.

    Exactness: pure counting — first-occurrence attribution is a MIN
    over the (gram, batch) relation, joined back in one pass; novelty
    rate on the ppm lattice with truncating DIV.

    Scale shape: shingle explode → two hash aggs (distinct + min) + one
    equi join keyed on the gram — the j57 gram-agg shape; nothing is
    ever ordered globally and the join key is the gram hash domain
    (uniform, no skew)."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import shingles

    d = Tables(spark, sf_dir).documents
    grams = (
        fan_out(d)
        .select(
            F.expr(f"doc_id DIV {_NOVELTY_BATCH}").alias("batch"),
            F.explode(shingles(F.col("text"), 3)).alias("g"),
        )
        .distinct()
    )
    first_seen = grams.groupBy("g").agg(F.min("batch").alias("first_batch"))
    return (
        grams.join(first_seen, "g")
        .groupBy("batch")
        .agg(
            F.count("*").cast("long").alias("distinct_grams"),
            F.sum(F.when(F.col("first_batch") == F.col("batch"), 1).otherwise(0))
            .cast("long")
            .alias("new_grams"),
        )
        .select(
            F.col("batch").cast("long").alias("batch"),
            "distinct_grams",
            "new_grams",
            F.expr("new_grams * 1000000 DIV distinct_grams")
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


# ------------------------------------------------------------------ batch 3

# Shared double-precision fragments for e64: BOTH engines evaluate these
# verbatim (Spark F.expr and the DuckDB oracle are built from the SAME
# Python strings), so the op order — hence the IEEE result — is
# identical; the only cross-engine risk is last-ulp libm drift in
# exp/sqrt, absorbed by the micro floor (the e52/e47 discipline).
#
# Welch z from exact integer sufficient statistics (n, Σc, Σc²) of the
# two calendar halves:
_WELCH_Z = (
    "((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)"
    " / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1) / (n1-1)) / n1"
    "      + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2) / (n2-1)) / n2))"
)
# Two-sided normal p-value via Abramowitz-Stegun 7.1.26 (|err| < 7.5e-8,
# far above the micro floor), Horner form, az = |z|:
_AS_P_TWO = (
    "(2.0 * (exp(-az*az/2.0) / 2.5066282746310002)"
    " * (((((1.330274429 * (1.0/(1.0+0.2316419*az)) - 1.821255978)"
    "       * (1.0/(1.0+0.2316419*az)) + 1.781477937)"
    "       * (1.0/(1.0+0.2316419*az)) - 0.356563782)"
    "       * (1.0/(1.0+0.2316419*az)) + 0.319381530)"
    "       * (1.0/(1.0+0.2316419*az))))"
)


@register(
    "e64_benjamini_hochberg",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    ), mid AS (
        SELECT (MIN(day) + MAX(day) + 1) // 2 AS m_day FROM ev
    ), halves AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN day <  m_day THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN day <  m_day THEN c ELSE 0 END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN day <  m_day THEN c*c ELSE 0 END) AS BIGINT) AS q1,
               CAST(SUM(CASE WHEN day >= m_day THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN day >= m_day THEN c ELSE 0 END) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN day >= m_day THEN c*c ELSE 0 END) AS BIGINT) AS q2
        FROM ev CROSS JOIN mid GROUP BY 1
    ), zed AS (
        SELECT event_type, n1, n2, {_WELCH_Z} AS z FROM halves
    ), pv AS (
        SELECT event_type, n1, n2,
               CAST(FLOOR(z * 1000) AS BIGINT) AS z_milli,
               CAST(FLOOR({_AS_P_TWO} * 1000000) AS BIGINT) AS p_micro
        FROM (SELECT *, abs(z) AS az FROM zed)
    ), ranked AS (
        SELECT a.event_type, MIN(a.n1) AS n1, MIN(a.n2) AS n2,
               MIN(a.z_milli) AS z_milli, MIN(a.p_micro) AS p_micro,
               CAST(1 + SUM(CASE WHEN b.p_micro < a.p_micro
                                   OR (b.p_micro = a.p_micro
                                       AND b.event_type < a.event_type)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS rnk,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM pv a JOIN pv b ON TRUE
        GROUP BY a.event_type
    ), cutoff AS (
        SELECT COALESCE(MAX(CASE WHEN p_micro * m <= rnk * 50000
                                 THEN rnk END), 0) AS k
        FROM ranked
    )
    SELECT r.event_type, r.n1, r.n2, r.z_milli, r.p_micro,
           CAST(r.rnk AS BIGINT) AS rnk,
           CAST(r.rnk * 50000 // r.m AS BIGINT) AS bh_threshold_micro,
           r.rnk <= c.k AS rejected
    FROM ranked r CROSS JOIN cutoff c
    """,
    survey="E64,E52,E58",
)
def e64_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-event-type drift
    tests: Welch z between the first and second calendar halves of
    `value`, two-sided normal p via the Abramowitz-Stegun 7.1.26 tail
    (|err| < 7.5e-8 ≪ the micro floor), then the step-up rule — reject
    every p ranked ≤ K where K is the largest i with p_(i) ≤ (i/m)·α,
    α = 0.05.  Multiple testing is what turns the statistics tier (e52
    Welch, e45 U, e47 trend) into a fleet-wide MONITOR: without FDR
    control, running m drift tests nightly at α guarantees false alarms.

    Exactness: sufficient statistics are exact BIGINTs; the z → p chain
    is built from the SAME Python format strings on both engines
    (identical op order); the BH comparison p_(i)·m ≤ i·α·1e6 is pure
    integer arithmetic on the micro lattice; ranks are deterministic
    (p, event_type).  Pinned against scipy-free pure-Python A-S in
    tests.

    Scale shape: one conditional-agg scan to |types| rows, then a
    broadcast self-join of that domain-bounded relation for ranks (the
    e62 pattern — no unpartitioned window); the corpus is touched
    once."""
    e = Tables(spark, sf_dir).events
    # r11 (guide §2.4): the |types|-row pv relation feeds both
    # rank-join sides and is cut; the events projection is NOT cut —
    # persisting a data-sized relation costs more than the second
    # parquet scan (guide §5).
    ev = e.select(
        "event_type",
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    mid = ev.agg(
        F.expr("(MIN(day) + MAX(day) + 1) DIV 2").alias("m_day")
    )
    h = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("day") < F.col("m_day"), 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("day") < F.col("m_day"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("s1"),
            F.sum(
                F.when(F.col("day") < F.col("m_day"), F.col("c") * F.col("c"))
                .otherwise(0)
            )
            .cast("long")
            .alias("q1"),
            F.sum(F.when(F.col("day") >= F.col("m_day"), 1).otherwise(0))
            .cast("long")
            .alias("n2"),
            F.sum(F.when(F.col("day") >= F.col("m_day"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("s2"),
            F.sum(
                F.when(F.col("day") >= F.col("m_day"), F.col("c") * F.col("c"))
                .otherwise(0)
            )
            .cast("long")
            .alias("q2"),
        )
    )
    pv = (
        h.withColumn("z", F.expr(_WELCH_Z))
        .withColumn("az", F.abs(F.col("z")))
        .select(
            "event_type",
            "n1",
            "n2",
            F.floor(F.col("z") * 1000).cast("long").alias("z_milli"),
            F.floor(F.expr(_AS_P_TWO) * 1000000).cast("long").alias("p_micro"),
        )
        .localCheckpoint(eager=False)
    )
    a, b = pv.alias("a"), F.broadcast(pv.alias("b"))
    ranked = (
        a.join(b, F.lit(True))
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.min("a.n1").alias("n1"),
            F.min("a.n2").alias("n2"),
            F.min("a.z_milli").alias("z_milli"),
            F.min("a.p_micro").alias("p_micro"),
            (
                1
                + F.sum(
                    F.when(
                        (F.col("b.p_micro") < F.col("a.p_micro"))
                        | (
                            (F.col("b.p_micro") == F.col("a.p_micro"))
                            & (F.col("b.event_type") < F.col("a.event_type"))
                        ),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("rnk"),
            F.count("*").cast("long").alias("m"),
        )
    )
    cutoff = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_micro") * F.col("m") <= F.col("rnk") * 50000,
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(cutoff)).select(
        "event_type",
        "n1",
        "n2",
        "z_milli",
        "p_micro",
        "rnk",
        F.expr("rnk * 50000 DIV m").cast("long").alias("bh_threshold_micro"),
        (F.col("rnk") <= F.col("k")).alias("rejected"),
    )


_PERIODS = (3, 5, 7, 14, 30)

# Pre-tabulated micro-quantized Fourier factors shared by f34 and f60
# (ADVICE r10 item 4): cos(2πt/p) depends only on t mod p and
# Σ|periods| = 59, so BOTH engines consume the SAME pinned integer
# constants instead of calling their own libm per row — the previous
# FLOOR(n·cos(…)·1e6) form risked a 1-ulp cos() divergence flipping a
# unit at a quantization boundary on other platforms.  Tabulated once
# driver-side (pinned against math.cos in tests/test_round10.py),
# injected as a VALUES literal into the oracles and a broadcast
# relation into the plans; the per-row term is the EXACT integer
# product n·c — no float touches the lattice.
import math as _math  # noqa: E402

FOURIER_MICRO: tuple[tuple[int, int, int, int], ...] = tuple(
    (
        p,
        r,
        round(_math.cos(2 * _math.pi * r / p) * 1_000_000),
        round(_math.sin(2 * _math.pi * r / p) * 1_000_000),
    )
    for p in _PERIODS
    for r in range(p)
)
FOURIER_SQL = ", ".join(f"({p}, {r}, {c}, {s})" for p, r, c, s in FOURIER_MICRO)


@register(
    "f34_periodogram",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
        SELECT b.event_type, b.d0 + s.range AS day, s.range AS t
        FROM bounds b CROSS JOIN range(0, 100000) s
        WHERE b.d0 + s.range <= b.d1
    ), filled AS (
        SELECT s.event_type, s.t, COALESCE(d.n, 0) AS n
        FROM spine s LEFT JOIN daily d
          ON d.event_type = s.event_type AND d.day = s.day
    ), fc(period, r, c, s) AS (VALUES {FOURIER_SQL}),
    terms AS (
        -- exact integer products against the pinned factor table: the
        -- join key t % period selects the one factor row per period
        SELECT f.event_type, fc.period,
               CAST(f.n * fc.c AS BIGINT) AS ct,
               CAST(f.n * fc.s AS BIGINT) AS st
        FROM filled f JOIN fc ON fc.r = f.t % fc.period
    ), sums AS (
        SELECT event_type, period,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(ct) // 1000 AS BIGINT) AS c_milli,
               CAST(SUM(st) // 1000 AS BIGINT) AS s_milli
        FROM terms GROUP BY 1, 2
    ), pw AS (
        SELECT event_type, period, n_days, c_milli, s_milli,
               c_milli * c_milli + s_milli * s_milli AS power,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY c_milli * c_milli
                                         + s_milli * s_milli DESC,
                                         period) AS prank
        FROM sums
    )
    SELECT event_type, CAST(period AS INTEGER) AS period, n_days,
           c_milli, s_milli, CAST(power AS BIGINT) AS power,
           CAST(prank AS INTEGER) AS prank
    FROM pw
    """,
    survey="F34,F26,F28",
)
def f34_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete periodogram of the zero-filled daily count series per
    event type at candidate periods {_PERIODS}: spectral power
    |Σ n_t·e^(−2πi·t/P)|² — the frequency-domain periodicity detector
    that complements f26's lag-domain autocorrelation (acf needs the
    right lag guessed; the periodogram ranks candidate periods in one
    pass, feeding f27's season choice).

    Exactness: the Fourier factors are PRE-TABULATED micro integers
    (cos/sin of 2πr/p for the 59 (p, r mod p) lattice points, computed
    once driver-side, pinned against math.cos in tests, and injected
    into both engines — ADVICE r10 item 4 removed the per-row
    FLOOR(n·cos(…)·1e6) libm call whose 1-ulp platform drift could flip
    a unit at a quantization boundary), so each term is the exact
    integer product n·c and sums are exact BIGINTs; the milli-rescale
    before squaring keeps power ≤ (7e8)² < 2⁶³ (overflow budget
    in-code); prank is a PARTITIONED deterministic rank.  Pinned
    against a pure-Python DFT in tests.

    Scale shape: daily pre-agg → calendar-bounded spine × |periods|
    constant fan-out → one hash agg → per-type rank window.  Corpus is
    touched once; everything after is calendar-bounded."""
    from pyspark.sql import Window

    e = Tables(spark, sf_dir).events
    daily = e.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(F.count("*").alias("n"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.col("d1") - F.col("d0"))).alias("t"),
        F.col("d0"),
    ).select("event_type", "t", (F.col("d0") + F.col("t")).alias("day"))
    filled = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "t", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    periods = F.array(*[F.lit(p) for p in _PERIODS])
    fourier = spark.createDataFrame(
        list(FOURIER_MICRO), "period int, r int, c long, s long"
    )
    terms = (
        filled.select(
            "event_type",
            "t",
            "n",
            F.explode(periods).alias("period"),
        )
        .withColumn("r", F.col("t") % F.col("period"))
        .join(F.broadcast(fourier), ["period", "r"])
        .select(
            "event_type",
            "period",
            (F.col("n") * F.col("c")).cast("long").alias("ct"),
            (F.col("n") * F.col("s")).cast("long").alias("st"),
        )
    )
    sums = terms.groupBy("event_type", "period").agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr("SUM(ct) DIV 1000").cast("long").alias("c_milli"),
        F.expr("SUM(st) DIV 1000").cast("long").alias("s_milli"),
    )
    power = (F.col("c_milli") * F.col("c_milli") + F.col("s_milli") * F.col("s_milli"))
    w = Window.partitionBy("event_type").orderBy(power.desc(), F.col("period"))
    return sums.select(
        "event_type",
        F.col("period").cast("int").alias("period"),
        "n_days",
        "c_milli",
        "s_milli",
        power.cast("long").alias("power"),
        F.row_number().over(w).cast("int").alias("prank"),
    )


@register(
    "j93_cluster_purity_nmi",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS micro
        FROM embeddings
    ), weights AS (
        SELECT t.range AS p, d.dim, {_SRP_W_SQL} AS w
        FROM range({_SRP_PLANES}) t CROSS JOIN (SELECT DISTINCT dim FROM ex) d
    ), dots AS (
        SELECT e.vec_id, MIN(e.label) AS label, w.p, SUM(e.micro * w.w) AS dot
        FROM ex e JOIN weights w ON w.dim = e.dim
        GROUP BY e.vec_id, w.p
    ), assign AS (
        SELECT vec_id, MIN(label) AS label,
               SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p)
                        ELSE 0 END) AS cluster
        FROM dots GROUP BY 1
    ), cells AS (
        SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS n_cl
        FROM assign GROUP BY 1, 2
    ), margins_c AS (
        SELECT cluster, CAST(SUM(n_cl) AS BIGINT) AS n_c FROM cells GROUP BY 1
    ), margins_l AS (
        SELECT label, CAST(SUM(n_cl) AS BIGINT) AS n_l FROM cells GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_cl) AS BIGINT) AS n FROM cells
    ), mi AS (
        SELECT CAST(SUM(c.n_cl * CAST(FLOOR(ln(CAST(c.n_cl AS DOUBLE) * t.n
                       / (CAST(mc.n_c AS DOUBLE) * ml.n_l)) * 1000)
                       AS BIGINT)) AS BIGINT) AS i_milli
        FROM cells c
        JOIN margins_c mc ON mc.cluster = c.cluster
        JOIN margins_l ml ON ml.label = c.label
        CROSS JOIN tot t
    ), hc AS (
        SELECT CAST(SUM(n_c * CAST(FLOOR(ln(CAST(t.n AS DOUBLE) / n_c) * 1000)
                       AS BIGINT)) AS BIGINT) AS h_c
        FROM margins_c CROSS JOIN tot t
    ), hl AS (
        SELECT CAST(SUM(n_l * CAST(FLOOR(ln(CAST(t.n AS DOUBLE) / n_l) * 1000)
                       AS BIGINT)) AS BIGINT) AS h_l
        FROM margins_l CROSS JOIN tot t
    ), maj AS (
        SELECT c.cluster, MIN(mc.n_c) AS n,
               MAX(c.n_cl) AS majority_n
        FROM cells c JOIN margins_c mc ON mc.cluster = c.cluster
        GROUP BY 1
    ), majl AS (
        SELECT m.cluster, m.n, m.majority_n,
               MIN(c.label) AS majority_label
        FROM maj m JOIN cells c
          ON c.cluster = m.cluster AND c.n_cl = m.majority_n
        GROUP BY 1, 2, 3
    ), pure AS (
        SELECT CAST(SUM(majority_n) AS BIGINT) AS pure_n FROM majl
    )
    SELECT CAST(m.cluster AS BIGINT) AS cluster,
           CAST(m.n AS BIGINT) AS n,
           CAST(m.majority_label AS INTEGER) AS majority_label,
           CAST(m.majority_n AS BIGINT) AS majority_n,
           CAST(p.pure_n * 1000000 // t.n AS BIGINT) AS purity_ppm,
           CASE WHEN hc.h_c + hl.h_l > 0
                THEN CAST(2 * mi.i_milli * 1000000 // (hc.h_c + hl.h_l)
                          AS BIGINT)
                ELSE NULL END AS nmi_ppm
    FROM majl m
    CROSS JOIN pure p CROSS JOIN tot t CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl
    """,
    survey="J94,E53,J78",
)
def j93_cluster_purity_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTERNAL clustering evaluation — purity and normalized mutual
    information of the SRP bucket assignment (j3_knn_srp_md5's 6-bit
    index reused as an unsupervised clustering) against the true labels.
    Completes the clustering-eval tier with the information-theoretic
    leg: e53 kappa measures pairwise agreement, e54/e55 measure
    geometry, purity/NMI measure LABEL RECOVERY — the standard triple
    reported for unsupervised text clustering.

    Exactness: the contingency table is exact BIGINT counting on the
    certified SRP buckets; every entropy/MI term is ln of an exact
    integer ratio evaluated in identical op order and FLOOR-quantized
    to milli-nats BEFORE the weighted integer sum (the j77/e58 per-term
    discipline); purity and NMI are single integer divisions at the
    end.  Pinned against a pure-Python contingency fold in tests.

    Scale shape: the j3-SRP bucket agg (one posexplode hash agg with a
    KB weight broadcast) → a |clusters|·|labels| ≤ 640-cell contingency
    relation → KB joins.  One corpus scan."""
    e = Tables(spark, sf_dir).embeddings
    # r11: ``ex`` feeds both the dim-domain distinct and the dot products
    # — cut once so the corpus posexplode runs once (guide §2.4).
    ex = fan_out(e).select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        "label",
        "dim",
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("micro"),
    ).localCheckpoint(eager=False)
    dims = ex.select("dim").distinct()
    planes = spark.range(_SRP_PLANES).select(F.col("id").cast("int").alias("p"))
    weights = dims.crossJoin(F.broadcast(planes)).select(
        "p",
        "dim",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "",
                            F.lit("srp:"),
                            F.col("p").cast("string"),
                            F.lit(":"),
                            F.col("dim").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2000001
            - 1000000
        ).alias("w"),
    )
    dots = (
        ex.join(F.broadcast(weights), "dim")
        .groupBy("vec_id", "p")
        .agg(F.min("label").alias("label"), F.sum(F.col("micro") * F.col("w")).alias("dot"))
    )
    assign = dots.groupBy("vec_id").agg(
        F.min("label").alias("label"),
        F.sum(
            F.when(F.col("dot") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)"))
            .otherwise(F.lit(0))
        ).alias("cluster"),
    )
    # r11: ``cells`` (≤640 rows) feeds ~10 downstream consumers (margins,
    # totals, MI/H folds, majority join) — without a lineage cut each one
    # re-derives the whole corpus-scan subtree (posexplode + SRP dots +
    # two aggs): 111 Exchanges in the before-plan.  One eager KB-sized
    # materialization makes everything downstream KB joins (guide §2.4).
    cells = assign.groupBy("cluster", "label").agg(
        F.count("*").cast("long").alias("n_cl")
    ).localCheckpoint(eager=True)
    mc = cells.groupBy("cluster").agg(F.sum("n_cl").cast("long").alias("n_c"))
    ml = cells.groupBy("label").agg(F.sum("n_cl").cast("long").alias("n_l"))
    tot = cells.agg(F.sum("n_cl").cast("long").alias("n"))
    mi = (
        cells.join(mc, "cluster")
        .join(F.broadcast(ml), "label")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n_cl")
                * F.floor(
                    F.log(
                        F.col("n_cl").cast("double")
                        * F.col("n")
                        / (F.col("n_c").cast("double") * F.col("n_l"))
                    )
                    * 1000
                ).cast("long")
            )
            .cast("long")
            .alias("i_milli")
        )
    )
    hc = mc.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("n_c")
            * F.floor(F.log(F.col("n").cast("double") / F.col("n_c")) * 1000).cast(
                "long"
            )
        )
        .cast("long")
        .alias("h_c")
    )
    hl = ml.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("n_l")
            * F.floor(F.log(F.col("n").cast("double") / F.col("n_l")) * 1000).cast(
                "long"
            )
        )
        .cast("long")
        .alias("h_l")
    )
    maj = cells.join(mc, "cluster").groupBy("cluster").agg(
        F.min("n_c").alias("n"), F.max("n_cl").alias("majority_n")
    )
    majl = (
        maj.join(cells, "cluster")
        .filter(F.col("n_cl") == F.col("majority_n"))
        .groupBy("cluster", "n", "majority_n")
        .agg(F.min("label").alias("majority_label"))
    )
    pure = majl.agg(F.sum("majority_n").cast("long").alias("pure_n"))
    nmi = F.when(
        F.col("h_c") + F.col("h_l") > 0,
        F.expr("2 * i_milli * 1000000 DIV (h_c + h_l)").cast("long"),
    ).otherwise(F.lit(None))
    return (
        majl.crossJoin(F.broadcast(pure))
        .crossJoin(F.broadcast(tot.select(F.col("n").alias("n_total"))))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("n").cast("long").alias("n"),
            F.col("majority_label").cast("int").alias("majority_label"),
            F.col("majority_n").cast("long").alias("majority_n"),
            F.expr("pure_n * 1000000 DIV n_total").cast("long").alias("purity_ppm"),
            nmi.alias("nmi_ppm"),
        )
    )


# ------------------------------------------------------------------ batch 4

_JSD_V = 500  # head-vocabulary size; all other tokens lump into one OOV cell
_WORDS5 = f"string_split({_NORM}, ' ')"
# The JSD term from pre-computed p/q columns — one shared fragment so both
# engines execute the identical IEEE op order (the e64 discipline).
_JSD_TERM = (
    "CAST(FLOOR((p * ln(2.0 * p / (p + q)) + q * ln(2.0 * q / (p + q)))"
    " / 2.0 * 1000000) AS BIGINT)"
)


@register(
    "e65_js_divergence",
    oracle=f"""
    WITH t AS (
        SELECT source, unnest({_WORDS5}) AS tok FROM documents
    ), g AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1
    ), vocab AS (
        SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rk FROM g
        ) WHERE rk <= {_JSD_V}
    ), tv AS (
        SELECT t.source,
               CASE WHEN v.tok IS NULL THEN chr(0) ELSE t.tok END AS tok
        FROM t LEFT JOIN vocab v ON v.tok = t.tok
    ), sc AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tv GROUP BY 1, 2
    ), gv AS (
        SELECT tok, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM sc GROUP BY 1
    ), ns AS (
        SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_s FROM sc GROUP BY 1
    ), ntot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM sc
    ), vsz AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS vv FROM gv
    ), grid AS (
        SELECT s.source, s.n_s, v.tok, v.gcnt
        FROM ns s CROSS JOIN gv v
    ), pre AS (
        SELECT g.source, g.n_s,
               (COALESCE(sc.cnt, 0) + 1.0) / (g.n_s + vsz.vv) AS p,
               (g.gcnt - COALESCE(sc.cnt, 0) + 1.0)
                   / (ntot.n - g.n_s + vsz.vv) AS q
        FROM grid g
        LEFT JOIN sc ON sc.source = g.source AND sc.tok = g.tok
        CROSS JOIN ntot CROSS JOIN vsz
    )
    SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_tokens,
           CAST(SUM({_JSD_TERM}) AS BIGINT) AS jsd_micro
    FROM pre GROUP BY 1
    """,
    survey="E65,E58,E36",
)
def e65_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    vs the REST of the corpus over the top-{_JSD_V} head vocabulary (+ one
    lumped OOV cell), Laplace-smoothed — the symmetric, bounded (≤ ln 2)
    member completing the text-drift triple: j37 KL (asymmetric,
    unbounded), e58 PSI (numeric-binned), THIS (symmetric, vocabulary-
    domain).  The mixture-split training question "does source s read
    like the rest of the mix" is exactly JSD.

    Exactness: p and q are computed ONCE as columns from exact integer
    counts (Laplace +1 over the grid of source × head-vocab cells —
    including zero-count cells, which is where smoothing matters), the
    per-cell term is a shared-fragment double chain FLOOR-quantized to
    a micro int BEFORE the sum (the e37/e58 per-term discipline).

    Scale shape: one token-stream hash agg + TakeOrderedAndProject head
    vocab (the j44 pattern — no global sort), one broadcast vocab join,
    then everything lives on the |sources|·{_JSD_V + 1}-cell bounded
    grid.  OOV lumping is what keeps the grid bounded at any corpus
    size."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = fan_out(Tables(spark, sf_dir).documents)
    t = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    # r11 (guide §2.3/§2.4): the token stream fed BOTH the head-vocab
    # derivation and the lumped per-source recount — two full tokenize +
    # explode passes.  ONE (source, tok) count proxy now checkpoints;
    # the global vocab ranking sums it per token (identical counts), the
    # OOV lumping re-aggregates it (identical lumped counts — exact
    # integer sums commute), and the lumped grid checkpoints for its
    # four downstream folds.
    sc0 = (
        t.groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("cnt0"))
        .localCheckpoint(eager=False)
    )
    g = sc0.groupBy("tok").agg(F.sum("cnt0").alias("cnt"))
    vocab = (
        g.orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(_JSD_V)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    tv = sc0.join(F.broadcast(vocab), "tok", "left").select(
        "source",
        F.when(F.col("in_vocab").isNull(), F.lit("\x00")).otherwise(F.col("tok")).alias("tok"),
        "cnt0",
    )
    sc = (
        tv.groupBy("source", "tok")
        .agg(F.sum("cnt0").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    gv = sc.groupBy("tok").agg(F.sum("cnt").cast("long").alias("gcnt"))
    ns = sc.groupBy("source").agg(F.sum("cnt").cast("long").alias("n_s"))
    ntot = sc.agg(F.sum("cnt").cast("long").alias("n"))
    vsz = gv.agg(F.count("*").cast("double").alias("vv"))
    grid = ns.crossJoin(F.broadcast(gv))
    pre = (
        grid.join(sc, ["source", "tok"], "left")
        .crossJoin(F.broadcast(ntot))
        .crossJoin(F.broadcast(vsz))
        .select(
            "source",
            "n_s",
            ((F.coalesce(F.col("cnt"), F.lit(0)) + 1.0) / (F.col("n_s") + F.col("vv"))).alias("p"),
            (
                (F.col("gcnt") - F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                / (F.col("n") - F.col("n_s") + F.col("vv"))
            ).alias("q"),
        )
    )
    return pre.groupBy("source").agg(
        F.min("n_s").cast("long").alias("n_tokens"),
        F.sum(F.expr(_JSD_TERM)).cast("long").alias("jsd_micro"),
    )


_COMPACT_TARGET = 20_000  # rows per compaction output group


@register(
    "a29_compaction_planner",
    oracle=f"""
    WITH files AS (
        SELECT epoch_us(l_shipdate) // 86400000000 // 30 AS part,
               epoch_us(l_shipdate) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY 1, 2
    ), packed AS (
        SELECT part, day, n_rows,
               CAST((SUM(n_rows) OVER (PARTITION BY part ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                    // {_COMPACT_TARGET} AS BIGINT) AS bin
        FROM files
    )
    SELECT CAST(part AS BIGINT) AS part, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS rows_total,
           CAST(MIN(day) AS BIGINT) AS first_day,
           CAST(MAX(day) AS BIGINT) AS last_day,
           CAST(SUM(n_rows) * 1000000 // {_COMPACT_TARGET} AS BIGINT)
               AS fill_ppm
    FROM packed GROUP BY 1, 2
    """,
    survey="A29,A22,A28",
)
def a29_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning over per-file statistics: within
    each partition (30-day ship bucket), greedily pack the per-day
    "files" (row-count stats standing in for file sizes — the same
    metadata a lakehouse manifest carries) into output groups of
    ~{_COMPACT_TARGET} rows by cumulative-sum binning — bin =
    (running_total − 1) DIV target, the sequential first-fit plan a
    compaction service executes.  Completes the physical-layout tier:
    a22 plans RETENTION, a28 proves SKIPPING, this plans REWRITE.

    Exactness: pure integer arithmetic on exact counts; day order makes
    the greedy assignment deterministic.  fill_ppm > 1e6 flags a single
    input larger than the target (it becomes its own group — correct
    first-fit behavior, not an error).

    Scale shape: the plan is computed ENTIRELY on the per-file stats
    relation (|partitions|·|files-per-partition| rows — metadata scale,
    like a22/a28), never on the data; the only data-touching step is
    the per-(partition, day) pre-agg, one map-side-combinable hash agg.
    Windows are PARTITIONED by the partition key."""
    from pyspark.sql import Window

    li = Tables(spark, sf_dir).lineitem
    files = li.groupBy(
        F.expr("unix_micros(l_shipdate) DIV 86400000000 DIV 30").alias("part"),
        F.expr("unix_micros(l_shipdate) DIV 86400000000").alias("day"),
    ).agg(F.count("*").cast("long").alias("n_rows"))
    w = (
        Window.partitionBy("part")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = (
        files.withColumn("cum", F.sum("n_rows").over(w))
        .withColumn("bin", F.expr(f"(cum - 1) DIV {_COMPACT_TARGET}").cast("long"))
    )
    return packed.groupBy("part", "bin").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        F.min("day").cast("long").alias("first_day"),
        F.max("day").cast("long").alias("last_day"),
        F.expr(f"SUM(n_rows) * 1000000 DIV {_COMPACT_TARGET}")
        .cast("long")
        .alias("fill_ppm"),
    )


# ------------------------------------------------------------------ batch 5

# One-sided z critical value at alpha=0.05, a shared literal (no erf
# needed: TOST compares z against the constant, not p against alpha).
_Z_CRIT_MILLI = 1644  # FLOOR(1.6448536269514722 * 1000)


@register(
    "e66_tost_equivalence",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    ), mid AS (
        SELECT (MIN(day) + MAX(day) + 1) // 2 AS m_day FROM ev
    ), halves AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN day <  m_day THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN day <  m_day THEN c ELSE 0 END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN day <  m_day THEN c*c ELSE 0 END) AS BIGINT) AS q1,
               CAST(SUM(CASE WHEN day >= m_day THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN day >= m_day THEN c ELSE 0 END) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN day >= m_day THEN c*c ELSE 0 END) AS BIGINT) AS q2
        FROM ev CROSS JOIN mid GROUP BY 1
    ), margin AS (
        SELECT event_type, n1, s1, q1, n2, s2, q2,
               (s1 + s2) * 5 // ((n1 + n2) * 100) AS delta_c,
               (s1 * n2 - s2 * n1) * 1000 // (n1 * n2) AS diff_milli_c
        FROM halves
    ), zs AS (
        SELECT event_type, n1, n2, delta_c, diff_milli_c,
               CAST(FLOOR(((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)
                            + delta_c)
                   / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)
                           / (n1-1)) / n1
                        + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2)
                           / (n2-1)) / n2) * 1000) AS BIGINT) AS z_low_milli,
               CAST(FLOOR(((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)
                            - delta_c)
                   / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)
                           / (n1-1)) / n1
                        + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2)
                           / (n2-1)) / n2) * 1000) AS BIGINT) AS z_up_milli
        FROM margin
    )
    SELECT event_type, n1, n2,
           CAST(delta_c AS BIGINT) AS delta_cents,
           CAST(diff_milli_c AS BIGINT) AS diff_milli_cents,
           z_low_milli, z_up_milli,
           (z_low_milli >= {_Z_CRIT_MILLI}
            AND z_up_milli <= -{_Z_CRIT_MILLI}) AS equivalent
    FROM zs
    """,
    survey="E66,E52,E64",
)
def e66_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence certification (two one-sided tests) per event
    type between the calendar halves of `value` — the INVERSE question
    of the drift tier: e52/e64 can only fail to find drift, TOST
    positively CERTIFIES "means are within ±δ" (Schuirmann 1987, the
    regulatory bioequivalence standard), which is what a data-contract
    "this source did not move" guarantee actually needs.  δ = 5% of the
    pooled mean, on the integer cent lattice.

    Exactness: δ and the mean difference are EXACT integers
    ((s1·n2−s2·n1)·1000 DIV (n1·n2) — no float subtraction of means);
    the two z statistics reuse e64's Welch machinery with the margin
    added/subtracted before the shared-fragment divide, milli-floored;
    the decision compares integers against the constant z₀.₀₅·1000 —
    no erf anywhere.  Pinned against pure-Python in tests.

    Scale shape: identical to e64 — one conditional-agg scan to |types|
    rows, then row-local arithmetic.  No joins, no windows."""
    e = Tables(spark, sf_dir).events
    ev = e.select(
        "event_type",
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    mid = ev.agg(F.expr("(MIN(day) + MAX(day) + 1) DIV 2").alias("m_day"))
    h = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("day") < F.col("m_day"), 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(F.col("day") < F.col("m_day"), F.col("c")).otherwise(0)).cast("long").alias("s1"),
            F.sum(F.when(F.col("day") < F.col("m_day"), F.col("c") * F.col("c")).otherwise(0)).cast("long").alias("q1"),
            F.sum(F.when(F.col("day") >= F.col("m_day"), 1).otherwise(0)).cast("long").alias("n2"),
            F.sum(F.when(F.col("day") >= F.col("m_day"), F.col("c")).otherwise(0)).cast("long").alias("s2"),
            F.sum(F.when(F.col("day") >= F.col("m_day"), F.col("c") * F.col("c")).otherwise(0)).cast("long").alias("q2"),
        )
    )
    margin = h.select(
        "*",
        F.expr("(s1 + s2) * 5 DIV ((n1 + n2) * 100)").alias("delta_c"),
        F.expr("(s1 * n2 - s2 * n1) * 1000 DIV (n1 * n2)").alias("diff_milli_c"),
    )
    se = (
        "sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1) / (n1-1)) / n1"
        " + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n2) / (n2-1)) / n2)"
    )
    d = "(CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)"
    zs = margin.select(
        "event_type",
        "n1",
        "n2",
        F.col("delta_c").cast("long").alias("delta_cents"),
        F.col("diff_milli_c").cast("long").alias("diff_milli_cents"),
        F.expr(f"CAST(FLOOR(({d} + delta_c) / {se} * 1000) AS BIGINT)").alias("z_low_milli"),
        F.expr(f"CAST(FLOOR(({d} - delta_c) / {se} * 1000) AS BIGINT)").alias("z_up_milli"),
    )
    return zs.withColumn(
        "equivalent",
        (F.col("z_low_milli") >= _Z_CRIT_MILLI)
        & (F.col("z_up_milli") <= -_Z_CRIT_MILLI),
    )


@register(
    "j94_golden_record",
    oracle=f"""
    WITH {_cc_sql_edges()}, {_cc_sql_iters(_CC_ITERS)}, comp AS (
        SELECT node AS doc_id, lbl AS component_id FROM l{_CC_ITERS}
    ), sized AS (
        SELECT component_id FROM comp GROUP BY 1 HAVING COUNT(*) >= 2
    ), members AS (
        SELECT c.component_id, d.doc_id, d.lang, d.source, d.n_chars
        FROM comp c
        JOIN sized s ON s.component_id = c.component_id
        JOIN documents d ON d.doc_id = c.doc_id
    ), rep AS (
        SELECT component_id, MAX(n_chars) AS rep_n_chars
        FROM members GROUP BY 1
    ), repdoc AS (
        SELECT m.component_id, MIN(m.doc_id) AS rep_doc
        FROM members m JOIN rep r
          ON r.component_id = m.component_id AND m.n_chars = r.rep_n_chars
        GROUP BY 1
    ), langc AS (
        SELECT component_id, lang, COUNT(*) AS cnt FROM members GROUP BY 1, 2
    ), langmax AS (
        SELECT component_id, MAX(cnt) AS mx FROM langc GROUP BY 1
    ), canon AS (
        SELECT lc.component_id, MIN(lc.lang) AS canonical_lang
        FROM langc lc JOIN langmax lm
          ON lm.component_id = lc.component_id AND lc.cnt = lm.mx
        GROUP BY 1
    )
    SELECT m.component_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(rd.rep_doc) AS BIGINT) AS rep_doc,
           CAST(MIN(r.rep_n_chars) AS BIGINT) AS rep_n_chars,
           CAST(COUNT(DISTINCT m.lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT m.source) AS BIGINT) AS n_sources,
           MIN(c.canonical_lang) AS canonical_lang
    FROM members m
    JOIN rep r ON r.component_id = m.component_id
    JOIN repdoc rd ON rd.component_id = m.component_id
    JOIN canon c ON c.component_id = m.component_id
    GROUP BY 1
    """,
    survey="J95,J90,J40",
)
def j94_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution SURVIVORSHIP (golden record): for every
    near-dup component (j90's certified clusters), elect the canonical
    record by deterministic field-level rules — representative = the
    longest member (smallest doc_id among ties), canonical language =
    the majority lang (lexicographic tiebreak), plus the lang/source
    spread that tells curation how heterogeneous the cluster is.  This
    is the MERGE step standard MDM/ER pipelines run after matching
    (j2/j62) and clustering (j90); j40 elects by quality score, THIS
    demonstrates multi-field survivorship rules over the full cluster
    membership.

    Exactness: pure counting/min/max over exact integers and strings —
    every rule resolves ties deterministically, so both engines elect
    identical records.

    Scale shape: the j90 propagation (star edges, hash-min rounds) plus
    per-component hash aggs and one broadcast-scale join of the
    ≥2-member component list; membership never leaves its component's
    hash bucket."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import (
        dup_clusters,
        md5_minhash_bands,
    )

    d = Tables(spark, sf_dir).documents
    # r11 (guide §2.4): ``bands`` feeds the hub agg AND the pair join —
    # one cut runs the MinHash pipeline once, not twice.
    bands = md5_minhash_bands(d, n_hashes=_MH_N, rows_per_band=_MH_ROWS).localCheckpoint(
        eager=False
    )
    hubs = (
        bands.groupBy("band", "bkey")
        .agg(F.min("doc_id").alias("hub"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .drop("n")
    )
    pairs = (
        bands.join(hubs, ["band", "bkey"])
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("id_a"), F.col("doc_id").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = d.select(F.col("doc_id").alias("id"))
    comp = dup_clusters(nodes, pairs, max_iterations=_CC_ITERS).select(
        F.col("id").alias("doc_id"), F.col("cluster_id").alias("component_id")
    )
    sized = (
        comp.groupBy("component_id")
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") >= 2)
        .drop("sz")
    )
    # r11 (guide §2.4): ``members`` (≥2-member component rows, KB-scale)
    # feeds the representative/language folds and the final join chain —
    # four derivations of the comp⋈documents join without a cut.
    members = comp.join(F.broadcast(sized), "component_id").join(
        d.select("doc_id", "lang", "source", "n_chars"), "doc_id"
    ).localCheckpoint(eager=False)
    rep = members.groupBy("component_id").agg(
        F.max("n_chars").alias("rep_n_chars")
    )
    repdoc = (
        members.join(rep, "component_id")
        .filter(F.col("n_chars") == F.col("rep_n_chars"))
        .groupBy("component_id")
        .agg(F.min("doc_id").alias("rep_doc"))
    )
    langc = members.groupBy("component_id", "lang").agg(F.count("*").alias("cnt"))
    langmax = langc.groupBy("component_id").agg(F.max("cnt").alias("mx"))
    canon = (
        langc.join(langmax, "component_id")
        .filter(F.col("cnt") == F.col("mx"))
        .groupBy("component_id")
        .agg(F.min("lang").alias("canonical_lang"))
    )
    return (
        members.join(rep, "component_id")
        .join(repdoc, "component_id")
        .join(canon, "component_id")
        .groupBy("component_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("rep_doc").cast("long").alias("rep_doc"),
            F.min("rep_n_chars").cast("long").alias("rep_n_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("canonical_lang").alias("canonical_lang"),
        )
    )


# Morton (Z-order) interleave of two 16-bit keys, generated as ONE shared
# SQL fragment (16 unrolled shift/mask terms per dimension) both engines
# parse identically.
def _morton_sql(x: str, y: str) -> str:
    terms = []
    for b in range(16):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


_ZBUCKETS_SHIFT = 22  # 32-bit morton DIV 2^22 -> 1024 buckets


@register(
    "a30_zorder_layout",
    oracle=f"""
    WITH raw AS (
        SELECT o_custkey AS rx,
               epoch_us(o_orderdate) // 86400000000 AS ry
        FROM orders
    ), bounds AS (
        SELECT MIN(rx) AS x0, MAX(rx) AS x1, MIN(ry) AS y0, MAX(ry) AS y1
        FROM raw
    ), pts AS (
        SELECT (rx - x0) * 65536 // (x1 - x0 + 1) AS x,
               (ry - y0) * 65536 // (y1 - y0 + 1) AS y
        FROM raw CROSS JOIN bounds
    ), keyed AS (
        SELECT x, y,
               {_morton_sql("x", "y")} // {2 ** _ZBUCKETS_SHIFT} AS zbucket,
               x // 64 AS xbucket
        FROM pts
    ), z AS (
        SELECT 'zorder' AS layout, zbucket AS bucket,
               MAX(x) - MIN(x) + 1 AS wx, MAX(y) - MIN(y) + 1 AS wy
        FROM keyed GROUP BY 2
    ), s AS (
        SELECT 'custkey' AS layout, xbucket AS bucket,
               MAX(x) - MIN(x) + 1 AS wx, MAX(y) - MIN(y) + 1 AS wy
        FROM keyed GROUP BY 2
    ), u AS (
        SELECT * FROM z UNION ALL SELECT * FROM s
    )
    SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(wx) AS BIGINT) AS sum_x_width,
           CAST(SUM(wy) AS BIGINT) AS sum_y_width,
           CAST(SUM(wx) * 1000 // COUNT(*) AS BIGINT) AS avg_x_width_milli,
           CAST(SUM(wy) * 1000 // COUNT(*) AS BIGINT) AS avg_y_width_milli
    FROM u GROUP BY 1
    """,
    survey="A30,A28,A9",
)
def a30_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit: range-normalize two query
    dimensions (customer key, order epoch-day) to 16 bits each — the
    rank/range normalization every real Z-order write performs so both
    dimensions fill the key — interleave the bits into one Morton sort
    key, bucket rows by Morton prefix, and compare per-bucket zone
    widths (max−min+1 per dimension, in the normalized domain) against
    the single-column layout — the quantified answer to "should this
    table be Z-ordered": Morton buckets shrink BOTH dimensions' zone
    maps (each ~√|bucket-space|), single-column sorting shrinks only
    its own (a28 proves zone maps skip; THIS plans which clustering to
    write).  The audit is the planning step a lakehouse OPTIMIZE
    ZORDER BY executes.

    Exactness: normalization is integer (v−min)·65536 DIV (range+1)
    from broadcast exact bounds; the 32-bit Morton key is 32 unrolled
    shift/mask terms generated from ONE shared fragment; widths and
    averages are pure integer arithmetic.

    Scale shape: one scan → two hash aggs over the bucket domains (1024
    each) → a 2-row summary.  The Morton key is codegen'd JVM bit math —
    exactly what a real Z-order write would evaluate per row."""
    o = Tables(spark, sf_dir).orders
    raw = o.select(
        F.col("o_custkey").alias("rx"),
        F.expr("unix_micros(o_orderdate) DIV 86400000000").alias("ry"),
    )
    bounds = raw.agg(
        F.min("rx").alias("x0"),
        F.max("rx").alias("x1"),
        F.min("ry").alias("y0"),
        F.max("ry").alias("y1"),
    )
    pts = raw.crossJoin(F.broadcast(bounds)).select(
        F.expr("(rx - x0) * 65536 DIV (x1 - x0 + 1)").alias("x"),
        F.expr("(ry - y0) * 65536 DIV (y1 - y0 + 1)").alias("y"),
    )
    keyed = pts.select(
        "x",
        "y",
        F.expr(f'{_morton_sql("x", "y")} DIV {2 ** _ZBUCKETS_SHIFT}').alias("zbucket"),
        F.expr("x DIV 64").alias("xbucket"),
    )
    def widths(bucket_col: str, layout: str) -> DataFrame:
        return (
            keyed.groupBy(F.col(bucket_col).alias("bucket"))
            .agg(
                (F.max("x") - F.min("x") + 1).alias("wx"),
                (F.max("y") - F.min("y") + 1).alias("wy"),
            )
            .select(F.lit(layout).alias("layout"), "bucket", "wx", "wy")
        )

    u = widths("zbucket", "zorder").unionByName(widths("xbucket", "custkey"))
    return u.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("wx").cast("long").alias("sum_x_width"),
        F.sum("wy").cast("long").alias("sum_y_width"),
        F.expr("SUM(wx) * 1000 DIV COUNT(*)").cast("long").alias("avg_x_width_milli"),
        F.expr("SUM(wy) * 1000 DIV COUNT(*)").cast("long").alias("avg_y_width_milli"),
    )


# ------------------------------------------------------------------ batch 6


@register(
    "e68_pr_auc",
    oracle=f"""
    WITH {_SCORE_SQL}, bounds AS (
        SELECT MIN(s) AS lo, MAX(s) AS hi FROM sc
    ), binned AS (
        SELECT CAST((s - lo) * {_ROC_BINS} // (hi - lo + 1) AS INTEGER) AS bin,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        FROM sc CROSS JOIN bounds
    ), bins AS (
        SELECT bin, CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
        FROM binned GROUP BY 1
    ), cum AS (
        SELECT a.bin, MIN(a.n_pos) AS n_pos, MIN(a.n_neg) AS n_neg,
               SUM(b.n_pos) AS cum_tp, SUM(b.n_neg) AS cum_fp
        FROM bins a JOIN bins b ON b.bin >= a.bin
        GROUP BY a.bin
    ), tot AS (
        SELECT SUM(n_pos) AS p FROM bins
    )
    SELECT CAST(bin AS INTEGER) AS bin, n_pos, n_neg,
           CAST(cum_tp AS BIGINT) AS cum_tp,
           CAST(cum_fp AS BIGINT) AS cum_fp,
           CAST(cum_tp * 1000000 // (cum_tp + cum_fp) AS BIGINT)
               AS precision_ppm,
           CAST(cum_tp * 1000000 // p AS BIGINT) AS recall_ppm,
           CAST(n_pos * (cum_tp * 1000000 // (cum_tp + cum_fp)) AS BIGINT)
               AS ap_num
    FROM cum CROSS JOIN tot
    """,
    survey="E68,E62,E45",
)
def e68_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve + average precision of the frozen scorer —
    the IMBALANCE-robust companion of e62's ROC (with 1:1000 positives a
    ROC curve looks great while precision is garbage; retrieval and
    dedup-verifier evaluation reads PR, not ROC).  Step-wise AP =
    Σ_b ΔR_b · P_b restated on integers: per-bin ap_num = n_pos_b ·
    precision_ppm_b, so AP_ppm = Σ ap_num / P is one final division —
    the python pin reproduces it exactly.

    Exactness: same exact-BIGINT score bins as e62 (shared _SCORE_SQL);
    precision/recall on the ppm lattice with truncating DIV; the
    descending-threshold cums come from the same b.bin >= a.bin
    broadcast self-join (no unpartitioned window).

    Scale shape: identical to e62 — score hash agg, broadcast bounds,
    {_ROC_BINS}-row KB joins."""
    # r11 (guide §2.4): e62's cuts — score projection feeds bounds AND
    # binning; the bin histogram feeds both cumulative sides + totals.
    sc = _score_df(spark, sf_dir).localCheckpoint(eager=False)
    bounds = sc.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    binned = sc.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"CAST((s - lo) * {_ROC_BINS} DIV (hi - lo + 1) AS INT)").alias("bin"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("y"),
    )
    bins = binned.groupBy("bin").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("n_neg"),
    ).localCheckpoint(eager=False)
    a, b = bins.alias("a"), F.broadcast(bins.alias("b"))
    cum = (
        a.join(b, F.col("b.bin") >= F.col("a.bin"))
        .groupBy(F.col("a.bin").alias("bin"))
        .agg(
            F.min(F.col("a.n_pos")).alias("n_pos"),
            F.min(F.col("a.n_neg")).alias("n_neg"),
            F.sum(F.col("b.n_pos")).alias("cum_tp"),
            F.sum(F.col("b.n_neg")).alias("cum_fp"),
        )
    )
    tot = bins.agg(F.sum("n_pos").alias("p"))
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("int").alias("bin"),
        "n_pos",
        "n_neg",
        F.col("cum_tp").cast("long").alias("cum_tp"),
        F.col("cum_fp").cast("long").alias("cum_fp"),
        F.expr("cum_tp * 1000000 DIV (cum_tp + cum_fp)").cast("long").alias("precision_ppm"),
        F.expr("cum_tp * 1000000 DIV p").cast("long").alias("recall_ppm"),
        F.expr("n_pos * (cum_tp * 1000000 DIV (cum_tp + cum_fp))").cast("long").alias("ap_num"),
    )


# MCC denominator: one shared double chain (products stay < 2^53 for any
# corpus this engine certifies at — n ≤ ~1e7 per quadrant at sf ≤ 1).
_MCC_MILLI = (
    "CAST(FLOOR((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) * 1000"
    " / sqrt((CAST(tp AS DOUBLE) + fp) * (tp + fn) * (tn + fp) * (tn + fn)))"
    " AS BIGINT)"
)


@register(
    "e69_mcc_operating_points",
    oracle=f"""
    WITH {_SCORE_SQL}, bounds AS (
        SELECT MIN(s) AS lo, MAX(s) AS hi FROM sc
    ), binned AS (
        SELECT CAST((s - lo) * {_ROC_BINS} // (hi - lo + 1) AS INTEGER) AS bin,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        FROM sc CROSS JOIN bounds
    ), pts AS (
        SELECT t.thr,
               CAST(SUM(CASE WHEN bin >= t.thr AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN bin >= t.thr AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN bin < t.thr AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN bin < t.thr AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
        FROM binned CROSS JOIN (SELECT unnest([5, 10, 15]) AS thr) t
        GROUP BY 1
    )
    SELECT CAST(thr AS INTEGER) AS thr, tp, fp, fn, tn,
           CAST((tp + tn) * 1000000 // (tp + fp + fn + tn) AS BIGINT)
               AS accuracy_ppm,
           CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm,
           CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0
                THEN {_MCC_MILLI} ELSE NULL END AS mcc_milli
    FROM pts
    """,
    survey="E69,E53,E62",
)
def e69_mcc_operating_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix summary metrics at three fixed operating points
    (score-bin thresholds 5/10/15): accuracy, F1, and Matthews
    correlation — MCC is the single-number confusion summary that stays
    honest under class imbalance (Chicco & Jurman 2020), completing the
    eval tier: e62 ranks thresholds, e68 integrates precision, THIS
    scores the deployed cut.

    Exactness: the four quadrants are exact BIGINT conditional counts
    (one scan, |thresholds| fan-out); accuracy/F1 are ppm integers; MCC
    is ONE shared-fragment double chain milli-floored (products < 2⁵³
    at any certified scale — budget in the fragment comment); python
    pin in tests.

    Scale shape: one conditional-agg scan to 3 rows.  No joins beyond
    broadcast scalars, no windows."""
    sc = _score_df(spark, sf_dir)
    bounds = sc.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    binned = sc.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"CAST((s - lo) * {_ROC_BINS} DIV (hi - lo + 1) AS INT)").alias("bin"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("y"),
    )
    thr = spark.range(3).select((F.col("id") * 5 + 5).cast("int").alias("thr"))
    pts = (
        binned.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(F.when((F.col("bin") >= F.col("thr")) & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when((F.col("bin") >= F.col("thr")) & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("fp"),
            F.sum(F.when((F.col("bin") < F.col("thr")) & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("fn"),
            F.sum(F.when((F.col("bin") < F.col("thr")) & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("tn"),
        )
    )
    return pts.select(
        F.col("thr").cast("int").alias("thr"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("(tp + tn) * 1000000 DIV (tp + fp + fn + tn)").cast("long").alias("accuracy_ppm"),
        F.expr("2 * tp * 1000000 DIV (2 * tp + fp + fn)").cast("long").alias("f1_ppm"),
        F.when(
            F.expr("(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)") > 0,
            F.expr(_MCC_MILLI),
        )
        .otherwise(F.lit(None))
        .alias("mcc_milli"),
    )


_BURST_V = 200  # head vocabulary for the burstiness profile


@register(
    "j96_term_burstiness",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest({_WORDS5}) AS tok FROM documents
    ), tf AS (
        SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS x
        FROM t GROUP BY 1, 2
    ), g AS (
        SELECT tok, CAST(SUM(x) AS BIGINT) AS cf,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(x * x) AS BIGINT) AS sum_x2
        FROM tf GROUP BY 1
    ), vocab AS (
        SELECT * FROM (
            SELECT g.*, row_number() OVER (ORDER BY cf DESC, tok) AS rk FROM g
        ) WHERE rk <= {_BURST_V}
    ), nd AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    )
    SELECT tok, cf, df, sum_x2,
           CAST((nd.n * sum_x2 - cf * cf) * 1000 // (nd.n * cf) AS BIGINT)
               AS vmr_milli,
           CAST(cf * 1000 // df AS BIGINT) AS mean_tf_in_doc_milli
    FROM vocab CROSS JOIN nd
    """,
    survey="J96,J61,J17",
)
def j96_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness profile (Church & Gale 1995): for the top-{_BURST_V}
    head terms, the variance-to-mean ratio of per-document occurrence
    counts (zeros included) — function words arrive ~Poisson (VMR ≈ 1),
    topical words are BURSTY (VMR ≫ 1: absent from most docs, repeated
    where present).  The lexical-statistics diagnostic that separates
    stopword-like from content-bearing vocabulary WITHOUT a stopword
    list — feeding j50/j51 stopping decisions and j17's repetition
    signals.

    Exactness: VMR over all N docs including zeros needs only the
    sufficient statistics (cf, Σx², N): VMR = (N·Σx² − cf²)/(N·cf),
    kept as one exact-integer milli division (Σx² and cf² ≪ 2⁶³ at any
    certified SF); mean within-doc tf = cf/df likewise.

    Scale shape: one (term, doc) hash agg → one term hash agg →
    TakeOrderedAndProject head (the j44 pattern — no global sort) → a
    broadcast 1-row N join.  Zeros never materialize — the sufficient
    statistics absorb them algebraically."""
    from cassandra_snap_to_hadoop_spark.operators.text import tokens

    d = fan_out(Tables(spark, sf_dir).documents)
    t = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = t.groupBy("tok", "doc_id").agg(F.count("*").cast("long").alias("x"))
    g = tf.groupBy("tok").agg(
        F.sum("x").cast("long").alias("cf"),
        F.count("*").cast("long").alias("df"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_x2"),
    )
    vocab = g.orderBy(F.col("cf").desc(), F.col("tok")).limit(_BURST_V)
    nd = Tables(spark, sf_dir).documents.agg(
        F.count("*").cast("long").alias("n")
    )
    return vocab.crossJoin(F.broadcast(nd)).select(
        "tok",
        "cf",
        "df",
        "sum_x2",
        F.expr("(n * sum_x2 - cf * cf) * 1000 DIV (n * cf)").cast("long").alias("vmr_milli"),
        F.expr("cf * 1000 DIV df").cast("long").alias("mean_tf_in_doc_milli"),
    )


# ------------------------------------------------------------------ batch 7

# LSH S-curve theory at the band midpoints, precomputed ONCE in Python
# (p = 1 − (1 − m^r)^b at r=4 rows, b=4 bands) and injected as literals
# into BOTH engines — no cross-engine float arithmetic at all.
_SCURVE = (
    (0, 0.3, 0.5, 98534),
    (1, 0.5, 0.75, 484321),
    (2, 0.75, 0.9, 916998),
    (3, 0.9, 1.01, 998816),
)
_SCURVE_CASE = (
    "CASE "
    + " ".join(
        f"WHEN jaccard >= {lo} AND jaccard < {hi} THEN {band}"
        for band, lo, hi, _ in _SCURVE
    )
    + " END"
)
_SCURVE_THEORY = (
    "CASE "
    + " ".join(f"WHEN band = {band} THEN {ppm}" for band, _, _, ppm in _SCURVE)
    + " END"
)


@register(
    "j97_lsh_s_curve",
    oracle=f"""
    WITH {_mh_bands_sql()}, sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), truth AS (
        SELECT i.id_a, i.id_b,
               ROUND(i.i / (sa.sz + sb.sz - i.i), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE ROUND(i.i / (sa.sz + sb.sz - i.i), 4) >= 0.3
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ), scored AS (
        SELECT {_SCURVE_CASE} AS band,
               CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS captured
        FROM truth t LEFT JOIN cand c
          ON c.id_a = t.id_a AND c.id_b = t.id_b
    )
    SELECT CAST(band AS INTEGER) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(SUM(captured) AS BIGINT) AS n_captured,
           CAST(SUM(captured) * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm,
           CAST({_SCURVE_THEORY} AS BIGINT) AS theory_ppm
    FROM scored GROUP BY band
    """,
    survey="J97,J2,E62",
)
def j97_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured vs theoretical LSH S-curve — the dedup pipeline's
    SELF-EVALUATION: exact shingle-Jaccard pairs (J ≥ 0.3, the truth
    set) bucketed into similarity bands, each band scored by how many
    of its pairs the banded MinHash-md5 index (j2's 4×4 geometry)
    actually captured, next to the closed-form capture probability
    1−(1−s^r)^b at the band midpoint.  This answers the question every
    LSH deployment must answer before trusting its recall — "what does
    this banding geometry MISS at each similarity level" — with
    measured numbers, and the theory column makes miscalibration
    (e.g. shingle-correlation violating the independence assumption)
    visible as measured−theory gaps.

    Exactness: truth pairs via the share-a-shingle equi join (exact,
    blocked by shingle identity — never all-pairs); capture via the
    certified md5 band buckets; bands on the ROUND(j,4) lattice; the
    theory constants are Python-precomputed literals injected into BOTH
    engines, so no cross-engine float arithmetic exists anywhere.

    Scale shape: the truth join is the j2-exact tier's shape (per-
    shingle buckets); the LSH side is the certified banding; the final
    comparison is one broadcast-scale left join of two pair relations +
    a 4-row agg."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import (
        jaccard_pairs,
        md5_minhash_bands,
    )

    d = Tables(spark, sf_dir).documents
    truth = jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.3)
    # r11: checkpointing ``bands`` here was MEASURED SLOWER (2.7 -> 3.8 s
    # noop) unlike every sibling band consumer — the truth side derives
    # the same shingle explode, and cutting bands breaks the runtime
    # stage sharing between the two pipelines.  Left uncut deliberately.
    bands = md5_minhash_bands(d, n_hashes=_MH_N, rows_per_band=_MH_ROWS)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("c_a"), F.col("b.doc_id").alias("c_b")
        )
        .distinct()
    )
    scored = truth.join(
        cand,
        (F.col("id_a") == F.col("c_a")) & (F.col("id_b") == F.col("c_b")),
        "left",
    ).select(
        F.expr(_SCURVE_CASE).alias("band"),
        F.when(F.col("c_a").isNull(), 0).otherwise(1).alias("captured"),
    )
    return scored.groupBy("band").agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum("captured").cast("long").alias("n_captured"),
        F.expr("SUM(captured) * 1000000 DIV COUNT(*)").cast("long").alias("recall_ppm"),
        F.expr(_SCURVE_THEORY).cast("long").alias("theory_ppm"),
    ).select(
        F.col("band").cast("int").alias("band"),
        "n_true",
        "n_captured",
        "recall_ppm",
        "theory_ppm",
    )


# ------------------------------------------------------------------ batch 8

# R/S window sizes with their FLOOR(ln(n)*1000) milli-logs precomputed in
# Python and injected as literals (the j97 discipline — zero cross-engine
# float arithmetic for the regression x-axis).
_HURST_NS = ((8, 2079), (16, 2772), (32, 3465))
_HURST_N_SQL = ", ".join(f"({n}, {lx})" for n, lx in _HURST_NS)


@register(
    "e70_hurst_exponent",
    oracle=f"""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), bounds AS (
        SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
    ), spine AS (
        SELECT s.range AS t, b.d0 + s.range AS day
        FROM bounds b CROSS JOIN range(0, 100000) s
        WHERE b.d0 + s.range <= b.d1
    ), filled AS (
        SELECT s.t, COALESCE(d.x, 0) AS x
        FROM spine s LEFT JOIN daily d ON d.day = s.day
    ), fan AS (
        SELECT w.n, w.lx, f.t // w.n AS b, f.t % w.n + 1 AS k, f.x
        FROM filled f
        CROSS JOIN (SELECT * FROM (VALUES {_HURST_N_SQL}) v(n, lx)) w
        WHERE f.t // w.n < (SELECT (MAX(t) + 1) FROM filled) // w.n
    ), pre AS (
        SELECT n, lx, b, k, x,
               SUM(x) OVER (PARTITION BY n, b ORDER BY k
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS p,
               SUM(x) OVER (PARTITION BY n, b) AS s,
               SUM(x * x) OVER (PARTITION BY n, b) AS ss
        FROM fan
    ), dev AS (
        SELECT n, lx, b, s, ss,
               n * p - k * s AS d
        FROM pre
    ), blocks AS (
        SELECT n, lx, b,
               CAST(MAX(d) - MIN(d) AS BIGINT) AS r_scaled,
               CAST(MIN(n * ss - s * s) AS BIGINT) AS s2_scaled
        FROM dev GROUP BY 1, 2, 3
    ), rs AS (
        SELECT n, lx,
               CAST(FLOOR(r_scaled * 1000.0
                    / sqrt(CAST(s2_scaled AS DOUBLE))) AS BIGINT) AS rs_milli
        FROM blocks WHERE s2_scaled > 0
    ), per_n AS (
        SELECT n, lx, CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(SUM(rs_milli) // COUNT(*) AS BIGINT) AS avg_rs_milli
        FROM rs GROUP BY 1, 2
    ), pts AS (
        SELECT n, lx AS x_milli, n_blocks, avg_rs_milli,
               CAST(FLOOR(ln(CAST(avg_rs_milli AS DOUBLE) / 1000.0) * 1000)
                    AS BIGINT) AS y_milli
        FROM per_n
    ), fit AS (
        SELECT CAST((COUNT(*) * SUM(x_milli * y_milli)
                     - SUM(x_milli) * SUM(y_milli)) * 1000
                    // (COUNT(*) * SUM(x_milli * x_milli)
                        - SUM(x_milli) * SUM(x_milli)) AS BIGINT) AS hurst_milli
        FROM pts
    )
    SELECT CAST(p.n AS INTEGER) AS n, p.n_blocks, p.avg_rs_milli,
           p.y_milli, f.hurst_milli
    FROM pts p CROSS JOIN fit f
    """,
    survey="E70,F26,J61",
)
def e70_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis of the daily
    event-count series — the long-range-dependence diagnostic (H≈0.5
    memoryless, H>0.5 persistent/trending, H<0.5 mean-reverting) that
    tells capacity planning whether bursts CLUSTER; completes the
    time-series analysis tier with the fractal leg (f26 periodicity,
    f34 spectrum, e47 trend, f33 level shifts).

    Exactness: per block of size n, the cumulative deviations are kept
    SCALED by n (D_k = n·prefix_k − k·S — exact BIGINTs, no rational
    mean), the variance as s2 = n·Σx² − S², and R/S = R_scaled/√s2 in
    one milli-floored double chain per block; per-n averages are
    integer; the log-log slope (Hurst) is exact-integer least squares
    over points whose x = ln(n)·1000 are Python-injected literals (the
    j97 discipline) and y is one milli-floored ln per n.  Zero-variance
    blocks are excluded on both engines.  Pinned against a pure-Python
    R/S fold in tests.

    Scale shape: daily pre-agg → calendar-bounded spine × 3 window
    sizes → PARTITIONED (n, block) windows → |blocks| hash agg → a
    3-row fit.  Nothing after the pre-agg scales with event volume."""
    from pyspark.sql import Window

    e = Tables(spark, sf_dir).events
    # r11 (guide §2.4): daily feeds the bounds fold AND the spine join
    # — cut once, one events scan.
    daily = e.groupBy(
        F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(F.count("*").alias("x")).localCheckpoint(eager=False)
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.col("d1") - F.col("d0"))).alias("t"),
        F.col("d0"),
    ).select("t", (F.col("d0") + F.col("t")).alias("day"))
    filled = spine.join(daily, "day", "left").select(
        "t", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    t_max = filled.agg(F.max("t").alias("tm"))
    ws = spark.createDataFrame(list(_HURST_NS), "n int, lx long")
    fan = (
        filled.crossJoin(F.broadcast(ws))
        .crossJoin(F.broadcast(t_max))
        .filter(F.expr("t DIV n") < F.expr("(tm + 1) DIV n"))
        .select(
            "n",
            "lx",
            F.expr("t DIV n").alias("b"),
            F.expr("t % n + 1").alias("k"),
            "x",
        )
    )
    wo = Window.partitionBy("n", "b").orderBy("k")
    wa = Window.partitionBy("n", "b")
    dev = fan.select(
        "n",
        "lx",
        "b",
        (
            F.col("n") * F.sum("x").over(wo.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("k") * F.sum("x").over(wa)
        ).alias("d"),
        F.sum("x").over(wa).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(wa).alias("ss"),
    )
    blocks = dev.groupBy("n", "lx", "b").agg(
        (F.max("d") - F.min("d")).cast("long").alias("r_scaled"),
        F.min(F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        .cast("long")
        .alias("s2_scaled"),
    )
    rs = blocks.filter(F.col("s2_scaled") > 0).select(
        "n",
        "lx",
        F.floor(
            F.col("r_scaled") * 1000.0 / F.sqrt(F.col("s2_scaled").cast("double"))
        )
        .cast("long")
        .alias("rs_milli"),
    )
    per_n = rs.groupBy("n", "lx").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.expr("SUM(rs_milli) DIV COUNT(*)").cast("long").alias("avg_rs_milli"),
    )
    pts = per_n.select(
        "n",
        F.col("lx").alias("x_milli"),
        "n_blocks",
        "avg_rs_milli",
        F.floor(F.log(F.col("avg_rs_milli").cast("double") / 1000.0) * 1000)
        .cast("long")
        .alias("y_milli"),
    )
    fit = pts.agg(
        F.expr(
            "(COUNT(*) * SUM(x_milli * y_milli) - SUM(x_milli) * SUM(y_milli))"
            " * 1000 DIV (COUNT(*) * SUM(x_milli * x_milli)"
            " - SUM(x_milli) * SUM(x_milli))"
        )
        .cast("long")
        .alias("hurst_milli")
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        F.col("n").cast("int").alias("n"),
        "n_blocks",
        "avg_rs_milli",
        "y_milli",
        "hurst_milli",
    )


# ------------------------------------------------------------------ batch 9

_RING_BUCKETS = 64
# md5-derived 60-bit token of the partition key — the SQL-certifiable
# stand-in for murmur3 (b1's production tier is Spark `hash`, rows-only
# by contract; THIS twin makes ring-placement arithmetic hash-certified).
_TOKEN_SQL = (
    "CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))"
    " AS UBIGINT) AS BIGINT)"
)


@register(
    "b13_token_ring_balance",
    oracle=f"""
    WITH keyed AS (
        SELECT {_TOKEN_SQL} % {_RING_BUCKETS} AS bucket, user_id
        FROM events
    ), loads AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys
        FROM keyed GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
               CAST(SUM(n_rows) // {_RING_BUCKETS} AS BIGINT) AS target,
               CAST((SUM(n_rows) + {_RING_BUCKETS - 1}) // {_RING_BUCKETS}
                    AS BIGINT) AS ceil_target
        FROM loads
    )
    SELECT CAST(l.bucket AS BIGINT) AS bucket, l.n_rows, l.n_keys,
           CAST(l.n_rows - t.target AS BIGINT) AS surplus_rows,
           CAST((l.n_rows * {_RING_BUCKETS} - t.total) * 1000000 // t.total
                AS BIGINT) AS imbalance_ppm,
           CAST(GREATEST(l.n_rows - t.ceil_target, 0) AS BIGINT)
               AS rows_to_move
    FROM loads l CROSS JOIN tot t
    """,
    survey="B13,B1,A29",
)
def b13_token_ring_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-ring balance audit + rebalance plan: partition keys placed
    on a {_RING_BUCKETS}-vnode ring by an md5-derived token (the
    hash-CERTIFIED twin of b1's murmur3 placement, which stays rows-only
    by contract), then per-vnode load, imbalance vs the uniform target,
    and the rows each overloaded vnode must shed to reach ceil(total/
    {_RING_BUCKETS}) — the `nodetool status`-style ownership audit plus
    the minimal-move rebalance plan an operator executes, completing
    the Cassandra-semantics tier with its OPERATIONAL leg (b1 places,
    THIS audits and plans).

    Exactness: md5 tokens are engine-identical; loads, targets (floor
    and ceil), surplus, ppm imbalance and move counts are pure integer
    arithmetic.  Law tests pin conservation (Σ surplus = total −
    {_RING_BUCKETS}·target) and that Σ rows_to_move is the minimal
    rebalance volume (= Σ positive deviations from ceil target).

    Scale shape: one hash agg to {_RING_BUCKETS} rows + a broadcast
    1-row total join.  Placement hashing is codegen'd JVM md5 — the
    same work a real ring write performs per row."""
    e = Tables(spark, sf_dir).events
    keyed = e.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
            ).cast("long")
            % _RING_BUCKETS
        ).alias("bucket"),
        "user_id",
    )
    loads = keyed.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_keys"),
    )
    tot = loads.agg(
        F.sum("n_rows").cast("long").alias("total"),
        F.expr(f"SUM(n_rows) DIV {_RING_BUCKETS}").cast("long").alias("target"),
        F.expr(f"(SUM(n_rows) + {_RING_BUCKETS - 1}) DIV {_RING_BUCKETS}")
        .cast("long")
        .alias("ceil_target"),
    )
    return loads.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_rows",
        "n_keys",
        (F.col("n_rows") - F.col("target")).cast("long").alias("surplus_rows"),
        F.expr(f"(n_rows * {_RING_BUCKETS} - total) * 1000000 DIV total")
        .cast("long")
        .alias("imbalance_ppm"),
        F.greatest(F.col("n_rows") - F.col("ceil_target"), F.lit(0))
        .cast("long")
        .alias("rows_to_move"),
    )


# ----------------------------------------------------------------- batch 10


@register(
    "e71_cramers_v",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY 1, 2
    ), margins AS (
        SELECT l.lang, s.source, l.nl, s.ns, t.n,
               COALESCE(c.o, 0) AS o
        FROM (SELECT lang, CAST(SUM(o) AS BIGINT) AS nl FROM cells GROUP BY 1) l
        CROSS JOIN (SELECT source, CAST(SUM(o) AS BIGINT) AS ns
                    FROM cells GROUP BY 1) s
        CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells) t
        LEFT JOIN cells c ON c.lang = l.lang AND c.source = s.source
    ), terms AS (
        SELECT n,
               CAST(FLOOR((CAST(o AS DOUBLE) - CAST(nl AS DOUBLE) * ns / n)
                          * (CAST(o AS DOUBLE) - CAST(nl AS DOUBLE) * ns / n)
                          / (CAST(nl AS DOUBLE) * ns / n) * 1000000)
                    AS BIGINT) AS t_micro,
               nl, ns
        FROM margins
    ), agg AS (
        SELECT MIN(n) AS n, CAST(SUM(t_micro) AS BIGINT) AS chi2_micro,
               CAST(COUNT(DISTINCT nl) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT ns) AS BIGINT) AS c
        FROM terms
    ), dims AS (
        SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS c
        FROM cells
    )
    SELECT a.n, d.r, d.c, a.chi2_micro,
           CAST(FLOOR(sqrt(CAST(a.chi2_micro AS DOUBLE) / 1000000.0
                / (a.n * (LEAST(d.r, d.c) - 1))) * 1000) AS BIGINT) AS v_milli
    FROM agg a CROSS JOIN dims d
    """,
    survey="E71,E37,E53",
)
def e71_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the EFFECT SIZE of e37's chi-square independence
    test on the lang × source contingency: χ² says "is there ANY
    association" (and grows with n even for trivial effects), V =
    √(χ²/(n·(min(r,c)−1))) ∈ [0,1] says "how MUCH" — the number a
    mixture report actually cites.  Completes the inference discipline:
    every test statistic in the registry now has its effect-size
    companion (e52→e40 CUPED lift, e49 ANOVA→e55 VRC, e37→this).

    Exactness: the full r×c grid including zero cells (the e65 Laplace-
    grid shape, unsmoothed — expected counts never vanish because
    margins are positive); each χ² term is ONE identical-op-order
    double chain micro-floored before the integer sum (the e37
    discipline); V is one final milli-floored sqrt of exact integers.

    Scale shape: one hash agg to the |langs|·|sources| bounded grid →
    KB joins → a 1-row summary."""
    d = Tables(spark, sf_dir).documents
    # r11 (guide §2.4): the bounded contingency grid feeds both margins,
    # the total, the grid join and the dims fold — cut once so the
    # documents scan+agg runs once, not five times.
    cells = (
        d.groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    nl = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("nl"))
    ns = cells.groupBy("source").agg(F.sum("o").cast("long").alias("ns"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    grid = (
        nl.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "nl",
            "ns",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    exp = "CAST(nl AS DOUBLE) * ns / n"
    terms = grid.select(
        "n",
        F.expr(
            f"CAST(FLOOR((CAST(o AS DOUBLE) - {exp}) * (CAST(o AS DOUBLE) - {exp})"
            f" / ({exp}) * 1000000) AS BIGINT)"
        ).alias("t_micro"),
    )
    agg = terms.agg(
        F.min("n").alias("n"), F.sum("t_micro").cast("long").alias("chi2_micro")
    )
    dims = cells.agg(
        F.countDistinct("lang").cast("long").alias("r"),
        F.countDistinct("source").cast("long").alias("c"),
    )
    return agg.crossJoin(F.broadcast(dims)).select(
        "n",
        "r",
        "c",
        "chi2_micro",
        F.floor(
            F.sqrt(
                F.col("chi2_micro").cast("double")
                / 1000000.0
                / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
            )
            * 1000
        )
        .cast("long")
        .alias("v_milli"),
    )


@register(
    "i23_masking_funcs",
    oracle="""
    WITH masked AS (
        SELECT regexp_replace(regexp_replace(regexp_replace(c_name,
                   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                   AS pattern,
               sha256(c_name) AS digest,
               c_mktsegment
        FROM customer
    )
    SELECT pattern, c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_distinct_digests,
           MIN(digest) AS min_digest
    FROM masked GROUP BY 1, 2
    """,
    survey="I23,J21,I13",
)
def i23_masking_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking function certification — the governance tier's
    FUNCTION surface (j21 redacts with regex rules; THIS certifies the
    engine built-ins a masking policy would actually call): Spark's
    native `mask()` (upper→X, lower→x, digit→n) against an explicit
    regexp-chain restatement in DuckDB — two independent implementations
    of format-preserving masking agreeing byte-for-byte — plus
    `sha2(·, 256)` against DuckDB's `sha256` (two independent SHA-256
    implementations, the j49/i21 two-engine evidence pattern).  Output:
    masked-PATTERN profile per market segment with digest-cardinality —
    the shape audit a PII reviewer reads (all names sharing one pattern
    = a generator artifact; digest cardinality = pseudonymization
    fan-out).

    Scale shape: one scan → hash agg on the (pattern, segment) bounded
    domain; both functions are codegen'd JVM expressions."""
    c = Tables(spark, sf_dir).customer
    masked = c.select(
        F.mask(F.col("c_name")).alias("pattern"),
        F.sha2(F.col("c_name"), 256).alias("digest"),
        "c_mktsegment",
    )
    return masked.groupBy("pattern", F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").cast("long").alias("n_customers"),
        F.countDistinct("digest").cast("long").alias("n_distinct_digests"),
        F.min("digest").alias("min_digest"),
    )


# ----------------------------------------------------------------- batch 11


@register(
    "j99_dedup_savings",
    oracle=f"""
    WITH {_cc_sql_edges()}, {_cc_sql_iters(_CC_ITERS)}, corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents
    ), exact_groups AS (
        SELECT md5({_NORM}) AS h, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               CAST(MIN(doc_id) AS BIGINT) AS survivor
        FROM documents GROUP BY 1
    ), exact_surv AS (
        SELECT e.h, e.n, e.chars, d.n_chars AS surv_chars
        FROM exact_groups e JOIN documents d ON d.doc_id = e.survivor
    ), exact_tier AS (
        SELECT 'exact' AS tier,
               CAST(SUM(n - 1) AS BIGINT) AS docs_removed,
               CAST(SUM(chars - surv_chars) AS BIGINT) AS chars_removed
        FROM exact_surv
    ), comp AS (
        SELECT node AS doc_id, lbl AS component_id FROM l{_CC_ITERS}
    ), members AS (
        SELECT c.component_id, d.n_chars
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ), comps AS (
        SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               CAST(MAX(n_chars) AS BIGINT) AS rep_chars
        FROM members GROUP BY 1 HAVING COUNT(*) >= 2
    ), nd_tier AS (
        SELECT 'near_dup' AS tier,
               CAST(SUM(n - 1) AS BIGINT) AS docs_removed,
               CAST(SUM(chars - rep_chars) AS BIGINT) AS chars_removed
        FROM comps
    ), u AS (
        SELECT * FROM exact_tier UNION ALL SELECT * FROM nd_tier
    )
    SELECT u.tier, u.docs_removed, u.chars_removed,
           CAST(u.docs_removed * 1000000 // c.n_docs AS BIGINT)
               AS docs_removed_ppm,
           CAST(u.chars_removed * 1000000 // c.n_chars AS BIGINT)
               AS chars_removed_ppm
    FROM u CROSS JOIN corpus c
    """,
    survey="J99,J1,J90",
)
def j99_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup SAVINGS accounting — the corpus-impact report a data lead
    reads before approving a curation config: for each dedup tier, how
    many documents and characters the tier's survivor election removes,
    absolute and as ppm of the corpus.  Tiers are INDEPENDENT
    measurements (near-dup components subsume exact groups — the
    near_dup row is the total a combined run saves, the exact row is
    the cheap tier's share), with deterministic survivor rules matching
    the registered operators: exact keeps the min doc_id per md5 group
    (j1), near-dup keeps the longest member per j90 component (j94's
    representative).

    Exactness: pure counting over exact integers on top of two certified
    pipelines (md5 groups, the CC chain).

    Scale shape: the j1 hash agg + the j90 propagation, then KB
    summaries — nothing new beyond the certified components it audits."""
    from cassandra_snap_to_hadoop_spark.operators.dedup import (
        dup_clusters,
        md5_minhash_bands,
        normalize_text,
    )

    d = Tables(spark, sf_dir).documents
    corpus = d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
    )
    groups = d.groupBy(F.md5(normalize_text(F.col("text"))).alias("h")).agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("chars"),
        F.min("doc_id").alias("survivor"),
    )
    surv = groups.join(
        d.select(F.col("doc_id").alias("survivor"), F.col("n_chars").alias("surv_chars")),
        "survivor",
    )
    exact_tier = surv.agg(
        F.lit("exact").alias("tier"),
        F.sum(F.col("n") - 1).cast("long").alias("docs_removed"),
        F.sum(F.col("chars") - F.col("surv_chars")).cast("long").alias("chars_removed"),
    ).select("tier", "docs_removed", "chars_removed")
    # r11 (guide §2.4): bands feeds hubs + the pair join — cut once.
    bands = md5_minhash_bands(d, n_hashes=_MH_N, rows_per_band=_MH_ROWS).localCheckpoint(
        eager=False
    )
    hubs = (
        bands.groupBy("band", "bkey")
        .agg(F.min("doc_id").alias("hub"), F.count("*").alias("nb"))
        .filter(F.col("nb") >= 2)
        .drop("nb")
    )
    pairs = (
        bands.join(hubs, ["band", "bkey"])
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("id_a"), F.col("doc_id").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = dup_clusters(
        d.select(F.col("doc_id").alias("id")), pairs, max_iterations=_CC_ITERS
    ).select(F.col("id").alias("doc_id"), "cluster_id")
    comps = (
        comp.join(d.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("chars"),
            F.max("n_chars").alias("rep_chars"),
        )
        .filter(F.col("n") >= 2)
    )
    nd_tier = comps.agg(
        F.lit("near_dup").alias("tier"),
        F.sum(F.col("n") - 1).cast("long").alias("docs_removed"),
        F.sum(F.col("chars") - F.col("rep_chars")).cast("long").alias("chars_removed"),
    ).select("tier", "docs_removed", "chars_removed")
    u = exact_tier.unionByName(nd_tier)
    return u.crossJoin(F.broadcast(corpus)).select(
        "tier",
        "docs_removed",
        "chars_removed",
        F.expr("docs_removed * 1000000 DIV n_docs").cast("long").alias("docs_removed_ppm"),
        F.expr("chars_removed * 1000000 DIV n_chars_total")
        .cast("long")
        .alias("chars_removed_ppm"),
    )
