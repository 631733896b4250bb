"""Round-3 late batch — the two remaining depth candidates from the
round-2 verdict plus a second wave of distinct analytics operators:

  * j57 exact-substring dedup (Lee et al. 2022 ExactSubstr): corpus-wide
    duplicated-span removal with order-preserving reassembly.  SQL.
  * j3_knn_pq product-quantization ANN (Jégou 2011 / FAISS IndexPQ +
    refine): sample-trained codebooks, codegen encoding, ADC shortlist,
    exact cosine re-rank.  Rows-only; parity/recall in tests/test_pq.py.
  * d19 point-in-time (PIT) join: dimension state valid AT each fact's
    timestamp (feature-store leakage rule) as a join-free merged-stream
    window.  SQL.
  * e26 multi-touch attribution: linear revenue split over the 24 h
    touch window, micro-cent integer shares, conservation-law-pinned.
  * e27 distinct-to-date via per-day HLL sketch merge.  Rows-only.
  * j58 weighted sampling w/o replacement (Efraimidis-Spirakis A-ES)
    with deterministic md5-derived keys.  SQL.
  * e28 robust means: 5%% trimmed + winsorized integer sums.  SQL.
  * e29 Gini concentration of per-source document sizes.  SQL.
  * j59 reciprocal nearest neighbors (mutual-best-match pairing).  SQL.
  * e30 equi-depth histogram via engine-exact ntile buckets.  SQL.
  * f20 MAD outlier detection, pure integer rank selection.  SQL.
  * e31 Wilson-score confidence intervals on conversion rates.  SQL.
  * f22 peak concurrency — interval-stabbing delta sweep.  SQL.
  * f21 LTTB shape-preserving series downsampling.  Rows-only.
  * j60 sparse idf-cosine pairs blocked on rare shingles.  SQL.
  * j61 Zipf's-law slope as regression-over-sufficient-statistics.  SQL.
  * e33 Benford first-digit distributional audit.  SQL.
  * f23 moving median — robust sliding smoother.  SQL.

Registered at the very end of the registry (behind the round-3 driver
window and its insurance tail): all are mirror/test-verified this round
at sf0.001/0.01/0.1 and rotate toward the driver window in round 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_snap_to_hadoop_spark.io import Tables, fan_out
from cassandra_snap_to_hadoop_spark.operators import pq
from cassandra_snap_to_hadoop_spark.operators.dedup import (
    exact_substring_dedup,
    normalize_text,
    shingles,
)
from cassandra_snap_to_hadoop_spark.operators.similarity import cosine, l2_normalize
from cassandra_snap_to_hadoop_spark.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# Span length for the ExactSubstr pass.  The paper uses 50 BPE tokens on
# web-scale corpora; the synthetic documents are short (tens of words), so
# K=5 keeps the operator non-trivial here (sf0.01 has ~1.1k duplicated
# 5-grams across ~2.3k occurrences) while the algorithm is length-generic.
_K = 5


@register(
    "j57_exact_substring_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS doc,
               unnest(string_split({_NORM}, ' ')) AS tok,
               CAST(generate_subscripts(string_split({_NORM}, ' '), 1) - 1 AS BIGINT) AS pos
        FROM documents
    ), tk AS (
        SELECT * FROM toks WHERE tok <> ''
    ), grams AS (
        SELECT doc, pos,
               string_agg(tok, ' ') OVER (PARTITION BY doc ORDER BY pos
                                          ROWS BETWEEN CURRENT ROW AND {_K - 1} FOLLOWING) AS gram,
               COUNT(*) OVER (PARTITION BY doc) AS n
        FROM tk
    ), g AS (
        SELECT doc, pos, gram FROM grams WHERE pos <= n - {_K}
    ), dup AS (
        SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
    ), occ AS (
        SELECT doc, pos FROM g WHERE gram IN (SELECT gram FROM dup)
    ), covered AS (
        SELECT DISTINCT o.doc, o.pos + s.off AS pos
        FROM occ o, generate_series(0, {_K - 1}) AS s(off)
    ), kept AS (
        SELECT t.doc, t.pos, t.tok
        FROM tk t LEFT JOIN covered c ON t.doc = c.doc AND t.pos = c.pos
        WHERE c.doc IS NULL
    ), agg AS (
        SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_kept,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_md5
        FROM kept GROUP BY doc
    ), tot AS (
        SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tk GROUP BY doc
    )
    SELECT d.doc_id AS doc,
           COALESCE(t.n_tokens, 0) AS n_tokens,
           COALESCE(t.n_tokens, 0) - COALESCE(a.n_kept, 0) AS n_removed,
           COALESCE(a.cleaned_md5, md5('')) AS cleaned_md5
    FROM documents d
    LEFT JOIN tot t ON t.doc = d.doc_id
    LEFT JOIN agg a ON a.doc = d.doc_id
    """,
    survey="J57,J2",
)
def j57_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup: any K-token span occurring >= 2 times anywhere in
    the corpus is removed from EVERY document that contains it; survivors
    reassemble in original token order (value-checked via md5 of the
    cleaned text, plus exact kept/removed token counts).

    Spark-first shape vs the paper's single-node suffix array:

      * K-gram generation is a codegen HOF over the token array (slice +
        array_join inside transform) — one corpus scan, no Python;
      * "span occurs twice" becomes ONE hash aggregate on md5(gram) — the
        distributed stand-in for the suffix-array duplicate scan (the md5
        keeps the shuffle key at 32 bytes regardless of K; collisions are
        2^-64-improbable and would only over-remove);
      * occurrence -> covered-token fan-out is a bounded explode (exactly
        K rows per duplicated occurrence), then a left-anti hash join on
        (doc, pos) filters the kept tokens — all equi-joins, no cartesian;
      * reassembly is a per-doc sort-collect, the same order-preserving
        pattern as j29's CCNet line dedup.

    At 100 TB: raise K to the paper's 50, swap md5 for xxhash64 pairs if
    32 B/gram is still too wide, and the shape is unchanged — the only
    all-corpus structure is the gram-hash aggregate, which partial-agg
    combines map-side.  Core in operators/dedup.py (exact_substring_dedup),
    semantics pinned on synthetic frames in tests/test_llm_ops.py."""
    d = Tables(spark, sf_dir).documents
    return exact_substring_dedup(d, "doc_id", "text", k=_K)


@register("j3_knn_pq", oracle=None, survey="J3,J3-pq")
def j3_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-ranking (FAISS IndexPQ +
    refine): 16 subspaces x 32 sub-centroids trained on a deterministic
    md5-ordered sample, corpus encoded to 16 codes/vector JVM-side, each
    of 8 query vectors shortlists 50 candidates by asymmetric distance
    over the codes, then exact cosine re-scores only the shortlist for
    top-5.  Rows-only by design (codebooks are learned); encode parity
    with the numpy reference, ADC distance correctness, and recall vs
    j3_knn_bruteforce are pinned in tests/test_pq.py.

    Vectors are L2-normalized first (in-plan, codegen): on the unit sphere
    squared L2 is 2-2*cos, so ADC ranking approximates the same cosine
    order the exact j3 tiers use — without it, L2-vs-cosine disagreement
    (not quantization error) dominates the ranking.  At 100 TB the
    exhaustive pass touches only M bytes/vector of codes (~32x smaller
    than raw doubles here) and the wide vectors are read back for just
    q*shortlist rows via a broadcast equi join."""
    e = Tables(spark, sf_dir).embeddings.withColumn(
        "embedding", l2_normalize(F.col("embedding"))
    )
    books = pq.train_codebooks(e, m=16, ksub=32, sample_n=400, iters=8, seed=7)
    # r11 (guide §2.5): the embeddings file is one input split locally, so
    # the 16×32-fold encode ran on one core; fan_out spreads the rows only
    # when the scan is under-split (no-op at real scale; row-wise encode —
    # values and code assignment are per-row, unchanged).
    coded = pq.encode(fan_out(e), books).select("vec_id", "codes")
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq.adc_topk_rerank(coded, e, queries, books, k=5, shortlist=50)


@register(
    "d19_pit_scd2_join",
    oracle="""
    WITH st AS (
        SELECT user_id, ts, event_id, event_type AS state,
               CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
        FROM events WHERE event_type <> 'purchase'
    ), p AS (
        SELECT user_id, event_id, ts, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
        FROM events WHERE event_type = 'purchase'
    ), ranked AS (
        SELECT p.user_id, p.event_id AS purchase_event_id,
               s.state, s.ts_ms AS s_ms,
               row_number() OVER (PARTITION BY p.user_id, p.event_id
                                  ORDER BY s.ts DESC, s.event_id DESC) AS rn
        FROM p JOIN st s ON s.user_id = p.user_id
         AND (s.ts < p.ts OR (s.ts = p.ts AND s.event_id < p.event_id))
    )
    SELECT p.user_id, p.event_id AS purchase_event_id, p.ts_ms AS purchase_ts_ms,
           COALESCE(r.state, 'unknown') AS state_at_purchase,
           COALESCE(r.s_ms, -1) AS state_since_ms
    FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.user_id = p.user_id AND r.purchase_event_id = p.event_id
    """,
    survey="D19,D7,B9",
)
def d19_pit_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join — the feature-store correctness pattern:
    each fact (purchase) is enriched with the dimension state that was
    valid AT its timestamp, never a later one (the leakage rule).  Dim
    updates are the user's non-purchase events; "valid at t" means the
    last update strictly before the fact in (ts, event_id) order; facts
    before any update report 'unknown'.

    Spark-first shape: ZERO joins.  Dim updates and facts merge into one
    stream (the d17/b9 family trick), ONE hash(user_id) exchange sorts it,
    and last_value(ignore nulls) over the running frame carries the state
    onto each fact row.  The oracle restates it independently as the
    quadratic interval join + per-fact rank.  At 100 TB, when dim and
    facts are separate tables, the same plan applies after a unionByName —
    both inputs shuffle once on the entity key, which is the floor for
    any temporally-correct enrichment; no row ever compares against more
    than its own entity's history."""
    e = Tables(spark, sf_dir).events
    states = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("state"),
        F.lit(None).cast("long").alias("fact_id"),
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("string").alias("state"),
        F.col("event_id").alias("fact_id"),
    )
    merged = states.unionByName(facts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cur_state = F.last("state", ignorenulls=True).over(w)
    cur_since = F.last(
        F.when(F.col("state").isNotNull(), F.unix_millis("ts")), ignorenulls=True
    ).over(w)
    return (
        merged.withColumn("st", cur_state)
        .withColumn("since", cur_since)
        .filter(F.col("fact_id").isNotNull())
        .select(
            "user_id",
            F.col("fact_id").alias("purchase_event_id"),
            F.unix_millis("ts").alias("purchase_ts_ms"),
            F.coalesce("st", F.lit("unknown")).alias("state_at_purchase"),
            F.coalesce("since", F.lit(-1)).alias("state_since_ms"),
        )
    )


@register(
    "e26_multitouch_attribution",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id AS pid, ts AS pts,
               CAST(ROUND(value * 1000000) AS BIGINT) AS vmicro
        FROM events WHERE event_type = 'purchase'
    ), s AS (
        SELECT user_id, event_id AS sid, ts AS sts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ), pairs AS (
        SELECT p.pid, p.vmicro, s.channel, s.sts, s.sid
        FROM p JOIN s ON s.user_id = p.user_id
         AND s.sts < p.pts AND s.sts >= p.pts - INTERVAL 24 HOUR
    ), att AS (
        SELECT channel,
               vmicro // COUNT(*) OVER (PARTITION BY pid)
               + CASE WHEN row_number() OVER (PARTITION BY pid ORDER BY sts, sid) = 1
                      THEN vmicro % COUNT(*) OVER (PARTITION BY pid) ELSE 0 END AS micro
        FROM pairs
    ), direct AS (
        SELECT 'direct' AS channel, vmicro AS micro
        FROM p WHERE pid NOT IN (SELECT pid FROM pairs)
    ), u AS (
        SELECT * FROM att UNION ALL SELECT * FROM direct
    )
    SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_assignments,
           CAST(SUM(micro) AS BIGINT) AS attributed_micro
    FROM u GROUP BY channel
    """,
    survey="E26,D6,F1",
)
def e26_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value is split
    equally across its view/click touchpoints in the 24 h strictly before
    it (same user); purchases with no touchpoint credit a 'direct'
    channel.  Completes the event-attribution family — k6 answers "which
    touch was FIRST", e14 "did the funnel convert", this answers "how
    much revenue does each channel get credit for".

    Exactness: value quantizes to micro-cents ONCE (both engines round
    the same double product), shares are integer division, and the
    remainder goes to the earliest touch — so per-channel totals are
    exact integers and the conservation law sum(attributed) ==
    sum(purchase micro-value) holds bit-for-bit (test-pinned).

    Scale shape: the touch window is an equi join on user_id with a range
    predicate — per-user candidates only, never cross-user; the per-
    purchase count/rank windows cluster on purchase id (a subset of the
    join output's partitioning); 'direct' is a broadcast-able anti join.
    A hot user with millions of events salts on time buckets exactly like
    d11/d16 — the 24 h bound makes (user, day) a natural co-key."""
    e = Tables(spark, sf_dir).events
    vmicro = F.round(F.col("value") * 1_000_000).cast("long")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
        vmicro.alias("vmicro"),
    )
    s = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("sid"),
        F.col("ts").alias("sts"),
        F.col("event_type").alias("channel"),
    )
    pairs = p.join(s, "user_id").filter(
        (F.col("sts") < F.col("pts"))
        & (F.col("sts") >= F.col("pts") - F.expr("INTERVAL 24 HOURS"))
    )
    w_n = Window.partitionBy("pid")
    w_rn = Window.partitionBy("pid").orderBy("sts", "sid")
    att = pairs.withColumn("n", F.count("*").over(w_n)).withColumn(
        "rn", F.row_number().over(w_rn)
    )
    micro = F.expr("vmicro DIV n") + F.when(
        F.col("rn") == 1, F.col("vmicro") % F.col("n")
    ).otherwise(F.lit(0))
    touched = att.select("channel", micro.alias("micro"))
    direct = p.join(pairs.select("pid").distinct(), "pid", "left_anti").select(
        F.lit("direct").alias("channel"), F.col("vmicro").alias("micro")
    )
    return (
        touched.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_assignments"),
            F.sum("micro").alias("attributed_micro"),
        )
    )


@register(
    "e27_hll_distinct_to_date",
    oracle="""
    WITH first AS (
        SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS fday
        FROM events GROUP BY 1
    ), per_day AS (
        SELECT fday AS day, CAST(COUNT(*) AS BIGINT) AS nf
        FROM first GROUP BY 1
    )
    SELECT day,
           CAST(SUM(nf) OVER (ORDER BY day) AS BIGINT) AS users_to_date,
           CAST(1 AS INTEGER) AS hll_within_5pct
    FROM per_day
    """,
    survey="E27,E4,E12",
)
def e27_hll_distinct_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day ("users to date") by MERGING
    per-day HLL sketches — the pattern that makes running-distinct cheap
    at 100 TB: each day persists one KB-sized sketch next to its
    partition, and any as-of-day distinct count is a union over <=365
    sketches of pre-aggregated state, never a rescan of raw events.
    (f9_running_distinct is the small-cardinality exact twin; this is the
    sketch tier for cardinalities where exact per-key state can't fit.)

    SQL-certified IN PLACE since round 7 (the e4/e6 error-contract-flag
    pattern, VERDICT r6 item 3 continued): the output carries the EXACT
    users-to-date (a user counts from their FIRST event day — per-user
    min-day agg, per-day counts, cumulative window over the ≤366-day
    calendar grid; hash-checked against DuckDB) next to
    ``hll_within_5pct``, computed from the LIVE sketch-union estimate
    while the oracle asserts the contractual constant 1 — if the merged
    HLL ever drifts past 5% of truth, the hash check goes red.  The
    estimate itself stays out of the output (engine-specific by design);
    its monotonicity law remains test-pinned.

    Shape: ONE hash agg builds the 30 daily sketches (map-side partial
    merge) + one per-user min-day agg for the exact side; the cumulative
    union is a triangular join OVER THE 30-ROW AGGREGATE (b.day <=
    a.day), bounded by days^2, nowhere near the fact table."""
    e = Tables(spark, sf_dir).events
    # Epoch-day from unix_micros: pure instant arithmetic, identical under
    # any driver session timezone (F.to_date on a TIMESTAMP interprets the
    # instant in the session zone and can shift every bucket boundary).
    day = (F.unix_micros(F.col("ts")) / 86_400_000_000).cast("long")
    daily = (
        e.select(day.alias("day"), "user_id")
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    )
    a = daily.select(F.col("day").alias("day"))
    b = daily.select(F.col("day").alias("bday"), "sk")
    est = (
        a.join(b, F.col("bday") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("long")
            .alias("est")
        )
    )
    first = e.groupBy("user_id").agg(F.min(day).alias("fday"))
    per_day = first.groupBy(F.col("fday").alias("day")).agg(
        F.count("*").cast("long").alias("nf")
    )
    wday = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exact = per_day.select(
        "day", F.sum("nf").over(wday).cast("long").alias("users_to_date")
    )
    return exact.join(est, "day").select(
        "day",
        "users_to_date",
        F.when(
            F.abs(F.col("est") - F.col("users_to_date")) * 20
            <= F.col("users_to_date"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("hll_within_5pct"),
    )


@register(
    "j58_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, GREATEST(n_chars, 1) AS w,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT) AS v
        FROM documents
    ), scored AS (
        SELECT doc_id, CAST(w AS BIGINT) AS weight,
               -ln((v + 1) / 281474976710656.0) / w AS key
        FROM keyed
    ), top AS (
        SELECT doc_id, weight, key FROM scored ORDER BY key, doc_id LIMIT 100
    )
    SELECT doc_id, weight, ROUND(key, 12) AS sample_key,
           CAST(row_number() OVER (ORDER BY key, doc_id) AS INTEGER) AS rn
    FROM top
    """,
    survey="J58,J22,G1",
)
def j58_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each document draws key = -ln(u)/w (u uniform, w = byte length) and
    the k smallest keys form an exact weighted sample — the principled
    version of "sample proportionally to document size/quality" that
    Bernoulli tiers (j22/j43) can't provide, because inclusion
    probabilities track weights WITHOUT replacement.

    Determinism is the whole point of the formulation here: u comes from
    the md5 of the document id (first 48 bits, parsed identically by both
    engines — verified digit-for-digit), so re-runs, retries, and
    incremental ingests select the identical sample; rand() would not
    survive any of those.  Scale shape: key is a codegen map over one
    scan, selection is orderBy+limit => TakeOrderedAndProject (per-
    partition top-k, no global sort, no single-partition window); the
    dense rank is a window over the 100 SELECTED rows only.  The only
    cross-engine float risk is two keys within ~1e-15 flipping rank —
    the accepted measure-zero class (NEXT.md)."""
    d = Tables(spark, sf_dir).documents
    v = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    w = F.greatest(F.col("n_chars").cast("long"), F.lit(1))
    key = -F.log((v + F.lit(1)) / F.lit(281474976710656.0)) / w
    scored = d.select(F.col("doc_id"), w.alias("weight"), key.alias("key"))
    top = scored.orderBy("key", "doc_id").limit(100)
    rn = F.row_number().over(Window.orderBy("key", "doc_id")).cast("int")
    return top.select(
        "doc_id", "weight", F.round("key", 12).alias("sample_key"), rn.alias("rn")
    )


@register(
    "e28_robust_mean",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(ROUND(value * 1000000) AS BIGINT) AS vmicro, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ROUND(value * 1000000), event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ), k AS (
        SELECT *, CAST((n * 5) // 100 AS BIGINT) AS kk FROM v
    ), bounds AS (
        SELECT event_type,
               MAX(CASE WHEN rn = kk + 1 THEN vmicro END) AS lo,
               MAX(CASE WHEN rn = n - kk THEN vmicro END) AS hi
        FROM k GROUP BY event_type
    )
    SELECT k.event_type,
           CAST(MAX(k.n) AS BIGINT) AS n,
           CAST(MAX(k.kk) AS BIGINT) AS n_trimmed_each_side,
           CAST(SUM(CASE WHEN k.rn > k.kk AND k.rn <= k.n - k.kk
                         THEN k.vmicro ELSE 0 END) AS BIGINT) AS trimmed_sum_micro,
           CAST(SUM(LEAST(GREATEST(k.vmicro, b.lo), b.hi)) AS BIGINT) AS winsor_sum_micro
    FROM k JOIN bounds b ON b.event_type = k.event_type
    GROUP BY k.event_type
    """,
    survey="E28,E5,E6",
)
def e28_robust_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust aggregation tier: 5% trimmed and winsorized sums per event
    type — the outlier-resistant means metric pipelines use where plain
    AVG is one fat-finger away from garbage (e5 gives the classical
    moments, e6 the percentiles; this is the robust-ESTIMATOR family).
    Trimming DROPS the k = floor(5% of n) smallest/largest observations;
    winsorizing CLAMPS them to the surviving boundary values.

    Exactness: observations quantize to micro-cents once, trim membership
    is integer rank arithmetic on the unique (value, event_id) order, and
    the outputs are INTEGER SUMS (divide at presentation) — so two
    engines cannot drift on boundary membership or accumulation order.
    Scale: one hash(event_type) exchange feeds the rank window; the
    trim/clamp bounds are a 5-row aggregate broadcast back; everything
    else is map-side.  Skewed group sizes salt like e15."""
    e = Tables(spark, sf_dir).events
    vmicro = F.round(F.col("value") * 1_000_000).cast("long")
    w_rank = Window.partitionBy("event_type").orderBy(vmicro, "event_id")
    w_all = Window.partitionBy("event_type")
    v = e.select(
        "event_type",
        vmicro.alias("vmicro"),
        "event_id",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    ).withColumn("kk", F.expr("(n * 5) DIV 100"))
    bounds = v.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.col("kk") + 1, F.col("vmicro"))).alias("lo"),
        F.max(F.when(F.col("rn") == F.col("n") - F.col("kk"), F.col("vmicro"))).alias("hi"),
    )
    joined = v.join(F.broadcast(bounds), "event_type")
    keep = (F.col("rn") > F.col("kk")) & (F.col("rn") <= F.col("n") - F.col("kk"))
    return joined.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("kk").cast("long").alias("n_trimmed_each_side"),
        F.sum(F.when(keep, F.col("vmicro")).otherwise(F.lit(0)))
        .cast("long")
        .alias("trimmed_sum_micro"),
        F.sum(F.least(F.greatest(F.col("vmicro"), F.col("lo")), F.col("hi")))
        .cast("long")
        .alias("winsor_sum_micro"),
    )


@register(
    "e29_gini_concentration",
    oracle="""
    WITH r AS (
        SELECT source, CAST(n_chars AS BIGINT) AS x,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS i
        FROM documents
    ), s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS total_chars,
               CAST(SUM(i * x) AS BIGINT) AS rank_weighted_sum
        FROM r GROUP BY source
    )
    SELECT source, n, total_chars, rank_weighted_sum,
           ROUND(2.0 * rank_weighted_sum / (n * total_chars)
                 - (n + 1.0) / n, 9) AS gini
    FROM s
    """,
    survey="E29,E20",
)
def e29_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of document sizes per source — the corpus-
    balance audit scalar: 0 = every doc the same size, ->1 = a few giants
    hold all the bytes (e20's Pareto cut asks "who covers 80%", this
    scores HOW concentrated the whole distribution is; j27/j37 are the
    dup-size and drift analogues).

    Exactness: the estimator G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n needs
    only two INTEGER accumulators over the size-sorted sequence; ties
    contribute the same total under any tie order (equal x across a fixed
    rank set), so the unique (n_chars, doc_id) sort is deterministic and
    the integers are engine-exact — the final double division happens
    once, from identical integers.  Scale: one hash(source) exchange
    feeds the rank window and the per-source aggregate (superset-
    clustered, the f16 rule); nothing else moves."""
    d = Tables(spark, sf_dir).documents
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    s = r.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("total_chars"),
        F.sum(F.col("i") * F.col("x")).alias("rank_weighted_sum"),
    )
    gini = F.round(
        2.0 * F.col("rank_weighted_sum") / (F.col("n") * F.col("total_chars"))
        - (F.col("n") + 1.0) / F.col("n"),
        9,
    )
    return s.select("source", "n", "total_chars", "rank_weighted_sum", gini.alias("gini"))


@register(
    "j59_reciprocal_nn",
    oracle="""
    WITH scored AS (
        SELECT a.vec_id AS qa, b.vec_id AS qb,
               list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ), best AS (
        SELECT qa, qb, cos FROM (
            SELECT *, row_number() OVER (PARTITION BY qa
                                         ORDER BY cos DESC, qb) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT m1.qa AS id_a, m1.qb AS id_b, ROUND(m1.cos, 4) AS cos
    FROM best m1 JOIN best m2 ON m1.qa = m2.qb AND m1.qb = m2.qa
    WHERE m1.qa < m1.qb
    """,
    survey="J59,J3,D9",
)
def j59_reciprocal_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest neighbors: pairs where each vector is the
    OTHER's single best cosine match — the mutual-best-match assignment
    rule behind bitext mining, SemDeDup-style pair confirmation, and
    entity-resolution one-to-one linking (one-directional top-1 lists,
    as in j3, over-link hubs: a popular vector can be everyone's best
    neighbor, but it has only ONE best neighbor of its own, so the
    reciprocity filter keeps at most one partner per vector).

    Shape: label-blocked best-neighbor search (equi join on the block
    key, the j3_knn_ivf candidate rule — never corpus-quadratic), top-1
    per vector via a rank window over the candidate output's own
    clustering, then reciprocity as a SELF-EQUI-JOIN of the tiny top-1
    relation on the swapped pair — n rows joining n rows on (a,b)=(b,a).
    At 100 TB the block key comes from a learned partitioner (kmeans
    cells / LSH buckets, the j3 scale tiers) and this pairing layer is
    unchanged."""
    e = Tables(spark, sf_dir).embeddings
    # r11 (guide §1.2 per-task work): the L2 norm used to be re-folded
    # PER PAIR inside cosine() — 3 64-term folds per candidate where one
    # suffices.  Each side now carries its norm from a per-row projection
    # (identical IEEE fold over identical operands ⇒ bit-identical
    # values; the pair term keeps the exact dot/(na*nb) expression), so
    # the quadratic stage does one dot per pair instead of dot + 2 norms.
    from cassandra_snap_to_hadoop_spark.operators.similarity import dot, l2_norm

    a = e.select(
        F.col("label").alias("lbl"),
        F.col("vec_id").alias("qa"),
        F.col("embedding").alias("va"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("label").alias("lbl"),
        F.col("vec_id").alias("qb"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    scored = (
        a.join(b, "lbl")
        .filter(F.col("qa") != F.col("qb"))
        .select(
            "qa",
            "qb",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qa").orderBy(F.col("cos").desc(), "qb")
    # r11 (guide §2.4): ``best`` is BOTH sides of the reciprocity join —
    # without a cut the whole label-blocked quadratic scoring pass runs
    # twice.  Top-1-per-vector is n rows, the cheapest possible cut.
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qa", "qb", "cos")
        .localCheckpoint(eager=False)
    )
    m2 = best.select(F.col("qa").alias("rb"), F.col("qb").alias("ra"))
    return (
        best.join(m2, (F.col("qa") == F.col("ra")) & (F.col("qb") == F.col("rb")))
        .filter(F.col("qa") < F.col("qb"))
        .select(F.col("qa").alias("id_a"), F.col("qb").alias("id_b"), F.round("cos", 4).alias("cos"))
    )


@register(
    "e30_equidepth_histogram",
    oracle="""
    WITH v AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
               ntile(16) OVER (ORDER BY ROUND(l_extendedprice * 100),
                               l_orderkey, l_linenumber) AS bucket
        FROM lineitem
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM v GROUP BY bucket
    """,
    survey="E30,E18,E6",
    tags=("profiling-only",),
)
def e30_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROFILING-ONLY TIER — do not reach for this at scale.  This is the
    registry's ONE deliberate full-relation single-reducer window: it is
    the calibration oracle for the registered scale twin
    ``e30_equidepth_scalable`` (two-pass global_rank + closed-form
    ntile_expr, same oracle SQL), kept so the scalable path has an exact
    in-registry reference to diff against.  At 100 TB use the twin.
    (`tags=("profiling-only",)`; tests/test_plans.py asserts this is the
    only registered query whose unpartitioned window runs over an
    unbounded fact relation.)

    Equi-DEPTH histogram of lineitem prices: 16 buckets of (near-)equal
    row count with their value boundaries — the optimizer-statistics /
    data-profiling counterpart of e18's equi-WIDTH histogram (equal-range
    buckets say nothing useful about skewed columns; equal-count buckets
    ARE the quantile structure).  ntile membership is integer arithmetic
    over a UNIQUE total order (cents, orderkey, linenumber), and both
    engines implement the SQL-standard first-(n mod k)-buckets-get-one-
    extra rule, so bucket assignment is engine-exact — no float
    percentile interpolation anywhere (e6 is the interpolating tier).

    Scale note: a global ntile is a single total order — fine for
    profiling runs, NOT for 100 TB.  The registered scale twin is
    e30_equidepth_scalable (queries/round4.py): two-pass global_rank +
    closed-form ntile, same oracle, no unpartitioned WindowExec.  This
    exact tier stays registered as that path's calibration oracle."""
    li = Tables(spark, sf_dir).lineitem
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    w = Window.orderBy(cents, "l_orderkey", "l_linenumber")
    v = li.select(cents.alias("cents"), F.ntile(16).over(w).alias("bucket"))
    return v.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    ).select(F.col("bucket").cast("int").alias("bucket"), "n", "lo_cents", "hi_cents")


@register(
    "f20_mad_outliers",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ROUND(value * 100), event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ), med AS (
        SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med
        FROM v GROUP BY event_type
    ), dev AS (
        SELECT v.event_type, v.cents, ABS(v.cents - m.med) AS d, v.event_id, m.med,
               row_number() OVER (PARTITION BY v.event_type
                                  ORDER BY ABS(v.cents - m.med), v.event_id) AS drn,
               COUNT(*) OVER (PARTITION BY v.event_type) AS n
        FROM v JOIN med m ON m.event_type = v.event_type
    ), mad AS (
        SELECT event_type, MAX(med) AS med,
               MAX(CASE WHEN drn = (n + 1) // 2 THEN d END) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(MAX(m.med) AS BIGINT) AS median_cents,
           CAST(MAX(m.mad) AS BIGINT) AS mad_cents,
           CAST(SUM(CASE WHEN d.d > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type
    """,
    survey="F20,F14,E23",
)
def f20_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection per event type — the
    ROBUST anomaly gate (f14's z-score uses mean/stddev, which the
    outliers being hunted contaminate; median/MAD have a 50% breakdown
    point).  Flags observations with |x - median| > 3*MAD.

    Everything is integer arithmetic: cents quantization, lower-median
    selection at rank (n+1) DIV 2 over the unique (value, id) order for
    BOTH the median and the MAD, and an integer threshold compare — no
    float percentile, no variance accumulation, nothing to drift.
    Scale: both rank windows and both aggregates cluster on event_type
    (ONE exchange reused down the chain); the 5-row median/MAD relations
    broadcast back for the deviation and threshold passes."""
    e = Tables(spark, sf_dir).events
    cents = F.round(F.col("value") * 100).cast("long")
    w_rank = Window.partitionBy("event_type").orderBy(cents, "event_id")
    w_all = Window.partitionBy("event_type")
    v = e.select(
        "event_type", cents.alias("cents"), "event_id",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    med = v.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("cents"))).alias("med")
    )
    dv = v.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("cents") - F.col("med"))
    )
    w_drank = Window.partitionBy("event_type").orderBy("d", "event_id")
    dev = dv.withColumn("drn", F.row_number().over(w_drank))
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.max(F.when(F.col("drn") == F.expr("(n + 1) DIV 2"), F.col("d"))).alias("mad"),
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("median_cents"),
            F.max("mad").alias("mad_cents"),
            F.sum((F.col("d") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


@register(
    "e31_wilson_ci",
    oracle="""
    WITH u AS (
        SELECT user_id % 10 AS bucket,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS converted
        FROM events GROUP BY user_id
    ), agg AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(converted) AS BIGINT) AS k
        FROM u GROUP BY bucket
    )
    SELECT bucket, n, k,
           ROUND((k * 1.0 / n + 1.9208 / n
                  - 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n + 0.9604 / (n * n * 1.0)))
                 / (1 + 3.8416 / n), 9) AS ci_lo,
           ROUND((k * 1.0 / n + 1.9208 / n
                  + 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n + 0.9604 / (n * n * 1.0)))
                 / (1 + 3.8416 / n), 9) AS ci_hi
    FROM agg
    """,
    survey="E31,E11",
)
def e31_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score 95% confidence interval on per-cohort conversion
    rates — the experiment-analytics primitive that makes small-sample
    rates honest (the naive Wald interval collapses to width zero at
    k=0 or k=n; Wilson stays calibrated).  Cohorts are user-id buckets;
    a user converts if they ever purchased.

    Cross-engine exactness without an accepted-risk entry: the only
    inputs are INTEGERS (k converters, n users) — both engines then
    evaluate the identical closed-form expression (z=1.96 constants
    folded to literals) in IEEE doubles, where +,*,/ and sqrt are all
    correctly-rounded operations, so the doubles agree bit-for-bit, not
    just to tolerance.  Scale: two hash aggregates (user → cohort), the
    first with map-side combine over the conversion flag; nothing else."""
    e = Tables(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted")
    ).select((F.col("user_id") % 10).alias("bucket"), "converted")
    agg = u.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("converted").alias("k")
    )
    p = F.col("k") * 1.0 / F.col("n")
    nn = F.col("n") * 1.0
    center = p + 1.9208 / nn
    half = 1.96 * F.sqrt(p * (1 - p) / nn + 0.9604 / (nn * nn))
    denom = 1 + 3.8416 / nn
    return agg.select(
        "bucket",
        "n",
        "k",
        F.round((center - half) / denom, 9).alias("ci_lo"),
        F.round((center + half) / denom, 9).alias("ci_hi"),
    )


@register(
    "f22_peak_concurrency",
    oracle="""
    WITH iv AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS lo,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
                 + 1 + o_orderkey % 20 AS hi
        FROM orders
    ), deltas AS (
        SELECT lo AS day, CAST(COUNT(*) AS BIGINT) AS delta FROM iv GROUP BY lo
        UNION ALL
        SELECT hi AS day, -CAST(COUNT(*) AS BIGINT) AS delta FROM iv GROUP BY hi
    ), merged AS (
        SELECT day, SUM(delta) AS delta FROM deltas GROUP BY day
    )
    SELECT day,
           CAST(SUM(delta) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_open
    FROM merged
    """,
    survey="F22,F16,D16",
)
def f22_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval stabbing / peak concurrency: how many orders are OPEN on
    each boundary day — the capacity-analytics sweep (peak concurrent
    sessions, max in-flight jobs, hotel-occupancy) that f16 (total
    covered length) and d16 (which intervals overlap) don't answer.
    Intervals are [order day, order day + 1 + orderkey%20), the f16/d16
    convention; each start contributes +1, each (exclusive) end -1, and
    the running sum of day-merged deltas IS the open count.

    Exactness: day arithmetic and deltas are integers; the sweep is a
    prefix sum over a unique day order — nothing floats.  Scale: the
    sweep window runs over the DAY-LEVEL aggregate (a few thousand rows
    after one hash agg with map-side combine), not the fact table — the
    classic trick that makes a 'global ordered scan' shape scale: reduce
    first, sweep the reduction.  (A per-key variant partitions the same
    sweep by the key, as f16 does.)"""
    o = Tables(spark, sf_dir).orders
    # datediff on the DATE column directly: date-only integer arithmetic is
    # session-timezone-free on both engines, unlike a date->timestamp cast
    # (which interprets midnight in the session zone and shifts the epoch
    # day under a non-UTC driver session — the plain_sweep contract class).
    lo = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
    hi = lo + 1 + F.col("o_orderkey") % 20
    iv = o.select(lo.alias("lo"), hi.alias("hi"))
    starts = iv.groupBy(F.col("lo").alias("day")).agg(F.count("*").alias("delta"))
    ends = iv.groupBy(F.col("hi").alias("day")).agg((-F.count("*")).alias("delta"))
    merged = (
        starts.unionByName(ends).groupBy("day").agg(F.sum("delta").alias("delta"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return merged.select(
        "day", F.sum("delta").over(w).cast("long").alias("n_open")
    )


def _lttb(ts, xs, n_out):
    """Largest-Triangle-Three-Buckets (Steinarsson 2013) on parallel
    INTEGER numpy arrays sorted by time; returns selected indices.
    Sequential by construction: each bucket's pick anchors the next
    bucket's triangle.

    EXACT-INTEGER form (the round-9 rows-only→SQL conversion): inputs
    are int64 lattices (relative seconds, milli-quantized values) and
    the next-bucket centroid is cleared of its division by scaling the
    doubled triangle area through the bucket count c —
    ``A = |(ax·c − Σt)(v − ay) − (ax − t)(Σv − ay·c)|`` — so every
    area is an exact BIGINT and DuckDB reproduces the argmax chain
    bit-for-bit.  Budget: |ax·c − Σt| ≤ c·span_sec and |Σv − ay·c| ≤
    c·2·max|v|, so |A| ≤ 2·c·span_sec·max|v| ≈ 2e15 on this corpus
    (c ≈ 330, 30-day span, v ≤ 5.7e5 milli) — 4000× inside int64 even
    before the 100× c headroom.  Ties pick the first (time-ordered)
    index, matching the oracle's (area DESC, rn ASC) NOT-EXISTS rule."""
    import numpy as np

    n = len(ts)
    if n_out >= n or n_out < 3:
        return list(range(n))
    picked = [0]
    # n_out-2 interior buckets over points 1..n-2, boundaries fixed
    edges = [1 + (i * (n - 2)) // (n_out - 2) for i in range(n_out - 1)]
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo, nhi = (edges[b + 1], edges[b + 2]) if b + 2 < len(edges) else (n - 1, n)
        ax, ay = int(ts[picked[-1]]), int(xs[picked[-1]])
        c = nhi - nlo
        st, sv = int(ts[nlo:nhi].sum()), int(xs[nlo:nhi].sum())
        seg_t, seg_x = ts[lo:hi], xs[lo:hi]
        areas = np.abs((ax * c - st) * (seg_x - ay) - (ax - seg_t) * (sv - ay * c))
        picked.append(lo + int(areas.argmax()))  # argmax: first index on ties
    picked.append(n - 1)
    return picked


# f21's doubled-triangle area, scaled by the next-bucket count: ONE
# template instantiated for both the candidate row p and the rival row q
# inside the oracle's NOT-EXISTS argmax (the e114 rule — a hand-copied
# second expression is how association-order drift slips in).  Anchor
# columns come from the chain row c, centroid sums from ctr row x.
def _f21_area_sql(row: str) -> str:
    return (
        f"ABS((c.t * x.c - x.st) * ({row}.vm - c.vm)"
        f" - (c.t - {row}.t) * (x.sv - c.vm * x.c))"
    )


@register(
    "f21_lttb_downsample",
    oracle=f"""
    WITH RECURSIVE base AS (
        SELECT event_type, event_id, value,
               epoch_us(ts) AS ts_us,
               CAST(ROUND(value * 1000) AS BIGINT) AS vm
        FROM events
    ), pts AS (
        SELECT event_type, event_id, value, ts_us, vm,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY ts_us, event_id)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               (ts_us - MIN(ts_us) OVER (PARTITION BY event_type))
                   // 1000000 AS t
        FROM base
    ), ib AS (
        -- Short-series gate (ADVICE r9): with n <= 64 the engine's _lttb
        -- returns ALL n points (its n_out >= n passthrough) while a
        -- 62-bucket chain would hit an empty bucket and silently
        -- truncate — so the chain only runs for n > 64 and short series
        -- take the passthrough branch of the final UNION instead.
        SELECT p.*, b.b + 1 AS bucket
        FROM pts p
        JOIN (SELECT unnest(range(0, 62)) AS b) b
          ON p.rn - 1 >= 1 + (b.b * (p.n - 2)) // 62
         AND p.rn - 1 < 1 + ((b.b + 1) * (p.n - 2)) // 62
        WHERE p.rn > 1 AND p.rn < p.n AND p.n > 64
    ), ctr AS (
        SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(vm) AS BIGINT) AS sv
        FROM ib GROUP BY 1, 2
        UNION ALL
        SELECT event_type, CAST(63 AS BIGINT), CAST(1 AS BIGINT), t, vm
        FROM pts WHERE rn = n AND n > 64
    ), chain AS (
        SELECT CAST(0 AS BIGINT) AS step,
               event_type, event_id, ts_us, value, t, vm
        FROM pts WHERE rn = 1 AND n > 64
        UNION ALL
        SELECT c.step + 1, p.event_type, p.event_id, p.ts_us, p.value,
               p.t, p.vm
        FROM chain c
        JOIN ib p ON p.event_type = c.event_type AND p.bucket = c.step + 1
        JOIN ctr x ON x.event_type = c.event_type AND x.bucket = c.step + 2
        WHERE c.step < 62 AND NOT EXISTS (
            SELECT 1 FROM ib q
            WHERE q.event_type = c.event_type AND q.bucket = c.step + 1
              AND ({_f21_area_sql("q")} > {_f21_area_sql("p")}
                   OR ({_f21_area_sql("q")} = {_f21_area_sql("p")}
                       AND q.rn < p.rn))
        )
    )
    SELECT event_type, event_id, ts_us, value, CAST(step AS INT) AS pos
    FROM chain
    UNION ALL
    SELECT event_type, event_id, ts_us, value, CAST(63 AS INT) AS pos
    FROM pts WHERE rn = n AND n > 64
    UNION ALL
    -- n <= 64 passthrough: every point, pos = time order (the engine's
    -- _lttb n_out >= n branch)
    SELECT event_type, event_id, ts_us, value, CAST(rn - 1 AS INT) AS pos
    FROM pts WHERE n <= 64
    """,
    survey="F21,L3,F4",
)
def f21_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB time-series downsampling (Largest-Triangle-Three-Buckets,
    Steinarsson 2013) — the standard shape-preserving reduction behind
    every monitoring dashboard: per event type, keep the 64 points that
    preserve the series' visual extremes (per-bucket max-triangle-area
    picks), where uniform/mean downsampling (f4's family) flattens
    exactly the spikes an operator needs to see.

    Each bucket's selected point anchors the next bucket's triangle, so
    like f15's CUSUM this is a genuine sequential recursion — NOT
    window-expressible — and runs as ``applyInPandas`` per series: one
    shuffle on the series key, the fold vectorized per bucket in numpy,
    state never leaves the group.

    SQL-CERTIFIED since round 9 (the VERDICT r8 item-5 conversion): the
    areas move to an exact integer lattice — t = seconds relative to the
    series head (BIGINT), v = milli-quantized value (HALF_UP ROUND in
    BOTH engines), next-bucket centroid division cleared by scaling the
    doubled area through the bucket count (see ``_lttb``) — so the pick
    chain is bit-identical engine arithmetic, and the DuckDB oracle
    restates the recursion as a WITH RECURSIVE lockstep chain (one row
    per series per step, 62 steps) whose per-step argmax is a correlated
    NOT-EXISTS against the same bucket (area DESC, rn ASC — exactly
    numpy argmax's first-max-in-time-order).  The milli lattice also
    ends the old float-centroid associativity exposure.

    Short-series contract (ADVICE r9): a series with n <= 64 points is
    returned UNCHANGED (all n points, pos = time order) by both engines
    — _lttb's n_out >= n passthrough on the engine side, an explicit
    n <= 64 UNION branch in the oracle (whose 62-bucket chain would hit
    an empty bucket below n = 64 and silently truncate).  Pinned by
    tests/test_round3b.py::test_f21_lttb_short_series_passthrough_contract
    on a staged n = 10/63/64/200 fixture.

    Scale: engine side is ONE shuffle on the series key + a vectorized
    per-group fold (the oracle's 62-step chain is the CERTIFICATE, not
    the production plan); series too long for one group pre-reduce with
    a coarse per-partition LTTB pass (same picks on the survivors)."""
    import pandas as pd

    def downsample(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        t_us = pdf["ts"].astype("int64").to_numpy() // 1000  # ns → µs
        t = (t_us - t_us[0]) // 1_000_000  # relative seconds (head = min)
        v = pdf["vm"].to_numpy()
        idx = _lttb(t, v, 64)
        out = pdf.iloc[idx]
        return pd.DataFrame(
            {
                "event_type": out["event_type"].to_numpy(),
                "event_id": out["event_id"].to_numpy(),
                "ts_us": t_us[idx],
                "value": out["value"].to_numpy(),
                "pos": list(range(len(idx))),
            }
        )

    # vm is computed JVM-side: Spark ROUND is BigDecimal HALF_UP on the
    # double's exact binary value, matching DuckDB ROUND — a Python-side
    # round would be banker's and drift on exact .5 products.
    e = Tables(spark, sf_dir).events.select(
        "event_type", "ts", "event_id", "value",
        F.round(F.col("value") * 1000).cast("long").alias("vm"),
    )
    return e.groupBy("event_type").applyInPandas(
        downsample,
        "event_type string, event_id long, ts_us long, value double, pos int",
    )


# Derived from _NORM (NOT a raw string: a raw r"...\\s+..." would hand DuckDB
# a literal backslash-backslash-s and silently no-op the whitespace collapse)
_NORM_W = f"string_split({_NORM}, ' ')"


@register(
    "j60_sparse_cosine_pairs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id AS doc, {_NORM_W} AS w FROM documents
    ), sh AS (
        SELECT doc, unnest(list_distinct([array_to_string(w[i:i+2], ' ')
                                          for i in range(1, greatest(len(w) - 1, 1))])) AS s
        FROM t
    ), stats AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s
    ), nd AS (
        SELECT CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs FROM sh
    ), w AS (
        SELECT sh.doc, sh.s, stats.df,
               CAST(FLOOR(ln(nd.n_docs * 1.0 / stats.df) * 1000000) AS BIGINT) AS wt
        FROM sh JOIN stats USING (s) CROSS JOIN nd
    ), norms AS (
        SELECT doc, SUM(wt * wt) AS nrm2 FROM w GROUP BY doc
    ), dots AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, SUM(a.wt * b.wt) AS dot
        FROM w a JOIN w b ON a.s = b.s AND a.doc < b.doc
        WHERE a.df <= 50 AND b.df <= 50
        GROUP BY 1, 2
    )
    SELECT d.doc_a, d.doc_b,
           ROUND(d.dot / (sqrt(na.nrm2 * 1.0) * sqrt(nb.nrm2 * 1.0)), 4) AS cos
    FROM dots d
    JOIN norms na ON na.doc = d.doc_a
    JOIN norms nb ON nb.doc = d.doc_b
    WHERE d.dot / (sqrt(na.nrm2 * 1.0) * sqrt(nb.nrm2 * 1.0)) >= 0.3
    """,
    survey="J60,J7,D9",
)
def j60_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse idf-weighted cosine document pairs over 3-word shingles —
    the inverted-index similarity join classic IR dedup runs when no
    embeddings exist: docs pair ONLY through shared RARE shingles
    (df <= 50), because frequent features carry negligible idf weight
    AND quadratic candidates — dropping them from pair GENERATION (not
    from the norms) is the standard candidate-pruning move.  Shingles,
    not unigrams, are the unit: this fixture's word vocabulary saturates
    (~31 terms at sf0.1, min df 250) while the shingle space keeps a
    rare tail at every scale — exactly why real systems block on n-grams.

    Cross-engine exactness: idf quantizes to integer micro-nats (the
    j23/j51 convention), so dot products and squared norms are exact
    INTEGERS; the one final cosine divide and its >= 0.3 gate evaluate
    identical doubles from identical integers (sqrt/divide correctly
    rounded) — no float accumulation, no accepted-risk entry.  Shape:
    one corpus scan -> distinct (doc, shingle) -> df stats joined back;
    pair generation is a SHINGLE-equi join bounded by df <= 50 per key
    (never corpus-quadratic); norms broadcast onto the pair aggregate."""
    d = fan_out(Tables(spark, sf_dir).documents)
    # r11 (guide §2.4): sh feeds the df stats, the n_docs agg and the
    # weighting join; w feeds norms + the rare pair sides — fully lazy
    # the shingle explode re-derived per consumer (27 Exchanges).  Lazy
    # (persist-backed) cuts compute each relation once.
    sh = d.select(
        F.col("doc_id").alias("doc"),
        F.explode(shingles(F.col("text"), 3)).alias("s"),
    ).localCheckpoint(eager=False)
    stats = sh.groupBy("s").agg(F.count("*").alias("df"))
    nd = sh.select("doc").distinct().agg(F.count("*").alias("n_docs"))
    w = (
        sh.join(stats, "s")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc",
            "s",
            "df",
            F.floor(F.log(F.col("n_docs") * 1.0 / F.col("df")) * 1_000_000)
            .cast("long")
            .alias("wt"),
        )
    ).localCheckpoint(eager=False)
    norms = w.groupBy("doc").agg(
        F.sum(F.col("wt") * F.col("wt")).alias("nrm2")
    ).localCheckpoint(eager=False)
    rare = w.filter(F.col("df") <= 50).select("doc", "s", "wt")
    a = rare.select(F.col("doc").alias("doc_a"), "s", F.col("wt").alias("wa"))
    b = rare.select(F.col("doc").alias("doc_b"), "s", F.col("wt").alias("wb"))
    dots = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc").alias("doc_a"), F.col("nrm2").alias("na2"))
    nb = norms.select(F.col("doc").alias("doc_b"), F.col("nrm2").alias("nb2"))
    cos = F.col("dot") / (F.sqrt(F.col("na2") * 1.0) * F.sqrt(F.col("nb2") * 1.0))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(cos >= 0.3)
        .select("doc_a", "doc_b", F.round(cos, 4).alias("cos"))
    )


@register(
    "j61_zipf_fit",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest({{_NORM_W}}) AS term FROM documents
    ), freq AS (
        SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok WHERE term <> '' GROUP BY 1, 2
    ), ranked AS (
        SELECT lang, cnt,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY cnt DESC, term) AS rnk
        FROM freq
    ), pts AS (
        SELECT lang,
               CAST(FLOOR(ln(rnk * 1.0) * 1000) AS BIGINT) AS x,
               CAST(FLOOR(ln(cnt * 1.0) * 1000) AS BIGINT) AS y
        FROM ranked
    ), s AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY lang
    )
    SELECT lang, n, sx, sy, sxy, sxx,
           ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS zipf_slope
    FROM s WHERE n * sxx - sx * sx <> 0
    """.replace("{_NORM_W}", _NORM_W),
    survey="J61,J8,E5",
)
def j61_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: least-squares slope of log(frequency)
    against log(rank) over the term frequency table — the corpus-law
    diagnostic (natural text sits near slope -1; a synthetic or
    templated corpus shows up immediately as a flat or kinked line).
    More generally this is DISTRIBUTED REGRESSION AS AGGREGATION: the
    slope needs only the sufficient statistics (n, Σx, Σy, Σxy, Σx²),
    which are one map-side-combinable hash aggregate — the pattern that
    fits any linear model at 100 TB without an ML runtime.

    Cross-engine exactness: ln(rank)/ln(count) quantize to integer
    MILLI-nats before any accumulation, so all five sums are exact
    integers (milli not micro: Σxy stays ~1e14 even at a 10^6-term
    vocabulary — far from int64 overflow, the documented tradeoff is
    3-decimal ln precision, irrelevant to a slope estimate); the single
    final divide evaluates identical doubles from identical integers.
    Rank ties break on term, and tie order cannot change the fit: tied
    counts share the same y whatever their relative rank order... but
    NOT the same x — so the (cnt DESC, term) order is pinned identically
    in both engines instead."""
    d = fan_out(Tables(spark, sf_dir).documents)
    tok = d.select(
        "lang", F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term")
    ).filter(F.col("term") != "")
    freq = tok.groupBy("lang", "term").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "term")
    pts = freq.select(
        "lang",
        F.floor(F.log(F.row_number().over(w) * 1.0) * 1000).cast("long").alias("x"),
        F.floor(F.log(F.col("cnt") * 1.0) * 1000).cast("long").alias("y"),
    )
    s = pts.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0 / denom, 6
    )
    return s.filter(denom != 0).select(
        "lang", "n", "sx", "sy", "sxy", "sxx", slope.alias("zipf_slope")
    )


@register(
    "e33_benford_digits",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit
        FROM orders WHERE o_totalprice > 0
    ), obs AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs
    )
    SELECT obs.digit, obs.n,
           ROUND(obs.n * 1.0 / tot.total, 6) AS observed_p,
           ROUND(ln(1.0 + 1.0 / obs.digit) / ln(10.0), 6) AS benford_p,
           ROUND(obs.n * 1.0 / tot.total
                 - ln(1.0 + 1.0 / obs.digit) / ln(10.0), 6) AS deviation
    FROM obs CROSS JOIN tot
    """,
    survey="E33,J53",
)
def e33_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts — the classic
    fabricated-data / fraud screen (organically-grown magnitudes put
    ~30.1% of leading digits at 1; fabricated or uniformly-synthesized
    values flatten the curve, which this synthetic fixture duly shows in
    its deviation column).  Completes the data-quality family: j53
    profiles shapes, j54 checks rules, f20 flags outliers, this tests a
    DISTRIBUTIONAL law.

    Exactness: the leading digit comes from STRING arithmetic on the
    integer cent value (no log10/pow on doubles — a float leading-digit
    extraction can misclassify values like 999.999... at the boundary);
    counts are integers, and the three reported ratios are single
    divisions both engines evaluate from identical integers (ln is
    correctly-rounded on both).  Shape: one scan -> 9-group hash agg ->
    broadcast scalar total (the j29 in-plan pattern — no eager count)."""
    o = Tables(spark, sf_dir).orders
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        o.filter(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("observed_p"),
            F.round(benford, 6).alias("benford_p"),
            F.round(F.col("n") * 1.0 / F.col("total") - benford, 6).alias("deviation"),
        )
    )


@register(
    "f23_moving_median",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), framed AS (
        SELECT user_id, event_id,
               list_sort(list(cents) OVER (PARTITION BY user_id
                                           ORDER BY event_id
                                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS fr
        FROM v
    )
    SELECT user_id, event_id,
           CAST(fr[CAST((len(fr) + 1) // 2 AS INTEGER)] AS BIGINT) AS mov_med_cents
    FROM framed
    """,
    survey="F23,F4,F20",
)
def f23_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving MEDIAN over each user's trailing 5 events — the robust twin
    of f4's moving average: one spike shifts a 5-row mean by a fifth of
    its magnitude but cannot move the median at all, which is why
    monitoring pipelines smooth with medians before thresholding.

    Exact by construction: the frame's cent values are collected, sorted,
    and the LOWER median selected by integer rank ((n+1) DIV 2) — the
    same convention as e23/f20, with none of the interpolation an
    engine's built-in median window would sneak in (DuckDB's median() is
    quantile_cont and interpolates on even frames; both sides therefore
    restate the explicit sort-and-pick).  Frames are ordered by the
    unique event_id so frame CONTENTS are deterministic.  Scale: one
    hash(user) exchange; the per-row sort cost is k log k on a
    constant-width frame — the honest cost of an exact sliding median
    (a rolling two-heap beats it single-node but has no distributed
    declarative form)."""
    e = Tables(spark, sf_dir).events
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-4, 0)
    )
    fr = F.array_sort(F.collect_list(cents).over(w))
    med = F.element_at(fr, ((F.size(fr) + 1) / 2).cast("int"))
    return e.select(
        "user_id",
        "event_id",
        med.alias("mov_med_cents"),
    )
