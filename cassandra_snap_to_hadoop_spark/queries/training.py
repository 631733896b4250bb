"""Training-data curation depth (round-2 late additions): within-document
repetition signals, mixture/temperature source weighting, percentile-gated
quality cuts, compression-ratio scoring — plus driver certification of the
skew-mitigation operators (salted agg / salted join) and the bucketed-table
shuffle-free join path.

Registered after ``extended`` on purpose: the driver's bounded sweep window
this round certifies the front-loaded families; these are value-checked by
the local oracle mirror (and rotate into the window next round).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_snap_to_hadoop_spark.io import Tables, fan_out
from cassandra_snap_to_hadoop_spark.operators.text import tokens
from cassandra_snap_to_hadoop_spark.queries._util import round4, sql_qsum
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "j17_repetition_signals",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        FROM documents
    ), g AS (
        SELECT doc_id, w,
               CASE WHEN len(w) >= 2
                    THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
                    ELSE CAST([] AS VARCHAR[]) END AS grams
        FROM t
    )
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_tokens,
           CAST(len(grams) AS INTEGER) AS n_2grams,
           CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct_2grams,
           CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct_tokens,
           CAST(list_max(list_transform(list_distinct(w),
                t -> len(list_filter(w, x -> x = t)))) AS INTEGER) AS max_token_count
    FROM g
    """,
    survey="J9,J5",
)
def j17_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rules, per
    Rae et al. 2021 §A1.1): duplicate-2-gram mass (n_2grams vs distinct),
    vocabulary size, and the hottest token's count — the filters that drop
    boilerplate/spam documents before training.  Every output is an exact
    INTEGER (counts, never ratios), so the check needs no float rule; the
    consumer derives ratios downstream.  All per-row higher-order
    expressions — a pure codegen map stage, no shuffle, no UDF: the ideal
    100 TB shape (score while you scan).  Implementation:
    operators/text.py repetition_signals."""
    from cassandra_snap_to_hadoop_spark.operators.text import repetition_signals

    # r11 (guide §2.5): fan_out — the per-row HOF profile is the whole
    # query, and a one-split local scan serialized it on one core
    # (no-op at real scale).
    d = fan_out(Tables(spark, sf_dir).documents)
    return repetition_signals(d, "doc_id", "text")


@register(
    "j18_mixture_weights",
    oracle=r"""
    WITH s AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')))
                   AS n_tokens
        FROM documents GROUP BY 1
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(ROUND(1000000 * sqrt(n_tokens) / SUM(sqrt(n_tokens)) OVER ()) AS BIGINT)
               AS share_ppm,
           CAST(ROUND(100000 * sqrt(n_tokens) / SUM(sqrt(n_tokens)) OVER ()) AS BIGINT)
               AS quota_docs
    FROM s
    """,
    survey="J9,E2",
)
def j18_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture weighting (alpha = 0.5, the multilingual
    up-sampling rule from the XLM-R/mT5 line of work): each source's
    sampling share is n_tokens^alpha normalized over all sources, so
    small sources are up-weighted without letting any source dominate.
    sqrt is IEEE-exact per row; the only cross-engine hazard is the
    association order of the tiny over-all-sources window SUM (|sources|
    doubles), absorbed by integer ppm rounding.  Plan: one hash agg over
    the corpus + a window over |sources| rows — the second stage is
    O(sources), trivially driver-safe at any scale."""
    d = Tables(spark, sf_dir).documents
    from cassandra_snap_to_hadoop_spark.operators.text import token_count_ws

    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_ws(F.col("text")).cast("long")).alias("n_tokens"),
    )
    total = F.sum(F.sqrt("n_tokens")).over(Window.partitionBy())
    share = F.sqrt("n_tokens") / total
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share * 1000000).cast("long").alias("share_ppm"),
        F.round(share * 100000).cast("long").alias("quota_docs"),
    )


@register(
    "j19_quality_percentile_cut",
    oracle=r"""
    WITH t AS (
        SELECT lang,
               len(list_distinct(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')))
                   AS rich
        FROM documents
    ), m AS (
        SELECT lang, quantile_cont(rich, 0.5) AS med FROM t GROUP BY 1
    )
    SELECT t.lang AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rich >= med THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(MIN(med), 4) AS median_rich
    FROM t JOIN m ON t.lang = m.lang
    GROUP BY t.lang
    """,
    survey="J9,E6",
)
def j19_quality_percentile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-gated quality cut: keep documents at or above their
    language's median lexical richness — the relative-threshold filter a
    curation pipeline uses so one language's verbosity doesn't set another
    language's bar.  The quality key is an INTEGER (distinct-token count);
    the interpolated median of integers is exactly x.0 or x.5 in IEEE
    doubles, so the >= comparison is engine-exact (no float-boundary
    hazard).  Shape: corpus map -> per-lang percentile agg (tiny result,
    AQE broadcasts it back) -> one re-agg; swap percentile for
    percentile_approx at 100 TB exactly as e6 documents."""
    d = Tables(spark, sf_dir).documents
    t = d.select("lang", F.size(F.array_distinct(tokens(F.col("text")))).alias("rich"))
    m = t.groupBy("lang").agg(F.percentile("rich", 0.5).alias("med"))
    return (
        t.join(m, "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("rich") >= F.col("med"), 1).otherwise(0)).cast("long").alias("n_kept"),
            round4(F.min("med")).alias("median_rich"),
        )
    )


@register(
    "d11_salted_skew_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {qsum} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """.format(qsum=sql_qsum("o_totalprice")),
    survey="D2,E2",
)
def d11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⋈dim join, value-checked against the plain join: the
    salted plan (dim replicated n_salts times, fact salted on row
    identity, equi-join on (key, salt)) must produce byte-identical
    aggregates — salting redistributes work, never rows.  This certifies
    operators/skew.py's join path in the driver gate, not just in unit
    tests.  At scale this is the manual fallback when one hot key
    overwhelms even AQE's skew-join splitting (op docstring)."""
    from cassandra_snap_to_hadoop_spark.operators.skew import salted_join

    t = Tables(spark, sf_dir)
    fact = t.orders.select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    dim = t.customer.select("c_custkey", "c_mktsegment")
    joined = salted_join(fact, dim, "c_custkey", n_salts=8, fact_id_cols=["o_orderkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias("total_price"),
    )


@register(
    "e15_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           {qsum} AS qty_sum,
           MIN(l_extendedprice) AS lo,
           MAX(l_extendedprice) AS hi
    FROM lineitem GROUP BY 1
    """.format(qsum=sql_qsum("l_quantity")),
    survey="E2,E10",
)
def e15_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation, value-checked against the plain
    GROUP BY — exercises BOTH salted_agg merge forms: sum-mergeable
    partials (count, quantized sum) and the (expr, merge_fn) tuple form
    for min/max, whose partials must NOT be summed (the exact silent-wrong
    case the tuple API exists to prevent).  Identical output to one-phase
    aggregation is the operator's correctness contract."""
    from cassandra_snap_to_hadoop_spark.operators.skew import salted_agg

    li = Tables(spark, sf_dir).lineitem
    merged = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": F.count("*"),
            "qty_cents": F.sum(F.round(F.col("l_quantity") * 100).cast("long")),
            "lo": (F.min("l_extendedprice"), F.min),
            "hi": (F.max("l_extendedprice"), F.max),
        },
        salt_id_cols=["l_orderkey", "l_linenumber"],
        n_salts=16,
    )
    return merged.select(
        "l_returnflag",
        "n",
        (F.col("qty_cents") / 100.0).alias("qty_sum"),
        "lo",
        "hi",
    )


@register(
    "a9_bucketed_join",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {qsum} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """.format(qsum=sql_qsum("o_totalprice")),
    survey="A4,D2",
)
def a9_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: both sides written once with
    ``bucketBy(8, join_key).sortBy(join_key)``, then joined WITHOUT a
    shuffle — Spark trusts the persisted bucketing, so the sort-merge join
    reads matching buckets directly (test_training_queries.py asserts the
    bucket scan + no Exchange under the join).  This is THE pattern for a
    100 TB fact table joined repeatedly on the same key: pay the
    partitioning once at write time, amortize it over every later join.
    Values are checked against the plain (shuffling) join's SQL."""
    import shutil
    from urllib.parse import urlparse

    t = Tables(spark, sf_dir)
    suffix = Path(sf_dir).name.replace(".", "_")
    orders_tbl, cust_tbl = f"bkt_orders_{suffix}", f"bkt_customer_{suffix}"
    # The in-memory catalog forgets tables across sessions while the
    # warehouse directory persists; clear any orphaned location so the
    # rewrite can't hit LOCATION_ALREADY_EXISTS.
    warehouse = Path(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    for tbl in (orders_tbl, cust_tbl):
        loc = warehouse / tbl
        if not spark.catalog.tableExists(tbl) and loc.exists():
            shutil.rmtree(loc)
    if not spark.catalog.tableExists(orders_tbl):
        (
            t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable(orders_tbl)
        )
    if not spark.catalog.tableExists(cust_tbl):
        (
            t.customer.select("c_custkey", "c_nationkey")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable(cust_tbl)
        )
    o = spark.table(orders_tbl)
    c = spark.table(cust_tbl)
    joined = o.join(c, o["o_custkey"] == c["c_custkey"])
    return joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias("total_price"),
    )


@register("j20_compression_ratio", oracle=None, survey="J9,L4")
def j20_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (zlib level 6): highly repetitive
    or templated documents compress far below natural text — a cheap,
    model-free quality filter used alongside J17's n-gram rules.  zlib
    lives in Python, so this is the canonical Arrow-batched mapInPandas
    shape: score in parallel map tasks, aggregate into 5-point ratio
    buckets.  Rows-only: no SQL engine exposes deflate, and the byte
    ratio is zlib-build-specific (deterministic within this container;
    bucket histogram is pinned by a unit test)."""
    import pandas as pd

    d = Tables(spark, sf_dir).documents.select("doc_id", "text")

    def score(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].fillna("").map(lambda s: s.encode("utf-8"))
            ratio = raw.map(lambda b: len(zlib.compress(b, 6)) * 100 // max(len(b), 1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ratio_pct": ratio.astype("int64")})

    scored = d.mapInPandas(score, "doc_id long, ratio_pct long")
    bucket = (F.col("ratio_pct") - F.col("ratio_pct") % 5).alias("ratio_bucket_pct")
    return scored.groupBy(bucket).agg(F.count("*").alias("n_docs"))


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"


@register(
    "j21_pii_redaction",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 <> 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@mail.example.com or call 555-'
                         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE text END AS txt
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(txt, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5,
           CAST(length(regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                      '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS len_clean
    FROM injected
    """,
    survey="J9,I1",
)
def j21_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: detect + redact emails and phone
    numbers, emitting per-doc redaction counts and the scrubbed text's md5
    (the strongest cross-engine check: byte-identical redacted output).

    The synthetic corpus carries no PII by construction, so the fixture
    INJECTS deterministic PII into 2/3 of docs first (same
    prove-on-injected-signal pattern as j9_language_id_learned) — zero-hit
    docs stay in the output, covering the no-op path.  Patterns avoid
    Java-vs-RE2 dialect divergence: character classes and bounded repeats
    only, no lookaround (RE2 has none), no shorthand escapes.  Pure
    column expressions — one scan, no shuffle, no UDF: at 100 TB this is
    the cheapest operator class there is (codegen'd regex per partition)."""
    d = Tables(spark, sf_dir).documents
    injected = d.withColumn(
        "txt",
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com or call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("txt"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return injected.select(
        "doc_id",
        F.regexp_count(F.col("txt"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("txt"), F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(clean).alias("redacted_md5"),
        F.length(clean).cast("long").alias("len_clean"),
    )


_SPLIT_W = r"string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')"

# Deterministic per-source sampling rates for j22: src number mod 4 ->
# 0.25/0.50/0.75/1.00.  Rates are exact quarters so their 32-bit hex keep
# thresholds are single digits ('4','8','c') and the keep test reduces to a
# lexicographic compare of lowercase-hex md5 prefixes — identical on both
# engines with zero numeric conversion.  BOTH the Spark when-chains and the
# oracle CASE arms are generated from these dicts, so the constants cannot
# drift from the live query ('g0000000' sorts above every hex digest,
# encoding rate=1.0 with no special case).
_J22_THRESH = {0: "40000000", 1: "80000000", 2: "c0000000", 3: "g0000000"}
_J22_RATE = {0: 0.25, 1: 0.5, 2: 0.75, 3: 1.0}


@register(
    "j22_stratified_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT source,
               CAST(substr(source, 4) AS INTEGER) % 4 AS grp,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hk
        FROM documents
    )
    SELECT source,
           CAST(CASE grp WHEN 0 THEN {_J22_RATE[0]} WHEN 1 THEN {_J22_RATE[1]}
                         WHEN 2 THEN {_J22_RATE[2]} ELSE {_J22_RATE[3]} END AS DOUBLE) AS target_rate,
           CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(CASE WHEN hk < (CASE grp WHEN 0 THEN '{_J22_THRESH[0]}'
                                             WHEN 1 THEN '{_J22_THRESH[1]}'
                                             WHEN 2 THEN '{_J22_THRESH[2]}'
                                             ELSE '{_J22_THRESH[3]}' END)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM keyed
    GROUP BY source, grp
    """,
    survey="J9,E11",
)
def j22_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling — the mixture-control primitive
    of corpus assembly (keep 25% of low-value sources, all of high-value
    ones).  The keep decision hashes the DOCUMENT ID (md5 hex prefix <
    per-stratum threshold), not rand(): re-runs, retries, and incremental
    ingests all make the identical decision per document, which is what
    makes sampled corpora reproducible and joinable across pipeline
    versions.  One scan + one hash agg (the sample itself would be the
    filtered scan — no shuffle at all); thresholds compare lexicographic
    lowercase hex so both engines agree byte-for-byte.  'g0000000' sorts
    above every hex digest, encoding rate=1.0 with no special case."""
    d = Tables(spark, sf_dir).documents
    grp = F.substring("source", 4, 10).cast("int") % 4
    thresh = F.when(grp == 0, _J22_THRESH[0]).when(grp == 1, _J22_THRESH[1])
    thresh = thresh.when(grp == 2, _J22_THRESH[2]).otherwise(_J22_THRESH[3])
    rate = (
        F.when(grp == 0, _J22_RATE[0])
        .when(grp == 1, _J22_RATE[1])
        .when(grp == 2, _J22_RATE[2])
        .otherwise(_J22_RATE[3])
    )
    hk = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return d.groupBy("source", rate.alias("target_rate")).agg(
        F.count("*").alias("n_in"),
        F.sum((hk < thresh).cast("long")).alias("n_kept"),
    )


@register(
    "j23_unigram_lm_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest({_SPLIT_W}) AS tok FROM documents
    ), v AS (
        SELECT tok, COUNT(*) AS cnt FROM t GROUP BY 1
    ), tot AS (
        SELECT COUNT(*) AS n_total FROM t
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(FLOOR(ln(v.cnt * 1.0 / tot.n_total) * 1000000)
                         AS BIGINT)) AS BIGINT) AS sum_q_logprob
    FROM t JOIN v USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    survey="J9,J7",
)
def j23_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM scoring — the CCNet/perplexity-filter
    shape: train token frequencies on the corpus itself, score each
    document by its total token log-likelihood, downstream cuts drop the
    gibberish tail (atypically low avg logprob) and boilerplate head.

    Per-token logprobs are quantized to integer micro-nats (floor(ln*1e6))
    and summed EXACTLY, so the check is association-order-independent (the
    float rule); only a 1-ulp libm ln() straddling a floor boundary could
    diverge — measure-zero, same accepted class as stddev/corr.  Shape at
    100 TB: one corpus explode + hash-agg vocab (term space ≪ corpus, same
    economics as TF-IDF), then a vocab join back — AQE broadcasts it when
    small, shuffles when not — and a per-doc re-agg.  Three shuffles
    total on corpus-sized data, no UDF, no collect."""
    d = fan_out(Tables(spark, sf_dir).documents)
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("n_total"))
    q = F.floor(F.ln(F.col("cnt") / F.col("n_total")) * 1000000).cast("long")
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(q).alias("sum_q_logprob"),
        )
    )


@register(
    "j24_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type, 2) OVER w AS p2,
               lag(event_type, 1) OVER w AS p1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 || '>' || p1 AS context,
           event_type AS target,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY 1, 2
    """,
    survey="F2,J9",
)
def j24_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event-prediction training pairs from the event stream: per-user
    time-ordered trigram transitions (context = last 2 events, target =
    next), aggregated to transition counts — the sequence-model analogue
    of n-gram corpus statistics, and the exact shape of
    session-to-training-example conversion (lag windows build examples,
    the count agg here just makes the output compact and checkable).
    Tie-break on event_id makes per-user order total, so both engines see
    identical sequences.  One window shuffle on user_id + one hash agg;
    at 100 TB the window partitions by entity key — no global sort, and
    per-user data fits any executor by construction."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("event_type", 1).over(w).alias("p1"),
    ).filter(F.col("p2").isNotNull())
    return seq.groupBy(
        F.concat_ws(">", "p2", "p1").alias("context"),
        F.col("event_type").alias("target"),
    ).agg(F.count("*").alias("n"))


@register(
    "j25_upsample_epochs",
    oracle="""
    WITH planned AS (
        SELECT source,
               CAST(substr(source, 4) AS INTEGER) % 3 AS grp,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hk
        FROM documents
    ), expanded AS (
        SELECT source, grp,
               unnest(generate_series(
                   1,
                   CASE grp WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END
                   + CASE WHEN grp = 0 AND hk < '80000000' THEN 1
                          WHEN grp = 1 AND hk < '40000000' THEN 1
                          ELSE 0 END)) AS epoch
        FROM planned
    )
    SELECT source,
           CAST(CASE grp WHEN 0 THEN 1.5 WHEN 1 THEN 2.25 ELSE 3.0 END
                AS DOUBLE) AS target_epochs,
           CAST((SELECT COUNT(*) FROM documents d WHERE d.source = expanded.source)
                AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_rows_out
    FROM expanded
    GROUP BY source, grp
    """,
    survey="J9,I5",
)
def j25_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch mixture upsampling — the other half of corpus
    assembly (j22 downsamples, this repeats): 'books x2.25' means every
    doc appears twice and a deterministic 25% of docs get a third copy.
    Whole epochs come from ``explode(sequence(...))`` (a JVM-side
    generator, no UDF); the fractional tail reuses j22's md5-hex-threshold
    rule, so WHICH docs get the extra copy is reproducible and consistent
    across pipeline re-runs — rand() here would silently change the
    mixture every retry.  Shape at 100 TB: a pure map-side row generator
    (output rows = input x epochs, no shuffle) followed by one hash agg
    for the audit counts; the real pipeline writes the exploded rows."""
    d = Tables(spark, sf_dir).documents
    grp = F.substring("source", 4, 10).cast("int") % 3
    full = F.when(grp == 0, 1).when(grp == 1, 2).otherwise(3)
    frac_thresh = F.when(grp == 0, "80000000").when(grp == 1, "40000000").otherwise("00000000")
    target = F.when(grp == 0, 1.5).when(grp == 1, 2.25).otherwise(3.0)
    hk = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    copies = full + (hk < frac_thresh).cast("int")
    expanded = d.select(
        "source",
        target.alias("target_epochs"),
        F.explode(F.sequence(F.lit(1), copies)).alias("epoch"),
    )
    n_docs = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        expanded.groupBy("source", "target_epochs")
        .agg(F.count("*").alias("n_rows_out"))
        .join(F.broadcast(n_docs), "source")
        .select("source", "target_epochs", "n_docs", "n_rows_out")
    )


@register(
    "e17_weighted_stats",
    oracle="""
    WITH w AS (
        SELECT lang, n_chars,
               CASE substr(source, 4) WHEN '0' THEN 4 ELSE
                    CAST(substr(source, 4) AS INTEGER) % 4 + 1 END AS wt
        FROM documents
    ), ranked AS (
        SELECT lang, n_chars, wt,
               SUM(wt) OVER (PARTITION BY lang ORDER BY n_chars, wt
                             ROWS UNBOUNDED PRECEDING) AS cum_wt,
               SUM(wt) OVER (PARTITION BY lang) AS tot_wt
        FROM w
    )
    SELECT lang,
           CAST(SUM(wt) AS BIGINT) AS total_weight,
           CAST(SUM(wt * n_chars) AS BIGINT) AS weighted_char_sum,
           SUM(wt * n_chars) * 1.0 / SUM(wt) AS weighted_mean_chars,
           CAST(MIN(CASE WHEN cum_wt * 2 >= tot_wt THEN n_chars END) AS BIGINT)
               AS weighted_median_chars
    FROM ranked
    GROUP BY lang
    """,
    survey="E5,E6,F3",
)
def e17_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted statistics — mixture training assigns every
    source a weight (epochs, loss scale), so corpus stats must be
    weight-aware or they describe the wrong distribution.  Weighted mean
    via exact integer products (weights and chars are ints — no float
    rule needed at all); weighted median as the smallest value whose
    running cumulative weight reaches half the total — one window
    clustered by lang ordered by (value, weight) so the crossing row is
    engine-unique.  Shape: one window shuffle + one hash agg, the same
    economics as any per-group ordered statistic; at 100 TB swap the
    exact median for the weighted GK sketch exactly as e6 documents."""
    d = Tables(spark, sf_dir).documents
    src_num = F.substring("source", 4, 10).cast("int")
    wt = F.when(src_num == 0, 4).otherwise(src_num % 4 + 1)
    w = d.select("lang", "n_chars", wt.alias("wt"))
    win = (
        Window.partitionBy("lang")
        .orderBy("n_chars", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = w.select(
        "lang",
        "n_chars",
        "wt",
        F.sum("wt").over(win).alias("cum_wt"),
        F.sum("wt").over(Window.partitionBy("lang")).alias("tot_wt"),
    )
    return ranked.groupBy("lang").agg(
        F.sum("wt").alias("total_weight"),
        F.sum(F.col("wt") * F.col("n_chars")).alias("weighted_char_sum"),
        (F.sum(F.col("wt") * F.col("n_chars")) * 1.0 / F.sum("wt")).alias("weighted_mean_chars"),
        F.min(F.when(F.col("cum_wt") * 2 >= F.col("tot_wt"), F.col("n_chars"))).alias(
            "weighted_median_chars"
        ),
    )


@register(
    "j31_context_chunking",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
        FROM documents
    ), chunks AS (
        SELECT doc_id,
               unnest([md5(array_to_string(w[(i-1)*32+1:(i-1)*32+64], ' '))
                       for i in range(1, greatest((len(w) - 64 + 31) // 32 + 1, 1) + 1)])
                   AS chunk_md5,
               generate_subscripts([0 for i in range(1, greatest((len(w) - 64 + 31) // 32 + 1, 1) + 1)], 1)
                   AS chunk_idx,
               len(w) AS n_tokens
        FROM t
    )
    SELECT doc_id,
           CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           md5(string_agg(chunk_md5, '' ORDER BY chunk_idx)) AS chunks_digest
    FROM chunks
    GROUP BY doc_id
    """,
    survey="J5,J9,I5",
)
def j31_context_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining context-window chunking: split each document into
    64-token windows with stride 32 (50% overlap — the standard recipe so
    no span is ever seen only at a window edge).  Chunk count =
    ceil(max(n_tokens - window, 0) / stride) + 1; every chunk's md5 and
    the order-sensitive digest of all chunk hashes are value-checked, so
    BOTH the chunk boundaries AND their sequence are engine-identical —
    the property that makes a re-run resume mid-corpus without
    re-chunking drift.  Pure per-row array arithmetic (comprehension on
    DuckDB, transform+sequence on Spark), then one hash agg: zero
    shuffle before the per-doc re-agg, the score-while-you-scan shape."""
    d = fan_out(Tables(spark, sf_dir).documents)
    w = tokens(F.col("text"))
    n_chunks = F.greatest(
        F.floor((F.size(w) - 64 + 31) / 32).cast("long") + 1, F.lit(1).cast("long")
    )
    chunk_structs = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            i.alias("idx"),
            F.md5(F.array_join(F.slice(w, (i - 1) * 32 + 1, 64), " ")).alias("h"),
        ),
    )
    per_doc = d.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        chunk_structs.alias("cs"),
    )
    digest = F.md5(
        F.array_join(F.transform(F.array_sort(F.col("cs")), lambda x: x["h"]), "")
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.size("cs").cast("long").alias("n_chunks"),
        digest.alias("chunks_digest"),
    )
