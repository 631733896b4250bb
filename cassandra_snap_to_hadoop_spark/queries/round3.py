"""Round-3 coverage extensions: XML source roundtrip (A-family), dedup
with best-quality representative selection (J-family), bucketed
interval-overlap join (D-family), URL parsing functions (I-family).

Registered AFTER the round-3 certification window on purpose (see
queries/__init__.py): value-checked by the local oracle mirror this round,
rotated into the driver window in round 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables, fan_out
from cassandra_snap_to_hadoop_spark.operators.dedup import normalize_text
from cassandra_snap_to_hadoop_spark.queries.layout import _staged
from cassandra_snap_to_hadoop_spark.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "a17_xml_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    """,
    survey="A3",
)
def a17_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source roundtrip — Spark 4's built-in XML data source (the
    spark-xml package merged upstream): write the corpus as one XML
    document tree, read it back with an EXPLICIT schema, and value-check
    content integrity against the parquet source of truth.  Reading with
    an explicit schema matters doubly for XML: inference costs a full
    extra pass (worse than JSON — the reader must parse every row
    element), and inferred numeric widths can drift per-file at scale.
    Entity escaping (&lt; &amp; quotes) must round-trip byte-exact —
    sum(length(text)) catches any lossy escape."""
    xml_dir = _staged("a17_xml", sf_dir, "documents")
    if not (xml_dir / "_SUCCESS").exists():
        docs = Tables(spark, sf_dir).documents.select("doc_id", "lang", "n_chars", "text")
        docs.write.format("xml").option("rowTag", "doc").mode("overwrite").save(str(xml_dir))
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, lang string, n_chars long, text string")
        .load(str(xml_dir))
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.length("text")).cast("long").alias("sum_text_len"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "j40_dedup_best_rep",
    oracle=f"""
    WITH injected AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 10 <= 2 THEN base.text ELSE d.text END AS text,
               d.n_chars
        FROM documents d
        JOIN documents base ON base.doc_id = (d.doc_id // 10) * 10
    ), hashed AS (
        SELECT doc_id, n_chars, md5({_NORM}) AS h FROM injected
    )
    SELECT doc_id AS rep_id,
           CAST(group_size AS BIGINT) AS group_size,
           CAST(n_chars AS BIGINT) AS rep_quality
    FROM (
        SELECT doc_id, n_chars,
               COUNT(*) OVER (PARTITION BY h) AS group_size,
               row_number() OVER (PARTITION BY h ORDER BY n_chars DESC, doc_id) AS rn
        FROM hashed
    ) WHERE rn = 1
    """,
    survey="J1,J2,E10",
)
def j40_dedup_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the BEST-QUALITY representative per duplicate
    cluster, not the smallest id — what a production corpus actually wants
    (among near-identical crawls keep the longest / highest-scoring copy;
    min-id keeps whichever landed first).  Duplicates are planted exactly
    as in j27 (docs with id%10<=2 overwritten by their decade-base text),
    then each normalized-content cluster elects argmax(quality, tiebreak
    min id); the per-doc ``n_chars`` column plays the quality score, since
    it varies within a planted cluster while the text does not.

    Scale shape: ONE hash aggregate keyed by content digest — the
    representative election is a single packed-long ``max_by`` (quality in
    the high bits, bit-inverted doc_id below), so every aggregation buffer
    stays primitive and the whole merge runs on codegen HashAggregate with
    map-side partial combine: one survivor candidate per digest per map
    task crosses the wire, exactly the lww_merge priority-tier economics
    (operators/cassandra.py).  The oracle mirrors the election with a
    window — same semantics, but the agg formulation is the 100 TB one."""
    d = fan_out(Tables(spark, sf_dir).documents)
    base = d.select(F.col("doc_id").alias("base_id"), F.col("text").alias("base_text"))
    injected = d.join(base, (F.col("doc_id") - F.col("doc_id") % 10) == F.col("base_id")).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 <= 2, F.col("base_text")).otherwise(F.col("text")).alias("text"),
        "n_chars",
    )
    # quality desc, then id asc: max over (n_chars << 32 | ~doc_id).
    priority = F.col("n_chars").cast("long") * F.lit(2**32) + (
        F.lit(2**32 - 1) - F.col("doc_id").cast("long")
    )
    return (
        injected.withColumn("h", F.md5(normalize_text(F.col("text"))))
        .groupBy("h")
        .agg(
            F.max_by("doc_id", priority).alias("rep_id"),
            F.count("*").alias("group_size"),
            F.max("n_chars").alias("rep_quality"),
        )
        .select("rep_id", "group_size", F.col("rep_quality").cast("long").alias("rep_quality"))
    )


@register(
    "d16_interval_overlap_join",
    oracle="""
    WITH promo AS (
        SELECT DISTINCT date_trunc('month', o_orderdate) AS p_lo,
               date_trunc('month', o_orderdate) + INTERVAL 9 DAY AS p_hi
        FROM orders
    )
    SELECT CAST(p_lo AS DATE) AS promo_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_value
    FROM orders JOIN promo
      ON o_orderdate <= p_hi AND p_lo <= o_orderdate + INTERVAL 6 DAY
    GROUP BY 1
    """,
    survey="D6,I2",
)
def d16_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join (two-sided ranges: ``a.lo <= b.hi AND b.lo <=
    a.hi``) — distinct from d6's point-in-interval shape.  Each order's
    7-day active window is matched against 10-day promo windows at every
    month start; output is per-promo-month order count + quantized value.

    Scale shape: the naive formulation is a pure theta join (cartesian —
    banned engine-wide).  Bucketed instead: a window [lo, hi] can only
    overlap promos in the months it touches, so each order explodes into
    its ≤2 candidate month buckets (array_distinct(month(lo), month(hi)))
    and joins EQUI on the bucket, with the exact overlap predicate as a
    post-filter.  Candidate volume is |orders| × window-months — linear,
    skew-proof, and the promo side broadcasts (month cardinality).  The
    same decomposition handles any bounded-span interval join at 100 TB
    (quantize both sides to cells of max span width); DuckDB runs the
    theta join directly, proving the bucketing loses no pairs."""
    o = Tables(spark, sf_dir).orders.select("o_orderkey", "o_totalprice", "o_orderdate")
    lo = F.col("o_orderdate")
    hi = F.date_add(lo, 6)
    promo = (
        o.select(F.trunc(lo, "month").alias("p_lo"))
        .distinct()
        .select("p_lo", F.date_add(F.col("p_lo"), 9).alias("p_hi"))
    )
    cand = o.select(
        "o_orderkey",
        "o_totalprice",
        lo.alias("lo"),
        hi.alias("hi"),
        F.explode(
            F.array_distinct(F.array(F.trunc(lo, "month"), F.trunc(hi, "month")))
        ).alias("mb"),
    )
    overlap = cand.join(F.broadcast(promo), cand.mb == promo.p_lo).filter(
        (F.col("lo") <= F.col("p_hi")) & (F.col("p_lo") <= F.col("hi"))
    )
    return overlap.groupBy(F.col("p_lo").alias("promo_month")).agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias("total_value"),
    )


@register(
    "i14_url_funcs",
    oracle="""
    SELECT doc_id,
           source || '.example.org' AS host,
           '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) AS path,
           'q=' || CAST(n_chars % 100 AS VARCHAR) || '&p=' || CAST(doc_id % 7 AS VARCHAR) AS query,
           CAST(n_chars % 100 AS VARCHAR) AS q_param,
           source || '+' || lang AS enc,
           CAST(1 AS BIGINT) AS roundtrip_ok
    FROM documents
    """,
    survey="I1",
)
def i14_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing/encoding functions (I-family depth) — the provenance
    primitive of web-crawl pipelines (group by host, dedup by normalized
    path, strip tracking params).  URLs are synthesized from corpus
    columns so DuckDB can state the expected parse RESULT directly from
    the same columns: Spark must round-trip construct -> parse_url
    (HOST/PATH/QUERY/named param) back to ground truth.  url_encode
    checks the form-encoding path (space -> '+'); roundtrip_ok asserts
    decode(encode(x)) == x row-by-row.  All JVM-codegen string functions
    — no UDF, no shuffle: a pure scan-shaped map at any scale."""
    d = Tables(spark, sf_dir).documents
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        (F.col("n_chars") % 100).cast("string"),
        F.lit("&p="),
        (F.col("doc_id") % 7).cast("string"),
    )
    raw = F.concat(F.col("source"), F.lit(" "), F.col("lang"))
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.url_encode(raw).alias("enc"),
        (F.url_decode(F.url_encode(raw)) == raw).cast("long").alias("roundtrip_ok"),
    )
