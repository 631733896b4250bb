"""Scalar function groups (SURVEY §2-I) — one checked query per group,
each exercising several functions.  All JVM built-ins (whole-stage codegen);
DuckDB-divergent functions (initcap, months_between, spark hash/xxhash64)
are kept out of oracles and covered in unit tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.queries._util import round2, round4
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "i1_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           lower(p_type) AS type_low,
           substring(p_name, 1, 5) AS name5,
           CAST(length(p_name) AS INTEGER) AS name_len,
           concat_ws('/', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           trim(concat('  ', p_brand, '  ')) AS brand_trim,
           replace(p_type, ' ', '_') AS type_us,
           CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
           translate(p_brand, '#', '-') AS brand_dash,
           CAST(levenshtein(p_brand, 'Brand#1') AS INTEGER) AS lev_b1
    FROM part
    """,
    survey="I1",
)
def i1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part."""
    p = Tables(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_low"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("int").alias("lev_b1"),
    )


@register(
    "i2_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_2002,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
    survey="I2",
)
def i2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery.  The testdata 'date' columns are TIMESTAMPS
    (FIXTURES.md §1) — every output is cast to DATE/STRING/INT so both
    engines hash identical scalar values.  Spark dayofweek = DuckDB
    dayofweek + 1 (Sunday=1 vs Sunday=0) — aligned in the oracle."""
    o = Tables(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).cast("int").alias(
            "days_to_2002"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@register(
    "i3_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ROUND(abs(l_discount - 0.05), 4) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           ROUND(power(l_quantity, 2), 2) AS qty_sq,
           ROUND(sqrt(l_extendedprice), 4) AS price_sqrt,
           ROUND(ln(l_extendedprice), 4) AS price_ln,
           ROUND(log10(l_extendedprice), 4) AS price_log10,
           ROUND(exp(l_discount), 4) AS disc_exp,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS key_mod7,
           ROUND(greatest(l_quantity, l_discount * 100), 2) AS g,
           ROUND(least(l_quantity, l_discount * 100), 2) AS l
    FROM lineitem WHERE l_linenumber <= 2
    """,
    survey="I3",
)
def i3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (pmod mirrored as ((x%n)+n)%n in the oracle)."""
    li = Tables(spark, sf_dir).lineitem.filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        round4(F.abs(F.col("l_discount") - 0.05)).alias("disc_dev"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        round2(F.pow("l_quantity", 2)).alias("qty_sq"),
        round4(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        round4(F.log("l_extendedprice")).alias("price_ln"),
        round4(F.log10("l_extendedprice")).alias("price_log10"),
        round4(F.exp("l_discount")).alias("disc_exp"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.pmod("l_orderkey", F.lit(7)).cast("long").alias("key_mod7"),
        round2(F.greatest(F.col("l_quantity"), F.col("l_discount") * 100)).alias("g"),
        round2(F.least(F.col("l_quantity"), F.col("l_discount") * 100)).alias("l"),
    )


@register(
    "i4_conditional_funcs",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal > 0 THEN ROUND(c_acctbal, 2) ELSE 0.0 END AS pos_bal
    FROM customer
    """,
    survey="I4",
)
def i4_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF battery."""
    c = Tables(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_acctbal") > 0, round2(F.col("c_acctbal"))).otherwise(0.0).alias("pos_bal"),
    )


@register(
    "i5_array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           CAST(len(words) AS INTEGER) AS n_words,
           CAST(len(list_distinct(words)) AS INTEGER) AS n_distinct,
           CASE WHEN list_contains(words, 'data') THEN 1 ELSE 0 END AS has_data,
           list_sort(words)[1] AS first_word,
           array_to_string(words[1:3], ' ') AS first3,
           CAST(list_position(words, 'the') AS INTEGER) AS pos_the,
           CAST(len(list_filter(words, w -> length(w) > 5)) AS INTEGER) AS n_long,
           array_to_string(list_transform(words[1:2], w -> upper(w)), ' ') AS first2_up,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS total_chars
    FROM t
    """,
    survey="I5",
)
def i5_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function battery over tokenized documents.
    Position functions are 1-based in both engines (0 = absent)."""
    d = Tables(spark, sf_dir).documents
    words = F.split(F.col("text"), " ")
    t = d.select("doc_id", words.alias("words"))
    return t.select(
        "doc_id",
        F.size("words").cast("int").alias("n_words"),
        F.size(F.array_distinct("words")).cast("int").alias("n_distinct"),
        F.when(F.array_contains("words", "data"), 1).otherwise(0).alias("has_data"),
        F.sort_array("words").getItem(0).alias("first_word"),
        F.concat_ws(" ", F.slice("words", 1, 3)).alias("first3"),
        F.array_position("words", "the").cast("int").alias("pos_the"),
        F.size(F.filter("words", lambda w: F.length(w) > 5)).cast("int").alias("n_long"),
        F.concat_ws(" ", F.transform(F.slice("words", 1, 2), F.upper)).alias("first2_up"),
        F.aggregate(
            "words", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w).cast("long")
        ).alias("total_chars"),
    )


@register(
    "i6_map_funcs",
    oracle="""
    WITH t AS (
        SELECT event_id,
               MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
        FROM events
    )
    SELECT event_id,
           CAST(cardinality(m) AS INTEGER) AS m_size,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           map_extract(m, 'type')[1] AS type_val,
           map_extract(m, 'uid')[1] AS uid_val
    FROM t
    """,
    survey="I6",
)
def i6_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access battery (values extracted to scalars so the
    checked output carries no engine-specific map encoding)."""
    e = Tables(spark, sf_dir).events
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    t = e.select("event_id", m.alias("m"))
    return t.select(
        "event_id",
        F.size("m").cast("int").alias("m_size"),
        F.concat_ws(",", F.sort_array(F.map_keys("m"))).alias("keys_sorted"),
        F.element_at("m", "type").alias("type_val"),
        F.element_at("m", "uid").alias("uid_val"),
    )


@register(
    "i7_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_get,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
    survey="I7",
)
def i7_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props — path extraction (string API) and
    schema-full ``from_json`` both produce the same int."""
    e = Tables(spark, sf_dir).events
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_get"),
        F.from_json("props", schema).getField("k").cast("int").alias("k_struct"),
        F.when(F.from_json("props", schema).isNotNull(), 1).otherwise(0).alias("is_valid"),
    )


@register(
    "i8_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    """,
    survey="I8",
)
def i8_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (hex-string output matches across engines).
    Spark-only hashes (xxhash64, murmur3 ``hash``, crc32) power internal
    operators (dedup, bucketing) and are unit-tested, not oracle-checked."""
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length("text").cast("long").alias("text_len"),
    )


@register(
    "i9_struct_funcs",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               struct_pack(ck := o_custkey, price := o_totalprice, status := o_orderstatus) AS s
        FROM orders
    )
    SELECT o_orderkey,
           CAST(s.ck AS BIGINT) AS s_custkey,
           ROUND(s.price, 2) AS s_price,
           s.status AS s_status
    FROM t
    """,
    survey="I9",
)
def i9_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct pack/extract — nested values surfaced back to scalars."""
    o = Tables(spark, sf_dir).orders
    s = F.struct(
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    t = o.select("o_orderkey", s.alias("s"))
    return t.select(
        "o_orderkey",
        F.col("s.ck").cast("long").alias("s_custkey"),
        round2(F.col("s.price")).alias("s_price"),
        F.col("s.status").alias("s_status"),
    )


@register(
    "i7_variant_funcs",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    """,
    survey="I7",
)
def i7_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: ``parse_json`` once
    into the binary VARIANT encoding, then typed ``variant_get`` paths —
    at scale this beats per-path ``get_json_object`` because the document
    is parsed a single time however many paths are extracted (and VARIANT
    columns can be stored parsed, amortizing across queries).  Values
    checked against DuckDB's JSON extraction on the same paths."""
    e = Tables(spark, sf_dir).events
    v = e.select("user_id", F.parse_json(F.col("props")).alias("pv"))
    return v.groupBy("user_id").agg(
        F.sum(F.variant_get(F.col("pv"), "$.k", "long")).alias("k_sum"),
        F.count("*").alias("n"),
    )
