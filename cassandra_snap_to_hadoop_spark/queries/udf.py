"""UDF / UDAF / UDTF surface (SURVEY §2-L).

These demonstrate the engine's Python extension points — each one Arrow-
batched (pandas UDF family) or arrow-optimized (UDTF), never row-at-a-time.
Each checked query's formula is re-expressed in plain SQL for the oracle, so
what's validated is that the Python path computes exactly what the
declarative path would (the engine's UDF-correctness contract).

Scale rule (SURVEY §3.2): UDFs force an executor->Python-worker Arrow hop;
the engine keeps them out of hot relational paths and reserves them for
logic Catalyst can't express (here: demonstrations; in production: model
scoring, codec work, custom sketches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "l1_pandas_scalar_udf",
    oracle="""
    SELECT event_id, ROUND(1.0 / (1.0 + exp(-value)), 4) AS sigmoid_value
    FROM events
    """,
    survey="L1",
)
def l1_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (sigmoid) — one Arrow batch in, one out."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def sigmoid(v: pd.Series) -> pd.Series:
        return 1.0 / (1.0 + np.exp(-v))

    e = Tables(spark, sf_dir).events
    return e.select("event_id", F.round(sigmoid("value"), 4).alias("sigmoid_value"))


@register(
    "l2_grouped_agg_udf",
    oracle="""
    WITH q AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events)
    SELECT event_type,
           (SUM(cents) - MIN(cents) - MAX(cents)) / ((COUNT(*) - 2) * 100.0) AS trimmed_mean
    FROM q GROUP BY event_type
    """,
    survey="L2",
)
def l2_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via grouped-agg pandas UDF: cent-quantized trimmed mean
    (drop one min, one max) — quantization keeps the Python-side float sum
    exact so it's bit-identical to the SQL reformulation.  NOTE: a
    grouped-agg UDF materializes each group in one Arrow batch — acceptable
    for bounded group sizes; unbounded groups should use an algebraic
    reformulation like the oracle's instead."""

    @F.pandas_udf(T.DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        cents = (v * 100).round()
        return float((cents.sum() - cents.min() - cents.max()) / ((cents.count() - 2) * 100.0))

    e = Tables(spark, sf_dir).events
    return e.groupBy("event_type").agg(trimmed_mean("value").alias("trimmed_mean"))


@register(
    "l3_apply_in_pandas",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS zscore
    FROM events
    """,
    survey="L3",
)
def l3_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map transform (per-group z-score) via applyInPandas — the
    per-group DataFrame->DataFrame extension point."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": z.round(4)}
        )

    e = Tables(spark, sf_dir).events
    return e.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, zscore double"
    )


@register(
    "l4_map_in_pandas",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual
    FROM documents
    """,
    survey="L4",
)
def l4_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise Arrow batch transform via mapInPandas (tokenize +
    measure) — the shape used for model inference / codec passes."""

    def measure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("int32"),
                    "n_chars_actual": pdf["text"].str.len().astype("int32"),
                }
            )

    d = Tables(spark, sf_dir).documents
    return d.mapInPandas(measure, "doc_id long, n_tokens int, n_chars_actual int")


@register(
    "l5_python_udtf",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 5
    """,
    survey="L5",
)
def l5_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one row in -> many out (tokenizer).  The UDTF surface
    for custom table functions; heavy fan-outs use built-in explode (the
    oracle's unnest) — the UDTF exists for logic SQL can't express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is not None:
                for tok in text.split(" "):
                    yield doc_id, tok

    spark.udtf.register("cs2h_tokenize", Tokenize)
    Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 5).createOrReplaceTempView(
        "cs2h_udtf_docs"
    )
    return spark.sql(
        "SELECT t.doc_id, t.token FROM cs2h_udtf_docs, LATERAL cs2h_tokenize(doc_id, text) t"
    )
