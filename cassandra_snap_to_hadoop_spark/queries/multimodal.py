"""Multimodal (J10) and embedding-statistics (J11) queries.

Split out of llm.py so these rows register early: the driver's correctness
sweep is insertion-ordered with a bounded entry budget, and round 1's sweep
truncated before reaching J10/J11.  SQL-value-checked entries register
first (j10_multimodal_meta, j11_embedding_norms certify the two §2 rows);
the fan-out shape and the rows-only decode stub follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.io import Tables
from cassandra_snap_to_hadoop_spark.operators import similarity as sim
from cassandra_snap_to_hadoop_spark.operators.multimodal import (
    decode_stub,
    documents_as_media,
    frame_sample_stub,
)
from cassandra_snap_to_hadoop_spark.queries._util import round4
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "j10_multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain' AS mime,
           left(sha256(text), 16) AS sha_prefix
    FROM documents
    """,
    survey="J10",
)
def j10_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal schema plumbing: binary payload + typed metadata struct,
    checked on the metadata scalars (payload bytes stay opaque)."""
    d = Tables(spark, sf_dir).documents
    media = documents_as_media(d)
    return media.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.substring(F.sha2(F.col("payload"), 256), 1, 16).alias("sha_prefix"),
    )


@register(
    "j11_embedding_norms",
    oracle="""
    WITH norms AS (
        SELECT label,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
        FROM embeddings
    ), per_label AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               ROUND(AVG(nrm), 4) AS avg_norm
        FROM norms GROUP BY label
    ), pos AS (
        SELECT label, i, AVG(embedding[i]::DOUBLE) AS m
        FROM embeddings, range(1, 65) t(i)
        GROUP BY label, i
    ), cent AS (
        SELECT label, ROUND(sqrt(SUM(m * m)), 4) AS centroid_norm FROM pos GROUP BY label
    )
    SELECT p.label, n_vecs, avg_norm, centroid_norm
    FROM per_label p JOIN cent c ON p.label = c.label
    """,
    survey="J11",
)
def j11_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding statistics: per-label vector-norm average + centroid norm
    (centroid via positional explode — dim-independent distribution)."""
    e = Tables(spark, sf_dir).embeddings
    norms = e.select("label", sim.l2_norm(F.col("embedding")).alias("nrm"))
    per_label = norms.groupBy("label").agg(
        F.count("*").alias("n_vecs"), round4(F.avg("nrm")).alias("avg_norm")
    )
    cents = sim.ivf_centroids(e, "label").select(
        F.col("cluster").alias("label"), round4(sim.l2_norm(F.col("centroid"))).alias("centroid_norm")
    )
    return per_label.join(cents, "label")


@register(
    "j10_frame_sampling",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MAX(off) AS BIGINT) AS last_offset
    FROM (
        SELECT doc_id, unnest(range(0, octet_length(encode(text)), 64)) AS off
        FROM documents
    ) GROUP BY 1
    """,
    survey="J10",
)
def j10_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out shape (video -> frames): one output row per
    sampled byte offset per media row, via the frame_sample_stub's
    posexplode over a computed offset sequence — summarized per media id so
    the oracle stays scalar."""
    d = Tables(spark, sf_dir).documents
    frames = frame_sample_stub(documents_as_media(d), every_n_bytes=64)
    return frames.groupBy(F.col("media_id")).agg(
        F.count("*").alias("n_frames"),
        F.max("byte_offset").cast("long").alias("last_offset"),
    )


@register("j10_multimodal_decode", oracle=None, survey="J10,L4")
def j10_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction through the mapInPandas decode stub — the
    real Arrow-batched plumbing a production image/audio decoder uses
    (decode itself stubbed: deterministic byte statistics)."""
    d = Tables(spark, sf_dir).documents
    return decode_stub(documents_as_media(d))
