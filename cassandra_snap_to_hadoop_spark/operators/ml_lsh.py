"""MLlib-backed LSH alternates (SURVEY §2-J2/J3 scale paths).

The engine's primary LSH tiers (operators/dedup.py, operators/similarity.py)
are pure-DataFrame; these wrap ``pyspark.ml.feature`` — MinHashLSH for
Jaccard and BucketedRandomProjectionLSH for Euclidean/cosine-on-unit-sphere
— as the battle-tested library alternative.  Seeds fixed => deterministic.

Gated behind an import-try: the engine degrades gracefully where mllib (or
numpy) is unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - availability gate
    from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
    from pyspark.ml.functions import array_to_vector

    ML_AVAILABLE = True
except Exception:  # pragma: no cover
    ML_AVAILABLE = False


def _require_ml() -> None:
    if not ML_AVAILABLE:
        raise NotImplementedError("pyspark.ml not available in this environment")


def minhash_lsh_pairs_ml(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hash_tables: int = 4,
    jaccard_distance_threshold: float = 0.4,
    num_features: int = 1 << 18,
) -> DataFrame:
    """J2 via MLlib: 3-word shingles -> binary HashingTF vectors ->
    MinHashLSH approxSimilarityJoin.  Returns (id_a < id_b, jaccard_dist).

    Shingles, not unigrams: token-SET Jaccard saturates on a shared
    vocabulary (every doc pair looks similar → quadratic candidate sets);
    shingle sets keep the same similarity definition as the native tier
    (operators/dedup.py) and keep collisions rare."""
    _require_ml()
    from cassandra_snap_to_hadoop_spark.operators.dedup import shingles

    toks = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), 3).alias("words")
    )
    tf = HashingTF(inputCol="words", outputCol="features", numFeatures=num_features, binary=True)
    # r11 (guide §2.4): ``feats`` is BOTH sides of approxSimilarityJoin
    # (and the fit input) — without a lineage cut the shingle explode +
    # HashingTF pipeline re-derives once per consumer.  One cut, same
    # deterministic vectors (seed-fixed model, values unchanged).
    feats = tf.transform(toks).filter(F.size("words") > 0).localCheckpoint(eager=False)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, jaccard_distance_threshold, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .distinct()
    )


def brp_lsh_neighbors_ml(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bucket_length: float = 1.0,
    num_hash_tables: int = 4,
    distance_threshold: float = 1.4,
) -> DataFrame:
    """J3 via MLlib: BucketedRandomProjectionLSH top-k neighbors, fully
    distributed — ``approxSimilarityJoin`` (bucket-colliding candidates
    within a Euclidean threshold) then a per-query top-k window.  On the
    unit sphere dist^2 = 2 - 2*cos, so a 1.4 threshold ≈ cos >= 0.02 —
    generous enough to recall near neighbors, tight enough to stay bounded.
    (MLlib's ``approxNearestNeighbors`` is single-key/driver-looped — the
    join form is the cluster-scale shape.)"""
    _require_ml()
    from pyspark.sql.window import Window

    from cassandra_snap_to_hadoop_spark.operators.similarity import l2_normalize

    c = corpus.select(F.col(id_col), array_to_vector(l2_normalize(F.col(vec_col))).alias("features"))
    q = queries.select(
        F.col(query_id_col), array_to_vector(l2_normalize(F.col(vec_col))).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=42,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(q, c, distance_threshold, distCol="dist")
    scored = joined.select(
        F.col(f"datasetA.{query_id_col}").alias(query_id_col),
        F.col(f"datasetB.{id_col}").alias("neighbor_id"),
        F.round("dist", 4).alias("dist"),
    ).filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("dist"), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, "neighbor_id", "dist", F.col("rn").cast("int").alias("rn"))
    )
