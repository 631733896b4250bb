"""Multimodal column handling (SURVEY §2-J10).

Images/audio/video travel as opaque ``binary`` columns with a typed struct
of metadata alongside.  The Spark-side plumbing — schema, Arrow batch
shapes, ``mapInPandas`` signatures, partition sizing — is real and tested;
the actual codec work is stubbed (this container has no image/audio libs)
behind ``decode_stub``: a deterministic fake that computes byte-level
statistics, so pipelines exercise the exact same dataflow a real decoder
would.

Scale notes: binary payloads dominate row size — metadata-only queries MUST
prune the binary column (asserted in tests/test_plans.py), and deployments
size ``spark.sql.files.maxPartitionBytes`` to payload rows, not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
        T.StructField("sha_prefix", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media schema (text bytes as the
    opaque payload) — the harness stand-in for an image/audio table."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Feature-extraction over binary payloads via ``mapInPandas``.

    STUB: a real deployment swaps ``_featurize`` for PIL/librosa/ffmpeg
    decode + model features; the Arrow batch transport, schema contract, and
    partition-parallel execution here are exactly what production uses.
    The fake features are deterministic byte statistics so tests can assert
    values end-to-end.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            # r11 (guide §4.2): byte stats were per-row pure-Python
            # sum()/min()/max() over the payload bytes; one numpy
            # reduceat pass over the batch's concatenated buffer
            # computes identical values (exact int sums -> the same
            # IEEE division; a zero-length segment makes reduceat echo a
            # neighbouring byte, masked out below).  Only the sha256
            # stays per row (no vectorized form).
            vals = payloads.tolist()
            lens = np.fromiter(
                (0 if b is None else len(b) for b in vals), dtype=np.int64, count=len(vals)
            )
            empty = lens == 0
            flat = np.frombuffer(b"".join(bytes(b) for b in vals if b), dtype=np.uint8)
            if len(flat):
                starts = (np.cumsum(lens) - lens).clip(max=len(flat) - 1)
                sums = np.add.reduceat(flat.astype(np.int64), starts)
                mins = np.minimum.reduceat(flat, starts).astype(np.int64)
                maxs = np.maximum.reduceat(flat, starts).astype(np.int64)
            else:
                sums = np.zeros(len(lens), dtype=np.int64)
                mins = maxs = sums
            mean_vals = sums.astype("float64") / np.where(empty, 1, lens)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": lens,
                    "byte_mean": [None if e else m for e, m in zip(empty, mean_vals)],
                    "byte_min": [None if e else int(m) for e, m in zip(empty, mins)],
                    "byte_max": [None if e else int(m) for e, m in zip(empty, maxs)],
                    "sha_prefix": [
                        hashlib.sha256(b).hexdigest()[:16] if b is not None else None
                        for b in vals
                    ],
                }
            )
            yield out

    return media.mapInPandas(_featurize, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, factor: int = 4) -> DataFrame:
    """Image-resize shape: payload -> smaller payload + updated dimensions,
    preserving MEDIA_SCHEMA so resized media flows through the same
    downstream operators (decode, frame-sample, sinks).

    STUB: real deployments decode + bilinear-resample in ``_resize``; here
    the payload is deterministically downsampled (every ``factor``-th byte)
    and width/height scale by the same factor, so tests can assert exact
    output bytes.  The Arrow batch transport and schema contract are the
    production dataflow.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            small = pdf["payload"].map(lambda b: None if b is None else bytes(b[::factor]))
            scale = lambda s: s.map(
                lambda v: None if v is None or pd.isna(v) else max(1, int(v) // factor)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": small,
                    "meta": [
                        {
                            "mime": m,
                            "width": w,
                            "height": h,
                            "n_bytes": 0 if b is None else len(b),
                        }
                        for m, w, h, b in zip(
                            meta["mime"], scale(meta["width"]), scale(meta["height"]), small
                        )
                    ],
                }
            )

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled "frame" (byte offset)
    per media row — the UDTF-like fan-out shape of video frame extraction,
    implemented with built-ins (posexplode over a computed offset sequence).
    A real decoder replaces offsets with frame timestamps."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(n - 1, F.lit(0).cast("long")),
        F.lit(every_n_bytes).cast("long"),
    )
    return media.select(
        "media_id",
        F.posexplode(offsets).alias("frame_no", "byte_offset"),
    )


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def embed_stub(media: DataFrame, dim: int = 16) -> DataFrame:
    """Binary payload -> embedding vector via ``mapInPandas`` — the encoder
    stage of a multimodal retrieval pipeline (image/audio encoder at
    production; the output feeds the SAME similarity operators as text
    embeddings, see operators/similarity.py).

    STUB: a real deployment swaps the byte-bucket histogram for a model
    encoder (CLIP/wav2vec); the Arrow batch transport, array<double> output
    schema, partition-parallel execution, and L2 pre-normalization contract
    are exactly the production dataflow.  The fake embedding is a
    DETERMINISTIC L2-normalized histogram of byte values in ``dim``
    equal-width buckets, so tests can assert exact vectors against a numpy
    reference and identical payloads land at cosine 1.0.  Empty/NULL
    payloads produce a NULL embedding (mirrors the zero-norm rule in
    operators/similarity.cosine)."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        width = 256 // dim
        for pdf in batches:
            embs = []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    embs.append(None)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=dim).astype("float64")
                n = float(np.linalg.norm(hist))
                embs.append((hist / n).tolist() if n > 0 else None)
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return media.mapInPandas(_embed, EMBED_SCHEMA)
