"""J10 over REAL binary payloads — not the text-cast stand-in.

The driver's documents table has no binary column, so the registered j10
queries adapt text bytes; these tests close the gap by writing a parquet
fixture with a true ``binary`` column (magic headers + full 0x00-0xFF byte
range, i.e. invalid UTF-8), round-tripping it, and running every J10
operator over it with value-level assertions.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_stub,
    frame_sample_stub,
    resize_stub,
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _payload(i: int) -> bytes | None:
    if i == 3:
        return None  # missing media
    if i == 4:
        return b""  # zero-byte file
    # deterministic pseudo-random bytes covering the full 0x00-0xFF range
    body = hashlib.sha256(str(i).encode()).digest() * (i + 1)
    return PNG_MAGIC + bytes(range(256)) + body


@pytest.fixture(scope="module")
def binary_media_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("media") / "media.parquet")
    rows = [
        (
            i,
            _payload(i),
            ("image/png", 16 * (i + 1), 8 * (i + 1), len(_payload(i) or b"")),
        )
        for i in range(8)
    ]
    spark.createDataFrame(rows, MEDIA_SCHEMA).write.parquet(path)
    return path


def test_binary_roundtrip_exact_bytes(spark, binary_media_path):
    """Parquet preserves opaque binary exactly — including invalid UTF-8."""
    got = {r.media_id: bytes(r.payload) if r.payload is not None else None
           for r in spark.read.parquet(binary_media_path).collect()}
    assert got == {i: _payload(i) for i in range(8)}
    assert got[0] is not None and got[0].startswith(PNG_MAGIC)


def test_decode_stub_on_real_binary(spark, binary_media_path):
    media = spark.read.parquet(binary_media_path)
    feats = {r.media_id: r for r in decode_stub(media).collect()}
    for i in range(8):
        b = _payload(i)
        f = feats[i]
        if not b:
            assert f.n_bytes == 0 and f.byte_mean is None and f.byte_min is None
            assert (f.sha_prefix is None) == (b is None)
            continue
        assert f.n_bytes == len(b)
        assert f.byte_min == min(b) == 0  # full byte range present
        assert f.byte_max == max(b) == 255
        assert abs(f.byte_mean - sum(b) / len(b)) < 1e-9
        assert f.sha_prefix == hashlib.sha256(b).hexdigest()[:16]


def test_resize_stub_downsamples_payload_and_meta(spark, binary_media_path):
    media = spark.read.parquet(binary_media_path)
    small = {r.media_id: r for r in resize_stub(media, factor=4).collect()}
    for i in range(8):
        b = _payload(i)
        r = small[i]
        if b is None:
            assert r.payload is None and r.meta.n_bytes == 0
            continue
        assert bytes(r.payload) == b[::4]
        assert r.meta.n_bytes == len(b[::4])
        assert r.meta.mime == "image/png"
        assert r.meta.width == max(1, (16 * (i + 1)) // 4)
        assert r.meta.height == max(1, (8 * (i + 1)) // 4)
    # resized output flows through decode unchanged (schema contract)
    feats = decode_stub(resize_stub(media, factor=4)).collect()
    assert len(feats) == 8


def test_frame_sampling_on_real_binary(spark, binary_media_path):
    media = spark.read.parquet(binary_media_path).filter(F.col("payload").isNotNull())
    frames = frame_sample_stub(media, every_n_bytes=64)
    got = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    for i in (0, 1, 2, 5, 6, 7):
        n_bytes = len(_payload(i))
        assert got[i] == (n_bytes - 1) // 64 + 1
    assert got[4] == 1  # zero-byte file still yields the offset-0 frame


def test_embed_stub_matches_numpy_reference(spark, binary_media_path):
    """The stub embedding must equal the numpy-reference histogram exactly
    (same buckets, same L2 normalization), and NULL/empty payloads must
    produce NULL embeddings."""
    import numpy as np

    from cassandra_snap_to_hadoop_spark.operators.multimodal import embed_stub

    media = spark.read.schema(MEDIA_SCHEMA).parquet(binary_media_path)
    got = {r.media_id: r.embedding for r in embed_stub(media, dim=16).collect()}
    for i in range(8):
        b = _payload(i)
        if not b:
            assert got[i] is None, i
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        hist = np.bincount(arr // 16, minlength=16).astype("float64")
        want = hist / np.linalg.norm(hist)
        assert np.allclose(got[i], want, rtol=0, atol=0), i  # exact


def test_media_knn_identical_payloads_retrieve_each_other(spark):
    """End-to-end: two media rows with IDENTICAL bytes must be mutual
    nearest neighbors at cosine exactly 1.0."""
    from cassandra_snap_to_hadoop_spark.operators import similarity as sim
    from cassandra_snap_to_hadoop_spark.operators.multimodal import embed_stub

    rows = [
        (0, b"the same exact bytes", ("image/png", 1, 1, 20)),
        (1, b"the same exact bytes", ("image/png", 1, 1, 20)),
        (2, b"\x00\x01\x02completely different high bytes \xf0\xf1\xf2", ("image/png", 1, 1, 40)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    emb = embed_stub(media).filter(F.col("embedding").isNotNull())
    queries = emb.select(F.col("media_id").alias("query_id"), "embedding")
    knn = sim.knn_bruteforce(emb, queries, k=1, id_col="media_id").collect()
    top = {r.query_id: (r.neighbor_id, r.cos) for r in knn}
    assert top[0] == (1, 1.0)
    assert top[1] == (0, 1.0)
    assert top[2][1] < 1.0
