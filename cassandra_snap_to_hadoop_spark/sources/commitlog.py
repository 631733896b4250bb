"""Cassandra commitlog segment codec (SURVEY §2-A49) — the OTHER half
of point-in-time restore.

A snapshot is a consistent cut; everything after it lives in the
commitlog (`CommitLog-<version>-<id>.log` segments).  Cassandra's PITR
story — documented publicly as archive_command + restore_directories +
restore_point_in_time — is exactly: restore the snapshot, then REPLAY
archived commitlog segments up to the target instant.  The snapshot
half of this engine has been certified since round 1 (and through four
SSTable byte formats); this module adds the replay half in the same
miniature-but-real style as the SSTable codecs.

Segment layout (all integers big-endian; the real format's structure —
CRC-protected header, length+checksum framed mutations, explicit end
marker — in miniature):

    segment := "CSTH-CLG" <i32 version> <i64 segment_id>
               <u32 crc32(version || segment_id bytes)>
               entry* <u32 0>                  -- zero length = end
    entry   := <u32 len> <u32 crc32(body)> body
    body    := <i64 ts> <u8 op> <u16 keylen> <key bytes> payload
    op      := 0 CELL_WRITE   payload = <u16 namelen><name>
                                        <u32 vallen><value bytes>
               1 PARTITION_DELETE          (no payload)
               2 CELL_TOMBSTONE payload = <u16 namelen><name>

Key and value bytes reuse the SSTable codec's type encodings
(``sstable.encode_value`` / ``_encode_key``), so one type system spans
the whole restore path.  Readers verify the header CRC and every
entry CRC before yielding a mutation, and require the end marker — a
truncated segment (the crash case commitlogs exist for) is reported as
exactly that, never silently half-replayed.

Replay semantics are the storage engine's (b2/b3's LWW rules): cell
writes win by timestamp, cell tombstones null their column by
timestamp, partition deletes shadow every cell with ts <= the
deletion's.  The REPLAY itself is relational (a49's query): mutations
parse executor-side (one task per segment via the binaryFile source),
union with the snapshot's cell relation, and one max_by-per-cell
aggregation reconciles — no driver-side state, which is what makes
replaying a 10k-segment archive a Spark job instead of a
single-node tool.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any, Iterator

from cassandra_snap_to_hadoop_spark.sources.sstable import (
    TableMeta,
    _encode_key,
    decode_value,
    encode_value,
)

MAGIC = b"CSTH-CLG"
VERSION = 1

CELL_WRITE = 0
PARTITION_DELETE = 1
CELL_TOMBSTONE = 2


def write_commitlog_segment(
    path: str,
    segment_id: int,
    mutations: list[tuple],
    meta: TableMeta,
) -> None:
    """Write one segment.  ``mutations`` entries:
    ``(ts, CELL_WRITE, key_tuple, col_name, value)`` /
    ``(ts, CELL_TOMBSTONE, key_tuple, col_name)`` /
    ``(ts, PARTITION_DELETE, key_tuple)``."""
    out = bytearray()
    head = struct.pack(">iq", VERSION, segment_id)
    out += MAGIC + head + struct.pack(">I", zlib.crc32(head))
    for m in mutations:
        ts, op, key = m[0], m[1], m[2]
        kb = _encode_key(key, meta)
        body = bytearray(struct.pack(">qB", ts, op))
        body += struct.pack(">H", len(kb)) + kb
        if op == CELL_WRITE:
            col, value = m[3], m[4]
            nb = col.encode("utf-8")
            vb = encode_value(meta.types[col], value)
            body += struct.pack(">H", len(nb)) + nb
            body += struct.pack(">I", len(vb)) + vb
        elif op == CELL_TOMBSTONE:
            nb = m[3].encode("utf-8")
            body += struct.pack(">H", len(nb)) + nb
        elif op != PARTITION_DELETE:
            raise ValueError(f"unknown commitlog op {op}")
        out += struct.pack(">II", len(body), zlib.crc32(bytes(body)))
        out += body
    out += struct.pack(">I", 0)  # end marker
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def parse_commitlog_segment(
    raw: bytes, meta: TableMeta
) -> Iterator[dict[str, Any]]:
    """Verify + decode one segment's bytes into mutation dicts
    ``{"segment_id", "ts", "op", "key" (tuple), "col" (or None),
    "value" (decoded python value or None)}``.  Raises on a bad magic,
    header/entry CRC mismatch, or a missing end marker (truncation)."""
    if raw[: len(MAGIC)] != MAGIC:
        raise ValueError("not a CSTH-CLG commitlog segment")
    version, segment_id = struct.unpack_from(">iq", raw, len(MAGIC))
    if version != VERSION:
        raise ValueError(f"unsupported commitlog version {version}")
    (want_hcrc,) = struct.unpack_from(">I", raw, len(MAGIC) + 12)
    got_hcrc = zlib.crc32(raw[len(MAGIC) : len(MAGIC) + 12])
    if got_hcrc != want_hcrc:
        raise ValueError(
            f"commitlog header checksum mismatch: {got_hcrc} != {want_hcrc}"
        )
    i = len(MAGIC) + 16
    while True:
        if i + 4 > len(raw):
            raise ValueError(
                "truncated commitlog segment: end marker missing "
                f"(offset {i} of {len(raw)})"
            )
        (elen,) = struct.unpack_from(">I", raw, i)
        i += 4
        if elen == 0:
            return  # clean end marker
        (want_crc,) = struct.unpack_from(">I", raw, i)
        i += 4
        body = raw[i : i + elen]
        if len(body) != elen:
            raise ValueError(
                f"truncated commitlog entry at offset {i}: "
                f"{len(body)} of {elen} bytes"
            )
        got_crc = zlib.crc32(body)
        if got_crc != want_crc:
            raise ValueError(
                f"commitlog entry checksum mismatch at offset {i}: "
                f"{got_crc} != {want_crc}"
            )
        i += elen
        ts, op = struct.unpack_from(">qB", body, 0)
        j = 9
        (klen,) = struct.unpack_from(">H", body, j)
        j += 2
        kb = body[j : j + klen]
        j += klen
        from cassandra_snap_to_hadoop_spark.sources.sstable import _decode_key

        key = _decode_key(kb, meta)
        col = None
        value = None
        if op in (CELL_WRITE, CELL_TOMBSTONE):
            (nlen,) = struct.unpack_from(">H", body, j)
            j += 2
            col = body[j : j + nlen].decode("utf-8")
            j += nlen
            if op == CELL_WRITE:
                (vlen,) = struct.unpack_from(">I", body, j)
                j += 4
                value = decode_value(meta.types[col], body[j : j + vlen])
        elif op != PARTITION_DELETE:
            raise ValueError(f"unknown commitlog op {op} at offset {i}")
        yield {
            "segment_id": segment_id,
            "ts": ts,
            "op": op,
            "key": key,
            "col": col,
            "value": value,
        }
