"""Content-defined chunking (CDC) — gear-hash rolling boundaries.

The dedup-friendly chunker (rsync/LBFS/restic lineage; Muthitacharoen et
al., SOSP 2001): a chunk boundary falls wherever the rolling hash of the
recent byte window hits a mask, so boundaries are a function of CONTENT,
not position.  The property that matters: editing or prepending bytes
shifts every fixed-size chunk but leaves all content-defined chunks
outside the edited neighborhood identical — which is what makes
chunk-level dedup of near-identical documents/blobs work (j31's
token-window chunking is the fixed-size counterpart; this is the
storage-dedup counterpart).

Deterministic by construction: the 256-entry gear table derives from
md5 of the byte value — no RNG, identical across engines, sessions and
partitions.  Pure Python per byte, wrapped in an Arrow-batched pandas
UDF at the call site: vectorized transport, scalar compute — the same
budget class as the zlib compression scorer (j20), acceptable because a
rolling dependency chain is inherently sequential per document.
"""

from __future__ import annotations

import hashlib

_MASK64 = (1 << 64) - 1

# Gear table: one pseudo-random 64-bit value per byte, derived (not drawn)
# so every worker builds the identical table.
GEAR: tuple[int, ...] = tuple(
    int.from_bytes(hashlib.md5(bytes([i])).digest()[:8], "big") for i in range(256)
)


def cdc_chunks(
    text: str,
    min_len: int = 64,
    avg_bits: int = 8,
    max_len: int = 1024,
) -> list[tuple[int, int, str]]:
    """Chunk a document's UTF-8 bytes; returns (start, end, md5hex) per
    chunk with ``end`` exclusive.  Boundary rule: once past ``min_len``,
    cut where the rolling gear hash has ``avg_bits`` trailing zero bits
    (expected chunk ≈ min_len + 2^avg_bits); hard cut at ``max_len``.
    Concatenating the chunk ranges reconstructs the input exactly."""
    data = text.encode("utf-8")
    out: list[tuple[int, int, str]] = []
    h = 0
    start = 0
    mask = (1 << avg_bits) - 1
    for i, byte in enumerate(data):
        h = ((h << 1) + GEAR[byte]) & _MASK64
        size = i - start + 1
        if (size >= min_len and (h & mask) == 0) or size >= max_len:
            out.append((start, i + 1, hashlib.md5(data[start : i + 1]).hexdigest()))
            start = i + 1
            h = 0
    if start < len(data):
        out.append((start, len(data), hashlib.md5(data[start:]).hexdigest()))
    return out
