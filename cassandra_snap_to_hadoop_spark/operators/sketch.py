"""Count-min sketch reader — the driver-side half of E21's mergeable
heavy-hitter pipeline.

Spark's ``count_min_sketch`` AGGREGATE does the distributed work: each
map task folds its partition into a (depth × width) counter table and the
partial tables merge by element-wise addition at the reduce — the classic
mergeable-summary shape (Cormode & Muthukrishnan 2005), identical
economics to the HLL (e12) and bitmap (e19) tiers: at 100 TB only
``depth·width`` longs per group cross the wire, never rows.

What Spark does NOT ship is a query side — the aggregate returns an
opaque binary and no SQL function reads it back.  This module parses the
(public, stable) serialization written by
``org.apache.spark.util.sketch.CountMinSketchImpl.writeTo``:

    int32  version (1)            big-endian (java.io.DataOutputStream)
    int64  totalCount
    int32  depth
    int32  width
    int64[depth]         hashA    (seeded PRNG — same seed ⇒ same hashA)
    int64[depth × width] table    (row-major)

and replicates its long-item hash (the stream-lib linear-congruential
family the Spark impl derives from)::

    h = hashA[i] * item            (Java 64-bit overflow semantics)
    h += h >> 32                   (arithmetic shift)
    h &= (1 << 31) - 1
    bucket = h % width

Format + hash are verified empirically in tests: a sketch over a known
multiset must estimate every member at >= its exact count and within
``eps * totalCount`` (the CMS guarantee), and per-group sketches built
with the SAME seed must merge (element-wise add) into exactly the global
sketch's table.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_MASK64 = (1 << 64) - 1
_PRIME_MODULUS = (1 << 31) - 1


def _to_signed64(v: int) -> int:
    v &= _MASK64
    return v - (1 << 64) if v >= (1 << 63) else v


@dataclass
class CountMinSketch:
    """Parsed Spark count-min sketch: estimate + exact merge."""

    total_count: int
    depth: int
    width: int
    hash_a: tuple[int, ...]
    table: list[list[int]]

    @classmethod
    def parse(cls, raw: bytes) -> "CountMinSketch":
        (version,) = struct.unpack_from(">i", raw, 0)
        if version != 1:
            raise ValueError(f"unsupported CountMinSketch version: {version}")
        (total,) = struct.unpack_from(">q", raw, 4)
        depth, width = struct.unpack_from(">ii", raw, 12)
        off = 20
        hash_a = struct.unpack_from(f">{depth}q", raw, off)
        off += 8 * depth
        table = []
        for _ in range(depth):
            table.append(list(struct.unpack_from(f">{width}q", raw, off)))
            off += 8 * width
        if off != len(raw):
            raise ValueError(f"trailing bytes in sketch: {len(raw) - off}")
        return cls(total, depth, width, hash_a, table)

    def _bucket(self, item: int, i: int) -> int:
        h = _to_signed64(self.hash_a[i] * item)
        h = h + (h >> 32)
        h &= _PRIME_MODULUS
        return h % self.width

    def estimate_long(self, item: int) -> int:
        """Point estimate for a long item: min over rows (>= exact count;
        <= exact + eps*totalCount with prob >= confidence)."""
        return min(self.table[i][self._bucket(item, i)] for i in range(self.depth))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Exact mergeability: same (depth, width, hashA) ⇒ the union
        sketch is the element-wise sum — how per-segment sketches roll up
        to any coarser grain without a rescan."""
        if (self.depth, self.width, self.hash_a) != (
            other.depth,
            other.width,
            other.hash_a,
        ):
            raise ValueError("incompatible sketches (different shape or seed)")
        return CountMinSketch(
            self.total_count + other.total_count,
            self.depth,
            self.width,
            self.hash_a,
            [
                [a + b for a, b in zip(ra, rb)]
                for ra, rb in zip(self.table, other.table)
            ],
        )
