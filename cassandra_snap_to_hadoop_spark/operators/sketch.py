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


def md5_cms_counters(df, key_col: str, depth: int = 5, width: int = 512):
    """Relational count-min sketch: the SQL-certifiable twin of the native
    ``F.count_min_sketch`` tier above (VERDICT r5 item 4 — e21's reader was
    named the feasible certification target).

    The counter table IS a relation: row i (0..depth-1), bucket
    ``md5(i ':' key) % width``, counter = Σ counts of keys mapping there —
    one per-key hash agg followed by a depth-row broadcast fan-out and a
    second hash agg, so partial counters merge by addition exactly like the
    binary sketch (same Cormode-Muthukrishnan economics: only depth·width
    longs per group cross the wire).  md5 of the canonical integer string
    is the one hash an independent SQL engine reproduces verbatim, which
    makes every counter — and hence every min-over-rows point estimate —
    hash-certifiable end-to-end.  The native Spark aggregate + parser stay
    the production tier (seeded linear-congruential hash, tested above).

    Returns (i INT, b BIGINT, cnt BIGINT) with depth·width rows at most.
    """
    from pyspark.sql import functions as F

    per_key = df.groupBy(F.col(key_col).alias("k")).agg(F.count("*").alias("c"))
    rows = df.sparkSession.range(depth).select(F.col("id").cast("int").alias("i"))
    return (
        per_key.crossJoin(F.broadcast(rows))
        .select(
            "i",
            cms_bucket(F.col("i"), F.col("k"), width).alias("b"),
            "c",
        )
        .groupBy("i", "b")
        .agg(F.sum("c").alias("cnt"))
    )


def cms_bucket(i, key, width: int):
    """md5-derived CMS bucket: first 60 bits of md5('i:key') mod width —
    positive 60-bit value fits signed int64 on every engine (j58 pattern)."""
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(
            F.md5(F.concat(i.cast("string"), F.lit(":"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))
