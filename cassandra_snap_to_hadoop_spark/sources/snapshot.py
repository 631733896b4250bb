"""Cassandra snapshot source (SURVEY §2-A2, §3.4) — the reference's job
("export Cassandra snapshots to Hadoop") as a first-class Spark source.

Layout handled (standard ``nodetool snapshot`` output, with parquet files
standing in for SSTables — no real SSTable binaries exist in this
environment, SURVEY §0; the binary parser would slot into
``_SnapshotPartitionReader.read`` without touching anything else):

    <data_dir>/<keyspace>/<table>/snapshots/<tag>/schema.cql
    <data_dir>/<keyspace>/<table>/snapshots/<tag>/gen-*.parquet

Design for scale: one ``InputPartition`` per snapshot file (SSTable) — the
natural parallelism unit of a snapshot; readers stream Arrow batches, so a
1000-executor cluster ingests 1000 SSTables concurrently with zero driver
involvement beyond listing.  Schema comes from ``schema.cql`` (Cassandra
ships it inside every snapshot since 3.0), never from file inference.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# CQL -> Spark DDL type mapping (SURVEY §1.1 table).
_CQL_TO_SPARK = {
    "text": "string",
    "ascii": "string",
    "varchar": "string",
    "int": "int",
    "bigint": "long",
    "varint": "long",
    "smallint": "short",
    "tinyint": "byte",
    "float": "float",
    "double": "double",
    "decimal": "decimal(38,18)",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "date": "date",
    "time": "long",
    "uuid": "string",
    "timeuuid": "string",
    "inet": "string",
    "blob": "binary",
    "counter": "long",
}


def parse_schema_cql(cql: str) -> str:
    """Parse a snapshot's ``schema.cql`` CREATE TABLE into a Spark DDL
    schema string.  Handles primitives plus list/set/map/frozen collections;
    PRIMARY KEY clauses are layout metadata, not columns."""
    m = re.search(r"CREATE\s+TABLE[^(]*\(", cql, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError("no CREATE TABLE found in schema.cql")
    # scan to the matching close paren (the WITH clause may contain parens)
    depth, start, end = 1, m.end(), None
    for i in range(m.end(), len(cql)):
        if cql[i] == "(":
            depth += 1
        elif cql[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end is None:
        raise ValueError("unbalanced CREATE TABLE parentheses in schema.cql")
    body = cql[start:end]
    # strip trailing table-level PRIMARY KEY (...) clause
    body = re.sub(r",?\s*PRIMARY\s+KEY\s*\([^)]*\)", "", body, flags=re.IGNORECASE)
    fields = []
    depth = 0
    current = ""
    for ch in body:
        if ch == "(" or ch == "<":
            depth += 1
        elif ch == ")" or ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append(current)
            current = ""
        else:
            current += ch
    if current.strip():
        fields.append(current)

    def cql_type_to_spark(t: str) -> str:
        t = t.strip().lower()
        t = re.sub(r"^frozen\s*<(.*)>$", r"\1", t)
        coll = re.match(r"(list|set|map)\s*<(.*)>$", t)
        if coll:
            kind, inner = coll.group(1), coll.group(2)
            if kind == "map":
                k, v = [s.strip() for s in inner.split(",", 1)]
                return f"map<{cql_type_to_spark(k)},{cql_type_to_spark(v)}>"
            return f"array<{cql_type_to_spark(inner)}>"
        return _CQL_TO_SPARK[t]

    cols = []
    for f in fields:
        f = f.strip().rstrip(",")
        if not f:
            continue
        parts = f.split(None, 1)
        if len(parts) != 2:
            continue
        name, ctype = parts
        ctype = re.sub(r"\s+(static|PRIMARY\s+KEY).*$", "", ctype, flags=re.IGNORECASE)
        clean_name = name.strip('"')
        cols.append(f"{clean_name} {cql_type_to_spark(ctype)}")
    return ", ".join(cols)


@dataclass
class _SnapshotFile(InputPartition):
    path: str


def _snapshot_dir(data_dir: str, keyspace: str, table: str, tag: str) -> str:
    return os.path.join(data_dir, keyspace, table, "snapshots", tag)


def _list_snapshot_files(snap_dir: str) -> list[str]:
    return sorted(
        os.path.join(snap_dir, f)
        for f in os.listdir(snap_dir)
        if f.endswith(".parquet")
    )


class CassandraSnapshotDataSource(DataSource):
    """``spark.read.format("cassandra_snapshot")`` with options
    ``path`` (data dir), ``keyspace``, ``table``, ``tag``.

    Adds the Cassandra metadata column ``_sstable`` (source file) so
    downstream LWW merges can audit which generation won.
    """

    @classmethod
    def name(cls) -> str:
        return "cassandra_snapshot"

    def schema(self) -> str:
        snap = _snapshot_dir(
            self.options["path"], self.options["keyspace"], self.options["table"], self.options["tag"]
        )
        with open(os.path.join(snap, "schema.cql")) as fh:
            ddl = parse_schema_cql(fh.read())
        return ddl + ", _sstable string"

    def reader(self, schema) -> DataSourceReader:
        snap = _snapshot_dir(
            self.options["path"], self.options["keyspace"], self.options["table"], self.options["tag"]
        )
        return _SnapshotReader(_list_snapshot_files(snap), schema)


class _SnapshotReader(DataSourceReader):
    def __init__(self, files: list[str], schema):
        self._files = files
        self._schema = schema

    def partitions(self) -> list[InputPartition]:
        # One partition per snapshot file = per-SSTable parallelism.
        return [_SnapshotFile(p) for p in self._files]

    def read(self, partition: _SnapshotFile):
        # Arrow-batch streaming read of one "SSTable".  A real SSTable
        # binary parser replaces pyarrow here; everything else stands.
        import pyarrow as pa
        import pyarrow.parquet as pq

        want = [f.name for f in self._schema.fields if f.name != "_sstable"]
        table = pq.read_table(partition.path, columns=want)
        # Spark's Arrow bridge rejects nanosecond timestamps (e.g. from
        # INT96 or TIMESTAMP(NANOS) files) — coerce to microseconds.
        for i, field in enumerate(table.schema):
            if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
                table = table.set_column(
                    i, field.name, table.column(i).cast(pa.timestamp("us", field.type.tz))
                )
        tag = pa.array([partition.path] * table.num_rows, type=pa.string())
        table = table.append_column("_sstable", tag)
        yield from table.to_batches(max_chunksize=8192)


def register(spark: SparkSession) -> None:
    """Idempotently register the source with a session."""
    try:
        spark.dataSource.register(CassandraSnapshotDataSource)
    except Exception:
        pass  # already registered


def snapshot_scan(
    spark: SparkSession, data_dir: str, keyspace: str, table: str, tag: str
) -> DataFrame:
    """A2 entry point: scan one snapshot tag as a DataFrame."""
    register(spark)
    return (
        spark.read.format("cassandra_snapshot")
        .option("path", data_dir)
        .option("keyspace", keyspace)
        .option("table", table)
        .option("tag", tag)
        .load()
    )


def snapshot_manifest(df: DataFrame) -> DataFrame:
    """A6: per-SSTable manifest — row counts + order-insensitive content
    checksum (sum of per-row xxhash64), the post-copy verification the
    reference performs with file listings, done on *content* instead."""
    data_cols = [c for c in df.columns if c != "_sstable"]
    # hash reduced mod 2^31 before the sum: order-insensitive and overflow-
    # safe under ANSI arithmetic at any SSTable size.
    h = F.pmod(F.xxhash64(*data_cols), F.lit(2_147_483_647))
    return df.groupBy("_sstable").agg(
        F.count("*").alias("n_rows"),
        F.sum(h).alias("content_checksum"),
    )


def incremental_new_files(
    spark: SparkSession, data_dir: str, keyspace: str, table: str, tag: str, seen_manifest: DataFrame
) -> DataFrame:
    """A5: incremental snapshot ingest — scan a new tag, keep only rows from
    SSTables not present in ``seen_manifest`` (file-level anti-join; at
    cluster scale the manifest is tiny and broadcasts)."""
    df = snapshot_scan(spark, data_dir, keyspace, table, tag)
    seen_names = seen_manifest.select(
        F.element_at(F.split(F.col("_sstable"), "/"), -1).alias("_file")
    ).distinct()
    named = df.withColumn("_file", F.element_at(F.split(F.col("_sstable"), "/"), -1))
    return named.join(F.broadcast(seen_names), "_file", "left_anti").drop("_file")
