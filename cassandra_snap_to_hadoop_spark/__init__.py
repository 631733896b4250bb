"""cassandra_snap_to_hadoop_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL tool ``deimosfr/cassandra_snap_to_hadoop``
(Cassandra snapshot -> Hadoop export), widened to the full relational /
dataflow / LLM-data-pipeline surface documented in SURVEY.md §2.

Design posture (SURVEY.md §4):
- DataFrame/SQL only — declare logical plans, let Catalyst + Tungsten pick
  physical strategy.  No RDD code, no custom Catalyst rules (pure Python).
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only
  where semantics genuinely require Python (vector math scale paths,
  multimodal decode stubs).
- Every operator is shuffle-aware and spill-safe: no ``collect()`` in a
  transform, no per-group in-memory assumption, blocking before any
  pairwise (O(n^2)) generation.

NOTE ON CITATIONS: the reference checkout at /root/reference is empty
(verified in SURVEY.md §0), so docstrings cite SURVEY.md sections instead of
reference file:line — each SURVEY §2 row records which mandate (reference
surface [R], harness [H], north-star addition [N]) the operator derives from.
"""

from cassandra_snap_to_hadoop_spark.registry import REGISTRY, register
from cassandra_snap_to_hadoop_spark.session import get_spark

__all__ = ["REGISTRY", "register", "get_spark"]
__version__ = "0.1.0"
