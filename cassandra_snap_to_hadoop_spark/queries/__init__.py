"""Query modules — importing this package populates the registry.

Each module covers a SURVEY.md §2 section; every registered query carries a
matching DuckDB oracle unless genuinely non-SQL-expressible (then the driver
records a rows-only check).
"""

from cassandra_snap_to_hadoop_spark.queries import (  # noqa: F401
    cassandra_sem,
    flagship,
    funcs,
    joins,
    llm,
    relational,
    sources_io,
    sql_api,
    streaming_sem,
    tpch,
    udf,
    windows,
)
