"""SQL-API surface (SURVEY §3.3): the engine's queries are equally
expressible through ``spark.sql`` over registered views — Catalyst produces
the same plan either way.  One representative query runs the *entire*
pipeline as SQL text (views + query), value-checked like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_snap_to_hadoop_spark.io import TABLES, load
from cassandra_snap_to_hadoop_spark.registry import register


@register(
    "sql_api_revenue_by_nation",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS order_year,
           SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
    """,
    survey="A1,D1,D2,E2",
)
def sql_api_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through the SQL front door: temp views + one SQL
    statement (note the identical text shape to the DuckDB oracle — the
    engine's SQL dialect is ANSI-compatible for this whole surface)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(f"cs2h_{t}")
    return spark.sql(
        """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS order_year,
               -- CAST the divisor: a bare 10000.0 literal is DECIMAL in
               -- Spark SQL (unlike the DataFrame API's double lit), and
               -- decimal division would change the output type
               SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / CAST(10000 AS DOUBLE) AS revenue,
               COUNT(DISTINCT o_orderkey) AS n_orders
        FROM cs2h_lineitem
        JOIN cs2h_orders   ON l_orderkey = o_orderkey
        JOIN cs2h_customer ON o_custkey = c_custkey
        JOIN cs2h_nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
        """
    )
