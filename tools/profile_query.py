#!/usr/bin/env python
"""Profile one registered query: wall-clock (median of N), shuffle count,
broadcast-join count, and the formatted physical plan.

    python tools/profile_query.py <query_name> [sf_dir] [n_runs]

Evidence/debug tool: the fast loop for "is this the plan I'd ship at
100 TB" — run after touching any query, read the Exchange lines first.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from cassandra_snap_to_hadoop_spark.plans.explain import (
        broadcast_join_count,
        count_shuffles,
        uses_cartesian_product,
        uses_rowwise_python,
    )
    from cassandra_snap_to_hadoop_spark.registry import load_all
    from cassandra_snap_to_hadoop_spark.session import get_spark

    spark = get_spark("profile")
    q = load_all()[name]
    df = q.fn(spark, sf_dir)

    print(f"# {name} @ {sf_dir}")
    print(f"shuffles={count_shuffles(df)} broadcasts={broadcast_join_count(df)}", end=" ")
    print(f"cartesian={uses_cartesian_product(df)} rowwise_python={uses_rowwise_python(df)}")

    df.count()  # warm
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"runs={runs} median={sorted(runs)[len(runs) // 2]}")
    print()
    q.fn(spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
