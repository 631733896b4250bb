#!/usr/bin/env python
"""Driver-contract sweep: run EVERY ``queries()`` entry under a bare
SparkSession built the way the external driver builds one (no engine
defaults from ``session.get_spark`` — no AQE tuning, no shuffle-partition
override, no timestamp confs).  This is the harness-environment
falsification test: anything that silently depends on an engine session
conf (the round-2 NANOS regression class) fails HERE before the driver
sees it.

    python tools/plain_sweep.py [sf_dir] [name1,name2,...]

Prints one line per query (rows or the exception head) and exits nonzero
on any failure.  Wall-clock note: the full registry at sf0.01 is ~2.5 min
on this box; pass a name list for a targeted re-check.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    # The driver's session, not ours: master + nothing else.  io.load is
    # responsible for per-read confs; queries must not assume session state.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plain_sweep")
        .getOrCreate()
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if names:
        missing = [n for n in names if n not in qs]
        if missing:
            raise SystemExit(f"unknown query names: {missing}")
        qs = {n: qs[n] for n in names}

    failures: list[str] = []
    t_all = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            n_rows = fn(spark, sf_dir).count()
            print(f"[OK  ] {name}: {n_rows} rows ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report-and-continue sweep
            failures.append(name)
            head = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            print(f"[FAIL] {name}: {head}")
    print(
        f"\n{len(qs) - len(failures)}/{len(qs)} queries ran under the plain "
        f"driver session at {sf_dir} ({time.perf_counter() - t_all:.0f}s)"
    )
    if failures:
        print("failed:", ",".join(failures))
        raise SystemExit(1)


if __name__ == "__main__":
    main()
