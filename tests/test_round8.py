"""Round-8 additions: pure-Python third-implementation pins for the new
depth operators (the rounds-3..7 discipline — every SQL-certified query
also replays against an independent Python implementation so a
Spark+DuckDB twin bug cannot hide behind a matching hash).
"""

from __future__ import annotations

import pyarrow.parquet as pq

from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _orders():
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    return list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))


def test_b15_quorum_read_repair_python_replay(spark, sf_dir):
    base = {
        k: (int(round(p * 100)), k * 100) for k, p in _orders()
    }
    ra = {k: (v - 7, ts - 5) if k % 499 == 0 else (v, ts) for k, (v, ts) in base.items()}
    rb = {
        k: (v - 3, ts - 3) if k % 503 == 0 else (v, ts)
        for k, (v, ts) in base.items()
        if k % 991 != 0
    }
    rc = {k: (v, ts) for k, (v, ts) in base.items() if k % 997 != 0}
    reconciled = {}
    for rep in (ra, rb, rc):
        for k, (v, ts) in rep.items():
            if k not in reconciled or (ts, v) > reconciled[k]:
                reconciled[k] = (ts, v)
    want = {}
    for name, rep in (("A", ra), ("B", rb), ("C", rc)):
        stale = sum(1 for k, (ts, _) in reconciled.items()
                    if k in rep and rep[k][1] < ts)
        missing = sum(1 for k in reconciled if k not in rep)
        want[name] = (len([k for k in reconciled if k in rep]), stale, missing)
    out = {r.replica: r for r in
           REGISTRY["b15_quorum_read_repair"].fn(spark, sf_dir).collect()}
    assert set(out) == {"A", "B", "C"}
    total = sum(v for _, v in reconciled.values())
    for name, (present, stale, missing) in want.items():
        r = out[name]
        assert (r.n_present, r.n_stale, r.n_missing) == (present, stale, missing), name
        assert r.n_repair == stale + missing
        assert r.n_keys == len(reconciled) and r.total_value == total
    # the fixture must actually exercise every divergence class
    assert out["A"].n_stale > 0 and out["B"].n_missing > 0 and out["C"].n_missing > 0


def test_j111_t_closeness_python_fractions(spark, sf_dir):
    t = pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_mktsegment", "c_nationkey", "c_acctbal"],
    )
    rows = list(zip(*(t.column(c).to_pylist() for c in t.column_names)))

    # Spark/DuckDB `div`/`//` truncate toward zero; mirror exactly.
    def b_of(bal: float) -> int:
        cents = int(round(bal * 100))
        q, r = divmod(abs(cents), 200000)
        return (q if cents >= 0 else -q)

    sens = [((seg, nat), b_of(bal)) for seg, nat, bal in rows]
    bins = sorted({b for _, b in sens})
    n = len(sens)
    from collections import Counter

    global_c = Counter(b for _, b in sens)
    classes: dict = {}
    for key, b in sens:
        classes.setdefault(key, Counter())[b] += 1
    m = len(bins)
    want = {}
    for key, cnt in classes.items():
        ng = sum(cnt.values())
        cum_c = cum_g = 0
        s = 0
        for b in bins:
            cum_c += cnt.get(b, 0)
            cum_g += global_c[b]
            s += abs(cum_c * n - cum_g * ng)
        want[key] = (ng, (s * 1000) // (ng * n * (m - 1)))
    out = {
        (r.c_mktsegment, r.c_nationkey): (r.class_size, r.emd_milli)
        for r in REGISTRY["j111_t_closeness"].fn(spark, sf_dir).collect()
    }
    assert out == want
    # audit sanity: a perfectly representative class has EMD 0; every EMD
    # is within [0, 1000]
    assert all(0 <= e <= 1000 for _, e in out.values())


def test_j112_hits_python_power_iteration(spark, sf_dir):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    edges = sorted(
        {
            (ok % 512, pk % 512)
            for ok, pk in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
            if ok % 10 == 0
        }
    )
    h = {u: 1_000_000 for u, _ in edges}
    a = {}
    for _ in range(3):
        raw_a: dict = {}
        for u, v in edges:
            raw_a[v] = raw_a.get(v, 0) + h[u]
        ta = sum(raw_a.values())
        a = {v: r * 1_000_000 // ta for v, r in raw_a.items()}
        raw_h: dict = {}
        for u, v in edges:
            raw_h[u] = raw_h.get(u, 0) + a[v]
        th = sum(raw_h.values())
        h = {u: r * 1_000_000 // th for u, r in raw_h.items()}
    out = REGISTRY["j112_hits_scores"].fn(spark, sf_dir).collect()
    got_h = {r.node: r.score_micro for r in out if r.side == "hub"}
    got_a = {r.node: r.score_micro for r in out if r.side == "auth"}
    assert got_h == h and got_a == a
    # L1 mass conservation up to floor loss: each vector sums to <= 1e6
    # and within |nodes| of it
    assert 1_000_000 - len(h) <= sum(h.values()) <= 1_000_000
    assert 1_000_000 - len(a) <= sum(a.values()) <= 1_000_000


def test_e96_fleiss_kappa_python_replay(spark, sf_dir):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    docs = list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))
    from collections import Counter

    cells: dict = {}
    for doc_id, n_chars in docs:
        c = cells.setdefault(doc_id, Counter())
        c[n_chars % 3] += 1
        c[(n_chars // 7) % 3] += 1
        c[(doc_id * 31) % 3] += 1
    n_items = len(cells)
    m = 3
    sa = sum(sum(v * v for v in c.values()) - m for c in cells.values())
    cj = Counter()
    for c in cells.values():
        cj.update(c)
    p_bar_micro = sa * 1_000_000 // (n_items * m * (m - 1))
    p_e_micro = sum(v * v for v in cj.values()) * 1_000_000 // (n_items * m) ** 2
    kappa_milli = (p_bar_micro - p_e_micro) * 1000 // (1_000_000 - p_e_micro)
    # negative // floors in python but the engines truncate; the operands
    # here keep kappa's sign stable: assert trunc semantics explicitly
    num = (p_bar_micro - p_e_micro) * 1000
    den = 1_000_000 - p_e_micro
    kappa_trunc = abs(num) // den * (1 if num >= 0 else -1)
    r = REGISTRY["e96_fleiss_kappa"].fn(spark, sf_dir).collect()[0]
    assert r.n_items == n_items
    assert (r.c0, r.c1, r.c2) == (cj.get(0, 0), cj.get(1, 0), cj.get(2, 0))
    assert (r.p_bar_micro, r.p_e_micro) == (p_bar_micro, p_e_micro)
    assert r.kappa_milli == kappa_trunc
    # the quantized kappa must agree with the unquantized float kappa
    p_bar = sa / (n_items * m * (m - 1))
    p_e = sum(v * v for v in cj.values()) / (n_items * m) ** 2
    assert abs(r.kappa_milli / 1000 - (p_bar - p_e) / (1 - p_e)) < 2e-3
