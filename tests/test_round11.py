"""Round-11 pins: the j72 bit-parallel-LCS conversion (VERDICT r10
item 3).  The oa/BTI codec pins live in tests/test_sstable_oa.py; the
query-level certification is the oracle mirror + driver window."""

from __future__ import annotations

import random

from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()


def _lcs_dp(x: list, y: list) -> int:
    """Textbook rolling-row DP — the independent reference."""
    prev = [0] * (len(y) + 1)
    for xi in x:
        cur = [0]
        for j, yj in enumerate(y, 1):
            cur.append(prev[j - 1] + 1 if xi == yj else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def _lcs_bitparallel(x: list, y: list) -> int:
    """The Allison-Dix/Hyyrö word fold exactly as both engines run it:
    V' = ((V + (V & M)) | (V − (V & M))) masked to |y| bits,
    LCS = |y| − popcount(V)."""
    n = len(y)
    if n == 0 or len(x) == 0:
        return 0
    mask = (1 << n) - 1
    v = mask
    for xe in x:
        m = 0
        for j, yj in enumerate(y):
            if yj == xe:
                m |= 1 << j
        u = v & m
        v = ((v + u) | (v - u)) & mask
    return n - bin(v).count("1")


def test_bitparallel_lcs_equals_dp_random_sweep():
    """5000 random token-sequence pairs (alphabet 6, lengths 0..30 — the
    exact domain j72 runs on): the bit-parallel recurrence must equal
    the full DP everywhere.  This is the pin the j72 docstring cites."""
    rng = random.Random(11)
    alpha = ["a", "b", "c", "d", "e", "f"]
    for _ in range(5000):
        x = [rng.choice(alpha) for _ in range(rng.randint(0, 30))]
        y = [rng.choice(alpha) for _ in range(rng.randint(0, 30))]
        assert _lcs_bitparallel(x, y) == _lcs_dp(x, y), (x, y)


def test_bitparallel_lcs_known_values():
    assert _lcs_bitparallel(list("abcbdab"), list("bdcaba")) == 4
    assert _lcs_bitparallel(["tok"] * 30, ["tok"] * 30) == 30
    assert _lcs_bitparallel([""], [""]) == 1  # empty-text token parity
    assert _lcs_bitparallel(list("abc"), list("xyz")) == 0


def test_j72_is_sql_oracled_now():
    """The round-11 conversion contract: j72 carries a DuckDB oracle and
    the engine path is registered (hash certification happens in the
    driver window / oracle mirror, not here)."""
    q = REGISTRY["j72_rouge_l"]
    assert q.oracle is not None and "list_reduce" in q.oracle
