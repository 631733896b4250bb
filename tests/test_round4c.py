"""Round-4 second continuation batch: md5-certified MinHash-LSH twin,
recursive-CTE Holt fold, Savitzky-Golay convolution — each pinned to an
independent pure-Python third implementation (hashlib md5, sign-split
toward-zero integer folds), plus plan-shape assertions for the
no-window-convolution claim."""

from __future__ import annotations

import hashlib
import re

import duckdb

from cassandra_snap_to_hadoop_spark.plans.explain import plan_string
from cassandra_snap_to_hadoop_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("orders", "events", "documents", "lineitem", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def _tzdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — Spark DIV / DuckDB //
    semantics.  Python's // FLOORS, which differs on negative operands."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ---------------------------------------------------------------- MinHash md5


def _py_shingles(text: str) -> set[str]:
    words = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    if len(words) < 3:
        return set()
    return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}


def _py_mh(sh: set[str], i: int) -> int:
    return min(int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16) for s in sh)


def test_minhash_md5_equals_python_pipeline(spark):
    """End-to-end third implementation: the WHOLE banded pipeline
    (shingle -> 16 hashlib-md5 signature mins -> 4 band keys -> bucket
    pairs -> exact jaccard) recomputed in pure Python must produce the
    identical pair set and jaccard values."""
    docs = _duck("SELECT doc_id, text FROM documents")
    sh = {d: _py_shingles(t) for d, t in docs}
    sigs = {d: [_py_mh(s, i) for i in range(16)] for d, s in sh.items() if s}
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, sig in sigs.items():
        for b in range(4):
            key = "|".join(str(v) for v in sig[b * 4 : b * 4 + 4])
            buckets.setdefault((b, key), []).append(d)
    expect: dict[tuple[int, int], float] = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                inter = len(sh[a] & sh[b])
                expect[(a, b)] = inter / (len(sh[a]) + len(sh[b]) - inter)

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in REGISTRY["j2_minhash_lsh_md5"].fn(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for pair, j in expect.items():
        assert abs(got[pair] - j) <= 5e-5, pair


def test_minhash_md5_candidates_are_banded_not_allpairs(spark):
    """Candidate generation is per band bucket — the pair count must be
    far below the all-pairs count of documents with shingles."""
    n_docs = _duck("SELECT COUNT(*) FROM documents")[0][0]
    n_pairs = REGISTRY["j2_minhash_lsh_md5"].fn(spark, SF).count()
    assert n_pairs < n_docs * (n_docs - 1) // 20


# ---------------------------------------------------------------- Holt twin


def test_holt_recursive_matches_python_fold(spark):
    """The UnionLoop Holt recursion must equal a plain Python fold of the
    same per-type daily series (sign-split toward-zero division — the
    Python-//-floors trap documented in NEXT.md)."""
    rows = _duck(
        """
        SELECT event_type, epoch_us(ts) // 86400000000 AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    series: dict[str, list[int]] = {}
    for et, _, x in rows:
        series.setdefault(et, []).append(x)
    expect = {}
    for et, xs in series.items():
        lvl, trend = xs[0], 0
        for x in xs[1:]:
            new_lvl = _tzdiv(x + 4 * (lvl + trend), 5)
            trend = _tzdiv((new_lvl - lvl) + 9 * trend, 10)
            lvl = new_lvl
        expect[et] = (len(xs), lvl, trend, lvl + 3 * trend)

    got = {
        r["event_type"]: (
            r["n_days"],
            r["level_cents"],
            r["trend_cents"],
            r["forecast3_cents"],
        )
        for r in REGISTRY["f31_holt_recursive"].fn(spark, SF).collect()
    }
    assert got == expect


# ------------------------------------------------------------ Savitzky-Golay


def test_savgol_matches_python_convolution(spark):
    """Integer SG convolution recomputed in pure Python over the
    zero-filled daily series."""
    rows = dict(
        _duck(
            """
            SELECT epoch_us(o_orderdate) // 86400000000 AS d,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM orders GROUP BY 1
            """
        )
    )
    lo, hi = min(rows), max(rows)
    y = {d: rows.get(d, 0) for d in range(lo, hi + 1)}
    coefs = {-2: -3, -1: 12, 0: 17, 1: 12, 2: -3}
    expect = {}
    for d in range(lo + 2, hi - 1):
        num = sum(y[d + o] * c for o, c in coefs.items())
        expect[d] = (y[d], num, _tzdiv(num, 35))

    got = {
        r["day_idx"]: (r["y_cents"], r["sg_num_cents"], r["sg_cents"])
        for r in REGISTRY["f30_savgol_smooth"].fn(spark, SF).collect()
    }
    assert got == expect


def test_savgol_plan_has_no_window(spark):
    """The convolution is a group-by over exploded (target, term)
    contributions — the plan must contain NO window operator (the
    ordered-frame formulation would single-thread the series)."""
    plan = plan_string(REGISTRY["f30_savgol_smooth"].fn(spark, SF))
    assert "Window" not in plan


def test_savgol_peak_preservation():
    """The documented SG property that motivates it over a moving average:
    a quadratic peak's height is preserved exactly (degree-2 filter), while
    the 5-point moving average flattens it."""
    y = {o: 300 - 25 * o * o for o in range(-2, 3)}  # quadratic peak, apex 300
    coefs = [(-2, -3), (-1, 12), (0, 17), (1, 12), (2, -3)]
    sg = sum(y[o] * c for o, c in coefs) / 35
    ma = sum(y[o] for o in range(-2, 3)) / 5
    assert sg == 300.0
    assert ma == 250.0


# ------------------------------------------------------------ Fellegi-Sunter


def test_fellegi_sunter_matches_python_reference(spark):
    """Third implementation: u-probabilities, log-weights, and per-pattern
    scores recomputed in pure Python (math.log, identical op order)."""
    import math

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    recs = con.execute(
        """
        SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment,
               CAST(ROUND(c.c_acctbal * 100) AS BIGINT) // 25000,
               COALESCE(a.act, 0)
        FROM customer c LEFT JOIN (
            SELECT o_custkey, CAST(COUNT(*) AS BIGINT) // 2 AS act
            FROM orders GROUP BY 1) a ON a.o_custkey = c.c_custkey
        """
    ).fetchall()
    n = len(recs)

    def u_num(idx: int) -> int:
        counts: dict = {}
        for r in recs:
            counts[r[idx]] = counts.get(r[idx], 0) + 1
        return sum(c * (c - 1) for c in counts.values())

    m = {"nation": 0.95, "seg": 0.9, "act": 0.8}
    nums = {"nation": u_num(1), "seg": u_num(2), "act": u_num(4)}

    def w(field: str, agree: int) -> int:
        u = nums[field] / (n * (n - 1.0))
        if agree:
            return round(math.log(m[field] / u) * 1000000)
        return round(math.log((1 - m[field]) / (1.0 - u)) * 1000000)

    by_block: dict = {}
    for r in recs:
        by_block.setdefault(r[3], []).append(r)
    expect: dict = {}
    for block in by_block.values():
        block.sort()
        for i in range(len(block)):
            for j in range(i + 1, len(block)):
                a, b = block[i], block[j]
                pat = (int(a[1] == b[1]), int(a[2] == b[2]), int(a[4] == b[4]))
                expect[pat] = expect.get(pat, 0) + 1

    got = {
        (r["agree_nation"], r["agree_seg"], r["agree_act"]): (
            r["n_pairs"],
            r["score_micronat"],
        )
        for r in REGISTRY["j85_fellegi_sunter"].fn(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for pat, n_pairs in expect.items():
        score = w("nation", pat[0]) + w("seg", pat[1]) + w("act", pat[2])
        assert got[pat] == (n_pairs, score), pat


def test_fellegi_sunter_score_monotone_in_agreements(spark):
    """More field agreements must never lower the score (each agreement
    weight exceeds its disagreement weight by construction m > u)."""
    rows = {
        (r["agree_nation"], r["agree_seg"], r["agree_act"]): r["score_micronat"]
        for r in REGISTRY["j85_fellegi_sunter"].fn(spark, SF).collect()
    }
    for (pn, ps, pa), s in rows.items():
        for flip in range(3):
            pat = list((pn, ps, pa))
            if pat[flip] == 0:
                pat[flip] = 1
                if tuple(pat) in rows:
                    assert rows[tuple(pat)] > s


# ----------------------------------------------------------------- KMeans


def test_kmeans_lloyd_matches_python_reference(spark):
    """Third implementation: the full Lloyd trajectory (seed, assign,
    truncating-mean update x2, final assign) in pure Python ints."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    from decimal import ROUND_HALF_UP, Decimal

    pts = {
        vid: [int(Decimal(float(v) * 1000000.0).quantize(0, ROUND_HALF_UP)) for v in emb]
        for vid, emb in rows
    }
    seeds = sorted(pts)[:4]
    cent = {cid: list(pts[cid]) for cid in seeds}

    def assign(cent):
        out = {}
        for vid, p in pts.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(p, cv)), cid)
                for cid, cv in cent.items()
            )
            out[vid] = best  # (dist, cid)
        return out

    for _ in range(2):
        a = assign(cent)
        new_cent = {}
        for cid in {c for _, c in a.values()}:
            members = [pts[v] for v, (_, c) in a.items() if c == cid]
            new_cent[cid] = [
                _tzdiv(sum(col), len(members)) for col in zip(*members)
            ]
        cent = new_cent
    final = assign(cent)
    expect = {}
    for _, (d, cid) in final.items():
        n, tot = expect.get(cid, (0, 0))
        expect[cid] = (n + 1, tot + d)

    got = {
        r["cluster"]: (r["n_points"], r["inertia"])
        for r in REGISTRY["j86_kmeans_lloyd"].fn(spark, SF).collect()
    }
    assert got == expect


def test_kmeans_lloyd_partitions_all_points(spark):
    df = REGISTRY["j86_kmeans_lloyd"].fn(spark, SF)
    total = df.agg({"n_points": "sum"}).collect()[0][0]
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    assert total == n


def test_kmeans_assignment_never_joins_or_shuffles_points(spark):
    """r11 shape: the Lloyd assignment is an Arrow-batched kernel over the
    checkpointed point relation with centroid literals — the final plan
    must carry NO join of the point relation at all (the K×dims centroids
    ride inside the kernel closure) and only the K-row partials may cross
    the one aggregation exchange."""
    plan = plan_string(REGISTRY["j86_kmeans_lloyd"].fn(spark, SF))
    assert "Join" not in plan, plan
    assert "MapInArrow" in plan, plan
    assert plan.count("+- Exchange") <= 1, plan


# ----------------------------------------------------------------- DBSCAN


def _dbscan_py(sf_dir: str = SF):
    """Naive-quadratic DBSCAN reference in pure Python (the textbook
    definition, no grid)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    pts = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) // 1000000
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-02-01'
            """
        ).fetchall()
    }
    nbrs = {
        i: [
            j
            for j, q in pts.items()
            if (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 <= 9
        ]
        for i, p in pts.items()
    }
    core = {i for i, ns in nbrs.items() if len(ns) >= 5}
    out = {}
    for i, ns in nbrs.items():
        if i in core:
            role = "core"
        elif any(j in core for j in ns if j != i):
            role = "border"
        else:
            role = "noise"
        out[i] = (len(ns), role)
    return out


def test_dbscan_matches_python_reference(spark):
    expect = _dbscan_py()
    got = {
        r["order_id"]: (r["n_neighbors"], r["role"])
        for r in REGISTRY["j87_dbscan_core"].fn(spark, SF).collect()
    }
    assert got == expect


def test_dbscan_all_three_roles_reachable():
    """The parameterization is only a meaningful test if the reference
    classification exercises core/border/noise at some scale; at sf0.001
    at least two roles must appear and every count be >= minPts-consistent."""
    roles = {role for _, role in _dbscan_py("/root/testdata/sf0.01").values()}
    assert roles == {"core", "border", "noise"}


# ------------------------------------------------------------------- RAKE


def test_rake_matches_python_reference(spark):
    """Full RAKE reference: stopword segmentation, degree/frequency word
    scores (truncating micro division), phrase score sums, global top-20."""
    stops = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"}
    docs = _duck("SELECT doc_id, text FROM documents")
    phrases = []  # (doc, grp, tuple(words))
    for doc_id, text in docs:
        words = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        run: list[str] = []
        for w in words:
            if w in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run:
            phrases.append(tuple(run))
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    wscore = {w: deg[w] * 1000000 // freq[w] for w in freq}
    agg: dict[tuple[str, int], list[int]] = {}
    for ph in phrases:
        key = (" ".join(ph), len(ph))
        agg.setdefault(key, []).append(sum(wscore[w] for w in ph))
    rows = [
        (phrase, n_words, len(scores), min(scores))
        for (phrase, n_words), scores in agg.items()
    ]
    rows.sort(key=lambda r: (-r[3], r[0]))
    expect = rows[:20]

    got = [
        (r["phrase"], r["n_words"], r["n_occ"], r["score_micro"])
        for r in REGISTRY["j88_rake_keywords"].fn(spark, SF).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_rake_identical_phrases_score_identically(spark):
    """score is a function of the phrase TEXT (via corpus word stats) —
    MIN over occurrences must equal MAX (the aggregate in the query uses
    MIN; this pins that the choice is vacuous)."""
    stops = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"}
    docs = _duck("SELECT doc_id, text FROM documents")
    seen: dict[str, set[int]] = {}
    phrases = []
    for _, text in docs:
        words = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        run: list[str] = []
        for w in words:
            if w in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run:
            phrases.append(tuple(run))
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    wscore = {w: deg[w] * 1000000 // freq[w] for w in freq}
    for ph in phrases:
        seen.setdefault(" ".join(ph), set()).add(sum(wscore[w] for w in ph))
    assert all(len(v) == 1 for v in seen.values())


# --------------------------------------------------------------- Zone maps


def test_zonemap_skipped_zones_have_no_matches(spark):
    rows = REGISTRY["a28_zonemap_skipping"].fn(spark, SF).collect()
    for r in rows:
        if r["kept"] == 0:
            assert r["n_matching"] == 0 and r["match_revenue_cents"] == 0
    # pruning must actually prune: the range covers ~3 of ~80 zones
    n_kept = sum(r["kept"] for r in rows)
    assert n_kept <= len(rows) // 4


def test_zonemap_kept_matches_equal_direct_filter(spark):
    rows = REGISTRY["a28_zonemap_skipping"].fn(spark, SF).collect()
    total = sum(r["n_matching"] for r in rows)
    direct = _duck(
        """
        SELECT COUNT(*) FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-03-15'
          AND l_shipdate < TIMESTAMP '1996-06-15'
        """
    )[0][0]
    assert total == direct


def test_zonemap_boundary_zones_partially_match(spark):
    """The interesting pruning case: at least one kept zone matches only
    PARTIALLY (bucket-equality pruning would mishandle it)."""
    rows = REGISTRY["a28_zonemap_skipping"].fn(spark, SF).collect()
    assert any(0 < r["n_matching"] < r["n_rows"] for r in rows if r["kept"])


# ---------------------------------------------------------------- Soundex


def _py_soundex(w: str) -> str:
    """Independent pure-Python American Soundex with the h/w-transparent
    rule (third implementation beside Spark's native and the DuckDB
    list-op restatement)."""
    table = {}
    for letters, d in (
        ("bfpv", "1"),
        ("cgjkqsxz", "2"),
        ("dt", "3"),
        ("l", "4"),
        ("mn", "5"),
        ("r", "6"),
    ):
        for ch in letters:
            table[ch] = d
    out = []
    last = table.get(w[0], "0") if w[0] not in "hw" else "0"
    for ch in w[1:]:
        if ch in "hw":
            continue  # transparent: does not reset `last`
        code = table.get(ch, "0")
        if code == "0":
            last = "0"  # vowel resets the run
            continue
        if code != last:
            out.append(code)
        last = code
    return w[0].upper() + "".join(out[:3]).ljust(3, "0")


def test_soundex_spark_matches_python_on_corpus(spark):
    got = {
        r["word"]: r["sx"]
        for r in REGISTRY["i22_soundex_phonetic"].fn(spark, SF).collect()
    }
    assert got
    for w, sx in got.items():
        assert sx == _py_soundex(w), w


def test_soundex_hw_transparency_edge_cases(spark):
    """The corpus vocabulary has no h/w-run-collapse case, so pin the
    tricky edges (census examples) directly against Spark's native fn AND
    the Python reference: 'ashcraft' MUST be A261 (h-transparent), not
    A226."""
    words = [
        "ashcraft",
        "tymczak",
        "pfister",
        "honeyman",
        "wow",
        "hash",
        "robert",
        "rupert",
        "ashcroft",
        "qq",
    ]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    from pyspark.sql import functions as F

    got = {r["w"]: r["sx"] for r in df.select("w", F.soundex("w").alias("sx")).collect()}
    assert got["ashcraft"] == "A261"
    assert got["tymczak"] == "T522"
    assert got["pfister"] == "P236"
    for w in words:
        assert got[w] == _py_soundex(w), w


# ----------------------------------------------------------------- Kalman


def _kalman_py():
    rows = _duck(
        """
        SELECT event_type, epoch_us(ts) // 86400000000 AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS z
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    series: dict[str, list[int]] = {}
    for et, _, z in rows:
        series.setdefault(et, []).append(z)
    out = {}
    for et, zs in series.items():
        x, p = zs[0], 10000
        for z in zs[1:]:
            pp = p + 100
            x = x + _tzdiv(pp * (z - x), pp + 2500)
            p = pp - _tzdiv(pp * pp, pp + 2500)
        out[et] = (len(zs), x, p)
    return out


def test_kalman_recursive_matches_python_fold(spark):
    expect = _kalman_py()
    got = {
        r["event_type"]: (r["n_days"], r["state_cents"], r["var_final"])
        for r in REGISTRY["f32_kalman_recursive"].fn(spark, SF).collect()
    }
    assert got == expect


def test_kalman_variance_reaches_riccati_fixpoint(spark):
    """The variance recursion p' = (p+q) - (p+q)^2/(p+q+r) converges to
    the steady-state Riccati fixpoint independent of p0 — after ~30 days
    every series must sit AT the integer fixpoint."""
    p = 10000
    for _ in range(200):
        pp = p + 100
        p = pp - _tzdiv(pp * pp, pp + 2500)
    fix = p
    for r in REGISTRY["f32_kalman_recursive"].fn(spark, SF).collect():
        if r["n_days"] >= 20:
            assert abs(r["var_final"] - fix) <= 1


# ------------------------------------------------------- Label propagation


def test_label_propagation_matches_python_reference(spark):
    """Third implementation: sign-pattern bands, bucket edges, 2 frozen
    rounds of majority votes in pure Python."""
    from decimal import ROUND_HALF_UP, Decimal

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    rows = con.execute("SELECT vec_id, label, embedding FROM embeddings").fetchall()
    cells: dict[tuple[int, int], list[int]] = {}
    labels = {}
    for vid, lab, emb in rows:
        labels[vid] = lab
        pv = [
            int(Decimal(float(v) * 1000000.0).quantize(0, ROUND_HALF_UP))
            for v in emb[:16]
        ]
        for band in (0, 1):
            cell = sum(
                (1 << d) for d in range(8) if pv[band * 8 + d] >= 0
            )
            cells.setdefault((band, cell), []).append(vid)
    edges: dict[int, set[int]] = {v: set() for v in labels}
    for members in cells.values():
        for x in members:
            for y in members:
                if x != y:
                    edges[x].add(y)
    assigned = {v: (0, labels[v]) for v in labels if v % 5 == 0}
    for rnd in (1, 2):
        new = {}
        for v in labels:
            if v in assigned:
                continue
            votes: dict[int, int] = {}
            for nb in edges[v]:
                if nb in assigned:
                    votes[assigned[nb][1]] = votes.get(assigned[nb][1], 0) + 1
            if votes:
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                new[v] = (rnd, best)
        assigned.update(new)
    expect: dict[tuple[int, int], int] = {}
    for v in labels:
        rnd, lab = assigned.get(v, (-1, -1))
        expect[(rnd, lab)] = expect.get((rnd, lab), 0) + 1

    got = {
        (r["round_assigned"], r["label"]): r["n_nodes"]
        for r in REGISTRY["j89_label_propagation"].fn(spark, SF).collect()
    }
    assert got == expect


def test_label_propagation_census_is_complete(spark):
    df = REGISTRY["j89_label_propagation"].fn(spark, SF)
    total = df.agg({"n_nodes": "sum"}).collect()[0][0]
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    assert total == n
    rows = df.collect()
    # seeds exist and rounds actually propagate at this SF
    assert any(r["round_assigned"] == 0 for r in rows)
    assert any(r["round_assigned"] == 1 for r in rows)
