"""Semantic invariants for the wave-216 (round 11) operators.

Oracle parity proves Spark == DuckDB; these tests prove both match
the MATH, via genuine third implementations in plain Python over
DuckDB extracts of the same fixtures: per-row residual sums for
Durbin-Watson (the engine uses the cleared-fraction aggregate
algebra), a numpy hat-matrix for leverage, modular Gaussian
elimination for Shamir reconstruction, explicit event-loop replays
for AIMD / Lindley / IRV / Banker's (with a 5!-permutation
exhaustiveness check for unsafe Banker states), textbook
Floyd-Warshall for Schulze, float-arithmetic MM for Bradley-Terry
rank agreement, and an iterative Tarjan SCC.
"""

from __future__ import annotations

import hashlib
from itertools import permutations

import duckdb

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY

from aws_healthcare_etl_pipeline_spark.plans.analytics200 import _BRANDS


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "supplier",
              "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _hex4(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


# --------------------------------------------------- Durbin-Watson


def test_durbin_watson_per_row_residual_replay(spark, sf_dir):
    """Direct per-row residual computation (e_d = n*y_d - S summed
    explicitly) must reproduce the engine's cleared-fraction
    aggregate algebra exactly; DW always lands in [0, 4]."""
    rows = _rows(spark, sf_dir, "stat_durbin_watson_autocorr")
    assert rows
    con = _duck(sf_dir)
    daily = con.execute(
        """
        SELECT n.n_name, o.o_orderdate,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100)
                    AS BIGINT)
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for nm, _, y in daily:
        series.setdefault(nm, []).append(y)
    got = {r.n_name: r for r in rows}
    for nm, ys in series.items():
        n, s = len(ys), sum(ys)
        e = [n * y - s for y in ys]
        den = sum(v * v for v in e)  # == n^2*Sxx; engine denom * n
        num = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
        if den == 0:
            assert nm not in got
            continue
        dw_micro = (1_000_000 * num) // den
        r = got[nm]
        assert r.n_days == n
        assert r.dw_micro == dw_micro
        assert 0 <= r.dw_micro <= 4_000_000
        assert r.positive_autocorr == (dw_micro < 2_000_000)


# ------------------------------------------------ leverage / hat


def test_leverage_numpy_hat_matrix(spark, sf_dir):
    """The exact integer leverage numerators must agree with the
    float hat-matrix diagonal of the [1, x] design to 1e-9, the
    flag cutoff with the float 4/n rule, and trace(H) == 2."""
    import numpy as np

    rows = _rows(spark, sf_dir, "regr_leverage_hat_audit")
    assert rows
    con = _duck(sf_dir)
    pts = con.execute(
        """
        SELECT n.n_name,
               datediff('day', DATE '1970-01-01', o.o_orderdate)
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        """
    ).fetchall()
    xs: dict[str, list[int]] = {}
    for nm, x in pts:
        xs.setdefault(nm, []).append(x)
    got = {r.n_name: r for r in rows}
    for nm, x in xs.items():
        arr = np.array(x, dtype=float)
        n = len(x)
        X = np.column_stack([np.ones(n), arr])
        H = X @ np.linalg.inv(X.T @ X) @ X.T
        h = np.diag(H)
        assert abs(h.sum() - 2.0) < 1e-6
        r = got[nm]
        assert r.n_orders == n
        assert r.hat_trace_is_two
        assert r.high_leverage_count == int((h > 4.0 / n).sum())
        # exact integer max-h vs float max-h
        assert abs(r.max_h_micro / 1e6 - h.max()) < 2e-6


# ---------------------------------------------------------- Shamir


def test_shamir_gaussian_elimination_reconstruction(spark, sf_dir):
    """Reconstruct secrets by solving the 3x3 Vandermonde system mod
    257 with Gaussian elimination (NOT Lagrange), for subset
    {2, 3, 5}; bucket counts replayed from raw customer data."""
    p = 257
    rows = _rows(spark, sf_dir, "privacy_shamir_secret_sharing")
    assert rows
    con = _duck(sf_dir)
    custs = con.execute(
        "SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(15,2)) * 100"
        " AS BIGINT) FROM customer"
    ).fetchall()

    def solve_mod(xs, ys):
        # rows: [1, x, x^2 | y] over GF(p)
        m = [[1, x % p, (x * x) % p, y % p] for x, y in zip(xs, ys)]
        for col in range(3):
            piv = next(r for r in range(col, 3) if m[r][col] % p != 0)
            m[col], m[piv] = m[piv], m[col]
            inv = pow(m[col][col], p - 2, p)
            m[col] = [(v * inv) % p for v in m[col]]
            for r in range(3):
                if r != col and m[r][col]:
                    f = m[r][col]
                    m[r] = [(a - f * b) % p for a, b in zip(m[r], m[col])]
        return m[0][3]  # constant term == secret

    buckets: dict[int, list[int]] = {}
    for ck, cents in custs:
        s = cents % p
        a1 = _hex4(f"sh1:{ck}") % p
        a2 = _hex4(f"sh2:{ck}") % p
        share = {x: (s + a1 * x + a2 * x * x) % p for x in (1, 2, 3, 4, 5)}
        recon = solve_mod([2, 3, 5], [share[2], share[3], share[5]])
        assert recon == s
        buckets.setdefault(share[1] // 26, []).append(1)
    got = {r.share1_bucket: r for r in rows}
    assert set(got) == set(buckets)
    for b, lst in buckets.items():
        assert got[b].n_customers == len(lst)
        assert got[b].n_reconstruct_ok == len(lst)  # completeness


# ------------------------------------------------------------- AIMD


def test_aimd_python_replay(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ops_aimd_cwnd_replay")
    assert rows
    con = _duck(sf_dir)
    ship = con.execute(
        """
        SELECT n.n_name, l.l_suppkey, l.l_shipdate, l.l_orderkey,
               l.l_linenumber
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        ORDER BY l.l_suppkey, l.l_shipdate, l.l_orderkey, l.l_linenumber
        """
    ).fetchall()
    per_supp: dict[int, list[int]] = {}
    nation_of: dict[int, str] = {}
    for nm, sk, _, ok, ln in ship:
        nation_of[sk] = nm
        loss = 1 if _hex4(f"ld:{ok}:{ln}") % 20 == 0 else 0
        per_supp.setdefault(sk, []).append(loss)
    agg: dict[str, list[int]] = {}
    for sk, losses in per_supp.items():
        cwnd, sent, nl = 1, 0, 0
        for x in losses:
            cwnd = max(1, cwnd // 2) if x else min(64, cwnd + 1)
            sent += cwnd
            nl += x
        a = agg.setdefault(nation_of[sk], [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(losses)
        a[2] += sent
        a[3] += nl
        a[4] = max(a[4], cwnd)
        a[5] += cwnd
    got = {r.n_name: r for r in rows}
    assert set(got) == set(agg)
    for nm, a in agg.items():
        r = got[nm]
        assert (r.n_suppliers, r.total_slots, r.total_sent,
                r.total_losses, r.max_final_cwnd, r.sum_final_cwnd) == tuple(a)


# ---------------------------------------------------------- Lindley


def test_lindley_python_replay(spark, sf_dir):
    rows = _rows(spark, sf_dir, "queue_lindley_waiting_replay")
    assert rows
    con = _duck(sf_dir)
    arr = con.execute(
        """
        SELECT n.n_name,
               datediff('day', DATE '1970-01-01', o.o_orderdate),
               CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE EXTRACT(year FROM o.o_orderdate) = 1995
        ORDER BY n.n_name, 2, o.o_orderkey
        """
    ).fetchall()
    per: dict[str, list[tuple[int, int]]] = {}
    for nm, day, cents in arr:
        per.setdefault(nm, []).append((day, 1 + (cents // 100) % 13))
    got = {r.n_name: r for r in rows}
    for nm, seq in per.items():
        w = sumw = maxw = 0
        for i, (day, svc) in enumerate(seq):
            if i == 0:
                w = 0
            else:
                pd, ps = seq[i - 1]
                w = max(0, w + ps - 10 * (day - pd))
            sumw += w
            maxw = max(maxw, w)
        r = got[nm]
        assert r.n_orders == len(seq)
        assert r.max_wait_deci == maxw
        assert r.mean_wait_micro == (1_000_000 * sumw) // len(seq)
        assert r.final_wait_deci == w


# ---------------------------------------------------- ballots base


def _ballots_py(con):
    spend = con.execute(
        f"""
        SELECT o.o_custkey, p.p_brand,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                    AS BIGINT)
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN {_BRANDS}
        GROUP BY 1, 2
        """
    ).fetchall()
    per: dict[int, dict[str, int]] = {}
    for v, b, c in spend:
        per.setdefault(v, {})[b] = c
    ballots = {}
    for v, d in per.items():
        order = sorted(_BRANDS, key=lambda b: (-d.get(b, 0), b))
        ballots[v] = {b: i + 1 for i, b in enumerate(order)}
    return ballots


# ---------------------------------------------------------- Schulze


def test_schulze_textbook_floyd_warshall(spark, sf_dir):
    rows = _rows(spark, sf_dir, "election_schulze_widest_path")
    assert len(rows) == 20
    con = _duck(sf_dir)
    ballots = _ballots_py(con)
    d = {(a, b): 0 for a in _BRANDS for b in _BRANDS if a != b}
    for rk in ballots.values():
        for a in _BRANDS:
            for b in _BRANDS:
                if a != b and rk[a] < rk[b]:
                    d[(a, b)] += 1
    p = {
        (a, b): d[(a, b)] if d[(a, b)] > d[(b, a)] else 0
        for a in _BRANDS for b in _BRANDS if a != b
    }
    for k in _BRANDS:
        for i in _BRANDS:
            for j in _BRANDS:
                if len({i, j, k}) == 3:
                    p[(i, j)] = max(p[(i, j)], min(p[(i, k)], p[(k, j)]))
    for r in rows:
        key = (r.brand_a, r.brand_b)
        assert r.prefer_a_over_b == d[key]
        assert r.beatpath_strength == p[key]
        assert r.a_beats_b == (p[key] > p[(r.brand_b, r.brand_a)])
    # Schulze guarantees a non-dominated candidate exists
    beaten = {r.brand_a for r in rows if not r.a_beats_b and
              p[(r.brand_b, r.brand_a)] > p[(r.brand_a, r.brand_b)]}
    assert len(beaten) < len(_BRANDS)


# -------------------------------------------------------------- IRV


def test_irv_python_simulation(spark, sf_dir):
    rows = _rows(spark, sf_dir, "election_irv_exhaustive_runoff")
    con = _duck(sf_dir)
    ballots = _ballots_py(con)
    n_voters = len(ballots)
    active = set(_BRANDS)
    got: dict[int, dict[str, tuple[int, bool]]] = {}
    for r in rows:
        got.setdefault(r.round, {})[r.brand] = (r.votes, r.eliminated)
    for rnd in range(1, 5):
        votes = {b: 0 for b in active}
        for rk in ballots.values():
            first = min(active, key=lambda b: rk[b])
            votes[first] += 1
        loser = min(active, key=lambda b: (votes[b], b))
        g = got[rnd]
        assert set(g) == active
        assert sum(v for v, _ in g.values()) == n_voters  # transfers
        for b in active:
            assert g[b] == (votes[b], b == loser)
        active.remove(loser)


# ----------------------------------------------------- Bradley-Terry


def test_bradley_terry_exact_replay_and_float_rank(spark, sf_dir):
    rows = _rows(spark, sf_dir, "eval_bradley_terry_rounds")
    assert rows
    con = _duck(sf_dir)
    duels = con.execute(
        f"""
        WITH ospend AS (
            SELECT l.l_orderkey AS ok, p.p_brand AS brand,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand IN {_BRANDS}
            GROUP BY 1, 2
        )
        SELECT s1.brand, s2.brand FROM ospend s1
        JOIN ospend s2 ON s2.ok = s1.ok AND s2.brand <> s1.brand
        WHERE s1.cents > s2.cents
        """
    ).fetchall()
    w: dict[tuple[str, str], int] = {}
    wins: dict[str, int] = {}
    for a, b in duels:
        w[(a, b)] = w.get((a, b), 0) + 1
        wins[a] = wins.get(a, 0) + 1
    items = sorted(wins)
    n = {(a, b): w.get((a, b), 0) + w.get((b, a), 0)
         for a in items for b in items if a != b}
    # exact integer replay (same quantized recurrence)
    p = {b: 10**6 for b in items}
    for _ in range(3):
        den = {
            a: sum((n[(a, b)] * 10**12) // (p[a] + p[b])
                   for b in items if b != a and n[(a, b)])
            for a in items
        }
        p = {a: (wins[a] * 10**12) // den[a] for a in items if den[a] > 0}
    # float MM from scratch -> ranking must agree
    q = {b: 1.0 for b in items}
    for _ in range(3):
        q = {
            a: wins[a] / sum(n[(a, b)] / (q[a] + q[b])
                             for b in items if b != a and n[(a, b)])
            for a in items
        }
    frank = {b: i + 1 for i, b in enumerate(
        sorted(items, key=lambda b: (-q[b], b)))}
    got = {r.brand: r for r in rows}
    assert set(got) == set(items)
    for b in items:
        assert got[b].wins == wins[b]
        assert got[b].strength_micro == p[b]
        assert got[b].strength_rank == frank[b]


# -------------------------------------------------------------- SCC


def test_scc_tarjan_replay(spark, sf_dir):
    rows = _rows(spark, sf_dir, "graph_scc_kosaraju_labels")
    assert rows
    con = _duck(sf_dir)
    trade = con.execute(
        """
        SELECT sn.n_nationkey, cn.n_nationkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                    AS BIGINT)
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE cn.n_nationkey <> sn.n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    cnt, tot = len(trade), sum(t[2] for t in trade)
    edges = [(u, v) for u, v, wgt in trade if wgt * cnt >= tot]
    nodes = sorted({x for e in edges for x in e})
    adj: dict[int, list[int]] = {x: [] for x in nodes}
    for u, v in edges:
        adj[u].append(v)
    # iterative Tarjan
    index, low, onstk, stk, comp = {}, {}, set(), [], {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stk.append(v)
                onstk.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                u = adj[v][i]
                if u not in index:
                    work[-1] = (v, i + 1)
                    work.append((u, 0))
                    recurse = True
                    break
                if u in onstk:
                    low[v] = min(low[v], index[u])
            if not recurse:
                work.pop()
                if work:
                    pw = work[-1][0]
                    low[pw] = min(low[pw], low[v])
                if low[v] == index[v]:
                    members = []
                    while True:
                        u = stk.pop()
                        onstk.discard(u)
                        members.append(u)
                        if u == v:
                            break
                    lbl = min(members)
                    for m in members:
                        comp[m] = lbl
    for x in nodes:
        if x not in index:
            strongconnect(x)
    sizes: dict[int, int] = {}
    for m, lbl in comp.items():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    names = dict(con.execute(
        "SELECT n_nationkey, n_name FROM nation").fetchall())
    got = {r.n_name: r for r in rows}
    assert set(got) == {names[x] for x in nodes}
    for x in nodes:
        r = got[names[x]]
        assert r.scc_label == comp[x]
        assert r.scc_size == sizes[comp[x]]
        assert r.is_trivial == (sizes[comp[x]] == 1)


# ---------------------------------------------------------- Banker's


def test_bankers_replay_and_permutation_completeness(spark, sf_dir):
    """Replay the greedy; where the greedy declares UNSAFE, verify by
    exhausting all 5! process orders that no safe sequence exists —
    the completeness theorem behind the greedy's correctness."""
    rows = _rows(spark, sf_dir, "sched_bankers_algorithm_safety")
    assert rows
    con = _duck(sf_dir)
    cells = con.execute(
        """
        WITH counts AS (
            SELECT r.r_name AS rn, n.n_nationkey AS nk,
                   EXTRACT(quarter FROM o.o_orderdate) AS q, COUNT(*) AS c
            FROM orders o
            JOIN customer cu ON cu.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = cu.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE EXTRACT(year FROM o.o_orderdate) = 1995
              AND EXTRACT(quarter FROM o.o_orderdate) <= 3
            GROUP BY 1, 2, 3
        )
        SELECT rn, nk, q, c FROM counts ORDER BY rn, nk, q
        """
    ).fetchall()
    data: dict[str, dict[int, list[int]]] = {}
    for rn, nk, q, c in cells:
        data.setdefault(rn, {}).setdefault(nk, [0, 0, 0])[int(q) - 1] = c
    got = {r.r_name: r for r in rows}
    for rn, procs in data.items():
        nks = sorted(procs)
        alloc = {nk: [c % 7 for c in procs[nk]] for nk in nks}
        need = {nk: [(c // 7) % 4 for c in procs[nk]] for nk in nks}
        asums = sum(sum(alloc[nk]) for nk in nks)
        nsums = sum(sum(need[nk]) for nk in nks)
        avail0 = [3 + asums % 4, 2 + nsums % 5, 1 + (asums + nsums) % 6]

        def run(order, avail0=avail0, alloc=alloc, need=need):
            avail = list(avail0)
            seq = []
            done = set()
            for _ in range(len(order)):
                pick = next(
                    (nk for nk in order if nk not in done
                     and all(need[nk][r] <= avail[r] for r in range(3))),
                    None,
                )
                if pick is None:
                    break
                done.add(pick)
                seq.append(pick)
                for r in range(3):
                    avail[r] += alloc[pick][r]
            return seq, avail

        seq, avail = run(nks)
        r = got[rn]
        assert r.n_finished == len(seq)
        assert r.is_safe == (len(seq) == len(nks))
        assert r.safe_sequence == "-".join(str(x) for x in seq)
        assert (r.final_avail_1, r.final_avail_2, r.final_avail_3) == tuple(avail)
        if not r.is_safe:
            # completeness: NO ordering finishes all processes
            for perm in permutations(nks):
                s2, _ = run(list(perm))
                assert len(s2) < len(nks)
