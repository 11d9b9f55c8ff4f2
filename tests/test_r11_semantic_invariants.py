"""Semantic invariants for the wave-215 (round 11) operators.

Oracle parity proves Spark == DuckDB; these tests prove both match
the MATH. Each query gets a genuine third implementation in plain
Python driven by DuckDB extracts of the same fixtures — the LPT
greedy is re-run with an explicit machine array, the Talmud rule with
the classic iterative water-filling (not the prefix-sum formula the
engine uses), the BFS with a queue — exact equality, not tolerance.
Structural guarantees (Graham's bound, rank-sum identities, award
boundedness/efficiency) are asserted on top.
"""

from __future__ import annotations

import duckdb

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "orders",
        "customer",
        "nation",
        "region",
        "supplier",
        "lineitem",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ------------------------------------------------ LPT list scheduling


def test_lpt_python_replay_and_graham_bound(spark, sf_dir):
    """Replay the LPT greedy per nation with an explicit 4-slot
    machine array (first-min tie-break); makespan/total must match
    exactly. Graham: LB <= makespan <= (4/3 - 1/(3m)) * OPT, and
    since OPT >= LB the micro-ratio is bounded by 1_250_000."""
    rows = _rows(spark, sf_dir, "sched_lpt_makespan_bound")
    assert rows
    con = _duck(sf_dir)
    jobs = con.execute(
        """
        SELECT n.n_name,
               CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT),
               o.o_orderkey
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE EXTRACT(year FROM o.o_orderdate) = 1995
        """
    ).fetchall()
    by_nation = {}
    for nm, cents, okey in jobs:
        by_nation.setdefault(nm, []).append((cents, okey))
    for r in rows:
        js = sorted(by_nation[r.n_name], key=lambda t: (-t[0], t[1]))
        machines = [0, 0, 0, 0]
        for cents, _ in js:
            k = machines.index(min(machines))  # first min on ties
            machines[k] += cents
        total = sum(machines)
        makespan = max(machines)
        lb = max((total + 3) // 4, js[0][0])
        assert r.n_jobs == len(js)
        assert r.total_cents == total
        assert r.makespan_cents == makespan
        assert r.lower_bound_cents == lb
        assert r.ratio_micro == (1_000_000 * makespan) // lb
        # LB <= makespan, and LPT is within Graham's 4/3 - 1/(3m) of
        # OPT >= LB  =>  ratio in [1.0, 1.25] exactly.
        assert 1_000_000 <= r.ratio_micro <= 1_250_000


# ------------------------------------------------ Page's trend test


def test_page_l_python_replay_and_bounds(spark, sf_dir):
    """Recompute L from scratch (rank within nation over the filled
    month panel) and check the rank-sum identity: the total of all
    ranks is n*k(k+1)/2 and L lies within the extreme anti-/pro-
    ordered arrangements n*sum(j*(k+1-j)) .. n*sum(j*j)."""
    (row,) = _rows(spark, sf_dir, "stat_page_trend_test")
    con = _duck(sf_dir)
    rev = con.execute(
        """
        SELECT n.n_name, EXTRACT(month FROM o.o_orderdate) AS m,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100)
                    AS BIGINT) AS y
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE EXTRACT(year FROM o.o_orderdate) = 1995
          AND EXTRACT(month FROM o.o_orderdate) <= 6
        GROUP BY 1, 2
        """
    ).fetchall()
    k = 6
    panel = {}
    for nm, m, y in rev:
        panel.setdefault(nm, {})[int(m)] = y
    big_l = 0
    for nm, months in panel.items():
        filled = [(months.get(m, 0), m) for m in range(1, k + 1)]
        order = sorted(range(k), key=lambda i: filled[i])
        for rank0, idx in enumerate(order):
            big_l += filled[idx][1] * (rank0 + 1)
    n = len(panel)
    assert row.n_blocks == n
    assert row.big_l == big_l
    assert row.l_mean_x4 == n * k * (k + 1) ** 2
    assert row.l_var_x144 == n * k**2 * (k + 1) * (k**2 - 1)
    dev = 4 * big_l - n * k * (k + 1) ** 2
    assert row.z2_micro == (1_000_000 * 9 * dev * dev) // row.l_var_x144
    lo = n * sum(j * (k + 1 - j) for j in range(1, k + 1))
    hi = n * sum(j * j for j in range(1, k + 1))
    assert lo <= big_l <= hi


# ------------------------------------------------ Cochran's Q test


def test_cochran_q_python_replay(spark, sf_dir):
    """Rebuild the binary activity matrix per customer and recompute
    Q = 2*(3*sum Cj^2 - N^2)/(3N - sum Ri^2) exactly; column counts
    must sum to N and Q must be non-negative."""
    (row,) = _rows(spark, sf_dir, "stat_cochran_q_test")
    con = _duck(sf_dir)
    acts = con.execute(
        """
        SELECT o_custkey, EXTRACT(year FROM o_orderdate) AS y
        FROM orders
        WHERE EXTRACT(year FROM o_orderdate) IN (1993, 1994, 1995)
        GROUP BY 1, 2
        """
    ).fetchall()
    mat = {}
    for ck, y in acts:
        mat.setdefault(ck, set()).add(int(y))
    n_blocks = len(mat)
    cols = {1993: 0, 1994: 0, 1995: 0}
    big_n = 0
    sum_ri_sq = 0
    for yrs in mat.values():
        for y in yrs:
            cols[y] += 1
        ri = len(yrs)
        big_n += ri
        sum_ri_sq += ri * ri
    assert row.n_blocks == n_blocks
    assert (row.c93, row.c94, row.c95) == (
        cols[1993],
        cols[1994],
        cols[1995],
    )
    assert row.big_n == big_n == row.c93 + row.c94 + row.c95
    den = 3 * big_n - sum_ri_sq
    assert den > 0
    num = 3 * (cols[1993] ** 2 + cols[1994] ** 2 + cols[1995] ** 2) - big_n**2
    assert row.q_micro == (1_000_000 * 2 * num) // den
    assert row.q_micro >= 0


# ------------------------------------------------ Talmud bankruptcy


def _cea_waterfill(claims, estate):
    """Iterative constrained-equal-awards in exact integers: raise
    the common award level until the estate is spent; claimants cap
    at their claim. Returns awards in micro-units (award*1e6) using
    the same final-division placement as the engine (floor once, on
    the pooled residual)."""
    n = len(claims)
    order = sorted(range(n), key=lambda i: claims[i])
    awards = [None] * n
    remaining = estate
    live = n
    for pos, i in enumerate(order):
        # can everyone still live afford claim_i each?
        if claims[i] * live <= remaining:
            awards[i] = 1_000_000 * claims[i]
            remaining -= claims[i]
            live -= 1
        else:
            # split the residual equally among all still-live claimants
            share_micro = (1_000_000 * remaining) // live
            for j in order[pos:]:
                awards[j] = share_micro
            break
    return awards


def test_talmud_python_waterfill_replay(spark, sf_dir):
    """Third implementation: per region, run the classic iterative
    CEA water-filling on half-claims (below half-sum) or its CEL dual
    (above), in exact integers, and match every award. Plus the rule's
    axioms: 0 <= award <= claim and per-region efficiency (awards sum
    to the estate within one floor per unsaturated claimant)."""
    rows = _rows(spark, sf_dir, "alloc_talmud_bankruptcy")
    assert rows
    by_region = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    for rname, members in by_region.items():
        claims = [m.claim_cents for m in members]
        estate = members[0].estate_cents
        assert all(m.estate_cents == estate for m in members)
        big_d = sum(claims)
        # engine used e2 = 2*estate; replicate branch selection
        if 2 * estate <= big_d:
            # CEA on doubled claims against doubled estate, halved:
            # equivalent to CEA(d, 2E)/2 — run waterfill on full
            # claims against e2 then halve.
            awards2 = _cea_waterfill(claims, 2 * estate)
            expect = [a // 2 for a in awards2]
        else:
            # CEL dual: award = d - CEA(d, 2D - 2E)/2
            awards2 = _cea_waterfill(claims, 2 * big_d - 2 * estate)
            expect = [1_000_000 * d - a // 2 for d, a in zip(claims, awards2)]
        got = [m.award_micro_cents for m in members]
        # identical floor placement is not guaranteed between the two
        # algorithms; allow 1 micro-unit of floor slack per award
        for g, e in zip(got, expect):
            assert abs(g - e) <= 1, (rname, g, e)
        for m in members:
            assert 0 <= m.award_micro_cents <= 1_000_000 * m.claim_cents
        n_unsat = sum(
            1 for m in members if m.award_micro_cents < 1_000_000 * m.claim_cents
        )
        total_awarded = sum(got)
        assert abs(total_awarded - 1_000_000 * estate) <= max(1, n_unsat) * 2


def test_talmud_order_preservation(spark, sf_dir):
    """Aumann-Maschler order preservation: within a region, a larger
    claim never receives a smaller award, and never a smaller LOSS
    (claim - award) either."""
    rows = _rows(spark, sf_dir, "alloc_talmud_bankruptcy")
    by_region = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    for members in by_region.values():
        ms = sorted(members, key=lambda m: (m.claim_cents, m.n_name))
        for a, b in zip(ms, ms[1:]):
            assert a.award_micro_cents <= b.award_micro_cents + 1
            loss_a = 1_000_000 * a.claim_cents - a.award_micro_cents
            loss_b = 1_000_000 * b.claim_cents - b.award_micro_cents
            assert loss_a <= loss_b + 1


# ------------------------------------------------ harmonic centrality


def test_harmonic_python_bfs_replay(spark, sf_dir):
    """Independent queue-based BFS over the heavy trade graph built
    from a DuckDB extract; harmonic_x60 must match exactly and obey
    10*n_reached <= harmonic_x60 <= 60*n_reached (distances 1..6)."""
    rows = _rows(spark, sf_dir, "graph_harmonic_centrality")
    assert rows
    con = _duck(sf_dir)
    trade = con.execute(
        """
        SELECT least(cn.n_nationkey, sn.n_nationkey) AS u,
               greatest(cn.n_nationkey, sn.n_nationkey) AS v,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                    AS BIGINT) AS w
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
    cnt = len(trade)
    tot = sum(w for _, _, w in trade)
    adj = {}
    for u, v, w in trade:
        if w * cnt * 2 >= 3 * tot:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    expect = {}
    for s in adj:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, 7):
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = d
                        nxt.append(y)
            frontier = nxt
        reached = [d for v, d in dist.items() if d > 0]
        expect[s] = (len(reached), sum(60 // d for d in reached))
    got = {r.nationkey: (r.n_reached, r.harmonic_x60) for r in rows}
    assert got == expect
    for n_reached, h60 in got.values():
        assert 10 * n_reached <= h60 <= 60 * n_reached
