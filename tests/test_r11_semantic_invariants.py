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
        WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996, 1997)
        GROUP BY 1, 2
        """
    ).fetchall()
    mat = {}
    for ck, y in acts:
        mat.setdefault(ck, set()).add(int(y))
    n_blocks = len(mat)
    cols = {1995: 0, 1996: 0, 1997: 0}
    big_n = 0
    sum_ri_sq = 0
    for yrs in mat.values():
        for y in yrs:
            cols[y] += 1
        ri = len(yrs)
        big_n += ri
        sum_ri_sq += ri * ri
    assert row.n_blocks == n_blocks
    assert (row.c95, row.c96, row.c97) == (
        cols[1995],
        cols[1996],
        cols[1997],
    )
    assert row.big_n == big_n == row.c95 + row.c96 + row.c97
    den = 3 * big_n - sum_ri_sq
    assert den > 0
    num = 3 * (cols[1995] ** 2 + cols[1996] ** 2 + cols[1997] ** 2) - big_n**2
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


# ================= wave-215 part 2 (analytics198) =================


def test_jonckheere_python_replay(spark, sf_dir):
    """Brute-force pairwise J from a DuckDB extract (all priority
    pairs i<j, counting x<y as 2 and ties as 1) must equal j2; the
    closed-form null mean and deviation identities must hold."""
    (row,) = _rows(spark, sf_dir, "stat_jonckheere_terpstra")
    con = _duck(sf_dir)
    vals = con.execute(
        """
        SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT),
               CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
        FROM orders
        """
    ).fetchall()
    groups = {g: [] for g in range(1, 6)}
    for g, v in vals:
        groups[g].append(v)
    for g in groups:
        groups[g].sort()
    import bisect

    j2 = 0
    for i in range(1, 6):
        for j in range(i + 1, 6):
            xi = groups[i]
            for y in groups[j]:
                lt = bisect.bisect_left(xi, y)
                eq = bisect.bisect_right(xi, y) - lt
                j2 += 2 * lt + eq
    n_i = [len(groups[g]) for g in range(1, 6)]
    n = sum(n_i)
    assert row.j2 == j2
    assert row.n_total == n
    assert [row.n1, row.n2, row.n3, row.n4, row.n5] == n_i
    mean_j4 = n * n - sum(k * k for k in n_i)
    assert row.mean_j4 == mean_j4
    assert row.dev_j4 == 2 * j2 - mean_j4
    # J is bounded by the total number of cross-group pairs (x2)
    assert 0 <= j2 <= mean_j4  # 2J <= 2 * sum_{i<j} n_i n_j = mean_j4... 
    # NOTE: mean_j4 = 4*E[J] = 2 * (total cross pairs), and J <= total
    # cross pairs, so j2 = 2J <= mean_j4 * ... exact bound: j2 <= 2*pairs
    pairs = sum(
        n_i[a] * n_i[b] for a in range(5) for b in range(a + 1, 5)
    )
    assert j2 <= 2 * pairs and mean_j4 == 2 * pairs


def test_bridge_edges_python_replay(spark, sf_dir):
    """Independent per-edge BFS (queue, edge removed) over the heavy
    graph from a DuckDB extract; is_bridge/alt_dist must match, and
    every reported alternate path must be >= 2 hops."""
    rows = _rows(spark, sf_dir, "graph_bridge_edges")
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
    heavy = [(u, v) for u, v, w in trade if w * cnt * 2 >= 3 * tot]
    adj = {}
    for u, v in heavy:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = {}
    for u, v in heavy:
        dist = {u: 0}
        frontier = [u]
        for d in range(1, 7):
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if (x, y) in ((u, v), (v, u)):
                        continue
                    if y not in dist:
                        dist[y] = d
                        nxt.append(y)
            frontier = nxt
        alt = dist.get(v, 0)
        expect[(u, v)] = (1 if v not in dist else 0, alt)
    got = {(r.u, r.v): (r.is_bridge, r.alt_dist) for r in rows}
    assert got == expect
    for (u, v), (isb, alt) in got.items():
        assert (isb == 1 and alt == 0) or (isb == 0 and alt >= 2)


def test_easter_computus_known_dates(spark, sf_dir):
    """The computus must reproduce the published Easter dates for the
    TPC-H years, and the holy-week counts must reconcile with direct
    DuckDB date-range counts."""
    rows = {r.year: r for r in _rows(spark, sf_dir, "time_easter_computus")}
    known = {
        1990: (4, 15), 1991: (3, 31), 1992: (4, 19), 1993: (4, 11),
        1994: (4, 3), 1995: (4, 16), 1996: (4, 7), 1997: (3, 30),
        1998: (4, 12), 1999: (4, 4), 2000: (4, 23), 2001: (4, 15),
        2002: (3, 31),
    }
    for y, r in rows.items():
        assert (r.easter_month, r.easter_day) == known[y], y
        assert 0 <= r.holy_week_orders <= r.year_orders
        assert r.holy_week_ppm == (10**6 * r.holy_week_orders) // r.year_orders
    con = _duck(sf_dir)
    for y, r in rows.items():
        m, d = known[y]
        (direct,) = con.execute(
            f"""
            SELECT COUNT(*) FROM orders
            WHERE o_orderdate BETWEEN make_date({y},{m},{d}) - 6
                                  AND make_date({y},{m},{d})
            """
        ).fetchone()
        assert r.holy_week_orders == direct


def test_allan_variance_python_replay(spark, sf_dir):
    """Recompute AVAR(1)/AVAR(2) from a zero-filled daily series in
    plain Python; integer identities and the sanity range for the
    avar2/avar1 ratio must hold."""
    rows = _rows(spark, sf_dir, "events_allan_variance")
    assert rows
    import datetime

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    raw = con.execute(
        "SELECT event_type, CAST(ts AS DATE), COUNT(*) "
        "FROM events GROUP BY 1, 2"
    ).fetchall()
    d0 = min(d for _, d, _ in raw)
    d1 = max(d for _, d, _ in raw)
    span = [(d0 + datetime.timedelta(days=i))
            for i in range((d1 - d0).days + 1)]
    per_type = {}
    for t, d, c in raw:
        per_type.setdefault(t, {})[d] = c
    for r in rows:
        ys = [per_type[r.event_type].get(d, 0) for d in span]
        ssd1 = sum((b - a) ** 2 for a, b in zip(ys, ys[1:]))
        m1 = len(ys) - 1
        zs = [ys[i] + ys[i + 1] for i in range(0, len(ys) - 1, 2)]
        ssd2 = sum((b - a) ** 2 for a, b in zip(zs, zs[1:]))
        m2 = len(zs) - 1
        assert r.n_days == len(ys)
        assert (r.ssd1, r.m1, r.ssd2, r.m2) == (ssd1, m1, ssd2, m2)
        assert r.avar1_micro == (10**6 * ssd1) // (2 * m1)
        assert r.avar2_micro == (10**6 * ssd2) // (8 * m2)
        assert r.ratio_micro == (10**6 * ssd2 * m1) // (4 * ssd1 * m2)
        # white noise ~ 0.5e6, random walk ~ 2e6; any stationary-ish
        # counting process lands strictly positive
        assert r.ratio_micro > 0


def test_hamming74_ecc_theory(spark, sf_dir):
    """The ECC audit must reproduce coding theory exactly: stratum 0
    decodes 100% with zero syndrome; stratum 1 decodes 100% with
    nonzero syndrome; stratum 2 decodes 0% (d_min = 3) and never has
    zero syndrome (positions are distinct); the syndrome always
    equals the XOR of the flip positions; strata partition orders."""
    rows = {r.n_err: r for r in _rows(spark, sf_dir, "dq_hamming74_ecc_audit")}
    assert set(rows) == {0, 1, 2}
    r0, r1, r2 = rows[0], rows[1], rows[2]
    assert r0.n_decode_ok == r0.n_keys and r0.n_syndrome_zero == r0.n_keys
    assert r1.n_decode_ok == r1.n_keys and r1.n_syndrome_zero == 0
    assert r2.n_decode_ok == 0 and r2.n_syndrome_zero == 0
    for r in rows.values():
        assert r.n_syndrome_theory_ok == r.n_keys
        assert r.decode_ok_ppm == (10**6 * r.n_decode_ok) // r.n_keys
    con = _duck(sf_dir)
    (n_orders,) = con.execute("SELECT COUNT(*) FROM orders").fetchone()
    assert r0.n_keys + r1.n_keys + r2.n_keys == n_orders
