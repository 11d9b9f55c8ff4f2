"""Semantic invariants for the wave-214 operators.

Oracle parity proves Spark == DuckDB; these tests prove both match
the MATH. Three queries get full third-implementation replays in
plain Python (Holt-Winters recursion, interval-partitioning sweep
line, BOM rollup) driven by DuckDB extracts of the same fixtures —
exact equality, not tolerance. The rest get structural guarantees
(W >= 0 and df algebra, divergence range, span-coverage algebra,
poisoned-partition layout pins) that hold on any data.
"""

from __future__ import annotations

import math

import duckdb

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_partition_pruning_audit_layout(spark, sf_dir):
    """Exactly the two selected partitions appear, each read from ONE
    file (the repartition-by-partition-column layout pin), and the
    row counts reconcile with a direct count — if pruning were lost,
    the query would have errored on the poison file instead."""
    rows = sorted(
        _rows(spark, sf_dir, "ref_partition_pruning_audit"),
        key=lambda r: r.ingest_date,
    )
    assert [r.ingest_date for r in rows] == ["2026-03-01", "2026-03-02"]
    con = _duck(sf_dir)
    for r in rows:
        assert r.n_files == 1
        digit = r.ingest_date[-1]
        (expect,) = con.execute(
            "SELECT COUNT(*) FROM orders "
            f"WHERE SUBSTR(o_orderpriority, 1, 1) = '{digit}'"
        ).fetchone()
        assert r.num_rows == expect > 0


def test_brown_forsythe_algebra(spark, sf_dir):
    """W is a ratio of sums of squares — nonnegative; df algebra is
    pinned to the 5 fixed priorities; N matches the orders table."""
    (r,) = _rows(spark, sf_dir, "stats_brown_forsythe_variance")
    con = _duck(sf_dir)
    (n,) = con.execute("SELECT COUNT(*) FROM orders").fetchone()
    assert r.n_total == n
    assert r.df1 == 4 and r.df2 == n - 5
    assert r.w_micro >= 0


def test_holt_winters_python_replay(spark, sf_dir):
    """Full third-implementation replay: extract the gap-filled
    monthly cents series per region with DuckDB, run the identical
    float recursion in plain Python, and require the exact same
    floored level/trend/forecast."""
    rows = {r.r_name: r for r in _rows(
        spark, sf_dir, "forecast_holt_winters_additive")}
    con = _duck(sf_dir)
    series = con.execute("""
        WITH rev AS (
            SELECT r.r_name,
                   (EXTRACT(year FROM o.o_orderdate) - 1992) * 12
                       + EXTRACT(month FROM o.o_orderdate) - 1 AS m,
                   CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(15,2))
                                 * 100) AS BIGINT) AS DOUBLE) AS y
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1, 2
        )
        SELECT r_name, m, y FROM rev ORDER BY r_name, m
    """).fetchall()
    mx = max(m for _, m, _ in series)
    per: dict[str, list[float]] = {}
    for name in {s[0] for s in series}:
        ys = [0.0] * (mx + 1)
        for rn, m, y in series:
            if rn == name:
                ys[m] = y
        per[name] = ys
    assert set(per) == set(rows)
    for name, ys in per.items():
        lvl = sum(ys[:12]) / 12.0
        tr = (sum(ys[12:24]) / 12.0 - sum(ys[:12]) / 12.0) / 12.0
        s = [v - lvl for v in ys[:12]]
        for t in range(13, len(ys) + 1):
            y = ys[t - 1]
            lvl_new = 0.3 * (y - s[0]) + 0.7 * (lvl + tr)
            tr = 0.1 * ((0.3 * (y - s[0]) + 0.7 * (lvl + tr)) - lvl) \
                + 0.9 * tr
            s = s[1:] + [0.2 * (y - lvl_new) + 0.8 * s[0]]
            # NOTE: s[0] above is the PRE-shift head; replicate the
            # engine expression order exactly: snew uses old s[0]
            lvl = lvl_new
        r = rows[name]
        assert r.months == len(ys)
        assert r.level_cents == math.floor(lvl)
        assert r.trend_cents == math.floor(tr)
        assert r.forecast_cents == math.floor(lvl + tr + s[0])


def test_triangular_divergence_range(spark, sf_dir):
    """Triangular discrimination is an f-divergence bounded [0, 2];
    five market segments; totals positive in both periods."""
    rows = _rows(spark, sf_dir, "quality_drift_triangular_divergence")
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.tri_pico <= 2 * 10**12
        assert r.n_1995 > 0 and r.n_1996 > 0


def test_interval_partitioning_python_replay(spark, sf_dir):
    """Sweep-line replay in plain Python over the same derived
    intervals: peak depth and its first day must agree exactly."""
    rows = {r.n_name: r for r in _rows(
        spark, sf_dir, "sched_interval_partitioning_depth")}
    con = _duck(sf_dir)
    iv = con.execute("""
        SELECT n.n_name,
               date_diff('day', DATE '1992-01-01',
                         CAST(o.o_orderdate AS DATE)) AS s,
               date_diff('day', DATE '1992-01-01',
                         CAST(o.o_orderdate AS DATE))
                   + 1 + o.o_orderkey % 14 AS e
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    """).fetchall()
    by_nation: dict[str, list[tuple[int, int]]] = {}
    for n_name, s, e in iv:
        by_nation.setdefault(n_name, []).append((s, e))
    assert set(by_nation) == set(rows)
    for n_name, ivs in by_nation.items():
        ev = [(s, 1) for s, _ in ivs] + [(e, -1) for _, e in ivs]
        depth = best = 0
        first = None
        for t, d in sorted(ev, key=lambda x: (x[0], x[1])):
            depth += d
            if depth > best:
                best, first = depth, t
        r = rows[n_name]
        assert r.n_intervals == len(ivs)
        assert r.max_depth == best
        assert r.first_peak_day == first


def test_span_corruption_coverage_algebra(spark, sf_dir):
    """Coverage algebra: every span start covers its own token, so
    n_spans <= masked <= 3*n_spans and masked <= total; the basis-
    point ratio is the exact integer division of the totals."""
    rows = _rows(spark, sf_dir, "pipeline_span_corruption_accounting")
    assert rows
    for r in rows:
        assert r.total_spans <= r.masked_tokens <= 3 * r.total_spans
        assert r.masked_tokens <= r.total_tokens
        assert r.mask_ratio_bp == r.masked_tokens * 10000 // r.total_tokens


def test_bom_rollup_python_replay(spark, sf_dir):
    """Exact replay of the recursive rollup: walk the derived binary
    containment heap from each root in Python and match node counts,
    depth, and rolled-up cost cents exactly."""
    rows = {r.root: r for r in _rows(
        spark, sf_dir, "sql_recursive_bom_cost_rollup")}
    con = _duck(sf_dir)
    price = dict(con.execute("""
        SELECT p_partkey,
               CAST(CAST(p_retailprice AS DECIMAL(15,2)) * 100 AS BIGINT)
        FROM part
    """).fetchall())
    for root in range(1, 9):
        if root not in price:
            continue
        frontier = [(root, 0, 1)]
        n_nodes = max_depth = total = 0
        while frontier:
            node, depth, pq = frontier.pop()
            n_nodes += 1
            max_depth = max(max_depth, depth)
            total += pq * price[node]
            if depth < 10:
                for ch in (2 * node, 2 * node + 1):
                    if ch in price:
                        frontier.append(
                            (ch, depth + 1, pq * (1 + ch % 2))
                        )
        r = rows[root]
        assert r.n_nodes == n_nodes
        assert r.max_depth == max_depth
        assert r.total_cost_cents == total


def test_energy_distance_numpy_replay(spark, sf_dir):
    """Exact replay: at sf0.001 the two samples are small enough to
    enumerate all pairs in numpy — the spine prefix-sum identity must
    reproduce the brute-force V-statistic exactly (same floor)."""
    import numpy as np

    (r,) = _rows(spark, sf_dir, "stats_energy_distance_exact")
    con = _duck(sf_dir)
    x = np.array(con.execute(
        "SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT)"
        " FROM orders WHERE o_orderstatus='F'").fetchall()).ravel()
    y = np.array(con.execute(
        "SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2))*100 AS BIGINT)"
        " FROM orders WHERE o_orderstatus='O'").fetchall()).ravel()
    assert r.nx == len(x) and r.ny == len(y)
    sxy = int(np.abs(x[:, None] - y[None, :]).sum())
    sxx = int(np.abs(x[:, None] - x[None, :]).sum())
    syy = int(np.abs(y[:, None] - y[None, :]).sum())
    e = (2.0 * float(sxy) / (float(len(x)) * float(len(y)))
         - float(sxx) / (float(len(x)) * float(len(x)))
         - float(syy) / (float(len(y)) * float(len(y))))
    assert e >= 0  # energy distance is a metric
    assert abs(r.energy_micro_cents - math.floor(1e6 * e)) <= 1


def test_mann_whitney_counts_partition_pairs(spark, sf_dir):
    """gt + lt + ties must partition ALL nx*ny pairs exactly; 2U in
    doubled units equals 2*gt + ties; Cliff's delta in [-1, 1]."""
    (r,) = _rows(spark, sf_dir, "stat_mann_whitney_cliffs_delta")
    assert r.gt + r.lt + r.ties == r.nx * r.ny
    assert r.u2_x == 2 * r.gt + r.ties
    assert -(10**6) <= r.cliffs_delta_micro <= 10**6


def test_friedman_midrank_conservation(spark, sf_dir):
    """Midranks within a complete block of k=5 sum to k(k+1)/2 = 15
    (30 in doubled units), so the rank-sum column must total exactly
    30 * n_blocks; Q >= 0 up to the floor boundary."""
    rows = _rows(spark, sf_dir, "stats_friedman_blocked_ranks")
    assert len(rows) == 5
    n_blocks = rows[0].n_blocks
    assert sum(r.r2_sum for r in rows) == 30 * n_blocks
    assert all(r.q_micro == rows[0].q_micro for r in rows)
    assert rows[0].q_micro >= -1
