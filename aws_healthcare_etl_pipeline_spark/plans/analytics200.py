"""Wave-216 (round 11), part 2: preference aggregation, paired-
comparison strength estimation, directed-graph structure, and
deadlock-avoidance.

Five oracle-backed queries:

- ``election_schulze_widest_path`` — the Schulze method over 5 brand
  "candidates" ranked by each customer's spend: pairwise preference
  matrix from one fact-scale aggregate, then the widest-path (max-min)
  closure as a FIXED 5-round Floyd-Warshall unroll on the 20-row
  matrix — no convergence loop, a fixed job count.
- ``election_irv_exhaustive_runoff`` — instant-runoff voting on the
  same ballots: 4 unrolled elimination rounds (count first
  preferences among active candidates, eliminate fewest-votes with
  lexicographic tie-break), each round one aggregate over the ballot
  relation with the eliminated set as a broadcast anti-join.
- ``eval_bradley_terry_rounds`` — Bradley-Terry strength estimation
  from within-order brand duels (higher line spend wins), three
  minorization-maximization rounds carried in exact micro-integer
  quantized arithmetic (every division a floor DIV on non-negative
  operands, identical in both engines).
- ``graph_scc_kosaraju_labels`` — strongly connected components of
  the DIRECTED nation trade graph (supplier nation -> customer
  nation, above-mean edges): reachability closure by repeated
  squaring (5 doublings cover paths up to 32 > 24 = max simple-path
  length), SCC = mutual reachability, component label = min key.
- ``sched_bankers_algorithm_safety`` — Banker's algorithm safety
  check per region: 5 nation "processes" with data-derived
  allocation/need over 3 resources, the greedy least-index safe
  sequence replayed as a grouped ``F.aggregate`` fold (greedy is
  complete for Banker's: if any safe order exists the greedy one
  succeeds), reporting safety, the sequence, and final available.

House rules: integer-exact hash path, fixed unrolls instead of
convergence loops, broadcast-bounded small sides, explicit
tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# Five candidate brands that EXIST in the fixture part table (its
# brands are Brand#1..Brand#25, not TPC-H's Brand#MN grid — the
# mid-build draft used Brand#33/44/55, which matched zero parts and
# degenerated every election to 2 candidates / empty FW output).
_BRANDS = ("Brand#11", "Brand#13", "Brand#17", "Brand#19", "Brand#22")
_D38 = "decimal(38,0)"


def _brand_spine_sql() -> str:
    return " UNION ALL ".join(f"SELECT '{b}' AS brand" for b in _BRANDS)


def _ballots_sql() -> str:
    """DuckDB CTE text: (voter, brand, rank) full rankings of the 5
    candidate brands by customer spend (spend DESC, brand ASC),
    missing brands ranked with spend 0."""
    return f"""
        spend AS (
            SELECT o.o_custkey AS voter, p.p_brand AS brand,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand IN {_BRANDS}
            GROUP BY 1, 2
        ), voters AS (
            SELECT DISTINCT voter FROM spend
        ), brands AS ({_brand_spine_sql()}),
        filled AS (
            SELECT v.voter, b.brand, COALESCE(s.cents, 0) AS cents
            FROM voters v CROSS JOIN brands b
            LEFT JOIN spend s ON s.voter = v.voter AND s.brand = b.brand
        ), ballots AS (
            SELECT voter, brand,
                   ROW_NUMBER() OVER (PARTITION BY voter
                                      ORDER BY cents DESC, brand ASC) AS rnk
            FROM filled
        )
    """


def _ballots_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    spend = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .where(F.col("p_brand").isin(*_BRANDS))
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("voter"), F.col("p_brand").alias("brand")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    brands = spark.createDataFrame([(b,) for b in _BRANDS], ["brand"])
    filled = (
        spend.select("voter")
        .distinct()
        .crossJoin(F.broadcast(brands))
        .join(spend, ["voter", "brand"], "left")
        .select(
            "voter", "brand", F.coalesce("cents", F.lit(0)).alias("cents")
        )
    )
    w = Window.partitionBy("voter").orderBy(
        F.col("cents").desc(), F.col("brand").asc()
    )
    return filled.select(
        "voter", "brand", F.row_number().over(w).alias("rnk")
    )


# ------------------------------------------------ Schulze beatpaths


def _schulze_fw_sql() -> str:
    """Chained Floyd-Warshall CTEs p0..p5 over the 20-row matrix."""
    parts = [
        """p0 AS MATERIALIZED (
            SELECT a, b,
                   CASE WHEN d > dT THEN d ELSE 0 END AS s
            FROM prefs
        )"""
    ]
    # LEFT joins: the matrix has no diagonal, so rows with a = k or
    # b = k find no (k,k) partner — textbook FW leaves them unchanged
    # (COALESCE to 0 makes the candidate a no-op; inner joins dropped
    # them and emptied the relation after 5 rounds).
    for t, k in enumerate(_BRANDS):
        parts.append(f"""p{t + 1} AS MATERIALIZED (
            SELECT p.a, p.b,
                   GREATEST(p.s, LEAST(COALESCE(ik.s, 0),
                                       COALESCE(kj.s, 0))) AS s
            FROM p{t} p
            LEFT JOIN p{t} ik ON ik.a = p.a AND ik.b = '{k}'
            LEFT JOIN p{t} kj ON kj.a = '{k}' AND kj.b = p.b
        )""")
    return ", ".join(parts)


@query(
    "election_schulze_widest_path",
    oracle=f"""
        WITH {_ballots_sql()}, pairs AS (
            SELECT x.brand AS a, y.brand AS b,
                   CAST(SUM(CASE WHEN x.rnk < y.rnk THEN 1 ELSE 0 END)
                        AS BIGINT) AS d
            FROM ballots x
            JOIN ballots y ON y.voter = x.voter AND y.brand <> x.brand
            GROUP BY 1, 2
        ), prefs AS (
            SELECT p.a, p.b, p.d, q.d AS dT
            FROM pairs p JOIN pairs q ON q.a = p.b AND q.b = p.a
        ), {_schulze_fw_sql()}
        SELECT pr.a AS brand_a, pr.b AS brand_b,
               pr.d AS prefer_a_over_b,
               CAST(f.s AS BIGINT) AS beatpath_strength,
               f.s > fT.s AS a_beats_b
        FROM prefs pr
        JOIN p5 f ON f.a = pr.a AND f.b = pr.b
        JOIN p5 fT ON fT.a = pr.b AND fT.b = pr.a
        ORDER BY brand_a, brand_b
    """,
    description="The Schulze (beatpath) voting method with 5 brands "
    "as candidates and customers as voters (ballot = full spend "
    "ranking, spend DESC / brand ASC, unbought brands at spend 0): "
    "pairwise preference counts from ONE aggregate over the ballot "
    "relation, then the widest-path strength closure as a fixed "
    "5-round Floyd-Warshall unroll over the 20-row preference "
    "matrix — the graph-closure analogue of the registry's unrolled "
    "BFS lane, with zero convergence loops. a_beats_b is the final "
    "Schulze relation (provably a strict partial order whose maximal "
    "element is the winner). Scale shape: the only fact-scale work "
    "is the spend aggregate + one 25-rows-per-voter self-join; "
    "everything downstream operates on a broadcast-size 20-row "
    "matrix.",
)
def election_schulze_widest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ballots appears on both sides of the pairwise self-join below;
    # checkpoint once so the fact-scale spend aggregate + window run
    # once, not once per side.
    ballots = _ballots_df(spark, sf_dir).localCheckpoint()
    other = ballots.select(
        F.col("voter").alias("v2"),
        F.col("brand").alias("b2"),
        F.col("rnk").alias("r2"),
    )
    pairs = (
        ballots.join(
            other,
            (ballots.voter == other.v2) & (ballots.brand != other.b2),
        )
        .groupBy(F.col("brand").alias("a"), F.col("b2").alias("b"))
        .agg(
            F.sum(F.when(F.col("rnk") < F.col("r2"), 1).otherwise(0))
            .cast("long")
            .alias("d")
        )
    )
    pairs_t = pairs.select(
        F.col("a").alias("ta"), F.col("b").alias("tb"), F.col("d").alias("dT")
    )
    # Truncate lineage here: prefs is a <=20-row matrix, but the FW
    # unroll below references it 3x per round — without a checkpoint
    # the logical plan grows 3^5-fold (planning-time OOM, observed at
    # sf0.01) and the fact-scale ballots subtree would be re-planned
    # hundreds of times. One eager localCheckpoint = one fact pass.
    prefs = pairs.join(
        pairs_t, (pairs.a == pairs_t.tb) & (pairs.b == pairs_t.ta)
    ).select("a", "b", "d", "dT").localCheckpoint()
    p = prefs.select(
        "a",
        "b",
        F.when(F.col("d") > F.col("dT"), F.col("d")).otherwise(0).alias("s"),
    )
    # LEFT joins + coalesce-to-0 mirror the oracle: rows with a = k or
    # b = k have no (k,k) partner and must pass through unchanged.
    for k in _BRANDS:
        ik = p.where(F.col("b") == k).select(
            F.col("a").alias("ia"), F.col("s").alias("iks")
        )
        kj = p.where(F.col("a") == k).select(
            F.col("b").alias("jb"), F.col("s").alias("kjs")
        )
        p = (
            p.join(F.broadcast(ik), p.a == ik.ia, "left")
            .join(F.broadcast(kj), p.b == kj.jb, "left")
            .select(
                "a",
                "b",
                F.greatest(
                    F.col("s"),
                    F.least(
                        F.coalesce(F.col("iks"), F.lit(0)),
                        F.coalesce(F.col("kjs"), F.lit(0)),
                    ),
                ).alias("s"),
            )
            .localCheckpoint()  # 20 rows; keeps the unrolled plan O(1)
        )
    p_t = p.select(
        F.col("a").alias("fa"), F.col("b").alias("fb"), F.col("s").alias("sT")
    )
    return (
        prefs.join(p, ["a", "b"])
        .join(p_t, (prefs.a == p_t.fb) & (prefs.b == p_t.fa))
        .select(
            F.col("a").alias("brand_a"),
            F.col("b").alias("brand_b"),
            F.col("d").alias("prefer_a_over_b"),
            F.col("s").cast("long").alias("beatpath_strength"),
            (F.col("s") > F.col("sT")).alias("a_beats_b"),
        )
        .orderBy("brand_a", "brand_b")
    )


# ------------------------------------------------ instant-runoff


@query(
    "election_irv_exhaustive_runoff",
    oracle=f"""
        WITH {_ballots_sql()},
        v1 AS MATERIALIZED (
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS votes
            FROM (SELECT voter, arg_min(brand, rnk) AS brand
                  FROM ballots GROUP BY voter)
            GROUP BY brand
        ), e1 AS MATERIALIZED (
            SELECT brand FROM v1 ORDER BY votes, brand LIMIT 1
        ),
        v2 AS MATERIALIZED (
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS votes
            FROM (SELECT voter, arg_min(brand, rnk) AS brand
                  FROM ballots WHERE brand NOT IN (SELECT brand FROM e1)
                  GROUP BY voter)
            GROUP BY brand
        ), e2 AS MATERIALIZED (
            SELECT brand FROM v2 ORDER BY votes, brand LIMIT 1
        ),
        v3 AS MATERIALIZED (
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS votes
            FROM (SELECT voter, arg_min(brand, rnk) AS brand
                  FROM ballots
                  WHERE brand NOT IN (SELECT brand FROM e1
                                      UNION ALL SELECT brand FROM e2)
                  GROUP BY voter)
            GROUP BY brand
        ), e3 AS MATERIALIZED (
            SELECT brand FROM v3 ORDER BY votes, brand LIMIT 1
        ),
        v4 AS MATERIALIZED (
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS votes
            FROM (SELECT voter, arg_min(brand, rnk) AS brand
                  FROM ballots
                  WHERE brand NOT IN (SELECT brand FROM e1
                                      UNION ALL SELECT brand FROM e2
                                      UNION ALL SELECT brand FROM e3)
                  GROUP BY voter)
            GROUP BY brand
        ), e4 AS MATERIALIZED (
            SELECT brand FROM v4 ORDER BY votes, brand LIMIT 1
        )
        SELECT * FROM (
            SELECT 1 AS round, brand, votes,
                   brand IN (SELECT brand FROM e1) AS eliminated
            FROM v1
            UNION ALL
            SELECT 2, brand, votes,
                   brand IN (SELECT brand FROM e2)
            FROM v2
            UNION ALL
            SELECT 3, brand, votes,
                   brand IN (SELECT brand FROM e3)
            FROM v3
            UNION ALL
            SELECT 4, brand, votes,
                   brand IN (SELECT brand FROM e4)
            FROM v4
        )
        ORDER BY round, brand
    """,
    description="Instant-runoff voting over the 5-brand spend "
    "ballots: four unrolled elimination rounds — count first "
    "preferences among still-active candidates (ranks are unique "
    "per voter, so arg_min/min_by is tie-free by construction), "
    "eliminate the fewest-votes candidate with brand-ASC tie-break, "
    "recount. Every ballot transfers to its next surviving "
    "preference, the defining IRV property; the per-round vote "
    "totals and eliminations are the auditable artifact. Scale "
    "shape: 4 aggregates over the (voter, brand, rank) ballot "
    "relation with the eliminated set as a 0-3-row broadcast "
    "filter; no iteration beyond the fixed unroll.",
)
def election_irv_exhaustive_runoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 4 unrolled rounds re-reference ballots with a different
    # eliminated-set filter each time (no exchange reuse possible), and
    # each round's loser subtree nests every earlier round — one eager
    # localCheckpoint of the (voter, brand, rank) relation makes the
    # fact-scale spend aggregate run exactly once (was ~20s at sf0.01
    # re-deriving it per round/branch).
    ballots = _ballots_df(spark, sf_dir).localCheckpoint()
    elim = None  # 0..3-row DataFrame of eliminated brands, grows per round
    out = None
    for rnd in range(1, 5):
        active = ballots
        if elim is not None:
            active = ballots.join(F.broadcast(elim), "brand", "left_anti")
        votes = (
            active.groupBy("voter")
            .agg(F.expr("min_by(brand, rnk)").alias("brand"))
            .groupBy("brand")
            .agg(F.count(F.lit(1)).cast("long").alias("votes"))
        )
        # 1-row relation, referenced by this round's output AND every
        # later round's eliminated set — eager checkpoint keeps the
        # 4-round unroll's plan linear instead of branch-nested
        # (was 102 KB of plan text).
        loser = (
            votes.orderBy("votes", "brand").limit(1).select("brand")
            .localCheckpoint()
        )
        this_round = votes.join(
            F.broadcast(loser.select(F.col("brand").alias("lb"))),
            votes.brand == F.col("lb"),
            "left",
        ).select(
            F.lit(rnd).cast("int").alias("round"),
            "brand",
            "votes",
            F.col("lb").isNotNull().alias("eliminated"),
        )
        out = this_round if out is None else out.unionAll(this_round)
        elim = loser if elim is None else elim.unionAll(loser)
    return out.orderBy("round", "brand")


# ----------------------------------------- Bradley-Terry MM rounds

_BT_ROUNDS = 3
_BT_S6 = 1_000_000  # micro scale for strengths
_BT_S12 = 1_000_000_000_000


def _bt_mm_sql() -> str:
    parts = [
        f"""q0 AS MATERIALIZED (
            SELECT brand, CAST({_BT_S6} AS HUGEINT) AS p
            FROM (SELECT DISTINCT a AS brand FROM duels)
        )"""
    ]
    for t in range(_BT_ROUNDS):
        parts.append(f"""q{t + 1} AS MATERIALIZED (
            SELECT w.brand,
                   CAST((w.wins * CAST({_BT_S12} AS HUGEINT)) // d.den
                        AS HUGEINT) AS p
            FROM wins w
            JOIN (SELECT m.a AS brand,
                         CAST(SUM((m.n * CAST({_BT_S12} AS HUGEINT))
                                  // (pi.p + pj.p)) AS HUGEINT) AS den
                  FROM duelmat m
                  JOIN q{t} pi ON pi.brand = m.a
                  JOIN q{t} pj ON pj.brand = m.b
                  GROUP BY m.a) d ON d.brand = w.brand
            WHERE d.den > 0
        )""")
    return ", ".join(parts)


@query(
    "eval_bradley_terry_rounds",
    oracle=f"""
        WITH ospend AS MATERIALIZED (
            SELECT l.l_orderkey AS ok, p.p_brand AS brand,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                            * 100) AS BIGINT) AS cents
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand IN {_BRANDS}
            GROUP BY 1, 2
        ), duels AS (
            SELECT s1.brand AS a, s2.brand AS b
            FROM ospend s1
            JOIN ospend s2 ON s2.ok = s1.ok AND s2.brand <> s1.brand
            WHERE s1.cents > s2.cents
        ), wins AS MATERIALIZED (
            SELECT a AS brand, CAST(COUNT(*) AS HUGEINT) AS wins
            FROM duels GROUP BY a
        ), duelmat AS MATERIALIZED (
            SELECT d.a, d.b, CAST(COUNT(*) AS HUGEINT) AS n
            FROM (SELECT a, b FROM duels
                  UNION ALL SELECT b AS a, a AS b FROM duels) d
            GROUP BY d.a, d.b
        ), {_bt_mm_sql()}
        SELECT w.brand,
               CAST(w.wins AS BIGINT) AS wins,
               CAST(q.p AS BIGINT) AS strength_micro,
               CAST(ROW_NUMBER() OVER (ORDER BY q.p DESC, w.brand)
                    AS BIGINT) AS strength_rank
        FROM wins w JOIN q{_BT_ROUNDS} q ON q.brand = w.brand
        ORDER BY w.brand
    """,
    description="Bradley-Terry paired-comparison strengths from "
    "within-order brand duels (the brand with the higher exact line "
    "spend in the same order wins; ties void): the classic "
    "minorization-maximization update p_i' = W_i / sum_j n_ij/(p_i+"
    f"p_j), run for {_BT_ROUNDS} rounds in micro-integer quantized "
    "arithmetic — every division a floor DIV on non-negative "
    "operands with a 1e12 numerator scale, so both engines walk the "
    "identical integer trajectory (the registry's Elo/Katz "
    "quantized-iteration pattern). This is the reward-model-"
    "preference workhorse: converting pairwise preferences into "
    "item strengths. Scale shape: one fact-scale aggregate to "
    "per-(order, brand) spends, an order-keyed self-join bounded at "
    "10 pairs per order, then 3 MM rounds on the broadcast-size "
    "20-row duel matrix.",
)
def eval_bradley_terry_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ospend = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .where(F.col("p_brand").isin(*_BRANDS))
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    s2 = ospend.select(
        F.col("ok").alias("ok2"),
        F.col("brand").alias("brand2"),
        F.col("cents").alias("cents2"),
    )
    duels = ospend.join(
        s2,
        (ospend.ok == s2.ok2)
        & (ospend.brand != s2.brand2)
        & (ospend.cents > s2.cents2),
    ).select(F.col("brand").alias("a"), F.col("brand2").alias("b"))
    # wins (5 rows) and duelmat (20 rows) are referenced inside every
    # MM round; truncate lineage so the fact-scale order-keyed duel
    # self-join runs once instead of 2^rounds times.
    wins = duels.groupBy(F.col("a").alias("brand")).agg(
        F.count(F.lit(1)).cast(_D38).alias("wins")
    ).localCheckpoint()
    duelmat = (
        duels.unionAll(duels.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast(_D38).alias("n"))
        .localCheckpoint()
    )
    p = wins.select("brand", F.lit(_BT_S6).cast(_D38).alias("p"))
    for _ in range(_BT_ROUNDS):
        pi = p.select(F.col("brand").alias("ia"), F.col("p").alias("pi"))
        pj = p.select(F.col("brand").alias("jb"), F.col("p").alias("pj"))
        den = (
            duelmat.join(F.broadcast(pi), duelmat.a == pi.ia)
            .join(F.broadcast(pj), duelmat.b == pj.jb)
            .select(
                "a",
                F.expr(
                    f"CAST((n * CAST({_BT_S12} AS DECIMAL(38,0)))"
                    " DIV (pi + pj) AS DECIMAL(38,0))"
                ).alias("term"),
            )
            .groupBy(F.col("a").alias("brand"))
            .agg(F.sum("term").cast(_D38).alias("den"))
        )
        p = (
            wins.join(F.broadcast(den), "brand")
            .where(F.col("den") > 0)
            .select(
                "brand",
                F.expr(
                    f"CAST((wins * CAST({_BT_S12} AS DECIMAL(38,0)))"
                    " DIV den AS DECIMAL(38,0))"
                ).alias("p"),
            )
        )
    wrank = Window.orderBy(F.col("p").desc(), F.col("brand"))
    return (
        wins.join(p, "brand")
        .select(
            "brand",
            F.col("wins").cast("long").alias("wins"),
            F.col("p").cast("long").alias("strength_micro"),
            F.row_number().over(wrank).cast("long").alias("strength_rank"),
        )
        .orderBy("brand")
    )


# ------------------------------------------- directed SCC (doubling)

_SCC_DOUBLINGS = 5  # covers paths up to 2^5 = 32 > 24 = n-1


def _scc_doubling_sql() -> str:
    parts = [
        """r0 AS MATERIALIZED (
            SELECT u, v FROM edges
            UNION
            SELECT x AS u, x AS v FROM nodes
        )"""
    ]
    for t in range(_SCC_DOUBLINGS):
        parts.append(f"""r{t + 1} AS MATERIALIZED (
            SELECT DISTINCT x.u, y.v
            FROM r{t} x JOIN r{t} y ON y.u = x.v
        )""")
    return ", ".join(parts)


@query(
    "graph_scc_kosaraju_labels",
    oracle=f"""
        WITH trade AS (
            SELECT sn.n_nationkey AS u, cn.n_nationkey AS v,
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
        ), st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(w) AS BIGINT) AS tot
            FROM trade
        ), edges AS MATERIALIZED (
            SELECT u, v FROM trade CROSS JOIN st WHERE w * cnt >= tot
        ), nodes AS MATERIALIZED (
            SELECT DISTINCT x FROM (
                SELECT u AS x FROM edges UNION ALL SELECT v AS x FROM edges
            ) q
        ), {_scc_doubling_sql()}, mutual AS (
            SELECT f.u AS node, MIN(f.v) AS scc_label
            FROM r{_SCC_DOUBLINGS} f
            JOIN r{_SCC_DOUBLINGS} b ON b.u = f.v AND b.v = f.u
            GROUP BY f.u
        ), comp AS (
            SELECT m.node, m.scc_label,
                   CAST(COUNT(*) OVER (PARTITION BY m.scc_label) AS BIGINT)
                       AS scc_size
            FROM mutual m
        )
        SELECT n.n_name,
               CAST(c.scc_label AS BIGINT) AS scc_label,
               c.scc_size,
               c.scc_size = 1 AS is_trivial
        FROM comp c JOIN nation n ON n.n_nationkey = c.node
        ORDER BY n.n_name
    """,
    description="Strongly connected components of the DIRECTED "
    "nation trade graph (edge = supplier nation -> customer nation "
    "kept when its export value is >= the mean edge value): "
    "reachability closure by REPEATED SQUARING — 5 doubling "
    "self-joins cover every path up to length 32 > 24 = the longest "
    "simple path on 25 nodes — then SCC membership is mutual "
    "reachability (forward AND backward), the Kosaraju criterion, "
    "with the component labeled by its minimum nation key. The "
    "registry's undirected connected-components lane can't see "
    "directional structure; this adds the directed notion (trade "
    "cycles vs one-way corridors). Scale shape: one fact-scale "
    "aggregate builds the edge list; the closure runs on a "
    "<= n^2-row broadcast-size relation with a FIXED log(n) job "
    "count — the doubling pattern that keeps 1000-node catalogs at "
    "10 rounds instead of 1000.",
)
def graph_scc_kosaraju_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    trade = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .where(customer.c_nationkey != supplier.s_nationkey)
        .groupBy(
            supplier.s_nationkey.alias("u"), customer.c_nationkey.alias("v")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("w")
        )
    )
    st = trade.agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("w").cast("long").alias("tot"),
    )
    edges = (
        trade.crossJoin(F.broadcast(st))
        .where(F.col("w") * F.col("cnt") >= F.col("tot"))
        .select("u", "v")
    )
    nodes = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .distinct()
    )
    # One eager localCheckpoint after the fact-scale edge build: each
    # doubling round references r twice, so without truncation the
    # logical plan holds 2^5 copies of the 5-table trade aggregate
    # (measured 35-52s at sf0.01 in pure re-planning/re-execution).
    # r is a <= (n^2 + n)-row closure relation — checkpointing it per
    # round keeps the plan O(1) and the fact scan happens exactly once.
    r = (
        edges.unionAll(
            nodes.select(F.col("x").alias("u"), F.col("x").alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    for _ in range(_SCC_DOUBLINGS):
        r2 = r.select(F.col("u").alias("mu"), F.col("v").alias("mv"))
        r = (
            r.join(F.broadcast(r2), r.v == r2.mu)
            .select("u", F.col("mv").alias("v"))
            .distinct()
            .localCheckpoint()
        )
    back = r.select(F.col("u").alias("bu"), F.col("v").alias("bv"))
    mutual = (
        r.join(F.broadcast(back), (r.u == back.bv) & (r.v == back.bu))
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("scc_label"))
    )
    wsz = Window.partitionBy("scc_label")
    comp = mutual.select(
        "node",
        "scc_label",
        F.count(F.lit(1)).over(wsz).cast("long").alias("scc_size"),
    )
    return (
        comp.join(F.broadcast(nation), comp.node == nation.n_nationkey)
        .select(
            "n_name",
            F.col("scc_label").cast("long").alias("scc_label"),
            "scc_size",
            (F.col("scc_size") == 1).alias("is_trivial"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------- Banker's algorithm

_BK_M = 3  # resource kinds (1995 quarters Q1..Q3 drive the matrices)


@query(
    "sched_bankers_algorithm_safety",
    oracle=f"""
        WITH RECURSIVE counts AS (
            SELECT r.r_name, n.n_nationkey AS nk,
                   CAST(EXTRACT(quarter FROM o.o_orderdate) AS BIGINT) AS q,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders o
            JOIN customer cu ON cu.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = cu.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE EXTRACT(year FROM o.o_orderdate) = 1995
              AND EXTRACT(quarter FROM o.o_orderdate) <= {_BK_M}
            GROUP BY 1, 2, 3
        ), spine AS (
            SELECT DISTINCT r_name, nk FROM counts
        ), cells AS (
            SELECT s.r_name, s.nk, q.q,
                   COALESCE(c.c, 0) AS c
            FROM spine s
            CROSS JOIN (SELECT unnest(range(1, {_BK_M} + 1)) AS q) q
            LEFT JOIN counts c
              ON c.r_name = s.r_name AND c.nk = s.nk AND c.q = q.q
        ), proc AS (
            SELECT r_name, nk,
                   list(c % 7 ORDER BY q) AS alloc,
                   list((c // 7) % 4 ORDER BY q) AS need,
                   CAST(SUM(c % 7) AS BIGINT) AS asum,
                   CAST(SUM((c // 7) % 4) AS BIGINT) AS nsum
            FROM cells GROUP BY r_name, nk
        ), packed AS (
            SELECT r_name,
                   list(nk ORDER BY nk) AS nks,
                   list(alloc ORDER BY nk) AS allocs,
                   list(need ORDER BY nk) AS needs,
                   [3 + SUM(asum) % 4,
                    2 + SUM(nsum) % 5,
                    1 + SUM(asum + nsum) % 6] AS avail
            FROM proc GROUP BY r_name
        ), it AS (
            SELECT r_name, nks, allocs, needs, avail,
                   0 AS t, CAST([] AS BIGINT[]) AS seq,
                   [FALSE, FALSE, FALSE, FALSE, FALSE] AS done
            FROM packed
            UNION ALL
            SELECT r_name, nks, allocs, needs,
                   CASE WHEN pick IS NULL THEN avail
                        ELSE [avail[1] + allocs[pick][1],
                              avail[2] + allocs[pick][2],
                              avail[3] + allocs[pick][3]] END,
                   t + 1,
                   CASE WHEN pick IS NULL THEN seq
                        ELSE list_append(seq, nks[pick]) END,
                   CASE WHEN pick IS NULL THEN done
                        ELSE list_transform(range(1, 6),
                             i -> done[i] OR i = pick) END
            FROM (
                SELECT *,
                       CAST(list_filter(range(1, 6),
                            i -> NOT done[i]
                                 AND needs[i][1] <= avail[1]
                                 AND needs[i][2] <= avail[2]
                                 AND needs[i][3] <= avail[3])[1]
                            AS BIGINT) AS pick
                FROM it
            ) WHERE t < 5
        )
        SELECT r_name,
               CAST(len(seq) AS BIGINT) AS n_finished,
               len(seq) = len(nks) AS is_safe,
               COALESCE(list_aggregate(list_transform(seq,
                        x -> CAST(x AS VARCHAR)), 'string_agg', '-'), '')
                   AS safe_sequence,
               CAST(avail[1] AS BIGINT) AS final_avail_1,
               CAST(avail[2] AS BIGINT) AS final_avail_2,
               CAST(avail[3] AS BIGINT) AS final_avail_3
        FROM it WHERE t = 5
        ORDER BY r_name
    """,
    description="Banker's algorithm deadlock-avoidance safety check, "
    "one banker per region: its 5 nations are the processes, with "
    f"{_BK_M} resource kinds whose allocation / additional-need "
    "matrices derive from 1995 quarterly order counts (alloc = c % "
    "7, need = (c DIV 7) % 4) and a data-derived available vector. "
    "The greedy least-index scan — provably complete for Banker's "
    "(any satisfiable process order can be rearranged so the first "
    "runnable process goes first) — is replayed as a grouped "
    "F.aggregate fold over 5 selection steps whose state is "
    "(available vector, done flags, sequence); a region is safe iff "
    "all 5 processes finish. Oracle: DuckDB recursive CTE carrying "
    "identical list state with lambda-filtered candidate picks. "
    "Scale shape: one fact-scale aggregate to (region, nation, "
    "quarter) counts; the fold runs on 5 rows of bounded arrays.",
)
def sched_bankers_algorithm_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    counts = (
        orders.where(
            (F.year("o_orderdate") == 1995)
            & (F.quarter("o_orderdate") <= _BK_M)
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "r_name",
            F.col("n_nationkey").alias("nk"),
            F.quarter("o_orderdate").cast("long").alias("q"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spine = counts.select("r_name", "nk").distinct()
    qs = F.explode(F.sequence(F.lit(1), F.lit(_BK_M))).alias("q")
    cells = (
        spine.select("r_name", "nk", qs)
        .join(counts, ["r_name", "nk", "q"], "left")
        .select(
            "r_name", "nk", "q", F.coalesce("c", F.lit(0).cast("long")).alias("c")
        )
    )
    proc = cells.groupBy("r_name", "nk").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("q", "c"))),
            lambda s: s.getField("c") % 7,
        ).alias("alloc"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("q", "c"))),
            lambda s: (s.getField("c") / 7).cast("long") % 4,
        ).alias("need"),
        F.sum(F.col("c") % 7).cast("long").alias("asum"),
        F.sum((F.col("c") / 7).cast("long") % 4).cast("long").alias("nsum"),
    )
    packed = proc.groupBy("r_name").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("nk", "alloc", "need"))),
            lambda s: s.getField("nk"),
        ).alias("nks"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("nk", "alloc", "need"))),
            lambda s: s.getField("alloc"),
        ).alias("allocs"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("nk", "alloc", "need"))),
            lambda s: s.getField("need"),
        ).alias("needs"),
        F.sum("asum").cast("long").alias("asums"),
        F.sum("nsum").cast("long").alias("nsums"),
    )
    packed = packed.select(
        "r_name",
        "nks",
        "allocs",
        "needs",
        F.array(
            3 + F.col("asums") % 4,
            2 + F.col("nsums") % 5,
            1 + (F.col("asums") + F.col("nsums")) % 6,
        ).alias("avail0"),
    )
    zero = F.struct(
        F.col("avail0").alias("avail"),
        F.array_repeat(F.lit(False), 5).alias("done"),
        F.array().cast("array<bigint>").alias("seq"),
    )

    def step(acc, _):
        avail = acc.getField("avail")
        done = acc.getField("done")
        seq = acc.getField("seq")
        cand = F.filter(
            F.sequence(F.lit(1), F.lit(5)),
            lambda i: (~F.element_at(done, i))
            & (
                F.element_at(F.element_at(F.col("needs"), i), 1)
                <= F.element_at(avail, 1)
            )
            & (
                F.element_at(F.element_at(F.col("needs"), i), 2)
                <= F.element_at(avail, 2)
            )
            & (
                F.element_at(F.element_at(F.col("needs"), i), 3)
                <= F.element_at(avail, 3)
            ),
        )
        pick = F.when(F.size(cand) > 0, F.element_at(cand, 1))
        newavail = F.when(
            pick.isNotNull(),
            F.array(
                F.element_at(avail, 1)
                + F.element_at(F.element_at(F.col("allocs"), pick), 1),
                F.element_at(avail, 2)
                + F.element_at(F.element_at(F.col("allocs"), pick), 2),
                F.element_at(avail, 3)
                + F.element_at(F.element_at(F.col("allocs"), pick), 3),
            ),
        ).otherwise(avail)
        newdone = F.when(
            pick.isNotNull(),
            F.transform(
                F.sequence(F.lit(1), F.lit(5)),
                lambda i: F.element_at(done, i) | (i == pick),
            ),
        ).otherwise(done)
        newseq = F.when(
            pick.isNotNull(),
            F.concat(seq, F.array(F.element_at(F.col("nks"), pick))),
        ).otherwise(seq)
        return F.struct(
            newavail.alias("avail"), newdone.alias("done"), newseq.alias("seq")
        )

    folded = packed.select(
        "r_name",
        F.size("nks").cast("long").alias("n_procs"),
        F.aggregate(F.sequence(F.lit(1), F.lit(5)), zero, step).alias("st"),
    )
    return folded.select(
        "r_name",
        F.size(F.col("st.seq")).cast("long").alias("n_finished"),
        (F.size(F.col("st.seq")) == F.col("n_procs")).alias("is_safe"),
        F.coalesce(
            F.array_join(
                F.transform(F.col("st.seq"), lambda x: x.cast("string")), "-"
            ),
            F.lit(""),
        ).alias("safe_sequence"),
        F.element_at(F.col("st.avail"), 1).cast("long").alias("final_avail_1"),
        F.element_at(F.col("st.avail"), 2).cast("long").alias("final_avail_2"),
        F.element_at(F.col("st.avail"), 3).cast("long").alias("final_avail_3"),
    ).orderBy("r_name")
