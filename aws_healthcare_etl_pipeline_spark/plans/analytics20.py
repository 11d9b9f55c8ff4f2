"""Wave-39 (round 4): statistics / retrieval / plumbing additions —
Wilson-bound supplier ranking, Zipf rank-frequency, a fixed-weight
linear quality classifier, a Bloom-filter semi-join audit, synchronous
min-label propagation (community detection), an approx-quantile sketch
with a provable exact band, and the REAL (non-fake) image-decode lane
driven end-to-end through mapInPandas with a full DuckDB oracle.

Portability notes follow the registry grammar: integer/md5-derived
arithmetic wherever exactness is load-bearing; doubles only through
single divisions / identically-shaped expression trees; sqrt is the
one libm-class function used (IEEE-mandated correct rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query


# --------------------------------------------------------- Wilson bound

@query(
    "supplier_ontime_wilson_rank",
    oracle="""
        WITH shipped AS (
            SELECT l.l_suppkey AS s_suppkey,
                   CAST(COUNT(*) AS BIGINT) AS n_ship,
                   CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate,
                                               l.l_shipdate) <= 90
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY l.l_suppkey
        ), scored AS (
            SELECT s_suppkey, n_ship, n_ontime,
                   CAST(n_ontime AS DOUBLE) / CAST(n_ship AS DOUBLE)
                       AS ontime_rate,
                   (CAST(n_ontime AS DOUBLE) / CAST(n_ship AS DOUBLE)
                    + 1.96 * 1.96 / (2.0 * CAST(n_ship AS DOUBLE))
                    - 1.96 * sqrt(
                        (CAST(n_ontime AS DOUBLE) / CAST(n_ship AS DOUBLE)
                         * (1.0 - CAST(n_ontime AS DOUBLE)
                                  / CAST(n_ship AS DOUBLE))
                         + 1.96 * 1.96 / (4.0 * CAST(n_ship AS DOUBLE)))
                        / CAST(n_ship AS DOUBLE)))
                   / (1.0 + 1.96 * 1.96 / CAST(n_ship AS DOUBLE))
                       AS wilson_lb
            FROM shipped WHERE n_ship >= 20
        )
        SELECT sc.s_suppkey, s.s_name, sc.n_ship, sc.n_ontime,
               sc.ontime_rate, sc.wilson_lb
        FROM scored sc JOIN supplier s ON sc.s_suppkey = s.s_suppkey
        ORDER BY sc.wilson_lb DESC, sc.s_suppkey
        LIMIT 10
    """,
    description="Top-10 most reliable suppliers by the WILSON SCORE "
    "LOWER BOUND of their 90-day on-time-ship rate (z=1.96) — the "
    "small-sample-correct ranking (a 10/10 supplier must NOT beat a "
    "970/1000 one, which a raw rate does). Portability: the bound is "
    "+,-,*,/ on exact counts plus one sqrt (IEEE correctly rounded), "
    "with the expression tree written identically in both engines, so "
    "every double is bit-identical. Scale: one big-big equi-join "
    "(lineitem x orders on orderkey) feeding a map-side-combined "
    "supplier aggregate, broadcast supplier-dim join, TakeOrdered 10 "
    "— no global sort, no window.",
)
def supplier_ontime_wilson_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    shipped = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_ship"),
            F.sum(
                (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 90)
                .cast("long")
            ).alias("n_ontime"),
        )
        .filter(F.col("n_ship") >= 20)
    )
    nd = F.col("n_ship").cast("double")
    p = F.col("n_ontime").cast("double") / nd
    z = F.lit(1.96)
    wilson = (
        p
        + z * z / (F.lit(2.0) * nd)
        - z
        * F.sqrt(
            (p * (F.lit(1.0) - p) + z * z / (F.lit(4.0) * nd)) / nd
        )
    ) / (F.lit(1.0) + z * z / nd)
    return (
        shipped.withColumn("ontime_rate", p)
        .withColumn("wilson_lb", wilson)
        .join(F.broadcast(supp), "s_suppkey")
        .select(
            "s_suppkey", "s_name", "n_ship", "n_ontime", "ontime_rate", "wilson_lb"
        )
        .orderBy(F.col("wilson_lb").desc(), "s_suppkey")
        .limit(10)
    )


# ----------------------------------------------------- Zipf rank-frequency

@query(
    "text_zipf_rank_frequency",
    oracle="""
        WITH tok AS (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents
        ), freq AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
            FROM tok GROUP BY token
        ), top AS (
            SELECT token, freq,
                   ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
            FROM freq
            ORDER BY freq DESC, token
            LIMIT 20
        )
        SELECT rank, token, freq,
               CAST(rank * freq AS BIGINT) AS zipf_product,
               CAST(freq AS DOUBLE)
                   / CAST(LEAD(freq) OVER (ORDER BY rank) AS DOUBLE)
                   AS ratio_to_next
        FROM top
        ORDER BY rank
    """,
    description="Zipf's-law diagnostic: the 20 most frequent corpus "
    "tokens with rank, frequency, the rank x frequency product (Zipf "
    "predicts ~constant) and the frequency ratio to the next rank — "
    "the standard sanity plot for natural-vs-synthetic corpora before "
    "training. Exact integer counts; the only double is one division "
    "(NULL on the last row). Scale: token-grain map-side-combined "
    "count, TakeOrdered 20, then ranking windows on the bounded "
    "20-row result only.",
)
def text_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = freq.orderBy(F.col("freq").desc(), "token").limit(20)
    w = Window.orderBy(F.col("freq").desc(), "token")  # bounded: 20 rows
    wr = Window.orderBy("rank")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .withColumn("zipf_product", (F.col("rank") * F.col("freq")).cast("bigint"))
        .withColumn(
            "ratio_to_next",
            F.col("freq").cast("double")
            / F.lead("freq").over(wr).cast("double"),
        )
        .select("rank", "token", "freq", "zipf_product", "ratio_to_next")
        .orderBy("rank")
    )


# --------------------------------------------- fixed-weight linear classifier

@query(
    "quality_linear_classifier",
    oracle="""
        WITH feats AS (
            SELECT lang,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                        AS BIGINT) AS n_tok,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
        ), scored AS (
            SELECT lang,
                   1.5 * (CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE))
                       - 0.002 * CAST(n_chars AS DOUBLE) - 5.0 AS score
            FROM feats
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN score > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pass,
               CAST(SUM(CASE WHEN score > 0.0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS pass_rate
        FROM scored
        GROUP BY lang
        ORDER BY lang
    """,
    description="Fixed-weight linear quality classifier over cheap "
    "text features (mean token length, doc length), reported as "
    "per-language pass rates — the distributed-inference shape for "
    "any linear/logistic quality model: weights are plan literals "
    "(broadcast by construction), scoring is one narrow projection, "
    "and the aggregation is map-side combined. No sigmoid: the "
    "decision boundary is sign(w.x + b), identical to the logistic "
    "decision at p=0.5, so no libm exp() enters the plan and the "
    "score expression (identically shaped in both engines) is "
    "bit-deterministic.",
)
def quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    n_chars = F.col("n_chars").cast("bigint")
    feats = docs.select("lang", n_tok.alias("n_tok"), n_chars.alias("n_chars"))
    score = (
        F.lit(1.5)
        * (F.col("n_chars").cast("double") / F.col("n_tok").cast("double"))
        - F.lit(0.002) * F.col("n_chars").cast("double")
        - F.lit(5.0)
    )
    passed = F.sum((score > F.lit(0.0)).cast("long"))
    return (
        feats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            passed.cast("bigint").alias("n_pass"),
            (passed.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "pass_rate"
            ),
        )
        .orderBy("lang")
    )

# ------------------------------------------------ Bloom-filter join audit

_BLOOM_BITS = 1008  # 16 words x 63 usable bits (shift <= 62:
# DuckDB raises on BIGINT 1<<63 while Spark wraps silently — stay
# inside the portable shift domain, same rule as the EWMA weights)
_HASH_OFFSETS = (1, 9, 17)  # 1-based hex offsets, 4 nibbles each


def _sql_hex4(hexcol: str, off: int) -> str:
    """DuckDB: int value of 4 hex chars of ``hexcol`` at 1-based ``off``
    (nibble lookup — DuckDB has no conv())."""
    nibs = [
        f"(strpos('0123456789abcdef', substr({hexcol}, {off + i}, 1)) - 1)"
        for i in range(4)
    ]
    return f"((({nibs[0]} * 16 + {nibs[1]}) * 16 + {nibs[2]}) * 16 + {nibs[3]})"


def _bloom_oracle() -> str:
    mem_pos = " UNION ALL ".join(
        f"SELECT c_custkey, ({_sql_hex4('hx', off)}) % {_BLOOM_BITS} AS pos "
        "FROM mem"
        for off in _HASH_OFFSETS
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT o_custkey, ({_sql_hex4('hx', off)}) % {_BLOOM_BITS} AS pos "
        "FROM probe"
        for off in _HASH_OFFSETS
    )
    return f"""
        WITH mem AS (
            SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS hx
            FROM customer WHERE c_acctbal > 9000
        ), probe AS (
            SELECT DISTINCT o_custkey,
                   md5(CAST(o_custkey AS VARCHAR)) AS hx
            FROM orders
        ), mem_pos AS ({mem_pos}),
        bloom AS (
            SELECT pos // 63 AS word,
                   bit_or(CAST(1 AS BIGINT) << (pos % 63)) AS bits
            FROM mem_pos GROUP BY pos // 63
        ), probe_pos AS ({probe_pos}),
        probe_hits AS (
            SELECT p.o_custkey,
                   CAST(SUM(CASE WHEN
                       (b.bits & (CAST(1 AS BIGINT) << (p.pos % 63))) <> 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
            FROM probe_pos p
            LEFT JOIN bloom b ON p.pos // 63 = b.word
            GROUP BY p.o_custkey
        ), cand AS (
            SELECT o_custkey FROM probe_hits WHERE n_hit = 3
        ), stats AS (
            SELECT
                (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_probed,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM probe
                 JOIN mem ON o_custkey = c_custkey) AS n_true_members,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM cand
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM mem))
                    AS n_false_positives
        )
        SELECT n_probed, n_true_members, n_candidates, n_false_positives,
               CAST(n_false_positives AS DOUBLE)
                   / CAST(n_probed - n_true_members AS DOUBLE) AS fp_rate
        FROM stats
    """


@query(
    "join_bloom_filter_audit",
    oracle=_bloom_oracle(),
    description="Bloom-filter semi-join audit: a 1008-bit (16 x 63 "
    "usable bits per int64 word, shift domain <= 62) / 3-hash Bloom "
    "filter is BUILT over the high-balance customer keys as 16 "
    "int64 words (bit_or aggregate), BROADCAST, and PROBED by the "
    "distinct order custkeys; the result reports measured candidates, "
    "false positives and the fp rate vs the exact semi-join truth — "
    "the audit that decides whether runtime filter pushdown pays "
    "before enabling it fleet-wide. At 100 TB the 128-byte bitmap "
    "prunes the fact scan BEFORE the shuffle join (the same shape "
    "Spark's runtime row-group skipping uses). Hash bits come from "
    "md5 hex substrings — the one cross-engine hash — so build, "
    "probe, and fp counts are bit-identical in both engines; the "
    "only double is the final single division.",
)
def join_bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    mem = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    probe = orders.select("o_custkey").distinct()

    def with_positions(df: DataFrame, key: str) -> DataFrame:
        hx = F.md5(F.col(key).cast("string"))
        pos = F.array(
            *[
                (F.conv(F.substring(hx, off, 4), 16, 10).cast("long")
                 % _BLOOM_BITS)
                for off in _HASH_OFFSETS
            ]
        )
        return df.select(key, F.explode(pos).alias("pos"))

    bloom = (
        with_positions(mem, "c_custkey")
        .groupBy(F.expr("pos div 63").alias("word"))
        .agg(
            F.bit_or(F.expr("shiftleft(cast(1 as bigint), pos % 63)")).alias(
                "bits"
            )
        )
    )
    hits = (
        with_positions(probe, "o_custkey")
        .join(F.broadcast(bloom), F.expr("pos div 63") == F.col("word"), "left")
        .select(
            "o_custkey",
            (
                F.coalesce(
                    F.expr("bits & shiftleft(cast(1 as bigint), pos % 63)"),
                    F.lit(0),
                )
                != 0
            ).cast("long").alias("hit"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("hit").alias("n_hit"))
    )
    cand = hits.filter(F.col("n_hit") == 3).select("o_custkey")
    n_probed = probe.agg(F.count(F.lit(1)).alias("n_probed"))
    n_true = probe.join(
        mem, probe.o_custkey == mem.c_custkey
    ).agg(F.count(F.lit(1)).alias("n_true_members"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_fp = cand.join(
        mem, cand.o_custkey == mem.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_false_positives"))
    return (
        n_probed.crossJoin(n_true).crossJoin(n_cand).crossJoin(n_fp).select(
            "n_probed",
            "n_true_members",
            "n_candidates",
            "n_false_positives",
            (
                F.col("n_false_positives").cast("double")
                / (F.col("n_probed") - F.col("n_true_members")).cast("double")
            ).alias("fp_rate"),
        )
    )


# --------------------------------------- synchronous min-label propagation

def _lpa_oracle(rounds: int = 3) -> str:
    ctes = [
        """co AS (
            SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                   greatest(a.l_suppkey, b.l_suppkey) AS v
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                  WHERE l_partkey < 400) a
            JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                  WHERE l_partkey < 400) b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        )""",
        """sym AS (
            SELECT u AS src, v AS dst FROM co
            UNION ALL SELECT v AS src, u AS dst FROM co
        )""",
        """l0 AS (
            SELECT node, node AS label FROM (
                SELECT u AS node FROM co UNION SELECT v AS node FROM co
            ) n
        )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""l{r} AS (
            SELECT l.node,
                   least(l.label, coalesce(m.nl, l.label)) AS label
            FROM l{r - 1} l
            LEFT JOIN (
                SELECT s.dst, MIN(p.label) AS nl
                FROM sym s JOIN l{r - 1} p ON s.src = p.node
                GROUP BY s.dst
            ) m ON l.node = m.dst
        )"""
        )
    return f"""
        WITH {", ".join(ctes)}
        SELECT CAST(label AS BIGINT) AS community,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM l{rounds}
        GROUP BY label
        ORDER BY community
    """


@query(
    "graph_label_propagation_rounds",
    oracle=_lpa_oracle(3),
    description="Community detection on the co-supply graph via 3 "
    "SYNCHRONOUS rounds of min-label propagation (every node adopts "
    "the minimum of its own and its neighbors' labels): community "
    "label -> member count after round 3. Min-label LPA is the "
    "deterministic member of the LPA family (no tie-breaking "
    "randomness), so the oracle replicates it exactly as 3 chained "
    "CTEs. Scale: each round is one edge-grain equi-join + one "
    "node-grain aggregate — the same bounded-round shape as the "
    "pointer-jumping connected components (operators/clusters.py), "
    "which this complements by exposing the per-round convergence "
    "surface; lineage is flattened by localCheckpoint per round so "
    "iteration count doesn't nest the plan.",
)
def graph_label_propagation_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < 400)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = co.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        co.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    lab = (
        co.select(F.col("u").alias("node"))
        .union(co.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(3):
        nb = (
            sym.join(lab, sym.src == lab.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nl"))
        )
        lab = (
            lab.join(nb, lab.node == nb.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        lab.groupBy(F.col("label").cast("bigint").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("community")
    )

# ------------------------------------- approx quantile with provable band

_AQ_QS = [0.5, 0.9, 0.99]
_AQ_ACC = 1000  # GK accuracy: rank error <= n / _AQ_ACC
_AQ_BAND = 0.02  # exact band half-width (rank fraction), >> 1/_AQ_ACC


def _aq_oracle() -> str:
    qvals = ", ".join(f"({q!r})" for q in _AQ_QS)
    return f"""
        WITH vals AS (
            SELECT event_type,
                   CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT)
                       AS v_cents
            FROM events
        ), counts AS (
            SELECT event_type, v_cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY event_type, v_cents
        ), cum AS (
            SELECT event_type, v_cents, n,
                   SUM(n) OVER (PARTITION BY event_type ORDER BY v_cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS c
            FROM counts
        ), totals AS (
            SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_t
            FROM counts GROUP BY event_type
        ), qs(q) AS (VALUES {qvals}),
        ks AS (
            SELECT event_type, n_t, q,
                   CAST(ceil(q * n_t) AS BIGINT) AS k
            FROM totals, qs
        ), exact AS (
            SELECT k.event_type, k.q,
                   MIN(c.v_cents) AS ex_cents
            FROM ks k JOIN cum c
              ON c.event_type = k.event_type AND c.c >= k.k
            GROUP BY k.event_type, k.q
        )
        SELECT event_type, q,
               CAST(CAST(ex_cents AS DOUBLE) / 100.0 AS DOUBLE)
                   AS exact_value,
               TRUE AS approx_in_band
        FROM exact
        ORDER BY event_type, q
    """


@query(
    "events_approx_quantile_band",
    oracle=_aq_oracle(),
    description=f"Approximate-quantile sketch audit: Spark's "
    f"percentile_approx (Greenwald-Khanna, accuracy {_AQ_ACC}) for "
    f"q in {_AQ_QS} per event type, graded against EXACT quantiles "
    "computed on the aggregated (type x distinct-cents) grain — the "
    "exact value hash-matches the oracle, and approx_in_band "
    "self-grades that the sketch's answer lies between the exact "
    f"q+-{_AQ_BAND} quantiles (provable: GK rank error n/{_AQ_ACC} "
    f"<< {_AQ_BAND}n, and value-rank monotonicity converts the rank "
    "band to a value band — so the boolean is TRUE by theorem, which "
    "is what the oracle pins). Scale: the exact side shuffles only "
    "the distinct-value spine per type (cumulative window on the "
    "aggregated grain, never event rows); the sketch side is one "
    "map-side-mergeable aggregate — the production shape at 100 TB, "
    "with this query as its per-release calibration check.",
)
def events_approx_quantile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    vals = events.select(
        "event_type", (dec("value") * 100).cast("bigint").alias("v_cents")
    )
    counts = vals.groupBy("event_type", "v_cents").agg(
        F.count(F.lit(1)).alias("n")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("c", F.sum("n").over(wcum))
    totals = counts.groupBy("event_type").agg(F.sum("n").alias("n_t"))
    qs = F.array(*[F.lit(q) for q in _AQ_QS])
    ks = totals.select(
        "event_type",
        "n_t",
        F.explode(qs).alias("q"),
    ).withColumn("k", F.ceil(F.col("q") * F.col("n_t")).cast("bigint"))
    exact = (
        ks.alias("k")
        .join(
            cum.alias("c"),
            (F.col("c.event_type") == F.col("k.event_type"))
            & (F.col("c.c") >= F.col("k.k")),
        )
        .groupBy(F.col("k.event_type").alias("event_type"), "q")
        .agg(F.min("v_cents").alias("ex_cents"))
    )
    # band edges for the self-grade: exact values at q +- _AQ_BAND
    k_lo = F.greatest(
        F.ceil((F.col("q") - F.lit(_AQ_BAND)) * F.col("n_t")).cast("bigint"),
        F.lit(1),
    )
    k_hi = F.least(
        F.ceil((F.col("q") + F.lit(_AQ_BAND)) * F.col("n_t")).cast("bigint"),
        F.col("n_t"),
    )
    band_ks = ks.withColumn("k_lo", k_lo).withColumn("k_hi", k_hi)
    lo = (
        band_ks.alias("k")
        .join(
            cum.alias("c"),
            (F.col("c.event_type") == F.col("k.event_type"))
            & (F.col("c.c") >= F.col("k.k_lo")),
        )
        .groupBy(F.col("k.event_type").alias("event_type"), "q")
        .agg(F.min("v_cents").alias("lo_cents"))
    )
    hi = (
        band_ks.alias("k")
        .join(
            cum.alias("c"),
            (F.col("c.event_type") == F.col("k.event_type"))
            & (F.col("c.c") >= F.col("k.k_hi")),
        )
        .groupBy(F.col("k.event_type").alias("event_type"), "q")
        .agg(F.min("v_cents").alias("hi_cents"))
    )
    approx = (
        vals.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "v_cents", [float(q) for q in _AQ_QS], _AQ_ACC
            ).alias("avs")
        )
        .select(
            "event_type",
            F.posexplode("avs").alias("qi", "approx_cents"),
        )
        .withColumn("q", F.element_at(qs, F.col("qi") + 1))
        .drop("qi")
    )
    return (
        exact.join(lo, ["event_type", "q"])
        .join(hi, ["event_type", "q"])
        .join(approx, ["event_type", "q"])
        .select(
            "event_type",
            "q",
            (F.col("ex_cents").cast("double") / F.lit(100.0)).alias(
                "exact_value"
            ),
            (
                (F.col("approx_cents") >= F.col("lo_cents"))
                & (F.col("approx_cents") <= F.col("hi_cents"))
            ).alias("approx_in_band"),
        )
        .orderBy("event_type", "q")
    )


# --------------------------------------------- REAL image decode, end to end

def _decode_oracle() -> str:
    byte_terms = " + ".join(
        f"((strpos('0123456789abcdef', substr(hx, {2 * i + 1}, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(hx, {2 * i + 2}, 1)) - 1))"
        for i in range(16)
    )
    return f"""
        WITH h AS (
            SELECT doc_id, lang, md5(text) AS hx, n_chars FROM documents
        ), k AS (
            SELECT doc_id, lang, CAST({byte_terms} AS BIGINT) AS kk
            FROM h
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) * 75 AS BIGINT) AS payload_bytes,
               CAST(SUM(kk) AS BIGINT) AS sum_bytes,
               CAST(SUM(kk) AS DOUBLE) / CAST(16 * COUNT(*) AS DOUBLE)
                   AS avg_intensity
        FROM k
        GROUP BY lang
        ORDER BY lang
    """


@query(
    "multimodal_real_decode_stats",
    oracle=_decode_oracle(),
    description="The REAL (non-fake) image decode lane, end to end "
    "with a full value oracle: every document is rendered as a valid "
    "binary P5 PGM payload (11-byte header + 64 pixel bytes = the "
    "doc-text md5 repeated 4x), decoded by the pure-Python PNM "
    "decoder inside the Arrow-batched mapInPandas featurizer "
    "(operators/multimodal.py, fake=False), and the decoded mean "
    "intensities aggregate per language. Exactness chain: pixel sum "
    "<= 16320 is exact in double, mean = sum/64 is a power-of-two "
    "division (exact), re-scaling by 16 recovers the integer md5-"
    "byte sum, which the oracle recomputes from the hex digest with "
    "pure string/integer math — so the lane is hash-checked to the "
    "last bit, retiring the r1-r3 'decode is fake-mode only' caveat. "
    "Scale: payload construction and decode are one narrow pass (no "
    "shuffle before the per-lang aggregate); Arrow batches amortize "
    "the Python hop exactly as a Pillow/ffmpeg decoder would.",
)
def multimodal_real_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    md5bin = F.unhex(F.md5(F.encode(F.col("text"), "UTF-8")))
    payload = F.concat(
        F.encode(F.lit("P5\n8 8\n255\n"), "UTF-8"),
        md5bin, md5bin, md5bin, md5bin,
    )
    with_payload = docs.select("doc_id", payload.alias("payload"))
    feats = extract_features(with_payload, fake=False).select(
        "doc_id",
        "n_bytes",
        (F.col("mean_intensity") * 16).cast("bigint").alias("kk"),
    )
    return (
        feats.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("payload_bytes"),
            F.sum("kk").cast("bigint").alias("sum_bytes"),
            (
                F.sum("kk").cast("double")
                / (F.lit(16) * F.count(F.lit(1))).cast("double")
            ).alias("avg_intensity"),
        )
        .orderBy("lang")
    )
