"""Wave-89 (round 5): optimal prefix codes + ranking stability.

* ``encoding_huffman_5symbol_exact`` — Huffman's greedy merge run
  EXACTLY over the 5-symbol event-type alphabet: the two lightest
  nodes (tie-broken by minimum member symbol, so the tree is unique)
  merge four times, each merge a bounded window-rank + relabel over
  node/membership frames that never exceed the alphabet size; the
  report gives every symbol's optimal code length and the encoded
  size vs the 3-bit fixed-width baseline in integer permille. The
  oracle replays the identical four merges as chained CTEs, so the
  hash match proves the greedy step order. The alphabet is the
  bounded object here — the corpus only contributes exact counts
  through one map-side-combined aggregate, which is why the same
  plan holds at 100 TB.
* ``eval_topk_stability_splithalf`` — split-half reliability of
  top-k token rankings: the corpus is split into two deterministic
  md5 halves, top-k term lists are computed per half, and their
  Jaccard overlap at k = 5/10/20 is reported in integer permille —
  the audit that tells you whether a 'top terms' dashboard reflects
  the corpus or sampling noise (stable rankings agree across
  halves; noise does not).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- Huffman 5-symbol exact

_HUF_FIXED_BITS = 3  # ceil(log2(5)) fixed-width baseline


def _huffman_oracle() -> str:
    steps = []
    for k in range(4):
        steps.append(f"""
        n{k}r AS (
            SELECT nk, w,
                   ROW_NUMBER() OVER (ORDER BY w, nk) AS rk
            FROM n{k}
        ), pick{k} AS (
            SELECT MIN(CASE WHEN rk = 1 THEN nk END) AS k1,
                   MIN(CASE WHEN rk = 2 THEN nk END) AS k2,
                   CAST(SUM(CASE WHEN rk <= 2 THEN w END) AS BIGINT) AS nw
            FROM n{k}r
        ), n{k + 1} AS (
            SELECT r.nk, r.w FROM n{k}r r, pick{k} p WHERE r.rk > 2
            UNION ALL
            SELECT LEAST(p.k1, p.k2) AS nk, p.nw AS w FROM pick{k} p
        ), m{k + 1} AS (
            SELECT CASE WHEN m.nk IN (p.k1, p.k2)
                        THEN LEAST(p.k1, p.k2) ELSE m.nk END AS nk,
                   m.symbol,
                   m.depth + CASE WHEN m.nk IN (p.k1, p.k2)
                             THEN 1 ELSE 0 END AS depth
            FROM m{k} m, pick{k} p
        )""")
    chain = ",".join(steps)
    return f"""
        WITH counts AS (
            SELECT event_type AS symbol,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM events GROUP BY event_type
        ), n0 AS (
            SELECT symbol AS nk, w FROM counts
        ), m0 AS (
            SELECT symbol AS nk, symbol, 0 AS depth FROM counts
        ),{chain},
        tot AS (
            SELECT CAST(SUM(c.w * m.depth) AS BIGINT) AS huff_bits,
                   CAST(SUM(c.w * {_HUF_FIXED_BITS}) AS BIGINT)
                       AS fixed_bits
            FROM m4 m JOIN counts c ON c.symbol = m.symbol
        )
        SELECT m.symbol,
               c.w AS n_events,
               CAST(m.depth AS BIGINT) AS code_len,
               t.huff_bits, t.fixed_bits,
               CAST((t.huff_bits * 1000) // t.fixed_bits AS BIGINT)
                   AS huff_vs_fixed_permille
        FROM m4 m
        JOIN counts c ON c.symbol = m.symbol
        CROSS JOIN tot t
        ORDER BY m.symbol
    """


@query(
    "encoding_huffman_5symbol_exact",
    oracle=_huffman_oracle(),
    description="Exact Huffman code construction over the 5-symbol "
    "event-type alphabet: four greedy merges of the two lightest "
    "nodes (ties broken by minimum member symbol — the tree is "
    "unique, so both engines build the identical code), each merge "
    "a window-rank + relabel over frames bounded by the ALPHABET "
    "size, with per-symbol code lengths accumulating as merge "
    "participation counts; the report compares optimal encoded bits "
    "vs the 3-bit fixed-width baseline in integer permille. The "
    "oracle replays the same four merges as chained CTEs. Scale: "
    "the corpus contributes only exact symbol counts via one "
    "map-side-combined aggregate — the merge cascade is alphabet-"
    "sized (broadcast-tiny) no matter how many events exist, the "
    "production shape for codebook training at 100 TB.",
)
def encoding_huffman_5symbol_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy(F.col("event_type").alias("symbol")).agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    # r12: the 4 unrolled merge rounds as ONE in-row fold over the
    # alphabet-sized array (the markov/DTW lesson applied to the
    # smallest lane member: the r11 form re-ranked + broadcast a
    # 1-row pick per round — 16 Spark jobs for a 5-symbol alphabet).
    # Identical algorithm: sort nodes by (w, nk), merge the two
    # smallest into least(k1,k2) with weight w1+w2, bump member
    # depths; the (w, nk) struct field order makes array_sort the
    # exact window-order replacement.
    row = counts.groupBy().agg(
        F.collect_list(F.struct("symbol", "w")).alias("cells")
    )
    init = F.struct(
        F.transform(
            "cells", lambda c: F.struct(c["w"].alias("w"), c["symbol"].alias("nk"))
        ).alias("nodes"),
        F.transform(
            "cells",
            lambda c: F.struct(
                c["symbol"].alias("nk"),
                c["symbol"].alias("symbol"),
                F.lit(0).alias("depth"),
                c["w"].alias("w"),
            ),
        ).alias("memb"),
    )

    def merge_round(acc, _):
        srt = F.array_sort(acc["nodes"])
        e1 = F.element_at(srt, 1)
        e2 = F.element_at(srt, 2)
        k1, k2 = e1["nk"], e2["nk"]
        nk_new = F.least(k1, k2)
        merged_nodes = F.concat(
            F.slice(srt, 3, F.greatest(F.size(srt) - 2, F.lit(0))),
            F.array(F.struct((e1["w"] + e2["w"]).alias("w"), nk_new.alias("nk"))),
        )
        merged_memb = F.transform(
            acc["memb"],
            lambda m: F.struct(
                F.when((m["nk"] == k1) | (m["nk"] == k2), nk_new)
                .otherwise(m["nk"])
                .alias("nk"),
                m["symbol"].alias("symbol"),
                (
                    m["depth"]
                    + ((m["nk"] == k1) | (m["nk"] == k2)).cast("int")
                ).alias("depth"),
                m["w"].alias("w"),
            ),
        )
        # degenerate (<2 nodes left): nothing to merge, keep acc
        return F.when(
            F.size(acc["nodes"]) >= 2,
            F.struct(merged_nodes.alias("nodes"), merged_memb.alias("memb")),
        ).otherwise(acc)

    fold = F.aggregate(F.sequence(F.lit(1), F.lit(4)), init, merge_round)
    memb = fold["memb"]
    huff_bits = F.aggregate(
        memb,
        F.lit(0).cast("long"),
        lambda a, m: a + m["w"] * m["depth"],
    )
    fixed_bits = F.aggregate(
        memb,
        F.lit(0).cast("long"),
        lambda a, m: a + m["w"] * F.lit(_HUF_FIXED_BITS),
    )
    return (
        row.select(
            F.explode(memb).alias("m"),
            huff_bits.alias("huff_bits"),
            fixed_bits.alias("fixed_bits"),
        )
        .select(
            F.col("m.symbol").alias("symbol"),
            F.col("m.w").alias("n_events"),
            F.col("m.depth").cast("long").alias("code_len"),
            "huff_bits",
            "fixed_bits",
            F.expr("(huff_bits * 1000) div fixed_bits")
            .cast("long")
            .alias("huff_vs_fixed_permille"),
        )
        .orderBy("symbol")
    )


# ------------------------------------- split-half top-k stability

_STAB_KS = (5, 10, 20)


def _stab_oracle() -> str:
    per_k = []
    for k in _STAB_KS:
        per_k.append(f"""
        SELECT CAST({k} AS BIGINT) AS k,
               CAST((SELECT COUNT(*) FROM
                     (SELECT token FROM ranked WHERE half = 0
                      AND rk <= {k}
                      INTERSECT
                      SELECT token FROM ranked WHERE half = 1
                      AND rk <= {k})) AS BIGINT) AS n_common
        """)
    unions = "UNION ALL".join(per_k)
    return f"""
        WITH tok AS (
            SELECT abs(hash_part) % 2 AS half, token FROM (
                SELECT ((strpos('0123456789abcdef',
                         substr(md5('h:' || CAST(doc_id AS VARCHAR)),
                                1, 1)) - 1)) AS hash_part,
                       unnest(list_filter(string_split(trim(text), ' '),
                                          t -> t <> '')) AS token
                FROM documents
            )
        ), freq AS (
            SELECT half, token, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok GROUP BY half, token
        ), ranked AS (
            SELECT half, token,
                   ROW_NUMBER() OVER (PARTITION BY half
                                      ORDER BY n DESC, token) AS rk
            FROM freq
        )
        SELECT k, n_common,
               CAST((n_common * 1000) // (2 * k - n_common) AS BIGINT)
                   AS jaccard_permille
        FROM ({unions}) u
        ORDER BY k
    """


@query(
    "eval_topk_stability_splithalf",
    oracle=_stab_oracle(),
    description="Split-half reliability of top-k token rankings: "
    "documents split into two deterministic md5 halves, per-half "
    "term frequencies rank with (count DESC, token) tiebreaks, and "
    "the two top-k lists' Jaccard overlap is reported in integer "
    "permille at k = 5/10/20 — the sampling-noise audit for any "
    "'top terms' report (a ranking that changes when you halve the "
    "corpus is noise, not signal; overlap decaying with k shows "
    "where the stable head ends). Scale: the token stream carries "
    "its half bit from the doc hash, so both halves aggregate in "
    "ONE map-side-combined pass; per-half ranking is a "
    "WindowGroupLimit top-k, and the overlap joins k-sized lists.",
)
def eval_topk_stability_splithalf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("h:"), F.col("doc_id").cast("string"))),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("long")
            )
            % 2
        ).alias("half"),
        F.explode(
            F.filter(F.split(F.trim(F.col("text")), " "), lambda t: t != "")
        ).alias("token"),
    )
    freq = tok.groupBy("half", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("half").orderBy(F.col("n").desc(), "token")
    ranked = (
        freq.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max(_STAB_KS))
        .localCheckpoint(eager=False)  # k-sized; feeds all three overlaps
    )
    outs = []
    for k in _STAB_KS:
        h0 = ranked.filter(
            (F.col("half") == 0) & (F.col("rk") <= k)
        ).select("token")
        h1 = ranked.filter(
            (F.col("half") == 1) & (F.col("rk") <= k)
        ).select("token")
        common = h0.intersect(h1).agg(
            F.count(F.lit(1)).cast("long").alias("n_common")
        )
        outs.append(
            common.select(
                F.lit(k).cast("long").alias("k"),
                "n_common",
                F.expr(f"(n_common * 1000) div (2 * {k} - n_common)")
                .cast("long")
                .alias("jaccard_permille"),
            )
        )
    return reduce(DataFrame.unionByName, outs).orderBy("k")
