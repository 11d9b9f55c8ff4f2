"""Wave-213b (round 9, part 3): dedup survivorship accounting, CIDR
route aggregation, FILTER-clause aggregate semantics, tokenizer
vocabulary coverage, and the ERR cascade retrieval metric.

Same discipline as parts 1-2 ([EXT]; the reference's only query is
README.md:98-101). Notable shapes: the CIDR supernet aggregation is
fully DECLARATIVE (per-level completeness group-bys — no iteration),
and ERR's cascade products stay EXACT by folding the integer
numerators (16 - x_i) and deferring the single dyadic division to the
end of each rank term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.clusters import connected_components
from ..operators.dedup import ngram_jaccard_pairs
from ..sources.tables import load_table
from .llm_dedup import _sql_corpus_shingles, _sql_jaccard_pairs, perturbed_corpus
from .registry import query

# ----------------------------- near-dup cluster survivor accounting


@query(
    "dedup_cluster_survivor_accounting",
    oracle=f"""
        WITH RECURSIVE {_sql_corpus_shingles(5)},
        pairs AS MATERIALIZED (
            {_sql_jaccard_pairs(0.5, lang_blocked=True)}
        ),
        e AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
        nodes AS (SELECT DISTINCT a AS id FROM e),
        reach(src, dst) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
        ),
        comp AS (SELECT src AS doc_id, MIN(dst) AS component
                 FROM reach GROUP BY src),
        sized AS (
            SELECT c.doc_id, c.component, corpus.lang,
                   len(array_to_string(corpus.toks, ' ')) AS n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.component
                       ORDER BY len(array_to_string(corpus.toks, ' '))
                                DESC, c.doc_id) AS rk
            FROM comp c JOIN corpus ON corpus.doc_id = c.doc_id
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_clustered_docs,
               CAST(COUNT(DISTINCT component) AS BIGINT) AS n_clusters,
               CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END)
                    AS BIGINT) AS chars_dropped
        FROM sized
        GROUP BY lang ORDER BY lang
    """,
    description="The pipeline step AFTER near-dup pair generation: "
    "exact 5-gram Jaccard pairs (PPJoin, lossless, lang-blocked) form "
    "clusters via min-label connected components, each cluster keeps "
    "ONE survivor by the quality rule (longest text, doc_id "
    "tie-break), and the per-language report accounts docs retained "
    "vs dropped and the bytes the dedup saves — the retention ledger "
    "every corpus-dedup run ships with. The oracle rebuilds "
    "components with a recursive-CTE closure over the same exact "
    "ground-truth pairs and applies the identical survivor rule. "
    "Scale: pair generation is the prefix-filtered PPJoin (bounded "
    "candidate buckets); label propagation runs log(diameter) "
    "rounds on the PAIR graph (tiny vs corpus); accounting is one "
    "group-by.",
)
def dedup_cluster_survivor_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    corpus = perturbed_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        corpus, "text", "doc_id", block_cols=["lang"],
        shingle_size=5, threshold=0.5,
    )
    comp = connected_components(pairs)
    # mirror the oracle's normalized length: chars of the lowered
    # token join (corpus text is already the token source)
    from ..functions.text import tokens

    sized = comp.join(
        corpus.select(
            F.col("doc_id").alias("node"),
            "lang",
            F.length(
                F.concat_ws(" ", tokens(F.lower(F.col("text"))))
            ).alias("n_chars"),
        ),
        "node",
    )
    rk = F.row_number().over(
        Window.partitionBy("component").orderBy(
            F.desc("n_chars"), F.col("node")
        )
    )
    return (
        sized.withColumn("rk", rk)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clustered_docs"),
            F.count_distinct("component").cast("long").alias("n_clusters"),
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.sum(F.when(F.col("rk") > 1, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_dropped"),
        )
        .orderBy("lang")
    )


# ------------------------------------ CIDR supernet aggregation

_CIDR_MIN_LEN = 17  # aggregate /24s up to at most /17


@query(
    "net_cidr_supernet_aggregation",
    oracle=f"""
        WITH r24 AS MATERIALIZED (
            SELECT DISTINCT
                   (10 * 65536 + (user_id // 256) % 256 * 256
                    + user_id % 256) AS p
            FROM events
        ), lv AS (
            SELECT * FROM (VALUES (17),(18),(19),(20),(21),(22),(23),(24))
                   t(k)
        ), blocks AS (
            SELECT k, p >> (24 - k) AS blk,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM r24 CROSS JOIN lv
            GROUP BY 1, 2
        ), complete AS (
            SELECT k, blk FROM blocks WHERE n = (1 << (24 - k))
        ), assigned AS (
            SELECT p, MIN(k) AS k_star
            FROM (SELECT p, k, p >> (24 - k) AS blk
                  FROM r24 CROSS JOIN lv) e
            JOIN complete USING (k, blk)
            GROUP BY p
        )
        SELECT CAST(k_star AS BIGINT) AS prefix_len,
               CAST(COUNT(DISTINCT p >> (24 - k_star)) AS BIGINT)
                   AS n_routes,
               CAST(COUNT(*) AS BIGINT) AS n_slash24_covered
        FROM assigned
        GROUP BY 1 ORDER BY prefix_len
    """,
    description="CIDR route-table compression: the distinct /24 "
    "prefixes derived from event user ids aggregate into the LARGEST "
    f"fully-populated supernet (down to /{_CIDR_MIN_LEN}) — a /k "
    "block replaces its children iff all 2^(24-k) /24s exist, and "
    "each /24 reports the smallest such k (completeness at k implies "
    "completeness at every deeper level, so min-k is the maximal "
    "aggregation). Fully DECLARATIVE: one distinct, an 8-level "
    "completeness group-by, a containment join — no iteration, no "
    "driver loop; the per-length route counts mirror what a BGP "
    "aggregator would advertise. Integer bit arithmetic throughout.",
)
def net_cidr_supernet_aggregation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    r24 = (
        ev.select(
            F.expr(
                "10 * 65536 + (user_id div 256) % 256 * 256 + user_id % 256"
            ).alias("p")
        )
        .distinct()
        # domain-bounded reduction (<= 65536 prefixes), two consumers
        .localCheckpoint(eager=False)
    )
    lv = spark.range(_CIDR_MIN_LEN, 25).select(
        F.col("id").cast("int").alias("k")
    )
    expanded = r24.crossJoin(F.broadcast(lv)).select(
        "p", "k", F.expr("shiftright(p, 24 - k)").alias("blk")
    )
    blocks = expanded.groupBy("k", "blk").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    complete = blocks.where(F.expr("n = shiftleft(1, 24 - k)")).select(
        "k", "blk"
    )
    # equi-join on (k, blk): hash-partitionable, never a nested loop
    assigned = (
        expanded.join(complete, ["k", "blk"])
        .groupBy("p")
        .agg(F.min("k").alias("k_star"))
    )
    return (
        assigned.groupBy(F.col("k_star").cast("long").alias("prefix_len"))
        .agg(
            F.count_distinct(F.expr("shiftright(p, 24 - k_star)"))
            .cast("long")
            .alias("n_routes"),
            F.count(F.lit(1)).cast("long").alias("n_slash24_covered"),
        )
        .orderBy("prefix_len")
    )


# ------------------------------- FILTER-clause aggregate semantics


@query(
    "sql_agg_filter_clause_battery",
    oracle="""
        SELECT l_returnflag AS flag,
               CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
               CAST(COUNT(*) FILTER (WHERE l_discount >= 0.05)
                    AS BIGINT) AS n_discounted,
               CAST(SUM(CAST(l_quantity AS BIGINT))
                    FILTER (WHERE l_quantity > 25) AS BIGINT)
                   AS bulk_qty,
               CAST(SUM(CAST(l_quantity AS BIGINT))
                    FILTER (WHERE l_quantity > 100) AS BIGINT)
                   AS impossible_sum,
               CAST(COUNT(*) FILTER (WHERE l_quantity > 100) AS BIGINT)
                   AS impossible_count,
               bool_and(l_quantity >= 1) AS every_pos,
               bool_or(l_quantity > 49) AS some_huge
        FROM lineitem
        GROUP BY 1 ORDER BY flag
    """,
    description="FILTER-clause / conditional-aggregate semantics "
    "battery: count_if vs COUNT FILTER, SUM FILTER over a non-empty "
    "predicate, and the edge the battery exists for — an "
    "always-empty FILTER must yield NULL for SUM but 0 for COUNT "
    "(the ANSI distinction engines get wrong when rewriting to CASE "
    "WHEN with a 0 default). every()/some() round out the boolean "
    "aggregates. One fact group-by; all integer.",
)
def sql_agg_filter_clause_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.expr("count_if(l_quantity > 25)").cast("long").alias("n_bulk"),
            F.expr("count(*) FILTER (WHERE l_discount >= 0.05)")
            .cast("long")
            .alias("n_discounted"),
            F.expr(
                "sum(CAST(l_quantity AS BIGINT))"
                " FILTER (WHERE l_quantity > 25)"
            ).cast("long").alias("bulk_qty"),
            F.expr(
                "sum(CAST(l_quantity AS BIGINT))"
                " FILTER (WHERE l_quantity > 100)"
            ).cast("long").alias("impossible_sum"),
            F.expr("count(*) FILTER (WHERE l_quantity > 100)")
            .cast("long")
            .alias("impossible_count"),
            F.expr("every(l_quantity >= 1)").alias("every_pos"),
            F.expr("some(l_quantity > 49)").alias("some_huge"),
        )
        .orderBy("flag")
    )


# ------------------------------------ tokenizer vocabulary coverage

_OOV_TRAIN_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_OOV_VOCAB = 200


@query(
    "text_vocab_coverage_oov",
    oracle=f"""
        WITH toks AS (
            SELECT source, t.word
            FROM (
                SELECT source,
                       regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM documents
            ), UNNEST(ws) AS t(word)
            WHERE t.word <> ''
        ), vocab AS MATERIALIZED (
            SELECT word FROM (
                SELECT word, COUNT(*) AS c FROM toks
                WHERE source IN {_OOV_TRAIN_SOURCES!r}
                GROUP BY 1 ORDER BY c DESC, word LIMIT {_OOV_VOCAB}
            )
        )
        SELECT t.source AS source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) FILTER (WHERE v.word IS NULL)
                    AS BIGINT) AS n_oov,
               CAST(COUNT(*) FILTER (WHERE v.word IS NULL) * 10000
                    // COUNT(*) AS BIGINT) AS oov_bp
        FROM toks t LEFT JOIN vocab v ON v.word = t.word
        GROUP BY t.source ORDER BY source
    """,
    description="Tokenizer-vocabulary coverage audit: the top-"
    f"{_OOV_VOCAB} words of the designated training sources "
    f"{_OOV_TRAIN_SOURCES} form the vocab; every source then reports "
    "its out-of-vocabulary token count and rate (basis points, "
    "integer) — the number that decides whether a tokenizer trained "
    "on one slice transfers to the rest of the corpus. Scale: one "
    "token-count shuffle builds the bounded vocab; coverage is a "
    "broadcast join against it — the fact relation never shuffles "
    "twice.",
)
def text_vocab_coverage_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("word")
    ).where(F.col("word") != "")
    vocab = (
        toks.where(F.col("source").isin(*_OOV_TRAIN_SOURCES))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "word")
        .limit(_OOV_VOCAB)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.expr(
                "sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)"
                " * 10000 div count(*)"
            ).cast("long").alias("oov_bp"),
        )
        .orderBy("source")
    )


# ------------------------------------------ ERR cascade metric

_ERR_K = 10


@query(
    "search_err_cascade_metric",
    oracle=f"""
        WITH ranked AS (
            SELECT p_brand,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_brand
                       ORDER BY rev DESC, p_partkey) AS r,
                   (strpos('0123456789abcdef',
                           substr(md5('err:' || CAST(p_partkey AS VARCHAR)),
                                  1, 1)) - 1) % 4 AS g
            FROM (
                SELECT p.p_brand, p.p_partkey,
                       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                                * 100) AS BIGINT) AS rev
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                GROUP BY 1, 2
            )
        ), arr AS (
            SELECT p_brand,
                   list((1 << CAST(g AS INTEGER)) - 1 ORDER BY r) AS xs
            FROM ranked WHERE r <= {_ERR_K}
            GROUP BY p_brand
        )
        SELECT p_brand,
               CAST(len(xs) AS BIGINT) AS k,
               CAST(list_sum(list_transform(range(1, len(xs) + 1),
                   r -> CAST(floor(
                       CAST(list_reduce(
                           list_prepend(CAST(1 AS BIGINT),
                               list_transform(xs[1:r-1],
                                   x -> CAST(16 - x AS BIGINT))),
                           (a, b) -> a * b) AS DOUBLE)
                       * xs[r]
                       / (CAST(r AS DOUBLE)
                          * CAST(CAST(1 AS BIGINT) << (4 * r) AS DOUBLE))
                       * 1e15) AS BIGINT))) AS BIGINT) AS err_p15
        FROM arr
        ORDER BY p_brand
    """,
    description="Expected Reciprocal Rank (the cascade click model) "
    f"for each brand's revenue-ranked top-{_ERR_K} parts with "
    "md5-derived relevance grades g in 0..3: R_r = (2^g - 1)/16, "
    "ERR = sum_r (1/r) R_r prod_i<r (1 - R_i). The cascade products "
    "fold the INTEGER numerators (16 - x_i) exactly (HUGEINT / "
    "BIGINT), defer the single dyadic division 16^r to one double op "
    "per rank, and floor-quantize each term at 1e-15 — the chi2 "
    "lesson: never round doubles through decimal casts cross-engine. "
    "Scale: one fact join + group-by; the per-brand cascade is a "
    "bounded 10-element array fold.",
)
def search_err_cascade_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,2)") * 100
            ).cast("long").alias("rev")
        )
    )
    x = F.expr(
        "shiftleft(1, CAST((instr('0123456789abcdef',"
        " substr(md5(concat('err:', CAST(p_partkey AS STRING))), 1, 1))"
        " - 1) % 4 AS INT)) - 1"
    )
    ranked = rev.select(
        "p_brand",
        F.row_number()
        .over(
            Window.partitionBy("p_brand").orderBy(
                F.desc("rev"), "p_partkey"
            )
        )
        .alias("r"),
        x.alias("x"),
    ).where(F.col("r") <= _ERR_K)
    arr = ranked.groupBy("p_brand").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("r", "x"))),
            lambda s: s.getField("x"),
        ).alias("xs")
    )
    # per-rank term: prefix product of (16 - x_i) is an exact integer
    # fold; one double division by (r * 16^r); floor-quantize at 1e-15
    term = F.transform(
        F.col("xs"),
        lambda x, i: F.floor(
            F.aggregate(
                F.slice(F.col("xs"), 1, i),
                F.lit(1).cast("long"),
                lambda acc, e: acc * (16 - e).cast("long"),
            ).cast("double")
            * x
            / (
                # r * 16^r as one exact long (shiftleft's numBits must
                # be a Python int, so 16^r is a fold too: init 16, one
                # *16 per prefix element -> 16^(i+1))
                (i + 1).cast("long")
                * F.aggregate(
                    F.slice(F.col("xs"), 1, i),
                    F.lit(16).cast("long"),
                    lambda acc, e: acc * 16,
                )
            ).cast("double")
            * F.lit(1e15)
        ).cast("long"),
    )
    return arr.select(
        "p_brand",
        F.size("xs").cast("long").alias("k"),
        F.aggregate(
            term, F.lit(0).cast("long"), lambda a, b: a + b
        ).alias("err_p15"),
    ).orderBy("p_brand")
