"""Wave-41 (round 5): distribution testing at scale, embedding-metric
evaluation, keyphrase extraction, and audio-style frame windowing —
the second half of the round-5 additions.

Portability notes follow the registry grammar (plans/registry.py).
The KS statistic is the showcase for the cumsum decomposition
(operators/cumsum.py): the oracle keeps the textbook global window,
the Spark side runs bucket partials + bounded-spine carry, and the
hash match proves the decomposition — the running-total pattern
SCALE.md sanctions for entity-grain ordered aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------------------ KS two-sample test

KS_GROUP_A = "1-URGENT"
KS_GROUP_B = "5-LOW"
KS_BAND_CENTS = 1_000_000  # $10k running-total buckets


@query(
    "stat_ks_two_sample",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
                       AS v,
                   CASE WHEN o_orderpriority = '{KS_GROUP_A}'
                        THEN 1 ELSE 0 END AS in1,
                   CASE WHEN o_orderpriority = '{KS_GROUP_B}'
                        THEN 1 ELSE 0 END AS in2
            FROM orders
            WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
        ), grid AS (
            SELECT v, CAST(SUM(in1) AS BIGINT) AS c1,
                   CAST(SUM(in2) AS BIGINT) AS c2
            FROM pts GROUP BY v
        ), cum AS (
            SELECT v,
                   CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
                   CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS f2
            FROM grid
        ), tot AS (
            SELECT CAST(SUM(in1) AS BIGINT) AS n1,
                   CAST(SUM(in2) AS BIGINT) AS n2
            FROM pts
        )
        SELECT n1, n2,
               CAST(MAX(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS d_scaled,
               CAST(MAX(abs(f1 * n2 - f2 * n1)) AS DOUBLE)
                   / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d
        FROM cum, tot
        GROUP BY n1, n2
    """,
    description="Two-sample Kolmogorov-Smirnov statistic between the "
    "URGENT and LOW order-price distributions — the standard "
    "did-the-distribution-shift test for pipeline drift gates. D = "
    "max |F1 - F2| is computed EXACTLY in integers: at every pooled "
    "distinct price, |F1*n2 - F2*n1| (the cross-scaled ECDF gap) is "
    "maximized and divided once at the end. The scale story is the "
    "point: the ECDFs are running counts over the value grain — an "
    "entity-grain ordered aggregate — so the Spark side uses the "
    "distributed_running_total decomposition ($10k price-band bucket "
    "partials + bounded-spine carry + partitioned within-band "
    "windows) while the oracle keeps the textbook single global "
    "window; the hash match PROVES the decomposition. Cross-products "
    "stay int64 through ~2e9 rows per group (cents grain).",
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.filter(
        F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B)
    ).select(
        (dec("o_totalprice") * 100).cast("bigint").alias("v"),
        (F.col("o_orderpriority") == KS_GROUP_A).cast("int").alias("in1"),
        (F.col("o_orderpriority") == KS_GROUP_B).cast("int").alias("in2"),
    )
    grid = pts.groupBy("v").agg(
        F.sum("in1").cast("bigint").alias("c1"),
        F.sum("in2").cast("bigint").alias("c2"),
    )
    banded = grid.withColumn("band", F.expr(f"v div {KS_BAND_CENTS}"))
    zero = F.lit(0).cast("bigint")
    cum = distributed_running_total(
        banded, F.col("c1"), "band", ["v"], "f1", zero=zero
    )
    cum = distributed_running_total(
        cum, F.col("c2"), "band", ["v"], "f2", zero=zero
    )
    tot = pts.agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.sum("in2").cast("bigint").alias("n2"),
    )
    gap = F.abs(
        F.col("f1").cast("bigint") * F.col("n2")
        - F.col("f2").cast("bigint") * F.col("n1")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(F.max(gap).cast("bigint").alias("d_scaled"))
        .select(
            "n1",
            "n2",
            "d_scaled",
            (
                F.col("d_scaled").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("ks_d"),
        )
    )


# ------------------------------------------- triplet-margin audit

TRIPLET_SCALE = 1_048_576  # 2^20 micro-lattice (see emb_kmeans)
TRIPLET_PANEL = 200  # anchor panel target size
_TRIP_DIM = 64


@query(
    "emb_triplet_margin_audit",
    oracle=f"""
        WITH q AS (
            SELECT vec_id, label,
                   list_transform(embedding,
                                  e -> CAST(FLOOR(CAST(e AS DOUBLE)
                                                  * {TRIPLET_SCALE}.0)
                                            AS BIGINT)) AS v
            FROM embeddings
        ), pm AS (
            SELECT GREATEST(CAST(FLOOR(COUNT(*) / {TRIPLET_PANEL}.0)
                                 AS BIGINT), 1) AS panel_mod
            FROM q
        ), anchors AS (
            SELECT vec_id AS a_id, label AS a_label, v AS a_v
            FROM q, pm WHERE vec_id % pm.panel_mod = 0
        ), cand AS (
            SELECT a.a_id, a.a_label, a.a_v,
                   c.vec_id AS c_id, c.v AS c_v,
                   (c.label = a.a_label) AS is_same,
                   md5(CAST(a.a_id AS VARCHAR) || ':'
                       || CAST(c.vec_id AS VARCHAR)) AS hk
            FROM anchors a CROSS JOIN q c
            WHERE c.vec_id <> a.a_id
        ), chosen AS (
            SELECT a_id, a_v, is_same, c_v
            FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY a_id, is_same ORDER BY hk, c_id
                       ) AS rn
                FROM cand
            ) WHERE rn = 1
        ), trip AS (
            SELECT p.a_id,
                   CAST(list_sum(list_transform(range(1, {_TRIP_DIM + 1}),
                        i -> (p.a_v[i] - p.c_v[i]) * (p.a_v[i] - p.c_v[i])))
                        AS BIGINT) AS d2_ap,
                   CAST(list_sum(list_transform(range(1, {_TRIP_DIM + 1}),
                        i -> (n.a_v[i] - n.c_v[i]) * (n.a_v[i] - n.c_v[i])))
                        AS BIGINT) AS d2_an
            FROM chosen p JOIN chosen n ON p.a_id = n.a_id
            WHERE p.is_same AND NOT n.is_same
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triplets,
               CAST(SUM(CASE WHEN d2_ap < d2_an THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pos_closer,
               CAST(SUM(CASE WHEN d2_ap * 110 <= d2_an * 100
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_margin_ok,
               CAST(SUM(CASE WHEN d2_ap < d2_an THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(GREATEST(COUNT(*), 1) AS DOUBLE)
                   AS frac_pos_closer,
               CAST(SUM(CASE WHEN d2_ap * 110 <= d2_an * 100
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(GREATEST(COUNT(*), 1) AS DOUBLE) AS frac_margin_ok
        FROM trip
    """,
    description="Triplet-margin audit of embedding quality: for a "
    f"bounded deterministic anchor panel (~{TRIPLET_PANEL} vectors "
    "via the data-derived modulus, the fixed-size eval-panel "
    "estimator), each anchor draws one same-label positive and one "
    "different-label negative — chosen by md5(anchor:candidate) "
    "argmin, i.e. a deterministic uniform draw with no RNG — and the "
    "audit reports how often d(a,p) < d(a,n) and how often a 10% "
    "relative margin holds. This is the metric-learning health check "
    "run before trusting an embedding column for dedup or retrieval. "
    "Distances live on the 2^20 integer lattice (exact int64, "
    "engine-identical); candidate selection is one broadcast of the "
    "panel against the corpus with a per-(anchor,side) rank-1 window "
    "— partition count 2x panel, never a global window; margin "
    "comparisons are integer cross-multiplications.",
)
def emb_triplet_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda e: F.floor(
                e.cast("double") * F.lit(float(TRIPLET_SCALE))
            ).cast("bigint"),
        ).alias("v"),
    )
    pm = q.agg(
        F.greatest(
            F.floor(F.count(F.lit(1)) / F.lit(float(TRIPLET_PANEL))).cast(
                "bigint"
            ),
            F.lit(1).cast("bigint"),
        ).alias("panel_mod")
    )
    anchors = (
        q.crossJoin(F.broadcast(pm))
        .filter(F.col("vec_id") % F.col("panel_mod") == 0)
        .select(
            F.col("vec_id").alias("a_id"),
            F.col("label").alias("a_label"),
            F.col("v").alias("a_v"),
        )
    )
    # Candidate stream: (anchor x corpus) via broadcast — kept SLIM
    # (ids + md5 key only, never the vectors): the r5 sweep measured
    # exp 1.21 when the rank window shuffled 64-long arrays for every
    # candidate (~4 GB at sf1). The winner per (anchor, side) is a
    # MIN(hk) aggregation instead of a rank window — map-side partials
    # reduce the shuffle to 2 x panel rows — and the winning keys
    # broadcast-join back against a recomputed candidate stream to
    # fetch the single chosen vector per side. The oracle keeps the
    # textbook rank-window form; the hash match proves the
    # decomposition.
    def cand_stream(with_vec: bool):
        cols = [
            "a_id",
            (F.col("c_label") == F.col("a_label")).alias("is_same"),
            F.md5(
                F.concat(
                    F.col("a_id").cast("string"),
                    F.lit(":"),
                    F.col("c_id").cast("string"),
                )
            ).alias("hk"),
        ]
        if with_vec:
            cols += ["a_v", "c_v"]
        return (
            F.broadcast(
                anchors if with_vec
                else anchors.select("a_id", "a_label")
            )
            .crossJoin(
                q.select(
                    F.col("vec_id").alias("c_id"),
                    F.col("label").alias("c_label"),
                    F.col("v").alias("c_v"),
                )
            )
            .filter(F.col("c_id") != F.col("a_id"))
            .select(*cols)
        )

    winners = cand_stream(with_vec=False).groupBy("a_id", "is_same").agg(
        F.min("hk").alias("hk")
    )
    chosen = cand_stream(with_vec=True).join(
        F.broadcast(winners), ["a_id", "is_same", "hk"]
    ).select("a_id", "a_v", "is_same", "c_v")
    d2 = F.aggregate(
        F.zip_with("a_v", "c_v", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pos = chosen.filter(F.col("is_same")).select(
        "a_id", d2.alias("d2_ap")
    )
    neg = chosen.filter(~F.col("is_same")).select(
        "a_id", d2.alias("d2_an")
    )
    trip = pos.join(neg, "a_id")
    closer = (F.col("d2_ap") < F.col("d2_an")).cast("bigint")
    margin = (F.col("d2_ap") * 110 <= F.col("d2_an") * 100).cast("bigint")
    return trip.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triplets"),
        F.sum(closer).cast("bigint").alias("n_pos_closer"),
        F.sum(margin).cast("bigint").alias("n_margin_ok"),
        (
            F.sum(closer).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double")
        ).alias("frac_pos_closer"),
        (
            F.sum(margin).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double")
        ).alias("frac_margin_ok"),
    )


# ------------------------------------------------- RAKE keyphrases

RAKE_STOPWORDS = ("a", "the")
RAKE_TOP = 15


@query(
    "text_rake_keyphrases",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(a) + 1),
                          i -> {{'pos': i, 'tok': a[i]}}),
                          recursive := true)
            FROM (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS a
                FROM documents
            )
        ), marked AS (
            SELECT doc_id, pos, tok,
                   CASE WHEN tok IN {str(tuple(RAKE_STOPWORDS))}
                        THEN 1 ELSE 0 END AS is_stop
            FROM toks
        ), numbered AS (
            SELECT doc_id, pos, tok, is_stop,
                   SUM(is_stop) OVER (
                       PARTITION BY doc_id ORDER BY pos
                   ) AS phrase_id
            FROM marked
        ), words AS (
            SELECT doc_id, phrase_id, pos, tok
            FROM numbered WHERE is_stop = 0
        ), plens AS (
            SELECT doc_id, phrase_id,
                   CAST(COUNT(*) AS BIGINT) AS plen,
                   array_to_string(list(tok ORDER BY pos), ' ') AS phrase
            FROM words GROUP BY doc_id, phrase_id
        ), wstats AS (
            SELECT tok,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(plen) AS BIGINT) AS deg
            FROM words w JOIN plens p USING (doc_id, phrase_id)
            GROUP BY tok
        ), wscore AS (
            SELECT tok,
                   CAST((deg * 1000 - (deg * 1000) % freq) / freq
                        AS BIGINT) AS score_milli
            FROM wstats
        ), pscore AS (
            SELECT p.phrase,
                   CAST(SUM(s.score_milli) AS BIGINT) AS occ_score
            FROM words w
            JOIN plens p USING (doc_id, phrase_id)
            JOIN wscore s USING (tok)
            GROUP BY p.doc_id, p.phrase_id, p.phrase
        )
        SELECT phrase,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MAX(occ_score) AS BIGINT) AS score_milli
        FROM pscore
        GROUP BY phrase
        ORDER BY score_milli DESC, phrase
        LIMIT {RAKE_TOP}
    """,
    description="RAKE keyphrase extraction: token streams split into "
    "candidate phrases at stopword boundaries (running stopword "
    "count per document numbers the runs — a doc-partitioned window, "
    "never global), word degree/frequency statistics over all phrase "
    "occurrences, and phrase scores as the sum of member-word "
    "deg/freq ratios. The ratio is quantized to exact integer "
    "millis (deg*1000 div freq, via the explicit positive-trunc "
    "form) BEFORE summation, so phrase scores are order-insensitive "
    "integer sums — the portability trick that keeps a 'sum of "
    "rationals' ranking engine-exact. Identical phrase text implies "
    "identical score by construction, so the per-phrase rollup "
    "takes MAX. One explode + three grain-reducing shuffles "
    "(phrase, word, phrase-text); top-15 via TakeOrdered.",
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
            "pos0", "tok"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    marked = toks.withColumn(
        "is_stop", F.col("tok").isin(*RAKE_STOPWORDS).cast("int")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    numbered = marked.withColumn("phrase_id", F.sum("is_stop").over(w))
    words = numbered.filter(F.col("is_stop") == 0).select(
        "doc_id", "phrase_id", "pos", "tok"
    )
    plens = words.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase"),
    )
    wstats = (
        words.join(plens, ["doc_id", "phrase_id"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    wscore = wstats.select(
        "tok",
        (
            (F.col("deg") * 1000 - (F.col("deg") * 1000) % F.col("freq"))
            / F.col("freq")
        )
        .cast("bigint")
        .alias("score_milli"),
    )
    pscore = (
        words.join(plens, ["doc_id", "phrase_id"])
        .join(wscore, "tok")
        .groupBy("doc_id", "phrase_id", "phrase")
        .agg(F.sum("score_milli").cast("bigint").alias("occ_score"))
    )
    return (
        pscore.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.max("occ_score").cast("bigint").alias("score_milli"),
        )
        .orderBy(F.col("score_milli").desc(), "phrase")
        .limit(RAKE_TOP)
    )


# --------------------------------------------- audio frame energy

AUDIO_FRAME = 64
AUDIO_HOP = 32
AUDIO_DC = 96  # center the synthetic 32..126 "samples"


@query(
    "multimodal_audio_frame_energy",
    oracle=f"""
        WITH smp AS (
            SELECT doc_id, source,
                   list_filter(
                       list_transform(
                           list_filter(string_split_regex(text, ''),
                                       c -> c <> ''),
                           c -> ascii(c)),
                       s -> s BETWEEN 32 AND 126) AS s
            FROM documents
        ), framed AS (
            SELECT doc_id, source,
                   list_transform(
                       range(0, len(s) - {AUDIO_FRAME} + 1, {AUDIO_HOP}),
                       st -> CAST(list_sum(list_transform(
                                 list_slice(s, st + 1, st + {AUDIO_FRAME}),
                                 x -> (x - {AUDIO_DC}) * (x - {AUDIO_DC})))
                             AS BIGINT)) AS energies
            FROM smp
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(energies)) AS BIGINT) AS n_frames,
               CAST(COALESCE(SUM(list_sum(energies)), 0) AS BIGINT)
                   AS total_energy,
               CAST(MAX(list_max(energies)) AS BIGINT) AS max_energy,
               CAST(COALESCE(SUM(list_sum(energies)), 0) AS DOUBLE)
                   / CAST(GREATEST(SUM(len(energies)), 1) AS DOUBLE)
                   AS mean_frame_energy
        FROM framed
        GROUP BY source
        ORDER BY source
    """,
    description="Audio-style frame windowing over opaque payload "
    f"samples: {AUDIO_FRAME}-sample frames at hop {AUDIO_HOP} with "
    "per-frame energy (sum of squared DC-centered samples) — the "
    "frame/hop algebra every audio featurizer (STFT, mel, VAD) is "
    "built on, exercised end-to-end with a deterministic synthetic "
    "sample stream (character codes) so the oracle can recompute "
    "every frame. All per-frame math runs INSIDE the row via "
    "higher-order array functions — slice/transform/aggregate, no "
    "explode, no shuffle until the final per-source rollup — the "
    "shape that keeps 100 TB of audio a narrow single pass; energies "
    "are exact int64. Short payloads yield zero frames via the "
    "empty-range guard (no descending-sequence footgun).",
)
def multimodal_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    samples = F.filter(
        F.transform(
            F.filter(F.split(F.col("text"), ""), lambda c: c != ""),
            F.ascii,
        ),
        lambda s: (s >= 32) & (s <= 126),
    )
    smp = docs.select("doc_id", "source", samples.alias("s"))
    n = F.size("s")
    starts = F.when(
        n >= AUDIO_FRAME,
        F.sequence(F.lit(0), n - AUDIO_FRAME, F.lit(AUDIO_HOP)),
    ).otherwise(F.array().cast("array<int>"))
    energies = F.transform(
        starts,
        lambda st: F.aggregate(
            F.slice("s", st + 1, F.lit(AUDIO_FRAME)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + (x - AUDIO_DC).cast("bigint") * (x - AUDIO_DC).cast("bigint"),
        ),
    )
    framed = smp.select("doc_id", "source", energies.alias("energies"))
    tot = F.aggregate(
        "energies", F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    per_doc = framed.select(
        "source",
        F.size("energies").cast("bigint").alias("nf"),
        tot.alias("te"),
        F.array_max("energies").alias("me"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nf").cast("bigint").alias("n_frames"),
            F.coalesce(F.sum("te"), F.lit(0)).cast("bigint").alias(
                "total_energy"
            ),
            F.max("me").cast("bigint").alias("max_energy"),
            (
                F.coalesce(F.sum("te"), F.lit(0)).cast("double")
                / F.greatest(F.sum("nf"), F.lit(1)).cast("double")
            ).alias("mean_frame_energy"),
        )
        .orderBy("source")
    )
