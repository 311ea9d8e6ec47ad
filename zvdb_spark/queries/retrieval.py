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
