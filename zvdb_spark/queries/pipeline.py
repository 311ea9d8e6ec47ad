"""End-to-end training-data curation pipeline, declared as ONE query.

The individual stages each exist as declared queries (quality metrics:
``queries/text.py:q_text_metrics``; exact dedup: ``dedup.py:
q_doc_dedup``; n-gram near-dup: ``dedup.py:q_dedup_ngram_jaccard``) —
this query is the composition a real pretraining-data pipeline runs,
proving the stages compose inside one Catalyst plan instead of three
disconnected jobs:

    raw documents
      -> per-doc quality metrics (one codegen projection)
      -> quality filter        (n_tokens >= MIN_TOKENS, score >= TAU)
      -> exact-duplicate removal (md5 hash group, keep min doc_id)
      -> near-duplicate removal  (3-gram Jaccard >= 0.8 among
                                  survivors; drop the larger doc_id of
                                  each pair — "keep first" rule)
      -> per-language funnel report

Output: one row per language with the document count surviving each
stage plus final token mass and mean quality — the report a data-prep
team actually reads.

Scale posture: stages 1-3 are a single scan + one shuffle (the md5
window); the near-dup stage is the inverted shingle index join
(PPJoin-style — only shingle-sharing survivor pairs materialize,
``dedup.py:q_dedup_ngram_jaccard``) computed over the ALREADY-pruned
survivor set, so the expensive stage sees quality- and exact-dedup-
reduced data. The funnel flags are computed in one pass (conditional
aggregation), not one job per stage — at 100 TB this is 2 scans of
documents (base + shingles) and small keyed shuffles, no collect.

The query registers past the driver's 50-entry check cap, so its
registered oracle is None (the ordering contract forbids oracled
entries past the cap, tests/test_registry_order.py); the identical
DuckDB twin below is asserted by tests/test_pipeline_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.queries.text import STOPWORDS
from zvdb_spark.sources.tables import load

MIN_TOKENS = 12
QUALITY_TAU = 0.27  # ~p10 of the corpus quality distribution
NGRAM_N = 3
NEARDUP_TAU = 0.8

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

# Quality formula — textually identical arithmetic to
# queries/text.py:q_text_metrics so both engines produce bit-equal
# doubles (same IEEE ops in the same order) and the >= TAU cut can
# never disagree at the boundary.
# NB the D suffixes: in Spark SQL text a bare `1.0` is a DECIMAL
# literal (unlike F.lit(1.0)); decimal arithmetic would both break the
# bit-equality-with-DuckDB argument above and surface as Decimal
# objects in toPandas.
_Q_SPARK = (
    "(n_distinct * 1.0D / n_tokens) * least(1.0D, n_tokens / 50.0D)"
    " * (1.0D - n_stop * 1.0D / n_tokens)"
)
_Q_DUCK = (
    "(n_distinct * 1.0 / n_tokens) * least(1.0, n_tokens / 50.0)"
    " * (1.0 - n_stop * 1.0 / n_tokens)"
)

_SHINGLE_DUCK = " || '_' || ".join(f"tok[i + {j}]" for j in range(NGRAM_N))

PIPELINE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS tok FROM documents
),
s AS (
  SELECT doc_id, lang, text, tok,
         len(tok) AS n_tokens,
         len(list_distinct(tok)) AS n_distinct,
         len(list_filter(tok, t -> t IN ({_STOP_IN}))) AS n_stop
  FROM t
),
m AS (
  SELECT doc_id, lang, text, tok, n_tokens,
         {_Q_DUCK} AS quality,
         (n_tokens >= {MIN_TOKENS} AND {_Q_DUCK} >= {QUALITY_TAU}) AS pass_q
  FROM s
),
-- exact dedup among quality survivors: min passing doc_id per text hash
u AS (
  SELECT *,
         (pass_q AND doc_id = min(CASE WHEN pass_q THEN doc_id END)
                       OVER (PARTITION BY md5(text))) AS is_uniq
  FROM m
),
sh AS (
  -- range() is empty for docs shorter than the shingle width, so no
  -- guard is needed (corpus min length is 10 tokens anyway)
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(tok) - {NGRAM_N - 2}), i -> {_SHINGLE_DUCK})) AS shingles
  FROM u WHERE is_uniq
),
drops AS (
  SELECT DISTINCT sb.doc_id AS doc_id
  FROM sh sa, sh sb
  WHERE sa.doc_id < sb.doc_id
    AND len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
        >= {NEARDUP_TAU}
),
f AS (
  SELECT u.*, (is_uniq AND drops.doc_id IS NULL) AS is_final
  FROM u LEFT JOIN drops ON u.doc_id = drops.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS docs_raw,
       CAST(sum(CASE WHEN pass_q THEN 1 ELSE 0 END) AS BIGINT) AS docs_quality,
       CAST(sum(CASE WHEN is_uniq THEN 1 ELSE 0 END) AS BIGINT) AS docs_unique,
       CAST(sum(CASE WHEN is_final THEN 1 ELSE 0 END) AS BIGINT) AS docs_final,
       CAST(sum(CASE WHEN is_final THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_final,
       round(avg(CASE WHEN is_final THEN quality END), 4) AS avg_quality_final
FROM f GROUP BY lang
"""


@register("q_pipeline_training_data", tags=("pipeline", "dedup", "text"))
def q_pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation funnel (see module docstring): quality
    filter -> exact dedup -> 3-gram near-dup removal -> per-language
    report. One conditional-aggregation pass over flag columns, so
    adding a stage adds a flag, not a job."""
    from zvdb_spark.queries.dedup import _shingles_spark

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", F.split("text", " ").alias("tok")
    )
    s = d.select(
        "doc_id",
        "lang",
        "text",
        F.size("tok").alias("n_tokens"),
        F.size(F.array_distinct("tok")).alias("n_distinct"),
        F.expr(f"size(filter(tok, t -> t IN ({_STOP_IN})))").alias("n_stop"),
    )
    m = s.select(
        "doc_id",
        "lang",
        "text",
        "n_tokens",
        F.expr(_Q_SPARK).alias("quality"),
        (
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.expr(_Q_SPARK) >= QUALITY_TAU)
        ).alias("pass_q"),
    )
    w = Window.partitionBy(F.md5("text"))
    u = m.withColumn(
        "is_uniq",
        F.col("pass_q")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("pass_q"), F.col("doc_id"))).over(w)
        ),
    )
    # Near-dup pairs among unique survivors: inverted shingle index —
    # same formulation as q_dedup_ngram_jaccard, scoped by only_ids so
    # shingles are computed only for surviving rows.
    # survivors scale with the corpus — a forced broadcast here would
    # ship most of the doc_id column to every executor at 100 TB; the
    # equi-join lets AQE pick (it still broadcasts at test scale)
    survivors = u.filter("is_uniq").select("doc_id")
    # checkpoint before the self-join (q_dedup_ngram_jaccard does the
    # same): both join sides otherwise re-execute the whole metrics +
    # window + survivor subtree — measured 8.9 s vs 1.8 s at sf0.1
    sh = _shingles_spark(
        spark, sf_dir, NGRAM_N, only_ids=survivors, broadcast_ids=False
    ).localCheckpoint(eager=True)
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    posts = sh.select("doc_id", F.explode("shingles").alias("s"))
    a = posts.select(F.col("doc_id").alias("id_a"), "s")
    b = posts.select(F.col("doc_id").alias("id_b"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    drops = (
        common.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("szb")),
            "id_b",
        )
        .filter(
            F.col("c") * 1.0 / (F.col("sza") + F.col("szb") - F.col("c"))
            >= NEARDUP_TAU
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    # drops is bounded by the near-dup pair count — usually tiny, but
    # adversarial corpora can make it corpus-sized; AQE sizes the join
    f = u.join(drops, "doc_id", "left").withColumn(
        "is_final", F.col("is_uniq") & F.col("dropped").isNull()
    )
    one_if = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint")  # noqa: E731
    return f.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("docs_raw"),
        one_if("pass_q").alias("docs_quality"),
        one_if("is_uniq").alias("docs_unique"),
        one_if("is_final").alias("docs_final"),
        F.sum(F.when(F.col("is_final"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_final"),
        F.round(
            F.avg(F.when(F.col("is_final"), F.col("quality"))), 4
        ).alias("avg_quality_final"),
    )
