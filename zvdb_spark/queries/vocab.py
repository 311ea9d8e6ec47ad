"""Tokenizer-prep declared queries over the documents table:
cross-document duplicated-span removal (the exact-substring dedup of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499 — fixed-stride token spans instead of
suffix-array substrings) and corpus vocabulary construction (the
frequency table a tokenizer trainer consumes).

Absent from the reference (vectors only, ``src/hnsw.zig:12-16``);
part of the LLM-data-pipeline surface the engine adds on top.

Scale posture:

- ``q_dedup_spans``: one projection chunks each document into
  non-overlapping K-token spans with array HOFs (sequence ->
  transform -> slice/array_join — no per-token explode), then ONE
  hash shuffle on the span's portable 60-bit hash decides
  cross-document duplication via a window min/max (no join back, no
  distinct expansion), and ONE doc_id shuffle reassembles the kept
  spans in order. Both shuffles are key-partitioned with no
  broadcast-size assumption, so the plan survives boilerplate-heavy
  corpora where the duplicated-span set is itself huge (the
  filter-then-broadcast-join alternative does not). Shuffling the
  span hash (not the raw text) for the duplication verdict is the
  production shape; the span text rides along only because the same
  row feeds reassembly.
- ``q_vocab_topk``: per-(term, doc) counts with map-side combine,
  then a per-term rollup — the global top-V is a
  TakeOrderedAndProject (never a single-partition window over the
  full vocabulary, which at 100 TB is billions of terms); the rank /
  cumulative-coverage window runs on the V surviving rows only.

All keep/cut decisions are integer arithmetic on the shared portable
md5 hash (``queries/text.py``), so the cut sets and checksums are
bit-identical across engines and partition layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.queries.text import H_DUCK, H_SPARK, checksum_sum
from zvdb_spark.sources.tables import load

SPAN_K = 8  # tokens per span (non-overlapping, stride = K)
TOP_V = 16  # vocabulary rows returned by q_vocab_topk

# Chunk the token array into ceil(n/K) spans of K tokens (last one
# shorter): pure HOFs, zero per-token explode. Spark slice() takes a
# LENGTH and truncates at the array end, so the tail span needs no
# special case.
_SPANS = f"""
transform(
  sequence(1, cast(ceil(size(toks) / {SPAN_K}.0D) as int)),
  i -> array_join(slice(toks, (i - 1) * {SPAN_K} + 1, {SPAN_K}), ' '))
"""

SPANS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
sp AS (
  SELECT doc_id, lang, i AS pos,
         array_to_string(
           toks[(i - 1) * {SPAN_K} + 1 : least(len(toks), i * {SPAN_K})],
           ' ') AS span
  FROM t, unnest(range(1, (len(toks) + {SPAN_K} - 1) // {SPAN_K} + 1)) u(i)
),
m AS (
  SELECT doc_id, lang, pos, span,
         min(doc_id) OVER (PARTITION BY {H_DUCK.format(x="span")})
           <> max(doc_id) OVER (PARTITION BY {H_DUCK.format(x="span")})
           AS is_dup
  FROM sp
),
d AS (
  SELECT doc_id, lang,
         count(*) AS n_spans,
         count(*) FILTER (WHERE is_dup) AS n_cut,
         coalesce(
           string_agg(span, ' ' ORDER BY pos) FILTER (WHERE NOT is_dup),
           '') AS clean
  FROM m GROUP BY 1, 2
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_spans) AS BIGINT) AS spans_total,
       CAST(sum(n_cut) AS BIGINT) AS spans_cut,
       count(*) FILTER (WHERE n_cut > 0) AS docs_touched,
       count(*) FILTER (WHERE n_cut = n_spans) AS docs_emptied,
       coalesce(sum(doc_id) FILTER (WHERE n_cut > 0), 0) AS cut_id_sum,
       CAST(sum({H_DUCK.format(x="clean")}) AS VARCHAR) AS clean_checksum
FROM d GROUP BY lang
"""


@register(
    "q_dedup_spans",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_vocab_queries.py against SPANS_ORACLE
    tags=("dedup", "text", "pipeline"),
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring-style span dedup (Lee et al. 2022): chunk every
    document into non-overlapping K-token spans, cut each span whose
    portable hash occurs in MORE THAN ONE document anywhere in the
    corpus, and reassemble the survivors in order. Per-language
    report: spans cut, documents touched/emptied, the touched-doc
    id-sum, and the reassembled corpus checksum. One span-hash
    shuffle (window min/max — no join back) + one doc_id reassembly
    shuffle."""
    spans = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            "lang",
            F.posexplode(F.expr(_SPANS)).alias("pos", "span"),
        )
        .withColumn("span_h", F.expr(H_SPARK.format(x="span")))
    )
    w = W.partitionBy("span_h")
    marked = spans.withColumn(
        "is_dup", F.min("doc_id").over(w) != F.max("doc_id").over(w)
    )
    kept_sorted = F.array_sort(
        F.collect_list(
            F.when(~F.col("is_dup"), F.struct("pos", "span"))
        )
    )
    docs = marked.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_spans"),
        F.count(F.when(F.col("is_dup"), 1)).alias("n_cut"),
        F.array_join(
            F.transform(kept_sorted, lambda s: s.span), " "
        ).alias("clean"),
    )
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_spans").alias("spans_total"),
        F.sum("n_cut").alias("spans_cut"),
        F.count(F.when(F.col("n_cut") > 0, 1)).alias("docs_touched"),
        F.count(F.when(F.col("n_cut") == F.col("n_spans"), 1)).alias(
            "docs_emptied"
        ),
        F.coalesce(
            F.sum(F.when(F.col("n_cut") > 0, F.col("doc_id"))), F.lit(0)
        ).alias("cut_id_sum"),
        checksum_sum("clean").cast("string").alias("clean_checksum"),
    )


VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
td AS (SELECT term, doc_id, count(*) AS n FROM tok GROUP BY 1, 2),
v AS (
  SELECT term, CAST(sum(n) AS BIGINT) AS cf, count(*) AS df
  FROM td GROUP BY 1
),
tot AS (SELECT sum(cf) AS total_cf FROM v),
top AS (
  SELECT term, cf, df,
         row_number() OVER (ORDER BY cf DESC, term) AS rank
  FROM v ORDER BY cf DESC, term LIMIT {TOP_V}
)
SELECT rank, term, cf, df,
       CAST((sum(cf) OVER (ORDER BY rank) * 1000) // total_cf AS BIGINT)
         AS coverage_pm
FROM top, tot
"""


@register(
    "q_vocab_topk",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_vocab_queries.py against VOCAB_ORACLE
    tags=("text", "pipeline"),
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction (tokenizer prep): per-term collection
    frequency and document frequency, global top-V by frequency with
    a deterministic term tie-break, and the integer cumulative
    corpus-coverage per-mille of each rank prefix. The top-V is a
    TakeOrderedAndProject over the per-term rollup (never a global
    window over the full vocabulary); rank + running coverage are
    windowed over the V surviving rows only."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    )
    v = (
        tok.groupBy("term", "doc_id")
        .agg(F.count("*").alias("n"))
        .groupBy("term")
        .agg(F.sum("n").alias("cf"), F.count("*").alias("df"))
    )
    # sum(cf) over all terms == total token occurrences: one cheap
    # count over the exploded scan instead of re-running the whole
    # two-level groupBy chain a second time
    total = tok.agg(F.count("*").alias("total_cf"))
    top = v.orderBy(F.col("cf").desc(), F.col("term")).limit(TOP_V)
    wr = W.orderBy(F.col("cf").desc(), F.col("term"))
    ranked = top.withColumn("rank", F.row_number().over(wr)).crossJoin(
        F.broadcast(total)
    )
    wc = W.orderBy("rank")
    return ranked.select(
        "rank",
        "term",
        "cf",
        "df",
        F.expr("sum(cf) over (order by rank) * 1000 div total_cf")
        .alias("coverage_pm"),
    ).withColumn("coverage_pm", F.col("coverage_pm").cast("bigint"))
