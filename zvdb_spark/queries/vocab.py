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


# --------------------------- overlapping-stride span dedup variant

SPAN_STRIDE = 4  # window start stride s < K: catches offset duplicates

def spans_stride_oracle(k: int = SPAN_K, s: int = SPAN_STRIDE) -> str:
    """DuckDB twin of span_dedup_stride at (k, s)."""
    return f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
w AS (
  SELECT doc_id, i AS start,
         array_to_string(toks[i : i + {k - 1}], ' ') AS span
  FROM t, unnest(range(1, len(toks) - {k} + 2, {s})) u(i)
),
m AS (
  SELECT doc_id, start,
         min(doc_id) OVER (PARTITION BY {H_DUCK.format(x="span")})
           <> max(doc_id) OVER (PARTITION BY {H_DUCK.format(x="span")})
           AS is_dup
  FROM w
),
f AS (
  SELECT doc_id, list(start) FILTER (WHERE is_dup) AS ds
  FROM m GROUP BY 1
),
d AS (
  SELECT t.doc_id, t.lang, toks, len(toks) AS n_toks,
         list_filter(
           range(1, len(toks) + 1),
           p -> len(list_filter(coalesce(ds, []),
                                st -> p >= st AND p < st + {k})) = 0
         ) AS kept_pos
  FROM t LEFT JOIN f ON t.doc_id = f.doc_id
),
e AS (
  SELECT doc_id, lang, n_toks,
         n_toks - len(kept_pos) AS toks_cut,
         coalesce(array_to_string(
           list_transform(kept_pos, p -> toks[p]), ' '), '') AS clean
  FROM d
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS toks_total,
       CAST(sum(toks_cut) AS BIGINT) AS toks_cut,
       count(*) FILTER (WHERE toks_cut > 0) AS docs_touched,
       count(*) FILTER (WHERE toks_cut = n_toks) AS docs_emptied,
       coalesce(sum(doc_id) FILTER (WHERE toks_cut > 0), 0) AS cut_id_sum,
       CAST(sum({H_DUCK.format(x="clean")}) AS VARCHAR) AS clean_checksum
FROM e GROUP BY lang
"""


def span_dedup_stride(
    spark: SparkSession, sf_dir: str, k: int = SPAN_K, s: int = SPAN_STRIDE
) -> DataFrame:
    """Overlapping-window span dedup: K-token windows starting every
    ``s`` tokens (s < K), a window is cut when its hash occurs in more
    than one document, and every token covered by ANY cut window is
    removed (the union of flagged positions). Catches passages
    duplicated at a cross-document offset delta that is a multiple of
    s — stride s=K/2 halves the escape classes of the non-overlapping
    chunking; s=1 is Lee et al.'s any-position substring semantics at
    K/s = K times the window rows.

    Same plan spine as q_dedup_spans: per-row HOF window generation,
    ONE span-hash shuffle (window min/max, no join back on the hash),
    then — because overlapping windows cannot reassemble from span
    text — one key-partitioned doc_id join of the (small) flagged-
    start lists back to the corpus and a per-row HOF position cut.
    The flagged-start join carries only cut documents and makes no
    broadcast-size assumption, so a boilerplate-heavy corpus where
    most docs are touched still key-partitions cleanly.

    Docs shorter than K tokens emit no windows and are never cut
    (whole-short-doc duplicates are the exact pass's job)."""
    if not 1 <= s <= k:
        raise ValueError(f"stride must be in [1, k]; got s={s}, k={k}")
    # Read twice (window generation + reassembly) as two parquet
    # scans rather than a localCheckpoint: materializing the
    # tokenized corpus to executor disk costs ~corpus size, while a
    # second pruned scan is nearly free — the right trade at 100 TB.
    # The SECOND independent load() (fresh lineage) is what severs
    # the self-join ambiguity; deriving `reread` from `base` would
    # raise AMBIGUOUS_SELF_JOIN at the reassembly join.
    base = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    reread = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    # full K-token windows only: floor((n-K)/s)+1 starts; the CASE
    # guards sequence() from its descending-on-negative trap
    windows = f"""
    CASE WHEN size(toks) >= {k} THEN
      transform(
        sequence(1, cast((size(toks) - {k}) / {s} as int) + 1),
        i -> struct(
          (i - 1) * {s} + 1 AS start,
          array_join(slice(toks, (i - 1) * {s} + 1, {k}), ' ') AS span))
    ELSE cast(array() as array<struct<start:int, span:string>>) END
    """
    wins = (
        base.select("doc_id", F.explode(F.expr(windows)).alias("w"))
        .select("doc_id", "w.start", "w.span")
        .withColumn("span_h", F.expr(H_SPARK.format(x="span")))
    )
    wd = W.partitionBy("span_h")
    flagged = (
        wins.withColumn(
            "is_dup", F.min("doc_id").over(wd) != F.max("doc_id").over(wd)
        )
        .filter(F.col("is_dup"))
        .groupBy("doc_id")
        .agg(F.collect_list("start").alias("ds"))
    )
    cut = (
        reread.join(flagged, "doc_id", "left")
        .withColumn(
            "ds", F.coalesce("ds", F.expr("cast(array() as array<int>)"))
        )
        .withColumn(
            "kept_pos",
            F.expr(
                f"filter(sequence(1, size(toks)),"
                f" p -> NOT exists(ds, st -> p >= st AND p < st + {k}))"
            ),
        )
        .select(
            "doc_id",
            "lang",
            F.size("toks").alias("n_toks"),
            (F.size("toks") - F.size("kept_pos")).alias("toks_cut"),
            F.expr(
                "array_join(transform(kept_pos,"
                " p -> element_at(toks, p)), ' ')"
            ).alias("clean"),
        )
    )
    return cut.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("toks_total"),
        F.sum("toks_cut").alias("toks_cut"),
        F.count(F.when(F.col("toks_cut") > 0, 1)).alias("docs_touched"),
        F.count(F.when(F.col("toks_cut") == F.col("n_toks"), 1)).alias(
            "docs_emptied"
        ),
        F.coalesce(
            F.sum(F.when(F.col("toks_cut") > 0, F.col("doc_id"))), F.lit(0)
        ).alias("cut_id_sum"),
        checksum_sum("clean").cast("string").alias("clean_checksum"),
    )


@register(
    "q_dedup_spans_stride",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_vocab_queries.py against spans_stride_oracle()
    tags=("dedup", "text", "pipeline"),
)
def q_dedup_spans_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_spans with overlapping stride-s windows (s=K/2): cuts
    the union of token positions covered by any cross-document
    duplicated K-window, catching passages the aligned chunking
    misses when documents share text at a K/2-offset. See
    span_dedup_stride for the plan shape."""
    return span_dedup_stride(spark, sf_dir)


@register(
    "q_dedup_spans_s1",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_vocab_queries.py (spans_stride_oracle(k, 1))
    tags=("dedup", "text", "pipeline"),
)
def q_dedup_spans_s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-offset span dedup: stride s=1 emits a K-window at EVERY
    token position, so a cross-document duplicated passage is caught
    at any alignment — Lee et al. 2022's substring-match semantics
    (their suffix array realizes it in O(n); here it costs K times
    the non-overlapping window rows, all still one span-hash
    shuffle). The measured cost vs the s=K/2 default is published in
    SCALING.md — s=1 is the adversarial-boilerplate setting, s=K/2
    the throughput default."""
    return span_dedup_stride(spark, sf_dir, s=1)


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
    return ranked.select(
        "rank",
        "term",
        "cf",
        "df",
        F.expr("sum(cf) over (order by rank) * 1000 div total_cf")
        .alias("coverage_pm"),
    ).withColumn("coverage_pm", F.col("coverage_pm").cast("bigint"))
