"""Text-analysis declared queries over the documents table — the
training-data-pipeline text pack (language ID, quality scoring, token
counting, fingerprinting, term stats).

Absent from the reference (vectors only); mandated by the engine's
north star. Everything here is built-in expression work (split /
explode / HOFs / md5) — no Python UDFs — so it all runs inside
whole-stage codegen; at 100 TB the only shuffles are the final
group-bys, which carry (group, partial) rows.

Portable hash convention (used across text/dedup): H(s) = first 15
hex digits of md5(s) as a positive bigint — computable bit-identically
in Spark (``conv(substr(md5(s),1,15),16,10)``) and DuckDB
(``('0x' || substr(md5(s),1,15))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load

# Spark-side portable hash of an SQL expression string.
H_SPARK = "cast(conv(substr(md5({x}),1,15),16,10) as bigint)"


def h_py(s: str) -> int:
    """Driver-side twin of H_SPARK / H_DUCK (first 15 hex digits of
    md5 as a bigint) — the ONE Python definition of the portable
    hash. Used where shard membership must be computed WITHOUT a
    Spark job (the layout's point lookup routes ids to shards
    driver-side) and by every test-side recompute."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
# DuckDB-side twin.
H_DUCK = "('0x' || substr(md5({x}),1,15))::BIGINT"


def checksum_sum(x_sql: str):
    """Overflow-free portable checksum aggregate: sum of H_SPARK over
    rows. Per-row values are < 2^60, so the DECIMAL(38,0) sum never
    overflows at any table size with no entropy-losing modulus (raw
    BIGINT summation overflows under ANSI within ~2^3 rows of the
    max). DuckDB twins need no cast — its BIGINT sum widens to
    HUGEINT. Compare as strings for driver-style exactness."""
    return F.sum(F.expr(H_SPARK.format(x=x_sql)).cast("decimal(38,0)"))

TOP_TERMS = 10

# Marker-word lists for the language-ID heuristic. The synthetic corpus
# shares one vocabulary across langs, so (as with any real lang-ID at
# this granularity) the prediction is a deterministic function of token
# counts — the declared contract is the mechanism, not accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("schnell", "und", "der", "table"),
    "es": ("rapido", "y", "el", "scan"),
    "fr": ("vite", "et", "le", "join"),
    "zh": ("kuai", "he", "de2", "sort"),
}
STOPWORDS = ("the", "a", "and", "of")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents")


@register(
    "q_text_tokens",
    oracle=f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
),
cnt AS (
  SELECT lang, term, count(*) AS n FROM tok GROUP BY lang, term
),
r AS (
  SELECT lang, term, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn
  FROM cnt
)
SELECT lang, term, n, rn FROM r WHERE rn <= {TOP_TERMS}
""",
    tags=("text",),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize -> explode -> term frequency -> top-10 terms per
    language (windowed top-k per group)."""
    d = _docs(spark, sf_dir)
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("term"))
    cnt = tok.groupBy("lang", "term").agg(F.count("*").alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "term")
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_TERMS)
        .select("lang", "term", "n", "rn")
    )


@register(
    "q_text_stats",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       round(sum(len(string_split(text, ' '))) * 1.0 / count(*), 4) AS avg_tokens,
       count(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
""",
    tags=("text",),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per source: docs, chars, tokens, languages —
    exact integer arithmetic end to end."""
    d = _docs(spark, sf_dir)
    ntok = F.size(F.split("text", " "))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(ntok).cast("bigint").alias("total_tokens"),
        F.round(F.sum(ntok) * F.lit(1.0) / F.count("*"), 4).alias("avg_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )


def _lang_score_spark(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"size(filter(tok, t -> t IN ({inlist})))"


def _lang_score_duck(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(tok, t -> t IN ({inlist})))"


_LANGS = tuple(LANG_MARKERS)  # deterministic priority order for ties


def _argmax_case(score_of: dict[str, str]) -> str:
    """CASE picking the first lang (in _LANGS order) achieving the max
    score — identical deterministic tie-break in both engines."""
    greatest = "greatest(" + ", ".join(score_of[lg] for lg in _LANGS) + ")"
    whens = " ".join(
        f"WHEN {score_of[lg]} = {greatest} THEN '{lg}'" for lg in _LANGS
    )
    return f"CASE {whens} END"


@register(
    "q_text_metrics",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, n_chars, text, string_split(text, ' ') AS tok
  FROM documents
),
s AS (
  SELECT doc_id, lang, n_chars, text, tok,
         len(tok) AS n_tokens,
         len(list_distinct(tok)) AS n_distinct,
         len(list_filter(tok, t -> t IN ('the','a','and','of'))) AS n_stop
  FROM t
)
SELECT doc_id,
       lang AS actual_lang,
       {_argmax_case({lg: _lang_score_duck(m) for lg, m in LANG_MARKERS.items()})} AS pred_lang,
       CAST({_lang_score_duck(LANG_MARKERS['en'])} AS BIGINT) AS en_score,
       n_tokens, n_distinct,
       round(n_distinct * 1.0 / n_tokens, 4) AS ttr,
       round(n_chars * 1.0 / n_tokens, 4) AS avg_token_len,
       round(n_stop * 1.0 / n_tokens, 4) AS stopword_ratio,
       round( (n_distinct * 1.0 / n_tokens) * least(1.0, n_tokens / 50.0)
              * (1.0 - n_stop * 1.0 / n_tokens), 4) AS quality_score,
       len(regexp_extract_all(text, '[a-z]+')) AS re_tokens,
       len(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS re_distinct,
       len(regexp_extract_all(text, '[a-z]{{4,}}')) AS long_tokens
FROM s
""",
    tags=("text", "langid", "quality", "tokens"),
)
def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-analysis metrics, one row per doc, three
    families in one pass over the corpus (how a production pipeline
    actually computes them — a single projection, not three scans):

    - language ID: marker-word counts per language, argmax with fixed
      priority tie-break (the shape of an n-gram lang-ID scorer);
    - quality scoring: type-token ratio, length prior, stopword ratio,
      combined deterministic score (the standard cheap quality filter
      for pretraining data);
    - token counting: regex extraction (BPE-ish pre-tokenizer shape),
      distinct and long-token counts; whitespace count = n_tokens.

    All pure HOF/regexp expressions inside one codegen stage."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        "n_chars",
        "text",
        F.split("text", " ").alias("tok"),
    )
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    s = d.select(
        "doc_id",
        "actual_lang",
        "n_chars",
        "text",
        "tok",
        F.size("tok").alias("n_tokens"),
        F.size(F.array_distinct("tok")).alias("n_distinct"),
        F.expr(f"size(filter(tok, t -> t IN ({stop_list})))").alias("n_stop"),
    )
    score_of = {lg: _lang_score_spark(m) for lg, m in LANG_MARKERS.items()}
    ttr = F.col("n_distinct") * 1.0 / F.col("n_tokens")
    stop_ratio = F.col("n_stop") * 1.0 / F.col("n_tokens")
    re_toks = F.expr("regexp_extract_all(text, '[a-z]+', 0)")
    return s.select(
        "doc_id",
        "actual_lang",
        F.expr(_argmax_case(score_of)).alias("pred_lang"),
        F.expr(score_of["en"]).cast("bigint").alias("en_score"),
        "n_tokens",
        "n_distinct",
        F.round(ttr, 4).alias("ttr"),
        F.round(F.col("n_chars") * 1.0 / F.col("n_tokens"), 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(
            ttr * F.least(F.lit(1.0), F.col("n_tokens") / 50.0) * (1.0 - stop_ratio),
            4,
        ).alias("quality_score"),
        F.size(re_toks).alias("re_tokens"),
        F.size(F.array_distinct(re_toks)).alias("re_distinct"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{4,}', 0)")).alias(
            "long_tokens"
        ),
    )


@register(
    "q_text_fingerprint",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(tok)), ' ')) AS set_fingerprint,
       list_reduce(
         list_concat([CAST(0 AS BIGINT)],
                     list_transform(tok, t -> {H_DUCK.format(x='t')} % 2147483647)),
         (acc, x) -> (acc * 31 + x) % 2147483647
       ) AS rolling_hash
FROM t
""",
    tags=("text", "fingerprint"),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-insensitive set fingerprint
    (md5 of sorted distinct tokens — equal for reordered duplicates)
    and an order-sensitive polynomial rolling hash (distinguishes
    them). Together they classify exact-vs-shuffled duplication."""
    d = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("tok"))
    h = H_SPARK.format(x="t")
    return d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("tok")))).alias(
            "set_fingerprint"
        ),
        F.expr(
            f"aggregate(transform(tok, t -> {h} % 2147483647), 0L,"
            " (acc, x) -> (acc * 31 + x) % 2147483647)"
        ).alias("rolling_hash"),
    )
