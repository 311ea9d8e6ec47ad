"""Dataset-construction declared queries: deterministic stratified
sampling (mixture weighting) and sequence packing — the two ops that
turn a curated corpus into a training dataset.

The reference has no notion of either (its only read is k-NN search,
``src/hnsw.zig:194``); these belong to the LLM-data-pipeline surface
the engine adds on top. Both are built on the portable md5 hash
(queries/text.py:H_SPARK / H_DUCK), so the SAMPLE ITSELF — not just
its size — is bit-identical in the DuckDB oracle and independent of
partitioning, cluster size, and row order.

Scale posture:

- Stratified sampling is a pure per-row filter (hash < rate·M) plus
  one aggregation — no shuffle before the agg, no rand() (rand(seed)
  is partition-layout-dependent; the hash is not), no per-stratum
  count pass. Changing mixture weights re-evaluates one predicate
  over the scan.
- Sequence packing partitions the corpus into hash buckets and packs
  WITHIN each bucket independently: the window cumsum runs per
  bucket (never a global total order — a windowed cumsum without a
  partition key is a single task at any scale), so packing
  parallelism = bucket count and sequence ids are (bucket, seq)
  pairs. Greedy-contiguous semantics: documents in deterministic
  hash order are concatenated and cut every SEQ_TOKEN_BUDGET tokens;
  a document belongs to the sequence its first token falls in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zvdb_spark.queries.registry import register
from zvdb_spark.queries.text import H_DUCK, H_SPARK
from zvdb_spark.sources.tables import load

# Mixture weights: fraction of each stratum kept (training-mixture
# shape: upweight scarce languages, downsample the dominant one).
SAMPLE_RATES: dict[str, float] = {
    "en": 0.30,
    "de": 0.80,
    "fr": 0.80,
    "es": 0.60,
    "zh": 0.50,
}
DEFAULT_RATE = 0.25
_RATE_M = 10_000  # rate resolution: hash % M < rate * M

SEQ_TOKEN_BUDGET = 512  # tokens per packed sequence
N_PACK_BUCKETS = 8  # independent packing streams


def _rate_case_duck() -> str:
    whens = " ".join(
        f"WHEN lang = '{k}' THEN {int(v * _RATE_M)}"
        for k, v in sorted(SAMPLE_RATES.items())
    )
    return f"CASE {whens} ELSE {int(DEFAULT_RATE * _RATE_M)} END"


def _rate_col_spark():
    c = None
    for k, v in sorted(SAMPLE_RATES.items()):
        thr = F.lit(int(v * _RATE_M))
        c = F.when(F.col("lang") == k, thr) if c is None else c.when(
            F.col("lang") == k, thr
        )
    return c.otherwise(F.lit(int(DEFAULT_RATE * _RATE_M)))


_H_ID_SPARK = H_SPARK.format(x="cast(doc_id as string)")
_H_ID_DUCK = H_DUCK.format(x="doc_id::VARCHAR")

STRATIFIED_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang,
         {_H_ID_DUCK} % {_RATE_M} AS h,
         {_rate_case_duck()} AS thr
  FROM documents
)
SELECT lang,
       count(*) AS n_total,
       count(*) FILTER (WHERE h < thr) AS n_kept,
       coalesce(sum(doc_id) FILTER (WHERE h < thr), 0) AS kept_id_sum
FROM d GROUP BY lang
"""


@register(
    "q_sample_stratified",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_pipeline_queries.py against STRATIFIED_ORACLE
    tags=("sampling", "pipeline"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample (training-mixture weighting):
    keep a doc iff portable_hash(doc_id) % M < rate(lang)·M. One
    predicate over the scan — no rand(), no shuffle, no per-stratum
    count pass — and the kept SET is pinned cross-engine by the
    per-stratum id-sum checksum, not just its size."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.expr(_H_ID_SPARK) % _RATE_M).alias("h"),
        _rate_col_spark().alias("thr"),
    )
    kept = F.col("h") < F.col("thr")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.coalesce(
            F.sum(F.when(kept, F.col("doc_id"))), F.lit(0)
        ).alias("kept_id_sum"),
    )


PACKING_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS tok,
         {_H_ID_DUCK} AS h
  FROM documents
),
b AS (SELECT doc_id, tok, h, h % {N_PACK_BUCKETS} AS bucket FROM d),
c AS (
  SELECT bucket, doc_id, tok,
         coalesce(sum(tok) OVER (
           PARTITION BY bucket ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_excl
  FROM b
),
s AS (
  SELECT bucket, doc_id, tok,
         cum_excl // {SEQ_TOKEN_BUDGET} AS seq_id
  FROM c
)
SELECT bucket, seq_id,
       count(*) AS n_docs,
       sum(tok) AS seq_tokens,
       min(doc_id) AS first_doc
FROM s GROUP BY bucket, seq_id
"""


@register(
    "q_pack_sequences",
    oracle=None,  # past the driver cap; DuckDB parity via
    # tests/test_pipeline_queries.py against PACKING_ORACLE
    tags=("sampling", "pipeline"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-contiguous sequence packing: hash-bucket the corpus
    into N_PACK_BUCKETS independent streams, order each stream
    deterministically by the portable hash, and cut the concatenated
    token stream every SEQ_TOKEN_BUDGET tokens (a doc belongs to the
    sequence its first token falls in). The window cumsum is
    PARTITIONED by bucket — packing parallelism scales with bucket
    count and no global total order ever exists. Returns per
    (bucket, seq_id) composition."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("tok"),
        F.expr(_H_ID_SPARK).alias("h"),
    )
    b = d.withColumn("bucket", F.col("h") % N_PACK_BUCKETS)
    w = (
        W.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    s = b.withColumn(
        "cum_excl", F.coalesce(F.sum("tok").over(w), F.lit(0))
    ).withColumn(
        "seq_id",
        F.floor(F.col("cum_excl") / SEQ_TOKEN_BUDGET).cast("long"),
    )
    return s.groupBy("bucket", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
    )
