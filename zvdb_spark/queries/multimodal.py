"""Multimodal declared queries: binary-column processing through
Arrow-batched mapInPandas (see operators/multimodal.py for the
plumbing and the stubbed codec).

The fake decode is deterministic byte-level feature extraction, so
the *pipeline* — binary encode -> Arrow batch transfer -> Python
feature extraction -> aggregation — is DuckDB-oracle-checked even
though the codec is a stub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zvdb_spark.operators.multimodal import documents_as_media, extract_features
from zvdb_spark.queries.registry import register
from zvdb_spark.sources.tables import load


@register(
    "q_multimodal_features",
    oracle="""
SELECT doc_id AS media_id,
       'text' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
       md5(text) AS payload_md5
FROM documents
""",
    tags=("multimodal",),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload feature extraction via mapInPandas: documents
    viewed as a media table (utf-8 payload + metadata), features
    computed batch-wise in Python over Arrow."""
    media = documents_as_media(load(spark, sf_dir, "documents"))
    return extract_features(media)


@register(
    "q_multimodal_stats",
    oracle="""
SELECT source AS meta_source,
       count(*) AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
       count(DISTINCT md5(text)) AS n_unique_payloads
FROM documents
GROUP BY source
""",
    tags=("multimodal",),
)
def q_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-corpus statistics: per-source byte totals and unique
    payload counts over the extracted features — the
    decode -> aggregate pipeline shape."""
    media = documents_as_media(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    meta = documents_as_media(load(spark, sf_dir, "documents")).select(
        "media_id", "meta_source"
    )
    return (
        feats.join(meta, "media_id")
        .groupBy("meta_source")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.countDistinct("payload_md5").alias("n_unique_payloads"),
        )
    )
