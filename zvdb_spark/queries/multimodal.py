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
       CAST(CASE WHEN octet_length(encode(text)) = 0 THEN -1
                 ELSE ascii(text) END AS INT) AS first_cp,
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
    decode -> aggregate pipeline shape. ONE scan: the grouping
    metadata rides through the feature extractor (``carry``) instead
    of a second documents scan joined back on media_id (the r12
    review's plan note)."""
    media = documents_as_media(load(spark, sf_dir, "documents"))
    feats = extract_features(media, carry=("meta_source",))
    return (
        feats.groupBy("meta_source")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.countDistinct("payload_md5").alias("n_unique_payloads"),
        )
    )


@register(
    "q_multimodal_resize",
    oracle="""
SELECT doc_id AS media_id,
       8 AS width, 8 AS height,
       CAST(64 AS BIGINT) AS n_resized_check
FROM documents
""",
    tags=("multimodal",),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: every payload normalized to an 8x8 byte buffer in
    mapInPandas. Declared check: output size is constant (the oracle
    verifies the row set and the fixed 64-byte contract)."""
    from zvdb_spark.operators.multimodal import resize_batch

    media = documents_as_media(load(spark, sf_dir, "documents"))
    out = resize_batch(media, 8, 8)
    return out.select(
        "media_id",
        "width",
        "height",
        F.octet_length("resized").cast("bigint").alias("n_resized_check"),
    )


@register(
    "q_multimodal_frames",
    # byte-exact twin of the mapInPandas sampler: DuckDB cannot slice
    # BLOBs directly, so slice the hex encoding (2 chars/byte) and
    # zero-pad — '00' per padding byte == rpad '0' in whole bytes
    oracle="""
SELECT d.doc_id AS media_id,
       CAST(f.frame_idx AS INT) AS frame_idx,
       CAST(16 AS BIGINT) AS frame_bytes,
       upper(rpad(substring(
           hex(encode(d.text)),
           CAST((f.frame_idx * greatest(octet_length(encode(d.text)), 1)) // 4
                AS BIGINT) * 2 + 1,
           32), 32, '0')) AS frame_hex
FROM documents d
CROSS JOIN (SELECT unnest(range(4)) AS frame_idx) f
""",
    tags=("multimodal",),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1:N flatMap through Arrow): 4 fixed-size
    evenly-offset frames per payload, zero-padded at the tail. The
    frame CONTENT is oracle-checked via its hex encoding, so the
    1:N Arrow flatMap itself — offsets, padding, row fan-out — is
    verified byte-exactly, not just counted."""
    from zvdb_spark.operators.multimodal import sample_frames

    media = documents_as_media(load(spark, sf_dir, "documents"))
    return sample_frames(media, n_frames=4, frame_size=16).select(
        "media_id",
        "frame_idx",
        F.octet_length("frame").alias("frame_bytes"),
        F.upper(F.hex("frame")).alias("frame_hex"),
    )
