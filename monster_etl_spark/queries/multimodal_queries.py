"""Multimodal plumbing queries: binary-column feature extraction through
Arrow-batched mapInPandas. The media table is synthesized from documents
(no real blobs ship with the corpus); the decode step is the deterministic
fake (see operators.multimodal), so the byte-level features are
oracle-checkable (byte_crc excluded — DuckDB has no crc32)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from monster_etl_spark.operators.multimodal import documents_as_media, extract_image_features
from monster_etl_spark.queries import QuerySpec, load


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load(spark, sf_dir, "documents"))
    return extract_image_features(media).select("media_id", "n_bytes", "width", "height")


MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       CAST((octet_length(encode(text)) % 640) + 1 AS INT) AS width,
       CAST((octet_length(encode(text)) % 480) + 1 AS INT) AS height
FROM documents
"""


QUERIES = {
    "multimodal_image_features": QuerySpec(
        multimodal_image_features, MULTIMODAL_SQL, "binary column -> mapInPandas features"
    ),
}
