"""Multimodal plan: the pure-JVM metadata pass over binary media columns
(documents' bytes standing in for media payloads — the container has no
codecs, see multimodal.py). The decode/frame-sample tiers are covered by
tests/test_multimodal.py; this oracle-checked plan pins the binary
plumbing: cast-to-binary, octet_length, md5, modality assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..multimodal import attach_fake_media, media_stats
from ..sources.tables import load_table
from . import plan


@plan(
    "multimodal_meta",
    """
    SELECT doc_id AS id,
           (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest
    FROM documents
    ORDER BY id
    """,
)
def multimodal_meta(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(d, "doc_id", "text")
    return media_stats(media).orderBy("id")


@plan(
    "media_dedup_census",
    """
    WITH media AS (
      SELECT doc_id AS id,
             (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS media_type,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS digest
      FROM documents
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique,
           CAST(COUNT(*) - COUNT(DISTINCT digest) AS BIGINT) AS n_dups,
           CAST(COUNT(*) - COUNT(DISTINCT digest) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
    FROM media
    GROUP BY 1
    ORDER BY media_type
    """,
)
def media_dedup_census(spark, sf_dir):
    """Per-modality payload dedup census over the binary media column:
    item/byte totals, distinct content digests, duplicate ratio.

    The storage-planning companion to multimodal_meta — exact dedup on
    binary payloads is a digest aggregate (md5 JVM-side, no Python, no
    byte shuffling beyond the hash). 100 TB: map-side digest + partial
    distinct, 3 groups out.
    """
    d = load_table(spark, sf_dir, "documents")
    stats = media_stats(attach_fake_media(d, "doc_id", "text"))
    return (
        stats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.countDistinct("digest").cast("bigint").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("digest"))
            .cast("bigint")
            .alias("n_dups"),
            (
                (F.count(F.lit(1)) - F.countDistinct("digest")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_ratio"),
        )
        .orderBy("media_type")
    )
