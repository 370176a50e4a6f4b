"""Multimodal plans over binary media columns.

multimodal_meta / media_dedup_census pin the pure-JVM metadata pass
(documents' bytes standing in for media payloads). media_real_decode_
census goes further: it synthesizes REAL PNG files in the executors
(stdlib encoder, multimodal.png_bytes), pushes them through the
Arrow-batched mapInPandas decode path with the REAL header codec
(multimodal.codec_decoder), and hash-checks the recovered dimensions
against an arithmetic oracle — so the driver verifies an actual
image-format round trip, not a fake."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..multimodal import attach_fake_media, codec_decoder, decode_media, media_stats
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


@plan(
    "media_real_decode_census",
    """
    WITH dims AS (
      SELECT doc_id,
             8 + doc_id % 97 AS w,
             8 + doc_id % 53 AS h
      FROM documents
    )
    SELECT CAST(w // 16 AS BIGINT) AS w_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(w * h) AS BIGINT) AS total_pixels,
           CAST(SUM(3) AS BIGINT) AS total_channels,
           CAST(MIN(w) AS BIGINT) AS min_w,
           CAST(MAX(w) AS BIGINT) AS max_w,
           CAST(MIN(h) AS BIGINT) AS min_h,
           CAST(MAX(h) AS BIGINT) AS max_h
    FROM dims
    GROUP BY 1
    ORDER BY w_bucket
    """,
)
def media_real_decode_census(spark, sf_dir):
    """Real image round trip, driver-verified: per document, ENCODE a
    genuine PNG file (stdlib zlib encoder; dims are a pure function of
    doc_id), DECODE it back through the Arrow-batched mapInPandas path
    with the real header codec, and census the recovered dimensions.
    The oracle computes the same dims arithmetically, so a hash match
    proves the PNG bytes really carried the dimensions through
    encode -> binary column -> Arrow batch -> header parse.

    100 TB: embarrassingly parallel map (bytes never shuffle; the only
    exchange carries the 7-row census); Arrow batches bound Python
    memory; this is the exact plumbing a PIL-backed pixel decoder
    inherits by swapping `decoder=`.
    """
    import pandas as pd

    from ..multimodal import png_bytes

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def make(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "id": ids,
                    "content": [
                        png_bytes(8 + int(i) % 97, 8 + int(i) % 53)
                        for i in ids
                    ],
                    "media_type": ["image"] * len(ids),
                }
            )

    media = d.mapInPandas(make, schema="id long, content binary, media_type string")
    decoded = decode_media(media, decoder=codec_decoder)
    return (
        decoded.groupBy(F.expr("width div 16").alias("w_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.sum(F.col("width").cast("bigint") * F.col("height")).alias(
                "total_pixels"
            ),
            F.sum("channels").cast("bigint").alias("total_channels"),
            F.min("width").cast("bigint").alias("min_w"),
            F.max("width").cast("bigint").alias("max_w"),
            F.min("height").cast("bigint").alias("min_h"),
            F.max("height").cast("bigint").alias("max_h"),
        )
        .orderBy("w_bucket")
    )
