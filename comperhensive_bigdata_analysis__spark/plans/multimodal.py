"""Multimodal plan: the pure-JVM metadata pass over binary media columns
(documents' bytes standing in for media payloads — the container has no
codecs, see multimodal.py). The decode/frame-sample tiers are covered by
tests/test_multimodal.py; this oracle-checked plan pins the binary
plumbing: cast-to-binary, octet_length, md5, modality assignment."""

from __future__ import annotations

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
