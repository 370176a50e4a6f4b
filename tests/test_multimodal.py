"""Multimodal plumbing tests: schemas, determinism, batch behavior of
the decode / frame-sample / stats tiers (codecs are stubbed — the
Spark-side contract is what's under test)."""

from __future__ import annotations

import hashlib

import pytest

from comperhensive_bigdata_analysis__spark.multimodal import (
    attach_fake_media,
    codec_decoder,
    decode_media,
    fake_decoder,
    media_stats,
    sample_frames,
)
from comperhensive_bigdata_analysis__spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(60)
    return attach_fake_media(d, "doc_id", "text").cache()


def test_decode_schema_and_determinism(spark, media):
    out = decode_media(media)
    assert out.schema.simpleString() == (
        "struct<id:bigint,media_type:string,n_bytes:bigint,width:int,"
        "height:int,channels:int,digest:string>"
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, decode_media(media).collect()))
    assert a == b and len(a) == 60
    for r in a:
        assert 64 <= r[3] < 64 + 1024 and 1 <= r[5] <= 4


def test_decode_matches_local_kernel(media):
    row = media.orderBy("id").first()
    meta = fake_decoder(bytes(row["content"]), row["media_type"])
    got = decode_media(media).filter(f"id = {row['id']}").first()
    assert (got["width"], got["height"], got["channels"], got["digest"]) == (
        meta["width"], meta["height"], meta["channels"], meta["digest"]
    )


def test_frame_sampling(media):
    frames = sample_frames(media, n_frames=3).collect()
    n_videos = media.filter("media_type = 'video'").count()
    assert len(frames) == 3 * n_videos
    one = [f for f in frames if f["frame_idx"] == 1][0]
    raw = bytes(
        media.filter(f"id = {one['id']}").first()["content"]
    )
    assert one["frame_digest"] == hashlib.md5(raw + (1).to_bytes(4, "big")).hexdigest()


def test_media_stats_jvm_only(media):
    stats = media_stats(media).collect()
    assert all(r["n_bytes"] > 0 and len(r["digest"]) == 32 for r in stats)


def test_resize_preserves_aspect_and_never_upscales(media):
    from comperhensive_bigdata_analysis__spark.multimodal import resize_media

    rows = resize_media(media, max_dim=256).collect()
    assert len(rows) == 60
    for r in rows:
        assert max(r["target_width"], r["target_height"]) <= 256
        # no upscaling: small media pass through untouched
        if max(r["width"], r["height"]) <= 256:
            assert (r["target_width"], r["target_height"]) == (r["width"], r["height"])
        else:  # aspect preserved within rounding
            ar_in = r["width"] / r["height"]
            ar_out = r["target_width"] / r["target_height"]
            assert abs(ar_in - ar_out) / ar_in < 0.02
        assert r["content"] is not None


def test_feature_extraction_feeds_similarity_tier(spark, media):
    """The multimodal near-dup pipeline: bytes -> unit features ->
    cosine pairs (numpy tier). Duplicate payloads must surface at
    cosine ~1.0."""
    from comperhensive_bigdata_analysis__spark.multimodal import extract_features
    from comperhensive_bigdata_analysis__spark.operators.similarity import (
        cosine_pairs_above_np,
    )

    feats = extract_features(media, dim=16)
    first = feats.first()
    assert len(first["features"]) == 16
    assert abs(sum(x * x for x in first["features"]) - 1.0) < 1e-9  # unit norm

    # duplicate content ids (exact payload copies) must pair at ~1.0
    import pyspark.sql.functions as F

    dup = media.limit(5).select((F.col("id") + 100000).alias("id"),
                                "content", "media_type")
    both = extract_features(media.limit(5).unionByName(dup), dim=16)
    pairs = cosine_pairs_above_np(
        both.select(F.col("id").alias("vec_id"), F.col("features").alias("embedding")),
        threshold=0.999,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(i, i + 100000) for r in media.limit(5).collect() for i in [r["id"]]} <= got


def test_codec_decoder_raises():
    with pytest.raises(NotImplementedError):
        codec_decoder(b"bytes", "image")
