"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pattern (driver-mandated): the engine treats media as `binary` columns
with a metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas iterators over mapInPandas, so bytes never
leave the executor and flow batch-at-a-time (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch, NOT whole-partition
materialization).

The pixel-level codecs (PIL/ffmpeg/librosa) are NOT in this container,
so the decode kernel is pluggable: `fake_decoder` is a deterministic
stand-in (bytes -> pseudo image dims/features from the content hash).
`codec_decoder` IS a real decoder for the DECODE_SCHEMA contract
(width/height/channels/digest): it parses actual PNG / GIF / BMP / JPEG
container headers with the stdlib — the same bytes PIL would decode —
and raises NotImplementedError only for formats it doesn't know, which
is exactly where a pixel codec plugs in. `png_bytes` is a matching
real (zlib+struct) PNG encoder so tests and plans can round-trip real
image files without external packages. Everything Spark-side —
schemas, batching, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Metadata emitted per decoded media object.
DECODE_SCHEMA = (
    "id long, media_type string, n_bytes long, width int, height int, "
    "channels int, digest string"
)

FRAME_SCHEMA = "id long, frame_idx int, frame_digest string"


def attach_fake_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Test/bench helper: wrap an existing column's bytes as a media
    column (id, content binary, media_type). Real pipelines read bytes
    with `spark.read.format('binaryFile')` instead."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).cast("binary").alias("content"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def fake_decoder(content: bytes, media_type: str) -> dict:
    """Deterministic decode stand-in: dims derived from the md5 digest.

    Replace with a real codec via decode_media(..., decoder=...).
    """
    digest = hashlib.md5(content).hexdigest()
    w = 64 + int(digest[:4], 16) % 1024
    h = 64 + int(digest[4:8], 16) % 1024
    ch = 1 + int(digest[8], 16) % 4
    return {"width": w, "height": h, "channels": ch, "digest": digest}


#: PNG color type -> sample channels (greyscale, rgb, palette, ga, rgba)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# JPEG SOF markers that carry frame dimensions (all SOFn except
# DHT/DAC/markers C4, C8, CC).
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def png_bytes(width: int, height: int, rgb: tuple[int, int, int] = (0, 0, 0)) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib+struct): a solid-color
    8-bit RGB image, valid per the PNG spec — PIL/browsers open it.
    Exists so tests and plans can produce genuine image files in a
    container without codec packages."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width  # filter byte 0 + pixels
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def codec_decoder(content: bytes, media_type: str) -> dict:
    """REAL header decode for PNG / GIF87a/89a / BMP / JPEG: parses the
    actual container format for width, height and channel count — the
    full DECODE_SCHEMA contract — using only the stdlib. Pixel-level
    decoding (resampling, frame extraction) still needs PIL/ffmpeg.

    Error contract: NotImplementedError for formats this codec doesn't
    recognize (the plug-in seam for a pixel codec); ValueError for a
    recognized container that is truncated/corrupt — so one bad file in
    a corpus is distinguishable from a missing codec, and
    decode_media(on_error="skip") can drop it instead of failing the
    whole job."""
    digest = hashlib.md5(content).hexdigest()

    def out(w: int, h: int, ch: int) -> dict:
        return {"width": w, "height": h, "channels": ch, "digest": digest}

    try:
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            if content[12:16] != b"IHDR":
                raise ValueError("PNG magic without IHDR chunk")
            w, h = struct.unpack(">II", content[16:24])
            color_type = content[25]
            return out(w, h, _PNG_CHANNELS.get(color_type, 3))
        if content[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", content[6:10])
            return out(w, h, 3)  # palette-expanded RGB
        if content[:2] == b"BM":
            # Match on magic alone so a truncated BMP raises ValueError
            # (the skippable class) via struct.error, not
            # NotImplementedError (reserved for unknown formats).
            w, h = struct.unpack("<ii", content[18:26])
            bpp = struct.unpack("<H", content[28:30])[0]
            return out(w, abs(h), max(1, bpp // 8))
        if content[:2] == b"\xff\xd8":  # JPEG: scan markers for a SOFn
            i = 2
            while i + 9 < len(content):
                if content[i] != 0xFF:
                    i += 1
                    continue
                marker = content[i + 1]
                if marker == 0xFF:
                    i += 1  # 0xFF fill byte (ISO 10918 B.1.1.2 padding)
                    continue
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                    return out(w, h, content[i + 9])
                if marker == 0xD9:  # EOI before any SOF: stop scanning
                    break
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone marker, no length field
                    continue
                seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
                i += 2 + seg_len
            raise ValueError("JPEG without SOF frame header")
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or corrupt media container: {e}") from e
    raise NotImplementedError(
        "unrecognized media format; plug a pixel codec (PIL/ffmpeg) in via "
        "decode_media(..., decoder=...)"
    )


def decode_media(
    media: DataFrame, decoder=fake_decoder, on_error: str = "raise"
) -> DataFrame:
    """(id, content, media_type) -> DECODE_SCHEMA via Arrow-batched
    mapInPandas. One Python worker per partition; bytes stay columnar in
    Arrow buffers between JVM and Python.

    ``on_error``: "raise" (default) fails the job on the first decode
    error — right for curated inputs; "skip" drops undecodable rows —
    right for a crawled 100 TB corpus, where one truncated file must
    not kill a million-task job (count the dropped rows by diffing
    input/output counts)."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def run(batches):
        for pdf in batches:
            rows = {
                "id": [], "media_type": [], "n_bytes": [], "width": [],
                "height": [], "channels": [], "digest": [],
            }
            for i, c, t in zip(pdf["id"], pdf["content"], pdf["media_type"]):
                raw = bytes(c)
                try:
                    m = decoder(raw, t)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                rows["id"].append(i)
                rows["media_type"].append(t)
                rows["n_bytes"].append(len(raw))
                rows["width"].append(m["width"])
                rows["height"].append(m["height"])
                rows["channels"].append(m["channels"])
                rows["digest"].append(m["digest"])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=DECODE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling for "video" rows: frame i digest =
    md5(content || i). Emits n_frames rows per video — the row-explosion
    shape a real frame sampler has, with bounded memory."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            out = {"id": [], "frame_idx": [], "frame_digest": []}
            for i, c in zip(vids["id"], vids["content"]):
                raw = bytes(c)
                for f in range(n_frames):
                    out["id"].append(i)
                    out["frame_idx"].append(f)
                    out["frame_digest"].append(
                        hashlib.md5(raw + f.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "id long, media_type string, width int, height int, "
    "target_width int, target_height int, content binary"
)

FEATURE_SCHEMA = "id long, media_type string, features array<double>"


def resize_media(media: DataFrame, max_dim: int = 256, decoder=fake_decoder) -> DataFrame:
    """Aspect-preserving resize plan: decode dims, scale the long side to
    ``max_dim`` (never upscale), pass bytes through. The scaling math and
    the bytes-in/bytes-out Arrow plumbing are real; only the pixel
    resample is the decoder's concern (deterministic stand-in here, a
    real codec writes re-encoded bytes in its place)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in
                    ("id", "media_type", "width", "height",
                     "target_width", "target_height", "content")}
            for i, c, t in zip(pdf["id"], pdf["content"], pdf["media_type"]):
                raw = bytes(c)
                m = decoder(raw, t)
                w, h = m["width"], m["height"]
                scale = min(1.0, max_dim / max(w, h))
                rows["id"].append(i)
                rows["media_type"].append(t)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["target_width"].append(max(1, round(w * scale)))
                rows["target_height"].append(max(1, round(h * scale)))
                rows["content"].append(raw)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Content-addressed feature vector per media object (deterministic
    md5-expansion stand-in for a real image/audio encoder; unit-norm so
    downstream cosine ops behave). Output plugs STRAIGHT into the
    similarity tier: extract_features -> operators/similarity.py
    cosine_pairs_above_np is the multimodal near-dup pipeline."""
    import math

    import pandas as pd

    def embed(raw: bytes) -> list[float]:
        vals = []
        seed = raw
        while len(vals) < dim:
            seed = hashlib.md5(seed).digest()
            vals.extend(b / 255.0 - 0.5 for b in seed)
        v = vals[:dim]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "features": [embed(bytes(c)) for c in pdf["content"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass (no Python): sizes + digests via builtins.
    This is the fast path for anything that doesn't need decoding."""
    return media.select(
        "id",
        "media_type",
        F.octet_length("content").alias("n_bytes"),
        F.md5("content").alias("digest"),
    )
