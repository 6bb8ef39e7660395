"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery here is REAL and tested — schema, partitioning,
Arrow-batched mapInPandas signatures, batch shaping. The default decode is
also real for image CONTAINERS: `parse_image_dims` reads PNG (IHDR chunk),
JPEG (SOF marker scan), and GIF (logical screen descriptor) dimensions in
pure Python — no image library needed — and `decode_image_meta` applies it
to any blob that isn't one of testgen's deterministic fake headers. Only
PIXEL decode (full raster, needed for model-grade features/resize) is out
of scope without libjpeg/PIL; `extract_features`' default decoder instead
computes header dims + byte-histogram features, and callers can inject a
real pixel decoder where one exists.

At 100 TB: media bytes dominate row size, so the layout rules are
  * binary payload in its own column, metadata in typed columns → metadata
    predicates push down to parquet without touching bytes (column pruning);
  * repartition by content-hash bucket before any UDF stage so batches are
    size-balanced (a few 100 MB videos can't skew one task);
  * mapInPandas streams Arrow batches — bounded memory per task regardless
    of blob sizes; never collect() media to the driver.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fake header: magic(4s) kind(B) width(H) height(H) n_frames(H) sample_rate(I)
# NOTE: format string, not struct.Struct — Struct objects don't cloudpickle
# into mapInPandas closures.
_FMT = "<4sBHHHI"
_HEADER_SIZE = struct.calcsize(_FMT)
MAGIC = b"TSMM"
KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


# -- real image-container header parsing (pure Python, no image libs) --------


def _png_dims(b: bytes) -> tuple[int, int] | None:
    """PNG: 8-byte signature, then the IHDR chunk MUST be first (PNG spec
    §11.2.2): 4-byte length, 'IHDR', width u32 BE, height u32 BE."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        if w > 0 and h > 0:
            return w, h
    return None


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """JPEG: walk the marker segments from SOI to the first SOFn
    (0xC0-0xCF minus DHT/JPG/DAC) and read the frame header's
    height/width u16 BE at offsets 3/5 past the segment length. Handles
    0xFF fill bytes and payload-less markers (RSTn, SOI, TEM); stops at
    SOS — a stream with entropy data before any SOF has no parseable
    dims."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(b)
    while i < n:
        if b[i] != 0xFF:
            return None
        while i < n and b[i] == 0xFF:  # fill bytes
            i += 1
        if i >= n:
            return None
        marker = b[i]
        i += 1
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue  # TEM / SOI / RSTn carry no length
        if i + 2 > n:
            return None
        seglen = int.from_bytes(b[i : i + 2], "big")
        if seglen < 2 or i + seglen > n:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seglen >= 7:
                h = int.from_bytes(b[i + 3 : i + 5], "big")
                w = int.from_bytes(b[i + 5 : i + 7], "big")
                if w > 0 and h > 0:
                    return w, h
            return None
        if marker == 0xDA:  # SOS before any SOF
            return None
        i += seglen
    return None


def _gif_dims(b: bytes) -> tuple[int, int] | None:
    """GIF87a/89a: logical screen descriptor width/height u16 LE at 6/8."""
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        if w > 0 and h > 0:
            return w, h
    return None


def parse_image_dims(b: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) for real PNG/JPEG/GIF bytes, else None.
    Pure-Python container parsing — the default decoder of
    decode_image_meta / extract_features for blobs that aren't testgen's
    fake TSMM headers."""
    d = _png_dims(b)
    if d:
        return ("png", *d)
    d = _jpeg_dims(b)
    if d:
        return ("jpeg", *d)
    d = _gif_dims(b)
    if d:
        return ("gif", *d)
    return None


def pack_fake_media(media_id: str, kind: int, width: int, height: int, n_frames: int, sr: int) -> bytes:
    """Deterministic fake media blob (testgen side)."""
    body = (media_id * 8).encode()[:64]
    return struct.pack(_FMT, MAGIC, kind, width, height, n_frames, sr) + body


def header_histogram_features(b: bytes, feat_dim: int = 16) -> list[float]:
    """Default pure-Python feature extractor: [log1p(w), log1p(h)] from the
    container header (0.0 when unparseable) + an L1-normalized
    (feat_dim-2)-bin histogram of the blob's byte values. Deterministic,
    library-free; a coarse but real content signature (byte-distribution
    features separate text-like from raster-like payloads)."""
    import math

    w = h = 0
    if len(b) >= _HEADER_SIZE and b[:4] == MAGIC:
        _, _, w, h, _, _ = struct.unpack(_FMT, b[:_HEADER_SIZE])
    else:
        real = parse_image_dims(b)
        if real is not None:
            _, w, h = real
    nbins = max(feat_dim - 2, 1)
    hist = [0] * nbins
    for byte in b:
        hist[byte * nbins // 256] += 1
    tot = max(len(b), 1)
    feats = [math.log1p(w), math.log1p(h)] + [c / tot for c in hist]
    return feats[:feat_dim] + [0.0] * max(0, feat_dim - len(feats))


# -- deterministic real-container synthesis (testgen/query side) -------------


def make_png(width: int, height: int) -> bytes:
    """Minimal spec-valid PNG: signature + IHDR (correct CRC) + IEND."""
    import zlib

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        + struct.pack(">I", 0)
        + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG header chain: SOI + APP0(JFIF) + SOF0 + EOI — enough
    for any SOF-scanning dimension reader (including ours)."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0"
        + struct.pack(">H", len(app0) + 2)
        + app0
        + b"\xff\xc0"
        + struct.pack(">H", len(sof0) + 2)
        + sof0
        + b"\xff\xd9"
    )


def make_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a: header + logical screen descriptor + trailer."""
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0x00, 0x00, 0x00])
        + b"\x3b"
    )


def decode_image_meta(media: DataFrame, id_col: str = "media_id", bin_col: str = "content") -> DataFrame:
    """Parse headers from the binary column via mapInPandas (Arrow batches).

    Two container families decode for real: testgen's TSMM fake headers
    (all three kinds) and actual PNG/JPEG/GIF image bytes via
    parse_image_dims — pure-Python dimension reads, no image library.
    Batches stay columnar end-to-end.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob) if blob is not None else b""
                if len(b) >= _HEADER_SIZE and b[:4] == MAGIC:
                    _, kind, w, h, nf, sr = struct.unpack(_FMT, b[:_HEADER_SIZE])
                    rows.append((mid, KINDS.get(kind, "unknown"), "tsmm", w, h, nf, sr, len(b), True))
                    continue
                real = parse_image_dims(b)
                if real is not None:
                    fmt, w, h = real
                    rows.append((mid, "image", fmt, w, h, 1, None, len(b), True))
                else:
                    rows.append((mid, None, None, None, None, None, None, len(b), False))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return media.mapInPandas(parse, MEDIA_META_SCHEMA)


def extract_features(media: DataFrame, decoder=None, feat_dim: int = 16) -> DataFrame:
    """Feature extraction over binary media.

    decoder: callable bytes -> list[float] of length feat_dim. The default
    is a real pure-Python extractor: log-dims from the container header
    (PNG/JPEG/GIF via parse_image_dims, or the TSMM fake header) plus an
    L1-normalized byte histogram of the payload — deterministic and
    model-free. Inject a pixel-level decoder (PIL/torchvision/ffmpeg)
    where those libraries exist; the Spark plumbing (schema, Arrow
    batching, partition balancing) is identical either way.
    """
    if decoder is None:
        decoder = lambda b: header_histogram_features(b, feat_dim)  # noqa: E731
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(b)) if b is not None else None for b in pdf["content"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    balanced = media.repartition(max(media.rdd.getNumPartitions(), 1), F.col("media_id"))
    return balanced.mapInPandas(run, schema)


def resize_media(
    media: DataFrame, target_w: int, target_h: int, resizer=None
) -> DataFrame:
    """Resize pass over binary media → new binary column + new dims.

    resizer: callable (bytes, w, h) -> bytes. Like extract_features, the
    pixel transform itself needs an image library this container lacks; the
    default fake rewrites our deterministic header with the target dims and
    passes the body through — exercising the real plumbing: binary-in →
    binary-out mapInPandas with bounded Arrow batches, output schema typed.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def default_resizer(b: bytes, w: int, h: int) -> bytes:
        if len(b) >= _HEADER_SIZE and b[:4] == MAGIC:
            _, kind, _w0, _h0, nf, sr = struct.unpack(_FMT, b[:_HEADER_SIZE])
            return struct.pack(_FMT, MAGIC, kind, w, h, nf, sr) + b[_HEADER_SIZE:]
        return b

    fn = resizer or default_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                fn(bytes(b), target_w, target_h) if b is not None else None
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.mapInPandas(run, schema)


def frame_sample_plan(media_meta: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for videos: (media_id, frame_idx) rows via
    sequence+explode — pure Column ops; the decode of each planned frame is
    the stubbed step."""
    vids = media_meta.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
