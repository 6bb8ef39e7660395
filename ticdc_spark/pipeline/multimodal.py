"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery here is REAL and tested — schema, partitioning,
Arrow-batched mapInPandas signatures, batch shaping — while the actual
media decode is STUBBED (this container has no image/audio libraries):
`decode_image_meta` parses deterministic fake headers our testgen writes;
`extract_features` raises NotImplementedError unless handed a decoder.

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
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def pack_fake_media(media_id: str, kind: int, width: int, height: int, n_frames: int, sr: int) -> bytes:
    """Deterministic fake media blob (testgen side)."""
    body = (media_id * 8).encode()[:64]
    return struct.pack(_FMT, MAGIC, kind, width, height, n_frames, sr) + body


def decode_image_meta(media: DataFrame, id_col: str = "media_id", bin_col: str = "content") -> DataFrame:
    """Parse headers from the binary column via mapInPandas (Arrow batches).

    This is the real plumbing a libjpeg/ffmpeg decode would use; only the
    header parse is fake. Batches stay columnar end-to-end.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob) if blob is not None else b""
                if len(b) >= _HEADER_SIZE and b[:4] == MAGIC:
                    _, kind, w, h, nf, sr = struct.unpack(_FMT, b[:_HEADER_SIZE])
                    rows.append((mid, KINDS.get(kind, "unknown"), w, h, nf, sr, len(b), True))
                else:
                    rows.append((mid, None, None, None, None, None, len(b), False))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return media.mapInPandas(parse, MEDIA_META_SCHEMA)


def extract_features(media: DataFrame, decoder=None, feat_dim: int = 16) -> DataFrame:
    """Feature extraction over binary media.

    decoder: callable bytes -> list[float] of length feat_dim. The real
    decode (PIL/torchvision/ffmpeg) is NOT available in this container —
    callers must inject one; the default raises, clearly marking the stub.
    The Spark plumbing (schema, Arrow batching, partition balancing) is the
    deliverable and is tested with a deterministic fake decoder.
    """
    if decoder is None:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in this "
            "container; inject decoder=bytes->list[float]"
        )
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
