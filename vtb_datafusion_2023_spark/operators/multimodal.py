"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, but the decode step is REAL
for the formats decodable from public specs with stdlib alone —
PNG (all five scanline filters via zlib), BMP, PGM/PPM, and RIFF PCM
WAV (``operators.codecs``, validated against system-shipped PNGs and an
independent SQL replay of the pixel math in the ``mm_decode_png`` /
``mm_audio_wav`` oracles).  Entropy-coded formats (JPEG/MP3/video) still
raise NotImplementedError — swapping in PIL/turbojpeg touches only the
decoder callable, never the Spark plumbing.  The metadata extraction that
needs no codec (byte length, content hash) runs JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta_json", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def with_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Codec-free metadata, JVM-side: byte length + sha256 + 8-byte
    prefix.  This is the always-available fast path at 100 TB (no Python
    worker round-trip)."""
    p = F.col(payload_col)
    return (
        df.withColumn("n_bytes", F.octet_length(p))
        .withColumn("sha", F.sha2(p, 256))
        .withColumn("prefix_hex", F.hex(F.substring(p, 1, 8)))
    )


def decode_image(payload: bytes) -> dict:
    """REAL decode for PNG/BMP/PPM/WAV payloads (``operators.codecs``,
    pure numpy + zlib/struct); raises NotImplementedError for containers
    that need a codec library (JPEG/MP3/video).  See ``fake_decode`` for
    the format-agnostic plumbing stub."""
    from .codecs import decode_media

    return decode_media(payload)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives a plausible (width, height)
    and a 4-dim feature vector from the bytes alone."""
    n = len(payload or b"")
    w = 16 + (n * 2654435761) % 1024
    h = 16 + (n * 40503) % 1024
    feat = [float((payload[i % n] if n else 0) + i) for i in range(4)]
    return {"width": int(w), "height": int(h), "feature": feat}


def media_features(
    df: DataFrame,
    decoder=fake_decode,
    id_col: str = "media_id",
    payload_col: str = "payload",
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract media partitions via ``mapInPandas``.

    Arrow streams binary batches into Python; the decoder runs per item;
    output schema is fixed (FEATURE_SCHEMA).  At scale: repartition the
    input so a batch of payloads fits executor memory
    (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch rows),
    and keep payloads out of shuffles (decode before any wide op).
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                d = decoder(b)
                out.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(b),
                        "sha": hashlib.sha256(b).hexdigest(),
                        "width": d["width"],
                        "height": d["height"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: explodes a (stubbed) frame index per
    payload — the real implementation replaces the index source with the
    container's frame count from the codec.  See ``frame_sample`` for the
    real fixed-frame-size path (rawvideo-style containers)."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.octet_length("payload") % 5, F.lit(1))),
    ).withColumn("sample_every", F.lit(every_n))


def frame_sample(
    df: DataFrame,
    frame_bytes: int,
    every_n: int = 3,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling for fixed-frame-size video containers
    (rawvideo / uncompressed y4m-style streams, where frame k occupies
    bytes ``[k*frame_bytes, (k+1)*frame_bytes)``): every ``every_n``-th
    frame is SLICED out of the payload entirely JVM-side — sequence +
    explode + binary substring, no Python worker, no codec.  Trailing
    partial frames are dropped (``n_frames = floor(bytes/frame_bytes)``);
    entropy-coded containers (MP4/H.264) have no fixed frame stride and
    stay behind ``codecs.decode_media``'s NotImplementedError.

    Scale: the explode multiplies rows but each output row carries only
    one frame's bytes (payloads shrink ~every_n-fold); sample BEFORE any
    shuffle so full payloads never leave the scan stage.  Returns
    ``(id, frame_idx, n_frames, frame)``.
    """
    if frame_bytes <= 0 or every_n <= 0:
        raise ValueError(
            f"frame_bytes and every_n must be positive, got {frame_bytes}, {every_n}"
        )
    p = F.col(payload_col)
    nf = F.floor(F.octet_length(p) / F.lit(frame_bytes)).cast("int")
    return (
        df.select(F.col(id_col), p.alias("_p"), nf.alias("n_frames"))
        .filter(F.col("n_frames") >= 1)
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(int(every_n))
                )
            ),
        )
        .select(
            id_col,
            "frame_idx",
            "n_frames",
            F.expr(
                f"substring(_p, frame_idx * {int(frame_bytes)} + 1, {int(frame_bytes)})"
            ).alias("frame"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resampler: cycle the payload
    bytes to exactly width*height bytes (shrinks or grows like a resize
    changes pixel count).  Swap for PIL's ``Image.resize`` when the
    codec libraries are present."""
    n = max(1, width * height)
    if not payload:
        return b"\x00" * n
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    resizer=fake_resize,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing via ``mapInPandas``: binary in -> resized binary
    out with the new dimensions stamped.  Same scale contract as
    ``media_features``: Arrow batches bound memory, payloads never enter
    a shuffle (resize immediately after scan, write partitioned).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                out.append(
                    {
                        "media_id": int(mid),
                        "width": width,
                        "height": height,
                        "payload": resizer(b, width, height),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZED_SCHEMA)


def dhash64(img) -> tuple:
    """Integer-exact 64-bit difference hash (dHash) of an RGB image —
    the standard perceptual fingerprint for image near-dup detection
    (byte-level noise, re-encodes, and sub-LSB perturbations leave it
    unchanged; visually different images differ in many bits).

    Pipeline, all integer floor arithmetic so every engine/platform
    agrees bit-for-bit (no float resampling like PIL's):
      gray  = (r + g + b) // 3 per pixel;
      grid  = 8 x 9 block means, each ``sum(block) // block_area``
              (img height must be 8*bh, width 9*bw);
      bits  = grid[r][c+1] > grid[r][c]  ->  8 x 8 = 64 bits.

    Returns ``(hi, lo)`` — two bigint words (rows 4-7 / rows 0-3, bit
    ``2^(r'*8 + c)``), because a packed 64-bit hash would overflow the
    sign bit in SQL engines; group/join on the pair.
    """
    import numpy as np

    g = img.astype(np.int64).sum(axis=2) // 3
    h, w = g.shape
    if h % 8 or w % 9:
        raise ValueError(f"dhash64: need height%8==0 and width%9==0, got {h}x{w}")
    bh, bw = h // 8, w // 9
    blocks = g.reshape(8, bh, 9, bw).sum(axis=(1, 3)) // (bh * bw)
    bits = (blocks[:, 1:] > blocks[:, :-1]).astype(np.int64)
    pos = (np.arange(4, dtype=np.int64)[:, None] * 8 + np.arange(8, dtype=np.int64)[None, :])
    w4 = np.int64(1) << pos
    lo = int((bits[:4] * w4).sum())
    hi = int((bits[4:] * w4).sum())
    return hi, lo


def phash_canonicalize(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hi_col: str = "phash_hi",
    lo_col: str = "phash_lo",
) -> DataFrame:
    """Exact-perceptual-hash dedup finisher: group rows by their 64-bit
    dHash (two bigint words) and attach the canonical member (min id)
    plus group size — the image-side analogue of exact text dedup,
    collapsing byte-different but perceptually-identical images.

    ONE hash-partition window on the hash words (map-side-combinable
    if rewritten as agg+join; the window keeps one exchange).  Compose
    the simhash banding machinery on the words for NEAR-hash matching.
    """
    w = Window.partitionBy(hi_col, lo_col)
    return (
        hashed.withColumn("canon_doc", F.min(id_col).over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w).cast("bigint"))
    )
