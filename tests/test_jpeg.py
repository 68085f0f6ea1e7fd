"""Baseline JPEG decoder (operators/jpeg.py): differential validation
against the JVM's own ImageIO decode of real photographs.

The T.81 spec does not mandate a bit-exact IDCT or chroma upsampling
filter, so two correct decoders legitimately differ by a few levels —
the bounds here (mean <= 1.0, p99 <= 4, no pixel off by > 16) are far
tighter than any decode bug would permit and hold with wide margin
(measured: mean <= 0.5, p99 <= 2, max <= 10 on all four samples).
"""

from __future__ import annotations

import glob

import numpy as np
import pytest

KITTENS = sorted(
    glob.glob("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/*.jpg")
)

needs_jpegs = pytest.mark.skipif(not KITTENS, reason="Spark sample JPEGs not present")


@needs_jpegs
def test_decodes_real_photos_within_reference_tolerance(spark):
    from vtb_datafusion_2023_spark.operators.jpeg import decode_jpeg

    checked = 0
    for p in KITTENS:
        r = spark.read.format("image").load(p).select("image.*").first()
        if r.nChannels != 3:
            continue
        ref = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(
            r.height, r.width, r.nChannels
        )[:, :, ::-1]
        got = decode_jpeg(open(p, "rb").read())
        assert got.shape == ref.shape
        d = np.abs(got.astype(int) - ref.astype(int))
        assert d.mean() <= 1.0, (p, d.mean())
        assert np.percentile(d, 99) <= 4, p
        assert d.max() <= 16, p
        checked += 1
    assert checked >= 3


@needs_jpegs
def test_decode_media_dispatches_jpeg(spark):
    from vtb_datafusion_2023_spark.operators.codecs import decode_media

    d = decode_media(open(KITTENS[0], "rb").read())
    assert d["width"] > 0 and d["height"] > 0 and len(d["feature"]) == 4


PROGRESSIVE = sorted(glob.glob("/usr/share/doc/nodejs/*.jpg")) + glob.glob(
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel/grayscale.jpg"
)


def test_progressive_jpeg_matches_reference(spark):
    """SOF2 progressive scans (spectral selection + successive
    approximation, incl. the AC refinement correction-bit walk) against
    the JVM reference decode."""
    from vtb_datafusion_2023_spark.operators.jpeg import decode_jpeg

    if not PROGRESSIVE:
        pytest.skip("no progressive samples present")
    checked = 0
    for p in PROGRESSIVE:
        r = spark.read.format("image").load(p).select("image.*").first()
        ref = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(
            r.height, r.width, r.nChannels
        )
        if r.nChannels == 3:
            ref = ref[:, :, ::-1]
        got = decode_jpeg(open(p, "rb").read())
        if got.shape[2] == 1:
            ref = ref.reshape(got.shape)
        assert got.shape == ref.shape
        d = np.abs(got.astype(int) - ref.astype(int))
        assert d.mean() <= 0.5 and d.max() <= 4, (p, d.mean(), d.max())
        checked += 1
    assert checked >= 1


def test_rejects_non_jpeg():
    from vtb_datafusion_2023_spark.operators.jpeg import decode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNGnope")
