"""Real media codecs (operators/codecs.py): spec-compliance + round-trips.

External validation: the decoder must read PNGs produced by OTHER
encoders (system-shipped icon/doc assets), not just its own output; the
suite's ``mm_decode_png`` / ``mm_audio_wav`` DuckDB oracles additionally
replay the pixel/sample math through SQL.
"""

from __future__ import annotations

import glob

import numpy as np
import pytest

from vtb_datafusion_2023_spark.operators import codecs as C


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_png_roundtrip_all_channels_and_filters(channels, mode):
    rng = np.random.default_rng(channels * 10 + len(mode))
    img = rng.integers(0, 256, (13, 17, channels), dtype=np.uint8)
    assert np.array_equal(C.decode_png(C.encode_png(img, filter_mode=mode)), img)


def test_png_decodes_foreign_encoders():
    """System assets were written by real-world PNG encoders (optipng,
    cairo, sphinx toolchains) — decoding them proves spec compliance
    beyond self-consistency."""
    paths = sorted(glob.glob("/usr/share/icons/Adwaita/16x16/**/*.png", recursive=True))[:50]
    paths += glob.glob("/usr/share/doc/python3/_static/*.png")
    if not paths:
        pytest.skip("no system PNGs present")
    decoded = 0
    for p in paths:
        img = C.decode_png(open(p, "rb").read())
        assert img.ndim == 3 and img.dtype == np.uint8 and img.size > 0
        decoded += 1
    assert decoded >= 10


def test_bmp_ppm_wav_roundtrips():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)
    gray = rng.integers(0, 256, (5, 11), dtype=np.uint8)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(gray))[:, :, 0], gray)
    s = rng.integers(-32768, 32767, (777, 2)).astype(np.int16)
    back, rate = C.decode_wav(C.encode_wav(s, 22050))
    assert np.array_equal(back, s) and rate == 22050
    mono8 = rng.integers(0, 256, 100).astype(np.uint8)
    back8, _ = C.decode_wav(C.encode_wav(mono8, 8000))
    assert np.array_equal(back8[:, 0], mono8)


def test_same_pixels_through_different_containers_agree():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (12, 8, 3), dtype=np.uint8)
    a = C.decode_media(C.encode_png(img, filter_mode="cycle"))
    b = C.decode_media(C.encode_bmp(img))
    c = C.decode_media(C.encode_ppm(img))
    assert a == b == c
    assert a["width"] == 8 and a["height"] == 12 and len(a["feature"]) == 4


def test_decode_media_rejects_truncated_jpeg_and_unknown():
    # JPEG now dispatches to the real baseline decoder (operators/jpeg.py);
    # a bare SOI with no frame must fail loudly, not silently
    with pytest.raises((ValueError, NotImplementedError)):
        C.decode_media(b"\xff\xd8\xff\xe0\x00\x02rest")
    with pytest.raises(NotImplementedError, match="unknown"):
        C.decode_media(b"\x00\x01\x02\x03")


def test_bilinear_resize_properties():
    # constant image stays constant at any size
    flat = np.full((10, 10, 3), 77, dtype=np.uint8)
    assert (C.resize_bilinear(flat, 4, 7) == 77).all()
    # identity size returns identical pixels
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert np.array_equal(C.resize_bilinear(img, 5, 6), img)
    # output bounded by input range
    r = C.resize_bilinear(img, 13, 3)
    assert r.min() >= img.min() and r.max() <= img.max()


def test_real_resize_end_to_end():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    out = C.decode_png(C.real_resize(C.encode_png(img), 16, 16))
    assert out.shape == (16, 16, 1)


def test_decode_image_is_real_now():
    from vtb_datafusion_2023_spark.operators.multimodal import decode_image

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    d = decode_image(C.encode_png(img))
    assert d["width"] == 8 and d["height"] == 8
    assert d["feature"][0] == pytest.approx(31.5)  # mean of 0..63


def test_media_features_with_real_decoder_mixed_payloads(spark):
    """Distributed decode dispatch: PNG, BMP, WAV, and a real JPEG flow
    through media_features with the REAL decode_media in one mapInPandas
    pass (mixed containers in the same batch)."""
    import glob

    from vtb_datafusion_2023_spark.operators.multimodal import media_features

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    wav = rng.integers(-1000, 1000, 64).astype(np.int16)
    payloads = [
        (0, bytearray(C.encode_png(img, filter_mode="cycle"))),
        (1, bytearray(C.encode_bmp(img))),
        (2, bytearray(C.encode_wav(wav, 8000))),
    ]
    jpgs = glob.glob("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP802813.jpg")
    if jpgs:
        payloads.append((3, bytearray(open(jpgs[0], "rb").read())))
    df = spark.createDataFrame(payloads, "media_id long, payload binary").repartition(2)
    rows = {r.media_id: r for r in media_features(df, decoder=C.decode_media).collect()}
    assert rows[0].width == 12 and rows[0].height == 10
    assert rows[1].width == 12 and rows[1].height == 10
    assert rows[0].feature == rows[1].feature  # same pixels, two containers
    assert rows[2].feature[3] == 8000.0  # wav sample rate
    if jpgs:
        assert rows[3].width == 199 and rows[3].height == 313
