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


# ---------------------------------------------------------------------------
# G.711 companding + IMA ADPCM


def _g711_signal():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, 4096).astype(np.int16)
    return np.concatenate([s, np.array([-32768, -256, -8, -1, 0, 1, 8, 255, 32767], dtype=np.int16)])


def test_g711_decoded_values_are_fixed_points():
    from vtb_datafusion_2023_spark.operators.codecs import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    s = _g711_signal()
    for enc, dec, name in ((ulaw_encode, ulaw_decode, "ulaw"), (alaw_encode, alaw_decode, "alaw")):
        q = dec(enc(s))
        assert np.array_equal(dec(enc(q)), q), name
        rel = np.abs(q.astype(int) - s.astype(int)) / np.maximum(np.abs(s.astype(int)), 64)
        assert rel.max() < 0.17, (name, rel.max())  # log-PCM relative error bound


def test_g711_known_extremes_and_table_ranges():
    from vtb_datafusion_2023_spark.operators.codecs import (
        alaw_decode,
        ulaw_decode,
        ulaw_encode,
    )

    # G.711 u-law: code 0x00 is the most negative level (-32124), 0x80 the
    # most positive (+32124); +0 encodes to 0xFF
    assert ulaw_decode(np.array([0x00]))[0] == -32124
    assert ulaw_decode(np.array([0x80]))[0] == 32124
    assert ulaw_encode(np.array([0]))[0] == 0xFF
    u = ulaw_decode(np.arange(256))
    a = alaw_decode(np.arange(256))
    assert u.min() == -32124 and u.max() == 32124
    assert a.min() == -32256 and a.max() == 32256
    # every decode table value is distinct per sign-magnitude level
    assert len(np.unique(u)) == 255  # +0 and -0 both decode to 0
    assert len(np.unique(a)) == 256  # A-law has no code for 0 itself


def test_g711_vectorized_matches_scalar_reference():
    """Differential test: the numpy encoders against a direct scalar port
    of the CCITT reference routines."""
    from vtb_datafusion_2023_spark.operators.codecs import alaw_encode, ulaw_encode

    useg = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]
    aseg = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]

    def seg_of(v, ends):
        for i, e in enumerate(ends):
            if v <= e:
                return i
        return 8

    def ulaw1(s):
        mask, v = (0x7F, 0x84 - s) if s < 0 else (0xFF, s + 0x84)
        v = min(v, 0x7FFF)
        seg = seg_of(v, useg)
        return ((seg << 4) | ((v >> (seg + 3)) & 0xF)) ^ mask

    def alaw1(s):
        x = s >> 3
        mask, v = (0xD5, x) if x >= 0 else (0x55, -x - 1)
        seg = seg_of(v, aseg)
        mant = (v >> 1) & 0xF if seg < 2 else (v >> seg) & 0xF
        return ((seg << 4) | mant) ^ mask

    s = _g711_signal()
    assert np.array_equal(ulaw_encode(s), np.array([ulaw1(int(v)) for v in s], dtype=np.uint8))
    assert np.array_equal(alaw_encode(s), np.array([alaw1(int(v)) for v in s], dtype=np.uint8))


def test_g711_wav_container_roundtrip():
    from vtb_datafusion_2023_spark.operators.codecs import (
        alaw_decode,
        alaw_encode,
        decode_wav,
        encode_wav,
        ulaw_decode,
        ulaw_encode,
    )

    s = _g711_signal()
    for codec, enc, dec in (("ulaw", ulaw_encode, ulaw_decode), ("alaw", alaw_encode, alaw_decode)):
        back, rate = decode_wav(encode_wav(s, 8000, codec=codec))
        assert rate == 8000
        assert np.array_equal(back.ravel(), dec(enc(s)))


def test_ima_adpcm_roundtrip_snr_and_exact_length():
    from vtb_datafusion_2023_spark.operators.codecs import decode_wav, encode_wav

    t = np.arange(3001)  # odd length: exercises trailing-block padding
    sig = (9000 * np.sin(t / 25) + 1500 * np.sin(t / 6)).astype(np.int16)
    back, rate = decode_wav(encode_wav(sig, 8000, codec="ima"))
    back = back.ravel()
    assert len(back) == len(sig)  # fact chunk trims the padded tail
    err = (sig.astype(float) - back.astype(float)) ** 2
    snr = 10 * np.log10((sig.astype(float) ** 2).mean() / err.mean())
    assert snr > 25, snr


def test_ima_adpcm_decode_matches_scalar_spec_walk():
    """Nibble-level differential test of the block decoder against an
    independent scalar walk of the IMA spec state machine."""
    from vtb_datafusion_2023_spark.operators.codecs import (
        _IMA_INDEX,
        _IMA_STEPS,
        ima_adpcm_decode,
        ima_adpcm_encode_block,
    )

    rng = np.random.default_rng(3)
    samples = rng.integers(-2000, 2000, 505).astype(np.int64)
    block, _ = ima_adpcm_encode_block(samples, idx=0)
    got = ima_adpcm_decode(block, len(block), 505)

    pred = int.from_bytes(block[0:2], "little", signed=True)
    idx = block[2]
    want = [pred]
    for byte in block[4:]:
        for nib in (byte & 0xF, byte >> 4):
            step = int(_IMA_STEPS[idx])
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            if nib & 8:
                diff = -diff
            pred = max(-32768, min(32767, pred + diff))
            idx = max(0, min(88, idx + int(_IMA_INDEX[nib & 7])))
            want.append(pred)
    assert np.array_equal(got, np.array(want[:505], dtype=np.int16))


# ---------------------------------------------------------------------------
# GIF


def _rand_indexed_rgb(rng, h, w, ncolors=17):
    pal = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    return pal[rng.integers(0, ncolors, (h, w))]


def test_gif_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    assert np.array_equal(C.decode_gif(C.encode_gif(g)), np.stack([g] * 3, -1))
    rgb = _rand_indexed_rgb(rng, 25, 31)
    assert np.array_equal(C.decode_gif(C.encode_gif(rgb)), rgb)


def test_gif_lzw_table_growth_and_reclear():
    # tiling all 256 symbols x40 grows the code width to 12 bits and
    # forces at least one mid-stream clear
    long_idx = np.tile(np.arange(256, dtype=np.uint8), 40)
    enc = C._gif_lzw_encode(long_idx, 8)
    assert np.array_equal(C._gif_lzw_decode(enc, 8, len(long_idx)), long_idx)
    rng = np.random.default_rng(5)
    runs = np.repeat(rng.integers(0, 4, 500), rng.integers(1, 60, 500)).astype(np.uint8)
    assert np.array_equal(C._gif_lzw_decode(C._gif_lzw_encode(runs, 8), 8, len(runs)), runs)


def test_gif_interlaced_decode():
    """Hand-build an interlaced GIF: rows stored in the 4 spec passes,
    interlace flag set — decode must undo the row permutation."""
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (16, 9)).astype(np.uint8)
    plain = bytearray(C.encode_gif(g))
    h = 16
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    permuted = g[np.array(order)]
    inter = bytearray(C.encode_gif(permuted))
    # image descriptor of encode_gif output sits right after the 13-byte
    # header + 768-byte palette; its flags byte is the 10th of the block
    flags_off = 13 + 768 + 9
    assert inter[13 + 768] == 0x2C
    inter[flags_off] |= 0x40
    assert np.array_equal(C.decode_gif(bytes(inter)), np.stack([g] * 3, -1))


def test_gif_multiframe_and_transparency():
    """Two frames + a GCE transparency extension before the second."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    b = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    ga, gb = C.encode_gif(a), C.encode_gif(b)
    body_a = ga[13 + 768 : -1]  # image block only
    body_b = gb[13 + 768 : -1]
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, int(b[0, 0]), 0])  # transparent idx
    two = ga[: 13 + 768] + body_a + gce + body_b + b"\x3b"
    assert C.gif_frame_count(two) == 2
    frames = C.decode_gif_frames(two)
    assert np.array_equal(frames[0], np.stack([a] * 3, -1))
    # frame 2: pixels equal to the transparent index become black
    expect = np.stack([b] * 3, -1).copy()
    expect[b == b[0, 0]] = 0
    assert np.array_equal(frames[1], expect)


def test_gif_media_features_dispatch():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (12, 20)).astype(np.uint8)
    f = C.decode_media(C.encode_gif(g))
    x = np.stack([g] * 3, -1).astype(np.float64)
    assert f["width"] == 20 and f["height"] == 12
    assert abs(f["feature"][0] - x.mean()) < 1e-12


# ---------------------------------------------------------------------------
# TIFF


def test_tiff_roundtrip_matrix():
    """Gray + RGB x none/LZW/PackBits x both byte orders; LZW uses the
    horizontal-differencing predictor (the spec pairing)."""
    rng = np.random.default_rng(21)
    g = rng.integers(0, 256, (33, 47)).astype(np.uint8)
    rgb = rng.integers(0, 256, (21, 17, 3)).astype(np.uint8)
    for img, want in ((g, g[:, :, None]), (rgb, rgb)):
        for comp in (1, 5, 32773):
            for be in (False, True):
                pred = 2 if comp == 5 else 1
                enc = C.encode_tiff(img, compression=comp, predictor=pred, big_endian=be)
                assert enc[:2] == (b"MM" if be else b"II")
                assert np.array_equal(C.decode_tiff(enc), want), (comp, be)


def test_tiff_lzw_early_change_and_reclear():
    """60k random bytes drive the code width through 9->10->11->12 and a
    mid-stream re-clear; smooth runs exercise long matches."""
    rng = np.random.default_rng(22)
    data = bytes(rng.integers(0, 256, 60000).astype(np.uint8))
    assert C._tiff_lzw_decode(C._tiff_lzw_encode(data), len(data)) == data
    runs = bytes(np.repeat(rng.integers(0, 5, 3000), rng.integers(1, 50, 3000)).astype(np.uint8))
    assert C._tiff_lzw_decode(C._tiff_lzw_encode(runs), len(runs)) == runs


def test_tiff_multi_strip_decode():
    """Hand-built 2-strip uncompressed file (RowsPerStrip < height): the
    decoder must reassemble strips in order."""
    import struct

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (8, 10)).astype(np.uint8)
    top, bottom = img[:5].tobytes(), img[5:].tobytes()
    e = "<"
    n_tags = 10

    def tag(t, typ, cnt, val):
        head = struct.pack(f"{e}HHI", t, typ, cnt)
        if typ == 3 and cnt == 1:
            return head + struct.pack(f"{e}H", val) + b"\x00\x00"
        return head + struct.pack(f"{e}I", val)

    ifd_off = 8
    arrays_off = ifd_off + 2 + n_tags * 12 + 4
    strip_off_arr = arrays_off          # 2 LONGs
    strip_cnt_arr = arrays_off + 8      # 2 LONGs
    data_off = arrays_off + 16
    entries = b"".join([
        tag(256, 3, 1, 10), tag(257, 3, 1, 8), tag(258, 3, 1, 8),
        tag(259, 3, 1, 1), tag(262, 3, 1, 1),
        tag(273, 4, 2, strip_off_arr), tag(277, 3, 1, 1),
        tag(278, 3, 1, 5), tag(279, 4, 2, strip_cnt_arr), tag(284, 3, 1, 1),
    ])
    blob = (
        struct.pack(f"{e}2sHI", b"II", 42, ifd_off)
        + struct.pack(f"{e}H", n_tags) + entries + struct.pack(f"{e}I", 0)
        + struct.pack(f"{e}2I", data_off, data_off + len(top))
        + struct.pack(f"{e}2I", len(top), len(bottom))
        + top + bottom
    )
    assert np.array_equal(C.decode_tiff(blob), img[:, :, None])


def test_tiff_media_features_dispatch():
    rng = np.random.default_rng(24)
    g = rng.integers(0, 256, (9, 12)).astype(np.uint8)
    f = C.decode_media(C.encode_tiff(g, compression=5, predictor=2))
    assert f["width"] == 12 and f["height"] == 9
    assert abs(f["feature"][0] - g.astype(float).mean()) < 1e-12


# ---------------------------------------------------------------------------
# AIFF


def test_aiff_roundtrip_and_f80_rates():
    rng = np.random.default_rng(31)
    s = rng.integers(-32768, 32768, 999).astype(np.int16)
    for rate in (8000, 22050, 44100, 96000):
        back, got_rate = C.decode_aiff(C.encode_aiff(s, rate))
        assert got_rate == rate  # 80-bit extended float parsed exactly
        assert np.array_equal(back.ravel(), s)
    st = np.stack([s, -s], axis=1)
    b2, _ = C.decode_aiff(C.encode_aiff(st, 22050))
    assert np.array_equal(b2, st)


def test_aiff_media_features_dispatch():
    rng = np.random.default_rng(32)
    s = rng.integers(-1000, 1000, 128).astype(np.int16)
    f = C.decode_media(C.encode_aiff(s, 8000))
    assert f["width"] == 128 and f["height"] == 1 and f["feature"][3] == 8000.0


def test_au_roundtrip_and_g711_encodings():
    import struct

    rng = np.random.default_rng(41)
    s = rng.integers(-32768, 32768, 500).astype(np.int16)
    back, rate = C.decode_au(C.encode_au(s, 8000))
    assert rate == 8000 and np.array_equal(back.ravel(), s)
    # hand-built u-law AU: header encoding 1 + companded bytes
    codes = C.ulaw_encode(s)
    au = struct.pack(">4s5I", b".snd", 24, len(codes), 1, 8000, 1) + codes.tobytes()
    got, _ = C.decode_au(au)
    assert np.array_equal(got.ravel(), C.ulaw_decode(codes))
    f = C.decode_media(C.encode_au(s, 8000))
    assert f["width"] == 500 and f["feature"][3] == 8000.0
