"""FLAC codec: lossless round-trips, CRC verification, and spec-level
decode paths (LPC, rice partitions, escapes) via hand-built bitstreams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vtb_datafusion_2023_spark.operators import flac as FL


def _mixed_signal(n=6700):
    rng = np.random.default_rng(0)
    return np.concatenate([
        rng.integers(-32768, 32768, 1000),
        (3000 * np.sin(np.arange(n - 1700) / 20)).astype(int),
        np.full(700, 123),
    ]).astype(np.int16)


def test_flac_lossless_roundtrip_mono_and_stereo():
    sig = _mixed_signal()
    enc = FL.encode_flac(sig, 16000, block_size=1024)
    back, rate = FL.decode_flac(enc)
    assert rate == 16000 and np.array_equal(back.ravel(), sig.astype(np.int32))
    assert len(enc) < sig.nbytes * 0.6  # actually compresses

    st = np.stack([sig, np.roll(sig, 7)], axis=1)
    b2, r2 = FL.decode_flac(FL.encode_flac(st, 44100))
    assert r2 == 44100 and np.array_equal(b2, st.astype(np.int32))


def test_flac_crc_corruption_detected():
    enc = bytearray(FL.encode_flac(_mixed_signal(2000), block_size=1024))
    enc[-1] ^= 0x01  # corrupt the final frame's CRC-16
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_flac(bytes(enc))


def test_flac_utf8_frame_numbers():
    for n in (0, 127, 128, 2047, 2048, 65535, 10**7, (1 << 36) - 1):
        b = FL._utf8_number(n)
        assert FL._read_utf8_number(FL._BitReader(b)) == n


def _frame_bytes(build_subframe, bs=16, bps=16):
    """Assemble a valid one-channel frame around a custom subframe body."""
    bw = FL._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0111, 4)   # 16-bit blocksize at end
    bw.write(0b0000, 4)   # rate from streaminfo
    bw.write(0, 4)        # 1 channel
    bw.write(0b100, 3)    # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)        # frame number 0
    bw.write(bs - 1, 16)
    bw.align()
    header = bw.bytes()
    bw = FL._BitWriter()
    for b in header:
        bw.write(b, 8)
    bw.write(FL._crc8(header), 8)
    build_subframe(bw)
    bw.align()
    body = bw.bytes()
    return body + struct.pack(">H", FL._crc16(body))


def _container(frames: bytes, n_samples: int, rate=8000):
    info = FL._BitWriter()
    info.write(16, 16); info.write(16, 16)
    info.write(0, 24); info.write(0, 24)
    info.write(rate, 20); info.write(0, 3); info.write(15, 5)
    info.write(n_samples, 36)
    si = info.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frames


def test_flac_lpc_subframe_decodes_per_spec():
    """Hand-built order-2 LPC subframe: prediction = (c0*x[i-1] +
    c1*x[i-2]) >> shift, residual rice-coded — decoder must reproduce the
    recurrence exactly."""
    warm = [100, 110]
    coefs, shift, prec = [3, -2], 1, 4  # pred = (3*prev - 2*prevprev) >> 1
    vals = list(warm)
    res = [5, -3, 2, 0, -1, 4, -2, 1, 0, 3, -4, 2, 1, -1]
    for r in res:
        pred = (coefs[0] * vals[-1] + coefs[1] * vals[-2]) >> shift
        vals.append(pred + r)

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b100001, 6)       # LPC, order 2 (0b1xxxxx, order-1=1)
        bw.write(0, 1)              # no wasted bits
        for w in warm:
            bw.write(w & 0xFFFF, 16)
        bw.write(prec - 1, 4)
        bw.write(shift & 0x1F, 5)
        for c in coefs:
            bw.write(c & ((1 << prec) - 1), prec)
        bw.write(0b00, 2)           # rice method 0
        bw.write(0, 4)              # partition order 0
        bw.write(2, 4)              # rice param 2
        FL._rice_encode(bw, np.array(res), 2)

    data = _container(_frame_bytes(sub), len(vals))
    got, _ = FL.decode_flac(data)
    assert got.ravel().tolist() == vals


def test_flac_rice_partitions_and_escape():
    """Partition order 2 (4 partitions) and the raw-escape parameter."""
    x = np.arange(16, dtype=np.int64) * 3 + 7  # order-1 fixed: constant res 3

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b001001, 6)       # FIXED order 1
        bw.write(0, 1)
        bw.write(int(x[0]) & 0xFFFF, 16)
        res = np.diff(x)            # 15 threes
        bw.write(0b00, 2)
        bw.write(2, 4)              # partition order 2 -> 4 partitions of 4 (first: 3)
        chunks = [res[:3], res[3:7], res[7:11], res[11:15]]
        for i, chunk in enumerate(chunks):
            if i == 2:              # escape partition: raw 7-bit residuals
                bw.write(0b1111, 4)
                bw.write(7, 5)
                for r in chunk:
                    bw.write(int(r) & 0x7F, 7)
            else:
                bw.write(1, 4)
                FL._rice_encode(bw, chunk, 1)

    data = _container(_frame_bytes(sub), 16)
    got, _ = FL.decode_flac(data)
    assert got.ravel().tolist() == x.tolist()


def test_flac_stereo_decorrelation_raises_honestly():
    def sub(bw):
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(42, 16)

    bw = FL._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0111, 4); bw.write(0, 4)
    bw.write(0b1000, 4)  # left/side assignment
    bw.write(0b100, 3); bw.write(0, 1)
    bw.write(0, 8); bw.write(15, 16)
    bw.align()
    header = bw.bytes()
    bw2 = FL._BitWriter()
    for b in header:
        bw2.write(b, 8)
    bw2.write(FL._crc8(header), 8)
    bw2.align()
    body = bw2.bytes() + struct.pack(">H", 0)
    with pytest.raises(NotImplementedError, match="assignment"):
        FL.decode_flac(_container(body, 16))


def test_flac_media_features_dispatch():
    from vtb_datafusion_2023_spark.operators.codecs import decode_media

    sig = _mixed_signal(2000)
    f = decode_media(FL.encode_flac(sig, 22050))
    assert f["width"] == 2000 and f["height"] == 1
    assert f["feature"][3] == 22050.0
    assert abs(f["feature"][1] - sig.astype(float).mean()) < 1e-12
