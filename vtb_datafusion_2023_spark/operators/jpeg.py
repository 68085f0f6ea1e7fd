"""Pure-numpy baseline JPEG decoder (ITU-T T.81, public spec).

Closes the last honestly-gated multimodal decode path for the dominant
photographic container: baseline sequential DCT, 8-bit, grayscale or
YCbCr with any sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart
markers.  Out of scope (still raising NotImplementedError): progressive
scans, arithmetic coding, 12-bit, CMYK.

Differential validation: ``tests/test_jpeg.py`` decodes Spark's shipped
mllib sample photographs and compares pixel-for-pixel against the JVM's
own ImageIO decode (``spark.read.format("image")``) — the spec does not
mandate a bit-exact IDCT or chroma upsampling filter, so decoders
legitimately differ by a few levels at edges; the tests bound mean and
tail error.  This decoder uses the orthonormal matrix IDCT and chunky
(nearest) chroma upsampling.

Performance: entropy decoding is an inherently serial bit walk —
~1s/megapixel in pure python.  The mapInPandas plumbing treats the
decoder as a per-payload callable (``codecs.decode_media``); swap in
turbojpeg for production throughput without touching the dataflow.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _Huff:
    """Canonical Huffman table from the DHT (bits, values) lists."""

    __slots__ = ("lookup",)

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # spec: pad with 1s at end; 0 is also common — EOB-safe
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> HxWxC uint8 (C = 1 gray or 3 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                qt[tq] = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p + 1).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                hts[(tc, th)] = _Huff(bits, seg[p + 17 : p + 17 + n])
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline (extended) sequential
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append({"cs": cs, "td": tds >> 4, "ta": tds & 15})
            scan = (scan_comps, pos + seglen)
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    scan_comps, entropy_start = scan

    # split entropy-coded data into restart segments, unstuffing 0xFF00
    segments: list[bytes] = []
    cur = bytearray()
    p = entropy_start
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1] if p + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    by_id = {c["cs"]: c for c in scan_comps}
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]

    n_mcus = mcus_x * mcus_y
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, comp in enumerate(comps):
            sc = by_id[comp["id"]]
            dc_t, ac_t = hts[(0, sc["td"])], hts[(1, sc["ta"])]
            q = qt[comp["tq"]]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coefs = np.zeros(64, dtype=np.float64)
                    t = reader.decode(dc_t)
                    preds[ci] += _extend(reader.read_bits(t), t)
                    coefs[0] = preds[ci] * int(q[0])
                    k = 1
                    while k <= 63:
                        rs = reader.decode(ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            break
                        coefs[k] = _extend(reader.read_bits(s), s) * int(q[k])
                        k += 1
                    block = np.zeros(64)
                    block[ZIGZAG] = coefs
                    spatial = _A.T @ block.reshape(8, 8) @ _A
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
    h, w = frame["h"], frame["w"]
    full = []
    for ci, comp in enumerate(comps):
        up = np.repeat(
            np.repeat(planes[ci], vmax // comp["v"], axis=0), hmax // comp["h"], axis=1
        )
        full.append(up[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG (CMYK?)")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
