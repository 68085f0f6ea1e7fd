"""Pure-numpy JPEG decoder (ITU-T T.81, public spec): baseline AND
progressive sequential DCT, 8-bit, grayscale or YCbCr at any sampling
(4:4:4 / 4:2:2 / 4:2:0), restart markers.

The decoder accumulates quantized DCT coefficients per block across all
scans (one for baseline; spectral-selection + successive-approximation
passes for progressive, including the AC refinement correction-bit walk
of T.81 G.1.2.3 / the public libjpeg structure), then dequantizes and
runs one orthonormal matrix IDCT per block.

Still honestly out of scope (NotImplementedError with the detected
marker): hierarchical/lossless SOFs, arithmetic coding, 12-bit, CMYK.

Differential validation: ``tests/test_jpeg.py`` decodes Spark's shipped
mllib photographs (baseline 4:2:0/4:4:4) and the progressive system
samples, comparing pixel-for-pixel against the JVM's own ImageIO decode
(``spark.read.format("image")``) — the spec does not mandate a
bit-exact IDCT or upsampling filter, so correct decoders differ by a
few levels at edges; the tests bound mean and tail error.

Performance: entropy decoding is an inherently serial bit walk
(~1s/megapixel/scan in pure python).  ``codecs.decode_media`` treats
the decoder as a per-payload callable inside ``mapInPandas``; swap in
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
            return 0
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


def _entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy data into restart segments (0xFF00
    unstuffed); returns (segments, position of the terminating marker)."""
    segments: list[bytes] = []
    cur = bytearray()
    p = start
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
            break
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


class _Decoder:
    def __init__(self, data: bytes):
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        self.data = data
        self.qt: dict[int, np.ndarray] = {}
        self.hts: dict[tuple[int, int], _Huff] = {}
        self.frame = None
        self.progressive = False
        self.restart_interval = 0
        self.coefs: list[np.ndarray] = []  # per component: (by, bx, 64) int32
        self.eobrun = 0

    # ------------------------------------------------------------ marker loop
    def run(self) -> np.ndarray:
        data = self.data
        pos = 2
        while pos < len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:
                break
            (seglen,) = struct.unpack_from(">H", data, pos)
            seg = data[pos + 2 : pos + seglen]
            if marker == 0xDB:
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    if pq != 0:
                        raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                    self.qt[tq] = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=p + 1
                    ).astype(np.int32)
                    p += 65
            elif marker == 0xC4:
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    bits = list(seg[p + 1 : p + 17])
                    n = sum(bits)
                    self.hts[(tc, th)] = _Huff(bits, seg[p + 17 : p + 17 + n])
                    p += 17 + n
            elif marker in (0xC0, 0xC1, 0xC2):
                self._sof(seg, progressive=(marker == 0xC2))
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(f"unsupported JPEG (SOF marker 0xFF{marker:02X})")
            elif marker == 0xDD:
                (self.restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:
                pos = self._scan(seg, pos + seglen)
                continue
            pos += seglen
        if self.frame is None:
            raise ValueError("JPEG missing SOF")
        return self._finish()

    def _sof(self, seg: bytes, progressive: bool) -> None:
        prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
        if prec != 8:
            raise NotImplementedError("only 8-bit precision")
        comps = []
        for i in range(nc):
            cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
            comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        for c in comps:
            # full (interleaved-padded) block grid; non-interleaved scans
            # touch the ceil(comp_dim/8) subgrid
            c["bx_pad"] = mcus_x * c["h"]
            c["by_pad"] = mcus_y * c["v"]
            c["bx"] = -(-(-(-w * c["h"] // hmax)) // 8)
            c["by"] = -(-(-(-h * c["v"] // vmax)) // 8)
            c["pred"] = 0
        self.frame = {
            "h": h, "w": w, "comps": comps,
            "hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y,
        }
        self.progressive = progressive
        self.coefs = [
            np.zeros((c["by_pad"], c["bx_pad"], 64), dtype=np.int32) for c in comps
        ]

    # ------------------------------------------------------------ scan decode
    def _scan(self, seg: bytes, entropy_start: int) -> int:
        ns = seg[0]
        scan_comps = []
        for i in range(ns):
            cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
            scan_comps.append({"cs": cs, "td": tds >> 4, "ta": tds & 15})
        ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
        ahal = seg[3 + 2 * ns]
        ah, al = ahal >> 4, ahal & 15
        segments, end_pos = _entropy_segments(self.data, entropy_start)

        fr = self.frame
        comps = fr["comps"]
        idx_of = {c["id"]: i for i, c in enumerate(comps)}
        members = [idx_of[sc["cs"]] for sc in scan_comps]
        tables = {idx_of[sc["cs"]]: sc for sc in scan_comps}
        for ci in members:
            comps[ci]["pred"] = 0
        self.eobrun = 0

        seg_idx = 0
        reader = _BitReader(segments[0])

        def maybe_restart(unit: int) -> _BitReader:
            nonlocal seg_idx
            if self.restart_interval and unit and unit % self.restart_interval == 0:
                seg_idx += 1
                rd = _BitReader(segments[seg_idx])
                for ci in members:
                    comps[ci]["pred"] = 0
                self.eobrun = 0
                return rd
            return reader

        if len(members) > 1 or (not self.progressive):
            # interleaved MCU geometry (baseline always; progressive DC scans)
            n_mcus = fr["mcus_x"] * fr["mcus_y"]
            for m in range(n_mcus):
                reader = maybe_restart(m)
                my, mx = divmod(m, fr["mcus_x"])
                for ci in members:
                    comp = comps[ci]
                    sc = tables[ci]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = self.coefs[ci][my * comp["v"] + by, mx * comp["h"] + bx]
                            self._decode_block(reader, blk, ci, sc, ss, se, ah, al)
        else:
            ci = members[0]
            comp = comps[ci]
            sc = tables[ci]
            n_units = comp["by"] * comp["bx"]
            for u in range(n_units):
                reader = maybe_restart(u)
                by, bx = divmod(u, comp["bx"])
                self._decode_block(reader, self.coefs[ci][by, bx], ci, sc, ss, se, ah, al)
        return end_pos

    def _decode_block(self, reader, blk, ci, sc, ss, se, ah, al) -> None:
        comp = self.frame["comps"][ci]
        if not self.progressive:
            dc_t, ac_t = self.hts[(0, sc["td"])], self.hts[(1, sc["ta"])]
            t = reader.decode(dc_t)
            comp["pred"] += _extend(reader.read_bits(t), t)
            blk[0] = comp["pred"]
            k = 1
            while k <= 63:
                rs = reader.decode(ac_t)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break
                k += r
                if k > 63:
                    break
                blk[k] = _extend(reader.read_bits(s), s)
                k += 1
            return
        if ss == 0:  # DC scan
            if ah == 0:
                t = reader.decode(self.hts[(0, sc["td"])])
                comp["pred"] += _extend(reader.read_bits(t), t)
                blk[0] = comp["pred"] << al
            else:
                if reader.read_bit():
                    blk[0] |= 1 << al
            return
        # AC scans
        if ah == 0:  # first pass for this band
            if self.eobrun > 0:
                self.eobrun -= 1
                return
            ac_t = self.hts[(1, sc["ta"])]
            k = ss
            while k <= se:
                rs = reader.decode(ac_t)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    break
                blk[k] = _extend(reader.read_bits(s), s) << al
                k += 1
            return
        # AC refinement (T.81 G.1.2.3; public libjpeg decode_mcu_AC_refine shape)
        ac_t = self.hts[(1, sc["ta"])]
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = reader.decode(ac_t)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r != 15:
                        self.eobrun = (1 << r)
                        if r:
                            self.eobrun += reader.read_bits(r)
                        break
                    # r == 15: skip 16 zero-history positions
                else:
                    newval = p1 if reader.read_bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        if reader.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            if newval:
                                blk[k] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
        if self.eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            self.eobrun -= 1

    # ------------------------------------------------------------ output
    def _finish(self) -> np.ndarray:
        fr = self.frame
        comps = fr["comps"]
        full = []
        for ci, comp in enumerate(comps):
            q = self.qt[comp["tq"]].astype(np.float64)
            c = self.coefs[ci].astype(np.float64) * q  # (by, bx, 64), zigzag order
            by_pad, bx_pad = comp["by_pad"], comp["bx_pad"]
            nat = np.zeros_like(c)
            nat[:, :, ZIGZAG] = c
            blocks = nat.reshape(by_pad, bx_pad, 8, 8)
            spatial = np.einsum("ux,ybuv,vz->ybxz", _A, blocks, _A, optimize=True)
            plane = spatial.transpose(0, 2, 1, 3).reshape(by_pad * 8, bx_pad * 8)
            up = np.repeat(
                np.repeat(plane, fr["vmax"] // comp["v"], axis=0),
                fr["hmax"] // comp["h"],
                axis=1,
            )
            full.append(up[: fr["h"], : fr["w"]] + 128.0)
        if len(full) == 1:
            return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)[:, :, None]
        if len(full) != 3:
            raise NotImplementedError(f"{len(full)}-component JPEG (CMYK?)")
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG (baseline or progressive) -> HxWxC uint8 (C = 1 gray, 3 RGB)."""
    return _Decoder(data).run()
