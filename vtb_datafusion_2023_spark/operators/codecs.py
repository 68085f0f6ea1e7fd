"""Real media codecs in pure numpy + stdlib — no PIL/opencv/soundfile.

The multimodal north star treats image/audio as opaque ``binary`` columns
decoded inside Arrow-batched Python stages.  This container ships no
codec libraries, but several canonical formats are fully decodable from
their PUBLIC specifications with nothing beyond ``zlib``/``struct``:

- **PNG** (RFC 2083 / W3C spec): chunked container, zlib-deflated
  scanlines, per-row filters None/Sub/Up/Average/Paeth; 8-bit gray /
  gray+alpha / RGB / RGBA, non-interlaced.  Encoder + decoder.
- **BMP** (Windows BITMAPINFOHEADER): 24-bit uncompressed bottom-up
  rows padded to 4 bytes.  Encoder + decoder.
- **PPM/PGM** (netpbm P6/P5): trivial header + raw samples.
- **GIF** (87a/89a): variable-width LZW (growth to 12 bits +
  re-clear), 4-pass interlacing, GCE transparency, multi-frame.
  Encoder + decoder.
- **TIFF** (6.0): both byte orders, strips, Compression
  none/PackBits/LZW (MSB-first, early-change widths), Predictor 2.
  Encoder + decoder.
- **WAV** (RIFF): integer PCM 8/16-bit PLUS G.711 u-law/A-law (ITU-T
  companding, tags 7/6) and IMA/DVI ADPCM (tag 0x11).  Encoders +
  decoders.
- **FLAC** (``operators/flac.py``): LOSSLESS — rice-coded
  fixed/LPC subframes, CRC-8/16 verified.  Encoder + decoder.

**JPEG** decodes too — baseline AND progressive (``operators/jpeg.py``:
T.81 huffman + spectral-selection/successive-approximation scans +
dequant + matrix IDCT, differentially validated against the JVM's
ImageIO decode of real photographs to <=0.5 mean level error).
MP3 / H.264 / arithmetic-coded & hierarchical JPEG remain honestly out
of scope;
``decode_media`` raises NotImplementedError with the detected container
so the gap is explicit, and ``operators.multimodal`` keeps the
deterministic ``fake_decode`` for plumbing tests.

Scale note: these run inside ``mapInPandas`` batches (see
``multimodal.media_features``) — per-payload work, no shuffle, payloads
never leave the scan partition.  The pure-python filter recurrences are
fine for thumbnail-scale fixtures; a production cluster swaps the
decoder callable for PIL/turbojpeg WITHOUT touching the Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# module-level so executor closures capture the decoders by value
# (cloudpickle pickle-by-value on the package): an import statement
# inside decode_media would run on the worker, which only resolves the
# package when the session's cwd/PYTHONPATH exposes it (round-7
# vanilla-session sim finding — same fix as inference.udfs).
from .flac import decode_flac
from .jpeg import decode_jpeg

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG


def encode_png(img: np.ndarray, filter_mode: str = "none") -> bytes:
    """Encode HxW (gray) or HxWxC (C in 2,3,4) uint8 to a valid PNG.

    ``filter_mode``: 'none' writes filter 0 rows; 'cycle' applies filter
    ``row % 5`` (exercises every decoder filter path — used by the
    round-trip oracle query).
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c  # bytes per pixel at bit depth 8

    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int32)
    for y in range(h):
        row = img[y].astype(np.int32)
        ft = (y % 5) if filter_mode == "cycle" else 0
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            left = np.vstack([np.zeros((1, c), np.int32), row[:-1]])
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            left = np.vstack([np.zeros((1, c), np.int32), row[:-1]])
            filt = row - (left + prev) // 2
        else:  # Paeth
            left = np.vstack([np.zeros((1, c), np.int32), row[:-1]])
            ul = np.vstack([np.zeros((1, c), np.int32), prev[:-1]])
            filt = row - _paeth(left, prev, ul)
        raw.append(ft)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> HxWxC uint8 (8-bit depth, non-interlaced)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise NotImplementedError(f"PNG variant unsupported (depth={depth}, interlace={interlace})")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type} (palette) unsupported")

    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev: list[int] = [0] * stride
    bpp = channels
    for y in range(h):
        ft = raw[y * (stride + 1)]
        start = y * (stride + 1) + 1
        line = raw[start : start + stride]
        if ft == 0:
            rec = list(line)
        elif ft == 2:
            rec = [(line[i] + prev[i]) & 0xFF for i in range(stride)]
        elif ft == 1:
            # Sub is a per-channel running sum — python-int recurrence
            # (numpy scalar indexing is ~10x slower per element here)
            rec = [0] * stride
            for i in range(stride):
                rec[i] = (line[i] + (rec[i - bpp] if i >= bpp else 0)) & 0xFF
        elif ft == 3:
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {ft} invalid")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, channels)


# ---------------------------------------------------------------------------
# BMP (24-bit BITMAPINFOHEADER)


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("BMP encoder expects RGB")
    pad = (-(w * 3)) % 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.extend(img[y, :, ::-1].tobytes())  # BGR order
        rows.extend(b"\x00" * pad)
    pixel_off = 14 + 40
    total = pixel_off + len(rows)
    header = struct.pack("<2sIHHI", b"BM", total, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    dib_size, w, h = struct.unpack_from("<Iii", data, 14)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP variant unsupported (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    pad = (-(w * 3)) % 4
    out = np.zeros((h, w, 3), dtype=np.uint8)
    p = pixel_off
    for row in range(h):
        y = h - 1 - row if flip else row
        line = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=p).reshape(w, 3)
        out[y] = line[:, ::-1]  # BGR -> RGB
        p += w * 3 + pad
    return out


# ---------------------------------------------------------------------------
# netpbm (P5 gray / P6 RGB, maxval 255)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2 or img.shape[2] == 1:
        img = img.reshape(img.shape[0], img.shape[1])
        return b"P5 %d %d 255\n" % (img.shape[1], img.shape[0]) + img.tobytes()
    if img.shape[2] != 3:
        raise ValueError("PPM encoder expects gray or RGB")
    return b"P6 %d %d 255\n" % (img.shape[1], img.shape[0]) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("16-bit netpbm unsupported")
    c = 1 if data[:2] == b"P5" else 3
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * c, offset=pos)
    return arr.reshape(h, w, c)


# ---------------------------------------------------------------------------
# G.711 companding (ITU-T G.711: u-law / A-law log PCM, 8 bits/sample)
#
# Vectorized numpy ports of the public CCITT/Sun reference routines
# (linear2ulaw/ulaw2linear, linear2alaw/alaw2linear); segment search is a
# searchsorted over the 8 segment end values.

_ULAW_BIAS = 0x84
_ULAW_SEG_END = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF])
_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> u-law codes (uint8)."""
    s = np.asarray(samples).astype(np.int64)
    neg = s < 0
    m = np.minimum(np.where(neg, _ULAW_BIAS - s, s + _ULAW_BIAS), 0x7FFF)
    seg = np.searchsorted(_ULAW_SEG_END, m)
    mant = (m >> (seg + 3)) & 0xF
    return (((seg << 4) | mant) ^ np.where(neg, 0x7F, 0xFF)).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """u-law codes (uint8) -> int16 linear PCM."""
    u = (~np.asarray(codes).astype(np.int64)) & 0xFF
    t = (((u & 0xF) << 3) + _ULAW_BIAS) << ((u >> 4) & 7)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> A-law codes (uint8)."""
    x = np.asarray(samples).astype(np.int64) >> 3  # 13-bit domain
    neg = x < 0
    m = np.where(neg, -x - 1, x)
    seg = np.searchsorted(_ALAW_SEG_END, m)
    mant = np.where(seg < 2, (m >> 1) & 0xF, (m >> seg) & 0xF)
    return (((seg << 4) | mant) ^ np.where(neg, 0x55, 0xD5)).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law codes (uint8) -> int16 linear PCM."""
    a = (np.asarray(codes).astype(np.int64)) ^ 0x55
    seg = (a >> 4) & 7
    t = (a & 0xF) << 4
    t = np.where(
        seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.where(seg >= 2, seg - 1, 0))
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11): 4-bit differential coding with the
# public IMA step/index tables; per-block int16 predictor + step-index
# header, low nibble first.  Mono only (the suite's waveforms are mono).

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
])
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8])


def _ima_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
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
    return pred, idx


def ima_adpcm_encode_block(samples: np.ndarray, idx: int = 0) -> tuple[bytes, int]:
    """One mono IMA block: samples[0] is the header predictor; the rest
    quantize to nibbles.  Returns (block_bytes, final_index) so blocks
    chain their step index (the standard encoder behavior)."""
    s = np.asarray(samples, dtype=np.int64)
    pred = int(s[0])
    out = bytearray(struct.pack("<hBB", pred, idx, 0))
    nibs = []
    for sample in s[1:]:
        step = int(_IMA_STEPS[idx])
        delta = int(sample) - pred
        nib = 0
        if delta < 0:
            nib, delta = 8, -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        pred, idx = _ima_step(pred, idx, nib)
        nibs.append(nib)
    if len(nibs) % 2:
        nibs.append(0)
    for lo, hi in zip(nibs[::2], nibs[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out), idx


def ima_adpcm_decode(body: bytes, block_align: int, n_samples: int) -> np.ndarray:
    """Mono IMA ADPCM data chunk -> int16 PCM (first ``n_samples``)."""
    out = []
    for off in range(0, len(body), block_align):
        block = body[off : off + block_align]
        if len(block) < 4:
            break
        pred, idx = struct.unpack_from("<hB", block, 0)
        idx = max(0, min(88, idx))
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                pred, idx = _ima_step(pred, idx, nib)
                out.append(pred)
    return np.array(out[:n_samples], dtype=np.int16)


# ---------------------------------------------------------------------------
# WAV (RIFF integer PCM)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, codec: str = "pcm") -> bytes:
    """Mono/stereo int16 (or uint8) PCM -> RIFF/WAVE bytes.

    ``codec``: ``pcm`` (tag 1), ``ulaw``/``alaw`` (G.711, tags 7/6, 8-bit
    log PCM), or ``ima`` (IMA/DVI ADPCM, tag 0x11, 4-bit, mono,
    505 samples per 256-byte block with a ``fact`` chunk for the exact
    sample count)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    extra = b""
    chunks = b""
    if codec == "pcm":
        if s.dtype == np.uint8:
            bits, body = 8, s.tobytes()
        else:
            bits, body = 16, s.astype("<i2").tobytes()
        tag, block = 1, ch * bits // 8
        byterate = sample_rate * block
    elif codec in ("ulaw", "alaw"):
        enc = ulaw_encode if codec == "ulaw" else alaw_encode
        bits, body = 8, enc(s.astype(np.int64).ravel()).tobytes()
        tag, block = (7 if codec == "ulaw" else 6), ch
        byterate = sample_rate * block
    elif codec == "ima":
        if ch != 1:
            raise NotImplementedError("IMA ADPCM encode: mono only")
        block_align, spb = 256, (256 - 4) * 2 + 1  # 505 samples/block
        flat = s.ravel().astype(np.int64)
        parts, idx = [], 0
        for off in range(0, len(flat), spb):
            chunk = flat[off : off + spb]
            if len(chunk) < spb:  # zero-pad the trailing block
                chunk = np.concatenate([chunk, np.zeros(spb - len(chunk), dtype=np.int64)])
            blk, idx = ima_adpcm_encode_block(chunk, idx)
            parts.append(blk)
        bits, body, tag, block = 4, b"".join(parts), 0x11, block_align
        byterate = (sample_rate * block_align + spb - 1) // spb
        extra = struct.pack("<HH", 2, spb)
        chunks = b"fact" + struct.pack("<II", 4, n)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    fmt = struct.pack("<HHIIHH", tag, ch, sample_rate, byterate, block, bits) + extra
    payload = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + chunks
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples[n, channels] int16/uint8, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, body, fact_n = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        chunk = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif tag == b"data":
            body = chunk
        elif tag == b"fact" and size >= 4:
            (fact_n,) = struct.unpack_from("<I", chunk, 0)
        pos += 8 + size + (size & 1)
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt/data chunk")
    codec, ch, rate, _, block_align, bits = fmt
    if codec == 1 and bits in (8, 16):
        dt = np.uint8 if bits == 8 else np.dtype("<i2")
        arr = np.frombuffer(body, dtype=dt)
    elif codec in (6, 7) and bits == 8:  # G.711 A-law / u-law
        dec = ulaw_decode if codec == 7 else alaw_decode
        arr = dec(np.frombuffer(body, dtype=np.uint8))
    elif codec == 0x11 and bits == 4:  # IMA/DVI ADPCM
        if ch != 1:
            raise NotImplementedError("IMA ADPCM decode: mono only")
        spb = (block_align - 4) * 2 + 1
        n_blocks = (len(body) + block_align - 1) // block_align
        n = fact_n if fact_n is not None else n_blocks * spb
        arr = ima_adpcm_decode(body, block_align, n)
    else:
        raise NotImplementedError(
            f"WAV codec {codec}/{bits}-bit unsupported (PCM 8/16, G.711, IMA ADPCM)"
        )
    return arr.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# dispatch + feature extraction


def _audio_features(samples: "np.ndarray", rate: int) -> dict:
    """Shared audio feature dict for decode_media (WAV + FLAC branches):
    rms/mean + sample-count/rate, width = n samples, height = channels."""
    x = samples.astype(np.float64)
    return {
        "width": int(samples.shape[0]),
        "height": int(samples.shape[1]),
        "feature": [
            float(np.sqrt(np.mean(x**2))),
            float(x.mean()),
            float(len(samples)),
            float(rate),
        ],
    }


def decode_media(payload: bytes) -> dict:
    """Sniff + decode a binary payload; the REAL ``media_features`` decoder.

    Returns the ``multimodal.FEATURE_SCHEMA`` dict: width/height + a
    4-dim feature (pixel mean/std/min/max for images; rms/mean and
    sample-count/rate for audio).  Raises NotImplementedError with the
    detected container for formats needing a codec library (JPEG, ...).
    """
    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
    elif payload[:2] == b"BM":
        img = decode_bmp(payload)
    elif payload[:2] in (b"P5", b"P6"):
        img = decode_ppm(payload)
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, rate = decode_wav(payload)
        return _audio_features(samples, rate)
    elif payload[:3] == b"\xff\xd8\xff":
        img = decode_jpeg(payload)  # baseline or progressive
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        img = decode_gif(payload)  # first frame
    elif payload[:4] in (b"II*\x00", b"MM\x00*"):
        img = decode_tiff(payload)
    elif payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
        samples, rate = decode_aiff(payload)
        return _audio_features(samples, rate)
    elif payload[:4] == b".snd":
        samples, rate = decode_au(payload)
        return _audio_features(samples, rate)
    elif payload[:4] == b"fLaC":
        samples, rate = decode_flac(payload)
        return _audio_features(samples, rate)
    else:
        raise NotImplementedError(f"unknown media container (magic {payload[:4]!r})")
    x = img.astype(np.float64)
    return {
        "width": int(img.shape[1]),
        "height": int(img.shape[0]),
        "feature": [float(x.mean()), float(x.std()), float(x.min()), float(x.max())],
    }


def resize_bilinear(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized bilinear resample (align_corners=False convention)."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def real_resize(payload: bytes, width: int, height: int) -> bytes:
    """Decode -> bilinear resize -> re-encode PNG (the real
    ``multimodal.resize_media`` resampler for supported containers)."""
    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
    elif payload[:2] == b"BM":
        img = decode_bmp(payload)
    elif payload[:2] in (b"P5", b"P6"):
        img = decode_ppm(payload)
    else:
        raise NotImplementedError("resize supports PNG/BMP/PPM payloads")
    return encode_png(resize_bilinear(img, width, height))


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a): LZW-compressed indexed color, from the public GIF spec.
# Decode handles global/local color tables, interlacing, GCE transparency
# metadata, and multi-frame files (decode_gif returns the first frame;
# gif_frame_count counts frames without decoding pixels).  Encode writes a
# single-frame GIF87a with a real variable-width LZW compressor.


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor): clear/EOI codes, table grows to
    4096 entries, code width grows AFTER the table fills a width."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bitstream, LSB first
    bits = 0
    n_bits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
    prev: bytes | None = None
    while pos < len(data) or n_bits >= width:
        while n_bits < width and pos < len(data):
            bits |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        if n_bits < width:
            break
        code = bits & ((1 << width) - 1)
        bits >>= width
        n_bits -= width
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError(f"bad LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if n_out >= n_pixels:
            break
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError(f"LZW underrun: {n_out}/{n_pixels} pixels")
    return out


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW compressor: emits an initial clear code, grows code width
    with the table, re-clears at 4096 (the spec maximum)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    bits = 0
    n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bits, n_bits
        bits |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            n_bits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    run = b""
    for b in indices.tobytes():
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if n_bits:
        out.append(bits & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> RGB uint8 array [h, w, 3] (first frame, composed on
    the global background for frames smaller than the screen)."""
    frames = decode_gif_frames(data, max_frames=1)
    return frames[0]


def gif_frame_count(data: bytes) -> int:
    """Number of image descriptors (frames) without decoding pixels."""
    return len(_gif_scan(data, decode_pixels=False))


def _gif_scan(data: bytes, decode_pixels: bool, max_frames: int | None = None) -> list:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    frames = []
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                gflags = data[pos + 1]
                transparent = data[pos + 4] if gflags & 1 else None
            while data[pos]:  # skip sub-blocks
                pos += data[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
                pos += 3 * n
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                cnt = data[pos]
                lzw += data[pos + 1 : pos + 1 + cnt]
                pos += cnt + 1
            pos += 1
            if decode_pixels:
                if ct is None:
                    raise ValueError("GIF image with no color table")
                idx = _gif_lzw_decode(bytes(lzw), min_code, iw * ih).reshape(ih, iw)
                if iflags & 0x40:  # interlaced: rows stored in 4 passes
                    de = np.empty_like(idx)
                    src = 0
                    for start, step in _GIF_INTERLACE_PASSES:
                        rows = range(start, ih, step)
                        for r in rows:
                            de[r] = idx[src]
                            src += 1
                    idx = de
                frames.append(((ix, iy, iw, ih), ct, idx, transparent, (w, h)))
            else:
                frames.append(((ix, iy, iw, ih), None, None, transparent, (w, h)))
            transparent = None
            if max_frames is not None and len(frames) >= max_frames:
                break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    return frames


def decode_gif_frames(data: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """Decode up to ``max_frames`` frames to RGB [h, w, 3] each (each frame
    composed alone on black; animation disposal is out of scope)."""
    out = []
    for (ix, iy, iw, ih), ct, idx, transparent, (w, h) in _gif_scan(
        data, decode_pixels=True, max_frames=max_frames
    ):
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        frame = ct[idx]
        if transparent is not None:
            frame = np.where((idx == transparent)[..., None], 0, frame)
        rgb[iy : iy + ih, ix : ix + iw] = frame
        out.append(rgb)
    return out


def encode_gif(img: np.ndarray) -> bytes:
    """Grayscale [h,w] or RGB [h,w,3] uint8 -> single-frame GIF87a.

    RGB input must use <= 256 distinct colors (indexed format); grayscale
    always fits via the identity 256-gray palette.
    """
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idx = a
    else:
        colors, inverse = np.unique(a.reshape(-1, 3), axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"GIF needs <=256 colors, got {len(colors)}")
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        idx = inverse.astype(np.uint8).reshape(a.shape[:2])
    h, w = idx.shape
    head = b"GIF87a" + struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0) + palette.tobytes()
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _gif_lzw_encode(idx.ravel(), 8)
    blocks = bytearray([8])  # min code size
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return head + desc + bytes(blocks) + b"\x3b"


# ---------------------------------------------------------------------------
# TIFF (baseline TIFF 6.0 from the public spec): both byte orders, strip
# organization, Compression 1 (none) / 32773 (PackBits) / 5 (TIFF-LZW with
# MSB-first bit packing, 9->12-bit codes, "early change" width bumps) and
# Predictor 2 (horizontal differencing).  Gray and RGB, 8 bits/sample.


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append(257 - run & 0xFF)  # -(run-1) as signed byte
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch: until a 3-run starts (2-runs are cheaper literal)
        j = i
        while j + 1 < n and j - i < 127:
            if j + 2 < n and data[j + 1] == data[j + 2] and (
                j + 3 >= n or data[j + 3] == data[j + 1]
            ):
                break
            j += 1
        out.append(j - i)
        out.extend(data[i : j + 1])
        i = j + 1
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out.extend(data[i : i + n + 1])
            i += n + 1
        elif n > 128:
            out.extend(bytes([data[i]]) * (257 - n))
            i += 1
        # n == 128: noop
    if len(out) < expected:
        raise ValueError(f"PackBits underrun: {len(out)}/{expected}")
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW: MSB-first bits, clear=256/EOI=257, table grows
    from 9-bit codes with the EARLY-CHANGE width bump (at 2^w - 1)."""
    out = bytearray()
    bits = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bits, nbits
        bits = (bits << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bits >> nbits) & 0xFF)

    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        elif next_code >= 4094:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(257, width)
    if nbits:
        out.append((bits << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    bits = 0
    nbits = 0
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError(f"TIFF LZW underrun: {len(out)}/{expected}")
            bits = (bits << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (bits >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == 257:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"bad TIFF LZW code {code}")
        out.extend(entry)
        prev = entry
        # early change, decoder side: the decoder's table trails the
        # encoder's by ONE deferred entry, so it must widen one entry
        # earlier than its own fill level suggests
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError(f"TIFF LZW underrun: {len(out)}/{expected}")
    return bytes(out[:expected])


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Gray [h,w] or RGB [h,w,3] uint8 -> single-strip TIFF.
    ``compression``: 1 none, 5 LZW, 32773 PackBits; ``predictor`` 2 =
    horizontal differencing (LZW only, per the spec)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    if predictor == 2:
        raw = np.concatenate([a[:, :1, :], np.diff(a.astype(np.int16), axis=1)], axis=1)
        raw = (raw % 256).astype(np.uint8).tobytes()
    else:
        raw = a.tobytes()
    if compression == 1:
        strip = raw
    elif compression == 5:
        strip = _tiff_lzw_encode(raw)
    elif compression == 32773:
        strip = _packbits_encode(raw)
    else:
        raise ValueError(f"unsupported compression {compression}")

    e = ">" if big_endian else "<"
    n_tags = 11
    ifd_off = 8
    strip_off = ifd_off + 2 + n_tags * 12 + 4 + 2 * spp  # after IFD + BitsPerSample array

    def tag(t: int, typ: int, cnt: int, val: int) -> bytes:
        head_ = struct.pack(f"{e}HHI", t, typ, cnt)
        if typ == 3 and cnt == 1:
            # inline values are LEFT-justified in the 4-byte slot: a
            # count-1 SHORT occupies the first two bytes in EITHER order
            return head_ + struct.pack(f"{e}H", val) + b"\x00\x00"
        return head_ + struct.pack(f"{e}I", val)

    bps_off = ifd_off + 2 + n_tags * 12 + 4
    bps_val = bps_off if spp == 3 else 8  # inline when it fits (SHORT count 1)
    entries = b"".join(
        [
            tag(256, 3, 1, w),
            tag(257, 3, 1, h),
            tag(258, 3, spp, bps_val),
            tag(259, 3, 1, compression),
            tag(262, 3, 1, 1 if spp == 1 else 2),  # BlackIsZero / RGB
            tag(273, 4, 1, strip_off),
            tag(277, 3, 1, spp),
            tag(278, 3, 1, h),
            tag(279, 4, 1, len(strip)),
            tag(284, 3, 1, 1),  # chunky
            tag(317, 3, 1, predictor),
        ]
    )
    head = struct.pack(f"{e}2sHI", b"MM" if big_endian else b"II", 42, ifd_off)
    ifd = struct.pack(f"{e}H", n_tags) + entries + struct.pack(f"{e}I", 0)
    bps_arr = struct.pack(f"{e}3H", 8, 8, 8) if spp == 3 else b"\x00\x00"
    return head + ifd + bps_arr + strip


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF -> [h, w, channels] uint8 (8-bit gray/RGB, strips, compression
    none/LZW/PackBits, predictor 1/2, either byte order)."""
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(f"{e}I", data, 4)
    (n_tags,) = struct.unpack_from(f"{e}H", data, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        t, typ, cnt = struct.unpack_from(f"{e}HHI", data, off)
        (val,) = struct.unpack_from(f"{e}I", data, off + 8)
        if typ == 3 and cnt == 1:  # SHORT packs in the first 2 bytes
            (val,) = struct.unpack_from(f"{e}H", data, off + 8)
        tags[t] = (typ, cnt, val)

    def arr(t: int, default=None) -> list[int]:
        if t not in tags:
            if default is None:
                raise ValueError(f"TIFF missing tag {t}")
            return default
        typ, cnt, val = tags[t]
        size, fmt = (2, "H") if typ == 3 else (4, "I")
        if cnt * size <= 4:
            out = [val]
            if cnt == 2 and typ == 3:
                out = list(struct.unpack_from(f"{e}2H", data, _tag_value_off(ifd_off, t, tags)))
            return out[:cnt]
        return list(struct.unpack_from(f"{e}{cnt}{fmt}", data, val))

    def _tag_value_off(ifd_off: int, t: int, tags) -> int:
        idx = sorted(tags).index(t)  # tags are written sorted per spec
        return ifd_off + 2 + idx * 12 + 8

    w = tags[256][2]
    h = tags[257][2]
    spp = tags.get(277, (3, 1, 1))[2]
    comp = tags.get(259, (3, 1, 1))[2]
    predictor = tags.get(317, (3, 1, 1))[2]
    bps = arr(258, default=[8])
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bits-per-sample {bps} unsupported (8 only)")
    rows_per_strip = tags.get(278, (3, 1, h))[2]
    offs = arr(273)
    counts = arr(279)
    raw = bytearray()
    for i, (o, c) in enumerate(zip(offs, counts)):
        rows = min(rows_per_strip, h - i * rows_per_strip)
        expected = rows * w * spp
        chunk = data[o : o + c]
        if comp == 1:
            raw.extend(chunk[:expected])
        elif comp == 5:
            raw.extend(_tiff_lzw_decode(chunk, expected))
        elif comp == 32773:
            raw.extend(_packbits_decode(chunk, expected))
        else:
            raise NotImplementedError(f"TIFF compression {comp} unsupported")
    a = np.frombuffer(bytes(raw), dtype=np.uint8, count=h * w * spp).reshape(h, w, spp)
    if predictor == 2:
        a = np.cumsum(a.astype(np.int64), axis=1).astype(np.uint8).copy()
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    return a


# ---------------------------------------------------------------------------
# AIFF (Apple/EA IFF-85): big-endian PCM in FORM/COMM/SSND chunks; the
# sample rate is an IEEE 754 80-bit extended float — parsed for real.


def _f80_encode(x: float) -> bytes:
    """float -> 80-bit extended (1 sign, 15 exp bias 16383, 64-bit
    mantissa with EXPLICIT integer bit)."""
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    e = 0
    while x >= 2.0:
        x /= 2.0
        e += 1
    while x < 1.0:
        x *= 2.0
        e -= 1
    mant = int(x * (1 << 63))
    return struct.pack(">HQ", sign | (e + 16383), mant)


def _f80_decode(b: bytes) -> float:
    se, mant = struct.unpack(">HQ", b[:10])
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    sign = -1.0 if se & 0x8000 else 1.0
    exp = (se & 0x7FFF) - 16383
    return sign * (mant / float(1 << 63)) * (2.0**exp)


def encode_aiff(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono/stereo int16 PCM -> AIFF bytes (big-endian samples)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    comm = struct.pack(">hIh", ch, n, 16) + _f80_encode(float(sample_rate))
    body = s.astype(">i2").tobytes()
    ssnd = struct.pack(">II", 0, 0) + body  # offset, block size
    payload = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(payload)) + payload


def decode_aiff(data: bytes) -> tuple[np.ndarray, int]:
    """AIFF bytes -> (samples[n, ch] int16, sample_rate)."""
    if data[:4] != b"FORM" or data[8:12] != b"AIFF":
        raise ValueError("not an AIFF file")
    pos, comm, body = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from(">I", data, pos + 4)
        chunk = data[pos + 8 : pos + 8 + size]
        if tag == b"COMM":
            ch, n, bits = struct.unpack_from(">hIh", chunk, 0)
            rate = int(round(_f80_decode(chunk[8:18])))
            comm = (ch, n, bits, rate)
        elif tag == b"SSND":
            off, _blk = struct.unpack_from(">II", chunk, 0)
            body = chunk[8 + off :]
        pos += 8 + size + (size & 1)  # chunks pad to even
    if comm is None or body is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    ch, n, bits, rate = comm
    if bits != 16:
        raise NotImplementedError(f"AIFF {bits}-bit unsupported (16 only)")
    arr = np.frombuffer(body, dtype=">i2", count=n * ch).astype(np.int16)
    return arr.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# AU (Sun/NeXT ".snd"): the simplest real audio container — big-endian
# header (magic, data offset, data size, encoding, rate, channels).


def encode_au(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono/stereo int16 PCM -> AU bytes (encoding 3 = 16-bit linear)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    body = s.astype(">i2").tobytes()
    return struct.pack(">4s5I", b".snd", 24, len(body), 3, sample_rate, s.shape[1]) + body


def decode_au(data: bytes) -> tuple[np.ndarray, int]:
    """AU bytes -> (samples[n, ch] int16, sample_rate); G.711 encodings
    1 (u-law) and 27 (A-law) decode through the companding tables."""
    magic, off, size, enc, rate, ch = struct.unpack_from(">4s5I", data, 0)
    if magic != b".snd":
        raise ValueError("not an AU file")
    body = data[off : off + size] if size != 0xFFFFFFFF else data[off:]
    if enc == 3:
        arr = np.frombuffer(body, dtype=">i2").astype(np.int16)
    elif enc == 1:
        arr = ulaw_decode(np.frombuffer(body, dtype=np.uint8))
    elif enc == 27:
        arr = alaw_decode(np.frombuffer(body, dtype=np.uint8))
    else:
        raise NotImplementedError(f"AU encoding {enc} unsupported (1/3/27)")
    return arr.reshape(-1, ch), rate
