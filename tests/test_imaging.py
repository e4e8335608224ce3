"""Codec-level tests for the pure-stdlib media decoders: PNG round
trips (all shapes), PNG decode of FOREIGN-filtered scanlines (the
encoder only writes filter 0, so these prove the decoder reads other
writers' files), CRC rejection, WAV and Y4M round trips, resize."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pandasqlite_spark.functions import imaging as im


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize(
    "shape", [(4, 4), (5, 3), (1, 1), (4, 4, 3), (3, 5, 4), (16, 16)]
)
def test_png_roundtrip(shape):
    img = _rng(sum(shape)).integers(0, 256, size=shape, dtype=np.uint8)
    back = im.decode_png(im.encode_png(img))
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types —
    exercising decode paths encode_png never emits."""
    h, w = img.shape[:2]
    nch = 1 if img.ndim == 2 else img.shape[2]
    ct = {1: 0, 3: 2, 4: 6}[nch]
    flat = img.reshape(h, w * nch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for r in range(h):
        f = filters[r % len(filters)]
        line = flat[r]
        enc = np.zeros(w * nch, dtype=np.int32)
        for x in range(w * nch):
            left = int(line[x - nch]) if x >= nch else 0
            up = int(prev[x])
            ul = int(prev[x - nch]) if x >= nch else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) // 2,
                4: im._paeth(left, up, ul),
            }[f]
            enc[x] = (int(line[x]) - pred) & 255
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_foreign_filters(filters):
    img = _rng(11).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(im.decode_png(_png_with_filters(img, filters)), img)


def test_png_bad_crc_rejected():
    data = bytearray(im.encode_png(np.zeros((2, 2), np.uint8)))
    data[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        im.decode_png(bytes(data))


def test_png_not_a_png():
    with pytest.raises(ValueError, match="signature"):
        im.decode_png(b"JFIF not a png at all")


def test_wav_roundtrip():
    samples = _rng(3).integers(-32768, 32767, size=256, dtype=np.int16)
    rate, nch, back = im.decode_wav(im.encode_wav(samples, sample_rate=16000))
    assert (rate, nch) == (16000, 1)
    assert np.array_equal(back, samples)


def test_y4m_roundtrip():
    frames = _rng(5).integers(0, 256, size=(4, 6, 8), dtype=np.uint8)
    w, h, back = im.decode_y4m(im.encode_y4m(frames))
    assert (w, h) == (8, 6)
    assert np.array_equal(back, frames)


def test_resize_area_matches_block_means():
    img = _rng(9).integers(0, 256, size=(4, 4), dtype=np.uint8)
    pooled = im.resize_area(img[..., None], 2)
    for r in range(2):
        for c in range(2):
            want = int(img[2 * r : 2 * r + 2, 2 * c : 2 * c + 2].astype(int).sum()) // 4
            assert pooled[r, c] == want


def test_resize_bilinear_identity_and_constant():
    img = _rng(13).integers(0, 256, size=(8, 8), dtype=np.uint8)
    assert np.array_equal(im.resize_bilinear(img, 8, 8), img)
    const = np.full((6, 6), 77, np.uint8)
    assert np.all(im.resize_bilinear(const, 3, 9) == 77)


def test_decode_dispatch_rejects_foreign_formats():
    from pandasqlite_spark.functions import multimodal as mm

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff\xe0JFIF-like")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x03mp3-like")
    with pytest.raises(NotImplementedError):
        mm.sample_video_frames(b"\x00\x00\x00\x18ftypmp42")


def test_resize_image_binary_roundtrip():
    from pandasqlite_spark.functions import multimodal as mm

    img = _rng(21).integers(0, 256, size=(4, 4), dtype=np.uint8)
    thumb_png = mm.resize_image(im.encode_png(img), 2)
    thumb = im.decode_png(thumb_png)
    assert thumb.shape == (2, 2)
    want = img.astype(int).reshape(2, 2, 2, 2).sum(axis=(1, 3)) // 4
    assert np.array_equal(thumb, want)


def test_resize_area_rgb():
    # round-3 ADVICE: unconditional squeeze(-1) raised ValueError on
    # multi-channel input — RGB must mean-pool per channel
    img = _rng(22).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    pooled = im.resize_area(img, 2)
    assert pooled.shape == (2, 2, 3)
    want = img.astype(int).reshape(2, 2, 2, 2, 3).sum(axis=(1, 3)) // 4
    assert np.array_equal(pooled, want)


def test_resize_image_rgb_roundtrip():
    from pandasqlite_spark.functions import multimodal as mm

    img = _rng(23).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    thumb = im.decode_png(mm.resize_image(im.encode_png(img), 2))
    assert thumb.shape == (2, 2, 3)
    want = img.astype(int).reshape(2, 2, 2, 2, 3).sum(axis=(1, 3)) // 4
    assert np.array_equal(thumb, want)
