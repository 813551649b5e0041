"""Unit tests for the pure-stdlib image codecs (no Spark session):
round-trips are covered in test_multimodal; here the decoder edge cases —
top-down BMP, 32-bit BMP, color PPM, multi-IDAT PNG, corrupt inputs."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from documentai_spark.core.imagecodec import (
    PNG_MAGIC, _luma, decode_bmp, decode_image, decode_png, decode_pnm,
    encode_bmp, encode_png, pixel_quality,
)


def _chunk(t: bytes, p: bytes) -> bytes:
    return (struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", zlib.crc32(t + p)))


def test_png_multiple_idat_chunks():
    g = (np.arange(300, dtype=np.uint8) % 251).reshape(15, 20)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(15))
    comp = zlib.compress(raw)
    half = len(comp) // 2
    png = (PNG_MAGIC
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 20, 15, 8, 0, 0, 0, 0))
           + _chunk(b"IDAT", comp[:half]) + _chunk(b"IDAT", comp[half:])
           + _chunk(b"IEND", b""))
    assert (decode_png(png) == g).all()


def test_png_rgba_uses_rgb_luma():
    rgba = (np.arange(4 * 3 * 4, dtype=np.uint8) * 5 % 251) \
        .reshape(3, 4, 4)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    png = (PNG_MAGIC
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert (decode_png(png) == _luma(rgba[:, :, :3])).all()


def _bmp(gray: np.ndarray, bpp: int, topdown: bool) -> bytes:
    h, w = gray.shape
    nch = bpp // 8
    stride = ((bpp * w + 31) // 32) * 4
    body = bytearray()
    rows = range(h) if topdown else range(h - 1, -1, -1)
    for y in rows:
        row = np.repeat(gray[y], nch)
        if nch == 4:  # BGRA: alpha slot arbitrary
            row = row.copy()
            row[3::4] = 255
        row = row.tobytes()
        body += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if topdown else h, 1,
                       bpp, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def test_bmp_topdown_and_32bit():
    g = (np.arange(8 * 5, dtype=np.uint8) * 7 % 251).reshape(5, 8)
    # gray replicated into BGR(A) -> luma returns the same gray value
    assert (decode_bmp(_bmp(g, 24, topdown=True)) == g).all()
    assert (decode_bmp(_bmp(g, 32, topdown=False)) == g).all()


def test_ppm_p6_color():
    rgb = (np.arange(6 * 4 * 3, dtype=np.uint8) * 11 % 251).reshape(4, 6, 3)
    ppm = b"P6\n# a comment\n6 4\n255\n" + rgb.tobytes()
    assert (decode_pnm(ppm) == _luma(rgb)).all()


def test_decode_image_rejects_unknown_and_corrupt():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xffJPEG")
    with pytest.raises((ValueError, Exception)):
        decode_png(PNG_MAGIC + b"\x00\x00")  # truncated
    with pytest.raises(NotImplementedError):
        # RLE-compressed BMP (compression=1)
        hdr = struct.pack("<2sIHHI", b"BM", 100, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, 2, 2, 1, 8, 1, 16, 0, 0, 0, 0)
        decode_bmp(hdr + b"\x00" * 46)


def test_pixel_quality_bounds():
    g = (np.arange(1200, dtype=np.uint8) % 256).reshape(30, 40)
    q = pixel_quality(g)
    assert set(q) == {"px_blank", "px_brightness", "px_contrast",
                      "px_shadow", "px_glare"}
    for v in q.values():
        assert 0.0 <= v <= 1.0


def test_encoders_reject_nothing_but_roundtrip_dtype():
    g = np.array([[0, 255], [128, 7]], dtype=np.uint8)
    assert (decode_image(encode_png(g)) == g).all()
    assert (decode_image(encode_bmp(g)) == g).all()


def test_corrupt_dimension_and_palette_guards():
    """r7 review: a 0x0 image raised ZeroDivisionError in the pixel
    kernels and an out-of-palette BMP index raised IndexError — neither
    is in the corrupt-lane catch tuples, so one bad payload crashed the
    Spark task. Both now raise ValueError at decode (the corrupt lane)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from documentai_spark.core.imagecodec import decode_image

    def chunk(t, p):
        return (struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p)))

    zero_png = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 0, 0,
                                             0, 0))
                + chunk(b"IDAT", zlib.compress(b""))
                + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="dimensions"):
        decode_image(zero_png)

    with pytest.raises(ValueError, match="dimensions"):
        decode_image(b"P5\n0 0\n255\n")

    # 8-bit BMP: biClrUsed=16 palette but a pixel byte of 200
    w = h = 2
    stride = ((8 * w + 31) // 32) * 4
    pal = bytes(range(16 * 4))
    px = bytes([200, 1] + [0] * (stride - 2)) * h
    pix_off = 14 + 40 + len(pal)
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(px), 0, 0,
                         pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(px),
                       2835, 2835, 16, 16)
    with pytest.raises(ValueError, match="palette index"):
        decode_image(header + info + pal + px)


def test_png_all_filters_roundtrip_against_reference_encoder():
    """r7: the Sub path is now a vectorized modular prefix sum and
    Average/Paeth run on plain-int lists — verify reconstruction
    against an independent per-pixel reference FILTER encoder across
    all five filter types on RGB data."""
    import struct
    import zlib

    import numpy as np

    from documentai_spark.core.imagecodec import decode_png

    rng = np.random.default_rng(7)
    w, h, ch = 31, 10, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    stride = w * ch
    ftypes = [0, 1, 2, 3, 4, 1, 4, 3, 2, 1]

    def filt(y, ftype):
        line = img[y].reshape(-1).astype(int)
        prev = img[y - 1].reshape(-1).astype(int) if y else [0] * stride
        out = []
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2}.get(ftype)
            if pred is None:                      # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            out.append((line[x] - pred) & 0xFF)
        return bytes([ftype]) + bytes(out)

    def chunk(t, p):
        return (struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p)))

    raw = b"".join(filt(y, ftypes[y]) for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    dec = decode_png(png)
    r = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    b = img[..., 2].astype(np.uint32)
    want = ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)
    assert (dec == want).all()
