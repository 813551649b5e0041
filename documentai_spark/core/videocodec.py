"""Pure-stdlib uncompressed AVI (RIFF) video codec + frame features.

The reference's multimodal surface treats video as opaque payloads with
typed metadata; this sandbox has no ffmpeg, but an UNCOMPRESSED AVI is
just a RIFF container walk over DIB frames — the same pure-``struct``
move WAV was (core/audiocodec.py) and PNG/BMP were (core/imagecodec.py).
So the video leg decodes REAL bytes:

- **AVI** — RIFF 'AVI ' walk: ``hdrl`` list (``avih`` main header for
  the frame rate, ``strl``/``strf`` BITMAPINFOHEADER for geometry),
  ``movi`` list with ``00db``/``00dB`` uncompressed frames. Supported
  DIBs are the BMP subset imagecodec already handles: BI_RGB (no
  compression), 8-bit palettized and 24-bit BGR, bottom-up or top-down,
  4-byte-aligned rows. Frames decode to H x W uint8 grayscale with the
  SAME BT.601 integer luma as every image path (``imagecodec._luma``).
  Compressed AVIs (MJPG/h264/...) and other containers (mp4/mkv/webm)
  raise ``NotImplementedError`` — the 'decoder_unavailable' lane,
  exactly like JPEG in the image path and non-PCM in the audio path.
  Structural damage (bad magic after RIFF sniff, truncated chunk, frame
  size mismatch, missing format) raises ``ValueError`` — 'corrupt'.

Features are per-sampled-frame mean brightness over ``n_frames``
evenly-spaced frames (the keyframe-sample analog the fake decoder only
pretended to compute); the full per-frame rasters feed
``imagecodec.pixel_quality`` unchanged.

An encoder exists so tests and the synthetic media table round-trip real
bytes without third-party dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

from documentai_spark.core.imagecodec import _luma


def decode_avi(data: bytes) -> tuple[float, list[np.ndarray]]:
    """Uncompressed RIFF/AVI -> (fps, [H x W uint8 grayscale frames]).

    Raises ValueError on structural corruption, NotImplementedError on
    compressed streams / unsupported bit depths / non-AVI containers.
    """
    if data[:4] != b"RIFF":
        # unknown container magic (mp4/mkv/webm/...) = the
        # 'decoder_unavailable' lane, mirroring decode_image on JPEG
        raise NotImplementedError("not a RIFF container")
    if len(data) < 12:
        # RIFF magic but not even a full header: structural damage, so
        # the 'corrupt' lane — the lane must not flip on truncation depth
        raise ValueError("truncated RIFF header")
    if data[8:12] != b"AVI ":
        raise ValueError("RIFF but not AVI")

    geom: dict = {}
    fps = 0.0
    stream_type = b""   # current strl's strh fccType (b"" = untyped)
    strl_idx = -1       # strl lists entered so far - 1 (= stream index)
    frames_raw: list[tuple[bytes, int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps, stream_type, strl_idx
        while pos + 8 <= end:
            cid, clen = struct.unpack_from("<4sI", data, pos)
            body = pos + 8
            if body + clen > len(data):
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                if clen < 4:
                    raise ValueError("short LIST chunk")
                if data[body:body + 4] == b"strl":
                    strl_idx += 1
                    stream_type = b""   # typed by this strl's strh only
                walk(body + 4, body + clen)
            elif cid == b"avih":
                if clen < 4:
                    raise ValueError("short avih chunk")
                usec = struct.unpack_from("<I", data, body)[0]
                fps = 1e6 / usec if usec else 0.0
            elif cid == b"strh":
                if clen < 4:
                    raise ValueError("short strh chunk")
                stream_type = data[body:body + 4]
            elif cid == b"strf" and not geom \
                    and stream_type in (b"vids", b""):
                # only the VIDEO stream's format chunk is a
                # BITMAPINFOHEADER — an AVI whose first strl is audio
                # carries a WAVEFORMATEX here, which must be skipped,
                # not parsed as geometry (ADVICE r5). An strl with no
                # strh stays accepted (minimal hand-built files).
                if clen < 40:
                    raise ValueError("short strf chunk")
                bisize, w, h, _planes, bpp, comp = \
                    struct.unpack_from("<IiiHHI", data, body)
                if comp != 0:
                    raise NotImplementedError(f"AVI compression {comp}")
                if bpp not in (8, 24):
                    raise NotImplementedError(f"AVI DIB bpp {bpp}")
                if w <= 0 or h == 0:
                    raise ValueError("invalid AVI geometry")
                pal = None
                if bpp == 8:
                    n_colors = struct.unpack_from("<I", data, body + 32)[0] \
                        or 256
                    pal_off = body + bisize
                    if pal_off + n_colors * 4 > body + clen:
                        raise ValueError("truncated AVI palette")
                    raw = np.frombuffer(data, np.uint8, count=n_colors * 4,
                                        offset=pal_off).reshape(n_colors, 4)
                    # BGR0 entries -> luma LUT (decode_bmp convention)
                    pal = _luma(raw[:, [2, 1, 0]].reshape(n_colors, 1, 3)) \
                        .reshape(n_colors)
                geom.update(w=w, h=h, bpp=bpp, pal=pal,
                            stream_idx=max(strl_idx, 0))
            elif cid[2:4] in (b"db", b"dB") and cid[:2].isdigit():
                # movi chunk of ANY stream; filtered to the video
                # stream's index after the walk (hdrl precedes movi, so
                # the index is known by then)
                frames_raw.append((cid, body, clen))
            pos = body + clen + (clen & 1)  # chunks are word-aligned

    walk(12, len(data))
    if not geom:
        raise ValueError("AVI missing stream format")
    vid_tag = b"%02d" % geom["stream_idx"]
    frames_raw = [(off, clen) for cid, off, clen in frames_raw
                  if cid[:2] == vid_tag]
    w, h_signed, bpp, pal = geom["w"], geom["h"], geom["bpp"], geom["pal"]
    flip = h_signed > 0                      # bottom-up DIB rows
    h = abs(h_signed)
    stride = ((bpp * w + 31) // 32) * 4
    frames: list[np.ndarray] = []
    for off, clen in frames_raw:
        if clen < stride * h:
            raise ValueError("AVI frame data length mismatch")
        rows = np.frombuffer(data, np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)
        if bpp == 8:
            gray = pal[rows[:, :w]]
        else:
            px = rows[:, :w * 3].reshape(h, w, 3)
            gray = _luma(px[:, :, [2, 1, 0]])        # BGR -> RGB luma
        frames.append(gray[::-1].copy() if flip else gray.copy())
    return fps, frames


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """8-bit palettized uncompressed AVI writer (grayscale identity
    palette, bottom-up frames) for tests/fixtures."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    stride = ((w + 3) // 4) * 4
    pal = b"".join(bytes((v, v, v, 0)) for v in range(256))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h,
                       0, 0, 256, 0) + pal
    strh = struct.pack("<4s4sIHHIIIIIIiI4H", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, fps, 0, len(frames), stride * h, -1, 0,
                       0, 0, w, h)
    avih = struct.pack("<IIIIIIIIII4I", 1_000_000 // fps,
                       stride * h * fps, 0, 0, len(frames), 0, 1,
                       stride * h, w, h, 0, 0, 0, 0)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload \
            + (b"\x00" if len(payload) & 1 else b"")

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    movi = b""
    for g in frames:
        g = np.asarray(g, dtype=np.uint8)
        if g.shape != (h, w):
            raise ValueError("inconsistent frame shapes")
        body = bytearray()
        for y in range(h - 1, -1, -1):       # bottom-up
            row = g[y].tobytes()
            body += row + b"\x00" * (stride - w)
        movi += chunk(b"00db", bytes(body))
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    payload = b"AVI " + hdrl + lst(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def sample_frames(frames: list[np.ndarray],
                  n: int) -> list[np.ndarray | None]:
    """n evenly-spaced frames (keyframe-sampling analog): index
    floor(i * len / n). Empty input yields all-None; deterministic."""
    m = len(frames)
    if m == 0:
        return [None] * n
    return [frames[(i * m) // n] for i in range(n)]


def frame_features(frames: list[np.ndarray], n_frames: int = 16) -> list[float]:
    """Per-sampled-frame mean brightness in [0, 1] over n_frames evenly
    spaced frames (missing frames -> 0.0)."""
    out = []
    for f in sample_frames(frames, n_frames):
        out.append(0.0 if f is None else float(f.mean()) / 255.0)
    return out
