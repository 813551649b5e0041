"""Pure-stdlib WAV/PCM audio codec + frame-energy features.

The reference's multimodal surface treats audio as opaque payloads with
typed metadata; this sandbox has no ffmpeg/soundfile, but RIFF/WAVE PCM
is a pure ``struct`` format the same way PNG was pure ``zlib``
(core/imagecodec.py). So the audio leg decodes REAL bytes:

- **WAV** — RIFF container walk, ``fmt `` chunk (PCM only, 8-bit
  unsigned / 16-bit signed little-endian), ``data`` chunk; multi-channel
  inputs are averaged to mono. Non-PCM formats (IEEE float, ADPCM,
  WAVE_FORMAT_EXTENSIBLE) raise ``NotImplementedError`` — the
  'decoder_unavailable' lane, exactly like JPEG in the image path.
  Structural damage (bad magic, truncated chunk, sample-length mismatch)
  raises ``ValueError`` — the 'corrupt' lane.

Features are per-frame RMS energies over ``n_frames`` contiguous frames
— the frame-energy analog the fake decoder only pretended to compute.
Everything is deterministic and vectorized (no per-sample Python loops).

An encoder exists so tests and the synthetic media table round-trip real
bytes without third-party dependencies.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM -> (sample_rate, mono float64 samples in [-1, 1]).

    Raises ValueError on structural corruption, NotImplementedError on
    non-PCM encodings / unsupported bit depths.
    """
    if data[:4] != b"RIFF":
        # unknown container magic (ogg/opus/mp3/...) = the
        # 'decoder_unavailable' lane, mirroring decode_image on JPEG magic
        raise NotImplementedError("not a RIFF container")
    if len(data) < 12:
        # RIFF magic but not even a full header: structural damage, so
        # the 'corrupt' lane — the lane must not flip on truncation depth
        raise ValueError("truncated RIFF header")
    if data[8:12] != b"WAVE":
        raise ValueError("RIFF but not WAVE")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack("<4sI", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + clen]
        if len(chunk) < clen:
            raise ValueError("truncated WAV chunk")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, n_ch, rate, _brate, _balign, bits = \
                struct.unpack("<HHIIHH", chunk[:16])
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"WAV format tag {audio_fmt} (non-PCM)")
            if bits not in (8, 16):
                raise NotImplementedError(f"PCM bit depth {bits}")
            if n_ch < 1 or rate < 1:
                raise ValueError("invalid channel count / sample rate")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            samples = chunk
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    n_ch, rate, bits = fmt
    bytes_per_frame = (bits // 8) * n_ch
    if len(samples) % bytes_per_frame:
        raise ValueError("PCM data length mismatch")
    if bits == 16:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.float64)
        arr /= 32768.0
    else:  # 8-bit WAV PCM is unsigned, biased at 128
        arr = np.frombuffer(samples, dtype=np.uint8).astype(np.float64)
        arr = (arr - 128.0) / 128.0
    if n_ch > 1:
        arr = arr.reshape(-1, n_ch).mean(axis=1)
    return rate, arr


def encode_wav(samples: np.ndarray, rate: int = 8000,
               bits: int = 16) -> bytes:
    """Mono PCM encoder (int16 or uint8 input array) for tests/fixtures."""
    if bits == 16:
        raw = np.asarray(samples, dtype="<i2").tobytes()
    elif bits == 8:
        raw = np.asarray(samples, dtype=np.uint8).tobytes()
    else:
        raise NotImplementedError(f"PCM bit depth {bits}")
    step = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * step, step, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(raw)) + raw +
            (b"\x00" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def frame_energies(samples: np.ndarray, n_frames: int = 16) -> list[float]:
    """Per-frame RMS energy over n_frames contiguous frames, each in
    [0, 1] for [-1, 1] input. Empty/short input yields zeros for the
    frames past the last sample (deterministic, partition-independent)."""
    n = len(samples)
    if n == 0:
        return [0.0] * n_frames
    edges = (np.arange(n_frames + 1, dtype=np.int64) * n) // n_frames
    sq = np.square(samples)
    # n_frames slice-sums, not a whole-buffer cumsum: this host's cumsum
    # runs ~10-90 MB/s (CLAUDE.md quirks) while blockwise .sum() uses
    # pairwise reduction at memory bandwidth — and needs only n_frames
    # reductions for real-length audio.
    out = []
    for i in range(n_frames):
        lo, hi = int(edges[i]), int(edges[i + 1])
        out.append(float(np.sqrt(sq[lo:hi].sum() / (hi - lo)))
                   if hi > lo else 0.0)
    return out
