"""Minimal, dependency-free WAV (RIFF PCM) codec — the audio analogue of
``png.py``: no audio library exists in this container, but canonical WAV
is just a chunked header over raw PCM samples, fully decodable with
stdlib ``struct`` + numpy.

* ``decode_wav`` — RIFF/WAVE signature check, chunk walk, fmt parse
  (PCM only), data → (sample_rate, samples[n_frames, n_channels]
  float64 in [-1, 1]). Supports 8-bit unsigned and 16-bit signed PCM.
* ``encode_wav`` — the test-side inverse.

``multimodal.decode_audio_real`` rides this for genuinely real audio
features (duration from the header's sample rate, per-channel RMS, zero
crossings on real samples).
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, samples float64 [n_frames, n_channels])."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(
                f"truncated {cid!r} chunk (declared {clen}, got {len(body)} bytes)"
            )
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError(f"short fmt chunk ({clen} bytes)")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if pcm is not None:
                raise ValueError("multiple data chunks")
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"unsupported audio format {audio_fmt} (PCM only)")
    if bits == 16:
        s = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        s = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_frames = len(s) // n_ch
    return rate, s[: n_frames * n_ch].reshape(n_frames, n_ch)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """float64 [n_frames, n_channels] in [-1, 1] → PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_ch = samples.shape
    if bits == 16:
        pcm = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        pcm = np.clip(np.round(samples * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
