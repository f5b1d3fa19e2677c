"""Pure-stdlib WAV (RIFF/PCM16 mono) codec — a REAL decode path for the
audio side of the multimodal media surface.

The PNG codec (multimodal/png.py) closed the image modality with genuine
bytes through a genuine decoder; this module does the same for audio:
RIFF/fmt/data chunk writing on encode, strict chunk walking + format
validation on decode, int16 little-endian PCM samples via numpy. Mono
16-bit PCM only — exactly the waveform shape the engine's audio kernels
use; the boundary raises cleanly on any other format so a soundfile/ffmpeg
swap-in stays a one-function change.

Deterministic fixture waveforms (``pcm_for_key``) use a closed-form
per-sample formula, so a SQL oracle can recompute every decoded statistic
from first principles — equality through encode → decode → aggregate
proves the codec round-trip is lossless.

Reference parity note: the reference pipeline has no audio surface; this
implements the multimodal mandate (opaque binary + typed metadata with
real Spark-side plumbing) for the audio/* media rows the fixture carries.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"

# fixture waveform formula (mirrored by SQL oracles):
#   n(d)    = 64 + d % 191                       samples
#   rate(d) = 8000 + (d % 4) * 4000              Hz
#   s(d, i) = ((d * 31 + i*i*7 + i*13) % 4001) - 2000   int16 PCM
PCM_N_BASE = 64
PCM_N_MOD = 191
PCM_MOD = 4001
PCM_OFF = 2000


def pcm_for_key(d: int) -> tuple[np.ndarray, int]:
    """Deterministic (samples, sample_rate) for key ``d``."""
    n = PCM_N_BASE + d % PCM_N_MOD
    rate = 8000 + (d % 4) * 4000
    i = np.arange(n, dtype=np.int64)
    s = (d * 31 + i * i * 7 + i * 13) % PCM_MOD - PCM_OFF
    return s.astype(np.int16), rate


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode mono int16 samples as a RIFF/WAVE PCM file."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Strictly decode a RIFF/WAVE PCM16 mono file to (samples, rate).

    Walks the chunk list (tolerating extra chunks like LIST/INFO),
    validates the format chunk, and raises ``ValueError`` on anything
    that is not mono 16-bit PCM or is truncated."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    declared = struct.unpack("<I", payload[4:8])[0]
    if declared + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        chunk = payload[pos + 8:pos + 8 + size]
        if len(chunk) < size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            codec, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if codec != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV format: codec={codec} "
                    f"channels={channels} bits={bits}"
                )
        elif tag == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return np.frombuffer(data, dtype="<i2").astype(np.int64), int(rate)
