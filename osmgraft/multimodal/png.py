"""Pure-stdlib PNG codec (8-bit grayscale) — a REAL decode path for the
multimodal media surface.

Round-1 shipped the media plumbing with the codec boundary stubbed; this
module closes that gap with an actual PNG implementation built on nothing
but `zlib` + `struct` + numpy: full chunk parsing with CRC verification,
zlib inflate, and all five PNG scanline filters on decode; filter-0
encoding (optionally per-row filters for tests) on encode. Grayscale
8-bit only — exactly the raster shape the engine's image kernels use; the
boundary raises cleanly on other color types so a Pillow swap-in stays a
one-function change.

This makes decode_image_stub a real decoder whenever the payload IS a PNG
(magic-sniffed), and lets a contract query oracle-pair the decode path:
deterministic rasters are encoded → decoded → aggregated, and DuckDB
recomputes the expected statistics from the raster formula — equality
proves the codec round-trip is lossless through real zlib/filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray(arr: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Encode a (h, w) uint8 raster as an 8-bit grayscale PNG.

    `filters` optionally sets the per-row filter type (default 0/None);
    used by tests to produce sub/up/average/Paeth-filtered files that the
    decoder must reconstruct."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    rows = []
    prev = np.zeros(w, dtype=np.int64)
    for i in range(h):
        cur = arr[i].astype(np.int64)
        f = filters[i] if filters else 0
        if f == 0:
            enc = cur
        elif f == 1:  # sub
            enc = (cur - np.concatenate(([0], cur[:-1]))) % 256
        elif f == 2:  # up
            enc = (cur - prev) % 256
        elif f == 3:  # average
            left = np.concatenate(([0], cur[:-1]))
            enc = (cur - (left + prev) // 2) % 256
        elif f == 4:  # paeth
            left = np.concatenate(([0], cur[:-1]))
            upleft = np.concatenate(([0], prev[:-1]))
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(rows), 9)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png_gray(buf: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to a (h, w) uint8 raster.

    Verifies chunk CRCs, concatenates IDATs, inflates, and reverses all
    five scanline filters (sub via cumsum; up vectorized; average/Paeth
    per-pixel — encoder emits filter 0, so the hot path is vectorized)."""
    if buf[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = b""
    w = h = None
    bitd = colt = interlace = None
    while pos + 12 <= len(buf):
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(buf[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, bitd, colt, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bitd != 8 or colt != 0 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit grayscale non-interlaced PNG supported "
            f"(got bit_depth={bitd}, color_type={colt}, interlace={interlace})"
        )
    raw = zlib.decompress(idat)
    stride = w + 1
    if len(raw) != h * stride:
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int64)
    for i in range(h):
        line = raw[i * stride : (i + 1) * stride]
        f = line[0]
        cur = np.frombuffer(line[1:], np.uint8).astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # sub: running left sum ⇒ cumsum mod 256 (bpp=1)
            rec = np.cumsum(cur) % 256
        elif f == 2:  # up
            rec = (cur + prev) % 256
        elif f == 3:  # average
            rec = np.empty(w, dtype=np.int64)
            left = 0
            for j in range(w):
                left = (cur[j] + (left + prev[j]) // 2) % 256
                rec[j] = left
        elif f == 4:  # paeth
            rec = np.empty(w, dtype=np.int64)
            left = 0
            upleft = 0
            for j in range(w):
                p = left + prev[j] - upleft
                pa, pb, pc = abs(p - left), abs(p - prev[j]), abs(p - upleft)
                pred = left if (pa <= pb and pa <= pc) else (prev[j] if pb <= pc else upleft)
                left = (cur[j] + pred) % 256
                rec[j] = left
                upleft = prev[j]
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[i] = rec.astype(np.uint8)
        prev = rec
    return out
