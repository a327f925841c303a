"""Pure-NumPy PNG codec (stdlib ``zlib`` inflate + scanline unfilter).

The multimodal extension treats media as opaque binary columns and only
decodes inside Arrow-batched kernels; this module supplies the first
real raster codec for that path beyond TIFF (``sources/tiff.py`` is the
reference's actual format — ``anno_upsampling.py:33`` reads TIFF; PNG
is the extension-brief "real image decode" codec).  Implemented from
the public PNG specification (RFC 2083 / ISO 15948): 8-bit depth,
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA), all five scanline filters, non-interlaced.  Adam7 interlace
and 16-bit depth are rejected explicitly rather than decoded wrong.

Like the TIFF parser, everything here is driver/executor-local NumPy —
no Spark dependency — so the same functions serve fixture writers,
tests, and the ``mapInPandas`` decode kernels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel for each PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _iter_chunks(data: bytes):
    """Yield (type, payload) for each chunk; validates CRCs."""
    pos = len(PNG_SIGNATURE)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, payload
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering → (height, stride) uint8 matrix.

    Filters None/Up/Sub are vectorized (Sub is a running mod-256 prefix
    sum with lag ``bpp``); Average/Paeth are sequential by definition
    and fall back to a per-byte loop — fine at kernel-batch image sizes.
    """
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    for y in range(height):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else np.zeros(stride, dtype=np.int64)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prior) % 256
        elif ftype == 1:  # Sub: prefix sum per byte-lane mod 256
            lanes = line[: (stride // bpp) * bpp].reshape(-1, bpp)
            rec = np.cumsum(lanes, axis=0) % 256
            out[y, : rec.size] = rec.reshape(-1)
            for x in range((stride // bpp) * bpp, stride):  # ragged tail
                out[y, x] = (line[x] + out[y, x - bpp]) % 256
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (line[x] + (left + int(prior[x])) // 2) % 256
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                ul = int(out[y - 1, x - bpp]) if (x >= bpp and y) else 0
                out[y, x] = (line[x] + _paeth(left, int(prior[x]), ul)) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an ``(H, W, C)`` uint8 array.

    C follows the color type (1, 2, 3 or 4 channels); palette images
    are expanded through their PLTE to RGB.
    """
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = None
    palette = None
    idat = bytearray()
    for ctype, payload in _iter_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if bit_depth != 8:
                raise ValueError(f"only 8-bit PNG supported, got depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7-interlaced PNG not supported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += payload
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    mat = _unfilter(raw, height, stride, bpp=channels)
    img = mat.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize any decoded (H, W, C) image to (H, W, 3) uint8."""
    if img.ndim != 3:
        raise ValueError(f"expected (H, W, C), got shape {img.shape}")
    c = img.shape[2]
    if c == 3:
        return img
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:  # gray + alpha → replicate gray
        return np.repeat(img[:, :, :1], 3, axis=2)
    if c == 4:  # drop alpha
        return np.ascontiguousarray(img[:, :, :3])
    raise ValueError(f"cannot normalize {c}-channel image")


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Encode an ``(H, W)`` or ``(H, W, C)`` uint8 array as PNG bytes.

    Per-row filter choice: None for the first row, Up for the rest — a
    cheap heuristic that compresses smooth fixtures well and exercises
    more than one filter type in round-trip tests.
    """
    if img.dtype != np.uint8:
        raise ValueError(f"uint8 required, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"cannot encode {c}-channel image")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = img.reshape(h, w * c).astype(np.int64)
    lines = bytearray()
    for y in range(h):
        if y == 0:
            lines += b"\x00" + flat[0].astype(np.uint8).tobytes()
        else:
            lines += b"\x02" + ((flat[y] - flat[y - 1]) % 256).astype(np.uint8).tobytes()
    idat = zlib.compress(bytes(lines), level)
    return (
        PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )
