"""Pure-NumPy PNG codec (stdlib ``zlib`` inflate + scanline unfilter).

The multimodal extension treats media as opaque binary columns and only
decodes inside Arrow-batched kernels; this module supplies the first
real raster codec for that path beyond TIFF (``sources/tiff.py`` is the
reference's actual format — ``anno_upsampling.py:33`` reads TIFF; PNG
is the extension-brief "real image decode" codec).  Implemented from
the public PNG specification (RFC 2083 / ISO 15948): 8- and 16-bit
depths, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA), all five scanline filters, both progressive orders
(non-interlaced and Adam7).  Sub-byte depths (1/2/4) are rejected
explicitly rather than decoded wrong.

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


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
#: (ISO 15948 §8.2 — the 8×8 tile pattern)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _bytes_to_samples(
    mat: np.ndarray, h: int, w: int, channels: int, bit_depth: int
) -> np.ndarray:
    """(h, stride) filtered-byte matrix → (h, w, C) sample array
    (uint8, or uint16 from big-endian byte pairs per the spec)."""
    if bit_depth == 8:
        return mat.reshape(h, w, channels)
    return (
        np.ascontiguousarray(mat)
        .view(">u2")
        .astype(np.uint16)
        .reshape(h, w, channels)
    )


def parse_png_info(data: bytes) -> dict:
    """Header-only census: decode just the IHDR (always the first
    chunk, per the spec) — the profiling-side twin of
    ``jpeg.parse_jpeg_info`` / ``gif.parse_gif_info``."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    ctype, payload = next(_iter_chunks(data))
    if ctype != b"IHDR" or len(payload) != 13:
        raise ValueError("PNG first chunk is not a valid IHDR")
    width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
        ">IIBBBBB", payload
    )
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "interlaced": bool(interlace),
        "n_channels": _CHANNELS.get(color_type, 0),
    }


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an ``(H, W, C)`` array — uint8 for
    8-bit depth, uint16 for 16-bit.

    C follows the color type (1, 2, 3 or 4 channels); palette images
    are expanded through their PLTE to RGB.  Adam7-interlaced streams
    decode each of the 7 sub-image passes independently (filters reset
    per pass, per the spec) and scatter them into place.
    """
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, payload in _iter_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if bit_depth not in (8, 16):
                raise ValueError(
                    f"only 8/16-bit PNG supported, got depth {bit_depth}"
                )
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if color_type == 3 and bit_depth == 16:
                raise ValueError("16-bit palette PNG is not legal")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += payload
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _CHANNELS[color_type]
    bpp = channels * (bit_depth // 8)
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        mat = _unfilter(raw, height, width * bpp, bpp=bpp)
        img = _bytes_to_samples(mat, height, width, channels, bit_depth)
    else:
        dtype = np.uint8 if bit_depth == 8 else np.uint16
        img = np.zeros((height, width, channels), dtype=dtype)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            seg = raw[pos : pos + ph * (stride + 1)]
            pos += ph * (stride + 1)
            mat = _unfilter(seg, ph, stride, bpp=bpp)
            img[y0::dy, x0::dx] = _bytes_to_samples(
                mat, ph, pw, channels, bit_depth
            )
        if pos != len(raw):
            raise ValueError(
                f"Adam7 stream length mismatch: consumed {pos} of {len(raw)}"
            )
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize any decoded (H, W, C) image to (H, W, 3) uint8.

    16-bit samples reduce to their high byte (the spec's sample scaling
    65535→255 is exactly ``x >> 8`` after rounding toward zero, which is
    what feature kernels expect from a display-range conversion)."""
    if img.ndim != 3:
        raise ValueError(f"expected (H, W, C), got shape {img.shape}")
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
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


def _filtered_rows(byte_mat: np.ndarray) -> bytes:
    """None for the first row, Up for the rest — a cheap heuristic that
    compresses smooth fixtures well and exercises more than one filter
    type in round-trip tests.  Filters are byte-wise per the spec, so
    the same code serves 8- and 16-bit rows."""
    flat = byte_mat.astype(np.int64)
    lines = bytearray()
    for y in range(len(flat)):
        if y == 0:
            lines += b"\x00" + flat[0].astype(np.uint8).tobytes()
        else:
            lines += b"\x02" + (
                (flat[y] - flat[y - 1]) % 256
            ).astype(np.uint8).tobytes()
    return bytes(lines)


def encode_png(img: np.ndarray, level: int = 6, interlace: bool = False) -> bytes:
    """Encode an ``(H, W)`` or ``(H, W, C)`` uint8/uint16 array as PNG
    bytes (16-bit samples are written big-endian per the spec).

    ``interlace=True`` emits an Adam7 stream: the 7 passes are filtered
    independently, exactly the structure ``decode_png`` re-assembles —
    used by tests to round-trip the progressive decode path.
    """
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"uint8/uint16 required, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"cannot encode {c}-channel image")
    depth = 8 if img.dtype == np.uint8 else 16

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    def as_bytes(sub: np.ndarray) -> np.ndarray:
        """(h', w', c) samples → (h', w'·bpp) big-endian byte matrix."""
        hh = sub.shape[0]
        if depth == 8:
            return sub.reshape(hh, -1)
        return np.frombuffer(
            np.ascontiguousarray(sub, dtype=">u2").tobytes(), dtype=np.uint8
        ).reshape(hh, -1)

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0
    )
    if not interlace:
        lines = _filtered_rows(as_bytes(img))
    else:
        parts = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts += _filtered_rows(as_bytes(sub))
        lines = bytes(parts)
    idat = zlib.compress(lines, level)
    return (
        PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )
