"""Pure-Python/NumPy GIF codec (GIF87a / GIF89a, from the public spec).

GIF is the third dominant crawl image format after JPEG and PNG; the
reference pipeline has no media decode at all (its raster format is
TIFF — ``anno_upsampling.py:33``), so like ``sources/png.py`` and
``sources/jpeg.py`` this is north-star extension surface: the
multimodal kernels (``extensions/multimodal.py``) treat media as opaque
binary columns and decode inside Arrow-batched ``mapInPandas`` passes,
and this module supplies the codec those kernels dispatch to when the
payload starts with ``GIF87a``/``GIF89a``.

Implemented from the CompuServe GIF89a specification (public, 1990):

* logical screen descriptor + global/local color tables,
* variable-width LZW decompression (deferred-clear tolerant) and
  compression (table reset at 4096 codes),
* the four-pass interlace order,
* animation: graphic-control extensions (delay, transparency index,
  disposal methods 0/1 "keep", 2 "restore background", 3 "restore
  previous"), frame compositing onto the logical screen,
* the NETSCAPE2.0 looping application extension,
* a header-only ``parse_gif_info`` walk (frame/byte census without
  touching LZW data — the profiling path, same idea as
  ``sources/jpeg.py::parse_jpeg_info``).

Compositing semantics are pinned deterministically: the canvas
initializes to the global-color-table background color (black when no
GCT); disposal 2 restores that background color in the frame's rect.
(Renderers disagree here — web browsers use transparent black — but an
engine oracle needs ONE answer; this one matches the letter of the
spec's "restore to background color".)

Everything is driver/executor-local NumPy + stdlib — no Spark
dependency — so the same functions serve fixture writers, pytest and
the ``mapInPandas`` kernels.  The LZW inner loops are per-code Python
(same honest price as the JPEG entropy stage, ~MB/s/core); everything
raster-side is vectorized.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

#: largest LZW code width the format allows
_MAX_WIDTH = 12
#: one past the largest code a 12-bit table can hold
_TABLE_LIMIT = 1 << _MAX_WIDTH


# ---------------------------------------------------------------------------
# parsing


@dataclass
class GifFrame:
    """One image block plus the graphic-control state that governs it."""

    left: int
    top: int
    width: int
    height: int
    interlaced: bool
    lct: np.ndarray | None  # (n, 3) uint8 local color table
    lzw_min_code_size: int
    #: (offset, length) spans of the raw LZW sub-block payloads
    data_spans: list[tuple[int, int]] = field(default_factory=list)
    #: graphic-control fields (GIF89a); defaults match "no GCE present"
    disposal: int = 0
    transparent_index: int | None = None
    delay_cs: int = 0


@dataclass
class GifInfo:
    version: str  # "87a" | "89a"
    width: int
    height: int
    gct: np.ndarray | None  # (n, 3) uint8 global color table
    background_index: int
    frames: list[GifFrame]
    loop_count: int | None  # NETSCAPE2.0 extension; None if absent
    comments: list[bytes] = field(default_factory=list)


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated GIF color table")
    tab = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3).copy()
    return tab, end


def _skip_subblocks(data: bytes, pos: int) -> tuple[list[tuple[int, int]], int]:
    """Collect (offset, length) spans of a sub-block chain; return end pos."""
    spans: list[tuple[int, int]] = []
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return spans, pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        spans.append((pos, size))
        pos += size


def parse_gif(data: bytes) -> GifInfo:
    """Walk every block; LZW payloads are located but NOT decompressed."""
    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF payload (missing GIF87a/GIF89a signature)")
    version = data[3:6].decode("ascii")
    if len(data) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    width, height = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    background_index = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (packed & 0x07))

    frames: list[GifFrame] = []
    comments: list[bytes] = []
    loop_count: int | None = None
    # pending graphic-control state applies to the NEXT image block
    disposal, transparent, delay = 0, None, 0
    n = len(data)
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return GifInfo(
                version, width, height, gct, background_index, frames,
                loop_count, comments,
            )
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            spans, pos = _skip_subblocks(data, pos)
            if label == 0xF9 and spans:  # graphic control
                off, size = spans[0]
                if size >= 4:
                    gpacked = data[off]
                    disposal = (gpacked >> 2) & 0x07
                    (delay,) = struct.unpack_from("<H", data, off + 1)
                    transparent = data[off + 3] if gpacked & 0x01 else None
            elif label == 0xFF and spans:  # application extension
                off, size = spans[0]
                if data[off : off + size] == b"NETSCAPE2.0" and len(spans) > 1:
                    o2, s2 = spans[1]
                    if s2 >= 3 and data[o2] == 0x01:
                        (loop_count,) = struct.unpack_from("<H", data, o2 + 1)
            elif label == 0xFE:  # comment
                comments.append(b"".join(data[o : o + s] for o, s in spans))
            continue
        if block == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ValueError("truncated GIF image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
            ipacked = data[pos + 8]
            pos += 9
            lct = None
            if ipacked & 0x80:
                lct, pos = _read_color_table(data, pos, 2 << (ipacked & 0x07))
            if pos >= n:
                raise ValueError("truncated GIF image data")
            mcs = data[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"invalid GIF LZW minimum code size {mcs}")
            spans, pos = _skip_subblocks(data, pos)
            frames.append(
                GifFrame(
                    left, top, fw, fh, bool(ipacked & 0x40), lct, mcs, spans,
                    disposal, transparent, delay,
                )
            )
            # graphic-control state is one-shot per spec
            disposal, transparent, delay = 0, None, 0
            continue
        raise ValueError(f"unknown GIF block introducer 0x{block:02x}")
    raise ValueError("GIF missing trailer")


def parse_gif_info(data: bytes) -> dict:
    """Header-only census: dimensions, frame count, palette sizes, loop
    count, total compressed bytes — no LZW work (the profiling path)."""
    info = parse_gif(data)
    return {
        "version": info.version,
        "width": info.width,
        "height": info.height,
        "n_frames": len(info.frames),
        "gct_size": 0 if info.gct is None else int(info.gct.shape[0]),
        "background_index": info.background_index,
        "loop_count": info.loop_count,
        "animated": len(info.frames) > 1,
        "has_transparency": any(
            f.transparent_index is not None for f in info.frames
        ),
        "interlaced": any(f.interlaced for f in info.frames),
        "lzw_bytes": sum(
            s for f in info.frames for (_, s) in f.data_spans
        ),
        "total_delay_cs": sum(f.delay_cs for f in info.frames),
    }


# ---------------------------------------------------------------------------
# LZW


def lzw_decode(buf: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index array of exactly ``n_pixels``.

    Variable code width starting at ``min_code_size + 1``, LSB-first bit
    packing, clear/EOI codes, deferred-clear tolerant (a full table
    stops growing instead of erroring, as GIF89a appendix F allows).
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    base: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    accbits = 0
    pos = 0
    nbuf = len(buf)
    prev: bytes | None = None
    while len(out) < n_pixels:
        while accbits < width:
            if pos >= nbuf:
                raise ValueError("GIF LZW stream ended before raster filled")
            acc |= buf[pos] << accbits
            accbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            raise ValueError("GIF LZW EOI before raster filled")
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _TABLE_LIMIT:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < _TABLE_LIMIT:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")
        if len(table) == (1 << width) and width < _MAX_WIDTH:
            width += 1
        out += entry
        prev = entry
    if len(out) > n_pixels:
        del out[n_pixels:]
    return np.frombuffer(bytes(out), dtype=np.uint8)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression (mirror of :func:`lzw_decode`):
    emits an initial clear code, resets the table when it fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    emit(clear)
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    if not indices:
        emit(eoi)
        if accbits:
            out.append(acc & 0xFF)
        return bytes(out)
    w = indices[0]
    if w >= clear:
        raise ValueError("pixel index exceeds LZW alphabet")
    for k in indices[1:]:
        if k >= clear:
            raise ValueError("pixel index exceeds LZW alphabet")
        nxt = table.get((w, k))
        if nxt is not None:
            w = nxt
            continue
        emit(w)
        if next_code == _TABLE_LIMIT:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        else:
            table[(w, k)] = next_code
            next_code += 1
            # the decoder widens after appending the mirror entry
            if next_code - 1 == (1 << width) and width < _MAX_WIDTH:
                width += 1
        w = k
    emit(w)
    emit(eoi)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


#: interlace passes: (first row, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_frame_indices(data: bytes, info: GifInfo, i: int) -> np.ndarray:
    """Decode frame ``i``'s own rect to an (h, w) uint8 index raster
    (no compositing — palette lookup and disposal are the caller's)."""
    fr = info.frames[i]
    buf = b"".join(data[o : o + s] for o, s in fr.data_spans)
    idx = lzw_decode(buf, fr.lzw_min_code_size, fr.width * fr.height)
    raster = idx.reshape(fr.height, fr.width)
    if fr.interlaced:
        raster = _deinterlace(raster)
    return raster


def _frame_palette(info: GifInfo, fr: GifFrame) -> np.ndarray:
    pal = fr.lct if fr.lct is not None else info.gct
    if pal is None:
        raise ValueError("GIF frame has neither local nor global color table")
    return pal


def _background_color(info: GifInfo) -> np.ndarray:
    if info.gct is not None and info.background_index < info.gct.shape[0]:
        return info.gct[info.background_index].copy()
    return np.zeros(3, dtype=np.uint8)


def iter_composited(data: bytes, info: GifInfo | None = None, upto: int | None = None):
    """Yield ``(frame_idx, canvas_rgb)`` for each frame, composited onto
    the logical screen with disposal methods 0/1/2/3 and transparency.

    GIF frames depend on their predecessors (unlike TIFF pages), so
    random access is inherently sequential; callers that sample frames
    decode up to the last sampled index and keep only the samples.
    The yielded canvas is a fresh copy each time.
    """
    if info is None:
        info = parse_gif(data)
    bg = _background_color(info)
    canvas = np.empty((info.height, info.width, 3), dtype=np.uint8)
    canvas[:] = bg
    for i, fr in enumerate(info.frames):
        if upto is not None and i > upto:
            return
        y0, y1 = fr.top, fr.top + fr.height
        x0, x1 = fr.left, fr.left + fr.width
        if y1 > info.height or x1 > info.width:
            raise ValueError("GIF frame rect exceeds logical screen")
        saved = canvas[y0:y1, x0:x1].copy() if fr.disposal == 3 else None
        idx = decode_frame_indices(data, info, i)
        rgb = _frame_palette(info, fr)[idx]
        region = canvas[y0:y1, x0:x1]
        if fr.transparent_index is not None:
            mask = idx != fr.transparent_index
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        yield i, canvas.copy()
        if fr.disposal == 2:
            canvas[y0:y1, x0:x1] = bg
        elif fr.disposal == 3:
            canvas[y0:y1, x0:x1] = saved


def decode_gif(data: bytes, frame: int = 0) -> np.ndarray:
    """Composited RGB uint8 (h, w, 3) canvas at frame ``frame``."""
    info = parse_gif(data)
    if not 0 <= frame < len(info.frames):
        raise ValueError(
            f"frame {frame} out of range (GIF has {len(info.frames)})"
        )
    for i, canvas in iter_composited(data, info, upto=frame):
        if i == frame:
            return canvas
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# encoding (fixtures / resize re-encode)


def _palette_block(pal: np.ndarray) -> tuple[bytes, int]:
    """Pad a palette to a power-of-two size; return (bytes, size_bits)."""
    n = pal.shape[0]
    bits = max(1, (max(n, 2) - 1).bit_length())
    full = 1 << bits
    padded = np.zeros((full, 3), dtype=np.uint8)
    padded[:n] = pal
    return padded.tobytes(), bits - 1


def _interlace_rows(raster: np.ndarray) -> np.ndarray:
    order = np.concatenate(
        [np.arange(start, raster.shape[0], step) for start, step in _INTERLACE_PASSES]
    )
    return raster[order]


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames,
    *,
    palette: np.ndarray | None = None,
    screen_size: tuple[int, int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    delays_cs: list[int] | None = None,
    disposals: list[int] | None = None,
    transparent_indices: list[int | None] | None = None,
    interlace: bool = False,
    loop: int | None = 0,
    background_index: int = 0,
) -> bytes:
    """Encode one raster or an animation to GIF89a bytes.

    ``frames``: a single array or list of arrays; each is (h, w, 3)
    uint8 RGB (palette built from the exact distinct colors) or, when
    ``palette`` is given, (h, w) uint8 index rasters.  ``offsets`` are
    per-frame (top, left) positions on the logical screen (frames may
    be sub-rects — the animation compositor fills the rest); ``loop``
    writes the NETSCAPE2.0 extension (None omits it).
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("encode_gif: need at least one frame")
    if palette is None:
        rgb_frames = []
        for f in frames:
            a = np.asarray(f, dtype=np.uint8)
            if a.ndim != 3 or a.shape[2] != 3:
                raise ValueError(
                    "encode_gif without palette expects (h, w, 3) RGB frames"
                )
            rgb_frames.append(a)
        all_px = np.concatenate([a.reshape(-1, 3) for a in rgb_frames], axis=0)
        palette, inv = np.unique(all_px, axis=0, return_inverse=True)
        if palette.shape[0] > 256:
            raise ValueError(
                f"encode_gif: {palette.shape[0]} distinct colors exceed "
                "GIF's 256-color palette (quantize first)"
            )
        palette = palette.astype(np.uint8)
        inv = inv.astype(np.uint8)
        index_frames = []
        start = 0
        for a in rgb_frames:
            n_px = a.shape[0] * a.shape[1]
            index_frames.append(inv[start : start + n_px].reshape(a.shape[:2]))
            start += n_px
    else:
        palette = np.asarray(palette, dtype=np.uint8)
        if palette.ndim != 2 or palette.shape[1] != 3 or palette.shape[0] > 256:
            raise ValueError("palette must be (n<=256, 3) uint8")
        index_frames = []
        for f in frames:
            a = np.asarray(f, dtype=np.uint8)
            if a.ndim != 2:
                raise ValueError(
                    "encode_gif with palette expects (h, w) index frames"
                )
            if a.size and int(a.max()) >= palette.shape[0]:
                raise ValueError("frame index exceeds palette size")
            index_frames.append(a)

    nf = len(index_frames)
    offsets = offsets or [(0, 0)] * nf
    delays_cs = delays_cs or [0] * nf
    disposals = disposals or [0] * nf
    transparent_indices = transparent_indices or [None] * nf
    if not (len(offsets) == len(delays_cs) == len(disposals)
            == len(transparent_indices) == nf):
        raise ValueError("per-frame option lists must match frame count")

    if screen_size is None:
        sh = max(t + f.shape[0] for (t, _), f in zip(offsets, index_frames))
        sw = max(l + f.shape[1] for (_, l), f in zip(offsets, index_frames))
    else:
        sh, sw = screen_size
    for (t, l), f in zip(offsets, index_frames):
        if t + f.shape[0] > sh or l + f.shape[1] > sw:
            raise ValueError("frame rect exceeds logical screen")

    pal_bytes, size_bits = _palette_block(palette)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", sw, sh)
    out.append(0x80 | (0x07 << 4) | size_bits)  # GCT present, 8-bit res
    out.append(background_index)
    out.append(0)  # aspect
    out += pal_bytes
    if loop is not None and nf > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop)
        out.append(0)
    animated = nf > 1
    for fr_i, (idx, (top, left), delay, disp, trans) in enumerate(
        zip(index_frames, offsets, delays_cs, disposals, transparent_indices)
    ):
        if animated or trans is not None or delay:
            out += b"\x21\xf9\x04"
            out.append((disp & 0x07) << 2 | (0x01 if trans is not None else 0))
            out += struct.pack("<H", delay)
            out.append(trans or 0)
            out.append(0)
        out.append(0x2C)
        out += struct.pack("<HHHH", left, top, idx.shape[1], idx.shape[0])
        out.append(0x40 if interlace else 0x00)
        raster = _interlace_rows(idx) if interlace else idx
        # alphabet must cover the palette, not just this frame's indices
        mcs = max(2, (max(int(palette.shape[0]), 2) - 1).bit_length())
        out.append(mcs)
        out += _subblocks(lzw_encode(raster.tobytes(), mcs))
    out.append(0x3B)
    return bytes(out)
