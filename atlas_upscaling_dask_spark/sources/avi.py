"""AVI (RIFF) container parser + writer for MJPEG video, from the
public spec (Microsoft "AVI RIFF File Reference" / OpenDML AVI 1.02).

The one entropy codec this repo implements from spec is JPEG
(``sources/jpeg.py``), and Motion-JPEG is exactly "an AVI whose video
chunks are JPEG images" — so this parser turns the multimodal video
path into a REAL container pipeline: locate the sampled ``00dc``
chunks (via the ``idx1`` index when present — random access, no full
scan), hand each to the from-spec JPEG decoder, hash/fingerprint the
pixels.  The reference pipeline has no media decode at all (its raster
format is TIFF — ``anno_upsampling.py:33``); this is north-star
extension surface like PNG/JPEG/GIF/WAV.

Scope is deliberately the container, not other codecs: a ``vids``
stream whose BITMAPINFOHEADER compression is not ``MJPG`` still parses
(header census works on any AVI) but refuses frame decode with the
same contract error the mp4/mkv gate raises.

Everything is executor-local stdlib + NumPy-free byte walking — no
Spark dependency — shared by fixture writers, pytest and the
``mapInPandas`` kernels.

Index-offset ambiguity handled: ``idx1`` offsets are relative to the
``movi`` list's fourcc in most files but absolute in some muxers; the
parser probes the first entry against both bases and picks the one
that lands on the chunk id (the standard disambiguation).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


@dataclass
class AviStream:
    fcc_type: str  # "vids" | "auds" | ...
    handler: str
    scale: int
    rate: int
    length: int
    # vids only (from BITMAPINFOHEADER)
    width: int | None = None
    height: int | None = None
    compression: str | None = None
    bit_count: int | None = None


@dataclass
class AviInfo:
    width: int
    height: int
    us_per_frame: int
    total_frames: int
    streams: list[AviStream] = field(default_factory=list)
    #: absolute (payload_offset, payload_size) per video frame chunk
    frames: list[tuple[int, int]] = field(default_factory=list)
    has_index: bool = False

    @property
    def fps(self) -> float:
        v = next((s for s in self.streams if s.fcc_type == "vids"), None)
        if v is not None and v.scale:
            return v.rate / v.scale
        return 1e6 / self.us_per_frame if self.us_per_frame else 0.0

    @property
    def video_codec(self) -> str | None:
        v = next((s for s in self.streams if s.fcc_type == "vids"), None)
        return v.compression if v is not None else None


def _fourcc(data: bytes, pos: int) -> str:
    return data[pos : pos + 4].decode("latin-1")


def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a chunk run;
    chunks are word-aligned (odd sizes carry a pad byte)."""
    while pos + 8 <= end:
        cid = _fourcc(data, pos)
        (size,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + size > end:
            raise ValueError(f"truncated AVI chunk {cid!r}")
        yield cid, start, size
        pos = start + size + (size & 1)


def _is_video_chunk(cid: str) -> bool:
    # ##dc (compressed) / ##db (uncompressed DIB) stream-0.. chunks;
    # only stream 00 is the video path this module serves
    return cid[2:] in ("dc", "db") and cid[:2].isdigit()


def parse_avi(data: bytes) -> AviInfo:
    """Walk the RIFF tree; frame PAYLOAD offsets come from ``idx1``
    when present (no movi scan), else from one movi walk."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI signature)")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))

    width = height = us_per_frame = total_frames = 0
    streams: list[AviStream] = []
    movi_pos: int | None = None  # position of the "movi" fourcc
    movi_end: int | None = None
    idx_span: tuple[int, int] | None = None

    pos = 12
    while pos + 8 <= end:
        cid = _fourcc(data, pos)
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"truncated AVI chunk {cid!r}")
        if cid == "LIST":
            ltype = _fourcc(data, body)
            if ltype == "hdrl":
                for sub, s0, ssz in _iter_chunks(data, body + 4, body + size):
                    if sub == "avih" and ssz >= 40:
                        (us_per_frame,) = struct.unpack_from("<I", data, s0)
                        (total_frames,) = struct.unpack_from("<I", data, s0 + 16)
                        width, height = struct.unpack_from("<II", data, s0 + 32)
                    elif sub == "LIST" and _fourcc(data, s0) == "strl":
                        streams.append(_parse_strl(data, s0 + 4, s0 + ssz))
            elif ltype == "movi":
                movi_pos = body
                movi_end = body + size
        elif cid == "idx1":
            idx_span = (body, size)
        pos = body + size + (size & 1)

    if movi_pos is None:
        raise ValueError("AVI has no movi list")

    info = AviInfo(width, height, us_per_frame, total_frames, streams)
    if idx_span is not None:
        info.frames = _frames_from_idx1(data, idx_span, movi_pos)
        info.has_index = info.frames is not None and len(info.frames) > 0
    if not info.frames:
        info.frames = [
            (s0, ssz)
            for cid2, s0, ssz in _iter_chunks(data, movi_pos + 4, movi_end)
            if _is_video_chunk(cid2)
        ]
        info.has_index = False
    return info


def _parse_strl(data: bytes, pos: int, end: int) -> AviStream:
    st = AviStream("", "", 0, 0, 0)
    for sub, s0, ssz in _iter_chunks(data, pos, end):
        if sub == "strh" and ssz >= 40:
            st.fcc_type = _fourcc(data, s0)
            st.handler = _fourcc(data, s0 + 4)
            st.scale, st.rate = struct.unpack_from("<II", data, s0 + 20)
            (st.length,) = struct.unpack_from("<I", data, s0 + 32)
        elif sub == "strf" and st.fcc_type == "vids" and ssz >= 40:
            # BITMAPINFOHEADER
            st.width, st.height = struct.unpack_from("<ii", data, s0 + 4)
            (st.bit_count,) = struct.unpack_from("<H", data, s0 + 14)
            st.compression = _fourcc(data, s0 + 16)
    return st


def _frames_from_idx1(
    data: bytes, idx_span: tuple[int, int], movi_pos: int
) -> list[tuple[int, int]]:
    body, size = idx_span
    frames: list[tuple[int, int]] = []
    base: int | None = None
    for off in range(body, body + size - 15, 16):
        cid = _fourcc(data, off)
        if not _is_video_chunk(cid):
            continue
        centry, csize = struct.unpack_from("<II", data, off + 8)
        if base is None:
            # disambiguate relative-to-movi vs absolute offsets by
            # probing which base lands on the chunk's fourcc
            rel = movi_pos + centry
            if data[rel : rel + 4].decode("latin-1", "replace") == cid:
                base = movi_pos
            elif data[centry : centry + 4].decode("latin-1", "replace") == cid:
                base = 0
            else:
                raise ValueError("AVI idx1 offsets match neither base")
        frames.append((base + centry + 8, csize))
    return frames


def read_avi_frame(data: bytes, info: AviInfo, i: int) -> bytes:
    """Frame ``i``'s raw codec payload (JPEG bytes for MJPG) — a pure
    byte slice; only the sampled frames' bytes are ever touched."""
    if not 0 <= i < len(info.frames):
        raise ValueError(f"frame {i} out of range (AVI has {len(info.frames)})")
    off, size = info.frames[i]
    return data[off : off + size]


def require_mjpeg(info: AviInfo) -> None:
    codec = info.video_codec
    if codec is None:
        raise ValueError("AVI has no video stream")
    if codec not in ("MJPG", "mjpg"):
        raise NotImplementedError(
            f"AVI video codec {codec!r} needs a media library; MJPG "
            "(Motion-JPEG) is the built-in one"
        )


def parse_avi_info(data: bytes) -> dict:
    """Header census (hdrl + idx1 walk, no frame decode): the
    profiling pass a 100 TB video-corpus scan runs before deciding
    what to decode."""
    info = parse_avi(data)
    return {
        "width": info.width,
        "height": info.height,
        "n_frames": len(info.frames),
        "total_frames_declared": info.total_frames,
        "fps": info.fps,
        "video_codec": info.video_codec,
        "n_streams": len(info.streams),
        "has_index": info.has_index,
        "video_bytes": sum(s for _, s in info.frames),
    }


# ---------------------------------------------------------------------------
# writer (fixtures / MJPEG export)


def encode_avi(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps_rate: int = 30,
    fps_scale: int = 1,
    write_index: bool = True,
) -> bytes:
    """Assemble an MJPG AVI from already-encoded JPEG frames (pair with
    ``sources.jpeg.encode_jpeg``).  Writes hdrl (avih + one vids strl),
    movi with word-aligned ``00dc`` chunks, and an ``idx1`` index with
    movi-relative offsets."""
    if not jpeg_frames:
        raise ValueError("encode_avi: need at least one frame")
    n = len(jpeg_frames)
    us_per_frame = int(round(1e6 * fps_scale / fps_rate))
    max_size = max(len(f) for f in jpeg_frames)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, max_size * fps_rate // max(fps_scale, 1), 0,
        0x10,  # AVIF_HASINDEX
        n, 0, 1, max_size, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, fps_scale, fps_rate, 0, n,
                      max_size, 0xFFFFFFFF, 0)
        + struct.pack("<HHHH", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_payload = bytearray(b"movi")
    index = bytearray()
    for f in jpeg_frames:
        # idx1 offsets are relative to the "movi" fourcc position
        rel = len(movi_payload)
        movi_payload += chunk(b"00dc", f)
        index += b"00dc" + struct.pack("<III", 0x10, rel, len(f))
    movi = chunk(b"LIST", bytes(movi_payload))

    body = b"AVI " + hdrl + movi
    if write_index:
        body += chunk(b"idx1", bytes(index))
    return b"RIFF" + struct.pack("<I", len(body)) + body
