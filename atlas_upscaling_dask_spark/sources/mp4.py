"""ISO Base Media File Format (MP4) box parser — header census only.

MP4 is the dominant real-world video container, but its payloads are
entropy-coded (H.264/H.265/AAC) and decoding those needs a media
library this container does not ship — the multimodal kernels keep
raising their documented ``NotImplementedError`` for MP4 *decode*.
What a 100 TB crawl pipeline still needs BEFORE any decode decision is
the metadata pass: duration, track inventory, codec fourccs, geometry,
sample counts — all of which live in plain struct-packed boxes that
ISO/IEC 14496-12 (publicly specified) defines precisely.  This module
is that planning-side parser, the MP4 twin of
``sources/jpeg.py::parse_jpeg_info`` / ``sources/gif.py::parse_gif_info``
/ ``sources/avi.py::parse_avi_info``.

Implemented from the public spec: box framing (compact, 64-bit
``largesize``, size-0 to-EOF), ``ftyp``, ``mvhd`` v0/v1, per-trak
``tkhd`` v0/v1, ``mdhd`` v0/v1 (timescale + language), ``hdlr``,
``stsd`` sample-entry fourcc + VisualSampleEntry geometry /
AudioSampleEntry channels+rate, and ``stts`` sample counting.

A tiny fixture writer (``encode_mp4_stub``) assembles a structurally
valid file for tests and oracle queries; it makes no pretence of
encoding media (the mdat payload is opaque bytes).

Executor-local stdlib only — no Spark dependency.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

#: container boxes whose payload is just more boxes
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex",
    b"udta", b"dinf",
}


def iter_boxes(data: bytes, pos: int, end: int):
    """Yield (type, payload_start, payload_end) over a box run."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end > end or box_end < body:
            raise ValueError(f"truncated MP4 box {btype!r}")
        yield btype, body, box_end
        pos = box_end


@dataclass
class Mp4Track:
    track_id: int = 0
    handler: str = ""  # "vide" | "soun" | ...
    codec: str = ""  # sample-entry fourcc, e.g. "avc1", "mp4a"
    duration_s: float = 0.0
    language: str = "und"
    n_samples: int = 0
    # vide
    width: int | None = None
    height: int | None = None
    # soun
    channels: int | None = None
    sample_rate: int | None = None


@dataclass
class Mp4Info:
    major_brand: str = ""
    compatible_brands: list[str] = field(default_factory=list)
    duration_s: float = 0.0
    tracks: list[Mp4Track] = field(default_factory=list)

    def video(self) -> Mp4Track | None:
        return next((t for t in self.tracks if t.handler == "vide"), None)

    def audio(self) -> Mp4Track | None:
        return next((t for t in self.tracks if t.handler == "soun"), None)


def _full_box(data: bytes, pos: int) -> tuple[int, int]:
    version = data[pos]
    return version, pos + 4  # skip version(1) + flags(3)


def parse_mp4(data: bytes) -> Mp4Info:
    info = Mp4Info()
    saw_ftyp = saw_moov = False
    for btype, body, bend in iter_boxes(data, 0, len(data)):
        if btype == b"ftyp":
            saw_ftyp = True
            info.major_brand = data[body : body + 4].decode("latin-1")
            brands = data[body + 8 : bend]
            info.compatible_brands = [
                brands[i : i + 4].decode("latin-1")
                for i in range(0, len(brands) - 3, 4)
            ]
        elif btype == b"moov":
            saw_moov = True
            _parse_moov(data, body, bend, info)
    if not (saw_ftyp and saw_moov):
        raise ValueError("not an MP4 payload (missing ftyp/moov)")
    return info


def _parse_moov(data: bytes, pos: int, end: int, info: Mp4Info) -> None:
    for btype, body, bend in iter_boxes(data, pos, end):
        if btype == b"mvhd":
            v, p = _full_box(data, body)
            if v == 1:
                timescale, duration = struct.unpack_from(">IQ", data, p + 16)
            else:
                timescale, duration = struct.unpack_from(">II", data, p + 8)
            info.duration_s = duration / timescale if timescale else 0.0
        elif btype == b"trak":
            info.tracks.append(_parse_trak(data, body, bend))


def _parse_trak(data: bytes, pos: int, end: int) -> Mp4Track:
    tr = Mp4Track()
    for btype, body, bend in iter_boxes(data, pos, end):
        if btype == b"tkhd":
            v, p = _full_box(data, body)
            (tr.track_id,) = struct.unpack_from(
                ">I", data, p + (16 if v == 1 else 8)
            )
        elif btype == b"mdia":
            _parse_mdia(data, body, bend, tr)
    return tr


def _parse_mdia(data: bytes, pos: int, end: int, tr: Mp4Track) -> None:
    for btype, body, bend in iter_boxes(data, pos, end):
        if btype == b"mdhd":
            v, p = _full_box(data, body)
            if v == 1:
                timescale, duration = struct.unpack_from(">IQ", data, p + 16)
                lang_off = p + 28
            else:
                timescale, duration = struct.unpack_from(">II", data, p + 8)
                lang_off = p + 16
            tr.duration_s = duration / timescale if timescale else 0.0
            (packed,) = struct.unpack_from(">H", data, lang_off)
            tr.language = "".join(
                chr(((packed >> s) & 0x1F) + 0x60) for s in (10, 5, 0)
            )
        elif btype == b"hdlr":
            tr.handler = data[body + 8 : body + 12].decode("latin-1")
        elif btype == b"minf":
            for b2, s2, e2 in iter_boxes(data, body, bend):
                if b2 == b"stbl":
                    _parse_stbl(data, s2, e2, tr)


def _parse_stbl(data: bytes, pos: int, end: int, tr: Mp4Track) -> None:
    for btype, body, bend in iter_boxes(data, pos, end):
        if btype == b"stsd":
            _, p = _full_box(data, body)
            (n_entries,) = struct.unpack_from(">I", data, p)
            if n_entries < 1:
                continue
            entry = p + 4  # first sample entry (a box itself)
            tr.codec = data[entry + 4 : entry + 8].decode("latin-1")
            if tr.handler == "vide":
                # VisualSampleEntry: width/height at +32 from entry start
                tr.width, tr.height = struct.unpack_from(
                    ">HH", data, entry + 32
                )
            elif tr.handler == "soun":
                # AudioSampleEntry: channels at +24, rate (16.16) at +32
                tr.channels, = struct.unpack_from(">H", data, entry + 24)
                (rate,) = struct.unpack_from(">I", data, entry + 32)
                tr.sample_rate = rate >> 16
        elif btype == b"stts":
            _, p = _full_box(data, body)
            (n_entries,) = struct.unpack_from(">I", data, p)
            total = 0
            for i in range(n_entries):
                count, _delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
                total += count
            tr.n_samples = total


def parse_mp4_info(data: bytes) -> dict:
    """Flat census dict (the profiling-query surface)."""
    info = parse_mp4(data)
    vid, aud = info.video(), info.audio()
    return {
        "major_brand": info.major_brand,
        "duration_s": info.duration_s,
        "n_tracks": len(info.tracks),
        "video_codec": vid.codec if vid else None,
        "width": vid.width if vid else None,
        "height": vid.height if vid else None,
        "n_video_samples": vid.n_samples if vid else None,
        "fps": (
            vid.n_samples / vid.duration_s
            if vid and vid.duration_s else None
        ),
        "audio_codec": aud.codec if aud else None,
        "channels": aud.channels if aud else None,
        "sample_rate": aud.sample_rate if aud else None,
        "language": vid.language if vid else (aud.language if aud else None),
    }


# ---------------------------------------------------------------------------
# fixture writer


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def _lang_pack(lang: str) -> int:
    a, b, c = (ord(ch) - 0x60 for ch in lang)
    return (a << 10) | (b << 5) | c


def encode_mp4_stub(
    *,
    width: int = 640,
    height: int = 360,
    duration_s: float = 2.0,
    timescale: int = 1000,
    n_video_samples: int = 48,
    video_codec: bytes = b"avc1",
    audio: bool = True,
    sample_rate: int = 48000,
    channels: int = 2,
    language: str = "und",
    mdat: bytes = b"\x00" * 16,
    use_largesize_mdat: bool = False,
) -> bytes:
    """Structurally valid MP4 for header-census fixtures: real box
    framing, fake media payload.  ``use_largesize_mdat`` exercises the
    64-bit box-size path."""
    dur = int(round(duration_s * timescale))

    def trak(track_id: int, handler: bytes, stsd_entry: bytes,
             n_samples: int) -> bytes:
        tkhd = _full(
            b"tkhd", 0,
            struct.pack(">II", 0, 0) + struct.pack(">I", track_id)
            + b"\x00" * 4 + struct.pack(">I", dur) + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = _full(
            b"mdhd", 0,
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">HH", _lang_pack(language), 0),
        )
        hdlr = _full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 13)
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + stsd_entry)
        stts = _full(
            b"stts", 0,
            struct.pack(">III", 1, n_samples,
                        max(dur // max(n_samples, 1), 1)),
        )
        stbl = _box(b"stbl", stsd + stts)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    visual = _box(
        video_codec,
        b"\x00" * 6 + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32 + struct.pack(">Hh", 24, -1),
    )
    tracks = trak(1, b"vide", visual, n_video_samples)
    if audio:
        audio_entry = _box(
            b"mp4a",
            b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HHHH", channels, 16, 0, 0)
            + struct.pack(">I", sample_rate << 16),
        )
        tracks += trak(2, b"soun", audio_entry,
                       int(duration_s * sample_rate))

    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, dur) + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd + tracks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    if use_largesize_mdat:
        mdat_box = (
            struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", len(mdat) + 16) + mdat
        )
    else:
        mdat_box = _box(b"mdat", mdat)
    return ftyp + moov + mdat_box
