"""MP4 (ISO BMFF) header census: box framing (compact / largesize /
to-EOF), v0+v1 full boxes, sample-entry geometry, census fields, and
the decode contract staying closed.
"""

from __future__ import annotations

import struct

import pytest

from atlas_upscaling_dask_spark.sources.mp4 import (
    encode_mp4_stub,
    iter_boxes,
    parse_mp4,
    parse_mp4_info,
)


def test_census_roundtrip_video_and_audio():
    b = encode_mp4_stub(
        width=320, height=240, duration_s=2.0, n_video_samples=48,
        sample_rate=44100, channels=1, language="fra",
    )
    info = parse_mp4_info(b)
    assert info == {
        "major_brand": "isom",
        "duration_s": 2.0,
        "n_tracks": 2,
        "video_codec": "avc1",
        "width": 320,
        "height": 240,
        "n_video_samples": 48,
        "fps": 24.0,
        "audio_codec": "mp4a",
        "channels": 1,
        "sample_rate": 44100,
        "language": "fra",
    }


def test_video_only_and_largesize_mdat():
    b = encode_mp4_stub(audio=False, use_largesize_mdat=True)
    info = parse_mp4_info(b)
    assert info["n_tracks"] == 1
    assert info["audio_codec"] is None
    assert info["channels"] is None
    # the largesize box is actually present and walkable
    types = [t for t, _, _ in iter_boxes(b, 0, len(b))]
    assert types == [b"ftyp", b"moov", b"mdat"]


def test_mvhd_mdhd_version1_path():
    # hand-assemble v1 mvhd/mdhd (64-bit times) — the writer emits v0,
    # so this exercises the parser's other branch independently
    def box(t, p):
        return struct.pack(">I", len(p) + 8) + t + p

    def full(t, v, p):
        return box(t, bytes([v, 0, 0, 0]) + p)

    mvhd = full(b"mvhd", 1,
                struct.pack(">QQIQ", 0, 0, 90000, 270000) + b"\x00" * 80)
    mdhd = full(b"mdhd", 1,
                struct.pack(">QQIQ", 0, 0, 600, 1200)
                + struct.pack(">HH", (5 << 10) | (14 << 5) | 7, 0))  # "eng"
    hdlr = full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 13)
    tkhd = full(b"tkhd", 1,
                struct.pack(">QQI", 0, 0, 7) + b"\x00" * 4
                + struct.pack(">Q", 270000) + b"\x00" * 60)
    mdia = box(b"mdia", mdhd + hdlr)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + b"\x00" * 4)
    info = parse_mp4(ftyp + moov)
    assert info.duration_s == 3.0  # 270000 / 90000
    assert info.tracks[0].track_id == 7
    assert info.tracks[0].duration_s == 2.0  # 1200 / 600
    assert info.tracks[0].language == "eng"


def test_truncation_and_signature_errors():
    b = encode_mp4_stub()
    with pytest.raises(ValueError, match="ftyp/moov"):
        parse_mp4(b"\x00\x00\x00\x08free")
    # cut INSIDE moov so a declared box runs past the data
    with pytest.raises(ValueError, match="truncated"):
        parse_mp4(b[: b.index(b"moov") + 40])


def test_decode_contract_stays_closed(spark):
    # census works, decode still refuses: an MP4 payload through the
    # frame path raises the documented contract error
    from atlas_upscaling_dask_spark.extensions.multimodal import extract_frames

    b = encode_mp4_stub()
    media = spark.createDataFrame(
        [(1, "video", bytearray(b), (640, 360, None, 48, "h264"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,"
        "codec:string>",
    )
    with pytest.raises(Exception, match="media library"):
        extract_frames(media, fake=False).collect()
