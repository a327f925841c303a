"""AVI/RIFF container: structural parse, idx1 offset disambiguation,
movi-scan fallback, MJPEG decode through the multimodal video kernels.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from atlas_upscaling_dask_spark.sources.avi import (
    encode_avi,
    parse_avi,
    parse_avi_info,
    read_avi_frame,
    require_mjpeg,
)
from atlas_upscaling_dask_spark.sources.jpeg import decode_jpeg, encode_jpeg

ONES = (np.ones((8, 8), np.int64), np.ones((8, 8), np.int64))


def _frames(payloads=(b"frameA..", b"odd-size-frame!", b"x")):
    # container-level fixtures don't need real JPEG bytes; odd sizes
    # exercise word alignment
    return list(payloads)


def test_roundtrip_container_fields_and_frames():
    frames = _frames()
    avi = encode_avi(frames, width=32, height=24, fps_rate=25, fps_scale=1)
    info = parse_avi(avi)
    assert (info.width, info.height) == (32, 24)
    assert info.total_frames == 3
    assert info.has_index
    assert info.fps == 25.0
    assert info.video_codec == "MJPG"
    assert [read_avi_frame(avi, info, i) for i in range(3)] == frames
    with pytest.raises(ValueError, match="out of range"):
        read_avi_frame(avi, info, 3)


def test_structural_layout_hand_parsed():
    # hand-walk the writer's bytes: RIFF/AVI signature, LIST hdrl with
    # avih geometry, LIST movi with word-aligned 00dc chunks, idx1 with
    # movi-relative offsets — independent of parse_avi
    frames = _frames()
    avi = encode_avi(frames, width=32, height=24)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", avi, 4)
    assert 8 + riff_size == len(avi)
    # first LIST is hdrl
    assert avi[12:16] == b"LIST" and avi[20:24] == b"hdrl"
    assert avi[24:28] == b"avih"
    (avih_size,) = struct.unpack_from("<I", avi, 28)
    assert avih_size == 56
    w, h = struct.unpack_from("<II", avi, 32 + 32)
    assert (w, h) == (32, 24)
    # locate movi fourcc and idx1
    movi_fcc = avi.index(b"movi")
    first = movi_fcc + 4
    assert avi[first : first + 4] == b"00dc"
    (sz0,) = struct.unpack_from("<I", avi, first + 4)
    assert sz0 == len(frames[0])
    second = first + 8 + sz0 + (sz0 & 1)
    assert avi[second : second + 4] == b"00dc"  # alignment held
    idx = avi.index(b"idx1")
    (rel0,) = struct.unpack_from("<I", avi, idx + 8 + 8)
    assert rel0 == 4  # first chunk header sits right after "movi"


def test_idx1_absolute_offsets_disambiguated():
    frames = _frames()
    avi = bytearray(encode_avi(frames, width=8, height=8))
    movi_fcc = avi.index(b"movi")
    idx = avi.index(b"idx1")
    (idx_size,) = struct.unpack_from("<I", avi, idx + 4)
    # rewrite every idx1 offset from movi-relative to absolute
    for off in range(idx + 8, idx + 8 + idx_size, 16):
        (rel,) = struct.unpack_from("<I", avi, off + 8)
        struct.pack_into("<I", avi, off + 8, movi_fcc + rel)
    info = parse_avi(bytes(avi))
    assert [read_avi_frame(bytes(avi), info, i) for i in range(3)] == frames


def test_movi_scan_fallback_without_index():
    frames = _frames()
    avi = encode_avi(frames, width=8, height=8, write_index=False)
    info = parse_avi(avi)
    assert not info.has_index
    assert [read_avi_frame(avi, info, i) for i in range(3)] == frames


def test_non_mjpg_codec_refused_for_decode_but_parses():
    avi = bytearray(encode_avi(_frames(), width=8, height=8))
    # flip both the strh handler and the strf compression to H264
    pos = avi.index(b"MJPG")
    avi[pos : pos + 4] = b"H264"
    pos = avi.index(b"MJPG", pos + 4)
    avi[pos : pos + 4] = b"H264"
    info = parse_avi(bytes(avi))
    assert info.video_codec == "H264"
    with pytest.raises(NotImplementedError, match="media library"):
        require_mjpeg(info)


def test_signature_and_truncation_errors():
    avi = encode_avi(_frames(), width=8, height=8)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFX" + avi[4:])
    with pytest.raises(ValueError):
        parse_avi(avi[:40])


def test_parse_avi_info_census():
    frames = _frames()
    avi = encode_avi(frames, width=32, height=24, fps_rate=30)
    info = parse_avi_info(avi)
    assert info["width"] == 32 and info["height"] == 24
    assert info["n_frames"] == 3
    assert info["fps"] == 30.0
    assert info["video_codec"] == "MJPG"
    assert info["has_index"] is True
    assert info["video_bytes"] == sum(len(f) for f in frames)


def _mjpeg_avi(n_frames=6, h=24, w=32):
    rng = np.random.default_rng(5)
    imgs = [
        rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n_frames)
    ]
    jpegs = [encode_jpeg(im, quant_tables=ONES) for im in imgs]
    return encode_avi(jpegs, width=w, height=h), jpegs


def test_extract_frames_mjpeg_avi(spark):
    from atlas_upscaling_dask_spark.extensions.multimodal import extract_frames

    avi, jpegs = _mjpeg_avi()
    media = spark.createDataFrame(
        [(3, "video", bytearray(avi), (32, 24, None, 6, "mjpeg"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,"
        "codec:string>",
    )
    got = {
        r["frame_idx"]: r["sha256"]
        for r in extract_frames(media, every_n=2, fake=False).collect()
    }
    assert sorted(got) == [0, 2, 4]
    for i in (0, 2, 4):
        want = hashlib.sha256(decode_jpeg(jpegs[i]).tobytes()).hexdigest()
        assert got[i] == want


def test_video_frame_hashes_mjpeg_avi(spark):
    from atlas_upscaling_dask_spark.extensions.multimodal import (
        _dct_matrix,
        _phash_of,
        video_frame_hashes,
    )

    avi, jpegs = _mjpeg_avi(n_frames=3)
    media = spark.createDataFrame(
        [(9, bytearray(avi))], "media_id long, payload binary"
    )
    m = _dct_matrix(32)
    want = {
        i: _phash_of(decode_jpeg(j), m, 8, 32) for i, j in enumerate(jpegs)
    }
    got = {
        r["frame_idx"]: r["phash"] for r in video_frame_hashes(media).collect()
    }
    assert got == want
