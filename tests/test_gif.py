"""GIF codec: spec structure, golden-byte decode, LZW edge cases,
animation compositing, and the multimodal kernel dispatches.

No imaging library ships in this container, so like the JPEG tests the
decoder is verified against HAND-ASSEMBLED bytes (LZW bitstream packed
by explicit bit math, independent of ``lzw_encode``) and against a
test-local deferred-clear reference encoder; the encoder's output is
checked by structural parse plus roundtrip.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from atlas_upscaling_dask_spark.sources.gif import (
    decode_frame_indices,
    decode_gif,
    encode_gif,
    iter_composited,
    lzw_decode,
    lzw_encode,
    parse_gif,
    parse_gif_info,
)


def _pack_codes(codes_widths):
    """LSB-first GIF bit packing, independent of the codec under test."""
    acc = 0
    nbits = 0
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
    return acc.to_bytes((nbits + 7) // 8, "little")


# ---------------------------------------------------------------------------
# LZW


def test_lzw_golden_hand_packed_stream():
    # pixels [0,1,2,3] with mcs=2: clear=4, eoi=5.  The encoder-side
    # trace adds (0,1)->6, (1,2)->7, (2,3)->8; after code 8 is assigned
    # next_code-1 == 1<<3, so the LAST two codes switch to width 4.
    stream = _pack_codes(
        [(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)]
    )
    assert lzw_decode(stream, 2, 4).tolist() == [0, 1, 2, 3]
    # and our encoder produces exactly this packing
    assert lzw_encode(bytes([0, 1, 2, 3]), 2) == stream


def test_lzw_golden_code_equals_table_size_case():
    # the KwKwK special case: code == len(table) (first code 1, then
    # code 6 which does not exist yet => prev + prev[0] = [1,1])
    stream = _pack_codes([(4, 3), (1, 3), (6, 3), (5, 3)])
    assert lzw_decode(stream, 2, 3).tolist() == [1, 1, 1]


def test_lzw_roundtrip_random_and_degenerate():
    rng = np.random.default_rng(11)
    for alphabet, n in [(4, 1), (4, 7), (16, 4096), (256, 30000), (5, 9999)]:
        mcs = max(2, (alphabet - 1).bit_length())
        data = rng.integers(0, alphabet, n).astype(np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data, mcs), mcs, n).tobytes() == data
    # repetitive stream forces full table growth + in-stream clear reset
    data = bytes(range(4)) * 30000
    enc = lzw_encode(data, 2)
    assert lzw_decode(enc, 2, len(data)).tobytes() == data


def test_lzw_deferred_clear_stream_decodes():
    # A spec-legal stream whose encoder STOPS adding entries at 4096
    # and never sends a clear; the decoder must tolerate it (GIF89a
    # appendix F).  Test-local reference encoder, independent code.
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 60000).astype(np.uint8).tobytes()
    mcs = 8
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = []
    width = mcs + 1
    table = {}
    next_code = eoi + 1
    out.append((clear, width))
    w = data[0]
    for k in data[1:]:
        if (w, k) in table:
            w = table[(w, k)]
            continue
        out.append((w, width))
        if next_code < 4096:
            table[(w, k)] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        # else: deferred clear — table frozen, keep emitting
        w = k
    out.append((w, width))
    out.append((eoi, width))
    stream = _pack_codes(out)
    assert next_code == 4096  # the freeze actually happened
    assert lzw_decode(stream, mcs, len(data)).tobytes() == data


def test_lzw_rejects_corrupt_streams():
    with pytest.raises(ValueError, match="ended before"):
        lzw_decode(b"\x01", 2, 100)
    # first code past the base table
    stream = _pack_codes([(4, 3), (7, 3)])
    with pytest.raises(ValueError, match="bad first code"):
        lzw_decode(stream, 2, 4)
    # EOI arriving before the raster fills is an error, not padding
    stream = _pack_codes([(4, 3), (0, 3), (5, 3)])
    with pytest.raises(ValueError, match="EOI before"):
        lzw_decode(stream, 2, 9)


# ---------------------------------------------------------------------------
# golden container decode (no encoder involved)


def _golden_gif_bytes(version=b"89a", interlace=False):
    # 2x2 image, 4-color palette, pixels [[0,1],[2,3]] — the LZW data
    # is the hand-packed stream from the golden LZW test.
    pal = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 50, 60])
    lzw = _pack_codes([(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)])
    out = bytearray()
    out += b"GIF" + version
    out += struct.pack("<HH", 2, 2)
    out.append(0x80 | 0x01)  # GCT present, size field 1 -> 4 entries
    out.append(0)  # background index
    out.append(0)  # aspect
    out += pal
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, 2, 2)
    out.append(0x40 if interlace else 0)
    out.append(2)  # LZW min code size
    out.append(len(lzw))
    out += lzw
    out.append(0)  # sub-block terminator
    out.append(0x3B)
    return bytes(out)


def test_golden_hand_built_gif_decodes_exactly():
    img = decode_gif(_golden_gif_bytes())
    want = np.array(
        [[[10, 0, 0], [0, 20, 0]], [[0, 0, 30], [40, 50, 60]]], np.uint8
    )
    assert np.array_equal(img, want)


def test_gif87a_signature_accepted():
    info = parse_gif(_golden_gif_bytes(version=b"87a"))
    assert info.version == "87a"
    assert len(info.frames) == 1


def test_golden_interlaced_rows_reorder():
    # 2 rows: pass 1 takes row 0, pass 4 takes row 1 — for a 2-row
    # image the stored order equals display order, so extend to 4 rows:
    # stored order is rows [0, 2, 1, 3] (pass1: 0; pass3: 2; pass4: 1,3).
    pal = bytes([0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3])
    rows_display = np.repeat(np.arange(4, dtype=np.uint8), 2).reshape(4, 2)
    stored = rows_display[[0, 2, 1, 3]]
    lzw = lzw_encode(stored.tobytes(), 2)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", 2, 4)
    out += bytes([0x80 | 0x01, 0, 0]) + pal
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, 2, 4)
    out.append(0x40)  # interlaced
    out.append(2)
    out.append(len(lzw))
    out += lzw
    out += bytes([0, 0x3B])
    img = decode_gif(bytes(out))
    # palette entry i is (i, i, i), so the RGB canvas replicates the
    # DISPLAY-order rows across channels
    assert np.array_equal(img, np.repeat(rows_display[..., None], 3, axis=2))


# ---------------------------------------------------------------------------
# encoder roundtrips


def test_roundtrip_rgb_single_frame():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (63, 3)).astype(np.uint8)
    idx = rng.integers(0, 63, (37, 53)).astype(np.uint8)
    img = pal[idx]
    for interlace in (False, True):
        assert np.array_equal(
            decode_gif(encode_gif(img, interlace=interlace)), img
        )


def test_roundtrip_256_color_palette_and_multi_subblock_data():
    # full 256-entry palette (mcs=8) and >255 compressed bytes so the
    # data spans several sub-blocks
    rng = np.random.default_rng(5)
    pal = np.arange(768, dtype=np.uint8).reshape(256, 3)
    idx = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    g = encode_gif([idx], palette=pal)
    info = parse_gif(g)
    assert sum(s for _, s in info.frames[0].data_spans) > 255
    assert len(info.frames[0].data_spans) > 1
    assert np.array_equal(decode_gif(g), pal[idx])


def test_roundtrip_rejects_too_many_colors():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256-color palette"):
        encode_gif(img)


def test_animation_compositing_disposal_and_transparency():
    pal = np.array(
        [[0, 0, 0], [10, 0, 0], [0, 10, 0], [30, 40, 50], [1, 2, 3],
         [60, 70, 80], [5, 5, 5], [90, 100, 110], [8, 8, 8], [120, 20, 20]],
        np.uint8,
    )
    f0 = np.full((20, 30), 3, np.uint8)
    f1 = np.full((8, 10), 5, np.uint8)
    f2 = np.full((6, 6), 7, np.uint8)
    f2[2:4, 2:4] = 9  # transparent index
    g = encode_gif(
        [f0, f1, f2], palette=pal, screen_size=(20, 30),
        offsets=[(0, 0), (4, 6), (10, 20)],
        disposals=[1, 2, 3],
        transparent_indices=[None, None, 9],
        delays_cs=[10, 20, 30], loop=2,
    )
    frames = dict(iter_composited(g))
    e0 = np.zeros((20, 30, 3), np.uint8)
    e0[:] = pal[3]
    assert np.array_equal(frames[0], e0)
    e1 = e0.copy()
    e1[4:12, 6:16] = pal[5]
    assert np.array_equal(frames[1], e1)
    # disposal 2 restored frame 1's rect to the background color
    e2 = e1.copy()
    e2[4:12, 6:16] = pal[0]
    patch, mask = pal[f2], f2 != 9
    e2[10:16, 20:26][mask] = patch[mask]
    assert np.array_equal(frames[2], e2)
    info = parse_gif_info(g)
    assert info == {
        "version": "89a", "width": 30, "height": 20, "n_frames": 3,
        "gct_size": 16, "background_index": 0, "loop_count": 2,
        "animated": True, "has_transparency": True, "interlaced": False,
        "lzw_bytes": sum(
            s for f in parse_gif(g).frames for _, s in f.data_spans
        ),
        "total_delay_cs": 60,
    }


def test_disposal_3_restores_previous_canvas():
    pal = np.array([[0, 0, 0], [10, 0, 0], [0, 0, 0], [30, 40, 50]], np.uint8)
    f0 = np.full((20, 30), 3, np.uint8)
    f1 = np.full((5, 5), 1, np.uint8)
    g = encode_gif(
        [f0, f1, f1], palette=pal, screen_size=(20, 30),
        offsets=[(0, 0), (2, 2), (0, 0)], disposals=[1, 3, 0],
    )
    fr = dict(iter_composited(g))
    base = np.zeros((20, 30, 3), np.uint8)
    base[:] = pal[3]
    e1 = base.copy()
    e1[2:7, 2:7] = pal[1]
    assert np.array_equal(fr[1], e1)
    e2 = base.copy()
    e2[0:5, 0:5] = pal[1]  # frame 1's rect was restored before frame 2
    assert np.array_equal(fr[2], e2)


def test_frame_rect_validation_and_range():
    g = encode_gif(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="out of range"):
        decode_gif(g, frame=1)
    # corrupt the descriptor geometry: frame claims 5 rows on a 4-row screen
    info = parse_gif(g)
    assert info.frames[0].height == 4
    bad = bytearray(g)
    # image descriptor: 0x2C at some offset; height is bytes +7..8
    pos = bad.index(0x2C, 13 + 3 * 2)
    struct.pack_into("<H", bad, pos + 7, 5)
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


def test_truncation_and_signature_errors():
    g = encode_gif(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="signature"):
        parse_gif(b"NOTAGIF" + g)
    with pytest.raises(ValueError):
        parse_gif(g[:10])
    with pytest.raises(ValueError):
        parse_gif(g[:-2])  # trailer gone


def test_sub_rect_frame_own_indices():
    pal = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2], [9, 9, 9]], np.uint8)
    sub = np.array([[1, 2], [2, 1]], np.uint8)
    g = encode_gif(
        [np.zeros((6, 6), np.uint8), sub], palette=pal,
        screen_size=(6, 6), offsets=[(0, 0), (3, 1)],
    )
    info = parse_gif(g)
    assert (info.frames[1].top, info.frames[1].left) == (3, 1)
    assert np.array_equal(decode_frame_indices(g, info, 1), sub)


# ---------------------------------------------------------------------------
# multimodal kernel dispatch


def test_decode_image_gif_first_composited_frame():
    from atlas_upscaling_dask_spark.extensions.multimodal import decode_image

    pal = np.array([[10, 20, 30], [200, 100, 0]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    out = decode_image(encode_gif([idx], palette=pal))
    assert np.array_equal(out, pal[idx])


def test_image_phash_gif_vs_png_exact_parity(spark):
    # GIF is lossless for <=256 distinct values, so the SAME gray
    # raster through PNG and GIF must produce the IDENTICAL hash.
    from atlas_upscaling_dask_spark.extensions.multimodal import image_phash
    from atlas_upscaling_dask_spark.sources.png import encode_png

    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, size=(64, 48), dtype=np.uint8)
    gif_rgb = np.stack([base] * 3, axis=2)
    media = spark.createDataFrame(
        [
            (0, bytearray(encode_png(base))),
            (1, bytearray(encode_gif(gif_rgb))),
        ],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r["phash"] for r in image_phash(media).collect()}
    assert out[0] == out[1]


def test_resize_images_gif_payloads(spark):
    from atlas_upscaling_dask_spark.extensions.multimodal import resize_images

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (np.add.outer(np.arange(20), np.arange(24)) % 16).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_gif([idx], palette=pal)),
          (24, 20, None, None, "gif"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,"
        "codec:string>",
    )
    row = resize_images(media, 6, 8).collect()[0]
    out = decode_gif(bytes(row["payload"]))
    yi, xi = (np.arange(8) * 20) // 8, (np.arange(6) * 24) // 6
    assert np.array_equal(out, pal[idx][yi][:, xi])
    assert (row["meta"]["width"], row["meta"]["height"]) == (6, 8)


def test_extract_frames_and_video_hashes_gif(spark):
    # 4-frame animation, full-frame constant colors, disposal 1: the
    # composited frame f is constant c_f, so both the digest and the
    # sampling arithmetic are predictable.
    import hashlib

    from atlas_upscaling_dask_spark.extensions.multimodal import (
        extract_frames,
        video_frame_hashes,
    )

    pal = np.array([[11, 11, 11], [22, 22, 22], [33, 33, 33],
                    [44, 44, 44]], np.uint8)
    frames = [np.full((10, 12), i, np.uint8) for i in range(4)]
    payload = encode_gif(frames, palette=pal, disposals=[1] * 4)
    media = spark.createDataFrame(
        [(7, "video", bytearray(payload), (12, 10, None, 4, "gif"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,"
        "codec:string>",
    )
    got = {
        r["frame_idx"]: r["sha256"]
        for r in extract_frames(media, every_n=2, fake=False).collect()
    }
    assert sorted(got) == [0, 2]
    for f in (0, 2):
        want = hashlib.sha256(bytes([pal[f][0]]) * (10 * 12 * 3)).hexdigest()
        assert got[f] == want
    hs = video_frame_hashes(media, every_n=2).collect()
    assert sorted(r["frame_idx"] for r in hs) == [0, 2]


def test_video_hashes_non_container_still_raises(spark):
    from atlas_upscaling_dask_spark.extensions.multimodal import (
        video_frame_hashes,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x00\x18ftypisom----"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="media library"):
        video_frame_hashes(media).collect()
