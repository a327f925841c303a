"""WebP: RIFF census, VP8L lossless decode (all transform/LZ77/cache
paths), the bounded encoder round-trip, and the Spark kernels.

The decode-only features the literal-only encoder never emits (LZ77
backward references, the color cache, meta prefix codes, predictor and
color transforms) are exercised with HAND-BUILT bitstreams assembled
from the module's low-level emit helpers, with expectations computed
by independent scalar arithmetic in the test.
"""

from __future__ import annotations

import numpy as np
import pytest

from atlas_upscaling_dask_spark.sources import webp as W
from atlas_upscaling_dask_spark.sources.webp import (
    decode_webp,
    encode_webp_animated_stub,
    encode_webp_lossless,
    encode_webp_lossy_stub,
    parse_webp_info,
)


def _rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# encoder round-trips (these prove the decoder's literal path too)


def test_roundtrip_rgb():
    img = _rng().integers(0, 256, (13, 17, 3), dtype=np.uint8)
    data = encode_webp_lossless(img)
    assert (decode_webp(data) == img).all()


def test_roundtrip_rgba_and_alpha_hint():
    img = _rng().integers(0, 256, (9, 7, 4), dtype=np.uint8)
    data = encode_webp_lossless(img)
    assert parse_webp_info(data)["has_alpha"] is True
    chunks = dict(W.iter_riff_chunks(data))
    assert (W.decode_vp8l(chunks[b"VP8L"]) == img).all()


def test_roundtrip_grayscale():
    g = _rng().integers(0, 256, (32, 32), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(g))
    assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()


def test_roundtrip_subtract_green_transform():
    img = _rng().integers(0, 256, (11, 5, 3), dtype=np.uint8)
    data = encode_webp_lossless(img, subtract_green=True)
    assert (decode_webp(data) == img).all()


@pytest.mark.parametrize("ncol", [2, 3, 9, 17, 200])
def test_roundtrip_palette_all_bundle_widths(ncol):
    # 2 -> 1-bit, 3 -> 2-bit, 9 -> 4-bit, 17/200 -> 8-bit indices
    rng = _rng()
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, (11, 23))]
    data = encode_webp_lossless(img, use_palette=True)
    assert (decode_webp(data) == img).all()


def test_roundtrip_single_color():
    # one distinct value per channel: the 1-symbol (zero-bit) code path
    img = np.full((6, 6, 3), 77, dtype=np.uint8)
    assert (decode_webp(encode_webp_lossless(img)) == img).all()


def test_roundtrip_nonuint8_rejected():
    with pytest.raises(ValueError, match="uint8"):
        encode_webp_lossless(np.zeros((4, 4, 3), dtype=np.uint16))


# ---------------------------------------------------------------------------
# census


def test_census_lossless():
    info = parse_webp_info(encode_webp_lossless(np.zeros((8, 5), np.uint8)))
    assert info == {"variant": "lossless", "width": 5, "height": 8,
                    "has_alpha": False, "has_animation": False, "n_frames": 1}


def test_census_lossy_and_animated():
    assert parse_webp_info(encode_webp_lossy_stub(640, 480)) == {
        "variant": "lossy", "width": 640, "height": 480,
        "has_alpha": False, "has_animation": False, "n_frames": 1,
    }
    info = parse_webp_info(encode_webp_animated_stub(100, 80, 5, True))
    assert info["variant"] == "extended-lossy"
    assert (info["width"], info["height"]) == (100, 80)
    assert info["has_alpha"] and info["has_animation"]
    assert info["n_frames"] == 5


def test_extended_lossless_census_and_decode():
    rng = _rng()
    rgba = rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
    rgba[:, :, 3] = 255
    data = W.encode_webp_extended_lossless(rgba)
    info = parse_webp_info(data)
    assert info["variant"] == "extended-lossless"
    assert (info["width"], info["height"]) == (7, 5)
    assert info["has_alpha"] is False and info["n_frames"] == 1
    # same VP8L decode path as the simple container
    assert (decode_webp(data) == rgba[:, :, :3]).all()
    rgba[0, 0, 3] = 0
    assert parse_webp_info(
        W.encode_webp_extended_lossless(rgba)
    )["has_alpha"] is True


def test_census_errors():
    with pytest.raises(ValueError, match="magic"):
        parse_webp_info(b"RIFFxxxxWAVE" + b"\x00" * 8)
    good = encode_webp_lossy_stub(10, 10)
    with pytest.raises(ValueError, match="truncated"):
        parse_webp_info(good[:-3])


def test_lossy_stub_payload_is_rejected_not_fabricated():
    # round 11: lossy VP8 keyframes now DECODE (sources/vp8.py); the
    # census stub's header-only payload must be refused, not decoded
    # from zero bits (tests/test_vp8.py covers the real decode paths)
    with pytest.raises(ValueError, match="empty first partition"):
        decode_webp(encode_webp_lossy_stub(16, 16))


# ---------------------------------------------------------------------------
# hand-built bitstreams for the decode-only paths


def _header(bw, w, h):
    bw.write(W._VP8L_MAGIC, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _decode(bw, w, h):
    br = W._BitReader(bw.getvalue())
    assert br.read(8) == W._VP8L_MAGIC
    assert br.read(14) + 1 == w and br.read(14) + 1 == h
    br.read(4)
    return W._decode_image_stream(br, w, h, True)


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def test_lz77_backref_2d_left_and_row_above():
    # 10x2: ten distinct literals, then one backref (dist map entry 1 =
    # (0,1) -> the row above) copying the whole first row
    w, h = 10, 2
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta
    # length 10 uses prefix code 6: extra=(6-2)>>1=2,
    # offset=(2+0)<<2=8, value = 8 + e + 1 with e=1
    gfreq = [0] * 280
    for g in range(10):
        gfreq[g] = 1
    gfreq[256 + 6] = 1
    gc = W._write_prefix_code(bw, gfreq)
    rc = W._write_prefix_code(bw, [0] * 255 + [1])
    bc = W._write_prefix_code(bw, [1] + [0] * 255)
    ac = W._write_prefix_code(bw, [0] * 255 + [1])
    dc = W._write_prefix_code(bw, [1] + [0] * 39)
    for g in range(10):
        W._emit_symbol(bw, gc, g)
        W._emit_symbol(bw, rc, 255)
        W._emit_symbol(bw, bc, 0)
        W._emit_symbol(bw, ac, 255)
    W._emit_symbol(bw, gc, 256 + 6)
    bw.write(1, 2)  # extra bits for length 10 (8 + 1 + 1)
    W._emit_symbol(bw, dc, 0)  # dist prefix value 1 -> map (0,1) -> dist=w
    img = _decode(bw, w, h)
    expect_row = [_argb(255, 255, g, 0) for g in range(10)]
    assert [int(v) for v in img[0]] == expect_row
    assert [int(v) for v in img[1]] == expect_row  # copied from row above


def test_lz77_backref_absolute_distance():
    # 1x6: one literal then a 5-px overlapping backref at absolute
    # distance 1 (dist code value 121 -> 121-120)
    w, h = 6, 1
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    gfreq = [0] * 280
    gfreq[9] = 1
    gfreq[256 + 3] = 1  # length prefix 3 -> value 4... need 5: code 4
    gfreq[256 + 4] = 1  # keep both; emit code 4 (extra=1,offset=4,4+e+1)
    gc = W._write_prefix_code(bw, gfreq)
    rc = W._write_prefix_code(bw, [0] * 7 + [1] + [0] * 248)  # r=7
    bc = W._write_prefix_code(bw, [0] * 3 + [1] + [0] * 252)  # b=3
    ac = W._write_prefix_code(bw, [0] * 255 + [1])
    # dist value 121: prefix code 13 (extra=5, offset=96, 96+e+1=121 ->
    # e=24)
    dfreq = [0] * 40
    dfreq[13] = 1
    dc = W._write_prefix_code(bw, dfreq)
    W._emit_symbol(bw, gc, 9)
    W._emit_symbol(bw, rc, 7)
    W._emit_symbol(bw, bc, 3)
    W._emit_symbol(bw, ac, 255)
    W._emit_symbol(bw, gc, 256 + 4)  # length: 4 + e + 1
    bw.write(0, 1)  # e=0 -> length 5
    W._emit_symbol(bw, dc, 13)
    bw.write(24, 5)  # -> dist value 121 -> absolute distance 1
    img = _decode(bw, w, h)
    assert [int(v) for v in img[0]] == [_argb(255, 7, 9, 3)] * 6


def test_color_cache_hit():
    w, h = 3, 1
    cache_bits = 4
    px = _argb(255, 20, 10, 30)
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    n_green = 256 + 24 + (1 << cache_bits)
    gfreq = [0] * n_green
    gfreq[10] = 1
    gfreq[256 + 24 + idx] = 1
    gc = W._write_prefix_code(bw, gfreq)
    rc = W._write_prefix_code(bw, [0] * 20 + [1] + [0] * 235)
    bc = W._write_prefix_code(bw, [0] * 30 + [1] + [0] * 225)
    ac = W._write_prefix_code(bw, [0] * 255 + [1])
    dc = W._write_prefix_code(bw, [1] + [0] * 39)
    W._emit_symbol(bw, gc, 10)  # literal -> populates the cache
    W._emit_symbol(bw, rc, 20)
    W._emit_symbol(bw, bc, 30)
    W._emit_symbol(bw, ac, 255)
    W._emit_symbol(bw, gc, 256 + 24 + idx)  # cache hit
    W._emit_symbol(bw, gc, 256 + 24 + idx)  # and again
    img = _decode(bw, w, h)
    assert [int(v) for v in img[0]] == [px, px, px]


def test_meta_prefix_codes_two_groups():
    # 8x1 with meta_bits=2: blocks of 4 px; group 0 decodes green=5,
    # group 1 green=9 — distinct codes per block prove the meta path
    w, h = 8, 1
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta present
    bw.write(0, 3)  # meta_bits = 2
    ent = np.array([[_argb(0, 0, 0, 0), _argb(0, 0, 1, 0)]], dtype=np.uint32)
    W._encode_image_stream(bw, ent, False)  # entropy image (2x1)
    for green in (5, 9):  # group 0, then group 1
        gf = [0] * 280
        gf[green] = 1
        W._write_prefix_code(bw, gf)
        W._write_prefix_code(bw, [0] * (green * 10) + [1]
                             + [0] * (256 - green * 10 - 1))  # r=g*10
        W._write_prefix_code(bw, [1] + [0] * 255)  # b=0
        W._write_prefix_code(bw, [0] * 255 + [1])  # a=255
        W._write_prefix_code(bw, [1] + [0] * 39)
    # all codes are 1-symbol (zero bits) -> no pixel bits at all
    img = _decode(bw, w, h)
    assert [int(v) for v in img[0, :4]] == [_argb(255, 50, 5, 0)] * 4
    assert [int(v) for v in img[0, 4:]] == [_argb(255, 90, 9, 0)] * 4


def _emit_literal_stream(bw, argb):
    """Cache-bit + codes + pixels for a sub-image-role stream."""
    W._encode_image_stream(bw, argb, False)


def test_predictor_transform_modes_T_and_clamp():
    # 2x2, one 4x4 block, mode 2 (T): out(0,0)=res+black,
    # out(0,1)=res+L (top row), out(1,0)=res+T (left col),
    # out(1,1)=res+T
    res = np.array(
        [[_argb(0, 1, 2, 3), _argb(0, 4, 5, 6)],
         [_argb(0, 7, 8, 9), _argb(0, 1, 1, 1)]],
        dtype=np.uint32,
    )
    bw = W._BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)  # transform present
    bw.write(W._PREDICTOR_TRANSFORM, 2)
    bw.write(0, 3)  # size_bits = 2 -> 4x4 blocks -> one block
    mode_img = np.array([[2 << 8]], dtype=np.uint32)
    _emit_literal_stream(bw, mode_img)
    # main image continues: end-of-transforms, cache, meta, codes, px
    W._encode_image_stream(bw, res, True)
    img = _decode(bw, 2, 2)
    p00 = _argb(0xFF, 1, 2, 3)
    p01 = _argb(0xFF, 5, 7, 9)  # + L = p00
    p10 = _argb(0xFF, 8, 10, 12)  # + T = p00
    p11 = _argb(0xFF, 6, 8, 10)  # + T = p01
    assert [[int(v) for v in row] for row in img] == [[p00, p01], [p10, p11]]


def test_predictor_transform_mode12_clamp_add_subtract():
    # mode 12: clamp(L + T - TL) per channel; residual zero at (1,1)
    res = np.array(
        [[_argb(0, 200, 0, 0), _argb(0, 50, 0, 0)],
         [_argb(0, 55, 0, 0), _argb(0, 0, 0, 0)]],
        dtype=np.uint32,
    )
    bw = W._BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(W._PREDICTOR_TRANSFORM, 2)
    bw.write(0, 3)
    _emit_literal_stream(bw, np.array([[12 << 8]], dtype=np.uint32))
    W._encode_image_stream(bw, res, True)
    img = _decode(bw, 2, 2)
    # reconstruct: TL=(255,200,0,0) T=(255,250,0,0) L=(255,255,0,0)
    # wait: out00 = res+black = a=255,r=200; out01 = res01+L(out00):
    # r=250; out10 = res10+T(out00): r=255(200+55)
    # pred11 r = clamp(255 + 250 - 200) = 255; a = clamp(255+255-255)
    assert int(img[1, 1]) == _argb(0xFF, 255, 0, 0)


def test_color_transform_inverse():
    # one block, transform element: g2r=16, g2b=0, r2b=8
    g2r, g2b, r2b = 16, 0, 8
    cte = _argb(0, r2b, g2b, g2r)  # red=r2b, green=g2b, blue=g2r
    res = np.array([[_argb(255, 100, 64, 50)]], dtype=np.uint32)
    bw = W._BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(W._COLOR_TRANSFORM, 2)
    bw.write(0, 3)  # size_bits=2
    _emit_literal_stream(bw, np.array([[cte]], dtype=np.uint32))
    W._encode_image_stream(bw, res, True)
    img = _decode(bw, 1, 1)
    # int8 math: green=64 -> delta_r = (16*64)>>5 = 32 -> red=132
    # delta_b = (0*64)>>5 + (8*int8(132))>>5; int8(132) = -124
    # (8*-124)>>5 = -992>>5 = -31 -> blue = (50-31)&0xff = 19
    assert int(img[0, 0]) == _argb(255, 132, 64, 19)


def test_truncated_stream_raises():
    img = _rng().integers(0, 256, (6, 6, 3), dtype=np.uint8)
    data = encode_webp_lossless(img)
    chunks = dict(W.iter_riff_chunks(data))
    with pytest.raises(ValueError, match="truncated"):
        W.decode_vp8l(chunks[b"VP8L"][: len(chunks[b"VP8L"]) // 2])


def test_riff_declared_size_bounds_payloads():
    """r10 advice: a chunk whose size field extends past the declared
    RIFF end must be rejected, not served from trailing bytes."""
    img = _rng().integers(0, 256, (4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_webp_lossless(img))
    # shrink the declared RIFF size so the VP8L chunk overruns it,
    # while leaving the real bytes (the would-be trailing data) intact
    import struct

    (riff_size,) = struct.unpack_from("<I", data, 4)
    struct.pack_into("<I", data, 4, riff_size - 4)
    with pytest.raises(ValueError, match="truncated"):
        list(W.iter_riff_chunks(bytes(data)))


def test_prefix_code_kraft_validation():
    """r10 advice: over-/under-subscribed length sets and a duplicated
    simple-form symbol must raise, not decode garbage or desync."""
    # under-subscribed: one symbol of length 2 leaves 3/4 of the code
    # space dead
    with pytest.raises(ValueError, match="Kraft"):
        W._PrefixCode([2, 0, 2])
    # over-subscribed: three length-1 symbols claim 3/2 of the space
    with pytest.raises(ValueError, match="Kraft"):
        W._PrefixCode([1, 1, 1])
    # complete codes still build fine
    assert W._PrefixCode([1, 1]).table is not None
    assert W._PrefixCode([1, 2, 2]).table is not None
    # simple two-symbol form with s1 == s0: build a stream whose
    # header says "simple, 2 symbols, 8-bit first" then repeats the
    # symbol; _read_prefix_code must reject it
    bw = W._BitWriter()
    bw.write(1, 1)  # simple
    bw.write(1, 1)  # num_symbols - 1 = 1
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(42, 8)  # s0
    bw.write(42, 8)  # s1 == s0
    br = W._BitReader(bw.getvalue())
    with pytest.raises(ValueError, match="repeats symbol"):
        W._read_prefix_code(br, 256)


# ---------------------------------------------------------------------------
# animated WebP (real VP8L frames)


def test_anim_roundtrip_replace_and_dispose():
    rng = _rng()
    f0 = np.full((10, 12, 3), 40, np.uint8)
    f1 = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    f2 = np.full((10, 12, 3), 90, np.uint8)
    data = W.encode_webp_animated(
        [f0, f1, f2], xy=[(0, 0), (2, 4), (0, 0)],
        durations_ms=[50, 60, 70], dispose_bg=[False, True, False],
        background=(1, 2, 3, 255), loop=5,
    )
    info = parse_webp_info(data)
    assert info["n_frames"] == 3 and info["has_animation"]
    meta, frames = W.parse_webp_frames(data)
    assert meta["loop_count"] == 5
    assert meta["background"] == (1, 2, 3, 255)
    assert frames[1]["x"] == 2 and frames[1]["y"] == 4
    assert frames[1]["duration_ms"] == 60 and frames[1]["dispose_bg"]
    comp = dict(W.iter_webp_composited(data))
    assert (comp[0][:, :, :3] == 40).all()
    assert (comp[1][4:8, 2:8, :3] == f1).all()  # frame rect replaced
    assert (comp[1][0, 0, :3] == 40).all()  # outside rect untouched
    assert (comp[2][:, :, :3] == 90).all()
    assert len(dict(W.iter_webp_composited(data, upto=1))) == 2


def test_anim_alpha_blend():
    blue = np.zeros((2, 2, 4), np.uint8)
    blue[:, :, 2] = 255
    blue[:, :, 3] = 255
    red = np.zeros((2, 2, 4), np.uint8)
    red[:, :, 0] = 255
    red[:, :, 3] = 128
    data = W.encode_webp_animated([blue, red], blend=[False, True])
    px = dict(W.iter_webp_composited(data))[1][0, 0]
    # over-operator: out.a=1, out.r = 255*(128/255), out.b = 255*(1-a)
    assert px[3] == 255
    assert abs(int(px[0]) - 128) <= 1 and abs(int(px[2]) - 127) <= 1


def test_anim_odd_offset_rejected_and_vp8_frames_contract():
    f = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="even"):
        W.encode_webp_animated([f], xy=[(1, 0)], canvas=(8, 8))
    # a lossy-framed animation walks but refuses decode, per contract
    stub = encode_webp_animated_stub(16, 16, 2)
    with pytest.raises(ValueError, match="no image chunk"):
        list(W.iter_webp_composited(stub))


def test_extract_frames_webp_matches_gif_truth(spark):
    # the same constant-color clip via GIF and WebP containers must
    # digest identically (composited-RGB-canvas parity)
    from atlas_upscaling_dask_spark.extensions.multimodal import (
        extract_frames,
    )
    from atlas_upscaling_dask_spark.sources.gif import encode_gif

    colors = [10, 60, 110, 160]
    frames = [np.full((10, 12, 3), c, np.uint8) for c in colors]
    gif = encode_gif(frames, disposals=[1] * 4,
                     delays_cs=[10] * 4, loop=0)
    webp = W.encode_webp_animated(frames)
    rows = [
        (1, "video", bytearray(gif),
         {"width": 12, "height": 10, "sample_rate": None,
          "n_frames": 4, "codec": "gif"}),
        (2, "video", bytearray(webp),
         {"width": 12, "height": 10, "sample_rate": None,
          "n_frames": 4, "codec": "webp"}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,"
        "n_frames:int,codec:string>",
    )
    got = extract_frames(df, every_n=2, fake=False).collect()
    by = {}
    for r in got:
        by.setdefault(r["media_id"], {})[r["frame_idx"]] = r["sha256"]
    assert by[1] == by[2]  # two containers, one compositing truth


# ---------------------------------------------------------------------------
# pHash parity + Spark kernels


def test_phash_webp_equals_png(spark):
    from atlas_upscaling_dask_spark.extensions.multimodal import image_phash
    from atlas_upscaling_dask_spark.sources.png import encode_png

    rng = _rng()
    gray = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(gray))),
        (2, bytearray(encode_webp_lossless(gray))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["phash"] for r in image_phash(df).collect()}
    assert got[1] == got[2]  # two codecs, one answer


def test_media_census_webp(spark):
    from atlas_upscaling_dask_spark.extensions.multimodal import media_census

    rows = [
        (1, bytearray(encode_webp_lossless(np.zeros((8, 5), np.uint8)))),
        (2, bytearray(encode_webp_lossy_stub(640, 480))),
        (3, bytearray(encode_webp_animated_stub(100, 80, 4))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (r["format"], r["width"], r["height"], r["n_frames"])
        for r in media_census(df).collect()
    }
    assert got == {
        1: ("webp", 5, 8, 1),
        2: ("webp", 640, 480, 1),
        3: ("webp", 100, 80, 4),
    }
