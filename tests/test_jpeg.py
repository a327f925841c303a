"""Baseline JPEG codec: spec structure, golden-byte decode, roundtrip
fidelity, contract rejections.

No imaging library ships in this container, so the codec is verified
the hard way: a golden JPEG is assembled BY HAND (marker by marker,
bit by bit, from T.81's tables) independently of the encoder, and the
decoder must produce the analytically known pixels; encoder output is
structurally hand-parsed (marker layout, zigzag DQT order, canonical
DHT validity, restart placement) rather than trusted.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from atlas_upscaling_dask_spark.sources.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)

ONES = (np.ones((8, 8), np.int64), np.ones((8, 8), np.int64))


def test_zigzag_is_the_spec_order():
    # T.81 Figure 5 — first and last few entries of the scan, plus the
    # invariants: a permutation of 0..63 that walks anti-diagonals
    want_head = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[:10]) == want_head
    assert list(ZIGZAG[-3:]) == [55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_golden_hand_built_dc_only_jpeg_decodes_exactly():
    # Hand-assembled single-block grayscale JPEG, no encoder involved:
    # DC quantized value 16, q00 = 16 -> every sample is EXACTLY
    # 16*16/8 + 128 = 160 (iDCT of a constant is constant).  DC Huffman
    # table: one symbol (category 5) coded '0'; AC table: EOB coded
    # '0'.  Bitstream: 0 | 10000 (=16) | 0 pad 1 -> 0x41.
    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = bytes([0x00]) + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    bits1 = bytes([1] + [0] * 15)
    dht_dc = bytes([0x00]) + bits1 + bytes([5])
    dht_ac = bytes([0x10]) + bits1 + bytes([0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    data = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + bytes([0x41])
        + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    assert img.shape == (8, 8) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, np.full((8, 8), 160, np.uint8))


def test_dc_only_blocks_decode_bit_exact_through_the_encoder():
    # A piecewise block-constant image has ONLY a DC coefficient per
    # block; with q00 = 8 the quantized DC is exactly (value - 128),
    # so encode->decode is LOSSLESS for any block-constant image —
    # including negative DC diffs and restart-marker resets.
    q = np.full((8, 8), 8, np.int64)
    vals = np.array([[8, 248], [130, 31]], np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    for ri in (0, 1, 3):
        out = decode_jpeg(encode_jpeg(img, quant_tables=(q, q), restart_interval=ri))
        np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("shape", [(32, 32), (13, 21), (8, 8), (9, 40)])
def test_gray_roundtrip_near_lossless_with_unit_quant(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant_tables=ONES))
    assert out.shape == shape
    # unit quant: error is one rounding step through the float DCT
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("sub", [(1, 1), (2, 1), (2, 2)])
def test_color_roundtrip_smooth_image(sub):
    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    img = np.stack(
        [(xx * 3) % 200 + 20, (yy * 2) % 180 + 30, (xx + yy) % 150 + 50],
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(float) - img).mean() < 3.0


def test_color_444_unit_quant_tight_bound():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant_tables=ONES))
    # YCbCr float conversion both ways costs a few counts, not quality
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_restart_interval_roundtrip_and_marker_placement():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)  # 16 MCUs
    data = encode_jpeg(img, quant_tables=ONES, restart_interval=5)
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    # 16 MCUs at interval 5 -> 4 segments -> 3 RST markers, cycling D0..
    scan = data[data.index(b"\xff\xda") :]
    for i, m in enumerate([0xD0, 0xD1, 0xD2]):
        assert bytes([0xFF, m]) in scan, f"missing RST{i}"
    assert bytes([0xFF, 0xD3]) not in scan


def test_byte_stuffing_appears_and_decodes():
    # drive the entropy stream through 0xFF bytes: high-entropy image,
    # fixed seed chosen so the stuffed pair provably occurs
    rng = np.random.default_rng(11)
    for seed in range(20):
        img = np.random.default_rng(seed).integers(
            0, 256, (40, 40), dtype=np.uint8
        )
        data = encode_jpeg(img, quant_tables=ONES)
        scan = data[data.index(b"\xff\xda") + 2 :]
        if b"\xff\x00" in scan:
            out = decode_jpeg(data)
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
            return
    raise AssertionError("no seed produced a stuffed 0xFF in the scan")


def test_sixteen_bit_dqt_roundtrip():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) + 60
    big = np.full((8, 8), 300, np.int64)
    data = encode_jpeg(img, quant_tables=(big, big))
    # DQT segment advertises Pq=1 (16-bit) and carries 128 table bytes
    i = data.index(b"\xff\xdb")
    (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
    assert ln == 2 + 1 + 128 and data[i + 4] >> 4 == 1
    out = decode_jpeg(data)
    assert out.shape == (8, 8)


def test_encoder_structure_hand_parsed():
    img = np.random.default_rng(5).integers(0, 256, (24, 16), dtype=np.uint8)
    q = np.arange(1, 65, dtype=np.int64).reshape(8, 8)
    data = encode_jpeg(img, quant_tables=(q, q))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # SOF0 carries the true dims
    i = data.index(b"\xff\xc0")
    prec, h, w, ncomp = struct.unpack(">BHHB", data[i + 4 : i + 10])
    assert (prec, h, w, ncomp) == (8, 24, 16, 1)
    # DQT bytes are the table in zigzag order
    i = data.index(b"\xff\xdb")
    got = np.frombuffer(data[i + 5 : i + 5 + 64], np.uint8)
    np.testing.assert_array_equal(got.astype(np.int64), q.reshape(-1)[ZIGZAG])
    # every DHT is canonical: counts sum to symbol count, codes fit
    pos = 0
    n_dht = 0
    while True:
        i = data.find(b"\xff\xc4", pos)
        if i < 0:
            break
        (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
        bits = list(data[i + 5 : i + 21])
        assert ln == 2 + 1 + 16 + sum(bits)
        code = 0
        for length in range(1, 17):
            code += bits[length - 1]
            assert code <= (1 << length) - 1  # all-ones never allocated
            code <<= 1
        n_dht += 1
        pos = i + 2
    assert n_dht == 2  # one DC + one AC table for grayscale


def test_lossless_and_arithmetic_and_12bit_raise():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(encode_jpeg(img, quant_tables=ONES))
    i = data.index(b"\xff\xc0")
    for bad, msg in [(0xC3, "lossless"), (0xC9, "arithmetic")]:
        mutated = bytearray(data)
        mutated[i + 1] = bad
        with pytest.raises(NotImplementedError, match=msg):
            decode_jpeg(bytes(mutated))
    mutated = bytearray(data)
    mutated[i + 4] = 12  # precision byte
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(mutated))
    with pytest.raises(NotImplementedError, match="DAC"):
        dac = data[: i] + bytes([0xFF, 0xCC, 0x00, 0x04, 0x00, 0x00]) + data[i:]
        decode_jpeg(bytes(dac))


def test_non_jpeg_and_truncated_inputs_raise_cleanly():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    img = np.zeros((8, 8), np.uint8)
    data = encode_jpeg(img, quant_tables=ONES)
    with pytest.raises(ValueError):
        decode_jpeg(data[: data.index(b"\xff\xda")])  # no scan at all


def test_analytic_phash_scheme_exact_for_every_pattern():
    # The image_phash_jpeg oracle promise, proven EXHAUSTIVELY: for all
    # 630 (a, b) slot patterns the suite fixture can generate, the
    # JPEG-encoded image decodes to the analytically predicted 63-bit
    # hash.  Amplitudes 24/56 leave ~12 coefficient units of margin —
    # two orders above the measured unit-quant JPEG noise (std ~0.4).
    from atlas_upscaling_dask_spark.extensions.multimodal import (
        _dct_matrix,
        _phash_of,
    )

    m = _dct_matrix(32)
    arr_as = [1, 2, 4, 5, 8, 10, 11, 13, 16, 17]
    for a in arr_as:
        for b in range(63):
            slots = sorted(s for s in range(1, 64) if (s * a + b) % 63 < 32)
            c = np.zeros((32, 32))
            c[0, 0] = 128.0 * 32
            for rank, s in enumerate(slots):
                u, v = divmod(s, 8)
                c[u, v] = 24.0 if rank == 0 else 56.0
            img = m.T @ c @ m
            assert img.min() > 0.5 and img.max() < 254.5  # never clips
            u8 = np.round(img).astype(np.uint8)
            ph = _phash_of(decode_jpeg(encode_jpeg(u8, quant_tables=ONES)), m, 8, 32)
            want = sum(1 << (s - 1) for s in slots) - (1 << (slots[0] - 1))
            assert ph == want, f"pattern a={a} b={b}"


def test_image_phash_jpeg_vs_png_same_image(spark):
    # The SAME pixels through both codecs must land within a couple of
    # Hamming bits (unit-quant JPEG is near-lossless), and a visually
    # different image must land far — JPEG is a first-class member of
    # the fingerprint family, not a special case.
    from atlas_upscaling_dask_spark.extensions.multimodal import image_phash
    from atlas_upscaling_dask_spark.sources.png import encode_png

    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, size=(64, 48), dtype=np.uint8)
    far = 255 - base
    media = spark.createDataFrame(
        [
            (0, bytearray(encode_png(base))),
            (1, bytearray(encode_jpeg(base, quant_tables=ONES))),
            (2, bytearray(encode_jpeg(far, quant_tables=ONES))),
        ],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r["phash"] for r in image_phash(media).collect()}
    assert bin(out[0] ^ out[1]).count("1") <= 4
    assert bin(out[1] ^ out[2]).count("1") >= 40


def test_resize_images_jpeg_payloads(spark):
    # JPEG payloads resize in-format: output decodes as JPEG at the
    # target geometry, pixel content near the direct nearest-neighbor
    # reference (quality-90 re-encode), metadata updated.
    from atlas_upscaling_dask_spark.extensions.multimodal import resize_images

    xx, yy = np.meshgrid(np.arange(24), np.arange(20))
    img = ((xx * 5 + yy * 3) % 200 + 20).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_jpeg(img, quant_tables=ONES)),
          (24, 20, None, None, "jpeg"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,"
        "codec:string>",
    )
    row = resize_images(media, 6, 8).collect()[0]
    got = decode_jpeg(bytes(row["payload"]))
    assert got.shape == (8, 6)
    yi = (np.arange(8) * 20) // 8
    xi = (np.arange(6) * 24) // 6
    want = img[yi][:, xi]
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 6
    assert row["meta"]["width"] == 6 and row["meta"]["height"] == 8


def test_decode_image_jpeg_dispatch():
    from atlas_upscaling_dask_spark.extensions.multimodal import decode_image

    gray = np.full((16, 16), 90, np.uint8)
    out = decode_image(encode_jpeg(gray, quant_tables=ONES))
    assert out.shape == (16, 16, 3)  # gray promoted to RGB like PNG
    assert np.abs(out.astype(int) - 90).max() <= 1
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0] = 200
    out = decode_image(encode_jpeg(rgb, quant_tables=ONES))
    assert out.shape == (8, 8, 3)
    assert np.abs(out[..., 0].astype(int) - 200).max() <= 4
    assert out[..., 1].max() <= 4 and out[..., 2].max() <= 4


def test_parse_jpeg_info_header_only():
    from atlas_upscaling_dask_spark.sources.jpeg import parse_jpeg_info

    img = np.zeros((24, 40, 3), np.uint8)
    data = encode_jpeg(img, quality=80, subsampling=(2, 2))
    info = parse_jpeg_info(data)
    assert info == {
        "width": 40, "height": 24, "n_components": 3,
        "baseline": True, "progressive": False,
    }
    # progressive flag reads straight off the SOF marker id
    mutated = bytearray(data)
    mutated[mutated.index(b"\xff\xc0") + 1] = 0xC2
    info = parse_jpeg_info(bytes(mutated))
    assert info["progressive"] and not info["baseline"]
    # header parse must NOT require a decodable scan: truncate right
    # after SOF and it still answers
    i = data.index(b"\xff\xc4")
    info = parse_jpeg_info(data[:i])
    assert info["width"] == 40
    with pytest.raises(ValueError, match="no SOF"):
        parse_jpeg_info(b"\xff\xd8\xff\xd9")


def test_progressive_decode_identical_to_sequential():
    # Progressive is the SAME quantized coefficients reorganized into
    # spectral-selection + successive-approximation scans, so decode
    # output must be BIT-IDENTICAL to the sequential encoding's —
    # across gray/color, subsampling, odd geometry, and quality
    # extremes (q10 = dense EOB runs, unit quant = dense coefficients).
    rng = np.random.default_rng(0)
    cases = [
        (rng.integers(0, 256, (32, 32), np.uint8), dict(quant_tables=ONES)),
        (rng.integers(0, 256, (13, 21), np.uint8), dict(quant_tables=ONES)),
        (rng.integers(0, 256, (24, 24, 3), np.uint8), dict(quant_tables=ONES)),
        (rng.integers(0, 256, (40, 48, 3), np.uint8),
         dict(quality=90, subsampling=(2, 2))),
        (rng.integers(0, 256, (17, 30, 3), np.uint8),
         dict(quality=75, subsampling=(2, 1))),
        (np.zeros((16, 16), np.uint8), dict(quant_tables=ONES)),
        ((np.add.outer(np.arange(56) * 2, np.arange(64)) % 230).astype(np.uint8),
         dict(quality=10)),
    ]
    for img, kw in cases:
        base = decode_jpeg(encode_jpeg(img, **kw))
        data = encode_jpeg(img, progressive=True, **kw)
        assert data.index(b"\xff\xc2") > 0  # really SOF2
        np.testing.assert_array_equal(decode_jpeg(data), base)


def test_progressive_fuzz_identity():
    # 60 random (shape, quality, subsampling) draws — exercises EOBRUN
    # accumulation, ZRL-with-correction-bit interleaving, newly-nonzero
    # placement, and DC refinement on negative coefficients
    for i in range(60):
        r = np.random.default_rng(i)
        sh = (int(r.integers(8, 70)), int(r.integers(8, 70)))
        if i % 3 == 0:
            sh = sh + (3,)
        img = r.integers(0, 256, sh, np.uint8)
        kw = dict(quality=int(r.integers(5, 100)))
        if i % 4 == 0:
            kw = dict(quant_tables=ONES)
        if len(sh) == 3 and i % 2:
            kw["subsampling"] = (2, 2) if i % 5 else (2, 1)
        base = decode_jpeg(encode_jpeg(img, **kw))
        prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
        np.testing.assert_array_equal(prog, base, err_msg=f"case {i}")


def test_progressive_structure_and_rejections():
    from atlas_upscaling_dask_spark.sources.jpeg import parse_jpeg_info

    img = np.random.default_rng(2).integers(0, 256, (16, 24, 3), np.uint8)
    data = encode_jpeg(img, progressive=True, quality=85)
    info = parse_jpeg_info(data)
    assert info["progressive"] and not info["baseline"]
    # scan plan: 1 interleaved DC + 1 DC refine + (AC first + AC refine)
    # per component = 8 SOS markers
    assert data.count(b"\xff\xda") == 8
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(img, progressive=True, restart_interval=2)
