"""Pure-NumPy c-blosc codec: format compliance and shuffle-transform
fidelity.

The C library is absent here, so the vectorized kernels are checked
against independent SCALAR twins written straight from the published
c-blosc scalar sources (shuffle-generic.c / bitshuffle-generic.c) —
a wrong-but-self-consistent NumPy transform cannot pass both the
round-trip tests and the scalar-equivalence tests.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from atlas_upscaling_dask_spark.sources.blosc1 import (
    BLOSC_BITSHUFFLE,
    BLOSC_NOSHUFFLE,
    BLOSC_SHUFFLE,
    _bit_shuffle,
    _bit_unshuffle,
    _byte_shuffle,
    _byte_unshuffle,
    _lz4_compress_block,
    _lz4_decompress_block,
    _lz4_encode,
    _lz4_raw,
    blosc_compress,
    blosc_decompress,
)


# --- scalar twins (independent re-derivations of the c-blosc scalar code)


def _byte_shuffle_scalar(block: bytes, typesize: int) -> bytes:
    n = len(block) // typesize
    out = bytearray(len(block))
    for i in range(n):
        for j in range(typesize):
            out[j * n + i] = block[i * typesize + j]
    out[n * typesize :] = block[n * typesize :]
    return bytes(out)


def _bit_shuffle_scalar(block: bytes, typesize: int) -> bytes:
    size = (len(block) // typesize) & ~7
    out = bytearray(len(block))
    nrow = size // 8  # bytes per bit-plane
    for j in range(typesize):
        for b in range(8):
            plane = j * 8 + b
            for k in range(nrow):
                byte = 0
                for i in range(8):
                    bit = (block[(k * 8 + i) * typesize + j] >> b) & 1
                    byte |= bit << i
                out[plane * nrow + k] = byte
    out[size * typesize :] = block[size * typesize :]
    return bytes(out)


@pytest.mark.parametrize("typesize", [1, 2, 3, 4, 8])
@pytest.mark.parametrize("n_elems,tail", [(8, 0), (16, 3), (24, 1), (40, 7)])
def test_byte_shuffle_matches_scalar_and_roundtrips(typesize, n_elems, tail):
    rng = np.random.default_rng(typesize * 100 + n_elems + tail)
    block = rng.integers(0, 256, n_elems * typesize + tail, dtype=np.uint8)
    vec = _byte_shuffle(block, typesize)
    assert vec.tobytes() == _byte_shuffle_scalar(block.tobytes(), typesize)
    assert _byte_unshuffle(vec, typesize).tobytes() == block.tobytes()


@pytest.mark.parametrize("typesize", [1, 2, 3, 4, 8])
@pytest.mark.parametrize("n_elems,tail", [(8, 0), (16, 3), (23, 0), (40, 5)])
def test_bit_shuffle_matches_scalar_and_roundtrips(typesize, n_elems, tail):
    # n_elems=23: the non-multiple-of-8 element count exercises the
    # truncate-to-8s + unshuffled-tail path of bitshuffle-generic.c
    rng = np.random.default_rng(typesize * 1000 + n_elems + tail)
    block = rng.integers(0, 256, n_elems * typesize + tail, dtype=np.uint8)
    vec = _bit_shuffle(block, typesize)
    assert vec.tobytes() == _bit_shuffle_scalar(block.tobytes(), typesize)
    assert _bit_unshuffle(vec, typesize).tobytes() == block.tobytes()


def test_bit_shuffle_known_vector():
    # 8 one-byte elements = one 8x8 bit transpose, computable by hand:
    # element i = 1<<i  ==>  plane b has exactly element b's bit set,
    # i.e. output byte b == 1<<b ... transposed: out[b] = sum_i bit_b(elem_i)<<i
    block = np.array([1 << i for i in range(8)], dtype=np.uint8)
    out = _bit_shuffle(block, 1)
    assert out.tolist() == [1 << b for b in range(8)]
    # all-ones elements: every bit-plane byte is 0xFF
    assert _bit_shuffle(np.full(8, 0xFF, np.uint8), 1).tolist() == [0xFF] * 8


@pytest.mark.parametrize("cname", ["zstd", "zlib", "lz4"])
@pytest.mark.parametrize(
    "shuffle", [BLOSC_NOSHUFFLE, BLOSC_SHUFFLE, BLOSC_BITSHUFFLE]
)
@pytest.mark.parametrize("typesize", [1, 4, 8])
def test_chunk_roundtrip_all_modes(cname, shuffle, typesize):
    rng = np.random.default_rng(42)
    # compressible data with a tail that is NOT a whole number of
    # blocks or of 8-element groups
    data = np.repeat(
        rng.integers(0, 50, 5000, dtype=np.uint8), 7
    ).tobytes()[: 5000 * 7 - 13]
    chunk = blosc_compress(
        data, typesize, cname=cname, shuffle=shuffle, blocksize=4096
    )
    assert blosc_decompress(chunk) == data
    # header fields per README_CHUNK_FORMAT.rst
    version, _lz, flags, ts = struct.unpack_from("<BBBB", chunk, 0)
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", chunk, 4)
    assert version == 2 and ts == typesize
    assert nbytes == len(data) and cbytes == len(chunk)
    assert blocksize == 4096
    assert (flags >> 5) == {"zstd": 4, "zlib": 3, "lz4": 1}[cname]
    # header-driven splitting must be advertised exactly as c-blosc's
    # split_block() decides it: lz4 splits (these typesizes/blocksize
    # all satisfy typesize<=16 and blocksize/typesize>=128), zstd/zlib
    # never do and must SET the don't-split bit
    assert bool(flags & 0x10) == (cname != "lz4")


def test_chunk_roundtrip_single_block_and_exact_blocks():
    data = bytes(range(256)) * 32  # 8192 bytes
    for bs in (8192, 2048, None):  # exact multiple + auto
        chunk = blosc_compress(data, 4, blocksize=bs)
        assert blosc_decompress(chunk) == data


def test_incompressible_data_uses_memcpy_mode():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes()
    chunk = blosc_compress(data, 1, cname="zlib", shuffle=BLOSC_NOSHUFFLE)
    flags = chunk[2]
    assert flags & 0x2  # memcpyed
    assert len(chunk) == 16 + len(data)
    assert blosc_decompress(chunk) == data


def test_reference_codec_defaults():
    # the reference pipeline's exact configuration: zstd, clevel 5,
    # BITSHUFFLE, 4-byte labels (upscale_streaming.py:103-108)
    labels = np.arange(20_000, dtype="<u4") % 997
    chunk = blosc_compress(labels.tobytes(), 4)
    assert chunk[2] & 0x4  # bit-shuffle flag
    assert chunk[2] >> 5 == 4  # zstd
    out = np.frombuffer(blosc_decompress(chunk), dtype="<u4")
    np.testing.assert_array_equal(out, labels)
    # bitshuffle + zstd on low-entropy labels must actually compress
    assert len(chunk) < labels.nbytes // 4


def test_unsupported_inner_codec_named():
    data = bytes(100)
    chunk = bytearray(blosc_compress(data, 1, cname="zlib"))
    chunk[2] = (chunk[2] & 0x1F) | (2 << 5)  # rewrite codec code to snappy
    with pytest.raises(RuntimeError, match="snappy"):
        blosc_decompress(bytes(chunk))
    chunk[2] = chunk[2] & 0x1F  # blosclz (code 0)
    with pytest.raises(RuntimeError, match="blosclz"):
        blosc_decompress(bytes(chunk))


def test_truncated_chunk_rejected():
    chunk = blosc_compress(b"x" * 1000, 1)
    with pytest.raises(ValueError, match="truncated|header"):
        blosc_decompress(chunk[:-1])
    with pytest.raises(ValueError, match="header"):
        blosc_decompress(chunk[:10])


def test_malformed_offsets_rejected_cleanly():
    import numpy as np

    chunk = bytearray(blosc_compress(np.zeros(5000, np.uint8).tobytes(), 1))
    # corrupt the first block offset to point past the chunk end
    struct.pack_into("<i", chunk, 16, len(chunk) + 100)
    with pytest.raises(ValueError, match="outside|overrun"):
        blosc_decompress(bytes(chunk))
    # corrupt it to point INSIDE but with a stream size overrunning
    chunk2 = bytearray(blosc_compress(np.zeros(5000, np.uint8).tobytes(), 1))
    struct.pack_into("<i", chunk2, 16, len(chunk2) - 6)
    struct.pack_into("<i", chunk2, len(chunk2) - 6, 10_000)
    with pytest.raises(ValueError, match="overrun"):
        blosc_decompress(bytes(chunk2))


def test_zero_blocksize_header_rejected():
    # a non-memcpy chunk claiming blocksize=0 must raise, not silently
    # return nbytes of uninitialized memory
    chunk = bytearray(blosc_compress(b"a" * 1000, 1, cname="zlib"))
    struct.pack_into("<i", chunk, 8, 0)
    with pytest.raises(ValueError, match="blocksize"):
        blosc_decompress(bytes(chunk))


# --- golden bytes: constants derived BY HAND from the published specs
# (bitshuffle's transform definition; lz4_Block_format.md), so they are
# independent of every implementation in this repo — a plane-order or
# packing regression in the kernels cannot also rewrite these literals.


def test_bit_shuffle_golden_bytes_typesize1():
    # elements e_i = i+1, i = 0..7; plane b's single byte packs bit b of
    # each element LSB-first over i:
    #   bit0 of [1..8] = 1,0,1,0,1,0,1,0 -> 0x55
    #   bit1           = 0,1,1,0,0,1,1,0 -> 0x66
    #   bit2           = 0,0,0,1,1,1,1,0 -> 0x78
    #   bit3           = 0,0,0,0,0,0,0,1 -> 0x80
    block = np.arange(1, 9, dtype=np.uint8)
    assert _bit_shuffle(block, 1).tolist() == [
        0x55, 0x66, 0x78, 0x80, 0, 0, 0, 0,
    ]


def test_bit_shuffle_golden_bytes_typesize2():
    # 8 two-byte elements: byte0 of element i = i+1 (planes 0-7 as in
    # the typesize-1 case), byte1 of element i = 0x80 >> i (bit b set
    # iff i == 7-b, so plane 8+b's byte = 1 << (7-b))
    block = np.zeros(16, dtype=np.uint8)
    block[0::2] = np.arange(1, 9, dtype=np.uint8)
    block[1::2] = (0x80 >> np.arange(8)).astype(np.uint8)
    expect = [0x55, 0x66, 0x78, 0x80, 0, 0, 0, 0] + [
        0x80, 0x40, 0x20, 0x10, 0x08, 0x04, 0x02, 0x01,
    ]
    assert _bit_shuffle(block, 2).tolist() == expect
    assert _bit_unshuffle(np.array(expect, np.uint8), 2).tolist() == block.tolist()


def test_lz4_golden_decode():
    # hand-assembled from lz4_Block_format.md: token 0x44 = 4 literals
    # "abcd" + match len 4+4=8 at offset 4 (overlapping -> the 4-byte
    # pattern repeats), then a final literals-only token 0x50 "WXYZ!"
    comp = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x50]) + b"WXYZ!"
    assert _lz4_decompress_block(comp, 17) == b"abcdabcdabcdWXYZ!"
    # 15-in-token literal-length escape: 15 + 0 = 15 literals
    comp2 = bytes([0xF0, 0x00]) + b"ABCDEFGHIJKLMNO"
    assert _lz4_decompress_block(comp2, 15) == b"ABCDEFGHIJKLMNO"
    # declared size mismatch must raise, not return short data
    with pytest.raises(ValueError, match="expected"):
        _lz4_decompress_block(comp, 18)


def test_lz4_block_roundtrip_shapes():
    rng = np.random.default_rng(11)
    cases = [
        b"x",                                   # below MFLIMIT: literals only
        b"abcabcabcabcabcabcabcabcabc",         # overlapping matches
        b"a" * 5000,                            # long match-length escapes
        rng.integers(0, 256, 4096, np.uint8).tobytes(),   # incompressible
        np.repeat(rng.integers(0, 9, 700, np.uint8), 9).tobytes(),
        bytes(range(256)) * 300,                # >64KB: offsets near the cap
    ]
    for src in cases:
        comp = _lz4_compress_block(src)
        assert _lz4_decompress_block(comp, len(src)) == src


def _cblosc_split_chunk(
    data: bytes, typesize: int, blocksize: int, shuffle: int
) -> bytes:
    """Assemble an lz4 chunk exactly as c-blosc 1.21's writer does when
    ``split_block()`` is true: flags bit 4 CLEAR, every FULL block's
    post-filter bytes split into ``typesize`` equal streams (one byte
    plane each), the final leftover block left as a single stream.
    Built here independently of blosc_compress (which never splits) to
    prove the reader handles the layout the reference's
    ``--compressor lz4`` stores actually have."""
    assert blocksize % typesize == 0 and blocksize // typesize >= 128
    nbytes = len(data)
    flags = (1 << 5)  # lz4, bit4 CLEAR = split
    if shuffle == BLOSC_SHUFFLE and typesize > 1:
        flags |= 0x1
    elif shuffle == BLOSC_BITSHUFFLE:
        flags |= 0x4
    arr = np.frombuffer(data, dtype=np.uint8)
    nblocks = -(-nbytes // blocksize)
    streams = []
    for i in range(nblocks):
        block = arr[i * blocksize : min((i + 1) * blocksize, nbytes)]
        if shuffle == BLOSC_SHUFFLE and typesize > 1:
            filtered = _byte_shuffle(block, typesize).tobytes()
        elif shuffle == BLOSC_BITSHUFFLE:
            filtered = _bit_shuffle(block, typesize).tobytes()
        else:
            filtered = block.tobytes()
        nstreams = typesize if block.size == blocksize else 1
        neblock = block.size // nstreams
        parts = []
        for s in range(nstreams):
            piece = filtered[s * neblock : (s + 1) * neblock]
            # the shared backend-selecting encoder, so the byte-identity
            # assertion against blosc_compress checks the LAYOUT
            # (header, bstarts, stream framing) whichever LZ4 backend
            # is active
            comp = _lz4_encode(piece)
            if len(comp) >= neblock:
                comp = piece  # stored raw: csize == neblock
            parts.append(struct.pack("<i", len(comp)) + comp)
        streams.append(b"".join(parts))
    header_len = 16 + 4 * nblocks
    bstarts, pos = [], header_len
    for s in streams:
        bstarts.append(pos)
        pos += len(s)
    body = struct.pack(f"<{nblocks}i", *bstarts) + b"".join(streams)
    header = struct.pack(
        "<BBBBiii", 2, 1, flags, typesize, nbytes, blocksize, 16 + len(body)
    )
    return header + body


@pytest.mark.parametrize(
    "shuffle", [BLOSC_NOSHUFFLE, BLOSC_SHUFFLE, BLOSC_BITSHUFFLE]
)
@pytest.mark.parametrize("typesize,blocksize", [(4, 2048), (2, 1024), (8, 4096)])
def test_cblosc_split_layout_decodes(shuffle, typesize, blocksize):
    # low-entropy label-ish data: lz4 genuinely compresses the planes,
    # and the trailing partial block exercises the leftover=1-stream rule
    rng = np.random.default_rng(typesize * 10 + shuffle)
    n = blocksize * 2 + 904  # 2 full (split) blocks + leftover
    data = np.repeat(rng.integers(0, 6, n // 8 + 1, np.uint8), 8).tobytes()[:n]
    chunk = _cblosc_split_chunk(data, typesize, blocksize, shuffle)
    assert not chunk[2] & 0x10  # split layout advertised
    assert blosc_decompress(chunk) == data
    # blosc_compress mirrors c-blosc's split_block() for lz4: its output
    # must be byte-identical to this independently assembled layout
    assert (
        blosc_compress(
            data, typesize, cname="lz4", shuffle=shuffle, blocksize=blocksize
        )
        == chunk
    )
    # exact-multiple total: the LAST block is full and therefore split
    n2 = blocksize * 2
    data2 = np.repeat(rng.integers(0, 6, n2 // 8, np.uint8), 8).tobytes()[:n2]
    chunk2 = _cblosc_split_chunk(data2, typesize, blocksize, shuffle)
    assert blosc_decompress(chunk2) == data2


def test_split_flag_with_indivisible_blocksize_rejected():
    # lz4 genuinely splits, so indivisible blocksize is a hard error...
    chunk = bytearray(blosc_compress(b"ab" * 3000, 4, cname="lz4"))
    struct.pack_into("<i", chunk, 8, 1000)  # 1000 % 4 == 0 — keep valid
    chunk[2] &= ~0x10  # claim split...
    chunk[3] = 3  # ...with typesize 3, which cannot divide 1000
    with pytest.raises(ValueError, match="multiple of typesize"):
        blosc_decompress(bytes(chunk))
    # ...but for zlib/zstd (never split by c-blosc) the same shape is
    # routed to the single-stream legacy reading; the corrupted header
    # still fails, just downstream with a block-level error
    zchunk = bytearray(blosc_compress(b"ab" * 3000, 4, cname="zlib"))
    struct.pack_into("<i", zchunk, 8, 1000)
    zchunk[2] &= ~0x10
    zchunk[3] = 3
    with pytest.raises(ValueError):
        blosc_decompress(bytes(zchunk))


# --- hypothesis: arbitrary data/typesize/mode round-trips ---

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        data=st.binary(min_size=1, max_size=5000),
        typesize=st.sampled_from([1, 2, 3, 4, 5, 8, 16]),
        shuffle=st.sampled_from(
            [BLOSC_NOSHUFFLE, BLOSC_SHUFFLE, BLOSC_BITSHUFFLE]
        ),
        cname=st.sampled_from(["zlib", "zstd", "lz4"]),
        blocksize=st.sampled_from([None, 64, 257, 1024]),
    )
    @settings(max_examples=150, deadline=None)
    def test_chunk_roundtrip_property(data, typesize, shuffle, cname, blocksize):
        chunk = blosc_compress(
            data, typesize, cname=cname, shuffle=shuffle, blocksize=blocksize
        )
        assert blosc_decompress(chunk) == data

    @given(data=st.binary(min_size=1, max_size=8000))
    @settings(max_examples=200, deadline=None)
    def test_lz4_block_roundtrip_property(data):
        comp = _lz4_compress_block(data)
        assert _lz4_decompress_block(comp, len(data)) == data

    @given(
        n_elems=st.integers(1, 64),
        tail=st.integers(0, 7),
        typesize=st.sampled_from([1, 2, 3, 4, 8]),
    )
    @settings(max_examples=80, deadline=None)
    def test_shuffles_match_scalar_property(n_elems, tail, typesize):
        rng = np.random.default_rng(n_elems * 31 + tail * 7 + typesize)
        block = rng.integers(0, 256, n_elems * typesize + tail, dtype=np.uint8)
        assert (
            _bit_shuffle(block, typesize).tobytes()
            == _bit_shuffle_scalar(block.tobytes(), typesize)
        )
        assert (
            _byte_shuffle(block, typesize).tobytes()
            == _byte_shuffle_scalar(block.tobytes(), typesize)
        )
except ImportError:  # hypothesis is baked in; guard for portability
    pass


def test_pre_bit4_legacy_chunks_still_decode():
    # Chunks written by this module BEFORE it recorded the don't-split
    # decision in flags bit 4 (zstd/zlib, unsplit, bit 4 clear) — a
    # layout no c-blosc >= 1.14 writer emits — must still decode via
    # the single-stream fallback rather than failing with an opaque
    # decompressor error against existing on-disk stores.
    rng = np.random.default_rng(3)
    for cname, shuffle, ts in (("zstd", 2, 4), ("zlib", 1, 8), ("zstd", 0, 1)):
        data = np.repeat(rng.integers(0, 9, 5000, np.uint8), 7).tobytes()[
            : 5000 * 7 - 11
        ]
        chunk = bytearray(
            blosc_compress(data, ts, cname=cname, shuffle=shuffle, blocksize=4096)
        )
        assert chunk[2] & 0x10
        chunk[2] &= ~0x10  # emulate the pre-bit-4 writer
        assert blosc_decompress(bytes(chunk)) == data


def test_pre_bit4_legacy_chunk_with_indivisible_blocksize_decodes():
    # The legacy layout's blocksize is min(default, nbytes), which need
    # not be a multiple of typesize.  Since no split writer can produce
    # such a chunk (splitting requires divisibility), a bit4-clear
    # zstd/zlib chunk with an indivisible blocksize must go straight to
    # the single-stream reading instead of being rejected up front.
    rng = np.random.default_rng(11)
    data = np.repeat(rng.integers(0, 9, 4000, np.uint8), 6).tobytes()
    for cname, ts in (("zstd", 4), ("zlib", 8)):
        chunk = bytearray(
            blosc_compress(data, ts, cname=cname, shuffle=2, blocksize=4099)
        )
        assert chunk[2] & 0x10
        chunk[2] &= ~0x10  # emulate the pre-bit-4 writer
        assert blosc_decompress(bytes(chunk)) == data
    # lz4 genuinely splits, so the same shape remains a hard error there
    lz4_chunk = bytearray(blosc_compress(data, 4, cname="lz4", blocksize=8192))
    assert not lz4_chunk[2] & 0x10  # lz4 at this shape really splits
    struct_blocksize = int.from_bytes(lz4_chunk[8:12], "little")
    assert struct_blocksize % 4 == 0
    lz4_chunk[8:12] = (4099).to_bytes(4, "little")  # corrupt to indivisible
    with pytest.raises(ValueError, match="not a multiple of typesize"):
        blosc_decompress(bytes(lz4_chunk))


def test_real_cblosc_golden_store_decodes():
    # External-validity gate for the pure-Python Blosc codec: decode a
    # store written by the ACTUAL C library (numcodecs), vendored via
    # tools/make_blosc_golden.py on a machine that has it.  This
    # container has neither network nor the C library, so the test
    # auto-activates only once the fixture is committed — the expected
    # voxels regenerate from the same deterministic formula the
    # generator uses, so no separate truth file is required.
    import os

    fix = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "blosc_golden"
    )
    if not os.path.isdir(fix):
        pytest.skip(
            "real-c-blosc golden fixture not vendored "
            "(generate with tools/make_blosc_golden.py on a machine "
            "with numcodecs)"
        )
    from atlas_upscaling_dask_spark.sinks.ome_zarr import read_zarr_level

    n = 16 * 16 * 16
    flat = (
        np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
    ) % np.uint64(65521)
    expect = flat.astype("<u4").reshape(16, 16, 16)
    for cname in ("zstd", "lz4"):
        root = os.path.join(fix, f"{cname}.zarr")
        assert os.path.isdir(root), f"fixture incomplete: missing {root}"
        got = read_zarr_level(root, 0)
        np.testing.assert_array_equal(got.astype("<u4"), expect)
        # and the raw codec layer agrees chunk-by-chunk
        with open(os.path.join(root, "0", "0.0.0"), "rb") as fh:
            raw = blosc_decompress(fh.read())
        np.testing.assert_array_equal(
            np.frombuffer(raw, dtype="<u4").reshape(8, 8, 8),
            expect[:8, :8, :8],
        )


def test_lz4_backends_cross_decode():
    # The C (pyarrow lz4_raw) and pure-Python LZ4 block codecs must
    # speak the same wire format BOTH directions — that's what makes
    # the fast path a drop-in: a store written with one backend decodes
    # with the other (and on machines without lz4_raw, everything
    # falls back to pure Python transparently).
    codec = _lz4_raw()
    if codec is None:
        pytest.skip("pyarrow lz4_raw not available in this build")
    rng = np.random.default_rng(5)
    cases = [
        b"",
        b"a" * 13,
        b"abcd" * 1000,
        np.repeat(rng.integers(0, 9, 3000, np.uint8), 5).tobytes()[:14999],
        rng.integers(0, 256, 4096, np.uint8).tobytes(),  # incompressible
    ]
    for src in cases:
        if not src:
            continue
        c_bytes = codec.compress(src).to_pybytes()
        assert _lz4_decompress_block(c_bytes, len(src)) == src
        py_bytes = _lz4_compress_block(src)
        assert (
            codec.decompress(py_bytes, decompressed_size=len(src)).to_pybytes()
            == src
        )
    # and a whole chunk written with the active backend round-trips
    data = np.repeat(rng.integers(0, 9, 4000, np.uint8), 6).tobytes()
    chunk = blosc_compress(data, 4, cname="lz4", shuffle=2)
    assert blosc_decompress(chunk) == data
