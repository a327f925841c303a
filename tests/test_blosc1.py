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


@pytest.mark.parametrize("cname", ["zstd", "zlib"])
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
    assert (flags >> 5) == (4 if cname == "zstd" else 3)


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
    chunk[2] = (chunk[2] & 0x1F) | (1 << 5)  # rewrite codec code to lz4
    with pytest.raises(RuntimeError, match="lz4"):
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
        cname=st.sampled_from(["zlib", "zstd"]),
        blocksize=st.sampled_from([None, 64, 257, 1024]),
    )
    @settings(max_examples=150, deadline=None)
    def test_chunk_roundtrip_property(data, typesize, shuffle, cname, blocksize):
        chunk = blosc_compress(
            data, typesize, cname=cname, shuffle=shuffle, blocksize=blocksize
        )
        assert blosc_decompress(chunk) == data

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
