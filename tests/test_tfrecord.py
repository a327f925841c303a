"""TFRecord framing + tf.train.Example codec (sources/tfrecord.py) —
framing bytes hand-walked, protobuf records hand-assembled (the
decoder is driven by wire bytes this suite builds, not only by the
module's own encoder)."""

from __future__ import annotations

import struct

import pytest

from atlas_upscaling_dask_spark.sources.tfrecord import (
    decode_example,
    encode_example,
    iter_tfrecord_file,
    masked_crc32c,
    write_tfrecord_file,
)


def test_masked_crc_formula():
    """mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 over the
    castagnoli CRC the zarr3 sink already pins to published vectors."""
    from atlas_upscaling_dask_spark.sinks.zarr3 import crc32c

    for blob in (b"", b"a", b"hello world", bytes(range(256))):
        c = crc32c(blob)
        want = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert masked_crc32c(blob) == want


def test_framing_layout_hand_walked(tmp_path):
    p = str(tmp_path / "t.tfrecord")
    payloads = [b"abc", b"", b"\x00" * 10]
    assert write_tfrecord_file(p, payloads) == 3
    data = open(p, "rb").read()
    pos = 0
    for want in payloads:
        (ln,) = struct.unpack_from("<Q", data, pos)
        assert ln == len(want)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert hcrc == masked_crc32c(data[pos : pos + 8])
        assert data[pos + 12 : pos + 12 + ln] == want
        (pcrc,) = struct.unpack_from("<I", data, pos + 12 + ln)
        assert pcrc == masked_crc32c(want)
        pos += 16 + ln
    assert pos == len(data)
    assert list(iter_tfrecord_file(data)) == payloads


def test_framing_corruption_named(tmp_path):
    p = str(tmp_path / "t.tfrecord")
    write_tfrecord_file(p, [b"payload-bytes"])
    data = bytearray(open(p, "rb").read())
    flip = bytearray(data)
    flip[14] ^= 1  # payload byte
    with pytest.raises(ValueError, match="payload crc"):
        list(iter_tfrecord_file(bytes(flip)))
    flip = bytearray(data)
    flip[2] ^= 1  # length field
    with pytest.raises(ValueError, match="length crc|truncated"):
        list(iter_tfrecord_file(bytes(flip)))
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecord_file(bytes(data[:-2])))


def test_gzip_transport_round_trip(tmp_path):
    """TF's GZIP TFRecordOptions layout: ONE gzip member wrapping the
    unchanged framing; reader detects by magic (no extension
    convention), bytes are deterministic (mtime pinned to 0)."""
    import gzip

    p = str(tmp_path / "t.tfrecord")
    payloads = [b"abc", b"", b"\x00" * 10, b"tail"]
    assert write_tfrecord_file(p, payloads, compression="GZIP") == 4
    data = open(p, "rb").read()
    assert data[:2] == b"\x1f\x8b"
    # inner stream is byte-identical to the plain framing
    p2 = str(tmp_path / "plain.tfrecord")
    write_tfrecord_file(p2, payloads)
    assert gzip.decompress(data) == open(p2, "rb").read()
    assert list(iter_tfrecord_file(data)) == payloads
    # determinism: same records -> same bytes
    p3 = str(tmp_path / "t2.tfrecord")
    write_tfrecord_file(p3, payloads, compression="GZIP")
    assert open(p3, "rb").read() == data


def test_gzip_torn_member_named(tmp_path):
    p = str(tmp_path / "t.tfrecord")
    write_tfrecord_file(p, [b"payload-bytes" * 50], compression="GZIP")
    data = open(p, "rb").read()
    with pytest.raises(ValueError, match="torn gzip"):
        list(iter_tfrecord_file(data[: len(data) - 6]))
    # a bit-flip inside the member trips the gzip crc, named the same way
    flip = bytearray(data)
    flip[len(flip) // 2] ^= 1
    with pytest.raises(ValueError, match="torn gzip|crc"):
        list(iter_tfrecord_file(bytes(flip)))


def test_unknown_compression_rejected(tmp_path):
    with pytest.raises(ValueError, match="unsupported TFRecord compression"):
        write_tfrecord_file(str(tmp_path / "x"), [b"a"], compression="SNAPPY")


def test_example_round_trip_types():
    ex = {
        "i": 7,
        "neg": -123456789012345,
        "ints": [1, -1, 0, 2**62],
        "f": 1.5,
        "floats": [0.25, -8.0],
        "s": "héllo",
        "blob": b"\x00\xff\x80",
        "absent": None,
        "flag": True,
    }
    dec = decode_example(encode_example(ex))
    assert dec["i"] == [7]
    assert dec["neg"] == [-123456789012345]
    assert dec["ints"] == [1, -1, 0, 2**62]
    assert dec["f"] == [1.5]
    assert dec["floats"] == [0.25, -8.0]
    assert dec["s"] == ["héllo".encode()]
    assert dec["blob"] == [b"\x00\xff\x80"]
    assert dec["flag"] == [1]
    assert "absent" not in dec


def _entry(name: bytes, feat: bytes) -> bytes:
    """Hand-build a Features map entry {key=1, value=2}."""
    key = b"\x0a" + bytes([len(name)]) + name
    val = b"\x12" + bytes([len(feat)]) + feat
    entry = key + val
    return b"\x0a" + bytes([len(entry)]) + entry


def test_hand_assembled_wire_bytes_decode():
    """Decoder driven by hand-assembled proto bytes: UNPACKED int64s
    (wire 0 repeated), unpacked fixed32 floats (wire 5), and an
    unknown top-level field that must be skipped."""
    # int64_list (field 3) with UNPACKED values 5 and 300
    i64 = b"\x08\x05" + b"\x08" + b"\xac\x02"
    feat_int = b"\x1a" + bytes([len(i64)]) + i64
    # float_list (field 2) with one UNPACKED fixed32 0.5
    f32 = b"\x0d" + struct.pack("<f", 0.5)
    feat_float = b"\x12" + bytes([len(f32)]) + f32
    features = _entry(b"a", feat_int) + _entry(b"b", feat_float)
    example = b"\x0a" + bytes([len(features)]) + features
    # unknown field 9 (varint) prepended at top level: skipped
    example = b"\x48\x2a" + example
    dec = decode_example(example)
    assert dec["a"] == [5, 300]
    assert dec["b"] == [0.5]


def test_packed_int64_negative_is_twos_complement():
    enc = encode_example({"n": [-1]})
    # -1 as a 64-bit two's-complement varint is ten 0xFF-ish bytes
    assert b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01" in enc
    assert decode_example(enc)["n"] == [-1]


def test_spark_export_scan_round_trip(spark, sf_dir, tmp_path):
    from atlas_upscaling_dask_spark.sources.tfrecord import (
        export_tfrecord,
        read_tfrecord,
    )
    from atlas_upscaling_dask_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    path = str(tmp_path / "tfrec")
    export_tfrecord(docs, path)
    rd = read_tfrecord(
        spark, path,
        [("doc_id", "long"), ("text", "string"), ("n_chars", "long")],
    )
    assert rd.count() == docs.count()
    assert rd.exceptAll(docs).isEmpty() and docs.exceptAll(rd).isEmpty()
    with pytest.raises(ValueError, match="no .tfrecord files"):
        read_tfrecord(spark, str(tmp_path / "empty"), [("x", "long")])
    # GZIP transport end-to-end through the same distributed scan
    gz = str(tmp_path / "tfrec_gz")
    export_tfrecord(docs, gz, compression="GZIP")
    rdz = read_tfrecord(
        spark, gz,
        [("doc_id", "long"), ("text", "string"), ("n_chars", "long")],
    )
    assert rdz.exceptAll(docs).isEmpty() and docs.exceptAll(rdz).isEmpty()


def test_example_codec_property_round_trip():
    """Hypothesis: any feature dict of the supported value shapes
    round-trips exactly through the hand-rolled proto codec."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalar = st.one_of(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.binary(max_size=40),
        st.text(max_size=30),
    )
    value = st.one_of(
        scalar,
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            max_size=10,
        ),
        st.lists(st.binary(max_size=20), min_size=1, max_size=5),
    )
    feats = st.dictionaries(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=12,
        ),
        value,
        max_size=6,
    )

    @settings(max_examples=80, deadline=None)
    @given(feats)
    def inner(d):
        dec = decode_example(encode_example(d))
        for name, v in d.items():
            vals = v if isinstance(v, list) else [v]
            want = [
                x.encode("utf-8") if isinstance(x, str) else x
                for x in vals
            ]
            got = dec.get(name, [])
            if want and isinstance(want[0], (bytes, bytearray)):
                assert got == [bytes(w) for w in want]
            else:
                assert got == want

    inner()


def test_zlib_transport_round_trip(tmp_path):
    """TF's ZLIB TFRecordOptions layout: one RFC 1950 stream around
    the unchanged framing, auto-detected on read."""
    import zlib

    p = str(tmp_path / "t.tfrecord")
    payloads = [b"abc", b"", b"\x00" * 10, b"tail"]
    assert write_tfrecord_file(p, payloads, compression="ZLIB") == 4
    data = open(p, "rb").read()
    assert data[0] == 0x78 and (data[0] * 256 + data[1]) % 31 == 0
    p2 = str(tmp_path / "plain.tfrecord")
    write_tfrecord_file(p2, payloads)
    assert zlib.decompress(data) == open(p2, "rb").read()
    assert list(iter_tfrecord_file(data)) == payloads
    with pytest.raises(ValueError, match="torn zlib"):
        list(iter_tfrecord_file(data[:-4]))


def test_plain_record_length_0x178_not_misdetected_as_zlib(tmp_path):
    """A PLAIN file whose first record is 0x178 bytes long starts with
    the bytes ``78 01`` — exactly the most common zlib CMF/FLG pair.
    The framing-crc discriminator must classify it as plain."""
    p = str(tmp_path / "t.tfrecord")
    payloads = [b"z" * 0x178, b"second"]
    write_tfrecord_file(p, payloads)
    data = open(p, "rb").read()
    assert data[0] == 0x78 and data[1] == 0x01  # collides with zlib magic
    assert list(iter_tfrecord_file(data)) == payloads
