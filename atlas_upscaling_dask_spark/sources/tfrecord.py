"""TFRecord sink/source + ``tf.train.Example`` codec, pure Python.

TFRecord is the de-facto container a training-data pipeline EXPORTS
to — the handoff format between corpus engineering and the training
stack.  Both halves here are built from the public formats, no
TensorFlow dependency:

* **Framing** (TFRecord file format): per record
  ``[u64le length][masked crc32c(length)][payload]
  [masked crc32c(payload)]`` with the castagnoli CRC the repo already
  implements for Zarr v3 sharding (`sinks/zarr3.crc32c`) and
  TensorFlow's mask ``((crc >> 15 | crc << 17) + 0xa282ead8)``.
  Reads VERIFY both CRCs — a torn or bit-flipped record is a named
  error, not silent garbage.  The GZIP and ZLIB transports
  (``TFRecordOptions(compression_type=...)`` — the whole file is one
  gzip member / zlib stream wrapping the unchanged framing) write via
  ``compression='GZIP'``/``'ZLIB'`` and are auto-detected on read
  (framing-crc discriminator + magic); a torn member is a named
  error.
* **Example protobuf** (proto3 wire format, hand-rolled):
  ``Example{features=1}`` → ``Features{map<string,Feature>=1}`` →
  map entries ``{key=1, value=2}`` → ``Feature`` oneof
  ``bytes_list=1 / float_list=2 / int64_list=3``, each a message of
  repeated field 1 (bytes len-delimited; floats packed 32-bit LE;
  int64 packed varints with two's-complement 64-bit negatives).
  The decoder also accepts UNPACKED repeated scalars (other writers
  emit them) and unknown fields are skipped by wire type, per proto
  semantics.

Fidelity contract: int64 and bytes/str round-trip exactly;
``float_list`` is 32-bit by definition of the message, so float64
columns narrow to float32 on export (documented — the oracle row
round-trips the exact-typed ``documents`` table; embeddings are
float32 end-to-end and stay bit-exact).

Scale shape: export writes ONE file per partition from the executors
(size partitions upstream, the `write_jsonl` policy); the scan
parallelizes over files and streams records — archive bytes never
visit the driver.

Reference parity note: the reference repo has no ML-export surface;
extension scope for the training-data pipeline.
"""

from __future__ import annotations

import os
import struct

__all__ = [
    "masked_crc32c",
    "write_tfrecord_file",
    "iter_tfrecord_file",
    "encode_example",
    "decode_example",
    "export_tfrecord",
    "read_tfrecord",
]

_MASK_DELTA = 0xA282EAD8


def masked_crc32c(data: bytes) -> int:
    from ..sinks.zarr3 import crc32c

    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# framing


def write_tfrecord_file(path: str, payloads, compression: str | None = None) -> int:
    """Write an iterable of serialized records; returns the count.

    ``compression='GZIP'`` / ``'ZLIB'`` wrap the WHOLE file in one
    gzip member / RFC 1950 zlib stream — TensorFlow's
    ``TFRecordOptions(compression_type=...)`` layouts (the record
    framing inside is unchanged; the compression is a transport
    around the stream, not per-record).  For GZIP, ``mtime=0`` and an
    empty FNAME pin the header so identical record streams produce
    identical bytes regardless of path or wall clock (zlib has no
    such header variance)."""
    import gzip

    n = 0
    if compression not in (None, "", "GZIP", "ZLIB"):
        raise ValueError(
            f"unsupported TFRecord compression {compression!r} "
            "(supported: None, 'GZIP', 'ZLIB')"
        )
    raw = open(path, "wb")
    if compression == "GZIP":
        fh = gzip.GzipFile(filename="", fileobj=raw, mode="wb", mtime=0)
    elif compression == "ZLIB":
        fh = _ZlibWriter(raw)
    else:
        fh = raw
    try:
        for payload in payloads:
            header = struct.pack("<Q", len(payload))
            fh.write(header)
            fh.write(struct.pack("<I", masked_crc32c(header)))
            fh.write(payload)
            fh.write(struct.pack("<I", masked_crc32c(payload)))
            n += 1
    finally:
        if fh is not raw:
            fh.close()
        raw.close()
    return n


class _ZlibWriter:
    """Streaming RFC 1950 writer over a file object (TF's ZLIB
    TFRecord transport)."""

    def __init__(self, raw):
        import zlib

        self._raw = raw
        self._co = zlib.compressobj(6)

    def write(self, data: bytes) -> None:
        out = self._co.compress(data)
        if out:
            self._raw.write(out)

    def close(self) -> None:
        self._raw.write(self._co.flush())


def iter_tfrecord_file(data: bytes):
    """Yield record payloads, verifying BOTH crcs (§framing above).

    GZIP / ZLIB compressed files (TF's ``TFRecordOptions`` transports)
    are auto-detected — no extension convention required.  The
    discriminator is the framing itself, not just magic bytes: a
    plain file's first 12 bytes carry a valid masked length-crc, so
    "crc holds" means plain framing with certainty 1-2^-32, and only
    then do the gzip magic / zlib CMF+FLG pair decide the transport
    (a zlib stream CAN collide with a plain header — a record of
    length 0x178 starts ``78 01`` — which bare magic sniffing would
    misread).  A torn or truncated member is a named error before any
    record parses."""
    plain_framing = len(data) >= 12 and struct.unpack(
        "<I", data[8:12]
    )[0] == masked_crc32c(data[:8])
    if not plain_framing and data[:2] == b"\x1f\x8b":
        import gzip
        import zlib

        try:
            data = gzip.decompress(data)
        except (EOFError, zlib.error, OSError) as exc:
            raise ValueError(f"torn gzip TFRecord member: {exc}")
    elif (
        not plain_framing
        and len(data) >= 2
        and data[0] == 0x78
        and (data[0] * 256 + data[1]) % 31 == 0
    ):
        import zlib

        try:
            data = zlib.decompress(data)
        except zlib.error as exc:
            raise ValueError(f"torn zlib TFRecord member: {exc}")
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated TFRecord header")
        header = data[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        if hcrc != masked_crc32c(header):
            raise ValueError(f"TFRecord length crc mismatch at {pos}")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError("truncated TFRecord payload")
        payload = data[pos : pos + length]
        (pcrc,) = struct.unpack("<I", data[pos + length : pos + length + 4])
        if pcrc != masked_crc32c(payload):
            raise ValueError(f"TFRecord payload crc mismatch at {pos}")
        pos += length + 4
        yield payload


# ---------------------------------------------------------------------------
# protobuf wire primitives


def _varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 64-bit
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


# ---------------------------------------------------------------------------
# tf.train.Example


def encode_example(features: dict) -> bytes:
    """dict of name -> value into a serialized Example.  Values:
    int / list[int] -> int64_list; float / list[float] -> float_list
    (32-bit); str / bytes / list thereof -> bytes_list.  None skips
    the key (absent feature, the protobuf convention)."""
    entries = []
    for name in sorted(features):
        value = features[name]
        if value is None:
            continue
        vals = value if isinstance(value, (list, tuple)) else [value]
        if all(isinstance(v, bool) for v in vals):
            vals = [int(v) for v in vals]
        if all(isinstance(v, int) for v in vals):
            body = b"".join(_varint(int(v)) for v in vals)
            feat = _len_delim(3, _len_delim(1, body))
        elif all(isinstance(v, float) for v in vals):
            body = struct.pack(f"<{len(vals)}f", *vals)
            feat = _len_delim(2, _len_delim(1, body))
        else:
            blobs = [
                v.encode("utf-8") if isinstance(v, str) else bytes(v)
                for v in vals
            ]
            body = b"".join(_len_delim(1, b) for b in blobs)
            feat = _len_delim(1, body)
        # feat is the Feature message body (the oneof member with its
        # own field tag); the map entry wraps {key=1, value=2}
        entries.append(
            _len_delim(
                1,
                _len_delim(1, name.encode("utf-8")) + _len_delim(2, feat),
            )
        )
    return _len_delim(1, b"".join(entries))


def _skip_field(data: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(data, pos)
        return pos
    if wire == 1:
        return pos + 8
    if wire == 2:
        ln, pos = _read_varint(data, pos)
        return pos + ln
    if wire == 5:
        return pos + 4
    raise ValueError(f"unsupported protobuf wire type {wire}")


def _iter_fields(data: bytes):
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln, pos = _read_varint(data, pos)
            yield field, wire, data[pos : pos + ln]
            pos += ln
        elif wire == 0:
            v, pos = _read_varint(data, pos)
            yield field, wire, v
        else:
            start = pos
            pos = _skip_field(data, pos, wire)
            yield field, wire, data[start:pos]


def _decode_feature(data: bytes):
    for field, wire, body in _iter_fields(data):
        if field == 1 and wire == 2:  # bytes_list
            return [
                b for f, w, b in _iter_fields(body) if f == 1 and w == 2
            ]
        if field == 2 and wire == 2:  # float_list
            floats: list[float] = []
            for f, w, b in _iter_fields(body):
                if f == 1 and w == 2:  # packed
                    floats.extend(
                        struct.unpack(f"<{len(b) // 4}f", b[: len(b) // 4 * 4])
                    )
                elif f == 1 and w == 5:  # unpacked fixed32
                    floats.append(struct.unpack("<f", b[:4])[0])
            return floats
        if field == 3 and wire == 2:  # int64_list
            ints: list[int] = []
            for f, w, b in _iter_fields(body):
                if f == 1 and w == 2:  # packed varints
                    p = 0
                    while p < len(b):
                        v, p = _read_varint(b, p)
                        ints.append(_signed64(v))
                elif f == 1 and w == 0:  # unpacked
                    ints.append(_signed64(b))
            return ints
    return []


def decode_example(data: bytes) -> dict:
    """Serialized Example -> {name: list-of-values} (bytes values stay
    bytes; the caller owns utf-8 decisions)."""
    out: dict = {}
    for field, wire, body in _iter_fields(data):
        if field != 1 or wire != 2:
            continue  # unknown top-level field: skipped
        for f2, w2, entry in _iter_fields(body):
            if f2 != 1 or w2 != 2:
                continue
            name = None
            feat_vals: list = []
            for f3, w3, b3 in _iter_fields(entry):
                if f3 == 1 and w3 == 2:
                    name = b3.decode("utf-8")
                elif f3 == 2 and w3 == 2:
                    feat_vals = _decode_feature(b3)
            if name is not None:
                out[name] = feat_vals
    return out


# ---------------------------------------------------------------------------
# Spark-level export / scan


def export_tfrecord(df, path: str, compression: str | None = None) -> None:
    """Write a frame as TFRecord Examples, one file per partition,
    executor-side (rows never visit the driver).  Column typing:
    integral -> int64_list, floating/array<float> -> float_list,
    string -> utf-8 bytes_list, binary -> bytes_list,
    array<integral> -> int64_list.  ``compression='GZIP'``/``'ZLIB'``
    writes TF-style whole-file compressed members (readers
    auto-detect).

    ``path`` must be visible to every executor (shared filesystem /
    mount) — the writers use plain file IO, like the zarr sinks; on a
    multi-node cluster point it at the shared store, and size
    partitions upstream (the `write_jsonl` policy)."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    cols = list(df.columns)

    def kernel(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.tfrecord")
        count = 0

        def payloads():
            nonlocal count
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    feats = {}
                    for name, value in zip(cols, row):
                        if value is None:
                            feats[name] = None
                        elif isinstance(value, (list, tuple)):
                            feats[name] = [
                                float(v) if isinstance(v, float) else v
                                for v in value
                            ]
                        elif isinstance(value, (bytes, bytearray, str)):
                            feats[name] = value
                        elif hasattr(value, "tolist"):
                            # numpy scalar OR array: tolist() yields
                            # the python value/list either way
                            feats[name] = value.tolist()
                        elif pd.isna(value):
                            feats[name] = None
                        elif isinstance(value, float):
                            feats[name] = float(value)
                        else:
                            feats[name] = int(value)
                    count += 1
                    yield encode_example(feats)

        write_tfrecord_file(fname, payloads(), compression=compression)
        yield pd.DataFrame({"path": [fname], "n": [count]})

    df.mapInPandas(kernel, schema="path string, n long").write.format(
        "noop"
    ).mode("overwrite").save()


def read_tfrecord(spark, path: str, fields: list):
    """Distributed TFRecord scan.  ``fields``: list of
    ``(name, kind)`` with kind in {'long','double','string','binary',
    'float_array','long_array'}; scalar kinds take the list's first
    element (NULL when the feature is absent or empty)."""
    import pandas as pd

    files = sorted(
        os.path.join(path, f)
        for f in (os.listdir(path) if os.path.isdir(path) else [])
        if f.endswith(".tfrecord")
    )
    if not files:
        raise ValueError(f"no .tfrecord files under {path}")
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), 32), "path")
    spark_types = {
        "long": "long",
        "double": "double",
        "string": "string",
        "binary": "binary",
        "float_array": "array<float>",
        "long_array": "array<long>",
    }
    schema = ", ".join(f"{n} {spark_types[k]}" for n, k in fields)

    def kernel(batches):
        for pdf in batches:
            for fp in pdf["path"]:
                with open(fp, "rb") as fh:
                    data = fh.read()
                rows: dict = {n: [] for n, _ in fields}
                for payload in iter_tfrecord_file(data):
                    ex = decode_example(payload)
                    for name, kind in fields:
                        vals = ex.get(name, [])
                        if kind == "long":
                            rows[name].append(
                                int(vals[0]) if vals else None
                            )
                        elif kind == "double":
                            rows[name].append(
                                float(vals[0]) if vals else None
                            )
                        elif kind == "string":
                            rows[name].append(
                                vals[0].decode("utf-8") if vals else None
                            )
                        elif kind == "binary":
                            rows[name].append(
                                bytes(vals[0]) if vals else None
                            )
                        elif kind == "float_array":
                            rows[name].append(
                                [float(v) for v in vals]
                            )
                        else:
                            rows[name].append([int(v) for v in vals])
                yield pd.DataFrame(rows)

    return paths_df.mapInPandas(kernel, schema=schema)
