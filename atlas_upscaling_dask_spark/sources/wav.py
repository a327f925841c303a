"""Pure-NumPy WAV (RIFF PCM) codec — the audio member of the
self-contained media codecs (``sources/png.py`` images,
``sources/tiff.py`` multi-frame/volumes).

Implemented from the public RIFF/WAVE format description: canonical
RIFF chunk walk ('RIFF' + 'WAVE' form, 'fmt ' + 'data' chunks, unknown
chunks skipped), PCM integer samples at 8 bit (unsigned, per spec),
16/24/32 bit (signed little-endian), and IEEE float32/float64
(format tag 3).  Compressed formats (ADPCM, MP3-in-WAV, ...) raise a
clearly-marked error — they need codec libraries this container does
not ship.

Like the other codecs: plain struct + numpy, no Spark dependency, so
the same functions serve fixture writers, tests, and Arrow-batched
decode kernels in ``extensions/multimodal.py``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

#: (format_tag, bits) → numpy dtype; PCM 8-bit is UNSIGNED per spec,
#: wider PCM is signed little-endian, tag 3 is IEEE float.
_SAMPLE_DTYPES = {
    (1, 8): np.dtype("u1"),
    (1, 16): np.dtype("<i2"),
    (1, 32): np.dtype("<i4"),
    (3, 32): np.dtype("<f4"),
    (3, 64): np.dtype("<f8"),
}

_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


@dataclass(frozen=True)
class WavInfo:
    sample_rate: int
    n_channels: int
    bits: int
    format_tag: int
    n_frames: int

    @property
    def duration_s(self) -> float:
        return self.n_frames / self.sample_rate


def _iter_riff_chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file (missing RIFF/WAVE header)")
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) != size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        yield cid, payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def parse_wav_info(data: bytes) -> WavInfo:
    """Header-only census: fmt fields + the data chunk's SIZE (frame
    count arithmetic, no sample decode) — the audio profiling twin of
    the image/video ``parse_*_info`` helpers."""
    fmt = None
    data_size = None
    for cid, payload in _iter_riff_chunks(data):
        if cid == b"fmt " and fmt is None:
            tag, n_ch, rate = struct.unpack("<HHI", payload[:8])
            (bits,) = struct.unpack("<H", payload[14:16])
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data" and data_size is None:
            data_size = len(payload)
        if fmt is not None and data_size is not None:
            break
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_ch, rate, bits = fmt
    frame_bytes = n_ch * (bits // 8)
    if frame_bytes == 0:
        raise ValueError("WAV fmt declares zero-byte frames")
    return WavInfo(rate, n_ch, bits, tag, data_size // frame_bytes)


def decode_wav(data: bytes) -> tuple[np.ndarray, WavInfo]:
    """Decode WAV bytes → ((n_frames, n_channels) sample array, info).

    Integer PCM keeps its native dtype (u1 / i2 / i4); float WAV
    returns f4/f8.  24-bit PCM widens to i4 (<< 8 preserved ordering,
    the canonical unpacking).
    """
    fmt = None
    samples = None
    for cid, payload in _iter_riff_chunks(data):
        if cid == b"fmt ":
            tag, n_ch, rate, _byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if tag == _WAVE_FORMAT_EXTENSIBLE:
                if len(payload) < 26:
                    raise ValueError("malformed WAVE_FORMAT_EXTENSIBLE fmt chunk")
                # the real format is the first 2 bytes of the subformat GUID
                (tag,) = struct.unpack("<H", payload[24:26])
            fmt = (tag, n_ch, rate, block_align, bits)
        elif cid == b"data":
            samples = payload
            if fmt is not None:
                break  # canonical order: fmt before data
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    if samples is None:
        raise ValueError("WAV missing data chunk")
    tag, n_ch, rate, block_align, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError(f"malformed WAV fmt (channels={n_ch}, rate={rate})")
    if tag == 1 and bits == 24:
        raw = np.frombuffer(
            samples[: len(samples) - len(samples) % (3 * n_ch)], dtype=np.uint8
        ).reshape(-1, 3)
        wide = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        wide = (wide << 8) >> 8  # sign-extend 24 → 32
        arr = wide.reshape(-1, n_ch).astype(np.int32)
        bits_out = 24
    else:
        dtype = _SAMPLE_DTYPES.get((tag, bits))
        if dtype is None:
            raise ValueError(
                f"unsupported WAV encoding (format tag {tag}, {bits}-bit): "
                "compressed formats need a media library"
            )
        frame_bytes = dtype.itemsize * n_ch
        usable = len(samples) - len(samples) % frame_bytes
        arr = np.frombuffer(samples[:usable], dtype=dtype).reshape(-1, n_ch)
        bits_out = bits
    info = WavInfo(rate, n_ch, bits_out, tag, arr.shape[0])
    return arr, info


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_frames,) or (n_frames, n_channels) array as WAV.

    dtype picks the format: u1/i2/i4 → integer PCM, f4/f8 → IEEE float.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"expected (frames,) or (frames, channels), got {samples.shape}")
    kind_map = {
        np.dtype("u1"): (1, 8),
        np.dtype("<i2"): (1, 16),
        np.dtype("<i4"): (1, 32),
        np.dtype("<f4"): (3, 32),
        np.dtype("<f8"): (3, 64),
    }
    key = samples.dtype.newbyteorder("<")
    if key not in kind_map:
        raise ValueError(f"cannot encode dtype {samples.dtype}")
    tag, bits = kind_map[key]
    n_frames, n_ch = samples.shape
    block_align = n_ch * bits // 8
    byte_rate = sample_rate * block_align
    data = np.ascontiguousarray(samples, dtype=key).tobytes()
    fmt = struct.pack("<HHIIHH", tag, n_ch, sample_rate, byte_rate, block_align, bits)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    body = chunk(b"fmt ", fmt) + chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
