"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride as ``binary`` columns plus a metadata struct —
exactly the chunk-packed volume model (volume.py) generalized: the
engine moves/filters/joins fixed-width references and hashes, and only
decodes inside Arrow-batched Python when a kernel truly needs pixels.

Decode is REAL for the formats a self-contained engine can cover:
PNG via the pure-NumPy codec in ``sources/png.py``, baseline AND
progressive JPEG via the from-spec Huffman+iDCT codec in
``sources/jpeg.py`` (the dominant crawl image formats), and
multi-frame containers via multi-page TIFF (``sources/tiff.py`` —
pages are frames, range-decoded per sampled frame).  Entropy-coded
VIDEO (mp4/mkv) and arithmetic-coded/lossless JPEG raise a
clearly-marked ``NotImplementedError`` — they need codec libraries
this container
does not ship; ``fake=True`` keeps deterministic pseudo-decodes for
format-independent plumbing tests.  All Spark-side plumbing (schema,
batch shape, ``mapInPandas`` signature, partition behavior) is
identical between the real and fake paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: the text
    bytes stand in for an encoded payload (deterministic, testable)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("fake/raw").alias("codec"),
        ).alias("meta"),
    )


def payload_digest(media: DataFrame) -> DataFrame:
    """Binary-column plumbing that needs no decode: byte length + sha256.

    Pure built-ins — the pattern for content-addressing 100 TB of media
    (dedup by digest groupBy, never by payload compare).
    """
    return media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 uint8 array.

    PNG payloads decode for real via the pure-NumPy codec in
    ``sources/png.py`` (stdlib zlib inflate + unfilter — no imaging
    library needed), baseline JPEG via ``sources/jpeg.py`` (from-spec
    Huffman + iDCT), GIF via ``sources/gif.py`` (from-spec LZW; the
    first composited frame), WebP via ``sources/webp.py`` — lossless
    VP8L from spec, and since round 11 lossy VP8 intra keyframes (with
    or without an ALPH alpha chunk) via the RFC 6386 decoder in
    ``sources/vp8.py``; TIFF is covered by ``sources/tiff.py``
    upstream.
    ``fake=True`` keeps the deterministic pseudo-image used by plumbing
    tests that need byte-derived fixtures regardless of format.
    """
    if fake:
        h = w = 8
        buf = np.frombuffer(payload, dtype=np.uint8)
        reps = int(np.ceil(h * w * 3 / max(len(buf), 1)))
        return np.tile(buf, reps)[: h * w * 3].reshape(h, w, 3)
    from ..sources.png import PNG_SIGNATURE, decode_png, to_rgb

    if payload[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        return to_rgb(decode_png(bytes(payload)))
    if payload[:2] == b"\xff\xd8":  # baseline JPEG
        from ..sources.jpeg import decode_jpeg

        img = decode_jpeg(bytes(payload))
        return img if img.ndim == 3 else to_rgb(img[:, :, None])
    if payload[:2] in (b"II", b"MM"):  # TIFF image payload: first page
        from ..sources.tiff import decode_tiff_page

        plane = decode_tiff_page(bytes(payload), 0)
        if plane.dtype not in (np.uint8, np.uint16):
            raise ValueError(
                f"TIFF image payloads decode at 8/16-bit, got {plane.dtype}"
            )
        # to_rgb owns the 16-bit -> high-byte policy (same as PNG)
        return to_rgb(plane[:, :, None])
    from ..sources.gif import GIF_SIGNATURES, decode_gif

    if payload[:6] in GIF_SIGNATURES:  # GIF: first composited frame
        return decode_gif(bytes(payload), frame=0)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from ..sources.webp import decode_webp

        return decode_webp(bytes(payload))  # VP8L or VP8 keyframe
    raise ValueError(
        "unsupported image format (PNG, baseline JPEG, uncompressed "
        "TIFF, GIF and lossless WebP are the built-in codecs; other "
        "formats need an imaging library)"
    )


def media_info(payload: bytes) -> dict:
    """Magic-byte dispatch to the per-format header-only census
    (``parse_*_info`` across PNG/JPEG/GIF/TIFF/AVI/MP4/WAV), unified
    to one schema — the profiling pass a MIXED-format media corpus
    runs before any decode decision.  All header work, zero entropy
    decode for every format."""
    p = bytes(payload)
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        from ..sources.png import parse_png_info

        i = parse_png_info(p)
        return {"format": "png", "width": i["width"], "height": i["height"],
                "n_frames": 1, "sample_rate": None}
    if p[:2] == b"\xff\xd8":
        from ..sources.jpeg import parse_jpeg_info

        i = parse_jpeg_info(p)
        return {"format": "jpeg", "width": i["width"], "height": i["height"],
                "n_frames": 1, "sample_rate": None}
    if p[:6] in (b"GIF87a", b"GIF89a"):
        from ..sources.gif import parse_gif_info

        i = parse_gif_info(p)
        return {"format": "gif", "width": i["width"], "height": i["height"],
                "n_frames": i["n_frames"], "sample_rate": None}
    if p[:2] in (b"II", b"MM"):
        from ..sources.tiff import parse_tiff_bytes

        i = parse_tiff_bytes(p)
        pg = i.pages[0]
        return {"format": "tiff", "width": pg.width, "height": pg.height,
                "n_frames": len(i.pages), "sample_rate": None}
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        from ..sources.webp import parse_webp_info

        i = parse_webp_info(p)
        return {"format": "webp", "width": i["width"], "height": i["height"],
                "n_frames": i["n_frames"], "sample_rate": None}
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        from ..sources.avi import parse_avi_info

        i = parse_avi_info(p)
        return {"format": "avi", "width": i["width"], "height": i["height"],
                "n_frames": i["n_frames"], "sample_rate": None}
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        from ..sources.wav import parse_wav_info

        i = parse_wav_info(p)
        return {"format": "wav", "width": None, "height": None,
                "n_frames": i.n_frames, "sample_rate": i.sample_rate}
    if len(p) >= 12 and p[4:8] == b"ftyp":
        from ..sources.mp4 import parse_mp4_info

        i = parse_mp4_info(p)
        return {"format": "mp4", "width": i["width"], "height": i["height"],
                "n_frames": i["n_video_samples"],
                "sample_rate": i["sample_rate"]}
    if p[:5] == b"%PDF-":
        from ..sources.pdf import parse_pdf_info

        i = parse_pdf_info(p)
        # the unified schema has no doc-specific fields: pages map to
        # n_frames (the per-format census keeps the rest)
        return {"format": "pdf", "width": None, "height": None,
                "n_frames": i["n_pages"], "sample_rate": None}
    raise ValueError(
        "media_info: unrecognized payload (PNG/JPEG/GIF/WEBP/TIFF/AVI/"
        "WAV/MP4/PDF are the built-in formats)"
    )


def media_census(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched mixed-corpus census: one row per payload with the
    unified ``media_info`` fields.  One narrow pass — payloads never
    leave the executor and no format is entropy-decoded."""
    import pandas as pd

    id_type = media.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "format": [], "width": [], "height": [],
                "n_frames": [], "sample_rate": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                info = media_info(bytes(payload))
                rows["media_id"].append(mid)
                rows["format"].append(info["format"])
                rows["width"].append(info["width"])
                rows["height"].append(info["height"])
                rows["n_frames"].append(info["n_frames"])
                rows["sample_rate"].append(info["sample_rate"])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(rows["media_id"], dtype=pdf[id_col].dtype),
                    "format": rows["format"],
                    "width": pd.array(rows["width"], dtype="Int32"),
                    "height": pd.array(rows["height"], dtype="Int32"),
                    "n_frames": pd.array(rows["n_frames"], dtype="Int64"),
                    "sample_rate": pd.array(rows["sample_rate"], dtype="Int32"),
                }
            )

    return media.mapInPandas(
        kernel,
        schema=f"{id_col} {id_type}, format string, width int, height int, "
        "n_frames long, sample_rate int",
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` — each batch decodes locally and emits a compact
    feature row; the payload never leaves the executor.  Feature here is
    the per-channel mean of the (fake-)decoded image — replace
    ``decode_image`` with a real codec for production.
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                digests.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                img = decode_image(raw, fake=fake)
                feats.append(img.reshape(-1, 3).mean(axis=0).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "sha256": digests,
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize: decode PNG/JPEG payloads, nearest-neighbor
    sample to (height, width), re-encode IN THE SAME FORMAT, update
    metadata — an Arrow-batched narrow pass; payloads never leave the
    executor.

    Nearest-neighbor (not bilinear) is the deliberate choice for the
    same reason the volume upscaler never interpolates (SURVEY §2.3):
    categorical/label rasters must keep exact values.  JPEG re-encode
    is quality-90 baseline (the usual thumbnail trade); other payload
    formats raise the codec's documented error.
    """
    if width < 1 or height < 1:
        raise ValueError("width/height must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.gif import GIF_SIGNATURES, decode_gif, encode_gif
        from ..sources.jpeg import decode_jpeg, encode_jpeg
        from ..sources.png import PNG_SIGNATURE, decode_png, encode_png

        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                data = bytes(payload)
                kind = "jpeg" if data[:2] == b"\xff\xd8" else None
                if kind == "jpeg":
                    img = decode_jpeg(data)
                elif data[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
                    kind = "png"
                    img = decode_png(data)
                elif data[:6] in GIF_SIGNATURES:
                    # first composited frame; nearest-neighbor keeps the
                    # exact palette colors, so re-encode cannot overflow
                    kind = "gif"
                    img = decode_gif(data, frame=0)
                else:
                    raise ValueError(
                        "resize_images: PNG, baseline JPEG or GIF payload "
                        "required"
                    )
                h, w = img.shape[:2]
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                small = img[yi][:, xi]
                if kind == "jpeg":
                    out_payloads.append(encode_jpeg(small))
                elif kind == "gif":
                    out_payloads.append(encode_gif(small))
                else:
                    out_payloads.append(encode_png(small))
            pdf = pdf.copy()
            pdf["payload"] = out_payloads
            yield pdf

    # images only, like the frame/audio kernels — a mixed media frame
    # must not feed WAV/TIFF payloads to the PNG decoder
    imgs = media.filter(F.col("media_type") == "image")
    resized = imgs.mapInPandas(kernel, schema=imgs.schema)
    return resized.withColumn(
        "meta",
        F.col("meta").withField("width", F.lit(width)).withField(
            "height", F.lit(height)
        ),
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
    ]
)


def _samples_to_unit(arr: np.ndarray, bits: int, tag: int) -> np.ndarray:
    """Normalize decoded WAV samples to float64 in [-1, 1]."""
    if tag == 3:  # IEEE float
        return arr.astype(np.float64)
    if bits == 8:  # unsigned per spec
        return (arr.astype(np.float64) - 128.0) / 128.0
    return arr.astype(np.float64) / float(1 << (bits - 1))


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over WAV payloads (the pure-NumPy
    RIFF/PCM codec in ``sources/wav.py``): per-clip sample rate,
    duration, RMS energy, peak amplitude, and zero-crossing rate of the
    channel-mean signal — the standard cheap screens a speech/audio
    data pipeline filters on (silence, clipping, wrong-rate clips)
    before any expensive model runs.

    Narrow Arrow-batched pass; compressed audio raises the codec's
    documented error.
    """
    from ..sources.wav import decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_frames",
                "duration_s", "rms", "peak", "zero_crossing_rate",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr, info = decode_wav(bytes(payload))
                mono = _samples_to_unit(arr, info.bits, info.format_tag).mean(axis=1)
                n = len(mono)
                rows["media_id"].append(mid)
                rows["sample_rate"].append(info.sample_rate)
                rows["n_channels"].append(info.n_channels)
                rows["n_frames"].append(info.n_frames)
                rows["duration_s"].append(info.duration_s)
                rows["rms"].append(float(np.sqrt(np.mean(mono**2))) if n else 0.0)
                rows["peak"].append(float(np.abs(mono).max()) if n else 0.0)
                rows["zero_crossing_rate"].append(
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1
                    else 0.0
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "sample_rate": pd.Series(rows["sample_rate"], dtype="int32"),
                    "n_channels": pd.Series(rows["n_channels"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int64"),
                    "duration_s": pd.Series(rows["duration_s"], dtype="float64"),
                    "rms": pd.Series(rows["rms"], dtype="float64"),
                    "peak": pd.Series(rows["peak"], dtype="float64"),
                    "zero_crossing_rate": pd.Series(
                        rows["zero_crossing_rate"], dtype="float64"
                    ),
                }
            )

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        kernel, schema=AUDIO_FEATURE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)


def sample_frame_indices(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling PLAN: (media_id, frame_idx) for every ``every_n``-th
    frame, generated purely from metadata (``meta.n_frames``) — no decode,
    no Python.  At 100 TB this is the step that decides which tiny
    fraction of video bytes the decode kernel must touch; it runs as a
    narrow JVM-side sequence-explode and can be joined/filtered/pruned
    like any other frame before the expensive kernel sees a payload."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    vids = media.filter(
        (F.col("media_type") == "video") & F.col("meta.n_frames").isNotNull()
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    ).select("media_id", F.col("frame_idx").cast("int").alias("frame_idx"))


def extract_frames(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Arrow-batched sampled-frame extraction: decode only the planned
    frames, emit per-frame digests.  Payloads never leave the executor.

    The REAL decode path (``fake=False``) handles the built-in
    multi-frame containers: multi-page TIFF (pages are frames, parsed
    and range-decoded by ``sources/tiff.py`` — the IFD chain is walked
    once per payload and only the sampled pages are decoded, so a
    1%-sample of a long clip reads ~1% of the pixel bytes) and animated
    GIF (``sources/gif.py``; GIF frames composite onto their
    predecessors, so decode is sequential up to the last sampled index
    — the digest covers the COMPOSITED RGB canvas, which is what a
    viewer shows).  The frame count comes from the container itself;
    ``meta.n_frames`` is advice.  Other containers (mp4/mkv/...) still
    raise — entropy-coded video needs a media library this container
    does not ship.

    ``fake=True`` keeps the deterministic byte-slice pseudo-decode for
    plumbing tests that need format-independent fixtures (it requires
    ``meta.n_frames``, since no container is parsed)."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.avi import parse_avi, read_avi_frame, require_mjpeg
        from ..sources.gif import GIF_SIGNATURES, iter_composited, parse_gif
        from ..sources.jpeg import decode_jpeg
        from ..sources.tiff import decode_tiff_page, parse_tiff_bytes

        for pdf in batches:
            ids, idxs, sizes, digests = [], [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                raw = bytes(payload)
                if not fake:
                    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                        # MJPEG AVI: idx1-indexed random access — only
                        # the sampled frames' JPEG bytes are decoded
                        ainfo = parse_avi(raw)
                        require_mjpeg(ainfo)
                        for i in range(0, len(ainfo.frames), every_n):
                            frame = decode_jpeg(read_avi_frame(raw, ainfo, i))
                            fb = frame.tobytes()
                            ids.append(mid)
                            idxs.append(i)
                            sizes.append(len(fb))
                            digests.append(hashlib.sha256(fb).hexdigest())
                        continue
                    if raw[:6] in GIF_SIGNATURES:
                        info = parse_gif(raw)
                        wanted = range(0, len(info.frames), every_n)
                        last = max(wanted, default=-1)
                        for i, canvas in iter_composited(raw, info, upto=last):
                            if i % every_n:
                                continue
                            fb = canvas.tobytes()
                            ids.append(mid)
                            idxs.append(i)
                            sizes.append(len(fb))
                            digests.append(hashlib.sha256(fb).hexdigest())
                        continue
                    if raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
                        # animated WebP: VP8L frames composite like GIF
                        # (blend/dispose per ANMF); digests cover the
                        # composited RGB canvas for GIF parity
                        from ..sources.webp import (
                            iter_webp_composited,
                            parse_webp_frames,
                        )

                        _, wframes = parse_webp_frames(raw)
                        wanted = range(0, len(wframes), every_n)
                        last = max(wanted, default=-1)
                        for i, canvas in iter_webp_composited(raw, upto=last):
                            if i % every_n:
                                continue
                            fb = canvas[:, :, :3].tobytes()
                            ids.append(mid)
                            idxs.append(i)
                            sizes.append(len(fb))
                            digests.append(hashlib.sha256(fb).hexdigest())
                        continue
                    if raw[:2] not in (b"II", b"MM"):
                        raise NotImplementedError(
                            "entropy-coded video containers (mp4/mkv/...) "
                            "require a media library; multi-page TIFF, "
                            "animated GIF, animated (VP8L) WebP and MJPEG "
                            "AVI are the built-in multi-frame containers"
                        )
                    info = parse_tiff_bytes(raw)
                    for i in range(0, len(info.pages), every_n):
                        frame = decode_tiff_page(raw, i, info)
                        fb = frame.tobytes()
                        ids.append(mid)
                        idxs.append(i)
                        sizes.append(len(fb))
                        digests.append(hashlib.sha256(fb).hexdigest())
                    continue
                n = meta.get("n_frames") if isinstance(meta, dict) else meta["n_frames"]
                if n is None:
                    continue
                for i in range(0, int(n), every_n):
                    # FAKE decode: deterministic per-frame byte slice
                    frame = raw[i % max(len(raw), 1):] + raw[: i % max(len(raw), 1)]
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(frame))
                    digests.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "sha256": pd.Series(digests, dtype="object"),
                }
            )

    vids = media.filter(F.col("media_type") == "video")
    if fake:
        vids = vids.filter(F.col("meta.n_frames").isNotNull())
    return vids.mapInPandas(kernel, schema=FRAME_SCHEMA)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: D = M·X·Mᵀ is the 2-D transform."""
    x = 2 * np.arange(n) + 1
    u = np.arange(n)[:, None]
    m = np.cos(np.pi * u * x[None, :] / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def _box_resize(img: np.ndarray, size: int) -> np.ndarray:
    """Deterministic resize of a 2-D float array to ``size×size``:
    box-mean when an axis shrinks (floor-partitioned blocks via
    ``add.reduceat``), floor-index replication when it grows (an icon
    smaller than the working grid must not crash the job) — no
    interpolation library, identical on every platform."""
    h, w = img.shape
    if h < size:  # upsample rows by index replication, then fall through
        img = img[(np.arange(size) * h) // size]
        h = size
    if w < size:
        img = img[:, (np.arange(size) * w) // size]
        w = size
    if h == size and w == size:
        return img
    ri = (np.arange(h) * size) // h
    ci = (np.arange(w) * size) // w
    rstart = np.searchsorted(ri, np.arange(size))
    cstart = np.searchsorted(ci, np.arange(size))
    sums = np.add.reduceat(np.add.reduceat(img, rstart, axis=0), cstart, axis=1)
    rcnt = np.diff(np.append(rstart, h))
    ccnt = np.diff(np.append(cstart, w))
    return sums / np.outer(rcnt, ccnt)


def image_phash(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_size: int = 8,
    work_size: int = 32,
) -> DataFrame:
    """Perceptual image hash (pHash): grayscale → 32×32 box resize →
    2-D orthonormal DCT-II → top-left 8×8 block → bit i set iff AC
    coefficient i+1 (row-major, DC dropped) exceeds the MEDIAN of the
    63 AC coefficients.  63-bit hash in a BIGINT (bits 0..62) —
    visually similar images land within a few bits of Hamming distance,
    the standard image near-duplicate fingerprint.

    Decoding preserves native bit depth (16-bit PNG/TIFF samples are
    NOT truncated to the high byte): the hash thresholds relative
    magnitudes, so depth only scales coefficients uniformly.  A narrow
    Arrow-batched pass — payloads never leave the executor; pair it
    with ``dedup.hamming_near_dup`` for the corpus-scale join.
    """
    if hash_size * hash_size - 1 > 63:
        raise ValueError(
            f"hash_size {hash_size} needs {hash_size * hash_size - 1} hash "
            f"bits — a BIGINT holds 63; use hash_size <= 8"
        )
    id_type = media.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.png import PNG_SIGNATURE, decode_png

        m = _dct_matrix(work_size)
        for pdf in batches:
            hashes = []
            for payload in pdf[payload_col]:
                data = bytes(payload)
                if data[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
                    img = decode_png(data)
                elif data[:2] == b"\xff\xd8":
                    from ..sources.jpeg import decode_jpeg

                    img = decode_jpeg(data)
                elif data[:2] in (b"II", b"MM"):
                    from ..sources.tiff import decode_tiff_page

                    img = decode_tiff_page(data, 0)
                elif data[:6] in (b"GIF87a", b"GIF89a"):
                    from ..sources.gif import decode_gif

                    img = decode_gif(data, frame=0)
                elif data[:4] == b"RIFF" and data[8:12] == b"WEBP":
                    from ..sources.webp import decode_webp

                    img = decode_webp(data)
                else:
                    raise ValueError(
                        "image_phash: PNG, JPEG, TIFF, GIF or WebP "
                        "payload required"
                    )
                hashes.append(_phash_of(img, m, hash_size, work_size))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "phash": pd.array(hashes, dtype="int64")}
            )

    return media.mapInPandas(kernel, schema=f"{id_col} {id_type}, phash long")


def _phash_of(
    img: np.ndarray, m: np.ndarray, hash_size: int, work_size: int
) -> int:
    """pHash of one decoded frame/image (shared by the image and video
    paths): grayscale → box resize → DCT → median-threshold bits."""
    g = img.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    d = m @ _box_resize(g, work_size) @ m.T
    block = d[:hash_size, :hash_size].ravel()[1:]
    bits = np.nonzero(block > np.median(block))[0]
    h = 0
    for b in bits:
        h |= 1 << int(b)
    return h


def video_frame_hashes(
    media: DataFrame,
    every_n: int = 1,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_size: int = 8,
    work_size: int = 32,
) -> DataFrame:
    """Per-frame perceptual hashes for multi-frame containers
    (multi-page TIFF — pages are frames): (media_id, frame_idx, phash)
    rows, the video member of the fingerprint family.  Each sampled
    frame runs the SAME DCT hash as `image_phash`, so a video's
    fingerprint is a SET of 63-bit frame hashes — compare videos with
    `dedup.set_jaccard_pairs` (shared-scene overlap) or look frames up
    in a pHash index.  One narrow Arrow pass; sampling ``every_n``
    decodes only the planned pages (range reads via the IFD chain).
    """
    if hash_size * hash_size - 1 > 63:
        raise ValueError(f"hash_size {hash_size} exceeds a BIGINT's 63 bits")
    id_type = media.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.avi import parse_avi, read_avi_frame, require_mjpeg
        from ..sources.gif import GIF_SIGNATURES, iter_composited, parse_gif
        from ..sources.jpeg import decode_jpeg
        from ..sources.tiff import decode_tiff_page, parse_tiff_bytes

        m = _dct_matrix(work_size)
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                    ainfo = parse_avi(data)
                    require_mjpeg(ainfo)
                    for i in range(0, len(ainfo.frames), every_n):
                        ids.append(mid)
                        idxs.append(i)
                        hashes.append(
                            _phash_of(
                                decode_jpeg(read_avi_frame(data, ainfo, i)),
                                m, hash_size, work_size,
                            )
                        )
                    continue
                if data[:6] in GIF_SIGNATURES:
                    # animated GIF: frames composite sequentially; hash
                    # the composited canvas (what a viewer shows)
                    ginfo = parse_gif(data)
                    wanted = range(0, len(ginfo.frames), every_n)
                    last = max(wanted, default=-1)
                    for i, canvas in iter_composited(data, ginfo, upto=last):
                        if i % every_n:
                            continue
                        ids.append(mid)
                        idxs.append(i)
                        hashes.append(
                            _phash_of(canvas, m, hash_size, work_size)
                        )
                    continue
                if data[:2] not in (b"II", b"MM"):
                    raise NotImplementedError(
                        "entropy-coded video containers need a media "
                        "library; multi-page TIFF, animated GIF and "
                        "MJPEG AVI are the built-in ones"
                    )
                info = parse_tiff_bytes(data)
                for i in range(0, len(info.pages), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(
                        _phash_of(
                            decode_tiff_page(data, i, info),
                            m, hash_size, work_size,
                        )
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "phash": pd.array(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(
        kernel, schema=f"{id_col} {id_type}, frame_idx int, phash long"
    )


def audio_fingerprint(
    media: DataFrame,
    frame_len: int = 256,
    n_frames: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Spectral audio fingerprint: per fixed-length frame, the dominant
    DFT bin (Shazam-style landmark reduced to its simplest robust
    form); the per-frame bins pack 7 bits each into one BIGINT — the
    audio member of the fingerprint family (`image_phash` for images,
    ``simhash`` for text), ready for ``dedup.hamming_near_dup``.

    Decodes WAV payloads with the pure-NumPy RIFF/PCM codec
    (multi-channel audio averages to mono), zero-pads clips shorter
    than ``n_frames·frame_len`` samples, and ignores the DC bin.
    Ties (equal magnitudes) resolve to the LOWEST bin, so the hash is
    deterministic.  ``n_frames·7`` must fit a BIGINT's 63 payload bits.
    One narrow Arrow pass — audio bytes never leave the executor.
    """
    if n_frames * 7 > 63:
        raise ValueError(
            f"n_frames {n_frames} needs {n_frames * 7} bits — max 9 "
            f"frames fit a BIGINT's 63"
        )
    if frame_len // 2 - 1 > 127:
        raise ValueError(
            f"frame_len {frame_len} yields bins past 127 — a 7-bit field "
            f"can't hold them without aliasing distinct frequencies; use "
            f"frame_len <= 256"
        )
    id_type = media.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.wav import decode_wav

        for pdf in batches:
            fps = []
            for payload in pdf[payload_col]:
                samples, _info = decode_wav(bytes(payload))
                if samples.ndim == 2:
                    samples = samples.mean(axis=1)
                need = frame_len * n_frames
                if len(samples) < need:
                    samples = np.pad(samples, (0, need - len(samples)))
                fp = 0
                for i in range(n_frames):
                    seg = samples[i * frame_len : (i + 1) * frame_len]
                    mag = np.abs(np.fft.rfft(seg))
                    # argmax over bins 1..frame_len/2-1: DC carries no
                    # pitch and the Nyquist bin is phase-degenerate for
                    # real signals — excluding them also keeps every
                    # bin inside the 7-bit field (no % aliasing)
                    b = int(np.argmax(mag[1 : frame_len // 2])) + 1
                    fp |= b << (7 * i)
                fps.append(fp)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "afp": pd.array(fps, dtype="int64")}
            )

    return media.mapInPandas(kernel, schema=f"{id_col} {id_type}, afp long")
