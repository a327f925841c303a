"""OME-Zarr pyramid writer + distributed Zarr scan.

The reference's actual on-disk product is an OME-Zarr multiscale
pyramid consumable by napari (``upscale_streaming_enhance.py:190-268``;
viewers ``view_upscaled.py:11-12``).  This module closes that format
gap: it emits a spec-compliant **Zarr v2** directory hierarchy with
**OME-NGFF 0.4** ``multiscales`` metadata, byte-identical in layout to
what ``zarr.DirectoryStore`` + ``root.create_dataset`` produce —
written WITHOUT the zarr-python package (not available here), straight
from the public spec:

* root ``.zgroup`` = ``{"zarr_format": 2}``; root ``.zattrs`` carries
  ``multiscales`` (axes z/y/x in micrometers, per-level scale
  transforms) and ``image-label`` exactly as the reference writes them
  (``upscale_streaming_enhance.py:229-255``);
* each level ``i/`` holds a ``.zarray`` (shape, chunks, ``<u4`` dtype,
  C order, fill_value 0, zlib compressor) and chunk files named
  ``cz.cy.cx`` (v2 ``dimension_separator: "."``) containing the
  zlib-compressed C-order block — numcodecs' ``zlib`` codec IS
  ``zlib.compress``, so zarr-python/napari open the output directly.

Scale design: the engine's chunk-packed table already has the exact
chunk grid, so the export is one ``mapInArrow`` pass — each executor
compresses and writes ITS chunks as individual files, embarrassingly
parallel, ZERO shuffle (exactly the data movement ``da.store`` into a
DirectoryStore performs, minus Dask's central scheduler).  All-zero
blocks are skipped: a missing chunk file means ``fill_value`` in Zarr,
so sparse outline volumes cost no files.  The reverse direction
(``scan_ome_zarr``) lists chunk FILENAMES on the driver (metadata
only), then decodes payloads distributed — a third volume source
format next to MHD+raw and TIFF.

Executors write with plain ``open`` — correct for the local/NFS stores
tests run on; on an object store, route through a FUSE mount or swap
``_put_bytes``.
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..volume import CHUNK_SCHEMA, PAYLOAD_DTYPE, VolumeMeta, _chunk_batch

ZARR_DTYPE = "<u4"  # PAYLOAD_DTYPE, spelled per the Zarr v2 spec

_RECEIPT_SCHEMA = "level int, n_chunks long, n_bytes long, n_skipped long"


def _compressor_json(compressor: str, clevel: int) -> dict | None:
    if compressor == "zlib":
        return {"id": "zlib", "level": int(clevel)}
    if compressor == "none":
        return None
    raise ValueError(f"compressor must be 'zlib' or 'none', got {compressor!r}")


def _put_bytes(path: str, data: bytes) -> None:
    """Atomic single-file publish: write sibling temp, rename over."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.__tmp__{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def write_ome_zarr(
    chunks: DataFrame,
    path: str,
    meta: VolumeMeta,
    compressor: str = "zlib",
    clevel: int = 1,
    scale: int = 1,
    name: str = "labels",
    shapes: dict[int, tuple[int, int, int]] | None = None,
) -> dict:
    """Write a chunk-packed (optionally ``level``-stacked) volume as an
    OME-Zarr v2 pyramid; returns per-level receipts
    ``{level: {"n_chunks", "n_bytes", "n_skipped"}}``.

    ``meta`` describes the OUTPUT (level-0) volume, as in
    :func:`~.writer.write_pyramid`: level i's OME scale transform is
    ``spacing·2^i`` — the reference's ``original/scale·2^i``
    (``upscale_streaming_enhance.py:229-243``) with level-0 spacing
    already divided through.  Level shapes and the zarr chunk grid are
    derived from the data (max extents / max origin+extent per level);
    ``shapes`` overrides when a level's trailing chunks are absent
    (all-zero edges).  Overwrite is destructive (K3), like the
    reference's ``rmtree`` (``upscale_streaming_enhance.py:193-194``).
    """
    comp = _compressor_json(compressor, clevel)
    if "level" not in chunks.columns:
        chunks = chunks.withColumn("level", F.lit(0).cast("int"))

    # one tiny agg (≤ levels rows) sizes every .zarray on the driver
    ext = (
        chunks.groupBy("level")
        .agg(
            F.max("dz").alias("kz"),
            F.max("dy").alias("ky"),
            F.max("dx").alias("kx"),
            F.max(F.col("z0") + F.col("dz")).alias("zdim"),
            F.max(F.col("y0") + F.col("dy")).alias("ydim"),
            F.max(F.col("x0") + F.col("dx")).alias("xdim"),
        )
        .collect()
    )
    if not ext:
        raise ValueError("write_ome_zarr: empty chunk frame")
    grids: dict[int, tuple] = {}
    for r in sorted(ext, key=lambda r: r["level"]):
        shp = (shapes or {}).get(
            r["level"], (int(r["zdim"]), int(r["ydim"]), int(r["xdim"]))
        )
        grids[int(r["level"])] = (int(r["kz"]), int(r["ky"]), int(r["kx"]), *shp)
    levels = sorted(grids)
    if levels != list(range(len(levels))):
        raise ValueError(f"write_ome_zarr: levels must be 0..n-1, got {levels}")

    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)  # K3 destructive overwrite

    # ---- driver-side metadata (tiny, before data so readers that list
    # mid-write see a valid-if-incomplete store) ----
    _put_bytes(os.path.join(path, ".zgroup"), b'{\n    "zarr_format": 2\n}')
    datasets = []
    for i in levels:
        kz, ky, kx, zd, yd, xd = grids[i]
        zarray = {
            "zarr_format": 2,
            "shape": [zd, yd, xd],
            "chunks": [kz, ky, kx],
            "dtype": ZARR_DTYPE,
            "compressor": comp,
            "fill_value": 0,
            "order": "C",
            "filters": None,
            "dimension_separator": ".",
        }
        _put_bytes(
            os.path.join(path, str(i), ".zarray"),
            json.dumps(zarray, indent=4).encode(),
        )
        datasets.append(
            {
                "path": str(i),
                "coordinateTransformations": [
                    {
                        "type": "scale",
                        "scale": [
                            meta.spacing_z * (2**i),
                            meta.spacing_y * (2**i),
                            meta.spacing_x * (2**i),
                        ],
                    }
                ],
            }
        )
    zattrs = {
        "multiscales": [
            {
                "version": "0.4",
                "name": name,
                "axes": [
                    {"name": "z", "type": "space", "unit": "micrometer"},
                    {"name": "y", "type": "space", "unit": "micrometer"},
                    {"name": "x", "type": "space", "unit": "micrometer"},
                ],
                "datasets": datasets,
            }
        ],
        "image-label": True,
    }
    _put_bytes(os.path.join(path, ".zattrs"), json.dumps(zattrs, indent=4).encode())
    info = {
        "source": meta.source,
        "element_spacing_zyx": [meta.spacing_z, meta.spacing_y, meta.spacing_x],
        "scale": int(scale),
        "pyramid_levels": len(levels),
    }
    _put_bytes(
        os.path.join(path, ".atlas_upscale_meta.json"),
        json.dumps(info, indent=2).encode(),
    )

    # ---- distributed chunk writes: one file per chunk, zero shuffle ----
    from ..volume import _decode_payload

    grids_bc = grids  # tiny dict, captured by closure

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        stats: dict[int, list[int]] = {}
        for batch in batches:
            d = batch.to_pydict()
            for i in range(len(d["cz"])):
                lvl = d["level"][i]
                kz, ky, kx, zd, yd, xd = grids_bc[lvl]
                dz, dy, dx = d["dz"][i], d["dy"][i], d["dx"][i]
                z0, y0, x0 = d["z0"][i], d["y0"][i], d["x0"][i]
                if z0 % kz or y0 % ky or x0 % kx:
                    raise ValueError(
                        f"write_ome_zarr: chunk origin ({z0},{y0},{x0}) is "
                        f"not aligned to the zarr grid ({kz},{ky},{kx}) at "
                        f"level {lvl}; rechunk() to a regular grid first"
                    )
                block = np.frombuffer(
                    _decode_payload(
                        d["payload"][i],
                        d["codec"][i],
                        dz * dy * dx * PAYLOAD_DTYPE.itemsize,
                    ),
                    dtype=PAYLOAD_DTYPE,
                ).reshape(dz, dy, dx)
                st = stats.setdefault(lvl, [0, 0, 0])
                if not block.any():
                    st[2] += 1  # missing chunk ≡ fill_value: skip file
                    continue
                if (dz, dy, dx) != (kz, ky, kx):
                    # Zarr v2 stores edge chunks FULL-SIZE, padded
                    full = np.zeros((kz, ky, kx), dtype=PAYLOAD_DTYPE)
                    full[:dz, :dy, :dx] = block
                    block = full
                raw = np.ascontiguousarray(block).tobytes()
                data = zlib.compress(raw, clevel) if comp else raw
                _put_bytes(
                    os.path.join(
                        path, str(lvl), f"{z0 // kz}.{y0 // ky}.{x0 // kx}"
                    ),
                    data,
                )
                st[0] += 1
                st[1] += len(data)
        for lvl, (n, b, s) in stats.items():
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([lvl], type=pa.int32()),
                    pa.array([n], type=pa.int64()),
                    pa.array([b], type=pa.int64()),
                    pa.array([s], type=pa.int64()),
                ],
                ["level", "n_chunks", "n_bytes", "n_skipped"],
            )

    receipts = (
        chunks.select(
            "level", "cz", "cy", "cx", "z0", "y0", "x0", "dz", "dy", "dx",
            "codec", "payload",
        )
        .mapInArrow(kernel, schema=_RECEIPT_SCHEMA)
        .groupBy("level")
        .agg(
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n_bytes").alias("n_bytes"),
            F.sum("n_skipped").alias("n_skipped"),
        )
        .collect()
    )
    return {
        int(r["level"]): {
            "n_chunks": int(r["n_chunks"]),
            "n_bytes": int(r["n_bytes"]),
            "n_skipped": int(r["n_skipped"]),
        }
        for r in receipts
    }


def _read_zarray(path: str, level: int) -> dict:
    with open(os.path.join(path, str(level), ".zarray")) as fh:
        meta = json.load(fh)
    if meta.get("zarr_format") != 2 or meta.get("order") != "C":
        raise ValueError("unsupported zarr array (need v2, C order)")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise ValueError(f"unsupported compressor {comp!r}")
    return meta


def _decode_chunk_file(fpath: str, meta: dict) -> np.ndarray:
    with open(fpath, "rb") as fh:
        data = fh.read()
    if meta.get("compressor") is not None:
        data = zlib.decompress(data)
    return np.frombuffer(data, dtype=np.dtype(meta["dtype"])).reshape(
        meta["chunks"]
    )


def read_zarr_level(path: str, level: int = 0) -> np.ndarray:
    """Driver-side: assemble one pyramid level into a dense array —
    the verification/tooling twin of what napari's zarr reader does.
    Missing chunk files read as ``fill_value`` per the spec."""
    meta = _read_zarray(path, level)
    shape, kshape = meta["shape"], meta["chunks"]
    sep = meta.get("dimension_separator", ".")
    out = np.full(shape, meta.get("fill_value") or 0, dtype=np.dtype(meta["dtype"]))
    lvl_dir = os.path.join(path, str(level))
    for fname in os.listdir(lvl_dir):
        if fname.startswith("."):
            continue
        idx = [int(p) for p in fname.split(sep)]
        block = _decode_chunk_file(os.path.join(lvl_dir, fname), meta)
        sl = tuple(
            slice(i * k, min((i + 1) * k, s))
            for i, k, s in zip(idx, kshape, shape)
        )
        out[sl] = block[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def scan_ome_zarr(
    spark: SparkSession,
    path: str,
    level: int = 0,
    volume_id: str = "zarr",
) -> DataFrame:
    """Distributed Zarr level scan → chunk-packed frame (S-family
    source, like the MHD and TIFF scans).

    The driver touches METADATA only — one ``.zarray`` read plus a
    directory listing of chunk filenames; every payload is opened,
    decompressed, and cropped to true extent inside executors.  Chunks
    with no file materialize as ``fill_value`` blocks (that is what a
    missing chunk MEANS in Zarr), so the scan is exact on sparse
    stores.  At 1000 executors this parallelizes per chunk file with
    zero shuffle."""
    meta = _read_zarray(path, level)
    (zd, yd, xd), (kz, ky, kx) = meta["shape"], meta["chunks"]
    sep = meta.get("dimension_separator", ".")
    lvl_dir = os.path.join(path, str(level))
    present = {
        tuple(int(p) for p in f.split(sep))
        for f in os.listdir(lvl_dir)
        if not f.startswith(".")
    }
    grid = [
        (cz, cy, cx, (cz, cy, cx) in present)
        for cz in range(-(-zd // kz))
        for cy in range(-(-yd // ky))
        for cx in range(-(-xd // kx))
    ]
    gdf = spark.createDataFrame(
        grid, "cz int, cy int, cx int, has_file boolean"
    ).repartition(max(spark.sparkContext.defaultParallelism, 1))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            d = batch.to_pydict()
            rows, payloads = [], []
            for i in range(len(d["cz"])):
                cz, cy, cx = d["cz"][i], d["cy"][i], d["cx"][i]
                z0, y0, x0 = cz * kz, cy * ky, cx * kx
                bz, by, bx = (
                    min(kz, zd - z0),
                    min(ky, yd - y0),
                    min(kx, xd - x0),
                )
                if d["has_file"][i]:
                    block = _decode_chunk_file(
                        os.path.join(lvl_dir, f"{cz}{sep}{cy}{sep}{cx}"), meta
                    )[:bz, :by, :bx]
                    block = block.astype(PAYLOAD_DTYPE, copy=False)
                else:
                    block = np.full(
                        (bz, by, bx),
                        meta.get("fill_value") or 0,
                        dtype=PAYLOAD_DTYPE,
                    )
                rows.append(
                    (volume_id, cz, cy, cx, z0, y0, x0, bz, by, bx)
                )
                payloads.append(np.ascontiguousarray(block).tobytes())
            if rows:
                yield _chunk_batch(rows, payloads)

    return gdf.mapInArrow(kernel, schema=CHUNK_SCHEMA)
