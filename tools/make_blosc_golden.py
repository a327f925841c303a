#!/usr/bin/env python
"""Generate the real-c-blosc golden fixture stores.

Run this ON A MACHINE THAT HAS ``numcodecs`` (which bundles the actual
C blosc library) and commit the output directory.  The build container
has neither network nor the C library, so the fixture must be produced
externally — this script makes that a one-command task:

    python tools/make_blosc_golden.py          # writes tests/fixtures/blosc_golden/

It writes one minimal Zarr v2 array per reference compressor choice
(upscale_streaming.py:103-108 offers Blosc zstd or lz4, clevel 5,
BITSHUFFLE) with DETERMINISTIC content — the verifying test
(test_blosc1.py::test_real_cblosc_golden_store_decodes) regenerates
the expected voxels from the same formula, so no truth file is needed,
and auto-activates whenever the fixture directory exists.

The stores are deliberately tiny (16x16x16 u4, chunks 8x8x8 -> 8
chunks x ~2 KB compressed each) so vendoring them costs ~30 KB.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SHAPE = (16, 16, 16)
CHUNKS = (8, 8, 8)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "blosc_golden",
)


def golden_volume() -> np.ndarray:
    """The fixture content — the SAME formula the verifying test uses.
    Knuth-hash of the flat index, folded to u4: incompressible enough
    to exercise real compression, fully deterministic."""
    n = int(np.prod(SHAPE))
    flat = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(
        65521
    )
    return flat.astype("<u4").reshape(SHAPE)


def main() -> None:
    try:
        from numcodecs import Blosc
    except ImportError:
        sys.exit(
            "numcodecs is not installed — run this on a machine that has "
            "it (pip install numcodecs) and commit tests/fixtures/"
            "blosc_golden/"
        )
    vol = golden_volume()
    nz = -(-SHAPE[0] // CHUNKS[0])
    ny = -(-SHAPE[1] // CHUNKS[1])
    nx = -(-SHAPE[2] // CHUNKS[2])
    for cname in ("zstd", "lz4"):
        root = os.path.join(OUT, f"{cname}.zarr")
        lvl = os.path.join(root, "0")
        os.makedirs(lvl, exist_ok=True)
        codec = Blosc(cname=cname, clevel=5, shuffle=Blosc.BITSHUFFLE)
        with open(os.path.join(lvl, ".zarray"), "w") as fh:
            json.dump(
                {
                    "zarr_format": 2,
                    "shape": list(SHAPE),
                    "chunks": list(CHUNKS),
                    "dtype": "<u4",
                    "compressor": codec.get_config(),
                    "fill_value": 0,
                    "order": "C",
                    "filters": None,
                    "dimension_separator": ".",
                },
                fh,
            )
        for cz in range(nz):
            for cy in range(ny):
                for cx in range(nx):
                    block = vol[
                        cz * CHUNKS[0] : (cz + 1) * CHUNKS[0],
                        cy * CHUNKS[1] : (cy + 1) * CHUNKS[1],
                        cx * CHUNKS[2] : (cx + 1) * CHUNKS[2],
                    ]
                    data = codec.encode(np.ascontiguousarray(block))
                    with open(
                        os.path.join(lvl, f"{cz}.{cy}.{cx}"), "wb"
                    ) as fh:
                        fh.write(bytes(data))
        print(f"wrote {root}")
    print(
        "Done. Commit tests/fixtures/blosc_golden/ — the golden test "
        "activates automatically."
    )


if __name__ == "__main__":
    main()
