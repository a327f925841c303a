"""S7 — TIFF ingestion utility (stubbed: no tifffile in this container).

The reference uses ``tifffile.imread``/``tifffile.memmap`` only as an
ingestion convenience and for target-shape matching
(``anno_upsampling.py:33,43``) — out of the engine's relational scope
(SURVEY.md §2.1).  The import is gated so the module loads everywhere;
with ``tifffile`` installed the reader lands directly in the
chunk-packed representation like the MHD scan.
"""

from __future__ import annotations

try:  # pragma: no cover - exercised only where tifffile exists
    import tifffile  # noqa: F401

    HAVE_TIFF = True
except ImportError:
    HAVE_TIFF = False


def read_tiff_shape(path: str) -> tuple[int, ...]:
    """Target-shape matching helper (anno_upsampling.py:40-47)."""
    if not HAVE_TIFF:
        raise NotImplementedError(
            "TIFF support requires the 'tifffile' package (not available in "
            "this environment); use the MHD source or parquet chunk tables"
        )
    return tifffile.memmap(path).shape  # pragma: no cover


def read_tiff_chunks(spark, path: str, chunk=None):  # pragma: no cover
    """Distributed TIFF scan — same plan shape as sources.mhd once the
    codec is available: driver reads the header, tasks range-read pages."""
    raise NotImplementedError(
        "TIFF chunk scan requires 'tifffile'; the MHD source (sources/mhd.py) "
        "implements the identical distributed range-read pattern"
    )
