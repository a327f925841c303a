"""P1-P5 — planning / resource governance.

The reference plans before executing: chunk-size heuristic
(``upscale_streaming.py:59-74``), output-size estimator with pyramid
overhead (``upscale_streaming_enhance.py:145-167``), a human-readable
plan printer + ``--dry-run`` (``:170-184, 343-345``), and admission
guards (``:330-341``).  In Spark the *optimizer* plans automatically;
this layer reproduces the reference's *admission-control* surface:
what would run, how big it gets, and whether to allow it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..volume import VolumeMeta, choose_chunks

# Geometric series Σ (1/8)^i for i≥1 converges to 1/7 — the pyramid
# levels add at most this fraction of the base volume
# (upscale_streaming_enhance.py:145-167 uses the same factor).
PYRAMID_OVERHEAD = 1.0 + 1.0 / 7.0


def estimate_output_bytes(
    meta: VolumeMeta,
    scale: int,
    itemsize: int = 4,
    pyramid_levels: int = 1,
) -> int:
    """P2 — logical output size: Z·Y·X·s³·itemsize (+ pyramid overhead)."""
    base = meta.n_voxels * (scale**3) * itemsize
    if pyramid_levels > 1:
        base = int(base * PYRAMID_OVERHEAD)
    return base


@dataclass(frozen=True)
class UpscalePlan:
    """The printable execution plan (P3) for an upscale job."""

    meta: VolumeMeta
    scale: int
    pyramid_levels: int
    compressor: str
    chunk: tuple[int, int, int]
    est_output_gb: float

    def describe(self) -> str:
        out_shape = tuple(d * self.scale for d in self.meta.shape)
        return "\n".join(
            [
                "== upscale plan ==",
                f"input shape (z,y,x): {self.meta.shape}",
                f"output shape (z,y,x): {out_shape}",
                f"scale: x{self.scale}  pyramid levels: {self.pyramid_levels}",
                f"chunk (z,y,x): {self.chunk}  compressor: {self.compressor}",
                f"estimated logical output: {self.est_output_gb:.2f} GB",
            ]
        )


def plan_upscale(
    meta: VolumeMeta,
    scale: int,
    pyramid_levels: int = 1,
    compressor: str = "zstd",
    chunk_mb: int = 8,
) -> UpscalePlan:
    """P1+P2+P3 — build the plan (no job submitted; Spark stays lazy)."""
    chunk = choose_chunks(meta.shape, itemsize=4, target_mb=chunk_mb)
    est = estimate_output_bytes(meta, scale, 4, pyramid_levels) / 1e9
    return UpscalePlan(meta, scale, pyramid_levels, compressor, chunk, est)


class AdmissionError(RuntimeError):
    """A safety guard rejected the job (P4)."""


def check_admission(
    plan: UpscalePlan,
    max_scale: int = 20,
    max_gb: float | None = None,
    force: bool = False,
) -> None:
    """P4 — guards of upscale_streaming_enhance.py:330-341: block absurd
    scales, oversized outputs, and multi-level pyramids unless forced."""
    if force:
        return
    if plan.scale > max_scale:
        raise AdmissionError(
            f"scale x{plan.scale} exceeds the x{max_scale} guard (use force=True)"
        )
    if max_gb is not None and plan.est_output_gb > max_gb:
        raise AdmissionError(
            f"estimated {plan.est_output_gb:.2f} GB exceeds --max-gb {max_gb}"
        )
    if plan.pyramid_levels > 1 and plan.scale > max_scale:
        raise AdmissionError("pyramid on an over-guard scale requires force=True")


def explain(df: DataFrame) -> str:
    """P3 — the Catalyst side of the dry-run: the formatted physical plan
    (whole-stage codegen spans, pushed filters, join strategies)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
