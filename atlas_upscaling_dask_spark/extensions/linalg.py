"""Distributed linear algebra over embedding columns: exact covariance
and driver-side PCA with a distributed projection.

The shape that works at 100 TB: the DATA-sized computation (moment
accumulation, projection) is a narrow Arrow-batched kernel over corpus
partitions; the DIMENSION-sized computation (the d×d eigensolve, d in
the tens-to-thousands) happens ONCE on the driver over a frame whose
size is d(d+1)/2 rows no matter how many vectors were scanned.  That
split — partition-local GEMM partials, driver-side O(d³) — is the
standard tall-skinny PCA decomposition (e.g. Spark MLlib's own
``RowMatrix.computePrincipalComponents``, re-expressed here without
the mllib dependency and with exactness contracts).

Exactness: vectors are scaled to integers (``round(v · 2^scale_bits)``,
away-from-zero rounding — identical in Spark and DuckDB), so partial
moment sums are EXACT int64s (batch-bounded), their totals exact
DECIMAL(38,0)s, and the covariance is one IEEE division of exact
integers — the DuckDB oracle reproduces the matrix bitwise.  The
eigensolve itself is driver-side LAPACK (not oracle-replayable; its
properties are pytest-verified: orthonormality, descending eigenvalues,
numpy parity up to sign).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "embedding_covariance",
    "pca_fit",
    "pca_project",
    "pca_topk",
]


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = 20,
) -> DataFrame:
    """Exact sample covariance of an embedding column, upper triangle.

    Returns (i, j, n, sxy, sx, sy, cov) for 0 <= i <= j < d where
    ``cov`` is the unbiased sample covariance of scaled-integer
    components (n·Σxy − Σx·Σy) / (2^{2b}·n·(n−1)) — every sum exact,
    one final IEEE division.

    Plan: one ``mapInArrow`` pass emits d(d+1)/2 partial rows PER
    PARTITION (never per row — a 10⁹-vector partition contributes the
    same 2080 rows as a 10³-vector one for d=64), then one partial-
    aggregated exchange of those tiny frames.  NULL or wrong-length
    vectors are rejected in the kernel (fail fast, not silently skew).
    """
    if not 1 <= scale_bits <= 25:
        raise ValueError(f"scale_bits must be in [1, 25], got {scale_bits}")
    scale = float(1 << scale_bits)

    schema = "i int, j int, n long, sxy long, sx long, sy long"

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        d_seen = None
        iu = ju = None
        for batch in batches:
            col = batch.column(0)
            lists = col.to_pylist()
            if not lists:
                continue
            for v in lists:
                if v is None:
                    raise ValueError("embedding_covariance: NULL vector")
            mat = np.asarray(lists, dtype=np.float64)
            if mat.ndim != 2:
                raise ValueError("embedding_covariance: ragged vector lengths")
            if d_seen is None:
                d_seen = mat.shape[1]
                iu, ju = np.triu_indices(d_seen)
            elif mat.shape[1] != d_seen:
                raise ValueError("embedding_covariance: ragged vector lengths")
            scaled = mat * scale
            # half-AWAY-from-zero, matching Spark's round() (BigDecimal
            # HALF_UP) and DuckDB's round() — np.rint would tie-to-even
            x = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(
                np.int64
            )
            # The int64 GEMM is exact only while max|x|²·rows < 2^63.
            # Unit-normalized vectors at the default scale_bits/batch
            # size are far inside that, but unnormalized embeddings or
            # a raised arrow.maxRecordsPerBatch would WRAP silently in
            # numpy — so derive the safe row count from the actual
            # batch magnitude and emit per-block partials (the
            # downstream DECIMAL(38,0) aggregation merges them
            # exactly); a single row that already violates the bound
            # is a hard error, not a wrong answer.
            m = int(np.abs(x).max(initial=0))
            safe_rows = x.shape[0] if m == 0 else (2**63 - 1) // (m * m)
            if safe_rows < 1:
                raise ValueError(
                    "embedding_covariance: |scaled value| "
                    f"{m} exceeds the int64-exact bound even for a "
                    "single row; lower scale_bits or normalize vectors"
                )
            for lo in range(0, x.shape[0], safe_rows):
                blk = x[lo : lo + safe_rows]
                sxy = (blk.T @ blk)[iu, ju]  # int64 GEMM: exact
                sx = blk.sum(axis=0, dtype=np.int64)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(iu.astype(np.int32)),
                        pa.array(ju.astype(np.int32)),
                        pa.array(np.full(len(iu), blk.shape[0], dtype=np.int64)),
                        pa.array(sxy),
                        pa.array(sx[iu]),
                        pa.array(sx[ju]),
                    ],
                    ["i", "j", "n", "sxy", "sx", "sy"],
                )

    partials = df.select(F.col(vec_col).cast("array<double>").alias("v")).mapInArrow(
        kernel, schema
    )
    dec = "decimal(38,0)"
    agg = partials.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum(F.col("sxy").cast(dec)).alias("sxy"),
        F.sum(F.col("sx").cast(dec)).alias("sx"),
        F.sum(F.col("sy").cast(dec)).alias("sy"),
    )
    num = F.col("n").cast(dec) * F.col("sxy") - F.col("sx") * F.col("sy")
    den = (
        F.col("n").cast(dec)
        * (F.col("n") - 1).cast(dec)
        * F.lit(1 << (2 * scale_bits)).cast(dec)
    )
    # The moment totals stay DECIMAL(38,0): even unit-normalized
    # vectors at scale_bits=20 overflow a BIGINT total past ~8e6 rows
    # (x² ~ 2^40 each), so a long cast here would abort exactly when
    # the operator is doing its job at scale.  Fixture-scale callers
    # that need BIGINT for an oracle compare cast in their projection.
    return agg.select(
        "i",
        "j",
        "n",
        "sxy",
        "sx",
        "sy",
        (num.cast("double") / den.cast("double")).alias("cov"),
    )


def pca_fit(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    scale_bits: int = 20,
) -> dict:
    """Fit PCA: distributed exact moments, driver-side d×d eigensolve.

    Returns ``{"mean": (d,), "components": (k, d), "eigenvalues": (k,),
    "explained": (k,)}``.  Only the d(d+1)/2-row covariance frame is
    collected — never the data.  Component signs are normalized (the
    largest-magnitude entry of each component is positive) so the fit
    is reproducible across LAPACK builds up to that convention.
    """
    rows = embedding_covariance(df, vec_col, scale_bits).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    d = max(r["j"] for r in rows) + 1
    if not 1 <= k <= d:
        raise ValueError(f"pca_fit: need 1 <= k <= d={d}, got {k}")
    cov = np.zeros((d, d))
    mean = np.zeros(d)
    n = rows[0]["n"]
    scale = float(1 << scale_bits)
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
        if r["i"] == r["j"]:
            mean[r["i"]] = float(r["sx"]) / (n * scale)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:k]
    comps = eigvec[:, order].T  # (k, d)
    signs = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    ev = eigval[order]
    total = float(eigval.sum())
    return {
        "mean": mean,
        "components": comps,
        "eigenvalues": ev,
        "explained": ev / total if total > 0 else ev * 0.0,
        "n": n,
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project vectors onto the fitted components: a zero-shuffle
    Arrow-batched GEMM per partition ((V − mean) · Wᵀ); all other
    columns pass through."""
    comps = np.ascontiguousarray(model["components"], dtype=np.float64)
    mean = np.asarray(model["mean"], dtype=np.float64)
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, `{out_col}` array<double>"

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            mat = np.asarray(
                tbl.column(vec_col).to_pylist(), dtype=np.float64
            )
            proj = (mat - mean) @ comps.T if len(mat) else np.zeros((0, len(comps)))
            arrays = [tbl.column(name).combine_chunks() for name in tbl.column_names]
            arrays.append(pa.array(list(map(list, proj))))
            yield pa.RecordBatch.from_arrays(
                arrays, tbl.column_names + [out_col]
            )

    return df.mapInArrow(kernel, schema)


def pca_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    reduce_k: int = 8,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: dict | None = None,
) -> DataFrame:
    """ANN via PCA reduction: candidate top-(oversample·k) in the
    reduced space, exact full-dimension cosine rerank of candidates.

    The scale story: the reduced space cuts the per-pair dot product
    from d to reduce_k multiplies (8× for d=64, k=8) while the
    candidate set bounds the exact rerank to oversample·k pairs per
    query — the same prefilter-then-verify shape as the LSH and IVF
    paths, with a data-adaptive projection instead of random planes.
    Recall is approximate (pytest-bounded), results deterministic.
    """
    from .similarity import brute_force_topk, cosine

    model = model or pca_fit(corpus, k=reduce_k, vec_col=vec_col)
    qp = pca_project(queries, model, vec_col, "pc").select(id_col, "pc")
    cp = pca_project(corpus, model, vec_col, "pc").select(id_col, "pc")
    cand = brute_force_topk(
        qp, cp, k=oversample * k, id_col=id_col, vec_col="pc"
    ).select("query_id", "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    rescored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
