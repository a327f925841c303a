"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headliners mirror BASELINE.md:

* ``bulk_upscale2`` — the reference's ×2 flagship at its REAL shape
  ((456,320,528) uint32 ≈ 308 MB logical → 2.46 GB out; reference:
  2.98 s, ~0.83 GB/s; our chunk-packed ``np.repeat`` kernel per Spark
  partition).  Also reported as ``bulk_gb_per_sec`` (logical output
  GB/s) for direct comparison against the reference's 1.5 GB/s ×15 run.
* COO/relational headliners: explode-upscale on lineitem, TPC-H-Q1-
  style aggregation, broadcast dim join, outline windows, MinHash-LSH
  dedup (xxhash scale backend), embedding top-k, as-of join, tumbling
  time buckets.

Every query is forced end-to-end with the no-op batch sink
(``format("noop")``) — full computation, zero serialization to the
driver, no filesystem noise in the timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Rows whose SEMANTICS changed enough that pre-change floors no
# longer describe the same work.  The monotone-floor guarantee is
# "the floor can never rise on identical code" — these rows are not
# identical code, so their history restarts at the named round, and
# the reset is recorded in the artifact (``floor_resets``) so a
# record written after the reset folds normally while older records'
# values for that row are excluded.  Adding an entry here is an
# auditable event: the reason string is part of the artifact.
_FLOOR_RESETS: dict[str, str] = {
    "pdf_text_extract": (
        "r12: row now covers 100% of documents (was 85%) and performs"
        " CID /ToUnicode decoding plus standard-security-handler"
        " authentication + RC4/AES decryption on the encrypted groups"
        " — strictly more work than the r11 row under the same name"
    ),
}


def fold_best_known(records: list, sf: float) -> dict[str, float]:
    """Per-row historical floor: the min over every record at the SAME
    sf of BOTH its per-row timings (``queries``) AND its own
    ``best_known`` field.

    Folding each record's ``best_known`` back in is what makes the
    floor MONOTONE: ``BENCH_FULL.json`` is overwritten on every run,
    but because its ``best_known`` field was itself a min over all
    history at write time, re-folding it guarantees the committed
    floor can never rise on identical code.  The r10 verdict (What's
    wrong #1) caught exactly this: folding raw timings only, the
    "history" degenerated to the previous single run and four rows'
    floors drifted UP — which would slowly launder host noise into
    the adjudication baseline.
    """
    best: dict[str, float] = {}
    for rec in records:
        rec = (rec.get("parsed") or rec) if isinstance(rec, dict) else {}
        if not isinstance(rec, dict) or rec.get("sf") != sf:
            continue
        rec_resets = rec.get("floor_resets") or {}
        for src in (rec.get("queries"), rec.get("best_known")):
            if not isinstance(src, dict):
                continue
            for k, v in src.items():
                if k in _FLOOR_RESETS and rec_resets.get(k) != _FLOOR_RESETS[k]:
                    # pre-reset record: its floor describes the OLD
                    # row semantics — excluded (see _FLOOR_RESETS)
                    continue
                if isinstance(v, (int, float)):
                    fv = float(v)
                    best[k] = min(best.get(k, fv), fv)
    return best


def load_best_known(here: str, sf: float) -> dict[str, float]:
    """Fold every committed bench record (driver rounds + the builder
    sidecar) into the per-row floor.  Seeding from the sidecar BEFORE
    it is overwritten is load-bearing — see ``fold_best_known``."""
    import glob as _glob

    records = []
    for hist in sorted(_glob.glob(os.path.join(here, "BENCH_r*.json"))) + [
        os.path.join(here, "BENCH_FULL.json")
    ]:
        try:
            with open(hist) as fh:
                records.append(json.load(fh))
        except (OSError, ValueError):
            continue
    return fold_best_known(records, sf)


def main() -> None:
    from pyspark.sql import functions as F

    from atlas_upscaling_dask_spark import suite
    from atlas_upscaling_dask_spark.operators.upscale import upscale_chunks
    from atlas_upscaling_dask_spark.session import get_spark
    from atlas_upscaling_dask_spark.volume import VolumeMeta, synthetic_chunks

    spark = get_spark("bench")
    # Warm the JVM and the Python worker pool so the first timed query
    # doesn't absorb process startup (the reference's timings are
    # likewise hot-cache single-machine runs, BASELINE.md).
    spark.range(1_000_000).agg(F.sum("id")).collect()
    warm = synthetic_chunks(spark, VolumeMeta(32, 32, 32), chunk=(8, 32, 32))
    force(upscale_chunks(warm, 2))

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # per-run samples for the volatile bulk rows (r2→r3 swung 2× on
    # byte-identical code — host noise; the spread makes a real
    # regression distinguishable from a noisy best-of)
    spread: dict[str, list[float]] = {}

    def jvm_gc() -> None:
        spark.sparkContext._jvm.System.gc()

    def timed(name: str, fn, runs: int = 3) -> None:
        # best-of-N: the host shows multi-point load-average swings from
        # external neighbors; min-of-runs reports the operator, not them.
        # ≥3 samples per row is a protocol floor (r8 verdict #5: the one
        # single-sample row, zarr_export_lz4, became the round's only
        # claim/record discrepancy because its lone sample carried the
        # heavy-export warm-up debt the min would have discarded).
        runs = max(runs, 3)
        # EVERY row records its per-run list in spread (VERDICT r5 #3:
        # a phantom 2.7× bulk_outline regression needed a judge
        # re-measurement because best-of alone can't prove noise) and
        # starts from a collected heap so GC debt from preceding rows
        # doesn't leak into the first sample.
        # One broken query must NOT erase the round's numbers: record the
        # failure and keep going — the JSON line always prints.
        t_runs: list[float] = []
        try:
            for _ in range(runs):
                # per-sample collection (inside the guard: a wedged JVM
                # must not abort the run), untimed — the bulk rows'
                # proven pattern.  GC-before-first-sample-only left the
                # later samples of heavy rows carrying the earlier
                # samples' heap debt (the 4x export spread swung
                # [6.5, 14.0, 10.1] on an idle host).
                jvm_gc()
                t0 = time.perf_counter()
                fn()
                t_runs.append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — harness guard by design
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            return
        spread[name] = [round(t, 3) for t in t_runs]
        timings[name] = round(min(t_runs), 3)

    # --- fixed identical-code noise probe (r9 verdict #3): the SAME
    # workload every round — the bulk_upscale15 compute, warm pass +
    # 4 timed samples with per-sample GC — run isolated BEFORE and
    # AFTER the suite.  On identical code its floor can only rise from
    # host/neighbor load, so the round's total is machine-flagged
    # noise-inflated when even the probe's best sample exceeds the
    # committed best_known for the same workload (outside the 1.25x
    # quiet-host band SCALE.md's 2026-08-15/16 probe study measured).
    # This replaces two rounds of prose adjudication with a field the
    # judge reads straight from the artifact.
    probe_meta = VolumeMeta(114, 160, 176)

    def noise_probe() -> list[float]:
        chunks_p = synthetic_chunks(spark, probe_meta, chunk=(8, 32, 44)).cache()
        try:
            force(upscale_chunks(chunks_p, 15, codec="zstd"))  # untimed warm
            samples: list[float] = []
            for _ in range(4):
                jvm_gc()
                t0 = time.perf_counter()
                force(upscale_chunks(chunks_p, 15, codec="zstd"))
                samples.append(round(time.perf_counter() - t0, 3))
            return samples
        finally:
            chunks_p.unpersist(blocking=True)

    probe_before: list[float] | None = None
    try:
        probe_before = noise_probe()
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["noise_probe_before"] = f"{type(e).__name__}: {e}"[:300]

    # --- bulk path at the reference's baseline shape (BASELINE.md row 1).
    # One untimed full-size pass first: the Python worker pool forks and
    # the JVM JITs the large-binary Arrow paths lazily, so the first
    # full-size run measures process ramp-up, not the operator (the
    # reference's 2.98 s is likewise a warm single-node run).  Then
    # best-of-2 timed.
    # chunk (29,160,176): 96 chunks = 3 clean waves on 32 threads,
    # ~3 MB in / 26 MB out per chunk — the stable optimum of a measured
    # geometry sweep (larger chunks trigger GC-driven variance).
    # The input volume is cached (the analog of the reference's
    # page-cached raw input); timed runs measure read-cached → upscale →
    # consume, best-of-3 against single-machine scheduling noise.
    # Payloads are lz4-compressed inside the worker: the reference's ×2
    # run wrote zarr with the DEFAULT compressor — Blosc lz4 clevel 5
    # (upscale.py:22-24) — so its 2.98 s includes compression; raw
    # payloads here would measure an Arrow/noop byte-shuttle the
    # reference never paid (0.31 GB/s raw vs 3.1 GB/s lz4 measured).
    meta = VolumeMeta(456, 320, 528)

    def bulk2():
        chunks = synthetic_chunks(spark, meta, chunk=(29, 160, 176)).cache()
        try:
            force(upscale_chunks(chunks, 2, codec="lz4"))  # untimed warm pass
            t_runs = []
            for _ in range(5):  # 5 samples + inter-run GC: pin the swing
                jvm_gc()
                t0 = time.perf_counter()
                force(upscale_chunks(chunks, 2, codec="lz4"))
                t_runs.append(time.perf_counter() - t0)
            spread["bulk_upscale2"] = [round(t, 3) for t in t_runs]
            timings["bulk_upscale2"] = round(min(t_runs), 3)
        finally:
            chunks.unpersist(blocking=True)

    try:
        bulk2()
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["bulk_upscale2"] = f"{type(e).__name__}: {e}"[:300]
    out_gb = meta.n_voxels * 8 * 4 / 1e9  # s³=8 output voxels, 4 B each

    # --- the reference's marquee ×15 workload (BASELINE.md row 3:
    # 1.04 TB logical at 1.5 GB/s), shrunk to a 43 GB-logical volume.
    # Payloads are zstd-compressed inside the worker (the reference ran
    # Blosc zstd clevel 5; pyarrow's zstd is our analog) so the Arrow
    # boundary carries ~0.3 GB, not 43 GB.
    meta15 = VolumeMeta(114, 160, 176)

    def bulk15():
        chunks15 = synthetic_chunks(spark, meta15, chunk=(8, 32, 44)).cache()
        try:
            force(upscale_chunks(chunks15, 15, codec="zstd"))  # untimed warm
            t_runs = []
            for _ in range(5):  # 5 samples + inter-run GC: pin the swing
                jvm_gc()
                t0 = time.perf_counter()
                force(upscale_chunks(chunks15, 15, codec="zstd"))
                t_runs.append(time.perf_counter() - t0)
            spread["bulk_upscale15"] = [round(t, 3) for t in t_runs]
            timings["bulk_upscale15"] = round(min(t_runs), 3)
        finally:
            chunks15.unpersist(blocking=True)

    try:
        bulk15()
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["bulk_upscale15"] = f"{type(e).__name__}: {e}"[:300]
    out15_gb = meta15.n_voxels * 15**3 * 4 / 1e9

    # --- durable ×15: same workload, but materialized as a REAL
    # cz-partitioned parquet table (VERDICT r2 "Next round #2" — the
    # reference's 1.5 GB/s includes writing 1.04 TB of compressed Zarr,
    # so the noop figure above is compute-only; this row is the
    # BASELINE.md row-3 parity INCLUDING I/O).  Payloads are already
    # zstd-compressed in-worker, so parquet recompression is disabled
    # (the Zarr analog: Blosc-compressed chunks, uncompressed container).
    import shutil
    import tempfile

    from atlas_upscaling_dask_spark.sinks.writer import write_volume

    def bulk15_write():
        chunks15 = synthetic_chunks(spark, meta15, chunk=(8, 32, 44)).cache()
        out_dir = tempfile.mkdtemp(prefix="bench_x15_write_")
        try:
            force(upscale_chunks(chunks15, 15, codec="zstd"))  # untimed warm
            t_runs = []
            for _ in range(3):  # durable write swings with page-cache state
                jvm_gc()
                t0 = time.perf_counter()
                write_volume(
                    upscale_chunks(chunks15, 15, codec="zstd"),
                    out_dir,
                    VolumeMeta(meta15.dim_z * 15, meta15.dim_y * 15, meta15.dim_x * 15),
                    scale=15,
                    compressor="none",
                )
                t_runs.append(time.perf_counter() - t0)
            spread["bulk_upscale15_write"] = [round(t, 3) for t in t_runs]
            timings["bulk_upscale15_write"] = round(min(t_runs), 3)
        finally:
            chunks15.unpersist(blocking=True)
            shutil.rmtree(out_dir, ignore_errors=True)

    try:
        bulk15_write()
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["bulk_upscale15_write"] = f"{type(e).__name__}: {e}"[:300]

    # --- bulk outline + decimation at the ×2-flagship shape: the
    # round-3 chunk-packed kernels (halo exchange / zero-shuffle stride)
    # that replace the COO-only scale-killers flagged in VERDICT r2.
    from atlas_upscaling_dask_spark.operators.outline import outline_chunks
    from atlas_upscaling_dask_spark.operators.pyramid import decimate_chunks

    def bulk_derived():
        chunks = synthetic_chunks(spark, meta, chunk=(29, 160, 176)).cache()
        try:
            force(outline_chunks(chunks, codec="lz4"))  # untimed warm
            t_runs = []
            for _ in range(3):
                jvm_gc()
                t0 = time.perf_counter()
                force(outline_chunks(chunks, codec="lz4"))
                t_runs.append(time.perf_counter() - t0)
            spread["bulk_outline"] = [round(t, 3) for t in t_runs]
            timings["bulk_outline"] = round(min(t_runs), 3)
            t_runs = []
            for _ in range(3):
                jvm_gc()
                t0 = time.perf_counter()
                force(decimate_chunks(chunks, 2))
                t_runs.append(time.perf_counter() - t0)
            spread["bulk_decimate"] = [round(t, 3) for t in t_runs]
            timings["bulk_decimate"] = round(min(t_runs), 3)
            # the reference's composed enhance workload (×2 upscale →
            # torus outline → 2-level pyramid) end-to-end on the bulk
            # path.  Explicit per-run cache handle so every timed run
            # pays the full base compute ONCE (the K4 fix: level 1
            # derives from the cached base, never a recompute — but the
            # cache population itself is inside the timing).
            t_runs = []
            for _ in range(3):
                jvm_gc()
                t0 = time.perf_counter()
                base = outline_chunks(
                    upscale_chunks(chunks, 2, codec="lz4"), wrap=True, codec="lz4"
                ).cache()
                try:
                    force(base)  # level 0 (computes + caches)
                    force(decimate_chunks(base, 2))  # level 1 from cache
                finally:
                    base.unpersist(blocking=True)
                t_runs.append(time.perf_counter() - t0)
            spread["bulk_enhance"] = [round(t, 3) for t in t_runs]
            timings["bulk_enhance"] = round(min(t_runs), 3)
        finally:
            chunks.unpersist(blocking=True)

    try:
        bulk_derived()
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["bulk_outline"] = f"{type(e).__name__}: {e}"[:300]

    # --- scale soak (VERDICT r5 #6): the flagship ×2 at 8× the baseline
    # voxel count — (912,640,1056) uint32 ≈ 2.46 GB raw → 19.7 GB logical
    # out — with the SAME per-chunk geometry as bulk_upscale2 (768 chunks
    # instead of 96; 24 waves on 32 threads instead of 3).  Per-GB rate
    # should match the sf-shape row within 2×: throughput is set by the
    # per-chunk kernel, and executor memory stays partition-bounded no
    # matter how many chunks the volume has.
    meta4x = VolumeMeta(912, 640, 1056)

    def bulk2_4x():
        chunks4x = synthetic_chunks(spark, meta4x, chunk=(29, 160, 176)).cache()
        try:
            force(upscale_chunks(chunks4x, 2, codec="lz4"))  # untimed warm
            t_runs = []
            for _ in range(3):
                jvm_gc()
                t0 = time.perf_counter()
                force(upscale_chunks(chunks4x, 2, codec="lz4"))
                t_runs.append(time.perf_counter() - t0)
            spread["bulk_upscale2_4x"] = [round(t, 3) for t in t_runs]
            timings["bulk_upscale2_4x"] = round(min(t_runs), 3)
        finally:
            chunks4x.unpersist(blocking=True)

    try:
        bulk2_4x()
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["bulk_upscale2_4x"] = f"{type(e).__name__}: {e}"[:300]
    out4x_gb = meta4x.n_voxels * 8 * 4 / 1e9

    # Post-bulk hygiene: the bulk section pushes multi-GB of binary
    # payloads through the block manager and JVM old-gen; without an
    # explicit collection the relational headliners below absorb that
    # GC debt (measured 2-8x inflation on the first queries after).
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1)

    # --- COO / relational / extension headliners from the suite
    headliners = [
        "upscale_lineitem",
        "tpch_q1_pricing",
        "dim_join_left",
        "vox_outline",
        "embed_topk",
        "asof_events_orders",
        "time_bucket_agg",
        "sessionize",
        "dedup_exact",
        "text_stats",
        "doc_pipeline",
        "tpch_q3_shipping",
        "prepare_training_set",
        "line_dedup",
        "duplicate_windows",
        "duplicate_spans",
        "lm_score",
        "prepare_rag_corpus",
        "embed_pq_topk",
        "embed_ivf_pq_topk",
        "semantic_dedup",
        "setsim_prefix_join",
        "scd2_user_segments",
        "check_constraints_lineitem",
        "image_phash_neardup",
        "edit_distance_join",
        "bloom_semi_join",
        "cms_heavy_hitters",
        "setsim_containment_join",
        "dedup_canonical_quality",
        "histogram_equidepth",
        "market_basket_lift",
        "graph_bfs",
        "hll_ndv",
        "seasonal_decompose",
        "embed_covariance",
        # media-codec rows: from-spec GIF LZW and WebP VP8L decode
        # through the fingerprint pipeline — the honest per-core codec
        # price.  (avi_frame_hashes is oracle-checked but NOT benched:
        # its fixture synthesizes 4 JPEG encodes per clip, so the row
        # would measure encoder fixture cost, not the decode path.)
        "gif_phash_values",
        "image_phash_webp",
        # VP8 lossy keyframe decode (RFC 6386 bool coder + intra
        # prediction per group, group-hash repartitioned from the work)
        "webp_lossy_decode",
        # PDF text extraction (linear object scan + Flate inflate +
        # operator fold) — the document-corpus codec price
        "pdf_text_extract",
    ]
    # asof's isolated profile is a ~4-run JIT warm-up
    # ([0.97, 0.74, 0.68, 0.59, ...] on an idle host), so a 3-run min
    # mid-suite systematically over-reports it by ~30% — give it the
    # extra samples the floor needs
    slow_warmup_runs = {"asof_events_orders": 6}
    for name in headliners:
        timed(
            name,
            lambda n=name: force(suite.QUERIES[n](spark, SF_DIR)),
            runs=slow_warmup_runs.get(name, 3),
        )

    # Interactive point lookup (BASELINE target: ≤2 s warm at sf0.01):
    # Q1+Q4 against an on-disk chunk-partitioned volume — partition
    # pruning on cz plus parquet stats keep the scan to one chunk.
    import tempfile

    from atlas_upscaling_dask_spark.operators.relational import (
        decode_labels,
        synthetic_regions,
    )
    from atlas_upscaling_dask_spark.sinks.writer import write_volume
    from atlas_upscaling_dask_spark.volume import FIXTURE_META, chunks_to_voxels

    try:
        vol_dir = tempfile.mkdtemp(prefix="bench_vol_")
        write_volume(
            synthetic_chunks(spark, FIXTURE_META, chunk=(4, 16, 16)),
            vol_dir,
            FIXTURE_META,
        )
        stored = spark.read.parquet(vol_dir)
        regions = synthetic_regions(spark).cache()
        regions.count()

        def point_query():
            vox = chunks_to_voxels(stored.filter(F.col("cz") == 1))
            hit = vox.filter(
                (F.col("z") == 4) & (F.col("y") == 4) & (F.col("x") == 4)
            )
            decode_labels(hit, regions).collect()

        timed("point_lookup_q1q4", point_query, runs=3)

        # the binary fast path: pruned scan + SQL byte extraction,
        # no payload decode, no Python
        from atlas_upscaling_dask_spark.operators.relational import (
            point_lookup_chunks,
        )

        def point_query_binary():
            hit = point_lookup_chunks(stored, 4, 4, 4)
            decode_labels(hit, regions).collect()

        timed("point_lookup_binary", point_query_binary, runs=3)
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["point_lookup_q1q4"] = f"{type(e).__name__}: {e}"[:300]

    # --- SemDeDup scale backend: per-bucket GEMM kernel (vs the
    # fold-expression oracle form timed as semantic_dedup above)
    try:
        from atlas_upscaling_dask_spark.extensions.similarity import semantic_dedup
        from atlas_upscaling_dask_spark.tables import load_table as _lt5

        emb_sd = _lt5(spark, SF_DIR, "embeddings")
        timed(
            "semantic_dedup_gemm",
            lambda: force(semantic_dedup(emb_sd, 0.3, 16, backend="gemm")),
        )
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["semantic_dedup_gemm"] = f"{type(e).__name__}: {e}"[:300]

    # --- table profiling, scale mode: HLL NDV (single pass, no Expand)
    # — the exact multi-distinct variant is the oracle row; this is the
    # form a 100 TB ingest-validation pass runs (13× faster at sf0.1)
    try:
        from atlas_upscaling_dask_spark.operators.profile import profile_columns
        from atlas_upscaling_dask_spark.tables import load_table as _lt4

        li_prof = _lt4(spark, SF_DIR, "lineitem")
        timed(
            "profile_lineitem_approx",
            lambda: force(profile_columns(li_prof, approx=True)),
        )
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["profile_lineitem_approx"] = f"{type(e).__name__}: {e}"[:300]

    # --- brute-force ANN, scale backend: the partial-top-k GEMM kernel
    # (vs the oracle-bitwise fold variant timed as embed_topk above)
    try:
        from atlas_upscaling_dask_spark.extensions.similarity import (
            brute_force_topk_blas,
        )
        from atlas_upscaling_dask_spark.tables import load_table as _lt3

        emb_b = _lt3(spark, SF_DIR, "embeddings")
        qb = emb_b.filter(F.col("vec_id") < 10)
        timed(
            "embed_topk_blas",
            lambda: force(brute_force_topk_blas(qb, emb_b, k=5)),
        )
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["embed_topk_blas"] = f"{type(e).__name__}: {e}"[:300]

    # --- persisted-index IVFADC: build once (untimed), then time the
    # partition-pruned probe+ADC query — the number a production user
    # sees per search batch once the corpus is indexed.
    try:
        import shutil as _sh
        import tempfile as _tf

        from atlas_upscaling_dask_spark.extensions.similarity import (
            build_ivf_index,
            ivf_pq_index_topk,
        )
        from atlas_upscaling_dask_spark.tables import load_table as _lt2

        emb = _lt2(spark, SF_DIR, "embeddings")
        idx_dir = _tf.mkdtemp(prefix="bench_ivfpq_")
        try:
            build_ivf_index(emb, idx_dir, n_centroids=16, pq=True)
            q16 = emb.filter(F.col("vec_id") < 16)
            timed(
                "embed_ivf_pq_index",
                lambda: force(ivf_pq_index_topk(spark, idx_dir, q16, k=5, n_probe=4)),
            )
        finally:
            _sh.rmtree(idx_dir, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["embed_ivf_pq_index"] = f"{type(e).__name__}: {e}"[:300]

    # --- BPE trainer throughput (VERDICT r3 "Next round #8"): the
    # sequential 10-merge baseline rate vs a production-shaped 256-merge
    # batched run (non-conflicting merges, one corpus pass per batch of
    # 64).  The contract: 256 batched merges land well inside 2× of
    # (10-merge time × 25.6) — batching cuts the driver-round count
    # ~64×, so the ratio is typically ≪ 1.
    try:
        from atlas_upscaling_dask_spark.extensions.bpe import (
            bpe_train,
            bpe_train_batched,
        )
        from atlas_upscaling_dask_spark.tables import load_table as _lt

        docs_bpe = _lt(spark, SF_DIR, "documents")
        timed("bpe_train10", lambda: bpe_train(docs_bpe, n_merges=10))
        bpe_res: dict[str, object] = {}

        def _bpe256() -> None:
            m256, _ = bpe_train_batched(docs_bpe, n_merges=256, max_batch=64)
            bpe_res["m"] = m256

        timed("bpe_train256_batched", _bpe256)
        payload_bpe_merges = len(bpe_res["m"]) if "m" in bpe_res else None
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["bpe_train"] = f"{type(e).__name__}: {e}"[:300]
        payload_bpe_merges = None

    # MinHash-LSH with the dictionary-free xxhash backend (the scale path).
    try:
        from atlas_upscaling_dask_spark.extensions.dedup import minhash_lsh_pairs
        from atlas_upscaling_dask_spark.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        timed(
            "dedup_minhash_lsh",
            lambda: force(minhash_lsh_pairs(docs, use_dictionary=False)),
        )
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["dedup_minhash_lsh"] = f"{type(e).__name__}: {e}"[:300]

    # JSONL ingest (VERDICT r4 "Next round #7"): size-targeted shard
    # export once (setup), then the timed path = schema-pinned scan +
    # corrupt-record split, both halves forced — the crawl-dump ingest
    # shape.  Uncompressed shards so the scan keeps line-level split
    # parallelism (the scale path; gzip is the cold-archive trade).
    try:
        import shutil as _sh2
        import tempfile as _tf2

        from atlas_upscaling_dask_spark.sources.jsonl import (
            DOCUMENTS_DDL,
            export_jsonl,
            read_jsonl,
            split_corrupt,
        )
        from atlas_upscaling_dask_spark.tables import load_table as _lt3

        jdir = _tf2.mkdtemp(prefix="bench_jsonl_")
        try:
            export_jsonl(
                _lt3(spark, SF_DIR, "documents"),
                jdir,
                target_shard_mb=1,
                compression=None,
            )

            def jsonl_ingest() -> None:
                clean, quar = split_corrupt(
                    read_jsonl(spark, jdir, DOCUMENTS_DDL)
                )
                force(clean)
                force(quar)

            timed("jsonl_ingest", jsonl_ingest)
        finally:
            _sh2.rmtree(jdir, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["jsonl_ingest"] = f"{type(e).__name__}: {e}"[:300]

    # MHD raw-volume INPUT boundary at the reference's real shape —
    # the file the reference's own pipeline starts from
    # (upscale_streaming.py:23-57): 308 MB little-endian uint32 raw,
    # scanned by the one-wave z-contiguous range-read path.
    try:
        import shutil as _sh4
        import tempfile as _tf4

        import numpy as _np4

        from atlas_upscaling_dask_spark.sources.mhd import read_mhd_chunks

        mdir = _tf4.mkdtemp(prefix="bench_mhd_")
        try:
            vol = (
                _np4.arange(456 * 320 * 528, dtype="<u4") % 997
            ).reshape(456, 320, 528)
            with open(os.path.join(mdir, "vol.raw"), "wb") as fh:
                fh.write(vol.tobytes())
            del vol
            with open(os.path.join(mdir, "vol.mhd"), "w") as fh:
                fh.write(
                    "ObjectType = Image\nNDims = 3\n"
                    "DimSize = 528 320 456\n"
                    "ElementSpacing = 25.0 25.0 25.0\n"
                    "ElementType = MET_UINT\n"
                    "ByteOrderMSB = False\n"
                    "ElementDataFile = vol.raw\n"
                )

            def mhd_scan() -> None:
                chunks, _hdr = read_mhd_chunks(
                    spark, os.path.join(mdir, "vol.mhd"), chunk=(57, 80, 132)
                )
                force(chunks)

            timed("mhd_scan", mhd_scan, runs=2)
        finally:
            _sh4.rmtree(mdir, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["mhd_scan"] = f"{type(e).__name__}: {e}"[:300]

    # OME-Zarr format boundary at the reference's real volume shape:
    # executor-parallel chunk-file export, then the distributed scan.
    try:
        import shutil as _sh3
        import tempfile as _tf3

        from atlas_upscaling_dask_spark.sinks.ome_zarr import (
            scan_ome_zarr,
            write_ome_zarr,
        )

        zmeta = VolumeMeta(456, 320, 528)
        zchunks = synthetic_chunks(spark, zmeta, chunk=(57, 80, 132))
        zdir = _tf3.mkdtemp(prefix="bench_zarr_")
        zpath = os.path.join(zdir, "vol.zarr")
        try:
            timed(
                "zarr_export",
                lambda: write_ome_zarr(zchunks, zpath, zmeta),
                runs=2,
            )
            timed(
                "zarr_scan",
                lambda: force(scan_ome_zarr(spark, zpath, 0)),
                runs=2,
            )
            # the throughput dial: numcodecs-parity zstd-1 chunks
            # (measured 2.5 GB/s/core encode vs zlib-1's 0.53 at
            # BETTER ratio on label payloads)
            zpath2 = os.path.join(zdir, "vol_zstd.zarr")
            timed(
                "zarr_export_zstd",
                lambda: write_ome_zarr(zchunks, zpath2, zmeta, compressor="zstd"),
                runs=2,
            )
            # regression canary for the split-layout Blosc-lz4 WRITE
            # path (reference `--compressor lz4`).  The block codec is
            # pyarrow's C lz4_raw when present (from-spec pure Python
            # otherwise — cross-decode-tested), so this row runs at
            # ~zstd-row parity (~2.3 s isolated at the 308 MB shape;
            # the pure-NumPy bitshuffle filter, shared with zstd, now
            # dominates).  Budget: within ~2x of zarr_export_zstd; see
            # SCALE.md
            zpath_lz4 = os.path.join(zdir, "vol_lz4.zarr")
            timed(
                "zarr_export_lz4",
                lambda: write_ome_zarr(
                    zchunks, zpath_lz4, zmeta, compressor="blosc-lz4", clevel=5
                ),
            )
            # Zarr v3 + sharding_indexed (OME-NGFF 0.5): 4x4x4-chunk
            # shards cut the object count 64x; export pays its one
            # shard-grouping exchange, scan reads shard indexes
            from atlas_upscaling_dask_spark.sinks.zarr3 import (
                scan_zarr3,
                write_zarr3,
            )

            zpath3 = os.path.join(zdir, "vol3.zarr")
            timed(
                "zarr3_shard_export",
                lambda: write_zarr3(zchunks, zpath3, zmeta, shard=(4, 4, 4)),
                runs=2,
            )
            timed(
                "zarr3_shard_scan",
                lambda: force(scan_zarr3(spark, zpath3, 0)),
                runs=2,
            )
            # Zarr v3 at 4x volume (2.46 GB logical, 1024 chunks, 128
            # shards): shard assembly must stay one-shard-in-memory at
            # 8x the shard count, rates within 2x of the per-GB v2
            # rows (r6 verdict #7)
            from atlas_upscaling_dask_spark.sinks.zarr3 import update_zarr3

            zmeta4 = VolumeMeta(912, 640, 1056)
            # NOTE: the input volume is deliberately NOT cached — a
            # block-manager cache of 2.46 GB of binary chunk rows made
            # the export 6x SLOWER (42 s vs 6.5 s measured; cache
            # serialization dominates large-binary rows).  The row
            # includes ~1 s of synthetic generation per run, like
            # zarr_export always has.
            zchunks4 = synthetic_chunks(spark, zmeta4, chunk=(57, 80, 132))
            zpath34 = os.path.join(zdir, "vol3_4x.zarr")
            # 3 samples, not 2: the first sample after the preceding
            # rows reliably absorbs 3-4 s of GC/page-cache debt
            # (isolated probe: [8.78, 5.79, 5.08, 5.21] — the floor
            # only appears from the second sample on), so a 2-run min
            # over-reports the operator by ~15%
            timed(
                "zarr3_4x_shard_export",
                lambda: write_zarr3(zchunks4, zpath34, zmeta4, shard=(2, 2, 2)),
                runs=3,
            )
            timed(
                "zarr3_4x_shard_scan",
                lambda: force(scan_zarr3(spark, zpath34, 0)),
                runs=2,
            )
            # incremental maintenance against that 2.46 GB store: a
            # ONE-chunk delta rewrites one 19 MB shard — the time must
            # track the delta, not the store (r6 verdict #6).  The
            # delta is generated directly at chunk size (a filter over
            # the full synthetic volume would re-generate 2.46 GB just
            # to discard it and measure the generator, not the update).
            delta = synthetic_chunks(
                spark, VolumeMeta(57, 80, 132), chunk=(57, 80, 132)
            )
            timed(
                "zarr3_update_small_delta",
                lambda: update_zarr3(delta, zpath34, 0),
                runs=2,
            )
        finally:
            _sh3.rmtree(zdir, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["zarr_export"] = f"{type(e).__name__}: {e}"[:300]

    probe_after: list[float] | None = None
    try:
        probe_after = noise_probe()
    except Exception as e:  # noqa: BLE001 — harness guard by design
        errors["noise_probe_after"] = f"{type(e).__name__}: {e}"[:300]

    total = round(sum(timings.values()), 3)
    sf = 0.1
    if "sf0.01" in SF_DIR:
        sf = 0.01
    elif "sf0.001" in SF_DIR:
        sf = 0.001
    payload = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if "bulk_upscale2" in timings:
        payload["bulk_gb_per_sec"] = round(out_gb / timings["bulk_upscale2"], 3)
    if "bulk_upscale2_4x" in timings:
        payload["bulk4x_gb_per_sec"] = round(
            out4x_gb / timings["bulk_upscale2_4x"], 3
        )
    if "bulk_upscale15" in timings:
        payload["bulk15_gb_per_sec"] = round(out15_gb / timings["bulk_upscale15"], 3)
    if "bulk_upscale15_write" in timings:
        payload["bulk15_write_gb_per_sec"] = round(
            out15_gb / timings["bulk_upscale15_write"], 3
        )
    if payload_bpe_merges is not None:
        payload["bpe256_merges"] = payload_bpe_merges
    if errors:
        payload["errors"] = errors
    # Per-row historical floor (r8 verdict #7, made MONOTONE per r10
    # verdict #1): min over driver rounds (BENCH_r*.json) + the
    # committed sidecar, folding each record's own best_known so the
    # floor can never rise on identical code.  This is the
    # adjudication key for host noise: a row above its best_known on
    # identical code is noise until the floor itself moves.
    here = os.path.dirname(os.path.abspath(__file__))
    best_known = load_best_known(here, sf)
    payload["best_known"] = {
        k: best_known[k] for k in sorted(timings) if k in best_known
    }
    if _FLOOR_RESETS:
        # marks this record as post-reset for the named rows, so its
        # own timings fold into the restarted floor history while
        # pre-reset records stay excluded (see _FLOOR_RESETS)
        payload["floor_resets"] = dict(_FLOOR_RESETS)
    # Noise window DERIVED from per-row floors over THIS run's row set
    # (r10 verdict #2: the old hardcoded [99.6, 115.7] total predated
    # suite growth and went stale the moment a row was added).  The
    # floor total is the calm-host bound; the observed total is read
    # against it.
    floor_rows = [k for k in timings if k in best_known]
    payload["noise_window"] = {
        "best_known_total_sec": round(
            sum(best_known[k] for k in floor_rows), 3
        ),
        "rows_with_floor": len(floor_rows),
        "rows_total": len(timings),
        "note": (
            "sum of committed per-row floors over this run's row set; "
            "derived each run, replaces the fixed 2026-08-15 window"
        ),
    }
    # The probe verdict (r9 #3): identical-workload floors before/after
    # the suite, adjudicated against the committed best_known of the
    # same workload.  noise_inflated=True means read this round's total
    # against best_known, not at face value — the host was contended
    # even in the probe's best window.
    probe: dict[str, object] = {
        "workload": (
            "upscale_chunks x15 (114,160,176) zstd — identical to the "
            "bulk_upscale15 row; warm pass + 4 samples, per-sample GC"
        ),
        "samples_before": probe_before,
        "samples_after": probe_after,
    }
    floors = [min(s) for s in (probe_before, probe_after) if s]
    if floors:
        probe["probe_floor_before"] = min(probe_before) if probe_before else None
        probe["probe_floor_after"] = min(probe_after) if probe_after else None
        probe["floor"] = round(min(floors), 3)
    probe_ref = best_known.get("bulk_upscale15")
    if probe_ref is not None:
        probe["best_known_floor"] = probe_ref
        if "floor" in probe:
            probe["noise_inflated"] = bool(
                float(probe["floor"]) > 1.25 * probe_ref
            )
    payload["noise_probe"] = probe
    # Full payload (incl. per-run spread for every row) goes to a
    # committed sidecar; the stdout line stays compact (best-of per
    # query + headline rates — the shape that parsed in r1-r5).  r6's
    # spread-bearing stdout line outgrew the driver's tail-capture
    # window and the round's official bench record came back
    # "parsed": null (r6 verdict, What's wrong #1).
    full = dict(payload)
    if spread:
        full["spread"] = spread
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
        )
        with open(sidecar, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as e:  # read-only checkout must not kill the line
        payload.setdefault("errors", {})["sidecar"] = str(e)[:120]
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
