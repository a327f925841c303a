"""atlas-spark CLI — the plan-then-execute pipeline entry point.

Mirrors the reference's CLIs: ``upscale.py:26-31`` (basic: input/output/
scale) and ``upscale_streaming_enhance.py:274-366`` (enhanced: chunking,
compressor, outline, pyramid, dry-run, guards), driving the Spark-first
operators instead of a Dask graph.

Also ships the interactive region-lookup REPL (Q8,
``lookup_by_id.py:17-38``): numeric-ID validation, exit commands,
"Unknown region ID" handling.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="atlas-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    up = sub.add_parser("upscale", help="nearest-neighbor upscale a volume table")
    up.add_argument("--input", required=True, help="parquet chunk table or 'synthetic'")
    up.add_argument("--output", required=True)
    up.add_argument("--scale", type=int, default=2)
    up.add_argument("--shape", type=int, nargs=3, default=(16, 16, 16), metavar=("Z", "Y", "X"))
    up.add_argument("--chunk-mb", type=int, default=8)
    up.add_argument("--compressor", choices=["zstd", "lz4", "none"], default="zstd")
    up.add_argument("--outline", action="store_true", help="keep only region boundaries")
    up.add_argument(
        "--wrap", action="store_true",
        help="torus outline neighbors (reference da.roll bug-compat)",
    )
    up.add_argument("--pyramid-levels", type=int, default=1)
    up.add_argument("--max-gb", type=float, default=None)
    up.add_argument("--dry-run", action="store_true")
    up.add_argument("--force", action="store_true")

    lk = sub.add_parser("lookup", help="interactive region-ID lookup REPL")
    lk.add_argument("--regions-csv", default=None)

    pl = sub.add_parser(
        "pipeline", help="document-prep pipeline: enrich, dedup, filter, write"
    )
    pl.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    pl.add_argument("--output", required=True)
    pl.add_argument("--min-quality", type=float, default=0.5)
    pl.add_argument(
        "--keep-duplicates",
        action="store_true",
        help="keep non-canonical exact duplicates instead of dropping them",
    )

    cr = sub.add_parser(
        "crawl",
        help="crawl ingestion: WARC archives -> extracted pages "
        "(parse, HTML extract, canonicalize, optional robots gate, "
        "frontier dedup vs the seen-URL ledger)",
    )
    cr.add_argument(
        "--input", required=True,
        help="parquet of WARC archives (media_id long, payload binary)",
    )
    cr.add_argument("--output", required=True, help="pages parquet dir")
    cr.add_argument(
        "--ledger", required=True,
        help="bucket-partitioned seen-URL ledger dir (created if absent)",
    )
    cr.add_argument(
        "--robots", default=None,
        help="optional parquet of (host, robots_txt) rows to gate URLs",
    )
    cr.add_argument("--agent", default="*", help="robots user-agent token")
    cr.add_argument(
        "--epoch", type=int, default=0,
        help="ingestion epoch id (replays of an epoch are idempotent)",
    )

    rg = sub.add_parser(
        "rag", help="RAG-corpus prep: gate, dedup, LM screen, chunk, split"
    )
    rg.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    rg.add_argument("--output", required=True)
    rg.add_argument("--max-tokens", type=int, default=64)
    rg.add_argument("--overlap", type=int, default=16)

    zr = sub.add_parser(
        "export-zarr",
        help="write a chunk table as an OME-Zarr store (v2 = the "
        "reference pipeline's format; v3 adds sharding)",
    )
    zr.add_argument("--input", required=True, help="parquet chunk table or 'synthetic'")
    zr.add_argument("--output", required=True, help="store directory (.zarr)")
    zr.add_argument("--format", choices=["v2", "v3"], default="v2")
    zr.add_argument(
        "--compressor",
        choices=["zlib", "zstd", "blosc", "blosc-lz4", "none"],
        default=None,
        help="v2 chunk codec (blosc / blosc-lz4 = the reference "
        "pipeline's two choices, zstd or lz4 with BITSHUFFLE); "
        "v3 accepts zstd/none.  Default: zlib for v2, zstd for v3",
    )
    zr.add_argument("--clevel", type=int, default=1)
    zr.add_argument(
        "--shard", type=int, nargs=3, default=None, metavar=("SZ", "SY", "SX"),
        help="v3 only: chunks per shard along z/y/x (sharding_indexed)",
    )
    zr.add_argument("--shape", type=int, nargs=3, default=(16, 16, 16), metavar=("Z", "Y", "X"))

    ql = sub.add_parser(
        "quality",
        help="data-quality report: per-column profile, PK/range "
        "constraints, and (with --baseline) distribution drift",
    )
    ql.add_argument("--input", required=True, help="parquet table to audit")
    ql.add_argument(
        "--baseline", default=None,
        help="earlier snapshot (parquet); adds per-column drift",
    )
    ql.add_argument(
        "--key", nargs="+", default=None,
        help="primary-key columns for a uniqueness constraint",
    )
    ql.add_argument(
        "--not-null", nargs="+", default=(), dest="not_null",
        help="columns that must be complete",
    )

    return p


def cmd_upscale(args) -> int:
    from .plans.estimate import AdmissionError, check_admission, plan_upscale
    from .session import get_spark
    from .sinks.writer import write_volume
    from .volume import VolumeMeta, infer_meta, synthetic_chunks
    from .operators.upscale import upscale_chunks

    if args.input == "synthetic":
        meta = VolumeMeta(*args.shape)
        chunks = None
        spark = None
    else:
        # --shape describes only synthetic inputs; a stored chunk table is
        # its own source of truth — planning/admission/sidecar must use
        # the REAL dimensions, or the size guard never trips
        spark = get_spark("atlas-spark-upscale")
        chunks = spark.read.parquet(args.input)
        meta = infer_meta(chunks)
    plan = plan_upscale(
        meta,
        args.scale,
        pyramid_levels=args.pyramid_levels,
        compressor=args.compressor,
        chunk_mb=args.chunk_mb,
    )
    print(plan.describe())
    try:
        check_admission(plan, max_gb=args.max_gb, force=args.force)
    except AdmissionError as exc:
        print(f"REFUSED: {exc}", file=sys.stderr)
        return 2
    if args.dry_run:
        print("dry run — no job submitted")
        return 0

    if args.input == "synthetic":
        spark = get_spark("atlas-spark-upscale")
        chunks = synthetic_chunks(spark, meta, chunk=plan.chunk)

    up_meta = VolumeMeta(
        meta.dim_z * args.scale,
        meta.dim_y * args.scale,
        meta.dim_x * args.scale,
        meta.spacing_z / args.scale,
        meta.spacing_y / args.scale,
        meta.spacing_x / args.scale,
        meta.element_type,
        source=args.input,
    )
    if args.outline or args.pyramid_levels > 1:
        # the enhance composition stays chunk-packed end-to-end
        # (upscale narrow → outline halo exchange → zero-shuffle
        # levels), each pyramid level disk-staged from its predecessor
        from .operators.enhance import write_enhance_pyramid

        codec = None if args.compressor == "none" else args.compressor
        write_enhance_pyramid(
            chunks,
            args.output,
            meta,
            scale=args.scale,
            outline=args.outline,
            levels=args.pyramid_levels,
            wrap=args.wrap,
            codec=codec,
            compressor="none",  # payloads already codec-compressed
        )
    else:
        up = upscale_chunks(chunks, args.scale)
        write_volume(up, args.output, up_meta, scale=args.scale, compressor=args.compressor)
    print(f"wrote {args.output}")
    return 0


def cmd_lookup(args) -> int:
    from .operators.relational import load_regions_csv, synthetic_regions
    from .session import get_spark

    spark = get_spark("atlas-spark-lookup")
    regions = (
        load_regions_csv(spark, args.regions_csv)
        if args.regions_csv
        else synthetic_regions(spark)
    ).cache()
    regions.count()  # resident, like the reference's in-memory CSV
    print("region lookup — enter a numeric region ID, or 'exit'")
    for line in sys.stdin:
        text = line.strip()
        if text.lower() in {"exit", "quit", "q", ""}:
            break
        if not text.isdigit():  # numeric guard (lookup_by_id.py:24-26)
            print("please enter a numeric region ID")
            continue
        rows = regions.filter(F.col("region") == int(text)).collect()
        if not rows:  # missing-key path (lookup_by_id.py:32-33)
            print(f"Unknown region ID: {text}")
            continue
        r = rows[0]
        print(f"{r['region']}: {r['region_name']} ({r['region_abbr']}), level {r['level']}")
    return 0


def cmd_pipeline(args) -> int:
    from pyspark.sql import Observation

    from .extensions.pipeline import doc_pipeline
    from .session import get_spark

    spark = get_spark("atlas-spark-pipeline")
    docs = spark.read.parquet(args.input)
    out = doc_pipeline(docs)
    if not args.keep_duplicates:
        out = out.filter(F.col("is_canonical"))
    out = out.filter(F.col("quality") >= args.min_quality)
    # Observation: metrics ride the write job itself — no second scan
    # of the output (at 100 TB a re-read for a row count is a real job)
    obs = Observation("pipeline_metrics")
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("quality").alias("mean_quality"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    out.write.mode("overwrite").parquet(args.output)
    m = obs.get
    print(
        f"wrote {args.output}: {m['n_docs']} documents, "
        f"{m['total_tokens']} tokens, mean quality {m['mean_quality']:.3f}"
    )
    return 0


def cmd_crawl(args) -> int:
    from .session import get_spark
    from .streaming.ingest import warc_ingest_batch

    spark = get_spark("atlas-spark-crawl")
    archives = spark.read.parquet(args.input)
    rules = None
    if args.robots:
        from .extensions.urls import robots_rules

        rules = robots_rules(
            spark.read.parquet(args.robots), agent=args.agent
        )
    warc_ingest_batch(
        spark, archives, args.epoch, args.ledger, args.output,
        marker_dir=f"{args.ledger}/_markers", robots_rules_df=rules,
    )
    out = f"{args.output}/epoch={args.epoch}"
    n = spark.read.parquet(out).count()
    print(f"wrote {out}: {n} new pages (ledger at {args.ledger})")
    return 0


def cmd_rag(args) -> int:
    from pyspark.sql import Observation

    from .extensions.pipeline import prepare_rag_corpus
    from .session import get_spark

    spark = get_spark("atlas-spark-rag")
    docs = spark.read.parquet(args.input)
    out = prepare_rag_corpus(
        docs, max_tokens=args.max_tokens, overlap=args.overlap
    )
    obs = Observation("rag_metrics")
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("lm_score").alias("mean_lm_score"),
    )
    # split-partitioned layout: a trainer reads only its split's files
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    m = obs.get
    # an empty corpus (e.g. the LM screen drops everything) yields None for
    # sum/avg — still a successful (empty) write, so report it as such
    n_chunks = m["n_chunks"] or 0
    total_tokens = m["total_tokens"] or 0
    mean_lm = (
        f"{m['mean_lm_score']:.6f}" if m["mean_lm_score"] is not None else "n/a"
    )
    print(
        f"wrote {args.output}: {n_chunks} chunks, "
        f"{total_tokens} tokens, mean LM score {mean_lm}"
    )
    return 0


def cmd_quality(args) -> int:
    from pyspark.sql import types as T

    from .operators.profile import check_constraints, profile_columns, profile_drift
    from .session import get_spark

    spark = get_spark("atlas-spark-quality")
    df = spark.read.parquet(args.input)

    # profile only the types the profiler supports — an ordinary DATE
    # or BOOLEAN column must not crash the whole report
    profilable = [
        f.name
        for f in df.schema.fields
        if isinstance(
            f.dataType,
            (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
             T.FloatType, T.DoubleType, T.DecimalType, T.StringType,
             T.TimestampType, T.TimestampNTZType),
        )
    ]
    skipped = [c for c in df.columns if c not in profilable]
    prof = profile_columns(df, profilable).collect()  # |cols| rows
    print(f"profile of {args.input} ({len(prof)} columns):")
    if skipped:
        print(f"  (skipped unsupported types: {', '.join(skipped)})")
    for r in prof:
        rng = (
            f"[{r['min_numeric']}, {r['max_numeric']}]"
            if r["min_numeric"] is not None
            else f"[{r['min_string']!r}, {r['max_string']!r}]"
        )
        print(
            f"  {r['column']}: rows={r['n_rows']} nulls={r['n_nulls']} "
            f"ndv={r['n_distinct']} range={rng}"
        )

    constraints = [{"kind": "not_null", "col": c} for c in args.not_null]
    if args.key:
        constraints.append({"kind": "unique", "cols": list(args.key)})
    failed = 0
    if constraints:
        print("constraints:")
        for r in check_constraints(df, constraints).collect():
            status = "PASS" if r["passed"] else "FAIL"
            failed += 0 if r["passed"] else 1
            print(
                f"  {status} {r['constraint']}: "
                f"{r['n_violations']}/{r['n_rows']} violations"
            )

    if args.baseline:
        base = spark.read.parquet(args.baseline)
        shared = [f for f in df.schema.fields if f.name in set(base.columns)]
        nums = [
            f.name for f in shared
            if isinstance(f.dataType, (T.IntegerType, T.LongType,
                                       T.FloatType, T.DoubleType,
                                       T.DecimalType))
        ]
        cats = [
            f.name for f in shared if isinstance(f.dataType, T.StringType)
        ]
        if nums or cats:
            print(f"drift vs {args.baseline} (total-variation, 0..1):")
            for r in sorted(
                profile_drift(base, df, nums, cats).collect(),
                key=lambda r: -(r["tv"] if r["tv"] is not None else 2),
            ):
                tv = "n/a" if r["tv"] is None else f"{r['tv']:.4f}"
                print(f"  {r['column']}: {tv}")

    return 1 if failed else 0


def cmd_export_zarr(args) -> int:
    from .session import get_spark
    from .volume import VolumeMeta, infer_meta, synthetic_chunks

    spark = get_spark("atlas-spark-export-zarr")
    if args.input == "synthetic":
        meta = VolumeMeta(*args.shape)
        chunks = synthetic_chunks(spark, meta)
    else:
        chunks = spark.read.parquet(args.input)
        meta = infer_meta(chunks)

    compressor = args.compressor or ("zlib" if args.format == "v2" else "zstd")
    if args.format == "v2":
        if args.shard is not None:
            print("REFUSED: --shard requires --format v3", file=sys.stderr)
            return 2
        from .sinks.ome_zarr import write_ome_zarr

        receipts = write_ome_zarr(
            chunks, args.output, meta,
            compressor=compressor, clevel=args.clevel,
        )
    else:
        if compressor in ("zlib", "blosc", "blosc-lz4"):
            print(
                f"REFUSED: v3 codec must be zstd or none, got {compressor}",
                file=sys.stderr,
            )
            return 2
        from .sinks.zarr3 import write_zarr3

        receipts = write_zarr3(
            chunks, args.output, meta,
            codec=compressor, clevel=args.clevel,
            shard=tuple(args.shard) if args.shard else None,
        )
    for lvl in sorted(receipts):
        r = receipts[lvl]
        objs = f" objects={r['n_objects']}" if "n_objects" in r else ""
        print(
            f"level {lvl}: chunks={r['n_chunks']} skipped={r['n_skipped']}"
            f" bytes={r['n_bytes']}{objs}"
        )
    print(f"wrote {args.output}")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return {
        "upscale": cmd_upscale,
        "lookup": cmd_lookup,
        "pipeline": cmd_pipeline,
        "crawl": cmd_crawl,
        "rag": cmd_rag,
        "quality": cmd_quality,
        "export-zarr": cmd_export_zarr,
    }[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
