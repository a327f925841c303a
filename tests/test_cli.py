

def test_cli_pipeline(spark, tmp_path, capsys):
    from atlas_upscaling_dask_spark.cli import main

    src = str(tmp_path / "docs_in")
    dst = str(tmp_path / "docs_out")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 8),
            (2, "THE quick brown fox jumps over the lazy dog " * 8),  # dup of 1
            (3, "@@@@ ---- !!!! ???? %%%%"),  # junk, fails quality
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)
    assert main(["pipeline", "--input", src, "--output", dst, "--min-quality", "0.5"]) == 0
    out = spark.read.parquet(dst)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1}  # dup dropped, junk dropped, canonical kept
    assert "1 documents" in capsys.readouterr().out


def test_cli_upscale_enhance_chunkpath(spark, tmp_path):
    # --outline/--pyramid-levels route through the chunk-packed enhance
    # writer: level-partitioned chunk tables + multiscales sidecar.
    import json
    import os

    from atlas_upscaling_dask_spark.cli import main
    from atlas_upscaling_dask_spark.volume import chunks_to_voxels

    out = str(tmp_path / "enh_out")
    rc = main([
        "upscale", "--input", "synthetic", "--output", out,
        "--scale", "2", "--shape", "8", "8", "8",
        "--outline", "--wrap", "--pyramid-levels", "2", "--force",
    ])
    assert rc == 0
    side = json.load(open(os.path.join(out, "_volume_meta.json")))
    assert side["dims_zyx"] == [16, 16, 16] and len(side["multiscales"]) == 2
    lvl0 = spark.read.parquet(os.path.join(out, "level=0"))
    vox = chunks_to_voxels(lvl0.select(
        "volume_id", "cz", "cy", "cx", "z0", "y0", "x0",
        "dz", "dy", "dx", "codec", "payload"))
    # outline of the fixture cube: boundary voxels keep labels, interior 0
    labels = {r["label"] for r in vox.select("label").distinct().collect()}
    assert 0 in labels and len(labels) > 1
    assert vox.count() == 16 * 16 * 16


def test_cli_rag(spark, tmp_path, capsys):
    from atlas_upscaling_dask_spark.cli import main

    src = str(tmp_path / "rag_in")
    dst = str(tmp_path / "rag_out")
    base = "the quick brown fox jumps over the lazy dog and the cat sat on the mat "
    spark.createDataFrame(
        [(i, base * 6) for i in range(6)] + [(9, base * 6)],  # 9 dups of 0
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)
    assert main(
        ["rag", "--input", src, "--output", dst, "--max-tokens", "32", "--overlap", "8"]
    ) == 0
    out = spark.read.parquet(dst)
    rows = out.collect()
    assert rows, "expected chunks"
    # exact dedup: only the canonical doc 0 survives the election
    assert {r["doc_id"] for r in rows} == {0}
    assert all(r["n_tokens"] <= 32 for r in rows)
    # split-partitioned layout on disk
    import os

    assert any(d.startswith("split=") for d in os.listdir(dst))
    assert "chunks" in capsys.readouterr().out


def test_cli_quality(spark, tmp_path, capsys):
    from atlas_upscaling_dask_spark.cli import main

    base = str(tmp_path / "q_base")
    cur = str(tmp_path / "q_cur")
    spark.createDataFrame(
        [(i, float(i % 10), "A" if i % 2 else "B") for i in range(100)],
        "k long, v double, flag string",
    ).write.mode("overwrite").parquet(base)
    # current snapshot: shifted values, a duplicate key, and a NULL flag
    spark.createDataFrame(
        [(i, 9.0, "A") for i in range(99)] + [(0, 9.0, None)],
        "k long, v double, flag string",
    ).write.mode("overwrite").parquet(cur)

    rc = main([
        "quality", "--input", cur, "--baseline", base,
        "--key", "k", "--not-null", "flag",
    ])
    out = capsys.readouterr().out
    assert rc == 1  # failed constraints -> nonzero exit
    assert "FAIL unique(k): 1/100 violations" in out
    assert "FAIL not_null(flag): 1/100 violations" in out
    assert "drift vs" in out and "v: " in out

    # clean table, no baseline -> exit 0
    rc2 = main(["quality", "--input", base, "--key", "k"])
    out2 = capsys.readouterr().out
    assert rc2 == 0 and "PASS unique(k): 0/100 violations" in out2


def test_cli_quality_skips_unsupported_types(spark, tmp_path, capsys):
    import datetime

    from atlas_upscaling_dask_spark.cli import main

    src = str(tmp_path / "q_dates")
    spark.createDataFrame(
        [(1, datetime.date(2020, 1, 1), True), (2, datetime.date(2021, 2, 3), False)],
        "k long, d date, flag boolean",
    ).write.mode("overwrite").parquet(src)
    rc = main(["quality", "--input", src, "--key", "k"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "skipped unsupported types: d, flag" in out
    assert "PASS unique(k)" in out


def test_cli_export_zarr_v2_and_v3(spark, tmp_path, capsys):
    import numpy as np

    from atlas_upscaling_dask_spark.cli import main
    from atlas_upscaling_dask_spark.sinks.ome_zarr import read_zarr_level
    from atlas_upscaling_dask_spark.sinks.zarr3 import read_zarr3_level

    out2 = str(tmp_path / "store_v2.zarr")
    rc = main([
        "export-zarr", "--input", "synthetic", "--output", out2,
        "--shape", "8", "8", "8", "--compressor", "blosc", "--clevel", "5",
    ])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    v2 = read_zarr_level(out2, 0)
    assert v2.shape == (8, 8, 8) and v2.any()

    # the reference pipeline's OTHER codec choice: blosc lz4
    outl = str(tmp_path / "store_lz4.zarr")
    rc = main([
        "export-zarr", "--input", "synthetic", "--output", outl,
        "--shape", "8", "8", "8", "--compressor", "blosc-lz4", "--clevel", "5",
    ])
    assert rc == 0
    np.testing.assert_array_equal(read_zarr_level(outl, 0), v2)
    import json as _json
    import os as _os
    za = _json.load(open(_os.path.join(outl, "0", ".zarray")))
    assert za["compressor"]["cname"] == "lz4"

    out3 = str(tmp_path / "store_v3.zarr")
    rc = main([
        "export-zarr", "--input", "synthetic", "--output", out3,
        "--shape", "8", "8", "8", "--format", "v3",
        "--compressor", "zstd", "--shard", "2", "2", "2",
    ])
    assert rc == 0
    np.testing.assert_array_equal(read_zarr3_level(out3, 0), v2)

    # guards: shard needs v3; v3 rejects zlib/blosc
    assert main([
        "export-zarr", "--input", "synthetic", "--output", str(tmp_path / "x"),
        "--shard", "2", "2", "2",
    ]) == 2
    assert main([
        "export-zarr", "--input", "synthetic", "--output", str(tmp_path / "y"),
        "--format", "v3", "--compressor", "blosc",
    ]) == 2
    assert main([
        "export-zarr", "--input", "synthetic", "--output", str(tmp_path / "z"),
        "--format", "v3", "--compressor", "blosc-lz4",
    ]) == 2


def test_cli_crawl(spark, tmp_path, capsys):
    from atlas_upscaling_dask_spark.cli import main
    from atlas_upscaling_dask_spark.sources.warc import encode_warc

    src = str(tmp_path / "archives")
    dst = str(tmp_path / "pages")
    ledger = str(tmp_path / "ledger")
    robots = str(tmp_path / "robots")

    def page(key, d):
        return {
            "type": "response", "status": 200,
            "uri": f"http://h{key % 2}.example.com/p/{key}?utm_s={d}#x",
            "payload": f"<html><title>T{key}</title><p>b{key}</p></html>".encode(),
        }

    spark.createDataFrame(
        [(1, bytearray(encode_warc([page(0, 1), page(1, 2), page(0, 3)],
                                   gzip_per_record=True)))],
        "media_id long, payload binary",
    ).write.parquet(src)
    spark.createDataFrame(
        [("h1.example.com", "User-agent: *\nDisallow: /p\n")],
        "host string, robots_txt string",
    ).write.parquet(robots)

    rc = main(["crawl", "--input", src, "--output", dst, "--ledger", ledger,
               "--robots", robots, "--epoch", "0"])
    assert rc == 0
    got = spark.read.parquet(f"{dst}/epoch=0").collect()
    # key 0 dedups to one page, key 1 is robots-blocked on h1
    assert [r["canonical_url"] for r in got] == ["http://h0.example.com/p/0"]
    assert got[0]["title"] == "T0"
    assert "1 new pages" in capsys.readouterr().out

    # epoch 1: key 0 already in the ledger -> nothing new
    src2 = str(tmp_path / "archives2")
    spark.createDataFrame(
        [(2, bytearray(encode_warc([page(0, 9)])))],
        "media_id long, payload binary",
    ).write.parquet(src2)
    rc = main(["crawl", "--input", src2, "--output", dst, "--ledger", ledger,
               "--epoch", "1"])
    assert rc == 0
    assert spark.read.parquet(f"{dst}/epoch=1").count() == 0
