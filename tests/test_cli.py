

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
