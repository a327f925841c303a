"""JSONL ingest: quarantine semantics and round-trip fidelity."""

from __future__ import annotations


def test_jsonl_corrupt_line_quarantine(spark, tmp_path):
    # A crawl dump with a truncated line: PERMISSIVE + quarantine keeps
    # the job alive AND the bad line countable — neither FAILFAST's
    # job kill nor a silent drop.
    from atlas_upscaling_dask_spark.sources.jsonl import read_jsonl, split_corrupt

    p = tmp_path / "dump"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        '{"doc_id": 2, "text": "truncat\n'
        '{"doc_id": 3, "text": "ok three"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id long, text string")
    clean, quar = split_corrupt(df)
    assert sorted((r["doc_id"], r["text"]) for r in clean.collect()) == [
        (1, "ok one"),
        (3, "ok three"),
    ]
    bad = quar.collect()
    assert len(bad) == 1 and bad[0]["raw_line"].startswith('{"doc_id": 2')


def test_jsonl_roundtrip_preserves_hostile_text(spark, tmp_path):
    # Newlines, tabs, quotes, backslashes, non-BMP unicode: the writer
    # must escape and the reader must restore, codepoint-for-codepoint.
    from atlas_upscaling_dask_spark.sources.jsonl import (
        read_jsonl,
        split_corrupt,
        write_jsonl,
    )

    rows = [
        (1, 'line one\nline two\t"quoted" \\backslash\\'),
        (2, "emoji \U0001f600 and CJK 漢字"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "rt")
    write_jsonl(df, out)
    back, quar = split_corrupt(
        read_jsonl(spark, out, "doc_id long, text string")
    )
    assert quar.isEmpty()
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)


def test_jsonl_failfast_mode_raises(spark, tmp_path):
    import pytest

    from atlas_upscaling_dask_spark.sources.jsonl import read_jsonl

    p = tmp_path / "dump2"
    p.mkdir()
    (p / "a.json").write_text('{"doc_id": 1}\nnot json at all\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), "doc_id long", mode="FAILFAST").collect()


def test_jsonl_blank_lines_are_neither_clean_nor_quarantined(spark, tmp_path):
    # Crawl dumps routinely contain blank/whitespace-only lines; the
    # native JSON reader skips them, and so must we — previously each
    # became an all-NULL "clean" row (NULL corrupt column), silently
    # injecting phantom documents into the clean frame.
    from atlas_upscaling_dask_spark.sources.jsonl import read_jsonl, split_corrupt

    p = tmp_path / "dump"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "one"}\n'
        "\n"
        "   \n"
        "\t\n"
        '{"doc_id": 2, "text": "two"}\n'
        "not json\n"
        "\n"
    )
    clean, quar = split_corrupt(
        read_jsonl(spark, str(p), "doc_id long, text string")
    )
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    bad = [r["raw_line"] for r in quar.collect()]
    assert bad == ["not json"]
