"""Relational surface tests (Q1-Q8 semantics from the reference scripts)."""

import pytest
from pyspark.sql import functions as F

from atlas_upscaling_dask_spark.operators.relational import (
    ancestor_closure,
    decode_labels,
    head_and_count,
    lookup_region_at,
    parent_join,
    point_lookup,
    region_filter,
    synthetic_regions,
)
from atlas_upscaling_dask_spark.volume import synthetic_voxels


@pytest.fixture(scope="module")
def vox(spark):
    return synthetic_voxels(spark).cache()


@pytest.fixture(scope="module")
def regions(spark):
    return synthetic_regions(spark).cache()


def test_point_lookup_single_row(vox):
    # Q1 — arr[z,y,x] (load_test.py:9)
    rows = point_lookup(vox, 4, 4, 4).collect()
    assert len(rows) == 1 and rows[0]["label"] == 15585


def test_point_lookup_out_of_volume(vox):
    assert point_lookup(vox, 99, 0, 0).isEmpty()


def test_region_filter(regions):
    # Q2 — equality filter (lookup_by_id.py:31)
    rows = region_filter(regions, 15564).collect()
    assert len(rows) == 1 and rows[0]["region_name"] == "region 15564"


def test_region_filter_missing(regions):
    # Q3 — missing-key handling (lookup_by_id.py:32-33)
    assert region_filter(regions, 99999).isEmpty()


def test_decode_labels_left_join(vox, regions, spark):
    # Q4 — every voxel row survives; labels missing from regions decode
    # to 'Unknown' (lookup_test2.py:25-26 semantics)
    decoded = decode_labels(vox, regions)
    assert decoded.count() == 4096
    # inject a voxel whose label is not in the ontology
    alien = spark.createDataFrame([(0, 0, 0, 424242)], "z long, y long, x long, label long")
    d = decode_labels(alien, regions).first()
    assert d["region_name"] == "Unknown" and d["region_abbr"] == "?"


def test_lookup_region_at_golden(vox, regions):
    # golden chain mirroring (100,200,200)→15857→'putamen'
    # (lookup_test2.py:31-32) on the fixture: (4,4,4)→15585→'region 15585'
    row = lookup_region_at(vox, regions, 4, 4, 4).first()
    assert row["label"] == 15585 and row["region_name"] == "region 15585"


def test_parent_join(regions):
    # Q6 — one-level hierarchy
    rows = {r["region"]: r for r in parent_join(regions).collect()}
    assert rows[15564]["parent_name"] == "mid node 0"
    assert rows[15540]["parent_name"] == "mouse"
    assert rows[15500]["parent_name"] is None  # root's parent (0) not a row


def test_ancestor_closure_depths(regions):
    # leaf → mid → root resolves within depth 2; level strictly decreases
    clo = ancestor_closure(regions)
    leaf = clo.filter(F.col("region") == 15564).orderBy("depth").collect()
    assert [(r["ancestor"], r["depth"]) for r in leaf] == [(15540, 1), (15500, 2)]
    assert clo.agg(F.max("depth")).first()[0] == 2


def test_head_and_count(regions):
    # Q7 — head + count (lookup_test.py:13-14; golden count analog)
    head, n = head_and_count(regions)
    assert len(head) == 5 and n == 79
