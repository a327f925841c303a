"""Pin the bench floor-keeping semantics (r10 verdict, What's wrong #1).

The per-row ``best_known`` floor must be MONOTONE: re-folding history
that includes a prior record's own ``best_known`` field can never
produce a higher floor than that record carried, even when every raw
timing since has been slower (host noise).  Round 10 shipped a fold
that read only the ``queries`` dicts — and because the driver's
``BENCH_r*.json`` files carry ``"parsed": null``, "history" collapsed
to the single previous run and four floors drifted up.
"""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_fold_uses_best_known_not_just_timings():
    """A slower re-run whose record carries the old floor keeps it."""
    old_run = {"sf": 0.1, "queries": {"q1": 1.0, "q2": 5.0}}
    # Sidecar written after old_run: its best_known embeds the floor.
    slower_rerun = {
        "sf": 0.1,
        "queries": {"q1": 4.0, "q2": 9.0},
        "best_known": {"q1": 1.0, "q2": 5.0},
    }
    # The drift scenario: only the slower re-run survives on disk
    # (BENCH_FULL.json overwritten, driver rounds parsed:null).
    floors = bench.fold_best_known([slower_rerun], sf=0.1)
    assert floors == {"q1": 1.0, "q2": 5.0}
    # And with full history present the answer is identical.
    assert bench.fold_best_known([old_run, slower_rerun], sf=0.1) == floors


def test_fold_is_monotone_under_refold():
    """Folding the fold's own output back in is a no-op (idempotent),
    so repeated overwrite cycles can never raise a floor."""
    history = [
        {"sf": 0.1, "queries": {"a": 3.0}},
        {"sf": 0.1, "queries": {"a": 2.0, "b": 7.0}},
    ]
    floors = bench.fold_best_known(history, sf=0.1)
    rewritten = {"sf": 0.1, "queries": {"a": 9.9, "b": 9.9}, "best_known": floors}
    refolded = bench.fold_best_known([rewritten], sf=0.1)
    assert refolded == floors == {"a": 2.0, "b": 7.0}


def test_fold_respects_sf_and_parsed_wrapper():
    records = [
        {"sf": 0.01, "queries": {"a": 0.1}},  # wrong sf — ignored
        {"parsed": {"sf": 0.1, "queries": {"a": 1.5}}},  # driver wrapper
        {"parsed": None, "sf": 0.1, "queries": {"a": 2.5}},  # parsed null
        "not-a-dict",
        {"sf": 0.1, "queries": {"a": "NaN-string", "b": 4}},
    ]
    floors = bench.fold_best_known(records, sf=0.1)
    assert floors == {"a": 1.5, "b": 4.0}


def test_committed_sidecar_floor_covers_r10_drift_rows():
    """The four rows the r10 verdict named as drifted must sit at or
    below their true historical floors in the committed sidecar."""
    import json

    sidecar = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_FULL.json",
    )
    if not os.path.exists(sidecar):
        import pytest

        pytest.skip("no committed sidecar")
    with open(sidecar) as fh:
        best = json.load(fh).get("best_known") or {}
    true_floors = {
        "gif_phash_values": 3.193,
        "zarr3_4x_shard_export": 5.284,
        "bulk_decimate": 0.576,
        "semantic_dedup_gemm": 0.693,
    }
    for row, ceiling in true_floors.items():
        assert best.get(row) is not None, row
        assert best[row] <= ceiling + 1e-9, (row, best[row], ceiling)


def test_floor_reset_excludes_pre_reset_history():
    """A row named in _FLOOR_RESETS restarts its floor history: records
    without the matching reset marker (pre-semantics-change) are
    excluded for that row ONLY; other rows fold normally."""
    import bench

    assert "pdf_text_extract" in bench._FLOOR_RESETS  # r12 reset
    recs = [
        {"sf": 0.1, "queries": {"pdf_text_extract": 0.65, "other": 1.0}},
        {
            "sf": 0.1,
            "queries": {"pdf_text_extract": 2.4, "other": 1.2},
            "floor_resets": dict(bench._FLOOR_RESETS),
        },
    ]
    folded = bench.fold_best_known(recs, 0.1)
    assert folded["pdf_text_extract"] == 2.4  # old 0.65 excluded
    assert folded["other"] == 1.0  # untouched rows keep full history
    # a STALE reset reason (semantics changed again) also restarts
    recs[1]["floor_resets"] = {"pdf_text_extract": "different reason"}
    assert "pdf_text_extract" not in bench.fold_best_known(recs, 0.1)
