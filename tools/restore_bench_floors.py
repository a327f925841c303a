#!/usr/bin/env python
"""One-off floor restoration (r10 verdict, What's wrong #1).

``BENCH_FULL.json`` is overwritten on every bench run, and until
round 11 its own ``best_known`` field was never folded back into the
min — so the committed floor silently drifted UP whenever a run was
slower than history (four rows in round 10).  The true floors still
exist in git history: every prior committed version of
``BENCH_FULL.json`` carries the per-row timings of its run plus the
(then-current) ``best_known``.

This script walks ``git log`` for both ``BENCH_FULL.json`` and the
driver's ``BENCH_r*.json``, folds every historical payload through
``bench.fold_best_known`` (the new monotone fold), and rewrites the
current sidecar's ``best_known`` to the true all-history floor.
After this lands, bench.py's monotone fold keeps it that way.

Usage: python tools/restore_bench_floors.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import fold_best_known  # noqa: E402


def historical_payloads() -> list:
    recs = []
    ls = subprocess.run(
        ["git", "-C", REPO, "log", "--pretty=%H", "--all"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    names = subprocess.run(
        ["git", "-C", REPO, "ls-tree", "-r", "--name-only", "HEAD"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    bench_files = [
        n for n in names if n.startswith("BENCH_") and n.endswith(".json")
    ]
    seen_blobs = set()
    for commit in ls:
        for name in bench_files:
            blob = subprocess.run(
                ["git", "-C", REPO, "rev-parse", f"{commit}:{name}"],
                capture_output=True,
                text=True,
            )
            if blob.returncode != 0:
                continue
            sha = blob.stdout.strip()
            if sha in seen_blobs:
                continue
            seen_blobs.add(sha)
            body = subprocess.run(
                ["git", "-C", REPO, "cat-file", "blob", sha],
                capture_output=True,
                text=True,
            )
            if body.returncode != 0:
                continue
            try:
                recs.append(json.loads(body.stdout))
            except ValueError:
                continue
    return recs


def main() -> None:
    recs = historical_payloads()
    print(f"folded {len(recs)} unique historical bench payloads")
    floors = fold_best_known(recs, sf=0.1)
    sidecar = os.path.join(REPO, "BENCH_FULL.json")
    with open(sidecar) as fh:
        cur = json.load(fh)
    before = cur.get("best_known") or {}
    restored = {
        k: floors[k] for k in sorted(set(before) | set(cur.get("queries", {})))
        if k in floors
    }
    changed = {
        k: (before.get(k), v)
        for k, v in restored.items()
        if before.get(k) != v
    }
    cur["best_known"] = restored
    with open(sidecar, "w") as fh:
        json.dump(cur, fh, indent=1, sort_keys=True)
        fh.write("\n")
    for k, (b, a) in sorted(changed.items()):
        print(f"  {k}: {b} -> {a}")
    print(f"rewrote {len(changed)} floors in BENCH_FULL.json")


if __name__ == "__main__":
    main()
