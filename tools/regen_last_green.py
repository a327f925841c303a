#!/usr/bin/env python
"""Regenerate ``suite._LAST_GREEN`` from the committed correctness files.

The driver's correctness gate samples the FIRST 50 of
``suite.ordered_queries()``, which sorts by staleness of driver
evidence.  Each round, after the driver writes ``CORRECTNESS_r0N.json``,
run this to fold the new greens into the map so the next round's
prefix rotates onto the stalest rows:

    python tools/regen_last_green.py          # rewrites suite.py in place
    python tools/regen_last_green.py --check  # exit 1 if suite.py is stale

Green = ``rows_match`` and ``schema_match`` and ``err`` null, exactly
the convention the r7 verdict fixed; a query keeps the HIGHEST round
in which it was green.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUITE = os.path.join(REPO, "atlas_upscaling_dask_spark", "suite.py")


def last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", os.path.basename(f))
        if m is None:
            continue
        rnd = int(m.group(1))
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("err") is None
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def render(last: dict[str, int]) -> str:
    by_round: dict[int, list[str]] = {}
    for n, r in last.items():
        by_round.setdefault(r, []).append(n)
    lines = ["_LAST_GREEN = {"]
    for r in sorted(by_round):
        names = sorted(by_round[r])
        lines.append(f"    # last driver-green in round {r} ({len(names)} rows)")
        body = ", ".join(f'"{n}": {r}' for n in names) + ","
        for w in textwrap.wrap(body, width=75, break_long_words=False):
            lines.append("    " + w)
    lines.append("}")
    return "\n".join(lines)


def main() -> None:
    check = "--check" in sys.argv
    block = render(last_green())
    src = open(SUITE).read()
    start = src.index("_LAST_GREEN = {")
    end = src.index("\n}", start) + 2
    current = src[start:end]
    if current == block:
        print(f"suite.py _LAST_GREEN is current ({len(last_green())} rows)")
        return
    if check:
        print("suite.py _LAST_GREEN is STALE — run tools/regen_last_green.py")
        sys.exit(1)
    open(SUITE, "w").write(src[:start] + block + src[end:])
    print(f"rewrote _LAST_GREEN ({len(last_green())} rows)")


if __name__ == "__main__":
    main()
