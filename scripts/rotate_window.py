"""Compute the next round's driver-window rotation from the repo state.

The external driver hash-verifies the FIRST 50 ``queries()`` entries each
round (CORRECTNESS_r{N}.json). The rotation discipline (COVERAGE.md
§rotation): 11 persistent relational representatives + 39 slots filled
with the never-externally-verified oracles in alphabetical order,
recomputed fresh each round so late-added oracles slot in by name.

This script derives that list mechanically — green rows are any
CORRECTNESS_r*.json entry with rows+schema+hash all true and no err — and
prints (a) the remaining debt, (b) the ready-to-paste ``_WINDOW_EXT``
block for ``queries/__init__.py``, (c) a staleness check of the CURRENT
window (slots whose oracle already has a green row are wasted bandwidth).

Usage: python scripts/rotate_window.py [--slots 39]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_names() -> set[str]:
    out: set[str] = set()
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                out.add(name)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=39)
    args = ap.parse_args()

    from dbt_meshify_spark.queries import ORACLES, QUERIES

    verified = green_names()
    debt = sorted(n for n in ORACLES if n not in verified)
    window_now = list(QUERIES)[:50]
    stale = [
        n for n in window_now
        if n.startswith("ext_") and n in verified
    ]

    print(f"oracles: {len(ORACLES)}  externally green: "
          f"{len(verified & set(ORACLES))}  debt: {len(debt)}")
    if stale:
        print(f"\nSTALE window slots (already green — rotate these out): "
              f"{stale}")
    nxt = debt[: args.slots]
    print(f"\nnext _WINDOW_EXT ({len(nxt)} slots; debt after: "
          f"{len(debt) - len(nxt)}):")
    for n in nxt:
        print(f'    "{n}",')
    if len(debt) <= args.slots:
        print("\nbacklog CLEARS this round — fill remaining slots with "
              "round promotions or rotate relational coverage.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
