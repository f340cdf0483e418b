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

Steady state (post-backlog, COVERAGE.md §rotation): once every oracle has
at least one green row, ``--oldest-green`` switches the slot-fill policy to
a STALENESS cycle — slots go to the oracles whose most recent green
CORRECTNESS row is oldest (ties alphabetical), so the whole corpus gets
re-verified against the live tree roughly every ceil(oracles/slots) ≈ 6
rounds even as plans rebase underneath. Any still-unverified oracle always
sorts first (last_green = 0), so the mode is safe to adopt before debt
hits zero.

Usage: python scripts/rotate_window.py [--slots 39] [--oldest-green]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_rows() -> dict[str, int]:
    """name -> latest round number with a fully-green row."""
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        rnd = int(m.group(1)) if m else 0
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def green_names() -> set[str]:
    return set(_green_rows())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=39)
    ap.add_argument(
        "--oldest-green",
        action="store_true",
        help="steady-state staleness cycle: fill slots with the oracles "
        "whose latest green row is oldest (unverified first)",
    )
    args = ap.parse_args()

    from dbt_meshify_spark.queries import ORACLES, QUERIES

    last_green = _green_rows()
    verified = set(last_green)
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
    if args.oldest_green:
        # the 11 persistent representatives are verified by the window
        # every round already — filling a rotating slot with one would
        # both waste the slot and paste a DUPLICATE name into _WINDOW_EXT
        # (the 50-slot list would dedup to 49 and silently shift slot 50)
        from dbt_meshify_spark.queries import _WINDOW_REL

        by_staleness = sorted(
            (n for n in ORACLES if n not in set(_WINDOW_REL)),
            key=lambda n: (last_green.get(n, 0), n),
        )
        nxt = by_staleness[: args.slots]
        print(f"\nnext _WINDOW_EXT ({len(nxt)} slots, staleness cycle — "
              f"oldest green round first):")
        for n in nxt:
            rnd = last_green.get(n, 0)
            tag = f"r{rnd:02d}" if rnd else "NEVER"
            print(f'    "{n}",  # last green {tag}')
        return 0
    nxt = debt[: args.slots]
    print(f"\nnext _WINDOW_EXT ({len(nxt)} slots; debt after: "
          f"{len(debt) - len(nxt)}):")
    for n in nxt:
        print(f'    "{n}",')
    if len(debt) <= args.slots:
        print("\nbacklog CLEARS this round — switch to --oldest-green for "
              "the steady-state staleness cycle (COVERAGE.md §rotation).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
