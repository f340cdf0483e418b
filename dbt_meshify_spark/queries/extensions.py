"""Extension operator queries (SURVEY.md §2.6, north-star additions).

Populated incrementally; see operators/ for the underlying implementations.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
