"""Jinja block extraction (C5): locate ``{% docs %}``/``{% macro %}``/
``{% test %}`` spans in raw files by regex (reference
dbt_meshify/storage/jinja_blocks.py:7-72; discovery
dbt_projects.py:317-349)."""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path


@dataclass
class JinjaBlock:
    path: Path
    block_type: str  # docs | macro | test
    name: str
    start: int
    end: int
    content: str

    @staticmethod
    def find(path: Path, block_type: str, name: str) -> "JinjaBlock | None":
        text = path.read_text()
        span = find_block_span(text, block_type, name)
        if span is None:
            return None
        start, end = span
        return JinjaBlock(path, block_type, name, start, end, text[start:end])


def find_block_span(text: str, block_type: str, name: str) -> tuple[int, int] | None:
    """Span of ``{% <type> <name>(...)? %}...{% end<type> %}``, inclusive.

    Macros/tests carry an argument list after the name; docs don't.
    """
    open_re = re.compile(
        r"{%-?\s*" + re.escape(block_type) + r"\s+" + re.escape(name) + r"(\s*\([^)]*\))?\s*-?%}"
    )
    close_re = re.compile(r"{%-?\s*end" + re.escape(block_type) + r"\s*-?%}")
    m = open_re.search(text)
    if not m:
        return None
    c = close_re.search(text, m.end())
    if not c:
        return None
    return m.start(), c.end()


def find_doc_references(text: str) -> set[str]:
    """Names referenced via ``{{ doc('name') }}`` (reference
    jinja_blocks.py:75-79)."""
    return set(re.findall(r"{{\s*doc\s*\(\s*['\"]([\w\-\.]+)['\"]\s*\)\s*}}", text))
