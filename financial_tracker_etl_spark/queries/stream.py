"""Streaming queries (SURVEY.md §2.H ST1-ST7)."""

from __future__ import annotations

from . import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
