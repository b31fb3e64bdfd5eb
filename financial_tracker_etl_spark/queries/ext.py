"""[EXT] LLM-data-pipeline queries (SURVEY.md §2.K X1-X4)."""

from __future__ import annotations

from . import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
