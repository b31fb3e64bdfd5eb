"""Large-scale analytics queries over the raw testdata tables.

These exercise the engine breadth beyond the reference's operator rows:
multi-way joins, grouped aggregation, top-k — the shapes a 100 TB
warehouse actually runs. Money sums go through DECIMAL so results are
exact and cross-engine deterministic, then surface as DOUBLE.
"""

from __future__ import annotations

from . import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
