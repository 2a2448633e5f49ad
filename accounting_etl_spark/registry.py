"""Aggregated query registry — the engine's declared surface.

``__spark_entry__.py`` re-exports this for the driver; tools and tests
iterate it. Modules register themselves here as they land.
"""

from __future__ import annotations

from .queries import Q
from .queries import (
    analytics,
    arrays,
    events,
    multimodal,
    reference_pipeline,
    relational,
    similarity,
    text,
    tpch_like,
    windows,
)


def all_queries() -> dict[str, Q]:
    out: dict[str, Q] = {}
    for mod in (
        relational,
        analytics,
        arrays,
        windows,
        events,
        text,
        similarity,
        multimodal,
        reference_pipeline,
        tpch_like,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(mod.QUERIES)
    return out
