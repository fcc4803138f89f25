"""Operator modules. Importing this package populates the query registry."""

from . import (  # noqa: F401
    aggregates,
    analytics,
    engine_surface,
    events_time,
    filters,
    functions,
    joins,
    layout,
    llm,
    pipelines,
    scale_ops,
    scale_rank,
    scans,
    setops,
    sorting,
    udfs,
    windows,
)
