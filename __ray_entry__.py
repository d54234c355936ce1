"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares against ``oracle_sql()[name]`` via DuckDB (row-count + schema
+ order-insensitive value-hash → CORRECTNESS_r{N}.json).

No ray.init()/ray.shutdown() here or in the library (Ray Data
auto-initialises standalone; only bench.py, the CLI and the test fixture
own a session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001: exact-dedup + quality over the driver
    documents table, and the OSM export (explode → assemble → clip → theme
    route) over the deterministic interleaved corpus; returns the
    per-theme×geomtype feature counts (stable schema, ≥0 rows)."""
    from osm_export_tool_python_ray.pipelines.queries import (
        q_exact_dedup,
        q_export_theme_counts,
    )

    sf_dir = "/root/testdata/sf0.001"
    q_exact_dedup(sf_dir).materialize()  # touch the driver tables
    return q_export_theme_counts(sf_dir).to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from osm_export_tool_python_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from osm_export_tool_python_ray.pipelines.queries import (
        ORACLES,
        export_surface_oracles,
    )

    out = dict(ORACLES)
    out.update(export_surface_oracles())
    return out
