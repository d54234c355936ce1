"""Sources: scan providers and mapping→pushdown filter compilers.

The reference's remote sources (Overpass sources.py:187-335, Galaxy
sources.py:338-876, OsmiumTool sources.py:70-184) each compile a Mapping into
an element-level tag filter and then delegate the actual data movement to an
external service/process. In this engine the data movement is a
``ray.data.read_parquet`` scan; the filter-compilation logic is kept (same
output strings, verified by the ported test_sources.py) and reused as the
engine's scan-side predicate pushdown compiler.
"""

from osm_export_tool_python_ray.sources.filters import Overpass, OsmiumTool, Pbf
from osm_export_tool_python_ray.sources.corpus import (
    generate_corpus_table,
    write_corpus_parquet,
    ELEMENT_SCHEMA,
    SPAN_TYPE,
)

__all__ = [
    "Overpass",
    "OsmiumTool",
    "Pbf",
    "generate_corpus_table",
    "write_corpus_parquet",
    "ELEMENT_SCHEMA",
    "SPAN_TYPE",
]
