"""Ray-Data-native data-processing engine with the query/data capabilities
of hotosm/osm-export-tool-python (reference: /root/reference, v2.0.17).

This is NOT a port: the reference streams one OSM element at a time through
pyosmium callbacks into OGR writers (reference tabular.py:251-339); this
engine expresses the same semantics as lazy ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, with explicit shuffles for the
joins that pyosmium hides (node-location resolution, multipolygon assembly).
"""

from enum import Enum
import os

name = "osm_export_tool_python_ray"
__version__ = "0.1.0"


class GeomType(Enum):
    """Logical geometry classes (parity: reference __init__.py:8-11)."""

    POINT = 1
    LINE = 2
    POLYGON = 3


def GetHumanReadable(size, precision=2):
    """Pretty-print a byte count (parity: reference __init__.py:13-19)."""
    suffixes = ["B", "KB", "MB", "GB", "TB"]
    idx = 0
    while size > 1024 and idx < 4:
        idx += 1
        size = size / 1024.0
    return "%.*f%s" % (precision, size, suffixes[idx])


class File:
    """Record of an emitted output file group (parity: reference
    __init__.py:22-47). In this engine a "file" is usually a partitioned
    parquet directory; ``parts`` lists the concrete paths."""

    def __init__(self, output_name, parts, extra=None):
        self.output_name = output_name
        self.parts = list(parts)
        self.extra = {} if extra is None else extra

    @classmethod
    def shp(cls, name, extra=None):
        parts = [name + ext for ext in (".shp", ".shx", ".prj", ".cpg", ".dbf")]
        return cls("shp", parts, extra or {})

    def size(self):
        total = 0
        for part in self.parts:
            if os.path.isdir(part):
                for root, _dirs, fns in os.walk(part):
                    total += sum(os.path.getsize(os.path.join(root, f)) for f in fns)
            elif os.path.exists(part):
                total += os.path.getsize(part)
        return total

    def __str__(self):
        return "{0} {1} {2} {3}".format(
            self.output_name, self.extra, ",".join(self.parts), GetHumanReadable(self.size())
        )

    __repr__ = __str__


def make_filename(s):
    """Layer/file name normalizer (parity: reference tabular.py:29-30)."""
    return s.lower().replace(" ", "_")
