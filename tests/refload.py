"""Shared single-load helpers for the differential tests.

The reference sql.py sets a parse action on pyparsing's GLOBAL
``quotedString`` singleton at import (reference sql.py:20). Loading the
module more than once makes the singleton's action visible to the
`quotedString()` copy taken at line 10 of the SECOND load — changing the
reference's own behavior (quoted column names suddenly arrive stripped).
A real deployment imports it once, so the differential baselines must too:
every loader here is cached and the sql module is shared."""

import enum
import importlib.util
import sys
import types

_CACHE = {}


class RefGeomType(enum.Enum):
    POINT = 1
    LINE = 2
    POLYGON = 3


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def ref_sql():
    if "sql" not in _CACHE:
        _CACHE["sql"] = _load("ref_sql", "/root/reference/osm_export_tool/sql.py")
    return _CACHE["sql"]


def _install_pkg_stub():
    sql = ref_sql()
    pkg = types.ModuleType("osm_export_tool")
    pkg.GeomType = RefGeomType
    pkg.sql = sql
    sys.modules["osm_export_tool"] = pkg
    sys.modules["osm_export_tool.sql"] = sql


def ref_mapping():
    if "mapping" not in _CACHE:
        _install_pkg_stub()
        _CACHE["mapping"] = _load(
            "ref_mapping", "/root/reference/osm_export_tool/mapping.py"
        )
    return _CACHE["mapping"]


def ref_sources():
    if "sources" not in _CACHE:
        _install_pkg_stub()
        _stub("requests", post=None, exceptions=types.SimpleNamespace(Timeout=Exception))
        _stub("requests.exceptions", Timeout=Exception)
        shapely = _stub("shapely")
        _stub("shapely.geometry", mapping=lambda g: g)
        shapely.geometry = sys.modules["shapely.geometry"]
        _stub("deepdiff", DeepDiff=lambda *a, **k: {})
        _CACHE["sources"] = _load(
            "ref_sources", "/root/reference/osm_export_tool/sources.py"
        )
    return _CACHE["sources"]
