"""YAML theme mappings (behavioral parity: reference mapping.py:9-105).

A Mapping is the plan-time IR of an export: an ordered list of Themes, each a
(geometry-type mask, selected tag keys, compiled Matcher, extra passthrough).
Compiled once on the driver (or on a small actor pool for many mappings) and
broadcast to map_batches stages by closure capture — never rebuilt per batch.
"""

import yaml

from osm_export_tool_python_ray import GeomType
from osm_export_tool_python_ray.sql import Matcher, ParseError


class InvalidMapping(Exception):
    pass


_GEOM_TYPE_NAMES = ("points", "lines", "polygons")


class Theme:
    def __init__(self, name, d, default_osm_id):
        self.name = name
        self.points = False
        self.lines = False
        self.polygons = False

        if not isinstance(d, dict):
            if isinstance(d, list):
                raise InvalidMapping(
                    "theme {0} must be YAML dict (types: , select:) , not list (- types, - select)".format(name)
                )
            raise InvalidMapping("Theme value must be dict")

        if "types" not in d:
            self.points = True
            self.lines = True
            self.polygons = True
        else:
            for t in d["types"]:
                if t not in _GEOM_TYPE_NAMES:
                    raise InvalidMapping(
                        "types: for theme {0} must be list containing one or more of: points, lines, polygons".format(name)
                    )
            self.points = "points" in d["types"]
            self.lines = "lines" in d["types"]
            self.polygons = "polygons" in d["types"]

        if "select" not in d:
            raise InvalidMapping("missing select: for theme {0}".format(name))
        self.keys = set(d["select"])

        self.osm_id = default_osm_id
        if "osm_id" in self.keys:
            self.osm_id = True
            self.keys.remove("osm_id")

        if "where" in d:
            try:
                if not d["where"]:
                    raise InvalidMapping("where: for theme {0} is invalid".format(name))
                if isinstance(d["where"], list):
                    matcher = Matcher.null()
                    for w in d["where"]:
                        matcher = matcher.union(Matcher.from_sql(w))
                    self.matcher = matcher
                else:
                    self.matcher = Matcher.from_sql(d["where"])
            except ParseError:
                raise InvalidMapping("Invalid SQL: {0}".format(d["where"]))
        else:
            matcher = Matcher.null()
            for key in self.keys:
                matcher = matcher.union(Matcher.any(key))
            self.matcher = matcher

        extra = d.copy()
        for consumed in ("where", "select", "types"):
            extra.pop(consumed, None)
        self.extra = extra

    def matches(self, geom_type, tags):
        if geom_type == GeomType.POINT and not self.points:
            return False
        if geom_type == GeomType.LINE and not self.lines:
            return False
        if geom_type == GeomType.POLYGON and not self.polygons:
            return False
        return self.matcher.matches(tags)

    def geom_type_mask(self):
        """Set of GeomType values this theme accepts (engine-side helper)."""
        out = set()
        if self.points:
            out.add(GeomType.POINT)
        if self.lines:
            out.add(GeomType.LINE)
        if self.polygons:
            out.add(GeomType.POLYGON)
        return out

    def __repr__(self):
        return self.name


class Mapping:
    def __init__(self, y, default_osm_id=True):
        doc = yaml.safe_load(y)

        if not isinstance(doc, dict):
            raise InvalidMapping("YAML must be dict")

        self.themes = []
        for theme_name, theme_dict in doc.items():
            self.themes.append(Theme(theme_name, theme_dict, default_osm_id=default_osm_id))

    @classmethod
    def validate(cls, y, **kwargs):
        # parity quirk: the reference passes the kwargs dict POSITIONALLY as
        # default_osm_id (reference mapping.py:100-105)
        try:
            return cls(y, kwargs), None
        except (yaml.scanner.ScannerError, yaml.parser.ParserError, InvalidMapping) as se:
            return None, [str(se)]
