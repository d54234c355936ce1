"""Mapping → element-filter compilers (plan-time).

Parity surfaces (ported tests assert exact output strings):

* ``Overpass.filters`` / ``Overpass.parts`` / ``Overpass.sql`` — reference
  sources.py:188-228. In the reference these build an OverpassQL query body;
  here the same per-element-kind filter sets drive scan pushdown: the union
  of all themes' matchers, widened per geometry kind (polygons imply ways +
  relations), is what a read stage may safely pre-filter on.
* ``OsmiumTool.parts`` / ``filters`` — reference sources.py:89-132; compiles
  to ``osmium tags-filter`` expressions.

Note the deliberate widening semantics: range ops and IS NOT NULL compile to
a key-presence filter (reference sources.py:216-217) — pushdown must be a
superset of the exact matcher, which still runs per row afterwards.
"""

from osm_export_tool_python_ray.sql import to_prefix


class Pbf:
    """Passthrough source (reference sources.py:24-32); in this engine a
    plain path (or list of paths) handed to ``ray.data.read_parquet``."""

    def __init__(self, path):
        self._path = path

    def fetch(self):
        pass

    def path(self):
        return self._path


class Overpass:
    """Filter compilation only; the HTTP client role of the reference class
    is played by the parquet scan."""

    @classmethod
    def filters(cls, mapping):
        """Per-element-kind filter string sets (reference sources.py:189-205).
        Polygon themes contribute to both ways and relations."""
        nodes = set()
        ways = set()
        relations = set()
        for t in mapping.themes:
            parts = cls.parts(t.matcher.expr)
            if t.points:
                nodes.update(parts)
            if t.lines:
                ways.update(parts)
            if t.polygons:
                ways.update(parts)
                relations.update(parts)
        return nodes, ways, relations

    @classmethod
    def parts(cls, expr):
        """Prefix tree → list of OverpassQL tag filters (reference
        sources.py:208-224). Strings are always quoted to survive keys with
        colons; and/or both flatten to a union (widening)."""

        def _parts(prefix):
            op = prefix[0]
            if op == "=":
                return ["['{0}'='{1}']".format(prefix[1], prefix[2])]
            if op == "!=":
                return ["['{0}'!='{1}']".format(prefix[1], prefix[2])]
            if op in ("<", ">", "<=", ">=", "notnull"):
                return ["['{0}']".format(prefix[1])]
            if op == "in":
                return ["['{0}'~'{1}']".format(prefix[1], "|".join(prefix[2]))]
            if op in ("and", "or"):
                return _parts(prefix[1]) + _parts(prefix[2])

        return _parts(expr)

    @classmethod
    def sql(cls, s):
        return cls.parts(to_prefix(s))


class OsmiumTool:
    """``osmium tags-filter`` expression compiler (reference sources.py:89-132).
    Unlike Overpass, range/notnull clauses are NOT expressible and raise."""

    @classmethod
    def parts(cls, expr):
        def _parts(prefix):
            op = prefix[0]
            if op == "=":
                return ["{0}={1}".format(prefix[1], prefix[2])]
            if op == "!=":
                return ["{0}!={1}".format(prefix[1], prefix[2])]
            if op in ("<", ">", "<=", ">=", "notnull"):
                raise ValueError("{0} where clause not supported".format(op))
            if op == "in":
                return ["{0}={1}".format(prefix[1], ",".join(prefix[2]))]
            if op in ("and", "or"):
                return _parts(prefix[1]) + _parts(prefix[2])

        return _parts(expr)

    @staticmethod
    def get_element_filter(theme, part):
        elements = []
        if theme.points:
            elements.append("n/{0}".format(part))
        if theme.lines:
            elements.append("w/{0}".format(part))
        if theme.polygons:
            elements.append("r/{0}".format(part))
        return elements

    @classmethod
    def filters(cls, mapping):
        filters_set = set()
        for t in mapping.themes:
            for part in cls.parts(t.matcher.expr):
                for e in cls.get_element_filter(t, part):
                    filters_set.add(e)
        return filters_set


class Galaxy:
    """HOT raw-data-API filter compiler (reference sources.py:341-512).
    Only the mapping→JSON-filter compilation is kept — the HTTP snapshot
    orchestration (POST + poll + 429 retries, reference sources.py:660-719)
    is replaced by the parquet scan, with Ray task retries standing in for
    the app-level retry loop.

    Note: the reference's ``parts(cls, expr, and_clause=[])`` uses a
    MUTABLE DEFAULT that accumulates and-clauses across calls; this
    reimplementation is per-call (the accumulation is an untested bug, not
    a semantic)."""

    @classmethod
    def parts(cls, expr):
        and_clause = []

        def _parts(prefix):
            op = prefix[0]
            if op == "=":
                return [""" "{0}":["{1}"] """.format(prefix[1], prefix[2])]
            if op == "!=":  # raw-data API cannot express negation
                return []
            if op in ("<", ">", "<=", ">=", "notnull"):
                return [""" "{0}":[] """.format(prefix[1])]
            if op == "in":
                return [""" "{0}":["{1}"]""".format(prefix[1], """ "," """.join(prefix[2]))]
            if op == "and":
                both = _parts(prefix[1]) + _parts(prefix[2])
                and_clause.append(both)
                return both
            if op == "or":
                return _parts(prefix[1]) + _parts(prefix[2])

        return _parts(expr), and_clause

    @classmethod
    def attribute_filter(cls, theme):
        columns = theme.keys
        if "*" in columns or "all" in columns:
            return []
        return list(columns)

    @classmethod
    def remove_duplicates(cls, entries_dict):
        for key, value in entries_dict.items():
            entries_dict[key] = list(dict.fromkeys(value))
        return entries_dict

    @classmethod
    def where_filter(cls, parts, filter_dict):
        import json

        for part in parts:
            part_dict = json.loads("{" + part.strip() + "}")
            for key, value in part_dict.items():
                if key not in filter_dict:
                    filter_dict[key] = value
                elif filter_dict.get(key) != []:
                    if value == []:
                        # incoming notnull wildcard wins over listed values
                        filter_dict[key] = value
                    else:
                        filter_dict[key] += value
        return filter_dict

    @classmethod
    def _theme_filters(cls, themes):
        geometry_type = []
        or_filter = {}
        and_filter = {}
        point_filter = line_filter = poly_filter = {}
        point_columns = line_columns = poly_columns = []
        for t in themes:
            parts, and_clause = cls.parts(t.matcher.expr)
            if and_clause:
                flat = [c for clause in and_clause for c in clause]
                for cl in flat:
                    if cl in parts:
                        parts.remove(cl)
                and_filter = cls.remove_duplicates(cls.where_filter(flat, and_filter))
            or_filter = cls.remove_duplicates(cls.where_filter(parts, or_filter))
            if t.points:
                point_columns = cls.attribute_filter(t)
                geometry_type.append("point")
                point_filter = {"join_or": or_filter, "join_and": and_filter}
            if t.lines:
                line_columns = cls.attribute_filter(t)
                geometry_type.append("line")
                line_filter = {"join_or": or_filter, "join_and": and_filter}
            if t.polygons:
                poly_columns = cls.attribute_filter(t)
                geometry_type.append("polygon")
                poly_filter = {"join_or": or_filter, "join_and": and_filter}
        return (
            point_filter,
            line_filter,
            poly_filter,
            geometry_type,
            point_columns,
            line_columns,
            poly_columns,
        )

    @classmethod
    def filters(cls, mapping):
        """All themes merged (reference sources.py:396-452)."""
        return cls._theme_filters(mapping.themes)

    @classmethod
    def hdx_filters(cls, theme):
        """Per-theme variant (reference sources.py:341-394)."""
        return cls._theme_filters([theme])


def mapping_referenced_keys(mapping):
    """All tag keys any theme selects or filters on — drives scan-side
    column/shred pruning for the tags map column."""
    keys = set()
    for t in mapping.themes:
        keys.update(t.keys)
        stack = [t.matcher.expr]
        while stack:
            e = stack.pop()
            if not e:
                continue
            if e[0] in ("and", "or"):
                stack.extend((e[1], e[2]))
            else:
                keys.add(e[1])
    return keys
