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
