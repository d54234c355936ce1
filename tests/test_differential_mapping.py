"""DIFFERENTIAL test for Theme/Mapping: load the ACTUAL reference
mapping.py (stubbing its shapely-blocked package imports) and compare
construction results + validation outcomes on randomized YAML mappings."""

import pytest
from hypothesis import given, settings, strategies as st

from osm_export_tool_python_ray import GeomType as MyGeomType
from osm_export_tool_python_ray.mapping import Mapping as MyMapping


pytest.importorskip("pyparsing")
from tests.refload import RefGeomType, ref_mapping as _ref_mapping

ref_mapping = _ref_mapping()

WHERES = [
    "building = 'yes'",
    "amenity IN ('bank','school')",
    "height > 20",
    "natural IS NOT NULL",
    "building = 'yes' AND amenity = 'bank' OR height > 3",
    "XXX aaa",          # invalid SQL
]

theme_dicts = st.fixed_dictionaries(
    {},
    optional={
        "types": st.lists(
            st.sampled_from(["points", "lines", "polygons", "polygon"]),
            min_size=1,
            max_size=3,
        ),
        "select": st.lists(
            st.sampled_from(["name", "building", "osm_id", "addr:housenumber", "height"]),
            min_size=1,
            max_size=4,
        ),
        "where": st.one_of(
            st.sampled_from(WHERES),
            st.lists(st.sampled_from(WHERES[:5]), min_size=1, max_size=3),
        ),
        "extra_key": st.just({"foo": "bar"}),
    },
)


def to_yaml(name, d):
    import yaml

    return yaml.safe_dump({name: d})


TAGS = [
    {},
    {"building": "yes"},
    {"amenity": "bank", "height": "21"},
    {"natural": "water"},
    {"height": "100"},
    {"name": "x", "addr:housenumber": "7"},
]


@settings(max_examples=300, deadline=None)
@given(d=theme_dicts, osm_id_default=st.booleans())
def test_mapping_construction_identical(d, osm_id_default):
    y = to_yaml("t1", d)
    mine, my_errors = MyMapping.validate(y, default_osm_id=osm_id_default)
    theirs, their_errors = ref_mapping.Mapping.validate(y, default_osm_id=osm_id_default)
    assert (mine is None) == (theirs is None)
    if mine is None:
        assert len(my_errors) == len(their_errors) == 1
        assert my_errors == their_errors
        return
    mt, rt = mine.themes[0], theirs.themes[0]
    assert (mt.points, mt.lines, mt.polygons) == (rt.points, rt.lines, rt.polygons)
    assert mt.keys == rt.keys
    assert mt.osm_id == rt.osm_id
    assert mt.extra == rt.extra
    # matcher behavior identical across tag fixtures + geom types
    for tags in TAGS:
        for g_mine, g_ref in (
            (MyGeomType.POINT, RefGeomType.POINT),
            (MyGeomType.LINE, RefGeomType.LINE),
            (MyGeomType.POLYGON, RefGeomType.POLYGON),
        ):
            assert mt.matches(g_mine, tags) == rt.matches(g_ref, tags), (tags, g_mine)


def test_bundled_mappings_identical():
    for fn in ("default.yml", "simple.yml"):
        with open("/root/reference/osm_export_tool/mappings/" + fn) as f:
            y = f.read()
        mine = MyMapping(y)
        theirs = ref_mapping.Mapping(y)
        assert [t.name for t in mine.themes] == [t.name for t in theirs.themes]
        for mt, rt in zip(mine.themes, theirs.themes):
            assert mt.keys == rt.keys
            assert mt.matcher.expr == rt.matcher.expr
            assert (mt.points, mt.lines, mt.polygons) == (rt.points, rt.lines, rt.polygons)
