"""DIFFERENTIAL test: run the ACTUAL reference sql.py (loaded standalone —
pyparsing is available; the package __init__ needs shapely so we import the
module by file path) against this engine's reimplementation on randomized
and adversarial inputs. The strongest available parity evidence for M1-M5."""

import pytest
from hypothesis import given, settings, strategies as st

from osm_export_tool_python_ray.sql import Matcher as MyMatcher
from osm_export_tool_python_ray.sql import SQLValidator as MySQLValidator
from osm_export_tool_python_ray.sql import to_prefix as my_to_prefix


pytest.importorskip("pyparsing")
from tests.refload import ref_sql

ref = ref_sql()

KEYS = ["building", "highway", "amenity", "height", "addr:housenumber", "name", "a"]
VALUES = ["yes", "no", "primary", "bank", "20", "100", "21", "3", "a b"]

atom_sql = st.one_of(
    st.builds(lambda k, v: "%s = '%s'" % (k, v), st.sampled_from(KEYS), st.sampled_from(VALUES)),
    st.builds(lambda k, v: "%s != '%s'" % (k, v), st.sampled_from(KEYS), st.sampled_from(VALUES)),
    st.builds(lambda k: "%s IS NOT NULL" % k, st.sampled_from(KEYS)),
    st.builds(
        lambda k, vs: "%s IN (%s)" % (k, ",".join("'%s'" % v for v in vs)),
        st.sampled_from(KEYS),
        st.lists(st.sampled_from(VALUES), min_size=1, max_size=3),
    ),
    st.builds(lambda k, v: "%s > %s" % (k, v), st.sampled_from(KEYS), st.sampled_from(["0", "20", "100"])),
    st.builds(lambda k, v: "%s <= %s" % (k, v), st.sampled_from(KEYS), st.sampled_from(["0", "20"])),
    st.builds(lambda k: '"%s" = \'x\'' % k, st.sampled_from(["addr:housenumber", "name"])),
)


def sql_expr(depth):
    if depth <= 0:
        return atom_sql
    sub = sql_expr(depth - 1)
    return st.one_of(
        atom_sql,
        st.builds(lambda a, op, b: "%s %s %s" % (a, op, b), atom_sql, st.sampled_from(["AND", "OR", "and", "or"]), sub),
        st.builds(lambda x: "(%s)" % x, sub),
        st.builds(
            lambda a, op, b: "(%s) %s %s" % (a, op, b),
            sub,
            st.sampled_from(["AND", "OR"]),
            atom_sql,
        ),
    )


tags_dict = st.dictionaries(st.sampled_from(KEYS), st.sampled_from(VALUES), max_size=4)


def _norm(e):
    if e is None:
        return None
    if e[0] in ("and", "or"):
        return (e[0], _norm(e[1]), _norm(e[2]))
    if e[0] == "in":
        return ("in", e[1], tuple(e[2]))
    return tuple(e)


@settings(max_examples=400, deadline=None)
@given(sql=sql_expr(3))
def test_to_prefix_identical(sql):
    assert _norm(my_to_prefix(sql)) == _norm(ref.to_prefix(sql))


@settings(max_examples=200, deadline=None)
@given(sql=sql_expr(3), tags=tags_dict)
def test_matcher_identical(sql, tags):
    assert MyMatcher.from_sql(sql).matches(tags) == ref.Matcher.from_sql(sql).matches(tags)


@settings(max_examples=200, deadline=None)
@given(sql=sql_expr(2))
def test_to_sql_identical(sql):
    assert MyMatcher.from_sql(sql).to_sql() == ref.Matcher.from_sql(sql).to_sql()


INVALID = [
    "drop table planet_osm_polygon",
    "(drop table x)",
    "",
    "name = 'a'; blah",
    "a = ",
    "= 'x'",
    "a in ()",
    "a in ('x'",
    "(a = 'x'",
    "a = 'x')",
    "a == 'x'",
    "a IS NULL",
    "not a = 'x'",
    "a = 'x' AND",
    "a <> 'x'",
    "1 = '1'",
    "a = 1.5",
]


@pytest.mark.parametrize("sql", INVALID)
def test_validity_identical_on_adversarial(sql):
    mine = MySQLValidator(sql).valid
    theirs = ref.SQLValidator(sql).valid
    assert mine == theirs, sql


@settings(max_examples=300, deadline=None)
@given(sql=sql_expr(3))
def test_validity_identical_on_valid(sql):
    assert MySQLValidator(sql).valid == ref.SQLValidator(sql).valid


@settings(max_examples=200, deadline=None)
@given(sql=sql_expr(2))
def test_column_names_identical(sql):
    m, r = MySQLValidator(sql), ref.SQLValidator(sql)
    assert m.valid and r.valid
    assert m.column_names == r.column_names