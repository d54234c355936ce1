"""Property-based parity: the vectorized Arrow matcher (stages/matcher_eval)
must agree with the reference-semantics row evaluator (sql._match) on
arbitrary expressions and tag maps, and right-nested trees must round-trip
through to_sql."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from osm_export_tool_python_ray.sql import Matcher, _match, to_prefix
from osm_export_tool_python_ray.stages.matcher_eval import eval_expr, extract_tag_columns

KEYS = ["building", "highway", "amenity", "height", "addr:housenumber", "name"]
VALUES = ["yes", "no", "primary", "bank", "20", "100", "21", "3", "a b", ""]

atom = st.one_of(
    st.tuples(st.just("="), st.sampled_from(KEYS), st.sampled_from(VALUES)),
    st.tuples(st.just("!="), st.sampled_from(KEYS), st.sampled_from(VALUES)),
    st.tuples(st.just("notnull"), st.sampled_from(KEYS)),
    st.tuples(
        st.just("in"),
        st.sampled_from(KEYS),
        st.lists(st.sampled_from(VALUES), min_size=1, max_size=3).map(tuple),
    ),
    st.tuples(st.just(">"), st.sampled_from(KEYS), st.sampled_from(["20", "3", "100"])),
    st.tuples(st.just("<"), st.sampled_from(KEYS), st.sampled_from(["20", "3", "100"])),
    st.tuples(st.just(">="), st.sampled_from(KEYS), st.sampled_from(["20", "3"])),
    st.tuples(st.just("<="), st.sampled_from(KEYS), st.sampled_from(["20", "3"])),
)


def right_nested(depth):
    if depth <= 0:
        return atom
    return st.one_of(
        atom,
        st.tuples(st.sampled_from(["and", "or"]), atom, right_nested(depth - 1)),
    )


EXPR = right_nested(4)

tags_dict = st.dictionaries(
    st.sampled_from(KEYS), st.sampled_from(VALUES), max_size=4
)


@settings(max_examples=300, deadline=None)
@given(expr=EXPR, tag_rows=st.lists(tags_dict, min_size=1, max_size=20))
def test_vectorized_matches_rowwise(expr, tag_rows):
    tags_col = pa.array(
        [list(d.items()) for d in tag_rows], type=pa.map_(pa.string(), pa.string())
    )
    keys = sorted(set(KEYS))
    cols = extract_tag_columns(tags_col, keys)
    got = eval_expr(expr, cols, len(tag_rows))
    want = np.array([_match(expr, d) for d in tag_rows], dtype=bool)
    assert list(got) == list(want)


@settings(max_examples=200, deadline=None)
@given(expr=EXPR)
def test_to_sql_roundtrip_right_nested(expr):
    sql = Matcher(expr).to_sql()
    reparsed = to_prefix(sql)
    # 'in' tuples reparse as ParseResults-equivalent lists: normalize
    def norm(e):
        if e[0] in ("and", "or"):
            return (e[0], norm(e[1]), norm(e[2]))
        if e[0] == "in":
            return ("in", e[1], tuple(e[2]))
        return tuple(e)

    assert norm(reparsed) == norm(expr)
