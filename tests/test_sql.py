"""Ported verbatim from reference test/test_sql.py (same inputs and expected
values) against the reimplemented parser/Matcher."""

import unittest

from osm_export_tool_python_ray.sql import SQLValidator, Matcher


class TestSql(unittest.TestCase):
    def test_basic(self):
        self.assertTrue(SQLValidator("name = 'a name'").valid)

    def test_identifier_list(self):
        self.assertTrue(SQLValidator("natural in ('water','cliff')").valid)

    def test_float_value(self):
        self.assertTrue(SQLValidator("height > 20").valid)

    def test_not_null(self):
        self.assertTrue(SQLValidator("height IS NOT NULL").valid)

    def test_and_or(self):
        self.assertTrue(SQLValidator("height IS NOT NULL and height > 20").valid)
        self.assertTrue(SQLValidator("height IS NOT NULL or height > 20").valid)
        self.assertTrue(SQLValidator("height IS NOT NULL or height > 20 and height < 30").valid)

    def test_parens(self):
        self.assertTrue(SQLValidator("(admin IS NOT NULL and level > 4)").valid)
        self.assertTrue(SQLValidator("(admin IS NOT NULL and level > 4) AND height is not null").valid)

    def test_colons_etc(self):
        self.assertTrue(SQLValidator("addr:housenumber IS NOT NULL").valid)
        self.assertTrue(SQLValidator("admin_level IS NOT NULL").valid)

    def test_invalid_sql(self):
        s = SQLValidator("drop table planet_osm_polygon")
        self.assertFalse(s.valid)
        self.assertEqual(s.errors, ['SQL could not be parsed.'])
        s = SQLValidator("(drop table planet_osm_polygon)")
        self.assertFalse(s.valid)
        self.assertEqual(s.errors, ['SQL could not be parsed.'])
        s = SQLValidator("")
        self.assertFalse(s.valid)
        self.assertEqual(s.errors, ['SQL could not be parsed.'])
        s = SQLValidator("name = 'a name'; blah")
        self.assertFalse(s.valid)
        self.assertEqual(s.errors, ['SQL could not be parsed.'])

    def test_column_names(self):
        s = SQLValidator("(admin IS NOT NULL and level > 4) AND height is not null")
        self.assertTrue(s.valid)
        self.assertEqual(s.column_names, ['admin', 'level', 'height'])


class TestMatcher(unittest.TestCase):
    def test_matcher_binop(self):
        m = Matcher.from_sql("building = 'yes'")
        self.assertTrue(m.matches({'building': 'yes'}))
        self.assertFalse(m.matches({'building': 'no'}))
        m = Matcher.from_sql("building != 'yes'")
        self.assertFalse(m.matches({'building': 'yes'}))
        self.assertTrue(m.matches({'building': 'no'}))

    def test_matcher_colon(self):
        m = Matcher.from_sql("addr:housenumber = 1")
        self.assertTrue(m.matches({'addr:housenumber': '1'}))
        m = Matcher.from_sql("building != 'yes'")
        self.assertFalse(m.matches({'building': 'yes'}))
        self.assertTrue(m.matches({'building': 'no'}))

    def test_matcher_doublequote(self):
        m = Matcher.from_sql("\"addr:housenumber\" = 1")
        self.assertTrue(m.matches({'addr:housenumber': '1'}))
        m = Matcher.from_sql("\"addr:housenumber\" IN ('foo')")
        self.assertTrue(m.matches({'addr:housenumber': 'foo'}))
        m = Matcher.from_sql("\"addr:housenumber\" IS NOT NULL")
        self.assertTrue(m.matches({'addr:housenumber': 'foo'}))

    def test_matcher_or(self):
        m = Matcher.from_sql("building = 'yes' OR amenity = 'bank'")
        self.assertTrue(m.matches({'building': 'yes'}))
        self.assertTrue(m.matches({'amenity': 'bank'}))
        self.assertFalse(m.matches({}))

    def test_matcher_and(self):
        m = Matcher.from_sql("building = 'yes' AND amenity = 'bank'")
        self.assertFalse(m.matches({'building': 'yes'}))
        self.assertFalse(m.matches({'amenity': 'bank'}))

    def test_matcher_is_not_null(self):
        m = Matcher.from_sql("building IS NOT NULL")
        self.assertTrue(m.matches({'building': 'one'}))
        self.assertTrue(m.matches({'building': 'two'}))
        self.assertFalse(m.matches({}))

    def test_in(self):
        m = Matcher.from_sql("building IN ('one','two')")
        self.assertTrue(m.matches({'building': 'one'}))
        self.assertTrue(m.matches({'building': 'two'}))
        self.assertFalse(m.matches({}))
        self.assertFalse(m.matches({'building': 'three'}))

    def test_any(self):
        self.assertTrue(Matcher.any("building").matches({'building': 'one'}))

    def test_union(self):
        m = Matcher.any("building").union(Matcher.any("parking"))
        self.assertTrue(m.matches({'building': 'one'}))
        self.assertTrue(m.matches({'parking': 'one'}))

    def test_null(self):
        self.assertFalse(Matcher.null().matches({'building': 'one'}))

    def test_to_sql(self):
        for sql in [
            "building = 'yes'",
            "building IS NOT NULL",
            "building IN ('one','two')",
            "building != 'yes'",
            "building >= 0",
            "building <= 0",
            "building > 0",
            "building < 0",
            "building > 0 AND building < 5",
            "building > 0 OR building < 5",
        ]:
            self.assertEqual(Matcher.from_sql(sql).to_sql(), sql)


class TestQuirks(unittest.TestCase):
    """Extra pins on reference quirks (SURVEY.md §2 M2/M3)."""

    def test_no_precedence_right_assoc(self):
        from osm_export_tool_python_ray.sql import to_prefix

        # a AND b OR c parses as ('and', a, ('or', b, c)) — NOT standard SQL
        e = to_prefix("a = '1' AND b = '2' OR c = '3'")
        self.assertEqual(e[0], 'and')
        self.assertEqual(e[2][0], 'or')

    def test_lexicographic_ordering(self):
        m = Matcher.from_sql("height > 20")
        self.assertFalse(m.matches({'height': '100'}))  # '100' < '20' lexicographically
        self.assertTrue(m.matches({'height': '21'}))
        self.assertTrue(m.matches({'height': 21}))  # str() coercion

    def test_type_strict_equality(self):
        m = Matcher.from_sql("x = 1")
        self.assertTrue(m.matches({'x': '1'}))
        self.assertFalse(m.matches({'x': 1}))  # int 1 != '1'

    def test_empty_matches_nothing(self):
        self.assertFalse(Matcher(()).matches({'any': 'thing'}))


if __name__ == '__main__':
    unittest.main()
