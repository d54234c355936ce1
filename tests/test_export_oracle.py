"""The export-surface oracle SQL builder (pipelines/export_oracle.py):
matcher→DuckDB translation must reproduce the reference Matcher quirks
row-for-row, and the generated oracles must match the Ray pipelines on the
small corpus (the driver re-checks at sf0.01)."""

import duckdb
import pytest

from osm_export_tool_python_ray.pipelines.export_oracle import matcher_sql
from osm_export_tool_python_ray.sql import Matcher

TAG_ROWS = [
    {},
    {"building": "yes"},
    {"building": "house", "height": "21"},
    {"height": "100"},  # lexicographic: '100' < '20'
    {"height": "5"},
    {"natural": "water"},
    {"natural": "cliff", "name": "x"},
    {"addr:housenumber": "12"},
    {"highway": "platform"},
    {"amenity": "bank", "height": "20"},
]

EXPRS = [
    "building = 'yes'",
    "building != 'yes'",
    "height > 20",
    "height < 20",
    "height >= 20",
    "height <= 20",
    "height > '20'",
    "natural in ('water','cliff')",
    "name IS NOT NULL",
    "\"addr:housenumber\" = '12'",
    "building = 'yes' AND height > 20",
    "building = 'yes' OR natural in ('water') AND name IS NOT NULL",
    "amenity != 'cafe'",
]


class TestMatcherSqlParity:
    @pytest.mark.parametrize("expr", EXPRS)
    def test_differential_vs_matcher(self, expr):
        m = Matcher.from_sql(expr)
        sql = matcher_sql(m.expr)
        con = duckdb.connect()
        for tags in TAG_ROWS:
            obj = "{%s}" % ",".join(
                '"%s":"%s"' % (k, v) for k, v in tags.items()
            )
            got = con.execute(
                "SELECT coalesce((%s), FALSE) FROM (SELECT '%s' AS txt)"
                % (sql.replace("$.tags.", "$."), obj.replace("'", "''"))
            ).fetchone()[0]
            assert got == m.matches(tags), (expr, tags)

    def test_int_rval_type_strict(self):
        # '=' with int rval can never match a string tag (sql.py:83)
        m = Matcher(("=", "height", 21))
        assert matcher_sql(m.expr) == "FALSE"
        assert not m.matches({"height": "21"})
        m2 = Matcher(("!=", "height", 21))
        assert matcher_sql(m2.expr) == "TRUE"
        assert m2.matches({"height": "21"})

    def test_empty_expr(self):
        assert matcher_sql(()) == "FALSE"


class TestExportOracleSmall:
    """End-to-end: generated SQL == Ray export on the 1-shard corpus."""

    def test_theme_counts_match(self, ray_session, tmp_path):
        import ray.data

        from osm_export_tool_python_ray.mapping import Mapping
        from osm_export_tool_python_ray.pipelines.export import run_export, theme_counts
        from osm_export_tool_python_ray.pipelines.export_oracle import (
            sql_export_theme_counts,
        )
        from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

        corpus = str(tmp_path / "c.parquet")
        write_corpus_parquet(corpus, n_shards=2)
        with open(
            "/root/repo/osm_export_tool_python_ray/mappings/default.yml"
        ) as f:
            mapping = Mapping(f.read())
        themed = run_export(
            ray.data.read_parquet(corpus), mapping, num_partitions=2, num_buckets=8
        )
        mine = {
            (r["theme"], int(r["geom_type"])): r["n"]
            for r in theme_counts(themed).take_all()
        }
        sql = sql_export_theme_counts(corpus, mapping)
        theirs = {
            (t, int(g)): n
            for t, g, n in duckdb.connect().execute(sql).fetchall()
        }
        assert mine == theirs

    def test_gpkg_layer_counts_roundtrip(self, ray_session, tmp_path, monkeypatch):
        """The real-container oracle row: export → binary .gpkg → sqlite3
        read-back equals the DuckDB re-derivation on a tiny corpus (the
        driver re-checks the same pair at sf0.01)."""
        from osm_export_tool_python_ray.mapping import Mapping
        from osm_export_tool_python_ray.pipelines import queries as Q
        from osm_export_tool_python_ray.pipelines.export_oracle import (
            sql_gpkg_layer_counts,
        )
        from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

        corpus = str(tmp_path / "c.parquet")
        write_corpus_parquet(corpus, n_shards=2)
        monkeypatch.setattr(Q, "corpus_path", lambda n_shards, density=1.0: corpus)
        mine = Q.q_gpkg_layer_counts(None).to_pylist()
        with open(
            "/root/repo/osm_export_tool_python_ray/mappings/default.yml"
        ) as f:
            mapping = Mapping(f.read())
        theirs = {
            (l, int(g)): (int(n), int(s))
            for l, g, n, s in duckdb.connect()
            .execute(sql_gpkg_layer_counts(corpus, mapping))
            .fetchall()
        }
        assert len(mine) > 0
        assert {
            (r["layer"], r["geom_type"]): (r["n"], r["id_sum"]) for r in mine
        } == theirs

    @pytest.mark.parametrize("qname", ["shp_layer_counts", "kml_layer_counts"])
    def test_split_container_roundtrip(self, ray_session, tmp_path, monkeypatch, qname):
        """Shapefile (.shp/.dbf binary) and KML (XML) read-back equals the
        same DuckDB re-derivation: the independent stdlib decoders in
        queries.py must recover every row, id and geometry class from the
        real container bytes."""
        from osm_export_tool_python_ray.mapping import Mapping
        from osm_export_tool_python_ray.pipelines import queries as Q
        from osm_export_tool_python_ray.pipelines.export_oracle import (
            sql_gpkg_layer_counts,
        )
        from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

        corpus = str(tmp_path / "c.parquet")
        write_corpus_parquet(corpus, n_shards=2)
        monkeypatch.setattr(Q, "corpus_path", lambda n_shards, density=1.0: corpus)
        mine = Q.QUERIES[qname](None).to_pylist()
        with open(
            "/root/repo/osm_export_tool_python_ray/mappings/default.yml"
        ) as f:
            mapping = Mapping(f.read())
        theirs = {
            (l, int(g)): (int(n), int(s))
            for l, g, n, s in duckdb.connect()
            .execute(sql_gpkg_layer_counts(corpus, mapping))
            .fetchall()
        }
        assert len(mine) > 0
        assert {
            (r["layer"], r["geom_type"]): (r["n"], r["id_sum"]) for r in mine
        } == theirs


class TestMatcherSqlHypothesis:
    """Randomized differential: matcher_sql (DuckDB) vs Matcher._match on
    generated expressions × tag dicts (same strategies as the round-1
    reference differentials)."""

    def test_randomized(self):
        from hypothesis import given, settings
        from tests.test_differential_sql import sql_expr, tags_dict

        con = duckdb.connect()

        @settings(max_examples=150, deadline=None)
        @given(sql=sql_expr(3), tags=tags_dict)
        def check(sql, tags):
            try:
                m = Matcher.from_sql(sql)
            except Exception:
                return
            dsql = matcher_sql(m.expr).replace("$.tags.", "$.")
            obj = "{%s}" % ",".join('"%s":"%s"' % (k, v) for k, v in tags.items())
            got = con.execute(
                "SELECT coalesce((%s), FALSE) FROM (SELECT '%s' AS txt)"
                % (dsql, obj.replace("'", "''"))
            ).fetchone()[0]
            assert got == m.matches(tags), (sql, tags)

        check()


class TestSafeKeyGuard:
    """Tag keys with quote characters cannot be addressed by the DuckDB
    JSON path — the oracle must REFUSE to build rather than silently
    undercount while the engine handles the key fine (ADVICE r4)."""

    def test_tag_rejects_quote_keys(self):
        from osm_export_tool_python_ray.pipelines.export_oracle import _tag

        assert "addr:housenumber" in _tag("addr:housenumber")
        for bad in ('he said "hi"', "it's", 'mix"\'ed'):
            with pytest.raises(ValueError, match="quote character"):
                _tag(bad)

    def test_layer_fill_rates_rejects_quote_select_key(self):
        from osm_export_tool_python_ray.mapping import Mapping
        from osm_export_tool_python_ray.pipelines.export_oracle import (
            sql_layer_fill_rates,
        )

        y = (
            "buildings:\n"
            "  types:\n    - polygons\n"
            "  select:\n    - building\n    - \"odd'key\"\n"
            "  where: building IS NOT NULL\n"
        )
        m = Mapping(y)
        with pytest.raises(ValueError, match="quote character"):
            sql_layer_fill_rates("/tmp/nonexistent.parquet", m)
