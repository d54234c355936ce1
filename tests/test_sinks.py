"""Sink layouts, packaging, CLI, and the span-sequence invariant."""

import json
import os
import tarfile
import zipfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osm_export_tool_python_ray.mapping import Mapping
from osm_export_tool_python_ray.sinks import (
    Geopackage,
    Kml,
    Shapefile,
    create_package,
    create_posm_bundle,
    launder_name,
)

MAPPING_YAML = """
buildings:
  types:
    - polygons
  select:
    - name
    - addr:housenumber
  where: building IS NOT NULL
roads:
  types:
    - lines
  select:
    - highway
"""


@pytest.fixture(scope="module")
def export_workdir(ray_session, tmp_path_factory):
    import ray.data

    from osm_export_tool_python_ray.pipelines.export import run_export
    from osm_export_tool_python_ray.sources.corpus import generate_corpus_table

    wd = str(tmp_path_factory.mktemp("exportwd"))
    docs = ray.data.from_arrow(generate_corpus_table(n_shards=1))
    mapping = Mapping(MAPPING_YAML)
    run_export(docs, mapping, workdir=wd, num_partitions=2, num_buckets=4)
    return wd, mapping


class TestSinks:
    def test_geopackage_layout(self, export_workdir, tmp_path):
        wd, mapping = export_workdir
        out = str(tmp_path / "demo")
        sink = Geopackage(out, mapping)
        files = sink.write_from(os.path.join(wd, "features"))
        assert os.path.isdir(out + ".gpkg.d/buildings")
        t = pq.read_table(out + ".gpkg.d/buildings")
        # schema parity: osm_id + sorted select keys as strings + geometry
        assert t.schema.names == ["osm_id", "addr:housenumber", "name", "geom_type", "wkb"]
        assert t.num_rows > 0
        assert {f.extra.get("theme") for f in files} <= {"buildings", "roads", None}
        # the real binary container exists alongside the staged layout
        assert os.path.isfile(out + ".gpkg")

    def test_shapefile_laundering(self, export_workdir, tmp_path):
        wd, mapping = export_workdir
        out = str(tmp_path / "demo")
        Shapefile(out, mapping).write_from(os.path.join(wd, "features"))
        t = pq.read_table(out + ".shp.d/demo_buildings_polygons")
        assert "addrhousen" in t.schema.names  # laundered to 10 chars
        assert launder_name("addr:housenumber") == "addrhousen"
        # polygons dir contains only polygons
        assert set(t.column("geom_type").to_pylist()) <= {3}

    def test_omit_osm_ids(self, export_workdir, tmp_path):
        wd, mapping = export_workdir
        out = str(tmp_path / "noid")
        Geopackage(out, mapping, omit_osm_ids=True).write_from(os.path.join(wd, "features"))
        t = pq.read_table(out + ".gpkg.d/buildings")
        assert "osm_id" not in t.schema.names

    def test_geojsonl_layout(self, export_workdir, tmp_path):
        from osm_export_tool_python_ray.sinks import GeoJsonSeq

        wd, mapping = export_workdir
        out = str(tmp_path / "demo")
        files = GeoJsonSeq(out, mapping).write_from(os.path.join(wd, "features"))
        # one .geojsonl per theme×geomtype, RFC 7946 Feature per line
        path = out + "_buildings_polygons.geojsonl"
        assert os.path.isfile(path)
        n = 0
        with open(path, encoding="utf-8") as f:
            for line in f:
                feat = json.loads(line)
                assert feat["type"] == "Feature"
                assert feat["geometry"]["type"] in ("Polygon", "MultiPolygon")
                assert isinstance(feat["id"], int)
                # only-present attributes: no null-valued properties
                assert all(v is not None for v in feat["properties"].values())
                n += 1
        assert n > 0
        assert {f.output_name for f in files} == {"geojsonl"}

    def test_packaging(self, export_workdir, tmp_path):
        wd, mapping = export_workdir
        out = str(tmp_path / "pkg")
        sink = Kml(out, mapping)
        files = sink.write_from(os.path.join(wd, "features"))
        aoi = [[np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])]]
        zpath = str(tmp_path / "out.zip")
        create_package(zpath, files, boundary_geom=aoi)
        with zipfile.ZipFile(zpath) as z:
            names = z.namelist()
            assert "clipping_boundary.geojson" in names
            assert any("buildings" in n for n in names)
        tpath = str(tmp_path / "out.tar.gz")
        create_posm_bundle(tpath, files, "Title", "name", "desc", aoi)
        with tarfile.open(tpath) as t:
            m = json.load(t.extractfile("manifest.json"))
            assert m["title"] == "Title"
            assert m["bbox"] == [0.0, 0.0, 1.0, 1.0]
            assert m["contents"]


class TestStagingOnly:
    def test_encode_container_opt_out(self, export_workdir, tmp_path):
        """encode_container=False ships only the staged parquet layout —
        the distributed/resumable scale product — and skips the serial
        single-file container tail."""
        wd, mapping = export_workdir
        out = str(tmp_path / "staged")
        files = Geopackage(out, mapping, encode_container=False).write_from(
            os.path.join(wd, "features")
        )
        assert not os.path.exists(out + ".gpkg")
        assert os.path.isdir(out + ".gpkg.d/buildings")
        assert all(f.output_name == "gpkg" for f in files)


class TestPluginDuckType:
    """write_to_plugin feeds a reference-style output plugin one row per
    (theme, element) with the FULL tag dict and WKB geom (reference
    cmd.py:55-62, tabular.py:263-341 semantics)."""

    class Recorder:
        def __init__(self):
            self.rows = []
            self.finalized = False
            self.files = ["dummy"]

        def write(self, osm_id, layer_name, geom_type, geom, tags):
            self.rows.append((osm_id, layer_name, geom_type, geom, tags))

        def finalize(self):
            self.finalized = True

    def test_rows_match_themed_features(self, export_workdir):
        import ray.data

        from osm_export_tool_python_ray import GeomType
        from osm_export_tool_python_ray.sinks import write_to_plugin

        wd, _mapping = export_workdir
        plugin = self.Recorder()
        files = write_to_plugin(os.path.join(wd, "features"), plugin, batch_size=64)
        assert plugin.finalized and files == ["dummy"]

        themed = ray.data.read_parquet(os.path.join(wd, "features")).take_all()
        assert len(plugin.rows) == len(themed) > 0
        expect = {
            (r["theme"], r["osm_id"], int(r["geom_type"])): (r["wkb"], dict(r["tags"]))
            for r in themed
        }
        for osm_id, layer, gt, wkb, tags in plugin.rows:
            assert isinstance(gt, GeomType)
            w, tg = expect[(layer, osm_id, gt.value)]
            assert w == wkb  # ISO-WKB bytes pass through unchanged
            assert tg == tags  # full tag dict, not the theme projection
            assert isinstance(tags, dict)


class TestSpanSequenceInvariant:
    """FIXTURES.md F1: per-row span-sequence equality on
    (kind, text, media_ref, order) must hold through the explode stage."""

    def test_explode_preserves_order(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table
        from osm_export_tool_python_ray.stages.explode import span_sequence

        docs = generate_corpus_table(n_shards=2)
        seq = (
            ray.data.from_arrow(docs)
            .map_batches(span_sequence, batch_format="pyarrow")
            .take_all()
        )
        # rebuild per-doc ordered span lists from the exploded rows
        rebuilt = {}
        for r in seq:
            rebuilt.setdefault(r["doc_id"], []).append(
                (r["seq"], r["kind"], r["text"], r["media_ref"], r["offset"])
            )
        orig = docs.to_pydict()
        for doc_id, spans in zip(orig["doc_id"], orig["spans"]):
            got = [x[1:] for x in sorted(rebuilt.get(doc_id, []))]
            want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
            assert got == want, doc_id

    def test_feature_provenance_resolves(self, ray_session):
        """Every emitted feature's (doc_id, offset) points at an 'osm' span
        whose payload has the feature's source element id."""
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import run_export
        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table

        docs_tbl = generate_corpus_table(n_shards=1)
        mapping = Mapping(MAPPING_YAML)
        rows = run_export(
            ray.data.from_arrow(docs_tbl), mapping, num_partitions=2, num_buckets=4
        ).take_all()
        span_index = {}
        for doc_id, spans in zip(
            docs_tbl.column("doc_id").to_pylist(), docs_tbl.column("spans").to_pylist()
        ):
            for s in spans:
                span_index[(doc_id, s["offset"])] = s
        assert rows
        for r in rows:
            s = span_index[(r["doc_id"], r["offset"])]
            assert s["kind"] == "osm"
            el = json.loads(s["text"])
            assert abs(r["osm_id"]) == el["id"]


class TestCli:
    def test_cli_end_to_end(self, ray_session, tmp_path):
        # in-process main() (ray already initialised by the fixture)
        from osm_export_tool_python_ray.cli import main
        from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

        corpus = str(tmp_path / "c.parquet")
        write_corpus_parquet(corpus, n_shards=1)
        mp = str(tmp_path / "m.yml")
        with open(mp, "w") as f:
            f.write(MAPPING_YAML)
        out = str(tmp_path / "cliout")
        rc = main([corpus, out, "-m", mp, "-f", "gpkg", "--workdir", str(tmp_path / "wd")])
        assert rc == 0
        assert os.path.isdir(out + ".gpkg.d")
        assert os.path.isfile(out + ".gpkg")

    def test_cli_staging_only(self, ray_session, tmp_path):
        """--staging-only stops at the staged parquet layout (the
        distributed scale product) and skips the serial container tail."""
        from osm_export_tool_python_ray.cli import main
        from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

        corpus = str(tmp_path / "c.parquet")
        write_corpus_parquet(corpus, n_shards=1)
        mp = str(tmp_path / "m.yml")
        with open(mp, "w") as f:
            f.write(MAPPING_YAML)
        out = str(tmp_path / "stageout")
        rc = main(
            [corpus, out, "-m", mp, "-f", "gpkg", "--staging-only",
             "--workdir", str(tmp_path / "wd")]
        )
        assert rc == 0
        assert os.path.isdir(out + ".gpkg.d")
        assert not os.path.exists(out + ".gpkg")

    def test_cli_invalid_mapping(self, ray_session, tmp_path, capsys):
        from osm_export_tool_python_ray.cli import main
        from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

        corpus = str(tmp_path / "c.parquet")
        write_corpus_parquet(corpus, n_shards=1)
        mp = str(tmp_path / "bad.yml")
        with open(mp, "w") as f:
            f.write("t:\n  select:\n    - a\n  where: drop table x\n")
        rc = main([corpus, str(tmp_path / "o"), "-m", mp])
        assert rc == 1

    def test_cli_comma_formats(self, ray_session, tmp_path):
        """Reference -f syntax is comma-separated (cmd.py:14: -f gpkg,shp)."""
        from osm_export_tool_python_ray.cli import main
        from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

        corpus = str(tmp_path / "c.parquet")
        write_corpus_parquet(corpus, n_shards=1)
        mp = str(tmp_path / "m.yml")
        with open(mp, "w") as f:
            f.write(MAPPING_YAML)
        out = str(tmp_path / "commaout")
        rc = main([corpus, out, "-m", mp, "-f", "gpkg,shp", "--workdir", str(tmp_path / "wd")])
        assert rc == 0
        assert os.path.isdir(out + ".gpkg.d")
        assert os.path.isdir(out + ".shp.d")

    def test_cli_bad_format_rejected(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.cli import main

        with pytest.raises(SystemExit):
            main(["x.parquet", "y", "-f", "gpkg,nope"])


class TestCentroidSink:
    def test_polygon_theme_centroid_rows_emitted(self, ray_session, tmp_path):
        """ADVICE round-1: under --centroid a polygon-only theme's features
        arrive as geom_type=1 and must land in a points layer, not vanish."""
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import run_export
        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table

        wd = str(tmp_path / "wd")
        docs = ray.data.from_arrow(generate_corpus_table(n_shards=1))
        mapping = Mapping(MAPPING_YAML)
        run_export(docs, mapping, workdir=wd, polygon_centroid=True,
                   num_partitions=2, num_buckets=4)
        out = str(tmp_path / "cent")
        Shapefile(out, mapping, polygon_centroid=True).write_from(os.path.join(wd, "features"))
        t = pq.read_table(out + ".shp.d/cent_buildings_points")
        assert t.num_rows > 0
        assert set(t.column("geom_type").to_pylist()) <= {1}
        # without the flag the layer is skipped (legacy behavior preserved)
        out2 = str(tmp_path / "nocent")
        Shapefile(out2, mapping).write_from(os.path.join(wd, "features"))
        assert not os.path.isdir(out2 + ".shp.d/nocent_buildings_points")


class TestEncodeTailScale:
    """VERDICT r4 item 6: the container-encode tail must stay streaming
    (O(batch) memory) and the single-gpkg tail must parallelize per
    theme. Proven here at a synthetic larger-than-test scale."""

    def _staged_layer(self, tmp_path, n_parts=30, rows_per_part=4000):
        """Staged parquet layer: n_parts files of point features."""
        import struct as _struct

        d = tmp_path / "layer"
        d.mkdir()
        wkb_point = lambda x, y: (  # noqa: E731
            b"\x01\x01\x00\x00\x00" + _struct.pack("<2d", x, y)
        )
        rid = 0
        for p in range(n_parts):
            xs = (np.arange(rows_per_part) % 997) * 1e-3
            t = pa.table(
                {
                    "osm_id": pa.array(
                        np.arange(rid, rid + rows_per_part, dtype=np.int64)
                    ),
                    "wkb": pa.array(
                        [wkb_point(float(x), float(x) * 0.5) for x in xs]
                    ),
                    "name": pa.array(
                        ["feature-%d-%d" % (p, i) for i in range(rows_per_part)]
                    ),
                }
            )
            pq.write_table(
                t, str(d / ("part-%05d.parquet" % p)), row_group_size=1000
            )
            rid += rows_per_part
        return str(d), n_parts * rows_per_part

    def test_gpkg_encode_memory_is_batch_bounded(self, tmp_path):
        """Python-heap peak during the streamed encode must be a few
        batches, not the layer (tracemalloc tracks the Python-side row
        lists; 120k rows ≈ 36 MB of Python values stream through)."""
        import sqlite3
        import tracemalloc

        from osm_export_tool_python_ray.sinks import _encode_one_layer

        staged, total_rows = self._staged_layer(tmp_path)
        out = str(tmp_path / "big.gpkg")
        tracemalloc.start()
        _encode_one_layer("gpkg", out, "pts", None, ["name"], True, staged)
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        con = sqlite3.connect(out)
        n = con.execute('SELECT count(*) FROM "pts"').fetchone()[0]
        con.close()
        assert n == total_rows
        # ceiling: ~1k-row batches → peak ≪ the ~36 MB full layer
        assert peak < 12 * 1024 * 1024, peak

    def test_parallel_single_gpkg_equals_sequential(
        self, ray_session, export_workdir, tmp_path
    ):
        """The ATTACH-merge parallel tail must produce a semantically
        identical .gpkg (same layers, counts, osm_id sums, fids,
        extents) as the sequential path."""
        import sqlite3

        from osm_export_tool_python_ray.sinks import Geopackage

        workdir, mapping = export_workdir

        def read_back(path):
            con = sqlite3.connect(path)
            layers = sorted(
                r[0]
                for r in con.execute(
                    "SELECT table_name FROM gpkg_contents"
                ).fetchall()
            )
            out = {}
            for ly in layers:
                rows = con.execute(
                    'SELECT fid, osm_id FROM "%s" ORDER BY fid' % ly
                ).fetchall()
                ext = con.execute(
                    "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
                    " WHERE table_name = ?",
                    (ly,),
                ).fetchone()
                out[ly] = (rows, ext)
            con.close()
            return out

        seq_base = str(tmp_path / "seq")
        par_base = str(tmp_path / "par")
        feats = os.path.join(workdir, "features")

        s = Geopackage(par_base, mapping, parallel_encode=True)
        s.write_from(feats)
        s.finalize()

        s2 = Geopackage(seq_base, mapping, parallel_encode=False)
        s2.write_from(feats)
        s2.finalize()

        a = read_back(par_base + ".gpkg")
        b = read_back(seq_base + ".gpkg")
        assert a.keys() == b.keys() and len(a) > 1
        assert a == b
