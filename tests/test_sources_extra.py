"""Galaxy filter compilation, AOI semi-join, and two-parallelism
determinism (SURVEY.md §5 items)."""

import json
import subprocess
import sys
import os

import numpy as np
import pyarrow as pa
import pytest

from osm_export_tool_python_ray.mapping import Mapping
from osm_export_tool_python_ray.sources.filters import Galaxy, OsmiumTool, mapping_referenced_keys


class TestGalaxyFilters:
    def test_filters_shape(self):
        y = """
        buildings:
            types:
                - polygons
            select:
                - name
            where: building = 'yes' OR amenity IN ('bank','school')
        pois:
            types:
                - points
            select:
                - amenity
            where: amenity IS NOT NULL
        """
        m = Mapping(y)
        pf, lf, yf, geom_types, pc_, lc, yc = Galaxy.filters(m)
        assert set(geom_types) == {"point", "polygon"}
        # notnull → wildcard [] wins; = / in → value lists
        assert pf["join_or"]["amenity"] == []
        assert yf["join_or"]["building"] == ["yes"]
        assert sorted(yc) == ["name"]

    def test_hdx_per_theme(self):
        y = """
        t1:
            types:
                - points
            select:
                - a
            where: a = 'x' AND b = 'y'
        """
        m = Mapping(y)
        pf, _lf, _yf, gt, pc_, _lc, _yc = Galaxy.hdx_filters(m.themes[0])
        assert gt == ["point"]
        # AND clause routed to join_and, removed from join_or
        assert pf["join_and"] == {"a": ["x"], "b": ["y"]}
        assert pf["join_or"] == {}

    def test_osmium_filters(self):
        y = """
        buildings:
            types:
                - polygons
            select:
                - name
            where: building = 'yes'
        """
        m = Mapping(y)
        assert OsmiumTool.filters(m) == {"r/building=yes"}
        with pytest.raises(ValueError):
            OsmiumTool.parts(("notnull", "x"))

    def test_referenced_keys(self):
        y = """
        t:
            select:
                - name
            where: building = 'yes' AND height > 3
        """
        assert mapping_referenced_keys(Mapping(y)) == {"name", "building", "height"}


class TestAoiSemiJoin:
    def test_filters_features(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.functions.cells import cell_of
        from osm_export_tool_python_ray.functions import wkb as wkbmod
        from osm_export_tool_python_ray.stages.spatial_filter import aoi_semi_join

        aoi = [[np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])]]
        lon = np.array([0.5, 5.0, 0.9])
        lat = np.array([0.5, 5.0, 0.9])
        feats = pa.table(
            {
                "osm_id": pa.array([1, 2, 3], type=pa.int64()),
                "geom_type": pa.array([1, 1, 1], type=pa.int8()),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "cell": pa.array(cell_of(lon, lat), type=pa.uint64()),
                "wkb": pa.array([wkbmod.point_wkb(x, y) for x, y in zip(lon, lat)], type=pa.binary()),
            }
        )
        out = aoi_semi_join(ray.data.from_arrow(feats), aoi).take_all()
        assert sorted(r["osm_id"] for r in out) == [1, 3]

    def test_line_feature(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.functions.cells import cell_of
        from osm_export_tool_python_ray.functions import wkb as wkbmod
        from osm_export_tool_python_ray.stages.spatial_filter import aoi_semi_join

        aoi = [[np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])]]
        # line crossing the AOI whose bbox-centre cell sits inside the cover
        line = np.array([(0.4, -0.2), (0.6, 1.2)])
        feats = pa.table(
            {
                "osm_id": pa.array([7], type=pa.int64()),
                "geom_type": pa.array([2], type=pa.int8()),
                "lon": pa.array([np.nan]),
                "lat": pa.array([np.nan]),
                "cell": pa.array(cell_of([0.5], [0.5]), type=pa.uint64()),
                "wkb": pa.array([wkbmod.linestring_wkb(line)], type=pa.binary()),
            }
        )
        out = aoi_semi_join(ray.data.from_arrow(feats), aoi).take_all()
        assert [r["osm_id"] for r in out] == [7]


_DETERMINISM_SNIPPET = r"""
import sys, json, logging
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
import ray.data
from osm_export_tool_python_ray.sources.corpus import generate_corpus_table
from osm_export_tool_python_ray.mapping import Mapping
from osm_export_tool_python_ray.pipelines.export import run_export
docs = ray.data.from_arrow(generate_corpus_table(n_shards=2))
with open("osm_export_tool_python_ray/mappings/default.yml") as f:
    mapping = Mapping(f.read())
rows = run_export(docs, mapping, num_partitions=int(sys.argv[1]), num_buckets=16).take_all()
out = sorted((r["theme"], int(r["osm_id"]), int(r["geom_type"]), r["wkb"].hex()) for r in rows)
print(json.dumps(out))
ray.shutdown()
"""


class TestTwoParallelismDeterminism:
    """SURVEY.md §5.5: identical sorted output at two parallelism levels in
    fresh processes."""

    def test_cpus_2_vs_4(self):
        outs = []
        for n in (2, 4):
            r = subprocess.run(
                [sys.executable, "-c", _DETERMINISM_SNIPPET, str(n)],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                timeout=300,
            )
            assert r.returncode == 0, r.stderr[-2000:]
            outs.append(json.loads(r.stdout.strip().splitlines()[-1]))
        assert outs[0] == outs[1]
        assert len(outs[0]) > 50
