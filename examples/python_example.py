"""Programmatic export example — the engine's analog of the reference's
examples/python_example.py (AOI + mapping + source + three sinks +
packaging), re-expressed over a Ray Data corpus instead of an Overpass
fetch. Run from the repo root:  python examples/python_example.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

GEOJSON = """{
  "type": "Polygon",
  "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]
}"""

MAPPING_YAML = """
buildings:
  types:
    - polygons
  select:
    - name
    - building
  where:
    - building IS NOT NULL
roads:
  types:
    - lines
  select:
    - highway
  where: highway IS NOT NULL
"""


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data as _raydata  # binds the submodule without shadowing `ray`
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from osm_export_tool_python_ray.geometry import load_geometry
    from osm_export_tool_python_ray.mapping import Mapping
    from osm_export_tool_python_ray.pipelines.export import run_export, theme_counts
    from osm_export_tool_python_ray.sinks import (
        Geopackage,
        Kml,
        Shapefile,
        create_package,
        create_posm_bundle,
    )
    from osm_export_tool_python_ray.sources.corpus import write_corpus_parquet

    tempdir = tempfile.mkdtemp(prefix="osm_ray_example_")
    corpus = write_corpus_parquet(os.path.join(tempdir, "corpus.parquet"), n_shards=2)

    aoi = load_geometry(GEOJSON)
    mapping = Mapping(MAPPING_YAML)

    docs = ray.data.read_parquet(corpus)
    workdir = os.path.join(tempdir, "work")
    run_export(docs, mapping, aoi_polygons=aoi, workdir=workdir, num_partitions=4, num_buckets=16)

    features = os.path.join(workdir, "features")
    out = os.path.join(tempdir, "example")
    files = []
    for sink_cls in (Shapefile, Geopackage, Kml):
        sink = sink_cls(out, mapping)
        files.extend(sink.write_from(features))
        sink.finalize()

    create_package(os.path.join(tempdir, "example.zip"), files, boundary_geom=aoi)
    create_posm_bundle(
        os.path.join(tempdir, "example.tar.gz"), files, "Example", "example", "demo bundle", aoi
    )

    # custom output plugin (reference duck-type: .write/.finalize/.files) —
    # a GeoJSONL writer fed per row by write_to_plugin
    from osm_export_tool_python_ray.functions import wkb as wkbmod
    from osm_export_tool_python_ray.sinks import write_to_plugin

    class GeoJsonSeq:
        def __init__(self, path):
            self.path = path
            self.f = open(path, "w")
            self.files = [path]
            self.n = 0

        def write(self, osm_id, layer_name, geom_type, geom, tags):
            code, g = wkbmod.decode(geom)  # geom arrives as ISO-WKB bytes
            self.f.write(
                '{"id": %d, "layer": "%s", "wkb_type": %d, "tags": %d}\n'
                % (osm_id, layer_name, code, len(tags))
            )
            self.n += 1

        def finalize(self):
            self.f.close()

    plugin = GeoJsonSeq(os.path.join(tempdir, "example.geojsonl"))
    write_to_plugin(features, plugin)
    print("plugin wrote", plugin.n, "rows to", plugin.files[0])

    print(theme_counts(ray.data.read_parquet(features)).to_pandas().to_string())
    for f in files:
        print(f)
    print("outputs under", tempdir)
    ray.shutdown()


if __name__ == "__main__":
    main()
