"""CLI mirroring ``bin/osm-export-tool`` (reference cmd.py:11-66):

    python -m osm_export_tool_python_ray.cli CORPUS.parquet OUTPUT_NAME \
        [-m MAPPING.yml] [-f gpkg shp kml geojsonl mgpkg] [--clip AOI] [-v] \
        [--omit-osm-ids] [--centroid] [--workdir DIR] [--num-cpus N]

CORPUS is a parquet file/dir of interleaved documents (input_hint
shape), or a native ``.osm.pbf`` file (sources/pbf.py pure-numpy decode —
the reference's only input format, cmd.py:58).
This module owns a Ray session (scripts do; library code does not).
"""

import argparse
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="Ray-Data OSM export engine")
    parser.add_argument(
        "corpus", help="interleaved-document parquet path or .osm.pbf file"
    )
    parser.add_argument("output_name", help="output path base name")
    parser.add_argument("-m", "--mapping", help="YAML mapping file")
    parser.add_argument(
        "-f",
        "--formats",
        nargs="+",
        default=["gpkg"],
        help="output formats: space- or comma-separated (reference cmd.py:14 "
        "takes 'gpkg,shp'; both syntaxes accepted)",
    )
    parser.add_argument("--clip", help="GeoJSON or POLY file to clip to")
    parser.add_argument("--omit-osm-ids", action="store_true")
    parser.add_argument("--centroid", action="store_true", help="polygon centroids as points")
    parser.add_argument("--workdir", help="checkpoint dir (resumable)")
    parser.add_argument(
        "--staging-only",
        action="store_true",
        help="stop at the staged parquet layer layout (the distributed, "
        "resumable scale product); skip the serial binary container tail",
    )
    parser.add_argument(
        "--partitions",
        type=int,
        default=0,
        help="run per-input-partition with skip-completed resume (requires "
        "locality-closed partitions; see pipelines/partitioned.py)",
    )
    parser.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    # reference CLI takes a comma-separated string (cmd.py:14: -f gpkg,shp);
    # accept that alongside the space-separated form
    args.formats = [p for f in args.formats for p in f.split(",") if p]
    bad = [f for f in args.formats if f not in ("gpkg", "shp", "kml", "geojsonl", "mgpkg")]
    if bad:
        parser.error("unknown format(s): %s" % ",".join(bad))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR" if not args.verbose else "INFO",
        )
    import logging

    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = bool(args.verbose)
    if not args.verbose:
        logging.getLogger("ray.data").setLevel(logging.ERROR)

    from osm_export_tool_python_ray.geometry import load_geometry
    from osm_export_tool_python_ray.mapping import Mapping
    from osm_export_tool_python_ray.pipelines.export import run_export
    from osm_export_tool_python_ray.sinks import GeoJsonSeq, Geopackage, Kml, MultiGeopackage, Shapefile

    if args.mapping:
        with open(args.mapping) as f:
            mapping_txt = f.read()
    else:
        with open(
            os.path.join(os.path.dirname(__file__), "mappings", "default.yml")
        ) as f:
            mapping_txt = f.read()
    mapping, errors = Mapping.validate(mapping_txt, default_osm_id=not args.omit_osm_ids)
    if errors:
        for e in errors:
            print(e, file=sys.stderr)
        return 1

    aoi = None
    if args.clip:
        with open(args.clip) as f:
            aoi = load_geometry(f.read())

    start = time.time()
    workdir = args.workdir or (args.output_name + ".work")
    sink_cls = {"gpkg": Geopackage, "shp": Shapefile, "kml": Kml, "geojsonl": GeoJsonSeq, "mgpkg": MultiGeopackage}
    files = []
    if args.partitions > 0:
        from osm_export_tool_python_ray.pipelines.partitioned import run_export_partitioned

        feature_dirs, metrics = run_export_partitioned(
            args.corpus,
            mapping,
            workdir,
            num_partitions=args.partitions,
            aoi_polygons=aoi,
            polygon_centroid=args.centroid,
            num_buckets=max(16, args.num_cpus * 4),
        )
        print(
            "partitions: %d executed, %d resumed"
            % (metrics["executed"], metrics["skipped"])
        )
        # each features dir is hive-partitioned (theme=...); read_parquet
        # needs one root per call to resolve the partition column
        part_ds = [ray.data.read_parquet(d) for d in feature_dirs]
        themed = part_ds[0].union(*part_ds[1:]) if len(part_ds) > 1 else part_ds[0]
        for fmt in args.formats:
            sink = sink_cls[fmt](
                args.output_name, mapping,
                omit_osm_ids=args.omit_osm_ids, polygon_centroid=args.centroid,
                encode_container=not args.staging_only,
            )
            files.extend(sink.write_from(themed))
            sink.finalize()
    else:
        if args.corpus.endswith(".pbf"):
            # native OSM input (reference cmd.py:58): pure-numpy PBF
            # decode fans out per blob; same dedup + pipeline after
            from osm_export_tool_python_ray.sources.pbf import read_osm_pbf

            docs, elements_ds = None, read_osm_pbf(args.corpus)
        else:
            docs, elements_ds = ray.data.read_parquet(args.corpus), None
        run_export(
            docs,
            mapping,
            elements_ds=elements_ds,
            aoi_polygons=aoi,
            polygon_centroid=args.centroid,
            workdir=workdir,
            num_partitions=max(4, args.num_cpus),
            num_buckets=max(16, args.num_cpus * 4),
        )
        features_path = os.path.join(workdir, "features")
        for fmt in args.formats:
            sink = sink_cls[fmt](
                args.output_name, mapping,
                omit_osm_ids=args.omit_osm_ids, polygon_centroid=args.centroid,
                encode_container=not args.staging_only,
            )
            files.extend(sink.write_from(features_path))
            sink.finalize()

    print("Elapsed: {0}".format(time.time() - start))
    for f in files:
        print(f)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
