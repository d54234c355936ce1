"""Output sinks: theme-projected partitioned Parquet layouts mirroring the
reference's OGR sinks (reference tabular.py:32-249), plus zip / POSM-bundle
packaging (reference package.py:10-67).

Layout semantics preserved per sink:
* Geopackage  — ONE dataset, one layer (subdir) per theme, geometry types
  mixed in a layer (wkbUnknown, reference tabular.py:149).
* Shapefile   — one layer per theme×geomtype with field names laundered
  ``re.sub(r'[^a-zA-Z0-9_]','',col)[0:10]`` (reference tabular.py:89-90).
* Kml         — one layer per theme×geomtype, unlaundered names.
* MultiGeopackage — one dataset per theme (legacy, reference tabular.py:199).

Deviation from the reference's duck-type: sinks here consume the themed
feature checkpoint (a Dataset/parquet dir) instead of per-row ``write()``
calls — per-row writes don't exist in Ray Data; the projection itself is a
vectorized ``map_batches``. Layer schema parity: ``osm_id:int64?`` +
selected keys as nullable strings (reference tabular.py:41-50), ordered by
sorted(theme.keys) for determinism (the reference iterates a Python set).
Writes are staged + atomically renamed with ``_SUCCESS`` (T4 transaction
analog).
"""

import json
import os
import re
import shutil
import tarfile
import zipfile

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray import File, make_filename
from osm_export_tool_python_ray.stages.matcher_eval import extract_tag_columns

_GEOM_NAMES = {1: "points", 2: "lines", 3: "polygons"}


def launder_name(col):
    """Shapefile field-name laundering (reference tabular.py:89-90)."""
    return re.sub(r"[^a-zA-Z0-9_]", "", col)[0:10]


class ThemeProjector:
    """features batch → layer schema: osm_id? + selected tag keys as
    string columns (absent tag ⇒ null; reference tabular.py:182-191),
    + the WKB geometry column."""

    def __init__(self, theme, omit_osm_id=False, launder=False):
        self.keys = sorted(theme.keys)
        self.osm_id = theme.osm_id and not omit_osm_id
        self.launder = launder

    def __call__(self, t: pa.Table) -> pa.Table:
        tags = t.column("tags")
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        cols = {}
        if self.osm_id:
            cols["osm_id"] = t.column("osm_id")
        extracted = extract_tag_columns(tags, self.keys)
        for k in self.keys:
            present, vals = extracted[k]
            vals = np.where(present, vals, None)
            name = launder_name(k) if self.launder else k
            cols[name] = pa.array(vals.tolist(), type=pa.string())
        cols["geom_type"] = t.column("geom_type")
        cols["wkb"] = t.column("wkb")
        return pa.table(cols)


def _theme_ds(features, theme_name):
    """One theme's rows from the themed feature checkpoint (hive-partitioned
    dir → partition-pruned read) or an in-memory Dataset (filtered)."""
    import pyarrow.compute as pc
    import ray.data

    if isinstance(features, str):
        part = os.path.join(features, "theme=%s" % theme_name)
        if not os.path.isdir(part):
            return None
        return ray.data.read_parquet(part)
    return features.map_batches(
        lambda t: t.filter(pc.equal(t.column("theme"), theme_name)),
        batch_format="pyarrow",
    )


def _atomic_write(ds, path):
    staging = path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging, exist_ok=True)  # empty datasets create no files
    ds.write_parquet(staging)
    open(os.path.join(staging, "_SUCCESS"), "w").close()
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(staging, path)


def _iter_layer_batches(path):
    """Stream a staged layer's parquet parts one record batch at a time
    (O(batch) memory for the container-encode tail)."""
    import glob

    import pyarrow.parquet as pq

    for fn in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = pq.ParquetFile(fn)
        for batch in pf.iter_batches():
            yield pa.Table.from_batches([batch])


def _batch_cols(t, field_names, has_id):
    wkb_vals = t.column("wkb").to_pylist()
    osm_ids = t.column("osm_id").to_pylist() if has_id else None
    field_cols = [t.column(n).to_pylist() for n in field_names]
    return wkb_vals, osm_ids, field_cols


def _encode_one_layer(kind, target, layer_name, gt, fields, has_id, staged_path):
    """Encode ONE independent container file (a shp 5-file set, a kml, or a
    single-theme gpkg) from its staged parquet layer. Pure function of
    primitives so it runs as a Ray task — every layer of a Shapefile / KML /
    MultiGeopackage export is its own file, so the container tail
    parallelizes O(layers) instead of looping on the driver. Assumes the
    output directory is shared/visible across workers (same contract as
    ``Dataset.write_parquet`` to a local path)."""
    from osm_export_tool_python_ray.functions import containers as C

    if kind == "shp":
        w = C.ShapefileLayerWriter(target, gt, fields, has_id)
        write, close = w.write_batch, w.close
    elif kind == "kml":
        w = C.KmlFile(target + ".kml", layer_name, fields, has_id)
        write, close = w.write_batch, w.close
    elif kind == "geojsonl":
        w = C.GeoJsonSeqFile(target + ".geojsonl", layer_name, fields, has_id)
        write, close = w.write_batch, w.close
    else:  # one-theme gpkg (MultiGeopackage)
        tmp = target + ".part"
        g = C.GeoPackageFile(tmp)
        g.add_layer(layer_name, fields, has_id)
        write = lambda *a: g.write_batch(layer_name, *a)  # noqa: E731

        def close():
            g.close()
            os.replace(tmp, target)

    if staged_path is not None:
        for t in _iter_layer_batches(staged_path):
            write(*_batch_cols(t, fields, has_id))
    close()


def _run_layer_tasks(specs):
    """specs: [(kind, target, layer_name, gt, fields, has_id, staged_path)].
    One Ray task per independent container file; sequential fallback when
    Ray isn't up (plain library use)."""
    import ray

    if len(specs) > 1 and ray.is_initialized():
        fn = ray.remote(num_cpus=1)(_encode_one_layer)
        ray.get([fn.remote(*s) for s in specs])
    else:
        for s in specs:
            _encode_one_layer(*s)


class Geopackage:
    """Real ``<output_name>.gpkg`` (stdlib-sqlite3 GeoPackage,
    functions/containers.py) — one layer per theme, geometry classes mixed
    (reference tabular.py:146-196) — plus the distributed staging layout
    ``<output_name>.gpkg.d/<theme>/part-*.parquet`` the container is
    streamed from (the resumable scale path)."""

    suffix = ".gpkg.d"
    launder = False
    split_geom = False

    def __init__(
        self,
        output_name,
        mapping,
        omit_osm_ids=False,
        polygon_centroid=False,
        encode_container=True,
        parallel_encode=None,
    ):
        """``encode_container=False`` stops after the staged parquet layout
        (the distributed, resumable product) and skips the binary
        container tail. The scale posture, explicit: a SINGLE .gpkg is an
        intentionally serial final-mile artifact — sqlite has one writer —
        so at 100 TB the staging layout is what ships, and per-layer
        formats (MultiGeopackage/Shapefile/KML) encode as parallel Ray
        tasks (_run_layer_tasks). The one-file GeoPackage encodes its
        themes as the same parallel tasks (one temp .gpkg per theme) and
        folds them with C-level sqlite ATTACH copies, so only page writes
        stay serial; ``parallel_encode`` forces the branch (None = auto:
        parallel when Ray is up and >1 staged theme)."""
        self.output_name = output_name
        self.mapping = mapping
        self.omit = omit_osm_ids
        self.polygon_centroid = polygon_centroid
        self.encode_container = encode_container
        self.parallel_encode = parallel_encode
        self.files = []
        self._staged = []  # (theme, geom_class|None, staged_path|None)

    def _geom_layers(self, theme):
        """geom classes the reference would create layers for
        (tabular.py:60-68,120-128; centroid quirk: polygon rows arrive as
        points, see staging note below)."""
        out = []
        if theme.points or (self.polygon_centroid and theme.polygons):
            out.append(1)
        if theme.lines:
            out.append(2)
        if theme.polygons:
            out.append(3)
        return out

    def write_from(self, features):
        root = self.output_name + self.suffix
        os.makedirs(root, exist_ok=True)
        for theme in self.mapping.themes:
            ds = _theme_ds(features, theme.name)
            if self.split_geom:
                for gt in self._geom_layers(theme):
                    # under --centroid, polygon features arrive as
                    # geom_type=1 rows even for polygon-only themes — emit
                    # the points layer for them instead of dropping
                    # (reference would KeyError here, tabular.py:73,134)
                    name = "%s_%s_%s" % (
                        os.path.basename(self.output_name),
                        make_filename(theme.name),
                        _GEOM_NAMES[gt],
                    )
                    path = os.path.join(root, name)
                    if ds is not None:
                        import pyarrow.compute as pc

                        sub = ds.map_batches(
                            lambda t, gt=gt: t.filter(pc.equal(t.column("geom_type"), gt)),
                            batch_format="pyarrow",
                        ).map_batches(
                            ThemeProjector(theme, self.omit, self.launder),
                            batch_format="pyarrow",
                        )
                        _atomic_write(sub, path)
                        self.files.append(
                            File(self.format_name, [path], {"theme": theme.name})
                        )
                    self._staged.append((theme, gt, path if ds is not None else None))
            else:
                path = os.path.join(root, make_filename(theme.name))
                if ds is not None:
                    proj = ds.map_batches(
                        ThemeProjector(theme, self.omit, self.launder),
                        batch_format="pyarrow",
                    )
                    _atomic_write(proj, path)
                    self.files.append(
                        File(self.format_name, [path], {"theme": theme.name})
                    )
                self._staged.append((theme, None, path if ds is not None else None))
        if self.encode_container:
            self._encode_containers()
        return self.files

    format_name = "gpkg"

    # -- real binary container (streamed from the staged layout) ----------

    def _layer_fields(self, theme):
        keys = sorted(theme.keys)
        return [launder_name(k) for k in keys] if self.launder else keys

    def _theme_has_id(self, theme):
        return bool(theme.osm_id) and not self.omit

    def _encode_containers(self):
        import ray

        from osm_export_tool_python_ray.functions.containers import GeoPackageFile

        cpath = self.output_name + ".gpkg"
        tmp = cpath + ".part"
        staged = [(t, p) for t, _gt, p in self._staged if p is not None]
        use_parallel = (
            self.parallel_encode
            if self.parallel_encode is not None
            else (ray.is_initialized() and len(staged) > 1)
        )
        if use_parallel and staged:
            # PARALLEL tail: each theme's layer encodes to its own temp
            # .gpkg as a Ray task (the Python-heavy wkb→blob conversion
            # parallelizes O(themes)); the single-file constraint then
            # costs only a C-level sqlite ATTACH row copy per layer.
            specs, parts = [], []
            for theme, p in staged:
                part = "%s.layer-%s.part.gpkg" % (tmp, make_filename(theme.name))
                specs.append(
                    ("gpkg", part, theme.name, None,
                     self._layer_fields(theme), self._theme_has_id(theme), p)
                )
                parts.append((theme.name, part))
            _run_layer_tasks(specs)
            g = GeoPackageFile(tmp)
            for theme in self.mapping.themes:
                g.add_layer(
                    theme.name, self._layer_fields(theme), self._theme_has_id(theme)
                )
            for name, part in parts:
                g.merge_layer_file(name, part)
            g.close()
            for _name, part in parts:
                os.remove(part)
        else:
            g = GeoPackageFile(tmp)
            for theme in self.mapping.themes:
                g.add_layer(theme.name, self._layer_fields(theme), self._theme_has_id(theme))
            for theme, p in staged:
                fields, has_id = self._layer_fields(theme), self._theme_has_id(theme)
                for t in _iter_layer_batches(p):
                    g.write_batch(theme.name, *_batch_cols(t, fields, has_id))
            g.close()
        os.replace(tmp, cpath)
        self.files.insert(0, File("gpkg", [cpath]))

    def finalize(self):
        pass


class MultiGeopackage(Geopackage):
    """One real .gpkg per theme (reference tabular.py:199-249)."""

    suffix = ".mgpkg.d"
    format_name = "gpkg"

    def _encode_containers(self):
        staged_by_theme = {t.name: p for t, _g, p in self._staged}
        specs, recs = [], []
        for theme in self.mapping.themes:
            cpath = "%s_%s.gpkg" % (self.output_name, make_filename(theme.name))
            fields, has_id = self._layer_fields(theme), self._theme_has_id(theme)
            specs.append(
                ("gpkg", cpath, theme.name, None, fields, has_id, staged_by_theme.get(theme.name))
            )
            recs.append(File("gpkg", [cpath], {"theme": theme.name}))
        _run_layer_tasks(specs)
        for rec in recs:
            self.files.insert(0, rec)


class _SplitContainerMixin:
    def _encode_containers(self):
        specs, recs = [], []
        for theme, gt, path in self._staged:
            base = "%s_%s_%s" % (
                self.output_name,
                make_filename(theme.name),
                _GEOM_NAMES[gt],
            )
            fields, has_id = self._layer_fields(theme), self._theme_has_id(theme)
            specs.append((self.format_name, base, theme.name, gt, fields, has_id, path))
            recs.append(self._layer_file(base, theme))
        _run_layer_tasks(specs)
        for rec in recs:
            self.files.insert(0, rec)


class Shapefile(_SplitContainerMixin, Geopackage):
    """Real .shp/.shx/.dbf/.prj/.cpg per theme×geomtype with laundered
    10-char field names (reference tabular.py:86-144)."""

    suffix = ".shp.d"
    launder = True
    split_geom = True
    format_name = "shp"

    def _layer_file(self, base, theme):
        return File.shp(base, {"theme": theme.name})


class Kml(_SplitContainerMixin, Geopackage):
    """Real .kml per theme×geomtype, full field names
    (reference tabular.py:32-84)."""

    suffix = ".kml.d"
    launder = False
    split_geom = True
    format_name = "kml"

    def _layer_file(self, base, theme):
        return File("kml", [base + ".kml"], {"theme": theme.name})


class GeoJsonSeq(_SplitContainerMixin, Geopackage):
    """Real newline-delimited GeoJSON (.geojsonl, RFC 7946 features) per
    theme×geomtype, full field names. No reference analog (the reference
    stops at gpkg/shp/kml, tabular.py) — added because line-delimited
    features are the one text container that concatenates and splits at
    line boundaries, i.e. the natural distributed-sink format."""

    suffix = ".geojsonl.d"
    launder = False
    split_geom = True
    format_name = "geojsonl"

    def _layer_file(self, base, theme):
        return File("geojsonl", [base + ".geojsonl"], {"theme": theme.name})


def write_to_plugin(features, plugin, batch_size=1024):
    """Adapter for reference-style duck-typed output plugins (SURVEY
    §2.10; reference cmd.py:55-62 feeds any object exposing
    ``.write(osm_id, layer_name, geom_type, geom, tags)`` /
    ``.finalize()`` / ``.files`` — tabular.py:71,131,182,235).

    Parity: the reference calls ``write`` once per (theme, element) from
    a single osmium thread with the element's FULL tag dict
    (Handler.node/way/area, tabular.py:263-341). This adapter preserves
    those semantics from a themed-features Dataset (or staged parquet
    dir): batches stream to the driver via ``iter_batches`` (bounded
    memory) and the plugin is invoked per row. Deviations, documented:
    ``geom`` is ISO-WKB bytes rather than an ``osgeo.ogr.Geometry`` (no
    GDAL here — decode with ``functions/wkb.py`` or shapely), and row
    order is the engine's deterministic shard order, not PBF scan order.
    Inherently serial by the plugin contract (single-file writers); use
    the native distributed sinks for scale.
    """
    import ray.data

    from osm_export_tool_python_ray import GeomType

    ds = ray.data.read_parquet(features) if isinstance(features, str) else features
    for t in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        ids = t.column("osm_id").to_pylist()
        themes = t.column("theme").to_pylist()
        gts = t.column("geom_type").to_pylist()
        wkbs = t.column("wkb").to_pylist()
        tags = t.column("tags").to_pylist()
        for i in range(len(ids)):
            plugin.write(ids[i], themes[i], GeomType(gts[i]), wkbs[i], dict(tags[i]))
    plugin.finalize()
    return getattr(plugin, "files", [])


def create_package(destination, files, boundary_geom=None, output_name="zip"):
    """Zip all file parts + clipping_boundary.geojson
    (reference package.py:10-18). Directory parts are zipped recursively."""
    with zipfile.ZipFile(destination, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            for part in f.parts:
                if os.path.isdir(part):
                    for root, _d, fns in os.walk(part):
                        for fn in fns:
                            p = os.path.join(root, fn)
                            z.write(p, os.path.relpath(p, os.path.dirname(part)))
                elif os.path.exists(part):
                    z.write(part, os.path.basename(part))
        if boundary_geom is not None:
            z.writestr("clipping_boundary.geojson", json.dumps(_geom_to_geojson(boundary_geom)))
    return destination


def _geom_to_geojson(polygons):
    return {
        "type": "MultiPolygon",
        "coordinates": [
            [np.asarray(r).tolist() for r in rings] for rings in polygons
        ],
    }


def _bbox_of_polygons(polygons):
    pts = np.vstack([np.asarray(r) for rings in polygons for r in rings])
    return [
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    ]


def create_posm_bundle(destination, files, title, name, description, geom):
    """tar.gz with manifest.json (title, name, bbox, typed contents —
    reference package.py:20-67)."""
    contents = {}
    with tarfile.open(destination, "w:gz") as t:
        for f in files:
            for part in f.parts:
                if os.path.isdir(part):
                    for root, _d, fns in os.walk(part):
                        for fn in fns:
                            p = os.path.join(root, fn)
                            arc = os.path.relpath(p, os.path.dirname(part))
                            t.add(p, arcname=arc)
                            contents[arc] = {"type": f.output_name, **f.extra}
                elif os.path.exists(part):
                    t.add(part, arcname=os.path.basename(part))
                    contents[os.path.basename(part)] = {"type": f.output_name, **f.extra}
        manifest = {
            "title": title,
            "name": name,
            "description": description,
            "bbox": _bbox_of_polygons(geom) if geom is not None else None,
            "contents": contents,
        }
        data = json.dumps(manifest, indent=2).encode()
        import io

        info = tarfile.TarInfo("manifest.json")
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    return destination
