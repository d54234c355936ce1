"""Feature builders: element/geometry rows → clipped, theme-routable
features. Callable classes for ``map_batches`` actor pools — compiled
themes and the prepared AOI are built once per actor (``__init__``), the
per-batch path is vectorized masks + per-matched-row geometry work
(reference computes geometry lazily only when ≥1 theme matches,
tabular.py:269-275; here the union-of-themes mask plays that role).

Uniform output schema (all builders):
    osm_id:int64, geom_type:int8 (output class), match_geom_type:int8
    (class used for theme matching — differs under centroid mode,
    reference tabular.py:330-334), tags:map<string,string>, wkb:binary,
    lon/lat:float64 (points & centroids), minx/miny/maxx/maxy:float64,
    cell:uint64, doc_id:string, offset:int32, source_kind:string.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray import GeomType
from osm_export_tool_python_ray.functions import wkb as wkbmod
from osm_export_tool_python_ray.functions.cells import cell_of
from osm_export_tool_python_ray.functions.kernels import PreparedPolygon, polygon_centroid
from osm_export_tool_python_ray.stages.matcher_eval import (
    CompiledThemes,
    closed_way_is_polygon_mask,
    eval_expr,
    extract_tag_columns,
    tag_count,
)

FEATURE_FIELDS = [
    ("osm_id", pa.int64()),
    ("geom_type", pa.int8()),
    ("match_geom_type", pa.int8()),
    ("tags", pa.map_(pa.string(), pa.string())),
    ("wkb", pa.binary()),
    ("lon", pa.float64()),
    ("lat", pa.float64()),
    ("minx", pa.float64()),
    ("miny", pa.float64()),
    ("maxx", pa.float64()),
    ("maxy", pa.float64()),
    ("cell", pa.uint64()),
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("source_kind", pa.string()),
    # per-row theme-match bitmask (bit i = mapping.themes[i] matched for
    # this row's geom class) — evaluated once in the builders, consumed
    # and dropped by ThemeRouter, so matchers never run twice per row
    ("theme_bits", pa.uint64()),
]
FEATURE_SCHEMA = pa.schema(FEATURE_FIELDS)


def _empty_features():
    return pa.table(
        {name: pa.array([], type=t) for name, t in FEATURE_FIELDS}
    )


def _feature_table(osm_id, geom_type, match_geom_type, tags, wkb_col, lon, lat, bbox, doc_id, offset, source_kind, theme_bits):
    n = len(osm_id)
    cx = (bbox[:, 0] + bbox[:, 2]) / 2.0 if n else np.array([])
    cy = (bbox[:, 1] + bbox[:, 3]) / 2.0 if n else np.array([])
    cells = cell_of(cx, cy) if n else np.array([], dtype=np.uint64)
    return pa.table(
        {
            "osm_id": pa.array(np.asarray(osm_id, dtype=np.int64)),
            "geom_type": pa.array(np.asarray(geom_type, dtype=np.int8)),
            "match_geom_type": pa.array(np.asarray(match_geom_type, dtype=np.int8)),
            "tags": tags,
            "wkb": pa.array(wkb_col, type=pa.binary()),
            "lon": pa.array(np.asarray(lon, dtype=np.float64)),
            "lat": pa.array(np.asarray(lat, dtype=np.float64)),
            "minx": pa.array(bbox[:, 0] if n else np.array([])),
            "miny": pa.array(bbox[:, 1] if n else np.array([])),
            "maxx": pa.array(bbox[:, 2] if n else np.array([])),
            "maxy": pa.array(bbox[:, 3] if n else np.array([])),
            "cell": pa.array(cells, type=pa.uint64()),
            "doc_id": doc_id,
            "offset": offset,
            "source_kind": pa.array(source_kind, type=pa.string())
            if not isinstance(source_kind, str)
            else pa.array([source_kind] * n, type=pa.string()),
            "theme_bits": pa.array(np.asarray(theme_bits, dtype=np.uint64), type=pa.uint64()),
        }
    )


def _point_wkb_column(lon, lat):
    """Vectorized WKB point encoding: one (n,21) byte matrix → BinaryArray."""
    n = len(lon)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1
    buf[:, 2:5] = 0
    coords = np.stack([lon, lat], axis=1).astype("<f8")
    buf[:, 5:] = coords.view(np.uint8).reshape(n, 16)
    offsets = pa.py_buffer(np.arange(0, 21 * (n + 1), 21, dtype=np.int32).tobytes())
    data = pa.py_buffer(buf.tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])


class PointFeatures:
    """Tagged nodes → POINT features (reference tabular.py:263-277).
    Boundary points are DROPPED under clipping (strict contains)."""

    def __init__(self, mapping, aoi_polygons=None):
        self.compiled = CompiledThemes(mapping.themes)
        self.prep = PreparedPolygon(aoi_polygons) if aoi_polygons else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        tags = batch.column("tags")
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        keep = tag_count(tags) > 0
        bits = self.compiled.bitmask(tags, GeomType.POINT)
        keep &= bits != 0
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        if self.prep is not None:
            idx = np.nonzero(keep)[0]
            inside = self.prep.contains_points(lon[idx], lat[idx])
            keep[idx] = inside
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            return _empty_features()
        lon, lat = lon[idx], lat[idx]
        sub = batch.take(pa.array(idx))
        bbox = np.stack([lon, lat, lon, lat], axis=1)
        return _feature_table(
            sub.column("element_id").to_numpy(zero_copy_only=False),
            np.full(len(idx), 1),
            np.full(len(idx), 1),
            sub.column("tags").combine_chunks()
            if isinstance(sub.column("tags"), pa.ChunkedArray)
            else sub.column("tags"),
            _point_wkb_column(lon, lat),
            lon,
            lat,
            bbox,
            sub.column("doc_id"),
            sub.column("offset"),
            "node",
            bits[idx],
        )


class WayFeatures:
    """Assembled ways (+tags) → LINE features and way-POLYGON features
    (reference tabular.py:279-306 and the from_way() half of 308-339).
    Input batch: way_id, lons, lats, n_pts, complete, is_closed, tags,
    doc_id, offset."""

    def __init__(self, mapping, aoi_polygons=None, polygon_centroid=False):
        self.compiled = CompiledThemes(mapping.themes)
        self.prep = PreparedPolygon(aoi_polygons) if aoi_polygons else None
        self.centroid = polygon_centroid

    def __call__(self, batch: pa.Table) -> pa.Table:
        tags = batch.column("tags")
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        tagged = tag_count(tags) > 0
        complete = batch.column("complete").to_numpy(zero_copy_only=False)
        closed = batch.column("is_closed").to_numpy(zero_copy_only=False)
        is_poly = closed & closed_way_is_polygon_mask(tags)

        n_pts = batch.column("n_pts").to_numpy(zero_copy_only=False)
        line_bits = self.compiled.bitmask(tags, GeomType.LINE)
        area_bits = self.compiled.bitmask(tags, GeomType.POLYGON)
        line_cand = tagged & ~is_poly & complete & (n_pts >= 2) & (line_bits != 0)
        area_cand = tagged & is_poly & complete & (area_bits != 0)

        way_id = batch.column("way_id").to_numpy(zero_copy_only=False)
        lons_col = batch.column("lons")
        lats_col = batch.column("lats")

        rows = {k: [] for k in ("osm_id", "gt", "mgt", "ti", "wkb", "lon", "lat", "bbox", "bits")}

        def emit(i, gt, mgt, buf, lon=np.nan, lat=np.nan, bbox=None):
            rows["osm_id"].append(way_id[i])
            rows["gt"].append(gt)
            rows["mgt"].append(mgt)
            rows["ti"].append(i)
            rows["wkb"].append(buf)
            rows["lon"].append(lon)
            rows["lat"].append(lat)
            rows["bbox"].append(bbox)
            rows["bits"].append(line_bits[i] if mgt == 2 else area_bits[i])

        vector_lines = None
        if self.prep is None:
            # no AOI: whole-batch vectorized LINESTRING encoding straight
            # from the Arrow list buffers (no per-row Python)
            line_idx = np.nonzero(line_cand)[0]
            if len(line_idx):
                wkb_arr, bbox = wkbmod.linestrings_wkb_vectorized(
                    lons_col, lats_col, line_idx
                )
                sub = batch.take(pa.array(line_idx))
                stags = sub.column("tags")
                if isinstance(stags, pa.ChunkedArray):
                    stags = stags.combine_chunks()
                vector_lines = _feature_table(
                    way_id[line_idx],
                    np.full(len(line_idx), 2),
                    np.full(len(line_idx), 2),
                    stags,
                    wkb_arr,
                    np.full(len(line_idx), np.nan),
                    np.full(len(line_idx), np.nan),
                    bbox,
                    sub.column("doc_id"),
                    sub.column("offset"),
                    "way",
                    line_bits[line_idx],
                )
        else:
            # vectorized bbox-vs-AOI prefilter (ADVICE round-1 #5): rows
            # wholly inside take the batched no-AOI encode path, rows whose
            # bbox meets no AOI edge and sample outside are dropped — only
            # boundary-straddling rows pay the per-row clip cascade
            line_idx = np.nonzero(line_cand)[0]
            exact_lines = np.array([], dtype=np.int64)
            if len(line_idx):
                bbox4, fx, fy = wkbmod.list_bboxes(lons_col, lats_col, line_idx)
                cls = self.prep.classify_bboxes(
                    bbox4[:, 0], bbox4[:, 1], bbox4[:, 2], bbox4[:, 3], fx, fy
                )
                inside = line_idx[cls == 1]
                exact_lines = line_idx[cls == 2]
                if len(inside):
                    wkb_arr, ibbox = wkbmod.linestrings_wkb_vectorized(
                        lons_col, lats_col, inside
                    )
                    sub = batch.take(pa.array(inside))
                    stags = sub.column("tags")
                    if isinstance(stags, pa.ChunkedArray):
                        stags = stags.combine_chunks()
                    vector_lines = _feature_table(
                        way_id[inside],
                        np.full(len(inside), 2),
                        np.full(len(inside), 2),
                        stags,
                        wkb_arr,
                        np.full(len(inside), np.nan),
                        np.full(len(inside), np.nan),
                        ibbox,
                        sub.column("doc_id"),
                        sub.column("offset"),
                        "way",
                        line_bits[inside],
                    )
            if len(exact_lines):
                lons = lons_col.to_pylist()
                lats = lats_col.to_pylist()
                for i in exact_lines:
                    coords = np.stack([lons[i], lats[i]], axis=1)
                    if not self.prep.intersects_line(coords):
                        continue
                    if not self.prep.contains_properly_line(coords):
                        parts = self.prep.clip_line(coords)
                        if not parts:
                            continue
                        buf = (
                            wkbmod.linestring_wkb(parts[0])
                            if len(parts) == 1
                            else wkbmod.multilinestring_wkb(parts)
                        )
                        allpts = np.vstack(parts)
                        emit(i, 2, 2, buf, bbox=(allpts[:, 0].min(), allpts[:, 1].min(), allpts[:, 0].max(), allpts[:, 1].max()))
                        continue
                    emit(
                        i, 2, 2, wkbmod.linestring_wkb(coords),
                        bbox=(coords[:, 0].min(), coords[:, 1].min(), coords[:, 0].max(), coords[:, 1].max()),
                    )

        area_idx = np.nonzero(area_cand)[0]
        if len(area_idx):
            area_cls = None
            if self.prep is not None:
                bbox4, fx, fy = wkbmod.list_bboxes(lons_col, lats_col, area_idx)
                area_cls = self.prep.classify_bboxes(
                    bbox4[:, 0], bbox4[:, 1], bbox4[:, 2], bbox4[:, 3], fx, fy
                )
                area_idx = area_idx[area_cls != 0]
                area_cls = area_cls[area_cls != 0]
            lons = lons_col.to_pylist()
            lats = lats_col.to_pylist()
            for j, i in enumerate(area_idx):
                ring = np.stack([lons[i], lats[i]], axis=1)
                polys = [[ring]]
                if self.prep is not None and area_cls[j] == 2:
                    if not self.prep.intersects_polygon(polys):
                        continue
                    if not self.prep.contains_properly_polygon(polys):
                        polys = self.prep.clip_polygon(polys)
                        if not polys:
                            continue
                self._emit_area(emit, i, int(way_id[i]), polys)

        looped = self._finish(batch, rows)
        if vector_lines is not None:
            return pa.concat_tables([vector_lines, looped]) if looped.num_rows else vector_lines
        return looped

    def _emit_area(self, emit, i, osm_id, polys):
        allpts = np.vstack([r for p in polys for r in p])
        bbox = (allpts[:, 0].min(), allpts[:, 1].min(), allpts[:, 0].max(), allpts[:, 1].max())
        if self.centroid:
            cx, cy = polygon_centroid(polys)
            emit(i, 1, 3, wkbmod.point_wkb(cx, cy), lon=cx, lat=cy, bbox=(cx, cy, cx, cy))
        else:
            emit(i, 3, 3, wkbmod.multipolygon_wkb(polys), bbox=bbox)

    def _finish(self, batch, rows):
        if not rows["osm_id"]:
            return _empty_features()
        ti = pa.array(np.asarray(rows["ti"], dtype=np.int64))
        sub = batch.take(ti)
        tags = sub.column("tags")
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        bbox = np.asarray(rows["bbox"], dtype=np.float64)
        return _feature_table(
            rows["osm_id"],
            rows["gt"],
            rows["mgt"],
            tags,
            rows["wkb"],
            rows["lon"],
            rows["lat"],
            bbox,
            sub.column("doc_id"),
            sub.column("offset"),
            "way",
            rows["bits"],
        )


class RelationAreaFeatures(WayFeatures):
    """Stitched relation multipolygons (+tags) → POLYGON features with
    NEGATED osm_id (reference tabular.py:313, README.md:58). Input batch:
    relation_id, wkb, minx..maxy, valid, tags, doc_id, offset."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        tags = batch.column("tags")
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        valid = batch.column("valid").to_numpy(zero_copy_only=False)
        rel_bits = self.compiled.bitmask(tags, GeomType.POLYGON)
        cand = (
            valid
            & (tag_count(tags) > 0)
            & closed_way_is_polygon_mask(tags)
            & (rel_bits != 0)
        )
        rel_id = batch.column("relation_id").to_numpy(zero_copy_only=False)
        wkbs = batch.column("wkb").to_pylist()

        rows = {k: [] for k in ("osm_id", "gt", "mgt", "ti", "wkb", "lon", "lat", "bbox", "bits")}

        def emit(i, gt, mgt, buf, lon=np.nan, lat=np.nan, bbox=None):
            rows["osm_id"].append(-rel_id[i])
            rows["gt"].append(gt)
            rows["mgt"].append(mgt)
            rows["ti"].append(i)
            rows["wkb"].append(buf)
            rows["lon"].append(lon)
            rows["lat"].append(lat)
            rows["bbox"].append(bbox)
            rows["bits"].append(rel_bits[i])

        cand_idx = np.nonzero(cand)[0]
        cls = None
        if self.prep is not None and len(cand_idx):
            # bbox prefilter on the assembly-stage bbox columns; sample
            # point = first multipolygon vertex read straight from the WKB
            # header (offset 22: MP hdr 9 + POLY hdr 9 + ring count 4)
            minx = batch.column("minx").to_numpy(zero_copy_only=False)[cand_idx]
            miny = batch.column("miny").to_numpy(zero_copy_only=False)[cand_idx]
            maxx = batch.column("maxx").to_numpy(zero_copy_only=False)[cand_idx]
            maxy = batch.column("maxy").to_numpy(zero_copy_only=False)[cand_idx]
            fx = np.empty(len(cand_idx))
            fy = np.empty(len(cand_idx))
            for j, i in enumerate(cand_idx):
                fx[j], fy[j] = np.frombuffer(wkbs[i], dtype="<f8", count=2, offset=22)
            cls = self.prep.classify_bboxes(minx, miny, maxx, maxy, fx, fy)
            cand_idx = cand_idx[cls != 0]
            cls = cls[cls != 0]
        for j, i in enumerate(cand_idx):
            _t, polys = wkbmod.decode(wkbs[i])
            if self.prep is not None and cls[j] == 2:
                if not self.prep.intersects_polygon(polys):
                    continue
                if not self.prep.contains_properly_polygon(polys):
                    polys = self.prep.clip_polygon(polys)
                    if not polys:
                        continue
            self._emit_area(emit, i, int(-rel_id[i]), polys)

        out = self._finish(batch, rows)
        if out.num_rows:
            out = out.set_column(
                out.schema.get_field_index("source_kind"),
                "source_kind",
                pa.array(["relation"] * out.num_rows, type=pa.string()),
            )
        return out


class ThemeRouter:
    """Feature rows → (theme, feature) rows: one output row per matching
    theme (reference loops themes per element, tabular.py:267-277; rows
    matching several themes are duplicated — flat_map semantics)."""

    def __init__(self, mapping):
        self.compiled = CompiledThemes(mapping.themes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # matchers already ran in the feature builders (bitmask on the
        # theme_bits column, bit i = themes[i]); routing is pure bit tests
        bits = batch.column("theme_bits").to_numpy(zero_copy_only=False).astype(np.uint64)
        bi = batch.schema.get_field_index("theme_bits")
        parts = []
        for i, t in enumerate(self.compiled.themes):
            idx = np.nonzero((bits >> np.uint64(i)) & np.uint64(1))[0]
            if len(idx) == 0:
                continue
            sub = batch.take(pa.array(idx)).remove_column(bi)
            sub = sub.append_column("theme", pa.array([t.name] * len(idx), type=pa.string()))
            parts.append(sub)
        if not parts:
            empty = _empty_features().drop_columns(["theme_bits"])
            return empty.append_column("theme", pa.array([], type=pa.string()))
        return pa.concat_tables(parts)
