"""Real binary geo-container encoders — pure stdlib/numpy, no GDAL.

The reference delegates its three tabular output formats to OGR drivers
(reference tabular.py:36,93,168: ``GetDriverByName('KML'|'ESRI
Shapefile'|'GPKG')``). This sandbox has no GDAL, so the formats are encoded
directly from their public specifications:

* GeoPackage — OGC 12-128r15 (a SQLite 3 database with ``gpkg_contents`` /
  ``gpkg_geometry_columns`` / ``gpkg_spatial_ref_sys`` and GPB geometry
  blobs = ``"GP"`` header + ISO WKB). stdlib ``sqlite3``. Matches the
  reference's layer shape: one table per theme, mixed geometry
  (``wkbUnknown`` → ``GEOMETRY``), no spatial index (reference
  tabular.py:149 passes ``SPATIAL_INDEX=NO``), ``osm_id`` INTEGER + tag
  keys TEXT.
* ESRI Shapefile — the 1998 ESRI white paper format: ``.shp`` (geometry,
  mixed-endian record stream), ``.shx`` (index), ``.dbf`` (dBASE III
  attributes), ``.prj`` (WGS84 ESRI WKT), ``.cpg`` (``UTF-8``, reference
  tabular.py:94 ``ENCODING=UTF-8``).
* KML — OGC KML 2.2 XML: one ``<Schema>`` + one ``<Folder>`` of
  ``<Placemark>`` per layer, attributes as ``<SchemaData>``.

All three are STREAMING single-writer encoders: ``write_batch`` consumes one
Arrow batch at a time and appends; counters/extents accumulate and the
headers that need them (.shp/.shx lengths + bbox, .dbf record count,
``gpkg_contents`` extents) are patched at ``close()``. Nothing buffers more
than one batch, so the driver-side container tail is O(batch) memory no
matter the layer size. The distributed part of a sink run stays in the
staged-parquet layout (sinks.py); these encoders are the sequential tail a
single container file inherently requires (the reference's OGR writes are
equally sequential, tabular.py:182-196).

Determinism: timestamps that the formats require (``gpkg_contents
.last_change``, dbf header date) are fixed constants so byte-identical
inputs yield byte-identical containers (same philosophy as the engine's
hash-exact oracles).
"""

import os
import sqlite3
import struct

import numpy as np

from osm_export_tool_python_ray.functions import wkb as wkbmod

_WGS84_SRS_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    '0.0174532925199433,AUTHORITY["EPSG","9122"]],AUTHORITY["EPSG","4326"]]'
)
_WGS84_ESRI_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_84",6378137.0,'
    '298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",'
    "0.0174532925199433]]"
)
_FIXED_TIMESTAMP = "2000-01-01T00:00:00.000Z"

# GeoPackage binary header: magic "GP", version 0, flags 0x01
# (little-endian header, no envelope), srs_id 4326 little-endian.
_GPB_HEADER = b"GP\x00\x01" + struct.pack("<i", 4326)


def _geom_envelope(code, geom):
    """(minx, miny, maxx, maxy) of one decoded engine geometry."""
    if code == wkbmod.POINT:
        x, y = geom
        return x, y, x, y
    if code == wkbmod.LINESTRING:
        a = np.asarray(geom)
        return a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max()
    if code == wkbmod.POLYGON:
        a = np.asarray(geom[0])  # exterior ring bounds the holes
        return a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max()
    # multi types: union of parts
    parts = [
        _geom_envelope(
            wkbmod.LINESTRING if code == wkbmod.MULTILINESTRING else wkbmod.POLYGON, p
        )
        for p in geom
    ]
    arr = np.asarray(parts)
    return arr[:, 0].min(), arr[:, 1].min(), arr[:, 2].max(), arr[:, 3].max()


class _Extent:
    def __init__(self):
        self.minx = self.miny = np.inf
        self.maxx = self.maxy = -np.inf
        self.count = 0

    def add(self, minx, miny, maxx, maxy):
        self.minx = min(self.minx, minx)
        self.miny = min(self.miny, miny)
        self.maxx = max(self.maxx, maxx)
        self.maxy = max(self.maxy, maxy)
        self.count += 1

    def bounds_or_none(self):
        if not self.count:
            return None
        return (self.minx, self.miny, self.maxx, self.maxy)


# --------------------------------------------------------------------------
# GeoPackage (OGC 12-128r15)
# --------------------------------------------------------------------------


class GeoPackageFile:
    """One .gpkg SQLite file; ``add_layer`` per theme, ``write_batch``
    streams feature rows, ``close`` commits (reference tabular.py:169,194:
    StartTransaction → CommitTransaction)."""

    def __init__(self, path):
        if os.path.exists(path):
            os.remove(path)
        self.path = path
        self.db = sqlite3.connect(path)
        cur = self.db.cursor()
        cur.execute("PRAGMA application_id = 0x47504B47")  # "GPKG"
        cur.execute("PRAGMA user_version = 10200")  # GeoPackage 1.2
        cur.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL,"
            " srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL,"
            " organization_coordsys_id INTEGER NOT NULL,"
            " definition TEXT NOT NULL, description TEXT)"
        )
        cur.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
                ("WGS 84 geodetic", 4326, "EPSG", 4326, _WGS84_SRS_WKT, None),
            ],
        )
        cur.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY,"
            " data_type TEXT NOT NULL, identifier TEXT UNIQUE,"
            " description TEXT DEFAULT '', last_change DATETIME NOT NULL,"
            " min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,"
            " srs_id INTEGER,"
            " CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id)"
            " REFERENCES gpkg_spatial_ref_sys(srs_id))"
        )
        cur.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL,"
            " column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL,"
            " srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL,"
            " CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
        )
        self._layers = {}  # name -> (insert sql, field names, _Extent)
        self.db.commit()
        self.db.execute("BEGIN")

    def add_layer(self, name, fields, osm_id=True):
        """``fields`` are the (possibly laundered) tag-key column names, in
        layer order. Geometry type is GEOMETRY (mixed; wkbUnknown parity)."""
        cols = ['"fid" INTEGER PRIMARY KEY AUTOINCREMENT', '"geom" GEOMETRY']
        if osm_id:
            cols.append('"osm_id" INTEGER')
        cols += ['"%s" TEXT' % f.replace('"', '""') for f in fields]
        cur = self.db.cursor()
        cur.execute('CREATE TABLE "%s" (%s)' % (name.replace('"', '""'), ", ".join(cols)))
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,?,?)",
            (name, "geom", "GEOMETRY", 4326, 0, 0),
        )
        ncols = 1 + (1 if osm_id else 0) + len(fields)
        collist = ", ".join(
            ['"geom"']
            + (['"osm_id"'] if osm_id else [])
            + ['"%s"' % f.replace('"', '""') for f in fields]
        )
        sql = 'INSERT INTO "%s" (%s) VALUES (%s)' % (
            name.replace('"', '""'),
            collist,
            ",".join("?" * ncols),
        )
        self._layers[name] = (sql, osm_id, _Extent(), collist)

    def write_batch(self, name, wkb_vals, osm_ids, field_cols):
        """wkb_vals: list[bytes]; osm_ids: list[int] | None; field_cols:
        list of per-field value lists (None ⇒ SQL NULL)."""
        sql, has_id, ext, _collist = self._layers[name]
        for buf in wkb_vals:
            code, geom = wkbmod.decode(buf)
            ext.add(*_geom_envelope(code, geom))
        blobs = [_GPB_HEADER + b for b in wkb_vals]
        if has_id:
            rows = list(zip(blobs, osm_ids, *field_cols))
        else:
            rows = list(zip(blobs, *field_cols))
        self.db.executemany(sql, rows)

    def merge_layer_file(self, name, src_path):
        """Bulk-append a same-schema layer from another .gpkg — the tail
        of the PARALLEL per-theme encode (sinks.Geopackage): per-theme
        layer files encode concurrently as Ray tasks, then this C-level
        ATTACH + INSERT..SELECT copies rows without touching Python, so
        the only sequential cost is sqlite page writes. fid order follows
        the source's fid order (identical numbering to a sequential
        encode); the layer extent folds in from the source's
        gpkg_contents row."""
        _sql, _has_id, ext, collist = self._layers[name]
        qname = name.replace('"', '""')
        self.db.commit()  # ATTACH is not allowed inside a transaction
        cur = self.db.cursor()
        cur.execute("ATTACH DATABASE ? AS _src", (src_path,))
        try:
            cur.execute("BEGIN")
            cur.execute(
                'INSERT INTO "%s" (%s) SELECT %s FROM _src."%s" ORDER BY fid'
                % (qname, collist, collist, qname)
            )
            row = cur.execute(
                "SELECT min_x, min_y, max_x, max_y FROM _src.gpkg_contents"
                " WHERE table_name = ?",
                (name,),
            ).fetchone()
            self.db.commit()
            if row and row[0] is not None:
                ext.add(*row)
        finally:
            cur.execute("DETACH DATABASE _src")
            self.db.execute("BEGIN")

    def close(self):
        cur = self.db.cursor()
        for name, (_sql, _has_id, ext, _collist) in self._layers.items():
            b = ext.bounds_or_none()
            cur.execute(
                "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
                " description, last_change, min_x, min_y, max_x, max_y, srs_id)"
                " VALUES (?,?,?,?,?,?,?,?,?,?)",
                (name, "features", name, "", _FIXED_TIMESTAMP)
                + ((None,) * 4 if b is None else tuple(float(v) for v in b))
                + (4326,),
            )
        self.db.commit()
        self.db.close()


# --------------------------------------------------------------------------
# ESRI Shapefile (.shp / .shx / .dbf / .prj / .cpg)
# --------------------------------------------------------------------------

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5


def _ring_signed_area(r):
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _oriented(ring, clockwise):
    """Shapefile convention: outer rings CW, holes CCW (ESRI 1998 §Polygon)."""
    r = np.asarray(ring, dtype=np.float64)
    if (_ring_signed_area(r) > 0) == clockwise:  # positive shoelace = CCW
        return r[::-1]
    return r


def _shp_record_body(code, geom):
    """→ (shape_type, record payload bytes after the shape-type int)."""
    if code == wkbmod.POINT:
        return SHP_POINT, struct.pack("<2d", *geom)
    if code in (wkbmod.LINESTRING, wkbmod.MULTILINESTRING):
        parts = [np.asarray(geom)] if code == wkbmod.LINESTRING else [
            np.asarray(p) for p in geom
        ]
        shape = SHP_POLYLINE
    else:  # POLYGON / MULTIPOLYGON → Polygon: every ring is a part
        polys = [geom] if code == wkbmod.POLYGON else list(geom)
        parts = []
        for rings in polys:
            for i, r in enumerate(rings):
                parts.append(_oriented(r, clockwise=(i == 0)))
        shape = SHP_POLYGON
    pts = np.vstack(parts)
    starts = np.concatenate([[0], np.cumsum([len(p) for p in parts])[:-1]])
    body = struct.pack(
        "<4d", pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()
    )
    body += struct.pack("<2i", len(parts), len(pts))
    body += starts.astype("<i4").tobytes()
    body += pts.astype("<f8").tobytes()
    return shape, body


class ShapefileLayerWriter:
    """One theme×geomtype layer = one 5-file set (reference
    File.shp, __init__.py:28-35). ``shape_type`` fixes the layer's declared
    type even when empty (points | lines | polygons)."""

    _LAYER_SHAPE = {1: SHP_POINT, 2: SHP_POLYLINE, 3: SHP_POLYGON}

    def __init__(self, base_path, geom_class, fields, osm_id=True):
        self.base = base_path
        self.shape_type = self._LAYER_SHAPE[geom_class]
        self.fields = list(fields)
        self.osm_id = osm_id
        self.ext = _Extent()
        self._recno = 0
        self._shp = open(base_path + ".shp", "wb")
        self._shx = open(base_path + ".shx", "wb")
        self._dbf = open(base_path + ".dbf", "wb")
        self._shp.write(b"\x00" * 100)  # headers patched on close
        self._shx.write(b"\x00" * 100)
        self._write_dbf_header()
        with open(base_path + ".prj", "w") as f:
            f.write(_WGS84_ESRI_WKT)
        with open(base_path + ".cpg", "w") as f:
            f.write("UTF-8")

    def _write_dbf_header(self):
        descs = []
        if self.osm_id:
            descs.append((b"osm_id", b"N", 18, 0))
        for f in self.fields:
            descs.append((f.encode("utf-8")[:10], b"C", 80, 0))
        self._rec_size = 1 + sum(d[2] for d in descs)
        self._descs = descs
        hdr_size = 32 + 32 * len(descs) + 1
        # version 3, fixed date (determinism), record count patched on close
        self._dbf.write(struct.pack("<B3BIHH20x", 3, 100, 1, 1, 0, hdr_size, self._rec_size))
        for name, typ, width, dec in descs:
            self._dbf.write(struct.pack("<11s c 4x B B 14x", name, typ, width, dec))
        self._dbf.write(b"\x0d")

    def write_batch(self, wkb_vals, osm_ids, field_cols):
        shp, shx, dbf = self._shp, self._shx, self._dbf
        n = len(wkb_vals)
        for i in range(n):
            code, geom = wkbmod.decode(wkb_vals[i])
            shape, body = _shp_record_body(code, geom)
            self.ext.add(*_geom_envelope(code, geom))
            content = struct.pack("<i", shape) + body
            self._recno += 1
            offset_words = shp.tell() // 2
            shp.write(struct.pack(">2i", self._recno, len(content) // 2))
            shp.write(content)
            shx.write(struct.pack(">2i", offset_words, len(content) // 2))
            rec = bytearray(b" " * self._rec_size)
            pos = 1
            for j, (name, typ, width, _dec) in enumerate(self._descs):
                if self.osm_id and j == 0:
                    val = osm_ids[i]
                    if val is not None:
                        rec[pos : pos + width] = b"%*d" % (width, val)
                else:
                    k = j - (1 if self.osm_id else 0)
                    val = field_cols[k][i]
                    if val is not None:
                        enc = val.encode("utf-8")[:width]
                        rec[pos : pos + len(enc)] = enc
                pos += width
            dbf.write(bytes(rec))

    def close(self):
        shp_len_words = self._shp.tell() // 2
        shx_len_words = self._shx.tell() // 2
        b = self.ext.bounds_or_none() or (0.0, 0.0, 0.0, 0.0)
        hdr = struct.pack(">i20x", 9994)
        tail = struct.pack("<2i", 1000, self.shape_type) + struct.pack(
            "<8d", b[0], b[1], b[2], b[3], 0, 0, 0, 0
        )
        for f, nwords in ((self._shp, shp_len_words), (self._shx, shx_len_words)):
            f.seek(0)
            f.write(hdr + struct.pack(">i", nwords) + tail)
            f.close()
        self._dbf.write(b"\x1a")
        self._dbf.seek(4)
        self._dbf.write(struct.pack("<I", self._recno))
        self._dbf.close()


# --------------------------------------------------------------------------
# KML (OGC KML 2.2)
# --------------------------------------------------------------------------


def _xml_escape(s):
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def _coords_text(arr):
    a = np.asarray(arr, dtype=np.float64)
    return " ".join("%.15g,%.15g" % (x, y) for x, y in a)


def _kml_geometry(code, geom):
    if code == wkbmod.POINT:
        return "<Point><coordinates>%.15g,%.15g</coordinates></Point>" % geom
    if code == wkbmod.LINESTRING:
        return "<LineString><coordinates>%s</coordinates></LineString>" % _coords_text(geom)
    if code == wkbmod.POLYGON:
        out = ["<Polygon>"]
        for i, r in enumerate(geom):
            tag = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
            out.append(
                "<%s><LinearRing><coordinates>%s</coordinates></LinearRing></%s>"
                % (tag, _coords_text(r), tag)
            )
        out.append("</Polygon>")
        return "".join(out)
    sub = wkbmod.LINESTRING if code == wkbmod.MULTILINESTRING else wkbmod.POLYGON
    return "<MultiGeometry>%s</MultiGeometry>" % "".join(
        _kml_geometry(sub, p) for p in geom
    )


class KmlFile:
    """One .kml per layer: Schema + Folder of Placemarks; only-present
    attributes are emitted (reference Kml.write sets only tags in the row,
    tabular.py:77-79)."""

    def __init__(self, path, layer_name, fields, osm_id=True):
        self.f = open(path, "w", encoding="utf-8")
        self.layer = layer_name
        self.fields = list(fields)
        self.osm_id = osm_id
        esc = _xml_escape(layer_name)
        self.f.write('<?xml version="1.0" encoding="utf-8" ?>\n')
        self.f.write('<kml xmlns="http://www.opengis.net/kml/2.2">\n')
        self.f.write('<Document id="root_doc">\n')
        self.f.write('<Schema name="%s" id="%s">\n' % (esc, esc))
        if osm_id:
            self.f.write('  <SimpleField name="osm_id" type="string"></SimpleField>\n')
        for field in self.fields:
            self.f.write(
                '  <SimpleField name="%s" type="string"></SimpleField>\n' % _xml_escape(field)
            )
        self.f.write("</Schema>\n<Folder><name>%s</name>\n" % esc)

    def write_batch(self, wkb_vals, osm_ids, field_cols):
        parts = []
        esc_layer = _xml_escape(self.layer)
        for i, buf in enumerate(wkb_vals):
            code, geom = wkbmod.decode(buf)
            parts.append("<Placemark>\n<ExtendedData><SchemaData schemaUrl=\"#%s\">" % esc_layer)
            if self.osm_id and osm_ids[i] is not None:
                parts.append('<SimpleData name="osm_id">%d</SimpleData>' % osm_ids[i])
            for k, field in enumerate(self.fields):
                val = field_cols[k][i]
                if val is not None:
                    parts.append(
                        '<SimpleData name="%s">%s</SimpleData>'
                        % (_xml_escape(field), _xml_escape(val))
                    )
            parts.append("</SchemaData></ExtendedData>\n")
            parts.append(_kml_geometry(code, geom))
            parts.append("\n</Placemark>\n")
        self.f.write("".join(parts))

    def close(self):
        self.f.write("</Folder>\n</Document></kml>\n")
        self.f.close()


# --------------------------------------------------------------------------
# GeoJSONSeq (RFC 7946 features, newline-delimited — RFC 8142 without the
# RS framing byte, the form GDAL calls GeoJSONSeq and tippecanoe et al.
# consume). The streaming-friendly text container: one self-contained
# Feature per line, so files concatenate and split at line boundaries —
# the property that makes it the natural distributed-sink text format.
# --------------------------------------------------------------------------


def _geojson_geometry(code, geom):
    """Decoded WKB (functions/wkb.decode) → GeoJSON geometry dict."""

    def ring(r):
        return [[float(x), float(y)] for x, y in np.asarray(r, dtype=np.float64)]

    if code == wkbmod.POINT:
        return {"type": "Point", "coordinates": [float(geom[0]), float(geom[1])]}
    if code == wkbmod.LINESTRING:
        return {"type": "LineString", "coordinates": ring(geom)}
    if code == wkbmod.POLYGON:
        return {"type": "Polygon", "coordinates": [ring(r) for r in geom]}
    if code == wkbmod.MULTILINESTRING:
        return {
            "type": "MultiLineString",
            "coordinates": [ring(p) for p in geom],
        }
    return {
        "type": "MultiPolygon",
        "coordinates": [[ring(r) for r in p] for p in geom],
    }


class GeoJsonSeqFile:
    """One .geojsonl per layer: newline-delimited RFC 7946 Features.
    Only-present attributes are emitted (the KmlFile rule); osm_id rides
    as a Feature-level "id" member per RFC 7946 §3.2."""

    def __init__(self, path, layer_name, fields, osm_id=True):
        self.f = open(path, "w", encoding="utf-8")
        self.layer = layer_name
        self.fields = list(fields)
        self.osm_id = osm_id

    def write_batch(self, wkb_vals, osm_ids, field_cols):
        import json as _json

        lines = []
        for i, buf in enumerate(wkb_vals):
            code, geom = wkbmod.decode(buf)
            feat = {"type": "Feature"}
            if self.osm_id and osm_ids[i] is not None:
                feat["id"] = int(osm_ids[i])
            feat["properties"] = {
                f: field_cols[k][i]
                for k, f in enumerate(self.fields)
                if field_cols[k][i] is not None
            }
            feat["geometry"] = _geojson_geometry(code, geom)
            lines.append(
                _json.dumps(feat, ensure_ascii=False, separators=(",", ":"))
            )
        if lines:
            self.f.write("\n".join(lines) + "\n")

    def close(self):
        self.f.close()
