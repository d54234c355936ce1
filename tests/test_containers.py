"""Binary container formats (functions/containers.py): GeoPackage via
sqlite3 introspection, Shapefile via an independent struct-level reader
written here (not the encoder's code paths), KML via xml.etree.

Fixture geometries cover every WKB class the engine emits: point,
linestring, multilinestring, polygon with hole, multipolygon."""

import os
import sqlite3
import struct
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa
import pytest

from osm_export_tool_python_ray.functions import wkb as wkbmod
from osm_export_tool_python_ray.mapping import Mapping
from osm_export_tool_python_ray.sinks import Geopackage, Kml, MultiGeopackage, Shapefile

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
places:
  types:
    - points
  select:
    - name
  where: place IS NOT NULL
empty_theme:
  types:
    - points
  select:
    - name
  where: barber IS NOT NULL
"""

SQUARE = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
HOLE = np.array([(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)])  # CW
TRI = np.array([(10.0, 10.0), (12.0, 10.0), (11.0, 12.0), (10.0, 10.0)])
LINE_A = np.array([(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)])
LINE_B = np.array([(5.0, 5.0), (6.0, 6.0)])


def _tags(d):
    return d


@pytest.fixture(scope="module")
def sink_features(ray_session):
    import ray.data

    rows = [
        # buildings: polygon w/ hole, multipolygon, and a row with a null tag
        ("buildings", 11, {"building": "yes", "name": "Casa"},
         3, wkbmod.polygon_wkb([SQUARE, HOLE])),
        ("buildings", -12, {"building": "yes", "addr:housenumber": "7b"},
         3, wkbmod.multipolygon_wkb([[SQUARE], [TRI]])),
        # roads: linestring + multilinestring
        ("roads", 21, {"highway": "residential"},
         2, wkbmod.linestring_wkb(LINE_A)),
        ("roads", 22, {"highway": "primary"},
         2, wkbmod.multilinestring_wkb([LINE_A, LINE_B])),
        # places: points (incl. xml-escaping-worthy value)
        ("places", 31, {"place": "town", "name": "St. A & B <x>"},
         1, wkbmod.point_wkb(3.5, -1.25)),
        ("places", 32, {"place": "village"},
         1, wkbmod.point_wkb(-122.25, 47.5)),
    ]
    t = pa.table(
        {
            "theme": pa.array([r[0] for r in rows]),
            "osm_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "tags": pa.array(
                [list(r[2].items()) for r in rows],
                type=pa.map_(pa.string(), pa.string()),
            ),
            "geom_type": pa.array([r[3] for r in rows], type=pa.int8()),
            "wkb": pa.array([r[4] for r in rows], type=pa.binary()),
        }
    )
    return ray.data.from_arrow(t), Mapping(MAPPING_YAML), rows


def _gpb_wkb(blob):
    """Strip and verify the GeoPackage binary header → raw WKB."""
    assert blob[:2] == b"GP"
    assert blob[2] == 0  # version
    flags = blob[3]
    envelope_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[(flags >> 1) & 0x7]
    (srs,) = struct.unpack("<i", blob[4:8])
    assert srs == 4326
    return blob[8 + envelope_len :]


class TestGeoPackage:
    def test_container_structure_and_roundtrip(self, sink_features, tmp_path):
        ds, mapping, rows = sink_features
        out = str(tmp_path / "demo")
        Geopackage(out, mapping).write_from(ds)
        db = sqlite3.connect(out + ".gpkg")
        (app_id,) = db.execute("PRAGMA application_id").fetchone()
        assert app_id == 0x47504B47  # "GPKG"
        srs = dict(
            db.execute("SELECT srs_id, organization FROM gpkg_spatial_ref_sys")
        )
        assert srs[4326] == "EPSG" and -1 in srs and 0 in srs
        contents = {
            r[0]: r
            for r in db.execute(
                "SELECT table_name, data_type, min_x, max_y FROM gpkg_contents"
            )
        }
        # every theme gets a layer — including the empty one
        assert set(contents) == {"buildings", "roads", "places", "empty_theme"}
        assert all(c[1] == "features" for c in contents.values())
        assert contents["empty_theme"][2] is None  # no extent when empty
        gc = dict(
            db.execute("SELECT table_name, geometry_type_name FROM gpkg_geometry_columns")
        )
        assert gc["buildings"] == "GEOMETRY"

        got = db.execute(
            'SELECT osm_id, name, "addr:housenumber", geom FROM buildings ORDER BY osm_id'
        ).fetchall()
        assert [(r[0], r[1], r[2]) for r in got] == [(-12, None, "7b"), (11, "Casa", None)]
        code, geom = wkbmod.decode(_gpb_wkb(got[1][3]))
        assert code == wkbmod.POLYGON
        np.testing.assert_array_equal(geom[0], SQUARE)
        np.testing.assert_array_equal(geom[1], HOLE)
        code, geom = wkbmod.decode(_gpb_wkb(got[0][3]))
        assert code == wkbmod.MULTIPOLYGON and len(geom) == 2
        # contents extent covers the buildings bbox
        assert contents["buildings"][2] == 0.0 and contents["buildings"][3] == 12.0
        assert db.execute("SELECT COUNT(*) FROM empty_theme").fetchone() == (0,)
        db.close()

    def test_multigeopackage_one_file_per_theme(self, sink_features, tmp_path):
        ds, mapping, _rows = sink_features
        out = str(tmp_path / "multi")
        files = MultiGeopackage(out, mapping).write_from(ds)
        for theme in ("buildings", "roads", "places", "empty_theme"):
            p = "%s_%s.gpkg" % (out, theme)
            assert os.path.isfile(p)
            db = sqlite3.connect(p)
            assert db.execute(
                "SELECT table_name FROM gpkg_contents"
            ).fetchall() == [(theme,)]
            db.close()
        assert sum(1 for f in files if f.parts[0].endswith(".gpkg")) == 4

    def test_omit_osm_ids(self, sink_features, tmp_path):
        ds, mapping, _rows = sink_features
        out = str(tmp_path / "noid")
        Geopackage(out, mapping, omit_osm_ids=True).write_from(ds)
        db = sqlite3.connect(out + ".gpkg")
        cols = [r[1] for r in db.execute("PRAGMA table_info(places)")]
        assert cols == ["fid", "geom", "name"]
        db.close()


# ---------------------------------------------------------------------------
# independent shapefile reader (struct-level, no encoder code reused)
# ---------------------------------------------------------------------------


def read_shp(path):
    with open(path, "rb") as f:
        data = f.read()
    (file_code,) = struct.unpack(">i", data[:4])
    (file_len_words,) = struct.unpack(">i", data[24:28])
    version, shape_type = struct.unpack("<2i", data[28:36])
    bbox = struct.unpack("<4d", data[36:68])
    assert file_code == 9994 and version == 1000
    assert file_len_words * 2 == len(data)
    recs = []
    off = 100
    while off < len(data):
        recno, content_words = struct.unpack(">2i", data[off : off + 8])
        off += 8
        (stype,) = struct.unpack("<i", data[off : off + 4])
        body = data[off + 4 : off + content_words * 2]
        if stype == 1:
            recs.append((stype, struct.unpack("<2d", body)))
        elif stype in (3, 5):
            nparts, npts = struct.unpack("<2i", body[32:40])
            parts = struct.unpack("<%di" % nparts, body[40 : 40 + 4 * nparts])
            pts = np.frombuffer(
                body, dtype="<f8", count=2 * npts, offset=40 + 4 * nparts
            ).reshape(npts, 2)
            bounds = list(parts) + [npts]
            recs.append(
                (stype, [pts[bounds[i] : bounds[i + 1]] for i in range(nparts)])
            )
        off += content_words * 2
    return shape_type, bbox, recs


def read_dbf(path):
    with open(path, "rb") as f:
        data = f.read()
    nrec, hdr_size, rec_size = struct.unpack("<IHH", data[4:12])
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00")[0].decode()
        typ = chr(data[off + 11])
        width = data[off + 16]
        fields.append((name, typ, width))
        off += 32
    rows = []
    off = hdr_size
    for _ in range(nrec):
        rec = data[off : off + rec_size]
        pos = 1
        row = {}
        for name, typ, width in fields:
            raw = rec[pos : pos + width]
            txt = raw.decode("utf-8", "replace").strip()
            row[name] = (int(txt) if txt else None) if typ == "N" else (txt or None)
            pos += width
        rows.append(row)
        off += rec_size
    return fields, rows


def _shoelace(r):
    return 0.5 * float(np.dot(r[:, 0], np.roll(r[:, 1], -1)) - np.dot(np.roll(r[:, 0], -1), r[:, 1]))


class TestShapefile:
    def test_polygons_layer(self, sink_features, tmp_path):
        ds, mapping, _rows = sink_features
        out = str(tmp_path / "shp")
        Shapefile(out, mapping).write_from(ds)
        base = out + "_buildings_polygons"
        for ext in (".shp", ".shx", ".dbf", ".prj", ".cpg"):
            assert os.path.isfile(base + ext)
        shape_type, bbox, recs = read_shp(base + ".shp")
        assert shape_type == 5 and len(recs) == 2
        assert bbox == (0.0, 0.0, 12.0, 12.0)
        fields, rows = read_dbf(base + ".dbf")
        assert [f[0] for f in fields] == ["osm_id", "addrhousen", "name"]
        assert {r["osm_id"] for r in rows} == {11, -12}
        by_id = {r["osm_id"]: r for r in rows}
        assert by_id[11]["name"] == "Casa" and by_id[11]["addrhousen"] is None
        assert by_id[-12]["addrhousen"] == "7b"
        # ring orientation: exteriors CW (negative shoelace), holes CCW
        rec_sq = recs[rows.index(by_id[11])]
        assert _shoelace(rec_sq[1][0]) < 0
        assert _shoelace(rec_sq[1][1]) > 0
        np.testing.assert_array_equal(np.sort(rec_sq[1][0][:, 0]), np.sort(SQUARE[:, 0]))
        # multipolygon flattens to one Polygon record with 2 parts
        rec_mp = recs[rows.index(by_id[-12])]
        assert len(rec_mp[1]) == 2

    def test_points_and_lines_layers(self, sink_features, tmp_path):
        ds, mapping, _rows = sink_features
        out = str(tmp_path / "shp2")
        Shapefile(out, mapping).write_from(ds)
        stype, _bbox, recs = read_shp(out + "_places_points.shp")
        assert stype == 1
        assert sorted(r[1] for r in recs) == [(-122.25, 47.5), (3.5, -1.25)]
        stype, _bbox, recs = read_shp(out + "_roads_lines.shp")
        assert stype == 3
        nparts = sorted(len(r[1]) for r in recs)
        assert nparts == [1, 2]  # linestring + multilinestring
        # empty layer still a valid file with zero records
        stype, bbox, recs = read_shp(out + "_empty_theme_points.shp")
        assert stype == 1 and recs == [] and bbox == (0.0, 0.0, 0.0, 0.0)
        with open(out + "_places_points.prj") as f:
            assert "GCS_WGS_1984" in f.read()
        with open(out + "_places_points.cpg") as f:
            assert f.read() == "UTF-8"


class TestKml:
    NS = {"k": "http://www.opengis.net/kml/2.2"}

    def test_placemarks(self, sink_features, tmp_path):
        ds, mapping, _rows = sink_features
        out = str(tmp_path / "kml")
        Kml(out, mapping).write_from(ds)
        root = ET.parse(out + "_places_points.kml").getroot()
        pms = root.findall(".//k:Placemark", self.NS)
        assert len(pms) == 2
        vals = {}
        for pm in pms:
            sd = {
                e.get("name"): e.text
                for e in pm.findall(".//k:SimpleData", self.NS)
            }
            coords = pm.find(".//k:Point/k:coordinates", self.NS).text
            vals[sd["osm_id"]] = (sd, coords)
        assert vals["31"][0]["name"] == "St. A & B <x>"  # xml round-trips escapes
        assert vals["31"][1] == "3.5,-1.25"
        assert "name" not in vals["32"][0]  # absent tag ⇒ no SimpleData
        # polygon + hole nest as outer/innerBoundaryIs
        root = ET.parse(out + "_buildings_polygons.kml").getroot()
        polys = root.findall(".//k:Placemark", self.NS)
        assert len(polys) == 2
        outer = root.findall(".//k:outerBoundaryIs//k:coordinates", self.NS)
        inner = root.findall(".//k:innerBoundaryIs//k:coordinates", self.NS)
        assert len(outer) == 3 and len(inner) == 1  # square+hole, 2 MP parts
        # multilinestring → MultiGeometry
        root = ET.parse(out + "_roads_lines.kml").getroot()
        assert len(root.findall(".//k:MultiGeometry", self.NS)) == 1
        # empty layer parses and has zero placemarks
        root = ET.parse(out + "_empty_theme_points.kml").getroot()
        assert root.findall(".//k:Placemark", self.NS) == []


class TestPngCodec:
    """Pure-numpy PNG codec (functions/codecs.py): round-trips, all five
    scanline filters, CRC verification, and the media stages decoding
    PNG for real under strict=True (the slot was a NotImplementedError
    for every non-PPM image container before round 5)."""

    def test_roundtrip_shapes(self):
        import numpy as np

        from osm_export_tool_python_ray.functions import codecs as C

        rng = np.random.default_rng(3)
        for shape in [(1, 1), (13, 17), (8, 9, 3), (5, 6, 4), (64, 64, 3)]:
            a = rng.integers(0, 256, shape).astype(np.uint8)
            assert np.array_equal(C.decode_png(C.encode_png(a)), a), shape

    def test_all_filters_decode(self):
        import struct
        import zlib

        import numpy as np

        from osm_export_tool_python_ray.functions import codecs as C

        rng = np.random.default_rng(5)
        a = rng.integers(0, 256, (6, 7, 3)).astype(np.uint8)
        h, w, c = a.shape
        bpp = c
        flat = a.reshape(h, w * c).astype(np.int32)
        rows = []
        for y, f in zip(range(h), [0, 1, 2, 3, 4, 1]):
            prev = flat[y - 1] if y else np.zeros(w * c, np.int32)
            cur = flat[y]
            if f == 0:
                filt = cur
            elif f == 1:
                filt = cur.copy()
                filt[bpp:] = (cur[bpp:] - cur[:-bpp]) % 256
            elif f == 2:
                filt = (cur - prev) % 256
            elif f == 3:
                filt = np.empty(w * c, np.int32)
                for x in range(w * c):
                    left = cur[x - bpp] if x >= bpp else 0
                    filt[x] = (cur[x] - ((left + prev[x]) >> 1)) % 256
            else:
                filt = np.empty(w * c, np.int32)
                for x in range(w * c):
                    left = cur[x - bpp] if x >= bpp else 0
                    ul = prev[x - bpp] if x >= bpp else 0
                    filt[x] = (cur[x] - C._paeth(left, prev[x], ul)) % 256
            rows.append(np.concatenate([[f], filt]).astype(np.uint8))
        raw = np.concatenate(rows).tobytes()
        png = (
            C._PNG_SIG
            + C._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + C._png_chunk(b"IDAT", zlib.compress(raw))
            + C._png_chunk(b"IEND", b"")
        )
        assert np.array_equal(C.decode_png(png), a)

    def test_crc_and_bad_inputs(self):
        import numpy as np
        import pytest as _pytest

        from osm_export_tool_python_ray.functions import codecs as C

        a = np.zeros((4, 4, 3), dtype=np.uint8)
        png = bytearray(C.encode_png(a))
        png[40] ^= 0xFF  # corrupt inside IDAT
        with _pytest.raises(ValueError, match="CRC"):
            C.decode_png(bytes(png))
        with _pytest.raises(ValueError, match="not a PNG"):
            C.decode_png(b"JFIF....")

    def test_media_stages_decode_png_strict(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from osm_export_tool_python_ray.functions import codecs as C
        from osm_export_tool_python_ray.stages.media import (
            DecodeStage,
            ResizeStage,
        )

        rng = np.random.default_rng(7)
        imgs = [
            rng.integers(0, 256, (40, 30, 3)).astype(np.uint8),
            rng.integers(0, 256, (20, 50)).astype(np.uint8),
        ]
        t = pa.table(
            {
                "media_ref": pa.array(["a.png", "b.png"]),
                "media_type": pa.array(["image", "image"]),
                "payload": pa.array(
                    [C.encode_png(i) for i in imgs], type=pa.binary()
                ),
            }
        )
        ds = ray.data.from_arrow(t)
        out = (
            ds.map_batches(
                DecodeStage(strict=True),
                batch_size=2,
                concurrency=1,
                batch_format="pyarrow",
            )
            .to_pandas()
            .sort_values("media_ref")
        )
        assert list(out["format"]) == ["png", "png"]
        assert list(out["width"]) == [30, 50]
        assert list(out["height"]) == [40, 20]
        rs = (
            ray.data.from_arrow(t)
            .map_batches(
                ResizeStage(target=16, strict=True),
                batch_size=2,
                concurrency=1,
                batch_format="pyarrow",
            )
            .to_pandas()
            .sort_values("media_ref")
        )
        assert list(rs["resized"]) == [True, True]
        got = C.decode_png(rs["payload"].iloc[0])
        assert got.shape == (16, 16, 3)


class TestJpegCodec:
    """Pure-numpy baseline JPEG (functions/jpeg.py): bounded-error
    round-trips, hand-crafted 4:2:0 and restart-marker streams (the
    encoder emits neither, so the decoder features are exercised from
    first principles), unsupported-process rejection, media-stage
    integration."""

    def _smooth(self, h, w, rgb=True):
        yy, xx = np.mgrid[0:h, 0:w]
        if not rgb:
            return ((xx * 3 + yy * 2) % 256).astype(np.uint8)
        r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
        g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
        b = ((xx + yy) * 255 // max(w + h - 2, 1)).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    def test_roundtrip_bounded_error(self):
        from osm_export_tool_python_ray.functions import jpeg as J

        for shape_rgb in [(24, 40, True), (16, 16, True), (9, 13, True),
                          (24, 40, False), (8, 8, False)]:
            h, w, rgb = shape_rgb
            img = self._smooth(h, w, rgb)
            dec = J.decode_jpeg(J.encode_jpeg(img, quality=95))
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.mean() < 3.0 and err.max() <= 40, shape_rgb

    def test_deterministic_bytes(self):
        from osm_export_tool_python_ray.functions import jpeg as J

        img = self._smooth(17, 23)
        assert J.encode_jpeg(img) == J.encode_jpeg(img)

    def test_unsupported_progressive_named(self):
        from osm_export_tool_python_ray.functions import jpeg as J

        img = self._smooth(8, 8)
        buf = bytearray(J.encode_jpeg(img))
        i = buf.find(b"\xff\xc0")
        buf[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
        with pytest.raises(ValueError, match="baseline"):
            J.decode_jpeg(bytes(buf))

    def _dc_only_block(self, bw, dc_diff, enc_dc, enc_ac):
        from osm_export_tool_python_ray.functions import jpeg as J

        t, mag = J._mag_bits(dc_diff)
        code, ln = enc_dc[t]
        bw.write(code, ln)
        if t:
            bw.write(mag, t)
        code, ln = enc_ac[0x00]  # EOB
        bw.write(code, ln)

    def test_handcrafted_420_uniform(self):
        """16×16 uniform color through a hand-built 4:2:0 stream: one MCU
        of 4 Y + 1 Cb + 1 Cr DC-only blocks; decode must reproduce the
        color (exercises MCU layout, subsample upsampling, YCbCr)."""
        import struct as _st

        from osm_export_tool_python_ray.functions import jpeg as J

        r, g, b = 200, 120, 40
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        # quant tables of all 1s → DC value = 8*(mean-128) exactly
        dc_y = int(round((y - 128.0) * 8))
        dc_cb = int(round(cb * 8))
        dc_cr = int(round(cr * 8))

        def seg(m, payload):
            return b"\xff" + bytes([m]) + _st.pack(">H", len(payload) + 2) + payload

        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0]) + bytes([1] * 64))
        sof = _st.pack(">BHHB", 8, 16, 16, 3)
        sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
        sof += bytes([2, 0x11, 0])
        sof += bytes([3, 0x11, 0])
        out += seg(0xC0, sof)
        for tid, ht in ((0x00, J.HT_DC_LUMA), (0x10, J.HT_AC_LUMA)):
            out += seg(0xC4, bytes([tid]) + bytes(ht[0]) + bytes(ht[1]))
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00")
        bw = J._BitWriter()
        enc_dc = J._build_encode_table(*J.HT_DC_LUMA)
        enc_ac = J._build_encode_table(*J.HT_AC_LUMA)
        # 4 Y blocks (first carries the DC, rest diff 0), then Cb, Cr
        self._dc_only_block(bw, dc_y, enc_dc, enc_ac)
        for _ in range(3):
            self._dc_only_block(bw, 0, enc_dc, enc_ac)
        self._dc_only_block(bw, dc_cb, enc_dc, enc_ac)
        self._dc_only_block(bw, dc_cr, enc_dc, enc_ac)  # per-component DC pred
        bw.flush()
        out += bw.out + b"\xff\xd9"
        img = J.decode_jpeg(bytes(out))
        assert img.shape == (16, 16, 3)
        # uniform within rounding of the quantized DC
        assert np.all(np.ptp(img.reshape(-1, 3), axis=0) == 0)
        assert np.abs(img[0, 0].astype(int) - [r, g, b]).max() <= 2

    def test_handcrafted_restart_markers(self):
        """8×24 gray (3 MCUs) with DRI=1: RST0/RST1 between MCUs, DC
        predictor resets — each MCU carries an ABSOLUTE dc."""
        import struct as _st

        from osm_export_tool_python_ray.functions import jpeg as J

        vals = [64, 128, 192]

        def seg(m, payload):
            return b"\xff" + bytes([m]) + _st.pack(">H", len(payload) + 2) + payload

        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0]) + bytes([1] * 64))
        out += seg(0xC0, _st.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0]))
        for tid, ht in ((0x00, J.HT_DC_LUMA), (0x10, J.HT_AC_LUMA)):
            out += seg(0xC4, bytes([tid]) + bytes(ht[0]) + bytes(ht[1]))
        out += seg(0xDD, _st.pack(">H", 1))  # DRI = 1 MCU
        out += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
        enc_dc = J._build_encode_table(*J.HT_DC_LUMA)
        enc_ac = J._build_encode_table(*J.HT_AC_LUMA)
        for i, v in enumerate(vals):
            bw = J._BitWriter()
            self._dc_only_block(bw, (v - 128) * 8, enc_dc, enc_ac)
            bw.flush()
            out += bw.out
            if i < len(vals) - 1:
                out += bytes([0xFF, 0xD0 + i])
        out += b"\xff\xd9"
        img = J.decode_jpeg(bytes(out))
        assert img.shape == (8, 24)
        for i, v in enumerate(vals):
            blk = img[:, i * 8 : (i + 1) * 8].astype(int)
            assert np.all(np.abs(blk - v) <= 1), (i, v, blk[0, 0])

    def test_media_stages_jpeg_strict(self, ray_session):
        import pyarrow as pa
        import ray.data

        from osm_export_tool_python_ray.functions import codecs as C
        from osm_export_tool_python_ray.stages.media import DecodeStage

        img = self._smooth(32, 48)
        t = pa.table(
            {
                "media_ref": pa.array(["x.jpg"]),
                "media_type": pa.array(["image"]),
                "payload": pa.array([C.encode_jpeg(img)], type=pa.binary()),
            }
        )
        out = (
            ray.data.from_arrow(t)
            .map_batches(
                DecodeStage(strict=True),
                batch_size=1,
                concurrency=1,
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        assert list(out["format"]) == ["jpeg"]
        assert list(out["width"]) == [48] and list(out["height"]) == [32]


class TestMp4Container:
    """ISO BMFF parser (functions/mp4.py): the video slot's frame plan
    now reads the REAL sample table; codec decode remains external."""

    def test_parse_roundtrip(self):
        from osm_export_tool_python_ray.functions.mp4 import (
            build_mp4,
            parse_mp4,
            sniff_mp4,
        )

        sizes = [100, 250, 80, 99, 1]
        buf = build_mp4(sizes, timescale=25)
        assert sniff_mp4(buf)
        info = parse_mp4(buf)
        assert info["timescale"] == 25
        t = info["tracks"][0]
        assert t["kind"] == "video" and t["codec"] == "avc1"
        assert t["n_samples"] == 5 and t["sample_sizes"] == sizes
        offs = t["sample_offsets"]
        # consecutive samples in one chunk: offsets advance by size
        assert [b - a for a, b in zip(offs, offs[1:])] == sizes[:-1]
        # offsets point inside the mdat payload
        assert buf[offs[0] - 8 - sum(()) - 0 : offs[0]].endswith(b"mdat")

    def test_non_mp4_rejected(self):
        import pytest as _pytest

        from osm_export_tool_python_ray.functions.mp4 import parse_mp4

        with _pytest.raises(ValueError, match="ftyp"):
            parse_mp4(b"\x00\x00\x00\x08freeXXXX")

    def test_frame_sample_stage_real_plan(self):
        import pyarrow as pa

        from osm_export_tool_python_ray.functions.mp4 import build_mp4
        from osm_export_tool_python_ray.stages.media import FrameSampleStage

        sizes = list(range(10, 110, 10))  # 10 frames
        t = pa.table(
            {
                "media_ref": pa.array(["clip.mp4", "blob.bin"]),
                "payload": pa.array(
                    [build_mp4(sizes), b"\x07" * 40], type=pa.binary()
                ),
            }
        )
        out = FrameSampleStage(every_n=4)(t)
        rows = list(
            zip(
                out.column("media_ref").to_pylist(),
                out.column("frame_idx").to_pylist(),
                out.column("byte_offset").to_pylist(),
                out.column("byte_size").to_pylist(),
            )
        )
        mp4_rows = [r for r in rows if r[0] == "clip.mp4"]
        # real plan: frames 0,4,8 with true byte ranges
        assert [r[1] for r in mp4_rows] == [0, 4, 8]
        assert [r[3] for r in mp4_rows] == [10, 50, 90]
        assert all(r[2] > 0 for r in mp4_rows)
        fake_rows = [r for r in rows if r[0] == "blob.bin"]
        assert all(r[2] == -1 and r[3] == -1 for r in fake_rows)
