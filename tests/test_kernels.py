"""Geometry kernel tests (FIXTURES.md F3 cases: boundary point dropped,
line clipped, polygon contained/straddling/outside)."""

import numpy as np
import pytest

from osm_export_tool_python_ray.functions.kernels import (
    PreparedPolygon,
    polygon_centroid,
    ring_intersection,
    signed_area,
)
from osm_export_tool_python_ray.functions import wkb
from osm_export_tool_python_ray.functions.cells import cell_of, cell_bounds, k_ring, cover_polygon
from osm_export_tool_python_ray.functions.tiles import lonlat_to_tile, tile_bounds, tile_cover
from osm_export_tool_python_ray.geometry import load_geometry, parse_poly, geometry_area

SQUARE = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]]
# square with a hole in the middle
HOLED = [
    [
        (0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0),
    ],
    [
        (4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0),
    ],
]


class TestPointInPolygon:
    def test_inside_outside_boundary(self):
        p = PreparedPolygon([SQUARE])
        xs = np.array([5.0, 15.0, 0.0, 10.0, 5.0, -1.0])
        ys = np.array([5.0, 5.0, 5.0, 10.0, 0.0, -1.0])
        st = p.point_status(xs, ys)
        assert list(st) == [1, 0, 2, 2, 2, 0]
        # contains is STRICT: boundary dropped (reference tabular.py:271-274)
        assert list(p.contains_points(xs, ys)) == [True, False, False, False, False, False]

    def test_hole(self):
        p = PreparedPolygon([HOLED])
        st = p.point_status([5.0, 3.0, 4.0], [5.0, 3.0, 5.0])
        assert list(st) == [0, 1, 2]  # in hole, in solid, on hole boundary

    def test_multipolygon(self):
        p = PreparedPolygon(
            [SQUARE, [[(20.0, 20.0), (22.0, 20.0), (22.0, 22.0), (20.0, 22.0), (20.0, 20.0)]]]
        )
        assert list(p.contains_points([5.0, 21.0, 15.0], [5.0, 21.0, 15.0])) == [True, True, False]


class TestLineClip:
    def test_crossing_line_clipped(self):
        p = PreparedPolygon([SQUARE])
        line = np.array([(-5.0, 5.0), (15.0, 5.0)])
        assert p.intersects_line(line)
        assert not p.contains_properly_line(line)
        parts = p.clip_line(line)
        assert len(parts) == 1
        np.testing.assert_allclose(parts[0], [(0.0, 5.0), (10.0, 5.0)])

    def test_inside_line_kept(self):
        p = PreparedPolygon([SQUARE])
        line = np.array([(1.0, 1.0), (9.0, 9.0)])
        assert p.contains_properly_line(line)

    def test_outside_line_dropped(self):
        p = PreparedPolygon([SQUARE])
        line = np.array([(20.0, 20.0), (30.0, 30.0)])
        assert not p.intersects_line(line)

    def test_line_through_hole_becomes_multi(self):
        p = PreparedPolygon([HOLED])
        line = np.array([(1.0, 5.0), (9.0, 5.0)])
        parts = p.clip_line(line)
        assert len(parts) == 2
        np.testing.assert_allclose(parts[0], [(1.0, 5.0), (4.0, 5.0)])
        np.testing.assert_allclose(parts[1], [(6.0, 5.0), (9.0, 5.0)])


class TestPolygonClip:
    def test_fully_inside_no_clip(self):
        p = PreparedPolygon([SQUARE])
        inner = [[np.array([(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)])]]
        assert p.contains_properly_polygon(inner)
        assert p.intersects_polygon(inner)

    def test_outside_dropped(self):
        p = PreparedPolygon([SQUARE])
        outer = [[np.array([(20.0, 20.0), (24.0, 20.0), (24.0, 24.0), (20.0, 24.0), (20.0, 20.0)])]]
        assert not p.intersects_polygon(outer)

    def test_straddle_clipped(self):
        p = PreparedPolygon([SQUARE])
        subj = [[np.array([(8.0, 2.0), (14.0, 2.0), (14.0, 4.0), (8.0, 4.0), (8.0, 2.0)])]]
        assert p.intersects_polygon(subj)
        assert not p.contains_properly_polygon(subj)
        clipped = p.clip_polygon(subj)
        assert len(clipped) == 1
        area = abs(signed_area(clipped[0][0]))
        assert area == pytest.approx(4.0)  # 2x2 remains inside

    def test_ring_intersection_identity(self):
        a = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)])
        out = ring_intersection(a, np.array(SQUARE[0]))
        assert len(out) == 1
        assert abs(signed_area(out[0])) == pytest.approx(16.0)

    def test_centroid(self):
        c = polygon_centroid([[np.array(SQUARE[0])]])
        assert c == pytest.approx((5.0, 5.0))
        # hole shifts nothing for symmetric hole
        c = polygon_centroid([HOLED])
        assert c == pytest.approx((5.0, 5.0))


class TestWkb:
    def test_roundtrip(self):
        b = wkb.point_wkb(1.5, -2.5)
        t, v = wkb.decode(b)
        assert t == wkb.POINT and v == (1.5, -2.5)
        line = np.array([(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)])
        t, v = wkb.decode(wkb.linestring_wkb(line))
        assert t == wkb.LINESTRING
        np.testing.assert_allclose(v, line)
        poly = [np.array(SQUARE[0]), np.array(HOLED[1])]
        t, v = wkb.decode(wkb.multipolygon_wkb([poly]))
        assert t == wkb.MULTIPOLYGON
        np.testing.assert_allclose(v[0][0], SQUARE[0])
        t, v = wkb.decode(wkb.multilinestring_wkb([line, line * 2]))
        assert t == wkb.MULTILINESTRING and len(v) == 2


class TestCells:
    def test_cell_roundtrip(self):
        c = cell_of([12.34], [45.67])[0]
        minlon, minlat, maxlon, maxlat = cell_bounds(c)
        assert minlon <= 12.34 <= maxlon
        assert minlat <= 45.67 <= maxlat

    def test_same_cell_for_nearby(self):
        c = cell_of([10.0, 10.0001], [20.0, 20.0001])
        assert c[0] == c[1]

    def test_k_ring(self):
        c = cell_of([5.0], [5.0])
        ring = k_ring(c, 1)
        assert len(ring) == 9

    def test_cover_polygon(self):
        prep_sq = PreparedPolygon([[[(0.0, 0.0), (0.1, 0.0), (0.1, 0.1), (0.0, 0.1), (0.0, 0.0)]]])
        cells = cover_polygon(prep_sq, res=8)
        assert len(cells) > 0
        # every covered cell touches the AOI bbox
        for c in cells:
            lo_lon, lo_lat, hi_lon, hi_lat = cell_bounds(np.array([c]))
            assert hi_lon >= -0.01 and lo_lon <= 0.11


class TestTiles:
    def test_known_tile(self):
        # lon 0, lat 0 at z1 → tile (1, 1)
        x, y = lonlat_to_tile([0.01], [-0.01], 1)
        assert (x[0], y[0]) == (1, 1)

    def test_bounds_roundtrip(self):
        x, y = lonlat_to_tile([13.4], [52.5], 12)
        w, s, e, n = tile_bounds(12, int(x[0]), int(y[0]))
        assert w <= 13.4 <= e and s <= 52.5 <= n

    def test_cover(self):
        t = tile_cover(0.0, 0.0, 1.0, 1.0, 8, 9)
        assert (t[:, 0] == 8).any() and (t[:, 0] == 9).any()


class TestAoiLoaders:
    def test_geojson_polygon(self):
        txt = '{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}'
        polys = load_geometry(txt)
        assert len(polys) == 1
        assert geometry_area(polys) == pytest.approx(100.0)

    def test_geojson_feature_collection_first(self, capsys):
        txt = (
            '{"type":"FeatureCollection","features":[{"type":"Feature","geometry":'
            '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}}]}'
        )
        polys = load_geometry(txt)
        assert geometry_area(polys) == pytest.approx(1.0)
        assert "first feature" in capsys.readouterr().out

    def test_poly_file(self):
        txt = "\n".join(
            [
                "australia_v",
                "first_area",
                "  0.0 0.0",
                "  10.0 0.0",
                "  10.0 10.0",
                "  0.0 10.0",
                "END",
                "!hole",
                "  4.0 4.0",
                "  6.0 4.0",
                "  6.0 6.0",
                "  4.0 6.0",
                "END",
                "END",
            ]
        )
        polys = parse_poly(txt.split("\n"))
        assert len(polys) == 1
        assert len(polys[0]) == 2  # exterior + hole
        assert geometry_area(polys) == pytest.approx(96.0)
        # fallback through load_geometry (non-JSON input)
        polys2 = load_geometry(txt)
        assert geometry_area(polys2) == pytest.approx(96.0)


class TestHoleSemantics:
    """ADVICE round-1 medium: AOI wholly inside a subject polygon's hole
    must NOT intersect (shapely parity, reference tabular.py:323)."""

    def test_aoi_inside_subject_hole_no_intersect(self):
        # AOI = small square sitting entirely inside HOLED's hole
        aoi = PreparedPolygon([[np.array([(4.5, 4.5), (5.5, 4.5), (5.5, 5.5), (4.5, 5.5), (4.5, 4.5)])]])
        subj = [[np.array(HOLED[0]), np.array(HOLED[1])]]
        assert not aoi.intersects_polygon(subj)
        assert aoi.clip_polygon(subj) == []

    def test_aoi_straddling_hole_boundary_intersects(self):
        aoi = PreparedPolygon([[np.array([(3.0, 4.2), (5.0, 4.2), (5.0, 5.8), (3.0, 5.8), (3.0, 4.2)])]])
        subj = [[np.array(HOLED[0]), np.array(HOLED[1])]]
        assert aoi.intersects_polygon(subj)
        out = aoi.clip_polygon(subj)
        assert out  # material between hole boundary and AOI remains
        area = sum(abs(signed_area(p[0])) - sum(abs(signed_area(h)) for h in p[1:]) for p in out)
        # AOI area 2·1.6=3.2 minus hole overlap (1·1.6)=1.6
        assert area == pytest.approx(1.6, rel=1e-6)

    def test_aoi_containing_whole_subject_intersects(self):
        aoi = PreparedPolygon([[np.array([(-1.0, -1.0), (11.0, -1.0), (11.0, 11.0), (-1.0, 11.0), (-1.0, -1.0)])]])
        subj = [[np.array(HOLED[0]), np.array(HOLED[1])]]
        assert aoi.intersects_polygon(subj)
        out = aoi.clip_polygon(subj)
        area = sum(abs(signed_area(p[0])) - sum(abs(signed_area(h)) for h in p[1:]) for p in out)
        assert area == pytest.approx(100.0 - 4.0, rel=1e-6)


class TestVectorizedHashes:
    def test_hash_strings_128(self):
        import pyarrow as pa
        from osm_export_tool_python_ray.functions.text import hash_strings_128

        texts = ["hello", "world", "", "hello", "a" * 100, "a" * 101,
                 "ab", "ba", None, "x" * 2000, "x" * 2000, "a\x00", "a"]
        h1, h2 = hash_strings_128(pa.array(texts))
        assert h1[0] == h1[3] and h2[0] == h2[3]          # equal content
        assert h1[2] == h1[8]                              # null ≡ ''
        assert h1[9] == h1[10]                             # long-tail path
        assert h1[11] != h1[12]                            # pad ≠ real NUL
        assert len(set(zip(h1.tolist(), h2.tolist()))) == 10
        # slice/large_string invariance
        sl1, _ = hash_strings_128(pa.array(texts).slice(2, 4))
        assert (sl1 == h1[2:6]).all()
        l1, l2 = hash_strings_128(pa.array(texts, type=pa.large_string()))
        assert (l1 == h1).all() and (l2 == h2).all()

    def test_hash_rows_and_popcount(self):
        from osm_export_tool_python_ray.functions.text import hash_rows_u64, popcount64

        m = np.array([[1, 2, 3], [1, 2, 3], [1, 2, 4]], dtype=np.uint64)
        r = hash_rows_u64(m)
        assert r[0] == r[1] and r[0] != r[2]
        assert r[0] != hash_rows_u64(m, salt=np.uint64(7))[0]
        x = np.array([0, 1, 3, 2 ** 63, 2 ** 64 - 1], dtype=np.uint64)
        assert popcount64(x).tolist() == [0, 1, 2, 1, 64]
        assert popcount64(np.array([], dtype=np.uint64)).tolist() == []


class TestClassifyBboxes:
    """classify_bboxes must be CONSISTENT with the exact kernels:
    0 ⇒ no intersection, 1 ⇒ contains_properly, 2 ⇒ undecided (exact path).
    Checked on randomized small lines around a non-convex AOI."""

    def test_consistency_random_lines(self):
        rng = np.random.RandomState(7)
        # L-shaped AOI (non-convex)
        aoi = PreparedPolygon([[np.array([
            (0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0),
            (2.0, 4.0), (0.0, 4.0), (0.0, 0.0),
        ])]])
        n = 400
        cx = rng.uniform(-1.5, 5.5, n)
        cy = rng.uniform(-1.5, 5.5, n)
        lines = []
        for i in range(n):
            npts = rng.randint(2, 6)
            pts = np.stack([
                cx[i] + rng.uniform(-0.4, 0.4, npts),
                cy[i] + rng.uniform(-0.4, 0.4, npts),
            ], axis=1)
            lines.append(pts)
        minx = np.array([l[:, 0].min() for l in lines])
        miny = np.array([l[:, 1].min() for l in lines])
        maxx = np.array([l[:, 0].max() for l in lines])
        maxy = np.array([l[:, 1].max() for l in lines])
        fx = np.array([l[0, 0] for l in lines])
        fy = np.array([l[0, 1] for l in lines])
        cls = aoi.classify_bboxes(minx, miny, maxx, maxy, fx, fy)
        seen = set()
        for i, l in enumerate(lines):
            seen.add(int(cls[i]))
            if cls[i] == 0:
                assert not aoi.intersects_line(l), i
            elif cls[i] == 1:
                assert aoi.contains_properly_line(l), i
        assert seen == {0, 1, 2}  # all three classes exercised

    def test_aoi_export_prefilter_equivalence(self):
        """AOI way-feature output with the prefilter equals brute-force
        per-row cascade on the same geometries."""
        rng = np.random.RandomState(11)
        aoi = PreparedPolygon([[np.array([
            (0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0),
        ])]])
        kept_exact = []
        lines = []
        for i in range(200):
            npts = rng.randint(2, 5)
            pts = np.stack([
                rng.uniform(-1, 4) + rng.uniform(-0.3, 0.3, npts),
                rng.uniform(-1, 4) + rng.uniform(-0.3, 0.3, npts),
            ], axis=1)
            lines.append(pts)
            kept_exact.append(aoi.intersects_line(pts))
        minx = np.array([l[:, 0].min() for l in lines])
        miny = np.array([l[:, 1].min() for l in lines])
        maxx = np.array([l[:, 0].max() for l in lines])
        maxy = np.array([l[:, 1].max() for l in lines])
        fx = np.array([l[0, 0] for l in lines])
        fy = np.array([l[0, 1] for l in lines])
        cls = aoi.classify_bboxes(minx, miny, maxx, maxy, fx, fy)
        for i, l in enumerate(lines):
            if cls[i] == 0:
                assert not kept_exact[i]
            elif cls[i] == 1:
                assert kept_exact[i]


class TestSlicedMapExtraction:
    def test_extract_on_sliced_map_column(self):
        """MapArray.keys/.items are unsliced while offsets are absolute —
        extraction must realign (latent round-1 bug on sliced inputs)."""
        import pyarrow as pa
        from osm_export_tool_python_ray.stages.matcher_eval import (
            extract_tag_columns,
            tag_count,
        )

        rows = [[("a", "1")], [("b", "2")], [("a", "3"), ("c", "4")], [("d", "5")]]
        m = pa.array(rows, type=pa.map_(pa.string(), pa.string()))
        sl = m.slice(1, 3)
        out = extract_tag_columns(sl, ["a", "b", "d"])
        assert out["a"][0].tolist() == [False, True, False] and out["a"][1][1] == "3"
        assert out["b"][0].tolist() == [True, False, False] and out["b"][1][0] == "2"
        assert out["d"][0].tolist() == [False, False, True] and out["d"][1][2] == "5"
        assert tag_count(sl).tolist() == [1, 2, 1]


class TestDegenerateClipping:
    """Pin the nudge-retry behavior on degenerate inputs (vertex exactly on
    the clip boundary, shared edges) — the known-gap surface in README."""

    def test_vertex_exactly_on_clip_edge(self):
        clip = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
        # subject has a vertex ON the clip edge x=10
        subj = np.array([(5.0, 5.0), (10.0, 5.0), (5.0, 9.0), (5.0, 5.0)])
        out = ring_intersection(subj, clip)
        area = sum(abs(signed_area(r)) for r in out)
        assert area == pytest.approx(abs(signed_area(subj)), rel=1e-6)

    def test_shared_edge_subject_flush_with_clip(self):
        clip = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
        # subject shares the whole bottom edge segment with the clip boundary
        subj = np.array([(2.0, 0.0), (8.0, 0.0), (8.0, 3.0), (2.0, 3.0), (2.0, 0.0)])
        out = ring_intersection(subj, clip)
        area = sum(abs(signed_area(r)) for r in out)
        assert area == pytest.approx(18.0, rel=1e-5)

    def test_identical_rings(self):
        r = np.array([(1.0, 1.0), (4.0, 1.0), (4.0, 4.0), (1.0, 4.0), (1.0, 1.0)])
        out = ring_intersection(r, r)
        area = sum(abs(signed_area(x)) for x in out)
        assert area == pytest.approx(9.0, rel=1e-5)

    def test_corner_touch_only(self):
        clip = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
        # subject touches the clip at the single corner (10,10)
        subj = np.array([(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)])
        out = ring_intersection(subj, clip)
        area = sum(abs(signed_area(x)) for x in out)
        assert area == pytest.approx(0.0, abs=1e-6)


class TestStitchRings:
    """Ring stitcher: giant-ring budget (the cap is a byte budget, NOT a
    correctness gate — coastline-class relations with >100k points are
    VALID, parity with libosmium's assembler) and tie-break pinning."""

    def _circle_segments(self, n_pts, n_segs, radius=50.0):
        th = np.linspace(0.0, 2 * np.pi, n_pts, endpoint=False)
        ring = np.stack([radius * np.cos(th), radius * np.sin(th)], axis=1)
        ring = np.vstack([ring, ring[:1]])  # closed
        cuts = np.linspace(0, len(ring) - 1, n_segs + 1).astype(int)
        return [
            (ring[cuts[i]: cuts[i + 1] + 1], "outer") for i in range(n_segs)
        ]

    def test_giant_valid_ring_not_dropped(self):
        from osm_export_tool_python_ray.stages.assemble import stitch_rings

        segs = self._circle_segments(150_000, 300)
        rings = stitch_rings(segs)
        assert len(rings) == 1
        chain, role = rings[0]
        assert role == "outer"
        assert len(chain) >= 150_000
        assert np.array_equal(chain[0], chain[-1])

    def test_budget_still_guards_runaway(self):
        from osm_export_tool_python_ray.stages.assemble import InvalidArea, stitch_rings

        segs = self._circle_segments(5_000, 10)
        with pytest.raises(InvalidArea, match="runaway ring"):
            stitch_rings(segs, max_ring_points=1_000)

    def test_reversed_segment_and_multi_ring(self):
        from osm_export_tool_python_ray.stages.assemble import stitch_rings

        a = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        b = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0]])  # reversed join
        c = np.array(
            [[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0], [5.0, 5.0]]
        )  # independent pre-closed ring
        rings = stitch_rings([(a, "outer"), (b, "outer"), (c, "inner")])
        assert len(rings) == 2
        sizes = sorted(len(r) for r, _ in rings)
        assert sizes == [5, 5]

    def test_open_ring_raises(self):
        from osm_export_tool_python_ray.stages.assemble import InvalidArea, stitch_rings

        a = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        with pytest.raises(InvalidArea, match="open ring"):
            stitch_rings([(a, "outer")])

    def test_negative_zero_endpoints_join(self):
        from osm_export_tool_python_ray.stages.assemble import stitch_rings

        a = np.array([[-0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        b = np.array([[1.0, 1.0], [0.0, 1.0], [0.0, -0.0]])
        rings = stitch_rings([(a, "outer"), (b, "outer")])
        assert len(rings) == 1


class TestCoastlineClassRelation:
    """VERDICT r3 item 4: a coastline-class relation (multi-million-point
    ring, thousands of member segments) must (a) assemble VALID within
    the default 10M-point budget with bounded memory, and (b) when the
    budget IS exceeded, degrade by dropping the relation with a COUNTED
    cap (BENCH `caps` row `relation_ring_budget_drops`) — never by OOM
    or a silent gap."""

    def _member_table(self, n_pts, n_segs, rid=7, radius=60.0, holes=0):
        import pyarrow as pa

        th = np.linspace(0.0, 2 * np.pi, n_pts, endpoint=False)
        ring = np.stack([radius * np.cos(th), radius * np.sin(th)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        cuts = np.linspace(0, len(ring) - 1, n_segs + 1).astype(int)
        segs = [ring[cuts[i]: cuts[i + 1] + 1] for i in range(n_segs)]
        # stress the stitcher: reverse every third segment, shuffle order
        segs = [s[::-1].copy() if i % 3 == 0 else s for i, s in enumerate(segs)]
        roles = ["outer"] * len(segs)
        for h in range(holes):
            cx = (h - holes / 2) * 4.0
            hx = np.array(
                [[cx, 0.0], [cx + 1, 0.0], [cx + 1, 1.0], [cx, 1.0], [cx, 0.0]]
            )
            segs.append(hx)
            roles.append("inner")
        order = np.random.RandomState(3).permutation(len(segs))
        rows = {
            "relation_id": pa.array([rid] * len(segs), type=pa.int64()),
            "mseq": pa.array([int(i) for i in order], type=pa.int64()),
            "role": pa.array([roles[i] for i in order], type=pa.string()),
            "lons": pa.array([segs[i][:, 0].tolist() for i in order]),
            "lats": pa.array([segs[i][:, 1].tolist() for i in order]),
            "complete": pa.array([True] * len(segs)),
        }
        return pa.table(rows), n_pts + holes * 4

    def test_multimillion_point_relation_valid(self, host_slowdown):
        import time
        import tracemalloc

        from osm_export_tool_python_ray.stages.assemble import (
            assemble_relations_bucket,
        )

        tbl, n_ring_pts = self._member_table(2_500_000, 2_500, holes=3)
        tracemalloc.start()
        t0 = time.perf_counter()
        out = assemble_relations_bucket(tbl)
        wall = time.perf_counter() - t0
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()

        assert out.num_rows == 1
        assert out.column("valid")[0].as_py() is True
        wkb = out.column("wkb")[0].as_py()
        assert wkb is not None
        # WKB holds the closed outer (+1 repeat vertex) + 3 closed holes:
        # size must scale with the ring (16 B/pt + headers), proving the
        # full geometry survived, and stay O(ring) — no quadratic blowup
        assert len(wkb) > 2_500_000 * 16
        assert len(wkb) < 2_500_000 * 24
        # memory stays a small multiple of the coordinate payload (~40 MB):
        # the stitcher is O(points) with an endpoint index, not O(points^2)
        assert peak < 1_200 * 1024 * 1024, "peak RSS-traced %dMB" % (peak >> 20)
        # loose wall guard: linear stitch of 2.5M pts is seconds, not minutes
        assert wall < 120 * host_slowdown, "stitch took %.1fs" % wall

    def test_budget_drop_counted_not_fatal(self, ray_session, monkeypatch):
        import osm_export_tool_python_ray.stages.assemble as asm
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        tbl, _ = self._member_table(50_000, 100)
        monkeypatch.setattr(asm, "RING_POINT_BUDGET", 10_000)
        snapshot_caps()  # reset
        out = asm.assemble_relations_bucket(tbl)
        # degrades to a dropped (valid=False) row — no exception, no OOM
        assert out.num_rows == 1
        assert out.column("valid")[0].as_py() is False
        assert out.column("wkb")[0].as_py() is None
        caps = snapshot_caps()
        assert caps.get("relation_ring_budget_drops") == 1

    def test_budget_exception_type(self):
        from osm_export_tool_python_ray.stages.assemble import (
            InvalidArea,
            RingBudgetExceeded,
            stitch_rings,
        )

        th = np.linspace(0.0, 2 * np.pi, 5000, endpoint=False)
        ring = np.stack([np.cos(th), np.sin(th)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        cuts = np.linspace(0, len(ring) - 1, 11).astype(int)
        segs = [(ring[cuts[i]: cuts[i + 1] + 1], "outer") for i in range(10)]
        with pytest.raises(RingBudgetExceeded):
            stitch_rings(segs, max_ring_points=1_000)
        assert issubclass(RingBudgetExceeded, InvalidArea)
