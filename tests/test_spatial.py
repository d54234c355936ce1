"""Tile-assignment (J5) and kNN (J6) pipelines vs driver-side brute force."""

import numpy as np
import pyarrow as pa
import pytest

from osm_export_tool_python_ray.functions.tiles import lonlat_to_tile, tile_key


def make_features(n=200, seed=7):
    rng = np.random.RandomState(seed)
    lon = rng.rand(n) * 0.5
    lat = rng.rand(n) * 0.5
    w = rng.rand(n) * 0.01
    return pa.table(
        {
            "osm_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "minx": pa.array(lon),
            "miny": pa.array(lat),
            "maxx": pa.array(lon + w),
            "maxy": pa.array(lat + w),
        }
    )


class TestTileAssignment:
    def test_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.tiling import assign_features_to_tiles

        feats = make_features()
        z = 12
        # tile table: all tiles covering [0,0.5]^2 at z12
        x0, y1 = lonlat_to_tile([0.0], [0.0], z)
        x1, y0 = lonlat_to_tile([0.52], [0.52], z)
        xs = np.arange(x0[0], x1[0] + 1)
        ys = np.arange(y0[0], y1[0] + 1)
        gx, gy = np.meshgrid(xs, ys)
        tiles = pa.table(
            {
                "tkey": pa.array(tile_key(np.full(gx.size, z), gx.ravel(), gy.ravel())),
                "media_ref": pa.array(["%d/%d/%d" % (z, a, b) for a, b in zip(gx.ravel(), gy.ravel())]),
                "doc_id": pa.array(["d"] * gx.size),
                "offset": pa.array(np.zeros(gx.size, dtype=np.int32)),
            }
        )
        out = assign_features_to_tiles(
            ray.data.from_arrow(feats), ray.data.from_arrow(tiles), [z], num_buckets=8
        ).take_all()
        got = {
            (r["tile_z"], r["tile_x"], r["tile_y"]): list(r["feature_ids"]) for r in out if r["n_features"]
        }

        # brute force oracle
        expect = {}
        f = feats.to_pydict()
        for i in range(len(f["osm_id"])):
            tx0, ty1 = lonlat_to_tile([f["minx"][i]], [f["miny"][i]], z)
            tx1, ty0 = lonlat_to_tile([f["maxx"][i]], [f["maxy"][i]], z)
            for a in range(tx0[0], tx1[0] + 1):
                for b in range(ty0[0], ty1[0] + 1):
                    expect.setdefault((z, a, b), []).append(f["osm_id"][i])
        expect = {k: sorted(v) for k, v in expect.items() if k[1] in xs and k[2] in ys}
        assert got == expect

    def test_only_existing_tiles_emitted(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.tiling import assign_features_to_tiles

        feats = make_features(20)
        tiles = pa.table(
            {
                "tkey": pa.array([tile_key(np.array([12]), np.array([2048]), np.array([2047]))[0]]),
                "media_ref": pa.array(["12/2048/2047"]),
                "doc_id": pa.array(["d"]),
                "offset": pa.array(np.array([0], dtype=np.int32)),
            }
        )
        out = assign_features_to_tiles(
            ray.data.from_arrow(feats), ray.data.from_arrow(tiles), [12], num_buckets=4
        ).take_all()
        assert len(out) == 1
        assert out[0]["tile_x"] == 2048


class TestKnn:
    def test_matches_global_bruteforce_when_ring_covers(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.knn import knn_nearest_features

        feats = make_features(150, seed=3)
        rng = np.random.RandomState(11)
        qn = 25
        queries = pa.table(
            {
                "query_id": pa.array(np.arange(qn, dtype=np.int64)),
                "lon": pa.array(rng.rand(qn) * 0.5),
                "lat": pa.array(rng.rand(qn) * 0.5),
            }
        )
        # res=0 → cell ≈ 2.8°; ring=1 covers everything in [0,0.5]^2
        out = knn_nearest_features(
            ray.data.from_arrow(feats),
            ray.data.from_arrow(queries),
            k=5,
            res=0,
            ring=1,
            num_buckets=4,
        ).take_all()

        fx = (feats.column("minx").to_numpy() + feats.column("maxx").to_numpy()) / 2
        fy = (feats.column("miny").to_numpy() + feats.column("maxy").to_numpy()) / 2
        ids = feats.column("osm_id").to_numpy()
        for q in range(qn):
            qx = queries.column("lon")[q].as_py()
            qy = queries.column("lat")[q].as_py()
            d2 = (fx - qx) ** 2 + (fy - qy) ** 2
            order = np.lexsort((ids, d2))[:5]
            expect = list(ids[order])
            got = [r["osm_id"] for r in sorted((r for r in out if r["query_id"] == q), key=lambda r: r["rank"])]
            assert got == expect, "query %d" % q

    def test_ring_limits_candidates(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.knn import knn_nearest_features

        # one feature near the query, one far away (outside the ring at res 8)
        feats = pa.table(
            {
                "osm_id": pa.array([1, 2], type=pa.int64()),
                "minx": pa.array([0.1, 5.0]),
                "miny": pa.array([0.1, 5.0]),
                "maxx": pa.array([0.1, 5.0]),
                "maxy": pa.array([0.1, 5.0]),
            }
        )
        queries = pa.table(
            {
                "query_id": pa.array([7], type=pa.int64()),
                "lon": pa.array([0.1]),
                "lat": pa.array([0.1]),
            }
        )
        out = knn_nearest_features(
            ray.data.from_arrow(feats), ray.data.from_arrow(queries), k=5, res=8, ring=1, num_buckets=2
        ).take_all()
        assert [r["osm_id"] for r in out] == [1]


class TestCellCounts:
    def test_counts(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.knn import cell_counts
        from osm_export_tool_python_ray.functions.cells import cell_of

        lon = np.array([0.1, 0.1, 0.1, 5.0])
        lat = np.array([0.1, 0.1, 0.1, 5.0])
        feats = pa.table({"cell": pa.array(cell_of(lon, lat), type=pa.uint64())})
        out = cell_counts(ray.data.from_arrow(feats)).take_all()
        ns = sorted(r["n"] for r in out)
        assert ns == [1, 3]


class TestKnnSalting:
    def test_salted_equals_unsalted(self, ray_session):
        """salt_factor must be semantically invisible (global top-k merge)."""
        import ray.data
        from osm_export_tool_python_ray.stages.knn import knn_nearest_features

        feats = make_features(150, seed=3)
        rng = np.random.RandomState(11)
        queries = pa.table(
            {
                "query_id": pa.array(np.arange(10, dtype=np.int64)),
                "lon": pa.array(rng.rand(10) * 0.5),
                "lat": pa.array(rng.rand(10) * 0.5),
            }
        )

        def run(salt):
            out = knn_nearest_features(
                ray.data.from_arrow(feats),
                ray.data.from_arrow(queries),
                k=5, res=0, ring=1, num_buckets=4, salt_factor=salt,
            ).take_all()
            return sorted((r["query_id"], r["rank"], r["osm_id"]) for r in out)

        assert run(1) == run(4)


class TestHotTileCap:
    def test_truncation_flagged(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.tiling import assign_features_to_tiles
        from osm_export_tool_python_ray.functions.tiles import lonlat_to_tile, tile_key

        feats = make_features(50, seed=9)
        # all features in one z5 tile → hot tile
        x, y = lonlat_to_tile([0.25], [0.25], 5)
        tiles = pa.table(
            {
                "tkey": pa.array([tile_key(np.array([5]), x, y)[0]]),
                "media_ref": pa.array(["5/%d/%d" % (x[0], y[0])]),
            }
        )
        out = assign_features_to_tiles(
            ray.data.from_arrow(feats), ray.data.from_arrow(tiles), [5],
            num_buckets=2, max_features_per_tile=7,
        ).take_all()
        assert len(out) == 1
        r = out[0]
        assert r["truncated"] is True or r["truncated"] == True
        assert r["n_features"] == 50          # true count preserved
        assert list(r["feature_ids"]) == list(range(1, 8))  # smallest ids kept

    def test_uncapped_unchanged(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.tiling import assign_features_to_tiles
        from osm_export_tool_python_ray.functions.tiles import lonlat_to_tile, tile_key

        feats = make_features(20, seed=9)
        x, y = lonlat_to_tile([0.25], [0.25], 5)
        tiles = pa.table(
            {
                "tkey": pa.array([tile_key(np.array([5]), x, y)[0]]),
                "media_ref": pa.array(["t"]),
            }
        )
        out = assign_features_to_tiles(
            ray.data.from_arrow(feats), ray.data.from_arrow(tiles), [5], num_buckets=2
        ).take_all()
        assert out[0]["truncated"] is False or out[0]["truncated"] == False
        assert out[0]["n_features"] == 20


class TestDistRoundTieBreak:
    """The dist_round branch of _topk_group: quantized distances with
    deterministic min-osm_id tie-breaks at the k-cut (the path the knn
    oracle parity depends on)."""

    def _group(self, qlonlat, feats):
        import pyarrow as pa

        rows = []
        # one query (side 0) + features (side 1... engine uses side==0 for
        # queries) in a single cell
        rows.append(
            {"side": 0, "cell": 7, "query_id": 1, "osm_id": -1,
             "lon": qlonlat[0], "lat": qlonlat[1]}
        )
        for oid, lon, lat in feats:
            rows.append(
                {"side": 1, "cell": 7, "query_id": -1, "osm_id": oid,
                 "lon": lon, "lat": lat}
            )
        t = pa.Table.from_pylist(rows)
        import numpy as np
        return t

    def test_tied_cut_prefers_min_osm_id(self):
        import numpy as np

        from osm_export_tool_python_ray.stages.knn import _topk_group

        # four features: two at distance .01 (ids 30, 10 — tied at the
        # cut), one nearer, one farther. k=2 must keep [nearer, id 10].
        feats = [(30, 0.01, 0.0), (10, 0.0, 0.01), (5, 0.005, 0.0), (99, 0.5, 0.0)]
        out = _topk_group(self._group((0.0, 0.0), feats), k=2, dist_round=10)
        got = sorted(out.column("osm_id").to_pylist())
        assert got == [5, 10]
        # and with k=3, both tied rows are in (ids 10 and 30)
        out3 = _topk_group(self._group((0.0, 0.0), feats), k=3, dist_round=10)
        assert sorted(out3.column("osm_id").to_pylist()) == [5, 10, 30]

    def test_all_tied_beyond_k(self):
        from osm_export_tool_python_ray.stages.knn import _topk_group

        # five features all at the same distance: k=3 keeps the 3 lowest ids
        feats = [(i, 0.01, 0.0) for i in (42, 7, 19, 3, 88)]
        out = _topk_group(self._group((0.0, 0.0), feats), k=3, dist_round=10)
        assert sorted(out.column("osm_id").to_pylist()) == [3, 7, 19]

    def test_matches_full_lexsort(self):
        import numpy as np

        from osm_export_tool_python_ray.stages.knn import _topk_group

        rng = np.random.default_rng(3)
        # coarse grid -> many exact distance ties after rounding
        feats = [
            (int(i), round(float(rng.integers(0, 4)) * 0.01, 4),
             round(float(rng.integers(0, 4)) * 0.01, 4))
            for i in range(60)
        ]
        out = _topk_group(self._group((0.0, 0.0), feats), k=5, dist_round=10)
        d2 = {oid: round((lon) ** 2 + (lat) ** 2, 10) for oid, lon, lat in feats}
        want = sorted(d2, key=lambda o: (d2[o], o))[:5]
        assert sorted(out.column("osm_id").to_pylist()) == sorted(want)


class TestTileThemeCounts:
    def test_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.tiling import tile_theme_counts

        feats = make_features()
        themes = ["roads" if i % 3 else "buildings" for i in range(feats.num_rows)]
        feats = feats.append_column("theme", pa.array(themes, type=pa.string()))
        z = 12
        x0, y1 = lonlat_to_tile([0.0], [0.0], z)
        x1, y0 = lonlat_to_tile([0.52], [0.52], z)
        xs = np.arange(x0[0], x1[0] + 1)
        ys = np.arange(y0[0], y1[0] + 1)
        gx, gy = np.meshgrid(xs, ys)
        tiles = pa.table(
            {
                "tkey": pa.array(tile_key(np.full(gx.size, z), gx.ravel(), gy.ravel())),
                "media_ref": pa.array(["%d/%d/%d" % (z, a, b) for a, b in zip(gx.ravel(), gy.ravel())]),
            }
        )
        out = tile_theme_counts(
            ray.data.from_arrow(feats), ray.data.from_arrow(tiles), [z], num_buckets=8
        ).take_all()
        got = {(r["tile_z"], r["tile_x"], r["tile_y"], r["theme"]): r["n_features"] for r in out}
        assert all(v > 0 for v in got.values())

        expect = {}
        f = feats.to_pydict()
        for i in range(len(f["osm_id"])):
            tx0, ty1 = lonlat_to_tile([f["minx"][i]], [f["miny"][i]], z)
            tx1, ty0 = lonlat_to_tile([f["maxx"][i]], [f["maxy"][i]], z)
            for a in range(tx0[0], tx1[0] + 1):
                for b in range(ty0[0], ty1[0] + 1):
                    if a in xs and b in ys:
                        k = (z, a, b, f["theme"][i])
                        expect[k] = expect.get(k, 0) + 1
        assert got == expect

    def test_nonexistent_tiles_not_emitted(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.tiling import tile_theme_counts

        feats = make_features(20).append_column(
            "theme", pa.array(["roads"] * 20, type=pa.string())
        )
        tiles = pa.table(
            {
                "tkey": pa.array([tile_key(np.array([12]), np.array([2048]), np.array([2047]))[0]]),
                "media_ref": pa.array(["12/2048/2047"]),
            }
        )
        out = tile_theme_counts(
            ray.data.from_arrow(feats), ray.data.from_arrow(tiles), [12], num_buckets=4
        ).take_all()
        assert {r["tile_x"] for r in out} <= {2048}


class TestBboxIntersectionJoin:
    def _boxes(self, n, seed, spread=2.0, wmax=0.3):
        rng = np.random.RandomState(seed)
        x = rng.rand(n) * spread
        y = rng.rand(n) * spread
        w = rng.rand(n) * wmax
        h = rng.rand(n) * wmax
        return pa.table(
            {
                "fid": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "minx": pa.array(x),
                "miny": pa.array(y),
                "maxx": pa.array(x + w),
                "maxy": pa.array(y + h),
            }
        )

    def test_matches_bruteforce_exactly_once(self, ray_session):
        """Random multi-cell boxes: the owner-cell rule must yield every
        intersecting cross pair EXACTLY once (a multiset equal to the
        brute-force set proves both recall and no double emission)."""
        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import bbox_intersection_join

        left = self._boxes(120, 1)
        right = self._boxes(150, 2)
        out = bbox_intersection_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            res=5, num_buckets=8,
        ).take_all()
        got = sorted((r["l_id"], r["r_id"]) for r in out)

        lf, rf = left.to_pydict(), right.to_pydict()
        expect = sorted(
            (lf["fid"][i], rf["fid"][j])
            for i in range(len(lf["fid"]))
            for j in range(len(rf["fid"]))
            if lf["minx"][i] <= rf["maxx"][j]
            and rf["minx"][j] <= lf["maxx"][i]
            and lf["miny"][i] <= rf["maxy"][j]
            and rf["miny"][j] <= lf["maxy"][i]
        )
        assert got == expect  # sorted LISTS: multiset equality

    def test_resolution_invariance(self, ray_session):
        """The pair set must not depend on the partitioning resolution."""
        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import bbox_intersection_join

        left = self._boxes(60, 3)
        right = self._boxes(60, 4)

        def run(res):
            return sorted(
                (r["l_id"], r["r_id"])
                for r in bbox_intersection_join(
                    ray.data.from_arrow(left), ray.data.from_arrow(right),
                    res=res, num_buckets=8,
                ).take_all()
            )

        assert run(4) == run(6)

    def test_oversize_dropped_and_counted(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import bbox_intersection_join
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        left = pa.table(
            {
                "fid": pa.array([1], type=pa.int64()),
                "minx": pa.array([0.0]), "miny": pa.array([0.0]),
                "maxx": pa.array([50.0]), "maxy": pa.array([50.0]),  # continent-sized
            }
        )
        right = self._boxes(10, 5)
        snapshot_caps()
        out = bbox_intersection_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            res=8, num_buckets=4, max_cover=64,
        ).take_all()
        # report_cap is fire-and-forget from worker tasks — give the
        # counter actor a moment to drain its mailbox
        import time

        caps = {}
        for _ in range(50):
            caps.update(snapshot_caps())
            if "spatial_join_oversize_bbox" in caps:
                break
            time.sleep(0.1)
        # at-least-once: Ray re-executes lineage fragments (schema fetch,
        # shuffle map retries), and each re-execution re-reports — the
        # counter is a did-truncation-happen diagnostic, not an exact tally
        assert caps.get("spatial_join_oversize_bbox", 0) >= 1
        assert out == []  # the oversize left side was dropped, with a count

    def test_proximity_expand_vs_bruteforce(self, ray_session):
        """expand=eps yields every pair within Chebyshev distance eps."""
        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import bbox_intersection_join

        left = self._boxes(80, 6, wmax=0.05)
        right = self._boxes(80, 7, wmax=0.05)
        eps = 0.07
        out = bbox_intersection_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            res=5, num_buckets=8, expand=eps,
        ).take_all()
        got = sorted((r["l_id"], r["r_id"]) for r in out)
        lf, rf = left.to_pydict(), right.to_pydict()
        expect = sorted(
            (lf["fid"][i], rf["fid"][j])
            for i in range(len(lf["fid"]))
            for j in range(len(rf["fid"]))
            if lf["minx"][i] - eps <= rf["maxx"][j]
            and rf["minx"][j] <= lf["maxx"][i] + eps
            and lf["miny"][i] - eps <= rf["maxy"][j]
            and rf["miny"][j] <= lf["maxy"][i] + eps
        )
        assert got == expect


class TestCellPyramid:
    def test_levels_consistent(self, ray_session):
        """Each pyramid level must sum to the base count, and every
        parent must equal the sum of its children (rollup correctness
        independent of the SQL oracle)."""
        from osm_export_tool_python_ray.pipelines.queries import q_cell_pyramid

        rows = q_cell_pyramid("/root/testdata/sf0.001").take_all()
        by_res = {}
        for r in rows:
            by_res.setdefault(r["res"], {})[(r["ix"], r["iy"])] = r["n"]
        assert set(by_res) == {4, 6, 8}
        totals = {res: sum(v.values()) for res, v in by_res.items()}
        assert totals[8] == totals[6] == totals[4]
        for (ix, iy), n in by_res[6].items():
            children = sum(
                v for (cx, cy), v in by_res[8].items() if cx // 4 == ix and cy // 4 == iy
            )
            assert children == n, (ix, iy)

    def test_dense_cell_chunked_path(self, ray_session):
        """A single cell with hundreds of rows per side exercises the
        left-chunked all-pairs path (forced tiny chunk via a dense
        cluster) — results must equal brute force."""
        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import bbox_intersection_join

        rng = np.random.RandomState(9)
        n = 300
        def dense(seed, start):
            r = np.random.RandomState(seed)
            x = 1.0 + r.rand(n) * 0.01      # all inside one res-5 cell
            y = 1.0 + r.rand(n) * 0.01
            return pa.table(
                {
                    "fid": pa.array(np.arange(start, start + n, dtype=np.int64)),
                    "minx": pa.array(x), "miny": pa.array(y),
                    "maxx": pa.array(x + 0.002), "maxy": pa.array(y + 0.002),
                }
            )
        left, right = dense(1, 0), dense(2, 10_000)
        out = bbox_intersection_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            res=5, num_buckets=4,
        ).take_all()
        got = sorted((r["l_id"], r["r_id"]) for r in out)
        lf, rf = left.to_pydict(), right.to_pydict()
        expect = sorted(
            (lf["fid"][i], rf["fid"][j])
            for i in range(n) for j in range(n)
            if lf["minx"][i] <= rf["maxx"][j] and rf["minx"][j] <= lf["maxx"][i]
            and lf["miny"][i] <= rf["maxy"][j] and rf["miny"][j] <= lf["maxy"][i]
        )
        assert len(expect) > 1000  # genuinely dense
        assert got == expect

    def test_degenerate_bbox_dropped_and_counted(self, ray_session):
        """Inverted (antimeridian-style) and NaN bboxes drop with the
        spatial_join_degenerate_bbox cap — not silently, and never as a
        bogus clipped cell."""
        import time

        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import bbox_intersection_join
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        left = pa.table(
            {
                "fid": pa.array([1, 2, 3], type=pa.int64()),
                "minx": pa.array([179.0, float("nan"), 0.10]),
                "miny": pa.array([0.0, 0.0, 0.10]),
                "maxx": pa.array([-179.0, 1.0, 0.11]),  # 1: inverted, 2: NaN, 3: fine
                "maxy": pa.array([1.0, 1.0, 0.11]),
            }
        )
        right = pa.table(
            {
                "fid": pa.array([10], type=pa.int64()),
                "minx": pa.array([0.1]), "miny": pa.array([0.1]),
                "maxx": pa.array([0.11]), "maxy": pa.array([0.11]),
            }
        )
        snapshot_caps()
        out = bbox_intersection_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            res=5, num_buckets=4,
        ).take_all()
        assert sorted((r["l_id"], r["r_id"]) for r in out) == [(3, 10)]
        caps = {}
        for _ in range(50):
            caps.update(snapshot_caps())
            if "spatial_join_degenerate_bbox" in caps:
                break
            time.sleep(0.1)
        assert caps.get("spatial_join_degenerate_bbox", 0) >= 2


class TestPointsNotNear:
    """ε-proximity anti-join (stages/spatial_join.py points_not_near):
    brute-force equality and the cross-cell boundary case the 3×3
    replication exists for."""

    @staticmethod
    def _tbl(ids, lons, lats):
        import pyarrow as pa
        import numpy as np

        return pa.table(
            {
                "pid": pa.array(np.asarray(ids, dtype=np.int64)),
                "lon": pa.array(np.asarray(lons, dtype=np.float64)),
                "lat": pa.array(np.asarray(lats, dtype=np.float64)),
            }
        )

    def test_neighbor_cell_feature_still_drops(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import points_not_near

        # cell_size 0.02: point at 0.0199 and feature at 0.0201 are in
        # DIFFERENT cells but distance 0.0002 << eps — must be dropped;
        # a far point in the same cell as the feature must be kept
        pts = self._tbl([1, 2], [0.0199, 0.0399], [0.01, 0.039])
        fts = self._tbl([7], [0.0201], [0.01])
        out = points_not_near(
            ray.data.from_arrow(pts), ray.data.from_arrow(fts),
            eps2=0.00025, cell_size=0.02, num_buckets=4,
        ).take_all()
        assert [r["pid"] for r in out] == [2]

    def test_matches_brute_force(self, ray_session):
        import numpy as np
        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import points_not_near

        rng = np.random.RandomState(13)
        p_lon, p_lat = rng.rand(200), rng.rand(200)
        f_lon, f_lat = rng.rand(15), rng.rand(15)
        eps2 = 0.003
        out = points_not_near(
            ray.data.from_arrow(self._tbl(np.arange(200), p_lon, p_lat)),
            ray.data.from_arrow(self._tbl(np.arange(15), f_lon, f_lat)),
            eps2=eps2, cell_size=0.06, num_buckets=8,
        ).take_all()
        got = sorted(r["pid"] for r in out)
        dx = p_lon[:, None] - f_lon[None, :]
        dy = p_lat[:, None] - f_lat[None, :]
        near = ((dx * dx + dy * dy) < eps2).any(axis=1)
        assert got == sorted(np.nonzero(~near)[0].tolist())

    def test_no_features_keeps_everything(self, ray_session):
        import numpy as np
        import ray.data
        from osm_export_tool_python_ray.stages.spatial_join import points_not_near

        pts = self._tbl([3, 4, 5], [0.1, 0.2, 0.3], [0.1, 0.2, 0.3])
        import pyarrow as pa

        empty = self._tbl([], [], [])
        out = points_not_near(
            ray.data.from_arrow(pts), ray.data.from_arrow(empty),
            eps2=0.001, cell_size=0.05, num_buckets=4,
        ).take_all()
        assert sorted(r["pid"] for r in out) == [3, 4, 5]
