"""Grid hotspot analytics (stages/hotspots.py) and movement octants
(stages/journey.py move_octants) vs driver-side brute force."""

import numpy as np
import pyarrow as pa
import pytest


def _points_table(lon, lat):
    return pa.table(
        {
            "lon": pa.array(np.asarray(lon, dtype=np.float64)),
            "lat": pa.array(np.asarray(lat, dtype=np.float64)),
        }
    )


def _cells_of(lon, lat, res=8):
    from osm_export_tool_python_ray.functions.cells import cell_of

    return cell_of(np.asarray(lon), np.asarray(lat), res=res).astype(np.int64)


class TestCcLabels:
    @staticmethod
    def _brute(cells):
        """BFS connected components over packed 4-adjacency."""
        IX = 1 << 29
        cs = set(int(c) for c in cells)
        label = {}
        for c in sorted(cs):
            if c in label:
                continue
            comp, frontier = [], [c]
            seen = {c}
            while frontier:
                v = frontier.pop()
                comp.append(v)
                for nb in (v + 1, v - 1, v + IX, v - IX):
                    if nb in cs and nb not in seen:
                        seen.add(nb)
                        frontier.append(nb)
            lo = min(comp)
            for v in comp:
                label[v] = lo
        return label

    def test_matches_bfs(self):
        from osm_export_tool_python_ray.stages.hotspots import cc_labels

        rng = np.random.RandomState(11)
        IX = 1 << 29
        base = np.int64(8) << np.int64(58)
        for trial in range(30):
            n = int(rng.randint(1, 120))
            ix = rng.randint(0, 12, size=n).astype(np.int64)
            iy = rng.randint(0, 12, size=n).astype(np.int64)
            cells = np.unique(base + ix * IX + iy)
            labels = cc_labels(cells)
            want = self._brute(cells)
            assert {int(c): int(l) for c, l in zip(cells, labels)} == want, trial

    def test_empty_and_singleton(self):
        from osm_export_tool_python_ray.stages.hotspots import cc_labels

        assert len(cc_labels(np.array([], dtype=np.int64))) == 0
        one = np.array([(8 << 58) + 5], dtype=np.int64)
        assert cc_labels(one).tolist() == one.tolist()


class TestCellDensitySmooth:
    def test_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.hotspots import cell_density_smooth

        rng = np.random.RandomState(3)
        lon = rng.rand(500) * 0.3
        lat = rng.rand(500) * 0.3
        out = cell_density_smooth(
            ray.data.from_arrow(_points_table(lon, lat)), res=8
        ).take_all()
        got = {r["cell"]: (r["n"], r["smooth_n"]) for r in out}

        cells = _cells_of(lon, lat)
        from collections import Counter

        cnt = Counter(cells.tolist())
        IX = 1 << 29
        want = {}
        for c, n in cnt.items():
            smooth = sum(
                cnt.get(c + dx * IX + dy, 0)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            )
            want[c] = (n, smooth)
        assert got == want

    def test_isolated_cell(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.hotspots import cell_density_smooth

        out = cell_density_smooth(
            ray.data.from_arrow(_points_table([0.1, 0.1], [0.1, 0.1])), res=8
        ).take_all()
        assert len(out) == 1 and out[0]["n"] == 2 and out[0]["smooth_n"] == 2


class TestGridClusters:
    def test_two_blobs(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.hotspots import grid_clusters

        # blob A: 2 adjacent occupied cells (3 + 2 points); blob B: one
        # far cell with 4 points; one noise cell with a single point
        cw = 360.0 / 32768.0  # cell width in degrees
        lon = [0.0] * 3 + [cw] * 2 + [1.0] * 4 + [2.0]
        lat = [0.0] * 9 + [2.0]
        out = grid_clusters(
            ray.data.from_arrow(_points_table(lon, lat)), res=8, min_pts=2
        ).take_all()
        got = sorted((r["n_cells"], r["n_points"]) for r in out)
        assert got == [(1, 4), (2, 5)]
        cells_a = _cells_of([0.0, cw], [0.0, 0.0])
        lab_a = [r for r in out if r["n_cells"] == 2][0]["cluster_id"]
        assert lab_a == int(cells_a.min())

    def test_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.hotspots import grid_clusters
        from tests.test_hotspots import TestCcLabels

        rng = np.random.RandomState(9)
        lon = (rng.randint(0, 15, size=600) * (360.0 / 32768.0)) + 0.0001
        lat = (rng.randint(0, 15, size=600) * (360.0 / 32768.0)) + 0.0001
        out = grid_clusters(
            ray.data.from_arrow(_points_table(lon, lat)), res=8, min_pts=3
        ).take_all()

        from collections import Counter

        cnt = Counter(_cells_of(lon, lat).tolist())
        core = sorted(c for c, n in cnt.items() if n >= 3)
        labels = TestCcLabels._brute(np.array(core, dtype=np.int64))
        want = {}
        for c in core:
            l = labels[c]
            nc, npts = want.get(l, (0, 0))
            want[l] = (nc + 1, npts + cnt[c])
        assert {r["cluster_id"]: (r["n_cells"], r["n_points"]) for r in out} == want


class TestMoveOctants:
    def test_kernel_all_directions(self):
        from osm_export_tool_python_ray.stages.journey import octants_of

        dx = np.array([2, 1, 0, -1, -2, -1, 0, 1, 0, 3, -3], dtype=np.int64)
        dy = np.array([0, 1, 2, 1, 0, -1, -2, -1, 0, 1, -1], dtype=np.int64)
        #      E  NE  N  NW  W  SW  S  SE  stat  E(|dx|>|dy|)  W
        want = [0, 1, 2, 3, 4, 5, 6, 7, 8, 0, 4]
        assert octants_of(dx, dy).tolist() == want

    def test_stage_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import (
            move_octants, octants_of,
        )
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(21)
        rows = [
            (int(rng.randint(0, 5_000)), int(rng.randint(1, 10)),
             int(rng.randint(0, 400)), "view", 0.0)
            for i in range(500)
        ]
        out = move_octants(
            ray.data.from_arrow(_events_table(rows)), num_buckets=4, num_partitions=2
        ).take_all()

        from collections import Counter, defaultdict

        by_user = defaultdict(list)
        for eid, u, ts, _et, _v in rows:
            by_user[u].append((ts, eid))
        want = Counter()
        for pts in by_user.values():
            pts.sort()
            eid = np.array([p[1] for p in pts], dtype=np.int64)
            x, y = eid % 100, (eid // 7) % 100
            if len(eid) > 1:
                want.update(octants_of(np.diff(x), np.diff(y)).tolist())
        assert {r["octant"]: r["n"] for r in out} == dict(want)

    def test_parallelism_determinism(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import move_octants
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(2)
        rows = [
            (int(rng.randint(0, 2_000)), int(rng.randint(1, 7)),
             int(rng.randint(0, 300)), "view", 0.0)
            for i in range(300)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = move_octants(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb, num_partitions=npart,
            ).take_all()
            outs.append(sorted((r["octant"], r["n"]) for r in res))
        assert outs[0] == outs[1]


class TestUserHulls:
    @staticmethod
    def _brute(x, y):
        """Edge-characterization reference (the oracle's rule): directed
        pair (a,b) is a hull edge iff every other point is strictly left
        or collinear strictly between; vertices = edge endpoints (plus
        the point itself when only one distinct point exists)."""
        pts = sorted(set(zip(map(int, x), map(int, y))))
        if len(pts) == 1:
            return pts
        verts = set()
        for a in pts:
            for b in pts:
                if a == b:
                    continue
                ok = True
                for c in pts:
                    if c == a or c == b:
                        continue
                    cr = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
                    dot = (c[0] - a[0]) * (b[0] - a[0]) + (c[1] - a[1]) * (b[1] - a[1])
                    ln2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
                    if not (cr > 0 or (cr == 0 and 0 < dot < ln2)):
                        ok = False
                        break
                if ok:
                    verts.add(a)
                    verts.add(b)
        return sorted(verts)

    def test_kernel_planted(self):
        from osm_export_tool_python_ray.stages.journey import hull_vertices

        # square + interior + collinear boundary midpoints: corners only
        x = np.array([0, 0, 4, 4, 2, 2, 0, 2], dtype=np.int64)
        y = np.array([0, 4, 0, 4, 2, 0, 2, 4], dtype=np.int64)
        assert hull_vertices(x, y) == [(0, 0), (0, 4), (4, 0), (4, 4)]
        # collinear -> extremes; duplicates -> single point
        assert hull_vertices(
            np.array([1, 3, 5, 3]), np.array([1, 1, 1, 1])
        ) == [(1, 1), (5, 1)]
        assert hull_vertices(np.array([2, 2]), np.array([7, 7])) == [(2, 7)]

    def test_kernel_matches_edge_characterization(self):
        from osm_export_tool_python_ray.stages.journey import hull_vertices

        rng = np.random.RandomState(13)
        for trial in range(80):
            n = int(rng.randint(1, 30))
            span = int(rng.choice([3, 6, 50]))  # dense grids force collinear runs
            x = rng.randint(0, span, size=n).astype(np.int64)
            y = rng.randint(0, span, size=n).astype(np.int64)
            assert hull_vertices(x, y) == self._brute(x, y), (trial, span)

    def test_stage_and_determinism(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import hull_vertices, user_hulls
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(29)
        rows = [
            (int(rng.randint(0, 8_000)), int(rng.randint(1, 12)),
             int(rng.randint(0, 300)), "view", 0.0)
            for i in range(400)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = user_hulls(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb, num_partitions=npart,
            ).take_all()
            outs.append(sorted((r["user_id"], r["x"], r["y"]) for r in res))
        assert outs[0] == outs[1]

        from collections import defaultdict
        by_user = defaultdict(list)
        for eid, u, _ts, _et, _v in rows:
            by_user[u].append(eid)
        want = []
        for u, eids in by_user.items():
            eid = np.array(eids, dtype=np.int64)
            for hx, hy in hull_vertices(eid % 100, (eid // 7) % 100):
                want.append((u, hx, hy))
        assert outs[0] == sorted(want)


class TestTrajectoryGeometry:
    @staticmethod
    def _brute_crossings(x, y):
        """Scalar per-pair re-evaluation of the strict predicate."""
        n = 0
        m = len(x) - 1
        for i in range(m):
            for j in range(i + 1, m):
                d1 = (x[j + 1] - x[j]) * (y[i] - y[j]) - (y[j + 1] - y[j]) * (x[i] - x[j])
                d2 = (x[j + 1] - x[j]) * (y[i + 1] - y[j]) - (y[j + 1] - y[j]) * (x[i + 1] - x[j])
                d3 = (x[i + 1] - x[i]) * (y[j] - y[i]) - (y[i + 1] - y[i]) * (x[j] - x[i])
                d4 = (x[i + 1] - x[i]) * (y[j + 1] - y[i]) - (y[i + 1] - y[i]) * (x[j + 1] - x[i])
                if d1 * d2 < 0 and d3 * d4 < 0:
                    n += 1
        return n

    @staticmethod
    def _brute_area2(x, y):
        """Shoelace over the edge-characterization hull vertices ordered
        CCW by angle around the centroid — independent of the chain."""
        import math

        verts = TestUserHulls._brute(x, y)
        if len(verts) < 3:
            return 0
        cx = sum(v[0] for v in verts) / len(verts)
        cy = sum(v[1] for v in verts) / len(verts)
        verts = sorted(verts, key=lambda v: math.atan2(v[1] - cy, v[0] - cx))
        s = 0
        for (ax, ay), (bx, by) in zip(verts, verts[1:] + verts[:1]):
            s += ax * by - bx * ay
        return s

    def test_kernels_match_brute_force(self):
        from osm_export_tool_python_ray.stages.journey import (
            count_proper_crossings, hull_area2,
        )

        rng = np.random.RandomState(37)
        for trial in range(60):
            n = int(rng.randint(1, 25))
            span = int(rng.choice([4, 10, 60]))
            x = rng.randint(0, span, size=n).astype(np.int64)
            y = rng.randint(0, span, size=n).astype(np.int64)
            assert count_proper_crossings(x, y) == self._brute_crossings(
                list(map(int, x)), list(map(int, y))
            ), (trial, "cross")
            assert hull_area2(x, y) == self._brute_area2(x, y), (trial, "area")

    def test_planted(self):
        from osm_export_tool_python_ray.stages.journey import (
            count_proper_crossings, hull_area2,
        )

        # figure-X: one proper crossing; T-touch and shared endpoints: none
        assert count_proper_crossings(
            np.array([0, 2, 0, 2], dtype=np.int64),
            np.array([0, 2, 2, 0], dtype=np.int64),
        ) == 1
        # path turning at a shared vertex never "crosses"
        assert count_proper_crossings(
            np.array([0, 2, 2, 0], dtype=np.int64),
            np.array([0, 0, 2, 2], dtype=np.int64),
        ) == 0
        # T-touch (endpoint of one segment interior to another) is not proper
        assert count_proper_crossings(
            np.array([0, 4, 2, 2], dtype=np.int64),
            np.array([0, 0, 0, 3], dtype=np.int64),
        ) == 0
        assert hull_area2(
            np.array([0, 0, 4, 4, 2], dtype=np.int64),
            np.array([0, 4, 0, 4, 2], dtype=np.int64),
        ) == 32

    def test_stage_determinism(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import trajectory_geometry
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(41)
        rows = [
            (int(rng.randint(0, 6_000)), int(rng.randint(1, 10)),
             int(rng.randint(0, 400)), "view", 0.0)
            for i in range(350)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = trajectory_geometry(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb, num_partitions=npart,
            ).take_all()
            outs.append(sorted((r["user_id"], r["n_cross"], r["hull_area2"]) for r in res))
        assert outs[0] == outs[1]


class TestOdMatrix:
    def test_matches_bruteforce_and_determinism(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import od_matrix
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(53)
        rows = [
            (int(rng.randint(0, 6_000)), int(rng.randint(1, 20)),
             int(rng.randint(0, 400)), "view", 0.0)
            for i in range(500)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = od_matrix(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb, num_partitions=npart,
            ).take_all()
            outs.append(
                sorted((r["ox"], r["oy"], r["dx"], r["dy"], r["n_users"]) for r in res)
            )
        assert outs[0] == outs[1]

        from collections import Counter, defaultdict
        by_user = defaultdict(list)
        for eid, u, ts, _et, _v in rows:
            by_user[u].append((ts, eid))
        want = Counter()
        for pts in by_user.values():
            pts.sort()
            o, d = pts[0][1], pts[-1][1]
            want[(o % 100, (o // 7) % 100, d % 100, (d // 7) % 100)] += 1
        assert outs[0] == sorted(k + (v,) for k, v in want.items())

    def test_single_event_user_is_self_loop(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import od_matrix
        from tests.test_temporal import _events_table

        out = od_matrix(
            ray.data.from_arrow(_events_table([(213, 5, 7, "view", 0.0)])),
            num_buckets=2, num_partitions=1,
        ).take_all()
        x, y = 213 % 100, (213 // 7) % 100
        assert out == [{"ox": x, "oy": y, "dx": x, "dy": y, "n_users": 1}]


class TestGridDistance:
    @staticmethod
    def _brute(cells, seeds, max_hops):
        """Dict-BFS reference."""
        IX = 1 << 29
        cs = set(int(c) for c in cells)
        dist = {int(c): 0 for c in seeds if int(c) in cs}
        frontier = list(dist)
        for h in range(1, max_hops + 1):
            nxt = []
            for v in frontier:
                for nb in (v + 1, v - 1, v + IX, v - IX):
                    if nb in cs and nb not in dist:
                        dist[nb] = h
                        nxt.append(nb)
            frontier = nxt
        return dist

    def test_kernel_matches_bfs(self):
        from osm_export_tool_python_ray.stages.hotspots import bfs_distances

        rng = np.random.RandomState(61)
        IX = 1 << 29
        base = np.int64(8) << np.int64(58)
        for trial in range(30):
            n = int(rng.randint(1, 150))
            cells = np.unique(
                base
                + rng.randint(0, 14, size=n).astype(np.int64) * IX
                + rng.randint(0, 14, size=n).astype(np.int64)
            )
            nseed = int(rng.randint(0, len(cells) + 1))
            mask = np.zeros(len(cells), dtype=bool)
            mask[rng.choice(len(cells), size=nseed, replace=False)] = True
            hops = int(rng.randint(0, 8))
            d = bfs_distances(cells, mask, hops)
            want = self._brute(cells, cells[mask], hops)
            got = {int(c): int(x) for c, x in zip(cells, d) if x >= 0}
            assert got == want, (trial, hops)

    def test_stage_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.hotspots import grid_bfs_distance

        rng = np.random.RandomState(67)
        cw = 360.0 / 32768.0
        lon = (rng.randint(0, 20, size=400) * cw) + 0.0001
        lat = (rng.randint(0, 20, size=400) * cw) + 0.0001
        slon = (rng.randint(0, 20, size=12) * cw) + 0.0001
        slat = (rng.randint(0, 20, size=12) * cw) + 0.0001
        out = grid_bfs_distance(
            ray.data.from_arrow(_points_table(lon, lat)),
            ray.data.from_arrow(_points_table(slon, slat)),
            res=8, max_hops=4,
        ).take_all()
        occ = np.unique(_cells_of(lon, lat))
        seeds = np.unique(_cells_of(slon, slat))
        want = self._brute(occ, [s for s in seeds if s in set(occ.tolist())], 4)
        assert {r["cell"]: r["dist"] for r in out} == want

    def test_no_seeds_empty(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.hotspots import grid_bfs_distance

        out = grid_bfs_distance(
            ray.data.from_arrow(_points_table([0.1, 0.2], [0.1, 0.2])),
            ray.data.from_arrow(_points_table([50.0], [50.0])),
            res=8, max_hops=3,
        ).take_all()
        assert out == []


class TestStayPoints:
    @staticmethod
    def _brute(rows, cell_div=10, min_events=2, min_dwell_us=0):
        from collections import defaultdict

        by_user = defaultdict(list)
        for eid, u, ts, _et, _v in rows:
            by_user[u].append((ts, eid))
        out = {}
        for u, pts in by_user.items():
            pts.sort()
            stays = []
            run = [pts[0]]
            def cell(p):
                return ((p[1] % 100) // cell_div, ((p[1] // 7) % 100) // cell_div)
            for p in pts[1:]:
                if cell(p) == cell(run[-1]):
                    run.append(p)
                else:
                    stays.append(run)
                    run = [p]
            stays.append(run)
            kept = [
                r[-1][0] - r[0][0]
                for r in stays
                if len(r) >= min_events and r[-1][0] - r[0][0] >= min_dwell_us
            ]
            if kept:
                out[u] = (len(kept), sum(kept), max(kept))
        return out

    def test_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import stay_points
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(33)
        # small event_id range => coarse cells repeat => real runs form
        rows = [
            (int(rng.randint(0, 300)), int(rng.randint(1, 8)),
             int(rng.randint(0, 5_000)), "view", 0.0)
            for _ in range(400)
        ]
        out = stay_points(
            ray.data.from_arrow(_events_table(rows)),
            min_dwell_us=100, num_buckets=4, num_partitions=2,
        ).take_all()
        got = {
            r["user_id"]: (r["n_stays"], r["total_dwell_us"], r["max_dwell_us"])
            for r in out
        }
        assert got == self._brute(rows, min_dwell_us=100)

    def test_dwell_and_minevents_filters(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import stay_points
        from tests.test_temporal import _events_table

        # user 1: three events in one cell, dwell 200us; user 2: a
        # single-event visit (never a stay) then a 2-event run of dwell 50
        rows = [
            (5, 1, 1_000, "view", 0.0),
            (6, 1, 1_100, "view", 0.0),
            (7, 1, 1_200, "view", 0.0),
            (500, 2, 10, "view", 0.0),
            (5, 2, 2_000, "view", 0.0),
            (6, 2, 2_050, "view", 0.0),
        ]
        ds = ray.data.from_arrow(_events_table(rows))
        out = stay_points(ds, min_dwell_us=100, num_buckets=2, num_partitions=1).take_all()
        assert {r["user_id"]: r["n_stays"] for r in out} == {1: 1}
        out0 = stay_points(ds, min_dwell_us=0, num_buckets=2, num_partitions=1).take_all()
        assert {r["user_id"]: r["n_stays"] for r in out0} == {1: 1, 2: 1}

    def test_parallelism_determinism(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import stay_points
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(34)
        rows = [
            (int(rng.randint(0, 200)), int(rng.randint(1, 6)),
             int(rng.randint(0, 3_000)), "view", 0.0)
            for _ in range(300)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = stay_points(
                ray.data.from_arrow(_events_table(rows)),
                min_dwell_us=10, num_buckets=nb, num_partitions=npart,
            ).take_all()
            outs.append(sorted(tuple(sorted(r.items())) for r in res))
        assert outs[0] == outs[1]


class TestEncounters:
    @staticmethod
    def _brute(rows, cell_div=10, bucket_us=3_600_000_000):
        from collections import defaultdict

        groups = defaultdict(set)
        for eid, u, ts, _et, _v in rows:
            cx = (eid % 100) // cell_div
            cy = ((eid // 7) % 100) // cell_div
            groups[(cx, cy, ts // bucket_us)].add(u)
        pairs = defaultdict(int)
        for users in groups.values():
            us = sorted(users)
            for i in range(len(us)):
                for j in range(i + 1, len(us)):
                    pairs[(us[i], us[j])] += 1
        return dict(pairs)

    def test_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import encounters
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(35)
        rows = [
            (int(rng.randint(0, 400)), int(rng.randint(1, 12)),
             int(rng.randint(0, 10_000)), "view", 0.0)
            for _ in range(500)
        ]
        out = encounters(
            ray.data.from_arrow(_events_table(rows)),
            bucket_us=2_000, num_buckets=4, num_partitions=2,
        ).take_all()
        got = {(r["user_a"], r["user_b"]): r["n_shared"] for r in out}
        assert got == self._brute(rows, bucket_us=2_000)

    def test_group_cap_truncates_and_counts(self, ray_session):
        import time

        import ray.data
        from osm_export_tool_python_ray.stages.journey import encounters
        from osm_export_tool_python_ray.state.metrics import snapshot_caps
        from tests.test_temporal import _events_table

        # 10 users in ONE cell+bucket; cap=4 keeps the 4 smallest ids
        rows = [(1, u, 100, "view", 0.0) for u in range(1, 11)]
        snapshot_caps()
        out = encounters(
            ray.data.from_arrow(_events_table(rows)),
            group_cap=4, num_buckets=2, num_partitions=1,
        ).take_all()
        got = sorted((r["user_a"], r["user_b"]) for r in out)
        assert got == [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        caps = {}
        for _ in range(50):
            caps.update(snapshot_caps())
            if "encounter_group_truncated" in caps:
                break
            time.sleep(0.1)
        assert caps.get("encounter_group_truncated", 0) >= 6

    def test_parallelism_determinism(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import encounters
        from tests.test_temporal import _events_table

        rng = np.random.RandomState(36)
        rows = [
            (int(rng.randint(0, 300)), int(rng.randint(1, 9)),
             int(rng.randint(0, 8_000)), "view", 0.0)
            for _ in range(400)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = encounters(
                ray.data.from_arrow(_events_table(rows)),
                bucket_us=3_000, num_buckets=nb, num_partitions=npart,
            ).take_all()
            outs.append(sorted(tuple(sorted(r.items())) for r in res))
        assert outs[0] == outs[1]


class TestMoranPartials:
    def test_matches_bruteforce(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.functions.cells import cell_of
        from osm_export_tool_python_ray.stages.hotspots import moran_partials

        rng = np.random.RandomState(40)
        lon = rng.uniform(-0.5, 0.5, 600)
        lat = rng.uniform(-0.5, 0.5, 600)
        ds = ray.data.from_arrow(
            pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
        ).repartition(4)
        row = moran_partials(ds, res=8).take_all()[0]

        from collections import Counter

        counts = Counter(cell_of(lon, lat, res=8).astype(np.int64).tolist())
        IX = 1 << 29
        n_pairs = pair_prod = deg_n = 0
        for c, n in counts.items():
            for off in (1, -1, IX, -IX):
                if c + off in counts:
                    n_pairs += 1
                    pair_prod += n * counts[c + off]
                    deg_n += n
        assert row == {
            "n_cells": len(counts),
            "sum_n": sum(counts.values()),
            "sum_n2": sum(n * n for n in counts.values()),
            "n_pairs": n_pairs,
            "pair_prod": pair_prod,
            "deg_n": deg_n,
        }

    def test_no_adjacent_cells(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.hotspots import moran_partials

        # two far-apart points: occupied cells with zero rook neighbors
        ds = ray.data.from_arrow(
            pa.table({"lon": pa.array([0.0, 10.0]), "lat": pa.array([0.0, 10.0])})
        )
        row = moran_partials(ds, res=8).take_all()[0]
        assert row == {
            "n_cells": 2, "sum_n": 2, "sum_n2": 2,
            "n_pairs": 0, "pair_prod": 0, "deg_n": 0,
        }


class TestGridWeightedDistance:
    def _brute(self, cells, counts, seeds, max_cost, thr):
        import heapq

        cost = {c: (3 if n >= thr else 1) for c, n in zip(cells, counts)}
        IX = 1 << 29
        dist = {c: 0 for c in seeds}
        pq = [(0, c) for c in seeds]
        heapq.heapify(pq)
        while pq:
            d, c = heapq.heappop(pq)
            if d > dist.get(c, 10**18):
                continue
            for nb in (c + 1, c - 1, c + IX, c - IX):
                if nb in cost:
                    nd = d + cost[nb]
                    if nd < dist.get(nb, 10**18):
                        dist[nb] = nd
                        heapq.heappush(pq, (nd, nb))
        return {c: d for c, d in dist.items() if d <= max_cost}

    def test_matches_heap_dijkstra(self):
        from osm_export_tool_python_ray.stages.hotspots import dijkstra_distances

        rng = np.random.RandomState(3)
        base = np.int64(8) << np.int64(58)
        cells = np.unique(
            base
            + rng.randint(0, 12, 400).astype(np.int64) * (np.int64(1) << np.int64(29))
            + rng.randint(0, 12, 400).astype(np.int64)
        )
        counts = rng.randint(1, 4, len(cells)).astype(np.int64)
        seed_mask = rng.rand(len(cells)) < 0.05
        if not seed_mask.any():
            seed_mask[0] = True
        got = dijkstra_distances(cells, counts, seed_mask, 8, 2)
        want = self._brute(
            cells.tolist(), counts.tolist(), cells[seed_mask].tolist(), 8, 2
        )
        gmap = {int(c): int(d) for c, d in zip(cells, got) if d >= 0}
        assert gmap == want

    def test_congestion_changes_routes(self):
        from osm_export_tool_python_ray.stages.hotspots import dijkstra_distances

        base = np.int64(8) << np.int64(58)
        # a 1×5 corridor; middle cell congested
        cells = base + np.arange(5, dtype=np.int64)
        counts = np.array([1, 1, 5, 1, 1], dtype=np.int64)
        seed = np.array([True, False, False, False, False])
        d = dijkstra_distances(cells, counts, seed, 8, 2)
        assert d.tolist() == [0, 1, 4, 5, 6]


class TestConvoys:
    """Convoy detection (stages/journey.py convoys): brute-force
    differential on random inputs, planted consecutive-run semantics,
    parallelism invariance."""

    @staticmethod
    def _brute(rows, cell_div=10, bucket_us=3_600_000_000, min_len=2):
        from collections import defaultdict

        groups = defaultdict(set)
        for eid, u, ts, _et, _v in rows:
            cx = (eid % 100) // cell_div
            cy = ((eid // 7) % 100) // cell_div
            groups[(cx, cy, ts // bucket_us)].add(u)
        pair_bins = defaultdict(set)
        for (cx, cy, hb), users in groups.items():
            us = sorted(users)
            for i in range(len(us)):
                for j in range(i + 1, len(us)):
                    pair_bins[(us[i], us[j])].add(hb)
        out = {}
        for pair, bins in pair_bins.items():
            bs = sorted(bins)
            runs, cur = [], 1
            for k in range(1, len(bs)):
                if bs[k] == bs[k - 1] + 1:
                    cur += 1
                else:
                    runs.append(cur)
                    cur = 1
            runs.append(cur)
            q = [r for r in runs if r >= min_len]
            if q:
                out[pair] = (len(q), max(q))
        return out

    @staticmethod
    def _run(rows, **kw):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import convoys
        from tests.test_temporal import _events_table

        res = convoys(ray.data.from_arrow(_events_table(rows)), **kw).take_all()
        return {
            (r["user_a"], r["user_b"]): (r["n_convoys"], r["longest_run"])
            for r in res
        }

    def test_planted_runs(self, ray_session):
        # user 1 and 2 share cell (0,0) in buckets 0,1,2 and 5,6; bucket 8
        # alone is not a convoy. event_id=0 -> cell (0,0).
        rows = []
        eid = 0
        for hb in (0, 1, 2, 5, 6, 8):
            for u in (1, 2):
                rows.append((0, u, hb * 1000 + u, "v", 0.0))
        out = self._run(rows, bucket_us=1_000, num_buckets=2, num_partitions=1)
        assert out == {(1, 2): (2, 3)}

    @pytest.mark.parametrize("seed", [7, 41, 99])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        rows = [
            (int(rng.randint(0, 400)), int(rng.randint(1, 10)),
             int(rng.randint(0, 12_000)), "view", 0.0)
            for _ in range(600)
        ]
        got = self._run(rows, bucket_us=2_000, num_buckets=4, num_partitions=2)
        assert got == self._brute(rows, bucket_us=2_000)

    def test_parallelism_determinism(self, ray_session):
        rng = np.random.RandomState(13)
        rows = [
            (int(rng.randint(0, 300)), int(rng.randint(1, 9)),
             int(rng.randint(0, 8_000)), "view", 0.0)
            for _ in range(400)
        ]
        a = self._run(rows, bucket_us=2_000, num_buckets=2, num_partitions=1)
        b = self._run(rows, bucket_us=2_000, num_buckets=8, num_partitions=4)
        assert a == b


class TestDistributedFallback:
    """VERDICT r4 item 4: the driver-reduced-graph finishes must have a
    cap-or-fallback. Force driver_limit=0 so the distributed path
    (bucketed adjacency semi-join + label propagation / frontier
    relaxation) runs, and assert results identical to the driver path."""

    def _pts(self, rng, n=400):
        # clustered point field with congested pockets
        cx = rng.choice([0.11, 0.13, 0.31, 0.52], n)
        cy = rng.choice([0.12, 0.33, 0.54], n)
        lon = cx + rng.integers(0, 4, n) * 0.0005
        lat = cy + rng.integers(0, 4, n) * 0.0005
        return lon, lat

    def test_grid_clusters_paths_agree(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.hotspots import grid_clusters

        rng = np.random.default_rng(5)
        lon, lat = self._pts(rng)
        ds = ray.data.from_arrow(_points_table(lon, lat))
        a = (
            grid_clusters(ds, res=8, min_pts=2)
            .to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True)
        )
        b = (
            grid_clusters(
                ray.data.from_arrow(_points_table(lon, lat)),
                res=8,
                min_pts=2,
                driver_limit=0,
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True)
        )
        assert len(a) > 1
        assert a.equals(b)

    def test_bfs_paths_agree(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.hotspots import grid_bfs_distance

        rng = np.random.default_rng(6)
        lon, lat = self._pts(rng)
        slon, slat = lon[:5], lat[:5]
        a = (
            grid_bfs_distance(
                ray.data.from_arrow(_points_table(lon, lat)),
                ray.data.from_arrow(_points_table(slon, slat)),
                res=8,
                max_hops=4,
            )
            .to_pandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        b = (
            grid_bfs_distance(
                ray.data.from_arrow(_points_table(lon, lat)),
                ray.data.from_arrow(_points_table(slon, slat)),
                res=8,
                max_hops=4,
                driver_limit=0,
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        assert len(a) > 0
        assert a.equals(b)

    def test_weighted_paths_agree(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.hotspots import (
            grid_weighted_distance,
        )

        rng = np.random.default_rng(7)
        lon, lat = self._pts(rng)
        slon, slat = lon[:3], lat[:3]
        a = (
            grid_weighted_distance(
                ray.data.from_arrow(_points_table(lon, lat)),
                ray.data.from_arrow(_points_table(slon, slat)),
                res=8,
                max_cost=5,
                hot_threshold=2,
            )
            .to_pandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        b = (
            grid_weighted_distance(
                ray.data.from_arrow(_points_table(lon, lat)),
                ray.data.from_arrow(_points_table(slon, slat)),
                res=8,
                max_cost=5,
                hot_threshold=2,
                driver_limit=0,
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        assert len(a) > 0
        assert a.equals(b)
