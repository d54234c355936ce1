"""Cross-user segment-crossing join (stages/crossings.py): brute-force
differential on randomized inputs, determinism across parallelism levels,
the teleport filter, and the cell cap."""

import numpy as np
import pytest

from tests.test_temporal import _events_table


def _brute(rows, max_step=15, grid=100):
    """O(S²) reference: per-user (ts, event_id)-ordered segments, strict
    proper-crossing predicate, count per unordered user pair."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, u, ts, _et, _v in rows:
        by_user[u].append((ts, eid))
    segs = []
    for u, pts in by_user.items():
        pts.sort()
        xy = [(eid % grid, (eid // 7) % grid) for _ts, eid in pts]
        for (ax, ay), (bx, by) in zip(xy, xy[1:]):
            if (ax, ay) == (bx, by):
                continue
            if abs(bx - ax) > max_step or abs(by - ay) > max_step:
                continue
            segs.append((u, ax, ay, bx, by))
    out = defaultdict(int)
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            (ua, ax, ay, bx, by) = segs[i]
            (ub, cx, cy, dx, dy) = segs[j]
            if ua == ub:
                continue
            ux, uy = bx - ax, by - ay
            d1 = ux * (cy - ay) - uy * (cx - ax)
            d2 = ux * (dy - ay) - uy * (dx - ax)
            vx, vy = dx - cx, dy - cy
            d3 = vx * (ay - cy) - vy * (ax - cx)
            d4 = vx * (by - cy) - vy * (bx - cx)
            if d1 * d2 < 0 and d3 * d4 < 0:
                out[(min(ua, ub), max(ua, ub))] += 1
    return dict(out)


def _rand_rows(seed, n=400, users=10, eid_range=3000):
    rng = np.random.RandomState(seed)
    # distinct event_ids so (ts, event_id) ordering is unambiguous
    eids = rng.choice(eid_range, size=n, replace=False)
    return [
        (int(e), int(rng.randint(1, users + 1)), int(rng.randint(0, 10_000)),
         "view", 0.0)
        for e in eids
    ]


class TestSegmentCrossings:
    @pytest.mark.parametrize("seed", [7, 21, 99])
    def test_matches_bruteforce(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.crossings import segment_crossings

        rows = _rand_rows(seed)
        out = segment_crossings(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = {(r["user_a"], r["user_b"]): r["n_cross"] for r in out}
        assert got == _brute(rows)

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.crossings import segment_crossings

        rows = _rand_rows(5)
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = segment_crossings(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb,
                num_partitions=npart,
            ).take_all()
            outs.append(sorted((r["user_a"], r["user_b"], r["n_cross"]) for r in res))
        assert outs[0] == outs[1]

    def test_teleport_and_degenerate_segments_dropped(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.crossings import segment_crossings

        # user 1 walks a long diagonal (teleport: |dx| > max_step) that
        # would cross user 2's short segment if kept; user 3 stands still
        # (degenerate). event_id → (x, y) = (eid % 100, (eid // 7) % 100).
        rows = [
            (0, 1, 0, "v", 0.0),     # (0, 0)
            (350, 1, 1, "v", 0.0),   # (50, 50): step 50 → teleport, dropped
            (212, 2, 0, "v", 0.0),   # (12, 30)
            (240, 2, 1, "v", 0.0),   # (40, 34): step ≤ 15? dx=28 → teleport too
            (7, 3, 0, "v", 0.0),     # (7, 1)
            (7, 3, 1, "v", 0.0),     # duplicate position → degenerate
        ]
        out = segment_crossings(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        assert out == []

    def test_cell_cap_truncates_and_counts(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.crossings import segment_crossings
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        rows = _rand_rows(11)
        snapshot_caps()
        out = segment_crossings(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=2,
            num_partitions=1,
            cell_seg_cap=3,
        ).take_all()
        caps = snapshot_caps()
        assert caps.get("crossing_cell_truncated", 0) > 0
        # truncated run must still produce a valid (possibly smaller) result
        full = _brute(rows)
        got = {(r["user_a"], r["user_b"]): r["n_cross"] for r in out}
        assert sum(got.values()) <= sum(full.values())

    def test_cap_not_hit_at_oracle_scale(self, ray_session):
        """The driver-gate scales must run uncapped (oracle equality
        depends on it) — mirror of the encounters cap assertion."""
        import ray.data

        from osm_export_tool_python_ray.pipelines.queries import QUERIES
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        snapshot_caps()
        QUERIES["segment_crossings"]("/root/testdata/sf0.001").materialize()
        assert snapshot_caps().get("crossing_cell_truncated", 0) == 0


class TestCompactCover:
    """Quadtree compact cover (stages/journey.py compact_cover)."""

    @staticmethod
    def _brute(eids, top=6):
        side = 1 << top
        cells = {((e * 48271) % 65537 % (side * side)) for e in eids}
        S = {top: {(c % side, c // side) for c in cells}}
        for k in range(top - 1, -1, -1):
            from collections import Counter

            cnt = Counter((x // 2, y // 2) for x, y in S[k + 1])
            S[k] = {c for c, n in cnt.items() if n == 4}
        out = set()
        for k in range(top, 0, -1):
            for x, y in S[k]:
                if (x // 2, y // 2) not in S[k - 1]:
                    out.add((k, x, y))
        for x, y in S[0]:
            out.add((0, x, y))
        return out

    @staticmethod
    def _events(eids):
        import pyarrow as pa

        return pa.table({"event_id": pa.array(eids, type=pa.int64())})

    def test_matches_bruteforce_dense(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import compact_cover

        rng = np.random.RandomState(4)
        eids = [int(e) for e in rng.randint(0, 200_000, size=9000)]
        got = {
            (r["res"], r["cx"], r["cy"])
            for r in compact_cover(
                ray.data.from_arrow(self._events(eids))
            ).take_all()
        }
        want = self._brute(eids)
        assert got == want
        assert any(res < 6 for res, _x, _y in got)  # rollup actually fired

    def test_cover_invariants(self, ray_session):
        """No cell in the cover has an ancestor in the cover, and the
        union of cover cells equals exactly the occupied leaf set."""
        import ray.data

        from osm_export_tool_python_ray.stages.journey import compact_cover

        rng = np.random.RandomState(8)
        eids = [int(e) for e in rng.randint(0, 100_000, size=6000)]
        cover = {
            (r["res"], r["cx"], r["cy"])
            for r in compact_cover(
                ray.data.from_arrow(self._events(eids))
            ).take_all()
        }
        index = set(cover)
        for res, x, y in cover:
            r, cx, cy = res, x, y
            while r > 0:
                r, cx, cy = r - 1, cx // 2, cy // 2
                assert (r, cx, cy) not in index
        leaves = set()
        for res, x, y in cover:
            f = 1 << (6 - res)
            for dx in range(f):
                for dy in range(f):
                    leaves.add((x * f + dx, y * f + dy))
        side = 64
        occupied = {
            ((e * 48271) % 65537 % (side * side)) for e in eids
        }
        assert leaves == {(c % side, c // side) for c in occupied}

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import compact_cover

        rng = np.random.RandomState(12)
        eids = [int(e) for e in rng.randint(0, 60_000, size=5000)]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = compact_cover(
                ray.data.from_arrow(self._events(eids)),
                num_buckets=nb,
                num_partitions=npart,
            ).take_all()
            outs.append(sorted((r["res"], r["cx"], r["cy"]) for r in res))
        assert outs[0] == outs[1]

    def test_sparse_input_all_leaves(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import compact_cover

        out = compact_cover(
            ray.data.from_arrow(self._events([1, 2, 3]))
        ).take_all()
        assert len(out) == 3 and all(r["res"] == 6 for r in out)


class TestGeofenceDwell:
    """Geofence enter/exit state machine (stages/journey.py geofence_dwell)."""

    POLY = [(10, 50), (35, 10), (75, 15), (90, 55), (60, 90), (25, 85)]

    @classmethod
    def _brute(cls, rows):
        from collections import defaultdict

        from osm_export_tool_python_ray.stages.journey import points_in_polygon

        by_user = defaultdict(list)
        for eid, u, ts, _et, _v in rows:
            by_user[u].append((ts, eid))
        out = {}
        for u, evs in by_user.items():
            evs.sort()
            flags = [
                bool(points_in_polygon([e % 100], [(e // 7) % 100], cls.POLY)[0])
                for _t, e in evs
            ]
            n_ep = n_in = dwell = 0
            i = 0
            while i < len(evs):
                if flags[i]:
                    j = i
                    while j + 1 < len(evs) and flags[j + 1]:
                        j += 1
                    n_ep += 1
                    n_in += j - i + 1
                    dwell += evs[j][0] - evs[i][0]
                    i = j + 1
                else:
                    i += 1
            if n_ep:
                out[u] = (n_ep, n_in, dwell)
        return out

    @pytest.mark.parametrize("seed", [2, 31])
    def test_matches_bruteforce(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import geofence_dwell

        rows = _rand_rows(seed, n=500, users=8, eid_range=5000)
        out = geofence_dwell(
            ray.data.from_arrow(_events_table(rows)),
            self.POLY,
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = {
            r["user_id"]: (r["n_episodes"], r["n_inside"], r["dwell_us"])
            for r in out
        }
        assert got == self._brute(rows)

    def test_episode_boundaries(self, ray_session):
        """in-out-in = two episodes; dwell sums only within episodes."""
        import ray.data

        from osm_export_tool_python_ray.stages.journey import geofence_dwell

        # (50,50) inside the hexagon; (0,0) far outside. eid 350 → (50, 50);
        # eid 0 → (0, 0)
        rows = [
            (350, 1, 0, "v", 0.0),     # inside (episode 1 start)
            (351, 1, 100, "v", 0.0),   # (51,50) inside → episode 1, dwell 100
            (0, 1, 200, "v", 0.0),     # outside — episode 1 ends
            (357, 1, 300, "v", 0.0),   # (57,51) inside → episode 2, dwell 0
        ]
        out = geofence_dwell(
            ray.data.from_arrow(_events_table(rows)),
            self.POLY,
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        assert len(out) == 1
        r = out[0]
        assert (r["n_episodes"], r["n_inside"], r["dwell_us"]) == (2, 3, 100)

    def test_all_outside_emits_nothing(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import geofence_dwell

        rows = [(0, 1, 0, "v", 0.0), (1, 1, 10, "v", 0.0)]
        out = geofence_dwell(
            ray.data.from_arrow(_events_table(rows)),
            self.POLY,
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        assert out == []


class TestCusumBursts:
    """CUSUM burst detection (stages/changepoint.py)."""

    @staticmethod
    def _brute(rows, h_mult=3):
        """Literal CUSUM recursion S_t = max(0, S_{t-1} + x_t - k) over the
        dense hour axis — the sequential definition the closed form must
        reproduce."""
        from collections import Counter, defaultdict

        HOUR = 3_600_000_000
        per_type = defaultdict(Counter)
        for _eid, _u, ts, et, _v in rows:
            per_type[et][ts // HOUR] += 1
        out = {}
        for et, cnt in per_type.items():
            h0, h1 = min(cnt), max(cnt)
            span = h1 - h0 + 1
            total = sum(cnt.values())
            k = -(-total // span)
            s = 0
            alarms = []
            for h in range(h0, h1 + 1):
                s = max(0, s + cnt.get(h, 0) - k)
                if s > h_mult * k:
                    alarms.append((h, s))
            out[et] = (
                len(alarms),
                alarms[0][0] if alarms else -1,
                max(a[1] for a in alarms) if alarms else 0,
            )
        return out

    @pytest.mark.parametrize("seed", [6, 44])
    def test_matches_sequential_recursion(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.changepoint import cusum_bursts

        rng = np.random.RandomState(seed)
        HOUR = 3_600_000_000
        rows = []
        i = 0
        for _ in range(600):
            # bursty stream: occasional 20-event spikes in one hour
            h = int(rng.randint(0, 200))
            reps = 20 if rng.rand() < 0.05 else 1
            for _r in range(reps):
                rows.append(
                    (i, 1, h * HOUR + int(rng.randint(0, HOUR)),
                     "abc"[int(rng.randint(3))], 0.0)
                )
                i += 1
        out = cusum_bursts(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = {
            r["event_type"]: (r["n_alarms"], r["first_hr"], r["s_max"])
            for r in out
        }
        assert got == self._brute(rows)

    def test_uniform_stream_never_alarms(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.changepoint import cusum_bursts

        HOUR = 3_600_000_000
        rows = [(i, 1, (i % 100) * HOUR, "x", 0.0) for i in range(400)]
        out = cusum_bursts(
            ray.data.from_arrow(_events_table(rows)), num_buckets=2, num_partitions=1
        ).take_all()
        assert len(out) == 1
        assert out[0]["n_alarms"] == 0 and out[0]["first_hr"] == -1

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.changepoint import cusum_bursts

        rng = np.random.RandomState(3)
        HOUR = 3_600_000_000
        rows = [
            (i, 1, int(rng.randint(0, 100)) * HOUR, "pq"[i % 2], 0.0)
            for i in range(500)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = cusum_bursts(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb,
                num_partitions=npart,
            ).take_all()
            outs.append(
                sorted(
                    (r["event_type"], r["n_alarms"], r["first_hr"], r["s_max"])
                    for r in res
                )
            )
        assert outs[0] == outs[1]


class TestReciprocalPartners:
    """Mutual top-partner matching (stages/journey.py reciprocal_partners)."""

    @staticmethod
    def _brute(rows, cell_div=10, bucket_us=2_000):
        from collections import defaultdict

        groups = defaultdict(set)
        for eid, u, ts, _et, _v in rows:
            cx = (eid % 100) // cell_div
            cy = ((eid // 7) % 100) // cell_div
            groups[(cx, cy, ts // bucket_us)].add(u)
        w = defaultdict(int)
        for users in groups.values():
            us = sorted(users)
            for i in range(len(us)):
                for j in range(i + 1, len(us)):
                    w[(us[i], us[j])] += 1
        best = {}
        for (a, b), n in w.items():
            for u, p in ((a, b), (b, a)):
                cur = best.get(u)
                if cur is None or (n, -p) > (cur[1], -cur[0]):
                    best[u] = (p, n)
        out = {}
        for u, (p, n) in best.items():
            if best.get(p, (None,))[0] == u and u < p:
                out[(u, p)] = n
        return out

    @pytest.mark.parametrize("seed", [13, 77])
    def test_matches_bruteforce(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import reciprocal_partners

        rng = np.random.RandomState(seed)
        rows = [
            (int(rng.randint(0, 400)), int(rng.randint(1, 12)),
             int(rng.randint(0, 10_000)), "view", 0.0)
            for _ in range(400)
        ]
        out = reciprocal_partners(
            ray.data.from_arrow(_events_table(rows)),
            bucket_us=2_000,
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = {(r["user_a"], r["user_b"]): r["n_shared"] for r in out}
        assert got == self._brute(rows)

    def test_mutuality_required(self, ray_session):
        """A one-sided top choice is dropped: u1's top is u2, but u2's
        top is u3 (stronger tie), and u3 reciprocates u2."""
        import ray.data

        from osm_export_tool_python_ray.stages.journey import reciprocal_partners

        # same cell for all (eid 0), distinct hour buckets
        rows = []
        # u1-u2 share 1 bucket; u2-u3 share 2 buckets
        rows += [(0, 1, 0, "v", 0.0), (0, 2, 0, "v", 0.0)]
        rows += [(0, 2, 2_000, "v", 0.0), (0, 3, 2_000, "v", 0.0)]
        rows += [(0, 2, 4_000, "v", 0.0), (0, 3, 4_000, "v", 0.0)]
        out = reciprocal_partners(
            ray.data.from_arrow(_events_table(rows)),
            bucket_us=2_000,
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        got = {(r["user_a"], r["user_b"]): r["n_shared"] for r in out}
        # NOTE: u1 and u2 also co-occur in bucket 0 — w(1,2)=1, w(2,3)=2
        assert got == {(2, 3): 2}

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import reciprocal_partners

        rng = np.random.RandomState(23)
        rows = [
            (int(rng.randint(0, 300)), int(rng.randint(1, 10)),
             int(rng.randint(0, 8_000)), "view", 0.0)
            for _ in range(300)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = reciprocal_partners(
                ray.data.from_arrow(_events_table(rows)),
                bucket_us=2_000,
                num_buckets=nb,
                num_partitions=npart,
            ).take_all()
            outs.append(
                sorted((r["user_a"], r["user_b"], r["n_shared"]) for r in res)
            )
        assert outs[0] == outs[1]


class TestCellTrends:
    """Grouped exact least squares (stages/analytics.py cell_trends)."""

    @staticmethod
    def _brute(rows, cell_div=10, bucket_us=3_600_000_000):
        from collections import Counter, defaultdict

        hc = defaultdict(Counter)
        for eid, _u, ts, _et, _v in rows:
            cx = (eid % 100) // cell_div
            cy = ((eid // 7) % 100) // cell_div
            hc[cx * 10 + cy][ts // bucket_us] += 1
        out = {}
        for ck, cnt in hc.items():
            h0 = min(cnt)
            xs = sorted(cnt)
            n = len(xs)
            sx = sum(h - h0 for h in xs)
            sy = sum(cnt.values())
            sxy = sum((h - h0) * cnt[h] for h in xs)
            sxx = sum((h - h0) ** 2 for h in xs)
            out[ck] = (n, n * sxy - sx * sy, n * sxx - sx * sx)
        return out

    @pytest.mark.parametrize("seed", [19, 61])
    def test_matches_bruteforce(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.analytics import cell_trends

        rng = np.random.RandomState(seed)
        HOUR = 3_600_000_000
        rows = [
            (int(rng.randint(0, 700)), 1,
             int(rng.randint(0, 50)) * HOUR + int(rng.randint(0, HOUR)),
             "v", 0.0)
            for _ in range(600)
        ]
        out = cell_trends(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = {r["ckey"]: (r["n_hours"], r["num"], r["den"]) for r in out}
        assert got == self._brute(rows)

    def test_known_slopes(self, ray_session):
        """A cell with counts 1,2,3 over consecutive hours → slope exactly
        +1 (num/den = 6/6); a single-hour cell → den 0."""
        import ray.data

        from osm_export_tool_python_ray.stages.analytics import cell_trends

        HOUR = 3_600_000_000
        rows = []
        i = 0
        # eid 0 → cell (0,0) = ckey 0; counts 1, 2, 3 in hours 0, 1, 2
        for h, c in [(0, 1), (1, 2), (2, 3)]:
            for _ in range(c):
                rows.append((0, 1, h * HOUR + i, "v", 0.0))
                i += 1
        # eid 350 → (50//10)*10 + 50//10 = 55; one hour only
        rows.append((350, 1, 0, "v", 0.0))
        out = cell_trends(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        got = {r["ckey"]: (r["n_hours"], r["num"], r["den"]) for r in out}
        assert got[0] == (3, 6, 6)      # slope 1: 3*8 - 3*6 = 6; 3*5 - 9 = 6
        assert got[55] == (1, 0, 0)     # undefined slope marker

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.analytics import cell_trends

        rng = np.random.RandomState(29)
        HOUR = 3_600_000_000
        rows = [
            (int(rng.randint(0, 500)), 1,
             int(rng.randint(0, 30)) * HOUR, "v", 0.0)
            for _ in range(400)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = cell_trends(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb,
                num_partitions=npart,
            ).take_all()
            outs.append(
                sorted((r["ckey"], r["n_hours"], r["num"], r["den"]) for r in res)
            )
        assert outs[0] == outs[1]


class TestSlidingDistinct:
    """Sliding COUNT DISTINCT (stages/temporal.py sliding_distinct_users)."""

    @staticmethod
    def _brute(rows, W=3, bucket_us=3_600_000_000):
        from collections import defaultdict

        pres = defaultdict(set)  # (type, hour) -> users
        for _eid, u, ts, et, _v in rows:
            pres[(et, ts // bucket_us)].add(u)
        hours = defaultdict(set)
        for (et, h), users in pres.items():
            for o in range(W):
                hours[(et, h + o)].update(users)
        return {(et, h): len(us) for (et, h), us in hours.items()}

    @pytest.mark.parametrize("seed", [14, 53])
    def test_matches_bruteforce(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.temporal import sliding_distinct_users

        rng = np.random.RandomState(seed)
        HOUR = 3_600_000_000
        rows = [
            (i, int(rng.randint(1, 15)),
             int(rng.randint(0, 40)) * HOUR + int(rng.randint(0, HOUR)),
             "xyz"[int(rng.randint(3))], 0.0)
            for i in range(700)
        ]
        out = sliding_distinct_users(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = {(r["event_type"], r["hr"]): r["n_users"] for r in out}
        assert got == self._brute(rows)

    def test_revisiting_user_counted_once_per_window(self, ray_session):
        """A user present in hours 0 AND 1 counts ONCE in the window
        ending at hour 1/2 — the representative-presence invariant."""
        import ray.data

        from osm_export_tool_python_ray.stages.temporal import sliding_distinct_users

        HOUR = 3_600_000_000
        rows = [
            (1, 7, 0, "a", 0.0),
            (2, 7, HOUR, "a", 0.0),        # same user, next hour
            (3, 9, HOUR, "a", 0.0),        # second user in hour 1
        ]
        out = sliding_distinct_users(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        got = {r["hr"]: r["n_users"] for r in out}
        # windows: h0 {7}=1; h1 {7,9}=2; h2 {7,9}=2 (trailing); h3 {7,9}=2
        assert got == {0: 1, 1: 2, 2: 2, 3: 2}

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.temporal import sliding_distinct_users

        rng = np.random.RandomState(41)
        HOUR = 3_600_000_000
        rows = [
            (i, int(rng.randint(1, 10)), int(rng.randint(0, 25)) * HOUR,
             "pq"[i % 2], 0.0)
            for i in range(400)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = sliding_distinct_users(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb,
                num_partitions=npart,
            ).take_all()
            outs.append(
                sorted((r["event_type"], r["hr"], r["n_users"]) for r in res)
            )
        assert outs[0] == outs[1]


class TestTagCooccurrence:
    """Export-surface tag-key co-occurrence (q_tag_cooccurrence)."""

    def test_matches_json_bruteforce(self, ray_session):
        """Pure-python JSON parse of the corpus spans → per-element key
        pairs → top-20; must equal the engine's combiner+groupby+sort."""
        import json
        from collections import Counter

        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import (
            QUERIES,
            corpus_path,
        )

        tbl = pq.read_table(corpus_path(n_shards=4))
        seen = {}
        for spans in tbl.column("spans").to_pylist():
            for s in spans:
                if s["kind"] != "osm":
                    continue
                try:
                    o = json.loads(s["text"])
                except ValueError:
                    continue
                seen[(o["type"], o["id"])] = sorted((o.get("tags") or {}))
        cnt = Counter()
        for ks in seen.values():
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    cnt[(ks[i], ks[j])] += 1
        want = sorted(
            ((n, k1, k2) for (k1, k2), n in cnt.items()),
            key=lambda t: (-t[0], t[1], t[2]),
        )[:20]
        got = [
            (r["n"], r["k1"], r["k2"])
            for r in QUERIES["tag_cooccurrence"](None).take_all()
        ]
        assert got == want


class TestSessionBigrams:
    """Order-1 sequence mining (stages/journey.py session_bigrams)."""

    @staticmethod
    def _brute(rows, gap_us=1_800_000_000, k=15):
        from collections import Counter, defaultdict

        by_user = defaultdict(list)
        for eid, u, ts, et, _v in rows:
            by_user[u].append((ts, eid, et))
        cnt = Counter()
        for u, evs in by_user.items():
            evs.sort()
            for (t1, _e1, a), (t2, _e2, b) in zip(evs, evs[1:]):
                if t2 - t1 <= gap_us:
                    cnt[(a, b)] += 1
        return sorted(
            ((n, a, b) for (a, b), n in cnt.items()),
            key=lambda t: (-t[0], t[1], t[2]),
        )[:k]

    @pytest.mark.parametrize("seed", [16, 58])
    def test_matches_bruteforce(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import session_bigrams

        rng = np.random.RandomState(seed)
        rows = [
            (i, int(rng.randint(1, 10)), int(rng.randint(0, 10_000)),
             "abcd"[int(rng.randint(4))], 0.0)
            for i in range(600)
        ]
        out = session_bigrams(
            ray.data.from_arrow(_events_table(rows)),
            gap_us=3_000,
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = [(r["n"], r["a"], r["b"]) for r in out]
        assert got == self._brute(rows, gap_us=3_000)

    def test_gap_breaks_sequence(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.journey import session_bigrams

        rows = [
            (1, 1, 0, "a", 0.0),
            (2, 1, 100, "b", 0.0),           # a→b (within gap)
            (3, 1, 10_000_000_000, "c", 0.0),  # new session: b→c NOT counted
            (4, 1, 10_000_000_100, "d", 0.0),  # c→d counted
        ]
        out = session_bigrams(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        got = sorted((r["a"], r["b"], r["n"]) for r in out)
        assert got == [("a", "b", 1), ("c", "d", 1)]


class TestAttributionWindow:
    """Forward attribution join (stages/temporal.py attribution_window)."""

    @staticmethod
    def _brute(rows, W=3_600_000_000):
        from collections import defaultdict

        by_user = defaultdict(lambda: {"c": [], "p": []})
        for _eid, u, ts, et, _v in rows:
            if et == "click":
                by_user[u]["c"].append(ts)
            elif et == "purchase":
                by_user[u]["p"].append(ts)
        out = defaultdict(lambda: [0, 0])
        for u, d in by_user.items():
            for t in d["c"]:
                hr = t // 3_600_000_000
                out[hr][0] += 1
                if any(t < p <= t + W for p in d["p"]):
                    out[hr][1] += 1
        return {h: tuple(v) for h, v in out.items()}

    @pytest.mark.parametrize("seed", [9, 33])
    def test_matches_bruteforce(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.temporal import attribution_window

        rng = np.random.RandomState(seed)
        HOUR = 3_600_000_000
        rows = [
            (i, int(rng.randint(1, 10)), int(rng.randint(0, 10 * HOUR)),
             ["click", "purchase", "view"][int(rng.randint(3))], 0.0)
            for i in range(600)
        ]
        out = attribution_window(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = {r["hr"]: (r["n_clicks"], r["n_converted"]) for r in out}
        assert got == self._brute(rows)

    def test_same_microsecond_and_window_edge(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.temporal import attribution_window

        W = 3_600_000_000
        rows = [
            (1, 1, 1000, "click", 0.0),
            (2, 1, 1000, "purchase", 0.0),        # same µs → NOT a conversion
            (3, 2, 0, "click", 0.0),
            (4, 2, W, "purchase", 0.0),           # exactly t+W → converts
            (5, 3, 0, "click", 0.0),
            (6, 3, W + 1, "purchase", 0.0),       # t+W+1 → does not convert
            (7, 4, 0, "click", 0.0),
            (8, 4, 50, "purchase", 0.0),          # later purchase in window
            (9, 4, 20, "purchase", 0.0),
        ]
        out = attribution_window(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        assert len(out) == 1
        r = out[0]
        assert (r["hr"], r["n_clicks"], r["n_converted"]) == (0, 4, 2)


class TestActivityHistogram:
    def test_log2_bins_exact(self, ray_session):
        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        out = {
            r["bin"]: (r["n_users"], r["total_events"])
            for r in QUERIES["activity_histogram"]("/root/testdata/sf0.001").take_all()
        }
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM"
            " read_parquet('/root/testdata/sf0.001/events.parquet')"
        )
        from collections import Counter

        users = Counter(
            con.execute("SELECT user_id FROM events").df()["user_id"]
        )
        want = {}
        for _u, n in users.items():
            b = n.bit_length() - 1
            nu, te = want.get(b, (0, 0))
            want[b] = (nu + 1, te + n)
        assert out == want


class TestNeardupDegree:
    def test_degree_distribution_matches_pairs(self, ray_session):
        """Engine degree histogram == histogram computed from the engine's
        own near-dup pair list (internal consistency), and total degree
        mass == 2 × pair count."""
        from collections import Counter

        from osm_export_tool_python_ray.pipelines.queries import (
            QUERIES,
            q_embedding_near_dup,
        )
        from osm_export_tool_python_ray.stages.ann import embedding_near_dup
        from osm_export_tool_python_ray.pipelines.queries import _read

        sf = "/root/testdata/sf0.001"
        pairs = embedding_near_dup(
            _read(sf, "embeddings"), threshold=0.2, num_planes=4, num_buckets=16
        ).take_all()
        deg = Counter()
        for r in pairs:
            deg[r["doc_a"]] += 1
            deg[r["doc_b"]] += 1
        want = Counter(deg.values())
        got = {
            r["degree"]: r["n_vecs"]
            for r in QUERIES["neardup_degree"](sf).take_all()
        }
        assert got == dict(want)
        assert sum(d * n for d, n in got.items()) == 2 * len(pairs)


class TestGroupMode:
    def test_mode_with_tiebreak(self, ray_session):
        """Engine mode == brute-force Counter mode with the pinned
        (count desc, type asc) tie-break, over the real sf0.001 events."""
        from collections import Counter, defaultdict

        import duckdb

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        out = {
            r["user_id"]: (r["mode_type"], r["mode_n"])
            for r in QUERIES["group_mode"]("/root/testdata/sf0.001").take_all()
        }
        con = duckdb.connect()
        df = con.execute(
            "SELECT user_id, event_type FROM"
            " read_parquet('/root/testdata/sf0.001/events.parquet')"
        ).df()
        per = defaultdict(Counter)
        for u, t in zip(df["user_id"], df["event_type"]):
            per[int(u)][t] += 1
        want = {
            u: min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            for u, c in per.items()
        }
        want = {u: (t, n) for u, (t, n) in want.items()}
        assert out == want


class TestTypeEntropy:
    def test_uniform_and_point_mass(self, ray_session, tmp_path):
        """Planted distributions: a point mass has zero entropy; a
        uniform K-type user has round(ln(K)*1e6) micro-nats exactly
        (the c=N/K terms cancel by the closed form)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        rows_u, rows_t = [], []
        # user 1: 12 events of one type -> H = 0
        rows_u += [1] * 12
        rows_t += ["a"] * 12
        # user 2: 4 types x 3 each -> H = ln 4 exactly:
        # round(ln12*1e6) - (12*round(ln3*1e6))//12 = round(ln12*1e6)-round(ln3*1e6)
        rows_u += [2] * 12
        rows_t += ["a", "b", "c", "d"] * 3
        t = pa.table(
            {
                "event_id": pa.array(range(24), type=pa.int64()),
                "ts": pa.array([0] * 24, type=pa.timestamp("us")),
                "user_id": pa.array(rows_u, type=pa.int64()),
                "event_type": pa.array(rows_t, type=pa.string()),
                "value": pa.array([0.0] * 24),
                "props": pa.array([""] * 24),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        out = {
            r["user_id"]: (r["h_micro"], r["n_events"])
            for r in QUERIES["type_entropy"](str(d)).take_all()
        }
        ln12 = int(np.round(np.log(12.0) * 1e6))
        ln3 = int(np.round(np.log(3.0) * 1e6))
        assert out[1] == (0, 12)
        assert out[2] == (ln12 - ln3, 12)


def _tiny_events_dir(tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, event_type)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        }
    )
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


class TestUserPaths:
    def test_order_cap_and_count(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        rows = []
        # user 1: 25 events, types cycle a,b,c — path = first 20 in ts order
        for i in range(25):
            rows.append((100 + i, 1_000_000 * i, 1, "abc"[i % 3]))
        # user 2: ts ties broken by event_id
        rows.append((7, 5, 2, "z"))
        rows.append((3, 5, 2, "y"))
        sf = _tiny_events_dir(tmp_path, rows)
        out = {
            r["user_id"]: (r["path"], r["n_events"])
            for r in QUERIES["user_paths"](sf).take_all()
        }
        want1 = ",".join("abc"[i % 3] for i in range(20))
        assert out[1] == (want1, 25)
        assert out[2] == ("y,z", 2)  # event_id 3 before 7 at equal ts


class TestHourPivot:
    def test_wide_counts(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        HOUR = 3_600_000_000
        rows = [
            (1, 0 * HOUR, 1, "click"),
            (2, 0 * HOUR + 5, 1, "click"),
            (3, 23 * HOUR, 2, "click"),
            (4, 1 * HOUR, 1, "view"),
            (5, 25 * HOUR, 2, "view"),  # wraps to h1
        ]
        sf = _tiny_events_dir(tmp_path, rows)
        out = {r["event_type"]: r for r in QUERIES["hour_pivot"](sf).take_all()}
        assert out["click"]["h0"] == 2
        assert out["click"]["h23"] == 1
        assert out["click"]["total"] == 3
        assert out["view"]["h1"] == 2
        assert out["view"]["total"] == 2
        assert sum(out["view"]["h%d" % h] for h in range(24)) == 2


class TestMonthlyRollup:
    def test_civil_month_boundaries(self, ray_session, tmp_path):
        """Events straddling a month boundary (incl. a leap February)
        land in their civil month; cents sums are exact."""
        import numpy as np

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        US = 1_000_000
        def ts(s):
            return int(np.datetime64(s, "us").astype(np.int64))

        rows = [
            (1, ts("2024-02-29T23:59:59"), 1, "buy"),   # leap day -> Feb
            (2, ts("2024-03-01T00:00:00"), 1, "buy"),   # -> Mar
            (3, ts("2024-02-01T00:00:00"), 2, "buy"),   # -> Feb
            (4, ts("2024-03-15T12:00:00"), 2, "view"),  # -> Mar
        ]
        sf = _tiny_events_dir(tmp_path, rows)
        # overwrite value column with known cents
        import pyarrow.parquet as pq_
        import pyarrow as pa_

        t = pq_.read_table(sf + "/events.parquet")
        vals = [1.25, 2.50, 0.75, 10.00]
        t = t.set_column(
            t.schema.get_field_index("value"), "value", pa_.array(vals)
        )
        pq_.write_table(t, sf + "/events.parquet")
        out = {
            (str(np.datetime64(r["month"], "us"))[:7], r["event_type"]):
                (r["n"], r["value_cents"])
            for r in QUERIES["monthly_rollup"](sf).take_all()
        }
        assert out[("2024-02", "buy")] == (2, 200)   # 125 + 75
        assert out[("2024-03", "buy")] == (1, 250)
        assert out[("2024-03", "view")] == (1, 1000)
