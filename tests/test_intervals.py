"""Interval×interval session-overlap join (stages/intervals.py):
brute-force differential on randomized inputs, determinism across
parallelism levels, cross-epoch attribution, and the hot-epoch cap."""

import numpy as np
import pytest

from tests.test_temporal import _events_table

GAP = 1_800_000_000


def _brute(rows, gap_us=GAP):
    from collections import defaultdict

    by_user = defaultdict(list)
    for _eid, u, ts, _et, _v in rows:
        by_user[u].append(ts)
    ses = []
    for u, tss in by_user.items():
        tss.sort()
        st = en = tss[0]
        for t in tss[1:]:
            if t - en > gap_us:
                ses.append((u, st, en))
                st = t
            en = t
        ses.append((u, st, en))
    out = {}
    for i in range(len(ses)):
        for j in range(i + 1, len(ses)):
            ua, sa, ea = ses[i]
            ub, sb, eb = ses[j]
            if ua == ub:
                continue
            ov = min(ea, eb) - max(sa, sb)
            if ov > 0:
                k = (min(ua, ub), max(ua, ub))
                n, tot = out.get(k, (0, 0))
                out[k] = (n + 1, tot + ov)
    return out


def _rand_rows(seed, n=300, users=8, span_us=40_000_000_000):
    rng = np.random.RandomState(seed)
    return [
        (i, int(rng.randint(1, users + 1)), int(rng.randint(0, span_us)), "v", 0.0)
        for i in range(n)
    ]


class TestSessionOverlap:
    @pytest.mark.parametrize("seed", [3, 17, 42])
    def test_matches_bruteforce(self, ray_session, seed):
        import ray.data

        from osm_export_tool_python_ray.stages.intervals import session_overlap_join

        rows = _rand_rows(seed)
        out = session_overlap_join(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        got = {
            (r["user_a"], r["user_b"]): (r["n_overlaps"], r["overlap_us"])
            for r in out
        }
        assert got == _brute(rows)

    def test_parallelism_invariant(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.intervals import session_overlap_join

        rows = _rand_rows(9)
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = session_overlap_join(
                ray.data.from_arrow(_events_table(rows)),
                num_buckets=nb,
                num_partitions=npart,
            ).take_all()
            outs.append(
                sorted(
                    (r["user_a"], r["user_b"], r["n_overlaps"], r["overlap_us"])
                    for r in res
                )
            )
        assert outs[0] == outs[1]

    def test_cross_epoch_overlap_counted_once(self, ray_session):
        """Two long sessions spanning many epochs overlap for several
        epochs' worth of time — counted as ONE overlap with the full
        duration (attribution to the overlap-start epoch, no dedup)."""
        import ray.data

        from osm_export_tool_python_ray.stages.intervals import session_overlap_join

        E = 1_000_000  # tiny epoch to force heavy spanning
        # user 1 active [0, 10 Mµs] (events every 0.5 Mµs — one session);
        # user 2 active [3 M, 8 Mµs]
        rows = [(i, 1, i * 500_000, "v", 0.0) for i in range(21)]
        rows += [(100 + i, 2, 3_000_000 + i * 500_000, "v", 0.0) for i in range(11)]
        out = session_overlap_join(
            ray.data.from_arrow(_events_table(rows)),
            epoch_us=E,
            num_buckets=4,
            num_partitions=2,
        ).take_all()
        assert len(out) == 1
        r = out[0]
        assert (r["user_a"], r["user_b"]) == (1, 2)
        assert r["n_overlaps"] == 1
        assert r["overlap_us"] == 5_000_000  # [3 M, 8 M]

    def test_touching_sessions_not_counted(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.intervals import session_overlap_join

        # user 1 session [0, 100]; user 2 session [100, 200] — zero overlap
        rows = [
            (1, 1, 0, "v", 0.0),
            (2, 1, 100, "v", 0.0),
            (3, 2, 100, "v", 0.0),
            (4, 2, 200, "v", 0.0),
        ]
        out = session_overlap_join(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=2,
            num_partitions=1,
        ).take_all()
        assert out == []

    def test_epoch_cap_truncates_and_counts(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.intervals import session_overlap_join
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        # 10 users all active in one epoch
        rows = [(u * 10 + i, u, 1000 * i, "v", 0.0) for u in range(1, 11) for i in range(2)]
        snapshot_caps()
        out = session_overlap_join(
            ray.data.from_arrow(_events_table(rows)),
            num_buckets=2,
            num_partitions=1,
            epoch_cap=3,
        ).take_all()
        caps = snapshot_caps()
        assert caps.get("interval_epoch_truncated", 0) > 0
        full = _brute(rows)
        assert sum(r["n_overlaps"] for r in out) <= sum(n for n, _ in full.values())

    def test_cap_not_hit_at_oracle_scale(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.pipelines.queries import QUERIES
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        snapshot_caps()
        QUERIES["session_overlap"]("/root/testdata/sf0.001").materialize()
        assert snapshot_caps().get("interval_epoch_truncated", 0) == 0


class TestIntervalCoverage:
    """Per-user interval-union sweep (stages/intervals.py
    interval_coverage): brute-force differential, half-open touching
    semantics, zero-length drop, parallelism invariance."""

    @staticmethod
    def _brute(rows, dur_scale_us=1_000):
        from collections import defaultdict

        iv = defaultdict(list)
        for _eid, u, ts, _et, v in rows:
            dur = int(np.floor(v * 1e4 + 0.5)) * dur_scale_us
            if dur > 0:
                iv[u].append((ts, ts + dur))
        out = {}
        for u, lst in iv.items():
            lst.sort()
            covered = 0
            blocks = 0
            cur_s = cur_e = None
            for s, e in lst:
                if cur_e is None or s >= cur_e:
                    if cur_e is not None:
                        covered += cur_e - cur_s
                    blocks += 1
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            if cur_e is not None:
                covered += cur_e - cur_s
            out[u] = (covered, blocks, len(lst))
        return out

    @staticmethod
    def _run(rows, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.intervals import interval_coverage

        res = interval_coverage(
            ray.data.from_arrow(_events_table(rows)), **kw
        ).take_all()
        return {
            r["user_id"]: (r["covered_us"], r["n_blocks"], r["n_intervals"])
            for r in res
        }

    @pytest.mark.parametrize("seed", [5, 23, 77])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        rows = [
            (
                i,
                int(rng.randint(1, 9)),
                int(rng.randint(0, 4_000_000_000)),
                "v",
                float(np.round(rng.uniform(0, 200), 2)),
            )
            for i in range(500)
        ]
        assert self._run(rows, num_buckets=4, num_partitions=2) == self._brute(rows)

    def test_touching_intervals_do_not_merge(self, ray_session):
        # value 1.0 → dur floor(1e4+0.5)·1000 = 10_000_000 µs;
        # [0, 10M) + [10M, 20M) = two blocks (half-open, no merge);
        # a genuine overlap merges into one block
        D = 10_000_000
        rows = [
            (0, 1, 0, "v", 1.0),
            (1, 1, D, "v", 1.0),
            (2, 2, 0, "v", 1.0),
            (3, 2, D // 2, "v", 1.0),
            (4, 3, 0, "v", 0.0),  # zero-length: dropped entirely
        ]
        got = self._run(rows, num_buckets=2, num_partitions=1)
        assert got[1] == (2 * D, 2, 2)
        assert got[2] == (D + D // 2, 1, 2)
        assert 3 not in got

    def test_nested_and_identical_intervals(self, ray_session):
        # identical intervals and one fully nested → one block, outer len
        rows = [
            (0, 1, 0, "v", 10.0),      # [0, 100_000_000)
            (1, 1, 0, "v", 10.0),      # duplicate
            (2, 1, 2_000, "v", 1.0),   # [2000, 10_002_000) nested
        ]
        got = self._run(rows, num_buckets=2, num_partitions=1)
        assert got[1] == (100_000_000, 1, 3)

    def test_parallelism_invariant(self, ray_session):
        rng = np.random.RandomState(91)
        rows = [
            (
                i,
                int(rng.randint(1, 13)),
                int(rng.randint(0, 2_000_000_000)),
                "v",
                float(np.round(rng.uniform(0, 150), 2)),
            )
            for i in range(400)
        ]
        a = self._run(rows, num_buckets=2, num_partitions=1)
        b = self._run(rows, num_buckets=16, num_partitions=8)
        assert a == b


class TestRectUnionArea:
    """Measure-of-union over axis-aligned rectangles (stages/intervals.py
    rect_union_area): rasterized brute-force differential, degenerate
    drop, width cap accounting, parallelism invariance."""

    @staticmethod
    def _rects_table(recs):
        import pyarrow as pa

        x0, x1, y0, y1 = (list(c) for c in zip(*recs)) if recs else ([], [], [], [])
        return pa.table(
            {
                "x0": pa.array(x0, type=pa.int64()),
                "x1": pa.array(x1, type=pa.int64()),
                "y0": pa.array(y0, type=pa.int64()),
                "y1": pa.array(y1, type=pa.int64()),
            }
        )

    @staticmethod
    def _brute(recs, band):
        grid_w = max((r[1] for r in recs), default=1)
        grid_h = max((r[3] for r in recs), default=1)
        cov = np.zeros((grid_w, grid_h), dtype=bool)
        for a, b, c, d in recs:
            if b > a and d > c:
                cov[a:b, c:d] = True
        col = cov.sum(axis=1)
        out = {}
        for x in range(grid_w):
            if col[x]:
                out[x // band] = out.get(x // band, 0) + int(col[x])
        return out

    def _run(self, recs, band, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.intervals import rect_union_area

        res = rect_union_area(
            ray.data.from_arrow(self._rects_table(recs)), band=band, **kw
        ).take_all()
        return {r["band"]: r["union_area"] for r in res}

    @pytest.mark.parametrize("seed", [2, 11, 59])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        recs = []
        for _ in range(250):
            a = int(rng.randint(0, 180))
            c = int(rng.randint(0, 120))
            recs.append(
                (a, a + int(rng.randint(0, 25)), c, c + int(rng.randint(0, 20)))
            )
        assert self._run(recs, band=32, num_buckets=4, num_partitions=2) == \
            self._brute(recs, band=32)

    def test_degenerate_rects_dropped(self, ray_session):
        # zero-width / zero-height boxes contribute nothing
        recs = [(5, 5, 0, 10), (0, 10, 7, 7), (0, 2, 0, 3)]
        assert self._run(recs, band=100, num_buckets=2, num_partitions=1) == {0: 6}

    def test_width_cap_truncates_and_counts(self, ray_session):
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        recs = [(0, 100, 0, 1)]
        snapshot_caps()
        got = self._run(
            recs, band=100, num_buckets=2, num_partitions=1, max_width=10
        )
        caps = snapshot_caps()
        assert caps.get("rect_width_truncated", 0) == 90
        assert got == {0: 10}

    def test_parallelism_invariant(self, ray_session):
        rng = np.random.RandomState(7)
        recs = []
        for _ in range(300):
            a = int(rng.randint(0, 400))
            c = int(rng.randint(0, 200))
            recs.append(
                (a, a + int(rng.randint(1, 40)), c, c + int(rng.randint(1, 30)))
            )
        one = self._run(recs, band=64, num_buckets=2, num_partitions=1)
        many = self._run(recs, band=64, num_buckets=16, num_partitions=8)
        assert one == many
