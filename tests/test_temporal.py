"""Temporal join operators (stages/temporal.py): as-of join and bounded
time-range join — planted-semantics units, seeded brute-force
differentials, and full DuckDB oracle parity at sf0.001 (the driver's
comparison)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_table(rows):
    """rows: (event_id, user_id, ts_us, event_type, value)"""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array(
                np.array([r[2] for r in rows], dtype="datetime64[us]")
            ),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
        }
    )


def _run_asof(tbl, tmp_path):
    import pyarrow.parquet as pq

    from osm_export_tool_python_ray.pipelines.queries import QUERIES

    d = tmp_path / "sf_asof"
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, str(d / "events.parquet"))
    return (
        QUERIES["asof_join"](str(d))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


class TestAsofJoin:
    def test_planted(self, ray_session, tmp_path):
        rows = [
            # user 1: purchase at t=100 and t=200; views around them
            (0, 1, 50, "view", 0.0),      # before any purchase -> null
            (1, 1, 100, "purchase", 9.5), # matches itself (<= inclusive)
            (2, 1, 150, "view", 0.0),     # -> purchase 1 (t=100)
            (3, 1, 200, "purchase", 7.25),
            (4, 1, 200, "view", 0.0),     # equal ts -> purchase 3 inclusive
            (5, 1, 999, "click", 0.0),    # -> latest purchase 3
            # user 2: no purchases at all
            (6, 2, 100, "view", 0.0),
            # user 3: two purchases at the SAME ts -> max event_id wins
            # (for BOTH purchases: the <= match at equal ts is the max-id one)
            (7, 3, 10, "purchase", 1.0),
            (8, 3, 10, "purchase", 2.0),
            (9, 3, 11, "view", 0.0),
        ]
        out = _run_asof(_events_table(rows), tmp_path)
        got = {
            int(r.event_id): (
                None if pd.isna(r.last_purchase_event_id) else int(r.last_purchase_event_id)
            )
            for r in out.itertuples()
        }
        assert got == {0: None, 1: 1, 2: 1, 3: 3, 4: 3, 5: 3, 6: None, 7: 8, 8: 8, 9: 8}
        v9 = out.loc[out.event_id == 9, "last_purchase_value"].iloc[0]
        assert v9 == 2.0

    @pytest.mark.parametrize("seed", [7, 19, 101])
    def test_bruteforce_differential(self, ray_session, tmp_path, seed):
        rng = np.random.default_rng(seed)
        n = 400
        rows = [
            (
                i,
                int(rng.integers(0, 12)),
                int(rng.integers(0, 1000)) * 1000,
                rng.choice(["view", "purchase", "click"]),
                float(np.round(rng.uniform(0, 10), 4)),
            )
            for i in range(n)
        ]
        out = _run_asof(_events_table(rows), tmp_path)
        purchases = [r for r in rows if r[3] == "purchase"]
        for r in rows:
            cands = [p for p in purchases if p[1] == r[1] and p[2] <= r[2]]
            want = max(cands, key=lambda p: (p[2], p[0]))[0] if cands else None
            got = out.loc[out.event_id == r[0], "last_purchase_event_id"].iloc[0]
            got = None if pd.isna(got) else int(got)
            assert got == want, (r, got, want)


class TestRangeJoin:
    def test_planted_epoch_boundaries(self, ray_session, tmp_path):
        """Window == epoch length, intervals straddling epoch boundaries:
        each point counted exactly once despite probe replication."""
        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        day = 86_400_000_000
        base = np.datetime64("1995-01-10", "us").astype(np.int64)
        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                # 1: aligned window; 2: straddles an epoch boundary; 3: empty
                "o_orderdate": pa.array(
                    np.array(
                        [base, base + day, base + 50 * day], dtype="datetime64[us]"
                    )
                ),
            }
        )
        ship = [base, base + day - 1, base + day, base + 2 * day, base + 3 * day]
        lineitem = pa.table(
            {
                "l_shipdate": pa.array(np.array(ship, dtype="datetime64[us]")),
                "l_quantity": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
            }
        )
        d = tmp_path / "sf_range"
        d.mkdir()
        pq.write_table(orders, str(d / "orders.parquet"))
        pq.write_table(lineitem, str(d / "lineitem.parquet"))
        out = (
            QUERIES["range_join"](str(d))
            .to_pandas()
            .set_index("o_orderkey")
            .sort_index()
        )
        # order 1: [base, base+3d) -> ships at 0, +1d-1, +1d, +2d = 1+2+4+8
        assert (out.loc[1, "n_ship"], out.loc[1, "sum_qty"]) == (4, 15.0)
        # order 2: [base+1d, base+4d) -> +1d, +2d, +3d = 4+8+16
        assert (out.loc[2, "n_ship"], out.loc[2, "sum_qty"]) == (3, 28.0)
        assert (out.loc[3, "n_ship"], out.loc[3, "sum_qty"]) == (0, 0.0)

    @pytest.mark.parametrize("seed", [11, 37, 211])
    def test_bruteforce_differential(self, ray_session, tmp_path, seed):
        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        rng = np.random.default_rng(seed)
        day = 86_400_000_000
        base = np.datetime64("1995-01-01", "us").astype(np.int64)
        od = base + rng.integers(0, 40, size=60) * (day // 2)
        ship = base + rng.integers(0, 45, size=300) * (day // 3)
        qty = np.round(rng.uniform(1, 50, size=300), 2)
        orders = pa.table(
            {
                "o_orderkey": pa.array(np.arange(60, dtype=np.int64)),
                "o_orderdate": pa.array(od.astype("datetime64[us]")),
            }
        )
        lineitem = pa.table(
            {
                "l_shipdate": pa.array(ship.astype("datetime64[us]")),
                "l_quantity": pa.array(qty),
            }
        )
        d = tmp_path / "sf_range2"
        d.mkdir()
        pq.write_table(orders, str(d / "orders.parquet"))
        pq.write_table(lineitem, str(d / "lineitem.parquet"))
        out = (
            QUERIES["range_join"](str(d))
            .to_pandas()
            .set_index("o_orderkey")
            .sort_index()
        )
        for k in range(60):
            m = (ship >= od[k]) & (ship < od[k] + 3 * day)
            assert out.loc[k, "n_ship"] == int(m.sum())
            assert abs(out.loc[k, "sum_qty"] - round(float(qty[m].sum()), 4)) < 1e-9


class TestOracleParity:
    def test_sf0001_oracles(self, ray_session):
        import duckdb

        from osm_export_tool_python_ray.pipelines.queries import ORACLES, QUERIES

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        for t in ["orders", "lineitem", "events"]:
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                % (t, sf, t)
            )
        for name in ["asof_join", "range_join"]:
            res = QUERIES[name](sf).to_pandas()
            ora = con.execute(ORACLES[name]).df()
            rc, oc = sorted(res.columns), sorted(ora.columns)
            assert rc == oc, (name, rc, oc)
            a = res[rc].sort_values(rc).reset_index(drop=True)
            b = ora[oc].sort_values(oc).reset_index(drop=True)
            assert a.shape == b.shape, (name, a.shape, b.shape)
            for c in rc:
                av, bv = a[c], b[c]
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    assert np.allclose(
                        av.astype(float).fillna(-9e9).round(6),
                        bv.astype(float).fillna(-9e9).round(6),
                    ), (name, c)
                elif av.dtype.kind == "M" or bv.dtype.kind == "M":
                    assert av.fillna(pd.Timestamp(0)).equals(
                        bv.fillna(pd.Timestamp(0))
                    ), (name, c)
                else:
                    assert av.astype(str).equals(bv.astype(str)), (name, c)


class TestSlidingWindow:
    def test_gap_hours_range_semantics(self, ray_session, tmp_path):
        """Hours 0, 1, 5: the window at hour 5 must NOT include hour 1
        (a ROWS-3 frame would) — time-RANGE semantics."""
        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        hour = 3_600_000_000
        rows = [
            (0, 1, 0 * hour, "click", 1.0),
            (1, 1, 0 * hour + 60, "click", 2.0),
            (2, 1, 1 * hour, "click", 4.0),
            (3, 1, 5 * hour, "click", 8.0),
            (4, 1, 2 * hour, "view", 16.0),
        ]
        d = tmp_path / "sf_slide"
        d.mkdir()
        pq.write_table(_events_table(rows), str(d / "events.parquet"))
        out = (
            QUERIES["events_sliding"](str(d))
            .to_pandas()
            .sort_values(["event_type", "hour_ts"])
            .reset_index(drop=True)
        )
        clicks = out[out.event_type == "click"]
        assert list(clicks["n_3h"]) == [2, 3, 1]  # h0: 2; h1: 2+1; h5: just itself
        assert list(clicks["sum_3h"]) == [3.0, 7.0, 8.0]
        views = out[out.event_type == "view"]
        assert list(views["n_3h"]) == [1] and list(views["sum_3h"]) == [16.0]

    def test_oracle_parity_multibatch(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import ORACLES, QUERIES

        rng = np.random.default_rng(13)
        hour = 3_600_000_000
        rows = [
            (
                i,
                1,
                int(rng.integers(0, 48)) * hour + int(rng.integers(0, 3600)) * 1_000_000,
                str(rng.choice(["a", "b", "c"])),
                float(np.round(rng.uniform(0, 5), 3)),
            )
            for i in range(3000)
        ]
        d = tmp_path / "sf_slide2"
        d.mkdir()
        # several row groups -> several read blocks -> duplicate partials
        t = _events_table(rows)
        pq.write_table(t, str(d / "events.parquet"), row_group_size=100)
        res = QUERIES["events_sliding"](str(d)).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet('%s/events.parquet')"
            % d
        )
        ora = con.execute(ORACLES["events_sliding"]).df()
        rc = sorted(res.columns)
        a = res[rc].sort_values(rc).reset_index(drop=True)
        b = ora[rc].sort_values(rc).reset_index(drop=True)
        assert a.shape == b.shape
        for c in rc:
            if a[c].dtype.kind == "f":
                assert np.allclose(a[c].round(6), b[c].astype(float).round(6)), c
            else:
                assert a[c].astype(str).equals(b[c].astype(str)), c

    def test_pre_1970_hours(self, ray_session, tmp_path):
        """Negative hour indices (timestamps before 1970) must not corrupt
        the packed (type, hour) key."""
        import duckdb
        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import ORACLES, QUERIES

        hour = 3_600_000_000
        rows = [
            (0, 1, -5 * hour, "a", 1.0),
            (1, 1, -4 * hour, "a", 2.0),
            (2, 1, -4 * hour, "b", 4.0),
            (3, 1, 1 * hour, "a", 8.0),
        ]
        d = tmp_path / "sf_neg"
        d.mkdir()
        pq.write_table(_events_table(rows), str(d / "events.parquet"))
        res = QUERIES["events_sliding"](str(d)).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet('%s/events.parquet')" % d
        )
        ora = con.execute(ORACLES["events_sliding"]).df()
        rc = sorted(res.columns)
        a = res[rc].sort_values(rc).reset_index(drop=True)
        b = ora[rc].sort_values(rc).reset_index(drop=True)
        assert a.shape == b.shape
        for c in rc:
            assert a[c].astype(str).equals(b[c].astype(str)), c


class TestJourney:
    """Funnel progression + trajectory stats (stages/journey.py) against
    planted sequences and a seeded brute-force differential."""

    def test_funnel_planted(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import funnel_progression

        rows = [
            # user 1: full ordered funnel
            (0, 1, 10, "signup", 0.0), (1, 1, 20, "click", 0.0), (2, 1, 30, "purchase", 0.0),
            # user 2: click BEFORE signup — stalls at stage 1
            (3, 2, 10, "click", 0.0), (4, 2, 20, "signup", 0.0), (5, 2, 30, "purchase", 0.0),
            # wait — purchase after signup but no click after signup: the
            # funnel requires signup < click < purchase; user 2 stalls at 1
            # user 3: click at the SAME microsecond as signup — tie does
            # not advance; later click does, then purchase
            (6, 3, 10, "signup", 0.0), (7, 3, 10, "click", 0.0),
            (8, 3, 15, "click", 0.0), (9, 3, 20, "purchase", 0.0),
            # user 4: never signs up
            (10, 4, 5, "click", 0.0), (11, 4, 6, "purchase", 0.0),
        ]
        out = funnel_progression(
            ray.data.from_arrow(_events_table(rows)),
            stages=["signup", "click", "purchase"],
            num_buckets=4, num_partitions=2,
        ).take_all()
        got = {r["stage"]: r["users"] for r in out}
        assert got == {1: 3, 2: 2, 3: 2}

    def test_funnel_matches_brute_force(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import funnel_progression

        rng = np.random.RandomState(17)
        types = ["signup", "click", "purchase", "view"]
        rows = [
            (i, int(rng.randint(1, 25)), int(rng.randint(0, 50)),
             types[rng.randint(0, 4)], 0.0)
            for i in range(400)
        ]
        stages = ["signup", "click", "purchase"]

        def brute():
            from collections import defaultdict
            by_user = defaultdict(list)
            for _, u, ts, et, _v in rows:
                by_user[u].append((ts, et))
            counts = [0, 0, 0]
            for evs in by_user.values():
                evs.sort()
                reach = -1
                for k, s in enumerate(stages):
                    nxt = [t for t, e in evs if e == s and t > reach]
                    if not nxt:
                        break
                    reach = min(nxt)
                    counts[k] += 1
            return {i + 1: c for i, c in enumerate(counts)}

        out = funnel_progression(
            ray.data.from_arrow(_events_table(rows)), stages=stages,
            num_buckets=8, num_partitions=4,
        ).take_all()
        assert {r["stage"]: r["users"] for r in out} == brute()

    def test_trajectory_matches_brute_force(self, ray_session):
        import math
        import ray.data
        from osm_export_tool_python_ray.stages.journey import trajectory_stats

        rng = np.random.RandomState(23)
        rows = [
            (i, int(rng.randint(1, 12)), int(rng.randint(0, 1000)), "view", 0.0)
            for i in range(300)
        ]
        out = trajectory_stats(
            ray.data.from_arrow(_events_table(rows)), num_buckets=4, num_partitions=2
        ).take_all()
        got = {r["user_id"]: (r["n_events"], r["path_micro"], r["net_micro"]) for r in out}

        from collections import defaultdict
        by_user = defaultdict(list)
        for eid, u, ts, _et, _v in rows:
            lon = (eid % 100) * 0.01
            lat = (math.floor(eid / 7.0) % 100) * 0.01
            by_user[u].append((ts, eid, lon, lat))
        for u, pts in by_user.items():
            pts.sort()
            path = sum(
                math.floor(
                    math.sqrt((b[2] - a[2]) ** 2 + (b[3] - a[3]) ** 2) * 1e9 + 0.5
                )
                for a, b in zip(pts, pts[1:])
            )
            net = math.floor(
                math.sqrt((pts[-1][2] - pts[0][2]) ** 2 + (pts[-1][3] - pts[0][3]) ** 2)
                * 1e9 + 0.5
            )
            assert got[u] == (len(pts), path, net), u

    def test_trajectory_single_event_user(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import trajectory_stats

        rows = [(42, 7, 100, "view", 0.0)]
        out = trajectory_stats(
            ray.data.from_arrow(_events_table(rows)), num_buckets=2, num_partitions=1
        ).take_all()
        assert out == [{"user_id": 7, "n_events": 1, "path_micro": 0, "net_micro": 0}]


class TestTrajectorySimplify:
    """Exact integer Douglas-Peucker (stages/journey.py dp_keep_indices /
    trajectory_simplify): kernel vs a recursive brute force, planted
    shapes, and two-parallelism determinism."""

    @staticmethod
    def _brute_dp(x, y, tol2):
        """Recursive reference of the identical integer rule."""
        n = len(x)
        if n == 0:
            return []
        if n == 1:
            return [0]
        keep = {0, n - 1}

        def rec(lo, hi):
            if hi - lo < 2:
                return
            dx, dy = x[hi] - x[lo], y[hi] - y[lo]
            len2 = dx * dx + dy * dy
            best_m, best_i = -1, -1
            for i in range(lo + 1, hi):
                px, py = x[i] - x[lo], y[i] - y[lo]
                if len2 > 0:
                    cr = dx * py - dy * px
                    m = cr * cr
                else:
                    m = px * px + py * py
                if m > best_m:  # strict > keeps the SMALLEST tied index
                    best_m, best_i = m, i
            if best_m > tol2 * max(len2, 1):
                keep.add(best_i)
                rec(lo, best_i)
                rec(best_i, hi)

        rec(0, n - 1)
        return sorted(keep)

    def test_kernel_planted(self):
        from osm_export_tool_python_ray.stages.journey import dp_keep_indices

        # collinear points collapse to the endpoints
        x = np.arange(10, dtype=np.int64)
        y = 2 * x
        assert dp_keep_indices(x, y, tol2=0) == [0, 9]
        # a spike off the chord is kept once it exceeds the tolerance:
        # cross = len*dist, metric = cross^2 = len2*dist2, so the split
        # condition metric > tol2*len2 is exactly dist2 > tol2
        y = np.zeros(10, dtype=np.int64)
        y[4] = 5  # dist2 = 25
        assert dp_keep_indices(x, y, tol2=24) == [0, 4, 9]
        assert dp_keep_indices(x, y, tol2=25) == [0, 9]
        # degenerate zero-length chord (a closed loop) falls back to |p-a|^2
        x2 = np.array([0, 3, 0], dtype=np.int64)
        y2 = np.array([0, 0, 0], dtype=np.int64)
        assert dp_keep_indices(x2, y2, tol2=8) == [0, 1, 2]
        assert dp_keep_indices(x2, y2, tol2=9) == [0, 2]
        # singleton / empty
        assert dp_keep_indices(x2[:1], y2[:1], tol2=0) == [0]
        assert dp_keep_indices(x2[:0], y2[:0], tol2=0) == []

    def test_kernel_matches_brute_force(self):
        from osm_export_tool_python_ray.stages.journey import dp_keep_indices

        rng = np.random.RandomState(31)
        for trial in range(60):
            n = int(rng.randint(1, 40))
            x = rng.randint(0, 100, size=n).astype(np.int64)
            y = rng.randint(0, 100, size=n).astype(np.int64)
            tol2 = int(rng.randint(0, 30))
            assert dp_keep_indices(x, y, tol2) == self._brute_dp(
                list(map(int, x)), list(map(int, y)), tol2
            ), (trial, n, tol2)

    def test_stage_matches_kernel(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import (
            dp_keep_indices, trajectory_simplify,
        )

        rng = np.random.RandomState(47)
        rows = [
            (int(rng.randint(0, 10_000)), int(rng.randint(1, 15)),
             int(rng.randint(0, 500)), "view", 0.0)
            for i in range(400)
        ]
        got = {}
        for r in trajectory_simplify(
            ray.data.from_arrow(_events_table(rows)), tol2=9,
            num_buckets=4, num_partitions=2,
        ).take_all():
            got.setdefault(r["user_id"], []).append(r["idx"])
        from collections import defaultdict
        by_user = defaultdict(list)
        for eid, u, ts, _et, _v in rows:
            by_user[u].append((ts, eid))
        want = {}
        for u, pts in by_user.items():
            pts.sort()
            eid = np.array([p[1] for p in pts], dtype=np.int64)
            want[u] = [k + 1 for k in dp_keep_indices(eid % 100, (eid // 7) % 100, 9)]
        assert {u: sorted(v) for u, v in got.items()} == want

    def test_parallelism_determinism(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.journey import trajectory_simplify

        rng = np.random.RandomState(5)
        rows = [
            (int(rng.randint(0, 3_000)), int(rng.randint(1, 9)),
             int(rng.randint(0, 200)), "view", 0.0)
            for i in range(250)
        ]
        outs = []
        for nb, npart in [(2, 1), (16, 8)]:
            res = trajectory_simplify(
                ray.data.from_arrow(_events_table(rows)), tol2=9,
                num_buckets=nb, num_partitions=npart,
            ).take_all()
            outs.append(sorted((r["user_id"], r["idx"]) for r in res))
        assert outs[0] == outs[1]


class TestCellPeakHour:
    def test_matches_brute(self, ray_session):
        import ray.data
        from collections import Counter
        from osm_export_tool_python_ray.stages.journey import cell_peak_hour

        rng = np.random.RandomState(11)
        rows = [
            (int(rng.randint(0, 5_000)), 1,
             int(rng.randint(0, 90 * 3_600_000_000)), "view", 0.0)
            for _ in range(600)
        ]
        got = {
            (r["cx"], r["cy"]): (r["peak_hour"], r["n_peak"], r["n_total"])
            for r in cell_peak_hour(
                ray.data.from_arrow(_events_table(rows))
            ).take_all()
        }
        counts = Counter()
        for eid, _u, ts, _et, _v in rows:
            cx, cy = (eid % 100) // 10, ((eid // 7) % 100) // 10
            counts[(cx, cy, (ts // 3_600_000_000) % 24)] += 1
        want = {}
        for (cx, cy, hod), n in counts.items():
            tot = sum(v for (a, b, _), v in counts.items() if (a, b) == (cx, cy))
            best = want.get((cx, cy))
            if best is None or (n, -hod) > (best[1], -best[0]):
                want[(cx, cy)] = (hod, n, tot)
        # peak compared on (n desc, hod asc); totals identical either way
        assert got == want


class TestScd2:
    """SCD2 validity intervals (stages/temporal.py scd2_intervals):
    brute-force differential, equal-timestamp tiebreak, parallelism
    invariance."""

    @staticmethod
    def _brute(rows):
        """rows: (event_id, user_id, ts_us, event_type); returns
        {(user, valid_from): (state, valid_to|None, n_events)}."""
        by_user = {}
        for eid, u, ts, et in rows:
            by_user.setdefault(u, []).append((ts, eid, et))
        out = {}
        for u, evs in by_user.items():
            evs.sort()
            runs = []
            for ts, _eid, et in evs:
                if runs and runs[-1][0] == et:
                    runs[-1][2] += 1
                else:
                    runs.append([et, ts, 1])
            for i, (et, vf, n) in enumerate(runs):
                vt = runs[i + 1][1] if i + 1 < len(runs) else None
                out[(u, vf)] = (et, vt, n)
        return out

    def _run(self, rows, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.temporal import scd2_intervals

        tbl = _events_table([(e, u, t, s, 0.0) for e, u, t, s in rows])
        got = scd2_intervals(
            ray.data.from_arrow(tbl.select(["event_id", "user_id", "ts", "event_type"])),
            **kw,
        ).take_all()
        as_us = lambda v: None if v is None else int(np.datetime64(v, "us").astype(np.int64))
        return {
            (r["user_id"], as_us(r["valid_from"])): (
                r["state"],
                as_us(r["valid_to"]),
                r["n_events"],
            )
            for r in got
        }

    def test_planted_runs(self, ray_session):
        rows = [
            (0, 1, 100, "a"),
            (1, 1, 200, "a"),   # same run
            (2, 1, 300, "b"),   # change
            (3, 1, 400, "a"),   # back to a -> NEW run (SCD2, not dedup)
            (4, 2, 150, "x"),   # other user, single open run
        ]
        got = self._run(rows, num_buckets=4, num_partitions=2)
        assert got == {
            (1, 100): ("a", 300, 2),
            (1, 300): ("b", 400, 1),
            (1, 400): ("a", None, 1),
            (2, 150): ("x", None, 1),
        }

    def test_equal_ts_tiebreak_by_event_id(self, ray_session):
        # two events at the SAME ts: event_id order decides run structure
        rows = [(5, 1, 100, "b"), (4, 1, 100, "a"), (6, 1, 200, "b")]
        import ray.data

        from osm_export_tool_python_ray.stages.temporal import scd2_intervals

        tbl = _events_table([(e, u, t, s, 0.0) for e, u, t, s in rows])
        out = sorted(
            (r["state"], r["n_events"], r["valid_to"] is None)
            for r in scd2_intervals(
                ray.data.from_arrow(
                    tbl.select(["event_id", "user_id", "ts", "event_type"])
                ),
                num_buckets=2,
                num_partitions=1,
            ).take_all()
        )
        # order: (100,4,'a'), (100,5,'b'), (200,6,'b') -> runs a(1), b(2);
        # both runs share valid_from=100, so compare run tuples directly
        assert out == [("a", 1, False), ("b", 2, True)]

    def test_randomized_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(31)
        rows = [
            (i, int(rng.randint(0, 12)), int(rng.randint(0, 5000)) * 1000,
             "s%d" % rng.randint(0, 3))
            for i in range(600)
        ]
        # ts collisions are likely (5000 slots, 600 events, 12 users) —
        # the brute force sorts by (ts, event_id), same as the engine
        expect = self._brute(rows)
        a = self._run(rows, num_buckets=8, num_partitions=4)
        assert a == expect
        b = self._run(rows, num_buckets=2, num_partitions=1)
        assert b == expect


class TestGapFill:
    """Hourly resample + LOCF gap fill (stages/temporal.py
    gap_fill_locf): planted-series semantics, brute-force differential,
    span-cap accounting, parallelism invariance."""

    @staticmethod
    def _run(rows, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.temporal import gap_fill_locf

        res = gap_fill_locf(
            ray.data.from_arrow(_events_table(rows)), **kw
        ).take_all()
        return sorted((r["user_id"], r["hr"], r["v_q"], r["observed"])
                      for r in res)

    @staticmethod
    def _brute(rows, max_span=100_000):
        HOUR = 3_600_000_000
        obs = {}
        for _eid, u, ts, _et, v in rows:
            k = (u, ts // HOUR)
            obs[k] = obs.get(k, 0) + int(np.floor(v * 1e4 + 0.5))
        out = []
        for u in sorted({k[0] for k in obs}):
            hrs = sorted(h for (uu, h) in obs if uu == u)
            last = None
            for h in range(hrs[0], min(hrs[-1], hrs[0] + max_span - 1) + 1):
                if (u, h) in obs:
                    last = obs[(u, h)]
                    out.append((u, h, last, 1))
                else:
                    out.append((u, h, last, 0))
        return out

    def test_planted_locf(self, ray_session):
        H = 3_600_000_000
        rows = [
            (1, 7, 0 * H + 5, "a", 1.0),       # hr 0: 10000
            (2, 7, 0 * H + 9, "a", 2.0),       # hr 0: +20000
            (3, 7, 3 * H + 1, "a", 0.5),       # hr 3: 5000 (hrs 1,2 filled)
            (4, 9, 10 * H, "b", -1.25),        # single-hour user
        ]
        got = self._run(rows, num_buckets=4, num_partitions=2)
        assert got == [
            (7, 0, 30000, 1), (7, 1, 30000, 0), (7, 2, 30000, 0),
            (7, 3, 5000, 1), (9, 10, -12500, 1),
        ]

    @pytest.mark.parametrize("seed", [3, 17])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        rows = [
            (i, int(rng.randint(1, 12)),
             int(rng.randint(0, 200)) * 3_600_000_000
             + int(rng.randint(0, 3_600_000_000)),
             "x", float(rng.randn()))
            for i in range(400)
        ]
        assert self._run(rows, num_buckets=8, num_partitions=4) == \
            self._brute(rows)

    def test_span_cap_truncates_and_counts(self, ray_session):
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        H = 3_600_000_000
        rows = [(1, 5, 0, "a", 1.0), (2, 5, 99 * H, "a", 2.0)]
        snapshot_caps()
        got = self._run(rows, max_span=10, num_buckets=2, num_partitions=1)
        caps = snapshot_caps()
        assert caps.get("gap_fill_span_truncated", 0) == 90
        assert len(got) == 10 and got[0] == (5, 0, 10000, 1)

    def test_parallelism_invariant(self, ray_session):
        rng = np.random.RandomState(29)
        rows = [
            (i, int(rng.randint(1, 30)),
             int(rng.randint(0, 3_600_000_000 * 500)), "x",
             float(rng.randn() * 10))
            for i in range(600)
        ]
        assert self._run(rows, num_buckets=2, num_partitions=1) == \
            self._run(rows, num_buckets=32, num_partitions=8)


class TestTimeTravel:
    """AS-OF snapshot cut over SCD2 history (queries.q_time_travel):
    boundary semantics — valid_from inclusive, valid_to exclusive, open
    intervals match any later T."""

    def test_boundaries(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        T = 1705320000000000  # the query's fixed cut point (epoch-us)
        H = 3_600_000_000
        rows = [
            # user 1: state a [T-2h, T), state b [T, open) → b at T
            (1, 1, T - 2 * H, "a", 0.0),
            (2, 1, T, "b", 0.0),
            # user 2: single run starting after T → no row at T
            (3, 2, T + H, "c", 0.0),
            # user 3: run ends exactly at T (next run starts at T) → new run
            (4, 3, T - H, "d", 0.0),
            (5, 3, T, "d", 0.0),  # same state → same run, spans T
        ]
        pq.write_table(_events_table(rows), str(tmp_path / "events.parquet"))
        got = {
            r["user_id"]: (r["state"], r["n_events"])
            for r in QUERIES["time_travel"](str(tmp_path)).take_all()
        }
        assert got == {1: ("b", 1), 3: ("d", 2)}
