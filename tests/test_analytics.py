"""stages/analytics.py operators (cohort retention, IDW interpolation,
Hausdorff trajectory-similarity join, time-decayed cell heat) verified
against independent brute-force characterizations, plus parallelism
determinism and the counted Hausdorff bucket cap."""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.analytics import (
    DECAY_SCALE,
    IDW_SCALE,
    WEEK_US,
    cohort_retention,
    decayed_cells,
    default_probes,
    hausdorff_pairs,
    idw_grid,
)

DAY_US = 24 * 3600 * 1_000_000
T0 = 1704067200 * 1_000_000  # 2024-01-01T00:00:00Z


def _events_table(n=4000, seed=7, n_users=37):
    rng = np.random.default_rng(seed)
    eid = rng.permutation(np.arange(n, dtype=np.int64) * 3 + 1)
    uid = rng.integers(0, n_users, n).astype(np.int64)
    ts = T0 + rng.integers(0, 30 * DAY_US, n).astype(np.int64)
    val = np.round(rng.uniform(0.01, 500.0, n), 2)
    return pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "value": pa.array(val),
        }
    )


def _ds(t, blocks=6):
    import ray.data

    return ray.data.from_arrow(t).repartition(blocks)


class TestCohortRetention:
    def test_matches_brute(self, ray_session):
        t = _events_table()
        out = cohort_retention(_ds(t.select(["user_id", "ts"]))).take_all()
        uid = t.column("user_id").to_numpy()
        wk = t.column("ts").cast(pa.int64()).to_numpy() // int(WEEK_US)
        pres = set(zip(uid.tolist(), wk.tolist()))
        cohort = {}
        for u, w in pres:
            cohort[u] = min(cohort.get(u, w), w)
        want = {}
        for u, w in pres:
            key = (cohort[u], w - cohort[u])
            want[key] = want.get(key, 0) + 1
        got = {(r["cohort_week"], r["week_offset"]): r["users"] for r in out}
        assert got == want
        # every user's offset-0 row exists (cohort week itself is active)
        total_offset0 = sum(v for (c, o), v in got.items() if o == 0)
        assert total_offset0 == len(cohort)

    def test_parallelism_determinism(self, ray_session):
        t = _events_table(seed=11)
        a = sorted(
            map(tuple_row, cohort_retention(_ds(t, 2)).take_all())
        )
        b = sorted(
            map(tuple_row, cohort_retention(_ds(t, 16)).take_all())
        )
        assert a == b


def tuple_row(r):
    return tuple(sorted(r.items()))


class TestIdwGrid:
    def test_matches_brute(self, ray_session):
        t = _events_table(seed=3)
        out = idw_grid(_ds(t.select(["event_id", "value"]))).take_all()
        eid = t.column("event_id").to_numpy()
        val = t.column("value").to_numpy()
        x = (eid % 100).astype(np.int64)
        y = ((eid // 7) % 100).astype(np.int64)
        vq = np.floor(val * 1e4 + 0.5).astype(np.int64)
        px, py = default_probes()
        assert len(out) == len(px)
        for r in out:
            p = r["probe_id"]
            d2 = (x - px[p]) ** 2 + (y - py[p]) ** 2
            w = int(IDW_SCALE) // (d2 + 1)
            assert r["px"] == px[p] and r["py"] == py[p]
            assert r["wsum"] == int(w.sum())
            assert r["idw_q"] == int((w * vq).sum()) // int(w.sum())

    def test_fold_order_invariance(self, ray_session):
        t = _events_table(seed=5)
        a = sorted(map(tuple_row, idw_grid(_ds(t, 1)).take_all()))
        b = sorted(map(tuple_row, idw_grid(_ds(t, 13)).take_all()))
        assert a == b


def _brute_hausdorff(t, cap_pts=16):
    eid = t.column("event_id").to_numpy()
    uid = t.column("user_id").to_numpy()
    x = (eid % 100).astype(np.int64)
    y = ((eid // 7) % 100).astype(np.int64)
    per_user = {}
    for u, xi, yi in zip(uid.tolist(), x.tolist(), y.tolist()):
        per_user.setdefault(u, set()).add((xi, yi))
    kept = {u: sorted(s)[:cap_pts] for u, s in per_user.items()}
    anchor_bucket = {
        u: (pts[0][0] // 20) * 5 + pts[0][1] // 20 for u, pts in kept.items()
    }
    want = {}
    users = sorted(kept)
    for i, ua in enumerate(users):
        for ub in users[i + 1 :]:
            if anchor_bucket[ua] != anchor_bucket[ub]:
                continue
            A = np.array(kept[ua], dtype=np.int64)
            B = np.array(kept[ub], dtype=np.int64)
            d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)
            want[(ua, ub)] = max(
                int(d2.min(axis=1).max()), int(d2.min(axis=0).max())
            )
    return want


class TestHausdorffPairs:
    def test_matches_brute(self, ray_session):
        t = _events_table(n=1500, seed=9, n_users=25)
        out = hausdorff_pairs(_ds(t.select(["event_id", "user_id"]))).take_all()
        got = {(r["user_a"], r["user_b"]): r["haus_d2"] for r in out}
        assert got == _brute_hausdorff(t)
        assert got  # nontrivial: at least one candidate pair

    def test_identical_trajectories_distance_zero(self, ray_session):
        # two users with the same point set → Hausdorff 0
        eid = np.arange(40, dtype=np.int64)
        t = pa.table(
            {
                "event_id": pa.array(np.concatenate([eid, eid])),
                "user_id": pa.array(
                    np.concatenate(
                        [np.zeros(40, np.int64), np.ones(40, np.int64)]
                    )
                ),
            }
        )
        out = hausdorff_pairs(_ds(t, 4)).take_all()
        got = {(r["user_a"], r["user_b"]): r["haus_d2"] for r in out}
        assert got[(0, 1)] == 0

    def test_bucket_cap_counts_drops(self, ray_session):
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        # 10 users all sharing one anchor cell → bucket of 10 > cap 3
        base = np.arange(8, dtype=np.int64)  # x in 0..7, same 20x20 cell
        eids, uids = [], []
        for u in range(10):
            eids.append(base + 700 * u)  # 700 ≡ 0 mod 100/7-grid shifts y
            uids.append(np.full(8, u, dtype=np.int64))
        t = pa.table(
            {
                "event_id": pa.array(np.concatenate(eids) % 100),
                "user_id": pa.array(np.concatenate(uids)),
            }
        )
        snapshot_caps()
        out = hausdorff_pairs(_ds(t, 3), bucket_cap=3).take_all()
        caps = snapshot_caps()
        assert caps.get("hausdorff_bucket_truncated", 0) > 0
        kept_users = {r["user_a"] for r in out} | {r["user_b"] for r in out}
        assert len(kept_users) <= 3  # the smallest user_ids survive

    def test_parallelism_determinism(self, ray_session):
        t = _events_table(n=1200, seed=21, n_users=20)
        a = sorted(map(tuple_row, hausdorff_pairs(_ds(t, 2)).take_all()))
        b = sorted(map(tuple_row, hausdorff_pairs(_ds(t, 12)).take_all()))
        assert a == b


class TestDecayedCells:
    def test_matches_brute(self, ray_session):
        t = _events_table(seed=13)
        t_ref = T0 + 31 * DAY_US  # 2024-02-01
        out = decayed_cells(
            _ds(t.select(["event_id", "ts"])), t_ref_us=t_ref
        ).take_all()
        eid = t.column("event_id").to_numpy()
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        cx = (eid % 100) // 10
        cy = ((eid // 7) % 100) // 10
        age_h = np.maximum(t_ref - ts, 0) // 3_600_000_000
        k = np.minimum(age_h // 24, 40)
        w = int(DECAY_SCALE) // (np.int64(1) << k)
        want = {}
        for c1, c2, wi in zip(cx.tolist(), cy.tolist(), w.tolist()):
            n, s = want.get((c1, c2), (0, 0))
            want[(c1, c2)] = (n + 1, s + wi)
        got = {(r["cx"], r["cy"]): (r["n"], r["decayed"]) for r in out}
        assert got == want
        # decay is monotone: a fully fresh event weighs DECAY_SCALE
        assert all(0 < d <= n * int(DECAY_SCALE) for n, d in want.values())

    def test_future_events_clamp_to_age_zero(self, ray_session):
        eid = np.arange(10, dtype=np.int64)
        ts = np.full(10, T0 + 100 * DAY_US, dtype=np.int64)  # after t_ref
        t = pa.table(
            {
                "event_id": pa.array(eid),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
            }
        )
        out = decayed_cells(_ds(t, 2), t_ref_us=T0).take_all()
        assert sum(r["decayed"] for r in out) == 10 * int(DECAY_SCALE)
