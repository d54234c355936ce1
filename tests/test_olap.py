"""OLAP grouping-set + string-similarity operators (stages/olap.py,
stages/editdist.py): brute-force differentials on random inputs, planted
semantics, parallelism invariance, counted caps."""

import numpy as np
import pyarrow as pa
import pytest

from tests.test_temporal import _events_table


def _run_ds(tbl, fn, **kw):
    import ray.data

    return fn(ray.data.from_arrow(tbl), **kw).take_all()


class TestCubeRollup:
    @staticmethod
    def _brute(rows, cell_div=10):
        from collections import defaultdict

        agg = defaultdict(lambda: [0, 0])
        for eid, u, ts, et, v in rows:
            hod = (ts // 3_600_000_000) % 24
            cell = (eid % 100) // cell_div
            vm = int(np.floor(v * 100 + 0.5))
            for m in range(8):
                key = (
                    "*" if m & 4 else et,
                    -1 if m & 2 else hod,
                    -1 if m & 1 else cell,
                )
                agg[key][0] += 1
                agg[key][1] += vm
        return {k: tuple(v) for k, v in agg.items()}

    @staticmethod
    def _run(rows, **kw):
        from osm_export_tool_python_ray.stages.olap import cube_rollup

        out = _run_ds(_events_table(rows), cube_rollup, **kw)
        return {(r["et"], r["hod"], r["cell"]): (r["n"], r["sumv"]) for r in out}

    def test_planted(self, ray_session):
        rows = [
            (0, 1, 0, "view", 1.0),  # hod 0, cell 0
            (10, 1, 3_600_000_000, "view", 2.5),  # hod 1, cell 1
            (10, 2, 3_600_000_000, "click", 0.5),  # hod 1, cell 1
        ]
        got = self._run(rows, num_buckets=4, num_partitions=2)
        assert got[("*", -1, -1)] == (3, 400)
        assert got[("view", -1, -1)] == (2, 350)
        assert got[("*", 1, -1)] == (2, 300)
        assert got[("view", 1, 1)] == (1, 250)
        assert len(got) == self._count_sets(rows)

    @staticmethod
    def _count_sets(rows):
        return len(TestCubeRollup._brute(rows))

    @pytest.mark.parametrize("seed", [3, 17])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        types = ["view", "click", "purchase"]
        rows = [
            (
                int(rng.randint(0, 300)),
                int(rng.randint(1, 8)),
                int(rng.randint(0, 100) * 3_600_000_000),
                types[rng.randint(3)],
                float(rng.randint(0, 1000)) / 100.0,
            )
            for _ in range(500)
        ]
        assert self._run(rows, num_buckets=8, num_partitions=4) == self._brute(rows)

    def test_parallelism_determinism(self, ray_session):
        rng = np.random.RandomState(5)
        rows = [
            (
                int(rng.randint(0, 200)),
                1,
                int(rng.randint(0, 50) * 3_600_000_000),
                "view",
                float(rng.randint(0, 500)) / 100.0,
            )
            for _ in range(300)
        ]
        a = self._run(rows, num_buckets=2, num_partitions=1)
        b = self._run(rows, num_buckets=16, num_partitions=6)
        assert a == b


class TestSkyline:
    @staticmethod
    def _brute(rows):
        from collections import defaultdict

        agg = defaultdict(lambda: [0, 0])
        for _eid, u, ts, _et, v in rows:
            dow = (ts // 86_400_000_000) % 7
            agg[(dow, u)][0] += 1
            agg[(dow, u)][1] += int(np.floor(v * 100 + 0.5))
        out = set()
        for (dow, u), (n, s) in agg.items():
            dominated = any(
                d2 == dow
                and (n2 >= n and s2 >= s and (n2 > n or s2 > s))
                for (d2, _u2), (n2, s2) in agg.items()
            )
            if not dominated:
                out.add((dow, u, n, s))
        return out

    @staticmethod
    def _run(rows, **kw):
        from osm_export_tool_python_ray.stages.olap import skyline

        out = _run_ds(_events_table(rows), skyline, **kw)
        return {(r["dow"], r["user_id"], r["n_events"], r["sumv"]) for r in out}

    def test_duplicate_frontier_points_both_survive(self, ray_session):
        # users 1 and 2: identical (n_events, sumv) on dow 0; user 3 dominated
        rows = [
            (0, 1, 0, "v", 5.0),
            (0, 1, 1, "v", 5.0),
            (0, 2, 2, "v", 5.0),
            (0, 2, 3, "v", 5.0),
            (0, 3, 4, "v", 1.0),
        ]
        got = self._run(rows, num_buckets=4, num_partitions=2)
        assert got == {(0, 1, 2, 1000), (0, 2, 2, 1000)}

    @pytest.mark.parametrize("seed", [11, 23])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        rows = [
            (
                int(rng.randint(0, 100)),
                int(rng.randint(1, 25)),
                int(rng.randint(0, 14) * 86_400_000_000 + rng.randint(0, 1000)),
                "v",
                float(rng.randint(0, 300)) / 100.0,
            )
            for _ in range(600)
        ]
        assert self._run(rows, num_buckets=8, num_partitions=4) == self._brute(rows)

    def test_parallelism_determinism(self, ray_session):
        rng = np.random.RandomState(29)
        rows = [
            (
                0,
                int(rng.randint(1, 30)),
                int(rng.randint(0, 7) * 86_400_000_000),
                "v",
                float(rng.randint(0, 200)) / 100.0,
            )
            for _ in range(400)
        ]
        a = self._run(rows, num_buckets=2, num_partitions=1)
        b = self._run(rows, num_buckets=32, num_partitions=8)
        assert a == b


def _lev(a, b):
    """Reference Levenshtein (dynamic program)."""
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


class TestLev1Mask:
    def test_cases(self):
        from osm_export_tool_python_ray.stages.editdist import lev1_mask

        pairs = [
            ("cold ring", "old ring", True),  # deletion at front
            ("cold ring", "cold rings", True),  # insertion at end
            ("cold ring", "gold ring", True),  # substitution
            ("ab", "ba", False),  # transposition = distance 2
            ("abc", "abcde", False),  # length diff 2
            ("a", "b", True),
            ("abc", "axc", True),
            ("abc", "axy", False),
            ("kitten", "sitting", False),
            ("xx", "x", True),
            ("abcd", "acbd", False),  # swap = 2
        ]
        a = pa.array([p[0] for p in pairs])
        b = pa.array([p[1] for p in pairs])
        got = lev1_mask(a, b)
        assert got.tolist() == [p[2] for p in pairs]

    @pytest.mark.parametrize("seed", [1, 2])
    def test_random_against_dp(self, seed):
        from osm_export_tool_python_ray.stages.editdist import lev1_mask

        rng = np.random.RandomState(seed)
        alpha = "abc"
        strs = [
            "".join(alpha[rng.randint(3)] for _ in range(rng.randint(1, 6)))
            for _ in range(200)
        ]
        a = [strs[rng.randint(len(strs))] for _ in range(300)]
        b = [strs[rng.randint(len(strs))] for _ in range(300)]
        keep = [x != y for x, y in zip(a, b)]
        a = [x for x, k in zip(a, keep) if k]
        b = [x for x, k in zip(b, keep) if k]
        got = lev1_mask(pa.array(a), pa.array(b))
        want = [_lev(x, y) == 1 for x, y in zip(a, b)]
        assert got.tolist() == want


class TestEditdistPairs:
    @staticmethod
    def _brute(names):
        from collections import Counter

        c = Counter(names)
        keys = sorted(c)
        out = set()
        for i, x in enumerate(keys):
            for y in keys[i + 1 :]:
                if _lev(x, y) == 1:
                    out.add((x, y, c[x], c[y]))
        return out

    @staticmethod
    def _run(names, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.editdist import editdist_pairs

        t = pa.table({"p_name": pa.array(names, type=pa.string())})
        out = editdist_pairs(ray.data.from_arrow(t), **kw).take_all()
        return {(r["name_a"], r["name_b"], r["n_a"], r["n_b"]) for r in out}

    @pytest.mark.parametrize("seed", [7, 31])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        alpha = "abcd"
        names = [
            "".join(alpha[rng.randint(4)] for _ in range(rng.randint(1, 5)))
            for _ in range(500)
        ]
        got = self._run(names, num_buckets=8, num_partitions=4)
        assert got == self._brute(names)

    def test_repeated_chars_dedup(self, ray_session):
        # "aab" generates variant "ab" via two deletion positions; the
        # pair (aab, ab) must still appear exactly once
        got = self._run(["aab", "ab", "aab"], num_buckets=4, num_partitions=2)
        assert got == {("aab", "ab", 2, 1)}

    def test_group_cap_counted(self, ray_session):
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        # many strings sharing variant "x": "xa".."xj" all delete to "x"
        # plus "x" itself
        names = ["x"] + ["x" + ch for ch in "abcdefghij"]
        snapshot_caps()
        got = self._run(names, num_buckets=2, num_partitions=1, group_cap=3)
        caps = snapshot_caps()
        assert caps.get("editdist_variant_group_truncated", 0) > 0
        # capped run returns a subset of the true pairs
        assert got <= self._brute(names)

    def test_parallelism_determinism(self, ray_session):
        rng = np.random.RandomState(41)
        alpha = "ab"
        names = [
            "".join(alpha[rng.randint(2)] for _ in range(rng.randint(1, 4)))
            for _ in range(200)
        ]
        a = self._run(names, num_buckets=2, num_partitions=1)
        b = self._run(names, num_buckets=16, num_partitions=8)
        assert a == b


class TestCdcMerge:
    """CDC MERGE (stages/merge.py): brute-force differential on random
    change logs, the delete-then-restore winner edge, inserts, empty
    sides, and parallelism invariance."""

    COLS = ("k", "payload", "price")

    @staticmethod
    def _base_table(rows):
        return pa.table(
            {
                "k": pa.array([r[0] for r in rows], type=pa.int64()),
                "payload": pa.array([r[1] for r in rows], type=pa.string()),
                "price": pa.array([r[2] for r in rows], type=pa.float64()),
            }
        )

    @staticmethod
    def _changes_table(rows):
        return pa.table(
            {
                "k": pa.array([r[0] for r in rows], type=pa.int64()),
                "version": pa.array([r[1] for r in rows], type=pa.int64()),
                "op": pa.array([r[2] for r in rows], type=pa.string()),
                "payload": pa.array([r[3] for r in rows], type=pa.string()),
                "price": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        )

    @staticmethod
    def _brute(base, changes):
        win = {}
        for k, v, op, payload, price in changes:
            if k not in win or v > win[k][0]:
                win[k] = (v, op, payload, price)
        out = {}
        for k, payload, price in base:
            if k not in win:
                out[k] = (payload, price)
        for k, (_v, op, payload, price) in win.items():
            if op == "U":
                out[k] = (payload, price)
        return out

    def _run(self, base, changes, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.merge import cdc_merge

        got = cdc_merge(
            ray.data.from_arrow(self._base_table(base)),
            ray.data.from_arrow(self._changes_table(changes)),
            "k",
            base_schema=self._base_table([]).schema,
            changes_schema=self._changes_table([]).schema,
            **kw,
        ).take_all()
        as_map = {r["k"]: (r["payload"], r["price"]) for r in got}
        assert len(as_map) == len(got), "duplicate keys in merge output"
        return as_map

    def test_planted_semantics(self, ray_session):
        base = [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)]
        changes = [
            (2, 1, "U", "b2", 2.5),          # plain update
            (3, 1, "D", None, None),          # delete
            (4, 1, "D", None, None),          # delete...
            (4, 2, "U", "d-restored", 4.5),   # ...then restore (v2 wins)
            (9, 1, "U", "new", 9.0),          # insert
            (9, 2, "D", None, None),          # ...retracted (v2 wins)
        ]
        got = self._run(base, changes, num_buckets=4, num_partitions=2)
        assert got == {
            1: ("a", 1.0),
            2: ("b2", 2.5),
            4: ("d-restored", 4.5),
        }

    def test_randomized_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(23)
        base = [(int(k), "p%d" % k, float(k) / 8) for k in range(0, 300, 2)]
        changes = []
        seen = set()
        for _ in range(400):
            k = int(rng.randint(0, 320))  # hits existing + absent keys
            v = int(rng.randint(1, 6))
            if (k, v) in seen:  # (key, version) unique — the CDC contract
                continue
            seen.add((k, v))
            if rng.rand() < 0.3:
                changes.append((k, v, "D", None, None))
            else:
                changes.append((k, v, "U", "c%d_%d" % (k, v), float(v)))
        expect = self._brute(base, changes)
        got = self._run(base, changes, num_buckets=8, num_partitions=4)
        assert got == expect
        # parallelism invariance: one partition == many
        assert self._run(base, changes, num_buckets=2, num_partitions=1) == expect

    def test_empty_sides(self, ray_session):
        base = [(1, "a", 1.0), (2, "b", 2.0)]
        changes = [(5, 1, "U", "e", 5.0), (1, 1, "D", None, None)]
        # empty change stream → base passes through
        assert self._run(base, [], num_buckets=4, num_partitions=2) == {
            1: ("a", 1.0),
            2: ("b", 2.0),
        }
        # empty base → inserts only
        assert self._run([], changes, num_buckets=4, num_partitions=2) == {
            5: ("e", 5.0)
        }

    def test_missing_change_columns_rejected(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.merge import cdc_merge

        with pytest.raises(ValueError, match="missing columns"):
            cdc_merge(
                ray.data.from_arrow(self._base_table([(1, "a", 1.0)])),
                ray.data.from_arrow(
                    pa.table({"k": pa.array([1], type=pa.int64())})
                ),
                "k",
            )
