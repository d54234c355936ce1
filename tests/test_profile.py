"""Column profiling (stages/profile.py profile_table): planted
null/NDV/min-max semantics, numeric-order-correct reprs, brute-force
differential, parallelism invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _run(tbl, spec, **kw):
    import ray.data

    from osm_export_tool_python_ray.stages.profile import profile_table

    res = profile_table(ray.data.from_arrow(tbl), spec, **kw).take_all()
    return {
        r["col"]: (r["n_nulls"], r["n_distinct"], r["min_v"], r["max_v"])
        for r in res
    }


class TestProfileTable:
    def test_planted(self, ray_session):
        tbl = pa.table(
            {
                "a": pa.array([5, 5, None, 2, 100], type=pa.int64()),
                "s": pa.array(["b", None, None, "a", "b"], type=pa.string()),
                "p": pa.array([1.25, 0.1, 0.1, None, 2.0], type=pa.float64()),
            }
        )
        got = _run(
            tbl, [("a", "int"), ("s", "str"), ("p", "cents")],
            num_buckets=4, num_partitions=2,
        )
        pad = lambda v: str(v).zfill(20)
        assert got["a"] == (1, 3, pad(2), pad(100))
        assert got["s"] == (2, 2, "a", "b")
        # cents repr: 1.25→125, 0.1→10, 2.0→200
        assert got["p"] == (1, 3, pad(10), pad(200))

    def test_padded_repr_orders_numerically(self, ray_session):
        # lexicographic "9" > "10" would be wrong; padding fixes it
        tbl = pa.table({"a": pa.array([9, 10, 2], type=pa.int64())})
        got = _run(tbl, [("a", "int")], num_buckets=2, num_partitions=1)
        assert got["a"][2].lstrip("0") == "2" and got["a"][3].lstrip("0") == "10"

    def test_timestamp_kind(self, ray_session):
        ts = pa.array(
            np.array([1_000_000, 5_000_000, 1_000_000], dtype="datetime64[us]")
        )
        got = _run(
            tbl=pa.table({"t": ts}), spec=[("t", "ts_us")],
            num_buckets=2, num_partitions=1,
        )
        assert got["t"] == (0, 2, str(1_000_000).zfill(20), str(5_000_000).zfill(20))

    @pytest.mark.parametrize("seed", [1, 23])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        a = rng.randint(0, 40, size=500).astype(object)
        a[rng.rand(500) < 0.1] = None
        s = np.array([chr(65 + x) * 2 for x in rng.randint(0, 9, size=500)], dtype=object)
        s[rng.rand(500) < 0.2] = None
        tbl = pa.table(
            {"a": pa.array(list(a), type=pa.int64()),
             "s": pa.array(list(s), type=pa.string())}
        )
        got = _run(tbl, [("a", "int"), ("s", "str")],
                   num_buckets=8, num_partitions=4)
        av = [x for x in a if x is not None]
        sv = [x for x in s if x is not None]
        assert got["a"] == (
            int(sum(x is None for x in a)), len(set(av)),
            str(min(av)).zfill(20), str(max(av)).zfill(20),
        )
        assert got["s"] == (
            int(sum(x is None for x in s)), len(set(sv)), min(sv), max(sv),
        )

    def test_parallelism_invariant(self, ray_session):
        rng = np.random.RandomState(5)
        tbl = pa.table(
            {"a": pa.array(rng.randint(0, 1000, size=2000), type=pa.int64())}
        )
        one = _run(tbl, [("a", "int")], num_buckets=2, num_partitions=1)
        many = _run(tbl, [("a", "int")], num_buckets=32, num_partitions=8)
        assert one == many
