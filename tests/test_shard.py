"""Rendezvous hashing: the minimal-movement property IS the
independent characterization — removing a shard must reassign exactly
the keys that lived on it, and nothing else. Plus balance sanity and a
scalar re-derivation of the weight function."""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.shard import (
    K1,
    K2,
    rendezvous_pick,
    rendezvous_weights,
    shard_assign,
)


def _mix64_scalar(v):
    M = (1 << 64) - 1
    v = (v ^ (v >> 33)) & M
    v = (v * 0xFF51AFD7ED558CCD) & M
    v = (v ^ (v >> 33)) & M
    v = (v * 0xC4CEB9FE1A85EC53) & M
    v = (v ^ (v >> 33)) & M
    return v


class TestWeights:
    def test_matches_scalar_bigint_arithmetic(self):
        keys = np.array([0, 1, 7, 123456789, 2**62 + 5], dtype=np.int64)
        w = rendezvous_weights(keys, 4)
        M = (1 << 64) - 1
        for s in range(4):
            for j, k in enumerate(keys.tolist()):
                base = (k * int(K1) + s * int(K2)) & M
                assert int(w[s, j]) == _mix64_scalar(base)


class TestMinimalMovement:
    def test_removing_a_shard_moves_only_its_keys(self):
        keys = np.arange(0, 20000, dtype=np.int64)
        n = 16
        owner = rendezvous_pick(keys, n)
        # drop the LAST shard (argmax over the first n-1 rows = the
        # surviving fleet; any key whose owner survives keeps it)
        owner_after = rendezvous_pick(keys, n - 1)
        moved = owner != owner_after
        assert (owner[moved] == n - 1).all()
        assert (owner == n - 1).sum() == moved.sum()

    def test_balance_is_plausible(self):
        keys = np.arange(0, 20000, dtype=np.int64)
        counts = np.bincount(rendezvous_pick(keys, 16), minlength=16)
        assert counts.min() > 0.7 * 20000 / 16
        assert counts.max() < 1.3 * 20000 / 16


class TestShardAssign:
    def test_stats_match_brute(self, ray_session):
        import ray.data

        d = np.random.default_rng(3).integers(1, 10**9, 777).astype(np.int64)
        d = np.unique(d)
        ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(d)}))
        rows = {r["shard"]: r for r in shard_assign(ds, 16).take_all()}
        owner = rendezvous_pick(d, 16)
        for s in range(16):
            sel = d[owner == s]
            if not len(sel):
                assert s not in rows
                continue
            r = rows[s]
            assert r["n"] == len(sel)
            assert r["id_sum"] == int(sel.sum())
            assert r["min_doc"] == int(sel.min())
            assert r["max_doc"] == int(sel.max())
