"""aoi_cell_cover and colocation_triangles: verified against
independent characterizations (Fraction-exact scalar ray cast; triple
loop over a brute-force edge dict)."""

from fractions import Fraction
from itertools import combinations

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.journey import aoi_cell_cover, cells_in_polygon

POLY = [(10, 50), (35, 10), (75, 15), (90, 55), (60, 90), (25, 85)]


def _pip_scalar(px, py, poly):
    # independent: exact rational x-intersection comparison
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = Fraction(x1) + Fraction(py - y1, y2 - y1) * (x2 - x1)
            if Fraction(px) < xint:
                inside = not inside
    return inside


class TestCellsInPolygon:
    def test_matches_rational_ray_cast(self):
        cx, cy = np.meshgrid(np.arange(10), np.arange(10))
        cx, cy = cx.ravel().astype(np.int64), cy.ravel().astype(np.int64)
        got = cells_in_polygon(cx, cy, POLY)
        for i in range(len(cx)):
            want = _pip_scalar(10 * int(cx[i]) + 5, 10 * int(cy[i]) + 5, POLY)
            assert bool(got[i]) == want, (cx[i], cy[i])
        assert 0 < got.sum() < len(cx)  # nontrivial polygon

    def test_cover_counts(self, ray_session):
        import ray.data

        eid = np.arange(0, 3000, dtype=np.int64)
        out = aoi_cell_cover(
            ray.data.from_arrow(pa.table({"event_id": pa.array(eid)})), POLY
        ).take_all()
        want = {}
        for e in eid.tolist():
            cx, cy = (e % 100) // 10, ((e // 7) % 100) // 10
            if _pip_scalar(10 * cx + 5, 10 * cy + 5, POLY):
                n, s = want.get((cx, cy), (0, 0))
                want[(cx, cy)] = (n + 1, s + e)
        got = {(r["cx"], r["cy"]): (r["n"], r["id_sum"]) for r in out}
        assert got == want


def _brute_triangles(rows, min_shared=2):
    """rows: (event_id, user_id, ts_us). Returns {user: n_tri}."""
    pres = set()
    for e, u, ts in rows:
        pres.add((u, (e % 100) // 10, ((e // 7) % 100) // 10, ts // 3_600_000_000))
    from collections import Counter

    shared = Counter()
    bygroup = {}
    for u, cx, cy, hr in pres:
        bygroup.setdefault((cx, cy, hr), set()).add(u)
    for us in bygroup.values():
        for a, b in combinations(sorted(us), 2):
            shared[(a, b)] += 1
    edges = {p for p, n in shared.items() if n >= min_shared}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out = {}
    for a, b in edges:
        for c in adj.get(b, set()):
            if (a, c) in edges:
                for u in (a, b, c):
                    out[u] = out.get(u, 0) + 1
    return out


class TestTriangles:
    def _events(self, seed, n=500, users=25):
        rng = np.random.RandomState(seed)
        rows = [
            (int(rng.randint(0, 4000)), int(rng.randint(1, users + 1)),
             int(rng.randint(0, 20 * 3_600_000_000)))
            for _ in range(n)
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "ts": pa.array(np.array([r[2] for r in rows], dtype="datetime64[us]")),
            }
        )
        return rows, t

    def test_matches_brute(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.graph import colocation_triangles

        rows, t = self._events(7)
        got = {
            r["user_id"]: r["n_tri"]
            for r in colocation_triangles(ray.data.from_arrow(t)).take_all()
        }
        assert got == _brute_triangles(rows)
        assert sum(got.values()) % 3 == 0

    def test_parallelism_determinism(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.graph import colocation_triangles

        _, t = self._events(13)
        outs = []
        for nb, npart in [(4, 2), (32, 8)]:
            res = colocation_triangles(
                ray.data.from_arrow(t), num_buckets=nb, num_partitions=npart
            ).take_all()
            outs.append(sorted((r["user_id"], r["n_tri"]) for r in res))
        assert outs[0] == outs[1]

    def test_wedge_cap_counts_drops(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.graph import colocation_triangles
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        rows, t = self._events(21, n=800, users=40)
        snapshot_caps()
        full = colocation_triangles(ray.data.from_arrow(t)).take_all()
        assert not snapshot_caps().get("triangle_wedge_truncated")
        capped = colocation_triangles(ray.data.from_arrow(t), wedge_cap=2).take_all()
        caps = snapshot_caps()
        brute_total = sum(_brute_triangles(rows).values())
        if brute_total and caps.get("triangle_wedge_truncated"):
            assert sum(r["n_tri"] for r in capped) <= sum(r["n_tri"] for r in full)


class TestButterflies:
    """Bipartite butterfly participation (stages/graph.py
    butterfly_counts): planted motif, exact C(c,2) arithmetic,
    brute-force differential over a random bipartite graph."""

    @staticmethod
    def _run(pair_rows):
        import ray.data

        from osm_export_tool_python_ray.stages.graph import butterfly_counts

        tbl = pa.table(
            {
                "user_a": pa.array([r[0] for r in pair_rows], type=pa.int64()),
                "user_b": pa.array([r[1] for r in pair_rows], type=pa.int64()),
                "n_shared": pa.array([r[2] for r in pair_rows], type=pa.int64()),
            }
        )
        res = butterfly_counts(ray.data.from_arrow(tbl)).take_all()
        return {r["user_id"]: r["butterflies"] for r in res}

    def test_planted(self, ray_session):
        # pair (1,2) shares 3 groups -> C(3,2)=3 butterflies each side;
        # pair (1,5) shares 1 group -> 0; pair (2,5) shares 2 -> 1 each
        got = self._run([(1, 2, 3), (1, 5, 1), (2, 5, 2)])
        assert got == {1: 3, 2: 4, 5: 1}

    def test_matches_bipartite_bruteforce(self, ray_session):
        # brute-force butterflies from a random user x group incidence
        rng = np.random.RandomState(13)
        inc = {(int(u), int(g)) for u, g in
               zip(rng.randint(0, 12, 300), rng.randint(0, 8, 300))}
        users = sorted({u for u, _ in inc})
        c = {}
        for i, u in enumerate(users):
            for v in users[i + 1:]:
                shared = sum(1 for (uu, g) in inc if uu == u and (v, g) in inc)
                if shared:
                    c[(u, v)] = shared
        expect = {}
        for (u, v), s in c.items():
            bf = s * (s - 1) // 2
            if bf:
                expect[u] = expect.get(u, 0) + bf
                expect[v] = expect.get(v, 0) + bf
        got = self._run([(u, v, s) for (u, v), s in sorted(c.items())])
        assert got == expect


class TestPagerank:
    """Generic-graph PageRank (stages/graph.py pagerank_scores):
    integer-exact power iteration vs a numpy reference on the same
    quantized recurrence, plus symmetry/determinism invariants."""

    @staticmethod
    def _run(pair_rows, iters=3):
        import ray.data

        from osm_export_tool_python_ray.stages.graph import pagerank_scores

        tbl = pa.table(
            {
                "user_a": pa.array([r[0] for r in pair_rows], type=pa.int64()),
                "user_b": pa.array([r[1] for r in pair_rows], type=pa.int64()),
                "n_shared": pa.array([r[2] for r in pair_rows], type=pa.int64()),
            }
        )
        res = pagerank_scores(ray.data.from_arrow(tbl), iters=iters).take_all()
        return {r["node"]: r["score"] for r in res}

    @staticmethod
    def _reference(pair_rows, iters=3, base=150_000, s0=1_000_000):
        # same integer recurrence, dense numpy
        edges = {}
        for a, b, w in pair_rows:
            edges[(a, b)] = edges.get((a, b), 0) + w
            edges[(b, a)] = edges.get((b, a), 0) + w
        nodes = sorted({n for e in edges for n in e})
        wdeg = {n: sum(w for (s, _d), w in edges.items() if s == n) for n in nodes}
        s = {n: s0 for n in nodes}
        for _ in range(iters):
            nxt = {}
            for v in nodes:
                tot = 0
                for (u, d), w in edges.items():
                    if d == v:
                        tot += (85 * s[u] * w) // (100 * wdeg[u])
                nxt[v] = base + tot
            s = nxt
        return s

    def test_matches_dense_reference(self, ray_session):
        rng = np.random.RandomState(7)
        pairs = []
        seen = set()
        for _ in range(60):
            a, b = sorted(rng.randint(0, 15, 2))
            if a == b or (a, b) in seen:
                continue
            seen.add((a, b))
            pairs.append((int(a), int(b), int(rng.randint(1, 5))))
        assert self._run(pairs) == self._reference(pairs)

    def test_star_symmetry(self, ray_session):
        # leaves of a uniform star get identical scores; hub dominates
        got = self._run([(0, i, 1) for i in range(1, 6)])
        leaf_scores = {got[i] for i in range(1, 6)}
        assert len(leaf_scores) == 1
        assert got[0] > got[1]

    def test_parallelism_determinism(self, ray_session):
        pairs = [(i % 9, (i * 7 + 1) % 9, 1 + i % 3) for i in range(30)
                 if i % 9 != (i * 7 + 1) % 9]
        a = self._run(pairs, iters=2)
        b = self._run(pairs, iters=2)
        assert a == b


class TestKCore:
    """kcore_members vs a brute-force sequential peel, on graphs chosen
    for deep/adversarial peel behavior."""

    @staticmethod
    def _brute(edges, k):
        edges = {(min(a, b), max(a, b)) for a, b in edges}
        while True:
            deg = {}
            for a, b in edges:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            alive = {n for n, d in deg.items() if d >= k}
            ne = {(a, b) for a, b in edges if a in alive and b in alive}
            if ne == edges:
                return sorted((n, deg[n]) for n in alive)
            edges = ne
            if not edges:
                return []

    @staticmethod
    def _run(edges, k, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.graph import kcore_members

        t = pa.table(
            {
                "user_a": pa.array([a for a, _ in edges], type=pa.int64()),
                "user_b": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
        out = kcore_members(ray.data.from_arrow(t), k, num_buckets=4, **kw)
        rows = out.to_pylist() if isinstance(out, pa.Table) else out.take_all()
        return sorted((r["node"], r["deg"]) for r in rows)

    def test_path_graph_peels_layer_by_layer(self, ray_session):
        # P12 with k=2: ends peel one per round — the deep sequential
        # case (11 rounds to empty); guards the fixpoint loop, not just
        # one-shot filtering
        edges = [(i, i + 1) for i in range(11)]
        assert self._run(edges, 2) == self._brute(edges, 2) == []

    def test_clique_with_tails(self, ray_session):
        # K5 (survives k=3) + two tails and a pendant triangle (peel)
        edges = list(combinations(range(5), 2))
        edges += [(4, 10), (10, 11), (11, 12)]  # tail
        edges += [(0, 20), (20, 21), (21, 0)]  # pendant triangle (deg 2)
        got = self._run(edges, 3)
        assert got == self._brute(edges, 3)
        assert {n for n, _ in got} == {0, 1, 2, 3, 4}
        assert all(d == 4 for _, d in got)

    def test_two_components_different_fates(self, ray_session):
        edges = list(combinations(range(4), 2))  # K4: survives k=3
        edges += [(100 + i, 100 + j) for i, j in [(0, 1), (1, 2), (2, 0), (2, 3)]]
        got = self._run(edges, 3)
        assert got == self._brute(edges, 3)
        assert {n for n, _ in got} == {0, 1, 2, 3}

    def test_randomized_equivalence(self, ray_session):
        rng = np.random.default_rng(11)
        for k in (2, 3, 4):
            m = rng.integers(0, 40, size=(60, 2))
            edges = [(int(a), int(b)) for a, b in m if a != b]
            assert self._run(edges, k) == self._brute(edges, k)

    def test_max_rounds_cap_counts(self, ray_session):
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        edges = [(i, i + 1) for i in range(11)]
        snapshot_caps()
        self._run(edges, 2, max_rounds=2)  # P12 needs ~11 rounds
        caps = snapshot_caps()
        assert caps.get("kcore_unconverged_rounds", 0) >= 1


class TestGraphWalks:
    """graph_walks vs a sequential brute-force walker using the same
    mix64 step rule."""

    P = 0x9E3779B97F4A7C15

    @classmethod
    def _brute(cls, edges, length=4):
        from osm_export_tool_python_ray.functions.text import _mix64

        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        adj = {n: sorted(v) for n, v in adj.items()}
        out = []
        for n in sorted(adj):
            cur = n
            out.append((n, 0, n))
            for s in range(1, length + 1):
                h = int(
                    _mix64(
                        np.uint64(n) * np.uint64(cls.P) ^ np.uint64(s)
                    )
                ) % len(adj[cur])
                cur = adj[cur][h]
                out.append((n, s, cur))
        return sorted(out)

    @staticmethod
    def _run(edges, length=4, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.graph import graph_walks

        t = pa.table(
            {
                "user_a": pa.array([a for a, _ in edges], type=pa.int64()),
                "user_b": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
        rows = graph_walks(ray.data.from_arrow(t), length=length, **kw).take_all()
        return sorted((r["walk"], r["step"], r["node"]) for r in rows)

    def test_star_and_path(self, ray_session):
        edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12)]
        assert self._run(edges) == self._brute(edges)

    def test_randomized_and_parallelism_invariance(self, ray_session):
        rng = np.random.default_rng(5)
        m = rng.integers(0, 30, size=(50, 2))
        edges = [(int(a), int(b)) for a, b in m if a != b]
        want = self._brute(edges, length=5)
        assert self._run(edges, length=5, num_buckets=2) == want
        assert self._run(edges, length=5, num_buckets=16) == want

    def test_deg_one_node_bounces(self, ray_session):
        # pendant node: every odd step returns to its only neighbor
        edges = [(1, 2), (2, 3), (3, 1), (3, 99)]
        got = self._run(edges, length=4)
        assert got == self._brute(edges, length=4)
        w99 = {(s, n) for w, s, n in got if w == 99}
        assert (1, 3) in w99  # deg(99)=1 → first hop must be 3
