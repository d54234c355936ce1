"""Z-order curve kernels: Morton encode, quadtree rectangle
decomposition, interval membership — verified against INDEPENDENT
characterizations (per-bit scalar interleave; brute-force rectangle
scan over the full domain), per the geometry-kernel test pattern."""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.zorder import (
    BITS,
    decompose_rect,
    interval_bounds,
    morton_encode,
    zorder_range_query,
)


def _morton_scalar(x, y, bits=BITS):
    # independent characterization: build the binary string by hand
    s = ""
    for b in range(bits - 1, -1, -1):
        s += str((y >> b) & 1) + str((x >> b) & 1)
    return int(s, 2)


class TestMortonEncode:
    def test_matches_scalar_characterization(self):
        rng = np.random.default_rng(7)
        x = rng.integers(0, 1 << BITS, 500)
        y = rng.integers(0, 1 << BITS, 500)
        m = morton_encode(x, y)
        for i in range(len(x)):
            assert m[i] == _morton_scalar(int(x[i]), int(y[i]))

    def test_is_injective_on_domain(self):
        n = 1 << BITS
        xx, yy = np.meshgrid(np.arange(n), np.arange(n))
        m = morton_encode(xx.ravel(), yy.ravel())
        assert len(np.unique(m)) == n * n
        assert m.min() == 0 and m.max() == (1 << (2 * BITS)) - 1


class TestDecomposeRect:
    def _brute(self, xlo, xhi, ylo, yhi):
        n = 1 << BITS
        xx, yy = np.meshgrid(np.arange(n), np.arange(n))
        xx, yy = xx.ravel(), yy.ravel()
        inside = (xx >= xlo) & (xx <= xhi) & (yy >= ylo) & (yy <= yhi)
        return set(morton_encode(xx[inside], yy[inside]).tolist())

    def _covered(self, intervals):
        out = set()
        for lo, hi in intervals:
            out.update(range(lo, hi + 1))
        return out

    def test_exact_cover_random_rects(self):
        rng = np.random.default_rng(11)
        for _ in range(25):
            x = np.sort(rng.integers(0, 1 << BITS, 2))
            y = np.sort(rng.integers(0, 1 << BITS, 2))
            ivs = decompose_rect(int(x[0]), int(x[1]), int(y[0]), int(y[1]))
            assert self._covered(ivs) == self._brute(
                int(x[0]), int(x[1]), int(y[0]), int(y[1])
            )
            # disjoint, sorted, non-adjacent (merged)
            for (a, b), (c, d) in zip(ivs, ivs[1:]):
                assert b + 1 < c

    def test_full_domain_is_one_interval(self):
        top = (1 << BITS) - 1
        assert decompose_rect(0, top, 0, top) == [(0, (1 << (2 * BITS)) - 1)]

    def test_single_cell(self):
        assert decompose_rect(5, 5, 9, 9) == [
            (_morton_scalar(5, 9), _morton_scalar(5, 9))
        ]

    def test_membership_bounds(self):
        ivs = decompose_rect(23, 61, 17, 76)
        bounds = interval_bounds(ivs)
        m = np.arange(1 << (2 * BITS))
        member = (np.searchsorted(bounds, m, side="right") & 1) == 1
        assert set(m[member].tolist()) == self._brute(23, 61, 17, 76)


class TestZorderRangeQuery:
    def test_matches_rect_filter(self, ray_session):
        import ray.data

        eid = np.arange(0, 4000, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"event_id": pa.array(eid)}))
        out = zorder_range_query(ds, 23, 61, 17, 76).take_all()
        x = eid % 100
        y = (eid // 7) % 100
        inside = (x >= 23) & (x <= 61) & (y >= 17) & (y <= 76)
        m = morton_encode(x[inside], y[inside])
        q = m >> 6
        exp = {}
        for qi, ei in zip(q.tolist(), eid[inside].tolist()):
            n, s = exp.get(qi, (0, 0))
            exp[qi] = (n + 1, s + ei)
        got = {r["qkey"]: (r["n"], r["id_sum"]) for r in out}
        assert got == exp


class TestHilbert:
    def test_bijective_and_unit_step(self):
        from osm_export_tool_python_ray.stages.zorder import hilbert_d

        n = 1 << BITS
        xx, yy = np.meshgrid(np.arange(n), np.arange(n))
        xx, yy = xx.ravel(), yy.ravel()
        d = hilbert_d(xx, yy)
        # bijection onto [0, n^2)
        assert len(np.unique(d)) == n * n
        assert d.min() == 0 and d.max() == n * n - 1
        # consecutive curve positions are grid-adjacent (the defining
        # property — an independent characterization, not a re-run of
        # the recurrence)
        order = np.argsort(d)
        steps = np.abs(np.diff(xx[order])) + np.abs(np.diff(yy[order]))
        assert (steps == 1).all()

    def test_decomposition_exact_cover(self):
        from osm_export_tool_python_ray.stages.zorder import (
            decompose_rect_hilbert,
            hilbert_d,
        )

        n = 1 << BITS
        xx, yy = np.meshgrid(np.arange(n), np.arange(n))
        xx, yy = xx.ravel(), yy.ravel()
        d = hilbert_d(xx, yy)
        rng = np.random.default_rng(3)
        for _ in range(20):
            a = np.sort(rng.integers(0, n, 2))
            b = np.sort(rng.integers(0, n, 2))
            ivs = decompose_rect_hilbert(int(a[0]), int(a[1]), int(b[0]), int(b[1]))
            cov = set()
            for lo, hi in ivs:
                cov.update(range(lo, hi + 1))
            inside = (xx >= a[0]) & (xx <= a[1]) & (yy >= b[0]) & (yy <= b[1])
            assert cov == set(d[inside].tolist())
            for (p, q), (r, s) in zip(ivs, ivs[1:]):
                assert q + 1 < r  # disjoint, merged

    def test_locality_beats_morton(self):
        # the reason a 100 TB table sorts by Hilbert rather than Z:
        # fewer intervals per rectangle on average
        from osm_export_tool_python_ray.stages.zorder import (
            decompose_rect,
            decompose_rect_hilbert,
        )

        rng = np.random.default_rng(9)
        nz = nh = 0
        for _ in range(50):
            a = np.sort(rng.integers(0, 1 << BITS, 2))
            b = np.sort(rng.integers(0, 1 << BITS, 2))
            nz += len(decompose_rect(int(a[0]), int(a[1]), int(b[0]), int(b[1])))
            nh += len(
                decompose_rect_hilbert(int(a[0]), int(a[1]), int(b[0]), int(b[1]))
            )
        assert nh < nz

    def test_range_query_matches_rect(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.stages.zorder import (
            hilbert_d,
            hilbert_range_query,
        )

        eid = np.arange(0, 4000, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"event_id": pa.array(eid)}))
        out = hilbert_range_query(ds, 23, 61, 17, 76).take_all()
        x, y = eid % 100, (eid // 7) % 100
        inside = (x >= 23) & (x <= 61) & (y >= 17) & (y <= 76)
        q = hilbert_d(x[inside], y[inside]) >> 6
        exp = {}
        for qi, ei in zip(q.tolist(), eid[inside].tolist()):
            n, s = exp.get(qi, (0, 0))
            exp[qi] = (n + 1, s + ei)
        got = {r["qkey"]: (r["n"], r["id_sum"]) for r in out}
        assert got == exp
