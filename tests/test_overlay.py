"""Exact snapped-integer overlay (functions/overlay.py): hand-built
degenerate configurations, Monte-Carlo membership oracle on coarse-grid
polygons (degeneracy-rich), and float-GH agreement on generic inputs.
This replaced the 1e-9 nudge retry — the README known-gap."""

import numpy as np
import pytest

from osm_export_tool_python_ray.functions.kernels import ring_intersection
from osm_export_tool_python_ray.functions.overlay import ring_intersection_exact


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


def area(rings):
    t = 0.0
    for r in rings:
        x, y = r[:, 0], r[:, 1]
        t += 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    return t


def pip(px, py, rings):
    inside = False
    for r in rings:
        x, y = r[:-1, 0], r[:-1, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cond = (y > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x) * (py - y) / (y2 - y) + x
        if int((cond & (px < xint)).sum()) % 2 == 1:
            inside = not inside
    return inside


def is_simple(P):
    P = np.array(P, float)
    n = len(P)
    for i in range(n):
        for j in range(i + 1, n):
            if (j + 1) % n == i or (i + 1) % n == j:
                continue
            p, q, a, b = P[i], P[(i + 1) % n], P[j], P[(j + 1) % n]
            r = q - p
            e = b - a
            d = r[0] * e[1] - r[1] * e[0]
            if abs(d) < 1e-15:
                continue
            w = a - p
            t = (w[0] * e[1] - w[1] * e[0]) / d
            u = (w[0] * r[1] - w[1] * r[0]) / d
            if 1e-12 < t < 1 - 1e-12 and 1e-12 < u < 1 - 1e-12:
                return False
    return True


def star_poly(rng, n, cx, cy, rmax, grid):
    """Random SIMPLE star polygon with vertices snapped to ``grid``
    (max angular gap bounded so the closing edge cannot wander)."""
    for _ in range(60):
        angs = np.sort(rng.uniform(0, 2 * np.pi, n))
        gaps = np.diff(np.append(angs, angs[0] + 2 * np.pi))
        if gaps.max() > np.pi * 0.9:
            continue
        rad = rng.uniform(rmax * 0.3, rmax, n)
        xs = np.round((cx + rad * np.cos(angs)) / grid) * grid
        ys = np.round((cy + rad * np.sin(angs)) / grid) * grid
        P = np.stack([xs, ys], axis=1)
        if len(np.unique(P, axis=0)) == len(P) and is_simple(P):
            return P
    return None


class TestHandCases:
    CASES = [
        ("generic overlap", sq(0, 0, 2, 2), sq(1, 1, 3, 3), 1.0),
        ("identical", sq(0, 0, 2, 2), sq(0, 0, 2, 2), 4.0),
        ("shared edge adjacent", sq(0, 0, 2, 2), sq(2, 0, 4, 2), 0.0),
        ("corner touch", sq(0, 0, 2, 2), sq(2, 2, 4, 4), 0.0),
        ("contained", sq(0, 0, 4, 4), sq(1, 1, 2, 2), 1.0),
        ("partial collinear overlap", sq(0, 0, 2, 2), sq(1, 0, 3, 2), 2.0),
        (
            "vertex on edge outside",
            sq(0, 0, 2, 2),
            np.array([[2, 1], [4, 0], [4, 2]], float),
            0.0,
        ),
        (
            "inscribed square in diamond",
            np.array([[-2, 0], [0, -2], [2, 0], [0, 2]], float),
            sq(-1, -1, 1, 1),
            4.0,
        ),
        (
            "T vertex overlap",
            sq(0, 0, 4, 2),
            np.array([[1, 0], [3, 0], [2, 2]], float),
            2.0,
        ),
        ("disjoint", sq(0, 0, 1, 1), sq(5, 5, 6, 6), 0.0),
    ]

    @pytest.mark.parametrize("name,a,b,expect", CASES, ids=[c[0] for c in CASES])
    def test_case_and_symmetry(self, name, a, b, expect):
        assert area(ring_intersection_exact(a, b)) == pytest.approx(expect, abs=1e-9)
        assert area(ring_intersection_exact(b, a)) == pytest.approx(expect, abs=1e-9)

    def test_result_rings_are_ccw_closed(self):
        out = ring_intersection_exact(sq(0, 0, 2, 2), sq(1, 1, 3, 3))
        for r in out:
            assert np.allclose(r[0], r[-1])
            x, y = r[:, 0], r[:, 1]
            assert np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]) > 0  # CCW

    def test_orientation_invariance(self):
        a, b = sq(0, 0, 2, 2), sq(1, 0, 3, 2)
        assert area(ring_intersection_exact(a[::-1], b)) == pytest.approx(2.0)
        assert area(ring_intersection_exact(a, b[::-1])) == pytest.approx(2.0)


class TestMonteCarlo:
    def test_grid_membership_oracle(self):
        """On coarse grids vertices routinely coincide with the other
        ring's vertices/edges: for sample points away from all
        boundaries, membership in the overlay must equal (in A) ∧
        (in B)."""
        rng = np.random.RandomState(42)
        checked = 0
        for trial in range(60):
            grid = [1.0, 0.5, 0.25][trial % 3]
            A = star_poly(rng, rng.randint(4, 10), 0, 0, 5, grid)
            B = star_poly(
                rng, rng.randint(4, 10), rng.uniform(-2, 2), rng.uniform(-2, 2), 5, grid
            )
            if A is None or B is None:
                continue
            Ac = np.vstack([A, A[:1]])
            Bc = np.vstack([B, B[:1]])
            out = ring_intersection_exact(A, B)
            for _ in range(30):
                px, py = rng.uniform(-6, 6), rng.uniform(-6, 6)
                if _near_boundary(px, py, Ac) or _near_boundary(px, py, Bc):
                    continue
                checked += 1
                assert pip(px, py, out) == (pip(px, py, [Ac]) and pip(px, py, [Bc]))
        assert checked > 800

    def test_agrees_with_float_path_on_generic_inputs(self):
        rng = np.random.RandomState(7)
        n_done = 0
        for _ in range(40):
            A = star_poly(rng, rng.randint(4, 9), 0, 0, 5, 1e-9)
            B = star_poly(
                rng, rng.randint(4, 9), rng.uniform(-2, 2), rng.uniform(-2, 2), 5, 1e-9
            )
            if A is None or B is None:
                continue
            n_done += 1
            a1 = area(ring_intersection(A, B))
            a2 = area(ring_intersection_exact(A, B))
            assert abs(a1 - a2) <= 1e-6 * max(a1, a2, 1.0)
        assert n_done > 30


def _near_boundary(px, py, ring, eps=1e-6):
    p = np.array([px, py])
    r = np.asarray(ring)
    for i in range(len(r) - 1):
        a, b = r[i], r[i + 1]
        ab = b - a
        t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-30), 0, 1)
        if np.linalg.norm(p - (a + t * ab)) < eps:
            return True
    return False


class TestDegenerateRouting:
    """ring_intersection must route degenerate inputs to the exact
    overlay — results are now exact, not nudged."""

    def test_shared_edge_result_coordinates_are_exact(self):
        clip = sq(0, 0, 10, 10)
        subj = sq(2, 0, 8, 3)  # shares part of the clip's bottom edge
        out = ring_intersection(subj, clip)
        assert area(out) == pytest.approx(18.0, abs=1e-12)
        # no 1e-9 perturbation leaks into the output coordinates
        pts = np.vstack(out)
        assert np.all(pts == np.round(pts * 2**32) / 2**32)
        assert {(2.0, 0.0), (8.0, 0.0), (8.0, 3.0), (2.0, 3.0)} <= {
            (x, y) for x, y in pts.tolist()
        }

    def test_vertex_on_edge_exact(self):
        clip = sq(0, 0, 10, 10)
        subj = np.array([[5, 5], [10, 5], [5, 9]], float)
        out = ring_intersection(subj, clip)
        assert area(out) == pytest.approx(10.0, abs=1e-9)
