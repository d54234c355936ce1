"""Exact snapped-integer polygon intersection for degenerate inputs.

The fast float Greiner–Hormann in ``kernels.ring_intersection`` handles
the generic case; configurations it cannot (vertex exactly on the other
ring, shared/collinear edges, vertex-on-vertex touches) used to be
retried with a 1e-9 coordinate nudge — a perturbation that leaked into
output coordinates and could flip near-boundary containment. This module
replaces the nudge with an EXACT overlay in the snap-rounding spirit:

1. snap both rings to an integer grid (2^-32 degrees ≈ 25 μm at the
   equator — far below OSM's 1e-7-degree coordinate resolution), making
   every later comparison exact integer/rational arithmetic;
2. split every edge of each ring at every intersection with the other
   ring's edges — proper crossings AND collinear-overlap endpoints —
   with `fractions.Fraction` parameters (no rounding);
3. classify each sub-edge by its midpoint: strictly inside the other
   ring → kept; ON the other boundary → kept once iff the two boundaries
   run the same direction there (interiors locally agree), subject copy
   wins; outside → dropped;
4. stitch kept directed sub-edges into result rings with the DCEL
   face-walk rule (next edge = first outgoing clockwise from the
   reversed incoming direction — exact angular comparator), dropping
   zero-area rings.

Every decision is an exact predicate on grid integers / rationals, so
degenerate configurations are ordinary cases, not perturbation targets.
The float path remains the hot path; this runs only when the float pass
detects degeneracy (see kernels.ring_intersection). Public-knowledge
basis: classic snap rounding + planar-overlay face extraction (e.g.
Foster, Hormann & Popa 2019 motivate the degeneracy taxonomy; the
split/classify/stitch structure here is the textbook overlay approach).

The intersection of two Jordan-curve interiors has no holes (every
complement point reaches infinity inside one exterior), so all result
rings are CCW outers — a CW ring here would be a bug and is dropped
with an assertion in tests.
"""

import functools
from fractions import Fraction

import numpy as np

SNAP_SCALE = 1 << 32  # grid step 2^-32 deg; OSM native resolution is 1e-7


def snap_ring(ring, scale=SNAP_SCALE):
    """Float (N,2) ring → list of (int, int) grid points, consecutive
    duplicates collapsed, closing duplicate removed."""
    pts = []
    for x, y in np.asarray(ring, dtype=np.float64):
        p = (round(float(x) * scale), round(float(y) * scale))
        if not pts or pts[-1] != p:
            pts.append(p)
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts.pop()
    return pts


def _shoelace2(pts):
    """Twice the signed area of an open ring of exact points."""
    s = 0
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _orient_ccw(pts):
    return pts if _shoelace2(pts) >= 0 else pts[::-1]


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _edge_splits(p, q, other_edges):
    """Exact split parameters t ∈ [0,1] (Fractions) of segment p→q at
    every intersection with ``other_edges`` (list of point pairs):
    proper/endpoint crossings and collinear-overlap endpoints."""
    px, py = p
    qx, qy = q
    rx, ry = qx - px, qy - py
    ts = set()
    for a, b in other_edges:
        ax, ay = a
        bx, by = b
        ex, ey = bx - ax, by - ay
        denom = rx * ey - ry * ex
        wx, wy = ax - px, ay - py
        if denom != 0:
            t = Fraction(wx * ey - wy * ex, denom)
            u = Fraction(wx * ry - wy * rx, denom)
            if 0 <= t <= 1 and 0 <= u <= 1:
                ts.add(t)
        else:
            # parallel; collinear iff a lies on the p→q support line
            if wx * ry - wy * rx != 0:
                continue
            den = rx * rx + ry * ry
            if den == 0:
                continue
            ta = Fraction((ax - px) * rx + (ay - py) * ry, den)
            tb = Fraction((bx - px) * rx + (by - py) * ry, den)
            lo, hi = (ta, tb) if ta <= tb else (tb, ta)
            lo = max(lo, Fraction(0))
            hi = min(hi, Fraction(1))
            if lo <= hi:
                ts.add(lo)
                ts.add(hi)
    ts.discard(Fraction(0))
    ts.discard(Fraction(1))
    return sorted(ts)


def _point_on_param(p, q, t):
    px, py = p
    qx, qy = q
    return (px + t * (qx - px), py + t * (qy - py))


def _locate(mx, my, pts):
    """Exact even-odd location of rational point (mx,my) vs integer ring:
    returns 1 inside, 0 on boundary, -1 outside."""
    n = len(pts)
    for i in range(n):
        ax, ay = pts[i]
        bx, by = pts[(i + 1) % n]
        if _cross(ax, ay, bx, by, mx, my) == 0:
            if min(ax, bx) <= mx <= max(ax, bx) and min(ay, by) <= my <= max(ay, by):
                return 0
    inside = False
    for i in range(n):
        ax, ay = pts[i]
        bx, by = pts[(i + 1) % n]
        if (ay > my) != (by > my):
            xint = Fraction(bx - ax) * (my - ay) / (by - ay) + ax
            if mx < xint:
                inside = not inside
    return 1 if inside else -1


def _on_same_direction(m, d, pts):
    """For midpoint m ON ring boundary: True iff the containing ring edge
    runs in the same direction as sub-edge direction d (dot > 0)."""
    n = len(pts)
    mx, my = m
    dx, dy = d
    for i in range(n):
        ax, ay = pts[i]
        bx, by = pts[(i + 1) % n]
        if _cross(ax, ay, bx, by, mx, my) == 0 and min(ax, bx) <= mx <= max(
            ax, bx
        ) and min(ay, by) <= my <= max(ay, by):
            ex, ey = bx - ax, by - ay
            # sub-edge must be collinear with this edge to compare
            if ex * dy - ey * dx == 0:
                return ex * dx + ey * dy > 0
    return False


def _sub_edges(pts, other_pts, is_subject):
    """Directed kept sub-edges of ring ``pts`` for the intersection with
    ``other_pts``: split at all intersections, keep those whose midpoint
    is strictly inside the other ring, plus (subject ring only) those on
    the other boundary running the same direction."""
    other_edges = [
        (other_pts[i], other_pts[(i + 1) % len(other_pts)])
        for i in range(len(other_pts))
    ]
    kept = []
    n = len(pts)
    for i in range(n):
        p, q = pts[i], pts[(i + 1) % n]
        cuts = [Fraction(0)] + _edge_splits(p, q, other_edges) + [Fraction(1)]
        for t0, t1 in zip(cuts[:-1], cuts[1:]):
            a = _point_on_param(p, q, t0)
            b = _point_on_param(p, q, t1)
            if a == b:
                continue
            mid = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
            loc = _locate(mid[0], mid[1], other_pts)
            if loc == 1:
                kept.append((a, b))
            elif loc == 0 and is_subject:
                d = (b[0] - a[0], b[1] - a[1])
                if _on_same_direction(mid, d, other_pts):
                    kept.append((a, b))
    return kept


def _angle_band(ref, v):
    """Band index of the exact CCW angle θ(v) from ref, θ ∈ (0°, 360°]:
    0:(0,180) left half · 1:=180 · 2:(180,360) right half; exact-back
    along ref (θ=360) cannot occur among kept edges (a kept edge and its
    reverse would need the interior on both sides) — ordered FIRST (-1)
    defensively so it is never preferred over a real continuation."""
    cr = ref[0] * v[1] - ref[1] * v[0]
    dt = ref[0] * v[0] + ref[1] * v[1]
    if cr > 0:
        return 0
    if cr == 0:
        return 1 if dt < 0 else -1
    return 2


def _cmp_ccw_from_ref(ref, u, v):
    """Exact comparator: -1 if θ(u) < θ(v) measured CCW from ref (both
    rational vectors). Within an open half-plane band, θ(u) < θ(v) ⟺
    cross(u, v) > 0."""
    bu, bv = _angle_band(ref, u), _angle_band(ref, v)
    if bu != bv:
        return -1 if bu < bv else 1
    cr = u[0] * v[1] - u[1] * v[0]
    if cr == 0:
        return 0
    return -1 if cr > 0 else 1


def _stitch(edges):
    """Kept directed sub-edges → list of CCW rings (lists of exact
    points). Junctions resolved with the DCEL face-walk rule."""
    out_map = {}
    for a, b in edges:
        out_map.setdefault(a, []).append((a, b, [False]))
    rings = []
    all_entries = [e for lst in out_map.values() for e in lst]
    for entry in all_entries:
        if entry[2][0]:
            continue
        ring = []
        cur = entry
        guard = 0
        closed = False
        while guard <= len(all_entries):
            guard += 1
            cur[2][0] = True
            a, b, _ = cur
            ring.append(a)
            if b == entry[0]:
                closed = True
                break
            cands = [e for e in out_map.get(b, []) if not e[2][0]]
            if not cands:
                break
            if len(cands) == 1:
                cur = cands[0]
            else:
                # DCEL interior-left face walk: continue with the outgoing
                # edge immediately CLOCKWISE from the reversed incoming
                # direction, i.e. the LARGEST CCW angle from it (< 360°)
                rev = (a[0] - b[0], a[1] - b[1])
                cur = max(
                    cands,
                    key=functools.cmp_to_key(
                        lambda e1, e2: _cmp_ccw_from_ref(
                            rev,
                            (e1[1][0] - e1[0][0], e1[1][1] - e1[0][1]),
                            (e2[1][0] - e2[0][0], e2[1][1] - e2[0][1]),
                        )
                    ),
                )
        if closed and len(ring) >= 3 and _shoelace2(ring) > 0:
            rings.append(ring)
    return rings


def ring_intersection_exact(subject, clip, scale=SNAP_SCALE):
    """Exact intersection of two float rings via the snapped-integer
    overlay → list of closed float (N,2) CCW rings. Handles every
    degenerate configuration deterministically; zero-area touches
    (shared edges with opposite interiors, single-point contacts)
    yield []. Either input may be open/closed, any orientation."""
    subj = _orient_ccw(snap_ring(subject, scale))
    clp = _orient_ccw(snap_ring(clip, scale))
    if len(subj) < 3 or len(clp) < 3:
        return []
    kept = _sub_edges(subj, clp, is_subject=True) + _sub_edges(
        clp, subj, is_subject=False
    )
    if not kept:
        # no boundary of either lies inside/on the other's interior side:
        # either disjoint or one strictly contains the other. An edge
        # midpoint is off the shared boundary unless rings coincide.
        for ring, other in ((subj, clp), (clp, subj)):
            n = len(ring)
            for i in range(n):
                a, b = ring[i], ring[(i + 1) % n]
                mid = (Fraction(a[0] + b[0], 2), Fraction(a[1] + b[1], 2))
                loc = _locate(mid[0], mid[1], other)
                if loc == 1:
                    return [_to_float_ring(ring, scale)]
                if loc == -1:
                    break
            else:
                # every midpoint ON the other boundary → identical rings
                return [_to_float_ring(ring, scale)]
        return []
    rings = _stitch(kept)
    return [_to_float_ring(r, scale) for r in rings]


def _to_float_ring(pts, scale):
    arr = np.array(
        [[float(x) / scale, float(y) / scale] for (x, y) in pts], dtype=np.float64
    )
    return np.vstack([arr, arr[:1]])
