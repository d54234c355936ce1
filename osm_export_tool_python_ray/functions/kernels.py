"""Geometry kernels: point-in-polygon, clipping, centroid — pure NumPy.

These replace the reference's shapely prepared-geometry operations
(reference tabular.py:259-261,271-274,294-300,321-327):

* ``PreparedPolygon.contains_points`` — STRICT containment; points exactly
  on the boundary are dropped, matching shapely ``prep(g).contains`` for
  points (reference tabular.py:271-274 / FIXTURES.md F3).
* ``intersects_*`` + ``contains_properly_*`` + ``clip_*`` — the
  intersects → contains_properly → intersection cascade for lines and
  polygons (reference tabular.py:294-300,321-327): geometries touching the
  boundary are KEPT and clipped.

Point tests are vectorized over whole batches (chunked crossing-parity);
line/polygon clipping runs per matched feature with NumPy inner loops
(clipping only runs on the small subset of features that straddle the AOI
boundary). Polygon∩polygon is a Greiner–Hormann traversal; geometries whose
vertices lie exactly on the clip boundary are retried with a 1e-9 nudge.
"""

import numpy as np

_EPS = 1e-12


def bbox_of(coords):
    c = np.asarray(coords, dtype=np.float64)
    return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())


def signed_area(ring):
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def ensure_closed(ring):
    r = np.asarray(ring, dtype=np.float64)
    if len(r) == 0 or np.array_equal(r[0], r[-1]):
        return r
    return np.vstack([r, r[:1]])


def ensure_open(ring):
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and np.array_equal(r[0], r[-1]):
        return r[:-1]
    return r


def orient(ring, ccw=True):
    r = np.asarray(ring, dtype=np.float64)
    if (signed_area(r) > 0) != ccw:
        return r[::-1].copy()
    return r


def polygon_centroid(polygons):
    """Area-weighted centroid of a multipolygon (holes subtract); matches
    OGR ``Centroid()`` for valid polygons (reference tabular.py:333)."""
    a_sum = cx_sum = cy_sum = 0.0
    for rings in polygons:
        for i, ring in enumerate(rings):
            r = ensure_open(orient(ring, ccw=(i == 0)))
            x, y = r[:, 0], r[:, 1]
            x1, y1 = np.roll(x, -1), np.roll(y, -1)
            cross = x * y1 - x1 * y
            a = 0.5 * cross.sum()
            if abs(a) < _EPS:
                continue
            cx_sum += ((x + x1) * cross).sum() / 6.0
            cy_sum += ((y + y1) * cross).sum() / 6.0
            a_sum += a
    if abs(a_sum) < _EPS:
        # degenerate: fall back to vertex mean
        allpts = np.vstack([ensure_open(r) for rings in polygons for r in rings])
        return float(allpts[:, 0].mean()), float(allpts[:, 1].mean())
    return cx_sum / a_sum, cy_sum / a_sum


def _seg_intersections(p, q, ax, ay, bx, by):
    """Params t in (0,1) where segment p→q properly crosses any edge (a,b);
    also returns a flag when p→q touches an edge degenerately."""
    rx, ry = q[0] - p[0], q[1] - p[1]
    ex, ey = bx - ax, by - ay
    denom = rx * ey - ry * ex
    wx, wy = ax - p[0], ay - p[1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (wx * ey - wy * ex) / denom
        u = (wx * ry - wy * rx) / denom
    ok = (np.abs(denom) > _EPS) & (t > _EPS) & (t < 1 - _EPS) & (u >= -_EPS) & (u <= 1 + _EPS)
    return t[ok]


class PreparedPolygon:
    """Prepared AOI geometry: all ring edges concatenated for vectorized
    crossing-parity tests (stands in for ``shapely.prepared.prep``,
    reference tabular.py:259-261). ``polygons`` is a multipolygon:
    list of [exterior, *holes], each ring an (N,2) array."""

    def __init__(self, polygons):
        self.polygons = [
            [ensure_closed(np.asarray(r, dtype=np.float64)) for r in rings]
            for rings in polygons
        ]
        segs_a = []
        segs_b = []
        for rings in self.polygons:
            for ring in rings:
                r = ring
                segs_a.append(r[:-1])
                segs_b.append(r[1:])
        a = np.vstack(segs_a)
        b = np.vstack(segs_b)
        self.ax, self.ay = a[:, 0].copy(), a[:, 1].copy()
        self.bx, self.by = b[:, 0].copy(), b[:, 1].copy()
        allpts = np.vstack([r for rings in self.polygons for r in rings])
        self.bbox = (
            allpts[:, 0].min(),
            allpts[:, 1].min(),
            allpts[:, 0].max(),
            allpts[:, 1].max(),
        )
        # per-edge bboxes for the boundary test
        self._exmin = np.minimum(self.ax, self.bx) - _EPS
        self._exmax = np.maximum(self.ax, self.bx) + _EPS
        self._eymin = np.minimum(self.ay, self.by) - _EPS
        self._eymax = np.maximum(self.ay, self.by) + _EPS
        self._elen2 = (self.bx - self.ax) ** 2 + (self.by - self.ay) ** 2

    def point_status(self, xs, ys, chunk=4096):
        """0=outside, 1=inside, 2=on boundary; even-odd parity over every
        ring (holes handled automatically)."""
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        out = np.zeros(len(xs), dtype=np.int8)
        minx, miny, maxx, maxy = self.bbox
        cand = (xs >= minx) & (xs <= maxx) & (ys >= miny) & (ys <= maxy)
        idx = np.nonzero(cand)[0]
        ax, ay, bx, by = self.ax, self.ay, self.bx, self.by
        for s in range(0, len(idx), chunk):
            ii = idx[s : s + chunk]
            px = xs[ii][:, None]
            py = ys[ii][:, None]
            # boundary: |cross| tiny and inside the edge bbox
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            onb = (
                (np.abs(cross) <= 1e-9 * np.maximum(self._elen2, 1.0))
                & (px >= self._exmin)
                & (px <= self._exmax)
                & (py >= self._eymin)
                & (py <= self._eymax)
            ).any(axis=1)
            # crossing parity (ray to +x)
            cond = (ay > py) != (by > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (bx - ax) * (py - ay) / (by - ay) + ax
            crossings = (cond & (px < xint)).sum(axis=1)
            inside = (crossings % 2) == 1
            res = np.zeros(len(ii), dtype=np.int8)
            res[inside] = 1
            res[onb] = 2
            out[ii] = res
        return out

    def classify_bboxes(self, minx, miny, maxx, maxy, sample_x, sample_y, chunk=2048):
        """Vectorized coarse classification of feature bboxes vs the AOI:

        0 = definitely no intersection (skip the feature)
        1 = feature wholly inside the AOI (keep unclipped; contains_properly
            holds — the geometry cannot leave the AOI without crossing an
            edge, and no edge bbox overlaps the feature bbox)
        2 = an AOI edge's bbox overlaps the feature bbox → exact per-row
            cascade required.

        ``sample_x/y`` must be a point ON the feature geometry (e.g. its
        first vertex) — it decides inside vs outside for the edge-free
        cases. One (rows × edges) boolean matrix per chunk."""
        minx = np.asarray(minx, dtype=np.float64)
        miny = np.asarray(miny, dtype=np.float64)
        maxx = np.asarray(maxx, dtype=np.float64)
        maxy = np.asarray(maxy, dtype=np.float64)
        n = len(minx)
        out = np.zeros(n, dtype=np.int8)
        bx0, by0, bx1, by1 = self.bbox
        cand = (minx <= bx1) & (maxx >= bx0) & (miny <= by1) & (maxy >= by0)
        idx = np.nonzero(cand)[0]
        for s in range(0, len(idx), chunk):
            ii = idx[s : s + chunk]
            near = (
                (self._exmin[None, :] <= maxx[ii][:, None])
                & (self._exmax[None, :] >= minx[ii][:, None])
                & (self._eymin[None, :] <= maxy[ii][:, None])
                & (self._eymax[None, :] >= miny[ii][:, None])
            ).any(axis=1)
            res = np.zeros(len(ii), dtype=np.int8)
            res[near] = 2
            far = np.nonzero(~near)[0]
            if len(far):
                st = self.point_status(
                    np.asarray(sample_x)[ii[far]], np.asarray(sample_y)[ii[far]]
                )
                res[far] = (st == 1).astype(np.int8)
            out[ii] = res
        return out

    def contains_points(self, xs, ys):
        """Strict containment — boundary points excluded
        (parity with prep().contains, reference tabular.py:271-274)."""
        return self.point_status(xs, ys) == 1

    def _any_crossing(self, coords):
        coords = np.asarray(coords, dtype=np.float64)
        for i in range(len(coords) - 1):
            if len(_seg_intersections(coords[i], coords[i + 1], self.ax, self.ay, self.bx, self.by)):
                return True
        return False

    def intersects_line(self, coords):
        coords = np.asarray(coords, dtype=np.float64)
        st = self.point_status(coords[:, 0], coords[:, 1])
        if (st > 0).any():
            return True
        return self._any_crossing(coords)

    def contains_properly_line(self, coords):
        coords = np.asarray(coords, dtype=np.float64)
        st = self.point_status(coords[:, 0], coords[:, 1])
        if not (st == 1).all():
            return False
        return not self._any_crossing(coords)

    def clip_line(self, coords):
        """Line ∩ AOI → list of line parts (possibly MultiLineString;
        reference keeps the comment that a clipped way may become multi,
        tabular.py:285-288)."""
        coords = np.asarray(coords, dtype=np.float64)
        parts = []
        cur = None
        for i in range(len(coords) - 1):
            p, q = coords[i], coords[i + 1]
            ts = _seg_intersections(p, q, self.ax, self.ay, self.bx, self.by)
            cuts = np.concatenate([[0.0], np.sort(np.unique(ts)), [1.0]])
            for j in range(len(cuts) - 1):
                t0, t1 = cuts[j], cuts[j + 1]
                if t1 - t0 <= _EPS:
                    continue
                tm = 0.5 * (t0 + t1)
                mx, my = p[0] + tm * (q[0] - p[0]), p[1] + tm * (q[1] - p[1])
                if self.point_status([mx], [my])[0] == 0:
                    cur = None
                    continue
                a = p + t0 * (q - p)
                b = p + t1 * (q - p)
                if cur is not None and np.allclose(cur[-1], a, atol=1e-12):
                    cur.append(b)
                else:
                    cur = [a, b]
                    parts.append(cur)
        return [np.asarray(part) for part in parts if len(part) >= 2]

    def intersects_polygon(self, polygons):
        for rings in polygons:
            closed = [ensure_closed(r) for r in rings]
            # any subject boundary point (exterior OR hole ring) inside/on the
            # AOI, or any boundary crossing → the geometries intersect
            boundary_touch = False
            for r in closed:
                st = self.point_status(r[:, 0], r[:, 1])
                if (st > 0).any() or self._any_crossing(r):
                    boundary_touch = True
                    break
            if boundary_touch:
                return True
            # No boundary interaction: AOI is wholly inside subject material,
            # wholly inside a hole, or wholly outside. Even-odd parity of an
            # AOI sample point over the FULL ring set (exterior + holes)
            # distinguishes these — a point inside a hole has even parity, so
            # an AOI sitting entirely in a hole correctly reports no
            # intersection (shapely parity, reference tabular.py:323).
            px, py = float(self.ax[0]), float(self.ay[0])
            parity = 0
            for r in closed:
                if _ring_contains(r, (px, py)):
                    parity ^= 1
            if parity == 1:
                return True
        return False

    def contains_properly_polygon(self, polygons):
        for rings in polygons:
            for ring in rings:
                r = ensure_closed(ring)
                st = self.point_status(r[:, 0], r[:, 1])
                if not (st == 1).all():
                    return False
                if self._any_crossing(r):
                    return False
        return True

    def clip_polygon(self, polygons):
        """Multipolygon ∩ AOI → multipolygon (list of [ext, *holes]).

        Result polygons whose net area (exterior minus holes) is ~0 — e.g.
        when the AOI sits entirely inside a subject hole, so the clipped
        "hole" equals the clipped exterior — are dropped, matching shapely's
        empty intersection (reference tabular.py:323)."""
        results = []
        for cpoly in self.polygons:
            cext = cpoly[0]
            choles = cpoly[1:]
            for rings in polygons:
                sext = ensure_closed(rings[0])
                sholes = [ensure_closed(h) for h in rings[1:]]
                for out_ring in ring_intersection(sext, cext):
                    ext_area = abs(signed_area(out_ring))
                    holes = []
                    hole_area = 0.0
                    for h in sholes + list(choles):
                        for hr in ring_intersection(h, out_ring):
                            holes.append(hr)
                            hole_area += abs(signed_area(hr))
                    net = ext_area - hole_area
                    if net <= _EPS or net <= 1e-9 * ext_area:
                        continue
                    results.append([out_ring] + holes)
        return results


class _GHVertex:
    __slots__ = ("pt", "nxt", "prv", "inter", "entry", "twin", "visited", "t")

    def __init__(self, pt):
        self.pt = pt
        self.nxt = None
        self.prv = None
        self.inter = False
        self.entry = False
        self.twin = None
        self.visited = False
        self.t = 0.0


def _build_list(ring):
    verts = [_GHVertex(tuple(p)) for p in ring]
    n = len(verts)
    for i, v in enumerate(verts):
        v.nxt = verts[(i + 1) % n]
        v.prv = verts[(i - 1) % n]
    return verts


def _ring_contains(ring, pt):
    px, py = pt
    r = ensure_closed(ring)
    ax, ay = r[:-1, 0], r[:-1, 1]
    bx, by = r[1:, 0], r[1:, 1]
    cond = (ay > py) != (by > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (bx - ax) * (py - ay) / (by - ay) + ax
    return int((cond & (px < xint)).sum()) % 2 == 1


def ring_intersection(subject, clip, _retry=True):
    """Greiner–Hormann ring ∩ ring → list of rings (closed arrays).
    Both inputs may be open or closed, any orientation. Degenerate inputs
    (vertex exactly on the other ring, shared/collinear edges) are routed
    to the exact snapped-integer overlay (functions/overlay.py) instead of
    the float pass — deterministic, perturbation-free results; the former
    1e-9-nudge retry is gone. ``_retry`` kept for signature compatibility
    (the float pass is never re-entered)."""
    subj = ensure_open(orient(ensure_closed(subject), ccw=True))
    clp = ensure_open(orient(ensure_closed(clip), ccw=True))
    if len(subj) < 3 or len(clp) < 3:
        return []

    # quick bbox reject
    sb = bbox_of(subj)
    cb = bbox_of(clp)
    if sb[0] > cb[2] or cb[0] > sb[2] or sb[1] > cb[3] or cb[1] > sb[3]:
        return []

    sverts = _build_list(subj)
    cverts = _build_list(clp)

    # find all proper pairwise edge intersections
    inters = []  # (svert, t, cvert, u, point)
    degenerate = False
    for sv in sverts:
        p, q = np.array(sv.pt), np.array(sv.nxt.pt)
        for cv in cverts:
            a, b = np.array(cv.pt), np.array(cv.nxt.pt)
            rxy = q - p
            exy = b - a
            denom = rxy[0] * exy[1] - rxy[1] * exy[0]
            if abs(denom) < _EPS:
                continue
            w = a - p
            t = (w[0] * exy[1] - w[1] * exy[0]) / denom
            u = (w[0] * rxy[1] - w[1] * rxy[0]) / denom
            if -_EPS < t < _EPS or 1 - _EPS < t < 1 + _EPS or -_EPS < u < _EPS or 1 - _EPS < u < 1 + _EPS:
                if (_EPS < t < 1 - _EPS) or (_EPS < u < 1 - _EPS) or (
                    -_EPS < t < 1 + _EPS and -_EPS < u < 1 + _EPS
                ):
                    degenerate = True
                continue
            if 0 < t < 1 and 0 < u < 1:
                pt = tuple(p + t * rxy)
                inters.append((sv, t, cv, u, pt))

    if degenerate:
        from osm_export_tool_python_ray.functions.overlay import (
            ring_intersection_exact,
        )

        return ring_intersection_exact(subj, clp)

    if not inters:
        if _ring_contains(clp, tuple(subj[0])):
            return [ensure_closed(subj)]
        if _ring_contains(subj, tuple(clp[0])):
            return [ensure_closed(clp)]
        return []

    # insert intersection vertices into both lists (sorted along each edge)
    by_sedge = {}
    by_cedge = {}
    pairs = []
    for sv, t, cv, u, pt in inters:
        nv_s = _GHVertex(pt)
        nv_s.inter = True
        nv_s.t = t
        nv_c = _GHVertex(pt)
        nv_c.inter = True
        nv_c.t = u
        nv_s.twin = nv_c
        nv_c.twin = nv_s
        by_sedge.setdefault(id(sv), (sv, []))[1].append(nv_s)
        by_cedge.setdefault(id(cv), (cv, []))[1].append(nv_c)
        pairs.append(nv_s)

    for _k, (base, added) in list(by_sedge.items()) + list(by_cedge.items()):
        added.sort(key=lambda v: v.t)
        prev = base
        tail = base.nxt
        for v in added:
            prev.nxt = v
            v.prv = prev
            prev = v
        prev.nxt = tail
        tail.prv = prev

    # mark entry/exit on the subject list wrt clip, and on clip wrt subject
    def mark(verts_head, other_ring):
        v = verts_head
        status = not _ring_contains(other_ring, v.pt)  # True → next inter is entry
        seen = set()
        while id(v) not in seen:
            seen.add(id(v))
            if v.inter:
                v.entry = status
                status = not status
            v = v.nxt

    mark(sverts[0], clp)
    mark(cverts[0], subj)

    results = []
    for start in pairs:
        if start.visited or not start.entry:
            continue
        ring = []
        cur = start
        on_subject = True
        guard = 0
        while guard < 100000:
            guard += 1
            cur.visited = True
            if cur.twin is not None:
                cur.twin.visited = True
            if cur.entry:
                while True:
                    ring.append(cur.pt)
                    cur = cur.nxt
                    if cur.inter:
                        break
            else:
                while True:
                    ring.append(cur.pt)
                    cur = cur.prv
                    if cur.inter:
                        break
            cur = cur.twin
            on_subject = not on_subject
            if cur is start or (cur.twin is start):
                break
        if len(ring) >= 3:
            results.append(ensure_closed(np.asarray(ring, dtype=np.float64)))
    return results
