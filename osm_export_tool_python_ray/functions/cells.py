"""Hierarchical spatial cell index (H3-res-8-equivalent granularity).

Pure-NumPy square-grid cell ids over lon/lat (no h3 lib in this
environment, SURVEY.md §0). A cell at resolution ``res`` is a square of
``360 / 2**(res+7)`` degrees of longitude; at the default res=8 that is
~0.011° ≈ 1.2 km — the same order as H3 res 8 coverage cells. Ids encode
``(res, ix, iy)`` in a uint64 so parent/child relationships are cheap bit
math. Used as the groupby/shuffle key for spatial co-location (J4-J6) and
the AOI semi-join cover (SURVEY.md §2.4).
"""

import numpy as np

DEFAULT_RES = 8


def _scale(res):
    return (1 << (res + 7)) / 360.0


def cell_of(lon, lat, res=DEFAULT_RES):
    """Vectorized lon/lat → uint64 cell id."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    s = _scale(res)
    ix = np.clip(((lon + 180.0) * s).astype(np.int64), 0, (1 << (res + 8)) - 1)
    iy = np.clip(((lat + 90.0) * s).astype(np.int64), 0, (1 << (res + 8)) - 1)
    return (np.uint64(res) << np.uint64(58)) | (ix.astype(np.uint64) << np.uint64(29)) | iy.astype(np.uint64)


def cell_decode(cell):
    """uint64 cell id → (res, ix, iy) arrays."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(58)).astype(np.int64)
    ix = ((cell >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
    iy = (cell & np.uint64((1 << 29) - 1)).astype(np.int64)
    return res, ix, iy


def cell_bounds(cell):
    """cell id → (minlon, minlat, maxlon, maxlat)."""
    res, ix, iy = cell_decode(cell)
    s = _scale(int(res) if np.isscalar(res) or res.ndim == 0 else res[0])
    minlon = ix / s - 180.0
    minlat = iy / s - 90.0
    return minlon, minlat, minlon + 1.0 / s, minlat + 1.0 / s

def cell_center(cell):
    minlon, minlat, maxlon, maxlat = cell_bounds(cell)
    return (minlon + maxlon) / 2.0, (minlat + maxlat) / 2.0


def k_ring(cell, k=1):
    """The (2k+1)² neighborhood of a cell (including itself); vectorized
    over an array of cells → unique flat array."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    res, ix, iy = cell_decode(cell)
    r = int(res[0]) if len(res) else DEFAULT_RES
    lim = (1 << (r + 8)) - 1
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs)
    nx = np.clip(ix[:, None] + dx.ravel()[None, :], 0, lim)
    ny = np.clip(iy[:, None] + dy.ravel()[None, :], 0, lim)
    ids = (np.uint64(r) << np.uint64(58)) | (nx.astype(np.uint64) << np.uint64(29)) | ny.astype(np.uint64)
    return np.unique(ids.ravel())


def cover_bbox(minlon, minlat, maxlon, maxlat, res=DEFAULT_RES, cap=2_000_000):
    """All cells intersecting a bbox (the coarse AOI cover for the spatial
    semi-join J4). Refuses to materialize absurd covers (raise res)."""
    s = _scale(res)
    x0 = max(0, int((minlon + 180.0) * s))
    x1 = min((1 << (res + 8)) - 1, int((maxlon + 180.0) * s))
    y0 = max(0, int((minlat + 90.0) * s))
    y1 = min((1 << (res + 8)) - 1, int((maxlat + 90.0) * s))
    n = (x1 - x0 + 1) * (y1 - y0 + 1)
    if n > cap:
        raise ValueError("bbox cover of %d cells at res %d exceeds cap" % (n, res))
    xs = np.arange(x0, x1 + 1, dtype=np.uint64)
    ys = np.arange(y0, y1 + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    return (np.uint64(res) << np.uint64(58)) | (gx.ravel() << np.uint64(29)) | gy.ravel()


def cover_polygon(prepared, res=DEFAULT_RES):
    """Cells whose square intersects the prepared AOI polygon: bbox cover
    refined by a cell-center + corner status test (superset of the exact
    cover — safe for a semi-join prefilter)."""
    minlon, minlat, maxlon, maxlat = prepared.bbox
    cells = cover_bbox(minlon, minlat, maxlon, maxlat, res=res)
    lo_lon, lo_lat, hi_lon, hi_lat = cell_bounds(cells)
    # a cell intersects if any corner/center is inside-or-boundary, or the
    # AOI is entirely within the cell (checked via AOI bbox corner in cell)
    pts_x = np.stack([lo_lon, hi_lon, lo_lon, hi_lon, (lo_lon + hi_lon) / 2], axis=1)
    pts_y = np.stack([lo_lat, lo_lat, hi_lat, hi_lat, (lo_lat + hi_lat) / 2], axis=1)
    keep = np.zeros(len(cells), dtype=bool)
    for c in range(5):
        keep |= prepared.point_status(pts_x[:, c], pts_y[:, c]) > 0
    # AOI vertex inside the cell
    ax, ay = prepared.ax[0], prepared.ay[0]
    keep |= (lo_lon <= ax) & (ax <= hi_lon) & (lo_lat <= ay) & (ay <= hi_lat)
    # cells crossed by an AOI edge but with all probes outside: edge bbox overlap test
    exmin, exmax = prepared._exmin, prepared._exmax
    eymin, eymax = prepared._eymin, prepared._eymax
    for i in np.nonzero(~keep)[0]:
        hit = (
            (exmin <= hi_lon[i])
            & (exmax >= lo_lon[i])
            & (eymin <= hi_lat[i])
            & (eymax >= lo_lat[i])
        )
        if hit.any():
            keep[i] = True
    return cells[keep]
