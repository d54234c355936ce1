"""Distributed bbox-intersection spatial join (features ↔ features).

The missing member of the J-family (J4 semi-joins features to ONE AOI,
J5 joins features to tiles, J6 is kNN): all (left, right) feature pairs
whose bboxes intersect — nearest-road-for-building, line↔area conflict
detection, any two-layer overlay prefilter. The reference delegates this
class of query to OGR/GEOS on one machine; here it is the classic
partition-based spatial-merge shape (PBSM, Patel & DeWitt SIGMOD'96):

    each side ─ replicate to the grid cells covering its bbox ┐
                union → ONE groupby(cell % B) exchange →      │
                per-cell vectorized interval tests            ┘

**Pair dedup is free via the owner-cell (reference-point) rule**: a pair
whose bboxes both span several cells is discovered in every shared cell,
but emitted ONLY in the cell containing the intersection's lower-left
corner ``(max(l.minx, r.minx), max(l.miny, r.miny))`` — a point that
lies in both bboxes, hence in exactly one cell both sides were
replicated to. No global dedup shuffle, no pair set on the driver.

Partitioning assumptions (documented per the engine contract):

* ``res`` must be chosen so a typical feature bbox covers O(1) cells —
  replication is ``O(cells covered)``. Features covering more than
  ``max_cover`` cells are DROPPED with a counted cap
  (``spatial_join_oversize_bbox``) — at planet scale those are the
  continent-sized outliers that belong in a coarser-resolution pass.
* Dense cells are capped at ``max_cell_side`` rows per side with a
  counted cap (``spatial_join_hot_cells_skipped``) — the PBSM skew
  guard; salt or refine ``res`` for urban-core workloads.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions.cells import DEFAULT_RES, _scale
from osm_export_tool_python_ray.state.metrics import report_cap

JOIN_EXCHANGE_SCHEMA = pa.schema(
    [
        ("cell", pa.int64()),
        ("side", pa.int8()),
        ("fid", pa.int64()),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
        ("bucket", pa.int32()),
    ]
)


def _cover_cells_batch(minx, miny, maxx, maxy, res, max_cover):
    """Vectorized bbox → covering-cell expansion. Returns (cells, rows,
    n_oversize): cell ids (packed ix<<29|iy, res implied) and the source
    row index of each, oversize bboxes dropped + counted."""
    s = _scale(res)
    lim = (1 << (res + 8)) - 1
    # inverted (minx > maxx — e.g. an un-split antimeridian-wrapping
    # bbox) or NaN bboxes are not coverable at this resolution; they are
    # dropped WITH their own counted cap — never silently. (NaN must be
    # caught BEFORE the int cast: NaN→int64 is garbage that clips to a
    # valid-looking cell index.)
    with np.errstate(invalid="ignore"):
        degenerate = (
            ~np.isfinite(minx) | ~np.isfinite(miny)
            | ~np.isfinite(maxx) | ~np.isfinite(maxy)
            | (minx > maxx) | (miny > maxy)
        )
    mnx = np.where(degenerate, 0.0, minx)
    mny = np.where(degenerate, 0.0, miny)
    mxx = np.where(degenerate, -1.0, maxx)  # forces per<1 for degenerate rows
    mxy = np.where(degenerate, 0.0, maxy)
    ix0 = np.clip(((mnx + 180.0) * s).astype(np.int64), 0, lim)
    ix1 = np.clip(((mxx + 180.0) * s).astype(np.int64), 0, lim)
    iy0 = np.clip(((mny + 90.0) * s).astype(np.int64), 0, lim)
    iy1 = np.clip(((mxy + 90.0) * s).astype(np.int64), 0, lim)
    per = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    degenerate |= per < 1
    ok = (~degenerate) & (per <= max_cover)
    n_oversize = int((~ok & ~degenerate).sum())
    single = ok & (per == 1)
    cells = [(ix0[single] << 29) | iy0[single]]
    rows = [np.nonzero(single)[0]]
    for i in np.nonzero(ok & (per > 1))[0]:
        xs = np.arange(ix0[i], ix1[i] + 1, dtype=np.int64)
        ys = np.arange(iy0[i], iy1[i] + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys)
        cells.append((gx.ravel() << 29) | gy.ravel())
        rows.append(np.full(gx.size, i, dtype=np.int64))
    return np.concatenate(cells), np.concatenate(rows), n_oversize, int(degenerate.sum())


class _CellExpander:
    def __init__(self, side, res, max_cover, expand=0.0):
        self.side = side
        self.res = res
        self.max_cover = max_cover
        self.expand = float(expand)

    def __call__(self, t: pa.Table) -> pa.Table:
        e = self.expand
        minx = t.column("minx").to_numpy(zero_copy_only=False).astype(np.float64) - e
        miny = t.column("miny").to_numpy(zero_copy_only=False).astype(np.float64) - e
        maxx = t.column("maxx").to_numpy(zero_copy_only=False).astype(np.float64) + e
        maxy = t.column("maxy").to_numpy(zero_copy_only=False).astype(np.float64) + e
        fid = t.column("fid").to_numpy(zero_copy_only=False).astype(np.int64)
        cells, rows, n_over, n_degen = _cover_cells_batch(
            minx, miny, maxx, maxy, self.res, self.max_cover
        )
        report_cap("spatial_join_oversize_bbox", n_over)
        report_cap("spatial_join_degenerate_bbox", n_degen)
        return pa.table(
            {
                "cell": pa.array(cells),
                "side": pa.array(np.full(len(cells), self.side, dtype=np.int8)),
                "fid": pa.array(fid[rows]),
                "minx": pa.array(minx[rows]),
                "miny": pa.array(miny[rows]),
                "maxx": pa.array(maxx[rows]),
                "maxy": pa.array(maxy[rows]),
            }
        )


def _join_cells(group: pa.Table, res, max_cell_side) -> pa.Table:
    """One bucket of replicated rows → (l_id, r_id) pairs, owner-cell
    deduped. Per cell: vectorized all-pairs interval tests (sides capped
    with a counted skip)."""
    cell = group.column("cell").to_numpy(zero_copy_only=False)
    side = group.column("side").to_numpy(zero_copy_only=False)
    fid = group.column("fid").to_numpy(zero_copy_only=False)
    minx = group.column("minx").to_numpy(zero_copy_only=False)
    miny = group.column("miny").to_numpy(zero_copy_only=False)
    maxx = group.column("maxx").to_numpy(zero_copy_only=False)
    maxy = group.column("maxy").to_numpy(zero_copy_only=False)

    order = np.lexsort((fid, side, cell))
    cell, side, fid = cell[order], side[order], fid[order]
    minx, miny, maxx, maxy = minx[order], miny[order], maxx[order], maxy[order]
    bounds = np.concatenate(
        [[0], np.nonzero(cell[1:] != cell[:-1])[0] + 1, [len(cell)]]
    ) if len(cell) else np.array([0, 0])

    s = _scale(res)
    out_l, out_r = [], []
    hot_skipped = 0
    for a, b in zip(bounds[:-1], bounds[1:]):
        if a == b:
            continue
        sd = side[a:b]
        li = np.nonzero(sd == 0)[0] + a
        ri = np.nonzero(sd == 1)[0] + a
        if len(li) == 0 or len(ri) == 0:
            continue
        if len(li) > max_cell_side or len(ri) > max_cell_side:
            hot_skipped += 1
            continue
        # all-pairs interval tests, LEFT-CHUNKED so the candidate arrays
        # stay ≤ ~4M pairs regardless of cell density (a max_cell_side²
        # cell would otherwise materialize 16M-pair masks per cell)
        lim = (1 << (res + 8)) - 1
        chunk = max(1, (4 << 20) // max(len(ri), 1))
        for c0 in range(0, len(li), chunk):
            lc = li[c0 : c0 + chunk]
            lm = np.repeat(lc, len(ri))
            rm = np.tile(ri, len(lc))
            hit = (
                (minx[lm] <= maxx[rm])
                & (minx[rm] <= maxx[lm])
                & (miny[lm] <= maxy[rm])
                & (miny[rm] <= maxy[lm])
            )
            lm, rm = lm[hit], rm[hit]
            if len(lm) == 0:
                continue
            # owner-cell rule: emit only where the intersection's
            # lower-left corner falls in THIS cell
            px = np.maximum(minx[lm], minx[rm])
            py = np.maximum(miny[lm], miny[rm])
            ox = np.clip(((px + 180.0) * s).astype(np.int64), 0, lim)
            oy = np.clip(((py + 90.0) * s).astype(np.int64), 0, lim)
            own = ((ox << 29) | oy) == cell[a]
            out_l.append(fid[lm[own]])
            out_r.append(fid[rm[own]])
    if hot_skipped:
        report_cap("spatial_join_hot_cells_skipped", hot_skipped)
    l_ids = np.concatenate(out_l) if out_l else np.array([], dtype=np.int64)
    r_ids = np.concatenate(out_r) if out_r else np.array([], dtype=np.int64)
    return pa.table({"l_id": pa.array(l_ids), "r_id": pa.array(r_ids)})


def bbox_intersection_join(
    left_ds,
    right_ds,
    res=DEFAULT_RES,
    num_buckets=64,
    max_cover=1024,
    max_cell_side=4096,
    expand=0.0,
):
    """→ (l_id, r_id) for every bbox-intersecting cross pair, exactly
    once. Inputs need columns (fid, minx, miny, maxx, maxy); pair (l, r)
    is emitted with l from ``left_ds``, r from ``right_ds``.

    ``expand``: ε-PROXIMITY semantics — the left bboxes are buffered by
    ``expand`` degrees before the cover AND the test, so the result is
    every pair whose bboxes come within ``expand`` of each other in
    Chebyshev distance (expand=0 = plain intersection). The buffering
    happens map-side in the expander, so the owner-cell dedup rule is
    untouched: it operates on the expanded left box consistently."""
    left = left_ds.map_batches(
        _CellExpander(0, res, max_cover, expand=expand), batch_format="pyarrow"
    )
    right = right_ds.map_batches(_CellExpander(1, res, max_cover), batch_format="pyarrow")

    def bucketer(t: pa.Table) -> pa.Table:
        c = t.column("cell").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((c % num_buckets).astype(np.int32))
        )

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    return grouped_map(
        left.union(right).map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: _join_cells(g.drop_columns(["bucket"]), res, max_cell_side),
        num_partitions=min(num_buckets, 32),
        payload_schema=JOIN_EXCHANGE_SCHEMA,
    )


ANTI_EXCHANGE_SCHEMA = pa.schema(
    [
        ("side", pa.int8()),
        ("pid", pa.int64()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("cell", pa.int64()),
    ]
)


def points_not_near(points_ds, features_ds, eps2, cell_size, num_buckets=64):
    """ε-proximity spatial ANTI-join over two point sets → the rows of
    ``points_ds`` (pid, lon, lat) with NO feature point within
    sqrt(eps2) Euclidean distance. The complement of the proximity
    join — "POIs not near any road/water" — which a NOT EXISTS cannot
    express without the full cross product.

    Shape: points land in exactly ONE grid cell (side 0); features
    (side 1, the replicated side — put the SMALLER set here) are
    replicated to their 3×3 cell neighborhood. With cell_size >=
    sqrt(eps2), every feature within ε of a point is present in the
    point's own cell, so ONE cell-bucketed exchange makes the per-cell
    keep/drop decision complete — anti-joins normally need a second
    match-collection pass; the neighborhood replication removes it.
    Per-partition work is a lexsort + per-cell vectorized distance
    blocks (features per cell × points per cell, both bounded by the
    cell geometry, chunked like _join_cells).

    Determinism: the near test is ``dx*dx + dy*dy < eps2`` — exact
    IEEE mult/add mirrored verbatim by the SQL oracle; choose eps2
    strictly between attainable squared distances of the synthetic
    grids so the comparison has no boundary case."""
    if cell_size * cell_size < eps2:
        raise ValueError("cell_size must be >= sqrt(eps2) for 3x3 completeness")

    def cells_of(lon, lat):
        gx = np.floor(lon / cell_size).astype(np.int64)
        gy = np.floor(lat / cell_size).astype(np.int64)
        return gx * np.int64(1 << 20) + gy

    def point_side(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "side": pa.array(np.zeros(len(lon), dtype=np.int8)),
                "pid": t.column("pid"),
                "lon": t.column("lon"),
                "lat": t.column("lat"),
                "cell": pa.array(cells_of(lon, lat)),
            }
        )

    def feature_side(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        ids = t.column("pid").to_numpy(zero_copy_only=False)
        gx = np.floor(lon / cell_size).astype(np.int64)
        gy = np.floor(lat / cell_size).astype(np.int64)
        n = len(lon)
        reps = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                reps.append((gx + dx) * np.int64(1 << 20) + (gy + dy))
        cell = np.concatenate(reps)
        tile = lambda a: np.tile(a, 9)
        return pa.table(
            {
                "side": pa.array(np.ones(9 * n, dtype=np.int8)),
                "pid": pa.array(tile(ids)),
                "lon": pa.array(tile(lon)),
                "lat": pa.array(tile(lat)),
                "cell": pa.array(cell),
            }
        )

    def anti(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        pid = g.column("pid").to_numpy(zero_copy_only=False)
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        cell = g.column("cell").to_numpy(zero_copy_only=False)
        pts = side == 0
        if not pts.any():
            return pa.table(
                {
                    "pid": pa.array([], type=pa.int64()),
                    "lon": pa.array([], type=pa.float64()),
                    "lat": pa.array([], type=pa.float64()),
                }
            )
        p_cell, p_pid = cell[pts], pid[pts]
        p_lon, p_lat = lon[pts], lat[pts]
        f_cell = cell[~pts]
        f_lon, f_lat = lon[~pts], lat[~pts]
        forder = np.argsort(f_cell, kind="stable")
        f_cell, f_lon, f_lat = f_cell[forder], f_lon[forder], f_lat[forder]
        lo = np.searchsorted(f_cell, p_cell, side="left")
        hi = np.searchsorted(f_cell, p_cell, side="right")
        keep = np.ones(len(p_pid), dtype=bool)
        # per-cell blocks: iterate the DISTINCT point cells that have any
        # co-located features (O(cells) loop, vectorized inner block)
        has_f = hi > lo
        if has_f.any():
            order = np.argsort(p_cell, kind="stable")
            pc_sorted = p_cell[order]
            starts = np.nonzero(
                np.concatenate([[True], pc_sorted[1:] != pc_sorted[:-1]])
            )[0]
            ends = np.append(starts[1:], len(pc_sorted))
            for s, e in zip(starts, ends):
                rows = order[s:e]
                flo, fhi = lo[rows[0]], hi[rows[0]]
                if fhi <= flo:
                    continue
                dx = p_lon[rows][:, None] - f_lon[flo:fhi][None, :]
                dy = p_lat[rows][:, None] - f_lat[flo:fhi][None, :]
                near = (dx * dx + dy * dy < eps2).any(axis=1)
                keep[rows[near]] = False
        return pa.table(
            {
                "pid": pa.array(p_pid[keep]),
                "lon": pa.array(p_lon[keep]),
                "lat": pa.array(p_lat[keep]),
            }
        )

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    both = points_ds.map_batches(point_side, batch_format="pyarrow").union(
        features_ds.map_batches(feature_side, batch_format="pyarrow")
    )

    def bucketer(t: pa.Table) -> pa.Table:
        c = t.column("cell").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((c % num_buckets).astype(np.int32))
        )

    return grouped_map(
        both.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: anti(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
        payload_schema=ANTI_EXCHANGE_SCHEMA,
    )
