"""Z-order (Morton) space-filling-curve indexing: rectangle range
queries answered PURELY from curve-interval membership.

This is the pruning primitive a Lance / parquet table sorted by a
space-filling curve gives a spatial engine at 100 TB: a rectangle
query becomes a small set of disjoint Morton-code intervals, and a
scan touches only the row groups whose (min, max) Morton statistics
intersect them — no per-row x/y predicate ever runs on the cold data.
The operator here proves the equivalence end-to-end: the engine
filters points using ONLY the decomposed intervals (the x/y rectangle
predicate never appears on the engine side), while the SQL oracle
filters with the plain ``x BETWEEN ... AND y BETWEEN ...`` rectangle
and re-derives the Morton code bit-by-bit — hash-equality of the two
results is exactly the statement "the decomposition covers the
rectangle, the whole rectangle, and nothing but the rectangle".

Scale shape: the quadtree decomposition is O(perimeter) driver work
(≤ 4·2^BITS tiny intervals for any axis-aligned rectangle — here ≤ a
few dozen), broadcast once via the closure; membership is a single
vectorized ``np.searchsorted`` against the flattened interval bounds
inside ``map_batches``; the result is folded per coarse Z-block with
per-batch partials before one small groupby. Nothing driver-side
scales with the data.

No reference analog — engine mandate (spatial-index family). The
reference's AOI clipping (reference geometry.py load_geometry +
export clipping) is the semantic cousin; this is the index-side
counterpart for curve-ordered storage.
"""

import numpy as np
import pyarrow as pa

BITS = 7  # 7 bits per axis covers the [0, 100) synthetic grid


def morton_encode(x, y, bits=BITS):
    """Vectorized Morton interleave: bit b of x -> bit 2b, bit b of y ->
    bit 2b+1. int64 in, int64 out (2*bits significant bits)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    m = np.zeros_like(x)
    for b in range(bits):
        m |= ((x >> b) & 1) << (2 * b)
        m |= ((y >> b) & 1) << (2 * b + 1)
    return m


def decompose_rect(xlo, xhi, ylo, yhi, bits=BITS):
    """Decompose the inclusive rectangle [xlo,xhi]×[ylo,yhi] into
    disjoint, sorted, merged Morton-code intervals [lo, hi] (inclusive).

    Standard quadtree walk: a level-L node is a 2^L × 2^L square whose
    cells occupy one contiguous Morton interval of length 4^L. Fully
    inside -> emit the whole interval; disjoint -> prune; straddling ->
    recurse into the four children. Interval count is O(perimeter):
    bounded by ~4·2^bits, tiny driver state independent of data size."""
    out = []

    def walk(level, qx, qy, zbase):
        size = 1 << level
        x0, y0 = qx * size, qy * size
        x1, y1 = x0 + size - 1, y0 + size - 1
        if x0 > xhi or x1 < xlo or y0 > yhi or y1 < ylo:
            return
        if x0 >= xlo and x1 <= xhi and y0 >= ylo and y1 <= yhi:
            out.append((zbase, zbase + (1 << (2 * level)) - 1))
            return
        child = 1 << (2 * (level - 1))
        # children in Morton order: (0,0), (1,0), (0,1), (1,1)
        walk(level - 1, 2 * qx, 2 * qy, zbase)
        walk(level - 1, 2 * qx + 1, 2 * qy, zbase + child)
        walk(level - 1, 2 * qx, 2 * qy + 1, zbase + 2 * child)
        walk(level - 1, 2 * qx + 1, 2 * qy + 1, zbase + 3 * child)

    walk(bits, 0, 0, 0)
    out.sort()
    merged = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def interval_bounds(intervals):
    """Flatten [(lo, hi)] into the searchsorted membership array
    [lo0, hi0+1, lo1, hi1+1, ...]: m is inside some interval iff
    searchsorted(bounds, m, side='right') is odd."""
    flat = np.empty(2 * len(intervals), dtype=np.int64)
    for i, (lo, hi) in enumerate(intervals):
        flat[2 * i] = lo
        flat[2 * i + 1] = hi + 1
    return flat


def zorder_range_query(events_ds, xlo, xhi, ylo, yhi, block_shift=6):
    """Per-Z-block counts + id sums of the points inside the rectangle,
    computed WITHOUT evaluating the rectangle predicate: points are kept
    iff their Morton code falls in the decomposed curve intervals.

    Output: (qkey, n, id_sum) for qkey = morton >> block_shift (an
    8×8-cell Z-aligned block at the default shift), sorted by the
    consuming query. Grid derivation matches the journey family:
    x = event_id % 100, y = (event_id // 7) % 100."""
    intervals = decompose_rect(xlo, xhi, ylo, yhi)
    bounds = interval_bounds(intervals)  # tiny; rides the closure

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        x = (eid % 100).astype(np.int64)
        y = ((eid // 7) % 100).astype(np.int64)
        m = morton_encode(x, y)
        inside = (np.searchsorted(bounds, m, side="right") & 1) == 1
        m, eid = m[inside], eid[inside]
        qkey = m >> block_shift
        # per-batch fold: unique blocks with count + id sum
        uq, inv, cnt = np.unique(qkey, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uq), dtype=np.int64)
        np.add.at(sums, inv, eid)
        return pa.table(
            {
                "qkey": pa.array(uq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
                "id_sum": pa.array(sums),
            }
        )

    from ray.data.aggregate import Sum

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qkey")
        .aggregate(Sum("n", alias_name="n"), Sum("id_sum", alias_name="id_sum"))
    )


def hilbert_d(x, y, bits=BITS):
    """Vectorized Hilbert curve index (xy2d, the classic iterative
    form): n = 2^bits grid side, flip uses n-1 coordinates. int64."""
    n = 1 << bits
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rot(n, x, y, rx, ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, n - 1 - x, x)
        yf = np.where(flip, n - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def decompose_rect_hilbert(xlo, xhi, ylo, yhi, bits=BITS):
    """Hilbert-interval decomposition of an inclusive rectangle: the
    SAME geometric quadtree walk as ``decompose_rect``, but each fully
    covered level-L square contributes the d-interval
    [min d(corner cells), +4^L) — valid because a Hilbert curve visits
    an aligned square as one contiguous run and enters/exits at square
    corners, so the run's base is the minimum corner index. No
    orientation bookkeeping; d evaluated per emitted node only (O(bits)
    each, O(perimeter) nodes)."""
    out = []

    def walk(level, qx, qy):
        size = 1 << level
        x0, y0 = qx * size, qy * size
        x1, y1 = x0 + size - 1, y0 + size - 1
        if x0 > xhi or x1 < xlo or y0 > yhi or y1 < ylo:
            return
        if x0 >= xlo and x1 <= xhi and y0 >= ylo and y1 <= yhi:
            corners = hilbert_d(
                np.array([x0, x0, x1, x1]), np.array([y0, y1, y0, y1]), bits
            )
            base = int(corners.min())
            out.append((base, base + size * size - 1))
            return
        walk(level - 1, 2 * qx, 2 * qy)
        walk(level - 1, 2 * qx + 1, 2 * qy)
        walk(level - 1, 2 * qx, 2 * qy + 1)
        walk(level - 1, 2 * qx + 1, 2 * qy + 1)

    walk(bits, 0, 0)
    out.sort()
    merged = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def hilbert_range_query(events_ds, xlo, xhi, ylo, yhi, block_shift=6):
    """Rectangle query answered purely from Hilbert-curve intervals
    (the zorder_range contract on the locality-optimal curve): per
    d-block counts + id sums, (qkey = d >> block_shift, n, id_sum)."""
    intervals = decompose_rect_hilbert(xlo, xhi, ylo, yhi)
    bounds = interval_bounds(intervals)

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        x = (eid % 100).astype(np.int64)
        y = ((eid // 7) % 100).astype(np.int64)
        d = hilbert_d(x, y)
        inside = (np.searchsorted(bounds, d, side="right") & 1) == 1
        d, eid = d[inside], eid[inside]
        qkey = d >> block_shift
        uq, inv, cnt = np.unique(qkey, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uq), dtype=np.int64)
        np.add.at(sums, inv, eid)
        return pa.table(
            {
                "qkey": pa.array(uq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
                "id_sum": pa.array(sums),
            }
        )

    from ray.data.aggregate import Sum

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qkey")
        .aggregate(Sum("n", alias_name="n"), Sum("id_sum", alias_name="id_sum"))
    )
