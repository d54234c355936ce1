"""User-journey analytics over an event stream — ordered-funnel
progression and per-user trajectory statistics. The two event-log
operators a product/geo analytics pipeline runs after sessionization
(stages/temporal.py asof/range, queries.py events_sessions): "how many
users completed signup → click → purchase IN ORDER" and "how far did
each user move, and how directly".

Scale shape (both ops): ONE user-keyed bucket exchange via
``grouped_map`` — the same user_id%B bucketing the sessions /
temporal family uses, so a composed pipeline reuses the partitioning
key — then fully vectorized per-partition kernels (lexsort +
segment-boundary numpy; no per-row or per-user Python). Funnel
reduces each partition to |stages| partial rows before a tiny
``groupby("stage").sum()``; trajectory emits one row per user.

Determinism contracts (oracle-exact, pipelines/queries.py):
- funnel: stage k is reached at the MINIMUM event ts of the stage-k
  event type that is STRICTLY LATER than the stage-(k-1) reach time —
  pure int64 microsecond comparisons, no floats anywhere.
- trajectory: per-user path length over synthetic planar points in
  (ts, event_id) order; each segment is sqrt(dx*dx + dy*dy) (IEEE
  mult/add/sqrt are correctly rounded → bit-identical in numpy and
  DuckDB) quantized to int64 nano-degree units BEFORE summing, so the
  per-user sum is summation-order independent (the engine's
  quantize-then-sum rule for float aggregates).

No reference analog — engine mandate (temporal/geospatial family).
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map
from osm_export_tool_python_ray.stages.temporal import _ts_i64

_I64_MAX = np.iinfo(np.int64).max


def _first_idx_per_seg(starts, mask, n_rows):
    """Index of the first True of ``mask`` within each segment (segments
    given by ``starts`` into a row range of length ``n_rows``), or -1.
    Rows are assumed sorted so "first" = minimal index = earliest in the
    segment's sort order."""
    cand = np.where(mask, np.arange(n_rows), _I64_MAX)
    first = np.minimum.reduceat(cand, starts) if len(starts) else cand[:0]
    return np.where(first == _I64_MAX, -1, first)


def funnel_progression(events_ds, stages, num_buckets=32, num_partitions=8):
    """Ordered-funnel user counts: row (stage, users) for stage = 1..K,
    where ``users`` counts users whose event log contains
    stages[0] < stages[1] < ... < stages[k-1] at strictly increasing
    event timestamps (ties at the same microsecond do NOT advance the
    funnel — pure int64 semantics shared with the SQL oracle)."""
    K = len(stages)

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % num_buckets).astype(np.int32)))

    EXCHANGED = pa.schema(
        [
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.string()),
        ]
    )

    def partial(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = g.column("user_id").to_numpy(zero_copy_only=False)
        counts = np.zeros(K, dtype=np.int64)
        if len(u):
            ts = _ts_i64(g.column("ts"))
            # per-stage boolean masks via the Arrow string-equality
            # kernel (no Python string materialization), then permuted
            masks = [
                pc.equal(g.column("event_type"), s).to_numpy(zero_copy_only=False)
                for s in stages
            ]
            order = np.lexsort((ts, u))
            u, ts = u[order], ts[order]
            masks = [m[order] for m in masks]
            new_u = np.concatenate([[True], u[1:] != u[:-1]])
            starts = np.nonzero(new_u)[0]
            seg = np.cumsum(new_u) - 1
            # reach = per-user reach time of the latest completed stage
            reach = np.full(len(starts), np.int64(-(1 << 62)), dtype=np.int64)
            alive = np.ones(len(starts), dtype=bool)
            for j in range(K):
                qual = masks[j] & (ts > reach[seg]) & alive[seg]
                idx = _first_idx_per_seg(starts, qual, len(u))
                hit = idx >= 0
                reach = np.where(hit, ts[np.maximum(idx, 0)], reach)
                alive &= hit
                counts[j] = int(alive.sum())
        return pa.table(
            {
                "stage": pa.array(np.arange(1, K + 1, dtype=np.int64)),
                "users": pa.array(counts),
            }
        )

    from ray.data.aggregate import Sum

    partials = grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: partial(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=EXCHANGED,
    )
    return (
        partials.groupby("stage").aggregate(Sum("users", alias_name="users")).sort("stage")
    )


def _event_points(event_id):
    """Deterministic synthetic planar lon/lat from event_id — the
    _customer_points family (pipelines/queries.py), shared verbatim
    with the SQL oracle: exact float64 at every step (integer-valued
    mod/floor below 2^53, correctly-rounded * 0.01)."""
    k = event_id.astype(np.float64)
    lon = np.mod(k, 100.0) * 0.01
    lat = np.mod(np.floor(k / 7.0), 100.0) * 0.01
    return lon, lat


def trajectory_stats(events_ds, num_buckets=32, num_partitions=8):
    """Per-user trajectory over the synthetic event points in
    (ts, event_id) order → (user_id, n_events, path_micro, net_micro):
    total path length and net first→last displacement, both planar
    Euclidean in degrees quantized to int64 1e-9 units."""

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % num_buckets).astype(np.int32)))

    def per_user(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "path_micro": pa.array([], type=pa.int64()),
                    "net_micro": pa.array([], type=pa.int64()),
                }
            )
        ts = _ts_i64(g.column("ts"))
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        lon, lat = _event_points(eid)
        same_user = np.concatenate([[False], u[1:] == u[:-1]])
        dx = np.concatenate([[0.0], np.diff(lon)])
        dy = np.concatenate([[0.0], np.diff(lat)])
        seg_len = np.sqrt(dx * dx + dy * dy)
        seg_micro = np.floor(seg_len * 1000000000.0 + 0.5).astype(np.int64)
        seg_micro[~same_user] = 0
        new_u = ~same_user
        starts = np.nonzero(new_u)[0]
        # int64 segment sums (bincount's float64 weights would lose
        # exactness past 2^53 nano-units ≈ 9e6 degree-lengths per user);
        # segments are non-empty by construction (starts are real rows)
        path = np.add.reduceat(seg_micro, starts)
        ends = np.concatenate([starts[1:] - 1, [len(u) - 1]])
        ndx = lon[ends] - lon[starts]
        ndy = lat[ends] - lat[starts]
        net = np.floor(np.sqrt(ndx * ndx + ndy * ndy) * 1000000000.0 + 0.5).astype(np.int64)
        n_events = np.diff(np.append(starts, len(u))).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n_events": pa.array(n_events),
                "path_micro": pa.array(path),
                "net_micro": pa.array(net),
            }
        )

    return grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: per_user(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
            ]
        ),
    )


def dp_keep_indices(x, y, tol2):
    """Exact integer Douglas–Peucker on one polyline (grid coords):
    0-based indices of the kept vertices. Split metric is cross² (or
    |p-a|² for a degenerate zero-length chord), compared against
    tol2·len2 (len2=1 when degenerate) — all int64, no float anywhere,
    so every implementation of this rule agrees bit-for-bit. Tie-break:
    the SMALLEST index among metric maxima."""
    n = len(x)
    if n == 0:
        return []
    if n == 1:
        return [0]
    keep = {0, n - 1}
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        dx = x[hi] - x[lo]
        dy = y[hi] - y[lo]
        len2 = int(dx * dx + dy * dy)
        px = x[lo + 1 : hi] - x[lo]
        py = y[lo + 1 : hi] - y[lo]
        if len2 > 0:
            cr = dx * py - dy * px
            metric = cr * cr
        else:
            metric = px * px + py * py
        m = int(metric.max())
        if m > tol2 * max(len2, 1):
            i = int(np.argmax(metric == m)) + lo + 1
            keep.add(i)
            stack.append((lo, i))
            stack.append((i, hi))
    return sorted(keep)


def trajectory_simplify(events_ds, tol2, num_buckets=32, num_partitions=8):
    """Per-user Douglas–Peucker simplification of the synthetic event
    trajectory (integer grid coords x = event_id % 100,
    y = (event_id // 7) % 100, ordered by (ts, event_id)) → one row
    (user_id, idx) per KEPT vertex, idx 1-based in trajectory order.

    Same exchange shape as trajectory_stats: one user-keyed bucket
    exchange, then a per-user stack walk whose inner metric pass is
    vectorized numpy over the segment's interior points. DP is
    inherently sequential per polyline (each split depends on the
    previous), so per-user iteration is the correct granularity — the
    parallelism is across users, which is what the exchange provides.
    The DuckDB oracle replays the identical integer rule as a recursive
    CTE (segments split at the packed-argmax point), so engine and
    oracle agree exactly — no tolerance, no float."""

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % num_buckets).astype(np.int32)))

    def per_user(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "idx": pa.array([], type=pa.int64())}
            )
        ts = _ts_i64(g.column("ts"))
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid = u[order], eid[order]
        x = (eid % 100).astype(np.int64)
        y = ((eid // 7) % 100).astype(np.int64)
        starts = np.nonzero(np.concatenate([[True], u[1:] != u[:-1]]))[0]
        ends = np.append(starts[1:], len(u))
        out_u, out_i = [], []
        for s, e in zip(starts, ends):
            for k in dp_keep_indices(x[s:e], y[s:e], tol2):
                out_u.append(int(u[s]))
                out_i.append(k + 1)
        return pa.table(
            {
                "user_id": pa.array(np.asarray(out_u, dtype=np.int64)),
                "idx": pa.array(np.asarray(out_i, dtype=np.int64)),
            }
        )

    return grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: per_user(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
            ]
        ),
    )


# octant codes: 0=E 1=NE 2=N 3=NW 4=W 5=SW 6=S 7=SE, 8=stationary.
# Classification is a pure-int64 CASE ladder on (sign(dx), sign(dy),
# |dx| vs |dy|), ties |dx|==|dy| resolved to the diagonals — the SQL
# oracle mirrors the ladder clause for clause.
def octants_of(dx, dy):
    adx, ady = np.abs(dx), np.abs(dy)
    return np.select(
        [
            (dx == 0) & (dy == 0),
            (adx > ady) & (dx > 0),
            (adx > ady) & (dx < 0),
            (ady > adx) & (dy > 0),
            (ady > adx) & (dy < 0),
            (dx > 0) & (dy > 0),
            (dx < 0) & (dy > 0),
            (dx < 0) & (dy < 0),
        ],
        [8, 0, 4, 2, 6, 1, 3, 5],
        default=7,
    ).astype(np.int64)


def move_octants(events_ds, num_buckets=32, num_partitions=8):
    """Movement-direction histogram: each user's trajectory (the same
    integer grid + (ts, event_id) order as trajectory_stats /
    trajectory_simplify) is cut into consecutive segments, every segment
    classified into one of 8 direction octants (or 8 = stationary), and
    the corpus-wide histogram (octant, n) returned.

    Same exchange shape as the rest of the journey family: one
    user-keyed bucket exchange, then each partition reduces to <= 9
    partial rows before a tiny groupby('octant').sum() — segment
    classification itself is one vectorized np.select pass."""
    from ray.data.aggregate import Sum

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % num_buckets).astype(np.int32)))

    def partial(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        counts = np.zeros(9, dtype=np.int64)
        if len(u):
            ts = _ts_i64(g.column("ts"))
            eid = g.column("event_id").to_numpy(zero_copy_only=False)
            order = np.lexsort((eid, ts, u))
            u, eid = u[order], eid[order]
            x = (eid % 100).astype(np.int64)
            y = ((eid // 7) % 100).astype(np.int64)
            same = u[1:] == u[:-1]  # consecutive rows of the SAME user
            if same.any():
                o = octants_of(np.diff(x)[same], np.diff(y)[same])
                counts += np.bincount(o, minlength=9)
        return pa.table(
            {
                "octant": pa.array(np.arange(9, dtype=np.int64)),
                "n_partial": pa.array(counts),
            }
        )

    partials = grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: partial(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
            ]
        ),
    )
    folded = partials.groupby("octant").aggregate(Sum("n_partial", alias_name="n"))

    # zero-filled partial rows keep the per-partition output fixed-shape;
    # drop the octants nothing moved in (the oracle never emits them)
    def nonzero(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t.column("n"), 0))

    return folded.map_batches(nonzero, batch_format="pyarrow")


def hull_vertices(x, y):
    """STRICT convex hull (Andrew monotone chain, collinear boundary
    points excluded) over int64 grid points -> sorted [(x, y), ...] hull
    vertex list. Duplicates are deduped first; all-collinear inputs
    reduce to the two extremes; a single distinct point is its own hull.
    All arithmetic is exact int64 cross products, so the SQL oracle's
    edge characterization (every other point strictly left, or collinear
    strictly between) selects the identical vertex set."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)  # sorted (x, y)
    n = len(pts)
    if n <= 2:
        return [tuple(map(int, p)) for p in pts]

    def chain(idx):
        out = []
        for i in idx:
            while len(out) >= 2:
                ox, oy = pts[out[-2]]
                ax, ay = pts[out[-1]]
                if (ax - ox) * (pts[i, 1] - oy) - (ay - oy) * (pts[i, 0] - ox) > 0:
                    break
                out.pop()  # pop on cross <= 0: STRICT turns only
            out.append(i)
        return out

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    keep = sorted(set(lower[:-1] + upper[:-1]))
    if len(keep) < 2:  # all collinear: chain degenerates to the extremes
        keep = [0, n - 1]
    return [tuple(map(int, pts[i])) for i in keep]


def user_hulls(events_ds, num_buckets=32, num_partitions=8):
    """Per-user convex hull of the trajectory points (same integer grid
    as the rest of the journey family) -> one row (user_id, x, y) per
    STRICT hull vertex. One user-keyed exchange; the chain walk is per
    user over the deduped point set (tiny after np.unique), parallelism
    across users."""

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % num_buckets).astype(np.int32)))

    def per_user(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        out_u, out_x, out_y = [], [], []
        if len(u):
            eid = g.column("event_id").to_numpy(zero_copy_only=False)
            order = np.argsort(u, kind="stable")
            u, eid = u[order], eid[order]
            x = (eid % 100).astype(np.int64)
            y = ((eid // 7) % 100).astype(np.int64)
            starts = np.nonzero(np.concatenate([[True], u[1:] != u[:-1]]))[0]
            ends = np.append(starts[1:], len(u))
            for s, e in zip(starts, ends):
                for hx, hy in hull_vertices(x[s:e], y[s:e]):
                    out_u.append(int(u[s]))
                    out_x.append(hx)
                    out_y.append(hy)
        return pa.table(
            {
                "user_id": pa.array(np.asarray(out_u, dtype=np.int64)),
                "x": pa.array(np.asarray(out_x, dtype=np.int64)),
                "y": pa.array(np.asarray(out_y, dtype=np.int64)),
            }
        )

    return grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: per_user(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("user_id", pa.int64()), ("event_id", pa.int64())]
        ),
    )


def count_proper_crossings(x, y):
    """Number of PROPERLY crossing segment pairs of one polyline (int64
    grid coords, segments between consecutive points). Proper = the
    segments cross at an interior point of both: both orientation pairs
    strictly straddle (d1*d2 < 0 and d3*d4 < 0). Touches, shared
    endpoints (adjacent segments), collinear overlaps and degenerate
    zero-length segments all fail the strict predicate — no special
    cases, and the SQL oracle evaluates the identical products.
    Vectorized as an m x m orientation broadcast (m = segment count)."""
    m = len(x) - 1
    if m < 2:
        return 0
    ax, ay, bx, by = x[:-1], y[:-1], x[1:], y[1:]
    ux, uy = bx - ax, by - ay  # segment direction vectors

    def side(px, py):
        # side[i, j] = orientation of point j's coords vs segment i
        return ux[:, None] * (py[None, :] - ay[:, None]) - uy[:, None] * (
            px[None, :] - ax[:, None]
        )

    d1 = side(ax, ay)  # d1[j, i]: a_i vs segment j
    d2 = side(bx, by)
    straddle = (d1 * d2) < 0  # [j, i]: segment i's endpoints straddle j's line
    proper = straddle & straddle.T
    iu = np.triu_indices(m, k=1)
    return int(proper[iu].sum())


def hull_area2(x, y):
    """Twice the signed area of the strict convex hull (positive CCW
    shoelace over the monotone-chain cycle) — exact int64. Degenerate
    hulls (<=2 distinct points, all collinear) have area 0."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)
    n = len(pts)
    if n <= 2:
        return 0

    def chain(idx):
        out = []
        for i in idx:
            while len(out) >= 2:
                ox, oy = pts[out[-2]]
                axx, ayy = pts[out[-1]]
                if (axx - ox) * (pts[i, 1] - oy) - (ayy - oy) * (pts[i, 0] - ox) > 0:
                    break
                out.pop()
            out.append(i)
        return out

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    cyc = lower[:-1] + upper[:-1]  # CCW vertex cycle
    if len(cyc) < 3:
        return 0
    cx = pts[cyc, 0]
    cy = pts[cyc, 1]
    return int(np.sum(cx * np.roll(cy, -1) - np.roll(cx, -1) * cy))


def trajectory_geometry(events_ds, num_buckets=32, num_partitions=8):
    """Per-user exact-integer geometry summary: (user_id, n_cross =
    properly-crossing segment pairs of the trajectory polyline,
    hull_area2 = twice the strict-convex-hull area). One user-keyed
    exchange (journey-family shape); both kernels are exact int64 so
    the oracle re-derives them with zero tolerance."""

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % num_buckets).astype(np.int32)))

    def per_user(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        out_u, out_c, out_a = [], [], []
        if len(u):
            ts = _ts_i64(g.column("ts"))
            eid = g.column("event_id").to_numpy(zero_copy_only=False)
            order = np.lexsort((eid, ts, u))
            u, eid = u[order], eid[order]
            x = (eid % 100).astype(np.int64)
            y = ((eid // 7) % 100).astype(np.int64)
            starts = np.nonzero(np.concatenate([[True], u[1:] != u[:-1]]))[0]
            ends = np.append(starts[1:], len(u))
            for s, e in zip(starts, ends):
                out_u.append(int(u[s]))
                out_c.append(count_proper_crossings(x[s:e], y[s:e]))
                out_a.append(hull_area2(x[s:e], y[s:e]))
        return pa.table(
            {
                "user_id": pa.array(np.asarray(out_u, dtype=np.int64)),
                "n_cross": pa.array(np.asarray(out_c, dtype=np.int64)),
                "hull_area2": pa.array(np.asarray(out_a, dtype=np.int64)),
            }
        )

    return grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: per_user(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
            ]
        ),
    )


def od_matrix(events_ds, num_buckets=32, num_partitions=8):
    """Origin-destination matrix: per user, origin = grid point of the
    FIRST event and destination = grid point of the LAST event (both in
    the journey family's (ts, event_id) order), folded to one row
    (ox, oy, dx, dy, n_users) per distinct OD pair.

    One user-keyed exchange; each partition reduces its users to local
    OD partial counts (np.unique over the packed 4-tuple) before the
    tiny 4-key groupby sum — the classic mobility-analytics rollup."""
    from ray.data.aggregate import Sum

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % num_buckets).astype(np.int32)))

    def partial(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        cols = {k: np.asarray([], dtype=np.int64) for k in ("ox", "oy", "dx", "dy")}
        n = np.asarray([], dtype=np.int64)
        if len(u):
            ts = _ts_i64(g.column("ts"))
            eid = g.column("event_id").to_numpy(zero_copy_only=False)
            order = np.lexsort((eid, ts, u))
            u, eid = u[order], eid[order]
            x = (eid % 100).astype(np.int64)
            y = ((eid // 7) % 100).astype(np.int64)
            starts = np.nonzero(np.concatenate([[True], u[1:] != u[:-1]]))[0]
            ends = np.append(starts[1:], len(u)) - 1
            # pack the OD 4-tuple (each coord < 100 < 2^7) for one unique()
            key = (
                (x[starts] << np.int64(21))
                | (y[starts] << np.int64(14))
                | (x[ends] << np.int64(7))
                | y[ends]
            )
            uk, cnt = np.unique(key, return_counts=True)
            cols = {
                "ox": uk >> np.int64(21),
                "oy": (uk >> np.int64(14)) & np.int64(127),
                "dx": (uk >> np.int64(7)) & np.int64(127),
                "dy": uk & np.int64(127),
            }
            n = cnt.astype(np.int64)
        return pa.table(
            {**{k: pa.array(v) for k, v in cols.items()}, "n_partial": pa.array(n)}
        )

    partials = grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: partial(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
            ]
        ),
    )
    return partials.groupby(["ox", "oy", "dx", "dy"]).aggregate(
        Sum("n_partial", alias_name="n_users")
    )


def stay_points(
    events_ds,
    cell_div=10,
    min_events=2,
    min_dwell_us=3_600_000_000,
    num_buckets=32,
    num_partitions=8,
):
    """Stay-point detection (the GeoLife-style mobility primitive): a
    stay is a MAXIMAL run of consecutive events (in the journey family's
    (ts, event_id) order) whose grid points fall in the same coarse cell
    (``x // cell_div``, ``y // cell_div``), with at least ``min_events``
    events and a dwell (last ts - first ts) of at least ``min_dwell_us``
    microseconds. Returns one row per user that has at least one stay:
    (user_id, n_stays, total_dwell_us, max_dwell_us) — pure int64.

    Scale shape: ONE user-keyed bucket exchange (the shared journey
    partitioning key), then a single vectorized pass per partition —
    run boundaries are a shifted-compare, run extents come from the
    boundary index arithmetic, and the per-user rollup is reduceat over
    the kept runs (users are partition-local, so rows emit directly
    with no further groupby)."""

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((u % num_buckets).astype(np.int32)))

    EMPTY = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_stays": pa.array([], type=pa.int64()),
            "total_dwell_us": pa.array([], type=pa.int64()),
            "max_dwell_us": pa.array([], type=pa.int64()),
        }
    )

    def per_user(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return EMPTY
        ts = _ts_i64(g.column("ts"))
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        cx = ((eid % 100) // cell_div).astype(np.int64)
        cy = (((eid // 7) % 100) // cell_div).astype(np.int64)
        # a run breaks on a new user OR a cell change
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])]
        )
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], len(u)) - 1
        n_run = (ends - starts + 1).astype(np.int64)
        dwell = ts[ends] - ts[starts]  # runs are ts-sorted within a user
        keep = (n_run >= min_events) & (dwell >= min_dwell_us)
        if not keep.any():
            return EMPTY
        ku, kd = u[starts][keep], dwell[keep]
        # kept runs are still user-sorted; roll up per user with reduceat
        ustarts = np.nonzero(np.concatenate([[True], ku[1:] != ku[:-1]]))[0]
        return pa.table(
            {
                "user_id": pa.array(ku[ustarts]),
                "n_stays": pa.array(np.diff(np.append(ustarts, len(ku))).astype(np.int64)),
                "total_dwell_us": pa.array(np.add.reduceat(kd, ustarts)),
                "max_dwell_us": pa.array(np.maximum.reduceat(kd, ustarts)),
            }
        )

    return grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: per_user(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
            ]
        ),
    )


ENCOUNTER_GROUP_CAP = 1024


def encounters(
    events_ds,
    cell_div=10,
    bucket_us=3_600_000_000,
    group_cap=ENCOUNTER_GROUP_CAP,
    num_buckets=32,
    num_partitions=8,
):
    """Co-location (encounter) detection: two distinct users encounter
    each other when both have at least one event in the same coarse grid
    cell (``cell_div`` as in stay_points) during the same time bucket
    (``bucket_us``-wide, epoch-aligned). Returns one row per unordered
    user pair: (user_a, user_b, n_shared) with user_a < user_b and
    n_shared = number of distinct (cell, bucket) groups they share.

    Scale shape: a per-batch combiner first reduces events to DISTINCT
    (group, user) presence rows — the exchange moves presence rows,
    never raw events — then ONE group-keyed exchange and a vectorized
    combination expansion per partition (no per-group Python loop: the
    left/right pair indices come from repeat/cumsum arithmetic over the
    group-size array). Groups larger than ``group_cap`` users keep the
    ``group_cap`` smallest user_ids and count the dropped presence rows
    via report_cap('encounter_group_truncated') — the hot-band cap
    pattern of the dedup family (a global cell×hour with millions of
    users would otherwise emit a quadratic pair set)."""
    from ray.data.aggregate import Sum

    from osm_export_tool_python_ray.state.metrics import report_cap

    def presence(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {
                    "gkey": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cx = ((eid % 100) // cell_div).astype(np.int64)
        cy = (((eid // 7) % 100) // cell_div).astype(np.int64)
        hb = ts // np.int64(bucket_us)
        ncy = np.int64(100 // cell_div + 1)
        gkey = (hb * ncy + cx) * ncy + cy
        # batch-local distinct (gkey, user) — two-column unique via lexsort
        order = np.lexsort((u, gkey))
        gs, us = gkey[order], u[order]
        first = np.concatenate([[True], (gs[1:] != gs[:-1]) | (us[1:] != us[:-1])])
        gs, us = gs[first], us[first]
        return pa.table(
            {
                "gkey": pa.array(gs),
                "user_id": pa.array(us),
                "bucket": pa.array((gs % num_buckets).astype(np.int32)),
            }
        )

    def pairs(g: pa.Table) -> pa.Table:
        EMPTY = pa.table(
            {
                "user_a": pa.array([], type=pa.int64()),
                "user_b": pa.array([], type=pa.int64()),
                "n_partial": pa.array([], type=pa.int64()),
            }
        )
        gk = g.column("gkey").to_numpy(zero_copy_only=False)
        if not len(gk):
            return EMPTY
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, gk))
        gk, u = gk[order], u[order]
        # cross-batch dedup of presence rows (same (gkey,user) may arrive
        # from several upstream batches)
        first = np.concatenate([[True], (gk[1:] != gk[:-1]) | (u[1:] != u[:-1])])
        gk, u = gk[first], u[first]
        starts = np.nonzero(np.concatenate([[True], gk[1:] != gk[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(gk)))
        over = sizes > group_cap
        if over.any():
            # keep the group_cap smallest user_ids (rows are user-sorted
            # within a group), count dropped presence rows
            rank = np.arange(len(gk)) - np.repeat(starts, sizes)
            keep = rank < group_cap
            report_cap("encounter_group_truncated", int((~keep).sum()))
            gk, u = gk[keep], u[keep]
            starts = np.nonzero(np.concatenate([[True], gk[1:] != gk[:-1]]))[0]
            sizes = np.diff(np.append(starts, len(gk)))
        # vectorized combination expansion: row r (rank k in a group of
        # size s) is the LEFT element of (s - 1 - k) pairs whose right
        # elements are the rows immediately after it
        rank = np.arange(len(gk)) - np.repeat(starts, sizes)
        left_counts = np.repeat(sizes, sizes) - 1 - rank
        total = int(left_counts.sum())
        if total == 0:
            return EMPTY
        L = np.repeat(np.arange(len(gk)), left_counts)
        offs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(offs, left_counts) + L + 1
        ua, ub = u[L], u[R]  # user-sorted within group => ua < ub
        # partition-local pair partials
        order = np.lexsort((ub, ua))
        ua, ub = ua[order], ub[order]
        nfirst = np.concatenate([[True], (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])])
        pstarts = np.nonzero(nfirst)[0]
        return pa.table(
            {
                "user_a": pa.array(ua[pstarts]),
                "user_b": pa.array(ub[pstarts]),
                "n_partial": pa.array(
                    np.diff(np.append(pstarts, len(ua))).astype(np.int64)
                ),
            }
        )

    partials = grouped_map(
        events_ds.map_batches(presence, batch_format="pyarrow"),
        "bucket",
        lambda g: pairs(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema([("gkey", pa.int64()), ("user_id", pa.int64())]),
    )

    # final pair fold via keyed_sum, NOT ray.data
    # groupby(['user_a','user_b']) — measured 15.9 s of a 17.5 s
    # encounters() run at sf0.1/32 cpus went into the two-key
    # HashAggregate (~50 k rows/s); the vectorized fold does the
    # identical sum at numpy speed (17.5 s → 5.0 s end to end).
    from osm_export_tool_python_ray.stages.exchange import keyed_sum

    return keyed_sum(
        partials,
        keys=["user_a", "user_b"],
        sums=[("n_partial", "n_shared")],
        num_buckets=num_buckets,
        num_partitions=num_partitions,
    )


def cell_peak_hour(events_ds):
    """Space-time-cube peak: per 10×10 grid cell, the hour-of-day with
    the most events — (cx, cy, peak_hour, n_peak, n_total).

    Scale shape: per-batch (cell, hour) count partials → ONE groupby
    over the bounded (cells × 24)-row aggregate table → the per-cell
    argmax is a PACKED-MAX, not a second window pass: each (cell, hour)
    row packs (n << 5) | (31 - hour) so a plain Max aggregate picks the
    largest count with smallest-hour tie-break, alongside a Sum for the
    cell total. Exchanges only ever move aggregate rows, never events."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        x = (eid % 100).astype(np.int64)
        y = ((eid // 7) % 100).astype(np.int64)
        hod = (_ts_i64(t.column("ts")) // 3_600_000_000) % 24
        key = (x // 10) * 240 + (y // 10) * 24 + hod
        uq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"ckey": pa.array(uq), "n": pa.array(cnt.astype(np.int64))}
        )

    def pack(t: pa.Table) -> pa.Table:
        ckey = t.column("ckey").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        hod = ckey % 24
        return pa.table(
            {
                "cell": pa.array(ckey // 24),
                "packed": pa.array((n << np.int64(5)) | (31 - hod)),
                "n": pa.array(n),
            }
        )

    def unpack(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        packed = t.column("packed").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cx": pa.array(cell // 10),
                "cy": pa.array(cell % 10),
                "peak_hour": pa.array(31 - (packed & np.int64(31))),
                "n_peak": pa.array(packed >> np.int64(5)),
                "n_total": t.column("n_total"),
            }
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ckey")
        .aggregate(Sum("n", alias_name="n"))
    )
    peaks = (
        counts.map_batches(pack, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Max("packed", alias_name="packed"), Sum("n", alias_name="n_total"))
    )
    return peaks.map_batches(unpack, batch_format="pyarrow")


def cells_in_polygon(cx, cy, poly):
    """Exact-integer ray-crossing test for 10×10 grid-cell CENTERS
    (10·cx+5, 10·cy+5) against integer polygon ``poly`` [(x, y), ...].
    The half-open crossing rule — edge counted iff (y1>py) != (y2>py)
    and the +x ray passes strictly left of the exact rational
    intersection (cross-multiplied, no division) — is the shared spec
    with the SQL oracle, so boundary-degenerate centers classify
    identically on both sides. Vectorized over cells × edges."""
    px = (10 * cx + 5).reshape(-1, 1)
    py = (10 * cy + 5).reshape(-1, 1)
    v = np.asarray(poly, dtype=np.int64)
    x1, y1 = v[:, 0], v[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    straddle = (y1 > py) != (y2 > py)
    d = (y2 - y1)[None, :]
    expr = (py - y1) * (x2 - x1)[None, :] - (px - x1[None, :]) * d
    crossing = straddle & (expr * np.sign(d) > 0)
    return (crossing.sum(axis=1) % 2) == 1


def aoi_cell_cover(events_ds, poly):
    """Polygon raster cover over the event grid: per-cell event counts
    for exactly the cells whose center lies inside ``poly`` —
    (cx, cy, n, id_sum). The raster side of the reference's AOI
    clipping (reference geometry.py + clipping in export): at scale the
    polygon is broadcast (tiny), events fold to per-cell aggregates
    per batch, ONE groupby moves only cell rows, and the PIP filter
    runs on the bounded cell table."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        x = (eid % 100).astype(np.int64)
        y = ((eid // 7) % 100).astype(np.int64)
        key = (x // 10) * 10 + (y // 10)
        uq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uq), dtype=np.int64)
        np.add.at(sums, inv, eid)
        return pa.table(
            {
                "ckey": pa.array(uq),
                "n": pa.array(cnt.astype(np.int64)),
                "id_sum": pa.array(sums),
            }
        )

    def pip_filter(t: pa.Table) -> pa.Table:
        ckey = t.column("ckey").to_numpy(zero_copy_only=False)
        cx, cy = ckey // 10, ckey % 10
        inside = cells_in_polygon(cx, cy, poly)
        return pa.table(
            {
                "cx": pa.array(cx[inside]),
                "cy": pa.array(cy[inside]),
                "n": pa.array(t.column("n").to_numpy(zero_copy_only=False)[inside]),
                "id_sum": pa.array(
                    t.column("id_sum").to_numpy(zero_copy_only=False)[inside]
                ),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ckey")
        .aggregate(Sum("n", alias_name="n"), Sum("id_sum", alias_name="id_sum"))
        .map_batches(pip_filter, batch_format="pyarrow")
    )


def _compact_levels(x, y, top_bits, cut_bits):
    """Local quadtree compaction from unit cells at ``top_bits`` down to
    ``cut_bits``: returns (cover_rows, full_cut_cells) where cover_rows is
    a list of (res, cx, cy) arrays for cells IN the compact cover at
    levels (cut_bits, top_bits], and full_cut_cells the (cx, cy) arrays of
    fully-covered level-``cut_bits`` cells (all 4^(top-cut) descendants
    present). Pure numpy on packed keys; exact set semantics."""
    key = (x.astype(np.int64) << np.int64(top_bits)) | y.astype(np.int64)
    cur = np.unique(key)
    out = []
    for lvl in range(top_bits, cut_bits, -1):
        cx = cur >> np.int64(top_bits)
        cy = cur & np.int64((1 << top_bits) - 1)
        pkey = ((cx >> 1) << np.int64(top_bits)) | (cy >> 1)
        up, inv, cnt = np.unique(pkey, return_inverse=True, return_counts=True)
        full = cnt == 4
        # cover at this level: cells whose parent is NOT fully covered
        keep = ~full[inv]
        out.append((lvl, cx[keep], cy[keep]))
        cur = up[full]  # already (px << top_bits) | py — the next level's keys
    fx = cur >> np.int64(top_bits)
    fy = cur & np.int64((1 << top_bits) - 1)
    return out, (fx, fy)


def compact_cover(events_ds, top_bits=6, cut_bits=3, num_buckets=32, num_partitions=8):
    """Minimal multi-resolution quadtree cover of the occupied event
    cells — the H3 ``compact`` analog. Leaf cells come from a Lehmer-LCG
    scramble of event_id (c = id·48271 mod 65537 mod 4096; x = c % 64,
    y = c ∕∕ 64): the journey 100-grid point family is a 1-D lattice
    (≤ 7·side distinct cells — full 2×2 sibling blocks NEVER occur), so
    this op uses a mixing derivation that actually fills 2-D space with
    binomial collisions and the rollup is exercised at test scales
    (sf0.01: ~97% occupancy, full blocks through 8×8)
    at level ``top_bits`` (cell size 1 in a 2^top_bits space); a parent
    replaces its children iff ALL FOUR are covered, recursively. Output
    (res, cx, cy): the unique minimal cover, union over levels.

    Scale shape: compaction above level ``cut_bits`` is LOCAL to a
    level-``cut_bits`` subtree (a cell is replaced only by ancestors
    within its own subtree), so ONE exchange keyed by the subtree id
    computes levels (cut, top] with per-batch distinct-cell combining
    ahead of it; the top levels [0, cut] see only the ≤ 4^cut_bits
    fully-covered-subtree marker cells, folded in a second constant-key
    exchange over that bounded table. No driver-side set logic."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map, union_all

    OUT = pa.schema([("res", pa.int64()), ("cx", pa.int64()), ("cy", pa.int64())])

    def empty():
        return pa.table({f.name: pa.array([], type=f.type) for f in OUT})

    def leaf_partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        if not len(eid):
            return pa.table(
                {
                    "x": pa.array([], type=pa.int64()),
                    "y": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        c = (eid.astype(np.int64) * 48271) % 65537 % (1 << (2 * top_bits))
        x = c % (1 << top_bits)
        y = c // (1 << top_bits)
        key = np.unique((x << np.int64(top_bits)) | y)  # batch-local distinct
        x = key >> np.int64(top_bits)
        y = key & np.int64((1 << top_bits) - 1)
        shift = np.int64(top_bits - cut_bits)  # unit cell → its subtree cell
        sub = ((x >> shift) << np.int64(cut_bits)) | (y >> shift)
        return pa.table(
            {
                "x": pa.array(x),
                "y": pa.array(y),
                "bucket": pa.array((sub % num_buckets).astype(np.int32)),
            }
        )

    def subtree_compact(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty()
        x = g.column("x").to_numpy(zero_copy_only=False)
        y = g.column("y").to_numpy(zero_copy_only=False)
        rows, (fx, fy) = _compact_levels(x, y, top_bits, cut_bits)
        res = [np.full(len(cx), lvl, dtype=np.int64) for lvl, cx, _cy in rows]
        cxs = [cx for _l, cx, _cy in rows]
        cys = [cy for _l, _cx, cy in rows]
        # fully-covered cut-level cells ride along as marker rows (res=cut)
        res.append(np.full(len(fx), cut_bits, dtype=np.int64))
        cxs.append(fx)
        cys.append(fy)
        return pa.table(
            {
                "res": pa.array(np.concatenate(res)),
                "cx": pa.array(np.concatenate(cxs)),
                "cy": pa.array(np.concatenate(cys)),
            }
        )

    compacted = grouped_map(
        events_ds.map_batches(leaf_partial, batch_format="pyarrow"),
        "bucket",
        lambda g: subtree_compact(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema([("x", pa.int64()), ("y", pa.int64())]),
    )

    def deep_only(t: pa.Table) -> pa.Table:
        r = t.column("res").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(r > cut_bits))

    def marker_only(t: pa.Table) -> pa.Table:
        r = t.column("res").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(r == cut_bits))
        return t.append_column(
            "bucket", pa.array(np.zeros(t.num_rows, dtype=np.int32))
        )

    def top_compact(g: pa.Table) -> pa.Table:
        # ≤ 4^cut_bits fully-covered cut-level cells: rerun the identical
        # local compaction from level cut_bits up to the root
        if g.num_rows == 0:
            return empty()
        x = g.column("cx").to_numpy(zero_copy_only=False)
        y = g.column("cy").to_numpy(zero_copy_only=False)
        rows, (fx, fy) = _compact_levels(x, y, cut_bits, 0)
        res = [np.full(len(cx), lvl, dtype=np.int64) for lvl, cx, _cy in rows]
        cxs = [cx for _l, cx, _cy in rows]
        cys = [cy for _l, _cx, cy in rows]
        # a fully-covered ROOT (level 0) is its own cover
        res.append(np.full(len(fx), 0, dtype=np.int64))
        cxs.append(fx)
        cys.append(fy)
        return pa.table(
            {
                "res": pa.array(np.concatenate(res)),
                "cx": pa.array(np.concatenate(cxs)),
                "cy": pa.array(np.concatenate(cys)),
            }
        )

    deep = compacted.map_batches(deep_only, batch_format="pyarrow")
    top = grouped_map(
        compacted.map_batches(marker_only, batch_format="pyarrow"),
        "bucket",
        lambda g: top_compact(g.drop_columns(["bucket"])),
        num_partitions=1,
        payload_schema=OUT,
    )
    return union_all(deep, top)


def points_in_polygon(px, py, poly):
    """Exact-integer ray-crossing PIP for raw integer points — the
    identical half-open rule as cells_in_polygon (which tests 10·c+5 cell
    CENTERS); shared-spec with the SQL oracle so boundary-degenerate
    points classify identically on both sides."""
    px = np.asarray(px, dtype=np.int64).reshape(-1, 1)
    py = np.asarray(py, dtype=np.int64).reshape(-1, 1)
    v = np.asarray(poly, dtype=np.int64)
    x1, y1 = v[:, 0], v[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    straddle = (y1 > py) != (y2 > py)
    d = (y2 - y1)[None, :]
    expr = (py - y1) * (x2 - x1)[None, :] - (px - x1[None, :]) * d
    crossing = straddle & (expr * np.sign(d) > 0)
    return (crossing.sum(axis=1) % 2) == 1


def geofence_dwell(events_ds, poly, num_buckets=32, num_partitions=8):
    """Geofence enter/exit state machine: per user, how many separate
    VISITS (maximal runs of consecutive in-fence events in (ts, event_id)
    order) they made to polygon ``poly``, how many events fell inside,
    and the total dwell time (µs between the first and last event of each
    visit — single-event visits dwell 0). The ordered-stream op a
    location-analytics pipeline runs after sessionization; exact int64
    everywhere (the PIP rule is points_in_polygon's shared spec).

    Scale shape: the polygon is broadcast by closure (tiny); the inside
    flag is computed per BATCH (vectorized points×edges) so the one
    user-keyed exchange moves (user, ts, flag) rows with the flag already
    resolved; episode detection is a vectorized boundary scan per
    partition. Users with no in-fence events emit nothing."""

    def flagged(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.int64()),
                    "eid": pa.array([], type=pa.int64()),
                    "inside": pa.array([], type=pa.bool_()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = eid % 100
        y = (eid // 7) % 100
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64)),
                "ts": pa.array(_ts_i64(t.column("ts"))),
                "eid": pa.array(eid),
                "inside": pa.array(points_in_polygon(x, y, poly)),
                "bucket": pa.array((u % num_buckets).astype(np.int32)),
            }
        )

    def episodes(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_episodes", pa.int64()),
                ("n_inside", pa.int64()),
                ("dwell_us", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return pa.table({f.name: pa.array([], type=f.type) for f in OUT})
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        ins = g.column("inside").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, ins = u[order], ts[order], ins[order]
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        entry = ins & (new_user | ~np.concatenate([[False], ins[:-1]]))
        if not entry.any():
            return pa.table({f.name: pa.array([], type=f.type) for f in OUT})
        # episode id per inside-row: cumsum of entries
        epi = np.cumsum(entry) - 1
        ik = np.nonzero(ins)[0]
        ep = epi[ik]
        starts = np.nonzero(np.concatenate([[True], ep[1:] != ep[:-1]]))[0]
        ends = np.append(starts[1:], len(ik)) - 1
        ep_user = u[ik[starts]]
        dwell = ts[ik[ends]] - ts[ik[starts]]
        n_in = np.diff(np.append(starts, len(ik))).astype(np.int64)
        # fold per user (episodes of one user are contiguous in ep order)
        ustarts = np.nonzero(
            np.concatenate([[True], ep_user[1:] != ep_user[:-1]])
        )[0]
        return pa.table(
            {
                "user_id": pa.array(ep_user[ustarts]),
                "n_episodes": pa.array(
                    np.diff(np.append(ustarts, len(ep_user))).astype(np.int64)
                ),
                "n_inside": pa.array(np.add.reduceat(n_in, ustarts)),
                "dwell_us": pa.array(np.add.reduceat(dwell, ustarts)),
            }
        )

    return grouped_map(
        events_ds.map_batches(flagged, batch_format="pyarrow"),
        "bucket",
        lambda g: episodes(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.int64()),
                ("eid", pa.int64()),
                ("inside", pa.bool_()),
            ]
        ),
    )


def reciprocal_partners(events_ds, cell_div=10, bucket_us=3_600_000_000,
                        num_buckets=32, num_partitions=8):
    """Mutual top-partner matching over the encounter graph — the
    reciprocal-nearest-neighbor primitive (entity-resolution / matching
    family): each user's TOP co-presence partner (max n_shared, ties to
    the smallest partner id), kept only when the choice is MUTUAL.
    → (user_a, user_b, n_shared) with user_a < user_b.

    Scale shape: builds on ``encounters`` (whose exchange moves distinct
    presence rows, never events); the pair table then makes two tiny
    keyed hops — per-user top-1 via a user-keyed exchange (vectorized
    lexsort + group-first, the topk combiner shape), then a mutuality
    check via an unordered-pair-keyed exchange where a pair is emitted
    iff BOTH directed top-1 rows arrive. Everything past the first
    exchange moves O(users) rows."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    pairs = encounters(
        events_ds,
        cell_div=cell_div,
        bucket_us=bucket_us,
        num_buckets=num_buckets,
        num_partitions=num_partitions,
    )

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "u": pa.array([], type=pa.int64()),
                    "p": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        ua = t.column("user_a").to_numpy(zero_copy_only=False)
        ub = t.column("user_b").to_numpy(zero_copy_only=False)
        w = t.column("n_shared").to_numpy(zero_copy_only=False)
        u = np.concatenate([ua, ub])
        p = np.concatenate([ub, ua])
        ww = np.concatenate([w, w]).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(u),
                "p": pa.array(p),
                "w": pa.array(ww),
                "bucket": pa.array((u % num_buckets).astype(np.int32)),
            }
        )

    def top1(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "u": pa.array([], type=pa.int64()),
                    "p": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        u = g.column("u").to_numpy(zero_copy_only=False)
        p = g.column("p").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        # per u: max w, tie → smallest p
        order = np.lexsort((p, -w, u))
        u, p, w = u[order], p[order], w[order]
        first = np.concatenate([[True], u[1:] != u[:-1]])
        u, p, w = u[first], p[first], w[first]
        lo = np.minimum(u, p)
        hi = np.maximum(u, p)
        pk = lo * np.int64(1_000_003) + hi
        return pa.table(
            {
                "u": pa.array(u),
                "p": pa.array(p),
                "w": pa.array(w),
                "bucket": pa.array((pk % num_buckets).astype(np.int32)),
            }
        )

    def mutual(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [
                ("user_a", pa.int64()),
                ("user_b", pa.int64()),
                ("n_shared", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return pa.table({f.name: pa.array([], type=f.type) for f in OUT})
        u = g.column("u").to_numpy(zero_copy_only=False)
        p = g.column("p").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        lo = np.minimum(u, p)
        hi = np.maximum(u, p)
        order = np.lexsort((hi, lo))
        lo, hi, w = lo[order], hi[order], w[order]
        # a mutual pair contributes exactly TWO rows with the same (lo, hi)
        same_prev = np.concatenate(
            [[False], (lo[1:] == lo[:-1]) & (hi[1:] == hi[:-1])]
        )
        return pa.table(
            {
                "user_a": pa.array(lo[same_prev]),
                "user_b": pa.array(hi[same_prev]),
                "n_shared": pa.array(w[same_prev]),
            }
        )

    SCHEMA = pa.schema([("u", pa.int64()), ("p", pa.int64()), ("w", pa.int64())])
    tops = grouped_map(
        pairs.map_batches(expand, batch_format="pyarrow"),
        "bucket",
        lambda g: top1(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=SCHEMA,
    )
    return grouped_map(
        tops,
        "bucket",
        lambda g: mutual(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=SCHEMA,
    )


def session_bigrams(events_ds, gap_us=1_800_000_000, k=15,
                    num_buckets=32, num_partitions=8):
    """Sequential pattern mining, order-1: the top-k event-type BIGRAMS
    (consecutive events of one user within a session — gap ≤ ``gap_us``)
    across the corpus, by (count desc, a, b). The "what do users do
    next" primitive funnels/Markov models are built from.

    Scale shape: ONE user-keyed exchange of (user, ts, type) rows; the
    bigram extraction is a shifted-comparison per partition (no per-user
    loop); per-partition (a, b) partial counts fold through a tiny
    groupby; the distinct-bigram table is |types|² rows, so the final
    distributed sort+limit moves nothing."""
    from ray.data.aggregate import Sum

    def keyed(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.int64()),
                    "eid": pa.array([], type=pa.int64()),
                    "event_type": pa.array([], type=pa.string()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64)),
                "ts": pa.array(_ts_i64(t.column("ts"))),
                "eid": pa.array(
                    t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "event_type": t.column("event_type"),
                "bucket": pa.array((u % num_buckets).astype(np.int32)),
            }
        )

    def partial(g: pa.Table) -> pa.Table:
        EMPTY = pa.table(
            {
                "a": pa.array([], type=pa.string()),
                "b": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return EMPTY
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        keep = (u[1:] == u[:-1]) & (ts[1:] - ts[:-1] <= gap_us)
        if not keep.any():
            return EMPTY
        a = et[:-1][keep]
        b = et[1:][keep]
        pt = pa.table(
            {
                "a": pa.array(list(a), type=pa.string()),
                "b": pa.array(list(b), type=pa.string()),
            }
        )
        agg = pt.group_by(["a", "b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "a": agg.column("a"),
                "b": agg.column("b"),
                "n": agg.column("count_all"),
            }
        )

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    partials = grouped_map(
        events_ds.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        lambda g: partial(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.int64()),
                ("eid", pa.int64()),
                ("event_type", pa.string()),
            ]
        ),
    )
    return (
        partials.groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "a", "b"], descending=[True, False, False])
        .limit(k)
    )


def convoys(
    events_ds,
    cell_div=10,
    bucket_us=3_600_000_000,
    min_len=2,
    group_cap=ENCOUNTER_GROUP_CAP,
    num_buckets=32,
    num_partitions=8,
):
    """Convoy / flock detection (the grid-relaxed convoy pattern of
    Jeung et al., VLDB 2008): a convoy is a MAXIMAL run of >= ``min_len``
    CONSECUTIVE time buckets in each of which two users share at least
    one coarse grid cell. Returns one row per unordered user pair
    (user_a < user_b) that has at least one qualifying run:
    (user_a, user_b, n_convoys, longest_run) where n_convoys counts the
    maximal runs of length >= min_len and longest_run is the longest of
    them. Extends encounters() — which ignores WHEN the shared bins
    happen — with the temporal-consecutiveness constraint trajectory
    mining actually needs (a pair meeting 5 scattered hours apart is
    noise; 5 hours in a row is a convoy).

    Scale shape: the encounters presence combiner (DISTINCT (cell,
    bucket, user) rows move, never events) and the same vectorized
    combination expansion under the counted ``encounter_group_truncated``
    cap, except pair rows KEEP their time bucket; a second pair-keyed
    exchange then runs gaps-and-islands per pair (sorted distinct bins ->
    run boundaries where the bin step != 1 -> lengths via reduceat) and
    emits final rows with no further groupby. Two keyed exchanges total,
    both moving aggregate-sized rows; all arithmetic int64.

    No reference analog — engine mandate (trajectory-mining family).
    """
    from osm_export_tool_python_ray.state.metrics import report_cap

    ncy = np.int64(100 // cell_div + 1)

    def presence(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {
                    "gkey": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cx = ((eid % 100) // cell_div).astype(np.int64)
        cy = (((eid // 7) % 100) // cell_div).astype(np.int64)
        hb = ts // np.int64(bucket_us)
        gkey = (hb * ncy + cx) * ncy + cy
        order = np.lexsort((u, gkey))
        gs, us = gkey[order], u[order]
        first = np.concatenate([[True], (gs[1:] != gs[:-1]) | (us[1:] != us[:-1])])
        gs, us = gs[first], us[first]
        return pa.table(
            {
                "gkey": pa.array(gs),
                "user_id": pa.array(us),
                "bucket": pa.array((gs % num_buckets).astype(np.int32)),
            }
        )

    PAIRBIN_EMPTY = pa.table(
        {
            "user_a": pa.array([], type=pa.int64()),
            "user_b": pa.array([], type=pa.int64()),
            "hb": pa.array([], type=pa.int64()),
            "pbucket": pa.array([], type=pa.int32()),
        }
    )

    def pair_bins(g: pa.Table) -> pa.Table:
        """Per (cell, bucket) group: expand user combinations, emit
        partition-local DISTINCT (user_a, user_b, bucket) rows."""
        gk = g.column("gkey").to_numpy(zero_copy_only=False)
        if not len(gk):
            return PAIRBIN_EMPTY
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, gk))
        gk, u = gk[order], u[order]
        first = np.concatenate([[True], (gk[1:] != gk[:-1]) | (u[1:] != u[:-1])])
        gk, u = gk[first], u[first]
        starts = np.nonzero(np.concatenate([[True], gk[1:] != gk[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(gk)))
        over = sizes > group_cap
        if over.any():
            rank = np.arange(len(gk)) - np.repeat(starts, sizes)
            keep = rank < group_cap
            report_cap("encounter_group_truncated", int((~keep).sum()))
            gk, u = gk[keep], u[keep]
            starts = np.nonzero(np.concatenate([[True], gk[1:] != gk[:-1]]))[0]
            sizes = np.diff(np.append(starts, len(gk)))
        rank = np.arange(len(gk)) - np.repeat(starts, sizes)
        left_counts = np.repeat(sizes, sizes) - 1 - rank
        total = int(left_counts.sum())
        if total == 0:
            return PAIRBIN_EMPTY
        L = np.repeat(np.arange(len(gk)), left_counts)
        offs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(offs, left_counts) + L + 1
        ua, ub = u[L], u[R]  # user-sorted within group => ua < ub
        hb = gk[L] // (ncy * ncy)  # floor div recovers the bucket for hb < 0 too
        # partition-local distinct (ua, ub, hb) — same pair+bucket via two
        # different shared cells must count once
        order = np.lexsort((hb, ub, ua))
        ua, ub, hb = ua[order], ub[order], hb[order]
        first = np.concatenate(
            [
                [True],
                (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1]) | (hb[1:] != hb[:-1]),
            ]
        )
        ua, ub, hb = ua[first], ub[first], hb[first]
        return pa.table(
            {
                "user_a": pa.array(ua),
                "user_b": pa.array(ub),
                "hb": pa.array(hb),
                "pbucket": pa.array(
                    ((ua * np.int64(1000003) + ub) % num_buckets).astype(np.int32)
                ),
            }
        )

    RESULT_EMPTY = pa.table(
        {
            "user_a": pa.array([], type=pa.int64()),
            "user_b": pa.array([], type=pa.int64()),
            "n_convoys": pa.array([], type=pa.int64()),
            "longest_run": pa.array([], type=pa.int64()),
        }
    )

    def islands(g: pa.Table) -> pa.Table:
        """All rows of a pair are in this partition: dedup (cross-
        partition duplicates of the same (pair, bucket) from different
        cells), then gaps-and-islands over the sorted bucket axis."""
        ua = g.column("user_a").to_numpy(zero_copy_only=False)
        if not len(ua):
            return RESULT_EMPTY
        ub = g.column("user_b").to_numpy(zero_copy_only=False)
        hb = g.column("hb").to_numpy(zero_copy_only=False)
        order = np.lexsort((hb, ub, ua))
        ua, ub, hb = ua[order], ub[order], hb[order]
        first = np.concatenate(
            [
                [True],
                (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1]) | (hb[1:] != hb[:-1]),
            ]
        )
        ua, ub, hb = ua[first], ub[first], hb[first]
        new_pair = np.concatenate(
            [[True], (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])]
        )
        run_start = new_pair.copy()
        run_start[1:] |= hb[1:] != hb[:-1] + 1
        starts = np.nonzero(run_start)[0]
        run_len = np.diff(np.append(starts, len(ua))).astype(np.int64)
        rua, rub = ua[starts], ub[starts]
        keep = run_len >= min_len
        if not keep.any():
            return RESULT_EMPTY
        kua, kub, klen = rua[keep], rub[keep], run_len[keep]
        ps = np.nonzero(
            np.concatenate([[True], (kua[1:] != kua[:-1]) | (kub[1:] != kub[:-1])])
        )[0]
        return pa.table(
            {
                "user_a": pa.array(kua[ps]),
                "user_b": pa.array(kub[ps]),
                "n_convoys": pa.array(np.diff(np.append(ps, len(kua))).astype(np.int64)),
                "longest_run": pa.array(np.maximum.reduceat(klen, ps)),
            }
        )

    pair_rows = grouped_map(
        events_ds.map_batches(presence, batch_format="pyarrow"),
        "bucket",
        lambda g: pair_bins(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema([("gkey", pa.int64()), ("user_id", pa.int64())]),
    )
    return grouped_map(
        pair_rows,
        "pbucket",
        lambda g: islands(g.drop_columns(["pbucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("user_a", pa.int64()), ("user_b", pa.int64()), ("hb", pa.int64())]
        ),
    )
