"""Cross-user segment-crossing join: which user pairs' trajectories
properly CROSS (not merely co-locate — stages/journey.py encounters), and
how many times.

The op is the line×line flavor of the spatial-join family: build each
user's trajectory segments, block them into coarse grid cells, and test
PROPER intersection (both orientation pairs strictly straddle — the exact
integer predicate of journey.py count_proper_crossings, here applied
across users) only within a cell. A ``max_step`` filter drops teleport
segments first — the standard GPS-trace cleaning step; without it a
synthetic zig-zag corpus makes every segment span the whole grid and no
blocking scheme (ours or anyone's) can prune an all-pairs explosion.

Scale shape:
- ONE user-keyed exchange builds ordered segments (segments need a user's
  events contiguous+sorted; per-batch combining cannot know order).
- Segments replicate to every cell their bbox overlaps (≤4 copies when
  ``max_step < cell``), then ONE cell-keyed exchange co-locates them; the
  pair test is vectorized candidate-pair arithmetic per cell (the
  repeat/cumsum expansion of journey.py encounters) — never a Python loop
  over pairs.
- A pair discovered in several shared cells dedups through ONE exchange
  keyed by the pair identity, which moves only CROSSING pairs (≪
  candidates); per-partition partial counts fold with a final tiny
  groupby — the combiner shape of the dedup family.
- Oversized cells truncate deterministically under a counted cap
  (``report_cap('crossing_cell_truncated')``) — the hot-band pattern;
  never hit at oracle scales (asserted in tests).

Reference analog: none (engine mandate — geospatial join family).
"""

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get  # noqa: F401  (parity import pattern)
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map
from osm_export_tool_python_ray.state.metrics import report_cap

_SEG_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("sidx", pa.int64()),
        ("ax", pa.int64()),
        ("ay", pa.int64()),
        ("bx", pa.int64()),
        ("by", pa.int64()),
    ]
)

_PAIR_SCHEMA = pa.schema(
    [
        ("user_a", pa.int64()),
        ("sa", pa.int64()),
        ("user_b", pa.int64()),
        ("sb", pa.int64()),
    ]
)


def _ts_i64(col):
    return (
        col.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    )


def _empty(schema, extra=()):
    cols = {f.name: pa.array([], type=f.type) for f in schema}
    for name, typ in extra:
        cols[name] = pa.array([], type=typ)
    return pa.table(cols)


def segment_crossings(
    events_ds,
    max_step=15,
    cell=16,
    grid=100,
    num_buckets=32,
    num_partitions=8,
    cell_seg_cap=500_000,
):
    """→ (user_a, user_b, n_cross): per unordered user pair (user_a <
    user_b), the number of properly-crossing trajectory segment pairs.

    Points are the deterministic synthetic integer grid (x = event_id %
    ``grid``, y = ⌊event_id/7⌋ % ``grid`` — the journey.py family);
    per-user order is (ts, event_id). Segments longer than ``max_step``
    in either axis (teleports) and zero-length segments are dropped.
    Proper crossing = both orientation-product pairs strictly negative —
    exact int64 arithmetic the SQL oracle evaluates verbatim (coords <
    2^7, products < 2^17: no overflow on either side)."""

    # ---- stage A: user-keyed exchange → ordered segments ----------------
    def keyed(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return _empty(
                pa.schema(
                    [("user_id", pa.int64()), ("ts", pa.int64()), ("eid", pa.int64())]
                ),
                extra=(("bucket", pa.int32()),),
            )
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64)),
                "ts": pa.array(_ts_i64(t.column("ts"))),
                "eid": pa.array(
                    t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "bucket": pa.array((u % num_buckets).astype(np.int32)),
            }
        )

    def build_segments(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty(_SEG_SCHEMA)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        x = eid % grid
        y = (eid // 7) % grid
        # consecutive rows of the same user form a segment
        same = u[1:] == u[:-1]
        ax, ay, bx, by = x[:-1], y[:-1], x[1:], y[1:]
        keep = (
            same
            & ~((ax == bx) & (ay == by))
            & (np.abs(bx - ax) <= max_step)
            & (np.abs(by - ay) <= max_step)
        )
        # sidx: rank within user (identifies a segment across cell copies)
        starts = np.concatenate([[True], ~same])
        sidx = np.arange(len(u)) - np.repeat(
            np.nonzero(starts)[0], np.diff(np.append(np.nonzero(starts)[0], len(u)))
        )
        idx = np.nonzero(keep)[0]
        return pa.table(
            {
                "user_id": pa.array(u[idx]),
                "sidx": pa.array(sidx[idx]),
                "ax": pa.array(ax[idx]),
                "ay": pa.array(ay[idx]),
                "bx": pa.array(bx[idx]),
                "by": pa.array(by[idx]),
            }
        )

    segs = grouped_map(
        events_ds.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        lambda g: build_segments(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("user_id", pa.int64()), ("ts", pa.int64()), ("eid", pa.int64())]
        ),
    )

    # ---- stage B: replicate to overlapped cells -------------------------
    ncells = (grid + cell - 1) // cell

    def to_cells(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(_SEG_SCHEMA, extra=(("cellkey", pa.int64()), ("bucket", pa.int32())))
        ax = t.column("ax").to_numpy(zero_copy_only=False)
        ay = t.column("ay").to_numpy(zero_copy_only=False)
        bx = t.column("bx").to_numpy(zero_copy_only=False)
        by = t.column("by").to_numpy(zero_copy_only=False)
        cx0 = np.minimum(ax, bx) // cell
        cx1 = np.maximum(ax, bx) // cell
        cy0 = np.minimum(ay, by) // cell
        cy1 = np.maximum(ay, by) // cell
        nx = (cx1 - cx0 + 1).astype(np.int64)
        ny = (cy1 - cy0 + 1).astype(np.int64)
        ncopy = nx * ny
        rows = np.repeat(np.arange(t.num_rows), ncopy)
        # rank of each copy within its row → (dx, dy) offset
        offs = np.concatenate([[np.int64(0)], np.cumsum(ncopy)])[:-1]
        rank = np.arange(int(ncopy.sum())) - np.repeat(offs, ncopy)
        dx = rank // ny[rows]
        dy = rank % ny[rows]
        ck = (cx0[rows] + dx) * ncells + (cy0[rows] + dy)
        rep = t.take(pa.array(rows))
        rep = rep.append_column("cellkey", pa.array(ck))
        return rep.append_column("bucket", pa.array((ck % num_buckets).astype(np.int32)))

    placed = segs.map_batches(to_cells, batch_format="pyarrow")

    # ---- stage C: per-cell candidate pairs + exact predicate ------------
    def cell_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty(_PAIR_SCHEMA)
        ck = g.column("cellkey").to_numpy(zero_copy_only=False)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        si = g.column("sidx").to_numpy(zero_copy_only=False)
        ax = g.column("ax").to_numpy(zero_copy_only=False)
        ay = g.column("ay").to_numpy(zero_copy_only=False)
        bx = g.column("bx").to_numpy(zero_copy_only=False)
        by = g.column("by").to_numpy(zero_copy_only=False)
        order = np.lexsort((si, u, ck))
        ck, u, si, ax, ay, bx, by = (
            a[order] for a in (ck, u, si, ax, ay, bx, by)
        )
        starts = np.nonzero(np.concatenate([[True], ck[1:] != ck[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(ck)))
        over = sizes > cell_seg_cap
        if over.any():
            rank = np.arange(len(ck)) - np.repeat(starts, sizes)
            keep = rank < cell_seg_cap
            report_cap("crossing_cell_truncated", int((~keep).sum()))
            ck, u, si, ax, ay, bx, by = (
                a[keep] for a in (ck, u, si, ax, ay, bx, by)
            )
            starts = np.nonzero(np.concatenate([[True], ck[1:] != ck[:-1]]))[0]
            sizes = np.diff(np.append(starts, len(ck)))
        # candidate (i, j) with i < j inside each cell — repeat/cumsum
        rank = np.arange(len(ck)) - np.repeat(starts, sizes)
        left_counts = np.repeat(sizes, sizes) - 1 - rank
        total = int(left_counts.sum())
        if total == 0:
            return _empty(_PAIR_SCHEMA)
        L = np.repeat(np.arange(len(ck)), left_counts)
        offs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(offs, left_counts) + L + 1
        cand = u[L] != u[R]
        L, R = L[cand], R[cand]
        # bbox prefilter (cheap, kills most candidates before 8 multiplies)
        ov = (
            (np.minimum(ax[L], bx[L]) <= np.maximum(ax[R], bx[R]))
            & (np.maximum(ax[L], bx[L]) >= np.minimum(ax[R], bx[R]))
            & (np.minimum(ay[L], by[L]) <= np.maximum(ay[R], by[R]))
            & (np.maximum(ay[L], by[L]) >= np.minimum(ay[R], by[R]))
        )
        L, R = L[ov], R[ov]
        if not len(L):
            return _empty(_PAIR_SCHEMA)
        uxL, uyL = bx[L] - ax[L], by[L] - ay[L]
        d1 = uxL * (ay[R] - ay[L]) - uyL * (ax[R] - ax[L])
        d2 = uxL * (by[R] - ay[L]) - uyL * (bx[R] - ax[L])
        uxR, uyR = bx[R] - ax[R], by[R] - ay[R]
        d3 = uxR * (ay[L] - ay[R]) - uyR * (ax[L] - ax[R])
        d4 = uxR * (by[L] - ay[R]) - uyR * (bx[L] - ax[R])
        cross = (d1 * d2 < 0) & (d3 * d4 < 0)
        L, R = L[cross], R[cross]
        if not len(L):
            return _empty(_PAIR_SCHEMA)
        # canonical orientation: user_a < user_b (users differ by filter)
        swap = u[L] > u[R]
        la = np.where(swap, R, L)
        rb = np.where(swap, L, R)
        return pa.table(
            {
                "user_a": pa.array(u[la]),
                "sa": pa.array(si[la]),
                "user_b": pa.array(u[rb]),
                "sb": pa.array(si[rb]),
            }
        )

    pairs = grouped_map(
        placed,
        "bucket",
        lambda g: cell_pairs(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            list(_SEG_SCHEMA) + [pa.field("cellkey", pa.int64())]
        ),
    )

    # ---- stage D: cross-cell pair dedup + per-user-pair partial counts --
    def pair_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(_PAIR_SCHEMA, extra=(("bucket", pa.int32()),))
        ua = t.column("user_a").to_numpy(zero_copy_only=False)
        sa = t.column("sa").to_numpy(zero_copy_only=False)
        ub = t.column("user_b").to_numpy(zero_copy_only=False)
        sb = t.column("sb").to_numpy(zero_copy_only=False)
        h = (ua * 1_000_003 + sa) ^ (ub * 998_244_353 + sb)
        return t.append_column(
            "bucket", pa.array((h % num_buckets).astype(np.int32))
        )

    def count_partial(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty(
                pa.schema(
                    [
                        ("user_a", pa.int64()),
                        ("user_b", pa.int64()),
                        ("n_partial", pa.int64()),
                    ]
                )
            )
        ua = g.column("user_a").to_numpy(zero_copy_only=False)
        sa = g.column("sa").to_numpy(zero_copy_only=False)
        ub = g.column("user_b").to_numpy(zero_copy_only=False)
        sb = g.column("sb").to_numpy(zero_copy_only=False)
        order = np.lexsort((sb, ub, sa, ua))
        ua, sa, ub, sb = ua[order], sa[order], ub[order], sb[order]
        first = np.concatenate(
            [
                [True],
                (ua[1:] != ua[:-1])
                | (sa[1:] != sa[:-1])
                | (ub[1:] != ub[:-1])
                | (sb[1:] != sb[:-1]),
            ]
        )
        ua, ub = ua[first], ub[first]
        # partial per (user_a, user_b) — rows are already (ua, ub)-sorted
        pfirst = np.concatenate(
            [[True], (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])]
        )
        ps = np.nonzero(pfirst)[0]
        return pa.table(
            {
                "user_a": pa.array(ua[ps]),
                "user_b": pa.array(ub[ps]),
                "n_partial": pa.array(np.diff(np.append(ps, len(ua))).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    partials = grouped_map(
        pairs.map_batches(pair_bucket, batch_format="pyarrow"),
        "bucket",
        lambda g: count_partial(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=_PAIR_SCHEMA,
    )
    # keyed_sum fold, not ray.data's row-walking two-key HashAggregate
    # (see stages/exchange.py keyed_sum — measured 300× on the fold)
    from osm_export_tool_python_ray.stages.exchange import keyed_sum

    return keyed_sum(
        partials,
        keys=["user_a", "user_b"],
        sums=[("n_partial", "n_cross")],
        num_buckets=num_buckets,
        num_partitions=num_partitions,
    )
