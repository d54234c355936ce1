"""Interval×interval overlap join: which user pairs were ACTIVE AT THE
SAME TIME (overlapping sessions), for how long.

Completes the temporal-join family: stages/temporal.py has the keyed AS-OF
join (point←latest point) and the unkeyed time-RANGE join
(interval×point); this is the third member, interval×interval, the shape
of co-presence / concurrent-session / resource-contention analyses.

Scale shape (the range_join pattern, plus canonical attribution instead
of a dedup exchange):
- ONE user-keyed exchange sessionizes events (>gap_us split — identical
  rule to the events_sessions query); the exchange output is tiny session
  rows (user, start, end), never raw events.
- Sessions replicate to every fixed ``epoch_us`` bucket they span
  (factor = len/epoch + 1), then ONE epoch-keyed exchange co-locates
  candidates; pairing is the vectorized repeat/cumsum candidate expansion
  per epoch.
- A pair overlapping across several epochs is counted ONCE, in the epoch
  containing the OVERLAP START (max of the two session starts — inside
  both sessions, so both replicas are present there). Attribution is
  arithmetic, so no cross-epoch dedup exchange exists at all.
- Hot epochs (every user active at once) truncate deterministically under
  a counted cap (``report_cap('interval_epoch_truncated')``) — never hit
  at oracle scales (asserted in tests).

Reference analog: none (engine mandate — temporal-join family).
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map
from osm_export_tool_python_ray.state.metrics import report_cap

_SES_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("st", pa.int64()), ("en", pa.int64())]
)


def _empty(schema, extra=()):
    cols = {f.name: pa.array([], type=f.type) for f in schema}
    for name, typ in extra:
        cols[name] = pa.array([], type=typ)
    return pa.table(cols)


def session_overlap_join(
    events_ds,
    gap_us=1_800_000_000,
    epoch_us=21_600_000_000,
    num_buckets=32,
    num_partitions=8,
    epoch_cap=200_000,
):
    """→ (user_a, user_b, n_overlaps, overlap_us): per unordered user pair
    (user_a < user_b), how many of their session pairs overlap with
    strictly positive duration, and the total overlap in µs (exact int64
    on both engine and SQL side — no floats anywhere)."""

    # ---- stage A: user-keyed exchange → sessions ------------------------
    def keyed(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return _empty(
                pa.schema([("user_id", pa.int64()), ("ts", pa.int64())]),
                extra=(("bucket", pa.int32()),),
            )
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64)),
                "ts": pa.array(ts),
                "bucket": pa.array((u % num_buckets).astype(np.int32)),
            }
        )

    def sessionize(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty(_SES_SCHEMA)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)]
        )
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], len(u)) - 1
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "st": pa.array(ts[starts]),
                "en": pa.array(ts[ends]),
            }
        )

    sessions = grouped_map(
        events_ds.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        lambda g: sessionize(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema([("user_id", pa.int64()), ("ts", pa.int64())]),
    )

    # ---- stage B: replicate to spanned epochs ---------------------------
    def to_epochs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(
                _SES_SCHEMA, extra=(("epoch", pa.int64()), ("bucket", pa.int32()))
            )
        st = t.column("st").to_numpy(zero_copy_only=False)
        en = t.column("en").to_numpy(zero_copy_only=False)
        e0 = st // epoch_us
        e1 = en // epoch_us
        ncopy = (e1 - e0 + 1).astype(np.int64)
        rows = np.repeat(np.arange(t.num_rows), ncopy)
        offs = np.concatenate([[np.int64(0)], np.cumsum(ncopy)])[:-1]
        ep = e0[rows] + (np.arange(int(ncopy.sum())) - np.repeat(offs, ncopy))
        rep = t.take(pa.array(rows)).append_column("epoch", pa.array(ep))
        return rep.append_column(
            "bucket", pa.array((ep % num_buckets).astype(np.int32))
        )

    placed = sessions.map_batches(to_epochs, batch_format="pyarrow")

    # ---- stage C: per-epoch pairing + canonical attribution -------------
    def epoch_pairs(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [
                ("user_a", pa.int64()),
                ("user_b", pa.int64()),
                ("n_partial", pa.int64()),
                ("ov_partial", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return _empty(OUT)
        ep = g.column("epoch").to_numpy(zero_copy_only=False)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        st = g.column("st").to_numpy(zero_copy_only=False)
        en = g.column("en").to_numpy(zero_copy_only=False)
        order = np.lexsort((st, u, ep))
        ep, u, st, en = ep[order], u[order], st[order], en[order]
        gstarts = np.nonzero(np.concatenate([[True], ep[1:] != ep[:-1]]))[0]
        sizes = np.diff(np.append(gstarts, len(ep)))
        if (sizes > epoch_cap).any():
            rank = np.arange(len(ep)) - np.repeat(gstarts, sizes)
            keep = rank < epoch_cap
            report_cap("interval_epoch_truncated", int((~keep).sum()))
            ep, u, st, en = ep[keep], u[keep], st[keep], en[keep]
            gstarts = np.nonzero(np.concatenate([[True], ep[1:] != ep[:-1]]))[0]
            sizes = np.diff(np.append(gstarts, len(ep)))
        rank = np.arange(len(ep)) - np.repeat(gstarts, sizes)
        left_counts = np.repeat(sizes, sizes) - 1 - rank
        total = int(left_counts.sum())
        if total == 0:
            return _empty(OUT)
        L = np.repeat(np.arange(len(ep)), left_counts)
        offs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(offs, left_counts) + L + 1
        ov_st = np.maximum(st[L], st[R])
        ov_en = np.minimum(en[L], en[R])
        keep = (
            (u[L] != u[R])
            & (ov_st < ov_en)  # strictly positive overlap
            & (ov_st // epoch_us == ep[L])  # canonical epoch: overlap start
        )
        L, R, ov_st, ov_en = L[keep], R[keep], ov_st[keep], ov_en[keep]
        if not len(L):
            return _empty(OUT)
        swap = u[L] > u[R]
        ua = np.where(swap, u[R], u[L])
        ub = np.where(swap, u[L], u[R])
        ov = ov_en - ov_st
        # partition-local (ua, ub) partials
        order = np.lexsort((ub, ua))
        ua, ub, ov = ua[order], ub[order], ov[order]
        first = np.concatenate([[True], (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])])
        ps = np.nonzero(first)[0]
        n_partial = np.diff(np.append(ps, len(ua))).astype(np.int64)
        ov_partial = np.add.reduceat(ov, ps)
        return pa.table(
            {
                "user_a": pa.array(ua[ps]),
                "user_b": pa.array(ub[ps]),
                "n_partial": pa.array(n_partial),
                "ov_partial": pa.array(ov_partial),
            }
        )

    from ray.data.aggregate import Sum

    partials = grouped_map(
        placed,
        "bucket",
        lambda g: epoch_pairs(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(list(_SES_SCHEMA) + [pa.field("epoch", pa.int64())]),
    )
    # keyed_sum fold, not ray.data's row-walking two-key HashAggregate
    # (see stages/exchange.py keyed_sum)
    from osm_export_tool_python_ray.stages.exchange import keyed_sum

    return keyed_sum(
        partials,
        keys=["user_a", "user_b"],
        sums=[("n_partial", "n_overlaps"), ("ov_partial", "overlap_us")],
        num_buckets=num_buckets,
        num_partitions=num_partitions,
    )


def interval_coverage(
    events_ds,
    dur_scale_us=1_000,
    num_buckets=32,
    num_partitions=8,
):
    """→ (user_id, covered_us, n_blocks, n_intervals): the UNION length of
    each user's event intervals — the classic sweep-line interval-union
    aggregate (utilization / uptime / "how long was the user actually
    active counting overlaps once").

    Each event spawns the half-open interval [ts, ts + dur) with
    ``dur = floor(value·1e4 + 0.5) · dur_scale_us`` µs — integer-exact on
    both the engine and SQL side. Touching intervals ([a,b) + [b,c)) do
    NOT merge (half-open semantics: a new block starts when s ≥ running
    max of prior ends); zero-length intervals are dropped.

    Scale shape: ONE user-keyed exchange; inside a partition the sweep is
    fully vectorized over 2n endpoint records (+1 at start, −1 at end,
    ends sorting before starts at equal position) — a segmented cumsum
    gives the nesting depth, and ``covered = Σ(pos at depth→0) −
    Σ(pos at depth 0→1)`` per user needs no block pairing at all. Depth
    is bounded by the per-user interval count, so there is no overflow
    hazard (unlike a segmented-cummax-with-offsets trick).

    Reference analog: none (engine mandate — temporal aggregate family).
    """

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        v = t.column("value").to_numpy(zero_copy_only=False)
        vq = np.floor(v * 1e4 + 0.5).astype(np.int64)
        e = s + vq * dur_scale_us
        keep = e > s
        u, s, e = u[keep], s[keep], e[keep]
        return pa.table(
            {
                "user_id": pa.array(u),
                "s": pa.array(s),
                "e": pa.array(e),
                "bucket": pa.array((u % num_buckets).astype(np.int32)),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("covered_us", pa.int64()),
            ("n_blocks", pa.int64()),
            ("n_intervals", pa.int64()),
        ]
    )

    def sweep(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return _empty(out_schema)
        s = g.column("s").to_numpy(zero_copy_only=False)
        e = g.column("e").to_numpy(zero_copy_only=False)
        pos = np.concatenate([s, e])
        delta = np.concatenate(
            [np.ones(n, dtype=np.int64), -np.ones(n, dtype=np.int64)]
        )
        uu = np.concatenate([u, u])
        # ends (-1) sort BEFORE starts (+1) at equal pos → touching
        # intervals close then reopen (half-open, no merge)
        order = np.lexsort((delta, pos, uu))
        uu, pos, delta = uu[order], pos[order], delta[order]
        m = 2 * n
        newu = np.ones(m, dtype=bool)
        newu[1:] = uu[1:] != uu[:-1]
        seg_starts = np.nonzero(newu)[0]
        cs = np.cumsum(delta)
        base = np.repeat(
            cs[seg_starts] - delta[seg_starts],
            np.diff(np.append(seg_starts, m)),
        )
        depth = cs - base
        opens = (delta == 1) & (depth == 1)
        closes = (delta == -1) & (depth == 0)
        contrib = np.where(closes, pos, 0) - np.where(opens, pos, 0)
        return pa.table(
            {
                "user_id": pa.array(uu[seg_starts]),
                "covered_us": pa.array(np.add.reduceat(contrib, seg_starts)),
                "n_blocks": pa.array(
                    np.add.reduceat(closes.astype(np.int64), seg_starts)
                ),
                "n_intervals": pa.array(
                    np.add.reduceat((delta == 1).astype(np.int64), seg_starts)
                ),
            }
        )

    return grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: sweep(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("user_id", pa.int64()), ("s", pa.int64()), ("e", pa.int64())]
        ),
    )


def rect_union_area(
    rects_ds,
    band=100,
    num_buckets=32,
    num_partitions=8,
    max_width=4096,
):
    """→ (band, union_area): exact area of the UNION of axis-aligned
    integer rectangles (half-open [x0,x1)×[y0,y1)), reported per x-band
    (band = column // ``band``) — the classic measure-of-union problem
    (Klee/Bentley), distributed.

    Decomposition: each rectangle is rasterized to its unit x-columns
    (x, y0, y1); per column the covered length is a 1-D interval union —
    the SAME endpoint-cumsum sweep as ``interval_coverage``, segmented on
    the column id instead of the user key — and the area is the sum of
    per-column covered lengths. ONE x-keyed exchange; the final fold is a
    tiny groupby(band).

    Scale shape: replication factor = rectangle width in columns, capped
    at ``max_width`` (drops counted — ``rect_width_truncated``); for
    corpora of wide boxes, pre-scale the coordinate grid so widths are
    bounded (the engine's tiling stages make the same
    bounded-cell-occupancy assumption). Degenerate (empty) rectangles are
    dropped. All arithmetic is int64 — no float in the compare surface.

    No reference analog — engine mandate (computational-geometry
    aggregate family).
    """
    from osm_export_tool_python_ray.state.metrics import report_cap

    def columns(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "x": pa.array([], type=pa.int64()),
                "y0": pa.array([], type=pa.int64()),
                "y1": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int32()),
            }
        )
        if not t.num_rows:
            return empty
        x0 = t.column("x0").to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = t.column("x1").to_numpy(zero_copy_only=False).astype(np.int64)
        y0 = t.column("y0").to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = t.column("y1").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (x1 > x0) & (y1 > y0)
        x0, x1, y0, y1 = x0[keep], x1[keep], y0[keep], y1[keep]
        w = x1 - x0
        over = w > max_width
        if over.any():
            report_cap("rect_width_truncated", int((w[over] - max_width).sum()))
            w = np.minimum(w, max_width)
        if not len(w):
            return empty
        rows = np.repeat(np.arange(len(w)), w)
        offs = np.concatenate([[np.int64(0)], np.cumsum(w)])[:-1]
        x = x0[rows] + (np.arange(int(w.sum())) - np.repeat(offs, w))
        return pa.table(
            {
                "x": pa.array(x),
                "y0": pa.array(y0[rows]),
                "y1": pa.array(y1[rows]),
                "bucket": pa.array(
                    (x.astype(np.uint64) % np.uint64(num_buckets)).astype(
                        np.int32
                    )
                ),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        OUT = pa.schema([("band", pa.int64()), ("area_partial", pa.int64())])
        n = g.num_rows
        if n == 0:
            return _empty(OUT)
        x = g.column("x").to_numpy(zero_copy_only=False)
        s = g.column("y0").to_numpy(zero_copy_only=False)
        e = g.column("y1").to_numpy(zero_copy_only=False)
        pos = np.concatenate([s, e])
        delta = np.concatenate(
            [np.ones(n, dtype=np.int64), -np.ones(n, dtype=np.int64)]
        )
        xx = np.concatenate([x, x])
        order = np.lexsort((delta, pos, xx))
        xx, pos, delta = xx[order], pos[order], delta[order]
        m = 2 * n
        newx = np.ones(m, dtype=bool)
        newx[1:] = xx[1:] != xx[:-1]
        seg_starts = np.nonzero(newx)[0]
        cs = np.cumsum(delta)
        base = np.repeat(
            cs[seg_starts] - delta[seg_starts],
            np.diff(np.append(seg_starts, m)),
        )
        depth = cs - base
        opens = (delta == 1) & (depth == 1)
        closes = (delta == -1) & (depth == 0)
        contrib = np.where(closes, pos, 0) - np.where(opens, pos, 0)
        covered = np.add.reduceat(contrib, seg_starts)
        cols = xx[seg_starts]
        # partition-local band partials (a band's columns may span
        # partitions — the groupby below completes the fold)
        bands = cols // band
        border = np.argsort(bands, kind="stable")
        bands, covered = bands[border], covered[border]
        bstart = np.nonzero(
            np.concatenate([[True], bands[1:] != bands[:-1]])
        )[0]
        return pa.table(
            {
                "band": pa.array(bands[bstart]),
                "area_partial": pa.array(np.add.reduceat(covered, bstart)),
            }
        )

    from ray.data.aggregate import Sum

    partials = grouped_map(
        rects_ds.map_batches(columns, batch_format="pyarrow"),
        "bucket",
        lambda g: sweep(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("x", pa.int64()), ("y0", pa.int64()), ("y1", pa.int64())]
        ),
    )
    return partials.groupby("band").aggregate(
        Sum("area_partial", alias_name="union_area")
    )
