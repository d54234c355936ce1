"""Product/geo analytics operators over the event stream — the four
classic "what do I run right after sessionization" pipelines a training-
data or mobility platform needs at corpus scale:

- ``cohort_retention``: weekly cohort × week-offset active-user matrix.
- ``idw_grid``: inverse-distance-weighted interpolation of the event
  ``value`` field at a fixed probe grid (the canonical raster-from-
  points kernel: pollution / signal-strength / price surfaces).
- ``hausdorff_pairs``: trajectory-similarity join — symmetric discrete
  Hausdorff distance between per-user point sets, candidate pairs
  bucketed by anchor cell so the pair expansion is local, never global.
- ``decayed_cells``: exponentially time-decayed per-cell event heat
  (the streaming-hotspot pattern: recent activity dominates, the decay
  is a pure integer weight so partials fold in any order).

Scale shape: every operator reduces events inside ``map_batches``
(distinct-presence or per-probe partial sums) BEFORE any exchange;
``cohort_retention`` and ``hausdorff_pairs`` then run ONE keyed
``grouped_map`` exchange (user bucket / anchor-cell bucket) and fold to
tiny result tables; ``idw_grid`` and ``decayed_cells`` never exchange raw
rows at all — they are pure combiner → ``groupby().sum()`` shapes whose
exchange moves O(probes) / O(cells) partial rows per batch.

Determinism contracts (oracle-exact, pipelines/queries.py): all float
inputs are quantized to integer units BEFORE summation (the engine's
quantize-then-sum rule — floor(x·1e4 + 0.5) matches the SQL verbatim);
IDW weights, decay weights and Hausdorff distances are exact int64
arithmetic; final ratios use int64 floor division on both sides.

No reference analog — engine mandate (temporal/geospatial family).
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map
from osm_export_tool_python_ray.stages.temporal import _ts_i64

WEEK_US = np.int64(7 * 24 * 3600) * np.int64(1_000_000)

_EPOCH_2024_02_01_US = np.int64(1706745600) * np.int64(1_000_000)


def cohort_retention(events_ds, num_buckets=32, num_partitions=8):
    """Weekly cohort retention: one row per (cohort_week, week_offset)
    with ``users`` = number of users whose FIRST event falls in epoch
    week ``cohort_week`` and who have at least one event in week
    ``cohort_week + week_offset``. Weeks are epoch-aligned
    (``epoch_us // WEEK_US`` — pure int64, shared with the oracle).

    Scale shape: a per-batch combiner reduces events to DISTINCT
    (user, week) presence rows, ONE user-keyed exchange groups each
    user's weeks on a single partition (cohort = min week is a per-user
    property), and each partition emits (cohort, offset) PARTIAL counts
    — the final ``groupby().sum()`` moves O(weeks²) rows per partition,
    never users."""
    from ray.data.aggregate import Sum

    def presence(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "week": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        wk = _ts_i64(t.column("ts")) // WEEK_US
        order = np.lexsort((wk, u))
        us, ws = u[order], wk[order]
        first = np.concatenate([[True], (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])])
        us, ws = us[first], ws[first]
        return pa.table(
            {
                "user_id": pa.array(us),
                "week": pa.array(ws),
                "bucket": pa.array((us % num_buckets).astype(np.int32)),
            }
        )

    def partial(g: pa.Table) -> pa.Table:
        EMPTY = pa.table(
            {
                "cohort_week": pa.array([], type=pa.int64()),
                "week_offset": pa.array([], type=pa.int64()),
                "n_partial": pa.array([], type=pa.int64()),
            }
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return EMPTY
        wk = g.column("week").to_numpy(zero_copy_only=False)
        order = np.lexsort((wk, u))
        u, wk = u[order], wk[order]
        # cross-batch dedup of presence rows
        first = np.concatenate([[True], (u[1:] != u[:-1]) | (wk[1:] != wk[:-1])])
        u, wk = u[first], wk[first]
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.nonzero(new_u)[0]
        sizes = np.diff(np.append(starts, len(u)))
        cohort = np.repeat(wk[starts], sizes)  # per-user min week (rows sorted)
        offset = wk - cohort
        key = cohort * np.int64(1 << 20) + offset
        ku, kc = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(ku // (1 << 20)),
                "week_offset": pa.array(ku % (1 << 20)),
                "n_partial": pa.array(kc.astype(np.int64)),
            }
        )

    partials = grouped_map(
        events_ds.map_batches(presence, batch_format="pyarrow"),
        "bucket",
        lambda g: partial(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema([("user_id", pa.int64()), ("week", pa.int64())]),
    )
    return partials.groupby(["cohort_week", "week_offset"]).aggregate(
        Sum("n_partial", alias_name="users")
    )


# IDW weight scale: w = IDW_SCALE // (d2 + 1). With |value| ≤ ~5e2
# (v_q ≤ 5e6 at 1e-4 quantization) each w·v_q term is ≤ 5e12, so the
# int64 partial sums are safe to ~1.8e6 events CO-LOCATED AT ONE PROBE
# per partition and far more for any realistic distance mix; beyond
# that, drop IDW_SCALE one decade.
IDW_SCALE = np.int64(1_000_000)


def default_probes():
    """5×5 probe grid at the centers of 20×20 blocks of the synthetic
    0..99 planar grid (deterministic, shared with the SQL oracle)."""
    px, py = np.meshgrid(np.arange(5) * 20 + 10, np.arange(5) * 20 + 10)
    return px.ravel().astype(np.int64), py.ravel().astype(np.int64)


def idw_grid(events_ds):
    """Inverse-distance-weighted interpolation of ``value`` at the fixed
    probe grid: for probe p, idw_q = floor(Σ w_i·v_i / Σ w_i) in 1e-4
    value units, with integer weights w_i = IDW_SCALE // (d²(p, i) + 1)
    over the synthetic planar points (event_id % 100, (event_id//7) % 100)
    and v_i = floor(value·1e4 + 0.5). All arithmetic is int64, so the
    partial (Σw, Σwv) pairs fold in any order and the floor-division
    ratio is oracle-exact.

    Scale shape: a pure combiner — each batch emits ONE row per probe
    (25 rows) regardless of batch size; the groupby moves O(probes)
    rows per batch and no exchange of events ever happens. The probe
    matrix rides the closure (driver-built once, tiny)."""
    from ray.data.aggregate import Sum

    px, py = default_probes()
    n_probes = len(px)

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        if not len(eid):
            return pa.table(
                {
                    "probe_id": pa.array([], type=pa.int64()),
                    "wsum_p": pa.array([], type=pa.int64()),
                    "wvsum_p": pa.array([], type=pa.int64()),
                }
            )
        x = (eid % 100).astype(np.int64)
        y = ((eid // 7) % 100).astype(np.int64)
        v = t.column("value").to_numpy(zero_copy_only=False)
        vq = np.floor(v * 1e4 + 0.5).astype(np.int64)
        # (n_probes, n_events) squared distances — ints throughout
        dx = px[:, None] - x[None, :]
        dy = py[:, None] - y[None, :]
        w = IDW_SCALE // (dx * dx + dy * dy + 1)
        return pa.table(
            {
                "probe_id": pa.array(np.arange(n_probes, dtype=np.int64)),
                "wsum_p": pa.array(w.sum(axis=1)),
                "wvsum_p": pa.array((w * vq[None, :]).sum(axis=1)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        pid = t.column("probe_id").to_numpy(zero_copy_only=False)
        ws = t.column("wsum").to_numpy(zero_copy_only=False)
        wv = t.column("wvsum").to_numpy(zero_copy_only=False)
        idw_q = np.where(ws > 0, wv // np.maximum(ws, 1), np.int64(0))
        return pa.table(
            {
                "probe_id": pa.array(pid),
                "px": pa.array(px[pid]),
                "py": pa.array(py[pid]),
                "wsum": pa.array(ws),
                "idw_q": pa.array(idw_q),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("probe_id")
        .aggregate(
            Sum("wsum_p", alias_name="wsum"), Sum("wvsum_p", alias_name="wvsum")
        )
        .map_batches(finish, batch_format="pyarrow")
    )


HAUSDORFF_BUCKET_CAP = 256


def hausdorff_pairs(
    events_ds,
    cap_pts=16,
    bucket_cap=HAUSDORFF_BUCKET_CAP,
    num_partitions=8,
):
    """Trajectory-similarity join: symmetric discrete Hausdorff distance
    (squared, int64) between per-user point sets. Per user: the DISTINCT
    synthetic planar points, ordered by (x, y), capped to the first
    ``cap_pts`` (deterministic — the same row_number cut the oracle
    takes). Candidate pairs: users whose ANCHOR (first kept point) falls
    in the same 20×20 coarse cell — the standard blocking rule that
    keeps the pair expansion local; a global all-pairs would be
    quadratic in users. Returns (user_a, user_b, haus_d2) per candidate
    pair with user_a < user_b.

    Scale shape: batch-combiner distinct (user, x, y) rows → ONE
    user-keyed exchange packs each user's capped point list into a
    single row (list columns) tagged with its anchor bucket → ONE
    bucket-keyed exchange runs the pair expansion per bucket. Buckets
    larger than ``bucket_cap`` users keep the smallest user_ids and
    count the drops via report_cap('hausdorff_bucket_truncated') — the
    encounter-group cap pattern. Per pair the distance is one (≤cap²)
    vectorized matrix min/max; no per-point Python."""
    from osm_export_tool_python_ray.state.metrics import report_cap

    def presence(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "x": pa.array([], type=pa.int64()),
                    "y": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        x = (eid % 100).astype(np.int64)
        y = ((eid // 7) % 100).astype(np.int64)
        order = np.lexsort((y, x, u))
        us, xs, ys = u[order], x[order], y[order]
        first = np.concatenate(
            [[True], (us[1:] != us[:-1]) | (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])]
        )
        us, xs, ys = us[first], xs[first], ys[first]
        return pa.table(
            {
                "user_id": pa.array(us),
                "x": pa.array(xs),
                "y": pa.array(ys),
                "bucket": pa.array((us % 32).astype(np.int32)),
            }
        )

    def pack(g: pa.Table) -> pa.Table:
        """Per-user capped point list + anchor bucket (one row per user)."""
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        EMPTY = pa.table(
            {
                "bkey": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "xs": pa.array([], type=pa.list_(pa.int64())),
                "ys": pa.array([], type=pa.list_(pa.int64())),
            }
        )
        if not len(u):
            return EMPTY
        x = g.column("x").to_numpy(zero_copy_only=False)
        y = g.column("y").to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x, u))
        u, x, y = u[order], x[order], y[order]
        # cross-batch dedup of presence rows
        first = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])]
        )
        u, x, y = u[first], x[first], y[first]
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.nonzero(new_u)[0]
        sizes = np.diff(np.append(starts, len(u)))
        rank = np.arange(len(u)) - np.repeat(starts, sizes)
        keep = rank < cap_pts
        u, x, y, rank = u[keep], x[keep], y[keep], rank[keep]
        starts = np.nonzero(np.concatenate([[True], u[1:] != u[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(u)))
        ax, ay = x[starts], y[starts]  # anchor = first kept (min (x,y)) point
        bkey = (ax // 20) * np.int64(5) + (ay // 20)
        offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
        return pa.table(
            {
                "bkey": pa.array(bkey),
                "user_id": pa.array(u[starts]),
                "xs": pa.ListArray.from_arrays(offsets, pa.array(x)),
                "ys": pa.ListArray.from_arrays(offsets, pa.array(y)),
            }
        )

    def pair_haus(g: pa.Table) -> pa.Table:
        EMPTY = pa.table(
            {
                "user_a": pa.array([], type=pa.int64()),
                "user_b": pa.array([], type=pa.int64()),
                "haus_d2": pa.array([], type=pa.int64()),
            }
        )
        bk = g.column("bkey").to_numpy(zero_copy_only=False)
        if not len(bk):
            return EMPTY
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        xs = g.column("xs")
        ys = g.column("ys")
        if isinstance(xs, pa.ChunkedArray):
            xs = xs.combine_chunks()
            ys = ys.combine_chunks()
        order = np.lexsort((u, bk))
        pts = [
            (
                np.asarray(xs[int(i)].values),
                np.asarray(ys[int(i)].values),
            )
            for i in order
        ]
        bk, u = bk[order], u[order]
        starts = np.nonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(bk)))
        over = sizes > bucket_cap
        if over.any():
            rank = np.arange(len(bk)) - np.repeat(starts, sizes)
            keepm = rank < bucket_cap
            report_cap("hausdorff_bucket_truncated", int((~keepm).sum()))
            keep_idx = np.nonzero(keepm)[0]
            bk, u = bk[keep_idx], u[keep_idx]
            pts = [pts[int(i)] for i in keep_idx]
            starts = np.nonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))[0]
            sizes = np.diff(np.append(starts, len(bk)))
        ua_out, ub_out, d_out = [], [], []
        for s, n in zip(starts, sizes):
            for i in range(s, s + n):
                xi, yi = pts[i]
                for j in range(i + 1, s + n):
                    xj, yj = pts[j]
                    dx = xi[:, None] - xj[None, :]
                    dy = yi[:, None] - yj[None, :]
                    d2 = dx * dx + dy * dy
                    h = max(int(d2.min(axis=1).max()), int(d2.min(axis=0).max()))
                    ua_out.append(int(u[i]))
                    ub_out.append(int(u[j]))
                    d_out.append(h)
        if not ua_out:
            return EMPTY
        return pa.table(
            {
                "user_a": pa.array(np.asarray(ua_out, dtype=np.int64)),
                "user_b": pa.array(np.asarray(ub_out, dtype=np.int64)),
                "haus_d2": pa.array(np.asarray(d_out, dtype=np.int64)),
            }
        )

    packed = grouped_map(
        events_ds.map_batches(presence, batch_format="pyarrow"),
        "bucket",
        lambda g: pack(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("user_id", pa.int64()), ("x", pa.int64()), ("y", pa.int64())]
        ),
    )
    # strategy pinned to hash: the packed rows are one-per-user (tiny),
    # and the upstream hash exchange can leave genuinely-empty partitions
    # as zero-column blocks (the Ray 2.49 schema-broadcast bug noted in
    # exchange.py) which the sort/groupby path would try to sort by
    # "bkey" and reject; the hash path's wrapper skips them.
    return grouped_map(
        packed,
        "bkey",
        pair_haus,
        num_partitions=num_partitions,
        strategy="hash",
        payload_schema=pa.schema(
            [
                ("bkey", pa.int64()),
                ("user_id", pa.int64()),
                ("xs", pa.list_(pa.int64())),
                ("ys", pa.list_(pa.int64())),
            ]
        ),
    )


DECAY_SCALE = np.int64(1_000_000)


def decayed_cells(
    events_ds, t_ref_us=int(_EPOCH_2024_02_01_US), half_life_hours=24
):
    """Exponentially time-decayed per-cell event heat: for each 10×10
    coarse grid cell, decayed = Σ floor(DECAY_SCALE / 2^k) with
    k = min(age_hours // half_life_hours, 40) and age_hours =
    (t_ref − ts) // 1h — the streaming-hotspot weight, quantized to a
    pure integer so partials fold in any order (the oracle computes the
    identical floor weight). Events after ``t_ref_us`` clamp to age 0.

    Scale shape: pure combiner — per-batch per-cell (n, decayed)
    partials, one tiny groupby. No exchange of events."""
    from ray.data.aggregate import Sum

    t_ref = np.int64(t_ref_us)
    hl = np.int64(half_life_hours)
    HOUR_US = np.int64(3_600_000_000)

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        if not len(eid):
            return pa.table(
                {
                    "cx": pa.array([], type=pa.int64()),
                    "cy": pa.array([], type=pa.int64()),
                    "n_p": pa.array([], type=pa.int64()),
                    "decayed_p": pa.array([], type=pa.int64()),
                }
            )
        ts = _ts_i64(t.column("ts"))
        age_h = np.maximum(t_ref - ts, 0) // HOUR_US
        k = np.minimum(age_h // hl, 40)
        w = DECAY_SCALE // (np.int64(1) << k)
        cx = (eid % 100) // 10
        cy = ((eid // 7) % 100) // 10
        key = cx * np.int64(10) + cy
        order = np.argsort(key, kind="stable")
        key_s, w_s = key[order], w[order]
        starts = np.nonzero(np.concatenate([[True], key_s[1:] != key_s[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(key_s)))
        wsum = np.add.reduceat(w_s, starts)
        return pa.table(
            {
                "cx": pa.array(key_s[starts] // 10),
                "cy": pa.array(key_s[starts] % 10),
                "n_p": pa.array(sizes.astype(np.int64)),
                "decayed_p": pa.array(wsum.astype(np.int64)),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(
            Sum("n_p", alias_name="n"), Sum("decayed_p", alias_name="decayed")
        )
    )


def cell_trends(events_ds, cell_div=10, bucket_us=3_600_000_000,
                num_buckets=32, num_partitions=8):
    """Per-cell linear activity trend — grouped least squares via EXACT
    integer sufficient statistics: for each 10×10 grid cell, fit hourly
    event count against the hour index and report the slope as the exact
    rational (num, den) = (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) over the cell's
    OCCUPIED hours, x rebased to the cell's first hour so the int64
    moments never overflow (x < span ≈ 10³; Σx² < 10⁹·n). No division
    anywhere — the output is the exact fraction both sides compute
    identically (integer division would diverge: numpy floors, DuckDB
    truncates toward zero).

    Scale shape: raw events collapse to (cell, hour) partial counts per
    batch (the aoi_cell_cover combiner), ONE exchange keyed by cell moves
    hourly rows, and the moment fold per cell is lexsort + reduceat —
    the sufficient-statistics pattern every grouped regression /
    covariance op reduces to.

    → (ckey, n_hours, num, den); den = 0 iff the cell has one occupied
    hour (undefined slope — consumer decides)."""
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    OUT = pa.schema(
        [
            ("ckey", pa.int64()),
            ("n_hours", pa.int64()),
            ("num", pa.int64()),
            ("den", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "ckey": pa.array([], type=pa.int64()),
                    "hr": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hr = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // bucket_us
        )
        cx = (eid % 100) // cell_div
        cy = ((eid // 7) % 100) // cell_div
        ckey = cx * 10 + cy
        key = ckey * np.int64(1 << 40) + (hr + np.int64(1 << 39))
        uk, pos = np.unique(key, return_inverse=True)
        cnt = np.bincount(pos).astype(np.int64)
        ck = (uk >> np.int64(40)).astype(np.int64)
        return pa.table(
            {
                "ckey": pa.array(ck),
                "hr": pa.array((uk & np.int64((1 << 40) - 1)) - np.int64(1 << 39)),
                "n": pa.array(cnt),
                "bucket": pa.array((ck % num_buckets).astype(np.int32)),
            }
        )

    def fit(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({f.name: pa.array([], type=f.type) for f in OUT})
        ck = g.column("ckey").to_numpy(zero_copy_only=False)
        hr = g.column("hr").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((hr, ck))
        ck, hr, n = ck[order], hr[order], n[order]
        same = np.concatenate([[False], (ck[1:] == ck[:-1]) & (hr[1:] == hr[:-1])])
        starts = np.nonzero(~same)[0]
        n = np.add.reduceat(n, starts)
        ck, hr = ck[starts], hr[starts]
        cs = np.nonzero(np.concatenate([[True], ck[1:] != ck[:-1]]))[0]
        x = hr - np.repeat(hr[cs], np.diff(np.append(cs, len(ck))))  # rebased
        nh = np.diff(np.append(cs, len(ck))).astype(np.int64)
        sx = np.add.reduceat(x, cs)
        sy = np.add.reduceat(n, cs)
        sxy = np.add.reduceat(x * n, cs)
        sxx = np.add.reduceat(x * x, cs)
        num = nh * sxy - sx * sy
        den = nh * sxx - sx * sx
        return pa.table(
            {
                "ckey": pa.array(ck[cs]),
                "n_hours": pa.array(nh),
                "num": pa.array(num),
                "den": pa.array(den),
            }
        )

    return grouped_map(
        events_ds.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        lambda g: fit(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("ckey", pa.int64()), ("hr", pa.int64()), ("n", pa.int64())]
        ),
    )
