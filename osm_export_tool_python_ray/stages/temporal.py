"""Temporal join operators the reference lacks but a training-data /
telemetry pipeline needs (engine mandate; no reference analog — the
reference's only temporal surface is feature timestamps): an AS-OF join
and a bounded time-RANGE join, both expressed as keyed/epoch bucketed
exchanges + vectorized in-group merges (SURVEY §2 custom-operator rule:
composition of map_batches + grouped exchange, no raw actors).

Both kernels honor the ``grouped_map`` hash-path contract: a partition
batch is a bag of COMPLETE key-groups, possibly several — every kernel
re-sorts on the true key internally, never assumes one-group-per-call.

Scale notes
- ``asof_match``: one exchange of (left ∪ right) bucketed by the join
  key; within a partition the match is a single lexsort + segmented
  cummax (no per-key Python loop). Skewed keys cost what any keyed
  exchange costs; there is no replication.
- ``range_join_time``: the classic unkeyed interval join. Points are
  hashed to their time EPOCH (epoch length = the window bound), interval
  probes are replicated to every epoch they overlap — replication factor
  ≤ window/epoch + 1 (= 2 when epoch == max window). Each point is
  counted exactly once because every replica clips its interval to its
  own epoch. Partials then take a small keyed aggregate. A partition may
  mix epochs (hash path); the clip makes that safe.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map

_US = np.int64(1)  # times are handled as int64 microseconds throughout


def _ts_i64(col):
    """Arrow timestamp/int column → int64 microseconds numpy array."""
    a = col.to_numpy(zero_copy_only=False)
    if a.dtype.kind == "M":
        return a.astype("datetime64[us]").astype(np.int64)
    return a.astype(np.int64)


def asof_match(
    combined,
    *,
    key,
    time_col,
    tie_col,
    left_cols,
    right_cols,
    out_names,
    num_buckets=32,
    num_partitions=16,
):
    """AS-OF join over a pre-aligned union of both sides.

    ``combined`` holds left (probe) rows tagged ``__side == 1`` and right
    (build) rows tagged ``__side == 0`` in ONE schema (columns missing on
    a side are typed nulls). Every left row is matched to the right row
    of the same ``key`` with the greatest ``(time_col, tie_col) <=
    (left time, +inf)`` — i.e. most recent at-or-before, deterministic
    under ties via ``tie_col``. Output: the left rows' ``left_cols`` plus
    the matched right rows' ``right_cols`` renamed to ``out_names``
    (null where no right row precedes).

    Vectorized merge: lexsort by (key, time, side, tie) puts each left
    row immediately after every right row visible to it (side 0 < 1 makes
    the match inclusive at equal times); a running maximum of right-row
    positions, reset at key-segment starts, is then the match index.
    """
    def bucketer(t: pa.Table) -> pa.Table:
        from osm_export_tool_python_ray.stages.exchange import hash_bucket

        return t.append_column(
            "bucket", pa.array(hash_bucket(t.column(key), num_buckets))
        )

    def match(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"]).sort_by(
            [
                (key, "ascending"),
                (time_col, "ascending"),
                ("__side", "ascending"),
                (tie_col, "ascending"),
            ]
        )
        k = g.column(key).to_numpy(zero_copy_only=False)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        n = len(k)
        idx = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(side == 0, idx, -1))
        new_seg = np.ones(n, dtype=bool)
        if n:
            new_seg[1:] = k[1:] != k[:-1]
        seg_start = np.maximum.accumulate(np.where(new_seg, idx, 0))
        is_left = side == 1
        match_idx = np.where(last_right >= seg_start, last_right, -1)[is_left]
        take_left = pa.array(idx[is_left])
        take_right = pa.array(match_idx, mask=match_idx < 0)  # null idx → null row
        cols, names = [], []
        for c in left_cols:
            col = g.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            cols.append(col.take(take_left))
            names.append(c)
        for c, o in zip(right_cols, out_names):
            col = g.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            cols.append(col.take(take_right))
            names.append(o)
        return pa.table(dict(zip(names, cols)))

    return grouped_map(
        combined.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        match,
        num_partitions=num_partitions,
    )


def range_join_time(
    intervals,
    points,
    *,
    interval_key,
    start_col,
    end_col,
    point_time,
    point_values=(),
    epoch_us,
    num_partitions=16,
):
    """Bounded time-range join: for each interval row ``[start, end)``,
    count the point rows with ``point_time`` inside it and sum each of
    ``point_values`` — with NO join key (the canonical all-to-all risk).

    Points land in exactly one epoch bucket (``floor(t / epoch_us)``);
    interval probes are replicated to every epoch they overlap, so the
    caller must keep ``end - start`` bounded by a small multiple of
    ``epoch_us`` (replication factor = span/epoch + 1). Returns PARTIAL
    rows ``(interval_key, n, *point_values sums)`` — one per replica —
    which the caller folds with a tiny keyed aggregate (partials ≪
    points). Each replica clips to its own epoch, so a point is counted
    exactly once even when the exchange mixes epochs in one partition.
    """
    values = list(point_values)

    def point_bucket(t: pa.Table) -> pa.Table:
        ts = _ts_i64(t.column(point_time))
        for v in values:  # align with the probes' NaN-filled float64 columns
            i = t.schema.get_field_index(v)
            t = t.set_column(i, v, t.column(v).cast(pa.float64()))
        t = t.append_column("__t", pa.array(ts))
        return t.append_column(
            "bucket", pa.array((ts // epoch_us).astype(np.int64))
        ).select(["bucket", "__t", "__side"] + values + [interval_key, "__s", "__e"])

    def interval_replicate(t: pa.Table) -> pa.Table:
        s = _ts_i64(t.column(start_col))
        e = _ts_i64(t.column(end_col))
        lo = s // epoch_us
        hi = np.maximum(lo, (e - 1) // epoch_us)
        reps = (hi - lo + 1).astype(np.int64)
        row_idx = np.repeat(np.arange(len(s), dtype=np.int64), reps)
        # per-replica epoch: global arange minus each row's replica start
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        epoch = lo[row_idx] + (np.arange(len(row_idx), dtype=np.int64) - starts[row_idx])
        kcol = t.column(interval_key)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
        out = pa.table(
            {
                "bucket": pa.array(epoch),
                "__t": pa.array(np.zeros(len(row_idx), dtype=np.int64)),
                "__side": pa.array(np.ones(len(row_idx), dtype=np.int8)),
                **{v: pa.array(np.full(len(row_idx), np.nan)) for v in values},
                interval_key: kcol.take(pa.array(row_idx)),
                "__s": pa.array(s[row_idx]),
                "__e": pa.array(e[row_idx]),
            }
        )
        return out

    isch = intervals.schema()
    ktype = isch.types[isch.names.index(interval_key)]

    def tag_points(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.append_column("__side", pa.array(np.zeros(n, dtype=np.int8)))
        t = t.append_column(interval_key, pa.nulls(n, type=ktype))
        t = t.append_column("__s", pa.array(np.zeros(n, dtype=np.int64)))
        return t.append_column("__e", pa.array(np.zeros(n, dtype=np.int64)))

    pts = points.map_batches(tag_points, batch_format="pyarrow").map_batches(
        point_bucket, batch_format="pyarrow"
    )
    probes = intervals.map_batches(interval_replicate, batch_format="pyarrow")

    from osm_export_tool_python_ray.stages.exchange import union_all

    combined = union_all(pts, probes)

    def fold(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        buck = g.column("bucket").to_numpy(zero_copy_only=False)
        is_pt = side == 0
        pt = g.filter(pa.array(is_pt))
        pr = g.filter(pa.array(~is_pt))
        kcol = pr.column(interval_key)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
        if pr.num_rows == 0:
            return pa.table(
                {
                    interval_key: kcol.slice(0, 0),
                    "n": pa.array([], type=pa.int64()),
                    **{v: pa.array([], type=pa.float64()) for v in values},
                }
            )
        # points sorted by (epoch, t): per-epoch contiguous, searchsorted
        # needs a composite order — epoch ranges never overlap in t-space
        # (epoch = t // epoch_us), so plain t order IS epoch order.
        pt = pt.sort_by([("__t", "ascending")])
        t_sorted = pt.column("__t").to_numpy(zero_copy_only=False)
        cums = {
            v: np.concatenate(
                ([0.0], np.cumsum(pt.column(v).to_numpy(zero_copy_only=False)))
            )
            for v in values
        }
        s = pr.column("__s").to_numpy(zero_copy_only=False)
        e = pr.column("__e").to_numpy(zero_copy_only=False)
        ep = buck[~is_pt]
        clip_lo = np.maximum(s, ep * epoch_us)
        clip_hi = np.minimum(e, (ep + 1) * epoch_us)
        lo = np.searchsorted(t_sorted, clip_lo, side="left")
        hi = np.searchsorted(t_sorted, np.maximum(clip_lo, clip_hi), side="left")
        out = {interval_key: kcol, "n": pa.array((hi - lo).astype(np.int64))}
        for v in values:
            out[v] = pa.array(cums[v][hi] - cums[v][lo])
        return pa.table(out)

    return grouped_map(combined, "bucket", fold, num_partitions=num_partitions)


def sliding_distinct_users(
    events_ds,
    window_hours=3,
    bucket_us=3_600_000_000,
    num_buckets=32,
    num_partitions=8,
):
    """Sliding-window COUNT DISTINCT: per event_type and hour h, the
    number of DISTINCT users active in the trailing ``window_hours``
    window [h−W+1, h] — the op naive plans shuffle once per window
    (replicating every event W×, then a distinct per window).

    The scale answer is the presence-run trick: collapse events to
    distinct (type, hour, user) presence rows (a combiner — the exchange
    moves presence, never events), then each presence row is the counted
    REPRESENTATIVE for exactly the window-ends [t, min(t+W−1, next−1)]
    where ``next`` is the same user's next presence hour: a user in a
    window is counted via their LAST presence inside it, so nobody is
    double-counted and no per-window set is ever built. Ranges accumulate
    into a difference array per type (cumsum = the answer) — fully
    vectorized, one keyed exchange, O(presence) work.

    → (event_type, hr, n_users) for every window-end with ≥1 active user
    (the same domain the oracle's presence × offsets expansion yields)."""
    import pyarrow as pa

    from osm_export_tool_python_ray.stages.exchange import grouped_map, hash_bucket

    W = int(window_hours)
    OUT = pa.schema(
        [("event_type", pa.string()), ("hr", pa.int64()), ("n_users", pa.int64())]
    )
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "hr": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        hr = _ts_i64(t.column("ts")) // bucket_us
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        types, tinv = np.unique(et, return_inverse=True)
        # batch-local distinct (type, hr, user) on the sorted triple —
        # correct for any user_id magnitude (no packed-key tricks)
        order = np.lexsort((u, hr, tinv))
        ti, hs, us = tinv[order], hr[order], u[order]
        first = np.concatenate(
            [[True], (ti[1:] != ti[:-1]) | (hs[1:] != hs[:-1]) | (us[1:] != us[:-1])]
        )
        ti, hs, us = ti[first], hs[first], us[first]
        tb = np.asarray(hash_bucket(pa.array(types, type=pa.string()), num_buckets))
        return pa.table(
            {
                "event_type": pa.array(types[ti], type=pa.string()),
                "hr": pa.array(hs),
                "user_id": pa.array(us),
                "bucket": pa.array(tb[ti].astype(np.int32)),
            }
        )

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({f.name: pa.array([], type=f.type) for f in OUT})
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        hr = g.column("hr").to_numpy(zero_copy_only=False)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((hr, u, et))
        et, hr, u = et[order], hr[order], u[order]
        # global distinct presence (cross-batch dups)
        first = np.concatenate(
            [[True], (et[1:] != et[:-1]) | (u[1:] != u[:-1]) | (hr[1:] != hr[:-1])]
        )
        et, hr, u = et[first], hr[first], u[first]
        # next presence hour of the same (type, user); ∞ at run ends
        same_run = np.concatenate([(et[1:] == et[:-1]) & (u[1:] == u[:-1]), [False]])
        nxt = np.where(same_run, np.roll(hr, -1), np.int64(1) << np.int64(60))
        a = hr
        b = np.minimum(hr + (W - 1), nxt - 1)  # nxt > hr ⇒ b ≥ a
        # per type: difference-array accumulation over the window-end axis
        tstarts = np.nonzero(np.concatenate([[True], et[1:] != et[:-1]]))[0]
        tends = np.append(tstarts[1:], len(et))
        out_t, out_h, out_n = [], [], []
        for s, e in zip(tstarts, tends):  # per TYPE; inner work vectorized
            h0 = int(a[s:e].min())
            h1 = int(b[s:e].max())
            diff = np.zeros(h1 - h0 + 2, dtype=np.int64)
            np.add.at(diff, (a[s:e] - h0).astype(np.int64), 1)
            np.add.at(diff, (b[s:e] - h0 + 1).astype(np.int64), -1)
            cnt = np.cumsum(diff[:-1])
            idx = np.nonzero(cnt > 0)[0]
            out_t.append(np.full(len(idx), et[s]))
            out_h.append(h0 + idx)
            out_n.append(cnt[idx])
        return pa.table(
            {
                "event_type": pa.array(np.concatenate(out_t), type=pa.string()),
                "hr": pa.array(np.concatenate(out_h)),
                "n_users": pa.array(np.concatenate(out_n)),
            }
        )

    return grouped_map(
        events_ds.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        lambda g: scan(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("event_type", pa.string()),
                ("hr", pa.int64()),
                ("user_id", pa.int64()),
            ]
        ),
    )


def attribution_window(
    events_ds,
    source_type="click",
    target_type="purchase",
    window_us=3_600_000_000,
    num_buckets=32,
    num_partitions=8,
):
    """Forward attribution join — the conversion-window op marketing /
    funnel analytics runs: per hour of SOURCE event, how many sources
    were followed by a TARGET of the same user STRICTLY later but within
    ``window_us``. The forward-looking mirror of this module's AS-OF
    join, closed the same way: one user-keyed exchange, then a SEGMENTED
    SUFFIX-MIN (the asof segmented-cummax trick, reversed) gives every
    source its next-target timestamp in one vectorized pass — no
    per-user loop, no self-join. Same-microsecond targets do NOT convert
    (targets order before sources at equal ts, so the suffix scan never
    sees them).

    → (hr, n_clicks, n_converted), hr = source epoch-hour (int64)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    def keyed(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        mask = pc.or_(pc.equal(et, source_type), pc.equal(et, target_type))
        t = t.filter(mask)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.int64()),
                    "is_target": pa.array([], type=pa.bool_()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64)),
                "ts": pa.array(_ts_i64(t.column("ts"))),
                "is_target": pc.equal(t.column("event_type"), target_type),
                "bucket": pa.array((u % num_buckets).astype(np.int32)),
            }
        )

    def scan(g: pa.Table) -> pa.Table:
        OUT = pa.schema(
            [("hr", pa.int64()), ("n_clicks", pa.int64()), ("n_converted", pa.int64())]
        )
        if g.num_rows == 0:
            return pa.table({f.name: pa.array([], type=f.type) for f in OUT})
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        tgt = g.column("is_target").to_numpy(zero_copy_only=False)
        # targets BEFORE sources at equal (user, ts): a source's forward
        # scan then only ever sees strictly-later targets
        krank = np.where(tgt, 0, 1)
        order = np.lexsort((krank, ts, u))
        u, ts, tgt = u[order], ts[order], tgt[order]
        n = len(u)
        # next-target index per row: the asof module's index-accumulate
        # trick run in REVERSED space (max-accumulate of target indices,
        # segment-start guard per user) — one vectorized pass, no loop
        ridx = np.arange(n, dtype=np.int64)
        rtgt = tgt[::-1]
        ru = u[::-1]
        last_t = np.maximum.accumulate(np.where(rtgt, ridx, -1))
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = ru[1:] != ru[:-1]
        seg_start = np.maximum.accumulate(np.where(new_seg, ridx, 0))
        rmatch = np.where(last_t >= seg_start, last_t, -1)
        fwd_match = np.where(rmatch[::-1] >= 0, n - 1 - rmatch[::-1], -1)
        is_src = ~tgt
        st = ts[is_src]
        m = fwd_match[is_src]
        nx = np.where(m >= 0, ts[np.maximum(m, 0)], np.int64(1) << np.int64(62))
        conv = nx <= st + window_us
        hr = st // np.int64(3_600_000_000)
        uh, inv = np.unique(hr, return_inverse=True)
        n_clicks = np.bincount(inv).astype(np.int64)
        n_conv = np.zeros(len(uh), dtype=np.int64)
        np.add.at(n_conv, inv, conv.astype(np.int64))
        return pa.table(
            {
                "hr": pa.array(uh),
                "n_clicks": pa.array(n_clicks),
                "n_converted": pa.array(n_conv),
            }
        )

    partials = grouped_map(
        events_ds.map_batches(keyed, batch_format="pyarrow"),
        "bucket",
        lambda g: scan(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.int64()),
                ("is_target", pa.bool_()),
            ]
        ),
    )
    return partials.groupby("hr").aggregate(
        Sum("n_clicks", alias_name="n_clicks"),
        Sum("n_converted", alias_name="n_converted"),
    )


def scd2_intervals(events_ds, key="user_id", state_col="event_type",
                   ts_col="ts", order_col="event_id", num_buckets=32,
                   num_partitions=32):
    """SCD-type-2 history build: collapse each key's ordered event stream
    into state-validity intervals — one row per RUN of consecutive equal
    ``state_col`` values, with ``valid_from`` = the run's first event ts,
    ``valid_to`` = the next run's first ts (null for the current/open
    run), and ``n_events`` = the run length. The read-side companion to
    ``cdc_merge``: MERGE maintains "latest state", SCD2 materializes
    "state over time" (dimension history, telemetry state timelines).

    Ordering within a key is (ts, order_col) — the explicit tiebreak
    makes equal-timestamp events deterministic under any parallelism
    (the same ORDER BY the oracle uses).

    Scale shape: ONE exchange keyed on ``key % num_buckets``; per
    partition a lexsort + vectorized run-boundary scan (no window
    function state, no per-key loop). Output is one row per state
    CHANGE, so the result is no larger than the input and usually far
    smaller. Skew = any keyed exchange's skew; a single key's history
    must fit a partition (fine: a key's event count is bounded by
    retention, not corpus size).

    No reference analog — engine mandate (temporal-versioning family).
    """

    def bucketer(t: pa.Table) -> pa.Table:
        u = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket",
            pa.array((u.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)),
        )

    def runs(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        ts_ty = g.schema.field(ts_col).type
        empty = pa.table(
            {
                key: pa.array([], type=g.schema.field(key).type),
                "state": pa.array([], type=g.schema.field(state_col).type),
                "valid_from": pa.array([], type=ts_ty),
                "valid_to": pa.array([], type=ts_ty),
                "n_events": pa.array([], type=pa.int64()),
            }
        )
        if not g.num_rows:
            return empty
        u = g.column(key).to_numpy(zero_copy_only=False)
        t_us = _ts_i64(g.column(ts_col))
        o = g.column(order_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((o, t_us, u))
        g = g.take(pa.array(order))
        u = u[order]
        t_us = t_us[order]
        st = g.column(state_col)
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        import pyarrow.compute as pc

        # null state: pc.equal yields null → fill False → a null always
        # starts a new run (the conservative choice; matches an oracle
        # using `prev IS DISTINCT FROM cur` only when states are non-null,
        # which the events table guarantees)
        same_state = (
            pc.equal(st[1:], st[:-1])
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        same_key = u[1:] == u[:-1]
        starts = np.concatenate([[True], ~(same_key & same_state)])
        sidx = np.nonzero(starts)[0]
        run_key = u[sidx]
        valid_from = t_us[sidx]
        n_events = np.diff(np.append(sidx, len(u)))
        # valid_to = next run's valid_from within the same key, else null
        nxt = np.empty(len(sidx), dtype=np.int64)
        nxt[:-1] = valid_from[1:]
        nxt[-1] = 0
        same_next = np.empty(len(sidx), dtype=bool)
        same_next[:-1] = run_key[1:] == run_key[:-1]
        same_next[-1] = False
        vf = pa.array(valid_from.astype("datetime64[us]")).cast(ts_ty) if pa.types.is_timestamp(ts_ty) else pa.array(valid_from)
        vt_np = np.where(same_next, nxt, 0)
        vt = pa.array(vt_np.astype("datetime64[us]"), mask=~same_next).cast(ts_ty) if pa.types.is_timestamp(ts_ty) else pa.array(vt_np, mask=~same_next)
        return pa.table(
            {
                key: g.column(key).take(pa.array(sidx)),
                "state": st.take(pa.array(sidx)),
                "valid_from": vf,
                "valid_to": vt,
                "n_events": pa.array(n_events.astype(np.int64)),
            }
        )

    return grouped_map(
        events_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        runs,
        num_partitions=num_partitions,
    )


def gap_fill_locf(events_ds, key="user_id", ts_col="ts", value_col="value",
                  hour_us=3_600_000_000, max_span=100_000,
                  num_buckets=32, num_partitions=32):
    """Time-series resample + gap fill: per ``key``, aggregate the event
    stream to an HOURLY series (int micro-unit sums — the engine's
    summation-order-independent quantization), then emit one row for
    EVERY hour between the key's first and last observation, filling
    missing hours with the last observed value (LOCF — the standard
    sensor/telemetry upsampling rule). Output columns:
    ``(key, hr, v_q, observed)`` where ``hr`` is epoch-hours, ``v_q`` the
    filled int64 micro-unit sum, ``observed`` 1 for real hours / 0 for
    filled ones.

    Scale shape: a per-batch COMBINER collapses raw events to
    ``(key, hour) → int-sum`` partials before the shuffle (the exchange
    moves at most |keys|·|hours| rows per batch, not events), then ONE
    exchange keyed on ``key % num_buckets``; the grid expansion is
    per-key bounded (span hours, capped at ``max_span`` — excess counted
    via ``gap_fill_span_truncated``), so output size is
    sum(min(span_k, max_span)) independent of event count. Per
    partition everything is vectorized: reduceat per-(key,hour) folds,
    repeat/arange grid build, ONE composite-key searchsorted for the
    fill (no per-key loop). A key's series must fit a partition — the
    same retention-bounded assumption as ``scd2_intervals``.

    No reference analog — engine mandate (time-series resampling
    family); pairs with ``asof_match`` (point lookups) the way SCD2
    pairs with CDC merge (state over time vs latest state).
    """
    from osm_export_tool_python_ray.state.metrics import report_cap

    HBIAS = np.int64(1) << np.int64(39)  # pre-1970 → still nonnegative
    KSHIFT = np.int64(40)

    def _fold(ck, v):
        """(composite-key, value) → per-distinct-key int sums, sorted."""
        order = np.argsort(ck, kind="stable")
        ck, v = ck[order], v[order]
        starts = np.concatenate([[True], ck[1:] != ck[:-1]])
        sidx = np.nonzero(starts)[0]
        return ck[sidx], np.add.reduceat(v, sidx)

    def combiner(t: pa.Table) -> pa.Table:
        """Raw events → per-batch (key, hour) int-micro-unit partials."""
        if not t.num_rows:
            return pa.table(
                {
                    key: pa.array([], type=pa.int64()),
                    "hr": pa.array([], type=pa.int64()),
                    "v_q": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        u = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        h = _ts_i64(t.column(ts_col)) // hour_us
        # int micro-units BEFORE any sum (order independence — see
        # q_events_sliding)
        v = np.floor(
            t.column(value_col).to_numpy(zero_copy_only=False) * 1e4 + 0.5
        ).astype(np.int64)
        ck, vv = _fold((u << KSHIFT) | (h + HBIAS), v)
        uu = ck >> KSHIFT
        return pa.table(
            {
                key: pa.array(uu),
                "hr": pa.array((ck & ((np.int64(1) << KSHIFT) - 1)) - HBIAS),
                "v_q": pa.array(vv),
                "bucket": pa.array(
                    (uu.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    OUT = pa.schema(
        [(key, pa.int64()), ("hr", pa.int64()),
         ("v_q", pa.int64()), ("observed", pa.int64())]
    )

    def fill(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({f.name: pa.array([], type=f.type) for f in OUT})
        u = g.column(key).to_numpy(zero_copy_only=False)
        h = g.column("hr").to_numpy(zero_copy_only=False)
        v = g.column("v_q").to_numpy(zero_copy_only=False)
        # complete the cross-batch fold of the combiner partials
        ck, vv = _fold((u << KSHIFT) | (h + HBIAS), v)
        uu = ck >> KSHIFT
        hh = (ck & ((np.int64(1) << KSHIFT) - 1)) - HBIAS
        # per-key span grid
        kstart = np.nonzero(np.concatenate([[True], uu[1:] != uu[:-1]]))[0]
        kend = np.append(kstart[1:], len(uu)) - 1
        h0, h1 = hh[kstart], hh[kend]
        span = h1 - h0 + 1
        over = span > max_span
        if over.any():
            report_cap("gap_fill_span_truncated", int((span[over] - max_span).sum()))
            span = np.minimum(span, max_span)
        total = int(span.sum())
        krow = np.repeat(np.arange(len(span)), span)
        offs = np.concatenate([[np.int64(0)], np.cumsum(span)])[:-1]
        hr = h0[krow] + (np.arange(total) - np.repeat(offs, span))
        out_ck = (uu[kstart][krow] << KSHIFT) | (hr + HBIAS)
        # LOCF: last observed (key,hour) ≤ each grid point — hr ≥ h0 of
        # the SAME key guarantees idx stays inside the key's block
        idx = np.searchsorted(ck, out_ck, side="right") - 1
        return pa.table(
            {
                key: pa.array(uu[kstart][krow]),
                "hr": pa.array(hr),
                "v_q": pa.array(vv[idx]),
                "observed": pa.array((ck[idx] == out_ck).astype(np.int64)),
            }
        )

    return grouped_map(
        events_ds.map_batches(combiner, batch_format="pyarrow"),
        "bucket",
        lambda g: fill(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [(key, pa.int64()), ("hr", pa.int64()), ("v_q", pa.int64())]
        ),
    )
