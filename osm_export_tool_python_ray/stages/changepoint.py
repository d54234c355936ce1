"""CUSUM burst detection over an event stream — the changepoint member of
the temporal family: per event_type, which hours show a sustained rate
EXCESS over the type's own mean (one-sided CUSUM with drift k = ceil mean
hourly count, alarm threshold h = 3k).

The CUSUM recursion S_t = max(0, S_{t-1} + (x_t - k)) looks inherently
sequential, but the drawdown identity closes it: with P_t = Σ(x_i - k),
S_t = P_t - min(0, min_{j≤t} P_j) — a cumulative sum minus a running
minimum. That makes the engine side one vectorized pass per key
(np.cumsum + np.minimum.accumulate, no Python loop, no per-step state) and
the oracle side two plain window functions (no recursive CTE) — the same
closed form on both sides, exact int64 throughout.

Scale shape: raw events collapse to (type, hour) partial counts per batch
(combiner), ONE exchange keyed by event_type moves only hourly rows, and
each type's dense hour axis (missing hours count 0 — they DECAY the
statistic, which is the point of CUSUM) is materialized per group, bounded
by the corpus time span (~10⁵ rows per type-decade), never by event count.

Reference analog: none (engine mandate — temporal/streaming family).
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map, hash_bucket

_OUT = pa.schema(
    [
        ("event_type", pa.string()),
        ("n_alarms", pa.int64()),
        ("first_hr", pa.int64()),
        ("s_max", pa.int64()),
    ]
)


def cusum_bursts(
    events_ds,
    bucket_us=3_600_000_000,
    h_mult=3,
    num_buckets=32,
    num_partitions=8,
):
    """→ (event_type, n_alarms, first_hr, s_max): per type, how many
    hours the one-sided CUSUM statistic S exceeds h_mult·k (k =
    ceil(total_events / span_hours) — the dense-axis mean, so a uniform
    stream alarms nowhere and bursts alarm until the excess drains), the
    first alarmed hour (−1 if none) and the maximum alarmed S (0 if
    none). One summary row per type ALWAYS — a changepoint report, and
    never an all-empty dataset (Ray's empty hash-shuffled blocks drop
    their schema; see exchange.grouped_map)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "hr": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        hr = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // bucket_us
        )
        types, tinv = np.unique(et, return_inverse=True)
        key = tinv.astype(np.int64) * np.int64(1 << 40) + (hr + np.int64(1 << 39))
        uk, pos = np.unique(key, return_inverse=True)
        cnt = np.bincount(pos).astype(np.int64)
        ti = (uk >> np.int64(40)).astype(np.int64)
        tb = hash_bucket(pa.array(types, type=pa.string()), num_buckets)
        return pa.table(
            {
                "event_type": pa.array(types[ti], type=pa.string()),
                "hr": pa.array((uk & np.int64((1 << 40) - 1)) - np.int64(1 << 39)),
                "n": pa.array(cnt),
                "bucket": pa.array(np.asarray(tb)[ti].astype(np.int32)),
            }
        )

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({f.name: pa.array([], type=f.type) for f in _OUT})
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        hr = g.column("hr").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((hr, et))
        et, hr, n = et[order], hr[order], n[order]
        # fold cross-batch partials of the same (type, hour)
        same = np.concatenate([[False], (et[1:] == et[:-1]) & (hr[1:] == hr[:-1])])
        starts = np.nonzero(~same)[0]
        n = np.add.reduceat(n, starts)
        et, hr = et[starts], hr[starts]
        tstarts = np.nonzero(np.concatenate([[True], et[1:] != et[:-1]]))[0]
        tends = np.append(tstarts[1:], len(et))
        out_t, out_n, out_h, out_s = [], [], [], []
        for a, b in zip(tstarts, tends):  # per TYPE (few types), inner work vectorized
            h0, h1 = hr[a], hr[b - 1]
            span = int(h1 - h0 + 1)
            total = int(n[a:b].sum())
            k = -(-total // span)  # ceil
            dense = np.full(span, -k, dtype=np.int64)
            dense[(hr[a:b] - h0).astype(np.int64)] += n[a:b]
            P = np.cumsum(dense)
            M = np.minimum.accumulate(np.minimum(P, 0))
            S = P - M
            alarm = S > h_mult * k
            idx = np.nonzero(alarm)[0]
            out_t.append(et[a])
            out_n.append(len(idx))
            out_h.append(int(h0 + idx[0]) if len(idx) else -1)
            out_s.append(int(S[idx].max()) if len(idx) else 0)
        return pa.table(
            {
                "event_type": pa.array(out_t, type=pa.string()),
                "n_alarms": pa.array(out_n, type=pa.int64()),
                "first_hr": pa.array(out_h, type=pa.int64()),
                "s_max": pa.array(out_s, type=pa.int64()),
            }
        )

    return grouped_map(
        events_ds.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        lambda g: scan(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("event_type", pa.string()), ("hr", pa.int64()), ("n", pa.int64())]
        ),
    )
