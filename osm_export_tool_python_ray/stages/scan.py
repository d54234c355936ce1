"""Distributed ordered prefix-scan (exclusive running sum in a total row
order) — the primitive behind sequence packing, ordered sharding, and
byte-offset assignment, which Ray Data has no native operator for
(engine mandate; no reference analog).

Two-phase scan, the classic formulation:

1. rows are RANGE-bucketed on the (unique, integer) order column, so
   bucket id order == row order across buckets;
2. phase A: a combiner-shaped per-bucket SUM (map-side partials, one
   tiny exchange of ``num_buckets`` rows) is collected to the driver —
   the only driver-side state, O(num_buckets);
3. the exclusive scan of the bucket totals is broadcast (``ray.put``);
4. phase B: one grouped exchange; each bucket sorts locally, takes its
   local exclusive cumsum, and adds its broadcast bucket offset.

The scanned projection is materialized once (order + value columns
only — two int64s per row) because phases A and B both consume it;
re-executing the upstream per phase would double the producing
pipeline's work.
"""

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map


def ordered_prefix_scan(ds, *, order_col, value_col, num_buckets=64, num_partitions=8):
    """→ Dataset[(order_col, value_col, cum_excl)]: ``cum_excl`` is the
    sum of ``value_col`` over all rows with a smaller ``order_col``
    (exclusive prefix sum in total order). ``order_col`` must be unique
    integers; ``value_col`` integer."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    proj = ds.select_columns([order_col, value_col]).materialize()
    mx = proj.max(order_col)
    if mx is None:
        return proj.map_batches(
            lambda t: t.append_column("cum_excl", pa.array([], type=pa.int64())),
            batch_format="pyarrow",
        )
    mn = int(proj.min(order_col))
    # bucket by DIVISION over the min-offset id: `o * num_buckets // span`
    # would overflow int64 for hash-sized ids, and a negative id would
    # index the offsets array from the tail — both silent corruption
    span = int(mx) - mn + 1
    if span > (1 << 62):  # o - mn must stay in int64
        raise ValueError("order_col span %d exceeds int64-safe range" % span)
    range_size = -(-span // num_buckets)  # ceil

    def add_bucket(t: pa.Table) -> pa.Table:
        o = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (o - mn) // range_size
        return t.append_column("bucket", pa.array(b))

    bucketed = proj.map_batches(add_bucket, batch_format="pyarrow")

    # phase A: bucket totals (combiner-shaped groupby over map-side rows)
    totals_rows = (
        bucketed.groupby("bucket").aggregate(Sum(value_col, alias_name="tot")).take_all()
    )
    offsets = np.zeros(num_buckets + 1, dtype=np.int64)
    for r in totals_rows:
        offsets[int(r["bucket"]) + 1] = int(r["tot"])
    offsets = np.cumsum(offsets)  # offsets[b] = sum of all buckets < b
    offsets_ref = ray.put(offsets)

    # phase B: per-bucket local scan + broadcast offset
    def scan(g: pa.Table) -> pa.Table:
        off = cached_get(offsets_ref)
        g = g.sort_by([("bucket", "ascending"), (order_col, "ascending")])
        b = g.column("bucket").to_numpy(zero_copy_only=False)
        v = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(v) - v  # exclusive, but global across mixed buckets
        # re-zero at each bucket boundary (hash path may mix buckets)
        starts = np.nonzero(np.concatenate(([True], b[1:] != b[:-1])))[0]
        base = np.repeat(cum[starts], np.diff(np.append(starts, len(b))))
        cum = cum - base + off[b]
        return g.drop_columns(["bucket"]).append_column("cum_excl", pa.array(cum))

    return grouped_map(bucketed, "bucket", scan, num_partitions=num_partitions)


def group_ntile(events_ds, ntiles=10, num_buckets=64, num_partitions=8):
    """Exact distributed NTILE — per event_type, rank rows by
    (int64-cent value, event_id) ascending and assign SQL-standard
    1-based ntile buckets (the first count %% n tiles get the ceil
    size). Returns (event_id, event_type, tile), one row per input row
    — the per-row global-ordinal-ranking primitive (percentile cohorts,
    decile feature bins) that Ray Data has no native operator for.

    Same two-phase shape as ordered_prefix_scan, generalized to a rank
    scan PER GROUP key: rows are range-bucketed on the value axis (the
    tie-break id never crosses buckets because bucketing depends on the
    value alone), a combiner groupby collects per-(type, vbucket) row
    counts to the driver — O(|event types| x num_buckets) ints, the same
    bounded driver state the prefix scan holds — and one keyed exchange
    ranks each bucket locally against its broadcast exclusive offset.
    The ntile index is then a pure integer function of (global rank,
    group total): n_big = tot %% ntiles tiles of size tot//ntiles + 1
    first, matching DuckDB/postgres NTILE exactly.

    No reference analog — engine mandate (windowed-ranking family).
    """
    import ray
    from ray.data.aggregate import Count

    from osm_export_tool_python_ray.state.broadcast import cached_get

    def project(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "vmic": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            }
        )

    proj = events_ds.map_batches(project, batch_format="pyarrow").materialize()
    mx = proj.max("vmic")
    if mx is None:
        return proj.map_batches(
            lambda t: pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "event_type": pa.array([], type=pa.string()),
                    "tile": pa.array([], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    mn = int(proj.min("vmic"))
    span = int(mx) - mn + 1
    range_size = -(-span // num_buckets)  # ceil

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column("vmic").to_numpy(zero_copy_only=False)
        return t.append_column("vbucket", pa.array((v - mn) // range_size))

    bucketed = proj.map_batches(add_bucket, batch_format="pyarrow")

    # phase A: per-(type, vbucket) row counts -> driver (bounded by
    # |types| x num_buckets, the documented O(num_buckets) state class)
    rows = (
        bucketed.groupby(["event_type", "vbucket"])
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    types = sorted({r["event_type"] for r in rows})
    tindex = {s: i for i, s in enumerate(types)}
    counts = np.zeros((len(types), num_buckets), dtype=np.int64)
    for r in rows:
        counts[tindex[r["event_type"]], int(r["vbucket"])] = int(r["n"])
    totals = counts.sum(axis=1)
    excl = np.cumsum(counts, axis=1) - counts  # rows of the type before vbucket
    state_ref = ray.put((types, excl, totals))

    def rank_tile(g: pa.Table) -> pa.Table:
        types_b, excl_b, totals_b = cached_get(state_ref)
        tidx = {s: i for i, s in enumerate(types_b)}
        g = g.sort_by(
            [
                ("event_type", "ascending"),
                ("vbucket", "ascending"),
                ("vmic", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        import pyarrow.compute as pc

        # dictionary-encode so the Python dict lookup runs over the
        # (tiny) distinct-type vocabulary, never per row
        d = pc.dictionary_encode(g.column("event_type").combine_chunks())
        dmap = np.array([tidx[s] for s in d.dictionary.to_pylist()], dtype=np.int64)
        ti = dmap[d.indices.to_numpy(zero_copy_only=False)]
        vb = g.column("vbucket").to_numpy(zero_copy_only=False)
        seg = ti * np.int64(num_buckets) + vb
        new = np.concatenate([[True], seg[1:] != seg[:-1]])
        starts = np.nonzero(new)[0]
        local = np.arange(len(seg)) - np.repeat(
            starts, np.diff(np.append(starts, len(seg)))
        )
        rank0 = local + excl_b[ti, vb]
        tot = totals_b[ti]
        size_small = tot // ntiles
        n_big = tot % ntiles
        big_span = n_big * (size_small + 1)
        in_big = rank0 < big_span
        # guard size_small == 0 (tot < ntiles: every row is in a big tile)
        tile = np.where(
            in_big,
            rank0 // np.maximum(size_small + 1, 1),
            n_big + (rank0 - big_span) // np.maximum(size_small, 1),
        ) + 1
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "event_type": g.column("event_type"),
                "tile": pa.array(tile.astype(np.int64)),
            }
        )

    return grouped_map(bucketed, "vbucket", rank_tile, num_partitions=num_partitions)
