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
