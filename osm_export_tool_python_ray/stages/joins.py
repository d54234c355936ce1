"""Partitioned hash-join for batches with nested payload columns.

``ray.data.Dataset.join`` finalizes with Arrow acero, which rejects
``list<>``/``map<>`` non-key columns (pyarrow 16). Geometry assembly must
join exactly such payloads (coordinate lists, tag maps), so this module
implements the portable pattern from the Ray Data guide: tag each side,
align schemas, union, one ``groupby(key % B)`` shuffle, then a vectorized
``searchsorted`` merge per bucket (plain ``take`` — any column type).

The right side must be unique on the key (true for all engine uses:
way_id / relation_id / element keys are deduped upstream). Cost: ONE
sort-shuffle over left+right — same data movement as a hash join.
"""

import numpy as np
import pyarrow as pa


def bucket_join(left_ds, right_ds, key, num_buckets=64, how="inner", left_schema=None, right_schema=None):
    """Join two Datasets on an int64 ``key``; right side unique on key.

    how='inner' drops unmatched left rows; how='left' keeps them with null
    right-payload columns. Returns key + left payload + right payload.
    Pass ``left_schema``/``right_schema`` (pa.Schema) when a side may be
    empty — ``Dataset.schema()`` is None for an empty dataset."""
    if left_schema is None:
        left_schema = left_ds.schema()
    if right_schema is None:
        right_schema = right_ds.schema()
    if left_schema is None or right_schema is None:
        raise ValueError("empty side without an explicit schema")
    lnames = [n for n in left_schema.names if n != key]
    rnames = [n for n in right_schema.names if n != key]
    overlap = set(lnames) & set(rnames)
    if overlap:
        raise ValueError("overlapping payload columns: %s" % sorted(overlap))
    ltypes = dict(zip(left_schema.names, left_schema.types))
    rtypes = dict(zip(right_schema.names, right_schema.types))

    def widen(side):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            k = t.column(key).to_numpy(zero_copy_only=False)
            cols = {
                key: t.column(key),
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
                "__bucket": pa.array((k % num_buckets).astype(np.int32)),
            }
            for name in lnames:
                cols[name] = t.column(name) if side == 0 else pa.nulls(n, type=ltypes[name])
            for name in rnames:
                cols[name] = t.column(name) if side == 1 else pa.nulls(n, type=rtypes[name])
            return pa.table(cols)

        return fn

    unioned = left_ds.map_batches(widen(0), batch_format="pyarrow").union(
        right_ds.map_batches(widen(1), batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        keys = group.column(key).to_numpy(zero_copy_only=False)
        lmask = side == 0
        lidx = np.nonzero(lmask)[0]
        ridx = np.nonzero(~lmask)[0]
        rkeys = keys[ridx]
        order = np.argsort(rkeys, kind="stable")
        rkeys_sorted = rkeys[order]
        ridx_sorted = ridx[order]

        lkeys = keys[lidx]
        pos = np.searchsorted(rkeys_sorted, lkeys)
        pos_clip = np.minimum(pos, max(len(rkeys_sorted) - 1, 0))
        matched = (
            (rkeys_sorted[pos_clip] == lkeys) if len(rkeys_sorted) else np.zeros(len(lkeys), dtype=bool)
        )

        if how == "inner":
            l_take = lidx[matched]
            r_take = ridx_sorted[pos_clip[matched]]
            lt = group.take(pa.array(l_take))
            rt = group.take(pa.array(r_take))
            cols = {key: lt.column(key)}
            for name in lnames:
                cols[name] = lt.column(name)
            for name in rnames:
                cols[name] = rt.column(name)
            return pa.table(cols)

        # left join: unmatched keep null right payload
        lt = group.take(pa.array(lidx))
        cols = {key: lt.column(key)}
        for name in lnames:
            cols[name] = lt.column(name)
        r_take = np.where(matched, pos_clip, 0)
        for name in rnames:
            if len(ridx_sorted):
                taken = group.take(pa.array(ridx_sorted[r_take])).column(name)
                if isinstance(taken, pa.ChunkedArray):
                    taken = taken.combine_chunks()
                arr = _mask_nulls(taken, ~matched)
            else:
                arr = pa.nulls(len(lidx), type=rtypes[name])
            cols[name] = arr
        return pa.table(cols)

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    return grouped_map(
        unioned,
        "__bucket",
        lambda g: merge(g.drop_columns(["__bucket"])),
        num_partitions=min(num_buckets, 32),
    )


def _mask_nulls(arr, null_mask):
    """Set arr[i] = null where null_mask[i] (masked take)."""
    if not null_mask.any():
        return arr
    take_idx = pa.array(np.arange(len(arr), dtype=np.int64), mask=null_mask)
    return arr.take(take_idx)
