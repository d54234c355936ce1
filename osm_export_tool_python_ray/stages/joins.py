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

    # the exchange schema is statically known (key + tags + both sides'
    # payloads) — feed the sort-vs-hash width heuristic so light flat
    # joins (e.g. the TextRank iteration joins) take the measured-faster
    # hash path while nested-payload joins keep sort
    exchange_schema = pa.schema(
        [
            pa.field(key, pa.int64()),
            pa.field("__side", pa.int8()),
            pa.field("__bucket", pa.int32()),
        ]
        + [pa.field(n, ltypes[n]) for n in lnames]
        + [pa.field(n, rtypes[n]) for n in rnames]
    )
    return grouped_map(
        unioned,
        "__bucket",
        lambda g: merge(g.drop_columns(["__bucket"])),
        num_partitions=min(num_buckets, 32),
        payload_schema=exchange_schema,
    )


def multi_join(base_ds, base_schema, sides, key, num_buckets=64):
    """Multiway keyed join through ONE exchange: ``base_ds`` joined
    against every side in ``sides`` on the same int64 ``key``, all sides
    co-located by a single ``key % B`` shuffle instead of one exchange
    per pairwise join. This is the composition primitive for per-doc
    stage outputs (dedup survivors ⋈ cluster labels ⋈ quality scores ⋈
    contamination flags): every side is unique on the key, every payload
    is flat, and re-partitioning N times by the SAME key would move the
    same rows N times for no added co-location.

    ``sides`` is a list of ``(ds, schema, how)`` with ``how`` in
    {'inner', 'left'}: 'inner' drops base rows with no match in that
    side, 'left' keeps them with null payload. Explicit schemas are
    required (``Dataset.schema()`` is None for empty/lazy datasets, and
    the union below must align columns before anything executes).
    Payload column names must be disjoint across base and all sides.
    Output: key + base payload + each side's payload, one row per
    surviving base row."""
    schemas = [base_schema] + [s for _, s, _ in sides]
    names = []  # per-input payload column lists
    types = {}
    for sch in schemas:
        cols = [n for n in sch.names if n != key]
        names.append(cols)
        for n in cols:
            if n in types:
                raise ValueError("overlapping payload column: %s" % n)
            types[n] = sch.field(n).type
    all_payload = [n for cols in names for n in cols]

    def widen(side_idx):
        own = set(names[side_idx])

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            k = t.column(key).to_numpy(zero_copy_only=False)
            cols = {
                key: t.column(key),
                "__side": pa.array(np.full(n, side_idx, dtype=np.int8)),
                "__bucket": pa.array((k % num_buckets).astype(np.int32)),
            }
            for name in all_payload:
                cols[name] = t.column(name) if name in own else pa.nulls(n, type=types[name])
            return pa.table(cols)

        return fn

    unioned = base_ds.map_batches(widen(0), batch_format="pyarrow")
    for i, (ds, _, _) in enumerate(sides):
        unioned = unioned.union(ds.map_batches(widen(i + 1), batch_format="pyarrow"))

    hows = [h for _, _, h in sides]

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        keys = group.column(key).to_numpy(zero_copy_only=False)
        bidx = np.nonzero(side == 0)[0]
        bkeys = keys[bidx]
        # per side: sorted keys + matched/position vs the base rows
        matched, srcpos = [], []
        for i in range(len(sides)):
            sidx = np.nonzero(side == i + 1)[0]
            skeys = keys[sidx]
            order = np.argsort(skeys, kind="stable")
            sk = skeys[order]
            si = sidx[order]
            pos = np.searchsorted(sk, bkeys)
            posc = np.minimum(pos, max(len(sk) - 1, 0))
            m = (sk[posc] == bkeys) if len(sk) else np.zeros(len(bkeys), dtype=bool)
            matched.append(m)
            srcpos.append(si[posc] if len(sk) else np.zeros(len(bkeys), dtype=np.int64))
        keep = np.ones(len(bkeys), dtype=bool)
        for m, how in zip(matched, hows):
            if how == "inner":
                keep &= m
        b_take = bidx[keep]
        bt = group.take(pa.array(b_take))
        cols = {key: bt.column(key)}
        for name in names[0]:
            cols[name] = bt.column(name)
        for i, (_, _, how) in enumerate(sides):
            m = matched[i][keep]
            taken = group.take(pa.array(srcpos[i][keep]))
            for name in names[i + 1]:
                arr = taken.column(name)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                cols[name] = _mask_nulls(arr, ~m) if how == "left" else arr
        return pa.table(cols)

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    exchange_schema = pa.schema(
        [pa.field(key, pa.int64()), pa.field("__side", pa.int8()), pa.field("__bucket", pa.int32())]
        + [pa.field(n, types[n]) for n in all_payload]
    )
    return grouped_map(
        unioned,
        "__bucket",
        lambda g: merge(g.drop_columns(["__bucket"])),
        num_partitions=min(num_buckets, 32),
        payload_schema=exchange_schema,
    )


def _mask_nulls(arr, null_mask):
    """Set arr[i] = null where null_mask[i] (masked take)."""
    if not null_mask.any():
        return arr
    take_idx = pa.array(np.arange(len(arr), dtype=np.int64), mask=null_mask)
    return arr.take(take_idx)
