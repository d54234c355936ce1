"""Distributed CDC MERGE (upsert + delete): apply a change stream to a
base snapshot, highest version per key wins.

The mutation primitive the rest of the engine lacks: every other join
stage is read-only, but real pipelines maintain snapshots (OSM minutely
replication diffs over a planet extract, warehouse MERGE INTO, training
corpora with takedown/erratum streams). Semantics:

* base:    ``(key, payload...)`` — unique on ``key``.
* changes: ``(key, version, op, payload...)`` — ``op`` in {'U','D'};
  multiple versions per key allowed, the row with the HIGHEST version
  decides. ``(key, version)`` must be unique (the CDC log-offset
  contract) — equal versions would make the winner depend on shuffle
  order. 'U' rows carry the FULL row image (standard CDC), so an 'U'
  whose key is absent from base is an INSERT.
* output:  ``(key, payload...)`` — base rows pass through unless their
  key has a winner; winner 'U' emits the change image (update or
  insert), winner 'D' emits nothing.

Scale shape: ONE keyed exchange over base ∪ changes (tagged union on
``key % num_buckets`` — same movement as a hash join; no driver state,
no broadcast requirement on either side, so a 100 TB base with a 100 GB
diff and a 100 GB base with a 100 TB compacted log both stream). Winner
selection and membership tests are vectorized lexsort / searchsorted per
partition. Tiny change streams can instead be broadcast by the caller
and applied map-side; this stage is the general both-sides-large path.

No reference analog — engine mandate (snapshot-maintenance family);
reference pipelines rebuild from scratch per export (cmd.py:30-62).
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map

OP_UPSERT = "U"
OP_DELETE = "D"


def cdc_merge(
    base_ds,
    changes_ds,
    key,
    version_col="version",
    op_col="op",
    num_buckets=64,
    num_partitions=32,
    base_schema=None,
    changes_schema=None,
):
    """Merge ``changes_ds`` into ``base_ds`` on int64 ``key``; returns a
    Dataset with the base schema. Pass ``base_schema``/``changes_schema``
    when a side may be empty (``Dataset.schema()`` is None then)."""
    if base_schema is None:
        base_schema = base_ds.schema()
    if changes_schema is None:
        changes_schema = changes_ds.schema()
    if base_schema is None or changes_schema is None:
        raise ValueError("empty side without an explicit schema")
    base_schema = pa.schema(
        [(n, t) for n, t in zip(base_schema.names, base_schema.types)]
    )
    payload = [n for n in base_schema.names if n != key]
    want = set(payload) | {key, version_col, op_col}
    have = set(changes_schema.names)
    if want - have:
        raise ValueError("changes side missing columns: %s" % sorted(want - have))
    ptypes = dict(zip(base_schema.names, base_schema.types))

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                key: t.column(key),
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
                "__bucket": pa.array(
                    (k.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
                ),
                version_col: (
                    t.column(version_col)
                    if side
                    else pa.nulls(n, type=pa.int64())
                ),
                op_col: t.column(op_col) if side else pa.nulls(n, type=pa.string()),
            }
            for name in payload:
                cols[name] = t.column(name).cast(ptypes[name])
            return pa.table(cols)

        return fn

    unioned = base_ds.map_batches(tag(0), batch_format="pyarrow").union(
        changes_ds.select_columns(
            [key, version_col, op_col] + payload
        ).map_batches(tag(1), batch_format="pyarrow")
    )

    def merge_partition(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        k = g.column(key).to_numpy(zero_copy_only=False)
        cidx = np.nonzero(side == 1)[0]
        bidx = np.nonzero(side == 0)[0]
        out_cols = [key] + payload
        if len(cidx) == 0:
            return g.take(pa.array(bidx)).select(out_cols)
        ver = g.column(version_col).to_numpy(zero_copy_only=False)[cidx]
        ck = k[cidx]
        order = np.lexsort((ver, ck))  # key asc, then version asc
        ck_sorted = ck[order]
        # last row of each key run = highest version (ties impossible
        # under the (key, version)-unique contract)
        is_last = np.concatenate([ck_sorted[1:] != ck_sorted[:-1], [True]])
        widx = cidx[order[is_last]]  # winner row indices, key-sorted
        wkeys = ck_sorted[is_last]
        wop = g.column(op_col).take(pa.array(widx))
        # base rows whose key has ANY winner are superseded
        bk = k[bidx]
        pos = np.searchsorted(wkeys, bk)
        pos_c = np.minimum(pos, len(wkeys) - 1)
        superseded = wkeys[pos_c] == bk
        keep_base = bidx[~superseded]
        upserts = widx[wop.to_numpy(zero_copy_only=False) == OP_UPSERT]
        return g.take(
            pa.array(np.concatenate([keep_base, upserts]))
        ).select(out_cols)

    exchange_schema = pa.schema(
        [(key, ptypes[key]), (version_col, pa.int64()), (op_col, pa.string())]
        + [(n, ptypes[n]) for n in payload]
    )
    return grouped_map(
        unioned,
        "__bucket",
        merge_partition,
        num_partitions=num_partitions,
        payload_schema=exchange_schema,
    )
