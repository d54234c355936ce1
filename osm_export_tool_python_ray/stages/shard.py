"""Rendezvous (highest-random-weight) shard assignment — the
partition-assignment primitive a 100 TB engine uses to route keys to a
fixed fleet of writers/owners with MINIMAL movement under resharding:
when a shard is removed, only the keys that lived on it move (each
surviving key keeps its argmax), unlike mod-N hashing where nearly
every key relocates. The same property drives consistent cache
ownership and checkpoint-partition routing (state/checkpoint.py
partitions stay stable as the writer fleet resizes).

Determinism contract (oracle-exact, pipelines/queries.py): the weight
of (key, shard s) is splitmix64-avalanche over the wrapping-u64 value
key·K1 + s·K2 — `functions/text.py _mix64`, mirrored bit-for-bit by
`_sql_mix64` / `_sql_mulmod64` on the DuckDB side — and the owner is
the lexicographic max by (weight DESC, s ASC). Pure integer; no float
anywhere.

Scale shape: one stateless ``map_batches`` computes the N_SHARDS × B
weight matrix per batch (vectorized broadcast over a tiny shard axis)
and folds to per-shard partials (count, id-sum, min, max) before a
groupby over at most N_SHARDS rows. No exchange of the data itself —
assignment is a pure function of the key.

No reference analog — engine mandate (partitioning/state family).
"""

import numpy as np
import pyarrow as pa

K1 = np.uint64(0x9E3779B97F4A7C15)
K2 = np.uint64(0xBF58476D1CE4E5B9)


def _mix64_u(v):
    from osm_export_tool_python_ray.functions.text import _mix64

    return _mix64(v)


def rendezvous_weights(keys, n_shards):
    """(n_shards, len(keys)) uint64 weight matrix."""
    k = keys.astype(np.uint64, copy=False)
    s = np.arange(n_shards, dtype=np.uint64).reshape(-1, 1)
    with np.errstate(over="ignore"):
        base = k[None, :] * K1 + s * K2
        return _mix64_u(base)


def rendezvous_pick(keys, n_shards):
    """Owner shard per key: argmax weight, smallest shard id on ties
    (np.argmax picks the first occurrence along the shard axis)."""
    return np.argmax(rendezvous_weights(keys, n_shards), axis=0).astype(np.int64)


def shard_assign(docs_ds, n_shards=16):
    """Per-shard assignment stats over the documents table:
    (shard, n, id_sum, min_doc, max_doc)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        shard = rendezvous_pick(d, n_shards)
        uq, inv, cnt = np.unique(shard, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uq), dtype=np.int64)
        np.add.at(sums, inv, d)
        mins = np.full(len(uq), np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, d)
        maxs = np.full(len(uq), np.iinfo(np.int64).min)
        np.maximum.at(maxs, inv, d)
        return pa.table(
            {
                "shard": pa.array(uq),
                "n": pa.array(cnt.astype(np.int64)),
                "id_sum": pa.array(sums),
                "min_doc": pa.array(mins),
                "max_doc": pa.array(maxs),
            }
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("id_sum", alias_name="id_sum"),
            Min("min_doc", alias_name="min_doc"),
            Max("max_doc", alias_name="max_doc"),
        )
    )
