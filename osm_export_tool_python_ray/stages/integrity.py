"""Order-independent table checksums (anti-entropy / replication
verification): one digest row per table from a single scan, any row
order, any partitioning.

The primitive behind replica reconciliation (Dynamo/Cassandra-style
anti-entropy, warehouse copy validation, OSM mirror audits): two sides
compute ``sum(h(row)) mod P`` independently and compare one number per
table. Addition is commutative, so the digest is invariant to block
order, shuffle strategy, and parallelism — exactly what a distributed
integrity check needs.

Row hash = little-endian u64 of ``md5(canonical row string)`` — the
same md5-of-text family the engine's fingerprint/bloom stages use, so
a DuckDB oracle re-derives it with ``md5()`` + the hex→u64 extraction
(`pipelines/queries.py _le64_expr`). md5 is per-row (hashlib) by
design: an integrity digest is compute-bound on the hash itself; the
per-row cost IS the workload (same trade as pii_redact's red_md5,
stages/textstages.py:203).

Modulus P = 2^61−1 keeps every partial AND every fold step inside
int64 while the oracle does the same fold in HUGEINT then one mod.
Per-batch partials are (table, n_rows, csum<P); the final fold is a
tiny keyed exchange (one group per table) that re-mods per partial —
no driver state, output is O(#tables).
"""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osm_export_tool_python_ray.stages.exchange import grouped_map

P61 = (1 << 61) - 1

PARTIAL = pa.schema(
    [
        ("tbl", pa.string()),
        ("n_rows", pa.int64()),
        ("csum", pa.int64()),
        ("bucket", pa.int32()),
    ]
)


def _row_strings(t: pa.Table, cols) -> pa.Array:
    """Canonical '|'-joined row strings: ints rendered by arrow's cast
    (identical to DuckDB's VARCHAR cast for integers), strings raw.
    Columns must be non-null (concat semantics with nulls differ across
    engines — callers pick null-free key/category columns)."""
    parts = []
    for c in cols:
        col = t.column(c)
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(col)
    return pc.binary_join_element_wise(*parts, "|")


def checksum_partials(label, cols, bucket):
    """map_batches fn: one (tbl, n_rows, csum) partial per batch."""

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({f.name: pa.array([], type=f.type) for f in PARTIAL})
        rows = _row_strings(t, cols).to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
                for s in rows
            ),
            dtype=np.uint64,
            count=len(rows),
        )
        # exact mod-P sum without object-dtype: 32-bit halves each sum
        # within uint64 for any batch ≤ 2^31 rows, recombined in Python
        lo = int(np.sum(h & np.uint64(0xFFFFFFFF), dtype=np.uint64))
        hi = int(np.sum(h >> np.uint64(32), dtype=np.uint64))
        csum = (lo + (hi << 32)) % P61
        return pa.table(
            {
                "tbl": pa.array([label], type=pa.string()),
                "n_rows": pa.array([t.num_rows], type=pa.int64()),
                "csum": pa.array([csum], type=pa.int64()),
                "bucket": pa.array([bucket], type=pa.int32()),
            }
        )

    return fn


def table_checksums(named_datasets, num_partitions=4):
    """``named_datasets``: list of (label, dataset, key_columns). →
    Dataset (tbl, n_rows, checksum) — one row per table."""
    parts = None
    for i, (label, ds, cols) in enumerate(named_datasets):
        p = ds.map_batches(
            checksum_partials(label, cols, i % max(num_partitions, 1)),
            batch_format="pyarrow",
        )
        parts = p if parts is None else parts.union(p)

    def fold(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table(
                {
                    "tbl": pa.array([], type=pa.string()),
                    "n_rows": pa.array([], type=pa.int64()),
                    "checksum": pa.array([], type=pa.int64()),
                }
            )
        tb = g.column("tbl").to_numpy(zero_copy_only=False)
        n = g.column("n_rows").to_numpy(zero_copy_only=False)
        cs = g.column("csum").to_numpy(zero_copy_only=False)
        order = np.argsort(tb, kind="stable")
        tb, n, cs = tb[order], n[order], cs[order]
        starts = np.nonzero(np.concatenate([[True], tb[1:] != tb[:-1]]))[0]
        ends = np.append(starts[1:], len(tb))
        out_t, out_n, out_c = [], [], []
        for s, e in zip(starts, ends):
            out_t.append(tb[s])
            out_n.append(int(n[s:e].sum()))
            # partials < P ≤ 2^61; fold in Python ints, one mod at the end
            out_c.append(sum(int(x) for x in cs[s:e]) % P61)
        return pa.table(
            {
                "tbl": pa.array(out_t, type=pa.string()),
                "n_rows": pa.array(out_n, type=pa.int64()),
                "checksum": pa.array(out_c, type=pa.int64()),
            }
        )

    return grouped_map(
        parts,
        "bucket",
        lambda g: fold(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("tbl", pa.string()), ("n_rows", pa.int64()), ("csum", pa.int64())]
        ),
    )
