"""Distributed column profiling (catalog / data-quality primitive):
per-column EXACT null count, EXACT distinct count, min and max, in one
scan of the table.

The metadata pass every ingestion pipeline runs before the real work
(schema drift detection, partition pruning stats, NDV for join
planning). The hard part at scale is the EXACT distinct count per
column: the stage streams per-batch-deduped ``(column, value-repr)``
pairs through ONE exchange bucketed on hash(column, repr) — each
distinct pair lands in exactly one bucket, so global NDV is the SUM of
per-partition distinct counts (no set ever materializes in one place).
Null counts and min/max ride the same stream as tagged per-batch
partial rows; the final fold is a tiny ``groupby(col)``.

Value repr is canonical per declared kind so min/max are ORDER-CORRECT
under plain lexicographic comparison on both the engine and the SQL
side:

* ``int`` / ``ts_us`` — zero-padded 20-digit decimal (nonnegative
  domain; epoch-us for timestamps), so lexicographic == numeric;
* ``cents`` — float quantized to int via floor(x*100+0.5) (exact for
  ≤2-decimal domains — prices, rates), then padded like ``int``;
* ``str`` — the raw value (ASCII memcmp order — matches DuckDB's
  default binary collation).

Scale shape: per-batch ``pc.unique`` combiner shrinks the exchanged
stream to the batch's distinct values; skewed columns (few distinct
values) shrink hardest. Driver state: none — output is one row per
column. No reference analog — engine mandate (catalog/stats family).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osm_export_tool_python_ray.functions.text import hash_strings_128
from osm_export_tool_python_ray.stages.exchange import grouped_map

PAD = 20

PARTIAL = pa.schema(
    [
        ("col", pa.string()),
        ("n_nulls", pa.int64()),
        ("n_distinct", pa.int64()),
        ("min_v", pa.string()),
        ("max_v", pa.string()),
    ]
)


def _repr_array(col: pa.ChunkedArray, kind: str) -> pa.Array:
    """Non-null values of ``col`` → canonical string reprs (see module
    docstring). Vectorized: arrow casts + utf8_lpad, numpy for cents."""
    vals = col.drop_null()
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    if kind == "str":
        return vals
    if kind == "cents":
        v = vals.to_numpy(zero_copy_only=False)
        ints = pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))
    elif kind == "ts_us":
        ints = vals.cast(pa.int64())
    elif kind == "int":
        ints = vals.cast(pa.int64())
    else:
        raise ValueError("unknown profile kind: %r" % kind)
    return pc.utf8_lpad(pc.cast(ints, pa.string()), PAD, "0")


def profile_table(ds, spec, num_buckets=64, num_partitions=16):
    """→ one row per column: (col, n_nulls, n_distinct, min_v, max_v).

    ``spec``: list of ``(column_name, kind)`` with kind in
    {'int', 'cents', 'str', 'ts_us'}."""

    def pairs(t: pa.Table) -> pa.Table:
        cols, reprs, nulls, buckets = [], [], [], []
        for name, kind in spec:
            c = t.column(name)
            u = pc.unique(_repr_array(c, kind))
            n = len(u)
            cols.append(pa.array([name] * (n + 1), type=pa.string()))
            reprs.append(u.cast(pa.string()))
            reprs.append(pa.array([None], type=pa.string()))
            nulls.append(
                np.concatenate(
                    [np.zeros(n, dtype=np.int64), [c.null_count]]
                )
            )
            h1, _ = hash_strings_128(
                pc.binary_join_element_wise(
                    pa.array([name] * n, type=pa.string()), u.cast(pa.string()), "\x00"
                )
            )
            nh1, _ = hash_strings_128(pa.array([name], type=pa.string()))
            buckets.append(
                np.concatenate(
                    [
                        (h1 % np.uint64(num_buckets)).astype(np.int32),
                        (nh1 % np.uint64(num_buckets)).astype(np.int32),
                    ]
                )
            )
        return pa.table(
            {
                "col": pa.concat_arrays([c for c in cols]),
                "repr": pa.concat_arrays(
                    [r.combine_chunks() if isinstance(r, pa.ChunkedArray) else r for r in reprs]
                ),
                "n_nulls": pa.array(np.concatenate(nulls)),
                "bucket": pa.array(np.concatenate(buckets)),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({f.name: pa.array([], type=f.type) for f in PARTIAL})
        g = g.sort_by([("col", "ascending"), ("repr", "ascending")])
        col = g.column("col")
        rep = g.column("repr")
        valid = pc.is_valid(rep).to_numpy(zero_copy_only=False)
        nulls_tbl = pa.TableGroupBy(
            g.filter(pa.array(~valid)).select(["col", "n_nulls"]), "col"
        ).aggregate([("n_nulls", "sum")])
        vt = g.filter(pa.array(valid))
        out_rows = {n: [] for n in PARTIAL.names}
        if vt.num_rows:
            c = vt.column("col").to_numpy(zero_copy_only=False)
            rnp = vt.column("repr").to_numpy(zero_copy_only=False)
            cstart = np.nonzero(np.concatenate([[True], c[1:] != c[:-1]]))[0]
            cend = np.append(cstart[1:], len(c))
            for s, e in zip(cstart, cend):
                seg = rnp[s:e]
                ndv = int((seg[1:] != seg[:-1]).sum()) + 1
                out_rows["col"].append(c[s])
                out_rows["n_nulls"].append(0)
                out_rows["n_distinct"].append(ndv)
                out_rows["min_v"].append(seg[0])
                out_rows["max_v"].append(seg[-1])
        for cn, nn in zip(
            nulls_tbl.column("col").to_pylist(),
            nulls_tbl.column("n_nulls_sum").to_pylist(),
        ):
            out_rows["col"].append(cn)
            out_rows["n_nulls"].append(int(nn))
            out_rows["n_distinct"].append(0)
            out_rows["min_v"].append(None)
            out_rows["max_v"].append(None)
        return pa.table(
            {
                "col": pa.array(out_rows["col"], type=pa.string()),
                "n_nulls": pa.array(out_rows["n_nulls"], type=pa.int64()),
                "n_distinct": pa.array(out_rows["n_distinct"], type=pa.int64()),
                "min_v": pa.array(out_rows["min_v"], type=pa.string()),
                "max_v": pa.array(out_rows["max_v"], type=pa.string()),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    partials = grouped_map(
        ds.map_batches(pairs, batch_format="pyarrow"),
        "bucket",
        lambda g: fold(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("col", pa.string()), ("repr", pa.string()), ("n_nulls", pa.int64())]
        ),
    )
    return partials.groupby("col").aggregate(
        Sum("n_nulls", alias_name="n_nulls"),
        Sum("n_distinct", alias_name="n_distinct"),
        Min("min_v", alias_name="min_v"),
        Max("max_v", alias_name="max_v"),
    )
