"""Group-wise top-k — the combiner-shaped selection operator (engine
mandate; no reference analog). ``topk_per_group`` keeps the k best rows
per group under an explicit (sort_col desc, tie_col asc) order.

Scale shape: a per-BATCH partial top-k runs before the exchange, so at
most ``groups_in_batch × k`` rows leave any input block regardless of
input size — the shuffle moves candidate sets, not data. The final
per-group merge re-applies the same selection to the union of partials
(idempotent: top-k of concatenated per-batch top-ks equals global
top-k). Both passes are one lexsort + segment slice, no per-row Python.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map


def _select_topk(
    t: pa.Table, group_col, sort_col, tie_col, k, with_rank=False, ascending=False
):
    """Vectorized per-group top-k of one table: lexsort rows by
    (group, ±sort, tie), then keep each group's first k. ``ascending``
    selects the k SMALLEST (bottom-k), e.g. min-hash sampling."""
    if t.num_rows == 0:
        out = t
        if with_rank:
            out = out.append_column("rank", pa.array([], type=pa.int64()))
        return out
    g = t.column(group_col).to_numpy(zero_copy_only=False)
    s = t.column(sort_col).to_numpy(zero_copy_only=False)
    tie = t.column(tie_col).to_numpy(zero_copy_only=False)
    # np.lexsort: last key is primary; group asc, score desc/asc, tie asc
    _, ginv = np.unique(g, return_inverse=True)
    if not ascending:
        # ~s is an exact order-reversal for signed AND unsigned ints
        # (float cast would lose uint64 precision; -s overflows edges)
        s = np.invert(s) if s.dtype.kind in "iu" else -s
    order = np.lexsort((tie, s, ginv))
    gs = ginv[order]
    seg_start_mask = np.concatenate(([True], gs[1:] != gs[:-1]))
    seg_starts = np.maximum.accumulate(
        np.where(seg_start_mask, np.arange(len(gs)), 0)
    )
    rank = np.arange(len(gs)) - seg_starts  # 0-based within group
    keep = rank < k
    idx = pa.array(order[keep])
    out = t.take(idx)
    if with_rank:
        out = out.append_column("rank", pa.array((rank[keep] + 1).astype(np.int64)))
    return out


def topk_per_group(
    ds,
    *,
    group_col,
    sort_col,
    tie_col,
    k,
    num_buckets=16,
    num_partitions=8,
    ascending=False,
):
    """Top-k rows per ``group_col`` value ordered by (``sort_col`` DESC —
    or ASC with ``ascending=True`` — then ``tie_col`` ASC), with a 1-based
    ``rank`` column. Deterministic under any parallelism because the
    order is total (tie_col must be unique within a group)."""

    def partial(t: pa.Table) -> pa.Table:
        from osm_export_tool_python_ray.stages.exchange import hash_bucket

        t = _select_topk(t, group_col, sort_col, tie_col, k, ascending=ascending)
        return t.append_column(
            "bucket", pa.array(hash_bucket(t.column(group_col), num_buckets))
        )

    def final(t: pa.Table) -> pa.Table:
        return _select_topk(
            t.drop_columns(["bucket"]),
            group_col,
            sort_col,
            tie_col,
            k,
            with_rank=True,
            ascending=ascending,
        )

    return grouped_map(
        ds.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        final,
        num_partitions=num_partitions,
    )
