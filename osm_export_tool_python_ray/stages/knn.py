"""Spatial kNN nearest-feature queries (SURVEY.md J6 — engine-only, no
reference analog) and per-cell statistics (A3, skew detection).

Cell-local kNN: queries are replicated to the k-ring of their cell
(vectorized), features keyed by their cell; ONE groupby(cell-bucket)
cogroups both sides; per cell a vectorized brute-force top-k runs over the
(query × feature) pairs of that neighborhood; a final tiny
groupby(query_id) merge keeps the global top-k. A query's candidate set is
its (2r+1)² cell neighborhood — callers size ``ring`` so that
neighborhoods at the chosen resolution contain ≥k features (the classic
grid-file kNN trade-off, documented partitioning assumption).

Per-cell counts use partial aggregation inside map_batches before the
groupby — the pre-aggregate pattern that keeps the shuffle tiny and
immune to hot-cell skew.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions.cells import DEFAULT_RES, cell_of, k_ring


def cell_counts(features_ds):
    """Feature count per cell — partial per-batch counts, tiny final
    groupby (A3; drives salt-factor choice for hot cells)."""

    def partial(t: pa.Table) -> pa.Table:
        cells = t.column("cell").to_numpy(zero_copy_only=False)
        u, c = np.unique(cells, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, type=pa.uint64()), "n_partial": pa.array(c.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    return (
        features_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
    )


class QueryExpander:
    """query batch (query_id, lon, lat) → one row per (k-ring cell, salt).

    ``salt_factor`` > 1 is the hot-cell skew split (SURVEY.md §4): feature
    cells are subdivided by hash(osm_id) % s, so a dense urban cell's
    candidate matrix splits into s independent groups; queries replicate to
    every salt. The final per-query merge makes salting semantically
    invisible (global top-k over partial top-ks)."""

    def __init__(self, res=DEFAULT_RES, ring=1, salt_factor=1):
        self.res = res
        self.ring = ring
        self.salt = max(1, int(salt_factor))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qid = batch.column("query_id").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        n = len(qid)
        cells = cell_of(lon, lat, self.res)
        w = 2 * self.ring + 1
        reps = w * w
        # vectorized k-ring: offsets applied to decoded ix/iy
        res_bits = np.uint64(self.res) << np.uint64(58)
        ix = ((cells >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
        iy = (cells & np.uint64((1 << 29) - 1)).astype(np.int64)
        offs = np.arange(-self.ring, self.ring + 1, dtype=np.int64)
        dx, dy = np.meshgrid(offs, offs)
        lim = (1 << (self.res + 8)) - 1
        nx = np.clip(ix[:, None] + dx.ravel()[None, :], 0, lim)
        ny = np.clip(iy[:, None] + dy.ravel()[None, :], 0, lim)
        ring_cells = res_bits | (nx.astype(np.uint64) << np.uint64(29)) | ny.astype(np.uint64)
        salted = (
            ring_cells.ravel()[:, None] * np.uint64(self.salt)
            + np.arange(self.salt, dtype=np.uint64)[None, :]
        ).ravel()
        reps_s = reps * self.salt
        return pa.table(
            {
                "cell": pa.array(salted, type=pa.uint64()),
                "query_id": pa.array(np.repeat(qid, reps_s)),
                "lon": pa.array(np.repeat(lon, reps_s)),
                "lat": pa.array(np.repeat(lat, reps_s)),
                "osm_id": pa.nulls(n * reps_s, type=pa.int64()),
                "side": pa.array(np.zeros(n * reps_s, dtype=np.int8)),
            }
        )


def _feature_side(res, salt_factor=1):
    salt = max(1, int(salt_factor))

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lon = (batch.column("minx").to_numpy(zero_copy_only=False) + batch.column("maxx").to_numpy(zero_copy_only=False)) / 2
        lat = (batch.column("miny").to_numpy(zero_copy_only=False) + batch.column("maxy").to_numpy(zero_copy_only=False)) / 2
        osm_id = batch.column("osm_id").to_numpy(zero_copy_only=False)
        cells = cell_of(lon, lat, res)
        with np.errstate(over="ignore"):
            salts = (osm_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(salt)
        salted = cells * np.uint64(salt) + salts
        return pa.table(
            {
                "cell": pa.array(salted, type=pa.uint64()),
                "query_id": pa.nulls(n, type=pa.int64()),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "osm_id": batch.column("osm_id"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    return fn


def _topk_group(group: pa.Table, k, dist_round=None) -> pa.Table:
    """One cell-bucket: brute-force per-neighborhood top-k (vectorized
    query×feature distance matrix per cell)."""
    side = group.column("side").to_numpy(zero_copy_only=False)
    cells = group.column("cell").to_numpy(zero_copy_only=False)
    qmask = side == 0
    fmask = ~qmask
    out_q, out_f, out_d = [], [], []
    # process per distinct cell inside the bucket
    order = np.argsort(cells, kind="stable")
    cells_s = cells[order]
    bounds = np.nonzero(np.concatenate([[True], cells_s[1:] != cells_s[:-1]]))[0]
    ends = np.append(bounds[1:], len(cells_s))
    qlon = group.column("lon").to_numpy(zero_copy_only=False)
    qlat = group.column("lat").to_numpy(zero_copy_only=False)
    osm = group.column("osm_id").to_numpy(zero_copy_only=False)
    qid = group.column("query_id").to_numpy(zero_copy_only=False)
    for s, e in zip(bounds, ends):
        idx = order[s:e]
        qi = idx[qmask[idx]]
        fi = idx[fmask[idx]]
        if len(qi) == 0 or len(fi) == 0:
            continue
        dlon = qlon[qi][:, None] - qlon[fi][None, :]
        dlat = qlat[qi][:, None] - qlat[fi][None, :]
        d2 = dlon * dlon + dlat * dlat
        kk = min(k, d2.shape[1])
        if dist_round is not None:
            # deterministic k-cut: quantize distances and break ties by
            # osm_id, so equal-distance candidates at the cut are the same
            # ones an (round(dist), id)-ordered oracle keeps — raw-double
            # argpartition picks an arbitrary member of a tied set.
            # Cost stays O(F): argpartition finds the boundary, only the
            # rows TIED AT the boundary value get an id-ordered selection.
            d2 = np.round(d2, dist_round)
            fo = osm[fi]
            for row in range(len(qi)):
                dr = d2[row]
                cand = np.argpartition(dr, kk - 1)[:kk]
                thr = dr[cand].max()
                inner = cand[dr[cand] < thr]
                tied = np.nonzero(dr == thr)[0]
                need = kk - len(inner)
                chosen = tied[np.argsort(fo[tied], kind="stable")[:need]]
                cols = np.concatenate([inner, chosen])
                out_q.append(np.full(kk, qid[qi[row]], dtype=np.int64))
                out_f.append(fo[cols].astype(np.int64))
                out_d.append(dr[cols])
            continue
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        for row in range(len(qi)):
            cols = part[row]
            out_q.append(np.full(kk, qid[qi[row]], dtype=np.int64))
            out_f.append(osm[fi][cols].astype(np.int64))
            out_d.append(d2[row, cols])
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "osm_id": pa.array([], type=pa.int64()),
                "dist2": pa.array([], type=pa.float64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "osm_id": pa.array(np.concatenate(out_f)),
            "dist2": pa.array(np.concatenate(out_d)),
        }
    )


def knn_nearest_features(
    features_ds,
    queries_ds,
    k=5,
    res=DEFAULT_RES,
    ring=1,
    num_buckets=64,
    salt_factor=1,
    dist_round=None,
):
    """→ (query_id, osm_id, dist2, rank) — the k nearest features per query
    within its (2·ring+1)² cell neighborhood.

    Shuffles: 1 groupby(cell bucket) cogroup + 1 groupby(query bucket)
    final merge (both bucketed to keep groups coarse). ``salt_factor``
    splits hot cells (see QueryExpander). ``dist_round`` quantizes
    distances to that many decimals BEFORE ranking (ties then break by
    osm_id deterministically — required when comparing against an
    oracle whose doubles differ in the last ulp)."""
    q = queries_ds.map_batches(QueryExpander(res, ring, salt_factor), batch_format="pyarrow")
    f = features_ds.map_batches(_feature_side(res, salt_factor), batch_format="pyarrow")

    def bucketer_cell(t: pa.Table) -> pa.Table:
        c = t.column("cell").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((c % np.uint64(num_buckets)).astype(np.int32))
        )

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    per_cell = grouped_map(
        q.union(f).map_batches(bucketer_cell, batch_format="pyarrow"),
        "bucket",
        lambda g, k=k: _topk_group(g.drop_columns(["bucket"]), k, dist_round),
        num_partitions=min(num_buckets, 32),
    )

    def bucketer_q(t: pa.Table) -> pa.Table:
        v = t.column("query_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((v % num_buckets).astype(np.int32)))

    def final_merge(g: pa.Table, k=k) -> pa.Table:
        g = g.sort_by(
            [("query_id", "ascending"), ("dist2", "ascending"), ("osm_id", "ascending")]
        )
        qid = g.column("query_id").to_numpy(zero_copy_only=False)
        osm = g.column("osm_id").to_numpy(zero_copy_only=False)
        d2 = g.column("dist2").to_numpy(zero_copy_only=False)
        # dedup same (query, feature) found via several ring cells
        key_change = np.concatenate(
            [[True], (qid[1:] != qid[:-1]) | (osm[1:] != osm[:-1])]
        )
        qid, osm, d2 = qid[key_change], osm[key_change], d2[key_change]
        order = np.lexsort((osm, d2, qid))
        qid, osm, d2 = qid[order], osm[order], d2[order]
        # rank within query (position − start of its group), keep top-k
        newq = np.concatenate([[True], qid[1:] != qid[:-1]]) if len(qid) else np.array([], dtype=bool)
        starts = np.nonzero(newq)[0]
        rank = np.arange(len(qid)) - np.repeat(starts, np.diff(np.append(starts, len(qid))))
        keep = rank < k
        return pa.table(
            {
                "query_id": pa.array(qid[keep]),
                "osm_id": pa.array(osm[keep]),
                "dist2": pa.array(d2[keep]),
                "rank": pa.array(rank[keep].astype(np.int32)),
            }
        )

    return grouped_map(
        per_cell.map_batches(bucketer_q, batch_format="pyarrow"),
        "bucket",
        lambda g: final_merge(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
    )
