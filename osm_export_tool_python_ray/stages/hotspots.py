"""Grid hotspot analytics over point datasets — 3x3 box-kernel density
smoothing and DBSCAN-lite cluster detection on the engine's square cell
grid (functions/cells.py, the H3-res-8-equivalent index the spatial
family J4-J6 already keys on).

Scale shape:

* Both operators NEVER exchange points. A per-batch combiner collapses
  points to (cell, n) partials first, so the one all-to-all moves
  |occupied cells| rows — at planetary res 8 that is bounded by the grid
  (2^30 cells) and in practice orders of magnitude below |points|.
* ``cell_density_smooth``: each cell AGGREGATE is replicated to its 3x3
  neighborhood (x9 on the cell table, not the points) with a self flag,
  and ONE groupby('target') folds both the smoothed sum and the
  occupancy filter — no join-back pass.
* ``grid_clusters``: the core-cell table (n >= min_pts) is the REDUCED
  graph; 4-connectivity union-find labels it (vectorized searchsorted
  edge discovery + path-compressed union), the cell -> label map is
  broadcast once via ``ray.put``, and per-cluster stats aggregate
  distributively. The labeling itself runs on the collected core-cell
  table — the classic small-reduced-graph step (cells, not points); if
  even the core-cell table outgrew a node, the standard escalation is
  row-run reduction (consecutive occupied runs per grid row -> segments,
  union-find over segment adjacency), which this module's packed-key
  layout already supports since row neighbors differ by exactly +1.

Determinism contracts (oracle-exact, pipelines/queries.py): pure int64
grid arithmetic everywhere — cell ids are the packed (res<<58 | ix<<29 |
iy) keys of cells.py, cluster labels are the MINIMUM packed cell id of
the component (the recursive min-label CTE rule the ngram_clusters
oracle established), and counts are exact integers.

No reference analog — engine mandate (geospatial family).
"""

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa
import pyarrow.compute as pc

from osm_export_tool_python_ray.functions.cells import cell_of

_IX = np.int64(1) << np.int64(29)  # +1 in packed ix space

# driver-reduced-graph budget: the cell table is ≪ points by construction,
# but a fine grid over a planetary extent can still outgrow one node —
# above this many cells the labeling / relaxation leaves the driver for
# the distributed path (cap-counted, identical results; the
# dedup_clusters driver_limit pattern).
DRIVER_CELL_LIMIT = 2_000_000


def _adjacency_pairs(cells_ds, num_buckets=32):
    """Unique-'cell' Dataset → 4-adjacency pair Dataset (doc_a < doc_b)
    plus (c, c) self rows so singleton cells keep a label. One bucketed
    semi-join (candidate neighbor keys against the cell set); nothing
    lands on the driver."""
    from osm_export_tool_python_ray.stages.joins import bucket_join

    def cand(t: pa.Table) -> pa.Table:
        c = t.column("cell").to_numpy(zero_copy_only=False)
        # +1 / +IX only: each undirected pair once, src < neighbor
        return pa.table(
            {
                "cell": pa.array(np.concatenate([c + np.int64(1), c + _IX])),
                "src": pa.array(np.concatenate([c, c])),
            }
        )

    right = cells_ds.map_batches(
        lambda t: pa.table(
            {
                "cell": t.column("cell"),
                "hit": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        cells_ds.map_batches(cand, batch_format="pyarrow"),
        right,
        "cell",
        num_buckets=num_buckets,
        how="inner",
        left_schema=pa.schema([("cell", pa.int64()), ("src", pa.int64())]),
        right_schema=pa.schema([("cell", pa.int64()), ("hit", pa.int8())]),
    )
    pairs = joined.map_batches(
        lambda t: pa.table({"doc_a": t.column("src"), "doc_b": t.column("cell")}),
        batch_format="pyarrow",
    )
    selfp = cells_ds.map_batches(
        lambda t: pa.table({"doc_a": t.column("cell"), "doc_b": t.column("cell")}),
        batch_format="pyarrow",
    )
    return pairs.union(selfp)


def _relax_distributed(occ, seeds_cells_ds, max_rounds, hot_threshold=None,
                       num_buckets=32):
    """Distributed multi-source shortest path over the occupied-cell
    Dataset (4-adjacency; entry cost 1, or 3 for congested cells when
    ``hot_threshold`` is set): → Dataset (cell, dist). Per round ONE
    bucketed join ships frontier labels onto directed edges and ONE
    groupby folds the min — label state never visits the driver.
    ``max_rounds`` bounds work; with all costs >= 1 every distance
    <= max_rounds is exact after max_rounds rounds (the driver
    Dijkstra's equality window)."""
    import ray.data
    from ray.data.aggregate import Min
    from osm_export_tool_python_ray.stages.joins import bucket_join

    cell_n = pa.schema([("cell", pa.int64()), ("n", pa.int64())])

    # directed 4-adjacency edges with DESTINATION entry cost
    def cand4(t: pa.Table) -> pa.Table:
        c = t.column("cell").to_numpy(zero_copy_only=False)
        src = np.concatenate([c, c, c, c])
        dst = np.concatenate(
            [c + np.int64(1), c - np.int64(1), c + _IX, c - _IX]
        )
        return pa.table({"cell": pa.array(dst), "src": pa.array(src)})

    def dst_cost(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        cost = (
            np.where(n >= hot_threshold, np.int64(3), np.int64(1))
            if hot_threshold is not None
            else np.ones(t.num_rows, dtype=np.int64)
        )
        return pa.table({"cell": t.column("cell"), "cost": pa.array(cost)})

    edges = bucket_join(
        occ.map_batches(cand4, batch_format="pyarrow"),
        occ.map_batches(dst_cost, batch_format="pyarrow"),
        "cell",
        num_buckets=num_buckets,
        how="inner",
        left_schema=pa.schema([("cell", pa.int64()), ("src", pa.int64())]),
        right_schema=pa.schema([("cell", pa.int64()), ("cost", pa.int64())]),
    ).materialize()  # (cell=dst, src, cost) — reused every round

    # seeds = occupied ∩ seed cells, dist 0
    labels = bucket_join(
        seeds_cells_ds,
        occ.map_batches(
            lambda t: pa.table(
                {
                    "cell": t.column("cell"),
                    "occ": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        ),
        "cell",
        num_buckets=num_buckets,
        how="inner",
        left_schema=pa.schema([("cell", pa.int64())]),
        right_schema=pa.schema([("cell", pa.int64()), ("occ", pa.int8())]),
    ).map_batches(
        lambda t: pa.table(
            {
                "cell": t.column("cell"),
                "dist": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    lbl_schema = pa.schema([("cell", pa.int64()), ("dist", pa.int64())])
    edge_schema = pa.schema(
        [("cell", pa.int64()), ("src", pa.int64()), ("cost", pa.int64())]
    )
    prev_sig = None
    for _round in range(max_rounds):
        # labels keyed by src onto edges → proposals for dst
        props = bucket_join(
            edges.map_batches(
                lambda t: pa.table(
                    {
                        "cell": t.column("src"),
                        "dst": t.column("cell"),
                        "cost": t.column("cost"),
                    }
                ),
                batch_format="pyarrow",
            ),
            labels,
            "cell",
            num_buckets=num_buckets,
            how="inner",
            left_schema=pa.schema(
                [("cell", pa.int64()), ("dst", pa.int64()), ("cost", pa.int64())]
            ),
            right_schema=lbl_schema,
        ).map_batches(
            lambda t: pa.table(
                {
                    "cell": t.column("dst"),
                    "dist": pa.array(
                        t.column("dist").to_numpy(zero_copy_only=False)
                        + t.column("cost").to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(props)
            .groupby("cell")
            .aggregate(Min("dist", alias_name="dist"))
            .materialize()
        )
        # tiny convergence probe: (count, sum) is monotone under min-fold
        from ray.data.aggregate import Count, Sum

        agg = labels.aggregate(Count(alias_name="c"), Sum("dist", alias_name="s"))
        sig = (int(agg["c"]), int(agg["s"] or 0))
        if sig == prev_sig:
            break
        prev_sig = sig

    def cap(t: pa.Table) -> pa.Table:
        d = t.column("dist").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(d <= max_rounds))

    return labels.map_batches(cap, batch_format="pyarrow")


def count_cells_partial(t: pa.Table, res=8) -> pa.Table:
    """Per-batch combiner: (lon, lat) points -> (cell, n_partial) rows."""
    cells = cell_of(
        t.column("lon").to_numpy(zero_copy_only=False),
        t.column("lat").to_numpy(zero_copy_only=False),
        res=res,
    ).astype(np.int64)
    u, c = np.unique(cells, return_counts=True)
    return pa.table({"cell": pa.array(u), "n_partial": pa.array(c.astype(np.int64))})


def cell_density_smooth(points_ds, res=8):
    """3x3 box-kernel density: per OCCUPIED cell, its own point count and
    the summed count of its (<=9)-cell neighborhood. Missing neighbors
    contribute zero; cells with no points of their own are not emitted.

    One exchange total: batch combiner -> x9 neighbor replication of the
    cell PARTIALS (self contribution flagged in-band) -> groupby(target)
    summing (smooth, self) together -> filter self > 0. Grid-boundary
    spill targets (ix/iy under/overflow) can never gain a self
    contribution, so the same filter discards them."""
    from ray.data.aggregate import Sum

    def replicate(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        n = t.column("n_partial").to_numpy(zero_copy_only=False)
        tgt, nn, ns = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tgt.append(cell + np.int64(dx) * _IX + np.int64(dy))
                nn.append(n)
                ns.append(n if (dx == 0 and dy == 0) else np.zeros_like(n))
        return pa.table(
            {
                "target": pa.array(np.concatenate(tgt)),
                "nb": pa.array(np.concatenate(nn)),
                "self": pa.array(np.concatenate(ns)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n"), 0))
        return pa.table(
            {
                "cell": t.column("target"),
                "n": t.column("n"),
                "smooth_n": t.column("smooth_n"),
            }
        )

    return (
        points_ds.map_batches(
            lambda t: count_cells_partial(t, res), batch_format="pyarrow"
        )
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("target")
        .aggregate(Sum("nb", alias_name="smooth_n"), Sum("self", alias_name="n"))
        .map_batches(finish, batch_format="pyarrow")
    )


def cc_labels(cells):
    """4-connectivity connected components over a SORTED int64 array of
    packed cell ids -> int64 label array (label = MIN cell id of the
    component). Edges are found vectorized (searchsorted probes at +1 /
    +2^29); the union-find walk is per-edge with path compression —
    linear-ish in |core cells|, which the combiner already reduced."""
    m = len(cells)
    parent = np.arange(m, dtype=np.int64)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]  # path halving
            a = parent[a]
        return a

    for step in (np.int64(1), _IX):
        nb = cells + step
        j = np.searchsorted(cells, nb)
        ok = (j < m) & (cells[np.minimum(j, m - 1)] == nb)
        for a, b in zip(np.nonzero(ok)[0], j[ok]):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min root index == min cell id (cells sorted)
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        del nb, j, ok
    roots = np.array([find(i) for i in range(m)], dtype=np.int64)
    return cells[roots]


def grid_clusters(points_ds, res=8, min_pts=3,
                  driver_limit=DRIVER_CELL_LIMIT, num_buckets=32):
    """DBSCAN-lite hotspot clusters: cells holding >= min_pts points are
    CORE; 4-connected core cells form a cluster. Returns one row per
    cluster: (cluster_id = min packed core-cell id, n_cells, n_points
    = total points inside the cluster's core cells).

    Point data is touched once (the combiner); the core-cell aggregate
    is materialized once and reused for both the label build and the
    distributed stats fold; the cell -> label map is broadcast via
    ``ray.put`` (never re-shipped per batch).

    Above ``driver_limit`` core cells the labeling never visits the
    driver: 4-adjacency edges come from one bucketed semi-join and
    components from dedup_clusters' distributed min-label propagation
    (identical labels — min packed cell id; cap-counted via
    ``hotspot_cells_over_driver_limit``)."""
    import ray
    from ray.data.aggregate import Count, Sum

    core = (
        points_ds.map_batches(
            lambda t: count_cells_partial(t, res), batch_format="pyarrow"
        )
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n"), min_pts)),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_core = core.count()
    if n_core > driver_limit:
        from osm_export_tool_python_ray.state.metrics import report_cap
        from osm_export_tool_python_ray.stages.dedup import dedup_clusters
        from osm_export_tool_python_ray.stages.joins import bucket_join

        report_cap("hotspot_cells_over_driver_limit", n_core - driver_limit)
        cells_only = core.map_batches(
            lambda t: t.select(["cell"]), batch_format="pyarrow"
        )
        comp = dedup_clusters(
            _adjacency_pairs(cells_only, num_buckets=num_buckets),
            num_buckets=num_buckets,
            driver_limit=driver_limit,
        ).map_batches(
            lambda t: pa.table(
                {"cell": t.column("doc_id"), "cluster_id": t.column("cluster_id")}
            ),
            batch_format="pyarrow",
        )
        withlbl = bucket_join(
            core,
            comp,
            "cell",
            num_buckets=num_buckets,
            how="inner",
            left_schema=pa.schema([("cell", pa.int64()), ("n", pa.int64())]),
            right_schema=pa.schema(
                [("cell", pa.int64()), ("cluster_id", pa.int64())]
            ),
        )
        return withlbl.groupby("cluster_id").aggregate(
            Count(alias_name="n_cells"), Sum("n", alias_name="n_points")
        )
    agg = core.to_pandas()  # |core cells| rows — the reduced graph only
    order = np.argsort(agg["cell"].to_numpy())
    cells = agg["cell"].to_numpy()[order]
    labels_ref = ray.put((cells, cc_labels(cells)))

    def attach(t: pa.Table) -> pa.Table:
        cs, ls = cached_get(labels_ref)
        c = t.column("cell").to_numpy(zero_copy_only=False)
        lab = ls[np.searchsorted(cs, c)]
        return pa.table(
            {"cluster_id": pa.array(lab), "n": t.column("n")}
        )

    return (
        core.map_batches(attach, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Count(alias_name="n_cells"), Sum("n", alias_name="n_points"))
    )


def _seed_cells_ds(seeds_ds, res, num_buckets=32):
    """seeds points → unique seed-cell Dataset (column 'cell') — the
    distributed twin of the driver's np.unique collect."""
    from ray.data.aggregate import Count

    return (
        seeds_ds.map_batches(
            lambda t: count_cells_partial(t, res), batch_format="pyarrow"
        )
        .groupby("cell")
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: t.select(["cell"]), batch_format="pyarrow")
    )


def bfs_distances(cells, seed_mask, max_hops):
    """Multi-source BFS over a SORTED packed-cell array restricted to the
    cells themselves (4-adjacency): int64 hop distance from the nearest
    seed, -1 where unreachable within max_hops. Frontier expansion is
    vectorized (searchsorted probes at the four neighbor offsets)."""
    m = len(cells)
    dist = np.where(seed_mask, np.int64(0), np.int64(-1))
    frontier = np.nonzero(seed_mask)[0]
    for h in range(1, max_hops + 1):
        if not len(frontier):
            break
        nxt = []
        for step in (np.int64(1), np.int64(-1), _IX, -_IX):
            nb = cells[frontier] + step
            j = np.searchsorted(cells, nb)
            ok = (j < m) & (cells[np.minimum(j, m - 1)] == nb)
            nxt.append(j[ok])
        cand = np.unique(np.concatenate(nxt)) if nxt else np.asarray([], dtype=np.int64)
        frontier = cand[dist[cand] == -1]
        dist[frontier] = h
    return dist


def grid_bfs_distance(points_ds, seeds_ds, res=8, max_hops=6,
                      driver_limit=DRIVER_CELL_LIMIT, num_buckets=32):
    """Isochrone-style reachability: hop distance (4-adjacency BFS,
    walkable = cells OCCUPIED by ``points_ds``) from the nearest seed
    cell (cells of ``seeds_ds`` that are themselves occupied) -> one row
    (cell, dist) per occupied cell reachable within ``max_hops``.

    Same reduced-graph shape as ``grid_clusters``: both point sets
    collapse to cell aggregates before anything global; the BFS runs on
    the collected cell table (cells ≪ points); the cell -> dist map is
    broadcast via ``ray.put`` and the output attach folds distributively
    over the occupied-cell aggregate."""
    import ray
    from ray.data.aggregate import Sum

    occ = (
        points_ds.map_batches(
            lambda t: count_cells_partial(t, res), batch_format="pyarrow"
        )
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
        .materialize()
    )
    n_occ = occ.count()
    if n_occ > driver_limit:
        from osm_export_tool_python_ray.state.metrics import report_cap

        report_cap("hotspot_cells_over_driver_limit", n_occ - driver_limit)
        seeds_cells = _seed_cells_ds(seeds_ds, res, num_buckets)
        return _relax_distributed(
            occ, seeds_cells, max_hops, hot_threshold=None,
            num_buckets=num_buckets,
        )
    occ_cells = np.sort(occ.to_pandas()["cell"].to_numpy())
    seed_cells = np.unique(
        np.concatenate(
            [
                b["cell"].to_numpy()
                for b in seeds_ds.map_batches(
                    lambda t: count_cells_partial(t, res), batch_format="pyarrow"
                ).iter_batches(batch_format="pandas")
            ]
            or [np.asarray([], dtype=np.int64)]
        )
    )
    seed_mask = np.isin(occ_cells, seed_cells)
    dist = bfs_distances(occ_cells, seed_mask, max_hops)
    dist_ref = ray.put((occ_cells, dist))

    def attach(t: pa.Table) -> pa.Table:
        cs, ds_ = cached_get(dist_ref)
        c = t.column("cell").to_numpy(zero_copy_only=False)
        d = ds_[np.searchsorted(cs, c)]
        keep = d >= 0
        return pa.table(
            {
                "cell": pa.array(c[keep]),
                "dist": pa.array(d[keep].astype(np.int64)),
            }
        )

    return occ.map_batches(attach, batch_format="pyarrow")


def moran_partials(points_ds, res=8):
    """Spatial-autocorrelation partials (Moran's I over occupied-cell
    counts with rook / 4-neighbor weights): ONE row
    (n_cells, sum_n, sum_n2, n_pairs, pair_prod, deg_n) where the sums
    run over occupied cells c_i and the ordered occupied-neighbor pairs
    (i, j): n_pairs = Σ deg_i, pair_prod = Σ_{(i,j)} c_i·c_j,
    deg_n = Σ c_i·deg_i (deg_i = occupied rook neighbors of i). These
    six int64 partials are exactly what Moran's I needs —
    I = (N/W)·Σ_{(i,j)}(c_i−m)(c_j−m) / Σ(c_i−m)² expands to
    (N/n_pairs)·(pair_prod − 2·m·deg_n/2·... ) in terms of them — while
    staying integer-exact and summation-order independent (the engine's
    rule for float-free oracles; the division happens client-side).

    Scale shape: per-batch point→cell combiner, one groupby fold to
    FINAL cell counts (products need finals, unlike cell_density's
    partial-replication), then the x5 rook replication of the cell
    table with an in-band self flag and one groupby('target') —
    cells move, points never. The final reduction is a single
    fixed-shape row per block folded by a tiny sum."""
    from ray.data.aggregate import Sum

    def replicate(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        zeros = np.zeros_like(n)
        tgt = [cell]
        nb, slf = [zeros], [n]
        for off in (np.int64(1), np.int64(-1), _IX, -_IX):
            tgt.append(cell + off)
            nb.append(n)
            slf.append(zeros)
        return pa.table(
            {
                "target": pa.array(np.concatenate(tgt)),
                "nb": pa.array(np.concatenate(nb)),
                "nb_cnt": pa.array(
                    np.concatenate([np.zeros_like(n)] + [np.ones_like(n)] * 4)
                ),
                "self": pa.array(np.concatenate(slf)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        # occupied targets only (spill targets from packed ±1/±2^29
        # offsets can never gain a self contribution — cell_density's
        # boundary argument)
        t = t.filter(pc.greater(t.column("n"), 0))
        n = t.column("n").to_numpy(zero_copy_only=False)
        nbs = t.column("nbr_sum").to_numpy(zero_copy_only=False)
        deg = t.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "grp": pa.array([np.int64(0)]),
                "n_cells": pa.array([np.int64(len(n))]),
                "sum_n": pa.array([n.sum()]),
                "sum_n2": pa.array([(n * n).sum()]),
                "n_pairs": pa.array([deg.sum()]),
                "pair_prod": pa.array([(n * nbs).sum()]),
                "deg_n": pa.array([(n * deg).sum()]),
            }
        )

    cells = (
        points_ds.map_batches(
            lambda t: count_cells_partial(t, res), batch_format="pyarrow"
        )
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
    )
    per_cell = (
        cells.map_batches(replicate, batch_format="pyarrow")
        .groupby("target")
        .aggregate(
            Sum("nb", alias_name="nbr_sum"),
            Sum("nb_cnt", alias_name="deg"),
            Sum("self", alias_name="n"),
        )
    )
    partial_rows = per_cell.map_batches(fold, batch_format="pyarrow")
    folded = partial_rows.groupby("grp").aggregate(
        Sum("n_cells", alias_name="n_cells"),
        Sum("sum_n", alias_name="sum_n"),
        Sum("sum_n2", alias_name="sum_n2"),
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("pair_prod", alias_name="pair_prod"),
        Sum("deg_n", alias_name="deg_n"),
    )
    return folded.map_batches(
        lambda t: t.drop_columns(["grp"]), batch_format="pyarrow"
    )


def dijkstra_distances(cells, counts, seed_mask, max_cost, hot_threshold):
    """Weighted multi-source shortest path over a SORTED packed-cell
    array (4-adjacency): entering a cell costs 1, or 3 when the cell is
    congested (count >= hot_threshold). Label-correcting relaxation —
    each pass relaxes EVERY present edge via searchsorted probes and a
    ``minimum.at`` scatter; positive costs bound passes by the longest
    shortest path, and the cell table is the reduced graph, so the loop
    is driver-cheap. Returns int64 costs, -1 above ``max_cost`` /
    unreachable."""
    m = len(cells)
    cost = np.where(counts >= hot_threshold, np.int64(3), np.int64(1))
    INF = np.int64(1) << np.int64(62)
    dist = np.where(seed_mask, np.int64(0), INF)
    if not m:
        return np.where(seed_mask, 0, -1).astype(np.int64)
    changed = True
    while changed:
        changed = False
        for step in (np.int64(1), np.int64(-1), _IX, -_IX):
            nb = cells + step
            j = np.searchsorted(cells, nb)
            ok = (j < m) & (cells[np.minimum(j, m - 1)] == nb)
            src = np.nonzero(ok)[0]
            dst = j[ok]
            nd = dist[src] + cost[dst]
            better = nd < dist[dst]
            if better.any():
                np.minimum.at(dist, dst[better], nd[better])
                changed = True
    out = np.where(dist <= max_cost, dist, np.int64(-1))
    return out


def grid_weighted_distance(
    points_ds, seeds_ds, res=8, max_cost=8, hot_threshold=2,
    driver_limit=DRIVER_CELL_LIMIT, num_buckets=32,
):
    """Congestion-aware isochrone: cheapest entry-cost path (1 per cell,
    3 per congested cell) from the nearest seed over occupied cells —
    (cell, dist) per cell reachable within ``max_cost``. Same reduced
    cell-table shape as grid_bfs_distance; only the relaxation differs
    (weighted label-correcting instead of hop BFS)."""
    import ray
    from ray.data.aggregate import Sum

    occ = (
        points_ds.map_batches(
            lambda t: count_cells_partial(t, res), batch_format="pyarrow"
        )
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
        .materialize()
    )
    n_occ = occ.count()
    if n_occ > driver_limit:
        from osm_export_tool_python_ray.state.metrics import report_cap

        report_cap("hotspot_cells_over_driver_limit", n_occ - driver_limit)
        seeds_cells = _seed_cells_ds(seeds_ds, res, num_buckets)
        return _relax_distributed(
            occ, seeds_cells, max_cost, hot_threshold=hot_threshold,
            num_buckets=num_buckets,
        )
    df = occ.to_pandas()
    order = np.argsort(df["cell"].to_numpy())
    occ_cells = df["cell"].to_numpy()[order]
    occ_n = df["n"].to_numpy()[order].astype(np.int64)
    seed_cells = np.unique(
        np.concatenate(
            [
                b["cell"].to_numpy()
                for b in seeds_ds.map_batches(
                    lambda t: count_cells_partial(t, res), batch_format="pyarrow"
                ).iter_batches(batch_format="pandas")
            ]
            or [np.asarray([], dtype=np.int64)]
        )
    )
    seed_mask = np.isin(occ_cells, seed_cells)
    dist = dijkstra_distances(occ_cells, occ_n, seed_mask, max_cost, hot_threshold)
    dist_ref = ray.put((occ_cells, dist))

    def attach(t: pa.Table) -> pa.Table:
        cs, ds_ = cached_get(dist_ref)
        c = t.column("cell").to_numpy(zero_copy_only=False)
        d = ds_[np.searchsorted(cs, c)]
        keep = d >= 0
        return pa.table(
            {
                "cell": pa.array(c[keep]),
                "dist": pa.array(d[keep].astype(np.int64)),
            }
        )

    return occ.map_batches(attach, batch_format="pyarrow")
