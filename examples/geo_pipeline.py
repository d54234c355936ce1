"""Composed mobility-analytics pipeline example: the engine's
geospatial/journey operators chained the way a movement-analysis run
would chain them —

    point hotspots (DBSCAN-lite grid clustering) →
    per-user OD matrix → destination ∈ hotspot classification →
    trajectory compression (Douglas–Peucker keep ratio) →
    movement-direction mix (octants)

Every stage is a streaming Ray Data transform; the one cross-stage
dependency (cluster cell set → OD destination classification) moves as
a ``ray.put`` BROADCAST of the core-cell table — cells, not points —
into a vectorized ``map_batches`` probe, never a shuffle join. The only
driver-side values are the printed aggregates. The component operators
are each oracle-checked as driver queries (pipelines/queries.py:
grid_clusters, od_matrix, trajectory_simplify, move_octants).

Run from the repo root:

    python examples/geo_pipeline.py [sf_dir]

(defaults to /root/testdata/sf0.001)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray

from osm_export_tool_python_ray.functions.cells import cell_of
from osm_export_tool_python_ray.pipelines.queries import (
    GRID_CLUSTER_MIN_PTS,
    QUERIES,
    _customer_points,
    _read,
)
from osm_export_tool_python_ray.stages.hotspots import count_cells_partial


def main(sf_dir):
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)

    # stage 1: hotspot clusters over the customer point layer. The
    # cluster op reduces points to core cells before any exchange; we
    # also keep the core-cell SET itself (the same reduced table) for
    # the stage-2 broadcast.
    clusters = QUERIES["grid_clusters"](sf_dir).materialize()
    n_clusters = clusters.count()
    stats = clusters.to_pandas()
    print(
        "hotspots: %d clusters over %d core cells holding %d points"
        % (n_clusters, int(stats["n_cells"].sum()), int(stats["n_points"].sum()))
    )

    core_cells = np.sort(
        (
            _read(sf_dir, "customer", ["c_custkey"])
            .map_batches(_customer_points, batch_format="pyarrow")
            .map_batches(count_cells_partial, batch_format="pyarrow")
            .groupby("cell")
            .sum("n_partial")
            .map_batches(
                lambda t: t.filter(
                    pa.compute.greater_equal(
                        t.column("sum(n_partial)"), GRID_CLUSTER_MIN_PTS
                    )
                ).select(["cell"]),
                batch_format="pyarrow",
            )
            .to_pandas()["cell"]
            .to_numpy()
        )
    )
    cells_ref = ray.put(core_cells)  # broadcast once — cells, not points

    # stage 2: OD matrix, then classify each flow's DESTINATION against
    # the broadcast hotspot cells — a vectorized searchsorted probe
    # inside map_batches, no join.
    od = QUERIES["od_matrix"](sf_dir)

    def flag_dest(t: pa.Table) -> pa.Table:
        cs = ray.get(cells_ref)
        lon = t.column("dx").to_numpy(zero_copy_only=False) * 0.01
        lat = t.column("dy").to_numpy(zero_copy_only=False) * 0.01
        cell = cell_of(lon, lat, res=8).astype(np.int64)
        j = np.searchsorted(cs, cell)
        hit = (j < len(cs)) & (cs[np.minimum(j, max(len(cs) - 1, 0))] == cell)
        return pa.table(
            {
                "n_users": t.column("n_users"),
                "in_hotspot": pa.array(hit),
            }
        )

    flows = od.map_batches(flag_dest, batch_format="pyarrow").to_pandas()
    tot = int(flows["n_users"].sum())
    hot = int(flows.loc[flows["in_hotspot"], "n_users"].sum())
    print("OD flows: %d users, %d end inside a hotspot cell" % (tot, hot))

    # stage 3: trajectory compression — kept Douglas-Peucker vertices vs
    # raw events (two distributed counts on streaming lineages)
    kept = QUERIES["trajectory_simplify"](sf_dir).count()
    raw = _read(sf_dir, "events", ["event_id"]).count()
    print(
        "Douglas-Peucker keep ratio: %d / %d vertices (%.1f%%)"
        % (kept, raw, 100.0 * kept / max(raw, 1))
    )

    # stage 4: movement-direction mix
    oct_rows = QUERIES["move_octants"](sf_dir).take_all()
    names = ["E", "NE", "N", "NW", "W", "SW", "S", "SE", "stationary"]
    mix = ", ".join(
        "%s=%d" % (names[r["octant"]], r["n"])
        for r in sorted(oct_rows, key=lambda r: r["octant"])
    )
    print("movement mix:", mix)

    # stage 5: co-presence × physical interaction — users whose sessions
    # overlap in time AND whose cleaned trajectories properly cross in
    # space (the interval×interval and segment×segment joins). Both
    # operate on tiny derived tables (session rows / crossing pairs);
    # the intersection here is a pandas merge of two small results.
    co = QUERIES["session_overlap"](sf_dir).to_pandas()
    xs = QUERIES["segment_crossings"](sf_dir).to_pandas()
    both = co.merge(xs, on=["user_a", "user_b"])
    print(
        "co-presence: %d user pairs overlap in time, %d cross in space,"
        " %d do both" % (len(co), len(xs), len(both))
    )

    # stage 6: burst + dwell report — when was activity anomalous
    # (per-type CUSUM) and who actually dwelt inside the AOI
    bursts = QUERIES["cusum_bursts"](sf_dir).to_pandas()
    alarmed = bursts[bursts["n_alarms"] > 0]
    dwell = QUERIES["geofence_dwell"](sf_dir).to_pandas()
    print(
        "bursts: %d/%d event types alarmed; AOI dwell: %d users,"
        " %.1f h total"
        % (
            len(alarmed),
            len(bursts),
            len(dwell),
            dwell["dwell_us"].sum() / 3.6e9,
        )
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    ray.shutdown()
