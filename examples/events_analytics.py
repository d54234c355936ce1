"""Composed behavioural-analytics pipeline example: the engine's
event-stream operators chained the way a product-analytics run would
chain them —

    inter-event gap histogram (choose the session gap from data) →
    co-location encounter graph → PageRank centrality →
    central-user cohort → event-type crosstab for that cohort vs all

Every stage is a streaming Ray Data transform. The two cross-stage
dependencies move the RIGHT way for scale:

  * the session-gap choice is a ~100-row (type, bin) aggregate read on
    the driver (an aggregate, not data);
  * the central-user set flows into the crosstab comparison as a
    ``ray.put`` broadcast of user ids (users, not events) probed inside
    one vectorized ``map_batches`` — never a shuffle join against the
    event stream.

The component operators are each oracle-checked as driver queries
(pipelines/queries.py: gap_histogram, encounters → user_pagerank,
hour_pivot).

Run from the repo root:

    python examples/events_analytics.py [sf_dir]

(defaults to /root/testdata/sf0.001)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray

from osm_export_tool_python_ray.pipelines.queries import QUERIES, _read
from osm_export_tool_python_ray.stages.graph import pagerank_scores
from osm_export_tool_python_ray.stages.journey import encounters
from osm_export_tool_python_ray.state.broadcast import cached_get


def main(sf_dir):
    # 1. cadence profile: pick a session gap at the knee of the log2
    #    inter-event gap histogram (smallest bin whose cumulative mass
    #    covers 90% of gaps) — a ~100-row aggregate, driver-safe
    hist = QUERIES["gap_histogram"](sf_dir).to_pandas()
    total = hist["n"].sum()
    bybin = hist.groupby("bin")["n"].sum().sort_index()
    cum = bybin.cumsum() / max(int(total), 1)
    knee_bin = int(cum[cum >= 0.9].index[0])
    gap_us = 1 << (knee_bin + 1)
    print("gap histogram: %d (type,bin) rows, knee bin %d -> session gap %.1f s"
          % (len(hist), knee_bin, gap_us / 1e6))

    # 2. encounter graph + integer-exact PageRank (3 iterations)
    pairs = encounters(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]), cell_div=10
    )
    pr = pagerank_scores(pairs, iters=3).to_pandas()
    cut = pr["score"].quantile(0.8)
    central = pr[pr["score"] >= cut]["node"].to_numpy(dtype=np.int64)
    print("pagerank: %d nodes, top-quintile cohort %d users (score >= %d)"
          % (len(pr), len(central), int(cut)))

    # 3. crosstab for the central cohort vs everyone: one vectorized
    #    probe against the broadcast cohort (users, not events)
    cref = ray.put(np.sort(central))

    def cohort_filter(t: pa.Table) -> pa.Table:
        users = cached_get(cref)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(users, u)
        hit = (pos < len(users)) & (users[np.minimum(pos, len(users) - 1)] == u)
        return t.filter(pa.array(hit))

    from osm_export_tool_python_ray.pipelines.queries import hour_pivot_over

    all_pivot = QUERIES["hour_pivot"](sf_dir).to_pandas().set_index("event_type")
    cohort_events = _read(sf_dir, "events", ["ts", "event_type", "user_id"]).map_batches(
        cohort_filter, batch_format="pyarrow"
    )
    coh_pivot = hour_pivot_over(cohort_events).to_pandas().set_index("event_type")
    for et in all_pivot.index:
        row = all_pivot.loc[et]
        peak = int(np.argmax([row["h%d" % h] for h in range(24)]))
        coh_total = int(coh_pivot.loc[et]["total"]) if et in coh_pivot.index else 0
        print(
            "type %-12s total %-6d cohort %-6d peak hour %02d:00"
            % (et, row["total"], coh_total, peak)
        )


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    ray.shutdown()
