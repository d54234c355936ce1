"""Per-partition resumable export (BASELINE.json north_rule: "resumable
from per-partition checkpoints with lineage + metrics").

The stage-level checkpoints (state/checkpoint.py) resume at stage
granularity; this driver adds PARTITION granularity: the input corpus
fragments are split into K partitions, each partition runs the full export
independently into ``workdir/part=<i>/`` with its own ``_SUCCESS`` +
manifest (input fragments, rows, bytes, wall). A killed run re-executes
only the unfinished partitions.

Partitioning assumption (documented per SURVEY.md): a partition must be
closed under the geometry joins — every node a way references and every
member way of a relation lives in the same partition. The deterministic
corpus guarantees this (shards are self-contained mini-worlds and
cross-doc duplicates stay within a shard); general OSM inputs need a
locality-aware fragment layout (or the single-partition / staged global
pipeline, which makes no such assumption).
"""

import glob
import json
import os

from osm_export_tool_python_ray.state.checkpoint import checkpoint, is_complete, manifest


def partition_fragments(corpus_path, num_partitions):
    """Deterministic assignment of parquet fragments → partitions."""
    if os.path.isdir(corpus_path):
        frags = sorted(glob.glob(os.path.join(corpus_path, "*.parquet")))
    else:
        frags = [corpus_path]
    parts = [[] for _ in range(min(num_partitions, len(frags)))]
    for i, f in enumerate(frags):
        parts[i % len(parts)].append(f)
    return [p for p in parts if p]


def run_export_partitioned(
    corpus_path,
    mapping,
    workdir,
    num_partitions=8,
    aoi_polygons=None,
    polygon_centroid=False,
    num_buckets=16,
    on_partition_done=None,
):
    """Run the export per input partition with skip-completed resume.
    Returns (list of partition feature dirs, metrics dict)."""
    import ray.data

    from osm_export_tool_python_ray.pipelines.export import run_export

    parts = partition_fragments(corpus_path, num_partitions)
    os.makedirs(workdir, exist_ok=True)
    done_dirs = []
    metrics = {"partitions": [], "skipped": 0, "executed": 0}
    for i, frags in enumerate(parts):
        pdir = os.path.join(workdir, "part=%d" % i)
        fdir = os.path.join(pdir, "features")
        if is_complete(fdir):
            metrics["skipped"] += 1
            done_dirs.append(fdir)
            m = manifest(fdir) or {}
            metrics["partitions"].append({"part": i, "resumed": True, **m})
            continue
        docs = ray.data.read_parquet(frags)
        run_export(
            docs,
            mapping,
            aoi_polygons=aoi_polygons,
            polygon_centroid=polygon_centroid,
            workdir=pdir,
            num_partitions=4,
            num_buckets=num_buckets,
        )
        metrics["executed"] += 1
        done_dirs.append(fdir)
        m = manifest(fdir) or {}
        m["lineage"] = {"input_fragments": [os.path.basename(f) for f in frags]}
        with open(os.path.join(fdir, "_MANIFEST.json"), "w") as f:
            json.dump(m, f)
        metrics["partitions"].append({"part": i, "resumed": False, **m})
        if on_partition_done is not None:
            on_partition_done(i)
    with open(os.path.join(workdir, "_RUN_METRICS.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return done_dirs, metrics
