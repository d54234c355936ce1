"""Stage checkpointing: atomic staged writes, _SUCCESS markers, manifests.

The reference's only resume mechanism is whole-file reuse
(``use_existing``, reference sources.py:63-67,171-177,330-335); its sinks
hold one open transaction for the whole run (reference tabular.py:169,194).
Here every pipeline stage lands as a partitioned Parquet directory written
to a staging path and atomically renamed, with a ``_SUCCESS`` marker and a
JSON manifest (rows, bytes, wall time, input lineage). A re-run skips any
stage whose marker exists — resumability at stage granularity, and the
Dataset branch points read the checkpoint instead of re-executing upstream
(Ray Datasets are linear; consuming one twice re-runs its lineage).
"""

import json
import os
import shutil
import time

_SUCCESS = "_SUCCESS"
_MANIFEST = "_MANIFEST.json"


def is_complete(path):
    return os.path.exists(os.path.join(path, _SUCCESS))


def manifest(path):
    p = os.path.join(path, _MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _dir_stats(path):
    rows = None
    size = 0
    for root, _d, files in os.walk(path):
        for fn in files:
            if not fn.startswith("_"):
                size += os.path.getsize(os.path.join(root, fn))
    return rows, size


def checkpoint(ds, path, lineage=None, partition_cols=None):
    """Execute ``ds`` into a parquet checkpoint (atomic) and return a fresh
    Dataset reading it. If the checkpoint is already complete, skip
    execution entirely and read it (resume-by-skip)."""
    import ray.data

    if is_complete(path):
        return ray.data.read_parquet(path)

    staging = path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging, exist_ok=True)
    t0 = time.perf_counter()
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = list(partition_cols)
    ds.write_parquet(staging, **kwargs)
    wall = time.perf_counter() - t0

    _rows, size = _dir_stats(staging)
    try:
        import pyarrow.dataset as pads

        rows = pads.dataset(staging, format="parquet").count_rows()
    except Exception:
        rows = None
    with open(os.path.join(staging, _MANIFEST), "w") as f:
        json.dump(
            {
                "lineage": lineage or {},
                "rows": rows,
                "bytes": size,
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(rows / wall, 1) if rows and wall > 0 else None,
                "partition_cols": partition_cols or [],
            },
            f,
        )
    open(os.path.join(staging, _SUCCESS), "w").close()
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(staging, path)
    return ray.data.read_parquet(path)


def materialize_or_checkpoint(ds, workdir, name, lineage=None):
    """Branch point: with a workdir → durable checkpoint; without →
    in-memory materialize (small/test runs only)."""
    if workdir:
        return checkpoint(ds, os.path.join(workdir, name), lineage=lineage)
    return ds.materialize()
