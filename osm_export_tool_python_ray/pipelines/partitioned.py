"""Per-partition resumable export (BASELINE.json north_rule: "resumable
from per-partition checkpoints with lineage + metrics").

The stage-level checkpoints (state/checkpoint.py) resume at stage
granularity; this driver adds PARTITION granularity: the input corpus
fragments are split into K partitions, each partition runs the full export
independently into ``workdir/part=<i>/`` with its own ``_SUCCESS`` +
manifest (input fragments, rows, bytes, wall). A killed run re-executes
only the unfinished partitions.

Partitioning assumption and the RESIDUAL pass: per-partition assembly is
correct when a partition is closed under the geometry joins — every node
a way references and every member way of a relation lives in the same
partition (the deterministic corpus guarantees this). For general inputs
whose fragment layout breaks reference closure, ``residual='auto'``
(default) runs one extra RECOVERY pass after the per-partition loop:

1. detect, per partition, the ways assembled incomplete
   (``way_geoms.complete == false``) and the area-relations with a member
   way that is not complete in that partition — exactly the features the
   partition dropped;
2. re-assemble ONLY those across the union of the partitions' element
   checkpoints (no corpus re-parse): needed way/node/relation ids are
   broadcast sets, so the recovery touches a filtered sliver of the data
   — its cost scales with the number of boundary-crossing references,
   not the corpus;
3. write them to ``workdir/part=residual/`` with the same _SUCCESS +
   manifest resume contract.

Remaining assumption (documented): cross-doc DUPLICATE elements must
still be partition-local — a complete element duplicated across two
partitions would emit its feature twice (deduplicating that without a
global exchange is exactly the problem partitioning avoids; use the
global pipeline when duplicates are unconstrained).
"""

import glob
import json
import os

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get

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


def _sorted_member(sorted_ids, values):
    """Vectorized membership of ``values`` in the SORTED int64 ``sorted_ids``."""
    if len(sorted_ids) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_ids, values)
    return (pos < len(sorted_ids)) & (
        sorted_ids[np.minimum(pos, len(sorted_ids) - 1)] == values
    )


def detect_residual(workdir, num_parts):
    """Per-partition scan of the ``way_geoms`` / ``elements`` checkpoints
    → (residual_way_ids, residual_rel_ids, member_way_ids): the ways each
    partition assembled incomplete and the area-relations it could not
    assemble there — but ONLY those actually recoverable cross-partition.
    A way whose missing node (or a relation whose missing member way)
    exists in NO partition is incomplete *globally*: the reference drops
    it, the per-partition run already dropped it, and flagging it would
    make every run on a ref-broken corpus pay a pointless recovery pass.
    The detector therefore probes the candidate's missing references
    against the OTHER partitions' element-id sets and keeps only hits.

    Driver-side pyarrow over id/flag columns only (the checkpoints are
    already partition-sized; at extreme scale this two-phase probe —
    small candidate sets vs per-partition pruned id columns — becomes a
    map_batches + small collect, the same broadcast-membership pattern
    as ``_isin_filter``)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from osm_export_tool_python_ray.pipelines.export import _area_relation_filter

    # Phase 1: per partition, gather (a) incomplete-way candidates with
    # their node refs, (b) area relations with members missing-or-
    # incomplete at home, (c) the partition's node / way element-id sets.
    cand_ways = []  # (part, way_id, refs array)
    cand_rels = []  # (part, rel_id, missing member ids, all member ids)
    node_ids, way_elem_ids = {}, {}
    for i in range(num_parts):
        pdir = os.path.join(workdir, "part=%d" % i)
        wg = glob.glob(os.path.join(pdir, "way_geoms", "*.parquet"))
        el = glob.glob(os.path.join(pdir, "elements", "*.parquet"))
        if not el:
            continue
        # no way_geoms files just means the partition assembled ZERO ways
        # (node-only / relation-only input — Ray's parquet sink writes no
        # files for an all-empty dataset). Its element ids must still be
        # registered, or cross-partition refs INTO it look globally missing.
        if wg:
            wt = pq.read_table(wg, columns=["way_id", "complete"])
            wid = wt.column("way_id").to_numpy(zero_copy_only=False)
            comp = wt.column("complete").to_numpy(zero_copy_only=False)
        else:
            wid = np.array([], dtype=np.int64)
            comp = np.array([], dtype=bool)
        inc = np.sort(wid[~comp])
        complete_ids = np.sort(wid[comp])

        ids_kinds = pq.read_table(el, columns=["kind", "element_id"])
        kind = ids_kinds.column("kind").to_numpy(zero_copy_only=False)
        eid = ids_kinds.column("element_id").to_numpy(zero_copy_only=False)
        node_ids[i] = np.sort(eid[kind == "node"])
        way_elem_ids[i] = np.sort(eid[kind == "way"])

        if len(inc):
            et = pq.read_table(
                el,
                columns=["kind", "element_id", "refs"],
                filters=[("kind", "=", "way")],
            )
            et = et.filter(pc.is_in(et.column("element_id"), pa.array(inc)))
            for w, refs in zip(
                et.column("element_id").to_pylist(), et.column("refs").to_pylist()
            ):
                cand_ways.append((i, int(w), np.asarray(refs or [], dtype=np.int64)))

        rt = _area_relation_filter(
            # row-group predicate: only relation rows' tags/members reach
            # the driver, not the whole partition's payload columns
            pq.read_table(
                el,
                columns=["kind", "element_id", "tags", "members", "doc_id", "offset"],
                filters=[("kind", "=", "relation")],
            )
        )
        inc_set = set(inc.tolist())
        for rid, members in zip(
            rt.column("element_id").to_pylist(), rt.column("members").to_pylist()
        ):
            mw = np.array(
                [m["ref"] for m in (members or []) if m["type"] == "way"],
                dtype=np.int64,
            )
            if len(mw) == 0:
                continue
            missing = mw[~_sorted_member(complete_ids, mw)]
            if len(missing):
                cand_rels.append((i, int(rid), missing, mw, inc_set))

    # Phase 2: keep candidates whose missing references exist elsewhere.
    def present_elsewhere(part, ids, table):
        hit = np.zeros(len(ids), dtype=bool)
        for q, sorted_ids in table.items():
            if q != part:
                hit |= _sorted_member(sorted_ids, ids)
        return hit

    res_ways = sorted(
        w
        for part, w, refs in cand_ways
        if present_elsewhere(part, refs[~_sorted_member(node_ids[part], refs)], node_ids).any()
    )
    res_way_set = set(res_ways)
    res_rels, member_ids = [], []
    for part, rid, missing, mw, home_inc in cand_rels:
        recoverable = present_elsewhere(part, missing, way_elem_ids).any() or any(
            int(m) in res_way_set and int(m) in home_inc for m in missing
        )
        if recoverable:
            res_rels.append(rid)
            member_ids.append(mw)
    rw = np.array(res_ways, dtype=np.int64)
    mi = np.unique(np.concatenate(member_ids)) if member_ids else np.array([], dtype=np.int64)
    return rw, np.unique(np.array(res_rels, dtype=np.int64)), mi


def _isin_filter(column, ids_ref):
    """map_batches filter: keep rows whose ``column`` is in the broadcast
    sorted id array (searchsorted membership — the broadcast-small-side
    pattern; no shuffle on the big side)."""
    import pyarrow as pa
    import ray

    def fn(t):
        ids = cached_get(ids_ref)
        v = t.column(column).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_sorted_member(ids, v)))

    return fn


def run_residual(
    workdir,
    num_parts,
    mapping,
    aoi_polygons=None,
    polygon_centroid=False,
    num_buckets=16,
):
    """Recovery pass for reference-closure breaks: re-assemble the
    detected residual ways/relations over the union of the partitions'
    element checkpoints, write ``part=residual/features``. Returns the
    residual metrics dict (zero-work fast path when nothing is
    residual)."""
    import ray
    import ray.data

    from osm_export_tool_python_ray.pipelines.export import (
        _area_relation_filter,
        _kind_filter,
    )
    from osm_export_tool_python_ray.stages.assemble import (
        assemble_relations,
        assemble_ways,
    )
    from osm_export_tool_python_ray.stages.exchange import union_all
    from osm_export_tool_python_ray.stages.explode import dedup_elements
    from osm_export_tool_python_ray.stages.features import (
        RelationAreaFeatures,
        ThemeRouter,
        WayFeatures,
    )

    rdir = os.path.join(workdir, "part=residual")
    fdir = os.path.join(rdir, "features")
    if is_complete(fdir):
        return {"part": "residual", "resumed": True, **(manifest(fdir) or {})}
    # zero-residual runs leave a marker so resumes skip the detection scan
    # (the per-partition _SUCCESS contract, extended to "nothing to do")
    none_marker = os.path.join(rdir, "_RESIDUAL_NONE.json")
    if os.path.exists(none_marker):
        with open(none_marker) as f:
            return {"part": "residual", "resumed": True, **json.load(f)}
    res_ways, res_rels, member_ids = detect_residual(workdir, num_parts)
    stats = {
        "part": "residual",
        "resumed": False,
        "residual_ways": int(len(res_ways)),
        "residual_relations": int(len(res_rels)),
    }
    if len(res_ways) == 0 and len(res_rels) == 0:
        os.makedirs(rdir, exist_ok=True)
        with open(none_marker, "w") as f:
            json.dump({k: v for k, v in stats.items() if k != "resumed"}, f)
        return stats

    el_frags = [
        f
        for i in range(num_parts)
        for f in glob.glob(os.path.join(workdir, "part=%d" % i, "elements", "*.parquet"))
    ]

    # Each kind is read with column pruning and map-side filtered to the
    # broadcast residual-id sets BEFORE any exchange, so only the sliver of
    # boundary-crossing rows enters a shuffle. Cross-partition dedup runs
    # on that sliver: winners of the partitions' winners are the global
    # (doc_id, offset)-minimal winners (filtering by element_id keeps every
    # duplicate of a kept id), so residual assembly sees exactly the rows
    # the global pipeline would.
    def _sliver(kind, columns, ids_ref, buckets):
        ds = ray.data.read_parquet(
            el_frags, columns=["ekey", "kind", "doc_id", "offset"] + columns
        )
        ds = ds.map_batches(_kind_filter(kind), batch_format="pyarrow").map_batches(
            _isin_filter("element_id", ids_ref), batch_format="pyarrow"
        )
        return dedup_elements(ds, num_buckets=buckets)

    def _project(columns):
        def fn(t):
            return t.select(columns)

        return fn

    sliver_buckets = max(4, num_buckets // 4)
    need_ways_ref = ray.put(np.unique(np.concatenate([res_ways, member_ids])))
    # materialize: consumed by _ref_ids AND assemble_ways — Ray datasets
    # are linear, an unmaterialized branch re-runs the sliver read+dedup
    ways = (
        _sliver("way", ["element_id", "refs", "tags"], need_ways_ref, sliver_buckets)
        .map_batches(
            _project(["element_id", "refs", "tags", "doc_id", "offset"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # node ids needed by the kept ways: small driver collect → broadcast
    def _ref_ids(t):
        import pyarrow as pa

        nid = (
            np.unique(np.concatenate(t.column("refs").to_pylist()))
            if t.num_rows
            else np.array([], dtype=np.int64)
        )
        return pa.table({"nid": pa.array(nid, type=pa.int64())})

    ref_rows = ways.map_batches(_ref_ids, batch_format="pyarrow").take_all()
    need_nodes = np.unique(np.fromiter((r["nid"] for r in ref_rows), dtype=np.int64))
    need_nodes_ref = ray.put(need_nodes)
    nodes_loc = _sliver(
        "node", ["element_id", "lon", "lat"], need_nodes_ref, sliver_buckets
    ).map_batches(_project(["element_id", "lon", "lat"]), batch_format="pyarrow")

    # materialized for the same reason: feeds way_feats AND assemble_relations
    way_geoms = assemble_ways(
        ways, nodes_loc, num_partitions=4, num_buckets=num_buckets
    ).materialize()
    res_ways_ref = ray.put(np.sort(res_ways))
    way_feats = way_geoms.map_batches(
        _isin_filter("way_id", res_ways_ref), batch_format="pyarrow"
    ).map_batches(
        WayFeatures(mapping, aoi_polygons, polygon_centroid), batch_format="pyarrow"
    )

    res_rels_ref = ray.put(np.sort(res_rels))
    rels = _sliver(
        "relation", ["element_id", "tags", "members"], res_rels_ref, sliver_buckets
    ).map_batches(_area_relation_filter, batch_format="pyarrow")
    rel_geoms = assemble_relations(
        rels, way_geoms, num_partitions=4, num_buckets=max(4, num_buckets // 4)
    )
    rel_feats = rel_geoms.map_batches(
        RelationAreaFeatures(mapping, aoi_polygons, polygon_centroid),
        batch_format="pyarrow",
    )
    themed = union_all(way_feats, rel_feats).map_batches(
        ThemeRouter(mapping), batch_format="pyarrow"
    )
    checkpoint(themed, fdir, partition_cols=["theme"])
    stats.update(manifest(fdir) or {})
    return stats


def run_export_partitioned(
    corpus_path,
    mapping,
    workdir,
    num_partitions=8,
    aoi_polygons=None,
    polygon_centroid=False,
    num_buckets=16,
    on_partition_done=None,
    residual="auto",
):
    """Run the export per input partition with skip-completed resume.
    Returns (list of partition feature dirs, metrics dict).

    ``residual='auto'`` (default) appends the recovery pass for
    reference-closure breaks (see module docstring); ``residual=False``
    restores the strict closed-partition contract (boundary-crossing
    ways/relations silently dropped, as the reference drops incomplete
    ways)."""
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
    if residual:
        rstats = run_residual(
            workdir,
            len(parts),
            mapping,
            aoi_polygons=aoi_polygons,
            polygon_centroid=polygon_centroid,
            num_buckets=num_buckets,
        )
        metrics["residual"] = rstats
        rfdir = os.path.join(workdir, "part=residual", "features")
        # a residual checkpoint with zero rows (e.g. detected ways whose
        # nodes are missing GLOBALLY — the reference drops those too)
        # contributes nothing: keep the output dir list stable
        if is_complete(rfdir) and (rstats.get("rows") or 0) > 0:
            done_dirs.append(rfdir)
    with open(os.path.join(workdir, "_RUN_METRICS.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return done_dirs, metrics
