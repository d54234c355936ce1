"""Geometry assembly: the explicit shuffles that pyosmium hides.

J1 (way → node locations, reference cmd.py:58 ``locations=True``): explode
way refs → hash join on node_id → bucketed groupby → vectorized per-bucket
coordinate-list rebuild. Ways with any unresolved ref are kept with
``complete=false`` and dropped downstream with a counter — parity with the
"Incomplete way: {id}" print-and-drop (reference tabular.py:305-306).

J2/J3 (relation → member ways → ring stitching, libosmium's area
assembler): explode members → hash join on way_id → bucketed groupby →
per-relation endpoint-matching ring stitcher with orientation + hole
nesting. Relations whose rings cannot close are dropped with a counter —
parity with "Invalid area: {id}" (reference tabular.py:338-339).

Buckets (``way_id % B`` / ``relation_id % B``) keep ``map_groups`` calls
coarse: each call receives thousands of entities and rebuilds them with
NumPy reduceat/ListArray ops instead of per-entity Python. B is the shuffle
fan-out knob — raise it with cluster size.
"""

import os

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa
import pyarrow.compute as pc

from osm_export_tool_python_ray.functions.kernels import ensure_closed, orient, signed_area


WAY_GEOM_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()),
        ("lons", pa.list_(pa.float64())),
        ("lats", pa.list_(pa.float64())),
        ("n_pts", pa.int32()),
        ("complete", pa.bool_()),
        ("is_closed", pa.bool_()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
    ]
)

REL_GEOM_SCHEMA = pa.schema(
    [
        ("relation_id", pa.int64()),
        ("wkb", pa.binary()),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
        ("valid", pa.bool_()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
    ]
)


def explode_way_refs(batch: pa.Table) -> pa.Table:
    """ways batch → (way_id, seq, node_id [, payload]) rows, fully
    vectorized. Payload columns (tags, doc_id, offset) ride ONLY the
    seq==0 row of each way (null elsewhere) so they survive the assembly
    shuffles without being re-joined afterwards — one less all-to-all over
    the assembled-geometry table."""
    refs = batch.column("refs")
    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    parent = pc.list_parent_indices(refs)
    node_id = pc.list_flatten(refs)
    way_id = pc.take(batch.column("element_id"), parent)
    counts = pc.list_value_length(refs).fill_null(0).to_numpy(zero_copy_only=False)
    seq = (
        np.concatenate([np.arange(c, dtype=np.int32) for c in counts])
        if len(counts)
        else np.array([], dtype=np.int32)
    )
    cols = {"way_id": way_id, "seq": pa.array(seq), "node_id": node_id}
    payload_names = [n for n in ("tags", "doc_id", "offset") if n in batch.schema.names]
    if payload_names:
        parent_np = parent.to_numpy(zero_copy_only=False)
        # masked take: payload only where seq == 0
        masked = pa.array(parent_np.astype(np.int64), mask=(seq != 0))
        for name in payload_names:
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(masked)
    return pa.table(cols)


def make_bucketer(col, num_buckets):
    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((v % num_buckets).astype(np.int32)))

    return add_bucket


def assemble_ways_bucket(group: pa.Table) -> pa.Table:
    """One bucket of joined (way_id, seq, node_id, lon, lat [, payload])
    rows → one row per way with list<float64> coordinate arrays.
    Vectorized: lexsort + reduceat + ListArray.from_arrays; payload columns
    (riding the seq==0 rows) are gathered with one ``take``."""
    wid = group.column("way_id").to_numpy(zero_copy_only=False)
    seq = group.column("seq").to_numpy(zero_copy_only=False)
    lon = group.column("lon").to_numpy(zero_copy_only=False).astype(np.float64)
    lat = group.column("lat").to_numpy(zero_copy_only=False).astype(np.float64)
    nid = group.column("node_id").to_numpy(zero_copy_only=False)

    order = np.lexsort((seq, wid))
    wid, seq, lon, lat, nid = wid[order], seq[order], lon[order], lat[order], nid[order]

    boundary = np.empty(len(wid), dtype=bool)
    boundary[0] = True
    boundary[1:] = wid[1:] != wid[:-1]
    starts = np.nonzero(boundary)[0]
    ends = np.append(starts[1:], len(wid))
    counts = ends - starts

    nan = np.isnan(lon)
    incomplete = np.add.reduceat(nan.astype(np.int64), starts) > 0
    closed = (nid[starts] == nid[ends - 1]) & (counts >= 4)

    off64 = np.concatenate([[0], np.cumsum(counts, dtype=np.int64)])
    if off64[-1] > np.iinfo(np.int32).max:  # >2^31 coords in one bucket
        offsets = pa.array(off64, type=pa.int64())
        lons = pa.LargeListArray.from_arrays(offsets, pa.array(lon, type=pa.float64()))
        lats = pa.LargeListArray.from_arrays(offsets, pa.array(lat, type=pa.float64()))
    else:
        offsets = pa.array(off64.astype(np.int32))
        lons = pa.ListArray.from_arrays(offsets, pa.array(lon, type=pa.float64()))
        lats = pa.ListArray.from_arrays(offsets, pa.array(lat, type=pa.float64()))
    cols = {
        "way_id": pa.array(wid[starts]),
        "lons": lons,
        "lats": lats,
        "n_pts": pa.array(counts.astype(np.int32)),
        "complete": pa.array(~incomplete),
        "is_closed": pa.array(closed),
    }
    first_orig = pa.array(order[starts].astype(np.int64))
    for name in ("tags", "doc_id", "offset"):
        if name in group.schema.names:
            col = group.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(first_orig)
    return pa.table(cols)


def assemble_ways(ways_ds, nodes_ds, num_partitions=16, num_buckets=256, carry_payload=True):
    """elements(way rows) × elements(node rows) → way geometry dataset.

    Shuffle 1: bucketed cogroup refs⋈nodes on node_id (bucket_join — the
    map-typed payload riding seq==0 rows rules out the acero hash join).
    Shuffle 2: groupby(way_id % B) for the coordinate-list rebuild.
    With ``carry_payload`` the way tags/provenance arrive WITH the
    geometry — no third shuffle to re-attach them."""
    from osm_export_tool_python_ray.stages.joins import bucket_join

    refs = ways_ds.map_batches(explode_way_refs, batch_format="pyarrow")
    locs = nodes_ds.map_batches(
        lambda t: pa.table(
            {
                "node_id": t.column("element_id"),
                "lon": t.column("lon"),
                "lat": t.column("lat"),
            }
        ),
        batch_format="pyarrow",
    )
    left_fields = [("node_id", pa.int64()), ("way_id", pa.int64()), ("seq", pa.int32())]
    if carry_payload:
        left_fields += [
            ("tags", pa.map_(pa.string(), pa.string())),
            ("doc_id", pa.string()),
            ("offset", pa.int32()),
        ]
    joined = bucket_join(
        refs,
        locs,
        "node_id",
        num_buckets=num_buckets,
        how="left",
        left_schema=pa.schema(left_fields),
        right_schema=pa.schema(
            [("node_id", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64())]
        ),
    )
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    return grouped_map(
        joined.map_batches(make_bucketer("way_id", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda g: assemble_ways_bucket(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
    )


def explode_members(batch: pa.Table) -> pa.Table:
    """relations batch → (relation_id, mseq, role, way_id [, payload]) rows
    for type='way' members (reference: osmium area assembler gathers way
    members of multipolygon/boundary relations). Relation tags/provenance
    ride the first emitted member row of each relation (same carry trick
    as ``explode_way_refs``)."""
    members = batch.column("members")
    if isinstance(members, pa.ChunkedArray):
        members = members.combine_chunks()
    parent = pc.list_parent_indices(members)
    flat = pc.list_flatten(members)
    rel_id = pc.take(batch.column("element_id"), parent)
    counts = pc.list_value_length(members).fill_null(0).to_numpy(zero_copy_only=False)
    mseq = (
        np.concatenate([np.arange(c, dtype=np.int32) for c in counts])
        if len(counts)
        else np.array([], dtype=np.int32)
    )
    cols = {
        "relation_id": rel_id,
        "mseq": pa.array(mseq),
        "mtype": flat.field("type"),
        "role": flat.field("role"),
        "way_id": flat.field("ref"),
    }
    payload_names = [n for n in ("tags", "doc_id", "offset") if n in batch.schema.names]
    parent_np = parent.to_numpy(zero_copy_only=False)
    t = pa.table(cols)
    keep = pc.equal(t.column("mtype"), "way").to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(keep)).drop_columns(["mtype"])
    if payload_names and len(parent_np):
        kept_parent = parent_np[keep]
        # first kept row per relation carries the payload
        first = np.concatenate([[True], kept_parent[1:] != kept_parent[:-1]])
        masked = pa.array(kept_parent.astype(np.int64), mask=~first)
        for name in payload_names:
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = t.append_column(name, col.take(masked))
    elif payload_names:
        for name in payload_names:
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = t.append_column(name, col.slice(0, 0).take(pa.array([], type=pa.int64())))
    return t


class InvalidArea(RuntimeError):
    pass


class RingBudgetExceeded(InvalidArea):
    """A ring grew past RING_POINT_BUDGET mid-stitch — the runaway guard,
    not a geometry error. Callers drop the relation like any InvalidArea
    but COUNT it (report_cap 'relation_ring_budget_drops') so a budget
    tuned too low is visible in BENCH `caps`, never a silent data gap."""


# Point budget per assembled ring. This is a RUNAWAY GUARD (memory byte
# budget), not a correctness gate: libosmium assembles coastline/large-admin
# multipolygons with millions of nodes, and a valid giant ring must NOT be
# dropped as invalid. Default sized ~100x past the largest real-world OSM
# relations; override per call or via OSM_RAY_RING_POINT_BUDGET.
RING_POINT_BUDGET = int(os.environ.get("OSM_RAY_RING_POINT_BUDGET", str(10_000_000)))


def stitch_rings(segments, max_ring_points=None):
    """Member way coordinate arrays → list of closed rings with roles.

    ``segments``: list of (coords (N,2) ndarray, role str). Endpoint
    matching on exact coordinates (shared nodes serialize identically).
    Raises InvalidArea when any segment cannot be joined into a closed ring
    — failure parity with libosmium's assembler (reference tabular.py:338).

    Matching uses an endpoint hash index (O(segments) total instead of a
    quadratic pool scan) but preserves the original tie-break exactly:
    candidates are tried in segment order, start-point match before
    end-point match for the same segment; each new chain starts from the
    highest-numbered unused segment.
    """
    segs = []
    for coords, role in segments:
        c = np.asarray(coords, dtype=np.float64)
        if len(c) < 2 or np.isnan(c).any():
            raise InvalidArea("degenerate or incomplete member way")
        # +0.0 normalizes -0.0 so bitwise endpoint keys equal valuewise ones
        segs.append((c + 0.0, role))

    budget = max_ring_points or RING_POINT_BUDGET
    n = len(segs)
    # endpoint -> [(segment, which_end), ...] in (segment, start-first) order
    index = {}
    for j, (c, _r) in enumerate(segs):
        index.setdefault(c[0].tobytes(), []).append((j, 0))
        index.setdefault(c[-1].tobytes(), []).append((j, 1))

    used = [False] * n
    rings = []
    for s in range(n - 1, -1, -1):
        if used[s]:
            continue
        used[s] = True
        start, role = segs[s]
        parts = [start]
        total = len(start)
        head_key = start[0].tobytes()
        tail = start[-1]
        while not (total >= 4 and tail.tobytes() == head_key):
            hit = None
            for j, flag in index.get(tail.tobytes(), ()):
                if not used[j]:
                    hit = (j, flag)
                    break
            if hit is None:
                raise InvalidArea("open ring")
            j, flag = hit
            used[j] = True
            c2 = segs[j][0]
            ext = c2[1:] if flag == 0 else c2[::-1][1:]
            parts.append(ext)
            total += len(ext)
            tail = ext[-1]
            if total > budget:
                raise RingBudgetExceeded(
                    "runaway ring: %d points exceeds budget %d" % (total, budget)
                )
        chain = parts[0] if len(parts) == 1 else np.vstack(parts)
        if abs(signed_area(chain)) <= 0.0:
            raise InvalidArea("zero-area ring")
        rings.append((chain, role))

    if not rings:
        raise InvalidArea("no rings")
    return rings


def _ring_contains_point(ring, pt):
    r = ensure_closed(ring)
    ax, ay = r[:-1, 0], r[:-1, 1]
    bx, by = r[1:, 0], r[1:, 1]
    px, py = pt
    cond = (ay > py) != (by > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (bx - ax) * (py - ay) / (by - ay) + ax
    return int((cond & (px < xint)).sum()) % 2 == 1


def nest_rings(rings):
    """(ring, role) list → multipolygon [[exterior, *holes], ...]. Outers by
    role, inners nested into the outer containing their first vertex;
    orientation normalized (outer CCW, holes CW)."""
    outers = [orient(r, ccw=True) for r, role in rings if role != "inner"]
    inners = [orient(r, ccw=False) for r, role in rings if role == "inner"]
    if not outers:
        raise InvalidArea("no outer ring")
    polys = [[o] for o in outers]
    for h in inners:
        placed = False
        for poly in polys:
            if _ring_contains_point(poly[0], tuple(h[0])):
                poly.append(h)
                placed = True
                break
        if not placed:
            raise InvalidArea("hole outside every outer ring")
    return polys


def assemble_relations_bucket(group: pa.Table) -> pa.Table:
    """One bucket of joined member rows (relation_id, mseq, role, lons,
    lats, complete [, payload on the min-mseq row]) → one row per
    relation: stitched multipolygon + validity flag + carried payload."""
    from osm_export_tool_python_ray.functions import wkb as wkbmod

    rid = group.column("relation_id").to_numpy(zero_copy_only=False)
    mseq = group.column("mseq").to_numpy(zero_copy_only=False)
    order = np.lexsort((mseq, rid))
    g = group.take(pa.array(order))
    rid = rid[order]
    boundary = np.empty(len(rid), dtype=bool)
    if len(rid):
        boundary[0] = True
        boundary[1:] = rid[1:] != rid[:-1]
    starts = np.nonzero(boundary)[0]
    ends = np.append(starts[1:], len(rid))

    roles = g.column("role").to_pylist()
    lons = g.column("lons").to_pylist()
    lats = g.column("lats").to_pylist()
    complete = g.column("complete").to_numpy(zero_copy_only=False)

    out_id = []
    out_wkb = []
    out_bbox = []
    out_valid = []
    budget_drops = 0
    for s, e in zip(starts, ends):
        relation_id = int(rid[s])
        try:
            segs = []
            for i in range(s, e):
                if lons[i] is None or not complete[i]:
                    raise InvalidArea("missing member way")
                segs.append(
                    (np.stack([lons[i], lats[i]], axis=1), roles[i] or "outer")
                )
            polys = nest_rings(stitch_rings(segs))
            buf = wkbmod.multipolygon_wkb(polys)
            allpts = np.vstack([r for p in polys for r in p])
            out_bbox.append(
                (
                    float(allpts[:, 0].min()),
                    float(allpts[:, 1].min()),
                    float(allpts[:, 0].max()),
                    float(allpts[:, 1].max()),
                )
            )
            out_wkb.append(buf)
            out_valid.append(True)
        except RingBudgetExceeded:
            budget_drops += 1
            out_wkb.append(None)
            out_bbox.append((None, None, None, None))
            out_valid.append(False)
        except InvalidArea:
            out_wkb.append(None)
            out_bbox.append((None, None, None, None))
            out_valid.append(False)
        out_id.append(relation_id)

    if budget_drops:
        from osm_export_tool_python_ray.state.metrics import report_cap

        report_cap("relation_ring_budget_drops", budget_drops)

    cols = {
        "relation_id": pa.array(out_id, type=pa.int64()),
        "wkb": pa.array(out_wkb, type=pa.binary()),
        "minx": pa.array([b[0] for b in out_bbox], type=pa.float64()),
        "miny": pa.array([b[1] for b in out_bbox], type=pa.float64()),
        "maxx": pa.array([b[2] for b in out_bbox], type=pa.float64()),
        "maxy": pa.array([b[3] for b in out_bbox], type=pa.float64()),
        "valid": pa.array(out_valid),
    }
    first_rows = pa.array(starts.astype(np.int64))
    for name in ("tags", "doc_id", "offset"):
        if name in g.schema.names:
            col = g.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(first_rows)
    return pa.table(cols)


def assemble_ways_broadcast(ways_ds, nodes_ds):
    """Map-only J1 for the adaptive broadcast regime: when the node
    location table fits the caller's broadcast budget (run_export's
    ``broadcast_limit_bytes``), ship the sorted (id → lon/lat) arrays once
    via ``ray.put`` and resolve every way's refs with vectorized
    searchsorted lookups inside one ``map_batches`` — ZERO exchanges,
    replacing the cogroup + regroup sort pair of ``assemble_ways``.
    Output schema and row content identical to the shuffle path
    (incomplete refs → NaN coords + complete=false; 0-ref ways dropped,
    matching explode_way_refs emitting nothing for them).

    Scale note: the OSM-planet node table (~200 GB) does NOT fit — the
    caller falls back to the shuffle path above the budget; broadcast is
    for AOI-extract-sized inputs where it wins outright (plasma shares the
    one copy across all workers of a node)."""
    import ray

    ids_p, lon_p, lat_p = [], [], []
    for b in nodes_ds.iter_batches(batch_format="pyarrow"):
        ids_p.append(b.column("element_id").to_numpy(zero_copy_only=False))
        lon_p.append(b.column("lon").to_numpy(zero_copy_only=False))
        lat_p.append(b.column("lat").to_numpy(zero_copy_only=False))
    if ids_p:
        ids = np.concatenate(ids_p)
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        lon_s = np.concatenate(lon_p)[order].astype(np.float64)
        lat_s = np.concatenate(lat_p)[order].astype(np.float64)
    else:
        ids_s = np.array([], dtype=np.int64)
        lon_s = lat_s = np.array([], dtype=np.float64)
    loc_ref = ray.put((ids_s, lon_s, lat_s))

    def resolve(t: pa.Table) -> pa.Table:
        sids, slon, slat = cached_get(loc_ref)
        refs = t.column("refs")
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        counts = pc.list_value_length(refs).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = counts > 0
        if not keep.all():
            t = t.filter(pa.array(keep))
            refs = t.column("refs")
            if isinstance(refs, pa.ChunkedArray):
                refs = refs.combine_chunks()
            counts = counts[keep]
        if t.num_rows == 0:
            return pa.table({n: pa.array([], type=ty) for n, ty in zip(WAY_GEOM_SCHEMA.names, WAY_GEOM_SCHEMA.types)})
        node_ids = pc.list_flatten(refs).to_numpy(zero_copy_only=False)
        if len(sids):
            pos = np.searchsorted(sids, node_ids)
            posc = np.minimum(pos, len(sids) - 1)
            found = sids[posc] == node_ids
            lon = np.where(found, slon[posc], np.nan)
            lat = np.where(found, slat[posc], np.nan)
        else:
            found = np.zeros(len(node_ids), dtype=bool)
            lon = np.full(len(node_ids), np.nan)
            lat = np.full(len(node_ids), np.nan)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        complete = np.add.reduceat(found.astype(np.int64), starts) == counts
        ends = np.cumsum(counts)
        closed = (node_ids[starts] == node_ids[ends - 1]) & (counts >= 4)

        off64 = np.concatenate([[0], np.cumsum(counts, dtype=np.int64)])
        if off64[-1] > np.iinfo(np.int32).max:
            offsets = pa.array(off64, type=pa.int64())
            lons = pa.LargeListArray.from_arrays(offsets, pa.array(lon, type=pa.float64()))
            lats = pa.LargeListArray.from_arrays(offsets, pa.array(lat, type=pa.float64()))
        else:
            offsets = pa.array(off64.astype(np.int32))
            lons = pa.ListArray.from_arrays(offsets, pa.array(lon, type=pa.float64()))
            lats = pa.ListArray.from_arrays(offsets, pa.array(lat, type=pa.float64()))
        cols = {
            "way_id": t.column("element_id"),
            "lons": lons,
            "lats": lats,
            "n_pts": pa.array(counts.astype(np.int32)),
            "complete": pa.array(complete),
            "is_closed": pa.array(closed),
        }
        for name in ("tags", "doc_id", "offset"):
            if name in t.schema.names:
                cols[name] = t.column(name)
        return pa.table(cols)

    return ways_ds.map_batches(resolve, batch_format="pyarrow")


def assemble_relations_broadcast(rels_ds, way_geoms_ds):
    """Map-only J2/J3: broadcast the assembled way geometries (sorted ids
    + concatenated coordinate arrays) and stitch each relation inside one
    ``map_batches`` — replaces the member join + regroup sort pair of
    ``assemble_relations``. Same InvalidArea semantics. Caller gates on
    the way-geometry table size (run_export ``broadcast_limit_bytes``)."""
    import ray

    from osm_export_tool_python_ray.functions import wkb as wkbmod

    ids_p, lon_p, lat_p, cnt_p, comp_p = [], [], [], [], []
    for b in way_geoms_ds.iter_batches(batch_format="pyarrow"):
        ids_p.append(b.column("way_id").to_numpy(zero_copy_only=False))
        lons = b.column("lons")
        if isinstance(lons, pa.ChunkedArray):
            lons = lons.combine_chunks()
        lats = b.column("lats")
        if isinstance(lats, pa.ChunkedArray):
            lats = lats.combine_chunks()
        cnt_p.append(pc.list_value_length(lons).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64))
        lon_p.append(lons.flatten().to_numpy(zero_copy_only=False))
        lat_p.append(lats.flatten().to_numpy(zero_copy_only=False))
        comp_p.append(b.column("complete").to_numpy(zero_copy_only=False))
    if ids_p:
        ids = np.concatenate(ids_p)
        counts = np.concatenate(cnt_p)
        comp = np.concatenate(comp_p)
        flat_lon = np.concatenate(lon_p)
        flat_lat = np.concatenate(lat_p)
        block_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        starts_s = block_starts[order]
        counts_s = counts[order]
        comp_s = comp[order]
    else:
        ids_s = starts_s = counts_s = np.array([], dtype=np.int64)
        comp_s = np.array([], dtype=bool)
        flat_lon = flat_lat = np.array([], dtype=np.float64)
    geom_ref = ray.put((ids_s, starts_s, counts_s, comp_s, flat_lon, flat_lat))

    def stitch_batch(t: pa.Table) -> pa.Table:
        sids, sstarts, scounts, scomp, flon, flat_ = cached_get(geom_ref)
        members = t.column("members")
        if isinstance(members, pa.ChunkedArray):
            members = members.combine_chunks()
        mem_lists = members.to_pylist()
        rel_ids = t.column("element_id").to_numpy(zero_copy_only=False)
        out_id, out_wkb, out_bbox, out_valid, out_rows = [], [], [], [], []
        for i in range(t.num_rows):
            relation_id = int(rel_ids[i])
            way_members = [m for m in (mem_lists[i] or []) if m["type"] == "way"]
            if not way_members:
                # parity with the shuffle path: zero way members → the
                # relation never appears in rel_geoms (explode emits no rows)
                continue
            try:
                segs = []
                for m in way_members:
                    j = np.searchsorted(sids, m["ref"])
                    if j >= len(sids) or sids[j] != m["ref"] or not scomp[j]:
                        raise InvalidArea("missing member way")
                    s = sstarts[j]
                    c = np.stack([flon[s : s + scounts[j]], flat_[s : s + scounts[j]]], axis=1)
                    segs.append((c, m["role"] or "outer"))
                polys = nest_rings(stitch_rings(segs))
                buf = wkbmod.multipolygon_wkb(polys)
                allpts = np.vstack([r for p in polys for r in p])
                out_bbox.append(
                    (
                        float(allpts[:, 0].min()),
                        float(allpts[:, 1].min()),
                        float(allpts[:, 0].max()),
                        float(allpts[:, 1].max()),
                    )
                )
                out_wkb.append(buf)
                out_valid.append(True)
            except InvalidArea:
                out_wkb.append(None)
                out_bbox.append((None, None, None, None))
                out_valid.append(False)
            out_id.append(relation_id)
            out_rows.append(i)

        cols = {
            "relation_id": pa.array(out_id, type=pa.int64()),
            "wkb": pa.array(out_wkb, type=pa.binary()),
            "minx": pa.array([b[0] for b in out_bbox], type=pa.float64()),
            "miny": pa.array([b[1] for b in out_bbox], type=pa.float64()),
            "maxx": pa.array([b[2] for b in out_bbox], type=pa.float64()),
            "maxy": pa.array([b[3] for b in out_bbox], type=pa.float64()),
            "valid": pa.array(out_valid),
        }
        row_take = pa.array(np.asarray(out_rows, dtype=np.int64))
        for name in ("tags", "doc_id", "offset"):
            if name in t.schema.names:
                col = t.column(name)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                cols[name] = col.take(row_take)
        return pa.table(cols)

    return rels_ds.map_batches(stitch_batch, batch_format="pyarrow")


def assemble_relations(rels_ds, way_geoms_ds, num_partitions=16, num_buckets=64):
    """Filtered relation rows × assembled way geometries → per-relation
    stitched multipolygons. Shuffles: bucketed join on way_id (coordinate
    lists are nested → bucket_join, not acero), groupby relation bucket."""
    from osm_export_tool_python_ray.stages.joins import bucket_join

    members = rels_ds.map_batches(explode_members, batch_format="pyarrow")
    geoms = way_geoms_ds.map_batches(
        lambda t: t.select(["way_id", "lons", "lats", "complete"]),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        members,
        geoms,
        "way_id",
        num_buckets=num_partitions * 4,
        how="left",
        left_schema=pa.schema(
            [
                ("relation_id", pa.int64()),
                ("mseq", pa.int32()),
                ("role", pa.string()),
                ("way_id", pa.int64()),
                ("tags", pa.map_(pa.string(), pa.string())),
                ("doc_id", pa.string()),
                ("offset", pa.int32()),
            ]
        ),
        right_schema=pa.schema(
            [("way_id", pa.int64()), ("lons", pa.list_(pa.float64())), ("lats", pa.list_(pa.float64())), ("complete", pa.bool_())]
        ),
    )
    from osm_export_tool_python_ray.stages.exchange import grouped_map

    return grouped_map(
        joined.map_batches(make_bucketer("relation_id", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda grp: assemble_relations_bucket(grp.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
    )
