"""Single-streaming-DAG export: the whole pipeline as ONE chain of
bucketed exchanges with zero driver-side materialize barriers.

The staged pipeline (pipelines/export.py) materializes two branch points
(elements, way geometries) because Ray Datasets are linear and those
tables have several consumers. Each barrier serializes the DAG: nothing
downstream starts until the barrier completes, which puts a hard floor on
scaling. This variant removes the branches entirely by flowing EVERY kind
of row through one mixed-role table:

  S1 groupby(ekey%B):   dedup; nodes → point features (inline) + loc rows;
                        ways → ref rows (payload on seq==0);
                        relations → member rows; tiles pass through
  S2 groupby(node%B):   loc⋈ref merge (searchsorted) → located ref rows;
                        everything else passes through
  S3 groupby(way%B):    assemble way geometry → way features (inline);
                        member rows (same key!) pick up their way geometry
                        here; pass through
  S4 groupby(rel%B):    ring stitch → relation features (inline)
  S5 map:               ThemeRouter over the feature rows

Four shuffles (same as the staged DAG) but no barriers: the streaming
executor pipelines all stages with backpressure. The cost is that
early-finished rows (point features, tiles) ride later exchanges as
passthrough — a deliberate bytes-for-latency trade, and exactly the shape
that scales on a real multi-node cluster: one continuous exchange
pipeline, no driver round-trips.

Row roles: 1=feature (done), 2=ref, 3=loc, 4=member (pre-geom),
5=member+geom, 6=tile.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray import GeomType
from osm_export_tool_python_ray.stages.assemble import (
    InvalidArea,
    nest_rings,
    stitch_rings,
)
from osm_export_tool_python_ray.stages.explode import explode_osm
from osm_export_tool_python_ray.stages.features import (
    FEATURE_FIELDS,
    PointFeatures,
    RelationAreaFeatures,
    ThemeRouter,
    WayFeatures,
)
from osm_export_tool_python_ray.pipelines.export import (
    _area_relation_filter,
)

_FLOW_EXTRA = [
    ("role", pa.int8()),
    ("k", pa.int64()),            # current-stage shuffle key
    ("node_id", pa.int64()),
    ("way_id", pa.int64()),
    ("seq", pa.int32()),
    ("relation_id", pa.int64()),
    ("mseq", pa.int32()),
    ("mrole", pa.string()),
    ("lons", pa.list_(pa.float64())),
    ("lats", pa.list_(pa.float64())),
    ("complete", pa.bool_()),
    ("is_closed", pa.bool_()),
    ("n_pts", pa.int32()),
    ("media_ref", pa.string()),
    ("theme", pa.string()),
]
FLOW_SCHEMA = pa.schema(FEATURE_FIELDS + _FLOW_EXTRA)
_FLOW_TYPES = {f.name: f.type for f in FLOW_SCHEMA}


def _flow(n, **cols):
    out = {}
    for name, typ in _FLOW_TYPES.items():
        v = cols.get(name)
        if v is None:
            out[name] = pa.nulls(n, type=typ)
        elif isinstance(v, (pa.Array, pa.ChunkedArray)):
            out[name] = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        else:
            out[name] = pa.array(v, type=typ)
    return pa.table(out)


def _concat(tables):
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return _flow(0)
    return pa.concat_tables([t.select(FLOW_SCHEMA.names) for t in tables])


def _spread_keys(n, base):
    """Deterministic passthrough keys that spread rows across buckets."""
    return (np.arange(n, dtype=np.int64) * np.int64(2654435761) + np.int64(base)) & np.int64(0x7FFFFFFF)


class _S1DedupAndSplit:
    """Per ekey-bucket: dedup, then emit role rows. Feature math for nodes
    happens right here (PointFeatures reused as a plain function)."""

    def __init__(self, mapping, aoi_polygons):
        self.pf = PointFeatures(mapping, aoi_polygons)

    def __call__(self, group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [("ekey", "ascending"), ("doc_id", "ascending"), ("offset", "ascending")]
        )
        ek = g.column("ekey").to_numpy(zero_copy_only=False)
        keep = np.ones(len(ek), dtype=bool)
        keep[1:] = ek[1:] != ek[:-1]
        g = g.filter(pa.array(keep))

        kind = np.asarray(g.column("kind").to_numpy(zero_copy_only=False), dtype=object)
        out = []

        nodes = g.filter(pa.array(kind == "node"))
        if nodes.num_rows:
            feats = self.pf(nodes)
            if feats.num_rows:
                out.append(
                    _flow(
                        feats.num_rows,
                        role=np.full(feats.num_rows, 1, dtype=np.int8),
                        k=_spread_keys(feats.num_rows, 11),
                        **{name: feats.column(name) for name in feats.schema.names},
                    )
                )
            # every node is a location row (untagged ones exist only for this)
            nid = nodes.column("element_id")
            out.append(
                _flow(
                    nodes.num_rows,
                    role=np.full(nodes.num_rows, 3, dtype=np.int8),
                    k=nid,
                    node_id=nid,
                    lon=nodes.column("lon"),
                    lat=nodes.column("lat"),
                )
            )

        ways = g.filter(pa.array(kind == "way"))
        if ways.num_rows:
            from osm_export_tool_python_ray.stages.assemble import explode_way_refs

            refs = explode_way_refs(ways)
            out.append(
                _flow(
                    refs.num_rows,
                    role=np.full(refs.num_rows, 2, dtype=np.int8),
                    k=refs.column("node_id"),
                    node_id=refs.column("node_id"),
                    way_id=refs.column("way_id"),
                    seq=refs.column("seq"),
                    tags=refs.column("tags"),
                    doc_id=refs.column("doc_id"),
                    offset=refs.column("offset"),
                )
            )

        rels = _area_relation_filter(g)
        if rels.num_rows:
            from osm_export_tool_python_ray.stages.assemble import explode_members

            mem = explode_members(rels)
            out.append(
                _flow(
                    mem.num_rows,
                    role=np.full(mem.num_rows, 4, dtype=np.int8),
                    k=mem.column("way_id"),
                    way_id=mem.column("way_id"),
                    relation_id=mem.column("relation_id"),
                    mseq=mem.column("mseq"),
                    mrole=mem.column("role"),
                    tags=mem.column("tags"),
                    doc_id=mem.column("doc_id"),
                    offset=mem.column("offset"),
                )
            )

        tiles = g.filter(pa.array(kind == "tile"))
        if tiles.num_rows:
            out.append(
                _flow(
                    tiles.num_rows,
                    role=np.full(tiles.num_rows, 6, dtype=np.int8),
                    k=_spread_keys(tiles.num_rows, 17),
                    osm_id=tiles.column("element_id"),
                    media_ref=tiles.column("media_ref"),
                    doc_id=tiles.column("doc_id"),
                    offset=tiles.column("offset"),
                )
            )
        return _concat(out)


def _s2_locate(group: pa.Table) -> pa.Table:
    """Per node-bucket: ref rows pick up lon/lat from loc rows; loc rows
    are consumed; everything else passes through (k advanced to way_id)."""
    role = group.column("role").to_numpy(zero_copy_only=False)
    refs_idx = np.nonzero(role == 2)[0]
    locs_idx = np.nonzero(role == 3)[0]
    # members already carry k=way_id from S1; features/tiles keep their
    # spread keys — all pass through untouched
    passthrough = group.filter(pa.array((role != 2) & (role != 3)))
    out = []
    if passthrough.num_rows:
        out.append(passthrough)
    if len(refs_idx):
        refs = group.take(pa.array(refs_idx))
        lon = np.full(len(refs_idx), np.nan)
        lat = np.full(len(refs_idx), np.nan)
        if len(locs_idx):
            locs = group.take(pa.array(locs_idx))
            lk = locs.column("node_id").to_numpy(zero_copy_only=False)
            order = np.argsort(lk, kind="stable")
            lk_s = lk[order]
            llon = locs.column("lon").to_numpy(zero_copy_only=False)[order]
            llat = locs.column("lat").to_numpy(zero_copy_only=False)[order]
            rk = refs.column("node_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(lk_s, rk)
            pos_c = np.minimum(pos, len(lk_s) - 1)
            hit = lk_s[pos_c] == rk
            lon[hit] = llon[pos_c[hit]]
            lat[hit] = llat[pos_c[hit]]
        refs = refs.set_column(
            refs.schema.get_field_index("lon"), "lon", pa.array(lon)
        ).set_column(
            refs.schema.get_field_index("lat"), "lat", pa.array(lat)
        )
        wk = refs.column("way_id")
        refs = refs.set_column(refs.schema.get_field_index("k"), "k", wk)
        out.append(refs)
    return _concat(out)


class _S3AssembleWays:
    """Per way-bucket: located ref rows → way geometry; emit way features
    inline; member rows (keyed to the same bucket) pick up their geometry;
    pass through the rest (members advance to relation key space)."""

    def __init__(self, mapping, aoi_polygons, polygon_centroid):
        self.wf = WayFeatures(mapping, aoi_polygons, polygon_centroid)

    def __call__(self, group: pa.Table) -> pa.Table:
        from osm_export_tool_python_ray.stages.assemble import assemble_ways_bucket

        role = group.column("role").to_numpy(zero_copy_only=False)
        out = [group.filter(pa.array((role != 2) & (role != 4)))]
        refs = group.filter(pa.array(role == 2))
        members = group.filter(pa.array(role == 4))
        if out[0].num_rows == 0:
            out = []

        geoms = None
        if refs.num_rows:
            geoms = assemble_ways_bucket(
                refs.select(["way_id", "seq", "node_id", "lon", "lat", "tags", "doc_id", "offset"])
            )
            feats = self.wf(geoms)
            if feats.num_rows:
                out.append(
                    _flow(
                        feats.num_rows,
                        role=np.full(feats.num_rows, 1, dtype=np.int8),
                        k=_spread_keys(feats.num_rows, 23),
                        **{name: feats.column(name) for name in feats.schema.names},
                    )
                )
        if members.num_rows:
            n = members.num_rows
            lons = pa.nulls(n, type=pa.list_(pa.float64()))
            lats = pa.nulls(n, type=pa.list_(pa.float64()))
            complete = pa.nulls(n, type=pa.bool_())
            if geoms is not None and geoms.num_rows:
                gk = geoms.column("way_id").to_numpy(zero_copy_only=False)
                order = np.argsort(gk, kind="stable")
                gk_s = gk[order]
                mk = members.column("way_id").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(gk_s, mk)
                pos_c = np.minimum(pos, len(gk_s) - 1)
                hit = gk_s[pos_c] == mk
                take_idx = pa.array(
                    np.where(hit, order[pos_c], 0).astype(np.int64), mask=~hit
                )
                lons = geoms.column("lons").take(take_idx)
                lats = geoms.column("lats").take(take_idx)
                complete = geoms.column("complete").take(take_idx)
            m2 = _flow(
                n,
                role=np.full(n, 5, dtype=np.int8),
                k=members.column("relation_id"),
                relation_id=members.column("relation_id"),
                mseq=members.column("mseq"),
                mrole=members.column("mrole"),
                lons=lons,
                lats=lats,
                complete=complete,
                tags=members.column("tags"),
                doc_id=members.column("doc_id"),
                offset=members.column("offset"),
            )
            out.append(m2)
        return _concat(out)


class _S4AssembleRelations:
    """Per relation-bucket: stitch rings, emit relation features inline."""

    def __init__(self, mapping, aoi_polygons, polygon_centroid):
        self.rf = RelationAreaFeatures(mapping, aoi_polygons, polygon_centroid)

    def __call__(self, group: pa.Table) -> pa.Table:
        from osm_export_tool_python_ray.stages.assemble import assemble_relations_bucket

        role = group.column("role").to_numpy(zero_copy_only=False)
        out = [group.filter(pa.array(role != 5))]
        if out[0].num_rows == 0:
            out = []
        members = group.filter(pa.array(role == 5))
        if members.num_rows:
            geoms = assemble_relations_bucket(
                members.select(
                    ["relation_id", "mseq", "mrole", "lons", "lats", "complete", "tags", "doc_id", "offset"]
                ).rename_columns(
                    ["relation_id", "mseq", "role", "lons", "lats", "complete", "tags", "doc_id", "offset"]
                )
            )
            feats = self.rf(geoms)
            if feats.num_rows:
                out.append(
                    _flow(
                        feats.num_rows,
                        role=np.full(feats.num_rows, 1, dtype=np.int8),
                        k=_spread_keys(feats.num_rows, 31),
                        **{name: feats.column(name) for name in feats.schema.names},
                    )
                )
        return _concat(out)


def _bucket(col_vals, num_buckets):
    return (col_vals % np.int64(num_buckets)).astype(np.int32)


def run_export_streaming(
    docs_ds,
    mapping,
    aoi_polygons=None,
    polygon_centroid=False,
    num_buckets=128,
    include_tiles=False,
    num_dedup_buckets=None,
):
    """Hybrid streaming export: ONE cheap barrier (the deduped element
    table — multiple consumers) and then a single streaming exchange chain
    for the way/relation geometry path with features emitted inline:

        elements (barrier; parse+dedup shuffle)
          ├ nodes → PointFeatures ───────────────────────────────┐ union →
          └ refs+locs → S2(node%B) → +members → S3(way%B:        │ Theme-
              assemble + way feats + member-geoms) → S4(rel%B:   │ Router
              stitch + rel feats) ───────────────────────────────┘

    vs the staged pipeline: the way_geoms barrier and the full-table
    member join are gone (members ride the SAME way-bucket exchange the
    geometry comes out of); way features pay one passthrough shuffle (S4).
    Semantics identical to run_export (tests/test_streaming.py)."""
    import functools

    import pyarrow.compute as pc

    from osm_export_tool_python_ray.pipelines.export import (
        _kind_filter,
        parse_elements,
    )
    from osm_export_tool_python_ray.stages.assemble import explode_members, explode_way_refs

    elements = parse_elements(
        docs_ds, num_buckets=num_dedup_buckets or num_buckets, include_tiles=include_tiles
    ).materialize()

    def b_k(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(_bucket(k, num_buckets)))

    # --- point features straight off the barrier
    nodes_full = elements.map_batches(
        _kind_filter("node", ["element_id", "tags", "lon", "lat", "doc_id", "offset"]),
        batch_format="pyarrow",
    )
    pf = PointFeatures(mapping, aoi_polygons)
    point_feats = nodes_full.map_batches(pf, batch_format="pyarrow")

    # --- flow rows
    def refs_flow(t: pa.Table) -> pa.Table:
        ways = _kind_filter("way", ["element_id", "refs", "tags", "doc_id", "offset"])(t)
        refs = explode_way_refs(ways)
        return _flow(
            refs.num_rows,
            role=np.full(refs.num_rows, 2, dtype=np.int8),
            k=refs.column("node_id"),
            node_id=refs.column("node_id"),
            way_id=refs.column("way_id"),
            seq=refs.column("seq"),
            tags=refs.column("tags"),
            doc_id=refs.column("doc_id"),
            offset=refs.column("offset"),
        )

    def locs_flow(t: pa.Table) -> pa.Table:
        nodes = _kind_filter("node", ["element_id", "lon", "lat"])(t)
        nid = nodes.column("element_id")
        return _flow(
            nodes.num_rows,
            role=np.full(nodes.num_rows, 3, dtype=np.int8),
            k=nid,
            node_id=nid,
            lon=nodes.column("lon"),
            lat=nodes.column("lat"),
        )

    def members_flow(t: pa.Table) -> pa.Table:
        rels = _area_relation_filter(t)
        mem = explode_members(rels)
        return _flow(
            mem.num_rows,
            role=np.full(mem.num_rows, 4, dtype=np.int8),
            k=mem.column("way_id"),
            way_id=mem.column("way_id"),
            relation_id=mem.column("relation_id"),
            mseq=mem.column("mseq"),
            mrole=mem.column("role"),
            tags=mem.column("tags"),
            doc_id=mem.column("doc_id"),
            offset=mem.column("offset"),
        )

    s3 = _S3AssembleWays(mapping, aoi_polygons, polygon_centroid)
    s4 = _S4AssembleRelations(mapping, aoi_polygons, polygon_centroid)

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    np_ = num_buckets if num_buckets < 32 else 32
    s2_in = (
        elements.map_batches(refs_flow, batch_format="pyarrow")
        .union(elements.map_batches(locs_flow, batch_format="pyarrow"))
        .map_batches(b_k, batch_format="pyarrow")
    )
    s2_out = grouped_map(
        s2_in, "bucket", lambda g: _s2_locate(g.drop_columns(["bucket"])), num_partitions=np_
    )
    s3_in = s2_out.union(elements.map_batches(members_flow, batch_format="pyarrow")).map_batches(
        b_k, batch_format="pyarrow"
    )
    s3_out = grouped_map(
        s3_in, "bucket", lambda g: s3(g.drop_columns(["bucket"])), num_partitions=np_
    )
    flow = grouped_map(
        s3_out.map_batches(b_k, batch_format="pyarrow"),
        "bucket",
        lambda g: s4(g.drop_columns(["bucket"])),
        num_partitions=np_,
    )

    feature_names = [name for name, _t in FEATURE_FIELDS]
    flow_feats = flow.map_batches(
        lambda t: t.filter(
            pa.array(t.column("role").to_numpy(zero_copy_only=False) == 1)
        ).select(feature_names),
        batch_format="pyarrow",
    )

    from osm_export_tool_python_ray.stages.exchange import union_all

    router = ThemeRouter(mapping)
    themed = union_all(point_feats, flow_feats).map_batches(router, batch_format="pyarrow").map_batches(
        lambda t: t.append_column("media_ref", pa.nulls(t.num_rows, type=pa.string())),
        batch_format="pyarrow",
    )

    if include_tiles:
        def tiles_out(t: pa.Table) -> pa.Table:
            tiles = t.filter(pc.equal(t.column("kind"), "tile"))
            n = tiles.num_rows
            return (
                _flow(
                    n,
                    role=np.full(n, 6, dtype=np.int8),
                    osm_id=tiles.column("element_id"),
                    doc_id=tiles.column("doc_id"),
                    offset=tiles.column("offset"),
                )
                .select(feature_names)
                .append_column("theme", pa.array(["__tile__"] * n, type=pa.string()))
                .append_column(
                    "media_ref",
                    tiles.column("media_ref").combine_chunks()
                    if isinstance(tiles.column("media_ref"), pa.ChunkedArray)
                    else tiles.column("media_ref"),
                )
            )

        themed = union_all(themed, elements.map_batches(tiles_out, batch_format="pyarrow"))
    return themed
