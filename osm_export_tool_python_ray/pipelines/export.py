"""The flagship export pipeline: interleaved documents → themed features.

Engine equivalent of ``cmd.main`` + ``tabular.Handler`` (reference
cmd.py:11-66, tabular.py:251-339), re-expressed as a Ray Data DAG:

    read docs → explode spans → dedup (shuffle: ekey)
      ├─ nodes ─────────────────────────────→ PointFeatures ──┐
      ├─ ways → J1 cogroup(node_id) → groupby(way_id%B)       ├─ union →
      │     (tags ride seq==0 rows) → WayFeatures ────────────┤  ThemeRouter
      └─ relations → J2 cogroup(way_id) → groupby(rel%B)      │  → features
            (tags ride min-mseq rows) → RelationAreaFeatures ─┘  (ckpt,
                                                         theme-partitioned)

Stage boundaries (elements, way_geoms, features) are durable parquet
checkpoints when ``workdir`` is given — branch points that would otherwise
re-execute lineage, and the resume-by-skip units (state/checkpoint.py).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osm_export_tool_python_ray.stages.explode import dedup_elements, explode_osm
from osm_export_tool_python_ray.stages.assemble import assemble_relations, assemble_ways
from osm_export_tool_python_ray.stages.features import (
    PointFeatures,
    RelationAreaFeatures,
    ThemeRouter,
    WayFeatures,
)
from osm_export_tool_python_ray.stages.matcher_eval import (
    closed_way_is_polygon_mask,
    extract_tag_columns,
    tag_count,
)
from osm_export_tool_python_ray.state.checkpoint import materialize_or_checkpoint

_AREA_RELATION_TYPES = ("multipolygon", "boundary")


def _kind_filter(kind, columns=None):
    def fn(t: pa.Table) -> pa.Table:
        out = t.filter(pc.equal(t.column("kind"), kind))
        if columns:
            out = out.select(columns)
        return out

    return fn


def _area_relation_filter(t: pa.Table) -> pa.Table:
    """Relations the osmium area assembler would consider: tagged,
    type=multipolygon/boundary, polygon-ish tags (reference
    tabular.py:311-312 + libosmium assembler semantics)."""
    t = t.filter(pc.equal(t.column("kind"), "relation"))
    tags = t.column("tags")
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    n = t.num_rows
    if n == 0:
        return t.select(["element_id", "tags", "members", "doc_id", "offset"])
    cols = extract_tag_columns(tags, ["type"])
    present, vals = cols["type"]
    mask = present & np.isin(vals, list(_AREA_RELATION_TYPES))
    mask &= tag_count(tags) > 0
    mask &= closed_way_is_polygon_mask(tags)
    return t.filter(pa.array(mask)).select(
        ["element_id", "tags", "members", "doc_id", "offset"]
    )


def parse_elements(docs_ds, num_buckets=64, include_tiles=False, dedup_strategy="shuffle"):
    """documents → deduped element table (explode + D4 exact dedup).
    With ``include_tiles`` the same scan+shuffle also dedups tile payload
    rows (kind='tile'), so the raster side needs no second corpus pass.

    ``dedup_strategy``: 'shuffle' (default) moves full element rows through
    one bucketed exchange. 'light' shuffles only the (ekey, doc_id, offset)
    projection and drops duplicates with a broadcast tombstone filter
    (~8× less exchange bandwidth), falling back to 'shuffle' when the
    duplicate count exceeds the driver broadcast cap. Measured single-node
    (24,576-shard corpus, 32 cpus): 'light' is SLOWER here (155 s vs 73 s)
    because collecting the tombstones is a pipeline barrier and the
    pre-dedup stream must be materialized alongside the deduped one; it is
    kept for multi-node deployments where exchange bandwidth, not
    object-store residency, is the binding constraint (BASELINE.md)."""
    import functools

    from osm_export_tool_python_ray.stages.explode import dedup_elements_light

    fn = functools.partial(explode_osm, include_tiles=include_tiles)
    exploded = docs_ds.map_batches(fn, batch_format="pyarrow")
    if dedup_strategy == "light":
        try:
            return dedup_elements_light(exploded, num_buckets=num_buckets)
        except ValueError:
            exploded = docs_ds.map_batches(fn, batch_format="pyarrow")
    return dedup_elements(exploded, num_buckets=num_buckets)


def run_export(
    docs_ds,
    mapping,
    aoi_polygons=None,
    polygon_centroid=False,
    workdir=None,
    num_partitions=8,
    num_buckets=64,
    include_tiles=False,
    return_parts=False,
    broadcast_limit_bytes=0,
    elements_ds=None,
):
    """→ themed feature Dataset (FEATURE_SCHEMA + theme column), checkpointed
    at ``workdir/features`` when a workdir is given.

    Builder state (compiled themes + prepared AOI) is constructed ONCE on
    the driver and shipped to stateless map_batches tasks by closure — the
    broadcast-small-side pattern. Actor pools (``map_batches(Cls,
    concurrency=N)``) are reserved for stages with genuinely heavy state:
    with four light pools plus two hash-join aggregator groups the pools'
    CPU reservations can deadlock a small cluster, and rebuilding this
    state costs ~ms per task anyway.

    ``elements_ds``: pre-exploded element Dataset (ELEMENT_SCHEMA + ekey,
    e.g. from sources/pbf.py read_osm_pbf) — replaces the corpus
    explode; the same D4 exact dedup still runs (a .pbf extract can
    carry an element once per overlapping bbox)."""
    if elements_ds is not None:
        from osm_export_tool_python_ray.stages.explode import dedup_elements

        elements = materialize_or_checkpoint(
            dedup_elements(elements_ds, num_buckets=num_buckets),
            workdir,
            "elements",
        )
    else:
        elements = materialize_or_checkpoint(
            parse_elements(docs_ds, num_buckets=num_buckets, include_tiles=include_tiles),
            workdir,
            "elements",
        )

    nodes_loc = elements.map_batches(
        _kind_filter("node", ["element_id", "lon", "lat"]), batch_format="pyarrow"
    )
    # way tags/provenance ride the refs explode (seq==0 rows) through the
    # assembly shuffles — no separate tags join afterwards
    ways = elements.map_batches(
        _kind_filter("way", ["element_id", "refs", "tags", "doc_id", "offset"]),
        batch_format="pyarrow",
    )

    # OPT-IN adaptive broadcast (broadcast_limit_bytes > 0): when the
    # deduped element table fits the budget, way assembly resolves refs
    # against a ray.put node index inside one map_batches (zero exchanges)
    # instead of the cogroup+regroup sort pair. Measured single-node at the
    # 24,576-shard corpus / 32 cpus it LOSES (63 s shuffle vs 91–163 s
    # broadcast): the driver-side index collection is a pipeline barrier
    # that forfeits streaming overlap, the same failure mode as the
    # tombstone dedup (BASELINE.md). Default OFF; the switch exists for
    # small-AOI extract workflows and multi-node exchange-bound regimes
    # where one plasma copy per node beats an all-to-all.
    elements_bytes = elements.size_bytes() or 0
    use_broadcast = bool(broadcast_limit_bytes) and 0 < elements_bytes <= broadcast_limit_bytes
    if use_broadcast:
        from osm_export_tool_python_ray.stages.assemble import assemble_ways_broadcast

        way_assembly = assemble_ways_broadcast(ways, nodes_loc)
    else:
        way_assembly = assemble_ways(
            ways, nodes_loc, num_partitions=num_partitions, num_buckets=num_buckets
        )
    way_geoms = materialize_or_checkpoint(way_assembly, workdir, "way_geoms")

    # ---- point features
    nodes_full = elements.map_batches(
        _kind_filter("node", ["element_id", "tags", "lon", "lat", "doc_id", "offset"]),
        batch_format="pyarrow",
    )
    point_feats = nodes_full.map_batches(
        PointFeatures(mapping, aoi_polygons), batch_format="pyarrow"
    )

    # ---- way features (lines + way-polygons) straight off the geometry
    way_feats = way_geoms.map_batches(
        WayFeatures(mapping, aoi_polygons, polygon_centroid), batch_format="pyarrow"
    )

    # ---- relation area features (relation tags ride the member explode)
    rels = elements.map_batches(_area_relation_filter, batch_format="pyarrow")
    way_geom_bytes = way_geoms.size_bytes() or 0
    if (
        bool(broadcast_limit_bytes)
        and 0 < way_geom_bytes <= broadcast_limit_bytes
    ):
        from osm_export_tool_python_ray.stages.assemble import (
            assemble_relations_broadcast,
        )

        rel_geoms = assemble_relations_broadcast(rels, way_geoms)
    else:
        rel_geoms = assemble_relations(
            rels,
            way_geoms,
            num_partitions=num_partitions,
            num_buckets=max(4, num_buckets // 4),
        )
    rel_feats = rel_geoms.map_batches(
        RelationAreaFeatures(mapping, aoi_polygons, polygon_centroid),
        batch_format="pyarrow",
    )

    from osm_export_tool_python_ray.stages.exchange import union_all

    features = union_all(point_feats, way_feats, rel_feats)
    themed = features.map_batches(ThemeRouter(mapping), batch_format="pyarrow")
    if workdir:
        from osm_export_tool_python_ray.state.checkpoint import checkpoint
        import os

        themed = checkpoint(
            themed, os.path.join(workdir, "features"), partition_cols=["theme"]
        )
    if return_parts:
        return themed, elements, way_geoms
    return themed


def theme_counts(themed_ds):
    """Per theme×geom_type feature counts (SURVEY.md A2) — partial counts
    inside map_batches, tiny final groupby."""

    def partial(t: pa.Table) -> pa.Table:
        # vectorized partial count: Arrow group_by over the (few) distinct
        # (theme, geom_type) pairs — no per-row Python in the counting path
        g = (
            t.select(["theme", "geom_type"])
            .group_by(["theme", "geom_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "theme": g.column("theme").cast(pa.string()),
                "geom_type": g.column("geom_type").cast(pa.int32()),
                "n_partial": g.column("count_all").cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        themed_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["theme", "geom_type"])
        .aggregate(Sum("n_partial", alias_name="n"))
    )
