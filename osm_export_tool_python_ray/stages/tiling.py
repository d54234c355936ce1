"""Raster↔vector tile assignment (SURVEY.md J5, reference S12).

The reference's MBTiles path downloads the XYZ tiles covering the AOI bbox
(landez, reference nontabular.py:103-108). Here tiles are first-class rows
(``kind='tile'`` spans carrying ``z/x/y`` payload refs) and the engine
computes, for every tile, the features it contains — a spatial equi-join on
the packed tile key:

    features ─ flat-map → (tkey, osm_id) per overlapping tile ┐
    tiles    ─ dedup by tkey ─────────────────────────────────┤ union →
                      groupby(tkey % salt-aware bucket) → per-tile sorted
                      feature-id lists (only for tiles that exist)

ONE shuffle (the groupby); the feature→tile expansion is vectorized
numpy (bbox → tile ranges). Overlap rule: feature bbox ∩ tile bbox at the
tile's zoom; points land in exactly one tile per zoom.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osm_export_tool_python_ray.functions.tiles import lonlat_to_tile, tile_key

# what the assignment exchange actually moves: the union of
# FeatureTileExpander and _tile_side rows plus the bucket column — all
# flat, ~50 bytes/row, the "light payload" class of the exchange A/B
TILE_EXCHANGE_SCHEMA = pa.schema(
    [
        ("tkey", pa.int64()),
        ("osm_id", pa.int64()),
        ("media_ref", pa.string()),
        ("side", pa.int8()),
        ("bucket", pa.int32()),
    ]
)

ASSIGNMENT_SCHEMA = pa.schema(
    [
        ("tile_z", pa.int64()),
        ("tile_x", pa.int64()),
        ("tile_y", pa.int64()),
        ("media_ref", pa.string()),
        ("feature_ids", pa.list_(pa.int64())),
        ("n_features", pa.int64()),
        ("truncated", pa.bool_()),
    ]
)


class FeatureTileExpander:
    """features batch → (tkey, osm_id) rows for every tile the feature's
    bbox overlaps, per zoom level in ``zooms`` (broadcast small side).
    ``carry``: optional extra feature column to ride the expansion (e.g.
    the theme for per-(tile, theme) rollups) — gathered by row index, so
    any Arrow type works without a per-row Python loop."""

    def __init__(self, zooms, carry=None):
        self.zooms = sorted(set(int(z) for z in zooms))
        self.carry = carry

    def __call__(self, batch: pa.Table) -> pa.Table:
        osm_id = batch.column("osm_id").to_numpy(zero_copy_only=False)
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        out_k = []
        out_id = []
        out_row = []
        for z in self.zooms:
            x0, y1 = lonlat_to_tile(minx, miny, z)   # miny → larger y
            x1, y0 = lonlat_to_tile(maxx, maxy, z)
            nx = (x1 - x0 + 1).astype(np.int64)
            ny = (y1 - y0 + 1).astype(np.int64)
            per = nx * ny
            single = per == 1
            # fast path: single-tile features (the overwhelming majority)
            out_k.append(tile_key(np.full(single.sum(), z), x0[single], y0[single]))
            out_id.append(osm_id[single])
            out_row.append(np.nonzero(single)[0])
            for i in np.nonzero(~single)[0]:
                xs = np.arange(x0[i], x1[i] + 1, dtype=np.int64)
                ys = np.arange(y0[i], y1[i] + 1, dtype=np.int64)
                gx, gy = np.meshgrid(xs, ys)
                k = tile_key(np.full(gx.size, z), gx.ravel(), gy.ravel())
                out_k.append(k)
                out_id.append(np.full(gx.size, osm_id[i]))
                out_row.append(np.full(gx.size, i))
        tk = np.concatenate(out_k) if out_k else np.array([], dtype=np.int64)
        ids = np.concatenate(out_id) if out_id else np.array([], dtype=np.int64)
        cols = {
            "tkey": pa.array(tk),
            "osm_id": pa.array(ids),
            "media_ref": pa.nulls(len(tk), type=pa.string()),
            "side": pa.array(np.zeros(len(tk), dtype=np.int8)),
        }
        if self.carry:
            rows = (
                np.concatenate(out_row) if out_row else np.array([], dtype=np.int64)
            )
            col = batch.column(self.carry)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[self.carry] = col.take(pa.array(rows.astype(np.int64)))
        return pa.table(cols)


def _tile_side(batch: pa.Table) -> pa.Table:
    """tile rows → union-schema rows (side=1)."""
    n = batch.num_rows
    return pa.table(
        {
            "tkey": batch.column("tkey"),
            "osm_id": pa.nulls(n, type=pa.int64()),
            "media_ref": batch.column("media_ref"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
        }
    )


def _assign_group(group: pa.Table, max_features_per_tile=1_000_000) -> pa.Table:
    """One bucket of (tkey, osm_id|media_ref, side) rows → assignment rows
    for tiles present on side 1. Vectorized per bucket.

    Hot-tile guard: lists are capped at ``max_features_per_tile`` (keeping
    the smallest osm_ids — deterministic) with ``truncated`` flagged and
    ``n_features`` still reporting the TRUE count, so downstream can see
    the overflow instead of silently OOMing on a degenerate tile."""
    tk = group.column("tkey").to_numpy(zero_copy_only=False)
    side = group.column("side").to_numpy(zero_copy_only=False)
    osm = group.column("osm_id").to_numpy(zero_copy_only=False)

    tile_rows = np.nonzero(side == 1)[0]
    if len(tile_rows) == 0:
        return pa.table({name: pa.array([], type=t) for name, t in zip(ASSIGNMENT_SCHEMA.names, ASSIGNMENT_SCHEMA.types)})
    tile_keys, first_tile = np.unique(tk[tile_rows], return_index=True)
    media = group.column("media_ref").take(pa.array(tile_rows[first_tile]))

    feat_rows = np.nonzero(side == 0)[0]
    ftk = tk[feat_rows]
    fosm = osm[feat_rows]
    # keep only features on existing tiles; sort by (tkey, osm_id)
    pos = np.searchsorted(tile_keys, ftk)
    pos_c = np.minimum(pos, len(tile_keys) - 1)
    keep = tile_keys[pos_c] == ftk
    ftk, fosm = ftk[keep], fosm[keep].astype(np.int64)
    order = np.lexsort((fosm, ftk))
    ftk, fosm = ftk[order], fosm[order]

    counts = np.searchsorted(ftk, tile_keys, side="right") - np.searchsorted(
        ftk, tile_keys, side="left"
    )
    starts_per_tile = np.searchsorted(ftk, tile_keys, side="left")
    kept = np.minimum(counts, max_features_per_tile)
    truncated = counts > max_features_per_tile
    if truncated.any():
        sel = np.concatenate(
            [np.arange(s_, s_ + k) for s_, k in zip(starts_per_tile, kept)]
        ) if len(kept) else np.array([], dtype=np.int64)
        fosm = fosm[sel]
    offsets = pa.array(np.concatenate([[0], np.cumsum(kept)]).astype(np.int32))
    ids = pa.ListArray.from_arrays(offsets, pa.array(fosm))
    z = (tile_keys >> 58).astype(np.int64)
    x = ((tile_keys >> 29) & ((1 << 29) - 1)).astype(np.int64)
    y = (tile_keys & ((1 << 29) - 1)).astype(np.int64)
    return pa.table(
        {
            "tile_z": pa.array(z),
            "tile_x": pa.array(x),
            "tile_y": pa.array(y),
            "media_ref": media,
            "feature_ids": ids,
            "n_features": pa.array(counts.astype(np.int64)),
            "truncated": pa.array(truncated),
        }
    )


def assign_features_to_tiles(features_ds, tiles_ds, zooms, num_buckets=64, max_features_per_tile=1_000_000):
    """→ one row per existing tile with its sorted feature osm_id list.

    ``zooms``: the zoom levels present in the tile table (small, computed
    once on the driver and broadcast in the expander closure).
    ``max_features_per_tile``: hot-tile cap (see _assign_group)."""
    feats = features_ds.map_batches(
        FeatureTileExpander(zooms), batch_format="pyarrow"
    )
    tiles = tiles_ds.map_batches(_tile_side, batch_format="pyarrow")

    def bucketer(t: pa.Table) -> pa.Table:
        tk = t.column("tkey").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((tk % num_buckets).astype(np.int32)))

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    # the tile exchange moves LIGHT flat rows (tkey + ids + short ref) —
    # the payload class where the hash exchange measured ~2x faster than
    # sort at the 24,576-shard corpus (6-7s vs 10-13s at 32 cpus). The
    # schema hint lets choose_strategy() pick that measured winner; the
    # export's heavy nested payloads resolve the other way (see
    # stages/exchange.py for the full A/B).
    return grouped_map(
        feats.union(tiles).map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: _assign_group(g.drop_columns(["bucket"]), max_features_per_tile),
        num_partitions=min(num_buckets, 32),
        payload_schema=TILE_EXCHANGE_SCHEMA,
    )


def tile_theme_counts(features_ds, tiles_ds, zooms, num_buckets=64):
    """Composed geospatial rollup: per-(tile, theme) counts of themed
    features overlapping each EXISTING tile — the raster↔vector
    assignment (J5) joined with the theme routing (M3/A2) in the SAME
    single light-row exchange the plain assignment uses (the theme string
    rides the expansion rows; no second shuffle, no per-tile feature-id
    lists to carry). Only (tile, theme) pairs with ≥1 overlap are
    emitted. ``features_ds`` needs (osm_id, theme, minx..maxy)."""
    feats = features_ds.map_batches(
        FeatureTileExpander(zooms, carry="theme"), batch_format="pyarrow"
    )

    def tile_side_themed(batch: pa.Table) -> pa.Table:
        t = _tile_side(batch)
        return t.append_column("theme", pa.nulls(t.num_rows, type=pa.string()))

    tiles = tiles_ds.map_batches(tile_side_themed, batch_format="pyarrow")

    def bucketer(t: pa.Table) -> pa.Table:
        tk = t.column("tkey").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((tk % num_buckets).astype(np.int32)))

    def count_group(group: pa.Table) -> pa.Table:
        tk = group.column("tkey").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        tile_keys = np.unique(tk[side == 1])
        feat_rows = np.nonzero(side == 0)[0]
        ftk = tk[feat_rows]
        if len(tile_keys) == 0 or len(ftk) == 0:
            return pa.table(
                {
                    "tile_z": pa.array([], type=pa.int64()),
                    "tile_x": pa.array([], type=pa.int64()),
                    "tile_y": pa.array([], type=pa.int64()),
                    "theme": pa.array([], type=pa.string()),
                    "n_features": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(tile_keys, ftk)
        keep = tile_keys[np.minimum(pos, len(tile_keys) - 1)] == ftk
        kept = pa.table(
            {
                "tkey": pa.array(ftk[keep]),
                "theme": group.column("theme").take(pa.array(feat_rows[keep])),
            }
        )
        agg = kept.group_by(["tkey", "theme"]).aggregate([("tkey", "count")])
        k = agg.column("tkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_z": pa.array((k >> 58).astype(np.int64)),
                "tile_x": pa.array(((k >> 29) & ((1 << 29) - 1)).astype(np.int64)),
                "tile_y": pa.array((k & ((1 << 29) - 1)).astype(np.int64)),
                "theme": agg.column("theme"),
                "n_features": agg.column("tkey_count").cast(pa.int64()),
            }
        )

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    schema = TILE_EXCHANGE_SCHEMA.append(pa.field("theme", pa.string()))
    return grouped_map(
        feats.union(tiles).map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        lambda g: count_group(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
        payload_schema=schema,
    )


def dedup_tiles(tiles_ds, num_buckets=16):
    """Tile payload rows may repeat across docs; keep one per tkey
    (min doc_id/offset, deterministic)."""

    def bucketer(t: pa.Table) -> pa.Table:
        tk = t.column("tkey").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((tk % num_buckets).astype(np.int32)))

    def first(g: pa.Table) -> pa.Table:
        g = g.sort_by([("tkey", "ascending"), ("doc_id", "ascending"), ("offset", "ascending")])
        tk = g.column("tkey").to_numpy(zero_copy_only=False)
        keep = np.ones(len(tk), dtype=bool)
        keep[1:] = tk[1:] != tk[:-1]
        return g.filter(pa.array(keep)).drop_columns(["bucket"])

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    return grouped_map(
        tiles_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        first,
        num_partitions=min(num_buckets, 32),
    )
