"""AOI spatial semi-join (SURVEY.md J4) — the engine's replacement for the
OsmExpress/OsmiumTool region-extract subprocesses (reference
sources.py:35-184): instead of cutting a PBF with an external tool, the
feature stream is filtered by a broadcast cell cover of the AOI plus an
exact geometry test.

Two phases per batch, both vectorized where possible:
1. coarse: ``cell ∈ cover(AOI)`` — the cover is a numpy array of cell ids
   computed once on the driver and shipped by closure (``ray.put`` for
   very large covers); a sorted-array ``searchsorted`` membership test.
2. exact: point features by strict/boundary-inclusive point status; line
   and polygon features by decoded-WKB intersection test (only the rows
   that survived the coarse filter).
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions import wkb as wkbmod
from osm_export_tool_python_ray.functions.cells import DEFAULT_RES, cover_polygon
from osm_export_tool_python_ray.functions.kernels import PreparedPolygon


class AoiSemiJoin:
    """features batch → rows intersecting the AOI. Built once on the
    driver; cover + prepared geometry ride the closure."""

    def __init__(self, aoi_polygons, res=DEFAULT_RES, boundary_counts=True):
        self.prep = PreparedPolygon(aoi_polygons)
        self.cover = np.sort(cover_polygon(self.prep, res=res).astype(np.uint64))
        self.boundary_counts = boundary_counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(self.cover, cells)
        pos_c = np.minimum(pos, max(len(self.cover) - 1, 0))
        coarse = (self.cover[pos_c] == cells) if len(self.cover) else np.zeros(n, dtype=bool)

        keep = np.zeros(n, dtype=bool)
        idx = np.nonzero(coarse)[0]
        if len(idx) == 0:
            return batch.filter(pa.array(keep))
        gt = batch.column("geom_type").to_numpy(zero_copy_only=False)[idx]
        # points: vectorized status test
        pts = idx[gt == 1]
        if len(pts):
            lon = batch.column("lon").to_numpy(zero_copy_only=False)[pts]
            lat = batch.column("lat").to_numpy(zero_copy_only=False)[pts]
            st = self.prep.point_status(lon, lat)
            keep[pts] = (st > 0) if self.boundary_counts else (st == 1)
        # lines / polygons: exact per-row intersection on decoded WKB
        others = idx[gt != 1]
        if len(others):
            wkbs = batch.column("wkb").take(pa.array(others)).to_pylist()
            for j, buf in zip(others, wkbs):
                code, geom = wkbmod.decode(buf)
                if code == wkbmod.LINESTRING:
                    keep[j] = self.prep.intersects_line(geom)
                elif code == wkbmod.MULTILINESTRING:
                    keep[j] = any(self.prep.intersects_line(g) for g in geom)
                elif code == wkbmod.POLYGON:
                    keep[j] = self.prep.intersects_polygon([geom])
                elif code == wkbmod.MULTIPOLYGON:
                    keep[j] = self.prep.intersects_polygon(geom)
        return batch.filter(pa.array(keep))


def aoi_semi_join(features_ds, aoi_polygons, res=DEFAULT_RES):
    return features_ds.map_batches(
        AoiSemiJoin(aoi_polygons, res=res), batch_format="pyarrow"
    )
