"""Slippy-map (XYZ) raster tile math, vectorized.

Replaces landez's tile coverage of the AOI bbox (reference
nontabular.py:103-108): ``tile_cover`` enumerates the z/x/y tiles the
MBTiles builder would download; ``tiles_of_points`` / ``tile_range_of_bbox``
drive the raster↔vector assignment join (SURVEY.md J5)."""

import numpy as np

from osm_export_tool_python_ray.functions.quantize import qfloor


def lonlat_to_tile(lon, lat, z):
    """Vectorized lon/lat → (x, y) tile indices at zoom z (WebMercator).

    The y row uses arcsinh(tan(lat)) while the DuckDB oracle twin uses
    the ln(tan+sec) identity — DIFFERENT libm chains, so the bin floor
    goes through the boundary-safe qfloor (functions/quantize.py): a
    point within 1e-9 of a tile edge lands in the upper tile on both
    sides instead of flipping with the libm version. x is rational
    arithmetic (correctly-rounded IEEE on both sides, bit-identical) and
    keeps the plain floor."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    n = float(1 << z)
    x = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, (1 << z) - 1)
    lat_r = np.radians(lat)
    y = np.clip(
        qfloor((1.0 - np.arcsinh(np.tan(lat_r)) / np.pi) / 2.0 * n, "tile_y"),
        0,
        (1 << z) - 1,
    )
    return x, y


def tile_bounds(z, x, y):
    """Tile → (west, south, east, north) degrees."""
    n = float(1 << z)
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0
    north = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    south = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
    return west, south, east, north


def tile_cover(minlon, minlat, maxlon, maxlat, minzoom, maxzoom):
    """All (z,x,y) covering the bbox for each zoom in [minzoom, maxzoom]
    (mirrors landez MBTilesBuilder coverage, reference nontabular.py:105-106)."""
    out = []
    for z in range(minzoom, maxzoom + 1):
        x0, y1 = lonlat_to_tile(np.array([minlon]), np.array([minlat]), z)
        x1, y0 = lonlat_to_tile(np.array([maxlon]), np.array([maxlat]), z)
        xs = np.arange(int(x0[0]), int(x1[0]) + 1)
        ys = np.arange(int(y0[0]), int(y1[0]) + 1)
        gx, gy = np.meshgrid(xs, ys)
        zcol = np.full(gx.size, z, dtype=np.int64)
        out.append(np.stack([zcol, gx.ravel(), gy.ravel()], axis=1))
    return np.vstack(out)


def tile_key(z, x, y):
    """Pack (z,x,y) into one int64 shuffle key."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (z << 58) | (x << 29) | y


def tile_unkey(k):
    k = np.asarray(k, dtype=np.int64)
    return k >> 58, (k >> 29) & ((1 << 29) - 1), k & ((1 << 29) - 1)
