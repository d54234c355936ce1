"""AOI geometry loading (behavioral parity: reference geometry.py:5-54).

No shapely: geometries are plain multipolygon structures — a list of
polygons, each a list of rings (exterior first), each ring an (N,2) float64
NumPy array — consumable by ``functions.kernels.PreparedPolygon``.
"""

import json

import numpy as np

from osm_export_tool_python_ray.functions.kernels import PreparedPolygon, ensure_closed


def parse_poly(lines):
    """Osmosis polygon-filter file → multipolygon (reference geometry.py:5-41;
    format: first line junk, named sections of rings terminated by END,
    ``!``-prefixed section names are holes of the preceding polygon)."""
    in_ring = False
    coords = []
    ring = None
    for index, line in enumerate(lines):
        if index == 0:
            continue
        elif index == 1:
            coords.append([[], []])
            ring = coords[-1][0]
            in_ring = True
        elif in_ring and line.strip() == "END":
            in_ring = False
        elif in_ring:
            ring.append([float(v) for v in line.split()])
        elif not in_ring and line.strip() == "END":
            break
        elif not in_ring and line.startswith("!"):
            coords[-1][1].append([])
            ring = coords[-1][1][-1]
            in_ring = True
        elif not in_ring:
            coords.append([[], []])
            ring = coords[-1][0]
            in_ring = True

    polys = []
    for exterior, holes in coords:
        rings = [ensure_closed(np.asarray(exterior, dtype=np.float64))]
        for h in holes:
            rings.append(ensure_closed(np.asarray(h, dtype=np.float64)))
        polys.append(rings)
    return polys


def _shape_to_polygons(geom):
    t = geom["type"]
    if t == "Polygon":
        return [[ensure_closed(np.asarray(r, dtype=np.float64)) for r in geom["coordinates"]]]
    if t == "MultiPolygon":
        return [
            [ensure_closed(np.asarray(r, dtype=np.float64)) for r in poly]
            for poly in geom["coordinates"]
        ]
    raise ValueError("unsupported clip geometry type: %s" % t)


def load_geometry(txt):
    """GeoJSON (geometry / Feature / FeatureCollection-first-feature) or
    Osmosis POLY text → multipolygon (reference geometry.py:44-54)."""
    try:
        j = json.loads(txt)
        if j["type"] == "FeatureCollection":
            print("Warning: using first feature of --clip FeatureCollection.")
            return _shape_to_polygons(j["features"][0]["geometry"])
        if j["type"] == "Feature":
            return _shape_to_polygons(j["geometry"])
        return _shape_to_polygons(j)
    except json.decoder.JSONDecodeError:
        pass
    return parse_poly(txt.split("\n"))


def prepare(polygons):
    return PreparedPolygon(polygons)


def geometry_area(polygons):
    """Planar degrees² area analog of shapely ``geom.area`` — used by the
    OsmiumTool strategy threshold (reference sources.py:176)."""
    from osm_export_tool_python_ray.functions.kernels import signed_area

    total = 0.0
    for rings in polygons:
        total += abs(signed_area(rings[0]))
        for h in rings[1:]:
            total -= abs(signed_area(h))
    return total
