"""Minimal WKB (ISO well-known binary, little-endian) encoder/decoder.

Geometry values in the engine's Arrow tables are WKB ``binary`` columns
(SURVEY.md §1.2), matching the reference's WKB interchange
(reference tabular.py:13-14). Supported types: Point, LineString, Polygon,
MultiLineString, MultiPolygon — exactly what the handler emits.

Python-side geometry representation used across the engine:
* point: ``(x, y)`` tuple
* line: ``float64 ndarray (N, 2)``; multi-line: list of such arrays
* polygon: list of rings (each ``(N, 2)`` ndarray, closed: first == last);
  ring 0 = exterior, rest = holes
* multipolygon: list of polygons
"""

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTILINESTRING = 5
MULTIPOLYGON = 6

_HDR = struct.Struct("<BI")
_D2 = struct.Struct("<2d")
_U4 = struct.Struct("<I")


def point_wkb(x, y):
    return _HDR.pack(1, POINT) + _D2.pack(x, y)


def linestring_wkb(coords):
    coords = np.asarray(coords, dtype=np.float64)
    return _HDR.pack(1, LINESTRING) + _U4.pack(len(coords)) + coords.tobytes()


def multilinestring_wkb(lines):
    out = [_HDR.pack(1, MULTILINESTRING), _U4.pack(len(lines))]
    for ln in lines:
        out.append(linestring_wkb(ln))
    return b"".join(out)


def polygon_wkb(rings):
    out = [_HDR.pack(1, POLYGON), _U4.pack(len(rings))]
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        out.append(_U4.pack(len(r)))
        out.append(r.tobytes())
    return b"".join(out)


def multipolygon_wkb(polygons):
    out = [_HDR.pack(1, MULTIPOLYGON), _U4.pack(len(polygons))]
    for p in polygons:
        out.append(polygon_wkb(p))
    return b"".join(out)


def linestrings_wkb_vectorized(lons_list, lats_list, row_idx):
    """Batch-encode LINESTRING WKB for the selected rows of Arrow
    list<float64> coordinate columns — one byte-matrix scatter, no per-row
    Python. → (BinaryArray of len(row_idx), bbox ndarray (n,4))."""
    import pyarrow as pa

    if isinstance(lons_list, pa.ChunkedArray):
        lons_list = lons_list.combine_chunks()
    if isinstance(lats_list, pa.ChunkedArray):
        lats_list = lats_list.combine_chunks()
    offsets = lons_list.offsets.to_numpy(zero_copy_only=False)
    lon_vals = lons_list.values.to_numpy(zero_copy_only=False)
    lat_vals = lats_list.values.to_numpy(zero_copy_only=False)
    row_idx = np.asarray(row_idx, dtype=np.int64)
    n = len(row_idx)
    starts = offsets[row_idx]
    ends = offsets[row_idx + 1]
    npts = (ends - starts).astype(np.int64)
    total_pts = int(npts.sum())

    # gather selected points (ranges → flat indices)
    point_src = np.repeat(starts, npts) + (
        np.arange(total_pts) - np.repeat(np.concatenate([[0], np.cumsum(npts)[:-1]]), npts)
    )
    px = lon_vals[point_src]
    py = lat_vals[point_src]

    out_sizes = 9 + 16 * npts
    out_offsets = np.concatenate([[0], np.cumsum(out_sizes)]).astype(np.int64)
    buf = np.zeros(int(out_offsets[-1]), dtype=np.uint8)
    pos = out_offsets[:-1]
    buf[pos] = 1          # little endian
    buf[pos + 1] = LINESTRING
    counts_le = npts.astype("<u4").view(np.uint8).reshape(n, 4)
    buf[pos[:, None] + np.arange(5, 9)] = counts_le

    coord_bytes = np.stack([px, py], axis=1).astype("<f8").view(np.uint8).reshape(total_pts, 16)
    within = np.arange(total_pts) - np.repeat(np.concatenate([[0], np.cumsum(npts)[:-1]]), npts)
    base = np.repeat(pos + 9, npts) + 16 * within
    buf[base[:, None] + np.arange(16)] = coord_bytes

    import pyarrow as pa2

    if out_offsets[-1] <= np.iinfo(np.int32).max:
        arr = pa2.Array.from_buffers(
            pa2.binary(),
            n,
            [None, pa2.py_buffer(out_offsets.astype(np.int32).tobytes()), pa2.py_buffer(buf.tobytes())],
        )
    else:
        # >2 GiB of encoded bytes in one batch: int32 offsets would overflow
        arr = pa2.Array.from_buffers(
            pa2.large_binary(),
            n,
            [None, pa2.py_buffer(out_offsets.tobytes()), pa2.py_buffer(buf.tobytes())],
        )
    # per-row bbox via reduceat (guard empty rows)
    starts_flat = np.concatenate([[0], np.cumsum(npts)[:-1]])
    bbox = np.empty((n, 4), dtype=np.float64)
    if total_pts:
        bbox[:, 0] = np.minimum.reduceat(px, starts_flat)
        bbox[:, 1] = np.minimum.reduceat(py, starts_flat)
        bbox[:, 2] = np.maximum.reduceat(px, starts_flat)
        bbox[:, 3] = np.maximum.reduceat(py, starts_flat)
    return arr, bbox


def list_bboxes(lons_list, lats_list, row_idx):
    """Per-row bbox + first vertex for selected rows of Arrow list<float64>
    coordinate columns, straight from the list buffers (no per-row Python).
    → (bbox ndarray (n,4), first_x, first_y). Rows must be non-empty."""
    import pyarrow as pa

    if isinstance(lons_list, pa.ChunkedArray):
        lons_list = lons_list.combine_chunks()
    if isinstance(lats_list, pa.ChunkedArray):
        lats_list = lats_list.combine_chunks()
    offsets = lons_list.offsets.to_numpy(zero_copy_only=False)
    lon_vals = lons_list.values.to_numpy(zero_copy_only=False)
    lat_vals = lats_list.values.to_numpy(zero_copy_only=False)
    row_idx = np.asarray(row_idx, dtype=np.int64)
    starts = offsets[row_idx].astype(np.int64)
    ends = offsets[row_idx + 1].astype(np.int64)
    npts = ends - starts
    total = int(npts.sum())
    flat = np.repeat(starts, npts) + (
        np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(npts)[:-1]]), npts)
    )
    px = lon_vals[flat]
    py = lat_vals[flat]
    seg_starts = np.concatenate([[0], np.cumsum(npts)[:-1]])
    n = len(row_idx)
    bbox = np.empty((n, 4), dtype=np.float64)
    if total:
        bbox[:, 0] = np.minimum.reduceat(px, seg_starts)
        bbox[:, 1] = np.minimum.reduceat(py, seg_starts)
        bbox[:, 2] = np.maximum.reduceat(px, seg_starts)
        bbox[:, 3] = np.maximum.reduceat(py, seg_starts)
    return bbox, lon_vals[starts], lat_vals[starts]


def decode(buf):
    """→ (geom_type_code, python geometry as in the module docstring)."""
    val, _ = _decode_at(buf, 0)
    return val


def _decode_at(buf, off):
    endian, code = _HDR.unpack_from(buf, off)
    if endian != 1:
        raise ValueError("big-endian WKB not supported")
    off += _HDR.size
    if code == POINT:
        x, y = _D2.unpack_from(buf, off)
        return (POINT, (x, y)), off + 16
    if code == LINESTRING:
        (n,) = _U4.unpack_from(buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
        return (LINESTRING, arr.copy()), off + 16 * n
    if code == POLYGON:
        (nr,) = _U4.unpack_from(buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = _U4.unpack_from(buf, off)
            off += 4
            rings.append(
                np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2).copy()
            )
            off += 16 * n
        return (POLYGON, rings), off
    if code in (MULTILINESTRING, MULTIPOLYGON):
        (n,) = _U4.unpack_from(buf, off)
        off += 4
        parts = []
        for _ in range(n):
            (sub, off) = _decode_at(buf, off)
            parts.append(sub[1])
        return (code, parts), off
    raise ValueError("unsupported WKB type %d" % code)
