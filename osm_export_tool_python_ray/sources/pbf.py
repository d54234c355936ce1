"""Pure-Python/numpy ``.osm.pbf`` source and fixture writer.

The reference tool's ONLY input format is ``planet.osm.pbf`` (reference
sources.py:24-32 shells out to osmium/osmosis around it; cmd.py:58 feeds
it straight to the tabular handler). This module closes that gap without
any external codec: an OSM PBF file is a framed sequence of protobuf
blobs whose heavy payloads are *packed varint arrays* — varint decoding
vectorizes in numpy, zlib is stdlib, and the remaining message structure
is a few dozen tiny headers per 8k-element block, so a pure-Python
walker around numpy array decodes stays I/O-bound.

Format (public: https://wiki.openstreetmap.org/wiki/PBF_Format):

    file   := (int32_be header_len, BlobHeader, Blob)*
    BlobHeader := { 1: type "OSMHeader"|"OSMData", 3: datasize }
    Blob   := { 1: raw } | { 2: raw_size, 3: zlib_data }
    OSMData payload := PrimitiveBlock {
        1: StringTable { 1: repeated bytes },
        2: repeated PrimitiveGroup {
            2: DenseNodes { 1: packed sint64 id (delta),
                            8/9: packed sint64 lat/lon (delta),
                            10: packed int32 keys_vals (0-delimited) },
            3: repeated Way { 1: id, 2/3: packed key/val string ids,
                              8: packed sint64 refs (delta) },
            4: repeated Relation { 1: id, 2/3: keys/vals,
                                   8: packed roles_sid,
                                   9: packed sint64 memids (delta),
                                   10: packed member types 0|1|2 } },
        17: granularity (default 100), 19/20: lat/lon_offset }
    coordinate := 1e-9 * (offset + granularity * stored)

Scale shape (Ray-Data-first): ``scan_blob_ranges`` reads ONLY the ~20-byte
BlobHeaders on the driver (seek-skip over payloads — indexing a 70 GB
planet file touches a few hundred KB), then ``read_osm_pbf`` fans the
blob byte-ranges out as a Dataset; each task opens the file, reads its
own ranges, and decodes independently — thousands of parallel units for
a planet file, no driver materialization, no shared state. Output is the
engine's canonical element table (sources/corpus.py ELEMENT_SCHEMA plus
the ``ekey`` dedup key), i.e. exactly what ``stages/explode.py`` emits
from the parquet corpus, so every downstream stage is shared.

Coordinate exactness: nodes store nanodegrees; the decoder converts with
ONE correctly-rounded int→float division (``nano / 1e9``), so any
coordinate on the 1e-7 grid — all real OSM data, and the synthetic
corpus's ``round(x, 7)`` values — round-trips BIT-EXACTLY through
write→read (proven by tests/test_pbf.py equivalence of a full export
over pbf vs parquet).

The writer exists for fixtures and as the export-side complement
(deterministic: same elements ⇒ same bytes); it is driver-side Python —
fixture-scale, not the 100 TB path.
"""

import bz2
import lzma
import struct
import zlib

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.sources.corpus import ELEMENT_SCHEMA, MEMBER_TYPE

_MEMBER_TYPE_NAMES = ("node", "way", "relation")
_MEMBER_TYPE_CODES = {"node": 0, "way": 1, "relation": 2}
_KIND_CODE = {"node": 0, "way": 1, "relation": 2}


# --------------------------------------------------------------- varints

def decode_varints(buf):
    """All varints packed back-to-back in ``buf`` → uint64 array.

    Vectorized: terminator bytes (high bit clear) mark varint ends; each
    byte contributes its low 7 bits shifted by 7·(position within its
    varint); disjoint-bit groups fold with one ``np.add.reduceat``."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.array([], dtype=np.uint64)
    ends = np.nonzero(b < 0x80)[0]
    if len(ends) == 0 or ends[-1] != len(b) - 1:
        raise ValueError("truncated varint in packed field")
    starts = np.concatenate([[0], ends[:-1] + 1]).astype(np.int64)
    lens = ends - starts + 1
    if lens.max() > 10:
        raise ValueError("varint longer than 10 bytes")
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
    vals = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    return np.add.reduceat(vals, starts)


def _decode_varints_multi(payloads):
    """Decode MANY packed-varint payloads in ONE numpy pass (the per-way
    refs/keys/vals fields are tiny — per-call numpy overhead dominated
    the decode profile at 120k calls/blob-set). Returns (values, counts):
    all varints concatenated, and how many came from each payload."""
    if not payloads:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    bufs = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
    lens = np.array([len(x) for x in bufs], dtype=np.int64)
    b = np.concatenate(bufs) if len(bufs) > 1 else bufs[0]
    if len(b) == 0:
        return np.array([], dtype=np.uint64), np.zeros(len(bufs), np.int64)
    ends = np.nonzero(b < 0x80)[0]
    offs = np.concatenate([[0], np.cumsum(lens)])
    nz = lens > 0
    if len(ends) == 0 or not np.array_equal(
        np.isin(offs[1:][nz] - 1, ends), np.ones(int(nz.sum()), dtype=bool)
    ):
        raise ValueError("truncated varint in packed field")
    starts = np.concatenate([[0], ends[:-1] + 1]).astype(np.int64)
    vlens = ends - starts + 1
    if vlens.max() > 10:
        raise ValueError("varint longer than 10 bytes")
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, vlens)
    vals = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    values = np.add.reduceat(vals, starts)
    counts = np.searchsorted(ends, offs[1:], side="left") - np.searchsorted(
        ends, offs[:-1], side="left"
    )
    return values, counts


def _segmented_cumsum(v, counts):
    """Per-segment cumulative sum (delta decode across many elements)."""
    if not len(v):
        return v
    cs = np.cumsum(v)
    starts = np.cumsum(counts) - counts
    nzs = counts > 0
    base = np.zeros(len(counts), dtype=cs.dtype)
    base[nzs & (starts > 0)] = cs[starts[nzs & (starts > 0)] - 1]
    return cs - np.repeat(base, counts)


def unzigzag(u):
    """Packed sint64 zigzag → int64 (vectorized)."""
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))).astype(
        np.int64
    )


def _read_varint(mv, i):
    r = 0
    s = 0
    while True:
        byte = mv[i]
        i += 1
        r |= (byte & 0x7F) << s
        if byte < 0x80:
            return r, i
        s += 7
        if s > 63:
            raise ValueError("varint overflow")


def iter_fields(mv):
    """Minimal protobuf walker: yields (field_no, wire_type, value);
    value is an int for wire 0, a memoryview for wire 1/2/5."""
    mv = memoryview(mv)
    i, n = 0, len(mv)
    while i < n:
        key, i = _read_varint(mv, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(mv, i)
        elif wt == 2:
            ln, i = _read_varint(mv, i)
            v = mv[i : i + ln]
            i += ln
            if len(v) != ln:
                raise ValueError("truncated length-delimited field")
        elif wt == 5:
            v = mv[i : i + 4]
            i += 4
        elif wt == 1:
            v = mv[i : i + 8]
            i += 8
        else:
            raise ValueError("unsupported wire type %d" % wt)
        yield fno, wt, v


# ---------------------------------------------------------------- reader

def scan_blob_ranges(path):
    """Driver-side blob index: [(type, payload_offset, datasize)].
    Reads only the 4-byte lengths + BlobHeaders; payloads are seek-skipped
    (a planet-scale file indexes in a few hundred KB of reads)."""
    out = []
    with open(path, "rb") as f:
        while True:
            hb = f.read(4)
            if not hb:
                break
            if len(hb) < 4:
                raise ValueError("truncated BlobHeader length")
            hl = struct.unpack(">I", hb)[0]
            hdr = f.read(hl)
            if len(hdr) < hl:
                raise ValueError("truncated BlobHeader")
            btype, datasize = None, None
            for fno, _wt, v in iter_fields(hdr):
                if fno == 1:
                    btype = bytes(v).decode("utf-8")
                elif fno == 3:
                    datasize = v
            if btype is None or datasize is None:
                raise ValueError("BlobHeader missing type/datasize")
            off = f.tell()
            out.append((btype, off, datasize))
            f.seek(off + datasize)
    return out


def _blob_payload(blob_bytes):
    """Blob → decompressed payload. raw/zlib/lzma/bzip2 are supported
    (all stdlib); lz4/zstd blobs raise a clear error naming the codec
    instead of mis-parsing."""
    raw = None
    for fno, _wt, v in iter_fields(blob_bytes):
        if fno == 1:
            raw = bytes(v)
        elif fno == 3:
            raw = zlib.decompress(bytes(v))
        elif fno == 4:
            raw = lzma.decompress(bytes(v))
        elif fno == 5:
            raw = bz2.decompress(bytes(v))
        elif fno in (6, 7):
            raise ValueError(
                "unsupported Blob compression (%s); re-encode with zlib"
                % {6: "lz4", 7: "zstd"}[fno]
            )
    if raw is None:
        raise ValueError("Blob carries no payload field")
    return raw


_SUPPORTED_FEATURES = {"OsmSchema-V0.6", "DenseNodes"}


def check_header(path):
    """Parse the OSMHeader blob and raise on required_features this
    reader does not implement (the PBF spec's mandated rejection rule —
    e.g. HistoricalInformation files carry deleted-element semantics a
    plain reader would silently miscount)."""
    with open(path, "rb") as f:
        for btype, off, size in scan_blob_ranges(path):
            if btype != "OSMHeader":
                continue
            f.seek(off)
            payload = _blob_payload(f.read(size))
            required = [
                bytes(v).decode("utf-8")
                for fno, _wt, v in iter_fields(payload)
                if fno == 4
            ]
            unsupported = [r for r in required if r not in _SUPPORTED_FEATURES]
            if unsupported:
                raise ValueError(
                    "pbf requires unsupported features: %s" % unsupported
                )
            return required
    return []


def _kv_tags(kv, strings, n_nodes):
    """DenseNodes keys_vals (0-delimited interleaved ids) → per-node
    [(k, v)] lists. Empty kv ⇒ all nodes untagged."""
    tags = [[] for _ in range(n_nodes)]
    if len(kv) == 0:
        return tags
    node = 0
    i = 0
    L = len(kv)
    while i < L:
        if kv[i] == 0:
            node += 1
            i += 1
            continue
        tags[node].append((strings[kv[i]], strings[kv[i + 1]]))
        i += 2
    return tags


def decode_primitive_block(payload, doc_id):
    """One OSMData payload → element table (ELEMENT_SCHEMA + ekey),
    matching stages/explode.py conventions exactly: NaN lon/lat for
    ways/relations, refs null except ways, members null except
    relations, ``offset`` = element sequence within the blob."""
    strings = []
    groups = []
    gran, lat_off, lon_off = 100, 0, 0
    for fno, _wt, v in iter_fields(payload):
        if fno == 1:
            for f2, _w2, s in iter_fields(v):
                if f2 == 1:
                    strings.append(bytes(s).decode("utf-8"))
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            gran = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v

    ids, kinds, tags_col, lons, lats, refs_col, members_col = (
        [], [], [], [], [], [], [],
    )

    way_msgs = []  # (id, keys_payload, vals_payload, refs_payload)
    rel_msgs = []  # (id, keys, vals, roles, memids, types)

    def _extend_dense(nid, lon_v, lat_v, ntags):
        # vectorized bulk append — the dense path carries ~8k nodes per
        # group; per-node Python appends were the decode hot spot
        ids.extend(nid.tolist())
        kinds.extend(["node"] * len(nid))
        tags_col.extend(ntags)
        lons.extend(lon_v.tolist())
        lats.extend(lat_v.tolist())
        refs_col.extend([None] * len(nid))
        members_col.extend([None] * len(nid))

    for g in groups:
        for fno, _wt, v in iter_fields(g):
            if fno == 2:  # DenseNodes
                nid = lat_q = lon_q = None
                kv = np.array([], dtype=np.int64)
                for f2, _w2, v2 in iter_fields(v):
                    if f2 == 1:
                        nid = np.cumsum(unzigzag(decode_varints(v2)))
                    elif f2 == 8:
                        lat_q = np.cumsum(unzigzag(decode_varints(v2)))
                    elif f2 == 9:
                        lon_q = np.cumsum(unzigzag(decode_varints(v2)))
                    elif f2 == 10:
                        kv = decode_varints(v2).astype(np.int64)
                if nid is None:
                    continue
                # ONE correctly-rounded division: nanodegree int → float64
                lat_v = (lat_off + gran * lat_q) / 1e9
                lon_v = (lon_off + gran * lon_q) / 1e9
                _extend_dense(nid, lon_v, lat_v, _kv_tags(kv, strings, len(nid)))
            elif fno == 1:  # plain (non-dense) Node
                nid = latg = long_ = None
                keys = vals = np.array([], dtype=np.uint64)
                for f2, _w2, v2 in iter_fields(v):
                    if f2 == 1:
                        nid = int(unzigzag(np.array([v2], dtype=np.uint64))[0])
                    elif f2 == 2:
                        keys = decode_varints(v2)
                    elif f2 == 3:
                        vals = decode_varints(v2)
                    elif f2 == 8:
                        latg = int(unzigzag(np.array([v2], dtype=np.uint64))[0])
                    elif f2 == 9:
                        long_ = int(unzigzag(np.array([v2], dtype=np.uint64))[0])
                ids.append(nid)
                kinds.append("node")
                tags_col.append(
                    [(strings[int(k)], strings[int(x)]) for k, x in zip(keys, vals)]
                )
                lats.append((lat_off + gran * latg) / 1e9)
                lons.append((lon_off + gran * long_) / 1e9)
                refs_col.append(None)
                members_col.append(None)
            elif fno == 3:  # Way — collect payloads, bulk-decode below
                wid = None
                kp = vp = rp = b""
                for f2, _w2, v2 in iter_fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        kp = v2
                    elif f2 == 3:
                        vp = v2
                    elif f2 == 8:
                        rp = v2
                way_msgs.append((wid, kp, vp, rp))
            elif fno == 4:  # Relation — collect payloads, bulk-decode below
                rid = None
                kp = vp = rlp = mp = tp = b""
                for f2, _w2, v2 in iter_fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        kp = v2
                    elif f2 == 3:
                        vp = v2
                    elif f2 == 8:
                        rlp = v2
                    elif f2 == 9:
                        mp = v2
                    elif f2 == 10:
                        tp = v2
                rel_msgs.append((rid, kp, vp, rlp, mp, tp))

    if way_msgs:
        wkeys, wkc = _decode_varints_multi([m[1] for m in way_msgs])
        wvals, _wvc = _decode_varints_multi([m[2] for m in way_msgs])
        wrefs_z, wrc = _decode_varints_multi([m[3] for m in way_msgs])
        wrefs = _segmented_cumsum(unzigzag(wrefs_z), wrc)
        ko = np.cumsum(wkc) - wkc
        ro = np.cumsum(wrc) - wrc
        wk_l = wkeys.astype(np.int64).tolist()
        wv_l = wvals.astype(np.int64).tolist()
        wr_l = wrefs.tolist()
        for j, (wid, _kp, _vp, _rp) in enumerate(way_msgs):
            ids.append(wid)
            kinds.append("way")
            k0, k1 = int(ko[j]), int(ko[j] + wkc[j])
            tags_col.append(
                [
                    (strings[wk_l[i]], strings[wv_l[i]])
                    for i in range(k0, k1)
                ]
            )
            lons.append(np.nan)
            lats.append(np.nan)
            refs_col.append(wr_l[int(ro[j]) : int(ro[j] + wrc[j])])
            members_col.append(None)
    if rel_msgs:
        rkeys, rkc = _decode_varints_multi([m[1] for m in rel_msgs])
        rvals, _rvc = _decode_varints_multi([m[2] for m in rel_msgs])
        rroles, rrc = _decode_varints_multi([m[3] for m in rel_msgs])
        rmids_z, rmc = _decode_varints_multi([m[4] for m in rel_msgs])
        rtypes, _rtc = _decode_varints_multi([m[5] for m in rel_msgs])
        rmids = _segmented_cumsum(unzigzag(rmids_z), rmc)
        ko = np.cumsum(rkc) - rkc
        mo = np.cumsum(rmc) - rmc
        rk_l = rkeys.astype(np.int64).tolist()
        rv_l = rvals.astype(np.int64).tolist()
        rr_l = rroles.astype(np.int64).tolist()
        rm_l = rmids.tolist()
        rt_l = rtypes.astype(np.int64).tolist()
        for j, (rid, _kp, _vp, _rlp, _mp, _tp) in enumerate(rel_msgs):
            ids.append(rid)
            kinds.append("relation")
            k0, k1 = int(ko[j]), int(ko[j] + rkc[j])
            tags_col.append(
                [
                    (strings[rk_l[i]], strings[rv_l[i]])
                    for i in range(k0, k1)
                ]
            )
            lons.append(np.nan)
            lats.append(np.nan)
            refs_col.append(None)
            m0, m1 = int(mo[j]), int(mo[j] + rmc[j])
            members_col.append(
                [
                    {
                        "type": _MEMBER_TYPE_NAMES[rt_l[i]],
                        "ref": rm_l[i],
                        "role": strings[rr_l[i]],
                    }
                    for i in range(m0, m1)
                ]
            )

    n = len(ids)
    from osm_export_tool_python_ray.stages.explode import element_key

    kind_codes = np.array([_KIND_CODE[k] for k in kinds], dtype=np.int64)
    eid = np.array(ids, dtype=np.int64)
    return pa.table(
        {
            "ekey": pa.array(
                element_key(kind_codes, eid) if n else np.array([], dtype=np.int64)
            ),
            "element_id": pa.array(eid),
            "kind": pa.array(kinds, type=pa.string()),
            "tags": pa.array(tags_col, type=pa.map_(pa.string(), pa.string())),
            "lon": pa.array(np.array(lons, dtype=np.float64), type=pa.float64()),
            "lat": pa.array(np.array(lats, dtype=np.float64), type=pa.float64()),
            "refs": pa.array(refs_col, type=pa.list_(pa.int64())),
            "members": pa.array(members_col, type=pa.list_(MEMBER_TYPE)),
            "doc_id": pa.array([doc_id] * n, type=pa.string()),
            "offset": pa.array(np.arange(n, dtype=np.int32), type=pa.int32()),
            "media_ref": pa.nulls(n, type=pa.string()),
        }
    )


def decode_file(path):
    """Whole-file decode on the calling process (tests/small extracts):
    concatenated element table across all OSMData blobs."""
    check_header(path)
    tables = []
    with open(path, "rb") as f:
        for i, (btype, off, size) in enumerate(scan_blob_ranges(path)):
            if btype != "OSMData":
                continue
            f.seek(off)
            payload = _blob_payload(f.read(size))
            tables.append(decode_primitive_block(payload, "pbf:%06d" % i))
    if not tables:
        sch = decode_primitive_block(b"", "pbf:000000").schema
        return pa.Table.from_arrays(
            [pa.array([], type=t) for t in sch.types], schema=sch
        )
    return pa.concat_tables(tables)


def read_osm_pbf(path, blobs_per_task=4):
    """``.osm.pbf`` path, glob, or list of paths → Ray Dataset of
    elements (ELEMENT_SCHEMA + ekey).

    The driver reads only blob headers; decode fans out one task per
    ``blobs_per_task`` blobs (a planet file yields thousands of units;
    a sharded planet — many part files — fans out across files too).
    Paths must be CLUSTER-VISIBLE (shared filesystem / object store) —
    each decode task opens its own byte range, the same contract as
    ``ray.data.read_parquet``. Feed the result to
    ``pipelines.export.run_export(elements_ds=...)``."""
    import glob as _glob

    import ray.data

    if isinstance(path, (list, tuple)):
        paths = list(path)
    elif any(ch in str(path) for ch in "*?["):
        paths = sorted(_glob.glob(str(path)))
        if not paths:
            raise FileNotFoundError("no .pbf files match %r" % path)
    else:
        paths = [path]
    metas = []
    for fi, p in enumerate(paths):
        check_header(p)
        for i, (btype, off, size) in enumerate(scan_blob_ranges(p)):
            if btype == "OSMData":
                metas.append(
                    {
                        "path": p,
                        "offset": off,
                        "datasize": size,
                        "blob_idx": fi * 1_000_000 + i,
                    }
                )
    path = paths[0]

    def decode_rows(t: pa.Table) -> pa.Table:
        tables = []
        paths = t.column("path").to_pylist()
        offs = t.column("offset").to_pylist()
        sizes = t.column("datasize").to_pylist()
        idxs = t.column("blob_idx").to_pylist()
        for p, off, size, i in zip(paths, offs, sizes, idxs):
            with open(p, "rb") as f:
                f.seek(off)
                blob = f.read(size)
            tables.append(
                decode_primitive_block(_blob_payload(blob), "pbf:%06d" % i)
            )
        return pa.concat_tables(tables)

    if not metas:
        import ray.data

        empty = decode_file(path)  # raises on malformed; else empty table
        return ray.data.from_arrow(empty)
    return ray.data.from_items(metas).map_batches(
        decode_rows, batch_size=blobs_per_task, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- writer

def _enc_varint(n):
    n = int(n)
    if n < 0:
        raise ValueError("varint must be non-negative (zigzag first)")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n):
    n = int(n)
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _enc_packed(fno, values, zigzag=False, delta=False):
    if len(values) == 0:
        return b""
    vals = [int(v) for v in values]
    if delta:
        vals = [vals[0]] + [b - a for a, b in zip(vals, vals[1:])]
    if zigzag:
        vals = [_zigzag(v) for v in vals]
    payload = b"".join(_enc_varint(v) for v in vals)
    return _enc_varint((fno << 3) | 2) + _enc_varint(len(payload)) + payload


def _enc_bytes(fno, payload):
    return _enc_varint((fno << 3) | 2) + _enc_varint(len(payload)) + payload


def _enc_vint_field(fno, val):
    return _enc_varint(fno << 3) + _enc_varint(val)


def _wrap_blob(btype, payload, compress=True):
    if compress:
        z = zlib.compress(payload, 6)
        blob = _enc_vint_field(2, len(payload)) + _enc_bytes(3, z)
    else:
        blob = _enc_bytes(1, payload)
    hdr = _enc_bytes(1, btype.encode("utf-8")) + _enc_vint_field(3, len(blob))
    return struct.pack(">I", len(hdr)) + hdr + blob


class _StringTable:
    """Per-block string table; index 0 is the required empty string.

    Index 0 doubles as the DenseNodes keys_vals DELIMITER, so a real
    empty-string tag key/value must NOT be encoded as 0 there —
    ``add_nonzero`` allocates a distinct (duplicate) entry for "" on
    first use (duplicates are legal per spec). Way/relation key/val and
    role arrays carry explicit lengths, so plain ``add`` (which may
    return 0) stays correct — and roles commonly ARE the empty string."""

    def __init__(self):
        self._idx = {"": 0}
        self.strings = [""]
        self._empty_nonzero = None

    def add(self, s):
        i = self._idx.get(s)
        if i is None:
            i = len(self.strings)
            self._idx[s] = i
            self.strings.append(s)
        return i

    def add_nonzero(self, s):
        if s != "":
            return self.add(s)
        if self._empty_nonzero is None:
            self._empty_nonzero = len(self.strings)
            self.strings.append("")
        return self._empty_nonzero

    def encode(self):
        return _enc_bytes(
            1,
            b"".join(_enc_bytes(1, s.encode("utf-8")) for s in self.strings),
        )


def _coord_units(x):
    """float degrees → 1e-7-degree integer units (granularity 100)."""
    return int(round(float(x) * 1e7))


def write_osm_pbf(path, elements, max_group=8000, compress=True):
    """Element table/rows → ``.osm.pbf`` (deterministic bytes).

    ``elements``: pa.Table with ELEMENT_SCHEMA columns (extra columns
    ignored) or an iterable of element dicts ({'id','type','lon',...}).
    Elements are written in input order, chunked ``max_group`` per
    PrimitiveBlock, nodes as DenseNodes; coordinates quantize to the
    1e-7 grid (OSM native precision — values already on it round-trip
    bit-exactly)."""
    if isinstance(elements, pa.Table):
        rows = _table_rows(elements)
    else:
        rows = list(elements)

    out = [
        _wrap_blob(
            "OSMHeader",
            _enc_bytes(4, b"OsmSchema-V0.6")
            + _enc_bytes(4, b"DenseNodes")
            + _enc_bytes(16, b"osm_export_tool_python_ray"),
            compress=compress,
        )
    ]

    for start in range(0, len(rows), max_group):
        chunk = rows[start : start + max_group]
        st = _StringTable()
        dense_ids, dense_lat, dense_lon, dense_kv = [], [], [], []
        ways, rels = [], []
        has_dense_tags = False
        for e in chunk:
            kind = e["type"]
            tags = e.get("tags") or {}
            titems = list(tags.items()) if isinstance(tags, dict) else list(tags)
            if kind == "node":
                dense_ids.append(int(e["id"]))
                # stored unit = granularity(100) nanodeg = 1e-7 deg
                dense_lat.append(_coord_units(e["lat"]))
                dense_lon.append(_coord_units(e["lon"]))
                for k, v in titems:
                    dense_kv.append(st.add_nonzero(str(k)))
                    dense_kv.append(st.add_nonzero(str(v)))
                    has_dense_tags = True
                dense_kv.append(0)
            elif kind == "way":
                msg = _enc_vint_field(1, int(e["id"]))
                msg += _enc_packed(2, [st.add(str(k)) for k, _ in titems])
                msg += _enc_packed(3, [st.add(str(v)) for _, v in titems])
                msg += _enc_packed(8, e.get("refs") or [], zigzag=True, delta=True)
                ways.append(_enc_bytes(3, msg))
            elif kind == "relation":
                msg = _enc_vint_field(1, int(e["id"]))
                msg += _enc_packed(2, [st.add(str(k)) for k, _ in titems])
                msg += _enc_packed(3, [st.add(str(v)) for _, v in titems])
                members = e.get("members") or []
                msg += _enc_packed(
                    8, [st.add(str(m["role"])) for m in members]
                )
                msg += _enc_packed(
                    9, [int(m["ref"]) for m in members], zigzag=True, delta=True
                )
                msg += _enc_packed(
                    10, [_MEMBER_TYPE_CODES[m["type"]] for m in members]
                )
                rels.append(_enc_bytes(4, msg))
            else:
                raise ValueError("unknown element type %r" % kind)

        group = b""
        if dense_ids:
            dn = _enc_packed(1, dense_ids, zigzag=True, delta=True)
            dn += _enc_packed(8, dense_lat, zigzag=True, delta=True)
            dn += _enc_packed(9, dense_lon, zigzag=True, delta=True)
            if has_dense_tags:
                dn += _enc_packed(10, dense_kv)
            group += _enc_bytes(2, dn)
        group += b"".join(ways)
        group += b"".join(rels)

        # granularity 100 is the spec default — field 17 omitted
        block = st.encode() + _enc_bytes(2, group)
        out.append(_wrap_blob("OSMData", block, compress=compress))

    with open(path, "wb") as f:
        for blob in out:
            f.write(blob)
    return path


def _table_rows(t):
    """ELEMENT_SCHEMA table → writer row dicts (input order preserved)."""
    rows = []
    kinds = t.column("kind").to_pylist()
    ids = t.column("element_id").to_pylist()
    tags = t.column("tags").to_pylist()
    lons = t.column("lon").to_pylist()
    lats = t.column("lat").to_pylist()
    refs = t.column("refs").to_pylist()
    members = t.column("members").to_pylist()
    for i in range(len(kinds)):
        e = {"type": kinds[i], "id": ids[i], "tags": tags[i] or []}
        if kinds[i] == "node":
            e["lon"], e["lat"] = lons[i], lats[i]
        elif kinds[i] == "way":
            e["refs"] = refs[i] or []
        else:
            e["members"] = members[i] or []
        rows.append(e)
    return rows


def write_osm_pbf_parts(elements_ds, out_dir, max_group=8000):
    """Distributed .osm.pbf sink: each element block encodes to its own
    ``part-NNNNN.osm.pbf`` under ``out_dir`` (staged name + atomic
    rename, so a re-run can skip finished parts) — the resumable
    partitioned-output posture of the parquet sinks applied to the
    native format. Returns the part paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def encode_block(t: pa.Table) -> pa.Table:
        # deterministic per-part name from the part's min ekey
        ek = t.column("ekey").to_numpy(zero_copy_only=False)
        name = "part-%016x.osm.pbf" % (int(ek.min()) & 0xFFFFFFFFFFFFFFFF)
        dst = os.path.join(out_dir, name)
        if not os.path.exists(dst):
            tmp = dst + ".tmp"
            write_osm_pbf(tmp, t, max_group=max_group)
            os.replace(tmp, dst)
        return pa.table({"path": pa.array([dst], type=pa.string()),
                         "n_elements": pa.array([t.num_rows], type=pa.int64())})

    return elements_ds.map_batches(
        encode_block, batch_format="pyarrow", batch_size=max_group
    )
