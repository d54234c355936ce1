"""Map matching: snap probe points to the nearest road segment within
a bounded search corridor — the geospatial join a mobility pipeline
runs between raw GPS pings and a road network.

Semantics (shared exactly with the SQL oracle):
- the ROAD NETWORK is the trajectory set of "road users"
  (user_id % ROAD_MOD == 0): consecutive points per user in
  (ts, event_id) order form segments, keeping only road-scale
  segments (|dx| <= MAX_SEG and |dy| <= MAX_SEG); seg_id = the
  event_id of the segment's first endpoint (globally unique).
- a PROBE point (any event of a non-road user) is a candidate for a
  segment iff it lies inside the segment's bbox expanded by RADIUS on
  both axes; the match is the candidate minimizing (d2q, seg_id)
  where d2q is the squared point-to-segment distance in EXACT scaled
  integers: the clamped endpoint cases are |p-e|^2 * 2^20 (exact) and
  the interior case is floor(cross^2 * 2^20 / len2) (exact integer
  floor division on both sides — the engine's quantize-before-rank
  rule, so numpy and DuckDB rank identically with zero float risk).
- unmatched probes (no segment bbox covers them) are dropped
  (inner-join semantics).

Scale shape: the road network is the SMALL side — real corpora have
~10^8 segments against 10^12 pings — so this is a broadcast join,
the same shape as decontamination's eval-slice grams: segments are
assembled with ONE user-keyed exchange (ordering needs per-user
co-location), folded into a cell -> segment CSR index (segments
replicated into every expanded-bbox cell; bounded by
(MAX_SEG + 2·RADIUS)/CELL + 1 per axis), `ray.put` ONCE, and probes
stream through a single stateless ``map_batches`` that gathers
per-cell candidates with two searchsorteds and ranks them with two
masked ``minimum.reduceat`` passes (min d2q, then min seg_id among
ties) — no per-row Python, no probe-side shuffle. If the network
ever outgrows broadcast, the fallback is the knn-style cell-bucketed
exchange on BOTH sides; documented, not needed at reference scale.

No reference analog — engine mandate (geospatial family); the
bounded-corridor candidate rule mirrors the kNN stage's cell-ring
contract (stages/knn.py).
"""

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa
import ray

from osm_export_tool_python_ray.stages.exchange import grouped_map
from osm_export_tool_python_ray.stages.temporal import _ts_i64

ROAD_MOD = 17
MAX_SEG = 20
RADIUS = 10
CELL = 10
SCALE = np.int64(1) << 20
_I64_MAX = np.iinfo(np.int64).max


def _grid_xy(eid):
    x = (eid % 100).astype(np.int64)
    y = ((eid // 7) % 100).astype(np.int64)
    return x, y


def build_segments(events_ds, num_buckets=32, num_partitions=8):
    """Road segments as a Dataset: (seg_id, ax, ay, bx, by). One
    user-keyed exchange; consecutive (ts, event_id)-ordered point pairs
    per road user, filtered to road scale."""

    def bucketer(t: pa.Table):
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        road = (u % ROAD_MOD) == 0
        if not road.any():
            return None
        t = t.filter(pa.array(road))
        u = u[road]
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        x, y = _grid_xy(eid)
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(_ts_i64(t.column("ts"))),
                "event_id": pa.array(eid),
                "x": pa.array(x),
                "y": pa.array(y),
                "bucket": pa.array((u % num_buckets).astype(np.int32)),
            }
        )

    def to_tables(t: pa.Table):
        out = bucketer(t)
        return out if out is not None else _SEG_IN.empty_table()

    def segments(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        x = g.column("x").to_numpy(zero_copy_only=False)
        y = g.column("y").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, x, y = u[order], eid[order], x[order], y[order]
        if len(u) < 2:
            return _SEG_OUT.empty_table()
        same = u[1:] == u[:-1]
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        keep = same & (np.abs(dx) <= MAX_SEG) & (np.abs(dy) <= MAX_SEG)
        return pa.table(
            {
                "seg_id": pa.array(eid[:-1][keep]),
                "ax": pa.array(x[:-1][keep]),
                "ay": pa.array(y[:-1][keep]),
                "bx": pa.array(x[1:][keep]),
                "by": pa.array(y[1:][keep]),
            }
        )

    return grouped_map(
        events_ds.map_batches(to_tables, batch_format="pyarrow"),
        "bucket",
        segments,
        num_partitions=num_partitions,
        payload_schema=_SEG_IN,
    )


_SEG_IN = pa.schema(
    [
        ("user_id", pa.int64()),
        ("ts", pa.int64()),
        ("event_id", pa.int64()),
        ("x", pa.int64()),
        ("y", pa.int64()),
        ("bucket", pa.int32()),
    ]
)
_SEG_OUT = pa.schema(
    [
        ("seg_id", pa.int64()),
        ("ax", pa.int64()),
        ("ay", pa.int64()),
        ("bx", pa.int64()),
        ("by", pa.int64()),
    ]
)


def build_cell_index(segs):
    """cell -> segments CSR: segments replicated into every CELL-sized
    grid cell their RADIUS-expanded bbox overlaps. ``segs`` is a dict of
    int64 numpy columns (seg_id, ax, ay, bx, by). Returns
    (cell_keys_sorted, starts, flat_seg_rows) — the broadcast payload."""
    ax, ay = segs["ax"], segs["ay"]
    bx, by = segs["bx"], segs["by"]
    xlo = (np.minimum(ax, bx) - RADIUS) // CELL
    xhi = (np.maximum(ax, bx) + RADIUS) // CELL
    ylo = (np.minimum(ay, by) - RADIUS) // CELL
    yhi = (np.maximum(ay, by) + RADIUS) // CELL
    nx = (xhi - xlo + 1).astype(np.int64)
    ny = (yhi - ylo + 1).astype(np.int64)
    reps = nx * ny
    seg_idx = np.repeat(np.arange(len(ax)), reps)
    # within-segment replica ordinal -> (cx, cy) offsets
    total = int(reps.sum())
    ords = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
    nyr = np.repeat(ny, reps)
    cx = np.repeat(xlo, reps) + ords // nyr
    cy = np.repeat(ylo, reps) + ords % nyr
    key = cx * 1024 + cy  # grid is tiny (≤10×10 cells + margin); no collisions
    order = np.argsort(key, kind="stable")
    key, seg_idx = key[order], seg_idx[order]
    cells, starts = np.unique(key, return_index=True)
    flat = {c: segs[c][seg_idx] for c in ("seg_id", "ax", "ay", "bx", "by")}
    return cells, np.append(starts, len(key)).astype(np.int64), flat


def _score_select(eid, fx, fy, ax, ay, bx, by, sid, cnt, pstart):
    """Rank each probe's candidate segments and select the (d2q, seg_id)
    minimum — the EXACT integer scoring shared by the broadcast and the
    distributed paths. Inputs are flattened candidate rows: probe i owns
    rows pstart[i] .. pstart[i]+cnt[i]; returns the matched-rows table."""
    fxr, fyr = np.repeat(fx, cnt), np.repeat(fy, cnt)
    inb = (
        (fxr >= np.minimum(ax, bx) - RADIUS)
        & (fxr <= np.maximum(ax, bx) + RADIUS)
        & (fyr >= np.minimum(ay, by) - RADIUS)
        & (fyr <= np.maximum(ay, by) + RADIUS)
    )
    dx, dy = bx - ax, by - ay
    pxa, pya = fxr - ax, fyr - ay
    len2 = dx * dx + dy * dy
    dot = dx * pxa + dy * pya
    d_a = (pxa * pxa + pya * pya) * SCALE
    pxb, pyb = fxr - bx, fyr - by
    d_b = (pxb * pxb + pyb * pyb) * SCALE
    cross = dx * pya - dy * pxa
    interior = (len2 > 0) & (dot > 0) & (dot < len2)
    den = np.where(interior, len2, 1)
    num = np.where(interior, cross * cross * SCALE, np.where(dot >= len2, d_b, d_a))
    num = np.where(len2 == 0, d_a, num)
    d2q = num // den
    d2q = np.where(inb, d2q, _I64_MAX)
    sidm = np.where(inb, sid, _I64_MAX)
    best = np.minimum.reduceat(d2q, pstart)
    tie = d2q == np.repeat(best, cnt)
    best_sid = np.minimum.reduceat(np.where(tie, sidm, _I64_MAX), pstart)
    ok = best != _I64_MAX
    return pa.table(
        {
            "event_id": pa.array(eid[ok]),
            "seg_id": pa.array(best_sid[ok]),
            "d2q": pa.array(best[ok]),
        }
    )


# driver-broadcast budget for the segment index; at ~40 B/segment this is
# ~2 GB of index — above it the join leaves the driver for the
# cell-cogrouped exchange (identical output, cap-counted).
DRIVER_SEG_LIMIT = 50_000_000


def map_match(events_ds, num_partitions=8, driver_limit=DRIVER_SEG_LIMIT,
              num_buckets=16):
    """(event_id, seg_id, d2q) for every matched probe point.

    Above ``driver_limit`` segments the broadcast index is replaced by a
    cell-cogrouped exchange: segment cell replicas and probe rows meet in
    ONE bucketed grouped_map and score with the same `_score_select`
    kernel — results identical (each probe's candidate set is exactly the
    segments replicated into its cell, as in the CSR index)."""
    segs_ds = build_segments(events_ds).materialize()
    n_segs = segs_ds.count()
    if n_segs > driver_limit:
        from osm_export_tool_python_ray.state.metrics import report_cap

        report_cap("mapmatch_segments_over_driver_limit", n_segs - driver_limit)
        return _map_match_distributed(events_ds, segs_ds, num_buckets)
    seg_rows = segs_ds.take_all()
    segs = {
        c: np.array([r[c] for r in seg_rows], dtype=np.int64)
        for c in ("seg_id", "ax", "ay", "bx", "by")
    }
    index_ref = ray.put(build_cell_index(segs))

    def match(t: pa.Table) -> pa.Table:
        cells, starts, flat = cached_get(index_ref)
        if not len(cells):
            return _OUT.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        probe = (u % ROAD_MOD) != 0
        eid = t.column("event_id").to_numpy(zero_copy_only=False)[probe]
        px, py = _grid_xy(eid)
        key = (px // CELL) * 1024 + (py // CELL)
        pos = np.searchsorted(cells, key)
        pos_c = np.minimum(pos, len(cells) - 1)
        found = (pos < len(cells)) & (cells[pos_c] == key)
        cnt = np.where(found, starts[pos_c + 1] - starts[pos_c], 0)
        keep = cnt > 0
        eid, px, py, cnt = eid[keep], px[keep], py[keep], cnt[keep]
        if not len(eid):
            return _OUT.empty_table()
        s0 = starts[pos_c[keep]]
        # flat candidate rows: for point i, segments s0[i] .. s0[i]+cnt[i]
        pstart = np.cumsum(cnt) - cnt
        flat_ord = np.arange(int(cnt.sum())) - np.repeat(pstart, cnt)
        cand = np.repeat(s0, cnt) + flat_ord
        return _score_select(
            eid, px, py,
            flat["ax"][cand], flat["ay"][cand],
            flat["bx"][cand], flat["by"][cand],
            flat["seg_id"][cand], cnt, pstart,
        )

    return events_ds.map_batches(match, batch_format="pyarrow")


def _map_match_distributed(events_ds, segs_ds, num_buckets=16):
    """Cell-cogrouped map matching: segment cell REPLICAS (same expanded-
    bbox coverage as build_cell_index) and probe rows meet in one bucketed
    exchange; per group, probes of each cell score against that cell's
    segments with `_score_select`. Each probe belongs to exactly one cell,
    so output rows are emitted once — identical to the broadcast path."""

    def seg_replicas(t: pa.Table) -> pa.Table:
        cols = {
            c: t.column(c).to_numpy(zero_copy_only=False)
            for c in ("seg_id", "ax", "ay", "bx", "by")
        }
        ax, ay, bx, by = cols["ax"], cols["ay"], cols["bx"], cols["by"]
        xlo = (np.minimum(ax, bx) - RADIUS) // CELL
        xhi = (np.maximum(ax, bx) + RADIUS) // CELL
        ylo = (np.minimum(ay, by) - RADIUS) // CELL
        yhi = (np.maximum(ay, by) + RADIUS) // CELL
        nx = (xhi - xlo + 1).astype(np.int64)
        ny = (yhi - ylo + 1).astype(np.int64)
        reps = nx * ny
        idx = np.repeat(np.arange(len(ax)), reps)
        total = int(reps.sum())
        ords = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        nyr = np.repeat(ny, reps)
        cx = np.repeat(xlo, reps) + ords // nyr
        cy = np.repeat(ylo, reps) + ords % nyr
        ckey = cx * 1024 + cy
        return pa.table(
            {
                "ckey": pa.array(ckey),
                "side": pa.array(np.ones(total, dtype=np.int8)),
                "event_id": pa.array(cols["seg_id"][idx]),  # seg_id rides here
                "x": pa.array(ax[idx]),
                "y": pa.array(ay[idx]),
                "bx": pa.array(bx[idx]),
                "by": pa.array(by[idx]),
                "bucket": pa.array((ckey % num_buckets).astype(np.int32)),
            }
        )

    def probe_rows(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        probe = (u % ROAD_MOD) != 0
        eid = t.column("event_id").to_numpy(zero_copy_only=False)[probe]
        px, py = _grid_xy(eid)
        ckey = (px // CELL) * 1024 + (py // CELL)
        n = len(eid)
        return pa.table(
            {
                "ckey": pa.array(ckey),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "event_id": pa.array(eid),
                "x": pa.array(px),
                "y": pa.array(py),
                "bx": pa.array(np.zeros(n, dtype=np.int64)),
                "by": pa.array(np.zeros(n, dtype=np.int64)),
                "bucket": pa.array((ckey % num_buckets).astype(np.int32)),
            }
        )

    unioned = segs_ds.map_batches(seg_replicas, batch_format="pyarrow").union(
        events_ds.map_batches(probe_rows, batch_format="pyarrow")
    )

    def group_fn(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        ck = g.column("ckey").to_numpy(zero_copy_only=False)
        ev = g.column("event_id").to_numpy(zero_copy_only=False)
        x = g.column("x").to_numpy(zero_copy_only=False)
        y = g.column("y").to_numpy(zero_copy_only=False)
        bx = g.column("bx").to_numpy(zero_copy_only=False)
        by = g.column("by").to_numpy(zero_copy_only=False)
        sm = side == 1
        # segment rows sorted by (ckey, seg_id) for a deterministic layout
        sck, ssid = ck[sm], ev[sm]
        sorder = np.lexsort((ssid, sck))
        sck = sck[sorder]
        sax, say = x[sm][sorder], y[sm][sorder]
        sbx, sby = bx[sm][sorder], by[sm][sorder]
        ssid = ssid[sorder]
        pm = ~sm
        pck, peid, ppx, ppy = ck[pm], ev[pm], x[pm], y[pm]
        if not len(peid) or not len(ssid):
            return _OUT.empty_table()
        lo = np.searchsorted(sck, pck, side="left")
        hi = np.searchsorted(sck, pck, side="right")
        cnt = hi - lo
        keep = cnt > 0
        peid, ppx, ppy, lo, cnt = (
            peid[keep], ppx[keep], ppy[keep], lo[keep], cnt[keep],
        )
        if not len(peid):
            return _OUT.empty_table()
        pstart = np.cumsum(cnt) - cnt
        flat_ord = np.arange(int(cnt.sum())) - np.repeat(pstart, cnt)
        cand = np.repeat(lo, cnt) + flat_ord
        return _score_select(
            peid, ppx, ppy,
            sax[cand], say[cand], sbx[cand], sby[cand],
            ssid[cand], cnt, pstart,
        )

    payload = pa.schema(
        [
            ("ckey", pa.int64()),
            ("side", pa.int8()),
            ("event_id", pa.int64()),
            ("x", pa.int64()),
            ("y", pa.int64()),
            ("bx", pa.int64()),
            ("by", pa.int64()),
        ]
    )
    return grouped_map(
        unioned,
        "bucket",
        group_fn,
        num_partitions=num_buckets,
        payload_schema=payload,
    )


_OUT = pa.schema(
    [("event_id", pa.int64()), ("seg_id", pa.int64()), ("d2q", pa.int64())]
)
