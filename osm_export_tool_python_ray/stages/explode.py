"""Span explode: interleaved documents → typed element/tile tables.

The reference consumes a pre-parsed element stream from pyosmium
(reference cmd.py:58); here the corpus is the input_hint document table and
this stage is the parser. Stateless ``map_batches`` transforms, Arrow in /
Arrow out. Per-row span-sequence order is preserved by carrying
``(doc_id, offset)`` provenance on every exploded row and never reordering
spans within a document (SURVEY.md §1.2 invariant).
"""

import json

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa
import pyarrow.compute as pc

try:  # orjson parses the span payloads ~3× faster; stdlib fallback
    import orjson

    _loads = orjson.loads
except ImportError:  # pragma: no cover
    _loads = json.loads

from osm_export_tool_python_ray.sources.corpus import ELEMENT_SCHEMA, MEMBER_TYPE

_KIND_CODE = {"node": 0, "way": 1, "relation": 2, "tile": 3}


def element_key(kind_codes, element_ids):
    """Single int64 shuffle key for (kind, element_id) — OSM ids < 2^48."""
    return (np.asarray(kind_codes, dtype=np.int64) << 48) | np.asarray(
        element_ids, dtype=np.int64
    )


def _flatten_spans(batch):
    """documents batch → (doc_id per span, span struct fields)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    return doc_ids, flat


def explode_osm(batch: pa.Table, include_tiles=False) -> pa.Table:
    """documents → element rows (ELEMENT_SCHEMA + ekey). JSON payload parse
    is per-osm-span Python (no vectorized JSON kernel in pyarrow 16), all
    surrounding column work is Arrow compute.

    ``include_tiles`` also emits kind='tile' rows (element_id = packed
    tkey, media_ref carried) so ONE corpus scan + ONE dedup shuffle feeds
    both the feature pipeline and the raster side."""
    doc_ids, flat = _flatten_spans(batch)
    kinds = flat.field("kind")
    mask = pc.equal(kinds, "osm")
    texts = pc.filter(flat.field("text"), mask).to_pylist()
    osm_docs = pc.filter(doc_ids, mask).to_pylist()
    offsets = pc.filter(flat.field("offset"), mask).to_pylist()

    n = len(texts)
    # single-pass loop: per-column comprehensions over pre-parsed dicts
    # measured SLOWER (1M dicts alive at once kills cache locality)
    element_id = np.empty(n, dtype=np.int64)
    kind_code = np.empty(n, dtype=np.int8)
    kind = []
    tags_col = []
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    refs_col = []
    members_col = []
    loads = _loads
    kc = _KIND_CODE
    kind_append = kind.append
    tags_append = tags_col.append
    refs_append = refs_col.append
    members_append = members_col.append
    bad = 0
    valid = np.ones(n, dtype=bool)
    for i, txt in enumerate(texts):
        # malformed spans are dropped with a counter, not a task failure —
        # drop-and-continue parity with the reference's error handling
        # (reference tabular.py:305-306,338-339 prints and keeps going)
        try:
            e = loads(txt)
            element_id[i] = e["id"]
            k = e["type"]
            code = kc[k]
            if k == "node":
                lon[i] = e["lon"]
                lat[i] = e["lat"]
        except (ValueError, KeyError, TypeError):
            valid[i] = False
            bad += 1
            kind_append("")
            tags_append([])
            refs_append(None)
            members_append(None)
            continue
        kind_append(k)
        kind_code[i] = code
        t = e.get("tags")
        tags_append(list(t.items()) if t else [])
        if k == "node":
            refs_append(None)
            members_append(None)
        elif k == "way":
            refs_append(e.get("refs") or [])
            members_append(None)
        else:
            refs_append(None)
            members_append(e.get("members") or [])
    if bad:
        # reference-parity print AND the engine's counted-cap surface
        # (state/metrics.py → BENCH "caps"): a 100 TB run must show how
        # many spans it dropped, not bury them in task logs
        from osm_export_tool_python_ray.state.metrics import report_cap

        print("explode_osm: dropped %d malformed osm spans" % bad)
        report_cap("explode_malformed_spans", bad)
        keep = np.nonzero(valid)[0]
        element_id = element_id[keep]
        kind_code = kind_code[keep]
        lon = lon[keep]
        lat = lat[keep]
        kind = [kind[i] for i in keep]
        tags_col = [tags_col[i] for i in keep]
        refs_col = [refs_col[i] for i in keep]
        members_col = [members_col[i] for i in keep]
        osm_docs = [osm_docs[i] for i in keep]
        offsets = [offsets[i] for i in keep]
        n = len(keep)

    out = pa.table(
        {
            "ekey": pa.array(element_key(kind_code, element_id)),
            "element_id": pa.array(element_id),
            "kind": pa.array(kind, type=pa.string()),
            "tags": pa.array(tags_col, type=pa.map_(pa.string(), pa.string())),
            "lon": pa.array(lon, type=pa.float64()),
            "lat": pa.array(lat, type=pa.float64()),
            "refs": pa.array(refs_col, type=pa.list_(pa.int64())),
            "members": pa.array(members_col, type=pa.list_(MEMBER_TYPE)),
            "doc_id": pa.array(osm_docs, type=pa.string()),
            "offset": pa.array(offsets, type=pa.int32()),
            "media_ref": pa.nulls(n, type=pa.string()),
        }
    )
    if not include_tiles:
        return out
    tmask = pc.equal(kinds, "tile")
    refs = pc.filter(flat.field("media_ref"), tmask)
    tdocs = pc.filter(doc_ids, tmask)
    toffs = pc.filter(flat.field("offset"), tmask)
    m = len(refs)
    if m == 0:
        return out
    zxy = pc.split_pattern(refs, "/")
    flatz = pc.list_flatten(zxy).to_numpy(zero_copy_only=False).astype(np.int64)
    z, x, y = flatz[0::3], flatz[1::3], flatz[2::3]
    tkey = (z << 58) | (x << 29) | y
    tiles = pa.table(
        {
            # tiles dedup in the NEGATIVE ekey space: tkey uses bits ≥48 so
            # the (kind << 48) packing would collide with x/z bits
            "ekey": pa.array(-(tkey + 1)),
            "element_id": pa.array(tkey),
            "kind": pa.array(["tile"] * m, type=pa.string()),
            "tags": pa.nulls(m, type=pa.map_(pa.string(), pa.string())),
            "lon": pa.nulls(m, type=pa.float64()),
            "lat": pa.nulls(m, type=pa.float64()),
            "refs": pa.nulls(m, type=pa.list_(pa.int64())),
            "members": pa.nulls(m, type=pa.list_(MEMBER_TYPE)),
            "doc_id": tdocs,
            "offset": toffs,
            "media_ref": refs,
        }
    )
    return pa.concat_tables([out, tiles])


def explode_tiles(batch: pa.Table) -> pa.Table:
    """documents → tile payload rows (kind='tile' spans): doc_id, offset,
    media_ref, z, x, y, tkey."""
    doc_ids, flat = _flatten_spans(batch)
    mask = pc.equal(flat.field("kind"), "tile")
    refs = pc.filter(flat.field("media_ref"), mask)
    docs = pc.filter(doc_ids, mask)
    offs = pc.filter(flat.field("offset"), mask)
    zxy = pc.split_pattern(refs, "/")
    flatz = pc.list_flatten(zxy).to_numpy(zero_copy_only=False).astype(np.int64)
    z, x, y = flatz[0::3], flatz[1::3], flatz[2::3]
    tkey = (z << 58) | (x << 29) | y
    return pa.table(
        {
            "doc_id": docs,
            "offset": offs,
            "media_ref": refs,
            "tile_z": pa.array(z),
            "tile_x": pa.array(x),
            "tile_y": pa.array(y),
            "tkey": pa.array(tkey),
        }
    )


def span_sequence(batch: pa.Table) -> pa.Table:
    """Flattened (doc_id, seq, kind, text, media_ref, offset) used to check
    the per-row span-sequence equality invariant after any doc-level stage."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    lengths = pc.list_value_length(spans).fill_null(0).to_numpy(zero_copy_only=False)
    seq = np.concatenate([np.arange(l, dtype=np.int32) for l in lengths]) if len(lengths) else np.array([], dtype=np.int32)
    return pa.table(
        {
            "doc_id": doc_ids,
            "seq": pa.array(seq),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )


_ROW4 = [("a", np.int64), ("b", np.int64), ("c", np.int64), ("d", np.int64)]


def dedup_elements_light(ds, num_buckets=64, loser_limit=20_000_000):
    """Exact element dedup with a KEY-ONLY exchange (round-2 bandwidth
    mitigation): instead of shuffling full element rows (tags/refs/members,
    ~200 B/row) to pick winners, shuffle only the (ekey, doc_id, offset)
    projection (~30 B/row — an ~8× cut in exchange bytes), compute the
    LOSER rows (the duplicates to drop, typically a few percent), and
    broadcast their identities (``ray.put`` once) for a map-side filter
    over the original stream. Output rows are identical to
    ``dedup_elements`` (winner = min (doc_id, offset) per ekey).

    The loser set must fit on the driver: above ``loser_limit`` (a
    duplicate-heavy corpus) this raises and the caller falls back to the
    full-payload shuffle. This is the tombstone pattern: at 10^12 rows the
    heavy stream is touched map-only and only the key projection moves.

    ``ds`` is materialized here (it feeds both the key scan and the
    filter; without that the upstream explode would execute twice). The
    materialized pre-dedup blocks are freed once the caller's own
    checkpoint/materialize of the filtered stream completes."""
    import ray

    from osm_export_tool_python_ray.functions.text import hash_strings_128

    ds = ds.materialize()

    def key_rows(t: pa.Table) -> pa.Table:
        k = t.select(["ekey", "doc_id", "offset"])
        ek = k.column("ekey").to_numpy(zero_copy_only=False)
        return k.append_column("bucket", pa.array((ek % num_buckets).astype(np.int32)))

    def losers_per_key(group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [("ekey", "ascending"), ("doc_id", "ascending"), ("offset", "ascending")]
        )
        ek = g.column("ekey").to_numpy(zero_copy_only=False)
        first = np.ones(len(ek), dtype=bool)
        first[1:] = ek[1:] != ek[:-1]
        lose = g.filter(pa.array(~first))
        h1, h2 = hash_strings_128(lose.column("doc_id"))
        return pa.table(
            {
                "ekey": lose.column("ekey"),
                "dh1": pa.array(h1.view(np.int64)),
                "dh2": pa.array(h2.view(np.int64)),
                "offset": lose.column("offset"),
            }
        )

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    loser_ds = grouped_map(
        ds.map_batches(key_rows, batch_format="pyarrow"),
        "bucket",
        lambda g: losers_per_key(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
    )
    parts = []
    n_losers = 0
    for b in loser_ds.iter_batches(batch_format="pyarrow"):
        parts.append(b)
        n_losers += b.num_rows
        if n_losers > loser_limit:
            raise ValueError(
                "loser set %d exceeds limit %d — use dedup_elements" % (n_losers, loser_limit)
            )
    if parts:
        lt = pa.concat_tables(parts)
        pack = np.empty(lt.num_rows, dtype=_ROW4)
        pack["a"] = lt.column("ekey").to_numpy(zero_copy_only=False)
        pack["b"] = lt.column("dh1").to_numpy(zero_copy_only=False)
        pack["c"] = lt.column("dh2").to_numpy(zero_copy_only=False)
        pack["d"] = lt.column("offset").to_numpy(zero_copy_only=False)
        pack.sort()
    else:
        pack = np.empty(0, dtype=_ROW4)
    loser_ref = ray.put(pack)

    def drop_losers(t: pa.Table) -> pa.Table:
        lp = cached_get(loser_ref)
        if len(lp) == 0 or t.num_rows == 0:
            return t
        ek = t.column("ekey").to_numpy(zero_copy_only=False).astype(np.int64)
        # coarse prefilter: rows whose ekey occurs in the loser set at all
        pos = np.searchsorted(lp["a"], ek)
        posc = np.minimum(pos, len(lp) - 1)
        cand = lp["a"][posc] == ek
        idx = np.nonzero(cand)[0]
        if len(idx) == 0:
            return t
        h1, h2 = hash_strings_128(t.column("doc_id").take(pa.array(idx)))
        rows = np.empty(len(idx), dtype=_ROW4)
        rows["a"] = ek[idx]
        rows["b"] = h1.view(np.int64)
        rows["c"] = h2.view(np.int64)
        rows["d"] = t.column("offset").to_numpy(zero_copy_only=False)[idx]
        p = np.searchsorted(lp, rows)
        pc = np.minimum(p, len(lp) - 1)
        is_loser = lp[pc] == rows
        keep = np.ones(t.num_rows, dtype=bool)
        keep[idx[is_loser]] = False
        return t.filter(pa.array(keep))

    return ds.map_batches(drop_losers, batch_format="pyarrow")


def dedup_elements(ds, num_buckets=64):
    """Exact element dedup (SURVEY.md D4): hash-bucket the single int64
    ekey, then keep the provenance-minimal row per ekey inside each bucket
    — vectorized per group-of-buckets, one shuffle total. Tie-break:
    min (doc_id, offset) so output is deterministic under any parallelism.

    A within-batch pre-dedup runs BEFORE the shuffle (the combiner
    pattern): duplicates are overwhelmingly partition-local, so they never
    enter the exchange; the global pass keeps exactly the same winner."""

    def add_bucket(t: pa.Table) -> pa.Table:
        ek = t.column("ekey").to_numpy(zero_copy_only=False)
        # local pre-dedup only when the batch actually contains duplicates
        # (cheap int64 uniqueness probe; a full nested-row sort_by costs
        # more than the shuffle saving when there is nothing to drop)
        if len(np.unique(ek)) != len(ek):
            g = t.sort_by(
                [("ekey", "ascending"), ("doc_id", "ascending"), ("offset", "ascending")]
            )
            ek = g.column("ekey").to_numpy(zero_copy_only=False)
            keep = np.ones(len(ek), dtype=bool)
            keep[1:] = ek[1:] != ek[:-1]
            t = g.filter(pa.array(keep))
            ek = ek[keep]
        return t.append_column("bucket", pa.array((ek % num_buckets).astype(np.int32)))

    def first_per_key(group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [("ekey", "ascending"), ("doc_id", "ascending"), ("offset", "ascending")]
        )
        ek = g.column("ekey").to_numpy(zero_copy_only=False)
        keep = np.ones(len(ek), dtype=bool)
        keep[1:] = ek[1:] != ek[:-1]
        return g.filter(pa.array(keep)).drop_columns(["bucket"])

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    return grouped_map(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "bucket",
        first_per_key,
        num_partitions=min(num_buckets, 32),
    )
