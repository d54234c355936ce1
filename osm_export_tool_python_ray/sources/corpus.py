"""Deterministic synthetic interleaved corpus (BASELINE.json input_hint).

Table shape: ``doc_id:string, spans:list<struct<kind:string, text:string,
media_ref:string, offset:int32>>``. Span conventions (FIXTURES.md F1):
``kind='osm'`` → ``text`` is a JSON-serialized OSM element; ``kind='tile'``
→ ``media_ref`` is a raster payload ref ``z/x/y``; ``kind='text'`` → free
text. Spans are ordered by ``offset`` within each doc.

Generation is sharded: shard *k* is a self-contained 1°×1° mini-world
(its ways reference its own nodes, ids namespaced by shard) produced by a
pure function of ``(seed, k)`` — so corpus generation itself scales as a
``map_batches`` over a range of shard ids with no coordination, and any
subset of shards is a valid corpus. No wall-clock or global RNG anywhere.

The worlds deliberately include every branch of the reference handler
(reference tabular.py:251-339): untagged nodes/ways, closed ways that are
polygons vs line rings (tabular.py:18-27), incomplete ways (missing node
refs, tabular.py:305-306), multipolygon relations with holes and split outer
rings, invalid relations (tabular.py:338-339), duplicate elements across
docs (exact-dedup fodder), and a population hotspot for groupby-skew tests.
"""

import json

import numpy as np
import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENT_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))]
)

MEMBER_TYPE = pa.struct(
    [("type", pa.string()), ("ref", pa.int64()), ("role", pa.string())]
)

ELEMENT_SCHEMA = pa.schema(
    [
        ("element_id", pa.int64()),
        ("kind", pa.string()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("refs", pa.list_(pa.int64())),
        ("members", pa.list_(MEMBER_TYPE)),
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("media_ref", pa.string()),
    ]
)

# id namespaces so shard-local counters never collide globally
_NODE_BASE = 10**9
_WAY_BASE = 2 * 10**9
_REL_BASE = 3 * 10**9
_SHARD_SPAN = 10**5  # max elements of one kind per shard

_POI_TAG_POOL = [
    {"amenity": "bank", "name": "First Bank"},
    {"amenity": "parking"},
    {"amenity": "school", "name": "North School"},
    {"amenity": "hospital", "name": "General Hospital"},
    {"amenity": "fuel"},
    {"amenity": "cafe", "name": "Corner Cafe"},
    {"shop": "bakery"},
    {"natural": "cliff"},
    {"highway": "bus_stop"},
    {"barrier": "gate"},
    {"aeroway": "helipad"},
    {"tourism": "hotel", "name": "Grand Hotel"},
    {"place": "village", "name": "Smallville", "population": "500"},
    {"place": "town", "name": "Midtown", "population": "15000"},
    {"man_made": "tower"},  # not in CLOSED_WAY_KEYS and no theme usually
]

_HIGHWAY_VALUES = ["primary", "secondary", "residential", "track", "path"]
_WATERWAY_VALUES = ["river", "stream", "canal", "drain"]
_BARRIER_VALUES = ["fence", "wall", "hedge"]
_AREA_TAG_POOL = [
    {"building": "yes"},
    {"building": "yes"},
    {"building": "school"},
    {"landuse": "residential"},
    {"landuse": "farmland"},
    {"natural": "water"},
    {"leisure": "park", "name": "City Park"},
]

_TEXT_POOL = [
    "The quick brown fox jumps over the lazy dog near the old bridge.",
    "Market day brings vendors to the square every week.",
    "A narrow path winds along the river toward the mill.",
    "Los datos abiertos ayudan a la comunidad local.",
    "Die Karte zeigt alle Wege rund um das Dorf.",
]


def _dumps(obj):
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def _node(el_id, lon, lat, tags=None):
    d = {"id": int(el_id), "type": "node", "lon": round(float(lon), 7), "lat": round(float(lat), 7)}
    if tags:
        d["tags"] = tags
    return d


def _way(el_id, refs, tags=None):
    d = {"id": int(el_id), "type": "way", "refs": [int(r) for r in refs]}
    if tags:
        d["tags"] = tags
    return d


def _relation(el_id, members, tags=None):
    d = {"id": int(el_id), "type": "relation", "members": members}
    if tags:
        d["tags"] = tags
    return d


class _ShardWorld:
    """Builds one shard's element list; geometry lives inside a 1°×1° square."""

    def __init__(self, shard_id, seed):
        self.shard_id = shard_id
        self.rng = np.random.RandomState((seed * 1_000_003 + shard_id) % (2**31 - 1))
        self.lon0 = float(shard_id % 10)
        self.lat0 = float((shard_id // 10) % 10)
        self.next_node = _NODE_BASE + shard_id * _SHARD_SPAN
        self.next_way = _WAY_BASE + shard_id * _SHARD_SPAN
        self.next_rel = _REL_BASE + shard_id * _SHARD_SPAN
        self.elements = []  # list of json-able dicts

    def _pt(self):
        # 30% of features cluster in a 0.1°×0.1° hotspot (skew for groupby tests)
        if self.rng.rand() < 0.3:
            return (
                self.lon0 + 0.45 + self.rng.rand() * 0.1,
                self.lat0 + 0.45 + self.rng.rand() * 0.1,
            )
        return (self.lon0 + self.rng.rand(), self.lat0 + self.rng.rand())

    def _new_node(self, lon, lat, tags=None):
        nid = self.next_node
        self.next_node += 1
        self.elements.append(_node(nid, lon, lat, tags))
        return nid

    def _ring_refs(self, cx, cy, r, n=5, close=True):
        angles = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        refs = [
            self._new_node(cx + r * np.cos(a), cy + r * np.sin(a)) for a in angles
        ]
        if close:
            refs.append(refs[0])
        return refs

    def build(self, density=1.0):
        rng = self.rng
        n_poi = max(4, int(40 * density))
        n_untagged = max(2, int(10 * density))
        n_open_ways = max(2, int(12 * density))
        n_buildings = max(2, int(8 * density))
        n_line_rings = max(1, int(3 * density))
        n_platforms = max(1, int(2 * density))
        n_rels = max(1, int(4 * density))

        # tagged POI nodes (feature candidates)
        for i in range(n_poi):
            tags = dict(_POI_TAG_POOL[rng.randint(len(_POI_TAG_POOL))])
            if rng.rand() < 0.2:
                tags["height"] = str(int(rng.randint(3, 300)))
            lon, lat = self._pt()
            self._new_node(lon, lat, tags)

        # untagged nodes: never features, only possible way geometry
        for i in range(n_untagged):
            lon, lat = self._pt()
            self._new_node(lon, lat)

        # open ways (LINE features)
        for i in range(n_open_ways):
            lon, lat = self._pt()
            npts = 3 + rng.randint(4)
            refs = []
            for j in range(npts):
                refs.append(self._new_node(lon + j * 0.002, lat + rng.rand() * 0.002))
            roll = rng.rand()
            if roll < 0.65:
                tags = {"highway": _HIGHWAY_VALUES[rng.randint(len(_HIGHWAY_VALUES))]}
            elif roll < 0.85:
                tags = {"waterway": _WATERWAY_VALUES[rng.randint(len(_WATERWAY_VALUES))]}
            else:
                tags = {"barrier": _BARRIER_VALUES[rng.randint(len(_BARRIER_VALUES))]}
            if rng.rand() < 0.3:
                tags["name"] = "Way %d-%d" % (self.shard_id, i)
            wid = self.next_way
            self.next_way += 1
            self.elements.append(_way(wid, refs, tags))

        # closed building ways (POLYGON via CLOSED_WAY_KEYS)
        for i in range(n_buildings):
            lon, lat = self._pt()
            s = 0.001 + rng.rand() * 0.002
            refs = [
                self._new_node(lon, lat),
                self._new_node(lon + s, lat),
                self._new_node(lon + s, lat + s),
                self._new_node(lon, lat + s),
            ]
            refs.append(refs[0])
            tags = dict(_AREA_TAG_POOL[rng.randint(len(_AREA_TAG_POOL))])
            if rng.rand() < 0.5:
                tags["height"] = str(int(rng.randint(3, 120)))
            if rng.rand() < 0.25:
                tags["addr:housenumber"] = str(int(rng.randint(1, 200)))
            wid = self.next_way
            self.next_way += 1
            self.elements.append(_way(wid, refs, tags))

        # closed ways that STAY lines (highway ring, no polygon key)
        for i in range(n_line_rings):
            lon, lat = self._pt()
            refs = self._ring_refs(lon, lat, 0.002, n=6)
            wid = self.next_way
            self.next_way += 1
            self.elements.append(_way(wid, refs, {"highway": "primary"}))

        # closed platform ways (POLYGON via CLOSED_WAY_KEYVALS)
        for i in range(n_platforms):
            lon, lat = self._pt()
            refs = self._ring_refs(lon, lat, 0.001, n=4)
            wid = self.next_way
            self.next_way += 1
            self.elements.append(
                _way(wid, refs, {"public_transport": "platform"} if i % 2 else {"highway": "platform"})
            )

        # multipolygon relations: outer ring split across two ways + inner hole
        for i in range(n_rels):
            lon, lat = self._pt()
            r = 0.004
            angles = np.linspace(0.0, 2 * np.pi, 8, endpoint=False)
            ring_nodes = [
                self._new_node(lon + r * np.cos(a), lat + r * np.sin(a)) for a in angles
            ]
            # two arcs sharing endpoints, neither closed on its own
            arc1 = ring_nodes[0:5]
            arc2 = ring_nodes[4:8] + [ring_nodes[0]]
            w1 = self.next_way
            self.next_way += 1
            self.elements.append(_way(w1, arc1))  # untagged member way
            w2 = self.next_way
            self.next_way += 1
            self.elements.append(_way(w2, arc2))
            members = [
                {"type": "way", "ref": int(w1), "role": "outer"},
                {"type": "way", "ref": int(w2), "role": "outer"},
            ]
            if i % 2 == 0:  # inner hole
                hole = self._ring_refs(lon, lat, 0.001, n=4)
                wh = self.next_way
                self.next_way += 1
                self.elements.append(_way(wh, hole))
                members.append({"type": "way", "ref": int(wh), "role": "inner"})
            rid = self.next_rel
            self.next_rel += 1
            tags = {"type": "multipolygon", "natural": "water"} if i % 2 else {
                "type": "multipolygon",
                "building": "yes",
                "name": "Complex %d-%d" % (self.shard_id, i),
            }
            self.elements.append(_relation(rid, members, tags))

        # pathological cases, one each per shard
        # untagged way (skipped: tabular.py:280)
        refs = [self._new_node(*self._pt()) for _ in range(3)]
        wid = self.next_way
        self.next_way += 1
        self.elements.append(_way(wid, refs))
        # incomplete way: references a node id that exists nowhere
        wid = self.next_way
        self.next_way += 1
        self.elements.append(
            _way(wid, [refs[0], _NODE_BASE - 17], {"highway": "service"})
        )
        # invalid relation: rings cannot close (one dangling arc)
        lon, lat = self._pt()
        arc = [self._new_node(lon + j * 0.001, lat) for j in range(3)]
        wa = self.next_way
        self.next_way += 1
        self.elements.append(_way(wa, arc))
        rid = self.next_rel
        self.next_rel += 1
        self.elements.append(
            _relation(
                rid,
                [{"type": "way", "ref": int(wa), "role": "outer"}],
                {"type": "multipolygon", "landuse": "forest"},
            )
        )
        # relation without polygon-ish tags (skipped: tabular.py:311-312)
        rid = self.next_rel
        self.next_rel += 1
        self.elements.append(
            _relation(
                rid,
                [{"type": "way", "ref": int(wa), "role": "outer"}],
                {"type": "multipolygon", "route": "bus"},
            )
        )
        return self.elements


def generate_shard_docs(shard_id, seed=42, density=1.0, docs_per_shard=32, dup_rate=0.05):
    """All documents of one shard as a list of {'doc_id', 'spans'} dicts."""
    world = _ShardWorld(shard_id, seed)
    elements = world.build(density=density)
    rng = world.rng

    # serialize elements once; assign each to a home doc, some to a second doc
    payloads = [_dumps(e) for e in elements]
    order = rng.permutation(len(payloads))
    doc_spans = [[] for _ in range(docs_per_shard)]
    for rank, idx in enumerate(order):
        doc_spans[rank % docs_per_shard].append(("osm", payloads[idx], ""))
        if rng.rand() < dup_rate:
            doc_spans[(rank + 7) % docs_per_shard].append(("osm", payloads[idx], ""))

    # interleave text + tile spans (zoom 12 tiles over the shard square)
    z = 12
    n = 2 ** z
    for d in range(docs_per_shard):
        for _ in range(1 + rng.randint(3)):
            doc_spans[d].append(("text", _TEXT_POOL[rng.randint(len(_TEXT_POOL))], ""))
        if rng.rand() < 0.5:
            tx = int((world.lon0 + rng.rand() + 180.0) / 360.0 * n)
            ty_lat = world.lat0 + rng.rand()
            lat_r = np.radians(ty_lat)
            ty = int((1.0 - np.arcsinh(np.tan(lat_r)) / np.pi) / 2.0 * n)
            doc_spans[d].append(("tile", "", "%d/%d/%d" % (z, tx, ty)))

    docs = []
    for d in range(docs_per_shard):
        spans = doc_spans[d]
        rng.shuffle(spans)
        docs.append(
            {
                "doc_id": "%06d-%04d" % (shard_id, d),
                "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": i}
                    for i, (k, t, m) in enumerate(spans)
                ],
            }
        )
    # a doc with zero spans and a text-only doc (FIXTURES.md F1 edge cases)
    docs.append({"doc_id": "%06d-empty" % shard_id, "spans": []})
    docs.append(
        {
            "doc_id": "%06d-textonly" % shard_id,
            "spans": [{"kind": "text", "text": _TEXT_POOL[0], "media_ref": "", "offset": 0}],
        }
    )
    return docs


def docs_to_table(docs):
    return pa.Table.from_pylist(docs, schema=DOCUMENT_SCHEMA)


def generate_corpus_table(n_shards=1, seed=42, density=1.0, docs_per_shard=32):
    """Driver-side small corpus (tests / sf0.001 smoke)."""
    docs = []
    for k in range(n_shards):
        docs.extend(generate_shard_docs(k, seed=seed, density=density, docs_per_shard=docs_per_shard))
    return docs_to_table(docs)


def write_corpus_parquet(path, n_shards=1, seed=42, density=1.0, docs_per_shard=32):
    import pyarrow.parquet as pq

    pq.write_table(generate_corpus_table(n_shards, seed, density, docs_per_shard), path)
    return path


def corpus_dataset(n_shards, seed=42, density=1.0, docs_per_shard=32):
    """Scalable corpus as a Ray Dataset: one generation task per shard-range
    batch; pure function of shard id ⇒ deterministic and retry-safe."""
    import ray.data

    def gen(batch):
        docs = []
        for sid in batch["id"].tolist():
            docs.extend(
                generate_shard_docs(int(sid), seed=seed, density=density, docs_per_shard=docs_per_shard)
            )
        return docs_to_table(docs)

    return ray.data.range(n_shards).map_batches(
        gen, batch_size=4, batch_format="numpy"
    )
