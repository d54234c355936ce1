"""End-to-end export pipeline semantics (FIXTURES.md F2 required cases),
each pinned to the reference handler branch it exercises."""

import json

import numpy as np
import pyarrow as pa
import pytest

from osm_export_tool_python_ray.mapping import Mapping
from osm_export_tool_python_ray.sources.corpus import DOCUMENT_SCHEMA
from osm_export_tool_python_ray.functions import wkb as wkbmod

MAPPING_YAML = """
pts:
  types:
    - points
  select:
    - amenity
    - name
  where: amenity IS NOT NULL
bld:
  types:
    - polygons
  select:
    - name
  where:
    - building IS NOT NULL
    - natural = 'water'
    - landuse IS NOT NULL
rds:
  types:
    - lines
  select:
    - highway
  where: highway IS NOT NULL
"""


def _el(d):
    return {"kind": "osm", "text": json.dumps(d, sort_keys=True), "media_ref": ""}


def _doc(doc_id, spans):
    return {
        "doc_id": doc_id,
        "spans": [dict(s, offset=i) for i, s in enumerate(spans)],
    }


def node(i, lon, lat, tags=None):
    d = {"id": i, "type": "node", "lon": lon, "lat": lat}
    if tags:
        d["tags"] = tags
    return _el(d)


def way(i, refs, tags=None):
    d = {"id": i, "type": "way", "refs": refs}
    if tags:
        d["tags"] = tags
    return _el(d)


def rel(i, members, tags):
    return _el({"id": i, "type": "relation", "members": members, "tags": tags})


def build_docs():
    spans0 = [
        node(1, 1.0, 1.0, {"amenity": "bank", "name": "b1"}),   # matches pts
        node(2, 2.0, 2.0),                                        # untagged: skipped
        node(3, 3.0, 3.0, {"xyz": "1"}),                          # tagged, no theme
        # open way: LINE (tabular.py:290-304)
        node(10, 0.0, 0.0), node(11, 0.5, 0.0), node(12, 1.0, 0.0),
        way(100, [10, 11, 12], {"highway": "residential"}),
        # closed building way: POLYGON only (tabular.py:282-283)
        node(20, 5.0, 5.0), node(21, 6.0, 5.0), node(22, 6.0, 6.0), node(23, 5.0, 6.0),
        way(101, [20, 21, 22, 23, 20], {"building": "yes", "name": "house"}),
        # closed highway ring: stays LINE (key list tabular.py:18-19)
        node(30, 7.0, 7.0), node(31, 8.0, 7.0), node(32, 8.0, 8.0), node(33, 7.0, 8.0),
        way(102, [30, 31, 32, 33, 30], {"highway": "primary"}),
        # closed platform way: POLYGON via keyval rule (tabular.py:19)
        node(40, 0.0, 5.0), node(41, 1.0, 5.0), node(42, 1.0, 6.0), node(43, 0.0, 6.0),
        way(103, [40, 41, 42, 43, 40], {"highway": "platform"}),
    ]
    spans1 = [
        # incomplete way (missing node 999): dropped (tabular.py:305-306)
        way(104, [10, 999], {"highway": "service"}),
        # multipolygon: outer split across 2 ways + inner hole; negative id
        node(50, 0.0, 0.0), node(51, 4.0, 0.0), node(52, 4.0, 4.0), node(53, 0.0, 4.0),
        way(105, [50, 51, 52]),          # arc 1 (untagged member)
        way(106, [52, 53, 50]),          # arc 2
        node(60, 1.0, 1.0), node(61, 2.0, 1.0), node(62, 2.0, 2.0), node(63, 1.0, 2.0),
        way(107, [60, 61, 62, 63, 60]),  # hole
        rel(200, [
            {"type": "way", "ref": 105, "role": "outer"},
            {"type": "way", "ref": 106, "role": "outer"},
            {"type": "way", "ref": 107, "role": "inner"},
        ], {"type": "multipolygon", "natural": "water"}),
        # invalid relation: open ring (tabular.py:338-339)
        way(108, [10, 11]),
        rel(201, [{"type": "way", "ref": 108, "role": "outer"}],
            {"type": "multipolygon", "landuse": "forest"}),
        # duplicate of node 1 (exact dedup D4)
        node(1, 1.0, 1.0, {"amenity": "bank", "name": "b1"}),
    ]
    return pa.Table.from_pylist(
        [_doc("docA", spans0), _doc("docB", spans1)], schema=DOCUMENT_SCHEMA
    )


@pytest.fixture(scope="module")
def themed(ray_session):
    import ray.data
    from osm_export_tool_python_ray.pipelines.export import run_export

    docs = ray.data.from_arrow(build_docs())
    mapping = Mapping(MAPPING_YAML)
    ds = run_export(docs, mapping, num_partitions=2, num_buckets=4)
    rows = ds.take_all()
    return rows


def by_theme(rows, theme):
    return sorted([r for r in rows if r["theme"] == theme], key=lambda r: r["osm_id"])


class TestExportSemantics:
    def test_point_features(self, themed):
        pts = by_theme(themed, "pts")
        # node 1 exactly once (dedup) — node 3 matches no theme
        assert [r["osm_id"] for r in pts] == [1]
        assert pts[0]["geom_type"] == 1
        t, (x, y) = wkbmod.decode(pts[0]["wkb"])
        assert (x, y) == (1.0, 1.0)

    def test_line_features(self, themed):
        rds = by_theme(themed, "rds")
        # way 100 (open), way 102 (closed ring but not polygon-tagged);
        # 103 is platform→polygon-only; 104 incomplete→dropped
        assert [r["osm_id"] for r in rds] == [100, 102]
        for r in rds:
            assert r["geom_type"] == 2
        t, coords = wkbmod.decode(rds[0]["wkb"])
        np.testing.assert_allclose(coords, [(0.0, 0.0), (0.5, 0.0), (1.0, 0.0)])
        # the closed ring keeps all 5 coordinate pairs
        t, coords = wkbmod.decode(rds[1]["wkb"])
        assert len(coords) == 5

    def test_polygon_features(self, themed):
        bld = by_theme(themed, "bld")
        # -200 relation, 101 building, (103 platform has no bld-matching tags)
        assert [r["osm_id"] for r in bld] == [-200, 101]
        rel_feat = bld[0]
        assert rel_feat["geom_type"] == 3
        t, polys = wkbmod.decode(rel_feat["wkb"])
        assert t == wkbmod.MULTIPOLYGON
        assert len(polys) == 1
        ext, holes = polys[0][0], polys[0][1:]
        assert len(holes) == 1
        from osm_export_tool_python_ray.functions.kernels import signed_area
        assert abs(signed_area(ext)) == pytest.approx(16.0)
        assert abs(signed_area(holes[0])) == pytest.approx(1.0)
        # orientation: exterior CCW, hole CW
        assert signed_area(ext) > 0
        assert signed_area(holes[0]) < 0

    def test_invalid_relation_dropped(self, themed):
        assert not any(r["osm_id"] == -201 for r in themed)

    def test_platform_polygon(self, themed):
        # platform way produced no feature in bld (no matching tag) and no
        # line in rds (closed_way_is_polygon keyval)
        assert not any(r["osm_id"] == 103 for r in themed)


class TestClipAndCentroid:
    def test_clipping(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.pipelines.export import run_export

        # AOI: square [0,4]x[0,4]
        aoi = [[np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])]]
        spans = [
            node(1, 2.0, 2.0, {"amenity": "bank"}),      # inside: kept
            node(2, 9.0, 9.0, {"amenity": "bank"}),      # outside: dropped
            node(3, 4.0, 2.0, {"amenity": "bank"}),      # on boundary: DROPPED
            node(10, 2.0, 1.0), node(11, 9.0, 1.0),
            way(100, [10, 11], {"highway": "residential"}),   # crossing: clipped
            node(20, 1.0, 1.0), node(21, 2.0, 1.5), node(22, 3.0, 1.0),
            way(101, [20, 21, 22], {"highway": "track"}),     # inside: kept whole
        ]
        docs = ray.data.from_arrow(
            pa.Table.from_pylist([_doc("d", spans)], schema=DOCUMENT_SCHEMA)
        )
        mapping = Mapping(MAPPING_YAML)
        rows = run_export(docs, mapping, aoi_polygons=aoi, num_partitions=2, num_buckets=4).take_all()
        pts = by_theme(rows, "pts")
        assert [r["osm_id"] for r in pts] == [1]
        rds = by_theme(rows, "rds")
        assert [r["osm_id"] for r in rds] == [100, 101]
        t, coords = wkbmod.decode(rds[0]["wkb"])
        np.testing.assert_allclose(coords, [(2.0, 1.0), (4.0, 1.0)])

    def test_centroid_mode(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.pipelines.export import run_export

        spans = [
            node(20, 5.0, 5.0), node(21, 7.0, 5.0), node(22, 7.0, 7.0), node(23, 5.0, 7.0),
            way(101, [20, 21, 22, 23, 20], {"building": "yes"}),
        ]
        docs = ray.data.from_arrow(
            pa.Table.from_pylist([_doc("d", spans)], schema=DOCUMENT_SCHEMA)
        )
        mapping = Mapping(MAPPING_YAML)
        rows = run_export(docs, mapping, polygon_centroid=True, num_partitions=2, num_buckets=4).take_all()
        bld = by_theme(rows, "bld")
        assert len(bld) == 1
        # matched as POLYGON but emitted as POINT centroid (tabular.py:330-334)
        assert bld[0]["geom_type"] == 1 and bld[0]["match_geom_type"] == 3
        t, (x, y) = wkbmod.decode(bld[0]["wkb"])
        assert (x, y) == pytest.approx((6.0, 6.0))


class TestDeterminism:
    def test_two_runs_identical(self, ray_session):
        import ray.data
        from osm_export_tool_python_ray.pipelines.export import run_export

        mapping = Mapping(MAPPING_YAML)

        def run():
            docs = ray.data.from_arrow(build_docs())
            rows = run_export(docs, mapping, num_partitions=2, num_buckets=4).take_all()
            return sorted(
                [(r["theme"], r["osm_id"], r["geom_type"], r["wkb"]) for r in rows]
            )

        assert run() == run()


class TestMalformedSpans:
    def test_bad_spans_dropped_not_fatal(self, ray_session, capsys):
        import ray.data
        from osm_export_tool_python_ray.pipelines.export import run_export

        spans = [
            node(1, 1.0, 1.0, {"amenity": "bank"}),
            {"kind": "osm", "text": "{not json", "media_ref": ""},
            {"kind": "osm", "text": '{"type":"node"}', "media_ref": ""},  # no id
            {"kind": "osm", "text": '{"id":9,"type":"alien"}', "media_ref": ""},
            node(2, 2.0, 2.0, {"amenity": "bank"}),
        ]
        docs = ray.data.from_arrow(
            pa.Table.from_pylist([_doc("d", spans)], schema=DOCUMENT_SCHEMA)
        )
        rows = run_export(docs, Mapping(MAPPING_YAML), num_partitions=2, num_buckets=4).take_all()
        assert sorted(r["osm_id"] for r in rows if r["theme"] == "pts") == [1, 2]


class TestDedupLight:
    def test_light_equals_full_shuffle(self, ray_session):
        """Key-only tombstone dedup must produce the same row SET as the
        full-payload shuffle (winner = min (doc_id, offset) per ekey)."""
        import ray.data

        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table
        from osm_export_tool_python_ray.stages.explode import (
            dedup_elements,
            dedup_elements_light,
            explode_osm,
        )

        # dup-heavy corpus: 2 shards with elevated duplicate rate
        docs = generate_corpus_table(n_shards=2)
        import functools
        fn = functools.partial(explode_osm, include_tiles=True)
        exploded = ray.data.from_arrow(docs).map_batches(fn, batch_format="pyarrow")
        full = dedup_elements(exploded, num_buckets=4).take_all()
        exploded2 = ray.data.from_arrow(docs).map_batches(fn, batch_format="pyarrow")
        light = dedup_elements_light(exploded2, num_buckets=4).take_all()

        def keyset(rows):
            return sorted((r["ekey"], r["doc_id"], r["offset"]) for r in rows)

        assert len(full) == len(light)
        assert keyset(full) == keyset(light)

    def test_light_loser_limit_raises(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table
        from osm_export_tool_python_ray.stages.explode import (
            dedup_elements_light,
            explode_osm,
        )

        docs = generate_corpus_table(n_shards=1)
        exploded = ray.data.from_arrow(docs).map_batches(explode_osm, batch_format="pyarrow")
        with pytest.raises(ValueError):
            dedup_elements_light(exploded, num_buckets=4, loser_limit=0)

    def test_parse_elements_fallback(self, ray_session):
        """parse_elements falls back to the full shuffle when the light
        path's broadcast cap is exceeded (monkeypatched tiny cap)."""
        import ray.data

        import osm_export_tool_python_ray.pipelines.export as ex
        import osm_export_tool_python_ray.stages.explode as xp
        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table

        docs = ray.data.from_arrow(generate_corpus_table(n_shards=1))
        baseline = ex.parse_elements(docs, num_buckets=4, dedup_strategy="shuffle").count()
        orig = xp.dedup_elements_light
        def tiny_cap(ds, num_buckets=64, loser_limit=20_000_000):
            return orig(ds, num_buckets=num_buckets, loser_limit=0)
        try:
            xp.dedup_elements_light = tiny_cap
            docs2 = ray.data.from_arrow(generate_corpus_table(n_shards=1))
            n = ex.parse_elements(docs2, num_buckets=4).count()
        finally:
            xp.dedup_elements_light = orig
        assert n == baseline


class TestBroadcastAssembly:
    def test_broadcast_equals_shuffle_export(self, ray_session):
        """Adaptive broadcast assembly (map-only J1/J2) must yield exactly
        the same themed features as the shuffle path."""
        import ray.data

        from osm_export_tool_python_ray.mapping import Mapping
        from osm_export_tool_python_ray.pipelines.export import run_export
        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table

        docs = generate_corpus_table(n_shards=2)
        mapping = Mapping(open(
            "/root/repo/osm_export_tool_python_ray/mappings/default.yml").read())

        def run(limit):
            rows = run_export(
                ray.data.from_arrow(docs), mapping, num_partitions=2,
                num_buckets=8, broadcast_limit_bytes=limit,
            ).take_all()
            return sorted(
                (r["theme"], r["osm_id"], r["geom_type"], r["wkb"]) for r in rows
            )

        via_broadcast = run(8 << 30)
        via_shuffle = run(0)
        assert via_broadcast == via_shuffle
        assert len(via_broadcast) > 0

    def test_broadcast_incomplete_and_invalid_parity(self, ray_session):
        """The pathological corpus cases (incomplete way, dangling-arc
        relation, zero-way-member behavior) behave identically."""
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import parse_elements
        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table
        from osm_export_tool_python_ray.stages.assemble import (
            assemble_ways,
            assemble_ways_broadcast,
        )

        docs = ray.data.from_arrow(generate_corpus_table(n_shards=1))
        elements = parse_elements(docs, num_buckets=4).materialize()

        def nodes():
            return elements.map_batches(
                lambda t: t.filter(pa.compute.equal(t.column("kind"), "node")).select(
                    ["element_id", "lon", "lat"]
                ),
                batch_format="pyarrow",
            )

        def ways():
            return elements.map_batches(
                lambda t: t.filter(pa.compute.equal(t.column("kind"), "way")).select(
                    ["element_id", "refs", "tags", "doc_id", "offset"]
                ),
                batch_format="pyarrow",
            )

        a = assemble_ways_broadcast(ways(), nodes()).take_all()
        b = assemble_ways(ways(), nodes(), num_partitions=2, num_buckets=4).take_all()

        def norm(rows):
            return sorted(
                (r["way_id"], tuple(r["lons"]) if r["complete"] else None,
                 r["n_pts"], r["complete"], r["is_closed"])
                for r in rows
            )

        assert len(a) == len(b)
        assert norm(a) == norm(b)
        # the corpus plants one incomplete way per shard
        assert any(not r["complete"] for r in a)


class TestExchangeStrategies:
    """The three exchange implementations (sort / hash / task) must be
    result-identical — same deduped elements, same export features."""

    def test_dedup_equivalence_across_strategies(self, ray_session):
        import ray.data

        import osm_export_tool_python_ray.stages.exchange as EX
        from osm_export_tool_python_ray.pipelines.export import parse_elements
        from osm_export_tool_python_ray.sources.corpus import generate_corpus_table

        docs = ray.data.from_arrow(generate_corpus_table(n_shards=6, density=2.0))
        prev = EX._ENV_STRATEGY
        outs = {}
        try:
            for mode in ("sort", "hash", "task"):
                EX._ENV_STRATEGY = mode
                t = (
                    parse_elements(docs, num_buckets=8)
                    .to_pandas()
                    .sort_values(["ekey", "doc_id", "offset"])
                    .reset_index(drop=True)
                )
                outs[mode] = t[["ekey", "kind", "element_id", "doc_id", "offset"]]
        finally:
            EX._ENV_STRATEGY = prev
        assert len(outs["sort"]) > 0
        assert outs["sort"].equals(outs["hash"])
        assert outs["sort"].equals(outs["task"])


class TestAdaptiveStrategy:
    """The A/B harness for the width heuristic: choose_strategy must pick
    the MEASURED winner for both payload classes from the round-3 A/B
    (heavy nested export payloads → sort, light flat tile rows → hash),
    and the precedence chain must hold."""

    def test_heavy_nested_payload_picks_sort(self):
        import pyarrow as pa

        from osm_export_tool_python_ray.stages.exchange import choose_strategy

        # the export dedup/assembly exchange payload class: ids + nested
        # tags map + refs list (measured: sort wins ~2x)
        heavy = pa.schema(
            [
                ("ekey", pa.int64()),
                ("element_id", pa.int64()),
                ("tags", pa.map_(pa.string(), pa.string())),
                ("refs", pa.list_(pa.int64())),
                ("bucket", pa.int32()),
            ]
        )
        assert choose_strategy(heavy) == "sort"

    def test_light_flat_payload_picks_hash(self):
        from osm_export_tool_python_ray.stages.exchange import choose_strategy
        from osm_export_tool_python_ray.stages.tiling import TILE_EXCHANGE_SCHEMA

        # the ACTUAL tile-assignment exchange schema (measured: hash wins
        # ~2x) — the call site passes this very constant, no hardcoding
        assert choose_strategy(TILE_EXCHANGE_SCHEMA) == "hash"

    def test_wide_flat_payload_counts_as_heavy(self):
        import pyarrow as pa

        from osm_export_tool_python_ray.stages.exchange import choose_strategy

        wide = pa.schema([("s%d" % i, pa.string()) for i in range(16)])
        assert choose_strategy(wide) == "sort"

    def test_unknown_schema_defaults_to_sort(self):
        from osm_export_tool_python_ray.stages.exchange import choose_strategy

        assert choose_strategy(None) == "sort"

    def test_precedence_env_beats_explicit_beats_schema(self):
        import osm_export_tool_python_ray.stages.exchange as EX
        from osm_export_tool_python_ray.stages.tiling import TILE_EXCHANGE_SCHEMA

        prev = EX._ENV_STRATEGY
        try:
            EX._ENV_STRATEGY = None
            # schema alone → heuristic
            assert EX.resolve_strategy(None, TILE_EXCHANGE_SCHEMA, None) == "hash"
            # explicit beats schema
            assert EX.resolve_strategy("sort", TILE_EXCHANGE_SCHEMA, None) == "sort"
            # nothing known → sort
            assert EX.resolve_strategy(None, None, None) == "sort"
            # env override beats everything
            EX._ENV_STRATEGY = "task"
            assert EX.resolve_strategy("sort", TILE_EXCHANGE_SCHEMA, None) == "task"
        finally:
            EX._ENV_STRATEGY = prev

    def test_task_path_warns_on_dropped_kwargs(self, ray_session):
        import warnings

        import pyarrow as pa
        import ray.data

        from osm_export_tool_python_ray.stages.exchange import grouped_map

        ds = ray.data.from_arrow(
            pa.table({"bucket": [0, 1, 0], "v": [1, 2, 3]})
        )
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out = grouped_map(
                ds,
                "bucket",
                lambda t: t,
                num_partitions=2,
                strategy="task",
                concurrency=2,  # silently unsupported on the task path
            )
            assert out.count() == 3
        assert any("task" in str(w.message) for w in rec)


class TestKeyedSum:
    """keyed_sum (stages/exchange.py): the vectorized replacement for
    groupby(keys).aggregate(Sum) on int64 keys — equivalence with ray's
    own aggregate on randomized input, negative keys, multi-sum columns,
    hot-key skew, and empty input."""

    @staticmethod
    def _ref(rows, nkeys, nsums):
        from collections import defaultdict

        acc = defaultdict(lambda: [0] * nsums)
        for r in rows:
            k = tuple(r[:nkeys])
            for i in range(nsums):
                acc[k][i] += r[nkeys + i]
        return {k: tuple(v) for k, v in acc.items()}

    def _run(self, rows, keys, sums):
        import pyarrow as pa
        import ray.data

        from osm_export_tool_python_ray.stages.exchange import keyed_sum

        nk = len(keys)
        cols = {k: pa.array([r[i] for r in rows], type=pa.int64())
                for i, k in enumerate(keys)}
        for j, (c, _a) in enumerate(sums):
            cols[c] = pa.array([r[nk + j] for r in rows], type=pa.int64())
        out = keyed_sum(
            ray.data.from_arrow(pa.table(cols)), keys=keys, sums=sums,
            num_buckets=4, num_partitions=2,
        ).take_all()
        return {
            tuple(r[k] for k in keys): tuple(r[a] for _c, a in sums)
            for r in out
        }

    def test_matches_bruteforce_random(self, ray_session):
        rng = np.random.RandomState(3)
        rows = [
            (int(a), int(b), int(v), int(w))
            for a, b, v, w in zip(
                rng.randint(-50, 50, 500),     # negative keys exercised
                rng.randint(0, 7, 500),
                rng.randint(-100, 100, 500),
                rng.randint(0, 10, 500),
            )
        ]
        got = self._run(rows, ["ka", "kb"], [("v", "sv"), ("w", "sw")])
        assert got == self._ref(rows, 2, 2)

    def test_hot_key_skew(self, ray_session):
        rows = [(1, 1, 1)] * 3000 + [(2, 9, 5)]
        got = self._run(rows, ["ka", "kb"], [("v", "sv")])
        assert got == {(1, 1): (3000,), (2, 9): (5,)}

    def test_empty_input(self, ray_session):
        got = self._run([], ["ka"], [("v", "sv")])
        assert got == {}
