"""Per-partition resume: a killed run skips completed partitions and the
final output equals a single-shot run."""

import os

import pytest

from osm_export_tool_python_ray.mapping import Mapping

MAPPING_YAML = """
buildings:
  types:
    - polygons
  select:
    - name
  where: building IS NOT NULL
roads:
  types:
    - lines
  select:
    - highway
"""


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    import ray.data

    from osm_export_tool_python_ray.sources.corpus import corpus_dataset

    d = str(tmp_path_factory.mktemp("pcorpus"))
    corpus_dataset(4, docs_per_shard=8).repartition(4).write_parquet(d)
    return d


class TestPartitionedResume:
    def test_kill_and_resume(self, ray_session, corpus_dir, tmp_path):
        import ray.data

        from osm_export_tool_python_ray.pipelines.partitioned import run_export_partitioned

        mapping = Mapping(MAPPING_YAML)
        wd = str(tmp_path / "wd")

        class Boom(Exception):
            pass

        # first run "dies" after 2 partitions
        def killer(i):
            if i == 1:
                raise Boom()

        with pytest.raises(Boom):
            run_export_partitioned(
                corpus_dir, mapping, wd, num_partitions=4, on_partition_done=killer
            )

        # resume: completed partitions are skipped
        dirs, metrics = run_export_partitioned(
            corpus_dir, mapping, wd, num_partitions=4
        )
        assert metrics["skipped"] == 2
        assert metrics["executed"] == 2
        assert len(dirs) == 4
        assert os.path.exists(os.path.join(wd, "_RUN_METRICS.json"))
        for p in metrics["partitions"]:
            assert "wall_sec" in p or p.get("resumed")

        # equals a single-shot global run
        from osm_export_tool_python_ray.pipelines.export import run_export

        partitioned_rows = []
        for d in dirs:
            partitioned_rows.extend(ray.data.read_parquet(d).take_all())
        single = run_export(
            ray.data.read_parquet(corpus_dir), mapping, num_partitions=2, num_buckets=8
        ).take_all()

        def canon(rows):
            return sorted((r["theme"], r["osm_id"], r["geom_type"], r["wkb"]) for r in rows)

        assert canon(partitioned_rows) == canon(single)


class TestResidualRecovery:
    """Reference-closure breaks: a way in one partition referencing nodes
    in another, and a relation whose member ways live elsewhere, are
    recovered by the residual pass — output equals the global pipeline."""

    def _docs(self):
        import json

        import pyarrow as pa

        from osm_export_tool_python_ray.sources.corpus import DOCUMENT_SCHEMA

        def el(d):
            return {"kind": "osm", "text": json.dumps(d, sort_keys=True), "media_ref": ""}

        def node(i, lon, lat, tags=None):
            d = {"id": i, "type": "node", "lon": lon, "lat": lat}
            if tags:
                d["tags"] = tags
            return el(d)

        def way(i, refs, tags=None):
            d = {"id": i, "type": "way", "refs": refs}
            if tags:
                d["tags"] = tags
            return el(d)

        def rel(i, members, tags):
            return el({"id": i, "type": "relation", "members": members, "tags": tags})

        # docA: nodes + a local complete way; docB: ways/relation whose
        # geometry lives in docA (cross-fragment references)
        spansA = [
            node(1, 0.0, 0.0),
            node(2, 1.0, 0.0),
            node(3, 1.0, 1.0),
            node(4, 0.0, 1.0),
            node(5, 5.0, 5.0, {"amenity": "bank"}),
            node(10, 2.0, 0.0),
            node(11, 3.0, 0.0),
            way(100, [1, 2], {"highway": "residential"}),  # complete in A
            way(101, [1, 2, 3, 4, 1]),  # untagged ring, member of rel 200
        ]
        spansB = [
            # incomplete in partition B: nodes live in A
            way(102, [10, 11], {"highway": "service"}),
            way(103, [1, 2, 3, 4, 1], {"building": "yes", "name": "x"}),
            # relation in B, member way 101 (and its nodes) in A
            rel(
                200,
                [{"type": "way", "ref": 101, "role": "outer"}],
                {"type": "multipolygon", "natural": "water"},
            ),
        ]

        def doc(doc_id, spans):
            return {
                "doc_id": doc_id,
                "spans": [dict(s, offset=i) for i, s in enumerate(spans)],
            }

        return (
            pa.Table.from_pylist([doc("docA", spansA)], schema=DOCUMENT_SCHEMA),
            pa.Table.from_pylist([doc("docB", spansB)], schema=DOCUMENT_SCHEMA),
        )

    @pytest.fixture()
    def split_corpus(self, tmp_path):
        import pyarrow.parquet as pq

        a, b = self._docs()
        d = tmp_path / "corpus"
        d.mkdir()
        pq.write_table(a, str(d / "frag0.parquet"))
        pq.write_table(b, str(d / "frag1.parquet"))
        return str(d)

    def _water_yaml(self):
        return MAPPING_YAML + """
water:
  types:
    - polygons
  select:
    - natural
  where: natural = 'water'
"""

    def test_residual_recovers_cross_partition_refs(
        self, ray_session, split_corpus, tmp_path
    ):
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import run_export
        from osm_export_tool_python_ray.pipelines.partitioned import (
            run_export_partitioned,
        )

        mapping = Mapping(self._water_yaml())
        wd = str(tmp_path / "wd")
        dirs, metrics = run_export_partitioned(
            split_corpus, mapping, wd, num_partitions=2, num_buckets=4
        )
        r = metrics["residual"]
        assert r["residual_ways"] >= 2  # 102 and 103 (101 rides as member)
        assert r["residual_relations"] == 1
        assert os.path.join(wd, "part=residual", "features") in dirs

        partitioned_rows = []
        for d in dirs:
            partitioned_rows.extend(ray.data.read_parquet(d).take_all())
        single = run_export(
            ray.data.read_parquet(split_corpus), mapping, num_partitions=2, num_buckets=4
        ).take_all()

        def canon(rows):
            return sorted(
                (r["theme"], r["osm_id"], r["geom_type"], r["wkb"]) for r in rows
            )

        assert canon(partitioned_rows) == canon(single)
        # the recovered features include the cross-partition way and the
        # relation polygon
        ids = {(r["theme"], r["osm_id"]) for r in partitioned_rows}
        assert ("roads", 102) in ids
        assert ("buildings", 103) in ids
        assert ("water", -200) in ids

    def test_residual_noop_on_closed_partitions(self, ray_session, tmp_path):
        import ray.data

        from osm_export_tool_python_ray.pipelines.partitioned import (
            run_export_partitioned,
        )
        from osm_export_tool_python_ray.sources.corpus import corpus_dataset

        d = str(tmp_path / "closed")
        corpus_dataset(2, docs_per_shard=6).repartition(2).write_parquet(d)
        wd = str(tmp_path / "wd2")
        dirs, metrics = run_export_partitioned(
            d, Mapping(MAPPING_YAML), wd, num_partitions=2, num_buckets=4
        )
        r = metrics["residual"]
        assert r["residual_ways"] == 0 and r["residual_relations"] == 0
        assert not os.path.exists(os.path.join(wd, "part=residual", "features"))

    def test_residual_resume(self, ray_session, split_corpus, tmp_path):
        from osm_export_tool_python_ray.pipelines.partitioned import (
            run_export_partitioned,
        )

        mapping = Mapping(self._water_yaml())
        wd = str(tmp_path / "wd3")
        run_export_partitioned(split_corpus, mapping, wd, num_partitions=2, num_buckets=4)
        _, metrics2 = run_export_partitioned(
            split_corpus, mapping, wd, num_partitions=2, num_buckets=4
        )
        assert metrics2["residual"]["resumed"] is True

    def test_node_only_partition_registered(self, ray_session, tmp_path):
        """A partition with zero ways (no way_geoms files at all) must
        still register its node ids — a way elsewhere referencing them is
        residual-recoverable, not 'globally missing'."""
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import run_export
        from osm_export_tool_python_ray.pipelines.partitioned import (
            run_export_partitioned,
        )
        from osm_export_tool_python_ray.sources.corpus import DOCUMENT_SCHEMA

        def el(d):
            return {"kind": "osm", "text": _json.dumps(d, sort_keys=True), "media_ref": ""}

        # frag0: ONLY nodes; frag1: a way whose nodes live in frag0
        spansA = [
            el({"id": 1, "type": "node", "lon": 0.0, "lat": 0.0}),
            el({"id": 2, "type": "node", "lon": 1.0, "lat": 0.0}),
        ]
        spansB = [el({"id": 100, "type": "way", "refs": [1, 2],
                      "tags": {"highway": "residential"}})]
        d = tmp_path / "corpus2"
        d.mkdir()
        for name, spans in [("frag0", spansA), ("frag1", spansB)]:
            t = pa.Table.from_pylist(
                [{"doc_id": name, "spans": [dict(s, offset=i) for i, s in enumerate(spans)]}],
                schema=DOCUMENT_SCHEMA,
            )
            pq.write_table(t, str(d / (name + ".parquet")))
        mapping = Mapping(MAPPING_YAML)
        wd = str(tmp_path / "wd4")
        dirs, metrics = run_export_partitioned(
            str(d), mapping, wd, num_partitions=2, num_buckets=4
        )
        assert metrics["residual"]["residual_ways"] == 1
        rows = [r for dd in dirs for r in ray.data.read_parquet(dd).take_all()]
        single = run_export(
            ray.data.read_parquet(str(d)), mapping, num_partitions=2, num_buckets=4
        ).take_all()
        canon = lambda rs: sorted((r["theme"], r["osm_id"], r["wkb"]) for r in rs)
        assert canon(rows) == canon(single)
        assert ("roads", 100) in {(r["theme"], r["osm_id"]) for r in rows}

    def test_zero_residual_marker_skips_rescan(self, ray_session, tmp_path):
        import os as _os

        from osm_export_tool_python_ray.pipelines.partitioned import (
            run_export_partitioned,
        )
        from osm_export_tool_python_ray.sources.corpus import corpus_dataset

        d = str(tmp_path / "closed2")
        corpus_dataset(2, docs_per_shard=6).repartition(2).write_parquet(d)
        wd = str(tmp_path / "wd5")
        _, m1 = run_export_partitioned(d, Mapping(MAPPING_YAML), wd, num_partitions=2, num_buckets=4)
        assert m1["residual"]["resumed"] is False
        assert _os.path.exists(_os.path.join(wd, "part=residual", "_RESIDUAL_NONE.json"))
        _, m2 = run_export_partitioned(d, Mapping(MAPPING_YAML), wd, num_partitions=2, num_buckets=4)
        assert m2["residual"]["resumed"] is True
        assert m2["residual"]["residual_ways"] == 0

    def test_fully_scattered_corpus_recovers(self, ray_session, tmp_path):
        """Worst-case closure break: every element becomes its own
        single-span document, scattered round-robin across 3 fragments —
        nearly every way/relation is residual. Partitioned + recovery
        must equal the global pipeline on the same scattered corpus.
        (Duplicate elements are collapsed first: cross-partition
        duplicates are the documented remaining assumption.)"""
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import run_export
        from osm_export_tool_python_ray.pipelines.partitioned import (
            run_export_partitioned,
        )
        from osm_export_tool_python_ray.sources.corpus import (
            DOCUMENT_SCHEMA,
            corpus_dataset,
        )

        docs = corpus_dataset(8, docs_per_shard=4).take_all()
        seen = {}
        for doc in docs:
            for sp in doc["spans"]:
                if sp["kind"] != "osm":
                    continue
                d = _json.loads(sp["text"])
                seen.setdefault((d["type"], d["id"]), sp["text"])
        spans = sorted(seen.items())
        frags = [[] for _ in range(3)]
        for i, ((_k, _eid), text) in enumerate(spans):
            frags[i % 3].append(
                {
                    "doc_id": "scat%05d" % i,
                    "spans": [
                        {"kind": "osm", "text": text, "media_ref": "", "offset": 0}
                    ],
                }
            )
        d = tmp_path / "scattered"
        d.mkdir()
        for fi, rows in enumerate(frags):
            pq.write_table(
                pa.Table.from_pylist(rows, schema=DOCUMENT_SCHEMA),
                str(d / ("frag%d.parquet" % fi)),
            )
        mapping = Mapping(MAPPING_YAML)
        wd = str(tmp_path / "wd_scat")
        dirs, metrics = run_export_partitioned(
            str(d), mapping, wd, num_partitions=3, num_buckets=4
        )
        assert metrics["residual"]["residual_ways"] > 10  # nearly all ways
        rows = [r for dd in dirs for r in ray.data.read_parquet(dd).take_all()]
        single = run_export(
            ray.data.read_parquet(str(d)), mapping, num_partitions=3, num_buckets=4
        ).take_all()
        canon = lambda rs: sorted(
            (r["theme"], r["osm_id"], r["geom_type"], r["wkb"]) for r in rs
        )
        assert canon(rows) == canon(single)
        assert len(rows) > 50
