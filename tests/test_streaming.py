"""Streaming single-DAG export must produce EXACTLY the staged pipeline's
output (same features, same themes, same WKB bytes)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_export_tool_python_ray.mapping import Mapping


@pytest.fixture(scope="module")
def corpus(ray_session):
    from osm_export_tool_python_ray.sources.corpus import generate_corpus_table

    return generate_corpus_table(n_shards=3)


def _canon(rows):
    return sorted(
        (r["theme"], int(r["osm_id"]), int(r["geom_type"]), r["wkb"])
        for r in rows
        if r["theme"] != "__tile__"
    )


class TestStreamingEquivalence:
    def test_matches_staged(self, ray_session, corpus):
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import run_export
        from osm_export_tool_python_ray.pipelines.streaming import run_export_streaming

        mapping = Mapping(
            open("/root/repo/osm_export_tool_python_ray/mappings/default.yml").read()
        )
        staged = run_export(
            ray.data.from_arrow(corpus), mapping, num_partitions=2, num_buckets=8
        ).take_all()
        streaming = run_export_streaming(
            ray.data.from_arrow(corpus), mapping, num_buckets=8
        ).take_all()
        assert _canon(streaming) == _canon(staged)
        assert len(_canon(staged)) > 100

    def test_with_aoi_and_centroid(self, ray_session, corpus):
        import ray.data

        from osm_export_tool_python_ray.pipelines.export import run_export
        from osm_export_tool_python_ray.pipelines.streaming import run_export_streaming

        mapping = Mapping(
            open("/root/repo/osm_export_tool_python_ray/mappings/default.yml").read()
        )
        aoi = [[np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])]]
        staged = run_export(
            ray.data.from_arrow(corpus), mapping, aoi_polygons=aoi,
            polygon_centroid=True, num_partitions=2, num_buckets=8,
        ).take_all()
        streaming = run_export_streaming(
            ray.data.from_arrow(corpus), mapping, aoi_polygons=aoi,
            polygon_centroid=True, num_buckets=8,
        ).take_all()
        assert _canon(streaming) == _canon(staged)

    def test_tiles_exit(self, ray_session, corpus):
        import ray.data

        from osm_export_tool_python_ray.pipelines.streaming import run_export_streaming
        from osm_export_tool_python_ray.stages.explode import explode_tiles
        from osm_export_tool_python_ray.stages.tiling import dedup_tiles

        mapping = Mapping("t:\n  select:\n    - name\n")
        out = run_export_streaming(
            ray.data.from_arrow(corpus), mapping, num_buckets=8, include_tiles=True
        ).take_all()
        tile_rows = [r for r in out if r["theme"] == "__tile__"]
        expected = dedup_tiles(
            ray.data.from_arrow(corpus).map_batches(explode_tiles, batch_format="pyarrow"),
            num_buckets=4,
        ).take_all()
        assert sorted(r["media_ref"] for r in tile_rows) == sorted(
            r["media_ref"] for r in expected
        )


class TestBroadcastCache:
    """Per-worker memo for broadcast ray.put objects (state/broadcast.py):
    VERDICT r3 cosmetic #3 — stage closures fetch the broadcast once per
    worker process, not once per batch, and the memo is a bounded LRU so
    long-lived workers don't pin dead broadcasts."""

    def test_cached_get_memoizes_and_bounds(self, ray_session):
        import ray

        from osm_export_tool_python_ray.state import broadcast as bc

        bc._cache.clear()
        ref = ray.put((1, 2, 3))
        a = bc.cached_get(ref)
        b = bc.cached_get(ref)
        assert a is b == (1, 2, 3)
        assert len(bc._cache) == 1
        # LRU bound: inserting > _MAX_ENTRIES distinct refs evicts the oldest
        refs = [ray.put(i) for i in range(bc._MAX_ENTRIES + 2)]
        for r in refs:
            bc.cached_get(r)
        assert len(bc._cache) == bc._MAX_ENTRIES
        assert ref.hex() not in bc._cache  # the first entry was evicted
        # evicted entries are re-fetchable
        assert bc.cached_get(ref) == (1, 2, 3)

    def test_cached_get_inside_map_batches(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray

        from osm_export_tool_python_ray.state.broadcast import cached_get

        lookup_ref = ray.put(np.arange(10, dtype=np.int64) * 100)

        def add_lookup(t: pa.Table) -> pa.Table:
            lk = cached_get(lookup_ref)
            v = t.column("k").to_numpy(zero_copy_only=False)
            return t.append_column("v", pa.array(lk[v]))

        ds = ray.data.from_items([{"k": i % 10} for i in range(50)])
        out = ds.map_batches(add_lookup, batch_format="pyarrow").take_all()
        assert all(r["v"] == r["k"] * 100 for r in out)
