"""Transient task-failure resilience (north-rule resumability surface,
task level — complements tests/test_partitioned.py's driver-level
kill-and-resume).

On a real multi-node cluster tasks die mid-run (preempted node, OOM-killed
worker, flaky disk). Ray Data re-executes failed tasks from lineage; the
engine's obligation is that its batch transforms are PURE (same batch in →
same rows out, no cross-batch hidden state), so a retried task reproduces
exactly what the lost task would have produced. These tests exercise that
contract end-to-end: a wrapper injects one transient application failure
per task attempt around a real engine stage, runs with
``retry_exceptions``, and asserts the output is row-identical to the clean
run — and that failures actually fired.
"""

import os

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus_path(ray_session, tmp_path_factory):
    from osm_export_tool_python_ray.sources import write_corpus_parquet

    p = str(tmp_path_factory.mktemp("ftcorpus") / "c.parquet")
    write_corpus_parquet(p, n_shards=4)
    return p


class _FlakyExplode:
    """Fails the FIRST attempt for every distinct batch, succeeds on retry.

    Attempt tracking must survive the failing task (task-local state dies
    with it), so it lives in marker files keyed by a content fingerprint of
    the batch — exactly the state a retried task on another node would
    observe via shared storage.
    """

    def __init__(self, marker_dir):
        self.marker_dir = marker_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osm_export_tool_python_ray.stages.explode import explode_osm

        ids = batch.column("doc_id").to_pylist()
        key = "%s_%s_%d" % (ids[0] if ids else "e", ids[-1] if ids else "e", len(ids))
        marker = os.path.join(self.marker_dir, key)
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("1")
            raise RuntimeError("injected transient failure for batch %s" % key)
        return explode_osm(batch)


class TestTransientTaskFailure:
    def test_retried_tasks_reproduce_clean_output(
        self, ray_session, corpus_path, tmp_path
    ):
        import ray.data

        from osm_export_tool_python_ray.stages.explode import explode_osm

        clean = (
            ray.data.read_parquet(corpus_path)
            .map_batches(explode_osm, batch_format="pyarrow")
            .to_pandas()
        )

        marker_dir = str(tmp_path / "attempts")
        os.makedirs(marker_dir, exist_ok=True)
        flaky = (
            ray.data.read_parquet(corpus_path)
            .map_batches(
                _FlakyExplode(marker_dir),
                batch_format="pyarrow",
                # extra kwargs pass through to the underlying @ray.remote task
                retry_exceptions=True,
                max_retries=3,
            )
            .to_pandas()
        )

        # every task attempt failed once before succeeding
        assert len(os.listdir(marker_dir)) >= 1

        key = ["doc_id", "offset", "element_id"]
        c = clean.sort_values(key).reset_index(drop=True)
        f = flaky.sort_values(key).reset_index(drop=True)
        assert len(c) == len(f) and len(c) > 0
        assert c[key].equals(f[key])

    def test_stage_functions_are_pure_on_reexecution(self, ray_session, corpus_path):
        """The property retries rely on: running the same engine batch fn
        twice over the same Arrow batch yields identical rows (no RNG, no
        cross-call accumulation)."""
        import ray.data

        from osm_export_tool_python_ray.stages.explode import (
            explode_osm,
            explode_tiles,
            span_sequence,
        )

        batches = list(
            ray.data.read_parquet(corpus_path).iter_batches(
                batch_size=64, batch_format="pyarrow"
            )
        )
        assert batches
        for fn in (explode_osm, explode_tiles, span_sequence):
            for b in batches[:3]:
                # pandas equals is NaN-aware (parse-time lon/lat of ways/
                # relations are NaN placeholders; pa.Table.equals would
                # report NaN != NaN as a difference)
                assert fn(b).to_pandas().equals(fn(b).to_pandas()), fn.__name__


class TestMalformedInput:
    def test_malformed_spans_dropped_and_counted(self, ray_session):
        """Broken JSON / missing fields in osm spans drop-and-continue
        (reference parity) AND surface through the counted-cap channel —
        a 100 TB run reports its drop count, it doesn't bury it."""
        import pyarrow as pa
        import ray.data

        from osm_export_tool_python_ray.stages.explode import explode_osm
        from osm_export_tool_python_ray.state.metrics import snapshot_caps

        span_t = pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )

        def doc(doc_id, texts):
            return {
                "doc_id": doc_id,
                "spans": [
                    {"kind": "osm", "text": t, "media_ref": "", "offset": i}
                    for i, t in enumerate(texts)
                ],
            }

        good = '{"type": "node", "id": 1, "lon": 1.0, "lat": 2.0, "tags": {}}'
        rows = [
            doc("d1", [good, "{not json", '{"type": "node"}']),
            doc("d2", ['{"type": "spaceship", "id": 9}', good.replace('"id": 1', '"id": 2')]),
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows]),
                "spans": pa.array([r["spans"] for r in rows], type=pa.list_(span_t)),
            }
        )
        snapshot_caps()
        out = ray.data.from_arrow(tbl).map_batches(
            explode_osm, batch_format="pyarrow"
        ).take_all()
        assert sorted(r["element_id"] for r in out) == [1, 2]
        caps = snapshot_caps()
        assert caps.get("explode_malformed_spans", 0) == 3
