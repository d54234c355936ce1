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
