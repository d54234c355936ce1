"""FIXTURES.md F7 golden outputs: pinned expected results for the fixed
1-shard corpus with default.yml — any unintended change to the generator,
parser, assembly, matcher or router breaks these exact numbers."""

import pytest

from osm_export_tool_python_ray.mapping import Mapping

# golden per-(theme, geom_type) feature counts for corpus shard 0
# (seed 42, density 1.0, docs_per_shard 32) with mappings/default.yml.
GOLDEN_THEME_COUNTS = {
    ("amenities", 1): 9,
    ("barrierpoints", 1): 2,
    ("barrierways", 2): 4,
    ("buildings", 3): 5,
    ("landusages", 3): 4,
    ("places", 1): 5,
    ("roads", 2): 9,
    ("transport_points", 1): 4,
    ("waterareas", 3): 3,
    ("waterways", 2): 2,
}


@pytest.fixture(scope="module")
def golden_run(ray_session):
    import ray.data

    from osm_export_tool_python_ray.pipelines.export import run_export
    from osm_export_tool_python_ray.sources.corpus import generate_corpus_table

    docs = ray.data.from_arrow(generate_corpus_table(n_shards=1))
    with open("/root/repo/osm_export_tool_python_ray/mappings/default.yml") as f:
        mapping = Mapping(f.read())
    return run_export(docs, mapping, num_partitions=2, num_buckets=8).take_all()


def test_theme_counts_golden(golden_run):
    from collections import Counter

    got = Counter((r["theme"], r["geom_type"]) for r in golden_run)
    assert dict(got) == GOLDEN_THEME_COUNTS


def test_feature_id_sum_golden(golden_run):
    """Checksum over osm_ids × theme hash — pins exact feature identity,
    not just counts."""
    acc = 0
    for r in golden_run:
        acc = (acc + r["osm_id"] * (hashlibs(r["theme"]) % 1000003)) % (2**61 - 1)
    assert acc == 33032804400370460


def hashlibs(s):
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
