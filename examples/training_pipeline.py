"""Composed training-data pipeline example: the engine's LLM-data
operators chained the way a corpus-preparation run would chain them —

    exact dedup → near-dup representative filter (MinHash-LSH
    components) → quality gates (language, unigram logprob) →
    decontamination → sequence packing

Every stage is a streaming Ray Data transform and the stages are
composed with DATASET JOINS, not driver-side sets: the five per-doc
stage outputs are merged through ONE doc_id-bucket exchange
(``stages/joins.py multi_join`` — they all share the key, so
re-partitioning per pairwise join would move the same rows five times),
the quality gate is one vectorized filter, and the pack mapping is a
keyed ``bucket_join``. The only driver-side values are the printed
COUNTS (each a distributed aggregate). This is the scale-true pattern
to copy; the same composition is oracle-checked end-to-end as the
``training_kept_docs`` driver query (pipelines/queries.py).

Run from the repo root:

    python examples/training_pipeline.py [sf_dir]

(defaults to /root/testdata/sf0.001)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import ray

from osm_export_tool_python_ray.pipelines.queries import (
    QUERIES,
    q_training_kept_docs,
)
from osm_export_tool_python_ray.stages.joins import bucket_join


def main(sf_dir):
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)

    # stages 1-4 in one composed lineage: exact dedup → near-dup
    # representative filter → lang/logprob gates → decontamination.
    # multi_join co-locates all five per-doc outputs with a single
    # doc_id%B exchange; the gate is one vectorized filter.
    kept = q_training_kept_docs(sf_dir).materialize()
    print("exact dedup winners surviving every gate: %d docs kept" % kept.count())

    # stage 5: map kept docs onto 2048-token training windows — a keyed
    # join against the prefix-scan pack assignment, then a distributed
    # distinct-count of the windows actually hit.
    packs = QUERIES["pack_assignment"](sf_dir)
    i64 = pa.int64()
    kept_ids = kept.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )
    joined = bucket_join(
        kept_ids,
        packs.map_batches(
            lambda t: t.select(["doc_id", "pack_id"]), batch_format="pyarrow"
        ),
        key="doc_id",
        num_buckets=16,
        left_schema=pa.schema([("doc_id", i64)]),
        right_schema=pa.schema([("doc_id", i64), ("pack_id", i64)]),
    )
    n_packs = joined.groupby("pack_id").count().count()
    print("packed into %d windows" % n_packs)

    sample = kept.take(5)
    for r in sample:
        print(
            "  kept doc %d: lang=%s lp_micro=%d n_dups=%d"
            % (r["doc_id"], r["lang_pred"], r["lp_micro"], r["n_dups"])
        )

    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
