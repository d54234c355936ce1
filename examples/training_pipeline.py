"""Composed training-data pipeline example: the engine's LLM-data
operators chained the way a corpus-preparation run would chain them —

    exact dedup → near-dup clusters (MinHash-LSH) → quality filters
    (language, repetition, unigram logprob) → decontamination →
    stratified sample → sequence packing

Each stage is a streaming Ray Data transform; nothing materializes the
corpus driver-side. Run from the repo root:

    python examples/training_pipeline.py [sf_dir]

(defaults to /root/testdata/sf0.001)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from osm_export_tool_python_ray.pipelines.queries import QUERIES


def main(sf_dir):
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)

    # 1. exact dedup — winner doc ids (hash-partitioned first-per-content)
    survivors = QUERIES["exact_dedup"](sf_dir)
    keep_exact = set(r["doc_id"] for r in survivors.take_all())
    print("exact dedup: %d survivors" % len(keep_exact))

    # 2. near-dup clusters — drop every non-representative cluster member
    clusters = QUERIES["dedup_clusters"](sf_dir).take_all()
    drop_near = set()
    rep = {}
    for r in clusters:
        c = r["cluster_id"]
        if c in rep:
            drop_near.add(r["doc_id"])
        else:
            rep[c] = r["doc_id"]
    print("near-dup: %d clustered docs dropped" % len(drop_near))

    # 3. quality scores (each a streaming per-batch transform)
    lang = {r["doc_id"]: r["lang_pred"] for r in QUERIES["lang_id"](sf_dir).take_all()}
    # lp_micro = mean unigram logprob in integer micro-nats (ln * 1e6)
    lp = {
        r["doc_id"]: r["lp_micro"]
        for r in QUERIES["unigram_logprob"](sf_dir).take_all()
    }
    contaminated = {
        r["doc_id"]
        for r in QUERIES["decontaminate"](sf_dir).take_all()
        if r["contaminated"]
    }

    kept = [
        d
        for d in sorted(keep_exact - drop_near - contaminated)
        if lang.get(d) == "en" and lp.get(d, -99_000_000) > -9_000_000
    ]
    print("after filters: %d docs kept" % len(kept))

    # 4. pack the kept docs into 2048-token training windows
    packs = QUERIES["pack_assignment"](sf_dir).take_all()
    pack_of = {r["doc_id"]: r["pack_id"] for r in packs}
    n_packs = len({pack_of[d] for d in kept if d in pack_of})
    print("packed into %d windows" % n_packs)

    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
