"""Benchmark-overlap decontamination (GPT-3 / Gopher appendix style):
flag training documents that share any word n-gram with a held-out
evaluation slice, so they can be dropped before training.

Scale shape: the evaluation set is SMALL relative to the corpus (eval
suites hold ~10^6–10^8 distinct grams vs ~10^12 training docs), so its
distinct gram keys are collected once on the driver, sorted, and
broadcast with ``ray.put`` — the flag stage is then a stateless
``map_batches`` doing a vectorized ``searchsorted`` membership probe per
batch. NO shuffle touches the big side; the only all-to-all in the whole
operator is the tiny benchmark-gram collection.

Gram semantics mirror ``stages/dedup.py ngram_jaccard_pairs`` (lowered
``\\S+`` tokens, n-token windows, whole-doc gram for 1..n-1-token docs,
DISTINCT per doc) via the shared ``word_ngram_hashes_batch`` kernel, so
the DuckDB oracle re-derives the same sets from gram STRINGS — a u64
key collision would surface there as a count mismatch.

Reference analog: none (engine mandate — reference is an OSM exporter).
"""

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa

from osm_export_tool_python_ray.functions.text import word_ngram_hashes_batch


def benchmark_gram_keys(docs_ds, n=5, bench_mod=97):
    """Distinct word-n-gram keys of the benchmark slice
    (doc_id % bench_mod == 0) as a SORTED uint64 array — the broadcast
    small side. In a real pipeline the eval set is its own (small) table;
    here it is a deterministic slice of the corpus so tests and oracle
    agree on membership without external data."""
    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % bench_mod == 0))
        keys, _off = word_ngram_hashes_batch(sub.column("text").to_pylist(), n=n)
        return pa.table({"key": pa.array(np.unique(keys), type=pa.uint64())})

    parts = docs_ds.map_batches(bench_grams, batch_format="pyarrow").take_all()
    if not parts:
        return np.array([], dtype=np.uint64)
    return np.unique(np.fromiter((r["key"] for r in parts), dtype=np.uint64))


def decontaminate(docs_ds, n=5, bench_mod=97):
    """→ (doc_id, n_overlap, contaminated) for every NON-benchmark doc:
    n_overlap = how many of the doc's distinct n-grams appear anywhere in
    the benchmark slice. ``docs_ds`` needs columns (doc_id, text)."""
    import ray

    keys_ref = ray.put(benchmark_gram_keys(docs_ds, n=n, bench_mod=bench_mod))

    def flag(t: pa.Table) -> pa.Table:
        keys = cached_get(keys_ref)  # zero-copy read from the object store
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % bench_mod != 0))
        gk, off = word_ngram_hashes_batch(sub.column("text").to_pylist(), n=n)
        if len(keys) and len(gk):
            pos = np.searchsorted(keys, gk)
            hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == gk)
        else:
            hit = np.zeros(len(gk), dtype=bool)
        csum = np.concatenate([[0], np.cumsum(hit)])
        n_overlap = (csum[off[1:]] - csum[off[:-1]]).astype(np.int64)
        return pa.table(
            {
                "doc_id": sub.column("doc_id"),
                "n_overlap": pa.array(n_overlap),
                "contaminated": pa.array(n_overlap > 0),
            }
        )

    return docs_ds.map_batches(flag, batch_format="pyarrow")
