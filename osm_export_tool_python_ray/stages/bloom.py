"""Broadcast-Bloom incremental dedup: flag documents of a NEW shard that
(probably) already exist in a BASE corpus, with ZERO shuffle on either
side — the cross-snapshot dedup primitive of a continuously-ingested
training corpus (dedupe today's crawl against last month's corpus
without re-shuffling last month).

    base  ─ map_batches → per-batch partial bitsets ─ tree-fold ┐
                                                   ray.put(bits)│
    new   ─ map_batches probe (broadcast bitset) ───────────────┘

The filter is md5-seeded and fully DETERMINISTIC, so a DuckDB oracle
re-derives the EXACT flag set — including the false positives — from
the same double-hashing arithmetic (pipelines/queries.py
SQL_BLOOM_INCREMENTAL): position_i = (h1 + i·h2) mod 2^64 mod m with
h1/h2 = little-endian u64 of md5(text) bytes [0:8) / [8:16)
(Kirsch–Mitzenmacher double hashing).

Scale shape: a partial bitset is m/8 bytes (default 128 KiB); the fold
is a Dataset-native two-level tree (repartition → per-partition OR →
small driver OR of ≤P rows), so the driver folds O(P) bitsets, not
O(input batches). The probe side is map-only against the ray.put
bitset (plasma shares the one copy per node). False-positive rate is
(1-e^{-kn/m})^k — size ``m_bits`` to the BASE corpus cardinality; the
flag is a candidate filter, not a verdict (verify exact on the ≤FP%
survivors if exactness is required)."""

import hashlib

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 4


def _doc_hashes(texts):
    """(h1, h2) uint64 arrays from md5(text) — bytes [0:8) and [8:16)
    little-endian, the oracle-re-derivable seed family (the engine's
    exact-dedup/md5 conventions; see _le64_expr)."""
    n = len(texts)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.md5(t.encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:16], "little")
    return h1, h2


def _positions(h1, h2, m_bits, k):
    """k double-hashed bit positions per doc, shape (n, k): uint64
    wrapping arithmetic — (h1 + i*h2) mod 2^64 mod m, matching the SQL
    oracle's HUGEINT arithmetic bit for bit."""
    out = np.empty((len(h1), k), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            out[:, i] = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
    return out


def build_bloom(base_ds, text_col="text", m_bits=DEFAULT_M_BITS, k=DEFAULT_K, fold_partitions=8):
    """→ uint64 bitset ndarray (m_bits/64 words) over the base corpus.
    Per-batch partials, Dataset-native tree fold."""
    nwords = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(nwords, dtype=np.uint64)
        texts = t.column(text_col).to_pylist()
        if texts:
            pos = _positions(*_doc_hashes(texts), m_bits, k).ravel()
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(nwords, dtype=np.uint64)
        for buf in t.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], type=pa.binary())})

    folded = (
        base_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(fold_partitions)
        .map_batches(fold, batch_size=None, batch_format="pyarrow")
    )
    acc = np.zeros(nwords, dtype=np.uint64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        for buf in b.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
    return acc


def bloom_probe(new_ds, bits, text_col="text", id_col="doc_id", m_bits=DEFAULT_M_BITS, k=DEFAULT_K):
    """→ (doc_id, bloom_hit) per new-shard doc: hit iff ALL k positions
    are set in the broadcast base bitset. Map-only (no shuffle)."""
    import ray

    bits_ref = ray.put(bits)

    def probe(t: pa.Table) -> pa.Table:
        b = cached_get(bits_ref)
        texts = t.column(text_col).to_pylist()
        if texts:
            pos = _positions(*_doc_hashes(texts), m_bits, k)
            word = b[(pos >> np.uint64(6)).astype(np.int64)]
            hit = ((word >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool).all(axis=1)
        else:
            hit = np.zeros(0, dtype=bool)
        return pa.table({id_col: t.column(id_col), "bloom_hit": pa.array(hit)})

    return new_ds.map_batches(probe, batch_format="pyarrow")
