"""Mergeable cardinality / frequency sketches — HyperLogLog and
Count-Min over the token stream of a document corpus. The two
fixed-size summaries a 100 TB ingest actually runs: "how many distinct
tokens/URLs does this crawl have" (HLL) and "how often does term X
occur" (CMS point estimates) without materializing the term table.

Both sketches are COMBINER-shaped: every input batch collapses to a
constant-size partial (64 register rows / depth×width cell rows) before
the one tiny ``groupby``, so the exchange moves O(sketch) rows per
block regardless of corpus size, and partial sketches merge by
max / sum — the associative property that makes them cluster-safe.

Both are exactly DuckDB-re-derivable (no float estimator in the compare
surface): the hash family is the engine's oracle-proven md5-le64
(``_le64_expr`` — bloom.py's Kirsch–Mitzenmacher double hashing for
CMS; the raw h1 for HLL), and every output column is integer
arithmetic, including the HLL estimate, which is published as an exact
integer floor division of scaled integers (the 2^-rank harmonic sum is
a sum of powers of two — exact when scaled by 2^53).

No reference analog (the reference has no sketch family) — engine
mandate, "a novel sketch" per the custom-operator tier.
"""

import hashlib

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions.text import _TOKEN_RE

# --- HyperLogLog parameters (Flajolet et al. 2007) -----------------------
HLL_P = 6                     # 2^6 = 64 registers
HLL_M = 1 << HLL_P
# rank domain: bits [6, 58) of the 64-bit hash — 52 bits, chosen so the
# float64 frexp bit-length trick below is EXACT (values < 2^53)
HLL_RANK_BITS = 52
HLL_MAX_RANK = HLL_RANK_BITS + 1     # all-zero window
# alpha_64 = 0.709 (the m=64 constant from the HLL paper); the estimate
# is E = alpha*m^2 / sum_j 2^-M_j == ALPHA_NUM / (1000 * denom_scaled)
# with denom_scaled = sum_j 2^(53 - M_j) — all integers.
HLL_ALPHA_NUM = 709 * HLL_M * HLL_M * (1 << 53)

# --- Count-Min parameters (Cormode & Muthukrishnan 2005) -----------------
CMS_DEPTH = 4
CMS_WIDTH = 512


def _token_hashes(tokens):
    """(h1, h2) uint64 per token string — md5 bytes [0:8)/[8:16)
    little-endian, the corpus-wide stable family every oracle re-derives
    via ``_le64_expr`` (same convention as bloom.py `_doc_hashes`).
    md5-per-DISTINCT-token is the accepted fingerprint cost tier."""
    n = len(tokens)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    for i, t in enumerate(tokens):
        d = hashlib.md5(t.encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:16], "little")
    return h1, h2


def _hll_ranks(h1):
    """(register, rank) per hash: register = top 6 bits, rank = position
    of the leftmost 1-bit in the next 52 bits (1-based; 53 when all
    zero). Bit length via float64 frexp — exact below 2^53."""
    reg = (h1 >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = (h1 >> np.uint64(HLL_P)) & np.uint64((1 << HLL_RANK_BITS) - 1)
    _, exp = np.frexp(w.astype(np.float64))
    rank = np.where(w == 0, HLL_MAX_RANK, HLL_RANK_BITS + 1 - exp).astype(np.int64)
    return reg, rank


def hll_distinct_tokens(docs_ds):
    """Approximate distinct-token count of the corpus → ONE row
    ``(nnz, denom_scaled, estimate)``, all int64:

    - ``nnz``: non-empty registers (the sketch's fill state),
    - ``denom_scaled``: sum_j 2^(53 - M_j) with M_j = 0 for empty
      registers — the harmonic denominator scaled to an exact integer,
    - ``estimate``: floor(alpha_64 * m^2 / (denom_scaled / 2^53)) — the
      RAW HLL estimator (no small/large-range correction; documented),
      exact integer floor division so numpy and DuckDB agree bit-for-bit.

    Scale shape: per batch, tokens are deduplicated BATCH-locally before
    hashing, then collapsed to ≤64 (register, max rank) rows; the one
    ``groupby("register").max()`` moves ≤ 64×blocks tiny rows. Register
    maxima merge associatively — the same partials a 256-node tree
    reduce would fold."""
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        toks = set()
        for x in texts:
            toks.update(_TOKEN_RE.findall((x or "").lower()))
        if not toks:
            return pa.table(
                {"register": pa.array([], type=pa.int64()),
                 "rank": pa.array([], type=pa.int64())}
            )
        h1, _ = _token_hashes(sorted(toks))
        reg, rank = _hll_ranks(h1)
        regs = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(regs, reg, rank)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {"register": pa.array(nz), "rank": pa.array(regs[nz])}
        )

    merged = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("register")
        .aggregate(Max("rank", alias_name="max_rank"))
    )

    def finish(t: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, dtype=np.int64)
        r = t.column("register").to_numpy(zero_copy_only=False)
        regs[r] = t.column("max_rank").to_numpy(zero_copy_only=False)
        nnz = int((regs > 0).sum())
        denom_scaled = int(sum(1 << (53 - int(m)) for m in regs))
        estimate = HLL_ALPHA_NUM // (1000 * denom_scaled)
        return pa.table(
            {
                "nnz": pa.array([nnz], type=pa.int64()),
                "denom_scaled": pa.array([denom_scaled], type=pa.int64()),
                "estimate": pa.array([estimate], type=pa.int64()),
            }
        )

    # the merged register table is ≤64 rows — a single-block finish is
    # O(sketch), not O(data)
    return merged.repartition(1).map_batches(
        finish, batch_size=None, batch_format="pyarrow"
    )


def cms_token_counts(docs_ds, probes, depth=CMS_DEPTH, width=CMS_WIDTH):
    """Count-Min point estimates for ``probes`` over the corpus token
    OCCURRENCE stream → (term, est) per probe, est = min over depths of
    the probe's cell counter (upward-biased by collisions, never under;
    integer-exact, so the oracle reproduces the bias too).

    Cell of token at depth j: ((h1 + j*h2) mod 2^64) mod width — the
    bloom.py double-hash family. Per batch: ONE md5 per batch-distinct
    token, counts folded with bincount into a ≤depth×width partial; the
    ``groupby(["depth","bucket"]).sum()`` moves O(sketch) rows. Counter
    cells merge by + — associative, cluster-safe."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        counts = {}
        for x in texts:
            for tok in _TOKEN_RE.findall((x or "").lower()):
                counts[tok] = counts.get(tok, 0) + 1
        if not counts:
            return pa.table(
                {"depth": pa.array([], type=pa.int64()),
                 "bucket": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        toks = sorted(counts)
        c = np.fromiter((counts[k] for k in toks), dtype=np.int64, count=len(toks))
        h1, h2 = _token_hashes(toks)
        ds_, bs_, cs_ = [], [], []
        with np.errstate(over="ignore"):
            for j in range(depth):
                cell = ((h1 + np.uint64(j) * h2) % np.uint64(width)).astype(np.int64)
                acc = np.bincount(cell, weights=c, minlength=width).astype(np.int64)
                nz = np.nonzero(acc)[0]
                ds_.append(np.full(len(nz), j, dtype=np.int64))
                bs_.append(nz)
                cs_.append(acc[nz])
        return pa.table(
            {
                "depth": pa.array(np.concatenate(ds_)),
                "bucket": pa.array(np.concatenate(bs_)),
                "cnt": pa.array(np.concatenate(cs_)),
            }
        )

    cells = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["depth", "bucket"])
        .aggregate(Sum("cnt", alias_name="n"))
    )

    probes = list(probes)

    def finish(t: pa.Table) -> pa.Table:
        table = np.zeros((depth, width), dtype=np.int64)
        d = t.column("depth").to_numpy(zero_copy_only=False)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        table[d, b] = t.column("n").to_numpy(zero_copy_only=False)
        h1, h2 = _token_hashes([p.lower() for p in probes])
        ests = []
        with np.errstate(over="ignore"):
            for i in range(len(probes)):
                cells_i = [
                    int(table[j, int((h1[i] + np.uint64(j) * h2[i]) % np.uint64(width))])
                    for j in range(depth)
                ]
                ests.append(min(cells_i))
        return pa.table(
            {
                "term": pa.array(probes, type=pa.string()),
                "est": pa.array(ests, type=pa.int64()),
            }
        )

    # ≤ depth×width rows — single-block finish is O(sketch)
    return cells.repartition(1).map_batches(
        finish, batch_size=None, batch_format="pyarrow"
    )
