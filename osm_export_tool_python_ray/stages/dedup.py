"""Document deduplication family (training-data ops, SURVEY.md mandate):
exact, MinHash-LSH, SimHash, n-gram Jaccard. All shuffles are bucketed
groupbys on int64 keys; signatures/shingles are computed once per doc in
vectorized ``map_batches`` and carried through the shuffle (no re-compute).

Scale notes (10^12-doc design point):
* exact dedup: one shuffle on the 64-bit content-hash bucket; per-group
  work is a vectorized sort+mask.
* MinHash-LSH: band rows are (band_key, doc_id) — 16 rows/doc; hot bands
  (boilerplate text) are CAPPED at ``max_group`` candidates with a counter,
  the standard guard against quadratic blowup on degenerate buckets.
* pair outputs are canonical (a < b) and deduped, so results are
  deterministic under any parallelism.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.state.metrics import report_cap
from osm_export_tool_python_ray.stages.exchange import grouped_map

from osm_export_tool_python_ray.functions.text import (
    fingerprint,
    hash_bytes,
    hash_rows_u64,
    hash_strings_128,
    minhash_params,
    minhash_signatures_batch,
    popcount64,
    simhash_batch,
    word_ngram_hashes_batch,
    word_ngrams,
)

PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("similarity", pa.float64())]
)


def _bucket_on(col, num_buckets):
    def fn(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket", pa.array((v % np.uint64(num_buckets)).astype(np.int32))
        )

    return fn


def exact_dedup(docs_ds, num_buckets=64):
    """→ (doc_id, n_dups): one row per distinct raw text, keeping the
    minimal doc_id (deterministic winner). Oracle: GROUP BY md5(text).

    Content key = vectorized 128-bit hash (``hash_strings_128`` — no
    per-row Python for short texts, collision-safe unlike a 64-bit
    truncation at the 10^12-doc design point)."""

    def add_hash(t: pa.Table) -> pa.Table:
        h1, h2 = hash_strings_128(t.column("text"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "h1": pa.array(h1, type=pa.uint64()),
                "h2": pa.array(h2, type=pa.uint64()),
            }
        )

    def first_per_hash(g: pa.Table) -> pa.Table:
        g = g.sort_by([("h1", "ascending"), ("h2", "ascending"), ("doc_id", "ascending")])
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        first = (
            np.concatenate([[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])
            if len(h1)
            else np.array([], dtype=bool)
        )
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, len(h1)))
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)[starts]
        return pa.table(
            {"doc_id": pa.array(ids), "n_dups": pa.array(counts.astype(np.int64))}
        )

    return grouped_map(
        docs_ds.map_batches(add_hash, batch_format="pyarrow")
        .map_batches(_bucket_on("h1", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda g: first_per_hash(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
    )


class _SignatureStage:
    """doc batch → (doc_id, sig list<uint64>) — MinHash signatures; the
    permutation seeds are built once per stage instance (broadcast)."""

    def __init__(self, num_perm=64, shingle_k=5, seed=42):
        self.seeds = minhash_params(num_perm, seed)
        self.k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        arr = minhash_signatures_batch(texts, self.seeds, self.k)
        n, p = arr.shape
        offsets = pa.array(np.arange(0, (n + 1) * p, p, dtype=np.int32))
        vals = pa.array(arr.reshape(-1), type=pa.uint64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sig": pa.ListArray.from_arrays(offsets, vals),
            }
        )


def _pairs_from_groups(keys, ids, payload=None, max_group=256):
    """Sorted candidate groups → canonical unique pair arrays."""
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    pl = payload[order] if payload is not None else None
    first = np.concatenate([[True], keys[1:] != keys[:-1]]) if len(keys) else np.array([], dtype=bool)
    starts = np.nonzero(first)[0]
    ends = np.append(starts[1:], len(keys))
    out_a, out_b, pl_a, pl_b = [], [], [], []
    skipped = 0
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > max_group:
            skipped += 1
            continue
        gi = ids[s:e]
        iu, ju = np.triu_indices(m, k=1)
        out_a.append(gi[iu])
        out_b.append(gi[ju])
        if pl is not None:
            gp = pl[s:e]
            pl_a.append(gp[iu])
            pl_b.append(gp[ju])
    if not out_a:
        z = np.array([], dtype=np.int64)
        return z, z, (z, z) if payload is not None else None, skipped
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    pls = (np.concatenate(pl_a), np.concatenate(pl_b)) if payload is not None else None
    return lo, hi, pls, skipped


def minhash_lsh_pairs(docs_ds, num_perm=64, bands=16, threshold=0.5, shingle_k=5, num_buckets=64, max_group=256):
    """Near-duplicate pairs by MinHash-LSH: signature → band rows →
    groupby(band key) → candidate pairs → similarity = matching-permutation
    fraction (the unbiased Jaccard estimator) ≥ threshold → global pair
    dedup. Carries the full signature on band rows (num_perm·8 B) so
    verification happens inside the same shuffle — no second join."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sig_stage = _SignatureStage(num_perm, shingle_k)

    def band_rows(t: pa.Table) -> pa.Table:
        st = sig_stage(t)
        ids = st.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        sig = np.asarray(st.column("sig").combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(n, num_perm)
        keys = []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            # vectorized band key: fold the band's uint64 lanes with the
            # band index as salt (replaces the per-row md5 loop — only
            # group identity matters, as with the reference of the oracle)
            keys.append(hash_rows_u64(chunk, salt=np.uint64(b)))
        bk = np.concatenate(keys) if keys else np.array([], dtype=np.uint64)
        rep_ids = np.tile(ids, bands)
        rep_sig = np.tile(sig, (bands, 1))
        offsets = pa.array(np.arange(0, (len(rep_ids) + 1) * num_perm, num_perm, dtype=np.int32))
        return pa.table(
            {
                "band_key": pa.array(bk, type=pa.uint64()),
                "doc_id": pa.array(rep_ids),
                "sig": pa.ListArray.from_arrays(offsets, pa.array(rep_sig.reshape(-1), type=pa.uint64())),
            }
        )

    def group_pairs(g: pa.Table) -> pa.Table:
        keys = g.column("band_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        sig = np.asarray(g.column("sig").combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(n, num_perm)
        idx = np.arange(n)
        lo, hi, pls, _sk = _pairs_from_groups(keys, idx, payload=idx, max_group=max_group)
        report_cap("minhash_hot_band_groups_skipped", _sk)
        if len(lo) == 0:
            return pa.table({n_: pa.array([], type=t_) for n_, t_ in zip(PAIR_SCHEMA.names, PAIR_SCHEMA.types)})
        ia, ib = pls
        sim = (sig[ia] == sig[ib]).mean(axis=1)
        keep = sim >= threshold
        a = np.minimum(ids[ia[keep]], ids[ib[keep]])
        b = np.maximum(ids[ia[keep]], ids[ib[keep]])
        return pa.table(
            {
                "doc_a": pa.array(a.astype(np.int64)),
                "doc_b": pa.array(b.astype(np.int64)),
                "similarity": pa.array(sim[keep]),
            }
        )

    candidates = grouped_map(
        docs_ds.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(_bucket_on("band_key", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda g: group_pairs(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
    )
    return dedup_pairs(candidates, num_buckets=num_buckets)


def dedup_pairs(pairs_ds, num_buckets=64):
    """Canonical pair dedup: groupby hash(doc_a,doc_b), keep first."""

    def add_key(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = a * np.uint64(0x9E3779B97F4A7C15) ^ b
        return t.append_column("pkey", pa.array(key, type=pa.uint64()))

    def first(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])]) if len(a) else np.array([], dtype=bool)
        return g.filter(pa.array(keep)).drop_columns(["bucket", "pkey"])

    return grouped_map(
        pairs_ds.map_batches(add_key, batch_format="pyarrow")
        .map_batches(_bucket_on("pkey", num_buckets), batch_format="pyarrow"),
        "bucket",
        first,
        num_partitions=min(num_buckets, 32),
    )


def dedup_clusters(pairs_ds, num_buckets=64, max_rounds=16, driver_limit=2_000_000):
    """Near-duplicate pair list → connected components: (doc_id,
    cluster_id) with cluster_id = min doc_id of the component.

    Pair sets are tiny relative to the corpus (LSH output), so when the
    count is provably small (≤ ``driver_limit``) a vectorized union-find
    runs on the driver — the guide-sanctioned shortcut. Larger pair sets
    fall back to distributed min-label propagation: each round every node
    takes the min label in its neighborhood (one bucketed groupby over
    edge+label rows), converging in O(component diameter) rounds with
    ``max_rounds`` bounding pathological chains; labels never land on the
    driver in that path."""
    import ray.data
    from ray.data.aggregate import Max, Sum

    # Execute the (expensive) pair lineage exactly ONCE: Ray Datasets
    # re-execute lineage per consumption, and this function consumes the
    # pairs twice (count, then iter_batches / seed).  Pair sets are tiny
    # relative to the corpus by construction (LSH band output), so holding
    # them in the object store is cheap; without this the full MinHash
    # signature+shuffle+verify pipeline ran 2-3x per clustering call.
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs <= driver_limit:
        tbl = pa.concat_tables(
            [b for b in pairs_ds.select_columns(["doc_a", "doc_b"]).iter_batches(batch_format="pyarrow")]
        ) if n_pairs else pa.table({"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())})
        a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
        b = tbl.column("doc_b").to_numpy(zero_copy_only=False)
        nodes = np.unique(np.concatenate([a, b])) if len(a) else np.array([], dtype=np.int64)
        # vectorized connected components: min-label propagation over the
        # edge arrays + pointer jumping — O(E · log C) numpy ops, no
        # per-edge Python (2M edges converge in a handful of rounds)
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        label = np.arange(len(nodes))
        while True:
            m = np.minimum(label[ia], label[ib])
            new = label.copy()
            np.minimum.at(new, ia, m)
            np.minimum.at(new, ib, m)
            while True:  # pointer jumping to the current root
                jumped = new[new]
                if np.array_equal(jumped, new):
                    break
                new = jumped
            if np.array_equal(new, label):
                break
            label = new
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(nodes), "cluster_id": pa.array(nodes[label])})
        )

    # edges both directions + self labels
    def seed(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        peer = np.concatenate([b, a])
        return pa.table({"node": pa.array(node), "peer": pa.array(peer)})

    edges = pairs_ds.map_batches(seed, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy(zero_copy_only=False)
        u = np.unique(n)
        return pa.table({"node": pa.array(u), "label": pa.array(u)})

    labels = edges.map_batches(init_labels, batch_format="pyarrow")
    labels = _dedup_label_rows(labels, num_buckets)

    for _round in range(max_rounds):
        # join labels onto edges by node, emit (peer, node_label) proposals,
        # then per node take min(own, proposals)
        from osm_export_tool_python_ray.stages.joins import bucket_join

        lbl_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
        edge_schema = pa.schema([("node", pa.int64()), ("peer", pa.int64())])
        with_lbl = bucket_join(
            edges, labels, "node", num_buckets=num_buckets, how="inner",
            left_schema=edge_schema, right_schema=lbl_schema,
        )

        def proposals(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("peer"),
                    "label": t.column("label"),
                    "own": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                }
            )

        def own_rows(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    "label": t.column("label"),
                    "own": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            )

        def reduce_min(g: pa.Table) -> pa.Table:
            node = g.column("node").to_numpy(zero_copy_only=False)
            lbl = g.column("label").to_numpy(zero_copy_only=False)
            own = g.column("own").to_numpy(zero_copy_only=False)
            order = np.lexsort((lbl, node))
            node, lbl, own = node[order], lbl[order], own[order]
            first = np.concatenate([[True], node[1:] != node[:-1]]) if len(node) else np.array([], dtype=bool)
            starts = np.nonzero(first)[0]
            new_lbl = lbl[starts]  # min label per node (sorted)
            # previous own label for change detection
            own_lbl = np.full(len(starts), -1, dtype=np.int64)
            ends = np.append(starts[1:], len(node))
            for j, (s, e) in enumerate(zip(starts, ends)):
                o = np.nonzero(own[s:e])[0]
                if len(o):
                    own_lbl[j] = lbl[s + o[0]]
            changed = (own_lbl != new_lbl).astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(node[starts]),
                    "label": pa.array(new_lbl),
                    "changed": pa.array(changed),
                }
            )

        def bucketer(t: pa.Table) -> pa.Table:
            v = t.column("node").to_numpy(zero_copy_only=False).astype(np.uint64)
            return t.append_column("bucket", pa.array((v % np.uint64(num_buckets)).astype(np.int32)))

        merged = grouped_map(
            with_lbl.map_batches(proposals, batch_format="pyarrow")
            .union(labels.map_batches(own_rows, batch_format="pyarrow"))
            .map_batches(bucketer, batch_format="pyarrow"),
            "bucket",
            lambda g: reduce_min(g.drop_columns(["bucket"])),
            num_partitions=min(num_buckets, 32),
        ).materialize()

        n_changed = merged.sum("changed")
        labels = merged.map_batches(
            lambda t: t.select(["node", "label"]), batch_format="pyarrow"
        )
        if not n_changed:
            break

    return labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("node"), "cluster_id": t.column("label")}
        ),
        batch_format="pyarrow",
    )


def _dedup_label_rows(labels_ds, num_buckets):
    def bucketer(t: pa.Table) -> pa.Table:
        v = t.column("node").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("bucket", pa.array((v % np.uint64(num_buckets)).astype(np.int32)))

    def first(g: pa.Table) -> pa.Table:
        g = g.sort_by([("node", "ascending"), ("label", "ascending")])
        n = g.column("node").to_numpy(zero_copy_only=False)
        keep = np.concatenate([[True], n[1:] != n[:-1]]) if len(n) else np.array([], dtype=bool)
        return g.filter(pa.array(keep)).drop_columns(["bucket"])

    return grouped_map(
        labels_ds.map_batches(bucketer, batch_format="pyarrow"),
        "bucket",
        first,
        num_partitions=min(num_buckets, 32),
    )


def simhash_pairs(docs_ds, max_hamming=3, num_buckets=64, max_group=512):
    """Near-dup pairs by 64-bit SimHash: 4 16-bit bands (any pair within
    Hamming ≤ 3 shares at least one exact band), candidates verified by
    exact Hamming distance inline (the 8-byte sig rides the band rows)."""

    def band_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = simhash_batch(texts)
        n = len(ids)
        keys, rid, rsig = [], [], []
        for b in range(4):
            band_val = (sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            keys.append((np.uint64(b) << np.uint64(16)) | band_val)
            rid.append(ids)
            rsig.append(sigs)
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(keys), type=pa.uint64()),
                "doc_id": pa.array(np.concatenate(rid)),
                "sig": pa.array(np.concatenate(rsig), type=pa.uint64()),
            }
        )

    def group_pairs(g: pa.Table) -> pa.Table:
        keys = g.column("band_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = g.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.arange(len(ids))
        lo, hi, pls, _sk = _pairs_from_groups(keys, idx, payload=idx, max_group=max_group)
        report_cap("simhash_hot_band_groups_skipped", _sk)
        if len(lo) == 0:
            return pa.table({n_: pa.array([], type=t_) for n_, t_ in zip(PAIR_SCHEMA.names, PAIR_SCHEMA.types)})
        ia, ib = pls
        x = sigs[ia] ^ sigs[ib]
        hd = popcount64(x)
        keep = hd <= max_hamming
        a = np.minimum(ids[ia[keep]], ids[ib[keep]])
        b = np.maximum(ids[ia[keep]], ids[ib[keep]])
        return pa.table(
            {
                "doc_a": pa.array(a.astype(np.int64)),
                "doc_b": pa.array(b.astype(np.int64)),
                "similarity": pa.array(1.0 - hd[keep] / 64.0),
            }
        )

    candidates = grouped_map(
        docs_ds.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(_bucket_on("band_key", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda g: group_pairs(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
    )
    return dedup_pairs(candidates, num_buckets=num_buckets)


def ngram_jaccard_pairs(docs_ds, n=3, threshold=0.5, num_buckets=64, max_gram_docs=64):
    """EXACT n-gram Jaccard similarity join: explode (gram, doc) rows →
    groupby(gram) emits co-occurrence pairs → groupby(pair) counts |A∩B| →
    join doc gram-set sizes → J = ∩/(|A|+|B|−∩) ≥ threshold.

    ``max_gram_docs`` caps degenerate grams (stopword phrases) — the
    documented approximation at scale; below the cap the result is exact."""

    def gram_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keys, offsets = word_ngram_hashes_batch(texts, n)
        rep = np.repeat(ids, np.diff(offsets))
        return pa.table(
            {
                "gram": pa.array(keys, type=pa.uint64()),
                "doc_id": pa.array(rep.astype(np.int64)),
            }
        )

    def size_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        _keys, offsets = word_ngram_hashes_batch(texts, n)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "set_size": pa.array(np.diff(offsets).astype(np.int64)),
            }
        )

    def gram_group_pairs(g: pa.Table) -> pa.Table:
        keys = g.column("gram").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        lo, hi, _pl, _sk = _pairs_from_groups(keys, ids, max_group=max_gram_docs)
        report_cap("ngram_degenerate_grams_skipped", _sk)
        return pa.table(
            {"doc_a": pa.array(lo.astype(np.int64)), "doc_b": pa.array(hi.astype(np.int64))}
        )

    def count_pairs(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])]) if len(a) else np.array([], dtype=bool)
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, len(a)))
        return pa.table(
            {
                "doc_a": pa.array(a[starts]),
                "doc_b": pa.array(b[starts]),
                "n_common": pa.array(counts.astype(np.int64)),
            }
        )

    grams = docs_ds.map_batches(gram_rows, batch_format="pyarrow")
    pair_rows = grouped_map(
        grams.map_batches(_bucket_on("gram", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda g: gram_group_pairs(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
    )

    def add_pkey(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = a * np.uint64(0x9E3779B97F4A7C15) ^ b
        return t.append_column("pkey", pa.array(key, type=pa.uint64()))

    counted = grouped_map(
        pair_rows.map_batches(add_pkey, batch_format="pyarrow")
        .map_batches(_bucket_on("pkey", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda g: count_pairs(g.drop_columns(["bucket", "pkey"])),
        num_partitions=min(num_buckets, 32),
    )

    sizes = docs_ds.map_batches(size_rows, batch_format="pyarrow")
    from osm_export_tool_python_ray.stages.joins import bucket_join

    ca = bucket_join(
        counted, sizes.map_batches(lambda t: t.rename_columns(["doc_a", "size_a"]), batch_format="pyarrow"),
        "doc_a", num_buckets=num_buckets, how="inner",
        left_schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_common", pa.int64())]),
        right_schema=pa.schema([("doc_a", pa.int64()), ("size_a", pa.int64())]),
    )
    cab = bucket_join(
        ca, sizes.map_batches(lambda t: t.rename_columns(["doc_b", "size_b"]), batch_format="pyarrow"),
        "doc_b", num_buckets=num_buckets, how="inner",
        left_schema=pa.schema([("doc_b", pa.int64()), ("doc_a", pa.int64()), ("n_common", pa.int64()), ("size_a", pa.int64())]),
        right_schema=pa.schema([("doc_b", pa.int64()), ("size_b", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        inter = t.column("n_common").to_numpy(zero_copy_only=False).astype(np.float64)
        sa = t.column("size_a").to_numpy(zero_copy_only=False)
        sb = t.column("size_b").to_numpy(zero_copy_only=False)
        union = sa + sb - inter
        j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": t.column("doc_a").filter(pa.array(keep)),
                "doc_b": t.column("doc_b").filter(pa.array(keep)),
                "similarity": pa.array(j[keep]),
            }
        )

    return cab.map_batches(finish, batch_format="pyarrow")


def duplicate_spans(docs_ds, n=5, num_buckets=64, min_count=2):
    """Span-level duplicate detection — the ExactSubstr idea (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better")
    approximated with fixed-width word n-grams instead of suffix arrays:
    flag every n-gram occurrence whose gram appears >= ``min_count`` times
    in the CORPUS (across or within docs), then merge each doc's flagged
    windows [pos, pos+w) into maximal duplicated spans.

    → (doc_id, dup_spans, dup_tokens): one row per doc with >= 1 flagged
    occurrence; ``dup_spans`` = number of maximal merged spans,
    ``dup_tokens`` = their total token coverage. Short docs (< n tokens)
    fold into one whole-doc gram at pos 0 of width ntoks — a repeated
    short doc is one full-coverage span, mirroring decontam's gram family.

    Scale shape: two bucketed exchanges, both LINEAR in gram occurrences.
    The gram-side group work is a per-key occurrence COUNT (>= min_count),
    not a pairs blowup — boilerplate grams cost their row count, nothing
    quadratic, so no cap is needed. The doc-side merge is one lexsort +
    segmented cummax (gaps-and-islands), no per-row Python. The reference
    has no span-level dedup (engine-mandate op); tokenization mirrors
    ``word_ngram_hashes_batch`` (lowered \\S+ tokens).
    """
    from osm_export_tool_python_ray.functions.text import word_ngram_positions_batch

    def gram_pos_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keys, doc_of, pos, wlen = word_ngram_positions_batch(texts, n)
        return pa.table(
            {
                "gram": pa.array(keys, type=pa.uint64()),
                "doc_id": pa.array(ids[doc_of].astype(np.int64)),
                "pos": pa.array(pos.astype(np.int64)),
                "end": pa.array((pos + wlen).astype(np.int64)),
            }
        )

    GRAM_SCHEMA = pa.schema(
        [
            ("gram", pa.uint64()),
            ("doc_id", pa.int64()),
            ("pos", pa.int64()),
            ("end", pa.int64()),
        ]
    )

    def flag_dup_occurrences(g: pa.Table) -> pa.Table:
        """Keep occurrences of grams seen >= min_count times (group-complete
        per the grouped_map contract: every row of a gram key is here)."""
        keys = g.column("gram").to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(keys, return_inverse=True, return_counts=True)
        keep = cnt[inv] >= min_count
        kept = g.filter(pa.array(keep))
        return pa.table(
            {"doc_id": kept.column("doc_id"), "pos": kept.column("pos"), "end": kept.column("end")}
        )

    OCC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()), ("end", pa.int64())])

    def merge_spans(g: pa.Table) -> pa.Table:
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "dup_spans": pa.array([], type=pa.int64()),
                    "dup_tokens": pa.array([], type=pa.int64()),
                }
            )
        p = g.column("pos").to_numpy(zero_copy_only=False)
        e = g.column("end").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, p, d))
        d, p, e = d[order], p[order], e[order]
        new_doc = np.concatenate([[True], d[1:] != d[:-1]])
        seg = np.cumsum(new_doc) - 1
        # segmented (per-doc) running max of interval ends: offset trick —
        # ends are non-negative and bounded by the doc's token count, so
        # seg*span stays far below int64 for any realistic group.
        span = int(e.max()) + 1
        cm = np.maximum.accumulate(e + seg * span) - seg * span
        prev_cm = np.concatenate([[-1], cm[:-1]])
        # island (maximal merged span) starts where the interval clears
        # every previous end in the doc; intervals of later islands start
        # beyond ALL earlier ends, so the doc-cummax at an island's last
        # row equals the island's own max end.
        flag = new_doc | (p > prev_cm)
        isl_doc = d[flag]
        isl_start = p[flag]
        last = np.concatenate([flag[1:], [True]])
        isl_end = cm[last]
        isl_len = isl_end - isl_start
        doc_first = np.concatenate([[True], isl_doc[1:] != isl_doc[:-1]])
        starts_idx = np.nonzero(doc_first)[0]
        n_spans = np.diff(np.append(starts_idx, len(isl_doc)))
        sum_len = np.add.reduceat(isl_len, starts_idx)  # groups non-empty by construction
        return pa.table(
            {
                "doc_id": pa.array(isl_doc[doc_first].astype(np.int64)),
                "dup_spans": pa.array(n_spans.astype(np.int64)),
                "dup_tokens": pa.array(sum_len.astype(np.int64)),
            }
        )

    grams = docs_ds.map_batches(gram_pos_rows, batch_format="pyarrow")
    occ = grouped_map(
        grams.map_batches(_bucket_on("gram", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda g: flag_dup_occurrences(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
        payload_schema=GRAM_SCHEMA,
    )
    return grouped_map(
        occ.map_batches(_bucket_on("doc_id", num_buckets), batch_format="pyarrow"),
        "bucket",
        lambda g: merge_spans(g.drop_columns(["bucket"])),
        num_partitions=min(num_buckets, 32),
        payload_schema=OCC_SCHEMA,
    )


SOURCE_OVERLAP_TOKEN_CAP = 4096


def source_overlap(docs_ds, num_buckets=64, num_partitions=8,
                   token_cap=SOURCE_OVERLAP_TOKEN_CAP):
    """Pairwise source-vocabulary overlap matrix — for every unordered
    pair of ``source`` values, the Jaccard similarity of their DISTINCT
    token vocabularies (tokens = the text split on single spaces, the
    same rule as SQL string_split): (src_a, src_b, inter, n_a, n_b,
    jaccard_micro) with jaccard_micro = inter * 10^6 // (n_a + n_b -
    inter), integer floor division on both engine and SQL sides. The
    dataset-curation diagnostic run before mixing corpora: which sources
    are lexically near-identical (scrape overlap) vs complementary.

    Scale shape: per-batch DISTINCT (source, token) rows via Arrow
    group_by (exact string equality, no hash-collision risk), ONE
    token-keyed exchange that globally dedups each (token, source) pair
    and emits two aggregate row kinds — per-token source-pair partials
    (sources-per-token expansion capped + counted,
    ``source_overlap_token_truncated``; common tokens touch every
    source, so size the cap to the source cardinality) and per-source
    distinct-token count partials; the pair partials fold under a
    pair-keyed exchange, the count partials under a tiny
    groupby(source), and two ``bucket_join``s on the 64-bit source hash
    attach (n_a, n_b) — aggregate-sized rows move everywhere after the
    first exchange.

    No reference analog — engine mandate (corpus-curation family).
    """
    import pyarrow.compute as pc

    from osm_export_tool_python_ray.stages.joins import bucket_join

    def distinct_partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "tok": pa.array([], type=pa.string()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        toks = pc.split_pattern(t.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        reps = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src_rep = src.take(pa.array(np.repeat(np.arange(len(src)), reps)))
        d = (
            pa.table({"source": src_rep, "tok": flat})
            .group_by(["source", "tok"])
            .aggregate([])
        )
        h1, _ = hash_strings_128(d.column("tok"))
        return d.append_column(
            "bucket", pa.array((h1 % np.uint64(num_buckets)).astype(np.int32))
        )

    KIND_PAIR, KIND_COUNT = np.int32(0), np.int32(1)

    def token_groups(g: pa.Table) -> pa.Table:
        """All rows of this token bucket: global (token, source) dedup,
        then per-token source-pair partials + per-source count partials,
        tagged by ``kind``."""
        empty = pa.table(
            {
                "kind": pa.array([], type=pa.int32()),
                "src_a": pa.array([], type=pa.string()),
                "src_b": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        if not g.num_rows:
            return empty
        d = g.group_by(["tok", "source"]).aggregate([])
        d = d.sort_by([("tok", "ascending"), ("source", "ascending")])
        tok = d.column("tok").combine_chunks()
        ne = pc.not_equal(tok[1:], tok[:-1]).to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.concatenate([[True], ne]))[0]
        sizes = np.diff(np.append(starts, d.num_rows))
        if (sizes > token_cap).any():
            rank = np.arange(d.num_rows) - np.repeat(starts, sizes)
            keep = rank < token_cap
            report_cap("source_overlap_token_truncated", int((~keep).sum()))
            d = d.filter(pa.array(keep))
            tok = d.column("tok").combine_chunks()
            ne = pc.not_equal(tok[1:], tok[:-1]).to_numpy(zero_copy_only=False)
            starts = np.nonzero(np.concatenate([[True], ne]))[0]
            sizes = np.diff(np.append(starts, d.num_rows))
        src = d.column("source")
        # per-source distinct-token count partials (each (tok, source) is
        # globally unique after the dedup above — tokens never span buckets)
        cagg = d.group_by(["source"]).aggregate([("tok", "count")])
        counts = pa.table(
            {
                "kind": pa.array(
                    np.full(cagg.num_rows, KIND_COUNT), type=pa.int32()
                ),
                "src_a": cagg.column("source"),
                "src_b": pa.array(np.full(cagg.num_rows, ""), type=pa.string()),
                "cnt": pc.cast(cagg.column("tok_count"), pa.int64()),
            }
        )
        # source-pair partials: combinations within each token group
        # (sources sorted within token => src_a < src_b)
        rank = np.arange(d.num_rows) - np.repeat(starts, sizes)
        left_counts = np.repeat(sizes, sizes) - 1 - rank
        total = int(left_counts.sum())
        if total == 0:
            return counts
        L = np.repeat(np.arange(d.num_rows), left_counts)
        offs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(offs, left_counts) + L + 1
        pairs_raw = pa.table(
            {"src_a": src.take(pa.array(L)), "src_b": src.take(pa.array(R))}
        )
        pagg = pairs_raw.group_by(["src_a", "src_b"]).aggregate([([], "count_all")])
        pairs = pa.table(
            {
                "kind": pa.array(np.full(pagg.num_rows, KIND_PAIR), type=pa.int32()),
                "src_a": pagg.column("src_a"),
                "src_b": pagg.column("src_b"),
                "cnt": pc.cast(pagg.column("count_all"), pa.int64()),
            }
        )
        return pa.concat_tables([pairs, counts])

    tagged = grouped_map(
        docs_ds.map_batches(distinct_partial, batch_format="pyarrow"),
        "bucket",
        lambda g: token_groups(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema([("source", pa.string()), ("tok", pa.string())]),
    ).materialize()  # aggregate-sized rows; consumed by both row kinds below

    def pair_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), pa.scalar(0, pa.int32())))
        ha, _ = hash_strings_128(t.column("src_a"))
        hb, _ = hash_strings_128(t.column("src_b"))
        with np.errstate(over="ignore"):
            pb = ((ha * np.uint64(0x9E3779B97F4A7C15)) ^ hb) % np.uint64(num_buckets)
        return pa.table(
            {
                "src_a": t.column("src_a"),
                "src_b": t.column("src_b"),
                "cnt": t.column("cnt"),
                "ha": pa.array(ha.astype(np.int64)),
                "hb": pa.array(hb.astype(np.int64)),
                "bucket": pa.array(pb.astype(np.int32)),
            }
        )

    def fold_pairs(g: pa.Table) -> pa.Table:
        agg = g.group_by(["src_a", "src_b", "ha", "hb"]).aggregate([("cnt", "sum")])
        return pa.table(
            {
                "src_a": agg.column("src_a"),
                "src_b": agg.column("src_b"),
                "ha": agg.column("ha"),
                "hb": agg.column("hb"),
                "inter": agg.column("cnt_sum"),
            }
        )

    pairs_ds = grouped_map(
        tagged.map_batches(pair_bucket, batch_format="pyarrow"),
        "bucket",
        lambda g: fold_pairs(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("src_a", pa.string()),
                ("src_b", pa.string()),
                ("cnt", pa.int64()),
                ("ha", pa.int64()),
                ("hb", pa.int64()),
            ]
        ),
    )

    def count_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), pa.scalar(1, pa.int32())))
        h, _ = hash_strings_128(t.column("src_a"))
        return pa.table(
            {"skey": pa.array(h.astype(np.int64)), "cnt": t.column("cnt")}
        )

    counts_ds = (
        tagged.map_batches(count_rows, batch_format="pyarrow")
        .groupby("skey")
        .sum("cnt")
    )

    na_ds = counts_ds.map_batches(
        lambda t: pa.table({"ha": t.column("skey"), "n_a": t.column("sum(cnt)")}),
        batch_format="pyarrow",
    )
    nb_ds = counts_ds.map_batches(
        lambda t: pa.table({"hb": t.column("skey"), "n_b": t.column("sum(cnt)")}),
        batch_format="pyarrow",
    )
    j1 = bucket_join(
        pairs_ds,
        na_ds,
        "ha",
        num_buckets=min(num_buckets, 32),
        left_schema=pa.schema(
            [
                ("src_a", pa.string()),
                ("src_b", pa.string()),
                ("ha", pa.int64()),
                ("hb", pa.int64()),
                ("inter", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("ha", pa.int64()), ("n_a", pa.int64())]),
    )
    j2 = bucket_join(
        j1.map_batches(lambda t: t.drop_columns(["ha"]), batch_format="pyarrow"),
        nb_ds,
        "hb",
        num_buckets=min(num_buckets, 32),
        left_schema=pa.schema(
            [
                ("src_a", pa.string()),
                ("src_b", pa.string()),
                ("hb", pa.int64()),
                ("inter", pa.int64()),
                ("n_a", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("hb", pa.int64()), ("n_b", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        inter = t.column("inter").to_numpy(zero_copy_only=False)
        n_a = t.column("n_a").to_numpy(zero_copy_only=False)
        n_b = t.column("n_b").to_numpy(zero_copy_only=False)
        jac = inter * np.int64(1_000_000) // (n_a + n_b - inter)
        return pa.table(
            {
                "src_a": t.column("src_a"),
                "src_b": t.column("src_b"),
                "inter": pa.array(inter),
                "n_a": pa.array(n_a),
                "n_b": pa.array(n_b),
                "jaccard_micro": pa.array(jac),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")
