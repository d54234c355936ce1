"""Sorted-neighborhood blocking for record linkage (Hernández & Stolfo,
"The merge/purge problem for large databases", SIGMOD 1995): sort the
corpus by a short blocking key, then emit every pair of records within a
fixed window of the global sort order. The classic complement to
hash-based blocking (exact_dedup) and LSH banding (MinHash/SimHash):
it catches near-matches whose keys are CLOSE but not equal — typos,
truncations, prefix edits — with linear candidate volume (≤ (w−1)·N
pairs) instead of posting-quadratic.

Distributed shape (no reference analog — engine mandate, dedup family):

1. blocking key per doc (first ``key_len`` chars of the lowered
   alnum-squashed text), packed into TWO int64 words so every
   comparison downstream is numeric — ASCII byte order == lexicographic
   order, so the pack is order-isomorphic to the string sort;
2. exact global rank by (key, doc_id) via the two-phase range-bucket
   scan (the ``ordered_prefix_scan`` pattern, stages/scan.py): range
   buckets on the first packed word keep equal keys co-located and
   bucket order == key order; per-bucket counts → driver exclusive
   scan (O(num_buckets) ints, the only driver state) → broadcast
   offsets; per-bucket lexsort assigns dense global ranks;
3. windowed pairs via a rank-chunked HALO exchange: rows re-keyed by
   ``grank // chunk``; the last w−1 rows of each chunk are ALSO sent to
   the next chunk (ranks are dense, so "next chunk" can never be empty
   mid-stream — the empty-range-bucket hazard of keying halos by the
   phase-2 buckets doesn't exist); a pair is emitted by the chunk where
   its LARGER rank is native, so each pair materializes exactly once.

Skew note: range-bucketing on the packed key is data-dependent — a
corpus where most docs share one ``key_len``-char prefix lands in one
bucket (the same caveat ordered_prefix_scan documents). The per-bucket
work is an O(m log m) lexsort, not a pairing, so a hot bucket degrades
to a big sort, never a quadratic blow-up; candidate volume stays
≤ (w−1)·N by construction.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map


def _pack_key_words(keys):
    """list[str] (ASCII, len ≤ 16) → two int64 arrays whose tuple order
    equals the string order. numpy 'S8' pads with NULs (sorts first,
    matching the shorter-string-sorts-first rule of byte comparison)."""
    b = np.array(keys, dtype="S16")
    raw = b.view(np.uint8).reshape(len(b), 16)
    w1 = raw[:, :8].copy().view(">u8").ravel().astype(np.int64)
    w2 = raw[:, 8:].copy().view(">u8").ravel().astype(np.int64)
    # ASCII < 0x80 keeps the sign bit clear — int64-safe, order kept
    return w1, w2


def sorted_neighborhood_pairs(
    docs_ds,
    window=4,
    key_len=12,
    num_buckets=32,
    chunk=8192,
    num_partitions=8,
):
    """→ Dataset[(doc_a, doc_b, dist, key_a, key_b)]: all pairs within
    ``window``−1 positions in the global (blocking key, doc_id) order;
    ``doc_a`` is the smaller-rank side, ``dist`` the rank distance."""
    import re

    import ray

    from osm_export_tool_python_ray.state.broadcast import cached_get

    squash = re.compile(r"[^a-z0-9]+")
    w = int(window)
    if w < 2:
        raise ValueError("window must be >= 2")

    def keyed(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        keys = [squash.sub("", (x or "").lower())[:key_len] for x in texts]
        w1, w2 = _pack_key_words(keys)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bkey": pa.array(keys, type=pa.string()),
                "k1": pa.array(w1),
                "k2": pa.array(w2),
            }
        )

    proj = docs_ds.map_batches(keyed, batch_format="pyarrow").materialize()
    mx = proj.max("k1")
    if mx is None:
        # 0-row pyarrow Table, not an empty Dataset (ray.data drops the
        # schema of all-empty datasets on to_pandas()/sort())
        i64 = pa.int64()
        return pa.table(
            {
                "doc_a": pa.array([], type=i64),
                "doc_b": pa.array([], type=i64),
                "dist": pa.array([], type=i64),
                "key_a": pa.array([], type=pa.string()),
                "key_b": pa.array([], type=pa.string()),
            }
        )
    mn = int(proj.min("k1"))
    span = int(mx) - mn + 1
    range_size = -(-span // num_buckets)  # ceil; equal k1 → same bucket

    def add_bucket(t: pa.Table) -> pa.Table:
        k1 = t.column("k1").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(((k1 - mn) // range_size).astype(np.int64))
        )

    bucketed = proj.map_batches(add_bucket, batch_format="pyarrow").materialize()

    # phase A: bucket counts → driver exclusive scan → broadcast offsets
    counts = {}
    for r in (
        bucketed.groupby("bucket").count().take_all()
    ):  # ≤ num_buckets rows — the only driver state
        counts[int(r["bucket"])] = int(r["count()"])
    offsets = np.zeros(num_buckets + 1, dtype=np.int64)
    for b in range(num_buckets):
        offsets[b + 1] = offsets[b] + counts.get(b, 0)
    off_ref = ray.put(offsets)

    key_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("bkey", pa.string()),
            ("k1", pa.int64()),
            ("k2", pa.int64()),
        ]
    )

    # phase B: per range-bucket lexsort → dense global ranks; re-key by
    # rank chunk with a w−1 halo into the NEXT chunk
    def rank_and_halo(g: pa.Table) -> pa.Table:
        # hash-exchange contract: one batch per PARTITION — a bag of
        # complete bucket groups, NOT one group — so segment by bucket
        offs = cached_get(off_ref)
        bks = g.column("bucket").to_numpy(zero_copy_only=False)
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        k1 = g.column("k1").to_numpy(zero_copy_only=False)
        k2 = g.column("k2").to_numpy(zero_copy_only=False)
        keys = np.asarray(g.column("bkey").to_pylist(), dtype=object)
        order = np.lexsort((d, k2, k1, bks))
        bks, d, k1, k2, keys = bks[order], d[order], k1[order], k2[order], keys[order]
        n = len(d)
        first = (
            np.concatenate([[True], bks[1:] != bks[:-1]])
            if n
            else np.array([], bool)
        )
        starts = np.nonzero(first)[0]
        seg = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, n)))
        local = np.arange(n, dtype=np.int64) - starts[seg]
        grank = offs[bks] + local
        tchunk = grank // chunk
        native = np.ones(len(d), dtype=bool)
        halo = (grank % chunk) >= (chunk - (w - 1))
        out_rank = np.concatenate([grank, grank[halo]])
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([d, d[halo]])),
                "bkey": pa.array(
                    np.concatenate([keys, keys[halo]]), type=pa.string()
                ),
                "grank": pa.array(out_rank),
                "native": pa.array(
                    np.concatenate([native, np.zeros(int(halo.sum()), bool)])
                ),
                "tchunk": pa.array(
                    np.concatenate([tchunk, tchunk[halo] + 1])
                ),
            }
        )

    ranked = grouped_map(
        bucketed,
        "bucket",
        rank_and_halo,
        num_partitions=min(num_buckets, num_partitions * 4),
        payload_schema=key_schema,
    )

    pair_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("bkey", pa.string()),
            ("grank", pa.int64()),
            ("native", pa.bool_()),
            ("tchunk", pa.int64()),
        ]
    )

    def window_pairs(g: pa.Table) -> pa.Table:
        # same partition-bag contract: segment by tchunk (a partition
        # holds several chunk groups, and a rank can appear twice across
        # groups — once native, once as the next chunk's halo copy)
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        keys = np.asarray(g.column("bkey").to_pylist(), dtype=object)
        rk = g.column("grank").to_numpy(zero_copy_only=False)
        nat = g.column("native").to_numpy(zero_copy_only=False)
        tch = g.column("tchunk").to_numpy(zero_copy_only=False)
        order = np.lexsort((rk, tch))
        d, keys, rk, nat, tch = d[order], keys[order], rk[order], nat[order], tch[order]
        outs = {k: [] for k in ("doc_a", "doc_b", "dist", "key_a", "key_b")}
        n = len(d)
        for j in range(1, w):
            # vectorized: row i pairs with row i+j when both sit in the
            # same chunk group, ranks are exactly j apart (halo
            # guarantees presence) and the LARGER is native
            if n <= j:
                break
            ok = (tch[j:] == tch[:-j]) & (rk[j:] - rk[:-j] == j) & nat[j:]
            outs["doc_a"].append(d[:-j][ok])
            outs["doc_b"].append(d[j:][ok])
            outs["dist"].append(np.full(int(ok.sum()), j, dtype=np.int64))
            outs["key_a"].append(keys[:-j][ok])
            outs["key_b"].append(keys[j:][ok])
        if not outs["doc_a"]:
            i64 = pa.int64()
            return pa.table(
                {
                    "doc_a": pa.array([], type=i64),
                    "doc_b": pa.array([], type=i64),
                    "dist": pa.array([], type=i64),
                    "key_a": pa.array([], type=pa.string()),
                    "key_b": pa.array([], type=pa.string()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(outs["doc_a"])),
                "doc_b": pa.array(np.concatenate(outs["doc_b"])),
                "dist": pa.array(np.concatenate(outs["dist"])),
                "key_a": pa.array(
                    np.concatenate(outs["key_a"]), type=pa.string()
                ),
                "key_b": pa.array(
                    np.concatenate(outs["key_b"]), type=pa.string()
                ),
            }
        )

    return grouped_map(
        ranked,
        "tchunk",
        window_pairs,
        num_partitions=num_partitions,
        payload_schema=pair_schema,
    )
