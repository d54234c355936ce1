"""Edit-distance-1 string similarity join (FastSS deletion-neighborhood
blocking, Bocek et al. 2007): all unordered pairs of DISTINCT values of a
string column at Levenshtein distance exactly 1 — the typo-clustering /
entity-resolution primitive the MinHash/SimHash family cannot express
(those block on shared content, not on single-character edits).

Scale shape: the raw column is first reduced to the distinct-value table
with per-batch distinct partials and ONE keyed exchange (values ride
their 64-bit vectorized hash bucket, never raw rows twice); deletion
variants are generated over DISTINCT values only — the compressed small
side, |values| x (len+1) variant rows; a variant-keyed exchange groups
candidate values sharing a variant (pair expansion capped and counted
via ``editdist_variant_group_truncated``); a pair-keyed exchange dedups
candidates found through multiple shared variants; the final Levenshtein
verify is fully vectorized over zero-padded byte matrices gathered
straight from the Arrow data buffer (no per-pair Python).

Correctness: lev(a, b) <= 1 for distinct a != b implies a and b share a
member of the deletion neighborhood U(s) = {s} + {s minus one char}
(substitution at p: both delete position p; insertion/deletion: the
shorter string IS a deletion variant of the longer), so variant blocking
is lossless; the verify rejects the false positives blocking admits
(e.g. 'ab' vs 'ba' share variant 'a' but lev = 2).

No reference analog — engine mandate (string-similarity family).
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map
from osm_export_tool_python_ray.functions.text import hash_strings_128
from osm_export_tool_python_ray.state.metrics import report_cap

VARIANT_GROUP_CAP = 256


def _byte_matrix(arr):
    """(n, W) zero-padded uint8 matrix + int64 lengths of an Arrow string
    array, gathered from the data buffer with no per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    else:
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    off = off[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None and len(buf)
        else np.zeros(1, dtype=np.uint8)
    )
    lens = np.diff(off)
    W = int(lens.max()) if len(lens) else 1
    W = max(W, 1)
    idx = off[:-1, None] + np.arange(W)[None, :]
    valid = np.arange(W)[None, :] < lens[:, None]
    mat = np.where(valid, data[np.minimum(idx, len(data) - 1)], np.uint8(0))
    return mat.astype(np.uint8), lens


def lev1_mask(a_arr, b_arr):
    """Vectorized: for row-aligned Arrow string arrays, True where
    Levenshtein(a, b) == 1. Assumes a != b row-wise (distinct values).
    Rows with |len(a) - len(b)| > 1 are False without inspection.
    Distance is over UTF-8 BYTES — identical to code-point distance for
    ASCII data (a multi-byte code-point edit is > 1 byte edit and is
    conservatively rejected)."""
    n = len(a_arr)
    if not n:
        return np.zeros(0, dtype=bool)
    A, la = _byte_matrix(a_arr)
    B, lb = _byte_matrix(b_arr)
    W = max(A.shape[1], B.shape[1])
    if A.shape[1] < W:
        A = np.pad(A, ((0, 0), (0, W - A.shape[1])))
    if B.shape[1] < W:
        B = np.pad(B, ((0, 0), (0, W - B.shape[1])))
    # orient so la <= lb
    swap = la > lb
    if swap.any():
        A2 = np.where(swap[:, None], B, A)
        B = np.where(swap[:, None], A, B)
        A = A2
        la2 = np.where(swap, lb, la)
        lb = np.where(swap, la, lb)
        la = la2
    dl = lb - la
    cols = np.arange(W)[None, :]
    neq = A != B
    any_mm = neq.any(axis=1)
    first_mm = np.where(any_mm, neq.argmax(axis=1), W)
    # equal length: exactly one mismatching position (padding matches)
    eq_ok = neq.sum(axis=1) == 1
    # length differs by one: prefix equal up to first mismatch p (by
    # construction), then A[j] == B[j+1] for all j in [p, la)
    Bs = np.zeros_like(B)
    Bs[:, :-1] = B[:, 1:]
    ins_ok = ((A == Bs) | (cols < first_mm[:, None]) | (cols >= la[:, None])).all(
        axis=1
    )
    return np.where(dl == 0, eq_ok, (dl == 1) & ins_ok)


def editdist_pairs(
    ds,
    col="p_name",
    num_buckets=64,
    num_partitions=8,
    group_cap=VARIANT_GROUP_CAP,
):
    """All unordered pairs (a < b) of distinct values of ``col`` with
    Levenshtein distance exactly 1, with each value's row count:
    (name_a, name_b, n_a, n_b). See module docstring for the shape.
    """

    def distinct_partial(t: pa.Table) -> pa.Table:
        """Per-batch (value, count) partials, bucketed on the vectorized
        64-bit string hash."""
        col_arr = t.column(col)
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        if not len(col_arr):
            return pa.table(
                {
                    "name": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        vc = col_arr.value_counts()
        names = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        h1, _ = hash_strings_128(names)
        return pa.table(
            {
                "name": names,
                "n": pa.array(counts),
                "bucket": pa.array((h1 % np.uint64(num_buckets)).astype(np.int32)),
            }
        )

    def variants(g: pa.Table) -> pa.Table:
        """All partials of a value land here: finalize counts, emit the
        deletion neighborhood {s} + {s[:i] + s[i+1:]} per DISTINCT value,
        re-bucketed on the variant hash. The per-value deletion loop runs
        over the distinct-value table — the compressed small side."""
        agg = g.group_by(["name"]).aggregate([("n", "sum")])
        names = agg.column("name").to_pylist()
        counts = agg.column("n_sum").to_numpy(zero_copy_only=False)
        out_v, out_n, out_c = [], [], []
        for s, c in zip(names, counts):
            # set-dedup: repeated characters make distinct deletion
            # positions collide ("aab" -> "ab" twice)
            for var in {s}.union(s[:i] + s[i + 1 :] for i in range(len(s))):
                out_v.append(var)
                out_n.append(s)
                out_c.append(c)
        va = pa.array(out_v, type=pa.string())
        h1, _ = hash_strings_128(va)
        return pa.table(
            {
                "variant": va,
                "name": pa.array(out_n, type=pa.string()),
                "n": pa.array(np.asarray(out_c, dtype=np.int64)),
                "bucket": pa.array((h1 % np.uint64(num_buckets)).astype(np.int32)),
            }
        )

    PAIR_EMPTY = pa.table(
        {
            "name_a": pa.array([], type=pa.string()),
            "name_b": pa.array([], type=pa.string()),
            "n_a": pa.array([], type=pa.int64()),
            "n_b": pa.array([], type=pa.int64()),
            "pbucket": pa.array([], type=pa.int32()),
        }
    )

    def candidate_pairs(g: pa.Table) -> pa.Table:
        """All rows of a variant land here: pair values sharing it
        (capped + counted), canonical name_a < name_b."""
        if not g.num_rows:
            return PAIR_EMPTY
        import pyarrow.compute as pc

        g = g.sort_by([("variant", "ascending"), ("name", "ascending")])
        v = g.column("variant")
        names = g.column("name")
        counts = g.column("n").to_numpy(zero_copy_only=False)
        ne = pc.not_equal(v.combine_chunks()[1:], v.combine_chunks()[:-1]).to_numpy(
            zero_copy_only=False
        )
        starts = np.nonzero(np.concatenate([[True], ne]))[0]
        sizes = np.diff(np.append(starts, g.num_rows))
        if (sizes > group_cap).any():
            rank = np.arange(g.num_rows) - np.repeat(starts, sizes)
            keep = rank < group_cap
            report_cap("editdist_variant_group_truncated", int((~keep).sum()))
            g = g.filter(pa.array(keep))
            names = g.column("name")
            counts = counts[keep]
            v = g.column("variant")
            ne = pc.not_equal(
                v.combine_chunks()[1:], v.combine_chunks()[:-1]
            ).to_numpy(zero_copy_only=False)
            starts = np.nonzero(np.concatenate([[True], ne]))[0]
            sizes = np.diff(np.append(starts, g.num_rows))
        left_counts = np.repeat(sizes, sizes) - 1 - (
            np.arange(g.num_rows) - np.repeat(starts, sizes)
        )
        total = int(left_counts.sum())
        if total == 0:
            return PAIR_EMPTY
        L = np.repeat(np.arange(g.num_rows), left_counts)
        offs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(offs, left_counts) + L + 1
        na = names.take(pa.array(L))
        nb = names.take(pa.array(R))
        ha, _ = hash_strings_128(na)
        hb, _ = hash_strings_128(nb)
        with np.errstate(over="ignore"):
            pb = ((ha * np.uint64(0x9E3779B97F4A7C15)) ^ hb) % np.uint64(num_buckets)
        return pa.table(
            {
                "name_a": na,
                "name_b": nb,
                "n_a": pa.array(counts[L]),
                "n_b": pa.array(counts[R]),
                "pbucket": pa.array(pb.astype(np.int32)),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        """Dedup candidate pairs found via multiple shared variants, then
        the vectorized exact lev == 1 verify."""
        if not g.num_rows:
            return g
        g = g.sort_by([("name_a", "ascending"), ("name_b", "ascending")])
        import pyarrow.compute as pc

        a = g.column("name_a").combine_chunks()
        b = g.column("name_b").combine_chunks()
        dup = pc.and_(
            pc.equal(a[1:], a[:-1]), pc.equal(b[1:], b[:-1])
        ).to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], ~dup])
        g = g.filter(pa.array(first))
        ok = lev1_mask(g.column("name_a"), g.column("name_b"))
        return g.filter(pa.array(ok)).select(["name_a", "name_b", "n_a", "n_b"])

    distinct = grouped_map(
        ds.map_batches(distinct_partial, batch_format="pyarrow"),
        "bucket",
        lambda g: variants(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema([("name", pa.string()), ("n", pa.int64())]),
    )
    pairs = grouped_map(
        distinct,
        "bucket",
        lambda g: candidate_pairs(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [("variant", pa.string()), ("name", pa.string()), ("n", pa.int64())]
        ),
    )
    return grouped_map(
        pairs,
        "pbucket",
        lambda g: verify(g.drop_columns(["pbucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("name_a", pa.string()),
                ("name_b", pa.string()),
                ("n_a", pa.int64()),
                ("n_b", pa.int64()),
            ]
        ),
    )
