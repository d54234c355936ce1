"""Distributed inverted-index build (search-engine primitive): document
text → term-sorted posting lists ``(term, doc_id, tf, first_pos, df)``.

The MapReduce classic: map-side tokenize + per-(term, doc) fold (tf and
first occurrence position — the data a phrase/proximity index keeps),
then ONE term-keyed exchange that co-locates each term's postings so
per-term statistics (here df, the document frequency every ranking
function needs) attach without a second pass. The reduce side does no
re-aggregation of (term, doc) rows — a document lives in exactly one
input batch, so map-side folds are already final; the exchange exists
to group postings BY TERM, which is what makes the output an index
rather than a bag.

Scale shape: the exchanged stream is one row per distinct (term, doc)
pair — bounded by total tokens, shrunk by the per-batch fold; bucket =
hash(term) % B so a term's posting list is partition-complete (the
assumption a posting-list consumer needs). Hot terms (stopwords) make
big groups but the per-partition work stays vectorized (lexsort +
reduceat); a df-threshold consumer would drop them first.

No reference analog — engine mandate (text-indexing family); pairs
with stages/rank.py bm25_topk, which consumes exactly these (tf, df)
statistics.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions.text import (
    alnum_tokens_batch,
    hash_strings_128,
)
from osm_export_tool_python_ray.stages.exchange import grouped_map

OUT = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("first_pos", pa.int64()),
        ("df", pa.int64()),
    ]
)


def build_postings(docs_ds, num_buckets=64, num_partitions=16):
    """→ Dataset(term, doc_id, tf, first_pos, df); positions 1-based."""

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int64()),
                "first_pos": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int32()),
            }
        )
        if not t.num_rows:
            return empty
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        flat, ntoks = alnum_tokens_batch(t.column("text").to_pylist())
        if not flat:
            return empty
        docrep = np.repeat(np.arange(len(ids)), ntoks)
        offs = np.concatenate([[np.int64(0)], np.cumsum(ntoks)])[:-1]
        pos = np.arange(len(flat)) - np.repeat(offs, ntoks) + 1
        uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
        # one key per (term, doc-in-batch); stable sort keeps positions
        # increasing inside each group, so the group head is first_pos
        key = inv.astype(np.int64) << np.int64(24) | docrep
        order = np.argsort(key, kind="stable")
        key, pos = key[order], pos[order]
        starts = np.nonzero(np.concatenate([[True], key[1:] != key[:-1]]))[0]
        tf = np.diff(np.append(starts, len(key)))
        term_idx = (key[starts] >> np.int64(24)).astype(np.int64)
        terms = pa.array(uniq[term_idx], type=pa.string())
        h1, _ = hash_strings_128(terms)
        return pa.table(
            {
                "term": terms,
                "doc_id": pa.array(ids[(key[starts] & np.int64((1 << 24) - 1))]),
                "tf": pa.array(tf.astype(np.int64)),
                "first_pos": pa.array(pos[starts]),
                "bucket": pa.array(
                    (h1 % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    def attach_df(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({f.name: pa.array([], type=f.type) for f in OUT})
        g = g.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        tm = g.column("term").to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.concatenate([[True], tm[1:] != tm[:-1]]))[0]
        df = np.repeat(
            np.diff(np.append(starts, len(tm))), np.diff(np.append(starts, len(tm)))
        )
        return pa.table(
            {
                "term": g.column("term"),
                "doc_id": g.column("doc_id"),
                "tf": g.column("tf"),
                "first_pos": g.column("first_pos"),
                "df": pa.array(df.astype(np.int64)),
            }
        )

    return grouped_map(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        lambda g: attach_df(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("term", pa.string()),
                ("doc_id", pa.int64()),
                ("tf", pa.int64()),
                ("first_pos", pa.int64()),
            ]
        ),
    )
