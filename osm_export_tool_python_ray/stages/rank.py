"""BM25 retrieval scoring — rank a corpus against a fixed query term
set (Robertson/Spärck Jones probabilistic relevance, the Okapi BM25
form with k1=1.2, b=0.75). The classic quality-selection primitive of
a training-data pipeline: "pull the top documents for this topic" over
a corpus too big to index centrally.

Scale shape — ONE tokenize pass, then everything is O(docs)/O(1):

    docs ─ map_batches tokenize → compact per-doc (dl, tf_t, df_t) ─┐
           (materialized: n_docs × (2+2|terms|) ints, NOT the text)  │
    stats: Sum aggregates → N, Σdl, df_t  (scalars, broadcast)  ◄────┤
    score: map_batches over the compact table (float64 BM25)    ◄────┤
    top-k: topk_per_group combiner (constant group)             ◄────┘

The compact table is materialized deliberately: it is consumed twice
(corpus statistics, then scoring) and re-executing the lineage would
re-tokenize the full text; at 100 TB the compact form is ~40 bytes/doc
— object-store resident, never driver-resident. The only driver state
is the |terms|+2 scalar statistics.

Determinism: scores are quantized to integer micro-units with
floor(x*1e6 + 0.5) BEFORE ranking (the engine's quantize-before-rank
rule), ties broken on doc_id, so the top-k set is identical at any
parallelism and bit-comparable with the DuckDB oracle (which mirrors
the float64 expression shape term by term; see SQL_BM25_TOPK).

No reference analog — engine mandate (retrieval family next to ANN).
"""

import numpy as np

from osm_export_tool_python_ray.functions.quantize import qround
import pyarrow as pa

from osm_export_tool_python_ray.functions.text import _TOKEN_RE

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(docs_ds, terms, k=10):
    """Top-``k`` documents by BM25 against ``terms`` →
    (doc_id, score_micro, rank); only docs containing ≥1 query term
    compete. ``score_micro = floor(score * 1e6 + 0.5)`` int64."""
    from ray.data.aggregate import Count, Sum

    from osm_export_tool_python_ray.stages.topk import topk_per_group

    terms = [t.lower() for t in terms]
    nt = len(terms)

    def compact(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = len(texts)
        dl = np.empty(n, dtype=np.int64)
        tf = np.zeros((nt, n), dtype=np.int64)
        for i, x in enumerate(texts):
            toks = _TOKEN_RE.findall((x or "").lower())
            dl[i] = len(toks)
            for j, term in enumerate(terms):
                tf[j, i] = toks.count(term)
        cols = {"doc_id": t.column("doc_id"), "dl": pa.array(dl)}
        for j in range(nt):
            cols["tf%d" % j] = pa.array(tf[j])
            cols["d%d" % j] = pa.array((tf[j] > 0).astype(np.int64))
        return pa.table(cols)

    per_doc = docs_ds.map_batches(compact, batch_format="pyarrow").materialize()

    aggs = [Count(alias_name="n"), Sum("dl", alias_name="s")]
    aggs += [Sum("d%d" % j, alias_name="df%d" % j) for j in range(nt)]
    st = per_doc.aggregate(*aggs)
    n_docs, total_dl = int(st["n"]), int(st["s"])
    df = [int(st["df%d" % j]) for j in range(nt)]
    avgdl = total_dl / n_docs
    # idf scalars once, broadcast via closure (|terms| floats)
    idf = [float(np.log(1.0 + (n_docs - df[j] + 0.5) / (df[j] + 0.5))) for j in range(nt)]

    def score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False)
        tfs = [t.column("tf%d" % j).to_numpy(zero_copy_only=False) for j in range(nt)]
        # fixed left-to-right accumulation and term-by-term expression
        # shape, mirrored verbatim by the SQL oracle
        s = np.zeros(len(dl), dtype=np.float64)
        for j in range(nt):
            s = s + idf[j] * (tfs[j] * (BM25_K1 + 1.0)) / (
                tfs[j] + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        hit = np.zeros(len(dl), dtype=bool)
        for j in range(nt):
            hit |= tfs[j] > 0
        micro = qround(s * 1e6, "bm25_score")
        out = pa.table(
            {
                "doc_id": t.column("doc_id").filter(pa.array(hit)),
                "score_micro": pa.array(micro[hit]),
                "g": pa.array(np.zeros(int(hit.sum()), dtype=np.int64)),
            }
        )
        return out

    top = topk_per_group(
        per_doc.map_batches(score, batch_format="pyarrow"),
        group_col="g",
        sort_col="score_micro",
        tie_col="doc_id",
        k=k,
        num_buckets=1,
        num_partitions=1,
    )
    return top.map_batches(
        lambda t: t.drop_columns(["g"]), batch_format="pyarrow"
    )
