"""Corpus-level lexical statistics — vocabulary growth (Heaps'-law
curve) and top PMI collocations. The two "what is in this corpus"
reports a training-data run produces before filtering decisions:
how fast the vocabulary grows with corpus size, and which adjacent
word pairs are over-represented.

Scale shape:
- ``vocab_growth``: tokens are deduplicated per batch with their
  batch-local min doc_id (a combiner — the exchange moves one row per
  batch-DISTINCT token, vocabulary-scale like vocab_topk, never
  occurrence-scale), one token-keyed bucket exchange computes the
  global first-occurrence doc per token, and each partition collapses
  to ≤|thresholds|+1 histogram rows before a tiny groupby + cumsum.
- ``pmi_top``: per-batch bigram partial counts (combiner) → one
  bucketed exchange summing per-group → group-wise top-k on the
  integer count (selection is integer-deterministic; ties on the
  bigram string) → a SECOND corpus pass counts unigrams for only the
  ≤2k surviving words (broadcast membership set) plus the two corpus
  totals; PMI is computed on ≤k driver rows.

Determinism: growth counts and bigram/unigram counts are pure
integers; PMI is one float64 expression whose shape the DuckDB oracle
mirrors exactly (left-assoc products, single ln, floor(x*1e6 + 0.5)
micro-quantization — the engine's ln-at-round-6 tier).

No reference analog — engine mandate (text-analysis family).
"""

import numpy as np

from osm_export_tool_python_ray.functions.quantize import qround
import pyarrow as pa

from osm_export_tool_python_ray.functions.text import _TOKEN_RE
from osm_export_tool_python_ray.stages.exchange import grouped_map, hash_bucket


def vocab_growth(docs_ds, thresholds, num_buckets=64, num_partitions=8):
    """Distinct-token count of the sub-corpus {doc_id < N} for each N in
    ``thresholds`` → rows (threshold, vocab_size), both int64. "First
    occurrence" is the MINIMUM doc_id containing the token — a property
    of the data, not of scan order, so the curve is identical at any
    parallelism."""
    thresholds = sorted(int(n) for n in thresholds)
    th = np.asarray(thresholds, dtype=np.int64)
    K = len(th)

    def partial_first(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        first = {}
        # ascending doc_id order makes dict.setdefault the batch-local min
        for i in np.argsort(ids, kind="stable"):
            d = int(ids[i])
            for tok in set(_TOKEN_RE.findall((texts[i] or "").lower())):
                if tok not in first:
                    first[tok] = d
        toks = list(first)
        out = pa.table(
            {
                "tok": pa.array(toks, type=pa.string()),
                "min_doc": pa.array(
                    np.fromiter((first[k] for k in toks), dtype=np.int64, count=len(toks))
                ),
            }
        )
        return out.append_column(
            "bucket", pa.array(hash_bucket(out.column("tok"), num_buckets))
        )

    def histogram(g: pa.Table) -> pa.Table:
        """Global per-token min over the co-located partials, then a
        ≤K+1-row histogram of first-occurrence threshold bins."""
        toks = np.asarray(g.column("tok").to_pylist(), dtype=object)
        mins = g.column("min_doc").to_numpy(zero_copy_only=False)
        if not len(toks):
            return pa.table(
                {
                    "bin": pa.array(np.arange(K, dtype=np.int64)),
                    "n": pa.array(np.zeros(K, dtype=np.int64)),
                }
            )
        uniq, inv = np.unique(toks, return_inverse=True)
        gmin = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(gmin, inv, mins)
        # bin = index of the FIRST threshold strictly above min_doc;
        # tokens first seen at/after the last threshold never count
        bins = np.searchsorted(th, gmin, side="right")
        bins = bins[bins < K]
        cnt = np.bincount(bins, minlength=K).astype(np.int64)
        return pa.table(
            {"bin": pa.array(np.arange(K, dtype=np.int64)), "n": pa.array(cnt)}
        )

    from ray.data.aggregate import Sum

    PARTIAL = pa.schema([("tok", pa.string()), ("min_doc", pa.int64())])
    hist = grouped_map(
        docs_ds.map_batches(partial_first, batch_format="pyarrow"),
        "bucket",
        lambda g: histogram(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=PARTIAL,
    ).groupby("bin").aggregate(Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        cnt = np.zeros(K, dtype=np.int64)
        b = t.column("bin").to_numpy(zero_copy_only=False)
        cnt[b] = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "threshold": pa.array(th),
                "vocab_size": pa.array(np.cumsum(cnt).astype(np.int64)),
            }
        )

    # ≤K rows — O(|thresholds|) finish
    return hist.repartition(1).map_batches(
        finish, batch_size=None, batch_format="pyarrow"
    )


def pmi_top(docs_ds, k=20, num_buckets=64, num_partitions=8):
    """Top-``k`` adjacent-bigram collocations by corpus count (ties on
    the bigram string), with pointwise mutual information →
    (bigram, n, pmi_micro). Returns a pyarrow Table (≤k rows are driver
    state by construction)."""
    from osm_export_tool_python_ray.stages.topk import topk_per_group

    def bigram_partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        counts = {}
        for x in texts:
            toks = _TOKEN_RE.findall((x or "").lower())
            for a, b in zip(toks, toks[1:]):
                key = a + " " + b
                counts[key] = counts.get(key, 0) + 1
        keys = list(counts)
        out = pa.table(
            {
                "bigram": pa.array(keys, type=pa.string()),
                "n_partial": pa.array(
                    np.fromiter((counts[x] for x in keys), dtype=np.int64, count=len(keys))
                ),
            }
        )
        return out.append_column(
            "bucket", pa.array(hash_bucket(out.column("bigram"), num_buckets))
        )

    def sum_group(g: pa.Table) -> pa.Table:
        bi = np.asarray(g.column("bigram").to_pylist(), dtype=object)
        n = g.column("n_partial").to_numpy(zero_copy_only=False)
        u, inv = np.unique(bi, return_inverse=True)
        tot = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table(
            {
                "bigram": pa.array(list(u), type=pa.string()),
                "n": pa.array(tot),
                "g": pa.array(np.zeros(len(u), dtype=np.int64)),
            }
        )

    PARTIAL = pa.schema([("bigram", pa.string()), ("n_partial", pa.int64())])
    top = (
        topk_per_group(
            grouped_map(
                docs_ds.map_batches(bigram_partial, batch_format="pyarrow"),
                "bucket",
                lambda g: sum_group(g.drop_columns(["bucket"])),
                num_partitions=num_partitions,
                payload_schema=PARTIAL,
            ),
            group_col="g",
            sort_col="n",
            tie_col="bigram",
            k=k,
            num_buckets=1,
            num_partitions=1,
        )
        .drop_columns(["g", "rank"])
        .take_all()
    )
    bigrams = [r["bigram"] for r in top]
    n_big = {r["bigram"]: int(r["n"]) for r in top}
    words = sorted({w for b in bigrams for w in b.split(" ")})
    wset = set(words)

    def unigram_partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        uni = dict.fromkeys(words, 0)
        ntok = 0
        nbig = 0
        for x in texts:
            toks = _TOKEN_RE.findall((x or "").lower())
            ntok += len(toks)
            nbig += max(len(toks) - 1, 0)
            for w in toks:
                if w in wset:
                    uni[w] += 1
        cols = {"total_tokens": pa.array([ntok], type=pa.int64()),
                "total_bigrams": pa.array([nbig], type=pa.int64())}
        for i, w in enumerate(words):
            cols["u%d" % i] = pa.array([uni[w]], type=pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum

    aggs = [Sum("total_tokens", alias_name="total_tokens"),
            Sum("total_bigrams", alias_name="total_bigrams")]
    aggs += [Sum("u%d" % i, alias_name="u%d" % i) for i in range(len(words))]
    st = docs_ds.map_batches(unigram_partial, batch_format="pyarrow").aggregate(*aggs)
    T = float(st["total_tokens"])
    B = float(st["total_bigrams"])
    uni = {w: float(st["u%d" % i]) for i, w in enumerate(words)}

    pmis = []
    for bg in bigrams:
        a, b = bg.split(" ")
        # expression shape mirrored by SQL_PMI_TOP: left-assoc products,
        # one ln, floor-micro quantization
        x = (float(n_big[bg]) * T * T) / (B * uni[a] * uni[b])
        pmis.append(int(qround(np.log(x) * 1e6, "pmi")))
    return pa.table(
        {
            "bigram": pa.array(bigrams, type=pa.string()),
            "n": pa.array([n_big[x] for x in bigrams], type=pa.int64()),
            "pmi_micro": pa.array(pmis, type=pa.int64()),
        }
    )
