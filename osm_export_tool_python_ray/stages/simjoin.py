"""TF-IDF cosine similarity self-join with prefix filtering (AllPairs).

The canonical sparse-vector similarity join for near-duplicate and
related-document mining at corpus scale (Bayardo, Ma & Srikant,
"Scaling Up All Pairs Similarity Search", WWW 2007): instead of the
O(sum_f |D_f|^2) blow-up of pairing every co-occurrence, each document
indexes only its PREFIX — the head of its features in a global
(df asc, term asc) order whose inclusive-suffix norm still reaches the
threshold. A pair with cos >= t must share at least one prefix feature
of each side (Cauchy–Schwarz over the shared suffix), so candidate
generation touches only prefix postings; verification then computes
the exact dot product and applies the exact threshold, making the
filter lossless — the output equals the brute-force answer below the
group cap.

Everything the threshold decision touches is INTEGER: tf and df are
counts, idf is milli-quantized through the boundary-safe quantizer
(functions/quantize.py qround of ln((N+1)/(df+1))*1000 — the mirrored
nudge makes the one transcendental libm-independent; the round-4
driver observed a raw-floor ULP flip here),
weights are L2-normalized into milli-units via the one documented
deterministic float chain (w*1000.0/sqrt(ssq) + 0.5, identical
operation order in numpy and DuckDB), and the threshold t = tnum/tden
is applied as tden^2*dot^2 >= tnum^2*ssq_a*ssq_b in int64 (normalized
milli vectors keep ssq ~ 1e6, dot <= ~1.01e6, so every product fits
int64 with >400x headroom). The DuckDB oracle re-derives the identical
pipeline with a brute-force term self-join — no float-ranking hazard.

Scale shape: six bucketed keyed exchanges (term-df, doc-regroup,
prefix-postings, pair-dedup, probe/vector co-location, pair-verify),
no broadcast of the vocabulary or the vectors, no all-pairs stage.
Degenerate postings (a prefix term shared by more than ``max_group``
documents) are skipped and counted via ``report_cap`` — the documented
approximation at scale; below the cap the join is exact. The cap is
load-bearing on duplicate-heavy corpora: at sf0.1 twenty-seven hot
postings (max 3,921 docs sharing one prefix term) alone would emit
94.6 M candidate pairs, while every posting under 500 docs together
emits 31 k (measured); a dense near-dup CLUSTER's pairs are inherently
quadratic, and that regime belongs to MinHash-LSH banding
(stages/dedup.py) — this join is the high-precision instrument for the
long tail below the cap. sf0.01/sf0.001 have no posting above the cap,
so the driver's oracle gate is exact.

Reference parity note: the reference tool has no similarity join; this
is part of the training-data engine mandate (SURVEY.md "beyond the
reference" ops), sibling of stages/dedup.py's MinHash/SimHash/Jaccard
family — this one is threshold-exact rather than probabilistic.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions.quantize import qround
from osm_export_tool_python_ray.functions.text import alnum_tokens_batch
from osm_export_tool_python_ray.stages.exchange import grouped_map, hash_bucket
from osm_export_tool_python_ray.state.metrics import report_cap

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _pair_key(a, b):
    with np.errstate(over="ignore"):
        return a.astype(np.uint64) * _GOLDEN ^ b.astype(np.uint64)


def tfidf_cosine_pairs(
    docs_ds,
    n_docs,
    tnum=4,
    tden=5,
    num_buckets=64,
    max_group=500,
):
    """All document pairs with TF-IDF cosine >= tnum/tden, exactly.

    ``docs_ds``: Dataset with (doc_id int64, text string).
    ``n_docs``: global document count (a driver scalar — read metadata,
    not a materialization). Returns (doc_a, doc_b, dot, ssq_a, ssq_b)
    — all int64, dot in milli^2 units of the normalized vectors, so
    cos = dot / sqrt(ssq_a*ssq_b).
    """
    tnum2 = int(tnum) * int(tnum)
    tden2 = int(tden) * int(tden)

    # ---- stage 1: per-batch (doc, term, tf) fold -------------------
    def term_tf_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        flat, ntoks = alnum_tokens_batch(texts)
        doc_of = np.repeat(ids, ntoks)
        pairs = pa.table(
            {
                "doc_id": pa.array(doc_of.astype(np.int64)),
                "term": pa.array(flat, type=pa.string()),
            }
        )
        g = pairs.group_by(["doc_id", "term"]).aggregate([("term", "count")])
        # select the aggregate by its GENERATED name, never positionally
        out = pa.table(
            {
                "doc_id": g.column("doc_id"),
                "term": g.column("term"),
                "tf": g.column("term_count"),
            }
        )
        return out.append_column(
            "bucket", pa.array(hash_bucket(out.column("term"), num_buckets))
        )

    term_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
    )

    # ---- stage 2: term-keyed exchange attaches global df -----------
    def attach_df(g: pa.Table) -> pa.Table:
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        _u, inv, cnt = np.unique(terms, return_inverse=True, return_counts=True)
        t = g.drop_columns(["bucket"])
        return t.append_column("df", pa.array(cnt[inv].astype(np.int64)))

    with_df = grouped_map(
        docs_ds.map_batches(term_tf_rows, batch_format="pyarrow"),
        "bucket",
        attach_df,
        num_partitions=min(num_buckets, 32),
        payload_schema=term_schema,
    )

    # ---- stage 3: doc-keyed exchange — weights, prefixes -----------
    def add_doc_bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((d % num_buckets).astype(np.int32))
        )

    nf = float(n_docs) + 1.0

    def doc_vectors(g: pa.Table) -> pa.Table:
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        tf = g.column("tf").to_numpy(zero_copy_only=False)
        df = g.column("df").to_numpy(zero_copy_only=False)
        # global feature order: (df asc, term asc) — rarest first, the
        # consistent order the prefix-filter guarantee requires
        order = np.lexsort((terms, df, d))
        d, terms, tf, df = d[order], terms[order], tf[order], df[order]
        # milli-quantized idf: the ONE transcendental in the pipeline —
        # boundary-safe (mirrored nudge, functions/quantize.py) so a
        # numpy-vs-DuckDB libm ULP difference can never flip a unit
        idf = qround(
            np.log(nf / (df.astype(np.float64) + 1.0)) * 1000.0, "tfidf_idf"
        )
        w = tf.astype(np.int64) * idf
        starts = np.nonzero(
            np.concatenate([[True], d[1:] != d[:-1]]) if len(d) else np.array([], bool)
        )[0]
        seg = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(d))))
        ssq0 = np.zeros(len(starts), dtype=np.int64)
        np.add.at(ssq0, seg, w * w)
        keep = ssq0[seg] > 0  # drop all-zero-weight docs (oracle: WHERE ssq0 > 0)
        wn = np.zeros(len(w), dtype=np.int64)
        nzm = ssq0[seg] > 0
        wn[nzm] = np.floor(
            w[nzm].astype(np.float64) * 1000.0
            / np.sqrt(ssq0[seg][nzm].astype(np.float64))
            + 0.5
        ).astype(np.int64)
        ssq = np.zeros(len(starts), dtype=np.int64)
        np.add.at(ssq, seg, wn * wn)
        # inclusive-suffix ssq within each doc (rows already in global
        # feature order within the doc): reverse segmented cumsum
        sq = wn * wn
        csum = np.cumsum(sq)
        seg_end_csum = np.append(csum[starts[1:] - 1], csum[-1] if len(csum) else 0)
        prev = np.concatenate([[0], csum[:-1]]) if len(csum) else csum
        suffix = seg_end_csum[seg] - prev  # sum of sq from row i to doc end
        pref = (tden2 * suffix) >= (tnum2 * ssq[seg])
        out = pa.table(
            {
                "term": pa.array(terms[keep], type=pa.string()),
                "doc_id": pa.array(d[keep]),
                "wn": pa.array(wn[keep]),
                "ssq": pa.array(ssq[seg][keep]),
                "pref": pa.array(pref[keep]),
            }
        )
        return out

    vec_schema = pa.schema(
        [
            ("term", pa.string()),
            ("doc_id", pa.int64()),
            ("wn", pa.int64()),
            ("ssq", pa.int64()),
            ("pref", pa.bool_()),
        ]
    )
    vec_rows = grouped_map(
        with_df.map_batches(add_doc_bucket, batch_format="pyarrow"),
        "bucket",
        doc_vectors,
        num_partitions=min(num_buckets, 32),
        payload_schema=vec_schema,
    ).materialize()  # branch point: feeds candidate generation AND verification

    # ---- stage 4: prefix postings → candidate pairs ----------------
    def rebucket_term(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pa.array(hash_bucket(t.column("term"), num_buckets))
        )

    def cand_pairs(g: pa.Table) -> pa.Table:
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        pref = g.column("pref").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, terms))
        terms, ids, pref = terms[order], ids[order], pref[order]
        first = (
            np.concatenate([[True], terms[1:] != terms[:-1]])
            if len(terms)
            else np.array([], bool)
        )
        starts = np.nonzero(first)[0]
        ends = np.append(starts[1:], len(terms))
        # the group loop below is the house per-group pattern
        # (_pairs_from_groups), but a Zipf vocabulary is dominated by
        # df=1 singletons — pre-select the loopable groups vectorized
        # (size >= 2 AND >= 1 prefix member) so the Python loop touches
        # only postings that can actually pair
        sizes = ends - starts
        npref_per = np.add.reduceat(
            pref.astype(np.int64), starts
        ) if len(starts) else np.array([], dtype=np.int64)
        loopable = (sizes >= 2) & (npref_per >= 1)
        out_a, out_b = [], []
        skipped = 0
        for s, e in zip(starts[loopable], ends[loopable]):
            m = e - s
            gp = pref[s:e]
            npref = int(gp.sum())
            if m > max_group:
                skipped += 1
                continue
            gi = ids[s:e]
            pid = gi[gp]
            qid = gi[~gp]
            if npref >= 2:
                iu, ju = np.triu_indices(npref, k=1)
                out_a.append(pid[iu])
                out_b.append(pid[ju])
            if len(qid):
                out_a.append(np.repeat(pid, len(qid)))
                out_b.append(np.tile(qid, npref))
        report_cap("tfidf_cosine_hot_terms_skipped", skipped)
        if not out_a:
            z = np.array([], dtype=np.int64)
            return pa.table({"doc_a": pa.array(z), "doc_b": pa.array(z)})
        a = np.concatenate(out_a).astype(np.int64)
        b = np.concatenate(out_b).astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(a, b)),
                "doc_b": pa.array(np.maximum(a, b)),
            }
        )

    raw_pairs = grouped_map(
        vec_rows.map_batches(rebucket_term, batch_format="pyarrow"),
        "bucket",
        cand_pairs,
        num_partitions=min(num_buckets, 32),
        payload_schema=vec_schema,
    )

    # ---- stage 5: pair dedup ---------------------------------------
    def add_pkey_bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        key = _pair_key(a, b)
        return t.append_column(
            "bucket", pa.array((key % np.uint64(num_buckets)).astype(np.int32))
        )

    def first_pair(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = (
            np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
            if len(a)
            else np.array([], bool)
        )
        return pa.table({"doc_a": pa.array(a[first]), "doc_b": pa.array(b[first])})

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    pairs = grouped_map(
        raw_pairs.map_batches(add_pkey_bucket, batch_format="pyarrow"),
        "bucket",
        first_pair,
        num_partitions=min(num_buckets, 32),
        payload_schema=pair_schema,
    )

    # ---- stage 6: co-locate each pair side with its vector ---------
    # probes (side 0/1 of each pair) union vec rows, keyed by doc; per
    # partition the probe explodes into that doc's term rows.
    def probes(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        n = len(a)
        jdoc = np.concatenate([a, b])
        return pa.table(
            {
                "jdoc": pa.array(jdoc),
                "doc_a": pa.array(np.concatenate([a, a])),
                "doc_b": pa.array(np.concatenate([b, b])),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(n, np.int8)]
                    )
                ),
                "term": pa.nulls(2 * n, type=pa.string()),
                "wn": pa.nulls(2 * n, type=pa.int64()),
                "ssq": pa.nulls(2 * n, type=pa.int64()),
                "kind": pa.array(np.zeros(2 * n, np.int8)),
                "bucket": pa.array((jdoc % num_buckets).astype(np.int32)),
            }
        )

    def vec_as_probe_schema(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(d)
        return pa.table(
            {
                "jdoc": pa.array(d),
                "doc_a": pa.nulls(n, type=pa.int64()),
                "doc_b": pa.nulls(n, type=pa.int64()),
                "side": pa.nulls(n, type=pa.int8()),
                "term": t.column("term"),
                "wn": t.column("wn"),
                "ssq": t.column("ssq"),
                "kind": pa.array(np.ones(n, np.int8)),
                "bucket": pa.array((d % num_buckets).astype(np.int32)),
            }
        )

    from osm_export_tool_python_ray.stages.exchange import union_all

    probe_union = union_all(
        pairs.map_batches(probes, batch_format="pyarrow"),
        vec_rows.map_batches(vec_as_probe_schema, batch_format="pyarrow"),
    )

    def explode_pair_terms(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        # split Arrow-side FIRST: to_numpy on a null-bearing int64
        # column silently widens to float64 — filtering the table keeps
        # every column at its declared type
        pmask = pc_.equal(g.column("kind"), 0)
        pt = g.filter(pmask)
        vt = g.filter(pc_.invert(pmask))
        vd = vt.column("jdoc").to_numpy(zero_copy_only=False)
        vorder = np.argsort(vd, kind="stable")
        vd = vd[vorder]
        vterm = np.asarray(vt.column("term").to_pylist(), dtype=object)[vorder]
        vwn = vt.column("wn").to_numpy(zero_copy_only=False)[vorder]
        vssq = vt.column("ssq").to_numpy(zero_copy_only=False)[vorder]
        pd_ = pt.column("jdoc").to_numpy(zero_copy_only=False)
        pa_ = pt.column("doc_a").to_numpy(zero_copy_only=False)
        pb_ = pt.column("doc_b").to_numpy(zero_copy_only=False)
        ps_ = pt.column("side").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(vd, pd_, side="left")
        hi = np.searchsorted(vd, pd_, side="right")
        cnt = hi - lo
        # row index expansion: for probe i, vec rows lo[i]..hi[i]
        rep = np.repeat(np.arange(len(pd_)), cnt)
        offs = np.arange(len(rep)) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]) if len(cnt) else np.array([], np.int64),
            cnt,
        )
        vidx = np.repeat(lo, cnt) + offs
        key = _pair_key(pa_[rep].astype(np.int64), pb_[rep].astype(np.int64))
        return pa.table(
            {
                "doc_a": pa.array(pa_[rep].astype(np.int64)),
                "doc_b": pa.array(pb_[rep].astype(np.int64)),
                "side": pa.array(ps_[rep]),
                "term": pa.array(vterm[vidx], type=pa.string()),
                "wn": pa.array(vwn[vidx]),
                "ssq": pa.array(vssq[vidx]),
                "bucket": pa.array((key % np.uint64(num_buckets)).astype(np.int32)),
            }
        )

    probe_schema = pa.schema(
        [
            ("jdoc", pa.int64()),
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("side", pa.int8()),
            ("term", pa.string()),
            ("wn", pa.int64()),
            ("ssq", pa.int64()),
            ("kind", pa.int8()),
        ]
    )
    pair_terms = grouped_map(
        probe_union,
        "bucket",
        explode_pair_terms,
        num_partitions=min(num_buckets, 32),
        payload_schema=probe_schema,
    )

    # ---- stage 7: pair-keyed exchange — exact dot + threshold ------
    def verify(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        wn = g.column("wn").to_numpy(zero_copy_only=False)
        ssq = g.column("ssq").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, terms, b, a))
        a, b, side, terms, wn, ssq = (
            a[order], b[order], side[order], terms[order], wn[order], ssq[order],
        )
        n = len(a)
        if n == 0:
            z = np.array([], dtype=np.int64)
            return pa.table(
                {"doc_a": pa.array(z), "doc_b": pa.array(z), "dot": pa.array(z),
                 "ssq_a": pa.array(z), "ssq_b": pa.array(z)}
            )
        # adjacent rows with equal (a,b,term) and side 0 then 1 = a
        # shared term of the pair: contribution wn0*wn1
        same = (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (terms[1:] == terms[:-1])
        shared = same & (side[:-1] == 0) & (side[1:] == 1)
        contrib = np.zeros(n, dtype=np.int64)
        contrib[:-1][shared] = wn[:-1][shared] * wn[1:][shared]
        # pair segments
        pfirst = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        pstarts = np.nonzero(pfirst)[0]
        pseg = np.repeat(np.arange(len(pstarts)), np.diff(np.append(pstarts, n)))
        dot = np.zeros(len(pstarts), dtype=np.int64)
        np.add.at(dot, pseg, contrib)
        ssq_a = np.zeros(len(pstarts), dtype=np.int64)
        ssq_b = np.zeros(len(pstarts), dtype=np.int64)
        np.maximum.at(ssq_a, pseg[side == 0], ssq[side == 0])
        np.maximum.at(ssq_b, pseg[side == 1], ssq[side == 1])
        keep = (tden2 * dot * dot) >= (tnum2 * ssq_a * ssq_b)
        keep &= (ssq_a > 0) & (ssq_b > 0)
        return pa.table(
            {
                "doc_a": pa.array(a[pstarts][keep]),
                "doc_b": pa.array(b[pstarts][keep]),
                "dot": pa.array(dot[keep]),
                "ssq_a": pa.array(ssq_a[keep]),
                "ssq_b": pa.array(ssq_b[keep]),
            }
        )

    verify_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("side", pa.int8()),
            ("term", pa.string()),
            ("wn", pa.int64()),
            ("ssq", pa.int64()),
        ]
    )
    return grouped_map(
        pair_terms,
        "bucket",
        verify,
        num_partitions=min(num_buckets, 32),
        payload_schema=verify_schema,
    )
