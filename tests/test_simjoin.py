"""tfidf_cosine_pairs (stages/simjoin.py): brute-force equivalence and
the prefix-filter losslessness claim, on adversarial corpora."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_force(docs, tnum=4, tden=5):
    """Reference in plain numpy/python — the exact pipeline spec."""
    import re

    tok = re.compile(r"[a-z0-9]+")
    tfs = []
    for _id, text in docs:
        terms = tok.findall((text or "").lower())
        tf = {}
        for w in terms:
            tf[w] = tf.get(w, 0) + 1
        tfs.append((_id, tf))
    n = len(docs)
    df = {}
    for _id, tf in tfs:
        for w in tf:
            df[w] = df.get(w, 0) + 1
    vecs = {}
    ssqs = {}
    for _id, tf in tfs:
        w = {
            t: c * int(np.floor(np.log((n + 1.0) / (df[t] + 1.0)) * 1000.0 + 0.5))
            for t, c in tf.items()
        }
        s0 = sum(v * v for v in w.values())
        if s0 <= 0:
            continue
        wn = {
            t: int(np.floor(float(v) * 1000.0 / np.sqrt(float(s0)) + 0.5))
            for t, v in w.items()
        }
        vecs[_id] = wn
        ssqs[_id] = sum(v * v for v in wn.values())
    out = []
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = set(vecs[a]) & set(vecs[b])
            dot = sum(vecs[a][t] * vecs[b][t] for t in shared)
            if tden * tden * dot * dot >= tnum * tnum * ssqs[a] * ssqs[b] and dot > 0:
                out.append((a, b, dot, ssqs[a], ssqs[b]))
    return sorted(out)


def _run(docs, ray_session, **kw):
    import ray.data

    from osm_export_tool_python_ray.stages.simjoin import tfidf_cosine_pairs

    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs], type=pa.string()),
        }
    )
    rows = tfidf_cosine_pairs(
        ray.data.from_arrow(t), n_docs=len(docs), num_buckets=8, **kw
    ).take_all()
    return sorted(
        (r["doc_a"], r["doc_b"], r["dot"], r["ssq_a"], r["ssq_b"]) for r in rows
    )


def test_brute_force_equivalence_randomized(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
             "iota", "kappa", "rare1", "rare2", "rare3"]
    docs = []
    for i in range(120):
        k = int(rng.integers(1, 12))
        words = list(rng.choice(vocab, size=k, replace=True))
        # plant clusters of near-identical docs
        if i % 10 == 0:
            words = ["alpha", "beta", "rare1", "rare1", "gamma"]
        if i % 10 == 1:
            words = ["alpha", "beta", "rare1", "rare1", "gamma", "zeta"]
        docs.append((i, " ".join(words)))
    assert _run(docs, ray_session) == _brute_force(docs)


def test_edge_cases(ray_session):
    docs = [
        (0, ""),  # empty text → no vector
        (1, "???!!!"),  # no alnum tokens
        (2, "same same same words here"),
        (3, "same same same words here"),  # exact dup of 2 → cos = 1
        (4, "entirely different tokens qqq www"),
        (5, "the the the"),  # single ubiquitous term
        (6, "the the"),  # shares only 'the' with 5 → cos(5,6)=1 on that axis
    ]
    got = _run(docs, ray_session)
    assert got == _brute_force(docs)
    pairs = {(a, b) for a, b, *_ in got}
    assert (2, 3) in pairs  # exact duplicate found
    assert not any(0 in p or 1 in p for p in pairs)  # empty docs excluded


def test_identical_corpus_all_pairs(ray_session):
    # NB: with NO distinct doc, every term has df == N → idf == 0 → all
    # vectors are zero and are excluded on both sides (verified by
    # _brute_force agreement in the other tests); the extra doc keeps
    # idf positive so the 9 identical docs form a full clique.
    docs = [(i, "tok1 tok2 tok3") for i in range(9)] + [(99, "other words")]
    got = _run(docs, ray_session)
    got = [p for p in got if 99 not in p[:2]]
    assert len(got) == 9 * 8 // 2
    # all-identical normalized vectors: dot == ssq on every pair
    for a, b, dot, sa, sb in got:
        assert dot == sa == sb


def test_hot_term_cap_counts(ray_session):
    # one term shared by every doc, max_group below corpus size: the
    # degenerate posting is skipped AND counted; pairs that only share
    # the hot term are (documented) lost, pairs sharing rare terms are
    # kept because their rare posting still generates them.
    from osm_export_tool_python_ray.state.metrics import snapshot_caps

    # 'hot' IS each doc's whole vector (single term, df < N so idf > 0)
    # → it is in every doc's prefix, and its 12-doc posting exceeds the
    # cap → skipped AND counted. A posting with no prefix members (zero
    # possible candidates) is skipped WITHOUT counting — not an
    # approximation — which the earlier fixtures exercise via idf == 0.
    docs = (
        [(i, "hot") for i in range(12)]
        + [(20, "pear pear snap"), (21, "pear pear snap"), (22, "zzz")]
    )
    snapshot_caps()
    got = _run(docs, ray_session, max_group=8)
    caps = snapshot_caps()
    assert caps.get("tfidf_cosine_hot_terms_skipped", 0) >= 1
    # the small 'pear'/'snap' postings still pair the identical docs
    assert (20, 21) in {(a, b) for a, b, *_ in got}


def test_threshold_is_exact_boundary(ray_session):
    # orthogonal-ish pair just below threshold is excluded; the engine
    # and brute force agree on the strict >= integer comparison
    docs = [
        (0, "aa bb cc dd"),
        (1, "aa bb cc ee"),
        (2, "aa zz yy xx"),
    ]
    assert _run(docs, ray_session) == _brute_force(docs)


class TestSortedNeighborhood:
    """sorted_neighborhood_pairs vs a brute-force sort+window, with the
    halo/chunk machinery forced to matter (tiny chunk sizes)."""

    @staticmethod
    def _brute(docs, window=4, key_len=12):
        import re

        squash = re.compile(r"[^a-z0-9]+")
        rows = sorted(
            ((squash.sub("", (t or "").lower())[:key_len], d) for d, t in docs)
        )
        out = []
        for i in range(len(rows)):
            for j in range(1, window):
                if i + j >= len(rows):
                    break
                out.append(
                    (rows[i][1], rows[i + j][1], j, rows[i][0], rows[i + j][0])
                )
        return sorted(out)

    @staticmethod
    def _run(docs, ray_session, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.snm import sorted_neighborhood_pairs

        t = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": pa.array([t for _, t in docs], type=pa.string()),
            }
        )
        out = sorted_neighborhood_pairs(ray.data.from_arrow(t), **kw)
        rows = out.to_pylist() if isinstance(out, pa.Table) else out.take_all()
        return sorted(
            (r["doc_a"], r["doc_b"], r["dist"], r["key_a"], r["key_b"])
            for r in rows
        )

    def test_brute_force_small_chunk(self, ray_session):
        # chunk=5 on 40 docs: every pair family crosses chunk seams
        rng = np.random.default_rng(3)
        words = ["apple", "apples", "aple", "banana", "bananna", "cherry",
                 "Cherry!", "  cherry  ", "date", "dates", ""]
        docs = [(i, str(rng.choice(words)) + (" x" * int(rng.integers(0, 3))))
                for i in range(40)]
        got = self._run(docs, ray_session, window=4, chunk=5, num_buckets=4)
        assert got == self._brute(docs, window=4)

    def test_duplicate_keys_tiebreak_by_doc_id(self, ray_session):
        docs = [(i, "identical text") for i in range(7)]
        got = self._run(docs, ray_session, window=3, chunk=3, num_buckets=2)
        assert got == self._brute(docs, window=3)
        # consecutive doc_ids pair at dist 1 (rank order = doc_id order)
        assert (0, 1, 1, "identicaltex", "identicaltex") in got

    def test_window_2_adjacent_only(self, ray_session):
        docs = [(i, "k%02d" % i) for i in range(10)]
        got = self._run(docs, ray_session, window=2, chunk=4)
        assert [(a, b, d) for a, b, d, *_ in got] == [
            (i, i + 1, 1) for i in range(9)
        ]

    def test_key_packing_order_matches_string_order(self, ray_session):
        # keys that differ only past the 8-byte word boundary, plus
        # prefix-of-each-other keys (NUL padding must sort first)
        docs = [
            (0, "abcdefghX"),
            (1, "abcdefgh"),
            (2, "abcdefghijkl"),
            (3, "abcdefghijklMORE"),  # truncated to 12 → ties with 2
            (4, "abcdefg"),
        ]
        got = self._run(docs, ray_session, window=3, chunk=2, num_buckets=2)
        assert got == self._brute(docs, window=3)


def test_entity_clusters_transitive_beyond_window(ray_session):
    """Chained matches merge into ONE cluster even when the endpoints
    are farther apart than the SNM window (components, not windows,
    define the entity)."""
    import ray.data

    from osm_export_tool_python_ray.stages.dedup import dedup_clusters
    from osm_export_tool_python_ray.stages.snm import sorted_neighborhood_pairs
    import pyarrow.compute as pc

    # six docs with the same 8-char prefix (one entity), plus noise
    docs = [(i, "prefixAB suffix%d" % i) for i in range(6)]
    docs += [(100 + i, "zz unrelated %d" % i) for i in range(4)]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([x for _, x in docs], type=pa.string()),
        }
    )
    pairs = sorted_neighborhood_pairs(ray.data.from_arrow(t), window=3, chunk=4)

    def verify(tt):
        ka = pc.utf8_slice_codeunits(tt.column("key_a"), 0, 8)
        kb = pc.utf8_slice_codeunits(tt.column("key_b"), 0, 8)
        f = tt.filter(pc.equal(ka, kb))
        return pa.table({"doc_a": f.column("doc_a"), "doc_b": f.column("doc_b")})

    out = dedup_clusters(pairs.map_batches(verify, batch_format="pyarrow")).take_all()
    cl = {r["doc_id"]: r["cluster_id"] for r in out}
    # docs 0..5: rank-adjacent chain with equal prefixes → one cluster,
    # labeled by its min member, even though (0,5) exceeds window 3
    assert [cl[i] for i in range(6)] == [0] * 6
