"""Round-3b training-data filters: repetition quality (Gopher-style),
vocabulary top-k, benchmark-n-gram decontamination, PII redaction, and
deterministic hash sampling — planted-semantics unit tests plus full
DuckDB oracle parity over a temp documents table (the same comparison
the driver runs)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def write_sf_dir(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs or ["en"] * n, type=pa.string()),
            "source": pa.array(sources or ["srcT"] * n, type=pa.string()),
            "n_chars": pa.array([len(x or "") for x in texts], type=pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def oracle_compare(sf_dir, names):
    """Run each named query and its oracle over sf_dir, assert the
    sorted-column frames are identical (the driver's comparison)."""
    import duckdb
    import pandas as pd

    from osm_export_tool_python_ray.pipelines.queries import ORACLES, QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('%s/documents.parquet')"
        % sf_dir
    )
    for name in names:
        res = QUERIES[name](sf_dir)
        if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        ora = con.execute(ORACLES[name]).df()
        rc, oc = sorted(res.columns), sorted(ora.columns)
        assert rc == oc, (name, rc, oc)
        a = res[rc].sort_values(rc).reset_index(drop=True)
        b = ora[oc].sort_values(oc).reset_index(drop=True)
        assert a.shape == b.shape, (name, a.shape, b.shape)
        for c in rc:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                assert np.allclose(
                    av.astype(float).round(6), bv.astype(float).round(6), atol=1e-9
                ), (name, c)
            else:
                assert av.astype(str).equals(bv.astype(str)), (name, c)


class TestRepetitionQuality:
    def test_planted(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.textstages import repetition_quality

        texts = [
            "a a a a",          # 4 words, 1 uniq, bigram 'a a' x3
            "w x y z",          # all unique
            "",                 # empty
            "solo",             # 1 word, 0 bigrams
            "go go stop go go", # top bigram 'go go' x2
        ]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(5, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
        rows = {
            r["doc_id"]: r
            for r in ray.data.from_arrow(t)
            .map_batches(repetition_quality, batch_format="pyarrow")
            .take_all()
        }
        assert rows[0]["n_words"] == 4 and rows[0]["n_uniq"] == 1
        assert rows[0]["top_bigram_count"] == 3 and rows[0]["n_bigrams"] == 3
        assert rows[0]["high_repetition"] is True
        assert rows[1]["n_uniq"] == 4 and rows[1]["high_repetition"] is False
        assert rows[2]["n_words"] == 0 and rows[2]["high_repetition"] is False
        assert rows[3]["n_bigrams"] == 0 and rows[3]["top_bigram_count"] == 0
        assert rows[4]["top_bigram_count"] == 2 and rows[4]["n_bigrams"] == 4

    def test_oracle_parity(self, ray_session, tmp_path):
        texts = [
            "the cat the cat the cat",
            "one two three four five six",
            "",
            "punct, stays; out! 9lives 9lives",
            "Tabs\tand  runs   collapse",
        ] * 3
        sf = write_sf_dir(tmp_path, texts)
        oracle_compare(sf, ["repetition_quality", "vocab_topk"])


class TestDecontaminate:
    def test_planted(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.decontam import decontaminate

        # doc 0 is the benchmark slice (0 % 97 == 0); doc 97 also matches
        # the slice rule and must NOT appear in the output.
        bench = "alpha beta gamma delta epsilon zeta"
        texts = {
            0: bench,
            1: "prefix alpha beta gamma delta epsilon suffix",  # shares 5-gram
            2: "totally different words here now then",          # clean
            3: "alpha beta gamma delta",                         # 4-gram only: clean
            97: bench,
        }
        ids = sorted(texts)
        t = pa.table(
            {
                "doc_id": pa.array(np.array(ids, dtype=np.int64)),
                "text": pa.array([texts[i] for i in ids]),
            }
        )
        rows = {
            r["doc_id"]: r
            for r in decontaminate(ray.data.from_arrow(t)).take_all()
        }
        assert set(rows) == {1, 2, 3}
        assert rows[1]["contaminated"] is True and rows[1]["n_overlap"] >= 1
        assert rows[2]["contaminated"] is False and rows[2]["n_overlap"] == 0
        # 4-token doc folds a whole-doc gram, distinct from any 5-gram of
        # the benchmark AND from the benchmark's own whole-doc gram
        assert rows[3]["contaminated"] is False

    def test_short_doc_whole_gram_hits(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.decontam import decontaminate

        # benchmark doc is itself short: its whole-doc gram must match an
        # identical short training doc
        t = pa.table(
            {
                "doc_id": pa.array(np.array([0, 5], dtype=np.int64)),
                "text": pa.array(["tiny doc", "tiny doc"]),
            }
        )
        rows = decontaminate(ray.data.from_arrow(t)).take_all()
        assert len(rows) == 1 and rows[0]["contaminated"] is True

    def test_oracle_parity(self, ray_session, tmp_path):
        rng = np.random.RandomState(7)
        vocab = ["ab", "cd", "ef", "gh", "ij", "kl"]
        texts = [
            " ".join(rng.choice(vocab, size=rng.randint(0, 12)))
            for _ in range(300)
        ]
        sf = write_sf_dir(tmp_path, texts)
        oracle_compare(sf, ["decontaminate"])


class TestPiiAndSample:
    def test_pii_counts(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.textstages import pii_redact

        t = pa.table(
            {
                "doc_id": pa.array(np.array([3], dtype=np.int64)),
                "text": pa.array(["reach me at bob.smith+x@corp.io or 44-201-5556"]),
            }
        )
        r = ray.data.from_arrow(t).map_batches(
            pii_redact, batch_format="pyarrow"
        ).take_all()[0]
        # organic email + appended one; organic phone + appended one
        assert r["n_emails"] == 2 and r["n_phones"] == 2
        assert len(r["red_md5"]) == 32

    def test_hash_sample_deterministic(self, ray_session):
        from osm_export_tool_python_ray.stages.textstages import hash_sample

        t = pa.table(
            {
                "doc_id": pa.array(np.arange(1000, dtype=np.int64)),
                "lang": pa.array(["en"] * 1000),
                "source": pa.array(["s"] * 1000),
            }
        )
        a = hash_sample(t).column("doc_id").to_pylist()
        b = hash_sample(t).column("doc_id").to_pylist()
        assert a == b and 0 < len(a) < 1000
        # rate ~1/10
        assert 50 < len(a) < 200

    def test_oracle_parity(self, ray_session, tmp_path):
        texts = ["words %d here" % i for i in range(120)]
        sf = write_sf_dir(tmp_path, texts)
        oracle_compare(sf, ["pii_redact", "hash_sample"])


class TestCharQuantiles:
    """Exact distributed quantiles (histogram combiner): planted values
    with hand-computed DuckDB quantile_disc ranks, plus oracle parity on
    rank-boundary-heavy sizes (n=20 with q=0.95 exercises the C-double
    ceil convention)."""

    def test_planted(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        # lang en: lengths 1..4 (via 'a'*k), rank(0.5)=ceil(0.5*4)=2 -> 2
        texts = ["a", "aa", "aaa", "aaaa", "b" * 10, "b" * 20]
        langs = ["en"] * 4 + ["fr"] * 2
        sf = write_sf_dir(tmp_path, texts, langs=langs)
        out = (
            QUERIES["char_quantiles"](sf)
            .to_pandas()
            .set_index("lang")
            .sort_index()
        )
        assert out.loc["en", "n_docs"] == 4
        assert (out.loc["en", "p25"], out.loc["en", "p50"]) == (1, 2)
        assert (out.loc["en", "p75"], out.loc["en", "p95"]) == (3, 4)
        # fr: n=2 -> p50 = ceil(1.0) = first value
        assert (out.loc["fr", "n_docs"], out.loc["fr", "p50"]) == (2, 10)

    def test_oracle_parity_rank_boundaries(self, ray_session, tmp_path):
        rng = np.random.default_rng(3)
        texts, langs = [], []
        for lang, n in [("en", 20), ("fr", 100), ("de", 7), ("xx", 1)]:
            for _ in range(n):
                texts.append("x" * int(rng.integers(1, 50)))
                langs.append(lang)
        sf = write_sf_dir(tmp_path, texts, langs=langs)
        oracle_compare(sf, ["char_quantiles"])


class TestTopDocsPerGroup:
    def test_planted_ties_and_rank(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        # en lengths: 9,9,7,5,3,1 -> top5 excludes the length-1 doc; the
        # two 9s tie-break on doc_id asc
        texts = ["x" * n for n in [9, 9, 7, 5, 3, 1]] + ["y" * 4]
        langs = ["en"] * 6 + ["fr"]
        sf = write_sf_dir(tmp_path, texts, langs=langs)
        out = (
            QUERIES["top_docs"](sf)
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        en = out[out.lang == "en"]
        assert list(en["doc_id"]) == [0, 1, 2, 3, 4]
        assert list(en["rank"]) == [1, 2, 3, 4, 5]
        fr = out[out.lang == "fr"]
        assert list(fr["doc_id"]) == [6] and list(fr["rank"]) == [1]

    def test_combiner_equivalence_many_batches(self, ray_session):
        """Partial top-k per batch then merge == global top-k: force many
        small blocks and int group keys."""
        import ray.data

        from osm_export_tool_python_ray.stages.topk import topk_per_group

        rng = np.random.default_rng(5)
        n = 2000
        t = pa.table(
            {
                "gid": pa.array(rng.integers(0, 7, size=n).astype(np.int64)),
                "score": pa.array(rng.integers(0, 50, size=n).astype(np.int64)),
                "rid": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
        ds = ray.data.from_arrow(t).repartition(40)
        out = (
            topk_per_group(ds, group_col="gid", sort_col="score", tie_col="rid", k=3)
            .to_pandas()
            .sort_values(["gid", "rank"])
            .reset_index(drop=True)
        )
        df = t.to_pandas()
        want = (
            df.sort_values(["gid", "score", "rid"], ascending=[True, False, True])
            .groupby("gid")
            .head(3)
            .reset_index(drop=True)
        )
        assert len(out) == len(want)
        assert list(out["rid"]) == list(want["rid"])

    def test_oracle_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(9)
        texts = ["z" * int(rng.integers(1, 30)) for _ in range(200)]
        langs = [["en", "fr", "de"][int(rng.integers(0, 3))] for _ in range(200)]
        sf = write_sf_dir(tmp_path, texts, langs=langs)
        oracle_compare(sf, ["top_docs"])


class TestUnigramLogprob:
    def test_planted_vocab_and_oov(self, ray_session, tmp_path):
        import math

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        # corpus: 'aa' x3, 'bb' x1 -> total 4 tokens; both in top-V
        # doc2 has an OOV?? no - every corpus token is in the vocab, so
        # plant OOV via a doc the vocab DOES include (it is corpus-derived)
        texts = ["aa aa bb", "aa", ""]
        sf = write_sf_dir(tmp_path, texts)
        out = (
            QUERIES["unigram_logprob"](sf)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        total = 4.0
        # int64 micro-nats per token, floor-divided mean (order-exact)
        q_aa = int(np.round(math.log(3 / total) * 1e6))
        q_bb = int(np.round(math.log(1 / total) * 1e6))
        assert out.loc[0, "n_alnum_tokens"] == 3
        assert out.loc[0, "lp_micro"] == (2 * q_aa + q_bb) // 3
        assert out.loc[1, "lp_micro"] == q_aa
        # empty doc: zero tokens, score pinned to 0
        assert out.loc[2, "n_alnum_tokens"] == 0 and out.loc[2, "lp_micro"] == 0

    def test_oov_floor_beyond_topv(self, ray_session, tmp_path):
        """>1000 distinct terms: the rarest fall outside top-V and take
        the 0.5 pseudo-count floor; verified via full oracle parity (the
        oracle re-derives the same cut)."""
        rng = np.random.default_rng(31)
        texts = []
        # 1200 singleton terms + a frequent head so the cut rank is real
        for i in range(1200):
            texts.append("unique%04d common" % i)
        sf = write_sf_dir(tmp_path, texts)
        oracle_compare(sf, ["unigram_logprob"])

    def test_cut_rank_tie_breaks_by_term(self, ray_session, tmp_path):
        """1200 tf=1 terms tie across the V=1000 cut: the distributed
        sort+limit must break the tie by term ASC exactly like the oracle's
        ORDER BY tf DESC, term — t0000..t0998 land inside the vocab (999
        slots behind the tf=2 head term), t0999.. take the 0.5 OOV floor."""
        import math

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        texts = ["t%04d" % i for i in range(1200)] + ["common common"]
        sf = write_sf_dir(tmp_path, texts)
        out = (
            QUERIES["unigram_logprob"](sf)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        total = 1202.0
        in_vocab = int(np.round(math.log(1 / total) * 1e6))
        oov = int(np.round(math.log(0.5 / total) * 1e6))
        assert out.loc[998, "lp_micro"] == in_vocab  # t0998: last inside the cut
        assert out.loc[999, "lp_micro"] == oov  # t0999: first beyond it
        assert out.loc[1199, "lp_micro"] == oov
        oracle_compare(sf, ["unigram_logprob"])

    def test_oracle_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(29)
        words = ["w%d" % i for i in range(50)]
        texts = [
            " ".join(rng.choice(words, size=rng.integers(0, 30)))
            for _ in range(250)
        ]
        sf = write_sf_dir(tmp_path, texts)
        oracle_compare(sf, ["unigram_logprob"])


class TestStratifiedSample:
    def test_exact_k_deterministic(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        texts = ["d%d" % i for i in range(120)]
        langs = (["en"] * 80) + (["fr"] * 30) + (["xx"] * 10)
        sf = write_sf_dir(tmp_path, texts, langs=langs)
        a = QUERIES["stratified_sample"](sf).to_pandas()
        b = QUERIES["stratified_sample"](sf).to_pandas()
        counts = a.groupby("lang").size().to_dict()
        # exact k per stratum; strata smaller than k keep everything
        assert counts == {"en": 20, "fr": 20, "xx": 10}
        key = lambda df: sorted(map(tuple, df[["lang", "doc_id"]].values.tolist()))
        assert key(a) == key(b)

    def test_oracle_parity(self, ray_session, tmp_path):
        texts = ["doc %d" % i for i in range(300)]
        langs = [["en", "fr", "de"][i % 3] for i in range(300)]
        sf = write_sf_dir(tmp_path, texts, langs=langs)
        oracle_compare(sf, ["stratified_sample"])


class TestWeightedSample:
    def test_brute_force_aes_order(self, ray_session, tmp_path):
        """Engine selection == brute-force Efraimidis–Spirakis on the
        same quantized rational keys; longer docs win more slots than
        under the unweighted stratified sampler."""
        import hashlib

        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        rng = np.random.default_rng(5)
        texts = ["x" * int(n) for n in rng.integers(1, 400, size=250)]
        sf = write_sf_dir(tmp_path, texts)
        out = QUERIES["weighted_sample"](sf).to_pandas()
        got = list(zip(out["rank"], out["doc_id"]))
        # brute force over the written parquet
        import pyarrow.parquet as pq_

        t = pq_.read_table(sf + "/documents.parquet").to_pydict()
        M = 1 << 31
        keys = []
        for d, n in zip(t["doc_id"], t["n_chars"]):
            h = int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "little")
            u = ((h % M) + 1.0) / (M + 1)
            lnq = int(np.round(np.log(u) * 1e6))
            akey = (lnq * 1_000_000_000) // max(int(n), 1)
            keys.append((-akey, d))
        keys.sort()
        want = [(i + 1, d) for i, (_k, d) in enumerate(keys[:100])]
        assert sorted(got) == want

    def test_oracle_parity(self, ray_session, tmp_path):
        texts = ["word " * (1 + i % 37) for i in range(300)]
        sf = write_sf_dir(tmp_path, texts)
        oracle_compare(sf, ["weighted_sample"])


class TestLangMad:
    def test_brute_force(self, ray_session, tmp_path):
        """Median and MAD match a brute-force per-group computation with
        the pinned quantile_disc rank convention (1-indexed ceil(q*n))."""
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        rng = np.random.default_rng(11)
        texts = ["x" * int(n) for n in rng.integers(1, 500, size=240)]
        langs = [["en", "fr", "de"][i % 3] for i in range(240)]
        sf = write_sf_dir(tmp_path, texts, langs=langs)
        out = {
            r["lang"]: (r["median_chars"], r["mad_chars"], r["n_docs"])
            for r in QUERIES["lang_mad"](sf).take_all()
        }
        import pyarrow.parquet as pq_

        t = pq_.read_table(sf + "/documents.parquet").to_pydict()
        from collections import defaultdict

        per = defaultdict(list)
        for l, n in zip(t["lang"], t["n_chars"]):
            per[l].append(int(n))

        def qdisc(vals):
            vals = sorted(vals)
            return vals[int(np.ceil(0.5 * len(vals))) - 1]

        for l, vals in per.items():
            med = qdisc(vals)
            mad = qdisc([abs(v - med) for v in vals])
            assert out[l] == (med, mad, len(vals)), l


class TestEmbeddingCoverage:
    def test_counts_at_sf01(self, ray_session):
        """sf0.1 has a real coverage gap (5000 docs, 2000 embeddings):
        totals must add up and missing must be positive."""
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        rows = QUERIES["embedding_coverage"]("/root/testdata/sf0.1").take_all()
        assert sum(r["n_docs"] for r in rows) == 5000
        assert sum(r["n_missing"] for r in rows) == 3000

    def test_full_coverage_zero_missing(self, ray_session):
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        rows = QUERIES["embedding_coverage"]("/root/testdata/sf0.001").take_all()
        assert rows and all(r["n_missing"] == 0 for r in rows)


class TestDedupBest:
    def test_policy_keeps_longest_original(self, ray_session, tmp_path):
        """Planted casing/spacing mirrors collapse into one normalized
        group; the LONGEST original (most whitespace) survives, ties by
        smallest doc_id; distinct texts stay."""
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        texts = [
            "Hello   World",   # doc 0: len 13  <- longest, kept
            "hello world",     # doc 1: len 11
            "HELLO  WORLD",    # doc 2: len 12
            "something else",  # doc 3: distinct, kept
            "hello world",     # doc 4: len 11 (tie with 1 -> both lose to 0)
        ]
        sf = write_sf_dir(tmp_path, texts)
        out = {r["doc_id"]: r["n_copies"] for r in QUERIES["dedup_best"](sf).take_all()}
        assert out == {0: 4, 3: 1}
