"""local_supplier_volume (TPC-H Q5-shaped 6-table join tree) and
kmv_distinct (bottom-k distinct sketch with merge): planted fixtures and
brute-force equivalence. Oracle parity at sf0.001/sf0.01 is covered by
tools/check_oracles.py (driver contract)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from osm_export_tool_python_ray.functions.text import hash_bytes
from osm_export_tool_python_ray.pipelines.queries import QUERIES

US = 1_000_000


def _write(d, name, table):
    pq.write_table(table, str(d / (name + ".parquet")))


def _ts(s):
    return np.datetime64(s, "us")


def _q5_fixture(d):
    """2 regions, 3 nations, and a hand-built fact web exercising every
    drop reason: wrong region, date outside 1996, supplier nation !=
    customer nation — plus an exact-quantization lineitem."""
    _write(
        d,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], type=pa.int32()),
                "r_name": pa.array(["ASIA", "EUROPE"]),
            }
        ),
    )
    _write(
        d,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], type=pa.int32()),
                "n_name": pa.array(["CHINA", "JAPAN", "FRANCE"]),
                "n_regionkey": pa.array([0, 0, 1], type=pa.int32()),
            }
        ),
    )
    _write(
        d,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([10, 11, 12], type=pa.int64()),
                "c_name": pa.array(["c10", "c11", "c12"]),
                "c_nationkey": pa.array([0, 1, 2], type=pa.int32()),
                "c_acctbal": pa.array([0.0, 0.0, 0.0]),
                "c_mktsegment": pa.array(["x", "x", "x"]),
            }
        ),
    )
    _write(
        d,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([20, 21, 22], type=pa.int64()),
                "s_name": pa.array(["s20", "s21", "s22"]),
                "s_nationkey": pa.array([0, 1, 2], type=pa.int32()),
                "s_acctbal": pa.array([0.0, 0.0, 0.0]),
            }
        ),
    )
    # orders: 100 in-window CHINA cust, 101 out-of-window CHINA cust,
    # 102 in-window JAPAN cust, 103 in-window FRANCE cust (wrong region)
    _write(
        d,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102, 103], type=pa.int64()),
                "o_custkey": pa.array([10, 10, 11, 12], type=pa.int64()),
                "o_orderstatus": pa.array(["O"] * 4),
                "o_totalprice": pa.array([1.0] * 4),
                "o_orderdate": pa.array(
                    [
                        _ts("1996-06-01"),
                        _ts("1995-12-31"),
                        _ts("1996-01-01"),
                        _ts("1996-06-01"),
                    ]
                ),
                "o_orderpriority": pa.array(["1"] * 4),
            }
        ),
    )
    # lineitems: (order, supp, price, disc)
    li = [
        (100, 20, 100.05, 0.07),  # CHINA/CHINA: kept, 100.05*0.93=93.0465
        (100, 21, 50.00, 0.00),  # CHINA cust / JAPAN supp: dropped
        (100, 20, 10.00, 0.10),  # kept: 9.0 -> 90000
        (101, 20, 999.0, 0.00),  # order out of window: dropped
        (102, 21, 200.0, 0.25),  # JAPAN/JAPAN kept: 150.0 -> 1500000
        (103, 22, 300.0, 0.00),  # FRANCE: wrong region, dropped
    ]
    ok, sk, ep, dc = zip(*li)
    n = len(li)
    _write(
        d,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(list(ok), type=pa.int64()),
                "l_partkey": pa.array([1] * n, type=pa.int64()),
                "l_suppkey": pa.array(list(sk), type=pa.int64()),
                "l_linenumber": pa.array(list(range(n)), type=pa.int32()),
                "l_quantity": pa.array([1.0] * n),
                "l_extendedprice": pa.array(list(ep), type=pa.float64()),
                "l_discount": pa.array(list(dc), type=pa.float64()),
                "l_tax": pa.array([0.0] * n),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array([_ts("1996-07-01")] * n),
            }
        ),
    )


class TestLocalSupplierVolume:
    def test_planted(self, ray_session, tmp_path):
        d = tmp_path / "q5"
        d.mkdir()
        _q5_fixture(d)
        out = QUERIES["local_supplier_volume"](str(d)).to_pandas()
        # JAPAN 1_500_000 > CHINA 930_465+90_000
        assert out["n_name"].tolist() == ["JAPAN", "CHINA"]
        assert out["revenue_e4"].tolist() == [1_500_000, 1_020_465]

    def test_randomized_matches_pandas(self, ray_session, tmp_path):
        rng = np.random.RandomState(13)
        d = tmp_path / "q5r"
        d.mkdir()
        _q5_fixture(d)  # dims reused; overwrite facts below
        n_ord, n_li = 60, 300
        odate = np.array(
            [_ts("1995-06-01")] * n_ord, dtype="datetime64[us]"
        ) + rng.randint(0, 700, n_ord).astype("timedelta64[D]").astype(
            "timedelta64[us]"
        )
        ocust = rng.choice([10, 11, 12], n_ord)
        _write(
            d,
            "orders",
            pa.table(
                {
                    "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                    "o_custkey": pa.array(ocust.astype(np.int64)),
                    "o_orderstatus": pa.array(["O"] * n_ord),
                    "o_totalprice": pa.array(np.ones(n_ord)),
                    "o_orderdate": pa.array(odate),
                    "o_orderpriority": pa.array(["1"] * n_ord),
                }
            ),
        )
        lok = rng.randint(0, n_ord, n_li).astype(np.int64)
        lsk = rng.choice([20, 21, 22], n_li).astype(np.int64)
        lep = np.round(rng.uniform(1, 1000, n_li), 2)
        ldc = np.round(rng.uniform(0, 0.1, n_li), 2)
        _write(
            d,
            "lineitem",
            pa.table(
                {
                    "l_orderkey": pa.array(lok),
                    "l_partkey": pa.array(np.ones(n_li, dtype=np.int64)),
                    "l_suppkey": pa.array(lsk),
                    "l_linenumber": pa.array(
                        np.arange(n_li, dtype=np.int32)
                    ),
                    "l_quantity": pa.array(np.ones(n_li)),
                    "l_extendedprice": pa.array(lep),
                    "l_discount": pa.array(ldc),
                    "l_tax": pa.array(np.zeros(n_li)),
                    "l_returnflag": pa.array(["N"] * n_li),
                    "l_linestatus": pa.array(["O"] * n_li),
                    "l_shipdate": pa.array(
                        np.array([_ts("1996-07-01")] * n_li)
                    ),
                }
            ),
        )
        out = QUERIES["local_supplier_volume"](str(d)).to_pandas()

        # brute force in pandas
        cnat = {10: 0, 11: 1, 12: 2}
        snat = {20: 0, 21: 1, 22: 2}
        nname = {0: "CHINA", 1: "JAPAN"}
        t0, t1 = _ts("1996-01-01"), _ts("1997-01-01")
        okeep = (odate >= t0) & (odate < t1)
        rev = np.floor(lep * (1.0 - ldc) * 10000.0 + 0.5).astype(np.int64)
        exp = {}
        for i in range(n_li):
            o = int(lok[i])
            if not okeep[o]:
                continue
            cn = cnat[int(ocust[o])]
            if cn not in nname or snat[int(lsk[i])] != cn:
                continue
            exp[nname[cn]] = exp.get(nname[cn], 0) + int(rev[i])
        expected = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
        assert list(zip(out["n_name"], out["revenue_e4"])) == expected


def _docs_table(texts, sources):
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(list(texts), type=pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(list(sources), type=pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def _brute_kmv(texts_by_source, K=128):
    def est(hset):
        hs = sorted(hset)[:K]
        if len(hs) < K:
            return len(hs), len(hs)
        return K, min((K - 1) * (1 << 64) // hs[K - 1], 1 << 62)

    out = {}
    allh = set()
    for s, ts in texts_by_source.items():
        hs = {hash_bytes(t.encode("utf-8")) for t in set(ts)}
        allh |= hs
        out[s] = est(hs)
    out["__ALL__"] = est(allh)
    return out


class TestKmvDistinct:
    def test_exact_below_k_and_estimator_above_k(self, ray_session, tmp_path):
        rng = np.random.RandomState(5)
        small = ["s %d" % i for i in range(40)] * 3  # 40 distinct, dup'd
        big = ["b %d %d" % (i, rng.randint(1000)) for i in range(600)]
        texts = small + big
        sources = ["small"] * len(small) + ["big"] * len(big)
        d = tmp_path / "kmv"
        d.mkdir()
        _write(d, "documents", _docs_table(texts, sources))
        out = (
            QUERIES["kmv_distinct"](str(d)).to_pandas().set_index("source")
        )
        brute = _brute_kmv({"small": small, "big": big})
        for s in ("small", "big", "__ALL__"):
            assert (
                out.loc[s, "sketch_k"],
                out.loc[s, "est_distinct"],
            ) == brute[s], s
        # exact regime: sketch holds everything
        assert out.loc["small", "est_distinct"] == 40
        # estimator regime: within 35% of truth (k=128 => ~9% std err)
        n_big = len(set(big))
        assert abs(out.loc["big", "est_distinct"] - n_big) < 0.35 * n_big

    def test_merge_dedups_cross_source_duplicates(self, ray_session, tmp_path):
        shared = ["dup %d" % i for i in range(30)]
        d = tmp_path / "kmv2"
        d.mkdir()
        texts = shared + shared  # identical text sets in two sources
        sources = ["a"] * 30 + ["b"] * 30
        _write(d, "documents", _docs_table(texts, sources))
        out = (
            QUERIES["kmv_distinct"](str(d)).to_pandas().set_index("source")
        )
        assert out.loc["a", "est_distinct"] == 30
        assert out.loc["b", "est_distinct"] == 30
        assert out.loc["__ALL__", "est_distinct"] == 30  # merged, not 60
        # binary-collation row order matches DuckDB's ORDER BY
        assert out.index.tolist() == sorted(out.index.tolist())


def _brute_chi2(texts, langs, topk=50):
    import re

    n = len(texts)
    n1 = sum(1 for l in langs if l == "en")
    n0 = n - n1
    cnt = {}
    for t, l in zip(texts, langs):
        for w in set(re.findall(r"[a-z0-9]+", t.lower())):
            a, b = cnt.get(w, (0, 0))
            cnt[w] = (a + 1, b) if l == "en" else (a, b + 1)
    rows = []
    for w, (a, b) in cnt.items():
        if a + b >= n:
            continue
        d2 = float(a) * float(n0 - b) - float(b) * float(n1 - a)
        num = float(n) * d2 * d2
        den = (float(a + b) * float(n - a - b)) * (float(n1) * float(n0))
        rows.append((w, a, b, num / den))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [(w, a, b, round(x, 6)) for w, a, b, x in rows[:topk]]


class TestChi2Terms:
    def test_planted_discriminative_term(self, ray_session, tmp_path):
        rng = np.random.RandomState(11)
        texts, langs = [], []
        fillers = ["alpha", "beta", "gamma", "delta"]
        for i in range(120):
            en = i % 2 == 0
            ws = list(rng.choice(fillers, 5))
            # 'shibboleth' appears in 90% of en docs, 5% of others
            if (en and rng.rand() < 0.9) or (not en and rng.rand() < 0.05):
                ws.append("shibboleth")
            texts.append(" ".join(ws))
            langs.append("en" if en else "de")
        d = tmp_path / "chi2"
        d.mkdir()
        tbl = _docs_table(texts, ["s"] * len(texts))
        tbl = tbl.set_column(
            tbl.schema.get_field_index("lang"),
            "lang",
            pa.array(langs, type=pa.string()),
        )
        _write(d, "documents", tbl)
        out = QUERIES["chi2_terms"](str(d)).to_pandas()
        assert out.iloc[0]["term"] == "shibboleth"
        got = list(
            zip(out["term"], out["df_pos"], out["df_neg"], out["chi2"])
        )
        assert got == _brute_chi2(texts, langs)


class TestDecisionStump:
    def test_planted_clean_split(self, ray_session, tmp_path):
        # en docs short (<= 50 chars), others long: perfect split at 50
        texts, langs = [], []
        for i in range(40):
            texts.append("a" * (20 + i % 30))
            langs.append("en")
        for i in range(40):
            texts.append("b" * (200 + i % 30))
            langs.append("de")
        d = tmp_path / "stump"
        d.mkdir()
        tbl = _docs_table(texts, ["s"] * 80)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("lang"),
            "lang",
            pa.array(langs, type=pa.string()),
        )
        _write(d, "documents", tbl)
        out = QUERIES["decision_stump"](str(d)).to_pandas().iloc[0]
        assert out["n_pos_left"] == 40 and out["n_neg_left"] == 0
        assert out["n_pos_right"] == 0 and out["n_neg_right"] == 40
        assert out["threshold"] == 49  # longest en doc: 20+29
        assert out["score"] == 80.0  # 40^2/40 + 40^2/40

    def test_randomized_matches_brute(self, ray_session, tmp_path):
        rng = np.random.RandomState(3)
        n = 300
        lens = rng.randint(5, 60, n)
        langs = np.where(
            rng.rand(n) < np.clip(lens / 60.0, 0, 1), "de", "en"
        )
        texts = ["x" * int(l) for l in lens]
        d = tmp_path / "stump2"
        d.mkdir()
        tbl = _docs_table(texts, ["s"] * n)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("lang"),
            "lang",
            pa.array(list(langs), type=pa.string()),
        )
        _write(d, "documents", tbl)
        out = QUERIES["decision_stump"](str(d)).to_pandas().iloc[0]

        # brute force over every candidate threshold
        xs = np.asarray([len(t) for t in texts])
        pos = (langs == "en").astype(np.int64)
        best = None
        for t in sorted(set(xs)):
            L = xs <= t
            if L.all():
                continue
            c1, c0 = int(pos[L].sum()), int((~pos.astype(bool))[L].sum())
            r1, r0 = int(pos[~L].sum()), int((1 - pos)[~L].sum())
            sc = (c1 * c1 + c0 * c0) / (c1 + c0) + (r1 * r1 + r0 * r0) / (
                r1 + r0
            )
            if best is None or sc > best[0] or (sc == best[0] and t < best[1]):
                best = (sc, t, c1, c0, r1, r0)
        assert out["threshold"] == best[1]
        assert (
            out["n_pos_left"],
            out["n_neg_left"],
            out["n_pos_right"],
            out["n_neg_right"],
        ) == best[2:]


class TestEwmaUsers:
    def test_matches_brute_force(self, ray_session, tmp_path):
        rng = np.random.RandomState(9)
        n = 500
        eids = np.arange(n, dtype=np.int64)
        uids = rng.randint(0, 12, n).astype(np.int64)
        tss = 1_700_000_000_000_000 + rng.randint(
            0, 10**9, n
        ).astype(np.int64)
        vals = np.round(rng.uniform(-5, 5, n), 3)
        import pyarrow.parquet as _pq

        rows = list(zip(eids, uids, tss, ["e"] * n, vals))
        tbl = pa.table(
            {
                "event_id": pa.array(eids),
                "ts": pa.array(tss.astype("datetime64[us]")),
                "user_id": pa.array(uids),
                "event_type": pa.array(["e"] * n),
                "value": pa.array(vals),
                "props": pa.array(["{}"] * n),
            }
        )
        d = tmp_path / "ewma"
        d.mkdir()
        _write(d, "events", tbl)
        out = (
            QUERIES["ewma_users"](str(d)).to_pandas().set_index("user_id")
        )
        q = np.floor(vals * 1_000_000.0 + 0.5).astype(np.int64)
        for u in np.unique(uids):
            m = uids == u
            order = np.lexsort((-eids[m], -tss[m]))  # newest first
            vv = q[m][order][:16]
            num = int(sum(int(v) << (15 - j) for j, v in enumerate(vv)))
            assert out.loc[u, "ewma_num"] == num, u
            assert out.loc[u, "n_window"] == len(vv), u


class TestBenfordAudit:
    def test_planted_digits(self, ray_session, tmp_path):
        # prices with known leading cents-digits: 1.00->100(d1),
        # 25.50->2550(d2), 0.09->9(d9), 999.99->99999(d9), 0.001->0 dropped
        ep = [1.00, 25.50, 0.09, 999.99, 0.001, 3.33, 3.00]
        n = len(ep)
        tbl = pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.ones(n, dtype=np.int64)),
                "l_suppkey": pa.array(np.ones(n, dtype=np.int64)),
                "l_linenumber": pa.array(np.arange(n, dtype=np.int32)),
                "l_quantity": pa.array(np.ones(n)),
                "l_extendedprice": pa.array(ep, type=pa.float64()),
                "l_discount": pa.array(np.zeros(n)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.array([_ts("1996-07-01")] * n)
                ),
            }
        )
        d = tmp_path / "benford"
        d.mkdir()
        _write(d, "lineitem", tbl)
        out = QUERIES["benford_audit"](str(d)).to_pandas().set_index("digit")
        # digits: 1 (100), 2 (2550), 9 (9), 9 (99999), 3 (333), 3 (300)
        assert out.loc[1, "n"] == 1
        assert out.loc[2, "n"] == 1
        assert out.loc[3, "n"] == 2
        assert out.loc[9, "n"] == 2
        assert out["n"].sum() == 6  # 0.001 -> cents 0, dropped
        assert out.loc[3, "pct_e6"] == 2 * 1_000_000 // 6


class TestAssocRules:
    def test_matches_brute_force(self, ray_session, tmp_path):
        rng = np.random.RandomState(21)
        n = 800
        uids = rng.randint(0, 60, n).astype(np.int64)
        types = np.asarray(
            [["view", "click", "buy", "share"][i] for i in rng.randint(0, 4, n)],
            dtype=object,
        )
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(
                    (1_700_000_000_000_000 + np.arange(n)).astype(
                        "datetime64[us]"
                    )
                ),
                "user_id": pa.array(uids),
                "event_type": pa.array(list(types), type=pa.string()),
                "value": pa.array(np.ones(n)),
                "props": pa.array(["{}"] * n),
            }
        )
        d = tmp_path / "assoc"
        d.mkdir()
        _write(d, "events", tbl)
        out = QUERIES["assoc_rules"](str(d)).to_pandas()

        baskets = {}
        for u, t in zip(uids, types):
            baskets.setdefault(int(u), set()).add(t)
        nu = len(baskets)
        na = {}
        for b in baskets.values():
            for t in b:
                na[t] = na.get(t, 0) + 1
        exp = []
        dist = sorted(na)
        for a in dist:
            for c in dist:
                if a >= c:
                    continue
                nab = sum(1 for b in baskets.values() if a in b and c in b)
                if nab < 5:
                    continue
                for ante, cons in ((a, c), (c, a)):
                    exp.append(
                        (
                            ante,
                            cons,
                            nab,
                            nab * 1_000_000 // na[ante],
                            nu * nab * 1_000_000 // (na[ante] * na[cons]),
                        )
                    )
        exp.sort()
        got = list(
            zip(out["ante"], out["cons"], out["nab"], out["conf_e6"], out["lift_e6"])
        )
        assert got == exp


class TestEmptyInputs:
    """Engine/oracle parity on zero-row inputs for the round-4 late
    additions: both sides must yield zero rows (no crash, no sentinel)."""

    def test_empty_documents_queries(self, ray_session, tmp_path):
        d = tmp_path / "empty_docs"
        d.mkdir()
        _write(d, "documents", _docs_table([], []))
        for name in ("kmv_distinct", "chi2_terms", "decision_stump"):
            out = QUERIES[name](str(d)).to_pandas()
            assert len(out) == 0, name

    def test_empty_events_queries(self, ray_session, tmp_path):
        d = tmp_path / "empty_ev"
        d.mkdir()
        _write(
            d,
            "events",
            pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.timestamp("us")),
                    "user_id": pa.array([], type=pa.int64()),
                    "event_type": pa.array([], type=pa.string()),
                    "value": pa.array([], type=pa.float64()),
                    "props": pa.array([], type=pa.string()),
                }
            ),
        )
        for name in (
            "ewma_users",
            "assoc_rules",
            "drift_chi2",
            "trending",
            "conversion_latency",
            "bounce_rate",
        ):
            res = QUERIES[name](str(d))
            out = res.to_pandas() if hasattr(res, "to_pandas") else res
            assert len(out) == 0, name


class TestThemeCooccurrence:
    def test_multilabel_routing_pairs(self, ray_session):
        out = QUERIES["theme_cooccurrence"]("unused").to_pandas()
        got = list(
            zip(out["theme_a"], out["theme_b"], out["geom_type"], out["n"])
        )
        # every named amenity point co-occurs; roads only as lines; the
        # exact counts pin the deterministic 4-shard corpus
        assert ("amenities", "named", 1, 50) in got
        assert ("named", "roads", 2, 11) in got
        # pairs are lexicographic and no pair violates its theme types
        for a, b, g, n in got:
            assert a < b and n > 0
            if "roads" in (a, b):
                assert g == 2


class TestLayerFillRates:
    def test_fill_rates_sane_and_pinned(self, ray_session):
        out = QUERIES["layer_fill_rates"]("unused").to_pandas()
        assert len(out) > 0
        # presence never exceeds row count; where-clause keys are 100%
        assert (out["n_present"] <= out["n"]).all()
        # single-key where-clause themes are 100% filled by construction
        r = out[(out["theme"] == "roads") & (out["col"] == "highway")]
        assert len(r) == 1 and (r["n_present"] == r["n"]).all()
        b = out[(out["theme"] == "buildings") & (out["col"] == "building")]
        assert len(b) == 1 and (b["n_present"] == b["n"]).all()
        # and a known-sparse select column is strictly partial
        nm = out[(out["theme"] == "roads") & (out["col"] == "name")]
        assert len(nm) == 1 and (nm["n_present"] < nm["n"]).all()
        # rows sorted lexicographically on (theme, col) like the oracle
        key = list(zip(out["theme"], out["col"]))
        assert key == sorted(key)


class TestBatchingInvariance:
    """Per-batch combiners must be batching-invariant: the same fixture
    written as ONE row group vs many tiny row groups (tiny Ray blocks)
    must produce identical results for every new combiner-shaped query."""

    def test_documents_queries(self, ray_session, tmp_path):
        rng = np.random.RandomState(17)
        texts = [
            " ".join(rng.choice(["a", "b", "c", "d", "e", "f"], 8))
            for _ in range(240)
        ]
        langs = [["en", "de", "fr"][i % 3] for i in range(240)]
        srcs = [["s1", "s2", "s3", "s4"][i % 4] for i in range(240)]
        tbl = _docs_table(texts, srcs)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("lang"),
            "lang",
            pa.array(langs, type=pa.string()),
        )
        d1 = tmp_path / "one"
        d2 = tmp_path / "many"
        d1.mkdir()
        d2.mkdir()
        pq.write_table(tbl, str(d1 / "documents.parquet"))
        pq.write_table(tbl, str(d2 / "documents.parquet"), row_group_size=16)
        for name in ("kmv_distinct", "chi2_terms", "decision_stump"):
            a = QUERIES[name](str(d1)).to_pandas()
            b = QUERIES[name](str(d2)).to_pandas()
            pd.testing.assert_frame_equal(a, b), name

    def test_events_queries(self, ray_session, tmp_path):
        rng = np.random.RandomState(19)
        n = 400
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(
                    (
                        1_700_000_000_000_000
                        + rng.randint(0, 10**9, n).astype(np.int64)
                    ).astype("datetime64[us]")
                ),
                "user_id": pa.array(rng.randint(0, 25, n).astype(np.int64)),
                "event_type": pa.array(
                    [["view", "click", "buy"][i] for i in rng.randint(0, 3, n)],
                    type=pa.string(),
                ),
                "value": pa.array(np.round(rng.uniform(-2, 2, n), 3)),
                "props": pa.array(["{}"] * n),
            }
        )
        d1 = tmp_path / "one"
        d2 = tmp_path / "many"
        d1.mkdir()
        d2.mkdir()
        pq.write_table(tbl, str(d1 / "events.parquet"))
        pq.write_table(tbl, str(d2 / "events.parquet"), row_group_size=16)
        for name in ("ewma_users", "assoc_rules"):
            a = QUERIES[name](str(d1)).to_pandas()
            b = QUERIES[name](str(d2)).to_pandas()
            pd.testing.assert_frame_equal(a, b), name


class TestAudioFeatures:
    def test_real_wav_decode_profile(self, ray_session, tmp_path):
        d = tmp_path / "audio"
        d.mkdir()
        _write(d, "documents", _docs_table(["x"] * 12, ["s"] * 12))
        out = QUERIES["audio_features"](str(d)).to_pandas()
        assert len(out) == 12
        assert (out["format"] == "wav").all()
        assert (out["sample_rate"] == 16000).all()
        # clip lengths are the seeded 10..50 ms family
        assert set(out["n_samples"]).issubset(
            {159, 160, 319, 320, 479, 480, 639, 640, 799, 800}
        )
        assert (
            out["duration_us"] == out["n_samples"] * 1_000_000 // 16000
        ).all()


class TestAnnRecallEval:
    def test_metrics_shape_and_selfhit(self, ray_session):
        out = (
            QUERIES["ann_recall_eval"]("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("query_id")
        )
        assert sorted(out.index) == [0, 1, 2, 3]
        assert (out["n_hits"] >= 1).all()  # query's own vector probes home
        assert (out["recall_ppm"] == out["n_hits"] * 1_000_000 // 5).all()
        assert ((out["rr_ppm"] >= 0) & (out["rr_ppm"] <= 1_000_000)).all()


class TestLDiversityAcf:
    def test_l_diversity_planted(self, ray_session, tmp_path):
        # source 'mono' has one lang (violates l=3); 'tri' has three
        texts = ["t%d" % i for i in range(60)]
        srcs = ["mono"] * 30 + ["tri"] * 30
        langs = ["en"] * 30 + [["en", "de", "fr"][i % 3] for i in range(30)]
        tbl = _docs_table(texts, srcs)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("lang"),
            "lang",
            pa.array(langs, type=pa.string()),
        )
        d = tmp_path / "ldiv"
        d.mkdir()
        _write(d, "documents", tbl)
        out = QUERIES["l_diversity"](str(d)).to_pandas().set_index("source")
        assert out.loc["mono", "l"] == 1 and bool(out.loc["mono", "violates_l"])
        assert out.loc["tri", "l"] == 3 and not bool(out.loc["tri", "violates_l"])

    def test_acf_matches_brute(self, ray_session, tmp_path):
        rng = np.random.RandomState(23)
        n = 600
        uids = rng.randint(0, 10, n).astype(np.int64)
        base = 1_700_000_000_000_000
        tss = base + rng.randint(0, 80 * 3600, n).astype(np.int64) * 1_000_000
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(tss.astype("datetime64[us]")),
                "user_id": pa.array(uids),
                "event_type": pa.array(["e"] * n),
                "value": pa.array(np.ones(n)),
                "props": pa.array(["{}"] * n),
            }
        )
        d = tmp_path / "acf"
        d.mkdir()
        _write(d, "events", tbl)
        out = QUERIES["acf_lag1"](str(d)).to_pandas().set_index("user_id")
        hrs = tss // 3_600_000_000
        for u in np.unique(uids):
            m = uids == u
            cnt = {}
            for h in hrs[m]:
                cnt[int(h)] = cnt.get(int(h), 0) + 1
            sx = sum(cnt.values())
            sxx = sum(v * v for v in cnt.values())
            sxy = sum(
                cnt[h] * cnt[h + 1] for h in cnt if h + 1 in cnt
            )
            span = max(cnt) - min(cnt) + 1
            assert out.loc[u, "n_hours"] == span
            assert out.loc[u, "sx"] == sx
            assert out.loc[u, "sxx"] == sxx
            assert out.loc[u, "sxy"] == sxy


class TestMinhashEval:
    def test_estimator_error_on_planted_neardups(self, ray_session, tmp_path):
        rng = np.random.RandomState(29)
        base = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], 60))
        texts = [base, base + " extra tail words here", "completely different content entirely unrelated"]
        d = tmp_path / "mheval"
        d.mkdir()
        _write(d, "documents", _docs_table(texts, ["s"] * 3))
        out = QUERIES["minhash_eval"](str(d)).to_pandas()
        # docs 0 and 1 are near-dups and must be reported
        assert {(0, 1)} <= set(zip(out["doc_a"], out["doc_b"]))
        r = out.set_index(["doc_a", "doc_b"]).loc[(0, 1)]
        # exact Jaccard of the two window sets is high; estimator close
        assert r["exact_ppm"] > 600_000
        assert r["err_ppm"] == abs(r["est_ppm"] - r["exact_ppm"])
        assert r["err_ppm"] < 250_000  # 64-perm estimator tolerance


class TestLinkScores:
    def test_matches_brute_force(self, ray_session):
        out = QUERIES["link_scores"]("/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0
        # brute-force the graph from the returned edge set itself:
        # degrees and common neighbors recomputed in pure Python
        edges = set(zip(out["user_a"], out["user_b"]))
        nbrs = {}
        for a, b in edges:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        for r in out.itertuples():
            na, nb_ = nbrs[r.user_a], nbrs[r.user_b]
            common = len(na & nb_)
            assert r.n_common == common
            assert r.deg_a == len(na) and r.deg_b == len(nb_)
            assert r.jaccard_ppm == common * 1_000_000 // (
                len(na) + len(nb_) - common
            )


class TestThemePolygonArea:
    def test_matches_pure_python_refs_walk(self, ray_session):
        out = QUERIES["theme_polygon_area"]("unused").to_pandas()
        assert len(out) > 0 and (out["area2_sum"] > 0).all()

        # independent recompute: walk the raw corpus JSON in pure Python
        import json as _json

        import pyarrow.parquet as _pq

        from osm_export_tool_python_ray.pipelines.queries import corpus_path
        from osm_export_tool_python_ray.stages.matcher_eval import (
            CLOSED_WAY_KEYS,
            CLOSED_WAY_KEYVALS,
        )

        tbl = _pq.read_table(corpus_path(n_shards=4))
        nodes, ways = {}, {}
        seen = set()
        for spans in tbl.column("spans").to_pylist():
            for s in spans:
                if s["kind"] != "osm" or s["text"] in seen:
                    continue
                seen.add(s["text"])
                e = _json.loads(s["text"])
                if e["type"] == "node":
                    nodes[e["id"]] = (e["lon"], e["lat"])
                elif e["type"] == "way":
                    ways[e["id"]] = e

        def polygonish(tags):
            return any(k in tags for k in CLOSED_WAY_KEYS) or any(
                tags.get(k) == v for k, v in CLOSED_WAY_KEYVALS.items()
            )

        # buildings theme: building IS NOT NULL-ish -> 'building' key set
        want = 0
        n_polys = 0
        for w in ways.values():
            tags = w.get("tags") or {}
            refs = w.get("refs") or []
            if not tags or "building" not in tags:
                continue
            if len(refs) < 4 or refs[0] != refs[-1]:
                continue
            if not polygonish(tags):
                continue
            if not all(r in nodes for r in refs):
                continue
            x = [int(np.floor(nodes[r][0] * 1e7 + 0.5)) for r in refs]
            y = [int(np.floor(nodes[r][1] * 1e7 + 0.5)) for r in refs]
            a2 = abs(
                sum(
                    x[i] * y[i + 1] - x[i + 1] * y[i]
                    for i in range(len(refs) - 1)
                )
            )
            want += a2
            n_polys += 1
        got = out.set_index("theme")
        if "buildings" in got.index:
            assert got.loc["buildings", "area2_sum"] == want
            assert got.loc["buildings", "n_polys"] == n_polys
        else:
            assert n_polys == 0


class TestThemeLineLength:
    def test_nonempty_and_reversal_invariant_metric(self, ray_session):
        out = QUERIES["theme_line_length"]("unused").to_pandas()
        assert len(out) > 0
        assert (out["l1_len_sum"] > 0).all() and (out["n_lines"] > 0).all()


class TestTrending:
    def test_matches_brute_force(self, ray_session, tmp_path):
        rng = np.random.RandomState(31)
        n = 900
        hrs = rng.randint(0, 12, n).astype(np.int64)
        types = np.asarray(
            [["view", "click", "buy", "share", "like"][i] for i in rng.randint(0, 5, n)],
            dtype=object,
        )
        tss = hrs * 3_600_000_000 + rng.randint(0, 3_600_000_000, n)
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(tss.astype("datetime64[us]")),
                "user_id": pa.array(np.zeros(n, dtype=np.int64)),
                "event_type": pa.array(list(types), type=pa.string()),
                "value": pa.array(np.ones(n)),
                "props": pa.array(["{}"] * n),
            }
        )
        d = tmp_path / "trend"
        d.mkdir()
        _write(d, "events", tbl)
        out = QUERIES["trending"](str(d)).to_pandas()

        # brute force
        cnt = {}
        for h, t in zip(hrs, types):
            cnt[(int(h), t)] = cnt.get((int(h), t), 0) + 1
        top = {}
        for h in sorted(set(int(x) for x in hrs)):
            row = sorted(
                ((t, c) for (hh, t), c in cnt.items() if hh == h),
                key=lambda r: (-r[1], r[0]),
            )[:3]
            top[h] = {t: i for i, (t, _c) in enumerate(row)}
        exp = []
        for h in sorted(top):
            for t, r in sorted(top[h].items(), key=lambda kv: kv[1]):
                prev = top.get(h - 1, {}).get(t, -1)
                exp.append((h, t, cnt[(h, t)], r, prev))
        got = list(
            zip(out["hr"], out["event_type"], out["n"], out["rank"], out["prev_rank"])
        )
        assert got == exp


class TestOrderRecon:
    def test_planted_mismatch_and_zero_item_order(self, ray_session, tmp_path):
        d = tmp_path / "recon"
        d.mkdir()
        _q5_fixture(d)  # reuse dims + lineitems
        # orders: 100 header matches items; 200 has NO lineitems (header
        # surfaces fully as diff); 101/102/103 from fixture keep their rows
        tbl = pq.read_table(str(d / "orders.parquet"))
        import pyarrow as _pa

        extra = pa.table(
            {
                "o_orderkey": pa.array([200], type=pa.int64()),
                "o_custkey": pa.array([10], type=pa.int64()),
                "o_orderstatus": pa.array(["O"]),
                "o_totalprice": pa.array([77.77]),
                "o_orderdate": pa.array([_ts("1996-06-01")]),
                "o_orderpriority": pa.array(["1"]),
            }
        )
        pq.write_table(pa.concat_tables([tbl, extra]), str(d / "orders.parquet"))
        out = QUERIES["order_recon"](str(d)).to_pandas().set_index("orderkey")
        assert out.loc[200, "n_items"] == 0
        assert out.loc[200, "abs_diff_e4"] == 777_700
        # order 100 has 3 lineitems (100.05 + 50.00 + 10.00) vs header 1.0
        assert out.loc[100, "n_items"] == 3
        assert (
            out.loc[100, "abs_diff_e4"]
            == abs(10_000 - (1_000_500 + 500_000 + 100_000))
        )


class TestConversionLatency:
    def test_planted_cases(self, ray_session, tmp_path):
        US = 1_000_000
        # u0: view then purchase (latency 100s); u1: purchase BEFORE view
        # (-1); u2: view only (-1); u3: purchase only (-1)
        rows = [
            (0, 0, 1000 * US, "view"),
            (1, 0, 1100 * US, "purchase"),
            (2, 1, 2000 * US, "purchase"),
            (3, 1, 2100 * US, "view"),
            (4, 2, 3000 * US, "view"),
            (5, 3, 4000 * US, "purchase"),
        ]
        eid, uid, ts, et = zip(*rows)
        tbl = pa.table(
            {
                "event_id": pa.array(list(eid), type=pa.int64()),
                "ts": pa.array(
                    np.array(list(ts), dtype=np.int64).astype("datetime64[us]")
                ),
                "user_id": pa.array(list(uid), type=pa.int64()),
                "event_type": pa.array(list(et), type=pa.string()),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        d = tmp_path / "conv"
        d.mkdir()
        _write(d, "events", tbl)
        out = (
            QUERIES["conversion_latency"](str(d))
            .to_pandas()
            .set_index("user_id")
        )
        assert out.loc[0, "convert_us"] == 100 * US
        assert out.loc[1, "convert_us"] == -1  # bought before viewing
        assert out.loc[2, "convert_us"] == -1 and out.loc[2, "first_buy_us"] == -1
        assert out.loc[3, "convert_us"] == -1 and out.loc[3, "first_view_us"] == -1


class TestBounceRate:
    def test_planted_sessions(self, ray_session, tmp_path):
        US = 1_000_000
        MIN = 60 * US
        # u0: two sessions — [e0,e1] (5 min apart), [e2] alone after 2h
        # → 2 sessions, 1 bounce; u1: one single-event session → bounce
        rows = [
            (0, 0, 0),
            (1, 0, 5 * MIN),
            (2, 0, 200 * MIN),
            (3, 1, 0),
        ]
        eid, uid, ts = zip(*rows)
        tbl = pa.table(
            {
                "event_id": pa.array(list(eid), type=pa.int64()),
                "ts": pa.array(
                    np.array(list(ts), dtype=np.int64).astype("datetime64[us]")
                ),
                "user_id": pa.array(list(uid), type=pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        d = tmp_path / "bounce"
        d.mkdir()
        _write(d, "events", tbl)
        out = (
            QUERIES["bounce_rate"](str(d)).to_pandas().set_index("user_id")
        )
        assert out.loc[0, "n_sessions"] == 2 and out.loc[0, "n_bounce"] == 1
        assert out.loc[0, "bounce_ppm"] == 500_000
        assert out.loc[1, "n_sessions"] == 1 and out.loc[1, "bounce_ppm"] == 1_000_000


class TestDriftChi2:
    def test_planted_drift(self, ray_session, tmp_path):
        US = 1_000_000
        # 'stable' is uniform across halves; 'drifted' appears only late
        rows = []
        eid = 0
        for i in range(40):
            rows.append((eid, 0, i * 100 * US, "stable"))
            eid += 1
        for i in range(30):
            rows.append((eid, 0, (40 * 100 + i) * US + 3000 * US, "drifted"))
            eid += 1
        e, u, ts, et = zip(*rows)
        tbl = pa.table(
            {
                "event_id": pa.array(list(e), type=pa.int64()),
                "ts": pa.array(
                    np.array(list(ts), dtype=np.int64).astype("datetime64[us]")
                ),
                "user_id": pa.array(list(u), type=pa.int64()),
                "event_type": pa.array(list(et), type=pa.string()),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        d = tmp_path / "drift"
        d.mkdir()
        _write(d, "events", tbl)
        out = QUERIES["drift_chi2"](str(d)).to_pandas().set_index("event_type")
        assert out.loc["drifted", "n_early"] == 0
        assert out.loc["drifted", "n_late"] == 30
        # both rows of a 2-type table carry the same chi2; counts differ
        assert out.loc["drifted", "chi2"] == out.loc["stable", "chi2"]
        assert out.loc["drifted", "chi2"] > 10  # strongly significant
