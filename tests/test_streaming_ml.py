"""watermark_late (event-time watermark / allowed-lateness semantics) and
naive_bayes_lang (distributed model train + broadcast score): planted
cases, brute-force equivalence, and tie-break pins. Oracle parity at
sf0.001/sf0.01 is covered by tools/check_oracles.py (driver contract)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from osm_export_tool_python_ray.pipelines.queries import QUERIES

DELAY_MOD = 600_000_000
LATE_US = 120_000_000
GOLD = np.uint64(0x9E3779B97F4A7C15)


def _events_table(rows):
    eid, uid, tsu, et, val = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(list(eid), type=pa.int64()),
            "ts": pa.array(
                np.array(list(tsu), dtype=np.int64).astype("datetime64[us]")
            ),
            "user_id": pa.array(list(uid), type=pa.int64()),
            "event_type": pa.array(list(et), type=pa.string()),
            "value": pa.array(list(val), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )


def _delays(eids):
    from osm_export_tool_python_ray.functions.text import _mix64

    with np.errstate(over="ignore"):
        return (
            _mix64(np.asarray(eids, dtype=np.int64).astype(np.uint64) * GOLD)
            % np.uint64(DELAY_MOD)
        ).astype(np.int64)


def _brute_watermark(eids, uids, tss):
    """Per-user O(n^2)-free reference: process in (arrival, event_id)
    order with an explicit Python running max."""
    delays = _delays(eids)
    arrival = np.asarray(tss, dtype=np.int64) + delays
    out = {}
    order = np.lexsort((np.asarray(eids), arrival, np.asarray(uids)))
    state = {}
    for i in order:
        u = int(uids[i])
        ts = int(tss[i])
        n, nl, ml, wm = state.get(u, (0, 0, 0, None))
        if wm is not None:
            if ts < wm - LATE_US:
                nl += 1
            if wm > ts:
                ml = max(ml, wm - ts)
        state[u] = (n + 1, nl, ml, ts if wm is None else max(wm, ts))
    for u, (n, nl, ml, _w) in state.items():
        out[u] = (n, nl, ml)
    return out


class TestWatermarkLate:
    def test_randomized_matches_brute_force(self, ray_session, tmp_path):
        rng = np.random.RandomState(7)
        n = 400
        eids = np.arange(n)
        uids = rng.randint(0, 7, n)
        base = 1_700_000_000_000_000
        tss = base + rng.randint(0, 3_000_000_000, n).cumsum() // 3
        rows = [
            (int(e), int(u), int(t), "click", 1.0)
            for e, u, t in zip(eids, uids, tss)
        ]
        d = tmp_path / "wm1"
        d.mkdir()
        pq.write_table(_events_table(rows), str(d / "events.parquet"))
        out = QUERIES["watermark_late"](str(d)).to_pandas().set_index("user_id")
        exp = _brute_watermark(eids, uids, tss)
        assert set(out.index) == set(exp)
        for u, (ne, nl, ml) in exp.items():
            assert out.loc[u, "n_events"] == ne
            assert out.loc[u, "n_late"] == nl, u
            assert out.loc[u, "max_lateness_us"] == ml, u
        # the planted scale makes disorder certain: some event must show
        # a positive watermark lag or the fixture is degenerate
        assert out["max_lateness_us"].max() > 0

    def test_watermark_resets_between_users(self, ray_session, tmp_path):
        """A user with a huge event-time must not leak a watermark into
        the next user's segment (the segmented-cummax boundary)."""
        base = 1_700_000_000_000_000
        far = base + 10**12
        rows = [
            (0, 1, far, "a", 0.0),
            (1, 1, far + 1, "a", 0.0),
            # user 2's events are ~31 years earlier; if the prefix max
            # leaked across the segment, every one of these would be late
            (2, 2, base, "a", 0.0),
            (3, 2, base + 1, "a", 0.0),
            (4, 2, base + 2, "a", 0.0),
        ]
        d = tmp_path / "wm2"
        d.mkdir()
        pq.write_table(_events_table(rows), str(d / "events.parquet"))
        out = QUERIES["watermark_late"](str(d)).to_pandas().set_index("user_id")
        eids = [r[0] for r in rows]
        uids = [r[1] for r in rows]
        tss = [r[2] for r in rows]
        exp = _brute_watermark(eids, uids, tss)
        for u in (1, 2):
            ne, nl, ml = exp[u]
            assert out.loc[u, "n_events"] == ne
            assert out.loc[u, "n_late"] == nl
            assert out.loc[u, "max_lateness_us"] == ml
        # the >> 600 s inter-user gap can never be explained by the
        # bounded simulated delay: user 2 must have NO late events
        assert out.loc[2, "n_late"] == 0


def _docs_table(rows):
    did, text, lang = zip(*rows)
    return pa.table(
        {
            "doc_id": pa.array(list(did), type=pa.int64()),
            "text": pa.array(list(text), type=pa.string()),
            "lang": pa.array(list(lang), type=pa.string()),
            "source": pa.array(["s"] * len(rows), type=pa.string()),
            "n_chars": pa.array([len(t) for t in text], type=pa.int64()),
        }
    )


class TestNaiveBayesLang:
    def test_planted_two_lang(self, ray_session, tmp_path):
        """Distinctive vocabularies → every test doc classified right,
        and score_micro matches the closed-form integer computation."""
        rows = [
            (0, "alpha alpha beta", "en"),
            (2, "alpha beta beta", "en"),
            (4, "zeta zeta eta", "de"),
            (6, "zeta eta eta", "de"),
            (1, "alpha beta alpha", "en"),  # test
            (3, "eta zeta zeta", "de"),  # test
        ]
        d = tmp_path / "nb1"
        d.mkdir()
        pq.write_table(_docs_table(rows), str(d / "documents.parquet"))
        out = QUERIES["naive_bayes_lang"](str(d)).to_pandas().set_index("doc_id")
        assert out.loc[1, "lang_pred"] == "en"
        assert out.loc[3, "lang_pred"] == "de"
        # closed form for doc 1: vocab = {alpha,beta,eta,zeta} (V=4),
        # en totals: alpha 3, beta 3, tot 6; prior ln(2/4)
        V = 4
        lp_alpha = round(np.log((3 + 1.0) / (6 + V)) * 1e6)
        lp_beta = round(np.log((3 + 1.0) / (6 + V)) * 1e6)
        prior = round(np.log(2 / 4) * 1e6)
        assert out.loc[1, "score_micro"] == prior + 2 * lp_alpha + lp_beta

    def test_tie_breaks_lang_ascending(self, ray_session, tmp_path):
        """Mirror-symmetric training + a test doc touching both classes
        equally → exact integer score tie → smallest lang wins (both the
        engine argmax-first and the SQL row_number order pin this)."""
        rows = [
            (0, "xx xx", "aa"),
            (2, "yy yy", "bb"),
            (1, "xx yy", "aa"),  # test; scores for aa and bb are equal
        ]
        d = tmp_path / "nb2"
        d.mkdir()
        pq.write_table(_docs_table(rows), str(d / "documents.parquet"))
        out = QUERIES["naive_bayes_lang"](str(d)).to_pandas().set_index("doc_id")
        assert out.loc[1, "lang_pred"] == "aa"

    def test_oov_only_doc_scores_prior(self, ray_session, tmp_path):
        """A test doc with no in-vocab token gets exactly the prior as
        its score (OOV tokens contribute nothing on either side)."""
        rows = [
            (0, "alpha alpha", "en"),
            (2, "alpha beta", "en"),
            (4, "zeta", "de"),
            (1, "qqq www", "en"),  # test, fully OOV? no: vocab is global
        ]
        # vocab = {alpha, beta, zeta}; qqq/www are out of vocabulary
        d = tmp_path / "nb3"
        d.mkdir()
        pq.write_table(_docs_table(rows), str(d / "documents.parquet"))
        out = QUERIES["naive_bayes_lang"](str(d)).to_pandas().set_index("doc_id")
        prior_en = round(np.log(2 / 3) * 1e6)
        prior_de = round(np.log(1 / 3) * 1e6)
        assert out.loc[1, "score_micro"] == max(prior_en, prior_de)
        assert out.loc[1, "lang_pred"] == "en"
