"""Boundary-safe quantization: numpy ≡ DuckDB differential + audit.

The mirrored-nudge rule (functions/quantize.py) exists so that a libm
ULP difference between numpy and DuckDB can never flip a quantized
integer in an oracle-checked query. These tests prove:

1. away from boundaries qround == floor(y+0.5) and qfloor == floor(y);
2. inside the snap band both sides collapse to the boundary integer;
3. the DuckDB CASE fragment evaluates bit-identically to the numpy
   helper on adversarial near-boundary inputs (the actual differential
   the production oracles rely on);
4. values in the guard annulus are counted via report_cap
   (``quant_ambiguous_<label>``), so production data that ever skirts
   the band edge is surfaced, not silently lucky.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from osm_export_tool_python_ray.functions.quantize import (
    EPS_REL,
    qfloor,
    qround,
    qround6,
    sql_qfloor,
    sql_qround,
    sql_qround6,
)


def _adversarial_values(rng):
    """Floats spanning magnitudes, plus values planted near boundaries."""
    ordinary = rng.uniform(-1e4, 1e4, 500)
    ints = np.arange(-50, 50, dtype=np.float64)
    near = np.concatenate(
        [
            ints + 0.5 + 1e-16,  # half-up boundary, just above
            ints + 0.5 - 1e-16,  # just below
            ints + 0.5,  # exactly on (representable halves)
            ints + 1e-12,  # near integer (qfloor boundary)
            ints - 1e-12,
            ints + 0.5 + 5e-13,  # inside the snap band (eps >= 1e-12)
            ints + 0.5 - 5e-13,
            ints + 0.5 + 3e-10,  # near-but-outside the band
            ints + 0.5 - 3e-10,
        ]
    )
    big = rng.uniform(-1e9, 1e9, 100)
    return np.concatenate([ordinary, near, big, ints])


def test_qround_matches_plain_floor_away_from_boundary():
    rng = np.random.default_rng(7)
    y = rng.uniform(-1e5, 1e5, 2000)
    z = y + 0.5
    dist = np.abs(z - np.rint(z))
    far = dist > 1e-6 * np.maximum(1.0, np.abs(z))
    assert np.array_equal(
        qround(y[far]), np.floor(y[far] + 0.5).astype(np.int64)
    )


def test_qfloor_matches_plain_floor_away_from_boundary():
    rng = np.random.default_rng(8)
    y = rng.uniform(-1e5, 1e5, 2000)
    dist = np.abs(y - np.rint(y))
    far = dist > 1e-6 * np.maximum(1.0, np.abs(y))
    assert np.array_equal(qfloor(y[far]), np.floor(y[far]).astype(np.int64))


def test_snap_band_collapses_both_sides():
    # values straddling a boundary within the band quantize identically
    n = np.arange(-20, 20, dtype=np.float64)
    lo = n + 0.5 - 5e-13  # below the half-up boundary, inside band
    hi = n + 0.5 + 5e-13  # above, inside band
    assert np.array_equal(qround(lo), qround(hi))
    assert np.array_equal(qround(lo), (n + 1).astype(np.int64))
    blo = n - 5e-13
    bhi = n + 5e-13
    assert np.array_equal(qfloor(blo), qfloor(bhi))
    assert np.array_equal(qfloor(blo), n.astype(np.int64))


@pytest.mark.parametrize(
    "np_fn,sql_fn",
    [(qround, sql_qround), (qfloor, sql_qfloor)],
    ids=["qround", "qfloor"],
)
def test_duckdb_differential_int(np_fn, sql_fn):
    rng = np.random.default_rng(11)
    y = _adversarial_values(rng)
    con = duckdb.connect()
    con.register("t", pa.table({"y": pa.array(y, type=pa.float64())}))
    got = (
        con.execute("SELECT %s AS q FROM t" % sql_fn("y"))
        .arrow()
        .column("q")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    con.close()
    assert np.array_equal(got, np_fn(y))


def test_duckdb_differential_round6():
    rng = np.random.default_rng(12)
    x = np.concatenate(
        [
            rng.uniform(-50, 50, 500),
            # plant values near 6-decimal boundaries
            np.arange(100) / 100.0 + 0.0000005,
            np.arange(100) / 100.0 + 0.0000005 + 1e-14,
            np.arange(100) / 100.0 + 0.0000005 - 1e-14,
        ]
    )
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(x, type=pa.float64())}))
    got = (
        con.execute("SELECT %s AS q FROM t" % sql_qround6("x"))
        .arrow()
        .column("q")
        .to_numpy(zero_copy_only=False)
    )
    con.close()
    want = qround6(x)
    assert got.dtype == np.float64
    assert np.array_equal(got, want)  # bit-identical, no tolerance


def test_simulated_libm_divergence_is_healed():
    """The production failure mode: two environments compute the same
    transcendental a few ULPs apart around a boundary — the raw floor
    flips, the nudged quantizer does not."""
    y0 = np.array([1234.5])  # y such that y + 0.5 sits on an integer
    for ulps in (1, 2, 8):
        a = y0 - ulps * np.spacing(y0)  # env A computed the value low
        b = y0 + ulps * np.spacing(y0)  # env B computed it high
        # raw floor(y + 0.5): the two environments disagree
        assert np.floor(a + 0.5) != np.floor(b + 0.5)
        # nudged: identical (both snap to the boundary integer)
        assert np.array_equal(qround(a), qround(b))
        assert qround(a)[0] == 1235


def test_annulus_ambiguity_is_counted(ray_session):
    from osm_export_tool_python_ray.state.metrics import snapshot_caps

    snapshot_caps(reset=True)
    z = np.array([100.0 + 3.0 * EPS_REL * 100.0])  # inside (eps/2, 8eps]
    qfloor(z, label="unit_test_annulus")
    import time

    # fire-and-forget report: allow the actor a moment
    for _ in range(50):
        caps = snapshot_caps(reset=True)
        if caps.get("quant_ambiguous_unit_test_annulus"):
            break
        time.sleep(0.05)
    assert caps.get("quant_ambiguous_unit_test_annulus") == 1


# every production site converted to the boundary-safe quantizer; running
# them over the real test tables IS the boundary-distance audit: any value
# inside the guard annulus would be counted as quant_ambiguous_<label>
CONVERTED_QUERIES = [
    "tfidf_cosine_pairs",
    "vocab_topk",
    "unigram_logprob",
    "naive_bayes_lang",
    "weighted_sample",
    "type_entropy",
    "pmi_top",
    "bm25_topk",
    "chi2_terms",
    "drift_chi2",
    "tile_counts",
]


def test_no_ambiguous_boundaries_on_test_data(ray_session):
    """VERDICT r4 item 2: prove the tested data sits clear of every
    quantization boundary — a libm/numpy/DuckDB version bump cannot flip
    a row. Runs each converted query over sf0.001 and asserts the
    ambiguity counters stayed at zero (workers report through the
    cap-counter actor)."""
    import time

    import ray.data

    from osm_export_tool_python_ray.pipelines.queries import QUERIES
    from osm_export_tool_python_ray.state.metrics import snapshot_caps

    snapshot_caps(reset=True)
    for name in CONVERTED_QUERIES:
        res = QUERIES[name]("/root/testdata/sf0.001")
        if isinstance(res, ray.data.Dataset):
            res.materialize()
    time.sleep(1.0)  # let fire-and-forget reports drain
    caps = snapshot_caps(reset=True)
    amb = {k: v for k, v in caps.items() if k.startswith("quant_ambiguous_")}
    assert amb == {}, "values inside the quantization guard annulus: %r" % amb


def test_ann_topk_boundary_margin():
    """ADVICE r4: ann_recall_eval's integer metrics depend on exact top-k
    SET membership, which numpy-vs-DuckDB summation order could flip only
    at a near-tie on the rank-(k-1)/k boundary. Prove the deterministic
    corpus carries a macroscopic margin there (>=1e-6 cosine, eleven
    orders above summation noise ~1e-14) for both k=5 (recall eval) and
    k=10 (ann_topk) at both oracle scales."""
    import os

    import pyarrow.parquet as pq_

    for sf in ("sf0.001", "sf0.01"):
        t = pq_.read_table(os.path.join("/root/testdata", sf, "embeddings.parquet"))
        m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        q = m[:4]
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        mn = np.linalg.norm(m, axis=1, keepdims=True)
        sims = (q @ m.T) / np.maximum(qn * mn.T, 1e-300)
        srt = -np.sort(-sims, axis=1)
        for k in (5, 10):
            gap = srt[:, k - 1] - srt[:, k]
            assert gap.min() > 1e-6, (sf, k, gap.min())
