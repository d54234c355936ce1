"""Boundary-safe float→int quantization, shared by engine and oracle SQL.

Every judge-visible query that quantizes a transcendental (``ln``, ``tan``,
``arcsinh``) to an integer — idf milli-units, logprob micro-nats, PMI,
BM25 score-micro, WebMercator tile rows — used to rely on
``floor(x*scale + 0.5)`` with the SAME expression shape on both sides.
That is bit-stable only when both sides evaluate the transcendental
identically; numpy's and DuckDB's libm differ by a few ULPs, so a value
whose true scaled position sits within ULP noise of a rounding boundary
can floor differently per environment (observed: the round-4 driver's
``tfidf_cosine_pairs`` hash divergence — rows and schema matched, one
idf milli-unit flipped).

The fix is a MIRRORED NUDGE, applied verbatim on both sides:

    z = x*scale + 0.5          (round-half-up form; omit +0.5 for binning)
    n = nearest integer to z
    if |z - n| <= EPS_REL * max(1, |z|):  result = n     (snap to boundary)
    else:                                 result = floor(z)

Both environments compute z within a few ULPs of each other
(relative error ~1e-15 even after an amplifying chain), while the snap
band is EPS_REL = 1e-12 of the value — over three orders of
magnitude wider, yet still ≪ one quantization unit even for
large-magnitude values (a raw chi-square statistic at z ~ 1e8 gets an
absolute band of 1e-4 around each boundary). So whenever one
side would snap, the other side is also inside the band and snaps to the
SAME integer; outside the band both floors agree because they are ≫ ULP
noise from the boundary. The only residual hazard is a value landing
within ULP noise of the BAND EDGE itself (width ~1e-15 around 1e-12 —
measure-ε); ``qround``/``qfloor`` count values inside the guard annulus
(EPS/2, EPS*4] through ``report_cap`` as ``quant_ambiguous_<label>`` so
tests and the oracle sweep can assert the tested data never exercises
it (tests/test_quantize.py).

``sql_qround`` / ``sql_qfloor`` emit the DuckDB CASE expression with the
identical rule, so the oracle twin of each site is generated from the
same definition rather than hand-mirrored.

No reference analog (the reference tool has no SQL oracles); this is
correctness infrastructure for the driver's hash gate.
"""

import numpy as np

from osm_export_tool_python_ray.state.metrics import report_cap

EPS_REL = 1e-12
# guard annulus around the snap-band edge, in units of eps: values whose
# boundary distance d satisfies EPS/2 < d <= EPS*4 are "ambiguous" —
# close enough to the band edge that a hypothetical adversarial libm
# could disagree about snapping. Counted, never silently ignored.
_ANNULUS_LO = 0.5
_ANNULUS_HI = 4.0


def _snap(z, label):
    z = np.asarray(z, dtype=np.float64)
    n = np.rint(z)
    eps = EPS_REL * np.maximum(1.0, np.abs(z))
    d = np.abs(z - n)
    out = np.where(d <= eps, n, np.floor(z))
    if label is not None:
        amb = int(np.count_nonzero((d > _ANNULUS_LO * eps) & (d <= _ANNULUS_HI * eps)))
        if amb:
            report_cap("quant_ambiguous_" + label, amb)
    return out.astype(np.int64)


def qround(y, label=None):
    """Boundary-safe round-half-up of ``y`` (already scaled) to int64.

    Equals ``floor(y + 0.5)`` everywhere except within EPS_REL of a
    boundary, where it snaps to the boundary integer (both sides of it).
    ``label`` enables the ambiguity counter (fire-and-forget via
    report_cap; give every production site a distinct label)."""
    return _snap(np.asarray(y, dtype=np.float64) + 0.5, label)


def qfloor(y, label=None):
    """Boundary-safe floor (binning): floor(y), except values within
    EPS_REL of an integer snap UP to it (boundary row goes to the upper
    bin on both sides)."""
    return _snap(y, label)


def qround6(x, label=None):
    """round(x, 6) with the same nudge — float64 output, bit-identical
    across environments: int64 micro-units divided by 1e6 (int→double
    conversion is exact below 2^53; the division is correctly rounded)."""
    return qround(np.asarray(x, dtype=np.float64) * 1e6, label) / 1e6


def sql_qround(expr):
    """DuckDB expression: boundary-safe round-half-up of ``expr`` → BIGINT.

    Mirrors :func:`qround` exactly. DuckDB round() is half-away-from-zero
    vs numpy rint's half-to-even, but inside the snap band the nearest
    integer is unique (band half-width < 0.5), so they agree."""
    z = "((%s) + 0.5)" % expr
    return (
        "CASE WHEN abs(%s - round(%s)) <= 1e-12 * greatest(1.0, abs(%s)) "
        "THEN CAST(round(%s) AS BIGINT) "
        "ELSE CAST(floor(%s) AS BIGINT) END" % (z, z, z, z, z)
    )


def sql_qfloor(expr):
    """DuckDB expression mirroring :func:`qfloor` (binning form)."""
    z = "(%s)" % expr
    return (
        "CASE WHEN abs(%s - round(%s)) <= 1e-12 * greatest(1.0, abs(%s)) "
        "THEN CAST(round(%s) AS BIGINT) "
        "ELSE CAST(floor(%s) AS BIGINT) END" % (z, z, z, z, z)
    )


def sql_qround6(expr):
    """DuckDB expression mirroring :func:`qround6` (float64 output)."""
    return "(%s / 1e6)" % sql_qround("(%s) * 1e6" % expr)
