"""Text-analysis map_batches stages over the documents table
(doc_id, text, …): quality stats, fingerprint, language-ID, token stats.
All stateless vectorized transforms; the compiled regexes live at module
import (once per worker process)."""

import hashlib
import re

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions.text import (
    alnum_tokens_batch,
    bpe_token_count,
    fingerprint,
    lang_id,
    quality_stats,
    repetition_stats_batch,
    token_count,
    winnow_fingerprints_batch,
)


def doc_stats(t: pa.Table) -> pa.Table:
    """→ doc_id, n_tokens, n_chars_calc, punct_ratio, mean_token_len
    (column names match the DuckDB oracle)."""
    texts = t.column("text").to_pylist()
    toks, chars, pr, mtl = quality_stats(texts)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(toks),
            "n_chars_calc": pa.array(chars),
            "punct_ratio": pa.array(pr),
            "mean_token_len": pa.array(mtl),
        }
    )


def token_budget(t: pa.Table) -> pa.Table:
    """→ doc_id, n_ws_tokens, n_bpe_tokens: both token notions a
    training-data pipeline budgets with, side by side (column names match
    the DuckDB oracle)."""
    texts = t.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_ws_tokens": pa.array(token_count(texts)),
            "n_bpe_tokens": pa.array(bpe_token_count(texts)),
        }
    )


def winnow_fp(t: pa.Table) -> pa.Table:
    """→ (doc_id, fp) rows: winnowing rolling-hash fingerprints (distinct
    trailing-window minima of k-byte gram hashes — see
    functions/text.py winnow_fingerprints_batch; column names match the
    DuckDB oracle)."""
    texts = t.column("text").to_pylist()
    idx, fps = winnow_fingerprints_batch(texts)
    return pa.table(
        {
            "doc_id": t.column("doc_id").take(pa.array(idx)),
            "fp": pa.array(fps, type=pa.uint64()),
        }
    )


def doc_fingerprint(t: pa.Table) -> pa.Table:
    """→ doc_id, fp (md5 of normalized text; oracle: md5(lower(...)))."""
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "fp": pa.array(fingerprint(t.column("text").to_pylist()), type=pa.string()),
        }
    )


def doc_lang(t: pa.Table) -> pa.Table:
    """→ doc_id, lang_pred (heuristic; rows-only correctness)."""
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "lang_pred": pa.array(lang_id(t.column("text").to_pylist()), type=pa.string()),
        }
    )


def repetition_quality(t: pa.Table) -> pa.Table:
    """→ doc_id, n_words, n_uniq, top_bigram_count, n_bigrams,
    high_repetition — Gopher-style within-document repetition filters
    (Rae et al. 2021 §A1.1): word-repetition ratio and most-frequent-
    bigram share. All counts are INTEGER and the filter decision uses an
    integer cross-product (10*n_uniq < 7*n_words ⇔ unique fraction
    < 0.7), so the DuckDB oracle is exact with no float rounding."""
    nw, nu, tb, nb = repetition_stats_batch(t.column("text").to_pylist())
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_words": pa.array(nw),
            "n_uniq": pa.array(nu),
            "top_bigram_count": pa.array(tb),
            "n_bigrams": pa.array(nb),
            "high_repetition": pa.array(10 * nu < 7 * nw),
        }
    )


def vocab_partial(t: pa.Table) -> pa.Table:
    """Per-batch combiner for the corpus vocabulary: → (term, df, tf)
    PARTIALS (df = docs-in-batch containing the term, tf = total
    occurrences in batch). The wide ``groupby('term').sum`` downstream
    then moves only |vocab| rows per batch instead of every token — the
    pre-aggregate-inside-map_batches pattern that keeps the all-to-all
    exchange tiny at corpus scale."""
    flat, ntoks = alnum_tokens_batch(t.column("text").to_pylist())
    if not flat:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int64()),
            }
        )
    doc_of = np.repeat(np.arange(len(ntoks)), ntoks)
    pairs = pa.table(
        {"term": pa.array(flat, type=pa.string()), "doc": pa.array(doc_of)}
    )
    tf = pairs.group_by("term").aggregate([("doc", "count")])
    df = (
        pairs.group_by(["term", "doc"])
        .aggregate([])
        .group_by("term")
        .aggregate([("doc", "count")])
    )
    # select the aggregate output by its GENERATED NAME ("doc_count"),
    # never positionally: key-vs-aggregate column order in pyarrow
    # group_by().aggregate() output is an implementation detail that has
    # differed across versions — a positional rename would silently swap
    # term/tf instead of erroring.
    tf = pa.table({"term": tf.column("term"), "tf": tf.column("doc_count")})
    df = pa.table({"term": df.column("term"), "df": df.column("doc_count")})
    joined = tf.join(df, "term")
    return joined.select(["term", "df", "tf"])


def quality_score(t: pa.Table) -> pa.Table:
    """Composite quality score in [0,1]: length band + punctuation sanity +
    token-length sanity. Linear so the oracle SQL reproduces it exactly."""
    texts = t.column("text").to_pylist()
    toks, chars, pr, mtl = quality_stats(texts)
    len_ok = ((toks >= 5) & (toks <= 100000)).astype(np.float64)
    punct_ok = (pr <= 0.2).astype(np.float64)
    tl_ok = ((mtl >= 2.0) & (mtl <= 15.0)).astype(np.float64)
    score = 0.4 * len_ok + 0.3 * punct_ok + 0.3 * tl_ok
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "quality": pa.array(score),
        }
    )


# PII patterns, RE2-restricted (no lookaround, no backrefs, explicit
# classes) so DuckDB's regexp_extract_all / regexp_replace count and
# redact the IDENTICAL spans. Both engines are leftmost-first,
# non-overlapping, greedy.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
_PII_EMAIL_RE = re.compile(PII_EMAIL_PATTERN)
_PII_PHONE_RE = re.compile(PII_PHONE_PATTERN)


def pii_augment(doc_id: int, text: str) -> str:
    """Deterministic PII-bearing augmentation of a corpus text (the
    synthetic corpus carries no organic PII, so BOTH the engine and the
    oracle append the same synthetic email + phone derived from doc_id
    before scrubbing — the redaction path is exercised on every row)."""
    return "%s contact user%d@mail.example.com or call +1-555-%04d now" % (
        text or "",
        doc_id,
        (doc_id * 7919) % 10000,
    )


def pii_redact(t: pa.Table) -> pa.Table:
    """→ doc_id, n_emails, n_phones, red_md5 — PII scrub stage: count
    email/phone spans, replace them with <EMAIL>/<PHONE> placeholders,
    and fingerprint the redacted text (md5) so the oracle verifies the
    REDACTED BYTES, not just the counts. Stateless map; regexes compile
    once per worker process at module import."""
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    n_em = np.empty(len(ids), dtype=np.int64)
    n_ph = np.empty(len(ids), dtype=np.int64)
    digests = []
    for i, (d, x) in enumerate(zip(ids, texts)):
        aug = pii_augment(d, x)
        n_em[i] = len(_PII_EMAIL_RE.findall(aug))
        red = _PII_EMAIL_RE.sub("<EMAIL>", aug)
        n_ph[i] = len(_PII_PHONE_RE.findall(aug))
        red = _PII_PHONE_RE.sub("<PHONE>", red)
        digests.append(hashlib.md5(red.encode("utf-8")).hexdigest())
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_emails": pa.array(n_em),
            "n_phones": pa.array(n_ph),
            "red_md5": pa.array(digests, type=pa.string()),
        }
    )


def hash_sample(t: pa.Table, rate_denom: int = 10) -> pa.Table:
    """Deterministic hash-bernoulli sample: keep rows where
    le64(md5(doc_id)) % rate_denom == 0 — the reproducible replacement
    for random sampling in a training-data pipeline (the same row is
    kept in every run on every cluster size; no RNG state to ship).
    Stateless filter; the md5-per-short-key cost class is the accepted
    fingerprint tier."""
    keep = [
        int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "little")
        % rate_denom
        == 0
        for d in t.column("doc_id").to_pylist()
    ]
    return t.filter(pa.array(keep))
