"""Text-analysis map_batches stages over the documents table
(doc_id, text, …): quality stats, fingerprint, language-ID, token stats.
All stateless vectorized transforms; the compiled regexes live at module
import (once per worker process)."""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions.text import (
    bpe_token_count,
    fingerprint,
    lang_id,
    quality_stats,
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
