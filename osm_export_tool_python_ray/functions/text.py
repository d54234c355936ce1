"""Text-analysis kernels for the training-data pipelines: token counting,
quality scoring, fingerprinting, language-ID, shingles, MinHash, SimHash.

All kernels are batch-vectorized (numpy / per-row C-level string ops) and
deterministic; the SQL-expressible ones (token count, punct ratio, md5
fingerprint) are defined so a DuckDB oracle can reproduce them exactly:

* token count      = number of ``\\S+`` runs        ↔ len(regexp_extract_all(text,'\\S+'))
* punct ratio      = count of [.!?,;:] / length    ↔ regexp_replace arithmetic
* fingerprint      = md5(lower(text) with whitespace collapsed to ' ')
"""

import hashlib
import re

import numpy as np

# Whitespace/token classes are EXPLICIT, not \s/\S: the DuckDB oracles run
# RE2, whose \s is exactly [\t\n\f\r ] — Python's \s additionally matches
# \x0b (even under re.ASCII) and, without the flag, Unicode spaces like
# NBSP. Writing the RE2 class out verbatim on both sides makes every
# text oracle exact on ALL inputs, not just the ASCII corpus. Likewise
# .strip(" ") below mirrors DuckDB trim() (spaces only).
_TOKEN_RE = re.compile(r"[^\t\n\f\r ]+")  # == RE2 \S+
_PUNCT_RE = re.compile(r"[.!?,;:]")
_WS_RE = re.compile(r"[\t\n\f\r ]+")  # == RE2 \s+
# GPT-2-style pre-tokenizer, restricted to an RE2-compatible subset (no
# lookahead, explicit ASCII classes) so DuckDB's regexp_extract_all
# reproduces it exactly (SQL_TOKEN_BUDGET interpolates THIS constant).
# Alternation order matters (leftmost-FIRST in both engines): contraction
# suffixes, then space-glued letter runs, digit runs, other-symbol runs,
# whitespace runs.
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^A-Za-z0-9\t\n\f\r ']+|[\t\n\f\r ]+"
)
_BPE_TOKEN_RE = re.compile(BPE_TOKEN_PATTERN)
_WORD_RE = re.compile(r"[a-zA-Z]+")

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "del", "para"},
}


def token_count(texts):
    """Whitespace-token count per text (vectorized loop, C regex)."""
    return np.array([len(_TOKEN_RE.findall(t or "")) for t in texts], dtype=np.int64)


def bpe_token_count(texts):
    """BPE-ish pre-tokenizer segment count per text (the second token
    notion a training pipeline budgets with, alongside whitespace tokens).
    Counts segments of ``BPE_TOKEN_PATTERN`` — a LOWER BOUND on the real
    BPE token count of a GPT-2-family tokenizer (each segment splits into
    ≥1 BPE tokens), deterministic, and ~4 chars/segment on English text."""
    return np.array(
        [len(_BPE_TOKEN_RE.findall(t or "")) for t in texts], dtype=np.int64
    )


def punct_count(texts):
    return np.array([len(_PUNCT_RE.findall(t or "")) for t in texts], dtype=np.int64)


def quality_stats(texts):
    """→ (n_tokens, n_chars, punct_ratio, mean_token_len). All
    SQL-reproducible (see module docstring)."""
    n = len(texts)
    toks = np.empty(n, dtype=np.int64)
    chars = np.empty(n, dtype=np.int64)
    punct = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        toks[i] = len(_TOKEN_RE.findall(t))
        chars[i] = len(t)
        punct[i] = len(_PUNCT_RE.findall(t))
    with np.errstate(divide="ignore", invalid="ignore"):
        pr = np.where(chars > 0, punct / np.maximum(chars, 1), 0.0)
        mtl = np.where(toks > 0, (chars - (toks - 1).clip(0)) / np.maximum(toks, 1), 0.0)
    return toks, chars, pr, mtl


def fingerprint(texts):
    """md5 of lowercase, whitespace-collapsed text (DuckDB:
    md5(lower(regexp_replace(trim(text),'\\s+',' ','g'))))."""
    out = []
    for t in texts:
        norm = _WS_RE.sub(" ", (t or "").strip(" ").lower())
        out.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
    return out


def lang_id(texts):
    """Stopword/char n-gram heuristic language ID → ISO code or 'und'.
    Not SQL-expressible (rows-only correctness check); accuracy asserted on
    pytest fixtures."""
    out = []
    for t in texts:
        words = set(w.lower() for w in _WORD_RE.findall(t or ""))
        if not words:
            out.append("und")
            continue
        best, best_n = "und", 0
        for lang, sw in STOPWORDS.items():
            hits = len(words & sw)
            if hits > best_n:
                best, best_n = lang, hits
        if best_n == 0:
            # fallback: non-ascii heuristic
            if any(ord(c) > 0x2E80 for c in t or ""):
                best = "zh"
            else:
                best = "en" if words else "und"
        out.append(best)
    return out


def char_shingles(text, k=5):
    """Set of k-BYTE shingle hashes of normalized UTF-8 text (uint64).

    Hash family (k ≤ 8): the k window bytes packed little-endian into a
    uint64, XOR the byte-length in the top byte — INJECTIVE (a perfect
    hash of the window, strictly better than md5 truncation) and exactly
    reproducible in SQL via hex(encode(...)) byte parsing, which is what
    makes the DuckDB oracle able to re-derive it. Shingling is over UTF-8
    BYTES (not code points) so the vectorized batch kernel
    (``shingle_windows_batch``) and this per-doc reference implementation
    agree byte-for-byte. Docs shorter than k bytes hash as one window of
    all their bytes (the length term disambiguates them from true k-byte
    windows)."""
    assert k <= 8
    norm = _WS_RE.sub(" ", (text or "").strip(" ").lower()).encode("utf-8")
    if not norm:
        return set()
    if len(norm) < k:
        return {_pack_window(norm)}
    return {_pack_window(norm[i : i + k]) for i in range(len(norm) - k + 1)}


def _pack_window(b):
    """≤8 window bytes → uint64: little-endian pack XOR (len << 56)."""
    return int.from_bytes(b.ljust(8, b"\0"), "little") ^ (len(b) << 56)


def shingle_windows_batch(texts, k=5):
    """Batch-vectorized byte-shingle hashes for a list of texts.

    Returns ``(x, offsets)``: ``x`` is a uint64 array of window hashes for
    every doc concatenated (MULTISET — no per-doc dedup, which is free for
    MinHash since min(multiset) == min(set)), ``offsets`` a (n+1,) int64
    array delimiting each doc's windows. Zero per-window Python: the
    normalized corpus bytes become one buffer, windows are gathered with a
    single fancy-index into an (W, k) matrix, padded to 8 columns and
    viewed as uint64. Docs with empty normalized text get zero windows."""
    assert k <= 8
    n = len(texts)
    norms = [_WS_RE.sub(" ", (t or "").strip(" ").lower()).encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in norms), dtype=np.int64, count=n)
    # windows per doc: len-k+1 for len>=k, 1 for 0<len<k, 0 for empty
    counts = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(offsets[-1])
    if total == 0:
        return np.array([], dtype=np.uint64), offsets
    buf = np.frombuffer(b"".join(norms), dtype=np.uint8)
    doc_starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    # grouped arange: window start positions in the concatenated buffer
    rep_doc = np.repeat(np.arange(n), counts)
    within = np.arange(total) - np.repeat(offsets[:-1], counts)
    starts = doc_starts[rep_doc] + within
    wlen = np.minimum(lens, k)[rep_doc]  # k, or the whole short doc
    mat = np.zeros((total, 8), dtype=np.uint8)
    full = wlen == k  # full k-byte windows never run past their doc
    if full.all():
        fs = starts
        for j in range(k):
            mat[:, j] = buf[fs + j]
    else:
        fi = np.nonzero(full)[0]
        fs = starts[full]
        for j in range(k):
            mat[fi, j] = buf[fs + j]
        for i in np.nonzero(~full)[0]:  # short docs: rare, tiny
            w = buf[starts[i] : starts[i] + wlen[i]]
            mat[i, : len(w)] = w
    x = mat.view(np.uint64).ravel()
    with np.errstate(over="ignore"):
        x = x ^ (wlen.astype(np.uint64) << np.uint64(56))
    return x, offsets


_MIX_M1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX_M2 = np.uint64(0xC4CEB9FE1A85EC53)
_S33 = np.uint64(33)


def _mix64_inplace(v, tmp):
    """splitmix64 avalanche computed IN PLACE (v mutated, tmp scratch) —
    zero fresh allocations so the chunked minhash loop stays cache-hot."""
    np.right_shift(v, _S33, out=tmp)
    np.bitwise_xor(v, tmp, out=v)
    np.multiply(v, _MIX_M1, out=v)
    np.right_shift(v, _S33, out=tmp)
    np.bitwise_xor(v, tmp, out=v)
    np.multiply(v, _MIX_M2, out=v)
    np.right_shift(v, _S33, out=tmp)
    np.bitwise_xor(v, tmp, out=v)
    return v


def minhash_signatures_batch(texts, seeds, k=5, chunk_windows=1 << 18):
    """(n, num_perm) uint64 MinHash signature matrix for a text batch —
    fully vectorized: one shingle pass (``shingle_windows_batch``), then
    per permutation one in-place mix64 + segment-min
    (``np.minimum.reduceat``) per doc. Replaces the per-doc
    shingle-set + per-shingle-md5 loop (~1 md5 per corpus character).

    Windows are processed in ~``chunk_windows``-sized doc-aligned chunks
    with two reused scratch buffers, so the 64-permutation loop runs over
    L2/L3-resident data instead of streaming num_perm × windows × ~11
    passes through DRAM (measured ~2x on long batches)."""
    n = len(texts)
    x, offsets = shingle_windows_batch(texts, k)
    num_perm = len(seeds)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if not len(x):
        return out
    counts = np.diff(offsets)
    v = np.empty(min(len(x), int(chunk_windows) * 2), dtype=np.uint64)
    tmp = np.empty_like(v)
    d0 = 0
    with np.errstate(over="ignore"):
        while d0 < n:
            # grow the doc range until ~chunk_windows windows (≥1 doc)
            d1 = d0 + 1
            while d1 < n and offsets[d1 + 1] - offsets[d0] <= chunk_windows:
                d1 += 1
            w0, w1 = int(offsets[d0]), int(offsets[d1])
            if w1 > w0:
                xs = x[w0:w1]
                m = w1 - w0
                if m > len(v):
                    v = np.empty(m, dtype=np.uint64)
                    tmp = np.empty_like(v)
                sub = counts[d0:d1]
                docs = np.nonzero(sub > 0)[0]
                red_at = (offsets[d0:d1][docs] - w0).astype(np.int64)
                vv, tt = v[:m], tmp[:m]
                for p in range(num_perm):
                    np.bitwise_xor(xs, seeds[p], out=vv)
                    _mix64_inplace(vv, tt)
                    out[d0 + docs, p] = np.minimum.reduceat(vv, red_at)
            d0 = d1
    return out


def winnow_fingerprints_batch(texts, k=8, w=4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS):
    the rolling-hash fingerprint family — k-byte gram hashes in position
    order, then the DISTINCT minima of every trailing window of ``w``
    consecutive hashes. Guarantees every match of length ≥ k+w-1 shares a
    fingerprint while keeping ~2/(w+1) density.

    Spec (shared verbatim with the DuckDB oracle): gram hash =
    mix64(le64-pack(bytes) XOR len<<56) (the injective window pack of
    ``shingle_windows_batch`` through the ``_mix64`` avalanche, unseeded);
    a doc with 0 < c < w gram hashes yields one fingerprint = min of all
    (its last trailing window covers the whole doc); window-min selection
    is "positions p with p ≥ w-1 OR p = c-1", deduplicated per doc.

    Returns ``(doc_idx, fp)``: int64 row indices into ``texts`` and the
    uint64 fingerprints, one row per distinct (doc, fingerprint).
    Vectorized: one global sliding-window min over the concatenated hash
    array + a grouped arange to index per-doc trailing windows."""
    x, offsets = shingle_windows_batch(texts, k)
    counts = np.diff(offsets)
    n = len(counts)
    if not len(x):
        return np.array([], dtype=np.int64), np.array([], dtype=np.uint64)
    tmp = np.empty_like(x)
    with np.errstate(over="ignore"):
        _mix64_inplace(x, tmp)

    # full windows: leading-window mins over the concatenated array, then
    # per-doc gather of starts offsets[d] .. offsets[d]+c-w (windows that
    # stay inside the doc = exactly the trailing windows at p >= w-1)
    sel = np.maximum(counts - (w - 1), 0)
    if sel.sum():
        lead = np.min(
            np.lib.stride_tricks.sliding_window_view(x, w), axis=1
        )
        rep = np.repeat(np.arange(n), sel)
        within = np.arange(int(sel.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(sel)])[:-1], sel
        )
        docs = rep
        fps = lead[offsets[:-1][rep] + within]
    else:
        docs = np.array([], dtype=np.int64)
        fps = np.array([], dtype=np.uint64)

    short = np.nonzero((counts > 0) & (counts < w))[0]
    if len(short):
        smins = np.array(
            [x[offsets[d] : offsets[d + 1]].min() for d in short], dtype=np.uint64
        )
        docs = np.concatenate([docs, short])
        fps = np.concatenate([fps, smins])

    # distinct per doc
    order = np.lexsort((fps, docs))
    docs, fps = docs[order], fps[order]
    keep = np.concatenate(
        [[True], (docs[1:] != docs[:-1]) | (fps[1:] != fps[:-1])]
    )
    return docs[keep].astype(np.int64), fps[keep]


def word_ngrams(text, n=3):
    toks = [w.lower() for w in _TOKEN_RE.findall(text or "")]
    if len(toks) < n:
        return {hash_bytes(" ".join(toks).encode())} if toks else set()
    return {hash_bytes(" ".join(toks[i : i + n]).encode()) for i in range(len(toks) - n + 1)}


def hash_bytes(b):
    """Stable 64-bit hash (first 8 bytes of md5) — deterministic across
    processes (unlike Python's salted hash())."""
    return int.from_bytes(hashlib.md5(b).digest()[:8], "little")


_POLY_P1 = np.uint64(0x9E3779B97F4A7C15)
_POLY_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_LONG_CUTOFF = 64  # above this, per-row md5 is throughput-bound and fine


def _fold_lanes(lanes, lengths, mult, salt):
    """Iterated multiply-xor-avalanche fold of (n, K) uint64 lanes →
    one uint64 per row; the row length seeds the accumulator so
    zero-padding cannot collide with genuine trailing NULs."""
    with np.errstate(over="ignore"):
        acc = _mix64(lengths.astype(np.uint64) * mult ^ salt)
        for j in range(lanes.shape[1]):
            acc = _mix64(acc * mult ^ lanes[:, j])
    return acc


def hash_strings_128(arr):
    """Two independent 64-bit vectorized hashes (h1, h2) of an Arrow string
    array — the 128-bit exact-dedup group key (collision-safe at the
    10^12-doc design point, unlike a single 64-bit key). Nulls hash as ''.

    Short strings (≤64 B) are hashed with NO per-row Python: rows are
    bucketed into power-of-two length classes, gathered into a zero-padded
    (n, W) uint8 matrix straight from the Arrow data buffer, viewed as
    uint64 lanes and folded column-wise (scratch ≤ ~6× class bytes — the
    naive per-byte uint64 scan was page-fault-bound at 8× total bytes).
    The long tail (>64 B) uses one md5 call per row, where the call
    overhead is amortized by the payload."""
    import hashlib

    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("")
    if pa.types.is_large_string(arr.type):
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + len(arr) + 1
        ]
    else:
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, ends = offsets[:-1], offsets[1:]
    lengths = ends - starts
    n = len(starts)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)

    long_idx = np.nonzero(lengths > _LONG_CUTOFF)[0]
    for i in long_idx:
        d = hashlib.md5(data[starts[i] : ends[i]].tobytes()).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")

    short_mask = lengths <= _LONG_CUTOFF
    m = len(data)
    W = 8
    while W <= _LONG_CUTOFF:
        lo = -1 if W == 8 else W // 2  # W=8 class includes empty strings
        sel = np.nonzero(short_mask & (lengths > lo) & (lengths <= W))[0]
        if len(sel):
            k = len(sel)
            if m == 0:
                mat = np.zeros((k, W), dtype=np.uint8)
            else:
                pos = (starts[sel][:, None] + np.arange(W, dtype=np.int64)[None, :])
                valid = np.arange(W)[None, :] < lengths[sel][:, None]
                mat = np.where(valid, data[np.minimum(pos, m - 1)], 0).astype(np.uint8)
            lanes = mat.view(np.uint64).reshape(k, W // 8)
            ln = lengths[sel]
            h1[sel] = _fold_lanes(lanes, ln, _POLY_P1, np.uint64(0xA24BAED4963EE407))
            h2[sel] = _fold_lanes(lanes, ln, _POLY_P2, np.uint64(0x9FB21C651E98DF25))
        W *= 2
    return h1, h2


def hash_rows_u64(mat, salt=np.uint64(0)):
    """Fold an (n, k) uint64 matrix row-wise into one avalanche-mixed uint64
    per row — vectorized band-key hashing (replaces per-row md5)."""
    mat = np.ascontiguousarray(mat, dtype=np.uint64)
    n = mat.shape[0]
    acc = np.full(n, np.uint64(0x51_7C_C1B7_2722_0A95) ^ salt, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            acc = _mix64(acc * _POLY_P1 ^ mat[:, j])
    return acc


def popcount64(x):
    """Vectorized 64-bit popcount (np.unpackbits over the byte view)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if not len(x):
        return np.array([], dtype=np.int64)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1).astype(np.int64)


def minhash_params(num_perm=64, seed=42):
    """Per-permutation uint64 seeds for the mix family below."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63 - 1, size=num_perm, dtype=np.int64).astype(np.uint64)


def _mix64(v):
    """splitmix64-style avalanche (wrapping uint64 arithmetic)."""
    v = v ^ (v >> np.uint64(33))
    v = v * np.uint64(0xFF51AFD7ED558CCD)
    v = v ^ (v >> np.uint64(33))
    v = v * np.uint64(0xC4CEB9FE1A85EC53)
    v = v ^ (v >> np.uint64(33))
    return v


def minhash_signature(shingle_hashes, seeds):
    """MinHash signature: per permutation i, min over shingles of
    mix64(x XOR seed_i) — a standard deterministic hash family, fully
    vectorized (num_perm × num_shingles uint64 matrix)."""
    if not shingle_hashes:
        return np.full(len(seeds), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingle_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return _mix64(x[None, :] ^ seeds[:, None]).min(axis=1)


def simhash(token_hashes, weights=None):
    """64-bit SimHash over token feature hashes."""
    if not len(token_hashes):
        return 0
    x = np.fromiter(token_hashes, dtype=np.uint64)
    bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (bits * 2 - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def word_ngram_hashes_batch(texts, n=3):
    """Per-doc DISTINCT word-n-gram keys, batch-vectorized.

    Gram key = order-sensitive mix64 fold of the per-token
    ``hash_strings_128`` h1 values over each n-token window (docs with
    fewer than n tokens fold all their tokens — mirroring
    ``word_ngrams``'s whole-doc gram). The key family differs from
    ``word_ngrams`` (md5 of the joined gram STRING) but is equally
    collision-resistant; the n-gram Jaccard oracle joins gram STRINGS,
    so any behavioral divergence would surface there. Returns
    ``(flat_keys, offsets)`` — keys deduplicated within each doc.

    Vectorization: one C-regex token pass per doc, ONE vectorized hash
    over the whole batch's token stream, a shifted-array fold for the
    windows, and a single lexsort for the per-doc dedup — no per-gram
    Python and no per-gram md5."""
    import pyarrow as pa

    toks_per_doc = [_TOKEN_RE.findall((t or "").lower()) for t in texts]
    ntoks = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=len(texts))
    flat_tokens = [w for ts in toks_per_doc for w in ts]
    if not flat_tokens:
        return np.array([], dtype=np.uint64), np.zeros(len(texts) + 1, dtype=np.int64)
    h1, _h2 = hash_strings_128(pa.array(flat_tokens, type=pa.string()))
    tok_off = np.concatenate([[0], np.cumsum(ntoks)])
    # windows per doc: T-n+1 if T>=n else (1 if T>0 else 0)
    counts = np.where(ntoks >= n, ntoks - n + 1, (ntoks > 0).astype(np.int64))
    g_off = np.concatenate([[0], np.cumsum(counts)])
    total = int(g_off[-1])
    doc_of = np.repeat(np.arange(len(texts)), counts)
    within = np.arange(total) - np.repeat(g_off[:-1], counts)
    starts = tok_off[:-1][doc_of] + within
    wlen = np.minimum(ntoks, n)[doc_of]
    with np.errstate(over="ignore"):
        acc = _mix64(np.full(total, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64))
        for j in range(n):
            live = j < wlen
            nxt = _mix64(acc * _POLY_P1 ^ h1[np.minimum(starts + j, len(h1) - 1)])
            acc = np.where(live, nxt, acc)
    # per-doc dedup: sort (doc, key), keep first occurrences
    order = np.lexsort((acc, doc_of))
    d_s, k_s = doc_of[order], acc[order]
    first = np.ones(total, dtype=bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
    d_u, k_u = d_s[first], k_s[first]
    u_counts = np.bincount(d_u, minlength=len(texts)).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(u_counts)])
    return k_u, offsets


def word_ngram_positions_batch(texts, n=5):
    """Per-OCCURRENCE word-n-gram keys with token positions — the
    positional sibling of ``word_ngram_hashes_batch`` (same key family,
    same short-doc whole-text gram) minus the per-doc dedup, for span-level
    duplicate detection where every occurrence and its location matter.

    Returns ``(keys, doc_of, pos, wlen)`` — all 1-D, one row per gram
    occurrence: ``doc_of`` the batch-local doc index, ``pos`` the 0-based
    token offset of the window start, ``wlen = min(ntoks, n)`` the window
    width in tokens (short docs fold the whole doc at pos 0). Same
    vectorization: one C-regex token pass, ONE batch-wide token hash, a
    shifted-array window fold — no per-gram Python."""
    import pyarrow as pa

    toks_per_doc = [_TOKEN_RE.findall((t or "").lower()) for t in texts]
    ntoks = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=len(texts))
    flat_tokens = [w for ts in toks_per_doc for w in ts]
    empty = np.array([], dtype=np.int64)
    if not flat_tokens:
        return np.array([], dtype=np.uint64), empty, empty, empty
    h1, _h2 = hash_strings_128(pa.array(flat_tokens, type=pa.string()))
    tok_off = np.concatenate([[0], np.cumsum(ntoks)])
    counts = np.where(ntoks >= n, ntoks - n + 1, (ntoks > 0).astype(np.int64))
    g_off = np.concatenate([[0], np.cumsum(counts)])
    total = int(g_off[-1])
    doc_of = np.repeat(np.arange(len(texts)), counts)
    pos = np.arange(total) - np.repeat(g_off[:-1], counts)
    starts = tok_off[:-1][doc_of] + pos
    wlen = np.minimum(ntoks, n)[doc_of]
    with np.errstate(over="ignore"):
        acc = _mix64(np.full(total, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64))
        for j in range(n):
            live = j < wlen
            nxt = _mix64(acc * _POLY_P1 ^ h1[np.minimum(starts + j, len(h1) - 1)])
            acc = np.where(live, nxt, acc)
    return acc, doc_of, pos, wlen


def simhash_batch(texts):
    """64-bit SimHash per text over DISTINCT lowered whitespace tokens —
    batch form of ``simhash(word_ngrams(x, 1))`` with the IDENTICAL hash
    family (md5-LE64 per token, so the SQL oracle is unchanged). The
    per-doc work is one C-regex token pass + a memoized md5 per distinct
    token; the bit-vote accumulation is one unpackbits + segment reduceat
    over the whole batch instead of a (tokens, 64) matrix per doc."""
    n = len(texts)
    counts = np.empty(n, dtype=np.int64)
    per_doc = []
    cache = {}
    for i, t in enumerate(texts):
        hs = {
            cache.get(w) or cache.setdefault(w, hash_bytes(w.encode("utf-8")))
            for w in (w.lower() for w in _TOKEN_RE.findall(t or ""))
        }
        counts[i] = len(hs)
        per_doc.append(hs)
    total = int(counts.sum())
    sigs = np.zeros(n, dtype=np.uint64)
    if not total:
        return sigs
    flat = np.fromiter((h for hs in per_doc for h in hs), dtype=np.uint64, count=total)
    bits = np.unpackbits(flat.view(np.uint8).reshape(total, 8), axis=1, bitorder="little")
    offsets = np.concatenate([[0], np.cumsum(counts)])
    nonempty = np.nonzero(counts > 0)[0]
    ssum = np.add.reduceat(bits.astype(np.int64), offsets[:-1][nonempty], axis=0)
    votes = 2 * ssum - counts[nonempty, None]
    sigs[nonempty] = ((votes > 0).astype(np.uint64) * (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]).sum(axis=1)
    return sigs


def hamming64(a, b):
    return bin(int(a) ^ int(b)).count("1")


# Word tokens for the repetition/vocabulary family: lowered [a-z0-9]+ runs
# — RE2-identical on both sides (the oracle runs
# regexp_extract_all(lower(text), '[a-z0-9]+')).
_ALNUM_RE = re.compile(r"[a-z0-9]+")


def alnum_tokens_batch(texts):
    """Per-doc lowered ``[a-z0-9]+`` word tokens: (flat_token_list,
    tokens_per_doc int64 array). One C-regex pass per doc; everything
    downstream of this is numpy over the flattened stream."""
    toks_per_doc = [_ALNUM_RE.findall((t or "").lower()) for t in texts]
    ntoks = np.fromiter(
        (len(t) for t in toks_per_doc), dtype=np.int64, count=len(texts)
    )
    return [w for ts in toks_per_doc for w in ts], ntoks


def repetition_stats_batch(texts):
    """Per-doc Gopher-style repetition stats over lowered [a-z0-9]+ word
    tokens: ``(n_words, n_uniq_words, top_bigram_count, n_bigrams)`` as
    int64 arrays (all INTEGER so the DuckDB oracle is exact with no float
    rounding hazard; downstream filters compare integer cross-products).

    Vectorized: one C-regex token pass per doc, ONE ``hash_strings_128``
    call over the whole batch's token stream, lexsort-based per-doc
    distinct count, and a shifted-array mix64 fold for bigram keys with a
    run-length max per doc. The oracle groups bigram STRINGS, so a u64
    key collision would surface as a count mismatch."""
    import pyarrow as pa

    n = len(texts)
    flat, ntoks = alnum_tokens_batch(texts)
    n_uniq = np.zeros(n, dtype=np.int64)
    top_bg = np.zeros(n, dtype=np.int64)
    n_bg = np.maximum(ntoks - 1, 0)
    if not flat:
        return ntoks, n_uniq, top_bg, n_bg
    h1, _h2 = hash_strings_128(pa.array(flat, type=pa.string()))
    doc_of = np.repeat(np.arange(n), ntoks)
    order = np.lexsort((h1, doc_of))
    d_s, k_s = doc_of[order], h1[order]
    first = np.ones(len(flat), dtype=bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
    n_uniq = np.bincount(d_s[first], minlength=n).astype(np.int64)
    # bigram keys: order-sensitive fold of consecutive token hashes
    tok_off = np.concatenate([[0], np.cumsum(ntoks)])
    g_off = np.concatenate([[0], np.cumsum(n_bg)])
    total = int(g_off[-1])
    if total:
        bdoc = np.repeat(np.arange(n), n_bg)
        within = np.arange(total) - np.repeat(g_off[:-1], n_bg)
        starts = tok_off[:-1][bdoc] + within
        with np.errstate(over="ignore"):
            acc = _mix64(np.full(total, _POLY_P1, dtype=np.uint64))
            acc = _mix64(acc * _POLY_P1 ^ h1[starts])
            acc = _mix64(acc * _POLY_P1 ^ h1[starts + 1])
        order = np.lexsort((acc, bdoc))
        d_s, k_s = bdoc[order], acc[order]
        brk = np.ones(total, dtype=bool)
        brk[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
        idx = np.flatnonzero(brk)
        runs = np.diff(np.append(idx, total))
        np.maximum.at(top_bg, d_s[idx], runs)
    return ntoks, n_uniq, top_bg, n_bg
