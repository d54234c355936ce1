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

_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[.!?,;:]")
_WS_RE = re.compile(r"\s+")
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
        norm = _WS_RE.sub(" ", (t or "").strip().lower())
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
    """Set of k-char shingle hashes of normalized text (uint64)."""
    norm = _WS_RE.sub(" ", (text or "").strip().lower())
    if len(norm) < k:
        return {hash_bytes(norm.encode())} if norm else set()
    return {hash_bytes(norm[i : i + k].encode()) for i in range(len(norm) - k + 1)}


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


def hamming64(a, b):
    return bin(int(a) ^ int(b)).count("1")
