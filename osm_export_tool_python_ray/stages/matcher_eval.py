"""Vectorized Matcher evaluation over Arrow ``map<string,string>`` tags.

The hot-path counterpart of ``sql._match`` (reference sql.py:74-98): a batch
of N rows is matched against a prefix expression in O(referenced_keys)
column extractions + NumPy boolean algebra, preserving every reference
quirk — type-strict ``=``/``in`` (trivially satisfied since map values are
strings), lexicographic ordering compares, notnull = key presence.
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.sql import expr_columns

# closed-way polygon heuristic constants (reference tabular.py:18-19)
CLOSED_WAY_KEYS = [
    "aeroway", "amenity", "boundary", "building", "building:part", "craft",
    "geological", "historic", "landuse", "leisure", "military", "natural",
    "office", "place", "shop", "sport", "tourism",
]
CLOSED_WAY_KEYVALS = {"highway": "platform", "public_transport": "platform"}


def extract_tag_columns(tags, keys):
    """Map column → {key: (present bool ndarray, values object ndarray)}.

    Arrow-native: key matching runs as ``pc.equal`` / ``pc.is_in`` C
    kernels over the flattened key StringArray; only the MATCHED values
    (≈ one per row per present key) are materialized as Python strings.
    The previous version converted every key AND value in the batch to
    Python objects and compared with object-dtype numpy equality — a
    hidden per-tag-entry Python loop that dominated the feature stages'
    profile (~20 keys × millions of entries per batch)."""
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    n = len(tags)
    out = {}
    if n == 0 or not keys:
        return {k: (np.zeros(n, dtype=bool), np.empty(n, dtype=object)) for k in keys}

    import pyarrow.compute as pc

    offsets = tags.offsets.to_numpy(zero_copy_only=False)
    # MapArray.keys/.items are the UNSLICED flattened child arrays while
    # .offsets are absolute — on a sliced map column the flat positions
    # must be interpreted against offsets[0]..offsets[-1] (latent round-1
    # bug: misaligned rows / IndexError on sliced inputs)
    keys_arr = tags.keys
    vals_arr = tags.items
    base = int(offsets[0])
    end = int(offsets[-1])
    counts = np.diff(offsets)
    row_of_item = np.repeat(np.arange(n), counts)  # for positions base..end

    null_rows = None
    if tags.null_count:
        null_rows = np.asarray(tags.is_null().to_numpy(zero_copy_only=False))

    # one pass: which referenced key (if any) each flat entry matches
    key_list = list(keys)
    kidx = pc.fill_null(
        pc.index_in(keys_arr, value_set=pa.array(key_list, type=pa.string())),
        -1,
    ).to_numpy(zero_copy_only=False)
    hit_pos = np.nonzero(kidx >= 0)[0]
    hit_pos = hit_pos[(hit_pos >= base) & (hit_pos < end)]
    hit_kidx = kidx[hit_pos]

    for j, key in enumerate(key_list):
        present = np.zeros(n, dtype=bool)
        vals = np.empty(n, dtype=object)
        sel = hit_pos[hit_kidx == j]
        if len(sel):
            rows = row_of_item[sel - base]
            present[rows] = True
            vals[rows] = vals_arr.take(pa.array(sel)).to_pylist()
        if null_rows is not None:
            present[null_rows] = False
        out[key] = (present, vals)
    return out


def tag_count(tags):
    """Per-row number of tags (the untagged-element skip,
    reference tabular.py:264,280)."""
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    if len(tags) == 0:
        return np.zeros(0, dtype=np.int64)
    # no list_value_length kernel for map<> in pyarrow 16: use raw offsets
    counts = np.diff(tags.offsets.to_numpy(zero_copy_only=False))
    if tags.null_count:
        counts = counts.copy()
        counts[np.asarray(tags.is_null().to_numpy(zero_copy_only=False))] = 0
    return counts


def eval_expr(expr, cols, n):
    """Prefix tuple tree → boolean mask over n rows, given extracted
    columns. Matches ``sql._match`` row-for-row."""
    if not expr:
        return np.zeros(n, dtype=bool)
    op = expr[0]
    if op == "or":
        return eval_expr(expr[1], cols, n) | eval_expr(expr[2], cols, n)
    if op == "and":
        return eval_expr(expr[1], cols, n) & eval_expr(expr[2], cols, n)
    present, vals = cols[expr[1]]
    if op == "notnull":
        return present.copy()
    if op == "=":
        return present & (vals == expr[2])
    if op == "!=":
        return ~present | (vals != expr[2])
    if op == "in":
        return present & np.isin(vals, list(expr[2]))
    # lexicographic ordering (reference sql.py:91-97): compare str() forms
    rv = str(expr[2])
    out = np.zeros(n, dtype=bool)
    idx = np.nonzero(present)[0]
    sv = vals[idx]
    if op == ">":
        out[idx] = np.array([str(v) > rv for v in sv], dtype=bool)
    elif op == "<":
        out[idx] = np.array([str(v) < rv for v in sv], dtype=bool)
    elif op == ">=":
        out[idx] = np.array([str(v) >= rv for v in sv], dtype=bool)
    elif op == "<=":
        out[idx] = np.array([str(v) <= rv for v in sv], dtype=bool)
    else:
        raise Exception("unknown operator: %r" % (op,))
    return out


class CompiledThemes:
    """Per-worker compiled matcher bundle: referenced keys unioned so tags
    are extracted once per batch, every theme evaluated on the shared
    columns (reference evaluates Theme.matches per element per theme,
    tabular.py:267; here it is per batch per theme)."""

    def __init__(self, themes):
        self.themes = themes
        keys = set()
        for t in themes:
            keys.update(expr_columns(t.matcher.expr))
        self.keys = sorted(keys)

    def masks(self, tags, geom_type):
        """→ list of (theme, bool mask) for one geometry class."""
        n = len(tags)
        cols = extract_tag_columns(tags, self.keys)
        out = []
        for t in self.themes:
            if not t.geom_type_mask().__contains__(geom_type):
                continue
            out.append((t, eval_expr(t.matcher.expr, cols, n)))
        return out

    def union_mask(self, tags, geom_type):
        n = len(tags)
        acc = np.zeros(n, dtype=bool)
        for _t, m in self.masks(tags, geom_type):
            acc |= m
        return acc

    def bitmask(self, tags, geom_type):
        """→ uint64 per row: bit i set iff ``self.themes[i]`` (matcher AND
        geom-class) matches. Evaluated ONCE in the feature builders and
        carried on the ``theme_bits`` column so the ThemeRouter never
        re-runs the matchers (round-2 finding: double matcher
        evaluation). Bit index = theme position in the mapping — stable
        between builder and router since both compile the same mapping."""
        assert len(self.themes) <= 64, "theme bitmask limited to 64 themes"
        n = len(tags)
        acc = np.zeros(n, dtype=np.uint64)
        cols = extract_tag_columns(tags, self.keys)
        for i, t in enumerate(self.themes):
            if not t.geom_type_mask().__contains__(geom_type):
                continue
            m = eval_expr(t.matcher.expr, cols, n)
            acc |= m.astype(np.uint64) << np.uint64(i)
        return acc


def closed_way_is_polygon_mask(tags):
    """Vectorized ``closed_way_is_polygon`` (reference tabular.py:20-27)."""
    cols = extract_tag_columns(tags, CLOSED_WAY_KEYS + list(CLOSED_WAY_KEYVALS))
    n = len(tags)
    mask = np.zeros(n, dtype=bool)
    for k in CLOSED_WAY_KEYS:
        mask |= cols[k][0]
    for k, v in CLOSED_WAY_KEYVALS.items():
        present, vals = cols[k]
        mask |= present & (vals == v)
    return mask
