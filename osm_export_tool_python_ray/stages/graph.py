"""Iterative graph scoring on Ray Data: TextRank (PageRank over the
word co-occurrence graph — Mihalcea & Tarau 2004) with INTEGER-EXACT
power iterations.

The missing workload class in the engine's catalog: an iterative
distributed algorithm where each round is a keyed join + a groupby
(score flows along edges). The shape per iteration is

    directed edges (src, dst, w, wdeg_src)  ⋈ scores on src   [1 exchange]
      → map-side contribution (d·s·w) // (D·wdeg)
      → groupby(dst) sum                                     [1 exchange]
      → left-join onto the node set, + teleport base

All arithmetic is int64 micro-units with floor division, so the result
is summation-order independent and a DuckDB oracle re-derives every
iteration exactly (chained CTEs — pipelines/queries.py
SQL_TEXTRANK_KEYWORDS). The graph is built once: top-V vocabulary by
the distributed sort+limit pattern, adjacent-token co-occurrence edges
pre-aggregated by a per-batch combiner before ONE groupby.

Scale shape: the corpus is scanned twice (vocab pass, edge pass —
both combiner-shaped); every iteration then touches only the edge
aggregate (≤V² rows), never the corpus. V bounds all state; the
driver holds only the V-row vocabulary (broadcast via ray.put).
Overflow bound: d_num·s·w must fit int64 — s totals ≈ V·s0, so
w ≤ 2^63 / (d_num · V · s0) ≈ 5·10⁸ co-occurrences per edge at the
defaults; raise to HUGEINT-style splitting before that at planet scale.
"""

import numpy as np
from osm_export_tool_python_ray.state.broadcast import cached_get
import pyarrow as pa

from osm_export_tool_python_ray.stages.joins import bucket_join


def _vocab_topv(docs_ds, V):
    """Top-V terms by (tf desc, term asc) — the q_vocab_topk /
    unigram_logprob distributed cut; only the final V rows reach the
    driver."""
    from osm_export_tool_python_ray.stages.textstages import vocab_partial

    grouped = (
        docs_ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("term")
        .sum(["tf"])
    )
    rows = grouped.sort(["sum(tf)", "term"], descending=[True, False]).limit(V).take_all()
    terms = np.array([r["term"] for r in rows])
    order = np.argsort(terms)
    return terms[order]  # sorted for searchsorted membership


def _edge_partial(vocab_sorted_ref, text_col="text"):
    """Per-batch combiner: adjacent-token pairs (both in-vocab, a≠b) →
    canonical undirected (min_idx, max_idx) counts, packed into one
    int64 key."""
    import ray

    from osm_export_tool_python_ray.functions.text import alnum_tokens_batch

    def fn(t: pa.Table) -> pa.Table:
        vt = cached_get(vocab_sorted_ref)
        V = len(vt)
        flat, ntoks = alnum_tokens_batch(t.column(text_col).to_pylist())
        if not flat:
            return pa.table(
                {"ekey": pa.array([], type=pa.int64()), "w": pa.array([], type=pa.int64())}
            )
        w = np.array(flat)
        pos = np.searchsorted(vt, w)
        posc = np.minimum(pos, V - 1)
        iv = np.where((pos < V) & (vt[posc] == w), posc, -1).astype(np.int64)
        # adjacency within each doc: positions i, i+1 in the same segment
        ends = np.cumsum(ntoks)
        a = iv[:-1]
        b = iv[1:]
        # mask out pairs crossing doc boundaries (index i is a doc end)
        cross = np.zeros(len(iv) - 1, dtype=bool) if len(iv) > 1 else np.zeros(0, dtype=bool)
        for e in ends[:-1]:
            if 0 < e <= len(cross):
                cross[e - 1] = True
        ok = (a >= 0) & (b >= 0) & (a != b) & ~cross
        lo = np.minimum(a[ok], b[ok])
        hi = np.maximum(a[ok], b[ok])
        key = lo * V + hi
        u, c = np.unique(key, return_counts=True)
        return pa.table({"ekey": pa.array(u), "w": pa.array(c.astype(np.int64))})

    return fn


def textrank_scores(
    docs_ds_factory,
    V=200,
    iters=3,
    d_num=85,
    d_den=100,
    s0=1_000_000,
    base=150_000,
    num_buckets=16,
):
    """→ pyarrow Table (term, score, rank) — top-20 TextRank keywords.

    ``docs_ds_factory``: zero-arg callable returning a fresh docs
    Dataset (the corpus is consumed twice — vocab pass + edge pass —
    and Ray re-executes lineage per consumer, so the caller hands us
    the constructor, not a dataset)."""
    import ray

    vocab_sorted = _vocab_topv(docs_ds_factory(), V)
    Vn = len(vocab_sorted)
    if Vn == 0:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "score": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
    vref = ray.put(vocab_sorted)

    # undirected canonical edge aggregate: ONE groupby over combiner rows
    und = (
        docs_ds_factory()
        .map_batches(_edge_partial(vref), batch_format="pyarrow")
        .groupby("ekey")
        .sum(["w"])
    )

    def to_directed(t: pa.Table) -> pa.Table:
        k = t.column("ekey").to_numpy(zero_copy_only=False)
        w = t.column("sum(w)").to_numpy(zero_copy_only=False).astype(np.int64)
        lo = k // Vn
        hi = k % Vn
        return pa.table(
            {
                "src": pa.array(np.concatenate([lo, hi])),
                "dst": pa.array(np.concatenate([hi, lo])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    directed = und.map_batches(to_directed, batch_format="pyarrow")
    wdeg = directed.groupby("src").sum(["w"])
    wdeg = wdeg.map_batches(
        lambda t: pa.table(
            {"src": t.column("src"), "wd": t.column("sum(w)").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    i64 = pa.int64()
    edges = bucket_join(
        directed,
        wdeg,
        key="src",
        num_buckets=num_buckets,
        left_schema=pa.schema([("src", i64), ("dst", i64), ("w", i64)]),
        right_schema=pa.schema([("src", i64), ("wd", i64)]),
    ).materialize()  # ≤ V² rows; reused every iteration

    import ray.data

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(Vn, dtype=np.int64))})
    )
    scores = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.arange(Vn, dtype=np.int64)),
                "s": pa.array(np.full(Vn, s0, dtype=np.int64)),
            }
        )
    )

    for _ in range(iters):
        joined = bucket_join(
            edges,
            scores,
            key="src",
            num_buckets=num_buckets,
            left_schema=pa.schema([("src", i64), ("dst", i64), ("w", i64), ("wd", i64)]),
            right_schema=pa.schema([("src", i64), ("s", i64)]),
        )

        def contrib(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            wd = t.column("wd").to_numpy(zero_copy_only=False)
            c = (d_num * s * w) // (d_den * wd)
            return pa.table({"dst": t.column("dst"), "c": pa.array(c)})

        sums = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .sum(["c"])
        )
        sums = sums.map_batches(
            lambda t: pa.table(
                {"node": t.column("dst"), "cs": t.column("sum(c)").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        merged = bucket_join(
            nodes,
            sums,
            key="node",
            how="left",
            num_buckets=num_buckets,
            left_schema=pa.schema([("node", i64)]),
            right_schema=pa.schema([("node", i64), ("cs", i64)]),
        )

        def add_base(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc_

            cs = pc_.fill_null(t.column("cs"), 0)
            return pa.table(
                {
                    "src": t.column("node"),
                    "s": pc_.add(cs, base),
                }
            )

        scores = merged.map_batches(add_base, batch_format="pyarrow").materialize()

    top = scores.sort(["s", "src"], descending=[True, False]).limit(20).take_all()
    terms = [str(vocab_sorted[r["src"]]) for r in top]
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "score": pa.array([r["s"] for r in top], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        }
    )


def colocation_triangles(
    events_ds,
    min_shared=2,
    wedge_cap=512,
    num_buckets=32,
    num_partitions=8,
):
    """Per-user triangle counts on the co-location graph: nodes are
    users, edges are pairs with ≥ ``min_shared`` shared (cell, hour)
    presence groups (stages/journey.py encounters), and each triangle
    {a < b < c} is counted ONCE — wedges (v, w) are emitted only from
    their smallest node (adjacency is min-endpoint-keyed, so both
    neighbors exceed the center) and closed against the edge set.
    Returns (user_id, n_tri).

    Scale shape: the edge table is an aggregate (materialized once —
    it feeds both the wedge expansion and the closure probe; the
    upstream encounters exchange must not run twice). Wedge expansion
    is one center-keyed exchange with the same vectorized combination
    arithmetic as encounters, capped per center at ``wedge_cap``
    neighbors (kept = smallest ids, drops counted via
    report_cap('triangle_wedge_truncated') — per-node degree is the
    quadratic lever in triangle counting). Closure is the asof-join
    trick: edges (center = -1) and wedges (center = a) ride ONE
    (v, w)-keyed exchange in one schema; a segment emits its wedge rows
    iff it contains an edge row. No broadcast of the edge set, no
    driver state.
    """
    from ray.data.aggregate import Sum

    from osm_export_tool_python_ray.stages.exchange import grouped_map, union_all
    from osm_export_tool_python_ray.stages.journey import encounters
    from osm_export_tool_python_ray.state.metrics import report_cap

    _PAIR = pa.schema(
        [
            ("v", pa.int64()),
            ("w", pa.int64()),
            ("center", pa.int64()),
            ("bucket", pa.int32()),
        ]
    )

    def efilter(t: pa.Table) -> pa.Table:
        ns = t.column("n_shared").to_numpy(zero_copy_only=False)
        keep = ns >= min_shared
        return pa.table(
            {
                "a": t.column("user_a").to_numpy(zero_copy_only=False)[keep],
                "b": t.column("user_b").to_numpy(zero_copy_only=False)[keep],
            }
        )

    edges = (
        encounters(events_ds, num_buckets=num_buckets, num_partitions=num_partitions)
        .map_batches(efilter, batch_format="pyarrow")
        .materialize()
    )

    def abucket(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((a % num_buckets).astype(np.int32)))

    def wedges(g: pa.Table) -> pa.Table:
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        if not len(a):
            return _PAIR.empty_table()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.nonzero(np.concatenate([[True], a[1:] != a[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(a)))
        if (sizes > wedge_cap).any():
            rank = np.arange(len(a)) - np.repeat(starts, sizes)
            keep = rank < wedge_cap
            report_cap("triangle_wedge_truncated", int((~keep).sum()))
            a, b = a[keep], b[keep]
            starts = np.nonzero(np.concatenate([[True], a[1:] != a[:-1]]))[0]
            sizes = np.diff(np.append(starts, len(a)))
        rank = np.arange(len(a)) - np.repeat(starts, sizes)
        left_counts = np.repeat(sizes, sizes) - 1 - rank
        total = int(left_counts.sum())
        if total == 0:
            return _PAIR.empty_table()
        L = np.repeat(np.arange(len(a)), left_counts)
        offs = np.concatenate([[np.int64(0)], np.cumsum(left_counts)])[:-1]
        R = np.arange(total) - np.repeat(offs, left_counts) + L + 1
        v, w, c = b[L], b[R], a[L]  # b sorted within center => v < w
        key = v * np.int64(1_000_003) + w
        return pa.table(
            {
                "v": pa.array(v),
                "w": pa.array(w),
                "center": pa.array(c),
                "bucket": pa.array((key % num_buckets).astype(np.int32)),
            }
        )

    def etag(t: pa.Table) -> pa.Table:
        v = t.column("a").to_numpy(zero_copy_only=False)
        w = t.column("b").to_numpy(zero_copy_only=False)
        key = v * np.int64(1_000_003) + w
        return pa.table(
            {
                "v": pa.array(v),
                "w": pa.array(w),
                "center": pa.array(np.full(len(v), -1, dtype=np.int64)),
                "bucket": pa.array((key % num_buckets).astype(np.int32)),
            }
        )

    wedge_ds = grouped_map(
        edges.map_batches(abucket, batch_format="pyarrow"),
        "bucket",
        lambda g: wedges(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )
    tagged = union_all(
        edges.map_batches(etag, batch_format="pyarrow"), wedge_ds
    )

    def close(g: pa.Table) -> pa.Table:
        EMPTY = pa.table(
            {"user_id": pa.array([], type=pa.int64()),
             "n_partial": pa.array([], type=pa.int64())}
        )
        v = g.column("v").to_numpy(zero_copy_only=False)
        if not len(v):
            return EMPTY
        w = g.column("w").to_numpy(zero_copy_only=False)
        c = g.column("center").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, w, v))
        v, w, c = v[order], w[order], c[order]
        starts = np.nonzero(
            np.concatenate([[True], (v[1:] != v[:-1]) | (w[1:] != w[:-1])])
        )[0]
        # edge rows sort first in a segment (center -1 < any user id)
        has_edge = c[starts] == -1
        seg_of = np.cumsum(
            np.concatenate([[True], (v[1:] != v[:-1]) | (w[1:] != w[:-1])])
        ) - 1
        tri = (c >= 0) & has_edge[seg_of]
        if not tri.any():
            return EMPTY
        members = np.concatenate([c[tri], v[tri], w[tri]])
        uq, cnt = np.unique(members, return_counts=True)
        return pa.table(
            {"user_id": pa.array(uq), "n_partial": pa.array(cnt.astype(np.int64))}
        )

    partials = grouped_map(
        tagged,
        "bucket",
        lambda g: close(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=_PAIR,
    )
    return partials.groupby("user_id").aggregate(Sum("n_partial", alias_name="n_tri"))


def butterfly_counts(pairs_ds, count_col="n_shared", num_partitions=8):
    """Bipartite butterfly (4-cycle) participation per left-side vertex.

    A butterfly is two users sharing two distinct right-side groups —
    the bipartite analogue of the triangle, the base motif of bipartite
    clustering coefficients and spam/bot detection. Given the pair
    co-occurrence table (user_a, user_b, c) with c = number of shared
    groups (stages/journey.py encounters — per-batch presence combiner,
    capped group expansion), each pair contributes C(c, 2) butterflies,
    attributed to BOTH endpoints:

        b(u) = Σ_v C(c_{u,v}, 2)

    Scale shape: the expensive part (pair derivation) is the encounters
    stage's one keyed exchange; this stage adds a vectorized two-row
    explode and one tiny user-keyed groupby-sum. Exact integer
    arithmetic (c·(c−1)/2 with even product — no float).

    No reference analog — engine mandate (graph-motif family,
    bipartite counterpart of colocation_triangles above).
    """
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "bf": pa.array([], type=pa.int64()),
                }
            )
        a = t.column("user_a").to_numpy(zero_copy_only=False)
        b = t.column("user_b").to_numpy(zero_copy_only=False)
        c = t.column(count_col).to_numpy(zero_copy_only=False)
        bf = c * (c - 1) // 2
        keep = bf > 0
        a, b, bf = a[keep], b[keep], bf[keep]
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([a, b])),
                "bf": pa.array(np.concatenate([bf, bf])),
            }
        )

    return (
        pairs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("bf", alias_name="butterflies"))
    )


def pagerank_scores(
    pairs_ds,
    a_col="user_a",
    b_col="user_b",
    w_col="n_shared",
    iters=3,
    d_num=85,
    d_den=100,
    s0=1_000_000,
    base=150_000,
    num_buckets=16,
):
    """Weighted PageRank over ANY undirected pair table → Dataset
    (node, score). The generic-graph sibling of ``textrank_scores``
    (same integer-exact power iteration, same per-iteration shape:
    one keyed join + one groupby-sum), but over arbitrary int64 node
    ids instead of a driver-held vocabulary — node state lives ONLY in
    datasets, so the graph can be billions of nodes.

    Per iteration (micro-unit int64 arithmetic, floor division —
    summation-order independent, DuckDB-rederivable):

        s_{t+1}(v) = base + Σ_{(u,v)∈E} (d_num · s_t(u) · w_uv)
                                        // (d_den · wdeg_u)

    The node domain is "nodes with ≥1 edge" (isolated nodes never
    appear in a pair table). Scale shape: the directed edge aggregate
    (2 rows per pair, with wdeg attached once) is materialized and
    reused every iteration; each iteration is one bucket_join + one
    groupby — no driver state at all. Overflow bound: d_num·s·w must
    fit int64; s plateaus near base·n_frontier growth so w up to ~10⁹
    is safe at the defaults.

    No reference analog — engine mandate (iterative graph centrality
    over the co-location graph; Page et al. 1999).

    Known multi-node upgrade path (NOT needed single-node, where fixed
    task overhead dominates): each iteration currently re-exchanges the
    edge aggregate through bucket_join. A cluster-scale variant would
    pin the edge blocks bucketed by src%B once and per iteration move
    ONLY the score rows to the matching buckets (raw-task zip join over
    the materialized block refs) — edges-stay-put, Pregel-style. The
    arithmetic and results are identical; only data movement changes.
    """
    import ray.data

    from osm_export_tool_python_ray.stages.joins import bucket_join

    i64 = pa.int64()

    def to_directed(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column(w_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    # materialize ONCE: both consumers below (wdeg groupby + edge join)
    # would otherwise re-execute the full upstream pair-derivation
    # lineage (e.g. the encounters exchange) — the dedup_clusters
    # double-execution class. The directed edge aggregate is 2 rows per
    # pair and lives in the object store from here on.
    directed = pairs_ds.map_batches(to_directed, batch_format="pyarrow").materialize()
    wdeg = directed.groupby("src").sum(["w"])
    # two consumers (edge join + node set) — materialize the tiny
    # degree table once rather than re-running its groupby
    wdeg = wdeg.map_batches(
        lambda t: pa.table(
            {"src": t.column("src"), "wd": t.column("sum(w)").cast(i64)}
        ),
        batch_format="pyarrow",
    ).materialize()
    edges = bucket_join(
        directed,
        wdeg,
        key="src",
        num_buckets=num_buckets,
        left_schema=pa.schema([("src", i64), ("dst", i64), ("w", i64)]),
        right_schema=pa.schema([("src", i64), ("wd", i64)]),
    ).materialize()  # reused every iteration

    scores = wdeg.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "s": pa.array(np.full(t.num_rows, s0, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    for _ in range(iters):
        joined = bucket_join(
            edges,
            scores,
            key="src",
            num_buckets=num_buckets,
            left_schema=pa.schema(
                [("src", i64), ("dst", i64), ("w", i64), ("wd", i64)]
            ),
            right_schema=pa.schema([("src", i64), ("s", i64)]),
        )

        def contrib(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            wd = t.column("wd").to_numpy(zero_copy_only=False)
            c = (d_num * s * w) // (d_den * wd)
            return pa.table({"dst": t.column("dst"), "c": pa.array(c)})

        sums = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .sum(["c"])
        )
        # no left-join back onto a node set: in an undirected graph every
        # node with an out-edge also has an in-edge, so groupby(dst)
        # already yields EXACTLY the node domain — one exchange per
        # iteration instead of two (textrank keeps the join because its
        # vocabulary can contain edge-less terms; here it cannot)
        def add_base(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc_

            return pa.table(
                {
                    "src": t.column("dst"),
                    "s": pc_.add(t.column("sum(c)").cast(i64), base),
                }
            )

        scores = sums.map_batches(add_base, batch_format="pyarrow").materialize()

    return scores.map_batches(
        lambda t: pa.table({"node": t.column("src"), "score": t.column("s")}),
        batch_format="pyarrow",
    )


def kcore_members(
    pairs_ds,
    k,
    a_col="user_a",
    b_col="user_b",
    max_rounds=64,
    num_buckets=16,
):
    """k-core of the undirected pair graph: the (unique, maximal)
    subgraph in which every node has degree >= k, by iterative peeling
    — drop all nodes of degree < k, re-induce, repeat to fixpoint
    (Seidman 1983; the standard distributed formulation, e.g.
    Montresor et al. "Distributed k-Core Decomposition", PODC'11).
    Returns (node, deg) with deg = degree INSIDE the core.

    Per round: one ``keyed_sum`` degree fold plus two semi-joins
    (``bucket_join`` on src then dst) re-inducing the edge set — three
    bucketed exchanges, node/edge state lives only in datasets; driver
    state is ONE integer (the survivor count, whose monotone shrink
    doubles as the fixpoint test: node sets only shrink, so equal
    counts <=> equal sets <=> degrees unchanged <=> fixpoint).
    Unconverged exits at ``max_rounds`` are reported via
    ``report_cap('kcore_unconverged_rounds')`` — peel depth is
    data-dependent (a k=2 path graph peels one layer per round), so the
    bound is a documented cap, not an assumption.

    No reference analog — engine mandate (graph family, sibling of
    pagerank_scores / colocation_triangles)."""
    from osm_export_tool_python_ray.stages.exchange import keyed_sum
    from osm_export_tool_python_ray.stages.joins import bucket_join
    from osm_export_tool_python_ray.state.metrics import report_cap

    i64 = pa.int64()

    def to_directed(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "one": pa.array(np.ones(2 * n, dtype=np.int64)),
            }
        )

    directed = pairs_ds.map_batches(to_directed, batch_format="pyarrow").materialize()
    edge_schema = pa.schema([("src", i64), ("dst", i64), ("one", i64)])
    deg_schema = pa.schema([("src", i64), ("deg", i64)])

    prev = -1
    deg = None
    for _round in range(max_rounds):
        deg = keyed_sum(
            directed, ["src"], [("one", "deg")], num_buckets=num_buckets
        ).materialize()

        def survivors(t: pa.Table) -> pa.Table:
            d = t.column("deg").to_numpy(zero_copy_only=False)
            return pa.table(
                {"src": t.column("src").filter(pa.array(d >= k)),
                 "deg": t.column("deg").filter(pa.array(d >= k))}
            )

        deg = deg.map_batches(survivors, batch_format="pyarrow").materialize()
        n_alive = deg.count()
        if n_alive == prev:
            return deg.map_batches(
                lambda t: pa.table(
                    {"node": t.column("src"), "deg": t.column("deg")}
                ),
                batch_format="pyarrow",
            )
        if n_alive == 0:
            # a 0-row pyarrow Table, NOT an empty Dataset: ray.data
            # drops the schema of all-empty datasets on to_pandas()/
            # sort(), which breaks the driver's schema compare. The
            # empty core is driver-safe by construction.
            return pa.table(
                {"node": pa.array([], type=i64), "deg": pa.array([], type=i64)}
            )
        prev = n_alive
        # re-induce: keep edges whose BOTH endpoints survive
        alive_nodes = deg.map_batches(
            lambda t: pa.table({"src": t.column("src")}), batch_format="pyarrow"
        )
        directed = bucket_join(
            directed,
            alive_nodes.map_batches(
                lambda t: t.append_column("keep_s", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow",
            ),
            key="src",
            num_buckets=num_buckets,
            how="inner",
            left_schema=edge_schema,
            right_schema=pa.schema([("src", i64), ("keep_s", pa.int8())]),
        ).map_batches(
            lambda t: t.select(["src", "dst", "one"]), batch_format="pyarrow"
        )
        directed = (
            bucket_join(
                directed.map_batches(
                    lambda t: pa.table(
                        {"dst": t.column("dst"), "osrc": t.column("src"), "one": t.column("one")}
                    ),
                    batch_format="pyarrow",
                ),
                alive_nodes.map_batches(
                    lambda t: pa.table(
                        {"dst": t.column("src"),
                         "keep_d": pa.array(np.ones(t.num_rows, np.int8))}
                    ),
                    batch_format="pyarrow",
                ),
                key="dst",
                num_buckets=num_buckets,
                how="inner",
                left_schema=pa.schema([("dst", i64), ("osrc", i64), ("one", i64)]),
                right_schema=pa.schema([("dst", i64), ("keep_d", pa.int8())]),
            )
            .map_batches(
                lambda t: pa.table(
                    {"src": t.column("osrc"), "dst": t.column("dst"), "one": t.column("one")}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    report_cap("kcore_unconverged_rounds", 1)
    return deg.map_batches(
        lambda t: pa.table({"node": t.column("src"), "deg": t.column("deg")}),
        batch_format="pyarrow",
    )


def graph_walks(
    pairs_ds,
    length=4,
    a_col="user_a",
    b_col="user_b",
    num_buckets=16,
):
    """Deterministic random-walk corpus over the undirected pair graph —
    the training-data generator for graph-embedding pipelines (DeepWalk,
    Perozzi et al. KDD'14 / node2vec, Grover & Leskovec KDD'16): one
    walk of ``length`` steps from every node. "Randomness" is the
    engine's splitmix64 avalanche over (walk·P XOR step), so walks are
    reproducible across runs, parallelism levels AND in the DuckDB
    oracle (same mix64 via _sql_mix64 — the MinHash hash-family parity
    discipline).

    Step rule from node ``cur`` at step ``s`` of walk ``w``:

        idx = mix64((w * 0x9E3779B97F4A7C15 mod 2^64) XOR s) mod deg(cur)
        next = sorted-neighbors(cur)[idx]

    Scale shape: the indexed adjacency (src, dst, idx, deg — neighbor
    lists sorted by dst, one exchange) is materialized ONCE and reused
    every step; each step is ONE node-keyed exchange co-locating the
    frontier with its adjacency slice (searchsorted + fancy-index, no
    Python loop); frontier state lives only in datasets. L steps = L
    exchanges — the Pregel-style iteration of pagerank_scores, with a
    gather instead of a scatter-sum.

    No reference analog — engine mandate (graph training-data family).
    """
    import ray.data

    from osm_export_tool_python_ray.stages.exchange import union_all

    i64 = pa.int64()
    P = np.uint64(0x9E3779B97F4A7C15)

    def to_directed(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    def bucket_src(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((s % num_buckets).astype(np.int32))
        )

    def index_adj(g: pa.Table) -> pa.Table:
        s = g.column("src").to_numpy(zero_copy_only=False)
        d = g.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        # collapse multi-edges: neighbor LISTS are sets (matches the
        # oracle's DISTINCT pair derivation and keeps deg well-defined
        # for arbitrary pair tables)
        if len(s):
            keep = np.concatenate([[True], (s[1:] != s[:-1]) | (d[1:] != d[:-1])])
            s, d = s[keep], d[keep]
        n = len(s)
        first = (
            np.concatenate([[True], s[1:] != s[:-1]]) if n else np.array([], bool)
        )
        starts = np.nonzero(first)[0]
        sizes = np.diff(np.append(starts, n))
        seg = np.repeat(np.arange(len(starts)), sizes)
        idx = np.arange(n, dtype=np.int64) - starts[seg]
        return pa.table(
            {
                "src": pa.array(s),
                "dst": pa.array(d),
                "idx": pa.array(idx),
                "deg": pa.array(sizes[seg].astype(np.int64)),
            }
        )

    from osm_export_tool_python_ray.stages.exchange import grouped_map

    adj = grouped_map(
        pairs_ds.map_batches(to_directed, batch_format="pyarrow").map_batches(
            bucket_src, batch_format="pyarrow"
        ),
        "bucket",
        index_adj,
        num_partitions=min(num_buckets, 8),
        payload_schema=pa.schema([("src", i64), ("dst", i64)]),
    ).materialize()  # reused every step

    # frontier 0: one walk per node (idx==0 row of each neighbor list)
    def seeds(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        f = t.filter(pc_.equal(t.column("idx"), 0))
        return pa.table({"walk": f.column("src"), "cur": f.column("src")})

    frontier = adj.map_batches(seeds, batch_format="pyarrow").materialize()

    def with_step(ds, s):
        return ds.map_batches(
            lambda t: pa.table(
                {
                    "walk": t.column("walk"),
                    "step": pa.array(np.full(t.num_rows, s, dtype=np.int64)),
                    "node": t.column("cur"),
                }
            ),
            batch_format="pyarrow",
        )

    out_steps = [with_step(frontier, 0)]

    def adj_as_union(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = t.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "walk": pa.nulls(n, type=i64),
                "cur": t.column("src"),
                "dst": t.column("dst"),
                "idx": t.column("idx"),
                "deg": t.column("deg"),
                "kind": pa.array(np.ones(n, np.int8)),
                "bucket": pa.array((s % num_buckets).astype(np.int32)),
            }
        )

    adj_union = adj.map_batches(adj_as_union, batch_format="pyarrow").materialize()

    union_schema = pa.schema(
        [
            ("walk", i64),
            ("cur", i64),
            ("dst", i64),
            ("idx", i64),
            ("deg", i64),
            ("kind", pa.int8()),
        ]
    )

    for s in range(1, int(length) + 1):

        def frontier_as_union(t: pa.Table) -> pa.Table:
            n = t.num_rows
            c = t.column("cur").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "walk": t.column("walk"),
                    "cur": t.column("cur"),
                    "dst": pa.nulls(n, type=i64),
                    "idx": pa.nulls(n, type=i64),
                    "deg": pa.nulls(n, type=i64),
                    "kind": pa.array(np.zeros(n, np.int8)),
                    "bucket": pa.array((c % num_buckets).astype(np.int32)),
                }
            )

        step_const = np.uint64(s)

        def advance(g: pa.Table, _step=step_const) -> pa.Table:
            import pyarrow.compute as pc_

            # split Arrow-side FIRST: to_numpy on a null-bearing int64
            # column silently widens to float64 (NaN nulls) — filtering
            # the table keeps the columns int64
            am = pc_.equal(g.column("kind"), 1)
            at = g.filter(am)
            ft = g.filter(pc_.invert(am))
            asrc = at.column("cur").to_numpy(zero_copy_only=False)
            adst = at.column("dst").to_numpy(zero_copy_only=False)
            aidx = at.column("idx").to_numpy(zero_copy_only=False)
            order = np.lexsort((aidx, asrc))
            asrc, adst = asrc[order], adst[order]
            adeg = at.column("deg").to_numpy(zero_copy_only=False)[order]
            w = ft.column("walk").to_numpy(zero_copy_only=False)
            cur = ft.column("cur").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(asrc, cur, side="left")
            deg = adeg[pos].astype(np.uint64)
            from osm_export_tool_python_ray.functions.text import _mix64

            with np.errstate(over="ignore"):
                h = _mix64(w.astype(np.uint64) * P ^ _step) % deg
            nxt = adst[pos + h.astype(np.int64)]
            return pa.table({"walk": pa.array(w), "cur": pa.array(nxt)})

        frontier = grouped_map(
            union_all(
                frontier.map_batches(frontier_as_union, batch_format="pyarrow"),
                adj_union,
            ),
            "bucket",
            advance,
            num_partitions=min(num_buckets, 8),
            payload_schema=union_schema,
        ).materialize()
        out_steps.append(with_step(frontier, s))

    return union_all(*out_steps)
