"""The engine's exchange primitive: co-locate rows by a (bucketed) key and
apply a per-group vectorized function.

Every wide stage in this engine (element dedup, J1/J2 assembly cogroups,
LSH band grouping, tile/kNN cell grouping, bucket joins) has the shape

    ds.map_batches(add_bucket) → exchange on "bucket" → per-bucket kernel

and NONE of the per-bucket kernels need globally sorted input — each one
lexsorts or searchsorts internally on its real key. Two interchangeable
implementations, selectable per call site (``strategy=``) or globally
(``OSM_RAY_EXCHANGE``):

* ``sort`` (default): Ray's ``groupby().map_groups`` sort shuffle
  (sample → range-partition → per-range merge). Pays an exchange-level
  sort the kernels don't need, but its reduce side is plain tasks that
  scale across all cores and it pipelines well.
* ``hash``: Ray's hash-partition shuffle (map-side hash split →
  aggregator-actor concat), applied per PARTITION with no sorting
  anywhere.

* ``task``: a from-scratch two-stage shuffle on raw Ray tasks (map:
  argsort+take split per block, num_returns=P; reduce: concat + kernel
  as plain tasks) — no actors, no exchange sort, construction eager.

Measured A/B on the 24,576-shard corpus at 32 cpus (round 3):

* hash is ~2x FASTER for light-payload exchanges (tile assignment:
  6-7s vs 10-13s — rows are a key plus a couple of ids) and ~2x SLOWER
  for the export's heavy nested-payload exchanges (export 87-126s vs
  49-65s — map<>/list<> columns make the per-shard actor-call
  serialization and the 8-actor serial concat the bottleneck, and
  actor pool startup adds ~2s per exchange that small pipelines never
  amortize).
* task also LOSES to sort on the heavy dedup exchange (14.7-20.1s vs
  13.3-16.0s for the full parse+dedup at 24,576/32, identical output).

The instructive negative result: round-1 profiling attributed ~60% of
export wall to "the sorts", but replacing the sort with two sort-free
exchanges did NOT recover that time — the cost is the GATHER + data
movement of nested payloads, which every exchange pays; Ray's sort
exchange gathers once and then hands out zero-copy contiguous ranges,
and pipelines best.

The A/B outcome is encoded as an AUTOMATIC per-call-site choice
(``choose_strategy``): a payload whose exchange schema is all
fixed-width/short-string columns (the "key plus a couple of ids" class
where hash measured ~2x faster) picks ``hash``; any nested column
(list/map/struct — the class where hash measured ~2x slower) or an
unknown schema picks ``sort``. Call sites pass the exchange schema they
construct via ``payload_schema=`` (they build those tables explicitly,
so the schema is static knowledge, not a strategy hardcode); without a
hint the heuristic falls back to ``ds.schema(fetch_if_missing=False)``
— NEVER a fetching peek, which on a lineage containing an upstream
exchange would execute that whole barrier twice — and otherwise to
``sort``. The whole suite passes under any strategy.

Precedence: ``OSM_RAY_EXCHANGE`` env var, when SET, overrides
everything (the global A/B lever — including call sites that pass an
explicit ``strategy=``); then the explicit ``strategy=`` argument; then
the payload-width heuristic; then ``sort``. NOTE for the env lever:
``OSM_RAY_EXCHANGE=task`` selects the raw-task exchange globally, whose
construction is EAGER (the upstream executes at ``grouped_map`` call
time, not at first downstream consumption) and which supports only
``batch_format="pyarrow"`` with no extra ``map_batches`` kwargs —
``grouped_map`` warns and drops them (no engine call site passes any).

Scale/deadlock notes (the reason this is centralized here):

* Hash-shuffle aggregators are actors that RESERVE ``num_cpus`` and
  ``memory`` per partition at operator start. The memory estimate is
  ``num_partitions × target_max_block_size`` — wildly conservative for
  bucketed exchanges — and several exchanges run CONCURRENTLY in one
  streaming DAG, so large ``num_partitions`` can demand more resources
  than the cluster has and livelock the pipeline (the round-1 failure
  mode that original made this engine sort-based). Therefore:
  - ``num_partitions`` defaults to min(num_buckets, 32): partition
    granularity, NOT parallelism — reduce tasks stay coarse and the
    aggregate reservation stays bounded. It must be FIXED across
    parallelism levels (the scaling-bench granularity-pinning rule).
  - the per-partition CPU reservation is overridden to a token value via
    ``DataContext`` so aggregators never starve the map side; their
    actual work (Arrow concat + one local sort) is tiny.
* The strategy flag lives on the DATASET's captured context (Ray copies
  DataContext per lineage) and must remain HASH_SHUFFLE through physical
  planning, so ``grouped_map`` flips the lineage context permanently.
  Consequence: later ``groupby().aggregate()`` calls on the same lineage
  also plan as hash aggregates (fine — they need no global order either)
  and inherit ``default_hash_shuffle_parallelism`` set here.
* ``Dataset.union`` adopts only the FIRST operand's context, so a hash
  exchange on a non-first branch is invisible to the planner at the root
  — a branch-merge must go through ``union_all`` below, which re-inherits
  the hash settings onto the union's context (the round-3 CLI/workdir
  failure: point features rode a fresh checkpoint-read context while
  way/relation assembly exchanged).
* Row order within a group is arrival order (nondeterministic); every
  kernel passed to ``grouped_map`` must impose its own total order, which
  all engine kernels already do (two-parallelism determinism tests pin
  this).

``OSM_RAY_EXCHANGE=sort`` reverts every call site to the sort-based
exchange (A/B lever; also the fallback if a Ray version regresses hash
shuffle).
"""

import os
import warnings

from ray.data.context import ShuffleStrategy

# set = global override for every call site (A/B lever); unset = per-site
# choice (explicit strategy= argument, else the payload-width heuristic)
_ENV_STRATEGY = os.environ.get("OSM_RAY_EXCHANGE") or None

# token CPU reservation per partition for shuffle/aggregate actor pools;
# keeps N concurrent exchanges schedulable on a small cluster while the
# OS multiplexes the (tiny) concat work
_AGG_CPUS_PER_PARTITION = 0.02

# estimated bytes/row above which a flat payload still counts as heavy
# (a row of ~16 wide strings gathers like a nested payload)
_LIGHT_ROW_BYTES = 256

# rough per-value cost of a variable-length string/binary cell; testdata
# and OSM tag values are short — the heuristic only needs the ORDER of
# magnitude to separate the two measured payload classes
_STRING_BYTES = 24


def estimate_row_width(schema) -> int | None:
    """Estimated bytes/row for a pyarrow schema; None = unbounded (some
    column is nested — list/map/struct — whose size is data-dependent)."""
    import pyarrow.types as pt

    total = 0
    for f in schema:
        t = f.type
        if pt.is_nested(t):  # list / large_list / fixed_size_list / map / struct
            return None
        if (
            pt.is_string(t)
            or pt.is_large_string(t)
            or pt.is_binary(t)
            or pt.is_large_binary(t)
        ):
            total += _STRING_BYTES
        else:
            try:
                total += max(t.bit_width // 8, 1)
            except (ValueError, AttributeError):  # no fixed width known
                return None
    return total


def choose_strategy(schema) -> str:
    """Payload-width heuristic from the round-3 A/B (module docstring):
    light flat rows → ``hash`` (measured ~2x faster), nested or wide or
    unknown payloads → ``sort`` (measured ~2x faster there)."""
    if schema is None:
        return "sort"
    w = estimate_row_width(schema)
    return "hash" if w is not None and w <= _LIGHT_ROW_BYTES else "sort"


def exchange_strategy():
    """The global override if OSM_RAY_EXCHANGE is set, else the default."""
    return _ENV_STRATEGY or "sort"


def resolve_strategy(explicit=None, payload_schema=None, ds=None) -> str:
    """Strategy precedence: env override > explicit arg > width heuristic
    over ``payload_schema`` (or the dataset's schema if ALREADY KNOWN —
    never a fetching peek, see module docstring) > 'sort'."""
    if _ENV_STRATEGY:
        return _ENV_STRATEGY
    if explicit:
        return explicit
    schema = payload_schema
    if schema is None and ds is not None:
        import pyarrow as pa_

        try:
            schema = ds.schema(fetch_if_missing=False)
            if schema is not None and hasattr(schema, "base_schema"):
                schema = schema.base_schema  # ray Schema wrapper → pyarrow
            if not isinstance(schema, pa_.Schema):
                schema = None
        except Exception:
            schema = None
    return choose_strategy(schema)


def hash_bucket(col, num_buckets):
    """Stable int32 bucket ids for an Arrow/numpy key column: integers
    bucket by modulo, strings by the vectorized 128-bit string hash — the
    one bucketing rule every grouped_map call site shares (a batch-LOCAL
    index must never be a bucket key: the same value would land in
    different buckets per batch)."""
    import numpy as np
    import pyarrow as pa_

    if isinstance(col, pa_.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa_.Array):
        if pa_.types.is_integer(col.type):
            k = col.to_numpy(zero_copy_only=False)
        else:
            from osm_export_tool_python_ray.functions.text import hash_strings_128

            h, _ = hash_strings_128(col.cast(pa_.string()))
            return (h % np.uint64(num_buckets)).astype(np.int32)
    else:
        k = np.asarray(col)
        if k.dtype.kind not in "iu":
            from osm_export_tool_python_ray.functions.text import hash_strings_128

            h, _ = hash_strings_128(pa_.array(k, type=pa_.string()))
            return (h % np.uint64(num_buckets)).astype(np.int32)
    return (k.astype(np.int64) % num_buckets).astype(np.int32)


def _enable_hash(ctx, num_partitions):
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = num_partitions
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
        _AGG_CPUS_PER_PARTITION
    )
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = (
        _AGG_CPUS_PER_PARTITION
    )
    # aggregators per exchange: a handful of concat actors saturate a
    # node; the default (64) × several concurrent exchanges in one DAG
    # is hundreds of processes. Raise with cluster size.
    ctx.max_hash_shuffle_aggregators = int(
        os.environ.get("OSM_RAY_MAX_AGGREGATORS", "8")
    )


def union_all(first, *rest):
    """``Dataset.union`` with exchange-context inheritance.

    Ray plans the WHOLE physical DAG with the root dataset's DataContext,
    but ``union`` adopts (a copy of) only the FIRST operand's context
    (``Dataset.union`` → ``LogicalPlan(op, self.context)``). If a non-first
    operand's lineage contains a keyed repartition (our hash exchange), and
    the first operand's lineage does not — e.g. the point-features branch
    read straight from a checkpoint while way/relation assembly exchanged —
    physical planning under the root's SORT context rejects the repartition
    outright (``plan_all_to_all_op.py``: "Key-based repartitioning only
    supported for HASH_SHUFFLE"). Use this instead of ``.union`` at any
    site where the result can reach execution without a later
    ``grouped_map`` on the same lineage."""
    out = first.union(*rest)
    for s in (first,) + rest:
        if s.context.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE:
            _enable_hash(out.context, s.context.default_hash_shuffle_parallelism)
            break
    return out


def grouped_map(
    ds,
    key,
    fn,
    *,
    num_partitions,
    batch_format="pyarrow",
    strategy=None,
    payload_schema=None,
    **kwargs,
):
    """Exchange rows of ``ds`` so all rows with equal ``key`` are
    co-located, then apply ``fn`` to each co-located set. ``key`` should
    be a LOW-CARDINALITY bucket column (key%B) so ``fn`` receives coarse
    vectorizable groups.

    CONTRACT (hash path): ``fn`` receives one batch per PARTITION — the
    union of every bucket hashed to it, all rows of each bucket complete —
    not one batch per bucket value. Every engine kernel already treats its
    input as "a bag of rows containing complete key-groups" (lexsort /
    searchsorted on the true key), so per-bucket splitting (and therefore
    ANY sort in the exchange) is pure overhead; this is the entire point
    of the hash exchange. The sort fallback path keeps Ray's per-group
    invocation, which satisfies the same contract trivially.

    Robustness: Ray 2.49's hash shuffle mis-broadcasts schemas when the
    first shuffled block is empty (hash_shuffle.py:223 returns before the
    schema fan-out but the broadcast flag is still consumed), leaving
    genuinely-empty partitions as zero-column blocks. We therefore (a)
    never ask the aggregator to sort (sort=False — no sort key needed on
    a schema-less block), and (b) skip zero-row/zero-column batches in
    the wrapper; ``fn`` never sees them.

    ``payload_schema``: the pyarrow schema of the rows being exchanged,
    when the call site statically knows it (every engine bucketer builds
    its table explicitly). Feeds the sort-vs-hash width heuristic
    (``choose_strategy``); ignored when ``strategy=`` or the
    ``OSM_RAY_EXCHANGE`` override picks for it."""
    strategy = resolve_strategy(strategy, payload_schema, ds)
    if strategy == "task":
        if kwargs or batch_format != "pyarrow":
            # the raw-task path concats shards and calls fn directly —
            # there is no map_batches underneath to honor these
            warnings.warn(
                "grouped_map(strategy='task') supports only "
                "batch_format='pyarrow' and ignores extra map_batches "
                f"kwargs ({sorted(kwargs)}); it also executes the "
                "upstream EAGERLY at construction time",
                stacklevel=2,
            )
        return _task_exchange(ds, key, fn, num_partitions)
    if strategy != "hash":
        return ds.groupby(key, num_partitions=num_partitions).map_groups(
            fn, batch_format=batch_format, **kwargs
        )

    _enable_hash(ds.context, num_partitions)
    shuffled = ds.repartition(num_partitions, keys=[key] if isinstance(key, str) else key)

    def apply_partition(batch):
        if batch.num_columns == 0 or batch.num_rows == 0:
            return
        yield fn(batch)

    return shuffled.map_batches(
        apply_partition, batch_size=None, batch_format=batch_format, **kwargs
    )


def _task_exchange(ds, key, fn, num_partitions):
    """Raw-task map/reduce hash exchange (strategy="task"): classic
    two-stage shuffle with PLAIN TASKS on both sides — no aggregator
    actors, no exchange-level sort, reduce parallelism = num_partitions
    regular tasks schedulable on every core.

    Map: one task per upstream block; splits the block by key%P with one
    argsort + P zero-copy takes; returns P shard tables (num_returns=P so
    each shard is an independent object the reduce side fetches directly).
    Reduce: one task per partition; concats its shards and applies ``fn``.

    The upstream is consumed via ``iter_internal_ref_bundles`` — map tasks
    launch as blocks stream out of the upstream executor, so upstream
    compute and the map side overlap; the reduce wave launches when the
    upstream is exhausted (an exchange is inherently a barrier). The
    result is re-wrapped with ``from_arrow_refs`` so downstream stages
    keep streaming. NOTE: construction is eager (the upstream executes
    when grouped_map is called, not at first downstream consumption)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    @ray.remote(num_returns=num_partitions)
    def _split(block):
        if block.num_columns == 0 or block.num_rows == 0:
            return tuple([None] * num_partitions) if num_partitions > 1 else None
        v = block.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        part = (v % num_partitions).astype(np.int64)
        order = np.argsort(part, kind="stable")
        sorted_parts = part[order]
        bounds = np.searchsorted(sorted_parts, np.arange(num_partitions + 1))
        out = []
        for p in range(num_partitions):
            sel = order[bounds[p] : bounds[p + 1]]
            out.append(block.take(pa.array(sel)) if len(sel) else None)
        return tuple(out) if num_partitions > 1 else out[0]

    @ray.remote(num_returns=2)
    def _reduce(*shards):
        tables = [s for s in shards if s is not None]
        if not tables:
            return None, 0
        t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        out = fn(t)
        return out, out.num_rows

    shard_refs = [[] for _ in range(num_partitions)]
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            refs = _split.remote(block_ref)
            if num_partitions == 1:
                refs = [refs]
            for p, r in enumerate(refs):
                shard_refs[p].append(r)

    results, counts = [], []
    for p in range(num_partitions):
        out_ref, n_ref = _reduce.remote(*shard_refs[p])
        results.append(out_ref)
        counts.append(n_ref)
    nrows = ray.get(counts)
    live = [r for r, n in zip(results, nrows) if n]
    if not live:
        # empty exchange: preserve emptiness without a schema guess
        return ray.data.from_items([]).map_batches(lambda b: b)
    return ray.data.from_arrow_refs(live)


def keyed_sum(ds, keys, sums, num_buckets=32, num_partitions=8):
    """Exact SUM over int64 group keys via ONE grouped_map exchange and a
    vectorized lexsort + ``np.add.reduceat`` fold — the drop-in
    replacement for ``ds.groupby(keys).aggregate(Sum(...), ...)`` on
    int64 keys. Motivation (measured, sf0.1/32 cpus): ray.data's
    two-key HashAggregate folded the 425 k-row encounter pair partials
    at ~50 k rows/s — 15.9 s of a 17.5 s pipeline; this fold does the
    identical arithmetic in ~0.2 s. Ray's hash aggregate walks rows
    through a per-key accumulator; this walks columns.

    ``keys``: list of int64 key column names. ``sums``: list of
    (value_col, alias) pairs, int64 values. Output columns: keys +
    aliases, one row per distinct key tuple. The bucket is a polynomial
    hash of the keys (collisions only co-locate extra groups — the
    grouped_map contract needs all-equal-keys-same-bucket, nothing
    more)."""
    import numpy as np
    import pyarrow as pa

    value_cols = [c for c, _a in sums]

    def bucketed(t: pa.Table) -> pa.Table:
        n = t.num_rows
        acc = np.zeros(n, dtype=np.int64)
        for k in keys:
            acc = acc * np.int64(1_000_003) + t.column(k).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        return t.append_column(
            "__ksbucket", pa.array((acc % num_buckets).astype(np.int32))
        )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            cols = {k: pa.array([], type=pa.int64()) for k in keys}
            for _c, a in sums:
                cols[a] = pa.array([], type=pa.int64())
            return pa.table(cols)
        karr = [
            g.column(k).to_numpy(zero_copy_only=False).astype(np.int64)
            for k in keys
        ]
        order = np.lexsort(tuple(reversed(karr)))
        karr = [k[order] for k in karr]
        first = np.zeros(len(order), dtype=bool)
        first[0] = True
        for k in karr:
            first[1:] |= k[1:] != k[:-1]
        ps = np.nonzero(first)[0]
        cols = {name: pa.array(k[ps]) for name, k in zip(keys, karr)}
        for c, a in sums:
            v = g.column(c).to_numpy(zero_copy_only=False).astype(np.int64)[order]
            cols[a] = pa.array(np.add.reduceat(v, ps))
        return pa.table(cols)

    schema = pa.schema(
        [(k, pa.int64()) for k in keys] + [(c, pa.int64()) for c in value_cols]
    )
    return grouped_map(
        ds.map_batches(bucketed, batch_format="pyarrow"),
        "__ksbucket",
        lambda g: fold(g.drop_columns(["__ksbucket"])),
        num_partitions=num_partitions,
        payload_schema=schema,
    )
