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

Measured A/B on the 24,576-shard corpus at 32 cpus (round 3): the hash
exchange is ~2x FASTER for light-payload exchanges (tile assignment:
6-7s vs 10-13s — rows are a key plus a couple of ids) and ~2x SLOWER
for the export's heavy nested-payload exchanges (export 87-126s vs
49-65s — map<>/list<> columns make the per-shard actor-call
serialization and the 8-actor serial concat the bottleneck, and actor
pool startup adds ~2s per exchange that small pipelines never
amortize). Hence: default ``sort``, ``strategy="hash"`` at the
light-payload call sites (tiling), and the whole suite passes under
either strategy (set ``OSM_RAY_EXCHANGE=hash`` to run everything on
hash).

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
* Row order within a group is arrival order (nondeterministic); every
  kernel passed to ``grouped_map`` must impose its own total order, which
  all engine kernels already do (two-parallelism determinism tests pin
  this).

``OSM_RAY_EXCHANGE=sort`` reverts every call site to the sort-based
exchange (A/B lever; also the fallback if a Ray version regresses hash
shuffle).
"""

import os

from ray.data.context import ShuffleStrategy

_STRATEGY = os.environ.get("OSM_RAY_EXCHANGE", "sort")

# token CPU reservation per partition for shuffle/aggregate actor pools;
# keeps N concurrent exchanges schedulable on a small cluster while the
# OS multiplexes the (tiny) concat work
_AGG_CPUS_PER_PARTITION = 0.02


def exchange_strategy():
    return _STRATEGY


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


def grouped_map(ds, key, fn, *, num_partitions, batch_format="pyarrow", strategy=None, **kwargs):
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
    the wrapper; ``fn`` never sees them."""
    strategy = strategy or _STRATEGY
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
