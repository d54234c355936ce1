"""OLAP grouping-set operators over the event stream — the two classic
"slice every way at once" shapes a corpus-audit dashboard needs:

- ``cube_rollup``: GROUP BY CUBE(event_type, hour-of-day, cell) — all
  2^3 grouping sets of the three dimensions in ONE pass over the data,
  with sentinel values (``'*'`` / ``-1``) marking the rolled-up axes.
- ``skyline``: group-wise Pareto frontier — per day-of-week, the users
  not dominated on (event count, total spend): the multi-objective
  "best users" primitive (BNL/SFS skyline, Börzsönyi et al. ICDE 2001)
  that no single ORDER BY can express.

Scale shape: both operators reduce events inside ``map_batches`` to
partial aggregate rows BEFORE any exchange — the raw stream is touched
exactly once. ``cube_rollup`` then runs two keyed exchanges that move
only aggregate-cardinality rows: finest-key finalize (bounded by
|event_types| x 24 x |cells|), an 8-way grouping-set projection of that
small table, and a projected-key finalize. ``skyline`` finalizes the
per-(user, dow) aggregate under one keyed exchange, takes the
PARTITION-LOCAL frontier with a vectorized sort-sweep (a global frontier
point is always in every local frontier of a subset containing it, so
local pruning is lossless), and merges the tiny survivor sets with one
final dow-keyed sweep — the standard two-phase distributed skyline.

Determinism contracts (oracle-exact, pipelines/queries.py): the float
``value`` column is quantized to int64 cents (floor(v*100 + 0.5)) BEFORE
summation on both the engine and SQL sides, so all sums are
summation-order independent; the skyline dominance test is pure int64.

No reference analog — engine mandate (OLAP/analytics family).
"""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.stages.exchange import grouped_map
from osm_export_tool_python_ray.stages.temporal import _ts_i64
from osm_export_tool_python_ray.functions.text import hash_strings_128

_I64_MIN = np.iinfo(np.int64).min

HOUR_US = np.int64(3_600_000_000)
DAY_US = np.int64(86_400_000_000)


def _cents(val_col):
    """floor(value*100 + 0.5) as int64 — the engine's quantize-then-sum
    rule; matches CAST(floor(value*100+0.5) AS BIGINT) verbatim."""
    v = val_col.to_numpy(zero_copy_only=False)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def _finest_partial(t: pa.Table, cell_div, num_buckets) -> pa.Table:
    """Per-batch partial aggregate at the finest (et, hod, cell) grain."""
    if not t.num_rows:
        return pa.table(
            {
                "et": pa.array([], type=pa.string()),
                "hod": pa.array([], type=pa.int64()),
                "cell": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "sumv": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int32()),
            }
        )
    import pyarrow.compute as pc

    d = pc.dictionary_encode(t.column("event_type")).combine_chunks()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary
    ts = _ts_i64(t.column("ts"))
    hod = (ts // HOUR_US) % np.int64(24)
    eid = t.column("event_id").to_numpy(zero_copy_only=False)
    cell = (eid % 100) // cell_div
    vmic = _cents(t.column("value"))
    # finest key inside the batch: codes are batch-local but stable
    # within it, which is all a partial fold needs
    key = (codes * 24 + hod) * np.int64(100) + cell
    order = np.argsort(key, kind="stable")
    k = key[order]
    starts = np.nonzero(np.concatenate([[True], k[1:] != k[:-1]]))[0]
    n = np.diff(np.append(starts, len(k))).astype(np.int64)
    sumv = np.add.reduceat(vmic[order], starts)
    kc, kh, kcell = k // (24 * 100), (k // 100) % 24, k % 100
    et = vocab.take(pa.array(kc[starts]))
    hod_out, cell_out = kh[starts], kcell[starts]
    h1, _ = hash_strings_128(et)
    mixed = h1 ^ (hod_out * np.int64(1_000_003) + cell_out).astype(np.uint64)
    return pa.table(
        {
            "et": et,
            "hod": pa.array(hod_out),
            "cell": pa.array(cell_out),
            "n": pa.array(n),
            "sumv": pa.array(sumv),
            "bucket": pa.array((mixed % np.uint64(num_buckets)).astype(np.int32)),
        }
    )


def _sum_by_key(g: pa.Table) -> pa.Table:
    """Arrow group_by sum over (et, hod, cell); aggregate columns selected
    by their GENERATED names (never positionally — pyarrow's key-vs-
    aggregate column order is an implementation detail)."""
    agg = g.group_by(["et", "hod", "cell"]).aggregate([("n", "sum"), ("sumv", "sum")])
    return pa.table(
        {
            "et": agg.column("et"),
            "hod": agg.column("hod"),
            "cell": agg.column("cell"),
            "n": agg.column("n_sum"),
            "sumv": agg.column("sumv_sum"),
        }
    )


def cube_rollup(events_ds, cell_div=10, num_buckets=32, num_partitions=8):
    """GROUP BY CUBE(event_type, hour-of-day, cell) over the event
    stream: one row per (et, hod, cell) combination of every one of the
    2^3 grouping sets, with ``'*'`` / ``-1`` sentinels on rolled-up axes
    and (n, sumv) = (row count, int64-cent value sum).

    The raw stream is aggregated to the finest grain inside
    ``map_batches`` (one pass, combiner-shaped); the 8-way grouping-set
    expansion happens on the FINEST AGGREGATE table — bounded by the
    dimension-cardinality product, never by |events| — so the two keyed
    exchanges move only aggregate rows.

    No reference analog — engine mandate (OLAP family).
    """

    def partial(t: pa.Table) -> pa.Table:
        return _finest_partial(t, cell_div, num_buckets)

    def expand_sets(g: pa.Table) -> pa.Table:
        """Finalize the finest keys of this bucket, project each finest
        row into all 8 grouping sets, pre-combine locally, and re-bucket
        on the projected key."""
        fin = _sum_by_key(g)
        if not fin.num_rows:
            return fin.append_column("bucket", pa.array([], type=pa.int32()))
        star = pa.array(np.full(fin.num_rows, "*"), type=pa.string())
        neg1 = pa.array(np.full(fin.num_rows, -1, dtype=np.int64))
        pieces = []
        for mask in range(8):
            pieces.append(
                pa.table(
                    {
                        "et": star if mask & 4 else fin.column("et"),
                        "hod": neg1 if mask & 2 else fin.column("hod"),
                        "cell": neg1 if mask & 1 else fin.column("cell"),
                        "n": fin.column("n"),
                        "sumv": fin.column("sumv"),
                    }
                )
            )
        proj = _sum_by_key(pa.concat_tables(pieces))
        h1, _ = hash_strings_128(proj.column("et"))
        hod = proj.column("hod").to_numpy(zero_copy_only=False)
        cell = proj.column("cell").to_numpy(zero_copy_only=False)
        mixed = h1 ^ (hod * np.int64(1_000_003) + cell).astype(np.uint64)
        return proj.append_column(
            "bucket", pa.array((mixed % np.uint64(num_buckets)).astype(np.int32))
        )

    PAYLOAD = pa.schema(
        [
            ("et", pa.string()),
            ("hod", pa.int64()),
            ("cell", pa.int64()),
            ("n", pa.int64()),
            ("sumv", pa.int64()),
        ]
    )
    finest = grouped_map(
        events_ds.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        lambda g: expand_sets(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=PAYLOAD,
    )
    return grouped_map(
        finest,
        "bucket",
        lambda g: _sum_by_key(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=PAYLOAD,
    )


def _frontier_sweep(dow, user, x, y):
    """Vectorized per-dow Pareto frontier (maximize x then y): sort each
    dow segment by (x desc, y desc); a row survives iff its y equals the
    max y of its x-group AND strictly exceeds the best y of every
    strictly-greater x-group. Duplicate (x, y) points on the frontier all
    survive (neither strictly dominates the other). The per-dow loop is
    over day-of-week — cardinality 7 by construction, not data-sized."""
    keep = np.zeros(len(dow), dtype=bool)
    order = np.lexsort((-y, -x, dow))
    d, xs, ys = dow[order], x[order], y[order]
    seg = np.nonzero(np.concatenate([[True], d[1:] != d[:-1]]))[0]
    for s, e in zip(seg, np.append(seg[1:], len(d))):
        xg, yg = xs[s:e], ys[s:e]
        new_x = np.concatenate([[True], xg[1:] != xg[:-1]])
        gidx = np.cumsum(new_x) - 1
        besty = yg[new_x]  # first row of each x-group = max y (sorted desc)
        prevmax = np.maximum.accumulate(
            np.concatenate([[_I64_MIN], besty[:-1]])
        )
        keep[order[s:e]] = (yg == besty[gidx]) & (yg > prevmax[gidx])
    return keep


def skyline(events_ds, num_buckets=32, num_partitions=8):
    """Group-wise Pareto frontier: per day-of-week, the users NOT
    dominated on (n_events, sumv) — user u is dominated if some v of the
    same dow has n_events >= and sumv >= with at least one strict.
    Returns (dow, user_id, n_events, sumv), one row per frontier point.

    Two-phase distributed skyline: per-(user, dow) aggregate finalized
    under one keyed exchange; the partition-LOCAL frontier sweep prunes
    to O(frontier) survivors (lossless — a globally non-dominated point
    is non-dominated in every subset); one final dow-keyed sweep merges.

    No reference analog — engine mandate (OLAP/analytics family).
    """

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    "dow": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "sumv": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = _ts_i64(t.column("ts"))
        dow = (ts // DAY_US) % np.int64(7)
        vmic = _cents(t.column("value"))
        key = u * 7 + dow
        order = np.argsort(key, kind="stable")
        k = key[order]
        starts = np.nonzero(np.concatenate([[True], k[1:] != k[:-1]]))[0]
        n = np.diff(np.append(starts, len(k))).astype(np.int64)
        sumv = np.add.reduceat(vmic[order], starts)
        ku, kd = k[starts] // 7, k[starts] % 7
        return pa.table(
            {
                "dow": pa.array(kd),
                "user_id": pa.array(ku),
                "n_events": pa.array(n),
                "sumv": pa.array(sumv),
                "bucket": pa.array(
                    ((ku * np.int64(1_000_003) + kd) % num_buckets).astype(np.int32)
                ),
            }
        )

    def local_frontier(g: pa.Table) -> pa.Table:
        """All partials of a (user, dow) land here together: finalize,
        then keep only this partition's per-dow frontier."""
        if not g.num_rows:
            return g
        agg = g.group_by(["dow", "user_id"]).aggregate(
            [("n_events", "sum"), ("sumv", "sum")]
        )
        dow = agg.column("dow").to_numpy(zero_copy_only=False)
        user = agg.column("user_id").to_numpy(zero_copy_only=False)
        x = agg.column("n_events_sum").to_numpy(zero_copy_only=False)
        y = agg.column("sumv_sum").to_numpy(zero_copy_only=False)
        keep = _frontier_sweep(dow, user, x, y)
        return pa.table(
            {
                "dow": pa.array(dow[keep]),
                "user_id": pa.array(user[keep]),
                "n_events": pa.array(x[keep]),
                "sumv": pa.array(y[keep]),
            }
        )

    def final_frontier(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return g
        dow = g.column("dow").to_numpy(zero_copy_only=False)
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        x = g.column("n_events").to_numpy(zero_copy_only=False)
        y = g.column("sumv").to_numpy(zero_copy_only=False)
        keep = _frontier_sweep(dow, user, x, y)
        return pa.table(
            {
                "dow": pa.array(dow[keep]),
                "user_id": pa.array(user[keep]),
                "n_events": pa.array(x[keep]),
                "sumv": pa.array(y[keep]),
            }
        )

    survivors = grouped_map(
        events_ds.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        lambda g: local_frontier(g.drop_columns(["bucket"])),
        num_partitions=num_partitions,
        payload_schema=pa.schema(
            [
                ("dow", pa.int64()),
                ("user_id", pa.int64()),
                ("n_events", pa.int64()),
                ("sumv", pa.int64()),
            ]
        ),
    )
    return grouped_map(
        survivors,
        "dow",
        final_frontier,
        num_partitions=min(num_partitions, 7),
        payload_schema=pa.schema(
            [("user_id", pa.int64()), ("n_events", pa.int64()), ("sumv", pa.int64())]
        ),
    )
