"""Distributed ordered prefix-scan (stages/scan.py) and the
pack_assignment query: planted boundary cases, many-block/gapped-id
differential vs numpy cumsum, and DuckDB oracle parity."""

import numpy as np
import pyarrow as pa
import pytest


class TestOrderedPrefixScan:
    def test_matches_numpy_many_blocks_gapped_ids(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.scan import ordered_prefix_scan

        rng = np.random.default_rng(17)
        # non-dense, shuffled order ids with large gaps (sparse buckets)
        ids = rng.choice(np.arange(0, 50_000, 7, dtype=np.int64), size=3000, replace=False)
        vals = rng.integers(0, 100, size=3000).astype(np.int64)
        t = pa.table({"oid": pa.array(ids), "v": pa.array(vals)})
        ds = ray.data.from_arrow(t).repartition(25)
        out = (
            ordered_prefix_scan(ds, order_col="oid", value_col="v", num_buckets=32)
            .to_pandas()
            .sort_values("oid")
            .reset_index(drop=True)
        )
        order = np.argsort(ids)
        want = np.cumsum(vals[order]) - vals[order]
        assert len(out) == 3000
        assert list(out["cum_excl"]) == want.tolist()
        assert list(out["oid"]) == ids[order].tolist()

    def test_empty(self, ray_session):
        import ray.data

        from osm_export_tool_python_ray.stages.scan import ordered_prefix_scan

        t = pa.table(
            {"oid": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
        )
        out = ordered_prefix_scan(
            ray.data.from_arrow(t), order_col="oid", value_col="v"
        ).take_all()
        assert out == []


class TestPackAssignment:
    def _sf(self, tmp_path, texts):
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        d = tmp_path / "sf_pack"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        return str(d)

    def test_planted_budget_boundary(self, ray_session, tmp_path):
        from osm_export_tool_python_ray.pipelines.queries import QUERIES

        # token counts 2000, 100, 2000, 1: cum_excl 0, 2000, 2100, 4100
        # -> packs 0, 0, 1, 2
        texts = [
            " ".join(["w"] * 2000),
            " ".join(["w"] * 100),
            " ".join(["w"] * 2000),
            "w",
        ]
        out = (
            QUERIES["pack_assignment"](self._sf(tmp_path, texts))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["n_tokens"]) == [2000, 100, 2000, 1]
        assert list(out["pack_id"]) == [0, 0, 1, 2]

    def test_oracle_parity(self, ray_session, tmp_path):
        import duckdb

        from osm_export_tool_python_ray.pipelines.queries import ORACLES, QUERIES

        rng = np.random.default_rng(23)
        texts = [" ".join(["t"] * int(rng.integers(0, 700))) for _ in range(300)]
        sf = self._sf(tmp_path, texts)
        res = QUERIES["pack_assignment"](sf).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('%s/documents.parquet')"
            % sf
        )
        ora = con.execute(ORACLES["pack_assignment"]).df()
        rc = sorted(res.columns)
        a = res[rc].sort_values(rc).reset_index(drop=True)
        b = ora[rc].sort_values(rc).reset_index(drop=True)
        assert a.shape == b.shape
        for c in rc:
            assert a[c].astype(str).equals(b[c].astype(str)), c

    def test_negative_and_huge_ids(self, ray_session):
        """Negative order ids and hash-scale magnitudes must scan exactly
        (the naive o*B//span bucketing would wrap/overflow silently)."""
        import ray.data

        from osm_export_tool_python_ray.stages.scan import ordered_prefix_scan

        ids = np.array([-50_000, -3, 0, 7, 2**40, 2**40 + 12], dtype=np.int64)
        vals = np.array([5, 7, 11, 13, 17, 19], dtype=np.int64)
        t = pa.table({"oid": pa.array(ids), "v": pa.array(vals)})
        out = (
            ordered_prefix_scan(
                ray.data.from_arrow(t).repartition(3), order_col="oid", value_col="v",
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("oid")
            .reset_index(drop=True)
        )
        assert list(out["cum_excl"]) == [0, 5, 12, 23, 36, 53]


class TestGroupNtile:
    """Exact distributed NTILE (stages/scan.py group_ntile): brute-force
    differential against the SQL-standard tile formula, small-group edge
    cases, parallelism invariance."""

    @staticmethod
    def _brute(rows, ntiles=10):
        from collections import defaultdict

        groups = defaultdict(list)
        for eid, et, v in rows:
            groups[et].append((int(np.floor(v * 100 + 0.5)), eid))
        out = {}
        for et, items in groups.items():
            items.sort()
            tot = len(items)
            size_small, n_big = tot // ntiles, tot % ntiles
            for rank0, (_vm, eid) in enumerate(items):
                big_span = n_big * (size_small + 1)
                if rank0 < big_span:
                    tile = rank0 // (size_small + 1)
                else:
                    tile = n_big + (rank0 - big_span) // size_small
                out[(eid, et)] = tile + 1
        return out

    @staticmethod
    def _run(rows, **kw):
        import ray.data

        from osm_export_tool_python_ray.stages.scan import group_ntile

        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[1] for r in rows], type=pa.string()),
                "value": pa.array([r[2] for r in rows], type=pa.float64()),
            }
        )
        out = group_ntile(ray.data.from_arrow(t).repartition(4), **kw).take_all()
        return {(r["event_id"], r["event_type"]): r["tile"] for r in out}

    def test_brute_formula_matches_duckdb(self):
        # pin the tile formula itself against DuckDB's NTILE
        import duckdb

        rows = [(i, "t", float(i % 7)) for i in range(23)]
        want = dict(
            duckdb.sql(
                "SELECT event_id, ntile(10) OVER (ORDER BY "
                "CAST(floor(value*100+0.5) AS BIGINT), event_id) "
                "FROM (SELECT UNNEST(range(23)) AS event_id, "
                "CAST(UNNEST(range(23)) % 7 AS DOUBLE) AS value)"
            ).fetchall()
        )
        got = self._brute([(r[0], "t", r[2]) for r in rows])
        assert {k[0]: v for k, v in got.items()} == want

    @pytest.mark.parametrize("seed", [3, 19])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        types = ["a", "b", "c"]
        rows = [
            (i, types[rng.randint(3)], float(rng.randint(0, 500)) / 100.0)
            for i in range(800)
        ]
        assert self._run(rows, num_buckets=16, num_partitions=4) == self._brute(rows)

    def test_small_groups(self, ray_session):
        # groups smaller than ntiles: tiles 1..count, one row each
        rows = [(1, "x", 3.0), (2, "x", 1.0), (3, "x", 2.0), (4, "y", 9.9)]
        got = self._run(rows, num_buckets=4, num_partitions=2)
        assert got == {(2, "x"): 1, (3, "x"): 2, (1, "x"): 3, (4, "y"): 1}

    def test_parallelism_determinism(self, ray_session):
        rng = np.random.RandomState(7)
        rows = [
            (i, "ab"[rng.randint(2)], float(rng.randint(0, 50)) / 100.0)
            for i in range(300)
        ]
        a = self._run(rows, num_buckets=2, num_partitions=1)
        b = self._run(rows, num_buckets=32, num_partitions=8)
        assert a == b
