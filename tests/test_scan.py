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
