"""Order-independent table checksums (stages/integrity.py): digest
invariance under permutation/repartition, sensitivity to any row edit,
multi-table labeling, hash parity with hashlib."""

import hashlib

import numpy as np
import pyarrow as pa


P61 = (1 << 61) - 1


def _digest(rows):
    """Brute-force reference: rows = list of canonical row strings."""
    s = 0
    for r in rows:
        s += int.from_bytes(hashlib.md5(r.encode()).digest()[:8], "little")
    return s % P61


def _run(named, **kw):
    import ray.data

    from osm_export_tool_python_ray.stages.integrity import table_checksums

    res = table_checksums(
        [(lbl, ray.data.from_arrow(t), cols) for lbl, t, cols in named], **kw
    ).take_all()
    return {r["tbl"]: (r["n_rows"], r["checksum"]) for r in res}


def _tbl(ids, names):
    return pa.table(
        {"id": pa.array(ids, type=pa.int64()),
         "name": pa.array(names, type=pa.string())}
    )


class TestTableChecksums:
    def test_matches_bruteforce_and_labels(self, ray_session):
        a = _tbl([1, 2, 3], ["x", "y", "z"])
        b = _tbl([9, 8], ["p", "q"])
        got = _run([("a", a, ["id", "name"]), ("b", b, ["id", "name"])])
        assert got["a"] == (3, _digest(["1|x", "2|y", "3|z"]))
        assert got["b"] == (2, _digest(["9|p", "8|q"]))

    def test_order_and_parallelism_invariant(self, ray_session):
        rng = np.random.RandomState(4)
        ids = list(rng.randint(0, 10**9, size=3000))
        names = ["n%d" % (i % 37) for i in range(3000)]
        t1 = _tbl(ids, names)
        perm = list(rng.permutation(3000))
        t2 = _tbl([ids[i] for i in perm], [names[i] for i in perm])
        one = _run([("t", t1, ["id", "name"])], num_partitions=1)
        many = _run([("t", t2, ["id", "name"])], num_partitions=8)
        assert one == many

    def test_detects_single_row_edit(self, ray_session):
        ids = list(range(500))
        names = ["v"] * 500
        base = _run([("t", _tbl(ids, names), ["id", "name"])])
        names2 = list(names)
        names2[250] = "w"
        edited = _run([("t", _tbl(ids, names2), ["id", "name"])])
        assert base["t"][0] == edited["t"][0]  # same row count
        assert base["t"][1] != edited["t"][1]  # different digest
