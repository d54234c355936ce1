"""Inverted-index build (stages/invindex.py build_postings): planted
postings semantics (tf / first_pos / df), tokenizer parity with the
text-family oracles, parallelism invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _run(docs, **kw):
    import ray.data

    from osm_export_tool_python_ray.stages.invindex import build_postings

    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
            "text": pa.array([d[1] for d in docs], type=pa.string()),
        }
    )
    res = build_postings(ray.data.from_arrow(tbl), **kw).take_all()
    return sorted(
        (r["term"], r["doc_id"], r["tf"], r["first_pos"], r["df"]) for r in res
    )


class TestBuildPostings:
    def test_planted(self, ray_session):
        docs = [
            (1, "the cat sat on the mat"),
            (2, "The CAT!"),
            (3, ""),
        ]
        got = _run(docs, num_buckets=4, num_partitions=2)
        assert got == sorted(
            [
                ("the", 1, 2, 1, 2), ("the", 2, 1, 1, 2),
                ("cat", 1, 1, 2, 2), ("cat", 2, 1, 2, 2),
                ("sat", 1, 1, 3, 1), ("on", 1, 1, 4, 1),
                ("mat", 1, 1, 6, 1),
            ]
        )

    @staticmethod
    def _brute(docs):
        import re

        pat = re.compile(r"[a-z0-9]+")
        pd = {}
        for doc_id, text in docs:
            for i, tok in enumerate(pat.findall(text.lower()), 1):
                k = (tok, doc_id)
                if k in pd:
                    pd[k][0] += 1
                else:
                    pd[k] = [1, i]
        df = {}
        for (t, _d) in pd:
            df[t] = df.get(t, 0) + 1
        return sorted(
            (t, d, tf, fp, df[t]) for (t, d), (tf, fp) in pd.items()
        )

    @pytest.mark.parametrize("seed", [6, 41])
    def test_matches_bruteforce(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        vocab = ["w%d" % i for i in range(30)]
        docs = [
            (i, " ".join(vocab[j] for j in rng.randint(0, 30, size=rng.randint(0, 40))))
            for i in range(120)
        ]
        assert _run(docs, num_buckets=8, num_partitions=4) == self._brute(docs)

    def test_parallelism_invariant(self, ray_session):
        rng = np.random.RandomState(9)
        docs = [
            (i, " ".join("t%d" % j for j in rng.randint(0, 50, size=25)))
            for i in range(300)
        ]
        assert _run(docs, num_buckets=2, num_partitions=1) == _run(
            docs, num_buckets=32, num_partitions=8
        )
