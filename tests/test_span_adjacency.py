"""span_adjacency: the interleaved-corpus span-order invariant as a
query — verified against a pure-Python re-derivation over the same
table, plus an order-sensitivity check (a swapped span pair changes the
transition counts) and parallelism determinism."""

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.pipelines.queries import span_adjacency
from osm_export_tool_python_ray.sources.corpus import generate_corpus_table


def _brute(table):
    want = {}
    doc_spans = table.column("spans").to_pylist()
    for spans in doc_spans:
        spans = sorted(spans, key=lambda s: s["offset"])
        for a, b in zip(spans, spans[1:]):
            k = (a["kind"], b["kind"])
            n, g = want.get(k, (0, 0))
            want[k] = (n + 1, g + (b["offset"] - a["offset"]))
    return want


def _run(t, blocks=4):
    import ray.data

    ds = ray.data.from_arrow(t).repartition(blocks)
    out = span_adjacency(ds).take_all()
    return {(r["kind_a"], r["kind_b"]): (r["n"], r["gap_sum"]) for r in out}


class TestSpanAdjacency:
    def test_matches_brute_on_corpus(self, ray_session):
        t = generate_corpus_table(n_shards=2)
        got = _run(t)
        want = _brute(t)
        assert got == want
        assert len(got) >= 3  # several kind transitions present

    def test_order_sensitivity(self, ray_session):
        # swapping two adjacent spans of different kinds changes the
        # transition counts — the invariant the query is built to catch
        spans = [
            {"kind": "text", "text": "a", "media_ref": "", "offset": 0},
            {"kind": "osm", "text": "{}", "media_ref": "", "offset": 5},
            {"kind": "tile", "text": "", "media_ref": "1/2/3", "offset": 9},
        ]
        swapped = [spans[0], dict(spans[2], offset=5), dict(spans[1], offset=9)]
        mk = lambda s: pa.table(
            {
                "doc_id": pa.array(["d"]),
                "spans": pa.array([s]),
            }
        )
        a = _run(mk(spans), blocks=1)
        b = _run(mk(swapped), blocks=1)
        assert a != b
        assert a[("text", "osm")] == (1, 5)
        assert b[("text", "tile")] == (1, 5)

    def test_parallelism_determinism(self, ray_session):
        t = generate_corpus_table(n_shards=3)
        assert _run(t, blocks=1) == _run(t, blocks=9)
