"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and diff against its oracle_sql() via DuckDB
(row count + sorted-column value comparison). Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result):
    import ray.data
    import pyarrow as pa

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) in ("int32", "int16", "int8"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    import logging

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')" % (t, sf_dir, t)
        )

    import __ray_entry__ as entrymod

    from osm_export_tool_python_ray.state.metrics import snapshot_caps

    # caps whose truncation the oracle SQL does NOT model: if one fires
    # during an oracle run, the engine result is approximate while the
    # SQL is exact, so the row is a latent mismatch even when it happens
    # to pass — fail loudly instead (ADVICE r4: link_scores undercount).
    # Every generation cap with an oracle twin is MODELED in its SQL
    # since round 5 (tfidf hot postings, link/triangle wedge caps) — the
    # gate stays for any future cap that is not; names are matched by
    # prefix so e.g. a new *_truncated cap fails closed until modeled.
    UNMODELED_CAPS = ()
    # caps whose truncation IS reproduced by the oracle SQL (or whose
    # query has no oracle) — exempt from the fail-closed rule
    MODELED_CAPS = {
        "tfidf_cosine_hot_terms_skipped",
        "link_wedge_truncated",
        "triangle_wedge_truncated",
        # group caps asserted/modeled in their oracles since r3/r4:
        "encounter_group_truncated",
        "minhash_hot_band_groups_skipped",
        "simhash_hot_band_groups_skipped",
        "embedding_hot_bucket_groups_skipped",
        "ngram_degenerate_grams_skipped",
        "editdist_variant_group_truncated",
        "hausdorff_bucket_truncated",
        "crossing_cell_truncated",
        "source_overlap_token_truncated",
        "gap_fill_span_truncated",
        "interval_epoch_truncated",
        "rect_width_truncated",
        "spatial_join_hot_cells_skipped",
    }

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    snapshot_caps(reset=True)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print("%-24s ERROR %s: %s" % (name, type(e).__name__, e))
            failures.append(name)
            continue
        caps = snapshot_caps(reset=True)
        hit = {
            k: v
            for k, v in caps.items()
            if k in UNMODELED_CAPS
            or (k.endswith("_truncated") and k not in MODELED_CAPS)
            or (k.endswith("_skipped") and k not in MODELED_CAPS)
        }
        if hit:
            print("%-24s CAP-HIT (oracle not exact): %r" % (name, hit))
            failures.append(name)
            continue
        if name not in oracles:
            print("%-24s rows-only: %d rows, cols=%s" % (name, len(mine), list(mine.columns)))
            continue
        theirs = normalize(con.execute(oracles[name]).df())
        status = []
        if list(mine.columns) != list(theirs.columns):
            status.append("SCHEMA mine=%s oracle=%s" % (list(mine.columns), list(theirs.columns)))
        if len(mine) != len(theirs):
            status.append("ROWS mine=%d oracle=%d" % (len(mine), len(theirs)))
        if not status:
            try:
                pd.testing.assert_frame_equal(mine, theirs, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            except AssertionError as e:
                status.append("VALUES %s" % str(e).split("\n")[0])
        if status:
            print("%-24s MISMATCH: %s" % (name, "; ".join(status)))
            failures.append(name)
        else:
            print("%-24s OK (%d rows)" % (name, len(mine)))
    ray.shutdown()
    if failures:
        print("\nFAILED:", failures)
        sys.exit(1)
    print("\nall oracle checks passed")


if __name__ == "__main__":
    main()
