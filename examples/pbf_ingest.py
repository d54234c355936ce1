"""End-to-end native ``.osm.pbf`` ingest demo.

Builds a deterministic pbf from the synthetic corpus's elements (the
fixture writer), then runs the SAME flagship export pipeline a parquet
corpus would get — proving the reference tool's native input format
(`osm-export-tool planet.osm.pbf`) works end-to-end here:

    python examples/pbf_ingest.py

Scale shape: the driver indexes only blob headers; decode fans out one
Ray task per blob byte-range (a planet file yields thousands of units);
every downstream stage (dedup → assembly → theme routing → sinks) is
shared with the parquet path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
        include_dashboard=False,
    )

import pyarrow as pa  # noqa: E402
import ray.data  # noqa: E402

from osm_export_tool_python_ray.mapping import Mapping  # noqa: E402
from osm_export_tool_python_ray.pipelines.export import (  # noqa: E402
    parse_elements,
    run_export,
    theme_counts,
)
from osm_export_tool_python_ray.sources.corpus import (  # noqa: E402
    write_corpus_parquet,
)
from osm_export_tool_python_ray.sources.pbf import (  # noqa: E402
    read_osm_pbf,
    scan_blob_ranges,
    write_osm_pbf,
)

CORPUS = "/tmp/pbf_demo_corpus.parquet"
PBF = "/tmp/pbf_demo.osm.pbf"

if not os.path.exists(CORPUS):
    write_corpus_parquet(CORPUS, n_shards=4)
if not os.path.exists(PBF):
    etab = pa.concat_tables(
        list(
            parse_elements(ray.data.read_parquet(CORPUS)).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    write_osm_pbf(PBF, etab.sort_by([("ekey", "ascending")]), max_group=500)

blobs = scan_blob_ranges(PBF)
print(
    "pbf: %d blobs (%d OSMData), %.1f KB"
    % (
        len(blobs),
        sum(1 for b in blobs if b[0] == "OSMData"),
        os.path.getsize(PBF) / 1024,
    )
)

with open(
    os.path.join(
        os.path.dirname(__file__),
        "..",
        "osm_export_tool_python_ray",
        "mappings",
        "default.yml",
    )
) as f:
    mapping = Mapping(f.read())

t0 = time.time()
themed = run_export(None, mapping, elements_ds=read_osm_pbf(PBF))
counts = theme_counts(themed).to_pandas()
print("export over .osm.pbf took %.2fs" % (time.time() - t0))
print(counts.sort_values(["theme", "geom_type"]).to_string(index=False))

ray.shutdown()
