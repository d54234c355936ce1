"""Per-operator wall-time profile of the export pipeline — the feedback
loop for "iterate until wall-time is dominated by useful compute".

    python tools/profile_stages.py [corpus_parquet] [num_cpus]

Prints each Ray Data operator's wall time and task counts from
``ds.stats()`` plus the total, sorted by cost. Run EXCLUSIVELY (no other
load) — see .claude/skills/verify SKILL gotchas.
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_corpus/corpus_s1024_d4.parquet"
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import logging

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data

    from osm_export_tool_python_ray.mapping import Mapping
    from osm_export_tool_python_ray.pipelines.export import run_export

    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "osm_export_tool_python_ray", "mappings", "default.yml")
    ) as f:
        mapping = Mapping(f.read())

    # warm + probe the ReadParquet SplitBlocks factor so 32 means 32
    # blocks on any corpus size (see bench.py read_corpus / BASELINE.md)
    probe = ray.data.read_parquet(corpus, override_num_blocks=32).materialize()
    split_factor = max(1, probe.num_blocks() // 32)
    del probe
    docs = ray.data.read_parquet(corpus, override_num_blocks=max(1, 32 // split_factor))
    t0 = time.perf_counter()
    themed = run_export(
        docs, mapping, num_partitions=32, num_buckets=128, include_tiles=True
    ).materialize()
    total = time.perf_counter() - t0
    print("export total: %.2fs  rows: %d  (%d cpus, %s)" % (total, themed.count(), ncpu, corpus))

    ops = []
    for line in themed.stats().splitlines():
        m = re.match(r"Operator (\d+) (.+?): (?:(\d+) tasks executed, (\d+) blocks produced in|executed in) ([\d.]+)s", line.strip())
        if m:
            ops.append((float(m.group(5)), m.group(2)[:80], m.group(3) or "-", m.group(4) or "-"))
    seen = set()
    print("%8s  %6s  %6s  %s" % ("wall_s", "tasks", "blocks", "operator"))
    for wall, name, tasks, blocks in sorted(set(ops), reverse=True):
        key = (wall, name)
        if key in seen:
            continue
        seen.add(key)
        print("%8.2f  %6s  %6s  %s" % (wall, tasks, blocks, name))
    ray.shutdown()


if __name__ == "__main__":
    main()
