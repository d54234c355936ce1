"""Silent-cap surfacing: a tiny named counter actor.

Stages that bound their work (hot-band group caps, degenerate-gram caps,
hot-tile truncation) must not truncate SILENTLY — "covered everything"
must be distinguishable from "covered everything below the cap". Worker
tasks report cap events here fire-and-forget; `bench.py` (and any driver)
snapshots the counters per pipeline and emits them next to the timings.

Cost model: the actor is contacted ONLY when a cap actually fires
(`skipped > 0`), so the hot path pays nothing in the common case. The
actor reserves zero CPUs and holds a dict — at 100 TB scale the report
traffic is proportional to the number of capped groups, not to data.
"""

import ray


@ray.remote(num_cpus=0)
class _CapCounterActor:
    def __init__(self):
        self._counts = {}

    def add(self, name, k):
        self._counts[name] = self._counts.get(name, 0) + int(k)

    def snapshot(self):
        return dict(self._counts)

    def snapshot_and_reset(self):
        out, self._counts = self._counts, {}
        return out


_NAME = "osm_ray_cap_counter"


def cap_counter():
    """Named per-cluster counter actor (created on first use)."""
    return _CapCounterActor.options(name=_NAME, get_if_exists=True).remote()


def report_cap(name, k):
    """Fire-and-forget cap report from a worker task; never raises."""
    if not k:
        return
    try:
        cap_counter().add.remote(name, int(k))
    except Exception:
        pass  # metrics must never fail the pipeline


def snapshot_caps(reset=True):
    """Driver-side: fetch (and by default reset) all cap counters."""
    try:
        a = cap_counter()
        return ray.get(a.snapshot_and_reset.remote() if reset else a.snapshot.remote())
    except Exception:
        return {}
