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

# per-process handle cache. The actor is DETACHED: a non-detached named
# actor dies as soon as its last handle is garbage-collected, so a
# driver that called snapshot_caps() and dropped the handle silently
# killed the counter — the next worker's get_if_exists then created a
# REPLACEMENT owned by that short-lived worker, and every count reported
# to it died with the worker (lost caps, observed round 4). Detached =
# owned by the cluster (GCS), killed only by ray.shutdown()/kill.
_HANDLE = None


def cap_counter():
    """Named per-cluster counter actor (created detached on first use)."""
    global _HANDLE
    if _HANDLE is None:
        _HANDLE = _CapCounterActor.options(
            name=_NAME, get_if_exists=True, lifetime="detached"
        ).remote()
    return _HANDLE


def _reset_handle():
    global _HANDLE
    _HANDLE = None


def report_cap(name, k):
    """Fire-and-forget cap report from a worker task; never raises."""
    if not k:
        return
    try:
        cap_counter().add.remote(name, int(k))
    except Exception:
        # stale cached handle (e.g. ray re-inited in-process) — retry once
        _reset_handle()
        try:
            cap_counter().add.remote(name, int(k))
        except Exception:
            pass  # metrics must never fail the pipeline


def snapshot_caps(reset=True):
    """Driver-side: fetch (and by default reset) all cap counters."""
    for _ in range(2):
        try:
            a = cap_counter()
            return ray.get(
                a.snapshot_and_reset.remote() if reset else a.snapshot.remote()
            )
        except Exception:
            _reset_handle()
    return {}
