import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def host_slowdown():
    """Multiplier for wall-clock guard limits: this VM's memory bandwidth
    swings >20× with hypervisor neighbors (BASELINE.md's documented host
    phases). The guards exist to catch QUADRATIC blowups (100-1000×), not
    to measure the box, so scale their limits by a one-shot measured
    slowdown vs a nominal healthy copy rate."""
    import time

    import numpy as np

    a = np.zeros(20_000_000, dtype=np.float64)  # 160 MB
    t0 = time.perf_counter()
    for _ in range(3):
        a = a.copy()
    sec = time.perf_counter() - t0
    nominal = 0.15  # ~3 GB/s effective copy (read+write) on a healthy box
    return max(1.0, sec / nominal)
