"""Small runtime-sizing helpers shared by actor-pool stages."""

from __future__ import annotations

import ray


def cap_actor_pool(requested: int, floor: int = 2) -> int:
    """Cap a CPU-reserving actor pool so it can never starve the map tasks
    of the same session (pool ≤ half the cluster CPUs, ≥ ``floor``).
    Pool size must only affect state placement, never results — callers
    assert that property in their docstrings."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(floor, min(requested, cpus // 2))
