"""Small shared helpers."""

from __future__ import annotations


def default_pool(lo: int = 1, floor: int = 8) -> tuple[int, int]:
    """Actor-pool ``concurrency`` that follows the cluster.

    ``(1, max(floor, CPUs))`` — the min stays 1 (a min >= 2 can deadlock a
    4-cpu test session; see CLAUDE.md), the max tracks the cluster so a
    32-core node isn't capped at 8 actors.  Falls back to ``floor`` when Ray
    isn't initialized (pure-library use).
    """
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", floor))
            return (lo, max(floor, ncpu))
    except Exception:
        pass
    return (lo, floor)
