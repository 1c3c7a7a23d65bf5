"""Pipeline metrics as a named Ray counter actor.

A streaming pipeline cannot re-execute just to count intermediate rows, so
stages increment a shared counter actor per batch (one tiny RPC per batch,
amortized over thousands of rows).  The driver drains the counters into the
checkpoint manifest (match-count metrics per partition, BASELINE.json:14).
"""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counters = defaultdict(int)

    def add(self, key: str, value: int = 1):
        self.counters[key] += value

    def add_many(self, counters: dict):
        for k, v in counters.items():
            self.counters[k] += v

    def get_all(self) -> dict:
        return dict(self.counters)

    def reset(self):
        self.counters.clear()


def get_metrics_actor(name: str = "nm_ray_metrics"):
    """Get-or-create the session-wide metrics actor.

    Detached lifetime: a reference-counted named actor dies the moment its
    last handle is dropped, racing the next ``get_if_exists`` (observed as
    ActorDiedError between two checkpointed runs in one session).  The actor
    is tiny (a Counter, num_cpus=0) and dies with the Ray session.
    """
    return MetricsActor.options(
        name=name, get_if_exists=True, lifetime="detached"
    ).remote()


def add_sync(counters: dict, name: str = "nm_ray_metrics"):
    """Add counters and BLOCK until the actor has applied them.

    Fire-and-forget ``add.remote()`` from a map task races the driver's
    post-execution ``get_all()``: the task can finish (and the pipeline with
    it) while its add is still in the actor's mailbox, silently
    under-reporting the very counters that exist to avoid silent caps.  One
    extra RPC round-trip per task/group is noise next to the work done there.
    """
    ray.get(get_metrics_actor(name).add_many.remote(dict(counters)))
