"""Autoscaling actor-pool sizing for stateful map_batches stages.

Round-2 review flagged ~19 stages hardcoded to ``concurrency=2``: at 32
CPUs those stages ran 2-wide regardless of cluster size — a config
ceiling that turns into a hard throughput cap at 100 TB. These classes
are actors only to cache cheap per-actor state (compiled regexes,
broadcast ``ray.get`` results, hash tables), so the pool should scale
with the cluster: Ray Data autoscales an actor pool between
``(min, max)`` based on queued blocks, and idle actors cost nothing but
a process. ``auto_pool()`` returns ``(min, cluster CPUs)`` so a stage
can occupy the whole node (or the whole cluster on multi-node) when it
is the bottleneck, while small inputs keep spawning just ``min``.
"""

from __future__ import annotations

from typing import Tuple


def ncpus(default: int = 8) -> int:
    """Cluster CPU count (falls back when Ray isn't initialised yet)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def auto_pool(min_actors: int = 1, cap: int | None = None) -> Tuple[int, int]:
    """(min, max) actor-pool size: max = cluster CPUs (optionally capped).

    Use as ``map_batches(Cls, concurrency=auto_pool(), ...)``.
    """
    n = ncpus()
    if cap is not None:
        n = min(n, cap)
    return (min_actors, max(min_actors, n))
