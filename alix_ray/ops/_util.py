"""Shared op utilities: broadcast-object worker cache and actor-pool
sizing (used by lm / dsir / reports — one definition, not three)."""

from __future__ import annotations

import ray

_BCAST_CACHE: dict[str, object] = {}


def broadcast_cached(ref: "ray.ObjectRef"):
    """Resolve a ``ray.put`` broadcast object once per worker process.

    The cache holds ONE object (cleared on key change): broadcast
    models are corpus-level state and workers serve one pipeline at a
    time — holding every historical model would leak worker heap."""
    key = ref.hex()
    obj = _BCAST_CACHE.get(key)
    if obj is None:
        _BCAST_CACHE.clear()
        obj = _BCAST_CACHE[key] = ray.get(ref)
    return obj


def default_concurrency(cap: int = 8, floor: int = 2) -> int:
    """Actor-pool size for per-doc Python stages: half the cluster
    CPUs, clamped — leaves headroom for the surrounding pipeline."""
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return max(floor, min(cap, ncpu // 2))
