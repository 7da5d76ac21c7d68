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


def smallest_id_rows(ds, n: int, id_col: str, vec_col: str):
    """The ``n`` smallest-id vectors of an embedding Dataset as a
    float64 matrix, WITHOUT sorting the corpus: every batch forwards
    its local n smallest (tiny), a distributed ``sort(id).limit(n)``
    over that slim candidate set reduces to the global n, and ONLY
    those n rows reach the driver — never the O(n_batches·n)
    candidate pool.  Shared by k-means seeding and PQ
    training-sample selection."""
    import numpy as np
    import pyarrow.compute as pc

    def local_n(batch):
        idx = pc.sort_indices(batch, sort_keys=[(id_col, "ascending")])
        return batch.take(idx[:n]).select([id_col, vec_col])

    cand = ds.map_batches(local_n, batch_format="pyarrow")
    rows = cand.sort(id_col).limit(n).take_all()
    return np.asarray([r[vec_col] for r in rows], np.float64)
