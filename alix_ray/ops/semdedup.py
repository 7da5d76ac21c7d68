"""Embedding-space corpus clustering + semantic dedup (SemDeDup).

Two operators a 100-TB curation pipeline runs between embedding
extraction and training-mix assembly:

* :func:`kmeans_assign` — fixed-iteration distributed Lloyd's k-means
  over an embedding column.  Each iteration is ONE streaming pass:
  centroids are broadcast once (``ray.put`` + per-worker cache), every
  batch emits SPARSE partial-sum rows (cluster, dim index, sum, count)
  — only for clusters actually present in the batch — and a
  distributed ``groupby(["cluster","dim"]).sum()`` pre-reduces them so
  the driver folds EXACTLY ≤ k·dim rows into the next centroid set.
  O(k·dim) driver state end to end, one slim aggregate shuffle over
  partial rows (never the corpus), the embedding table never moves.
  Seeds are the k smallest ids (deterministic and independent of
  partitioning/parallelism, so results are bit-stable across cluster
  sizes — the BASELINE scaling contract).

* :func:`semdedup_prune` — SemDeDup (Abbas et al. 2023,
  arXiv:2303.09540): within each cluster, drop every vector whose
  cosine similarity to ANY earlier (lower-id) vector in the same
  cluster reaches ``tau``; keep-first-by-id is the deterministic
  stand-in for the paper's keep-one policy.  The pairwise rule (earlier
  vector, kept or not) is what the SQL oracle mirrors with a plain
  EXISTS — no sequential greedy state.  Work is a per-cluster blocked
  matmul (rows stream in ``block`` × n tiles), so memory is
  O(block · cluster) not O(cluster²); the quadratic FLOP cost per
  cluster is intrinsic to SemDeDup and bounded by choosing k so
  clusters stay ~1e5 vectors (the paper's own operating point) —
  ``max_group`` fails fast when a cluster exceeds that assumption.

Both operators read the ``list<float>`` embedding column zero-copy
(flatten → reshape; no per-row ``to_pylist``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ._util import broadcast_cached


def _matrix(col, dtype=np.float64) -> np.ndarray:
    """Zero-copy (vec_count, dim) matrix from a list<float> column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), dtype)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    widths = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
    if widths.min() != widths.max():
        raise ValueError("ragged embedding column — fixed dim required")
    return flat.reshape(len(arr), int(widths[0]))


# cap on the (batch, tile, dim) float64 distance intermediate; at the
# documented 100-TB operating point (k=1e4, dim=1e3, batch=1e3) the
# untiled tensor would be 80 GB/task — tiling bounds it regardless of k
_ASSIGN_TILE_BYTES = 256 * 2**20

# row count of the driver-side reduce frame from the most recent
# kmeans_assign iteration — observability hook for the scale test
# asserting the driver fold input is ≤ k·dim (never O(n_batches·k·dim))
_LAST_REDUCE_ROWS: int = -1


def _assign(E: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest centroid per row: euclidean, ties to the lowest cluster
    id (the scan keeps the FIRST minimum in cluster-id order).

    Distances are computed in centroid TILES so the (batch, tile, dim)
    intermediate stays under ``_ASSIGN_TILE_BYTES`` — memory is
    O(batch·tile·dim), independent of k.  Each (row, cluster) squared
    distance is an independent ``((e-c)**2).sum(-1)`` with the SAME
    per-pair floating summation order as the untiled kernel (and the
    DuckDB oracle's list_distance), and the cross-tile argmin uses a
    strict ``<`` update — first-min-wins exactly like a global argmin —
    so outputs are bit-identical at any tile size."""
    n, dim = E.shape if E.ndim == 2 else (len(E), 1)
    k = len(C)
    tile = max(1, min(k, _ASSIGN_TILE_BYTES // max(1, n * dim * 8)))
    best = np.zeros(n, np.int64)
    bestd = np.full(n, np.inf)
    for t0 in range(0, k, tile):
        Ct = C[t0:t0 + tile]
        # same floating summation shape as the DuckDB oracle's
        # list_distance, keeping round-6 outputs identical
        d2 = ((E[:, None, :] - Ct[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        dm = d2[np.arange(n), a]
        better = dm < bestd
        best[better] = a[better] + t0
        bestd[better] = dm[better]
    return best, np.sqrt(bestd)


def _seed_centroids(emb: ray.data.Dataset, k: int, id_col: str,
                    vec_col: str) -> np.ndarray:
    """The k smallest-id vectors (shared local-top-n helper)."""
    from ._util import smallest_id_rows

    C = smallest_id_rows(emb, k, id_col, vec_col)
    if len(C) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(C)}")
    return C


def kmeans_assign(emb: ray.data.Dataset, k: int = 4, iters: int = 1,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  append: bool = False) -> ray.data.Dataset:
    """Fixed-iteration Lloyd's k-means; returns (id, cluster, dist) —
    or, with ``append=True``, the INPUT columns plus cluster/dist (so
    a downstream within-cluster stage like :func:`semdedup_prune`
    consumes the clustering without any join/shuffle).

    ``iters`` centroid updates follow the seed assignment; the returned
    assignment/distance is against the LAST updated centroids.  An
    empty cluster keeps its previous centroid (standard Lloyd's
    convention; covered by test).  NOTE the SQL oracle instead drops an
    empty cluster from its final argmin — the two agree in the oracle's
    operating regime because each seed is a corpus member at distance 0
    to its own centroid, so no cluster empties at the single update
    q_kmeans runs (iters=1)."""
    C = _seed_centroids(emb, k, id_col, vec_col)
    dim = C.shape[1]

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:  # empty block (filter/over-partition)
                return pa.table({"cluster": pa.array([], pa.int32()),
                                 "dim": pa.array([], pa.int32()),
                                 "s": pa.array([], pa.float64()),
                                 "c": pa.array([], pa.int64())})
            Cw = broadcast_cached(ref)
            E = _matrix(batch[vec_col])
            a, _ = _assign(E, Cw)
            # SPARSE partials: emit rows only for clusters present in
            # the batch (the pagerank contribution shape) — a batch
            # that touches u clusters ships u·dim rows, not k·dim.
            order = np.argsort(a, kind="stable")
            uniq, starts = np.unique(a[order], return_index=True)
            sums = np.add.reduceat(E[order], starts, axis=0)
            cnts = np.diff(np.append(starts, len(a))).astype(np.int64)
            u = len(uniq)
            return pa.table({
                "cluster": pa.array(np.repeat(uniq, dim).astype(np.int32)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int32), u)),
                "s": pa.array(sums.ravel()),
                "c": pa.array(np.repeat(cnts, dim)),
            })

        # distributed pre-reduce: the groupby sum folds the sparse
        # per-batch partials down to AT MOST k·dim rows before the
        # driver sees anything — the driver fold is O(k·dim) in both
        # its input and its output (per-(cluster,dim) float sums agree
        # with a single-pass fold at the oracle's round-6 tolerance)
        df = (emb.map_batches(partial, batch_format="pyarrow")
              .groupby(["cluster", "dim"]).sum(["s", "c"]).to_pandas())
        global _LAST_REDUCE_ROWS
        _LAST_REDUCE_ROWS = len(df)
        assert len(df) <= k * dim, "reduce must be pre-aggregated"
        acc_s = (df.groupby(["cluster", "dim"])["sum(s)"].sum()
                 .unstack(fill_value=0.0)
                 .reindex(index=range(k), columns=range(dim), fill_value=0.0)
                 .to_numpy())
        acc_c = (df[df["dim"] == 0].groupby("cluster")["sum(c)"].sum()
                 .reindex(range(k), fill_value=0).to_numpy())
        # "sum(c)" is the per-(cluster,dim) total count; dim==0 rows
        # carry one copy per cluster.  A cluster absent from every
        # batch has no rows at all → count 0 → keeps its centroid.
        live = acc_c > 0
        C = C.copy()
        C[live] = acc_s[live] / acc_c[live, None]

    ref = ray.put(C)

    def final(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            empty = (batch if append else batch.select([id_col]))
            return empty.append_column(
                "cluster", pa.array([], pa.int64())).append_column(
                "dist", pa.array([], pa.float64()))
        Cw = broadcast_cached(ref)
        E = _matrix(batch[vec_col])
        a, d = _assign(E, Cw)
        base = batch if append else batch.select([id_col])
        return base.append_column(
            "cluster", pa.array(a.astype(np.int64))).append_column(
            "dist", pa.array(d))

    return emb.map_batches(final, batch_format="pyarrow")


def semdedup_prune(emb: ray.data.Dataset, tau: float,
                   cluster_col: str = "label", id_col: str = "vec_id",
                   vec_col: str = "embedding", block: int = 1024,
                   max_group: int = 100_000) -> ray.data.Dataset:
    """SemDeDup within-cluster prune → (id, cluster, kept).

    One groupby on the cluster id (clusters are the unit of work by
    construction); inside a group a blocked upper-triangular matmul
    flags every row with an earlier ``cosine >= tau`` neighbor."""

    def prune(g: pa.Table) -> pa.Table:
        if len(g) > max_group:
            raise ValueError(
                f"cluster of {len(g)} rows exceeds max_group={max_group}; "
                "SemDeDup assumes k keeps clusters ~1e5 — raise k (or "
                "max_group if the quadratic cost is acceptable)")
        g = g.take(pc.sort_indices(g, sort_keys=[(id_col, "ascending")]))
        E = _matrix(g[vec_col])  # zero-copy flatten → reshape
        n = np.linalg.norm(E, axis=1)
        n[n == 0.0] = 1.0
        N = E / n[:, None]
        kept = np.ones(len(g), bool)
        for a in range(0, len(g), block):
            b = min(a + block, len(g))
            S = N[a:b] @ N[:b].T
            earlier = np.arange(b)[None, :] < np.arange(a, b)[:, None]
            kept[a:b] = ~((S >= tau) & earlier).any(1)
        return pa.table({
            id_col: g[id_col],
            "cluster": g[cluster_col].cast(pa.int64()),
            "kept": pa.array(kept),
        })

    return emb.groupby(cluster_col).map_groups(prune, batch_format="pyarrow")
