"""Deduplication operators (training-data-pipeline extensions).

The reference has **no dedup operator** (SURVEY.md §2.8) — these are
the web-corpus additions: exact (content-hash groupby keep-first),
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All hashing is seeded/stable (blake2b or fixed-multiplier mixing), so
results are identical across runs and parallelism levels.  The LSH
pipelines follow the shingle → minhash → band → bucket-groupby shape
from the ray_guide: sketches are computed vectorized per batch, only
(band, hash, doc_id) rows shuffle, candidate verification is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..analysis import SimpleAnalyzer

_MIX = np.uint64(0x9E3779B97F4A7C15)
_P1 = np.uint64(0xFF51AFD7ED558CCD)
_P2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — stable, vectorized 64-bit mixing."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _P1
    x ^= x >> np.uint64(33)
    x *= _P2
    x ^= x >> np.uint64(33)
    return x


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable per-token 64-bit hashes (FNV-1a over utf-8, then mixed)."""
    out = np.empty(len(tokens), np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(0xCBF29CE484222325)
        for b in t.encode("utf-8"):
            h ^= np.uint64(b)
            h *= np.uint64(0x100000001B3)
        out[i] = h
    return _mix64(out)


def _shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (rolling combination of token hashes)."""
    th = _token_hashes(tokens)
    if len(th) < k:
        return _mix64(th) if len(th) else th
    acc = th[: len(th) - k + 1].copy()
    for j in range(1, k):
        acc = _mix64(acc * _MIX + th[j : len(th) - k + 1 + j])
    return acc


# ---------------------------------------------------------------------
# Exact dedup: content hash → groupby → keep first
# ---------------------------------------------------------------------


def exact_dedup(ds: ray.data.Dataset, key_col="text", id_col="doc_id"):
    """Keep the min-id row per distinct key value (hash-partitioned)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        import hashlib

        hs = [
            hashlib.blake2b(
                (v or "").encode("utf-8"), digest_size=16
            ).hexdigest()
            for v in batch[key_col].to_pylist()
        ]
        return batch.append_column("content_hash", pa.array(hs))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def keep_first(g):
        return g.sort_values(id_col).head(1)

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------


class MinHasher:
    """Vectorized num_perm-permutation MinHash over word shingles."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**63, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, tokens: list[str]) -> np.ndarray:
        sh = _shingle_hashes(tokens, self.shingle_k)
        if len(sh) == 0:
            return np.full(self.num_perm, np.uint64(2**64 - 1), np.uint64)
        # (num_perm, n_shingles) universal-hash family, min over shingles
        vals = self.a[:, None] * sh[None, :] + self.b[:, None]
        return vals.min(axis=1)


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col="text",
    id_col="doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Pipeline: per-batch signatures → explode to (band, band_hash, id)
    → groupby bucket → candidate pairs → verify with exact shingle
    Jaccard (the verify side re-reads both docs' shingles, shipped in
    the bucket rows — at corpus scale the verify stage joins signatures
    by id instead; documented trade-off).
    Returns rows (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥
    threshold.
    """
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm, shingle_k)

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        sa = SimpleAnalyzer()
        out_id, out_band, out_hash, out_sh = [], [], [], []
        for i, t in zip(ids, texts):
            tokens = sa.terms(t or "")
            sig = hasher.signature(tokens)
            sh = np.unique(_shingle_hashes(tokens, shingle_k))
            for b in range(bands):
                seg = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bh = int(_mix64(seg.astype(np.uint64)).sum() & np.uint64(2**63 - 1))
                out_id.append(i)
                out_band.append(b)
                out_hash.append(bh)
                out_sh.append(sh.astype(np.int64).tobytes())
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "shingles": pa.array(out_sh, pa.large_binary()),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(g):
        import pandas as pd

        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        shingles = [
            np.frombuffer(s, np.int64) for s in g["shingles"].tolist()
        ]
        rows = []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = shingles[x], shingles[y]
                if len(a) == 0 and len(b) == 0:
                    continue
                inter = len(np.intersect1d(a, b, assume_unique=True))
                union = len(a) + len(b) - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    rows.append((ids[x], ids[y], j))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # a pair can surface from several bands → dedup
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes weighted by tf."""
    if not tokens:
        return 0
    th = _token_hashes(tokens)
    uniq, counts = np.unique(th, return_counts=True)
    bits = ((uniq[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_pairs(ds: ray.data.Dataset, text_col="text", id_col="doc_id",
                  max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via 4-block
    banding (a pair within distance 3 shares at least one of 4 blocks)."""

    def sigs(batch: pa.Table) -> pa.Table:
        sa = SimpleAnalyzer()
        ids = batch[id_col].to_pylist()
        out_id, out_block, out_key, out_sig = [], [], [], []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            h = simhash64(sa.terms(t or ""))
            for blk in range(4):
                out_id.append(i)
                out_block.append(blk)
                out_key.append((h >> (blk * 16)) & 0xFFFF)
                out_sig.append(h)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "block": pa.array(out_block, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
                "sig": pa.array(np.array(out_sig, dtype=np.uint64).astype(np.int64)),
            }
        )

    def bucket_pairs(g):
        import pandas as pd

        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        s = g["sig"].to_numpy().astype(np.uint64)
        rows = []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = int(bin(int(s[x]) ^ int(s[y])).count("1"))
                if d <= max_hamming:
                    rows.append((ids[x], ids[y], d))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby(["block", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------
# Exact n-gram Jaccard pairs (verification oracle; O(n²) — small inputs)
# ---------------------------------------------------------------------


def jaccard_pairs_exact(ds: ray.data.Dataset, threshold: float,
                        text_col="text", id_col="doc_id"):
    """All-pairs token-set Jaccard ≥ threshold.  The SQL-checkable
    oracle for the LSH pipelines; the scale path is minhash_lsh_pairs."""
    tbl = pa.concat_tables(ray.get(ds.materialize().to_arrow_refs()))
    sa = SimpleAnalyzer()
    ids = tbl[id_col].to_pylist()
    sets = [set(sa.terms(t or "")) for t in tbl[text_col].to_pylist()]
    order = np.argsort(ids)
    rows = []
    for xi in range(len(order)):
        for yi in range(xi + 1, len(order)):
            x, y = order[xi], order[yi]
            a, b = sets[x], sets[y]
            if not a and not b:
                continue
            inter = len(a & b)
            j = inter / (len(a) + len(b) - inter)
            if j >= threshold:
                rows.append((ids[x], ids[y], float(np.sign(j) * np.floor(abs(j) * 1e6 + 0.5) / 1e6)))
    import pandas as pd

    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


# ---------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------


def embedding_dup_pairs(ds: ray.data.Dataset, threshold: float = 0.95,
                        vec_col="embedding", id_col="vec_id"):
    """Pairs with cosine ≥ threshold: batches scored against the full
    (broadcast) normalized matrix — ray.put once, matmul per batch.
    At corpus scale the matrix is replaced by an IVF partition join."""
    mat_tbl = pa.concat_tables(ray.get(ds.materialize().to_arrow_refs()))
    ids = np.asarray(mat_tbl[id_col].to_pylist(), np.int64)
    V = np.array(mat_tbl[vec_col].to_pylist(), np.float64)
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, V))

    def score(batch: pa.Table) -> pa.Table:
        all_ids, allV = ray.get(ref)
        bids = np.asarray(batch[id_col].to_pylist(), np.int64)
        B = np.array(batch[vec_col].to_pylist(), np.float64)
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        S = B @ allV.T
        out_a, out_b, out_s = [], [], []
        for r in range(len(bids)):
            hits = np.nonzero(S[r] >= threshold)[0]
            for h in hits:
                if bids[r] < all_ids[h]:
                    out_a.append(int(bids[r]))
                    out_b.append(int(all_ids[h]))
                    out_s.append(float(S[r, h]))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
